"""Word segmentation — the reference's WordParser seam (M7/M10).

The reference tokenizes with ``EnWordParser`` (whitespace split) for
English and ``JiebaWordParser`` (reference
datatool/pipeline/WordParser.py:76-79) for Chinese; jieba is not in
this container, so ``CJKWordParser`` is a deterministic stand-in with
jieba's *shape*: a dictionary-driven max-probability path over the
word DAG (jieba's core algorithm), with out-of-vocabulary CJK runs
split per character. It is swappable for real jieba behind the same
``cut`` interface — pipeline stages take a parser object and never
import a segmenter directly.

The word DAG is built with ``functions.ac.VectorScanner`` (all
overlapping dictionary matches in one vectorized scan), then a linear
DP picks the max-score path; ties break to the LONGER word, then the
earlier dictionary word — fully deterministic.
"""

from __future__ import annotations

import math

import numpy as np

from xlink_ray.functions.ac import VectorScanner

__all__ = ["EnWordParser", "CJKWordParser", "default_cjk_parser", "is_cjk"]


def is_cjk(ch: str) -> bool:
    return "一" <= ch <= "鿿"


class EnWordParser:
    """Whitespace tokenizer (reference EnWordParser)."""

    def cut(self, text: str) -> "list[str]":
        return text.split()


class CJKWordParser:
    """Deterministic dictionary-DP segmenter (jieba-shaped).

    ``word_freq`` maps dictionary words to counts; the DP maximizes the
    sum of log-relative-frequencies along the segmentation path.
    Characters not covered by any dictionary word advance one char with
    a fixed OOV penalty (so unknown CJK text splits per character,
    while ASCII runs between CJK are emitted whole, split on spaces).
    """

    _OOV_LOGP = -20.0

    def __init__(self, word_freq: "dict[str, int]"):
        if not word_freq:
            raise ValueError("empty segmentation dictionary")
        self.words = list(word_freq.keys())
        total = float(sum(word_freq.values()))
        self.logp = np.asarray(
            [math.log(word_freq[w] / total) for w in self.words], dtype=np.float64
        )
        self.wlen = np.asarray([len(w) for w in self.words], dtype=np.int64)
        self.scanner = VectorScanner(self.words)

    def cut(self, text: str) -> "list[str]":
        n = len(text)
        if n == 0:
            return []
        starts, pids = self.scanner.find_all(VectorScanner.codepoints(text))
        # edges grouped by start position
        best = np.full(n + 1, -np.inf)
        best[0] = 0.0
        back_len = np.ones(n + 1, dtype=np.int64)  # chosen step length ending at i
        back_word = np.full(n + 1, -1, dtype=np.int64)
        order = np.argsort(starts, kind="stable")
        starts, pids = starts[order], pids[order]
        ptr = 0
        m = len(starts)
        for i in range(n):
            if best[i] == -np.inf:
                continue
            # OOV single-char step
            sc = best[i] + self._OOV_LOGP
            j = i + 1
            if sc > best[j]:
                best[j] = sc
                back_len[j] = 1
                back_word[j] = -1
            while ptr < m and starts[ptr] < i:
                ptr += 1
            p = ptr
            while p < m and starts[p] == i:
                pid = pids[p]
                L = int(self.wlen[pid])
                sc = best[i] + float(self.logp[pid])
                j = i + L
                # strictly-better, or equal score with a longer word
                if sc > best[j] or (sc == best[j] and L > back_len[j]):
                    best[j] = sc
                    back_len[j] = L
                    back_word[j] = pid
                p += 1
        # reconstruct; merge adjacent OOV non-CJK chars into runs, then
        # split those runs on whitespace (ASCII words stay whole)
        toks: list[str] = []
        i = n
        while i > 0:
            L = int(back_len[i])
            toks.append(text[i - L : i])
            i -= L
        toks.reverse()
        merged: list[str] = []
        buf = ""
        for t in toks:
            if len(t) == 1 and not is_cjk(t) and t not in ("\n",):
                buf += t
            else:
                if buf:
                    merged.extend(buf.split())
                    buf = ""
                merged.append(t)
        if buf:
            merged.extend(buf.split())
        return [t for t in merged if t.strip()]


_DEFAULT_CJK_FREQ = {
    # minimal demonstration dictionary (fixture-scale); a deployment
    # loads a real frequency table through the same constructor
    "北京": 100, "大学": 80, "北京大学": 60, "数据": 90, "处理": 70,
    "数据处理": 50, "中文": 40, "分词": 40, "引擎": 30, "中国": 120,
}


def default_cjk_parser() -> CJKWordParser:
    return CJKWordParser(dict(_DEFAULT_CJK_FREQ))
