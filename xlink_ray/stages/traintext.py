"""Embedding training-text extraction — M10/M11/M12 (reference
datatool/pipeline/extract_embedding_train.py:12-138, word2vec.py:19-67)
as batch stages over the standard corpus.

* ``train_text_keep_anchors`` — the wiki-style builder (M11): strip
  punctuation tokens outside anchors, keep ``[[eid|mention]]`` markup
  (the C trainer's anchor-alignment input).
* ``plain_train_text`` — M12 ``genPlainText``: replace anchors with
  the mention surface, tokenize, drop punctuation (plain skip-gram
  input).
* The bd path (M10) re-segments with jieba in the reference; both
  stages here take a ``parser`` (functions/segment.py WordParser seam)
  — default ``EnWordParser`` (whitespace), swap in ``CJKWordParser``
  (deterministic jieba-shaped dictionary DP) for CJK corpora. The
  alignment walk (token offsets matched to anchor offsets) is the
  same either way.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from xlink_ray.functions.text import strip_punctuation_tokens
from xlink_ray.stages.extract import extract_mentions_and_plain_text

__all__ = ["train_text_keep_anchors", "plain_train_text"]


def _doc_train_text(text: str, parser=None) -> str:
    """Tokenize plain text, re-attach anchors at their offsets: tokens
    inside an anchor span collapse to the ``[[eid|mention]]`` token
    (the reference's offset-walk, extract_embedding_train.py:49-87)."""
    cut = parser.cut if parser is not None else str.split
    mentions, plain = extract_mentions_and_plain_text(text)
    tokens: list[str] = []
    cur = 0
    for mention, eid, off in sorted(mentions, key=lambda m: m[2]):
        pre = plain[cur:off]
        tokens.extend(strip_punctuation_tokens(cut(pre)))
        tokens.append(f"[[{eid}|{mention}]]")
        cur = off + len(mention)
    tokens.extend(strip_punctuation_tokens(cut(plain[cur:])))
    return " ".join(tokens)


def train_text_keep_anchors(corpus: Dataset, text_col: str = "text", parser=None) -> Dataset:
    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "text": pa.array(
                    [_doc_train_text(x, parser) for x in t[text_col].to_pylist()], pa.string()
                )
            }
        )

    return corpus.map_batches(fn, batch_format="pyarrow")


def plain_train_text(corpus: Dataset, text_col: str = "text", parser=None) -> Dataset:
    """Anchors replaced by their mention surface; punctuation tokens
    dropped (reference word2vec.py:19-31)."""

    def fn(t: pa.Table) -> pa.Table:
        cut = parser.cut if parser is not None else str.split
        out = []
        for x in t[text_col].to_pylist():
            _, plain = extract_mentions_and_plain_text(x)
            out.append(" ".join(strip_punctuation_tokens(cut(plain))))
        return pa.table({"text": pa.array(out, pa.string())})

    return corpus.map_batches(fn, batch_format="pyarrow")
