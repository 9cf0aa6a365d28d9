"""Scalar text normalizers (SURVEY.md §2.2 M3-M9, §2.9), vectorized
over Arrow string arrays where the kernel allows, with semantics pinned
to the reference implementations.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "soundex",
    "soundex_keys",
    "strip_fromtitle",
    "strip_quotation_marks",
    "get_mention_from_title",
    "mention_keys",
    "strip_punctuation_tokens",
    "collapse_cjk_spaces",
    "lower_preserve_len",
    "PUNCTUATIONS",
]


def lower_preserve_len(text: str) -> str:
    """Length-preserving lowercase: offsets into the lowered string
    remain valid into the original. ``str.lower`` can change length for
    a handful of codepoints (e.g. 'İ' → 'i̇'); those characters are
    lowered per-char and kept as-is when their lowercase expands, so
    scan offsets recorded on the lowered text always index the
    original (candidates.resolve_batch slices contexts there)."""
    low = text.lower()
    if len(low) == len(text):
        return low
    return "".join(
        (lc if len(lc := c.lower()) == 1 else c) for c in text
    )

# reference datatool/pipeline/tools.py:4 — fixed punctuation set
PUNCTUATIONS = "!！?？/\'\".,:()\-\n·;。＂＃＄％＆＇（）＊＋，－／：；＜＝=＞＠［＼］＾＿｀｛｜｝{|}～｟｠｢｣､、〃《》<>「」『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏"

# reference utils/dictionary.py:23 — percent-encoded curly quotes in urls
_QUOTE_RE = re.compile(r"item/%[Ee]2%80%9[Cc](.+?)%[Ee]2%80%9[Dd]/")

_CJK_SPACE_RE = re.compile(r"([^a-zA-Z])( )([^a-zA-Z])")


def strip_fromtitle(urls: pa.Array, prefix: str = "https://baike.baidu.com/item/") -> pa.Array:
    """M3: ``prefix + url.split('?')[0]`` fromtitle-strip (reference
    prepare_standard_input.py:392,427; utils/dictionary.py:87)."""
    tail = pc.utf8_slice_codeunits(urls, len(prefix), 2**31 - 1)
    first = pc.list_element(pc.split_pattern(tail, "?"), 0)
    return pc.binary_join_element_wise(pa.array([prefix] * len(urls)), first, "")


def strip_quotation_marks(url: str) -> str:
    """M3: remove %E2%80%9C…%E2%80%9D curly-quote wrapping from a path
    segment (reference utils/dictionary.py:48-55)."""
    return _QUOTE_RE.sub(lambda m: "item/" + m.group(1) + "/", url)


def get_mention_from_title(title: str) -> str:
    """M4 (reference utils/dictionary.py:141-147): drop parenthetical
    qualifiers — split on opening parens (CJK or ASCII), keep the text
    after any closing paren in each segment."""
    mention = ""
    for t in re.split("[（(]", title):
        mention += re.split("[)）]", t)[-1]
    return mention


def mention_keys(titles: pa.Array, lowercase: bool = True) -> pa.Array:
    """M4+M5 blocking-key normalization over a batch."""
    out = pa.array(
        [get_mention_from_title(t) for t in titles.to_pylist()], pa.string()
    )
    return pc.utf8_lower(out) if lowercase else out


def strip_punctuation_tokens(tokens: list[str]) -> list[str]:
    """M8: drop tokens that are (single) punctuation marks (reference
    extract_embedding_train.py:52-60 membership test against the set)."""
    return [t for t in tokens if t not in PUNCTUATIONS]


def collapse_cjk_spaces(text: str) -> str:
    """M9 (reference extract_embedding_train.py:40): remove a space
    between two non-ASCII-letter chars. NOTE the reference regex
    consumes its right context, so runs like ``一 二 三`` only collapse
    every other gap in one pass — reproduced by using the same single
    ``re.sub`` pass."""
    return _CJK_SPACE_RE.sub(r"\1\3", text)


_SOUNDEX_MAP = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"
)
_NON_ALPHA_RE = re.compile(r"[^A-Za-z]")


def soundex(name: str) -> str:
    """Simplified American Soundex (H/W/Y treated as vowels): letter +
    3 digits. Spec, mirrored verbatim by the SQL oracle:
    strip non-alpha → uppercase → map letters to codes (vowels→0) →
    collapse adjacent equal codes → drop the first code (the lead
    letter's own run) → drop zeros → first letter + 3 digits padded
    with '0'. Empty after stripping → ''."""
    u = _NON_ALPHA_RE.sub("", name).upper()
    if not u:
        return ""
    s = u.translate(_SOUNDEX_MAP)
    collapsed = s[0] + "".join(
        c for prev, c in zip(s, s[1:]) if c != prev
    )
    digits = collapsed[1:].replace("0", "")
    return u[0] + (digits + "000")[:3]


def soundex_keys(names: pa.Array) -> pa.Array:
    """Batch soundex — amortized over UNIQUE values (names repeat
    heavily in blocking workloads)."""
    import numpy as np

    vals = np.asarray(names.to_pylist(), dtype=object)
    uniq, inv = np.unique(vals, return_inverse=True)
    codes = np.asarray([soundex(v) for v in uniq], dtype=object)
    return pa.array(codes[inv], pa.string())
