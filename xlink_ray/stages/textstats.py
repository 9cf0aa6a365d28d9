"""Text-analysis operators: token counting, quality scoring,
language-ID, document fingerprinting (task spec, training-data
pipeline block). All vectorized or batch-local; language-ID holds its
stopword profiles as actor state.
"""

from __future__ import annotations

from xlink_ray.util import pool_size

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["token_counts", "quality_stats", "LangIdActor", "lang_id", "fingerprints"]


def token_counts(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """(id, n_tokens) where tokens = single-space split (DuckDB
    ``string_split(text, ' ')`` semantics — empty strings count)."""

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        return pa.table(
            {id_col: t[id_col], "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_stats(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Integer quality features per doc: n_chars, n_tokens,
    n_distinct_tokens, max_token_len (all SQL-expressible)."""

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        n_chars = pc.cast(pc.utf8_length(t[text_col]), pa.int64())
        flat = pc.list_flatten(toks)
        lens = pc.utf8_length(flat)
        # per-row max token length + distinct count via offsets
        offs = np.cumsum(np.concatenate([[0], pc.list_value_length(toks).to_numpy(zero_copy_only=False)]))
        lens_np = lens.to_numpy(zero_copy_only=False)
        flat_np = flat.to_numpy(zero_copy_only=False)
        max_len = np.zeros(t.num_rows, dtype=np.int64)
        n_distinct = np.zeros(t.num_rows, dtype=np.int64)
        for i in range(t.num_rows):
            seg = slice(offs[i], offs[i + 1])
            if offs[i + 1] > offs[i]:
                max_len[i] = lens_np[seg].max()
                n_distinct[i] = len(set(flat_np[seg]))
        return pa.table(
            {
                id_col: t[id_col],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_distinct_tokens": pa.array(n_distinct),
                "max_token_len": pa.array(max_len),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# stopword profiles per language (public function-word lists, trimmed)
_PROFILES = {
    "en": {"the", "a", "of", "and", "to", "in", "is"},
    "de": {"der", "die", "das", "und", "ist", "ein"},
    "es": {"el", "la", "de", "y", "es", "un"},
    "fr": {"le", "la", "de", "et", "est", "un"},
    "zh": set(),  # CJK handled by script detection below
}


class LangIdActor:
    """Heuristic language-ID: stopword hits per language + CJK script
    ratio; argmax with 'und' fallback. Profiles compiled once per actor."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for text in batch["text"].to_pylist():
            toks = text.lower().split()
            if not toks:
                preds.append("und")
                continue
            cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
            if cjk / max(len(text), 1) > 0.2:
                preds.append("zh")
                continue
            scores = {
                lang: sum(1 for t_ in toks if t_ in prof)
                for lang, prof in self.profiles.items()
                if prof
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            preds.append(best if scores[best] > 0 else "und")
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, pa.string())}
        )


def lang_id(ds: Dataset) -> Dataset:
    return ds.map_batches(LangIdActor, batch_format="pyarrow", concurrency=pool_size())


def fingerprints(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Deterministic 64-bit content fingerprint per doc: a polynomial
    rolling hash over UTF-8 bytes (base 1000003, mod 2^61-1) — the
    classic Rabin-Karp-style fingerprint, plus the md5-low64 for
    cross-checking."""
    from xlink_ray.functions.hashing import md5_low64, rolling_fp61

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        rolls = rolling_fp61([x.encode("utf-8") for x in texts])
        return pa.table(
            {
                id_col: t[id_col],
                "rolling_fp": pa.array(rolls, pa.int64()),
                "md5_fp": pa.array(md5_low64(texts), pa.uint64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
