"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
2003 — the MOSS algorithm): per document, hash every word-k-gram, then
keep from each window of ``w`` consecutive gram hashes the minimal one
(RIGHTMOST position on ties). The selected (pos, hash) set is the
document's fingerprint sketch: any shared substring of at least
``w + k - 1`` tokens between two documents is guaranteed to produce a
shared selected hash, at ~2/(w+1) the density of the full gram set.

Scale shape: a single stateless ``map_batches`` — each document's
selection is local, so the stage has no shuffle and no state; the
downstream join (group selected hashes to find overlap pairs) is
shared_ngram_pairs' shape on a w-times-smaller row set.

Kernel: the gram hashes are the same md5-low64→M61 Horner fold as
stages/curation._gram_hashes (SQL-replicable; the oracle recomputes
them with a DuckDB ``list_reduce``); window minima are ``w`` shifted
vectorized passes, preferring later positions on ties (``<=``) — no
per-token Python.

Documents with fewer than ``k + w - 1`` tokens have no complete
window and yield no fingerprints (the guarantee is vacuous below the
window length); both engine and oracle share this rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from xlink_ray.functions.hashing import M61, affine61

__all__ = ["winnow_fingerprints", "GRAM_BASE"]

GRAM_BASE = np.uint64(1000003)


def _token_and_gram_hashes(
    texts: "pa.ChunkedArray | pa.Array", k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(doc_idx, pos, gram_hash, token_hashes, counts) — positional
    (non-deduped) word-k-gram hashes for EVERY occurrence in document
    order, plus the flat per-token M61 hashes and per-doc token counts
    they were folded from (so callers needing both — e.g. CDC chunking
    — hash each token once)."""
    from xlink_ray.stages.dedup import _token_hashes64

    n = len(texts)
    z = np.zeros(0, np.int64)
    zu = np.zeros(0, np.uint64)
    if n == 0:
        return z, z, zu, zu, z
    toks = pc.split_pattern(pc.cast(texts, pa.string()), " ")
    flat = pc.list_flatten(toks)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    th = _token_hashes64(flat) % np.uint64(M61) if len(flat) else zu
    m = len(flat)
    if m < k:
        return z, z, zu, th, counts
    acc = np.zeros(m - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = affine61(acc, GRAM_BASE, th[j : m - k + 1 + j])
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    head = doc_of[: m - k + 1]
    valid = head == doc_of[k - 1 :]
    pos = np.arange(m - k + 1, dtype=np.int64) - starts[head]
    return head[valid], pos[valid], acc[valid], th, counts


def _positional_gram_hashes(
    texts: "pa.ChunkedArray | pa.Array", k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_idx, pos, hash) — see :func:`_token_and_gram_hashes`."""
    doc_idx, pos, gh, _, _ = _token_and_gram_hashes(texts, k)
    return doc_idx, pos, gh


def winnow_fingerprints(
    ds: Dataset,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """``(doc_id, pos, fp)`` — the winnowing-selected gram positions
    (0-based token index of the gram start) and their M61 hashes."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be positive")

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        doc_idx, pos, h = _positional_gram_hashes(t[text_col], k)
        g = len(h)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "fp": pa.array([], pa.int64()),
            }
        )
        if g < w:
            return empty
        # rightmost-min over each window of w consecutive grams: w
        # shifted passes; <= prefers the later position on ties
        nwin = g - w + 1
        best_h = h[:nwin].copy()
        best_j = np.arange(nwin, dtype=np.int64)
        for d in range(1, w):
            cand = h[d : nwin + d]
            take = cand <= best_h
            best_h[take] = cand[take]
            best_j[take] = np.arange(nwin, dtype=np.int64)[take] + d
        # a window is real only if it lies inside one document
        inside = doc_idx[:nwin] == doc_idx[w - 1 :]
        sel = best_j[inside]
        if len(sel) == 0:
            return empty
        # distinct (doc, pos): adjacent windows often select the same gram
        key = np.stack([doc_idx[sel], pos[sel]], axis=1)
        order = np.lexsort((key[:, 1], key[:, 0]))
        sel = sel[order]
        first = np.ones(len(sel), dtype=bool)
        first[1:] = (doc_idx[sel][1:] != doc_idx[sel][:-1]) | (
            pos[sel][1:] != pos[sel][:-1]
        )
        sel = sel[first]
        return pa.table(
            {
                id_col: pa.array(ids[doc_idx[sel]], pa.int64()),
                "pos": pa.array(pos[sel], pa.int64()),
                "fp": pa.array(h[sel].astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
