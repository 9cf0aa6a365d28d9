"""Vectorized context-window embedding (SURVEY.md P4/P5).

Mean word-vector of each context string, computed for a whole batch
with Arrow string kernels + numpy scatter-add — no per-token Python
loop. Bit-identical to the sequential reference loop: tokens are
visited in the same order and accumulated into a float64 row exactly
as ``acc += vecs[token]`` would (np.add.at applies additions in flat
index order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["ContextEmbedder"]


class ContextEmbedder:
    """Holds the word vocabulary (Arrow array) and the aligned vector
    matrix; call with a list/array of context strings → (n, dim) means."""

    def __init__(self, words: list[str], vecs: np.ndarray):
        self.word_arr = pa.array(words, pa.string())
        self.vecs = np.ascontiguousarray(vecs, dtype=np.float32)
        self.dim = vecs.shape[1] if len(vecs) else 0

    def __call__(self, ctxs) -> np.ndarray:
        if not isinstance(ctxs, (pa.Array, pa.ChunkedArray)):
            ctxs = pa.array(list(ctxs), pa.string())
        if isinstance(ctxs, pa.ChunkedArray):
            ctxs = ctxs.combine_chunks()
        n = len(ctxs)
        acc = np.zeros((n, self.dim), dtype=np.float64)
        if n == 0:
            return acc
        toks = pc.split_pattern(pc.utf8_lower(ctxs), " ")
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        idx = pc.index_in(flat, self.word_arr)  # null where token ∉ vocab
        valid = idx.is_valid().to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        r = rows[valid]
        if len(r) == 0:
            return acc
        vi = np.asarray(idx.fill_null(0).to_numpy(zero_copy_only=False), dtype=np.int64)[valid]
        # r is non-decreasing (flat tokens are in row order): segment-sum
        # with reduceat — ufunc.at is ~10× slower. Gathered rows are cast
        # to float64 first so accumulation matches the sequential
        # ``acc += vecs[tok]`` reference loop.
        gathered = self.vecs[vi].astype(np.float64)
        seg_starts = np.nonzero(np.r_[True, r[1:] != r[:-1]])[0]
        sums = np.add.reduceat(gathered, seg_starts, axis=0)
        acc[r[seg_starts]] = sums
        cnt = np.bincount(r, minlength=n)
        nz = cnt > 0
        acc[nz] /= cnt[nz, None]
        return acc
