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

    _CACHE_CAP = 100_000  # ≈50 MB at dim 64; cleared when full

    def __init__(self, words: list[str], vecs: np.ndarray):
        self.word_arr = pa.array(words, pa.string())
        self.vecs = np.ascontiguousarray(vecs, dtype=np.float32)
        # float64 copy so the per-token gather needs no post-cast (the
        # cast of a gathered (tokens, dim) block dominated the stage);
        # float32→float64 is exact, accumulation semantics unchanged
        self.vecs64 = self.vecs.astype(np.float64)
        self.dim = vecs.shape[1] if len(vecs) else 0
        # cross-batch memo: web text repeats context windows heavily
        # (boilerplate); per-string results are deterministic, so a
        # bounded memo is semantics-free
        self._memo: dict[str, np.ndarray] = {}

    def __call__(self, ctxs) -> np.ndarray:
        per_uniq, codes = self.embed_unique(ctxs)
        if len(codes) == 0:
            return per_uniq
        return per_uniq[codes]

    def embed_unique(self, ctxs) -> "tuple[np.ndarray, np.ndarray]":
        """(distinct-context matrix (U, dim), per-input code array) —
        callers that only need per-DISTINCT-context math (e.g. a
        context×entity cosine table) avoid materializing the expanded
        (n, dim) matrix entirely."""
        if not isinstance(ctxs, (pa.Array, pa.ChunkedArray)):
            ctxs = pa.array(list(ctxs), pa.string())
        if isinstance(ctxs, pa.ChunkedArray):
            ctxs = ctxs.combine_chunks()
        if len(ctxs) == 0:
            return np.zeros((0, self.dim), dtype=np.float64), np.zeros(0, dtype=np.int64)
        # context strings repeat heavily (fixed windows over recurring
        # phrases / boilerplate): embed each DISTINCT string once, memo
        # across batches, scatter back — identical per-string float
        # semantics, big constant-factor win
        enc = pc.dictionary_encode(ctxs)
        uniq = enc.dictionary
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_py = uniq.to_pylist()
        per_uniq = np.empty((len(uniq_py), self.dim), dtype=np.float64)
        missing = []
        for i, s in enumerate(uniq_py):
            v = self._memo.get(s)
            if v is None:
                missing.append(i)
            else:
                per_uniq[i] = v
        if missing:
            computed = self._embed(uniq.take(pa.array(missing, pa.int64())))
            for j, i in enumerate(missing):
                per_uniq[i] = computed[j]
            if len(self._memo) + len(missing) > self._CACHE_CAP:
                # crude eviction: restart from this batch's entries
                self._memo.clear()
                for i, s in enumerate(uniq_py):
                    self._memo[s] = per_uniq[i]
            else:
                for j, i in enumerate(missing):
                    self._memo[uniq_py[i]] = computed[j]
        return per_uniq, codes

    def _embed(self, ctxs: pa.Array) -> np.ndarray:
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
        gathered = self.vecs64[vi]
        seg_starts = np.nonzero(np.r_[True, r[1:] != r[:-1]])[0]
        sums = np.add.reduceat(gathered, seg_starts, axis=0)
        acc[r[seg_starts]] = sums
        cnt = np.bincount(r, minlength=n)
        nz = cnt > 0
        acc[nz] /= cnt[nz, None]
        return acc
