"""Approximate-nearest-neighbor search over an embedding column
(task spec: brute-force cosine top-k baseline + LSH-bucketed and IVF
inverted-file scale paths).

Brute force: the query matrix is broadcast once (``ray.put``); every
batch computes one (batch × queries) matmul against it — the corpus
streams, queries are O(k) memory. The LSH variant buckets the corpus
by random-hyperplane signs (deterministic seed) and probes only the
query's bucket and its 1-bit neighbors.
"""

from __future__ import annotations

from xlink_ray.util import pool_size, vecs_to_numpy

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

__all__ = [
    "brute_topk",
    "lsh_topk",
    "ivf_topk",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "pq_rerank_topk",
]


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def _qround(m: np.ndarray, decimals: int) -> np.ndarray:
    """Half-up rounding via floor(x·10^d + 0.5)/10^d — the SAME formula
    a DuckDB replica can evaluate bit-identically (np.round is
    half-even; DuckDB round() is half-away — this sidesteps both)."""
    s = 10.0 ** decimals
    return np.floor(m * s + 0.5) / s


def _nq(m: np.ndarray) -> np.ndarray:
    """Quantized normalize (9 decimals) used on the IVF path: absorbs
    the last-ulp summation-order differences between numpy and the SQL
    oracle so both engines walk identical cell assignments."""
    return _qround(_normalize(m), 9)


def brute_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k: per-batch partial top-k (matmul against the
    broadcast query matrix), then a tiny global merge on the driver.
    Output: (query_id, rank, vec_id) — rank by (cos desc, vec_id asc).
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    class PartialTopK:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            m = _normalize(vecs_to_numpy(batch[vec_col]))
            sims = self.q @ m.T  # (nq, nb)
            nq, nb = sims.shape
            kk = min(k, nb)
            # partial top-k per query within this batch
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_q = np.repeat(np.arange(nq, dtype=np.int64), kk)
            out_id = ids[idx.ravel()]
            out_s = np.take_along_axis(sims, idx, axis=1).ravel()
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "cos": pa.array(out_s, pa.float64()),
                }
            )

    partials = ds.map_batches(PartialTopK, batch_format="pyarrow", concurrency=pool_size())
    tbl = pa.concat_tables([pa.table(b) for b in partials.iter_batches(batch_format="pyarrow")])

    # global merge: per query, order by (cos desc, vec_id asc), take k
    import pandas as pd

    df = tbl.to_pandas()
    df = df.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].reset_index(drop=True), preserve_index=False
    )


def lsh_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate cosine top-k: random-hyperplane LSH — corpus rows
    keyed by sign signature; each query probes its own bucket plus all
    1-bit-flip neighbor buckets. Same output shape as brute_topk."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    dim = qn.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket_of(m: np.ndarray) -> np.ndarray:
        signs = (m @ planes.T) > 0
        return (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)

    q_buckets = bucket_of(qn)
    probe: dict[int, list[int]] = {}
    for qi, b in enumerate(q_buckets):
        for nb in [int(b)] + [int(b) ^ (1 << p) for p in range(n_planes)]:
            probe.setdefault(nb, []).append(qi)
    probe_ref = ray.put((qn, probe))

    class BucketScore:
        """Vectorized: batch rows grouped by bucket; each probed bucket
        scores with ONE (queries × rows) matmul; per-batch per-query
        top-k truncation caps what reaches the driver merge at
        O(queries × k) rows per batch."""

        def __init__(self):
            self.q, self.probe = ray.get(probe_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            m = _normalize(vecs_to_numpy(batch[vec_col]))
            bks = bucket_of(m)
            uniq_b, inv = np.unique(bks, return_inverse=True)
            qs, vids, sims_out = [], [], []
            for ub_idx, ub in enumerate(uniq_b):
                qis = self.probe.get(int(ub))
                if not qis:
                    continue
                rows = np.nonzero(inv == ub_idx)[0]
                sims = self.q[qis] @ m[rows].T  # (nqis, nrows)
                qs.append(np.repeat(np.asarray(qis, dtype=np.int64), len(rows)))
                vids.append(np.tile(ids[rows], len(qis)))
                sims_out.append(sims.ravel())
            if not qs:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                     "cos": pa.array([], pa.float64())}
                )
            q_arr = np.concatenate(qs)
            v_arr = np.concatenate(vids)
            s_arr = np.concatenate(sims_out)
            # per-batch per-query top-k: sort (query, cos desc, vec_id)
            # and keep the first k rows of each query group
            order = np.lexsort((v_arr, -s_arr, q_arr))
            q_s = q_arr[order]
            new_grp = np.r_[True, q_s[1:] != q_s[:-1]]
            grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(len(q_s)), 0))
            keep = (np.arange(len(q_s)) - grp_start) < k
            sel = order[keep]
            return pa.table(
                {
                    "query_id": pa.array(q_arr[sel], pa.int64()),
                    "vec_id": pa.array(v_arr[sel], pa.int64()),
                    "cos": pa.array(s_arr[sel], pa.float64()),
                }
            )

    partials = ds.map_batches(BucketScore, batch_format="pyarrow", concurrency=pool_size())
    tbl = pa.concat_tables([pa.table(b) for b in partials.iter_batches(batch_format="pyarrow")])
    import pandas as pd

    df = tbl.to_pandas().drop_duplicates(["query_id", "vec_id"])
    df = df.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].reset_index(drop=True), preserve_index=False
    )


def _kmeans_codebook(sample: np.ndarray, n_cells: int, iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd iterations on the (normalized) sample:
    init = evenly spaced sample rows; empty cells keep their centroid.
    Spherical k-means (cosine) — centroids re-normalized each step and
    QUANTIZED to 6 decimals (``_qround``) so the DuckDB oracle's
    unrolled replica walks the identical centroid sequence (same
    pattern as stages/kmeans.py's ``quant``)."""
    n = len(sample)
    init_rows = np.linspace(0, n - 1, num=min(n_cells, n), dtype=np.int64)
    cents = sample[init_rows].copy()
    for _ in range(iters):
        sims = sample @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = _qround(v / nv, 6)
    return cents


def ivf_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_rows: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF approximate cosine top-k — the inverted-file scale path:
    a small deterministic sample trains a coarse spherical-k-means
    codebook (driver-side, codebook-sized state only); every corpus
    row is assigned to its nearest centroid cell in a streaming
    ``map_batches``; each query probes its ``nprobe`` nearest cells and
    scores only rows assigned there (one matmul per cell per batch,
    per-batch per-query top-k truncation before the tiny driver
    merge). Same output shape as brute_topk.

    All vectors go through the QUANTIZED normalize ``_nq`` and the
    codebook through ``_qround`` — deterministic enough for the DuckDB
    oracle (ann_ivf) to replicate cell assignments and ranks exactly."""
    qn = _nq(np.asarray(queries, dtype=np.float64))

    sample = ds.take(min(sample_rows, 100_000))
    smat = _nq(
        np.asarray([r[vec_col] for r in sample], dtype=np.float64)
    )
    cents = _kmeans_codebook(smat, n_cells)
    # per-query probe set: nprobe nearest centroids
    q_cells = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    probe: dict[int, list[int]] = {}
    for qi in range(len(qn)):
        for c in q_cells[qi]:
            probe.setdefault(int(c), []).append(qi)
    state_ref = ray.put((qn, cents, probe))

    class CellScore:
        def __init__(self):
            self.q, self.cents, self.probe = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            m = _nq(vecs_to_numpy(batch[vec_col]))
            assign = np.argmax(m @ self.cents.T, axis=1)
            uniq_c, inv = np.unique(assign, return_inverse=True)
            qs, vids, sims_out = [], [], []
            for uc_idx, uc in enumerate(uniq_c):
                qis = self.probe.get(int(uc))
                if not qis:
                    continue
                rows = np.nonzero(inv == uc_idx)[0]
                sims = self.q[qis] @ m[rows].T
                qs.append(np.repeat(np.asarray(qis, dtype=np.int64), len(rows)))
                vids.append(np.tile(ids[rows], len(qis)))
                sims_out.append(sims.ravel())
            if not qs:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                     "cos": pa.array([], pa.float64())}
                )
            q_arr = np.concatenate(qs)
            v_arr = np.concatenate(vids)
            s_arr = np.concatenate(sims_out)
            order = np.lexsort((v_arr, -s_arr, q_arr))
            q_s = q_arr[order]
            new_grp = np.r_[True, q_s[1:] != q_s[:-1]]
            grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(len(q_s)), 0))
            keep = (np.arange(len(q_s)) - grp_start) < k
            sel = order[keep]
            return pa.table(
                {
                    "query_id": pa.array(q_arr[sel], pa.int64()),
                    "vec_id": pa.array(v_arr[sel], pa.int64()),
                    "cos": pa.array(s_arr[sel], pa.float64()),
                }
            )

    partials = ds.map_batches(CellScore, batch_format="pyarrow", concurrency=pool_size())
    tbl = pa.concat_tables([pa.table(b) for b in partials.iter_batches(batch_format="pyarrow")])
    import pandas as pd

    df = tbl.to_pandas().drop_duplicates(["query_id", "vec_id"])
    df = df.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].reset_index(drop=True), preserve_index=False
    )


def _pq_codebooks(sample: np.ndarray, m_sub: int, n_codes: int, iters: int = 8) -> np.ndarray:
    """Deterministic per-subspace Lloyd codebooks over the normalized
    sample: shape (m_sub, n_codes, dsub); init = evenly spaced sample
    rows, empty codes keep their centroid (plain euclidean k-means —
    ADC then approximates the inner product as a sum of per-subspace
    partial dot products)."""
    n, dim = sample.shape
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    out = np.empty((m_sub, n_codes, dsub), dtype=np.float64)
    init_rows = np.linspace(0, n - 1, num=min(n_codes, n), dtype=np.int64)
    for s in range(m_sub):
        sub = sample[:, s * dsub : (s + 1) * dsub]
        cents = sub[init_rows].copy()
        for _ in range(iters):
            d2 = (
                (sub * sub).sum(axis=1)[:, None]
                - 2.0 * (sub @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                members = sub[assign == c]
                if len(members):
                    # quantized update (see _qround) so the DuckDB
                    # oracle's replica walks the same codebooks
                    cents[c] = _qround(members.mean(axis=0), 6)
        out[s, : len(cents)] = cents
        if len(cents) < n_codes:  # tiny sample: pad with the first centroid
            out[s, len(cents) :] = cents[0]
    return out


def pq_train(
    ds: Dataset,
    m_sub: int = 8,
    n_codes: int = 16,
    sample_rows: int = 2048,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks on a deterministic sample (driver holds only
    the m_sub × n_codes × dsub codebook — KBs, broadcast to encoders)."""
    sample = ds.take(min(sample_rows, 100_000))
    smat = _nq(np.asarray([r[vec_col] for r in sample], dtype=np.float64))
    return _pq_codebooks(smat, m_sub, n_codes)


def pq_encode(
    ds: Dataset,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """→ (id, code: fixed list<uint8> of m_sub) — the compressed index
    (m_sub bytes per vector instead of dim floats; at 10¹² vectors the
    difference between fitting in cluster RAM and not). Streaming
    encode; the codebook rides in the task closure."""
    m_sub, n_codes, dsub = codebooks.shape
    cb_ref = ray.put(codebooks)

    class Encode:
        def __init__(self):
            self.cb = ray.get(cb_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            m = _nq(vecs_to_numpy(batch[vec_col]))
            codes = np.empty((len(ids), m_sub), dtype=np.uint8)
            for s in range(m_sub):
                sub = m[:, s * dsub : (s + 1) * dsub]
                cents = self.cb[s]
                d2 = -2.0 * (sub @ cents.T) + (cents * cents).sum(axis=1)[None, :]
                codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
            return pa.table(
                {
                    id_col: pa.array(ids),
                    "code": pa.FixedSizeListArray.from_arrays(
                        pa.array(codes.ravel(), pa.uint8()), m_sub
                    ),
                }
            )

    return ds.map_batches(Encode, batch_format="pyarrow", concurrency=pool_size())


def pq_topk(
    codes: Dataset,
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> pa.Table:
    """ADC top-k over the COMPRESSED index: each query's per-subspace
    lookup table (m_sub × n_codes inner products, computed once per
    actor) scores a batch of codes with pure table lookups + a sum —
    no original vectors touched. Per-batch per-query top-k truncation,
    then the same tiny driver merge as brute_topk."""
    m_sub, n_codes, dsub = codebooks.shape
    qn = _nq(np.asarray(queries, dtype=np.float64))
    # LUT[q, s, c] = <q_sub, codebook[s, c]>
    lut = np.einsum(
        "qsd,scd->qsc", qn.reshape(len(qn), m_sub, dsub), codebooks
    )
    state_ref = ray.put(lut)

    class ADCScore:
        def __init__(self):
            self.lut = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            codes_np = vecs_to_numpy(batch["code"]).astype(np.int64)
            nq = self.lut.shape[0]
            sims = np.zeros((nq, len(ids)), dtype=np.float64)
            for s in range(m_sub):
                sims += self.lut[:, s, codes_np[:, s]]
            kk = min(k, len(ids))
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_q = np.repeat(np.arange(nq, dtype=np.int64), kk)
            out_id = ids[idx.ravel()]
            out_s = np.take_along_axis(sims, idx, axis=1).ravel()
            return pa.table(
                {
                    "query_id": pa.array(out_q),
                    "vec_id": pa.array(out_id),
                    "cos": pa.array(out_s),
                }
            )

    partials = codes.map_batches(
        ADCScore, batch_format="pyarrow", concurrency=pool_size()
    )
    tbl = pa.concat_tables(
        [pa.table(b) for b in partials.iter_batches(batch_format="pyarrow")]
    )
    import pandas as pd

    df = tbl.to_pandas().drop_duplicates(["query_id", "vec_id"])
    df = df.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].reset_index(drop=True), preserve_index=False
    )


def ivfpq_train(
    ds: Dataset,
    n_cells: int = 16,
    m_sub: int = 8,
    n_codes: int = 16,
    sample_rows: int = 2048,
    vec_col: str = "embedding",
) -> "tuple[np.ndarray, np.ndarray]":
    """Train the IVF-PQ index state — (coarse_centroids, pq_codebooks)
    — on one deterministic sample. The FAISS-style configuration for
    10¹²-vector corpora: a coarse inverted file bounds the scan to
    nprobe cells, PQ codes bound memory to m_sub bytes/vector. Both
    trainings use the quantized updates (``_qround``/``_nq``) so the
    DuckDB oracle can replay them."""
    sample = ds.take(min(sample_rows, 100_000))
    smat = _nq(np.asarray([r[vec_col] for r in sample], dtype=np.float64))
    return _kmeans_codebook(smat, n_cells), _pq_codebooks(smat, m_sub, n_codes)


def ivfpq_index(
    ds: Dataset,
    cents: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """→ (id, cell, code): the compressed inverted index, built in ONE
    streaming pass (cell assignment + PQ encode share the normalized
    batch). At scale this is the only pass that touches raw vectors;
    it would be written as cell-partitioned Parquet and queried many
    times."""
    m_sub, n_codes, dsub = codebooks.shape
    state_ref = ray.put((cents, codebooks))

    class Encode:
        def __init__(self):
            self.cents, self.cb = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            m = _nq(vecs_to_numpy(batch[vec_col]))
            cell = np.argmax(m @ self.cents.T, axis=1).astype(np.int64)
            codes = np.empty((len(ids), m_sub), dtype=np.uint8)
            for s in range(m_sub):
                sub = m[:, s * dsub : (s + 1) * dsub]
                cb = self.cb[s]
                d2 = -2.0 * (sub @ cb.T) + (cb * cb).sum(axis=1)[None, :]
                codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
            return pa.table(
                {
                    id_col: pa.array(ids),
                    "cell": pa.array(cell),
                    "code": pa.FixedSizeListArray.from_arrays(
                        pa.array(codes.ravel(), pa.uint8()), m_sub
                    ),
                }
            )

    return ds.map_batches(Encode, batch_format="pyarrow", concurrency=pool_size())


def ivfpq_topk(
    index: Dataset,
    cents: np.ndarray,
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> pa.Table:
    """IVF-PQ query over the COMPRESSED index: each query probes its
    nprobe nearest coarse cells and ADC-scores only the codes assigned
    there (lookup-table sums — no raw vectors). This is the
    brute→LSH→IVF→PQ family's end state: scan bounded by the inverted
    file AND memory bounded by the code bytes. Per-batch per-query
    top-k truncation, then the tiny nq×k driver merge."""
    m_sub, n_codes, dsub = codebooks.shape
    qn = _nq(np.asarray(queries, dtype=np.float64))
    q_cells = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    probe: dict[int, list[int]] = {}
    for qi in range(len(qn)):
        for c in q_cells[qi]:
            probe.setdefault(int(c), []).append(qi)
    lut = np.einsum("qsd,scd->qsc", qn.reshape(len(qn), m_sub, dsub), codebooks)
    state_ref = ray.put((lut, probe))

    class ProbeADC:
        def __init__(self):
            self.lut, self.probe = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            cell = batch["cell"].to_numpy(zero_copy_only=False)
            codes_np = vecs_to_numpy(batch["code"]).astype(np.int64)
            uniq_c, inv = np.unique(cell, return_inverse=True)
            qs, vids, sims_out = [], [], []
            for uc_idx, uc in enumerate(uniq_c):
                qis = self.probe.get(int(uc))
                if not qis:
                    continue
                rows = np.nonzero(inv == uc_idx)[0]
                sims = np.zeros((len(qis), len(rows)), dtype=np.float64)
                sub_lut = self.lut[qis]  # (nq_probe, m_sub, n_codes)
                for s in range(m_sub):
                    sims += sub_lut[:, s, codes_np[rows, s]]
                qs.append(np.repeat(np.asarray(qis, dtype=np.int64), len(rows)))
                vids.append(np.tile(ids[rows], len(qis)))
                sims_out.append(sims.ravel())
            if not qs:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "cos": pa.array([], pa.float64()),
                    }
                )
            q_arr = np.concatenate(qs)
            v_arr = np.concatenate(vids)
            s_arr = np.concatenate(sims_out)
            order = np.lexsort((v_arr, -s_arr, q_arr))
            q_s = q_arr[order]
            new_grp = np.r_[True, q_s[1:] != q_s[:-1]]
            grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(len(q_s)), 0))
            keep = (np.arange(len(q_s)) - grp_start) < k
            sel = order[keep]
            return pa.table(
                {
                    "query_id": pa.array(q_arr[sel], pa.int64()),
                    "vec_id": pa.array(v_arr[sel], pa.int64()),
                    "cos": pa.array(s_arr[sel], pa.float64()),
                }
            )

    partials = index.map_batches(
        ProbeADC, batch_format="pyarrow", concurrency=pool_size()
    )
    tbl = pa.concat_tables(
        [pa.table(b) for b in partials.iter_batches(batch_format="pyarrow")]
    )
    import pandas as pd

    df = tbl.to_pandas().drop_duplicates(["query_id", "vec_id"])
    df = df.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].reset_index(drop=True), preserve_index=False
    )


def pq_rerank_topk(
    codes: Dataset,
    vectors: Dataset,
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Two-stage PQ search: ADC shortlist of k·mult candidates over the
    COMPRESSED codes, then exact cosine re-rank of the shortlist
    against the ORIGINAL vectors — the standard recall-recovery step
    for compressed 10¹²-vector indexes (Jégou et al. 2011 §IV).

    Scale shape: the shortlist is nq·k·mult (query, id) pairs — driver
    tiny; the exact pass streams the vector corpus ONCE and scores only
    shortlisted rows against the broadcast query matrix (a searchsorted
    membership gate per batch), so full-precision floats are touched
    for a vanishing fraction of the corpus."""
    short = pq_topk(codes, codebooks, queries, k=k * mult, id_col=id_col)
    s_id = np.asarray(short["vec_id"].to_pylist(), dtype=np.int64)
    s_q = np.asarray(short["query_id"].to_pylist(), dtype=np.int64)
    o = np.argsort(s_id, kind="stable")
    s_id, s_q = s_id[o], s_q[o]
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    state_ref = ray.put((qn, s_id, s_q))

    class ExactRerank:
        def __init__(self):
            self.qn, self.s_id, self.s_q = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            lo = np.searchsorted(self.s_id, ids, side="left")
            hi = np.searchsorted(self.s_id, ids, side="right")
            counts = hi - lo
            cols = np.nonzero(counts)[0]
            if len(cols) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "cos": pa.array([], pa.float64()),
                    }
                )
            m = _normalize(vecs_to_numpy(batch[vec_col]))
            sims = self.qn @ m.T  # (nq, nb)
            reps = counts[cols]
            total = int(reps.sum())
            starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
            flat = np.arange(total) - np.repeat(starts, reps) + np.repeat(lo[cols], reps)
            qidx = self.s_q[flat]
            colr = np.repeat(cols, reps)
            return pa.table(
                {
                    "query_id": pa.array(qidx),
                    "vec_id": pa.array(ids[colr]),
                    "cos": pa.array(sims[qidx, colr]),
                }
            )

    partials = vectors.map_batches(
        ExactRerank, batch_format="pyarrow", concurrency=pool_size()
    )
    tbl = pa.concat_tables(
        [pa.table(b) for b in partials.iter_batches(batch_format="pyarrow")]
    )
    import pandas as pd

    df = tbl.to_pandas()
    df = df.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].reset_index(drop=True),
        preserve_index=False,
    )
