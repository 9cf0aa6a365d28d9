"""Distributed Lloyd k-means over an embedding column, plus the
SemDeDup-style semantic near-duplicate pruning built on top of it
(Abbas et al. 2023: cluster embeddings, then drop rows too close to
another row of the same cluster).

Scale shape
-----------
``kmeans_fit`` streams the corpus once per iteration: every batch emits
one (k × (d+1)) partial — per-cell vector sums and counts — so driver
state is O(k·d) regardless of corpus size, and the update is a tiny
driver reduce.  No shuffle anywhere; the only all-to-all in the family
is the per-cell grouping inside ``semantic_dedup`` (cells are the
blocks; pick ``k`` so cells stay bounded, exactly as SemDeDup does with
~10⁵ clusters at corpus scale).

Determinism (what makes the DuckDB oracle possible)
---------------------------------------------------
* init ``"rank"``: centroid ``c`` = the vector whose id has sorted rank
  ``(c·n)//k`` — pure integer math, reproducible in SQL with a
  ``row_number()`` join.  This collects ONLY the id column to the
  driver; at 10^12 rows use ``init="sample"`` (deterministic
  ``ds.take`` sample, same as ann.ivf_topk's codebook).
* every centroid update is quantized (``round(·, quant)``), so the
  ~1e-15 accumulation-order drift between numpy and the SQL replica
  can never cascade into a different assignment next iteration.
* assignment tie-break = lowest cell id (numpy argmin == SQL
  ``ORDER BY dist, cell LIMIT 1``).

The dedup rule is the order-robust variant of SemDeDup's greedy prune:
drop a row iff SOME lower-id row in the same cell has cosine ≥ tau
(cosines rounded to 9 decimals before the comparison, making the
threshold test float-drift-proof).  Unlike greedy-keep it is
independent of scan order, embarrassingly parallel per cell, and
exactly expressible as a SQL anti-join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from xlink_ray.util import pool_size

__all__ = ["kmeans_fit", "kmeans_assign", "semantic_dedup"]


def _vecs(batch: pa.Table, vec_col: str) -> np.ndarray:
    from xlink_ray.util import vecs_to_numpy

    return vecs_to_numpy(batch[vec_col])


def _assign(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # squared L2 via the expansion; argmin ties break to the lowest cell
    d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1).astype(np.int64)


def _init_rank(ds: Dataset, k: int, id_col: str, vec_col: str) -> np.ndarray:
    """Centroid c = vector of the id at sorted rank (c*n)//k.  Collects
    only the id column; one filtered pass fetches the k vectors."""
    id_tbl = pa.concat_tables(
        pa.table(b) for b in ds.select_columns([id_col]).iter_batches(batch_format="pyarrow")
    )
    ids = np.sort(id_tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
    n = len(ids)
    if n < k:
        raise ValueError(f"k={k} exceeds corpus size {n}")
    targets = ids[(np.arange(k, dtype=np.int64) * n) // k]
    tset = pa.array(targets, pa.int64())
    picked = ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=tset)),
        batch_format="pyarrow",
    ).take_all()
    by_id = {int(r[id_col]): np.asarray(r[vec_col], dtype=np.float64) for r in picked}
    return np.stack([by_id[int(t)] for t in targets])


def kmeans_fit(
    ds: Dataset,
    k: int = 10,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "rank",
    sample_rows: int = 4096,
    quant: int = 6,
) -> np.ndarray:
    """Fit k-means with ``iters`` centroid updates; returns the final
    (k × d) float64 centroid matrix (each update rounded to ``quant``
    decimals — see module docstring)."""
    ds = ds.select_columns([id_col, vec_col]).materialize()
    if init == "rank":
        cents = _init_rank(ds, k, id_col, vec_col)
    elif init == "sample":
        rows = ds.take(min(sample_rows, 100_000))
        m = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
        cents = m[(np.arange(k, dtype=np.int64) * len(m)) // k].copy()
    else:
        raise ValueError(f"unknown init {init!r}")
    cents = np.round(cents, quant)
    d = cents.shape[1]

    for _ in range(iters):
        # centroids are k×d (tiny) — ship in the task closure; a plain
        # task pool avoids a fresh actor-pool spin-up every iteration
        def partial(batch: pa.Table, c: np.ndarray = cents) -> pa.Table:
            m = _vecs(batch, vec_col)
            a = _assign(m, c)
            sums = np.zeros((k, d))
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cell": pa.array(np.arange(k, dtype=np.int64)),
                    "cnt": pa.array(cnt),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        sums = np.zeros((k, d))
        cnt = np.zeros(k, dtype=np.int64)
        parts = ds.map_batches(partial, batch_format="pyarrow")
        for b in parts.iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            # one iter_batches batch may concatenate several partials →
            # duplicate cell ids; np.add.at accumulates them (+= would not)
            cells = t["cell"].to_numpy(zero_copy_only=False)
            np.add.at(cnt, cells, t["cnt"].to_numpy(zero_copy_only=False))
            np.add.at(sums, cells, np.asarray(t["vsum"].to_pylist(), dtype=np.float64))
        live = cnt > 0
        cents = cents.copy()
        cents[live] = np.round(sums[live] / cnt[live, None], quant)
    return cents


def kmeans_assign(
    ds: Dataset,
    cents: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> Dataset:
    """Streaming assignment: append ``out_col`` = nearest centroid."""
    c_ref = ray.put(np.asarray(cents, dtype=np.float64))

    class Assign:
        def __init__(self):
            self.c = ray.get(c_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = _assign(_vecs(batch, vec_col), self.c)
            return batch.append_column(out_col, pa.array(a, pa.int64()))

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=pool_size())


def semantic_dedup(
    ds: Dataset,
    cents: np.ndarray,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 2048,
) -> Dataset:
    """SemDeDup prune: keep a row iff NO lower-id row of the same
    k-means cell has round(cosine, 9) ≥ tau.  One cell-keyed exchange;
    the per-cell kernel is a blocked prefix matmul (O(block·|cell|)
    memory), so a cell never needs its full cosine matrix at once.
    Output: (id_col, cell) of the kept rows."""
    assigned = kmeans_assign(ds, cents, id_col=id_col, vec_col=vec_col)

    def per_cell(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _vecs(t, vec_col)
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        m = m / nrm[:, None]
        keep = np.ones(len(ids), dtype=bool)
        for lo in range(0, len(ids), block):
            hi = min(lo + block, len(ids))
            sims = np.round(m[lo:hi] @ m[:hi].T, 9)  # rows lo..hi vs full prefix
            close = sims >= tau
            # strictly-lower-id comparisons only
            cols = np.arange(hi)[None, :]
            rows = np.arange(lo, hi)[:, None]
            close &= cols < rows
            keep[lo:hi] = ~close.any(axis=1)
        cell = t["cell"].to_numpy(zero_copy_only=False)[order]
        return pa.table(
            {id_col: pa.array(ids[keep], pa.int64()), "cell": pa.array(cell[keep], pa.int64())}
        )

    return assigned.groupby("cell").map_groups(per_cell, batch_format="pyarrow")
