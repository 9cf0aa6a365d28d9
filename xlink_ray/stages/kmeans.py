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
  ``row_number()`` join.  Computed distributed (value-range bucket
  counts → per-bucket rank selection; driver state O(nbuckets + k),
  nothing corpus-sized ever collects — see ``_init_rank``).
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


def _init_rank(
    ds: Dataset, k: int, id_col: str, vec_col: str, nbuckets: int = 4096
) -> np.ndarray:
    """Centroid c = vector of the id at sorted rank (c*n)//k — computed
    DISTRIBUTED (the id column never reaches the driver):

    1. one (min, max) aggregate fixes ``nbuckets`` id-value ranges;
    2. one streamed pass reduces per-bucket COUNTS to the driver
       (O(nbuckets) ints, regardless of corpus size);
    3. cumulative counts place each target rank in its bucket + local
       offset; only the ≤k buckets that contain a target are filtered
       out, and each bucket TASK sorts its own ids and emits just its
       target ids (k rows total back to the driver);
    4. one filtered pass fetches the k vectors.

    Exact: value-range buckets preserve global id order, so
    global rank = cum[bucket-1] + local sorted rank. Same targets as a
    full driver-side sort (the SQL row_number() oracle is unchanged).
    Skewed id distributions only unbalance bucket-task sizes (a bucket
    is re-sorted in one task); raise ``nbuckets`` for 10¹²-row runs."""
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(id_col), Max(id_col))
    lo, hi = int(agg[f"min({id_col})"]), int(agg[f"max({id_col})"])
    span = hi - lo + 1
    width = max(1, -(-span // nbuckets))  # ceil

    def bucket_counts(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (ids - lo) // width
        u, c = np.unique(b, return_counts=True)
        return pa.table(
            {"b": pa.array(u, pa.int64()), "cnt": pa.array(c.astype(np.int64))}
        )

    counts = np.zeros(nbuckets, dtype=np.int64)
    for part in ds.select_columns([id_col]).map_batches(
        bucket_counts, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        t = pa.table(part)
        np.add.at(
            counts,
            t["b"].to_numpy(zero_copy_only=False),
            t["cnt"].to_numpy(zero_copy_only=False),
        )
    n = int(counts.sum())
    if n < k:
        raise ValueError(f"k={k} exceeds corpus size {n}")
    cum = np.cumsum(counts)
    ranks = (np.arange(k, dtype=np.int64) * n) // k
    tbucket = np.searchsorted(cum, ranks, side="right")
    local = ranks - np.where(tbucket > 0, cum[tbucket - 1], 0)
    # bucket → [(centroid index, local offset), ...]
    want: dict[int, list[tuple[int, int]]] = {}
    for c, (b, off) in enumerate(zip(tbucket.tolist(), local.tolist())):
        want.setdefault(int(b), []).append((c, int(off)))
    want_ref = ray.put(want)
    bset = pa.array(sorted(want), pa.int64())

    def pick_targets(g: pa.Table) -> pa.Table:
        from xlink_ray.state.cached import cached_state

        w = cached_state(("kmeans_init", want_ref.hex()), lambda: ray.get(want_ref))
        ids = np.sort(g[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        b = int(g["__b"][0].as_py())
        cs, offs = zip(*w[b])
        return pa.table(
            {
                "c": pa.array(list(cs), pa.int64()),
                "tid": pa.array(ids[list(offs)], pa.int64()),
            }
        )

    def add_b(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (ids - lo) // width
        t = t.append_column("__b", pa.array(b, pa.int64()))
        return t.filter(pc.is_in(t["__b"], value_set=bset))

    picked_ids = (
        ds.select_columns([id_col])
        .map_batches(add_b, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(pick_targets, batch_format="pyarrow")
        .take_all()
    )
    targets = np.zeros(k, dtype=np.int64)
    for r in picked_ids:
        targets[int(r["c"])] = int(r["tid"])
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
    decimals — see module docstring).

    The input is NOT materialized: each iteration re-streams the
    (projected) source — at 10¹² vectors the object store cannot pin
    the corpus across iterations, and a Parquet re-read of two columns
    is cheaper than spilling the whole dataset."""
    ds = ds.select_columns([id_col, vec_col])
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
    cell_cap: int | None = 65_536,
) -> Dataset:
    """SemDeDup prune: keep a row iff NO lower-id row of the same
    k-means cell has round(cosine, 9) ≥ tau.  One cell-keyed exchange;
    the per-cell kernel is a blocked prefix matmul (O(block·|cell|)
    memory), so a cell never needs its full cosine matrix at once.
    Output: (id_col, cell) of the kept rows.

    Hot-cell bound: a whole cell is one ``map_groups`` task, so one
    degenerate cell (boilerplate embeddings) = one task OOM at scale.
    Cells larger than ``cell_cap`` are split EXACTLY into an S×S
    triangular grid (S = ceil(n/cap), chunk = stable hash of the id):
    each row is replicated into the S cells (min(s,t), max(s,t)), every
    pair meets in exactly one grid cell, the grid-cell task emits
    per-row KILL verdicts, and a final id-keyed reduce ORs the
    verdicts.  Identical output to the single-task path (test-pinned);
    chunk membership is hash(id) % S, so task sizes are ≤ cell_cap in
    EXPECTATION only (hash variance can push a chunk somewhat past the
    cap — the OOM bound is soft).  ``None`` disables splitting."""
    assigned = kmeans_assign(ds, cents, id_col=id_col, vec_col=vec_col)

    def _kill_mask(ids: np.ndarray, m: np.ndarray) -> np.ndarray:
        """killed[i] ⟺ some j with ids[j] < ids[i] has cos ≥ tau.
        Requires ids ascending; m row-normalized."""
        killed = np.zeros(len(ids), dtype=bool)
        for lo in range(0, len(ids), block):
            hi = min(lo + block, len(ids))
            sims = np.round(m[lo:hi] @ m[:hi].T, 9)  # rows lo..hi vs full prefix
            close = sims >= tau
            cols = np.arange(hi)[None, :]
            rows = np.arange(lo, hi)[:, None]
            close &= cols < rows
            killed[lo:hi] = close.any(axis=1)
        return killed

    def _norm(m: np.ndarray) -> np.ndarray:
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        return m / nrm[:, None]

    def per_cell(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _vecs(t, vec_col)
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], _norm(m[order])
        keep = ~_kill_mask(ids, m)
        cell = t["cell"].to_numpy(zero_copy_only=False)[order]
        return pa.table(
            {id_col: pa.array(ids[keep], pa.int64()), "cell": pa.array(cell[keep], pa.int64())}
        )

    if cell_cap is None:
        return assigned.groupby("cell").map_groups(per_cell, batch_format="pyarrow")

    # ---- hot-cell pre-count (driver sees ≤ k rows) ----
    from xlink_ray.functions.hashing import md5_low64
    from xlink_ray.stages.blocking import group_sizes

    hot_tbl = pa.concat_tables(
        [
            pa.table(b)
            for b in group_sizes(assigned, ["cell"])
            .map_batches(
                lambda t: t.filter(pc.greater(t["n"], cell_cap)),
                batch_format="pyarrow",
            )
            .iter_batches(batch_format="pyarrow")
        ]
        or [pa.table({"cell": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})]
    )
    hot = {
        int(hot_tbl["cell"][r].as_py()): int(
            np.ceil(hot_tbl["n"][r].as_py() / cell_cap)
        )
        for r in range(hot_tbl.num_rows)
    }
    if not hot:
        return assigned.groupby("cell").map_groups(per_cell, batch_format="pyarrow")
    hot_ref = ray.put(hot)

    def grid_replicate(t: pa.Table) -> pa.Table:
        from xlink_ray.state.cached import cached_state

        hm = cached_state(("semdedup_hot", hot_ref.hex()), lambda: ray.get(hot_ref))
        cells = t["cell"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        S = np.asarray([hm.get(int(c), 1) for c in cells], dtype=np.int64)
        own = (md5_low64([str(i) for i in ids]) % S.astype(np.uint64)).astype(
            np.int64
        )
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), S)
        total = int(S.sum())
        starts = np.concatenate(([0], np.cumsum(S)[:-1]))
        other = np.arange(total) - np.repeat(starts, S)
        own_r = np.repeat(own, S)
        ga = np.minimum(own_r, other)
        gb = np.maximum(own_r, other)
        rep = t.take(pa.array(idx, pa.int64()))
        return (
            rep.append_column("__s", pa.array(own_r, pa.int64()))
            .append_column("__ga", pa.array(ga, pa.int64()))
            .append_column("__gb", pa.array(gb, pa.int64()))
        )

    def per_grid_cell(t: pa.Table) -> pa.Table:
        """One (cell, ga, gb) task → per-row kill verdicts.  Diagonal
        (ga == gb): the standard triangular kernel over the chunk.
        Off-diagonal: blocked bipartite grid; a passing pair kills the
        HIGHER id (either side)."""
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["__s"].to_numpy(zero_copy_only=False)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        ga, gb = int(t["__ga"][0].as_py()), int(t["__gb"][0].as_py())
        m = _norm(_vecs(t, vec_col))
        if ga == gb:
            order = np.argsort(ids, kind="stable")
            killed = np.zeros(len(ids), dtype=bool)
            killed[order] = _kill_mask(ids[order], m[order])
        else:
            killed = np.zeros(len(ids), dtype=bool)
            ai = np.nonzero(s == ga)[0]
            bi = np.nonzero(s == gb)[0]
            for lo in range(0, len(ai), block):
                a_blk = ai[lo : lo + block]
                sims = np.round(m[a_blk] @ m[bi].T, 9) >= tau
                if not sims.any():
                    continue
                ii, jj = np.nonzero(sims)
                a_ids, b_ids = ids[a_blk[ii]], ids[bi[jj]]
                killed[a_blk[ii[b_ids < a_ids]]] = True
                killed[bi[jj[a_ids < b_ids]]] = True
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "killed": pa.array(killed.astype(np.int64)),
            }
        )

    verdicts = (
        assigned.map_batches(grid_replicate, batch_format="pyarrow")
        .groupby(["cell", "__ga", "__gb"])
        .map_groups(per_grid_cell, batch_format="pyarrow")
    )

    # ---- id-keyed OR-reduce of the S verdicts per row ----
    from xlink_ray.stages._bucket import bucket_shuffle

    def fold(bucket: pa.Table) -> pa.Table:
        ids = bucket[id_col].to_numpy(zero_copy_only=False)
        cell = bucket["cell"].to_numpy(zero_copy_only=False)
        killed = bucket["killed"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, cell, killed = ids[order], cell[order], killed[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        any_killed = np.maximum.reduceat(killed, starts)
        keep = any_killed == 0
        return pa.table(
            {
                id_col: pa.array(ids[starts][keep], pa.int64()),
                "cell": pa.array(cell[starts][keep], pa.int64()),
            }
        )

    out = bucket_shuffle(verdicts, id_col, 64, fold)
    return out.map_batches(
        lambda t: t.drop_columns(["__b"]) if "__b" in t.column_names else t,
        batch_format="pyarrow",
    )
