"""Sorted-Neighborhood blocking (Hernández & Stolfo 1995) as a generic
distributed operator: order all records by a sort key, take every pair
within ``window`` positions as a candidate.

Scale shape — never a global sort of the full rows:

* a slim (id, key) projection is RANGE-bucketed on sampled key
  boundaries (boundaries only affect load balance, never the output);
* each bucket sorts locally and emits its in-bucket window pairs
  vectorized (the d-th diagonal of the sorted order, d = 1..window);
* pairs that CROSS bucket boundaries come from a halo: every bucket
  also emits its first/last ``window`` rows (by order) with their
  local rank and the bucket size — O(window · nbuckets) rows, config-
  sized, so the driver can stitch global ranks and emit the few
  cross-boundary pairs exactly.  A bucket smaller than ``window``
  contributes all its rows to the halo, which keeps chains that span
  3+ buckets exact.

The flagship pipeline uses the same idea fused into its salt blocks
(pipelines/flagship.py); this is the standalone, any-key version with
a row_number self-join SQL replica.  Ordering is (key, id) — total and
deterministic; ASCII keys compare identically in python and DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

__all__ = ["sorted_neighborhood_pairs"]


def _pairs_within(
    ids: np.ndarray, keys: np.ndarray, window: int, ranks: "np.ndarray | None" = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All (earlier, later) pairs ≤ window apart in an already-sorted
    run; with ``ranks``, positions are the given global ranks (sparse
    halo rows) instead of dense indices."""
    n = len(ids)
    a_idx, b_idx = [], []
    pos = np.arange(n, dtype=np.int64) if ranks is None else ranks
    for d in range(1, window + 1):
        if d >= n:
            break
        gap = pos[d:] - pos[:-d]
        m = (gap >= 1) & (gap <= window)
        a_idx.append(np.flatnonzero(m))
        b_idx.append(np.flatnonzero(m) + d)
    if not a_idx:
        z = np.zeros(0, dtype=np.int64)
        zo = np.zeros(0, dtype=object)
        return z, z, zo, zo
    ai = np.concatenate(a_idx)
    bi = np.concatenate(b_idx)
    return ids[ai], ids[bi], keys[ai], keys[bi]


def sorted_neighborhood_pairs(
    ds: Dataset,
    key_col: str,
    id_col: str,
    window: int = 5,
    nbuckets: int = 32,
    sample_rows: int = 4096,
) -> Dataset:
    """Candidate pairs (id_a, id_b, key_a, key_b): id_a precedes id_b
    in the global (key, id) order and their positions differ by at most
    ``window``. Keys ride the pair rows so a scorer can run without a
    join."""
    slim = ds.select_columns([id_col, key_col]).materialize()

    # boundaries are KEY-only (rows with equal keys always co-bucket —
    # required for exactness; which bucket a key range lands in only
    # affects load balance, never the emitted pairs)
    sample = slim.take(min(sample_rows, 100_000))
    skeys = sorted(str(r[key_col]) for r in sample)
    nb = max(min(nbuckets, len(skeys)), 1)
    boundaries = sorted({skeys[(i * len(skeys)) // nb] for i in range(1, nb)}) if skeys else []
    b_arr = np.asarray(boundaries, dtype=object)

    def add_bucket(t: pa.Table) -> pa.Table:
        kv = np.asarray(t[key_col].to_pylist(), dtype=object)
        b = (
            np.searchsorted(b_arr, kv, side="right")
            if len(b_arr)
            else np.zeros(t.num_rows, dtype=np.int64)
        )
        return t.append_column("__b", pa.array(b.astype(np.int64)))

    bucketed = slim.map_batches(add_bucket, batch_format="pyarrow").materialize()

    def sort_group(g: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = np.asarray(g[id_col].to_pylist(), dtype=np.int64)
        keys = np.asarray(g[key_col].to_pylist(), dtype=object)
        order = np.lexsort((ids, keys))
        return ids[order], keys[order]

    def in_bucket_pairs(g: pa.Table) -> pa.Table:
        ids, keys = sort_group(g)
        a, b, ka, kb = _pairs_within(ids, keys, window)
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "key_a": pa.array(ka, pa.string()),
                "key_b": pa.array(kb, pa.string()),
            }
        )

    def halo_rows(g: pa.Table) -> pa.Table:
        ids, keys = sort_group(g)
        n = len(ids)
        take = np.unique(np.r_[np.arange(min(window, n)), np.arange(max(n - window, 0), n)])
        return pa.table(
            {
                "__b": pa.array(np.full(len(take), g["__b"][0].as_py(), dtype=np.int64)),
                "lrank": pa.array(take.astype(np.int64)),
                "n": pa.array(np.full(len(take), n, dtype=np.int64)),
                id_col: pa.array(ids[take], pa.int64()),
                key_col: pa.array(keys[take], pa.string()),
            }
        )

    inner = bucketed.groupby("__b").map_groups(in_bucket_pairs, batch_format="pyarrow")

    halos = pa.concat_tables(
        pa.table(t)
        for t in bucketed.groupby("__b")
        .map_groups(halo_rows, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    # stitch global ranks from bucket-size prefix sums (halo is
    # O(window · nbuckets) — config-sized driver state)
    if halos.num_rows:
        hb = halos["__b"].to_numpy(zero_copy_only=False)
        sizes = {int(b): int(n) for b, n in zip(hb, halos["n"].to_numpy(zero_copy_only=False))}
        offs, acc = {}, 0
        for b in sorted(sizes):
            offs[b] = acc
            acc += sizes[b]
        grank = np.asarray([offs[int(b)] for b in hb], dtype=np.int64) + halos[
            "lrank"
        ].to_numpy(zero_copy_only=False)
        ids = halos[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.asarray(halos[key_col].to_pylist(), dtype=object)
        order = np.argsort(grank, kind="stable")
        a, b, ka, kb = _pairs_within(ids[order], keys[order], window, ranks=grank[order])
        # in-bucket pairs already emitted — keep only cross-bucket ones
        hbs = hb[order]
        cross = np.zeros(0, dtype=bool)
        if len(a):
            # recompute which emitted pairs straddle buckets
            ai, bi = [], []
            pos = grank[order]
            n_h = len(pos)
            for d in range(1, window + 1):
                if d >= n_h:
                    break
                gap = pos[d:] - pos[:-d]
                m = (gap >= 1) & (gap <= window)
                ai.append(np.flatnonzero(m))
                bi.append(np.flatnonzero(m) + d)
            ai = np.concatenate(ai)
            bi = np.concatenate(bi)
            cross = hbs[ai] != hbs[bi]
        boundary = pa.table(
            {
                "id_a": pa.array(a[cross] if len(a) else a, pa.int64()),
                "id_b": pa.array(b[cross] if len(a) else b, pa.int64()),
                "key_a": pa.array(ka[cross] if len(a) else ka, pa.string()),
                "key_b": pa.array(kb[cross] if len(a) else kb, pa.string()),
            }
        )
    else:
        boundary = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "key_a": pa.array([], pa.string()),
                "key_b": pa.array([], pa.string()),
            }
        )

    import ray.data as rd

    return inner.union(rd.from_arrow(boundary))
