"""Keyed interval-count join (range join): for every interval row
(key, start, end) count the point rows (key, ts) with
``start <= ts < end``.  The range-join companion to the as-of join in
``stages/asof.py`` — Ray Data has no native inequality joins.

Scale shape: tag-union both sides, ONE hash-bucket shuffle on
``key % nbuckets``, then a fully vectorized in-bucket kernel — points
are sorted once per bucket and every interval is answered by two
``np.searchsorted`` calls on a composite ``(key_rank, ts)`` integer
key (no per-interval or per-key Python loop; a per-key numpy loop is
the automatic fallback iff ``n_keys × ts_span`` would overflow int64,
which a month-scale event log never hits).  The partitioning
assumption is the same as the as-of join's: one key's rows fit a task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["interval_count_join"]


def interval_count_join(
    intervals: Dataset,
    points: Dataset,
    key: str,
    start: str,
    end: str,
    ts: str,
    interval_cols: list[str],
    out_col: str = "n_points",
    nbuckets: int = 64,
) -> Dataset:
    """Every interval row (with ``interval_cols`` carried through) plus
    ``out_col`` = count of same-key points in [start, end).  ``key``
    must be an integer column."""

    i_schema = intervals.schema()
    i_map = dict(zip(i_schema.names, i_schema.types))
    icol_types = [(c, i_map[c]) for c in interval_cols]
    end_type = i_map[end]

    def tag_intervals(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            key: t[key].cast(pa.int64()),
            "__t": t[start],
            "__end": t[end],
            "__side": pa.array(np.ones(n, dtype=np.int8)),
        }
        for c in interval_cols:
            cols[c] = t[c]
        return pa.table(cols)

    def tag_points(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            key: t[key].cast(pa.int64()),
            "__t": t[ts],
            "__end": pa.nulls(n, end_type),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        }
        for c, typ in icol_types:
            cols[c] = pa.nulls(n, typ)
        return pa.table(cols)

    both = intervals.map_batches(tag_intervals, batch_format="pyarrow").union(
        points.map_batches(tag_points, batch_format="pyarrow")
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.combine_chunks()
        side = t["__side"].to_numpy(zero_copy_only=False)
        ks = t[key].to_numpy(zero_copy_only=False)
        tt = pc.cast(t["__t"], pa.int64()).to_numpy(zero_copy_only=False)
        is_i = side == 1
        isel = np.nonzero(is_i)[0]
        ipart = t.select([key, *interval_cols]).take(pa.array(isel))
        if len(isel) == 0:
            return ipart.append_column(out_col, pa.array([], pa.int64()))
        ik = ks[isel]
        istart = tt[isel]
        # take interval rows BEFORE casting: the full column holds nulls
        # on point rows, and a nullable int64 → numpy roundtrip goes
        # through float64 (precision loss past 2^53)
        iend = pc.cast(t["__end"].take(pa.array(isel)), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        pk = ks[~is_i]
        pt = tt[~is_i]
        counts = np.zeros(len(isel), dtype=np.int64)
        if len(pk):
            order = np.lexsort((pt, pk))
            pk, pt = pk[order], pt[order]
            uk, first = np.unique(pk, return_index=True)
            tmin = int(pt.min())
            span = int(pt.max()) - tmin + 2
            rank = np.searchsorted(uk, ik)
            present = (rank < len(uk)) & (uk[np.minimum(rank, len(uk) - 1)] == ik)
            if len(uk) * span < 2**62:
                comp_p = (
                    np.searchsorted(uk, pk).astype(np.int64) * span + (pt - tmin)
                )
                lo_t = np.clip(istart - tmin, 0, span - 1)
                hi_t = np.clip(iend - tmin, 0, span - 1)
                r = np.minimum(rank, len(uk) - 1).astype(np.int64)
                lo = np.searchsorted(comp_p, r * span + lo_t, side="left")
                hi = np.searchsorted(comp_p, r * span + hi_t, side="left")
                counts = np.where(present & (iend > istart), hi - lo, 0).astype(
                    np.int64
                )
            else:  # overflow-proof fallback: numpy loop over present keys
                stops = np.append(first[1:], len(pk))
                for j, (kk, lo_i, hi_i) in enumerate(zip(uk, first, stops)):
                    m = ik == kk
                    if m.any():
                        seg = pt[lo_i:hi_i]
                        counts[m] = np.maximum(
                            np.searchsorted(seg, iend[m], side="left")
                            - np.searchsorted(seg, istart[m], side="left"),
                            0,
                        )
        return ipart.append_column(out_col, pa.array(counts))

    from xlink_ray.stages._bucket import bucket_shuffle

    return bucket_shuffle(both, key, nbuckets, per_bucket)
