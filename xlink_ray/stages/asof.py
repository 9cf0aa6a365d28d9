"""Backward as-of join over keyed event streams (engine-level addition,
SURVEY.md §2.10 family — the reference has no temporal joins; this is
the standard "attach the most recent right-side row at or before each
left row's timestamp" operator that Ray Data lacks natively).

Scale shape (documented partitioning assumption): both sides are
tagged and unioned, then hash-bucketed on ``key % nbuckets`` — ONE
shuffle moves each row once.  Inside a bucket the whole computation is
vectorized numpy over the (key, ts)-sorted run: a forward
``maximum.accumulate`` of right-row indices with a reset at key
boundaries finds every left row's predecessor in O(n).  A bucket must
fit a task (buckets are ``nbuckets`` ≈ cluster cores; skewed keys
spread across buckets only by key — a single pathological key's
history must fit one task, the same assumption Ray's own
``groupby.map_groups`` makes).

Tie rule (deterministic): among right rows sharing the match
timestamp, the one with the greatest tiebreak column wins — the same
result as pre-deduplicating the right side to ``max(tiebreak)`` per
``(key, ts)``, which is how the DuckDB ``ASOF JOIN`` oracle states it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["asof_join"]


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    ts: str,
    left_cols: list[str],
    right_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_r",
    tolerance_s: int | None = None,
    nbuckets: int = 64,
) -> Dataset:
    """Backward as-of LEFT join: every left row, plus the right row with
    the greatest ``ts`` <= left ``ts`` for the same ``key`` (inclusive).

    ``left_cols`` / ``right_cols`` are the payload columns to carry
    (besides ``key`` and ``ts``); right payloads are emitted under
    ``f"{col}{suffix}"`` and are null when no predecessor exists (or it
    is farther back than ``tolerance_s`` seconds).  ``tiebreak``
    (default: first right payload column) orders right rows that share
    ``(key, ts)``.  ``key`` must be an integer column (bucketing is
    ``key % nbuckets``).
    """
    if tiebreak is None:
        if not right_cols:
            raise ValueError("right_cols must be non-empty (or pass tiebreak=)")
        tiebreak = right_cols[0]
    out_right = [f"{c}{suffix}" for c in right_cols]

    # Harmonized union schema: key, ts, __side, left payload (null on
    # right rows), right payload (null on left rows).
    def tag(side: int, payload: list[str], other: list[tuple[str, pa.DataType]]):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols: dict[str, pa.Array | pa.ChunkedArray] = {
                key: t[key].cast(pa.int64()),
                ts: t[ts],
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
            }
            for c in payload:
                cols[c] = t[c]
            for c, typ in other:
                cols[c] = pa.nulls(n, typ)
            return pa.table(cols)

        return fn

    l_schema = left.schema()
    r_schema = right.schema()
    l_map = dict(zip(l_schema.names, l_schema.types))
    r_map = dict(zip(r_schema.names, r_schema.types))
    l_types = [(c, l_map[c]) for c in left_cols]
    r_types = [(f"{c}{suffix}", r_map[c]) for c in right_cols]

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            key: t[key].cast(pa.int64()),
            ts: t[ts],
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        }
        for c in left_cols:
            cols[c] = pa.nulls(n, dict(l_types)[c])
        for c in right_cols:
            cols[f"{c}{suffix}"] = t[c]
        return pa.table(cols)

    tagged_l = left.map_batches(
        tag(1, left_cols, r_types), batch_format="pyarrow"
    )
    tagged_r = right.map_batches(tag_right, batch_format="pyarrow")
    both = tagged_l.union(tagged_r)

    tb_col = f"{tiebreak}{suffix}"
    # tolerance in the ts column's native unit (timestamp s/ms/us/ns)
    _unit_per_s = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}
    ts_type = l_map[ts]
    tol_native = (
        None
        if tolerance_s is None
        else int(tolerance_s) * _unit_per_s[getattr(ts_type, "unit", "us")]
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        t = t.combine_chunks()
        n = t.num_rows
        ks = t[key].to_numpy(zero_copy_only=False)
        tss = pc.cast(t[ts], pa.int64()).to_numpy(zero_copy_only=False)
        side = t["__side"].to_numpy(zero_copy_only=False)
        # tiebreak ordered by VALUE via sorted factorize: exact for
        # int64 beyond 2^53, works for strings, and nulls (all left
        # rows, plus any null right tiebreaks) get code -1 — they sort
        # first and never win a tie, matching SQL max()'s null rule.
        tb, _ = pd.factorize(t[tb_col].to_pandas(), sort=True)
        order = np.lexsort((tb, side, tss, ks))
        t2 = t.take(pa.array(order))
        ks, tss, side = ks[order], tss[order], side[order]
        is_r = side == 0
        idx = np.where(is_r, np.arange(n), -1)
        last = np.maximum.accumulate(idx)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = ks[1:] != ks[:-1]
        run_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        valid = (last >= 0) & (last >= run_start)
        lsel = np.nonzero(~is_r)[0]
        match = last[lsel]
        ok = valid[lsel]
        ridx = np.maximum(match, 0)
        if tol_native is not None:
            ok = ok & ((tss[lsel] - tss[ridx]) <= tol_native)
        lpart = t2.select([key, ts, *left_cols]).take(pa.array(lsel))
        okm = pa.array(ok)
        cols = {c: lpart[c] for c in (key, ts, *left_cols)}
        rts = t2[ts].take(pa.array(ridx))
        cols[f"{ts}{suffix}"] = pc.if_else(okm, rts, pa.nulls(len(lsel), rts.type))
        for c in out_right:
            rv = t2[c].take(pa.array(ridx))
            cols[c] = pc.if_else(okm, rv, pa.nulls(len(lsel), rv.type))
        return pa.table(cols)

    from xlink_ray.stages._bucket import bucket_shuffle

    return bucket_shuffle(both, key, nbuckets, per_bucket)
