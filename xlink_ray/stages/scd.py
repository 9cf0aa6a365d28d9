"""Slowly-changing-dimension maintenance and ordered-sequence analytics
over an event stream — the warehouse-side operators of a curation
pipeline (SCD type-2 validity intervals; step-funnel conversion).

Both are ONE key-bucket shuffle + numpy run kernels per bucket (the
``ordered.py`` pattern): rows of one key meet in their bucket, a single
lexsort orders them, and run/step detection is vectorized — no per-key
python, no window state on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["scd2_intervals", "funnel_steps", "weekly_retention", "debounce_events"]

# the SCD "high date": open intervals / missed funnel steps carry this
# sentinel instead of NULL (NaT breaks exact-equality comparisons, and
# the high-date convention is the standard warehouse encoding)
HIGH_DATE = np.datetime64("9999-12-31T00:00:00.000000")


def _order_ts(g: "pa.Table", order_col: str) -> np.ndarray:
    """Order column as numpy, coarsened to microsecond resolution when
    finer: 9999-12-31 does not fit in int64 nanoseconds, so combining
    HIGH_DATE with a datetime64[ns] array (pandas-written parquet) would
    silently wrap the sentinel to year 1816. Coarsening on entry keeps
    the sentinel exact for any caller."""
    ts = g[order_col].to_numpy(zero_copy_only=False)
    if ts.dtype.kind == "M" and np.datetime_data(ts.dtype)[0] in ("ns", "ps", "fs", "as"):
        ts = ts.astype("datetime64[us]")
    return ts


def _order_ts_type(t: "pa.DataType") -> "pa.DataType":
    """Arrow output type matching ``_order_ts``'s coarsening."""
    if pa.types.is_timestamp(t) and t.unit == "ns":
        return pa.timestamp("us", tz=t.tz)
    return t


def scd2_intervals(
    ds: Dataset,
    key_col: str = "user_id",
    order_col: str = "ts",
    id_col: str = "event_id",
    attr_col: str = "event_type",
    nbuckets: int = 64,
) -> Dataset:
    """Type-2 SCD history per key: consecutive rows (ordered by
    ``order_col`` then ``id_col``) with an unchanged ``attr_col``
    collapse into one validity interval (nanosecond order columns are
    coarsened to microseconds so the high-date sentinel stays exact) →
    (key, attr, valid_from, valid_to, n_events, is_current) with
    ``valid_to`` = the next interval's ``valid_from`` (the 9999-12-31
    high date on the current row) — the gaps-and-islands collapse,
    distributed."""
    from xlink_ray.stages._bucket import bucket_shuffle

    def per_bucket(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False)
        ts = _order_ts(g, order_col)
        eid = g[id_col].to_numpy(zero_copy_only=False)
        attr = np.asarray(g[attr_col].to_pandas(), dtype=object)
        o = np.lexsort((eid, ts, k))
        k, ts, eid, attr = k[o], ts[o], eid[o], attr[o]
        n = len(k)
        if n == 0:
            tt = _order_ts_type(g[order_col].type)
            return pa.table(
                {
                    key_col: pa.array([], g[key_col].type),
                    attr_col: pa.array([], pa.string()),
                    "valid_from": pa.array([], tt),
                    "valid_to": pa.array([], tt),
                    "n_events": pa.array([], pa.int64()),
                    "is_current": pa.array([], pa.int64()),
                }
            )
        new_key = np.r_[True, k[1:] != k[:-1]]
        brk = new_key | np.r_[True, attr[1:] != attr[:-1]]
        starts = np.flatnonzero(brk)
        counts = np.diff(np.r_[starts, n])
        ends = starts + counts - 1
        run_key_last = np.r_[new_key[1:], True][ends]  # run is its key's last
        valid_from = ts[starts]
        # next run's valid_from within the same key, else null
        nxt = np.empty(len(starts), dtype=ts.dtype)
        nxt[:-1] = valid_from[1:]
        valid_to = pa.array(np.where(run_key_last, HIGH_DATE, nxt))
        return pa.table(
            {
                key_col: pa.array(k[starts]),
                attr_col: pa.array(attr[starts], pa.string()),
                "valid_from": pa.array(valid_from),
                "valid_to": valid_to,
                "n_events": pa.array(counts.astype(np.int64)),
                "is_current": pa.array(run_key_last.astype(np.int64)),
            }
        )

    out = bucket_shuffle(ds, key_col, nbuckets, per_bucket)
    return out.map_batches(
        lambda t: t.drop_columns(["__b"]) if "__b" in t.column_names else t,
        batch_format="pyarrow",
    )


def funnel_steps(
    ds: Dataset,
    steps: "list[str]",
    key_col: str = "user_id",
    order_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    nbuckets: int = 64,
) -> Dataset:
    """Ordered-step funnel per key: step i's timestamp is the EARLIEST
    ``steps[i]`` event strictly after step i-1's timestamp (classic
    open-window funnel) → (key, n_steps, ts_1..ts_k) with the
    9999-12-31 HIGH_DATE sentinel (NOT null) past the reached depth —
    the module-level high-date convention, kept so exact-equality
    comparisons work. One key-bucket shuffle; inside the bucket every
    step is one vectorized pass (sort + per-key searchsorted)."""
    from xlink_ray.stages._bucket import bucket_shuffle

    k_steps = len(steps)

    def per_bucket(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False)
        ts = _order_ts(g, order_col)
        eid = g[id_col].to_numpy(zero_copy_only=False)
        et = np.asarray(g[type_col].to_pandas(), dtype=object)
        o = np.lexsort((eid, ts, k))
        k, ts, eid, et = k[o], ts[o], eid[o], et[o]
        ukeys = np.unique(k)
        nat = np.datetime64("NaT")
        cur = np.full(len(ukeys), np.datetime64("1677-09-22"), dtype=ts.dtype)
        reached = np.zeros(len(ukeys), dtype=np.int64)
        cols = []
        alive = np.ones(len(ukeys), dtype=bool)
        for si, step in enumerate(steps):
            m = et == step
            sk, sts = k[m], ts[m]
            # earliest step event strictly after cur, per key
            step_ts = np.full(len(ukeys), nat, dtype=ts.dtype)
            if len(sk):
                kidx = np.searchsorted(ukeys, sk)
                after = sts > cur[kidx]
                kidx, sts2 = kidx[after], sts[after]
                if len(kidx):
                    order2 = np.lexsort((sts2, kidx))
                    kidx, sts2 = kidx[order2], sts2[order2]
                    first = np.r_[True, kidx[1:] != kidx[:-1]]
                    step_ts[kidx[first]] = sts2[first]
            hit = alive & ~np.isnat(step_ts)
            step_ts[~hit] = nat
            reached[hit] += 1
            cur = np.where(hit, step_ts, cur)
            alive = hit
            cols.append(np.where(np.isnat(step_ts), HIGH_DATE, step_ts))
        out = {key_col: pa.array(ukeys), "n_steps": pa.array(reached)}
        for si in range(k_steps):
            out[f"ts_{si + 1}"] = pa.array(cols[si])
        return pa.table(out)

    out = bucket_shuffle(ds, key_col, nbuckets, per_bucket)
    return out.map_batches(
        lambda t: t.drop_columns(["__b"]) if "__b" in t.column_names else t,
        batch_format="pyarrow",
    )


def weekly_retention(
    ds: Dataset,
    key_col: str = "user_id",
    order_col: str = "ts",
    nbuckets: int = 64,
) -> Dataset:
    """Cohort retention matrix: users grouped by FIRST-ACTIVITY week
    (Monday-start, integer epoch-week = (epoch_days + 3) // 7 — no
    date_trunc, so the arithmetic is engine-identical), counted in
    every later week they were active →
    (cohort_week, week_offset, n_users).

    One key-bucket shuffle: a user's rows meet in their bucket, the
    cohort week is the per-user min, distinct (user, week) pairs come
    from one lexsort, and the per-bucket partial (cohort, offset)
    counts collapse in a tiny final groupby — user ids never leave
    their bucket."""
    from ray.data.aggregate import Sum

    from xlink_ray.stages._bucket import bucket_shuffle

    def per_bucket(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False)
        ts = g[order_col].to_numpy(zero_copy_only=False)
        days = ts.astype("datetime64[D]").astype(np.int64)
        week = (days + 3) // 7
        o = np.lexsort((week, k))
        k, week = k[o], week[o]
        first = np.r_[True, (k[1:] != k[:-1]) | (week[1:] != week[:-1])]
        k, week = k[first], week[first]  # distinct (user, week)
        ustart = np.r_[True, k[1:] != k[:-1]]
        cohort = np.repeat(week[ustart], np.diff(np.r_[np.flatnonzero(ustart), len(k)]))
        off = week - cohort
        pairs = cohort * (1 << 20) + off
        up, cnt = np.unique(pairs, return_counts=True)
        return pa.table(
            {
                "cohort_week": pa.array(up >> 20),
                "week_offset": pa.array(up & ((1 << 20) - 1)),
                "n_users": pa.array(cnt.astype(np.int64)),
            }
        )

    out = bucket_shuffle(
        ds.select_columns([key_col, order_col]), key_col, nbuckets, per_bucket
    ).groupby(["cohort_week", "week_offset"]).aggregate(Sum("n_users", alias_name="n_users"))
    return out


def debounce_events(
    ds: Dataset,
    min_gap_us: int,
    key_col: str = "user_id",
    order_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    nbuckets: int = 64,
) -> Dataset:
    """Windowed suppression (the recrawl-politeness rule): keep an
    event iff it is the FIRST of its (key, type) or ≥ ``min_gap_us``
    after the PREVIOUS event of that (key, type) — the gap test against
    the immediate predecessor (the lag rule), not against the last
    KEPT event, so the filter is one vectorized diff with no sequential
    state and an exact lag-window SQL replica.

    → the kept rows (key, type, ts, event_id, gap_us; gap = -1 on each
    (key, type)'s first event). One key-bucket shuffle."""
    from xlink_ray.stages._bucket import bucket_shuffle

    def per_bucket(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False)
        ts = g[order_col].to_numpy(zero_copy_only=False)
        eid = g[id_col].to_numpy(zero_copy_only=False)
        et = np.asarray(g[type_col].to_pandas(), dtype=object)
        o = np.lexsort((eid, ts, k, et))
        # group runs are (type, key) ordered by (ts, id)
        k, ts, eid, et = k[o], ts[o], eid[o], et[o]
        n = len(k)
        if n == 0:
            return pa.table(
                {
                    key_col: pa.array([], g[key_col].type),
                    type_col: pa.array([], pa.string()),
                    order_col: pa.array([], g[order_col].type),
                    id_col: pa.array([], g[id_col].type),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        new_grp = np.r_[True, (et[1:] != et[:-1]) | (k[1:] != k[:-1])]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = -1
        if n > 1:
            gap[1:] = (ts[1:] - ts[:-1]).astype("timedelta64[us]").astype(np.int64)
        gap[new_grp] = -1
        keep = new_grp | (gap >= min_gap_us)
        return pa.table(
            {
                key_col: pa.array(k[keep]),
                type_col: pa.array(et[keep], pa.string()),
                order_col: pa.array(ts[keep]),
                id_col: pa.array(eid[keep]),
                "gap_us": pa.array(gap[keep]),
            }
        )

    out = bucket_shuffle(ds, key_col, nbuckets, per_bucket)
    return out.map_batches(
        lambda t: t.drop_columns(["__b"]) if "__b" in t.column_names else t,
        batch_format="pyarrow",
    )
