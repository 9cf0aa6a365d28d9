"""Stream-shaped operators over the ordered events log (SURVEY.md
§2.10: the reference has no streaming semantics; these are the
engine-level additions for event tables, implemented per the Ray Data
batch model — partition by key, order by time within the group).

* tumbling window aggregate: pure vectorized truncation + grouped agg
  (one shuffle),
* hopping (sliding) window aggregate: each event expands to
  size/hop overlapping windows (vectorized grid arithmetic), partial
  per-batch combine, then ONE grouped-sum shuffle — the expansion
  never inflates the shuffle beyond the distinct (type, window) keys,
* gap-based sessionization: ``groupby(user).map_groups`` over the
  time-sorted group — the documented ordering assumption is that a
  group fits a task and is sorted in-task (true after the hash
  shuffle; no cross-user state exists).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

__all__ = ["tumbling_window_agg", "hopping_window_agg", "sessionize"]


def hopping_window_agg(
    events: Dataset, size_minutes: int = 60, hop_minutes: int = 15
) -> Dataset:
    """(event_type, window_start, n, total_value) per HOPPING window:
    windows of ``size_minutes`` starting every ``hop_minutes`` — each
    event lands in ``size/hop`` overlapping windows.

    Scale shape: the k-fold expansion happens inside the batch and is
    immediately combined per (event_type, window_start) BEFORE the
    shuffle, so the exchange carries only distinct keys per block —
    pre-aggregation ahead of the groupby, not k× the event stream.
    ``total_value`` is integer 1e-4 units (the oracle-stable encoding
    shared with ``tumbling_window_agg``)."""
    size = size_minutes * 60
    hop = hop_minutes * 60
    k = -(-size // hop)  # ceil

    def expand_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_start": pa.array([], pa.timestamp("us")),
                    "n": pa.array([], pa.int64()),
                    "total_value": pa.array([], pa.float64()),
                }
            )
        es = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        grid = es // hop * hop
        # candidate starts grid - j*hop, kept while still covering ts
        starts = grid[:, None] - np.arange(k, dtype=np.int64)[None, :] * hop
        keep = starts > (es[:, None] - size)
        rows, js = np.nonzero(keep)
        ws = starts[rows, js]
        etype = np.asarray(t["event_type"].to_pylist())[rows]
        vals = t["value"].to_numpy(zero_copy_only=False)[rows]
        flat = pa.table(
            {
                "event_type": pa.array(etype, pa.string()),
                "window_start": pa.array(ws * 1_000_000).cast(pa.timestamp("us")),
                "value": pa.array(vals),
            }
        )
        # per-batch partial combine: the shuffle sees distinct keys
        # only (count_all = row count, the count(*) convention shared
        # with tumbling_window_agg — ('value','count') would skip nulls)
        part = flat.group_by(["event_type", "window_start"]).aggregate(
            [([], "count_all"), ("value", "sum")]
        )
        return part.rename_columns(["event_type", "window_start", "n", "total_value"])

    g = (
        events.map_batches(expand_partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"), Sum("total_value", alias_name="total_value"))
    )

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": t["window_start"],
                "n": pc.cast(t["n"], pa.int64()),
                "total_value": pc.cast(
                    pc.round(
                        pc.multiply(t["total_value"], 10000.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    return g.map_batches(fmt, batch_format="pyarrow")


def tumbling_window_agg(events: Dataset, unit: str = "hour") -> Dataset:
    """(event_type, window_start, n, total_value) per tumbling window."""

    def trunc(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pc.floor_temporal(t["ts"], unit=unit),
                "value": t["value"],
            }
        )

    g = events.map_batches(trunc, batch_format="pyarrow").groupby(
        ["event_type", "window_start"]
    )
    out = g.aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"))

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": t["window_start"],
                "n": pc.cast(t["n"], pa.int64()),
                # integer 1e-4 units, half away from zero (DuckDB round)
                "total_value": pc.cast(
                    pc.round(
                        pc.multiply(t["total_value"], 10000.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    return out.map_batches(fmt, batch_format="pyarrow")


def sessionize(events: Dataset, gap_minutes: int = 30, nbuckets: int = 64) -> Dataset:
    """Gap-based sessions per user: a new session starts when the gap
    since the previous event exceeds ``gap_minutes``.

    Output: (user_id, session_id, session_start, n_events, total_value)
    with session_id = running break count within the user (1-based),
    ordering by (ts, event_id) for deterministic ties.

    Scale shape (the ordered.py run-kernel pattern): ONE hash exchange
    of users into ~``nbuckets`` buckets — NOT one task per user — then
    an in-task lexsort of each bucket and pure-numpy run kernels:
    session breaks from one vectorized neighbor compare, per-session
    aggregates from ``reduceat`` at the break positions. No per-user
    Python calls anywhere."""
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    from xlink_ray.stages._bucket import bucket_shuffle

    def kernel(t: pa.Table) -> pa.Table:
        users = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        ts_us = (
            ts.astype("datetime64[us]").astype(np.int64)
            if ts.dtype.kind == "M"
            else ts.astype(np.int64)
        )
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((ids, ts_us, users))
        users, ts_us, v = users[order], ts_us[order], v[order]
        n = len(users)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (users[1:] != users[:-1]) | (
                ts_us[1:] - ts_us[:-1] > gap_us
            )
        cs = np.cumsum(brk.astype(np.int64))
        # session_id = breaks since the user's first row (1-based):
        # cs - cs[user_start] + 1, with user_start broadcast per row
        idx = np.arange(n, dtype=np.int64)
        new_user = np.ones(n, dtype=bool)
        if n > 1:
            new_user[1:] = users[1:] != users[:-1]
        ustart = np.maximum.accumulate(np.where(new_user, idx, 0))
        sid = cs - cs[ustart] + 1
        s_starts = np.flatnonzero(brk)
        counts = np.diff(np.r_[s_starts, n]).astype(np.int64)
        total = np.add.reduceat(v, s_starts) if n else np.zeros(0)
        scaled = total * 10000.0
        total_i = np.trunc(scaled + np.copysign(0.5, scaled)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(users[s_starts], pa.int64()),
                "session_id": pa.array(sid[s_starts], pa.int64()),
                # sorted by ts within the session → first row is the min
                "session_start": t["ts"].take(pa.array(order[s_starts], pa.int64())),
                "n_events": pa.array(counts),
                "total_value": pa.array(total_i),
            }
        )

    return bucket_shuffle(
        events.select_columns(["user_id", "ts", "event_id", "value"]),
        "user_id",
        nbuckets,
        kernel,
    )
