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


def sessionize(events: Dataset, gap_minutes: int = 30) -> Dataset:
    """Gap-based sessions per user: a new session starts when the gap
    since the previous event exceeds ``gap_minutes``.

    Output: (user_id, session_id, session_start, n_events, total_value)
    with session_id = running break count within the user (1-based),
    ordering by (ts, event_id) for deterministic ties.
    """
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        brk = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            brk[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(brk)
        g = g.assign(session_id=sid)
        out = (
            g.groupby("session_id", sort=True)
            .agg(
                user_id=("user_id", "first"),
                session_start=("ts", "min"),
                n_events=("event_id", "size"),
                total_value=("value", "sum"),
            )
            .reset_index()
        )
        v = out["total_value"].to_numpy() * 10000.0
        out["total_value"] = np.trunc(v + np.copysign(0.5, v)).astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_id", "session_start", "n_events", "total_value"]]

    return events.select_columns(["user_id", "ts", "event_id", "value"]).groupby(
        "user_id"
    ).map_groups(per_user, batch_format="pandas")
