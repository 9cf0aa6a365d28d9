"""SCD2 intervals + funnel (stages/scd.py): pandas-reference equality
and edge behavior."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.scd import HIGH_DATE, funnel_steps, scd2_intervals


def _events():
    rows = [
        # user 1: A A B A  -> 3 intervals
        (1, "2024-01-01T00:00", 1, "A"),
        (1, "2024-01-01T01:00", 2, "A"),
        (1, "2024-01-01T02:00", 3, "B"),
        (1, "2024-01-01T03:00", 4, "A"),
        # user 2: single event
        (2, "2024-01-01T00:30", 5, "C"),
        # user 3: tie on ts broken by event_id (B then A)
        (3, "2024-01-01T00:00", 7, "B"),
        (3, "2024-01-01T00:00", 8, "A"),
    ]
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([np.datetime64(r[1], "us") for r in rows]),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def test_scd2_intervals_reference(ray_session):
    got = (
        scd2_intervals(rd.from_arrow(_events()))
        .to_pandas()
        .sort_values(["user_id", "valid_from"])
        .reset_index(drop=True)
    )
    u1 = got[got.user_id == 1]
    assert list(u1["event_type"]) == ["A", "B", "A"]
    assert list(u1["n_events"]) == [2, 1, 1]
    assert list(u1["is_current"]) == [0, 0, 1]
    # valid_to chains to the next interval's valid_from
    assert u1.iloc[0]["valid_to"] == u1.iloc[1]["valid_from"]
    assert u1.iloc[2]["valid_to"] == pd.Timestamp(HIGH_DATE.item())
    u2 = got[got.user_id == 2]
    assert len(u2) == 1 and u2.iloc[0]["is_current"] == 1
    u3 = got[got.user_id == 3]
    assert list(u3["event_type"]) == ["B", "A"]  # event_id tie-break


def test_funnel_steps_reference(ray_session):
    rows = [
        (1, "2024-01-01T00:00", 1, "signup"),
        (1, "2024-01-01T01:00", 2, "click"),
        (1, "2024-01-01T02:00", 3, "purchase"),
        (2, "2024-01-01T00:00", 4, "click"),     # click BEFORE signup
        (2, "2024-01-01T01:00", 5, "signup"),
        (2, "2024-01-01T02:00", 6, "purchase"),  # no click after signup
        (3, "2024-01-01T00:00", 7, "view"),      # never signs up
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([np.datetime64(r[1], "us") for r in rows]),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    got = (
        funnel_steps(rd.from_arrow(t), steps=["signup", "click", "purchase"])
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert got.loc[1, "n_steps"] == 3
    assert got.loc[2, "n_steps"] == 1  # strictly-after: early click doesn't count
    assert got.loc[3, "n_steps"] == 0
    high = pd.Timestamp(HIGH_DATE.item())
    assert got.loc[2, "ts_2"] == high and got.loc[3, "ts_1"] == high


def test_scd2_and_funnel_nanosecond_input(ray_session):
    """datetime64[ns] order columns (pandas-written parquet) must NOT
    wrap the 9999-12-31 sentinel to year 1816 — the input is coarsened
    to microseconds on entry."""
    ns = _events().set_column(
        1, "ts", _events()["ts"].cast(pa.timestamp("ns"))
    )
    got = scd2_intervals(rd.from_arrow(ns)).to_pandas()
    cur = got[got.is_current == 1]
    assert len(cur) == 3
    assert (cur["valid_to"] == pd.Timestamp(HIGH_DATE.item())).all()
    f = funnel_steps(rd.from_arrow(ns), steps=["A", "Z"]).to_pandas()
    assert (f["ts_2"] == pd.Timestamp(HIGH_DATE.item())).all()


def test_weekly_retention_reference(ray_session):
    """Hand-built cohorts: two users starting week 0 (one retained in
    week 1), one user starting week 1."""
    from xlink_ray.stages.scd import weekly_retention

    def d(day):
        return np.datetime64(f"2024-01-{day:02d}T12:00", "us")

    # 2024-01-01 is a Monday -> week boundary at Jan 8
    rows = [
        (1, d(2)), (1, d(3)), (1, d(9)),   # cohort w, active w and w+1
        (2, d(4)),                          # cohort w only
        (3, d(10)),                         # cohort w+1
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows]),
        }
    )
    got = (
        weekly_retention(rd.from_arrow(t))
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    w0 = got["cohort_week"].min()
    rowset = set(map(tuple, got[["cohort_week", "week_offset", "n_users"]].values.tolist()))
    assert rowset == {(w0, 0, 2), (w0, 1, 1), (w0 + 1, 0, 1)}


def test_debounce_events_reference(ray_session):
    from xlink_ray.stages.scd import debounce_events

    def d(h):
        return np.datetime64("2024-01-01T00:00", "us") + np.timedelta64(h, "h")

    rows = [
        (1, d(0), 1, "a"),   # first -> kept
        (1, d(1), 2, "a"),   # 1h gap -> dropped
        (1, d(4), 3, "a"),   # 3h after PREVIOUS (lag rule) -> kept
        (1, d(5), 4, "b"),   # different type: first -> kept
        (2, d(0), 5, "a"),   # other user: first -> kept
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows]),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    got = debounce_events(
        rd.from_arrow(t), min_gap_us=2 * 3600 * 1_000_000
    ).to_pandas()
    assert sorted(got["event_id"]) == [1, 3, 4, 5]
    assert got.set_index("event_id").loc[3, "gap_us"] == 3 * 3600 * 1_000_000
