"""Window operators (stages/windows.py): hopping-window semantics."""

import datetime as dt

import pyarrow as pa

import ray.data as rd


def _events(rows):
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    )


def test_hopping_window_membership(ray_session):
    from xlink_ray.stages.windows import hopping_window_agg

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    # one event mid-grid: must land in exactly size/hop = 4 windows,
    # at starts 11:15, 11:30, 11:45, 12:00
    got = (
        hopping_window_agg(
            _events([(1, base + dt.timedelta(minutes=7), "c", 2.5)]),
            size_minutes=60,
            hop_minutes=15,
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert len(got) == 4
    assert list(got["window_start"]) == [
        dt.datetime(2024, 1, 1, 11, 15),
        dt.datetime(2024, 1, 1, 11, 30),
        dt.datetime(2024, 1, 1, 11, 45),
        dt.datetime(2024, 1, 1, 12, 0),
    ]
    assert (got["n"] == 1).all()
    assert (got["total_value"] == 25000).all()  # 2.5 in 1e-4 units


def test_hopping_window_boundary_exclusive(ray_session):
    from xlink_ray.stages.windows import hopping_window_agg

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    # an event exactly ON a grid point: window [11:15, 12:15) contains
    # 12:00, but [11:00, 12:00) must NOT (end-exclusive)
    got = hopping_window_agg(
        _events([(1, base, "c", 1.0)]), size_minutes=60, hop_minutes=15
    ).to_pandas()
    starts = set(got["window_start"])
    assert dt.datetime(2024, 1, 1, 11, 0) not in starts
    assert dt.datetime(2024, 1, 1, 11, 15) in starts
    assert dt.datetime(2024, 1, 1, 12, 0) in starts
    assert len(got) == 4
