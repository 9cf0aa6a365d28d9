"""interval_count_join (stages/interval.py): boundary semantics,
key isolation, empty/absent sides, and the overflow fallback kernel."""

import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.interval import interval_count_join


def _ds(rows, names, types):
    return rd.from_arrow(
        pa.table(
            {
                nm: pa.array([r[i] for r in rows], tp)
                for i, (nm, tp) in enumerate(zip(names, types))
            }
        )
    )


def _run(intervals, points, **kw):
    """intervals: (iid, k, start_us, end_us); points: (k, ts_us)."""
    iv = _ds(
        [(i[0], i[1], i[2], i[3]) for i in intervals],
        ["iid", "k", "s", "e"],
        [pa.int64(), pa.int64(), pa.timestamp("us"), pa.timestamp("us")],
    )
    pt = _ds(
        points, ["k", "ts"], [pa.int64(), pa.timestamp("us")]
    )
    out = interval_count_join(
        iv, pt, key="k", start="s", end="e", ts="ts", interval_cols=["iid"], **kw
    ).to_pandas()
    return dict(zip(out["iid"].astype(int), out["n_points"].astype(int)))


def test_half_open_boundaries(ray_session):
    # [10, 20): ts=10 counted, ts=20 not
    got = _run([(1, 7, 10, 20)], [(7, 10), (7, 19), (7, 20), (7, 9)])
    assert got == {1: 2}


def test_key_isolation_and_absent_key(ray_session):
    got = _run(
        [(1, 7, 0, 100), (2, 8, 0, 100), (3, 9, 0, 100)],
        [(7, 50), (7, 60), (8, 50)],
    )
    assert got == {1: 2, 2: 1, 3: 0}


def test_empty_points(ray_session):
    got = _run([(1, 7, 0, 100)], [(8, 1)])  # no same-key points at all
    assert got == {1: 0}


def test_inverted_interval_is_zero(ray_session):
    got = _run([(1, 7, 100, 0)], [(7, 50)])
    assert got == {1: 0}


def test_interval_outside_point_range(ray_session):
    got = _run(
        [(1, 7, 1000, 2000), (2, 7, 0, 5)],  # entirely after / before points
        [(7, 50), (7, 60)],
    )
    assert got == {1: 0, 2: 0}


def test_overflow_fallback_kernel(ray_session):
    # span ~ 2.4e18 us forces len(uk)*span >= 2^62 → per-key numpy path
    far = 2_400_000_000_000_000_000
    got = _run(
        [(1, 7, 0, far), (2, 8, far - 10, far + 10), (3, 7, far + 1, far + 2)],
        [(7, 5), (7, far - 1), (8, far), (8, far + 9)],
    )
    assert got == {1: 2, 2: 2, 3: 0}
