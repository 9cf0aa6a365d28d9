"""Backward as-of join (stages/asof.py): edge semantics — inclusive
match, tie rule, tolerance, no-predecessor nulls, bucket-collision
isolation."""

import datetime as dt

import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.asof import asof_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _side(rows, payload_name):
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [T0 + dt.timedelta(seconds=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                payload_name: pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


def _run(left_rows, right_rows, **kw):
    left = _side(left_rows, "lid")
    right = _side(right_rows, "rid")
    out = asof_join(
        left, right, key="k", ts="ts", left_cols=["lid"], right_cols=["rid"], **kw
    ).to_pandas()
    return {
        int(r.lid): (None if out.isna().at[i, "rid_r"] else int(r.rid_r))
        for i, r in out.iterrows()
    }


def test_basic_backward_inclusive(ray_session):
    # left at t=10 matches right at t=10 (inclusive), not t=11
    got = _run(
        [(1, 10, 100), (1, 5, 101)],
        [(1, 10, 200), (1, 11, 201), (1, 2, 202)],
    )
    assert got == {100: 200, 101: 202}


def test_no_predecessor_is_null(ray_session):
    got = _run([(1, 1, 100)], [(1, 5, 200)])
    assert got == {100: None}


def test_tie_takes_max_tiebreak(ray_session):
    # two right rows at the exact match ts: max rid wins
    got = _run([(1, 10, 100)], [(1, 10, 205), (1, 10, 209), (1, 10, 201)])
    assert got == {100: 209}


def test_tolerance_cuts_stale_match(ray_session):
    got = _run(
        [(1, 100, 100), (1, 101, 101)],
        [(1, 10, 200), (1, 99, 201)],
        tolerance_s=5,
    )
    # lid 100 matches rid 201 (lag 1s <= 5); lid 101 lag 2s also ok
    assert got == {100: 201, 101: 201}
    got = _run([(1, 100, 100)], [(1, 10, 200)], tolerance_s=5)
    assert got == {100: None}  # only match is 90s stale


def test_keys_isolated_even_when_buckets_collide(ray_session):
    # keys 3 and 3+nbuckets land in the same bucket; matches must not
    # leak across the key boundary inside the bucket
    nb = 4
    got = _run(
        [(3, 10, 100), (3 + nb, 10, 101)],
        [(3, 5, 200)],
        nbuckets=nb,
    )
    assert got == {100: 200, 101: None}


def test_right_only_keys_emit_nothing(ray_session):
    got = _run([(1, 10, 100)], [(1, 5, 200), (2, 1, 300), (2, 2, 301)])
    assert got == {100: 200}


def test_types_survive_roundtrip(ray_session):
    left = _side([(1, 10, 100)], "lid")
    right = _side([(1, 5, 200)], "rid")
    out = asof_join(
        left, right, key="k", ts="ts", left_cols=["lid"], right_cols=["rid"]
    )
    tbl = pa.Table.from_pandas(out.to_pandas())
    assert tbl["lid"].type == pa.int64()
    assert tbl["k"].type == pa.int64()
