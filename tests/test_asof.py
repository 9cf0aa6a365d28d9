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


def test_string_tiebreak_and_payload(ray_session):
    # right payload/tiebreak is a STRING column: factorized ordering,
    # max string wins ties
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "ts": pa.array([T0 + dt.timedelta(seconds=10)], pa.timestamp("us")),
                "lid": pa.array([100], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1], pa.int64()),
                "ts": pa.array([T0 + dt.timedelta(seconds=10)] * 3, pa.timestamp("us")),
                "tag": pa.array(["beta", "zeta", "alpha"], pa.string()),
            }
        )
    )
    out = asof_join(
        left, right, key="k", ts="ts", left_cols=["lid"], right_cols=["tag"]
    ).to_pandas()
    assert list(out["tag_r"]) == ["zeta"]


def test_millisecond_unit_tolerance(ray_session):
    # ts in timestamp[ms]: tolerance must be scaled to ms, not us
    def side(ts_s, payload, name):
        return rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1] * len(ts_s), pa.int64()),
                    "ts": pa.array(
                        [int(s * 1000) for s in ts_s], pa.timestamp("ms")
                    ),
                    name: pa.array(payload, pa.int64()),
                }
            )
        )

    out = asof_join(
        side([100.0], [1], "lid"),
        side([10.0, 97.0], [200, 201], "rid"),
        key="k",
        ts="ts",
        left_cols=["lid"],
        right_cols=["rid"],
        tolerance_s=5,
    ).to_pandas()
    assert list(out["rid_r"]) == [201]  # 3s lag ok; with us-scaled bug the
    # tolerance would be 5000s and this would also pass — so check the cut:
    out2 = asof_join(
        side([100.0], [1], "lid"),
        side([10.0], [200], "rid"),
        key="k",
        ts="ts",
        left_cols=["lid"],
        right_cols=["rid"],
        tolerance_s=5,
    ).to_pandas()
    assert out2["rid_r"].isna().all()  # 90s stale must be cut in ms units


def test_null_key_rejected(ray_session):
    import pytest

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, None], pa.int64()),
                "ts": pa.array([T0, T0], pa.timestamp("us")),
                "lid": pa.array([1, 2], pa.int64()),
            }
        )
    )
    right = _side([(1, 5, 200)], "rid")
    with pytest.raises(Exception, match="nulls"):
        asof_join(
            left, right, key="k", ts="ts", left_cols=["lid"], right_cols=["rid"]
        ).to_pandas()
