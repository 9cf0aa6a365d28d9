"""Constraint checking (stages/validate.py)."""

import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.validate import check_constraints


def _rules(ds, **kw):
    return {r["rule"]: r["violations"] for r in check_constraints(ds, **kw).take_all()}


def test_all_rules_counted(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 2, 3, 3, 3], pa.int64()),
                "txt": pa.array(["ok", None, "way too long", "ok", None, "x"], pa.string()),
            }
        )
    )
    got = _rules(ds, not_null=["txt"], unique=["id"], max_len={"txt": 5})
    assert got == {"not_null:txt": 2, "unique:id": 3, "max_len:txt": 1}


def test_clean_table_emits_zero_rows_per_rule(ray_session):
    ds = rd.from_arrow(
        pa.table({"id": pa.array([1, 2, 3], pa.int64()), "txt": pa.array(["a", "b", "c"])})
    )
    got = _rules(ds, not_null=["txt"], unique=["id"], max_len={"txt": 10})
    assert got == {"not_null:txt": 0, "unique:id": 0, "max_len:txt": 0}


def test_unique_counts_across_partitions(ray_session):
    # duplicates split across blocks must still be found (shuffle rule)
    ds = rd.from_items([{"id": i % 5} for i in range(50)]).repartition(10)
    got = _rules(ds, unique=["id"])
    assert got == {"unique:id": 45}


# ---- column profiling ----

from xlink_ray.stages.validate import profile_columns


def test_profile_columns_basic(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([5, 1, 1, None, 9], pa.int64()),
                "s": pa.array(["x", "x", None, "y", "z"], pa.string()),
            }
        )
    ).repartition(3)
    got = {r["column"]: r for r in profile_columns(ds, int_cols=["a"], str_cols=["s"]).take_all()}
    a = got["a"]
    assert (a["n_rows"], a["n_null"], a["min_v"], a["max_v"]) == (5, 1, 1, 9)
    s = got["s"]
    assert (s["n_rows"], s["n_null"], s["min_v"], s["max_v"]) == (5, 1, -1, -1)
    assert s["n_distinct"] == 3  # x, y, z (nulls excluded, SQL semantics)
    assert a["n_distinct"] == 3  # 5, 1, 9
