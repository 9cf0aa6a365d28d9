"""Unit tests for the relational pipeline helpers (the sf-dir queries
themselves are DuckDB-oracled via tools/check_queries.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.pipelines.relational import pivot_counts


def test_pivot_counts_wide_shape_and_zeros(ray_session):
    rows = [
        {"k": "a", "c": "x"},
        {"k": "a", "c": "x"},
        {"k": "a", "c": "y"},
        {"k": "b", "c": "y"},
    ]
    out = {r["k"]: r for r in pivot_counts(rd.from_items(rows), "k", "c").take_all()}
    assert out["a"]["x"] == 2 and out["a"]["y"] == 1
    # missing (b, x) combination must be an explicit zero
    assert out["b"]["x"] == 0 and out["b"]["y"] == 1


def test_pivot_counts_category_columns_sorted_lowercase(ray_session):
    rows = [{"k": 1, "c": "B"}, {"k": 1, "c": "A"}]
    t = pivot_counts(rd.from_items(rows), "k", "c").take_all()[0]
    assert list(t.keys()) == ["k", "a", "b"]


def test_revenue_rollup_levels_consistent(ray_session, sf_small):
    from xlink_ray.pipelines.relational import revenue_rollup

    rows = revenue_rollup(sf_small).take_all()
    fine = [r for r in rows if r["n_name"] != "ALL" and r["r_name"] != "ALL"]
    regions = {r["r_name"]: r["revenue"] for r in rows if r["n_name"] == "ALL" and r["r_name"] != "ALL"}
    total = [r["revenue"] for r in rows if r["r_name"] == "ALL"]
    assert len(total) == 1
    # money4 rounding happens per level: allow <=1 unit (1e-4) slack per
    # aggregated nation row
    for rn, rev in regions.items():
        parts = sum(r["revenue"] for r in fine if r["r_name"] == rn)
        assert abs(parts - rev) <= len(fine)
    assert abs(sum(regions.values()) - total[0]) <= len(regions)
