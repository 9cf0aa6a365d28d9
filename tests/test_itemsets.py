"""basket_pair_lift (stages/itemsets.py) vs a direct Python oracle."""

from collections import Counter
from itertools import combinations

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.itemsets import basket_pair_lift


def _oracle(rows, min_support):
    baskets: dict[int, set[int]] = {}
    for g, item in rows:
        baskets.setdefault(g, set()).add(item)
    pair_n = Counter()
    unary = Counter()
    for items in baskets.values():
        for item in items:
            unary[item] += 1
        for a, b in combinations(sorted(items), 2):
            pair_n[(a, b)] += 1
    g_total = float(len(baskets))
    return {
        (a, b): (n, (n * g_total) / (unary[a] * unary[b]))
        for (a, b), n in pair_n.items()
        if n >= min_support
    }


def _make_rows(seed=7, n_groups=120, n_items=25, dup_rows=True):
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_groups):
        size = int(rng.integers(1, 9))
        items = rng.choice(n_items, size=size, replace=False)
        for item in items:
            rows.append((g, int(item)))
            if dup_rows and rng.random() < 0.3:
                rows.append((g, int(item)))  # duplicate (g, item) rows
    return rows


def _run(rows, min_support=2, **kw):
    g = pa.array([r[0] for r in rows], pa.int64())
    it = pa.array([r[1] for r in rows], pa.int64())
    # many small blocks so baskets span batches
    ds = rd.from_arrow(pa.table({"g": g, "item": it})).repartition(7)
    return basket_pair_lift(ds, "g", "item", min_support=min_support, **kw)


def test_matches_oracle(ray_session):
    rows = _make_rows()
    got = _run(rows).to_pandas()
    exp = _oracle(rows, 2)
    assert len(got) == len(exp)
    for rec in got.itertuples():
        n, lift = exp[(rec.item_a, rec.item_b)]
        assert rec.item_a < rec.item_b
        assert rec.support == n
        assert abs(rec.lift - lift) < 1e-12


def test_bucket_count_invariance(ray_session):
    rows = _make_rows(seed=11)
    a = (
        _run(rows, nbuckets=1)
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    b = (
        _run(rows, nbuckets=32)
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_negative_item_rejected(ray_session):
    import pytest

    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array([1, 1], pa.int64()),
                "item": pa.array([-5, 3], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="nonnegative"):
        basket_pair_lift(ds, "g", "item").to_pandas()
