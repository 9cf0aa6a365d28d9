"""Distributed k-means + SemDeDup semantic dedup (stages/kmeans.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _local_lloyd(ids, m, k, iters, quant=6):
    o = np.argsort(ids)
    ids, m = ids[o], m[o]
    n = len(ids)
    c = np.round(m[(np.arange(k) * n) // k], quant)
    for _ in range(iters):
        d2 = (m * m).sum(1)[:, None] - 2 * (m @ c.T) + (c * c).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        newc = c.copy()
        for cc in range(k):
            if (a == cc).sum():
                newc[cc] = np.round(m[a == cc].mean(0), quant)
        c = newc
    return c


def _vec_table(ids, m):
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m], pa.list_(pa.float64())),
        }
    )


def test_kmeans_fit_matches_local_lloyd(ray_session):
    from xlink_ray.stages.kmeans import kmeans_fit

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((5, 8)) * 3
    m = np.concatenate([centers[i % 5] + rng.standard_normal(8) * 0.3 for i in range(300)]).reshape(300, 8)
    ids = rng.permutation(300).astype(np.int64)
    ds = rd.from_arrow(_vec_table(ids, m)).repartition(9)

    got = kmeans_fit(ds, k=5, iters=3)
    want = _local_lloyd(ids, m, k=5, iters=3)
    assert np.array_equal(got, want)


def test_kmeans_empty_cell_keeps_centroid(ray_session):
    from xlink_ray.stages.kmeans import kmeans_fit

    # two tight far-apart clusters, k=4: at least two cells lose all
    # members after the first update and must carry their centroid over
    m = np.concatenate(
        [np.full((20, 4), 0.0) + np.arange(20)[:, None] * 1e-3,
         np.full((20, 4), 100.0) + np.arange(20)[:, None] * 1e-3]
    )
    ids = np.arange(40, dtype=np.int64)
    ds = rd.from_arrow(_vec_table(ids, m)).repartition(3)
    got = kmeans_fit(ds, k=4, iters=3)
    want = _local_lloyd(ids, m, k=4, iters=3)
    assert np.array_equal(got, want)


def test_kmeans_assign_nearest_and_tiebreak(ray_session):
    from xlink_ray.stages.kmeans import kmeans_assign

    cents = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 0.0]])  # duplicate centroid
    m = np.array([[0.1, 0.0], [1.9, 0.0], [1.0, 0.0]])  # last is equidistant to all
    ds = rd.from_arrow(_vec_table(np.arange(3, dtype=np.int64), m))
    out = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    # ties break to the lowest cell id (argmin semantics)
    assert out["cell"].tolist() == [0, 1, 0]


def test_semantic_dedup_drops_only_same_cell_near_dups(ray_session):
    from xlink_ray.stages.kmeans import semantic_dedup

    cents = np.array([[0.0, 0.0, 0.0, 1.0], [1.0, 0.0, 0.0, 0.0]])
    rows = np.array(
        [
            [0.0, 0.0, 0.0, 5.0],   # id 0, cell 0
            [0.0, 0.01, 0.0, 5.0],  # id 1, cell 0 — near-dup of 0 → dropped
            [0.0, 3.0, 0.0, 3.1],   # id 2, cell 0 — far → kept
            [5.0, 0.0, 0.0, 0.0],   # id 3, cell 1
            [5.0, 0.05, 0.0, 0.0],  # id 4, cell 1 — near-dup of 3 → dropped
        ]
    )
    ds = rd.from_arrow(_vec_table(np.arange(5, dtype=np.int64), rows))
    kept = semantic_dedup(ds, cents, tau=0.99).to_pandas().sort_values("vec_id")
    assert kept["vec_id"].tolist() == [0, 2, 3]
    assert kept["cell"].tolist() == [0, 0, 1]


def test_semantic_dedup_hot_cell_grid_equals_single_task(ray_session):
    """One skewed cell (most rows in it) past cell_cap must split into
    the exact triangular grid and still produce the single-task output
    (round-3 VERDICT item: hot-cell OOM bound for SemDeDup)."""
    from xlink_ray.stages.kmeans import semantic_dedup

    rng = np.random.default_rng(23)
    # 180 rows packed near one centroid (hot cell), 20 near the other
    hot = rng.standard_normal((180, 6)) * 0.05 + np.array([5.0, 0, 0, 0, 0, 0])
    cold = rng.standard_normal((20, 6)) * 0.05 + np.array([-5.0, 0, 0, 0, 0, 0])
    m = np.concatenate([hot, cold])
    ids = rng.permutation(200).astype(np.int64)
    cents = np.array([[5.0, 0, 0, 0, 0, 0], [-5.0, 0, 0, 0, 0, 0]])
    key = lambda d: sorted(map(tuple, d[["vec_id", "cell"]].to_numpy()))

    plain = semantic_dedup(
        rd.from_arrow(_vec_table(ids, m)).repartition(7), cents, tau=0.97,
        cell_cap=None,
    ).to_pandas()
    grid = semantic_dedup(
        rd.from_arrow(_vec_table(ids, m)).repartition(7), cents, tau=0.97,
        cell_cap=32, block=16,
    ).to_pandas()
    assert key(plain) == key(grid)
    # the hot cell really dropped rows (non-vacuous) and kept some
    kept_hot = grid[grid.cell == 0]
    assert 0 < len(kept_hot) < 180


def test_init_rank_distributed_matches_driver_sort(ray_session):
    """_init_rank's bucketed rank selection must pick exactly the ids a
    full driver-side sort would pick, including skewed / negative /
    gappy id spaces."""
    from xlink_ray.stages.kmeans import _init_rank

    rng = np.random.default_rng(5)
    ids = np.unique(rng.integers(-1_000_000, 1_000_000, size=500))
    m = rng.standard_normal((len(ids), 4))
    ds = rd.from_arrow(_vec_table(ids, m)).repartition(9)
    k = 7
    got = _init_rank(ds, k, "vec_id", "embedding", nbuckets=16)
    ids_sorted = np.sort(ids)
    targets = ids_sorted[(np.arange(k) * len(ids)) // k]
    pos = {int(i): r for r, i in enumerate(ids)}
    want = np.stack([m[pos[int(t)]] for t in targets])
    assert np.array_equal(got, want)


def test_semantic_dedup_blocked_prefix_equals_unblocked(ray_session):
    from xlink_ray.stages.kmeans import kmeans_fit, semantic_dedup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 6))
    # add explicit near-duplicates
    m = np.concatenate([base, base[:10] + rng.standard_normal((10, 6)) * 1e-3])
    ids = np.arange(70, dtype=np.int64)
    ds = rd.from_arrow(_vec_table(ids, m)).repartition(5)
    cents = kmeans_fit(ds, k=3, iters=2)
    small = semantic_dedup(ds, cents, tau=0.98, block=4).to_pandas()
    big = semantic_dedup(ds, cents, tau=0.98, block=4096).to_pandas()
    key = lambda d: sorted(map(tuple, d[["vec_id", "cell"]].to_numpy()))
    assert key(small) == key(big)
    assert len(small) < 70  # the planted dups actually dropped
