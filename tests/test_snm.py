"""Sorted-Neighborhood blocking (stages/snm.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _brute(ids, keys, window):
    order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
    out = set()
    for p in range(len(order)):
        for q in range(p + 1, min(p + window + 1, len(order))):
            out.add((ids[order[p]], ids[order[q]]))
    return out


def _run(ids, keys, window, nbuckets, ray_session):
    from xlink_ray.stages.snm import sorted_neighborhood_pairs

    t = pa.table(
        {"id": pa.array(ids, pa.int64()), "key": pa.array(keys, pa.string())}
    )
    got = sorted_neighborhood_pairs(
        rd.from_arrow(t).repartition(5), key_col="key", id_col="id",
        window=window, nbuckets=nbuckets,
    ).to_pandas()
    return set(zip(got["id_a"], got["id_b"])), got


def test_snm_matches_brute_force(ray_session):
    rng = np.random.default_rng(31)
    ids = rng.permutation(300).astype(int).tolist()
    keys = [f"k{int(rng.integers(0, 120)):04d}" for _ in ids]  # many dup keys
    got, df = _run(ids, keys, window=4, nbuckets=16, ray_session=ray_session)
    want = _brute(ids, keys, 4)
    assert got == want
    # keys ride the pairs correctly
    kmap = dict(zip(ids, keys))
    for _, r in df.head(50).iterrows():
        assert r["key_a"] == kmap[r["id_a"]] and r["key_b"] == kmap[r["id_b"]]


def test_snm_buckets_smaller_than_window(ray_session):
    # nbuckets >> rows per bucket: chains span 3+ buckets and must
    # still be exact via the full-bucket halo
    ids = list(range(40))
    keys = [f"{i:03d}" for i in ids]
    got, _ = _run(ids, keys, window=7, nbuckets=32, ray_session=ray_session)
    want = _brute(ids, keys, 7)
    assert got == want


def test_snm_single_bucket_equals_multi(ray_session):
    rng = np.random.default_rng(7)
    ids = list(range(120))
    keys = [f"x{int(rng.integers(0, 40)):03d}" for _ in ids]
    one, _ = _run(ids, keys, window=3, nbuckets=1, ray_session=ray_session)
    many, _ = _run(ids, keys, window=3, nbuckets=24, ray_session=ray_session)
    assert one == many == _brute(ids, keys, 3)
