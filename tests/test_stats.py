"""Grouped top-k and exact grouped quantiles (stages/stats.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def test_group_topk_matches_sorted_oracle(ray_session):
    from xlink_ray.stages.stats import group_topk

    rng = np.random.default_rng(3)
    rows = [
        {"g": f"g{int(rng.integers(4))}", "v": int(rng.integers(100)), "id": i}
        for i in range(500)
    ]
    got = group_topk(
        rd.from_arrow(pa.Table.from_pylist(rows)).repartition(7),
        group_col="g", order_col="v", k=5, tie_col="id",
    ).to_pandas()
    import pandas as pd

    df = pd.DataFrame(rows)
    want = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        .groupby("g")
        .head(5)
    )
    key = lambda d: sorted(map(tuple, d[["g", "v", "id"]].to_numpy()))
    assert key(got) == key(want)


def test_grouped_quantiles_exact(ray_session):
    from xlink_ray.stages.stats import grouped_quantiles

    rng = np.random.default_rng(9)
    rows = [
        {"g": f"g{int(rng.integers(3))}", "v": int(rng.integers(50))}
        for i in range(400)
    ]
    got = grouped_quantiles(
        rd.from_arrow(pa.Table.from_pylist(rows)).repartition(5), "g", "v",
        qs=(0.5, 0.9),
    ).to_pandas()
    import collections

    vals = collections.defaultdict(list)
    for r in rows:
        vals[r["g"]].append(r["v"])
    for _, row in got.iterrows():
        s = sorted(vals[row["g"]])
        k = int(np.ceil(row["q"] * len(s)))
        assert row["v"] == s[k - 1], (row["g"], row["q"])


def test_grouped_quantiles_rank_is_exact_ceil(ray_session):
    """float ceil(0.07*100) is 8; the integer rank arithmetic must give
    the documented ceil(q*n) = 7."""
    import ray.data as rd

    from xlink_ray.stages.stats import grouped_quantiles

    rows = [{"g": "a", "v": i + 1} for i in range(100)]  # v = 1..100
    got = grouped_quantiles(
        rd.from_arrow(pa.Table.from_pylist(rows)), "g", "v", qs=(0.07,)
    ).to_pandas()
    assert got.loc[0, "v"] == 7


def test_group_topk_null_group_is_own_group(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from xlink_ray.stages.stats import group_topk

    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array(["a", "a", "a", None, None, None], pa.string()),
                "v": pa.array([3, 2, 1, 30, 20, 10], pa.int64()),
                "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            }
        )
    )
    out = group_topk(ds, "g", "v", 2, "id").to_pandas()
    got = sorted(out["id"].astype(int))
    # top-2 of group 'a' = ids 1,2; top-2 of the null group = ids 4,5
    assert got == [1, 2, 4, 5]


def test_global_rank_ascending_and_skew(ray_session):
    """global_rank vs a serial sort oracle: ascending order, heavy
    value skew (one value holds half the rows — bucket arithmetic must
    still produce exact ranks via the id tiebreak)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xlink_ray.stages.stats import global_rank

    rng = np.random.default_rng(8)
    vals = np.concatenate([np.full(150, 7), rng.integers(0, 1000, 150)])
    ids = rng.permutation(len(vals)) * 3 + 1
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    )
    got = {
        r["doc_id"]: r["rank"]
        for r in global_rank(ds, "v", descending=False, nbuckets=5).take_all()
    }
    order = sorted(zip(vals, ids))
    exp = {did: i + 1 for i, (_, did) in enumerate(order)}
    assert got == exp


def test_global_rank_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from xlink_ray.stages.stats import global_rank

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    assert global_rank(ds, "v").take_all() == []


def test_quantile_band_filter_matches_pandas(ray_session):
    from xlink_ray.stages.stats import quantile_band_filter

    rng = np.random.default_rng(23)
    rows = pa.table(
        {
            "id": pa.array(np.arange(600, dtype=np.int64)),
            "g": pa.array([f"g{int(x)}" for x in rng.integers(0, 4, 600)]),
            "v": pa.array(rng.integers(0, 1000, 600).astype(np.int64)),
        }
    )
    got = (
        quantile_band_filter(
            rd.from_arrow(rows).repartition(7), group_col="g", val_col="v"
        )
        .to_pandas()
        .sort_values("id")
    )
    import pandas as pd

    df = rows.to_pandas()

    def band(s):
        v = np.sort(s.to_numpy())
        n = len(v)
        lo = v[int(np.ceil(0.25 * n)) - 1]
        hi = v[int(np.ceil(0.75 * n)) - 1]
        return lo, hi

    keep = []
    for g, sub in df.groupby("g"):
        lo, hi = band(sub["v"])
        keep.append(sub[(sub["v"] >= lo) & (sub["v"] <= hi)])
    want = pd.concat(keep).sort_values("id")
    assert got["id"].tolist() == want["id"].tolist()


def test_categorify_dense_value_ordered_codes(ray_session):
    from xlink_ray.stages.stats import categorify

    rng = np.random.default_rng(41)
    vals = [f"v{int(x):03d}" for x in rng.integers(0, 60, 500)]
    t = pa.table({"id": pa.array(range(500), pa.int64()),
                  "s": pa.array(vals, pa.string())})
    got = categorify(rd.from_arrow(t).repartition(7), "s").to_pandas()
    uniq = sorted(set(vals))
    code_of = {v: i for i, v in enumerate(uniq)}
    assert got["s_code"].tolist() == [code_of[v] for v in got["s"]]
    # dense: codes cover 0..n_distinct-1
    assert sorted(set(got["s_code"])) == list(range(len(uniq)))


def test_latest_per_key_matches_pandas(ray_session):
    from xlink_ray.stages.stats import latest_per_key

    rng = np.random.default_rng(53)
    n = 500
    t = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "k": pa.array(rng.integers(0, 40, n).astype(np.int64)),
            # coarse ts so (k, ts) duplicates exercise the id tie-break
            "ts": pa.array(rng.integers(0, 20, n).astype(np.int64)),
        }
    )
    got = (
        latest_per_key(rd.from_arrow(t).repartition(9), "k", "ts", "id")
        .to_pandas()
        .sort_values("k")
    )
    df = t.to_pandas().sort_values(["k", "ts", "id"]).groupby("k").tail(1)
    want = df.sort_values("k")
    assert got["id"].tolist() == want["id"].tolist()
    assert len(got) == t.to_pandas()["k"].nunique()


def test_json_field_extraction_and_nulls(ray_session):
    from xlink_ray.stages.stats import json_field

    t = pa.table(
        {
            "id": pa.array([0, 1, 2, 3], pa.int64()),
            "props": pa.array(['{"k": 7}', '{"other": 1}', None, "not json"]),
        }
    )
    out = (
        json_field(rd.from_arrow(t), "props", "k", dtype=pa.int64())
        .to_pandas()
        .sort_values("id")
    )
    vals = out["k"].tolist()
    assert vals[0] == 7 and all(v is None or v != v for v in vals[1:])


def test_latest_per_key_min_variant(ray_session):
    from xlink_ray.stages.stats import latest_per_key

    t = pa.table(
        {
            "id": pa.array([0, 1, 2, 3], pa.int64()),
            "k": pa.array([7, 7, 8, 8], pa.int64()),
            "o": pa.array([5, 3, 1, 1], pa.int64()),
        }
    )
    lo = latest_per_key(rd.from_arrow(t).repartition(3), "k", "o", "id", keep="min")
    out = lo.to_pandas().sort_values("k")
    # k=7 → min o=3 (id 1); k=8 → o tie, min id=2
    assert out["id"].tolist() == [1, 2]


def test_quantile_normalize_rule(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.stats import quantile_normalize

    rows = [
        {"id": 1, "g": "a", "v": 10},
        {"id": 2, "g": "a", "v": 30},
        {"id": 3, "g": "a", "v": 20},
        {"id": 4, "g": "b", "v": 99},   # singleton -> 0
        {"id": 5, "g": "c", "v": 7},    # tie broken by id
        {"id": 6, "g": "c", "v": 7},
    ]
    out = (
        quantile_normalize(rd.from_arrow(pa.Table.from_pylist(rows)), "g", "v", "id")
        .to_pandas()
        .set_index("id")["pct_ppm"]
    )
    assert out[1] == 0 and out[3] == 500000 and out[2] == 1000000
    assert out[4] == 0
    assert out[5] == 0 and out[6] == 1000000
