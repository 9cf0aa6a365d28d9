"""Incremental cluster attachment (stages/attach.py): argmax rule,
singleton fallback, and exact equality of the salted skew path."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.functions.similarity import jaro_winkler_pairs
from xlink_ray.stages.attach import attach_to_clusters

SF_SMALL = "/root/testdata/sf0.001"


def _toy():
    base = pa.Table.from_pylist(
        [
            {"key": 0, "id": 1, "cluster": 10, "name": "acme corp"},
            {"key": 0, "id": 2, "cluster": 10, "name": "acme corp."},
            {"key": 0, "id": 3, "cluster": 30, "name": "zenith ltd"},
            {"key": 1, "id": 4, "cluster": 40, "name": "orbit gmbh"},
        ]
    )
    new = pa.Table.from_pylist(
        [
            {"key": 0, "id": 100, "name": "acme corp"},   # exact → cluster 10
            {"key": 0, "id": 101, "name": "qqqqqq"},      # below threshold → singleton
            {"key": 2, "id": 102, "name": "acme corp"},   # empty block → singleton
        ]
    )
    return rd.from_arrow(base), rd.from_arrow(new)


def _attach(base, new, **kw):
    out = attach_to_clusters(
        base,
        new,
        key_cols="key",
        id_col="id",
        cluster_col="cluster",
        attr_col="name",
        scorer=jaro_winkler_pairs,
        min_sim_bp=9000,
        **kw,
    ).to_pandas()
    return out.sort_values("id").reset_index(drop=True)


def test_attach_rules(ray_session):
    base, new = _toy()
    out = _attach(base, new)
    by_id = {int(r.id): r for r in out.itertuples()}
    # exact match: ties (id 1 and 2 both score 10000? no — names differ)
    # id 100 matches base id 1 exactly (sim_bp 10000), adopts cluster 10
    assert by_id[100].best_id == 1 and by_id[100].cluster_id == 10
    assert by_id[100].matched == 1 and by_id[100].sim_bp == 10000
    # below threshold: singleton, but best partner still reported
    assert by_id[101].matched == 0 and by_id[101].cluster_id == 101
    assert by_id[101].best_id != -1
    # no block partner at all: -1 sentinels
    assert by_id[102].matched == 0 and by_id[102].cluster_id == 102
    assert by_id[102].best_id == -1 and by_id[102].sim_bp == -1


def test_attach_tie_breaks_to_smallest_base_id(ray_session):
    base = rd.from_arrow(
        pa.Table.from_pylist(
            [
                {"key": 0, "id": 7, "cluster": 70, "name": "same"},
                {"key": 0, "id": 5, "cluster": 50, "name": "same"},
            ]
        )
    )
    new = rd.from_arrow(pa.Table.from_pylist([{"key": 0, "id": 9, "name": "same"}]))
    out = _attach(base, new)
    assert int(out["best_id"][0]) == 5 and int(out["cluster_id"][0]) == 50


def test_attach_salted_path_identical(ray_session):
    from xlink_ray.pipelines import er

    plain = er.customer_attach(SF_SMALL).to_pandas().sort_values("id").reset_index(drop=True)
    salted = (
        er.customer_attach(SF_SMALL, skew_cap=7)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert plain.equals(salted)
    # every new record accounted for exactly once
    assert plain["id"].is_unique and (plain["id"] % 4 == 0).all()


def test_attach_grid_salting_new_side_hot(ray_session):
    """A block hot on the NEW side must also split (two-sided grid):
    output equals the unsalted path, and with cap=4 a 12-new-row block
    splits into Sn=3 new-side cells so no cell holds all new rows."""
    base_rows = [
        {"key": 0, "id": i, "cluster": 10 * i, "name": f"name{i}"} for i in range(3)
    ]
    new_rows = [
        {"key": 0, "id": 100 + i, "name": f"name{i % 3}"} for i in range(12)
    ]
    base = rd.from_arrow(pa.Table.from_pylist(base_rows))
    new = rd.from_arrow(pa.Table.from_pylist(new_rows))
    plain = _attach(base, new)
    salted = _attach(
        rd.from_arrow(pa.Table.from_pylist(base_rows)),
        rd.from_arrow(pa.Table.from_pylist(new_rows)),
        skew_cap=4,
    )
    assert plain.equals(salted)
    assert (salted["matched"] == 1).all()  # every new row found its base twin


def test_merge_best_equals_brute_force_hypothesis(ray_session):
    """Property: folding scored pairs chunk-by-chunk through _merge_best
    (any chunking) equals the global rule max sim_bp → min base id."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xlink_ray.stages.attach import _merge_best

    pair_st = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),     # new-row idx
            st.integers(min_value=-1, max_value=50),   # sim_bp
            st.integers(min_value=0, max_value=9),     # base id
        ),
        min_size=0,
        max_size=40,
    )

    @settings(max_examples=80, deadline=None)
    @given(pairs=pair_st, chunk=st.integers(min_value=1, max_value=7))
    def check(pairs, chunk):
        n_new = 5
        best_sbp = np.full(n_new, -1, dtype=np.int64)
        best_bid = np.full(n_new, np.iinfo(np.int64).max, dtype=np.int64)
        best_cl = np.full(n_new, -1, dtype=np.int64)
        for c0 in range(0, len(pairs), chunk):
            ch = pairs[c0 : c0 + chunk]
            nidx = np.array([p[0] for p in ch], dtype=np.int64)
            sbp = np.array([p[1] for p in ch], dtype=np.int64)
            bid = np.array([p[2] for p in ch], dtype=np.int64)
            _merge_best(best_sbp, best_bid, best_cl, nidx, sbp, bid, bid * 10)
        # brute force
        for i in range(n_new):
            cand = [(s, b) for (n, s, b) in pairs if n == i]
            if not cand:
                assert best_sbp[i] == -1
                continue
            want = max(cand, key=lambda t: (t[0], -t[1]))
            assert (best_sbp[i], best_bid[i], best_cl[i]) == (
                want[0],
                want[1],
                want[1] * 10,
            )

    check()


def _mb_fixture():
    left = pa.Table.from_pylist(
        [
            {"k": 0, "id": 10, "name": "martha stone"},
            {"k": 0, "id": 11, "name": "paul weiss"},
            {"k": 0, "id": 12, "name": "zzz qqq"},
            {"k": 1, "id": 13, "name": "lone left"},
        ]
    )
    right = pa.Table.from_pylist(
        [
            {"k": 0, "id": 20, "name": "martha stone"},
            {"k": 0, "id": 21, "name": "martha stones"},
            {"k": 0, "id": 22, "name": "paul weis"},
            {"k": 2, "id": 23, "name": "lone right"},
        ]
    )
    return left, right


def test_mutual_best_pairs_reference(ray_session):
    from xlink_ray.stages.attach import mutual_best_pairs

    left, right = _mb_fixture()

    def brute(min_bp):
        import itertools

        lrows = left.to_pylist()
        rrows = right.to_pylist()
        pairs = {}
        for l, r in itertools.product(lrows, rrows):
            if l["k"] != r["k"]:
                continue
            bp = int(
                np.floor(jaro_winkler_pairs([l["name"]], [r["name"]])[0] * 10000)
            )
            pairs[(l["id"], r["id"])] = bp
        out = []
        for (il, ir), bp in pairs.items():
            if bp < min_bp:
                continue
            best_r = max(
                ((b, j) for (i, j), b in pairs.items() if i == il),
                key=lambda t: (t[0], -t[1]),
            )
            best_l = max(
                ((b, i) for (i, j), b in pairs.items() if j == ir),
                key=lambda t: (t[0], -t[1]),
            )
            if best_r[1] == ir and best_l[1] == il:
                out.append((il, ir, bp))
        return sorted(out)

    for min_bp in (0, 7000, 9990):
        got = mutual_best_pairs(
            rd.from_arrow(left),
            rd.from_arrow(right),
            key_cols="k",
            id_col="id",
            attr_col="name",
            scorer=jaro_winkler_pairs,
            min_sim_bp=min_bp,
        ).to_pandas()
        assert (
            sorted(map(tuple, got[["id_l", "id_r", "sim_bp"]].values.tolist()))
            == brute(min_bp)
        )


def test_mutual_best_is_one_to_one(ray_session):
    from xlink_ray.pipelines import er

    got = er.customer_one_to_one("/root/testdata/sf0.001").to_pandas()
    assert got["id_l"].is_unique and got["id_r"].is_unique
    assert (got["sim_bp"] >= 7000).all()
    # salting must not change the result
    from xlink_ray.functions.similarity import jaro_winkler_pairs as jw
    from xlink_ray.stages.attach import mutual_best_pairs
    import pyarrow.compute as pc

    cust = er._customers("/root/testdata/sf0.001")

    def _mod4(t):
        return pa.array(t["c_custkey"].to_numpy(zero_copy_only=False) % 4)

    l = cust.map_batches(lambda t: t.filter(pc.equal(_mod4(t), 0)), batch_format="pyarrow")
    r = cust.map_batches(lambda t: t.filter(pc.not_equal(_mod4(t), 0)), batch_format="pyarrow")
    tiny_salt = mutual_best_pairs(
        l, r, key_cols="c_nationkey", id_col="c_custkey", attr_col="c_name",
        scorer=jw, min_sim_bp=7000, skew_cap=4,
    ).to_pandas()
    a = got.sort_values(["id_l", "id_r"]).reset_index(drop=True)
    b = tiny_salt.sort_values(["id_l", "id_r"]).reset_index(drop=True)
    assert a.equals(b)
