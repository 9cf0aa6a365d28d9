"""Connected components: local union-find vs distributed star rounds."""

import pyarrow as pa
import numpy as np
import pytest

import ray.data as rd

from xlink_ray.stages.clustering import connected_components


def _cc_dict(ds):
    df = ds.to_pandas()
    return dict(zip(df["member_id"], df["cluster_id"]))


GRAPHS = {
    "two_triangles": ([(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)], None),
    "chain": ([(i, i + 1) for i in range(1, 40)], None),  # path graph, diameter 39
    "star": ([(100, i) for i in range(1, 20)], None),
    "with_singletons": ([(5, 6)], [5, 6, 7, 8]),
    "dup_edges": ([(1, 2), (2, 1), (1, 2)], None),
}


@pytest.mark.parametrize("name", list(GRAPHS))
def test_local_cc(ray_session, name):
    edges, nodes = GRAPHS[name]
    eds = rd.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    nds = rd.from_items([{"n": x} for x in nodes]) if nodes else None
    got = _cc_dict(
        connected_components(eds, nodes=nds, node_col="n" if nodes else None, method="local")
    )
    exp = _oracle_cc(edges, nodes)
    assert got == exp


def test_distributed_cc_chain(ray_session):
    """Path graph stresses the star-round convergence."""
    edges, nodes = GRAPHS["chain"]
    eds = rd.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    got = _cc_dict(connected_components(eds, method="distributed"))
    assert got == _oracle_cc(edges, None)


def test_distributed_cc_mixed(ray_session):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (50, 60)]
    nodes = [1, 2, 3, 10, 11, 12, 50, 60, 99]
    eds = rd.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    nds = rd.from_items([{"n": x} for x in nodes])
    got = _cc_dict(connected_components(eds, nodes=nds, node_col="n", method="distributed"))
    assert got == _oracle_cc(edges, nodes)


def test_distributed_cc_join_attach(ray_session):
    """attach='join' (Dataset.join mapping attach — no driver collect)
    must equal the broadcast attach and the oracle."""
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (50, 60)]
    eds = rd.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    got = _cc_dict(connected_components(eds, method="distributed", attach="join"))
    assert got == _oracle_cc(edges, None)


def test_string_node_ids(ray_session):
    edges = [("b", "a"), ("c", "b"), ("x", "y")]
    eds = rd.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    got = _cc_dict(connected_components(eds, method="local"))
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def _oracle_cc(edges, nodes):
    """Tiny reference union-find (independent of the implementation)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    for x in nodes or []:
        find(x)
    return {x: find(x) for x in parent}


def test_auto_routes_big_int_graphs_to_bucket(ray_session, monkeypatch):
    # force the "big" branch: int node ids must take the bucket path
    # and still produce the union-find result
    from xlink_ray.stages import clustering

    monkeypatch.setattr(clustering, "_LOCAL_EDGE_LIMIT", 0)
    edges = [(5, 3), (3, 1), (8, 9)]
    eds = rd.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    got = _cc_dict(connected_components(eds, method="auto"))
    assert got == _oracle_cc(edges, None)


# ---- pairwise cluster F1 ----

def test_pairwise_cluster_f1_exact_counts(ray_session):
    from xlink_ray.stages.clustering import pairwise_cluster_f1

    # truth: {1,2,3} {4,5}; pred: {1,2} {3,4} {5}
    truth = rd.from_items(
        [{"member_id": i, "cluster_id": c} for i, c in [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)]]
    )
    pred = rd.from_items(
        [{"member_id": i, "cluster_id": c} for i, c in [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)]]
    )
    r = pairwise_cluster_f1(pred, truth).take_all()[0]
    # pred pairs: (1,2), (3,4); truth pairs: (1,2),(1,3),(2,3),(4,5)
    assert (r["pairs_pred"], r["pairs_true"], r["tp"]) == (2, 4, 1)
    assert r["precision_ppm"] == 500000
    assert r["recall_ppm"] == 250000
    assert r["f1_ppm"] == 2 * 1 * 1_000_000 // 6


def test_pairwise_cluster_f1_identical_is_one(ray_session):
    from xlink_ray.stages.clustering import pairwise_cluster_f1

    c = rd.from_items([{"member_id": i, "cluster_id": i % 3} for i in range(30)])
    r = pairwise_cluster_f1(c, c).take_all()[0]
    assert r["precision_ppm"] == r["recall_ppm"] == r["f1_ppm"] == 1_000_000


def test_pairwise_cluster_f1_string_ids(ray_session):
    from xlink_ray.stages.clustering import pairwise_cluster_f1

    truth = rd.from_items(
        [{"member_id": m, "cluster_id": c} for m, c in [("a#0", "x"), ("b#1", "x"), ("c#2", "y")]]
    )
    pred = rd.from_items(
        [{"member_id": m, "cluster_id": c} for m, c in [("a#0", "p"), ("b#1", "q"), ("c#2", "q")]]
    )
    r = pairwise_cluster_f1(pred, truth).take_all()[0]
    assert (r["pairs_pred"], r["pairs_true"], r["tp"]) == (1, 1, 0)
    assert r["f1_ppm"] == 0


def test_constrained_components(ray_session):
    """constrained_components: cannot-link pairs split components per
    the deterministic sequential-UF reference; empty constraints ==
    plain CC; no output cluster contains a cannot pair."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.clustering import (
        _constrained_uf,
        connected_components,
        constrained_components,
    )

    # chain 1-2-3-4-5 plus clique 10-11-12, singleton 99
    e = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)]
    edges = rd.from_arrow(
        pa.table({"id_a": pa.array([a for a, _ in e], pa.int64()),
                  "id_b": pa.array([b for _, b in e], pa.int64())})
    )
    nodes = rd.from_arrow(pa.table({"id": pa.array([1, 2, 3, 4, 5, 10, 11, 12, 99], pa.int64())}))
    cannot = rd.from_arrow(
        pa.table({"id_a": pa.array([1, 10], pa.int64()),
                  "id_b": pa.array([4, 12], pa.int64())})
    )
    got = constrained_components(
        edges, cannot, nodes=nodes, node_col="id"
    ).to_pandas().set_index("member_id")["cluster_id"].to_dict()
    # sequential reference over each offending component
    ref_chain = _constrained_uf(
        np.array([(1, 2), (2, 3), (3, 4), (4, 5)]), np.array([(1, 4)])
    )
    ref_clique = _constrained_uf(
        np.array([(10, 11), (10, 12), (11, 12)]), np.array([(10, 12)])
    )
    exp = {**ref_chain, **ref_clique, 99: 99}
    assert got == exp, (got, exp)
    # constraints honored
    assert got[1] != got[4] and got[10] != got[12]
    # empty constraints == plain CC
    empty = rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                    "id_b": pa.array([], pa.int64())}))
    got2 = constrained_components(edges, empty, nodes=nodes, node_col="id").to_pandas()
    base = connected_components(edges, nodes=nodes, node_col="id").to_pandas()
    assert got2.sort_values("member_id").reset_index(drop=True).equals(
        base.sort_values("member_id").reset_index(drop=True)
    )
    # unviolated cannot pair (different components already) is a no-op
    cross = rd.from_arrow(pa.table({"id_a": pa.array([1], pa.int64()),
                                    "id_b": pa.array([10], pa.int64())}))
    got3 = constrained_components(edges, cross, nodes=nodes, node_col="id").to_pandas()
    assert got3.sort_values("member_id").reset_index(drop=True).equals(
        base.sort_values("member_id").reset_index(drop=True)
    )


def test_incremental_components_equals_full_recompute(ray_session):
    """incremental_components(standing, delta) == full CC over
    old ∪ delta edges, across the tricky topologies: delta edges that
    merge two standing clusters, chains that connect clusters only
    THROUGH brand-new nodes, within-cluster no-op deltas, and new-new
    edges forming their own component."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.clustering import (
        connected_components,
        incremental_components,
    )

    def edges_ds(pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([a for a, _ in pairs], pa.int64()),
                    "id_b": pa.array([b for _, b in pairs], pa.int64()),
                }
            )
        )

    # standing graph: clusters {1,2,3}, {10,11}, {20,21}, singleton 30
    old = [(1, 2), (2, 3), (10, 11), (20, 21)]
    nodes = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 10, 11, 20, 21, 30], pa.int64())})
    )
    delta = [
        (3, 10),    # merges {1,2,3} with {10,11}
        (21, 100),  # chain into a NEW node...
        (100, 30),  # ...connecting {20,21} to singleton 30 through it
        (1, 2),     # within-cluster no-op
        (200, 201), # brand-new pair, own component
    ]
    standing = connected_components(edges_ds(old), nodes=nodes, node_col="k")
    got = (
        incremental_components(standing, edges_ds(delta))
        .to_pandas()
        .sort_values("member_id")
        .reset_index(drop=True)
    )
    full_nodes = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 10, 11, 20, 21, 30, 100, 200, 201], pa.int64())})
    )
    exp = (
        connected_components(edges_ds(old + delta), nodes=full_nodes, node_col="k")
        .to_pandas()
        .sort_values("member_id")
        .reset_index(drop=True)
    )
    assert list(got["member_id"]) == list(exp["member_id"])
    assert list(got["cluster_id"]) == list(exp["cluster_id"])
    # spot-check semantics: the merged big cluster is canonical-min 1
    lab = dict(zip(got["member_id"], got["cluster_id"]))
    assert lab[11] == 1 and lab[3] == 1
    assert lab[30] == lab[100] == lab[20] == lab[21] == 20
    assert lab[200] == lab[201] == 200


def test_incremental_components_empty_delta(ray_session):
    """An empty delta passes the standing labeling through unchanged."""
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.clustering import (
        connected_components,
        incremental_components,
    )

    edges = rd.from_arrow(
        pa.table({"id_a": pa.array([1], pa.int64()), "id_b": pa.array([2], pa.int64())})
    )
    empty = rd.from_arrow(
        pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    )
    standing = connected_components(edges)
    got = incremental_components(standing, empty).to_pandas()
    assert sorted(zip(got["member_id"], got["cluster_id"])) == [(1, 1), (2, 1)]


def test_golden_records_incremental_equals_full(ray_session):
    """golden_records_incremental == a full golden_records recompute:
    merged clusters re-fold (winner can change — the delta connects a
    low-balance cluster to a high-balance one), untouched clusters'
    rows pass through."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.clustering import (
        connected_components,
        incremental_components,
    )
    from xlink_ray.stages.survivor import golden_records, golden_records_incremental

    def edges_ds(pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([a for a, _ in pairs], pa.int64()),
                    "id_b": pa.array([b for _, b in pairs], pa.int64()),
                }
            )
        )

    ids = [1, 2, 3, 10, 11, 20, 21, 30]
    records = rd.from_arrow(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "name": pa.array([f"n{i}" for i in ids], pa.string()),
                "bal": pa.array([5.0, 1.0, 2.0, 9.0, 3.0, 4.0, 8.0, 7.0]),
            }
        )
    )
    nodes = rd.from_arrow(pa.table({"k": pa.array(ids, pa.int64())}))
    old = [(1, 2), (2, 3), (10, 11), (20, 21)]
    delta = [(3, 10)]  # merges {1,2,3} (max bal 5.0) with {10,11} (max 9.0)
    gkw = dict(id_col="id", carry_min_id=["name"], argmax_col="bal")

    standing = connected_components(edges_ds(old), nodes=nodes, node_col="k").materialize()
    old_golden = golden_records(standing, records, **gkw)
    new_labels, remap = incremental_components(standing, edges_ds(delta), with_remap=True)
    got = (
        golden_records_incremental(old_golden, new_labels, records, remap, **gkw)
        .to_pandas().sort_values("cluster_id").reset_index(drop=True)
    )
    full = connected_components(edges_ds(old + delta), nodes=nodes, node_col="k")
    exp = (
        golden_records(full, records, **gkw)
        .to_pandas().sort_values("cluster_id").reset_index(drop=True)
    )
    assert got.equals(exp), (got, exp)
    # the merged cluster's argmax winner came from the delta-joined side
    merged = got[got["cluster_id"] == 1].iloc[0]
    assert merged["n_members"] == 5 and merged["bal"] == 9.0
    # untouched clusters pass through
    assert set(got["cluster_id"]) == {1, 20, 30}


def test_customer_bcubed_matches_python_fold(ray_session, sf_small):
    """The contingency table reproduces exact B-cubed P/R computed
    item-wise from the labels themselves."""
    import numpy as np

    from xlink_ray.pipelines.er import customer_bcubed, customer_clusters

    labels = customer_clusters(sf_small).to_pandas()
    cells = customer_bcubed(sf_small).to_pandas()

    # marginals must be consistent
    assert (
        cells.groupby("cluster_id")["n_common"].transform("sum")
        == cells["n_pred"]
    ).all()
    assert (
        cells.groupby("gold_id")["n_common"].transform("sum") == cells["n_gold"]
    ).all()
    n = len(labels)
    assert cells["n_common"].sum() == n

    # item-wise oracle
    gold = labels["member_id"] // 10
    pred = labels["cluster_id"]
    from collections import Counter

    cell_n = Counter(zip(pred, gold))
    pred_n = Counter(pred)
    gold_n = Counter(gold)
    P = sum(cell_n[(p, g)] / pred_n[p] for p, g in zip(pred, gold)) / n
    R = sum(cell_n[(p, g)] / gold_n[g] for p, g in zip(pred, gold)) / n

    P2 = (cells["n_common"] ** 2 / cells["n_pred"]).sum() / n
    R2 = (cells["n_common"] ** 2 / cells["n_gold"]).sum() / n
    assert np.isclose(P, P2) and np.isclose(R, R2)


def test_threshold_hierarchy_matches_direct_cc(ray_session):
    """Contracted incremental closure == independent CC per threshold,
    on a hand graph spanning all band layouts."""
    import pyarrow.compute as pc

    from xlink_ray.stages.clustering import threshold_hierarchy

    edges = pa.Table.from_pylist(
        [
            {"id_a": 1, "id_b": 2, "sim_bp": 9900},
            {"id_a": 2, "id_b": 3, "sim_bp": 9500},
            {"id_a": 4, "id_b": 5, "sim_bp": 9300},
            {"id_a": 3, "id_b": 4, "sim_bp": 9100},
            {"id_a": 6, "id_b": 7, "sim_bp": 8000},
        ]
    )
    nodes = pa.table({"node": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64())})
    got = (
        threshold_hierarchy(
            rd.from_arrow(edges), [9800, 9400, 9000], rd.from_arrow(nodes), "node"
        )
        .to_pandas()
        .sort_values(["threshold", "member_id"])
        .reset_index(drop=True)
    )
    for t in (9800, 9400, 9000):
        e = rd.from_arrow(edges.filter(pc.greater_equal(edges["sim_bp"], t)))
        direct = (
            connected_components(e, nodes=rd.from_arrow(nodes), node_col="node")
            .to_pandas()
            .sort_values("member_id")
            .reset_index(drop=True)
        )
        sub = (
            got[got.threshold == t][["member_id", "cluster_id"]]
            .sort_values("member_id")
            .reset_index(drop=True)
        )
        assert sub.equals(direct[["member_id", "cluster_id"]])


def test_threshold_hierarchy_nesting(ray_session):
    """Higher thresholds refine lower: each high-level cluster maps
    into exactly one low-level cluster."""
    from xlink_ray.pipelines import er

    got = er.customer_threshold_hierarchy("/root/testdata/sf0.001").to_pandas()
    levels = sorted(got["threshold"].unique(), reverse=True)
    assert levels == [9800, 9500, 9200]
    for hi, lo in zip(levels, levels[1:]):
        h = got[got.threshold == hi].set_index("member_id")["cluster_id"]
        l = got[got.threshold == lo].set_index("member_id")["cluster_id"]
        df = h.to_frame("hi").join(l.to_frame("lo"))
        assert (df.groupby("hi")["lo"].nunique() == 1).all()
    # and clusters only merge downward
    n_hi = got[got.threshold == 9800]["cluster_id"].nunique()
    n_lo = got[got.threshold == 9200]["cluster_id"].nunique()
    assert n_lo <= n_hi


def test_adjusted_rand_index_reference(ray_session):
    """Pin ARI against the closed-form on hand labelings, including the
    identical (1e6), independent-ish, and disagreeing cases."""
    from xlink_ray.stages.clustering import adjusted_rand_index

    def lab(pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "member_id": pa.array([p[0] for p in pairs], pa.int64()),
                    "cluster_id": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        )

    ids = list(range(8))
    same = [(i, i // 2) for i in ids]
    out = adjusted_rand_index(lab(same), lab(same)).to_pandas().iloc[0]
    assert out["ari_ppm"] == 1_000_000 and out["n_members"] == 8

    # shifted grouping: compute expected ARI with sklearn-free closed form
    import numpy as np

    pred = [(i, i // 2) for i in ids]
    true = [(i, (i + 1) // 2) for i in ids]
    o = adjusted_rand_index(lab(pred), lab(true)).to_pandas().iloc[0]
    n = 8
    c = n * (n - 1) // 2
    # contingency by brute force
    from collections import Counter

    cells = Counter((p[1], t[1]) for p, t in zip(pred, true))
    tp = sum(v * (v - 1) // 2 for v in cells.values())
    pp = sum(v * (v - 1) // 2 for v in Counter(x[1] for x in pred).values())
    pt = sum(v * (v - 1) // 2 for v in Counter(x[1] for x in true).values())
    num2 = 2 * (tp * c - pp * pt)
    den2 = c * (pp + pt) - 2 * pp * pt
    q = (abs(num2) * 10**6) // den2
    want = q if num2 >= 0 else -q
    assert o["ari_ppm"] == want and o["tp"] == tp


def test_vmeasure_reference(ray_session):
    """Pin V-measure against the closed-form on hand labelings:
    identical → 1e6/1e6/1e6; refinement → homogeneity 1e6 but
    completeness < 1e6."""
    from xlink_ray.stages.clustering import cluster_vmeasure

    def lab(pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "member_id": pa.array([p[0] for p in pairs], pa.int64()),
                    "cluster_id": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        )

    ids = list(range(8))
    same = [(i, i // 4) for i in ids]
    out = cluster_vmeasure(lab(same), lab(same)).to_pandas().iloc[0]
    assert (out[["h_ppm", "c_ppm", "v_ppm"]] == 1_000_000).all()

    finer = [(i, i // 2) for i in ids]  # strict refinement of `same`
    o = cluster_vmeasure(lab(finer), lab(same)).to_pandas().iloc[0]
    assert o["h_ppm"] == 1_000_000  # every pred cluster pure in truth
    assert o["c_ppm"] < 1_000_000   # truth classes split across preds
    assert 0 < o["v_ppm"] < 1_000_000


def test_customer_clusters_expanded_replicas(ray_session, sf_small):
    """The scaling-bench ER witness: repeat=1 equals customer_clusters;
    at repeat=2 each replica is an independent blocking universe whose
    labels are replica 0's shifted by 10^7."""
    from xlink_ray.pipelines import er

    base = (
        er.customer_clusters(sf_small)
        .to_pandas()
        .sort_values("member_id")
        .reset_index(drop=True)
    )
    one = (
        er.customer_clusters_expanded(sf_small, repeat=1)
        .to_pandas()
        .sort_values("member_id")
        .reset_index(drop=True)
    )
    assert (base["member_id"] == one["member_id"]).all()
    assert (base["cluster_id"] == one["cluster_id"]).all()
    two = er.customer_clusters_expanded(sf_small, repeat=2).to_pandas()
    r0 = two[two["member_id"] < 10_000_000].sort_values("member_id").reset_index(drop=True)
    r1 = two[two["member_id"] >= 10_000_000].sort_values("member_id").reset_index(drop=True)
    assert len(r0) == len(r1) == len(base)
    assert (r0["cluster_id"].values == base["cluster_id"].values).all()
    assert (r1["member_id"].values - 10_000_000 == base["member_id"].values).all()
    assert (r1["cluster_id"].values - 10_000_000 == base["cluster_id"].values).all()
