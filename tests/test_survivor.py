"""Golden-record survivorship (stages/survivor.py)."""

import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.survivor import golden_records

SF_SMALL = "/root/testdata/sf0.001"


def test_golden_rules_fixture(ray_session):
    members = rd.from_arrow(
        pa.Table.from_pylist(
            [
                {"member_id": 1, "cluster_id": 1},
                {"member_id": 2, "cluster_id": 1},
                {"member_id": 3, "cluster_id": 1},
                {"member_id": 9, "cluster_id": 9},
            ]
        )
    )
    records = rd.from_arrow(
        pa.Table.from_pylist(
            [
                {"id": 1, "name": "a1", "score": 5.0, "src": "x"},
                {"id": 2, "name": "a2", "score": 9.0, "src": "y"},
                {"id": 3, "name": "a3", "score": 9.0, "src": "z"},  # tie loses to id 2
                {"id": 9, "name": "b", "score": 1.0, "src": "w"},
                {"id": 50, "name": "orphan", "score": 0.0, "src": "o"},  # no cluster -> dropped
            ]
        )
    )
    out = (
        golden_records(
            members,
            records,
            id_col="id",
            carry_min_id=["name"],
            argmax_col="score",
            carry_argmax=["src"],
        )
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    assert out["cluster_id"].tolist() == [1, 9]
    assert out["n_members"].tolist() == [3, 1]
    assert out["name"].tolist() == ["a1", "b"]   # min-id member
    assert out["src"].tolist() == ["y", "w"]     # max score, tie -> min id
    assert out["score"].tolist() == [9.0, 1.0]


def test_golden_covers_every_member_once(ray_session):
    from xlink_ray.pipelines import er

    g = er.customer_golden(SF_SMALL).to_pandas()
    assert g["cluster_id"].is_unique
    assert int(g["n_members"].sum()) == 150  # every sf0.001 customer


def test_cluster_metrics_consistency(ray_session):
    from xlink_ray.pipelines import er

    m = er.customer_cluster_metrics(SF_SMALL).to_pandas()
    assert int(m["n_members"].sum()) == 150
    # singleton clusters carry zero edges and zero density
    singles = m[m.n_members == 1]
    assert (singles["n_edges"] == 0).all() and (singles["density_ppm"] == 0).all()
    # a 2-member cluster with its 1 edge is fully dense
    two = m[(m.n_members == 2) & (m.n_edges == 1)]
    assert (two["density_ppm"] == 1_000_000).all() and len(two) > 0
