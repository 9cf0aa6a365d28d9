"""Cross-run cluster alignment (stages/align.py)."""

import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.align import cluster_alignment


def _labels(rows):
    return rd.from_arrow(
        pa.Table.from_pylist(
            [{"member_id": m, "cluster_id": c} for m, c in rows]
        )
    )


def test_alignment_argmax_and_ties(ray_session):
    # new cluster 1 = {1,2,3}: old has {1,2}->10 and {3}->20 -> best 10
    # new cluster 5 = {5,6}: old splits 1/1 between 30 and 40 -> tie -> 30
    new = _labels([(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)])
    old = _labels([(1, 10), (2, 10), (3, 20), (5, 40), (6, 30)])
    out = (
        cluster_alignment(new, old)
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    assert out["cluster_id"].tolist() == [1, 5]
    assert out["old_cluster_id"].tolist() == [10, 30]
    assert out["overlap"].tolist() == [2, 1]
    assert out["n_members"].tolist() == [3, 2]
    assert out["agreement_ppm"].tolist() == [666666, 500000]


def test_alignment_identity_is_perfect(ray_session):
    new = _labels([(i, i % 3) for i in range(30)])
    out = cluster_alignment(new, new).to_pandas()
    assert (out["agreement_ppm"] == 1_000_000).all()
    assert (out["cluster_id"] == out["old_cluster_id"]).all()
    assert int(out["n_members"].sum()) == 30
