"""Fellegi–Sunter linkage (stages/fs.py): weight math on a hand-checked
fixture and score consistency on the customer instantiation."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.fs import fs_pair_features, fs_scored_pairs, fs_weights

SF_SMALL = "/root/testdata/sf0.001"


def _fixture():
    # one block of 4 rows -> 6 pairs; label = exact name equality
    tbl = pa.Table.from_pylist(
        [
            {"k": 0, "id": 1, "name": "ann", "city": "x"},
            {"k": 0, "id": 2, "name": "ann", "city": "x"},
            {"k": 0, "id": 3, "name": "bob", "city": "x"},
            {"k": 0, "id": 4, "name": "cid", "city": "y"},
        ]
    )

    def label(group, ii, jj):
        names = group["name"].to_numpy(zero_copy_only=False)
        return (names[ii] == names[jj]).astype(np.int64)

    return fs_pair_features(
        rd.from_arrow(tbl),
        key_cols="k",
        id_col="id",
        field_cols=["city"],
        label=label,
        label_cols=["name"],
    )


def test_fs_weights_hand_checked(ray_session):
    feats = _fixture().materialize()
    w = fs_weights(feats, ["city"]).to_pylist()[0]
    # pairs: (1,2) label1 city-agree; (1,3),(2,3) label0 agree;
    # (1,4),(2,4),(3,4) label0 disagree  ->  n1=1, n0=5, s1=1, s0=2
    assert np.isclose(w["m"], (1 + 0.5) / (1 + 1))
    assert np.isclose(w["u"], (2 + 0.5) / (5 + 1))
    assert np.isclose(w["w_agree"], np.log2(w["m"] / w["u"]))
    assert np.isclose(w["w_disagree"], np.log2((1 - w["m"]) / (1 - w["u"])))

    scored = fs_scored_pairs(feats, fs_weights(feats, ["city"])).to_pandas()
    assert len(scored) == 6
    by_pair = {(r.id_a, r.id_b): r.score for r in scored.itertuples()}
    assert np.isclose(by_pair[(1, 2)], w["w_agree"])
    assert np.isclose(by_pair[(3, 4)], w["w_disagree"])


def test_fs_customer_scores_separate_labels(ray_session):
    from xlink_ray.pipelines import er

    s = er.customer_fs_scores(SF_SMALL).to_pandas()
    # matched pairs must out-score unmatched pairs on average — the
    # whole point of the learned weights
    assert s[s.label == 1]["score"].mean() > s[s.label == 0]["score"].mean()
    # pair universe == the nation-blocked grid (447 at sf0.001)
    assert len(s) == 447


def test_review_queue_band(ray_session):
    from xlink_ray.pipelines import er

    q = er.customer_fs_review_queue(SF_SMALL).to_pandas()
    assert len(q) > 0
    assert ((q["score"] >= 0.0) & (q["score"] < 3.5)).all()


def test_cluster_exemplars_topk(ray_session):
    from xlink_ray.pipelines import er

    x = er.customer_cluster_exemplars(SF_SMALL).to_pandas()
    g = er.customer_golden(SF_SMALL).to_pandas()
    sizes = x.groupby("cluster_id").size()
    assert (sizes <= 2).all()
    # exactly min(2, n_members) exemplars per cluster
    want = g.set_index("cluster_id")["n_members"].clip(upper=2)
    assert sizes.sort_index().equals(want.sort_index().astype(sizes.dtype))
    # the exemplar max balance matches the golden record's survivor balance
    top = x.sort_values(["cluster_id", "c_acctbal"], ascending=[True, False]).groupby("cluster_id").head(1)
    merged = top.merge(g, on="cluster_id")
    assert (merged["c_acctbal_x"] == merged["c_acctbal_y"]).all()
