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


def _em_reference(patterns, counts, nf, n_iter):
    """Independent plain-python replica of the quantized EM recipe."""
    E9 = 10**9
    lam, m, u = 500_000_000, [900_000_000] * nf, [100_000_000] * nf
    for _ in range(n_iter):
        pe = []
        for pat in patterns:
            num, den = lam / 1e9, (E9 - lam) / 1e9
            for i in range(nf):
                if (pat >> i) & 1:
                    num, den = num * (m[i] / 1e9), den * (u[i] / 1e9)
                else:
                    num, den = num * ((E9 - m[i]) / 1e9), den * ((E9 - u[i]) / 1e9)
            pe.append(int(np.floor(num / (num + den) * 1e9 + 0.5)))
        n_tot = sum(counts)
        s = sum(c * p for c, p in zip(counts, pe))
        d = sum(c * (E9 - p) for c, p in zip(counts, pe))
        lam = int(np.floor((float(s) + 5e8) / (float(n_tot) + 1.0) + 0.5))
        m = [
            int(np.floor((float(sum(c * p for c, p, q in zip(counts, pe, patterns) if (q >> i) & 1)) + 5e8)
                         / (float(s) + 1e9) * 1e9 + 0.5))
            for i in range(nf)
        ]
        u = [
            int(np.floor((float(sum(c * (E9 - p) for c, p, q in zip(counts, pe, patterns) if (q >> i) & 1)) + 5e8)
                         / (float(d) + 1e9) * 1e9 + 0.5))
            for i in range(nf)
        ]
    return lam, m, u


def test_fs_em_matches_reference(ray_session):
    from xlink_ray.stages.fs import fs_em_params, fs_pattern_counts

    feats = _fixture().materialize()
    pc_tbl = fs_pattern_counts(feats, ["city"])
    # 6 pairs: 3 city-agree (pattern 1), 3 disagree (pattern 0)
    by_pat = dict(zip(pc_tbl["pattern"].to_pylist(), pc_tbl["n"].to_pylist()))
    assert by_pat == {0: 3, 1: 3}

    got = fs_em_params(pc_tbl, ["city"], n_iter=4)
    lam, m, u = _em_reference(
        pc_tbl["pattern"].to_pylist(), pc_tbl["n"].to_pylist(), 1, 4
    )
    assert got == {"lam_e9": lam, "m_e9": m, "u_e9": u}


def test_fs_em_partition_invariance(ray_session):
    """Integer pattern sums make the fit independent of block layout."""
    from xlink_ray.pipelines import er
    from xlink_ray.stages.fs import fs_em_params, fs_pattern_counts

    feats = er._customer_fs_features(SF_SMALL).materialize()
    a = fs_em_params(fs_pattern_counts(feats, er.FS_FIELDS), er.FS_FIELDS)
    b = fs_em_params(
        fs_pattern_counts(feats.repartition(17), er.FS_FIELDS), er.FS_FIELDS
    )
    assert a == b


def test_fs_em_posteriors_consistent(ray_session):
    """Posteriors are monotone in the number of agreeing fields when
    every field has m > u (more agreement -> higher match posterior),
    and agree with a direct per-pattern evaluation."""
    from xlink_ray.pipelines import er

    w = er.customer_fs_em_weights(SF_SMALL).to_pylist()
    p = er.customer_fs_em_posteriors(SF_SMALL).to_pandas()
    assert len(p) == 447
    assert (p["p_e9"] >= 0).all() and (p["p_e9"] <= 10**9).all()
    if all(r["m_e9"] > r["u_e9"] for r in w):
        feats = er._customer_fs_features(SF_SMALL).to_pandas()
        agr = feats[[f"agr_{f}" for f in er.FS_FIELDS]].sum(axis=1)
        joined = p.merge(
            feats.assign(n_agree=agr), on=["id_a", "id_b"], how="inner"
        )
        means = joined.groupby("n_agree")["p_e9"].mean()
        assert means.is_monotonic_increasing


def test_er_clusters_em_nontrivial(ray_session):
    """The unsupervised chain must produce real clusters (not all
    singletons, not one blob), and labels must be component mins."""
    from xlink_ray.pipelines import er

    got = er.customer_clusters_em(SF_SMALL).to_pandas()
    assert len(got) == 150  # every customer labeled
    n_clusters = got["cluster_id"].nunique()
    assert 1 < n_clusters < 150
    assert (got.groupby("cluster_id")["member_id"].min()
            == got.groupby("cluster_id")["member_id"].apply(lambda s: s.name)).all()
