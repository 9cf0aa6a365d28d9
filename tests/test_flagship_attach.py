"""Incremental flagship attach (pipelines/flagship.py:attach_new_crawl)."""

SF_SMALL = "/root/testdata/sf0.001"


def test_attach_new_crawl_contract(ray_session):
    from xlink_ray.pipelines import flagship

    out = flagship.attach_new_crawl(SF_SMALL).to_pandas()
    base = flagship.clusters(SF_SMALL).to_pandas()

    # one row per NEW occurrence, none from the standing crawl
    assert out["member_id"].is_unique
    assert not set(out["member_id"]) & set(base["member_id"])

    # every matched occurrence adopts a STANDING cluster id
    matched = out[out.matched == 1]
    assert len(matched) > 0
    assert matched["cluster_id"].isin(set(base["cluster_id"])).all()
    assert (matched["cos_bp"] >= int(flagship.EDGE_TH * 10000)).all()

    # unmatched-with-neighbor rows stayed below the edge threshold;
    # rows in new-only blocks carry the -1 sentinel
    unmatched = out[out.matched == 0]
    with_nb = unmatched[unmatched.cos_bp >= 0]
    assert (with_nb["cos_bp"] < int(flagship.EDGE_TH * 10000) + 1).all()

    # determinism: a second run is identical
    out2 = flagship.attach_new_crawl(SF_SMALL).to_pandas()
    a = out.sort_values("member_id").reset_index(drop=True)
    b = out2.sort_values("member_id").reset_index(drop=True)
    assert a.equals(b)


def test_golden_clusters_consistency(ray_session):
    from xlink_ray.pipelines import flagship

    g = flagship.golden_clusters(SF_SMALL).to_pandas()
    c = flagship.clusters(SF_SMALL).to_pandas()
    # one golden row per cluster; membership totals match the labeling
    assert g["cluster_id"].is_unique
    assert set(g["cluster_id"]) == set(c["cluster_id"])
    assert int(g["n_members"].sum()) == len(c)
    # flagship rule: cluster_id IS the min member string of the cluster
    min_member = c.groupby("cluster_id")["member_id"].min()
    assert (min_member.index == min_member.values).all()
    # every cluster id is a member of itself
    assert g["cluster_id"].isin(set(c["member_id"])).all()
