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


def test_attach_adopts_neighbor_standing_cluster_multisalt(ray_session):
    """Multi-salt regression (round-3 ADVICE high): the standing
    clustering groups by (mention, entity, SALT), so a matched new
    occurrence must adopt exactly its best neighbor's STANDING cluster
    id — not the min of a run chain merged across salt boundaries.
    base_repeat=2 makes the standing corpus span 2 salts at sf0.001."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray import synth
    from xlink_ray.pipelines import flagship
    from xlink_ray.state.broadcast import broadcast_table

    BASE_REPEAT, NEW_REPEAT = 2, 3
    tagged = flagship._attach_tagged(SF_SMALL, NEW_REPEAT, BASE_REPEAT).to_pandas()
    out = (
        flagship.attach_new_crawl(SF_SMALL, NEW_REPEAT, BASE_REPEAT)
        .to_pandas()
        .set_index("member_id")
    )
    standing = (
        flagship.clusters(SF_SMALL, repeat=BASE_REPEAT)
        .to_pandas()
        .set_index("member_id")["cluster_id"]
    )

    tagged["num"] = (
        tagged["doc_id"].str.rsplit("/", n=1).str[1].astype(np.int64)
    )
    tagged["salt"] = tagged["num"] // flagship.DOCS_PER_SALT
    assert tagged.loc[tagged.side == 0, "salt"].nunique() > 1  # non-vacuous

    emb_ref = broadcast_table(synth.synth_embeddings())
    embedder = flagship._BlockClusters(emb_ref).embedder

    def cos(a, b):
        den = np.linalg.norm(a) * np.linalg.norm(b)
        return float(a @ b / den) if den > 0 else 0.0

    checked = cross_salt_blocks = 0
    for (_m, _e), grp in tagged.groupby(["mention", "entity_id"]):
        g = grp.sort_values(["doc_id", "offset"]).reset_index(drop=True)
        base = g[g.side == 0]
        new = g[g.side == 1]
        if len(base) == 0 or len(new) == 0:
            continue
        if base["salt"].nunique() > 1:
            cross_salt_blocks += 1
        ctx = embedder(pa.array(g["context"]))
        b_idx = np.nonzero((g.side == 0).to_numpy())[0]
        b_members = [
            f"{g.doc_id[i]}#{g.offset[i]}" for i in b_idx
        ]
        ins_all = np.cumsum((g.side == 0).to_numpy())
        nb = len(b_idx)
        for i in np.nonzero((g.side == 1).to_numpy())[0]:
            ins = int(ins_all[i])
            cos_l = cos(ctx[i], ctx[b_idx[ins - 1]]) if ins - 1 >= 0 else -1.0
            cos_r = cos(ctx[i], ctx[b_idx[ins]]) if ins <= nb - 1 else -1.0
            best = max(ins - 1, 0) if cos_l >= cos_r else min(ins, nb - 1)
            if max(cos_l, cos_r) < flagship.EDGE_TH:
                continue
            member = f"{g.doc_id[i]}#{g.offset[i]}"
            assert out.loc[member, "matched"] == 1
            assert out.loc[member, "cluster_id"] == standing[b_members[best]], (
                member,
                b_members[best],
            )
            checked += 1
    assert checked > 0 and cross_salt_blocks > 0


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
