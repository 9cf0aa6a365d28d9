"""Flagship pipeline fidelity: Ray clusters == transcription-oracle
clusters (pairwise F1 must hit 1.0, gate is ≥0.99); gold-label quality
reported for context."""

import pyarrow.parquet as pq

from tests.oracle_flagship import oracle_clusters
from xlink_ray.functions.eval import pairwise_f1
from xlink_ray.synth import ALIAS_DICT


def _cluster_dict(ds):
    df = ds.to_pandas()
    return dict(zip(df["member_id"], df["cluster_id"]))


def test_flagship_matches_oracle(ray_session, sf_small):
    from xlink_ray.pipelines import flagship

    got = _cluster_dict(flagship.clusters(sf_small))
    exp = oracle_clusters(sf_small)
    assert set(got) == set(exp)
    metrics = pairwise_f1(got, exp)
    assert metrics["f1"] >= 0.99, metrics
    assert metrics["f1"] == 1.0, metrics  # deterministic spec ⇒ exact


def test_flagship_cc_paths_agree(ray_session, sf_small):
    """Fused per-block clustering == generic CC (local and distributed)."""
    from xlink_ray.pipelines import flagship

    block = _cluster_dict(flagship.clusters(sf_small, method="block"))
    fused = _cluster_dict(flagship.clusters(sf_small, method="fused"))
    local = _cluster_dict(flagship.clusters(sf_small, method="local"))
    dist = _cluster_dict(flagship.clusters(sf_small, method="distributed"))
    assert block == fused == local == dist


def test_flagship_gold_quality(ray_session, sf_small):
    """Quality vs the synthesized gold labels (informative floor)."""
    from xlink_ray.pipelines import flagship

    got = _cluster_dict(flagship.clusters(sf_small))
    docs = pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "source"])
    url_of = {
        d: f"https://crawl.example.org/{s}/{d:08d}"
        for d, s in zip(docs["doc_id"].to_pylist(), docs["source"].to_pylist())
    }
    # gold: every occurrence of alias m in doc d belongs to entity
    # cands[d % k]; occurrences are exactly the resolved members' offsets
    gold = {}
    for member in got:
        url, _off = member.rsplit("#", 1)
        doc_id = int(url[-8:])
        # recover mention from the member's block via the predicted
        # cluster — instead, recompute from text offsets is overkill;
        # use alias whose occurrence region matches: encode via scan
        gold[member] = None
    import re

    import pyarrow.parquet as pq2

    texts = pq2.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    text_of = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    rx = __import__("re").compile("|".join(sorted(ALIAS_DICT, key=len, reverse=True)))
    for d, text in text_of.items():
        for m in rx.finditer(text):
            cands = ALIAS_DICT[m.group(0)]
            gold[f"{url_of[d]}#{m.start()}"] = cands[d % len(cands)]
    gold = {k: v for k, v in gold.items() if v is not None}
    metrics = pairwise_f1(got, gold)
    # unambiguous aliases cluster perfectly; ambiguous ones split on
    # noisy context ⇒ expect a solid but imperfect score
    assert metrics["f1"] > 0.5, metrics
    print("gold pairwise F1:", metrics)


def test_links_partitioned_equals_broadcast(ray_session, sf_small):
    """The no-dictionary-broadcast join path produces the same links as
    the broadcast path: identical rows, believe equal to float
    tolerance (matmul vs per-row dot differ in the last ulp)."""
    import numpy as np

    from xlink_ray.pipelines import flagship

    key = ["doc_id", "offset"]
    a = flagship.links(sf_small).to_pandas().sort_values(key).reset_index(drop=True)
    b = (
        flagship.links_partitioned(sf_small)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    for c in ["doc_id", "offset", "mention", "entity_id", "context"]:
        assert (a[c] == b[c]).all(), c
    assert np.allclose(a["believe"], b["believe"], atol=1e-12)


def test_links_partitioned_survives_block_splitting(ray_session, sf_small):
    """The review-flagged regime: when a hash partition exceeds the
    target block size, Ray splits it into multiple blocks. The doc-salt
    groupby must keep every (doc, offset) argmax group complete —
    results must not change under a tiny block-size target."""
    from ray.data import DataContext

    from xlink_ray.pipelines import flagship

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024  # force aggressive splits
        b = flagship.links_partitioned(sf_small).to_pandas()
    finally:
        ctx.target_max_block_size = old
    a = flagship.links(sf_small).to_pandas()
    key = ["doc_id", "offset"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for c in ["doc_id", "offset", "mention", "entity_id"]:
        assert (a[c] == b[c]).all(), c


def test_links_partitioned_forced_hot_mention_salting(ray_session, sf_small):
    """Forced-skew regime: with hot_mention_cap=1 EVERY mention exceeds
    the cap (the hottest mention's occurrences dominate its bucket and
    salt across ceil(freq/1) sub-keys, candidates replicated per salt)
    — results must be identical to the broadcast path."""
    import numpy as np

    from xlink_ray.pipelines import flagship

    key = ["doc_id", "offset"]
    a = flagship.links(sf_small).to_pandas().sort_values(key).reset_index(drop=True)
    b = (
        flagship.links_partitioned(sf_small, hot_mention_cap=1)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    for c in ["doc_id", "offset", "mention", "entity_id", "context"]:
        assert (a[c] == b[c]).all(), c
    assert np.allclose(a["believe"], b["believe"], atol=1e-12)
    # the skew premise actually holds: at cap=1 the hottest mention IS
    # hot (its corpus freq is > 1), so the salted path was exercised
    counts = a["mention"].value_counts()
    assert counts.iloc[0] > 1


def test_nil_mentions_partition_links(ray_session):
    """At the stricter review bar, NIL ∪ accepted = all scanned winners
    and the two sets are disjoint on (doc_id, offset)."""
    from xlink_ray.pipelines import flagship

    sf = "/root/testdata/sf0.001"
    accepted = flagship.links(sf).to_pandas()
    nil = flagship.nil_mentions(sf, believe_th=0.5).to_pandas()
    # the default-bar accepted set splits into strict-bar accepted + NIL
    a_keys = set(map(tuple, accepted[["doc_id", "offset"]].values.tolist()))
    n_keys = set(map(tuple, nil[["doc_id", "offset"]].values.tolist()))
    assert n_keys <= a_keys  # every default-accepted winner is scanned
    assert len(nil) > 0


def test_nil_clusters_structure(ray_session):
    """Same (mention, context) occurrences must co-cluster (star
    collapse); labels are component minima."""
    from xlink_ray.pipelines import flagship

    sf = "/root/testdata/sf0.001"
    nil = flagship.nil_mentions(sf, believe_th=0.5).to_pandas()
    nc = flagship.nil_clusters(sf).to_pandas()
    assert len(nc) == len(nil)
    assert (nc.groupby("cluster_id")["member_id"].min()
            == nc.groupby("cluster_id")["member_id"].apply(lambda s: s.name)).all()
    # equal-context same-mention occurrences share a cluster
    from xlink_ray.synth import doc_id_of_url
    import numpy as np
    import pyarrow as pa

    node = (
        np.asarray(doc_id_of_url(pa.array(nil["doc_id"].tolist())), dtype=np.int64)
        * 1_000_000
        + nil["offset"].to_numpy()
    )
    nil = nil.assign(node=node)
    lab = nc.set_index("member_id")["cluster_id"]
    grp = nil.groupby(["mention", "context"])["node"].apply(
        lambda s: lab.loc[s].nunique()
    )
    assert (grp == 1).all()


def test_nil_attach_equals_nil_clusters_and_reuses_scan(ray_session):
    """nil_attach over a standing nil_mentions set is pinned identical
    to nil_clusters, including at an aggressive context-salt count
    (every surface split across many sub-groups), and the memoized
    _raw_scan is shared — the corpus is not re-scanned."""
    from xlink_ray.pipelines import flagship

    sf = "/root/testdata/sf0.001"
    base = (
        flagship.nil_clusters(sf)
        .to_pandas()
        .sort_values("member_id")
        .reset_index(drop=True)
    )
    # the standing scan is memoized: same tuple object on re-request
    raw1 = flagship._raw_scan(sf, 1)
    raw2 = flagship._raw_scan(sf, 1)
    assert raw1 is raw2
    nil = flagship.nil_mentions(sf, believe_th=0.5)
    got = (
        flagship.nil_attach(nil, raw1[2], nsalt=64)
        .to_pandas()
        .sort_values("member_id")
        .reset_index(drop=True)
    )
    assert (base["member_id"] == got["member_id"]).all()
    assert (base["cluster_id"] == got["cluster_id"]).all()


def test_links_partitioned_mixed_hot_cold_salting(ray_session, sf_small):
    """Mid-range cap: SOME mentions exceed it (salted mkeys) while the
    rest stay plain — the mixed regime where salted occurrence rows,
    replicated candidates and unsalted rows share buckets. Pinned equal
    to the broadcast path."""
    import numpy as np

    from xlink_ray.pipelines import flagship

    from xlink_ray.pipelines import dictbuild

    key = ["doc_id", "offset"]
    a = flagship.links(sf_small).to_pandas().sort_values(key).reset_index(drop=True)
    # pick the cap BETWEEN the min and max corpus frequencies so the
    # mention set genuinely splits into hot and cold subsets
    freqs = sorted(dictbuild.freq_m(sf_small).to_pandas()["freq"])
    cap = int(freqs[len(freqs) // 2])
    assert freqs[0] <= cap < freqs[-1]  # both regimes exist
    b = (
        flagship.links_partitioned(sf_small, hot_mention_cap=cap)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    for c in ["doc_id", "offset", "mention", "entity_id", "context"]:
        assert (a[c] == b[c]).all(), c
    assert np.allclose(a["believe"], b["believe"], atol=1e-12)


def test_nil_attach_degenerate_single_salt(ray_session):
    """nsalt=1 collapses stage 1 to one sub-group per mention — must
    still equal the default clustering."""
    from xlink_ray.pipelines import flagship

    sf = "/root/testdata/sf0.001"
    base = (
        flagship.nil_clusters(sf)
        .to_pandas()
        .sort_values("member_id")
        .reset_index(drop=True)
    )
    nil = flagship.nil_mentions(sf, believe_th=0.5)
    _, _, emb_ref = flagship._raw_scan(sf, 1)
    got = (
        flagship.nil_attach(nil, emb_ref, nsalt=1)
        .to_pandas()
        .sort_values("member_id")
        .reset_index(drop=True)
    )
    assert (base["member_id"] == got["member_id"]).all()
    assert (base["cluster_id"] == got["cluster_id"]).all()
