"""Record-linkage pipelines: blocking → pairwise scoring → transitive
clustering (SURVEY.md §7.1 steps 4-6).

Two instantiations:

* ``customer_*`` — a fully SQL-checkable entity-resolution pipeline
  over the TPC-H ``customer`` table (block on nation, Levenshtein
  edit-distance scoring, connected components). This is the oracle
  surface for the blocking/scoring/clustering operators.
* the flagship web-pages ER pipeline lives in ``pipelines/flagship.py``
  and reuses the same stages over the synthesized pages table.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from xlink_ray.util import read_pq_grouped as read_pq
from ray.data import Dataset

from xlink_ray.functions.similarity import levenshtein_pairs
from xlink_ray.stages.blocking import block_score_pairs
from xlink_ray.stages.clustering import connected_components

__all__ = ["customer_pairs", "customer_clusters", "customer_attach"]

LEV_THRESHOLD = 1


def _customers(sf_dir: str) -> Dataset:
    # grouped-consumer read sizing (module-wide: read_pq here is
    # util.read_pq_grouped) — every customer_* pipeline feeds a
    # groupby(...).map_groups grid; see util.read_pq_grouped
    return read_pq(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
    )


def customer_pairs(sf_dir: str, threshold: int = LEV_THRESHOLD) -> Dataset:
    """Blocking key = c_nationkey; edge iff levenshtein(name) <= threshold.

    Output: (id_a, id_b, dist) with id_a < id_b, one row per pair.
    """
    edges = block_score_pairs(
        _customers(sf_dir),
        key_cols="c_nationkey",
        id_col="c_custkey",
        attr_col="c_name",
        # banded DP: distances beyond the threshold clamp to threshold+1,
        # which `keep` drops anyway — kept pairs carry exact distances
        scorer=lambda A, B: levenshtein_pairs(A, B, max_dist=threshold),
        keep=lambda s: s <= threshold,
        skew_cap=8192,  # exact hot-key splitting; output identical
    )

    def fmt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "dist": pc.cast(t["score"], pa.int64()),
            }
        )

    return edges.map_batches(fmt, batch_format="pyarrow")


def customer_pairs_jw(sf_dir: str, threshold: float = 0.94) -> Dataset:
    """Jaro-Winkler-scored blocking pairs (north-star scorer): blocking
    key = c_nationkey, keep pairs with JW similarity ≥ threshold.
    Output (id_a, id_b, sim_bp) with the similarity in integer basis
    points (DuckDB-equal on ASCII; integers dodge float-hash issues)."""
    from xlink_ray.functions.similarity import JaroWinklerBlockScorer, jaro_winkler_pairs

    edges = block_score_pairs(
        _customers(sf_dir),
        key_cols="c_nationkey",
        id_col="c_custkey",
        attr_col="c_name",
        scorer=JaroWinklerBlockScorer(),
        keep=lambda s: s >= threshold,
        skew_cap=8192,  # exact hot-key splitting; output identical
    )

    def fmt(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        sim = t["score"].to_numpy(zero_copy_only=False) * 10000.0
        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "sim_bp": pa.array(np.floor(sim).astype(np.int64)),
            }
        )

    return edges.map_batches(fmt, batch_format="pyarrow")


def customer_clusters(
    sf_dir: str, threshold: int = LEV_THRESHOLD, method: str = "auto"
) -> Dataset:
    """Transitive closure of customer_pairs; singletons keep their own
    cluster. cluster_id = min c_custkey of the component."""
    return connected_components(
        customer_pairs(sf_dir, threshold),
        a="id_a",
        b="id_b",
        nodes=_customers(sf_dir),
        node_col="c_custkey",
        method=method,
    )


def customers_expanded(sf_dir: str, repeat: int = 1) -> Dataset:
    """Deterministic scale-up of the customer table for scaling
    benchmarks: ``repeat`` shifted replicas — custkeys offset by
    r·10⁷, nation keys by r·25 — so every replica is an independent
    blocking universe. Work scales linearly with ``repeat``; no
    cross-replica pairs; per-block grid shape unchanged. One generator
    map_batches (the round-2 lesson: never union hundreds of per-copy
    branches)."""
    base = _customers(sf_dir)
    if repeat <= 1:
        return base

    def rep(t: pa.Table):
        import numpy as np

        ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        for r in range(repeat):
            yield pa.table(
                {
                    "c_custkey": pa.array(ck + r * 10_000_000),
                    "c_name": t["c_name"],
                    "c_nationkey": pa.array(nk + r * 25),
                }
            )

    return base.map_batches(rep, batch_format="pyarrow")


def customer_clusters_expanded(
    sf_dir: str, repeat: int = 1, threshold: int = LEV_THRESHOLD
) -> Dataset:
    """The full ER chain (nation-block → banded Levenshtein score →
    connected components with singletons) over the expanded customer
    universe — the scaling-bench witness for the blocking + scoring +
    transitive-closure pipeline family. repeat=1 is pinned equal to
    ``customer_clusters``; replica r's labels are replica 0's labels
    shifted by r·10⁷ (blocks never cross replicas)."""
    cust = customers_expanded(sf_dir, repeat)
    edges = block_score_pairs(
        cust,
        key_cols="c_nationkey",
        id_col="c_custkey",
        attr_col="c_name",
        scorer=lambda A, B: levenshtein_pairs(A, B, max_dist=threshold),
        keep=lambda s: s <= threshold,
        skew_cap=8192,
    )

    def fmt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
            }
        )

    return connected_components(
        edges.map_batches(fmt, batch_format="pyarrow"),
        a="id_a",
        b="id_b",
        nodes=cust.select_columns(["c_custkey"]),
        node_col="c_custkey",
    )


def customer_attach(
    sf_dir: str, min_sim_bp: int = 9700, skew_cap: int | None = None
) -> Dataset:
    """Incremental linkage: customers with ``c_custkey % 4 == 0`` are the
    "new crawl"; the rest are the standing base, each base record
    carrying cluster_id = c_custkey // 2 (a deterministic stand-in for
    a prior clustering run's labels). New records attach to the best
    Jaro-Winkler base match within their nation block at
    sim ≥ min_sim_bp basis points, else found a singleton cluster.

    Output: (id, cluster_id, best_id, sim_bp, matched) per new record.
    """
    import pyarrow.compute as pc

    from xlink_ray.functions.similarity import JaroWinklerBlockScorer, jaro_winkler_pairs
    from xlink_ray.stages.attach import attach_to_clusters

    def _base(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(_mod4(t), 0))
        return t.append_column(
            "cluster_id", pc.cast(pc.divide(t["c_custkey"], 2), pa.int64())
        )

    def _mod4(t: pa.Table):
        import numpy as np

        return pa.array(t["c_custkey"].to_numpy(zero_copy_only=False) % 4)

    cust = _customers(sf_dir)
    base = cust.map_batches(_base, batch_format="pyarrow")
    new = cust.map_batches(
        lambda t: t.filter(pc.equal(_mod4(t), 0)), batch_format="pyarrow"
    )
    return attach_to_clusters(
        base,
        new,
        key_cols="c_nationkey",
        id_col="c_custkey",
        cluster_col="cluster_id",
        attr_col="c_name",
        scorer=JaroWinklerBlockScorer(),
        min_sim_bp=min_sim_bp,
        skew_cap=skew_cap,
    )


def customer_threshold_hierarchy(
    sf_dir: str, thresholds: "tuple[int, ...]" = (9800, 9500, 9200)
) -> Dataset:
    """Clusters at every operating threshold in one pass
    (stages/clustering.py:threshold_hierarchy): nation-blocked JW
    edges scored once; lower levels contract the previous level's
    clusters so each scored pair joins exactly one closure."""
    import numpy as np
    import pyarrow.compute as pc

    from xlink_ray.functions.similarity import JaroWinklerBlockScorer, jaro_winkler_pairs
    from xlink_ray.stages.clustering import threshold_hierarchy

    lo = thresholds[-1]
    edges = block_score_pairs(
        _customers(sf_dir),
        key_cols="c_nationkey",
        id_col="c_custkey",
        attr_col="c_name",
        scorer=JaroWinklerBlockScorer(),
        keep=lambda s: np.floor(s * 10000.0) >= lo,
        skew_cap=8192,
    )

    def fmt(t: pa.Table) -> pa.Table:
        sim = t["score"].to_numpy(zero_copy_only=False) * 10000.0
        import numpy as _np

        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "sim_bp": pa.array(_np.floor(sim).astype(_np.int64)),
            }
        )

    nodes = read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    return threshold_hierarchy(
        edges.map_batches(fmt, batch_format="pyarrow"),
        list(thresholds),
        nodes,
        "c_custkey",
    )


def customer_one_to_one(sf_dir: str, min_sim_bp: int = 7000) -> Dataset:
    """Clean-clean one-to-one linkage (stages/attach.py:
    mutual_best_pairs): the ``c_custkey % 4 == 0`` "new crawl" side
    linked 1:1 against the standing base by symmetric best
    Jaro-Winkler match within the nation block."""
    import pyarrow.compute as pc

    from xlink_ray.functions.similarity import JaroWinklerBlockScorer, jaro_winkler_pairs
    from xlink_ray.stages.attach import mutual_best_pairs

    def _mod4(t: pa.Table):
        import numpy as np

        return pa.array(t["c_custkey"].to_numpy(zero_copy_only=False) % 4)

    cust = _customers(sf_dir)
    left = cust.map_batches(
        lambda t: t.filter(pc.equal(_mod4(t), 0)), batch_format="pyarrow"
    )
    right = cust.map_batches(
        lambda t: t.filter(pc.not_equal(_mod4(t), 0)), batch_format="pyarrow"
    )
    return mutual_best_pairs(
        left,
        right,
        key_cols="c_nationkey",
        id_col="c_custkey",
        attr_col="c_name",
        scorer=JaroWinklerBlockScorer(),
        min_sim_bp=min_sim_bp,
        skew_cap=8192,
    )


FS_FIELDS = ["seg", "bal", "last1"]


def _customer_fs_features(sf_dir: str) -> Dataset:
    """Blocked pair-agreement features for the Fellegi–Sunter scorer:
    block on nation; agreement fields = market segment, account-balance
    band (floor/1000), last name character; ground-truth label =
    levenshtein(name) ≤ 1 (the er_pairs rule)."""
    import pyarrow.compute as pc

    from xlink_ray.stages.fs import fs_pair_features

    def prep(t: pa.Table) -> pa.Table:
        bal = pc.cast(pc.floor(pc.divide(t["c_acctbal"], 1000.0)), pa.int64())
        last1 = pc.utf8_slice_codeunits(pc.utf8_reverse(t["c_name"]), 0, 1)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": t["c_nationkey"],
                "c_name": t["c_name"],
                "seg": t["c_mktsegment"],
                "bal": bal,
                "last1": last1,
            }
        )

    import ray.data as _rd

    cust = read_pq(f"{sf_dir}/customer.parquet").map_batches(
        prep, batch_format="pyarrow"
    )

    def label(group: pa.Table, ii, jj):
        names = group["c_name"].to_numpy(zero_copy_only=False)
        d = levenshtein_pairs(names[ii], names[jj], max_dist=1)
        return (d <= 1).astype("int64")

    return fs_pair_features(
        cust,
        key_cols="c_nationkey",
        id_col="c_custkey",
        field_cols=FS_FIELDS,
        label=label,
        label_cols=["c_name"],
    )


def customer_fs_weights(sf_dir: str) -> pa.Table:
    """Learned Fellegi–Sunter m/u probabilities + log2 weights per field."""
    from xlink_ray.stages.fs import fs_weights

    return fs_weights(_customer_fs_features(sf_dir), FS_FIELDS)


def customer_fs_scores(sf_dir: str) -> Dataset:
    """Every blocked pair scored by the learned FS log-likelihood sum."""
    from xlink_ray.stages.fs import fs_scored_pairs, fs_weights

    feats = _customer_fs_features(sf_dir).materialize()  # two consumers
    return fs_scored_pairs(feats, fs_weights(feats, FS_FIELDS))


def customer_fs_em_weights(sf_dir: str, n_iter: int = 4) -> pa.Table:
    """UNSUPERVISED Fellegi–Sunter fit (Winkler 1988 EM / the Splink
    recipe): the same blocked agreement vectors as ``fs_weights`` but
    the ``label`` column is never read — λ, m, u come from a 4-round EM
    over the 2³-row pattern contingency on the int64 1e-9 grid."""
    from xlink_ray.stages.fs import fs_em_weights

    return fs_em_weights(_customer_fs_features(sf_dir), FS_FIELDS, n_iter=n_iter)


def customer_fs_em_posteriors(sf_dir: str, n_iter: int = 4) -> Dataset:
    """Per-pair match posteriors under the EM-fitted mixture:
    (id_a, id_b, p_e9) for every blocked candidate pair."""
    from xlink_ray.stages.fs import fs_em_params, fs_em_posteriors, fs_pattern_counts

    feats = _customer_fs_features(sf_dir).materialize()  # two consumers
    params = fs_em_params(
        fs_pattern_counts(feats, FS_FIELDS), FS_FIELDS, n_iter=n_iter
    )
    return fs_em_posteriors(feats, FS_FIELDS, params)


def customer_clusters_em(
    sf_dir: str, min_p_e9: int = 100_000_000, n_iter: int = 4
) -> Dataset:
    """The full unsupervised Splink shape end-to-end: blocked agreement
    features → EM mixture fit → per-pair match posteriors → connected
    components over the pairs with P(match|γ) ≥ min_p_e9 (singletons
    from the customer universe). No labels anywhere in the chain."""
    import pyarrow.compute as pc

    posts = customer_fs_em_posteriors(sf_dir, n_iter=n_iter)
    edges = posts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["p_e9"], min_p_e9)).select(
            ["id_a", "id_b"]
        ),
        batch_format="pyarrow",
    )
    nodes = read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    return connected_components(edges, nodes=nodes, node_col="c_custkey")


def customer_golden(sf_dir: str) -> Dataset:
    """Golden records: each customer cluster collapsed to one canonical
    row — name from the smallest member id, balance + segment from the
    member with the largest account balance (ties → smallest id)."""
    from xlink_ray.stages.survivor import golden_records

    records = read_pq(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_mktsegment"],
    )
    return golden_records(
        customer_clusters(sf_dir),
        records,
        id_col="c_custkey",
        carry_min_id=["c_name"],
        argmax_col="c_acctbal",
        carry_argmax=["c_mktsegment"],
    )


def customer_cluster_metrics(sf_dir: str) -> Dataset:
    """ER-quality review metrics per cluster: member count, within-
    cluster edge count, and graph density in ppm (2E·10⁶ / n(n-1),
    integer-floored; 0 for singletons). Low-density big clusters are
    the classic over-merge smell a reviewer sorts by."""
    import numpy as np

    from ray.data.aggregate import Count, Sum
    from xlink_ray.stages.survivor import stamp_cluster

    labels = customer_clusters(sf_dir)
    edges = customer_pairs(sf_dir).select_columns(["id_a"])
    # stamp each edge with its cluster via one endpoint (both endpoints
    # share a component by construction)
    edge_cl = stamp_cluster(
        edges.map_batches(
            lambda t: t.rename_columns(["eid"]), batch_format="pyarrow"
        ),
        labels,
        id_col="eid",
        carry_cols=[],
        carry_types={},
    )
    e_counts = (
        edge_cl.map_batches(
            lambda t: pa.table(
                {
                    "cluster_id": t["cluster"],
                    "e": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("cluster_id")
        .aggregate(Sum("e", alias_name="n_edges"))
    )
    m_counts = labels.groupby("cluster_id").aggregate(
        Count(alias_name="n_members")
    )

    # attach edge counts onto member counts: reduce-side again (edge
    # count table keyed by cluster id; clusters without edges get 0)
    def to_member_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "member_id": t["cluster_id"],
                "cluster_id": t["cluster_id"],
                "n_edges_m": t["n_edges"],
            }
        )

    from xlink_ray.stages._bucket import bucket_shuffle

    tagged = m_counts.map_batches(
        lambda t: pa.table(
            {
                "cluster_id": t["cluster_id"].cast(pa.int64()),
                "n_members": t["n_members"].cast(pa.int64()),
                "n_edges": pa.array([-1] * t.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).union(
        e_counts.map_batches(
            lambda t: pa.table(
                {
                    "cluster_id": t["cluster_id"].cast(pa.int64()),
                    "n_members": pa.array([-1] * t.num_rows, pa.int64()),
                    "n_edges": t["n_edges"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def fold(bucket: pa.Table) -> pa.Table:
        cid = bucket["cluster_id"].to_numpy(zero_copy_only=False)
        nm = bucket["n_members"].to_numpy(zero_copy_only=False)
        ne = bucket["n_edges"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(cid, return_inverse=True)
        members = np.zeros(len(u), dtype=np.int64)
        edges_ = np.zeros(len(u), dtype=np.int64)
        np.maximum.at(members, inv, nm)
        np.maximum.at(edges_, inv, ne)
        edges_ = np.maximum(edges_, 0)
        denom = members * (members - 1)
        dens = np.where(denom > 0, (2 * edges_ * 1_000_000) // np.maximum(denom, 1), 0)
        return pa.table(
            {
                "cluster_id": pa.array(u),
                "n_members": pa.array(members),
                "n_edges": pa.array(edges_),
                "density_ppm": pa.array(dens.astype(np.int64)),
            }
        )

    out = bucket_shuffle(tagged, "cluster_id", 64, fold)
    return out.map_batches(
        lambda t: t.drop_columns(["__b"]) if "__b" in t.column_names else t,
        batch_format="pyarrow",
    )


def customer_cluster_alignment(sf_dir: str) -> Dataset:
    """Stability check between ER runs: align today's customer clusters
    (lev ≤ 1) to a prior labeling (cluster = c_custkey // 10) by max
    member overlap (ties → smallest old id)."""
    from xlink_ray.stages.align import cluster_alignment

    old = _customers(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "member_id": t["c_custkey"].cast(pa.int64()),
                "cluster_id": pa.compute.cast(
                    pa.compute.divide(t["c_custkey"], 10), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return cluster_alignment(customer_clusters(sf_dir), old)


def customer_pairs_multiblock(sf_dir: str, threshold: int = LEV_THRESHOLD) -> Dataset:
    """Multi-scheme blocking: candidate pairs from TWO independent keys
    — nation and account-balance band (floor/100) — unioned into one
    exact-distinct set. The second key recovers name-similar pairs the
    nation blocker misses (cross-nation twins); output is the candidate
    set only (id_a, id_b)."""
    import pyarrow.compute as pc

    from xlink_ray.stages.blocking import union_pair_sets

    p1 = customer_pairs(sf_dir, threshold).select_columns(["id_a", "id_b"])

    cust2 = read_pq(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal"],
    ).map_batches(
        lambda t: t.append_column(
            "bal_band", pc.cast(pc.floor(pc.divide(t["c_acctbal"], 100.0)), pa.int64())
        ),
        batch_format="pyarrow",
    )
    p2 = block_score_pairs(
        cust2,
        key_cols="bal_band",
        id_col="c_custkey",
        attr_col="c_name",
        scorer=lambda A, B: levenshtein_pairs(A, B, max_dist=threshold),
        keep=lambda s: s <= threshold,
        skew_cap=8192,
    ).map_batches(
        lambda t: pa.table(
            {
                "id_a": t["id_a"].cast(pa.int64()),
                "id_b": t["id_b"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return union_pair_sets(p1, p2)


def customer_pairs_composite(sf_dir: str, threshold: int = LEV_THRESHOLD) -> Dataset:
    """SCALE-PATH blocking for the customer linkage: composite keys
    (nation, name-prefix) ∪ (nation, name-suffix) instead of nation
    alone.

    Why: nation-only blocking has 25 distinct keys, so kept-pair WORK
    grows O(n²/25) even though skew salting bounds memory. The
    composite split (name[:13] / name[13:]) shrinks blocks to
    near-constant size. Recall vs the nation-only truth: a Levenshtein
    ≤ 1 pair of equal-length names differs in exactly ONE position, so
    the other segment matches and the pair survives in the other
    scheme — recall 1.0 by construction on the fixed-width TPC-H names
    (a test pins ≥ 0.99 on real data); unequal-length (indel) pairs
    can shift the suffix and are the documented recall caveat.

    Output: (id_a, id_b, dist), distinct, same schema as
    ``customer_pairs``."""
    import numpy as np
    import pyarrow.compute as pc

    from xlink_ray.stages.dedup import _hash_bucketed

    def scheme(prefix: bool) -> Dataset:
        def add_key(t: pa.Table) -> pa.Table:
            seg = (
                pc.utf8_slice_codeunits(t["c_name"], 0, 13)
                if prefix
                else pc.utf8_slice_codeunits(t["c_name"], 13, 10_000)
            )
            return t.append_column(
                "blk",
                pc.binary_join_element_wise(
                    pc.cast(t["c_nationkey"], pa.string()), seg, "\x1f"
                ),
            )

        return block_score_pairs(
            _customers(sf_dir).map_batches(add_key, batch_format="pyarrow"),
            key_cols="blk",
            id_col="c_custkey",
            attr_col="c_name",
            scorer=lambda A, B: levenshtein_pairs(A, B, max_dist=threshold),
            keep=lambda s: s <= threshold,
            skew_cap=8192,
        ).map_batches(
            lambda t: pa.table(
                {
                    "id_a": t["id_a"].cast(pa.int64()),
                    "id_b": t["id_b"].cast(pa.int64()),
                    "dist": t["score"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    both = scheme(True).union(scheme(False))

    def distinct_bucket(g: pa.Table) -> pa.Table:
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        d = g["dist"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, b, a))
        a, b, d = a[order], b[order], d[order]
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table(
            {
                "id_a": pa.array(a[first]),
                "id_b": pa.array(b[first]),
                "dist": pa.array(d[first]),
            }
        )

    return _hash_bucketed(
        both,
        lambda t: t["id_a"].to_numpy(zero_copy_only=False) * np.int64(1000003)
        + t["id_b"].to_numpy(zero_copy_only=False),
        lambda g: distinct_bucket(g).select(["id_a", "id_b", "dist"]),
    )


def customer_fs_review_queue(
    sf_dir: str, lo: float = 0.0, hi: float = 3.5
) -> Dataset:
    """Clerical-review queue (Fellegi–Sunter's third band): pairs whose
    learned LLR score falls in [lo, hi) — too strong to reject, too
    weak to auto-link — the set a human (or a stronger model) reviews."""
    import pyarrow.compute as pc

    return customer_fs_scores(sf_dir).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["score"], lo), pc.less(t["score"], hi))
        ),
        batch_format="pyarrow",
    )


def customer_cluster_exemplars(sf_dir: str, k: int = 2) -> Dataset:
    """Per-cluster exemplar extraction: the k highest-balance members of
    every customer cluster (ties → smallest id) — the rows a reviewer
    or a downstream sampler actually looks at. Composition: reduce-side
    cluster stamp → grouped top-k."""
    from xlink_ray.stages.stats import group_topk
    from xlink_ray.stages.survivor import stamp_cluster

    records = read_pq(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    labeled = stamp_cluster(
        records,
        customer_clusters(sf_dir),
        id_col="c_custkey",
        carry_cols=["c_acctbal"],
        carry_types={"c_acctbal": pa.float64()},
    )  # → (id, c_acctbal, cluster)
    return group_topk(
        labeled.map_batches(
            lambda t: t.rename_columns(
                [{"id": "c_custkey", "cluster": "cluster_id"}.get(c, c) for c in t.column_names]
            ),
            batch_format="pyarrow",
        ),
        group_col="cluster_id",
        order_col="c_acctbal",
        k=k,
        tie_col="c_custkey",
    )


def customer_clusters_constrained(sf_dir: str) -> Dataset:
    """customer_clusters under CANNOT-LINK constraints: the clerical
    fixture rejects every candidate edge whose smaller key is divisible
    by 7 (a deterministic stand-in for human review verdicts — real
    deployments feed reviewed pairs here). Those records must not share
    a cluster even transitively; only components containing a violated
    pair are re-resolved (stages/clustering.constrained_components)."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.stages.clustering import constrained_components

    pairs = customer_pairs(sf_dir).materialize()  # two consumers

    def rejected(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(a % 7 == 0)).select(["id_a", "id_b"])

    cannot = pairs.map_batches(rejected, batch_format="pyarrow")
    return constrained_components(
        pairs, cannot, nodes=_customers(sf_dir), node_col="c_custkey"
    )


def customer_constrained_invariants(sf_dir: str) -> "pa.Table":
    """SQL-checkable invariants of :func:`customer_clusters_constrained`
    (the clustering itself is order-dependent sequential constrained
    union-find, not SQL-expressible — these projections ARE):

    one row (n_members, n_offending_members, n_preserved, n_violations):

    * ``n_members`` — constrained output size (= customer count).
    * ``n_offending_members`` — members of UNCONSTRAINED components
      containing ≥1 violated cannot pair (validates the violation
      detection phase; DuckDB replicates via the recursive closure +
      the cannot list).
    * ``n_preserved`` — members OUTSIDE offending components whose
      constrained label equals their unconstrained label (validates
      pass-through; the oracle expects ALL of them).
    * ``n_violations`` — cannot pairs sharing a constrained cluster
      (computed from the ACTUAL output; the repair contract is 0).

    Scale shape: labels are stamped onto cannot pairs reduce-side
    (stamp_cluster); only the violated-pair/offending-label sets touch
    the driver (bounded by the human-asserted cannot count, the same
    documented bound constrained_components itself relies on); the
    preserved count is one member-keyed bucket exchange."""
    import numpy as np
    import pyarrow as pa

    import ray

    from xlink_ray.functions.hashing import md5_low64
    from xlink_ray.stages._bucket import bucket_shuffle
    from xlink_ray.stages.clustering import (
        connected_components,
        constrained_components,
    )
    from xlink_ray.stages.survivor import stamp_cluster

    pairs = customer_pairs(sf_dir).materialize()

    def rejected(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(a % 7 == 0)).select(["id_a", "id_b"])

    cannot = pairs.map_batches(rejected, batch_format="pyarrow").materialize()
    nodes = _customers(sf_dir)
    base = connected_components(
        pairs, nodes=nodes, node_col="c_custkey"
    ).materialize()
    cons = constrained_components(
        pairs, cannot, nodes=nodes, node_col="c_custkey"
    ).materialize()

    def pair_rows(t: pa.Table, col: str) -> pa.Table:
        pid = md5_low64(
            [f"{x}|{y}" for x, y in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist())]
        ).astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)
        return pa.table({"pid": pa.array(pid, pa.int64()), "node": t[col]})

    def stamped_pairs(labels: "Dataset") -> dict:
        """pid → (cluster_a, cluster_b) via two reduce-side stamps;
        driver state bounded by the cannot count."""
        out: dict = {}
        for col, slot in (("id_a", 0), ("id_b", 1)):
            st = stamp_cluster(
                cannot.map_batches(
                    lambda t, c=col: pair_rows(t, c), batch_format="pyarrow"
                ),
                labels, id_col="node",
                carry_cols=["pid"], carry_types={"pid": pa.int64()},
            )
            for b in st.iter_batches(batch_format="pyarrow"):
                tb = pa.table(b)
                for pid, cl in zip(tb["pid"].to_pylist(), tb["cluster"].to_pylist()):
                    out.setdefault(pid, [None, None])[slot] = cl
        return out

    base_st = stamped_pairs(base)
    cons_st = stamped_pairs(cons)
    n_violations = sum(
        1 for ca, cb in cons_st.values() if ca is not None and ca == cb
    )
    offending = sorted(
        {ca for ca, cb in base_st.values() if ca is not None and ca == cb}
    )
    off_arr = np.asarray(offending, dtype=np.int64)
    off_ref = ray.put(off_arr)

    def count_members(labels: "Dataset", only_offending: bool) -> int:
        def part(t: pa.Table) -> pa.Table:
            cl = t["cluster_id"].to_numpy(zero_copy_only=False)
            off = ray.get(off_ref)
            hit = np.isin(cl, off)
            n = int(hit.sum()) if only_offending else int(t.num_rows)
            return pa.table({"n": pa.array([n], pa.int64())})

        return int(labels.map_batches(part, batch_format="pyarrow").sum("n") or 0)

    n_members = count_members(cons, only_offending=False)
    n_offending = count_members(base, only_offending=True)

    # preserved = non-offending members with identical base/cons labels:
    # one member-keyed bucket exchange over the tagged label union
    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "member_id": t["member_id"],
                    "cluster_id": t["cluster_id"],
                    "side": pa.array(np.full(t.num_rows, side, np.int8)),
                }
            )

        return fn

    tagged = base.map_batches(tag(0), batch_format="pyarrow").union(
        cons.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        m = g["member_id"].to_numpy(zero_copy_only=False)
        cl = g["cluster_id"].to_numpy(zero_copy_only=False)
        sd = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sd, m))
        m_s, cl_s, sd_s = m[order], cl[order], sd[order]
        same = (
            (m_s[1:] == m_s[:-1]) & (sd_s[:-1] == 0) & (sd_s[1:] == 1)
            if len(m_s) > 1
            else np.zeros(0, bool)
        )
        i = np.flatnonzero(same)
        off = ray.get(off_ref)
        ok = (cl_s[i] == cl_s[i + 1]) & ~np.isin(cl_s[i], off)
        return pa.table({"n": pa.array([int(ok.sum())], pa.int64())})

    n_preserved = int(
        bucket_shuffle(tagged, "member_id", 64, per_bucket).sum("n") or 0
    )

    return pa.table(
        {
            "n_members": pa.array([n_members], pa.int64()),
            "n_offending_members": pa.array([n_offending], pa.int64()),
            "n_preserved": pa.array([n_preserved], pa.int64()),
            "n_violations": pa.array([n_violations], pa.int64()),
        }
    )


def customer_clusters_incremental(sf_dir: str) -> Dataset:
    """Recrawl-shaped incremental clustering: candidate pairs are split
    deterministically into a STANDING set (clustered the usual way) and
    a DELTA set (md5(id_a)%5==0 — the 'new crawl' pairs); the delta
    merges into the standing labels via
    :func:`xlink_ray.stages.clustering.incremental_components` — work
    scales with the delta. Output is pinned equal to the full recompute
    over ALL pairs, so the DuckDB oracle is er_clusters' recursive
    closure verbatim."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.functions.hashing import md5_low64
    from xlink_ray.stages.clustering import (
        connected_components,
        incremental_components,
    )

    pairs = customer_pairs(sf_dir).materialize()  # both splits consume it

    def split(delta: bool):
        def fn(t: pa.Table) -> pa.Table:
            h = md5_low64([str(x) for x in t["id_a"].to_pylist()]) % np.uint64(5)
            m = h == 0 if delta else h != 0
            return t.filter(pa.array(m)).select(["id_a", "id_b"])

        return fn

    standing = connected_components(
        pairs.map_batches(split(False), batch_format="pyarrow"),
        nodes=_customers(sf_dir),
        node_col="c_custkey",
    )
    return incremental_components(
        standing, pairs.map_batches(split(True), batch_format="pyarrow")
    )


def customer_golden_incremental(sf_dir: str) -> Dataset:
    """Recrawl-shaped golden-record maintenance: the standing golden
    table (built from the standing pair split) is UPDATED under the
    delta pairs — survivorship re-folds only for clusters the
    incremental re-clustering touched (stages/survivor.
    golden_records_incremental). Pinned equal to a full er_golden
    recompute over all pairs, so the oracle is er_golden's SQL
    verbatim."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.functions.hashing import md5_low64
    from xlink_ray.stages.clustering import (
        connected_components,
        incremental_components,
    )
    from xlink_ray.stages.survivor import golden_records, golden_records_incremental

    pairs = customer_pairs(sf_dir).materialize()

    def split(delta: bool):
        def fn(t: pa.Table) -> pa.Table:
            h = md5_low64([str(x) for x in t["id_a"].to_pylist()]) % np.uint64(5)
            m = h == 0 if delta else h != 0
            return t.filter(pa.array(m)).select(["id_a", "id_b"])

        return fn

    standing = connected_components(
        pairs.map_batches(split(False), batch_format="pyarrow"),
        nodes=_customers(sf_dir),
        node_col="c_custkey",
    ).materialize()  # consumed by old-golden AND the incremental merge

    records = read_pq(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_mktsegment"],
    )
    gkw = dict(
        id_col="c_custkey",
        carry_min_id=["c_name"],
        argmax_col="c_acctbal",
        carry_argmax=["c_mktsegment"],
    )
    old_golden = golden_records(standing, records, **gkw)
    new_labels, remap = incremental_components(
        standing, pairs.map_batches(split(True), batch_format="pyarrow"),
        with_remap=True,
    )
    return golden_records_incremental(
        old_golden, new_labels, records, remap, **gkw
    )


def customer_pairs_qgram(sf_dir: str, threshold_bp: int = 7000) -> Dataset:
    """Character 3-gram Jaccard scoring of blocked candidate pairs —
    the positional-tolerant name scorer (Gravano et al. 2001) that
    catches transposed/shifted edits Levenshtein bands miss.

    Blocking key = c_nationkey (skew-salted), score = distinct-3-gram
    Jaccard in integer basis points (``floor(10000·sim)``, exactly
    ``(10000*inter)//union`` — integers dodge float-hash issues), keep
    pairs ≥ ``threshold_bp``. Output (id_a, id_b, sim_bp), id_a < id_b.
    """
    import numpy as np
    import pyarrow.compute as pc

    from xlink_ray.functions.similarity import qgram_jaccard_pairs

    edges = block_score_pairs(
        _customers(sf_dir),
        key_cols="c_nationkey",
        id_col="c_custkey",
        attr_col="c_name",
        scorer=lambda A, B: np.floor(qgram_jaccard_pairs(A, B, 3) * 10000.0),
        keep=lambda s: s >= threshold_bp,
        skew_cap=8192,  # exact hot-key splitting; output identical
    )

    return edges.map_batches(
        lambda t: pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "sim_bp": pc.cast(t["score"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def customer_bcubed(sf_dir: str) -> Dataset:
    """B-cubed contingency table of the predicted customer clusters vs
    the gold labeling gold_id = c_custkey // 10 (Bagga & Baldwin 1998;
    the extended B-cubed of Amigó et al. 2009 reduces to it for hard
    clusterings). One row per nonempty (pred, gold) cell:

        (cluster_id, gold_id, n_common, n_pred, n_gold)

    B-cubed precision = Σ n_common²/n_pred / N and recall =
    Σ n_common²/n_gold / N are trivial folds over this table — the
    query emits the INTEGER table so the hash gate never compares
    order-dependent float sums (the repo's basis-point convention).

    Scale shape: ONE grouped-sum exchange over per-batch partial
    (cluster, gold) counts — node-count rows in, ≤ #entities cells out
    — then two tiny bucket exchanges over the CELL table stamp the
    marginals (cells of one cluster/gold share a bucket by key-mod).
    Nothing corpus-sized reaches the driver."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum
    from xlink_ray.stages._bucket import bucket_shuffle

    labels = customer_clusters(sf_dir)

    def partial_cells(t: pa.Table) -> pa.Table:
        cl = t["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gold = t["member_id"].to_numpy(zero_copy_only=False).astype(np.int64) // 10
        tb = pa.table(
            {
                "cluster_id": pa.array(cl),
                "gold_id": pa.array(gold),
                "n_common": pa.array(np.ones(len(cl), dtype=np.int64)),
            }
        )
        return tb.group_by(["cluster_id", "gold_id"]).aggregate(
            [("n_common", "sum")]
        ).rename_columns(["cluster_id", "gold_id", "n_common"])

    cells = (
        labels.map_batches(partial_cells, batch_format="pyarrow")
        .groupby(["cluster_id", "gold_id"])
        .aggregate(Sum("n_common", alias_name="n_common"))
    )

    def stamp_marginal(key: str, out_col: str):
        def fold(bucket: pa.Table) -> pa.Table:
            k = bucket[key].to_numpy(zero_copy_only=False)
            n = bucket["n_common"].to_numpy(zero_copy_only=False)
            u, inv = np.unique(k, return_inverse=True)
            sums = np.zeros(len(u), dtype=np.int64)
            np.add.at(sums, inv, n)
            out = bucket.drop_columns(["__b"])
            return out.append_column(out_col, pa.array(sums[inv]))

        return fold

    with_pred = bucket_shuffle(cells, "cluster_id", 64, stamp_marginal("cluster_id", "n_pred"))
    with_both = bucket_shuffle(with_pred, "gold_id", 64, stamp_marginal("gold_id", "n_gold"))
    return with_both.map_batches(
        lambda t: t.select(["cluster_id", "gold_id", "n_common", "n_pred", "n_gold"]),
        batch_format="pyarrow",
    )


def _customer_block_graph(sf_dir: str, max_block: int = 1024) -> Dataset:
    """Shared ECBS block graph for the meta-blocking queries: four
    redundancy-positive key schemes per customer — nation, account-
    balance band, name-digit prefix (7) and suffix (last 2)."""
    import numpy as np
    import pyarrow.compute as pc

    from xlink_ray.stages.metablocking import meta_block_graph

    cust = read_pq(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
    )

    def keys_of(t: pa.Table) -> pa.Table:
        ids = t["c_custkey"].cast(pa.int64())
        n = t.num_rows
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        band = np.floor(bal / 100.0).astype(np.int64)
        schemes = [
            pc.binary_join_element_wise(
                pa.array(["n:"] * n), pc.cast(t["c_nationkey"], pa.string()), ""
            ),
            pc.binary_join_element_wise(
                pa.array(["b:"] * n), pa.array([str(x) for x in band]), ""
            ),
            pc.binary_join_element_wise(
                pa.array(["p:"] * n), pc.utf8_slice_codeunits(t["c_name"], 9, 16), ""
            ),
            pc.binary_join_element_wise(
                pa.array(["s:"] * n), pc.utf8_slice_codeunits(t["c_name"], 16, 10_000), ""
            ),
        ]
        return pa.table(
            {
                "id": pa.concat_arrays([ids.combine_chunks()] * 4),
                "key": pa.concat_arrays([s.combine_chunks() if hasattr(s, "combine_chunks") else s for s in schemes]),
            }
        )

    keys = cust.map_batches(keys_of, batch_format="pyarrow")
    graph, _ = meta_block_graph(keys, max_block=max_block)
    return graph


def customer_meta_blocking(sf_dir: str, max_block: int = 1024) -> Dataset:
    """Meta-blocked candidate pairs (stages/metablocking.py): the
    four-scheme ECBS graph pruned by WEP. Output: (id_a, id_b, cbs,
    nb_a, nb_b, w_e9), only the edges strictly above the global mean
    weight — the candidate set a pairwise scorer would then run on."""
    from xlink_ray.stages.metablocking import wep_prune

    return wep_prune(_customer_block_graph(sf_dir, max_block=max_block))


def customer_meta_blocking_cnp(sf_dir: str, k: int = 3, max_block: int = 1024) -> Dataset:
    """Cardinality-node-pruned meta-blocking: same four-scheme block
    graph as ``customer_meta_blocking``, but each record keeps only its
    k strongest neighbors (union over endpoints) — the budget-bounded
    pruning that caps comparisons per record at crawl scale."""
    from xlink_ray.stages.metablocking import cnp_prune

    graph = _customer_block_graph(sf_dir, max_block=max_block)
    return cnp_prune(graph, k)


def customer_clusters_meta(sf_dir: str, max_block: int = 1024) -> Dataset:
    """End-to-end meta-blocked ER: the WEP-pruned ECBS pair graph →
    transitive closure → (member_id, cluster_id = min id of the
    component); every customer appears (non-candidates as
    singletons). The blocking-side composition of the clustering
    stack — the same closure the lev/JW pipelines use, fed by the
    weight-pruned candidate graph instead of a similarity threshold."""
    from xlink_ray.stages.clustering import connected_components

    pairs = customer_meta_blocking(sf_dir, max_block=max_block)
    cust = read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    return connected_components(
        pairs, nodes=cust, node_col="c_custkey"
    )


def customer_meta_scored(sf_dir: str, max_block: int = 1024) -> Dataset:
    """Meta-blocking feeding the north-star scorer: the WEP-pruned
    candidate pairs scored with Jaro-Winkler on the customer names.
    Names attach reduce-side (two stamp_cluster bucket exchanges —
    nothing broadcast), scoring is pair-axis vectorized. Output:
    (id_a, id_b, w_e9, sim_bp) for every surviving candidate edge."""
    import numpy as np

    from xlink_ray.functions.similarity import JaroWinklerBlockScorer, jaro_winkler_pairs
    from xlink_ray.stages.survivor import stamp_cluster

    pairs = customer_meta_blocking(sf_dir, max_block=max_block).map_batches(
        lambda t: t.select(["id_a", "id_b", "w_e9"]), batch_format="pyarrow"
    )
    names = read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])

    s1 = stamp_cluster(
        pairs,
        names,
        id_col="id_a",
        carry_cols=["id_b", "w_e9"],
        carry_types={"id_b": pa.int64(), "w_e9": pa.int64()},
        member_id_col="c_custkey",
        cluster_col="c_name",
        cluster_type=pa.string(),
    ).map_batches(
        lambda t: pa.table(
            {
                "id_a": t["id"],
                "id_b": t["id_b"],
                "w_e9": t["w_e9"],
                "name_a": t["cluster"],
            }
        ),
        batch_format="pyarrow",
    )
    s2 = stamp_cluster(
        s1,
        names,
        id_col="id_b",
        carry_cols=["id_a", "w_e9", "name_a"],
        carry_types={
            "id_a": pa.int64(),
            "w_e9": pa.int64(),
            "name_a": pa.string(),
        },
        member_id_col="c_custkey",
        cluster_col="c_name",
        cluster_type=pa.string(),
    )

    def score(t: pa.Table) -> pa.Table:
        na = t["name_a"].to_numpy(zero_copy_only=False)
        nb = t["cluster"].to_numpy(zero_copy_only=False)
        sim = jaro_winkler_pairs(na, nb) * 10000.0
        return pa.table(
            {
                "id_a": t["id_a"],
                "id_b": t["id"],
                "w_e9": t["w_e9"],
                "sim_bp": pa.array(np.floor(sim).astype(np.int64)),
            }
        )

    return s2.map_batches(score, batch_format="pyarrow")
