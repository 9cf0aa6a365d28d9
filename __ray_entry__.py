"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline smoke on sf0.001.
``queries()`` — one callable per implemented operator/pipeline
(SURVEY.md §2); each takes ``sf_dir`` and returns a Dataset / DataFrame
/ Arrow table. ``oracle_sql()`` — DuckDB-equivalent SQL over the
pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings) for every SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init`` / ``ray.shutdown`` anywhere in the library.

The synthesized ``pages`` table (BASELINE.json input_hint) is a pure
deterministic function of ``documents`` (see xlink_ray/synth.py), which
is what makes the page-pipeline queries oracle-checkable: the SQL
recomputes the same quantities straight from ``documents``.
"""

from __future__ import annotations

from xlink_ray.util import read_pq

from collections.abc import Callable
from typing import Any

from xlink_ray.synth import ALIAS_DICT, alias_rows

SF_SMOKE = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- helpers

def _alias_values_sql() -> str:
    rows = ", ".join(
        f"('{m}', '{e}', {slot}, {n})" for (m, e, slot, n) in alias_rows()
    )
    return f"alias(mention, entity_id, slot, n_slots) AS (VALUES {rows})"


def _occ_cte() -> str:
    """Per-(doc, alias) occurrence counts with the doc's linked entity —
    mirrors synth.mark_text + extraction (substring counts equal token
    counts for this vocabulary; see xlink_ray/synth.py)."""
    return f"""WITH {_alias_values_sql()},
occ AS (
  SELECT d.doc_id, d.source, a.mention, a.entity_id,
         CAST((length(d.text) - length(replace(d.text, a.mention, ''))) / length(a.mention) AS BIGINT) AS cnt
  FROM documents d JOIN alias a ON (d.doc_id % a.n_slots) = a.slot
),
ma AS (
  SELECT mention, entity_id, CAST(sum(cnt) AS BIGINT) AS link_count
  FROM occ WHERE cnt > 0 GROUP BY mention, entity_id
)"""


# ---------------------------------------------------------------- queries

def _q_extract_text(sf_dir: str):
    """M1 byte-identity surface: pages → markup-stripped text per doc."""
    import pyarrow as pa

    from xlink_ray.pipelines import dictbuild
    from xlink_ray.synth import doc_id_of_url

    def renumber(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": doc_id_of_url(batch["doc_id"]), "text": batch["text"]})

    return dictbuild.corpus(sf_dir).map_batches(renumber, batch_format="pyarrow")


def _q_mention_anchors(sf_dir: str):
    from xlink_ray.pipelines import dictbuild

    return dictbuild.mention_anchors(sf_dir)


def _q_freq_m(sf_dir: str):
    from xlink_ray.pipelines import dictbuild

    return dictbuild.freq_m(sf_dir)


def _q_e_given_m(sf_dir: str):
    from xlink_ray.pipelines import dictbuild

    return dictbuild.prob_tables(sf_dir).e_given_m


def _q_m_given_e(sf_dir: str):
    from xlink_ray.pipelines import dictbuild

    return dictbuild.prob_tables(sf_dir).m_given_e


def _q_entity_prior(sf_dir: str):
    from xlink_ray.pipelines import dictbuild

    return dictbuild.prob_tables(sf_dir).entity_prior


def _q_link_prob(sf_dir: str):
    from xlink_ray.pipelines import dictbuild

    return dictbuild.prob_tables(sf_dir).link_prob


def _q_out_links(sf_dir: str):
    from xlink_ray.pipelines import dictbuild

    return dictbuild.out_links(sf_dir)


def _q_er_pairs(sf_dir: str):
    from xlink_ray.pipelines import er

    return er.customer_pairs(sf_dir)


def _q_er_pairs_jw(sf_dir: str):
    from xlink_ray.pipelines import er

    return er.customer_pairs_jw(sf_dir)


def _q_er_clusters(sf_dir: str):
    from xlink_ray.pipelines import er

    return er.customer_clusters(sf_dir)


def _q_er_attach(sf_dir: str):
    """Incremental linkage (stages/attach.py): new records (1-in-4
    customers) attach to the best Jaro-Winkler match among the standing
    base records' clusters within their nation block, or found a
    singleton. One blocking shuffle + an in-task bipartite argmax —
    the pair grid never leaves the group task."""
    from xlink_ray.pipelines import er

    return er.customer_attach(sf_dir)


def _q_er_golden(sf_dir: str):
    """Survivorship (stages/survivor.py): every customer cluster merged
    to one golden record — representative name from the min member id,
    balance/segment from the max-balance member (ties → min id). Two
    bounded hash-bucket shuffles, zero driver state."""
    from xlink_ray.pipelines import er

    return er.customer_golden(sf_dir)


def _q_er_cluster_metrics(sf_dir: str):
    """Per-cluster review metrics (n_members, n_edges, density ppm) —
    the over-merge QA surface; reduce-side stamps and bucket folds only."""
    from xlink_ray.pipelines import er

    return er.customer_cluster_metrics(sf_dir)


def _q_flagship_attach(sf_dir: str):
    """Incremental flagship crawl: dictionary + clusters reused from
    the standing run, new pages stream through the same scan,
    occurrences attach via the sorted-neighborhood context edge.
    SQL-oracled (_attach_sql; cos_bp is already integer-quantized in
    the product output)."""
    from xlink_ray.pipelines import flagship

    return flagship.attach_new_crawl(sf_dir)


def _q_html_extract_text(sf_dir: str):
    """The input_hint contract end-to-end from the html BINARY column:
    pages.html → html_to_text (vectorized tag strip + entity decode) →
    markup extraction → per-doc plain text, byte-identical to
    documents.text (the M1 invariant through the html path)."""
    import pyarrow.compute as _pc

    from xlink_ray import synth
    from xlink_ray.stages.extract import ExtractCorpusBatch, html_to_text

    pages = synth.synth_pages(sf_dir)  # full pages incl. html binary

    def drop_text(t):
        return t.drop_columns(["text"])  # force recovery from html

    corpus = (
        pages.map_batches(drop_text, batch_format="pyarrow")
        .map_batches(html_to_text, batch_format="pyarrow")
        .map_batches(ExtractCorpusBatch(), batch_format="pyarrow")
    )

    def fmt(t):
        import pyarrow as _pa

        from xlink_ray.synth import doc_id_of_url

        return _pa.table(
            {"doc_id": doc_id_of_url(t["doc_id"]), "text": t["text"]}
        )

    return corpus.map_batches(fmt, batch_format="pyarrow")


def _q_crawl_freshness(sf_dir: str):
    """warc_ts consumed end-to-end (input_hint contract): per crawl
    source, page count + earliest/latest crawl timestamp as epoch
    seconds. Per-batch partial aggregates → one tiny groupby."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from ray.data.aggregate import Max, Min, Sum
    from xlink_ray import synth

    pages = synth.synth_pages(sf_dir)

    def partial(t: _pa.Table) -> _pa.Table:
        src = _pc.replace_substring_regex(
            t["url"], r"^https://crawl\.example\.org/([^/]+)/.*$", r"\1"
        )
        epoch = _pc.divide(_pc.cast(t["warc_ts"], _pa.int64()), 1_000_000)
        g = (
            _pa.table({"source": src, "ts": epoch})
            .group_by("source")
            .aggregate([("ts", "min"), ("ts", "max"), ("ts", "count")])
        )
        return g.rename_columns(["source", "mn", "mx", "n"])

    out = (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n_pages"),
            Min("mn", alias_name="first_ts"),
            Max("mx", alias_name="last_ts"),
        )
    )
    return out


def _q_candidate_recall(sf_dir: str):
    """Gold-candidate recall of the J2-pruned dictionary (the standard
    EL dictionary-coverage metric): one metrics row."""
    import ray.data as rd

    from xlink_ray.pipelines import dictbuild
    from xlink_ray.stages.evaluation import candidate_recall
    from xlink_ray.stages.prob import filter_mention_anchors
    from xlink_ray.stages import aggregates

    ma = dictbuild.mention_anchors(sf_dir)
    kept = filter_mention_anchors(
        ma,
        dictbuild.freq_m(sf_dir),
        aggregates.self_links(dictbuild.mentions(sf_dir)),
    ).select_columns(["mention", "entity_id"])
    return rd.from_arrow(candidate_recall(dictbuild.mentions(sf_dir), kept))


def _q_quantile_norm(sf_dir: str):
    """Per-source quantile normalization of document lengths
    (stats.py:quantile_normalize) — the cross-domain score-calibration
    step; integer percent-rank ppm."""
    import ray.data as rd

    from xlink_ray.stages.stats import quantile_normalize

    docs = read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return quantile_normalize(docs, "source", "n_chars", "doc_id")


def _q_fs_review_queue(sf_dir: str):
    """Fellegi–Sunter clerical-review band: pairs too strong to reject,
    too weak to auto-link."""
    from xlink_ray.pipelines import er

    return er.customer_fs_review_queue(sf_dir)


def _q_er_exemplars(sf_dir: str):
    """Per-cluster exemplars: top-2 members by balance (stamp → grouped
    top-k composition)."""
    from xlink_ray.pipelines import er

    return er.customer_cluster_exemplars(sf_dir)


def _q_flagship_golden(sf_dir: str):
    """Webtext golden records: each flagship cluster → one canonical
    row via string-id survivorship. SQL-oracled (_golden_sql) with
    believe quantized to 1e-6 half-up on both sides."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.pipelines import flagship

    def quant(t: pa.Table) -> pa.Table:
        b = t["believe"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["believe"]).append_column(
            "believe_q",
            pa.array(np.floor(b * 1e6 + 0.5).astype(np.int64), pa.int64()),
        )

    return flagship.golden_clusters(sf_dir).map_batches(quant, batch_format="pyarrow")


def _q_er_clusters_constrained(sf_dir: str):
    """Cannot-link constrained clustering (rows-only: the repair is the
    literature's order-dependent sequential constrained union-find —
    not SQL-expressible; pinned against the sequential reference in
    tests/test_clustering.py). Constraint work scales with violations:
    only offending components re-resolve."""
    from xlink_ray.pipelines import er

    return er.customer_clusters_constrained(sf_dir)


def _q_er_clusters_incremental(sf_dir: str):
    """Recrawl-shaped incremental transitive clustering: standing
    labels + delta pairs merged via a delta-bounded label-graph CC
    (stages/clustering.incremental_components) — pinned EQUAL to the
    full recompute, so the oracle is er_clusters' recursive closure
    verbatim."""
    from xlink_ray.pipelines import er

    return er.customer_clusters_incremental(sf_dir)


def _q_er_golden_incremental(sf_dir: str):
    """Golden-record maintenance under the recrawl delta: survivorship
    re-folds ONLY for clusters the incremental re-clustering touched
    (survivor.golden_records_incremental); pinned equal to the full
    er_golden recompute, oracle verbatim."""
    from xlink_ray.pipelines import er

    return er.customer_golden_incremental(sf_dir)


def _q_er_constrained_invariants(sf_dir: str):
    """SQL-checkable projections of the (order-dependent, rows-only)
    constrained clustering: member count, offending-component member
    count, pass-through-preserved count, post-repair violation count
    (er.customer_constrained_invariants; oracle replicates via the
    recursive unconstrained closure + the cannot list)."""
    from xlink_ray.pipelines import er

    return er.customer_constrained_invariants(sf_dir)


def _q_er_alignment(sf_dir: str):
    """Cross-run cluster alignment (stages/align.py): each new cluster
    mapped to the max-overlap old cluster; one stamp + one bucket fold."""
    from xlink_ray.pipelines import er

    return er.customer_cluster_alignment(sf_dir)


def _q_er_pairs_multiblock(sf_dir: str):
    """Multi-scheme blocking (blocking.py:union_pair_sets): nation-key
    pairs ∪ balance-band pairs, exact pair-distinct in one bucket
    exchange — the recall lever for cross-block matches."""
    from xlink_ray.pipelines import er

    return er.customer_pairs_multiblock(sf_dir)


def _q_er_pairs_composite(sf_dir: str):
    """Composite-key blocking (the scale path for customer ER):
    (nation, name-prefix) ∪ (nation, name-suffix) blocks with exact
    pair-distinct — near-constant block sizes instead of O(n²/25)
    nation-key work; recall 1.0 vs the nation-only truth on the
    fixed-width TPC-H names (equal-length Lev≤1 pairs differ in one
    segment only)."""
    from xlink_ray.pipelines import er

    return er.customer_pairs_composite(sf_dir)


def _q_er_pairs_qgram(sf_dir: str):
    """Character 3-gram Jaccard pair scoring (er.customer_pairs_qgram):
    the positional-tolerant name scorer — nation-blocked, skew-salted,
    one lexsort per chunk for all pair intersections; similarity in
    integer basis points."""
    from xlink_ray.pipelines import er

    return er.customer_pairs_qgram(sf_dir)


def _q_er_bcubed(sf_dir: str):
    """B-cubed contingency table of predicted clusters vs the gold
    labeling custkey//10 (er.customer_bcubed): integer (pred, gold)
    cells + marginals; precision/recall are trivial folds over it."""
    from xlink_ray.pipelines import er

    return er.customer_bcubed(sf_dir)


def _q_fs_weights(sf_dir: str):
    """Fellegi–Sunter m/u probabilities + log2 weights per agreement
    field (stages/fs.py), learned from labeled blocked customer pairs
    (label = the er_pairs edit-distance rule)."""
    from xlink_ray.pipelines import er

    return er.customer_fs_weights(sf_dir)


def _q_fs_scores(sf_dir: str):
    """Every blocked customer pair scored by the learned FS
    log-likelihood-ratio sum."""
    from xlink_ray.pipelines import er

    return er.customer_fs_scores(sf_dir)


def _q_er_hierarchy(sf_dir: str):
    """Threshold dendrogram (stages/clustering.py:threshold_hierarchy):
    customer clusters at JW cut-offs 9800/9500/9200 bp in ONE pass —
    level i+1 runs CC over level i's CONTRACTED clusters with only the
    [t_i+1, t_i) band edges, labels composed by reduce-side stamps."""
    from xlink_ray.pipelines import er

    return er.customer_threshold_hierarchy(sf_dir)


def _hierarchy_sql(thresholds=(9800, 9500, 9200)) -> str:
    """Oracle: an independent recursive closure per threshold (the
    hierarchy must equal direct per-threshold CC), min-id labels,
    singletons from the customer universe."""
    parts, sels = [], []
    for t in thresholds:
        parts.append(
            f"""e{t} AS (SELECT a.c_custkey AS u, b.c_custkey AS v
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE CAST(floor(jaro_winkler_similarity(a.c_name, b.c_name)*10000) AS BIGINT) >= {t}),
sym{t} AS (SELECT u, v FROM e{t} UNION SELECT v, u FROM e{t}),
reach{t}(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach{t} r JOIN sym{t} s ON r.v = s.u),
lab{t} AS (SELECT u AS member_id, CAST({t} AS BIGINT) AS threshold,
           CAST(min(v) AS BIGINT) AS cluster_id FROM reach{t} GROUP BY u)"""
        )
        sels.append(f"SELECT * FROM lab{t}")
    return "WITH RECURSIVE " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sels)


def _q_er_one_to_one(sf_dir: str):
    """Clean-clean 1:1 linkage by symmetric best match
    (stages/attach.py:mutual_best_pairs): a pair survives iff each
    record is the other's block argmax (max JW bp, min partner id on
    ties) and sim ≥ 7000 bp."""
    from xlink_ray.pipelines import er

    return er.customer_one_to_one(sf_dir)


def _q_fs_em_weights(sf_dir: str):
    """UNSUPERVISED Fellegi–Sunter fit (Winkler 1988 EM, the Splink
    recipe; stages/fs.py:fs_em_weights): λ/m/u learned label-free by a
    4-round EM over the 2³-row agreement-pattern contingency, every
    parameter quantized half-up onto the int64 1e-9 grid so the oracle's
    unrolled per-iteration CTEs replay the identical fit."""
    from xlink_ray.pipelines import er

    return er.customer_fs_em_weights(sf_dir)


def _q_fs_em_posteriors(sf_dir: str):
    """Per-pair match posterior P(match | γ) under the EM-fitted
    mixture for every blocked customer pair (id_a, id_b, p_e9)."""
    from xlink_ray.pipelines import er

    return er.customer_fs_em_posteriors(sf_dir)


def _q_er_clusters_em(sf_dir: str):
    """Unsupervised ER end-to-end (the Splink pipeline shape): blocked
    agreement features → quantized EM fit → match posteriors →
    transitive closure over pairs with P(match|γ) ≥ 0.1. No labels
    anywhere in the chain."""
    from xlink_ray.pipelines import er

    return er.customer_clusters_em(sf_dir)


def _q_er_clusters_dist(sf_dir: str):
    """Same result via the distributed label-propagation path."""
    from xlink_ray.pipelines import er

    return er.customer_clusters(sf_dir, method="distributed")


def _q_er_clusters_bucket(sf_dir: str):
    """Same result via the raw-task Hash-Min + pointer-jumping path
    (stages/graph.py cc_min_label): labels live co-partitioned with
    int64 node buckets; ~4·nbuckets tiny tasks per round instead of
    ~6 materialized Dataset executions."""
    from xlink_ray.pipelines import er

    return er.customer_clusters(sf_dir, method="bucket")


def _q_doc_mentions(sf_dir: str):
    """Per-document mention occurrence counts (candidate-generation
    surface, SQL-checkable)."""
    import pyarrow as pa

    from xlink_ray.pipelines import dictbuild
    from xlink_ray.stages.aggregates import grouped_count
    from xlink_ray.synth import doc_id_of_url

    ments = dictbuild.mentions(sf_dir).map_batches(
        lambda t: pa.table(
            {"doc_id": doc_id_of_url(t["doc_id"]), "mention": t["mention"]}
        ),
        batch_format="pyarrow",
    )
    return grouped_count(ments, ["doc_id", "mention"], "n")


def _q_links(sf_dir: str):
    """Resolved occurrence links (disambiguation output). SQL-oracled:
    the fixture embedding table rides the oracle as DOUBLE literals and
    believe is quantized to 1e-6 half-up on BOTH sides (_links_sql);
    selection (argmax, thresholds, edge signs) stays on the raw floats
    in both engines."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.pipelines import flagship

    def quant(t: pa.Table) -> pa.Table:
        b = t["believe"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "offset": t["offset"],
                "mention": t["mention"],
                "entity_id": t["entity_id"],
                "believe_q": pa.array(
                    np.floor(b * 1e6 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return flagship.links(sf_dir).map_batches(quant, batch_format="pyarrow")


def _q_links_partitioned(sf_dir: str):
    """The no-dictionary-broadcast linking path: per-entity state
    attaches via hash-shuffle Dataset.joins (equality with the
    broadcast path is test-pinned in tests/test_flagship.py).
    SQL-oracled via the same replica as links."""
    from xlink_ray.pipelines import flagship

    return flagship.links_partitioned(sf_dir).select_columns(
        ["doc_id", "offset", "mention", "entity_id"]
    )


def _q_flagship_clusters(sf_dir: str):
    """Full ER pipeline → clusters. SQL-oracled (_clusters_sql): the
    sorted-neighborhood run labelling is a window cumsum over the
    adjacent-context cosine in DuckDB; fidelity additionally gated by
    the transcription-oracle pairwise-F1 test in tests/test_flagship.py."""
    from xlink_ray.pipelines import flagship

    return flagship.clusters(sf_dir)


def _docs(sf_dir: str):
    import ray.data as rd

    return read_pq(f"{sf_dir}/documents.parquet")


def _docs_as_lines(sf_dir: str):
    """Deterministic line-structured view of the documents table (the
    synthetic corpus is single-line): words chunked into 8-word lines,
    terminal '.' on lines with (doc_id + line_idx) % 3 != 0, first line
    repeated for doc_id % 5 == 0, a 'lorem ipsum' line for % 17 == 0
    and a '{'-bearing line for % 23 == 0 — exercising every C4 rule and
    the within-doc line dedup. Replicated verbatim in the oracles."""
    import pyarrow as pa

    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out = []
        for d, s in zip(ids, t["text"].to_pylist()):
            ws = s.split(" ")
            lines = [
                " ".join(ws[j : j + 8]) + ("." if (d + j // 8) % 3 != 0 else "")
                for j in range(0, len(ws), 8)
            ]
            if d % 5 == 0:
                lines.append(lines[0])
            if d % 17 == 0:
                lines.append("lorem ipsum dolor.")
            if d % 23 == 0:
                lines.append("function() { var x }.")
            out.append("\n".join(lines))
        return pa.table(
            {"doc_id": t["doc_id"], "text": pa.array(out, pa.string())}
        )

    return _docs(sf_dir).map_batches(derive, batch_format="pyarrow")


_LINED_SQL = """
w AS (SELECT doc_id, unnest(string_split(text,' ')) AS wd,
      generate_subscripts(string_split(text,' '),1) AS i FROM documents),
ln0 AS (SELECT doc_id, (i-1)//8 AS li, string_agg(wd, ' ' ORDER BY i) AS line
        FROM w GROUP BY doc_id, (i-1)//8),
ln AS (SELECT doc_id, li,
       line || CASE WHEN (doc_id + li) % 3 <> 0 THEN '.' ELSE '' END AS line
       FROM ln0),
extra AS (
  SELECT doc_id, 1000000 AS li, line FROM ln WHERE li = 0 AND doc_id % 5 = 0
  UNION ALL SELECT doc_id, 1000001, 'lorem ipsum dolor.' FROM documents WHERE doc_id % 17 = 0
  UNION ALL SELECT doc_id, 1000002, 'function() { var x }.' FROM documents WHERE doc_id % 23 = 0),
lined AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY li) AS text
          FROM (SELECT * FROM ln UNION ALL SELECT * FROM extra) GROUP BY doc_id)"""


def _q_c4_filter(sf_dir: str):
    """C4 'clean' filter bundle (stages/textstats.py:c4_filter) over
    the line-structured corpus: terminal-punctuation + min-words line
    rule, lorem-ipsum / brace / min-sentences doc rules — all
    integer-exact, zero-shuffle."""
    from xlink_ray.stages.textstats import c4_filter

    return c4_filter(_docs_as_lines(sf_dir))


def _q_deduped_lines(sf_dir: str):
    """Within-document exact line dedup (RefinedWeb repeated-line rule;
    stages/textstats.py:dedup_lines): first occurrence kept in order,
    per-batch lexsort scan, zero-shuffle."""
    from xlink_ray.stages.textstats import dedup_lines

    return dedup_lines(_docs_as_lines(sf_dir))


def _q_exact_dedup(sf_dir: str):
    from xlink_ray.stages.dedup import exact_dedup_keepers

    return exact_dedup_keepers(_docs(sf_dir))


def _q_token_counts(sf_dir: str):
    from xlink_ray.stages.textstats import token_counts

    return token_counts(_docs(sf_dir))


def _q_quality_stats(sf_dir: str):
    from xlink_ray.stages.textstats import quality_stats

    return quality_stats(_docs(sf_dir))


def _q_jaccard_partners(sf_dir: str):
    from xlink_ray.stages.dedup import jaccard_partner_counts

    return jaccard_partner_counts(_docs(sf_dir), block_col="lang", th=0.999)


def _q_embedding_dup(sf_dir: str):
    import ray.data as rd

    from xlink_ray.stages.dedup import embedding_dup_pairs

    return embedding_dup_pairs(
        read_pq(f"{sf_dir}/embeddings.parquet"), th=0.35
    )


def _q_ann_topk(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd

    from xlink_ray.stages.ann import brute_topk

    q = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = q.sort_by("vec_id").slice(0, 5)
    queries = np.asarray(q["embedding"].to_pylist(), dtype=np.float64)
    return brute_topk(read_pq(f"{sf_dir}/embeddings.parquet"), queries, k=10)


def _q_word_analogy(sf_dir: str):
    """Embedding-QA analogy ranking (reference
    TrainJointModel/src/analogy.c:1-50, compute-accuracy.c: nearest
    neighbors of b−a+c over per-word-normalized vectors, the three
    inputs excluded): triples (a,b,c)=(3i,3i+1,3i+2) for i<5 →
    (query_id, rank, vec_id), top-5 by (cos desc, vec_id). Distributed
    scan via ann.brute_topk (k=8 covers the ≤3 exclusions); only the
    k-bounded result touches the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from xlink_ray.stages.ann import brute_topk

    tb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    ids = np.asarray(tb["vec_id"].to_pylist())
    sel = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(ids, tb["embedding"].to_pylist())
        if i < 15
    }

    def nrm(v):
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    qs, excl = [], []
    for i in range(5):
        a, b, c = 3 * i, 3 * i + 1, 3 * i + 2
        qs.append(nrm(sel[b]) - nrm(sel[a]) + nrm(sel[c]))
        excl.append({a, b, c})
    res = brute_topk(
        read_pq(f"{sf_dir}/embeddings.parquet"), np.asarray(qs), k=8
    ).to_pandas()
    out = []
    for qid, grp in res.groupby("query_id"):
        keep = grp.sort_values("rank")
        keep = keep[~keep["vec_id"].isin(excl[qid])].head(5)
        for r, vid in enumerate(keep["vec_id"], 1):
            out.append((int(qid), r, int(vid)))
    return pd.DataFrame(out, columns=["query_id", "rank", "vec_id"])


_EXPAND_DICT_ROWS = [
    # (title-mention, entity_id): branch-a row (known mention, new
    # entity), a no-op row (already-anchored pair), and two branch-b
    # rows sharing a novel title (smallest entity_id wins)
    ("spark", "ent_spark_extra"),
    ("window", "ent_window"),
    ("novelterm", "ent_novel_b"),
    ("novelterm", "ent_novel_a"),
]


def _expand_inputs(sf_dir: str):
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.pipelines import dictbuild

    ma = dictbuild.mention_anchors(sf_dir)
    ed = rd.from_arrow(
        pa.table(
            {
                "mention": [m for m, _ in _EXPAND_DICT_ROWS],
                "entity_id": [e for _, e in _EXPAND_DICT_ROWS],
            }
        )
    )
    return ma, ed


def _q_expanded_anchors(sf_dir: str):
    """J3 expand_mention_anchors branch (a): corpus anchors + dictionary
    entities whose title is a known mention (link_count 1)."""
    from xlink_ray.stages.expand import expanded_anchors

    return expanded_anchors(*_expand_inputs(sf_dir))


def _q_title_entities(sf_dir: str):
    """J3 branch (b): titles never seen as mentions → title-entity dict."""
    from xlink_ray.stages.expand import title_entities

    return title_entities(*_expand_inputs(sf_dir))


_MANUAL_ANCHOR_ROWS = [("sparkle", "ent_spark"), ("query", "ent_query")]
_MANUAL_LP_ROWS = [
    # (mention, entity_id, link_m, freq_m, link_prob, e_given_m) —
    # the reference link_prob.dat six-column layout (merge_manual_data.py:47-53)
    ("spark", "ent_spark", 999, 999, 0.5, 0.5),
    ("manual", "ent_manual", 1, 1, 1.0, 1.0),
]


def _q_merged_anchors(sf_dir: str):
    """J8 merge_mention_anchors: corpus anchors ∪ manual curation rows."""
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.pipelines import dictbuild
    from xlink_ray.stages.manual import merge_mention_anchors

    orig = dictbuild.mention_anchors(sf_dir)
    manual = rd.from_arrow(
        pa.table(
            {
                "mention": [m for m, _ in _MANUAL_ANCHOR_ROWS],
                "entity_id": [e for _, e in _MANUAL_ANCHOR_ROWS],
            }
        )
    )
    return merge_mention_anchors(orig, manual)


def _q_merged_link_prob(sf_dir: str):
    """J8 merge_link_prob: keyed last-wins overwrite on (mention, entity_id)."""
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.pipelines import dictbuild
    from xlink_ray.stages.manual import merge_link_prob

    orig = dictbuild.prob_tables(sf_dir).link_prob
    manual = rd.from_arrow(
        pa.table(
            {
                "mention": pa.array([r[0] for r in _MANUAL_LP_ROWS], pa.string()),
                "entity_id": pa.array([r[1] for r in _MANUAL_LP_ROWS], pa.string()),
                "link_m": pa.array([r[2] for r in _MANUAL_LP_ROWS], pa.int64()),
                "freq_m": pa.array([r[3] for r in _MANUAL_LP_ROWS], pa.int64()),
                "link_prob": pa.array([r[4] for r in _MANUAL_LP_ROWS], pa.float64()),
                "e_given_m": pa.array([r[5] for r in _MANUAL_LP_ROWS], pa.float64()),
            }
        )
    )
    return merge_link_prob(orig, manual, keys=["mention", "entity_id"])


def _q_aida_eval(sf_dir: str):
    """M15+S12: AIDA fixture import → docs/annotations.json → linking
    eval metrics row (rows-only check; model scoring not SQL-expressible)."""
    import ray.data as rd

    from xlink_ray.pipelines.parity import aida_eval

    return rd.from_arrow(aida_eval(sf_dir))


def _q_ann_ivf(sf_dir: str):
    """IVF inverted-file ANN. SQL-oracled: the quantized spherical
    codebook (ann._qround/_nq) lets the unrolled DuckDB replica
    (_ivf_sql) walk identical cell assignments and ranks."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd

    from xlink_ray.stages.ann import ivf_topk

    q = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = q.sort_by("vec_id").slice(0, 5)
    queries = np.asarray(q["embedding"].to_pylist(), dtype=np.float64)
    return ivf_topk(read_pq(f"{sf_dir}/embeddings.parquet"), queries, k=10)


def _q_ann_pq(sf_dir: str):
    """Product-quantization ANN: train per-subspace codebooks on a
    deterministic sample, encode the corpus to m_sub bytes/vector,
    score queries by ADC lookup-table sums over the compressed codes
    only. The compression path for 10¹²-vector indexes that cannot
    hold raw floats in cluster RAM. SQL-oracled: quantized codebook
    updates (ann._qround) + quantized normalize (ann._nq) let the
    unrolled DuckDB replica (_pq_sql) walk identical codebooks, code
    assignments and ADC ranks."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd

    from xlink_ray.stages.ann import pq_encode, pq_topk, pq_train

    q = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = q.sort_by("vec_id").slice(0, 5)
    queries = np.asarray(q["embedding"].to_pylist(), dtype=np.float64)
    ds = read_pq(f"{sf_dir}/embeddings.parquet")
    cb = pq_train(ds, m_sub=32, n_codes=64)
    return pq_topk(pq_encode(ds, cb), cb, queries, k=10)


def _q_ann_rerank(sf_dir: str):
    """Two-stage compressed search (stages/ann.py:pq_rerank_topk):
    ADC shortlist of 40 candidates over the PQ codes, exact cosine
    re-rank of the shortlist against the raw vectors — the Jégou et al.
    recall-recovery step for indexes whose floats don't fit in RAM."""
    import numpy as np
    import pyarrow.parquet as pq

    from xlink_ray.stages.ann import pq_encode, pq_rerank_topk, pq_train

    q = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = q.sort_by("vec_id").slice(0, 5)
    queries = np.asarray(q["embedding"].to_pylist(), dtype=np.float64)
    ds = read_pq(f"{sf_dir}/embeddings.parquet")
    cb = pq_train(ds, m_sub=32, n_codes=64)
    codes = pq_encode(ds, cb).materialize()  # ADC pass + nothing else
    return pq_rerank_topk(codes, ds, cb, queries, k=10, mult=4)


_URL_TLDS = ["com", "org", "net", "co.uk", "com.au"]
_URL_BLOCKLIST = frozenset({"site0.com", "site3.co.uk"})


def _docs_with_urls(sf_dir: str):
    """documents + a deterministic crawl-shaped url column (scheme,
    subdomain, multi-label public suffixes and path depth all vary with
    doc_id — replicated verbatim in the SQL oracles)."""
    import pyarrow as pa

    def add_urls(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        urls = [
            f"{'http' if i % 4 == 0 else 'https'}://"
            f"{'www.' if i % 3 == 0 else ''}site{i % 7}.{_URL_TLDS[i % 5]}"
            f"/{s}/{'d/' * (i % 3)}{i:08d}.html"
            for i, s in zip(ids, srcs)
        ]
        return t.append_column("url", pa.array(urls, pa.string()))

    return _docs(sf_dir).map_batches(add_urls, batch_format="pyarrow")


def _url_cte() -> str:
    tld_list = ", ".join(f"'{t}'" for t in _URL_TLDS)
    return f"""WITH u AS (
  SELECT doc_id, n_chars,
    (CASE WHEN doc_id % 4 = 0 THEN 'http' ELSE 'https' END) || '://' ||
    (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
    'site' || CAST(doc_id % 7 AS VARCHAR) || '.' ||
    ([{tld_list}])[CAST(doc_id % 5 AS INT) + 1] ||
    '/' || source || '/' || repeat('d/', CAST(doc_id % 3 AS INT)) ||
    printf('%08d', doc_id) || '.html' AS url
  FROM documents),
f AS (
  SELECT doc_id, n_chars, url,
    regexp_extract(url, '^(https?)://', 1) AS scheme,
    regexp_extract(url, '^https?://([^/]+)', 1) AS host,
    regexp_extract(url, '^https?://[^/]+(/.*)$', 1) AS pth
  FROM u),
g AS (
  SELECT doc_id, n_chars, scheme = 'https' AS https, host,
    string_split(host, '.') AS p,
    length(pth) - length(replace(pth, '/', '')) - 1 AS path_depth
  FROM f),
feat AS (
  SELECT doc_id, n_chars, https, host, path_depth,
    CASE WHEN len(p) >= 3
              AND p[len(p)-1] || '.' || p[len(p)] IN ('co.uk','com.au','co.jp','org.uk')
         THEN p[len(p)-2] || '.' || p[len(p)-1] || '.' || p[len(p)]
         ELSE p[len(p)-1] || '.' || p[len(p)] END AS domain,
    CASE WHEN len(p) >= 3
              AND p[len(p)-1] || '.' || p[len(p)] IN ('co.uk','com.au','co.jp','org.uk')
         THEN p[len(p)-1] || '.' || p[len(p)]
         ELSE p[len(p)] END AS tld
  FROM g)"""


def _q_url_features(sf_dir: str):
    """Crawl url parsing: scheme/host/registered-domain/public-suffix/
    path-depth per page (stages/urlstats.py)."""
    from xlink_ray.stages.urlstats import url_features

    return url_features(_docs_with_urls(sf_dir)).select_columns(
        ["doc_id", "https", "host", "domain", "tld", "path_depth"]
    )


def _q_domain_stats(sf_dir: str):
    """Per-registered-domain corpus rollup after a domain-blocklist
    filter: doc count + summed chars (partial agg per batch, one small
    domain shuffle)."""
    from xlink_ray.stages.urlstats import domain_filter, domain_stats

    kept = domain_filter(_docs_with_urls(sf_dir), _URL_BLOCKLIST)
    return domain_stats(kept, weight_col="n_chars")


def _q_dataset_split(sf_dir: str):
    """Deterministic leak-proof train/val/test split: per-(split, lang)
    row counts (stages/curation.py hash_split)."""
    import pyarrow as pa

    from xlink_ray.stages.curation import hash_split

    labeled = hash_split(_docs(sf_dir), {"train": 90, "val": 5, "test": 5})

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["split", "lang"])
            .group_by(["split", "lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["split", "lang", "n"])
        )

    from ray.data.aggregate import Sum

    return (
        labeled.map_batches(partial, batch_format="pyarrow")
        .groupby(["split", "lang"])
        .aggregate(Sum("n", alias_name="n"))
    )


_MIX_TARGETS = {"en": 50, "de": 15, "es": 15, "fr": 10, "zh": 10}


def _mix_plan_cte() -> str:
    vals = ", ".join(f"('{k}', {v})" for k, v in sorted(_MIX_TARGETS.items()))
    return f"""w AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS weight FROM documents GROUP BY lang),
tgt(lang, share) AS (VALUES {vals}),
tm AS (SELECT min(w.weight * 100 // t.share) AS t_max FROM w JOIN tgt t USING (lang)),
plan AS (
  SELECT w.lang, w.weight,
         ((t.share * tm.t_max // 100) * 1000000) // w.weight AS rate_ppm
  FROM w JOIN tgt t USING (lang), tm)"""


def _q_mixture_plan(sf_dir: str):
    """Training-mix planning: per-language keep rates hitting the
    largest feasible corpus at the target shares, integer-exact
    (stages/curation.py mixture_plan)."""
    from xlink_ray.stages.curation import mixture_plan

    return mixture_plan(_docs(sf_dir), _MIX_TARGETS)


def _q_mixture_corpus(sf_dir: str):
    """Apply the mixture plan: deterministic per-language hash sample
    at the planned ppm rates."""
    from xlink_ray.stages.curation import mixture_sample

    return mixture_sample(_docs(sf_dir), _MIX_TARGETS).select_columns(
        ["doc_id", "lang"]
    )


def _q_pair_features(sf_dir: str):
    """ER pair feature vectors (classifier input): for every SNM
    candidate pair, exact Levenshtein, Jaro-Winkler (basis points) and
    absolute length difference — all pair-axis vectorized on the pair
    rows, no extra join."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.functions.similarity import jaro_winkler_pairs, levenshtein_pairs
    from xlink_ray.pipelines.er import _customers
    from xlink_ray.stages.snm import sorted_neighborhood_pairs

    pairs = sorted_neighborhood_pairs(
        _customers(sf_dir), key_col="c_name", id_col="c_custkey", window=5
    )

    def feats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"id_a": z, "id_b": z, "lev": z, "jw_bp": z, "len_diff": z})
        ka = np.asarray(t["key_a"].to_pylist(), dtype=object)
        kb = np.asarray(t["key_b"].to_pylist(), dtype=object)
        lev = levenshtein_pairs(ka, kb, max_dist=64).astype(np.int64)
        jw = np.floor(jaro_winkler_pairs(ka, kb) * 10000.0).astype(np.int64)
        ld = np.abs(
            np.asarray([len(x) for x in ka], dtype=np.int64)
            - np.asarray([len(x) for x in kb], dtype=np.int64)
        )
        return pa.table(
            {
                "id_a": t["id_a"],
                "id_b": t["id_b"],
                "lev": pa.array(lev),
                "jw_bp": pa.array(jw),
                "len_diff": pa.array(ld),
            }
        )

    return pairs.map_batches(feats, batch_format="pyarrow")


def _q_doc_keywords(sf_dir: str):
    """Top-5 TF-IDF keywords per document; integer-quantized idf makes
    the (score, token) ranking deterministic (stages/bm25.py
    tfidf_keywords)."""
    from xlink_ray.stages.bm25 import tfidf_keywords

    return tfidf_keywords(_docs(sf_dir), k=5)


def _q_bigram_lm(sf_dir: str):
    """Bigram stupid-backoff LM scoring against a held-out model: the
    model is counted from EVEN doc_ids only (so odd docs exercise the
    backoff), unigrams broadcast, bigram counts joined reduce-side
    (stages/ngram_lm.py)."""
    import pyarrow.compute as pc

    from xlink_ray.stages.ngram_lm import bigram_lm_scores

    return bigram_lm_scores(
        _docs(sf_dir),
        model_filter=lambda t: pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0),
    )


def _q_paragraph_dedup(sf_dir: str):
    """Cross-document exact paragraph dedup (the RefinedWeb step):
    explode docs into 12-word paragraphs, keep only the FIRST global
    occurrence of each distinct paragraph (min doc, then min position;
    md5 hash as the shuffle key), reassemble the survivors per doc.
    Pure composition: paragraphs.explode/reassemble + the min-variant
    per-key argmax."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.functions.hashing import md5_low64
    from xlink_ray.stages.paragraphs import explode_paragraphs, reassemble_docs
    from xlink_ray.stages.stats import latest_per_key

    paras = explode_paragraphs(_docs(sf_dir), fixed_width=12)

    def add_key(t: pa.Table) -> pa.Table:
        h = (md5_low64(t["para"].to_pylist()) >> np.uint64(1)).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pidx = t["pidx"].to_numpy(zero_copy_only=False)
        if (pidx >= 1 << 20).any():
            raise ValueError("pidx exceeds the packed-order budget")
        packed = ids * (1 << 20) + pidx
        return t.append_column("h", pa.array(h)).append_column(
            "ord", pa.array(packed.astype(np.int64))
        )

    keyed = paras.map_batches(add_key, batch_format="pyarrow")
    first = latest_per_key(keyed, key_col="h", order_col="ord", tie_col="ord", keep="min")
    return reassemble_docs(
        first.select_columns(["doc_id", "pidx", "para"]), sep="\n"
    )


def _q_latest_events(sf_dir: str):
    """Per-key argmax dedup (crawl-recency shape): each user's latest
    event by (ts, event_id) — per-batch trim before the one key
    shuffle (stages/stats.py latest_per_key)."""
    import ray.data as rd

    from xlink_ray.stages.stats import latest_per_key

    ev = read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return latest_per_key(
        ev, key_col="user_id", order_col="ts", tie_col="event_id"
    ).select_columns(["user_id", "event_id"])


def _q_event_props(sf_dir: str):
    """JSON property extraction + rollup: parse props.k per event,
    aggregate count and sum per event type."""
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.stats import json_field

    ev = read_pq(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    withk = json_field(ev, "props", "k", dtype=pa.int64())

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["event_type", "k"])
            .group_by("event_type")
            .aggregate([("k", "count"), ("k", "sum")])
            .rename_columns(["event_type", "n", "sum_k"])
        )

    from ray.data.aggregate import Sum

    return (
        withk.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"))
    )


def _q_er_threshold_sweep(sf_dir: str):
    """ER operating-point evaluation: precision/recall (ppm) of the
    Jaro-Winkler matcher at five thresholds, gold = the Levenshtein≤1
    rule, over the nation-blocked candidate pairs. One scorer pass
    computes both signals (encoded), pr_threshold_sweep folds
    threshold-sized partials (stages/evaluation.py)."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.functions.similarity import jaro_winkler_pairs, levenshtein_pairs
    from xlink_ray.pipelines.er import _customers
    from xlink_ray.stages.blocking import block_score_pairs
    from xlink_ray.stages.evaluation import pr_threshold_sweep

    def scorer(A, B):
        jw = np.floor(jaro_winkler_pairs(A, B) * 10000.0).astype(np.int64)
        gold = (levenshtein_pairs(A, B, max_dist=1) <= 1).astype(np.int64)
        return jw * 2 + gold

    edges = block_score_pairs(
        _customers(sf_dir),
        key_cols="c_nationkey",
        id_col="c_custkey",
        attr_col="c_name",
        scorer=scorer,
        keep=lambda s: (s % 2 == 1) | (s >= 9000 * 2),
        skew_cap=8192,
    )

    def decode(t: pa.Table) -> pa.Table:
        s = t["score"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"score": pa.array(s // 2), "gold": pa.array((s % 2).astype(bool))}
        )

    labeled = edges.map_batches(decode, batch_format="pyarrow")
    return pr_threshold_sweep(labeled, [9000, 9200, 9400, 9600, 9800])


def _q_embedding_znorm(sf_dir: str):
    """Per-dimension standardization (one 3×d-partial pass + broadcast
    transform): L2 norm of each z-scored vector
    (stages/projection.py)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.projection import dim_moments, standardize

    ds = read_pq(f"{sf_dir}/embeddings.parquet").materialize()
    mean, std, _ = dim_moments(ds)
    z = standardize(ds, mean, std)

    def norm(t: pa.Table) -> pa.Table:
        m = np.asarray(t["zvec"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "znorm": pa.array(np.sqrt((m * m).sum(axis=1)), pa.float64()),
            }
        )

    return z.map_batches(norm, batch_format="pyarrow")


def _q_pca_variance(sf_dir: str):
    """Distributed exact PCA (d×d Gram partials, driver eigh): top-8
    explained variance + ratio (not SQL-expressible — rows-only; the
    numpy-reference equality lives in tests/test_projection.py)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.projection import pca_fit

    _, evar, _ = pca_fit(
        read_pq(f"{sf_dir}/embeddings.parquet"), n_components=8
    )
    total = evar.sum()
    return pa.table(
        {
            "component": pa.array(np.arange(len(evar), dtype=np.int64)),
            "explained_var": pa.array(np.round(evar, 9), pa.float64()),
            "ratio": pa.array(np.round(evar / total, 9), pa.float64()),
        }
    )


def _q_pca_invariants(sf_dir: str):
    """SQL-checkable companion for the rows-only pca_variance (the
    er_constrained_invariants pattern): (1) the FULL eigenvalue sum of
    the population covariance equals its trace — which SQL recomputes
    independently as the sum of per-dimension population variances;
    (2) the component matrix is orthonormal (violation count 0, an
    eigh property SQL asserts as a literal); (3) the top-8 explained
    ratio is ≤ 1. The eigen-decomposition itself stays rows-only."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from xlink_ray.stages.projection import pca_fit

    dim = len(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .slice(0, 1)["embedding"]
        .to_pylist()[0]
    )
    comps, evar, _ = pca_fit(
        read_pq(f"{sf_dir}/embeddings.parquet"), n_components=dim
    )
    eig_sum = float(evar.sum())
    resid = np.abs(comps @ comps.T - np.eye(dim))
    n_viol = int((resid > 1e-8).sum())
    ratio8 = float(evar[:8].sum() / evar.sum())
    return pd.DataFrame(
        {
            "metric": ["eig_sum", "orthonormal_viol", "top8_ratio_le_1"],
            "value": [eig_sum, float(n_viol), float(1.0 if ratio8 <= 1.0 else 0.0)],
        }
    )


def _pca_invariants_sql() -> str:
    return """
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
u AS (SELECT t.j, v[t.j] AS x FROM e, unnest(range(1, len(v)+1)) AS t(j)),
dv AS (SELECT j, avg(x*x) - avg(x)*avg(x) AS vp FROM u GROUP BY j)
SELECT 'eig_sum' AS metric, sum(vp) AS value FROM dv
UNION ALL SELECT 'orthonormal_viol', 0.0
UNION ALL SELECT 'top8_ratio_le_1', 1.0"""


def _q_fidelity_invariants(sf_dir: str):
    """SQL-checkable companion for the rows-only fidelity_links (the
    er_constrained_invariants pattern): the reference-parity linker's
    ACCEPTED OCCURRENCE SET matches the links CTE chain — per-doc link
    counts plus offset and mention-length aggregates, replicated in SQL
    over the links-family chain. Entity choice / believe (the P7/P9
    variant semantics with embedding scoring) stay rows-only."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    from xlink_ray.pipelines import parity

    def pre(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "off": pc.cast(t["start"], pa.int64()),
                "len": pc.cast(pc.subtract(t["end"], t["start"]), pa.int64()),
            }
        )

    return (
        parity.fidelity_links(sf_dir)
        .map_batches(pre, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Count(alias_name="n_links"),
            Min("off", alias_name="min_off"),
            Max("off", alias_name="max_off"),
            Sum("off", alias_name="sum_off"),
            Sum("len", alias_name="sum_len"),
        )
    )


def _q_joint_invariants(sf_dir: str):
    """SQL-checkable companion for the rows-only joint_norms (the
    er_constrained_invariants pattern): the trained-vector table's
    vocabulary composition is replicated in SQL — word rows = corpus
    tokens with count ≥ min_count over the doc_id-ordered 512-doc smoke
    cap; entity rows = distinct page heads + out-linked entities of the
    (src-ordered, 512-capped) train_kg lines — and every trained vector
    moved off zero (nonpositive-norm count asserted 0). The SGD values
    themselves stay rows-only."""
    import pandas as pd

    from xlink_ray.pipelines.embedding import joint_embedding_norms

    t = joint_embedding_norms(sf_dir).to_pandas()
    return pd.DataFrame(
        {
            "metric": ["word_vocab_size", "ent_vocab_size", "nonpos_norm_count"],
            "value": [
                int((t["kind"] == "word").sum()),
                int((t["kind"] == "entity").sum()),
                int((~(t["norm"] > 0)).sum()),
            ],
        }
    )


def _joint_invariants_sql() -> str:
    return f"""
WITH {_alias_values_sql()},
d AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 512),
tok AS (SELECT unnest(string_split(lower(text), ' ')) AS t FROM d),
wc AS (SELECT t, count(*) AS n FROM tok WHERE t <> '' GROUP BY t),
occ AS (
  SELECT d2.doc_id, d2.source, a.entity_id,
         CAST((length(d2.text) - length(replace(d2.text, a.mention, ''))) / length(a.mention) AS BIGINT) AS cnt
  FROM documents d2 JOIN alias a ON (d2.doc_id % a.n_slots) = a.slot),
ol AS (SELECT DISTINCT 'https://crawl.example.org/' || source || '/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS src,
              entity_id AS dst
       FROM occ WHERE cnt > 0),
lines AS (SELECT src, list(DISTINCT dst) AS ds FROM ol GROUP BY src ORDER BY src LIMIT 512),
ents AS (SELECT src AS e FROM lines UNION SELECT unnest(ds) FROM lines)
SELECT 'word_vocab_size' AS metric,
       CAST((SELECT count(*) FROM wc WHERE n >= 2) AS BIGINT) AS value
UNION ALL SELECT 'ent_vocab_size', CAST((SELECT count(*) FROM ents) AS BIGINT)
UNION ALL SELECT 'nonpos_norm_count', 0"""


def _linking_eval_sql() -> str:
    """Full DuckDB replica of linking_eval over the flagship chain:
    pred = the links ``kept`` CTE; gold = every alias-token occurrence
    with the slot-rule entity (docnum % n_slots = slot — the synth
    markup's assignment, same join the mention_anchors oracle uses).
    Metrics row matches stages/evaluation.linking_eval exactly."""
    return (
        f"WITH {_alias_values_sql()},\n{_mat(_flagship_parts())},\n"
        "gold AS (SELECT DISTINCT t.did AS doc_id, t.off, t.tok AS mention, a.entity_id\n"
        "         FROM tpos t JOIN alias a\n"
        "           ON t.tok = a.mention AND (t.docnum % a.n_slots) = a.slot),\n"
        "pred AS (SELECT DISTINCT doc_id, off, mention, entity_id FROM kept),\n"
        "c AS (SELECT\n"
        "  (SELECT count(*) FROM (SELECT DISTINCT doc_id, off, mention FROM gold)) AS n_gold,\n"
        "  (SELECT count(*) FROM (SELECT DISTINCT doc_id, off, mention FROM pred)) AS n_pred,\n"
        "  (SELECT count(*) FROM (SELECT DISTINCT p.doc_id, p.off, p.mention FROM pred p\n"
        "     JOIN gold g ON g.doc_id = p.doc_id AND g.off = p.off AND g.mention = p.mention)) AS n_span_match,\n"
        "  (SELECT count(*) FROM (SELECT DISTINCT p.doc_id, p.off, p.mention FROM pred p\n"
        "     JOIN gold g ON g.doc_id = p.doc_id AND g.off = p.off AND g.mention = p.mention\n"
        "        AND g.entity_id = p.entity_id)) AS n_entity_match)\n"
        "SELECT CAST(n_gold AS BIGINT) AS n_gold, CAST(n_pred AS BIGINT) AS n_pred,\n"
        "       CAST(n_span_match AS BIGINT) AS n_span_match,\n"
        "       CAST(n_entity_match AS BIGINT) AS n_entity_match,\n"
        "       CASE WHEN n_pred > 0 THEN n_span_match / CAST(n_pred AS DOUBLE) ELSE 0.0 END AS \"precision\",\n"
        "       CASE WHEN n_gold > 0 THEN n_span_match / CAST(n_gold AS DOUBLE) ELSE 0.0 END AS recall,\n"
        "       CASE WHEN n_pred > 0 AND n_gold > 0 AND n_span_match > 0 THEN\n"
        "         2.0 * (n_span_match / CAST(n_pred AS DOUBLE)) * (n_span_match / CAST(n_gold AS DOUBLE))\n"
        "           / (n_span_match / CAST(n_pred AS DOUBLE) + n_span_match / CAST(n_gold AS DOUBLE))\n"
        "         ELSE 0.0 END AS f1,\n"
        "       CASE WHEN n_span_match > 0 THEN n_entity_match / CAST(n_span_match AS DOUBLE) ELSE 0.0 END AS ed_accuracy\n"
        "FROM c"
    )


def _fidelity_invariants_sql() -> str:
    return (
        f"WITH {_alias_values_sql()},\n{_mat(_flagship_parts())}\n"
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_links,\n"
        "       CAST(min(off) AS BIGINT) AS min_off,\n"
        "       CAST(max(off) AS BIGINT) AS max_off,\n"
        "       CAST(sum(off) AS BIGINT) AS sum_off,\n"
        "       CAST(sum(length(mention)) AS BIGINT) AS sum_len\n"
        "FROM kept GROUP BY doc_id"
    )


def _fs_em_sql(n_iter: int = 4, final: str = "weights") -> str:
    """CTE chain replaying fs_em_weights' quantized EM fit
    (xlink_ray/stages/fs.py): agreement-pattern contingency + n_iter
    unrolled E/M rounds. Exactness: responsibilities and parameters are
    quantized half-up onto the int64 1e-9 grid each round, weighted sums
    are HUGEINT (python-int driver-side) so accumulation order can never
    drift, and the E-step product is written left-associated in the same
    field order as the python kernel."""
    fields = ["seg", "bal", "last1"]
    e9 = "1000000000"

    def eprod(pref: str, par: str) -> str:
        terms = [f"({pref}/1e9)"]
        for f in fields:
            terms.append(
                f"(CASE WHEN a_{f}=1 THEN {par}_{f}/1e9"
                f" ELSE ({e9}-{par}_{f})/1e9 END)"
            )
        return " * ".join(terms)

    parts = [
        f"""c AS (SELECT c_custkey AS id, c_nationkey AS k, c_mktsegment AS seg,
  CAST(floor(c_acctbal/1000) AS BIGINT) AS bal, right(c_name,1) AS last1 FROM customer),
p AS (SELECT a.id AS ia, b.id AS ib,
  CASE WHEN a.seg=b.seg THEN 1 ELSE 0 END AS a_seg,
  CASE WHEN a.bal=b.bal THEN 1 ELSE 0 END AS a_bal,
  CASE WHEN a.last1=b.last1 THEN 1 ELSE 0 END AS a_last1
 FROM c a JOIN c b ON a.k=b.k AND a.id<b.id),
pat AS (SELECT a_seg, a_bal, a_last1, count(*) AS n FROM p GROUP BY 1,2,3),
it0 AS (SELECT CAST(500000000 AS BIGINT) AS lam,
  {', '.join(f'CAST(900000000 AS BIGINT) AS m_{f}' for f in fields)},
  {', '.join(f'CAST(100000000 AS BIGINT) AS u_{f}' for f in fields)})"""
    ]
    for i in range(1, n_iter + 1):
        mu = []
        for f in fields:
            mu.append(
                f"CAST(floor((CAST(sum(CAST(n AS HUGEINT)*pe*a_{f}) AS DOUBLE)+500000000.0)"
                f"/(CAST(sum(CAST(n AS HUGEINT)*pe) AS DOUBLE)+1000000000.0)*1e9+0.5) AS BIGINT) AS m_{f}"
            )
            mu.append(
                f"CAST(floor((CAST(sum(CAST(n AS HUGEINT)*({e9}-pe)*a_{f}) AS DOUBLE)+500000000.0)"
                f"/(CAST(sum(CAST(n AS HUGEINT)*({e9}-pe)) AS DOUBLE)+1000000000.0)*1e9+0.5) AS BIGINT) AS u_{f}"
            )
        parts.append(
            f"""e{i} AS (SELECT pat.*, {eprod('lam', 'm')} AS num,
  {eprod(f'({e9}-lam)', 'u')} AS den FROM pat CROSS JOIN it{i - 1}),
q{i} AS (SELECT a_seg, a_bal, a_last1, n,
  CAST(floor(num/(num+den)*1e9+0.5) AS BIGINT) AS pe FROM e{i}),
it{i} AS (SELECT
  CAST(floor((CAST(sum(CAST(n AS HUGEINT)*pe) AS DOUBLE)+500000000.0)/(CAST(sum(n) AS DOUBLE)+1.0)+0.5) AS BIGINT) AS lam,
  {', '.join(mu)}
 FROM q{i})"""
        )
    cte = "WITH " + ",\n".join(parts)
    if final == "weights":
        rows = []
        for f in fields:
            rows.append(
                f"SELECT '{f}' AS field, lam AS lam_e9, m_{f} AS m_e9, u_{f} AS u_e9,"
                f" log2(m_{f}/u_{f}) AS w_agree,"
                f" log2(({e9}-m_{f})/({e9}-u_{f})) AS w_disagree FROM it{n_iter}"
            )
        return cte + "\n" + "\nUNION ALL ".join(rows)
    post = f""",
ef AS (SELECT p.ia, p.ib, {eprod('lam', 'm')} AS num,
  {eprod(f'({e9}-lam)', 'u')} AS den FROM p CROSS JOIN it{n_iter}),
posts AS (SELECT ia, ib,
  CAST(floor(num/(num+den)*1e9+0.5) AS BIGINT) AS p_e9 FROM ef)"""
    if final == "posteriors":
        return cte + post + "\nSELECT ia AS id_a, ib AS id_b, p_e9 FROM posts"
    # final == "clusters": closure over posterior-threshold pairs; the
    # WITH must be RECURSIVE for the reach CTE
    return (
        "WITH RECURSIVE "
        + (cte + post)[len("WITH ") :]
        + """,
sym AS (SELECT ia AS u, ib AS v FROM posts WHERE p_e9 >= 100000000
        UNION SELECT ib, ia FROM posts WHERE p_e9 >= 100000000),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
SELECT u AS member_id, CAST(min(v) AS BIGINT) AS cluster_id
FROM reach GROUP BY u"""
    )


def _unigram_sql(final: str = "vocab", L: int = 4, S: int = 60, T: int = 3,
                 V: int = 48, P: int = 12) -> str:
    """DuckDB replica of stages/unigram.py: substring seeding, T
    unrolled Viterbi hard-EM rounds (DP + backtrack over ≤P positions,
    exact integer scores on the 1e-9 logp grid, ties -> smallest last
    piece = row_number ORDER BY score DESC, j), char-floored M-steps,
    final prune + renormalize. final='vocab' -> (piece, n, logp_e9);
    final='tokens' -> per-doc (doc_id, n_words, n_tokens)."""

    def logp_cte(name, src):
        return (f"{name} AS (SELECT piece, CAST(floor(ln(CAST(c AS DOUBLE)"
                f"/(SELECT CAST(sum(c) AS DOUBLE) FROM {src}))*1e9+0.5) AS BIGINT) AS lp FROM {src})")

    parts = [
        "wr AS (SELECT unnest(string_split(text,' ')) AS word FROM documents)",
        "w AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM wr WHERE word <> '' GROUP BY word)",
        f"pos AS (SELECT generate_series AS i FROM generate_series(1, {P}))",
        f"lns AS (SELECT generate_series AS j FROM generate_series(1, {L}))",
        """sub AS (SELECT substr(w.word, pos.i, lns.j) AS piece, CAST(sum(w.n) AS BIGINT) AS c
  FROM w, pos, lns WHERE pos.i + lns.j - 1 <= length(w.word) GROUP BY 1)""",
        "chars AS (SELECT DISTINCT substr(word, pos.i, 1) AS piece FROM w, pos WHERE pos.i <= length(word))",
        f"seedrank AS (SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rn FROM sub)",
        f"""c0 AS (SELECT piece, c FROM seedrank WHERE rn <= {S}
  UNION SELECT s.piece, s.c FROM seedrank s JOIN chars ch ON ch.piece = s.piece)""",
        logp_cte("v0", "c0"),
    ]

    def em_round(t, vocab, out_counts):
        ps = [f"dp{t}_0 AS (SELECT word, CAST(0 AS BIGINT) AS score, 0 AS j FROM w)"]
        for p in range(1, P + 1):
            branches = []
            for j in range(1, min(L, p) + 1):
                branches.append(
                    f"SELECT d.word, d.score + v.lp AS score, {j} AS j "
                    f"FROM dp{t}_{p-j} d JOIN {vocab} v ON v.piece = substr(d.word, {p-j+1}, {j}) "
                    f"WHERE length(d.word) >= {p}"
                )
            ps.append(
                f"""dp{t}_{p} AS (SELECT word, score, j FROM (
  SELECT word, score, j, row_number() OVER (PARTITION BY word ORDER BY score DESC, j) AS rn
  FROM ({chr(10).join('  UNION ALL '.join(branches).splitlines())})) WHERE rn = 1)"""
            )
        ps.append(
            f"dpall{t} AS ({' UNION ALL '.join(f'SELECT {p} AS p, word, score, j FROM dp{t}_{p}' for p in range(1, P + 1))})"
        )
        ps.append(f"bt{t}_0 AS (SELECT word, length(word) AS pos FROM w)")
        for k in range(1, P + 1):
            ps.append(
                f"""bt{t}_{k} AS (SELECT b.word, b.pos - d.j AS pos,
  substr(b.word, b.pos - d.j + 1, d.j) AS piece
  FROM bt{t}_{k-1} b JOIN dpall{t} d ON d.word = b.word AND d.p = b.pos
  WHERE b.pos > 0)"""
            )
        ps.append(
            f"segs{t} AS ({' UNION ALL '.join(f'SELECT word, piece FROM bt{t}_{k}' for k in range(1, P + 1))})"
        )
        ps.append(
            f"cnt{t} AS (SELECT s.piece, CAST(sum(w.n) AS BIGINT) AS c FROM segs{t} s JOIN w USING (word) GROUP BY s.piece)"
        )
        ps.append(
            f"""{out_counts} AS (SELECT piece, c FROM cnt{t} WHERE c > 0
  UNION ALL SELECT ch.piece, CAST(1 AS BIGINT) FROM chars ch
  WHERE NOT EXISTS (SELECT 1 FROM cnt{t} c2 WHERE c2.piece = ch.piece AND c2.c > 0))"""
        )
        return ps

    for t in range(T):
        parts += em_round(t, f"v{t}", f"c{t+1}")
        if t + 1 < T:
            parts.append(logp_cte(f"v{t+1}", f"c{t+1}"))

    parts.append(
        f"prune AS (SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rn FROM c{T})"
    )
    parts.append(
        f"""fin AS (SELECT piece, c FROM prune WHERE rn <= {V}
  UNION SELECT p.piece, p.c FROM prune p JOIN chars ch ON ch.piece = p.piece)"""
    )
    parts.append(logp_cte("vf", "fin"))

    if final == "vocab":
        tail = """
SELECT f.piece, f.c AS n, v.lp AS logp_e9
FROM fin f JOIN vf v USING (piece)"""
    else:
        parts += em_round(T, "vf", "cEnc_unused")
        parts.append(
            f"npw AS (SELECT word, CAST(count(*) AS BIGINT) AS np FROM segs{T} GROUP BY word)"
        )
        parts.append(
            "dw AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents)"
        )
        parts.append(
            "docw AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_words FROM documents)"
        )
        parts.append(
            """tok AS (SELECT dw.doc_id, CAST(sum(npw.np) AS BIGINT) AS tokc
  FROM dw JOIN npw USING (word) GROUP BY dw.doc_id)"""
        )
        if final == "fertility":
            tail = """
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(len(string_split(d.text,' '))) AS BIGINT) AS n_words,
  CAST(sum(coalesce(t.tokc, 0)) AS BIGINT) AS n_tokens,
  CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
  CAST(1000*sum(coalesce(t.tokc, 0)) // sum(length(d.text)) AS BIGINT) AS tokens_per_1k_chars
FROM documents d LEFT JOIN tok t USING (doc_id) GROUP BY d.lang"""
        else:
            tail = """
SELECT d.doc_id, d.n_words, CAST(coalesce(t.tokc, 0) AS BIGINT) AS n_tokens
FROM docw d LEFT JOIN tok t USING (doc_id)"""
    return (
        "WITH "
        + ",\n".join(p.replace(" AS (", " AS MATERIALIZED (", 1) for p in parts)
        + tail
    )


def _q_unigram_vocab(sf_dir: str):
    """Unigram-LM tokenizer training (Kudo 2018 / SentencePiece,
    deterministic Viterbi hard-EM; stages/unigram.py): substring
    seeding over the word vocabulary, 3 EM rounds with exact integer
    DP scores on the 1e-9 logp grid, char-floored M-steps, prune +
    renormalize. The corpus is read once; EM is vocab-sized."""
    from xlink_ray.stages.unigram import unigram_train

    return unigram_train(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_unigram_tokens(sf_dir: str):
    """Per-doc Viterbi token counts under the trained unigram
    vocabulary (stages/unigram.py:unigram_encode_counts — one corpus
    pass, per-batch distinct-word memoization)."""
    from xlink_ray.stages.unigram import unigram_encode_counts, unigram_train

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return unigram_encode_counts(docs, unigram_train(docs))


def _q_unigram_fertility(sf_dir: str):
    """Unigram-tokenizer fertility per language
    (stages/unigram.py:unigram_fertility_by_lang): the encode pass
    carries lang/chars, ≤nlangs-row rollup, exact integer fertility."""
    from xlink_ray.stages.unigram import unigram_fertility_by_lang, unigram_train

    docs = _docs(sf_dir)
    return unigram_fertility_by_lang(
        docs.select_columns(["doc_id", "text", "lang"]),
        unigram_train(docs.select_columns(["doc_id", "text"])),
    )


def _q_part_soundex(sf_dir: str):
    """Phonetic blocking keys: simplified Soundex per part name
    (functions/text.py soundex — amortized over unique values)."""
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.functions.text import soundex_keys

    parts = read_pq(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"p_partkey": t["p_partkey"], "sdx": soundex_keys(t["p_name"])}
        )

    return parts.map_batches(fn, batch_format="pyarrow")


def _soundex_sql(col: str) -> str:
    """DuckDB replica of functions/text.soundex (RE2 has no
    backreferences, so adjacent-run collapse is 5 rounds of pairwise
    replaces — enough for runs up to 32)."""
    expr = "s"
    for _ in range(5):
        for d in "0123456":
            expr = f"replace({expr}, '{d}{d}', '{d}')"
    return f"""WITH uu AS (
  SELECT p_partkey, upper(regexp_replace({col}, '[^A-Za-z]', '', 'g')) AS u FROM part),
m AS (
  SELECT p_partkey, u,
         translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '01230120022455012623010202') AS s
  FROM uu),
c AS (SELECT p_partkey, u, {expr} AS s2 FROM m)
SELECT p_partkey,
       CASE WHEN length(u) = 0 THEN ''
            ELSE substr(u, 1, 1) || substr(replace(substr(s2, 2), '0', '') || '000', 1, 3)
       END AS sdx
FROM c"""


def _q_part_codes(sf_dir: str):
    """Dictionary-encoding: dense value-ordered int codes for p_name
    (stages/stats.py categorify — distinct-only shuffle, broadcast
    vocab, streaming index_in attach)."""
    import ray.data as rd

    from xlink_ray.stages.stats import categorify

    parts = read_pq(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    return categorify(parts, "p_name").select_columns(["p_partkey", "p_name_code"])


def _q_part_fuzzy_pairs(sf_dir: str):
    """Token-sort fuzzy matching (the fuzzywuzzy token_sort_ratio
    shape): block parts on brand, compare Levenshtein over the
    token-SORTED names so word order can't hide a match."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from xlink_ray.functions.similarity import levenshtein_pairs
    from xlink_ray.stages.blocking import block_score_pairs

    parts = read_pq(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_brand"]
    )

    def add_sorted(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["p_name"], " ")
        skey = [" ".join(sorted(ws)) for ws in toks.to_pylist()]
        return t.append_column("skey", pa.array(skey, pa.string()))

    edges = block_score_pairs(
        parts.map_batches(add_sorted, batch_format="pyarrow"),
        key_cols="p_brand",
        id_col="p_partkey",
        attr_col="skey",
        scorer=lambda A, B: levenshtein_pairs(A, B, max_dist=3),
        keep=lambda s: s <= 3,
        skew_cap=8192,
    )

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "dist": pc.cast(t["score"], pa.int64()),
            }
        )

    return edges.map_batches(fmt, batch_format="pyarrow")


def _q_part_pprl_pairs(sf_dir: str):
    """Privacy-preserving record linkage (stages/pprl.py — Schnell et
    al. CLK Bloom encodings + Dice scoring): the blocking exchange
    carries only 64-bit encodings and popcounts, never the names;
    dice_bp = 2·|A∧B|·10⁴ // (|A|+|B|), exact integers end to end."""
    from xlink_ray.stages.pprl import pprl_pairs

    return pprl_pairs(
        read_pq(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_brand"]
        ),
        key_cols="p_brand",
        id_col="p_partkey",
        attr_col="p_name",
        min_dice_bp=6500,
    )


def _q_part_monge_pairs(sf_dir: str):
    """Symmetric Monge–Elkan fuzzy matching over multi-token part
    names (functions/similarity.py:monge_elkan_jw_bp): block on brand,
    per-token best Jaro-Winkler both directions, directional means
    averaged; integer basis points end-to-end."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from xlink_ray.functions.similarity import monge_elkan_jw_bp
    from xlink_ray.stages.blocking import block_score_pairs

    parts = read_pq(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_brand"]
    )
    edges = block_score_pairs(
        parts,
        key_cols="p_brand",
        id_col="p_partkey",
        attr_col="p_name",
        scorer=monge_elkan_jw_bp,
        keep=lambda s: s >= 8600,
        skew_cap=8192,
    )

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "me_bp": pc.cast(t["score"], pa.int64()),
            }
        )

    return edges.map_batches(fmt, batch_format="pyarrow")


def _q_part_tfidf_pairs(sf_dir: str, min_cos_e6: int = 600000):
    """TF-IDF-weighted cosine soft matching over part-name tokens
    (stages/bm25.py:tfidf_cosine_pairs — the WHIRL scorer): one
    distinct-token exchange builds the integer idf table (broadcast
    under the shared dict guard, read via cached_state), then the
    brand-blocked pair grids score with exact int64 dot products."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from xlink_ray.stages.bm25 import tfidf_cosine_pairs
    from xlink_ray.stages.blocking import block_score_pairs
    from xlink_ray.util import guard_dict_bytes

    parts = read_pq(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_brand"]
    )
    n_docs = parts.count()

    def tok_rows(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["p_name"], " ")
        flat = pc.list_flatten(toks)
        seg = np.repeat(
            np.arange(t.num_rows, dtype=np.int64),
            pc.list_value_length(toks).to_numpy(zero_copy_only=False),
        )
        arr = np.asarray(flat.to_pandas(), dtype=object)
        o = np.lexsort((arr, seg))
        keep = np.ones(len(o), dtype=bool)
        if len(o) > 1:
            keep[1:] = (seg[o][1:] != seg[o][:-1]) | (arr[o][1:] != arr[o][:-1])
        return pa.table({"t": pa.array(arr[o][keep], pa.string())})

    from ray.data.aggregate import Count

    df_tbl = (
        parts.map_batches(tok_rows, batch_format="pyarrow")
        .groupby("t")
        .aggregate(Count(alias_name="df"))
        .to_pandas()
    )
    idf = {
        t: int(np.floor(np.log(float(n_docs) / d) * 1e6 + 0.5))
        for t, d in zip(df_tbl["t"], df_tbl["df"])
    }
    guard_dict_bytes(sum(len(k) + 24 for k in idf) + 48 * len(idf), "part idf table")
    idf_ref = ray.put(idf)

    def scorer(A, B):
        from xlink_ray.state.cached import cached_state

        m = cached_state(("tfidf_idf", idf_ref.hex()), lambda: ray.get(idf_ref))
        return tfidf_cosine_pairs(A, B, m)

    edges = block_score_pairs(
        parts,
        key_cols="p_brand",
        id_col="p_partkey",
        attr_col="p_name",
        scorer=scorer,
        keep=lambda s: np.floor(s * 1e6 + 0.5) >= min_cos_e6,
        skew_cap=8192,
    )

    def fmt(t: pa.Table) -> pa.Table:
        s = t["score"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "cos_e6": pa.array(np.floor(s * 1e6 + 0.5).astype(np.int64)),
            }
        )

    return edges.map_batches(fmt, batch_format="pyarrow")


def _q_er_pairs_snm(sf_dir: str):
    """Sorted-Neighborhood blocking (the classic SNM alternative to
    key-equality blocking): candidates = name-adjacent customers within
    a 5-row window of the global (name, id) order, scored with exact
    Levenshtein on the pair rows (stages/snm.py)."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.functions.similarity import levenshtein_pairs
    from xlink_ray.pipelines.er import _customers
    from xlink_ray.stages.snm import sorted_neighborhood_pairs

    pairs = sorted_neighborhood_pairs(
        _customers(sf_dir), key_col="c_name", id_col="c_custkey", window=5
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "dist": pa.array([], pa.int64())}
            )
        ka = np.asarray(t["key_a"].to_pylist(), dtype=object)
        kb = np.asarray(t["key_b"].to_pylist(), dtype=object)
        d = levenshtein_pairs(ka, kb, max_dist=64)
        return pa.table(
            {
                "id_a": t["id_a"],
                "id_b": t["id_b"],
                "dist": pa.array(d.astype(np.int64)),
            }
        )

    return pairs.map_batches(score, batch_format="pyarrow")


def _q_length_band_docs(sf_dir: str):
    """Per-language interquartile length band: keep documents whose
    n_chars sits inside the lang's [p25, p75] (winsorizing outlier
    filter; band table is group-cardinality-sized and broadcast)."""
    from xlink_ray.stages.stats import quantile_band_filter

    return quantile_band_filter(
        _docs(sf_dir), group_col="lang", val_col="n_chars"
    ).select_columns(["doc_id", "lang", "n_chars"])


def _q_clean_paragraphs(sf_dir: str):
    """C4-style paragraph cleaning: explode docs into 12-word
    paragraphs, keep full windows containing 'the', reassemble
    surviving paragraphs per doc (stages/paragraphs.py — flat
    expansion, streaming filter, one doc-keyed reassembly shuffle)."""
    from xlink_ray.stages.paragraphs import (
        explode_paragraphs,
        filter_paragraphs,
        reassemble_docs,
    )

    paras = explode_paragraphs(_docs(sf_dir), fixed_width=12)
    kept = filter_paragraphs(paras, min_words=12, require_token="the")
    return reassemble_docs(kept, sep="\n")


_ACCENT_SUFFIXES = ["Café", "NAÏVE", "über", "RÉSUMÉ"]


def _q_normalized_docs(sf_dir: str):
    """Unicode text normalization (lower → strip accents → collapse
    whitespace → trim); a deterministic accented suffix is appended
    first so the op is exercised on non-ASCII input."""
    import pyarrow as pa

    from xlink_ray.stages.curation import normalize_corpus

    def add_suffix(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out = [f"{s}  {_ACCENT_SUFFIXES[i % 4]} " for i, s in zip(ids, texts)]
        return t.set_column(t.schema.get_field_index("text"), "text", pa.array(out, pa.string()))

    ds = _docs(sf_dir).map_batches(add_suffix, batch_format="pyarrow")
    return normalize_corpus(ds).select_columns(["doc_id", "norm_text"])


def _q_user_running_stats(sf_dir: str):
    """SQL window-function family (lag / gap / running sum / rolling
    mean / row_number) per user over event time — one hash exchange,
    numpy run-kernels (stages/ordered.py)."""
    import ray.data as rd

    from xlink_ray.stages.ordered import keyed_window_stats

    return keyed_window_stats(
        read_pq(f"{sf_dir}/events.parquet"), window=3
    )


def _kmeans_queries(sf_dir: str):
    """Shared fit for the k-means family: deterministic rank init,
    4 quantized Lloyd updates (see xlink_ray/stages/kmeans.py), then a
    final streaming assignment pass."""
    import ray.data as rd

    from xlink_ray.stages.kmeans import kmeans_assign, kmeans_fit

    ds = read_pq(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_fit(ds, k=10, iters=4)
    return read_pq(f"{sf_dir}/embeddings.parquet"), cents


def _q_kmeans_sizes(sf_dir: str):
    """Distributed Lloyd k-means: final cell → member count (per-batch
    bincount partials; driver holds only the k-vector)."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.stages.kmeans import kmeans_assign

    ds, cents = _kmeans_queries(sf_dir)
    k = len(cents)
    asg = kmeans_assign(ds, cents).select_columns(["cell"])

    def partial(t: pa.Table) -> pa.Table:
        c = np.bincount(t["cell"].to_numpy(zero_copy_only=False), minlength=k)
        return pa.table(
            {"cell": pa.array(np.arange(k, dtype=np.int64)), "n": pa.array(c.astype(np.int64))}
        )

    total = np.zeros(k, dtype=np.int64)
    for b in asg.map_batches(partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        np.add.at(total, t["cell"].to_numpy(zero_copy_only=False), t["n"].to_numpy(zero_copy_only=False))
    keep = total > 0
    return pa.table(
        {
            "cell": pa.array(np.arange(k, dtype=np.int64)[keep]),
            "n": pa.array(total[keep]),
        }
    )


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup semantic near-dup prune: k-means cells as blocks, drop
    rows with a lower-id cosine-≥τ neighbor in the same cell."""
    from xlink_ray.stages.kmeans import semantic_dedup

    ds, cents = _kmeans_queries(sf_dir)
    return semantic_dedup(ds, cents, tau=0.35)


def _kmeans_cte(k: int = 10, iters: int = 4, quant: int = 6) -> str:
    """DuckDB replica of kmeans_fit + the final assignment: unrolled
    Lloyd iterations; centroid coordinates rounded to `quant` decimals
    each update exactly as the Ray stage does, so both sides walk the
    same quantized centroid sequence.  Exposes `a_final` (vec_id, v,
    cell) under the final centroids."""
    parts = [
        "base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "ranked AS (SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) - 1 AS rn FROM base)",
        f"""c0 AS (
  SELECT CAST(t.c AS BIGINT) AS cell, list_transform(r.v, x -> round(x, {quant})) AS cv
  FROM range({k}) t(c)
  JOIN ranked r ON r.rn = (t.c * (SELECT count(*) FROM base)) // {k})""",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""a{t} AS (
  SELECT b.vec_id, b.v,
         (SELECT c.cell FROM c{t - 1} c
          ORDER BY list_distance(b.v, c.cv) ASC, c.cell ASC LIMIT 1) AS cell
  FROM base b)"""
        )
        parts.append(
            f"""u{t} AS (
  SELECT cell, pos, round(avg(val), {quant}) AS m
  FROM (SELECT cell, generate_subscripts(v, 1) AS pos, unnest(v) AS val FROM a{t})
  GROUP BY cell, pos)"""
        )
        parts.append(
            f"""c{t} AS (
  SELECT p.cell, COALESCE(l.cv, p.cv) AS cv
  FROM c{t - 1} p
  LEFT JOIN (SELECT cell, list(m ORDER BY pos) AS cv FROM u{t} GROUP BY cell) l USING (cell))"""
        )
    parts.append(
        f"""a_final AS (
  SELECT b.vec_id, b.v,
         (SELECT c.cell FROM c{iters} c
          ORDER BY list_distance(b.v, c.cv) ASC, c.cell ASC LIMIT 1) AS cell
  FROM base b)"""
    )
    return "WITH " + ",\n".join(parts)


def _ivf_sql(
    n_cells: int = 16, nprobe: int = 4, iters: int = 8, k: int = 10, nq: int = 5
) -> str:
    """DuckDB replica of stages/ann.ivf_topk: 9-decimal quantized
    normalize (the same floor(x·1e9 + 0.5)/1e9 formula as ann._nq),
    linspace init rows, unrolled spherical-k-means iterations with
    6-decimal quantized centroid updates (ann._qround), per-query
    nprobe cells, and exact rank within the probed cells. Long-form
    (vec_id, dim, x) relational layout — no list kernels needed."""
    parts = [
        """ev AS (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings)""",
        "nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nn FROM ev GROUP BY vec_id)",
        """nv AS (
  SELECT e.vec_id, e.dim,
         floor(e.x / (CASE WHEN n.nn = 0 THEN 1 ELSE n.nn END) * 1e9 + 0.5) / 1e9 AS x
  FROM ev e JOIN nrm n USING (vec_id))""",
        "cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings)",
        f"""init AS (
  SELECT CAST(i.i AS BIGINT) AS cell,
         CASE WHEN i.i = {n_cells - 1} THEN CAST((SELECT n FROM cnt) - 1 AS BIGINT)
              ELSE CAST(floor(i.i * (((SELECT n FROM cnt) - 1) / {n_cells - 1}.0)) AS BIGINT)
         END AS vid
  FROM range({n_cells}) i(i))""",
        "c0 AS (SELECT init.cell, nv.dim, nv.x FROM init JOIN nv ON nv.vec_id = init.vid)",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(
            f"""s{t} AS (
  SELECT v.vec_id, c.cell, sum(v.x * c.x) AS sim
  FROM nv v JOIN c{p} c USING (dim) GROUP BY v.vec_id, c.cell)"""
        )
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
    FROM s{t}) WHERE rn = 1)"""
        )
        parts.append(
            f"""u{t} AS (
  SELECT a.cell, v.dim, sum(v.x) AS vx
  FROM a{t} a JOIN nv v USING (vec_id) GROUP BY a.cell, v.dim)"""
        )
        parts.append(
            f"un{t} AS (SELECT cell, sqrt(sum(vx*vx)) AS nn FROM u{t} GROUP BY cell)"
        )
        parts.append(
            f"""c{t} AS (
  SELECT c.cell, c.dim,
         CASE WHEN un.nn IS NULL OR un.nn <= 0 THEN c.x
              ELSE floor(u.vx / un.nn * 1e6 + 0.5) / 1e6 END AS x
  FROM c{p} c
  LEFT JOIN u{t} u ON u.cell = c.cell AND u.dim = c.dim
  LEFT JOIN un{t} un ON un.cell = c.cell)"""
        )
    parts.append(f"qn AS (SELECT vec_id AS qid, dim, x FROM nv WHERE vec_id < {nq})")
    parts.append(
        f"""qs AS (
  SELECT q.qid, c.cell, sum(q.x * c.x) AS sim
  FROM qn q JOIN c{iters} c USING (dim) GROUP BY q.qid, c.cell)"""
    )
    parts.append(
        f"""probes AS (
  SELECT qid, cell FROM (
    SELECT qid, cell,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cell) AS rn
    FROM qs) WHERE rn <= {nprobe})"""
    )
    parts.append(
        f"""sf AS (
  SELECT v.vec_id, c.cell, sum(v.x * c.x) AS sim
  FROM nv v JOIN c{iters} c USING (dim) GROUP BY v.vec_id, c.cell)"""
    )
    parts.append(
        """af AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
    FROM sf) WHERE rn = 1)"""
    )
    parts.append(
        """scored AS (
  SELECT p.qid, a.vec_id, sum(q.x * v.x) AS cos
  FROM probes p
  JOIN af a ON a.cell = p.cell
  JOIN nv v ON v.vec_id = a.vec_id
  JOIN qn q ON q.qid = p.qid AND q.dim = v.dim
  GROUP BY p.qid, a.vec_id)"""
    )
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and the
    # iteration chain (c8 -> c7 -> ... -> c0 -> nv -> ev) would expand
    # exponentially (it exhausts file handles re-scanning the parquet)
    return (
        "WITH "
        + ",\n".join(p.replace(" AS (", " AS MATERIALIZED (", 1) for p in parts)
        + f"""
SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, vec_id
FROM (SELECT qid, vec_id,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= {k}"""
    )


def _pq_sql(
    m_sub: int = 32, n_codes: int = 64, iters: int = 8, k: int = 10, nq: int = 5,
    dim: int = 64, rerank_mult: "int | None" = None,
) -> str:
    """DuckDB replica of stages/ann.pq_train + pq_encode + pq_topk:
    9-decimal quantized normalize, per-subspace euclidean Lloyd with
    6-decimal quantized means (ann._qround), assignment argmin with
    lowest-code ties, ADC score = sum of per-subspace inner products
    against the assigned code. Long-form (vec, sub, d2i, x) layout;
    all CTEs MATERIALIZED (plain CTEs inline exponentially through the
    iteration chain)."""
    dsub = dim // m_sub
    parts = [
        """ev AS (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings)""",
        "nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nn FROM ev GROUP BY vec_id)",
        """nv AS (
  SELECT e.vec_id, e.dim,
         floor(e.x / (CASE WHEN n.nn = 0 THEN 1 ELSE n.nn END) * 1e9 + 0.5) / 1e9 AS x
  FROM ev e JOIN nrm n USING (vec_id))""",
        f"""sv AS (
  SELECT vec_id, CAST((dim - 1) // {dsub} AS INTEGER) AS sub,
         CAST((dim - 1) % {dsub} AS INTEGER) AS d2i, x
  FROM nv)""",
        "vv AS (SELECT vec_id, sub, sum(x*x) AS v2 FROM sv GROUP BY vec_id, sub)",
        "cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings)",
        f"""init AS (
  SELECT CAST(i.i AS BIGINT) AS code,
         CASE WHEN i.i = {n_codes - 1} THEN CAST((SELECT n FROM cnt) - 1 AS BIGINT)
              ELSE CAST(floor(i.i * (((SELECT n FROM cnt) - 1) / {n_codes - 1}.0)) AS BIGINT)
         END AS vid
  FROM range({n_codes}) i(i))""",
        "cb0 AS (SELECT init.code, s.sub, s.d2i, s.x FROM init JOIN sv s ON s.vec_id = init.vid)",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(
            f"cc{p} AS (SELECT sub, code, sum(x*x) AS c2 FROM cb{p} GROUP BY sub, code)"
        )
        parts.append(
            f"""dt{t} AS (
  SELECT s.vec_id, s.sub, c.code, sum(s.x * c.x) AS dot
  FROM sv s JOIN cb{p} c USING (sub, d2i) GROUP BY s.vec_id, s.sub, c.code)"""
        )
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, sub, code FROM (
    SELECT d.vec_id, d.sub, d.code,
           row_number() OVER (PARTITION BY d.vec_id, d.sub
                              ORDER BY v.v2 - 2*d.dot + c.c2 ASC, d.code ASC) AS rn
    FROM dt{t} d
    JOIN vv v ON v.vec_id = d.vec_id AND v.sub = d.sub
    JOIN cc{p} c ON c.sub = d.sub AND c.code = d.code)
  WHERE rn = 1)"""
        )
        parts.append(
            f"""u{t} AS (
  SELECT a.code, a.sub, s.d2i, avg(s.x) AS m
  FROM a{t} a JOIN sv s ON s.vec_id = a.vec_id AND s.sub = a.sub
  GROUP BY a.code, a.sub, s.d2i)"""
        )
        parts.append(
            f"""cb{t} AS (
  SELECT c.code, c.sub, c.d2i,
         CASE WHEN u.m IS NULL THEN c.x
              ELSE floor(u.m * 1e6 + 0.5) / 1e6 END AS x
  FROM cb{p} c
  LEFT JOIN u{t} u ON u.code = c.code AND u.sub = c.sub AND u.d2i = c.d2i)"""
        )
    # encode the corpus under the final codebooks (argmin of -2·dot + c2)
    parts.append(
        f"ccf AS (SELECT sub, code, sum(x*x) AS c2 FROM cb{iters} GROUP BY sub, code)"
    )
    parts.append(
        f"""dtf AS (
  SELECT s.vec_id, s.sub, c.code, sum(s.x * c.x) AS dot
  FROM sv s JOIN cb{iters} c USING (sub, d2i) GROUP BY s.vec_id, s.sub, c.code)"""
    )
    parts.append(
        """af AS (
  SELECT vec_id, sub, code FROM (
    SELECT d.vec_id, d.sub, d.code,
           row_number() OVER (PARTITION BY d.vec_id, d.sub
                              ORDER BY -2*d.dot + c.c2 ASC, d.code ASC) AS rn
    FROM dtf d JOIN ccf c ON c.sub = d.sub AND c.code = d.code)
  WHERE rn = 1)"""
    )
    parts.append(
        f"""qsv AS (
  SELECT vec_id AS qid, CAST((dim - 1) // {dsub} AS INTEGER) AS sub,
         CAST((dim - 1) % {dsub} AS INTEGER) AS d2i, x
  FROM nv WHERE vec_id < {nq})"""
    )
    parts.append(
        f"""scored AS (
  SELECT q.qid, a.vec_id, sum(q.x * c.x) AS cos
  FROM af a
  JOIN cb{iters} c ON c.sub = a.sub AND c.code = a.code
  JOIN qsv q ON q.sub = c.sub AND q.d2i = c.d2i
  GROUP BY q.qid, a.vec_id)"""
    )
    cte = "WITH " + ",\n".join(
        p.replace(" AS (", " AS MATERIALIZED (", 1) for p in parts
    )
    if rerank_mult is None:
        return (
            cte
            + f"""
SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, vec_id
FROM (SELECT qid, vec_id,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= {k}"""
        )
    # two-stage: ADC shortlist of k*mult, exact cosine re-rank on the
    # raw embeddings (stages/ann.pq_rerank_topk)
    return (
        cte
        + f""",
shortlist AS (SELECT qid, vec_id
  FROM (SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
        FROM scored)
  WHERE rn <= {k * rerank_mult}),
qraw AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
         FROM embeddings WHERE vec_id < {nq}),
ex AS (SELECT s.qid, s.vec_id,
  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS c
  FROM shortlist s JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN qraw q ON q.qid = s.qid)
SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, vec_id
FROM (SELECT qid, vec_id,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rn
      FROM ex)
WHERE rn <= {k}"""
    )


def _vec_values_sql() -> "tuple[str, str]":
    """(wvec, evec) VALUES literal bodies from the deterministic synth
    embedding fixture (xlink_ray/synth.py token_vector: crc32-seeded
    RNG — not SQL-expressible, but its float32 values are exact DOUBLE
    literals, so the fixture table is pinned into the oracle). dim is
    1-based to line up with generate_subscripts."""
    from xlink_ray.synth import synth_embeddings

    t = synth_embeddings()
    wrows, erows = [], []
    for item, kind, vec in zip(
        t["item"].to_pylist(), t["kind"].to_pylist(), t["vec"].to_pylist()
    ):
        tgt = wrows if kind == "word" else erows
        for d, x in enumerate(vec, start=1):
            tgt.append(f"('{item}', {d}, {float(x)!r})")
    return ", ".join(wrows), ", ".join(erows)


def _flagship_parts() -> list[str]:
    """CTE chain replicating pipelines/flagship.links in DuckDB, ending
    at ``kept`` (doc_id, docnum, offset, mention, entity_id, believe)
    plus the reusable context-vector tables ``cv``/``cn``.

    Mirrors, stage by stage: synth.mark_text slot assignment (alias
    join on docnum % n_slots), extraction byte-identity (corpus text ==
    documents.text), the dictionary scan (mentions are whole
    space-separated tokens for this vocabulary, so token positions ==
    scanner matches), mention-anchor e_given_m and link_prob, the
    ±50-char context window with single-space joiner
    (candidates._context_strings), vocab-filtered mean-pool context
    embedding (functions/context.ContextEmbedder), context×entity
    cosine with den<=0 → 0, believe = e_given_m^0.02 · cos
    (candidates.resolve_batch), per-occurrence argmax with
    smallest-entity ties, and the P8 keep thresholds."""
    from xlink_ray.stages.candidates import (
        BELIEVE_TH,
        LINK_PROB_TH,
        POWER,
        WINDOW,
    )

    wvec, evec = _vec_values_sql()
    return [
        f"wvec(item, dim, x) AS (VALUES {wvec})",
        f"evec(entity_id, dim, x) AS (VALUES {evec})",
        """corpus AS (
  SELECT 'https://crawl.example.org/' || source || '/' || printf('%08d', doc_id) AS did,
         CAST(doc_id AS BIGINT) AS docnum, text
  FROM documents)""",
        """tpos AS (
  SELECT did, docnum, text, tok, i,
         CAST(coalesce(sum(length(tok) + 1) OVER (
              PARTITION BY did ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM (SELECT did, docnum, text,
               unnest(string_split(text, ' ')) AS tok,
               CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS i
        FROM corpus))""",
        """occ_cnt AS (
  SELECT did, docnum, tok AS mention, count(*) AS cnt
  FROM tpos WHERE tok IN (SELECT mention FROM alias)
  GROUP BY did, docnum, tok)""",
        """ma2 AS (
  SELECT o.mention, a.entity_id, CAST(sum(o.cnt) AS BIGINT) AS link_count
  FROM occ_cnt o JOIN alias a
    ON o.mention = a.mention AND (o.docnum % a.n_slots) = a.slot
  GROUP BY o.mention, a.entity_id)""",
        "lm AS (SELECT mention, sum(link_count) AS link_m FROM ma2 GROUP BY mention)",
        """lprob AS (
  SELECT l.mention, CAST(l.link_m AS DOUBLE) / CAST(f.freq AS DOUBLE) AS link_prob
  FROM lm l JOIN (SELECT mention, sum(cnt) AS freq FROM occ_cnt GROUP BY mention) f
    USING (mention))""",
        """occ AS (
  SELECT did, docnum, off, tok AS mention, length(tok) AS mlen, text
  FROM tpos WHERE tok IN (SELECT mention FROM alias))""",
        f"""cmap AS (
  SELECT did, off,
         lower(substr(text, CAST(greatest(off - {WINDOW}, 0) AS INT) + 1,
                      CAST(off - greatest(off - {WINDOW}, 0) AS INT))
               || ' ' ||
               substr(text, CAST(off + mlen + 1 AS INT), {WINDOW})) AS cstr
  FROM occ)""",
        # one vector per DISTINCT context string (mirrors the
        # embedder's per-distinct-string memo: identical strings get
        # the bitwise-identical vector, so cosine TIES between repeated
        # boilerplate contexts resolve identically in both engines);
        # joined back through an integer context id
        """dct AS (
  SELECT cstr, row_number() OVER (ORDER BY cstr) AS cid
  FROM (SELECT DISTINCT cstr FROM cmap))""",
        """cmap2 AS (
  SELECT m.did, m.off, d.cid FROM cmap m JOIN dct d USING (cstr))""",
        """cvd AS (
  SELECT c.cid, w.dim, avg(w.x) AS x
  FROM (SELECT cid, unnest(string_split(cstr, ' ')) AS t FROM dct) c
  JOIN wvec w ON w.item = c.t
  GROUP BY c.cid, w.dim)""",
        """cv AS (
  SELECT m.did, m.off, v.dim, v.x FROM cmap2 m JOIN cvd v USING (cid))""",
        "cn AS (SELECT did, off, sqrt(sum(x*x)) AS nn FROM cv GROUP BY did, off)",
        "en AS (SELECT entity_id, sqrt(sum(x*x)) AS nn FROM evec GROUP BY entity_id)",
        """cand AS (
  SELECT o.did, o.docnum, o.off, o.mention, m.entity_id,
         CAST(m.link_count AS DOUBLE) / CAST(l.link_m AS DOUBLE) AS e_given_m
  FROM occ o JOIN ma2 m USING (mention) JOIN lm l ON l.mention = o.mention)""",
        """dots AS (
  SELECT cd.did, cd.off, cd.entity_id, sum(c.x * e.x) AS num
  FROM cand cd
  JOIN cv c ON c.did = cd.did AND c.off = cd.off
  JOIN evec e ON e.entity_id = cd.entity_id AND e.dim = c.dim
  GROUP BY cd.did, cd.off, cd.entity_id)""",
        f"""scored AS (
  SELECT cd.did, cd.docnum, cd.off, cd.mention, cd.entity_id,
         pow(cd.e_given_m, {POWER}) *
         (CASE WHEN d.num IS NOT NULL AND coalesce(cn.nn, 0) * en.nn > 0
               THEN d.num / (cn.nn * en.nn) ELSE 0 END) AS believe
  FROM cand cd
  LEFT JOIN dots d ON d.did = cd.did AND d.off = cd.off AND d.entity_id = cd.entity_id
  LEFT JOIN cn ON cn.did = cd.did AND cn.off = cd.off
  JOIN en ON en.entity_id = cd.entity_id)""",
        f"""kept AS (
  SELECT s.did AS doc_id, s.docnum, s.off AS off, s.mention, s.entity_id, s.believe
  FROM (SELECT *, row_number() OVER (PARTITION BY did, off
                                     ORDER BY believe DESC, entity_id ASC) AS rn
        FROM scored) s
  JOIN lprob lp ON lp.mention = s.mention
  WHERE s.rn = 1 AND lp.link_prob > {LINK_PROB_TH}
    AND (s.believe + lp.link_prob) / 2.0 > {BELIEVE_TH})""",
    ]


def _mat(parts: list[str]) -> str:
    """Join CTE parts, materializing each (plain CTEs re-inline per
    reference — the context/candidate tables are consumed repeatedly)."""
    return ",\n".join(p.replace(" AS (", " AS MATERIALIZED (", 1) for p in parts)


def _links_sql() -> str:
    """DuckDB replica of flagship.links (believe quantized to 1e-6 on
    both sides — floor(x·1e6+0.5), the same half-up rule as ann)."""
    return (
        f"WITH {_alias_values_sql()},\n{_mat(_flagship_parts())}\n"
        'SELECT doc_id, off AS "offset", mention, entity_id,\n'
        "       CAST(floor(believe * 1e6 + 0.5) AS BIGINT) AS believe_q\nFROM kept"
    )


def _nil_sql(cos_th_e6: int = 800000, believe_th: float = 0.5) -> str:
    """DuckDB replica of flagship.nil_clusters: the scored-winner CTE
    chain with the keep filter INVERTED (the NIL set at the stricter
    review bar), context-CLASS collapse (star edges to the min-node rep
    per (mention, distinct context); in-class cosine is exactly 1),
    the ≤ distinct-contexts² class-rep cosine grid quantized half-up to
    1e-6, and a recursive closure with every NIL node as a singleton."""
    from xlink_ray.stages.candidates import LINK_PROB_TH

    extra = f""",
best AS MATERIALIZED (
  SELECT s.did, s.docnum, s.off, s.mention, s.believe, lp.link_prob,
         row_number() OVER (PARTITION BY s.did, s.off
                            ORDER BY s.believe DESC, s.entity_id) AS rn
  FROM scored s JOIN lprob lp ON lp.mention = s.mention),
nil AS MATERIALIZED (
  SELECT did, docnum, off, mention FROM best
  WHERE rn = 1 AND NOT (link_prob > {LINK_PROB_TH}
                        AND (believe + link_prob)/2.0 > {believe_th})),
nilc AS MATERIALIZED (
  SELECT n.mention, m.cid, n.docnum*1000000 + n.off AS node
  FROM nil n JOIN cmap2 m ON m.did = n.did AND m.off = n.off),
cnorm AS MATERIALIZED (SELECT cid, sqrt(sum(x*x)) AS nn FROM cvd GROUP BY cid),
cls AS MATERIALIZED (
  SELECT mention, cid, min(node) AS rep FROM nilc GROUP BY mention, cid),
star AS MATERIALIZED (
  SELECT c.rep AS u, n.node AS v
  FROM nilc n JOIN cls c ON c.mention = n.mention AND c.cid = n.cid
  JOIN cnorm cn2 ON cn2.cid = n.cid
  WHERE cn2.nn > 0 AND n.node <> c.rep),
cpairs AS MATERIALIZED (
  SELECT a.cid AS ca, b.cid AS cb, a.rep AS ra, b.rep AS rb
  FROM cls a JOIN cls b ON a.mention = b.mention AND a.rep < b.rep),
cdot AS MATERIALIZED (
  SELECT p.ca, p.cb, sum(va.x*vb.x) AS num
  FROM (SELECT DISTINCT ca, cb FROM cpairs) p
  JOIN cvd va ON va.cid = p.ca
  JOIN cvd vb ON vb.cid = p.cb AND vb.dim = va.dim
  GROUP BY p.ca, p.cb),
ce AS MATERIALIZED (
  SELECT p.ra AS u, p.rb AS v FROM cpairs p
  JOIN cnorm na ON na.cid = p.ca JOIN cnorm nb ON nb.cid = p.cb
  LEFT JOIN cdot d ON d.ca = p.ca AND d.cb = p.cb
  WHERE CAST(floor((CASE WHEN na.nn*nb.nn > 0
                         THEN coalesce(d.num, 0)/(na.nn*nb.nn) ELSE 0 END)
                   *1e6 + 0.5) AS BIGINT) >= {cos_th_e6}),
alled AS MATERIALIZED (SELECT u, v FROM star UNION ALL SELECT u, v FROM ce),
sym AS MATERIALIZED (SELECT u, v FROM alled UNION SELECT v, u FROM alled),
reach(u, v) AS (
  SELECT node, node FROM nilc
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
SELECT u AS member_id, CAST(min(v) AS BIGINT) AS cluster_id
FROM reach GROUP BY u"""
    return (
        f"WITH RECURSIVE {_alias_values_sql()},\n{_mat(_flagship_parts())}{extra}"
    )


def _links_partitioned_sql() -> str:
    return (
        f"WITH {_alias_values_sql()},\n{_mat(_flagship_parts())}\n"
        'SELECT doc_id, off AS "offset", mention, entity_id FROM kept'
    )


def _clusters_parts() -> list[str]:
    """kept → per-(mention, entity, salt) sorted-neighborhood runs:
    break where adjacent context cosine < EDGE_TH (flagship._run_labels;
    den <= 0 → cos 0 → edge kept at EDGE_TH=0), cluster = min member
    string within the run."""
    from xlink_ray.pipelines.flagship import DOCS_PER_SALT, EDGE_TH

    return _flagship_parts() + [
        f"""ordered AS (
  SELECT k.doc_id, k.off, k.mention, k.entity_id,
         CAST(k.docnum // {DOCS_PER_SALT} AS BIGINT) AS salt,
         row_number() OVER (
           PARTITION BY k.mention, k.entity_id, k.docnum // {DOCS_PER_SALT}
           ORDER BY k.doc_id, k.off) AS rn
  FROM kept k)""",
        """pairdot AS (
  SELECT cur.mention, cur.entity_id, cur.salt, cur.rn, sum(a.x * b.x) AS num
  FROM ordered cur
  JOIN ordered prv ON prv.mention = cur.mention AND prv.entity_id = cur.entity_id
                  AND prv.salt = cur.salt AND prv.rn = cur.rn - 1
  JOIN cv a ON a.did = prv.doc_id AND a.off = prv.off
  JOIN cv b ON b.did = cur.doc_id AND b.off = cur.off AND b.dim = a.dim
  GROUP BY cur.mention, cur.entity_id, cur.salt, cur.rn)""",
        f"""runs AS (
  SELECT cur.*,
         sum(CASE WHEN cur.rn = 1 THEN 1
                  WHEN (CASE WHEN pd.num IS NOT NULL
                              AND coalesce(pn.nn, 0) * coalesce(qn.nn, 0) > 0
                             THEN pd.num / (pn.nn * qn.nn) ELSE 0 END) < {EDGE_TH}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY cur.mention, cur.entity_id, cur.salt
                 ORDER BY cur.rn) AS run
  FROM ordered cur
  LEFT JOIN ordered prv ON prv.mention = cur.mention AND prv.entity_id = cur.entity_id
                       AND prv.salt = cur.salt AND prv.rn = cur.rn - 1
  LEFT JOIN pairdot pd ON pd.mention = cur.mention AND pd.entity_id = cur.entity_id
                      AND pd.salt = cur.salt AND pd.rn = cur.rn
  LEFT JOIN cn pn ON pn.did = prv.doc_id AND pn.off = prv.off
  LEFT JOIN cn qn ON qn.did = cur.doc_id AND qn.off = cur.off)""",
        """mem AS (
  SELECT doc_id || '#' || CAST(off AS VARCHAR) AS member_id,
         mention, entity_id, salt, run, doc_id, off
  FROM runs)""",
    ]


def _clusters_sql() -> str:
    """DuckDB replica of flagship.clusters (fused path)."""
    return (
        f"WITH {_alias_values_sql()},\n{_mat(_clusters_parts())}\n"
        "SELECT member_id,\n"
        "       min(member_id) OVER (PARTITION BY mention, entity_id, salt, run) AS cluster_id\n"
        "FROM mem"
    )


def _golden_sql() -> str:
    """DuckDB replica of flagship.golden_clusters: cluster_id = min
    member (the run label itself), representative mention/entity are
    the run's partition keys (constant within a run), believe = the
    strongest member's score (max), quantized to 1e-6 half-up."""
    return (
        f"WITH {_alias_values_sql()},\n{_mat(_clusters_parts())},\n"
        """lab AS MATERIALIZED (
  SELECT m.member_id, m.mention, m.entity_id, m.doc_id, m.off,
         min(m.member_id) OVER (PARTITION BY m.mention, m.entity_id, m.salt, m.run)
           AS cluster_id
  FROM mem m)
SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       l.mention, l.entity_id,
       CAST(floor(max(k.believe) * 1e6 + 0.5) AS BIGINT) AS believe_q
FROM lab l JOIN kept k ON k.doc_id = l.doc_id AND k.off = l.off
GROUP BY l.cluster_id, l.mention, l.entity_id"""
    )


def _attach_sql() -> str:
    """DuckDB replica of flagship.attach_new_crawl(new_repeat=2): the
    new crawl is synth copy 1 (docnum + N, same text → contexts reuse
    the base doc's vectors), scanned with the BASE dictionary — so the
    new kept links equal the base kept links doc-shifted. Base run
    labels are recomputed per (mention, entity, salt); each new row
    tests the context cosine against its left/right base neighbor in
    global block order (tie → left), adopts the winner's label when
    cos >= EDGE_TH, else founds its own cluster; blocks with no base
    rows run-cluster among themselves per salt (flagship._AttachBlock)."""
    from xlink_ray.pipelines.flagship import DOCS_PER_SALT, EDGE_TH

    parts = _flagship_parts() + [
        "ncnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)",
        f"""allk AS (
  SELECT mention, entity_id, doc_id, docnum, off, 0 AS side, doc_id AS cdid
  FROM kept
  UNION ALL
  SELECT mention, entity_id,
         substr(doc_id, 1, length(doc_id) - 8)
           || printf('%08d', docnum + (SELECT n FROM ncnt)) AS doc_id,
         docnum + (SELECT n FROM ncnt) AS docnum, off, 1 AS side, doc_id AS cdid
  FROM kept)""",
        f"""srt AS (
  SELECT a.*, CAST(a.docnum // {DOCS_PER_SALT} AS BIGINT) AS salt,
         a.doc_id || '#' || CAST(a.off AS VARCHAR) AS member_id,
         sum(CASE WHEN a.side = 0 THEN 1 ELSE 0 END) OVER (
           PARTITION BY a.mention, a.entity_id ORDER BY a.doc_id, a.off
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ins
  FROM allk a)""",
        """bsrt AS (
  SELECT s.*,
         row_number() OVER (PARTITION BY mention, entity_id
                            ORDER BY doc_id, off) AS brn,
         row_number() OVER (PARTITION BY mention, entity_id, salt
                            ORDER BY doc_id, off) AS srn
  FROM srt s WHERE s.side = 0)""",
        """bdot AS (
  SELECT cur.mention, cur.entity_id, cur.salt, cur.srn, sum(a.x * b.x) AS num
  FROM bsrt cur
  JOIN bsrt prv ON prv.mention = cur.mention AND prv.entity_id = cur.entity_id
               AND prv.salt = cur.salt AND prv.srn = cur.srn - 1
  JOIN cv a ON a.did = prv.cdid AND a.off = prv.off
  JOIN cv b ON b.did = cur.cdid AND b.off = cur.off AND b.dim = a.dim
  GROUP BY cur.mention, cur.entity_id, cur.salt, cur.srn)""",
        f"""bruns AS (
  SELECT cur.*,
         sum(CASE WHEN cur.srn = 1 THEN 1
                  WHEN (CASE WHEN bd.num IS NOT NULL
                              AND coalesce(pn.nn, 0) * coalesce(qn.nn, 0) > 0
                             THEN bd.num / (pn.nn * qn.nn) ELSE 0 END) < {EDGE_TH}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY cur.mention, cur.entity_id, cur.salt
                 ORDER BY cur.srn) AS run
  FROM bsrt cur
  LEFT JOIN bsrt prv ON prv.mention = cur.mention AND prv.entity_id = cur.entity_id
                    AND prv.salt = cur.salt AND prv.srn = cur.srn - 1
  LEFT JOIN bdot bd ON bd.mention = cur.mention AND bd.entity_id = cur.entity_id
                   AND bd.salt = cur.salt AND bd.srn = cur.srn
  LEFT JOIN cn pn ON pn.did = prv.cdid AND pn.off = prv.off
  LEFT JOIN cn qn ON qn.did = cur.cdid AND qn.off = cur.off)""",
        """blab AS (
  SELECT b.*, min(b.member_id) OVER (
    PARTITION BY b.mention, b.entity_id, b.salt, b.run) AS blabel
  FROM bruns b)""",
        """nw AS (
  SELECT s.* FROM srt s
  WHERE s.side = 1
    AND EXISTS (SELECT 1 FROM bsrt b
                WHERE b.mention = s.mention AND b.entity_id = s.entity_id))""",
        """ldot AS (
  SELECT n.doc_id, n.off, sum(a.x * b.x) AS num
  FROM nw n
  JOIN blab l ON l.mention = n.mention AND l.entity_id = n.entity_id
             AND l.brn = n.ins
  JOIN cv a ON a.did = n.cdid AND a.off = n.off
  JOIN cv b ON b.did = l.cdid AND b.off = l.off AND b.dim = a.dim
  GROUP BY n.doc_id, n.off)""",
        """rdot AS (
  SELECT n.doc_id, n.off, sum(a.x * b.x) AS num
  FROM nw n
  JOIN blab r ON r.mention = n.mention AND r.entity_id = n.entity_id
             AND r.brn = n.ins + 1
  JOIN cv a ON a.did = n.cdid AND a.off = n.off
  JOIN cv b ON b.did = r.cdid AND b.off = r.off AND b.dim = a.dim
  GROUP BY n.doc_id, n.off)""",
        """npick AS (
  SELECT n.member_id,
         CASE WHEN l.brn IS NULL THEN -1.0
              WHEN ld.num IS NOT NULL AND coalesce(ncn.nn, 0) * coalesce(lcn.nn, 0) > 0
              THEN ld.num / (ncn.nn * lcn.nn) ELSE 0.0 END AS cos_l,
         CASE WHEN r.brn IS NULL THEN -1.0
              WHEN rd.num IS NOT NULL AND coalesce(ncn.nn, 0) * coalesce(rcn.nn, 0) > 0
              THEN rd.num / (ncn.nn * rcn.nn) ELSE 0.0 END AS cos_r,
         l.blabel AS llab, r.blabel AS rlab
  FROM nw n
  LEFT JOIN blab l ON l.mention = n.mention AND l.entity_id = n.entity_id
                  AND l.brn = n.ins
  LEFT JOIN blab r ON r.mention = n.mention AND r.entity_id = n.entity_id
                  AND r.brn = n.ins + 1
  LEFT JOIN ldot ld ON ld.doc_id = n.doc_id AND ld.off = n.off
  LEFT JOIN rdot rd ON rd.doc_id = n.doc_id AND rd.off = n.off
  LEFT JOIN cn ncn ON ncn.did = n.cdid AND ncn.off = n.off
  LEFT JOIN cn lcn ON lcn.did = l.cdid AND lcn.off = l.off
  LEFT JOIN cn rcn ON rcn.did = r.cdid AND rcn.off = r.off)""",
        f"""attach_out AS (
  SELECT member_id,
         CASE WHEN (CASE WHEN cos_l >= cos_r THEN cos_l ELSE cos_r END) >= {EDGE_TH}
              THEN (CASE WHEN cos_l >= cos_r THEN llab ELSE rlab END)
              ELSE member_id END AS cluster_id,
         CAST(CASE WHEN (CASE WHEN cos_l >= cos_r THEN cos_l ELSE cos_r END) >= {EDGE_TH}
                   THEN 1 ELSE 0 END AS BIGINT) AS matched,
         CAST(CASE WHEN (CASE WHEN cos_l >= cos_r THEN cos_l ELSE cos_r END) < 0
                   THEN -1
                   ELSE floor((CASE WHEN cos_l >= cos_r THEN cos_l ELSE cos_r END)
                              * 10000.0 + 0.5) END AS BIGINT) AS cos_bp
  FROM npick)""",
        # blocks with no base rows: standard per-salt run clustering
        # among the new rows themselves
        """nonly AS (
  SELECT s.*,
         row_number() OVER (PARTITION BY mention, entity_id, salt
                            ORDER BY doc_id, off) AS srn
  FROM srt s
  WHERE s.side = 1
    AND NOT EXISTS (SELECT 1 FROM bsrt b
                    WHERE b.mention = s.mention AND b.entity_id = s.entity_id))""",
        """odot AS (
  SELECT cur.mention, cur.entity_id, cur.salt, cur.srn, sum(a.x * b.x) AS num
  FROM nonly cur
  JOIN nonly prv ON prv.mention = cur.mention AND prv.entity_id = cur.entity_id
                AND prv.salt = cur.salt AND prv.srn = cur.srn - 1
  JOIN cv a ON a.did = prv.cdid AND a.off = prv.off
  JOIN cv b ON b.did = cur.cdid AND b.off = cur.off AND b.dim = a.dim
  GROUP BY cur.mention, cur.entity_id, cur.salt, cur.srn)""",
        f"""oruns AS (
  SELECT cur.*,
         sum(CASE WHEN cur.srn = 1 THEN 1
                  WHEN (CASE WHEN od.num IS NOT NULL
                              AND coalesce(pn.nn, 0) * coalesce(qn.nn, 0) > 0
                             THEN od.num / (pn.nn * qn.nn) ELSE 0 END) < {EDGE_TH}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY cur.mention, cur.entity_id, cur.salt
                 ORDER BY cur.srn) AS run
  FROM nonly cur
  LEFT JOIN nonly prv ON prv.mention = cur.mention AND prv.entity_id = cur.entity_id
                     AND prv.salt = cur.salt AND prv.srn = cur.srn - 1
  LEFT JOIN odot od ON od.mention = cur.mention AND od.entity_id = cur.entity_id
                   AND od.salt = cur.salt AND od.srn = cur.srn
  LEFT JOIN cn pn ON pn.did = prv.cdid AND pn.off = prv.off
  LEFT JOIN cn qn ON qn.did = cur.cdid AND qn.off = cur.off)""",
    ]
    return (
        f"WITH {_alias_values_sql()},\n{_mat(parts)}\n"
        """SELECT member_id, cluster_id, matched, cos_bp FROM attach_out
UNION ALL
SELECT member_id,
       min(member_id) OVER (PARTITION BY mention, entity_id, salt, run) AS cluster_id,
       CAST(0 AS BIGINT) AS matched, CAST(-1 AS BIGINT) AS cos_bp
FROM oruns"""
    )


def _ivfpq_sql(
    n_cells: int = 16, nprobe: int = 4, m_sub: int = 8, n_codes: int = 16,
    iters: int = 8, k: int = 10, nq: int = 5, dim: int = 64,
) -> str:
    """DuckDB replica of stages/ann.ivfpq_train + ivfpq_index +
    ivfpq_topk: the _ivf_sql coarse-cell training (prefixed iv_*) and
    the _pq_sql per-subspace codebooks (prefixed pq_*) composed —
    queries probe nprobe coarse cells and ADC-score only the PQ codes
    assigned there. Every CTE MATERIALIZED (the two unrolled Lloyd
    chains inline exponentially as plain CTEs)."""
    dsub = dim // m_sub
    parts = [
        """ev AS (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings)""",
        "nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nn FROM ev GROUP BY vec_id)",
        """nv AS (
  SELECT e.vec_id, e.dim,
         floor(e.x / (CASE WHEN n.nn = 0 THEN 1 ELSE n.nn END) * 1e9 + 0.5) / 1e9 AS x
  FROM ev e JOIN nrm n USING (vec_id))""",
        "cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings)",
        # ---- coarse spherical k-means (iv_*) ----
        f"""iv_init AS (
  SELECT CAST(i.i AS BIGINT) AS cell,
         CASE WHEN i.i = {n_cells - 1} THEN CAST((SELECT n FROM cnt) - 1 AS BIGINT)
              ELSE CAST(floor(i.i * (((SELECT n FROM cnt) - 1) / {n_cells - 1}.0)) AS BIGINT)
         END AS vid
  FROM range({n_cells}) i(i))""",
        "iv_c0 AS (SELECT iv_init.cell, nv.dim, nv.x FROM iv_init JOIN nv ON nv.vec_id = iv_init.vid)",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts += [
            f"""iv_s{t} AS (
  SELECT v.vec_id, c.cell, sum(v.x * c.x) AS sim
  FROM nv v JOIN iv_c{p} c USING (dim) GROUP BY v.vec_id, c.cell)""",
            f"""iv_a{t} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
    FROM iv_s{t}) WHERE rn = 1)""",
            f"""iv_u{t} AS (
  SELECT a.cell, v.dim, sum(v.x) AS vx
  FROM iv_a{t} a JOIN nv v USING (vec_id) GROUP BY a.cell, v.dim)""",
            f"iv_un{t} AS (SELECT cell, sqrt(sum(vx*vx)) AS nn FROM iv_u{t} GROUP BY cell)",
            f"""iv_c{t} AS (
  SELECT c.cell, c.dim,
         CASE WHEN un.nn IS NULL OR un.nn <= 0 THEN c.x
              ELSE floor(u.vx / un.nn * 1e6 + 0.5) / 1e6 END AS x
  FROM iv_c{p} c
  LEFT JOIN iv_u{t} u ON u.cell = c.cell AND u.dim = c.dim
  LEFT JOIN iv_un{t} un ON un.cell = c.cell)""",
        ]
    parts += [
        # final corpus cell assignment
        f"""iv_sf AS (
  SELECT v.vec_id, c.cell, sum(v.x * c.x) AS sim
  FROM nv v JOIN iv_c{iters} c USING (dim) GROUP BY v.vec_id, c.cell)""",
        """iv_af AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
    FROM iv_sf) WHERE rn = 1)""",
        # ---- PQ codebooks (pq_*) ----
        f"""sv AS (
  SELECT vec_id, CAST((dim - 1) // {dsub} AS INTEGER) AS sub,
         CAST((dim - 1) % {dsub} AS INTEGER) AS d2i, x
  FROM nv)""",
        "vv AS (SELECT vec_id, sub, sum(x*x) AS v2 FROM sv GROUP BY vec_id, sub)",
        f"""pq_init AS (
  SELECT CAST(i.i AS BIGINT) AS code,
         CASE WHEN i.i = {n_codes - 1} THEN CAST((SELECT n FROM cnt) - 1 AS BIGINT)
              ELSE CAST(floor(i.i * (((SELECT n FROM cnt) - 1) / {n_codes - 1}.0)) AS BIGINT)
         END AS vid
  FROM range({n_codes}) i(i))""",
        "pq_cb0 AS (SELECT pq_init.code, s.sub, s.d2i, s.x FROM pq_init JOIN sv s ON s.vec_id = pq_init.vid)",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts += [
            f"pq_cc{p} AS (SELECT sub, code, sum(x*x) AS c2 FROM pq_cb{p} GROUP BY sub, code)",
            f"""pq_dt{t} AS (
  SELECT s.vec_id, s.sub, c.code, sum(s.x * c.x) AS dot
  FROM sv s JOIN pq_cb{p} c USING (sub, d2i) GROUP BY s.vec_id, s.sub, c.code)""",
            f"""pq_a{t} AS (
  SELECT vec_id, sub, code FROM (
    SELECT d.vec_id, d.sub, d.code,
           row_number() OVER (PARTITION BY d.vec_id, d.sub
                              ORDER BY v.v2 - 2*d.dot + c.c2 ASC, d.code ASC) AS rn
    FROM pq_dt{t} d
    JOIN vv v ON v.vec_id = d.vec_id AND v.sub = d.sub
    JOIN pq_cc{p} c ON c.sub = d.sub AND c.code = d.code)
  WHERE rn = 1)""",
            f"""pq_u{t} AS (
  SELECT a.code, a.sub, s.d2i, avg(s.x) AS m
  FROM pq_a{t} a JOIN sv s ON s.vec_id = a.vec_id AND s.sub = a.sub
  GROUP BY a.code, a.sub, s.d2i)""",
            f"""pq_cb{t} AS (
  SELECT c.code, c.sub, c.d2i,
         CASE WHEN u.m IS NULL THEN c.x
              ELSE floor(u.m * 1e6 + 0.5) / 1e6 END AS x
  FROM pq_cb{p} c
  LEFT JOIN pq_u{t} u ON u.code = c.code AND u.sub = c.sub AND u.d2i = c.d2i)""",
        ]
    parts += [
        # final PQ encode
        f"pq_ccf AS (SELECT sub, code, sum(x*x) AS c2 FROM pq_cb{iters} GROUP BY sub, code)",
        f"""pq_dtf AS (
  SELECT s.vec_id, s.sub, c.code, sum(s.x * c.x) AS dot
  FROM sv s JOIN pq_cb{iters} c USING (sub, d2i) GROUP BY s.vec_id, s.sub, c.code)""",
        """pq_af AS (
  SELECT vec_id, sub, code FROM (
    SELECT d.vec_id, d.sub, d.code,
           row_number() OVER (PARTITION BY d.vec_id, d.sub
                              ORDER BY -2*d.dot + c.c2 ASC, d.code ASC) AS rn
    FROM pq_dtf d JOIN pq_ccf c ON c.sub = d.sub AND c.code = d.code)
  WHERE rn = 1)""",
        # ---- query probes + ADC over probed cells ----
        f"qn AS (SELECT vec_id AS qid, dim, x FROM nv WHERE vec_id < {nq})",
        f"""qs AS (
  SELECT q.qid, c.cell, sum(q.x * c.x) AS sim
  FROM qn q JOIN iv_c{iters} c USING (dim) GROUP BY q.qid, c.cell)""",
        f"""probes AS (
  SELECT qid, cell FROM (
    SELECT qid, cell,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cell) AS rn
    FROM qs) WHERE rn <= {nprobe})""",
        f"""qsv AS (
  SELECT vec_id AS qid, CAST((dim - 1) // {dsub} AS INTEGER) AS sub,
         CAST((dim - 1) % {dsub} AS INTEGER) AS d2i, x
  FROM nv WHERE vec_id < {nq})""",
        f"""scored AS (
  SELECT p.qid, a.vec_id, sum(q.x * c.x) AS cos
  FROM probes p
  JOIN iv_af ca ON ca.cell = p.cell
  JOIN pq_af a ON a.vec_id = ca.vec_id
  JOIN pq_cb{iters} c ON c.sub = a.sub AND c.code = a.code
  JOIN qsv q ON q.qid = p.qid AND q.sub = c.sub AND q.d2i = c.d2i
  GROUP BY p.qid, a.vec_id)""",
    ]
    return (
        "WITH "
        + ",\n".join(p.replace(" AS (", " AS MATERIALIZED (", 1) for p in parts)
        + f"""
SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, vec_id
FROM (SELECT qid, vec_id,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= {k}"""
    )


def _q_ann_ivfpq(sf_dir: str):
    """IVF-PQ ANN — the 10¹²-vector configuration: coarse inverted
    file bounds the scan (nprobe cells), PQ codes bound memory
    (m_sub bytes/vector), queries ADC-score compressed codes only.
    SQL-oracled (_ivfpq_sql) via the same quantized trainings as
    ann_ivf/ann_pq."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd

    from xlink_ray.stages.ann import ivfpq_index, ivfpq_topk, ivfpq_train

    q = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = q.sort_by("vec_id").slice(0, 5)
    queries = np.asarray(q["embedding"].to_pylist(), dtype=np.float64)
    ds = read_pq(f"{sf_dir}/embeddings.parquet")
    cents, cb = ivfpq_train(ds, n_cells=16, m_sub=8, n_codes=16)
    return ivfpq_topk(ivfpq_index(ds, cents, cb), cents, cb, queries, k=10, nprobe=4)


def _perturbed_recrawl(sf_dir: str):
    """Deterministic 'recrawl' of documents (same rule as corpus_diff:
    every 97th doc changed with a ' v2' suffix, every 101st dropped,
    every 103rd cloned under id+1e6 with fresh text)."""
    import numpy as np
    import pyarrow as pa

    def perturb(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        keep = ids % 101 != 0
        out_ids = list(ids[keep])
        out_txt = [
            txt + " v2" if i % 97 == 0 else txt
            for i, txt in zip(
                ids[keep].tolist(), [texts[j] for j in np.flatnonzero(keep)]
            )
        ]
        for i, txt in zip(ids.tolist(), texts):
            if i % 103 == 0:
                out_ids.append(i + 1_000_000)
                out_txt.append("new doc " + str(i))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "text": pa.array(out_txt, pa.string()),
            }
        )

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        perturb, batch_format="pyarrow"
    )


_RECRAWL_SQL = """nw AS (
  SELECT doc_id, text || CASE WHEN doc_id % 97 = 0 THEN ' v2' ELSE '' END AS text
  FROM documents WHERE doc_id % 101 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'new doc ' || doc_id AS text
  FROM documents WHERE doc_id % 103 = 0)"""


def _q_minhash_attach(sf_dir: str):
    """Incremental near-dup attach: new-crawl docs vs the standing
    corpus (cross-side MinHash bands + exact shingle-Jaccard verify).
    SQL-oracled (_minhash_attach_sql)."""
    from xlink_ray.stages.dedup import minhash_attach

    return minhash_attach(
        _perturbed_recrawl(sf_dir),
        _docs(sf_dir).select_columns(["doc_id", "text"]),
        jaccard_th=0.5,
    ).select_columns(["new_id", "base_id", "jaccard_bp"])


def _minhash_attach_sql(
    num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
    th_num: int = 5000, th_den: int = 10000,
) -> str:
    """DuckDB replica of stages/dedup.minhash_attach over the
    deterministic recrawl: both corpora through the same md5/M61
    shingle + affine-permutation minhash, band-list equality across
    sides, exact shingle-Jaccard with the integer cross-multiply."""
    from xlink_ray.stages.dedup import minhash_perm_params

    M = (1 << 61) - 1
    a, b = minhash_perm_params(num_perm)
    rows_per_band = num_perm // bands
    perm_rows = ",\n    ".join(
        f"({i}, {int(a[i])}::UBIGINT, {int(b[i])}::UBIGINT)" for i in range(num_perm)
    )
    shingle = (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(length(text) - {shingle_k - 1}, 1)), "
        f"i -> ('0x' || substr(md5(substr(text, i, {shingle_k})), 1, 16))::UBIGINT % {M}))"
    )
    mh = f"""
  SELECT s.doc_id, p.i,
         min(CAST((CAST(p.a AS UHUGEINT) * CAST(u.h AS UHUGEINT)
                   + CAST(p.b AS UHUGEINT)) % {M} AS UBIGINT)) AS v
  FROM {{src}} s, unnest(s.hs) AS u(h), perm p
  GROUP BY s.doc_id, p.i"""
    return f"""WITH {_RECRAWL_SQL},
perm(i, a, b) AS (SELECT * FROM (VALUES
    {perm_rows})),
shb AS (SELECT doc_id, {shingle} AS hs FROM documents),
shn AS (SELECT doc_id, {shingle} AS hs FROM nw),
mhb AS ({mh.format(src='shb')}),
mhn AS ({mh.format(src='shn')}),
bb AS (
  SELECT doc_id, i // {rows_per_band} AS band, list(v ORDER BY i) AS vals
  FROM mhb GROUP BY doc_id, i // {rows_per_band}),
bn AS (
  SELECT doc_id, i // {rows_per_band} AS band, list(v ORDER BY i) AS vals
  FROM mhn GROUP BY doc_id, i // {rows_per_band}),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, b.doc_id AS base_id
  FROM bn n JOIN bb b ON n.band = b.band AND n.vals = b.vals),
v AS (
  SELECT c.new_id, c.base_id,
         len(list_intersect(a.hs, b.hs)) AS inter,
         len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) AS un
  FROM cand c
  JOIN shn a ON c.new_id = a.doc_id
  JOIN shb b ON c.base_id = b.doc_id)
SELECT new_id, base_id, CAST((10000 * inter) // un AS BIGINT) AS jaccard_bp
FROM v WHERE inter * {th_den} >= un * {th_num}"""


def _q_ppjoin_pairs(sf_dir: str):
    """Token-level set-similarity self-join (PPJoin/AllPairs prefix
    filter under the (df ASC, token ASC) total order): doc pairs with
    distinct-token-set Jaccard ≥ 0.95. SQL-oracled (integer-exact
    prefix length and threshold cross-multiply)."""
    from xlink_ray.stages.dedup import ppjoin_pairs

    return ppjoin_pairs(
        _docs(sf_dir).select_columns(["doc_id", "text"]), th=0.95
    ).select_columns(["id_a", "id_b", "jaccard_bp"])


_PPJOIN_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
  FROM documents),
tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
df AS (SELECT t, count(*) AS df FROM tok2 GROUP BY t),
ord AS (
  SELECT k.doc_id, k.t,
         row_number() OVER (PARTITION BY k.doc_id ORDER BY d.df, k.t) AS rn,
         count(*) OVER (PARTITION BY k.doc_id) AS n
  FROM tok2 k JOIN df d USING (t)),
pre AS (
  SELECT doc_id, t FROM ord
  WHERE rn <= greatest(n - (9500 * n + 9999) // 10000 + 1, 1)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pre a JOIN pre b ON a.t = b.t AND a.doc_id < b.doc_id),
s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts FROM documents),
v AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(a.ts, b.ts)) AS inter,
         len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)) AS un
  FROM cand c JOIN s a ON c.id_a = a.doc_id JOIN s b ON c.id_b = b.doc_id)
SELECT id_a, id_b, CAST((10000 * inter) // un AS BIGINT) AS jaccard_bp
FROM v WHERE inter * 10000 >= un * 9500"""


def _q_doc_semantic_topk(sf_dir: str):
    """Text → embedding → search, end to end: mean word-vector doc
    embeddings (stages/projection.doc_embeddings, fixture vocabulary)
    feed the exact cosine ANN — semantic top-k over the corpus with no
    model-produced embedding column. SQL-oracled (_doc_semantic_sql)."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.stages.ann import brute_topk
    from xlink_ray.stages.projection import doc_embeddings
    from xlink_ray.synth import synth_embeddings

    emb = synth_embeddings()
    items = emb["item"].to_pylist()
    kinds = emb["kind"].to_pylist()
    vecs = np.asarray(emb["vec"].to_pylist(), dtype=np.float32)
    words = [it for it, k in zip(items, kinds) if k == "word"]
    wmat = vecs[[i for i, k in enumerate(kinds) if k == "word"]]

    dv = doc_embeddings(
        _docs(sf_dir).select_columns(["doc_id", "text"]), words, wmat
    ).materialize()  # two consumers: the query rows and the corpus scan

    def first5(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids < 5))

    qt = pa.concat_tables(
        pa.table(b)
        for b in dv.map_batches(first5, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    queries = np.asarray(qt["embedding"].to_pylist(), dtype=np.float64)
    out = brute_topk(dv, queries, k=10, id_col="doc_id")
    return out.rename_columns(["query_id", "rank", "doc_id"])


def _doc_semantic_sql(k: int = 10, nq: int = 5) -> str:
    """DuckDB replica of _q_doc_semantic_topk: per-doc mean word vector
    over the fixture vocabulary (avg over token OCCURRENCES — the
    ContextEmbedder rule), cosine num/(|q|·|d|) with zero-norm → 0,
    rank by (cos DESC, doc_id)."""
    wvec, _ = _vec_values_sql()
    return f"""WITH wvec(item, dim, x) AS (VALUES {wvec}),
dtok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
dv AS MATERIALIZED (
  SELECT d.doc_id, w.dim, avg(w.x) AS x
  FROM dtok d JOIN wvec w ON w.item = d.t
  GROUP BY d.doc_id, w.dim),
dn AS MATERIALIZED (SELECT doc_id, sqrt(sum(x*x)) AS nn FROM dv GROUP BY doc_id),
nm AS MATERIALIZED (
  SELECT a.doc_id AS qid, b.doc_id AS did, sum(a.x * b.x) AS num
  FROM dv a JOIN dv b USING (dim)
  WHERE a.doc_id < {nq}
  GROUP BY a.doc_id, b.doc_id),
scored AS (
  SELECT q.doc_id AS qid, c.doc_id AS did,
         CASE WHEN n.num IS NOT NULL
               AND coalesce(qn.nn, 0) * coalesce(cn.nn, 0) > 0
              THEN n.num / (qn.nn * cn.nn) ELSE 0 END AS cos
  FROM (SELECT doc_id FROM documents WHERE doc_id < {nq}) q
  CROSS JOIN documents c
  LEFT JOIN nm n ON n.qid = q.doc_id AND n.did = c.doc_id
  LEFT JOIN dn qn ON qn.doc_id = q.doc_id
  LEFT JOIN dn cn ON cn.doc_id = c.doc_id)
SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, did AS doc_id
FROM (SELECT qid, did,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, did) AS rn
      FROM scored)
WHERE rn <= {k}"""


def _q_lsh_recall(sf_dir: str):
    """Dedup-quality evaluation: MinHash-LSH verified pairs counted
    against the EXACT shingle-Jaccard self-join (brute-force ground
    truth; the LSH set is a subset by construction). One row:
    (n_exact, n_lsh, recall_bp) with recall in integer basis points."""
    import pyarrow as pa

    from xlink_ray.stages.dedup import exact_jaccard_pairs, minhash_lsh_pairs

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    n_lsh = minhash_lsh_pairs(docs, jaccard_th=0.5).count()
    n_exact = exact_jaccard_pairs(
        docs, k=5, th_num=5000, th_den=10000, max_bucket=1_000_000
    ).count()
    return pa.table(
        {
            "n_exact": pa.array([n_exact], pa.int64()),
            "n_lsh": pa.array([n_lsh], pa.int64()),
            "recall_bp": pa.array(
                [(10000 * n_lsh) // max(n_exact, 1)], pa.int64()
            ),
        }
    )


def _q_minhash_pairs(sf_dir: str):
    from xlink_ray.stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir), jaccard_th=0.5).select_columns(
        ["id_a", "id_b", "jaccard_bp"]
    )


def _minhash_sql(
    num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
    th_num: int = 5000, th_den: int = 10000,
) -> str:
    """DuckDB replica of stages/dedup.minhash_lsh_pairs: md5-low64 %
    M61 shingle hashes, the same affine permutations (literals inlined
    from the same seeded generator), band-list equality candidates,
    exact shingle-Jaccard verification with the identical integer
    cross-multiply threshold."""
    from xlink_ray.stages.dedup import minhash_perm_params

    M = (1 << 61) - 1
    a, b = minhash_perm_params(num_perm)
    rows_per_band = num_perm // bands
    perm_rows = ",\n    ".join(
        f"({i}, {int(a[i])}::UBIGINT, {int(b[i])}::UBIGINT)" for i in range(num_perm)
    )
    return f"""WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(length(text) - {shingle_k - 1}, 1)),
    i -> ('0x' || substr(md5(substr(text, i, {shingle_k})), 1, 16))::UBIGINT % {M}
  )) AS hs
  FROM documents
),
perm(i, a, b) AS (SELECT * FROM (VALUES
    {perm_rows})),
mh AS (
  SELECT s.doc_id, p.i,
         min(CAST((CAST(p.a AS UHUGEINT) * CAST(u.h AS UHUGEINT)
                   + CAST(p.b AS UHUGEINT)) % {M} AS UBIGINT)) AS v
  FROM sh s, unnest(s.hs) AS u(h), perm p
  GROUP BY s.doc_id, p.i
),
bands AS (
  SELECT doc_id, i // {rows_per_band} AS band, list(v ORDER BY i) AS vals
  FROM mh GROUP BY doc_id, i // {rows_per_band}
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.vals = y.vals AND x.doc_id < y.doc_id
),
v AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(a.hs, b.hs)) AS inter,
         len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) AS un
  FROM cand c
  JOIN sh a ON c.id_a = a.doc_id
  JOIN sh b ON c.id_b = b.doc_id
)
SELECT id_a, id_b, CAST((10000 * inter) // un AS BIGINT) AS jaccard_bp
FROM v WHERE inter * {th_den} >= un * {th_num}"""


_SIMHASH_SIMS_CTE = r"""toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents
), th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks WHERE tok <> ''
), bitsum AS (
  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS b)
  GROUP BY doc_id, b
), sims AS (
  SELECT d.doc_id,
         COALESCE(SUM(CASE WHEN s > 0 THEN 1::UBIGINT << b ELSE 0::UBIGINT END), 0)::UBIGINT AS sh
  FROM documents d LEFT JOIN bitsum USING (doc_id)
  GROUP BY d.doc_id
)"""


def _simhash_sql(max_hamming: int = 3) -> str:
    """DuckDB replica of stages/dedup.simhash_pairs: md5-low64 token
    hashes, 64-bit majority-vote SimHash, all pairs at hamming <=
    max_hamming.  With chunks=4 bands the pigeonhole banding is
    lossless at max_hamming=3, so the plain pair predicate IS the
    banded pipeline's output."""
    return f"""WITH {_SIMHASH_SIMS_CTE}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}"""


def _neardup_sql(max_hamming: int = 3) -> str:
    """DuckDB replica of stages/dedup.neardup_clusters: the simhash
    pair predicate (see _simhash_sql — banding is lossless at
    max_hamming=3 with 4 chunks) closed transitively by a recursive
    CTE; canonical = min doc_id of the component."""
    return f"""WITH RECURSIVE {_SIMHASH_SIMS_CTE[:-2]}
), e AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sims a JOIN sims b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
), sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
SELECT u AS doc_id, CAST(min(v) AS BIGINT) AS canonical_id
FROM reach GROUP BY u"""


def _pii_sql() -> str:
    """DuckDB replica of stages/pii.pii_scrub, built from the same
    PII_PATTERNS list (both engines are RE2): counts taken on the
    progressively-scrubbed text, replacements nested in the same
    order."""
    from xlink_ray.stages.pii import PII_PATTERNS

    scrubbed = "text"
    count_cols = []
    for name, pat, token in PII_PATTERNS:
        count_cols.append(
            f"CAST(len(regexp_extract_all({scrubbed}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{token}', 'g')"
    return f"""SELECT doc_id, {scrubbed} AS text,
       {', '.join(count_cols)}
FROM documents"""


def _q_simhash_pairs(sf_dir: str):
    from xlink_ray.stages.dedup import simhash_pairs

    return simhash_pairs(_docs(sf_dir), max_hamming=3)


def _q_lang_id(sf_dir: str):
    from xlink_ray.stages.textstats import lang_id

    return lang_id(_docs(sf_dir))


def _q_fingerprints(sf_dir: str):
    from xlink_ray.stages.textstats import fingerprints

    return fingerprints(_docs(sf_dir))


def _q_doc_sample(sf_dir: str):
    """Deterministic md5-hash 10% sample of documents (resumable,
    partition/cluster-size independent — unlike random_sample)."""
    from xlink_ray.stages.curation import hash_sample

    return hash_sample(_docs(sf_dir), pct=10, mod=100)


def _q_weighted_sample(sf_dir: str):
    """Deterministic weight-proportional sample without replacement
    (Efraimidis–Spirakis A-ES keys from md5-uniform ids, weight =
    n_chars): k-bounded per-batch partials, driver merges ≤ k·nblocks
    rows. Same rerun/partitioning stability as hash_sample, with
    weights."""
    from xlink_ray.stages.curation import weighted_sample

    return weighted_sample(
        _docs(sf_dir).select_columns(["doc_id", "n_chars"]), k=50,
        weight_col="n_chars",
    )


def _q_weighted_sample_by_lang(sf_dir: str):
    """Per-stratum A-ES weighted sampling (the mixture-building shape:
    a weight-proportional, rerun-stable top-k per language)."""
    from xlink_ray.stages.curation import grouped_weighted_sample

    return grouped_weighted_sample(
        _docs(sf_dir).select_columns(["doc_id", "lang", "n_chars"]),
        k=10, weight_col="n_chars", strat_col="lang",
    )


def _q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail perplexity terciles (Wenzek et al. 2020)
    under the corpus's own unigram LM: per-token log-probs quantized to
    the int 1e-6 grid so scores, ranks and bucket labels are
    bit-stable; ranking via the value-range bucketed global_rank."""
    from xlink_ray.stages.textstats import ccnet_buckets

    return ccnet_buckets(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_gopher_filter(sf_dir: str):
    """Gopher quality-rule bundle (Rae et al. 2021 Table A1): word
    count, mean word length, alpha-word fraction, stop-word floor and
    bigram-repetition cap — all as integer cross-multiplies,
    zero-shuffle."""
    from xlink_ray.stages.textstats import gopher_filter

    return gopher_filter(
        _docs(sf_dir).select_columns(["doc_id", "text"])
    )


def _q_meta_blocking(sf_dir: str):
    """Meta-blocking (Papadakis et al. 2014): four redundancy-positive
    blocking schemes per customer → ECBS-weighted pair graph → WEP
    pruning (keep edges strictly above the global mean, exact integer
    cross-multiply). One heavy block exchange, pair-proportional after."""
    from xlink_ray.pipelines.er import customer_meta_blocking

    return customer_meta_blocking(sf_dir)


def _q_meta_blocking_cnp(sf_dir: str):
    """Cardinality-node pruning over the same ECBS block graph: every
    record keeps its 3 strongest neighbors (union over endpoints) — a
    per-record comparison budget instead of a global threshold."""
    from xlink_ray.pipelines.er import customer_meta_blocking_cnp

    return customer_meta_blocking_cnp(sf_dir, k=3)


def _q_er_pairs_meta(sf_dir: str):
    """Meta-blocking feeding the north-star scorer: WEP-pruned
    candidate pairs scored with Jaro-Winkler (names attached
    reduce-side, scoring pair-axis vectorized)."""
    from xlink_ray.pipelines.er import customer_meta_scored

    return customer_meta_scored(sf_dir)


def _q_er_clusters_meta(sf_dir: str):
    """End-to-end meta-blocked ER: WEP-pruned ECBS candidate graph →
    transitive closure → (member_id, cluster_id); all customers
    appear, non-candidates as singletons."""
    from xlink_ray.pipelines.er import customer_clusters_meta

    return customer_clusters_meta(sf_dir)


def _q_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    bucket models of target (lang='en') vs raw, per-doc log ratio as an
    exact int64 1e-9-grid dot product. One sketch-reduce pass to fit,
    one zero-shuffle pass to score."""
    from xlink_ray.stages.dsir import bucket_llr_e9, dsir_weights, ngram_bucket_counts

    docs = _docs(sf_dir).select_columns(["doc_id", "text", "lang"])
    raw, tgt = ngram_bucket_counts(
        docs, n_buckets=512, target_col="lang", target_val="en"
    )
    return dsir_weights(docs, bucket_llr_e9(tgt, raw))


def _q_dsir_sample(sf_dir: str):
    """DSIR selection: Gumbel-top-k over the importance weights
    (sampling without replacement ∝ exp(log weight), deterministic in
    the doc id) — k-bounded tree merge."""
    import ray.data as rd

    from xlink_ray.stages.dsir import dsir_select

    return dsir_select(
        _docs(sf_dir).select_columns(["doc_id", "text", "lang"]),
        k=50,
        n_buckets=512,
    )


def _q_decontamination(sf_dir: str):
    """Benchmark decontamination: flag docs sharing any word-8-gram
    with the 32-doc benchmark set (smallest id hashes); benchmark grams
    broadcast once, corpus streams — no shuffle."""
    from xlink_ray.stages.curation import decontaminate

    return decontaminate(_docs(sf_dir), k=8, n_bench=32)


def _q_cluster_f1(sf_dir: str):
    """Pairwise precision/recall/F1 between two clusterings — the
    north rule's grading metric as a distributed operator
    (stages/clustering.py pairwise_cluster_f1): JW-threshold clusters
    scored against the Levenshtein-rule clusters; tp = contingency-cell
    pair sums, no pair set materialized."""
    from xlink_ray.pipelines import er
    from xlink_ray.stages.clustering import connected_components, pairwise_cluster_f1

    pred = connected_components(
        er.customer_pairs_jw(sf_dir),
        nodes=er._customers(sf_dir),
        node_col="c_custkey",
    )
    return pairwise_cluster_f1(pred, er.customer_clusters(sf_dir))


def _q_er_ari(sf_dir: str):
    """Adjusted Rand Index between the JW-threshold clustering and the
    Levenshtein-rule clustering (stages/clustering.py:
    adjusted_rand_index) — chance-corrected agreement from the same
    never-materialized contingency sums as cluster_f1, exact integer
    rational quantized to ppm by trunc division (DuckDB `//`)."""
    from xlink_ray.pipelines import er
    from xlink_ray.stages.clustering import adjusted_rand_index, connected_components

    pred = connected_components(
        er.customer_pairs_jw(sf_dir),
        nodes=er._customers(sf_dir),
        node_col="c_custkey",
    )
    return adjusted_rand_index(pred, er.customer_clusters(sf_dir))


def _q_er_vmeasure(sf_dir: str):
    """V-measure between the JW and Levenshtein clusterings
    (stages/clustering.py:cluster_vmeasure): homogeneity /
    completeness / harmonic mean from quantized-log integer entropy
    aggregates — order-free sums, single-division ratios."""
    from xlink_ray.pipelines import er
    from xlink_ray.stages.clustering import cluster_vmeasure, connected_components

    pred = connected_components(
        er.customer_pairs_jw(sf_dir),
        nodes=er._customers(sf_dir),
        node_col="c_custkey",
    )
    return cluster_vmeasure(pred, er.customer_clusters(sf_dir))


def _q_blocking_quality(sf_dir: str):
    """Blocking-scheme validation (stages/blocking.py blocking_quality):
    reduction ratio + pairs completeness of the nation-key blocker
    against the UNBLOCKED all-pairs truth (run on samples at scale) —
    exact ppm integers."""
    from xlink_ray.functions.similarity import levenshtein_pairs
    from xlink_ray.pipelines.er import _customers
    from xlink_ray.stages.blocking import blocking_quality

    return blocking_quality(
        _customers(sf_dir),
        key_cols="c_nationkey",
        id_col="c_custkey",
        attr_col="c_name",
        scorer=lambda A, B: levenshtein_pairs(A, B, max_dist=1),
        keep=lambda s: s <= 1,
    )


def _q_table_profile(sf_dir: str):
    """Column profiling (stages/validate.py profile_columns): rows /
    nulls / exact distincts / min-max per column of orders — local
    stats as per-batch partials, distincts via one hash-bucket shuffle
    per column (keys never collected)."""
    import ray.data as rd

    from xlink_ray.stages.validate import profile_columns

    orders = read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderstatus"]
    )
    return profile_columns(orders, int_cols=["o_orderkey", "o_custkey"], str_cols=["o_orderstatus"])


def _q_constraint_violations(sf_dir: str):
    """Data-quality gate (stages/validate.py check_constraints): null /
    length / key-uniqueness violation counts — row-local rules fold to
    per-batch partials; uniqueness is one hash-bucket shuffle."""
    import ray.data as rd

    from xlink_ray.stages.validate import check_constraints

    docs = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    return check_constraints(
        docs, not_null=["text", "lang"], unique=["doc_id"], max_len={"text": 2000}
    )


def _q_corpus_diff(sf_dir: str):
    """Recrawl delta (stages/curation.py corpus_diff): documents vs a
    deterministically perturbed 'recrawl' (every 97th doc changed,
    every 101st dropped, every 103rd cloned under a new id) → (doc_id,
    status); one id shuffle moving 16-byte digests, not texts."""
    import numpy as np
    import pyarrow as pa

    from xlink_ray.stages.curation import corpus_diff

    old = _docs(sf_dir)

    def perturb(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        keep = ids % 101 != 0
        out_ids = list(ids[keep])
        out_txt = [
            txt + " v2" if i % 97 == 0 else txt
            for i, txt in zip(ids[keep].tolist(), [texts[j] for j in np.flatnonzero(keep)])
        ]
        for i, txt in zip(ids.tolist(), texts):
            if i % 103 == 0:
                out_ids.append(i + 1_000_000)
                out_txt.append("new doc " + str(i))
        return pa.table(
            {"doc_id": pa.array(out_ids, pa.int64()), "text": pa.array(out_txt, pa.string())}
        )

    new = _docs(sf_dir).map_batches(perturb, batch_format="pyarrow")
    return corpus_diff(old, new)


def _q_cms_counts(sf_dir: str):
    """Count-Min point-frequency estimates (stages/sketch.py
    count_min_sketch, 3x1024 int64): per-batch matrix partials summed —
    token frequencies in 24 KB with no vocabulary shuffle.  Probe set =
    distinct tokens of the 4 smallest-hash docs; all-int estimates are
    exactly replicated by the cell-sum SQL."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xlink_ray.stages.curation import _benchmark_rows
    from xlink_ray.stages.sketch import cms_estimates, count_min_sketch

    docs = _docs(sf_dir)
    mat = count_min_sketch(docs, w=1024, d=3)
    bt = _benchmark_rows(docs, 4, text_col="text")
    toks = sorted({t for txt in bt["text"].to_pylist() for t in txt.split(" ")})
    est = cms_estimates(mat, toks)
    return rd.from_arrow(
        pa.table({"token": pa.array(toks, pa.string()), "cms_count": pa.array(est, pa.int64())})
    )


def _q_bloom_flags(sf_dir: str):
    """Bloom-filter decontamination (stages/curation.py
    bloom_decontaminate): the benchmark gram set folds into a 65536-bit
    filter via per-batch bitmap OR-reduce (constant size regardless of
    suite size); flagged is a deterministic superset of `contaminated`
    — salted-md5 positions replicated exactly in SQL."""
    from xlink_ray.stages.curation import bloom_decontaminate

    return bloom_decontaminate(_docs(sf_dir), k=8, n_bench=32)


def _q_doc_sample_stratified(sf_dir: str):
    """Per-language deterministic downsampling rates in one pass."""
    from xlink_ray.stages.curation import stratified_hash_sample

    return stratified_hash_sample(
        _docs(sf_dir), rates={"en": 20, "de": 10, "es": 5}, default_pct=50
    )


def _q_top_docs_per_lang(sf_dir: str):
    """Grouped top-k: 3 longest docs per language (ties → smallest
    doc_id); per-batch trim before the shuffle."""
    from xlink_ray.stages.stats import group_topk

    return group_topk(
        _docs(sf_dir),
        group_col="lang",
        order_col="n_chars",
        k=3,
        tie_col="doc_id",
        columns=["lang", "n_chars", "doc_id"],
    )


def _q_length_quantiles(sf_dir: str):
    """Exact per-language n_chars quantiles via a distributed
    (lang, value) histogram — value-cardinality-sized, never a sort of
    the corpus."""
    from xlink_ray.stages.stats import grouped_quantiles

    return grouped_quantiles(_docs(sf_dir), "lang", "n_chars", qs=(0.5, 0.9, 0.99))


def _q_curated_corpus(sf_dir: str):
    """End-to-end corpus curation: exact dedup → language filter →
    quality floor → benchmark decontamination → deterministic sample,
    each stage independently oracled, the composition oracled too."""
    from xlink_ray.pipelines.curate import curated_corpus

    return curated_corpus(sf_dir)


def _q_media_features(sf_dir: str):
    """Multimodal feature plumbing over binary media columns
    (rows-only: the decode/feature kernels — resize, FFT — are not
    SQL-expressible; schema/batch plumbing is what this checks)."""
    import ray.data as rd

    from xlink_ray.stages.multimodal import media_features, synth_media

    return media_features(rd.from_arrow(synth_media())).select_columns(
        ["media_id", "media_type"]
    )


def _q_media_features_raw(sf_dir: str):
    """REAL codec-free decode path: uncompressed RGB payloads →
    bilinear resize to 16x16 → mean/std/luma-histogram features
    (stages/multimodal.py backend='raw'). The (media_id, media_type)
    projection is SQL-oracled against the closed-form fixture — the
    chain must decode/resize/extract every row to emit it; the float
    feature values themselves are not SQL-expressible and are excluded
    by the projection (media_features keeps them, rows-only)."""
    import ray.data as rd

    from xlink_ray.stages.multimodal import media_features, resize_images, synth_media_raw

    small = resize_images(rd.from_arrow(synth_media_raw(64)), 16, 16, backend="raw")
    return media_features(small, backend="raw").select_columns(["media_id", "media_type"])


def _q_media_phash(sf_dir: str):
    """Integer-exact perceptual average hash over the raw RGB fixture
    (stages/multimodal.py:image_ahash): milli-luma block sums, mean
    comparison by cross-multiply — bit-stable. SQL-oracled: the raw
    payloads are closed-form integer gradients, so the oracle computes
    every pixel from (w, h, base) literals."""
    import ray.data as rd

    from xlink_ray.stages.multimodal import image_ahash, synth_media_raw

    return image_ahash(rd.from_arrow(synth_media_raw()))


def _q_media_phash_pairs(sf_dir: str):
    """Near-duplicate images by perceptual-hash Hamming distance ≤ 3
    (stages/multimodal.py:phash_dup_pairs): SimHash-style band blocking
    (pigeonhole-complete recall), in-group verify, pair-keyed dedupe."""
    import ray.data as rd

    from xlink_ray.stages.multimodal import (
        image_ahash,
        phash_dup_pairs,
        synth_media_raw,
    )

    return phash_dup_pairs(
        image_ahash(rd.from_arrow(synth_media_raw())).materialize()
    )


def _phash_sql(final: str = "hashes", grid: int = 4, max_hamming: int = 3) -> str:
    """Oracle for the aHash family: the raw fixture's image payloads
    are integer gradient arrays whose only free parameter is the
    per-image base offset = payload byte 0, so (media_id, w, h, base)
    literals + closed-form pixel expressions replay every luma."""
    from xlink_ray.stages.multimodal import synth_media_raw

    rows = [
        r for r in synth_media_raw().to_pylist() if r["media_type"] == "image"
    ]
    vals = ", ".join(
        f"({r['media_id']}, {r['width']}, {r['height']}, {r['payload'][0]})"
        for r in rows
    )
    g = grid
    base = f"""
WITH imgs(media_id, w, h, base) AS (VALUES {vals}),
xs AS (SELECT generate_series AS x FROM generate_series(0, 47)),
ys AS (SELECT generate_series AS y FROM generate_series(0, 35)),
px AS (SELECT i.media_id, i.w, i.h, x.x, y.y,
  299*((x.x*255//(i.w-1) + i.base) % 256)
 + 587*((y.y*255//(i.h-1) + i.base) % 256)
 + 114*(((x.x+y.y)*255//(i.w+i.h-2) + i.base) % 256) AS luma
 FROM imgs i, xs x, ys y WHERE x.x < i.w AND y.y < i.h),
blocks AS (SELECT media_id, w, h, y // (h//{g}) AS gy, x // (w//{g}) AS gx,
  sum(luma) AS bs FROM px GROUP BY 1, 2, 3, 4, 5),
tot AS (SELECT media_id, sum(luma) AS ts FROM px GROUP BY 1),
bits AS (SELECT b.media_id,
  CASE WHEN b.bs * (b.w*b.h) >= t.ts * ((b.w//{g})*(b.h//{g}))
       THEN (CAST(1 AS BIGINT) << (b.gy*{g} + b.gx)) ELSE 0 END AS bit
 FROM blocks b JOIN tot t USING (media_id)),
hashes AS (SELECT media_id, CAST(sum(bit) AS BIGINT) AS phash
           FROM bits GROUP BY media_id)"""
    if final == "hashes":
        return base + "\nSELECT media_id, phash FROM hashes"
    return (
        base
        + f"""
SELECT a.media_id AS id_a, b.media_id AS id_b,
  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}"""
    )


def _q_media_frames(sf_dir: str):
    """Video frame sampling plumbing (decode slot stubbed; expansion
    and schema real). SQL-oracled: the synth media table's ids,
    types and durations are closed-form in the row index, so the
    frame expansion is pure range arithmetic."""
    import ray.data as rd

    from xlink_ray.stages.multimodal import sample_frames, synth_media

    return sample_frames(rd.from_arrow(synth_media())).select_columns(
        ["media_id", "frame_idx", "t_ms"]
    )


def _q_pricing_summary(sf_dir: str):
    from xlink_ray.pipelines import relational

    return relational.pricing_summary(sf_dir)


def _q_nation_revenue(sf_dir: str):
    from xlink_ray.pipelines import relational

    return relational.nation_revenue(sf_dir)


def _q_top_parts(sf_dir: str):
    from xlink_ray.pipelines import relational

    return relational.top_parts(sf_dir)


def _q_mktsegments(sf_dir: str):
    from xlink_ray.pipelines import relational

    return relational.mktsegments(sf_dir)


def _q_customers_without_orders(sf_dir: str):
    from xlink_ray.pipelines import relational

    return relational.customers_without_orders(sf_dir)


def _q_segment_pivot(sf_dir: str):
    """Long→wide pivot (pipelines/relational.pivot_counts): customers
    per (nation, mktsegment) with segments as columns; partial collapse
    + one groupby; wide assembly is dimension-bounded driver work."""
    from xlink_ray.pipelines import relational

    return relational.segment_pivot(sf_dir)


def _q_revenue_rollup(sf_dir: str):
    """Multi-level ROLLUP revenue (pipelines/relational.py): one
    distributed finest-level groupby; coarser levels re-aggregated
    from the dimension-bounded finest result."""
    from xlink_ray.pipelines import relational

    return relational.revenue_rollup(sf_dir)


def _q_vocab_counts(sf_dir: str):
    from xlink_ray.pipelines import relational

    return relational.vocab_counts(sf_dir)


def _q_window_agg(sf_dir: str):
    import ray.data as rd

    from xlink_ray.stages.windows import tumbling_window_agg

    return tumbling_window_agg(read_pq(f"{sf_dir}/events.parquet"))


def _q_sessions(sf_dir: str):
    import ray.data as rd

    from xlink_ray.stages.windows import sessionize

    return sessionize(read_pq(f"{sf_dir}/events.parquet"))


def _q_hopping_agg(sf_dir: str):
    import ray.data as rd

    from xlink_ray.stages.windows import hopping_window_agg

    return hopping_window_agg(
        read_pq(f"{sf_dir}/events.parquet"), size_minutes=60, hop_minutes=15
    )


BM25_QUERIES = {1: ["hash", "join"], 2: ["customer", "filter", "scan"], 3: ["window", "sort"]}


def _q_heavy_hitters(sf_dir: str):
    """Exact heavy hitters (n·512 ≥ total tokens) via the
    candidate-then-verify sketch — no vocabulary shuffle."""
    import ray.data as rd

    from xlink_ray.stages.sketch import frequent_tokens

    return frequent_tokens(
        read_pq(f"{sf_dir}/documents.parquet", columns=["text"]), k=512
    )


def _q_curated_corpus_v2(sf_dir: str):
    """Round-2 curation composition: exact-substring dedup drop →
    repetition filter → unigram-LM floor, fused survivor pass."""
    from xlink_ray.pipelines.curate import curated_corpus_v2

    return curated_corpus_v2(sf_dir)


def _q_lm_scores(sf_dir: str):
    """Perplexity-style quality filter: mean token log-prob under the
    corpus's own MLE unigram LM (vocab built in one shuffle, broadcast)."""
    import ray.data as rd

    from xlink_ray.stages.textstats import unigram_lm_scores

    return unigram_lm_scores(
        read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )


def _q_shared_ngrams(sf_dir: str):
    """Exact-substring dedup at word-5-gram granularity: doc pairs
    sharing at least one window, with shared-window counts."""
    import ray.data as rd

    from xlink_ray.stages.dedup import shared_ngram_pairs

    return shared_ngram_pairs(
        read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        k=5,
    )


def _q_pmi_bigrams(sf_dir: str):
    """PMI collocations (phrase-detection preprocessing): bigram counts
    + broadcast unigram table, min_count=5."""
    import ray.data as rd

    from xlink_ray.stages.collocations import pmi_bigrams

    return pmi_bigrams(
        read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )


def _q_blocklist_stats(sf_dir: str):
    """Per-doc blocklist hit counts (the C4 bad-words curation gate):
    zero-shuffle scan, term automaton compiled once per worker."""
    from xlink_ray.stages.curation import blocklist_stats

    return blocklist_stats(
        read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        terms=["filter", "join", "scan"],
    )


def _q_bpe_merges(sf_dir: str):
    """Distributed BPE merge-rule training. SQL-oracled via an
    unrolled-iteration DuckDB replica (one CTE chain per merge round,
    wrapped-symbol ``replace`` = the leftmost-greedy merge kernel);
    also pinned against the sequential Sennrich reference in
    tests/test_bpe.py."""
    from xlink_ray.stages.bpe import bpe_merges

    return bpe_merges(
        read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        n_merges=10,
    )


def _q_bpe_token_counts(sf_dir: str):
    """Tokenizer train→apply loop closed: learn 10 BPE merge rules,
    then stream the corpus through one zero-shuffle encode pass
    (rules broadcast once, per-batch distinct-word reduction) →
    (doc_id, n_words, n_tokens). SQL-oracled: the replica recomputes
    the merge rules with the unrolled trainer CTEs and applies them in
    rank order over the corpus' distinct words; the encoder is also
    pinned against a sequential reference in tests/test_bpe.py."""
    from xlink_ray.stages.bpe import bpe_encode, bpe_merges

    docs = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    merges = bpe_merges(docs, n_merges=10)
    return bpe_encode(docs, merges)


def _q_containment_pairs(sf_dir: str):
    """Directional n-gram containment (quote/subset detection): the
    shared-gram pair skeleton plus one tagged-union bucket exchange
    stamping per-doc distinct-gram counts onto both pair directions."""
    from xlink_ray.stages.dedup import containment_pairs

    return containment_pairs(
        read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        k=5,
        tau_milli=200,
    )


def _q_copurchase_lift(sf_dir: str):
    """Frequent-itemset pair mining over order baskets: one group-key
    bucket exchange, per-length-class vectorized pair generation, one
    pair-key grouped sum; unary supports ride the same exchange under
    sentinel keys and broadcast once for the lift attach."""
    from xlink_ray.stages.itemsets import basket_pair_lift

    return basket_pair_lift(
        read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]),
        "l_orderkey",
        "l_partkey",
        min_support=2,
    )


def _q_bm25_scores(sf_dir: str):
    """BM25 (Lucene idf) scores for a fixed query set: two-pass
    broadcast pattern, corpus never shuffled."""
    import ray.data as rd

    from xlink_ray.stages.bm25 import bm25_scores

    return bm25_scores(
        read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        BM25_QUERIES,
    )


def _q_signup_conversion(sf_dir: str):
    """Keyed range join: per signup event, how many purchases the same
    user made in the following 24 hours."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from xlink_ray.stages.interval import interval_count_join

    ev = read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def signup_windows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "signup"))
        end = pc.add(
            pc.cast(t["ts"], pa.int64()), pa.scalar(24 * 3600 * 1_000_000, pa.int64())
        ).cast(pa.timestamp("us"))
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "w_end": end,
            }
        )

    def purchases(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["event_type"], "purchase")).select(
            ["user_id", "ts"]
        )

    return interval_count_join(
        ev.map_batches(signup_windows, batch_format="pyarrow"),
        ev.map_batches(purchases, batch_format="pyarrow"),
        key="user_id",
        start="ts",
        end="w_end",
        ts="ts",
        interval_cols=["event_id", "ts"],
        out_col="n_purchases",
    )


def _q_repetition_stats(sf_dir: str):
    """Gopher-style word/n-gram repetition features per document."""
    import ray.data as rd

    from xlink_ray.stages.textstats import repetition_stats

    return repetition_stats(
        read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )


def _q_purchase_attribution(sf_dir: str):
    """Backward as-of join: each purchase event attached to the user's
    most recent click at or before it (exact microsecond lag)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from xlink_ray.stages.asof import asof_join

    ev = read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )

    def keep(etype: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], etype)).drop_columns(
                ["event_type"]
            )

        return fn

    left = ev.map_batches(keep("purchase"), batch_format="pyarrow")
    right = ev.map_batches(keep("click"), batch_format="pyarrow")
    joined = asof_join(
        left,
        right,
        key="user_id",
        ts="ts",
        left_cols=["event_id", "value"],
        right_cols=["event_id"],
        suffix="_click",
    )

    def fmt(t: pa.Table) -> pa.Table:
        lag = pc.subtract(
            pc.cast(t["ts"], pa.int64()), pc.cast(t["ts_click"], pa.int64())
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "value": t["value"],
                "click_id": t["event_id_click"],
                "lag_us": lag,
            }
        )

    return joined.map_batches(fmt, batch_format="pyarrow")


def _q_neardup_clusters(sf_dir: str):
    """End-to-end near-dup dedup: simhash pairs → transitive closure →
    (doc_id, canonical_id); survivors are doc_id == canonical_id."""
    from xlink_ray.stages.dedup import neardup_clusters

    return neardup_clusters(_docs(sf_dir), max_hamming=3)


def _q_pii_scrub(sf_dir: str):
    """PII redaction: scrubbed text + per-pattern counts (emails /
    IPv4 / intl phones), one stateless vectorized RE2 pass."""
    from xlink_ray.stages.pii import pii_scrub

    return pii_scrub(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_packed_sequences(sf_dir: str):
    """Training-sequence packing via the distributed ordered
    prefix-sum: chunk assignment at 2048-token capacity."""
    from xlink_ray.stages.packing import pack_sequences

    return pack_sequences(
        _docs(sf_dir).select_columns(["doc_id", "text"]), capacity=2048
    )


def _q_packed_by_bpe(sf_dir: str):
    """Tokenizer-aware sequence packing: BPE-encode the corpus (10
    learned merges) and pack documents into 2048-REAL-token chunks via
    the distributed ordered prefix-sum — the packing a token-budgeted
    trainer actually needs."""
    from xlink_ray.stages.bpe import bpe_encode, bpe_merges
    from xlink_ray.stages.packing import pack_sequences

    docs = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    enc = bpe_encode(docs, bpe_merges(docs, n_merges=10))
    return pack_sequences(enc, capacity=2048, length_col="n_tokens")


def _bpe_pack_sql(n_merges: int = 10, capacity: int = 2048) -> str:
    """Window-cumsum packing replica over the BPE encode replica."""
    return f"""WITH base AS ({_bpe_encode_sql(n_merges)}),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM base
)
SELECT doc_id, n_tokens, CAST(start_tok AS BIGINT) AS start_tok,
       CAST(start_tok // {capacity} AS BIGINT) AS chunk_id
FROM c"""


def _q_embedding_neardup(sf_dir: str):
    """Semantic near-dup dedup: LSH-bucketed cosine pairs → transitive
    closure → (vec_id, canonical_id)."""
    import ray.data as rd

    from xlink_ray.stages.dedup import embedding_neardup_clusters

    return embedding_neardup_clusters(
        read_pq(f"{sf_dir}/embeddings.parquet"), th=0.35
    )


def _q_inverted_index(sf_dir: str):
    """Inverted-index build: token → df + doc_id-sorted posting string
    (one token shuffle; per-batch partial tf collapse)."""
    from xlink_ray.stages.index import inverted_index

    return inverted_index(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_cdc_chunks(sf_dir: str):
    """Content-defined chunking: rolling-hash boundary cuts +
    per-chunk Horner hashes (sub-document dedup unit)."""
    from xlink_ray.stages.chunking import cdc_chunks

    return cdc_chunks(
        _docs(sf_dir).select_columns(["doc_id", "text"]), k=4, modulus=16
    )


def _q_doc_ranks(sf_dir: str):
    """Exact global rank by (n_chars desc, doc_id) via the value-range
    bucketed scan — the distributed ORDER-BY primitive."""
    from xlink_ray.stages.stats import global_rank

    return global_rank(
        _docs(sf_dir).select_columns(["doc_id", "n_chars"]), "n_chars"
    )


def _q_pagerank(sf_dir: str):
    """Fixed-point PageRank over the customer–supplier purchase graph
    (stages/graph.py) — raw Ray tasks over co-partitioned bucket state
    (iterative fixed point; all-integer sums), bit-identical to the
    oracle's unrolled-iteration replica."""
    from xlink_ray.stages.graph import purchase_pagerank

    return purchase_pagerank(sf_dir)


def _q_purchase_hits(sf_dir: str):
    """Fixed-point HITS hubs/authorities (Kleinberg 1999) over the
    directed customer→supplier purchase graph — all-integer
    max-normalized updates on the bucket harness, bit-identical to the
    unrolled-CTE oracle."""
    from xlink_ray.stages.graph import purchase_hits

    return purchase_hits(sf_dir, iters=3)


def _hits_sql(iters: int = 3, scale: int = 10**6) -> str:
    """Unrolled-iteration DuckDB replica of stages/graph.hits_fixed
    over the directed purchase graph: same int64 max-normalization
    (v·scale // max) per half-step."""
    sql = [
        f"""WITH edges AS (
  SELECT DISTINCT 2*o.o_custkey AS src, 2*l.l_suppkey+1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
h0 AS (SELECT node, CAST({scale} AS BIGINT) AS v FROM nodes)"""
    ]
    for i in range(iters):
        sql.append(
            f""",
a{i+1}r AS (
  SELECT n.node, CAST(COALESCE(s.m, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(h.v) AS m
    FROM edges e JOIN h{i} h ON h.node = e.src GROUP BY e.dst) s USING (node)),
a{i+1} AS (
  SELECT node, CASE WHEN m.m > 0 THEN v * {scale} // m.m ELSE 0 END AS v
  FROM a{i+1}r, (SELECT max(v) AS m FROM a{i+1}r) m),
h{i+1}r AS (
  SELECT n.node, CAST(COALESCE(s.m, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, SUM(a.v) AS m
    FROM edges e JOIN a{i+1} a ON a.node = e.dst GROUP BY e.src) s USING (node)),
h{i+1} AS (
  SELECT node, CASE WHEN m.m > 0 THEN v * {scale} // m.m ELSE 0 END AS v
  FROM h{i+1}r, (SELECT max(v) AS m FROM h{i+1}r) m)"""
        )
    sql.append(
        f"""
SELECT a.node, a.v AS auth_fp, h.v AS hub_fp
FROM a{iters} a JOIN h{iters} h USING (node)"""
    )
    return "".join(sql)


def _q_purchase_kcore(sf_dir: str):
    """Synchronous k-core peeling over the purchase graph
    (stages/graph.py kcore_peel, k=10): fixed-round semantics so the
    unrolled-CTE oracle replicates exactly; monotone peeling lets the
    Ray side stop at the fixpoint."""
    from xlink_ray.stages.graph import purchase_kcore

    return purchase_kcore(sf_dir, k=10, rounds=12)


def _q_purchase_distances(sf_dir: str):
    """Level-synchronous BFS hops over the purchase graph from the
    smallest customer node (stages/graph.py bfs_distances): min-plus
    relax waves on the bucket harness, stops at the fixpoint."""
    from xlink_ray.stages.graph import purchase_distances

    return purchase_distances(sf_dir)


def _q_nil_clusters(sf_dir: str):
    """NIL-mention clustering (TAC-KBP NIL coreference;
    pipelines/flagship.py:nil_clusters): the linker's rejects at the
    0.5 review bar cluster by same surface + context cosine ≥ 0.8 via
    context-class star collapse + CC. member_id = docnum·10⁶+offset."""
    from xlink_ray.pipelines import flagship

    return flagship.nil_clusters(sf_dir)


def _q_nil_attach(sf_dir: str):
    """NIL clustering as a POST-FILTER over the standing linker scan
    (pipelines/flagship.py:nil_attach): the memoized _raw_scan is
    reused — no second corpus pass — and the two-stage salted
    context-class blocking removes the hot-surface assumption. Result
    is pinned identical to nil_clusters (same SQL oracle)."""
    from xlink_ray.pipelines import flagship

    nil = flagship.nil_mentions(sf_dir, believe_th=0.5)
    _, _, emb_ref = flagship._raw_scan(sf_dir, 1)
    return flagship.nil_attach(nil, emb_ref)


def _q_scd2_events(sf_dir: str):
    """Type-2 SCD history of each user's event_type attribute
    (stages/scd.py:scd2_intervals): consecutive equal values collapse
    to validity intervals — the gaps-and-islands collapse in one
    key-bucket shuffle + numpy run kernels."""
    from xlink_ray.stages.scd import scd2_intervals

    return scd2_intervals(
        read_pq(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
    )


def _q_signup_funnel(sf_dir: str):
    """Open-window ordered funnel signup → click → purchase per user
    (stages/scd.py:funnel_steps): step i = earliest matching event
    strictly after step i-1; one key-bucket shuffle, vectorized
    per-step searchsorted passes."""
    from xlink_ray.stages.scd import funnel_steps

    return funnel_steps(
        read_pq(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        ),
        steps=["signup", "click", "purchase"],
    )


def _q_debounced_events(sf_dir: str):
    """Windowed suppression (stages/scd.py:debounce_events): keep an
    event iff first of its (user, type) or ≥ 24 h after the previous
    one — the lag rule, one vectorized diff per bucket."""
    from xlink_ray.stages.scd import debounce_events

    return debounce_events(
        read_pq(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        ),
        min_gap_us=86_400_000_000,  # 24 h
    )


def _q_weekly_retention(sf_dir: str):
    """Cohort retention matrix (stages/scd.py:weekly_retention):
    first-activity-week cohorts × active-week offsets, Monday-start
    integer epoch-weeks — user ids never leave their bucket."""
    from xlink_ray.stages.scd import weekly_retention

    return weekly_retention(
        read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    )


def _q_purchase_sssp(sf_dir: str):
    """Weighted SSSP (Bellman-Ford min-plus waves on the bucket
    harness; stages/graph.py:sssp_distances): cheapest purchase-path
    cost in integer cents from the smallest customer, edge weight =
    the cheapest lineitem price connecting the pair. Fixed 16 relax
    waves — early convergence equals the same fixed-round replica."""
    from xlink_ray.stages.graph import purchase_sssp

    return purchase_sssp(sf_dir)


def _sssp_sql(rounds: int = 16) -> str:
    parts = [
        """eds AS (SELECT 2*o.o_custkey AS src, 2*l.l_suppkey+1 AS dst,
  CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT) AS w
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)""",
        "sym AS (SELECT src, dst, w FROM eds UNION ALL SELECT dst, src, w FROM eds)",
        "edges AS (SELECT src, dst, min(w) AS w FROM sym GROUP BY src, dst)",
        "seed AS (SELECT 2*min(o_custkey) AS node FROM orders)",
        "d0 AS (SELECT node, CAST(0 AS BIGINT) AS c FROM seed)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""d{i} AS (SELECT node, min(c) AS c FROM (
  SELECT node, c FROM d{i - 1}
  UNION ALL
  SELECT e.dst AS node, d.c + e.w AS c FROM d{i - 1} d JOIN edges e ON e.src = d.node
) GROUP BY node)"""
        )
    return (
        "WITH "
        + ",\n".join(p.replace(" AS (", " AS MATERIALIZED (", 1) for p in parts)
        + f"\nSELECT node, CAST(c AS BIGINT) AS cost FROM d{rounds}"
    )


def _q_purchase_ppr(sf_dir: str):
    """Personalized PageRank (random walk with restart to the two
    smallest customer nodes — the standard entity-relatedness measure;
    stages/graph.py:pagerank_personalized): teleport mass restricted
    to the seed set, int64 fixed point on the bucket harness."""
    import pyarrow as pa

    from xlink_ray.stages.graph import purchase_ppr

    return purchase_ppr(sf_dir).map_batches(
        lambda t: pa.table({"node": t["node"], "ppr_fp": t["r"]}),
        batch_format="pyarrow",
    )


def _q_weighted_pagerank(sf_dir: str):
    """Weighted fixed-point PageRank over the symmetrized co-supply
    graph (stages/graph.py pagerank_weighted): contribution =
    rank * w // strength, all int64 — bit-identical to the oracle's
    unrolled replica on any partitioning."""
    from xlink_ray.stages.graph import cosupply_pagerank

    return cosupply_pagerank(sf_dir)


def _q_cosupply_edges(sf_dir: str):
    """Bipartite projection (stages/graph.py bipartite_project):
    lineitem's (order, supplier) → weighted supplier co-occurrence
    edges; pair gen per key + one pair-hash weight shuffle."""
    from xlink_ray.stages.graph import cosupply_edges

    return cosupply_edges(sf_dir)


def _q_purchase_walks(sf_dir: str):
    """Deterministic DeepWalk-style walks over the purchase graph
    (stages/graph.py graph_walks): neighbor rank chosen by a
    SQL-stable md5 of (start, cur, step) — reproducible on any
    partitioning; raw-task bucket routing per step."""
    from xlink_ray.stages.graph import purchase_walks

    return purchase_walks(sf_dir)


def _q_stripped_corpus(sf_dir: str):
    """Inter-document duplicate-span REMOVAL (stages/substring.py
    strip_dup_spans, Lee et al. 2022's dedup transform): redundant
    5-gram occurrences (a lower doc_id holds the same gram) are
    interval-stamped out of the text; the minimal doc keeps its copy."""
    import ray.data as rd

    from xlink_ray.stages.substring import strip_dup_spans

    docs = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return strip_dup_spans(docs, k=5)


def _q_supplier_triangles(sf_dir: str):
    """Exact per-node triangle counts of the supplier co-supply graph
    (stages/graph.py triangle_counts): degree-ordered orientation
    bounds every out-neighborhood at O(sqrt(m)); six bucket shuffles,
    vectorized kernels, no driver state."""
    from xlink_ray.stages.graph import cosupply_triangles

    return cosupply_triangles(sf_dir)


def _q_hll_tokens(sf_dir: str):
    """HyperLogLog register state over the corpus token stream
    (stages/sketch.py hll_registers, p=6): per-batch partial collapse
    to ≤64 rows, one tiny groupby — approximate distinct counting
    without a vocabulary shuffle.  All-int registers, exact compare."""
    import ray.data as rd

    from xlink_ray.stages.sketch import hll_registers

    docs = read_pq(f"{sf_dir}/documents.parquet", columns=["text"])
    return hll_registers(docs, p=6)


def _q_hll_by_lang(sf_dir: str):
    """Grouped HyperLogLog (stages/sketch.py hll_registers_by): one
    distinct-token sketch per language — per-batch register-max
    collapse, one tiny (lang, register) groupby."""
    import ray.data as rd

    from xlink_ray.stages.sketch import hll_registers_by

    docs = read_pq(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    return hll_registers_by(docs, "lang", p=6)


def _q_communities(sf_dir: str):
    """Synchronous label propagation over the purchase graph
    (stages/graph.py label_prop) — same raw-task bucket harness as
    pagerank; majority vote with smallest-label tie-break, matching
    the oracle's unrolled-iteration replica exactly."""
    from xlink_ray.stages.graph import purchase_communities

    return purchase_communities(sf_dir)


def _q_dup_ngrams(sf_dir: str):
    """Inter-document duplicate 5-gram coverage per document
    (stages/substring.py, Lee et al. 2022 exact-substring statistic):
    gram occurrences → dup detection on one hash shuffle → per-doc
    interval-union coverage on a second."""
    import ray.data as rd

    from xlink_ray.stages.substring import dup_ngram_coverage

    docs = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dup_ngram_coverage(docs, k=5)


def _pagerank_sql(iters: int = 5, scale: int = 10**12, dn: int = 85, dd: int = 100) -> str:
    """Unrolled-iteration DuckDB replica of stages/graph.pagerank_fixed
    over the purchase graph: same int64 fixed-point rules (floor
    division per edge and per damped sum), one CTE per iteration."""
    base = scale * (dd - dn) // dd
    sql = [
        f"""WITH eds AS (
  SELECT DISTINCT 2*o.o_custkey AS src, 2*l.l_suppkey+1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
edges AS (SELECT src, dst FROM eds UNION SELECT dst, src FROM eds),
deg AS (SELECT src, COUNT(*) AS c FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
pr0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes)"""
    ]
    for i in range(iters):
        sql.append(
            f""",
pr{i + 1} AS (
  SELECT n.node, CAST({base} + ({dn} * COALESCE(s.m, 0)) // {dd} AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(p.r // d.c) AS m
    FROM edges e JOIN deg d ON e.src = d.src JOIN pr{i} p ON p.node = e.src
    GROUP BY e.dst) s ON n.node = s.node)"""
        )
    sql.append(f"\nSELECT node, r AS pr_fp FROM pr{iters}")
    return "".join(sql)


def _ppr_sql(iters: int = 5, scale: int = 10**12, dn: int = 85, dd: int = 100) -> str:
    """Unrolled replica of stages/graph.pagerank_personalized over the
    purchase graph: teleport mass restricted to the two smallest
    customer nodes, same int64 fixed-point floor rules."""
    base = scale * (dd - dn) // dd
    sql = [
        f"""WITH eds AS (
  SELECT DISTINCT 2*o.o_custkey AS src, 2*l.l_suppkey+1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
edges AS (SELECT src, dst FROM eds UNION SELECT dst, src FROM eds),
deg AS (SELECT src, COUNT(*) AS c FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
seeds AS (SELECT 2*o_custkey AS node FROM
          (SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey LIMIT 2)),
pr0 AS (SELECT n.node,
        CAST(CASE WHEN s.node IS NOT NULL THEN {scale} ELSE 0 END AS BIGINT) AS r
        FROM nodes n LEFT JOIN seeds s ON s.node = n.node)"""
    ]
    for i in range(iters):
        sql.append(
            f""",
pr{i + 1} AS (
  SELECT n.node,
    CAST(CASE WHEN sd.node IS NOT NULL THEN {base} ELSE 0 END
         + ({dn} * COALESCE(s.m, 0)) // {dd} AS BIGINT) AS r
  FROM nodes n LEFT JOIN seeds sd ON sd.node = n.node
  LEFT JOIN (
    SELECT e.dst AS node, SUM(p.r // d.c) AS m
    FROM edges e JOIN deg d ON e.src = d.src JOIN pr{i} p ON p.node = e.src
    GROUP BY e.dst) s ON n.node = s.node)"""
        )
    sql.append(f"\nSELECT node, r AS ppr_fp FROM pr{iters}")
    return "".join(sql)


def _label_prop_sql(iters: int = 5) -> str:
    """Unrolled-iteration DuckDB replica of stages/graph.label_prop
    over the purchase graph: per round, each node takes the most
    frequent in-neighbor label (ties → smallest label), keeping its
    own label when it has no in-edges."""
    sql = [
        """WITH eds AS (
  SELECT DISTINCT 2*o.o_custkey AS src, 2*l.l_suppkey+1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
edges AS (SELECT src, dst FROM eds UNION SELECT dst, src FROM eds),
nodes AS (SELECT DISTINCT src AS node FROM edges),
lb0 AS (SELECT node, node AS label FROM nodes)"""
    ]
    for i in range(iters):
        sql.append(
            f""",
lb{i + 1} AS (
  SELECT p.node, COALESCE(w.label, p.label) AS label
  FROM lb{i} p LEFT JOIN (
    SELECT node, label FROM (
      SELECT e.dst AS node, l.label, COUNT(*) AS c,
             ROW_NUMBER() OVER (PARTITION BY e.dst ORDER BY COUNT(*) DESC, l.label ASC) AS rn
      FROM edges e JOIN lb{i} l ON l.node = e.src
      GROUP BY e.dst, l.label) WHERE rn = 1) w ON w.node = p.node)"""
        )
    sql.append(f"\nSELECT node, label FROM lb{iters}")
    return "".join(sql)


def _walks_sql(walk_len: int = 4) -> str:
    """DuckDB replica of stages/graph.graph_walks over the purchase
    graph: neighbor rank = md5-low64(start-cur-step) % degree over the
    ascending neighbor list — one chained join per step."""
    sql = [
        """WITH eds AS (
  SELECT DISTINCT 2*o.o_custkey AS src, 2*l.l_suppkey+1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
edges AS (SELECT src, dst FROM eds UNION SELECT dst, src FROM eds),
adj AS (SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS r,
               COUNT(*) OVER (PARTITION BY src) AS d
        FROM edges),
nodes AS (SELECT DISTINCT src AS node FROM edges)
SELECT n.node AS start"""
    ]
    for t in range(1, walk_len + 1):
        sql.append(f", a{t}.dst AS s{t}")
    sql.append("\nFROM nodes n")
    for t in range(1, walk_len + 1):
        cur = "n.node" if t == 1 else f"a{t - 1}.dst"
        sql.append(
            f"""
JOIN adj a{t} ON a{t}.src = {cur}
  AND a{t}.r = CAST(('0x' || substr(md5(n.node::VARCHAR || '-' || {cur}::VARCHAR || '-{t - 1}'), 1, 16))::UBIGINT
                    % CAST(a{t}.d AS UBIGINT) AS BIGINT)"""
        )
    return "".join(sql)


def _weighted_pagerank_sql(iters: int = 5, scale: int = 10**9, dn: int = 85, dd: int = 100) -> str:
    """Unrolled replica of stages/graph.pagerank_weighted over the
    symmetrized co-supply graph: contribution = r * w // strength."""
    base = scale * (dd - dn) // dd
    sql = [
        f"""WITH di AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
wed AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst, count(*) AS w
  FROM di a JOIN di b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY a.l_suppkey, b.l_suppkey),
edges AS (SELECT src, dst, w FROM wed UNION ALL SELECT dst, src, w FROM wed),
st AS (SELECT src, SUM(w) AS strength FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
pr0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes)"""
    ]
    for i in range(iters):
        sql.append(
            f""",
pr{i + 1} AS (
  SELECT n.node, CAST({base} + ({dn} * COALESCE(s.m, 0)) // {dd} AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(p.r * e.w // t.strength) AS m
    FROM edges e JOIN st t ON e.src = t.src JOIN pr{i} p ON p.node = e.src
    GROUP BY e.dst) s ON n.node = s.node)"""
        )
    sql.append(f"\nSELECT node, r AS pr_fp FROM pr{iters}")
    return "".join(sql)


def _kcore_sql(k: int = 10, rounds: int = 12) -> str:
    """Unrolled replica of stages/graph.kcore_peel over the purchase
    graph: each round keeps alive nodes with >= k alive neighbors."""
    sql = [
        """WITH eds AS MATERIALIZED (
  SELECT DISTINCT 2*o.o_custkey AS src, 2*l.l_suppkey+1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
edges AS MATERIALIZED (SELECT src, dst FROM eds UNION SELECT dst, src FROM eds),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
a0 AS (SELECT node FROM nodes)"""
    ]
    for i in range(rounds):
        sql.append(
            f""",
a{i + 1} AS MATERIALIZED (
  SELECT n.node FROM a{i} n
  JOIN edges e ON e.dst = n.node
  JOIN a{i} s ON s.node = e.src
  GROUP BY n.node HAVING COUNT(*) >= {k})"""
        )
    sql.append(
        f"""
SELECT n.node, n.node IN (SELECT node FROM a{rounds}) AS in_core FROM nodes n"""
    )
    return "".join(sql)


def _bpe_merge_ctes(n_merges: int = 10, min_pair: int = 2) -> "list[str]":
    """Unrolled-iteration DuckDB replica of stages/bpe.bpe_merges: the
    word vocabulary is symbolized as ``<s1><s2>...`` strings (symbols
    never contain ``<``/``>`` in this corpus — verified), each merge
    round counts adjacent pairs by exploding the symbol list, picks the
    best (max n, then lexicographically smallest pair) and applies it
    via ``replace('<a><b>' -> '<ab>')`` — leftmost non-overlapping
    replace is exactly the trainer's leftmost-greedy alternating rule
    because every occurrence match consumes both wrapped symbols. A
    round that runs dry (best pair below ``min_pair``) leaves b{i}
    empty and the LEFT JOIN keeps the vocab unchanged, matching the
    trainer's break."""
    parts = [
        """wc AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
v0 AS (SELECT regexp_replace(word, '(.)', '<\\1>', 'g') AS seq, n FROM wc)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"""p{i} AS (
  SELECT syms[i] AS s1, syms[i+1] AS s2, CAST(sum(n) AS BIGINT) AS n
  FROM (SELECT string_split(substr(seq, 2, length(seq)-2), '><') AS syms, n FROM v{i-1}) t,
       UNNEST(range(1, len(syms))) u(i)
  GROUP BY 1, 2
),
b{i} AS (
  SELECT CAST({i-1} AS BIGINT) AS rank, s1, s2, n FROM p{i}
  WHERE n >= {min_pair} ORDER BY n DESC, s1 ASC, s2 ASC LIMIT 1
),
v{i} AS (
  SELECT CASE WHEN b.s1 IS NULL THEN v.seq
         ELSE replace(v.seq, '<'||b.s1||'><'||b.s2||'>', '<'||b.s1||b.s2||'>') END AS seq, v.n
  FROM v{i-1} v LEFT JOIN b{i} b ON TRUE
)"""
        )
    return parts


def _bpe_merges_sql(n_merges: int = 10, min_pair: int = 2) -> str:
    parts = _bpe_merge_ctes(n_merges, min_pair)
    union = "\nUNION ALL\n".join(
        f'SELECT rank, s1 AS "left", s2 AS "right", s1||s2 AS merged, n FROM b{i}'
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union + "\nORDER BY rank"


def _bpe_encode_sql(n_merges: int = 10, min_pair: int = 2) -> str:
    """Replica of stages/bpe.bpe_encode composed over the learned merge
    rules: the corpus' DISTINCT words are symbolized once and every
    rule b{i} is applied in rank order (same wrapped-symbol replace as
    the trainer), then per-doc (n_words, n_tokens) come back through
    the word-count join — mirroring the encoder's unique-inverse
    reduction."""
    parts = _bpe_merge_ctes(n_merges, min_pair)
    parts.append(
        """dw AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY 1, 2
),
e0 AS (SELECT DISTINCT word, regexp_replace(word, '(.)', '<\\1>', 'g') AS seq FROM dw)"""
    )
    for i in range(1, n_merges + 1):
        parts.append(
            f"""e{i} AS (
  SELECT word, CASE WHEN b.s1 IS NULL THEN e.seq
         ELSE replace(e.seq, '<'||b.s1||'><'||b.s2||'>', '<'||b.s1||b.s2||'>') END AS seq
  FROM e{i-1} e LEFT JOIN b{i} b ON TRUE
)"""
        )
    parts.append(
        f"""tok AS (
  SELECT word, CAST(len(string_split(substr(seq, 2, length(seq)-2), '><')) AS BIGINT) AS nt
  FROM e{n_merges}
),
per_doc AS (
  SELECT dw.doc_id, CAST(sum(dw.c) AS BIGINT) AS n_words,
         CAST(sum(dw.c * tok.nt) AS BIGINT) AS n_tokens
  FROM dw JOIN tok USING (word) GROUP BY dw.doc_id
)"""
    )
    return (
        "WITH " + ",\n".join(parts) + """
SELECT d.doc_id, coalesce(p.n_words, 0) AS n_words, coalesce(p.n_tokens, 0) AS n_tokens
FROM documents d LEFT JOIN per_doc p USING (doc_id)"""
    )


def _bpe_fertility_sql(n_merges: int = 10) -> str:
    """Per-language fertility rollup over the encode replica — exact
    integer division, matching stages/bpe.bpe_fertility_by_lang."""
    return f"""WITH base AS ({_bpe_encode_sql(n_merges)})
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(b.n_words) AS BIGINT) AS n_words,
       CAST(sum(b.n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
       CAST((1000 * sum(b.n_tokens)) // sum(length(d.text)) AS BIGINT) AS tokens_per_1k_chars
FROM base b JOIN documents d USING (doc_id) GROUP BY d.lang"""


def _q_bpe_fertility(sf_dir: str):
    """Tokenizer fertility per language (tokens per 1k chars, exact
    integer division): the mixture-planning metric a token-budgeted
    data mix needs. One encode pass + a ≤nlangs-row aggregate."""
    from xlink_ray.stages.bpe import bpe_fertility_by_lang, bpe_merges

    docs = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    return bpe_fertility_by_lang(docs, bpe_merges(docs, n_merges=10))


def _q_winnow_fps(sf_dir: str):
    """Winnowing (MOSS) fingerprint selection: per doc, the
    rightmost-min gram hash of each w-window of word-k-gram hashes."""
    from xlink_ray.stages.winnow import winnow_fingerprints

    return winnow_fingerprints(
        _docs(sf_dir).select_columns(["doc_id", "text"]), k=4, w=5
    )


def _q_fidelity_links(sf_dir: str):
    """Reference-parity linker (P8-P10 exact semantics incl. quirks);
    embedding scoring not SQL-expressible → rows-only check."""
    from xlink_ray.pipelines import parity

    return parity.fidelity_links(sf_dir)


def _q_linking_eval(sf_dir: str):
    """Mention-parsing P/R + ED accuracy of the flagship linker vs the
    gold markup annotations (rows-only: predictions not in SQL)."""
    from xlink_ray.pipelines import dictbuild, flagship
    from xlink_ray.stages.evaluation import linking_eval

    pred = flagship.links(sf_dir).select_columns(
        ["doc_id", "offset", "mention", "entity_id"]
    )
    gold = dictbuild.mentions(sf_dir)
    return linking_eval(pred, gold)


def _q_candidate_histogram(sf_dir: str):
    from xlink_ray.pipelines import dictbuild

    return dictbuild.candidate_histogram(sf_dir)


def _q_joint_norms(sf_dir: str):
    """E2-E5 joint word/entity skip-gram trainer (smoke scale): per-vector
    norms after one iteration. Iterative SGD over a sharded parameter
    server — not SQL-expressible; rows-only by design."""
    from xlink_ray.pipelines.embedding import joint_embedding_norms

    return joint_embedding_norms(sf_dir)


def entry() -> Any:
    """Flagship: full pages→links→blocking→clusters ER pipeline at
    sf0.001 (north-star composition)."""
    from xlink_ray.pipelines import flagship

    return flagship.clusters(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "media_features_raw": _q_media_features_raw,
        "bpe_merges": _q_bpe_merges,
        "purchase_attribution": _q_purchase_attribution,
        "dsir_weights": _q_dsir_weights,
        "gopher_filter": _q_gopher_filter,
        "lsh_recall": _q_lsh_recall,
        "ann_ivf": _q_ann_ivf,
        "heavy_hitters": _q_heavy_hitters,
        "hopping_agg": _q_hopping_agg,
        "constraint_violations": _q_constraint_violations,
        "meta_blocking": _q_meta_blocking,
        "joint_norms": _q_joint_norms,
        "joint_invariants": _q_joint_invariants,
        "revenue_rollup": _q_revenue_rollup,
        "nil_clusters": _q_nil_clusters,
        "bm25_scores": _q_bm25_scores,
        "media_frames": _q_media_frames,
        "bpe_token_counts": _q_bpe_token_counts,
        "copurchase_lift": _q_copurchase_lift,
        "dsir_sample": _q_dsir_sample,
        "ccnet_buckets": _q_ccnet_buckets,
        "containment_pairs": _q_containment_pairs,
        "ann_pq": _q_ann_pq,
        "hll_tokens": _q_hll_tokens,
        "signup_conversion": _q_signup_conversion,
        "table_profile": _q_table_profile,
        "meta_blocking_cnp": _q_meta_blocking_cnp,
        "pca_variance": _q_pca_variance,
        "pca_invariants": _q_pca_invariants,
        "segment_pivot": _q_segment_pivot,
        "nil_attach": _q_nil_attach,
        "pmi_bigrams": _q_pmi_bigrams,
        "media_phash": _q_media_phash,
        "bpe_fertility": _q_bpe_fertility,
        "pagerank": _q_pagerank,
        "curated_corpus": _q_curated_corpus,
        "repetition_stats": _q_repetition_stats,
        "shared_ngrams": _q_shared_ngrams,
        "ann_rerank": _q_ann_rerank,
        "hll_by_lang": _q_hll_by_lang,
        "scd2_events": _q_scd2_events,
        "pii_scrub": _q_pii_scrub,
        "er_clusters_meta": _q_er_clusters_meta,
        "top_parts": _q_top_parts,
        "merged_anchors": _q_merged_anchors,
        "user_running_stats": _q_user_running_stats,
        "media_phash_pairs": _q_media_phash_pairs,
        "unigram_vocab": _q_unigram_vocab,
        "communities": _q_communities,
        "blocklist_stats": _q_blocklist_stats,
        "lm_scores": _q_lm_scores,
        "neardup_clusters": _q_neardup_clusters,
        "ann_ivfpq": _q_ann_ivfpq,
        "cms_counts": _q_cms_counts,
        "signup_funnel": _q_signup_funnel,
        "packed_sequences": _q_packed_sequences,
        "er_pairs_meta": _q_er_pairs_meta,
        "vocab_counts": _q_vocab_counts,
        "merged_link_prob": _q_merged_link_prob,
        "clean_paragraphs": _q_clean_paragraphs,
        "media_features": _q_media_features,
        "unigram_tokens": _q_unigram_tokens,
        "supplier_triangles": _q_supplier_triangles,
        "curated_corpus_v2": _q_curated_corpus_v2,
        "c4_filter": _q_c4_filter,
        "embedding_neardup": _q_embedding_neardup,
        "doc_semantic_topk": _q_doc_semantic_topk,
        "weekly_retention": _q_weekly_retention,
        "packed_by_bpe": _q_packed_by_bpe,
        "blocking_quality": _q_blocking_quality,
        "aida_eval": _q_aida_eval,
        "length_band_docs": _q_length_band_docs,
        "unigram_fertility": _q_unigram_fertility,
        "purchase_walks": _q_purchase_walks,
        "mixture_plan": _q_mixture_plan,
        "deduped_lines": _q_deduped_lines,
        "winnow_fps": _q_winnow_fps,
        "ann_topk": _q_ann_topk,
        "word_analogy": _q_word_analogy,
        "debounced_events": _q_debounced_events,
        "inverted_index": _q_inverted_index,
        "cluster_f1": _q_cluster_f1,
        "expanded_anchors": _q_expanded_anchors,
        "embedding_znorm": _q_embedding_znorm,
        "cosupply_edges": _q_cosupply_edges,
        "mixture_corpus": _q_mixture_corpus,
        "quality_stats": _q_quality_stats,
        "stripped_corpus": _q_stripped_corpus,
        "doc_ranks": _q_doc_ranks,
        "er_pairs_snm": _q_er_pairs_snm,
        "title_entities": _q_title_entities,
        "pair_features": _q_pair_features,
        "weighted_pagerank": _q_weighted_pagerank,
        "weighted_sample": _q_weighted_sample,
        "lang_id": _q_lang_id,
        "dup_ngrams": _q_dup_ngrams,
        "paragraph_dedup": _q_paragraph_dedup,
        "part_fuzzy_pairs": _q_part_fuzzy_pairs,
        "extract_text": _q_extract_text,
        "latest_events": _q_latest_events,
        "purchase_ppr": _q_purchase_ppr,
        "weighted_sample_by_lang": _q_weighted_sample_by_lang,
        "cdc_chunks": _q_cdc_chunks,
        "url_features": _q_url_features,
        "part_monge_pairs": _q_part_monge_pairs,
        "mention_anchors": _q_mention_anchors,
        "bigram_lm": _q_bigram_lm,
        "purchase_distances": _q_purchase_distances,
        "kmeans_sizes": _q_kmeans_sizes,
        "part_tfidf_pairs": _q_part_tfidf_pairs,
        "freq_m": _q_freq_m,
        "doc_keywords": _q_doc_keywords,
        "purchase_sssp": _q_purchase_sssp,
        "semantic_dedup": _q_semantic_dedup,
        "part_pprl_pairs": _q_part_pprl_pairs,
        "e_given_m": _q_e_given_m,
        "event_props": _q_event_props,
        "purchase_kcore": _q_purchase_kcore,
        "exact_dedup": _q_exact_dedup,
        "part_codes": _q_part_codes,
        "m_given_e": _q_m_given_e,
        "normalized_docs": _q_normalized_docs,
        "purchase_hits": _q_purchase_hits,
        "minhash_pairs": _q_minhash_pairs,
        "part_soundex": _q_part_soundex,
        "entity_prior": _q_entity_prior,
        "domain_stats": _q_domain_stats,
        "minhash_attach": _q_minhash_attach,
        "er_threshold_sweep": _q_er_threshold_sweep,
        "link_prob": _q_link_prob,
        "dataset_split": _q_dataset_split,
        "ppjoin_pairs": _q_ppjoin_pairs,
        "er_pairs": _q_er_pairs,
        "out_links": _q_out_links,
        "quantile_norm": _q_quantile_norm,
        "simhash_pairs": _q_simhash_pairs,
        "er_pairs_jw": _q_er_pairs_jw,
        "flagship_attach": _q_flagship_attach,
        "crawl_freshness": _q_crawl_freshness,
        "er_clusters": _q_er_clusters,
        "html_extract_text": _q_html_extract_text,
        "token_counts": _q_token_counts,
        "er_clusters_dist": _q_er_clusters_dist,
        "flagship_golden": _q_flagship_golden,
        "jaccard_partners": _q_jaccard_partners,
        "er_clusters_bucket": _q_er_clusters_bucket,
        "candidate_recall": _q_candidate_recall,
        "embedding_dup": _q_embedding_dup,
        "er_clusters_constrained": _q_er_clusters_constrained,
        "doc_mentions": _q_doc_mentions,
        "fingerprints": _q_fingerprints,
        "er_constrained_invariants": _q_er_constrained_invariants,
        "links": _q_links,
        "doc_sample": _q_doc_sample,
        "er_clusters_incremental": _q_er_clusters_incremental,
        "links_partitioned": _q_links_partitioned,
        "doc_sample_stratified": _q_doc_sample_stratified,
        "er_golden_incremental": _q_er_golden_incremental,
        "flagship_clusters": _q_flagship_clusters,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "er_attach": _q_er_attach,
        "fidelity_links": _q_fidelity_links,
        "fidelity_invariants": _q_fidelity_invariants,
        "length_quantiles": _q_length_quantiles,
        "fs_weights": _q_fs_weights,
        "linking_eval": _q_linking_eval,
        "decontamination": _q_decontamination,
        "fs_scores": _q_fs_scores,
        "candidate_histogram": _q_candidate_histogram,
        "bloom_flags": _q_bloom_flags,
        "fs_em_weights": _q_fs_em_weights,
        "corpus_diff": _q_corpus_diff,
        "fs_em_posteriors": _q_fs_em_posteriors,
        "pricing_summary": _q_pricing_summary,
        "er_clusters_em": _q_er_clusters_em,
        "nation_revenue": _q_nation_revenue,
        "er_ari": _q_er_ari,
        "mktsegments": _q_mktsegments,
        "er_vmeasure": _q_er_vmeasure,
        "customers_without_orders": _q_customers_without_orders,
        "er_one_to_one": _q_er_one_to_one,
        "window_agg": _q_window_agg,
        "er_hierarchy": _q_er_hierarchy,
        "sessions": _q_sessions,
        "er_golden": _q_er_golden,
        "er_cluster_metrics": _q_er_cluster_metrics,
        "er_alignment": _q_er_alignment,
        "er_pairs_multiblock": _q_er_pairs_multiblock,
        "er_pairs_composite": _q_er_pairs_composite,
        "er_pairs_qgram": _q_er_pairs_qgram,
        "er_bcubed": _q_er_bcubed,
        "fs_review_queue": _q_fs_review_queue,
        "er_exemplars": _q_er_exemplars,
    }


def oracle_sql() -> dict[str, str]:
    occ = _occ_cte()
    out = {
        "extract_text": "SELECT doc_id, text FROM documents",
        "mention_anchors": f"{occ} SELECT mention, entity_id, link_count FROM ma",
        "freq_m": f"""WITH {_alias_values_sql()}
SELECT a.mention,
       CAST(sum((length(d.text) - length(replace(d.text, a.mention, ''))) / length(a.mention)) AS BIGINT) AS freq
FROM documents d CROSS JOIN (SELECT DISTINCT mention FROM alias) a
GROUP BY a.mention
HAVING sum((length(d.text) - length(replace(d.text, a.mention, ''))) / length(a.mention)) > 0""",
        "e_given_m": f"""{occ}
SELECT mention, entity_id,
       CAST(link_count AS DOUBLE) / sum(link_count) OVER (PARTITION BY mention) AS e_given_m
FROM ma""",
        "m_given_e": f"""{occ}
SELECT entity_id, mention,
       CAST(link_count AS DOUBLE) / sum(link_count) OVER (PARTITION BY entity_id) AS prob
FROM ma""",
        "entity_prior": f"""{occ}
SELECT entity_id,
       CAST(sum(link_count) AS DOUBLE) / (SELECT sum(link_count) FROM ma) AS prior
FROM ma GROUP BY entity_id""",
        "link_prob": f"""{occ},
link_m AS (SELECT mention, CAST(sum(link_count) AS BIGINT) AS link_m FROM ma GROUP BY mention),
fm AS (
  SELECT a.mention,
         CAST(sum((length(d.text) - length(replace(d.text, a.mention, ''))) / length(a.mention)) AS BIGINT) AS freq_m
  FROM documents d CROSS JOIN (SELECT DISTINCT mention FROM alias) a
  GROUP BY a.mention)
SELECT ma.mention, ma.entity_id, link_m.link_m, fm.freq_m,
       CAST(link_m.link_m AS DOUBLE) / fm.freq_m AS link_prob,
       CAST(ma.link_count AS DOUBLE) / link_m.link_m AS e_given_m
FROM ma JOIN link_m ON ma.mention = link_m.mention
        JOIN fm ON ma.mention = fm.mention""",
        "er_pairs": """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1""",
        "er_pairs_jw": """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(floor(jaro_winkler_similarity(a.c_name, b.c_name) * 10000) AS BIGINT) AS sim_bp
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE jaro_winkler_similarity(a.c_name, b.c_name) >= 0.94""",
        "er_clusters_incremental": """
WITH RECURSIVE e AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
SELECT u AS member_id, CAST(min(v) AS BIGINT) AS cluster_id
FROM reach GROUP BY u""",
        "er_constrained_invariants": """
WITH RECURSIVE e AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
cannot AS (SELECT id_a, id_b FROM e WHERE id_a % 7 = 0),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
base AS (SELECT u AS member_id, min(v) AS cluster_id FROM reach GROUP BY u),
viol AS (
  SELECT ba.cluster_id AS cl
  FROM cannot c JOIN base ba ON c.id_a = ba.member_id
                 JOIN base bb ON c.id_b = bb.member_id
  WHERE ba.cluster_id = bb.cluster_id),
off AS (SELECT DISTINCT cl FROM viol)
SELECT CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_members,
       CAST((SELECT count(*) FROM base
             WHERE cluster_id IN (SELECT cl FROM off)) AS BIGINT)
         AS n_offending_members,
       CAST((SELECT count(*) FROM base
             WHERE cluster_id NOT IN (SELECT cl FROM off)) AS BIGINT)
         AS n_preserved,
       CAST(0 AS BIGINT) AS n_violations""",
        "er_clusters": """
WITH RECURSIVE e AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
SELECT u AS member_id, CAST(min(v) AS BIGINT) AS cluster_id
FROM reach GROUP BY u""",
        "links": _links_sql(),
        "pca_invariants": _pca_invariants_sql(),
        "linking_eval": _linking_eval_sql(),
        "joint_invariants": _joint_invariants_sql(),
        # media_features_raw projects to (media_id, media_type) — both
        # closed-form from the synth fixture, so the row identity of
        # the decode->resize->feature chain IS value-checkable (any
        # decode/resize failure drops rows); the float features stay
        # uncheckable and are excluded by the projection
        "media_features_raw": """
SELECT CAST(i AS BIGINT) AS media_id,
       CASE WHEN i % 3 = 2 THEN 'audio' ELSE 'image' END AS media_type
FROM range(64) t(i)""",
        "fidelity_invariants": _fidelity_invariants_sql(),
        "flagship_golden": _golden_sql(),
        "flagship_attach": _attach_sql(),
        "links_partitioned": _links_partitioned_sql(),
        "flagship_clusters": _clusters_sql(),
        "doc_mentions": f"""WITH {_alias_values_sql()}
SELECT d.doc_id, a.mention,
       CAST((length(d.text) - length(replace(d.text, a.mention, ''))) / length(a.mention) AS BIGINT) AS n
FROM documents d CROSS JOIN (SELECT DISTINCT mention FROM alias) a
WHERE (length(d.text) - length(replace(d.text, a.mention, ''))) / length(a.mention) > 0""",
        "candidate_histogram": f"""{_occ_cte()},
per_mention AS (SELECT mention, CAST(count(*) AS BIGINT) AS n_candidates
                FROM ma GROUP BY mention)
SELECT n_candidates, CAST(count(*) AS BIGINT) AS n_mentions
FROM per_mention GROUP BY n_candidates""",
        "exact_dedup": """
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, md5(text) AS h
FROM documents GROUP BY md5(text)""",
        "token_counts": """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents""",
        "quality_stats": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       CAST(list_max(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS max_token_len
FROM documents""",
        "jaccard_partners": """
WITH pr AS (
  SELECT a.doc_id AS u
  FROM documents a JOIN documents b
    ON a.lang = b.lang AND a.doc_id <> b.doc_id
   AND jaccard(a.text, b.text) >= 0.999)
SELECT d.doc_id, CAST(coalesce(c.cnt, 0) AS BIGINT) AS n_partners
FROM documents d
LEFT JOIN (SELECT u, count(*) AS cnt FROM pr GROUP BY u) c ON d.doc_id = c.u""",
        "embedding_dup": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.35""",
        "ann_ivf": _ivf_sql(),
        "ann_pq": _pq_sql(),
        "ann_rerank": _pq_sql(rerank_mult=4),
        "ann_ivfpq": _ivfpq_sql(),
        "doc_semantic_topk": _doc_semantic_sql(),
        "word_analogy": """
WITH trip AS (SELECT CAST(i AS BIGINT) AS qid,
                     CAST(3*i AS BIGINT) AS a, CAST(3*i+1 AS BIGINT) AS b,
                     CAST(3*i+2 AS BIGINT) AS c
              FROM (SELECT unnest(range(5)) AS i)),
vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
nrm AS (SELECT vec_id,
               list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y*y)))) AS nv
        FROM vecs),
tgt AS (SELECT t.qid, t.a, t.b, t.c,
               list_transform(range(1, len(nb.nv)+1),
                              j -> nb.nv[j] - na.nv[j] + nc.nv[j]) AS qv
        FROM trip t
        JOIN nrm na ON na.vec_id = t.a
        JOIN nrm nb ON nb.vec_id = t.b
        JOIN nrm nc ON nc.vec_id = t.c),
s AS (SELECT g.qid, e.vec_id, list_cosine_similarity(e.v, g.qv) AS cos
      FROM vecs e CROSS JOIN tgt g
      WHERE e.vec_id NOT IN (g.a, g.b, g.c)),
r AS (SELECT qid, vec_id,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
      FROM s)
SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank, vec_id
FROM r WHERE rnk <= 5""",
        "ann_topk": """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.qid, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS c
      FROM embeddings e CROSS JOIN q),
r AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rnk
      FROM s)
SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank, vec_id
FROM r WHERE rnk <= 10""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity) * 10000) AS BIGINT) AS sum_qty,
       CAST(round(sum(l_extendedprice) * 10000) AS BIGINT) AS sum_base_price,
       CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus""",
        "nation_revenue": """
SELECT n_name, CAST(round(sum(o_totalprice) * 10000) AS BIGINT) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n_name""",
        "top_parts": """
SELECT p_partkey, p_name, p_retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 10""",
        "mktsegments": "SELECT DISTINCT c_mktsegment FROM customer",
        "customers_without_orders": """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
        # SQL replica of stages/textstats.fingerprints: Horner fold of the
        # polynomial rolling hash (base 1000003 mod 2^61-1) over code
        # points — equal to the UTF-8 byte hash because the corpus is
        # printable ASCII (checked: zero rows match [^\x20-\x7e]) — plus
        # the md5-low64 cross-check column.
        "fingerprints": """
SELECT doc_id,
  CAST(list_reduce(
    list_prepend(CAST(0 AS HUGEINT),
      list_transform(regexp_extract_all(text, '.', 0), c -> CAST(ord(c) AS HUGEINT))),
    (h, b) -> (h * 1000003 + b) % 2305843009213693951) AS BIGINT) AS rolling_fp,
  ('0x' || substr(md5(text), 1, 16))::UBIGINT AS md5_fp
FROM documents""",
        # SQL replica of stages/textstats.LangIdActor: stopword-profile
        # argmax (alphabetical tie-break) after a CJK-script-ratio gate.
        # Tokenization here splits on single spaces — equal to Python
        # str.split() on this corpus (no tabs/newlines/double spaces).
        "lang_id": """
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM documents
), scores AS (
  SELECT doc_id,
    len(list_filter(ts, t -> t IN ('the','a','of','and','to','in','is'))) AS en,
    len(list_filter(ts, t -> t IN ('der','die','das','und','ist','ein'))) AS de,
    len(list_filter(ts, t -> t IN ('el','la','de','y','es','un'))) AS es,
    len(list_filter(ts, t -> t IN ('le','la','de','et','est','un'))) AS fr,
    length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk,
    length(text) AS n, len(ts) AS ntoks
  FROM toks
)
SELECT doc_id,
  CASE WHEN ntoks = 0 THEN 'und'
       WHEN cjk * 1.0 / greatest(n, 1) > 0.2 THEN 'zh'
       WHEN greatest(en, de, es, fr) = 0 THEN 'und'
       WHEN de >= en AND de >= es AND de >= fr THEN 'de'
       WHEN en >= es AND en >= fr THEN 'en'
       WHEN es >= fr THEN 'es'
       ELSE 'fr' END AS pred_lang
FROM scores""",
        # SQL replica of stages/curation.hash_sample: same md5-low64
        # id-hash predicate.
        "doc_sample": """
SELECT * FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT % 100 < 10""",
        # CCNet terciles (stages/textstats.ccnet_buckets): per-token
        # lp quantized floor(1e6·ln(c/T)+0.5); per-doc mean = ONE
        # double division + floor (identical expression both engines);
        # rank = row_number by (score DESC, id); terciles on the
        # 0-based rank.
        "ccnet_buckets": """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tok),
uni AS (SELECT tk, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY tk),
lp AS (SELECT tk, CAST(floor(1e6 * ln(c / t) + 0.5) AS BIGINT) AS lp6
       FROM uni CROSS JOIN tot),
s AS (SELECT k.doc_id, CAST(count(*) AS BIGINT) AS nw,
             CAST(sum(lp.lp6) AS BIGINT) AS s6
      FROM tok k JOIN lp USING (tk) GROUP BY k.doc_id),
sc AS (SELECT doc_id,
              CAST(floor(CAST(s6 AS DOUBLE) / greatest(nw, 1)) AS BIGINT) AS logprob_e6
       FROM s),
r AS (SELECT doc_id, logprob_e6,
             CAST(row_number() OVER (ORDER BY logprob_e6 DESC, doc_id) AS BIGINT) AS rank
      FROM sc),
n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM sc)
SELECT doc_id, logprob_e6, rank,
       CASE WHEN 3 * (rank - 1) < n.c THEN 'head'
            WHEN 3 * (rank - 1) < 2 * n.c THEN 'middle'
            ELSE 'tail' END AS bucket
FROM r, n""",
        # Gopher rule bundle (stages/textstats.gopher_filter): every
        # rule an integer cross-multiply; word chars = n_chars-(nw-1)
        # is exact under the corpus's single-space joins.
        "gopher_filter": """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws,
                  CAST(length(text) AS BIGINT) AS n_chars
           FROM documents),
s AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, n_chars,
             CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
             CAST(len(list_filter(ws, x -> x IN ('the','of','and','to','in','is','a'))) AS BIGINT) AS n_stop_hits
      FROM w),
g2 AS (SELECT w.doc_id, ws[j] || ' ' || ws[j+1] AS g
       FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS j) t(j)),
g2c AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
b2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
              CAST(max(c) AS BIGINT) AS top_2gram_n
       FROM g2c GROUP BY doc_id)
SELECT s.doc_id, s.n_words, s.n_alpha_words, s.n_stop_hits,
       COALESCE(b2.top_2gram_n, 0) AS top_2gram_n,
       COALESCE(b2.n_2grams, 0) AS n_2grams
FROM s LEFT JOIN b2 USING (doc_id)
WHERE s.n_words BETWEEN 30 AND 100000
  AND 3 * s.n_words <= s.n_chars - (s.n_words - 1)
  AND s.n_chars - (s.n_words - 1) <= 10 * s.n_words
  AND 5 * s.n_alpha_words >= 4 * s.n_words
  AND s.n_stop_hits >= 2
  AND 5 * COALESCE(b2.top_2gram_n, 0) <= COALESCE(b2.n_2grams, 0)""",
        # Meta-blocking (stages/metablocking.py): block purge 2..1024,
        # CBS via the pair self-join, ECBS = cbs·ln(|B|/|Ba|)·ln(|B|/|Bb|)
        # quantized half-up to the 1e-9 int grid (same multiply
        # association as the engine), WEP as an integer cross-multiply.
        "meta_blocking": """
WITH c AS (SELECT c_custkey AS id, c_name, c_nationkey, c_acctbal FROM customer),
k AS (
  SELECT id, 'n:' || CAST(c_nationkey AS VARCHAR) AS key FROM c
  UNION ALL SELECT id, 'b:' || CAST(CAST(floor(c_acctbal / 100) AS BIGINT) AS VARCHAR) FROM c
  UNION ALL SELECT id, 'p:' || substr(c_name, 10, 7) FROM c
  UNION ALL SELECT id, 's:' || substr(c_name, 17) FROM c),
bs AS (SELECT key, count(*) AS n FROM k GROUP BY key),
kb AS (SELECT k.id, k.key FROM k JOIN bs USING (key) WHERE bs.n BETWEEN 2 AND 1024),
nbt AS (SELECT id, CAST(count(*) AS BIGINT) AS nb FROM kb GROUP BY id),
nbl AS (SELECT CAST(count(DISTINCT key) AS DOUBLE) AS nblocks FROM kb),
p AS (SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS cbs
      FROM kb a JOIN kb b ON a.key = b.key AND a.id < b.id GROUP BY a.id, b.id),
g AS (SELECT p.id_a, p.id_b, p.cbs, na.nb AS nb_a, nbx.nb AS nb_b,
             CAST(floor((p.cbs * ln(nblocks / CAST(na.nb AS DOUBLE))
                               * ln(nblocks / CAST(nbx.nb AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS w_e9
      FROM p JOIN nbt na ON na.id = p.id_a JOIN nbt nbx ON nbx.id = p.id_b CROSS JOIN nbl),
m AS (SELECT CAST(COALESCE(sum(w_e9), 0) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS cnt FROM g)
SELECT id_a, id_b, cbs, nb_a, nb_b, w_e9 FROM g, m WHERE w_e9 * m.cnt > m.s""",
        # Meta-blocked pairs + native jaro_winkler_similarity (the
        # same floor(sim*10000) convention as er_pairs_jw).
        "er_pairs_meta": """
WITH c AS (SELECT c_custkey AS id, c_name, c_nationkey, c_acctbal FROM customer),
k AS (
  SELECT id, 'n:' || CAST(c_nationkey AS VARCHAR) AS key FROM c
  UNION ALL SELECT id, 'b:' || CAST(CAST(floor(c_acctbal / 100) AS BIGINT) AS VARCHAR) FROM c
  UNION ALL SELECT id, 'p:' || substr(c_name, 10, 7) FROM c
  UNION ALL SELECT id, 's:' || substr(c_name, 17) FROM c),
bs AS (SELECT key, count(*) AS n FROM k GROUP BY key),
kb AS (SELECT k.id, k.key FROM k JOIN bs USING (key) WHERE bs.n BETWEEN 2 AND 1024),
nbt AS (SELECT id, CAST(count(*) AS BIGINT) AS nb FROM kb GROUP BY id),
nbl AS (SELECT CAST(count(DISTINCT key) AS DOUBLE) AS nblocks FROM kb),
p AS (SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS cbs
      FROM kb a JOIN kb b ON a.key = b.key AND a.id < b.id GROUP BY a.id, b.id),
g AS (SELECT p.id_a, p.id_b,
             CAST(floor((p.cbs * ln(nblocks / CAST(na.nb AS DOUBLE))
                               * ln(nblocks / CAST(nbx.nb AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS w_e9
      FROM p JOIN nbt na ON na.id = p.id_a JOIN nbt nbx ON nbx.id = p.id_b CROSS JOIN nbl),
m AS (SELECT CAST(COALESCE(sum(w_e9), 0) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS cnt FROM g),
e AS (SELECT id_a, id_b, w_e9 FROM g, m WHERE w_e9 * m.cnt > m.s)
SELECT e.id_a, e.id_b, e.w_e9,
       CAST(floor(jaro_winkler_similarity(a.c_name, b.c_name) * 10000) AS BIGINT) AS sim_bp
FROM e JOIN customer a ON a.c_custkey = e.id_a
       JOIN customer b ON b.c_custkey = e.id_b""",
        # Transitive closure over the WEP-pruned meta-blocking graph
        # (same CTEs as "meta_blocking" + the recursive reach used by
        # er_clusters_incremental).
        "er_clusters_meta": """
WITH RECURSIVE c AS (SELECT c_custkey AS id, c_name, c_nationkey, c_acctbal FROM customer),
k AS (
  SELECT id, 'n:' || CAST(c_nationkey AS VARCHAR) AS key FROM c
  UNION ALL SELECT id, 'b:' || CAST(CAST(floor(c_acctbal / 100) AS BIGINT) AS VARCHAR) FROM c
  UNION ALL SELECT id, 'p:' || substr(c_name, 10, 7) FROM c
  UNION ALL SELECT id, 's:' || substr(c_name, 17) FROM c),
bs AS (SELECT key, count(*) AS n FROM k GROUP BY key),
kb AS (SELECT k.id, k.key FROM k JOIN bs USING (key) WHERE bs.n BETWEEN 2 AND 1024),
nbt AS (SELECT id, CAST(count(*) AS BIGINT) AS nb FROM kb GROUP BY id),
nbl AS (SELECT CAST(count(DISTINCT key) AS DOUBLE) AS nblocks FROM kb),
p AS (SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS cbs
      FROM kb a JOIN kb b ON a.key = b.key AND a.id < b.id GROUP BY a.id, b.id),
g AS (SELECT p.id_a, p.id_b,
             CAST(floor((p.cbs * ln(nblocks / CAST(na.nb AS DOUBLE))
                               * ln(nblocks / CAST(nbx.nb AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS w_e9
      FROM p JOIN nbt na ON na.id = p.id_a JOIN nbt nbx ON nbx.id = p.id_b CROSS JOIN nbl),
m AS (SELECT CAST(COALESCE(sum(w_e9), 0) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS cnt FROM g),
e AS (SELECT id_a, id_b FROM g, m WHERE w_e9 * m.cnt > m.s),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
SELECT u AS member_id, CAST(min(v) AS BIGINT) AS cluster_id
FROM reach GROUP BY u""",
        # CNP over the same graph: both edge directions, per-node
        # rank by (w_e9 DESC, mate ASC) — the same deterministic tie
        # order as the engine's lexsort — keep rn<=3, distinct.
        "meta_blocking_cnp": """
WITH c AS (SELECT c_custkey AS id, c_name, c_nationkey, c_acctbal FROM customer),
k AS (
  SELECT id, 'n:' || CAST(c_nationkey AS VARCHAR) AS key FROM c
  UNION ALL SELECT id, 'b:' || CAST(CAST(floor(c_acctbal / 100) AS BIGINT) AS VARCHAR) FROM c
  UNION ALL SELECT id, 'p:' || substr(c_name, 10, 7) FROM c
  UNION ALL SELECT id, 's:' || substr(c_name, 17) FROM c),
bs AS (SELECT key, count(*) AS n FROM k GROUP BY key),
kb AS (SELECT k.id, k.key FROM k JOIN bs USING (key) WHERE bs.n BETWEEN 2 AND 1024),
nbt AS (SELECT id, CAST(count(*) AS BIGINT) AS nb FROM kb GROUP BY id),
nbl AS (SELECT CAST(count(DISTINCT key) AS DOUBLE) AS nblocks FROM kb),
p AS (SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS cbs
      FROM kb a JOIN kb b ON a.key = b.key AND a.id < b.id GROUP BY a.id, b.id),
g AS (SELECT p.id_a, p.id_b, p.cbs,
             CAST(floor((p.cbs * ln(nblocks / CAST(na.nb AS DOUBLE))
                               * ln(nblocks / CAST(nbx.nb AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS w_e9
      FROM p JOIN nbt na ON na.id = p.id_a JOIN nbt nbx ON nbx.id = p.id_b CROSS JOIN nbl),
e AS (SELECT id_a AS node, id_b AS mate, id_a, id_b, cbs, w_e9 FROM g
      UNION ALL SELECT id_b, id_a, id_a, id_b, cbs, w_e9 FROM g),
r AS (SELECT *, row_number() OVER (PARTITION BY node ORDER BY w_e9 DESC, mate ASC) AS rn FROM e)
SELECT DISTINCT id_a, id_b, cbs, w_e9 FROM r WHERE rn <= 3""",
        # DSIR importance weights (stages/dsir.py): hashed
        # unigram+bigram buckets (md5 % 512), add-one bucket models of
        # target (lang='en') vs raw, per-bucket log-ratio quantized
        # HALF-UP to the int64 1e-9 grid — per-doc weights are exact
        # integer dot products in both engines.
        "dsir_weights": """
WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
uni AS (SELECT doc_id, lang, unnest(ws) AS g FROM tok),
big AS (SELECT doc_id, lang, ws[j] || ' ' || ws[j+1] AS g
        FROM tok, LATERAL (SELECT unnest(range(1, len(ws))) AS j) s(j)),
grams AS (SELECT doc_id, lang,
                 CAST(('0x' || substr(md5(g), 1, 16))::UBIGINT % 512 AS BIGINT) AS b
          FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
rc AS (SELECT b, count(*) AS c FROM grams GROUP BY b),
tc AS (SELECT b, count(*) AS c FROM grams WHERE lang = 'en' GROUP BY b),
tot AS (SELECT (SELECT count(*) FROM grams WHERE lang = 'en') AS T,
               (SELECT count(*) FROM grams) AS R),
llr AS (SELECT r.b,
               CAST(floor(1e9 * (ln((COALESCE(t.c, 0) + 1.0) / (T + 512.0))
                               - ln((r.c + 1.0) / (R + 512.0))) + 0.5) AS BIGINT) AS l
        FROM rc r LEFT JOIN tc t USING (b) CROSS JOIN tot),
dc AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY doc_id, b)
SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_grams,
       CAST(sum(d.c * llr.l) AS BIGINT) AS llr_e9
FROM dc d JOIN llr USING (b) GROUP BY d.doc_id""",
        # DSIR Gumbel-top-k selection: key = llr/1e9 − ln(−ln(u)),
        # u = (md5_low64(id)+0.5)/2^64 — deterministic in the id.
        "dsir_sample": """
WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
uni AS (SELECT doc_id, lang, unnest(ws) AS g FROM tok),
big AS (SELECT doc_id, lang, ws[j] || ' ' || ws[j+1] AS g
        FROM tok, LATERAL (SELECT unnest(range(1, len(ws))) AS j) s(j)),
grams AS (SELECT doc_id, lang,
                 CAST(('0x' || substr(md5(g), 1, 16))::UBIGINT % 512 AS BIGINT) AS b
          FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
rc AS (SELECT b, count(*) AS c FROM grams GROUP BY b),
tc AS (SELECT b, count(*) AS c FROM grams WHERE lang = 'en' GROUP BY b),
tot AS (SELECT (SELECT count(*) FROM grams WHERE lang = 'en') AS T,
               (SELECT count(*) FROM grams) AS R),
llr AS (SELECT r.b,
               CAST(floor(1e9 * (ln((COALESCE(t.c, 0) + 1.0) / (T + 512.0))
                               - ln((r.c + 1.0) / (R + 512.0))) + 0.5) AS BIGINT) AS l
        FROM rc r LEFT JOIN tc t USING (b) CROSS JOIN tot),
dc AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY doc_id, b),
w AS (SELECT d.doc_id, CAST(sum(d.c * llr.l) AS BIGINT) AS llr_e9
      FROM dc d JOIN llr USING (b) GROUP BY d.doc_id)
SELECT doc_id, llr_e9 FROM (
  SELECT doc_id, llr_e9,
         llr_e9 / 1e9 - ln(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT AS DOUBLE) + 0.5) / 18446744073709551616.0)) AS gk
  FROM w ORDER BY gk DESC, doc_id LIMIT 50)""",
        "weighted_sample": """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         exp(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                      AS DOUBLE) + 1) / 18446744073709551616.0) / n_chars) AS skey
  FROM documents WHERE n_chars > 0
  ORDER BY skey DESC, doc_id LIMIT 50)""",
        "weighted_sample_by_lang": """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY
           exp(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                        AS DOUBLE) + 1) / 18446744073709551616.0) / n_chars) DESC,
           doc_id) AS rn
  FROM documents WHERE n_chars > 0)
WHERE rn <= 10""",
        "doc_sample_stratified": """
SELECT * FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT % 100 <
      CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 10 WHEN 'es' THEN 5 ELSE 50 END""",
        "top_docs_per_lang": """
SELECT lang, n_chars, doc_id FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) <= 3""",
        # Exact grouped quantiles, ceil(q*n)-th smallest (1-based) —
        # the same rank spec as stages/stats.grouped_quantiles.
        "length_quantiles": """
WITH qs AS (SELECT * FROM (VALUES (0.5), (0.9), (0.99)) t(q)),
r AS (
  SELECT lang, n_chars,
         sum(cnt) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
         sum(cnt) OVER (PARTITION BY lang) AS tot
  FROM (SELECT lang, n_chars, count(*) AS cnt FROM documents GROUP BY lang, n_chars)
)
SELECT r.lang, CAST(qs.q AS DOUBLE) AS q, CAST(min(r.n_chars) AS BIGINT) AS v
FROM r JOIN qs ON r.cum >= ceil(qs.q * r.tot)
GROUP BY r.lang, qs.q""",
        # Composition replica of pipelines/curate.curated_corpus: exact
        # dedup keepers → lang-ID replica = 'en' → token floor →
        # decontamination replica (n_hits = 0) → md5 hash sample.
        "curated_corpus": """
WITH keep1 AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), d AS (
  SELECT documents.* FROM documents JOIN keep1 USING (doc_id)
), toks AS (
  SELECT doc_id, text,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM d
), scores AS (
  SELECT doc_id,
    len(list_filter(ts, t -> t IN ('the','a','of','and','to','in','is'))) AS en,
    len(list_filter(ts, t -> t IN ('der','die','das','und','ist','ein'))) AS de,
    len(list_filter(ts, t -> t IN ('el','la','de','y','es','un'))) AS es,
    len(list_filter(ts, t -> t IN ('le','la','de','et','est','un'))) AS fr,
    length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk,
    length(text) AS n, len(ts) AS ntoks
  FROM toks
), pred AS (
  SELECT doc_id,
    CASE WHEN ntoks = 0 THEN 'und'
         WHEN cjk * 1.0 / greatest(n, 1) > 0.2 THEN 'zh'
         WHEN greatest(en, de, es, fr) = 0 THEN 'und'
         WHEN de >= en AND de >= es AND de >= fr THEN 'de'
         WHEN en >= es AND en >= fr THEN 'en'
         WHEN es >= fr THEN 'es'
         ELSE 'fr' END AS pred_lang
  FROM scores
), d2 AS (
  SELECT d.* FROM d JOIN pred USING (doc_id)
  WHERE pred.pred_lang = 'en' AND len(string_split(d.text, ' ')) >= 30
), h AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT AS hh
  FROM documents
), bench AS (
  SELECT doc_id FROM h ORDER BY hh, doc_id LIMIT 32
), tok2 AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), grams AS (
  SELECT tok2.doc_id, array_to_string(ts[s.i : s.i + 7], ' ') AS g
  FROM tok2,
       LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 7, 0))) AS i) s(i)
), bgrams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id IN (SELECT doc_id FROM bench)
), hits AS (
  SELECT grams.doc_id, count(DISTINCT g) AS n_hits
  FROM grams JOIN bgrams USING (g) GROUP BY grams.doc_id
)
SELECT d2.doc_id, d2.lang, d2.n_chars
FROM d2 LEFT JOIN hits ON d2.doc_id = hits.doc_id
WHERE COALESCE(hits.n_hits, 0) = 0
  AND ('0x' || substr(md5(CAST(d2.doc_id AS VARCHAR)), 1, 16))::UBIGINT % 100 < 50""",
        # SQL replica of stages/curation.decontaminate: the Ray side
        # matches 61-bit gram HASHES, the oracle matches gram STRINGS —
        # equal outputs unless two distinct grams collide mod M61
        # (~1e-7 at this scale). Benchmark = 32 smallest (md5(id), id).
        "decontamination": """
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT AS hh
  FROM documents
), bench AS (
  SELECT doc_id FROM h ORDER BY hh, doc_id LIMIT 32
), tok AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), grams AS (
  SELECT tok.doc_id, array_to_string(ts[s.i : s.i + 7], ' ') AS g
  FROM tok,
       LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 7, 0))) AS i) s(i)
), bgrams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id IN (SELECT doc_id FROM bench)
), hits AS (
  SELECT grams.doc_id, CAST(count(DISTINCT g) AS BIGINT) AS n_hits
  FROM grams JOIN bgrams USING (g) GROUP BY grams.doc_id
)
SELECT d.doc_id,
       COALESCE(hits.n_hits, 0) AS n_hits,
       COALESCE(hits.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id""",
        # Bloom decontamination (stages/curation.bloom_decontaminate):
        # M61 Horner gram hashes (same fold as dup_ngrams), 3 salted
        # md5 positions mod 65536; a gram blooms iff ALL 3 positions
        # are set by some benchmark gram.
        "bloom_flags": """
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT AS hh
  FROM documents
), bench AS (
  SELECT doc_id FROM h ORDER BY hh, doc_id LIMIT 32
), th AS (
  SELECT doc_id, list_transform(string_split(text, ' '),
           t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT % 2305843009213693951) AS hs
  FROM documents
), g AS (
  SELECT DISTINCT doc_id,
         list_reduce(hs[j : j + 7],
           (a, b) -> CAST((CAST(a AS UHUGEINT) * 1000003 + CAST(b AS UHUGEINT))
                          % 2305843009213693951 AS UBIGINT)) AS gh
  FROM th, LATERAL (SELECT unnest(generate_series(1, len(hs) - 7)) AS j) s(j)
), salts(s) AS (VALUES (0), (1), (2)),
bits AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || CAST(gh AS VARCHAR)), 1, 16))::UBIGINT % 65536 AS b
  FROM g JOIN bench USING (doc_id), salts
), dpos AS (
  SELECT doc_id, gh, s,
         ('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || CAST(gh AS VARCHAR)), 1, 16))::UBIGINT % 65536 AS b
  FROM g, salts
), ghit AS (
  SELECT doc_id, gh FROM dpos WHERE b IN (SELECT b FROM bits)
  GROUP BY doc_id, gh HAVING COUNT(*) = 3
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS bloom_hits FROM ghit GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.bloom_hits, 0) AS bloom_hits,
       COALESCE(a.bloom_hits, 0) > 0 AS flagged
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""",
        # Pairwise cluster F1 (stages/clustering.pairwise_cluster_f1):
        # tp = sum of C(cell,2) over the contingency table of the two
        # recursive-closure clusterings; exact ppm floor division.
        "er_vmeasure": """
WITH RECURSIVE
e1 AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE jaro_winkler_similarity(a.c_name, b.c_name) >= 0.94),
sym1 AS (SELECT id_a AS u, id_b AS v FROM e1 UNION SELECT id_b, id_a FROM e1),
r1(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM r1 r JOIN sym1 s ON r.v = s.u),
c1 AS (SELECT u AS id, MIN(v) AS p FROM r1 GROUP BY u),
e2 AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym2 AS (SELECT id_a AS u, id_b AS v FROM e2 UNION SELECT id_b, id_a FROM e2),
r2(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM r2 r JOIN sym2 s ON r.v = s.u),
c2 AS (SELECT u AS id, MIN(v) AS t FROM r2 GROUP BY u),
j AS (SELECT c1.p, c2.t FROM c1 JOIN c2 USING (id)),
cells AS (SELECT p, t, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY p, t),
asz AS (SELECT p, CAST(sum(n) AS BIGINT) AS c FROM cells GROUP BY p),
bsz AS (SELECT t, CAST(sum(n) AS BIGINT) AS c FROM cells GROUP BY t),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
ht AS (SELECT -sum(CAST(c AS HUGEINT) *
        CAST(floor(ln(CAST(c AS DOUBLE)/(SELECT n FROM nn))*1e9+0.5) AS BIGINT)) AS v
       FROM bsz),
hp AS (SELECT -sum(CAST(c AS HUGEINT) *
        CAST(floor(ln(CAST(c AS DOUBLE)/(SELECT n FROM nn))*1e9+0.5) AS BIGINT)) AS v
       FROM asz),
htp AS (SELECT -sum(CAST(cells.n AS HUGEINT) *
        CAST(floor(ln(CAST(cells.n AS DOUBLE)/asz.c)*1e9+0.5) AS BIGINT)) AS v
        FROM cells JOIN asz USING (p)),
hpt AS (SELECT -sum(CAST(cells.n AS HUGEINT) *
        CAST(floor(ln(CAST(cells.n AS DOUBLE)/bsz.c)*1e9+0.5) AS BIGINT)) AS v
        FROM cells JOIN bsz USING (t)),
hc AS (SELECT
  CASE WHEN (SELECT v FROM ht) = 0 THEN CAST(1000000 AS BIGINT)
       ELSE CAST(floor((1.0 - CAST((SELECT v FROM htp) AS DOUBLE)
                              / CAST((SELECT v FROM ht) AS DOUBLE))*1e6+0.5) AS BIGINT)
  END AS h,
  CASE WHEN (SELECT v FROM hp) = 0 THEN CAST(1000000 AS BIGINT)
       ELSE CAST(floor((1.0 - CAST((SELECT v FROM hpt) AS DOUBLE)
                              / CAST((SELECT v FROM hp) AS DOUBLE))*1e6+0.5) AS BIGINT)
  END AS c)
SELECT (SELECT n FROM nn) AS n_members, hc.h AS h_ppm, hc.c AS c_ppm,
  CASE WHEN hc.h + hc.c = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST(floor(2.0*hc.h*hc.c/(hc.h+hc.c)+0.5) AS BIGINT) END AS v_ppm
FROM hc""",
        "er_ari": """
WITH RECURSIVE
e1 AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE jaro_winkler_similarity(a.c_name, b.c_name) >= 0.94),
sym1 AS (SELECT id_a AS u, id_b AS v FROM e1 UNION SELECT id_b, id_a FROM e1),
r1(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM r1 r JOIN sym1 s ON r.v = s.u),
c1 AS (SELECT u AS id, MIN(v) AS p FROM r1 GROUP BY u),
e2 AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym2 AS (SELECT id_a AS u, id_b AS v FROM e2 UNION SELECT id_b, id_a FROM e2),
r2(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM r2 r JOIN sym2 s ON r.v = s.u),
c2 AS (SELECT u AS id, MIN(v) AS t FROM r2 GROUP BY u),
j AS (SELECT c1.p, c2.t FROM c1 JOIN c2 USING (id)),
cells AS (SELECT p, t, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY p, t),
tpx AS (SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS HUGEINT) AS s FROM cells),
ppx AS (SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS HUGEINT) AS s
        FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM j GROUP BY p)),
ptx AS (SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS HUGEINT) AS s
        FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM j GROUP BY t)),
f AS (SELECT CAST((SELECT count(*) FROM j) AS HUGEINT) AS n,
             ppx.s AS pp, ptx.s AS pt, tpx.s AS tp
      FROM ppx, ptx, tpx),
g AS (SELECT n, pp, pt, tp, n*(n-1)//2 AS c FROM f)
SELECT CAST(n AS BIGINT) AS n_members, CAST(pp AS BIGINT) AS pairs_pred,
       CAST(pt AS BIGINT) AS pairs_true, CAST(tp AS BIGINT) AS tp,
       CAST(CASE WHEN (c*(pp+pt) - 2*pp*pt) = 0 THEN 1000000
            ELSE (2*(tp*c - pp*pt)) * 1000000 // (c*(pp+pt) - 2*pp*pt)
       END AS BIGINT) AS ari_ppm
FROM g""",
        "cluster_f1": """
WITH RECURSIVE
e1 AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE jaro_winkler_similarity(a.c_name, b.c_name) >= 0.94),
sym1 AS (SELECT id_a AS u, id_b AS v FROM e1 UNION SELECT id_b, id_a FROM e1),
r1(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM r1 r JOIN sym1 s ON r.v = s.u),
c1 AS (SELECT u AS id, MIN(v) AS p FROM r1 GROUP BY u),
e2 AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym2 AS (SELECT id_a AS u, id_b AS v FROM e2 UNION SELECT id_b, id_a FROM e2),
r2(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM r2 r JOIN sym2 s ON r.v = s.u),
c2 AS (SELECT u AS id, MIN(v) AS t FROM r2 GROUP BY u),
j AS (SELECT c1.p, c2.t FROM c1 JOIN c2 USING (id)),
cells AS (SELECT p, t, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY p, t),
tpx AS (SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS s FROM cells),
ppx AS (SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS s
        FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM j GROUP BY p)),
ptx AS (SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS s
        FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM j GROUP BY t))
SELECT ppx.s AS pairs_pred, ptx.s AS pairs_true, tpx.s AS tp,
       CASE WHEN ppx.s = 0 THEN 1000000 ELSE tpx.s * 1000000 // ppx.s END AS precision_ppm,
       CASE WHEN ptx.s = 0 THEN 1000000 ELSE tpx.s * 1000000 // ptx.s END AS recall_ppm,
       CASE WHEN ppx.s + ptx.s = 0 THEN 1000000
            ELSE 2 * tpx.s * 1000000 // (ppx.s + ptx.s) END AS f1_ppm
FROM ppx, ptx, tpx""",
        # Blocking quality (stages/blocking.blocking_quality): exact
        # ppm integers via floor division on both sides.
        "blocking_quality": """
WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
blocks AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS c FROM customer GROUP BY 1),
cand AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS s FROM blocks),
tp AS (
  SELECT CAST(count(*) AS BIGINT) AS s
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1),
cb AS (
  SELECT CAST(count(*) AS BIGINT) AS s
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey AND a.c_nationkey = b.c_nationkey
   AND levenshtein(a.c_name, b.c_name) <= 1)
SELECT t.n AS n_rows,
       t.n * (t.n - 1) // 2 AS total_pairs,
       cand.s AS candidate_pairs,
       tp.s AS true_pairs,
       cb.s AS co_blocked,
       (t.n * (t.n - 1) // 2 - cand.s) * 1000000 // (t.n * (t.n - 1) // 2) AS reduction_ppm,
       cb.s * 1000000 // tp.s AS completeness_ppm
FROM t, cand, tp, cb""",
        # Column profiles (stages/validate.profile_columns): -1
        # sentinels for string min/max keep the schema uniform.
        "table_profile": """
SELECT 'o_orderkey' AS column, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(min(o_orderkey) AS BIGINT) AS min_v, CAST(max(o_orderkey) AS BIGINT) AS max_v
FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
       count(DISTINCT o_custkey), min(o_custkey), max(o_custkey)
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus), -1, -1
FROM orders""",
        # Constraint checks (stages/validate.check_constraints).
        "constraint_violations": """
SELECT 'max_len:text' AS rule,
       CAST(count(*) FILTER (WHERE length(text) > 2000) AS BIGINT) AS violations
FROM documents
UNION ALL
SELECT 'not_null:lang', CAST(count(*) FILTER (WHERE lang IS NULL) AS BIGINT) FROM documents
UNION ALL
SELECT 'not_null:text', CAST(count(*) FILTER (WHERE text IS NULL) AS BIGINT) FROM documents
UNION ALL
SELECT 'unique:doc_id', CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) FROM documents""",
        # Recrawl delta (stages/curation.corpus_diff): the perturbed
        # 'new' side is defined by the same deterministic rules.
        "corpus_diff": """
WITH old AS (SELECT doc_id, text FROM documents),
new AS (
  SELECT doc_id, CASE WHEN doc_id % 97 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 101 <> 0
  UNION ALL
  SELECT doc_id + 1000000, 'new doc ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 103 = 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text""",
        # Count-Min estimates (stages/sketch.count_min_sketch): cell
        # (s, c) = sum of counts of ALL tokens hashing there; estimate
        # = min over the 3 rows. All-int — exact compare.
        "cms_counts": """
WITH tc AS (
  SELECT token, count(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
), salts(s) AS (VALUES (0), (1), (2)),
cells AS (
  SELECT s, ('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || token), 1, 16))::UBIGINT % 1024 AS c,
         SUM(n) AS v
  FROM tc, salts GROUP BY s, c
), h AS (
  SELECT doc_id, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT AS hh
  FROM documents
), bench AS (SELECT doc_id FROM h ORDER BY hh, doc_id LIMIT 4),
probe AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS token
  FROM documents JOIN bench USING (doc_id)
), pos AS (
  SELECT token, s,
         ('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || token), 1, 16))::UBIGINT % 1024 AS c
  FROM probe, salts
)
SELECT p.token, CAST(MIN(cl.v) AS BIGINT) AS cms_count
FROM pos p JOIN cells cl ON cl.s = p.s AND cl.c = p.c
GROUP BY p.token""",
        "vocab_counts": """
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token HAVING count(*) >= 5""",
        # Multi-level ROLLUP (pipelines/relational.revenue_rollup):
        # 'ALL' sentinel instead of NULL so the hash compare is exact.
        "revenue_rollup": """
SELECT COALESCE(r.r_name, 'ALL') AS r_name,
       COALESCE(n.n_name, 'ALL') AS n_name,
       CAST(round(sum(o.o_totalprice) * 10000) AS BIGINT) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)""",
        # Pivot (pipelines/relational.pivot_counts): conditional counts,
        # one column per mktsegment.
        "segment_pivot": """
SELECT n.n_name,
       CAST(count(*) FILTER (WHERE c.c_mktsegment = 'AUTOMOBILE') AS BIGINT) AS automobile,
       CAST(count(*) FILTER (WHERE c.c_mktsegment = 'BUILDING') AS BIGINT) AS building,
       CAST(count(*) FILTER (WHERE c.c_mktsegment = 'FURNITURE') AS BIGINT) AS furniture,
       CAST(count(*) FILTER (WHERE c.c_mktsegment = 'HOUSEHOLD') AS BIGINT) AS household,
       CAST(count(*) FILTER (WHERE c.c_mktsegment = 'MACHINERY') AS BIGINT) AS machinery
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name""",
        "window_agg": """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(value) * 10000) AS BIGINT) AS total_value
FROM events GROUP BY event_type, date_trunc('hour', ts)""",
        # SQL replica of stages/windows.hopping_window_agg (60-min
        # windows hopping every 15): exact integer-microsecond grid
        # arithmetic, mirroring the Ray kernel.
        "hopping_agg": """
WITH e AS (
  SELECT event_type, value, epoch_us(ts) AS esu FROM events
), w AS (
  SELECT event_type, value,
         make_timestamp((esu // 900000000) * 900000000 - j * 900000000)
           AS window_start
  FROM e, LATERAL (SELECT unnest(generate_series(0, 3)) AS j) s(j)
  WHERE (esu // 900000000) * 900000000 - j * 900000000 > esu - 3600000000
)
SELECT event_type, window_start,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(value) * 10000) AS BIGINT) AS total_value
FROM w GROUP BY event_type, window_start""",
        "sessions": """
WITH o AS (
  SELECT user_id, ts, value, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events),
m AS (SELECT *, CASE WHEN pts IS NULL OR ts - pts > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk FROM o),
s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid FROM m)
SELECT user_id, CAST(sid AS BIGINT) AS session_id, min(ts) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(value) * 10000) AS BIGINT) AS total_value
FROM s GROUP BY user_id, sid""",
        # Backward as-of join (stages/asof.py): DuckDB's native ASOF
        # LEFT JOIN; right side pre-deduped to max(event_id) per
        # (user_id, ts) — the operator's documented tie rule.
        "purchase_attribution": """
WITH clicks AS (
  SELECT user_id, ts AS cts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.value, c.click_id,
       CAST(date_diff('microsecond', c.cts, p.ts) AS BIGINT) AS lag_us
FROM p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.cts""",
        # Heavy hitters (stages/sketch.py): integer-exact support rule.
        "heavy_hitters": """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
tot AS (SELECT count(*) AS c FROM tok)
SELECT tk AS token, CAST(count(*) AS BIGINT) AS n
FROM tok CROSS JOIN tot
GROUP BY tk, tot.c HAVING count(*) * 512 >= tot.c""",
        # Round-2 curation composition (pipelines/curate.py:
        # curated_corpus_v2): dedup-drop NOT IN, integer repetition
        # rule, LM floor -3.6 (0.05 margin to the nearest doc at
        # sf0.01 — no float-boundary flips).
        "curated_corpus_v2": """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g5 AS (SELECT doc_id, list_aggregate(ws[j:j+4], 'string_agg', ' ') AS win
       FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 3)) AS j) s(j)),
d5 AS (SELECT DISTINCT doc_id, win FROM g5),
pr AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n
       FROM d5 a JOIN d5 b ON a.win = b.win AND a.doc_id < b.doc_id
       GROUP BY a.doc_id, b.doc_id),
dropped AS (SELECT DISTINCT db AS doc_id FROM pr WHERE n >= 3),
tok AS (SELECT doc_id, unnest(ws) AS tk FROM w),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tok),
uni AS (SELECT tk, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY tk),
lm AS (SELECT k.doc_id, CAST(count(*) AS BIGINT) AS n_words,
              sum(ln(u.c / tot.t)) / count(*) AS avg_logprob
       FROM tok k JOIN uni u ON k.tk = u.tk CROSS JOIN tot
       GROUP BY k.doc_id),
g2 AS (SELECT w.doc_id, ws[j] || ' ' || ws[j+1] AS g
       FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS j) s(j)),
g2c AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
rep AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
               CAST(max(c) AS BIGINT) AS top2
        FROM g2c GROUP BY doc_id)
SELECT lm.doc_id, lm.n_words, lm.avg_logprob
FROM lm LEFT JOIN rep ON lm.doc_id = rep.doc_id
WHERE lm.doc_id NOT IN (SELECT doc_id FROM dropped)
  AND 12 * COALESCE(rep.top2, 0) <= COALESCE(rep.n2, 0)
  AND lm.avg_logprob >= -3.6""",
        # Unigram-LM quality scores (stages/textstats.py:
        # unigram_lm_scores): identical ln(c/T) expression per token.
        "lm_scores": """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tok),
uni AS (SELECT tk, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY tk)
SELECT k.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       sum(ln(u.c / tot.t)) / count(*) AS avg_logprob
FROM tok k JOIN uni u ON k.tk = u.tk CROSS JOIN tot
GROUP BY k.doc_id""",
        # Exact-substring dedup (stages/dedup.py:shared_ngram_pairs):
        # SQL joins on the window STRING; the engine on its M61 hash —
        # identical row sets absent a 61-bit collision.
        "shared_ngrams": """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id, list_aggregate(ws[j:j+4], 'string_agg', ' ') AS win
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 3)) AS j) s(j)),
d AS (SELECT DISTINCT doc_id, win FROM g)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM d a JOIN d b ON a.win = b.win AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id""",
        # Blocklist stats (stages/curation.blocklist_stats): the oracle
        # counts via non-overlapping replace; equal to the scanner's
        # all-overlapping counts because the terms are border-free (no
        # proper prefix = suffix, so occurrences cannot self-overlap).
        "blocklist_stats": """
WITH t AS (SELECT doc_id, lower(text) AS tx FROM documents)
SELECT doc_id,
  CAST((len(tx) - len(replace(tx, 'filter', ''))) // 6
     + (len(tx) - len(replace(tx, 'join', ''))) // 4
     + (len(tx) - len(replace(tx, 'scan', ''))) // 4 AS BIGINT) AS n_hits,
  CAST((len(tx) > len(replace(tx, 'filter', '')))::INT
     + (len(tx) > len(replace(tx, 'join', '')))::INT
     + (len(tx) > len(replace(tx, 'scan', '')))::INT AS BIGINT) AS n_terms_hit
FROM t""",
        # Directional containment (stages/dedup.containment_pairs):
        # same literal-gram replica as shared_ngrams (the M61 gram hash
        # is collision-free at gate scale); the tau cut is the same
        # integer cross-multiply on both sides.
        "containment_pairs": """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id, list_aggregate(ws[j:j+4], 'string_agg', ' ') AS win
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 3)) AS j) s(j)),
d AS (SELECT DISTINCT doc_id, win FROM g),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY doc_id),
i AS (SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS m
      FROM d a JOIN d b ON a.win = b.win AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
SELECT i.da AS doc_id, i.db AS partner_id, i.m AS n_shared, sz.n AS n_grams,
       CAST(i.m AS DOUBLE) / sz.n AS containment
FROM i JOIN sz ON sz.doc_id = i.da
WHERE i.m * 1000 >= 200 * sz.n""",
        # Frequent-itemset pairs (stages/itemsets.py): identical lift
        # evaluation order — support·G in double first, then divided by
        # the int64 product of the unary supports.
        "copurchase_lift": """
WITH items AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem),
u AS (SELECT item, count(*) AS n FROM items GROUP BY item),
gt AS (SELECT count(DISTINCT g) AS total FROM items),
p AS (SELECT a.item AS item_a, b.item AS item_b,
             CAST(count(*) AS BIGINT) AS support
      FROM items a JOIN items b ON a.g = b.g AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT p.item_a, p.item_b, p.support,
       CAST(p.support AS DOUBLE) * gt.total / (ua.n * ub.n) AS lift
FROM p CROSS JOIN gt
JOIN u ua ON ua.item = p.item_a
JOIN u ub ON ub.item = p.item_b""",
        # PMI collocations (stages/collocations.py): identical division
        # order in the pmi expression; TB = T − n_docs exactly.
        "pmi_bigrams": """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT unnest(ws) AS tk FROM w),
uni AS (SELECT tk, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY tk),
tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM tok) AS t,
               (SELECT CAST(count(*) AS DOUBLE) FROM tok)
                 - (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS tb),
big AS (
  SELECT ws[j] AS w1, ws[j+1] AS w2, CAST(count(*) AS BIGINT) AS n
  FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS j) s(j)
  GROUP BY ws[j], ws[j+1] HAVING count(*) >= 5)
SELECT b.w1, b.w2, b.n,
       ln((b.n / tot.tb) / ((u1.c / tot.t) * (u2.c / tot.t))) AS pmi
FROM big b JOIN uni u1 ON b.w1 = u1.tk
           JOIN uni u2 ON b.w2 = u2.tk
           CROSS JOIN tot""",
        # BM25 (stages/bm25.py): identical Lucene-idf formula in SQL;
        # avgdl = sum(dl)/N in double on both sides.
        "bm25_scores": """
WITH terms(query_id, tk) AS (VALUES
  (1,'hash'),(1,'join'),
  (2,'customer'),(2,'filter'),(2,'scan'),
  (3,'window'),(3,'sort')),
tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS tk FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl,
                 (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n),
df AS (SELECT t.tk, CAST(count(DISTINCT k.doc_id) AS DOUBLE) AS df
       FROM (SELECT DISTINCT tk FROM terms) t
       LEFT JOIN tok k ON k.tk = t.tk GROUP BY t.tk),
tf AS (SELECT tr.query_id, k.doc_id, k.tk, CAST(count(*) AS DOUBLE) AS tf
       FROM tok k JOIN terms tr ON k.tk = tr.tk
       GROUP BY tr.query_id, k.doc_id, k.tk)
SELECT tf.query_id, tf.doc_id,
       sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1)
           * tf.tf * (1.2 + 1) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
       ) AS score
FROM tf JOIN df ON tf.tk = df.tk
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats s
GROUP BY tf.query_id, tf.doc_id""",
        # Keyed range join (stages/interval.py): LEFT JOIN + inequality
        # band, counted per interval row.
        "signup_conversion": """
WITH s AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
), p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT s.event_id, s.user_id, s.ts,
       CAST(count(p.ts) AS BIGINT) AS n_purchases
FROM s LEFT JOIN p
  ON p.user_id = s.user_id
 AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 24 HOUR
GROUP BY s.event_id, s.user_id, s.ts""",
        # Word n-gram repetition features (stages/textstats.py:
        # repetition_stats); 1-based list indexing, range() end-exclusive.
        "repetition_stats": """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS tk FROM w),
uni AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(count(DISTINCT tk) AS BIGINT) AS n_distinct_words
  FROM tok GROUP BY doc_id),
g2 AS (
  SELECT w.doc_id, ws[j] || ' ' || ws[j+1] AS g
  FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS j) s(j)),
g2c AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
b2 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
         CAST(count(*) AS BIGINT) AS n_distinct_2grams,
         CAST(max(c) AS BIGINT) AS top_2gram_n
  FROM g2c GROUP BY doc_id),
g3 AS (
  SELECT w.doc_id, ws[j] || ' ' || ws[j+1] || ' ' || ws[j+2] AS g
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS j) s(j)),
g3c AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g),
b3 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_3grams,
         CAST(count(*) AS BIGINT) AS n_distinct_3grams,
         CAST(max(c) AS BIGINT) AS top_3gram_n
  FROM g3c GROUP BY doc_id)
SELECT u.doc_id, u.n_words, u.n_distinct_words,
       COALESCE(b2.n_2grams, 0) AS n_2grams,
       COALESCE(b2.n_distinct_2grams, 0) AS n_distinct_2grams,
       COALESCE(b2.top_2gram_n, 0) AS top_2gram_n,
       COALESCE(b3.n_3grams, 0) AS n_3grams,
       COALESCE(b3.n_distinct_3grams, 0) AS n_distinct_3grams,
       COALESCE(b3.top_3gram_n, 0) AS top_3gram_n
FROM uni u LEFT JOIN b2 ON u.doc_id = b2.doc_id
           LEFT JOIN b3 ON u.doc_id = b3.doc_id""",
        "er_attach": """
WITH base AS (
  SELECT c_custkey AS id, c_name, c_nationkey, c_custkey // 2 AS cluster_id
  FROM customer WHERE c_custkey % 4 <> 0),
newr AS (
  SELECT c_custkey AS id, c_name, c_nationkey
  FROM customer WHERE c_custkey % 4 = 0),
scored AS (
  SELECT n.id AS nid, b.id AS bid, b.cluster_id AS bcl,
         CAST(floor(jaro_winkler_similarity(n.c_name, b.c_name) * 10000) AS BIGINT) AS sim_bp
  FROM newr n JOIN base b ON n.c_nationkey = b.c_nationkey),
best AS (
  SELECT nid, bid, bcl, sim_bp,
         row_number() OVER (PARTITION BY nid ORDER BY sim_bp DESC, bid) AS rn
  FROM scored)
SELECT n.id AS id,
       CASE WHEN coalesce(b.sim_bp, -1) >= 9700 THEN b.bcl ELSE n.id END AS cluster_id,
       coalesce(b.bid, -1) AS best_id,
       coalesce(b.sim_bp, -1) AS sim_bp,
       CASE WHEN coalesce(b.sim_bp, -1) >= 9700 THEN 1 ELSE 0 END AS matched
FROM newr n LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON n.id = b.nid""",
        "er_pairs_multiblock": """
SELECT DISTINCT id_a, id_b FROM (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1
  UNION ALL
  SELECT a.c_custkey, b.c_custkey
  FROM customer a JOIN customer b
    ON floor(a.c_acctbal/100) = floor(b.c_acctbal/100) AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1)""",
        "media_phash": _phash_sql("hashes"),
        "media_phash_pairs": _phash_sql("pairs"),
        "media_frames": """
WITH media AS (
  SELECT CAST(i AS BIGINT) AS media_id,
         1000 * (1 + i % 7) AS duration_ms
  FROM range(256) t(i) WHERE i % 3 = 2
)
SELECT m.media_id,
       CAST(u.k AS INTEGER) AS frame_idx,
       CAST(u.k * 500 AS INTEGER) AS t_ms
FROM media m, unnest(generate_series(0, 14)) u(k)
WHERE u.k <= m.duration_ms // 500""",
        "er_pairs_composite": """
SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b,
       levenshtein(a.c_name, b.c_name) AS dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
 AND (substr(a.c_name, 1, 13) = substr(b.c_name, 1, 13)
   OR substr(a.c_name, 14) = substr(b.c_name, 14))
WHERE levenshtein(a.c_name, b.c_name) <= 1""",
        # 3-gram Jaccard pairs (er.customer_pairs_qgram): the oracle
        # enumerates each name's DISTINCT 3-grams laterally; the
        # integer cross-multiply keep and (10000*inter)//union score
        # are the same exact arithmetic as the kernel (ASCII keys, so
        # DuckDB byte substr == the kernel's codepoint grams).
        "er_pairs_qgram": """
WITH pos AS (SELECT CAST(i AS INTEGER) AS i FROM range(1, 256) t(i)),
g AS (
  SELECT DISTINCT c.c_custkey AS id, c.c_nationkey AS blk,
         substr(c.c_name, p.i, 3) AS q
  FROM customer c JOIN pos p ON p.i <= len(c.c_name) - 2),
sz AS (SELECT id, count(*) AS n FROM g GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ni
  FROM g a JOIN g b ON a.q = b.q AND a.blk = b.blk AND a.id < b.id
  GROUP BY a.id, b.id)
SELECT i.id_a, i.id_b,
       CAST((10000 * i.ni) // (sa.n + sb.n - i.ni) AS BIGINT) AS sim_bp
FROM inter i JOIN sz sa ON i.id_a = sa.id JOIN sz sb ON i.id_b = sb.id
WHERE 10000 * i.ni >= 7000 * (sa.n + sb.n - i.ni)""",
        # B-cubed contingency (er.customer_bcubed): predicted labels
        # replicated by the er_clusters recursive-CTE closure; gold =
        # custkey // 10; marginals via window sums over the cell table.
        "er_bcubed": """
WITH RECURSIVE e AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
labels AS (
  SELECT u AS member_id, CAST(min(v) AS BIGINT) AS cluster_id
  FROM reach GROUP BY u),
cells AS (
  SELECT cluster_id, CAST(member_id // 10 AS BIGINT) AS gold_id,
         CAST(count(*) AS BIGINT) AS n_common
  FROM labels GROUP BY 1, 2)
SELECT cluster_id, gold_id, n_common,
       CAST(sum(n_common) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_pred,
       CAST(sum(n_common) OVER (PARTITION BY gold_id) AS BIGINT) AS n_gold
FROM cells""",
        "html_extract_text": """
SELECT doc_id, text FROM documents""",
        "crawl_freshness": """
SELECT source, count(*) AS n_pages,
       min(doc_id) + 1704067200 AS first_ts,
       max(doc_id) + 1704067200 AS last_ts
FROM documents GROUP BY source""",
        "candidate_recall": f"""{_occ_cte()},
freq AS (
  SELECT a.mention,
         CAST(sum((length(d.text) - length(replace(d.text, a.mention, ''))) / length(a.mention)) AS BIGINT) AS freq
  FROM documents d CROSS JOIN (SELECT DISTINCT mention FROM alias) a
  GROUP BY a.mention),
link_m AS (SELECT mention, CAST(sum(link_count) AS BIGINT) AS link_m FROM ma GROUP BY mention),
kept AS (
  SELECT l.mention FROM link_m l JOIN freq f ON l.mention = f.mention
  WHERE length(l.mention) > 1 AND l.link_m >= 2 AND l.link_m * 10000 >= f.freq),
g AS (SELECT mention, entity_id, cnt FROM occ WHERE cnt > 0)
SELECT CAST(sum(g.cnt) AS BIGINT) AS n_gold,
  CAST(sum(CASE WHEN k.mention IS NOT NULL THEN g.cnt ELSE 0 END) AS BIGINT) AS n_mention_kept,
  CAST(sum(CASE WHEN k.mention IS NOT NULL THEN g.cnt ELSE 0 END) AS BIGINT) AS n_reachable,
  CAST((sum(CASE WHEN k.mention IS NOT NULL THEN g.cnt ELSE 0 END) * 1000000)
       // sum(g.cnt) AS BIGINT) AS recall_ppm
FROM g LEFT JOIN kept k ON g.mention = k.mention""",
        "quantile_norm": """
WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents)
SELECT doc_id, source, n_chars,
       CASE WHEN n > 1 THEN (rn - 1) * 1000000 // (n - 1) ELSE 0 END AS pct_ppm
FROM r""",
        "fs_review_queue": """
WITH c AS (SELECT c_custkey AS id, c_nationkey AS k, c_mktsegment AS seg,
  CAST(floor(c_acctbal/1000) AS BIGINT) AS bal, right(c_name,1) AS last1, c_name FROM customer),
p AS (SELECT a.id AS ia, b.id AS ib,
  CASE WHEN a.seg=b.seg THEN 1 ELSE 0 END AS a_seg,
  CASE WHEN a.bal=b.bal THEN 1 ELSE 0 END AS a_bal,
  CASE WHEN a.last1=b.last1 THEN 1 ELSE 0 END AS a_last1,
  CASE WHEN levenshtein(a.c_name,b.c_name)<=1 THEN 1 ELSE 0 END AS lbl
 FROM c a JOIN c b ON a.k=b.k AND a.id<b.id),
s AS (SELECT sum(lbl) AS n1, sum(1-lbl) AS n0,
  sum(a_seg*lbl) AS s1_seg, sum(a_seg*(1-lbl)) AS s0_seg,
  sum(a_bal*lbl) AS s1_bal, sum(a_bal*(1-lbl)) AS s0_bal,
  sum(a_last1*lbl) AS s1_last1, sum(a_last1*(1-lbl)) AS s0_last1 FROM p),
sc AS (
SELECT p.ia AS id_a, p.ib AS id_b, p.lbl AS label,
 (CASE WHEN p.a_seg=1 THEN log2(((s.s1_seg+0.5)/(s.n1+1))/((s.s0_seg+0.5)/(s.n0+1)))
       ELSE log2((1-(s.s1_seg+0.5)/(s.n1+1))/(1-(s.s0_seg+0.5)/(s.n0+1))) END)
 + (CASE WHEN p.a_bal=1 THEN log2(((s.s1_bal+0.5)/(s.n1+1))/((s.s0_bal+0.5)/(s.n0+1)))
       ELSE log2((1-(s.s1_bal+0.5)/(s.n1+1))/(1-(s.s0_bal+0.5)/(s.n0+1))) END)
 + (CASE WHEN p.a_last1=1 THEN log2(((s.s1_last1+0.5)/(s.n1+1))/((s.s0_last1+0.5)/(s.n0+1)))
       ELSE log2((1-(s.s1_last1+0.5)/(s.n1+1))/(1-(s.s0_last1+0.5)/(s.n0+1))) END) AS score
FROM p CROSS JOIN s)
SELECT * FROM sc WHERE score >= 0.0 AND score < 3.5""",
        "er_exemplars": """
WITH RECURSIVE e AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
lab AS (SELECT u AS id, CAST(min(v) AS BIGINT) AS cid FROM reach GROUP BY u),
g AS (SELECT c.c_custkey, c.c_acctbal, l.cid AS cluster_id,
      row_number() OVER (PARTITION BY l.cid ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
      FROM customer c JOIN lab l ON c.c_custkey = l.id)
SELECT c_custkey, c_acctbal, cluster_id FROM g WHERE rn <= 2""",
        "er_alignment": """
WITH RECURSIVE e AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
lab AS (SELECT u AS id, CAST(min(v) AS BIGINT) AS cid FROM reach GROUP BY u),
old AS (SELECT c_custkey AS id, c_custkey // 10 AS ocid FROM customer),
j AS (SELECT l.cid, o.ocid FROM lab l JOIN old o ON l.id = o.id),
pc AS (SELECT cid, ocid, count(*) AS cnt FROM j GROUP BY cid, ocid),
tot AS (SELECT cid, count(*) AS n FROM j GROUP BY cid),
best AS (SELECT cid, ocid, cnt,
         row_number() OVER (PARTITION BY cid ORDER BY cnt DESC, ocid) AS rn FROM pc)
SELECT b.cid AS cluster_id, b.ocid AS old_cluster_id, b.cnt AS overlap,
       t.n AS n_members, (b.cnt * 1000000) // t.n AS agreement_ppm
FROM best b JOIN tot t ON b.cid = t.cid WHERE b.rn = 1""",
        "er_cluster_metrics": """
WITH RECURSIVE e AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
lab AS (SELECT u AS id, CAST(min(v) AS BIGINT) AS cid FROM reach GROUP BY u),
mc AS (SELECT cid, count(*) AS n_members FROM lab GROUP BY cid),
ec AS (SELECT l.cid, count(*) AS n_edges FROM e JOIN lab l ON e.id_a = l.id GROUP BY l.cid)
SELECT mc.cid AS cluster_id, mc.n_members, coalesce(ec.n_edges, 0) AS n_edges,
  CASE WHEN mc.n_members > 1
       THEN (2 * coalesce(ec.n_edges, 0) * 1000000) // (mc.n_members * (mc.n_members - 1))
       ELSE 0 END AS density_ppm
FROM mc LEFT JOIN ec ON mc.cid = ec.cid""",
        "er_golden": """
WITH RECURSIVE e AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
lab AS (SELECT u AS id, CAST(min(v) AS BIGINT) AS cid FROM reach GROUP BY u),
g AS (SELECT l.cid, c.c_custkey AS id, c.c_name, c.c_acctbal, c.c_mktsegment
      FROM customer c JOIN lab l ON c.c_custkey = l.id),
r1 AS (SELECT cid, c_name, row_number() OVER (PARTITION BY cid ORDER BY id) AS rn FROM g),
r2 AS (SELECT cid, c_acctbal, c_mktsegment,
       row_number() OVER (PARTITION BY cid ORDER BY c_acctbal DESC, id) AS rn FROM g),
cnt AS (SELECT cid, count(*) AS n FROM g GROUP BY cid)
SELECT cnt.cid AS cluster_id, cnt.n AS n_members, r1.c_name, r2.c_acctbal, r2.c_mktsegment
FROM cnt JOIN r1 ON r1.cid = cnt.cid AND r1.rn = 1
         JOIN r2 ON r2.cid = cnt.cid AND r2.rn = 1""",
        "fs_weights": """
WITH c AS (SELECT c_custkey AS id, c_nationkey AS k, c_mktsegment AS seg,
  CAST(floor(c_acctbal/1000) AS BIGINT) AS bal, right(c_name,1) AS last1, c_name FROM customer),
p AS (SELECT a.id AS ia, b.id AS ib,
  CASE WHEN a.seg=b.seg THEN 1 ELSE 0 END AS a_seg,
  CASE WHEN a.bal=b.bal THEN 1 ELSE 0 END AS a_bal,
  CASE WHEN a.last1=b.last1 THEN 1 ELSE 0 END AS a_last1,
  CASE WHEN levenshtein(a.c_name,b.c_name)<=1 THEN 1 ELSE 0 END AS lbl
 FROM c a JOIN c b ON a.k=b.k AND a.id<b.id),
s AS (SELECT sum(lbl) AS n1, sum(1-lbl) AS n0,
  sum(a_seg*lbl) AS s1_seg, sum(a_seg*(1-lbl)) AS s0_seg,
  sum(a_bal*lbl) AS s1_bal, sum(a_bal*(1-lbl)) AS s0_bal,
  sum(a_last1*lbl) AS s1_last1, sum(a_last1*(1-lbl)) AS s0_last1 FROM p),
w AS (
 SELECT 'seg' AS field, (s1_seg+0.5)/(n1+1) AS m, (s0_seg+0.5)/(n0+1) AS u FROM s
 UNION ALL SELECT 'bal', (s1_bal+0.5)/(n1+1), (s0_bal+0.5)/(n0+1) FROM s
 UNION ALL SELECT 'last1', (s1_last1+0.5)/(n1+1), (s0_last1+0.5)/(n0+1) FROM s)
SELECT field, m, u, log2(m/u) AS w_agree, log2((1-m)/(1-u)) AS w_disagree FROM w""",
        "er_hierarchy": _hierarchy_sql(),
        "c4_filter": f"""
WITH {_LINED_SQL},
lines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
          generate_subscripts(string_split(text, chr(10)),1) AS i FROM lined),
keptl AS (SELECT doc_id, line, i FROM lines
  WHERE (line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?')
    AND len(string_split(line,' ')) >= 5),
agg AS (SELECT doc_id, count(*) AS n_kept,
        string_agg(line, chr(10) ORDER BY i) AS clean_text FROM keptl GROUP BY doc_id),
base AS (SELECT doc_id, len(string_split(text, chr(10))) AS n_lines,
  length(text) - length(replace(replace(replace(text,'.',''),'!',''),'?','')) AS n_sentences,
  contains(lower(text), 'lorem ipsum') AS lor, contains(text, '{{') AS br FROM lined)
SELECT b.doc_id, coalesce(a.clean_text, '') AS clean_text,
  CAST(b.n_lines AS BIGINT) AS n_lines, CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
  CAST(b.n_sentences AS BIGINT) AS n_sentences,
  CAST(CASE WHEN NOT b.lor AND NOT b.br AND b.n_sentences >= 3
            AND coalesce(a.n_kept, 0) >= 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM base b LEFT JOIN agg a USING (doc_id)""",
        "deduped_lines": f"""
WITH {_LINED_SQL},
lines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
          generate_subscripts(string_split(text, chr(10)),1) AS i FROM lined),
firsts AS (SELECT doc_id, line, i,
  row_number() OVER (PARTITION BY doc_id, line ORDER BY i) AS rn FROM lines)
SELECT doc_id,
  string_agg(line, chr(10) ORDER BY i) FILTER (WHERE rn = 1) AS text,
  count(*) AS n_lines,
  count(*) - count(*) FILTER (WHERE rn = 1) AS n_dupes
FROM firsts GROUP BY doc_id""",
        "er_one_to_one": """
WITH c AS (SELECT c_custkey AS id, c_nationkey AS k, c_name AS nm FROM customer),
l AS (SELECT * FROM c WHERE id % 4 = 0),
r AS (SELECT * FROM c WHERE id % 4 <> 0),
p AS (SELECT l.id AS il, r.id AS ir,
  CAST(floor(jaro_winkler_similarity(l.nm, r.nm)*10000) AS BIGINT) AS bp
  FROM l JOIN r ON l.k = r.k),
bl AS (SELECT il, ir, bp,
  row_number() OVER (PARTITION BY il ORDER BY bp DESC, ir) AS rn FROM p),
br AS (SELECT il, ir, bp,
  row_number() OVER (PARTITION BY ir ORDER BY bp DESC, il) AS rn FROM p)
SELECT bl.il AS id_l, bl.ir AS id_r, bl.bp AS sim_bp
FROM bl JOIN br ON bl.il = br.il AND bl.ir = br.ir
WHERE bl.rn = 1 AND br.rn = 1 AND bl.bp >= 7000""",
        "fs_em_weights": _fs_em_sql(final="weights"),
        "fs_em_posteriors": _fs_em_sql(final="posteriors"),
        "er_clusters_em": _fs_em_sql(final="clusters"),
        "fs_scores": """
WITH c AS (SELECT c_custkey AS id, c_nationkey AS k, c_mktsegment AS seg,
  CAST(floor(c_acctbal/1000) AS BIGINT) AS bal, right(c_name,1) AS last1, c_name FROM customer),
p AS (SELECT a.id AS ia, b.id AS ib,
  CASE WHEN a.seg=b.seg THEN 1 ELSE 0 END AS a_seg,
  CASE WHEN a.bal=b.bal THEN 1 ELSE 0 END AS a_bal,
  CASE WHEN a.last1=b.last1 THEN 1 ELSE 0 END AS a_last1,
  CASE WHEN levenshtein(a.c_name,b.c_name)<=1 THEN 1 ELSE 0 END AS lbl
 FROM c a JOIN c b ON a.k=b.k AND a.id<b.id),
s AS (SELECT sum(lbl) AS n1, sum(1-lbl) AS n0,
  sum(a_seg*lbl) AS s1_seg, sum(a_seg*(1-lbl)) AS s0_seg,
  sum(a_bal*lbl) AS s1_bal, sum(a_bal*(1-lbl)) AS s0_bal,
  sum(a_last1*lbl) AS s1_last1, sum(a_last1*(1-lbl)) AS s0_last1 FROM p)
SELECT p.ia AS id_a, p.ib AS id_b, p.lbl AS label,
 (CASE WHEN p.a_seg=1 THEN log2(((s.s1_seg+0.5)/(s.n1+1))/((s.s0_seg+0.5)/(s.n0+1)))
       ELSE log2((1-(s.s1_seg+0.5)/(s.n1+1))/(1-(s.s0_seg+0.5)/(s.n0+1))) END)
 + (CASE WHEN p.a_bal=1 THEN log2(((s.s1_bal+0.5)/(s.n1+1))/((s.s0_bal+0.5)/(s.n0+1)))
       ELSE log2((1-(s.s1_bal+0.5)/(s.n1+1))/(1-(s.s0_bal+0.5)/(s.n0+1))) END)
 + (CASE WHEN p.a_last1=1 THEN log2(((s.s1_last1+0.5)/(s.n1+1))/((s.s0_last1+0.5)/(s.n0+1)))
       ELSE log2((1-(s.s1_last1+0.5)/(s.n1+1))/(1-(s.s0_last1+0.5)/(s.n0+1))) END) AS score
FROM p CROSS JOIN s""",
        "er_clusters_bucket": """
WITH RECURSIVE e AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
SELECT u AS member_id, CAST(min(v) AS BIGINT) AS cluster_id
FROM reach GROUP BY u""",
        "er_clusters_dist": """
WITH RECURSIVE e AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
SELECT u AS member_id, CAST(min(v) AS BIGINT) AS cluster_id
FROM reach GROUP BY u""",
        "out_links": f"""{occ}
SELECT DISTINCT 'https://crawl.example.org/' || source || '/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS src,
       entity_id AS dst
FROM occ WHERE cnt > 0""",
        "minhash_pairs": _minhash_sql(),
        # LSH recall vs the exact resemblance join: the exact side
        # joins literal gram strings (collision-free vs the engine's
        # M61 hashes at gate scale); the LSH side is the minhash
        # replica counted; recall as exact integer division.
        "lsh_recall": f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id, list_aggregate(ws[j:j+4], 'string_agg', ' ') AS win
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 3)) AS j) s(j)),
d AS (SELECT DISTINCT doc_id, win FROM g),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY doc_id),
i AS (SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS m
      FROM d a JOIN d b ON a.win = b.win AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
ex AS (SELECT i.da, i.db FROM i JOIN sz sa ON sa.doc_id = i.da
       JOIN sz sb ON sb.doc_id = i.db
       WHERE i.m * 10000 >= 5000 * (sa.n + sb.n - i.m)),
mh AS (SELECT CAST(count(*) AS BIGINT) AS n_lsh FROM ({_minhash_sql()})),
exn AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ex)
SELECT exn.n_exact, mh.n_lsh,
       CAST((10000 * mh.n_lsh) // greatest(exn.n_exact, 1) AS BIGINT) AS recall_bp
FROM exn, mh""",
        "minhash_attach": _minhash_attach_sql(),
        "ppjoin_pairs": _PPJOIN_SQL,
        "simhash_pairs": _simhash_sql(),
        "neardup_clusters": _neardup_sql(),
        "pii_scrub": _pii_sql(),
        # Transitive closure over the embedding_dup pair predicate
        # (stages/dedup.embedding_neardup_clusters).
        "embedding_neardup": """
WITH RECURSIVE e AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.35),
sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
reach(u, v) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
SELECT u AS vec_id, CAST(min(v) AS BIGINT) AS canonical_id
FROM reach GROUP BY u""",
        # Distributed ORDER BY (stages/stats.global_rank): exact
        # row_number over (n_chars desc, doc_id).
        # Fixed-point PageRank (stages/graph.py): unrolled iterations,
        # all-integer math — bit-identical across engines by design.
        "pagerank": _pagerank_sql(),
        "communities": _label_prop_sql(),
        "purchase_walks": _walks_sql(),
        "weighted_pagerank": _weighted_pagerank_sql(),
        "purchase_ppr": _ppr_sql(),
        "purchase_kcore": _kcore_sql(),
        # BFS distances (stages/graph.py bfs_distances): bounded
        # recursive closure + MIN(dist) per reached node; the bound
        # (dist < 64) mirrors the Ray side's max_rounds.
        "purchase_sssp": _sssp_sql(),
        "debounced_events": """
WITH s AS (SELECT user_id, event_type, ts, event_id,
  CAST(coalesce(date_diff('microsecond', lag(ts) OVER w, ts), -1) AS BIGINT) AS gap_us
  FROM events WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
SELECT user_id, event_type, ts, event_id, gap_us
FROM s WHERE gap_us = -1 OR gap_us >= 86400000000""",
        "nil_clusters": _nil_sql(),
        "nil_attach": _nil_sql(),
        "weekly_retention": """
WITH uw AS (SELECT DISTINCT user_id,
  (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) // 7 AS week
  FROM events),
c AS (SELECT user_id, min(week) AS cohort FROM uw GROUP BY user_id)
SELECT CAST(c.cohort AS BIGINT) AS cohort_week,
  CAST(uw.week - c.cohort AS BIGINT) AS week_offset,
  CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN c USING (user_id) GROUP BY 1, 2""",
        "scd2_events": """
WITH s AS (SELECT user_id, ts, event_id, event_type,
  CASE WHEN lag(event_type) OVER w IS NULL
         OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
r AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS run FROM s),
g AS (SELECT user_id, event_type, run, min(ts) AS valid_from,
      min(event_id) AS mineid, CAST(count(*) AS BIGINT) AS n_events
      FROM r GROUP BY user_id, event_type, run),
f AS (SELECT user_id, event_type, valid_from,
      lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, mineid) AS valid_to,
      n_events FROM g)
SELECT user_id, event_type, valid_from,
  coalesce(valid_to, TIMESTAMP '9999-12-31') AS valid_to, n_events,
  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM f""",
        "signup_funnel": """
WITH u AS (SELECT DISTINCT user_id FROM events),
s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
       JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
       WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
       JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT u.user_id,
  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS n_steps,
  coalesce(s1.t1, TIMESTAMP '9999-12-31') AS ts_1,
  coalesce(s2.t2, TIMESTAMP '9999-12-31') AS ts_2,
  coalesce(s3.t3, TIMESTAMP '9999-12-31') AS ts_3
FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)""",
        "purchase_distances": """
WITH RECURSIVE eds AS (
  SELECT DISTINCT 2*o.o_custkey AS src, 2*l.l_suppkey+1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
edges AS (SELECT src, dst FROM eds UNION SELECT dst, src FROM eds),
seed AS (SELECT 2 * MIN(o_custkey) AS node FROM orders),
walk(node, d) AS (
  SELECT node, 0 FROM seed
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.d < 64)
SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM walk GROUP BY node""",
        # Bipartite projection (stages/graph.py bipartite_project):
        # weight = number of distinct shared keys.
        "cosupply_edges": """
WITH di AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT a.l_suppkey AS src, b.l_suppkey AS dst, CAST(count(*) AS BIGINT) AS w
FROM di a JOIN di b
  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
GROUP BY a.l_suppkey, b.l_suppkey""",
        # HyperLogLog registers (stages/sketch.py): md5-low64 token
        # hash, register = top 6 bits, rho = leading-zero rank of the
        # 58-bit remainder (+1); bin() gives the exact bit length.
        "hll_tokens": """
WITH toks AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hash FROM toks),
r AS (SELECT CAST(hash >> 58 AS BIGINT) AS register,
             hash & ((1::UBIGINT << 58) - 1) AS rem
      FROM h)
SELECT register,
       CAST(max(CASE WHEN rem = 0 THEN 59 ELSE 59 - length(bin(rem)) END) AS BIGINT) AS rho
FROM r GROUP BY register""",
        "hll_by_lang": """
WITH toks AS (SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT lang, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hash FROM toks),
r AS (SELECT lang, CAST(hash >> 58 AS BIGINT) AS register,
             hash & ((1::UBIGINT << 58) - 1) AS rem
      FROM h)
SELECT lang, register,
       CAST(max(CASE WHEN rem = 0 THEN 59 ELSE 59 - length(bin(rem)) END) AS BIGINT) AS rho
FROM r GROUP BY lang, register""",
        # Triangle counts (stages/graph.py triangle_counts): the oracle
        # counts each triangle once via an a<b<c three-way self-join —
        # orientation-free, so it checks the algorithm's RESULT, not
        # its degree-ordering mechanics.
        "supplier_triangles": """
WITH eds AS (
  SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM eds e1 JOIN eds e2 ON e2.a = e1.b
              JOIN eds e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT node, CAST(count(*) AS BIGINT) AS triangles
FROM (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
GROUP BY node""",
        # Duplicate-span removal (stages/substring.py strip_dup_spans):
        # same gram-hash fold as dup_ngrams; an occurrence is redundant
        # when a smaller doc_id holds the gram; kept text = tokens not
        # inside any redundant [j, j+5) interval, space-joined in order.
        "stripped_corpus": """
WITH th AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         list_transform(string_split(text, ' '),
           t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT % 2305843009213693951) AS hs
  FROM documents
), g AS (
  SELECT doc_id, j,
         list_reduce(hs[j : j + 4],
           (a, b) -> CAST((CAST(a AS UHUGEINT) * 1000003 + CAST(b AS UHUGEINT))
                          % 2305843009213693951 AS UBIGINT)) AS h
  FROM th, LATERAL (SELECT unnest(generate_series(1, len(hs) - 4)) AS j) s(j)
), md AS (SELECT h, MIN(doc_id) AS mdoc FROM g GROUP BY h),
red AS (SELECT g.doc_id, g.j FROM g JOIN md USING (h) WHERE g.doc_id > md.mdoc),
tok AS (
  SELECT doc_id, unnest(toks) AS tk,
         unnest(generate_series(1, len(toks))) AS i
  FROM th
), keep AS (
  SELECT t.doc_id, t.tk, t.i,
         EXISTS (SELECT 1 FROM red r WHERE r.doc_id = t.doc_id
                 AND r.j <= t.i AND t.i < r.j + 5) AS cov
  FROM tok t
)
SELECT h.doc_id,
       COALESCE(string_agg(tk, ' ' ORDER BY i) FILTER (WHERE NOT cov), '') AS text,
       CAST(COALESCE(COUNT(*) FILTER (WHERE cov), 0) AS BIGINT) AS removed_tokens
FROM th h LEFT JOIN keep USING (doc_id)
GROUP BY h.doc_id""",
        # Duplicate n-gram coverage (stages/substring.py): same M61
        # Horner gram hashes as winnow_fps; a gram is duplicated iff
        # ≥2 distinct docs contain it; covered = equal-interval union
        # via LEAD. All-int output — exact compare.
        "dup_ngrams": """
WITH th AS (
  SELECT doc_id, list_transform(string_split(text, ' '),
           t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT % 2305843009213693951) AS hs
  FROM documents
), g AS (
  SELECT doc_id, j,
         list_reduce(hs[j : j + 4],
           (a, b) -> CAST((CAST(a AS UHUGEINT) * 1000003 + CAST(b AS UHUGEINT))
                          % 2305843009213693951 AS UBIGINT)) AS h
  FROM th, LATERAL (SELECT unnest(generate_series(1, len(hs) - 4)) AS j) s(j)
), dup AS (
  SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), dp AS (
  SELECT doc_id, j,
         LEAD(j) OVER (PARTITION BY doc_id ORDER BY j) AS nj
  FROM g WHERE h IN (SELECT h FROM dup)
), cov AS (
  SELECT doc_id, COUNT(*) AS dg,
         SUM(LEAST(COALESCE(nj - j, 5), 5)) AS cv
  FROM dp GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.hs) AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.dg, 0) AS BIGINT) AS dup_grams,
       CAST(COALESCE(c.cv, 0) AS BIGINT) AS covered_tokens
FROM th t LEFT JOIN cov c USING (doc_id)""",
        "doc_ranks": """
SELECT doc_id, n_chars,
       CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
FROM documents""",
        # CDC chunking (stages/chunking.py): same gram-hash fold as
        # winnow_fps; cuts at gram hash % 16 == 0, chunk hash =
        # list_reduce Horner over the chunk's token hashes.
        "cdc_chunks": """
WITH th AS (
  SELECT doc_id, list_transform(string_split(text, ' '),
           t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT % 2305843009213693951) AS hs
  FROM documents
), g AS (
  SELECT doc_id, j,
         list_reduce(hs[j : j + 3],
           (a, b) -> CAST((CAST(a AS UHUGEINT) * 1000003 + CAST(b AS UHUGEINT))
                          % 2305843009213693951 AS UBIGINT)) AS h
  FROM th, LATERAL (SELECT unnest(generate_series(1, len(hs) - 3)) AS j) s(j)
), cuts AS (
  SELECT doc_id, 0 AS cut FROM th WHERE len(hs) > 0
  UNION
  SELECT doc_id, j AS cut FROM g WHERE h % 16 = 0
  UNION
  SELECT doc_id, len(hs) AS cut FROM th WHERE len(hs) > 0
), seq AS (
  SELECT doc_id, cut,
         lead(cut) OVER (PARTITION BY doc_id ORDER BY cut) AS nxt,
         row_number() OVER (PARTITION BY doc_id ORDER BY cut) - 1 AS chunk_idx
  FROM cuts
)
SELECT s.doc_id, CAST(s.chunk_idx AS BIGINT) AS chunk_idx,
       CAST(s.cut AS BIGINT) AS start_tok,
       CAST(s.nxt - s.cut AS BIGINT) AS n_tokens,
       CAST(list_reduce(th.hs[s.cut + 1 : s.nxt],
         (a, b) -> CAST((CAST(a AS UHUGEINT) * 1000003 + CAST(b AS UHUGEINT))
                        % 2305843009213693951 AS UBIGINT)) AS BIGINT) AS chunk_hash
FROM seq s JOIN th USING (doc_id) WHERE s.nxt IS NOT NULL""",
        # Winnowing (stages/winnow.py): same md5→M61 Horner gram hash
        # (list_reduce fold = the k affine passes), rightmost-min =
        # max(j) among the window's min-hash rows; docs shorter than
        # k+w-1 tokens yield no complete window on either side.
        "winnow_fps": """
WITH th AS (
  SELECT doc_id, list_transform(string_split(text, ' '),
           t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT % 2305843009213693951) AS hs
  FROM documents
), g AS (
  SELECT doc_id, j,
         list_reduce(hs[j : j + 3],
           (a, b) -> CAST((CAST(a AS UHUGEINT) * 1000003 + CAST(b AS UHUGEINT))
                          % 2305843009213693951 AS UBIGINT)) AS h
  FROM th, LATERAL (SELECT unnest(generate_series(1, len(hs) - 3)) AS j) s(j)
), wn AS (
  SELECT doc_id, s
  FROM (SELECT doc_id, max(j) AS gmax FROM g GROUP BY doc_id),
       LATERAL (SELECT unnest(generate_series(1, gmax - 4)) AS s) t(s)
), wp AS (
  SELECT wn.doc_id, wn.s, g.j, g.h,
         min(g.h) OVER (PARTITION BY wn.doc_id, wn.s) AS mh
  FROM wn JOIN g ON g.doc_id = wn.doc_id AND g.j BETWEEN wn.s AND wn.s + 4
), sel AS (
  SELECT doc_id, s, max(j) AS pj FROM wp WHERE h = mh GROUP BY doc_id, s
)
SELECT DISTINCT sel.doc_id, CAST(sel.pj - 1 AS BIGINT) AS pos,
       CAST(g.h AS BIGINT) AS fp
FROM sel JOIN g ON g.doc_id = sel.doc_id AND g.j = sel.pj""",
        # Inverted index (stages/index.py): identical doc_id-ordered
        # "doc:tf" serialization.
        "inverted_index": """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
tf AS (SELECT tk, doc_id, count(*) AS tf FROM tok GROUP BY tk, doc_id)
SELECT tk AS token, CAST(count(*) AS BIGINT) AS df,
       string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY tk""",
        # Distributed ordered prefix-sum (stages/packing.py): the
        # window cumsum IS the scan's spec.
        "packed_sequences": """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM t
)
SELECT doc_id, n_tokens, CAST(start_tok AS BIGINT) AS start_tok,
       CAST(start_tok // 2048 AS BIGINT) AS chunk_id
FROM c""",
        "expanded_anchors": f"""{occ},
ed(mention, entity_id) AS (SELECT DISTINCT * FROM (VALUES {', '.join(f"('{m}', '{e}')" for m, e in _EXPAND_DICT_ROWS)}))
SELECT mention, entity_id, CAST(link_count AS BIGINT) AS link_count FROM ma
UNION ALL
SELECT e.mention, e.entity_id, CAST(1 AS BIGINT) AS link_count
FROM ed e
WHERE e.mention IN (SELECT mention FROM ma)
  AND NOT EXISTS (SELECT 1 FROM ma
                  WHERE ma.mention = e.mention AND ma.entity_id = e.entity_id)""",
        "title_entities": f"""{occ},
ed(mention, entity_id) AS (SELECT DISTINCT * FROM (VALUES {', '.join(f"('{m}', '{e}')" for m, e in _EXPAND_DICT_ROWS)}))
SELECT mention, min(entity_id) AS entity_id
FROM ed WHERE mention NOT IN (SELECT mention FROM ma)
GROUP BY mention""",
        "merged_anchors": f"""{occ}
SELECT mention, entity_id FROM ma
UNION
SELECT * FROM (VALUES {', '.join(f"('{m}', '{e}')" for m, e in _MANUAL_ANCHOR_ROWS)}) m(mention, entity_id)""",
        "merged_link_prob": f"""{occ},
link_m AS (SELECT mention, CAST(sum(link_count) AS BIGINT) AS link_m FROM ma GROUP BY mention),
fm AS (
  SELECT a.mention,
         CAST(sum((length(d.text) - length(replace(d.text, a.mention, ''))) / length(a.mention)) AS BIGINT) AS freq_m
  FROM documents d CROSS JOIN (SELECT DISTINCT mention FROM alias) a
  GROUP BY a.mention),
orig AS (
  SELECT ma.mention, ma.entity_id, link_m.link_m, fm.freq_m,
         CAST(link_m.link_m AS DOUBLE) / fm.freq_m AS link_prob,
         CAST(ma.link_count AS DOUBLE) / link_m.link_m AS e_given_m
  FROM ma JOIN link_m ON ma.mention = link_m.mention
          JOIN fm ON ma.mention = fm.mention),
manual(mention, entity_id, link_m, freq_m, link_prob, e_given_m) AS (
  SELECT * FROM (VALUES {', '.join(f"('{r[0]}', '{r[1]}', CAST({r[2]} AS BIGINT), CAST({r[3]} AS BIGINT), CAST({r[4]} AS DOUBLE), CAST({r[5]} AS DOUBLE))" for r in _MANUAL_LP_ROWS)}))
SELECT * FROM manual
UNION ALL
SELECT o.* FROM orig o
WHERE NOT EXISTS (SELECT 1 FROM manual m
                  WHERE m.mention = o.mention AND m.entity_id = o.entity_id)""",
        "kmeans_sizes": f"""{_kmeans_cte()}
SELECT cell, CAST(count(*) AS BIGINT) AS n FROM a_final GROUP BY cell""",
        "semantic_dedup": f"""{_kmeans_cte()}
SELECT a.vec_id, a.cell FROM a_final a
WHERE NOT EXISTS (
  SELECT 1 FROM a_final b
  WHERE b.cell = a.cell AND b.vec_id < a.vec_id
    AND round(list_cosine_similarity(a.v, b.v), 9) >= 0.35)""",
        "part_soundex": _soundex_sql("p_name"),
        "doc_keywords": """WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY doc_id, token),
dfx AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM w GROUP BY token),
nd AS (SELECT count(*) AS n FROM documents),
sc AS (
  SELECT tf.doc_id, tf.token,
         tf.tf * CAST(round(ln((nd.n + 1.0) / (dfx.df + 1)) * 1000000) AS BIGINT) AS score_m
  FROM tf JOIN dfx USING (token), nd),
r AS (
  SELECT doc_id, token, score_m,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score_m DESC, token) AS BIGINT) AS rank
  FROM sc)
SELECT doc_id, token, score_m, rank FROM r WHERE rank <= 5""",
        "bigram_lm": """WITH w AS (
  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents),
mw AS (SELECT * FROM w WHERE doc_id % 2 = 0),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM mw GROUP BY tok),
tot AS (SELECT count(*) AS n FROM mw),
bg AS (
  SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS c
  FROM mw a JOIN mw b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2),
p AS (
  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
sc AS (
  SELECT p.doc_id,
         CASE WHEN bg.c IS NOT NULL AND COALESCE(u1.c, 0) > 0
              THEN log10(CAST(bg.c AS DOUBLE) / u1.c)
              ELSE log10(0.4 * (COALESCE(u2.c, 0) + 1) / ((SELECT n FROM tot) + 1))
         END AS lp
  FROM p LEFT JOIN bg ON bg.w1 = p.w1 AND bg.w2 = p.w2
         LEFT JOIN uni u1 ON u1.tok = p.w1
         LEFT JOIN uni u2 ON u2.tok = p.w2)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, sum(lp) AS logprob
FROM sc GROUP BY doc_id""",
        "paragraph_dedup": """WITH w AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents),
p AS (
  SELECT doc_id, (pos - 1) // 12 AS pidx,
         string_agg(tok, ' ' ORDER BY pos) AS para
  FROM w GROUP BY doc_id, (pos - 1) // 12),
k AS (
  SELECT doc_id, pidx, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pidx) AS rn
  FROM p)
SELECT doc_id, string_agg(para, chr(10) ORDER BY pidx) AS text,
       CAST(count(*) AS BIGINT) AS n_paras
FROM k WHERE rn = 1 GROUP BY doc_id""",
        "latest_events": """SELECT user_id, event_id FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1""",
        "event_props": """SELECT event_type,
       CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type""",
        "er_threshold_sweep": """WITH s AS (
  SELECT CAST(floor(jaro_winkler_similarity(a.c_name, b.c_name) * 10000) AS BIGINT) AS jw,
         (levenshtein(a.c_name, b.c_name) <= 1) AS gold
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey),
t(th) AS (VALUES (9000), (9200), (9400), (9600), (9800)),
agg AS (
  SELECT t.th,
         count(*) FILTER (WHERE s.jw >= t.th AND s.gold) AS tp,
         count(*) FILTER (WHERE s.jw >= t.th AND NOT s.gold) AS fp,
         (SELECT count(*) FROM s WHERE gold) AS gold_n
  FROM s, t GROUP BY t.th)
SELECT CAST(th AS BIGINT) AS th, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(gold_n - tp AS BIGINT) AS fn,
       CAST(CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp) ELSE 0 END AS BIGINT) AS prec_ppm,
       CAST(CASE WHEN gold_n > 0 THEN tp * 1000000 // gold_n ELSE 0 END AS BIGINT) AS rec_ppm
FROM agg""",
        "pair_features": """WITH r AS (
  SELECT c_custkey AS id, c_name AS key,
         row_number() OVER (ORDER BY c_name, c_custkey) AS rn
  FROM customer)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS lev,
       CAST(floor(jaro_winkler_similarity(a.key, b.key) * 10000) AS BIGINT) AS jw_bp,
       CAST(abs(length(a.key) - length(b.key)) AS BIGINT) AS len_diff
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5""",
        "mixture_plan": f"""WITH {_mix_plan_cte()}
SELECT lang, weight, CAST(rate_ppm AS BIGINT) AS rate_ppm FROM plan""",
        "mixture_corpus": f"""WITH {_mix_plan_cte()}
SELECT d.doc_id, d.lang
FROM documents d JOIN plan p USING (lang)
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 16))::UBIGINT % 1000000 < p.rate_ppm""",
        "embedding_znorm": """WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings),
st AS (SELECT pos, avg(val) AS mu, stddev_pop(val) AS sd FROM e GROUP BY pos),
z AS (
  SELECT e.vec_id,
         (e.val - st.mu) / (CASE WHEN st.sd = 0 THEN 1 ELSE st.sd END) AS zv
  FROM e JOIN st USING (pos))
SELECT vec_id, sqrt(sum(zv * zv)) AS znorm FROM z GROUP BY vec_id""",
        "part_codes": """SELECT p_partkey,
       CAST(dense_rank() OVER (ORDER BY p_name) - 1 AS BIGINT) AS p_name_code
FROM part""",
        "unigram_vocab": _unigram_sql("vocab"),
        "unigram_tokens": _unigram_sql("tokens"),
        "unigram_fertility": _unigram_sql("fertility"),
        "part_pprl_pairs": """
WITH p AS (SELECT p_partkey AS id, p_brand AS k, p_name AS nm FROM part),
pos AS (SELECT unnest(generate_series(1, 60)) AS i),
dg AS (SELECT DISTINCT id, k, substr(nm, i, 2) AS gram
       FROM p, pos WHERE i <= length(nm) - 1),
salts(s) AS (VALUES (0), (1), (2)),
bitrows AS (SELECT DISTINCT id, k,
  ('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || gram), 1, 16))::UBIGINT % 64 AS b
  FROM dg, salts),
bl AS (SELECT id, k, bit_or(CAST(1 AS UBIGINT) << CAST(b AS INTEGER)) AS bloom
       FROM bitrows GROUP BY id, k),
sc AS (SELECT a.id AS ia, b.id AS ib,
  2 * bit_count(a.bloom & b.bloom) * 10000
    // (bit_count(a.bloom) + bit_count(b.bloom)) AS dice
 FROM bl a JOIN bl b ON a.k = b.k AND a.id < b.id)
SELECT ia AS id_a, ib AS id_b, CAST(dice AS BIGINT) AS dice_bp
FROM sc WHERE dice >= 6500""",
        "part_tfidf_pairs": """
WITH p AS (SELECT p_partkey AS id, p_name AS nm, p_brand FROM part),
tok AS (SELECT DISTINCT id, unnest(string_split(nm,' ')) AS t FROM p),
df AS (SELECT t, count(*) AS df FROM tok GROUP BY t),
nn AS (SELECT count(*) AS n FROM p),
idf AS (SELECT t, CAST(floor(ln(CAST(n AS DOUBLE)/df)*1e6+0.5) AS BIGINT) AS w
        FROM df CROSS JOIN nn),
tw AS (SELECT tok.id, tok.t, i.w*i.w AS w2 FROM tok JOIN idf i USING (t)),
norm AS (SELECT id, sum(w2) AS d FROM tw GROUP BY id),
pr AS (SELECT a.id AS ia, b.id AS ib FROM p a JOIN p b
       ON a.p_brand = b.p_brand AND a.id < b.id),
inter AS (SELECT pr.ia, pr.ib, sum(ta.w2) AS num FROM pr
  JOIN tw ta ON ta.id = pr.ia
  JOIN tw tb ON tb.id = pr.ib AND tb.t = ta.t
  GROUP BY pr.ia, pr.ib),
sc AS (SELECT pr.ia, pr.ib,
  CASE WHEN na.d = 0 OR nb.d = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST(floor(CAST(coalesce(i.num, 0) AS DOUBLE)
            / sqrt(CAST(na.d AS DOUBLE)*CAST(nb.d AS DOUBLE))*1e6+0.5) AS BIGINT)
  END AS cos_e6
 FROM pr LEFT JOIN inter i ON i.ia = pr.ia AND i.ib = pr.ib
 JOIN norm na ON na.id = pr.ia JOIN norm nb ON nb.id = pr.ib)
SELECT ia AS id_a, ib AS id_b, cos_e6 FROM sc WHERE cos_e6 >= 600000""",
        "part_monge_pairs": """
WITH p AS (SELECT a.p_partkey AS ia, b.p_partkey AS ib, a.p_name AS sa, b.p_name AS sb
  FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey),
ta AS (SELECT ia, ib, unnest(string_split(sa,' ')) AS tok,
       generate_subscripts(string_split(sa,' '),1) AS i FROM p),
tb AS (SELECT ia, ib, unnest(string_split(sb,' ')) AS tok,
       generate_subscripts(string_split(sb,' '),1) AS i FROM p),
g AS (SELECT ta.ia, ta.ib, ta.i AS ai, tb.i AS bi,
      jaro_winkler_similarity(ta.tok, tb.tok) AS jw
  FROM ta JOIN tb ON ta.ia = tb.ia AND ta.ib = tb.ib),
mA AS (SELECT ia, ib, ai, CAST(floor(max(jw)*10000+0.5) AS BIGINT) AS best
  FROM g GROUP BY ia, ib, ai),
mB AS (SELECT ia, ib, bi, CAST(floor(max(jw)*10000+0.5) AS BIGINT) AS best
  FROM g GROUP BY ia, ib, bi),
sA AS (SELECT ia, ib, CAST(sum(best) AS DOUBLE)/count(*) AS mean_a FROM mA GROUP BY ia, ib),
sB AS (SELECT ia, ib, CAST(sum(best) AS DOUBLE)/count(*) AS mean_b FROM mB GROUP BY ia, ib),
s AS (SELECT sA.ia, sA.ib, CAST(floor((mean_a+mean_b)/2 + 0.5) AS BIGINT) AS me_bp
  FROM sA JOIN sB ON sA.ia = sB.ia AND sA.ib = sB.ib)
SELECT ia AS id_a, ib AS id_b, me_bp FROM s WHERE me_bp >= 8600""",
        "part_fuzzy_pairs": """WITH p AS (
  SELECT p_partkey, p_brand,
         list_aggregate(list_sort(string_split(p_name, ' ')), 'string_agg', ' ') AS skey
  FROM part)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       CAST(levenshtein(a.skey, b.skey) AS BIGINT) AS dist
FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.skey, b.skey) <= 3""",
        "er_pairs_snm": """WITH r AS (
  SELECT c_custkey AS id, c_name AS key,
         row_number() OVER (ORDER BY c_name, c_custkey) AS rn
  FROM customer)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5""",
        "length_band_docs": """WITH r AS (
  SELECT lang, n_chars,
         sum(cnt) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
         sum(cnt) OVER (PARTITION BY lang) AS tot
  FROM (SELECT lang, n_chars, count(*) AS cnt FROM documents GROUP BY lang, n_chars)),
b AS (
  SELECT lang,
         min(n_chars) FILTER (WHERE cum >= ceil(0.25 * tot)) AS lo_v,
         min(n_chars) FILTER (WHERE cum >= ceil(0.75 * tot)) AS hi_v
  FROM r GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN b USING (lang)
WHERE d.n_chars BETWEEN b.lo_v AND b.hi_v""",
        "clean_paragraphs": """WITH w AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents),
p AS (
  SELECT doc_id, (pos - 1) // 12 AS pidx,
         string_agg(tok, ' ' ORDER BY pos) AS para,
         CAST(count(*) AS BIGINT) AS nw
  FROM w GROUP BY doc_id, (pos - 1) // 12),
k AS (
  SELECT doc_id, pidx, para FROM p
  WHERE nw >= 12 AND list_contains(string_split(para, ' '), 'the'))
SELECT doc_id, string_agg(para, chr(10) ORDER BY pidx) AS text,
       CAST(count(*) AS BIGINT) AS n_paras
FROM k GROUP BY doc_id""",
        "normalized_docs": f"""WITH s AS (
  SELECT doc_id,
         text || '  ' || (['{_ACCENT_SUFFIXES[0]}','{_ACCENT_SUFFIXES[1]}','{_ACCENT_SUFFIXES[2]}','{_ACCENT_SUFFIXES[3]}'])[CAST(doc_id % 4 AS INT) + 1] || ' ' AS text
  FROM documents)
SELECT doc_id,
       trim(regexp_replace(strip_accents(lower(text)), '\\s+', ' ', 'g')) AS norm_text
FROM s""",
        "user_running_stats": """SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       lag(value) OVER w AS lag_value,
       date_diff('microsecond', lag(ts) OVER w, ts) AS gap_us,
       sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_sum,
       avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        "url_features": f"""{_url_cte()}
SELECT doc_id, https, host, domain, tld, CAST(path_depth AS BIGINT) AS path_depth FROM feat""",
        "domain_stats": f"""{_url_cte()}
SELECT domain, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS weight
FROM feat WHERE domain NOT IN ({", ".join(f"'{d}'" for d in sorted(_URL_BLOCKLIST))})
GROUP BY domain""",
        "dataset_split": """WITH h AS (
  SELECT lang,
         CASE WHEN hv < 90 THEN 'train' WHEN hv < 95 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT lang,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT % 100 AS hv
        FROM documents))
SELECT split, lang, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY split, lang""",
    }
    # incremental maintenance ops are pinned EQUAL to their full
    # recomputes — same oracle text by construction
    out["er_golden_incremental"] = out["er_golden"]
    # BPE trainer/encoder: unrolled-iteration replicas (the k-means /
    # pagerank stance — one CTE chain per merge round)
    out["bpe_merges"] = _bpe_merges_sql()
    out["bpe_token_counts"] = _bpe_encode_sql()
    out["bpe_fertility"] = _bpe_fertility_sql()
    out["purchase_hits"] = _hits_sql()
    out["packed_by_bpe"] = _bpe_pack_sql()
    return out
