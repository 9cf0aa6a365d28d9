"""End-to-end training-corpus curation: the composition a 100-TB
webtext run would actually execute, chaining five independently
oracle-checked operators over ONE materialized read of the corpus:

  exact dedup (hash groupby + keeper semi-JOIN)
    → language filter (heuristic lang-ID, worker-cached profiles)
    → quality filter (min token count, pure pyarrow.compute)
    → benchmark decontamination (fixed-size broadcast gram set)
    → deterministic hash sample

Scale shape: ONE groupby (dedup), ONE hash-shuffle join (keeper ids —
corpus-scale, so a broadcast semi-join is wrong at 100 TB), then three
shuffle-free filter stages. The whole composition has a DuckDB oracle
(query ``curated_corpus``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

__all__ = ["curated_corpus"]


def curated_corpus(
    sf_dir: str,
    min_tokens: int = 30,
    sample_pct: int = 50,
    lang: str = "en",
    k: int = 8,
    n_bench: int = 32,
    num_partitions: int | None = None,
) -> Dataset:
    """documents.parquet → curated (doc_id, lang, n_chars) rows."""
    from xlink_ray.stages.curation import (
        benchmark_gram_ref,
        contamination_counts,
        hash_sample,
    )
    from xlink_ray.stages.dedup import exact_dedup_keepers

    # materialized once: three consumers (fused benchmark top-k pass,
    # dedup-keeper pass, survivor join) re-read object-store blocks
    # instead of re-scanning the parquet; at scales past the object
    # store's capacity Ray spills these blocks to disk rather than
    # re-reading the source
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    ).materialize()
    # static partition count (num_blocks needs materialization on a
    # lazy read); 16 aggregators is the sweet spot measured for this
    # host, and the join repartitions anyway
    nparts = num_partitions or 16

    # benchmark grams from the FULL corpus (the benchmark is defined on
    # the raw input, not the deduped survivor set)
    bench_ref = benchmark_gram_ref(docs, k=k, n_bench=n_bench)

    # 1. exact-dedup keepers: corpus-scale id set → hash-shuffle join,
    # not a broadcast (Ray 2.49: repartition join inputs, materialize
    # the small side first)
    keepers = (
        exact_dedup_keepers(docs)
        .select_columns(["doc_id"])
        .repartition(nparts)
        .materialize()
    )
    survivors = docs.repartition(nparts).join(
        keepers, join_type="inner", num_partitions=nparts, on=("doc_id",)
    )

    def filter_stage(t: pa.Table) -> pa.Table:
        # 2. language filter (worker-cached stopword profiles)
        from xlink_ray.state.cached import cached_state
        from xlink_ray.stages.textstats import LangIdActor

        lid = cached_state(("langid",), LangIdActor)
        pred = lid(t)["pred_lang"]
        keep = pc.equal(pred, lang)
        # 3. quality floor: single-space token count (the oracle-stable
        # tokenization shared with token_counts)
        n_tokens = pc.list_value_length(pc.split_pattern(t["text"], " "))
        keep = pc.and_(keep, pc.greater_equal(n_tokens, min_tokens))
        t = t.filter(keep)
        # 4. decontamination: drop docs sharing any word-k-gram with
        # the broadcast benchmark set
        n_hits = contamination_counts(t, bench_ref, k)
        return t.filter(pa.array(n_hits == 0))

    curated = survivors.map_batches(filter_stage, batch_format="pyarrow")
    # 5. deterministic sample → stable across reruns and partitionings
    return hash_sample(curated, pct=sample_pct).select_columns(
        ["doc_id", "lang", "n_chars"]
    )
