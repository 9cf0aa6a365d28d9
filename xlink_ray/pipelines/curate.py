"""End-to-end training-corpus curation: the composition a 100-TB
webtext run would actually execute, chaining five independently
oracle-checked operators over ONE materialized read of the corpus:

  exact dedup (one content-hash exchange, survivor rows kept in place)
    → language filter (heuristic lang-ID, worker-cached profiles)
    → quality filter (min token count, pure pyarrow.compute)
    → benchmark decontamination (fixed-size broadcast gram set)
    → deterministic hash sample

Scale shape: ONE content-hash exchange (dedup emits survivor rows in
the bucket — no keeper-id set, no join), then three shuffle-free
filter stages. The whole composition has a DuckDB oracle (query
``curated_corpus``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from xlink_ray.util import read_pq
from ray.data import Dataset

__all__ = ["curated_corpus", "curated_corpus_v2"]


def curated_corpus(
    sf_dir: str,
    min_tokens: int = 30,
    sample_pct: int = 50,
    lang: str = "en",
    k: int = 8,
    n_bench: int = 32,
) -> Dataset:
    """documents.parquet → curated (doc_id, lang, n_chars) rows."""
    from xlink_ray.stages.curation import (
        benchmark_gram_ref,
        contamination_counts,
        hash_sample,
    )
    from xlink_ray.stages.dedup import exact_dedup_survivors

    # materialized once: two consumers (fused benchmark top-k pass and
    # the dedup exchange) re-read object-store blocks instead of
    # re-scanning the parquet; at scales past the object store's
    # capacity Ray spills these blocks to disk rather than re-reading
    docs = read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    ).materialize()

    # benchmark grams from the FULL corpus (the benchmark is defined on
    # the raw input, not the deduped survivor set)
    bench_ref = benchmark_gram_ref(docs, k=k, n_bench=n_bench)

    # 1. exact dedup, survivor rows emitted directly: ONE content-hash
    # exchange (all rows of a hash meet in one bucket, min doc_id kept)
    # — replaces the old keeper-ids + hash-shuffle-join plan, which
    # cost two extra exchanges and Ray's join aggregator pool (~17 s of
    # the 34 s sf0.1 bench time)
    survivors = exact_dedup_survivors(docs)

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


def curated_corpus_v2(
    sf_dir: str,
    ngram_k: int = 5,
    dup_min_shared: int = 3,
    rep_factor: int = 12,
    lm_floor: float = -3.6,
) -> Dataset:
    """Second curation composition, exercising the round-2 operators:

      exact-substring dedup (shared word-k-gram pairs → drop the
      LATER doc of any pair sharing ≥ dup_min_shared windows)
        → repetition filter (Gopher-style: a doc fails when its modal
          bigram covers more than 1/rep_factor of its bigrams —
          integer rule, rep_factor·top_2gram_n ≤ n_2grams)
        → unigram-LM floor (avg token logprob ≥ lm_floor)

    Output: surviving (doc_id, n_words, avg_logprob).

    Scale shape: the dedup branch is shared_ngram_pairs' two shuffles;
    its DROP LIST is bounded by the duplicate count (not the corpus),
    so it broadcasts.  The survivor pass is ONE fused map over the
    corpus: repetition features + LM scores + all three predicates per
    batch — no joins, no further shuffle.  The whole composition has a
    DuckDB oracle (query ``curated_corpus_v2``)."""
    import numpy as np
    import ray

    from xlink_ray.stages.dedup import shared_ngram_pairs
    from xlink_ray.stages.textstats import (
        UnigramScorer,
        repetition_features,
        unigram_vocab,
    )

    docs = read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()

    pairs = shared_ngram_pairs(docs, k=ngram_k, min_shared=dup_min_shared)
    dropped = np.unique(
        np.concatenate(
            [np.zeros(0, np.int64)]
            + [
                b["doc_b"].to_numpy(zero_copy_only=False)
                for b in pairs.iter_batches(batch_format="pyarrow")
            ]
        )
    )
    drop_ref = ray.put(dropped)
    vocab_ref, total = unigram_vocab(docs)

    class Curate(UnigramScorer):
        def __init__(self, vref, t, dref, factor, floor):
            super().__init__(vref, t)
            self.drop = ray.get(dref)
            self.factor, self.floor = factor, floor

        def __call__(self, t: pa.Table) -> pa.Table:
            nw, avg = self.score(t)
            rep = repetition_features(t)
            top2 = rep["top_2gram_n"].to_numpy(zero_copy_only=False)
            n2 = rep["n_2grams"].to_numpy(zero_copy_only=False)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.drop, ids)
            pos[pos == len(self.drop)] = 0
            is_dup = (
                self.drop[pos] == ids if len(self.drop) else np.zeros(len(ids), bool)
            )
            keep = (~is_dup) & (self.factor * top2 <= n2) & (avg >= self.floor)
            return pa.table(
                {
                    "doc_id": pa.array(ids[keep]),
                    "n_words": pa.array(nw[keep]),
                    "avg_logprob": pa.array(avg[keep]),
                }
            )

    return docs.map_batches(
        Curate,
        fn_constructor_args=(vocab_ref, total, drop_ref, rep_factor, lm_floor),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
