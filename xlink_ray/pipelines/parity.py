"""Reference-parity linking pipeline: run the fidelity linker (exact
P8-P10 semantics, stages/linking.py) over the synthesized corpus with
the corpus-derived dictionary/probability tables — the batch shape of
the reference's online ``XLinkPredictor.predict`` loop
(reference modules/prob_gm_predictors/xlink.py:108-110).
"""

from __future__ import annotations

import numpy as np

import ray
from ray.data import Dataset

from xlink_ray.util import pool_size

__all__ = ["fidelity_links", "aida_eval"]


def _build_state(sf_dir: str):
    import pyarrow as pa

    from xlink_ray import synth
    from xlink_ray.stages import aggregates
    from xlink_ray.stages.extract import ExtractMentionsBatch
    from xlink_ray.stages.freq import freq_m as freq_m_stage
    from xlink_ray.stages.linking import LinkerState

    pages = synth.synth_pages(sf_dir).select_columns(["url", "text"])
    ments = pages.map_batches(ExtractMentionsBatch(), batch_format="pyarrow")
    ma_tbl = pa.concat_tables(
        [pa.table(b) for b in aggregates.mention_anchors(ments).iter_batches(batch_format="pyarrow")]
    )

    ma_dict: dict[str, list[str]] = {}
    link_m: dict[str, int] = {}
    for m, e, c in zip(
        ma_tbl["mention"].to_pylist(),
        ma_tbl["entity_id"].to_pylist(),
        ma_tbl["link_count"].to_pylist(),
    ):
        ma_dict.setdefault(m, []).append(e)
        link_m[m] = link_m.get(m, 0) + c
    for m in ma_dict:
        ma_dict[m].sort()

    e_given_m = {
        (m, e): c / link_m[m]
        for m, e, c in zip(
            ma_tbl["mention"].to_pylist(),
            ma_tbl["entity_id"].to_pylist(),
            ma_tbl["link_count"].to_pylist(),
        )
    }

    from xlink_ray.stages.extract import ExtractCorpusBatch

    corpus = pages.map_batches(ExtractCorpusBatch(), batch_format="pyarrow")
    vocab_ref = ray.put(sorted(ma_dict.keys()))
    freq_tbl = pa.concat_tables(
        [pa.table(b) for b in freq_m_stage(corpus, vocab_ref).iter_batches(batch_format="pyarrow")]
    )
    freq = dict(zip(freq_tbl["mention"].to_pylist(), freq_tbl["freq"].to_pylist()))
    link_prob = {m: link_m[m] / freq[m] for m in link_m if m in freq}

    emb = synth.synth_embeddings()
    word_vecs = {}
    entity_vecs = {}
    for it, k, v in zip(emb["item"].to_pylist(), emb["kind"].to_pylist(), emb["vec"].to_pylist()):
        if k == "word":
            word_vecs[it] = np.asarray(v)
        else:
            entity_vecs[it] = np.asarray(v)

    return LinkerState(ma_dict, {}, e_given_m, link_prob, word_vecs, entity_vecs)


def fidelity_links(sf_dir: str) -> Dataset:
    from xlink_ray.pipelines import dictbuild
    from xlink_ray.stages.linking import FidelityLinkActor

    state_ref = ray.put(_build_state(sf_dir))
    return dictbuild.corpus(sf_dir).map_batches(
        FidelityLinkActor,
        fn_constructor_args=(state_ref,),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=pool_size(),
        num_cpus=1,
    )


def aida_eval(sf_dir: str, workdir: str = "/tmp/xlink_ray_aida") -> "object":
    """M15 + S12 end-to-end: deterministic AIDA-format fixture →
    ``format_annotation_dataset`` (docs/annotations.json) →
    ``load_annotation_dataset`` → dictionary linking over the imported
    docs → ``linking_eval`` metrics row vs the imported gold
    (NIL-gold spans excluded from ED truth, matching the reference's
    valid-mention filtering, MetricsInputBuilder.py:19-41)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from xlink_ray.sources.annotations import (
        format_annotation_dataset,
        load_annotation_dataset,
        synth_aida_fixture,
        synth_uri_resolver,
    )
    from xlink_ray.stages.evaluation import linking_eval
    from xlink_ray.stages.linking import FidelityLinkActor

    raw = synth_aida_fixture(f"{workdir}/raw.txt", sf_dir)
    format_annotation_dataset(raw, f"{workdir}/ds", synth_uri_resolver())
    docs_tbl, gold_tbl = load_annotation_dataset(f"{workdir}/ds")

    state_ref = ray.put(_build_state(sf_dir))
    docs = rd.from_arrow(docs_tbl)
    pred = docs.map_batches(
        FidelityLinkActor,
        fn_constructor_args=(state_ref,),
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "offset": t["start"],
                "mention": t["label"],
                "entity_id": t["entity_id"],
            }
        ),
        batch_format="pyarrow",
    )
    gold = rd.from_arrow(
        gold_tbl.filter(pc.not_equal(gold_tbl["entity_id"], "NIL")).select(
            ["doc_id", "offset", "mention", "entity_id"]
        )
    )
    return linking_eval(pred, gold)
