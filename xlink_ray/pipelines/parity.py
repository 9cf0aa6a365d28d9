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

__all__ = ["fidelity_links"]


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
