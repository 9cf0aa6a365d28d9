"""Flagship web-pages entity-resolution pipeline — the north-star
composition (BASELINE.json north_star / north_rule):

pages (url, warc_ts, html, text, lang)
  → [extract]    markup-strip → corpus; explode → mentions (gold)
  → [dictbuild]  mention_anchors + e_given_m + link_prob (from corpus)
  → [candidates] actor-pool dictionary scan + disambiguation →
                 resolved occurrence links (doc_id, offset, mention,
                 entity_id, believe)
  → [blocking]   explicit groupby shuffle on the normalized blocking
                 key (mention, resolved entity)
  → [edges]      sorted-neighborhood within block: occurrences ordered
                 by (doc_id, offset); adjacent pairs scored by context
                 cosine; O(n) edges per block instead of the n² grid
  → [clusters]   transitive closure (connected components) →
                 (member_id, cluster_id)

Spec decisions (the transcription oracle in tests/oracle_flagship.py
implements the same spec single-process and must agree exactly —
pairwise F1 == 1.0 ≥ the 0.99 gate):

* occurrence record id = ``url#offset`` (string, unique, stable),
* blocking key = (mention surface, resolved entity id) — the mention
  key of the north rule refined by the disambiguation output; hot
  aliases therefore split by entity before any pair is generated,
* within a block, edges connect occurrences adjacent in
  (doc_id, offset) order — the sorted-neighborhood method (public
  record-linkage technique) that bounds per-block pair count linearly,
* edge kept iff context cosine ≥ EDGE_TH (contexts from the same
  deterministic embedding table both sides),
* cluster id = min member id (lexicographic).

Divergence from the reference linker, documented: the v2 believe score
drops the seed-entity term P(e|N) (reference xlink.py:328-336) — the
seed-coupling makes scores order-dependent within a document and is
exercised separately by the fidelity linker stage (stages/linking.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from xlink_ray.stages.candidates import CandidateGenActor
from xlink_ray.stages.clustering import connected_components
from xlink_ray.state.broadcast import broadcast_table

__all__ = ["links", "clusters", "EDGE_TH"]

EDGE_TH = 0.0  # context-cosine threshold for sorted-neighborhood edges


def _collect(ds: Dataset) -> pa.Table:
    tbls = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(tbls) if tbls else pa.table({})


def links(sf_dir: str, concurrency: int | tuple[int, int] = (1, 8)) -> Dataset:
    """pages → resolved occurrence links (the XLink `links` table).

    Pass structure (each corpus pass counted once):
      1. synth pages → (url, text), materialized (html projected away),
      2. markup-strip → corpus, materialized (consumed by the freq scan
         AND the candidate scan),
      3. mention explode + grouped count → mention_anchors (dictionary-
         sized, collected to the driver and broadcast),
      4. freq scan actor pool over corpus → freq_m (dictionary-sized),
      5. candidate/disambiguation actor pool over corpus → links.
    The probability columns are derived locally from the two
    dictionary-sized aggregates (C-speed Arrow group_by) — the fact
    table is never shuffled twice.
    """
    import ray as _ray

    from xlink_ray import synth
    from xlink_ray.stages import aggregates
    from xlink_ray.stages.extract import ExtractCorpusBatch, ExtractMentionsBatch
    from xlink_ray.stages.freq import freq_m as freq_m_stage

    pages = synth.synth_pages(sf_dir).select_columns(["url", "text"]).materialize()
    corpus = pages.map_batches(ExtractCorpusBatch(), batch_format="pyarrow").materialize()

    ma_tbl = _collect(
        aggregates.mention_anchors(
            pages.map_batches(ExtractMentionsBatch(), batch_format="pyarrow")
        )
    )
    vocab_ref = _ray.put(sorted(set(ma_tbl["mention"].to_pylist())))
    freq_tbl = _collect(freq_m_stage(corpus, vocab_ref))

    # local derivation of the probability columns (dictionary-sized)
    link_m = (
        ma_tbl.group_by("mention").aggregate([("link_count", "sum")])
        .rename_columns(["mention", "link_m"])
    )
    ma = ma_tbl.join(link_m, keys="mention", join_type="inner")
    ma = ma.append_column(
        "e_given_m",
        pc.divide(
            pc.cast(ma["link_count"], pa.float64()), pc.cast(ma["link_m"], pa.float64())
        ),
    ).select(["mention", "entity_id", "e_given_m"])
    lp = link_m.join(freq_tbl, keys="mention", join_type="inner")
    lp = lp.append_column(
        "link_prob",
        pc.divide(pc.cast(lp["link_m"], pa.float64()), pc.cast(lp["freq"], pa.float64())),
    ).select(["mention", "link_prob"])

    ma_ref = broadcast_table(ma)
    lp_ref = broadcast_table(lp)
    emb_ref = broadcast_table(synth.synth_embeddings())

    return corpus.map_batches(
        CandidateGenActor,
        fn_constructor_args=(ma_ref, lp_ref, emb_ref),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
        num_cpus=1,
    )


class _NeighborhoodEdges:
    """Per-block sorted-neighborhood edge generation with context-cosine
    scoring. Runs inside groupby((mention, entity_id)).map_groups."""

    def __init__(self, emb_ref: "ray.ObjectRef"):
        emb = ray.get(emb_ref)
        items = emb["item"].to_pylist()
        kinds = emb["kind"].to_pylist()
        vecs = np.asarray(emb["vec"].to_pylist(), dtype=np.float32)
        self.word_index = {it: i for i, (it, k) in enumerate(zip(items, kinds)) if k == "word"}
        self.vecs = vecs
        self.dim = vecs.shape[1] if len(vecs) else 0

    def _ctx_vecs(self, ctxs: list[str]) -> np.ndarray:
        acc = np.zeros((len(ctxs), self.dim), dtype=np.float64)
        cnt = np.zeros(len(ctxs), dtype=np.int64)
        for i, c in enumerate(ctxs):
            for tok in c.lower().split():
                j = self.word_index.get(tok)
                if j is not None:
                    acc[i] += self.vecs[j]
                    cnt[i] += 1
        nz = cnt > 0
        acc[nz] /= cnt[nz, None]
        return acc

    def __call__(self, group: pa.Table) -> pa.Table:
        g = group.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
        n = g.num_rows
        if n < 2:
            return pa.table(
                {
                    "id_a": pa.array([], pa.string()),
                    "id_b": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        member = [
            f"{d}#{o}" for d, o in zip(g["doc_id"].to_pylist(), g["offset"].to_pylist())
        ]
        ctx = self._ctx_vecs(g["context"].to_pylist())
        a, b = ctx[:-1], ctx[1:]
        num = np.einsum("ij,ij->i", a, b)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        cos = np.zeros(n - 1)
        nz = den > 0
        cos[nz] = num[nz] / den[nz]
        keep = cos >= EDGE_TH
        ia = np.nonzero(keep)[0]
        mem = np.asarray(member, dtype=object)
        lo = np.minimum(mem[ia], mem[ia + 1])
        hi = np.maximum(mem[ia], mem[ia + 1])
        return pa.table(
            {
                "id_a": pa.array(lo.tolist(), pa.string()),
                "id_b": pa.array(hi.tolist(), pa.string()),
                "score": pa.array(cos[ia], pa.float64()),
            }
        )


def edges_from_links(lkc: Dataset) -> Dataset:
    """links (+context) → sorted-neighborhood context-cosine edges."""
    from xlink_ray.synth import synth_embeddings

    emb_ref = broadcast_table(synth_embeddings())
    return lkc.groupby(["mention", "entity_id"]).map_groups(
        _NeighborhoodEdges,
        fn_constructor_args=(emb_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def members_from_links(lkc: Dataset) -> Dataset:
    return lkc.map_batches(
        lambda t: pa.table(
            {
                "m": pc.binary_join_element_wise(
                    t["doc_id"], pc.cast(t["offset"], pa.string()), "#"
                )
            }
        ),
        batch_format="pyarrow",
    )


def clusters_from(lkc: Dataset, method: str = "auto") -> Dataset:
    return connected_components(
        edges_from_links(lkc),
        a="id_a",
        b="id_b",
        nodes=members_from_links(lkc),
        node_col="m",
        method=method,
    )


def clusters(sf_dir: str, method: str = "auto") -> Dataset:
    """Full flagship pipeline → (member_id, cluster_id)."""
    # links carries the context window from the extraction actor — one
    # pass over the corpus; materialized once (occurrence table, far
    # smaller than the corpus) because two branches consume it
    return clusters_from(links(sf_dir).materialize(), method=method)


def clusters_checkpointed(
    sf_dir: str, ckpt_root: str, method: str = "auto"
) -> tuple[Dataset, "object"]:
    """Flagship with per-stage Parquet checkpoints + lineage manifests.

    Stages: links → edges → clusters. A rerun with the same inputs
    skips every complete stage (manifest fingerprint match); returns
    (clusters Dataset, CheckpointManager) so callers can inspect
    skipped/computed lineage.
    """
    from xlink_ray.state.checkpoint import CheckpointManager, fingerprint

    cm = CheckpointManager(ckpt_root)
    base = fingerprint("flagship-v1", sf_dir, EDGE_TH)

    lkc = cm.run_stage("links", fingerprint(base, "links"), lambda: links(sf_dir))
    edges = cm.run_stage(
        "edges", fingerprint(base, "edges"), lambda: edges_from_links(lkc)
    )
    members = members_from_links(lkc)
    out = cm.run_stage(
        "clusters",
        fingerprint(base, "clusters", method),
        lambda: connected_components(
            edges, a="id_a", b="id_b", nodes=members, node_col="m", method=method
        ),
    )
    return out, cm
