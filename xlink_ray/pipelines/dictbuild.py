"""Offline dictionary-build pipeline (SURVEY.md §3.1) — the reference's
``python main.py --source bd`` nine-step driver (reference
main.py:405-481) as one lazy Ray Data DAG.

Each function returns a Dataset; nothing materializes the corpus on
the driver. Aggregate side tables (link totals, freq_m) are
dictionary-sized and are broadcast back where the reference held them
as in-memory dicts.
"""

from __future__ import annotations

from xlink_ray.util import pool_size

import ray
from ray.data import Dataset

from xlink_ray import synth
from xlink_ray.stages import aggregates
from xlink_ray.stages.extract import ExtractCorpusBatch, ExtractMentionsBatch
from xlink_ray.stages.freq import freq_m as freq_m_stage
from xlink_ray.stages.prob import ProbTables, build_prob_tables

__all__ = [
    "pages",
    "corpus",
    "mentions",
    "mention_anchors",
    "out_links",
    "self_links",
    "freq_m",
    "prob_tables",
]


_PAGES_CACHE: dict[str, Dataset] = {}


def pages(sf_dir: str) -> Dataset:
    """Synthesized pages, materialized ONCE per driver session: every
    dictbuild query re-reads these blocks from the object store
    instead of re-running the synthesis UDF per query (the same
    read-once pattern a real deployment gets from Parquet for free —
    synthesis stands in for the crawl read; blocks spill if the store
    fills)."""
    ds = _PAGES_CACHE.get(sf_dir)
    if ds is None:
        ds = _PAGES_CACHE[sf_dir] = synth.synth_pages(sf_dir).materialize()
    return ds


def corpus(sf_dir: str) -> Dataset:
    """pages → (doc_id, text) with markup stripped; html column is
    projected away before extraction (SURVEY.md §7.4 wide-row rule)."""
    return (
        pages(sf_dir)
        .select_columns(["url", "text"])
        .map_batches(ExtractCorpusBatch(), batch_format="pyarrow")
    )


def mentions(sf_dir: str) -> Dataset:
    return (
        pages(sf_dir)
        .select_columns(["url", "text"])
        .map_batches(ExtractMentionsBatch(), batch_format="pyarrow")
    )


def mention_anchors(sf_dir: str) -> Dataset:
    return aggregates.mention_anchors(mentions(sf_dir))


def out_links(sf_dir: str) -> Dataset:
    return aggregates.out_links(mentions(sf_dir))


def self_links(sf_dir: str) -> Dataset:
    return aggregates.self_links(mentions(sf_dir))


_VOCAB_CACHE: dict[str, "ray.ObjectRef"] = {}


def dict_vocab_ref(sf_dir: str) -> "ray.ObjectRef":
    """Broadcast the mention vocabulary once per job — DERIVED from the
    corpus's own mention anchors (reference generate_prob_files.py
    scans with the mention_anchors vocabulary), not from the
    synthesizer's ground truth; the pipeline carries no generator
    coupling. Cached per sf_dir for the driver session (the anchor
    pass is a full corpus execution; queries sharing a scale dir reuse
    one broadcast)."""
    ref = _VOCAB_CACHE.get(sf_dir)
    if ref is None:
        vocab = sorted(
            set(mention_anchors(sf_dir).select_columns(["mention"]).unique("mention"))
        )
        ref = _VOCAB_CACHE[sf_dir] = ray.put(vocab)
    return ref


def freq_m(sf_dir: str, concurrency: int | tuple[int, int] | None = None) -> Dataset:
    return freq_m_stage(corpus(sf_dir), dict_vocab_ref(sf_dir), concurrency=concurrency)


def prob_tables(sf_dir: str) -> ProbTables:
    return build_prob_tables(mention_anchors(sf_dir), freq_m(sf_dir))


def in_links(sf_dir: str, entity_id: str) -> Dataset:
    """S13 in-link lookup (reference get_in_links.py:5-19): pages whose
    out-links point at ``entity_id`` — a pushed-down filter over the
    out_links edge list."""
    import pyarrow.compute as pc

    return out_links(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t["dst"], entity_id)), batch_format="pyarrow"
    )


def candidate_histogram(sf_dir: str) -> Dataset:
    """A5 dataset statistics (reference datatool/pipeline/tools.py:55-104,
    stats.py:7-52): how many mentions have k candidate entities."""
    import pyarrow as pa

    from xlink_ray.stages.aggregates import grouped_count

    ma = mention_anchors(sf_dir)
    per_mention = grouped_count(
        ma.map_batches(
            lambda t: pa.table({"mention": t["mention"]}), batch_format="pyarrow"
        ),
        ["mention"],
        "n_candidates",
    )
    return grouped_count(per_mention, ["n_candidates"], "n_mentions")
