"""Grouped aggregates over the exploded mentions table (SURVEY.md §2.4).

Reference behavior being matched: one sequential pass building three
nested dicts (``extract_mention_and_out_links_from_corpus``,
datatool/pipeline/extract_mention_anchors.py:8-61) plus the per-corpus
merge functions (ibid. 63-127). Here each aggregate is a partial
per-batch combine (C-speed ``pyarrow.Table.group_by`` inside
``map_batches``) followed by one small global ``groupby`` shuffle —
the partial/final split the reference implements by hand with
per-corpus JSON files.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

__all__ = [
    "grouped_count",
    "grouped_sum",
    "mention_anchors",
    "out_links",
    "self_links",
]


def _partial_count(keys: list[str], out: str):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], batch.schema.field(k).type) for k in keys},
                 out: pa.array([], pa.int64())}
            )
        g = batch.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + [out])

    return fn


def _partial_sum(keys: list[str], val: str, out: str):
    def fn(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([(val, "sum")])
        return g.rename_columns(keys + [out])

    return fn


def _tree_combine(partial: Dataset, keys: list[str], out: str, fanin: int = 16) -> Dataset:
    """Final merge for DICTIONARY-SIZED aggregates: two repartition
    levels with an in-task ``pa.Table.group_by`` combine instead of
    Ray's sort-based shuffle aggregate (measured 1.59s → 0.35s on
    128 pre-combined partial blocks at sf0.1).  Safe only when the
    distinct-key universe is dictionary-sized — the last task holds
    ≤ fanin × |keys| rows (these tables are later collected/broadcast
    anyway, so that bound already governs the pipeline).

    Do NOT replace level 1 with ``map_batches(batch_size=BIG)`` block
    coalescing: Ray's bundler breaks pipelining for large batch-size
    targets and the dict phase at 3.6 M pages went 19 s → 67 s per
    aggregate (measured round 4). repartition pads small inputs with
    schema-less empty blocks, but those executor-log warnings are
    filtered at the source (xlink_ray._filter_empty_schema_warnings)."""
    combine = _partial_sum(keys, out, out)
    first = partial.repartition(fanin).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )
    return first.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )


def grouped_count(
    ds: Dataset, keys: list[str], out: str = "count", small: bool = False
) -> Dataset:
    """count(*) group by keys, with per-batch pre-aggregation.
    ``small=True`` = the key universe is dictionary-sized: merge
    partials with the repartition tree combine (no sort shuffle)."""
    partial = ds.map_batches(_partial_count(keys, out), batch_format="pyarrow")
    if small:
        return _tree_combine(partial, keys, out)
    return (
        partial.groupby(keys)
        .aggregate(Sum(out, alias_name=out))
        .select_columns(keys + [out])
    )


def grouped_sum(
    ds: Dataset, keys: list[str], val: str, out: str, small: bool = False
) -> Dataset:
    """sum(val) group by keys, with per-batch pre-aggregation.
    ``small=True`` as in ``grouped_count``."""
    partial = ds.map_batches(_partial_sum(keys, val, out), batch_format="pyarrow")
    if small:
        return _tree_combine(partial, keys, out)
    return (
        partial.groupby(keys)
        .aggregate(Sum(out, alias_name=out))
        .select_columns(keys + [out])
    )


def distinct(ds: Dataset, keys: list[str]) -> Dataset:
    """Distinct rows over ``keys`` (per-batch dedupe, then one shuffle)."""

    def dedupe(batch: pa.Table) -> pa.Table:
        return batch.select(keys).group_by(keys).aggregate([])

    partial = ds.map_batches(dedupe, batch_format="pyarrow")
    return partial.groupby(keys).count().select_columns(keys)


def mention_anchors(mentions: Dataset) -> Dataset:
    """(mention, entity_id, link_count) — A1's grouped anchor counts.

    Matches the nested ``mention_anchors[m][e] += 1`` of reference
    extract_mention_anchors.py:40-47 (mention already lowercased at
    extraction).
    """
    return grouped_count(mentions, ["mention", "entity_id"], "link_count", small=True)


def out_links(mentions: Dataset) -> Dataset:
    """(src, dst) distinct page→entity edges — A1's out_links sets
    (reference extract_mention_anchors.py:38-47, flattened to an edge
    list; J9 dedup)."""
    edges = mentions.map_batches(
        lambda t: pa.table({"src": t["doc_id"], "dst": t["entity_id"]}),
        batch_format="pyarrow",
    )
    return distinct(edges, ["src", "dst"])


def self_links(mentions: Dataset) -> Dataset:
    """(mention, count) where the page links to itself
    (reference extract_mention_anchors.py:50-51)."""
    import pyarrow.compute as pc

    selfref = mentions.map_batches(
        lambda t: t.filter(pc.equal(t["doc_id"], t["entity_id"])),
        batch_format="pyarrow",
    )
    return grouped_count(selfref, ["mention"], "count", small=True)
