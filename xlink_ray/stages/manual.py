"""J8 ``merge_manual_data`` — manual dictionary curation merged into
the corpus-derived statistics (reference merge_manual_data.py:18-63).

The reference reads the original mention-anchor and link-prob files
into keyed maps, merges a manual-curation file into them, and rewrites
the files + trie. (Its manual-file ingestion body is an unimplemented
``pass`` — merge_manual_data.py:28-29, 56-57 — so the merge semantics
implemented here are the ones its data model implies and its map keys
enforce: anchors are a DEDUP-UNION of (mention → entity set), and
link-prob rows are KEYED LAST-WINS on the map key, the update
overwriting the original row.)

Ray-native shape: tagged union + one groupby on the key — no driver
maps. Both operators are SQL-oracle-checked through
``__ray_entry__``'s ``merged_anchors`` / ``merged_link_prob`` queries.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

__all__ = ["union_distinct", "keyed_last_wins", "merge_mention_anchors", "merge_link_prob"]


def union_distinct(a: Dataset, b: Dataset, cols: "list[str]") -> Dataset:
    """Distinct union of the given columns of two datasets."""

    def proj(t: pa.Table) -> pa.Table:
        return t.select(cols)

    return (
        a.map_batches(proj, batch_format="pyarrow")
        .union(b.map_batches(proj, batch_format="pyarrow"))
        .groupby(cols)
        .aggregate(Count(alias_name="_n"))
        .select_columns(cols)
    )


def keyed_last_wins(orig: Dataset, updates: Dataset, keys: "list[str]") -> Dataset:
    """Rows of ``updates`` overwrite rows of ``orig`` sharing the same
    key; non-overlapping rows of both survive. Schemas must match.

    Shape: tag each side with a priority column, union, ONE groupby on
    the key, keep the max-priority row per key (ties cannot happen:
    priorities differ across sides; duplicate keys *within* a side keep
    the lexicographically greatest payload, deterministically).
    """

    def tag(ds: Dataset, prio: int) -> Dataset:
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("_prio", pa.array([prio] * t.num_rows, pa.int64()))

        return ds.map_batches(fn, batch_format="pyarrow")

    both = tag(orig, 0).union(tag(updates, 1))
    payload = None  # resolved per batch from schema

    def pick(group: pa.Table) -> pa.Table:
        nonlocal payload
        if payload is None:
            payload = [c for c in group.column_names if c != "_prio"]
        order = [("_prio", "descending")] + [
            (c, "descending") for c in group.column_names if c != "_prio"
        ]
        return group.sort_by(order).slice(0, 1).select(payload)

    return both.groupby(keys).map_groups(pick, batch_format="pyarrow")


def merge_mention_anchors(orig: Dataset, manual: Dataset) -> Dataset:
    """Reference merge_mention_anchors (merge_manual_data.py:18-41):
    mention → entity-set dedup-union; output (mention, entity_id)."""
    return union_distinct(orig, manual, ["mention", "entity_id"])


def merge_link_prob(orig: Dataset, manual: Dataset, keys: "list[str]" = None) -> Dataset:
    """Reference merge_link_prob (merge_manual_data.py:44-63): keyed
    overwrite of link-prob rows (default key = mention, matching the
    repo's per-mention link_prob table; pass ['mention','entity_id']
    for the reference's six-column file layout)."""
    return keyed_last_wins(orig, manual, keys or ["mention"])
