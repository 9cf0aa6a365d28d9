"""J3 ``expand_mention_anchors`` — dictionary expansion from the
entity dictionary (reference
datatool/pipeline/extract_mention_anchors.py:130-158).

Reference semantics: for every entity in the dictionary, take its
title's mention form; (a) if that mention already exists in
mention_anchors and the entity is not among its anchors, add it with
link_count 1; (b) if the mention never occurred in the corpus, put
(mention → entity) into the separate title-entity dictionary. The
reference's branch (b) keeps the LAST entity in dict-iteration order
for duplicate titles — an order accident; here the explicit rule is
the smallest entity_id (same deterministic-tie policy as SURVEY.md
§7.4.6), documented as a divergence.

Ray shape: tagged union of anchor rows and entity-dictionary rows +
ONE groupby(mention); each group resolves both branches locally.
Output carries a ``branch`` column ('ma' = expanded anchors, 'tt' =
title-entity dictionary); ``expanded_anchors`` / ``title_entities``
are filtered views.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["expand_mention_anchors", "expanded_anchors", "title_entities"]


def expand_mention_anchors(ma: Dataset, entity_dict: Dataset) -> Dataset:
    """ma (mention, entity_id, link_count) × entity_dict (mention,
    entity_id) → (branch, mention, entity_id, link_count)."""

    def tag_ma(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "mention": t["mention"],
                "entity_id": t["entity_id"],
                "link_count": pc.cast(t["link_count"], pa.int64()),
                "src": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    def tag_ed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "mention": t["mention"],
                "entity_id": t["entity_id"],
                "link_count": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "src": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    both = ma.map_batches(tag_ma, batch_format="pyarrow").union(
        entity_dict.map_batches(tag_ed, batch_format="pyarrow")
    )

    def per_mention(group: pa.Table) -> pa.Table:
        src = group["src"].to_numpy(zero_copy_only=False)
        ents = np.asarray(group["entity_id"].to_pylist())
        counts = group["link_count"].to_numpy(zero_copy_only=False)
        mention = group["mention"][0].as_py()
        ma_rows = src == 0
        if ma_rows.any():
            known = set(ents[ma_rows].tolist())
            out_e = ents[ma_rows].tolist()
            out_c = counts[ma_rows].tolist()
            for e in sorted(set(ents[~ma_rows].tolist()) - known):
                out_e.append(e)  # branch (a): new anchor, count 1
                out_c.append(1)
            branch = ["ma"] * len(out_e)
        else:
            # branch (b): title-entity dictionary; smallest entity_id
            # (explicit rule replacing the reference's dict-order accident)
            out_e = [sorted(set(ents.tolist()))[0]]
            out_c = [1]
            branch = ["tt"]
        return pa.table(
            {
                "branch": pa.array(branch, pa.string()),
                "mention": pa.array([mention] * len(out_e), pa.string()),
                "entity_id": pa.array(out_e, pa.string()),
                "link_count": pa.array(out_c, pa.int64()),
            }
        )

    return both.groupby("mention").map_groups(per_mention, batch_format="pyarrow")


def expanded_anchors(ma: Dataset, entity_dict: Dataset) -> Dataset:
    out = expand_mention_anchors(ma, entity_dict)
    return out.filter(lambda r: r["branch"] == "ma").map_batches(
        lambda t: t.select(["mention", "entity_id", "link_count"]),
        batch_format="pyarrow",
    )


def title_entities(ma: Dataset, entity_dict: Dataset) -> Dataset:
    out = expand_mention_anchors(ma, entity_dict)
    return out.filter(lambda r: r["branch"] == "tt").map_batches(
        lambda t: t.select(["mention", "entity_id"]), batch_format="pyarrow"
    )
