"""Inverted-index construction: token → sorted posting list with term
frequencies — the search-engine build step over a web corpus.

Scale shape: per-batch PARTIAL (token, doc_id, tf) counts (each doc's
tokens collapse inside the map task — the shuffle carries one row per
distinct (token, doc) pair, not one per token occurrence), ONE groupby
shuffle on the token, and a per-token group task that sorts its
postings by doc_id and serializes them. Posting lists for stopword-class
tokens are the classic skew hazard: pass ``doc_shards > 1`` to
range-shard hot lists by ``doc_id // shard_width`` so no single group
task holds a corpus-wide list (the output then has one row per
(token, shard), each independently mergeable by concatenation because
shards are doc_id ranges).

Reference scope note: the reference keeps its dictionary in in-memory
tries (datatool/pipeline/generate_tries.py); a distributed inverted
index is one of the beyond-reference operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

__all__ = ["inverted_index"]


def inverted_index(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    doc_shards: int = 1,
    shard_width: int = 1 << 40,
) -> Dataset:
    """``(token, df, postings)`` where postings = ``"doc:tf,doc:tf,…"``
    sorted by doc_id (DuckDB ``string_agg(... ORDER BY doc_id)``
    semantics). With ``doc_shards > 1``: ``(token, shard, df,
    postings)`` per doc-range shard."""

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        doc_of = np.repeat(ids, counts)
        tt = pa.table({"token": flat, id_col: pa.array(doc_of, pa.int64())})
        out = (
            tt.group_by(["token", id_col])
            .aggregate([([], "count_all")])
            .rename_columns(["token", id_col, "tf"])
        )
        return out

    tf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["token", id_col])
        .aggregate(Sum("tf", alias_name="tf"))
    )

    keys = ["token"]
    if doc_shards > 1:
        def add_shard(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            return t.append_column(
                "shard", pa.array((ids // shard_width).astype(np.int64))
            )

        tf = tf.map_batches(add_shard, batch_format="pyarrow")
        keys = ["token", "shard"]

    def build(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[(id_col, "ascending")])
        g = g.take(order)
        # vectorized "doc:tf,doc:tf" serialization (a stopword group can
        # be huge — no Python join over its rows)
        parts = pc.binary_join_element_wise(
            pc.cast(g[id_col], pa.string()),
            pc.cast(pc.cast(g["tf"], pa.int64()), pa.string()),
            ":",
        ).combine_chunks()
        lst = pa.ListArray.from_arrays(
            pa.array([0, len(parts)], pa.int32()), parts
        )
        postings = pc.binary_join(lst, ",")
        row: dict = {"token": [g["token"][0].as_py()]}
        if doc_shards > 1:
            row["shard"] = [g["shard"][0].as_py()]
        row["df"] = pa.array([g.num_rows], pa.int64())
        row["postings"] = postings
        return pa.table(row)

    return tf.groupby(keys).map_groups(build, batch_format="pyarrow")
