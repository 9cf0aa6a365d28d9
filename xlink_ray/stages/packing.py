"""Training-sequence packing: assign every document to a fixed-capacity
token chunk as if the corpus were concatenated in ``doc_id`` order —
the distributed ordered-prefix-sum (scan) primitive.

Semantics (SQL-checkable):
  ``start_tok(d) = sum(n_tokens of docs with doc_id < d)``,
  ``chunk_id(d) = start_tok(d) // capacity``.
This is the "concatenate then split at token boundaries" packing real
LLM data pipelines run before tokenized-shard export; a doc whose span
crosses a boundary starts in the chunk its first token lands in.

Scale shape (the 100-TB story): the text column is dropped in the
first slim projection — only ``(doc_id, n_tokens)`` moves after that.
Docs are RANGE-bucketed on ``doc_id`` (a scan needs order, so hashing
is wrong); per-bucket token totals are collected to the driver
(``nbuckets`` rows — provably tiny), the driver takes the exclusive
prefix over bucket totals and broadcasts the offsets; one per-bucket
pass then sorts locally, cumsums, and adds its bucket's offset. No
global sort and no shuffle of anything wider than two int64 columns.

Reference scope note: the reference has no packing stage (its trainer
consumes line-oriented text, TrainJointModel/src/align.c); this is one
of the beyond-reference LLM-pipeline operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

__all__ = ["pack_sequences"]


def pack_sequences(
    ds: Dataset,
    capacity: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbuckets: int = 32,
    length_col: str | None = None,
) -> Dataset:
    """``(doc_id, n_tokens, start_tok, chunk_id)`` for every document.

    Tokens = single-space split (DuckDB ``string_split(text, ' ')``
    semantics, matching textstats.token_counts) — or, when
    ``length_col`` is given, a precomputed per-doc length column (e.g.
    the BPE encoder's ``n_tokens``), which packs by REAL tokenizer
    budget instead of whitespace words.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")

    def slim(t: pa.Table) -> pa.Table:
        src_col = length_col if length_col is not None else text_col
        if t[id_col].null_count or t[src_col].null_count:
            raise ValueError(
                f"pack_sequences: nulls in {id_col!r}/{src_col!r} — null "
                "n_tokens would NaN-poison the bucket cumsum downstream"
            )
        if length_col is not None:
            return pa.table(
                {
                    id_col: t[id_col],
                    "n_tokens": pc.cast(t[length_col], pa.int64()),
                }
            )
        toks = pc.split_pattern(t[text_col], " ")
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            }
        )

    # materialize the slim projection: it is consumed three times (max,
    # bucket totals, final pass) and is two int64 columns — object-store
    # resident, never driver-collected
    counts = ds.map_batches(slim, batch_format="pyarrow").materialize()

    max_id = counts.max(id_col)
    if max_id is None:  # empty corpus
        return counts.map_batches(
            lambda t: pa.table(
                {
                    id_col: t[id_col],
                    "n_tokens": t["n_tokens"],
                    "start_tok": pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    width = max_id // nbuckets + 1

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array((ids // width).astype(np.int64)))

    bucketed = counts.map_batches(add_bucket, batch_format="pyarrow")

    # pass A: per-bucket token totals → driver (nbuckets rows, tiny)
    totals = {
        r["__b"]: r["sum(n_tokens)"]
        for r in bucketed.groupby("__b").sum("n_tokens").take_all()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]
    offsets_ref = ray.put(offsets)

    # pass B: per-bucket local scan + broadcast offset
    def per_bucket(g: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        order = pc.sort_indices(g, sort_keys=[(id_col, "ascending")])
        g = g.take(order)
        n = g["n_tokens"].to_numpy(zero_copy_only=False)
        start = np.cumsum(n) - n + offs[g["__b"][0].as_py()]
        return pa.table(
            {
                id_col: g[id_col],
                "n_tokens": g["n_tokens"],
                "start_tok": pa.array(start, pa.int64()),
                "chunk_id": pa.array(start // capacity, pa.int64()),
            }
        )

    return bucketed.groupby("__b").map_groups(per_bucket, batch_format="pyarrow")
