"""Sketch-based heavy hitters: the tokens whose corpus frequency is at
least ``total/k``, found WITHOUT a vocabulary shuffle.

Two map-only passes (classic candidate-then-verify sketch discipline):

1. **Candidates** (pigeonhole): a token with global count ≥ total/k
   must have count_b ≥ batch_total_b/k in at least one batch — if it
   were below the bar in every batch, summing gives < total/k.  Each
   batch therefore emits at most k candidate tokens; the union
   (≤ k × blocks, tiny) is collected and broadcast.
2. **Exact recount**: one ``index_in`` pass counts the candidates
   exactly; the final filter ``n·k ≥ total`` is integer-exact, so the
   result is EXACT (the sketch only prunes, never approximates).

At web scale this replaces the full-vocabulary ``groupby`` (billions
of keys through the exchange) with two streaming passes and a
k-bounded driver merge."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

__all__ = ["frequent_tokens"]


def frequent_tokens(
    ds: Dataset, k: int = 512, text_col: str = "text"
) -> pa.Table:
    """(token, n) for every token with n·k ≥ total tokens — exact.

    Returns a (≤ k)-row Arrow table (a sketch result is driver-sized
    by construction)."""

    def cand_batch(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        total_b = len(flat)
        counts = (
            pa.table({"tk": flat})
            .group_by("tk")
            .aggregate([([], "count_all")])
            .rename_columns(["tk", "n"])
        )
        n = counts["n"].to_numpy(zero_copy_only=False)
        keep = n * k >= total_b
        return pa.table(
            {"tk": counts["tk"].combine_chunks().take(pa.array(np.nonzero(keep)[0]))}
        )

    parts = ds.map_batches(cand_batch, batch_format="pyarrow").take_all()
    cand = pa.array(sorted({p["tk"] for p in parts}), pa.string())
    if len(cand) == 0:
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    cand_ref = ray.put(cand)

    class Recount:
        def __init__(self, ref):
            self.cand = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            flat = pc.list_flatten(pc.split_pattern(t[text_col], " "))
            code = (
                pc.fill_null(pc.index_in(flat, value_set=self.cand), -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            cnt = np.zeros(len(self.cand), dtype=np.int64)
            hit = code >= 0
            if hit.any():
                np.add.at(cnt, code[hit], 1)
            return pa.table(
                {
                    "cnt": pa.array([cnt.tolist()], pa.list_(pa.int64())),
                    "total": pa.array([len(flat)], pa.int64()),
                }
            )

    rparts = ds.map_batches(
        Recount, fn_constructor_args=(cand_ref,),
        batch_format="pyarrow", concurrency=(1, 4),
    ).take_all()
    total = sum(p["total"] for p in rparts)
    n = np.sum([np.asarray(p["cnt"]) for p in rparts], axis=0)
    keep = n * k >= total
    order = np.nonzero(keep)[0]
    return pa.table(
        {
            "token": cand.take(pa.array(order)),
            "n": pa.array(n[order].astype(np.int64)),
        }
    )
