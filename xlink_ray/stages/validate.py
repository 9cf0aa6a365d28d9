"""Data-quality constraint checking: per-rule violation counts over a
Dataset, one streaming pass for row-local rules plus one hash-bucket
shuffle for the uniqueness rule.

The pipeline-ops counterpart of the reference's raw-corpus validator
(reference datatool CorpusValidator, see sources/text_formats.py
validate_corpus_lines): where that operator validates line syntax, this
one checks table-level invariants (nulls, ranges, key uniqueness)
before a corpus enters the expensive stages.  Row-local rules fold to
one partial count per batch (constant-size reduce); ``unique`` is the
only rule that needs data movement — duplicate ids are counted inside
hash buckets, never collected.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

from xlink_ray.stages._bucket import bucket_shuffle

__all__ = ["check_constraints"]


def check_constraints(
    ds: Dataset,
    not_null: "list[str]" = (),
    unique: "list[str]" = (),
    max_len: "dict[str, int]" = None,
    nbuckets: int = 64,
) -> Dataset:
    """→ (rule, violations:int64), one row per rule (always emitted,
    zero when clean).  Rules: ``not_null:col`` (null count),
    ``max_len:col`` (strings longer than the cap), ``unique:col``
    (rows beyond the first per duplicated key)."""
    max_len = dict(max_len or {})
    local_rules = [f"not_null:{c}" for c in not_null] + [f"max_len:{c}" for c in max_len]

    def partial(t: pa.Table) -> pa.Table:
        names, counts = [], []
        for c in not_null:
            names.append(f"not_null:{c}")
            counts.append(int(t[c].null_count))
        for c, cap in max_len.items():
            names.append(f"max_len:{c}")
            lens = pc.utf8_length(pc.cast(t[c], pa.string()))
            counts.append(int(pc.sum(pc.cast(pc.greater(lens, cap), pa.int64())).as_py() or 0))
        return pa.table(
            {
                "rule": pa.array(names, pa.string()),
                "violations": pa.array(counts, pa.int64()),
            }
        )

    parts = [ds.map_batches(partial, batch_format="pyarrow")] if local_rules else []

    for c in unique:
        key_rows = ds.map_batches(
            lambda t, c=c: pa.table({"k": t[c].cast(pa.int64())}), batch_format="pyarrow"
        )

        def dup_bucket(g: pa.Table, c=c) -> pa.Table:
            k = g["k"].to_numpy(zero_copy_only=False)
            extra = len(k) - len(np.unique(k))
            return pa.table(
                {
                    "rule": pa.array([f"unique:{c}"], pa.string()),
                    "violations": pa.array([int(extra)], pa.int64()),
                }
            )

        parts.append(bucket_shuffle(key_rows, "k", nbuckets, dup_bucket))

    if not parts:
        return rd.from_arrow(
            pa.table({"rule": pa.array([], pa.string()), "violations": pa.array([], pa.int64())})
        )
    tagged = parts[0]
    for p in parts[1:]:
        tagged = tagged.union(p)

    # fold the per-batch/per-bucket partials: rule cardinality is tiny
    rows = tagged.take_all()
    acc: dict[str, int] = {f"unique:{c}": 0 for c in unique}
    acc.update({r: 0 for r in local_rules})
    for r in rows:
        acc[r["rule"]] = acc.get(r["rule"], 0) + int(r["violations"])
    out = sorted(acc.items())
    return rd.from_arrow(
        pa.table(
            {
                "rule": pa.array([a for a, _ in out], pa.string()),
                "violations": pa.array([b for _, b in out], pa.int64()),
            }
        )
    )
