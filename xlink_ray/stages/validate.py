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

__all__ = ["check_constraints", "profile_columns"]


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


def profile_columns(
    ds: Dataset, int_cols: "list[str]" = (), str_cols: "list[str]" = (), nbuckets: int = 64
) -> Dataset:
    """Column profile → (column, n_rows, n_null, n_distinct, min_v,
    max_v) — min/max as int64 for integer columns, -1 sentinels for
    string columns (names stay comparable across engines).

    Row-local stats (counts, nulls, min/max) fold to one partial row
    per column per batch; distinct counts go through ONE hash-bucket
    shuffle per column with in-bucket ``np.unique`` — the same
    never-collect-keys discipline as check_constraints' unique rule.
    """
    cols = [(c, True) for c in int_cols] + [(c, False) for c in str_cols]

    def partial(t: pa.Table) -> pa.Table:
        names, rows, nulls, mins, maxs = [], [], [], [], []
        for c, is_int in cols:
            names.append(c)
            rows.append(t.num_rows)
            nulls.append(int(t[c].null_count))
            if is_int and t.num_rows > t[c].null_count:
                v = t[c].to_numpy(zero_copy_only=False)
                v = v[~pa.compute.is_null(t[c]).to_numpy(zero_copy_only=False)] if t[c].null_count else v
                mins.append(int(v.min()))
                maxs.append(int(v.max()))
            else:
                mins.append(None)
                maxs.append(None)
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n_rows": pa.array(rows, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.int64()),
                "max_v": pa.array(maxs, pa.int64()),
            }
        )

    local = ds.map_batches(partial, batch_format="pyarrow").take_all()

    distinct: dict[str, int] = {}
    for c, is_int in cols:
        from xlink_ray.functions.hashing import md5_low64

        def keyed(t: pa.Table, c=c, is_int=is_int) -> pa.Table:
            col = t[c].drop_null()  # SQL count(DISTINCT) semantics: nulls excluded
            if is_int:
                k = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            else:
                # hash strings to int64 keys (distinct-preserving w.h.p.)
                k = md5_low64(col.to_pylist()).view(np.int64)
            return pa.table({"k": pa.array(k, pa.int64())})

        def dcount(g: pa.Table) -> pa.Table:
            u = np.unique(g["k"].to_numpy(zero_copy_only=False))
            return pa.table({"n": pa.array([len(u)], pa.int64())})

        parts = bucket_shuffle(
            ds.map_batches(keyed, batch_format="pyarrow"), "k", nbuckets, dcount
        ).take_all()
        distinct[c] = int(sum(r["n"] for r in parts))

    acc: dict[str, list] = {}
    for r in local:
        a = acc.setdefault(r["column"], [0, 0, None, None])
        a[0] += r["n_rows"]
        a[1] += r["n_null"]
        if r["min_v"] is not None:
            a[2] = r["min_v"] if a[2] is None else min(a[2], r["min_v"])
            a[3] = r["max_v"] if a[3] is None else max(a[3], r["max_v"])
    names = [c for c, _ in cols]
    return rd.from_arrow(
        pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n_rows": pa.array([acc[c][0] for c in names], pa.int64()),
                "n_null": pa.array([acc[c][1] for c in names], pa.int64()),
                "n_distinct": pa.array([distinct[c] for c in names], pa.int64()),
                "min_v": pa.array(
                    [acc[c][2] if acc[c][2] is not None else -1 for c in names], pa.int64()
                ),
                "max_v": pa.array(
                    [acc[c][3] if acc[c][3] is not None else -1 for c in names], pa.int64()
                ),
            }
        )
    )
