"""Shared key-bucket shuffle scaffold for the keyed temporal joins
(asof.py, interval.py): ONE hash-bucket exchange on an integer key,
then a per-bucket vectorized kernel via ``groupby("__b").map_groups``.

Null keys are rejected loudly: a nullable int64 → numpy roundtrip goes
through float64 (NaN), and ``NaN % nbuckets`` cast to int is undefined
— silently scattering null-key rows into arbitrary buckets."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["bucket_shuffle"]


def bucket_shuffle(ds: Dataset, key: str, nbuckets: int, per_bucket) -> Dataset:
    """Append ``__b = key % nbuckets``, shuffle once, and run
    ``per_bucket`` (pa.Table → pa.Table) over each bucket."""

    def add_bucket(t: pa.Table) -> pa.Table:
        if t[key].null_count:
            raise ValueError(f"bucket key column {key!r} contains nulls")
        k = t[key].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array((k % nbuckets).astype(np.int64)))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
