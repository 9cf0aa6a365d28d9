"""Broadcast-side-table helpers (SURVEY.md §2.3, §4.2).

The reference holds every side table (entity dictionary, probability
dicts, vectors) as a process-wide singleton loaded once per process
(e.g. reference utils/dictionary.py:28-46, modules/ProbHolder.py:7-51).
The Ray-native equivalent: put the table in the object store ONCE
(``ray.put``), hand the ref to stages, and let each task/actor
``ray.get`` it zero-copy. Lookups/joins against the broadcast side run
as C-speed Arrow hash joins per batch — never a cluster-wide shuffle
for a small side.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

import ray

__all__ = ["broadcast_table", "BroadcastJoin", "BroadcastSemi"]


def broadcast_table(table: pa.Table | Any) -> "ray.ObjectRef":
    """Put a small Arrow table (or any object) in the object store once."""
    if hasattr(table, "to_arrow"):  # ray Dataset / pandas-like
        table = table.to_arrow()
    return ray.put(table)


class BroadcastJoin:
    """``map_batches`` callable: left-join each batch against a broadcast
    Arrow table on ``keys`` (Acero hash join — vectorized, no pandas).

    Use for dimension/aggregate side tables that fit in worker memory;
    the big side streams. This is the no-shuffle join of SURVEY.md §2.5.
    """

    def __init__(
        self,
        small_ref: "ray.ObjectRef",
        keys: list[str] | str,
        join_type: str = "left outer",
    ):
        small = ray.get(small_ref)
        if not isinstance(small, pa.Table):
            small = pa.table(small)
        self.small = small.combine_chunks()
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(self.small, keys=self.keys, join_type=self.join_type)


class BroadcastSemi:
    """Semi/anti join against a broadcast key set (SURVEY.md J1/J4).

    ``anti=True`` keeps rows whose key is NOT in the set.
    """

    def __init__(self, small_ref: "ray.ObjectRef", keys: list[str] | str, anti: bool = False):
        small = ray.get(small_ref)
        if not isinstance(small, pa.Table):
            small = pa.table(small)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.small = small.select(self.keys).combine_chunks()
        self.join_type = "left anti" if anti else "left semi"

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(self.small, keys=self.keys, join_type=self.join_type)
