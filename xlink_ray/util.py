"""Small runtime helpers."""

from __future__ import annotations

__all__ = ["pool_size", "ensure_fsspec_http_stub", "dict_guard_max_bytes",
           "guard_dict_bytes", "read_pq"]


def _strip_schema_meta(t):
    return t.replace_schema_metadata(None)


def read_pq(path, *, columns=None, **kw):
    """``ray.data.read_parquet`` minus the parquet ``pandas`` schema
    metadata. pyarrow schemas WITH metadata are UNHASHABLE, so every
    block concat downstream of a plain read of pandas-written parquet
    logs Ray's "Failed to hash the schemas (for deduplication)"
    warning (transform_pyarrow.py:181) and defeats its schema-dedup
    fast path. Passing an explicit metadata-free schema keeps every
    block metadata-free at zero per-row cost; directory reads (no
    single footer to inspect) fall back to a fused metadata-strip
    map."""
    import ray.data as rd

    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        sch = pq.read_schema(path).remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.read_parquet(path, columns=columns, schema=sch, **kw)
    except Exception:  # noqa: BLE001 — directory / multi-file inputs
        ds = rd.read_parquet(path, columns=columns, **kw)
        return ds.map_batches(_strip_schema_meta, batch_format="pyarrow")


def read_pq_grouped(path, *, columns=None, **kw):
    """``read_pq`` sized for groupby/map_groups consumers.

    Ray's default read over-splits small files (~2 blocks per CPU), and
    a sort-based groupby pays per-block fixed cost in SortMap AND sizes
    its output partitions — the grouped-map task count — from the input
    block count: a 15 k-row table read as 128 tiny blocks made the
    whole ER grid chain 2-4× slower than the same read at ~1 block per
    CPU (measured: er_one_to_one 5.9 → 2.9 s, er_clusters 1.7 → 1.2 s
    at sf0.1). Small files (< ncpu × 16 MB) clamp to one block per
    CPU — still ≥ the useful grouped parallelism; larger files keep
    Ray's own row-group splitting untouched."""
    import os

    try:
        size = os.path.getsize(path)
    except OSError:
        size = None
    if size is not None and "override_num_blocks" not in kw:
        import ray

        ncpu = 32
        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 32)) or 32
        if size < ncpu * 16_000_000:
            kw["override_num_blocks"] = ncpu
    return read_pq(path, columns=columns, **kw)


def dict_guard_max_bytes() -> float:
    """The ONE broadcast-size knob: ``XLINK_DICT_MAX_MB`` in MB
    (1 MB = 1e6 bytes), default 8192. Every stage that collects a
    dictionary-sized side table to the driver for broadcast guards it
    against this limit (flagship dictionary phase, the J2 filter's
    broadcast path, ppjoin's df-rank order) — one unit, one default,
    so a user-set value means the same byte count everywhere."""
    import os

    return float(os.environ.get("XLINK_DICT_MAX_MB", "8192")) * 1e6


def guard_dict_bytes(nbytes: int, what: str) -> None:
    """Raise MemoryError when a would-be broadcast table exceeds the
    shared ``XLINK_DICT_MAX_MB`` guard. Callers with a partitioned
    no-broadcast path catch this and fall back; callers without one
    surface the documented migration path in ``what``."""
    max_bytes = dict_guard_max_bytes()
    if nbytes > max_bytes:
        raise MemoryError(
            f"{what} is {nbytes / 1e6:.0f} MB "
            f"(> XLINK_DICT_MAX_MB={max_bytes / 1e6:.0f} MB)"
        )


def ensure_fsspec_http_stub() -> None:
    """This container ships fsspec without aiohttp, so importing
    ``fsspec.implementations.http`` raises — which Ray Data's path
    resolution handles when single-threaded (except ModuleNotFoundError)
    but trips over when two Dataset executions start concurrently (the
    half-failed import surfaces as a plain ImportError). Install a
    stub module exposing a dummy HTTPFileSystem; it is only ever used
    in isinstance checks, which correctly return False."""
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except Exception:  # noqa: BLE001
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # noqa: N801 — name must match the real class
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def pool_size(frac: float = 1.0, floor: int = 2) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster: (1, max)
    where max ≈ frac × (CPUs - 2), so one pool can use the machine when
    it's the bottleneck stage but never starves the read/write stages
    (min stays 1; Ray's autoscaler only grows a pool that has queued
    batches)."""
    import os

    import ray

    override = os.environ.get("XLINK_POOL_MAX")
    if override:
        return (1, int(override))
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 — before init, be conservative
        ncpu = 8
    # cap: on this single node, actor pools past ~20 cost more in
    # spawn/dispatch than they return (measured: pool 20 beats 30 by
    # 1.5x at 32 CPUs); on a real multi-node cluster the cap would be
    # per-node, not global
    return (1, min(20, max(floor, int(frac * max(ncpu - 2, 1)))))


def heavy_cpus() -> float:
    """``num_cpus`` for memory-bandwidth-bound batch tasks (dictionary
    scans, markup extraction, fused scan+cluster). A node's memory
    system saturates well before its CPU slots do — measured here:
    identical warm tasks run 1.44-2x slower with 32 concurrent
    memory-touching workers than with <=16, while pure-CPU work scales
    to 32. Claiming ``ncpu/16`` slots per task caps such stages at ~16
    concurrent tasks per 32-slot node (a standard resource-modeling
    move for bandwidth-bound work; on a multi-node cluster this is a
    per-node cap because each node contributes its own slots)."""
    import os

    import ray

    override = os.environ.get("XLINK_HEAVY_CPUS")
    if override:
        return float(override)
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 — before init, be conservative
        ncpu = 8
    return max(1.0, ncpu / 16.0)


def prewarm_workers(mb: int = 64) -> int:
    """Touch every Ray worker process ONCE so later pipeline tasks run
    warm. On this sandbox kernel a process's first-touch page faults
    cost ~80 ms/MB (vs ~0.3 ms/MB on normal hosts), so the FIRST batch
    a fresh worker processes is 10-400x slower than steady state; with
    more worker processes than concurrent tasks, Ray keeps rotating
    executions onto never-touched workers, and that cold cost recurs
    on every run. One warm task per CPU slot — importing the hot
    modules and faulting a heap region ≥ the per-batch temporary
    footprint (heap retention is pinned by ``_tune_allocator``) —
    pays the cost once, off the measured path.

    Returns the number of distinct worker processes touched. Cheap
    no-op on normal hosts (~0.3 s total); callers own the Ray session
    (bench.py / CLI), the library never calls this itself."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))

    @ray.remote(num_cpus=1)
    def _warm(mb: int) -> int:
        import os
        import time as _t

        import numpy as _np

        import xlink_ray  # noqa: F401 — allocator tune + module import
        from xlink_ray.stages import candidates  # noqa: F401 — hot path

        buf = _np.empty((mb << 20) // 8, dtype=_np.float64)
        buf[:: 512] = 1.0  # touch every 4 KiB page
        _t.sleep(0.4)  # hold the slot so each task lands on a distinct worker
        return os.getpid()

    pids = ray.get([_warm.remote(mb) for _ in range(ncpu)])
    return len(set(pids))


def vecs_to_numpy(col, dtype="float64"):
    """Zero-copy-ish (vector list column → 2-D numpy): flattens the
    Arrow list buffer and reshapes when rows are uniform width —
    avoiding the to_pylist() python-object round trip that costs ~100×
    on wide embedding columns. Ragged input falls back to to_pylist."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        return (
            arr.flatten().to_numpy(zero_copy_only=False).reshape(n, d).astype(dtype)
        )
    widths = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    if (widths == widths[0]).all():
        return (
            arr.flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(n, int(widths[0]))
            .astype(dtype)
        )
    return np.asarray(arr.to_pylist(), dtype=dtype)
