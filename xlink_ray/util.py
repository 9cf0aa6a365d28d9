"""Small runtime helpers."""

from __future__ import annotations

__all__ = ["pool_size", "ensure_fsspec_http_stub"]


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
