"""xlink_ray — a Ray-Data-native entity-resolution / web-text data-processing engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the XLink entity-linking system (reference:
solitaryzero/XLink), re-expressed Ray-Data-first:

* every logical table is a ``ray.data.Dataset`` of Arrow blocks,
* per-record transforms are vectorized ``map_batches`` stages,
* stateful stages (dictionaries, automatons, embedding matrices) are
  actor pools with state loaded once per actor in ``__init__``,
* wide steps (grouped counts, probability tables, blocking, transitive
  clustering) are explicit ``groupby`` / aggregate shuffles with
  documented partition keys and skew handling.

Nothing here imports from the reference; file:line citations in
docstrings point at the behavior being matched, not code being reused.
"""

__version__ = "0.1.0"


def _tune_allocator() -> None:
    """Serve large allocations from the reusable glibc heap instead of
    per-allocation mmap.

    On this kernel the first touch of freshly mmapped pages costs
    ~80 ms/MB (measured: a 178 MB numpy gather = 13-16 s cold, 0.05 s
    from reused pages). glibc returns every >128 KB allocation to the
    OS on free, so EVERY large numpy temporary repaid that fault cost.
    Raising M_MMAP_THRESHOLD keeps big buffers on the heap, where freed
    pages stay faulted-in and are reused — each worker pays the fault
    cost once per high-water mark instead of once per batch. No-op on
    non-glibc platforms.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD — big allocs on heap
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD — never give pages back
    except Exception:  # noqa: BLE001 — allocator tuning is best-effort
        pass
    try:
        import pyarrow as _pa

        # route Arrow buffers through the same (now page-retaining)
        # glibc heap; the default jemalloc pool madvises pages back to
        # the OS per batch, repaying the fault tax on every block
        _pa.set_memory_pool(_pa.system_memory_pool())
    except Exception:  # noqa: BLE001
        pass


_tune_allocator()


def _filter_empty_schema_warnings() -> None:
    """Drop Ray's per-bundle "Operator produced a RefBundle with a
    different schema … new schema: ." warnings — and ONLY those.

    Ray 2.49's sort-based shuffle (``groupby().map_groups`` = sort +
    map) pads partitions that received no groups with zero-column
    empty blocks, and every such block makes the streaming executor
    log a schema-mismatch warning at the next operator boundary
    (streaming_executor_state.py:793). The bundles are empty, the
    output is unaffected, and the flood buries real warnings in bench
    logs. Schema mismatches with a NON-empty new schema still pass
    through this filter untouched.
    """
    import logging

    class _EmptyNewSchemaFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
            msg = record.getMessage()
            return not (
                "different schema than the previous one" in msg
                and "new schema: ." in msg
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyNewSchemaFilter())


_filter_empty_schema_warnings()
