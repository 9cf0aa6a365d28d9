"""Worker-process state cache for task-based stateful stages.

An actor pool pays a fresh process spawn + import per actor; plain
tasks reuse Ray's pre-started worker pool. For stages whose state
builds quickly from broadcast refs, a per-worker cache gives the same
"build once per process" behavior without the spawn cost (measured
~1.5× end-to-end on the candidate scan at both 8 and 32 CPUs). The
callable-class actor forms remain available for states that are
expensive to build or hold non-shareable resources.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict = {}
_MAX_ENTRIES = 8


def cached_state(key: Any, builder: Callable[[], Any]) -> Any:
    """Return the worker-local state for ``key``, building it once.
    Key must be content-stable across tasks (e.g. ObjectRef hex)."""
    st = _CACHE.get(key)
    if st is None:
        if len(_CACHE) >= _MAX_ENTRIES:
            _CACHE.clear()
        st = builder()
        _CACHE[key] = st
    return st
