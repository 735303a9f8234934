"""Per-worker-process state cache for TASK-based stateful stages.

Actor pools (``map_batches(Cls, concurrency=N)``) pay a fresh process
spawn + import storm per stage execution — measured at ~5s of the
image-PIP pipeline's 6.4s wall at 32 cpus once the per-row work was
optimized away.  For stages whose state is a broadcast object (a cell
index, compiled patterns, a query matrix), the task-pool analogue is
cheaper: run plain ``map_batches(fn)`` over the WARM worker pool and
cache the built state per worker process in this module (importable, so
Ray's worker-side module cache keeps it alive across tasks — the same
pattern as compute_probe._STATE).

Actor pools remain the right tool when state is heavy to BUILD per
process (a model load measured in seconds) and the job is long enough
to amortize the spawn; both modes stay available on each stage.
"""

from __future__ import annotations

from typing import Any, Callable, Hashable

_CACHE: dict = {}


def get_or_build(key: Hashable, builder: Callable[[], Any]) -> Any:
    """Return the cached value for ``key`` in this worker process,
    building it once with ``builder`` on first use."""
    val = _CACHE.get(key)
    if val is None:
        val = builder()
        _CACHE[key] = val
    return val


def cache_key_for_ref(ref) -> str:
    """Stable per-object key for an ``ray.ObjectRef``."""
    return ref.hex() if hasattr(ref, "hex") else str(id(ref))
