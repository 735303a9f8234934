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

The cache is a small LRU (``MAX_ENTRIES``): every distinct broadcast
ref (typically one per query invocation) pins its state otherwise, and
a long-lived worker process serving many queries would grow without
bound.  Eviction is safe — an evicted state is simply rebuilt from its
(still-alive) broadcast ref on next use.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, Hashable

MAX_ENTRIES = 32

_CACHE: "OrderedDict[Hashable, Any]" = OrderedDict()


def get_or_build(key: Hashable, builder: Callable[[], Any]) -> Any:
    """Return the cached value for ``key`` in this worker process,
    building it once with ``builder`` on first use (LRU, bounded)."""
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    val = builder()
    _CACHE[key] = val
    while len(_CACHE) > MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return val


def cache_key_for_ref(ref) -> str:
    """Stable per-object key for a ``ray.ObjectRef``.  Requires a real
    ref: an ``id()``-based fallback could collide after GC and hand a
    DIFFERENT object's cached state to the caller."""
    if not hasattr(ref, "hex"):
        raise TypeError(f"expected ray.ObjectRef with .hex(), got {type(ref)!r}")
    return ref.hex()
