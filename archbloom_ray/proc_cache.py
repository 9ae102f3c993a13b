"""Per-worker-process instance cache for cheap-state batch callables.

A ``map_batches`` stage whose setup is cheap to rebuild (compiled
regexes, permutation tables, a broadcast sketch fetched once with
``ray.get``) does NOT need a dedicated actor pool: running it as plain
tasks keeps the work on Ray's reused default worker pool — warm
allocator arenas, no actor-start latency, no extra processes — while a
process-local cache gives the same construct-once-per-process
amortization an actor's ``__init__`` would.

Reserve actor pools (callable class + ``concurrency=``) for genuinely
expensive state: models that take seconds to load, mutable per-partition
accumulators, codecs with native handles (see ``stages/multimodal.py``).

This matters doubly in environments where fresh processes fault pages
slowly: every new actor process pays a first-touch tax that the shared
task-worker pool has already paid.
"""

from __future__ import annotations

from typing import Any, Callable, Hashable

_CACHE: dict[Hashable, Any] = {}


def cached_instance(key: Hashable, ctor: Callable[[], Any]) -> Any:
    """Return the process-local instance for ``key``, building it with
    ``ctor`` on this worker's first use."""
    inst = _CACHE.get(key)
    if inst is None:
        inst = _CACHE[key] = ctor()
    return inst
