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


def quiet_ray_data_logs() -> None:
    """Silence Ray Data's harmless per-batch "Failed to hash the schemas
    (for deduplication)" warning on the CURRENT process (ray.data
    unify_schemas probing; fires once per task and floods bench logs).
    Workers re-apply Ray Data's logging config after any setup hook, so
    for workers use :func:`ray_data_logging_config_path` instead."""
    import logging

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).setLevel(logging.ERROR)


def ray_data_logging_config_path() -> str:
    """Write (once) a Ray Data logging config equal to the default plus
    the noisy ``transform_pyarrow`` logger pinned at ERROR, and return
    its path.  Set ``RAY_DATA_LOGGING_CONFIG`` to this path in the
    driver env AND in ``runtime_env.env_vars`` — Ray Data applies it
    when it configures logging in each worker, which is the only
    override that survives its per-process reconfiguration.  Returns ""
    if the Ray internals moved (callers then skip the env var)."""
    import os

    path = "/tmp/archbloom_ray_data_logging.yaml"
    try:
        import copy

        import yaml
        from ray.data._internal.logging import DEFAULT_CONFIG

        cfg = copy.deepcopy(DEFAULT_CONFIG)
        for noisy in (
            # unify_schemas hash probing — warns once per task
            "ray.data._internal.arrow_ops.transform_pyarrow",
            # "RefBundle with a different schema" — fires for every empty
            # hash partition of a groupby (empty blocks carry no schema)
            "ray.data._internal.execution.streaming_executor_state",
        ):
            cfg.setdefault("loggers", {})[noisy] = {
                "level": "ERROR", "handlers": ["file"], "propagate": False}
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            yaml.safe_dump(cfg, f)
        os.replace(tmp, path)
        return path
    except Exception:
        return ""
