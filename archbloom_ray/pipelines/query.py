"""Query pipelines — batch lookups against finalized sketches.

Distributed analogue of ``bloomtool query`` (reference
bin/bloomtool.c:81-105): the finalized sketch is broadcast through the
object store ONCE (``ray.put``) and every map task / actor reads it
zero-copy — the "broadcast join against a Bloom filter" pattern.  The
probe stream never shuffles.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..sketches.base import Sketch, sketch_from_bytes


def sketch_probe(
    ds: "ray.data.Dataset",
    sketch: Sketch | bytes,
    column: str,
    *,
    method: str = "lookup_batch",
    out_column: str = "present",
    concurrency=None,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Append a per-row probe column computed against a broadcast sketch.

    ``method`` is any vectorized batch query on the sketch —
    ``lookup_batch`` (membership), ``count_batch`` (counting variants),
    etc.  The sketch state ships to the object store once (``ray.put``);
    tasks on the shared worker pool deserialize it once per process via
    ``proc_cache`` (same amortization as an actor pool, no new
    processes).  ``concurrency`` is accepted for API compat and ignored.
    """
    from ..proc_cache import cached_instance

    state = sketch.to_bytes() if isinstance(sketch, Sketch) else bytes(sketch)
    state_ref = ray.put(state)

    def fn(batch: pa.Table) -> pa.Table:
        sk = cached_instance(
            ("sketch_probe", state_ref.hex()),
            lambda: sketch_from_bytes(ray.get(state_ref)),
        )
        result = getattr(sk, method)(batch[column])
        return batch.append_column(out_column, pa.array(result))

    return ds.map_batches(
        fn,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def membership(
    ds: "ray.data.Dataset",
    sketch: Sketch | bytes,
    column: str,
    **kwargs,
) -> "ray.data.Dataset":
    """Bloom/cuckoo-style membership probe: adds a bool ``present`` column."""
    return sketch_probe(ds, sketch, column, method="lookup_batch", **kwargs)
