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


class _SketchProbe:
    """Actor-pool stage: deserialize the broadcast sketch once per actor
    (``__init__``), probe per batch (``__call__``)."""

    def __init__(self, state_ref, column: str, method: str, out_column: str):
        state = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        self.sketch = sketch_from_bytes(state)
        self.column = column
        self.method = method
        self.out_column = out_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = getattr(self.sketch, self.method)
        result = fn(batch[self.column])
        return batch.append_column(self.out_column, pa.array(result))


def sketch_probe(
    ds: "ray.data.Dataset",
    sketch: Sketch | bytes,
    column: str,
    *,
    method: str = "lookup_batch",
    out_column: str = "present",
    concurrency: int = 4,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Append a per-row probe column computed against a broadcast sketch.

    ``method`` is any vectorized batch query on the sketch —
    ``lookup_batch`` (membership), ``count_batch`` (counting variants),
    etc.  The sketch state ships to the object store once.
    """
    state = sketch.to_bytes() if isinstance(sketch, Sketch) else bytes(sketch)
    state_ref = ray.put(state)
    return ds.map_batches(
        _SketchProbe,
        fn_constructor_args=(state_ref, column, method, out_column),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def membership(
    ds: "ray.data.Dataset",
    sketch: Sketch | bytes,
    column: str,
    **kwargs,
) -> "ray.data.Dataset":
    """Bloom/cuckoo-style membership probe: adds a bool ``present`` column."""
    return sketch_probe(ds, sketch, column, method="lookup_batch", **kwargs)
