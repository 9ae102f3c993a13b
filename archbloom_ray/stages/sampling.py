"""Sampling / splitting stages for training-data pipelines.

* ``hash_split``: deterministic train/val/test assignment by keyed
  hash — every row with the same id lands in the same split on every
  run and on every cluster size (no RNG state, no shuffle; the split
  is a pure per-batch map).  This is the reproducible-split operator a
  10^12-row corpus needs: re-runs, resumes and backfills agree.
* distinct-value sampling is the ``KMVSketch`` (bottom-k) — mergeable,
  deterministic, uniform over the distinct-value set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..hashing import mmh3_64_batch


def split_assignments(ids, fractions: dict[str, float], seed: int = 42) -> np.ndarray:
    """Vectorized split label per id: u = h(id, seed)/2^64 mapped onto
    the cumulative fraction intervals (fractions must sum to ~1)."""
    names = list(fractions)
    cuts = np.cumsum([fractions[n] for n in names])
    if not 0.999 <= cuts[-1] <= 1.001:
        raise ValueError(f"fractions must sum to 1 (got {cuts[-1]})")
    cuts[-1] = 1.0  # absorb float slack so every row is assigned
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if not isinstance(ids, (pa.Array,)):
        ids = pa.array([str(x) for x in ids], type=pa.string())
    if not (pa.types.is_string(ids.type) or pa.types.is_binary(ids.type)
            or pa.types.is_large_string(ids.type)):
        ids = ids.cast(pa.string())
    u = mmh3_64_batch(ids, seed=seed).astype(np.uint64).astype(np.float64) / 2.0**64
    idx = np.searchsorted(cuts, u, side="right")
    idx = np.minimum(idx, len(names) - 1)
    return np.array(names, dtype=object)[idx]


def hash_split(
    ds: "ray.data.Dataset",
    id_col: str,
    fractions: dict[str, float],
    *,
    seed: int = 42,
    out_col: str = "split",
) -> "ray.data.Dataset":
    """Append a deterministic split column (e.g. train/val/test)."""

    def fn(batch: pa.Table) -> pa.Table:
        labels = split_assignments(batch[id_col], fractions, seed)
        return batch.append_column(out_col, pa.array(list(labels), type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
