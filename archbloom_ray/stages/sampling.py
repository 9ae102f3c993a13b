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


def weighted_sample(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int,
    *,
    seed: int = 42,
) -> "ray.data.Dataset":
    """Deterministic weighted sample without replacement (Efraimidis &
    Spirakis A-ES): each row's rank is ``u^(1/w)`` with ``u`` the
    row's keyed-hash uniform — keep the global top-``k`` ranks.  No RNG
    state: the same corpus + seed gives the same sample on every run,
    partitioning and cluster size.  Distributed shape: per-batch local
    top-k (at most k rows survive a batch), then one driver-side merge
    of ≤ k·blocks candidates via a final groupby-free local sort in a
    single-group reduce.

    Uses log-space (``log(u)/w``) so tiny weights can't underflow."""
    import pyarrow.compute as pc

    from ..hashing import mmh3_64_batch

    def local(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        key = ids if pa.types.is_string(ids.type) else pc.cast(ids, pa.string())
        h = mmh3_64_batch(key, seed=seed).astype(np.uint64)
        u = (h.astype(np.float64) + 1.0) / (2.0**64 + 1.0)  # u ∈ (0,1)
        w = np.asarray(batch[weight_col], dtype=np.float64)
        w = np.maximum(w, 1e-300)
        rank = np.log(u) / w  # maximize u^(1/w) ⇔ maximize log(u)/w
        batch = batch.append_column("_rank", pa.array(rank))
        order = np.argsort(-rank, kind="stable")[: min(k, len(rank))]
        return batch.take(pa.array(np.sort(order)))

    pruned = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)

    def add_const(batch: pa.Table) -> pa.Table:
        return batch.append_column("_g", pa.array(np.zeros(len(batch), np.int8)))

    def global_topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("_rank", "descending")])
        return group.take(idx.slice(0, k)).drop_columns(["_rank", "_g"])

    return pruned.map_batches(add_const, batch_format="pyarrow",
                              zero_copy_batch=True).groupby("_g").map_groups(
        global_topk, batch_format="pyarrow")
