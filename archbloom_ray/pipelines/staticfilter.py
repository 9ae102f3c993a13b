"""Sharded static-filter build + probe (xor filters at corpus scale).

An xor filter is immutable and needs all its keys at construction
(sketches/xorf.py), so the distributed shape is NOT update→merge (the
Bloom path, pipelines/build.py) but shard→build→route:

  build:  one scan hashes the key column (mmh3_64), routes each 8-byte
          hash to a shard by its top hash bits, and a per-shard reducer
          peels one XorFilter over its hashes.  The shuffle moves ONLY
          the 8-byte hashes — never the keys/texts — and each reducer's
          working set is n/num_shards keys, so shard count scales the
          build to any corpus (10^12 keys = 4096 shards × 244M hashes).
  probe:  the shard→filter map is broadcast once (ray.put); each probe
          batch hashes its keys, recomputes the shard routing locally
          and answers from the matching filter — no shuffle at all.

The shard function is a pure function of the key hash, so build and
probe can never disagree on routing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..hashing import mmh3_64_batch
from ..sketches.base import sketch_from_bytes
from ..sketches.xorf import XorFilter

_TOP = np.uint64(56)


def _shard_of(h: np.ndarray, num_shards: int) -> np.ndarray:
    return (h >> _TOP) % np.uint64(num_shards)


def build_sharded_xor(
    ds: "ray.data.Dataset",
    column: str,
    *,
    num_shards: int = 16,
    bits: int = 8,
) -> dict[int, bytes]:
    """One filter per hash shard; returns {shard: serialized filter}.

    Output size is ~1.23·bits/8 bytes per distinct key total — small
    enough to broadcast (a 10^9-key set at 8 bits is ~1.2 GB; shard the
    PROBE side too before that point, or raise num_shards and keep the
    states in the object store per shard)."""
    num_shards = int(num_shards)

    def hash_batch(batch: pa.Table) -> pa.Table:
        h = mmh3_64_batch(batch[column]).astype(np.uint64)
        return pa.table({
            "shard": pa.array(_shard_of(h, num_shards).astype(np.int64)),
            "h": pa.array(h.view(np.int64)),
        })

    def build_group(g: pa.Table) -> pa.Table:
        shard = g["shard"][0].as_py()
        h = np.asarray(g["h"], dtype=np.int64).view(np.uint64)
        f = XorFilter.build_hashes(h, bits=bits, name=f"shard{shard}")
        return pa.table({
            "shard": pa.array([shard], type=pa.int64()),
            "state": pa.array([f.to_bytes()], type=pa.binary()),
        })

    states = (
        ds.map_batches(hash_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(build_group, batch_format="pyarrow")
    )
    return {r["shard"]: r["state"] for r in states.take_all()}


def sharded_xor_probe(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    *,
    num_shards: int = 16,
    out_column: str = "present",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Append a bool membership column answered by the sharded filters
    (broadcast once, deserialized once per worker process)."""
    from ..proc_cache import cached_instance

    num_shards = int(num_shards)
    ref = ray.put(dict(states))

    def fn(batch: pa.Table) -> pa.Table:
        filters = cached_instance(
            ("sharded_xor", ref.hex()),
            lambda: {s: sketch_from_bytes(b)
                     for s, b in ray.get(ref).items()},
        )
        h = mmh3_64_batch(batch[column]).astype(np.uint64)
        shard = _shard_of(h, num_shards)
        out = np.zeros(h.size, dtype=bool)
        for s in np.unique(shard):
            m = shard == s
            f = filters.get(int(s))
            if f is not None:
                out[m] = f.contains_hashes(h[m])
        return batch.append_column(out_column, pa.array(out))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def build_sharded_xormap(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    *,
    num_shards: int = 16,
    bits: int = 8,
) -> dict[int, bytes]:
    """One retrieval map per hash shard; returns {shard: state bytes}.

    Same shard→build→route shape as :func:`build_sharded_xor` (a map
    is static too), shuffling (8-byte hash, value) pairs — never the
    keys.  Conflicting duplicate keys raise inside the owning reducer
    (a function must be single-valued)."""
    from ..sketches.xorf import XorMap

    num_shards = int(num_shards)

    def hash_batch(batch: pa.Table) -> pa.Table:
        h = mmh3_64_batch(batch[key_column]).astype(np.uint64)
        return pa.table({
            "shard": pa.array(_shard_of(h, num_shards).astype(np.int64)),
            "h": pa.array(h.view(np.int64)),
            "v": pa.array(np.asarray(batch[value_column], dtype=np.int64)),
        })

    def build_group(g: pa.Table) -> pa.Table:
        shard = g["shard"][0].as_py()
        h = np.asarray(g["h"], dtype=np.int64).view(np.uint64)
        v = np.asarray(g["v"], dtype=np.int64)
        m = XorMap.build_hashes_values(h, v, bits=bits, name=f"shard{shard}")
        return pa.table({
            "shard": pa.array([shard], type=pa.int64()),
            "state": pa.array([m.to_bytes()], type=pa.binary()),
        })

    states = (
        ds.map_batches(hash_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(build_group, batch_format="pyarrow")
    )
    return {r["shard"]: r["state"] for r in states.take_all()}


def sharded_xormap_get(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    *,
    num_shards: int = 16,
    out_column: str = "value",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Append the retrieved value column (exact for built keys,
    arbitrary for absent ones — pair with a sharded xor filter when
    absence must be detected; an absent SHARD returns 0)."""
    from ..proc_cache import cached_instance

    num_shards = int(num_shards)
    ref = ray.put(dict(states))

    def fn(batch: pa.Table) -> pa.Table:
        maps = cached_instance(
            ("sharded_xormap", ref.hex()),
            lambda: {s: sketch_from_bytes(b)
                     for s, b in ray.get(ref).items()},
        )
        h = mmh3_64_batch(batch[column]).astype(np.uint64)
        shard = _shard_of(h, num_shards)
        out = np.zeros(h.size, dtype=np.int64)
        for s in np.unique(shard):
            msk = shard == s
            mp = maps.get(int(s))
            if mp is not None:
                out[msk] = mp.get_hashes(h[msk]).astype(np.int64)
        return batch.append_column(out_column, pa.array(out))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)
