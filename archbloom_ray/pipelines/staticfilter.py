"""Sharded static-structure build + probe (xor filters / retrieval
maps at corpus scale).

An xor filter (and its retrieval-map sibling) is immutable and needs
all its keys at construction (sketches/xorf.py), so the distributed
shape is NOT update→merge (the Bloom path, pipelines/build.py) but
shard→build→route:

  build:  one scan hashes the key column (mmh3_64), routes each 8-byte
          hash to a shard by its top hash bits, and a per-shard reducer
          peels one structure over its hashes.  The shuffle moves ONLY
          the 8-byte hashes (+ the w-bit value for maps) — never the
          keys/texts — and each reducer's working set is n/num_shards
          keys, so shard count scales the build to any corpus (10^12
          keys = 4096 shards × 244M hashes).
  probe:  the shard→structure map is broadcast once (ray.put); each
          probe batch hashes its keys, recomputes the shard routing
          locally and answers from the matching structure — no shuffle.

The shard function is a pure function of the key hash, so build and
probe can never disagree on routing.  Filter and map share the
build/route plumbing below — one copy to keep correct.
"""

from __future__ import annotations

from typing import Callable

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


# -- shared shard→build→route plumbing --------------------------------

def _sharded_build(ds: "ray.data.Dataset", key_column: str,
                   num_shards: int,
                   extra_cols: Callable[[pa.Table], dict] | None,
                   build_group: Callable[[int, np.ndarray, pa.Table], bytes],
                   ) -> dict[int, bytes]:
    """Hash + route + per-shard build.  ``extra_cols(batch)`` may add
    numpy payload columns riding the shuffle (e.g. a map's values);
    ``build_group(shard, hashes, group)`` returns the shard's state.

    Per-batch rows are packed into one LIST row per (batch, shard)
    (the `_pack_lists` discipline every sharded build here follows) —
    shuffle bytes unchanged, row count shrunk by the keys-per-shard
    factor, so the exchange's sort cost never sees per-key rows."""
    from .build import _pack_lists, _unpack_list

    def hash_batch(batch: pa.Table) -> pa.Table:
        h = mmh3_64_batch(batch[key_column]).astype(np.uint64)
        shard = _shard_of(h, num_shards).astype(np.int32)
        order = np.argsort(shard, kind="stable")
        cols = {"h": h.view(np.int64)[order]}
        if extra_cols is not None:
            for name, arr in extra_cols(batch).items():
                cols[name] = np.asarray(arr)[order]
        return _pack_lists(shard[order], cols)

    def build(g: pa.Table) -> pa.Table:
        shard = g["shard"][0].as_py()
        h = _unpack_list(g["h"]).view(np.uint64)
        return pa.table({
            "shard": pa.array([shard], type=pa.int64()),
            "state": pa.array([build_group(shard, h, g)], type=pa.binary()),
        })

    states = (
        ds.map_batches(hash_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(build, batch_format="pyarrow")
    )
    return {r["shard"]: r["state"] for r in states.take_all()}


def _routed_apply(ds: "ray.data.Dataset", states: dict[int, bytes],
                  column: str, num_shards: int, cache_tag: str,
                  apply_fn: Callable[[object, np.ndarray], np.ndarray],
                  out_column: str, out_dtype, batch_size: int,
                  absent_shard: str = "zero",
                  ) -> "ray.data.Dataset":
    """Broadcast the shard map once and answer per batch from the
    locally recomputed routing.  ``absent_shard`` controls a probe key
    routing to a shard missing from ``states``: ``"zero"`` keeps the
    zero default (sound for MEMBERSHIP — an absent shard holds no
    keys, absent ⇒ not-present), ``"raise"`` errors (required for
    RETRIEVAL, where 0 is inside the value domain and a truncated or
    mismatched states dict would silently yield plausible wrong
    values)."""
    from ..proc_cache import cached_instance

    ref = ray.put(dict(states))

    def fn(batch: pa.Table) -> pa.Table:
        structs = cached_instance(
            (cache_tag, ref.hex()),
            lambda: {s: sketch_from_bytes(b)
                     for s, b in ray.get(ref).items()},
        )
        h = mmh3_64_batch(batch[column]).astype(np.uint64)
        shard = _shard_of(h, num_shards)
        out = np.zeros(h.size, dtype=out_dtype)
        for s in np.unique(shard):
            msk = shard == s
            st = structs.get(int(s))
            if st is not None:
                out[msk] = apply_fn(st, h[msk])
            elif absent_shard == "raise":
                raise KeyError(
                    f"{cache_tag}: probe batch routed {int(msk.sum())} "
                    f"key(s) to shard {int(s)} which is missing from the "
                    f"states dict ({len(structs)} of {num_shards} shards "
                    "present) — retrieval cannot default to 0; rebuild or "
                    "pass the full shard map")
        return batch.append_column(out_column, pa.array(out))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


# -- xor FILTER (membership) ------------------------------------------

def build_sharded_xor(
    ds: "ray.data.Dataset",
    column: str,
    *,
    num_shards: int = 16,
    bits: int = 8,
    kind: str = "xor",
) -> dict[int, bytes]:
    """One filter per hash shard; returns {shard: serialized filter}.

    ``kind='xor'`` (1.23·bits/8 B/key) or ``'bfuse'`` (binary fuse —
    ~1.125 factor for corpus-scale shards; JEA'22).  Output size is
    small enough to broadcast (a 10^9-key set at 8 bits is ~1.2 GB;
    shard the PROBE side too before that point, or raise num_shards
    and keep the states in the object store per shard).  The probe
    (:func:`sharded_xor_probe`) is kind-agnostic — states deserialize
    by magic."""
    from ..sketches.xorf import BinaryFuseFilter

    if kind not in ("xor", "bfuse"):
        raise ValueError(f"unknown static filter kind {kind!r}")
    cls = XorFilter if kind == "xor" else BinaryFuseFilter
    num_shards = int(num_shards)

    def build_group(shard: int, h: np.ndarray, g: pa.Table) -> bytes:
        return cls.build_hashes(h, bits=bits,
                                name=f"shard{shard}").to_bytes()

    return _sharded_build(ds, column, num_shards, None, build_group)


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
    (broadcast once, deserialized once per worker process).  An absent
    shard holds no keys (absent ⇒ not present)."""
    return _routed_apply(
        ds, states, column, int(num_shards), "sharded_xor",
        lambda f, h: f.contains_hashes(h), out_column, bool, batch_size)


def make_sharded_xor_prober(states: dict[int, bytes], num_shards: int,
                            cache_tag: str = "sharded_xor"):
    """Return a per-batch callable ``keys(pa.Array) -> bool ndarray``
    answering membership from broadcast sharded xor states — for
    embedding the probe INSIDE another ``map_batches`` stage (e.g. the
    dedup verifiers' candidate-id pruning) where the Dataset-level
    :func:`sharded_xor_probe` doesn't fit.  States broadcast once
    (``ray.put`` at closure creation), deserialized once per worker
    process; an absent shard holds no keys (absent ⇒ not present)."""
    from ..proc_cache import cached_instance

    num_shards = int(num_shards)
    ref = ray.put(dict(states))

    def probe(keys) -> np.ndarray:
        structs = cached_instance(
            (cache_tag, ref.hex()),
            lambda: {s: sketch_from_bytes(b)
                     for s, b in ray.get(ref).items()},
        )
        h = mmh3_64_batch(keys).astype(np.uint64)
        shard = _shard_of(h, num_shards)
        out = np.zeros(h.size, dtype=bool)
        for s in np.unique(shard):
            st = structs.get(int(s))
            if st is not None:
                msk = shard == s
                out[msk] = st.contains_hashes(h[msk])
        return out

    return probe


# -- xor MAP (static key→value retrieval) -----------------------------

def build_sharded_xormap(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    *,
    num_shards: int = 16,
    bits: int = 8,
) -> dict[int, bytes]:
    """One retrieval map per hash shard; returns {shard: state bytes}.

    Same shard→build→route shape as :func:`build_sharded_xor`,
    shuffling (8-byte hash, value) pairs — never the keys.
    Conflicting duplicate keys raise inside the owning reducer (a
    function must be single-valued)."""
    from ..sketches.xorf import XorMap

    num_shards = int(num_shards)

    def extra(batch: pa.Table) -> dict:
        return {"v": np.asarray(batch[value_column], dtype=np.int64)}

    def build_group(shard: int, h: np.ndarray, g: pa.Table) -> bytes:
        from .build import _unpack_list

        v = _unpack_list(g["v"])
        return XorMap.build_hashes_values(
            h, v, bits=bits, name=f"shard{shard}").to_bytes()

    states = _sharded_build(ds, key_column, num_shards, extra, build_group)
    # a retrieval probe treats a MISSING shard as truncation and raises
    # (sharded_xormap_get) — so legitimately-empty shards (no key routed
    # there; likely on small corpora) must still ship a state: emit an
    # empty map for them, making absence unambiguous
    empty = np.empty(0, dtype=np.uint64)
    for s in range(num_shards):
        if s not in states:
            states[s] = XorMap.build_hashes_values(
                empty, np.empty(0, dtype=np.int64), bits=bits,
                name=f"shard{s}").to_bytes()
    return states


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
    absence must be detected).  A probe routing to a shard MISSING
    from ``states`` raises: unlike the filter probe (absent shard ⇒
    not-present is sound), 0 is inside the value domain here, so a
    truncated states dict would silently return plausible wrong
    values."""
    return _routed_apply(
        ds, states, column, int(num_shards), "sharded_xormap",
        lambda m, h: m.get_hashes(h).astype(np.int64),
        out_column, np.int64, batch_size, absent_shard="raise")
