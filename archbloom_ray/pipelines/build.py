"""Distributed sketch build — the engine's core pipeline.

Generalizes the reference's single-process build loop (``bloomtool
create``: stdin lines → ``bloom_add`` one element at a time →
``bloom_save``, reference bin/bloomtool.c:20-79) to the mergeable-UDAF
shape on Ray Data:

    read → map_batches(update: batch → one partial state row)
         → tree merge (associative, bounded fan-in)
         → finalized sketch / checkpoint

Design for 10^12-row scale:

* The update stage is **stateless per-batch tasks**: each task builds a
  partial sketch for its batch only, so Ray's lineage-based retry
  replays just the lost block (no actor state to lose).  Partial-state
  size is O(m), independent of rows.
* The merge is a **bounded-fan-in tree** over partial-state rows — the
  single hot ``sketch_id`` key never funnels through a one-reducer
  groupby.  Sketch merges are associative + commutative, so tree order
  does not change the result (exact for Bloom/HLL/CMS; within
  documented tolerance for t-digest/KLL).
* Grouped builds pre-combine inside the batch (one partial per key per
  batch) so the shuffle moves ≤ |keys| small rows per batch instead of
  every input row — the salted-combine answer to skewed keys like
  ``lang='en'``.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..sketches.base import Sketch, sketch_from_bytes

# At most this many partial states are merged on the driver / in one
# merge task; above it, distributed merge rounds run first.
DEFAULT_FANIN = 64


def _partial_update_fn(column: str, factory: Callable[[], Sketch]):
    """Batch → one partial-state row. Stateless: retry-safe via lineage."""

    def update(batch: pa.Table) -> pa.Table:
        sk = factory()
        sk.update_arrow(batch[column])
        return pa.table({"state": pa.array([sk.to_bytes()], type=pa.large_binary())})

    return update


def _merge_block(batch: pa.Table) -> pa.Table:
    """Merge every partial state in a block into one (tree-merge step)."""
    states = batch["state"].to_pylist()
    if not states:
        return batch
    acc = sketch_from_bytes(states[0])
    for s in states[1:]:
        acc.merge(sketch_from_bytes(s))
    return pa.table({"state": pa.array([acc.to_bytes()], type=pa.large_binary())})


def sketch_partials(
    ds: "ray.data.Dataset",
    column: str,
    factory: Callable[[], Sketch],
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Stage 1: per-batch partial sketches as ``{state: binary}`` rows."""
    return ds.map_batches(
        _partial_update_fn(column, factory),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def merge_partials(
    partials: "ray.data.Dataset",
    *,
    fanin: int = DEFAULT_FANIN,
) -> Sketch:
    """Tree-merge partial-state rows down to one sketch.

    Runs distributed merge rounds with bounded fan-in until few enough
    partials remain, then finishes on the driver.  This is the
    distributed analogue of ``bloom_merge`` (reference bloom.c:770-795)
    applied along a tree instead of a single pair.
    """
    # materialize the (small) partial states so count() + merge rounds do
    # not re-execute the full input scan
    ds = partials.materialize()
    n = ds.count()
    while n > fanin:
        nparts = math.ceil(n / fanin)
        ds = ds.repartition(nparts).map_batches(
            _merge_block, batch_format="pyarrow", batch_size=None
        )
        ds = ds.materialize()
        n = ds.count()
    states = [r["state"] for r in ds.take_all()]
    if not states:
        raise ValueError("no partial states: empty input dataset")
    acc = sketch_from_bytes(states[0])
    for s in states[1:]:
        acc.merge(sketch_from_bytes(s))
    return acc


def build_sketch(
    ds: "ray.data.Dataset",
    column: str,
    factory: Callable[[], Sketch],
    *,
    batch_size: int = 65536,
    fanin: int = DEFAULT_FANIN,
) -> Sketch:
    """End-to-end distributed build of one sketch over ``ds[column]``."""
    return merge_partials(
        sketch_partials(ds, column, factory, batch_size=batch_size), fanin=fanin
    )


def build_sketches(
    ds: "ray.data.Dataset",
    specs: dict[str, tuple[str, Callable[[], Sketch]]],
    *,
    batch_size: int = 65536,
    fanin: int = DEFAULT_FANIN,
    num_cpus: float | None = None,
) -> dict[str, Sketch]:
    """Build several sketches in ONE pass over the input.

    ``specs`` maps sketch_id → (column, factory).  Each batch task
    updates every sketch and emits one ``(sketch_id, state)`` row per
    spec; the merge stage groups by sketch_id with bounded-fan-in
    pre-merge inside blocks, so the input is scanned once however many
    sketches are requested — at 100 TB the scan dominates, so this is
    the economical shape.

    SIZING RULE (measured, r5): combine traffic is n_batches ×
    Σ state_bytes, and capacity-proportional states (Bloom: O(rows))
    make that QUADRATIC in rows at a fixed ``batch_size`` — at 32 M
    rows the default flooded 13–17 GB of Bloom partials through the
    merge shuffle and spilled an 8 GiB object store.  Scale
    ``batch_size`` with the corpus (e.g. ``max(65536, rows // 32)`` —
    ~32 partials at any size), and beyond what one machine's store
    absorbs route capacity-proportional filters to the sharded builds
    (``build_sharded_*`` — traffic independent of state size;
    :func:`plan_filter_build` is the cost-model chooser).
    """
    ids = list(specs)

    def update(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..hashing import mmh3_128_batch

        hash_cache: dict[str, tuple] = {}  # column → (h1, h2): hash ONCE per batch
        vc_cache: dict[str, tuple | None] = {}  # column → (values, counts) | None

        def value_counts(col: str):
            """Adaptive per-batch pre-aggregation: when a 4096-row probe
            says the column is low-cardinality (< 25% distinct), ONE
            Arrow value_counts pass replaces per-row sketch work — a
            5-language column then costs 5 hash/insert ops per sketch
            instead of 262k, and numeric sketches skip sorting the raw
            column.  High-cardinality columns (urls) pay only the tiny
            probe and keep the shared-full-hash path."""
            if col not in vc_cache:
                arr = batch[col]
                probe = arr.slice(0, 4096) if len(arr) > 4096 else arr
                if (len(probe) < 64 or
                        pc.count_distinct(probe).as_py() > 0.25 * len(probe)):
                    vc_cache[col] = None
                else:
                    vc = pc.value_counts(arr.combine_chunks())
                    vc_cache[col] = (vc.field("values"),
                                     np.asarray(vc.field("counts"),
                                                dtype=np.int64))
            return vc_cache[col]

        rows_id, rows_state = [], []
        for sid in ids:
            col, factory = specs[sid]
            sk = factory()
            dv = value_counts(col)
            if dv is not None and hasattr(sk, "update_weighted"):
                sk.update_weighted(dv[0], dv[1])
            elif dv is not None and getattr(sk, "SET_SEMANTICS", False):
                sk.update_arrow(dv[0])  # multiplicity irrelevant
            elif hasattr(sk, "update_hashes"):
                if col not in hash_cache:
                    hash_cache[col] = mmh3_128_batch(batch[col])
                sk.update_hashes(*hash_cache[col])
            else:
                sk.update_arrow(batch[col])
            rows_id.append(sid)
            rows_state.append(sk.to_bytes())
        return pa.table(
            {
                "sketch_id": pa.array(rows_id, type=pa.string()),
                "state": pa.array(rows_state, type=pa.large_binary()),
            }
        )

    extra = {"num_cpus": num_cpus} if num_cpus else {}
    partials = ds.map_batches(
        update, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True,
        **extra,
    )

    def merge_group(group: pa.Table, keep_salt: bool = False) -> pa.Table:
        states = group["state"].to_pylist()
        acc = sketch_from_bytes(states[0])
        for s in states[1:]:
            acc.merge(sketch_from_bytes(s))
        cols = {"sketch_id": pa.array([group["sketch_id"][0].as_py()])}
        if keep_salt:
            cols["salt"] = pa.array([group["salt"][0].as_py()], type=pa.int32())
        cols["state"] = pa.array([acc.to_bytes()], type=pa.large_binary())
        return pa.table(cols)

    # two-level merge: big partial states (a Bloom partial is O(m) bytes)
    # must not funnel through ONE reducer task per sketch_id — pre-merge
    # in S salted groups in parallel, then merge the S results
    import zlib

    def add_salt(batch: pa.Table) -> pa.Table:
        s = [zlib.crc32(st) % 8 for st in batch["state"].to_pylist()]
        return batch.append_column("salt", pa.array(s, type=pa.int32()))

    level1 = (
        partials.map_batches(add_salt, batch_format="pyarrow")
        .groupby(["sketch_id", "salt"])
        .map_groups(lambda g: merge_group(g, keep_salt=True), batch_format="pyarrow")
        .drop_columns(["salt"])
    )
    merged = level1.groupby("sketch_id").map_groups(merge_group, batch_format="pyarrow")
    return {r["sketch_id"]: sketch_from_bytes(r["state"]) for r in merged.take_all()}


def build_event_time_sketch(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    factory: Callable[[], Sketch],
    *,
    batch_size: int = 65536,
    fanin: int = DEFAULT_FANIN,
) -> Sketch:
    """Distributed build of a time-decaying sketch driven by EVENT time.

    ``factory`` must produce sketches sharing one explicit epoch
    (``start_time``) — the virtual clock that replaces the reference's
    ``CLOCK_MONOTONIC`` (tdbloom.c:58-64) so parallel builds are
    deterministic and slot-max merge equals sequential last-writer-wins
    under monotone time (SURVEY.md §7).  ``ts_column`` must be a
    timestamp column; ticks are its epoch-seconds.
    """

    def update(batch: pa.Table) -> pa.Table:
        sk = factory()
        col = batch[ts_column]
        sk.update_arrow(batch[key_column], now=_epoch_seconds(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col))
        return pa.table({"state": pa.array([sk.to_bytes()], type=pa.large_binary())})

    partials = ds.map_batches(
        update, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return merge_partials(partials, fanin=fanin)


def build_grouped_value_sketches(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    factories: dict[str, Callable[[], Sketch]],
    *,
    batch_size: int = 65536,
    salt: int = 8,
) -> "ray.data.Dataset":
    """Per-key sketches for weighted-updatable families (CMS, MG, …)
    with MINIMAL shuffle volume: ONE scan emits pre-aggregated
    ``(key, value, count)`` rows per batch (an Arrow in-batch group_by),
    the shuffle moves those tiny count rows — not O(sketch-size) partial
    states per key per batch — and the sketches are built REDUCER-side
    from weighted updates.  Exactly equivalent for linear sketches
    (CMS); within the documented deterministic bound for MG.

    All ``factories`` (sketch_id → factory over ``update_weighted``
    sketches) share the single scan and shuffle.  ``salt`` spreads each
    hot key's values over ``salt`` reducers (partition by hash(value));
    per-(key,salt) partial sketches then merge per key.

    Returns a Dataset of ``{sketch_id, key, state}`` rows.
    """
    from ..hashing import mmh3_32_batch

    salt = max(1, int(salt))

    def update(batch: pa.Table) -> pa.Table:
        t = pa.table({"key": batch[key_column], "value": batch[value_column]})
        g = t.group_by(["key", "value"]).aggregate([([], "count_all")])
        vals = g["value"].combine_chunks()
        s = (mmh3_32_batch(vals) % np.uint32(salt)).astype(np.int32)
        return pa.table({
            "key": g["key"], "value": vals,
            "count": g["count_all"], "salt": pa.array(s),
        })

    counts = ds.map_batches(
        update, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )

    ids = list(factories)

    def build_partials(group: pa.Table) -> pa.Table:
        # values repeat across batch partials — sum counts per value first
        agg = pa.table({"v": group["value"], "c": group["count"]}).group_by(
            ["v"]).aggregate([("c", "sum")])
        vals = agg["v"].combine_chunks()
        cnts = np.asarray(agg["c_sum"], dtype=np.int64)
        key = group["key"][0].as_py()
        out_sid, out_state = [], []
        for sid in ids:
            sk = factories[sid]()
            sk.update_weighted(vals, cnts)
            out_sid.append(sid)
            out_state.append(sk.to_bytes())
        return pa.table({
            "sketch_id": pa.array(out_sid, type=pa.string()),
            "key": pa.array([key] * len(ids)),
            "state": pa.array(out_state, type=pa.large_binary()),
        })

    level1 = counts.groupby(["key", "salt"]).map_groups(
        build_partials, batch_format="pyarrow")

    def merge_group(group: pa.Table) -> pa.Table:
        states = group["state"].to_pylist()
        acc = sketch_from_bytes(states[0])
        for s in states[1:]:
            acc.merge(sketch_from_bytes(s))
        return pa.table({
            "sketch_id": group["sketch_id"].slice(0, 1),
            "key": group["key"].slice(0, 1),
            "state": pa.array([acc.to_bytes()], type=pa.large_binary()),
        })

    return level1.groupby(["sketch_id", "key"]).map_groups(
        merge_group, batch_format="pyarrow")


def build_grouped_sketches(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    factory: Callable[[], Sketch],
    *,
    batch_size: int = 65536,
    salt: int = 0,
    via: str = "auto",
) -> "ray.data.Dataset":
    """One sketch per value of ``key_column`` (e.g. per-lang sketches).

    Weighted-updatable sketches (CMS, MG) route through
    :func:`build_grouped_value_sketches` — the shuffle then moves tiny
    pre-aggregated ``(key, value, count)`` rows instead of one
    O(sketch-size) state per key per batch (a CMS ε=0.001 partial is
    ~100 KB; at scale that volume dominated the grouped build).

    Other families (Bloom/HLL/…): stage A pre-combines inside each
    batch — one ``(key, state)`` row per key per batch regardless of
    row skew — so the groupby shuffle moves partial states, not rows.
    With ``salt > 0`` an extra salted combine level runs first:
    partials rendezvous by ``(key, h % salt)`` and are merged there
    before the final per-key merge, bounding the per-reducer fan-in for
    extremely hot keys (the ``lang='en'`` case in BASELINE.json's north
    star).

    ``via`` overrides the dispatch: ``"values"`` forces the count-row
    path, ``"states"`` the partial-state path.  The ``"auto"``
    heuristic (has update_weighted → values) is right for big-state
    sketches over repetitive columns; a SMALL-state sketch over a
    near-unique column (a KMV/VarOpt sampler over user ids) should
    pass ``via="states"`` — its partial is ~1 KB while its distinct
    count rows are the whole dataset.

    Returns a Dataset of ``{key, state}`` rows.
    """
    if via not in ("auto", "values", "states"):
        raise ValueError(f"via={via!r}: expected auto|values|states")
    use_values = (hasattr(factory(), "update_weighted")
                  if via == "auto" else via == "values")
    if use_values:
        grouped = build_grouped_value_sketches(
            ds, key_column, value_column, {"s": factory},
            batch_size=batch_size, salt=salt if salt > 0 else 8,
        )
        return grouped.drop_columns(["sketch_id"])

    def update(batch: pa.Table) -> pa.Table:
        keys = batch[key_column]
        vals = batch[value_column]
        # partition batch rows by key (vectorized dictionary-encode)
        enc = pa.compute.dictionary_encode(
            keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        )
        codes = np.asarray(enc.indices)
        uniq = enc.dictionary.to_pylist()
        out_keys, out_states = [], []
        vals_c = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
        for code, key in enumerate(uniq):
            sk = factory()
            sk.update_arrow(vals_c.filter(pa.array(codes == code)))
            out_keys.append(key)
            out_states.append(sk.to_bytes())
        return pa.table(
            {
                # keep the key column's own type (int hours group as
                # naturally as string langs)
                "key": pa.array(out_keys, type=enc.dictionary.type),
                "state": pa.array(out_states, type=pa.large_binary()),
            }
        )

    partials = ds.map_batches(
        update, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return _grouped_state_merge(partials, salt)


def _merge_state_group(group: pa.Table, key_cols: list[str]) -> pa.Table:
    states = group["state"].to_pylist()
    acc = sketch_from_bytes(states[0])
    for s in states[1:]:
        acc.merge(sketch_from_bytes(s))
    cols = {c: pa.array([group[c][0].as_py()]) for c in key_cols}
    cols["state"] = pa.array([acc.to_bytes()], type=pa.large_binary())
    return pa.table(cols)


def _grouped_state_merge(partials: "ray.data.Dataset",
                         salt: int) -> "ray.data.Dataset":
    """Per-key merge of ``{key, state}`` partial rows, with an optional
    salted pre-merge level bounding per-reducer fan-in for hot keys."""
    if salt > 0:
        # level 1: merge within (key, salt) buckets.  The salt must spread
        # the partials of ONE key across buckets; a per-batch round-robin
        # would collapse to salt=0 (each batch emits one partial per key),
        # so derive it from the partial's content (deterministic, uniform).
        import zlib

        def add_salt(batch: pa.Table) -> pa.Table:
            s = [zlib.crc32(st) % salt for st in batch["state"].to_pylist()]
            return batch.append_column("salt", pa.array(s, type=pa.int32()))

        salted = partials.map_batches(add_salt, batch_format="pyarrow")
        level1 = salted.groupby(["key", "salt"]).map_groups(
            lambda g: _merge_state_group(g, ["key", "salt"]),
            batch_format="pyarrow"
        )
        partials = level1.drop_columns(["salt"])

    return partials.groupby("key").map_groups(
        lambda g: _merge_state_group(g, ["key"]), batch_format="pyarrow"
    )


def _epoch_seconds(col) -> np.ndarray:
    """Column → int64 epoch seconds: timestamps floor-divide through
    int64 (a direct cast to timestamp[s] RAISES on fractional seconds);
    integer columns cast."""
    if pa.types.is_timestamp(col.type):
        unit = {"s": 1, "ms": 1_000, "us": 1_000_000,
                "ns": 1_000_000_000}[col.type.unit]
        return np.asarray(pa.compute.cast(col, pa.int64())) // unit
    return np.asarray(pa.compute.cast(col, pa.int64()))


def build_grouped_event_time_sketches(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    ts_column: str,
    factory: Callable[[], Sketch],
    *,
    batch_size: int = 65536,
    salt: int = 0,
) -> "ray.data.Dataset":
    """One EVENT-TIME sketch per key (e.g. a SlidingHyperLogLog per
    event_type): stage A pre-combines inside each batch — one
    ``(key, state)`` row per key per batch, with per-row ticks fed to
    ``update_arrow(values, now=secs)`` — so the shuffle moves partial
    states, not rows; the merge is the same salted per-key tree as
    :func:`build_grouped_sketches`.  Returns ``{key, state}`` rows."""

    def update(batch: pa.Table) -> pa.Table:
        keys = batch[key_column].combine_chunks() \
            if isinstance(batch[key_column], pa.ChunkedArray) \
            else batch[key_column]
        enc = pa.compute.dictionary_encode(keys)
        codes = np.asarray(enc.indices)
        uniq = enc.dictionary.to_pylist()
        vals = batch[value_column]
        vals_c = vals.combine_chunks() \
            if isinstance(vals, pa.ChunkedArray) else vals
        secs = _epoch_seconds(batch[ts_column].combine_chunks()
                              if isinstance(batch[ts_column],
                                            pa.ChunkedArray)
                              else batch[ts_column])
        out_keys, out_states = [], []
        for code, key in enumerate(uniq):
            mask = codes == code
            sk = factory()
            sk.update_arrow(vals_c.filter(pa.array(mask)), now=secs[mask])
            out_keys.append(key)
            out_states.append(sk.to_bytes())
        return pa.table({
            "key": pa.array(out_keys, type=enc.dictionary.type),
            "state": pa.array(out_states, type=pa.large_binary()),
        })

    partials = ds.map_batches(
        update, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True)
    return _grouped_state_merge(partials, salt)


def grouped_to_dict(grouped: "ray.data.Dataset") -> dict[str, Sketch]:
    """Collect a small grouped-sketch Dataset to {key: Sketch}."""
    return {r["key"]: sketch_from_bytes(r["state"]) for r in grouped.take_all()}


# ---------------------------------------------------------------------------
# Sharded Bloom / counting-Bloom build — the 10^12-key scale path.
#
# The partial-state build above ships one O(m)-byte state per batch; at
# 10^12 keys the bitmap is ~1 TB and the shuffle volume (n_batches × m)
# is untenable.  This path borrows the xor filter's shard→build→route
# shape (pipelines/staticfilter.py): the scan emits only (shard, bit/
# counter position) int64 rows — k×8 bytes per key, INDEPENDENT of m —
# the shuffle routes them by contiguous byte-aligned position ranges,
# and each reducer materializes only its own bitmap/counter shard.
#
# Equivalence is exact, not approximate:
#  * Bloom: bit-set is an idempotent position-wise OR, so "set bit p in
#    the shard owning p" reproduces the monolithic bitmap bit-for-bit.
#  * cbloom: every add is a +1 at k positions saturating at the width
#    max; min(cap, Σincrements) equals any sequential/merged clamping
#    order, so per-position int64 sums clamped once are bit-identical.
#
# The shard function is a pure function of the position (byte_index //
# shard_bytes), so build, probe and re-assembly can never disagree.
# ---------------------------------------------------------------------------


def _bloom_shard_bytes(total_bytes: int, num_shards: int) -> int:
    return max(1, math.ceil(total_bytes / num_shards))


def _pack_lists(shard_per_row: np.ndarray,
                cols: dict[str, np.ndarray]) -> pa.Table:
    """Pack parallel per-position arrays (already sorted by position,
    hence by shard — shard is monotone in position) into one LIST row
    per shard: {shard, col: list<...>}.  Keeps shuffle bytes identical
    while shrinking row count by the positions-per-shard factor."""
    starts = np.flatnonzero(np.concatenate(
        ([True], shard_per_row[1:] != shard_per_row[:-1])))
    offsets = np.append(starts, shard_per_row.size).astype(np.int32)
    out = {"shard": pa.array(shard_per_row[starts], type=pa.int32())}
    for name, arr in cols.items():
        out[name] = pa.ListArray.from_arrays(pa.array(offsets),
                                             pa.array(arr))
    return pa.table(out)


def _unpack_list(col) -> np.ndarray:
    """Flatten a list column back to its value array (int64)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr.flatten(), dtype=np.int64)


def sharded_bloom_partials(
    ds: "ray.data.Dataset",
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    batch_size: int = 65536,
) -> tuple["ray.data.Dataset", int]:
    """Stage 1: hash → k bit positions → deduped ``(shard, pos)`` rows.

    Returns ``(dataset, shard_bytes)``.  Per-batch ``np.unique`` cuts
    repeated positions before the shuffle; volume ≤ k×8 bytes/key."""
    from ..hashing import make_hashes_batch, mmh3_128_batch

    tpl = factory()
    m, k = tpl.size, tpl.hashcount
    total_bytes = (m + 7) // 8
    B = _bloom_shard_bytes(total_bytes, int(num_shards))
    # halve shuffle bytes when positions fit int32 (m < 2^31 bits =
    # bitmaps up to 256 MB; bigger filters keep int64)
    pos_dtype = np.int32 if m < (1 << 31) else np.int64

    def hash_batch(batch: pa.Table) -> pa.Table:
        h1, h2 = mmh3_128_batch(batch[column])
        pos = (make_hashes_batch(h1, h2, k) % np.uint64(m)).astype(np.int64)
        pos = np.unique(pos.ravel())
        shard = ((pos >> 3) // B).astype(np.int32)
        # pack per-shard position LISTS: the groupby then shuffles one
        # fat row per (batch, shard) — same bytes, ~10^4× fewer rows,
        # so the exchange's sort cost collapses
        return _pack_lists(shard, {"pos": pos.astype(pos_dtype)})

    parts = ds.map_batches(hash_batch, batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True)
    return parts, B


def build_sharded_bloom_states(
    ds: "ray.data.Dataset",
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    batch_size: int = 65536,
) -> dict[int, bytes]:
    """Sharded Bloom build → ``{shard: bitmap-slice bytes}``.

    Each reducer owns one contiguous byte range of the bitmap; a shard
    with no set bits is simply absent (all-zero).  At 10^12 keys raise
    ``num_shards`` so one shard's slice fits a reducer's heap — the
    scan/shuffle cost never sees m."""
    tpl = factory()
    total_bytes = (tpl.size + 7) // 8
    parts, B = sharded_bloom_partials(
        ds, column, factory, num_shards=num_shards, batch_size=batch_size)

    def build_shard(g: pa.Table) -> pa.Table:
        shard = g["shard"][0].as_py()
        pos = _unpack_list(g["pos"])
        local = pos - shard * B * 8
        buf = np.zeros(min(B, total_bytes - shard * B), dtype=np.uint8)
        np.bitwise_or.at(buf, local >> 3,
                         np.uint8(1) << (local & 7).astype(np.uint8))
        return pa.table({
            "shard": pa.array([shard], type=pa.int32()),
            "state": pa.array([buf.tobytes()], type=pa.large_binary()),
        })

    states = parts.groupby("shard").map_groups(
        build_shard, batch_format="pyarrow")
    return {r["shard"]: r["state"] for r in states.take_all()}


def assemble_sharded_bloom(
    states: dict[int, bytes],
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
) -> "Sketch":
    """Concatenate shard slices into ONE BloomFilter — bit-for-bit equal
    to the monolithic :func:`build_sketch` result.  Driver-side and
    O(m); only for filters that fit one machine (tests, export)."""
    sk = factory()
    total_bytes = sk.bitmap.size
    B = _bloom_shard_bytes(total_bytes, int(num_shards))
    for s, b in states.items():
        arr = np.frombuffer(b, dtype=np.uint8)
        sk.bitmap[s * B: s * B + arr.size] = arr
    return sk


def sharded_bloom_probe(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    out_column: str = "present",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Probe the sharded bitmap WITHOUT assembling it: the shard map is
    broadcast once (``ray.put``), each batch recomputes the pure
    position→shard routing locally and gathers bits per touched shard —
    no shuffle.  An absent shard is all-zero (absent ⇒ bit unset)."""
    from ..hashing import make_hashes_batch, mmh3_128_batch
    from ..proc_cache import cached_instance

    tpl = factory()
    m, k = tpl.size, tpl.hashcount
    total_bytes = (m + 7) // 8
    B = _bloom_shard_bytes(total_bytes, int(num_shards))
    ref = ray.put({int(s): b for s, b in states.items()})

    def probe(batch: pa.Table) -> pa.Table:
        shards = cached_instance(
            ("sharded_bloom_probe", ref.hex()),
            lambda: {s: np.frombuffer(b, dtype=np.uint8)
                     for s, b in ray.get(ref).items()},
        )
        h1, h2 = mmh3_128_batch(batch[column])
        pos = (make_hashes_batch(h1, h2, k) % np.uint64(m)).astype(np.int64)
        byte_idx = pos >> 3
        shard = byte_idx // B
        bits = np.zeros(pos.shape, dtype=np.uint8)
        for s in np.unique(shard):
            msk = shard == s
            arr = shards.get(int(s))
            if arr is not None:
                bits[msk] = (arr[byte_idx[msk] - int(s) * B]
                             >> (pos[msk] & 7).astype(np.uint8)) & 1
        return batch.append_column(out_column, pa.array(bits.all(axis=0)))

    return ds.map_batches(probe, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def build_sharded_cbloom_states(
    ds: "ray.data.Dataset",
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    batch_size: int = 65536,
) -> dict[int, bytes]:
    """Sharded counting-Bloom build → ``{shard: counter-slice bytes}``.

    The scan emits per-batch pre-aggregated ``(shard, pos, cnt)`` rows
    (np.unique with counts — increments of a hot position collapse to
    one row per batch); reducers sum int64 counts per position and
    clamp ONCE at the width max, which equals any sequential saturating
    order (increments are +1, so every clamping schedule yields
    min(cap, total)).  Shard slices use the LOGICAL counter dtype
    (uint8 for width 4 — nibble packing is a serialization concern)."""
    from ..hashing import make_hashes_batch, mmh3_128_batch

    tpl = factory()
    m, k = tpl.size, tpl.hashcount
    cap = tpl._max
    dtype = tpl.counters.dtype
    C = max(1, math.ceil(m / int(num_shards)))
    pos_dtype = np.int32 if m < (1 << 31) else np.int64

    def hash_batch(batch: pa.Table) -> pa.Table:
        h1, h2 = mmh3_128_batch(batch[column])
        pos = (make_hashes_batch(h1, h2, k) % np.uint64(m)).astype(np.int64)
        uniq, cnt = np.unique(pos.ravel(), return_counts=True)
        return _pack_lists((uniq // C).astype(np.int32),
                           {"pos": uniq.astype(pos_dtype),
                            "cnt": cnt.astype(np.int32)})

    def build_shard(g: pa.Table) -> pa.Table:
        shard = g["shard"][0].as_py()
        p = _unpack_list(g["pos"]) - shard * C
        c = _unpack_list(g["cnt"])
        order = np.argsort(p, kind="stable")
        ps, cs = p[order], c[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ps[1:] != ps[:-1])))
        sums = np.add.reduceat(cs, starts)
        buf = np.zeros(min(C, m - shard * C), dtype=dtype)
        if dtype == np.uint64:
            buf[ps[starts]] = sums.astype(np.uint64)  # can't reach 2^64−1
        else:
            buf[ps[starts]] = np.minimum(sums, cap).astype(dtype)
        return pa.table({
            "shard": pa.array([shard], type=pa.int32()),
            "state": pa.array([buf.tobytes()], type=pa.large_binary()),
        })

    states = (
        ds.map_batches(hash_batch, batch_format="pyarrow",
                       batch_size=batch_size, zero_copy_batch=True)
        .groupby("shard")
        .map_groups(build_shard, batch_format="pyarrow")
    )
    return {r["shard"]: r["state"] for r in states.take_all()}


def sharded_cbloom_probe(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    method: str = "count",
    out_column: str | None = None,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Probe the sharded COUNTING-Bloom counter slices WITHOUT
    assembling them (the cbloom sibling of :func:`sharded_bloom_probe`):
    the shard map broadcasts once, each batch recomputes the pure
    position→shard routing and gathers counters per touched shard —
    min-over-k is the cbloom count, count > 0 the membership.  An
    absent shard is all-zero (absent ⇒ count 0).  ``method``:
    ``"count"`` appends the int64 min-count, ``"lookup"`` the bool."""
    from ..hashing import make_hashes_batch, mmh3_128_batch
    from ..proc_cache import cached_instance

    if method not in ("count", "lookup"):
        raise ValueError(f"unknown probe method {method!r} — "
                         "use 'count' or 'lookup'")
    tpl = factory()
    m, k = tpl.size, tpl.hashcount
    dtype = tpl.counters.dtype
    C = max(1, math.ceil(m / int(num_shards)))
    if out_column is None:
        out_column = "count" if method == "count" else "present"
    is_count = method == "count"
    ref = ray.put({int(s): b for s, b in states.items()})

    def probe(batch: pa.Table) -> pa.Table:
        shards = cached_instance(
            ("sharded_cbloom_probe", ref.hex()),
            lambda: {s: np.frombuffer(b, dtype=dtype)
                     for s, b in ray.get(ref).items()},
        )
        h1, h2 = mmh3_128_batch(batch[column])
        pos = (make_hashes_batch(h1, h2, k) % np.uint64(m)).astype(np.int64)
        shard = pos // C
        cnts = np.zeros(pos.shape, dtype=np.int64)
        for s in np.unique(shard):
            msk = shard == s
            arr = shards.get(int(s))
            if arr is not None:
                cnts[msk] = arr[pos[msk] - int(s) * C].astype(np.int64)
        mn = cnts.min(axis=0)
        out = mn if is_count else mn > 0
        return batch.append_column(out_column, pa.array(out))

    return ds.map_batches(probe, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def plan_filter_build(
    n_rows: int,
    template: "Sketch",
    *,
    batch_size: int = 65536,
) -> str:
    """Cost-model chooser between the two exact build paths:

    * ``monolithic`` (per-batch partial states + tree merge): shuffle
      volume ≈ ceil(n/batch_size) × state_bytes — wins while the
      structure is small relative to the corpus (the bench regime).
    * ``sharded`` (position rows + per-shard reducers): volume ≈
      n × k × 9 bytes — independent of m; the only viable path once
      n_batches × m outgrows it (m ~ 1 TB at 10^12 keys).

    Both produce bit-identical structures (pytest-proved), so the
    planner is free to pick purely on exchange volume."""
    state_bytes = len(template.to_bytes())
    n_batches = max(1, math.ceil(max(n_rows, 1) / batch_size))
    monolithic_traffic = n_batches * state_bytes
    sharded_traffic = max(n_rows, 1) * template.hashcount * 9
    return "monolithic" if monolithic_traffic <= sharded_traffic else "sharded"


def build_filter_auto(
    ds: "ray.data.Dataset",
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    batch_size: int = 65536,
    num_shards: int | None = None,
    n_rows: int | None = None,
) -> tuple["Sketch", str]:
    """Size-adaptive EXACT filter build (Bloom / counting Bloom):
    probe the row count, run :func:`plan_filter_build`, and execute the
    winning path.  Returns ``(sketch, plan)`` so callers/tests can
    assert the chosen strategy.  The sharded path sizes ``num_shards``
    so one reducer owns ≲64 MB of structure unless overridden.

    The assembled result is returned either way (bit-identical by
    construction); at true 10^12-key scale callers should keep the
    sharded states distributed instead — use
    :func:`build_sharded_bloom_states` + :func:`sharded_bloom_probe`
    directly when m itself cannot fit one machine."""
    from ..sketches.bloom import BloomFilter
    from ..sketches.cbloom import CountingBloomFilter

    tpl = factory()
    if not isinstance(tpl, (BloomFilter, CountingBloomFilter)):
        raise TypeError(
            f"build_filter_auto supports Bloom/CountingBloom; got "
            f"{type(tpl).__name__} (use build_sketch or the dedicated "
            "sharded builders)")
    n = ds.count() if n_rows is None else int(n_rows)
    plan = plan_filter_build(n, tpl, batch_size=batch_size)
    if plan == "monolithic":
        return build_sketch(ds, column, factory, batch_size=batch_size), plan
    if num_shards is None:
        num_shards = max(8, math.ceil(len(tpl.to_bytes()) / (64 << 20)))
    if isinstance(tpl, CountingBloomFilter):
        states = build_sharded_cbloom_states(
            ds, column, factory, num_shards=num_shards,
            batch_size=batch_size)
        return assemble_sharded_cbloom(states, factory,
                                       num_shards=num_shards), plan
    states = build_sharded_bloom_states(
        ds, column, factory, num_shards=num_shards,
        batch_size=batch_size)
    return assemble_sharded_bloom(states, factory,
                                  num_shards=num_shards), plan


def merge_sharded_states(
    a: dict[int, bytes],
    b: dict[int, bytes],
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
) -> dict[int, bytes]:
    """Merge two sharded state maps built with the SAME factory/shard
    count — the incremental-ingest step for the scale path (yesterday's
    shards ∪ today's increment, no rebuild): Bloom shards OR, cbloom
    counter shards saturating-add, tdbloom slot shards max, tdcbloom
    counter+timer shards add/max.  Shard-local and embarrassingly
    parallel; runs driver-side here because each shard slice is small —
    at true scale map the same kernel over a Dataset of shard ids."""
    from ..sketches.bloom import BloomFilter
    from ..sketches.cbloom import CountingBloomFilter
    from ..sketches.tdbloom import TimeDecayingBloomFilter
    from ..sketches.tdcbloom import TimeDecayingCountingBloomFilter

    tpl = factory()
    out: dict[int, bytes] = {}
    for s in sorted(set(a) | set(b)):
        if s not in a:
            out[s] = b[s]
            continue
        if s not in b:
            out[s] = a[s]
            continue
        if isinstance(tpl, BloomFilter):
            x = np.frombuffer(a[s], dtype=np.uint8)
            y = np.frombuffer(b[s], dtype=np.uint8)
            out[s] = (x | y).tobytes()
        elif isinstance(tpl, TimeDecayingCountingBloomFilter):
            cw = tpl.counters.dtype.itemsize
            n = len(a[s]) // (cw + tpl.timers.dtype.itemsize)
            xc = np.frombuffer(a[s], dtype=tpl.counters.dtype, count=n)
            yc = np.frombuffer(b[s], dtype=tpl.counters.dtype, count=n)
            xt = np.frombuffer(a[s], dtype=tpl.timers.dtype, offset=n * cw)
            yt = np.frombuffer(b[s], dtype=tpl.timers.dtype, offset=n * cw)
            if tpl.counters.dtype == np.uint64:
                sc = xc + yc
                sc = np.where(sc < xc, np.uint64(tpl._cmax), sc)
            else:
                sc = np.minimum(xc.astype(np.int64) + yc.astype(np.int64),
                                tpl._cmax).astype(tpl.counters.dtype)
            out[s] = sc.tobytes() + np.maximum(xt, yt).tobytes()
        elif isinstance(tpl, TimeDecayingBloomFilter):
            x = np.frombuffer(a[s], dtype=tpl.filter.dtype)
            y = np.frombuffer(b[s], dtype=tpl.filter.dtype)
            out[s] = np.maximum(x, y).tobytes()
        elif isinstance(tpl, CountingBloomFilter):
            x = np.frombuffer(a[s], dtype=tpl.counters.dtype)
            y = np.frombuffer(b[s], dtype=tpl.counters.dtype)
            if tpl.counters.dtype == np.uint64:
                sm = x + y
                sm = np.where(sm < x, np.uint64(tpl._max), sm)
            else:
                sm = np.minimum(x.astype(np.int64) + y.astype(np.int64),
                                tpl._max).astype(tpl.counters.dtype)
            out[s] = sm.tobytes()
        else:
            raise TypeError(f"no sharded merge rule for {type(tpl).__name__}")
    return out


def build_sharded_tdbloom_states(
    ds: "ray.data.Dataset",
    key_column: str,
    secs_column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    batch_size: int = 65536,
) -> dict[int, bytes]:
    """Sharded TIME-DECAYING Bloom build → ``{shard: slot-slice bytes}``.

    Same shard→reduce shape as the sharded Bloom/cbloom paths: the scan
    emits per-batch pre-aggregated ``(shard, pos, tick)`` rows (max tick
    per position within the batch — slot writes are a position-wise MAX,
    associative and commutative, so any max-merge order equals the
    sequential slot-max build bit-for-bit), reducers take the global max
    per position and own one contiguous slot range.  Shuffle volume is
    ≤ k×~20 bytes per row — independent of slot-array size m, which for
    a tdbloom is m×slot_width bytes (2-byte slots at 10^12 keys ≈ 2 TB;
    the per-batch-partial path is untenable there).

    ``secs_column`` must be an int64 event-time seconds column (the
    caller derives it from its timestamp column; timestamp→seconds cast
    rules live with the data, not here).  ``factory`` must pin an
    explicit ``start_time`` epoch, like :func:`build_event_time_sketch`.
    """
    from ..hashing import make_hashes_batch, mmh3_128_batch

    tpl = factory()
    m, k = tpl.size, tpl.hashcount
    max_time, start = tpl.max_time, tpl.start_time
    dtype = tpl.filter.dtype
    C = max(1, math.ceil(m / int(num_shards)))
    pos_dtype = np.int32 if m < (1 << 31) else np.int64
    tick_dtype = np.int32 if max_time < (1 << 31) else np.int64

    def hash_batch(batch: pa.Table) -> pa.Table:
        h1, h2 = mmh3_128_batch(batch[key_column])
        pos = (make_hashes_batch(h1, h2, k) % np.uint64(m)).astype(np.int64)
        secs = np.asarray(batch[secs_column], dtype=np.int64)
        tick = (secs - start) % max_time + 1  # 1-based wrapped tick
        flat_pos = pos.ravel()
        flat_tick = np.broadcast_to(tick, pos.shape).ravel()
        # per-batch pre-agg: max tick per position (sort + reduceat)
        order = np.argsort(flat_pos, kind="stable")
        p_sorted = flat_pos[order]
        t_sorted = flat_tick[order]
        starts = np.flatnonzero(
            np.concatenate(([True], p_sorted[1:] != p_sorted[:-1])))
        uniq = p_sorted[starts]
        tmax = np.maximum.reduceat(t_sorted, starts)
        return _pack_lists((uniq // C).astype(np.int32),
                           {"pos": uniq.astype(pos_dtype),
                            "tick": tmax.astype(tick_dtype)})

    def build_shard(g: pa.Table) -> pa.Table:
        shard = g["shard"][0].as_py()
        p = _unpack_list(g["pos"]) - shard * C
        t = _unpack_list(g["tick"])
        order = np.argsort(p, kind="stable")  # ufunc.at is slow; sort+
        ps, ts_ = p[order], t[order]          # reduceat is the fast max
        starts = np.flatnonzero(
            np.concatenate(([True], ps[1:] != ps[:-1])))
        buf = np.zeros(min(C, m - shard * C), dtype=dtype)
        buf[ps[starts]] = np.maximum.reduceat(ts_, starts).astype(dtype)
        return pa.table({
            "shard": pa.array([shard], type=pa.int32()),
            "state": pa.array([buf.tobytes()], type=pa.large_binary()),
        })

    states = (
        ds.map_batches(hash_batch, batch_format="pyarrow",
                       batch_size=batch_size, zero_copy_batch=True)
        .groupby("shard")
        .map_groups(build_shard, batch_format="pyarrow")
    )
    return {r["shard"]: r["state"] for r in states.take_all()}


def assemble_sharded_tdbloom(
    states: dict[int, bytes],
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
) -> "Sketch":
    """Concatenate slot shards into ONE TimeDecayingBloomFilter —
    bit-for-bit equal to :func:`build_event_time_sketch` (driver-side,
    O(m); only for filters that fit one machine)."""
    sk = factory()
    C = max(1, math.ceil(sk.size / int(num_shards)))
    for s, b in states.items():
        arr = np.frombuffer(b, dtype=sk.filter.dtype)
        sk.filter[s * C: s * C + arr.size] = arr
    return sk


def build_sharded_tdcbloom_states(
    ds: "ray.data.Dataset",
    key_column: str,
    secs_column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    batch_size: int = 65536,
) -> dict[int, bytes]:
    """Sharded TIME-DECAYING COUNTING Bloom build → ``{shard: bytes}``
    where each shard's payload is its counter slice followed by its
    timer slice.  Position-wise decomposition is exact: counters are
    +1-increment saturating sums (any clamping order = min(cap, total))
    and timers are maxes of width-truncated ticks (commutative), which
    is precisely the engine's tdcbloom merge rule.  The scan emits one
    pre-aggregated (shard, pos, cnt, tick) row per touched position per
    batch — independent of the counters+timers state size.

    ``secs_column``: int64 event-time seconds (see the tdbloom variant).
    """
    from ..hashing import make_hashes_batch, mmh3_128_batch

    tpl = factory()
    m, k = tpl.size, tpl.hashcount
    cmax = tpl._cmax
    cdtype, tdtype = tpl.counters.dtype, tpl.timers.dtype
    C = max(1, math.ceil(m / int(num_shards)))
    pos_dtype = np.int32 if m < (1 << 31) else np.int64
    tick_dtype = np.int32 if tdtype.itemsize <= 4 else np.int64

    def hash_batch(batch: pa.Table) -> pa.Table:
        h1, h2 = mmh3_128_batch(batch[key_column])
        pos = (make_hashes_batch(h1, h2, k) % np.uint64(m)).astype(np.int64)
        secs = np.asarray(batch[secs_column], dtype=np.int64)
        # the C cast to the timer width (set_timestamp) happens BEFORE
        # the slot max in update_arrow — replicate, then widen for Arrow
        tick = secs.astype(tdtype).astype(np.int64)
        flat_pos = pos.ravel()
        flat_tick = np.broadcast_to(tick, pos.shape).ravel()
        order = np.argsort(flat_pos, kind="stable")
        p_sorted = flat_pos[order]
        t_sorted = flat_tick[order]
        starts = np.flatnonzero(
            np.concatenate(([True], p_sorted[1:] != p_sorted[:-1])))
        uniq = p_sorted[starts]
        cnt = np.diff(np.append(starts, p_sorted.size))
        tmax = np.maximum.reduceat(t_sorted, starts)
        return _pack_lists((uniq // C).astype(np.int32),
                           {"pos": uniq.astype(pos_dtype),
                            "cnt": cnt.astype(np.int32),
                            "tick": tmax.astype(tick_dtype)})

    def build_shard(g: pa.Table) -> pa.Table:
        shard = g["shard"][0].as_py()
        p = _unpack_list(g["pos"]) - shard * C
        c = _unpack_list(g["cnt"])
        t = _unpack_list(g["tick"])
        order = np.argsort(p, kind="stable")
        ps, cs, ts_ = p[order], c[order], t[order]
        starts2 = np.flatnonzero(
            np.concatenate(([True], ps[1:] != ps[:-1])))
        sums = np.add.reduceat(cs, starts2)
        tmx = np.maximum.reduceat(ts_, starts2)
        pu = ps[starts2]
        n_slots = min(C, m - shard * C)
        cbuf = np.zeros(n_slots, dtype=cdtype)
        if cdtype == np.uint64:
            cbuf[pu] = sums.astype(np.uint64)
        else:
            cbuf[pu] = np.minimum(sums, cmax).astype(cdtype)
        tbuf = np.zeros(n_slots, dtype=tdtype)
        tbuf[pu] = tmx.astype(tdtype)
        return pa.table({
            "shard": pa.array([shard], type=pa.int32()),
            "state": pa.array([cbuf.tobytes() + tbuf.tobytes()],
                              type=pa.large_binary()),
        })

    states = (
        ds.map_batches(hash_batch, batch_format="pyarrow",
                       batch_size=batch_size, zero_copy_batch=True)
        .groupby("shard")
        .map_groups(build_shard, batch_format="pyarrow")
    )
    return {r["shard"]: r["state"] for r in states.take_all()}


def assemble_sharded_tdcbloom(
    states: dict[int, bytes],
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
) -> "Sketch":
    """Concatenate counter+timer shards into ONE tdcbloom — bit-for-bit
    equal to the event-time build (driver-side, O(m))."""
    sk = factory()
    C = max(1, math.ceil(sk.size / int(num_shards)))
    cw = sk.counters.dtype.itemsize
    for s, b in states.items():
        n_slots = min(C, sk.size - s * C)
        carr = np.frombuffer(b, dtype=sk.counters.dtype, count=n_slots)
        tarr = np.frombuffer(b, dtype=sk.timers.dtype,
                             offset=n_slots * cw)
        sk.counters[s * C: s * C + n_slots] = carr
        sk.timers[s * C: s * C + n_slots] = tarr
    return sk


def assemble_sharded_cbloom(
    states: dict[int, bytes],
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
) -> "Sketch":
    """Concatenate counter shards into ONE CountingBloomFilter —
    bit-for-bit equal to the monolithic build (driver-side, O(m))."""
    sk = factory()
    C = max(1, math.ceil(sk.size / int(num_shards)))
    for s, b in states.items():
        arr = np.frombuffer(b, dtype=sk.counters.dtype)
        sk.counters[s * C: s * C + arr.size] = arr
    return sk

# ---------------------------------------------------------------------------
# Sharded scalable-Bloom build — the unknown-n scale path.
#
# The position-sharded builds above need m up front; a scalable Bloom
# (sketches/sbf.py) exists precisely because nobody can declare m.  So
# the shard function moves from bit positions to KEYS: shard =
# h1 % num_shards routes each key's 128-bit pair to one reducer, every
# reducer grows its OWN stage chain over its key range, and probes
# route by the same pure function — shuffle volume is 16 bytes/key,
# independent of whatever the chains grow to.  There is no assembly
# step and none is needed: the shard map IS the filter (lookup = route
# + per-shard chain OR), exactly how a 10^12-key deployment would keep
# it — each shard's chain living on its owning node.
# ---------------------------------------------------------------------------


def build_sharded_sbf_states(
    ds: "ray.data.Dataset",
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    batch_size: int = 65536,
) -> dict[int, bytes]:
    """Key-hash-sharded ScalableBloomFilter build → ``{shard: bytes}``.

    Deterministic: reducers sort the (h1, h2) pairs before the single
    ``update_hashes`` call, so the stage fill order — and therefore the
    serialized bytes — do not depend on shuffle arrival order.

    Routing is ``fmix64(h1) % num_shards`` — NOT raw ``h1 % S``: the
    stage position hashes also consume h1, so conditioning members and
    probes of a shard on a raw residue class correlates their position
    distributions (7× measured FPR inflation at S=8); the bijective
    finalizer mix breaks the congruence."""
    from ..hashing import fmix64_batch, mmh3_128_batch

    S = int(num_shards)

    def hash_batch(batch: pa.Table) -> pa.Table:
        h1, h2 = mmh3_128_batch(batch[column])
        # per-batch dedup on the pair (the reducer dedups again; this
        # just trims shuffle bytes)
        pairs = np.unique(np.stack([h1, h2]), axis=1)
        h1, h2 = pairs[0], pairs[1]
        shard = (fmix64_batch(h1) % np.uint64(S)).astype(np.int32)
        order = np.argsort(shard, kind="stable")
        shard = shard[order]
        return _pack_lists(shard, {"h1": h1[order], "h2": h2[order]})

    parts = ds.map_batches(hash_batch, batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True)

    def build_shard(g: pa.Table) -> pa.Table:
        shard = g["shard"][0].as_py()
        h1 = _unpack_uint64_list(g["h1"])
        h2 = _unpack_uint64_list(g["h2"])
        order = np.lexsort((h2, h1))
        sk = factory()
        sk.update_hashes(h1[order], h2[order])
        return pa.table({
            "shard": pa.array([shard], type=pa.int32()),
            "state": pa.array([sk.to_bytes()], type=pa.large_binary()),
        })

    states = parts.groupby("shard").map_groups(
        build_shard, batch_format="pyarrow")
    return {r["shard"]: r["state"] for r in states.take_all()}


def _unpack_uint64_list(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr.flatten(), dtype=np.uint64)


def sharded_sbf_probe(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    *,
    num_shards: int = 32,
    out_column: str = "present",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Probe the sharded chains WITHOUT assembling them: broadcast the
    shard map once, route each probe key by ``h1 % num_shards``, and OR
    across the owning shard's stages.  An absent shard saw no keys ⇒
    not present.

    Because every key consults exactly ONE shard's chain, the compound
    false-positive bound stays the single-writer ``p0/(1−r)`` — unlike
    stage-concatenation merge, whose union bound ADDS across partials.
    Sharding is therefore both the traffic fix and the tighter-error
    fix for distributed scalable-Bloom builds."""
    from ..proc_cache import cached_instance
    from ..hashing import fmix64_batch, mmh3_128_batch
    from ..sketches.base import sketch_from_bytes

    S = int(num_shards)
    ref = ray.put({int(s): b for s, b in states.items()})

    def probe(batch: pa.Table) -> pa.Table:
        shards = cached_instance(
            ("sharded_sbf_probe", ref.hex()),
            lambda: {s: sketch_from_bytes(b)
                     for s, b in ray.get(ref).items()},
        )
        h1, h2 = mmh3_128_batch(batch[column])
        shard = (fmix64_batch(h1) % np.uint64(S)).astype(np.int64)
        present = np.zeros(h1.size, dtype=bool)
        for s in np.unique(shard):
            msk = shard == s
            sk = shards.get(int(s))
            if sk is not None:
                present[msk] = sk._lookup_hashes(h1[msk], h2[msk])
        return batch.append_column(out_column, pa.array(present))

    return ds.map_batches(probe, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Sharded cuckoo build — distributed DELETABLE membership.
#
# Cuckoo filters are not shuffle-mergeable (kick chains are order-
# dependent and two full filters can exceed joint capacity — reference
# cuckoo.c merge TODO; sketches/cuckoo.py documents the best-effort
# re-insert).  Key-hash sharding sidesteps merge entirely: the filter
# only ever consumes mmh3_32(key), so the scan ships 4-byte hashes
# routed by fmix64(h) % S, each reducer owns an independent filter
# over its key range, and lookup/REMOVE route by the same pure
# function.  Deletion — the cuckoo family's raison d'être — therefore
# works distributed: a delete batch regroups by shard and rewrites
# only the touched shards' states.
# ---------------------------------------------------------------------------


def build_sharded_cuckoo_states(
    ds: "ray.data.Dataset",
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    batch_size: int = 65536,
) -> dict[int, bytes]:
    """Key-hash-sharded CuckooFilter build → ``{shard: bytes}``.

    ``factory`` sizes ONE shard (≈ n/num_shards keys; keep load factor
    under ~85% so kick chains terminate).  Duplicates are inserted
    like the monolithic ``update_arrow`` (reference add semantics —
    no dedup); reducers sort hashes so the serialized states are
    deterministic regardless of shuffle arrival order."""
    from ..hashing import fmix64_batch, mmh3_32_batch

    S = int(num_shards)

    def hash_batch(batch: pa.Table) -> pa.Table:
        h = mmh3_32_batch(batch[column])
        shard = (fmix64_batch(h.astype(np.uint64)) % np.uint64(S)).astype(
            np.int32)
        order = np.argsort(shard, kind="stable")
        return _pack_lists(shard[order], {"h": h[order]})

    parts = ds.map_batches(hash_batch, batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True)

    def build_shard(g: pa.Table) -> pa.Table:
        shard = g["shard"][0].as_py()
        col = g["h"].combine_chunks() if isinstance(g["h"], pa.ChunkedArray) \
            else g["h"]
        h = np.asarray(col.flatten(), dtype=np.uint32)
        sk = factory()
        sk.update_hashes32(np.sort(h))
        return pa.table({
            "shard": pa.array([shard], type=pa.int32()),
            "state": pa.array([sk.to_bytes()], type=pa.large_binary()),
        })

    states = parts.groupby("shard").map_groups(
        build_shard, batch_format="pyarrow")
    return {r["shard"]: r["state"] for r in states.take_all()}


def sharded_cuckoo_probe(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    *,
    num_shards: int = 32,
    out_column: str = "present",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Route each probe key to its owning shard's filter (broadcast
    once); an absent shard saw no keys ⇒ not present."""
    from ..proc_cache import cached_instance
    from ..hashing import fmix64_batch, mmh3_32_batch
    from ..sketches.base import sketch_from_bytes

    S = int(num_shards)
    ref = ray.put({int(s): b for s, b in states.items()})

    def probe(batch: pa.Table) -> pa.Table:
        shards = cached_instance(
            ("sharded_cuckoo_probe", ref.hex()),
            lambda: {s: sketch_from_bytes(b)
                     for s, b in ray.get(ref).items()},
        )
        h = mmh3_32_batch(batch[column])
        shard = (fmix64_batch(h.astype(np.uint64)) % np.uint64(S)).astype(
            np.int64)
        present = np.zeros(h.size, dtype=bool)
        for s in np.unique(shard):
            msk = shard == s
            sk = shards.get(int(s))
            if sk is not None:
                present[msk] = sk.lookup_hashes32(h[msk])
        return batch.append_column(out_column, pa.array(present))

    return ds.map_batches(probe, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def sharded_cuckoo_delete(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    *,
    num_shards: int = 32,
) -> dict[int, bytes]:
    """Distributed delete: group the delete keys by shard, rewrite ONLY
    the touched shards (one task each), return the updated shard map.
    Standard cuckoo deletion caveat applies (cuckoo.c:158-193): delete
    only keys that were inserted, and a removed slot clears ONE
    matching fingerprint — a same-(bucket, fp) twin key keeps the slot
    occupied for the other.  Each shard's deletes are hash-sorted, so
    the result is deterministic."""
    return _sharded_keyhash_apply(
        ds, states, column, num_shards, bits=32,
        apply_fn=lambda sk, h: sk.remove_hashes32(h),
        factory=None)


def _sharded_keyhash_apply(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    num_shards: int,
    *,
    bits: int,
    apply_fn,
    factory: Callable[[], "Sketch"] | None = None,
) -> dict[int, bytes]:
    """Shared shape for incremental ops on key-hash-sharded states:
    hash the new keys (32- or 128-bit per ``bits``), route by
    ``fmix64 % S``, group by shard, and let ``apply_fn(sketch, ...)``
    mutate ONLY the touched shards (hash-sorted for determinism).
    ``factory`` constructs a fresh sketch when a shard has no state yet
    (None ⇒ untouched-absent stays absent, e.g. delete)."""
    from ..hashing import fmix64_batch, mmh3_32_batch, mmh3_128_batch
    from ..sketches.base import sketch_from_bytes

    S = int(num_shards)
    ref = ray.put({int(s): b for s, b in states.items()})

    def hash_batch(batch: pa.Table) -> pa.Table:
        if bits == 32:
            h = mmh3_32_batch(batch[column])
            shard = (fmix64_batch(h.astype(np.uint64))
                     % np.uint64(S)).astype(np.int32)
            order = np.argsort(shard, kind="stable")
            return _pack_lists(shard[order], {"h": h[order]})
        h1, h2 = mmh3_128_batch(batch[column])
        shard = (fmix64_batch(h1) % np.uint64(S)).astype(np.int32)
        order = np.argsort(shard, kind="stable")
        return _pack_lists(shard[order], {"h1": h1[order], "h2": h2[order]})

    def apply_shard(g: pa.Table) -> pa.Table:
        shard = g["shard"][0].as_py()
        blob = ray.get(ref).get(int(shard))
        if blob is None and factory is None:
            return pa.table({"shard": pa.array([shard], type=pa.int32()),
                             "state": pa.array([None],
                                               type=pa.large_binary())})
        sk = sketch_from_bytes(blob) if blob is not None else factory()
        if bits == 32:
            h = np.sort(_unpack_uint64_list(g["h"]).astype(np.uint32))
            apply_fn(sk, h)
        else:
            h1 = _unpack_uint64_list(g["h1"])
            h2 = _unpack_uint64_list(g["h2"])
            order = np.lexsort((h2, h1))
            apply_fn(sk, h1[order], h2[order])
        return pa.table({
            "shard": pa.array([shard], type=pa.int32()),
            "state": pa.array([sk.to_bytes()], type=pa.large_binary()),
        })

    updated = ds.map_batches(hash_batch, batch_format="pyarrow",
                             zero_copy_batch=True) \
                .groupby("shard").map_groups(apply_shard,
                                             batch_format="pyarrow")
    out = dict(states)
    for r in updated.take_all():
        if r["state"] is not None:
            out[r["shard"]] = r["state"]
    return out


def sharded_sbf_ingest(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
) -> dict[int, bytes]:
    """Incremental ingest for the unknown-n path: new keys route to
    their shards and GROW the existing chains in place — the same
    stage chain keeps filling, so the single-writer p0/(1−r) bound
    holds across any number of increments (a stage-concat merge of
    separately built increments would ADD bounds instead).  Only
    touched shards are rewritten; a brand-new shard starts from
    ``factory()``."""
    return _sharded_keyhash_apply(
        ds, states, column, num_shards, bits=128,
        apply_fn=lambda sk, h1, h2: sk.update_hashes(h1, h2),
        factory=factory)


def sharded_cuckoo_ingest(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
) -> dict[int, bytes]:
    """Incremental adds into an existing sharded cuckoo map (duplicate
    inserts keep reference add semantics); only touched shards are
    rewritten."""
    return _sharded_keyhash_apply(
        ds, states, column, num_shards, bits=32,
        apply_fn=lambda sk, h: sk.update_hashes32(h),
        factory=factory)


def sharded_keyhash_probe_routed(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    *,
    kind: str,
    num_shards: int = 32,
    out_column: str = "present",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SHUFFLE-ROUTED probe for key-hash-sharded structures (``kind``
    in {"sbf", "cuckoo", "xor"}) — the true-scale counterpart of the
    broadcast probes: those ship EVERY shard's state to EVERY worker
    process (fine while Σ states fit a heap; wrong when the sharded
    structure is TBs).  Here each shard's state becomes its OWN object
    ref, probe rows shuffle to their owning shard (hash columns ride
    along so keys hash exactly once), and each reducer task holds ONE
    shard's state — per-task memory is one shard + its rows, however
    big the whole map grows.  Output rows keep all input columns plus
    ``out_column`` (row order is NOT preserved — Ray groupby semantics).

    Shard routing matches each family's build: fmix64(h1) for sbf,
    fmix64(mmh3_32) for cuckoo, top hash bits for xor
    (staticfilter._shard_of)."""
    from ..hashing import (
        fmix64_batch,
        mmh3_32_batch,
        mmh3_64_batch,
        mmh3_128_batch,
    )
    from ..proc_cache import cached_instance
    from ..sketches.base import sketch_from_bytes

    if kind not in ("sbf", "cuckoo", "xor"):
        raise ValueError(
            f"kind must be 'sbf', 'cuckoo' or 'xor', got {kind!r}")
    S = int(num_shards)
    refs = {int(s): ray.put(b) for s, b in states.items()}  # one ref EACH

    def route(batch: pa.Table) -> pa.Table:
        if kind == "cuckoo":
            h = mmh3_32_batch(batch[column])
            shard = (fmix64_batch(h.astype(np.uint64))
                     % np.uint64(S)).astype(np.int32)
            return batch.append_column("__h", pa.array(h)) \
                        .append_column("__shard", pa.array(shard))
        if kind == "xor":
            from .staticfilter import _shard_of

            h = mmh3_64_batch(batch[column]).astype(np.uint64)
            shard = _shard_of(h, S).astype(np.int32)
            return batch.append_column("__h", pa.array(h)) \
                        .append_column("__shard", pa.array(shard))
        h1, h2 = mmh3_128_batch(batch[column])
        shard = (fmix64_batch(h1) % np.uint64(S)).astype(np.int32)
        return batch.append_column("__h1", pa.array(h1)) \
                    .append_column("__h2", pa.array(h2)) \
                    .append_column("__shard", pa.array(shard))

    def lookup_group(g: pa.Table) -> pa.Table:
        shard = int(g["__shard"][0].as_py())
        ref = refs.get(shard)
        if ref is None:
            present = np.zeros(len(g), dtype=bool)
        else:
            sk = cached_instance(("routed_probe", kind, ref.hex()),
                                 lambda: sketch_from_bytes(ray.get(ref)))
            if kind == "cuckoo":
                present = sk.lookup_hashes32(
                    np.asarray(g["__h"], dtype=np.uint32))
            elif kind == "xor":
                present = sk.contains_hashes(
                    np.asarray(g["__h"], dtype=np.uint64))
            else:
                present = sk._lookup_hashes(
                    np.asarray(g["__h1"], dtype=np.uint64),
                    np.asarray(g["__h2"], dtype=np.uint64))
        drop = [c for c in g.column_names if c.startswith("__")]
        return g.drop_columns(drop).append_column(out_column,
                                                  pa.array(present))

    return ds.map_batches(route, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True) \
             .groupby("__shard").map_groups(lookup_group,
                                            batch_format="pyarrow")


def sharded_bloom_probe_routed(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    id_column: str,
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    out_column: str = "present",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SHUFFLE-ROUTED probe for the position-sharded Bloom map — the
    true-scale counterpart of :func:`sharded_bloom_probe`, which
    broadcasts the WHOLE bitmap to every worker (wrong once m is TBs).

    A key's k bit positions live in up to k different shards, so the
    probe fans out position rows: stage 1 hashes each key once and
    emits packed ``(shard, pos, id)`` rows; stage 2 reducers hold ONE
    bitmap slice each (own object ref) and count set bits per id;
    stage 3 sums per id — ``present ⇔ Σ set == k`` (an absent shard
    contributes zero set bits, correctly absent).  Returns
    ``(id_column, present)`` rows; ``id_column`` must be unique
    (callers join back by it — the row payload cannot ride a one-to-k
    fan-out)."""
    tpl = factory()
    m, k = tpl.size, tpl.hashcount
    total_bytes = (m + 7) // 8
    B = _bloom_shard_bytes(total_bytes, int(num_shards))
    refs = {int(s): ray.put(b) for s, b in states.items()}

    from ..hashing import make_hashes_batch, mmh3_128_batch
    from ..proc_cache import cached_instance

    def fanout(batch: pa.Table) -> pa.Table:
        h1, h2 = mmh3_128_batch(batch[column])
        pos = (make_hashes_batch(h1, h2, k) % np.uint64(m)).astype(np.int64)
        ids = np.asarray(batch[id_column], dtype=np.int64)
        flat_pos = pos.ravel()                       # (k, n) row-major
        flat_id = np.broadcast_to(ids, pos.shape).ravel()
        shard = ((flat_pos >> 3) // B).astype(np.int32)
        order = np.argsort(shard, kind="stable")
        return _pack_lists(shard[order], {"pos": flat_pos[order],
                                          "id": flat_id[order]})

    def count_bits(g: pa.Table) -> pa.Table:
        shard = int(g["shard"][0].as_py())
        pos = _unpack_list(g["pos"])
        ids = _unpack_list(g["id"])
        ref = refs.get(shard)
        if ref is None:
            nset = np.zeros(pos.size, dtype=np.int64)
        else:
            arr = cached_instance(
                ("bloom_routed", ref.hex()),
                lambda: np.frombuffer(ray.get(ref), dtype=np.uint8))
            local = pos - shard * B * 8
            nset = ((arr[local >> 3] >> (local & 7).astype(np.uint8)) & 1
                    ).astype(np.int64)
        t = pa.table({"id": pa.array(ids), "nset": pa.array(nset)}) \
            .group_by(["id"]).aggregate([("nset", "sum")])
        return pa.table({"id": t["id"], "nset": t["nset_sum"]})

    checked = ds.map_batches(fanout, batch_format="pyarrow",
                             batch_size=batch_size, zero_copy_batch=True) \
                .groupby("shard").map_groups(count_bits,
                                             batch_format="pyarrow")

    # high-cardinality id sum: coarse-partition grouped_agg, NOT a Ray
    # group per id (a Python call per key would kill the reducer)
    from .relational import grouped_agg

    summed = grouped_agg(checked, ["id"], [("nset_total", "nset", "sum")])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_column: batch["id"],
            out_column: pa.array(
                np.asarray(batch["nset_total"], dtype=np.int64) == k),
        })

    return summed.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Sharded quotient-filter builds — fingerprint-RANGE partitioning
# ---------------------------------------------------------------------------

def _qf_shard_width(p: int, num_shards: int) -> np.uint64:
    """Width of one shard's fingerprint range: ceil(2^p / S).  Range
    (not key-hash) sharding — a QF's fingerprints are sorted, so shard
    s owns a contiguous range and each shard state is itself a plain
    QuotientFilter over a key subspace (union of shards ≡ monolithic
    build, no special merge)."""
    return np.uint64(((1 << int(p)) + int(num_shards) - 1) // int(num_shards))


def build_sharded_qf_states(
    ds: "ray.data.Dataset",
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    batch_size: int = 65536,
    num_cpus=None,
) -> dict[int, bytes]:
    """Sharded quotient-filter build → ``{shard: QF state bytes}``.

    The scan ships ONE deduped uint64 fingerprint per key (8 B,
    independent of capacity — the sharded-traffic rule every other
    filter family here follows); reducers own disjoint fingerprint
    ranges, so a shard state is a plain ``QuotientFilter`` holding its
    range's sorted fingerprints and the union over shards is
    bit-identical to the monolithic :func:`build_sketch` result
    (pytest-proved).  Counting variant: ``counting=True`` pre-aggregates
    (fingerprint, count) per batch and the reducer sums counts."""
    return _build_sharded_qf(ds, column, factory, counting=False,
                             num_shards=num_shards, batch_size=batch_size,
                             num_cpus=num_cpus)


def build_sharded_cqf_states(
    ds: "ray.data.Dataset",
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    batch_size: int = 65536,
) -> dict[int, bytes]:
    """Sharded COUNTING quotient-filter build: the scan pre-aggregates
    each batch (value_counts → one (fingerprint, count) pair per
    distinct value) and reducers sum counts per fingerprint — the
    merged multiset is identical to a single-pass
    ``CountingQuotientFilter`` build."""
    return _build_sharded_qf(ds, column, factory, counting=True,
                             num_shards=num_shards, batch_size=batch_size)


def _build_sharded_qf(ds, column, factory, *, counting, num_shards,
                      batch_size, num_cpus=None) -> dict[int, bytes]:
    from ..hashing import mmh3_128_batch

    tpl = factory()
    q, r, p = tpl.q, tpl.r, tpl.p
    W = _qf_shard_width(p, num_shards)
    shift = np.uint64(64 - p)

    def hash_batch(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if counting:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vc = col.value_counts()
            h1, h2 = mmh3_128_batch(vc.field("values"))
            fp = (h1 ^ h2).astype(np.uint64) >> shift
            cnt = np.asarray(vc.field("counts"), dtype=np.int64)
            order = np.argsort(fp, kind="stable")
            fp, cnt = fp[order], cnt[order]
            shard = (fp // W).astype(np.int32)
            return _pack_lists(shard, {"fp": fp, "cnt": cnt})
        h1, h2 = mmh3_128_batch(col)
        fp = np.unique((h1 ^ h2).astype(np.uint64) >> shift)
        shard = (fp // W).astype(np.int32)
        return _pack_lists(shard, {"fp": fp})

    extra = {"num_cpus": num_cpus} if num_cpus else {}
    parts = ds.map_batches(hash_batch, batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True,
                           **extra)

    def build_shard(g: pa.Table) -> pa.Table:
        shard = g["shard"][0].as_py()
        fp = _unpack_uint64_list(g["fp"])
        sk = factory()
        if counting:
            sk.absorb_fps(fp, _unpack_list(g["cnt"]))
        else:
            sk.absorb_fps(fp)
        return pa.table({
            "shard": pa.array([shard], type=pa.int32()),
            "n": pa.array([int(sk.fps.size)], type=pa.int64()),
            "state": pa.array([sk.to_bytes()], type=pa.large_binary()),
        })

    rows = parts.groupby("shard").map_groups(
        build_shard, batch_format="pyarrow").take_all()
    total = sum(r["n"] for r in rows)
    if total > (1 << q):
        from ..sketches.base import SketchError
        raise SketchError(
            f"sharded QF overflow: {total} fingerprints > 2^q = {1 << q}")
    return {r["shard"]: r["state"] for r in rows}


def assemble_sharded_qf(states: dict[int, bytes],
                        factory: Callable[[], "Sketch"]) -> "Sketch":
    """Union shard states into ONE filter — identical to the monolithic
    build (disjoint sorted ranges concatenate).  Driver-side, O(n);
    tests/export only."""
    sk = factory()
    for s in sorted(states):
        sk.merge(sketch_from_bytes(states[s]))
    return sk


def sharded_qf_probe(
    ds: "ray.data.Dataset",
    states: dict[int, bytes],
    column: str,
    factory: Callable[[], "Sketch"],
    *,
    num_shards: int = 32,
    method: str = "lookup_batch",
    out_column: str = "present",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Probe the sharded filter WITHOUT assembling it: the shard map is
    broadcast once, each batch recomputes the pure fingerprint→shard
    routing and runs ``method`` (``lookup_batch`` / ``count_batch``)
    against only the touched shard states.  An absent shard holds no
    fingerprints (absent ⇒ not present / count 0)."""
    from ..hashing import mmh3_128_batch
    from ..proc_cache import cached_instance

    if method not in ("lookup_batch", "count_batch"):
        raise ValueError(f"unknown probe method {method!r} — "
                         "use 'lookup_batch' or 'count_batch'")
    tpl = factory()
    p = tpl.p
    W = _qf_shard_width(p, num_shards)
    shift = np.uint64(64 - p)
    is_count = method == "count_batch"
    ref = ray.put({int(s): b for s, b in states.items()})

    def probe(batch: pa.Table) -> pa.Table:
        shards = cached_instance(
            ("sharded_qf_probe", ref.hex()),
            lambda: {s: sketch_from_bytes(b)
                     for s, b in ray.get(ref).items()},
        )
        h1, h2 = mmh3_128_batch(batch[column])
        fp = (h1 ^ h2).astype(np.uint64) >> shift
        shard = (fp // W).astype(np.int64)
        out = np.zeros(fp.size, dtype=np.int64 if is_count else bool)
        for s in np.unique(shard):
            sk = shards.get(int(s))
            if sk is None:
                continue
            msk = shard == s
            out[msk] = (sk.count_fps(fp[msk]) if is_count
                        else sk.member_fps(fp[msk]))
        return batch.append_column(out_column, pa.array(out))

    return ds.map_batches(probe, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)
