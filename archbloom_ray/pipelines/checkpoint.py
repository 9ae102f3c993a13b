"""Per-partition checkpointing + resume for sketch builds.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics".  Generalizes the reference's save/load file
discipline (reference bloom.c:525-733) from one filter file to one
state file per input shard:

    ckpt_dir/
      manifest.jsonl          one JSON row per completed shard:
                              {shard_id, input_path, rows, state_sha256,
                               update_ms, state_bytes, engine_version}
      part-<shard_id>.state   the shard's serialized partial sketch

A resumed run reads the manifest, verifies each recorded state file
(exists + sha256 matches — a torn write fails closed and the shard is
recomputed), processes ONLY the missing shards, and merges all states.
Shard = one input file: deterministic identity (the path), so retries
and resumes are idempotent.  Writes are atomic (tmp + rename).

The shard build runs as Ray tasks over a Dataset of shard descriptors
(``map_batches`` with one descriptor per batch): shard-level
parallelism with lineage-based retry, while each task streams its file
through the sketch in row-group-sized Arrow batches (bounded memory
however large a shard is).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import time
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..sketches.base import Sketch, sketch_from_bytes

ENGINE_VERSION = 1


def _sha256(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def _shard_id(path: str) -> str:
    return hashlib.sha256(path.encode()).hexdigest()[:16]


def read_manifest(ckpt_dir: str) -> dict[str, dict]:
    path = os.path.join(ckpt_dir, "manifest.jsonl")
    done: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    row = json.loads(line)
                    done[row["shard_id"]] = row
    return done


def _verify(ckpt_dir: str, row: dict) -> bool:
    state_path = os.path.join(ckpt_dir, f"part-{row['shard_id']}.state")
    if not os.path.exists(state_path):
        return False
    with open(state_path, "rb") as f:
        return _sha256(f.read()) == row["state_sha256"]


def _build_shard(path: str, column: str, factory: Callable[[], Sketch],
                 batch_rows: int) -> tuple[bytes, dict]:
    sk = factory()
    t0 = time.monotonic()
    rows = 0
    pf = pq.ParquetFile(path)
    for batch in pf.iter_batches(batch_size=batch_rows, columns=[column]):
        sk.update_arrow(batch.column(0))
        rows += batch.num_rows
    state = sk.to_bytes()
    metrics = {
        "shard_id": _shard_id(path),
        "input_path": path,
        "rows": rows,
        "state_sha256": _sha256(state),
        "state_bytes": len(state),
        "update_ms": int((time.monotonic() - t0) * 1000),
        "engine_version": ENGINE_VERSION,
    }
    return state, metrics


def checkpointed_build(
    input_paths: list[str],
    column: str,
    factory: Callable[[], Sketch],
    ckpt_dir: str,
    *,
    batch_rows: int = 65536,
    concurrency: int | None = None,
) -> tuple[Sketch, dict]:
    """Build one sketch over many parquet shards, resumably.

    Returns ``(sketch, report)`` where report = {total_shards,
    resumed_shards, built_shards, rows, wall_ms}.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    manifest_path = os.path.join(ckpt_dir, "manifest.jsonl")
    t0 = time.monotonic()

    done = read_manifest(ckpt_dir)
    valid = {sid: row for sid, row in done.items() if _verify(ckpt_dir, row)}
    pending = [p for p in input_paths if _shard_id(p) not in valid]

    if pending:
        desc = ray.data.from_items([{"path": p} for p in pending])

        def run(batch: pa.Table) -> pa.Table:
            # each task persists its own shard state (atomic tmp+rename)
            # so only small metrics rows return to the driver — shard
            # states never funnel through one process however many
            # shards there are; the manifest append (below) stays a
            # single-writer, after-the-fact record
            out_metrics = []
            for path in batch["path"].to_pylist():
                state, metrics = _build_shard(path, column, factory, batch_rows)
                sid = metrics["shard_id"]
                state_path = os.path.join(ckpt_dir, f"part-{sid}.state")
                tmp = state_path + f".tmp-{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(state)
                os.replace(tmp, state_path)
                out_metrics.append(json.dumps(metrics))
            return pa.table({"metrics": pa.array(out_metrics, type=pa.string())})

        results = desc.map_batches(
            run, batch_format="pyarrow", batch_size=1,
            **({"concurrency": concurrency} if concurrency else {}),
        ).take_all()

        # append manifest rows (states are already durable on disk)
        with open(manifest_path, "a") as mf:
            for r in results:
                metrics = json.loads(r["metrics"])
                mf.write(json.dumps(metrics) + "\n")
                valid[metrics["shard_id"]] = metrics

    # merge all shard states (tree order irrelevant: merges associative);
    # above the fan-in bound, load + tree-merge distributed so the driver
    # only ever sees O(fanin) states
    total_rows = sum(valid[_shard_id(p)]["rows"] for p in input_paths)
    if not input_paths:
        raise ValueError("no input shards")
    if len(input_paths) > 64:
        from .build import merge_partials

        sids = ray.data.from_items([{"sid": _shard_id(p)} for p in input_paths])

        def load(batch: pa.Table) -> pa.Table:
            states = []
            for sid in batch["sid"].to_pylist():
                with open(os.path.join(ckpt_dir, f"part-{sid}.state"), "rb") as f:
                    states.append(f.read())
            return pa.table({"state": pa.array(states, type=pa.large_binary())})

        acc = merge_partials(sids.map_batches(load, batch_format="pyarrow", batch_size=8))
    else:
        acc: Sketch | None = None
        for p in input_paths:
            with open(os.path.join(ckpt_dir, f"part-{_shard_id(p)}.state"), "rb") as f:
                sk = sketch_from_bytes(f.read())
            acc = sk if acc is None else acc.merge(sk)

    report = {
        "total_shards": len(input_paths),
        "resumed_shards": len(input_paths) - len(pending),
        "built_shards": len(pending),
        "rows": total_rows,
        "wall_ms": int((time.monotonic() - t0) * 1000),
    }
    return acc, report


def partition_metrics(ckpt_dir: str) -> pa.Table:
    """The per-partition metrics table (lineage + timings) as Arrow."""
    rows = list(read_manifest(ckpt_dir).values())
    if not rows:
        return pa.table({"shard_id": pa.array([], pa.string())})
    cols = {k: [r.get(k) for r in rows] for k in rows[0]}
    return pa.table(cols)


def checkpointed_sharded_bloom(
    ds: "ray.data.Dataset",
    column: str,
    factory: Callable[[], Sketch],
    ckpt_dir: str,
    *,
    num_shards: int = 32,
    batch_size: int = 65536,
) -> tuple[dict[int, bytes], dict]:
    """Resumable SHARDED Bloom build: per-OUTPUT-shard checkpoints for
    the 10^12-key path (``build.build_sharded_bloom_states``), where a
    "partition" is a contiguous bitmap byte range rather than an input
    file.  A resumed run verifies the manifest (exists + sha256; a torn
    write fails closed), re-runs the hash scan FILTERED to the missing
    shards only (the position→shard routing is a pure function, so
    filtering at the scan is exact), rebuilds just those reducers, and
    returns the complete ``{shard: bitmap-slice}`` map.  Shards with no
    set bits are recorded explicitly as empty states so a resume can
    distinguish "done, all-zero" from "never built".

    Returns ``(states, report)`` with report = {total_shards,
    resumed_shards, built_shards, wall_ms}.
    """
    import numpy as np

    from ..hashing import make_hashes_batch, mmh3_128_batch
    from .build import _bloom_shard_bytes

    os.makedirs(ckpt_dir, exist_ok=True)
    manifest_path = os.path.join(ckpt_dir, "manifest.jsonl")
    t0 = time.monotonic()

    tpl = factory()
    m, k = tpl.size, tpl.hashcount
    total_bytes = (m + 7) // 8
    B = _bloom_shard_bytes(total_bytes, int(num_shards))
    n_shards_real = math.ceil(total_bytes / B)

    done = read_manifest(ckpt_dir)
    valid = {row["shard_id"]: row for row in done.values()
             if row.get("kind") == "bloom_shard" and _verify(ckpt_dir, row)}
    missing = sorted(s for s in range(n_shards_real)
                     if str(s) not in valid)

    if missing:
        missing_arr = np.array(missing, dtype=np.int64)

        def hash_batch(batch: pa.Table) -> pa.Table:
            from .build import _pack_lists

            h1, h2 = mmh3_128_batch(batch[column])
            pos = (make_hashes_batch(h1, h2, k) % np.uint64(m)).astype(np.int64)
            pos = np.unique(pos.ravel())
            shard = (pos >> 3) // B
            keep = np.isin(shard, missing_arr)
            # pack per-shard position lists (see build._pack_lists):
            # same bytes, ~10^4× fewer shuffle rows
            return _pack_lists(shard[keep].astype(np.int32),
                               {"pos": pos[keep]})

        def build_shard(g: pa.Table) -> pa.Table:
            from .build import _unpack_list

            shard = g["shard"][0].as_py()
            pos = _unpack_list(g["pos"])
            local = pos - shard * B * 8
            buf = np.zeros(min(B, total_bytes - shard * B), dtype=np.uint8)
            np.bitwise_or.at(buf, local >> 3,
                             np.uint8(1) << (local & 7).astype(np.uint8))
            state = buf.tobytes()
            # task-side durable write (atomic); only metrics return
            state_path = os.path.join(ckpt_dir, f"part-{shard}.state")
            tmp = state_path + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(state)
            os.replace(tmp, state_path)
            return pa.table({"metrics": pa.array([json.dumps({
                "shard_id": str(shard), "kind": "bloom_shard",
                "n_positions": int(pos.size),
                "state_sha256": _sha256(state),
                "state_bytes": len(state),
                "engine_version": ENGINE_VERSION,
            })], type=pa.string())})

        results = (
            ds.map_batches(hash_batch, batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True)
            .groupby("shard")
            .map_groups(build_shard, batch_format="pyarrow")
        ).take_all()
        built_rows = [json.loads(r["metrics"]) for r in results]
        built_ids = {row["shard_id"] for row in built_rows}
        # shards that produced no positions at all: durable empty states
        for s in missing:
            if str(s) not in built_ids:
                state = np.zeros(min(B, total_bytes - s * B),
                                 dtype=np.uint8).tobytes()
                state_path = os.path.join(ckpt_dir, f"part-{s}.state")
                tmp = state_path + f".tmp-{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(state)
                os.replace(tmp, state_path)
                built_rows.append({
                    "shard_id": str(s), "kind": "bloom_shard",
                    "n_positions": 0, "state_sha256": _sha256(state),
                    "state_bytes": len(state),
                    "engine_version": ENGINE_VERSION,
                })
        with open(manifest_path, "a") as mf:
            for row in built_rows:
                mf.write(json.dumps(row) + "\n")
                valid[row["shard_id"]] = row

    states: dict[int, bytes] = {}
    for s in range(n_shards_real):
        with open(os.path.join(ckpt_dir, f"part-{s}.state"), "rb") as f:
            states[s] = f.read()
    report = {
        "total_shards": n_shards_real,
        "resumed_shards": n_shards_real - len(missing),
        "built_shards": len(missing),
        "wall_ms": int((time.monotonic() - t0) * 1000),
    }
    return states, report
