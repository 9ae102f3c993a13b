"""Resumable partitioned Parquet output.

The output discipline the 100 TB story requires (SURVEY.md §4): results
land as a DIRECTORY of Parquet — partitioned by key columns and/or by
input shard — never one giant file, with per-unit completion markers so
a failed run resumes by skipping finished units.

Two shapes:

* :func:`write_partitioned` — one logical dataset written once,
  hive-partitioned by key columns (``ds.write_parquet(partition_cols=…)``)
  with a ``_SUCCESS`` marker written only after the write completes.
* :func:`resumable_shard_map` — per-INPUT-shard transform→write: each
  input file maps to ``out_dir/<shard>/`` with its own marker, shards
  with a marker are skipped on re-run, and each shard's write happens
  inside the Ray task that produced it (nothing funnels through the
  driver).  This is the transform analogue of
  ``checkpoint.checkpointed_build``.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

_MARKER = "_SUCCESS"


def write_partitioned(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    partition_cols: list[str] | None = None,
    overwrite: bool = False,
) -> str:
    """Write ``ds`` as (optionally hive-partitioned) Parquet with an
    atomic-enough completion contract: the ``_SUCCESS`` marker appears
    only after every file is written, and an existing complete output is
    returned untouched (idempotent re-runs)."""
    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        if not overwrite:
            return out_dir
        shutil.rmtree(out_dir)
    elif os.path.isdir(out_dir) and os.listdir(out_dir):
        shutil.rmtree(out_dir)  # incomplete previous attempt
    kwargs = {"partition_cols": partition_cols} if partition_cols else {}
    ds.write_parquet(out_dir, **kwargs)
    with open(marker, "w"):
        pass
    return out_dir


def resumable_shard_map(
    input_paths: list[str],
    transform: Callable[[pa.Table], pa.Table],
    out_dir: str,
    *,
    columns: list[str] | None = None,
    batch_rows: int = 65536,
    row_group_size: int = 8192,
) -> dict:
    """Map ``transform`` over each input Parquet shard, writing one
    output directory per shard with a completion marker; shards whose
    marker exists are skipped.  Returns {total, skipped, written}.

    Each Ray task streams its shard in ``batch_rows`` batches through
    ``transform`` into a single writer (bounded memory however large the
    shard), writes to a tmp dir, then renames + marks — a crash mid-shard
    leaves no marker and the shard is redone.
    """
    os.makedirs(out_dir, exist_ok=True)

    def _shard_out(path: str) -> str:
        stem = os.path.splitext(os.path.basename(path))[0]
        return os.path.join(out_dir, stem)

    pending = [p for p in input_paths
               if not os.path.exists(os.path.join(_shard_out(p), _MARKER))]

    if pending:
        desc = ray.data.from_items([{"path": p} for p in pending])

        def run(batch: pa.Table) -> pa.Table:
            done = []
            for path in batch["path"].to_pylist():
                dest = _shard_out(path)
                tmp = dest + f".tmp-{os.getpid()}"
                if os.path.isdir(tmp):
                    shutil.rmtree(tmp)
                os.makedirs(tmp)
                writer = None
                pf = pq.ParquetFile(path)
                try:
                    for rb in pf.iter_batches(batch_size=batch_rows, columns=columns):
                        out = transform(pa.Table.from_batches([rb]))
                        if writer is None:
                            writer = pq.ParquetWriter(
                                os.path.join(tmp, "part-0.parquet"), out.schema,
                                compression="zstd")
                        writer.write_table(out, row_group_size=row_group_size)
                finally:
                    if writer is not None:
                        writer.close()
                if os.path.isdir(dest):
                    shutil.rmtree(dest)
                os.replace(tmp, dest)
                with open(os.path.join(dest, _MARKER), "w"):
                    pass
                done.append(path)
            return pa.table({"path": pa.array(done, type=pa.string())})

        desc.map_batches(run, batch_format="pyarrow", batch_size=1).take_all()

    return {
        "total": len(input_paths),
        "skipped": len(input_paths) - len(pending),
        "written": len(pending),
    }


def _store_pkey(keys_np, num_partitions: int):
    import numpy as np

    k = keys_np.astype(np.uint64)
    with np.errstate(over="ignore"):
        return ((k * np.uint64(0x9E3779B97F4A7C15))
                % np.uint64(num_partitions)).astype(np.int64)


def write_keyed_store(
    ds: "ray.data.Dataset",
    store_dir: str,
    key_column: str,
    *,
    num_partitions: int = 32,
) -> None:
    """Write a keyed table as a hash-partitioned parquet store
    (``bucket=N/`` directories): every row of one key lands in exactly
    one partition, so point updates and merges touch one directory.
    The same resumable per-partition layout as every other store in
    this engine."""
    import numpy as np

    def tag(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64)
        return batch.append_column("bucket",
                                   pa.array(_store_pkey(k, num_partitions)))

    ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True
                   ).write_parquet(store_dir, partition_cols=["bucket"])


def merge_upsert(
    store_dir: str,
    updates_ds: "ray.data.Dataset",
    out_dir: str,
    key_column: str,
    *,
    num_partitions: int = 32,
) -> int:
    """Copy-on-write upsert into a :func:`write_keyed_store` store:
    last-writer-wins by key (updates override base; new keys insert).
    Returns the number of REWRITTEN partitions.

    Scale shape: the updates' key hashes decide the affected partition
    set (≤ ``num_partitions`` scalars on the driver — not data); ONLY
    those partitions are read back, merged per partition with one
    lexsort + segment-head pick (updates sort first), and rewritten
    under ``out_dir``.  Untouched partitions are carried over as file
    copies — a metadata-only rename/hard-link on a real object store,
    so the write cost is proportional to the UPDATE volume, not the
    store size."""
    import numpy as np

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = np.asarray(batch[key_column], dtype=np.int64)
            t = batch.append_column(
                "bucket", pa.array(_store_pkey(k, num_partitions)))
            return t.append_column(
                "_side", pa.array(np.full(len(batch), side, dtype=np.int8)))
        return fn

    tagged_updates = updates_ds.map_batches(
        tag(1), batch_format="pyarrow", zero_copy_batch=True)
    affected = sorted({r["bucket"] for r in
                       tagged_updates.groupby("bucket").count().take_all()})

    os.makedirs(out_dir, exist_ok=True)
    copied = 0
    for name in sorted(os.listdir(store_dir)):
        src = os.path.join(store_dir, name)
        if not (name.startswith("bucket=") and os.path.isdir(src)):
            continue
        pk = int(name.split("=", 1)[1])
        if pk not in affected:
            # COW carry-over: on an object store this is a rename/link
            shutil.copytree(src, os.path.join(out_dir, name))
            copied += 1

    files = []
    for pk in affected:
        d = os.path.join(store_dir, f"bucket={pk}")
        if os.path.isdir(d):
            files += [os.path.join(d, f) for f in sorted(os.listdir(d))
                      if f.endswith(".parquet")]

    def resolve(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return group.drop_columns(["_side"])
        keys = np.asarray(group[key_column], dtype=np.int64)
        side = np.asarray(group["_side"], dtype=np.int8)
        order = np.lexsort((-side.astype(np.int64), keys))  # updates first
        first = np.ones(n, dtype=bool)
        ks = keys[order]
        first[1:] = ks[1:] != ks[:-1]
        return group.take(pa.array(order[first])).drop_columns(["_side"])

    base_cols = updates_ds.schema().names
    merged_src = tagged_updates
    if files:
        # hive partition col lives in the path, not the file — retag
        base = ray.data.read_parquet(files, columns=base_cols).map_batches(
            tag(0), batch_format="pyarrow", zero_copy_batch=True)
        merged_src = tagged_updates.union(base)

    (merged_src.groupby("bucket")
     .map_groups(resolve, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["bucket"]))
    return len(affected)


# ---------------------------------------------------------------------------
# clustered write + zone-map skip reads
# ---------------------------------------------------------------------------

def write_clustered(
    ds: "ray.data.Dataset",
    out_dir: str,
    cluster_col: str,
    *,
    num_shards: int = 16,
    sample_per_block: int = 256,
    overwrite: bool = False,
) -> str:
    """Clustered Parquet write with ZONE MAPS — the data layout that
    makes range predicates prune at the read (the Delta/Iceberg
    min-max-skipping discipline, Ray-Data-shaped).

    Rows range-partition on deterministic stride-sampled boundaries of
    ``cluster_col`` (the ``global_prefix_sum`` partitioner pattern: one
    cheap sampling pass, boundaries broadcast in the task closure, ONE
    keyed exchange); each shard writes its own Parquet file inside the
    Ray task that holds it, and a ``_zonemap.json`` manifest records
    per-shard ``(min, max, rows)``.  :func:`read_clustered` then reads
    ONLY the shards whose range intersects the predicate — at 100 TB a
    narrow range touches a handful of files instead of the corpus.
    ``_SUCCESS`` appears after manifest + all shards are complete
    (idempotent re-runs return the existing output untouched).
    """
    import base64
    import json

    import numpy as np
    import pyarrow.compute as pc

    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        if not overwrite:
            return out_dir
        shutil.rmtree(out_dir)
    elif os.path.isdir(out_dir) and os.listdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def sample(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[cluster_col], dtype=np.int64)
        if v.size == 0:
            return pa.table({"v": pa.array([], pa.int64())})
        stride = max(1, len(v) // sample_per_block)
        return pa.table({"v": pa.array(np.sort(v)[::stride])})

    samples = np.array(
        [r["v"] for r in ds.map_batches(
            sample, batch_format="pyarrow", zero_copy_batch=True).take_all()],
        dtype=np.int64)
    if samples.size:
        qs = np.linspace(0, 1, num_shards + 1)[1:-1]
        bounds = np.unique(np.quantile(np.sort(samples), qs,
                                       method="lower").astype(np.int64))
    else:
        bounds = np.empty(0, np.int64)

    def bucketize(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[cluster_col], dtype=np.int64)
        return batch.append_column(
            "_shard", pa.array(np.searchsorted(bounds, v, side="right")
                               .astype(np.int32)))

    def write_shard(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"shard": pa.array([], pa.int32()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        sid = int(group["_shard"][0].as_py())
        body = group.drop_columns(["_shard"])
        v = body[cluster_col]
        tmp = os.path.join(out_dir, f".shard-{sid:05d}.parquet.tmp")
        dst = os.path.join(out_dir, f"shard-{sid:05d}.parquet")
        pq.write_table(body, tmp)
        os.replace(tmp, dst)
        return pa.table({
            "shard": pa.array([sid], pa.int32()),
            "lo": pa.array([pc.min(v).as_py()], pa.int64()),
            "hi": pa.array([pc.max(v).as_py()], pa.int64()),
            "rows": pa.array([len(body)], pa.int64()),
        })

    manifest_rows = (ds.map_batches(bucketize, batch_format="pyarrow",
                                    zero_copy_batch=True)
                     .groupby("_shard")
                     .map_groups(write_shard, batch_format="pyarrow")
                     .take_all())
    sch = getattr(ds.schema(), "base_schema", None) or pa.schema(
        [(n, t) for n, t in zip(ds.schema().names, ds.schema().types)])
    manifest = {
        "cluster_col": cluster_col,
        # schema travels in the manifest so empty layouts / fully
        # pruned reads can still return a typed empty Dataset
        "schema_b64": base64.b64encode(sch.serialize().to_pybytes())
                            .decode("ascii"),
        "shards": sorted(
            ({"shard": int(r["shard"]), "lo": int(r["lo"]),
              "hi": int(r["hi"]), "rows": int(r["rows"])}
             for r in manifest_rows), key=lambda s: s["shard"]),
    }
    with open(os.path.join(out_dir, "_zonemap.json"), "w") as f:
        json.dump(manifest, f)
    with open(marker, "w"):
        pass
    return out_dir


def read_clustered(
    path: str,
    lo: int | None = None,
    hi: int | None = None,
    *,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Zone-map skip read of a :func:`write_clustered` layout: open ONLY
    the shards whose ``[min, max]`` intersects ``[lo, hi]`` (both ends
    inclusive; None = unbounded).  The prune is a manifest lookup — no
    shard I/O for skipped ranges; callers still apply the exact residual
    predicate (zone maps admit, they don't certify)."""
    import json

    import ray.data as rd

    with open(os.path.join(path, "_zonemap.json")) as f:
        manifest = json.load(f)
    files = [
        os.path.join(path, f"shard-{s['shard']:05d}.parquet")
        for s in manifest["shards"]
        if (lo is None or s["hi"] >= lo) and (hi is None or s["lo"] <= hi)
    ]
    if not files:
        # empty selection (fully pruned, or the layout itself is empty):
        # rebuild a typed empty Dataset from the manifest schema
        import base64

        sch = pa.ipc.read_schema(pa.py_buffer(
            base64.b64decode(manifest["schema_b64"])))
        if columns:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table())
    return rd.read_parquet(files, columns=columns)


def compact_clustered(
    path: str,
    *,
    min_rows: int = 4096,
) -> int:
    """Compact a :func:`write_clustered` layout: ADJACENT shards are
    greedily coalesced until each output shard holds >= ``min_rows``
    rows (except possibly the last), preserving cluster order and the
    zone-map contract (each merged shard's lo/hi is the min/max of its
    inputs, ranges stay non-decreasing).  The small-files problem is
    the classic failure mode of incremental clustered ingest; periodic
    compaction keeps the manifest short and reads coarse.

    Runs as Ray tasks (one per output shard — merge groups are
    independent); the manifest and marker rewrite atomically LAST, so
    a crash mid-compaction leaves the old manifest pointing at the old
    (still present) shards and the operation simply re-runs.  Returns
    the number of shards after compaction.
    """
    import json

    import ray

    with open(os.path.join(path, "_zonemap.json")) as f:
        manifest = json.load(f)
    shards = manifest["shards"]
    if not shards:
        return 0
    groups: list[list[dict]] = [[]]
    acc = 0
    for s in shards:
        groups[-1].append(s)
        acc += s["rows"]
        if acc >= min_rows:
            groups.append([])
            acc = 0
    if not groups[-1]:
        groups.pop()
    if all(len(g) == 1 for g in groups):
        return len(shards)

    @ray.remote
    def merge(group: list[dict], out_name: str) -> dict:
        tables = [pq.read_table(os.path.join(path,
                                             f"shard-{s['shard']:05d}.parquet"))
                  for s in group]
        body = pa.concat_tables(tables)
        tmp = os.path.join(path, f".{out_name}.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(path, out_name))
        return {"lo": min(s["lo"] for s in group),
                "hi": max(s["hi"] for s in group),
                "rows": int(sum(s["rows"] for s in group))}

    out_entries = []
    futs = []
    for i, g in enumerate(groups):
        futs.append(merge.remote(g, f"compact-{i:05d}.parquet"))
    merged = ray.get(futs)
    for i, m in enumerate(merged):
        out_entries.append({"shard": i, **m})

    # rename compacted files into the canonical shard names, swap the
    # manifest, then drop the old shards
    old_files = [f"shard-{s['shard']:05d}.parquet" for s in shards]
    staged = {}
    for i in range(len(groups)):
        staged[f"compact-{i:05d}.parquet"] = f"shard-{i:05d}.parquet"
    # old shard names may collide with new ones: move old files aside first
    for name in old_files:
        os.replace(os.path.join(path, name),
                   os.path.join(path, name + ".old"))
    for src, dst in staged.items():
        os.replace(os.path.join(path, src), os.path.join(path, dst))
    manifest["shards"] = out_entries
    tmp = os.path.join(path, "._zonemap.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "_zonemap.json"))
    for name in old_files:
        os.remove(os.path.join(path, name + ".old"))
    return len(out_entries)


# ---------------------------------------------------------------------------
# Z-order (2-D) clustered layout
# ---------------------------------------------------------------------------

def _part1by1(v: "np.ndarray") -> "np.ndarray":
    """Spread each 16-bit value's bits into the even bit positions of a
    32-bit word (the Morton-interleave helper, classic bit-twiddling)."""
    import numpy as np

    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def zorder_key(x: "np.ndarray", y: "np.ndarray",
               x_range: tuple[int, int], y_range: tuple[int, int]) -> "np.ndarray":
    """Morton/Z-order interleave of two int columns, each rank-scaled to
    16 bits over its global ``(min, max)`` range — the locality key that
    makes BOTH dimensions prune after a 1-D range partition (the
    Delta/Iceberg Z-ORDER discipline).  The mapping only shapes the
    LAYOUT; pruning correctness rests on the per-shard raw min/max zone
    maps, so scaling truncation is harmless."""
    import numpy as np

    def scale(v, lo, hi):
        span = max(1, int(hi) - int(lo))
        return ((v.astype(np.int64) - int(lo)) * 65535 // span).clip(0, 65535)

    xs = scale(x, *x_range)
    ys = scale(y, *y_range)
    return (_part1by1(xs) | (_part1by1(ys) << np.uint64(1))).astype(np.int64)


def write_zordered(
    ds: "ray.data.Dataset",
    out_dir: str,
    col_x: str,
    col_y: str,
    *,
    num_shards: int = 16,
    sample_per_block: int = 256,
    overwrite: bool = False,
) -> str:
    """Z-order clustered Parquet write: rows sort-partition on the
    Morton interleave of ``(col_x, col_y)`` so that a range predicate
    on EITHER column (or a 2-D box on both) prunes shards at the read.
    Same machinery as :func:`write_clustered` — deterministic sampled
    boundaries on the z-key, one keyed exchange, per-shard files with
    an atomic ``_zonemap.json`` — but the manifest records the raw
    min/max of BOTH columns per shard; :func:`read_zordered` prunes on
    2-D box intersection.  One-column clustering leaves the second
    column unsorted and unprunable; Z-ordering trades a little locality
    on each axis for prunability on both."""
    import base64
    import json

    import numpy as np
    import pyarrow.compute as pc

    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        if not overwrite:
            return out_dir
        shutil.rmtree(out_dir)
    elif os.path.isdir(out_dir) and os.listdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # global ranges for the 16-bit scaling (pruned-column aggregate scan)
    stats = ds.aggregate(
        *[agg for col in (col_x, col_y) for agg in
          (ray.data.aggregate.Min(col), ray.data.aggregate.Max(col))])
    x_range = (int(stats[f"min({col_x})"]), int(stats[f"max({col_x})"]))
    y_range = (int(stats[f"min({col_y})"]), int(stats[f"max({col_y})"]))

    def sample(batch: pa.Table) -> pa.Table:
        z = zorder_key(np.asarray(batch[col_x], dtype=np.int64),
                       np.asarray(batch[col_y], dtype=np.int64),
                       x_range, y_range)
        if z.size == 0:
            return pa.table({"z": pa.array([], pa.int64())})
        stride = max(1, z.size // sample_per_block)
        return pa.table({"z": pa.array(np.sort(z)[::stride])})

    samples = np.array(
        [r["z"] for r in ds.map_batches(
            sample, batch_format="pyarrow", zero_copy_batch=True).take_all()],
        dtype=np.int64)
    if samples.size:
        qs = np.linspace(0, 1, num_shards + 1)[1:-1]
        bounds = np.unique(np.quantile(np.sort(samples), qs,
                                       method="lower").astype(np.int64))
    else:
        bounds = np.empty(0, np.int64)

    def bucketize(batch: pa.Table) -> pa.Table:
        z = zorder_key(np.asarray(batch[col_x], dtype=np.int64),
                       np.asarray(batch[col_y], dtype=np.int64),
                       x_range, y_range)
        return batch.append_column(
            "_shard", pa.array(np.searchsorted(bounds, z, side="right")
                               .astype(np.int32)))

    def write_shard(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "shard": pa.array([], pa.int32()),
            "x_lo": pa.array([], pa.int64()), "x_hi": pa.array([], pa.int64()),
            "y_lo": pa.array([], pa.int64()), "y_hi": pa.array([], pa.int64()),
            "rows": pa.array([], pa.int64())})
        if len(group) == 0:
            return empty
        sid = int(group["_shard"][0].as_py())
        body = group.drop_columns(["_shard"])
        tmp = os.path.join(out_dir, f".shard-{sid:05d}.parquet.tmp")
        dst = os.path.join(out_dir, f"shard-{sid:05d}.parquet")
        pq.write_table(body, tmp)
        os.replace(tmp, dst)
        return pa.table({
            "shard": pa.array([sid], pa.int32()),
            "x_lo": pa.array([pc.min(body[col_x]).as_py()], pa.int64()),
            "x_hi": pa.array([pc.max(body[col_x]).as_py()], pa.int64()),
            "y_lo": pa.array([pc.min(body[col_y]).as_py()], pa.int64()),
            "y_hi": pa.array([pc.max(body[col_y]).as_py()], pa.int64()),
            "rows": pa.array([len(body)], pa.int64()),
        })

    manifest_rows = (ds.map_batches(bucketize, batch_format="pyarrow",
                                    zero_copy_batch=True)
                     .groupby("_shard")
                     .map_groups(write_shard, batch_format="pyarrow")
                     .take_all())
    sch = getattr(ds.schema(), "base_schema", None) or pa.schema(
        [(n, t) for n, t in zip(ds.schema().names, ds.schema().types)])
    manifest = {
        "col_x": col_x, "col_y": col_y,
        "schema_b64": base64.b64encode(sch.serialize().to_pybytes())
                            .decode("ascii"),
        "shards": sorted(
            ({"shard": int(r["shard"]),
              "x_lo": int(r["x_lo"]), "x_hi": int(r["x_hi"]),
              "y_lo": int(r["y_lo"]), "y_hi": int(r["y_hi"]),
              "rows": int(r["rows"])}
             for r in manifest_rows), key=lambda s: s["shard"]),
    }
    with open(os.path.join(out_dir, "_zonemap.json"), "w") as f:
        json.dump(manifest, f)
    with open(marker, "w"):
        pass
    return out_dir


def read_zordered(
    path: str,
    x_lo: int | None = None,
    x_hi: int | None = None,
    y_lo: int | None = None,
    y_hi: int | None = None,
    *,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """2-D zone-map skip read of a :func:`write_zordered` layout: open
    ONLY the shards whose (x, y) bounding box intersects the query box
    (inclusive; None = unbounded on that side).  Manifest-only prune;
    callers apply the exact residual predicate."""
    import json

    import ray.data as rd

    with open(os.path.join(path, "_zonemap.json")) as f:
        manifest = json.load(f)
    files = [
        os.path.join(path, f"shard-{s['shard']:05d}.parquet")
        for s in manifest["shards"]
        if (x_lo is None or s["x_hi"] >= x_lo)
        and (x_hi is None or s["x_lo"] <= x_hi)
        and (y_lo is None or s["y_hi"] >= y_lo)
        and (y_hi is None or s["y_lo"] <= y_hi)
    ]
    if not files:
        import base64

        sch = pa.ipc.read_schema(pa.py_buffer(
            base64.b64decode(manifest["schema_b64"])))
        if columns:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table())
    return rd.read_parquet(files, columns=columns)
