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
