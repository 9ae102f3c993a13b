"""Source readers — every ingest format a reference user feeds the
engine, as pruned Ray Data reads.

The reference's only ingest is line-oriented text (``bloomtool`` reads
a file or stdin one element per line, ``bloomtool.c:13-18,44-52``);
:func:`read_lines` is that path, distributed.  The rest are the
standard corpus formats a Parquet-era pipeline meets, each projecting
columns AT THE READ so only requested bytes leave storage:

* ``read_table``  — parquet with ``columns=`` pushdown (the default path)
* ``read_jsonl``  — newline-delimited JSON (Arrow JSON reader per block)
* ``read_csv``    — CSV with column projection
* ``read_lines``  — raw text, one row per line (reference parity)

Writers live in ``pipelines/write.py`` (partitioned, `_SUCCESS`-marked,
resumable).
"""

from __future__ import annotations

import ray.data


def read_table(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Parquet read with column pruning — pass ``columns`` ALWAYS for
    anything narrower than the full schema; a read that decodes every
    column for a two-column transform wastes the scan."""
    return ray.data.read_parquet(path, columns=columns)


def read_jsonl(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Newline-delimited JSON.  Ray's JSON datasource parses per block
    with Arrow; projection happens right after parse (JSON has no
    columnar pushdown to give)."""
    ds = ray.data.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_csv(path: str, columns: list[str] | None = None, **arrow_csv_args) -> "ray.data.Dataset":
    """CSV via Arrow's csv reader; ``columns`` projects after parse
    (Arrow's convert_options could push it down — exposed via
    ``arrow_csv_args`` for schema-heavy inputs)."""
    ds = ray.data.read_csv(path, **arrow_csv_args)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_lines(path: str, column: str = "text") -> "ray.data.Dataset":
    """Reference-parity line ingest (``bloomtool.c:13-18``): one row
    per line, trailing newline stripped, distributed over file blocks."""
    ds = ray.data.read_text(path)
    if column != "text":
        ds = ds.rename_columns({"text": column})
    return ds
