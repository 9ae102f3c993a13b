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


def read_jsonl_gz(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Gzip-compressed newline-delimited JSON — the wire format of
    Common-Crawl-style corpus dumps (``*.jsonl.gz``/``.wet.gz``
    siblings).  Decompression streams through Arrow's gzip codec per
    file; FILES are the parallel unit (gzip members aren't splittable),
    which matches how such corpora actually shard: thousands of ~GB
    members."""
    ds = ray.data.read_json(
        path,
        arrow_open_stream_args={"compression": "gzip"},
        file_extensions=["gz"],
    )
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_lines_gz(path: str, column: str = "text") -> "ray.data.Dataset":
    """Gzip-compressed line text (one row per line), same ingest
    semantics as :func:`read_lines`; per-file gzip streams."""
    ds = ray.data.read_text(
        path,
        arrow_open_stream_args={"compression": "gzip"},
        file_extensions=["gz"],
    )
    if column != "text":
        ds = ds.rename_columns({"text": column})
    return ds


_CODEC_EXT = {"gzip": ["gz"], "bz2": ["bz2"], "zstd": ["zst", "zstd"]}


def read_jsonl_compressed(
    path: str, codec: str, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Newline-delimited JSON behind any Arrow stream codec this build
    ships (``gzip``/``bz2``/``zstd`` — zstd is the wire format of
    RedPajama/Dolma-style corpus releases, ``*.jsonl.zst``).  Files are
    the parallel unit: these codecs' single-member streams aren't
    splittable, which matches how such corpora shard (thousands of ~GB
    members)."""
    import pyarrow as pa

    if not pa.Codec.is_available(codec):
        raise ValueError(f"codec {codec!r} not available in this Arrow build")
    ds = ray.data.read_json(
        path,
        arrow_open_stream_args={"compression": codec},
        file_extensions=_CODEC_EXT.get(codec),
    )
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_lines_compressed(
    path: str, codec: str, column: str = "text"
) -> "ray.data.Dataset":
    """Compressed line text (one row per line) for the same codec set
    as :func:`read_jsonl_compressed`."""
    import pyarrow as pa

    if not pa.Codec.is_available(codec):
        raise ValueError(f"codec {codec!r} not available in this Arrow build")
    ds = ray.data.read_text(
        path,
        arrow_open_stream_args={"compression": codec},
        file_extensions=_CODEC_EXT.get(codec),
    )
    if column != "text":
        ds = ds.rename_columns({"text": column})
    return ds


def read_jsonl_zst(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return read_jsonl_compressed(path, "zstd", columns)


def read_jsonl_bz2(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return read_jsonl_compressed(path, "bz2", columns)


def read_warc(
    path: str,
    *,
    include_types: tuple[str, ...] | None = ("response",),
    gzipped: bool = False,
) -> "ray.data.Dataset":
    """Minimal WARC/1.0 reader — the container Common Crawl actually
    ships (ISO 28500): one output row per record with ``warc_type``,
    ``target_uri``, ``warc_date``, ``record_id``, ``payload`` (binary).

    Shape: FILES are the parallel unit (a crawl is thousands of ~1 GB
    members, far more than the cluster's cores — per-record splitting
    buys nothing and gzip members aren't seekable anyway).  Each task
    reads one file's bytes and walks records by ``Content-Length``
    (header scan + zero-copy payload slice; the per-record Python loop
    is over KB–MB records, not rows).  ``gzipped=True`` streams
    whole-member ``.warc.gz`` through Arrow's gzip codec first.
    ``include_types=None`` keeps every record type.
    """
    kwargs = {}
    if gzipped:
        kwargs = {"arrow_open_stream_args": {"compression": "gzip"},
                  "file_extensions": ["gz"]}
    else:
        kwargs = {"file_extensions": ["warc"]}
    ds = ray.data.read_binary_files(path, **kwargs)

    def parse(batch):
        import pyarrow as pa

        types, uris, dates, ids, payloads = [], [], [], [], []
        for blob in batch["bytes"]:
            buf = memoryview(blob.as_py() if hasattr(blob, "as_py") else blob)
            pos = 0
            n = len(buf)
            while pos < n:
                # skip inter-record CRLFs
                while pos < n and buf[pos:pos + 2] == b"\r\n":
                    pos += 2
                if pos >= n:
                    break
                hdr_end = bytes(buf[pos:min(n, pos + 65536)]).find(b"\r\n\r\n")
                if hdr_end < 0:
                    break
                header = bytes(buf[pos:pos + hdr_end]).decode("utf-8", "replace")
                lines = header.split("\r\n")
                if not lines[0].startswith("WARC/"):
                    raise ValueError(
                        f"not a WARC record at byte {pos}: {lines[0][:40]!r}")
                fields = {}
                for ln in lines[1:]:
                    k, _, v = ln.partition(":")
                    fields[k.strip().lower()] = v.strip()
                length = int(fields.get("content-length", "0"))
                body_start = pos + hdr_end + 4
                body = bytes(buf[body_start:body_start + length])
                pos = body_start + length
                rtype = fields.get("warc-type", "")
                if include_types is None or rtype in include_types:
                    types.append(rtype)
                    uris.append(fields.get("warc-target-uri"))
                    dates.append(fields.get("warc-date"))
                    ids.append(fields.get("warc-record-id"))
                    payloads.append(body)
        return pa.table({
            "warc_type": pa.array(types, type=pa.string()),
            "target_uri": pa.array(uris, type=pa.string()),
            "warc_date": pa.array(dates, type=pa.string()),
            "record_id": pa.array(ids, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        })

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)


def union_harmonized(dss: list["ray.data.Dataset"]) -> "ray.data.Dataset":
    """Union datasets whose schemas drifted apart — the heterogeneous-
    shard ingest a years-long crawl produces (old shards miss columns
    added later; a column that was int32 in 2021 is int64 in 2024).

    Align-by-NAME semantics (DuckDB ``UNION ALL BY NAME``): the target
    schema is ``pyarrow.unify_schemas(..., permissive)`` over every
    input — missing columns null-fill, numeric widths promote
    (int32+int64 → int64, int+float → float64).  Each branch is fitted
    by ONE zero-copy-in map_batches (a cast is the only copy, and only
    on branches that need one), so harmonisation adds no extra pass
    over branches already on the target schema — then a plain
    streaming union (no shuffle, no repartition; Ray unions block
    lists lazily).

    The alternative — make every producer rewrite old shards — is a
    100-TB rewrite; fitting at read time costs one cast on the narrow
    columns only.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if not dss:
        raise ValueError("union_harmonized needs at least one dataset")
    schemas = []
    for d in dss:
        s = d.schema()
        schemas.append(pa.schema(list(zip(s.names, s.types))))
    target = pa.unify_schemas(schemas, promote_options="permissive")

    def fit_fn(src: pa.Schema):
        need = src != target

        def fit(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {}
            for f in target:
                if f.name in batch.column_names:
                    col = batch[f.name]
                    cols[f.name] = (pc.cast(col, f.type)
                                    if col.type != f.type else col)
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            return pa.table(cols)

        return fit if need else None

    fitted = []
    for d, s in zip(dss, schemas):
        fn = fit_fn(s)
        fitted.append(d.map_batches(fn, batch_format="pyarrow",
                                    zero_copy_batch=True) if fn else d)
    out = fitted[0]
    return out.union(*fitted[1:]) if len(fitted) > 1 else out


def parquet_ts_max_us(path: str, column: str) -> int:
    """Max of a timestamp[us] column in µs since epoch: parquet FOOTER
    statistics when present (no data pages read), else ONE pruned
    distributed scan — the shared end-of-ingest helper for the
    event-time queries, so no call site needs its own None-guard or
    its own copy of the scalar-cast idiom."""
    import pyarrow as pa
    import pyarrow.compute as pc

    b = parquet_column_bounds(path, column)
    if b is not None:
        return pa.scalar(b[1], pa.timestamp("us")).cast(pa.int64()).as_py()

    def part(batch: pa.Table) -> pa.Table:
        m = pc.max(pc.cast(batch[column].combine_chunks(),
                           pa.int64())).as_py()
        return pa.table({"m": pa.array([m], pa.int64())})

    rows = ray.data.read_parquet(path, columns=[column]).map_batches(
        part, batch_format="pyarrow", zero_copy_batch=True).take_all()
    return max(r["m"] for r in rows)


def parquet_column_bounds(path: str, column: str):
    """(min, max) of a column across a parquet file or directory, from
    footer ROW-GROUP STATISTICS only — no data pages are read.  The
    metadata analogue of prune-at-the-read: the bounds of a 10^12-row
    corpus cost one footer per file.  Returns ``None`` when the column
    is absent or any non-empty row group lacks min/max stats (callers
    fall back to a scan — see bench.py's event-time stage)."""
    import glob
    import os

    import pyarrow.parquet as pq

    if "://" in path:
        # remote scheme: footers aren't glob-able locally — None sends
        # the caller to the Ray-side pruned-scan fallback, which DOES
        # handle remote URIs (multi-node audit, README inventory)
        return None
    files = (sorted(glob.glob(os.path.join(path, "*.parquet")))
             if os.path.isdir(path) else [path])
    if not files:
        return None
    lo = hi = None
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        if column not in names:
            return None
        ci = names.index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                if st is not None and st.num_values == st.null_count:
                    continue  # all-null row group constrains nothing
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)
