"""Relational building blocks — Ray-Data-first grouped aggregation.

The engine's exact-aggregation layer (used by the oracle-checked
queries and as the exact baseline for every sketch).  Shape:

    map_batches(arrow hash-aggregate within batch → tiny partials)
        → groupby(keys).map_groups(combine partials)

The in-batch pre-aggregate is the skew answer: however hot a key is,
each batch emits at most one partial row per key, so the shuffle moves
O(#keys × #batches) small rows, never the input.  All arithmetic stays
in Arrow/numpy int64/float64 so results hash-match DuckDB exactly.
"""

from __future__ import annotations

from typing import Literal

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

AggKind = Literal["count", "sum", "min", "max"]


def grouped_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: list[tuple[str, str | None, AggKind]],
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Exact grouped aggregation with in-batch pre-combine.

    ``aggs``: list of (output_name, input_column, kind); kind="count"
    ignores the input column.  Output: one row per key combination with
    the named aggregate columns.
    """
    arrow_aggs = []
    partial_cols: list[tuple[str, str, AggKind]] = []  # (partial_name, out, kind)
    for out, col, kind in aggs:
        if kind == "count":
            arrow_aggs.append(([], "count_all"))
            partial_cols.append(("count_all", out, kind))
        else:
            arrow_aggs.append((col, kind))
            partial_cols.append((f"{col}_{kind}", out, kind))

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate(arrow_aggs)
        cols = {k: g[k] for k in keys}
        seen: dict[str, int] = {}
        for pname, out, kind in partial_cols:
            # arrow suffixes duplicate agg columns; resolve by position
            idx = [i for i, n in enumerate(g.column_names) if n.startswith(pname)]
            take = seen.get(pname, 0)
            seen[pname] = take + 1
            cols[out] = g.column(idx[take])
        return pa.table(cols)

    def combine(group: pa.Table) -> pa.Table:
        cols = {k: group[k].slice(0, 1) for k in keys}
        for _, out, kind in partial_cols:
            v = group[out]
            if kind in ("count", "sum"):
                s = pc.sum(v)
            elif kind == "min":
                s = pc.min(v)
            else:
                s = pc.max(v)
            cols[out] = pa.array([s.as_py()], type=v.type)
        return pa.table(cols)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return partials.groupby(keys).map_groups(combine, batch_format="pyarrow")


def grouped_quantiles(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    qs: list[float],
    out_prefix: str = "q",
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """EXACT per-group quantiles (``quantile_cont`` semantics, including
    DuckDB's exact interpolation arithmetic ``a*(1-frac) + b*frac`` —
    bit-identical so oracle value-hashes match; numpy's ``a+(b-a)*frac``
    differs by an ULP).

    This shuffles the value column per group — exact quantiles are
    inherently a sort — so it's the oracle/baseline path; the streaming
    path at scale is the t-digest/KLL UDAF.
    """

    def quantile_cont(sorted_vals: np.ndarray, q: float) -> float:
        n = len(sorted_vals)
        h = q * (n - 1)
        lo = int(np.floor(h))
        frac = h - lo
        if frac == 0.0 or lo + 1 >= n:
            return float(sorted_vals[lo])
        return float(sorted_vals[lo] * (1 - frac) + sorted_vals[lo + 1] * frac)

    def per_group(group: pa.Table) -> pa.Table:
        vals = np.sort(np.asarray(group[value_col], dtype=np.float64))
        cols = {k: group[k].slice(0, 1) for k in keys}
        for q in qs:
            name = f"{out_prefix}{str(q).replace('.', '_')}"
            cols[name] = pa.array([quantile_cont(vals, q)], type=pa.float64())
        return pa.table(cols)

    return ds.select_columns(keys + [value_col]).groupby(keys).map_groups(
        per_group, batch_format="pyarrow"
    )


def broadcast_lookup(
    ds: "ray.data.Dataset",
    mapping_ref,
    key_column: str,
    out_column: str,
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Broadcast hash join against a small side.

    ``mapping_ref`` is a ``ray.put`` handle to a dict {key: value}; each
    actor fetches it once in ``__init__`` (zero-copy plasma read) and
    maps per batch — the no-shuffle join for dimension tables.
    """
    import ray as _ray

    class Lookup:
        def __init__(self):
            m = _ray.get(mapping_ref)
            ks = list(m.keys())
            self.keys = np.asarray(ks)
            order = np.argsort(self.keys)
            self.keys = self.keys[order]
            self.vals = np.asarray(list(m.values()), dtype=object)[order]

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = np.asarray(batch[key_column])
            idx = np.searchsorted(self.keys, k)
            idx = np.clip(idx, 0, len(self.keys) - 1)
            hit = self.keys[idx] == k
            out = np.where(hit, self.vals[idx], None)
            return batch.append_column(out_column, pa.array(out.tolist()))

    return ds.map_batches(
        Lookup,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=2,
    )


def distinct_count(ds: "ray.data.Dataset", column: str, *, batch_size: int = 65536) -> int:
    """Exact distinct count with in-batch dedup before the shuffle."""

    def dedup_batch(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch[column].combine_chunks() if isinstance(batch[column], pa.ChunkedArray) else batch[column])
        return pa.table({column: u})

    deduped = ds.map_batches(
        dedup_batch, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return len(deduped.unique(column))
