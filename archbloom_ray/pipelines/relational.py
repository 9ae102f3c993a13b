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

import math
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

    def combine_partition(group: pa.Table) -> pa.Table:
        # high-cardinality keys must NOT each become a Ray group (a
        # Python call per group kills the reducer) — the groupby above
        # hash-buckets keys into coarse partitions and ONE vectorized
        # arrow group_by finishes every key in the partition.
        comb = [(out, "sum" if kind in ("count", "sum") else kind)
                for _, out, kind in partial_cols]
        g = group.group_by(keys).aggregate(comb)
        cols = {k: g[k] for k in keys}
        seen: dict[str, int] = {}
        for (_, out, kind), (cname, ckind) in zip(partial_cols, comb):
            pname = f"{cname}_{ckind}"
            idx = [i for i, n in enumerate(g.column_names) if n.startswith(pname)]
            take = seen.get(pname, 0)
            seen[pname] = take + 1
            cols[out] = g.column(idx[take]).cast(group[out].type)
        return pa.table(cols)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return _coarse_key_groupby(partials, keys, combine_partition)


def _coarse_key_groupby(ds: "ray.data.Dataset", keys: list[str], fn,
                        num_partitions: int = 64) -> "ray.data.Dataset":
    """Run a MULTI-KEY-vectorized reducer once per coarse key-hash
    partition instead of once per key: a Python call per key kills the
    reducer at high key cardinality (user ids, content hashes), while
    one call per partition costs O(partitions).  ``fn`` must group rows
    itself (the repo's reducers all do: one sort + segment heads); all
    rows of a key co-locate because the partition key is a pure
    function of the key columns."""
    from ..hashing import mmh3_32_batch

    def add_pk(batch: pa.Table) -> pa.Table:
        parts = [pc.cast(batch[k], pa.string()) for k in keys]
        joined = (parts[0] if len(parts) == 1
                  else pc.binary_join_element_wise(*parts, "\x1f"))
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        pk = mmh3_32_batch(joined) % np.uint32(num_partitions)
        return batch.append_column("gg_pkey", pa.array(pk.astype(np.int32)))

    return (ds.map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("gg_pkey")
            .map_groups(lambda g: fn(g.drop_columns(["gg_pkey"])),
                        batch_format="pyarrow"))


def grouped_min_k(
    ds: "ray.data.Dataset",
    keys: list[str],
    order_cols: list[str],
    k: int,
    *,
    out_rank: str = "rank",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Per-key smallest-``k`` rows by a composite ascending sort key —
    SQL ``row_number() OVER (PARTITION BY keys ORDER BY order_cols)
    <= k`` — carrying every input column through.

    Covers per-group earliest/latest-rows selection and deterministic
    per-group sampling (order by a SQL-computable multiplicative hash).

    Shape: per-block LOCAL min-k per key (any global min-k row is in
    its block's min-k, so ≤ k candidate rows per key per block reach
    the shuffle), then a tiny final per-key min-k that assigns rank.
    Raw rows never shuffle beyond the candidates.
    """

    def _mink(tbl: pa.Table, with_rank: bool) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[(c, "ascending") for c in keys + order_cols])
        t = tbl.take(idx)
        n = len(t)
        first = np.zeros(n, dtype=bool)
        if n:
            first[0] = True
        for kk in keys:
            col = np.asarray(t[kk])
            first[1:] |= col[1:] != col[:-1]
        pos = np.arange(n) - np.maximum.accumulate(
            np.where(first, np.arange(n), 0))
        keep = pos < k
        t = t.filter(pa.array(keep))
        if with_rank:
            t = t.append_column(out_rank, pa.array((pos[keep] + 1).astype(np.int64)))
        return t

    candidates = ds.map_batches(lambda b: _mink(b, False),
                                batch_format="pyarrow", batch_size=batch_size,
                                zero_copy_batch=True)
    return _coarse_key_groupby(candidates, keys, lambda g: _mink(g, True))


_ROLLUP_REAGG: dict[str, str] = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def grouped_rollup(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: list[tuple[str, str | None, AggKind]],
    *,
    all_label: str = "ALL",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL ``GROUP BY ROLLUP(keys)`` from ONE scan of the input: the
    finest level is an exact :func:`grouped_agg` (in-batch pre-combine),
    and every coarser prefix level re-aggregates the FINE table — tiny
    vs the input, so the extra levels cost no additional scans or wide
    shuffles.  Rolled-up key columns carry ``all_label`` instead of
    SQL's NULL (hash-compare-friendly; key columns must be strings).

    Aggregate kinds must be re-aggregable: count/sum roll up via sum,
    min via min, max via max (mean is not decomposable — carry sum and
    count instead and divide at the end).
    """
    for _, _, kind in aggs:
        if kind not in _ROLLUP_REAGG:
            raise ValueError(f"grouped_rollup: kind {kind!r} is not re-aggregable")

    # materialize the FINE aggregate (small: one row per key combo) so
    # the coarser levels re-aggregate it instead of re-running the
    # full input scan once per level
    fine = grouped_agg(ds, keys, aggs, batch_size=batch_size).materialize()
    reagg = [(out, out, _ROLLUP_REAGG[kind]) for out, _, kind in aggs]
    out_names = [out for out, _, _ in aggs]

    def fill_all(level_keys: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {}
            for k in keys:
                cols[k] = (batch[k] if k in level_keys
                           else pa.array([all_label] * n, type=pa.string()))
            for o in out_names:
                cols[o] = batch[o]
            return pa.table(cols)
        return fn

    levels = [fine.map_batches(fill_all(keys), batch_format="pyarrow",
                               zero_copy_batch=True)]
    for i in range(len(keys) - 1, 0, -1):
        lvl = grouped_agg(fine, keys[:i], reagg, batch_size=batch_size)
        levels.append(lvl.map_batches(fill_all(keys[:i]), batch_format="pyarrow",
                                      zero_copy_batch=True))

    # grand total: constant key so the same grouped combine applies
    def add_const(batch: pa.Table) -> pa.Table:
        return batch.append_column("_all", pa.array([all_label] * len(batch),
                                                    type=pa.string()))

    total = grouped_agg(fine.map_batches(add_const, batch_format="pyarrow",
                                         zero_copy_batch=True),
                        ["_all"], reagg, batch_size=batch_size)

    def total_fill(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {k: pa.array([all_label] * n, type=pa.string()) for k in keys}
        for o in out_names:
            cols[o] = batch[o]
        return pa.table(cols)

    levels.append(total.map_batches(total_fill, batch_format="pyarrow",
                                    zero_copy_batch=True))
    return levels[0].union(*levels[1:])


def grouped_mode(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    *,
    out_value: str = "mode",
    out_count: str = "n",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Most frequent ``value_col`` per key combination, deterministic
    (count DESC, value ASC) tie-break — SQL's
    ``row_number() OVER (PARTITION BY keys ORDER BY count(*) DESC,
    value ASC) = 1``.

    Shape: exact grouped counts (in-batch pre-combine via
    :func:`grouped_agg`, shuffle moves per-(key,value) partials) → a
    per-block LOCAL argmax (one candidate row per key per block) → a
    tiny final groupby over candidates.  The all-to-all volume is the
    distinct (key, value) table, never the raw rows; the candidate
    shuffle is one row per key per block.
    """
    counts = grouped_agg(ds, keys + [value_col], [(out_count, None, "count")],
                         batch_size=batch_size)

    def _best(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[(k, "ascending") for k in keys]
            + [(out_count, "descending"), (value_col, "ascending")])
        t = tbl.take(idx)
        # a row leads a key-run iff ANY key differs from the previous row;
        # after the sort the run leader is the (count desc, value asc) mode
        first = np.zeros(len(t), dtype=bool)
        if len(t):
            first[0] = True
        for k in keys:
            col = np.asarray(t[k])
            first[1:] |= col[1:] != col[:-1]
        out = t.filter(pa.array(first))
        cols = {k: out[k] for k in keys}
        cols[out_value] = out[value_col]
        cols[out_count] = pc.cast(out[out_count], pa.int64())
        return pa.table(cols)

    def local_best(batch: pa.Table) -> pa.Table:
        return _best(batch)

    def pick(group: pa.Table) -> pa.Table:
        t = pa.table({**{k: group[k] for k in keys},
                      value_col: group[out_value],
                      out_count: group[out_count]})
        return _best(t)

    candidates = counts.map_batches(local_best, batch_format="pyarrow",
                                    zero_copy_batch=True)
    return _coarse_key_groupby(candidates, keys, pick)


def grouped_topk(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    k: int,
    *,
    out_count: str = "n",
    out_rank: str = "rank",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Top-``k`` most frequent ``value_col`` rows per key combination
    with 1..k rank, deterministic (count DESC, value ASC) tie-break —
    SQL's ``row_number() OVER (PARTITION BY keys ORDER BY count(*)
    DESC, value ASC) <= k``.

    Same shape as :func:`grouped_mode` (its k=1 special case): exact
    grouped counts (in-batch pre-combine) → per-block LOCAL top-k
    (≤ k candidate rows per key per block — any global top-k row is in
    its block's top-k) → a tiny final per-key top-k that assigns rank.
    The all-to-all volume is the distinct (key, value) table, then
    ≤ k rows per key per block — never raw rows.
    """
    counts = grouped_agg(ds, keys + [value_col], [(out_count, None, "count")],
                         batch_size=batch_size)

    def _topk(tbl: pa.Table, with_rank: bool) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[(kk, "ascending") for kk in keys]
            + [(out_count, "descending"), (value_col, "ascending")])
        t = tbl.take(idx)
        n = len(t)
        first = np.zeros(n, dtype=bool)
        if n:
            first[0] = True
        for kk in keys:
            col = np.asarray(t[kk])
            first[1:] |= col[1:] != col[:-1]
        pos = np.arange(n) - np.maximum.accumulate(
            np.where(first, np.arange(n), 0))
        keep = pos < k
        t = t.filter(pa.array(keep))
        cols = {kk: t[kk] for kk in keys}
        cols[value_col] = t[value_col]
        cols[out_count] = pc.cast(t[out_count], pa.int64())
        if with_rank:
            cols[out_rank] = pa.array((pos[keep] + 1).astype(np.int64))
        return pa.table(cols)

    candidates = counts.map_batches(lambda b: _topk(b, False),
                                    batch_format="pyarrow", zero_copy_batch=True)
    return _coarse_key_groupby(candidates, keys, lambda g: _topk(g, True))


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


def grouped_window_rank(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    carry_cols: list[str],
    *,
    out_pct: str = "pct_rank",
    out_cume: str = "cume_dist",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL window ``PERCENT_RANK()`` / ``CUME_DIST()`` OVER
    (PARTITION BY keys ORDER BY value) — WITHOUT shuffling any rows.

    Rank depends only on per-(key, value) multiplicities, so the exact
    rank table is built from the tiny grouped-count dataset (in-batch
    pre-agg → coarse vectorized reducer), collected once (bounded by
    distinct (key, value) pairs, NOT rows), broadcast via ``ray.put``,
    and every input row picks up ``(pct_rank, cume_dist)`` with one
    searchsorted per batch-local key inside ``map_batches``.  Shuffle
    volume: O(distinct pairs); the row data itself never moves — the
    scale answer to SQL's rank-everything window sort.  Assumes bounded
    value cardinality per key (integer lengths, bucketed scores — the
    usual ranking inputs); for unbounded continuous values use
    :func:`grouped_quantiles` / t-digest instead.

    Arithmetic matches DuckDB bit-for-bit: ``pct = (rank_min−1)/(n−1)``
    (0.0 for single-row partitions) and ``cume = peers_cum/n``, both
    exact-int float64 divisions.
    """
    import ray as _ray

    from ..proc_cache import cached_instance

    counts = grouped_agg(
        ds.select_columns(keys + [value_col]),
        keys + [value_col], [("n", None, "count")], batch_size=batch_size)

    rows = counts.take_all()
    # composite string key matches the vectorized batch-side cast below
    key_of = lambda r: "\x1f".join(str(r[k]) for k in keys)  # noqa: E731
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(key_of(r), []).append((r[value_col], int(r["n"])))
    table: dict = {}
    for k, pairs in by_key.items():
        pairs.sort()
        vals = np.array([p[0] for p in pairs])
        cnts = np.array([p[1] for p in pairs], dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        rank_min = np.concatenate(([1], cum[:-1] + 1)).astype(np.float64)
        pct = (rank_min - 1.0) / (n - 1) if n > 1 else np.zeros_like(rank_min)
        cume = cum.astype(np.float64) / n
        table[k] = (vals, pct, cume)
    ref = _ray.put(table)

    def score(batch: pa.Table) -> pa.Table:
        tab = cached_instance(("window_rank", ref.hex()), lambda: _ray.get(ref))
        v = np.asarray(batch[value_col])
        pct = np.empty(len(v), dtype=np.float64)
        cume = np.empty(len(v), dtype=np.float64)
        parts = [pc.cast(batch[k], pa.string()) for k in keys]
        joined = (parts[0] if len(parts) == 1
                  else pc.binary_join_element_wise(*parts, "\x1f"))
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        karr = np.asarray(joined)
        # one pass per distinct partition key in the batch (langs /
        # sources, not ids) via unique+inverse — no per-row Python
        uniq, inv = np.unique(karr, return_inverse=True)
        for j, k in enumerate(uniq):
            mask = inv == j
            vals, p, c = tab[k]
            idx = np.searchsorted(vals, v[mask])
            pct[mask] = p[idx]
            cume[mask] = c[idx]
        cols = {c: batch[c] for c in carry_cols + keys + [value_col]}
        cols[out_pct] = pa.array(pct)
        cols[out_cume] = pa.array(cume)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def grouped_row_number(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    id_col: str,
    *,
    ntile: int = 0,
    out_rn: str = "row_number",
    out_ntile: str = "ntile",
) -> "ray.data.Dataset":
    """Per-row ``ROW_NUMBER()`` — and with ``ntile=k`` also ``NTILE(k)``
    — OVER (PARTITION BY keys ORDER BY value, id).  ``id_col`` must be
    unique: it is the ORDER BY tie-break that makes both outputs
    deterministic (SQL NTILE over a non-unique order is
    engine-arbitrary and can never hash-match).

    Scale shape: the standard per-row window plan — coarse key-hash
    partitions (one reducer call per partition, not per key), ONE
    composite lexsort per partition, then segment-offset arithmetic;
    NTILE uses the SQL allocation (first ``n % k`` buckets get
    ``n//k + 1`` rows) computed vectorized from per-segment sizes.
    Output rows = input rows; the only movement is the key-hash
    shuffle every SQL window function pays.
    """

    def reducer(group: pa.Table) -> pa.Table:
        n = len(group)
        parts = [pc.cast(group[k], pa.string()) for k in keys]
        joined = (parts[0] if len(parts) == 1
                  else pc.binary_join_element_wise(*parts, "\x1f"))
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        kcomp = np.asarray(joined)
        vals = np.asarray(group[value_col])
        ids = np.asarray(group[id_col])
        order = np.lexsort((ids, vals, kcomp))
        ks = kcomp[order]
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new_key)
        seg_id = np.cumsum(new_key) - 1
        rn0 = np.arange(n, dtype=np.int64) - starts[seg_id]
        sel = pa.array(order)
        cols = {k: group[k].combine_chunks().take(sel) for k in keys}
        cols[value_col] = group[value_col].combine_chunks().take(sel)
        cols[id_col] = group[id_col].combine_chunks().take(sel)
        cols[out_rn] = pa.array(rn0 + 1)
        if ntile > 0:
            sizes = np.diff(np.append(starts, n))[seg_id]
            q, r = sizes // ntile, sizes % ntile
            big = rn0 < r * (q + 1)
            tile = np.where(
                q == 0, rn0,
                np.where(big, rn0 // np.maximum(q + 1, 1),
                         r + (rn0 - r * (q + 1)) // np.maximum(q, 1)))
            cols[out_ntile] = pa.array(tile.astype(np.int64) + 1)
        return pa.table(cols)

    return _coarse_key_groupby(
        ds.select_columns(keys + [value_col, id_col]), keys, reducer)


def dataset_checksum(
    ds: "ray.data.Dataset",
    int_cols: list[str],
    mults: list[int],
    *,
    mod: int = (1 << 61) - 1,
    batch_size: int = 65536,
) -> tuple[int, int]:
    """Order-independent dataset checksum ``(n_rows, Σ_rows Σ_j
    col_j·mult_j  mod  m)`` — the cheap cross-engine migration check:
    equal contents give equal checksums regardless of partitioning,
    block order or engine; any dropped, duplicated or mutated row
    changes the sum (commutative, so no ordering pass is needed).

    Exact integer arithmetic end to end: per-batch int64 partial sums
    (callers pick ``mults`` so ``|row term| ≤ ~2^44`` and a 65k batch
    stays < 2^63), Python-int accumulation on the driver, one final
    reduction mod ``m``.  The SQL mirror is ``SUM(c1*m1 + c2*m2) %
    m`` — SQL engines sum in arbitrary order too, which is exactly why
    the checksum must be commutative.
    """

    def partial(batch: pa.Table) -> pa.Table:
        acc = np.zeros(len(batch), dtype=np.int64)
        for c, m in zip(int_cols, mults):
            acc += np.asarray(batch[c], dtype=np.int64) * np.int64(m)
        return pa.table({
            "s": pa.array([int(acc.sum())], type=pa.int64()),
            "n": pa.array([len(batch)], type=pa.int64()),
        })

    rows = ds.select_columns(int_cols).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True).take_all()
    total = sum(int(r["s"]) for r in rows)
    n = sum(int(r["n"]) for r in rows)
    return n, total % mod


def global_order_index(
    ds: "ray.data.Dataset",
    value_col: str,
    id_col: str,
    *,
    num_buckets: int = 64,
    sample_per_block: int = 256,
    out: str = "global_rank",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Distributed ``ROW_NUMBER() OVER (ORDER BY value, id)`` — a
    contiguous global ordinal for every row (Spark's zipWithIndex-on-
    sorted; Ray Data has none) without funneling rows to the driver.

    The standard distributed-sort plan, kept streaming:

    1. stride-sample the value column per batch (deterministic — no
       RNG) and cut ``num_buckets−1`` range boundaries on the sampled
       quantiles;
    2. a tiny pre-aggregated grouped count yields per-bucket sizes,
       prefix-summed on the driver into offsets (O(buckets) scalars)
       and broadcast;
    3. rows hash to their range bucket via one ``searchsorted``, each
       bucket orders itself with ONE lexsort in a ``map_groups``
       reducer — the single row exchange any global sort pays — and
       the ordinal is ``offset[bucket] + local index``.

    Boundaries cut only on the value (ties on a boundary value stay in
    one bucket, ordered there by the ``id_col`` tie-break), so a single
    dominant value skews its bucket — the usual range-partitioner
    caveat; sample more buckets for near-uniform values.
    """
    import ray as _ray

    from ..proc_cache import cached_instance

    def sample(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col])
        stride = max(1, len(v) // sample_per_block)
        return pa.table({"v": pa.array(np.sort(v)[::stride])})

    samp = np.sort(np.asarray(
        [r["v"] for r in ds.map_batches(
            sample, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True).take_all()]))
    cuts = (samp[np.linspace(1, len(samp) - 1, num_buckets - 1, dtype=np.int64)]
            if len(samp) > num_buckets else samp[:0])

    def bucketize(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col])
        b = np.searchsorted(cuts, v, side="right").astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    bucketed = ds.select_columns([id_col, value_col]).map_batches(
        bucketize, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True)

    sizes = grouped_agg(bucketed.select_columns(["bucket"]),
                        ["bucket"], [("n", None, "count")]).take_all()
    sizes.sort(key=lambda r: r["bucket"])
    offsets = {}
    acc = 0
    for r in sizes:
        offsets[int(r["bucket"])] = acc
        acc += int(r["n"])
    ref = _ray.put(offsets)

    def order_bucket(group: pa.Table) -> pa.Table:
        offs = cached_instance(("goi_offsets", ref.hex()), lambda: _ray.get(ref))
        v = np.asarray(group[value_col])
        ids = np.asarray(group[id_col])
        order = np.lexsort((ids, v))
        rank = np.empty(len(v), dtype=np.int64)
        rank[order] = np.arange(len(v), dtype=np.int64)
        base = offs[int(group["bucket"][0].as_py())]
        return pa.table({
            id_col: group[id_col],
            value_col: group[value_col],
            out: pa.array(rank + base + 1),
        })

    return bucketed.groupby("bucket").map_groups(
        order_bucket, batch_format="pyarrow")


def global_prefix_sum(
    ds: "ray.data.Dataset",
    value_col: str,
    id_col: str,
    *,
    num_buckets: int = 64,
    sample_per_block: int = 256,
    out: str = "prefix_sum",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Distributed EXCLUSIVE prefix sum in ``id`` order — the parallel
    scan: ``SUM(value) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``, 0 for the first row.

    The classic two-phase scan, Ray-Data-shaped: ids range-bucket on
    deterministic stride-sampled boundaries; per-bucket TOTALS come
    from a tiny pre-aggregated grouped sum and prefix-sum on the driver
    (O(buckets) scalars) into broadcast bucket bases; each bucket then
    sorts its own rows once and adds an exclusive cumsum to its base —
    one row exchange, no driver row traffic.

    This is the sequence-packing primitive: with ``value`` = per-doc
    token count, ``prefix_sum // budget`` is the contiguous
    token-offset shard each document lands in (docs never split across
    a read order, bins are byte-budget-contiguous).
    """
    import ray as _ray

    from ..proc_cache import cached_instance

    def sample(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[id_col])
        stride = max(1, len(v) // sample_per_block)
        return pa.table({"v": pa.array(np.sort(v)[::stride])})

    samp = np.sort(np.asarray(
        [r["v"] for r in ds.map_batches(
            sample, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True).take_all()]))
    cuts = (samp[np.linspace(1, len(samp) - 1, num_buckets - 1, dtype=np.int64)]
            if len(samp) > num_buckets else samp[:0])

    def bucketize(batch: pa.Table) -> pa.Table:
        i = np.asarray(batch[id_col])
        b = np.searchsorted(cuts, i, side="right").astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    bucketed = ds.select_columns([id_col, value_col]).map_batches(
        bucketize, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True)

    totals = grouped_agg(bucketed.select_columns(["bucket", value_col]),
                         ["bucket"], [("s", value_col, "sum")]).take_all()
    totals.sort(key=lambda r: r["bucket"])
    bases = {}
    acc = 0
    for r in totals:
        bases[int(r["bucket"])] = acc
        acc += int(r["s"])
    ref = _ray.put(bases)

    def scan_bucket(group: pa.Table) -> pa.Table:
        bs = cached_instance(("gps_bases", ref.hex()), lambda: _ray.get(ref))
        ids = np.asarray(group[id_col])
        v = np.asarray(group[value_col], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        excl = np.concatenate(([0], np.cumsum(v[order])[:-1]))
        pre = np.empty(len(v), dtype=np.int64)
        pre[order] = excl
        base = bs[int(group["bucket"][0].as_py())]
        return pa.table({
            id_col: group[id_col],
            value_col: group[value_col],
            out: pa.array(pre + base),
        })

    return bucketed.groupby("bucket").map_groups(
        scan_bucket, batch_format="pyarrow")


def global_prefix_max(
    ds: "ray.data.Dataset",
    value_col: str,
    id_col: str,
    *,
    num_buckets: int = 64,
    sample_per_block: int = 256,
    out: str = "prefix_max",
    batch_size: int = 65536,
    carry_columns: tuple = (),
) -> "ray.data.Dataset":
    """Distributed EXCLUSIVE prefix MAX in ``id`` order — the running
    high-water-mark scan: ``MAX(value) OVER (ORDER BY id ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``, ``-inf`` for the first row
    (the float sentinel for SQL's leading NULL; compare with an
    ``== -inf`` guard).  Same two-phase shape as
    :func:`global_prefix_sum` — max is associative, so per-bucket
    maxes prefix-combine on the driver (O(buckets) scalars) and each
    bucket runs one local exclusive ``maximum.accumulate``.

    This is the watermark / record-breaking primitive: with ``id`` =
    arrival order and ``value`` = event time, ``row.ts < out − lag``
    flags late data; with ``value`` = a measurement, ``value > out``
    flags new records.  ``carry_columns`` ride through untouched."""
    import ray as _ray

    from ..proc_cache import cached_instance

    def sample(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[id_col])
        stride = max(1, len(v) // sample_per_block)
        return pa.table({"v": pa.array(np.sort(v)[::stride])})

    samp = np.sort(np.asarray(
        [r["v"] for r in ds.map_batches(
            sample, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True).take_all()]))
    cuts = (samp[np.linspace(1, len(samp) - 1, num_buckets - 1,
                             dtype=np.int64)]
            if len(samp) > num_buckets else samp[:0])

    def bucketize(batch: pa.Table) -> pa.Table:
        i = np.asarray(batch[id_col])
        b = np.searchsorted(cuts, i, side="right").astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    bucketed = ds.select_columns(
        [id_col, value_col, *carry_columns]).map_batches(
        bucketize, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True)

    totals = grouped_agg(bucketed.select_columns(["bucket", value_col]),
                         ["bucket"], [("m", value_col, "max")]).take_all()
    totals.sort(key=lambda r: r["bucket"])
    bases = {}
    acc = float("-inf")
    for r in totals:
        bases[int(r["bucket"])] = acc
        acc = max(acc, float(r["m"]))
    ref = _ray.put(bases)

    def scan_bucket(group: pa.Table) -> pa.Table:
        bs = cached_instance(("gpm_bases", ref.hex()), lambda: _ray.get(ref))
        ids = np.asarray(group[id_col])
        v = np.asarray(group[value_col], dtype=np.float64)
        order = np.argsort(ids, kind="stable")
        excl = np.concatenate(
            ([-np.inf], np.maximum.accumulate(v[order])[:-1]))
        pre = np.empty(len(v), dtype=np.float64)
        pre[order] = excl
        base = bs[int(group["bucket"][0].as_py())]
        cols = {id_col: group[id_col], value_col: group[value_col]}
        for c in carry_columns:
            cols[c] = group[c]
        cols[out] = pa.array(np.maximum(pre, base))
        return pa.table(cols)

    return bucketed.groupby("bucket").map_groups(
        scan_bucket, batch_format="pyarrow")


def broadcast_lookup(
    ds: "ray.data.Dataset",
    mapping_ref,
    key_column: str,
    out_column: str,
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Broadcast hash join against a small side.

    ``mapping_ref`` is a ``ray.put`` handle to a dict {key: value}; tasks
    on the shared worker pool fetch + index it once per process
    (``proc_cache``) and map per batch — the no-shuffle join for
    dimension tables.
    """
    import ray as _ray

    from ..proc_cache import cached_instance

    def _build():
        m = _ray.get(mapping_ref)
        keys = np.asarray(list(m.keys()))
        order = np.argsort(keys)
        return keys[order], np.asarray(list(m.values()), dtype=object)[order]

    def lookup(batch: pa.Table) -> pa.Table:
        keys, vals = cached_instance(("bcast_lookup", mapping_ref.hex()), _build)
        k = np.asarray(batch[key_column])
        idx = np.searchsorted(keys, k)
        idx = np.clip(idx, 0, len(keys) - 1)
        hit = keys[idx] == k
        out = np.where(hit, vals[idx], None)
        return batch.append_column(out_column, pa.array(out.tolist()))

    return ds.map_batches(
        lookup,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def histogram_int(
    ds: "ray.data.Dataset",
    column: str,
    lo: int,
    hi: int,
    bins: int,
) -> "ray.data.Dataset":
    """Fixed-range integer histogram: bucket = clamp((x−lo)·bins ÷
    (hi−lo)) in PURE integer arithmetic, so the result is bit-exact
    against any SQL mirror.  One map_batches + the standard pre-agg
    grouped count — the shuffle moves ≤ ``bins`` rows per batch."""
    if hi <= lo or bins < 1:
        raise ValueError("need hi > lo and bins >= 1")

    def bucketize(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch[column], dtype=np.int64)
        b = (x - lo) * bins // (hi - lo)
        b = np.clip(b, 0, bins - 1)
        return pa.table({"bucket": pa.array(b)})

    return grouped_agg(
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True),
        ["bucket"], [("n", None, "count")])


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    *,
    how: str = "inner",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Large-large equijoin via Ray Data's hash-shuffle ``Dataset.join``
    (both sides hash-partitioned on the key across ``num_partitions``
    aggregators — the right operator when NEITHER side fits a broadcast;
    for a small dim side use :func:`broadcast_lookup`, and consider
    :func:`bloom_semijoin` to prune the big side before the shuffle).
    ``num_partitions`` defaults to 2 CPUs' worth of parallelism per
    core — at cluster scale size it to total cores, and salt or
    pre-aggregate if one key dominates (a hot key lands one partition).
    """
    import ray as _ray

    if num_partitions is None:
        num_partitions = max(8, int(_ray.cluster_resources().get("CPU", 8)))
    return left.join(
        right, join_type=how, num_partitions=num_partitions,
        on=(on,), right_on=(right_on or on,),
    )


def bloom_pruned_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    *,
    fpr: float = 1e-3,
    num_partitions: int | None = None,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Fact-fact INNER equijoin with a Bloom prune of the RIGHT side
    before the shuffle — the classic distributed "Bloom join".  The
    left side's keys build ONE merged Bloom (distributed partials +
    tree merge, reference bloom.c's filter as join infrastructure);
    every right-side task drops rows whose key cannot appear on the
    left BEFORE paying the all-to-all.  No exact re-check is needed:
    a Bloom miss has no false negatives (dropping is safe for an
    inner join) and the ε false-positive survivors are eliminated by
    the hash join itself — the result is EXACTLY
    ``hash_join(left, right)``, only cheaper to shuffle.

    Wins when the join is selective (|right ⋉ left| ≪ |right|): the
    exchange then moves ~(|left| + |match| + ε·|right|) rows instead
    of |left| + |right|.  At 10^9 left keys the broadcast Bloom is
    ~1.7 GB at fpr=1e-3 — shipped once per worker process via
    ``ray.put``; beyond that, route probes through the sharded filter
    builds (``pipelines/build.py``) instead of broadcasting.

    Inner-only by construction (pruning the probe side breaks outer
    semantics).  The left pipeline executes twice (Bloom build + join
    sides); parquet-backed lefts just re-scan their key column — a
    COMPUTED left should be ``materialize()``d by the caller first.
    An empty left short-circuits to a TYPED empty result (left columns
    + right value columns) instead of feeding ``Dataset.join`` empty
    inputs (the schema-less-empty-block crash).
    """
    rkey = right_on or on
    left_keys = left.select_columns([on]).materialize()
    if left_keys.count() == 0:
        lsch, rsch = left.schema(), right.schema()
        fields = list(zip(lsch.names, lsch.types)) + [
            (n, t) for n, t in zip(rsch.names, rsch.types) if n != rkey]
        empty = pa.table(
            {n: pa.array([], type=t) for n, t in fields})
        import ray.data as _rd

        return _rd.from_arrow(empty)
    pruned = bloom_semijoin(
        right, rkey, left_keys, on,
        fpr=fpr, exact=False, batch_size=batch_size)
    return hash_join(left, pruned, on, right_on,
                     how="inner", num_partitions=num_partitions)


def skew_salted_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    *,
    salts: int = 8,
    hot_keys: list | None = None,
    hot_frac: float = 0.002,
    mg_capacity: int = 512,
    num_partitions: int | None = None,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Skew-resilient INNER equijoin: a dominant key (lang='en'-style
    skew) melts exactly one reducer in a plain hash join; here HOT keys
    are salted ``salts`` ways on the left and REPLICATED ``salts`` ways
    on the right, then ONE ``Dataset.join`` runs on the composite
    (key, salt) — the hot key's probe rows spread over ``salts``
    reducers while every row still meets all its partners.  Result is
    EXACTLY ``hash_join(left, right)`` (pytest-proved), because any
    salt assignment is correct for a left row once the right copies
    cover every salt.

    Hot detection (when ``hot_keys`` is None) is ONE distributed
    Misra-Gries pass over the left key column; a key is hot when its
    UPPER-bound frequency (lower bound + deterministic MG error) hits
    ``hot_frac``·n — biased toward recall, since a false-positive hot
    key only costs ``salts − 1`` duplicate right rows, while a missed
    hot key re-creates the hotspot.  Int and string keys (compared
    through their canonical string form, matching MG's encoding).

    Scale shape: the exchange adds only (#hot-right-rows)·(salts−1)
    replicas — hot keys are by definition few, and the RIGHT side's
    per-key row count is expected dim-like; put the skewed/big side on
    the LEFT.  Cold rows ride salt 0 untouched.
    """
    import ray as _ray

    from ..proc_cache import cached_instance

    rkey = right_on or on
    if hot_keys is None:
        from ..sketches.mg import MisraGries
        from .build import build_sketch

        mg = build_sketch(left.select_columns([on]), on,
                          lambda: MisraGries(mg_capacity),
                          batch_size=batch_size)
        eb = mg.error_bound()
        hot_keys = [k.decode("utf-8", "replace")
                    for k, c in mg.candidates()
                    if c + eb >= hot_frac * max(mg.n, 1)]
    hot_ref = _ray.put(sorted(str(k) for k in hot_keys))

    def _hot_set():
        return pa.array(_ray.get(hot_ref), type=pa.string())

    def _is_hot(batch: pa.Table, key: str) -> np.ndarray:
        hot = cached_instance(("salted_join_hot", hot_ref.hex()), _hot_set)
        if len(hot) == 0:
            return np.zeros(len(batch), dtype=bool)
        ks = pc.cast(batch[key].combine_chunks(), pa.string())
        return np.asarray(pc.is_in(ks, value_set=hot))

    def salt_left(batch: pa.Table) -> pa.Table:
        salt = np.zeros(len(batch), dtype=np.int64)
        idx = np.flatnonzero(_is_hot(batch, on))
        salt[idx] = np.arange(idx.size, dtype=np.int64) % salts
        return batch.append_column("__salt", pa.array(salt))

    def salt_right(batch: pa.Table) -> pa.Table:
        ish = _is_hot(batch, rkey)
        cold = batch.filter(pa.array(~ish))
        parts = [cold.append_column(
            "__salt", pa.array(np.zeros(len(cold), dtype=np.int64)))]
        if ish.any():
            hotb = batch.filter(pa.array(ish))
            parts += [hotb.append_column(
                "__salt", pa.array(np.full(len(hotb), s, dtype=np.int64)))
                for s in range(salts)]
        return pa.concat_tables(parts)

    l2 = left.map_batches(salt_left, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)
    r2 = right.map_batches(salt_right, batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True)
    if num_partitions is None:
        num_partitions = max(8, int(_ray.cluster_resources().get("CPU", 8)))
    out = l2.join(r2, join_type="inner", num_partitions=num_partitions,
                  on=(on, "__salt"), right_on=(rkey, "__salt"))

    # drop the salt inside map_batches: empty join blocks pass through
    # un-run (the schema-less-empty-block gotcha), non-empty ones lose
    # the helper column
    def _drop(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["__salt"])

    return out.map_batches(_drop, batch_format="pyarrow",
                           zero_copy_batch=True)


def adaptive_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    value_columns: list[str] | None = None,
    *,
    broadcast_limit_rows: int = 500_000,
) -> tuple["ray.data.Dataset", str]:
    """Size-adaptive INNER equijoin — the tiny planner every pipeline
    ends up writing by hand: probe the right side's row count; if it
    fits ``broadcast_limit_rows`` ship it ONCE via ``ray.put`` and join
    with a per-batch sorted-array lookup (no shuffle at all), else fall
    back to the hash-partitioned shuffle join (:func:`hash_join`).
    Returns ``(dataset, strategy)`` with strategy ``"broadcast"``,
    ``"shuffle"`` or ``"empty"`` so callers/tests can assert the plan.

    The count probe is metadata-cheap on parquet-backed inputs and a
    small pipeline execution otherwise — cheap relative to a mis-chosen
    all-to-all.  Broadcast output column order: left columns then
    ``value_columns``; rows without a match are dropped (inner), and
    duplicate right keys expand one-to-many exactly like the shuffle
    path (searchsorted left/right bounds).
    """
    import ray as _ray

    rkey = right_on or on
    rschema = right.schema()  # ray.data.Schema: parallel names/types lists
    if value_columns is None:
        value_columns = [c for c in rschema.names if c != rkey]
    rtypes = dict(zip(rschema.names, rschema.types))
    vtypes = {c: rtypes[c] for c in value_columns}
    # materialize once: the count probe EXECUTES a computed right side,
    # and an unmaterialized Dataset would re-execute the whole right
    # pipeline again in take_all/hash_join — one buffering (spillable)
    # beats running the prep scan twice at every call site
    right = right.materialize()
    n_right = right.count()

    if n_right == 0:
        # Ray's hash join chokes on schema-less empty partitions (see
        # CLAUDE.md join→join gotcha) — build the typed empty result
        # directly: zero left rows + explicitly-typed empty value cols.
        def empty_out(batch: pa.Table) -> pa.Table:
            out = batch.slice(0, 0)
            for c in value_columns:
                out = out.append_column(c, pa.array([], type=vtypes[c]))
            return out

        return left.map_batches(empty_out, batch_format="pyarrow",
                                zero_copy_batch=True), "empty"

    if n_right > broadcast_limit_rows:
        joined = hash_join(left, right, on, rkey)
        joined = joined.select_columns(
            [c for c in left.schema().names] + value_columns)
        return joined, "shuffle"

    rows = right.take_all()
    keys = np.asarray([r[rkey] for r in rows])
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    vals = {c: np.asarray([r[c] for r in rows], dtype=object)[order]
            for c in value_columns}
    ref = _ray.put((keys, vals))

    from ..proc_cache import cached_instance

    def lookup(batch: pa.Table) -> pa.Table:
        ks, vs = cached_instance(("adaptive_join", ref.hex()),
                                 lambda: _ray.get(ref))
        k = np.asarray(batch[on])
        # one-to-many: every right row whose key equals k[i] produces an
        # output row (bounds via two searchsorteds, same as SQL inner)
        lo = np.searchsorted(ks, k, side="left")
        hi = np.searchsorted(ks, k, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            out = batch.slice(0, 0)
            for c in value_columns:
                out = out.append_column(c, pa.array([], type=vtypes[c]))
            return out
        sel = np.repeat(np.arange(len(k)), cnt)
        starts = np.repeat(lo, cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        ridx = starts + offs
        out = batch.take(pa.array(sel))
        for c in value_columns:
            out = out.append_column(
                c, pa.array(vs[c][ridx].tolist(), type=vtypes[c]))
        return out

    return left.map_batches(lookup, batch_format="pyarrow",
                            zero_copy_batch=True), "broadcast"


def bloom_semijoin(
    fact: "ray.data.Dataset",
    fact_key: str,
    dim: "ray.data.Dataset",
    dim_key: str,
    *,
    fpr: float = 1e-4,
    exact: bool = True,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Semijoin ``fact ⋉ dim`` via a broadcast Bloom filter — the
    sketch-accelerated join-pruning pattern: the dim side's keys build
    one merged Bloom (distributed partials + tree merge, O(m) state),
    ``ray.put`` once, and every fact task drops non-matching rows
    BEFORE any shuffle.  With ``exact=True`` the (small) dim keyset is
    also broadcast and survivors are re-checked exactly, so the result
    has no Bloom false positives — the Bloom's job is to make the
    exact check's probe set tiny.  At 100 TB the Bloom (a few MB for
    10^8 keys at 1e-4) is the only state every worker holds; if the
    dim keyset itself outgrows broadcast, keep ``exact=False`` and
    shuffle-join only the pruned survivors (ε·|fact| rows).

    Keys are hashed as strings (reference mmh3 is byte-oriented);
    integer keys are cast on both sides, exactness is unaffected.
    """
    import ray as _ray

    from ..proc_cache import cached_instance
    from ..sketches.bloom import BloomFilter
    from .build import build_sketch

    def keys_as_str(batch: pa.Table) -> pa.Table:
        return pa.table({"k": pc.cast(batch[dim_key], pa.string())})

    # materialize the (narrow) key column once: counting an
    # unmaterialized dim would execute its pipeline, then the Bloom
    # build and the exact-keyset pass would each re-execute it
    dim_keys = dim.map_batches(keys_as_str, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    n_real = dim_keys.count()
    if n_real == 0:  # nothing can match — empty result, same schema
        return fact.map_batches(lambda b: b.slice(0, 0),
                                batch_format="pyarrow", zero_copy_batch=True)
    n_dim = max(n_real, 10)
    bloom = build_sketch(dim_keys, "k", lambda: BloomFilter(n_dim, fpr))
    bloom_ref = _ray.put(bloom.to_bytes())
    exact_ref = None
    if exact:
        keyset = np.sort(np.concatenate(
            [np.asarray(b["k"]) for b in
             dim_keys.iter_batches(batch_format="pyarrow", batch_size=batch_size)]
            or [np.empty(0, dtype=object)]))
        exact_ref = _ray.put(keyset)

    def _load():
        from ..sketches.base import sketch_from_bytes

        bf = sketch_from_bytes(_ray.get(bloom_ref))
        ks = _ray.get(exact_ref) if exact_ref is not None else None
        return bf, ks

    def prune(batch: pa.Table) -> pa.Table:
        bf, ks = cached_instance(("bloom_semijoin", bloom_ref.hex()), _load)
        keys = pc.cast(batch[fact_key], pa.string())
        mask = bf.lookup_batch(keys)
        batch = batch.filter(pa.array(mask))
        if ks is not None and len(batch):
            k = np.asarray(pc.cast(batch[fact_key], pa.string()))
            idx = np.searchsorted(ks, k)
            idx = np.clip(idx, 0, max(len(ks) - 1, 0))
            hit = ks[idx] == k if len(ks) else np.zeros(len(k), dtype=bool)
            batch = batch.filter(pa.array(hit))
        return batch

    return fact.map_batches(prune, batch_format="pyarrow",
                            batch_size=batch_size, zero_copy_batch=True)


def bloom_antijoin(
    fact: "ray.data.Dataset",
    fact_key: str,
    dim: "ray.data.Dataset",
    dim_key: str,
    *,
    fpr: float = 1e-4,
    exact: bool = True,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Anti-join ``fact ▷ dim`` (rows of ``fact`` whose key does NOT
    appear in ``dim``) via the same broadcast-Bloom pattern as
    :func:`bloom_semijoin`, with the roles of the two outcomes flipped:
    a Bloom MISS is definitive (no false negatives ⇒ the key is
    certainly absent from dim ⇒ keep the row with no further work),
    and only the Bloom-POSITIVE sliver — true members plus ε false
    positives — needs the exact re-check to rescue false positives.
    At 100 TB this means the exact keyset probe touches ~|match|+ε·|fact|
    rows, not |fact|.  With ``exact=False`` the result is conservative:
    the ε false-positive rows are wrongly dropped (an under-approximate
    anti-join, never a wrong-row-kept one) — acceptable for pruning
    passes, not for exact answers.
    """
    import ray as _ray

    from ..proc_cache import cached_instance
    from ..sketches.bloom import BloomFilter
    from .build import build_sketch

    def keys_as_str(batch: pa.Table) -> pa.Table:
        return pa.table({"k": pc.cast(batch[dim_key], pa.string())})

    # materialize the (narrow) key column once: counting an
    # unmaterialized dim would execute its pipeline, then the Bloom
    # build and the exact-keyset pass would each re-execute it
    dim_keys = dim.map_batches(keys_as_str, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    n_real = dim_keys.count()
    if n_real == 0:  # nothing to exclude — fact passes through
        return fact
    n_dim = max(n_real, 10)
    bloom = build_sketch(dim_keys, "k", lambda: BloomFilter(n_dim, fpr))
    bloom_ref = _ray.put(bloom.to_bytes())
    exact_ref = None
    if exact:
        keyset = np.sort(np.concatenate(
            [np.asarray(b["k"]) for b in
             dim_keys.iter_batches(batch_format="pyarrow", batch_size=batch_size)]
            or [np.empty(0, dtype=object)]))
        exact_ref = _ray.put(keyset)

    def _load():
        from ..sketches.base import sketch_from_bytes

        bf = sketch_from_bytes(_ray.get(bloom_ref))
        ks = _ray.get(exact_ref) if exact_ref is not None else None
        return bf, ks

    def prune(batch: pa.Table) -> pa.Table:
        bf, ks = cached_instance(("bloom_antijoin", bloom_ref.hex()), _load)
        keys = pc.cast(batch[fact_key], pa.string())
        maybe = bf.lookup_batch(keys)  # False ⇒ certainly absent ⇒ keep
        keep = ~maybe
        if ks is not None and maybe.any():
            k = np.asarray(keys)[maybe]
            idx = np.searchsorted(ks, k)
            idx = np.clip(idx, 0, max(len(ks) - 1, 0))
            member = ks[idx] == k if len(ks) else np.zeros(len(k), dtype=bool)
            keep[np.flatnonzero(maybe)[~member]] = True  # rescue Bloom FPs
        return batch.filter(pa.array(keep))

    return fact.map_batches(prune, batch_format="pyarrow",
                            batch_size=batch_size, zero_copy_batch=True)


def exact_quantiles(
    ds: "ray.data.Dataset", value_col: str, qs: list[float]
) -> list[float]:
    """Ungrouped EXACT ``quantile_cont`` values (DuckDB interpolation
    arithmetic — see :func:`grouped_quantiles`).  Implemented as a
    single-group grouped_quantiles: the oracle/baseline path (a sketch
    answers this streaming at scale)."""

    def add_const(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_g": pa.array(np.zeros(len(batch), dtype=np.int32)),
            value_col: batch[value_col],
        })

    one = ds.map_batches(add_const, batch_format="pyarrow", zero_copy_batch=True)
    row = grouped_quantiles(one, ["_g"], value_col, qs).take_all()[0]
    return [row[f"q{str(q).replace('.', '_')}"] for q in qs]


def quantiles_by_selection(
    ds: "ray.data.Dataset",
    value_col: str,
    qs: list[float],
    *,
    buckets: int = 4096,
    max_passes: int = 64,
    decode=float,
) -> list[float]:
    """Exact ungrouped ``quantile_cont`` over an INTEGER column with NO
    global sort and NO single-group funnel: iterative histogram
    range-narrowing (classic distributed selection).  Each pass is one
    scan of the column emitting per-batch ``np.bincount`` partials that
    a grouped sum folds into a ≤ ``len(ranges)·buckets``-row histogram;
    the value range holding each target rank then shrinks ~``buckets``×
    per pass, so any 32-bit integer domain resolves in ≤2 passes at the
    default 4096 (64-bit in ≤6).  Contrast the two existing exact
    paths: a sort is an all-to-all of the full column, and
    :func:`exact_quantiles` funnels every value into one group (fine as
    an oracle, a funnel at 100 TB) — selection moves only O(buckets)
    counts per pass.  All target ranks share each scan (adjacent ranks
    collapse onto deduplicated ranges).  Interpolation is DuckDB's
    ``a*(1-frac) + b*frac`` (see :func:`grouped_quantiles`).
    """
    import ray as _ray

    # one scan: n, min, max partials
    def nmm(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col], dtype=np.int64)
        if len(v) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"n": pa.array([len(v)]),
                         "lo": pa.array([int(v.min())]),
                         "hi": pa.array([int(v.max())])})

    parts = ds.map_batches(nmm, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    n = sum(r["n"] for r in parts)
    if n == 0:
        raise ValueError("quantiles_by_selection: empty input")
    gmin = min(r["lo"] for r in parts)
    gmax = max(r["hi"] for r in parts)

    # target 0-based ranks (lo and, when frac>0, lo+1 per quantile)
    need: set[int] = set()
    plan = []  # (k_lo, frac) per q
    for q in qs:
        h = q * (n - 1)
        k = int(np.floor(h))
        frac = h - k
        plan.append((k, frac))
        need.add(k)
        if frac != 0.0 and k + 1 < n:
            need.add(k + 1)

    # state per rank: value range [lo, hi] + count of values below lo
    state = {k: (gmin, gmax, 0) for k in need}
    resolved: dict[int, int] = {}

    # per-pass shrink is only ~buckets× (ceil'd chunks shave a little
    # less), so tiny bucket counts over the full 64-bit key domain
    # legitimately need >64 passes (buckets=2 ⇒ ~66): floor the budget
    # at the domain-derived requirement instead of failing at the cap
    max_passes = max(max_passes,
                     math.ceil(64 / math.log2(max(buckets, 2))) + 3)

    for _ in range(max_passes):
        active = {k: s for k, s in state.items() if k not in resolved}
        for k, (lo, hi, below) in list(active.items()):
            if lo == hi:
                resolved[k] = lo
                del active[k]
        if not active:
            break
        # dedupe ranges (adjacent ranks usually share one)
        ranges: list[tuple[int, int, int]] = []
        rid_of: dict[tuple[int, int], int] = {}
        for lo, hi, _ in active.values():
            if (lo, hi) not in rid_of:
                chunk = -((hi - lo + 1) // -buckets)  # ceil div
                rid_of[(lo, hi)] = len(ranges)
                ranges.append((lo, hi, chunk))
        ranges_ref = _ray.put(ranges)

        def hist(batch: pa.Table) -> pa.Table:
            rgs = _ray.get(ranges_ref)
            v = np.asarray(batch[value_col], dtype=np.int64)
            rid_o, bkt_o, n_o = [], [], []
            for rid, (lo, hi, chunk) in enumerate(rgs):
                m = v[(v >= lo) & (v <= hi)]
                if len(m) == 0:
                    continue
                # wrap-safe uint64 subtraction: a full-int64-domain range
                # (float order keys) overflows (m - lo) in int64
                with np.errstate(over="ignore"):
                    diff = m.astype(np.uint64) \
                        - np.int64(lo).astype(np.uint64)
                bc = np.bincount((diff // np.uint64(chunk)).astype(np.int64))
                nz = np.flatnonzero(bc)
                rid_o.append(np.full(len(nz), rid, dtype=np.int64))
                bkt_o.append(nz.astype(np.int64))
                n_o.append(bc[nz].astype(np.int64))
            if not rid_o:
                return pa.table({"rid": pa.array([], pa.int64()),
                                 "bkt": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            return pa.table({"rid": pa.array(np.concatenate(rid_o)),
                             "bkt": pa.array(np.concatenate(bkt_o)),
                             "n": pa.array(np.concatenate(n_o))})

        rows = grouped_agg(
            ds.map_batches(hist, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["rid", "bkt"], [("n", "n", "sum")]).take_all()
        by_rid: dict[int, list] = {}
        for r in rows:
            by_rid.setdefault(r["rid"], []).append((r["bkt"], r["n"]))
        for k, (lo, hi, below) in active.items():
            rid = rid_of[(lo, hi)]
            chunk = ranges[rid][2]
            cum = 0
            target = k - below
            for bkt, cnt in sorted(by_rid.get(rid, [])):
                if cum + cnt > target:
                    nlo = lo + bkt * chunk
                    nhi = min(hi, lo + (bkt + 1) * chunk - 1)
                    state[k] = (nlo, nhi, below + cum)
                    if nlo == nhi:
                        resolved[k] = nlo
                    break
                cum += cnt
            else:
                raise RuntimeError("selection rank fell outside histogram")
    else:
        raise RuntimeError(f"did not converge in {max_passes} passes")

    out = []
    for (k, frac), q in zip(plan, qs):
        a = decode(resolved[k])
        if frac == 0.0 or k + 1 >= n:
            out.append(a)
        else:
            b = decode(resolved[k + 1])
            out.append(a * (1 - frac) + b * frac)
    return out


def _f64_order_keys(v: np.ndarray) -> np.ndarray:
    """Order-preserving, exactly invertible float64 → int64 map (the
    IEEE total-order trick: flip all bits of negatives, nothing of
    positives, then re-bias into signed range).  NaNs are rejected —
    they have no place in a total value order."""
    if np.isnan(v).any():
        raise ValueError("float selection: NaNs in value column")
    u = v.view(np.uint64)
    m2 = np.where((u >> np.uint64(63)) == np.uint64(1),
                  np.uint64(0x7FFFFFFFFFFFFFFF), np.uint64(0))
    return (u ^ m2).view(np.int64)


def _f64_from_order_key(k: int) -> float:
    u = np.int64(k).view(np.uint64)
    if (u >> np.uint64(63)) == np.uint64(1):
        u = u ^ np.uint64(0x7FFFFFFFFFFFFFFF)
    return float(u.view(np.float64))


def float_quantiles_by_selection(
    ds: "ray.data.Dataset",
    value_col: str,
    qs: list[float],
    *,
    buckets: int = 4096,
    max_passes: int = 64,
) -> list[float]:
    """Exact ``quantile_cont`` over a FLOAT column by the same
    histogram-narrowing selection: floats are mapped through the
    order-preserving IEEE bit trick (:func:`_f64_order_keys`) so the
    integer core applies unchanged, and each resolved rank decodes back
    to the EXACT double before DuckDB's ``a*(1-frac)+b*frac``
    interpolation — bit-exact against SQL.  64-bit key space ⇒ ≤6
    passes at the default 4096 buckets."""

    def keyed(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col], dtype=np.float64)
        return pa.table({"_ok": pa.array(_f64_order_keys(v))})

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True)
    return quantiles_by_selection(keyed_ds, "_ok", qs, buckets=buckets,
                                  max_passes=max_passes,
                                  decode=_f64_from_order_key)


def grouped_quantiles_by_selection(
    ds: "ray.data.Dataset",
    key: str,
    value_col: str,
    qs: list[float],
    *,
    buckets: int = 1024,
    max_passes: int = 64,
    out_prefix: str = "q",
    decode=float,
) -> pa.Table:
    """PER-GROUP exact ``quantile_cont`` over an INTEGER column via the
    same histogram range-narrowing as :func:`quantiles_by_selection`,
    but for every group at once.  This closes the skew hole in
    :func:`grouped_quantiles`, which ships each group's FULL value
    column into one ``map_groups`` task — at web scale the 'en' group
    is most of the corpus, so that one task is a funnel.  Here no task
    ever sees more than a batch: each pass is one scan emitting
    ``np.bincount`` partials per (group, active-range) SLOT, folded by
    a grouped sum into a ≤ slots×buckets count table; every group's
    range shrinks ~buckets× per pass and groups that resolve early just
    drop out of the slot table.  Per-batch work is vectorized over rows
    with a loop only over the ≤ len(qs)·2 slot INDEXES (constant).

    Returns a driver-side ``pa.Table`` — one row per group — because
    the result is group-domain-sized by construction.  Interpolation is
    DuckDB's ``a*(1-frac) + b*frac``.
    """
    import ray as _ray

    base = grouped_agg(
        ds.select_columns([key, value_col]), [key],
        [("n", None, "count"), ("lo", value_col, "min"),
         ("hi", value_col, "max")]).take_all()
    groups = sorted(base, key=lambda r: r[key])
    gid_of = {r[key]: i for i, r in enumerate(groups)}
    gid_ref = _ray.put(gid_of)

    # per-(gid, rank): value range + below-count; ranks from the q plan
    plan = []  # per group: list of (k, frac)
    state: dict[tuple[int, int], tuple[int, int, int]] = {}
    resolved: dict[tuple[int, int], int] = {}
    for g, r in enumerate(groups):
        n = r["n"]
        pl = []
        for q in qs:
            h = q * (n - 1)
            k = int(np.floor(h))
            frac = h - k
            pl.append((k, frac))
            for kk in ([k] if (frac == 0.0 or k + 1 >= n) else [k, k + 1]):
                if (g, kk) not in state:
                    state[(g, kk)] = (r["lo"], r["hi"], 0)
        plan.append(pl)

    # same domain-derived pass floor as quantiles_by_selection: tiny
    # bucket counts over a 64-bit key domain need >64 ~buckets× shrinks
    max_passes = max(max_passes,
                     math.ceil(64 / math.log2(max(buckets, 2))) + 3)

    for _ in range(max_passes):
        for gk, (lo, hi, below) in list(state.items()):
            if gk not in resolved and lo == hi:
                resolved[gk] = lo
        active = {gk: s for gk, s in state.items() if gk not in resolved}
        if not active:
            break
        # one SLOT per distinct (gid, lo, hi); ranks of a group usually share
        slot_of: dict[tuple[int, int, int], int] = {}
        slots: list[tuple[int, int, int, int]] = []  # (gid, lo, hi, chunk)
        for (g, _k), (lo, hi, _b) in active.items():
            if (g, lo, hi) not in slot_of:
                chunk = -((hi - lo + 1) // -buckets)
                slot_of[(g, lo, hi)] = len(slots)
                slots.append((g, lo, hi, chunk))
        max_per_g = max(
            sum(1 for s in slots if s[0] == g) for g in {s[0] for s in slots})
        # dense (gid, j) -> slot lookup arrays for the vectorized scan
        G = len(groups)
        slot_lo = np.full((G, max_per_g), 1, dtype=np.int64)
        slot_hi = np.full((G, max_per_g), 0, dtype=np.int64)   # empty: lo>hi
        slot_chunk = np.ones((G, max_per_g), dtype=np.int64)
        slot_id = np.full((G, max_per_g), -1, dtype=np.int64)
        fill = {g: 0 for g in range(G)}
        for sid, (g, lo, hi, chunk) in enumerate(slots):
            j = fill[g]
            slot_lo[g, j], slot_hi[g, j] = lo, hi
            slot_chunk[g, j], slot_id[g, j] = chunk, sid
            fill[g] = j + 1
        luts_ref = _ray.put((slot_lo, slot_hi, slot_chunk, slot_id))
        nbuckets = buckets + 1  # ceil-div chunk can leave a partial last bucket

        def hist(batch: pa.Table) -> pa.Table:
            lut = _ray.get(gid_ref)
            s_lo, s_hi, s_ch, s_id = _ray.get(luts_ref)
            enc = batch[key].combine_chunks().dictionary_encode()
            dgid = np.asarray([lut[x] for x in enc.dictionary.to_pylist()],
                              dtype=np.int64)
            gid = dgid[np.asarray(enc.indices)]
            v = np.asarray(batch[value_col], dtype=np.int64)
            parts = []
            for j in range(s_lo.shape[1]):
                lo, hi = s_lo[gid, j], s_hi[gid, j]
                sid = s_id[gid, j]
                m = (v >= lo) & (v <= hi) & (sid >= 0)
                if not m.any():
                    continue
                with np.errstate(over="ignore"):  # wrap-safe full-domain diff
                    diff = v[m].astype(np.uint64) - lo[m].astype(np.uint64)
                bkt = (diff // s_ch[gid[m], j].astype(np.uint64)) \
                    .astype(np.int64)
                comp = sid[m] * nbuckets + bkt
                bc = np.bincount(comp)
                nz = np.flatnonzero(bc)
                parts.append((nz, bc[nz]))
            if not parts:
                return pa.table({"sb": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            sb = np.concatenate([p[0] for p in parts])
            nn = np.concatenate([p[1] for p in parts])
            return pa.table({"sb": pa.array(sb.astype(np.int64)),
                             "n": pa.array(nn.astype(np.int64))})

        rows = grouped_agg(
            ds.map_batches(hist, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["sb"], [("n", "n", "sum")]).take_all()
        by_sid: dict[int, list] = {}
        for r in rows:
            by_sid.setdefault(r["sb"] // nbuckets, []).append(
                (r["sb"] % nbuckets, r["n"]))
        for (g, k), (lo, hi, below) in active.items():
            sid = slot_of[(g, lo, hi)]
            chunk = slots[sid][3]
            cum = 0
            target = k - below
            for bkt, cnt in sorted(by_sid.get(sid, [])):
                if cum + cnt > target:
                    nlo = lo + bkt * chunk
                    nhi = min(hi, lo + (bkt + 1) * chunk - 1)
                    state[(g, k)] = (nlo, nhi, below + cum)
                    if nlo == nhi:
                        resolved[(g, k)] = nlo
                    break
                cum += cnt
            else:
                raise RuntimeError("selection rank fell outside histogram")
    else:
        raise RuntimeError(f"did not converge in {max_passes} passes")

    cols: dict[str, list] = {key: [r[key] for r in groups]}
    for qi, q in enumerate(qs):
        name = f"{out_prefix}{str(q).replace('.', '_')}"
        vals = []
        for g, r in enumerate(groups):
            k, frac = plan[g][qi]
            a = decode(resolved[(g, k)])
            if frac == 0.0 or k + 1 >= r["n"]:
                vals.append(a)
            else:
                b = decode(resolved[(g, k + 1)])
                vals.append(a * (1 - frac) + b * frac)
        cols[name] = vals
    out = {key: pa.array(cols[key])}
    for q in qs:
        name = f"{out_prefix}{str(q).replace('.', '_')}"
        out[name] = pa.array(cols[name], type=pa.float64())
    return pa.table(out)


def rank_counts(
    ds: "ray.data.Dataset", value_col: str, values: list[float],
    *, batch_size: int = 65536,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Distributed rank interval of each probe value in the data:
    returns ``(count_lt, count_le, n_rows)`` per value — one streaming
    pass, tiny per-batch partials (no sort, no shuffle of rows).  Used
    to certify quantile-sketch estimates against their rank-error bound.
    """
    probes = np.asarray(values, dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        v = np.sort(np.asarray(batch[value_col], dtype=np.float64))
        lt = np.searchsorted(v, probes, side="left")
        le = np.searchsorted(v, probes, side="right")
        return pa.table({
            "lt": pa.array(lt.astype(np.int64)),
            "le": pa.array(le.astype(np.int64)),
            "n": pa.array(np.full(len(probes), len(v), dtype=np.int64)),
            "i": pa.array(np.arange(len(probes), dtype=np.int64)),
        })

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    ).groupby("i").aggregate(
        ray.data.aggregate.Sum("lt", alias_name="lt"),
        ray.data.aggregate.Sum("le", alias_name="le"),
        ray.data.aggregate.Sum("n", alias_name="n"),
    ).take_all()
    lt = np.zeros(len(probes), dtype=np.int64)
    le = np.zeros(len(probes), dtype=np.int64)
    n = 0
    for r in parts:
        lt[r["i"]] = r["lt"]
        le[r["i"]] = r["le"]
        n = max(n, r["n"])
    return lt, le, int(n)


def rank_errors(
    ds: "ray.data.Dataset", value_col: str,
    estimates: list[float], qs: list[float],
) -> np.ndarray:
    """Per-(estimate, q) rank error: distance from q to the estimate's
    rank interval [count_lt/n, count_le/n] (0 when inside — tied values
    occupy an interval, same convention as tests/test_quantiles.py)."""
    lt, le, n = rank_counts(ds, value_col, estimates)
    lo = lt / max(n, 1)
    hi = le / max(n, 1)
    q = np.asarray(qs, dtype=np.float64)
    return np.where((q >= lo) & (q <= hi), 0.0,
                    np.minimum(np.abs(q - lo), np.abs(q - hi)))


def grouped_moments(
    ds: "ray.data.Dataset",
    keys: list[str],
    x_col: str,
    y_col: str,
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Exact per-key second moments of two INTEGER columns — n, Σx, Σy,
    Σx², Σy², Σxy as int64 — the decomposable sufficient statistics for
    variance / covariance / correlation / OLS slope, computed with one
    scan and the standard pre-combine shuffle.

    Keeping the moments integer (caller pre-scales floats to fixed
    point) makes the result bit-exact and hash-comparable; the caller
    derives corr/cov in float at the end, where a single final division
    cannot accumulate error.  Overflow contract: |x|,|y| ≤ ~3e6 with
    1e6 rows per key stays inside int64 for Σxy — pre-scale
    accordingly.
    """

    def add_products(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch[x_col], dtype=np.int64)
        y = np.asarray(batch[y_col], dtype=np.int64)
        cols = {k: batch[k] for k in keys}
        cols["_x"] = pa.array(x)
        cols["_y"] = pa.array(y)
        cols["_xx"] = pa.array(x * x)
        cols["_yy"] = pa.array(y * y)
        cols["_xy"] = pa.array(x * y)
        return pa.table(cols)

    prepped = ds.map_batches(add_products, batch_format="pyarrow",
                             batch_size=batch_size, zero_copy_batch=True)
    return grouped_agg(prepped, keys, [
        ("n", None, "count"),
        ("sum_x", "_x", "sum"), ("sum_y", "_y", "sum"),
        ("sum_xx", "_xx", "sum"), ("sum_yy", "_yy", "sum"),
        ("sum_xy", "_xy", "sum"),
    ], batch_size=batch_size)


def pivot_counts(
    ds: "ray.data.Dataset",
    row_key: str,
    col_key: str,
    col_values: list[str],
    *,
    prefix: str = "n_",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Wide reshape (pivot): one output row per ``row_key`` value with
    an int64 count column per entry of ``col_values``.

    The pivot column set is caller-supplied and FIXED — a stable output
    schema is a hard requirement of a distributed pivot (blocks must
    agree on columns without a coordination round); a ``col_key`` value
    outside ``col_values`` raises rather than silently dropping rows.

    Shape: exact grouped (row, col) counts with in-batch pre-combine,
    then a vectorized scatter of each count block into the wide layout
    and a grouped sum of the wide partials — the shuffle carries the
    distinct (row, col) table, then one wide row per row key per block.
    """
    fine = grouped_agg(ds, [row_key, col_key], [("_n", None, "count")],
                       batch_size=batch_size)
    col_idx = {v: i for i, v in enumerate(col_values)}
    wide_names = [f"{prefix}{v}" for v in col_values]

    def widen(batch: pa.Table) -> pa.Table:
        rows = np.asarray(batch[row_key])
        if rows.dtype == object:
            rows = rows.astype("U")
        cols = batch[col_key].to_pylist()
        unknown = [c for c in cols if c not in col_idx]
        if unknown:
            raise ValueError(f"pivot_counts: unexpected {col_key} values {unknown[:5]!r}")
        n = np.asarray(batch["_n"], dtype=np.int64)
        uniq, inv = np.unique(rows, return_inverse=True)
        wide = np.zeros((len(uniq), len(col_values)), dtype=np.int64)
        np.add.at(wide, (inv, [col_idx[c] for c in cols]), n)
        out = {row_key: pa.array(uniq, type=batch[row_key].type)}
        for j, name in enumerate(wide_names):
            out[name] = pa.array(wide[:, j])
        return pa.table(out)

    wide_partials = fine.map_batches(widen, batch_format="pyarrow",
                                     zero_copy_batch=True)
    return grouped_agg(wide_partials, [row_key],
                       [(name, name, "sum") for name in wide_names],
                       batch_size=batch_size)


def key_set_op(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    column: str,
    op: str,
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Distributed distinct set operation on a key column — SQL
    ``INTERSECT`` / ``EXCEPT`` / ``UNION`` (all distinct).

    Scale shape: each side deduplicates per batch BEFORE the shuffle, a
    0/1 side flag rides along, and one grouped min/max over the flag
    decides membership (min=0 ∧ max=1 ⇒ both sides; max=0 ⇒ left
    only).  The all-to-all volume is per-block distinct keys, never raw
    rows; no driver-side materialization.
    """
    if op not in ("intersect", "except", "union"):
        raise ValueError(f"key_set_op: unknown op {op!r}")

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            col = batch[column]
            u = pc.unique(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
            return pa.table({column: u,
                             "_side": pa.array(np.full(len(u), side, dtype=np.int8))})
        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow",
                              batch_size=batch_size, zero_copy_batch=True).union(
        right.map_batches(tag(1), batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True))
    flags = grouped_agg(tagged, [column],
                        [("_lo", "_side", "min"), ("_hi", "_side", "max")],
                        batch_size=batch_size)

    def pick(batch: pa.Table) -> pa.Table:
        lo = np.asarray(batch["_lo"], dtype=np.int8)
        hi = np.asarray(batch["_hi"], dtype=np.int8)
        if op == "intersect":
            keep = (lo == 0) & (hi == 1)
        elif op == "except":
            keep = hi == 0
        else:
            keep = np.ones(len(batch), dtype=bool)
        return pa.table({column: batch[column].filter(pa.array(keep))})

    return flags.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def distinct_count(ds: "ray.data.Dataset", column: str, *, batch_size: int = 65536) -> int:
    """Exact distinct count with in-batch dedup before the shuffle."""

    def dedup_batch(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch[column].combine_chunks() if isinstance(batch[column], pa.ChunkedArray) else batch[column])
        return pa.table({column: u})

    deduped = ds.map_batches(
        dedup_batch, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return len(deduped.unique(column))


def sessionize_count(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    gap_seconds: float,
    *,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Windowed/sessionized aggregate: per key, the number of sessions
    (runs of events whose inter-arrival gap ≤ ``gap_seconds``) and the
    event count.

    Scale shape: keys are hash-bucketed into ``num_partitions`` coarse
    partitions (ONE map_groups call per partition, not per key — a
    Python call per key would dominate at many keys), then each
    partition lexsorts (key, ts) and counts session starts with one
    vectorized boundary/gap diff.  Session count is order-independent
    given per-key sorted timestamps, so the hash shuffle is the only
    data movement.  Returns ``{key, n_sessions, n_events}``.
    """
    gap_us = int(gap_seconds * 1_000_000)

    def add_pkey(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
        return pa.table({
            key_column: batch[key_column],
            "_ts_us": pc.cast(batch[ts_column], pa.int64()),
            "_pkey": pa.array(pk.astype(np.int32)),
        })

    def partition_sessions(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return pa.table({key_column: pa.array([], group[key_column].type),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        keys = np.asarray(group[key_column], dtype=np.int64)
        ts = np.asarray(group["_ts_us"], dtype=np.int64)
        order = np.lexsort((ts, keys))
        keys, ts = keys[order], ts[order]
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        gap_break = np.zeros(n, dtype=bool)
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
        session_start = new_key | gap_break
        uniq_keys = keys[new_key]
        seg_id = np.cumsum(new_key) - 1
        n_sessions = np.bincount(seg_id, weights=session_start).astype(np.int64)
        n_events = np.bincount(seg_id).astype(np.int64)
        return pa.table({
            key_column: pa.array(uniq_keys, type=group[key_column].type),
            "n_sessions": pa.array(n_sessions),
            "n_events": pa.array(n_events),
        })

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(partition_sessions, batch_format="pyarrow")
    )


def running_window(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    value_column: str,
    id_column: str,
    *,
    out_gap: str = "gap_us",
    out_sum: str = "cum_sum",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-ROW window functions over event time: for every input row,
    the lag gap to the key's previous event (µs; 0 for the key's first
    event — SQL ``coalesce(ts - lag(ts) OVER w, 0)``) and the running
    sum of ``value_column`` (SQL ``sum(v) OVER (PARTITION BY key ORDER
    BY ts, id ROWS UNBOUNDED PRECEDING)``).  ``id_column`` must be
    unique — it is the ORDER BY tie-break that makes the running sum
    deterministic under equal timestamps.

    ``value_column`` must be integer (exact running sums; SQL window
    sums over floats are computed in engine-specific association order,
    so float running sums cannot be hash-compared — callers convert to
    fixed-point first, see q_events_running).

    Scale shape: same coarse hash-bucketing as :func:`sessionize_count`
    (one ``map_groups`` per partition, not per key), one composite
    lexsort per partition, then two vectorized passes — a shifted diff
    for the gap and a segment-offset cumsum for the per-key running sum.
    Output rows = input rows; the only data movement is the key-hash
    shuffle.
    """

    def add_pkey(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
        return pa.table({
            id_column: batch[id_column],
            key_column: batch[key_column],
            "_ts_us": pc.cast(batch[ts_column], pa.int64()),
            value_column: pc.cast(batch[value_column], pa.int64()),
            "_pkey": pa.array(pk.astype(np.int32)),
        })

    def part(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return pa.table({
                id_column: pa.array([], group[id_column].type),
                key_column: pa.array([], group[key_column].type),
                out_gap: pa.array([], pa.int64()),
                out_sum: pa.array([], pa.int64()),
            })
        keys = np.asarray(group[key_column], dtype=np.int64)
        ts = np.asarray(group["_ts_us"], dtype=np.int64)
        ids = np.asarray(group[id_column], dtype=np.int64)
        vals = np.asarray(group[value_column], dtype=np.int64)
        order = np.lexsort((ids, ts, keys))
        keys, ts, ids, vals = keys[order], ts[order], ids[order], vals[order]
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = np.where(new_key[1:], 0, ts[1:] - ts[:-1])
        cs = np.cumsum(vals)
        starts = np.flatnonzero(new_key)
        seg_id = np.cumsum(new_key) - 1
        offset = (cs[starts] - vals[starts])[seg_id]
        cum = cs - offset
        return pa.table({
            id_column: pa.array(ids, type=group[id_column].type),
            key_column: pa.array(keys, type=group[key_column].type),
            out_gap: pa.array(gap),
            out_sum: pa.array(cum),
        })

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(part, batch_format="pyarrow")
    )


def rolling_median_k(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    value_column: str,
    id_column: str,
    *,
    window: int = 4,
    out_col: str = "roll_median",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-row trailing ORDER-STATISTIC window: for every row, the
    exact median of the key's last ``window`` values up to and
    including it — SQL ``median(v) OVER (PARTITION BY key ORDER BY ts,
    id ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.  Uses
    DuckDB's even-count interpolation ``a*0.5 + b*0.5`` (quantile_cont
    arithmetic, see :func:`grouped_quantiles`) so results hash-compare;
    for odd counts ``m*0.5 + m*0.5 == m`` exactly in IEEE, so one
    formula covers both parities.  Values must be non-NaN (the lag
    matrix pads with +inf, which must sort after every real value).

    Scale shape: the :func:`running_window` discipline — coarse
    key-HASH buckets (one ``map_groups`` per partition, not per key),
    one composite lexsort per partition, then a fully vectorized
    ``(n, window)`` lag-gather + row-wise partial sort.  ``window`` is
    a small constant, so per-partition work is O(n·w·log w) with no
    Python row loop; the only exchange is the key-hash shuffle.
    """
    if window < 1:
        raise ValueError("window must be >= 1")

    def add_pkey(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
        return pa.table({
            id_column: batch[id_column],
            key_column: batch[key_column],
            "_ts_us": pc.cast(batch[ts_column], pa.int64()),
            "_v": pc.cast(batch[value_column], pa.float64()),
            "_pkey": pa.array(pk.astype(np.int32)),
        })

    def part(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return pa.table({
                id_column: pa.array([], group[id_column].type),
                key_column: pa.array([], group[key_column].type),
                out_col: pa.array([], pa.float64()),
            })
        keys = np.asarray(group[key_column], dtype=np.int64)
        ts = np.asarray(group["_ts_us"], dtype=np.int64)
        ids = np.asarray(group[id_column], dtype=np.int64)
        vals = np.asarray(group["_v"], dtype=np.float64)
        order = np.lexsort((ids, ts, keys))
        keys, ids, vals = keys[order], ids[order], vals[order]
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        seg_id = np.cumsum(new_key) - 1
        starts = np.flatnonzero(new_key)
        pos = np.arange(n, dtype=np.int64) - starts[seg_id]
        lag = np.full((n, window), np.inf, dtype=np.float64)
        for j in range(min(window, n)):   # j >= n: no row has a j-lag
            ok = pos >= j          # lag j stays inside the key segment
            lag[j:, j] = np.where(ok[j:], vals[: n - j] if j else vals,
                                  np.inf)
        lag.sort(axis=1)
        c = np.minimum(pos + 1, window).astype(np.int64)
        rows_ix = np.arange(n)
        lo = lag[rows_ix, (c - 1) // 2]
        hi = lag[rows_ix, c // 2]
        med = lo * 0.5 + hi * 0.5
        return pa.table({
            id_column: pa.array(ids, type=group[id_column].type),
            key_column: pa.array(keys, type=group[key_column].type),
            out_col: pa.array(med, type=pa.float64()),
        })

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(part, batch_format="pyarrow")
    )


def asof_join_broadcast(
    ds: "ray.data.Dataset",
    right: pa.Table,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_columns: list[str],
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """As-of join (latest right row with ``right_ts <= left_ts`` per
    key) against a broadcast small side — the no-shuffle shape for
    dimension histories.

    The right side is sorted once by (key, ts) and shipped through the
    object store as numpy arrays; every batch resolves its matches with
    ONE ``np.searchsorted`` on a composite (key, ts-seconds) int64 key
    (no per-row or per-key Python).  Left rows with no match get nulls.
    Keys must be int64-like; ties on (key, ts) resolve to the LAST right
    row in input order (callers wanting determinism should pre-dedupe —
    see q_events_asof_order).
    """
    import ray as _ray

    from ..proc_cache import cached_instance

    rk = np.asarray(right[right_key], dtype=np.int64)
    rts_us = np.asarray(pc.cast(right[right_ts], pa.int64()), dtype=np.int64)
    # floor to ABSOLUTE wall-clock seconds first, then shift into the 34
    # bits — base-independent flooring keeps the second-granularity
    # semantics identical across the broadcast and partitioned variants
    rts_abs = rts_us // 1_000_000
    base_s = int(rts_abs.min()) if len(rts_abs) else 0
    rts_s = rts_abs - base_s
    if len(rk) and (rk.max() >= (1 << 29) or rts_s.max() >= (1 << 34)):
        raise ValueError("asof_join_broadcast: key/ts range exceeds composite-key bounds")
    order = np.lexsort((rts_s, rk))
    composite = (rk[order] << np.int64(34)) | rts_s[order]
    vals = {c: np.asarray(right[c])[order] for c in value_columns}
    ref = _ray.put((composite, rk[order], base_s, vals))

    def join(batch: pa.Table) -> pa.Table:
        comp_r, rk_sorted, base, vals_r = cached_instance(
            ("asof", ref.hex()), lambda: _ray.get(ref))
        lk = np.asarray(batch[left_key], dtype=np.int64)
        lts = (np.asarray(pc.cast(batch[left_ts], pa.int64()), dtype=np.int64)
               // 1_000_000) - base
        lts = np.maximum(lts, -1)  # pre-base left rows can never match
        comp_l = (lk << np.int64(34)) | np.maximum(lts, 0)
        idx = np.searchsorted(comp_r, comp_l, side="right") - 1
        valid = (idx >= 0) & (lts >= 0)
        safe = np.clip(idx, 0, max(len(comp_r) - 1, 0))
        if len(comp_r):
            valid &= rk_sorted[safe] == lk
        else:
            valid[:] = False
        out = batch
        for c, arr in vals_r.items():
            col = np.where(valid, arr[safe], None)
            out = out.append_column(c, pa.array(col.tolist()))
        return out

    return ds.map_batches(
        join, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def rolling_count_max(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    window_seconds: float,
    *,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Trailing-window aggregate: per key, the MAX over its events of
    the count of that key's events in ``[ts − window, ts]`` (peer rows
    with identical timestamps all count, matching SQL RANGE-window
    semantics).

    Same scale shape as :func:`sessionize_count`: hash-bucket keys into
    coarse partitions, lexsort (key, ts) once per partition, then
    resolve every row's window bounds with two vectorized searchsorteds
    on a composite ``(key << 42) | ts_us`` int64 key — no per-row or
    per-key Python.  Returns ``{key, max_events_window}``.
    """
    window_us = int(window_seconds * 1_000_000)

    def add_pkey(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
        return pa.table({
            key_column: batch[key_column],
            "_ts_us": pc.cast(batch[ts_column], pa.int64()),
            "_pkey": pa.array(pk.astype(np.int32)),
        })

    def partition_windows(group: pa.Table) -> pa.Table:
        n = len(group)
        empty = pa.table({key_column: pa.array([], group[key_column].type),
                          "max_events_window": pa.array([], pa.int64())})
        if n == 0:
            return empty
        keys = np.asarray(group[key_column], dtype=np.int64)
        ts = np.asarray(group["_ts_us"], dtype=np.int64)
        base = int(ts.min())
        rel = ts - base
        if keys.max() >= (1 << 21) or rel.max() >= (1 << 42):
            raise ValueError("rolling_count_max: key/ts range exceeds composite bounds")
        order = np.lexsort((rel, keys))
        keys, rel = keys[order], rel[order]
        comp = (keys << np.int64(42)) | rel
        lo = np.searchsorted(comp, (keys << np.int64(42)) | np.maximum(rel - window_us, 0),
                             side="left")
        hi = np.searchsorted(comp, comp, side="right")
        cnt = hi - lo
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        seg_id = np.cumsum(new_key) - 1
        mx = np.full(int(seg_id[-1]) + 1, 0, dtype=np.int64)
        np.maximum.at(mx, seg_id, cnt)
        return pa.table({
            key_column: pa.array(keys[new_key], type=group[key_column].type),
            "max_events_window": pa.array(mx),
        })

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(partition_windows, batch_format="pyarrow")
    )


def broadcast_range_count(
    ds: "ray.data.Dataset",
    ts_column: str,
    intervals_ref,
    *,
    id_column: str = "interval_id",
    lo_column: str = "lo",
    hi_column: str = "hi",
    out_column: str = "n_events",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Broadcast interval (range) join, aggregate form: count fact rows
    whose ``ts_column`` falls in each half-open ``[lo, hi)`` of a SMALL
    interval table (``ray.put`` handle to a pyarrow Table with id/lo/hi
    columns, lo/hi as int64 in the fact column's raw unit).

    Scale shape: the interval side is broadcast once and indexed once
    per worker process (proc_cache); each fact batch sorts its values
    and answers ALL intervals with two vectorized searchsorted probes,
    emitting per-batch partial counts — the shuffle moves O(intervals)
    rows per batch, never fact rows.  Intervals may overlap (each
    counts independently); a row inside k intervals contributes to all
    k.  Intervals with zero matches are absent from the output (the
    caller outer-joins against its interval list if it needs zeros).
    """
    import ray as _ray

    from ..proc_cache import cached_instance

    def _build():
        t = _ray.get(intervals_ref)
        return (
            t[id_column].combine_chunks(),
            np.asarray(t[lo_column], dtype=np.int64),
            np.asarray(t[hi_column], dtype=np.int64),
        )

    def partial(batch: pa.Table) -> pa.Table:
        ids, lo, hi = cached_instance(
            ("range_count", intervals_ref.hex()), _build)
        ts = np.sort(np.asarray(pc.cast(batch[ts_column].combine_chunks(),
                                        pa.int64()), dtype=np.int64))
        n = np.searchsorted(ts, hi, side="left") - np.searchsorted(ts, lo, side="left")
        keep = np.flatnonzero(n > 0)
        return pa.table({
            id_column: ids.take(pa.array(keep)),
            out_column: pa.array(n[keep].astype(np.int64)),
        })

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    return grouped_agg(partials, [id_column], [(out_column, out_column, "sum")])


def asof_join_partitioned(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_columns: list[str],
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """As-of join (latest right row with ``right_ts <= left_ts`` per
    key) when BOTH sides are large — the shuffle counterpart of
    :func:`asof_join_broadcast` for right sides that outgrow a
    broadcast.

    Shape: both sides are hash-partitioned on the key with the SAME
    partition function (co-location) through one unified null-padded
    schema, and each partition resolves all its matches with the same
    composite ``(key << 34) | ts_seconds`` searchsorted as the
    broadcast variant.  Each side moves through the shuffle exactly
    once; nothing materializes on the driver.  Same bounds contract
    (key < 2^29, ts span < 2^34 s) and tie behavior (ties on
    (key, ts) resolve arbitrarily — pre-dedupe the right side for
    determinism).
    """
    lsch = getattr(left.schema(), "base_schema", left.schema())
    rsch = getattr(right.schema(), "base_schema", right.schema())
    left_cols = list(lsch.names)
    ltypes = {c: lsch.field(c).type for c in left_cols}
    vtypes = {c: rsch.field(c).type for c in value_columns}

    def _pk(k: np.ndarray) -> pa.Array:
        with np.errstate(over="ignore"):
            pk = (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                  ) % np.uint64(num_partitions)
        return pa.array(pk.astype(np.int32))

    def tag_left(batch: pa.Table) -> pa.Table:
        n = len(batch)
        k = np.asarray(pc.cast(batch[left_key].combine_chunks(), pa.int64()))
        cols = {c: batch[c] for c in left_cols}
        for c in value_columns:
            cols[f"_v_{c}"] = pa.nulls(n, vtypes[c])
        cols["_k"] = pa.array(k)
        cols["_ts_us"] = pc.cast(batch[left_ts], pa.int64())
        cols["_side"] = pa.array(np.zeros(n, dtype=np.int8))
        cols["_pk"] = _pk(k)
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        k = np.asarray(pc.cast(batch[right_key].combine_chunks(), pa.int64()))
        cols = {c: pa.nulls(n, ltypes[c]) for c in left_cols}
        for c in value_columns:
            cols[f"_v_{c}"] = batch[c]
        cols["_k"] = pa.array(k)
        cols["_ts_us"] = pc.cast(batch[right_ts], pa.int64())
        cols["_side"] = pa.array(np.ones(n, dtype=np.int8))
        cols["_pk"] = _pk(k)
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow",
                              zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format="pyarrow",
                          zero_copy_batch=True))

    def resolve(group: pa.Table) -> pa.Table:
        side = np.asarray(group["_side"], dtype=np.int8)
        k = np.asarray(group["_k"], dtype=np.int64)
        ts = np.asarray(group["_ts_us"], dtype=np.int64)
        l_idx = np.flatnonzero(side == 0)
        lt = group.take(pa.array(l_idx))
        cols = {c: lt[c] for c in left_cols}
        r_idx = np.flatnonzero(side == 1)
        if r_idx.size == 0 or l_idx.size == 0:
            for c in value_columns:
                cols[c] = pa.nulls(len(l_idx), vtypes[c])
            return pa.table(cols)
        ts_abs = ts // 1_000_000  # absolute-second floor (see broadcast variant)
        base = int(ts_abs.min())
        ts_s = ts_abs - base
        if k.max() >= (1 << 29) or ts_s.max() >= (1 << 34):
            raise ValueError(
                "asof_join_partitioned: key/ts range exceeds composite-key bounds")
        order = r_idx[np.lexsort((ts_s[r_idx], k[r_idx]))]
        comp_r = (k[order] << np.int64(34)) | ts_s[order]
        comp_l = (k[l_idx] << np.int64(34)) | ts_s[l_idx]
        pos = np.searchsorted(comp_r, comp_l, side="right") - 1
        pos_c = np.maximum(pos, 0)
        valid = (pos >= 0) & (k[order][pos_c] == k[l_idx])
        take = pa.array(order[pos_c])
        vmask = pa.array(valid)
        for c in value_columns:
            v = group[f"_v_{c}"].combine_chunks().take(take)
            cols[c] = pc.if_else(vmask, v, pa.nulls(len(valid), vtypes[c]))
        return pa.table(cols)

    return tagged.groupby("_pk").map_groups(resolve, batch_format="pyarrow")


def grouped_ntile_stats(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    k: int,
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Exact per-group NTILE(k) bucket statistics over an INTEGER value
    column: for each group and tile t ∈ 1..k (SQL ``ntile(k) OVER
    (PARTITION BY keys ORDER BY value)``), the bucket's row count,
    min/max value and value sum.

    Scale shape: tile aggregates over the sorted multiset are invariant
    to how ties are broken between equal values, so the full rows never
    move — each batch pre-aggregates to distinct ``(keys, value, count)``
    rows and only those shuffle.  Per group, the sorted distinct values
    + counts reconstruct every tile boundary with two ``searchsorted``
    probes and weighted prefix sums (no ``np.repeat`` expansion), so a
    billion-row group with a few thousand distinct values costs a few
    thousand ints through the exchange and O(distinct) reducer work.
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(keys + [value_col]).group_by(
            keys + [value_col]).aggregate([([], "count_all")])
        return g.rename_columns(keys + [value_col, "cnt"])

    partials = ds.map_batches(
        partial, batch_size=batch_size, batch_format="pyarrow",
        zero_copy_batch=True)

    def per_group(group: pa.Table) -> pa.Table:
        vals = np.asarray(group[value_col], dtype=np.int64)
        # combine partials from different batches that carry the same value
        order = np.argsort(vals, kind="stable")
        vals = vals[order]
        cnt = np.asarray(group["cnt"], dtype=np.int64)[order]
        uniq_mask = np.empty(len(vals), dtype=bool)
        if len(vals):
            uniq_mask[0] = True
            uniq_mask[1:] = vals[1:] != vals[:-1]
        seg = np.cumsum(uniq_mask) - 1
        u_vals = vals[uniq_mask]
        u_cnt = np.zeros(len(u_vals), dtype=np.int64)
        np.add.at(u_cnt, seg, cnt)

        n = int(u_cnt.sum())
        base, extra = divmod(n, k)
        sizes = np.full(k, base, dtype=np.int64)
        sizes[:extra] += 1
        tiles = np.nonzero(sizes > 0)[0]
        sizes = sizes[tiles]
        ends = np.cumsum(sizes)          # 1-based end position per tile
        starts = ends - sizes            # 0-based start position per tile

        cum = np.cumsum(u_cnt)           # end position of each distinct value
        wsum = np.cumsum(u_vals * u_cnt)  # value-weighted prefix totals
        idx_min = np.searchsorted(cum, starts, side="right")
        idx_max = np.searchsorted(cum, ends - 1, side="right")

        def prefix_sum(p: np.ndarray) -> np.ndarray:
            # total of the first p elements of the expanded sorted array
            i = np.searchsorted(cum, p, side="left")
            below = np.where(i > 0, wsum[np.maximum(i - 1, 0)], 0)
            covered = np.where(i > 0, cum[np.maximum(i - 1, 0)], 0)
            inside = (p - covered) * np.where(i < len(u_vals), u_vals[np.minimum(i, len(u_vals) - 1)], 0)
            return below + inside

        sums = prefix_sum(ends) - prefix_sum(starts)
        cols = {kk: group[kk].slice(0, 1).combine_chunks().take(
            pa.array(np.zeros(len(tiles), dtype=np.int64))) for kk in keys}
        cols["tile"] = pa.array(tiles + 1, type=pa.int64())
        cols["n_rows"] = pa.array(sizes, type=pa.int64())
        cols["min_val"] = pa.array(u_vals[idx_min], type=pa.int64())
        cols["max_val"] = pa.array(u_vals[idx_max], type=pa.int64())
        cols["sum_val"] = pa.array(sums, type=pa.int64())
        return pa.table(cols)

    return partials.groupby(keys).map_groups(per_group, batch_format="pyarrow")


def grouped_string_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    *,
    sep: str = ",",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Exact per-group ordered DISTINCT string concatenation — SQL
    ``string_agg(DISTINCT value, sep ORDER BY value)`` — plus the
    distinct-value count per group.

    Scale shape: concatenation of the *distinct* value set is invariant
    to row multiplicity, so full rows never shuffle — each batch dedups
    to distinct ``(keys, value)`` pairs first (the same pre-shuffle
    dedup as ``key_set_op``) and only those cross the exchange.  The
    reducer re-dedups across batches, byte-sorts (UTF-8 byte order ==
    codepoint order, matching DuckDB's binary collation) and emits ONE
    row per group.  Groups whose distinct set is genuinely huge pay for
    their own output string, exactly like the SQL they mirror.
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[value_col]))  # SQL skips NULLs
        g = batch.select(keys + [value_col]).group_by(
            keys + [value_col]).aggregate([])
        return g.rename_columns(keys + [value_col])

    partials = ds.map_batches(
        partial, batch_size=batch_size, batch_format="pyarrow",
        zero_copy_batch=True)

    def per_group(group: pa.Table) -> pa.Table:
        vals = np.unique(np.asarray(group[value_col].combine_chunks()))
        cols = {k: group[k].slice(0, 1) for k in keys}
        cols["n_distinct"] = pa.array([len(vals)], type=pa.int64())
        cols["agg"] = pa.array([sep.join(vals)], type=pa.string())
        return pa.table(cols)

    return partials.groupby(keys).map_groups(per_group, batch_format="pyarrow")


def unpivot(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    value_cols: list[str],
    *,
    var_name: str = "name",
    value_name: str = "value",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Wide→long reshape (SQL UNPIVOT / pandas melt): each input row
    becomes ``len(value_cols)`` rows carrying the id columns, the source
    column's name and its value.  The ``value_cols`` must share one
    Arrow type (cast upstream) so the long column has a stable schema.

    Scale shape: a pure per-batch ``map_batches`` — no shuffle, no
    state; the k× row expansion happens inside the block so downstream
    pre-combining aggregates (``grouped_agg``) see it before any
    exchange.  The name column is a constant-per-slice ``pa.repeat``
    (no per-row Python strings).
    """
    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    def melt(batch: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: batch[k] for k in id_cols}
            cols[var_name] = pa.repeat(pa.scalar(c, type=pa.string()), len(batch))
            cols[value_name] = batch[c]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(
        melt, batch_size=batch_size, batch_format="pyarrow",
        zero_copy_batch=True)


def funnel_users(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    type_column: str,
    type_a: str,
    type_b: str,
    window_seconds: float,
    *,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Two-step funnel: per key, did a ``type_b`` event land strictly
    after some ``type_a`` event and within ``window_seconds`` of it
    (``0 < t_b − t_a ≤ W``)?  Returns one row per key that has at least
    one A or B event: ``{key, n_a, n_b, converted}``.

    Scale shape (same as :func:`sessionize_count`): rows are filtered
    to the two step types BEFORE the exchange, hash-bucketed into
    coarse partitions, and each partition lexsorts (key, ts, B-before-A
    at ties) once.  The conversion test is then a segmented running
    max: for every B row, the latest prior A of the same key minimizes
    ``t_b − t_a``, so "any A in window" ⇔ "latest prior A in window".
    The tie order makes the inclusive cummax see only A rows with
    ``ts < t_b`` (equal-ts A sorts after B), matching the strict
    inequality.  The cummax is pandas ``groupby(...).cummax()`` — a
    C-level segmented scan, no per-key Python and no composite-key
    width bounds.
    """
    import pandas as pd

    window_us = int(window_seconds * 1_000_000)
    int_min = np.int64(np.iinfo(np.int64).min)

    def add_pkey(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[type_column], value_set=pa.array([type_a, type_b]))
        batch = batch.filter(mask)
        k = np.asarray(batch[key_column], dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
        return pa.table({
            key_column: batch[key_column],
            "_ts_us": pc.cast(batch[ts_column], pa.int64()),
            "_isb": pc.cast(pc.equal(batch[type_column], type_b), pa.int8()),
            "_pkey": pa.array(pk.astype(np.int32)),
        })

    def partition_funnel(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return pa.table({key_column: pa.array([], group[key_column].type),
                             "n_a": pa.array([], pa.int64()),
                             "n_b": pa.array([], pa.int64()),
                             "converted": pa.array([], pa.bool_())})
        keys = np.asarray(group[key_column], dtype=np.int64)
        ts = np.asarray(group["_ts_us"], dtype=np.int64)
        isb = np.asarray(group["_isb"], dtype=np.int8)
        order = np.lexsort((np.int8(1) - isb, ts, keys))   # ties: B first
        keys, ts, isb = keys[order], ts[order], isb[order]
        a_ts = np.where(isb == 0, ts, int_min)
        prev_a = (pd.Series(a_ts).groupby(pd.Series(keys), sort=False)
                  .cummax().to_numpy())
        hit = (isb == 1) & (prev_a != int_min) & (ts - prev_a <= window_us)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        seg_id = np.cumsum(new_key) - 1
        n_seg = int(seg_id[-1]) + 1
        n_b = np.bincount(seg_id, weights=isb, minlength=n_seg).astype(np.int64)
        n_a = np.bincount(seg_id, minlength=n_seg).astype(np.int64) - n_b
        conv = np.zeros(n_seg, dtype=bool)
        conv[seg_id[hit]] = True
        return pa.table({
            key_column: pa.array(keys[new_key], type=group[key_column].type),
            "n_a": pa.array(n_a),
            "n_b": pa.array(n_b),
            "converted": pa.array(conv),
        })

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(partition_funnel, batch_format="pyarrow")
    )


def transition_counts(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    type_column: str,
    tiebreak_column: str,
    *,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Event-sequence transition matrix: for each key's timeline
    ordered by ``(ts, tiebreak)``, count consecutive event-type pairs —
    SQL ``lead(type) OVER (PARTITION BY key ORDER BY ts, tiebreak)``
    then ``GROUP BY (from, to)``.  The unique tiebreak column makes the
    per-key order (and thus the counts) deterministic under ties.

    Scale shape: sessionize-style coarse hash partitions (a key's rows
    land together), ONE lexsort per partition, dictionary-encoded type
    pairs counted with a single ``bincount`` — each partition emits at
    most ``|types|²`` partial rows, summed by a tiny grouped aggregate.
    """

    def add_pkey(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
        return pa.table({
            key_column: batch[key_column],
            "_ts_us": pc.cast(batch[ts_column], pa.int64()),
            "_tb": pc.cast(batch[tiebreak_column], pa.int64()),
            type_column: batch[type_column],
            "_pkey": pa.array(pk.astype(np.int32)),
        })

    def partition_transitions(group: pa.Table) -> pa.Table:
        empty = pa.table({"from_type": pa.array([], pa.string()),
                          "to_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        n = len(group)
        if n < 2:
            return empty
        keys = np.asarray(group[key_column], dtype=np.int64)
        ts = np.asarray(group["_ts_us"], dtype=np.int64)
        tb = np.asarray(group["_tb"], dtype=np.int64)
        types = np.asarray(group[type_column].combine_chunks())
        order = np.lexsort((tb, ts, keys))
        keys, types = keys[order], types[order]
        vocab, code = np.unique(types, return_inverse=True)
        k = len(vocab)
        adj = keys[1:] == keys[:-1]
        pair = code[:-1][adj] * k + code[1:][adj]
        if not len(pair):
            return empty
        cnt = np.bincount(pair, minlength=k * k)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "from_type": pa.array(vocab[nz // k], type=pa.string()),
            "to_type": pa.array(vocab[nz % k], type=pa.string()),
            "n": pa.array(cnt[nz], type=pa.int64()),
        })

    partials = (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(partition_transitions, batch_format="pyarrow")
    )
    return grouped_agg(partials, ["from_type", "to_type"],
                       [("n", "n", "sum")])


def interarrival_hist(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    tiebreak_column: str,
    *,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Inter-arrival-time histogram: per key, the deltas between
    consecutive timestamps (ordered by ``(ts, tiebreak)``) bucketed by
    BIT LENGTH of the µs delta (log₂ buckets, bucket 0 = simultaneous)
    and counted — the burstiness / polling-cadence profile of an event
    stream, SQL ``lag`` + ``length(bin(delta))`` semantics.

    Integer-exact bucketing: ``np.frexp`` exponents equal DuckDB
    ``length(bin(x))`` for every positive int < 2⁵³ (both are
    ⌊log₂x⌋+1), so the histogram hash-matches a window-function
    oracle.  Scale shape: sessionize-style coarse hash partitions, ONE
    lexsort + vectorized diff per partition, ≤64 partial rows each,
    summed by a tiny grouped aggregate.
    """

    def add_pkey(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
        return pa.table({
            key_column: batch[key_column],
            "_ts_us": pc.cast(batch[ts_column], pa.int64()),
            "_tb": pc.cast(batch[tiebreak_column], pa.int64()),
            "_pkey": pa.array(pk.astype(np.int32)),
        })

    def partition_hist(group: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        n = len(group)
        if n < 2:
            return empty
        keys = np.asarray(group[key_column], dtype=np.int64)
        ts = np.asarray(group["_ts_us"], dtype=np.int64)
        tb = np.asarray(group["_tb"], dtype=np.int64)
        order = np.lexsort((tb, ts, keys))
        keys, ts = keys[order], ts[order]
        adj = keys[1:] == keys[:-1]
        delta = (ts[1:] - ts[:-1])[adj]
        if not len(delta):
            return empty
        bucket = np.frexp(delta.astype(np.float64))[1].astype(np.int64)
        cnt = np.bincount(bucket, minlength=1)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    partials = (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(partition_hist, batch_format="pyarrow")
    )
    return grouped_agg(partials, ["bucket"], [("n", "n", "sum")])


def grouped_distinct_count(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Exact per-key COUNT(DISTINCT value): each batch dedups to
    distinct ``(keys, value)`` pairs before the exchange (the shuffle
    carries per-block distinct pairs, not rows), then one reducer per
    key counts unique values with a vectorized ``np.unique``.  The
    approximate counterpart at extreme per-key cardinality is the
    grouped HLL build (``pipelines.build.build_grouped_sketches``); this
    is the exact one-shuffle oracle for it.  Returns ``{keys,
    n_distinct}``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[value_col]))  # SQL skips NULLs
        g = batch.select(keys + [value_col]).group_by(
            keys + [value_col]).aggregate([])
        return g.rename_columns(keys + [value_col])

    partials = ds.map_batches(
        partial, batch_size=batch_size, batch_format="pyarrow",
        zero_copy_batch=True)

    def per_group(group: pa.Table) -> pa.Table:
        vals = np.asarray(group[value_col].combine_chunks())
        cols = {k: group[k].slice(0, 1) for k in keys}
        cols["n_distinct"] = pa.array([len(np.unique(vals))], type=pa.int64())
        return pa.table(cols)

    return partials.groupby(keys).map_groups(per_group, batch_format="pyarrow")


def grouped_percentile_disc(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    qs: list[float],
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Exact per-group discrete percentiles of an INTEGER column — SQL
    ``percentile_disc(q) WITHIN GROUP (ORDER BY v)``: the smallest
    value whose cumulative distribution ≥ q, i.e. 1-based rank
    ``ceil(q·n)`` (verified against DuckDB's semantics).

    Same scale shape as :func:`grouped_ntile_stats`: percentiles of the
    sorted multiset ignore row identity, so batches pre-aggregate to
    distinct ``(keys, value, count)`` rows and only those shuffle; the
    reducer rebuilds each rank with one ``searchsorted`` over weighted
    prefix counts.  Output: one row per group with a ``p<q>`` int64
    column per requested percentile.
    """
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("qs must be in (0, 1]")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(keys + [value_col]).group_by(
            keys + [value_col]).aggregate([([], "count_all")])
        return g.rename_columns(keys + [value_col, "cnt"])

    partials = ds.map_batches(
        partial, batch_size=batch_size, batch_format="pyarrow",
        zero_copy_batch=True)

    names = [f"p{str(q).replace('0.', '').replace('.', '_')}" for q in qs]

    def per_group(group: pa.Table) -> pa.Table:
        vals = np.asarray(group[value_col], dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        vals = vals[order]
        cnt = np.asarray(group["cnt"], dtype=np.int64)[order]
        uniq = np.empty(len(vals), dtype=bool)
        uniq[0] = True
        uniq[1:] = vals[1:] != vals[:-1]
        seg = np.cumsum(uniq) - 1
        u_vals = vals[uniq]
        u_cnt = np.zeros(len(u_vals), dtype=np.int64)
        np.add.at(u_cnt, seg, cnt)
        cum = np.cumsum(u_cnt)
        n = int(cum[-1])
        ranks = np.ceil(np.asarray(qs, dtype=np.float64) * n).astype(np.int64)
        idx = np.searchsorted(cum, ranks, side="left")
        cols = {k: group[k].slice(0, 1) for k in keys}
        for name, i in zip(names, idx):
            cols[name] = pa.array([int(u_vals[i])], type=pa.int64())
        return pa.table(cols)

    return partials.groupby(keys).map_groups(per_group, batch_format="pyarrow")


def cohort_retention(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    *,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Cohort retention matrix: bucket each key by its FIRST activity
    week (Monday-start, Arrow ``floor_temporal`` == DuckDB
    ``date_trunc('week')``), then count distinct keys active per
    (cohort_week, activity_week) pair.

    Scale shape: week truncation happens in-batch, keys hash-bucket
    into coarse partitions so each key's full history co-locates; ONE
    lexsort per partition yields the per-key first week (segment head)
    and the distinct (key, week) pairs (run boundaries) — the partition
    emits pre-counted (cohort, week, n) rows, at most ``weeks²`` each,
    into a tiny grouped sum.  Returns ``{cohort_week, activity_week,
    n_users}`` with timestamp-us week columns.
    """

    def add_pkey(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
        return pa.table({
            key_column: batch[key_column],
            "_wk_us": pc.cast(pc.floor_temporal(batch[ts_column], unit="week"),
                              pa.int64()),
            "_pkey": pa.array(pk.astype(np.int32)),
        })

    def partition_cohorts(group: pa.Table) -> pa.Table:
        empty = pa.table({"_cw": pa.array([], pa.int64()),
                          "_aw": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        n = len(group)
        if n == 0:
            return empty
        keys = np.asarray(group[key_column], dtype=np.int64)
        wk = np.asarray(group["_wk_us"], dtype=np.int64)
        order = np.lexsort((wk, keys))
        keys, wk = keys[order], wk[order]
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        seg_id = np.cumsum(new_key) - 1
        cohort = wk[new_key]                      # first (min) week per key
        new_pair = new_key.copy()
        new_pair[1:] |= wk[1:] != wk[:-1]         # distinct (key, week) runs
        pair_cw = cohort[seg_id[new_pair]]
        pair_aw = wk[new_pair]
        cw_vals, cw_code = np.unique(pair_cw, return_inverse=True)
        aw_vals, aw_code = np.unique(pair_aw, return_inverse=True)
        cnt = np.bincount(cw_code * len(aw_vals) + aw_code,
                          minlength=len(cw_vals) * len(aw_vals))
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "_cw": pa.array(cw_vals[nz // len(aw_vals)], type=pa.int64()),
            "_aw": pa.array(aw_vals[nz % len(aw_vals)], type=pa.int64()),
            "n": pa.array(cnt[nz], type=pa.int64()),
        })

    partials = (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(partition_cohorts, batch_format="pyarrow")
    )
    summed = grouped_agg(partials, ["_cw", "_aw"], [("n_users", "n", "sum")])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_week": pc.cast(batch["_cw"], pa.timestamp("us")),
            "activity_week": pc.cast(batch["_aw"], pa.timestamp("us")),
            "n_users": batch["n_users"],
        })

    return summed.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def grouped_grouping_sets(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: list[tuple[str, str | None, AggKind]],
    sets: list[list[str]],
    *,
    all_label: str = "ALL",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL ``GROUP BY GROUPING SETS`` (and thus CUBE = all subsets)
    from ONE scan: like :func:`grouped_rollup`, the finest level is a
    single exact :func:`grouped_agg` over the input and every requested
    set re-aggregates that tiny fine table — arbitrary sets, no extra
    input scans.  Aggregate kinds must be re-aggregable (count/sum →
    sum, min → min, max → max); suppressed key columns carry
    ``all_label`` (keys must be strings).
    """
    for _, _, kind in aggs:
        if kind not in _ROLLUP_REAGG:
            raise ValueError(
                f"grouped_grouping_sets: kind {kind!r} is not re-aggregable")
    seen = set()
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s!r} not a subset of keys")
        t = tuple(sorted(s))
        if t in seen:
            raise ValueError(f"duplicate grouping set {s!r}")
        seen.add(t)

    fine = grouped_agg(ds, keys, aggs, batch_size=batch_size).materialize()
    reagg = [(out, out, _ROLLUP_REAGG[kind]) for out, _, kind in aggs]
    out_names = [out for out, _, _ in aggs]

    def fill_all(level_keys: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {}
            for k in keys:
                cols[k] = (batch[k] if k in level_keys
                           else pa.array([all_label] * n, type=pa.string()))
            for o in out_names:
                cols[o] = batch[o]
            return pa.table(cols)
        return fn

    def add_const(batch: pa.Table) -> pa.Table:
        return batch.append_column("_all", pa.array([all_label] * len(batch),
                                                    type=pa.string()))

    levels = []
    for s in sets:
        if set(s) == set(keys):
            lvl = fine
        elif s:
            lvl = grouped_agg(fine, list(s), reagg, batch_size=batch_size)
        else:
            lvl = grouped_agg(
                fine.map_batches(add_const, batch_format="pyarrow",
                                 zero_copy_batch=True),
                ["_all"], reagg, batch_size=batch_size
            ).drop_columns(["_all"])
        levels.append(lvl.map_batches(fill_all(list(s)), batch_format="pyarrow",
                                      zero_copy_batch=True))
    return levels[0] if len(levels) == 1 else levels[0].union(*levels[1:])


def snapshot_diff(
    old_ds: "ray.data.Dataset",
    new_ds: "ray.data.Dataset",
    key_column: str,
    value_columns: list[str],
    *,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Change-data-capture between two keyed snapshots: one row per key
    whose state differs — ``change ∈ {added, removed, changed}``
    (unchanged keys are dropped).  Keys must be unique within each
    snapshot (a keyed table).

    Scale shape: each side reduces in-batch to ``(key, h, side)`` where
    ``h`` is a 128-bit content hash of the value columns (canonical
    ``'\\x1f'``-joined string form) — full rows never shuffle, just 24
    bytes per key.  Keys hash-bucket into coarse partitions; each
    partition lexsorts (key, side) once and classifies every ≤2-row
    segment vectorized.  Equality via 128-bit mmh3 — collision odds are
    ~2⁻¹²⁸ per pair, far below any storage-layer error rate.
    """
    from ..hashing import mmh3_128_batch

    def partial(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            cols = [pc.cast(batch[c], pa.string()) for c in value_columns]
            joined = pc.binary_join_element_wise(
                *[pc.fill_null(c, "\x00") for c in cols], "\x1f")
            h1, h2 = mmh3_128_batch(joined.combine_chunks())
            k = np.asarray(batch[key_column], dtype=np.int64).astype(np.uint64)
            with np.errstate(over="ignore"):
                pk = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
            return pa.table({
                key_column: batch[key_column],
                "_h1": pa.array(h1.view(np.int64)),
                "_h2": pa.array(h2.view(np.int64)),
                "_side": pa.array(np.full(len(batch), side, dtype=np.int8)),
                "_pkey": pa.array(pk.astype(np.int32)),
            })
        return fn

    tagged = old_ds.map_batches(
        partial(0), batch_format="pyarrow", zero_copy_batch=True).union(
        new_ds.map_batches(partial(1), batch_format="pyarrow",
                           zero_copy_batch=True))

    def classify(group: pa.Table) -> pa.Table:
        n = len(group)
        empty = pa.table({key_column: pa.array([], group[key_column].type),
                          "change": pa.array([], pa.string())})
        if n == 0:
            return empty
        keys = np.asarray(group[key_column], dtype=np.int64)
        h1 = np.asarray(group["_h1"], dtype=np.int64)
        h2 = np.asarray(group["_h2"], dtype=np.int64)
        side = np.asarray(group["_side"], dtype=np.int8)
        order = np.lexsort((side, keys))
        keys, h1, h2, side = keys[order], h1[order], h2[order], side[order]
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new_key)
        sizes = np.diff(np.append(starts, n))
        if sizes.max(initial=0) > 2:
            raise ValueError("snapshot_diff: duplicate key within a snapshot")
        uniq = keys[starts]
        single = sizes == 1
        # singles: side decides; pairs: sorted (old, new) — compare hashes
        change = np.empty(len(uniq), dtype=object)
        change[single & (side[starts] == 0)] = "removed"
        change[single & (side[starts] == 1)] = "added"
        pair = ~single
        ps = starts[pair]
        if len(ps) and not ((side[ps] == 0) & (side[ps + 1] == 1)).all():
            raise ValueError("snapshot_diff: duplicate key within a snapshot")
        same = (h1[ps] == h1[ps + 1]) & (h2[ps] == h2[ps + 1])
        change[pair] = np.where(same, "", "changed")
        keep = change != ""
        return pa.table({
            key_column: pa.array(uniq[keep], type=group[key_column].type),
            "change": pa.array(change[keep].astype("U"), type=pa.string()),
        })

    return tagged.groupby("_pkey").map_groups(classify, batch_format="pyarrow")


def grouped_mad(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Exact per-group median + median-absolute-deviation of an INTEGER
    column, matching DuckDB ``median``/``mad`` (interpolated
    ``quantile_cont(0.5)``, combined as ``a*(1-frac)+b*frac`` — the
    exact expression DuckDB evaluates; numpy's ``a+(b-a)*frac`` differs
    by an ULP and fails hash compare).

    Same shuffle as :func:`grouped_ntile_stats`: only distinct
    ``(keys, value, count)`` rows cross the exchange; the reducer
    computes BOTH medians from that array — deviations of the distinct
    values from the median re-sort and re-combine without ever
    expanding the multiset.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(keys + [value_col]).group_by(
            keys + [value_col]).aggregate([([], "count_all")])
        return g.rename_columns(keys + [value_col, "cnt"])

    partials = ds.map_batches(
        partial, batch_size=batch_size, batch_format="pyarrow",
        zero_copy_batch=True)

    def _wmedian(vals: np.ndarray, cnt: np.ndarray) -> float:
        # DuckDB quantile_cont(0.5) over the expanded multiset
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        p = (n - 1) * 0.5
        lo = int(np.floor(p))
        frac = p - lo
        a = float(vals[np.searchsorted(cum, lo, side="right")])
        if frac == 0.0:
            return a
        b = float(vals[np.searchsorted(cum, lo + 1, side="right")])
        return a * (1.0 - frac) + b * frac

    def per_group(group: pa.Table) -> pa.Table:
        vals = np.asarray(group[value_col], dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        vals = vals[order]
        cnt = np.asarray(group["cnt"], dtype=np.int64)[order]
        uniq = np.empty(len(vals), dtype=bool)
        uniq[0] = True
        uniq[1:] = vals[1:] != vals[:-1]
        seg = np.cumsum(uniq) - 1
        u_vals = vals[uniq].astype(np.float64)
        u_cnt = np.zeros(len(u_vals), dtype=np.int64)
        np.add.at(u_cnt, seg, cnt)

        med = _wmedian(u_vals, u_cnt)
        dev = np.abs(u_vals - med)
        d_order = np.argsort(dev, kind="stable")
        dev, d_cnt = dev[d_order], u_cnt[d_order]
        d_uniq = np.empty(len(dev), dtype=bool)
        d_uniq[0] = True
        d_uniq[1:] = dev[1:] != dev[:-1]
        d_seg = np.cumsum(d_uniq) - 1
        ud = dev[d_uniq]
        ud_cnt = np.zeros(len(ud), dtype=np.int64)
        np.add.at(ud_cnt, d_seg, d_cnt)
        mad = _wmedian(ud, ud_cnt)

        cols = {k: group[k].slice(0, 1) for k in keys}
        cols["med"] = pa.array([med], type=pa.float64())
        cols["mad"] = pa.array([mad], type=pa.float64())
        return pa.table(cols)

    return partials.groupby(keys).map_groups(per_group, batch_format="pyarrow")


def session_stats(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    gap_seconds: float,
    *,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Gaps-and-islands session DURATION statistics: per key, the
    session count plus the sum and max of session durations (last event
    − first event, microseconds — exact integers).  A single-event
    session has duration 0.

    Same partition shape as :func:`sessionize_count`; on top of the
    session-start mask, one ``reduceat``-free pass derives every
    session's first/last timestamp via the boundary indices and
    ``bincount``s the per-key aggregates — no per-session Python.
    """
    gap_us = int(gap_seconds * 1_000_000)

    def add_pkey(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
        return pa.table({
            key_column: batch[key_column],
            "_ts_us": pc.cast(batch[ts_column], pa.int64()),
            "_pkey": pa.array(pk.astype(np.int32)),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        n = len(group)
        empty = pa.table({key_column: pa.array([], group[key_column].type),
                          "n_sessions": pa.array([], pa.int64()),
                          "sum_dur_us": pa.array([], pa.int64()),
                          "max_dur_us": pa.array([], pa.int64())})
        if n == 0:
            return empty
        keys = np.asarray(group[key_column], dtype=np.int64)
        ts = np.asarray(group["_ts_us"], dtype=np.int64)
        order = np.lexsort((ts, keys))
        keys, ts = keys[order], ts[order]
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        brk = np.zeros(n, dtype=bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap_us
        s_start = new_key | brk
        starts = np.flatnonzero(s_start)
        ends = np.append(starts[1:], n) - 1
        dur = ts[ends] - ts[starts]
        sess_key_seg = (np.cumsum(new_key) - 1)[starts]
        n_keys = int(sess_key_seg[-1]) + 1
        n_sessions = np.bincount(sess_key_seg, minlength=n_keys)
        sum_dur = np.bincount(sess_key_seg, weights=dur,
                              minlength=n_keys).astype(np.int64)
        max_dur = np.zeros(n_keys, dtype=np.int64)
        np.maximum.at(max_dur, sess_key_seg, dur)
        return pa.table({
            key_column: pa.array(keys[new_key], type=group[key_column].type),
            "n_sessions": pa.array(n_sessions.astype(np.int64)),
            "sum_dur_us": pa.array(sum_dur),
            "max_dur_us": pa.array(max_dur),
        })

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(per_partition, batch_format="pyarrow")
    )


def session_intervals(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    gap_seconds: float,
    *,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Materialized gaps-and-islands sessions as intervals:
    ``{key, start_us, end_us}`` (first/last event, exact integer µs).
    Partition machinery identical to :func:`session_stats`."""
    gap_us = int(gap_seconds * 1_000_000)

    def add_pkey(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
        return pa.table({
            key_column: batch[key_column],
            "_ts_us": pc.cast(batch[ts_column], pa.int64()),
            "_pkey": pa.array(pk.astype(np.int32)),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return pa.table({key_column: pa.array([], group[key_column].type),
                             "start_us": pa.array([], pa.int64()),
                             "end_us": pa.array([], pa.int64())})
        keys = np.asarray(group[key_column], dtype=np.int64)
        ts = np.asarray(group["_ts_us"], dtype=np.int64)
        order = np.lexsort((ts, keys))
        keys, ts = keys[order], ts[order]
        s_start = np.ones(n, dtype=bool)
        s_start[1:] = (keys[1:] != keys[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.flatnonzero(s_start)
        ends = np.append(starts[1:], n) - 1
        return pa.table({
            key_column: pa.array(keys[starts], type=group[key_column].type),
            "start_us": pa.array(ts[starts]),
            "end_us": pa.array(ts[ends]),
        })

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(per_partition, batch_format="pyarrow")
    )


def max_concurrent_intervals(
    intervals: "ray.data.Dataset",
    *,
    start_col: str = "start_us",
    end_col: str = "end_us",
    batch_size: int = 65536,
) -> int:
    """Peak number of simultaneously-active CLOSED intervals — the
    interval-scheduling sweep, distributed.

    Tie-order-free formulation: each interval contributes +1 at
    ``start`` and −1 at ``end + 1``; deltas are NETTED per timestamp
    (a grouped sum — order within a timestamp can no longer matter),
    the netted series is range-sorted by Ray, and each sorted block
    reduces to 3 scalars ``(min_t, Σd, max-prefix)``.  The driver then
    combines O(blocks) scalars — offsets are the running block sums,
    the answer ``max(offset + max-prefix)`` — a two-phase prefix scan
    with no global materialization of the series.
    """

    def deltas(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[start_col], dtype=np.int64)
        e = np.asarray(batch[end_col], dtype=np.int64) + 1
        return pa.table({
            "t": pa.array(np.concatenate([s, e])),
            "delta": pa.array(np.concatenate([
                np.ones(len(s), dtype=np.int64),
                -np.ones(len(e), dtype=np.int64)])),
        })

    net = grouped_agg(
        intervals.map_batches(deltas, batch_size=batch_size,
                              batch_format="pyarrow", zero_copy_batch=True),
        ["t"], [("d", "delta", "sum")])

    def block_stats(batch: pa.Table) -> pa.Table:
        t = np.asarray(batch["t"], dtype=np.int64)
        d = np.asarray(batch["d"], dtype=np.int64)
        order = np.argsort(t, kind="stable")   # sort() range-partitions;
        d = d[order]                            # ensure within-block order
        cum = np.cumsum(d)
        return pa.table({
            "min_t": pa.array([int(t.min())], type=pa.int64()),
            "total": pa.array([int(d.sum())], type=pa.int64()),
            "max_prefix": pa.array([int(cum.max())], type=pa.int64()),
        })

    stats = sorted(
        net.sort("t").map_batches(block_stats, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all(),
        key=lambda r: r["min_t"])
    best, offset = 0, 0
    for r in stats:
        best = max(best, offset + r["max_prefix"])
        offset += r["total"]
    return int(best)


def partitioned_range_count(
    facts: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    ts_column: str,
    *,
    key_column: str = "interval_id",
    lo_column: str = "lo",
    hi_column: str = "hi",
    out_column: str = "n_events",
    bucket_width: int,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Large-large interval (range) join, aggregate form: count fact
    rows whose int64 ``ts_column`` falls in each half-open ``[lo, hi)``
    of an interval Dataset too big to broadcast — the shuffle
    counterpart of :func:`broadcast_range_count` (same semantics,
    pytest parity).

    Scale shape — time-bucket replication, the standard distributed
    range-join plan: each interval replicates to the ``⌈len/W⌉ + 1``
    buckets of width ``bucket_width`` it overlaps (choose W ≈ the
    typical interval length so replication stays ~2×); each fact row
    maps to exactly ONE bucket.  Both sides flow through one unified
    null-free schema (side flag — no Ray join operator), co-locate via
    a single groupby, and every bucket resolves all its intervals with
    two vectorized searchsorted probes over its sorted fact
    timestamps, clipped to the bucket so a fact is never counted twice
    for the same interval.  Per-interval partials (≤ buckets-spanned
    rows each) merge in a final pre-combined grouped sum.  Overlapping
    intervals each count independently; zero-match intervals are
    absent from the output (outer-join a key list for zeros).
    """
    W = int(bucket_width)
    if W <= 0:
        raise ValueError("bucket_width must be positive")

    def explode_intervals(batch: pa.Table) -> pa.Table:
        lo = np.asarray(batch[lo_column], dtype=np.int64)
        hi = np.asarray(batch[hi_column], dtype=np.int64)
        key = np.asarray(batch[key_column], dtype=np.int64)
        keep = hi > lo
        lo, hi, key = lo[keep], hi[keep], key[keep]
        b0 = lo // W
        b1 = (hi - 1) // W  # last bucket containing any covered instant
        reps = (b1 - b0 + 1).astype(np.int64)
        bucket = np.repeat(b0, reps)
        # within-interval bucket offsets 0..reps-1, vectorized
        offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        bucket = bucket + offs
        return pa.table({
            "bucket": pa.array(bucket, type=pa.int64()),
            "side": pa.array(np.zeros(len(bucket), dtype=np.int8)),
            "k": pa.array(np.repeat(key, reps), type=pa.int64()),
            "lo": pa.array(np.repeat(lo, reps), type=pa.int64()),
            "hi": pa.array(np.repeat(hi, reps), type=pa.int64()),
        })

    def tag_facts(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch[ts_column].combine_chunks(), pa.int64()),
                        dtype=np.int64)
        return pa.table({
            "bucket": pa.array(ts // W, type=pa.int64()),
            "side": pa.array(np.ones(len(ts), dtype=np.int8)),
            "k": pa.array(np.zeros(len(ts), dtype=np.int64)),
            "lo": pa.array(ts, type=pa.int64()),  # fact ts rides the lo slot
            "hi": pa.array(np.zeros(len(ts), dtype=np.int64)),
        })

    iv = intervals.map_batches(explode_intervals, batch_size=batch_size,
                               batch_format="pyarrow", zero_copy_batch=True)
    fc = facts.map_batches(tag_facts, batch_size=batch_size,
                           batch_format="pyarrow", zero_copy_batch=True)

    def close_bucket(group: pa.Table) -> pa.Table:
        side = np.asarray(group["side"], dtype=np.int8)
        is_fact = side == 1
        ts = np.sort(np.asarray(group["lo"], dtype=np.int64)[is_fact])
        n_iv = int((~is_fact).sum())
        if n_iv == 0 or ts.size == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        bucket = int(group["bucket"][0].as_py())
        b_lo, b_hi = bucket * W, (bucket + 1) * W
        key = np.asarray(group["k"], dtype=np.int64)[~is_fact]
        lo = np.asarray(group["lo"], dtype=np.int64)[~is_fact]
        hi = np.asarray(group["hi"], dtype=np.int64)[~is_fact]
        c = (np.searchsorted(ts, np.minimum(hi, b_hi), side="left")
             - np.searchsorted(ts, np.maximum(lo, b_lo), side="left"))
        keep = c > 0
        return pa.table({"k": pa.array(key[keep], type=pa.int64()),
                         "c": pa.array(c[keep], type=pa.int64())})

    partials = iv.union(fc).groupby("bucket").map_groups(
        close_bucket, batch_format="pyarrow")
    out = grouped_agg(partials, ["k"], [(out_column, "c", "sum")])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({key_column: batch["k"], out_column: batch[out_column]})

    return out.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def topk_rows(ds: "ray.data.Dataset", sort_keys: list[tuple[str, str]],
              k: int) -> pa.Table:
    """Global top-k ROWS by composite sort key without a global sort:
    every block reduces to its own top-k with one ``pc.sort_indices``
    (all column types + per-key direction supported), and only the
    ≤ k·blocks candidate rows reach the driver for the final pick —
    the all-to-all Sort operator never runs.  ``sort_keys`` =
    [(column, "ascending" | "descending"), ...], SQL ORDER BY … LIMIT k
    semantics (ties broken by the full key list; add a unique column
    for determinism).  Returns a pyarrow Table (k is driver-sized by
    contract)."""
    keys = [(c, d) for c, d in sort_keys]

    def local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        idx = pc.sort_indices(batch, sort_keys=keys)
        return batch.take(idx.slice(0, k))

    sch = getattr(ds.schema(), "base_schema", ds.schema())
    cand = ds.map_batches(local_topk, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    if not cand:
        return pa.table({f.name: pa.array([], f.type) for f in sch})
    tbl = pa.Table.from_pylist(cand, schema=sch)
    idx = pc.sort_indices(tbl, sort_keys=keys)
    return tbl.take(idx.slice(0, k))


def grouped_trimmed_stats(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    *,
    trim_tenths: int = 1,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Exact per-group TRIMMED statistics over an INTEGER value column:
    drop the lowest and highest ``floor(n·trim_tenths/10)`` ranks of
    the sorted multiset, return the surviving row count and exact
    int64 value sum (robust central tendency without float division —
    the caller divides; companion to grouped_mad / grouped_ntile_stats).

    Scale shape: identical to the NTILE path — only distinct
    ``(keys, value, count)`` rows shuffle; per group, the trimmed sum
    is reconstructed from weighted prefix sums with each distinct
    value contributing ``clip(min(cum, hi) − max(cum − c, lo), 0)``
    occurrences, so ties are handled exactly without expansion.
    Trim ranks are integer (``n·trim_tenths // 10``), SQL-mirrorable.
    """
    if not 0 <= trim_tenths < 5:
        raise ValueError("trim_tenths must be in [0, 5)")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(keys + [value_col]).group_by(
            keys + [value_col]).aggregate([([], "count_all")])
        return g.rename_columns(keys + [value_col, "cnt"])

    partials = ds.map_batches(
        partial, batch_size=batch_size, batch_format="pyarrow",
        zero_copy_batch=True)

    def per_group(group: pa.Table) -> pa.Table:
        vals = np.asarray(group[value_col], dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        vals = vals[order]
        cnt = np.asarray(group["cnt"], dtype=np.int64)[order]
        uniq = np.empty(len(vals), dtype=bool)
        uniq[0] = True
        uniq[1:] = vals[1:] != vals[:-1]
        seg = np.cumsum(uniq) - 1
        u_vals = vals[uniq]
        u_cnt = np.zeros(len(u_vals), dtype=np.int64)
        np.add.at(u_cnt, seg, cnt)
        cum = np.cumsum(u_cnt)
        n = int(cum[-1])
        lo = n * trim_tenths // 10
        hi = n - lo
        take = np.clip(np.minimum(cum, hi) - np.maximum(cum - u_cnt, lo), 0, None)
        cols = {kk: group[kk].slice(0, 1) for kk in keys}
        cols["n_kept"] = pa.array([int(take.sum())], type=pa.int64())
        cols["trimmed_sum"] = pa.array([int((take * u_vals).sum())],
                                       type=pa.int64())
        return pa.table(cols)

    return partials.groupby(keys).map_groups(per_group, batch_format="pyarrow")


def interval_overlap_pairs(
    intervals: "ray.data.Dataset",
    key_column: str,
    *,
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_width: int,
    out_column: str = "n_overlaps",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Self interval-overlap join: count, per unordered key pair
    ``(u1 < u2)``, how many interval pairs from the two keys overlap
    (CLOSED intervals: ``a.start <= b.end AND b.start <= a.end``) —
    the pair-emitting counterpart of :func:`max_concurrent_intervals`
    and the self-join counterpart of :func:`partitioned_range_count`.

    Scale shape — time-bucket replication with start-bucket pair
    attribution: each interval replicates to every width-``W`` bucket
    it covers; inside a bucket a single start-sorted sweep keeps an
    active set (numpy arrays, lazily compacted) and emits each
    overlapping pair against the LATER-starting interval, but only in
    the bucket containing that later start — since the earlier
    interval must still be alive there, both sides are guaranteed
    co-located and the pair is emitted exactly once globally with no
    cross-bucket dedup shuffle.  Per-bucket pair counts pre-aggregate
    (lexsort + reduceat) before the final grouped sum, so only
    distinct ``(u1, u2, count)`` rows shuffle.  Work is
    output-bounded: the sweep touches each active interval only while
    it can still overlap.  Choose ``bucket_width`` ≈ the typical
    interval length so replication stays ~2×.
    """
    W = int(bucket_width)
    if W <= 0:
        raise ValueError("bucket_width must be positive")

    def replicate(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64)
        s = np.asarray(batch[start_col], dtype=np.int64)
        e = np.asarray(batch[end_col], dtype=np.int64)
        keep = e >= s
        k, s, e = k[keep], s[keep], e[keep]
        b0 = s // W
        reps = (e // W - b0 + 1).astype(np.int64)
        bucket = np.repeat(b0, reps) + (
            np.arange(int(reps.sum()), dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])), reps))
        return pa.table({
            "bucket": pa.array(bucket, type=pa.int64()),
            "k": pa.array(np.repeat(k, reps), type=pa.int64()),
            "s": pa.array(np.repeat(s, reps), type=pa.int64()),
            "e": pa.array(np.repeat(e, reps), type=pa.int64()),
        })

    def sweep_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table({"u1": pa.array([], pa.int64()),
                          "u2": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        n = len(group)
        if n < 2:
            return empty
        b_lo = int(group["bucket"][0].as_py()) * W
        k = np.asarray(group["k"], dtype=np.int64)
        s = np.asarray(group["s"], dtype=np.int64)
        e = np.asarray(group["e"], dtype=np.int64)
        order = np.lexsort((k, s))
        k, s, e = k[order], s[order], e[order]
        emits = s >= b_lo  # later start lives in THIS bucket → attribute here
        act_k = np.empty(n, dtype=np.int64)
        act_e = np.empty(n, dtype=np.int64)
        n_act = 0
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for i in range(n):
            if n_act:
                alive = act_e[:n_act] >= s[i]
                if not alive.all():  # compact: drop dead intervals
                    m = int(alive.sum())
                    act_k[:m] = act_k[:n_act][alive]
                    act_e[:m] = act_e[:n_act][alive]
                    n_act = m
                if n_act and emits[i]:
                    partner = act_k[:n_act]
                    partner = partner[partner != k[i]]
                    if partner.size:
                        me = np.full(partner.size, k[i], dtype=np.int64)
                        out_a.append(np.minimum(partner, me))
                        out_b.append(np.maximum(partner, me))
            act_k[n_act] = k[i]
            act_e[n_act] = e[i]
            n_act += 1
        if not out_a:
            return empty
        u1 = np.concatenate(out_a)
        u2 = np.concatenate(out_b)
        order = np.lexsort((u2, u1))
        u1, u2 = u1[order], u2[order]
        first = np.empty(len(u1), dtype=bool)
        first[0] = True
        first[1:] = (u1[1:] != u1[:-1]) | (u2[1:] != u2[:-1])
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(u1)))
        return pa.table({"u1": pa.array(u1[starts]),
                         "u2": pa.array(u2[starts]),
                         "cnt": pa.array(cnt.astype(np.int64))})

    pairs = (
        intervals.map_batches(replicate, batch_size=batch_size,
                              batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(sweep_bucket, batch_format="pyarrow")
    )
    return grouped_agg(pairs, ["u1", "u2"], [(out_column, "cnt", "sum")])


def skyline_2d(
    ds: "ray.data.Dataset",
    min_col: str,
    max_col: str,
    *,
    batch_size: int = 65536,
) -> pa.Table:
    """2-D skyline (Pareto frontier): the DISTINCT points not dominated
    by any other point, where ``p`` dominates ``q`` iff
    ``p.min_col <= q.min_col AND p.max_col >= q.max_col`` with at least
    one strict — the classic minimize-one / maximize-other dominance
    query (Börzsönyi et al., "The Skyline Operator", ICDE 2001).

    Scale shape: dominance is closed under union — ``skyline(S) =
    skyline(∪ skyline(block_i))`` — so every block reduces to its own
    frontier with one vectorized lexsort + shifted running max (no
    quadratic dominance test anywhere), and only frontier-sized
    candidate sets reach the driver for one final identical pass.  A
    frontier over a 2-D numeric domain is bounded by the number of
    distinct ``min_col`` values, orders of magnitude below the input;
    no shuffle at all.  Returns a pyarrow Table sorted by ``min_col``
    ascending (columns named after the inputs).
    """

    def _frontier(p: np.ndarray, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # dedupe identical points, sort by (p asc, q desc)
        order = np.lexsort((-q, p))
        p, q = p[order], q[order]
        if p.size == 0:
            return p, q
        prevmax = np.empty(len(q), dtype=np.float64)
        prevmax[0] = -np.inf
        np.maximum.accumulate(q[:-1], out=prevmax[1:])
        keep = q > prevmax
        return p[keep], q[keep]

    def local_sky(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch[min_col], dtype=np.float64)
        q = np.asarray(batch[max_col], dtype=np.float64)
        fp, fq = _frontier(p, q)
        return pa.table({min_col: pa.array(fp, type=pa.float64()),
                         max_col: pa.array(fq, type=pa.float64())})

    cand = ds.map_batches(local_sky, batch_size=batch_size,
                          batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    if not cand:
        return pa.table({min_col: pa.array([], pa.float64()),
                         max_col: pa.array([], pa.float64())})
    p = np.array([r[min_col] for r in cand], dtype=np.float64)
    q = np.array([r[max_col] for r in cand], dtype=np.float64)
    fp, fq = _frontier(p, q)
    return pa.table({min_col: pa.array(fp, type=pa.float64()),
                     max_col: pa.array(fq, type=pa.float64())})


def grouped_weighted_median(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    weight_col: str,
    *,
    out_column: str = "wmedian",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Exact per-group WEIGHTED lower median of an integer value
    column: the smallest value ``v`` whose cumulative weight (values
    sorted ascending) reaches half the group's total weight
    (``2·cum ≥ total``) — e.g. "the median token lives in a document
    of length v", the length-distribution statistic corpus curation
    reports instead of the document-count median.

    Scale shape: same as grouped_quantiles' count-row plan — each
    batch pre-aggregates to distinct ``(keys, value, Σweight)`` rows
    (an Arrow hash aggregation), so only the distinct-value histogram
    shuffles, never rows; per group one vectorized sort + weight
    cumsum picks the median.  Integer weights make the ``2·cum``
    threshold exact (no float ULP hazards in either engine).
    """

    def partial(batch: pa.Table) -> pa.Table:
        # weight under a temp name so value_col == weight_col (e.g.
        # length-weighted median of length) still groups unambiguously
        pre = pa.table({**{k: batch[k] for k in keys},
                        "v": batch[value_col],
                        "__w": batch[weight_col]})
        g = pre.group_by(keys + ["v"]).aggregate([("__w", "sum")])
        cols = {k: g[k] for k in keys}
        cols["v"] = g["v"]
        cols["wt"] = pc.cast(g["__w_sum"], pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_size=batch_size,
                              batch_format="pyarrow", zero_copy_batch=True)

    def per_group(group: pa.Table) -> pa.Table:
        v = np.asarray(group["v"], dtype=np.int64)
        w = np.asarray(group["wt"], dtype=np.int64)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        # merge duplicate values across batch partials
        uniq = np.empty(len(v), dtype=bool)
        uniq[0] = True
        uniq[1:] = v[1:] != v[:-1]
        seg = np.cumsum(uniq) - 1
        u_v = v[uniq]
        u_w = np.zeros(len(u_v), dtype=np.int64)
        np.add.at(u_w, seg, w)
        cum = np.cumsum(u_w)
        tot = int(cum[-1])
        if tot <= 0:
            return pa.table({**{k: group[k].slice(0, 0) for k in keys},
                             out_column: pa.array([], pa.int64())})
        med = int(u_v[np.argmax(cum * 2 >= tot)])
        cols = {k: group[k].slice(0, 1) for k in keys}
        cols[out_column] = pa.array([med], type=pa.int64())
        return pa.table(cols)

    return partials.groupby(keys).map_groups(per_group,
                                             batch_format="pyarrow")
