"""Data-quality expectation gates (Great-Expectations-style) as ONE
distributed pass — the validation stage a production ingest pipeline
runs before anything downstream trusts the table.

Rule kinds:

* ``("name", "nonnull", col)``            — value IS NOT NULL
* ``("name", "nonempty", col)``           — string neither NULL nor ''
* ``("name", "range", (col, lo, hi))``    — lo <= value <= hi (ints)
* ``("name", "in_set", (col, [...]))``    — value in an allowed set
* ``("name", "cols_equal", (a, b))``      — two columns agree row-wise
* ``("name", "unique", col)``             — no duplicate values

ONE scan serves every rule: each batch emits its simple-rule violation
partials AND, for every ``unique`` rule, its distinct ``(rule, value,
occurrences)`` rows (values stringified so heterogeneous key columns
share the exchange schema — the cast is injective for int/string
keys).  A single keyed ``grouped_agg`` then closes all uniqueness
rules at once, each coarse partition contributing ``Σ (occ − 1)``
(total minus distinct) without any value list reaching the driver;
the simple partials ride the same unified stream as pass-through
rows.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["expectations_report"]


def _simple_violations(batch: pa.Table, kind: str, arg) -> int:
    if kind == "nonnull":
        return pc.sum(pc.cast(pc.is_null(batch[arg]),
                              pa.int64())).as_py() or 0
    if kind == "nonempty":
        # all-null blocks arrive with Arrow `null` type — cast first so
        # fill_null has a string fill slot
        col = pc.fill_null(pc.cast(batch[arg], pa.string()), "")
        return pc.sum(pc.cast(pc.equal(col, ""), pa.int64())).as_py() or 0
    if kind == "range":
        col_name, lo, hi = arg
        v = np.asarray(pc.fill_null(batch[col_name], lo - 1),
                       dtype=np.int64)
        return int(((v < lo) | (v > hi)).sum())
    if kind == "in_set":
        col_name, allowed = arg
        ok = pc.is_in(
            pc.fill_null(pc.cast(batch[col_name], pa.string()), ""),
            value_set=pa.array(list(allowed)))
        return len(batch) - (pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
    if kind == "cols_equal":
        a, b = arg
        eq = pc.equal(batch[a], batch[b])
        return len(batch) - (pc.sum(pc.cast(pc.fill_null(eq, False),
                                            pa.int64())).as_py() or 0)
    raise ValueError(f"unknown rule kind: {kind}")


def expectations_report(
    ds: "ray.data.Dataset",
    rules: list[tuple],
) -> pa.Table:
    """Evaluate every rule over ``ds`` and return ``(rule, n_violations)``
    sorted by rule name — one row per rule, exact int64 counts."""
    from .relational import grouped_agg

    simple = [(n, k, a) for (n, k, a) in rules if k != "unique"]
    uniques = [(n, a) for (n, k, a) in rules if k == "unique"]

    def scan(batch: pa.Table) -> pa.Table:
        rule_col: list[str] = []
        val_col: list[pa.Array] = []
        occ_col: list[np.ndarray] = []
        for name, kind, arg in simple:
            # simple partials ride the unified stream as one row each:
            # (rule, value='', occ=violations) with a reserved marker
            rule_col.append("\x00" + name)
            val_col.append(pa.array([""], pa.string()))
            occ_col.append(np.array(
                [_simple_violations(batch, kind, arg)], np.int64))
        for name, col in uniques:
            v = pc.cast(batch[col], pa.string())
            g = pa.table({"v": v}).group_by(["v"]).aggregate(
                [([], "count_all")])
            rule_col.extend([name] * len(g))
            val_col.append(g["v"].combine_chunks()
                           if isinstance(g["v"], pa.ChunkedArray) else g["v"])
            occ_col.append(np.asarray(g["count_all"], dtype=np.int64))
        if not rule_col:
            return pa.table({"rule": pa.array([], pa.string()),
                             "v": pa.array([], pa.string()),
                             "occ": pa.array([], pa.int64())})
        return pa.table({
            "rule": pa.array(rule_col, pa.string()),
            "v": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in val_col]),
            "occ": pa.array(np.concatenate(occ_col)),
        })

    unified = ds.map_batches(scan, batch_format="pyarrow",
                             zero_copy_batch=True)
    counted = grouped_agg(unified, ["rule", "v"], [("occ", "occ", "sum")])

    def close(batch: pa.Table) -> pa.Table:
        rule = batch["rule"].combine_chunks() if isinstance(
            batch["rule"], pa.ChunkedArray) else batch["rule"]
        names = np.asarray(rule.to_pylist(), dtype=object)
        occ = np.asarray(batch["occ"], dtype=np.int64)
        is_simple = np.array([n.startswith("\x00") for n in names])
        out_rule: list[str] = []
        out_bad: list[int] = []
        for i in np.flatnonzero(is_simple):
            out_rule.append(names[i][1:])
            out_bad.append(int(occ[i]))
        dup_idx = np.flatnonzero(~is_simple)
        if dup_idx.size:
            # each (rule, value) row contributes (occ - 1) duplicates
            for n in set(names[dup_idx]):
                m = dup_idx[names[dup_idx] == n]
                out_rule.append(str(n))
                out_bad.append(int((occ[m] - 1).sum()))
        return pa.table({"rule": pa.array(out_rule, pa.string()),
                         "bad": pa.array(out_bad, pa.int64())})

    results: dict[str, int] = {n: 0 for n, _, _ in simple}
    results.update({n: 0 for n, _ in uniques})
    for r in counted.map_batches(close, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all():
        results[r["rule"]] = results.get(r["rule"], 0) + r["bad"]

    names = sorted(results)
    return pa.table({
        "rule": pa.array(names, pa.string()),
        "n_violations": pa.array([results[n] for n in names], pa.int64()),
    })
