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

Everything except ``unique`` is embarrassingly parallel: per-batch
vectorized violation counts pre-reduce to ONE partial row per batch
and a driver-sized sum closes them.  ``unique`` needs the one honest
exchange — per-batch ``(value, occurrences)`` pairs flow through a
keyed ``grouped_agg`` and each coarse partition contributes
``Σ (occ − 1)`` (total minus distinct) without the value list ever
reaching the driver.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["expectations_report"]


def expectations_report(
    ds: "ray.data.Dataset",
    rules: list[tuple],
) -> pa.Table:
    """Evaluate every rule over ``ds`` and return ``(rule, n_violations)``
    sorted by rule name — one row per rule, exact int64 counts."""
    from .relational import grouped_agg

    simple = [(n, k, a) for (n, k, a) in rules if k != "unique"]
    uniques = [(n, a) for (n, k, a) in rules if k == "unique"]

    results: dict[str, int] = {}

    if simple:
        def partial(batch: pa.Table) -> pa.Table:
            counts = []
            for name, kind, arg in simple:
                if kind == "nonnull":
                    bad = pc.sum(pc.cast(pc.is_null(batch[arg]),
                                         pa.int64())).as_py() or 0
                elif kind == "nonempty":
                    # all-null blocks arrive with Arrow `null` type —
                    # cast first so fill_null has a string fill slot
                    col = pc.fill_null(pc.cast(batch[arg], pa.string()), "")
                    bad = pc.sum(pc.cast(pc.equal(col, ""),
                                         pa.int64())).as_py() or 0
                elif kind == "range":
                    col_name, lo, hi = arg
                    v = np.asarray(pc.fill_null(batch[col_name], lo - 1),
                                   dtype=np.int64)
                    bad = int(((v < lo) | (v > hi)).sum())
                elif kind == "in_set":
                    col_name, allowed = arg
                    ok = pc.is_in(
                        pc.fill_null(pc.cast(batch[col_name], pa.string()),
                                     ""),
                        value_set=pa.array(list(allowed)))
                    bad = len(batch) - (pc.sum(pc.cast(ok, pa.int64()))
                                        .as_py() or 0)
                elif kind == "cols_equal":
                    a, b = arg
                    eq = pc.equal(batch[a], batch[b])
                    bad = len(batch) - (pc.sum(pc.cast(pc.fill_null(
                        eq, False), pa.int64())).as_py() or 0)
                else:
                    raise ValueError(f"unknown rule kind: {kind}")
                counts.append(int(bad))
            return pa.table({
                "rule": pa.array([n for n, _, _ in simple], pa.string()),
                "bad": pa.array(counts, pa.int64()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        for r in parts:
            results[r["rule"]] = results.get(r["rule"], 0) + r["bad"]

    for name, col in uniques:
        def occ(batch: pa.Table, col=col) -> pa.Table:
            g = batch.select([col]).group_by([col]).aggregate(
                [([], "count_all")])
            return g.rename_columns(["v", "occ"])

        counted = grouped_agg(
            ds.map_batches(occ, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["v"], [("occ", "occ", "sum")])

        def dup_mass(batch: pa.Table) -> pa.Table:
            o = np.asarray(batch["occ"], dtype=np.int64)
            return pa.table({"d": pa.array([int((o - 1).sum())], pa.int64())})

        results[name] = sum(r["d"] for r in counted.map_batches(
            dup_mass, batch_format="pyarrow", zero_copy_batch=True)
            .take_all())

    names = sorted(results)
    return pa.table({
        "rule": pa.array(names, pa.string()),
        "n_violations": pa.array([results[n] for n in names], pa.int64()),
    })
