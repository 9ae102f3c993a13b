"""Sketches as native Ray Data aggregations (``AggregateFnV2``).

The north-star contract calls each sketch "a serializable UDAF"; this
module is the literal reading of that: any engine :class:`Sketch` drops
into ``Dataset.aggregate(...)`` or ``Dataset.groupby(key).aggregate(...)``
next to the built-ins (``Count()``, ``Sum()``, ...), so one pass over the
data can mix exact and sketched aggregates.

The accumulator is the sketch's serialized byte state (``to_bytes`` /
``sketch_from_bytes`` — the same save format the CLI and checkpoints
use, reference bloom.c:525-733), so the aggregation is a proper monoid:

    zero     = factory().to_bytes()            (empty sketch)
    block    → factory().update_arrow(col)     (partial state)
    combine  = merge (associative + commutative for every engine sketch)
    finalize = identity (the state bytes) or a caller-supplied estimator

Scale note: ``Dataset.aggregate`` ships one O(m) partial per BLOCK into
Ray's aggregation machinery — fine for register/compact sketches (HLL,
t-digest, KLL, MG, KMV, theta) and for grouped builds where each group's
state is small.  For whole-dataset builds of BIG bitmap sketches
(Bloom/cbloom at 10^12 keys) prefer the sharded builds in
``pipelines/build.py`` whose shuffle volume is independent of m; and for
many-sketches-one-scan builds prefer :func:`build.build_sketches`.
This module is the idiomatic Dataset-API surface, not a replacement for
those scale paths.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor

from ..sketches.base import Sketch, sketch_from_bytes


class SketchAgg(AggregateFnV2):
    """Any engine sketch as a Ray Data aggregation.

    Example::

        from archbloom_ray.sketches import HyperLogLog
        ds.groupby("lang").aggregate(
            SketchAgg("text", lambda: HyperLogLog(12),
                      finalize=lambda sk: sk.cardinality(),
                      alias_name="distinct_est"))

    Args:
        on: column whose values feed ``Sketch.update_arrow``.
        factory: zero-argument sketch constructor; every partial and the
            zero state come from it, so parameters are consistent and
            merge is always legal.
        finalize: optional ``Sketch -> value`` estimator applied to the
            final merged sketch (per group, when grouping).  ``None``
            returns the serialized sketch bytes — feed them to
            ``sketch_from_bytes`` for further algebra.
        alias_name: output column name (default ``sketch(<on>)``).
    """

    def __init__(
        self,
        on: str,
        factory: Callable[[], Sketch],
        *,
        finalize: Optional[Callable[[Sketch], Any]] = None,
        alias_name: Optional[str] = None,
        ignore_nulls: bool = True,
    ):
        self._factory = factory
        self._finalize_fn = finalize
        super().__init__(
            alias_name or f"sketch({on})",
            zero_factory=lambda: factory().to_bytes(),
            on=on,
            ignore_nulls=ignore_nulls,
        )

    def aggregate_block(self, block: Block) -> bytes:
        table = BlockAccessor.for_block(block).to_arrow()
        sk = self._factory()
        col = table[self._target_col_name]
        if col.null_count:
            col = col.drop_null()
        sk.update_arrow(col)
        return sk.to_bytes()

    def combine(self, current: bytes, new: bytes) -> bytes:
        acc = sketch_from_bytes(current)
        acc.merge(sketch_from_bytes(new))
        return acc.to_bytes()

    def finalize(self, accumulator: bytes) -> Any:
        if self._finalize_fn is None:
            return accumulator
        return self._finalize_fn(sketch_from_bytes(accumulator))


class HLLDistinct(SketchAgg):
    """Approximate COUNT(DISTINCT on) via HyperLogLog, finalized to the
    cardinality estimate (float64)."""

    def __init__(self, on: str, *, p: int = 14,
                 alias_name: Optional[str] = None):
        from ..sketches.hll import HyperLogLog

        super().__init__(
            on, lambda: HyperLogLog(p),
            finalize=lambda sk: float(sk.cardinality()),
            alias_name=alias_name or f"hll_distinct({on})",
        )


class SketchQuantile(SketchAgg):
    """Approximate quantile of a numeric column via t-digest (default)
    or KLL, finalized to the quantile estimate (float64)."""

    def __init__(self, on: str, q: float, *, kind: str = "tdigest",
                 compression: int = 200,
                 alias_name: Optional[str] = None):
        if kind == "tdigest":
            from ..sketches.tdigest import TDigest as _S
        elif kind == "kll":
            from ..sketches.kll import KLLSketch as _S
        else:
            raise ValueError(f"unknown quantile sketch kind: {kind!r}")
        super().__init__(
            on, lambda: _S(compression),
            finalize=lambda sk: float(sk.quantile(q)),
            alias_name=alias_name or f"{kind}_q{q:g}({on})",
        )


class SlidingDistinct(AggregateFnV2):
    """Sliding-window distinct count as a native aggregation — the
    TWO-COLUMN UDAF shape (``on=None``: the whole block arrives and the
    key + event-time columns are read explicitly).  Accumulator =
    serialized SlidingHyperLogLog; combine = pareto merge.  With
    ``since`` set, finalizes to the window's cardinality estimate
    (float64); otherwise returns the sketch bytes so callers can ask
    for ANY window later."""

    def __init__(self, key_col: str, ts_col: str, *, p: int = 14,
                 since: Optional[int] = None,
                 horizon: Optional[int] = None,
                 alias_name: Optional[str] = None):
        from ..sketches.slidinghll import SlidingHyperLogLog

        self._key_col, self._ts_col = key_col, ts_col
        self._p, self._since, self._horizon = p, since, horizon
        super().__init__(
            alias_name or f"sliding_distinct({key_col})",
            zero_factory=lambda: SlidingHyperLogLog(
                p, horizon=horizon).to_bytes(),
            on=None, ignore_nulls=True)

    def aggregate_block(self, block: Block) -> bytes:
        from .build import _epoch_seconds
        from ..sketches.slidinghll import SlidingHyperLogLog

        t = BlockAccessor.for_block(block).to_arrow()
        sk = SlidingHyperLogLog(self._p, horizon=self._horizon)
        keys = t[self._key_col].combine_chunks()
        ts = t[self._ts_col].combine_chunks()
        valid = None
        if keys.null_count or ts.null_count:
            import pyarrow.compute as _pc

            valid = _pc.and_(_pc.is_valid(keys), _pc.is_valid(ts))
            keys, ts = keys.filter(valid), ts.filter(valid)
        if len(keys):
            sk.update_arrow(keys, now=_epoch_seconds(ts))
        return sk.to_bytes()

    def combine(self, current: bytes, new: bytes) -> bytes:
        acc = sketch_from_bytes(current)
        acc.merge(sketch_from_bytes(new))
        return acc.to_bytes()

    def finalize(self, accumulator: bytes) -> Any:
        if self._since is None:
            return accumulator
        return float(sketch_from_bytes(accumulator)
                     .cardinality(since=self._since))


class TopKItems(SketchAgg):
    """Approximate heavy hitters via Misra-Gries, finalized to the
    top-k ``[{item, count}, ...]`` list (descending count, item
    tie-break).  Counts are the MG lower-bound estimates — within
    N/capacity of truth, and EXACT whenever the column's distinct
    count fits ``capacity`` (no decrements ever happen)."""

    def __init__(self, on: str, k: int = 10, *,
                 capacity: Optional[int] = None,
                 alias_name: Optional[str] = None):
        from ..sketches.mg import MisraGries

        cap = capacity or max(4 * k, 50)

        def fin(sk: "MisraGries"):
            cands = sorted(sk.candidates(),
                           key=lambda kv: (-kv[1], kv[0]))[:k]
            return [{"item": b.decode("utf-8", "replace"),
                     "count": int(c)} for b, c in cands]

        super().__init__(on, lambda: MisraGries(cap), finalize=fin,
                         alias_name=alias_name or f"top{k}({on})")


def dataset_profile(
    ds: "Any",
    columns: dict[str, str],
    *,
    hll_p: int = 14,
    topk: int = 5,
    quantiles: tuple[float, ...] = (0.5, 0.9),
) -> dict[str, Any]:
    """One-pass profile of a Dataset — ``describe()`` for data too big
    to look at: exact built-ins (row count, min/max/sum) and sketched
    estimates (HLL distinct, t-digest quantiles, Misra-Gries top-k)
    run together in a SINGLE ``Dataset.aggregate`` call, i.e. one scan
    of the input however many metrics are requested.

    ``columns`` maps column name → ``"numeric"`` (min/max/sum +
    quantiles + distinct) or ``"string"`` (distinct + top-k).
    Returns the flat ``{output_name: value}`` dict from Ray.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    aggs: list[Any] = [Count()]
    for col, kind in columns.items():
        if kind == "numeric":
            aggs += [Min(col), Max(col), Sum(col),
                     HLLDistinct(col, p=hll_p)]
            aggs += [SketchQuantile(col, q) for q in quantiles]
        elif kind == "string":
            aggs += [HLLDistinct(col, p=hll_p),
                     TopKItems(col, topk)]
        else:
            raise ValueError(f"unknown column kind for {col!r}: {kind!r}")
    return ds.aggregate(*aggs)
