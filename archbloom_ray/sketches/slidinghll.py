"""Sliding-window HyperLogLog (Chabchoub & Hébrail, "Sliding HyperLogLog";
Fusy & Giroire's future-possible-maxima construction).

A plain HLL register stores one max rank — the count is forever.  Here
each register keeps its *list of future possible maxima* (LFPM): the
(rank, last-seen-time) pairs not dominated by any other pair (no other
entry has both ≥rank and ≥time).  Querying ANY window ending now is
then exact HLL algebra: per register take the max rank among entries
fresh enough, feed the standard bias-corrected estimator.  One pass
over the stream answers "distinct keys whose last occurrence is within
w" for every w — the cardinality complement of the time-decaying Bloom
family (reference tdbloom.c answers *membership* freshness; this
answers *how many*).

State: three parallel arrays in canonical order (register asc, time
desc) with ranks strictly increasing within a register — the pareto
invariant.  Expected entries per register are O(log n), so total state
is ~m·log(n) · 13 B (a few MB at p=14 against 10^9 keys).  Merge is
concat + re-pareto: associative and commutative, so the engine's
standard partial/tree-merge build (``build_event_time_sketch``) and
the UDAF wrapper both apply unchanged.
"""

from __future__ import annotations

import numpy as np

from ..hashing import mmh3_128_batch
from .base import Sketch, SketchError, register
from .hll import HyperLogLog, _clz64


def _pareto(regs: np.ndarray, ranks: np.ndarray, times: np.ndarray):
    """Canonicalize triples: sort (reg asc, time desc, rank desc), keep
    each entry iff its rank strictly exceeds every rank already seen in
    its register (pareto frontier).  Vectorized via a composite
    running max — registers ascend, so reg·128+rank accumulates
    per-register without an explicit segment reset (ranks < 128)."""
    if regs.size == 0:
        return regs, ranks, times
    r64 = ranks.astype(np.int64)
    order = np.lexsort((-r64, -times, regs))
    regs, r64, times = regs[order], r64[order], times[order]
    comp = regs.astype(np.int64) * 128 + r64
    prev = np.empty(comp.size, dtype=np.int64)
    prev[0] = -1
    np.maximum.accumulate(comp[:-1], out=prev[1:])
    keep = comp > prev
    return (regs[keep].astype(np.int32),
            r64[keep].astype(np.uint8),
            times[keep])


@register
class SlidingHyperLogLog(Sketch):
    MAGIC = b"!slidhll"

    def __init__(self, precision: int = 14, name: str = "DEFAULT",
                 horizon: int | None = None):
        """``horizon`` (seconds) bounds state on infinite streams:
        entries older than max_seen − horizon are pruned — every window
        ≤ horizon stays exact-HLL, while the all-time query degrades to
        "since max_seen − horizon".  None (default) keeps everything
        (state is O(m·log n) anyway)."""
        if not (4 <= precision <= 18):
            raise SketchError("precision must be in [4, 18]")
        if horizon is not None and horizon <= 0:
            raise SketchError("horizon must be positive")
        self.precision = int(precision)
        self.m = 1 << precision
        self.name = name
        self.horizon = int(horizon) if horizon is not None else None
        self.regs = np.empty(0, dtype=np.int32)
        self.ranks = np.empty(0, dtype=np.uint8)
        self.times = np.empty(0, dtype=np.int64)

    # -- update --------------------------------------------------------
    def update_arrow(self, arr, now=None) -> None:
        """Add values with their event times (``now``: int64 seconds,
        scalar or per-row array) — the same (keys, now=ticks) shape the
        time-decaying builds use, so ``build_event_time_sketch`` drives
        this sketch unchanged."""
        if len(arr) == 0:
            return
        if now is None:
            raise SketchError("SlidingHyperLogLog.update_arrow needs now=")
        h1, _ = mmh3_128_batch(arr)
        self.update_hashes(h1, np.broadcast_to(
            np.asarray(now, dtype=np.int64), (len(arr),)))

    def update_hashes(self, h1: np.ndarray, times: np.ndarray) -> None:
        p = self.precision
        idx = (h1 >> np.uint64(64 - p)).astype(np.int32)
        w = h1 << np.uint64(p)
        rho = (np.minimum(_clz64(w), 64 - p) + 1).astype(np.uint8)
        self.regs, self.ranks, self.times = _pareto(
            np.concatenate([self.regs, idx]),
            np.concatenate([self.ranks, rho]),
            np.concatenate([self.times, np.asarray(times, dtype=np.int64)]))
        self._prune()

    def _prune(self) -> None:
        """Drop entries older than max_seen − horizon: no window ≤
        horizon can ever select them (queries further back are out of
        contract once a horizon is set)."""
        if self.horizon is None or self.times.size == 0:
            return
        keep = self.times >= int(self.times.max()) - self.horizon
        if not keep.all():
            self.regs = self.regs[keep]
            self.ranks = self.ranks[keep]
            self.times = self.times[keep]

    # -- query ---------------------------------------------------------
    def registers_since(self, since: int | None = None) -> np.ndarray:
        """Dense uint8 register file for the window [since, ∞) — the
        max rank per register among entries last seen at/after
        ``since`` (None: all time)."""
        out = np.zeros(self.m, dtype=np.uint8)
        if self.regs.size == 0:
            return out
        if since is None:
            mask = slice(None)
        else:
            mask = self.times >= int(since)
        np.maximum.at(out, self.regs[mask], self.ranks[mask])
        return out

    def to_dense(self, since: int | None = None) -> HyperLogLog:
        h = HyperLogLog(self.precision, name=self.name)
        h.registers = self.registers_since(since)
        return h

    def cardinality(self, since: int | None = None) -> float:
        """Estimated distinct keys whose LAST occurrence is ≥ since
        (standard bias-corrected HLL estimate on the window's register
        file; published 1.04/√m relative error applies per window)."""
        return self.to_dense(since).cardinality()

    def relative_error_bound(self) -> float:
        return 1.04 / (self.m ** 0.5)

    def finalize(self) -> float:
        return self.cardinality()

    # -- merge / size ---------------------------------------------------
    def merge(self, other: "SlidingHyperLogLog") -> "SlidingHyperLogLog":
        self._check_compatible(other)
        self.regs, self.ranks, self.times = _pareto(
            np.concatenate([self.regs, other.regs]),
            np.concatenate([self.ranks, other.ranks]),
            np.concatenate([self.times, other.times]))
        self._prune()
        return self

    def n_entries(self) -> int:
        return int(self.regs.size)

    # -- serialization ---------------------------------------------------
    def _meta_compat(self) -> dict:
        return {"precision": self.precision, "horizon": self.horizon}

    def _meta(self) -> dict:
        return {"precision": self.precision, "name": self.name,
                "horizon": self.horizon}

    def _arrays(self):
        return [self.regs, self.ranks, self.times]

    def _set_arrays(self, arrays) -> None:
        self.regs, self.ranks, self.times = arrays

    @classmethod
    def _from_meta(cls, meta) -> "SlidingHyperLogLog":
        return cls(meta["precision"], name=meta.get("name", "DEFAULT"),
                   horizon=meta.get("horizon"))
