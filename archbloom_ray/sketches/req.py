"""REQ sketch — streaming quantiles with RELATIVE rank error.

Engine extension beyond the reference scope (the reference C library
has no quantile structures at all; this rounds out the engine's
quantile family), implemented from the published algorithm of
Cormode, Karnin, Liberty, Thaler & Veselý, "Relative Error Streaming
Quantiles" (PODS 2021) — one of the round's retrieved papers.

Where KLL's rank error is ADDITIVE (±εn anywhere) and DDSketch's is
relative in VALUE, REQ's error is relative in RANK: the estimate of a
rank r item is off by at most ε·r items, where r counts from the
accurate end.  This build is HRA (high-rank accuracy): the closer an
item is to the maximum, the more precisely its rank is tracked —
exactly what tail latencies / p99.9 document-length queries need.

Mechanics (paper §3, mirroring the Apache DataSketches layout): a
stack of relative compactors; level h items weigh 2^h.  Each
compactor's buffer is conceptually split into ``num_sections``
sections of ``section_size`` items next to a PROTECTED half that is
never compacted (the top half under HRA).  On overflow, the number of
trailing ones of the compaction counter picks how many sections
(always the outermost — i.e. lowest-value — first) are sorted out and
promoted every-other to the next level: the low end loses resolution
geometrically faster than the region near the protected half.  Every
``2^(num_sections-1)`` compactions the section count doubles and the
section size shrinks by √2 (the paper's schedule), keeping the
relative-error guarantee as n grows.

Contract: ε(r) = O(√(log(1/δ)) / k) relative at rank r with
probability 1−δ; exact while a level's buffer has never overflowed.
Merge = level-wise concatenation + re-compaction (associative within
the bound).  Coin flips come from an inline splitmix64 mix of
(seed, level, compaction counter) — deterministic and reproducible;
PCG64 construction per compaction was measured at ~50 µs and rejected.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .base import Sketch, SketchError, register


def _trailing_ones(x: int) -> int:
    t = 0
    while x & 1:
        t += 1
        x >>= 1
    return t


def _even(x: float) -> int:
    return max(4, 2 * int(round(x / 2.0)))


class _Compactor:
    __slots__ = ("buf", "section_raw", "num_sections", "state")

    def __init__(self, k: int):
        self.buf = np.empty(0, dtype=np.float64)
        self.section_raw = float(k)          # un-rounded section size
        self.num_sections = 3
        self.state = 0                       # compaction counter

    @property
    def section_size(self) -> int:
        return _even(self.section_raw)

    @property
    def capacity(self) -> int:
        return 2 * self.num_sections * self.section_size


@register
class ReqSketch(Sketch):
    MAGIC = b"!reqqntl"

    def __init__(self, k: int = 32, seed: int = 42, name: str = "DEFAULT"):
        if k < 4 or k % 2:
            raise SketchError("k must be an even integer >= 4")
        self.k = int(k)
        self.seed = int(seed)
        self.name = name
        self.levels: list[_Compactor] = [_Compactor(self.k)]
        self.n = 0
        self._compactions = 0
        self.min = math.inf
        self.max = -math.inf

    # -- update -------------------------------------------------------
    def update_arrow(self, arr) -> None:
        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            vals = np.asarray(
                arr.combine_chunks() if isinstance(arr, pa.ChunkedArray)
                else arr, dtype=np.float64)
        else:
            vals = np.asarray(arr, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        self.n += vals.size
        self.min = min(self.min, float(vals.min()))
        self.max = max(self.max, float(vals.max()))
        lvl = self.levels[0]
        lvl.buf = np.concatenate([lvl.buf, vals])
        self._compact_all()

    def update_weighted(self, arr, counts) -> None:
        """(value, count) bulk update by bit decomposition (level h
        carries weight 2^h) — the same shape as the level-wise merge,
        so the error story is unchanged (see kll.py:67)."""
        vals = np.asarray(arr, dtype=np.float64)
        cnts = np.asarray(counts, dtype=np.int64)
        keep = ~np.isnan(vals) & (cnts > 0)
        vals, cnts = vals[keep], cnts[keep]
        if vals.size == 0:
            return
        self.n += int(cnts.sum())
        self.min = min(self.min, float(vals.min()))
        self.max = max(self.max, float(vals.max()))
        max_bits = int(cnts.max()).bit_length()
        while len(self.levels) < max_bits:
            self.levels.append(_Compactor(self.k))
        for h in range(max_bits):
            sel = ((cnts >> h) & 1) == 1
            if sel.any():
                lvl = self.levels[h]
                lvl.buf = np.concatenate([lvl.buf, vals[sel]])
        self._compact_all()

    # -- compaction ---------------------------------------------------
    def _compact_all(self) -> None:
        h = 0
        while h < len(self.levels):
            lvl = self.levels[h]
            if lvl.buf.size > lvl.capacity:
                # sort ONCE per refill: removing a prefix keeps the
                # buffer sorted, so the (many) per-section compactions
                # a bulk append triggers skip their own sorts
                lvl.buf = np.sort(lvl.buf)
                while lvl.buf.size > lvl.capacity:
                    self._compact_level(h, presorted=True)
            h += 1

    def _compact_level(self, h: int, presorted: bool = False) -> None:
        lvl = self.levels[h]
        buf = lvl.buf if presorted else np.sort(lvl.buf)
        # sections to compact: outermost (lowest values under HRA)
        # first; trailing ones of the counter reach deeper toward the
        # protected half geometrically less often
        secs = _trailing_ones(lvl.state) + 1
        secs = min(secs, lvl.num_sections)
        clen = min(secs * lvl.section_size, buf.size // 2)
        if clen < 2:
            clen = 2
        region = buf[:clen]
        # deterministic coin: splitmix64 of (seed, level, compaction#)
        # — a fresh PCG64 per compaction costs ~50 µs in seeding alone,
        # dominating bulk updates (thousands of compactions per batch)
        x = (self.seed * 0x9E3779B97F4A7C15
             + h * 0xBF58476D1CE4E5B9
             + self._compactions * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 30; x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27; x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        self._compactions += 1
        offset = int(x & 1)
        promoted = region[offset::2]
        lvl.buf = buf[clen:]
        lvl.state += 1
        # the paper's growth schedule: more, thinner sections as the
        # level sees more compactions (keeps ε relative as n grows)
        if lvl.state >= (1 << (lvl.num_sections - 1)):
            lvl.num_sections *= 2
            lvl.section_raw = max(4.0, lvl.section_raw / math.sqrt(2.0))
        if h + 1 == len(self.levels):
            self.levels.append(_Compactor(self.k))
        nxt = self.levels[h + 1]
        nxt.buf = np.concatenate([nxt.buf, promoted])

    # -- queries ------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, lvl in enumerate(self.levels):
            if lvl.buf.size:
                vals.append(lvl.buf)
                wts.append(np.full(lvl.buf.size, float(1 << h)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if v.size == 0:
            return math.nan
        # the extremes are tracked exactly; under HRA the lowest
        # RETAINED item can sit far above the true minimum (the low
        # end is what compaction discards), so answer q<=0 from state
        if q <= 0.0:
            return self.min
        if q >= 1.0:
            return self.max
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, v.size - 1)
        return float(v[i])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, x: float) -> float:
        """Estimated normalized rank of x (fraction of items <= x)."""
        v, w = self._weighted_items()
        if v.size == 0:
            return math.nan
        mask = v <= x
        return float(w[mask].sum() / w.sum())

    def error_bound(self, q: float = 0.5) -> float:
        """Approximate RELATIVE rank-error at upper quantile ``q``
        under HRA: ε ≈ 4/k of the distance to the top, i.e. the rank
        estimate of the q-quantile is off by ≲ (4/k)·(1−q)·n items
        (constant fitted to the paper's O(√log(1/δ)/k) at δ=0.05)."""
        return (4.0 / self.k) * (1.0 - q)

    def is_exact(self) -> bool:
        """True while nothing has ever been compacted (answers exact)."""
        return self._compactions == 0 and len(self.levels) == 1

    # -- algebra ------------------------------------------------------
    def merge(self, other: "ReqSketch") -> "ReqSketch":
        self._check_compatible(other)
        while len(self.levels) < len(other.levels):
            self.levels.append(_Compactor(self.k))
        for h, olvl in enumerate(other.levels):
            lvl = self.levels[h]
            if olvl.buf.size:
                lvl.buf = np.concatenate([lvl.buf, olvl.buf])
            # conservative state union keeps both schedules' progress
            lvl.state = max(lvl.state, olvl.state)
            lvl.num_sections = max(lvl.num_sections, olvl.num_sections)
            lvl.section_raw = min(lvl.section_raw, olvl.section_raw)
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compactions = max(self._compactions, other._compactions) + 1
        self._compact_all()
        return self

    def finalize(self) -> dict:
        return {"n": self.n, "levels": len(self.levels),
                "retained": int(sum(l.buf.size for l in self.levels))}

    def _meta_compat(self) -> dict:
        return {"k": self.k}

    # -- ser/de -------------------------------------------------------
    def _meta(self) -> dict:
        return {
            "k": self.k,
            "seed": self.seed,
            "name": self.name,
            "n": self.n,
            "compactions": self._compactions,
            "num_levels": len(self.levels),
            "section_raw": [l.section_raw for l in self.levels],
            "num_sections": [l.num_sections for l in self.levels],
            "state": [l.state for l in self.levels],
            "min": self.min if math.isfinite(self.min) else None,
            "max": self.max if math.isfinite(self.max) else None,
        }

    def _arrays(self):
        return [l.buf for l in self.levels]

    def _set_arrays(self, arrays):
        while len(self.levels) < len(arrays):
            self.levels.append(_Compactor(self.k))
        for lvl, a in zip(self.levels, arrays):
            lvl.buf = a.astype(np.float64, copy=True)

    @classmethod
    def _from_meta(cls, meta):
        obj = cls(meta["k"], meta.get("seed", 42), meta.get("name", "DEFAULT"))
        obj.n = meta.get("n", 0)
        obj._compactions = meta.get("compactions", 0)
        obj.levels = [_Compactor(obj.k)
                      for _ in range(meta.get("num_levels", 1))]
        for lvl, sr, ns, st in zip(obj.levels,
                                   meta.get("section_raw", []),
                                   meta.get("num_sections", []),
                                   meta.get("state", [])):
            lvl.section_raw = float(sr)
            lvl.num_sections = int(ns)
            lvl.state = int(st)
        obj.min = meta["min"] if meta.get("min") is not None else math.inf
        obj.max = meta["max"] if meta.get("max") is not None else -math.inf
        return obj
