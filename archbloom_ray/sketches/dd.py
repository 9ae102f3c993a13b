"""DDSketch — quantiles with a GUARANTEED relative-error bound, as a
mergeable UDAF.

Engine extension (absent from the reference C library, whose only
quantile-adjacent structure is none at all; nearest relatives here are
the engine's own t-digest/KLL which bound RANK error).  Implemented
from the published algorithm (Masson, Rim & Lee, "DDSketch: a fast and
fully-mergeable quantile sketch with relative-error guarantees",
VLDB'19):

    gamma = (1+alpha)/(1-alpha);  bucket(v>0) = ceil(log_gamma(v))
    estimate(bucket i) = 2*gamma^i/(gamma+1)   (within alpha of every
                                                v in the bucket)

* counts are exact integers per log-spaced bucket; merge = aligned
  counter add, so the merged sketch is IDENTICAL to a single-pass
  build — the estimate is merge-order independent (unlike t-digest),
  which makes its certification booleans deterministic under Ray's
  nondeterministic block order.
* the paper's guarantee: for any rank r the returned estimate x~
  satisfies |x~ - x_r| <= alpha * x_r, PROVIDED the answering bucket
  was never collapsed.  This store uses the paper's
  collapsing-lowest-dense strategy (pool buckets below
  ``max_bins``-from-the-top into the lowest retained bucket), and the
  collapsed region is itself a pure function of the value multiset, so
  determinism survives collapsing too; ``quantile()`` reports whether
  the answer came from the collapsed pool via ``last_collapsed``.
* zeros (and exact negatives, via a mirrored store) are tracked
  separately per the paper's production design.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .base import Sketch, SketchError, register


def _as_float64(arr) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array):
        return np.asarray(arr, dtype=np.float64)
    return np.asarray(arr, dtype=np.float64)


class _Store:
    """Contiguous log-bucket counter band [lo, lo+len) with
    collapse-lowest semantics.  State is a pure function of the key
    multiset (given max_bins), so merges commute."""

    __slots__ = ("lo", "counts", "max_bins", "collapsed")

    def __init__(self, max_bins: int):
        self.lo = 0
        self.counts = np.empty(0, dtype=np.int64)
        self.max_bins = int(max_bins)
        self.collapsed = False

    def add_keys(self, keys: np.ndarray, counts: np.ndarray) -> None:
        if keys.size == 0:
            return
        k_lo = int(keys.min())
        k_hi = int(keys.max())
        if self.counts.size == 0:
            self.lo = k_lo
            self.counts = np.zeros(k_hi - k_lo + 1, dtype=np.int64)
        else:
            new_lo = min(self.lo, k_lo)
            new_hi = max(self.lo + self.counts.size - 1, k_hi)
            if new_lo < self.lo or new_hi > self.lo + self.counts.size - 1:
                grown = np.zeros(new_hi - new_lo + 1, dtype=np.int64)
                off = self.lo - new_lo
                grown[off : off + self.counts.size] = self.counts
                self.lo, self.counts = new_lo, grown
        np.add.at(self.counts, keys.astype(np.int64) - self.lo, counts)
        self._collapse()

    def _collapse(self) -> None:
        if self.counts.size <= self.max_bins:
            return
        # keep the TOP max_bins buckets; pool everything lower into the
        # lowest retained bucket (preserves the alpha guarantee for all
        # ranks that resolve above the pool — the paper's §2.3 store)
        cut = self.counts.size - self.max_bins
        pooled = int(self.counts[:cut].sum())
        self.counts = self.counts[cut:].copy()
        self.lo += cut
        self.counts[0] += pooled
        if pooled:
            self.collapsed = True

    def merge(self, other: "_Store") -> None:
        if other.counts.size == 0:
            return
        keys = other.lo + np.arange(other.counts.size, dtype=np.int64)
        nz = other.counts > 0
        self.add_keys(keys[nz], other.counts[nz])
        self.collapsed = self.collapsed or other.collapsed

    def total(self) -> int:
        return int(self.counts.sum())


@register
class DDSketch(Sketch):
    MAGIC = b"!ddsktch"

    def __init__(self, alpha: float = 0.01, max_bins: int = 2048,
                 name: str = "DEFAULT"):
        if not (0.0 < alpha < 1.0):
            raise SketchError("alpha must be in (0, 1)")
        if max_bins < 2:
            raise SketchError("max_bins must be >= 2")
        self.alpha = float(alpha)
        self.max_bins = int(max_bins)
        self.name = name
        self.gamma = (1.0 + self.alpha) / (1.0 - self.alpha)
        self._inv_log_gamma = 1.0 / math.log(self.gamma)
        self.pos = _Store(self.max_bins)
        self.neg = _Store(self.max_bins)
        self.zero_count = 0
        #: set by quantile(): did the answer land in a collapsed pool?
        self.last_collapsed = False

    # -- key mapping ----------------------------------------------------
    def _keys(self, v: np.ndarray) -> np.ndarray:
        # ceil(log_gamma(v)); the tiny relative nudge keeps exact powers
        # of gamma from straddling a bucket edge under fp round-off
        return np.ceil(np.log(v) * self._inv_log_gamma - 1e-11).astype(np.int64)

    def _value(self, key: int) -> float:
        return 2.0 * self.gamma ** key / (self.gamma + 1.0)

    # -- update ---------------------------------------------------------
    def update_arrow(self, arr) -> None:
        self.update_weighted(arr, None)

    def update_weighted(self, arr, counts) -> None:
        """Count-weighted update for the grouped count-row shuffle
        (``build_grouped_value_sketches``); exact because bucket counts
        are plain integers."""
        vals = _as_float64(arr)
        if counts is None:
            cnts = np.ones(vals.size, dtype=np.int64)
        else:
            cnts = np.asarray(counts, dtype=np.int64)
        keep = ~np.isnan(vals) & (cnts > 0)
        vals, cnts = vals[keep], cnts[keep]
        if vals.size == 0:
            return
        zero = vals == 0.0
        if zero.any():
            self.zero_count += int(cnts[zero].sum())
        p = vals > 0.0
        if p.any():
            self.pos.add_keys(self._keys(vals[p]), cnts[p])
        n = vals < 0.0
        if n.any():
            self.neg.add_keys(self._keys(-vals[n]), cnts[n])

    # -- merge ----------------------------------------------------------
    def merge(self, other: "DDSketch") -> "DDSketch":
        self._check_compatible(other)
        self.pos.merge(other.pos)
        self.neg.merge(other.neg)
        self.zero_count += other.zero_count
        return self

    # -- queries --------------------------------------------------------
    @property
    def count(self) -> int:
        return self.pos.total() + self.neg.total() + self.zero_count

    def quantile(self, q: float) -> float:
        """Value at 0-based rank floor(q*(n-1)); |est - true| <=
        alpha*|true| whenever the answering bucket is uncollapsed
        (``last_collapsed`` reports which)."""
        if not (0.0 <= q <= 1.0):
            raise SketchError("q must be in [0, 1]")
        n = self.count
        if n == 0:
            raise SketchError("empty sketch")
        rank = int(math.floor(q * (n - 1)))  # 0-based target rank
        self.last_collapsed = False
        # ascending value order: most-negative first = HIGHEST neg key
        # first, so walk the negative band from its top end downward
        nneg = self.neg.total()
        if rank < nneg:
            rev = self.neg.counts[::-1]
            cum = int(0)
            for i, c in enumerate(rev):
                cum += int(c)
                if cum > rank:
                    key = self.neg.lo + (self.neg.counts.size - 1 - i)
                    self.last_collapsed = (
                        self.neg.collapsed and key == self.neg.lo)
                    return -self._value(key)
        rank -= nneg
        if rank < self.zero_count:
            return 0.0
        rank -= self.zero_count
        cum = np.cumsum(self.pos.counts)
        i = int(np.searchsorted(cum, rank + 1))
        key = self.pos.lo + i
        self.last_collapsed = self.pos.collapsed and i == 0
        return self._value(key)

    def relative_error_bound(self) -> float:
        """The published guarantee: alpha (deterministic, not
        probabilistic), for answers outside the collapsed pool."""
        return self.alpha

    def finalize(self) -> dict:
        if self.count == 0:
            return {"count": 0}
        return {"count": self.count,
                "p50": self.quantile(0.5),
                "p95": self.quantile(0.95),
                "p99": self.quantile(0.99)}

    # -- serialization ----------------------------------------------------
    def _meta(self) -> dict:
        return {
            "alpha": self.alpha, "max_bins": self.max_bins,
            "name": self.name,
            "pos_lo": self.pos.lo, "neg_lo": self.neg.lo,
            "zero_count": self.zero_count,
            "pos_collapsed": self.pos.collapsed,
            "neg_collapsed": self.neg.collapsed,
        }

    def _meta_compat(self) -> dict:
        return {"alpha": self.alpha, "max_bins": self.max_bins}

    def _arrays(self) -> list[np.ndarray]:
        return [self.pos.counts, self.neg.counts]

    def _set_arrays(self, arrays: list[np.ndarray]) -> None:
        self.pos.counts, self.neg.counts = arrays[0], arrays[1]

    @classmethod
    def _from_meta(cls, meta: dict) -> "DDSketch":
        obj = cls(alpha=meta["alpha"], max_bins=meta["max_bins"],
                  name=meta.get("name", "DEFAULT"))
        obj.pos.lo = int(meta["pos_lo"])
        obj.neg.lo = int(meta["neg_lo"])
        obj.zero_count = int(meta["zero_count"])
        obj.pos.collapsed = bool(meta["pos_collapsed"])
        obj.neg.collapsed = bool(meta["neg_collapsed"])
        return obj
