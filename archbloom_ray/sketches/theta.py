"""Theta sketch — mergeable distinct-count estimator with COMPOSABLE
set algebra (union / intersection / A-not-B return sketches, not just
numbers).

Engine extension (the reference C library ships no cardinality
structure; its README lists count-distinct as unimplemented —
reference README.md:80-104).  Built from the published framework
(Dasgupta, Lang, Rhodes, Thaler — "A Framework for Estimating Stream
Expression Cardinalities", and the Apache DataSketches theta-sketch
theory):

    keep every 64-bit hash strictly below a threshold theta; when more
    than k survive, lower theta to the (k+1)-th smallest survivor
    (QuickSelect rule) and discard the rest.

* estimate = |retained| / (theta / 2^64).  Exact while theta is still
  2^64 (fewer than k+1 distinct values seen); at capacity the estimate
  k/U_(k+1) is exactly unbiased (U_(k+1) ~ Beta(k+1, n−k) gives
  E[k/U_(k+1)] = n), with 1σ relative error ≈ 1/√(k−1)
  (``relative_error_bound`` returns the conservative 1/√(k−2)).
* merge/union is ORDER-INDEPENDENT and equals the one-pass build over
  the concatenated streams byte-for-byte: after any trim, the retained
  set is exactly {h < theta} with theta = the (k+1)-th smallest
  distinct hash seen, a quantity independent of arrival/merge order
  (same argument as KMV bottom-k; asserted byte-exactly in
  tests/test_theta.py).
* what KMV cannot do: ``intersect``/``a_not_b`` produce DERIVED
  sketches (theta = min of the operands' thetas, entries = the set
  operation over survivors below it) that stay composable — each
  retained hash is an iid Bernoulli(theta) sample of the true result
  set, so estimate = |retained|/theta stays unbiased through any
  expression tree ((A∩B)\\C, (A\\B)∪(C∩D), ...), with per-result
  relative standard error √((1−θ)/|retained|)
  (``result_relative_error``).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_64_batch
from .base import Sketch, SketchError, register

_FULL = 1 << 64  # theta denominator; theta == _FULL ⇒ exact mode


def _below(hashes: np.ndarray, theta: int) -> np.ndarray:
    """Survivors strictly below theta (no-op in exact mode — 2^64
    doesn't fit a uint64, so the filter is skipped, correctly)."""
    if theta == _FULL:
        return hashes
    return hashes[hashes < np.uint64(theta)]


@register
class ThetaSketch(Sketch):
    MAGIC = b"!thetas!"

    def __init__(self, k: int = 4096, name: str = "DEFAULT"):
        if k < 3:
            raise SketchError("k must be ≥ 3 (estimator needs k-2 > 0)")
        self.k = int(k)
        self.name = name
        self.theta = _FULL                           # Python int in [1, 2^64]
        self.hashes = np.empty(0, dtype=np.uint64)   # sorted asc, all < theta

    # -- update ---------------------------------------------------------
    def update_arrow(self, arr) -> None:
        if len(arr) == 0:
            return
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        h = mmh3_64_batch(arr).astype(np.uint64)
        if self.theta < _FULL:
            h = h[h < np.uint64(self.theta)]
        if h.size == 0:
            return
        self._absorb(np.unique(h))

    def update_weighted(self, arr, counts) -> None:
        """Multiplicity is irrelevant to a distinct sketch — lets the
        grouped count-row build path drive theta sketches too."""
        self.update_arrow(arr)

    def _absorb(self, new_h: np.ndarray) -> None:
        """Absorb sorted-unique candidate hashes already < self.theta."""
        merged = np.union1d(self.hashes, new_h)
        if merged.size > self.k:
            # QuickSelect rule: theta ← (k+1)-th smallest survivor
            self.theta = int(merged[self.k])
            merged = merged[: self.k]
        self.hashes = merged

    # -- queries ----------------------------------------------------------
    def cardinality(self) -> float:
        """|retained| / θ — exact while theta == 2^64."""
        return self.hashes.size * _FULL / self.theta

    def is_exact(self) -> bool:
        return self.theta == _FULL

    def relative_error_bound(self) -> float:
        """1σ relative error of the base/union estimator, ≈ 1/√(k−1);
        returned conservatively as 1/√(k−2)."""
        return 1.0 / math.sqrt(self.k - 2)

    def result_relative_error(self) -> float:
        """Per-result 1σ RSE √((1−θ)/|retained|) — the right bound for
        DERIVED sketches (intersection / A-not-B), whose retained count
        can be far below k.  0.0 in exact mode."""
        if self.theta == _FULL:
            return 0.0
        t = self.theta / _FULL
        return math.sqrt((1.0 - t) / max(self.hashes.size, 1))

    # -- set algebra (composable: each returns a ThetaSketch) -------------
    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        """A ∪ B as a new sketch (non-mutating merge)."""
        self._check_compatible(other)
        out = ThetaSketch(self.k, name=self.name)
        out.theta = min(self.theta, other.theta)
        out._absorb(np.union1d(_below(self.hashes, out.theta),
                               _below(other.hashes, out.theta)))
        return out

    def intersect(self, other: "ThetaSketch") -> "ThetaSketch":
        """A ∩ B: survivors below min-theta present in BOTH (each is an
        iid Bernoulli(θ) sample of the true intersection)."""
        self._check_compatible(other)
        out = ThetaSketch(self.k, name=self.name)
        out.theta = min(self.theta, other.theta)
        out.hashes = np.intersect1d(
            _below(self.hashes, out.theta), _below(other.hashes, out.theta),
            assume_unique=True)
        return out

    def a_not_b(self, other: "ThetaSketch") -> "ThetaSketch":
        """A \\ B: survivors of A below min-theta absent from B — the
        set difference KMV's resemblance estimator cannot express."""
        self._check_compatible(other)
        out = ThetaSketch(self.k, name=self.name)
        out.theta = min(self.theta, other.theta)
        a = _below(self.hashes, out.theta)
        out.hashes = a[~np.isin(a, other.hashes, assume_unique=True)]
        return out

    def union_estimate(self, other: "ThetaSketch") -> float:
        return self.union(other).cardinality()

    def intersection_estimate(self, other: "ThetaSketch") -> float:
        return self.intersect(other).cardinality()

    def a_not_b_estimate(self, other: "ThetaSketch") -> float:
        return self.a_not_b(other).cardinality()

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        self._check_compatible(other)
        u = self.union(other)
        self.theta, self.hashes = u.theta, u.hashes
        return self

    def _meta_compat(self) -> dict:
        return {"k": self.k}

    def finalize(self) -> dict:
        return {"k": self.k, "kept": int(self.hashes.size),
                "theta": self.theta / _FULL,
                "estimate": self.cardinality(),
                "rel_error_bound": self.relative_error_bound()}

    # -- serialization -----------------------------------------------------
    def _meta(self) -> dict:
        # theta as a decimal string: 2^64 exceeds JSON interop range
        return {"k": self.k, "name": self.name, "theta": str(self.theta)}

    def _arrays(self) -> list[np.ndarray]:
        return [self.hashes]

    def _set_arrays(self, arrays) -> None:
        self.hashes = arrays[0].astype(np.uint64, copy=True)

    @classmethod
    def _from_meta(cls, meta) -> "ThetaSketch":
        obj = cls(meta["k"], name=meta.get("name", "DEFAULT"))
        obj.theta = int(meta["theta"])
        return obj
