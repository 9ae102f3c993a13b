"""VarOpt-style weighted sample sketch (systematic threshold sampling).

Engine extension (the reference C library has no sampling structure —
its nearest relative is the same count-distinct gap KMV fills): a
MERGEABLE fixed-size weighted sample, the primitive a training-data
pipeline uses to draw "k documents ∝ weight" (length, quality score,
domain priority) from an unbounded stream with exact subset-sum
estimators.  Built from the published threshold/VarOpt line (Duffield,
Lund & Thorup JACM'07 priority sampling; Cohen, Duffield, Kaplan,
Lund & Thorup SODA'09 "VarOpt" variance-optimal sampling; Agarwal et
al. PODS'12 mergeable summaries):

* state = ≤k (value, adjusted weight) pairs + threshold τ.  Items with
  weight > τ are kept EXACTLY (weight untouched); the rest survive
  with probability w/τ and carry adjusted weight τ.
* the survivor draw is SYSTEMATIC over the cumulative w/τ scale (one
  uniform start per rebuild from a splitmix64 counter stream — cheap,
  deterministic, reproducible), so exactly k items survive and the
  TOTAL is preserved deterministically:

      Σ adjusted = Σ_large w + (k−j)·τ = W   (exact in real
      arithmetic, ≤ ~1e-12 relative in float after any number of
      rebuilds/merges — asserted by the oracle-checked query)

* merge = concatenate adjusted pairs + one rebuild; the threshold
  solved over adjusted weights equals the threshold over the original
  multiset (the classic mergeability argument), so invariants
  (|sample| = k, total preserved, w > τ ⇒ always kept) survive any
  merge tree.  The kept SET depends on the merge order (like any
  mergeable sampler); estimates stay unbiased per item.
* subset-sum estimate = Σ adjusted weights of matching kept items;
  per-item inclusion P = min(1, w/τ); Var(Σ̂_S) ≤ τ·W_S (each small
  item contributes w(τ−w) ≤ τw; systematic draws are negatively
  associated) — ``subset_error_bound`` returns 1σ = √(τ·W_S).

Weights are INTEGER by contract (the engine's integer-cents
discipline) so the tracked ``total_weight`` is exact and
partition-order-independent; only τ and adjusted weights are float.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_64_batch
from .base import Sketch, SketchError, register


def _splitmix64(x: np.uint64) -> np.uint64:
    with np.errstate(over="ignore"):  # mod-2^64 wraparound intended
        x = np.uint64(x) + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


@register
class VarOptSampler(Sketch):
    MAGIC = b"!varopts"

    def __init__(self, k: int = 256, seed: int = 42, name: str = "DEFAULT"):
        if k < 2:
            raise SketchError("k must be >= 2")
        self.k = int(k)
        self.seed = int(seed)
        self.name = name
        self.tau = 0.0                   # 0 while the sample is exact
        self.total_weight = 0            # exact int Σ original weights
        self.n_items = 0                 # rows seen
        self.rebuilds = 0                # drives the splitmix coin
        self._values: list[bytes] = []
        self.weights = np.empty(0, dtype=np.float64)   # adjusted

    # -- update -------------------------------------------------------
    def update_weighted(self, arr, weights) -> None:
        """Bulk insert of (value, integer weight) pairs; ONE rebuild
        per call regardless of batch size."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        w = np.asarray(weights, dtype=np.int64)
        if len(w) != len(arr):
            raise SketchError(
                f"update_weighted: {len(arr)} values vs {len(w)} weights")
        if len(arr) == 0:
            return
        if (w <= 0).any():
            raise SketchError("update_weighted: weights must be > 0")
        vals = arr.to_pylist()
        enc = [(v if isinstance(v, bytes) else str(v).encode())
               for v in vals]
        self.total_weight += int(w.sum())
        self.n_items += len(enc)
        self._values.extend(enc)
        self.weights = np.concatenate(
            [self.weights, w.astype(np.float64)])
        if len(self._values) > self.k:
            self._rebuild()

    def update_arrow(self, arr) -> None:
        """Unweighted stream: every row weight 1 (uniform reservoir
        behavior)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return
        self.update_weighted(arr, np.ones(len(arr), dtype=np.int64))

    # -- the one-shot threshold rebuild -------------------------------
    def _rebuild(self) -> None:
        """Reduce the current (value, adjusted weight) multiset to
        exactly k survivors: canonical order (weight DESC, value-hash
        ASC — partitioning-invariant), split large/small at the
        threshold τ_j = remaining/(k−j), then a systematic draw of the
        smalls on the cumulative w/τ scale."""
        m = len(self._values)
        w = self.weights
        h = mmh3_64_batch(
            pa.array(self._values, type=pa.large_binary())
        ).astype(np.uint64)
        order = np.lexsort((h, -w))
        w = w[order]
        vals = [self._values[i] for i in order]

        total = float(w.sum())
        # smallest j with w[j] <= (total - Σ_{i<j} w_i)/(k - j)
        prefix = np.concatenate(([0.0], np.cumsum(w[: self.k])))
        j = self.k - 1  # fallback: keep k-1 largest exactly
        for cand in range(self.k):
            tau_c = (total - prefix[cand]) / (self.k - cand)
            if w[cand] <= tau_c:
                j = cand
                break
        tau = (total - prefix[j]) / (self.k - j)
        n_pick = self.k - j
        smalls_w = w[j:]
        # systematic draw: picks at u0 + 0,1,...,n_pick-1 on the
        # cumulative w/τ scale (which totals n_pick by construction)
        u0 = float(_splitmix64(np.uint64(
            (self.seed << 20) ^ self.rebuilds))) / 2.0 ** 64
        cum = np.cumsum(smalls_w / tau)
        picks = np.searchsorted(cum, u0 + np.arange(n_pick), side="right")
        picks = np.minimum(picks, smalls_w.size - 1)  # float-edge clamp
        # strict increase is guaranteed in exact arithmetic (unit
        # spacing, intervals <= 1); the clamp can collide the LAST pick
        # after float rounding — repair backwards so survivors stay
        # distinct
        for i in range(n_pick - 2, -1, -1):
            if picks[i] >= picks[i + 1]:
                picks[i] = picks[i + 1] - 1
        self._values = vals[:j] + [vals[j + int(p)] for p in picks]
        self.weights = np.concatenate(
            [w[:j], np.full(n_pick, tau, dtype=np.float64)])
        self.tau = max(self.tau, tau)
        self.rebuilds += 1

    # -- queries ------------------------------------------------------
    def total_estimate(self) -> float:
        """Σ adjusted weights — preserves the exact total by
        construction (up to float rounding)."""
        return float(self.weights.sum())

    def sample(self) -> list[tuple[bytes, float]]:
        """The kept (value, adjusted weight) pairs."""
        return list(zip(self._values, self.weights.tolist()))

    def subset_estimate(self, predicate) -> float:
        """Unbiased Σ weights over the (unknown-size) subset of the
        stream whose values satisfy ``predicate(value_bytes)``."""
        if not self._values:
            return 0.0
        mask = np.fromiter((bool(predicate(v)) for v in self._values),
                           dtype=bool, count=len(self._values))
        return float(self.weights[mask].sum())

    def subset_error_bound(self, subset_weight: float) -> float:
        """1σ bound √(τ·W_S) for a subset of (estimated or known)
        total weight ``subset_weight``."""
        return math.sqrt(max(self.tau, 0.0) * max(subset_weight, 0.0))

    def is_exact(self) -> bool:
        """True while nothing has been evicted (estimates exact)."""
        return self.rebuilds == 0

    # -- algebra ------------------------------------------------------
    def merge(self, other: "VarOptSampler") -> "VarOptSampler":
        self._check_compatible(other)
        self._values.extend(other._values)
        self.weights = np.concatenate([self.weights, other.weights])
        self.total_weight += other.total_weight
        self.n_items += other.n_items
        self.tau = max(self.tau, other.tau)
        # decorrelate the merged coin stream from both operands'
        self.rebuilds = self.rebuilds + other.rebuilds + 1
        if len(self._values) > self.k:
            self._rebuild()
        return self

    def _meta_compat(self) -> dict:
        return {"k": self.k, "seed": self.seed}

    def finalize(self) -> dict:
        return {"k": self.k, "kept": len(self._values),
                "tau": self.tau, "total_weight": self.total_weight,
                "total_estimate": self.total_estimate()}

    # -- serialization ------------------------------------------------
    def _meta(self) -> dict:
        return {"k": self.k, "seed": self.seed, "name": self.name,
                "tau": self.tau, "total_weight": self.total_weight,
                "n_items": self.n_items, "rebuilds": self.rebuilds}

    def _arrays(self) -> list[np.ndarray]:
        data = b"".join(self._values)
        offsets = np.zeros(len(self._values) + 1, dtype=np.int64)
        np.cumsum([len(v) for v in self._values], out=offsets[1:])
        return [self.weights, offsets,
                np.frombuffer(data, dtype=np.uint8).copy()]

    def _set_arrays(self, arrays) -> None:
        self.weights, offsets, data = arrays
        self.weights = self.weights.astype(np.float64)
        buf = data.tobytes()
        self._values = [buf[offsets[i]: offsets[i + 1]]
                        for i in range(len(offsets) - 1)]

    @classmethod
    def _from_meta(cls, meta: dict) -> "VarOptSampler":
        obj = cls(meta["k"], seed=meta["seed"], name=meta.get("name", "DEFAULT"))
        obj.tau = float(meta["tau"])
        obj.total_weight = int(meta["total_weight"])
        obj.n_items = int(meta["n_items"])
        obj.rebuilds = int(meta["rebuilds"])
        return obj
