"""VarOpt-style weighted sample sketch (systematic threshold sampling).

Engine extension (the reference C library has no sampling structure —
its nearest relative is the same count-distinct gap KMV fills): a
MERGEABLE fixed-size weighted sample, the primitive a training-data
pipeline uses to draw "k documents ∝ weight" (length, priority,
domain quota) from an unbounded stream with exact subset-sum
estimators.  Built from the published threshold/VarOpt line (Duffield,
Lund & Thorup JACM'07 priority sampling; Cohen, Duffield, Kaplan,
Lund & Thorup SODA'09 "VarOpt" variance-optimal sampling; Agarwal et
al. PODS'12 mergeable summaries):

* state = ≤k (value, adjusted weight) pairs + threshold τ.  Items with
  weight > τ are kept EXACTLY (weight untouched); the rest survive
  with probability w/τ and carry adjusted weight τ.
* the survivor draw is SYSTEMATIC over the cumulative w/τ scale in
  VALUE-HASH order (a deterministic pseudo-random permutation — NOT
  weight order, which would correlate periodic subsets and inflate
  subset variance severalfold), with one uniform start per rebuild
  from the shared :func:`archbloom_ray.hashing.splitmix64` counter
  stream.  Exactly k items survive and the TOTAL is preserved
  deterministically:

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
  per-item inclusion P = min(1, w/τ); over the hash-permuted
  systematic draw Var(Σ̂_S) ≲ τ·W_S (per-item w(τ−w) ≤ τw) —
  ``subset_error_bound`` returns 1σ = √(τ·W_S), empirically validated
  in tests/test_varopt.py including the periodic-subset adversary.

Weights are INTEGER by contract (the engine's integer-cents
discipline; non-integral floats are rejected, never truncated) so the
tracked ``total_weight`` is exact and partition-order-independent;
only τ and adjusted weights are float.  Batches stay Arrow until the
survivor set is known — only ≤k values per rebuild are materialized
as Python bytes.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_64_batch, splitmix64
from .base import Sketch, SketchError, register


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
        self.hashes = np.empty(0, dtype=np.uint64)     # mmh3_64(value)

    # -- update -------------------------------------------------------
    @staticmethod
    def _int_weights(arr, weights) -> np.ndarray:
        w = np.asarray(weights)
        if w.dtype.kind == "f":
            if not np.isfinite(w).all() or (w != np.floor(w)).any():
                raise SketchError(
                    "update_weighted: weights must be integers (the "
                    "exact-total contract) — scale scores to fixed "
                    "point first, never rely on truncation")
        w = w.astype(np.int64)
        if len(w) != len(arr):
            raise SketchError(
                f"update_weighted: {len(arr)} values vs {len(w)} weights")
        if (w <= 0).any():
            raise SketchError("update_weighted: weights must be > 0")
        return w

    def update_weighted(self, arr, weights) -> None:
        """Bulk insert of (value, integer weight) pairs; ONE rebuild
        per call regardless of batch size, and only the ≤k survivors
        are ever materialized off Arrow."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        w = self._int_weights(arr, weights)
        if len(arr) == 0:
            return
        self.total_weight += int(w.sum())
        self.n_items += len(arr)
        h_new = mmh3_64_batch(arr).astype(np.uint64)
        w_all = np.concatenate([self.weights, w.astype(np.float64)])
        h_all = np.concatenate([self.hashes, h_new])
        n0 = len(self._values)

        def enc(i: int) -> bytes:
            v = arr[i].as_py()
            return v if isinstance(v, bytes) else str(v).encode()

        if w_all.size <= self.k:
            self._values.extend(enc(i) for i in range(len(arr)))
            self.weights, self.hashes = w_all, h_all
            return
        keep, new_w, tau = self._select(w_all, h_all)
        self._values = [self._values[i] if i < n0 else enc(i - n0)
                        for i in keep.tolist()]
        self.weights = new_w
        self.hashes = h_all[keep]
        self.tau = max(self.tau, tau)

    def update_arrow(self, arr) -> None:
        """Unweighted stream: every row weight 1 (uniform reservoir
        behavior)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return
        self.update_weighted(arr, np.ones(len(arr), dtype=np.int64))

    # -- the one-shot threshold selection -----------------------------
    def _select(self, w: np.ndarray, h: np.ndarray):
        """Pick exactly k survivor INDICES from (adjusted weight,
        value-hash) arrays: weight order finds the large/small split
        and τ; the systematic draw then runs over the smalls in HASH
        order so periodic weight-order subsets are not correlated.
        Returns (indices, adjusted weights aligned with them, τ)."""
        order = np.lexsort((h, -w))
        w_s = w[order]
        total = float(w.sum())
        prefix = np.concatenate(([0.0], np.cumsum(w_s[: self.k])))
        j = self.k - 1  # always reachable: τ grows as k−j shrinks
        for cand in range(self.k):
            tau_c = (total - prefix[cand]) / (self.k - cand)
            if w_s[cand] <= tau_c:
                j = cand
                break
        tau = (total - prefix[j]) / (self.k - j)
        n_pick = self.k - j
        smalls = order[j:]
        smalls = smalls[np.argsort(h[smalls], kind="stable")]
        sw = w[smalls]
        u0 = splitmix64((self.seed << 20) ^ self.rebuilds) / 2.0 ** 64
        cum = np.cumsum(sw / tau)
        picks = np.searchsorted(cum, u0 + np.arange(n_pick), side="right")
        picks = np.minimum(picks, sw.size - 1)  # float-edge clamp
        # strict increase is guaranteed in exact arithmetic (unit
        # spacing, intervals <= 1); the clamp can collide the LAST pick
        # after float rounding — repair backwards so survivors stay
        # distinct
        for i in range(n_pick - 2, -1, -1):
            if picks[i] >= picks[i + 1]:
                picks[i] = picks[i + 1] - 1
        keep = np.concatenate([order[:j], smalls[picks]])
        new_w = np.concatenate(
            [w_s[:j], np.full(n_pick, tau, dtype=np.float64)])
        self.rebuilds += 1
        return keep, new_w, tau

    def _compact(self) -> None:
        """Reduce the stored (already-Python) sample to k survivors —
        the merge path's rebuild."""
        keep, new_w, tau = self._select(self.weights, self.hashes)
        self._values = [self._values[i] for i in keep.tolist()]
        self.weights = new_w
        self.hashes = self.hashes[keep]
        self.tau = max(self.tau, tau)

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
        total weight ``subset_weight`` — valid because the systematic
        draw runs over a hash permutation (empirically validated incl.
        the periodic-subset adversary, tests/test_varopt.py)."""
        return math.sqrt(max(self.tau, 0.0) * max(subset_weight, 0.0))

    def is_exact(self) -> bool:
        """True while nothing has ever been evicted (τ still 0 ⇒ every
        item seen is in the sample and estimates are exact) — merges
        that fit within k stay exact."""
        return self.tau == 0.0

    # -- algebra ------------------------------------------------------
    def merge(self, other: "VarOptSampler") -> "VarOptSampler":
        self._check_compatible(other)
        self._values.extend(other._values)
        self.weights = np.concatenate([self.weights, other.weights])
        self.hashes = np.concatenate([self.hashes, other.hashes])
        self.total_weight += other.total_weight
        self.n_items += other.n_items
        self.tau = max(self.tau, other.tau)
        # decorrelate the merged coin stream from both operands'
        self.rebuilds = self.rebuilds + other.rebuilds + 1
        if len(self._values) > self.k:
            self._compact()
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
        return [self.weights, self.hashes, offsets,
                np.frombuffer(data, dtype=np.uint8).copy()]

    def _set_arrays(self, arrays) -> None:
        weights, hashes, offsets, data = arrays
        self.weights = weights.astype(np.float64)
        self.hashes = hashes.astype(np.uint64)
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
