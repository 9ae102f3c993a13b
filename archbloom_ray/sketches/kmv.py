"""KMV (k-minimum-values / bottom-k) sketch — mergeable distinct-count
estimator AND uniform sample of distinct values.

Engine extension (the reference C library has no sampling structure;
nearest relative is its HLL-free cardinality gap — reference
README.md:80-104 lists count-distinct as unimplemented).  Built from
the published construction (Bar-Yossef et al. 2002; Beyer et al.
SIGMOD'07 unbiased estimator):

    keep the k smallest 64-bit hashes of the values seen, with the
    values themselves riding along.

* merge = multiset union of survivors, keep k smallest (exactly equal
  to a single-pass build over the union — order-insensitive, so the
  distributed tree merge is EXACT, not approximate).
* distinct estimate: exact |kept| while fewer than k distinct values
  have been seen; else the unbiased (k−1)/U_(k) with U_(k) = k-th
  smallest hash normalized to (0,1].  Relative error ≈ 1/√(k−2)
  (Beyer et al. §4) — ``relative_error_bound`` returns that.
* the kept VALUES are a uniform-without-replacement sample of the
  DISTINCT value set (each distinct value's hash is an iid uniform
  draw), usable directly as a mergeable distributed sampler.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_64_batch
from .base import Sketch, SketchError, register


@register
class KMVSketch(Sketch):
    MAGIC = b"!kmvbtk!"

    def __init__(self, k: int = 1024, name: str = "DEFAULT"):
        if k < 3:
            raise SketchError("k must be ≥ 3 (estimator needs k-2 > 0)")
        self.k = int(k)
        self.name = name
        self.hashes = np.empty(0, dtype=np.uint64)  # sorted ascending
        self._values: list[bytes] = []              # aligned with hashes

    # -- update ---------------------------------------------------------
    def update_arrow(self, arr) -> None:
        if len(arr) == 0:
            return
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        h = mmh3_64_batch(arr).astype(np.uint64)
        # pre-prune: only candidates below the current k-th value matter
        if self.hashes.size >= self.k:
            cutoff = self.hashes[self.k - 1]
            keep = h < cutoff
        else:
            keep = np.ones(h.size, dtype=bool)
        if not keep.any():
            return
        idx = np.flatnonzero(keep)
        cand_h = h[idx]
        order = np.argsort(cand_h, kind="stable")
        cand_h = cand_h[order]
        # distinct hashes only (hash collision ⇒ treated as one value)
        first = np.ones(cand_h.size, dtype=bool)
        np.not_equal(cand_h[1:], cand_h[:-1], out=first[1:])
        sel = idx[order][first]
        cand_h = cand_h[first]
        vals = arr.take(pa.array(sel)).to_pylist()
        enc = [(v if isinstance(v, bytes) else str(v).encode()) for v in vals]
        self._absorb(cand_h, enc)

    def update_weighted(self, arr, counts) -> None:
        """Count-weighted update: multiplicity is irrelevant to a
        distinct sampler, so this is ``update_arrow`` on the values —
        it lets the grouped count-row build path drive KMVs too."""
        self.update_arrow(arr)

    def _absorb(self, new_h: np.ndarray, new_vals: list[bytes]) -> None:
        merged_h = np.concatenate([self.hashes, new_h])
        merged_v = self._values + new_vals
        order = np.argsort(merged_h, kind="stable")
        merged_h = merged_h[order]
        first = np.ones(merged_h.size, dtype=bool)
        np.not_equal(merged_h[1:], merged_h[:-1], out=first[1:])
        sel = np.flatnonzero(first)[: self.k]
        self.hashes = merged_h[sel].copy()
        self._values = [merged_v[order[i]] for i in sel]

    # -- queries ----------------------------------------------------------
    def cardinality(self) -> float:
        """Exact below k distinct; unbiased (k−1)/U_(k) at capacity."""
        n = self.hashes.size
        if n < self.k:
            return float(n)
        u_k = (float(self.hashes[self.k - 1]) + 1.0) / 2.0**64
        return (self.k - 1) / u_k

    def relative_error_bound(self) -> float:
        """1σ relative error ≈ 1/√(k−2) (Beyer et al. SIGMOD'07)."""
        return 1.0 / math.sqrt(self.k - 2)

    def sample(self) -> list[bytes]:
        """Uniform-without-replacement sample of the distinct values
        (≤ k items; all distinct values when fewer were seen)."""
        return list(self._values)

    def union_estimate(self, other: "KMVSketch") -> float:
        """Distinct count of A ∪ B: build the union sketch (the KMV
        merge is exactly the union's own bottom-k) and read its
        estimate.  Does not mutate either operand."""
        self._check_compatible(other)
        u = KMVSketch(self.k, name=self.name)
        u._absorb(self.hashes, list(self._values))
        u._absorb(other.hashes, list(other._values))
        return u.cardinality()

    def intersection_estimate(self, other: "KMVSketch") -> float:
        """Distinct count of A ∩ B via the k-min resemblance estimator
        (Beyer et al. SIGMOD'07 §5): over the union's bottom-k, the
        fraction of hashes present in BOTH sketches estimates the
        Jaccard ρ; the estimate is ρ·|A ∪ B|.  Exact whenever both
        sketches still hold their full distinct sets (n < k)."""
        self._check_compatible(other)
        union_h = np.union1d(self.hashes, other.hashes)[: self.k]
        if union_h.size == 0:
            return 0.0
        in_both = (np.isin(union_h, self.hashes,  assume_unique=True)
                   & np.isin(union_h, other.hashes, assume_unique=True))
        rho = in_both.sum() / union_h.size
        return float(rho * self.union_estimate(other))

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "KMVSketch") -> "KMVSketch":
        self._check_compatible(other)
        self._absorb(other.hashes, list(other._values))
        return self

    def _meta_compat(self) -> dict:
        return {"k": self.k}

    def finalize(self) -> dict:
        return {"k": self.k, "kept": int(self.hashes.size),
                "estimate": self.cardinality(),
                "rel_error_bound": self.relative_error_bound()}

    # -- serialization -----------------------------------------------------
    def _meta(self) -> dict:
        return {"k": self.k, "name": self.name}

    def _arrays(self) -> list[np.ndarray]:
        data = b"".join(self._values)
        offsets = np.zeros(len(self._values) + 1, dtype=np.int64)
        np.cumsum([len(v) for v in self._values], out=offsets[1:])
        return [self.hashes, offsets, np.frombuffer(data, dtype=np.uint8).copy()]

    def _set_arrays(self, arrays) -> None:
        hashes, offsets, data = arrays
        self.hashes = hashes.astype(np.uint64, copy=True)
        buf = data.tobytes()
        self._values = [buf[offsets[i]: offsets[i + 1]]
                        for i in range(len(self.hashes))]

    @classmethod
    def _from_meta(cls, meta) -> "KMVSketch":
        return cls(meta["k"], name=meta.get("name", "DEFAULT"))
