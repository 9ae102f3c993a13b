"""Group-size sampler — sketch+sample group-by result estimation.

Engine extension beyond the reference scope, implemented from the
published idea of "Every Row Counts: Combining Sketches and Sampling
for Accurate Group-By Result Estimates" (CIDR 2019 — one of the
round's retrieved papers): row samples are blind to rare groups (a
1% row sample almost never sees a singleton group), so group-by
result-size estimation needs BOTH a distinct sketch for the group
count and a sample OVER GROUPS (not rows) for the group-size
distribution.

One mergeable state, one pass:
- an HLL over the group key → the number of groups D̂;
- a bottom-k distinct sample (KMV property: a key whose hash is among
  the global k smallest is among the k smallest of EVERY partial that
  saw it) carrying EXACT per-key counts — on merge, counts for the
  same key hash ADD, then the union is cut back to the k smallest, so
  the surviving sample's counts are exact end-to-end and the sample
  is uniform over distinct keys;
- the exact total row count.

Estimates: ``n_groups()`` from the HLL; ``frac_groups_le(s)`` — the
fraction of groups with ≤ s rows — from the group-uniform sample
(binomial error √(p(1−p)/k), INDEPENDENT of how rare those groups'
rows are: the paper's point); ``groups_le(s) = frac · D̂``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Sketch, SketchError, register
from .hll import HyperLogLog
from ..hashing import mmh3_128_batch


@register
class GroupSizeSampler(Sketch):
    MAGIC = b"!gssizes"

    def __init__(self, k: int = 1024, p: int = 12, name: str = "DEFAULT"):
        if k < 16:
            raise SketchError("k must be >= 16")
        self.k = int(k)
        self.p = int(p)
        self.name = name
        self.hll = HyperLogLog(self.p)
        self.hashes = np.empty(0, dtype=np.uint64)   # sorted bottom-k
        self.counts = np.empty(0, dtype=np.int64)    # exact, aligned
        self.rows = 0

    # -- update -------------------------------------------------------
    def update_weighted(self, arr, counts) -> None:
        """(key, count) bulk update — feed per-batch pre-aggregated
        group counts (Arrow ``value_counts``); repeated keys across
        calls accumulate exactly."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        cnts = np.asarray(counts, dtype=np.int64)
        if len(cnts) != len(arr):
            raise SketchError(
                f"update_weighted: {len(arr)} keys vs {len(cnts)} counts")
        if len(arr) == 0:
            return
        if (cnts <= 0).any():
            raise SketchError("update_weighted: counts must be > 0")
        self.hll.update_arrow(arr)
        self.rows += int(cnts.sum())
        h1, _ = mmh3_128_batch(arr)
        self._absorb(h1.astype(np.uint64), cnts)

    def update_arrow(self, arr) -> None:
        """Raw key stream: one pre-aggregation then the weighted path."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return
        vc = arr.value_counts()
        self.update_weighted(vc.field("values"), np.asarray(
            vc.field("counts"), dtype=np.int64))

    def _absorb(self, h: np.ndarray, c: np.ndarray) -> None:
        allh = np.concatenate([self.hashes, h])
        allc = np.concatenate([self.counts, c])
        order = np.argsort(allh, kind="stable")
        allh, allc = allh[order], allc[order]
        uh, start = np.unique(allh, return_index=True)
        sums = np.add.reduceat(allc, start)
        if uh.size > self.k:
            uh, sums = uh[:self.k], sums[:self.k]
        self.hashes, self.counts = uh, sums

    # -- estimates ----------------------------------------------------
    def n_groups(self) -> float:
        return self.hll.cardinality()

    def n_groups_error_bound(self) -> float:
        """HLL standard error 1.04/√m (relative)."""
        return 1.04 / (2 ** (self.p / 2.0))

    def frac_groups_le(self, s: int) -> float:
        """Fraction of groups with ≤ s rows, from the group-uniform
        sample; ±√(p(1−p)/k) binomial error regardless of row share."""
        if self.hashes.size == 0:
            return 0.0
        return float((self.counts <= s).mean())

    def groups_le(self, s: int) -> float:
        return self.frac_groups_le(s) * self.n_groups()

    def sample_error_bound(self) -> float:
        return 1.0 / np.sqrt(max(1, min(self.k, self.hashes.size)))

    # -- algebra ------------------------------------------------------
    def merge(self, other: "GroupSizeSampler") -> "GroupSizeSampler":
        self._check_compatible(other)
        self.hll.merge(other.hll)
        self.rows += other.rows
        self._absorb(other.hashes, other.counts)
        return self

    def finalize(self) -> dict:
        return {"rows": self.rows, "n_groups_est": self.n_groups(),
                "sampled": int(self.hashes.size)}

    def _meta_compat(self) -> dict:
        return {"k": self.k, "p": self.p}

    # -- ser/de -------------------------------------------------------
    def _meta(self) -> dict:
        return {"k": self.k, "p": self.p, "name": self.name,
                "rows": self.rows,
                "hll_state": self.hll.to_bytes().hex()}

    def _arrays(self):
        return [self.hashes, self.counts]

    def _set_arrays(self, arrays):
        self.hashes = arrays[0].astype(np.uint64, copy=True)
        self.counts = arrays[1].astype(np.int64, copy=True)

    @classmethod
    def _from_meta(cls, meta):
        from .base import sketch_from_bytes

        obj = cls(meta["k"], meta.get("p", 12), meta.get("name", "DEFAULT"))
        obj.rows = meta.get("rows", 0)
        obj.hll = sketch_from_bytes(bytes.fromhex(meta["hll_state"]))
        return obj
