"""Misra-Gries heavy-hitters sketch (mergeable summary).

The candidate-producing half of the heavy-hitter story: count-min
(``cms.py``) answers point queries but needs a candidate set; Misra-
Gries carries its own top-k candidates and is mergeable with the same
deterministic bound, per the mergeable-summaries construction (Agarwal,
Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS'12):

    merge = pointwise counter add, then subtract the (k+1)-th largest
    counter from all and drop the non-positive ones.

Guarantee (any sequence of batch updates + merges over n total items):

    est(x) ≤ true(x) ≤ est(x) + (n − Σ counters) / (k + 1)

so every key with true count > (n − Σcounters)/(k+1) is present in the
summary.  No reference-C counterpart (archbloom has no heavy-hitter
structure); the closest reference op is ``cbloom_count_elements_above_
threshold`` (cbloom.c:310-321), which this subsumes with an explicit
candidate list.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import Sketch, SketchError, register


@register
class MisraGries(Sketch):
    MAGIC = b"!mgheavy"

    def __init__(self, k: int = 50, name: str = "DEFAULT"):
        if k <= 0:
            raise SketchError("k must be > 0")
        self.k = int(k)
        self.n = 0  # total items observed (for the error bound)
        self.counters: dict[bytes, int] = {}
        self.name = name

    # -- update -------------------------------------------------------
    def update_arrow(self, arr) -> None:
        if len(arr) == 0:
            return
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vc = arr.value_counts()  # struct<values, counts> — one pass, vectorized
        keys = vc.field("values")
        counts = np.asarray(vc.field("counts"), dtype=np.int64)
        self.n += int(counts.sum())
        enc = [(x if isinstance(x, bytes) else str(x).encode()) for x in keys.to_pylist()]
        self._absorb(enc, counts)

    def update_weighted(self, arr, counts) -> None:
        """(value, count) bulk update — absorbs pre-aggregated counts;
        the mergeable-summaries bound holds for any batch/merge order."""
        if len(arr) == 0:
            return
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        counts = np.asarray(counts, dtype=np.int64)
        self.n += int(counts.sum())
        enc = [(x if isinstance(x, bytes) else str(x).encode()) for x in arr.to_pylist()]
        self._absorb(enc, counts)

    def _absorb(self, keys: list[bytes], counts: np.ndarray) -> None:
        c = self.counters
        for key, cnt in zip(keys, counts):
            c[key] = c.get(key, 0) + int(cnt)
        if len(c) > self.k:
            # subtract the (k+1)-th largest counter value; drop ≤ 0
            vals = np.fromiter(c.values(), dtype=np.int64, count=len(c))
            thresh = int(np.partition(vals, len(vals) - self.k - 1)[len(vals) - self.k - 1])
            self.counters = {key: v - thresh for key, v in c.items() if v > thresh}

    # -- merge / queries ----------------------------------------------
    def merge(self, other: "MisraGries") -> "MisraGries":
        self._check_compatible(other)
        self.n += other.n
        self._absorb(list(other.counters), np.fromiter(
            other.counters.values(), dtype=np.int64, count=len(other.counters)))
        return self

    def _meta_compat(self) -> dict:
        return {"k": self.k}  # n is state, not a merge-compat parameter

    def error_bound(self) -> int:
        """Max undercount of any key's estimate (deterministic)."""
        residual = self.n - sum(self.counters.values())
        return residual // (self.k + 1) + (1 if residual % (self.k + 1) else 0)

    def candidates(self) -> list[tuple[bytes, int]]:
        """(key, lower-bound count) sorted descending — every key with
        true count > error_bound() is guaranteed present."""
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))

    def estimate(self, key: bytes | str) -> int:
        if isinstance(key, str):
            key = key.encode()
        return self.counters.get(key, 0)

    def finalize(self) -> list[tuple[bytes, int]]:
        return self.candidates()

    # -- serialization -------------------------------------------------
    def _meta(self) -> dict:
        return {"k": self.k, "n": self.n, "name": self.name}

    def _arrays(self) -> list[np.ndarray]:
        items = self.candidates()
        counts = np.array([v for _, v in items], dtype=np.int64)
        data = b"".join(key for key, _ in items)
        offsets = np.zeros(len(items) + 1, dtype=np.int64)
        np.cumsum([len(key) for key, _ in items], out=offsets[1:])
        return [counts, offsets, np.frombuffer(data, dtype=np.uint8).copy()]

    def _set_arrays(self, arrays) -> None:
        counts, offsets, data = arrays
        buf = data.tobytes()
        self.counters = {
            buf[offsets[i]: offsets[i + 1]]: int(counts[i])
            for i in range(len(counts))
        }

    @classmethod
    def _from_meta(cls, meta) -> "MisraGries":
        obj = cls(meta["k"], name=meta.get("name", "DEFAULT"))
        obj.n = int(meta["n"])
        return obj
