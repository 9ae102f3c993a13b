"""KLL sketch — quantiles with deterministic-space guarantees.

Engine extension required by the north rule (not in the reference C
library), implemented from the published algorithm (Karnin, Lang,
Liberty 2016): a stack of compactors; level h items carry weight 2^h;
a full level sorts itself and promotes every other item (random even /
odd offset) to level h+1.

Contract: additive rank error ε with probability 1−δ in space
O((1/ε)·√log(1/δ)); with the geometric capacity schedule used here
(c = 2/3), ε ≈ 2.9/k.  Merge = level-wise concatenation + compaction
(the paper's merge), associative within the same bound.

Randomness: the even/odd coin uses a counter-seeded PCG64 stream
(seed, compaction#) so a given build is reproducible; merges of
differently-shaped partials are equivalent in distribution.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .base import Sketch, SketchError, register

_C = 2.0 / 3.0  # capacity decay per level below the top


@register
class KLLSketch(Sketch):
    MAGIC = b"!kllqntl"

    def __init__(self, k: int = 200, seed: int = 42, name: str = "DEFAULT"):
        if k < 8:
            raise SketchError("k must be >= 8")
        self.k = int(k)
        self.seed = int(seed)
        self.name = name
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._compactions = 0
        self.min = math.inf
        self.max = -math.inf

    def _capacity(self, h: int, num_levels: int) -> int:
        # top level gets k, lower levels shrink geometrically, floor 8
        depth = num_levels - 1 - h
        return max(8, int(math.ceil(self.k * (_C ** depth))))

    # -- update -------------------------------------------------------
    def update_arrow(self, arr) -> None:
        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            vals = np.asarray(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr, dtype=np.float64)
        else:
            vals = np.asarray(arr, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        self.n += vals.size
        self.min = min(self.min, float(vals.min()))
        self.max = max(self.max, float(vals.max()))
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compact_all()

    def update_weighted(self, arr, counts) -> None:
        """Weighted update for the count-row grouped-build shuffle: a
        (value, count) pair enters by BIT DECOMPOSITION — the value is
        written once into every level ``h`` where bit ``h`` of the
        count is set (level h items carry weight 2^h), which is
        precisely the shape of the paper's level-wise merge, so the
        deterministic rank-error story is unchanged."""
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
            self.levels.append(np.empty(0, dtype=np.float64))
        for h in range(max_bits):
            sel = ((cnts >> h) & 1) == 1
            if sel.any():
                self.levels[h] = np.concatenate([self.levels[h], vals[sel]])
        self._compact_all()

    def _compact_all(self) -> None:
        h = 0
        while h < len(self.levels):
            cap = self._capacity(h, len(self.levels))
            if self.levels[h].size > cap:
                buf = np.sort(self.levels[h])
                rng = np.random.default_rng((self.seed, self._compactions))
                self._compactions += 1
                offset = int(rng.integers(0, 2))
                promoted = buf[offset::2]
                self.levels[h] = np.empty(0, dtype=np.float64)
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            h += 1

    # -- queries ------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, lvl in enumerate(self.levels):
            if lvl.size:
                vals.append(lvl)
                wts.append(np.full(lvl.size, float(1 << h)))
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
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, v.size - 1)
        return float(v[i])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, x: float) -> float:
        """Estimated normalized rank of x."""
        v, w = self._weighted_items()
        if v.size == 0:
            return math.nan
        mask = v <= x
        return float(w[mask].sum() / w.sum())

    def error_bound(self) -> float:
        """Approximate additive rank-error bound for this k."""
        return 2.9 / self.k

    # -- algebra ------------------------------------------------------
    def merge(self, other: "KLLSketch") -> "KLLSketch":
        self._check_compatible(other)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lvl in enumerate(other.levels):
            if lvl.size:
                self.levels[h] = np.concatenate([self.levels[h], lvl])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        # advance the coin stream so merged compactions stay decorrelated
        self._compactions = max(self._compactions, other._compactions) + 1
        self._compact_all()
        return self

    def finalize(self) -> dict:
        return {"n": self.n, "levels": len(self.levels),
                "retained": int(sum(l.size for l in self.levels))}

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
            "min": self.min if math.isfinite(self.min) else None,
            "max": self.max if math.isfinite(self.max) else None,
        }

    def _arrays(self):
        return list(self.levels)

    def _set_arrays(self, arrays):
        self.levels = [a.astype(np.float64, copy=True) for a in arrays]

    @classmethod
    def _from_meta(cls, meta):
        obj = cls(meta["k"], meta.get("seed", 42), meta.get("name", "DEFAULT"))
        obj.n = meta.get("n", 0)
        obj._compactions = meta.get("compactions", 0)
        obj.min = meta["min"] if meta.get("min") is not None else math.inf
        obj.max = meta["max"] if meta.get("max") is not None else -math.inf
        return obj
