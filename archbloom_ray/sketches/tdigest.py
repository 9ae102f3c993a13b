"""t-digest — quantiles as a mergeable UDAF.

Engine extension required by the north rule (not in the reference C
library), implemented from the published merging t-digest algorithm
(Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests").  Scale function k₁(q) = (δ/2π)·asin(2q−1): cluster sizes
taper toward the tails, giving small relative rank error at extreme
quantiles.

Vectorized compression: sorted (value, weight) points are assigned to
clusters by cutting cumulative weight at the k-scale's integer
boundaries (a valid t-digest per the paper's size bound; boundaries are
data-independent given total weight, so compression is a single
searchsorted + reduceat — no per-point Python loop).

Merge = centroid concat + recompress; associative within the documented
rank-error tolerance (merging digests is the paper's distributed mode).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .base import Sketch, SketchError, register


@register
class TDigest(Sketch):
    MAGIC = b"!tdigest"

    def __init__(self, compression: float = 200.0, name: str = "DEFAULT"):
        if compression < 20:
            raise SketchError("compression must be >= 20")
        self.compression = float(compression)
        self.name = name
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._buf_n = 0
        self.min = math.inf
        self.max = -math.inf

    # -- k-scale ------------------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.compression / (2 * math.pi) * np.arcsin(2 * q - 1)

    def _k_inv(self, k: np.ndarray) -> np.ndarray:
        return (np.sin(k * (2 * math.pi) / self.compression) + 1) / 2

    # -- update -------------------------------------------------------
    def update_arrow(self, arr) -> None:
        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            vals = np.asarray(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr, dtype=np.float64)
        else:
            vals = np.asarray(arr, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        self._buf.append(vals)
        self._buf_n += vals.size
        if self._buf_n >= 8 * self.compression:
            self._compress()

    def update_weighted(self, arr, counts) -> None:
        """Weighted update for the count-row grouped-build shuffle
        (``build_grouped_value_sketches``): each (value, count) pair
        enters as one pre-formed centroid of weight=count — exactly the
        input shape of the paper's digest-merge mode, so the rank-error
        story is unchanged."""
        vals = np.asarray(arr, dtype=np.float64)
        cnts = np.asarray(counts, dtype=np.float64)
        keep = ~np.isnan(vals) & (cnts > 0)
        vals, cnts = vals[keep], cnts[keep]
        if vals.size == 0:
            return
        self._compress(force=True)  # flush the unit-weight buffer first
        self.means = np.concatenate([self.means, vals])
        self.weights = np.concatenate([self.weights, cnts])
        self.min = min(self.min, float(vals.min()))
        self.max = max(self.max, float(vals.max()))
        self._compress(force=True)

    def _compress(self, force: bool = False) -> None:
        if not force and self._buf_n == 0 and self.means.size <= 2 * self.compression:
            return
        parts_m = [self.means] + self._buf
        parts_w = [self.weights] + [np.ones(b.size) for b in self._buf]
        means = np.concatenate(parts_m)
        weights = np.concatenate(parts_w)
        self._buf, self._buf_n = [], 0
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        self.min = min(self.min, float(means[0]))
        self.max = max(self.max, float(means[-1]))
        total = weights.sum()
        # cumulative midpoint quantile of each point
        cum = np.cumsum(weights)
        q_right = cum / total
        # cluster id = floor(k(q_right_edge)); cut where k crosses integers
        k_edges = self._k(np.clip(q_right, 0.0, 1.0))
        cluster = np.floor(k_edges - self._k(np.array([0.0]))[0] - 1e-12).astype(np.int64)
        # group consecutive points with equal cluster id
        boundaries = np.flatnonzero(np.diff(cluster)) + 1
        starts = np.concatenate(([0], boundaries))
        w_sums = np.add.reduceat(weights, starts)
        m_sums = np.add.reduceat(weights * means, starts)
        self.means = m_sums / w_sums
        self.weights = w_sums

    # -- queries ------------------------------------------------------
    @property
    def total_weight(self) -> float:
        return float(self.weights.sum()) + float(self._buf_n)

    def quantile(self, q: float) -> float:
        """Estimate the q-quantile by interpolating centroid midpoints."""
        self._compress()
        n = self.means.size
        if n == 0:
            return math.nan
        if n == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        # centroid midpoints in cumulative weight
        cum = np.cumsum(self.weights) - self.weights / 2
        if target <= cum[0]:
            return float(self.min + (self.means[0] - self.min) * max(target, 0) / max(cum[0], 1e-12))
        if target >= cum[-1]:
            span = total - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 0.0
            return float(self.means[-1] + (self.max - self.means[-1]) * min(frac, 1.0))
        i = np.searchsorted(cum, target) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def cdf(self, x: float) -> float:
        self._compress()
        if self.means.size == 0:
            return math.nan
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2
        return float(np.interp(x, self.means, cum / total, left=0.0, right=1.0))

    # -- algebra ------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        self._check_compatible(other)
        other_means = np.concatenate([other.means] + other._buf)
        other_weights = np.concatenate([other.weights] + [np.ones(b.size) for b in other._buf])
        self.means = np.concatenate([self.means, other_means])
        self.weights = np.concatenate([self.weights, other_weights])
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        # force: the concatenation is unsorted even when small enough to
        # skip size-based compression — quantile() requires sorted means
        self._compress(force=True)
        return self

    def finalize(self) -> dict:
        self._compress()
        return {"centroids": int(self.means.size), "total_weight": self.total_weight}

    def _meta_compat(self) -> dict:
        return {"compression": self.compression}

    # -- ser/de -------------------------------------------------------
    def _meta(self) -> dict:
        self._compress()
        return {
            "compression": self.compression,
            "name": self.name,
            "min": self.min if math.isfinite(self.min) else None,
            "max": self.max if math.isfinite(self.max) else None,
        }

    def _arrays(self):
        self._compress()
        return [self.means, self.weights]

    def _set_arrays(self, arrays):
        self.means, self.weights = arrays

    @classmethod
    def _from_meta(cls, meta):
        obj = cls(meta["compression"], meta.get("name", "DEFAULT"))
        obj.min = meta["min"] if meta.get("min") is not None else math.inf
        obj.max = meta["max"] if meta.get("max") is not None else -math.inf
        return obj
