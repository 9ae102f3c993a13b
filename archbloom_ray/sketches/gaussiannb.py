"""Streaming Gaussian Naive Bayes — the engine's stateful model scorer.

Reference: src/gaussiannb.c ("PARTIALLY IMPLEMENTED", reference
README.md:117).  Kept behavior:

* ``train(X, y)``: per-class mean / variance with GNB_ALPHA=1e-2
  variance regularization (gaussiannb.c:85) and Laplace-smoothed prior
  ``(count + weight) / (n + num_classes)`` (gaussiannb.c:127); each
  train call REPLACES the per-class statistics with this batch's (the
  reference resets counts and reallocates, gaussiannb.c:100-115) while
  ``num_samples`` accumulates.
* ``update(x, y)``: Welford-style online mean/variance update and
  ``prior = count / num_samples`` (gaussiannb.c:167-187).
* ``predict``: argmax over classes of ``log(prior·weight + ε) +
  Σ log((1/√2π)·exp(−(x−μ)²/2σ²))`` — note the reference's per-feature
  term omits the 1/σ factor of a true Gaussian density
  (gaussiannb.c:131-154 with GNB_NORMALIZING_CONSTANT); replicated
  exactly, vectorized over batches.
* ``mahalanobis_distance``: diagonal √Σ(x−μ)²/(σ²+ε)
  (gaussiannb.c:156-165).
* ``adjust_weight`` (gaussiannb.c:189-194).

Engine extensions: NaN features are imputed with the class mean of the
non-NaN values (the reference's in-loop imputation uses a half-built
accumulator — an order artifact we do not copy); ``partial_fit`` +
``merge`` accumulate exact sufficient statistics (count, Σx, Σx²) per
class — the classic parallel-moments UDAF — so the model trains
distributed via ``map_batches`` partials; save/load implemented (a TODO
in the reference, gaussiannb.c:2).
"""

from __future__ import annotations

import math

import numpy as np

from .base import Sketch, SketchError, register

GNB_EPSILON = 1e-9
GNB_ALPHA = 1e-2
_NORM_CONST = 1.0 / math.sqrt(2.0 * math.pi)


@register
class GaussianNB(Sketch):
    MAGIC = b"!gaussnb"

    def __init__(self, num_classes: int, num_features: int, name: str = "DEFAULT"):
        if num_classes < 1 or num_features < 1:
            raise SketchError("need >= 1 class and feature")
        self.num_classes = int(num_classes)
        self.num_features = int(num_features)
        self.num_samples = 0
        self.name = name
        C, F = self.num_classes, self.num_features
        self.mean = np.zeros((C, F))
        self.variance = np.zeros((C, F))
        self.prior = np.zeros(C)
        self.weight = np.ones(C)
        self.count = np.zeros(C, dtype=np.int64)
        # exact sufficient statistics for the distributed path
        self._sum = np.zeros((C, F))
        self._sumsq = np.zeros((C, F))

    # -- reference-parity training -------------------------------------
    def train(self, X, y) -> None:
        """Batch train, replacing per-class stats (gaussiannb.c:89-129)."""
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.int64)
        n = len(X)
        if n == 0:
            return
        self.num_samples += n
        self._sum[:] = 0.0
        self._sumsq[:] = 0.0
        self.count[:] = 0
        for c in range(self.num_classes):
            rows = X[y == c]
            cnt = len(rows)
            self.count[c] = cnt
            if cnt:
                col_mean = np.nanmean(rows, axis=0)
                rows = np.where(np.isnan(rows), col_mean, rows)
                self.mean[c] = rows.mean(axis=0)
                self.variance[c] = ((rows - self.mean[c]) ** 2).mean(axis=0) + GNB_ALPHA
                self._sum[c] = rows.sum(axis=0)
                self._sumsq[c] = (rows**2).sum(axis=0)
            else:
                self.mean[c] = 0.0
                self.variance[c] = GNB_EPSILON
            # Laplace smoothing using class weight (gaussiannb.c:127)
            self.prior[c] = (cnt + self.weight[c]) / (n + self.num_classes)

    def update(self, x, y: int, new: bool = True) -> None:
        """Welford online update (gaussiannb.c:167-187)."""
        if y < 0 or y >= self.num_classes:
            return
        x = np.asarray(x, dtype=np.float64)
        c = self.count[y]
        old_mean = self.mean[y].copy()
        self.mean[y] = old_mean + (x - old_mean) / (c + 1)
        self.variance[y] = (c * self.variance[y] + (x - old_mean) * (x - self.mean[y])) / (c + 1)
        if new:
            self.num_samples += 1
        self.count[y] += 1
        self._sum[y] += x
        self._sumsq[y] += x**2
        self.prior[y] = self.count[y] / self.num_samples

    # -- distributed path: exact moments UDAF ---------------------------
    def partial_fit(self, X, y) -> None:
        """Accumulate exact per-class (count, Σx, Σx²); finalize with
        :meth:`refresh_from_moments`.  Merge-exact (Chan et al. moments)."""
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.int64)
        if len(X) == 0:
            return
        self.num_samples += len(X)
        for c in np.unique(y):
            rows = X[y == c]
            if np.isnan(rows).any():
                col_mean = np.nanmean(rows, axis=0)
                rows = np.where(np.isnan(rows), col_mean, rows)
            self.count[c] += len(rows)
            self._sum[c] += rows.sum(axis=0)
            self._sumsq[c] += (rows**2).sum(axis=0)
        self.refresh_from_moments()

    def refresh_from_moments(self) -> None:
        cnt = np.maximum(self.count, 1)[:, None]
        self.mean = self._sum / cnt
        self.variance = np.maximum(self._sumsq / cnt - self.mean**2, 0.0) + GNB_ALPHA
        empty = self.count == 0
        self.mean[empty] = 0.0
        self.variance[empty] = GNB_EPSILON
        if self.num_samples:
            self.prior = (self.count + self.weight) / (self.num_samples + self.num_classes)

    def merge(self, other: "GaussianNB") -> "GaussianNB":
        self._check_compatible(other)
        self.count += other.count
        self._sum += other._sum
        self._sumsq += other._sumsq
        self.num_samples += other.num_samples
        self.refresh_from_moments()
        return self

    # -- scoring ---------------------------------------------------------
    def _log_probs(self, X: np.ndarray) -> np.ndarray:
        """(n, C) matrix of the reference's log-posterior score."""
        X = np.atleast_2d(np.asarray(X, dtype=np.float64))
        var = self.variance + GNB_EPSILON  # (C, F)
        diff = X[:, None, :] - self.mean[None, :, :]  # (n, C, F)
        logp = np.log(_NORM_CONST) - (diff**2) / (2 * var[None, :, :])
        return np.log(self.prior * self.weight + GNB_EPSILON)[None, :] + logp.sum(axis=2)

    def predict(self, X) -> np.ndarray:
        """Vectorized ``gaussiannb_predict`` (gaussiannb.c:131-154)."""
        return self._log_probs(X).argmax(axis=1)

    def predict_one(self, x) -> int:
        return int(self.predict(np.atleast_2d(x))[0])

    def mahalanobis_distance(self, x, class_index: int) -> float:
        """gaussiannb.c:156-165 (diagonal)."""
        x = np.asarray(x, dtype=np.float64)
        d = (x - self.mean[class_index]) ** 2 / (self.variance[class_index] + GNB_EPSILON)
        return float(np.sqrt(d.sum()))

    def mahalanobis_batch(self, X, class_index: int) -> np.ndarray:
        X = np.atleast_2d(np.asarray(X, dtype=np.float64))
        d = (X - self.mean[class_index]) ** 2 / (self.variance[class_index] + GNB_EPSILON)
        return np.sqrt(d.sum(axis=1))

    def adjust_weight(self, class_index: int, weight: float) -> None:
        """gaussiannb.c:189-194."""
        if 0 <= class_index < self.num_classes:
            self.weight[class_index] = float(weight)

    def update_arrow(self, arr) -> None:  # pragma: no cover - not element-wise
        raise SketchError("GaussianNB trains via train/partial_fit(X, y), not a key column")

    def finalize(self) -> dict:
        return {"num_classes": self.num_classes, "num_features": self.num_features,
                "num_samples": self.num_samples, "counts": self.count.tolist()}

    # -- ser/de ------------------------------------------------------------
    def _meta(self) -> dict:
        return {
            "num_classes": self.num_classes,
            "num_features": self.num_features,
            "num_samples": self.num_samples,
            "name": self.name,
        }

    def _meta_compat(self) -> dict:
        return {"num_classes": self.num_classes, "num_features": self.num_features}

    def _arrays(self):
        return [self.mean, self.variance, self.prior, self.weight,
                self.count, self._sum, self._sumsq]

    def _set_arrays(self, arrays):
        (self.mean, self.variance, self.prior, self.weight,
         self.count, self._sum, self._sumsq) = arrays

    @classmethod
    def _from_meta(cls, meta):
        obj = cls(meta["num_classes"], meta["num_features"], meta.get("name", "DEFAULT"))
        obj.num_samples = meta.get("num_samples", 0)
        return obj
