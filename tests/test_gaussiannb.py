"""GaussianNB tests (reference tests/test_gaussiannb_basic.c)."""

import numpy as np
import pytest

from archbloom_ray.sketches import SketchError
from archbloom_ray.sketches.gaussiannb import GaussianNB

# test_gaussiannb_basic.c:19-56 — 3 classes × 2 features, 6 samples
X6 = np.array([[1.0, 2.0], [1.1, 1.9], [5.0, 6.0], [5.1, 6.1], [9.0, 10.0], [9.1, 9.9]])
Y6 = np.array([0, 0, 1, 1, 2, 2])


class TestBasicVectors:
    def test_predict_centroids(self):
        gnb = GaussianNB(3, 2)
        gnb.train(X6, Y6)
        assert gnb.predict_one([1.0, 2.0]) == 0
        assert gnb.predict_one([5.0, 6.0]) == 1
        assert gnb.predict_one([9.0, 10.0]) == 2

    def test_predict_batch_matches_scalar(self):
        gnb = GaussianNB(3, 2)
        gnb.train(X6, Y6)
        batch = gnb.predict(X6)
        assert list(batch) == [0, 0, 1, 1, 2, 2]

    def test_mahalanobis(self):
        gnb = GaussianNB(3, 2)
        gnb.train(X6, Y6)
        d_own = gnb.mahalanobis_distance([1.05, 1.95], 0)
        d_far = gnb.mahalanobis_distance([9.0, 10.0], 0)
        assert d_own < d_far
        assert np.allclose(
            gnb.mahalanobis_batch(X6[:2], 0),
            [gnb.mahalanobis_distance(x, 0) for x in X6[:2]],
        )

    def test_prior_laplace_smoothing(self):
        # prior = (count + weight) / (n + C) (gaussiannb.c:127)
        gnb = GaussianNB(3, 2)
        gnb.train(X6, Y6)
        assert gnb.prior[0] == pytest.approx((2 + 1.0) / (6 + 3))

    def test_online_update(self):
        gnb = GaussianNB(2, 1)
        gnb.train(np.array([[1.0], [3.0], [10.0]]), np.array([0, 0, 1]))
        for v in (9.0, 11.0, 10.5):
            gnb.update([v], 1)
        assert gnb.predict_one([10.2]) == 1
        assert gnb.predict_one([2.0]) == 0

    def test_adjust_weight(self):
        gnb = GaussianNB(3, 2)
        gnb.train(X6, Y6)
        gnb.adjust_weight(1, 5.0)
        assert gnb.weight[1] == 5.0
        gnb.adjust_weight(99, 2.0)  # out of range → ignored


class TestDistributed:
    def test_partial_fit_merge_equals_single(self):
        rng = np.random.default_rng(0)
        X = np.vstack([rng.normal(0, 1, (200, 3)), rng.normal(5, 2, (200, 3))])
        y = np.repeat([0, 1], 200)
        full = GaussianNB(2, 3)
        full.partial_fit(X, y)
        a, b = GaussianNB(2, 3), GaussianNB(2, 3)
        a.partial_fit(X[:150], y[:150])
        b.partial_fit(X[150:], y[150:])
        a.merge(b)
        assert np.allclose(a.mean, full.mean)
        assert np.allclose(a.variance, full.variance)
        assert np.allclose(a.prior, full.prior)

    def test_nan_imputation(self):
        X = np.array([[1.0, np.nan], [1.2, 2.0], [5.0, 6.0], [np.nan, 6.2]])
        y = np.array([0, 0, 1, 1])
        gnb = GaussianNB(2, 2)
        gnb.train(X, y)
        assert np.isfinite(gnb.mean).all() and np.isfinite(gnb.variance).all()
        assert gnb.predict_one([1.1, 2.0]) == 0

    def test_serde(self):
        gnb = GaussianNB(3, 2)
        gnb.train(X6, Y6)
        r = GaussianNB.from_bytes(gnb.to_bytes())
        assert list(r.predict(X6)) == [0, 0, 1, 1, 2, 2]
        assert r.to_bytes() == gnb.to_bytes()

    def test_update_arrow_rejected(self):
        with pytest.raises(SketchError):
            GaussianNB(2, 2).update_arrow(None)
