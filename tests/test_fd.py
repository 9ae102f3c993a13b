"""Frequent Directions (Liberty'13 / GLPW16): the deterministic
covariance bound, PSD-underestimate property, merge invariance, serde."""

import numpy as np
import pytest

from archbloom_ray.sketches import FrequentDirections, SketchError
from archbloom_ray.sketches.base import sketch_from_bytes


def _matrix(n=4000, d=48, rank=5, noise=0.3, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, rank)) @ rng.normal(size=(rank, d)) * 3
            + rng.normal(size=(n, d)) * noise)


class TestFrequentDirections:
    def test_bound_and_psd(self):
        A = _matrix()
        fd = FrequentDirections(ell=16)
        for c in np.array_split(A, 11):
            fd.update_rows(c)
        exact = A.T @ A
        diff = exact - fd.cov_estimate()
        assert np.linalg.norm(diff, 2) <= fd.error_bound()
        # GLPW16: B'B never overestimates in any direction
        assert np.linalg.eigvalsh(diff).min() >= -1e-6 * np.linalg.norm(exact, 2)
        assert fd.n_rows == A.shape[0]
        assert fd.sq_frob == pytest.approx((A * A).sum())

    def test_low_rank_recovery(self):
        # on a near-low-rank matrix the sketch captures the spectrum
        A = _matrix(noise=0.01)
        fd = FrequentDirections(ell=16)
        fd.update_rows(A)
        s_true = np.linalg.svd(A, compute_uv=False)[:5]
        s_est = fd.singular_values()[:5]
        np.testing.assert_allclose(s_est, s_true, rtol=0.05)

    def test_merge_tree_keeps_bound(self):
        A = _matrix(seed=1)
        parts = np.array_split(A, 8)
        sks = []
        for p in parts:
            f = FrequentDirections(ell=16)
            f.update_rows(p)
            sks.append(sketch_from_bytes(f.to_bytes()))
        while len(sks) > 1:
            nxt = []
            for i in range(0, len(sks), 2):
                if i + 1 < len(sks):
                    nxt.append(sks[i].merge(sks[i + 1]))
                else:
                    nxt.append(sks[i])
            sks = nxt
        m = sks[0]
        assert m.n_rows == A.shape[0]
        assert m.sq_frob == pytest.approx((A * A).sum())
        err = np.linalg.norm(A.T @ A - m.cov_estimate(), 2)
        assert err <= m.error_bound()

    def test_arrow_list_column(self):
        import pyarrow as pa

        A = _matrix(n=300, d=8)
        col = pa.array(A.tolist(), type=pa.list_(pa.float32()))
        fd = FrequentDirections(ell=8)
        fd.update_arrow(col)
        assert fd.n_rows == 300 and fd.dim == 8

    def test_serde(self):
        A = _matrix(n=1000)
        fd = FrequentDirections(ell=12, name="emb")
        fd.update_rows(A)
        r = sketch_from_bytes(fd.to_bytes())
        assert isinstance(r, FrequentDirections)
        assert r.n_rows == fd.n_rows and r.sq_frob == fd.sq_frob
        np.testing.assert_allclose(r.cov_estimate(), fd.cov_estimate())

    def test_validation(self):
        with pytest.raises(SketchError):
            FrequentDirections(ell=0)
        a = FrequentDirections(ell=8)
        a.update_rows(_matrix(n=10, d=4))
        b = FrequentDirections(ell=8)
        b.update_rows(_matrix(n=10, d=6))
        with pytest.raises(SketchError):
            a.merge(b)
        with pytest.raises(SketchError):
            a.merge(FrequentDirections(ell=16))
        with pytest.raises(SketchError):
            FrequentDirections(ell=8).cov_estimate()
