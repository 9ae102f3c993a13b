"""Count-min sketch bound tests: overestimate ≤ εN with prob ≥ 1−δ."""

import math

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from archbloom_ray.sketches import CountMinSketch, SketchError


def _zipf_keys(n, n_keys, seed, s=1.2):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, n_keys + 1, dtype=np.float64)
    p = ranks ** -s
    p /= p.sum()
    idx = rng.choice(n_keys, size=n, p=p)
    return pa.array([f"dom{i}.example" for i in idx])


def test_never_underestimates_and_bound():
    keys = _zipf_keys(50_000, 500, seed=7)
    cms = CountMinSketch(epsilon=0.001, delta=0.01)
    cms.update_arrow(keys)
    exact = duckdb.arrow(pa.table({"k": keys})).aggregate(
        "k, count(*) AS c", "k"
    ).arrow()
    est = cms.count_batch(exact["k"])
    true = np.asarray(exact["c"])
    assert (est >= true).all()                       # CMS never underestimates
    over = est - true
    bound = cms.epsilon * cms.total
    frac_within = (over <= bound).mean()
    assert frac_within >= 1 - cms.delta, (frac_within, bound)


def test_exact_small_counts():
    """Shares the cbloom_count min-estimator: tiny loads are exact."""
    cms = CountMinSketch(width=2048, depth=5)
    cms.update_arrow(pa.array(["multi", "multi", "one"]))
    assert cms.count("multi") == 2
    assert cms.count("one") == 1
    assert cms.count("absent") == 0


def test_weighted_update():
    cms = CountMinSketch(width=2048, depth=5)
    cms.update_arrow(pa.array(["a", "b"]), weights=np.array([10, 3]))
    assert cms.count("a") == 10
    assert cms.count("b") == 3
    assert cms.total == 13


def test_merge_exactness():
    a, b, u = (CountMinSketch(width=1024, depth=4) for _ in range(3))
    left = _zipf_keys(5000, 100, seed=1)
    right = _zipf_keys(5000, 100, seed=2)
    a.update_arrow(left)
    b.update_arrow(right)
    u.update_arrow(left)
    u.update_arrow(right)
    m = a.merge(b)
    assert np.array_equal(m.table, u.table)
    assert m.total == u.total


def test_sizing_from_eps_delta():
    cms = CountMinSketch(epsilon=0.01, delta=0.01)
    assert cms.width == math.ceil(math.e / 0.01)
    assert cms.depth == math.ceil(math.log(100))
    with pytest.raises(SketchError):
        CountMinSketch()


def test_serde():
    cms = CountMinSketch(width=512, depth=4)
    cms.update_arrow(pa.array(["x", "x", "y"]))
    r = CountMinSketch.from_bytes(cms.to_bytes())
    assert r.count("x") == 2 and r.total == 3
    assert r.to_bytes() == cms.to_bytes()


class TestInnerProduct:
    def test_inner_product_bound_and_exact_on_disjoint(self):
        """Inner product over/underestimate contract: exact on
        collision-free small sketches, one-sided overestimate with the
        epsilon bound on heavy multisets; incompatible sketches raise."""
        import pytest

        from archbloom_ray.sketches import CountMinSketch

        rng = np.random.default_rng(83)
        a = CountMinSketch(epsilon=0.0005, delta=0.001)
        b = CountMinSketch(epsilon=0.0005, delta=0.001)
        xs = rng.integers(0, 200, 5000)
        ys = rng.integers(100, 300, 5000)
        enc = lambda v: pa.array([f"k{int(x)}" for x in v], type=pa.string())
        a.update_arrow(enc(xs)); b.update_arrow(enc(ys))
        from collections import Counter
        ca, cb = Counter(xs.tolist()), Counter(ys.tolist())
        exact = sum(ca[k] * cb.get(k, 0) for k in ca)
        est = a.inner_product(b)
        assert exact <= est <= exact + a.inner_product_bound(b)
        # self-join (F2) path
        f2 = sum(v * v for v in ca.values())
        est2 = a.inner_product(a)
        assert f2 <= est2 <= f2 + a.inner_product_bound(a)
        with pytest.raises(Exception):
            a.inner_product(CountMinSketch(width=64, depth=4))


class TestConservativeUpdate:
    """ConservativeCountMinSketch (Estan & Varghese 2002): batched
    one-round CU must stay a sound upper bound under ANY batch
    partitioning and partial merges, pointwise ≤ plain CMS."""

    def _zipf_keys(self, n=20000, seed=0):
        rng = np.random.default_rng(seed)
        return [f"k{int(i) % 500}" for i in rng.zipf(1.3, n)]

    def test_sound_tighter_and_serde(self):
        import collections

        from archbloom_ray.sketches import (ConservativeCountMinSketch,
                                            CountMinSketch)
        from archbloom_ray.sketches.base import sketch_from_bytes

        keys = self._zipf_keys()
        exact_c = collections.Counter(keys)
        cu = ConservativeCountMinSketch(epsilon=0.01, delta=0.01)
        cms = CountMinSketch(epsilon=0.01, delta=0.01)
        for i in range(0, len(keys), 1000):
            chunk = pa.array(keys[i:i + 1000])
            cu.update_arrow(chunk)
            cms.update_arrow(chunk)
        qs = pa.array(sorted(exact_c))
        exact = np.array([exact_c[k] for k in sorted(exact_c)])
        cu_est = cu.count_batch(qs)
        cms_est = cms.count_batch(qs)
        assert (cu_est >= exact).all()          # sound upper bound
        assert (cu_est <= cms_est).all()        # never worse than CMS
        assert (cu_est - exact).mean() < (cms_est - exact).mean()
        assert (cu_est <= exact + cu.error_bound()).all()
        r = sketch_from_bytes(cu.to_bytes())
        assert (r.count_batch(qs) == cu_est).all() and r.total == cu.total

    def test_merge_add_stays_sound(self):
        import collections

        from archbloom_ray.sketches import ConservativeCountMinSketch

        keys = self._zipf_keys(seed=3)
        exact_c = collections.Counter(keys)
        a = ConservativeCountMinSketch(128, 4)
        b = ConservativeCountMinSketch(128, 4)
        a.update_arrow(pa.array(keys[:9000]))
        b.update_arrow(pa.array(keys[9000:]))
        a.merge(b)
        qs = pa.array(sorted(exact_c))
        exact = np.array([exact_c[k] for k in sorted(exact_c)])
        assert (a.count_batch(qs) >= exact).all()
        assert a.total == len(keys)

    def test_weighted_and_duplicate_keys_in_batch(self):
        from archbloom_ray.sketches import ConservativeCountMinSketch

        cu = ConservativeCountMinSketch(64, 3)
        cu.update_weighted(pa.array(["x", "y", "x"]),
                           np.array([5, 2, 4], dtype=np.int64))
        assert cu.count("x") >= 9 and cu.count("y") >= 2
        assert cu.total == 11

    def test_inner_product_refused(self):
        from archbloom_ray.sketches import ConservativeCountMinSketch
        from archbloom_ray.sketches.base import SketchError

        a = ConservativeCountMinSketch(64, 3)
        with pytest.raises(SketchError, match="not linear"):
            a.inner_product(a)
        with pytest.raises(SketchError, match="not linear"):
            a.inner_product_bound(a)

    @given(st.integers(1, 9))
    @settings(max_examples=12, deadline=None)
    def test_soundness_for_any_batch_split(self, step):
        """The batched-CU invariant proof, empirically: every batch
        partitioning of the same stream yields est ≥ exact."""
        import collections

        from archbloom_ray.sketches import ConservativeCountMinSketch

        keys = [f"w{i % 23}" for i in range(200)]
        exact_c = collections.Counter(keys)
        cu = ConservativeCountMinSketch(16, 2)   # tiny: force collisions
        for i in range(0, len(keys), step * 13):
            cu.update_arrow(pa.array(keys[i:i + step * 13]))
        for k, c in exact_c.items():
            assert cu.count(k) >= c
