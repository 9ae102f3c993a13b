"""AMS tug-of-war F2 sketch (sketches/ams.py) — estimator bound,
linear-merge exactness, weighted-update equivalence, ser/de."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import AMSSketch, sketch_from_bytes
from archbloom_ray.sketches.base import SketchError


def _stream(n=20000, values=500, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, values, n)
    arr = pa.array([str(v) for v in vals])
    f2 = sum(c * c for c in collections.Counter(vals.tolist()).values())
    return arr, f2


class TestAMS:
    def test_estimate_within_bound(self):
        arr, f2 = _stream()
        s = AMSSketch(depth=9, width=1024)
        s.update_arrow(arr)
        est = s.estimate_f2()
        assert abs(est - f2) <= 4 * s.relative_error_bound() * f2

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_bound_across_seeds(self, seed):
        arr, f2 = _stream(seed=seed)
        s = AMSSketch(depth=9, width=1024, seed=seed)
        s.update_arrow(arr)
        assert abs(s.estimate_f2() - f2) <= 4 * s.relative_error_bound() * f2

    def test_skewed_stream(self):
        # one heavy hitter dominates F2
        vals = ["hot"] * 5000 + [str(i) for i in range(2000)]
        arr = pa.array(vals)
        f2 = 5000 * 5000 + 2000
        s = AMSSketch(depth=9, width=1024)
        s.update_arrow(arr)
        assert abs(s.estimate_f2() - f2) <= 4 * s.relative_error_bound() * f2

    def test_merge_is_exact_linear(self):
        arr, _ = _stream()
        whole = AMSSketch(depth=5, width=64)
        whole.update_arrow(arr)
        a, b = AMSSketch(depth=5, width=64), AMSSketch(depth=5, width=64)
        a.update_arrow(arr.slice(0, 7000))
        b.update_arrow(arr.slice(7000))
        a.merge(b)
        assert np.array_equal(a.counters, whole.counters)

    def test_merge_rejects_mismatched_geometry(self):
        with pytest.raises(SketchError):
            AMSSketch(depth=5, width=64).merge(AMSSketch(depth=5, width=32))
        with pytest.raises(SketchError):
            AMSSketch(seed=1).merge(AMSSketch(seed=2))

    def test_weighted_equals_unit_updates(self):
        arr, _ = _stream(n=5000, values=100)
        unit = AMSSketch(depth=3, width=32)
        unit.update_arrow(arr)
        vals, cnts = np.unique(np.asarray(arr), return_counts=True)
        w = AMSSketch(depth=3, width=32)
        w.update_weighted(pa.array(vals), cnts)
        assert np.array_equal(w.counters, unit.counters)

    def test_roundtrip(self):
        arr, _ = _stream(n=2000)
        s = AMSSketch(depth=3, width=32, seed=7, name="f2test")
        s.update_arrow(arr)
        r = sketch_from_bytes(s.to_bytes())
        assert isinstance(r, AMSSketch)
        assert r.name == "f2test" and r.seed == 7
        assert np.array_equal(r.counters, s.counters)

    def test_scalar_update_matches_batch(self):
        s1 = AMSSketch(depth=3, width=16)
        s2 = AMSSketch(depth=3, width=16)
        for v in ("a", "b", "a"):
            s1.update(v)
        s2.update_arrow(pa.array(["a", "b", "a"]))
        assert np.array_equal(s1.counters, s2.counters)

    def test_empty_stream_estimates_zero(self):
        s = AMSSketch()
        assert s.estimate_f2() == 0.0
        s.update_arrow(pa.array([], type=pa.string()))
        assert s.estimate_f2() == 0.0

    def test_point_counts_within_bound(self):
        arr, f2 = _stream(n=20000, values=300)
        s = AMSSketch(depth=9, width=1024)
        s.update_arrow(arr)
        import collections
        true = collections.Counter(np.asarray(arr).tolist())
        probes = pa.array(sorted(true))
        est = s.estimate_counts(probes)
        bound = 4 * s.count_error_bound() * np.sqrt(f2)
        errs = np.abs(est - np.array([true[p] for p in sorted(true)]))
        # median-of-rows: allow a stray probe at the tail, bulk must hold
        assert (errs <= bound).mean() >= 0.99
        assert errs.max() <= 2 * bound

    def test_point_counts_on_heavy_hitter(self):
        vals = ["hot"] * 50000 + [str(i) for i in range(5000)]
        s = AMSSketch(depth=9, width=1024)
        s.update_arrow(pa.array(vals))
        est = s.estimate_counts(pa.array(["hot"]))[0]
        # error scales with sqrt(F2)/sqrt(w) ~ 50000/32 — CMS with the
        # same memory would smear the 5000 singleton mass instead
        assert abs(est - 50000) <= 4 * s.count_error_bound() * 50100

    def test_point_counts_empty_probe(self):
        s = AMSSketch()
        assert s.estimate_counts(pa.array([], type=pa.string())).size == 0
