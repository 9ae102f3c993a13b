"""KMV (bottom-k) sketch: estimator bound, exact-merge property,
sample correctness, serde."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.hashing import mmh3_64_batch
from archbloom_ray.sketches import KMVSketch, SketchError, sketch_from_bytes


def _keys(n, tag=""):
    return pa.array([f"key{tag}{i}" for i in range(n)], type=pa.string())


class TestKMV:
    def test_exact_below_capacity(self):
        sk = KMVSketch(256)
        sk.update_arrow(_keys(100))
        sk.update_arrow(_keys(100))  # duplicates don't count
        assert sk.cardinality() == 100.0
        assert len(sk.sample()) == 100

    def test_estimator_within_bound(self):
        # 20k distinct into k=1024: rel error ≈ 1/√(k−2) ≈ 3.1%
        sk = KMVSketch(1024)
        sk.update_arrow(_keys(20_000))
        est = sk.cardinality()
        bound = sk.relative_error_bound()
        assert abs(est - 20_000) / 20_000 <= 3 * bound

    def test_sample_is_bottom_k_of_distinct(self):
        sk = KMVSketch(32)
        keys = _keys(5_000)
        sk.update_arrow(keys)
        h = mmh3_64_batch(keys).astype(np.uint64)
        order = np.argsort(h)
        expected = [keys[int(i)].as_py().encode() for i in order[:32]]
        assert sk.sample() == expected

    def test_merge_equals_single_pass(self):
        # union of bottom-k sets == bottom-k of the union: EXACT merge
        a, b, u = KMVSketch(64), KMVSketch(64), KMVSketch(64)
        left, right = _keys(3_000, "L"), _keys(3_000, "R")
        a.update_arrow(left)
        b.update_arrow(right)
        u.update_arrow(left)
        u.update_arrow(right)
        a.merge(b)
        assert np.array_equal(a.hashes, u.hashes)
        assert a.sample() == u.sample()

    def test_merge_compat_checked(self):
        with pytest.raises(SketchError):
            KMVSketch(64).merge(KMVSketch(128))

    def test_serde_roundtrip(self):
        sk = KMVSketch(48, name="kmv")
        sk.update_arrow(_keys(1_000))
        r = sketch_from_bytes(sk.to_bytes())
        assert isinstance(r, KMVSketch)
        assert r.k == 48 and r.name == "kmv"
        assert np.array_equal(r.hashes, sk.hashes)
        assert r.sample() == sk.sample()
        assert r.to_bytes() == sk.to_bytes()

    def test_k_validation(self):
        with pytest.raises(SketchError):
            KMVSketch(2)

    def test_distributed_build(self, ray_session):
        import ray.data as rd
        from archbloom_ray.pipelines.build import build_sketch

        tbl = pa.table({"key": [f"k{i % 700}" for i in range(5_000)]})
        ds = rd.from_arrow(tbl)
        sk = build_sketch(ds, "key", lambda: KMVSketch(1024), batch_size=512)
        assert sk.cardinality() == 700.0  # below capacity → exact


class TestKMVSetOps:
    def test_exact_below_k(self):
        from archbloom_ray.sketches import KMVSketch
        import pyarrow as pa

        a, b = KMVSketch(512), KMVSketch(512)
        a.update_arrow(pa.array([f"x{i}" for i in range(200)]))
        b.update_arrow(pa.array([f"x{i}" for i in range(150, 350)]))
        assert round(a.union_estimate(b)) == 350
        assert round(a.intersection_estimate(b)) == 50
        # operands unchanged
        assert round(a.cardinality()) == 200 and round(b.cardinality()) == 200

    def test_at_capacity_within_bound(self):
        from archbloom_ray.sketches import KMVSketch
        import pyarrow as pa

        k = 256
        a, b = KMVSketch(k), KMVSketch(k)
        a.update_arrow(pa.array([f"u{i}" for i in range(20_000)]))
        b.update_arrow(pa.array([f"u{i}" for i in range(10_000, 30_000)]))
        u, x = a.union_estimate(b), a.intersection_estimate(b)
        assert abs(u - 30_000) <= 5 * 30_000 / (k - 2) ** 0.5
        # resemblance estimator has wider noise: loose sanity band
        assert 4_000 <= x <= 16_000

    def test_disjoint_intersection_zero(self):
        from archbloom_ray.sketches import KMVSketch
        import pyarrow as pa

        a, b = KMVSketch(64), KMVSketch(64)
        a.update_arrow(pa.array(["a1", "a2"]))
        b.update_arrow(pa.array(["b1", "b2"]))
        assert a.intersection_estimate(b) == 0.0
        assert round(a.union_estimate(b)) == 4
