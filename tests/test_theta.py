"""Theta sketch: unbiased estimator bound, byte-exact order-independent
merge, composable set algebra (derived sketches), serde."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import SketchError, ThetaSketch, sketch_from_bytes


def _keys(n, tag=""):
    return pa.array([f"key{tag}{i}" for i in range(n)], type=pa.string())


class TestTheta:
    def test_exact_below_capacity(self):
        sk = ThetaSketch(256)
        sk.update_arrow(_keys(100))
        sk.update_arrow(_keys(100))  # duplicates don't count
        assert sk.is_exact()
        assert sk.cardinality() == 100.0

    def test_estimator_within_bound(self):
        # 50k distinct into k=1024: rel error ≈ 1/√(k−2) ≈ 3.1%
        sk = ThetaSketch(1024)
        sk.update_arrow(_keys(50_000))
        assert not sk.is_exact()
        assert sk.hashes.size == 1024  # QuickSelect keeps exactly k
        est = sk.cardinality()
        assert abs(est - 50_000) / 50_000 <= 3 * sk.relative_error_bound()

    def test_merge_equals_single_pass_byte_exact(self):
        a, b, u = ThetaSketch(64), ThetaSketch(64), ThetaSketch(64)
        left, right = _keys(3_000, "L"), _keys(3_000, "R")
        a.update_arrow(left)
        b.update_arrow(right)
        u.update_arrow(left)
        u.update_arrow(right)
        a.merge(b)
        assert a.theta == u.theta
        assert np.array_equal(a.hashes, u.hashes)
        assert a.to_bytes() == u.to_bytes()

    def test_merge_order_independent(self):
        parts = [_keys(2_000, t) for t in "ABC"]
        def build(order):
            sks = []
            for i in order:
                s = ThetaSketch(128)
                s.update_arrow(parts[i])
                sks.append(s)
            out = sks[0]
            for s in sks[1:]:
                out.merge(s)
            return out
        ref = build([0, 1, 2]).to_bytes()
        assert build([2, 0, 1]).to_bytes() == ref
        assert build([1, 2, 0]).to_bytes() == ref

    def test_set_ops_exact_below_k(self):
        a, b = ThetaSketch(512), ThetaSketch(512)
        a.update_arrow(pa.array([f"x{i}" for i in range(200)]))
        b.update_arrow(pa.array([f"x{i}" for i in range(150, 350)]))
        assert round(a.union_estimate(b)) == 350
        assert round(a.intersection_estimate(b)) == 50
        assert round(a.a_not_b_estimate(b)) == 150
        assert round(b.a_not_b_estimate(a)) == 150
        # operands unchanged
        assert round(a.cardinality()) == 200 and round(b.cardinality()) == 200

    def test_set_ops_at_capacity_within_bound(self):
        k = 512
        a, b = ThetaSketch(k), ThetaSketch(k)
        a.update_arrow(pa.array([f"u{i}" for i in range(30_000)]))
        b.update_arrow(pa.array([f"u{i}" for i in range(20_000, 50_000)]))
        u = a.union(b)
        assert abs(u.cardinality() - 50_000) <= 4 * 50_000 * u.relative_error_bound()
        i = a.intersect(b)
        assert abs(i.cardinality() - 10_000) <= 4 * i.cardinality() * max(
            i.result_relative_error(), 1e-9) + 4 * 50_000 / (k - 2) ** 0.5
        d = a.a_not_b(b)
        assert abs(d.cardinality() - 20_000) <= 4 * d.cardinality() * max(
            d.result_relative_error(), 1e-9) + 4 * 50_000 / (k - 2) ** 0.5

    def test_derived_sketches_compose(self):
        # (A ∩ B) \ C — an expression tree KMV cannot represent
        a, b, c = (ThetaSketch(512) for _ in range(3))
        a.update_arrow(pa.array([f"x{i}" for i in range(0, 300)]))
        b.update_arrow(pa.array([f"x{i}" for i in range(100, 400)]))
        c.update_arrow(pa.array([f"x{i}" for i in range(200, 500)]))
        expr = a.intersect(b).a_not_b(c)  # {100..199} → 100
        assert round(expr.cardinality()) == 100
        # and still unions onward
        assert round(expr.union(c).cardinality()) == 400  # {100..499}

    def test_disjoint_intersection_zero(self):
        a, b = ThetaSketch(64), ThetaSketch(64)
        a.update_arrow(pa.array(["a1", "a2"]))
        b.update_arrow(pa.array(["b1", "b2"]))
        assert a.intersection_estimate(b) == 0.0
        assert a.a_not_b_estimate(b) == 2.0
        assert round(a.union_estimate(b)) == 4

    def test_merge_compat_checked(self):
        with pytest.raises(SketchError):
            ThetaSketch(64).merge(ThetaSketch(128))

    def test_serde_roundtrip(self):
        sk = ThetaSketch(48, name="th")
        sk.update_arrow(_keys(1_000))
        r = sketch_from_bytes(sk.to_bytes())
        assert isinstance(r, ThetaSketch)
        assert r.k == 48 and r.name == "th" and r.theta == sk.theta
        assert np.array_equal(r.hashes, sk.hashes)
        assert r.to_bytes() == sk.to_bytes()

    def test_k_validation(self):
        with pytest.raises(SketchError):
            ThetaSketch(2)

    def test_empty(self):
        a, b = ThetaSketch(64), ThetaSketch(64)
        assert a.cardinality() == 0.0
        assert a.union_estimate(b) == 0.0
        assert a.intersection_estimate(b) == 0.0
        r = sketch_from_bytes(a.to_bytes())
        assert r.cardinality() == 0.0

    def test_distributed_build(self, ray_session):
        import ray.data as rd
        from archbloom_ray.pipelines.build import build_sketch

        tbl = pa.table({"key": [f"k{i % 700}" for i in range(5_000)]})
        ds = rd.from_arrow(tbl)
        sk = build_sketch(ds, "key", lambda: ThetaSketch(1024), batch_size=512)
        assert sk.is_exact() and sk.cardinality() == 700.0
