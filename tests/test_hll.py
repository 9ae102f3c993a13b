"""HyperLogLog bound tests: rel. error ≤ 1.04/√m vs exact oracles."""

import math

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import HyperLogLog, SketchError


def test_clz_kernel():
    from archbloom_ray.sketches.hll import _clz64

    v = np.array([0, 1, 2, 3, 2**63, 2**64 - 1, 2**32], dtype=np.uint64)
    assert list(_clz64(v)) == [64, 63, 62, 62, 0, 0, 31]


@pytest.mark.parametrize("n_distinct", [100, 10_000, 200_000])
def test_cardinality_bound(n_distinct):
    hll = HyperLogLog(precision=14)
    keys = pa.array([f"url-{i}" for i in range(n_distinct)])
    hll.update_arrow(keys)
    # duplicates must not change the estimate
    hll.update_arrow(keys.slice(0, min(1000, n_distinct)))
    est = hll.cardinality()
    rel_err = abs(est - n_distinct) / n_distinct
    assert rel_err <= 3 * hll.relative_error_bound(), (est, n_distinct)


def test_multi_seed_bound_pass_rate():
    """≥ 99 % of seeded runs within 3σ (BASELINE.md criterion, scaled)."""
    n = 20_000
    ok = 0
    runs = 12
    for seed in range(runs):
        hll = HyperLogLog(precision=12)
        hll.update_arrow(pa.array([f"s{seed}-k{i}" for i in range(n)]))
        rel = abs(hll.cardinality() - n) / n
        ok += rel <= 3 * hll.relative_error_bound()
    assert ok >= runs - 1


def test_against_duckdb_exact(tmp_path):
    tbl = pa.table({"k": [f"key-{i % 3456}" for i in range(20_000)]})
    exact = duckdb.arrow(tbl).aggregate("count(DISTINCT k) AS d").fetchone()[0]
    hll = HyperLogLog(precision=14)
    hll.update_arrow(tbl["k"])
    assert abs(hll.cardinality() - exact) / exact <= 3 * hll.relative_error_bound()


def test_merge_exactness():
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) byte-for-byte."""
    a, b, u = HyperLogLog(12), HyperLogLog(12), HyperLogLog(12)
    left = pa.array([f"a{i}" for i in range(5000)])
    right = pa.array([f"b{i}" for i in range(5000)])
    a.update_arrow(left)
    b.update_arrow(right)
    u.update_arrow(left)
    u.update_arrow(right)
    assert np.array_equal(a.merge(b).registers, u.registers)


def test_merge_commutative_associative():
    parts = [pa.array([f"p{j}-{i}" for i in range(1000)]) for j in range(4)]
    def build(order):
        sks = []
        for p in parts:
            s = HyperLogLog(10)
            s.update_arrow(p)
            sks.append(s)
        acc = sks[order[0]]
        for i in order[1:]:
            acc.merge(sks[i])
        return acc.registers.copy()
    assert np.array_equal(build([0, 1, 2, 3]), build([3, 1, 0, 2]))


def test_small_range_linear_counting():
    hll = HyperLogLog(precision=14)
    hll.update_arrow(pa.array([f"x{i}" for i in range(50)]))
    assert abs(hll.cardinality() - 50) <= 2  # linear counting is near-exact here


def test_serde_and_validation():
    hll = HyperLogLog(10)
    hll.update_arrow(pa.array(["a", "b"]))
    r = HyperLogLog.from_bytes(hll.to_bytes())
    assert np.array_equal(r.registers, hll.registers)
    with pytest.raises(SketchError):
        HyperLogLog(3)
    with pytest.raises(SketchError):
        HyperLogLog(12).merge(HyperLogLog(11))


class TestIntersection:
    def test_inclusion_exclusion_quality(self):
        """Intersection estimate within the compounded tolerance across
        overlap regimes; disjoint floors at 0-ish; incompatible raises."""
        import pytest

        from archbloom_ray.sketches import HyperLogLog

        for ov in (0, 500, 3000):
            a, b = HyperLogLog(13), HyperLogLog(13)
            a.update_arrow(pa.array([f"a{i}" for i in range(4000)]))
            b.update_arrow(pa.array(
                [f"a{i}" for i in range(4000 - ov, 4000)]
                + [f"b{i}" for i in range(3000 - ov)]))
            est = a.intersection_estimate(b)
            assert abs(est - ov) <= a.intersection_error_bound(b), ov
            assert est >= 0.0
        # union must not mutate operands
        a2 = HyperLogLog(13); a2.registers[:] = a.registers
        a.union_cardinality(b)
        assert (a.registers == a2.registers).all()
        with pytest.raises(Exception):
            a.intersection_estimate(HyperLogLog(10))


class TestSparseHLL:
    """HLL++ sparse representation: identical estimates to dense,
    automatic densify at break-even, pair-union merge."""

    def _vals(self, n, seed=0):
        import numpy as np
        rng = np.random.default_rng(seed)
        return pa.array([f"url-{v}" for v in
                         rng.integers(0, 10**12, n)])

    def test_matches_dense_exactly(self):
        from archbloom_ray.sketches import SparseHLL

        for n in (1, 50, 1000, 3000):
            vals = self._vals(n, seed=n)
            sp = SparseHLL(14)
            sp.update_arrow(vals)
            dense = HyperLogLog(14)
            dense.update_arrow(vals)
            assert sp.to_dense().cardinality() == dense.cardinality()
            # the sparse estimator itself agrees with the dense one
            assert sp.cardinality() == pytest.approx(dense.cardinality(),
                                                     rel=1e-12)

    def test_stays_sparse_small_densifies_large(self):
        from archbloom_ray.sketches import SparseHLL

        sp = SparseHLL(14)
        sp.update_arrow(self._vals(500))
        assert sp.dense is None
        assert sp.state_nbytes <= 4 * 500
        sp.update_arrow(self._vals(20_000, seed=1))
        assert sp.dense is not None
        d = HyperLogLog(14)
        d.update_arrow(self._vals(500))
        d.update_arrow(self._vals(20_000, seed=1))
        assert sp.cardinality() == d.cardinality()

    def test_merge_matches_single_pass_and_commutes(self):
        import numpy as np

        from archbloom_ray.sketches import SparseHLL
        from archbloom_ray.sketches.base import sketch_from_bytes

        chunks = [self._vals(400, seed=s) for s in range(5)]
        parts = []
        for c in chunks:
            s = SparseHLL(12)
            s.update_arrow(c)
            parts.append(sketch_from_bytes(s.to_bytes()))
        fwd = SparseHLL(12)
        for p in parts:
            fwd.merge(p)
        rev = SparseHLL(12)
        for p in reversed([sketch_from_bytes(p.to_bytes()) for p in parts]):
            rev.merge(p)
        single = SparseHLL(12)
        for c in chunks:
            single.update_arrow(c)
        np.testing.assert_array_equal(fwd._registers(), single._registers())
        np.testing.assert_array_equal(rev._registers(), single._registers())

    def test_merge_sparse_into_dense_mix(self):
        import numpy as np

        from archbloom_ray.sketches import SparseHLL

        big = SparseHLL(10)
        big.update_arrow(self._vals(5000, seed=2))
        assert big.dense is not None
        small = SparseHLL(10)
        small.update_arrow(self._vals(30, seed=3))
        big.merge(small)
        ref = SparseHLL(10)
        ref.update_arrow(self._vals(5000, seed=2))
        ref.update_arrow(self._vals(30, seed=3))
        np.testing.assert_array_equal(big._registers(), ref._registers())

    def test_serde_both_modes(self):
        import numpy as np

        from archbloom_ray.sketches import SparseHLL
        from archbloom_ray.sketches.base import sketch_from_bytes

        sp = SparseHLL(14, name="domains")
        sp.update_arrow(self._vals(200))
        r = sketch_from_bytes(sp.to_bytes())
        assert r.dense is None
        np.testing.assert_array_equal(r.pairs, sp.pairs)
        sp.update_arrow(self._vals(30_000, seed=9))
        r2 = sketch_from_bytes(sp.to_bytes())
        assert r2.dense is not None
        assert r2.cardinality() == sp.cardinality()

    def test_bound_holds(self):
        from archbloom_ray.sketches import SparseHLL

        n = 2000
        vals = pa.array([f"k{i}" for i in range(n)])
        sp = SparseHLL(14)
        sp.update_arrow(vals)
        assert abs(sp.cardinality() - n) <= 3 * sp.relative_error_bound() * n

    def test_validation(self):
        from archbloom_ray.sketches import SparseHLL, SketchError

        with pytest.raises(SketchError):
            SparseHLL(3)
        with pytest.raises(Exception):
            SparseHLL(12).merge(SparseHLL(14))
