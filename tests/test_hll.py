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
