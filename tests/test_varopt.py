"""VarOpt-style threshold sampler (sketches/varopt.py)."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import VarOptSampler
from archbloom_ray.sketches.base import SketchError, sketch_from_bytes


def _vals(n, prefix="v"):
    return pa.array([f"{prefix}{i}" for i in range(n)])


class TestVarOpt:
    def test_exact_below_k(self):
        s = VarOptSampler(64, seed=7)
        s.update_weighted(_vals(10), np.arange(1, 11))
        assert s.is_exact()
        assert len(s.sample()) == 10
        assert s.total_estimate() == 55.0
        assert s.total_weight == 55

    def test_total_preserved_and_k_kept(self):
        rng = np.random.default_rng(3)
        s = VarOptSampler(128, seed=7)
        total = 0
        for _ in range(20):
            w = rng.integers(1, 10_000, 5000)
            total += int(w.sum())
            s.update_weighted(_vals(5000, prefix=f"b{_}_"), w)
        assert len(s.sample()) == 128
        assert s.total_weight == total
        assert abs(s.total_estimate() - total) <= 1e-9 * total
        # survivors are distinct
        assert len({v for v, _w in s.sample()}) == 128

    def test_heavy_item_always_kept_exactly(self):
        """w > τ ⇒ kept with its exact weight — the threshold-sampling
        guarantee, across many seeds."""
        for seed in range(20):
            s = VarOptSampler(32, seed=seed)
            w = np.ones(2000, dtype=np.int64)
            w[137] = 1_000_000
            s.update_weighted(_vals(2000), w)
            kept = dict(s.sample())
            assert kept[b"v137"] == 1_000_000.0, seed

    def test_inclusion_probability_tracks_weight(self):
        """P(keep) ≈ w/τ: a weight-10 item appears ~10x as often as a
        weight-1 item over many independent seeds."""
        hits_heavy = hits_light = 0
        for seed in range(400):
            s = VarOptSampler(50, seed=seed)
            w = np.ones(1000, dtype=np.int64)
            w[::10] = 10  # 100 heavy items
            s.update_weighted(_vals(1000), w)
            kept = {v for v, _ in s.sample()}
            hits_heavy += b"v0" in kept or b"v10" in kept
            hits_light += b"v1" in kept or b"v2" in kept
        # heavy P ≈ min(1, 10/τ), light ≈ 1/τ with τ = 1900/50 = 38
        # → per-item 0.263 vs 0.0263; the OR of two ≈ 0.46 vs 0.052
        assert hits_heavy > 4 * hits_light

    def test_merge_invariants_any_tree(self):
        rng = np.random.default_rng(11)
        parts = []
        total = 0
        for i in range(8):
            s = VarOptSampler(64, seed=5)
            w = rng.integers(1, 500, 700)
            total += int(w.sum())
            s.update_weighted(_vals(700, prefix=f"p{i}_"), w)
            parts.append(s)
        # two different merge trees
        import functools
        left = functools.reduce(lambda a, b: a.merge(b),
                                [sketch_from_bytes(p.to_bytes()) for p in parts])
        pairs = [sketch_from_bytes(p.to_bytes()) for p in parts]
        while len(pairs) > 1:
            nxt = []
            for j in range(0, len(pairs), 2):
                if j + 1 < len(pairs):
                    nxt.append(pairs[j].merge(pairs[j + 1]))
                else:
                    nxt.append(pairs[j])
            pairs = nxt
        tree = pairs[0]
        for m in (left, tree):
            assert len(m.sample()) == 64
            assert m.total_weight == total
            assert abs(m.total_estimate() - total) <= 1e-9 * total

    def test_subset_estimate_unbiased_ish(self):
        """Mean subset estimate over independent seeds lands near the
        true subset total (LLN check, generous tolerance)."""
        w = np.ones(3000, dtype=np.int64)
        w[:300] = 7  # subset 'heavy': true total 2100
        ests = []
        for seed in range(200):
            s = VarOptSampler(64, seed=seed)
            s.update_weighted(_vals(3000), w)
            ests.append(s.subset_estimate(
                lambda v: int(v[1:]) < 300))
        true = 2100.0
        assert abs(np.mean(ests) - true) <= 0.15 * true

    def test_determinism_same_seed_same_order(self):
        a, b = VarOptSampler(32, seed=9), VarOptSampler(32, seed=9)
        w = np.arange(1, 1001)
        a.update_weighted(_vals(1000), w)
        b.update_weighted(_vals(1000), w)
        assert a.sample() == b.sample()
        assert a.tau == b.tau

    def test_serialization_roundtrip(self):
        s = VarOptSampler(16, seed=2, name="tag")
        s.update_weighted(_vals(100), np.arange(1, 101))
        r = sketch_from_bytes(s.to_bytes())
        assert r.sample() == s.sample()
        assert r.tau == s.tau and r.total_weight == s.total_weight
        assert r.name == "tag" and r.rebuilds == s.rebuilds

    def test_compat_and_validation_errors(self):
        s = VarOptSampler(16, seed=2)
        with pytest.raises(SketchError):
            s.merge(VarOptSampler(32, seed=2))
        with pytest.raises(SketchError):
            s.merge(VarOptSampler(16, seed=3))
        with pytest.raises(SketchError):
            s.update_weighted(_vals(3), np.array([1, 2]))
        with pytest.raises(SketchError):
            s.update_weighted(_vals(2), np.array([1, 0]))

    def test_periodic_subset_error_bound_holds(self):
        """Review adversary: equal weights make the systematic draw
        perfectly periodic in WEIGHT order; the hash-order permutation
        must decorrelate a periodic subset so the measured SD stays
        within the advertised √(τ·W_S) bound (x1.2 slack)."""
        w = np.ones(128, dtype=np.int64)
        ests = []
        for seed in range(300):
            s = VarOptSampler(64, seed=seed)
            s.update_weighted(_vals(128), w)
            # subset = even ids (any fixed periodic structure)
            ests.append(s.subset_estimate(lambda v: int(v[1:]) % 2 == 0))
            bound = s.subset_error_bound(64.0)
        sd = float(np.std(ests))
        assert sd <= 1.2 * bound, (sd, bound)
        assert abs(np.mean(ests) - 64.0) <= 0.15 * 64.0

    def test_huge_seed_no_overflow(self):
        s = VarOptSampler(4, seed=2 ** 50)
        s.update_weighted(_vals(100), np.arange(1, 101))
        assert len(s.sample()) == 4

    def test_float_weights_rejected_not_truncated(self):
        s = VarOptSampler(8, seed=1)
        with pytest.raises(SketchError):
            s.update_weighted(_vals(2), np.array([1.9, 2.9]))
        # integral floats are fine
        s.update_weighted(_vals(2), np.array([2.0, 3.0]))
        assert s.total_weight == 5

    def test_is_exact_survives_small_merge(self):
        a, b = VarOptSampler(64, seed=1), VarOptSampler(64, seed=1)
        a.update_weighted(_vals(3), np.array([1, 2, 3]))
        b.update_weighted(_vals(2, prefix="w"), np.array([4, 5]))
        a.merge(b)
        assert a.is_exact()
        assert len(a.sample()) == 5 and a.total_estimate() == 15.0

    def test_unweighted_update(self):
        s = VarOptSampler(16, seed=4)
        s.update_arrow(_vals(200))
        assert len(s.sample()) == 16
        assert s.total_weight == 200
        assert abs(s.total_estimate() - 200.0) <= 1e-9 * 200
