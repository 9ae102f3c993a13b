"""Stable Bloom filter (Deng & Rafiei SIGMOD'06): stationary FP bound,
recency semantics, decay, determinism, serde, non-mergeability."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import SketchError, StableBloomFilter
from archbloom_ray.sketches.base import sketch_from_bytes


def _stream(s, n, prefix="u", batch=4000):
    for i in range(0, n, batch):
        s.update_arrow(pa.array(
            [f"{prefix}{j}" for j in range(i, min(i + batch, n))]))


class TestStationaryBound:
    @pytest.mark.parametrize("m,k,p,mx", [(4096, 3, 8, 1), (16384, 3, 4, 1),
                                          (8192, 4, 10, 3)])
    def test_measured_fpr_near_theory(self, m, k, p, mx):
        """After ≫ m·Max/P inserts the measured absent-probe FP rate
        sits at the paper's FPS (gate 1.5× — the sub-batch coarsening
        biases fill slightly above the stationary expectation), and
        the fill fraction tracks 1 − P(cell=0)."""
        s = StableBloomFilter(num_cells=m, k=k, p=p, max_val=mx, seed=7)
        _stream(s, 120_000)
        absent = pa.array([f"absent{i}" for i in range(20_000)])
        fpr = float(s.lookup_batch(absent).mean())
        bound = s.stable_fp_rate()
        assert fpr <= 1.5 * bound, (fpr, bound)
        assert fpr >= 0.2 * bound            # sanity: in the regime
        assert abs(s.fill_fraction() - bound ** (1.0 / k)) < 0.08

    def test_fp_rate_below_stationary_during_convergence(self):
        """FPS is approached monotonically from below (paper Thm 3) —
        a short stream must not exceed the stationary gate either."""
        s = StableBloomFilter(num_cells=16384, k=3, p=4, seed=11)
        _stream(s, 3_000)
        absent = pa.array([f"absent{i}" for i in range(20_000)])
        assert float(s.lookup_batch(absent).mean()) <= 1.5 * s.stable_fp_rate()


class TestRecencySemantics:
    def test_last_chunk_always_present(self):
        """Elements of the final sub-batch have no later decrements —
        exactly present, deterministically."""
        s = StableBloomFilter(num_cells=4096, k=3, p=8, seed=3)
        _stream(s, 50_000)
        step = max(1, s.m // (16 * s.k))
        final = pa.array([f"tail{j}" for j in range(step)])  # one chunk
        s.update_arrow(final)
        assert s.lookup_batch(final).all()

    def test_old_items_decay_below_recent(self):
        s = StableBloomFilter(num_cells=4096, k=3, p=8, seed=3)
        _stream(s, 50_000)
        old = pa.array([f"u{j}" for j in range(1_000)])
        recent = pa.array([f"u{j}" for j in range(49_900, 50_000)])
        old_rate = float(s.lookup_batch(old).mean())
        recent_rate = float(s.lookup_batch(recent).mean())
        assert old_rate < 0.5 < recent_rate
        assert old_rate < recent_rate

    def test_deterministic_given_seed_and_batching(self):
        a = StableBloomFilter(num_cells=2048, k=3, p=4, seed=5)
        b = StableBloomFilter(num_cells=2048, k=3, p=4, seed=5)
        _stream(a, 10_000, batch=1000)
        _stream(b, 10_000, batch=1000)
        assert (a.cells == b.cells).all()
        c = StableBloomFilter(num_cells=2048, k=3, p=4, seed=6)
        _stream(c, 10_000, batch=1000)
        assert (a.cells != c.cells).any()


class TestContract:
    def test_serde_roundtrip_continues_stream(self):
        s = StableBloomFilter(num_cells=2048, k=3, p=4, seed=5)
        _stream(s, 5_000)
        r = sketch_from_bytes(s.to_bytes())
        assert (r.cells == s.cells).all()
        assert r.inserts == s.inserts and r._ctr == s._ctr
        # continuing both produces identical state (ctr persisted)
        _stream(s, 1_000, prefix="v")
        _stream(r, 1_000, prefix="v")
        assert (r.cells == s.cells).all()

    def test_merge_refused(self):
        a = StableBloomFilter(num_cells=2048)
        with pytest.raises(SketchError, match="do not merge"):
            a.merge(StableBloomFilter(num_cells=2048))

    def test_validation(self):
        with pytest.raises(SketchError):
            StableBloomFilter(num_cells=4)
        with pytest.raises(SketchError):
            StableBloomFilter(max_val=0)
        with pytest.raises(SketchError):
            StableBloomFilter(max_val=256)

    def test_empty_and_single(self):
        s = StableBloomFilter(num_cells=2048)
        s.update_arrow(pa.array([], type=pa.string()))
        assert s.inserts == 0
        s.update_arrow(pa.array(["x"]))
        assert s.lookup("x") and not s.lookup("y")
