"""DGIM sliding-window count sketch: paper bounds as pytest oracles.

Single-stream relative bound ≤ 1/(2(r−1)); absolute half-oldest-bucket
bound under time-partitioned merges; exact-window parity vs a brute
count; serialization round-trip; invariants (≤ r per size, powers of
two, expiry)."""

import numpy as np
import pytest

from archbloom_ray.sketches import DGIM, SketchError, sketch_from_bytes


def _exact(ts, now, window):
    ts = np.asarray(ts)
    return int(((ts > now - window) & (ts <= now)).sum())


class TestDGIMSingleStream:
    @pytest.mark.parametrize("r", [2, 4])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_relative_bound_random_stream(self, r, seed):
        rng = np.random.default_rng(seed)
        ts = np.cumsum(rng.integers(0, 5, 4000)).astype(np.int64)
        window = 500
        d = DGIM(window, r=r)
        d.update_arrow(ts)
        for now in [int(ts[-1]), int(ts[-1]) + 100, int(ts[-1]) + 499]:
            exact = _exact(ts, now, window)
            est = d.estimate(now)
            assert abs(est - exact) <= d.error_bound()
            if exact > 0:
                assert abs(est - exact) <= exact / (2 * (r - 1)) + 1

    def test_expiry_to_zero(self):
        d = DGIM(100)
        d.update_arrow(np.arange(50, dtype=np.int64))
        # window is (now−W, now]: the last event (ts=49) survives while
        # now − 100 < 49, i.e. through now = 148
        assert d.estimate(148) > 0
        assert d.estimate(149) == 0
        assert d.bucket_count() == 0

    def test_invariants(self):
        rng = np.random.default_rng(3)
        ts = np.cumsum(rng.integers(0, 3, 2000)).astype(np.int64)
        d = DGIM(300, r=2)
        d.update_arrow(ts)
        sizes = d._sizes
        # ≤ r of each size; newest-first timestamps strictly ordered
        for e in set(sizes):
            assert sizes.count(e) <= 2
        assert all(a >= b for a, b in zip(d._ts, d._ts[1:]))
        # memory is O(log^2 W)-ish, never O(n)
        assert d.bucket_count() <= 2 * (int(np.log2(300)) + 2)

    def test_out_of_order_raises(self):
        d = DGIM(100)
        d.add_event(10)
        with pytest.raises(SketchError):
            d.add_event(9)


class TestDGIMMerge:
    def test_time_partitioned_merge_bound(self):
        rng = np.random.default_rng(7)
        ts = np.cumsum(rng.integers(0, 4, 3000)).astype(np.int64)
        window = 400
        cut = 1500
        a = DGIM(window)
        a.update_arrow(ts[:cut])
        b = DGIM(window)
        b.update_arrow(ts[cut:])
        a.merge(b)
        now = int(ts[-1])
        exact = _exact(ts, now, window)
        assert abs(a.estimate(now) - exact) <= a.error_bound()

    def test_merge_associative_within_bound(self):
        ts = np.arange(0, 900, dtype=np.int64)
        parts = [ts[:300], ts[300:600], ts[600:]]
        window = 250
        left = DGIM(window)
        for p in parts:
            d = DGIM(window)
            d.update_arrow(p)
            left.merge(d)
        right_tail = DGIM(window)
        for p in parts[1:]:
            d = DGIM(window)
            d.update_arrow(p)
            right_tail.merge(d)
        head = DGIM(window)
        head.update_arrow(parts[0])
        head.merge(right_tail)
        now = int(ts[-1])
        exact = _exact(ts, now, window)
        for d in (left, head):
            assert abs(d.estimate(now) - exact) <= d.error_bound()

    def test_overlapping_merge_raises(self):
        a = DGIM(100)
        a.update_arrow(np.array([1, 5, 9], dtype=np.int64))
        b = DGIM(100)
        b.update_arrow(np.array([4, 7], dtype=np.int64))
        with pytest.raises(SketchError, match="overlap"):
            a.merge(b)

    def test_empty_merges(self):
        a = DGIM(100)
        b = DGIM(100)
        b.update_arrow(np.array([3, 4], dtype=np.int64))
        a.merge(b)
        assert a.estimate(4) == 2
        a.merge(DGIM(100))
        assert a.estimate(4) == 2


class TestDGIMSerde:
    def test_roundtrip(self):
        d = DGIM(500, r=4, name="win")
        d.update_arrow(np.cumsum(np.ones(700, dtype=np.int64)))
        back = sketch_from_bytes(d.to_bytes())
        assert back.to_bytes() == d.to_bytes()
        assert back.estimate(700) == d.estimate(700)
        assert back.name == "win" and back.window == 500 and back.r == 4
