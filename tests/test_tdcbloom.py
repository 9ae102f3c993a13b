"""TD counting Bloom parity tests (reference tests/test_tdcbloom_basic.c)."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import TimeDecayingCountingBloomFilter as TDC
from archbloom_ray.sketches import SketchError


class TestBasicVectors:
    def test_init(self):
        t = TDC(10, 0.01, timeout=10, counter_width=8, timer_width=8)
        assert (t.size, t.hashcount) == (95, 6)
        assert t.entry_size == 2
        assert t.max_time == 255

    def test_param_validation(self):
        # tdcbloom.c:82-88 — the only variant that validates
        with pytest.raises(SketchError):
            TDC(0, 0.01, 10)
        with pytest.raises(SketchError):
            TDC(10, 0.0, 10)
        with pytest.raises(SketchError):
            TDC(10, 1.5, 10)
        with pytest.raises(SketchError):
            TDC(10, 0.01, 10, counter_width=4)

    def test_count_vectors(self):
        # test_tdcbloom_basic.c:102-111
        t = TDC(10, 0.01, timeout=10)
        t.update_arrow(pa.array(["two", "two", "one"]), now=1)
        assert t.count("two", now=2) == 2
        assert t.count("one", now=2) == 1
        assert t.count("none", now=2) == 0

    def test_unguarded_remove(self):
        # test_tdcbloom_basic.c:113-118 — unguarded: goes to 0, and
        # removing an absent element is not guarded either
        t = TDC(10, 0.01, timeout=10)
        t.update_arrow(pa.array(["x"]), now=1)
        t.remove("x")
        assert t.count("x", now=1) == 0
        t.remove("x")  # no underflow (floor 0)
        assert t.count("x", now=1) == 0

    def test_expiry(self):
        t = TDC(10, 0.01, timeout=10)
        t.update_arrow(pa.array(["e"]), now=5)
        assert t.lookup("e", now=10)
        assert t.count("e", now=10) == 1
        assert not t.lookup("e", now=20)      # 15 > 10 stale
        assert t.count("e", now=20) == 0
        assert t.has_expired("e", now=20)
        assert t.reset_if_expired("e", now=20) is True
        assert t.lookup("e", now=21)
        assert t.count("e", now=21) == 2      # reset adds → counter now 2

    def test_width_variants(self):
        # test_tdcbloom_basic.c:123-141: 16-bit counter + 32-bit timer
        t = TDC(10, 0.01, timeout=10, counter_width=16, timer_width=32)
        assert t.entry_size == 6
        assert t.max_time == 2**32 - 1
        t.update_arrow(pa.array(["v"] * 300), now=1)
        assert t.count("v", now=2) == 300     # exceeds uint8 range fine

    def test_sweeps_and_aging(self):
        t = TDC(10, 0.01, timeout=10)
        t.update_arrow(pa.array(["a"]), now=5)
        nslots = int((t.counters != 0).sum())
        assert t.count_expired(now=30) == nslots
        assert t.clear_expired(now=30) == nslots
        assert t.saturation_count() == 0
        # aging
        t.update_arrow(pa.array(["b"]), now=100)
        t.age_element("b", 95)   # timers 100 → 5
        assert not t.lookup("b", now=100)  # 95 > 10 → stale
        t.update_arrow(pa.array(["c"]), now=100)
        assert t.age_and_remove(max_age=10, now=200) >= 1
        assert t.count("c", now=200) == 0

    def test_adjust_timeout(self):
        t = TDC(10, 0.01, timeout=100)
        t.update_arrow(pa.array(["a"]), now=1)  # ts=0 is the empty sentinel
        assert t.lookup("a", now=50)
        purged = t.adjust_timeout(10, now=50)
        assert purged > 0  # entries at ts=1 now stale under timeout=10
        assert not t.lookup("a", now=50)

    def test_average_count(self):
        t = TDC(10, 0.01, timeout=10)
        t.update_arrow(pa.array(["a", "a"]), now=1)
        assert t.get_average_count() >= 2.0 or t.get_average_count() > 0


class TestMergeAndSerde:
    def test_merge(self):
        a, b = TDC(100, 0.01, timeout=50), TDC(100, 0.01, timeout=50)
        a.update_arrow(pa.array(["k"]), now=10)
        b.update_arrow(pa.array(["k"]), now=30)
        m = a.copy().merge(b)
        assert m.count("k", now=30) == 2      # counters added
        assert m.lookup("k", now=75)          # timestamp max (30) fresh at 75
        assert not m.lookup("k", now=85)

    def test_merge_equals_union_build(self):
        a, b, u = (TDC(500, 0.01, timeout=100) for _ in range(3))
        left = pa.array([f"l{i % 40}" for i in range(200)])
        right = pa.array([f"r{i % 40}" for i in range(200)])
        a.update_arrow(left, now=10)
        b.update_arrow(right, now=20)
        u.update_arrow(left, now=10)
        u.update_arrow(right, now=20)
        a.merge(b)
        assert np.array_equal(a.counters, u.counters)
        assert np.array_equal(a.timers, u.timers)

    def test_serde_roundtrip(self):
        # the reference's save/load are stubs (tdcbloom.c:923-932); ours
        # is a real round-trip
        t = TDC(10, 0.01, timeout=10, counter_width=16, timer_width=32, name="t")
        t.update_arrow(pa.array(["x", "x"]), now=7)
        r = TDC.from_bytes(t.to_bytes())
        assert r.count("x", now=8) == 2
        assert r.to_bytes() == t.to_bytes()


    def test_expire_below_count(self):
        td = TDC(100, 0.01, timeout=1000)
        td.update_arrow(pa.array(["once"]), now=10)
        for _ in range(5):
            td.update_arrow(pa.array(["often"]), now=20)
        swept = td.expire_below_count(3, now=30)
        assert swept > 0
        assert not td.lookup("once", now=30)
        assert td.count("often", now=30) == 5

    def test_expire_by_frequency(self):
        td = TDC(100, 0.01, timeout=1000)
        td.update_arrow(pa.array(["x"]), now=10)
        assert td.expire_by_frequency(2, now=20) is True
        assert td.expire_by_frequency(2, now=20) is False  # nothing left
