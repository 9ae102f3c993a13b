"""Time-decaying Bloom parity tests (reference tests/test_tdbloom_basic.c).

The reference virtualizes time by editing ``start_time``
(test_tdbloom_basic.c:52,80); here the virtual clock is explicit — ops
take ``now`` relative to the sketch's epoch, which is the same algebra.
"""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import TimeDecayingBloomFilter, SketchError


class TestBasicVectors:
    def test_init_width_selection(self):
        # timeout=2 → 1-byte timers, max_time=255 (tdbloom.c:92-102)
        td = TimeDecayingBloomFilter(10, 0.01, timeout=2)
        assert (td.bytes, td.max_time) == (1, 255)
        assert (td.size, td.hashcount) == (95, 6)  # same sizing as bloom
        assert TimeDecayingBloomFilter(10, 0.01, timeout=300).bytes == 2
        assert TimeDecayingBloomFilter(10, 0.01, timeout=70000).bytes == 4
        assert TimeDecayingBloomFilter(10, 0.01, timeout=2**32).bytes == 8

    def test_membership_and_expiry(self):
        # test_tdbloom_basic.c:37-72
        td = TimeDecayingBloomFilter(10, 0.01, timeout=2)
        td.update_arrow(pa.array(["a", "b"]), now=0)
        assert td.lookup("a", now=0) and td.lookup("b", now=0)
        assert not td.lookup("c", now=0)
        # +3 s skew → expired (start_time -= 3 in the C test)
        assert not td.lookup("a", now=3)
        assert not td.lookup("b", now=3)
        assert td.has_expired("a", now=3)
        # re-add after expiry works
        td.update_arrow(pa.array(["a"]), now=3)
        assert td.lookup("a", now=3)

    def test_long_timeout_variant(self):
        # test_tdbloom_basic.c:76-96: timeout=200 → still 1-byte timers
        # (200 < 255), so a 270 s skew trips the GLOBAL max_time guard
        # (270 > 255, tdbloom.c:342), then the epoch is restored and a
        # fresh add works
        td = TimeDecayingBloomFilter(10, 0.01, timeout=200)
        assert (td.bytes, td.max_time) == (1, 255)
        td.update_arrow(pa.array(["testytesttest"]), now=0)
        assert td.lookup("testytesttest", now=100)
        assert not td.lookup("testytesttest", now=270)  # global guard
        # restore epoch (tf2.start_time += 270 ≡ querying at now=0 again)
        td.update_arrow(pa.array(["lol"]), now=0)
        assert td.lookup("lol", now=0)

    def test_reset_if_expired(self):
        td = TimeDecayingBloomFilter(10, 0.01, timeout=2)
        td.update_arrow(pa.array(["x"]), now=0)
        assert not td.lookup("x", now=5)               # stale (5 > 2)
        assert td.reset_if_expired("x", now=5) is True
        assert td.lookup("x", now=5)
        assert td.reset_if_expired("x", now=6) is False  # still fresh

    def test_global_maxtime_guard(self):
        # lookups all fail once now - start_time > max_time (tdbloom.c:342)
        td = TimeDecayingBloomFilter(10, 0.01, timeout=2)  # max_time 255
        td.update_arrow(pa.array(["a"]), now=0)
        assert not td.lookup("a", now=300)

    def test_sweeps(self):
        td = TimeDecayingBloomFilter(10, 0.01, timeout=2)
        td.update_arrow(pa.array(["a", "b"]), now=0)
        fresh_slots = int((td.filter != 0).sum())
        assert td.count_expired(now=1) == 0
        assert td.count_expired(now=5) == fresh_slots
        assert td.saturation(now=1) > 0
        assert td.saturation(now=5) == 0.0
        assert td.clear_expired(now=5) == fresh_slots
        assert (td.filter == 0).all()

    def test_clear_and_reepoch(self):
        td = TimeDecayingBloomFilter(10, 0.01, timeout=2)
        td.update_arrow(pa.array(["a"]), now=0)
        td.clear(now=100)
        assert td.start_time == 100
        assert not td.lookup("a", now=100)
        td.update_arrow(pa.array(["a"]), now=100)
        assert td.lookup("a", now=101)

    def test_validation(self):
        with pytest.raises(SketchError):
            TimeDecayingBloomFilter(0, 0.01, timeout=2)
        with pytest.raises(SketchError):
            TimeDecayingBloomFilter(10, 0.01, timeout=0)


class TestMergeAndSerde:
    def test_merge_max_tick(self):
        a = TimeDecayingBloomFilter(100, 0.01, timeout=50)
        b = TimeDecayingBloomFilter(100, 0.01, timeout=50)
        a.update_arrow(pa.array(["old"]), now=0)
        b.update_arrow(pa.array(["new"]), now=40)
        m = a.copy().merge(b)
        assert m.lookup("new", now=60)   # fresh via b
        assert not m.lookup("old", now=60)  # stale (60 > 50)
        assert m.lookup("old", now=45)

    def test_merge_equals_union_build(self):
        a = TimeDecayingBloomFilter(500, 0.01, timeout=100)
        b = TimeDecayingBloomFilter(500, 0.01, timeout=100)
        u = TimeDecayingBloomFilter(500, 0.01, timeout=100)
        left = pa.array([f"l{i}" for i in range(200)])
        right = pa.array([f"r{i}" for i in range(200)])
        a.update_arrow(left, now=10)
        b.update_arrow(right, now=20)
        u.update_arrow(left, now=10)
        u.update_arrow(right, now=20)
        assert np.array_equal(a.merge(b).filter, u.filter)

    def test_event_time_per_row(self):
        td = TimeDecayingBloomFilter(100, 0.01, timeout=10)
        ts = np.array([0, 50, 100], dtype=np.int64)
        td.update_arrow(pa.array(["e0", "e50", "e100"]), now=ts)
        assert not td.lookup("e0", now=100)
        assert not td.lookup("e50", now=100)
        assert td.lookup("e100", now=105)

    def test_serde_roundtrip_preserves_everything(self):
        # the reference's tdbloom_load drops `timeout` and has a broken
        # size check (tdbloom.c:639-652) — we round-trip all params
        td = TimeDecayingBloomFilter(10, 0.01, timeout=300, start_time=5, name="td")
        td.update_arrow(pa.array(["x"]), now=10)
        r = TimeDecayingBloomFilter.from_bytes(td.to_bytes())
        assert (r.timeout, r.start_time, r.max_time, r.bytes, r.name) == (300, 5, 65535, 2, "td")
        assert r.lookup("x", now=10)
        assert r.to_bytes() == td.to_bytes()


class TestDeclaredOnlyOps:
    """Engine implementations of ops the reference declares but never
    implemented (tdbloom.h:117-151 TODOs)."""

    def test_lookup_or_add(self):
        td = TimeDecayingBloomFilter(100, 0.01, timeout=100)
        assert not td.lookup_or_add("k", now=10)   # absent → added
        assert td.lookup_or_add("k", now=20)       # now fresh-present
        # sequential semantics inside one batch: 2nd occurrence sees the 1st
        td2 = TimeDecayingBloomFilter(100, 0.01, timeout=100)
        out = td2.lookup_or_add_batch(pa.array(["a", "b", "a"]), now=0)
        assert list(out) == [False, False, True]
        # stale entries read as absent, then re-add
        td3 = TimeDecayingBloomFilter(100, 0.01, timeout=10)
        td3.update_arrow(pa.array(["old"]), now=0)
        assert not td3.lookup_or_add("old", now=50)
        assert td3.lookup("old", now=55)

    def test_last_access_and_active_within(self):
        td = TimeDecayingBloomFilter(100, 0.01, timeout=1000, start_time=0)
        td.update_arrow(pa.array(["x"]), now=42)
        assert td.get_last_access_time("x") == 42
        td.update_arrow(pa.array(["x"]), now=99)   # slots move forward
        assert td.get_last_access_time("x") == 99
        assert td.get_last_access_time("never") == -1
        assert td.was_active_within("x", 90, 110)
        assert not td.was_active_within("x", 0, 50)
        assert not td.was_active_within("never", 0, 10**9)

    def test_expire_older_than(self):
        td = TimeDecayingBloomFilter(100, 0.01, timeout=1000)
        td.update_arrow(pa.array(["old"]), now=0)
        td.update_arrow(pa.array(["new"]), now=500)
        n = td.expire_older_than(100, now=550)     # age(old)=550 > 100; age(new)=50
        assert n > 0
        assert not td.lookup("old", now=550)
        assert td.lookup("new", now=550)

    def test_adjust_timeout(self):
        td = TimeDecayingBloomFilter(100, 0.01, timeout=300)  # 2-byte slots
        td.update_arrow(pa.array(["k"]), now=0)
        assert td.lookup("k", now=200)
        td.adjust_timeout(100)
        assert not td.lookup("k", now=200)         # tighter horizon applies
        with pytest.raises(SketchError):
            td.adjust_timeout(70000)               # needs wider timestamps
        with pytest.raises(SketchError):
            td.adjust_timeout(0)


class TestLastAccessWraparound:
    def test_now_dealiases_after_one_period(self):
        from archbloom_ray.sketches import TimeDecayingBloomFilter

        td = TimeDecayingBloomFilter(100, 0.01, timeout=200, start_time=0)
        period = td.max_time
        t_write = period + 300  # well past the first period
        import pyarrow as pa
        td.update_arrow(pa.array(["x"]), now=t_write)
        # queried at a now shortly after the write: exact de-aliased time
        assert td.get_last_access_time("x", now=t_write + 50) == t_write
        # a stale query point (beyond timeout) refuses to answer
        assert td.get_last_access_time("x", now=t_write + td.timeout + 1) == -1
        # was_active_within anchored at end: finds the write
        assert td.was_active_within("x", t_write - 10, t_write + 10)
        # intrinsic tick aliasing: a query point > one period before the
        # write cannot distinguish it from a same-tick earlier write —
        # the estimate is only anchored within one max_time of `now`
        # (the reference's wrapped-clock lookups share this property);
        # the detectably-stale band still refuses:
        # (a query point whose wrapped distance from the write falls in
        # the (timeout, max_time) stale band, e.g. t_write - 35 here:
        # (cur - v) mod 255 = 220 > 200)
        assert td.get_last_access_time("x", now=t_write - 35) == -1


class TestDeclaredOnlyOps:
    def test_age_element_expires_sooner(self):
        """Aging pulls ticks back so the element goes stale earlier;
        aging past the floor clears its slots (tdbloom.h:134 TODO,
        tdcbloom-consistent semantics)."""
        td = TimeDecayingBloomFilter(50, 0.01, timeout=10, start_time=0)
        td.update_arrow(pa.array(["k"]), now=8)
        assert td.lookup("k", now=12)
        td.age_element("k", 5)            # tick 9 -> 4: stale once now-4 > 10
        assert not td.lookup("k", now=15)
        assert td.lookup("k", now=12)     # 12-4=8 <= 10, still fresh
        td.age_element("k", 100)          # floors to 0 == cleared
        assert not td.lookup("k", now=5)

    def test_saturation_count_matches_saturation(self):
        td = TimeDecayingBloomFilter(100, 0.01, timeout=10, start_time=0)
        assert td.saturation_count(now=0) == 0
        td.update_arrow(pa.array([f"e{i}" for i in range(20)]), now=1)
        c = td.saturation_count(now=1)
        assert 0 < c <= 20 * td.hashcount
        assert td.saturation(now=1) == pytest.approx(c / td.size * 100.0)
        # all entries stale far in the future (within max_time guard)
        assert td.saturation_count(now=200) == 0


    def test_get_average_lifetime(self):
        td = TimeDecayingBloomFilter(100, 0.01, timeout=1000)
        assert td.get_average_lifetime(now=0) == 0      # nothing active
        td.update_arrow(pa.array(["a"]), now=100)
        td.update_arrow(pa.array(["b"]), now=300)
        # at now=400: ages 300 and 100 over k slots each -> mean 200
        avg = td.get_average_lifetime(now=400)
        assert 100 <= avg <= 300
        # expired slots are excluded
        avg_late = td.get_average_lifetime(now=1200)    # "a" expired (age 1100)
        assert avg_late <= 1000


class TestReferenceFileFormat:
    """Golden-file compatibility with the reference's ``tdbloom_save``
    layout (tdbloom.c:528-713) — INTENDED semantics, not its bugs (the
    reference's save leaves max_time 0, its inverted fwrite check
    reports failure on success, and its load's sizeof(tdbloom) size
    check rejects every valid file).  The blob was produced by the
    reference C code: tdbloom_init(100, 0.01, timeout=60) + set_name
    ("goldentd") + add alpha/beta/gamma within the init second
    (tick 1), start_time 112297 — output-only use per SURVEY.md."""

    GOLDEN_B64 = (
        "IXRkYmxvbyFnb2xkZW50ZAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAvgMAAAAA"
        "AAC+AwAAAAAAAAYAAAAAAAAAZAAAAAAAAAAAAAAAAAAAAKm2AQAAAAAAAQAAAArXIzwAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAABAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAABAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAABAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAEAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAABAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAQAAAAAAAAAAAAAAAAABAAAAAAAAAAAAAAAAAAEAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAQAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAEAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAABAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAABAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAQAAAAAAAAAAAAAAAAABAAAAAAAAAAEAAAAAAAEAAAAAAAAAAAAAAAAAAAEAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAEAAAAAAAAAAAAAAAAA"
    )
    GOLDEN_START = 112297

    def _golden(self) -> bytes:
        import base64

        return base64.b64decode("".join(self.GOLDEN_B64))

    def test_import_golden(self):
        f = TimeDecayingBloomFilter.from_reference_bytes(
            self._golden(), timeout=60)
        assert (f.name, f.size, f.hashcount, f.bytes, f.expected,
                f.start_time) == ("goldentd", 958, 6, 1, 100,
                                  self.GOLDEN_START)
        assert f.max_time == 255  # recovered from width (save bug leaves 0)
        for k in ["alpha", "beta", "gamma"]:
            assert f.lookup(k, now=self.GOLDEN_START), k
        assert not f.lookup("zeta", now=self.GOLDEN_START)
        # expired after timeout passes
        assert not f.lookup("alpha", now=self.GOLDEN_START + 100)

    def test_roundtrip_bytes_identical(self):
        data = self._golden()
        f = TimeDecayingBloomFilter.from_reference_bytes(data, timeout=60)
        assert f.to_reference_bytes(reference_quirks=True) == data

    def test_repaired_header_sets_max_time(self):
        import struct

        f = TimeDecayingBloomFilter.from_reference_bytes(
            self._golden(), timeout=60)
        repaired = f.to_reference_bytes()  # intended format
        # max_time is the 5th u64 after the 264-byte magic+name prefix
        vals = struct.unpack_from("<QQQQQQ", repaired, 264)
        assert vals[4] == 255
        back = TimeDecayingBloomFilter.from_reference_bytes(
            repaired, timeout=60)
        assert back.to_bytes() == f.to_bytes()

    def test_engine_built_filter_exports_identically(self):
        f = TimeDecayingBloomFilter(100, 0.01, timeout=60,
                                    start_time=self.GOLDEN_START,
                                    name="goldentd")
        f.update_arrow(pa.array(["alpha", "beta", "gamma"]),
                       now=self.GOLDEN_START)
        assert f.to_reference_bytes(reference_quirks=True) == self._golden()

    def test_invalid_files_rejected(self):
        data = self._golden()
        with pytest.raises(SketchError):
            TimeDecayingBloomFilter.from_reference_bytes(data[:100])
        with pytest.raises(SketchError):
            TimeDecayingBloomFilter.from_reference_bytes(
                b"!wrongm!" + data[8:])
        with pytest.raises(SketchError):
            TimeDecayingBloomFilter.from_reference_bytes(data + b"x")
