"""Sliding-window HyperLogLog (sketches/slidinghll.py)."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import HyperLogLog, SlidingHyperLogLog
from archbloom_ray.sketches.base import sketch_from_bytes


def _stream(n=4000, keys=600, span=1000, seed=5):
    rng = np.random.default_rng(seed)
    vals = pa.array([f"user-{rng.integers(0, keys)}" for _ in range(n)])
    times = rng.integers(0, span, n).astype(np.int64)
    return vals, times


def _exact_since(vals, times, cut):
    last = {}
    for v, t in zip(vals.to_pylist(), times):
        last[v] = max(last.get(v, -(1 << 62)), int(t))
    return sum(1 for t in last.values() if t >= cut)


def test_full_window_equals_plain_hll():
    vals, times = _stream()
    s = SlidingHyperLogLog(12)
    s.update_arrow(vals, now=times)
    h = HyperLogLog(12)
    h.update_arrow(vals)
    # same hash, same ranks: the all-time register file is identical
    assert (s.registers_since(None) == h.registers).all()
    assert s.cardinality() == h.cardinality()


@pytest.mark.parametrize("cut", [0, 250, 500, 900, 999])
def test_window_estimates_within_bound(cut):
    vals, times = _stream()
    s = SlidingHyperLogLog(12)
    s.update_arrow(vals, now=times)
    exact = _exact_since(vals, times, cut)
    bound = max(3 * s.relative_error_bound() * exact, 4.0)
    assert abs(s.cardinality(since=cut) - exact) <= bound


def test_pareto_invariant_and_compactness():
    vals, times = _stream()
    s = SlidingHyperLogLog(10)
    # many small updates: canonical form must be split-invariant
    for i in range(0, len(vals), 123):
        s.update_arrow(vals.slice(i, 123), now=times[i:i + 123])
    d = np.diff(np.flatnonzero(np.diff(s.regs) != 0))
    # within each register: times strictly decreasing, ranks strictly inc
    same = s.regs[1:] == s.regs[:-1]
    assert (np.diff(s.times)[same] < 0).all()
    assert (np.diff(s.ranks.astype(int))[same] > 0).all()
    # LFPM stays O(log n) per register, far below one entry per item
    assert s.n_entries() < 6 * s.m


def test_merge_is_order_independent_and_canonical():
    vals, times = _stream()
    parts = [(vals.slice(0, 1500), times[:1500]),
             (vals.slice(1500, 1500), times[1500:3000]),
             (vals.slice(3000), times[3000:])]

    def build(order):
        sks = []
        for v, t in parts:
            sk = SlidingHyperLogLog(11)
            sk.update_arrow(v, now=t)
            sks.append(sk)
        acc = sks[order[0]]
        for i in order[1:]:
            acc.merge(sks[i])
        return acc

    a, b = build([0, 1, 2]), build([2, 0, 1])
    assert (a.regs == b.regs).all() and (a.ranks == b.ranks).all() \
        and (a.times == b.times).all()
    seq = SlidingHyperLogLog(11)
    seq.update_arrow(vals, now=times)
    assert (a.regs == seq.regs).all() and (a.times == seq.times).all()


def test_serialization_roundtrip():
    vals, times = _stream(n=800)
    s = SlidingHyperLogLog(9, name="win")
    s.update_arrow(vals, now=times)
    r = sketch_from_bytes(s.to_bytes())
    assert isinstance(r, SlidingHyperLogLog) and r.name == "win"
    assert (r.regs == s.regs).all() and (r.ranks == s.ranks).all() \
        and (r.times == s.times).all()
    assert r.cardinality(since=500) == s.cardinality(since=500)


def test_distributed_build_equals_sequential(ray_session):
    import ray.data as rd

    from archbloom_ray.pipelines.build import build_event_time_sketch

    vals, times = _stream(n=5000, keys=300)
    # fractional-µs timestamps: the build must floor-divide, not cast
    ts = pa.array((times * 1_000_000 + 777).astype("datetime64[us]"))
    t = pa.table({"k": vals, "ts": ts})
    sk = build_event_time_sketch(rd.from_arrow(t).repartition(6),
                                 "k", "ts",
                                 lambda: SlidingHyperLogLog(11))
    seq = SlidingHyperLogLog(11)
    seq.update_arrow(vals, now=times)
    assert (sk.regs == seq.regs).all() and (sk.times == seq.times).all()


def test_duplicate_key_keeps_latest_time():
    s = SlidingHyperLogLog(8)
    s.update_arrow(pa.array(["x"]), now=np.array([10]))
    s.update_arrow(pa.array(["x"]), now=np.array([99]))
    assert s.n_entries() == 1 and s.times[0] == 99
    assert s.cardinality(since=50) >= 1.0 - 1e-9
