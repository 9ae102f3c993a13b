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


def test_horizon_prunes_state_but_keeps_windows_exact():
    vals, times = _stream(span=10_000)
    bounded = SlidingHyperLogLog(11, horizon=2_000)
    full = SlidingHyperLogLog(11)
    bounded.update_arrow(vals, now=times)
    full.update_arrow(vals, now=times)
    assert bounded.n_entries() < full.n_entries()
    tmax = int(times.max())
    for back in (100, 1000, 2000):
        cut = tmax - back
        assert (bounded.registers_since(cut)
                == full.registers_since(cut)).all()
    # horizon is a merge-compat parameter
    with pytest.raises(Exception):
        full.merge(bounded)


def test_sliding_distinct_udaf_grouped(ray_session):
    import ray.data as rd

    from archbloom_ray.pipelines import SlidingDistinct

    rng = np.random.default_rng(13)
    n = 3000
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b"], n)),
        "k": pa.array([f"u{rng.integers(0, 200)}" for _ in range(n)]),
        "ts": pa.array((rng.integers(0, 1000, n) * 1_000_000 + 5)
                       .astype("datetime64[us]")),
    })
    cut = 600
    rows = rd.from_arrow(t).repartition(5).groupby("g").aggregate(
        SlidingDistinct("k", "ts", p=12, since=cut)).take_all()
    got = {r["g"]: r["sliding_distinct(k)"] for r in rows}
    for g in ("a", "b"):
        last = {}
        mask = np.asarray(t["g"]) == g
        secs = np.asarray(t["ts"].cast(pa.int64())) // 1_000_000
        for k, s, m in zip(t["k"].to_pylist(), secs, mask):
            if m:
                last[k] = max(last.get(k, -1), int(s))
        exact = sum(1 for s in last.values() if s >= cut)
        bound = max(3 * 1.04 / 2 ** 6 * exact, 4.0)
        assert abs(got[g] - exact) <= bound


def test_duplicate_key_keeps_latest_time():
    s = SlidingHyperLogLog(8)
    s.update_arrow(pa.array(["x"]), now=np.array([10]))
    s.update_arrow(pa.array(["x"]), now=np.array([99]))
    assert s.n_entries() == 1 and s.times[0] == 99
    assert s.cardinality(since=50) >= 1.0 - 1e-9
