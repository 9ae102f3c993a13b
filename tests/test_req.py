"""REQ sketch (Cormode et al. PODS'21, relative rank error, HRA)."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import ReqSketch, sketch_from_bytes
from archbloom_ray.sketches.base import SketchError


def _tail_err(sk, data_sorted, q):
    est = sk.quantile(q)
    r = np.searchsorted(data_sorted, est, side="right") / data_sorted.size
    return abs(r - q) / (1 - q)


class TestReqSketch:
    def test_exact_while_uncompacted(self):
        sk = ReqSketch(32)
        sk.update_arrow(pa.array(np.arange(100.0)))
        assert sk.is_exact()
        # with no compactions every rank is exact
        assert sk.quantile(0.0) == 0.0
        assert sk.quantile(1.0) == 99.0
        assert sk.rank(49.0) == 0.5
        assert sk.n == 100

    def test_relative_tail_accuracy_heavy_tail(self):
        rng = np.random.default_rng(7)
        data = rng.pareto(1.5, 500_000) * 100 + 1
        sk = ReqSketch(32)
        for chunk in np.array_split(data, 16):
            sk.update_arrow(chunk)
        s = np.sort(data)
        for q in (0.5, 0.9, 0.99, 0.999, 0.9999):
            assert _tail_err(sk, s, q) <= 0.05, q
        # sublinear state: 500k items, a few thousand retained
        assert sk.finalize()["retained"] < 10_000

    @pytest.mark.parametrize("order", ["sorted", "reverse", "uniform"])
    def test_accuracy_input_orders(self, order):
        rng = np.random.default_rng(3)
        data = {"sorted": np.arange(200_000.0),
                "reverse": np.arange(200_000.0)[::-1].copy(),
                "uniform": rng.random(200_000)}[order]
        sk = ReqSketch(32)
        for chunk in np.array_split(data, 8):
            sk.update_arrow(chunk)
        s = np.sort(data)
        for q in (0.9, 0.99, 0.999):
            assert _tail_err(sk, s, q) <= 0.05, (order, q)

    def test_merge_matches_single_build_accuracy(self):
        rng = np.random.default_rng(11)
        data = rng.pareto(1.5, 400_000) * 10
        parts = np.array_split(data, 32)
        sks = []
        for p in parts:
            t = ReqSketch(32, seed=42)
            t.update_arrow(p)
            sks.append(t)
        m = sks[0]
        for t in sks[1:]:
            m = m.merge(t)
        assert m.n == data.size
        s = np.sort(data)
        for q in (0.9, 0.99, 0.999):
            assert _tail_err(m, s, q) <= 0.05, q
        assert m.min == data.min() and m.max == data.max()

    def test_weighted_update_bit_decomposition(self):
        # (value, count) ingest == repeating the value count times
        vals = np.arange(1000.0)
        cnts = (np.arange(1000) % 7 + 1).astype(np.int64)
        a = ReqSketch(32, seed=5)
        a.update_weighted(pa.array(vals), cnts)
        assert a.n == int(cnts.sum())
        expanded = np.repeat(vals, cnts)
        s = np.sort(expanded)
        for q in (0.5, 0.9, 0.99):
            assert _tail_err(a, s, q) <= 0.05, q

    def test_serde_roundtrip_and_determinism(self):
        rng = np.random.default_rng(1)
        data = rng.random(100_000)
        a, b = ReqSketch(32, seed=9), ReqSketch(32, seed=9)
        for chunk in np.array_split(data, 10):
            a.update_arrow(chunk)
            b.update_arrow(chunk)
        assert a.to_bytes() == b.to_bytes()          # reproducible build
        c = sketch_from_bytes(a.to_bytes())
        assert c.n == a.n
        assert c.quantiles([0.5, 0.99]) == a.quantiles([0.5, 0.99])
        # resumed state keeps updating identically
        a.update_arrow(data[:1000])
        c.update_arrow(data[:1000])
        assert a.to_bytes() == c.to_bytes()

    def test_merge_incompatible_k_raises(self):
        a, b = ReqSketch(32), ReqSketch(64)
        with pytest.raises(SketchError):
            a.merge(b)

    def test_nulls_and_nans_skipped(self):
        sk = ReqSketch(32)
        sk.update_arrow(pa.array([1.0, None, 3.0, float("nan"), 5.0]))
        assert sk.n == 3 and sk.min == 1.0 and sk.max == 5.0

    def test_bad_k_raises(self):
        with pytest.raises(SketchError):
            ReqSketch(3)
        with pytest.raises(SketchError):
            ReqSketch(7)
