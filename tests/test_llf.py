"""LogLog Filter (ICDE'21 cold-item filter) — determinism,
idempotence, max-merge, hot/cold separation."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import LogLogFilter, sketch_from_bytes
from archbloom_ray.sketches.base import SketchError


def _stream(n_hot=8, hot_c=2000, n_cold=20000, seed=3):
    rng = np.random.default_rng(seed)
    items = np.concatenate([
        np.repeat([f"hot_{i}" for i in range(n_hot)], hot_c),
        np.array([f"cold_{i}" for i in range(n_cold)]),
    ])
    order = rng.permutation(items.size)
    items = items[order]
    occ = np.arange(items.size, dtype=np.int64)[order]  # id follows item
    return items, occ


class TestLogLogFilter:
    def test_hot_recall_and_cold_prune(self):
        items, occ = _stream()
        f = LogLogFilter(1 << 20, seed=7)
        f.update_arrow(pa.array(items), occ=occ)
        hot = pa.array([f"hot_{i}" for i in range(8)])
        cold = pa.array([f"cold_{i}" for i in range(20000)])
        assert f.is_hot_batch(hot, 6).all()          # c=2000 each
        assert f.is_hot_batch(cold, 6).mean() < 0.10  # singletons

    def test_deterministic_and_idempotent(self):
        items, occ = _stream(n_cold=5000)
        a = LogLogFilter(1 << 16, seed=1)
        a.update_arrow(pa.array(items), occ=occ)
        b = LogLogFilter(1 << 16, seed=1)
        b.update_arrow(pa.array(items), occ=occ)
        assert np.array_equal(a.cells, b.cells)      # deterministic
        # re-applying a retried batch changes nothing (max idempotent)
        before = a.cells.copy()
        a.update_arrow(pa.array(items[:1000]), occ=occ[:1000])
        assert np.array_equal(a.cells, before)

    def test_merge_is_registerwise_max(self):
        items, occ = _stream(n_cold=5000)
        whole = LogLogFilter(1 << 16, seed=1)
        whole.update_arrow(pa.array(items), occ=occ)
        parts = []
        for lo in range(0, items.size, 3001):
            p = LogLogFilter(1 << 16, seed=1)
            p.update_arrow(pa.array(items[lo:lo + 3001]),
                           occ=occ[lo:lo + 3001])
            parts.append(p)
        m = parts[0]
        for p in parts[1:]:
            m = m.merge(p)
        assert np.array_equal(m.cells, whole.cells)   # split ≡ one-shot
        assert m.n == whole.n

    def test_serde_roundtrip(self):
        items, occ = _stream(n_cold=1000)
        f = LogLogFilter(1 << 16, seed=2)
        f.update_arrow(pa.array(items), occ=occ)
        g = sketch_from_bytes(f.to_bytes())
        assert np.array_equal(g.cells, f.cells) and g.n == f.n
        assert g.m == f.m and g.seed == f.seed

    def test_estimates_track_magnitude(self):
        items, occ = _stream(n_hot=4, hot_c=4096, n_cold=0)
        f = LogLogFilter(1 << 16, seed=5)
        f.update_arrow(pa.array(items), occ=occ)
        est = f.estimate_batch(pa.array(["hot_0", "hot_1"]))
        # max-rank estimate is within a constant factor whp
        assert (est >= 256).all() and (est <= 1 << 20).all()

    def test_guards(self):
        with pytest.raises(SketchError):
            LogLogFilter(8)
        a, b = LogLogFilter(1 << 16), LogLogFilter(1 << 17)
        with pytest.raises(SketchError):
            a.merge(b)
