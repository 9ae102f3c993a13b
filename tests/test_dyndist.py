"""DynamicDistinct — fully-dynamic (insert+delete) distinct counting."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches.base import SketchError, sketch_from_bytes
from archbloom_ray.sketches.dyndist import DynamicDistinct


def _keys(n, prefix="k"):
    return pa.array(np.char.add(prefix, np.arange(n).astype(str)))


class TestDynamicDistinct:
    def test_insert_only_accuracy(self):
        for d_true in (100, 5_000, 200_000):
            d = DynamicDistinct(8192)
            d.update_arrow(_keys(d_true))
            assert abs(d.estimate() - d_true) <= \
                d.relative_error_bound() * d_true + 3, d_true

    def test_deletes_cancel_exactly(self):
        keys = np.char.add("k", np.arange(100_000).astype(str))
        d = DynamicDistinct(8192)
        d.update_arrow(pa.array(keys))
        d.update_arrow(pa.array(keys[:30_000]))             # dup inserts
        d.update_arrow(pa.array(keys[:60_000]),
                       signs=-np.ones(60_000, dtype=np.int64))
        d.update_arrow(pa.array(keys[:30_000]),
                       signs=-np.ones(30_000, dtype=np.int64))
        live = 40_000
        assert abs(d.estimate() - live) <= d.relative_error_bound() * live
        # deleting EVERYTHING returns the state to all-zero (linear)
        d.update_arrow(pa.array(keys[60_000:]),
                       signs=-np.ones(40_000, dtype=np.int64))
        assert not d.cells.any()
        assert d.estimate() == 0.0

    def test_linear_merge_order_free(self):
        keys = np.char.add("k", np.arange(50_000).astype(str))
        parts = []
        for lo in range(0, 50_000, 7001):
            p = DynamicDistinct(4096)
            p.update_arrow(pa.array(keys[lo:lo + 7001]))
            parts.append(p)
        fwd = DynamicDistinct(4096)
        for p in parts:
            fwd.merge(p)
        rev = DynamicDistinct(4096)
        for p in reversed(parts):
            rev.merge(p)
        one = DynamicDistinct(4096)
        one.update_arrow(pa.array(keys))
        assert np.array_equal(fwd.cells, rev.cells)
        assert np.array_equal(fwd.cells, one.cells)  # linear: sum of updates

    def test_invert_retracts(self):
        a, b = DynamicDistinct(4096), DynamicDistinct(4096)
        a.update_arrow(_keys(10_000))
        b.update_arrow(_keys(4_000, prefix="x"))
        m = DynamicDistinct(4096)
        m.merge(a).merge(b).merge(b.invert())
        assert np.array_equal(m.cells, a.cells)

    def test_serde_and_guards(self):
        d = DynamicDistinct(4096, seed=3)
        d.update_arrow(_keys(1_000))
        e = sketch_from_bytes(d.to_bytes())
        assert np.array_equal(e.cells, d.cells) and e.s == d.s
        assert e.estimate() == d.estimate()
        with pytest.raises(SketchError):
            DynamicDistinct(16)
        with pytest.raises(SketchError):
            d.merge(DynamicDistinct(8192))
