"""Scalable Bloom filter (Almeida et al., IPL 2007): growth across
stages with no false negatives, measured FPR under the deterministic
union bound, stage-concatenation merge algebra (associative), serde,
and multiplicity-blindness (set semantics)."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import ScalableBloomFilter, SketchError
from archbloom_ray.sketches.base import sketch_from_bytes


def _keys(n, prefix="k"):
    return pa.array([f"{prefix}-{i}" for i in range(n)])


def _built(lo, hi, **kw):
    f = ScalableBloomFilter(128, 0.01, **kw)
    f.update_arrow(pa.array([f"k-{i}" for i in range(lo, hi)]))
    return f


class TestScalableBloom:
    def test_grows_stages_and_never_false_negative(self):
        keys = _keys(20_000)
        f = ScalableBloomFilter(128, 0.01)
        f.update_arrow(keys)
        assert f.n_stages >= 5          # 128·2^i chain to cover 20k
        assert f.items_added() == 20_000
        assert f.lookup_batch(keys).all()
        # every stage respected its declared capacity
        assert all(i <= c for i, c in zip(f.stage_items, f.stage_capacity))

    def test_measured_fpr_under_union_bound(self):
        f = ScalableBloomFilter(128, 0.01)
        f.update_arrow(_keys(20_000))
        fpr = f.lookup_batch(_keys(50_000, "absent")).mean()
        assert fpr <= f.error_bound(), (fpr, f.error_bound())
        # single-writer chain: bound telescopes under p0/(1-r)
        assert f.error_bound() <= 0.01 / (1 - 0.9) + 1e-9

    def test_incremental_adds_across_batches(self):
        f = ScalableBloomFilter(128, 0.01)
        for lo in range(0, 5000, 700):     # ragged batch sizes
            f.update_arrow(_keys(min(lo + 700, 5000) - lo, f"b{lo}"))
        # dedup-on-add skips cross-batch false positives too, so the
        # fill count UNDERcounts by at most the FPR bound (such items
        # still read present forever — no false negative); one-call
        # builds (test above) count exactly.
        n = sum(min(lo + 700, 5000) - lo for lo in range(0, 5000, 700))
        assert n * (1 - f.error_bound()) <= f.items_added() <= n
        for lo in range(0, 5000, 700):
            assert f.lookup_batch(
                _keys(min(lo + 700, 5000) - lo, f"b{lo}")).all()

    def test_merge_concat_associative_and_no_false_negatives(self):
        b, c = _built(1000, 3000), _built(3000, 6000)
        ab_c = _built(0, 1000).merge(b.copy()).merge(c.copy())
        a_bc = _built(0, 1000).merge(b.copy().merge(c.copy()))
        assert ab_c.to_bytes() == a_bc.to_bytes()
        assert ab_c.lookup_batch(_keys(6000)).all()
        # union bound adds across merged parts
        assert ab_c.error_bound() <= 3 * (0.01 / (1 - 0.9)) + 1e-9
        fpr = ab_c.lookup_batch(_keys(50_000, "absent")).mean()
        assert fpr <= ab_c.error_bound()

    def test_merge_policy_mismatch_raises(self):
        a = ScalableBloomFilter(128, 0.01)
        b = ScalableBloomFilter(128, 0.01, tightening=0.5)
        with pytest.raises(SketchError):
            a.merge(b)

    def test_serde_roundtrip_bitwise(self):
        f = _built(0, 5000)
        blob = f.to_bytes()
        g = sketch_from_bytes(blob)
        assert isinstance(g, ScalableBloomFilter)
        assert g.to_bytes() == blob
        assert g.n_stages == f.n_stages
        assert g.stage_items == f.stage_items
        assert g.lookup_batch(_keys(5000)).all()
        # deserialized filter keeps growing correctly
        g.update_arrow(_keys(1000, "post"))
        assert g.lookup_batch(_keys(1000, "post")).all()

    def test_set_semantics_distinct_equals_full(self):
        full = ScalableBloomFilter(64, 0.01)
        full.update_arrow(pa.array(["a", "b", "a", "c", "b", "a", "c"]))
        dis = ScalableBloomFilter(64, 0.01)
        dis.update_arrow(pa.array(["a", "b", "c"]))
        assert full.to_bytes() == dis.to_bytes()
        assert full.items_added() == 3

    def test_added_in_early_stage_found_after_growth(self):
        f = ScalableBloomFilter(128, 0.01)
        early = _keys(100, "early")
        f.update_arrow(early)
        f.update_arrow(_keys(30_000, "later"))
        assert f.n_stages > 1
        assert f.lookup_batch(early).all()

    def test_empty_and_clear(self):
        f = ScalableBloomFilter(128, 0.01)
        assert f.lookup_batch(_keys(10)).sum() == 0
        assert f.error_bound() == 0.0
        f.update_arrow(_keys(100))
        f.clear()
        assert f.n_stages == 0 and f.items_added() == 0


def test_cli_fresh_like_starts_empty():
    """cmd_add's delta factory must not inherit the base's stage state
    (the stage list is state, not a parameter)."""
    from archbloom_ray.cli import _fresh_like

    base = ScalableBloomFilter(128, 0.01)
    base.update_arrow(_keys(5000))
    fresh = _fresh_like(base)
    assert fresh.n_stages == 0 and fresh.items_added() == 0
    fresh.update_arrow(_keys(100, "delta"))
    base.merge(fresh)
    assert base.lookup_batch(_keys(100, "delta")).all()
    assert base.lookup_batch(_keys(5000)).all()
