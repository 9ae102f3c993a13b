"""Blocked Bloom filter (Putze et al. WEA'07): no false negatives,
measured FPR near target despite block-occupancy variance, OR-merge
algebra, serde."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import BlockedBloomFilter, SketchError
from archbloom_ray.sketches.base import sketch_from_bytes


def _keys(n, prefix="k"):
    return pa.array([f"{prefix}-{i}" for i in range(n)])


class TestBlockedBloom:
    def test_no_false_negatives(self):
        keys = _keys(50_000)
        f = BlockedBloomFilter(50_000, 0.01)
        f.update_arrow(keys)
        assert f.lookup_batch(keys).all()

    def test_measured_fpr_near_target(self):
        n = 100_000
        f = BlockedBloomFilter(n, 0.01)
        f.update_arrow(_keys(n))
        fpr = f.lookup_batch(_keys(100_000, "absent")).mean()
        # 30% size premium compensates the blocked layout; generous 2x
        assert fpr <= 0.02, fpr

    def test_merge_or_algebra(self):
        a = BlockedBloomFilter(10_000, 0.01)
        b = BlockedBloomFilter(10_000, 0.01)
        a.update_arrow(_keys(5000, "a"))
        b.update_arrow(_keys(5000, "b"))
        one = BlockedBloomFilter(10_000, 0.01)
        one.update_arrow(_keys(5000, "a"))
        one.update_arrow(_keys(5000, "b"))
        a.merge(b)
        np.testing.assert_array_equal(a.words, one.words)
        assert a.lookup_batch(_keys(5000, "b")).all()

    def test_merge_incompatible(self):
        with pytest.raises(SketchError):
            BlockedBloomFilter(10_000, 0.01).merge(
                BlockedBloomFilter(20_000, 0.01))

    def test_serde(self):
        f = BlockedBloomFilter(5000, 0.02, name="snap")
        f.update_arrow(_keys(5000))
        r = sketch_from_bytes(f.to_bytes())
        assert isinstance(r, BlockedBloomFilter)
        np.testing.assert_array_equal(r.words, f.words)
        assert r.lookup_batch(_keys(5000)).all()
        assert r.lookup("k-17") and r.hashcount == f.hashcount

    def test_saturation_and_validation(self):
        f = BlockedBloomFilter(1000, 0.01)
        assert f.saturation() == 0.0
        f.update_arrow(_keys(1000))
        assert 0.0 < f.saturation() < 0.7
        with pytest.raises(SketchError):
            BlockedBloomFilter(0, 0.01)

    def test_probes_confined_to_one_block(self):
        from archbloom_ray.hashing import mmh3_128_batch

        f = BlockedBloomFilter(100_000, 0.01)
        h1, h2 = mmh3_128_batch(_keys(2000))
        word, _ = f._word_mask(h1, h2)
        blocks = word // 8  # _BLOCK_WORDS
        # every probe of a key lands in that key's single block
        assert (blocks == blocks[0]).all()
