"""Cuckoo filter tests (reference tests/test_cuckoo_basic.c)."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import SketchError
from archbloom_ray.sketches.cuckoo import CuckooFilter


class TestBasicVectors:
    def test_add_lookup_remove(self):
        # test_cuckoo_basic.c:20-46: init(1000, 4, 500)
        cf = CuckooFilter(1000, 4, 500)
        assert cf.num_buckets == 1024  # rounded to power of two (documented)
        assert cf.add("hello") is True
        assert cf.add("world") is True
        assert cf.lookup("hello") and cf.lookup("world")
        assert not cf.lookup("nonexistent")
        assert cf.remove("hello") is True
        assert not cf.lookup("hello")
        assert cf.lookup("world")
        assert cf.remove("hello") is False  # already gone

    def test_save_load_roundtrip(self):
        # test_cuckoo_basic.c:48-88
        cf = CuckooFilter(1000, 4, 500)
        for e in ("alpha", "beta", "gamma"):
            cf.add(e)
        r = CuckooFilter.from_bytes(cf.to_bytes())
        for e in ("alpha", "beta", "gamma"):
            assert r.lookup(e)
        assert not r.lookup("delta")
        assert r.total_insertions == cf.total_insertions
        assert r.to_bytes() == cf.to_bytes()

    def test_load_factor(self):
        cf = CuckooFilter(64, 4, 100)
        assert cf.load_factor() == 0.0
        cf.add("x")
        assert cf.load_factor() == pytest.approx(1 / (64 * 4) * 100)

    def test_geometry_validation(self):
        with pytest.raises(SketchError):
            CuckooFilter(100, 3)


class TestBehavior:
    def test_batch_and_eviction_survival(self):
        cf = CuckooFilter(256, 4, 500)
        keys = pa.array([f"key-{i}" for i in range(700)])  # ~68 % load
        cf.update_arrow(keys)
        assert cf.lookup_batch(keys).mean() > 0.99
        absent = pa.array([f"other-{i}" for i in range(2000)])
        assert cf.lookup_batch(absent).mean() < 0.05  # 16-bit fp FPR is tiny

    def test_insert_failure_at_overload(self):
        cf = CuckooFilter(16, 2, 50)  # capacity 32 (after pow2: 16*2)
        results = [cf.add(f"k{i}") for i in range(100)]
        assert not all(results)      # must eventually fail, not loop forever
        assert cf.evictions > 0

    def test_deterministic_given_seed(self):
        a, b = CuckooFilter(128, 4, 100, seed=7), CuckooFilter(128, 4, 100, seed=7)
        keys = pa.array([f"k{i}" for i in range(300)])
        a.update_arrow(keys)
        b.update_arrow(keys)
        assert np.array_equal(a.buckets, b.buckets)

    def test_evicted_fingerprints_stay_findable(self):
        """The consistent partner function keeps evicted fps reachable
        (the reference's mismatched functions could lose them)."""
        cf = CuckooFilter(128, 4, 500, seed=3)
        keys = [f"x{i}" for i in range(350)]  # ~68 % load → evictions happen
        added = [k for k in keys if cf.add(k)]
        assert len(added) == len(keys)  # all inserts succeed at this load
        found = sum(cf.lookup(k) for k in added)
        assert found == len(added)  # incl. every evicted-and-relocated fp

    def test_merge_small(self):
        a, b = CuckooFilter(256, 4), CuckooFilter(256, 4)
        a.add("one")
        b.add("two")
        a.merge(b)
        assert a.lookup("one") and a.lookup("two")
