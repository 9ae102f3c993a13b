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


class TestReferenceGoldenFile:
    """Golden-file interop with the reference's raw-struct cuckoo dump
    (VERDICT r4 item 6): tests/data/golden_ref.cuckoo was written by
    the COMPILED reference (cuckoo_init(100,4,500), prng pinned to
    12345, 15 NATO-alphabet keys, cuckoo_save) and re-verified through
    the reference's own cuckoo_load.  Same-arch caveat: the header
    embeds raw LP64 struct bytes (cuckoo.c:214-218's own TODO)."""

    KEYS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
            "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
            "november", "oscar"]
    ABSENT = ["zulu", "yankee", "xray", "whiskey", "victor"]

    def _golden(self) -> bytes:
        import os

        p = os.path.join(os.path.dirname(__file__), "data",
                         "golden_ref.cuckoo")
        with open(p, "rb") as f:
            return f.read()

    def test_import_golden(self):
        from archbloom_ray.sketches import ReferenceCuckooFilter

        f = ReferenceCuckooFilter.from_reference_bytes(self._golden())
        # geometry printed by the C harness at save time; ins=0 is the
        # reference's by-value counter loss, preserved verbatim
        assert (f.num_buckets, f.bucket_size, f.max_kicks,
                f.total_insertions, f.prng_state) == (100, 4, 500, 0, 12345)
        assert f.finalize()["occupied_slots"] == 15
        for k in self.KEYS:
            assert f.lookup(k), k
        for k in self.ABSENT:
            assert not f.lookup(k), k
        got = f.lookup_batch(pa.array(self.KEYS + self.ABSENT))
        assert list(got) == [True] * 15 + [False] * 5

    def test_roundtrip_bytes_identical(self):
        from archbloom_ray.sketches import ReferenceCuckooFilter

        d = self._golden()
        f = ReferenceCuckooFilter.from_reference_bytes(d)
        assert f.to_reference_bytes() == d

    def test_engine_serde_roundtrip(self):
        from archbloom_ray.sketches import ReferenceCuckooFilter
        from archbloom_ray.sketches.base import sketch_from_bytes

        d = self._golden()
        f = ReferenceCuckooFilter.from_reference_bytes(d, name="golden")
        r = sketch_from_bytes(f.to_bytes())
        assert isinstance(r, ReferenceCuckooFilter)
        assert r.to_reference_bytes() == d
        assert all(r.lookup(k) for k in self.KEYS)

    def test_read_view_refuses_mutation(self):
        from archbloom_ray.sketches import ReferenceCuckooFilter, SketchError

        f = ReferenceCuckooFilter.from_reference_bytes(self._golden())
        with pytest.raises(SketchError, match="read view"):
            f.update_arrow(pa.array(["x"]))
        with pytest.raises(SketchError, match="read view"):
            f.merge(f)

    def test_invalid_files_rejected(self):
        from archbloom_ray.sketches import ReferenceCuckooFilter, SketchError

        d = self._golden()
        with pytest.raises(SketchError):
            ReferenceCuckooFilter.from_reference_bytes(d[:40])
        with pytest.raises(SketchError):
            ReferenceCuckooFilter.from_reference_bytes(d[:-8])
        with pytest.raises(SketchError):
            ReferenceCuckooFilter.from_reference_bytes(d + b"x")

    def test_cli_import_export_ref(self, tmp_path):
        import json as _json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        src = os.path.join(repo, "tests", "data", "golden_ref.cuckoo")
        sk = str(tmp_path / "imported.sk")
        out = str(tmp_path / "exported.cuckoo")
        env = dict(os.environ, PYTHONPATH=repo)

        def cli(*a):
            return subprocess.run(
                [sys.executable, "-m", "archbloom_ray.cli", *a],
                capture_output=True, text=True, env=env, cwd=repo)

        r = cli("import-ref", src, sk, "--kind", "cuckoo")
        assert r.returncode == 0, r.stderr[-500:]
        assert _json.loads(r.stdout.strip().splitlines()[-1])["saved"] == sk
        q = cli("query", sk, "alpha")
        assert q.returncode == 0
        q = cli("query", sk, "zulu")
        assert q.returncode == 1
        r = cli("export-ref", sk, out, "--kind", "cuckoo")
        assert r.returncode == 0, r.stderr[-500:]
        with open(src, "rb") as f1, open(out, "rb") as f2:
            assert f1.read() == f2.read()
