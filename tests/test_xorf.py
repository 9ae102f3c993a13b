"""XOR filter (Graf & Lemire 2020): peeling construction, FPR, the
no-false-negative guarantee, serde, static semantics, sharded build."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from archbloom_ray.sketches import SketchError, XorFilter
from archbloom_ray.sketches.base import sketch_from_bytes


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, n, dtype=np.int64).astype(np.uint64)


class TestXorFilter:
    @pytest.mark.parametrize("n", [1, 2, 3, 17, 1000, 100_000])
    def test_no_false_negatives(self, n):
        keys = _hashes(n)
        f = XorFilter.build_hashes(keys, bits=8)
        assert f.contains_hashes(keys).all()

    @pytest.mark.parametrize("bits,bound", [(8, 2**-8), (16, 2**-16)])
    def test_fpr_near_published(self, bits, bound):
        keys = _hashes(50_000, seed=1)
        f = XorFilter.build_hashes(keys, bits=bits)
        probes = _hashes(200_000, seed=2)
        probes = probes[~np.isin(probes, keys)]
        fpr = f.contains_hashes(probes).mean()
        assert fpr <= 3 * bound + 1e-6, fpr  # generous sampling slack
        assert f.false_positive_rate() == bound

    def test_space_near_1_23_bits(self):
        f = XorFilter.build_hashes(_hashes(100_000), bits=8)
        assert f.bits_per_key <= 8 * 1.25  # 1.23 target + seg rounding

    def test_duplicates_deduped(self):
        keys = np.array([7, 7, 7, 9], dtype=np.uint64)
        f = XorFilter.build_hashes(keys)
        assert f.n == 2
        assert f.contains_hashes(keys).all()

    def test_string_build_and_lookup(self):
        vals = pa.array([f"url-{i}" for i in range(5000)])
        f = XorFilter.build_arrow(vals, bits=8)
        assert f.lookup_batch(vals).all()
        assert f.lookup("url-42")
        absent = pa.array([f"missing-{i}" for i in range(5000)])
        assert f.lookup_batch(absent).mean() < 0.02

    def test_empty(self):
        f = XorFilter.build_hashes(np.empty(0, dtype=np.uint64))
        assert not f.contains_hashes(_hashes(100)).any()

    def test_static_semantics(self):
        f = XorFilter.build_hashes(_hashes(10))
        with pytest.raises(SketchError):
            f.update_arrow(pa.array(["x"]))
        with pytest.raises(SketchError):
            f.merge(XorFilter.build_hashes(_hashes(10)))
        with pytest.raises(SketchError):
            XorFilter(bits=12)

    def test_serde_roundtrip(self):
        keys = _hashes(20_000, seed=3)
        f = XorFilter.build_hashes(keys, bits=16, name="snap")
        r = sketch_from_bytes(f.to_bytes())
        assert isinstance(r, XorFilter)
        assert r.n == f.n and r.seed == f.seed and r.seg == f.seg
        probes = _hashes(50_000, seed=4)
        np.testing.assert_array_equal(
            r.contains_hashes(probes), f.contains_hashes(probes))
        assert r.contains_hashes(keys).all()


class TestShardedXor:
    def test_build_and_probe_sf(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines.staticfilter import (
            build_sharded_xor, sharded_xor_probe)

        ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id", "text"])
        states = build_sharded_xor(ds, "text", num_shards=4, bits=8)
        assert set(states) <= set(range(4)) and len(states) >= 1
        probed = sharded_xor_probe(ds, states, "text", num_shards=4)
        rows = probed.take_all()
        assert len(rows) == 500
        assert all(r["present"] for r in rows)
        # absent probes: FPR well under 2%
        absent = rd.from_items(
            [{"text": f"never-in-corpus-{i}"} for i in range(2000)])
        miss = sharded_xor_probe(absent, states, "text", num_shards=4)
        fp = sum(r["present"] for r in miss.take_all())
        assert fp <= 40


class TestXorMap:
    """Static retrieval map (Dietzfelbinger-Pagh): exact values for
    built keys, conflict/range validation, serde, sharded build."""

    def test_exact_retrieval(self):
        from archbloom_ray.sketches import XorMap

        keys = pa.array([f"url-{i}" for i in range(20_000)])
        vals = np.arange(20_000) % 37
        m = XorMap.build_arrow_values(keys, vals, bits=8)
        assert (m.get_batch(keys) == vals).all()
        assert m.bits_per_key < 12          # ~1.23 * 8 + slack
        assert m.get("url-123") == 123 % 37

    @pytest.mark.parametrize("bits", [16, 32, 64])
    def test_wide_values(self, bits):
        from archbloom_ray.sketches import XorMap

        keys = pa.array([f"k{i}" for i in range(5000)])
        vals = (np.arange(5000, dtype=np.int64) * 2654435761) \
            % ((1 << min(bits, 62)) - 1)
        m = XorMap.build_arrow_values(keys, vals, bits=bits)
        assert (m.get_batch(keys).astype(np.int64) == vals).all()

    def test_duplicate_handling(self):
        from archbloom_ray.sketches import XorMap

        m = XorMap.build_arrow_values(
            pa.array(["a", "b", "a"]), np.array([3, 5, 3]), bits=8)
        assert m.get("a") == 3 and m.get("b") == 5
        with pytest.raises(SketchError, match="conflicting"):
            XorMap.build_arrow_values(
                pa.array(["a", "b", "a"]), np.array([3, 5, 4]), bits=8)

    def test_value_validation(self):
        from archbloom_ray.sketches import XorMap

        with pytest.raises(SketchError, match="fit"):
            XorMap.build_arrow_values(pa.array(["a"]), np.array([256]),
                                      bits=8)
        with pytest.raises(SketchError, match="non-negative"):
            XorMap.build_arrow_values(pa.array(["a"]), np.array([-1]),
                                      bits=8)
        with pytest.raises(SketchError, match="keys vs"):
            XorMap.build_arrow_values(pa.array(["a", "b"]), np.array([1]),
                                      bits=8)

    def test_membership_disallowed(self):
        from archbloom_ray.sketches import XorMap

        m = XorMap.build_arrow_values(pa.array(["a"]), np.array([1]), bits=8)
        with pytest.raises(SketchError, match="membership"):
            m.lookup_batch(pa.array(["a"]))

    def test_serde(self):
        from archbloom_ray.sketches import XorMap

        keys = pa.array([f"k{i}" for i in range(3000)])
        vals = np.arange(3000) % 200
        m = XorMap.build_arrow_values(keys, vals, bits=8)
        r = sketch_from_bytes(m.to_bytes())
        assert isinstance(r, XorMap)
        assert (r.get_batch(keys) == vals).all()

    def test_empty(self):
        from archbloom_ray.sketches import XorMap

        m = XorMap.build_arrow_values(pa.array([], type=pa.string()),
                                      np.array([], dtype=np.int64), bits=8)
        assert (m.get_batch(pa.array(["x"])) == 0).all()
        r = sketch_from_bytes(m.to_bytes())
        assert r.n == 0


class TestShardedXorMap:
    def test_build_get_sf(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines import (build_sharded_xormap,
                                             sharded_xormap_get)

        ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id", "n_chars"])

        def keyed(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "key": pc.cast(batch["doc_id"], pa.string()),
                "val": pc.bit_wise_and(batch["n_chars"], 255),
            })

        kds = ds.map_batches(keyed, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
        states = build_sharded_xormap(kds, "key", "val", num_shards=4,
                                      bits=8)
        got = sharded_xormap_get(kds, states, "key", num_shards=4,
                                 out_column="got")
        rows = got.take_all()
        assert len(rows) == 500
        assert all(r["got"] == r["val"] for r in rows)

    def test_truncated_states_raise_for_map_not_filter(self, ray_session):
        """Retrieval must REFUSE a probe routing to a missing shard
        (0 is in the value domain — a truncated states dict would
        silently return plausible wrong values); the filter probe
        keeps the sound absent⇒not-present default."""
        import ray.data as rd

        from archbloom_ray.pipelines import (build_sharded_xor,
                                             build_sharded_xormap,
                                             sharded_xor_probe,
                                             sharded_xormap_get)

        ds = rd.from_arrow(pa.table({
            "key": pa.array([f"k{i}" for i in range(200)]),
            "val": pa.array(list(range(200)), type=pa.int64()),
        })).materialize()
        mstates = build_sharded_xormap(ds, "key", "val", num_shards=4,
                                       bits=16)
        assert set(mstates) == {0, 1, 2, 3}
        truncated = {s: b for s, b in mstates.items() if s != 0}
        with pytest.raises(Exception, match="missing from the states"):
            sharded_xormap_get(ds, truncated, "key", num_shards=4,
                               out_column="got").take_all()
        # full map still exact
        rows = sharded_xormap_get(ds, mstates, "key", num_shards=4,
                                  out_column="got").take_all()
        assert all(r["got"] == r["val"] for r in rows)
        # filter path: absent shard ⇒ not-present, no raise
        fstates = build_sharded_xor(ds, "key", num_shards=4, bits=8)
        ftrunc = {s: b for s, b in fstates.items() if s != 0}
        probed = sharded_xor_probe(ds, ftrunc, "key",
                                   num_shards=4).take_all()
        assert len(probed) == 200          # ran through, zero-default

    def test_conflicting_duplicates_raise_in_reducer(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines import build_sharded_xormap
        from archbloom_ray.sketches import SketchError

        ds = rd.from_arrow(pa.table({
            "key": pa.array(["dup", "dup", "x"]),
            "val": pa.array([1, 2, 3], type=pa.int64()),
        }))
        with pytest.raises(Exception, match="conflicting"):
            build_sharded_xormap(ds, "key", "val", num_shards=2, bits=8)


class TestXorMapReviewEdges:
    def test_full_64bit_value_range(self):
        # uint64 values >= 2^63 are legitimate for bits=64 (the review
        # caught an int64 view rejecting them as negative)
        from archbloom_ray.sketches import XorMap

        m = XorMap.build_hashes_values(
            np.array([11, 22], dtype=np.uint64),
            np.array([2**63 + 5, 7], dtype=np.uint64), bits=64)
        got = m.get_hashes(np.array([11, 22], dtype=np.uint64))
        assert got[0] == np.uint64(2**63 + 5) and got[1] == 7

    def test_signed_negative_still_rejected(self):
        from archbloom_ray.sketches import XorMap

        with pytest.raises(SketchError, match="non-negative"):
            XorMap.build_hashes_values(np.array([1], dtype=np.uint64),
                                       np.array([-1]), bits=64)

    def test_qf_probe_method_validated(self):
        from archbloom_ray.pipelines.build import sharded_qf_probe
        from archbloom_ray.sketches import QuotientFilter

        with pytest.raises(ValueError, match="unknown probe method"):
            sharded_qf_probe(None, {}, "k", lambda: QuotientFilter(16),
                             method="count")


class TestBinaryFuse:
    """Binary fuse filter (JEA'22): no false negatives, FPR ~ 2^-bits,
    smaller than xor at scale, serde, static semantics, sharded kind."""

    def test_no_false_negatives_and_fpr(self):
        from archbloom_ray.sketches import BinaryFuseFilter

        h = np.random.default_rng(1).integers(
            0, 2**63, 50_000).astype(np.uint64)
        f = BinaryFuseFilter.build_hashes(h, bits=8)
        assert f.contains_hashes(h).all()
        absent = np.random.default_rng(2).integers(
            0, 2**63, 100_000).astype(np.uint64)
        fpr = f.contains_hashes(absent).mean()
        # contract 2^-8; 3 sd binomial slack on 100k probes
        assert fpr <= 2**-8 + 3 * np.sqrt(2**-8 / 100_000), fpr

    def test_smaller_than_xor_at_scale(self):
        from archbloom_ray.sketches import BinaryFuseFilter, XorFilter

        h = np.random.default_rng(3).integers(
            0, 2**63, 200_000).astype(np.uint64)
        bf = BinaryFuseFilter.build_hashes(h, bits=8)
        xf = XorFilter.build_hashes(h, bits=8)
        assert bf.bits_per_key < xf.bits_per_key
        assert bf.bits_per_key < 9.6         # paper: -> 9.0 asymptotic

    def test_serde_and_static(self):
        from archbloom_ray.sketches import BinaryFuseFilter

        keys = pa.array([f"k{i}" for i in range(5000)])
        f = BinaryFuseFilter.build_arrow(keys, bits=16)
        r = sketch_from_bytes(f.to_bytes())
        assert isinstance(r, BinaryFuseFilter)
        assert r.lookup_batch(keys).all()
        with pytest.raises(SketchError, match="static"):
            f.update_arrow(keys)
        with pytest.raises(SketchError, match="static"):
            f.merge(f)

    def test_empty(self):
        from archbloom_ray.sketches import BinaryFuseFilter

        f = BinaryFuseFilter.build_hashes(np.empty(0, dtype=np.uint64))
        assert not f.contains_hashes(
            np.array([123], dtype=np.uint64)).any()
        assert sketch_from_bytes(f.to_bytes()).n == 0

    def test_sharded_kind(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines import (build_sharded_xor,
                                             sharded_xor_probe)

        ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                             columns=["text"])
        states = build_sharded_xor(ds, "text", num_shards=4, bits=8,
                                   kind="bfuse")
        probed = sharded_xor_probe(ds, states, "text", num_shards=4)
        assert all(r["present"] for r in probed.take_all())
        with pytest.raises(ValueError, match="kind"):
            build_sharded_xor(ds, "text", kind="nope")


def test_xormap_rejects_float_values():
    from archbloom_ray.sketches import XorMap

    with pytest.raises(SketchError, match="integer array"):
        XorMap.build_hashes_values(np.array([1], dtype=np.uint64),
                                   np.array([1.9]), bits=8)
    with pytest.raises(SketchError, match="integer array"):
        XorMap.build_hashes_values(np.array([1], dtype=np.uint64),
                                   np.array([-2.0]), bits=64)


class TestXorMapProperties:
    @settings(max_examples=25, deadline=None)
    @given(st.dictionaries(st.text(min_size=1, max_size=10),
                           st.integers(min_value=0, max_value=255),
                           max_size=200))
    def test_retrieval_exact_for_any_mapping(self, mapping):
        from archbloom_ray.sketches import XorMap

        keys = sorted(mapping)
        if not keys:
            return
        m = XorMap.build_arrow_values(
            pa.array(keys, type=pa.string()),
            np.array([mapping[k] for k in keys], dtype=np.int64), bits=8)
        got = m.get_batch(pa.array(keys, type=pa.string()))
        assert list(got) == [mapping[k] for k in keys]
        g = sketch_from_bytes(m.to_bytes())
        assert list(g.get_batch(pa.array(keys, type=pa.string()))) \
            == [mapping[k] for k in keys]
