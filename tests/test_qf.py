"""Quotient filter (RSQF layout, Bender et al. VLDB'12; Pandey et al.
SIGMOD'17): no false negatives, measured FPR under n·2^-p, exact
deletes, merge == single-pass build, difference ≡ per-key removal,
canonical bit-layout round-trip, serde, capacity enforcement."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from archbloom_ray.sketches import (CountingQuotientFilter, QuotientFilter,
                                    SketchError)
from archbloom_ray.sketches.base import sketch_from_bytes


def _keys(n, prefix="k"):
    return pa.array([f"{prefix}-{i}" for i in range(n)])


class TestQuotientFilter:
    def test_sizing(self):
        f = QuotientFilter(6000, 0.001)
        assert f.num_slots >= 6000 / 0.95
        assert f.r == 10                      # ceil(log2(1000))
        assert f.p == f.q + f.r <= 64

    def test_no_false_negatives(self):
        keys = _keys(20_000)
        f = QuotientFilter(25_000, 0.01)
        f.update_arrow(keys)
        assert f.lookup_batch(keys).all()
        assert f.load_factor() <= 0.95 + 1e-9

    def test_measured_fpr_under_bound(self):
        f = QuotientFilter(25_000, 0.001)
        f.update_arrow(_keys(20_000))
        fpr = f.lookup_batch(_keys(100_000, "absent")).mean()
        # bound is the EXPECTED rate (n·2^-p); allow 3 sd of the
        # binomial fluctuation on 100k probes — never tighter than
        # the sketch's own contract
        b = f.false_positive_bound()
        assert fpr <= b + 3 * np.sqrt(b / 100_000), (fpr, b)

    def test_merge_equals_single_pass(self):
        keys = [f"k-{i}" for i in range(9000)]
        whole = QuotientFilter(10_000, 0.01)
        whole.update_arrow(pa.array(keys))
        parts = [QuotientFilter(10_000, 0.01) for _ in range(3)]
        for j, p in enumerate(parts):
            p.update_arrow(pa.array(keys[j * 3000:(j + 1) * 3000]))
        merged = parts[0].merge(parts[1]).merge(parts[2])
        assert np.array_equal(merged.fps, whole.fps)

    def test_merge_order_insensitive(self):
        a, b = QuotientFilter(1000, 0.01), QuotientFilter(1000, 0.01)
        a.update_arrow(_keys(400, "a"))
        b.update_arrow(_keys(400, "b"))
        ab = a.copy().merge(b)
        ba = b.copy().merge(a)
        assert np.array_equal(ab.fps, ba.fps)

    def test_delete_exact_and_membership_after(self):
        keys = [f"k-{i}" for i in range(5000)]
        f = QuotientFilter(6000, fpr=2.0 ** -40)   # p large: no collisions
        f.update_arrow(pa.array(keys))
        removed = f.remove_batch(pa.array(keys[::3]))
        assert removed.all()
        assert not f.lookup_batch(pa.array(keys[::3])).any()
        kept = pa.array([k for i, k in enumerate(keys) if i % 3])
        assert f.lookup_batch(kept).all()
        # removing an absent key reports False and is a no-op
        before = f.fps.copy()
        assert not f.remove_batch(pa.array(["nope"]))[0]
        assert np.array_equal(f.fps, before)

    def test_difference_equals_per_key_removal(self):
        keys = [f"k-{i}" for i in range(3000)]
        dels = keys[::7]
        a = QuotientFilter(4000, fpr=2.0 ** -40)
        a.update_arrow(pa.array(keys))
        b = a.copy()
        # path 1: per-key removal
        a.remove_batch(pa.array(dels))
        # path 2: set-algebra difference of a built delete filter
        dsk = QuotientFilter(4000, fpr=2.0 ** -40)
        dsk.update_arrow(pa.array(dels))
        b.difference(dsk)
        assert np.array_equal(a.fps, b.fps)

    def test_layout_round_trip_and_serde(self):
        f = QuotientFilter(2000, 0.01)
        f.update_arrow(_keys(1800))
        occ, rend, rem = f.to_layout()
        assert occ.sum() == rend.sum()         # RSQF pairing invariant
        dec = QuotientFilter.from_layout(f.q, f.r, occ, rend, rem)
        assert np.array_equal(dec.fps, f.fps)
        g = sketch_from_bytes(f.to_bytes())
        assert isinstance(g, QuotientFilter)
        assert np.array_equal(g.fps, f.fps)
        assert g.lookup_batch(_keys(1800)).all()

    def test_wire_format_picks_smaller_encoding(self):
        # dense small-r filter: packed layout beats 8 B/key
        dense = QuotientFilter(2000, 0.01)      # r = 7 -> uint8 rems
        dense.update_arrow(_keys(1800))
        assert dense._wire_format() == "layout"
        # sparse partial at the same parameters: raw fps win
        sparse = QuotientFilter(2000, 0.01)
        sparse.update_arrow(_keys(40))
        assert sparse._wire_format() == "fps"
        assert len(sparse.to_bytes()) < len(dense.to_bytes())
        # both formats round-trip
        for f in (dense, sparse):
            g = sketch_from_bytes(f.to_bytes())
            assert np.array_equal(g.fps, f.fps)

    def test_partial_serialization_is_sparse_sized(self):
        # a 64k-row build partial against a 8M-key capacity must ship
        # O(n) bytes, not O(2^q) — the distributed-build traffic rule
        f = QuotientFilter(8_000_000, 0.01)
        f.update_arrow(_keys(1000))
        assert len(f.to_bytes()) < 20_000      # ~8 KB payload + header

    def test_layout_dense_high_load(self):
        # 95% load forces long shifted clusters — the closed-form
        # s_j = P_j + cummax(q_j − P_j) must still round-trip
        f = QuotientFilter(970, 0.01)
        assert f.num_slots == 1024
        f.update_arrow(_keys(970))
        occ, rend, rem = f.to_layout()
        dec = QuotientFilter.from_layout(f.q, f.r, occ, rend, rem)
        assert np.array_equal(dec.fps, f.fps)

    def test_empty_serde_and_lookup(self):
        f = QuotientFilter(100, 0.01)
        assert not f.lookup_batch(_keys(10)).any()
        g = sketch_from_bytes(f.to_bytes())
        assert g.fps.size == 0
        assert g.finalize()["n"] == 0

    def test_overflow_raises(self):
        f = QuotientFilter(4, 0.01)
        with pytest.raises(SketchError, match="overflow"):
            f.update_arrow(_keys(200))

    def test_incompatible_merge_raises(self):
        a = QuotientFilter(1000, 0.01)
        b = QuotientFilter(1000, 0.0001)
        with pytest.raises(SketchError, match="incompatible"):
            a.merge(b)

    def test_multiplicity_blind(self):
        a = QuotientFilter(100, 0.01)
        a.update_arrow(pa.array(["x", "x", "y", "x"]))
        b = QuotientFilter(100, 0.01)
        b.update_arrow(pa.array(["y", "x"]))
        assert np.array_equal(a.fps, b.fps)
        b.update_weighted(pa.array(["x"]), np.array([17]))
        assert np.array_equal(a.fps, b.fps)

    def test_qf_cqf_cross_merge_raises(self):
        a = QuotientFilter(1000, 0.01)
        b = CountingQuotientFilter(1000, 0.01)
        with pytest.raises(SketchError):
            a.merge(b)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=12), max_size=300),
           st.lists(st.text(min_size=0, max_size=12), max_size=100))
    def test_property_membership_and_delete(self, keys, dels):
        f = QuotientFilter(1024, fpr=2.0 ** -40)
        if keys:
            f.update_arrow(pa.array(keys, type=pa.string()))
            assert f.lookup_batch(pa.array(keys, type=pa.string())).all()
        if dels:
            f.remove_batch(pa.array(dels, type=pa.string()))
            gone = [d for d in dels]
            assert not f.lookup_batch(pa.array(gone, type=pa.string())).any()
        # survivors (p=50+: string equality ⇔ fingerprint equality here)
        kept = [k for k in keys if k not in set(dels)]
        if kept:
            assert f.lookup_batch(pa.array(kept, type=pa.string())).all()


def _multiset(n=2000, seed=3):
    keys = np.repeat([f"k-{i}" for i in range(n)], np.arange(n) % 7 + 1)
    rng = np.random.default_rng(seed)
    rng.shuffle(keys)
    return keys


class TestCountingQuotientFilter:
    def test_counts_exact_at_high_p(self):
        keys = _multiset()
        f = CountingQuotientFilter(3000, fpr=2.0 ** -40)
        for lo in range(0, len(keys), 1337):   # ragged batches
            f.update_arrow(pa.array(list(keys[lo:lo + 1337])))
        got = f.count_batch(pa.array([f"k-{i}" for i in range(2000)]))
        want = np.arange(2000) % 7 + 1
        assert np.array_equal(got, want)
        assert f.total() == len(keys)
        assert f.count("absent") == 0

    def test_merge_equals_single_pass(self):
        keys = _multiset()
        whole = CountingQuotientFilter(3000, fpr=2.0 ** -40)
        whole.update_arrow(pa.array(list(keys)))
        a = CountingQuotientFilter(3000, fpr=2.0 ** -40)
        b = CountingQuotientFilter(3000, fpr=2.0 ** -40)
        a.update_arrow(pa.array(list(keys[:4000])))
        b.update_arrow(pa.array(list(keys[4000:])))
        a.merge(b)
        assert np.array_equal(a.fps, whole.fps)
        assert np.array_equal(a.counts, whole.counts)

    def test_weighted_equals_raw(self):
        keys = _multiset()
        raw = CountingQuotientFilter(3000, fpr=2.0 ** -40)
        raw.update_arrow(pa.array(list(keys)))
        ks, cs = np.unique(keys, return_counts=True)
        w = CountingQuotientFilter(3000, fpr=2.0 ** -40)
        w.update_weighted(pa.array(list(ks)), cs)
        assert np.array_equal(w.fps, raw.fps)
        assert np.array_equal(w.counts, raw.counts)

    def test_weighted_validates(self):
        f = CountingQuotientFilter(100, 0.01)
        with pytest.raises(SketchError, match="counts"):
            f.update_weighted(pa.array(["a", "b"]), np.array([1]))
        with pytest.raises(SketchError, match="> 0"):
            f.update_weighted(pa.array(["a"]), np.array([0]))

    def test_guarded_decrement(self):
        f = CountingQuotientFilter(100, fpr=2.0 ** -40)
        f.update_arrow(pa.array(["x"] * 5 + ["y"]))
        f.remove_batch(pa.array(["x", "x"]))
        assert f.count("x") == 3
        # over-decrement clamps at 0 and evicts the fingerprint
        f.remove_batch(pa.array(["x"] * 10))
        assert f.count("x") == 0 and not f.lookup("x")
        assert f.count("y") == 1
        # absent key: no-op, reports False
        before = (f.fps.copy(), f.counts.copy())
        assert not f.remove_batch(pa.array(["z"]))[0]
        assert np.array_equal(f.fps, before[0])
        assert np.array_equal(f.counts, before[1])

    def test_serde_round_trip_with_counts(self):
        keys = _multiset(500)
        f = CountingQuotientFilter(700, fpr=2.0 ** -40)
        f.update_arrow(pa.array(list(keys)))
        g = sketch_from_bytes(f.to_bytes())
        assert isinstance(g, CountingQuotientFilter)
        assert np.array_equal(g.fps, f.fps)
        assert np.array_equal(g.counts, f.counts)
        assert g.total() == f.total()

    def test_serde_layout_format_with_counts(self):
        # small r forces the packed-layout wire format; counts must
        # realign with the decoded fingerprint order
        f = CountingQuotientFilter(2000, 0.01)
        f.update_arrow(pa.array(list(_multiset(1500))))
        assert f._wire_format() == "layout"
        g = sketch_from_bytes(f.to_bytes())
        assert np.array_equal(g.fps, f.fps)
        assert np.array_equal(g.counts, f.counts)

    def test_from_layout_requires_counts(self):
        f = CountingQuotientFilter(100, 0.01)
        f.update_arrow(pa.array(["a", "a", "b"]))
        occ, rend, rem = f.to_layout()
        with pytest.raises(SketchError, match="counts"):
            CountingQuotientFilter.from_layout(f.q, f.r, occ, rend, rem)
        g = CountingQuotientFilter.from_layout(f.q, f.r, occ, rend, rem,
                                               counts=f.counts)
        assert np.array_equal(g.fps, f.fps)
        assert np.array_equal(g.counts, f.counts)
        assert g.count("a") == 2 and g.total() == 3
        with pytest.raises(SketchError, match="misaligned"):
            CountingQuotientFilter.from_layout(f.q, f.r, occ, rend, rem,
                                               counts=np.array([1]))

    def test_update_hashes_matches_update_arrow(self):
        from archbloom_ray.hashing import mmh3_128_batch
        keys = pa.array([f"k-{i}" for i in range(500)] * 2)
        a = CountingQuotientFilter(1000, fpr=2.0 ** -40)
        a.update_arrow(keys)
        b = CountingQuotientFilter(1000, fpr=2.0 ** -40)
        b.update_hashes(*mmh3_128_batch(keys))
        assert np.array_equal(a.fps, b.fps)
        assert np.array_equal(a.counts, b.counts)
        qa = QuotientFilter(1000, fpr=2.0 ** -40)
        qa.update_arrow(keys)
        qb = QuotientFilter(1000, fpr=2.0 ** -40)
        qb.update_hashes(*mmh3_128_batch(keys))
        assert np.array_equal(qa.fps, qb.fps)

    def test_empty_serde(self):
        f = CountingQuotientFilter(64, 0.01)
        g = sketch_from_bytes(f.to_bytes())
        assert g.fps.size == 0 and g.counts.size == 0
        assert g.finalize()["total"] == 0

    def test_overflow_raises(self):
        f = CountingQuotientFilter(4, 0.01)
        with pytest.raises(SketchError, match="overflow"):
            f.update_arrow(_keys(200))

    def test_difference_disallowed(self):
        a = CountingQuotientFilter(100, 0.01)
        b = CountingQuotientFilter(100, 0.01)
        with pytest.raises(SketchError, match="remove_batch"):
            a.difference(b)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=8), max_size=400))
    def test_property_counts_match_counter(self, keys):
        import collections
        f = CountingQuotientFilter(512, fpr=2.0 ** -40)
        if keys:
            f.update_arrow(pa.array(keys, type=pa.string()))
        exact = collections.Counter(keys)
        uniq = sorted(exact)
        if uniq:
            got = f.count_batch(pa.array(uniq, type=pa.string()))
            assert list(got) == [exact[k] for k in uniq]
        assert f.total() == len(keys)


class TestForeignLayoutDecode:
    """Review finding: a foreign RSQF layout may order a run's
    remainders arbitrarily (or hold duplicate fingerprints) — decode
    must restore the sorted-unique invariant searchsorted needs."""

    def test_shuffled_run_decodes_sorted(self):
        f = QuotientFilter(64, 0.01)
        f.update_arrow(_keys(50))
        occ, rend, rem = f.to_layout()
        ends = np.flatnonzero(rend)
        occq = np.flatnonzero(occ)
        starts = np.maximum(occq, np.concatenate(([0], ends[:-1] + 1)))
        swapped = False
        for s, e in zip(starts, ends):
            if e > s:
                rem[s], rem[e] = rem[e].copy(), rem[s].copy()
                swapped = True
                break
        assert swapped, "fixture produced no multi-key run"
        g = QuotientFilter.from_layout(f.q, f.r, occ, rend, rem)
        assert (np.diff(g.fps.astype(np.int64)) > 0).all()
        assert g._member(g.fps).all()      # no resident lost

    def test_cqf_counts_follow_decode_permutation(self):
        c = CountingQuotientFilter(64, 0.01)
        c.update_arrow(pa.array(["a", "a", "b", "c"]))
        occ, rend, rem = c.to_layout()
        g = CountingQuotientFilter.from_layout(c.q, c.r, occ, rend, rem,
                                               counts=c.counts)
        assert np.array_equal(g.fps, c.fps)
        assert np.array_equal(g.counts, c.counts)


class TestQFAlgebraProperties:
    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.text(max_size=8), max_size=150),
           st.lists(st.text(max_size=8), max_size=150),
           st.lists(st.text(max_size=8), max_size=150))
    def test_merge_associative_and_commutative(self, xs, ys, zs):
        def built(keys):
            f = QuotientFilter(512, 0.01)
            if keys:
                f.update_arrow(pa.array(keys, type=pa.string()))
            return f

        a, b, c = built(xs), built(ys), built(zs)
        left = a.copy().merge(b.copy()).merge(c.copy())
        right = a.copy().merge(b.copy().merge(c.copy()))
        swapped = c.copy().merge(a.copy()).merge(b.copy())
        assert np.array_equal(left.fps, right.fps)
        assert np.array_equal(left.fps, swapped.fps)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.text(max_size=8), max_size=200),
           st.integers(min_value=1, max_value=5))
    def test_cqf_merge_tree_equals_single_pass(self, keys, parts):
        whole = CountingQuotientFilter(512, fpr=2.0 ** -40)
        if keys:
            whole.update_arrow(pa.array(keys, type=pa.string()))
        acc = CountingQuotientFilter(512, fpr=2.0 ** -40)
        for i in range(parts):
            chunk = keys[i::parts]
            p = CountingQuotientFilter(512, fpr=2.0 ** -40)
            if chunk:
                p.update_arrow(pa.array(chunk, type=pa.string()))
            acc.merge(p)
        assert np.array_equal(acc.fps, whole.fps)
        assert np.array_equal(acc.counts, whole.counts)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.text(max_size=8), min_size=0, max_size=300))
    def test_serde_identity_both_formats(self, keys):
        f = QuotientFilter(512, 0.01)
        if keys:
            f.update_arrow(pa.array(keys, type=pa.string()))
        g = sketch_from_bytes(f.to_bytes())
        assert np.array_equal(g.fps, f.fps)
