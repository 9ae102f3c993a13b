"""RoaringBitmap — exact compressed-bitmap set (sketches/roaring.py)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from archbloom_ray.sketches import RoaringBitmap, SketchError, sketch_from_bytes


def _set_of(r: RoaringBitmap) -> set:
    out = set()
    for key, c in r.containers.items():
        if c.dtype == np.uint64:
            bits = np.unpackbits(c.view(np.uint8), bitorder="little")
            out |= set(((key << 16) | np.flatnonzero(bits)).tolist())
        else:
            out |= set(((key << 16) | c.astype(np.int64)).tolist())
    return out


def test_exact_set_and_membership():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 300_000, 20_000).astype(np.uint32)
    r = RoaringBitmap()
    r.update_arrow(pa.array(vals.astype(np.int64)))
    truth = set(vals.tolist())
    assert r.cardinality() == len(truth)
    assert _set_of(r) == truth
    probe = np.arange(0, 300_000, 97, dtype=np.uint32)
    got = r.contains_batch(probe)
    want = np.array([int(x) in truth for x in probe.tolist()])
    assert np.array_equal(got, want)


def test_array_to_bitmap_promotion_boundary():
    # exactly ARRAY_MAX stays an array; one more promotes to a bitmap
    from archbloom_ray.sketches.roaring import ARRAY_MAX

    r = RoaringBitmap()
    r.add_u32(np.arange(ARRAY_MAX, dtype=np.uint32))
    assert r.containers[0].dtype == np.uint16
    r.add_u32(np.array([ARRAY_MAX], dtype=np.uint32))
    assert r.containers[0].dtype == np.uint64
    assert r.cardinality() == ARRAY_MAX + 1
    # membership survives promotion
    assert r.contains_batch(np.array([0, ARRAY_MAX, ARRAY_MAX + 1],
                                     dtype=np.uint32)).tolist() == \
        [True, True, False]


def test_rejects_out_of_range_and_non_integer():
    r = RoaringBitmap()
    with pytest.raises(SketchError):
        r.update_arrow(pa.array([-1], type=pa.int64()))
    with pytest.raises(SketchError):
        r.update_arrow(pa.array([1 << 33], type=pa.int64()))
    with pytest.raises(SketchError):
        r.update_arrow(pa.array(["x"], type=pa.string()))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 1 << 20), max_size=300),
       st.lists(st.integers(0, 1 << 20), max_size=300),
       st.lists(st.integers(0, 1 << 20), max_size=300))
def test_merge_matches_set_union_any_order(a, b, c):
    shards = [np.asarray(x, dtype=np.uint32) for x in (a, b, c)]
    rs = []
    for sh in shards:
        r = RoaringBitmap()
        if sh.size:
            r.add_u32(sh)
        rs.append(r)
    truth = set(a) | set(b) | set(c)
    m1 = rs[0].copy().merge(rs[1]).merge(rs[2])
    m2 = rs[2].copy().merge(rs[0]).merge(rs[1])
    assert m1.cardinality() == m2.cardinality() == len(truth)
    assert _set_of(m1) == _set_of(m2) == truth


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 1 << 24), max_size=400))
def test_serde_roundtrip_property(vals):
    r = RoaringBitmap(name="rt")
    if vals:
        r.add_u32(np.asarray(vals, dtype=np.uint32))
    rt = sketch_from_bytes(r.to_bytes())
    assert isinstance(rt, RoaringBitmap)
    assert rt.name == "rt"
    assert _set_of(rt) == set(vals)


def test_mixed_container_merges():
    # dense shard (bitmap) ∪ sparse shard (array), both directions
    dense = RoaringBitmap()
    dense.add_u32(np.arange(0, 60_000, 2, dtype=np.uint32))    # bitmaps
    sparse = RoaringBitmap()
    sparse.add_u32(np.arange(1, 999, 2, dtype=np.uint32))      # arrays
    truth = set(range(0, 60_000, 2)) | set(range(1, 999, 2))
    a = dense.copy().merge(sparse)
    b = sparse.copy().merge(dense)
    assert a.cardinality() == b.cardinality() == len(truth)
    assert _set_of(a) == _set_of(b) == truth


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 1 << 18), max_size=400),
       st.lists(st.integers(0, 1 << 18), max_size=400))
def test_intersect_cardinality_matches_sets(a, b):
    ra, rb = RoaringBitmap(), RoaringBitmap()
    if a:
        ra.add_u32(np.asarray(a, dtype=np.uint32))
    if b:
        rb.add_u32(np.asarray(b, dtype=np.uint32))
    want = len(set(a) & set(b))
    assert ra.intersect_cardinality(rb) == want
    assert rb.intersect_cardinality(ra) == want


def test_intersect_mixed_containers():
    dense = RoaringBitmap()
    dense.add_u32(np.arange(0, 60_000, 3, dtype=np.uint32))  # bitmaps
    sparse = RoaringBitmap()
    sparse.add_u32(np.arange(0, 1200, 2, dtype=np.uint32))   # arrays
    want = len(set(range(0, 60_000, 3)) & set(range(0, 1200, 2)))
    assert dense.intersect_cardinality(sparse) == want
    assert sparse.intersect_cardinality(dense) == want
