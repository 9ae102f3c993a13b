"""Roaring-style compressed bitmap — EXACT mergeable distinct/membership
set over uint32 keys.

The exact companion to the approximate distinct sketches (HLL/KMV/theta):
where those trade error for O(1) state, a roaring bitmap stores the set
itself but compresses it by 16-bit chunks (Chambi, Lemire et al., "Better
bitmap performance with Roaring bitmaps", 2016 — public algorithm):

    key = value >> 16 selects a CONTAINER; the low 16 bits live either as
    a sorted uint16 ARRAY (≤ 4096 members: ≤ 8 KB) or as a 65536-bit
    BITMAP (8 KB fixed) once denser — so state is Θ(distinct) with a hard
    8 KB/64Ki-range ceiling, and unions are per-container ``union1d`` /
    word-OR.

This is the exact mergeable-UDAF shape OLAP engines use for
count-distinct materialization: per-batch partial bitmaps → shuffle by
sketch key → container-wise OR-merge (associative + commutative, like
``bloom_merge`` reference bloom.c:770-795 but lossless).  All hot paths
are vectorized numpy; no per-value Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Sketch, SketchError, register

#: array→bitmap promotion threshold (the published constant: 4096 uint16
#: values = 8 KB, the size of a full bitmap container)
ARRAY_MAX = 4096

_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                      axis=1).sum(axis=1).astype(np.uint8)


def _popcount64(words: np.ndarray) -> int:
    """Total set bits of a uint64 array (numpy<2 has no bitwise_count)."""
    return int(_POP8[words.view(np.uint8)].sum())


def _to_bitmap(lows: np.ndarray) -> np.ndarray:
    bmp = np.zeros(1024, dtype=np.uint64)
    np.bitwise_or.at(bmp, (lows >> 6).astype(np.int64),
                     np.uint64(1) << (lows.astype(np.uint64) & np.uint64(63)))
    return bmp


@register
class RoaringBitmap(Sketch):
    """Exact distinct-set UDAF over uint32 values (see module doc)."""

    MAGIC = b"!roarbm!"

    def __init__(self, name: str = "DEFAULT"):
        # hi-16-bit key → container; dtype IS the tag:
        #   uint16 sorted array  |  uint64[1024] bitmap
        self.containers: dict[int, np.ndarray] = {}
        self.name = name

    # -- update --------------------------------------------------------
    def update_arrow(self, arr) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        v = np.asarray(arr)
        if v.size == 0:
            return
        if v.dtype.kind not in "iu":
            raise SketchError("RoaringBitmap holds integer keys")
        v64 = v.astype(np.int64)
        if v64.min() < 0 or v64.max() > 0xFFFFFFFF:
            raise SketchError("RoaringBitmap keys must fit uint32 "
                              "(route 64-bit ids through a split or hash)")
        self.add_u32(v64.astype(np.uint32))

    def add_u32(self, v: np.ndarray) -> None:
        v = np.unique(v)  # sorted distinct — one sort per batch
        if v.size == 0:
            return
        hi = (v >> np.uint32(16)).astype(np.int64)
        lo = (v & np.uint32(0xFFFF)).astype(np.uint16)
        bounds = np.flatnonzero(np.diff(hi)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [v.size]])
        for s, e in zip(starts, ends):
            self._union_lows(int(hi[s]), lo[s:e])

    def _union_lows(self, key: int, lows_sorted: np.ndarray) -> None:
        cur = self.containers.get(key)
        if cur is not None and cur.dtype == np.uint64:  # bitmap: set bits
            np.bitwise_or.at(
                cur, (lows_sorted >> 6).astype(np.int64),
                np.uint64(1) << (lows_sorted.astype(np.uint64)
                                 & np.uint64(63)))
            return
        new = lows_sorted if cur is None else \
            np.union1d(cur, lows_sorted).astype(np.uint16)
        if new.size > ARRAY_MAX:
            self.containers[key] = _to_bitmap(new)
        else:
            self.containers[key] = new.copy() if new is lows_sorted else new

    # -- query ---------------------------------------------------------
    def cardinality(self) -> int:
        return sum(
            _popcount64(c) if c.dtype == np.uint64 else int(c.size)
            for c in self.containers.values())

    def contains_batch(self, arr) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        v = np.asarray(arr).astype(np.uint32)
        out = np.zeros(v.size, dtype=bool)
        hi = (v >> np.uint32(16)).astype(np.int64)
        lo = (v & np.uint32(0xFFFF)).astype(np.uint16)
        for key in np.unique(hi):
            c = self.containers.get(int(key))
            if c is None:
                continue
            m = hi == key
            if c.dtype == np.uint64:
                w = c[(lo[m] >> 6).astype(np.int64)]
                out[m] = (w >> (lo[m].astype(np.uint64) & np.uint64(63))) \
                    & np.uint64(1) != 0
            else:
                lom = lo[m]
                pos = np.searchsorted(c, lom)
                ok = pos < c.size
                res = np.zeros(lom.size, dtype=bool)
                res[ok] = c[pos[ok]] == lom[ok]
                out[m] = res
        return out

    # pipelines.query.membership / CLI probe speak ``lookup_batch``
    lookup_batch = contains_batch

    def intersect_cardinality(self, other: "RoaringBitmap") -> int:
        """|self ∩ other| without materializing the intersection —
        container-wise: sorted-array ∩ sorted-array via intersect1d
        (both sides distinct by construction), bitmap ∩ bitmap via
        AND-popcount, mixed via bit tests on the array side."""
        total = 0
        for key, a in self.containers.items():
            b = other.containers.get(key)
            if b is None:
                continue
            if a.dtype == np.uint16 and b.dtype == np.uint16:
                total += np.intersect1d(a, b, assume_unique=True).size
            elif a.dtype == np.uint64 and b.dtype == np.uint64:
                total += _popcount64(a & b)
            else:
                arr, bmp = (a, b) if a.dtype == np.uint16 else (b, a)
                w = bmp[(arr >> 6).astype(np.int64)]
                total += int((((w >> (arr.astype(np.uint64) & np.uint64(63)))
                               & np.uint64(1)) != 0).sum())
        return total

    def finalize(self) -> dict:
        return {"cardinality": self.cardinality(),
                "n_containers": len(self.containers)}

    # -- merge ---------------------------------------------------------
    def merge(self, other: "RoaringBitmap") -> "RoaringBitmap":
        self._check_compatible(other)
        for key, oc in other.containers.items():
            cur = self.containers.get(key)
            if cur is None:
                self.containers[key] = oc.copy()
            elif cur.dtype == np.uint64 and oc.dtype == np.uint64:
                np.bitwise_or(cur, oc, out=cur)
            elif cur.dtype == np.uint64:            # bitmap ∪ array
                self._union_lows(key, oc)
            elif oc.dtype == np.uint64:             # array ∪ bitmap
                bmp = oc.copy()
                np.bitwise_or.at(
                    bmp, (cur >> 6).astype(np.int64),
                    np.uint64(1) << (cur.astype(np.uint64) & np.uint64(63)))
                self.containers[key] = bmp
            else:
                self._union_lows(key, oc)
        return self

    # -- serialization ---------------------------------------------------
    def _meta(self) -> dict:
        return {"name": self.name}

    def _meta_compat(self) -> dict:
        return {}  # any two roaring bitmaps merge

    def _arrays(self) -> list[np.ndarray]:
        keys = np.asarray(sorted(self.containers), dtype=np.uint32)
        kinds = np.asarray(
            [1 if self.containers[int(k)].dtype == np.uint64 else 0
             for k in keys], dtype=np.uint8)
        counts = np.asarray(
            [self.containers[int(k)].size for k in keys], dtype=np.int64)
        arrs = [self.containers[int(k)] for k in keys
                if self.containers[int(k)].dtype == np.uint16]
        bmps = [self.containers[int(k)] for k in keys
                if self.containers[int(k)].dtype == np.uint64]
        return [keys, kinds, counts,
                (np.concatenate(arrs) if arrs
                 else np.empty(0, np.uint16)),
                (np.concatenate(bmps) if bmps
                 else np.empty(0, np.uint64))]

    def _set_arrays(self, arrays: list[np.ndarray]) -> None:
        keys, kinds, counts, arr_pay, bmp_pay = arrays
        self.containers = {}
        ai = bi = 0
        for k, kind, cnt in zip(keys, kinds, counts):
            if kind:
                self.containers[int(k)] = bmp_pay[bi: bi + 1024].copy()
                bi += 1024
            else:
                self.containers[int(k)] = arr_pay[ai: ai + cnt].copy()
                ai += int(cnt)

    @classmethod
    def _from_meta(cls, meta: dict) -> "RoaringBitmap":
        return cls(name=meta.get("name", "DEFAULT"))
