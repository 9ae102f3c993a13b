"""Bloom filter — vectorized, mergeable.

Semantics mirror the reference engine's Bloom module (reference
src/bloom.c) exactly where observable:

* sizing: ``m = trunc(-n*ln(p)/ln(2)^2)`` with ``p`` promoted from
  float32 (bloom.c:37-39); ``k = trunc((m // n) * ln 2)`` — note the
  *integer* division ``m // n`` (bloom.c:54-56).
* positions: ``h_i = KM-double-hash(mmh3_128(key, seed=0)) % m``
  (bloom.c:290-352 via mmh3.c:308-315).
* popcount/saturation scan only the first ``m // 8`` bytes
  (``bitmap_size``, bloom.c:126-152) — the reference never counts the
  trailing partial byte.  We *allocate* ``ceil(m/8)`` bytes so positions
  in the last partial byte are stored safely (the reference's
  ``bitmap_size = m/8`` truncation makes those writes out of bounds in
  C — a latent bug we do not copy), but report/count with the
  reference's ``m // 8``.
* merge = bitwise OR with compatibility check (bloom.c:770-795);
  intersect = AND (bloom.c:812-837); Jaccard estimate =
  popcount(A&B)/popcount(A|B)*100 (bloom.c:253-275).
* estimated FPR = ``(1 - e^{-k*n/m})^k`` with ``n := popcount``
  (bloom.c:201-218).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_128_batch, make_hashes_batch
from .base import Sketch, SketchError, register


def ideal_size(expected: int, accuracy: float) -> int:
    """Optimal bit-array size; trunc like the C size_t cast (bloom.c:37-39).

    ``accuracy`` goes through float32 like the C ``float`` parameter.
    """
    p = float(np.float32(accuracy))
    return int(-(expected * math.log(p) / math.log(2.0) ** 2))


def _hashcount_trunc(size: int, expected: int) -> int:
    # (m // n) * ln 2, truncated (bloom.c:56 — size_t division!)
    return int((size // expected) * math.log(2.0))


@register
class BloomFilter(Sketch):
    MAGIC = b"!bloomf!"
    # membership is multiplicity-blind: updating with the distinct
    # values of a batch is identical to updating with every row —
    # lets build_sketches feed value_counts pre-aggregates
    SET_SEMANTICS = True

    def __init__(self, expected: int, accuracy: float = 0.01, name: str = "DEFAULT"):
        if expected <= 0:
            raise SketchError("expected must be > 0")
        self.expected = int(expected)
        self.accuracy = float(accuracy)
        self.size = ideal_size(expected, accuracy)          # m (bits)
        self.hashcount = _hashcount_trunc(self.size, expected)  # k
        if self.hashcount < 1:
            self.hashcount = 1
        self.bitmap_size = self.size // 8                   # reference-reported bytes
        self.name = name
        self.bitmap = np.zeros((self.size + 7) // 8, dtype=np.uint8)

    # -- positions ----------------------------------------------------
    def _positions(self, arr) -> np.ndarray:
        h1, h2 = mmh3_128_batch(arr)
        return self._positions_from_hashes(h1, h2)

    def _positions_from_hashes(self, h1, h2) -> np.ndarray:
        return (make_hashes_batch(h1, h2, self.hashcount) % np.uint64(self.size)).astype(np.int64)

    # -- update -------------------------------------------------------
    def update_arrow(self, arr) -> None:
        """Vectorized ``bloom_add`` (bloom.c:336-352) over a column."""
        if len(arr) == 0:
            return
        h1, h2 = mmh3_128_batch(arr)
        self.update_hashes(h1, h2)

    def update_hashes(self, h1, h2) -> None:
        """``bloom_add`` from precomputed ``mmh3_128`` pairs — lets a
        multi-sketch build hash each column ONCE per batch."""
        pos = self._positions_from_hashes(h1, h2).ravel()
        np.bitwise_or.at(self.bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))

    # -- queries ------------------------------------------------------
    def lookup_batch(self, arr) -> np.ndarray:
        """Vectorized ``bloom_lookup`` (bloom.c:290-320): bool per element."""
        if len(arr) == 0:
            return np.empty(0, dtype=bool)
        pos = self._positions(arr)  # (k, n)
        bits = (self.bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return bits.all(axis=0)

    def lookup(self, element: bytes | str) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_batch(pa.array([element], type=typ))[0])

    def lookup_or_add_batch(self, arr) -> np.ndarray:
        """Vectorized ``bloom_lookup_or_add`` (bloom.c:378-404).

        Returns True where the element was already present (counting
        earlier occurrences within this batch — sequential semantics).
        """
        if len(arr) == 0:
            return np.empty(0, dtype=bool)
        h1, h2 = mmh3_128_batch(arr)
        pos = (make_hashes_batch(h1, h2, self.hashcount) % np.uint64(self.size)).astype(np.int64)
        bits = (self.bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        present_before = bits.all(axis=0)
        # intra-batch duplicates: first occurrence of an identical hash pair
        # "adds", later occurrences see it present
        pair = (h1.astype(np.uint64) << np.uint64(1)) ^ h2  # cheap combiner; exactness
        order = np.arange(len(h1))
        _, first_idx = np.unique(np.stack([h1, h2]), axis=1, return_index=True)
        is_first = np.zeros(len(h1), dtype=bool)
        is_first[first_idx] = True
        del pair, order
        flat = pos.ravel()
        np.bitwise_or.at(self.bitmap, flat >> 3, np.uint8(1) << (flat & 7).astype(np.uint8))
        return present_before | ~is_first

    def lookup_or_add(self, element: bytes | str) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_or_add_batch(pa.array([element], type=typ))[0])

    def add_if_not_present(self, element: bytes | str) -> bool:
        """``bloom_add_if_not_present`` (bloom.c:435-452): True if added."""
        return not self.lookup_or_add(element)

    # -- statistics ---------------------------------------------------
    def saturation_count(self) -> int:
        """Popcount over the first ``m // 8`` bytes (bloom.c:126-133)."""
        return int(np.unpackbits(self.bitmap[: self.bitmap_size]).sum())

    def saturation(self) -> float:
        """% of bits set over ``bitmap_size * 8`` (bloom.c:147-152)."""
        total = self.bitmap_size * 8
        return float(self.saturation_count()) / total * 100.0 if total else 0.0

    def clear(self) -> None:
        self.bitmap[:] = 0

    def clear_if_saturation_exceeds(self, threshold: float) -> bool:
        """bloom.c:170-179."""
        if self.saturation() > threshold:
            self.clear()
            return True
        return False

    def estimate_false_positive_rate(self) -> float:
        """``(1 - e^{-kn/m})^k`` with n = popcount (bloom.c:201-218)."""
        m, n, k = self.size, self.saturation_count(), self.hashcount
        return float((1.0 - math.exp(-k * n / m)) ** k)

    # -- algebra ------------------------------------------------------
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """Union by bitwise OR (bloom.c:770-795)."""
        self._check_compatible(other)
        np.bitwise_or(self.bitmap, other.bitmap, out=self.bitmap)
        return self

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        """Approximate intersection by bitwise AND (bloom.c:812-837)."""
        self._check_compatible(other)
        np.bitwise_and(self.bitmap, other.bitmap, out=self.bitmap)
        return self

    def estimate_intersection(self, other: "BloomFilter") -> float:
        """Jaccard % = popcount(A&B)/popcount(A|B)*100 (bloom.c:253-275).

        Returns -1.0 on size/hashcount mismatch, 0.0 if both empty.
        """
        if self.size != other.size or self.hashcount != other.hashcount:
            return -1.0
        a = self.bitmap[: self.bitmap_size]
        b = other.bitmap[: self.bitmap_size]
        inter = int(np.unpackbits(a & b).sum())
        union = int(np.unpackbits(a | b).sum())
        if union == 0:
            return 0.0
        return inter / union * 100.0

    def finalize(self) -> dict:
        return {
            "size": self.size,
            "hashcount": self.hashcount,
            "saturation_count": self.saturation_count(),
            "saturation_pct": self.saturation(),
            "est_fpr": self.estimate_false_positive_rate(),
        }

    # -- reference on-disk format (migration shim) --------------------
    # bloomfilter_file (bloom.h:153-160, x86-64 natural alignment):
    #   uint8 magic[8] | uint8 name[256] | u64 size | u64 hashcount |
    #   u64 bitmap_size | u64 expected | float accuracy | 4 pad bytes
    # followed by the raw bitmap (bloom_save, bloom.c:525-560) —
    # exactly bitmap_size = size // 8 bytes, little-endian host order.
    _REF_STRUCT = "<8s256sQQQQf4x"  # == 304 bytes

    def to_reference_bytes(self) -> bytes:
        """Serialize to the reference engine's ``bloom_save`` file
        layout so a filter built here can be loaded by the C tooling.
        Note the reference writes/reads only ``size // 8`` bitmap bytes
        (its own trailing-partial-byte truncation, bloom.c:612-618);
        bits in a trailing partial byte do not survive the round-trip —
        same loss the reference itself has."""
        import struct

        name = self.name.encode("utf-8")[:255]
        header = struct.pack(
            self._REF_STRUCT, self.MAGIC, name, self.size, self.hashcount,
            self.bitmap_size, self.expected, float(np.float32(self.accuracy)),
        )
        return header + self.bitmap[: self.bitmap_size].tobytes()

    @classmethod
    def from_reference_bytes(cls, data: bytes) -> "BloomFilter":
        """Load a reference-engine ``.bf`` file (bloom_load,
        bloom.c:578-633), including its sanity checks."""
        import struct

        header_size = struct.calcsize(cls._REF_STRUCT)
        if len(data) < header_size:
            raise SketchError("reference bloom file: truncated header")
        magic, name, size, hashcount, bitmap_size, expected, accuracy = (
            struct.unpack_from(cls._REF_STRUCT, data))
        if magic != cls.MAGIC:
            raise SketchError("reference bloom file: bad magic")
        # bloom.c:608-612 sanity checks
        if size // 8 != bitmap_size or header_size + bitmap_size != len(data):
            raise SketchError("reference bloom file: invalid geometry")
        obj = cls.__new__(cls)
        obj.expected = int(expected)
        obj.accuracy = float(accuracy)
        obj.size = int(size)
        obj.hashcount = int(hashcount)
        obj.bitmap_size = int(bitmap_size)
        obj.name = name.split(b"\0", 1)[0].decode("utf-8", "replace")
        obj.bitmap = np.zeros((obj.size + 7) // 8, dtype=np.uint8)
        obj.bitmap[:bitmap_size] = np.frombuffer(
            data, dtype=np.uint8, count=bitmap_size, offset=header_size)
        return obj

    # -- ser/de -------------------------------------------------------
    def _meta(self) -> dict:
        return {
            "expected": self.expected,
            "accuracy": self.accuracy,
            "name": self.name,
        }

    def _arrays(self) -> list[np.ndarray]:
        return [self.bitmap]

    def _set_arrays(self, arrays) -> None:
        (self.bitmap,) = arrays

    @classmethod
    def _from_meta(cls, meta) -> "BloomFilter":
        return cls(meta["expected"], meta["accuracy"], meta.get("name", "DEFAULT"))
