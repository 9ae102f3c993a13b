"""Counting Bloom filter — vectorized, mergeable, deletion-capable.

Reference semantics (reference src/cbloom.c):

* sizing: same ``ideal_size`` as Bloom, but ``k = trunc((m // n)*ln 2
  + 0.5)`` — *rounds*, unlike Bloom's truncation (cbloom.c:73).
* counter widths 4/8/16/32/64-bit; writes saturate at the width's max
  (cbloom.c:186-216).  The 4-bit width is stored logically as uint8
  (max 15) and nibble-packed only at serialization; the reference's
  ``countermap_size = (m+1)/2`` is reported for parity (cbloom.c:81).
* ``count`` = min over the k counters (cbloom.c:257-293) — the same
  conservative estimator as count-min sketch.
* ``remove`` decrements only if ALL k counters are nonzero — guarded,
  unlike tdcbloom's unguarded decrement (cbloom.c:556-576).
* merge is absent from the reference; counting Bloom filters merge by
  element-wise saturating counter addition (sound because add is a
  counter increment), which we add as the UDAF combine step.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_128_batch, make_hashes_batch
from .base import Sketch, SketchError, register
from .bloom import ideal_size

COUNTER_WIDTHS = {4: np.uint8, 8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}


def _counter_max(width: int) -> int:
    return 15 if width == 4 else (1 << width) - 1


@register
class CountingBloomFilter(Sketch):
    MAGIC = b"!cbloom!"

    def __init__(self, expected: int, accuracy: float = 0.01, width: int = 8,
                 name: str = "DEFAULT"):
        if expected <= 0:
            raise SketchError("expected must be > 0")
        if width not in COUNTER_WIDTHS:
            raise SketchError(f"invalid counter width {width} (4/8/16/32/64)")
        self.expected = int(expected)
        self.accuracy = float(accuracy)
        self.width = int(width)
        self.size = ideal_size(expected, accuracy)
        # cbloom.c:73 — rounds via +0.5, unlike bloom's truncation
        self.hashcount = int((self.size // expected) * math.log(2.0) + 0.5)
        if self.hashcount < 1:
            self.hashcount = 1
        self.name = name
        self.counters = np.zeros(self.size, dtype=COUNTER_WIDTHS[width])

    @property
    def countermap_size(self) -> int:
        """Reference-reported byte size (cbloom.c:80-96)."""
        if self.width == 4:
            return (self.size + 1) // 2
        return self.size * (self.width // 8)

    @property
    def _max(self) -> int:
        return _counter_max(self.width)

    # -- positions ----------------------------------------------------
    def _positions(self, arr) -> np.ndarray:
        h1, h2 = mmh3_128_batch(arr)
        return (make_hashes_batch(h1, h2, self.hashcount) % np.uint64(self.size)).astype(np.int64)

    # -- update -------------------------------------------------------
    def update_arrow(self, arr) -> None:
        """Vectorized ``cbloom_add`` (cbloom.c:419-437): +1 on k counters
        per element, saturating at the width max."""
        if len(arr) == 0:
            return
        flat = self._positions(arr).ravel()
        uniq, cnt = np.unique(flat, return_counts=True)
        vals = self.counters[uniq].astype(np.int64) if self.width < 64 else self.counters[uniq].astype(object)
        new = np.minimum(vals + cnt, self._max)
        self.counters[uniq] = new.astype(self.counters.dtype) if self.width < 64 else new

    # -- queries ------------------------------------------------------
    def count_batch(self, arr) -> np.ndarray:
        """Vectorized ``cbloom_count`` (cbloom.c:257-274): min over k."""
        if len(arr) == 0:
            return np.empty(0, dtype=np.int64)
        pos = self._positions(arr)
        return self.counters[pos].min(axis=0).astype(np.int64)

    def count(self, element: bytes | str) -> int:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return int(self.count_batch(pa.array([element], type=typ))[0])

    def lookup_batch(self, arr) -> np.ndarray:
        """``cbloom_lookup`` (cbloom.c:372-392): all k counters > 0."""
        if len(arr) == 0:
            return np.empty(0, dtype=bool)
        pos = self._positions(arr)
        return (self.counters[pos] > 0).all(axis=0)

    def lookup(self, element: bytes | str) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_batch(pa.array([element], type=typ))[0])

    def lookup_or_add(self, element: bytes | str) -> bool:
        """``cbloom_lookup_or_add`` (cbloom.c:506-524): single hash pass,
        ALWAYS increments, returns was-present."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        arr = pa.array([element], type=typ)
        pos = self._positions(arr)[:, 0]
        present = bool((self.counters[pos] > 0).all())
        self._inc_positions(pos)
        return present

    def add_if_not_present(self, element: bytes | str) -> bool:
        """``cbloom_add_if_not_present`` (cbloom.c:461-468): does NOT
        increment when present.  Returns True if it was already present."""
        if self.lookup(element):
            return True
        self.add(element)
        return False

    def _inc_positions(self, pos: np.ndarray) -> None:
        uniq, cnt = np.unique(pos, return_counts=True)
        vals = self.counters[uniq].astype(np.int64) if self.width < 64 else self.counters[uniq].astype(object)
        self.counters[uniq] = np.minimum(vals + cnt, self._max).astype(self.counters.dtype)

    # -- removal / maintenance ---------------------------------------
    def remove(self, element: bytes | str) -> bool:
        """Guarded decrement (cbloom.c:556-576 via 733-735): only if all
        k counters are nonzero.  Returns True if decremented."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        pos = self._positions(pa.array([element], type=typ))[:, 0]
        if not (self.counters[pos] > 0).all():
            return False
        uniq, cnt = np.unique(pos, return_counts=True)
        vals = self.counters[uniq].astype(np.int64)
        self.counters[uniq] = np.maximum(vals - cnt, 0).astype(self.counters.dtype)
        return True

    def remove_batch(self, arr) -> np.ndarray:
        """Sequential-semantics batch remove (guard per element)."""
        out = np.zeros(len(arr), dtype=bool)
        pos_all = self._positions(arr)
        for j in range(len(arr)):
            pos = pos_all[:, j]
            if (self.counters[pos] > 0).all():
                uniq, cnt = np.unique(pos, return_counts=True)
                vals = self.counters[uniq].astype(np.int64)
                self.counters[uniq] = np.maximum(vals - cnt, 0).astype(self.counters.dtype)
                out[j] = True
        return out

    def clear_element(self, element: bytes | str) -> None:
        """``cbloom_clear_element`` (cbloom.c:805-822): zero k counters."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        pos = self._positions(pa.array([element], type=typ))[:, 0]
        self.counters[pos] = 0

    def clear_if_count_above(self, element: bytes | str, threshold: int) -> bool:
        """``cbloom_clear_if_count_above`` (cbloom.c:598-622): zero the
        element's counters if ANY of them exceeds the threshold."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        pos = self._positions(pa.array([element], type=typ))[:, 0]
        if (self.counters[pos] > threshold).any():
            self.counters[pos] = 0
            return True
        return False

    def apply_linear_decay(self, amount: int) -> None:
        """counters = max(c - amount, 0) (cbloom.c:664-679)."""
        vals = self.counters.astype(np.int64)
        np.maximum(vals - amount, 0, out=vals)
        self.counters = vals.astype(self.counters.dtype)

    def apply_exponential_decay(self, factor: float) -> None:
        """counters = trunc(c * f), f ∈ [0, 1] (cbloom.c:703-718)."""
        if factor < 0.0 or factor > 1.0:
            return
        self.counters = (self.counters * np.float64(factor)).astype(self.counters.dtype)

    def clear(self) -> None:
        self.counters[:] = 0

    # -- statistics ---------------------------------------------------
    def count_elements_above_threshold(self, threshold: int) -> int:
        """``#(counters > T) // k`` (cbloom.c:310-321)."""
        return int((self.counters > threshold).sum()) // self.hashcount

    def get_average_count(self) -> float:
        """Mean of nonzero counters (cbloom.c:337-354); 0.0 if empty."""
        nz = self.counters[self.counters > 0]
        return float(nz.mean()) if nz.size else 0.0

    def saturation_count(self) -> int:
        """#nonzero counters (cbloom.c:747-757)."""
        return int(np.count_nonzero(self.counters))

    def saturation(self) -> float:
        return self.saturation_count() / self.size * 100.0

    # -- algebra ------------------------------------------------------
    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        """Element-wise saturating counter addition (engine extension —
        absent from the reference; see module docstring)."""
        self._check_compatible(other)
        if self.width == 64:
            s = self.counters + other.counters  # wraps on overflow
            overflow = s < self.counters
            s[overflow] = np.uint64(self._max)
            self.counters = s
        else:
            s = self.counters.astype(np.int64) + other.counters.astype(np.int64)
            self.counters = np.minimum(s, self._max).astype(self.counters.dtype)
        return self

    def finalize(self) -> dict:
        return {
            "size": self.size,
            "hashcount": self.hashcount,
            "width": self.width,
            "saturation_count": self.saturation_count(),
            "average_count": self.get_average_count(),
        }

    # -- reference on-disk format (migration shim) --------------------
    # cbloomfilter_file (cbloom.h:175-184, x86-64 natural alignment):
    #   uint8 magic[8] | uint8 name[256] | u64 size | u64 csize |
    #   u64 hashcount | u64 countermap_size | u64 expected |
    #   float accuracy | 4 pad bytes            == 312 bytes
    # followed by the raw countermap (cbloom_save, cbloom.c:854-889):
    # nibble-packed for 4-bit counters (even position = low nibble,
    # cbloom.c:171-197), little-endian native arrays otherwise.
    _REF_STRUCT = "<8s256sQQQQQf4x"
    # counter_size enum values (cbloom.h:66-72): 4BIT=0 … 64BIT=4
    _CSIZE_ENUM = {4: 0, 8: 1, 16: 2, 32: 3, 64: 4}
    _CSIZE_FROM_ENUM = {v: k for k, v in _CSIZE_ENUM.items()}

    def to_reference_bytes(self) -> bytes:
        """Serialize to the reference engine's ``cbloom_save`` file
        layout so a counting filter built here loads in the C tooling
        (round-trip golden-tested in tests/test_cbloom.py)."""
        import struct

        name = self.name.encode("utf-8")[:255]
        header = struct.pack(
            self._REF_STRUCT, self.MAGIC, name, self.size,
            self._CSIZE_ENUM[self.width], self.hashcount,
            self.countermap_size, self.expected,
            float(np.float32(self.accuracy)),
        )
        (packed,) = self._arrays()  # nibble-packs width 4 like the C code
        return header + packed.tobytes()

    @classmethod
    def from_reference_bytes(cls, data: bytes) -> "CountingBloomFilter":
        """Load a reference-engine ``!cbloom!`` file (cbloom_load,
        cbloom.c:941-1000), including its file-size sanity check."""
        import struct

        header_size = struct.calcsize(cls._REF_STRUCT)
        if len(data) < header_size:
            raise SketchError("reference cbloom file: truncated header")
        magic, name, size, csize, hashcount, countermap_size, expected, accuracy = (
            struct.unpack_from(cls._REF_STRUCT, data))
        if magic != cls.MAGIC:
            raise SketchError("reference cbloom file: bad magic")
        if csize not in cls._CSIZE_FROM_ENUM:
            raise SketchError("reference cbloom file: invalid counter size")
        # cbloom.c:970-974 sanity check
        if header_size + countermap_size != len(data):
            raise SketchError("reference cbloom file: invalid geometry")
        width = cls._CSIZE_FROM_ENUM[csize]
        obj = cls.__new__(cls)
        obj.expected = int(expected)
        obj.accuracy = float(accuracy)
        obj.width = width
        obj.size = int(size)
        obj.hashcount = int(hashcount)
        obj.name = name.split(b"\0", 1)[0].decode("utf-8", "replace")
        raw = np.frombuffer(data, dtype=np.uint8, count=countermap_size,
                            offset=header_size)
        if width == 4:
            obj.counters = np.empty(obj.size, dtype=np.uint8)
            unpacked_lo = raw & 0x0F
            unpacked_hi = (raw >> 4) & 0x0F
            inter = np.empty(raw.size * 2, dtype=np.uint8)
            inter[0::2] = unpacked_lo
            inter[1::2] = unpacked_hi
            obj.counters[:] = inter[: obj.size]
        else:
            obj.counters = raw.view(COUNTER_WIDTHS[width])[: obj.size].copy()
        return obj

    # -- ser/de -------------------------------------------------------
    def _meta(self) -> dict:
        return {
            "expected": self.expected,
            "accuracy": self.accuracy,
            "width": self.width,
            "name": self.name,
        }

    def _arrays(self) -> list[np.ndarray]:
        if self.width == 4:
            # nibble-pack pairs: even index → low nibble (cbloom.c:171-197)
            padded = np.zeros((self.size + 1) // 2 * 2, dtype=np.uint8)
            padded[: self.size] = self.counters
            packed = (padded[0::2] & 0x0F) | ((padded[1::2] & 0x0F) << 4)
            return [packed]
        return [self.counters]

    def _set_arrays(self, arrays) -> None:
        (a,) = arrays
        if self.width == 4:
            unpacked = np.empty(a.size * 2, dtype=np.uint8)
            unpacked[0::2] = a & 0x0F
            unpacked[1::2] = (a >> 4) & 0x0F
            self.counters = unpacked[: self.size].copy()
        else:
            self.counters = a

    @classmethod
    def _from_meta(cls, meta) -> "CountingBloomFilter":
        return cls(meta["expected"], meta["accuracy"], meta["width"], meta.get("name", "DEFAULT"))
