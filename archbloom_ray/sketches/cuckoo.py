"""Cuckoo filter — membership with deletion.

Reference: src/cuckoo.c ("PARTIALLY IMPLEMENTED", reference
README.md:108).  Kept behavior: 16-bit fingerprints from
``mmh3_32(key, seed=0)`` (cuckoo.c:91), two candidate buckets
``i1 = h % nb`` and ``i2 = i1 ^ f(fp)``, buckets of ``bucket_size``
slots, eviction loop bounded by ``max_kicks`` with an xorshift32 PRNG
(cuckoo.c:31-39), per-bucket insertion counters and
``load_factor = insertions/capacity*100`` (cuckoo.c:199-202).

Reference defects NOT copied (standard Fan et al. semantics instead,
per SURVEY.md §2.6):

* the C filter is passed **by value**, so ``total_insertions`` /
  ``evictions`` / ``prng_state`` mutations are silently lost
  (cuckoo.c:89,103) — ours mutate real state;
* add/lookup use partner ``i1 ^ (fp>>1)`` but the eviction re-insert
  uses ``index ^ fp`` (cuckoo.c:93 vs cuckoo.c:117) — inconsistent, so
  evicted fingerprints could become unfindable; we use ONE involutive
  partner function ``i ^ ((fp >> 1) & (nb-1))`` everywhere, with
  ``num_buckets`` rounded up to a power of two so XOR is closed;
* fingerprint 0 is indistinguishable from an empty slot (cuckoo.c:78),
  silently losing 1/65536 of keys — we map fp 0 → 1;
* the PRNG is time-seeded (cuckoo.c:20-28) — ours is seeded explicitly
  for reproducibility.

Distribution note: a cuckoo filter is NOT cleanly mergeable (inserts
are order-dependent and can fail at high load), so in the engine it is
a per-partition / per-actor structure, not a shuffle UDAF — use
``BloomFilter``/``CountingBloomFilter`` for distributed membership.
``merge`` re-inserts the other filter's fingerprints and raises if any
insertion fails.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_32_batch
from .base import Sketch, SketchError, register


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@register
class CuckooFilter(Sketch):
    MAGIC = b"!cuckoo!"

    def __init__(self, num_buckets: int = 1024, bucket_size: int = 4,
                 max_kicks: int = 500, seed: int = 42, name: str = "DEFAULT"):
        if num_buckets < 1 or bucket_size not in (1, 2, 4, 8):
            raise SketchError("invalid cuckoo geometry")
        self.requested_buckets = int(num_buckets)
        self.num_buckets = _next_pow2(int(num_buckets))
        self.bucket_size = int(bucket_size)
        self.max_kicks = int(max_kicks)
        self.seed = int(seed)
        self.name = name
        # slot fp 0 = empty (cuckoo.c:78); real fps are in [1, 65535]
        self.buckets = np.zeros((self.num_buckets, self.bucket_size), dtype=np.uint16)
        self.bucket_insertions = np.zeros(self.num_buckets, dtype=np.int64)
        self.total_insertions = 0
        self.evictions = 0
        self._prng_state = np.uint32(seed if seed != 0 else 0xDEADBEEF)

    # -- internals ------------------------------------------------------
    def _xorshift32(self) -> int:
        """cuckoo.c:31-39, deterministic seed."""
        x = int(self._prng_state)
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        self._prng_state = np.uint32(x)
        return x

    def _fp_and_buckets(self, arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self._fp_and_buckets_from_h(mmh3_32_batch(arr))

    def _fp_and_buckets_from_h(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Derive (fp, i1, i2) from precomputed ``mmh3_32`` values —
        the filter only ever sees the 32-bit hash, so shipping ``h``
        (4 bytes/key) is lossless for filter semantics; the sharded
        build exploits this."""
        fp = (h & np.uint32(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # fp 0 is the empty sentinel
        i1 = (h % np.uint32(self.num_buckets)).astype(np.int64)
        i2 = self._partner(i1, fp)
        return fp, i1, i2

    def update_hashes32(self, h: np.ndarray) -> None:
        """Batch insert from precomputed ``mmh3_32`` values (same
        sequential order-dependent placement as :meth:`update_arrow`)."""
        if h.size == 0:
            return
        fp, i1, i2 = self._fp_and_buckets_from_h(h.astype(np.uint32))
        for j in range(len(fp)):
            self._add_one(int(fp[j]), int(i1[j]), int(i2[j]))

    def lookup_hashes32(self, h: np.ndarray) -> np.ndarray:
        if h.size == 0:
            return np.empty(0, dtype=bool)
        fp, i1, i2 = self._fp_and_buckets_from_h(h.astype(np.uint32))
        in1 = (self.buckets[i1] == fp[:, None]).any(axis=1)
        in2 = (self.buckets[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def remove_hashes32(self, h: np.ndarray) -> np.ndarray:
        """Batch remove from precomputed ``mmh3_32`` values; bool per
        element (removed?).  Sequential, same one-slot-per-call
        semantics as :meth:`remove` (cuckoo.c:158-193)."""
        fp, i1, i2 = self._fp_and_buckets_from_h(h.astype(np.uint32))
        out = np.zeros(h.size, dtype=bool)
        for j in range(h.size):
            f = int(fp[j])
            for bucket in (int(i1[j]), int(i2[j])):
                row = self.buckets[bucket]
                hit = np.flatnonzero(row == f)
                if hit.size:
                    row[hit[0]] = 0
                    if self.bucket_insertions[bucket] > 0:
                        self.bucket_insertions[bucket] -= 1
                    if self.total_insertions > 0:
                        self.total_insertions -= 1
                    out[j] = True
                    break
        return out

    def _partner(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mask = self.num_buckets - 1
        return (i.astype(np.int64) ^ ((fp.astype(np.int64) >> 1) & mask)) & mask

    def _try_insert(self, bucket: int, fp: int) -> bool:
        row = self.buckets[bucket]
        empty = np.flatnonzero(row == 0)
        if empty.size:
            row[empty[0]] = fp
            self.bucket_insertions[bucket] += 1
            self.total_insertions += 1
            return True
        return False

    # -- API --------------------------------------------------------------
    def add(self, element: bytes | str) -> bool:
        """Insert; False once max_kicks evictions fail (cuckoo.c:89-130)."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        fp, i1, i2 = self._fp_and_buckets(pa.array([element], type=typ))
        return self._add_one(int(fp[0]), int(i1[0]), int(i2[0]))

    def _add_one(self, fp: int, i1: int, i2: int) -> bool:
        if self._try_insert(i1, fp) or self._try_insert(i2, fp):
            return True
        index = i1 if (self._xorshift32() % 2) else i2
        for _ in range(self.max_kicks):
            b = self._xorshift32() % self.bucket_size
            evicted = int(self.buckets[index, b])
            self.buckets[index, b] = fp
            fp = evicted
            if self.bucket_insertions[index] > 0:
                self.bucket_insertions[index] -= 1
            index = int(self._partner(np.int64(index), np.uint16(fp)))
            if self._try_insert(index, fp):
                return True
        self.evictions += 1
        return False

    def update_arrow(self, arr) -> None:
        """Batch insert (vectorized hashing, sequential placement —
        cuckoo insertion is inherently order-dependent)."""
        if len(arr) == 0:
            return
        fp, i1, i2 = self._fp_and_buckets(arr)
        for j in range(len(fp)):
            self._add_one(int(fp[j]), int(i1[j]), int(i2[j]))

    def lookup_batch(self, arr) -> np.ndarray:
        """Vectorized ``cuckoo_lookup`` (cuckoo.c:132-152)."""
        if len(arr) == 0:
            return np.empty(0, dtype=bool)
        fp, i1, i2 = self._fp_and_buckets(arr)
        in1 = (self.buckets[i1] == fp[:, None]).any(axis=1)
        in2 = (self.buckets[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def lookup(self, element: bytes | str) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_batch(pa.array([element], type=typ))[0])

    def remove(self, element: bytes | str) -> bool:
        """Clear one matching fingerprint (cuckoo.c:158-193)."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        fp, i1, i2 = self._fp_and_buckets(pa.array([element], type=typ))
        f, b1, b2 = int(fp[0]), int(i1[0]), int(i2[0])
        for bucket in (b1, b2):
            row = self.buckets[bucket]
            hit = np.flatnonzero(row == f)
            if hit.size:
                row[hit[0]] = 0
                if self.bucket_insertions[bucket] > 0:
                    self.bucket_insertions[bucket] -= 1
                if self.total_insertions > 0:
                    self.total_insertions -= 1
                return True
        return False

    def load_factor(self) -> float:
        """insertions / capacity × 100 (cuckoo.c:199-202)."""
        return self.total_insertions / (self.num_buckets * self.bucket_size) * 100.0

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Re-insert the other filter's fingerprints; raises SketchError
        if capacity is exceeded (cuckoo filters are not shuffle-mergeable
        — see module docstring)."""
        self._check_compatible(other)
        occupied = np.argwhere(other.buckets != 0)
        for bucket, slot in occupied:
            fp = int(other.buckets[bucket, slot])
            partner = int(self._partner(np.int64(bucket), np.uint16(fp)))
            if not self._add_one(fp, int(bucket), partner):
                raise SketchError("cuckoo merge failed: capacity exceeded")
        return self

    def finalize(self) -> dict:
        return {
            "num_buckets": self.num_buckets,
            "bucket_size": self.bucket_size,
            "total_insertions": self.total_insertions,
            "load_factor": self.load_factor(),
            "evictions": self.evictions,
        }

    # -- ser/de (versioned & portable — the reference dumps the raw
    # struct and flags it non-portable itself, cuckoo.c:214-218) ---------
    def _meta(self) -> dict:
        return {
            "requested_buckets": self.requested_buckets,
            "bucket_size": self.bucket_size,
            "max_kicks": self.max_kicks,
            "seed": self.seed,
            "name": self.name,
            "total_insertions": self.total_insertions,
            "evictions": self.evictions,
            "prng_state": int(self._prng_state),
        }

    def _meta_compat(self) -> dict:
        return {
            "nb": self.num_buckets,
            "bs": self.bucket_size,
        }

    def _arrays(self):
        return [self.buckets, self.bucket_insertions]

    def _set_arrays(self, arrays):
        self.buckets, self.bucket_insertions = arrays

    @classmethod
    def _from_meta(cls, meta):
        obj = cls(meta["requested_buckets"], meta["bucket_size"],
                  meta["max_kicks"], meta.get("seed", 42), meta.get("name", "DEFAULT"))
        obj.total_insertions = meta.get("total_insertions", 0)
        obj.evictions = meta.get("evictions", 0)
        obj._prng_state = np.uint32(meta.get("prng_state", obj.seed))
        return obj


@register
class ReferenceCuckooFilter(Sketch):
    """Same-arch reader for the reference's raw-struct cuckoo dump
    (cuckoo.c:205-233 ``cuckoo_save``): 64-byte LP64 struct header
    (two raw heap POINTERS included — the file is non-portable by the
    reference's own TODO at cuckoo.c:214-218) + ``nb·bs`` uint32
    fingerprint slots + ``nb`` uint64 per-bucket insertion counters.

    The reference's PLACEMENT differs from the engine's
    :class:`CuckooFilter` (modulo buckets vs power-of-two, partner
    ``(i1 ^ (fp>>1)) % nb`` vs involutive xor, fp 0 not remapped), so a
    loaded file answers lookups with the REFERENCE's exact arithmetic
    over the loaded arrays — it is a read view for migration, not a
    convertible engine filter (positions depend on the full 32-bit key
    hash, which the file does not retain).  Kept reference quirks:
    a key whose 16-bit fingerprint is 0 matches empty slots (the
    sentinel collision at cuckoo.c:78), and the saved header's
    ``total_insertions``/``evictions``/``prng_state`` reflect the
    by-value mutation loss (cuckoo.c:89-131) — all preserved verbatim
    for byte-identical re-export.

    Engine serde (``to_bytes``) wraps the same state in the portable
    versioned format so imported filters live in the engine store;
    ``to_reference_bytes`` reproduces the original file byte-for-byte
    (same arch)."""

    MAGIC = b"!refcuck"
    _HDR = "<QQQQQQQI4x"          # LP64 x86-64, no inner padding

    def __init__(self, name: str = "DEFAULT"):
        self.name = name
        self.header = b"\x00" * 64
        self.num_buckets = 0
        self.bucket_size = 0
        self.max_kicks = 0
        self.total_insertions = 0
        self.evictions = 0
        self.prng_state = 0
        self.buckets = np.zeros((0, 0), dtype=np.uint32)
        self.bucket_insertions = np.zeros(0, dtype=np.uint64)

    # -- reference-file interop ----------------------------------------
    @classmethod
    def from_reference_bytes(cls, data: bytes,
                             name: str = "DEFAULT") -> "ReferenceCuckooFilter":
        import struct as _struct

        if len(data) < 64:
            raise SketchError("reference cuckoo file: truncated header")
        (_, nb, bs, kicks, ins, _, evict, prng) = _struct.unpack(
            cls._HDR, data[:64])
        expected = 64 + nb * bs * 4 + nb * 8
        if nb == 0 or bs not in (2, 4, 8) or len(data) != expected:
            raise SketchError(
                f"reference cuckoo file: geometry/size mismatch "
                f"(nb={nb}, bs={bs}, {len(data)} bytes != {expected})")
        obj = cls(name=name)
        obj.header = data[:64]
        obj.num_buckets, obj.bucket_size = int(nb), int(bs)
        obj.max_kicks = int(kicks)
        obj.total_insertions, obj.evictions = int(ins), int(evict)
        obj.prng_state = int(prng)
        obj.buckets = np.frombuffer(
            data, dtype="<u4", count=nb * bs, offset=64
        ).reshape(nb, bs).copy()
        obj.bucket_insertions = np.frombuffer(
            data, dtype="<u8", count=nb, offset=64 + nb * bs * 4).copy()
        return obj

    def to_reference_bytes(self) -> bytes:
        return (self.header
                + self.buckets.astype("<u4").tobytes()
                + self.bucket_insertions.astype("<u8").tobytes())

    # -- queries (reference arithmetic, vectorized) --------------------
    def lookup_hashes32(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint32)
        fp = (h & np.uint32(0xFFFF)).astype(np.uint32)   # NOT remapped
        i1 = (h % np.uint32(self.num_buckets)).astype(np.int64)
        i2 = ((i1 ^ (fp >> np.uint32(1)).astype(np.int64))
              % self.num_buckets)
        in1 = (self.buckets[i1] == fp[:, None]).any(axis=1)
        in2 = (self.buckets[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def lookup_batch(self, arr) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return np.empty(0, dtype=bool)
        return self.lookup_hashes32(mmh3_32_batch(arr))

    def lookup(self, element: bytes | str) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_batch(pa.array([element], type=typ))[0])

    def load_factor(self) -> float:
        return (self.total_insertions
                / (self.num_buckets * self.bucket_size) * 100.0)

    def finalize(self) -> dict:
        return {
            "num_buckets": self.num_buckets,
            "bucket_size": self.bucket_size,
            "total_insertions": self.total_insertions,
            "occupied_slots": int((self.buckets != 0).sum()),
        }

    # a migration READ VIEW: the file does not retain key hashes, so
    # inserts/merges cannot preserve reference placement — refuse
    def update_arrow(self, arr) -> None:
        raise SketchError(
            "ReferenceCuckooFilter is a read view of a reference dump — "
            "build new filters with CuckooFilter")

    def merge(self, other) -> "ReferenceCuckooFilter":
        raise SketchError(
            "ReferenceCuckooFilter is a read view — reference dumps "
            "cannot be merged (placement depends on lost key hashes)")

    # -- engine serde ---------------------------------------------------
    def _meta(self) -> dict:
        return {
            "name": self.name,
            "header_hex": self.header.hex(),
            "num_buckets": self.num_buckets,
            "bucket_size": self.bucket_size,
            "max_kicks": self.max_kicks,
            "total_insertions": self.total_insertions,
            "evictions": self.evictions,
            "prng_state": self.prng_state,
        }

    def _arrays(self):
        return [self.buckets, self.bucket_insertions]

    def _set_arrays(self, arrays):
        self.buckets, self.bucket_insertions = arrays

    @classmethod
    def _from_meta(cls, meta):
        obj = cls(name=meta.get("name", "DEFAULT"))
        obj.header = bytes.fromhex(meta["header_hex"])
        obj.num_buckets = meta["num_buckets"]
        obj.bucket_size = meta["bucket_size"]
        obj.max_kicks = meta["max_kicks"]
        obj.total_insertions = meta["total_insertions"]
        obj.evictions = meta["evictions"]
        obj.prng_state = meta["prng_state"]
        return obj
