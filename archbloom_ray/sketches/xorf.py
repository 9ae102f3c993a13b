"""XOR filter — STATIC membership with ~2^-bits FPR at 1.23 bits·k/key.

Engine extension completing the reference's approximate-membership
family (Bloom — reference bloom.c; counting Bloom — cbloom.c; cuckoo —
cuckoo.c): the xor filter (Graf & Lemire, "Xor Filters: Faster and
Smaller Than Bloom and Cuckoo Filters", JEA 2020) trades the others'
incremental inserts for a smaller, faster immutable structure — the
right tool for the frozen-snapshot membership checks a crawl pipeline
does against last month's url set.

Construction is the paper's 3-partite peeling: m = ⌈1.23·n⌉ slots in
three equal segments, each key hashed to one slot per segment; repeat
{find degree-1 slots, peel their keys} until all keys are ordered,
then assign fingerprints in reverse peel order so that

    fp(x) == B[h0(x)] ^ B[h1(x)] ^ B[h2(x)]   for every inserted x.

This implementation peels in vectorized ROUNDS (the parallel-peeling
observation: all degree-1 slots of a round are independent, and a
round's keys only reference slots peeled in strictly later rounds or
never peeled — so reverse round-batched assignment is exact).  No
per-key Python loop anywhere.

Not mergeable (static): ``merge``/``update_arrow`` raise — a
distributed corpus build shards keys by hash and builds one filter per
shard (pipelines/build.py ``build_sharded_xor``), lookups routing by
the same shard function; shard states are independently serializable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_64_batch
from .base import Sketch, SketchError, register

_U64 = np.uint64
# splitmix64 constants (public domain, Steele et al.)
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def _splitmix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + _SM_GAMMA) * _SM_M1
        x ^= x >> _U64(30)
        x *= _SM_M2
        x ^= x >> _U64(27)
        x *= _SM_M1
        x ^= x >> _U64(31)
    return x


@register
class XorFilter(Sketch):
    MAGIC = b"!xorfltr"

    def __init__(self, bits: int = 8, name: str = "DEFAULT"):
        if bits not in (8, 16):
            raise SketchError("bits must be 8 or 16")
        self.bits = int(bits)
        self.name = name
        self.seed = 0
        self.seg = 0          # segment length; m = 3*seg
        self.n = 0            # keys built over (post-dedup)
        self.slots = np.empty(0, dtype=np.uint8 if bits == 8 else np.uint16)

    # -- static-build hash plumbing --------------------------------------
    def _positions(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Three segment-local slot positions + fingerprint for 64-bit
        key hashes ``h`` under the current attempt seed."""
        seg = _U64(self.seg)
        x = _splitmix(h.astype(_U64) ^ _U64(self.seed))
        y = _splitmix(x)
        p0 = (x % seg).astype(np.int64)
        p1 = (y % seg).astype(np.int64) + self.seg
        p2 = ((x >> _U64(32) ^ y >> _U64(32)) % seg).astype(np.int64) + 2 * self.seg
        fp = (_splitmix(y) & _U64((1 << self.bits) - 1))
        fp = fp.astype(self.slots.dtype if self.slots.size else
                       (np.uint8 if self.bits == 8 else np.uint16))
        return p0, p1, p2, fp

    # -- construction -----------------------------------------------------
    @classmethod
    def build_hashes(cls, keyhashes: np.ndarray, bits: int = 8,
                     name: str = "DEFAULT", max_attempts: int = 64) -> "XorFilter":
        """Build from pre-hashed 64-bit keys (duplicates deduped — a
        static filter represents a SET)."""
        self = cls(bits=bits, name=name)
        h = np.unique(np.asarray(keyhashes, dtype=_U64))
        n = int(h.size)
        self.n = n
        if n == 0:
            self.seg = 1
            self.slots = np.zeros(3, dtype=self.slots.dtype)
            return self
        self.seg = max(1, int(np.ceil(1.23 * n / 3.0)) + 1)
        m = 3 * self.seg
        for attempt in range(max_attempts):
            self.seed = attempt
            order, slots_of = self._peel(h, m)
            if order is not None:
                self._assign(h, m, order, slots_of)
                return self
        raise SketchError(f"xor filter peeling failed after {max_attempts} seeds (n={n})")

    @classmethod
    def build_arrow(cls, arr, bits: int = 8, name: str = "DEFAULT") -> "XorFilter":
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return cls.build_hashes(mmh3_64_batch(arr).astype(_U64), bits=bits, name=name)

    def _peel(self, h: np.ndarray, m: int):
        """Round-parallel peeling.  Returns (round_boundaries+key order,
        peeled slot per key) or (None, None) if stuck."""
        n = h.size
        p0, p1, p2, _ = self._positions(h)
        pos = np.stack([p0, p1, p2])                    # (3, n)
        count = np.zeros(m, dtype=np.int64)
        xk = np.zeros(m, dtype=np.int64)                # xor of key indices
        for row in pos:
            np.add.at(count, row, 1)
            np.bitwise_xor.at(xk, row, np.arange(n))
        order = np.empty(n, dtype=np.int64)             # peel order, by rounds
        slot_of = np.empty(n, dtype=np.int64)
        rounds: list[int] = [0]
        done = 0
        while done < n:
            singles = np.flatnonzero(count == 1)
            if singles.size == 0:
                return None, None
            keys = xk[singles]
            # one key may be the lone occupant of 2-3 slots: keep first
            keys, first = np.unique(keys, return_index=True)
            slots = singles[first]
            k = keys.size
            order[done : done + k] = keys
            slot_of[done : done + k] = slots
            done += k
            rounds.append(done)
            # remove the peeled keys from all their slots
            for row in pos:
                tp = row[keys]
                np.add.at(count, tp, -1)
                np.bitwise_xor.at(xk, tp, keys)
        self._rounds = rounds
        return order, slot_of

    def _assign(self, h: np.ndarray, m: int, order: np.ndarray,
                slot_of: np.ndarray) -> None:
        p0, p1, p2, fp = self._positions(h)
        self._assign_payload(m, order, slot_of, fp, p0, p1, p2)

    def _assign_payload(self, m: int, order: np.ndarray,
                        slot_of: np.ndarray, payload: np.ndarray,
                        p0: np.ndarray, p1: np.ndarray,
                        p2: np.ndarray) -> None:
        """Reverse round-batched assignment so that payload(x) ==
        B[p0]^B[p1]^B[p2] for every built key; ``payload`` is the
        fingerprint (filter) or the user value (retrieval map).
        Positions are passed in — computed once per build."""
        B = np.zeros(m, dtype=payload.dtype)
        rounds = self._rounds
        # reverse round order; within a round all writes are independent
        # (a peeled slot's other occupants were already gone, and a
        # round's reads touch only later-round or never-peeled slots)
        for r in range(len(rounds) - 2, -1, -1):
            sl = slice(rounds[r], rounds[r + 1])
            keys = order[sl]
            slots = slot_of[sl]
            B[slots] = (payload[keys] ^ B[p0[keys]] ^ B[p1[keys]]
                        ^ B[p2[keys]] ^ B[slots])  # B[slots] is 0 here
        self.slots = B
        del self._rounds

    # -- queries ------------------------------------------------------
    def contains_hashes(self, keyhashes: np.ndarray) -> np.ndarray:
        h = np.asarray(keyhashes, dtype=_U64)
        if self.n == 0:
            return np.zeros(h.size, dtype=bool)
        p0, p1, p2, fp = self._positions(h)
        B = self.slots
        return (B[p0] ^ B[p1] ^ B[p2]) == fp

    def lookup_batch(self, arr) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return self.contains_hashes(mmh3_64_batch(arr).astype(_U64))

    def lookup(self, element: bytes | str) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_batch(pa.array([element], type=typ))[0])

    def false_positive_rate(self) -> float:
        """The structure's FPR is 2^-bits by construction (paper §3)."""
        return 2.0 ** -self.bits

    @property
    def bits_per_key(self) -> float:
        return self.slots.size * self.bits / max(1, self.n)

    # -- static: no incremental update / merge -------------------------
    def update_arrow(self, arr) -> None:
        raise SketchError("xor filter is static — use XorFilter.build_arrow()")

    def merge(self, other: "Sketch") -> "Sketch":
        raise SketchError("xor filter is static — rebuild over the union "
                          "(distributed builds shard by key hash instead)")

    # -- serialization --------------------------------------------------
    def _meta(self) -> dict:
        return {"bits": self.bits, "name": self.name, "seed": self.seed,
                "seg": self.seg, "n": self.n}

    def _meta_compat(self) -> dict:
        return {"bits": self.bits}

    def _arrays(self) -> list[np.ndarray]:
        return [self.slots]

    def _set_arrays(self, arrays: list[np.ndarray]) -> None:
        self.slots = arrays[0]

    @classmethod
    def _from_meta(cls, meta: dict) -> "XorFilter":
        obj = cls(bits=meta["bits"], name=meta.get("name", "DEFAULT"))
        obj.seed = int(meta["seed"])
        obj.seg = int(meta["seg"])
        obj.n = int(meta["n"])
        return obj


@register
class XorMap(XorFilter):
    """Static RETRIEVAL structure — an exact key→w-bit-value function
    at ~1.23·w bits/key.

    Engine extension past the filter: Dietzfelbinger & Pagh, "Succinct
    data structures for retrieval and approximate membership"
    (ICALP'08) — the same 3-partite peeling as the xor filter, but the
    slots store the USER VALUE instead of a fingerprint, so

        value(x) == B[h0(x)] ^ B[h1(x)] ^ B[h2(x)]

    is EXACT for every built key.  An absent key returns an arbitrary
    w-bit word (retrieval structures answer only resident keys — pair
    with an XorFilter over the same keys when absence must be
    detected).  The corpus-scale use: frozen routing/assignment tables
    (doc → lang code, url → dedup cluster id, key → shard) broadcast
    at ~w bits/key instead of a hash map's ~100+ B/key.

    Static like the parent: build once (duplicate keys must carry the
    same value; conflicting duplicates raise), shard by key hash for
    distributed builds (pipelines/staticfilter.py)."""

    MAGIC = b"!xormap!"
    _DTYPES = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}

    def __init__(self, bits: int = 8, name: str = "DEFAULT"):
        if bits not in self._DTYPES:
            raise SketchError("bits must be 8, 16, 32 or 64")
        self.bits = int(bits)
        self.name = name
        self.seed = 0
        self.seg = 0
        self.n = 0
        self.slots = np.empty(0, dtype=self._DTYPES[bits])

    # -- construction --------------------------------------------------
    @classmethod
    def build_hashes_values(cls, keyhashes: np.ndarray, values: np.ndarray,
                            bits: int = 8, name: str = "DEFAULT",
                            max_attempts: int = 64) -> "XorMap":
        """Build from pre-hashed 64-bit keys + aligned values.
        Duplicate keys are deduped; duplicates with DIFFERENT values
        raise (a function must be single-valued)."""
        self = cls(bits=bits, name=name)
        h = np.asarray(keyhashes, dtype=_U64)
        v = np.asarray(values)
        if h.size != v.size:
            raise SketchError(f"{h.size} keys vs {v.size} values")
        if v.size:
            # retrieval is EXACT by contract: only integer arrays may
            # enter (a float would truncate silently — and a negative
            # float bypasses the signed check below entirely)
            if not np.issubdtype(v.dtype, np.integer):
                raise SketchError(
                    f"values must be an integer array, got {v.dtype}")
            # signed dtypes: reject negatives BEFORE the uint64 view
            # (unsigned input keeps the full 64-bit value range)
            if np.issubdtype(v.dtype, np.signedinteger) and (v < 0).any():
                raise SketchError("values must be non-negative")
            vu = v.astype(_U64)
            if bits < 64 and (vu >= _U64(1 << bits)).any():
                raise SketchError(f"values must fit {bits} bits")
            v = vu.astype(cls._DTYPES[bits])
        else:
            v = v.astype(cls._DTYPES[bits])
        order = np.argsort(h, kind="stable")
        hs, vs = h[order], v[order]
        first = np.ones(hs.size, dtype=bool)
        if hs.size > 1:
            np.not_equal(hs[1:], hs[:-1], out=first[1:])
            dup = np.flatnonzero(~first)
            if dup.size and (vs[dup] != vs[dup - 1]).any():
                raise SketchError(
                    "conflicting values for duplicate key(s)")
        h, v = hs[first], vs[first]
        n = int(h.size)
        self.n = n
        if n == 0:
            self.seg = 1
            self.slots = np.zeros(3, dtype=self._DTYPES[bits])
            return self
        self.seg = max(1, int(np.ceil(1.23 * n / 3.0)) + 1)
        m = 3 * self.seg
        for attempt in range(max_attempts):
            self.seed = attempt
            order2, slots_of = self._peel(h, m)
            if order2 is not None:
                p0, p1, p2, _ = self._positions(h)
                self._assign_payload(m, order2, slots_of, v, p0, p1, p2)
                return self
        raise SketchError(
            f"xor map peeling failed after {max_attempts} seeds (n={n})")

    @classmethod
    def build_arrow_values(cls, arr, values, bits: int = 8,
                           name: str = "DEFAULT") -> "XorMap":
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return cls.build_hashes_values(
            mmh3_64_batch(arr).astype(_U64), np.asarray(values),
            bits=bits, name=name)

    # -- queries -------------------------------------------------------
    def get_hashes(self, keyhashes: np.ndarray) -> np.ndarray:
        """Exact values for built keys; arbitrary words for absent."""
        h = np.asarray(keyhashes, dtype=_U64)
        if self.n == 0:
            return np.zeros(h.size, dtype=self._DTYPES[self.bits])
        p0, p1, p2, _ = self._positions(h)
        B = self.slots
        return B[p0] ^ B[p1] ^ B[p2]

    def get_batch(self, arr) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return self.get_hashes(mmh3_64_batch(arr).astype(_U64))

    def get(self, element: bytes | str) -> int:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return int(self.get_batch(pa.array([element], type=typ))[0])

    # a map's slots hold values, not fingerprints — membership is
    # undefined (pair with an XorFilter over the same keys)
    def contains_hashes(self, keyhashes: np.ndarray) -> np.ndarray:
        raise SketchError("xor map stores values, not fingerprints — "
                          "pair with an XorFilter for membership")

    def lookup_batch(self, arr):
        raise SketchError("xor map stores values, not fingerprints — "
                          "pair with an XorFilter for membership")


@register
class BinaryFuseFilter(XorFilter):
    """Binary fuse filter — the xor filter's smaller successor (Graf &
    Lemire, "Binary Fuse Filters: Fast and Smaller Than Xor Filters",
    JEA 2022): same fp == B[p0]^B[p1]^B[p2] contract and the same
    round-parallel peeling, but the three slots live in three
    CONSECUTIVE power-of-two segments chosen by a fair multiply-shift
    over the key hash (§3) — the "fuse" topology peels at ~1.125·n
    slots for large n (vs the xor construction's 1.23·n), i.e. ~9.0
    bits/key at 8-bit fingerprints for corpus-scale builds (the gain
    is asymptotic: below ~10^5 keys the paper's size factor matches
    the xor filter's).

    Sizing follows the paper's published parameters (§4): 3-wise
    arity, segment_length = min(2^18, 2^⌊log(n)/log(3.33) + 2.25⌋),
    size factor max(1.125, 0.875 + 0.25·ln(10^6)/ln(n)).

    Static like the parent; distributed builds shard by key hash
    (`pipelines/staticfilter.py` — the shared shard→build→route
    plumbing works unchanged: pass ``kind='bfuse'`` to
    ``build_sharded_xor``)."""

    MAGIC = b"!binfuse"
    # v2: _positions switched to an independent second splitmix round
    # (r5 advice fix) — v1 state would deserialize cleanly but answer
    # false NEGATIVES for its own members under the new derivation, so
    # old state must fail loudly instead
    VERSION = 2

    def __init__(self, bits: int = 8, name: str = "DEFAULT"):
        super().__init__(bits=bits, name=name)
        self.seg_len = 1          # power-of-two segment length
        self.n_segments = 3       # total segments incl. the 2 fused tails

    # -- fuse sizing (paper §4, 3-wise) --------------------------------
    def _size(self, n: int) -> None:
        import math as _m
        if n <= 1:
            self.seg_len = 4
        else:
            self.seg_len = 1 << int(_m.floor(_m.log(n) / _m.log(3.33) + 2.25))
            self.seg_len = min(self.seg_len, 1 << 18)
        factor = 1.125 if n <= 1 else max(
            1.125, 0.875 + 0.25 * _m.log(1_000_000) / _m.log(n))
        capacity = int(round(n * factor))
        n_seg = (capacity + self.seg_len - 1) // self.seg_len
        self.n_segments = max(n_seg, 3)
        # slots = n_segments * seg_len; a key's window starts in
        # segments [0, n_segments - 3] (window = 3 consecutive)
        self.seg = 0   # parent field unused; slots sized below

    @property
    def _m_slots(self) -> int:
        return self.n_segments * self.seg_len

    def _positions(self, h: np.ndarray):
        """Window start by fair multiply-shift over the usable
        segment range, then one slot per consecutive segment (paper
        §3.2).  The three in-segment offsets come from a SECOND
        splitmix round so they are independent of the window-start
        bits (the paper draws window and offsets independently;
        reusing hh's bits 36-53 for p2 correlated it with the
        bits-32-63 window choice and eroded the peel/FPR margins),
        and the fingerprint from a third round so it is independent
        of both — lookups only need the rounds to be deterministic."""
        hh = _splitmix(h.astype(_U64) ^ _U64(self.seed))
        oh = _splitmix(hh)
        n_windows = _U64(max(1, (self.n_segments - 2))) * _U64(self.seg_len)
        # fair map of the top 32 bits onto [0, n_windows) — multiply-
        # shift (Lemire's fast range reduction); window start is
        # aligned DOWN to a segment boundary after offsetting
        start = ((hh >> _U64(32)) * n_windows >> _U64(32)).astype(np.int64)
        start -= start % self.seg_len
        mask = _U64(self.seg_len - 1)
        # seg_len ≤ 2^18, so shifts 0/21/42 carve disjoint bit ranges
        p0 = start + (oh & mask).astype(np.int64)
        p1 = start + self.seg_len + ((oh >> _U64(21)) & mask).astype(np.int64)
        p2 = start + 2 * self.seg_len + ((oh >> _U64(42)) & mask).astype(np.int64)
        fp = (_splitmix(oh) & _U64((1 << self.bits) - 1))
        fp = fp.astype(np.uint8 if self.bits == 8 else np.uint16)
        return p0, p1, p2, fp

    @classmethod
    def build_hashes(cls, keyhashes: np.ndarray, bits: int = 8,
                     name: str = "DEFAULT",
                     max_attempts: int = 128) -> "BinaryFuseFilter":
        self = cls(bits=bits, name=name)
        h = np.unique(np.asarray(keyhashes, dtype=_U64))
        n = int(h.size)
        self.n = n
        if n == 0:
            self._size(1)
            self.slots = np.zeros(self._m_slots, dtype=self.slots.dtype)
            return self
        self._size(n)
        for attempt in range(max_attempts):
            self.seed = attempt
            order, slots_of = self._peel(h, self._m_slots)
            if order is not None:
                self._assign(h, self._m_slots, order, slots_of)
                return self
            # the paper grows the array when peeling stalls repeatedly
            if attempt % 8 == 7:
                self.n_segments += 1
        raise SketchError(
            f"binary fuse peeling failed after {max_attempts} seeds (n={n})")

    # -- serialization --------------------------------------------------
    def _meta(self) -> dict:
        return {"bits": self.bits, "name": self.name, "seed": self.seed,
                "seg_len": self.seg_len, "n_segments": self.n_segments,
                "n": self.n}

    @classmethod
    def _from_meta(cls, meta: dict) -> "BinaryFuseFilter":
        obj = cls(bits=meta["bits"], name=meta.get("name", "DEFAULT"))
        obj.seed = int(meta["seed"])
        obj.seg_len = int(meta["seg_len"])
        obj.n_segments = int(meta["n_segments"])
        obj.n = int(meta["n"])
        return obj
