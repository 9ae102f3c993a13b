"""Time-decaying Bloom filter — event-time, vectorized, mergeable.

Reference semantics (reference src/tdbloom.c): each slot stores a
1-based wrapped tick ``((now - start_time) mod max_time) + 1``
(tdbloom.c:293, 0 = empty); the timestamp width is auto-selected from
the timeout — 1 byte if timeout < 255, then 2/4/8 (tdbloom.c:92-102)
with ``max_time`` = the width's max value; staleness is
``((ts - value + max_time) mod max_time) > timeout`` (tdbloom.c:357-360,
wraparound-safe); ``k = trunc((m // n) * ln 2)`` like plain Bloom
(tdbloom.c:85); lookups globally fail once ``now - start_time >
max_time`` (tdbloom.c:342).

Deliberate engine deviations (documented per SURVEY.md §7):

* **Event-time virtual clock.** The reference reads
  ``CLOCK_MONOTONIC``; its own tests virtualize time by editing
  ``start_time`` (reference tests/test_tdbloom_basic.c:52,80).  We make
  the clock explicit: every mutating/query op takes ``now`` (seconds,
  scalar or per-row array — e.g. derived from the corpus ``warc_ts``
  column), giving deterministic, replayable, merge-friendly semantics.
* **Slot merge / batch add = max(tick).** The reference overwrites
  slots last-writer-wins under a monotone wall clock — equivalent to
  max-tick when time is monotone.  Max is associative + commutative, so
  the distributed tree merge is exact under one shared epoch.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_128_batch, make_hashes_batch
from .base import Sketch, SketchError, register
from .bloom import ideal_size

_WIDTH_FOR_TIMEOUT = ((255, 1), (65535, 2), (4294967295, 4))


def _pick_width(timeout: int) -> tuple[int, int]:
    """(bytes, max_time) per tdbloom.c:92-102."""
    for limit, nbytes in _WIDTH_FOR_TIMEOUT:
        if timeout < limit:
            return nbytes, limit
    return 8, (1 << 64) - 1

_DTYPES = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


@register
class TimeDecayingBloomFilter(Sketch):
    MAGIC = b"!tdbloo!"

    def __init__(self, expected: int, accuracy: float = 0.01, timeout: int = 60,
                 start_time: int = 0, name: str = "DEFAULT"):
        if expected <= 0:
            raise SketchError("expected must be > 0")
        if timeout <= 0:
            raise SketchError("timeout must be > 0")
        self.expected = int(expected)
        self.accuracy = float(accuracy)
        self.timeout = int(timeout)
        self.start_time = int(start_time)  # explicit epoch (virtual clock)
        self.size = ideal_size(expected, accuracy)
        self.hashcount = int((self.size // expected) * math.log(2.0))  # trunc, tdbloom.c:85
        if self.hashcount < 1:
            self.hashcount = 1
        self.bytes, self.max_time = _pick_width(timeout)
        self.name = name
        self.filter = np.zeros(self.size, dtype=_DTYPES[self.bytes])

    # -- clock --------------------------------------------------------
    def _tick(self, now) -> np.ndarray | int:
        """1-based wrapped tick (tdbloom.c:293)."""
        delta = np.asarray(now, dtype=np.int64) - self.start_time
        return (delta % self.max_time + self.max_time) % self.max_time + 1

    def _positions(self, arr) -> np.ndarray:
        h1, h2 = mmh3_128_batch(arr)
        return (make_hashes_batch(h1, h2, self.hashcount) % np.uint64(self.size)).astype(np.int64)

    # -- update -------------------------------------------------------
    def update_arrow(self, arr, now=None) -> None:
        """Vectorized ``tdbloom_add`` (tdbloom.c:289-310).

        ``now``: scalar seconds or per-row int array (event time).
        Slots take the max tick (== last-writer-wins under monotone
        time; see module docstring).
        """
        if len(arr) == 0:
            return
        if now is None:
            now = self.start_time
        ticks = np.broadcast_to(
            np.asarray(self._tick(now), dtype=self.filter.dtype), (len(arr),)
        )
        pos = self._positions(arr)  # (k, n)
        tick_mat = np.broadcast_to(ticks, pos.shape)
        np.maximum.at(self.filter, pos.ravel(), tick_mat.ravel())

    # -- queries ------------------------------------------------------
    def _stale(self, values: np.ndarray, now: int) -> np.ndarray:
        ts = self._tick(now)
        return ((int(ts) - values.astype(np.int64) + self.max_time) % self.max_time) > self.timeout

    def lookup_batch(self, arr, now=None) -> np.ndarray:
        """``tdbloom_lookup`` (tdbloom.c:336-364): all k slots nonzero
        and fresh; global guard after max_time elapsed (tdbloom.c:342)."""
        if len(arr) == 0:
            return np.empty(0, dtype=bool)
        if now is None:
            now = self.start_time
        now = int(now)
        if now - self.start_time > self.max_time:
            return np.zeros(len(arr), dtype=bool)
        pos = self._positions(arr)
        vals = self.filter[pos]
        ok = (vals != 0) & ~self._stale(vals, now)
        return ok.all(axis=0)

    def lookup(self, element, now=None) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_batch(pa.array([element], type=typ), now)[0])

    def has_expired(self, element, now=None) -> bool:
        """``tdbloom_has_expired`` (tdbloom.c:399-425): any slot nonzero
        but stale."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        if now is None:
            now = self.start_time
        pos = self._positions(pa.array([element], type=typ))[:, 0]
        vals = self.filter[pos]
        return bool(((vals != 0) & self._stale(vals, int(now))).any())

    def reset_if_expired(self, element, now=None) -> bool:
        """``tdbloom_reset_if_expired`` (tdbloom.c:462-469)."""
        if self.has_expired(element, now):
            typ = pa.string() if isinstance(element, str) else pa.binary()
            self.update_arrow(pa.array([element], type=typ), now)
            return True
        return False

    def lookup_or_add_batch(self, arr, now=None) -> np.ndarray:
        """``tdbloom_lookup_or_add`` (declared-only in the reference,
        tdbloom.h:129-130 — engine-defined semantics analogous to
        bloom_lookup_or_add): True where the element was fresh-present
        BEFORE this call; every element's slots are then stamped with
        the current tick.  Earlier occurrences inside the batch count
        (sequential semantics), matching the Bloom variant."""
        if len(arr) == 0:
            return np.empty(0, dtype=bool)
        if now is None:
            now = self.start_time
        present = self.lookup_batch(arr, now)
        h1, h2 = mmh3_128_batch(arr)
        _, first_idx = np.unique(np.stack([h1, h2]), axis=1, return_index=True)
        is_first = np.zeros(len(h1), dtype=bool)
        is_first[first_idx] = True
        self.update_arrow(arr, now)
        return present | ~is_first

    def lookup_or_add(self, element, now=None) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_or_add_batch(pa.array([element], type=typ), now)[0])

    def get_last_access_time(self, element, now=None) -> int:
        """``tdbloom_get_last_access_time`` (declared-only,
        tdbloom.h:146): conservative last-write estimate = the MIN tick
        over the element's k slots (each slot only moves forward, and
        shared slots can only inflate a single slot — the min is the
        tightest sound bound, same discipline as a count-min read).
        Ticks are stored modulo ``max_time``, so a caller past the
        first period MUST pass ``now`` to de-alias them: the returned
        absolute time is then the latest T ≤ now whose tick equals the
        stored value, and -1 is returned when any slot is empty OR
        stale at ``now`` (beyond one period the stored tick no longer
        identifies a unique time — same freshness rule as ``lookup``).
        With ``now=None`` the clock is assumed still inside the first
        period (ticks are absolute) and no staleness check applies."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        pos = self._positions(pa.array([element], type=typ))[:, 0]
        vals = self.filter[pos]
        if (vals == 0).any():
            return -1
        v = int(vals.astype(np.int64).min())
        if now is None:
            return int(self.start_time + v - 1)
        now = int(now)
        if self._stale(vals, now).any():
            return -1
        cur = int(self._tick(now))
        delta = (cur - v) % self.max_time
        return now - delta

    def was_active_within(self, element, start: int, end: int,
                          now: int | None = None) -> bool:
        """``tdbloom_was_active_within`` (declared-only, tdbloom.h:145):
        True when the element's conservative last-access estimate lands
        in [start, end] (absolute virtual-clock times).  ``now``
        defaults to ``end`` — a tdbloom keeps only the LAST access, so
        the question is decidable exactly when the window's end is the
        observation point."""
        t = self.get_last_access_time(element, end if now is None else now)
        return t >= 0 and int(start) <= t <= int(end)

    # -- maintenance --------------------------------------------------
    def expire_older_than(self, max_age: int, now=None) -> int:
        """``tdbloom_expire_older_than`` (declared-only, tdbloom.h:148):
        sweep every slot whose age at ``now`` exceeds ``max_age`` —
        a tighter horizon than the filter's own timeout.  Returns the
        number of slots zeroed."""
        if now is None:
            now = self.start_time
        ts = int(self._tick(int(now)))
        age = (ts - self.filter.astype(np.int64) + self.max_time) % self.max_time
        kill = (self.filter != 0) & (age > int(max_age))
        n = int(kill.sum())
        self.filter[kill] = 0
        return n

    def adjust_timeout(self, new_timeout: int) -> None:
        """``tdbloom_adjust_timeout`` (declared-only, tdbloom.h:119/149):
        change the decay horizon in place.  Allowed while the new
        timeout still fits the filter's timestamp width (the slot
        arrays are not rebuilt); raises otherwise."""
        if new_timeout <= 0:
            raise SketchError("timeout must be > 0")
        if new_timeout >= self.max_time:
            raise SketchError(
                f"new timeout {new_timeout} needs a wider timestamp than "
                f"this filter's {self.bytes}-byte slots (max_time {self.max_time})")
        self.timeout = int(new_timeout)

    def clear_expired(self, now=None) -> int:
        """Sweep stale slots to 0; returns count (tdbloom.c:179-207)."""
        if now is None:
            now = self.start_time
        stale = (self.filter != 0) & self._stale(self.filter, int(now))
        n = int(stale.sum())
        self.filter[stale] = 0
        return n

    def count_expired(self, now=None) -> int:
        """tdbloom.c:219-240."""
        if now is None:
            now = self.start_time
        return int(((self.filter != 0) & self._stale(self.filter, int(now))).sum())

    def age_element(self, element, age_amount: int) -> None:
        """Pull the element's slot ticks back ``age_amount`` ticks so it
        expires sooner, floor 0 (= cleared) — declared-only TODO
        ``tdbloom_age_element`` (tdbloom.h:134), implemented with the
        same subtract-and-floor semantics as the counting variant
        (tdcbloom.c:843-862 / our tdcbloom.age_element).  Shared slots
        are aged too (inherent to the structure, as in tdcbloom)."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        pos = self._positions(pa.array([element], type=typ))[:, 0]
        vals = self.filter[pos].astype(np.int64)
        aged = np.maximum(vals - int(age_amount), 0)
        aged[vals == 0] = 0
        self.filter[pos] = aged.astype(self.filter.dtype)

    def get_average_lifetime(self, now=None) -> int:
        """``tdbloom_get_average_lifetime`` (declared-only TODO,
        tdbloom.h:150): mean age in ticks of the ACTIVE (nonzero,
        unexpired) slots at ``now`` — the natural reading for a
        structure that keeps only each slot's last-access tick.
        Returns 0 when nothing is active (time_t-style)."""
        if now is None:
            now = self.start_time
        ts = int(self._tick(int(now)))
        active = (self.filter != 0) & ~self._stale(self.filter, int(now))
        if not active.any():
            return 0
        age = (ts - self.filter[active].astype(np.int64) + self.max_time) % self.max_time
        return int(age.mean())

    def saturation_count(self, now=None) -> int:
        """Number of fresh (nonzero, unexpired) slots — declared-only
        TODO ``tdbloom_saturation_count`` (tdbloom.h:117); defined so
        ``saturation() == saturation_count()/size*100`` holds."""
        if now is None:
            now = self.start_time
        return int(((self.filter != 0)
                    & ~self._stale(self.filter, int(now))).sum())

    def saturation(self, now=None) -> float:
        """% of slots fresh (tdbloom.c:255-276)."""
        if now is None:
            now = self.start_time
        irrelevant = int(((self.filter == 0) | self._stale(self.filter, int(now))).sum())
        return (1.0 - irrelevant / self.size) * 100.0

    def clear(self, now=None) -> None:
        """Zero + re-epoch (tdbloom.c:142-145)."""
        self.filter[:] = 0
        if now is not None:
            self.start_time = int(now)

    def reset_start_time(self, now: int) -> None:
        """tdbloom.c:158-163."""
        self.start_time = int(now)

    # -- algebra ------------------------------------------------------
    def merge(self, other: "TimeDecayingBloomFilter") -> "TimeDecayingBloomFilter":
        """Per-slot max tick under a shared epoch (engine extension;
        exact vs sequential insertion under monotone event time)."""
        self._check_compatible(other)
        np.maximum(self.filter, other.filter, out=self.filter)
        return self

    def finalize(self) -> dict:
        return {
            "size": self.size,
            "hashcount": self.hashcount,
            "timeout": self.timeout,
            "max_time": self.max_time,
            "bytes": self.bytes,
        }

    # -- reference on-disk format (migration shim) --------------------
    # tdbloom_file (tdbloom.h:68-79, x86-64 natural alignment):
    #   uint8 magic[8] | uint8 name[256] | u64 size | u64 filter_size |
    #   u64 hashcount | u64 expected | u64 max_time | u64 start_time |
    #   int bytes | float accuracy                    == 320 bytes
    # followed by filter_size = size·bytes payload bytes (slot ticks,
    # little-endian).  The reference's own save/load are buggy
    # (tdbloom.c:528-713): save never sets max_time (stays 0), its
    # inverted fwrite check reports failure on success, timeout is not
    # in the format at all, and load's size sanity compares against
    # sizeof(tdbloom) instead of sizeof(tdbloom_file) so it rejects
    # every valid file.  We implement the INTENDED semantics: write the
    # real max_time (which actually REPAIRS the file for the reference's
    # own loader), accept max_time==0 on import by recovering it from
    # the slot width, and validate against the on-disk header size.
    _REF_STRUCT = "<8s256sQQQQQQif"
    _MAX_TIME_FOR_BYTES = {1: 255, 2: 65535, 4: 4294967295, 8: (1 << 64) - 1}

    def to_reference_bytes(self, *, reference_quirks: bool = False) -> bytes:
        """Serialize to the reference ``tdbloom_save`` layout.  With
        ``reference_quirks=True`` the max_time field is zeroed exactly
        as the reference's save leaves it (byte-identical to a
        C-written file, for golden round-trip tests)."""
        import struct

        name = self.name.encode("utf-8")[:255]
        header = struct.pack(
            self._REF_STRUCT, self.MAGIC, name, self.size,
            self.size * self.bytes, self.hashcount, self.expected,
            0 if reference_quirks else self.max_time, self.start_time,
            self.bytes, float(np.float32(self.accuracy)),
        )
        return header + self.filter.tobytes()

    @classmethod
    def from_reference_bytes(cls, data: bytes,
                             timeout: int | None = None
                             ) -> "TimeDecayingBloomFilter":
        """Load a reference-engine ``!tdbloo!`` file.  ``timeout`` is
        NOT part of the reference format (its load leaves the field
        uninitialized); pass the original value, or the widest timeout
        the stored slot width supports (max_time − 1) is assumed."""
        import struct

        header_size = struct.calcsize(cls._REF_STRUCT)
        if len(data) < header_size:
            raise SketchError("reference tdbloom file: truncated header")
        (magic, name, size, filter_size, hashcount, expected, max_time,
         start_time, nbytes, accuracy) = struct.unpack_from(cls._REF_STRUCT, data)
        if magic != cls.MAGIC:
            raise SketchError("reference tdbloom file: bad magic")
        if nbytes not in _DTYPES:
            raise SketchError("reference tdbloom file: invalid slot width")
        # intended sanity checks (tdbloom.c:612-616 minus its sizeof bug)
        if filter_size != size * nbytes or header_size + filter_size != len(data):
            raise SketchError("reference tdbloom file: invalid geometry")
        if max_time == 0:  # reference-save quirk: recover from the width
            max_time = cls._MAX_TIME_FOR_BYTES[nbytes]
        obj = cls.__new__(cls)
        obj.expected = int(expected)
        obj.accuracy = float(accuracy)
        obj.timeout = int(timeout) if timeout is not None else int(max_time) - 1
        obj.start_time = int(start_time)
        obj.size = int(size)
        obj.hashcount = int(hashcount)
        obj.bytes = int(nbytes)
        obj.max_time = int(max_time)
        obj.name = name.split(b"\0", 1)[0].decode("utf-8", "replace")
        obj.filter = np.frombuffer(
            data, dtype=_DTYPES[nbytes], count=size, offset=header_size).copy()
        return obj

    # -- ser/de (real round-trip — the reference's tdcbloom save/load
    # are stubs and tdbloom_load drops timeout; we keep full fidelity,
    # tdbloom.c:528-713 bug notes in SURVEY §2.4) ----------------------
    def _meta(self) -> dict:
        return {
            "expected": self.expected,
            "accuracy": self.accuracy,
            "timeout": self.timeout,
            "start_time": self.start_time,
            "name": self.name,
        }

    def _arrays(self) -> list[np.ndarray]:
        return [self.filter]

    def _set_arrays(self, arrays) -> None:
        (self.filter,) = arrays

    @classmethod
    def _from_meta(cls, meta) -> "TimeDecayingBloomFilter":
        return cls(meta["expected"], meta["accuracy"], meta["timeout"],
                   meta.get("start_time", 0), meta.get("name", "DEFAULT"))
