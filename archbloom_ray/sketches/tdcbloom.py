"""Time-decaying counting Bloom filter — event-time, vectorized, mergeable.

Reference semantics (reference src/tdcbloom.c): entry = [counter |
timestamp], both widths independently 8/16/32/64-bit
(tdcbloom.c:97-120); we hold them as two parallel numpy arrays instead
of packed bytes (same logical state).  ``k = trunc((m // n) * ln 2)``
(tdcbloom.c:91); it is the only variant that validates parameters
(expected > 0, 0 < accuracy < 1, tdcbloom.c:82-88).

Operation parity:

* ``add``: saturating counter increment + timestamp := now
  (tdcbloom.c:543-557); timestamps are raw seconds truncated to the
  timer width, exactly like the C cast.
* ``lookup``: all k of (counter > 0 AND fresh), freshness
  ``((now - ts + max_time) % max_time) <= timeout`` (tdcbloom.c:584-610).
* ``count``: min counter over k; 0 if any counter is 0 or any slot
  expired — note count's own staleness formula is the *unshifted*
  ``(now - ts) % max_time > timeout`` (tdcbloom.c:775-817).
* ``remove``: **unguarded** per-slot decrement, floor 0 — unlike
  cbloom's guarded remove (tdcbloom.c:736-749).
* sweeps (``clear_expired``/``count_expired``) use raw
  ``now - ts > timeout`` with no wraparound (tdcbloom.c:214-265).
* The reference's save/load are do-nothing stubs (tdcbloom.c:923-932);
  we implement real serialization (required for checkpointing).
* merge (engine extension): saturating counter add + timestamp max.

Event-time virtual clock as in tdbloom: every op takes ``now``; batch
adds use scatter-add for counters and scatter-max for timestamps
(== last-writer-wins under monotone event time).  NOTE: timestamp 0 is
the reference's "empty slot" sentinel (its wall clock is never 0), so
event times must be ≥ 1 — map your epoch accordingly.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_128_batch, make_hashes_batch
from .base import Sketch, SketchError, register
from .bloom import ideal_size

_DTYPES = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}


@register
class TimeDecayingCountingBloomFilter(Sketch):
    MAGIC = b"!tdcblo!"

    def __init__(self, expected: int, accuracy: float = 0.01, timeout: int = 60,
                 counter_width: int = 8, timer_width: int = 8,
                 start_time: int = 0, name: str = "DEFAULT"):
        # tdcbloom.c:82-88 — the only variant that validates params
        if expected <= 0:
            raise SketchError("invalid expected (must be > 0)")
        if not (0.0 < accuracy < 1.0):
            raise SketchError("invalid accuracy (must be in (0, 1))")
        if counter_width not in _DTYPES:
            raise SketchError(f"invalid counter width {counter_width}")
        if timer_width not in _DTYPES:
            raise SketchError(f"invalid timer width {timer_width}")
        self.expected = int(expected)
        self.accuracy = float(accuracy)
        self.timeout = int(timeout)
        self.counter_width = int(counter_width)
        self.timer_width = int(timer_width)
        self.start_time = int(start_time)
        self.size = ideal_size(expected, accuracy)
        self.hashcount = int((self.size // expected) * math.log(2.0))  # trunc, tdcbloom.c:91
        if self.hashcount < 1:
            self.hashcount = 1
        self.max_time = (1 << timer_width) - 1  # tdcbloom.c:117-120
        self.name = name
        self.counters = np.zeros(self.size, dtype=_DTYPES[counter_width])
        self.timers = np.zeros(self.size, dtype=_DTYPES[timer_width])

    @property
    def entry_size(self) -> int:
        """Reference-reported bytes per entry (tdcbloom.c:113)."""
        return self.counter_width // 8 + self.timer_width // 8

    @property
    def _cmax(self) -> int:
        return (1 << self.counter_width) - 1

    def _positions(self, arr) -> np.ndarray:
        h1, h2 = mmh3_128_batch(arr)
        return (make_hashes_batch(h1, h2, self.hashcount) % np.uint64(self.size)).astype(np.int64)

    def _trunc_now(self, now) -> np.ndarray:
        """The C cast to the timer width (set_timestamp)."""
        return np.asarray(now, dtype=np.int64).astype(self.timers.dtype)

    # -- update -------------------------------------------------------
    def update_arrow(self, arr, now=None) -> None:
        """Vectorized ``tdcbloom_add`` (tdcbloom.c:543-557)."""
        if len(arr) == 0:
            return
        if now is None:
            now = self.start_time
        pos = self._positions(arr)
        flat = pos.ravel()
        uniq, cnt = np.unique(flat, return_counts=True)
        vals = self.counters[uniq].astype(np.int64) if self.counter_width < 64 else self.counters[uniq].astype(object)
        self.counters[uniq] = np.minimum(vals + cnt, self._cmax).astype(self.counters.dtype)
        ts = np.broadcast_to(self._trunc_now(now), (len(arr),))
        np.maximum.at(self.timers, flat, np.broadcast_to(ts, pos.shape).ravel())

    # -- queries ------------------------------------------------------
    def _stale_lookup(self, pos: np.ndarray, now: int) -> np.ndarray:
        # tdcbloom.c:607: ((now - ts + max_time) % max_time) > timeout
        ts = self.timers[pos].astype(np.int64)
        return ((now - ts + self.max_time) % self.max_time) > self.timeout

    def lookup_batch(self, arr, now=None) -> np.ndarray:
        if len(arr) == 0:
            return np.empty(0, dtype=bool)
        if now is None:
            now = self.start_time
        pos = self._positions(arr)
        ok = (self.counters[pos] > 0) & ~self._stale_lookup(pos, int(now))
        return ok.all(axis=0)

    def lookup(self, element, now=None) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_batch(pa.array([element], type=typ), now)[0])

    def count_batch(self, arr, now=None) -> np.ndarray:
        """``tdcbloom_count`` (tdcbloom.c:775-817): min counter over k,
        0 if any counter 0 or any slot expired (unshifted mod formula)."""
        if len(arr) == 0:
            return np.empty(0, dtype=np.int64)
        if now is None:
            now = self.start_time
        now = int(now)
        pos = self._positions(arr)
        counters = self.counters[pos].astype(np.int64)
        ts = self.timers[pos].astype(np.int64)
        expired = ((now - ts) % self.max_time) > self.timeout
        out = counters.min(axis=0)
        dead = (counters == 0).any(axis=0) | expired.any(axis=0)
        out[dead] = 0
        return out

    def count(self, element, now=None) -> int:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return int(self.count_batch(pa.array([element], type=typ), now)[0])

    def has_expired(self, element, now=None) -> bool:
        """tdcbloom.c:642-668: any slot with counter/ts set but stale."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        if now is None:
            now = self.start_time
        pos = self._positions(pa.array([element], type=typ))[:, 0]
        ts = self.timers[pos].astype(np.int64)
        return bool(((ts != 0) & (((int(now) - ts + self.max_time) % self.max_time) > self.timeout)).any())

    def reset_if_expired(self, element, now=None) -> bool:
        """tdcbloom.c:688-722."""
        if self.has_expired(element, now):
            typ = pa.string() if isinstance(element, str) else pa.binary()
            self.update_arrow(pa.array([element], type=typ), now)
            return True
        return False

    # -- removal / maintenance ----------------------------------------
    def remove(self, element) -> None:
        """UNGUARDED decrement, floor 0 (tdcbloom.c:736-749) — keeps the
        semantic difference from cbloom's guarded remove."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        pos = self._positions(pa.array([element], type=typ))[:, 0]
        uniq, cnt = np.unique(pos, return_counts=True)
        vals = self.counters[uniq].astype(np.int64)
        self.counters[uniq] = np.maximum(vals - cnt, 0).astype(self.counters.dtype)

    def clear_expired(self, now=None) -> int:
        """Raw ``now - ts > timeout`` sweep, zeroes counter+timer
        (tdcbloom.c:214-233)."""
        if now is None:
            now = self.start_time
        ts = self.timers.astype(np.int64)
        stale = (ts != 0) & ((int(now) - ts) > self.timeout)
        n = int(stale.sum())
        self.counters[stale] = 0
        self.timers[stale] = 0
        return n

    def count_expired(self, now=None) -> int:
        """tdcbloom.c:248-265."""
        if now is None:
            now = self.start_time
        ts = self.timers.astype(np.int64)
        return int(((ts != 0) & ((int(now) - ts) > self.timeout)).sum())

    def adjust_timeout(self, new_timeout: int, now=None) -> int:
        """Set new timeout + purge now-stale entries (tdcbloom.c:303-320)."""
        self.timeout = int(new_timeout)
        return self.clear_expired(now)

    def age_element(self, element, age_amount: int) -> None:
        """Subtract age_amount from the element's timers, floor 0
        (tdcbloom.c:843-862)."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        pos = self._positions(pa.array([element], type=typ))[:, 0]
        vals = self.timers[pos].astype(np.int64)
        self.timers[pos] = np.maximum(vals - int(age_amount), 0).astype(self.timers.dtype)

    def age_and_remove(self, max_age: int, now=None) -> int:
        """Sweep-remove entries older than max_age (tdcbloom.c:893-911)."""
        if now is None:
            now = self.start_time
        ts = self.timers.astype(np.int64)
        old = (ts != 0) & ((int(now) - ts) > int(max_age))
        n = int(old.sum())
        self.counters[old] = 0
        self.timers[old] = 0
        return n

    def expire_below_count(self, threshold_count: int, now=None) -> int:
        """``tdbloom_expire_below_count`` (declared-only TODO,
        tdbloom.h:147) — count-based, so it lives on the COUNTING
        time-decay variant (a plain tdbloom holds no frequencies):
        sweep entries whose counter is 0 < c < threshold, zeroing
        counter + timer.  Returns slots swept."""
        kill = (self.counters > 0) & (self.counters < int(threshold_count))
        n = int(kill.sum())
        self.counters[kill] = 0
        self.timers[kill] = 0
        return n

    def expire_by_frequency(self, min_frequency: int, now=None) -> bool:
        """``tdbloom_expire_by_frequency`` (declared-only TODO,
        tdbloom.h:151): expire entries observed fewer than
        ``min_frequency`` times — the sweep of
        :meth:`expire_below_count`; returns whether anything expired
        (the header's bool)."""
        return self.expire_below_count(int(min_frequency), now) > 0

    def clear(self, now=None) -> None:
        """tdcbloom.c:154-157."""
        self.counters[:] = 0
        self.timers[:] = 0
        if now is not None:
            self.start_time = int(now)

    def reset_start_time(self, now: int) -> None:
        self.start_time = int(now)

    # -- statistics ---------------------------------------------------
    def saturation_count(self) -> int:
        """Active entries: counter≠0 or ts≠0 (tdcbloom.c:336-380)."""
        return int(((self.counters != 0) | (self.timers != 0)).sum())

    def saturation(self) -> float:
        return self.saturation_count() / self.size * 100.0

    def get_average_count(self) -> float:
        """Mean of nonzero counters (tdcbloom.c:515-530)."""
        nz = self.counters[self.counters > 0]
        return float(nz.mean()) if nz.size else 0.0

    # -- algebra ------------------------------------------------------
    def merge(self, other) -> "TimeDecayingCountingBloomFilter":
        """Saturating counter add + per-slot timestamp max (engine
        extension; see module docstring)."""
        self._check_compatible(other)
        if self.counter_width == 64:
            s = self.counters + other.counters
            s[s < self.counters] = np.uint64(self._cmax)
            self.counters = s
        else:
            s = self.counters.astype(np.int64) + other.counters.astype(np.int64)
            self.counters = np.minimum(s, self._cmax).astype(self.counters.dtype)
        np.maximum(self.timers, other.timers, out=self.timers)
        return self

    def finalize(self) -> dict:
        return {
            "size": self.size,
            "hashcount": self.hashcount,
            "timeout": self.timeout,
            "counter_width": self.counter_width,
            "timer_width": self.timer_width,
            "saturation_count": self.saturation_count(),
        }

    # -- ser/de -------------------------------------------------------
    def _meta(self) -> dict:
        return {
            "expected": self.expected,
            "accuracy": self.accuracy,
            "timeout": self.timeout,
            "counter_width": self.counter_width,
            "timer_width": self.timer_width,
            "start_time": self.start_time,
            "name": self.name,
        }

    def _arrays(self) -> list[np.ndarray]:
        return [self.counters, self.timers]

    def _set_arrays(self, arrays) -> None:
        self.counters, self.timers = arrays

    @classmethod
    def _from_meta(cls, meta):
        return cls(meta["expected"], meta["accuracy"], meta["timeout"],
                   meta["counter_width"], meta["timer_width"],
                   meta.get("start_time", 0), meta.get("name", "DEFAULT"))
