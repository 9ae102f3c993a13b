"""DGIM sliding-window count sketch (Datar–Gionis–Indyk–Motwani,
"Maintaining Stream Statistics over Sliding Windows", SODA'02).

Answers "how many events landed in the last W time units?" in
O(log² W) memory however long the stream: events coalesce into
time-contiguous buckets whose sizes are powers of two with at most
``r`` buckets per size; a bucket expires when its newest timestamp
falls out of the window.  The estimate counts every full bucket plus
HALF the oldest — the absolute error is at most half the oldest
bucket, and for a single stream the relative error is ≤ 1/(2(r−1))
(≤ 50 % at the classic r = 2).

Engine notes (no reference-C counterpart — archbloom's time-decaying
filters answer membership-with-expiry; DGIM answers windowed COUNT,
completing the time-decay story):

* ``update_arrow(ts)`` takes int64 event-time stamps (the virtual-
  clock discipline of ``tdbloom.py``), non-decreasing per call and
  across calls — the standard DGIM stream order.  The per-key
  distributed build sorts each group once before updating, so the
  per-event cascade (O(log W) bucket ops) never runs over rows in a
  distributed hot path — groups are key-sized, not corpus-sized.
* ``merge`` is an engine extension for TIME-PARTITIONED builds: the
  older side's events must all precede the newer side's (checked via
  tracked first/last event times; overlap raises).  Concatenation of
  time-contiguous bucket lists keeps buckets disjoint and contiguous,
  so after the ≤ r re-cascade the ABSOLUTE half-oldest-bucket bound
  still holds exactly; the single-stream RELATIVE bound can loosen at
  the seam (sizes may lose monotonicity), which is why
  ``error_bound()`` reports the absolute ceiling — the contractual
  bound after any merge sequence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Sketch, SketchError, register


@register
class DGIM(Sketch):
    MAGIC = b"!dgimwin"

    def __init__(self, window: int, r: int = 2, name: str = "DEFAULT"):
        if window <= 0:
            raise SketchError("window must be > 0")
        if r < 2:
            raise SketchError("r must be >= 2")
        self.window = int(window)
        self.r = int(r)
        self.name = name
        # newest-first parallel lists: exponent (size = 2^e), newest ts
        self._sizes: list[int] = []
        self._ts: list[int] = []
        self._first_ts: int | None = None  # oldest event ever (merge guard)
        self._last_ts: int | None = None   # newest event

    # -- update -------------------------------------------------------
    def add_event(self, ts: int) -> None:
        """One event at time ``ts`` (non-decreasing)."""
        ts = int(ts)
        if self._last_ts is not None and ts < self._last_ts:
            raise SketchError(
                f"DGIM requires non-decreasing timestamps: {ts} < "
                f"{self._last_ts} (sort per key before updating)")
        if self._first_ts is None:
            self._first_ts = ts
        self._last_ts = ts
        self._expire(ts)
        self._sizes.insert(0, 0)
        self._ts.insert(0, ts)
        self._cascade()

    def update_arrow(self, arr, now=None) -> None:
        """Bulk add of an int64 timestamp column (non-decreasing).
        Python loop by design: this runs inside per-KEY groups (see
        module notes), and each event costs O(log W) bucket ops."""
        if len(arr) == 0:
            return
        for t in np.asarray(arr, dtype=np.int64):
            self.add_event(int(t))

    def _expire(self, now: int) -> None:
        # paper rule: a bucket lives while its (newest) ts > now − W
        while self._sizes and self._ts[-1] <= now - self.window:
            self._sizes.pop()
            self._ts.pop()

    def _cascade(self) -> None:
        """Restore ≤ r buckets per size: merge the two OLDEST buckets
        of any overfull size into one of the next size, keeping the
        newer timestamp (paper §2).  One upward sweep with a drain loop
        per size terminates: merges at e only ever add size-e+1
        buckets, which the sweep reaches next."""
        e = 0
        while self._sizes and e <= max(self._sizes):
            idxs = [i for i, s in enumerate(self._sizes) if s == e]
            while len(idxs) > self.r:
                a, b = idxs[-2], idxs[-1]  # two oldest of this size
                self._sizes[a] = e + 1      # a is newer (ts desc order)
                del self._sizes[b]
                del self._ts[b]
                idxs = [i for i, s in enumerate(self._sizes) if s == e]
            e += 1

    # -- queries ------------------------------------------------------
    def estimate(self, now: int) -> int:
        """Estimated events in (now − W, now]: full buckets + half the
        oldest (rounded up, the paper's convention)."""
        self._expire(int(now))
        if not self._sizes:
            return 0
        total = sum(1 << e for e in self._sizes)
        oldest = 1 << self._sizes[-1]
        return total - oldest + (oldest + 1) // 2

    def error_bound(self) -> int:
        """Half the oldest bucket — the absolute error ceiling (holds
        for single streams and any sequence of time-partitioned
        merges)."""
        return (1 << self._sizes[-1]) // 2 if self._sizes else 0

    def bucket_count(self) -> int:
        return len(self._sizes)

    # -- algebra (engine extension; time-partitioned merge) ------------
    def merge(self, other: "DGIM") -> "DGIM":
        self._check_compatible(other)
        if other._first_ts is None:          # empty other: no-op
            return self
        if self._first_ts is None:           # empty self: adopt other
            self._sizes = list(other._sizes)
            self._ts = list(other._ts)
            self._first_ts, self._last_ts = other._first_ts, other._last_ts
            return self
        # order sides old → new; ranges must NOT overlap (time-
        # partitioned build contract — see module docstring)
        if self._last_ts <= other._first_ts:
            old, new = self, other
        elif other._last_ts <= self._first_ts:
            old, new = other, self
        else:
            raise SketchError(
                "DGIM merge requires time-partitioned inputs: "
                f"[{self._first_ts},{self._last_ts}] overlaps "
                f"[{other._first_ts},{other._last_ts}]")
        sizes = list(new._sizes) + list(old._sizes)   # newest-first
        ts = list(new._ts) + list(old._ts)
        self._sizes, self._ts = sizes, ts
        self._first_ts = old._first_ts
        self._last_ts = new._last_ts
        self._expire(self._last_ts)
        self._cascade()
        return self

    def finalize(self) -> dict:
        return {"window": self.window, "r": self.r,
                "buckets": len(self._sizes),
                "error_bound": self.error_bound()}

    # -- ser/de -------------------------------------------------------
    def _meta(self) -> dict:
        return {"window": self.window, "r": self.r, "name": self.name,
                "first_ts": self._first_ts, "last_ts": self._last_ts}

    def _meta_compat(self) -> dict:
        return {"window": self.window, "r": self.r}

    def _arrays(self) -> list[np.ndarray]:
        return [np.asarray(self._sizes, dtype=np.int64),
                np.asarray(self._ts, dtype=np.int64)]

    def _set_arrays(self, arrays) -> None:
        sizes, ts = arrays
        self._sizes = [int(x) for x in sizes]
        self._ts = [int(x) for x in ts]

    @classmethod
    def _from_meta(cls, meta) -> "DGIM":
        obj = cls(meta["window"], meta.get("r", 2),
                  meta.get("name", "DEFAULT"))
        obj._first_ts = meta.get("first_ts")
        obj._last_ts = meta.get("last_ts")
        return obj
