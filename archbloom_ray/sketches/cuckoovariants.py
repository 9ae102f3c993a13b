"""Counting and time-decaying cuckoo filters — the reference's own
declared-but-never-built variants (reference cuckoo.c:3-4:
"TODO: counting cuckoo filter / TODO: time-decaying cuckoo filter").

The reference never specified semantics, so these are engine designs
on the engine's repaired cuckoo base (sketches/cuckoo.py — consistent
involutive partner, fp ∈ [1, 2¹⁶), seeded PRNG):

* :class:`CountingCuckooFilter` — each occupied slot carries an int64
  count; inserting a fingerprint already resident increments instead
  of occupying a second slot (one entry per fingerprint per bucket
  pair), deletions decrement and free at zero, and evictions relocate
  the (fingerprint, count) pair together.  Counts are EXACT per
  fingerprint (the cuckoo analogue of the counting quotient filter):
  ``count(x)`` overestimates only when two keys collide on both
  fingerprint and bucket pair (~2⁻¹⁶·2/nb per pair).
* :class:`TimeDecayingCuckooFilter` — each slot carries the last-seen
  tick; ``add`` refreshes it (slot-max), ``lookup(now)`` requires
  ``now − tick ≤ timeout``, and STALE slots are reclaimable by new
  inserts (lazy expiry; ``clear_expired`` is the eager sweep).  The
  tdbloom family's freshness answers with cuckoo's deletability.

Like the base cuckoo these are per-partition / per-reducer structures
(placement is order-dependent): ``merge`` re-inserts the other
filter's occupied entries and raises when capacity is exceeded —
shard the key space for distributed builds (the
``build_sharded_cuckoo_states`` shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import SketchError, register
from .cuckoo import CuckooFilter


@register
class CountingCuckooFilter(CuckooFilter):
    MAGIC = b"!ccuckoo"

    STASH_CAP = 32

    def __init__(self, num_buckets: int = 1024, bucket_size: int = 4,
                 max_kicks: int = 500, seed: int = 42,
                 name: str = "DEFAULT"):
        super().__init__(num_buckets, bucket_size, max_kicks, seed, name)
        self.counts = np.zeros((self.num_buckets, self.bucket_size),
                               dtype=np.int64)
        # victim stash: a kick-exhausted chain's final evictee belongs
        # to a PREVIOUSLY-ACCEPTED key — dropping it would silently
        # break the exact-counts contract, so it parks here (classic
        # cuckoo stash); only a FULL stash raises
        self.stash_fps = np.empty(0, dtype=np.uint16)
        self.stash_counts = np.empty(0, dtype=np.int64)

    # -- update --------------------------------------------------------
    # accounting invariant: total_insertions == counts.sum() and
    # bucket_insertions[b] == counts[b].sum() at all times; the inner
    # helpers adjust only the per-bucket sums and _add_count applies
    # the net total ONCE (the r5 review found the eviction path
    # crediting the last-evicted entry's count instead of the new one)
    def _bump_if_present(self, fp: int, i1: int, i2: int, c: int) -> bool:
        for bucket in (i1, i2):
            hit = np.flatnonzero(self.buckets[bucket] == fp)
            if hit.size:
                self.counts[bucket, hit[0]] += c
                self.bucket_insertions[bucket] += c
                return True
        return False

    def _place(self, bucket: int, fp: int, c: int) -> bool:
        row = self.buckets[bucket]
        empty = np.flatnonzero(row == 0)
        if empty.size:
            row[empty[0]] = fp
            self.counts[bucket, empty[0]] = c
            self.bucket_insertions[bucket] += c
            return True
        return False

    def _stash_bump(self, fp: int, c: int) -> bool:
        hit = np.flatnonzero(self.stash_fps == fp)
        if hit.size:
            self.stash_counts[hit[0]] += c
            return True
        return False

    def _add_count(self, fp: int, i1: int, i2: int, c: int) -> bool:
        c0 = c
        if (self._stash_bump(fp, c)
                or self._bump_if_present(fp, i1, i2, c)
                or self._place(i1, fp, c) or self._place(i2, fp, c)):
            self.total_insertions += c0
            return True
        index = i1 if (self._xorshift32() % 2) else i2
        for _ in range(self.max_kicks):
            b = self._xorshift32() % self.bucket_size
            efp = int(self.buckets[index, b])
            ec = int(self.counts[index, b])
            self.buckets[index, b] = fp
            self.counts[index, b] = c
            self.bucket_insertions[index] += c - ec
            fp, c = efp, ec
            index = int(self._partner(np.int64(index), np.uint16(fp)))
            if self._place(index, fp, c):
                self.total_insertions += c0
                return True
        self.evictions += 1
        if len(self.stash_fps) < self.STASH_CAP:
            # park the in-hand evictee: nothing is lost, insert stands
            self.stash_fps = np.append(self.stash_fps,
                                       np.uint16(fp))
            self.stash_counts = np.append(self.stash_counts,
                                          np.int64(c))
            self.total_insertions += c0
            return True
        # stash full: the in-hand evicted entry is dropped
        self.total_insertions += c0 - c
        return False

    def _add_one(self, fp: int, i1: int, i2: int) -> bool:
        return self._add_count(fp, i1, i2, 1)

    def update_arrow(self, arr) -> None:
        """Batch insert with per-batch (fingerprint, buckets)
        pre-aggregation — multiplicities collapse to one placement.
        Raises on kick exhaustion: unlike the membership cuckoo, this
        class claims EXACT counts, so a silently dropped (fp, count)
        entry would be a lie — size capacity up instead."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return
        fp, i1, i2 = self._fp_and_buckets(arr)
        comp = (i1.astype(np.int64) << np.int64(17)) | fp.astype(np.int64)
        uniq, idx, cnt = np.unique(comp, return_index=True,
                                   return_counts=True)
        for j, c in zip(idx, cnt):
            if not self._add_count(int(fp[j]), int(i1[j]), int(i2[j]),
                                   int(c)):
                raise SketchError(
                    "counting cuckoo insert failed (max kicks): counts "
                    "are exact-by-contract — increase num_buckets")

    def update_weighted(self, arr, counts) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        w = np.asarray(counts, dtype=np.int64)
        if len(w) != len(arr):
            raise SketchError(
                f"update_weighted: {len(arr)} keys vs {len(w)} counts")
        if (w <= 0).any():
            raise SketchError("update_weighted: counts must be > 0")
        fp, i1, i2 = self._fp_and_buckets(arr)
        for j in range(len(fp)):
            if not self._add_count(int(fp[j]), int(i1[j]), int(i2[j]),
                                   int(w[j])):
                raise SketchError(
                    "counting cuckoo insert failed (max kicks): counts "
                    "are exact-by-contract — increase num_buckets")

    # -- queries -------------------------------------------------------
    def count_batch(self, arr) -> np.ndarray:
        """Per-key count: sum of matching slots over both candidate
        buckets (a single entry in the common case; 0 when absent)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return np.empty(0, dtype=np.int64)
        fp, i1, i2 = self._fp_and_buckets(arr)
        m1 = self.buckets[i1] == fp[:, None]
        m2 = self.buckets[i2] == fp[:, None]
        # self-partner fingerprints ((fp>>1) & mask == 0 ⇒ i2 == i1)
        # must not count their single bucket twice
        c2 = (self.counts[i2] * m2).sum(axis=1)
        out = ((self.counts[i1] * m1).sum(axis=1)
               + np.where(i1 != i2, c2, 0))
        if self.stash_fps.size:
            out = out + ((fp[:, None] == self.stash_fps[None, :])
                         * self.stash_counts[None, :]).sum(axis=1)
        return out

    def count(self, element: bytes | str) -> int:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return int(self.count_batch(pa.array([element], type=typ))[0])

    def lookup_batch(self, arr) -> np.ndarray:
        present = super().lookup_batch(arr)
        if self.stash_fps.size:
            fp, _, _ = self._fp_and_buckets(
                arr.combine_chunks() if isinstance(arr, pa.ChunkedArray)
                else arr)
            present = present | (fp[:, None]
                                 == self.stash_fps[None, :]).any(axis=1)
        return present

    def remove(self, element: bytes | str) -> bool:
        """Decrement one occurrence; the slot frees at zero."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        fp, i1, i2 = self._fp_and_buckets(pa.array([element], type=typ))
        f = int(fp[0])
        hit = np.flatnonzero(self.stash_fps == f)
        if hit.size:
            self.stash_counts[hit[0]] -= 1
            if self.total_insertions > 0:
                self.total_insertions -= 1
            if self.stash_counts[hit[0]] <= 0:
                keep = np.ones(self.stash_fps.size, dtype=bool)
                keep[hit[0]] = False
                self.stash_fps = self.stash_fps[keep]
                self.stash_counts = self.stash_counts[keep]
            return True
        for bucket in (int(i1[0]), int(i2[0])):
            hit = np.flatnonzero(self.buckets[bucket] == f)
            if hit.size:
                b = hit[0]
                self.counts[bucket, b] -= 1
                if self.bucket_insertions[bucket] > 0:
                    self.bucket_insertions[bucket] -= 1
                if self.total_insertions > 0:
                    self.total_insertions -= 1
                if self.counts[bucket, b] <= 0:
                    self.buckets[bucket, b] = 0
                    self.counts[bucket, b] = 0
                return True
        return False

    # -- algebra -------------------------------------------------------
    def merge(self, other: "CountingCuckooFilter") -> "CountingCuckooFilter":
        self._check_compatible(other)
        occ = np.argwhere(other.buckets != 0)
        for bucket, slot in occ:
            fp = int(other.buckets[bucket, slot])
            c = int(other.counts[bucket, slot])
            partner = int(self._partner(np.int64(bucket), np.uint16(fp)))
            if not self._add_count(fp, int(bucket), partner, c):
                raise SketchError(
                    "counting cuckoo merge failed: capacity exceeded")
        # foreign stash entries lost their home bucket pair (the file
        # retains only the fingerprint), so they go into OUR stash
        for fp, c in zip(other.stash_fps, other.stash_counts):
            if not self._stash_bump(int(fp), int(c)):
                if len(self.stash_fps) >= self.STASH_CAP:
                    raise SketchError(
                        "counting cuckoo merge failed: stash full")
                self.stash_fps = np.append(self.stash_fps, np.uint16(fp))
                self.stash_counts = np.append(self.stash_counts,
                                              np.int64(c))
            self.total_insertions += int(c)
        return self

    def finalize(self) -> dict:
        out = super().finalize()
        out["total_count"] = int(self.counts.sum()
                                 + self.stash_counts.sum())
        out["stash_entries"] = int(self.stash_fps.size)
        return out

    def _arrays(self):
        return [self.buckets, self.counts, self.bucket_insertions,
                self.stash_fps, self.stash_counts]

    def _set_arrays(self, arrays):
        (self.buckets, self.counts, self.bucket_insertions,
         self.stash_fps, self.stash_counts) = arrays


@register
class TimeDecayingCuckooFilter(CuckooFilter):
    MAGIC = b"!tdcucko"

    def __init__(self, num_buckets: int = 1024, bucket_size: int = 4,
                 timeout: int = 60, max_kicks: int = 500, seed: int = 42,
                 name: str = "DEFAULT"):
        if timeout <= 0:
            raise SketchError("timeout must be > 0")
        super().__init__(num_buckets, bucket_size, max_kicks, seed, name)
        self.timeout = int(timeout)
        self.timers = np.zeros((self.num_buckets, self.bucket_size),
                               dtype=np.int64)

    # -- internals -----------------------------------------------------
    def _stale_mask(self, bucket: int, now: int) -> np.ndarray:
        return ((self.buckets[bucket] != 0)
                & (now - self.timers[bucket] > self.timeout))

    def _place_td(self, bucket: int, fp: int, now: int) -> bool:
        """Claim an empty OR stale slot (lazy expiry reclamation)."""
        row = self.buckets[bucket]
        free = np.flatnonzero((row == 0) | self._stale_mask(bucket, now))
        if free.size:
            b = free[0]
            if row[b] != 0:                      # reclaiming a stale slot
                if self.bucket_insertions[bucket] > 0:
                    self.bucket_insertions[bucket] -= 1
                if self.total_insertions > 0:
                    self.total_insertions -= 1
            row[b] = fp
            self.timers[bucket, b] = now
            self.bucket_insertions[bucket] += 1
            self.total_insertions += 1
            return True
        return False

    def _add_td(self, fp: int, i1: int, i2: int, now: int) -> bool:
        for bucket in (i1, i2):                  # refresh if resident
            hit = np.flatnonzero(self.buckets[bucket] == fp)
            if hit.size:
                self.timers[bucket, hit[0]] = max(
                    int(self.timers[bucket, hit[0]]), now)
                return True
        if self._place_td(i1, fp, now) or self._place_td(i2, fp, now):
            return True
        index = i1 if (self._xorshift32() % 2) else i2
        ts = now
        for _ in range(self.max_kicks):
            b = self._xorshift32() % self.bucket_size
            efp = int(self.buckets[index, b])
            ets = int(self.timers[index, b])
            self.buckets[index, b] = fp
            self.timers[index, b] = ts
            fp, ts = efp, ets
            index = int(self._partner(np.int64(index), np.uint16(fp)))
            if self._place_td(index, fp, int(ts)):
                return True
        self.evictions += 1
        return False

    # -- update --------------------------------------------------------
    def update_arrow(self, arr, now=None) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return
        n = int(now) if now is not None else 0
        fp, i1, i2 = self._fp_and_buckets(arr)
        for j in range(len(fp)):
            self._add_td(int(fp[j]), int(i1[j]), int(i2[j]), n)

    def update_with_times(self, arr, secs) -> None:
        """(key, tick) bulk ingest — refresh-on-add keeps the max tick
        per resident fingerprint, so any ingest order yields the same
        freshness answers for pre-aggregated (key, max-tick) rows."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = np.asarray(secs, dtype=np.int64)
        if len(t) != len(arr):
            raise SketchError(
                f"update_with_times: {len(arr)} keys vs {len(t)} ticks")
        fp, i1, i2 = self._fp_and_buckets(arr)
        for j in range(len(fp)):
            self._add_td(int(fp[j]), int(i1[j]), int(i2[j]), int(t[j]))

    def add(self, element: bytes | str, now: int = 0) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        fp, i1, i2 = self._fp_and_buckets(pa.array([element], type=typ))
        return self._add_td(int(fp[0]), int(i1[0]), int(i2[0]), int(now))

    # -- queries -------------------------------------------------------
    def lookup_batch(self, arr, now=None) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return np.empty(0, dtype=bool)
        n = int(now) if now is not None else 0
        fp, i1, i2 = self._fp_and_buckets(arr)
        f1 = ((self.buckets[i1] == fp[:, None])
              & (n - self.timers[i1] <= self.timeout)).any(axis=1)
        f2 = ((self.buckets[i2] == fp[:, None])
              & (n - self.timers[i2] <= self.timeout)).any(axis=1)
        return f1 | f2

    def lookup(self, element: bytes | str, now=None) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_batch(pa.array([element], type=typ),
                                      now=now)[0])

    def clear_expired(self, now: int) -> int:
        """Eager sweep: free every stale slot; returns slots freed."""
        stale = (self.buckets != 0) & (now - self.timers > self.timeout)
        n = int(stale.sum())
        if n:
            per_bucket = stale.sum(axis=1)
            self.buckets[stale] = 0
            self.timers[stale] = 0
            self.bucket_insertions = np.maximum(
                self.bucket_insertions - per_bucket, 0)
            self.total_insertions = max(0, self.total_insertions - n)
        return n

    def count_expired(self, now: int) -> int:
        return int(((self.buckets != 0)
                    & (now - self.timers > self.timeout)).sum())

    # -- algebra -------------------------------------------------------
    def merge(self, other: "TimeDecayingCuckooFilter") -> "TimeDecayingCuckooFilter":
        """Re-insert the other's occupied entries at their own ticks
        (refresh-on-add keeps slot-max for shared fingerprints); both
        filters must share one clock."""
        self._check_compatible(other)
        occ = np.argwhere(other.buckets != 0)
        for bucket, slot in occ:
            fp = int(other.buckets[bucket, slot])
            ts = int(other.timers[bucket, slot])
            partner = int(self._partner(np.int64(bucket), np.uint16(fp)))
            if not self._add_td(fp, int(bucket), partner, ts):
                raise SketchError(
                    "time-decaying cuckoo merge failed: capacity exceeded")
        return self

    def finalize(self) -> dict:
        out = super().finalize()
        out["timeout"] = self.timeout
        return out

    def _meta(self) -> dict:
        out = super()._meta()
        out["timeout"] = self.timeout
        return out

    def _meta_compat(self) -> dict:
        # merging across DIFFERENT staleness windows silently re-judges
        # the other side's entries by this side's rule — refuse
        out = super()._meta_compat()
        out["timeout"] = self.timeout
        return out

    def _arrays(self):
        return [self.buckets, self.timers, self.bucket_insertions]

    def _set_arrays(self, arrays):
        self.buckets, self.timers, self.bucket_insertions = arrays

    @classmethod
    def _from_meta(cls, meta):
        obj = cls(meta["requested_buckets"], meta["bucket_size"],
                  meta.get("timeout", 60), meta["max_kicks"],
                  meta.get("seed", 42), meta.get("name", "DEFAULT"))
        obj.total_insertions = meta.get("total_insertions", 0)
        obj.evictions = meta.get("evictions", 0)
        obj._prng_state = np.uint32(meta.get("prng_state", obj.seed))
        return obj
