"""Quotient filter (RSQF layout) — deletable, MERGEABLE approximate
membership, completing the engine's AMQ quartet.

Engine extension rounding out the approximate-membership family the
reference anchors (Bloom — reference bloom.c; counting Bloom —
cbloom.c; cuckoo — cuckoo.c; xor — engine xorf.py): the quotient
filter (Bender et al., "Don't Thrash: How to Cache Your Hash on
Flash", VLDB'12) stores the top ``p = q + r`` bits of each key's hash
— a *fingerprint* — split into a q-bit quotient (home slot) and an
r-bit remainder, resolving collisions by shifting remainders into
runs.  The rank-and-select variant (RSQF — Pandey, Bender, Johnson &
Patro, "A General-Purpose Counting Filter: Making Every Bit Count",
SIGMOD'17 §3) keeps 2 metadata bits per slot: ``occupieds`` (some key
has this quotient) and ``runends`` (slot ends a run), with the i-th
set runend pairing with the i-th set occupied — which makes the whole
physical layout a *deterministic function of the fingerprint set*:

    run j (j-th occupied quotient q_j, c_j remainders) starts at
        s_j = max(q_j, s_{j-1} + c_{j-1})
    ⇒ with P_j = Σ_{i<j} c_i,  s_j = P_j + cummax_j(q_j − P_j)

so construction AND decode are closed-form vectorizable — no per-key
shifting loop.  This implementation keeps the logical state as the
sorted fingerprint set (what the bit layout encodes) for O(log)
batched searchsorted lookups; ``to_layout``/``from_layout``
materialize / parse the canonical RSQF bit-packed layout.

Serialization picks the SMALLER of two encodings per state (the
HLL++ sparse/dense precedent, hll.py SparseHLL): a sparse form (the
raw sorted fingerprints, 8 B/key — what a 64k-row build partial
ships) and the dense packed layout ((r+2)/8 B/slot — what a
capacity-loaded small-r filter saves to disk); both round-trip and
the choice is recorded in the header metadata.

Properties (all published; tests gate at these bounds, never tighter):
* no false negatives for resident keys; deletes are exact on
  fingerprints (a delete removes membership for every key sharing the
  fingerprint — callers that delete size p so n²·2^{-p} is negligible,
  mirroring the reference cuckoo caveat, cuckoo.c:169-187).
* false-positive probability for one absent key ≤ n·2^{-p}
  = α·2^{-r} with load α = n/2^q (VLDB'12 §3).
* merge = fingerprint-set union — associative, order-insensitive, and
  *exactly* equal to a single-pass build (the QF papers' merge-by-
  merge-sort); capacity 2^q slots, overflow raises (callers size q).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_128_batch
from .base import Sketch, SketchError, register


def _rem_dtype(r: int):
    if r <= 8:
        return np.uint8
    if r <= 16:
        return np.uint16
    if r <= 32:
        return np.uint32
    return np.uint64


@register
class QuotientFilter(Sketch):
    MAGIC = b"!rsqfilt"

    def __init__(self, capacity: int = 1024, fpr: float = 0.01,
                 name: str = "DEFAULT"):
        if capacity < 1:
            raise SketchError("capacity must be >= 1")
        if not (0.0 < fpr < 1.0):
            raise SketchError("fpr must be in (0, 1)")
        # slots for `capacity` keys at <= 95% load (QF probe cost and
        # the shifting analysis degrade past that — VLDB'12 §4)
        self.q = max(1, int(np.ceil(np.log2(max(capacity, 2) / 0.95))))
        # fpr ~ alpha * 2^-r <= 2^-r  ⇒  r = ceil(log2(1/fpr))
        self.r = int(np.ceil(np.log2(1.0 / fpr)))
        if self.q + self.r > 64:
            self.r = 64 - self.q
        if self.r < 1:
            raise SketchError(f"q={self.q} leaves no remainder bits")
        self.name = name
        # sorted unique p-bit fingerprints — the logical content the
        # RSQF bit layout encodes (see module docstring)
        self.fps = np.empty(0, dtype=np.uint64)

    # -- derived parameters -------------------------------------------
    @property
    def p(self) -> int:
        return self.q + self.r

    @property
    def num_slots(self) -> int:
        return 1 << self.q

    def load_factor(self) -> float:
        return self.fps.size / self.num_slots

    def false_positive_bound(self) -> float:
        """P[one absent key reads present] ≤ n·2^{-p} (VLDB'12 §3)."""
        return min(1.0, self.fps.size * 2.0 ** (-self.p))

    # -- update --------------------------------------------------------
    def _fingerprints(self, arr) -> np.ndarray:
        h1, h2 = mmh3_128_batch(arr)
        return (h1 ^ h2).astype(np.uint64) >> np.uint64(64 - self.p)

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Hash-once build path (pipelines/build.py dispatches here so
        a multi-sketch scan hashes each column once); fingerprint =
        top p bits of mmh3_64 = h1^h2 — identical to update_arrow."""
        fp = (h1.astype(np.uint64) ^ h2.astype(np.uint64)) \
            >> np.uint64(64 - self.p)
        self._absorb(fp)

    def update_arrow(self, arr) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return
        self._absorb(self._fingerprints(arr))

    def update_weighted(self, arr, counts) -> None:
        """Multiplicity is irrelevant to set membership."""
        self.update_arrow(arr)

    def _absorb(self, fp: np.ndarray) -> None:
        merged = np.union1d(self.fps, fp)
        if merged.size > self.num_slots:
            raise SketchError(
                f"quotient filter overflow: {merged.size} fingerprints "
                f"> 2^q = {self.num_slots} slots — size capacity up")
        self.fps = merged

    # -- hash-level public API (the pipelines/CLI contract) ------------
    # Mirrors XorFilter.contains_hashes: sharded builds/probes route by
    # PRECOMPUTED p-bit fingerprints (top p bits of h1^h2 — see
    # _fingerprints), so they need fingerprint-level entry points that
    # are a stable contract, not internals.
    def absorb_fps(self, fp: np.ndarray) -> None:
        """Ingest precomputed p-bit fingerprints (sharded-build path)."""
        self._absorb(np.asarray(fp, dtype=np.uint64))

    def member_fps(self, fp: np.ndarray) -> np.ndarray:
        """Membership over precomputed p-bit fingerprints."""
        return self._member(np.asarray(fp, dtype=np.uint64))

    # -- queries -------------------------------------------------------
    def _member(self, fp: np.ndarray) -> np.ndarray:
        if self.fps.size == 0:
            return np.zeros(fp.size, dtype=bool)
        idx = np.searchsorted(self.fps, fp)
        hit = idx < self.fps.size
        out = np.zeros(fp.size, dtype=bool)
        out[hit] = self.fps[idx[hit]] == fp[hit]
        return out

    def lookup_batch(self, arr) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        return self._member(self._fingerprints(arr))

    def lookup(self, element: bytes | str) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_batch(pa.array([element], type=typ))[0])

    def remove_batch(self, arr) -> np.ndarray:
        """Exact fingerprint delete; returns per-input removed flags.
        Deleting clears membership for every key sharing the
        fingerprint (size p accordingly — module docstring)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fingerprints(arr)
        present = self._member(fp)
        if present.any():
            self.fps = np.setdiff1d(self.fps, fp, assume_unique=False)
        return present

    def remove(self, element: bytes | str) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.remove_batch(pa.array([element], type=typ))[0])

    # -- algebra -------------------------------------------------------
    def merge(self, other: "QuotientFilter") -> "QuotientFilter":
        self._check_compatible(other)
        self._absorb(other.fps)
        return self

    def difference(self, other: "QuotientFilter") -> "QuotientFilter":
        """Batch delete as fingerprint-set subtraction: removing every
        key of ``other`` equals ``remove_batch`` over them one by one
        (both clear exactly the shared fingerprints), so a distributed
        delete is two tree-merged builds and one subtraction — no key
        ever returns to the driver."""
        self._check_compatible(other)
        self.fps = np.setdiff1d(self.fps, other.fps, assume_unique=True)
        return self

    def _meta_compat(self) -> dict:
        return {"q": self.q, "r": self.r}

    def finalize(self) -> dict:
        return {"q": self.q, "r": self.r, "n": int(self.fps.size),
                "load_factor": self.load_factor(),
                "fp_bound": self.false_positive_bound()}

    # -- canonical RSQF layout ----------------------------------------
    def _layout_full(self):
        """(occupieds, runends, remainders, slots): the canonical RSQF
        slot layout plus the physical slot of element i in fingerprint
        order — computed ONCE (serde reuses slots for aligned payloads
        such as the counting variant's counters)."""
        rmask = (np.uint64(1) << np.uint64(self.r)) - np.uint64(1)
        quot = (self.fps >> np.uint64(self.r)).astype(np.int64)
        rem = (self.fps & rmask).astype(_rem_dtype(self.r))
        uq, counts = np.unique(quot, return_counts=True)
        if uq.size == 0:
            nslots = self.num_slots
            z = np.zeros(nslots, dtype=bool)
            return (z, z.copy(), np.zeros(nslots, dtype=_rem_dtype(self.r)),
                    np.empty(0, dtype=np.int64))
        prefix = np.zeros(uq.size, dtype=np.int64)
        np.cumsum(counts[:-1], out=prefix[1:])
        # s_j = P_j + cummax(q_j − P_j)  ⇔  s_j = max(q_j, s_{j-1}+c_{j-1})
        starts = prefix + np.maximum.accumulate(uq - prefix)
        ends = starts + counts - 1
        nslots = max(self.num_slots, int(ends[-1]) + 1)
        occupieds = np.zeros(nslots, dtype=bool)
        occupieds[uq] = True
        runends = np.zeros(nslots, dtype=bool)
        runends[ends] = True
        # slot of element i (run-major order) — strictly increasing
        slots = (np.repeat(starts, counts)
                 + np.arange(self.fps.size, dtype=np.int64)
                 - np.repeat(prefix, counts))
        remainders = np.zeros(nslots, dtype=_rem_dtype(self.r))
        remainders[slots] = rem
        return occupieds, runends, remainders, slots

    def to_layout(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Materialize the canonical RSQF slot layout (SIGMOD'17 §3):
        ``(occupieds, runends, remainders)`` — two bool vectors over
        the physical slots plus the dense remainder array (narrow
        dtype, 0 in unused slots).  Runs may shift past slot 2^q−1
        into a right overflow region (non-wrapping variant); physical
        length is max(2^q, last run end + 1)."""
        occupieds, runends, remainders, _ = self._layout_full()
        return occupieds, runends, remainders

    @classmethod
    def _decode_layout(cls, q: int, r: int, occupieds: np.ndarray,
                       runends: np.ndarray,
                       remainders: np.ndarray) -> np.ndarray:
        """Inverse of ``to_layout``: the i-th set occupied bit pairs
        with the i-th set runend (the RSQF rank/select invariant), and
        s_j = max(q_j, e_{j-1}+1) recovers run starts without a scan."""
        occ_q = np.flatnonzero(occupieds)
        ends = np.flatnonzero(runends)
        if occ_q.size != ends.size:
            raise SketchError("corrupt RSQF layout: |occupieds| != |runends|")
        if occ_q.size == 0:
            return np.empty(0, dtype=np.uint64)
        starts = np.maximum(occ_q, np.concatenate(([0], ends[:-1] + 1)))
        counts = ends - starts + 1
        if (counts < 1).any():
            raise SketchError("corrupt RSQF layout: non-positive run length")
        prefix = np.zeros(occ_q.size, dtype=np.int64)
        np.cumsum(counts[:-1], out=prefix[1:])
        slots = (np.repeat(starts, counts)
                 + np.arange(int(counts.sum()), dtype=np.int64)
                 - np.repeat(prefix, counts))
        quots = np.repeat(occ_q, counts).astype(np.uint64)
        # run-major SLOT order — our encoder emits within-run
        # remainders sorted, but a foreign RSQF layout need not;
        # callers (from_layout/_set_arrays) restore the sorted-unique
        # invariant searchsorted depends on
        return (quots << np.uint64(r)) | remainders[slots].astype(np.uint64)

    @classmethod
    def from_layout(cls, q: int, r: int, occupieds: np.ndarray,
                    runends: np.ndarray, remainders: np.ndarray,
                    name: str = "DEFAULT") -> "QuotientFilter":
        obj = cls.__new__(cls)
        obj.q, obj.r, obj.name = int(q), int(r), name
        # sorted-unique restore: a foreign layout may order a run's
        # remainders arbitrarily (and may store duplicates — set
        # semantics unions them); without this, searchsorted lookups
        # silently lose residents
        obj.fps = np.unique(
            cls._decode_layout(q, r, occupieds, runends, remainders))
        if obj.fps.size > (1 << obj.q):
            raise SketchError("corrupt RSQF layout: more runs than slots")
        return obj

    # -- serialization: smaller of sparse fps / packed layout ---------
    def _wire_format(self) -> str:
        """'fps' (8 B/key — sparse partials) vs 'layout'
        ((r+2)/8 B/slot — capacity-loaded small-r filters); the
        estimate uses 2^q slots (the overflow extent adds at most a
        cluster), deterministic from state so ``_meta``/``_arrays``
        agree."""
        fps_bytes = 8 * self.fps.size
        layout_bytes = (self.num_slots * np.dtype(_rem_dtype(self.r)).itemsize
                        + 2 * ((self.num_slots + 7) // 8))
        return "fps" if fps_bytes <= layout_bytes else "layout"

    def _meta(self) -> dict:
        return {"q": self.q, "r": self.r, "name": self.name,
                "fmt": self._wire_format()}

    def _arrays(self) -> list[np.ndarray]:
        if self._wire_format() == "fps":
            return [self.fps]
        occupieds, runends, remainders, _ = self._layout_full()
        return [np.packbits(occupieds), np.packbits(runends), remainders,
                np.array([occupieds.size], dtype=np.int64)]

    def _set_arrays(self, arrays) -> None:
        if self._fmt == "fps":
            self.fps = arrays[0].astype(np.uint64, copy=True)
            return
        occ_b, run_b, remainders, nslots_a = arrays
        nslots = int(nslots_a[0])
        occupieds = np.unpackbits(occ_b, count=nslots).astype(bool)
        runends = np.unpackbits(run_b, count=nslots).astype(bool)
        self.fps = np.unique(self._decode_layout(
            self.q, self.r, occupieds, runends, remainders))

    @classmethod
    def _from_meta(cls, meta) -> "QuotientFilter":
        obj = cls.__new__(cls)
        obj.q = int(meta["q"])
        obj.r = int(meta["r"])
        obj.name = meta.get("name", "DEFAULT")
        obj._fmt = meta.get("fmt", "fps")
        obj.fps = np.empty(0, dtype=np.uint64)
        return obj


@register
class CountingQuotientFilter(QuotientFilter):
    """Counting quotient filter — the RSQF paper's headline structure
    (Pandey et al. SIGMOD'17 §3.2: "A General-Purpose COUNTING
    Filter").  Each resident fingerprint carries an exact integer
    count; unlike the counting Bloom's min-over-k reading (an upper
    bound, reference cbloom.c:88-99) the CQF count is EXACT per
    fingerprint — the only error source is a fingerprint collision
    between distinct keys (prob ≤ n²·2^{-p-1}), so callers that need
    key-exact counts size p up and get a strict-equality contract.

    * update pre-aggregates each batch (Arrow ``value_counts``) then
      accumulates (fingerprint, count) pairs in pure int64 (no float
      path — the exactness contract holds past 2^53); counts ADD, so
      merge is associative/commutative and the distributed tree merge
      is identical to a single-pass build.
    * ``remove_batch`` decrements (guarded: absent keys are no-ops,
      counts clamp at 0 and the fingerprint leaves the filter — the
      cbloom guarded-remove semantics, cbloom.c:134-158).
    * serialization: sparse form [fps, counts] or packed RSQF layout
      + counters aligned to fingerprint order — the engine's portable
      stand-in for the paper's in-slot escape-sequence count encoding
      (which trades portability for bits; documented deviation).
    """

    MAGIC = b"!rscqflt"

    def __init__(self, capacity: int = 1024, fpr: float = 0.01,
                 name: str = "DEFAULT"):
        super().__init__(capacity, fpr, name)
        self.counts = np.empty(0, dtype=np.int64)

    # -- update --------------------------------------------------------
    def _absorb(self, fp: np.ndarray, cnt: np.ndarray | None = None) -> None:
        if cnt is None:
            # raw fingerprint stream: multiplicities within the batch
            fp, cnt = np.unique(fp, return_counts=True)
        merged, inverse = np.unique(np.concatenate([self.fps, fp]),
                                    return_inverse=True)
        if merged.size > self.num_slots:
            raise SketchError(
                f"quotient filter overflow: {merged.size} fingerprints "
                f"> 2^q = {self.num_slots} slots — size capacity up")
        # integer accumulation end-to-end (bincount's float64 weights
        # would round counts past 2^53)
        acc = np.zeros(merged.size, dtype=np.int64)
        np.add.at(acc, inverse, np.concatenate([self.counts,
                                                cnt.astype(np.int64)]))
        self.fps = merged
        self.counts = acc

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        fp = (h1.astype(np.uint64) ^ h2.astype(np.uint64)) \
            >> np.uint64(64 - self.p)
        self._absorb(fp)

    def update_arrow(self, arr) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return
        # batch pre-aggregation: one hash per DISTINCT value; _absorb
        # re-aggregates the rare two-values-one-fingerprint case
        vc = arr.value_counts()
        self._absorb(self._fingerprints(vc.field("values")),
                     np.asarray(vc.field("counts"), dtype=np.int64))

    def update_weighted(self, arr, counts) -> None:
        """(key, count) bulk update — the grouped count-row build path."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        cnt = np.asarray(counts, dtype=np.int64)
        if len(cnt) != len(arr):
            raise SketchError(
                f"update_weighted: {len(arr)} keys vs {len(cnt)} counts")
        if len(arr) == 0:
            return
        if (cnt <= 0).any():
            raise SketchError("update_weighted: counts must be > 0")
        self._absorb(self._fingerprints(arr), cnt)

    # -- hash-level public API (the pipelines/CLI contract) ------------
    def absorb_fps(self, fp: np.ndarray,
                   counts: np.ndarray | None = None) -> None:
        """Ingest precomputed p-bit fingerprints with optional
        multiplicities (sharded-build path; counts default to raw
        stream multiplicity)."""
        self._absorb(np.asarray(fp, dtype=np.uint64),
                     None if counts is None
                     else np.asarray(counts, dtype=np.int64))

    def count_fps(self, fp: np.ndarray) -> np.ndarray:
        """Exact counts over precomputed p-bit fingerprints (0 where
        absent)."""
        return self._count_fp(np.asarray(fp, dtype=np.uint64))

    # -- queries -------------------------------------------------------
    def _count_fp(self, fp: np.ndarray) -> np.ndarray:
        out = np.zeros(fp.size, dtype=np.int64)
        if self.fps.size:
            idx = np.searchsorted(self.fps, fp)
            hit = idx < self.fps.size
            hit[hit] &= self.fps[idx[hit]] == fp[hit]
            out[hit] = self.counts[idx[hit]]
        return out

    def count_batch(self, arr) -> np.ndarray:
        """Exact-per-fingerprint counts (0 for absent keys)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return np.zeros(0, dtype=np.int64)
        return self._count_fp(self._fingerprints(arr))

    def count(self, element: bytes | str) -> int:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return int(self.count_batch(pa.array([element], type=typ))[0])

    def total(self) -> int:
        return int(self.counts.sum())

    def remove_batch(self, arr) -> np.ndarray:
        """Guarded decrement-by-multiplicity: each input occurrence
        subtracts 1 where the fingerprint is resident; fingerprints
        reaching 0 leave the filter.  Returns per-input present flags
        (pre-decrement)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fingerprints(arr)
        present = self._member(fp)
        if present.any():
            hfp, dec = np.unique(fp[present], return_counts=True)
            idx = np.searchsorted(self.fps, hfp)
            self.counts[idx] = np.maximum(self.counts[idx] - dec, 0)
            keep = self.counts > 0
            if not keep.all():
                self.fps = self.fps[keep]
                self.counts = self.counts[keep]
        return present

    # -- algebra -------------------------------------------------------
    def merge(self, other: "CountingQuotientFilter") -> "CountingQuotientFilter":
        self._check_compatible(other)
        self._absorb(other.fps, other.counts)
        return self

    def difference(self, other):
        raise SketchError("counting QF: use remove_batch (guarded "
                          "decrement), not set difference")

    def finalize(self) -> dict:
        out = super().finalize()
        out["total"] = self.total()
        return out

    # -- canonical layout (counts ride in fingerprint order) ----------
    @classmethod
    def from_layout(cls, q: int, r: int, occupieds: np.ndarray,
                    runends: np.ndarray, remainders: np.ndarray,
                    counts: np.ndarray | None = None,
                    name: str = "DEFAULT") -> "CountingQuotientFilter":
        """``counts`` aligns with the decoded fingerprint order (the
        run-major slot order); a membership-only layout cannot
        reconstruct them, so omitting it raises."""
        if counts is None:
            raise SketchError("counting QF from_layout needs the aligned "
                              "counts array (layout alone has no counts)")
        decoded = cls._decode_layout(q, r, occupieds, runends, remainders)
        cnt = np.asarray(counts, dtype=np.int64)
        if cnt.size != decoded.size:
            raise SketchError(
                f"counts misaligned: {cnt.size} != {decoded.size} fingerprints")
        if (cnt <= 0).any():
            raise SketchError("counts must be > 0")
        obj = cls.__new__(cls)
        obj.q, obj.r, obj.name = int(q), int(r), name
        # restore sorted-unique with counts following the permutation
        # (foreign layouts may order runs arbitrarily / hold duplicate
        # fingerprints — counts of duplicates merge-ADD)
        obj.fps, obj.counts = cls._sorted_aligned(decoded, cnt)
        if obj.fps.size > (1 << obj.q):
            raise SketchError("corrupt RSQF layout: more runs than slots")
        return obj

    @staticmethod
    def _sorted_aligned(fps_raw: np.ndarray,
                        cnt: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ufp, inverse = np.unique(fps_raw, return_inverse=True)
        acc = np.zeros(ufp.size, dtype=np.int64)
        np.add.at(acc, inverse, cnt)
        return ufp, acc

    # -- serialization -------------------------------------------------
    def _arrays(self) -> list[np.ndarray]:
        if self._wire_format() == "fps":
            return [self.fps, self.counts]
        occupieds, runends, remainders, _ = self._layout_full()
        return [np.packbits(occupieds), np.packbits(runends), remainders,
                self.counts, np.array([occupieds.size], dtype=np.int64)]

    def _set_arrays(self, arrays) -> None:
        if self._fmt == "fps":
            self.fps = arrays[0].astype(np.uint64, copy=True)
            self.counts = arrays[1].astype(np.int64, copy=True)
            return
        occ_b, run_b, remainders, counts, nslots_a = arrays
        nslots = int(nslots_a[0])
        occupieds = np.unpackbits(occ_b, count=nslots).astype(bool)
        runends = np.unpackbits(run_b, count=nslots).astype(bool)
        decoded = self._decode_layout(self.q, self.r, occupieds, runends,
                                      remainders)
        self.fps, self.counts = self._sorted_aligned(
            decoded, counts.astype(np.int64))

    @classmethod
    def _from_meta(cls, meta) -> "CountingQuotientFilter":
        obj = super()._from_meta(meta)
        obj.counts = np.empty(0, dtype=np.int64)
        return obj
