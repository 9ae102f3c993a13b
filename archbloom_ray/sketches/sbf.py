"""Scalable Bloom filter — unknown-``n`` membership, mergeable by
stage concatenation.

Almeida, Baquero, Preguiça, Hutchison, "Scalable Bloom Filters",
Information Processing Letters 101(6), 2007: a chain of plain Bloom
stages with geometrically growing capacity (``n_i = n0·s^i``) and
geometrically tightening error (``p_i = p0·r^i``), so the compound
false-positive bound converges to ``p0/(1−r)`` no matter how many
stages the stream forces.  The reference engine has no unknown-``n``
structure — ``bloom_init`` demands ``expected`` up front (reference
bloom.c:37-39) and silently degrades past it; this is the engine-added
scale path for ingest whose cardinality nobody can pre-declare.

Distributed semantics: ``merge`` CONCATENATES stage lists.  Lookup is
an OR over stages, so the union keeps the no-false-negative guarantee
and the compound bound becomes the SUM of the components' bounds
(documented union bound — size the per-partial ``p0`` accordingly, or
probe-verify like the tests do).  Concatenation is associative and
order-stable, so tree merges of per-batch partials are deterministic.

Each stage is an engine :class:`BloomFilter` (reference sizing quirks
and all), so every per-batch update stays the same vectorized
``np.bitwise_or.at`` path and the hash pair is computed ONCE per batch
and reused across stages (different ``m``/``k`` per stage re-derive
positions from the same 128-bit pair — no re-hash).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import make_hashes_batch, mmh3_128_batch
from .base import Sketch, SketchError, register
from .bloom import BloomFilter


def _stage_filter(expected: int, accuracy: float) -> BloomFilter:
    f = BloomFilter(max(int(expected), 1), float(accuracy))
    return f


@register
class ScalableBloomFilter(Sketch):
    """Growing chain of Bloom stages; see module docstring.

    Parameters
    ----------
    initial_capacity : first stage's expected element count (``n0``).
    accuracy : first stage's error target (``p0``); the compound bound
        of a single-writer build is ``p0 / (1 - tightening)``.
    growth : capacity multiplier per stage (``s``, paper default 2).
    tightening : error multiplier per stage (``r``, paper's 0.8-0.9
        sweet spot; default 0.9).
    """

    MAGIC = b"!sbloom!"
    # dedup-on-add makes the update multiplicity-blind: feeding the
    # distinct values of a batch is identical to feeding every row.
    SET_SEMANTICS = True

    def __init__(self, initial_capacity: int = 4096, accuracy: float = 0.01,
                 growth: int = 2, tightening: float = 0.9,
                 name: str = "DEFAULT"):
        if initial_capacity <= 0:
            raise SketchError("initial_capacity must be > 0")
        if not (0.0 < accuracy < 1.0):
            raise SketchError("accuracy must be in (0, 1)")
        if growth < 2:
            raise SketchError("growth must be >= 2")
        if not (0.0 < tightening < 1.0):
            raise SketchError("tightening must be in (0, 1)")
        self.initial_capacity = int(initial_capacity)
        self.accuracy = float(accuracy)
        self.growth = int(growth)
        self.tightening = float(tightening)
        self.name = name
        # parallel per-stage state (stage params survive merges, so
        # they are stored per stage, not re-derived from the index)
        self.stages: list[BloomFilter] = []
        self.stage_capacity: list[int] = []
        self.stage_items: list[int] = []

    # -- growth --------------------------------------------------------
    def _append_stage(self) -> None:
        i = len(self.stages)
        cap = self.initial_capacity * self.growth ** i
        acc = self.accuracy * self.tightening ** i
        self.stages.append(_stage_filter(cap, acc))
        self.stage_capacity.append(int(cap))
        self.stage_items.append(0)

    # -- lookup over the chain ------------------------------------------
    def _lookup_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        present = np.zeros(h1.size, dtype=bool)
        for st in self.stages:
            rest = ~present
            if not rest.any():
                break
            pos = st._positions_from_hashes(h1[rest], h2[rest])
            bits = (st.bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
            present[rest] = bits.all(axis=0)
        return present

    def lookup_batch(self, arr) -> np.ndarray:
        """Bool per element: present in ANY stage (no false negatives)."""
        if len(arr) == 0:
            return np.empty(0, dtype=bool)
        h1, h2 = mmh3_128_batch(arr)
        return self._lookup_hashes(h1, h2)

    def lookup(self, element: bytes | str) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_batch(pa.array([element], type=typ))[0])

    # -- update ---------------------------------------------------------
    def update_arrow(self, arr) -> None:
        """Vectorized add: hash once, skip already-present elements
        (paper §3: adds go through a membership check so duplicates
        never inflate the fill counts), then pack the novel elements
        into the active stage, growing stages as their declared
        capacity fills — a stage never takes more items than its
        ``expected``, so each stage's FPR stays at its design point."""
        if len(arr) == 0:
            return
        h1, h2 = mmh3_128_batch(arr)
        self.update_hashes(h1, h2)

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Add from precomputed ``mmh3_128`` pairs — the sharded build
        path shuffles (h1, h2) and feeds each shard's reducer here, so
        keys are hashed exactly once engine-wide."""
        if h1.size == 0:
            return
        # intra-batch dedup on the 128-bit pair (same pair ⇒ same bits)
        _, first_idx = np.unique(np.stack([h1, h2]), axis=1,
                                 return_index=True)
        h1, h2 = h1[np.sort(first_idx)], h2[np.sort(first_idx)]
        novel = ~self._lookup_hashes(h1, h2)
        h1, h2 = h1[novel], h2[novel]
        off = 0
        while off < h1.size:
            if not self.stages or \
                    self.stage_items[-1] >= self.stage_capacity[-1]:
                self._append_stage()
            room = self.stage_capacity[-1] - self.stage_items[-1]
            take = min(room, h1.size - off)
            self.stages[-1].update_hashes(h1[off:off + take],
                                          h2[off:off + take])
            self.stage_items[-1] += int(take)
            off += take

    # -- statistics -------------------------------------------------------
    @property
    def n_stages(self) -> int:
        return len(self.stages)

    def items_added(self) -> int:
        """Distinct-as-observed element count (exact up to hash ties)."""
        return int(sum(self.stage_items))

    def size_bits(self) -> int:
        return int(sum(st.size for st in self.stages))

    def error_bound(self) -> float:
        """Deterministic union bound: Σ stage design errors.  For a
        single-writer build this telescopes to ≤ p0/(1−r); after an
        N-way merge it is the sum of the parts' bounds."""
        return float(min(1.0, sum(st.accuracy for st in self.stages)))

    def estimate_false_positive_rate(self) -> float:
        """Compound fill-based estimate: 1 − Π(1 − stage est FPR)."""
        miss = 1.0
        for st in self.stages:
            miss *= 1.0 - st.estimate_false_positive_rate()
        return float(1.0 - miss)

    def saturation(self) -> float:
        """Worst stage saturation %, the growth-pressure signal."""
        return max((st.saturation() for st in self.stages), default=0.0)

    def clear(self) -> None:
        self.stages.clear()
        self.stage_capacity.clear()
        self.stage_items.clear()

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "ScalableBloomFilter") -> "ScalableBloomFilter":
        """Union by stage-list concatenation (associative; lookup ORs
        across all stages).  Compound bound adds — see module doc."""
        self._check_compatible(other)
        for st in other.stages:
            self.stages.append(st.copy())
        self.stage_capacity.extend(other.stage_capacity)
        self.stage_items.extend(other.stage_items)
        return self

    def _meta_compat(self) -> dict:
        # stages legitimately differ between merge operands; only the
        # growth policy must agree.
        return {
            "initial_capacity": self.initial_capacity,
            "accuracy": self.accuracy,
            "growth": self.growth,
            "tightening": self.tightening,
        }

    def finalize(self) -> dict:
        return {
            "n_stages": self.n_stages,
            "items_added": self.items_added(),
            "size_bits": self.size_bits(),
            "error_bound": self.error_bound(),
            "est_fpr": self.estimate_false_positive_rate(),
        }

    # -- ser/de -------------------------------------------------------
    def _meta(self) -> dict:
        return {
            "initial_capacity": self.initial_capacity,
            "accuracy": self.accuracy,
            "growth": self.growth,
            "tightening": self.tightening,
            "name": self.name,
            # per-stage geometry (authoritative — merges break the
            # geometric recurrence, so stages don't re-derive from i)
            "stage_expected": [st.expected for st in self.stages],
            "stage_accuracy": [st.accuracy for st in self.stages],
            "stage_capacity": self.stage_capacity,
            "stage_items": self.stage_items,
        }

    def _arrays(self) -> list[np.ndarray]:
        return [st.bitmap for st in self.stages]

    def _set_arrays(self, arrays) -> None:
        if len(arrays) != len(self.stages):
            raise SketchError("scalable bloom: stage/bitmap count mismatch")
        for st, a in zip(self.stages, arrays):
            if a.shape != st.bitmap.shape:
                raise SketchError("scalable bloom: stage bitmap shape mismatch")
            st.bitmap = a

    @classmethod
    def _from_meta(cls, meta) -> "ScalableBloomFilter":
        obj = cls(meta["initial_capacity"], meta["accuracy"],
                  meta["growth"], meta["tightening"],
                  meta.get("name", "DEFAULT"))
        for exp, acc in zip(meta["stage_expected"], meta["stage_accuracy"]):
            obj.stages.append(_stage_filter(exp, acc))
        obj.stage_capacity = [int(c) for c in meta["stage_capacity"]]
        obj.stage_items = [int(c) for c in meta["stage_items"]]
        return obj
