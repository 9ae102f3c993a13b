"""HyperLogLog — distinct counting as a mergeable UDAF.

Engine extension required by the north rule (absent from the reference
C library — its README lists HLL as not implemented, reference
README.md:80-104).  Implemented from the published algorithm (Flajolet
et al. 2007; small-range linear-counting correction per the HLL++
practice), sharing the engine's canonical key hash ``mmh3_128(key,
seed=0).h1`` so every sketch family hashes each key once.

Contract: relative standard error ≤ 1.04/√m for m = 2^p registers;
merge = element-wise register max (associative + commutative → exact
under the distributed tree merge).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..hashing import mmh3_128_batch
from .base import Sketch, SketchError, register


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _clz64(v: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (integer-only binary
    search; no float precision traps)."""
    v = v.copy()
    n = np.full(v.shape, 64, dtype=np.int64)
    for width in (32, 16, 8, 4, 2, 1):
        w = np.uint64(width)
        mask = (v >> w) != 0
        n = np.where(mask, n - width, n)
        v = np.where(mask, v >> w, v)
    # v now ∈ {0, 1}; if original was 0, n stays 64
    n = np.where(v != 0, n - 1, n)
    return n


@register
class HyperLogLog(Sketch):
    MAGIC = b"!hyperll"

    def __init__(self, precision: int = 14, name: str = "DEFAULT"):
        if not (4 <= precision <= 18):
            raise SketchError("precision must be in [4, 18]")
        self.precision = int(precision)
        self.m = 1 << precision
        self.name = name
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_arrow(self, arr) -> None:
        if len(arr) == 0:
            return
        h1, h2 = mmh3_128_batch(arr)
        self.update_hashes(h1, h2)

    def update_weighted(self, arr, counts) -> None:
        """Count-weighted update: multiplicity is irrelevant to a
        distinct counter, so this is ``update_arrow`` on the values —
        it lets the grouped count-row build path
        (``build_grouped_value_sketches``) drive HLLs too."""
        self.update_arrow(arr)

    def update_hashes(self, h1, h2=None) -> None:
        """Update from precomputed ``mmh3_128`` pairs (h2 unused) — lets
        a multi-sketch build hash each column ONCE per batch."""
        p = self.precision
        idx = (h1 >> np.uint64(64 - p)).astype(np.int64)
        w = h1 << np.uint64(p)  # remaining 64-p bits, left-aligned
        rho = np.minimum(_clz64(w), 64 - p).astype(np.int64) + 1
        np.maximum.at(self.registers, idx, rho.astype(np.uint8))

    def cardinality(self) -> float:
        """Bias-corrected estimate with small-range linear counting."""
        m = self.m
        regs = self.registers.astype(np.float64)
        raw = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros > 0:
            return m * math.log(m / zeros)
        return float(raw)

    def relative_error_bound(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        self._check_compatible(other)
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def union_cardinality(self, other: "HyperLogLog") -> float:
        """|A ∪ B| from register maxima WITHOUT mutating either side."""
        self._check_compatible(other)
        u = HyperLogLog(self.precision)
        np.maximum(self.registers, other.registers, out=u.registers)
        return u.cardinality()

    def intersection_estimate(self, other: "HyperLogLog") -> float:
        """|A ∩ B| by inclusion–exclusion (|A| + |B| − |A ∪ B|) —
        the standard HLL intersection; its absolute error compounds the
        three terms' errors, so the usable tolerance is
        ``rel_err · (|A| + |B| + |A∪B|)``, NOT the single-sketch bound.
        Floors at 0 (the raw difference can dip negative for tiny or
        disjoint intersections)."""
        est = (self.cardinality() + other.cardinality()
               - self.union_cardinality(other))
        return max(est, 0.0)

    def intersection_error_bound(self, other: "HyperLogLog") -> float:
        """Heuristic tolerance for :meth:`intersection_estimate`."""
        return self.relative_error_bound() * (
            self.cardinality() + other.cardinality()
            + self.union_cardinality(other))

    def finalize(self) -> float:
        return self.cardinality()

    def _meta(self) -> dict:
        return {"precision": self.precision, "name": self.name}

    def _arrays(self):
        return [self.registers]

    def _set_arrays(self, arrays):
        (self.registers,) = arrays

    @classmethod
    def _from_meta(cls, meta):
        return cls(meta["precision"], meta.get("name", "DEFAULT"))


@register
class SparseHLL(Sketch):
    """HLL with the HLL++ SPARSE representation (Heule, Nunkesser &
    Hall, EDBT'13 §5.3): below ~m/4 distinct keys the sketch stores
    sorted packed ``(register_index << 6 | rho)`` uint32 pairs instead
    of the dense 2^p byte register file, and densifies automatically
    past the break-even point.

    Why it exists: a grouped distinct count over 10^8 web domains with
    dense p=14 registers materializes 1.6 TB of sketch state, though
    most domains have a handful of urls; sparse states cost
    4·min(n_distinct, m/4) bytes per group instead.  Estimates are
    IDENTICAL to the dense sketch's (the pair set reconstructs the
    exact register file), so the 1.04/√m bound story is unchanged, and
    merge (pair-union keep-max-rho, or register max once dense) stays
    associative/commutative.
    """

    MAGIC = b"!sprshll"
    _is_dense_flag = False  # set by _from_meta for deserialization

    def __init__(self, precision: int = 14, name: str = "DEFAULT"):
        if not (4 <= precision <= 18):
            raise SketchError("precision must be in [4, 18]")
        self.precision = int(precision)
        self.m = 1 << precision
        self.name = name
        self.dense: np.ndarray | None = None       # uint8[m] once densified
        self.pairs = np.empty(0, dtype=np.uint32)  # sorted packed idx<<6|rho
        # break-even: pairs are 4 B each vs 1 B/register dense
        self._max_pairs = self.m // 4

    # -- update ---------------------------------------------------------
    def update_arrow(self, arr) -> None:
        if len(arr) == 0:
            return
        h1, _ = mmh3_128_batch(arr)
        self.update_hashes(h1)

    def update_weighted(self, arr, counts) -> None:
        self.update_arrow(arr)

    def update_hashes(self, h1, h2=None) -> None:
        p = self.precision
        idx = (h1 >> np.uint64(64 - p)).astype(np.int64)
        w = h1 << np.uint64(p)
        rho = np.minimum(_clz64(w), 64 - p).astype(np.int64) + 1
        if self.dense is not None:
            np.maximum.at(self.dense, idx, rho.astype(np.uint8))
            return
        packed = (idx.astype(np.uint32) << np.uint32(6)) | rho.astype(np.uint32)
        self._absorb(packed)

    def _absorb(self, packed: np.ndarray) -> None:
        allp = np.concatenate([self.pairs, packed])
        allp.sort()
        # same idx ⇒ adjacent after sort, max rho is the LAST of the run
        idxs = allp >> np.uint32(6)
        last = np.ones(allp.size, dtype=bool)
        np.not_equal(idxs[:-1], idxs[1:], out=last[:-1])
        self.pairs = allp[last]
        if self.pairs.size > self._max_pairs:
            self._densify()

    def _densify(self) -> None:
        regs = np.zeros(self.m, dtype=np.uint8)
        regs[(self.pairs >> np.uint32(6)).astype(np.int64)] = (
            self.pairs & np.uint32(0x3F)).astype(np.uint8)
        self.dense = regs
        self.pairs = np.empty(0, dtype=np.uint32)

    # -- queries ----------------------------------------------------------
    def _registers(self) -> np.ndarray:
        if self.dense is not None:
            return self.dense
        regs = np.zeros(self.m, dtype=np.uint8)
        regs[(self.pairs >> np.uint32(6)).astype(np.int64)] = (
            self.pairs & np.uint32(0x3F)).astype(np.uint8)
        return regs

    def cardinality(self) -> float:
        """Identical estimator to the dense sketch (reconstructs the
        register file — the pair set IS the nonzero registers)."""
        if self.dense is None and self.pairs.size < self.m // 30:
            # deep-sparse fast path: linear counting, which is exactly
            # what the dense path would pick in this range
            zeros = self.m - int(self.pairs.size)
            return self.m * math.log(self.m / zeros)
        tmp = HyperLogLog(self.precision)
        tmp.registers = self._registers()
        return tmp.cardinality()

    def relative_error_bound(self) -> float:
        return 1.04 / math.sqrt(self.m)

    @property
    def state_nbytes(self) -> int:
        return int(self.dense.nbytes if self.dense is not None
                   else self.pairs.nbytes)

    def to_dense(self) -> HyperLogLog:
        h = HyperLogLog(self.precision, name=self.name)
        h.registers = self._registers().copy()
        return h

    def finalize(self) -> float:
        return self.cardinality()

    # -- merge ------------------------------------------------------------
    def merge(self, other: "SparseHLL") -> "SparseHLL":
        self._check_compatible(other)
        if self.dense is None and other.dense is None:
            self._absorb(other.pairs)
        else:
            if self.dense is None:
                self._densify()
            np.maximum(self.dense, other._registers(), out=self.dense)
        return self

    # -- serialization ------------------------------------------------------
    def _meta(self) -> dict:
        return {"precision": self.precision, "name": self.name,
                "is_dense": self.dense is not None}

    def _meta_compat(self) -> dict:
        return {"precision": self.precision}

    def _arrays(self):
        return [self.dense if self.dense is not None else self.pairs]

    def _set_arrays(self, arrays):
        if self._is_dense_flag:
            self.dense = arrays[0]
            self.pairs = np.empty(0, dtype=np.uint32)
        else:
            self.pairs = arrays[0]

    @classmethod
    def _from_meta(cls, meta):
        obj = cls(meta["precision"], meta.get("name", "DEFAULT"))
        obj._is_dense_flag = bool(meta["is_dense"])
        return obj
