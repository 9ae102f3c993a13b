"""Stable Bloom filter — bounded-memory membership over UNBOUNDED
streams (Deng & Rafiei, "Approximately Detecting Duplicates for
Streaming Data using Stable Bloom Filters", SIGMOD 2006).

Engine extension completing the streaming-dedup story: the reference's
Bloom family answers "ever seen" (grows stale or saturates on an
endless crawl) and the time-decaying variants need explicit event
times; the SBF answers "seen RECENTLY" with CONSTANT memory and no
clock — before each insert it decrements P randomly chosen cells by 1,
then sets the key's K cells to Max, so old entries fade out on their
own and the fraction of zeros converges to a stationary point.  At the
stable point the false-positive rate is bounded by the paper's
closed form (Theorem 3):

    P(cell > 0) = 1 − (1 / (1 + 1/(P·(1/K − 1/m))))^Max
    FPS         = P(cell > 0)^K

False NEGATIVES are the price: an element inserted long ago may have
decayed (that is the feature — it should be re-admitted by a
streaming deduper), while recently inserted elements are present with
high probability.

Batch semantics (vectorized; the per-batch approximation of the
paper's per-insert loop): a batch of n inserts first applies all n·P
decrements (per-cell totals via one ``np.unique``), then sets all
K·n cells to Max.  Decrement/insert interleaving within a batch is
thereby coarsened — expectations and the stationary point are
unchanged (the stationary analysis only uses per-insert decrement
probability P/m), and elements of the CURRENT batch can never be
false-negatived by their own batch's decrements, which is exactly the
semantics a batched streaming deduper wants.  The decrement positions
come from a counter-seeded splitmix64 stream, so a build is
DETERMINISTIC given (seed, batch partitioning).

NOT mergeable: the structure is a function of stream order (decay
depends on when each key was inserted), so a distributed deployment
shards the KEY SPACE — route each key by hash to the partition owning
its SBF (the engine's routed-probe shape, pipelines/build.py) — and
never unions cell arrays; ``merge`` raises.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import make_hashes_batch, mmh3_128_batch
from .base import Sketch, SketchError, register
from .xorf import _splitmix


@register
class StableBloomFilter(Sketch):
    MAGIC = b"!stblbf!"

    def __init__(self, num_cells: int = 1 << 16, k: int = 3, p: int = 4,
                 max_val: int = 1, seed: int = 42, name: str = "DEFAULT"):
        if num_cells < 8 or k < 1 or p < 1:
            raise SketchError("invalid stable-Bloom geometry")
        if not (1 <= max_val <= 255):
            raise SketchError("max_val must be in [1, 255] (uint8 cells)")
        self.m = int(num_cells)
        self.k = int(k)
        self.p = int(p)
        self.max_val = int(max_val)
        self.seed = int(seed)
        self.name = name
        self.cells = np.zeros(self.m, dtype=np.uint8)
        self.inserts = 0          # total elements ever inserted
        self._ctr = 0             # decrement-stream position

    # -- update --------------------------------------------------------
    def _decrement_positions(self, count: int) -> np.ndarray:
        """``count`` pseudo-random cell indices from the deterministic
        counter-seeded splitmix stream."""
        idx = np.arange(self._ctr, self._ctr + count, dtype=np.uint64)
        self._ctr += count
        with np.errstate(over="ignore"):
            h = _splitmix(idx ^ np.uint64(
                (self.seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF))
        return (h % np.uint64(self.m)).astype(np.int64)

    def update_arrow(self, arr) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return
        h1, h2 = mmh3_128_batch(arr)
        self.update_hashes(h1, h2)

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Sub-batched so one vectorized step never refreshes more
        than ~1/16 of the table: the stationary analysis assumes
        decrements interleave with inserts, and a coarse batch whose
        K·n sets rival m freezes decay (measured: 1000-row batches on
        a 4096-cell table stabilized at fill 0.57 instead of the
        theory's 0.27).  The chunk loop is ≤ 16·K·n/m Python
        iterations — vanishing for production-sized tables."""
        n = len(h1)
        if n == 0:
            return
        step = max(1, self.m // (16 * self.k))
        for i in range(0, n, step):
            c1, c2 = h1[i:i + step], h2[i:i + step]
            nn = len(c1)
            # 1) the chunk's n·P decrements, clamped at 0 (cell totals)
            dec = self._decrement_positions(nn * self.p)
            uniq, cnt = np.unique(dec, return_counts=True)
            cur = self.cells[uniq].astype(np.int64)
            self.cells[uniq] = np.maximum(cur - cnt, 0).astype(np.uint8)
            # 2) set every insert's K cells to Max
            pos = (make_hashes_batch(c1, c2, self.k)
                   % np.uint64(self.m)).astype(np.int64)
            self.cells[pos.ravel()] = self.max_val
            self.inserts += nn

    # -- queries -------------------------------------------------------
    def lookup_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Membership from precomputed ``mmh3_128`` pairs (the
        hash-once streaming-dedup path)."""
        if len(h1) == 0:
            return np.empty(0, dtype=bool)
        pos = (make_hashes_batch(h1, h2, self.k)
               % np.uint64(self.m)).astype(np.int64)
        return (self.cells[pos] > 0).all(axis=0)

    def lookup_batch(self, arr) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return np.empty(0, dtype=bool)
        h1, h2 = mmh3_128_batch(arr)
        return self.lookup_hashes(h1, h2)

    def lookup(self, element: bytes | str) -> bool:
        typ = pa.string() if isinstance(element, str) else pa.binary()
        return bool(self.lookup_batch(pa.array([element], type=typ))[0])

    def stable_fp_rate(self) -> float:
        """The paper's stationary false-positive bound FPS (Theorem 3)
        — the rate an ABSENT key reads present once the filter has
        converged (inserts ≳ m·Max/P)."""
        inv = 1.0 / (self.p * (1.0 / self.k - 1.0 / self.m))
        p_zero = (1.0 / (1.0 + inv)) ** self.max_val
        return (1.0 - p_zero) ** self.k

    def fill_fraction(self) -> float:
        """Fraction of non-zero cells (converges to 1 − P(cell=0))."""
        return float((self.cells > 0).mean())

    # -- algebra -------------------------------------------------------
    def merge(self, other) -> "StableBloomFilter":
        raise SketchError(
            "stable Bloom filters are stream-order structures and do not "
            "merge — shard the key space and route probes instead")

    def finalize(self) -> dict:
        return {"num_cells": self.m, "k": self.k, "p": self.p,
                "max_val": self.max_val, "inserts": self.inserts,
                "stable_fp_rate": self.stable_fp_rate(),
                "fill_fraction": self.fill_fraction()}

    # -- ser/de --------------------------------------------------------
    def _meta(self) -> dict:
        return {"num_cells": self.m, "k": self.k, "p": self.p,
                "max_val": self.max_val, "seed": self.seed,
                "name": self.name, "inserts": self.inserts,
                "ctr": self._ctr}

    def _meta_compat(self) -> dict:
        return {"num_cells": self.m, "k": self.k}

    def _arrays(self):
        return [self.cells]

    def _set_arrays(self, arrays):
        (self.cells,) = arrays

    @classmethod
    def _from_meta(cls, meta):
        obj = cls(meta["num_cells"], meta["k"], meta["p"],
                  meta["max_val"], meta.get("seed", 42),
                  meta.get("name", "DEFAULT"))
        obj.inserts = meta.get("inserts", 0)
        obj._ctr = meta.get("ctr", 0)
        return obj
