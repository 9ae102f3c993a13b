"""LogLog Filter — cold-item filtering over high-speed streams.

Engine extension beyond the reference scope, implemented from the
published algorithm ("LogLog Filter: Filtering Cold Items within a
Large Range over High Speed Data Streams", ICDE 2021 — one of the
round's retrieved papers).  The use case: most items in a web-scale
stream are COLD (appear a handful of times); heavy-hitter machinery
(CMS/MG) wastes its space tracking them.  The LLF spends 8 bits per
cell to cheaply pre-filter: only items whose cell looks hot are worth
a real counter.

Mechanics: an array of ``m`` 8-bit registers.  Every ARRIVAL (item
occurrence) draws a geometric rank — here ``1 + trailing zeros`` of a
64-bit hash of (item, occurrence id) — and max-updates the item's cell
``h1(item) % m``.  A cell hit by ``c`` arrivals concentrates around
``log2(c)``, so ``register >= T`` flags items with roughly ``2^T`` or
more arrivals (plus collision inflow — one-sided: collisions only
ADD arrivals, so a cell's register is stochastically HIGHER than the
item's own, never systematically lower).

Distribution-friendly by construction:
- **deterministic**: the rank is a hash of (item, occurrence id), not
  an RNG draw — a given corpus always builds the same filter;
- **idempotent**: re-processing a retried batch re-applies the same
  maxima (max is idempotent), so task retries and at-least-once
  delivery are free;
- **mergeable**: register-wise max, associative and commutative —
  the same tree-merge shuffle every other sketch here uses.

Estimator: ``estimate(item) = 2^register - 1`` (the max-rank coupon
estimate, within a constant factor — the filter is a ROUTER, not a
counter; route hot candidates to CMS/MG for real counts).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Sketch, SketchError, register
from ..hashing import fmix64_batch, mmh3_128_batch


@register
class LogLogFilter(Sketch):
    MAGIC = b"!llfcold"

    def __init__(self, m: int = 1 << 16, seed: int = 0,
                 name: str = "DEFAULT"):
        if m < 16:
            raise SketchError("m must be >= 16 cells")
        self.m = int(m)
        self.seed = int(seed)
        self.name = name
        self.cells = np.zeros(self.m, dtype=np.uint8)
        self.n = 0  # arrivals observed

    # -- update -------------------------------------------------------
    def update_arrow(self, arr, occ=None) -> None:
        """Max-update with one geometric rank per ARRIVAL.

        ``occ``: int64 occurrence ids (unique per arrival, e.g.
        ``doc_id << 20 | position``).  Omitted ⇒ arrivals are numbered
        ``n .. n+len-1`` — fine single-stream, but distributed builds
        MUST pass real occurrence ids so retries stay idempotent.
        """
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        if n == 0:
            return
        if occ is None:
            occ = np.arange(self.n, self.n + n, dtype=np.int64)
        occ = np.asarray(occ, dtype=np.uint64)
        h1, h2 = mmh3_128_batch(arr, seed=self.seed)
        cell = (fmix64_batch(h1) % np.uint64(self.m)).astype(np.int64)
        # per-arrival draw: mix the item lane with the occurrence id;
        # rank = 1 + trailing zeros (geometric, p=1/2), capped at 255
        from ..hashing import trailing_zeros64_batch

        draw = fmix64_batch(h2 ^ fmix64_batch(occ))
        rank = np.minimum(trailing_zeros64_batch(draw) + 1,
                          255).astype(np.uint8)
        np.maximum.at(self.cells, cell, rank)
        self.n += n

    # -- queries ------------------------------------------------------
    def registers_of(self, arr) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        h1, _ = mmh3_128_batch(arr, seed=self.seed)
        cell = (fmix64_batch(h1) % np.uint64(self.m)).astype(np.int64)
        return self.cells[cell]

    def is_hot_batch(self, arr, threshold: int) -> np.ndarray:
        """True where the item's cell register >= threshold (candidate
        hot; collisions only inflate, so an item with many arrivals is
        flagged with high probability while the cold mass is pruned)."""
        return self.registers_of(arr) >= threshold

    def estimate_batch(self, arr) -> np.ndarray:
        """Coarse per-item arrival estimates: 2^register − 1."""
        r = self.registers_of(arr).astype(np.int64)
        return (np.int64(1) << np.minimum(r, 62)) - 1

    def saturation(self) -> float:
        return float((self.cells > 0).mean())

    # -- algebra ------------------------------------------------------
    def merge(self, other: "LogLogFilter") -> "LogLogFilter":
        self._check_compatible(other)
        np.maximum(self.cells, other.cells, out=self.cells)
        self.n += other.n
        return self

    def finalize(self) -> dict:
        return {"n": self.n, "m": self.m,
                "saturation": self.saturation()}

    def _meta_compat(self) -> dict:
        return {"m": self.m, "seed": self.seed}

    # -- ser/de -------------------------------------------------------
    def _meta(self) -> dict:
        return {"m": self.m, "seed": self.seed, "name": self.name,
                "n": self.n}

    def _arrays(self):
        return [self.cells]

    def _set_arrays(self, arrays):
        self.cells = arrays[0].astype(np.uint8, copy=True)

    @classmethod
    def _from_meta(cls, meta):
        obj = cls(meta["m"], meta.get("seed", 0),
                  meta.get("name", "DEFAULT"))
        obj.n = meta.get("n", 0)
        return obj
