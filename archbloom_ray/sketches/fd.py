"""Frequent Directions — a mergeable MATRIX sketch (covariance/PCA
over an embedding corpus in one streaming pass).

Engine extension (nothing comparable in the reference C library; this
is the matrix analogue of its frequency filters).  Implemented from
the published algorithm (Liberty KDD'13; Ghashami, Liberty, Phillips &
Woodruff, "Frequent Directions: Simple and Deterministic Matrix
Sketching", SICOMP 2016):

    keep a 2ℓ×d row buffer B; when full, SVD it and shrink
    Σ² ← max(Σ² − σ²_{ℓ+1}, 0), keeping the top ℓ directions.

Deterministic guarantee (GLPW16 Thm 1.1, k=0), preserved under any
merge tree (their §3 / the mergeable-summaries reduction):

    0 ⪯ AᵀA − BᵀB   and   ‖AᵀA − BᵀB‖₂ ≤ ‖A‖F² / ℓ

merge = append the other sketch's (already singular-value-scaled) rows
and re-shrink — associative within the same bound, so the distributed
tree merge (pipelines/build.py) applies unchanged.  ‖A‖F² is tracked
exactly alongside, making the bound checkable without a second pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Sketch, SketchError, register


def _rows_as_matrix(arr) -> np.ndarray:
    """list<float> Arrow column (or 2-D numpy) → (n, d) float64."""
    if isinstance(arr, np.ndarray):
        return np.asarray(arr, dtype=np.float64).reshape(len(arr), -1)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten() if hasattr(arr, "flatten") else arr.values,
                      dtype=np.float64)
    return flat.reshape(len(arr), -1)


@register
class FrequentDirections(Sketch):
    MAGIC = b"!freqdir"

    def __init__(self, ell: int = 16, dim: int | None = None,
                 name: str = "DEFAULT"):
        if ell < 1:
            raise SketchError("ell must be >= 1")
        self.ell = int(ell)
        self.dim = int(dim) if dim else 0
        self.name = name
        self.sq_frob = 0.0   # exact ‖A‖F² of everything ever inserted
        self.n_rows = 0
        self.B = np.zeros((2 * self.ell, self.dim), dtype=np.float64)
        self._filled = 0     # rows of B in use

    def _ensure_dim(self, d: int) -> None:
        if self.dim == 0:
            self.dim = int(d)
            self.B = np.zeros((2 * self.ell, d), dtype=np.float64)
        elif d != self.dim:
            raise SketchError(f"dim mismatch: sketch {self.dim}, rows {d}")

    # -- update ---------------------------------------------------------
    def update_rows(self, X: np.ndarray) -> None:
        X = np.asarray(X, dtype=np.float64)
        if X.ndim != 2 or X.size == 0:
            if X.size == 0:
                return
            raise SketchError("expected a 2-D row block")
        self._ensure_dim(X.shape[1])
        self.sq_frob += float((X * X).sum())
        self.n_rows += X.shape[0]
        i = 0
        while i < X.shape[0]:
            take = min(2 * self.ell - self._filled, X.shape[0] - i)
            self.B[self._filled : self._filled + take] = X[i : i + take]
            self._filled += take
            i += take
            if self._filled == 2 * self.ell:
                self._shrink()

    def update_arrow(self, arr) -> None:
        self.update_rows(_rows_as_matrix(arr))

    def _shrink(self) -> None:
        # SVD of the full buffer; subtract the (ℓ+1)-th squared singular
        # value, zeroing at least the bottom half of the buffer
        _, s, Vt = np.linalg.svd(self.B[: self._filled], full_matrices=False)
        if s.size > self.ell:
            delta = s[self.ell] ** 2
            s2 = np.maximum(s[: self.ell] ** 2 - delta, 0.0)
        else:
            s2 = s**2
        keep = np.sqrt(s2)
        self.B[:] = 0.0
        self.B[: keep.size] = keep[:, None] * Vt[: keep.size]
        self._filled = int(keep.size)

    # -- merge ----------------------------------------------------------
    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        self._check_compatible(other)
        if other.dim == 0:
            return self
        self._ensure_dim(other.dim)
        rows = other.B[: other._filled]
        if rows.size:
            # append WITHOUT re-counting Frobenius mass (rows are the
            # other sketch's state, not new data)
            i = 0
            while i < rows.shape[0]:
                take = min(2 * self.ell - self._filled, rows.shape[0] - i)
                self.B[self._filled : self._filled + take] = rows[i : i + take]
                self._filled += take
                i += take
                if self._filled == 2 * self.ell:
                    self._shrink()
        self.sq_frob += other.sq_frob
        self.n_rows += other.n_rows
        return self

    # -- queries --------------------------------------------------------
    def cov_estimate(self) -> np.ndarray:
        """BᵀB ≈ AᵀA (PSD underestimate, per the guarantee)."""
        if self.dim == 0:
            raise SketchError("empty sketch")
        B = self.B[: self._filled]
        return B.T @ B

    def singular_values(self) -> np.ndarray:
        return np.linalg.svd(self.B[: self._filled], compute_uv=False)

    def error_bound(self) -> float:
        """‖AᵀA − BᵀB‖₂ ≤ this, deterministically (GLPW16 Thm 1.1)."""
        return self.sq_frob / self.ell

    # -- serialization ----------------------------------------------------
    def _meta(self) -> dict:
        return {"ell": self.ell, "dim": self.dim, "name": self.name,
                "sq_frob": self.sq_frob, "n_rows": self.n_rows,
                "filled": self._filled}

    def _meta_compat(self) -> dict:
        return {"ell": self.ell}

    def _arrays(self) -> list[np.ndarray]:
        return [self.B[: self._filled].copy()]

    def _set_arrays(self, arrays: list[np.ndarray]) -> None:
        rows = arrays[0]
        if self.dim:
            self.B = np.zeros((2 * self.ell, self.dim), dtype=np.float64)
            self.B[: rows.shape[0]] = rows
        self._filled = int(rows.shape[0])

    @classmethod
    def _from_meta(cls, meta: dict) -> "FrequentDirections":
        obj = cls(ell=meta["ell"], dim=meta["dim"] or None,
                  name=meta.get("name", "DEFAULT"))
        obj.sq_frob = float(meta["sq_frob"])
        obj.n_rows = int(meta["n_rows"])
        return obj
