"""Mergeable-sketch UDAF protocol.

Every sketch in this engine follows the classic mergeable-aggregate
lifecycle — the distributed generalization of the reference's
``*_init → *_add → *_merge → *_save/*_load`` C API (e.g. reference
bloom.c:54-67, bloom.c:336-365, bloom.c:770-795, bloom.c:525-733):

    create(params) -> update_arrow(column) per batch -> serialize
      -> shuffle by sketch key -> merge(state, state) -> finalize()

``to_bytes()/from_bytes()`` use a little-endian magic+version header,
mirroring the reference's magic-tagged file discipline (``!bloomf!``
bloom.c:529-536, ``!cbloom!`` cbloom.c:858-865, ``!tdbloo!``
tdbloom.c:532-539) but versioned and portable.
"""

from __future__ import annotations

import json
import struct
from abc import ABC, abstractmethod
from typing import Any, ClassVar

import numpy as np
import pyarrow as pa

_HEADER = struct.Struct("<8sBxxxI")  # magic, version, pad, meta_len


class SketchError(ValueError):
    """Raised on incompatible merges / corrupt serializations (the
    engine's analogue of the reference's error enums, bloom.h:59-76)."""


class Sketch(ABC):
    """Abstract mergeable sketch.

    Subclasses define ``MAGIC`` (8 bytes), ``VERSION``, parameter
    round-tripping via ``_meta()/_from_meta()`` and array payload via
    ``_arrays()/_set_arrays()``.
    """

    MAGIC: ClassVar[bytes]
    VERSION: ClassVar[int] = 1

    #: label, mirroring the reference's filter ``name`` (bloom.c:482-507)
    name: str = "DEFAULT"

    # -- update / merge / finalize ------------------------------------
    @abstractmethod
    def update_arrow(self, arr: pa.Array | pa.ChunkedArray) -> None:
        """Vectorized add of every element of a string/binary column."""

    @abstractmethod
    def merge(self, other: "Sketch") -> "Sketch":
        """In-place merge of a compatible sketch; returns self."""

    def finalize(self) -> Any:
        """Produce the sketch's headline estimate (variant-specific)."""
        return self

    # -- compatibility -------------------------------------------------
    def _check_compatible(self, other: "Sketch") -> None:
        if type(other) is not type(self):
            raise SketchError(f"cannot merge {type(other).__name__} into {type(self).__name__}")
        if self._meta_compat() != other._meta_compat():
            # reference: bloom_merge size/hashcount/accuracy check → BF_INVALIDFILE
            # (bloom.c:773-777)
            raise SketchError(
                f"incompatible sketches: {self._meta_compat()} != {other._meta_compat()}"
            )

    def _meta_compat(self) -> dict:
        """Subset of metadata that must match for a merge; default: all."""
        meta = self._meta()
        meta.pop("name", None)
        return meta

    # -- serialization -------------------------------------------------
    @abstractmethod
    def _meta(self) -> dict:
        """JSON-serializable parameters."""

    @abstractmethod
    def _arrays(self) -> list[np.ndarray]:
        """Payload arrays, serialized in order, little-endian."""

    @abstractmethod
    def _set_arrays(self, arrays: list[np.ndarray]) -> None:
        ...

    @classmethod
    @abstractmethod
    def _from_meta(cls, meta: dict) -> "Sketch":
        """Construct an empty sketch from metadata."""

    def to_bytes(self) -> bytes:
        meta = self._meta()
        arrays = self._arrays()
        meta["__arrays__"] = [[str(a.dtype), list(a.shape)] for a in arrays]
        mb = json.dumps(meta, separators=(",", ":")).encode()
        parts = [_HEADER.pack(self.MAGIC, self.VERSION, len(mb)), mb]
        for a in arrays:
            parts.append(np.ascontiguousarray(a).astype(a.dtype.newbyteorder("<")).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "Sketch":
        magic, version, mlen = _HEADER.unpack_from(data, 0)
        if magic != cls.MAGIC:
            raise SketchError(f"bad magic {magic!r} for {cls.__name__}")
        if version != cls.VERSION:
            raise SketchError(f"unsupported version {version}")
        off = _HEADER.size
        meta = json.loads(data[off : off + mlen])
        off += mlen
        shapes = meta.pop("__arrays__")
        obj = cls._from_meta(meta)
        arrays = []
        for dtype_str, shape in shapes:
            dt = np.dtype(dtype_str).newbyteorder("<")
            count = int(np.prod(shape)) if shape else 1
            a = np.frombuffer(data, dtype=dt, count=count, offset=off).reshape(shape)
            off += a.nbytes
            arrays.append(a.astype(np.dtype(dtype_str), copy=True))
        obj._set_arrays(arrays)
        return obj

    # -- convenience ---------------------------------------------------
    def add(self, element: bytes | str) -> None:
        """Single-element add (CLI/test parity path, reference
        ``*_add_string``)."""
        typ = pa.string() if isinstance(element, str) else pa.binary()
        self.update_arrow(pa.array([element], type=typ))

    def copy(self) -> "Sketch":
        return type(self).from_bytes(self.to_bytes())


_REGISTRY: dict[bytes, type] = {}


def register(cls: type) -> type:
    _REGISTRY[cls.MAGIC] = cls
    return cls


def sketch_from_bytes(data: bytes) -> Sketch:
    """Polymorphic deserialization via the magic tag."""
    magic = bytes(data[:8])
    try:
        cls = _REGISTRY[magic]
    except KeyError:
        raise SketchError(f"unknown sketch magic {magic!r}") from None
    return cls.from_bytes(data)
