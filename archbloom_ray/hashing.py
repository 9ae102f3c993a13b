"""MurmurHash3 kernels — scalar (bit-exact) and vectorized (numpy) forms.

Re-implements the public MurmurHash3 algorithm (Austin Appleby,
https://github.com/aappleby/smhasher) with the exact semantics of the
reference engine's hashing module (reference: src/mmh3.c):

* ``mmh3_128(key, seed=0) -> (h1, h2)``  — x64_128 variant
  (reference ``mmh3_128``, mmh3.c:214-285).
* ``mmh3_32(key, seed)``                 — x86_32 variant
  (reference ``mmh3_32``, mmh3.c:26-80); used by the cuckoo filter.
* ``make_hashes(h1, h2, k)``             — Kirsch–Mitzenmacher double
  hashing ``h_i = (h1 + i*h2) mod (2^64 - 1)`` (reference
  ``mmh3_64_make_hashes``, mmh3.c:308-315).  NOTE the modulus is
  ``UINT64_MAX`` (2^64 − 1), *not* 2^64: C unsigned arithmetic wraps the
  intermediate ``h1 + i*h2`` mod 2^64 first, then applies ``% UINT64_MAX``.
  Both steps are replicated exactly.

The vectorized batch forms operate on an Arrow string/binary column at
once (zero-copy over the Arrow buffers) and are the hot loop of every
sketch-update stage; the scalar forms are the parity oracle and serve
single-key CLI paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MASK64 = (1 << 64) - 1
_MASK32 = (1 << 32) - 1

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def splitmix64(x: int) -> int:
    """Scalar splitmix64 finalizer over plain Python ints — the shared
    deterministic-coin kernel (no numpy uint64 conversion, so
    arbitrarily large counter/seed composites cannot overflow).  The
    vectorized sibling lives in xorf.py (array shapes); req.py keeps
    its historical inline mix because its coin stream is pinned by
    recorded outputs."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x ^ (x >> 31)


def mmh3_128(key: bytes | str, seed: int = 0) -> tuple[int, int]:
    """Scalar MurmurHash3 x64_128. Returns (h1, h2) as Python ints.

    Bit-identical to the reference ``mmh3_128`` (mmh3.c:214-285).
    """
    if isinstance(key, str):
        key = key.encode("utf-8")
    length = len(key)
    nblocks = length // 16
    h1 = seed & _MASK64
    h2 = seed & _MASK64

    for i in range(nblocks):
        k1 = int.from_bytes(key[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(key[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64

    tail = key[nblocks * 16 :]
    # zero-padded tail is equivalent to the C switch fallthrough
    k1 = int.from_bytes(tail[0:8].ljust(8, b"\0"), "little")
    k2 = int.from_bytes(tail[8:16].ljust(8, b"\0"), "little")
    if k2 or len(tail) > 8:
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
    if k1 or len(tail) > 0:
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def mmh3_64(key: bytes | str, seed: int = 0) -> int:
    """Scalar 64-bit variant: ``h1 ^ h2`` of x64_128 (mmh3.c:105-187)."""
    h1, h2 = mmh3_128(key, seed)
    return h1 ^ h2


def mmh3_32(key: bytes | str, seed: int = 0) -> int:
    """Scalar MurmurHash3 x86_32 (mmh3.c:26-80)."""
    if isinstance(key, str):
        key = key.encode("utf-8")
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK32
    length = len(key)
    nblocks = length // 4
    for i in range(nblocks):
        k = int.from_bytes(key[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK32
        h = (h * 5 + 0xE6546B64) & _MASK32
    tail = key[nblocks * 4 :]
    k = int.from_bytes(tail.ljust(4, b"\0"), "little")
    if len(tail) > 0:
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h


def make_hashes(h1: int, h2: int, count: int) -> list[int]:
    """Scalar double hashing per reference mmh3.c:308-315."""
    out = []
    for i in range(count):
        out.append(((h1 + i * h2) & _MASK64) % (_MASK64))
    return out


# --------------------------------------------------------------------------
# Vectorized batch kernels
# --------------------------------------------------------------------------

def _as_padded_bytes(arr) -> tuple[np.ndarray, np.ndarray]:
    """Lay a string/binary Arrow array (or list of bytes) out as a
    zero-padded 2-D uint8 matrix.

    Returns (padded[n, W], lengths[n]) with W a multiple of 16 and
    ``W >= (max_len // 16 + 1) * 16`` so that for every row the 16-byte
    tail read starting at ``(len // 16) * 16`` stays in bounds.

    Null entries hash as empty strings.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr, type=pa.binary())
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    elif not pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_string()).cast(pa.large_binary())
    if arr.null_count:
        arr = arr.fill_null(b"")

    n = len(arr)
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64, count=n + 1, offset=arr.offset * 8)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    max_len = int(lengths.max()) if n else 0
    W = (max_len // 16 + 1) * 16

    padded = np.zeros((n, W), dtype=np.uint8)
    total = int(lengths.sum())
    if total:
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        col_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
        flat = data[offsets[0] : offsets[-1]]
        padded[row_idx, col_idx] = flat
    return padded, lengths


def _u64(x: int) -> np.uint64:
    return np.uint64(x)


def fmix64_batch(h: np.ndarray) -> np.ndarray:
    """Vectorized MurmurHash3 finalizer (mmh3.c fmix64) — a 64-bit
    bijection.  Used to DECORRELATE derived routing decisions (e.g.
    ``shard = fmix64(h1) % S``) from position hashes that also consume
    ``h1``: conditioning on ``h1 % S`` leaks straight into
    ``(h1 + i·h2) % m`` whenever gcd(S, m) > 1 and inflates per-shard
    FPR (measured 7× at S=8, m=460); conditioning on the mixed value
    does not."""
    k = h.astype(np.uint64, copy=True)
    k ^= k >> np.uint64(33)
    k *= np.uint64(0xFF51AFD7ED558CCD)
    k ^= k >> np.uint64(33)
    k *= np.uint64(0xC4CEB9FE1A85EC53)
    k ^= k >> np.uint64(33)
    return k


def trailing_zeros64_batch(h: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros over uint64, with tz(0) = 64
    (the geometric-level convention: an all-zero hash lands at the
    DEEPEST level, not the most probable one).  Branch-free: isolate
    the lowest set bit and read its exponent via float64 log2 — exact
    for single bits up to 2^63 under IEEE 754."""
    v = h.astype(np.uint64, copy=False)
    nz = v != 0
    low = v & (~v + np.uint64(1))
    tz = np.full(v.shape, 64, dtype=np.int64)
    if nz.any():
        tz[nz] = np.round(np.log2(low[nz].astype(np.float64))).astype(
            np.int64)
    return tz


def mmh3_128_batch(arr, seed: int = 0, chunk: int = 8192) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized MurmurHash3 x64_128 over a string/binary column.

    Returns ``(h1, h2)`` uint64 arrays; bit-identical per element to
    :func:`mmh3_128` (and hence to reference mmh3.c:214-285).

    Rows are processed in ``chunk``-sized slices so every temporary of
    the ~30-pass mixing pipeline stays cache-resident (≈64 KB each at
    8192 rows): the full-width formulation streams hundreds of MB of
    temporaries through DRAM per batch and collapses under many
    concurrent workers on bandwidth-limited hosts.  Chunking also skips
    block iterations beyond each slice's local max length.
    """
    padded, lengths = _as_padded_bytes(arr)
    n, W = padded.shape
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)

    H1 = np.empty(n, np.uint64)
    H2 = np.empty(n, np.uint64)
    blocks_all = np.ascontiguousarray(padded).view("<u8")  # (n, W//8)
    nblocks_all = (lengths // 16).astype(np.int64)
    c1, c2 = _u64(_C1), _u64(_C2)
    five, m1, m2 = _u64(5), _u64(0x52DCE729), _u64(0x38495AB5)

    with np.errstate(over="ignore"):
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            blocks = blocks_all[lo:hi]
            nblocks = nblocks_all[lo:hi]
            m = hi - lo
            h1 = np.full(m, np.uint64(seed & _MASK64))
            h2 = np.full(m, np.uint64(seed & _MASK64))
            for b in range(int(nblocks.max())):
                mask = nblocks > b
                k1 = blocks[:, 2 * b].copy()
                k2 = blocks[:, 2 * b + 1].copy()
                k1 *= c1
                k1 = (k1 << _u64(31)) | (k1 >> _u64(33))
                k1 *= c2
                nh1 = h1 ^ k1
                nh1 = (nh1 << _u64(27)) | (nh1 >> _u64(37))
                nh1 += h2
                nh1 = nh1 * five + m1
                k2 *= c2
                k2 = (k2 << _u64(33)) | (k2 >> _u64(31))
                k2 *= c1
                nh2 = h2 ^ k2
                nh2 = (nh2 << _u64(31)) | (nh2 >> _u64(33))
                nh2 += nh1
                nh2 = nh2 * five + m2
                h1 = np.where(mask, nh1, h1)
                h2 = np.where(mask, nh2, h2)

            # tail: zero-padded 16-byte read at nblocks*16 — equivalent
            # to the C switch fallthrough (zero bytes contribute nothing)
            rows = np.arange(m)
            t1 = blocks[rows, 2 * nblocks].copy()
            t2 = blocks[rows, 2 * nblocks + 1].copy()
            t2 *= c2
            t2 = (t2 << _u64(33)) | (t2 >> _u64(31))
            t2 *= c1
            h2 ^= t2
            t1 *= c1
            t1 = (t1 << _u64(31)) | (t1 >> _u64(33))
            t1 *= c2
            h1 ^= t1

            ulen = lengths[lo:hi].astype(np.uint64)
            h1 ^= ulen
            h2 ^= ulen
            h1 += h2
            h2 += h1
            for h in (h1, h2):
                h ^= h >> _u64(33)
                h *= _u64(0xFF51AFD7ED558CCD)
                h ^= h >> _u64(33)
                h *= _u64(0xC4CEB9FE1A85EC53)
                h ^= h >> _u64(33)
            h1 += h2
            h2 += h1
            H1[lo:hi] = h1
            H2[lo:hi] = h2
    return H1, H2


def mmh3_64_batch(arr, seed: int = 0) -> np.ndarray:
    h1, h2 = mmh3_128_batch(arr, seed)
    return h1 ^ h2


def mmh3_32_batch(arr, seed: int = 0, chunk: int = 16384) -> np.ndarray:
    """Vectorized MurmurHash3 x86_32 over a string/binary column
    (cache-resident row chunks — see :func:`mmh3_128_batch`)."""
    padded, lengths = _as_padded_bytes(arr)
    n = padded.shape[0]
    if n == 0:
        return np.empty(0, np.uint32)
    out = np.empty(n, np.uint32)
    blocks_all = np.ascontiguousarray(padded).view("<u4")  # (n, W//4)
    nblocks_all = (lengths // 4).astype(np.int64)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        out[lo:hi] = _mmh3_32_chunk(
            blocks_all[lo:hi], nblocks_all[lo:hi], lengths[lo:hi], seed)
    return out


def _mmh3_32_chunk(blocks, nblocks, lengths, seed: int) -> np.ndarray:
    n = blocks.shape[0]
    c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
    h = np.full(n, np.uint32(seed & _MASK32))
    max_blocks = int(nblocks.max())
    with np.errstate(over="ignore"):
        for b in range(max_blocks):
            mask = nblocks > b
            k = blocks[:, b].copy()
            k *= c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k *= c2
            nh = h ^ k
            nh = (nh << np.uint32(13)) | (nh >> np.uint32(19))
            nh = nh * np.uint32(5) + np.uint32(0xE6546B64)
            h = np.where(mask, nh, h)
        # tail (1-3 bytes, zero padded). The C code only mixes when
        # len & 3 != 0; a zero tail block would also mix h ^= 0 after the
        # multiply chain — which is NOT a no-op for x86_32? It is: k=0 →
        # k*c1=0 → rotl(0)=0 → 0*c2=0 → h ^= 0. So unconditional is safe,
        # but only the 4-byte-aligned tail word must be masked off: rows
        # where len % 4 == 0 must contribute k=0, which zero padding
        # guarantees only if the next word is beyond the string — true,
        # since tail word starts at nblocks*4 >= len.
        rows = np.arange(n)
        tailword = blocks[rows, nblocks].copy()
        # mask off bytes beyond len%4 — already zero from padding
        k = tailword
        k *= c1
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k *= c2
        h ^= k
        h ^= lengths.astype(np.uint32)
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h


def make_hashes_batch(h1: np.ndarray, h2: np.ndarray, count: int) -> np.ndarray:
    """Vectorized double hashing: returns (count, n) uint64 matrix.

    ``out[i] = wrap64(h1 + i*h2) % (2^64 - 1)`` — the reference's exact
    arithmetic (mmh3.c:313: C wraps mod 2^64, then ``% UINT64_MAX``).
    """
    i = np.arange(count, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        v = h1[None, :] + i * h2[None, :]
    return v % np.uint64(_MASK64)


def positions_batch(arr, k: int, m: int, seed: int = 0) -> np.ndarray:
    """k bit/counter positions per element: ``make_hashes(...) % m``.

    This is the shared index math of every Bloom-family sketch
    (reference bloom.c:336-352, cbloom.c:419-444, tdbloom.c:289-320).
    Returns (k, n) int64 matrix of positions in [0, m).
    """
    h1, h2 = mmh3_128_batch(arr, seed)
    return (make_hashes_batch(h1, h2, k) % np.uint64(m)).astype(np.int64)


def key_str_array(arr) -> "pa.Array":
    """Canonical STRING form of a key/id column for hash routing —
    the one shared canonicalization (combine chunks, pass strings
    through, cast everything else), so build and probe sides of every
    sharded structure agree on the key space by construction."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    return pc.cast(arr, pa.string())
