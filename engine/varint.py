"""Vectorized LEB128 varints + zigzag (SURVEY.md §2.1 I1/I2).

Semantics match ORC's SerializationUtils.writeVulong/writeVslong/
zigzagEncode (reference-extract/javap/SerializationUtils.txt:9-12,25-26):
base-128 little-endian varint with continuation MSB; signed values are
zigzag-mapped first ((n << 1) ^ (n >> 63)).

All kernels are pure numpy — no per-value Python. Encoding builds a
(n, max_len) byte matrix and compresses by a validity mask; decoding
segments the byte stream at continuation-bit boundaries and reduces
with ``np.bitwise_or.reduceat``.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7F = _U64(0x7F)

# bit length of a single byte value 0..255 (0 -> 0)
_BYTE_BITLEN = np.array([0] + [int(i).bit_length() for i in range(1, 256)],
                        dtype=np.uint8)


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """int64 array -> uint64 zigzag codes (small magnitudes -> small)."""
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    """uint64 zigzag codes -> int64 values."""
    u = np.asarray(u, dtype=np.uint64)
    return (u >> _U64(1)).view(np.int64) ^ -((u & _U64(1)).view(np.int64))


def bit_length_u64(u: np.ndarray) -> np.ndarray:
    """Per-element bit length of uint64 values (0 -> 0). Fast path via
    frexp (exact below 2^53, where float64 conversion is lossless);
    larger values get a +-1 shift correction — exact for all 64 bits."""
    u = np.ascontiguousarray(u, dtype=np.uint64)
    if u.size == 0:
        return np.zeros(0, dtype=np.int64)
    _, e = np.frexp(u.astype(np.float64))
    bl = e.astype(np.int64)
    big = u >= np.uint64(1 << 53)  # float64 may have rounded
    if big.any():
        w = np.flatnonzero(big)
        b = u[w, None].view(np.uint8).reshape(-1, 8)  # LE byte lanes
        hi = 7 - np.argmax((b != 0)[:, ::-1], axis=1)
        bl[w] = hi * 8 + _BYTE_BITLEN[b[np.arange(len(w)), hi]]
    return bl


def encode_varints(u: np.ndarray) -> np.ndarray:
    """Encode uint64 array as a concatenated LEB128 byte stream (uint8)."""
    u = np.ascontiguousarray(u, dtype=np.uint64)
    n = u.size
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    nbits = np.maximum(bit_length_u64(u), 1)
    lens = (nbits + 6) // 7  # bytes per value, 1..10
    max_len = int(lens.max())
    shifts = (np.arange(max_len, dtype=np.uint64) * _SEVEN)
    mat = ((u[:, None] >> shifts[None, :]) & _MASK7F).astype(np.uint8)
    col = np.arange(max_len)
    valid = col[None, :] < lens[:, None]
    cont = col[None, :] < (lens - 1)[:, None]
    mat |= cont.astype(np.uint8) << 7
    return mat[valid]


def varint_lengths(u: np.ndarray) -> np.ndarray:
    """Byte length each value will occupy when varint-encoded."""
    u = np.ascontiguousarray(u, dtype=np.uint64)
    return (np.maximum(bit_length_u64(u), 1) + 6) // 7


def decode_varints(buf: np.ndarray, count: int | None = None
                   ) -> tuple[np.ndarray, int]:
    """Decode LEB128 byte stream -> (uint64 values, bytes consumed).

    If ``count`` is given, stops after that many values.
    """
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if b.size == 0 or count == 0:
        return np.zeros(0, dtype=np.uint64), 0
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    if count is not None:
        if len(ends) < count:
            raise ValueError("varint stream truncated")
        ends = ends[:count]
    if len(ends) == 0:
        raise ValueError("varint stream truncated (no terminator)")
    nbytes = int(ends[-1]) + 1
    bb = b[:nbytes]
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    gid = np.zeros(nbytes, dtype=np.int64)
    gid[starts[1:]] = 1
    np.cumsum(gid, out=gid)
    pos = np.arange(nbytes, dtype=np.int64) - starts[gid]
    contrib = (bb.astype(np.uint64) & _MASK7F) << (pos.astype(np.uint64) * _SEVEN)
    vals = np.bitwise_or.reduceat(contrib, starts)
    return vals, nbytes


def encode_signed_varints(v: np.ndarray) -> np.ndarray:
    return encode_varints(zigzag_encode(v))


def decode_signed_varints(buf: np.ndarray, count: int | None = None
                          ) -> tuple[np.ndarray, int]:
    u, nb = decode_varints(buf, count)
    return zigzag_decode(u), nb
