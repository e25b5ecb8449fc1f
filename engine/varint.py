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


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """int64 array -> uint64 zigzag codes (small magnitudes -> small)."""
    v = np.asarray(v, dtype=np.int64)
    out = v << 1
    np.bitwise_xor(out, v >> 63, out=out)  # reuse the shift buffer
    return out.view(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    """uint64 zigzag codes -> int64 values."""
    u = np.asarray(u, dtype=np.uint64)
    out = (u >> _U64(1)).view(np.int64)
    np.bitwise_xor(out, -((u & _U64(1)).view(np.int64)), out=out)
    return out


def bit_length_u64(u: np.ndarray) -> np.ndarray:
    """Per-element bit length of uint64 values (0 -> 0).

    Reads the IEEE-754 exponent field of the float64 conversion
    directly (``bits >> 52 - 1022``) — exact below 2^53, and at most
    ONE too high above it (round-to-nearest can only cross a binade by
    landing exactly on the next power of two), so a single shift check
    ``u >> (bl-1) == 0`` finishes the job. Replaces the frexp path
    (which also materialized an unused mantissa array) — measured
    1.8x on sub-2^53 data and 4.7x on wide data.
    """
    u = np.ascontiguousarray(u, dtype=np.uint64)
    if u.size == 0:
        return np.zeros(0, dtype=np.int64)
    b = u.astype(np.float64).view(np.uint64)
    bl = (b >> np.uint64(52)).astype(np.int64) - 1022
    np.maximum(bl, 0, out=bl)          # u == 0 -> biased exponent 0
    np.minimum(bl, 64, out=bl)         # 2^64-ulp rounds up to 2^64
    if (u >= np.uint64(1 << 53)).any():
        sh = np.maximum(bl - 1, 0).astype(np.uint64)
        np.minimum(sh, np.uint64(63), out=sh)
        over = (u >> sh) == 0
        over &= bl > 0
        bl[over] -= 1
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
