"""Unit tests for engine.varint and engine.bitpack (SURVEY.md §5.2)."""

import numpy as np
import pytest

from engine.varint import (bit_length_u64, decode_signed_varints,
                           decode_varints, encode_signed_varints,
                           encode_varints, varint_lengths, zigzag_decode,
                           zigzag_encode)
from engine.bitpack import (closest_aligned_fixed_bits, closest_fixed_bits,
                            decode_bit_width, encode_bit_width, pack_bits,
                            packed_matrix, percentile_bits, unpack_bits,
                            unpack_matrix)

RNG = np.random.default_rng(42)


def _ref_varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_zigzag_known():
    v = np.array([0, -1, 1, -2, 2, 2**62, -(2**62), np.iinfo(np.int64).min],
                 dtype=np.int64)
    z = zigzag_encode(v)
    assert list(z[:5]) == [0, 1, 2, 3, 4]
    assert np.array_equal(zigzag_decode(z), v)


def test_bit_length():
    v = np.array([0, 1, 2, 3, 255, 256, 2**32 - 1, 2**32, 2**63],
                 dtype=np.uint64)
    expect = [0, 1, 2, 2, 8, 9, 32, 33, 64]
    assert list(bit_length_u64(v)) == expect


def test_varint_roundtrip_and_bytes():
    vals = [0, 1, 127, 128, 300, 2**21 - 1, 2**21, 2**63, 2**64 - 1]
    u = np.array(vals, dtype=np.uint64)
    enc = encode_varints(u)
    assert enc.tobytes() == b"".join(_ref_varint(x) for x in vals)
    assert np.array_equal(varint_lengths(u),
                          [len(_ref_varint(x)) for x in vals])
    dec, nb = decode_varints(enc)
    assert nb == len(enc)
    assert np.array_equal(dec, u)
    # partial decode
    dec2, nb2 = decode_varints(enc, count=3)
    assert np.array_equal(dec2, u[:3])
    assert nb2 == 3


def test_varint_random_roundtrip():
    u = RNG.integers(0, 2**63, 10000, dtype=np.uint64) \
        >> RNG.integers(0, 60, 10000, dtype=np.uint64)
    enc = encode_varints(u)
    dec, nb = decode_varints(enc, count=len(u))
    assert nb == len(enc)
    assert np.array_equal(dec, u)


def test_signed_varint_roundtrip():
    v = RNG.integers(-2**62, 2**62, 5000, dtype=np.int64)
    dec, _ = decode_signed_varints(encode_signed_varints(v), count=len(v))
    assert np.array_equal(dec, v)


def test_varint_empty():
    assert encode_varints(np.zeros(0, np.uint64)).size == 0
    vals, nb = decode_varints(np.zeros(0, np.uint8), count=0)
    assert vals.size == 0 and nb == 0


def test_width_tables():
    assert closest_fixed_bits(0) == 1
    assert closest_fixed_bits(3) == 3
    assert closest_fixed_bits(25) == 26
    assert closest_fixed_bits(33) == 40
    assert closest_aligned_fixed_bits(3) == 4
    assert closest_aligned_fixed_bits(17) == 24  # PROBES.md P4 delta width
    for w in [1, 2, 24, 26, 28, 30, 32, 40, 48, 56, 64]:
        assert decode_bit_width(encode_bit_width(w)) == w
    assert encode_bit_width(24) == 23  # P4: code 10111
    assert encode_bit_width(2) == 1    # P5: DATA ids
    assert encode_bit_width(4) == 3    # P5: LENGTH stream


def test_percentile_bits():
    # 100 values: 95 small (3 bits), 5 big (20 bits)
    u = np.array([5] * 95 + [2**19] * 5, dtype=np.uint64)
    assert percentile_bits(u, 1.0) == 20
    # ORC allows int(n*(1-p)) overflowing values: at p=0.95 exactly the 5
    # big values are within budget, so the 95p width is 3
    assert percentile_bits(u, 0.95) == 3
    assert percentile_bits(u, 0.96) == 20
    assert percentile_bits(u, 0.90) == 3
    assert percentile_bits(u, 0.90, aligned=True) == 4


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 7, 8, 11, 16, 17, 23, 24,
                               26, 31, 32, 33, 40, 48, 55, 56, 63, 64])
def test_pack_roundtrip(w):
    n = 1000
    hi = 2**64 if w == 64 else 2**w
    v = RNG.integers(0, min(hi, 2**63 - 1), n, dtype=np.uint64)
    if w == 64:
        v = v | (RNG.integers(0, 2, n, dtype=np.uint64) << np.uint64(63))
    packed = pack_bits(v, w)
    assert packed.size == (n * w + 7) // 8
    out = unpack_bits(packed, n, w)
    assert np.array_equal(out, v)


def test_pack_bigendian_order():
    # 2-bit values [2,0,2,1] -> bits 10 00 10 01 -> 0x89 (PROBES.md P5)
    assert pack_bits(np.array([2, 0, 2, 1], np.uint64), 2).tobytes() == b"\x89"
    # 4-bit [5,6,6] -> 0101 0110 0110 0000 -> 56 60 (P5 LENGTH)
    assert pack_bits(np.array([5, 6, 6], np.uint64), 4).tobytes() == b"\x56\x60"


@pytest.mark.parametrize("w", [1, 3, 4, 8, 13, 16, 24, 33, 64])
def test_packed_matrix_roundtrip(w):
    lens = np.array([512, 1, 17, 512, 100, 3, 511], dtype=np.int64)
    total = int(lens.sum())
    hi = 2**63 - 1 if w >= 63 else 2**w
    vals = RNG.integers(0, hi, total, dtype=np.uint64)
    payload, nbytes = packed_matrix(vals, lens, w)
    assert np.array_equal(nbytes, (lens * w + 7) // 8)
    assert payload.size == int(nbytes.sum())
    # each window independently decodable
    out = unpack_matrix(payload, lens, w)
    assert np.array_equal(out, vals)
    # cross-check window 2 against scalar pack of its own values
    off = int(nbytes[:2].sum())
    seg = payload[off: off + int(nbytes[2])]
    v2 = vals[int(lens[:2].sum()): int(lens[:3].sum())]
    assert np.array_equal(seg, pack_bits(v2, w))


def test_bit_length_binade_boundaries():
    """The IEEE-exponent fast path can only overestimate by 1, and only
    when float64 rounding lands exactly on the next power of two; pin
    every binade boundary from both sides plus the 2^64 ceiling."""
    for k in range(1, 64):
        one = np.uint64(1)
        below = (one << np.uint64(k)) - np.arange(1, 100, dtype=np.uint64)
        above = (one << np.uint64(k)) + np.arange(0, 100, dtype=np.uint64)
        vals = np.concatenate([below, above])
        expect = np.array([int(x).bit_length() for x in vals.tolist()])
        assert np.array_equal(bit_length_u64(vals), expect), k
    top = np.array([2**64 - 1, 2**64 - 2, 2**63, 2**63 - 1, 2**53,
                    2**53 - 1, 2**53 + 1], dtype=np.uint64)
    assert list(bit_length_u64(top)) == [64, 64, 64, 63, 54, 53, 54]


def test_packed_matrix_uniform_prefix_tail_path():
    """The uniform-except-trailing-remainder fast path (every MAX_SCOPE
    split's shape) must match the per-window scalar reference exactly,
    for byte-multiple, sub-byte, and odd widths."""
    for w in (1, 2, 4, 7, 8, 16, 17, 24, 26, 32, 40, 64):
        for k, full, tail in ((2, 512, 1), (5, 512, 511), (3, 8, 3),
                              (2, 1, 1)):
            lens = np.full(k, full, dtype=np.int64)
            lens[-1] = tail
            hi = 2**63 - 1 if w >= 63 else 2**w
            vals = RNG.integers(0, hi, int(lens.sum()), dtype=np.uint64)
            payload, nbytes = packed_matrix(vals, lens, w)
            offs = np.concatenate(([0], np.cumsum(lens)))
            ref = np.concatenate([pack_bits(vals[offs[i]:offs[i + 1]], w)
                                  for i in range(k)])
            assert np.array_equal(payload, ref), (w, k, full, tail)
            assert np.array_equal(unpack_matrix(payload, lens, w), vals), \
                (w, k, full, tail)
