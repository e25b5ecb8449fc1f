"""RLEv1 / byte-RLE / boolean round-trip + edge tests (FIXTURES.md E7/E8/E9).

Cross-implementation golden check: orc-core's RunLengthByteWriter
semantics (reference-extract/javap/RunLengthByteWriter.txt:3-5) —
control 0..127 => 3..130 repeats, -1..-128 => 1..128 literals.
"""

import numpy as np
import pytest

from engine.rle1 import (decode_bool, decode_byte_rle, decode_rlev1,
                         encode_bool, encode_byte_rle, encode_rlev1)

RNG = np.random.default_rng(7)


def rt_int(v, signed=True):
    v = np.asarray(v, dtype=np.int64)
    enc = encode_rlev1(v, signed=signed)
    dec = decode_rlev1(enc, len(v), signed=signed)
    assert np.array_equal(dec, v), (v[:20], dec[:20])
    return enc


def rt_bytes(b):
    b = np.asarray(b, dtype=np.uint8)
    enc = encode_byte_rle(b)
    dec = decode_byte_rle(enc, len(b))
    assert np.array_equal(dec, b)
    return enc


# --- integer RLEv1 ----------------------------------------------------------

def test_rlev1_empty():
    assert encode_rlev1(np.array([], dtype=np.int64)).size == 0
    assert decode_rlev1(b"", 0).size == 0


def test_rlev1_golden_run():
    # 7 repeats of 10: control=7-3=4, delta=0, base varint 20 (zigzag 10)
    enc = rt_int([10] * 7)
    assert enc.tobytes() == bytes([4, 0, 20])


def test_rlev1_golden_literals():
    # [2, 300] unsigned: control=-2 (0xFE), varints 2, 300
    enc = encode_rlev1(np.array([2, 300]), signed=False)
    assert enc.tobytes() == bytes([0xFE, 0x02, 0xAC, 0x02])
    assert np.array_equal(decode_rlev1(enc, 2, signed=False), [2, 300])


def test_rlev1_delta_run():
    # arithmetic sequence with delta in [-128, 127] encodes as one run
    v = np.arange(100, 100 + 50 * 3, 3, dtype=np.int64)
    enc = rt_int(v)
    assert enc.size <= 2 + 3  # control + delta + small varint


def test_rlev1_delta_out_of_range():
    # delta 200 > MAX_DELTA=127 -> literals
    rt_int(np.arange(0, 2000, 200, dtype=np.int64))
    rt_int(np.arange(0, -2000, -200, dtype=np.int64))


def test_rlev1_negative_delta():
    rt_int(np.arange(1000, 0, -7, dtype=np.int64))


def test_rlev1_e7_literal_boundaries():
    for n in (1, 2, 127, 128, 129, 130, 131, 256, 257):
        rt_int(RNG.integers(-(2 ** 40), 2 ** 40, n))


def test_rlev1_e7_repeat_boundaries():
    for n in (3, 10, 129, 130, 131, 260, 261, 1000):
        rt_int(np.full(n, 42))
        rt_int(np.full(n, -42))


def test_rlev1_e9_negatives():
    rt_int([-1, 1, -2, 2, 0, -(2 ** 62), 2 ** 62, 5, 5, 5, 5])


def test_rlev1_unsigned():
    v = RNG.integers(0, 2 ** 63, 500)
    enc = encode_rlev1(v, signed=False)
    assert np.array_equal(decode_rlev1(enc, 500, signed=False), v)


def test_rlev1_mixed_runs_literals():
    parts = []
    for _ in range(50):
        parts.append(np.full(int(RNG.integers(1, 200)),
                             int(RNG.integers(-1000, 1000))))
        parts.append(RNG.integers(-(2 ** 30), 2 ** 30,
                                  int(RNG.integers(1, 20))))
    rt_int(np.concatenate(parts))


def test_rlev1_single_value():
    rt_int([12345])
    rt_int([-12345])


def test_rlev1_run_then_arith_junction():
    # boundary value belongs to the earlier segment
    rt_int([1, 1, 1, 5, 6, 7])
    rt_int([5, 6, 7, 1, 1, 1])


# --- byte RLE ---------------------------------------------------------------

def test_byte_rle_empty():
    assert encode_byte_rle(np.array([], dtype=np.uint8)).size == 0


def test_byte_rle_golden():
    # orc spec example: 100 zeros -> 0x61 0x00; [0x44,0x45] -> 0xFE 0x44 0x45
    assert rt_bytes(np.zeros(100, dtype=np.uint8)).tobytes() == \
        bytes([0x61, 0x00])
    assert rt_bytes([0x44, 0x45]).tobytes() == bytes([0xFE, 0x44, 0x45])


def test_byte_rle_e7_boundaries():
    for n in (1, 2, 3, 127, 128, 129, 130, 131, 260, 1000):
        rt_bytes(np.full(n, 7, dtype=np.uint8))
        rt_bytes(RNG.integers(0, 256, n).astype(np.uint8))


def test_byte_rle_mixed():
    parts = []
    for _ in range(100):
        parts.append(np.full(int(RNG.integers(1, 300)),
                             int(RNG.integers(0, 256)), dtype=np.uint8))
    rt_bytes(np.concatenate(parts))


# --- boolean ----------------------------------------------------------------

def test_bool_empty():
    assert encode_bool(np.array([], dtype=bool)).size == 0
    assert decode_bool(b"", 0).size == 0


def test_bool_golden():
    # spec: 8x true -> byte 0xFF, literal chunk 0xFF 0xFF
    enc = encode_bool(np.ones(8, dtype=bool))
    assert enc.tobytes() == bytes([0xFF, 0xFF])
    assert np.array_equal(decode_bool(enc, 8), np.ones(8, dtype=bool))


def test_bool_e8_patterns():
    for n in (1, 7, 8, 9, 63, 64, 65, 1000, 10000):
        for pat in (np.zeros(n, dtype=bool), np.ones(n, dtype=bool),
                    np.arange(n) % 2 == 0, RNG.random(n) < 0.5,
                    np.arange(n) < n // 3):
            enc = encode_bool(pat)
            assert np.array_equal(decode_bool(enc, n), pat)


def test_bool_mostly_set_compresses():
    # PRESENT stream of all-valid rows must collapse to a few bytes
    m = np.ones(100_000, dtype=bool)
    assert encode_bool(m).size < 300


def test_rlev1_cross_impl_v011():
    """Decode RLEv1 streams written by ORC C++ (file_version 0.11 files
    use RLEv1 for integer DATA)."""
    import tempfile
    import pyarrow as pa
    import pyarrow.orc as orc
    from tests.orc_tail import parse_orc
    rng = np.random.default_rng(77)
    v = np.concatenate([
        np.repeat(rng.integers(0, 100, 50), 10),
        rng.integers(-(2 ** 30), 2 ** 30, 500),
        np.arange(0, 1000, 3),
    ]).astype(np.int64)
    f = tempfile.mktemp(suffix=".orc")
    orc.write_table(pa.table({"x": v}), f, compression="uncompressed",
                    file_version="0.11")
    s = parse_orc(f)[0]
    assert np.array_equal(
        decode_rlev1(s["streams"][(1, "DATA")], s["n_rows"]), v)


def test_bool_cross_impl_present_stream():
    """Decode a PRESENT stream written by ORC C++ (nullable column)."""
    import tempfile
    import pyarrow as pa
    import pyarrow.orc as orc
    from tests.orc_tail import parse_orc
    rng = np.random.default_rng(78)
    mask = rng.random(5000) < 0.7
    vals = [int(x) if m else None
            for x, m in zip(rng.integers(0, 100, 5000), mask)]
    f = tempfile.mktemp(suffix=".orc")
    orc.write_table(pa.table({"x": pa.array(vals, type=pa.int64())}), f,
                    compression="uncompressed")
    s = parse_orc(f)[0]
    got = decode_bool(np.frombuffer(s["streams"][(1, "PRESENT")],
                                    np.uint8), 5000)
    assert np.array_equal(got, mask)
