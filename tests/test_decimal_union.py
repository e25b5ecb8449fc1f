"""T2 decimal128 (unbounded zigzag varint mantissa) and T8 union
(tag byte-RLE + branch split/scatter): round-trips + cross-impl decode
of ORC C++-written decimal streams."""

import decimal
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.orc as orc
import pytest

from engine import decimal128 as D
from engine import rle2, union
from tests.orc_tail import parse_orc

RNG = np.random.default_rng(17)


def test_decimal128_roundtrip_edges():
    vals = [int(x) for x in RNG.integers(-10 ** 18, 10 ** 18, 500)]
    vals += [0, 1, -1, 2 ** 126, -(2 ** 126), 10 ** 37, -(10 ** 37),
             2 ** 63, -(2 ** 63), 2 ** 64, -(2 ** 64), 127, -128]
    lo, hi = D.limbs_from_ints(vals)
    buf = D.encode_unbounded_varints(lo, hi)
    lo2, hi2 = D.decode_unbounded_varints(buf, len(vals))
    assert D.ints_from_limbs(lo2, hi2) == vals


def test_decimal128_random_bigints():
    vals = [(int(a) << 64) | int(b) for a, b in zip(
        RNG.integers(-2 ** 62, 2 ** 62, 300),
        RNG.integers(0, 2 ** 63, 300).astype(np.uint64))]
    lo, hi = D.limbs_from_ints(vals)
    buf = D.encode_unbounded_varints(lo, hi)
    assert D.ints_from_limbs(*D.decode_unbounded_varints(buf, 300)) == vals


def test_decimal128_scales_stream():
    vals = [10 ** 30, -(10 ** 25), 42]
    scales = [4, 9, 0]
    lo, hi = D.limbs_from_ints(vals)
    enc = D.encode_decimal128(lo, hi, scales=scales)
    lo2, hi2, sc = D.decode_decimal128(enc, 3)
    assert D.ints_from_limbs(lo2, hi2) == vals
    assert sc.tolist() == scales


def test_decimal128_cross_impl():
    # ORC C++ DATA stream for decimal(38, s) is the same unbounded
    # zigzag varint mantissa; SECONDARY carries the scale.
    mantissas = [12345678901234567890123456789,
                 -98765432109876543210987654321, 0, -1, 10 ** 30,
                 -(10 ** 33), 7]
    dec_vals = [decimal.Decimal(v).scaleb(-4) for v in mantissas]
    f = tempfile.mktemp(suffix=".orc")
    orc.write_table(
        pa.table({"x": pa.array(dec_vals, type=pa.decimal128(38, 4))}),
        f, compression="uncompressed")
    s = parse_orc(f)[0]
    lo, hi = D.decode_unbounded_varints(s["streams"][(1, "DATA")],
                                        len(mantissas))
    # pyarrow Decimal conversion uses 28-digit context: compare against
    # what arrow actually stored
    want = [int(v.scaleb(4)) for v in dec_vals]
    assert D.ints_from_limbs(lo, hi) == want
    sc = rle2.decode_rlev2(s["streams"][(1, "SECONDARY")],
                           len(mantissas), signed=True)
    assert sc.tolist() == [4] * len(mantissas)


def test_union_tags_roundtrip():
    tags = RNG.integers(0, 3, 5000).astype(np.uint8)
    buf = union.encode_tags(tags)
    assert np.array_equal(union.decode_tags(buf, 5000), tags)
    # byte-RLE should crush long runs
    runs = np.repeat(np.arange(5, dtype=np.uint8), 1000)
    # 5 runs of 1000 -> ceil(1000/130) headers each, 2 bytes per run
    assert len(union.encode_tags(runs)) <= 80


def test_union_split_scatter_roundtrip():
    tags = RNG.integers(0, 2, 2000).astype(np.uint8)
    vals = RNG.integers(-10 ** 6, 10 ** 6, 2000)
    branches = union.split_by_tag(tags, vals, 2)
    assert sum(len(b) for b in branches) == 2000
    # branch payloads encode independently (RLEv2 here)
    enc = [rle2.encode_rlev2(b, signed=True) for b in branches]
    dec = [rle2.decode_rlev2(e, len(b), signed=True)
           for e, b in zip(enc, branches)]
    out = union.scatter_by_tag(tags, dec)
    assert np.array_equal(out, vals)


def test_union_rejects_too_many_branches():
    with pytest.raises(ValueError):
        union.encode_tags(np.array([200], dtype=np.uint8))
