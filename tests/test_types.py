"""Per-type encoder tests (SURVEY.md §2.4): round-trips + cross-
implementation decode of streams written by ORC C++ (pyarrow)."""

import datetime
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.orc as orc
import pytest

from engine import types as T
from tests.orc_tail import parse_orc

RNG = np.random.default_rng(31)


def _orc_stripe(arr, pa_type=None):
    f = tempfile.mktemp(suffix=".orc")
    col = pa.array(arr, type=pa_type)
    orc.write_table(pa.table({"x": col}), f, compression="uncompressed")
    return parse_orc(f)[0]


# --- T1 float/double -------------------------------------------------------

def test_float_roundtrip():
    for double in (True, False):
        v = RNG.normal(size=1000)
        enc = T.encode_floats(v, double=double)
        dec = T.decode_floats(enc, 1000, double=double)
        assert np.array_equal(
            dec, v.astype(np.float64 if double else np.float32))


def test_float_cross_impl():
    v = RNG.normal(size=2000)
    s = _orc_stripe(v, pa.float64())
    dec = T.decode_floats(s["streams"][(1, "DATA")], 2000)
    assert np.array_equal(dec, v)
    v32 = v.astype(np.float32)
    s = _orc_stripe(v32, pa.float32())
    dec = T.decode_floats(s["streams"][(1, "DATA")], 2000, double=False)
    assert np.array_equal(dec, v32)


# --- T4 date ---------------------------------------------------------------

def test_date_roundtrip_and_cross_impl():
    days = RNG.integers(-30000, 30000, 1500)
    assert np.array_equal(T.decode_date(T.encode_date(days), 1500), days)
    dates = [datetime.date(1970, 1, 1) + datetime.timedelta(days=int(d))
             for d in days]
    s = _orc_stripe(dates, pa.date32())
    dec = T.decode_date(s["streams"][(1, "DATA")], 1500)
    assert np.array_equal(dec, days)


# --- T3 timestamp ----------------------------------------------------------

def test_timestamp_roundtrip():
    base = 1_700_000_000 * 1_000_000_000
    nanos = np.concatenate([
        RNG.integers(0, 10 ** 9, 500),
        RNG.integers(0, 10 ** 6, 500) * 1000,       # micros (3 zeros)
        RNG.integers(0, 10 ** 3, 500) * 1_000_000,  # millis (6 zeros)
        np.zeros(100, dtype=np.int64),
    ])
    t = base + RNG.integers(-10 ** 9, 10 ** 9, nanos.size) \
        * 1_000_000_000 + nanos
    data, sec = T.encode_timestamp(t)
    dec = T.decode_timestamp(data, sec, t.size)
    assert np.array_equal(dec, t)


def test_timestamp_pre1970_roundtrip():
    # pre-1970 (ORC C++ convention: trunc-toward-zero secs + signed
    # nanos): round-trip is exact for every instant, including the
    # (-1, 0) second that the Java convention garbles.
    secs = RNG.integers(-3_000_000_000, 0, 1200)
    nanos = np.concatenate([
        RNG.integers(0, 10 ** 9, 400),
        RNG.integers(0, 10 ** 6, 400) * 1000,
        np.zeros(400, dtype=np.int64)])
    t = secs * 1_000_000_000 + nanos
    t = np.append(t, [-1, -999_999_999, -500_000_000, 0, 1])
    data, sec = T.encode_timestamp(t)
    assert np.array_equal(T.decode_timestamp(data, sec, t.size), t)


def test_timestamp_pre1970_cross_impl():
    # ORC C++ must decode to the same instants we encoded: write the
    # values via pyarrow ORC and check our decoder agrees (both sides
    # of the negative-seconds adjustment exercised).
    secs = np.arange(-5000, -2, 7, dtype=np.int64)
    nanos = (np.arange(secs.size, dtype=np.int64) * 123_456_789) % 10 ** 9
    t = secs * 1_000_000_000 + nanos
    s = _orc_stripe(t.view("datetime64[ns]"), pa.timestamp("ns"))
    dec = T.decode_timestamp(s["streams"][(1, "DATA")],
                             s["streams"][(1, "SECONDARY")], t.size)
    assert np.array_equal(dec, t)


def test_timestamp_cross_impl():
    # pyarrow writes timestamp[ns] ORC columns with the same layout
    t = np.array([1_500_000_000_000_000_000 + i * 1_000_003
                  for i in range(1000)], dtype=np.int64)
    s = _orc_stripe(t.view("datetime64[ns]"), pa.timestamp("ns"))
    dec = T.decode_timestamp(s["streams"][(1, "DATA")],
                             s["streams"][(1, "SECONDARY")], 1000)
    assert np.array_equal(dec, t)


# --- T2 decimal64 ----------------------------------------------------------

def test_decimal64_roundtrip():
    v = RNG.integers(-(10 ** 17), 10 ** 17, 2000)
    assert np.array_equal(
        T.decode_decimal64(T.encode_decimal64(v), 2000), v)


# --- T5 binary -------------------------------------------------------------

def test_binary_roundtrip_and_cross_impl():
    blobs = [RNG.integers(0, 256, RNG.integers(0, 50)).astype(np.uint8)
             .tobytes() for _ in range(800)]
    data = np.frombuffer(b"".join(blobs), np.uint8)
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    enc = T.encode_binary(data, lens)
    ddata, dlens = T.decode_binary(enc, 800)
    assert np.array_equal(dlens, lens)
    assert ddata.tobytes() == data.tobytes()
    s = _orc_stripe(blobs, pa.binary())
    got_lens = T.decode_binary(
        {"data": b"", "length": s["streams"][(1, "LENGTH")]}, 800)[1]
    assert np.array_equal(got_lens, lens)
    assert s["streams"][(1, "DATA")] == data.tobytes()


# --- S5 char / varchar -----------------------------------------------------

def test_char_pad_and_varchar_truncate():
    vals = [b"a", b"abcdef", b"", b"abc"]
    data = np.frombuffer(b"".join(vals), np.uint8)
    lens = np.array([len(v) for v in vals], dtype=np.int64)
    # CHAR(4): pad to 4
    enc = T.encode_char(data, lens, width=4, pad=True)
    out = T.decode_char(enc, 4)
    assert out.to_pylist() == ["a   ", "abcd", "    ", "abc "]
    # VARCHAR(4): truncate only
    enc = T.encode_char(data, lens, width=4, pad=False)
    out = T.decode_char(enc, 4)
    assert out.to_pylist() == ["a", "abcd", "", "abc"]


def test_timestamp_java_convention_roundtrip():
    # orc-core layout (ORC-611 divergence): round-trips exactly through
    # the matching decoder EXCEPT instants in (-1s, 0) whose sub-second
    # has a nonzero millisecond part — orc-core itself reads those back
    # positive (collision with the (0, N) pair); byte-compat means
    # reproducing that loss faithfully.
    secs = RNG.integers(-3_000_000_000, 3_000_000_000, 1500)
    nanos = np.concatenate([
        RNG.integers(0, 10 ** 9, 500),
        RNG.integers(0, 10 ** 6, 500) * 1000,
        np.zeros(500, dtype=np.int64)])
    t = secs * 1_000_000_000 + nanos
    t = np.append(t, [0, 1, -1_000_000_000, -2_500_000_000,
                      -999_999_000,  # (-1s,0) with ms part == 0: exact
                      1_500_000_000])
    data, sec = T.encode_timestamp(t, convention="java")
    got = T.decode_timestamp(data, sec, t.size, convention="java")
    garbled = (t < 0) & (t > -10 ** 9) & ((t % 10 ** 9) // 10 ** 6 > 0)
    assert np.array_equal(got[~garbled], t[~garbled])
    # the garbled interval reads back as the positive counterpart —
    # exactly what orc-core does
    assert np.array_equal(got[garbled], t[garbled] % 10 ** 9)
    # the documented example: -1us -> +999999us
    d2, s2 = T.encode_timestamp(np.array([-1000]), convention="java")
    assert T.decode_timestamp(d2, s2, 1, convention="java")[0] \
        == 999_999_000


def test_timestamp_java_matches_orc_core_streams(spark):
    # byte-level pin: engine java-convention streams == orc-core
    # (spark.write.orc) streams for the same instants, and the engine
    # decoder reproduces what spark.read.orc returns
    import glob
    import sys
    import tempfile

    sys.path.insert(0, "tests")
    from orc_tail import parse_orc
    us = [999_999, -1, 1, -999, -500_000, 500_000, -1_000_000,
          -2_500_000, -999_999, -86_400_000_001, 0]
    df = spark.createDataFrame([(u,) for u in us], "us long").selectExpr(
        "us", "CAST(timestampadd(MICROSECOND, us, "
        "TIMESTAMP '1970-01-01 00:00:00Z') AS TIMESTAMP) AS ts")
    out = tempfile.mkdtemp(prefix="sparkorc_")
    df.coalesce(1).write.mode("overwrite") \
      .option("compression", "none").orc(out)
    f = glob.glob(f"{out}/part-*.orc")[0]
    s = parse_orc(f)[0]
    n = s["n_rows"]
    t = np.array(us, dtype=np.int64) * 1000
    data, sec = T.encode_timestamp(t, convention="java")
    assert data.tobytes() == bytes(s["streams"][(2, "DATA")])
    assert sec.tobytes() == bytes(s["streams"][(2, "SECONDARY")])
    dec = T.decode_timestamp(s["streams"][(2, "DATA")],
                             s["streams"][(2, "SECONDARY")], n,
                             convention="java")
    got = {r["us"]: r["u"] for r in spark.read.orc(out).selectExpr(
        "us", "timestampdiff(MICROSECOND, "
        "TIMESTAMP '1970-01-01 00:00:00Z', ts) AS u").collect()}
    assert dec.tolist() == [got[u] * 1000 for u in us]


def test_timestamp_java_file_read_by_orc_java(spark):
    # engine-written java-convention file: orc-core (Spark) reads
    # pre-1970 sub-second instants exactly (outside the java-garbled
    # (-1s, 0) ms interval) — the interop gap the cpp convention
    # leaves open by design; default convention unchanged
    import tempfile

    from engine.orc_file import write_orc
    us = np.array([-2_500_000, -86_400_000_001, -999_999,
                   1_500_000, 0, -123_456_789_123_456], dtype=np.int64)
    t = pa.table({
        "i": pa.array(np.arange(us.size, dtype=np.int64)),
        "ts": pa.array(us * 1000).cast(pa.timestamp("ns"))})
    f = tempfile.mktemp(suffix=".orc")
    write_orc(t, f, timestamp_convention="java")
    got = (spark.read.orc(f).orderBy("i")
           .selectExpr("timestampdiff(MICROSECOND, "
                       "TIMESTAMP '1970-01-01 00:00:00Z', ts) AS us")
           .collect())
    assert [r["us"] for r in got] == us.tolist()
