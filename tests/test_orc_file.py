"""engine/orc_file.py: real ORC v1 file emission, verified by TWO
independent readers — ORC C++ (pyarrow.orc) and orc-core Java
(spark.read.orc)."""

import decimal as pydec
import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest
import pyarrow.orc as orc

from engine.orc_file import write_orc
from jobs.synth import token_table

RNG = np.random.default_rng(11)


def _roundtrip_cpp(t: pa.Table, **kw) -> pa.Table:
    f = tempfile.mktemp(suffix=".orc")
    write_orc(t, f, **kw)
    return orc.read_table(f), f


def _assert_equal(t: pa.Table, back: pa.Table):
    for n in t.column_names:
        assert back.column(n).cast(t.column(n).type).to_pylist() \
            == t.column(n).to_pylist(), n


def test_primitives_read_by_orc_cpp():
    t = pa.table({
        "a": pa.array(RNG.integers(-10 ** 12, 10 ** 12, 4000),
                      type=pa.int64()),
        "b": pa.array(RNG.normal(size=4000), type=pa.float64()),
        "s": pa.array([f"val{int(i) % 50}"
                       for i in RNG.integers(0, 10 ** 6, 4000)]),
    })
    back, _ = _roundtrip_cpp(t)
    _assert_equal(t, back)


def test_token_table_read_by_orc_cpp_multi_stripe():
    t = token_table(5000)
    back, _ = _roundtrip_cpp(t, stripe_rows=1234)
    _assert_equal(t, back)


def test_nulls_present_streams_read_by_orc_cpp():
    n = 2000
    toks = [None if RNG.random() < 0.2 else
            list(RNG.integers(0, 50000, RNG.integers(0, 9)))
            for _ in range(n)]
    t = pa.table({
        "doc": pa.array([None if RNG.random() < 0.3 else f"d{i}"
                         for i in range(n)]),
        "tokens": pa.array(toks, type=pa.list_(pa.int32())),
        "x": pa.array([None if RNG.random() < 0.5 else int(v)
                       for v in RNG.integers(-100, 100, n)],
                      type=pa.int32()),
    })
    back, _ = _roundtrip_cpp(t)
    _assert_equal(t, back)


def test_temporal_decimal_binary_read_by_orc_cpp():
    ts = (RNG.integers(-3 * 10 ** 9, 3 * 10 ** 9, 1000) * 10 ** 9
          + RNG.integers(0, 10 ** 9, 1000))
    t = pa.table({
        "ts": pa.array(ts.view("datetime64[ns]"),
                       type=pa.timestamp("ns")),
        "d": pa.array([int(x) for x in RNG.integers(-20000, 20000, 1000)],
                      type=pa.int32()).cast(pa.date32()),
        "dec": pa.array([pydec.Decimal(int(x)).scaleb(-4)
                         for x in RNG.integers(-10 ** 15, 10 ** 15, 1000)],
                        type=pa.decimal128(38, 4)),
        "bin": pa.array([RNG.integers(0, 256, RNG.integers(0, 20))
                         .astype(np.uint8).tobytes() for _ in range(1000)],
                        type=pa.binary()),
    })
    back, _ = _roundtrip_cpp(t)
    _assert_equal(t, back)


def _footer_column_stats(path):
    """(numberOfValues, hasNull) per flattened column from Footer
    statistics (field 7), via the hand-rolled tail walker."""
    from tests.orc_tail import _fields
    with open(path, "rb") as f:
        data = f.read()
    ps_len = data[-1]
    ps = data[-1 - ps_len: -1]
    footer_len = next(v for fno, _, v in _fields(ps) if fno == 1)
    footer = data[-1 - ps_len - footer_len: -1 - ps_len]
    stats = []
    for fno, _, v in _fields(footer):
        if fno == 7:
            nv, hn = 0, 0
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    nv = v2
                elif f2 == 10:
                    hn = v2
            stats.append((nv, bool(hn)))
    return stats


def test_footer_stats_aggregate_across_stripes():
    # nulls ONLY in the first stripe: file-level numberOfValues must sum
    # non-null counts over ALL stripes and hasNull must OR them (a
    # last-stripe-only footer would claim 10 values / hasNull=false)
    x = [None if i < 5 else i for i in range(30)]
    t = pa.table({"x": pa.array(x, type=pa.int64())})
    back, f = _roundtrip_cpp(t, stripe_rows=10)
    _assert_equal(t, back)
    stats = _footer_column_stats(f)
    assert stats[0] == (30, False)   # struct root: one value per row
    assert stats[1] == (25, True)    # x: 25 non-null, nulls present


def test_token_table_read_by_orc_java(spark):
    # second independent reader: orc-core (Java) through Spark
    t = token_table(2000)
    f = tempfile.mktemp(suffix=".orc")
    write_orc(t, f)
    got = (spark.read.orc(f)
           .orderBy("doc_id")
           .collect())
    want = t.sort_by("doc_id")
    assert [r["doc_id"] for r in got] == want.column("doc_id").to_pylist()
    assert [r["tokens"] for r in got] == \
        want.column("tokens").combine_chunks().to_pylist()
    assert [r["n_tok"] for r in got] == want.column("n_tok").to_pylist()
    assert [r["source"] for r in got] == want.column("source").to_pylist()


def test_distributed_orc_dir_write(spark):
    # jobs/orc_write.py: one part-file per physical partition, no
    # driver-side collect; read back by BOTH independent readers
    import glob
    import os

    from jobs.orc_write import write_orc_dir
    t = token_table(3000)
    df = spark.createDataFrame(t).repartition(4)
    out = tempfile.mkdtemp(prefix="orc_dir_")
    manifest = write_orc_dir(df, out).collect()
    files = sorted(glob.glob(os.path.join(out, "part-*.orc")))
    assert len(files) == 4 == len(manifest)
    assert sum(m["n_rows"] for m in manifest) == 3000
    assert {m["path"] for m in manifest} == set(files)
    for m in manifest:
        assert m["n_bytes"] == os.path.getsize(m["path"])
    # orc-core (Java) reads the whole directory
    got = spark.read.orc(out).orderBy("doc_id").collect()
    want = t.sort_by("doc_id")
    assert [r["doc_id"] for r in got] == want.column("doc_id").to_pylist()
    assert [r["tokens"] for r in got] == \
        want.column("tokens").combine_chunks().to_pylist()
    # ORC C++ reads each part-file
    n_cpp = sum(orc.read_table(f).num_rows for f in files)
    assert n_cpp == 3000


# --- ROW_INDEX emission: seek positions verified by orc-core ------------


def _indexed_table(n=50_000):
    rng = np.random.default_rng(5)
    x = np.arange(n, dtype=np.int64)
    return pa.table({
        "x": pa.array(x),                         # sorted -> rg pruning
        "p": pa.array(rng.integers(0, 1000, n)),
        # long valid runs crossing group boundaries exercise nonzero
        # PRESENT run/bit skip states in the reader
        "nv": pa.array([None if (i // 3000) % 2 == 0 and i % 17 == 0
                        else int(i) for i in range(n)],
                       type=pa.int64()),
        "s": pa.array([f"k{i % 40}" for i in range(n)]),     # dict
        "u": pa.array([f"unique-{i}" for i in range(n)]),    # direct
        "toks": pa.array([[int(i) % 9] * (i % 4) for i in range(n)],
                         type=pa.list_(pa.int32())),
    })


def test_row_index_spark_filter_pushdown_seek(spark):
    """orc-core (Spark) seeks to matching row groups through the
    positions this writer records: a pushed range filter over a sorted
    column returns exactly the right rows for EVERY column type."""
    t = _indexed_table()
    d = tempfile.mkdtemp()
    write_orc(t, os.path.join(d, "part.orc"), stripe_rows=50_000,
              row_index_stride=1000)
    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    got = (spark.read.orc(d).filter("x >= 37500 and x < 38200")
           .orderBy("x").collect())
    assert len(got) == 700
    for r, i in zip(got, range(37500, 38200)):
        assert r.x == i and r.s == f"k{i % 40}" and r.u == f"unique-{i}"
        assert r.toks == [i % 9] * (i % 4)
        nv_exp = None if (i // 3000) % 2 == 0 and i % 17 == 0 else i
        assert r.nv == nv_exp


def test_row_index_positions_actually_consumed(spark):
    """Prove orc-core SEEKS via the recorded positions (doesn't just
    scan): corrupting every position breaks the pushdown read while
    the sequential (non-pushdown) read stays correct."""
    import engine.orc_file as of

    orig = of._row_index_pb

    def corrupt(col):
        out = b""
        for pos, nv, hn, st in col.rg:
            body = b""
            if pos:
                body += of.pb_bytes(1, b"".join(of._uv(p + 7)
                                                for p in pos))
            body += of.pb_bytes(2, of._col_stats_pb(nv, hn, st))
            out += of.pb_bytes(1, body)
        return out

    x = np.arange(50_000, dtype=np.int64)
    t = pa.table({"x": pa.array(x), "p": pa.array((x * 3) % 997)})
    d = tempfile.mkdtemp()
    of._row_index_pb = corrupt
    try:
        write_orc(t, os.path.join(d, "part.orc"), row_index_stride=1000)
    finally:
        of._row_index_pb = orig
    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    broken = False
    try:
        rows = (spark.read.orc(d)
                .filter("x >= 37500 and x < 38200").collect())
        broken = len(rows) != 700 or any(r.p != (r.x * 3) % 997
                                         for r in rows)
    except Exception:
        broken = True
    assert broken, "orc-core ignored the corrupted seek positions"
    spark.conf.set("spark.sql.orc.filterPushdown", "false")
    rows = (spark.read.orc(d)
            .filter("x >= 37500 and x < 38200").collect())
    assert len(rows) == 700 and all(r.p == (r.x * 3) % 997 for r in rows)
    spark.conf.set("spark.sql.orc.filterPushdown", "true")


def test_int8_byte_rle_read_by_orc_cpp():
    """tinyint DATA must be byte-RLE (not RLEv2) — ORC C++ aborts on
    the wrong encoding."""
    v = np.arange(3000) % 256 - 128
    mask = np.arange(3000) % 7 == 0
    t = pa.table({"y": pa.array(v, type=pa.int8(), mask=mask)})
    back, _ = _roundtrip_cpp(t, row_index_stride=500)
    _assert_equal(t, back)


def test_bloom_streams_consumed_by_orc_core(spark):
    """BLOOM_FILTER_UTF8 emission: honest blooms let an equality
    pushdown return the exact row (our bit placement satisfies
    orc-core's probes); all-zero blooms make orc-core skip every row
    group (proving it consults the emitted bitsets)."""
    import engine.orc_file as of

    n = 40_000
    rng = np.random.default_rng(9)
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({"id": pa.array(ids),
                  "key": pa.array([f"doc-{int(i)}" for i in ids])})
    target = int(ids[31337])
    d = tempfile.mkdtemp()
    write_orc(t, os.path.join(d, "part.orc"), row_index_stride=1000,
              bloom_columns=("id", "key"))

    d2 = tempfile.mkdtemp()
    orig = of._bloom_index_pb

    def empty_blooms(arr, col, stride, fpp):
        out = b""
        for _ in range(len(col.rg)):
            out += of.pb_bytes(1, of.pb_varint(1, 3)
                               + of.pb_bytes(3, b"\0" * 128))
        return out

    of._bloom_index_pb = empty_blooms
    try:
        write_orc(t, os.path.join(d2, "part.orc"), row_index_stride=1000,
                  bloom_columns=("id", "key"))
    finally:
        of._bloom_index_pb = orig

    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    good = spark.read.orc(d).filter(f"id = {target}").collect()
    assert len(good) == 1 and good[0].key == f"doc-{target}"
    assert spark.read.orc(d2).filter(f"id = {target}").count() == 0
    assert (spark.read.orc(d2)
            .filter(f"key = 'doc-{target}'").count()) == 0


# --- zlib-compressed emission --------------------------------------------


def _rich_table(n=50_000):
    rng = np.random.default_rng(5)
    x = np.arange(n, dtype=np.int64)
    return pa.table({
        "x": pa.array(x),
        "nv": pa.array([None if (i // 3000) % 2 == 0 and i % 17 == 0
                        else int(i) for i in range(n)],
                       type=pa.int64()),
        "s": pa.array([f"k{i % 40}" for i in range(n)]),      # dict
        "u": pa.array([f"unique-{i}" for i in range(n)]),     # direct
        "toks": pa.array([[int(i) % 9] * (i % 4) for i in range(n)],
                         type=pa.list_(pa.int32())),
        "f": pa.array(rng.normal(size=n)),
        "ts": pa.array((x - n // 2) * 10 ** 9,
                       type=pa.timestamp("ns")),
        "d": pa.array([pydec.Decimal(f"{i}.{i % 100:02d}")
                       for i in range(0, 3 * n, 3)],
                      type=pa.decimal128(18, 2)),
        "b": pa.array([bytes([i % 251]) * (i % 5) for i in range(n)],
                      type=pa.large_binary()),
    })


@pytest.mark.parametrize("compression", ["zlib", "snappy", "lz4",
                                         "zstd"])
def test_compressed_emission_cpp_and_engine_read(compression):
    """compression='zlib'/'zstd' chunk-frames every region; ORC C++
    and the engine's own reader decode the file bit-identically at
    well under the uncompressed size."""
    from engine.orc_read import read_orc
    t = _rich_table()
    fz = tempfile.mktemp(suffix=".orc")
    fn = tempfile.mktemp(suffix=".orc")
    write_orc(t, fz, stripe_rows=30_000, row_index_stride=1000,
              compression=compression)
    write_orc(t, fn, stripe_rows=30_000, row_index_stride=1000)
    assert os.path.getsize(fz) < 0.6 * os.path.getsize(fn)
    for back in (orc.read_table(fz), read_orc(fz)):
        for c in t.column_names:
            assert back.column(c).cast(t.column(c).type).to_pylist() \
                == t.column(c).to_pylist(), c
    os.unlink(fz)
    os.unlink(fn)


@pytest.mark.parametrize("compression", ["zlib", "snappy", "lz4",
                                         "zstd"])
def test_compressed_emission_engine_rowgroup_seek(compression):
    """The engine reader seeks row groups in its OWN compressed files
    through the 2-slot [chunk offset, offset in chunk] positions."""
    from engine.orc_read import read_orc
    t = _rich_table()
    f = tempfile.mktemp(suffix=".orc")
    write_orc(t, f, stripe_rows=30_000, row_index_stride=1000,
              compression=compression)
    got = read_orc(f, filters=[("x", ">=", 37_500), ("x", "<", 38_200)])
    gx = got.column("x").to_pylist()
    assert set(range(37_500, 38_200)).issubset(set(gx))
    assert len(gx) == 2000
    exp = t.slice(min(gx), len(gx))
    for c in t.column_names:
        assert got.column(c).cast(t.column(c).type).to_pylist() \
            == exp.column(c).to_pylist(), c
    os.unlink(f)


@pytest.mark.parametrize("compression", ["zlib", "lz4", "zstd"])
def test_compressed_emission_orc_core_pushdown_seek(spark, compression):
    """orc-core (Spark) seeks via the COMPRESSED positions the writer
    records — a pushed range filter over a compressed multi-column
    file returns exactly the right rows."""
    n = 50_000
    t = _rich_table(n).drop_columns(["d"])  # Spark decimal cast noise
    d = tempfile.mkdtemp()
    write_orc(t, os.path.join(d, "part.orc"), stripe_rows=50_000,
              row_index_stride=1000, compression=compression)
    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    got = (spark.read.orc(d).filter("x >= 37500 and x < 38200")
           .orderBy("x").collect())
    assert len(got) == 700
    for r, i in zip(got, range(37500, 38200)):
        assert r.x == i and r.s == f"k{i % 40}" and r.u == f"unique-{i}"
        assert r.toks == [i % 9] * (i % 4)
        nv_exp = None if (i // 3000) % 2 == 0 and i % 17 == 0 else i
        assert r.nv == nv_exp


def test_zlib_emission_blooms_consumed(spark):
    """BLOOM_FILTER_UTF8 streams survive compression: orc-core's
    equality pushdown probes them and returns the exact row."""
    n = 40_000
    rng = np.random.default_rng(9)
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({"id": pa.array(ids),
                  "key": pa.array([f"doc-{int(i)}" for i in ids])})
    d = tempfile.mkdtemp()
    write_orc(t, os.path.join(d, "part.orc"), row_index_stride=1000,
              bloom_columns=("id", "key"), compression="zlib")
    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    target = int(ids[31337])
    good = spark.read.orc(d).filter(f"id = {target}").collect()
    assert len(good) == 1 and good[0].key == f"doc-{target}"


def test_boolean_column_both_codecs(spark):
    """BOOLEAN columns (bit-stream DATA): roundtrip through ORC C++
    and the engine reader at both codecs, row-group seek included
    ([offset, byte-RLE run, bit] positions), and orc-core seeks
    through them under pushdown."""
    from engine.orc_read import read_orc
    n = 40_000
    rng = np.random.default_rng(11)
    b = rng.random(n) < 0.3
    b[5000:9000] = True       # long runs cross group boundaries
    mask = np.arange(n) % 11 == 0
    t = pa.table({"ok": pa.array(b, type=pa.bool_(), mask=mask),
                  "x": pa.array(np.arange(n))})
    for compression in ("none", "zlib"):
        f = tempfile.mktemp(suffix=".orc")
        write_orc(t, f, stripe_rows=15_000, row_index_stride=1000,
                  compression=compression)
        assert orc.read_table(f).column("ok").to_pylist() \
            == t.column("ok").to_pylist(), compression
        assert read_orc(f).column("ok").to_pylist() \
            == t.column("ok").to_pylist(), compression
        got = read_orc(f, filters=[("x", ">=", 7_500),
                                   ("x", "<", 8_200)])
        gx = got.column("x").to_pylist()
        lo = min(gx)
        assert got.column("ok").to_pylist() \
            == t.column("ok").to_pylist()[lo:lo + len(gx)], compression
        os.unlink(f)
    d = tempfile.mkdtemp()
    write_orc(t, os.path.join(d, "p.orc"), stripe_rows=40_000,
              row_index_stride=1000, compression="zlib")
    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    rows = (spark.read.orc(d).filter("x >= 7500 and x < 8200")
            .orderBy("x").collect())
    assert len(rows) == 700
    for r, i in zip(rows, range(7500, 8200)):
        assert r.ok == (None if i % 11 == 0 else bool(b[i])), i


def test_nan_stripe_stats_omitted(spark):
    """Floats with NaN: ORC writers omit min/max at EVERY granularity
    that contains the NaN. A stripe/file stat aggregated only over the
    NaN-free row groups would under-report max and stats-filters would
    silently drop real rows (rows 0..2999, NaN at 2500, f > 2600)."""
    from engine.orc_read import (read_orc, read_orc_tail,
                                 stripes_matching)
    v = np.arange(3000, dtype=np.float64)
    v[2500] = np.nan
    t = pa.table({"f": v})
    f = tempfile.mktemp(suffix=".orc")
    write_orc(t, f, stripe_rows=3000, row_index_stride=1000)
    info = read_orc_tail(f)
    # the stripe must NOT be pruned (its stat must be absent, not
    # built from groups 0-1 whose max is 1999)
    assert stripes_matching(info, [("f", ">", 2600.0)]) == [0]
    # read_orc returns a SUPERSET (exact filter applies downstream);
    # the defect was that the matching rows were MISSING entirely
    got = set(read_orc(f, filters=[("f", ">", 2600.0)])
              .column("f").to_pylist())
    assert set(np.arange(2601, 3000, dtype=np.float64)) <= got
    # Spark's own pushdown on the same file must see the rows too
    d = tempfile.mkdtemp()
    write_orc(t, os.path.join(d, "p.orc"), stripe_rows=3000,
              row_index_stride=1000)
    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    # 399 reals + the NaN (Spark orders NaN above every double)
    assert spark.read.orc(d).filter("f > 2600").count() == 400
    # multi-stripe: the NaN stripe poisons the FILE stat, but the
    # NaN-free stripes keep theirs (stripe pruning still works)
    f2 = tempfile.mktemp(suffix=".orc")
    write_orc(t, f2, stripe_rows=1000, row_index_stride=500)
    info2 = read_orc_tail(f2)
    assert stripes_matching(info2, [("f", ">", 2600.0)]) == [2]
    got2 = set(read_orc(f2, filters=[("f", ">", 2600.0)])
               .column("f").to_pylist())
    assert set(np.arange(2601, 3000, dtype=np.float64)) <= got2
    os.unlink(f)
    os.unlink(f2)


def test_brotli_emission_engine_roundtrip():
    """compression='brotli' (CompressionKind 6): engine write + read,
    row-group seek through the brotli chunk framing. No independent
    ORC brotli implementation exists in this sandbox (no brotli4j,
    pyarrow's ORC build predates kind 6), so this codec is the one
    without cross-impl coverage — the chunk bodies are standard
    brotli streams via pyarrow's codec and the framing is the same
    path every other codec exercises cross-impl."""
    from engine.orc_read import read_orc, read_orc_tail
    t = _rich_table()
    fz = tempfile.mktemp(suffix=".orc")
    fn = tempfile.mktemp(suffix=".orc")
    write_orc(t, fz, stripe_rows=30_000, row_index_stride=1000,
              compression="brotli")
    write_orc(t, fn, stripe_rows=30_000, row_index_stride=1000)
    assert read_orc_tail(fz).compression == 6
    assert os.path.getsize(fz) < 0.6 * os.path.getsize(fn)
    back = read_orc(fz)
    for c in t.column_names:
        assert back.column(c).cast(t.column(c).type).to_pylist() \
            == t.column(c).to_pylist(), c
    got = read_orc(fz, filters=[("x", ">=", 37_500), ("x", "<", 38_200)])
    gx = got.column("x").to_pylist()
    assert set(range(37_500, 38_200)).issubset(set(gx))
    assert len(gx) == 2000
    os.unlink(fz)
    os.unlink(fn)


def test_timestamp_instant_emission():
    """timestamp_instant=True: tz-aware Arrow timestamps emit
    TIMESTAMP_INSTANT (kind 18) — same stream layout as TIMESTAMP but
    UTC-based, readers skip the writer-timezone adjustment. Verified
    by ORC C++ (which maps it back to timestamp[ns, tz=UTC]) and the
    engine reader. Default False keeps plain TIMESTAMP because
    spark.read.orc cannot parse instant columns."""
    from engine.orc_read import read_orc, read_orc_tail
    n = 20_000
    ns = (np.arange(n, dtype=np.int64) - n // 2) * 10 ** 9 + 123456789
    t = pa.table({
        "ts_plain": pa.array(ns, type=pa.timestamp("ns")),
        "ts_utc": pa.array(ns, type=pa.timestamp("ns", tz="UTC")),
    })
    f = tempfile.mktemp(suffix=".orc")
    write_orc(t, f, row_index_stride=1000, timestamp_instant=True)
    info = read_orc_tail(f)
    assert [info.types[i].kind for i in (1, 2)] == [9, 18]
    # default: tz-aware still writes plain TIMESTAMP (Spark-readable)
    fd = tempfile.mktemp(suffix=".orc")
    write_orc(t, fd)
    assert [read_orc_tail(fd).types[i].kind for i in (1, 2)] == [9, 9]
    os.unlink(fd)
    back = read_orc(f)
    assert back.column("ts_plain").to_pylist() \
        == t.column("ts_plain").to_pylist()
    assert back.column("ts_utc").cast(pa.timestamp("ns", tz="UTC")) \
        .to_pylist() == t.column("ts_utc").to_pylist()
    cpp = orc.read_table(f)
    assert str(cpp.schema.field("ts_utc").type) == "timestamp[ns, tz=UTC]"
    assert cpp.column("ts_plain").to_pylist() \
        == t.column("ts_plain").to_pylist()
    assert cpp.column("ts_utc").cast(pa.timestamp("ns", tz="UTC")) \
        .to_pylist() == t.column("ts_utc").to_pylist()
    # row-group pruned seek via the emitted TimestampStatistics
    # ([DATA, SECONDARY] position slots; ns-literal filters)
    got = read_orc(f, filters=[("ts_plain", ">=",
                                int(ns[n - 2000]))])
    assert got.num_rows <= 3000
    assert set(ns[-2000:].tolist()) <= set(
        got.column("ts_plain").cast(pa.int64()).to_pylist())
    os.unlink(f)


def test_double_decimal_blooms_consumed_by_orc_core(spark):
    """Engine-written BLOOM_FILTER_UTF8 on double and decimal columns
    satisfies orc-core's probes (honest blooms -> exact row through a
    pushed Spark equality filter) and is genuinely consulted
    (all-zero blooms -> zero rows for the same filter). Doubles hash
    as doubleToLongBits through the SIGNED-shift getLongHash; decimals
    as minimal HiveDecimal strings."""
    import decimal as pydec

    import engine.orc_file as of

    n = 40_000
    rng = np.random.default_rng(21)
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({
        "price": pa.array(ids.astype(np.float64) * 1.25 + 0.125),
        "amt": pa.array([pydec.Decimal(int(i)).scaleb(-2) for i in ids],
                        type=pa.decimal128(14, 2)),
    })
    k = int(ids[31337])
    d = tempfile.mkdtemp()
    write_orc(t, os.path.join(d, "part.orc"), row_index_stride=1000,
              bloom_columns=("price", "amt"))

    d2 = tempfile.mkdtemp()
    orig = of._bloom_index_pb

    def empty_blooms(arr, col, stride, fpp):
        out = b""
        for _ in range(len(col.rg)):
            out += of.pb_bytes(1, of.pb_varint(1, 3)
                               + of.pb_bytes(3, b"\0" * 128))
        return out

    of._bloom_index_pb = empty_blooms
    try:
        write_orc(t, os.path.join(d2, "part.orc"),
                  row_index_stride=1000, bloom_columns=("price", "amt"))
    finally:
        of._bloom_index_pb = orig

    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    good = spark.read.orc(d).filter(f"price = {k * 1.25 + 0.125!r}") \
        .collect()
    assert len(good) == 1
    amt_lit = f"cast({pydec.Decimal(k).scaleb(-2)} as decimal(14,2))"
    good = spark.read.orc(d).filter(f"amt = {amt_lit}").collect()
    assert len(good) == 1
    assert (spark.read.orc(d2)
            .filter(f"price = {k * 1.25 + 0.125!r}").count()) == 0
    # orc-core 2.2.2 does not probe blooms for DECIMAL predicates
    # (observed: the zero-bloom file still returns the row), so the
    # decimal cross-implementation proof is the ORC C++-writer test in
    # test_orc_read.py; the honest-bloom read above still pins the
    # emitted stream as well-formed for orc-core.
    assert spark.read.orc(d2).filter(f"amt = {amt_lit}").count() == 1


def test_all_null_columns_with_row_index():
    """Fuzz regression (tools/fuzz_cross_impl.py seed 425): a column
    whose every row is null emits ZERO byte-RLE/bool runs, and the
    run-structure ROW_INDEX position lookup indexed run[-1] of an
    empty array (int8, boolean, and union-tag branches). The empty
    stream's positions are [0, 0(, 0)] — a reader that decodes zero
    values never consumes them. Verified through ORC C++ and this
    engine's reader, index enabled."""
    from engine.orc_read import read_orc
    n = 25       # > 1 row group at stride 10 so positions matter
    t = pa.table({
        "i8": pa.array([None] * n, type=pa.int8()),
        "b": pa.array([None] * n, type=pa.bool_()),
        "l": pa.array([None] * n, type=pa.list_(pa.int64())),
        "anchor": pa.array(range(n), type=pa.int32()),
    })
    f = tempfile.mktemp(suffix=".orc")
    write_orc(t, f, row_index_stride=10)
    _assert_equal(t, orc.read_table(f))
    _assert_equal(t, read_orc(f))
    # seek path: row-group pruning on the anchor column must still
    # decode the all-null columns from their (empty-stream) positions
    got = read_orc(f, filters=[("anchor", ">=", 20)])
    assert got.num_rows <= n and got.column("i8").null_count == got.num_rows


def test_date_bloom_filter_emission_and_pruning():
    """Fuzz regression (tools/fuzz_cross_impl.py seed 7 with blooms):
    bloom_columns on a date32 column crashed — Arrow has no direct
    date32->int64 cast. DATE blooms hash the days-since-epoch long
    (orc-core WriterImpl addLong(days)); an equality literal inside
    every row group's min/max but absent from the column must prune
    via the bloom alone."""
    from engine.orc_read import read_orc
    days = np.tile(np.array([10, 500, 10000, -3000], dtype=np.int32),
                   2500)
    t = pa.table({
        "d": pa.array(days, pa.int32()).cast(pa.date32()),
        "anchor": pa.array(range(10000), pa.int64()),
    })
    f = tempfile.mktemp(suffix=".orc")
    write_orc(t, f, row_index_stride=1000, bloom_columns=("d",))
    _assert_equal(t, orc.read_table(f))          # C++ still reads it
    assert read_orc(f, filters=[("d", "=", 500)]).num_rows == 10000
    # 501 sits inside [-3000, 10000] so stats keep every group; only
    # the bloom can prune it
    assert read_orc(f, filters=[("d", "=", 501)]).num_rows == 0
