"""engine/orc_file.py: real ORC v1 file emission, verified by TWO
independent readers — ORC C++ (pyarrow.orc) and orc-core Java
(spark.read.orc)."""

import decimal as pydec
import tempfile

import numpy as np
import pyarrow as pa
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
