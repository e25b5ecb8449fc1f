"""engine/orc_concat.py + jobs/orc_compact.py: zero-decode ORC
compaction — raw stripe copy with tail rewrite, verified by three
independent readers (this engine, ORC C++ via pyarrow, orc-core Java
via spark.read.orc) and by the index surfaces (stripe pruning,
row-group seeks, merged file statistics) surviving the merge."""

import decimal
import os

import numpy as np
import pyarrow as pa
import pyarrow.orc as orc
import pytest

from engine.orc_concat import concat_orc
from engine.orc_file import write_orc
from engine.orc_read import read_orc, read_orc_tail, stripes_matching

RNG = np.random.default_rng(11)


def _mk(base: int, n: int = 600, with_nan: bool = False) -> pa.Table:
    mask = RNG.random(n) < 0.1
    f = RNG.normal(size=n)
    if with_nan:
        f[n // 2] = np.nan
    return pa.table({
        "i": pa.array(np.arange(base, base + n, dtype=np.int64),
                      mask=mask),
        "s": pa.array([f"k{base + i:06d}" for i in range(n)]),
        "f": pa.array(f),
        "dt": pa.array((np.arange(n) % 900).astype(np.int32),
                       type=pa.date32()),
        "ts": pa.array(np.arange(base, base + n) * 10 ** 9,
                       type=pa.timestamp("ns")),
        "dec": pa.array([decimal.Decimal(base + i).scaleb(-2)
                         for i in range(n)], type=pa.decimal128(12, 2)),
    })


def _write_parts(d, k=3, compression="none", **kw):
    paths, tables = [], []
    for fi in range(k):
        t = _mk(fi * 600, **({} if fi else kw))
        p = os.path.join(d, f"in-{fi}.orc")
        write_orc(t, p, stripe_rows=200, row_index_stride=64,
                  compression=compression)
        paths.append(p)
        tables.append(t)
    return paths, pa.concat_tables(tables)


def _assert_equal(got: pa.Table, want: pa.Table):
    assert got.num_rows == want.num_rows
    for c in want.column_names:
        assert got.column(c).cast(want.column(c).type).to_pylist() \
            == want.column(c).to_pylist(), c


@pytest.mark.parametrize("compression", ["none", "zlib", "zstd"])
def test_concat_three_readers(tmp_path, compression):
    paths, want = _write_parts(str(tmp_path), compression=compression)
    out = str(tmp_path / "merged.orc")
    m = concat_orc(paths, out)
    assert m["n_rows"] == want.num_rows and m["n_stripes"] == 9
    _assert_equal(read_orc(out), want)                 # engine
    got_cpp = orc.ORCFile(out).read()                  # ORC C++
    assert got_cpp.column("s").to_pylist() == \
        want.column("s").to_pylist()
    assert got_cpp.column("i").to_pylist() == \
        want.column("i").to_pylist()


def test_merged_file_stats(tmp_path):
    paths, want = _write_parts(str(tmp_path))
    out = str(tmp_path / "m.orc")
    concat_orc(paths, out)
    info = read_orc_tail(out)
    names = info.types[0].field_names
    fs = info.file_stats()
    st = dict(zip(names, fs[1:]))
    ivals = [v for v in want.column("i").to_pylist() if v is not None]
    assert st["i"]["min"] == min(ivals) and st["i"]["max"] == max(ivals)
    assert st["i"]["has_null"] is True
    assert st["s"]["min"] == "k000000" and st["s"]["max"] == "k001799"
    assert st["dec"]["max"] == decimal.Decimal("17.99")
    assert st["ts"]["min"] == 0
    assert fs[0]["n"] == want.num_rows  # root struct count


def test_nan_poisoned_float_stays_omitted(tmp_path):
    """An input whose float column omitted min/max (NaN convention)
    must poison the merged file stat — bounds built from the clean
    inputs would exclude the NaN file's values (the round-3 advisor
    bug class, kept fixed across concat)."""
    paths, _ = _write_parts(str(tmp_path), with_nan=True)
    out = str(tmp_path / "m.orc")
    concat_orc(paths, out)
    info = read_orc_tail(out)
    names = info.types[0].field_names
    st = dict(zip(names, info.file_stats()[1:]))
    assert "min" not in st["f"] and "max" not in st["f"]
    assert st["f"]["n"] > 0
    assert "min" in st["i"]  # only the poisoned column is omitted


def test_pruning_and_seek_survive(tmp_path):
    paths, want = _write_parts(str(tmp_path))
    out = str(tmp_path / "m.orc")
    concat_orc(paths, out)
    info = read_orc_tail(out)
    keep = stripes_matching(info, [("i", ">=", 1500)])
    assert keep == [7, 8]  # 9 stripes of 200 sorted rows
    got = read_orc(out, columns=["i", "s"], filters=[("i", ">=", 1600)])
    vals = [v for v in got.column("i").to_pylist() if v is not None]
    assert vals and all(v >= 1600 for v in vals)
    # row-group seek: 64-row groups inside the copied stripes
    assert got.num_rows < want.num_rows // 3


def test_incompatible_inputs_fail_loud(tmp_path):
    d = str(tmp_path)
    a = os.path.join(d, "a.orc")
    write_orc(_mk(0, 50), a, stripe_rows=25, row_index_stride=16)
    b = os.path.join(d, "b.orc")
    write_orc(_mk(50, 50), b, stripe_rows=25, row_index_stride=16,
              compression="zlib")
    with pytest.raises(ValueError, match="compression"):
        concat_orc([a, b], os.path.join(d, "m.orc"))
    c = os.path.join(d, "c.orc")
    write_orc(pa.table({"other": pa.array([1, 2])}), c)
    with pytest.raises(ValueError, match="schema"):
        concat_orc([a, c], os.path.join(d, "m.orc"))
    e = os.path.join(d, "e.orc")
    write_orc(_mk(0, 50), e, stripe_rows=25, row_index_stride=8)
    with pytest.raises(ValueError, match="rowIndexStride"):
        concat_orc([a, e], os.path.join(d, "m.orc"))


def test_distributed_compaction(spark, tmp_path):
    """write_orc_dir many small parts -> compact -> spark.read.orc
    (orc-core) and the engine's distributed reader agree with the
    source; manifest accounts for every input."""
    from jobs.orc_compact import compact_orc_dir, plan_bins
    from jobs.orc_read import read_orc_dir
    from jobs.orc_write import write_orc_dir

    src = spark.range(0, 4000).selectExpr(
        "id", "cast(id % 97 as string) AS tag")
    in_dir = str(tmp_path / "small")
    write_orc_dir(src.repartitionByRange(8, "id")
                  .sortWithinPartitions("id"),
                  in_dir, stripe_rows=250).collect()
    assert len(os.listdir(in_dir)) == 8
    out_dir = str(tmp_path / "big")
    manifest = compact_orc_dir(spark, in_dir, out_dir,
                               target_mb=0.004).collect()
    n_out = len([f for f in os.listdir(out_dir) if f.endswith(".orc")])
    assert 1 < n_out < 8 and n_out == len(manifest)
    assert sum(r.n_files for r in manifest) == 8
    assert sum(r.n_rows for r in manifest) == 4000
    got = spark.read.orc(out_dir)  # orc-core readback
    assert got.count() == 4000
    assert got.selectExpr("sum(id)").collect()[0][0] == \
        4000 * 3999 // 2
    eng = read_orc_dir(spark, out_dir, columns=["id"],
                       filters=[("id", ">=", 3900)])
    assert eng.count() == 100
    # binning preserved name order -> per-file ranges stay disjoint
    bins = plan_bins(sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith(".orc")), 0.004)
    assert [p for b in bins for p in b] == sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith(".orc"))


def test_missing_footer_stats_fails_loud(tmp_path):
    """An input whose tail carries no footer ColumnStatistics (an
    anomaly under the same-writer precondition): the merge must fail
    loud instead of silently undercounting numberOfValues/hasNull."""
    from engine.orc_concat import _merge_file_stats
    a = str(tmp_path / "a.orc")
    b = str(tmp_path / "b.orc")
    write_orc(_mk(0), a)
    write_orc(_mk(600), b)
    ia, ib = read_orc_tail(a), read_orc_tail(b)
    ib._file_stats_raw = ib._file_stats_raw[:2]  # simulate a bare tail
    with pytest.raises(ValueError, match="no footer ColumnStatistics"):
        _merge_file_stats([ia, ib])


def test_failed_concat_cleans_its_tmp(tmp_path, monkeypatch):
    """A concat that fails mid-write must delete its attempt-unique
    temp file: unlike the old shared name, a retry never reuses it,
    so every failing attempt of a flaky compaction would otherwise
    leak a fresh orphan in the output directory (r5 review)."""
    import engine.orc_concat as oc
    a = str(tmp_path / "a.orc")
    b = str(tmp_path / "b.orc")
    write_orc(_mk(0), a)
    write_orc(_mk(600), b)

    def boom(infos):
        raise ValueError("injected stats-merge failure")

    monkeypatch.setattr(oc, "_merge_file_stats", boom)
    out = str(tmp_path / "merged.orc")
    with pytest.raises(ValueError, match="injected"):
        concat_orc([a, b], out)
    assert not os.path.exists(out)
    assert not [f for f in os.listdir(tmp_path) if ".tmp" in f]


def test_concat_tmp_name_attempt_unique(tmp_path):
    """Concurrent attempts of one concat task write DISJOINT temp
    files: the temp path must not be deterministic (a shared tmp
    interleaves writes and can publish a torn file)."""
    import threading
    a = str(tmp_path / "a.orc")
    b = str(tmp_path / "b.orc")
    write_orc(_mk(0), a)
    write_orc(_mk(600), b)
    out = str(tmp_path / "merged.orc")
    errs = []

    def attempt():
        try:
            concat_orc([a, b], out)
        except Exception as e:  # pragma: no cover - would be the bug
            errs.append(e)

    ts = [threading.Thread(target=attempt) for _ in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    # whichever attempt won, the published file is whole
    got = read_orc(out)
    assert got.num_rows == 1200
    assert not [f for f in os.listdir(tmp_path) if ".tmp" in f]
