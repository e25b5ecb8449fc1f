"""End-to-end Spark pipeline tests (SURVEY.md §5.2.4-5): encode job ->
blocks table -> decode job -> bit-identity; resumability; skew
partitioning sanity."""

import os

import numpy as np
import pytest

from jobs import table_io
from jobs.decode import decode_table, verify_identity
from jobs.encode import encode_table, read_blocks
from jobs.synth import write_token_table


@pytest.fixture(scope="module")
def token_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("input") / "tokens.parquet")
    write_token_table(spark, path, rows=4000, partitions=4, seed=42)
    return path


def test_e2e_bit_identity(spark, token_parquet, tmp_path):
    out = str(tmp_path / "blocks")
    df = spark.read.parquet(token_parquet)
    metrics = encode_table(spark, df, out, num_partitions=6,
                           block_rows=1000)
    assert metrics["n_rows"] == 4000
    assert metrics["out_bytes"] < metrics["in_bytes"]
    dec = decode_table(spark, out)
    report = verify_identity(df, dec)
    assert report["identical"], report


def test_blocks_metadata_queryable(spark, token_parquet, tmp_path):
    out = str(tmp_path / "blocks")
    df = spark.read.parquet(token_parquet)
    encode_table(spark, df, out, num_partitions=4, block_rows=2000)
    blocks = read_blocks(spark, out)
    from pyspark.sql import functions as F
    row = blocks.agg(
        F.sum("n_values").alias("nv"),
        F.min("tokens.vmin").alias("tmin"),
        F.max("tokens.vmax").alias("tmax")).collect()[0]
    want = df.agg(F.sum("n_tok")).collect()[0][0]
    assert row["nv"] == want
    # stats bracket the real values
    flat = df.select(F.explode("tokens").alias("t"))
    lo, hi = flat.agg(F.min("t"), F.max("t")).collect()[0]
    assert row["tmin"] == lo and row["tmax"] == hi


def test_resume_skips_committed_parts(spark, token_parquet, tmp_path):
    out = str(tmp_path / "blocks")
    df = spark.read.parquet(token_parquet)
    m1 = encode_table(spark, df, out, num_partitions=4, block_rows=2000)
    assert m1["n_parts_skipped"] == 0
    # re-run: everything committed, nothing re-encoded, no duplicates
    m2 = encode_table(spark, df, out, num_partitions=4, block_rows=2000)
    assert m2["n_parts_skipped"] == m1["n_parts"]
    assert m2["n_rows"] == 4000
    dec = decode_table(spark, out)
    assert dec.count() == 4000
    report = verify_identity(df, dec)
    assert report["identical"], report


def test_resume_after_partial_commit(spark, token_parquet, tmp_path):
    out = str(tmp_path / "blocks")
    df = spark.read.parquet(token_parquet)
    encode_table(spark, df, out, num_partitions=4, block_rows=2000)
    # simulate a crash that committed only half the parts: rewrite the
    # manifest keeping 2 parts, delete their sibling data files' rows is
    # not needed — blocks of uncommitted parts are superseded on re-run
    parts = table_io.committed_parts(out)
    keep = dict(list(parts.items())[:2])
    mdir = os.path.join(out, "_manifest")
    for f in os.listdir(mdir):
        os.remove(os.path.join(mdir, f))
    table_io.commit(out, list(keep.values()))
    # ALSO remove data files of the "lost" parts to simulate the crash
    # (data written but manifest missing is superseded; here we emulate
    # the inverse: manifest trimmed, data kept -> dedup by part filter)
    m = encode_table(spark, df, out, num_partitions=4, block_rows=2000)
    assert m["n_parts_skipped"] == 2
    dec = decode_table(spark, out)
    # blocks for re-encoded parts may exist twice in the data dir; the
    # reader must deduplicate by (part_id, block_id) using the manifest
    report = verify_identity(df, dec)
    assert report["identical"], report


def test_partitioning_spreads_tokens(spark, token_parquet, tmp_path):
    out = str(tmp_path / "blocks")
    df = spark.read.parquet(token_parquet)
    encode_table(spark, df, out, num_partitions=8, block_rows=2000)
    blocks = read_blocks(spark, out)
    from pyspark.sql import functions as F
    per_part = (blocks.groupBy("part_id")
                .agg(F.sum("n_values").alias("nv")).collect())
    loads = np.array([r["nv"] for r in per_part], dtype=float)
    # token-weighted buckets hash into physical partitions; at this tiny
    # scale collisions merge some, but no partition may dominate the
    # TOKEN mass (the skew criterion) beyond a few bucket-weights
    assert len(loads) >= 4
    total = loads.sum()
    assert loads.max() / (total / 8) < 3.0, loads


def test_submit_package_zip(tmp_path):
    from jobs.submit import package
    out = package(out=str(tmp_path / "engine.zip"))
    import zipfile
    names = zipfile.ZipFile(out).namelist()
    assert "engine/rle2.py" in names and "jobs/encode.py" in names
    assert "pipeline/dedup.py" in names and "engine/orc_file.py" in names
    assert not any(n.endswith((".pyc", ".parquet")) for n in names)


def test_bloom_point_lookup(spark, token_parquet, tmp_path):
    from jobs.decode import lookup_doc_ids
    out = str(tmp_path / "blocks")
    df = spark.read.parquet(token_parquet)
    encode_table(spark, df, out, num_partitions=4, block_rows=500)
    from pyspark.sql import functions as F
    want = [r["doc_id"] for r in df.limit(3).collect()]
    got = lookup_doc_ids(spark, out, want)
    rows = got.collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(want)
    # blocks actually pruned: bloom keeps far fewer than all blocks
    from jobs.encode import read_blocks
    total = read_blocks(spark, out).count()
    assert total >= 8


def test_doc_range_strategy_bit_identity_and_balance(spark, token_parquet,
                                                     tmp_path):
    # locality-preserving strategy: same correctness guarantees, token
    # mass balanced by contiguous weighted slabs, deterministic resume
    out = str(tmp_path / "blocks_dr")
    df = spark.read.parquet(token_parquet)
    m = encode_table(spark, df, out, num_partitions=6, block_rows=1000,
                     strategy="doc_range")
    assert m["n_rows"] == 4000
    dec = decode_table(spark, out)
    report = verify_identity(df, dec)
    assert report["identical"], report
    blocks = read_blocks(spark, out)
    from pyspark.sql import functions as F
    per_part = (blocks.groupBy("part_id")
                .agg(F.sum("n_values").alias("nv")).collect())
    loads = np.array([r["nv"] for r in per_part], dtype=float)
    assert loads.max() / (loads.sum() / 6) < 3.0, loads
    # determinism: re-encode into a fresh dir -> identical block ids
    out2 = str(tmp_path / "blocks_dr2")
    encode_table(spark, df, out2, num_partitions=6, block_rows=1000,
                 strategy="doc_range")
    ids1 = sorted(r["block_id"] for r in
                  read_blocks(spark, out).select("block_id").collect())
    ids2 = sorted(r["block_id"] for r in
                  read_blocks(spark, out2).select("block_id").collect())
    assert ids1 == ids2


def test_doc_range_degenerate_bounds_fallback(spark, tmp_path):
    # ADVICE r2 #4: a tiny input can yield no boundaries at all; the
    # encode must warn and fall back to round-robin slabs instead of
    # silently collapsing everything into slab 0
    import warnings

    rows = [(f"d{i}", [1, 2, 3], 3, "s") for i in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    out = str(tmp_path / "blocks_tiny")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = encode_table(spark, df, out, num_partitions=2, block_rows=10,
                         strategy="doc_range")
    assert m["n_rows"] == 3
    assert any("boundaries" in str(x.message) for x in w)
    dec = decode_table(spark, out)
    assert verify_identity(df, dec)["identical"]


def test_doc_range_empty_input(spark, tmp_path):
    # empty-bounds fallback (round-robin) + a zero-row encode must
    # complete with zeroed metrics, not crash
    import warnings

    df = spark.createDataFrame(
        [], "doc_id string, tokens array<int>, n_tok int, source string")
    out = str(tmp_path / "blocks_empty")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = encode_table(spark, df, out, num_partitions=2,
                         strategy="doc_range")
    assert m["n_rows"] == 0 and m["n_parts"] == 0
    assert any("round-robin" in str(x.message) for x in w)


def test_ntok_range_block_determinism(spark, token_parquet, tmp_path):
    # with the in-partition sort, ntok_range block CONTENTS (ids and
    # payload bytes) are a pure function of the snapshot — two encodes
    # into fresh dirs must produce identical block rows
    df = spark.read.parquet(token_parquet)
    outs = [str(tmp_path / f"blocks_det{i}") for i in (1, 2)]
    for out in outs:
        encode_table(spark, df, out, num_partitions=4, block_rows=500,
                     strategy="ntok_range")
    rows = []
    from pyspark.sql import functions as F
    for out in outs:
        rows.append(sorted(
            (r["block_id"], r["h"]) for r in read_blocks(spark, out)
            .select("block_id",
                    F.xxhash64("tokens.data", "doc_id.data",
                               "n_rows", "n_values").alias("h"))
            .collect()))
    assert rows[0] == rows[1]


def test_submit_export_orc(spark, token_parquet, tmp_path):
    # export-orc CLI: distributed .orc emission end to end
    import glob

    import pyarrow.orc as orc

    from jobs.submit import main as submit_main
    out = str(tmp_path / "orcdir")
    rc = submit_main(["export-orc", "--input", token_parquet,
                      "--output", out, "--partitions", "3"])
    assert rc == 0
    files = glob.glob(out + "/part-*.orc")
    assert len(files) == 3
    assert sum(orc.read_table(f).num_rows for f in files) == 4000
    assert spark.read.orc(out).count() == 4000


def test_submit_compact_orc(spark, token_parquet, tmp_path):
    # compact-orc CLI: many small part-files -> fewer, zero-decode
    import glob

    from jobs.submit import main as submit_main
    small = str(tmp_path / "small")
    rc = submit_main(["export-orc", "--input", token_parquet,
                      "--output", small, "--partitions", "6",
                      "--stripe-rows", "300"])
    assert rc == 0
    big = str(tmp_path / "big")
    total_mb = sum(os.path.getsize(f)
                   for f in glob.glob(small + "/*.orc")) / (1 << 20)
    rc = submit_main(["compact-orc", "--input", small, "--output", big,
                      "--target-mb", str(total_mb / 2)])
    assert rc == 0
    files = glob.glob(big + "/part-*.orc")
    assert 1 <= len(files) < 6
    assert spark.read.orc(big).count() == 4000


def test_submit_decode_selective(spark, token_parquet, tmp_path):
    # decode CLI with projection + stride predicates
    from jobs.submit import main as submit_main
    blocks = str(tmp_path / "b")
    encode_table(spark, spark.read.parquet(token_parquet), blocks,
                 num_partitions=2, block_rows=500)
    out = str(tmp_path / "dec")
    rc = submit_main(["decode", "--blocks", blocks, "--output", out,
                      "--columns", "doc_id,n_tok", "--ntok-min", "10"])
    assert rc == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "n_tok"}
    # superset-of-matching semantics: every matching row present
    from pyspark.sql import functions as F
    want = (spark.read.parquet(token_parquet)
            .where(F.col("n_tok") >= 10).count())
    assert got.where(F.col("n_tok") >= 10).count() == want


def test_submit_import_orc_typed_filters(spark, token_parquet, tmp_path):
    # import-orc CLI: filter literals typed against the FILE schema —
    # a digit-only literal on a STRING column must stay a string (the
    # old auto-int fed a type-mismatched literal into bloom pruning),
    # and numeric literals on int columns still coerce
    import glob

    from jobs.submit import main as submit_main
    orcdir = str(tmp_path / "orcdir")
    rc = submit_main(["export-orc", "--input", token_parquet,
                      "--output", orcdir, "--partitions", "2"])
    assert rc == 0
    out = str(tmp_path / "imp")
    rc = submit_main(["import-orc", "--input", orcdir, "--output", out,
                      "--columns", "doc_id,n_tok",
                      "--filter", "n_tok:>=:100"])
    assert rc == 0
    got = spark.read.parquet(out)
    from pyspark.sql import functions as F
    want = (spark.read.parquet(token_parquet)
            .where(F.col("n_tok") >= 100).count())
    assert got.count() == want and want > 0
    # string column + digit literal: typed as str, exact filter works
    some_id = spark.read.parquet(token_parquet).first()["doc_id"]
    out2 = str(tmp_path / "imp2")
    rc = submit_main(["import-orc", "--input", orcdir, "--output", out2,
                      "--filter", f"doc_id:=:{some_id}"])
    assert rc == 0
    assert spark.read.parquet(out2).count() == 1
    # the regression shape: a digit-only literal on a STRING column
    # stays str; numeric strings on int columns coerce to int
    from jobs.submit import _type_filter_literals
    typed = _type_filter_literals(
        orcdir, [("doc_id", "=", "123"), ("n_tok", ">=", "100")])
    assert typed == [("doc_id", "=", "123"), ("n_tok", ">=", 100)]


def test_submit_import_orc_merge_schemas(spark, token_parquet,
                                         tmp_path):
    """import-orc --merge-schemas reads a directory whose files drift
    int->long on n_tok and grow a column, at the union-of-fields,
    widest-of-types schema — and filter literals on the ADDED column
    (absent from the first file's tail) type against the MERGED
    schema, not the first file's."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from jobs.orc_write import write_orc_dir
    from jobs.submit import _type_filter_literals
    from jobs.submit import main as submit_main

    tok = spark.read.parquet(token_parquet).select("doc_id", "n_tok")
    d = str(tmp_path / "evolved")
    gens = [
        tok.where(F.col("n_tok") % 2 == 0).select(
            "doc_id", F.col("n_tok").cast("int").alias("n_tok")),
        tok.where(F.col("n_tok") % 2 == 1).select(
            "doc_id", F.col("n_tok").cast("long").alias("n_tok"),
            (F.col("n_tok") * 2).cast("long").alias("flag")),
    ]
    os.makedirs(d)
    for i, part in enumerate(gens):
        sub = str(tmp_path / f"gen{i}")
        write_orc_dir(part.repartition(2), sub).collect()
        for f in glob.glob(f"{sub}/*.orc"):
            shutil.move(f, f"{d}/gen{i}-{os.path.basename(f)}")
    # literal on the generation-1-only column types as int via the
    # merged schema (first-file probe would pass it through as str)
    typed = _type_filter_literals(d, [("flag", ">=", "100")],
                                  merge_schemas=True)
    assert typed == [("flag", ">=", 100)]
    out = str(tmp_path / "imp")
    rc = submit_main(["import-orc", "--input", d, "--output", out,
                      "--merge-schemas", "--filter", "flag:>=:100"])
    assert rc == 0
    got = spark.read.parquet(out)
    assert dict(got.dtypes)["n_tok"] == "bigint"
    want = (tok.where((F.col("n_tok") % 2 == 1)
                      & (F.col("n_tok") * 2 >= 100)).count())
    assert got.count() == want and want > 0
    assert got.where(F.col("flag") < 100).count() == 0


def test_submit_export_import_bloom_in_roundtrip(spark, token_parquet,
                                                 tmp_path):
    """export-orc --bloom-columns emits per-row-group blooms the
    import-orc 'in' filter (col:in:a,b,c CLI form) prunes through; the
    result is the exact member set."""
    import pyarrow.parquet as pq

    from jobs.submit import main as submit_main
    ids = pq.read_table(token_parquet,
                        columns=["doc_id"]).column("doc_id").to_pylist()
    want = sorted({ids[12], ids[777], ids[3999]})
    out = str(tmp_path / "orcdir")
    rc = submit_main(["export-orc", "--input", token_parquet,
                      "--output", out, "--partitions", "2",
                      "--stripe-rows", "512",
                      "--row-index-stride", "256",
                      "--bloom-columns", "doc_id"])
    assert rc == 0
    back = str(tmp_path / "back")
    rc = submit_main(["import-orc", "--input", out, "--output", back,
                      "--columns", "doc_id,n_tok",
                      "--filter",
                      "doc_id:in:" + ",".join(want + ["nope"])])
    assert rc == 0
    got = spark.read.parquet(back)
    assert sorted(r.doc_id for r in got.collect()) == want
