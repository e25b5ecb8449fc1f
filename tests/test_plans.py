"""Physical-plan checks (.explain): column pruning reaches the scan,
block-stat filters push into the blocks parquet, and the pipeline's
shuffle count is as designed (SURVEY.md §4)."""

import pytest

from pyspark.sql import functions as F

from jobs.decode import decode_table
from jobs.encode import encode_table, plan_partitions
from jobs.synth import write_token_table


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("plans")
    inp = str(root / "tok")
    out = str(root / "blocks")
    write_token_table(spark, inp, rows=3000, partitions=2, seed=42)
    df = spark.read.parquet(inp)
    encode_table(spark, df, out, num_partitions=2, block_rows=500)
    return inp, out


def plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_histogram_scan_prunes_columns(spark, setup):
    inp, _ = setup
    df = spark.read.parquet(inp)
    agg = df.groupBy("n_tok").agg(F.count("*"))
    plan = plan_of(agg)
    # the n_tok histogram must not read doc_id/tokens/source
    assert "ReadSchema: struct<n_tok:int>" in plan, plan


def test_block_stat_filter_pushed_to_scan(spark, setup):
    _, out = setup
    dec = decode_table(spark, out, tok_min=2 ** 31)  # excludes all data
    plan = plan_of(dec)
    assert "PushedFilters" in plan
    assert "vmax" in plan, plan
    # every block's tok_max < 10^9 -> scan skips everything
    assert dec.count() == 0


def test_selective_decode_prunes_blocks(spark, setup):
    inp, out = setup
    df = spark.read.parquet(inp)
    full = decode_table(spark, out)
    # ntok range: only long docs
    part = decode_table(spark, out, ntok_min=4000)
    n_full, n_part = full.count(), part.count()
    assert 0 < n_part < n_full
    # every doc with n_tok >= 4000 must be present (stats are sound)
    want = df.where(F.col("n_tok") >= 4000).count()
    got = part.where(F.col("n_tok") >= 4000).count()
    assert got == want


def test_encode_single_shuffle(spark, setup):
    inp, _ = setup
    df = spark.read.parquet(inp)
    from jobs.encode import SALT_BUCKETS, _kernel
    from engine.blocks import BLOCKS_DDL
    bm = plan_partitions(df, 32)
    salted = (df.withColumn("salt", F.pmod(F.xxhash64("doc_id"),
                                           F.lit(SALT_BUCKETS)))
              .join(F.broadcast(bm), "n_tok", "left")
              .withColumn("pid", F.coalesce(
                  F.col("bucket_start") + F.pmod("salt", F.col("spans")),
                  F.pmod("salt", F.lit(32))))
              .select("doc_id", "tokens", "n_tok", "source", "pid"))
    blocks = salted.repartition(4, "pid").mapInArrow(
        _kernel(set(), 500, 0), BLOCKS_DDL)
    plan = plan_of(blocks)
    # exactly ONE shuffle exchange (the pid repartition); the bucket
    # map joins as a broadcast (BroadcastExchange is not a shuffle)
    shuffles = plan.count("Exchange hashpartitioning") \
        + plan.count("Exchange rangepartitioning") \
        + plan.count("Exchange RoundRobin")
    assert shuffles == 1, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
