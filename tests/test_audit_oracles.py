"""Pins for the §2.6 partition-assignment oracle (skew_spread /
lineage_stats in __spark_entry__.py): the SQL oracle reimplements
Spark's physical partitioning, so the two facts it relies on are
asserted here against Spark itself:

1. ``repartition(P, col)`` placement == ``pmod(hash(col), P)`` for an
   int column (HashPartitioning uses Murmur3 hashInt, seed 42).
2. The pure-Python murmur3 mirror below == ``F.hash`` — the same
   constants/steps the DuckDB CTE chain evaluates in HUGEINT.
"""

import pytest
from pyspark.sql import functions as F

_M = 1 << 32


def _rotl(x, r):
    return ((x << r) | (x >> (32 - r))) & (_M - 1)


def mmh3_int(i: int, seed: int = 42) -> int:
    """Spark Murmur3 hashInt (public MurmurHash3 algorithm)."""
    k1 = (i & (_M - 1)) * 0xcc9e2d51 % _M
    k1 = _rotl(k1, 15) * 0x1b873593 % _M
    h1 = (seed ^ k1) & (_M - 1)
    h1 = (_rotl(h1, 13) * 5 + 0xe6546b64) % _M
    h1 ^= 4  # length in bytes
    h1 ^= h1 >> 16
    h1 = h1 * 0x85ebca6b % _M
    h1 ^= h1 >> 13
    h1 = h1 * 0xc2b2ae35 % _M
    h1 ^= h1 >> 16
    return h1 - _M if h1 >= _M // 2 else h1


def test_repartition_placement_is_pmod_hash(spark):
    df = spark.range(0, 2000).withColumn(
        "pid", (F.col("id") % 131).cast("int"))
    r = (df.repartition(8, "pid")
         .withColumn("phys", F.spark_partition_id())
         .withColumn("pred", F.pmod(F.hash("pid"), F.lit(8))))
    assert r.where(F.col("phys") != F.col("pred")).count() == 0


def test_spark_hash_matches_murmur3_mirror(spark):
    vals = list(range(200)) + [2**31 - 1, 12345678]
    df = spark.createDataFrame([(v,) for v in vals], "pid int")
    got = {r["pid"]: r["h"]
           for r in df.withColumn("h", F.hash("pid")).collect()}
    for v in vals:
        assert got[v] == mmh3_int(v), v


def test_plan_partitions_integer_math(spark):
    """Bucket map invariants: every value covered, spans >= 1, token
    mass per bucket bounded by ~2x the ideal (a single over-heavy
    value spans multiple buckets instead of overflowing one)."""
    from jobs.encode import plan_partitions
    rows = [(f"d{i}", (i * 37) % 97 + 8) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    nb = 32
    bm = {r["n_tok"]: (r["bucket_start"], r["spans"])
          for r in plan_partitions(df, nb).collect()}
    hist = {r["n_tok"]: r["c"] for r in
            df.groupBy("n_tok").agg(F.count("*").alias("c")).collect()}
    assert set(bm) == set(hist)
    total = sum(v * c for v, c in hist.items())
    mass = [0] * nb
    for v, c in hist.items():
        lo, spans = bm[v]
        assert 0 <= lo < nb and spans >= 1 and lo + spans <= nb
        for s in range(spans):  # salt spreads ~uniformly over spans
            mass[lo + s] += v * c / spans
    assert max(mass) <= 2.5 * total / nb
