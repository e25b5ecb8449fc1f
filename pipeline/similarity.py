"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: broadcast the (small) query set, dot
  products via zip_with/aggregate — JVM-side, no Python;
- LSH-bucketed variant (random hyperplane signs) as the scale path:
  one shuffle on the bucket key instead of an all-pairs cross join.

At 10^12 rows the brute-force path is only for reranking candidates;
the hyperplane bucketer reduces candidates by ~2^bits while the
verify step keeps precision exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HYPERPLANES = 12
_SEED = 0x5EED


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda s, v: s + v)


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10
                     ) -> DataFrame:
    """Top-k nearest (cosine) base vectors per query vector.

    ``queries`` is expected to be small — it is broadcast, so the plan
    is a broadcast nested-loop + per-query top-k (no shuffle of the
    base table beyond the final window).
    """
    from pyspark.sql import Window
    joined = (emb.alias("b")
              .crossJoin(F.broadcast(queries.alias("q")))
              .select(F.col("q.query_id").alias("query_id"),
                      F.col("b.vec_id").alias("vec_id"),
                      cosine(F.col("b.embedding"), F.col("q.qvec"))
                      .alias("cos")))
    w = Window.partitionBy("query_id") \
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (joined.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "cos", "rank"))


MAX_BUCKET = 1024  # cap bucket self-join size (clustered embeddings)


def hyperplane_bucket(vec, planes: int = HYPERPLANES):
    """LSH bucket id: one sign bit per deterministic pseudo-random
    hyperplane, as a '01...' string.

    All-integer arithmetic so every engine computes the identical
    bucket (DuckDB-oracle-able, no float-summation-order hazard):
    components are quantized with floor(x * 1e6) and the plane weights
    are a centered Weyl-style integer hash of (plane, dim); the dot
    product is an exact int64 sum (|dot| <= dim * 1e6 * 5e5 << 2^63).
    The vector length is read from the array itself — no dim argument,
    no driver-side probing."""
    q = F.transform(vec, lambda x: F.floor(x * F.lit(1000000.0))
                    .cast("long"))
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(planes - 1)),
            lambda p: F.when(
                F.aggregate(
                    F.transform(
                        q, lambda x, d: x * (((p * F.lit(1009) + d)
                                              * F.lit(2654435761))
                                             % F.lit(1000003)
                                             - F.lit(501001))),
                    F.lit(0).cast("long"), lambda a, x: a + x) >= 0,
                F.lit("1")).otherwise(F.lit("0"))), "")


def lsh_bucketed_pairs(emb: DataFrame, dim: int | None = None,
                       threshold: float = 0.95,
                       planes: int = HYPERPLANES,
                       max_bucket: int = MAX_BUCKET) -> DataFrame:
    """Near-duplicate vector pairs via hyperplane bucketing + exact
    cosine verify inside each bucket (the scale path for
    dedup.embedding_near_pairs). Buckets larger than ``max_bucket``
    are dropped before the self-join so clustered embeddings cannot go
    quadratic. ``dim`` is accepted for API compatibility but unused —
    the bucketer reads the vector length from the array."""
    t = emb.withColumn("bucket",
                       hyperplane_bucket(F.col("embedding"), planes))
    sizes = t.groupBy("bucket").agg(F.count("*").alias("_bsz"))
    t = (t.join(F.broadcast(sizes.where(
        (F.col("_bsz") > 1) & (F.col("_bsz") <= max_bucket))), "bucket"))
    a = t.alias("a")
    b = t.alias("b")
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("id_a"),
                    F.col("b.vec_id").alias("id_b"),
                    cosine(F.col("a.embedding"), F.col("b.embedding"))
                    .alias("cos"))
            .where(F.col("cos") >= threshold))
