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


def _hyperplane(dim: int, j: int):
    """Deterministic pseudo-random hyperplane as a column expression:
    component i = centered hash of (i, j)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.xxhash64(i * F.lit(1000003) + F.lit(j),
                                     F.lit(_SEED)), F.lit(2001)) - 1000)
        .cast("double"))


def hyperplane_bucket(vec, dim: int, planes: int = HYPERPLANES):
    """LSH bucket id: sign bit per random hyperplane, packed to a long."""
    bits = [F.when(dot(vec, _hyperplane(dim, j)) >= 0,
                   F.shiftleft(F.lit(1).cast("long"), j))
            .otherwise(F.lit(0).cast("long")) for j in range(planes)]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucketed_pairs(emb: DataFrame, dim: int, threshold: float = 0.95,
                       planes: int = HYPERPLANES) -> DataFrame:
    """Near-duplicate vector pairs via hyperplane bucketing + exact
    cosine verify inside each bucket (the scale path for
    dedup.embedding_near_pairs)."""
    t = emb.withColumn("bucket",
                       hyperplane_bucket(F.col("embedding"), dim, planes))
    a = t.alias("a")
    b = t.alias("b")
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("id_a"),
                    F.col("b.vec_id").alias("id_b"),
                    cosine(F.col("a.embedding"), F.col("b.embedding"))
                    .alias("cos"))
            .where(F.col("cos") >= threshold))
