"""Deduplication operators (exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine) — Spark-native.

Scale notes (10^12 rows):
- exact: one hash-shuffle on the content key; map-side combine.
- MinHash+LSH: signatures are pure column expressions (64 xxhash64
  permutations, JVM codegen); banding explodes b rows/doc and buckets
  by band hash — the only shuffle is the bucket groupBy; candidate
  pairs are verified with exact Jaccard, so precision is 1.0 and LSH
  only affects recall. Skewed buckets (boilerplate shingles) are
  capped by MAX_BUCKET.
- SimHash: 64-bit signature via word-hash bit voting; near-dup =
  Hamming distance <= k via xor+popcount on the signatures of
  LSH-candidate pairs (or banded by signature chunks).
- embedding cosine: brute-force pair search is O(n^2) — kept for
  oracle checks at tiny scale; the scale path buckets by random
  hyperplane signs first (pipeline/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MINHASH_PERMS = 64
LSH_BANDS = 16  # 16 bands x 4 rows
MAX_BUCKET = 64  # ignore degenerate buckets (boilerplate shingles)
_MERSENNE = (1 << 61) - 1


def exact_dedup(docs: DataFrame, key: str = "text") -> DataFrame:
    """Exact content dedup: keep the smallest doc_id per distinct key.

    One shuffle on the content key; at 100 TB hash the key first
    (xxhash64) so the shuffle carries 8 bytes not documents.
    """
    return (docs.groupBy(key)
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("n_copies"))
            .select("keep_id", "n_copies"))


def word_shingles(col, n: int = 3):
    """n-word shingles of a whitespace-tokenized text column."""
    words = F.split(F.trim(col), "\\s+")
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    return F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))


def minhash_signature(shingles, perms: int = MINHASH_PERMS):
    """MinHash signature: per permutation j, min over shingles of the
    j-seeded xxhash64 (ANSI-safe — no overflow-prone arithmetic).
    Pure column expressions, JVM codegen."""
    sig = []
    for j in range(perms):
        sig.append(F.array_min(F.transform(
            shingles, lambda s, j=j: F.xxhash64(s, F.lit(j)))))
    return F.array(*sig)


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      threshold: float = 0.5, shingle_n: int = 3,
                      bands: int = LSH_BANDS) -> DataFrame:
    """Near-duplicate pairs by MinHash banding + exact-Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold over distinct word shingles.
    """
    rows = MINHASH_PERMS // bands
    base = (docs
            .withColumn("_sh", F.array_distinct(
                word_shingles(F.col(text_col), shingle_n)))
            .where(F.size("_sh") > 0)
            .withColumn("_sig", minhash_signature(F.col("_sh"))))
    banded = base.select(
        "doc_id", "_sh",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.slice("_sig", b * rows + 1, rows),
                           b).alias("bucket")))).alias("bb"))
    buckets = (banded
               .groupBy("bb.band", "bb.bucket")
               .agg(F.collect_list(F.struct("doc_id", "_sh")).alias("ds"))
               .where((F.size("ds") > 1) & (F.size("ds") <= MAX_BUCKET)))
    pairs = (buckets.select(F.explode(F.expr(
        "filter(transform(flatten(transform(ds, a -> transform(ds, "
        "b -> struct(a, b)))), p -> p), "
        "p -> p.a.doc_id < p.b.doc_id)")).alias("p"))
        .select(F.col("p.a.doc_id").alias("id_a"),
                F.col("p.b.doc_id").alias("id_b"),
                F.col("p.a._sh").alias("sh_a"),
                F.col("p.b._sh").alias("sh_b"))
        .dropDuplicates(["id_a", "id_b"]))
    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    return (pairs.withColumn("jaccard", jac)
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        threshold: float = 0.5, shingle_n: int = 3
                        ) -> DataFrame:
    """Exact n-gram Jaccard over ALL pairs (oracle-checkable; O(n^2) —
    tiny scales only; minhash_lsh_pairs is the scale path)."""
    t = docs.select(
        "doc_id",
        F.array_distinct(word_shingles(F.col(text_col), shingle_n))
        .alias("sh")).where(F.size("sh") > 0)
    a = t.alias("a")
    b = t.alias("b")
    pairs = (a.crossJoin(b)
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"),
                     (F.size(F.array_intersect("a.sh", "b.sh"))
                      / F.size(F.array_union("a.sh", "b.sh")))
                     .alias("jaccard")))
    return pairs.where(F.col("jaccard") >= threshold)


def simhash(col, bits: int = 64):
    """64-bit SimHash of the whitespace words of a text column: each
    word votes its hash bits +-1; signature bit = sign of the sum.
    The per-bit expressions are built with Python loops (bit index is
    compile-time), so everything stays a codegen'd column expression."""
    words = F.split(F.trim(col), "\\s+")

    def word_bits(w):
        return F.array(*[
            (F.shiftright(F.xxhash64(w), i).bitwiseAND(F.lit(1))
             .cast("int") * 2 - 1) for i in range(bits)])

    votes = F.aggregate(
        words,
        F.array_repeat(F.lit(0).cast("int"), bits),
        lambda acc, w: F.zip_with(acc, word_bits(w), lambda x, y: x + y))
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig.bitwiseOR(
            F.when(F.element_at(votes, i + 1) > 0,
                   F.lit(1 << i if i < 63 else -(1 << 63)).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return sig


def simhash_near_pairs(docs: DataFrame, text_col: str = "text",
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance (banded by the four
    16-bit chunks: a pair within distance 3 shares at least one chunk)."""
    t = docs.select("doc_id", simhash(F.col(text_col)).alias("sig"))
    chunks = t.select(
        "doc_id", "sig",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned("sig", i * 16)
                .bitwiseAND(F.lit(0xFFFF)).alias("chunk"))
            for i in range(4)])).alias("c"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (a.join(b, (F.col("a.c.band") == F.col("b.c.band"))
                    & (F.col("a.c.chunk") == F.col("b.c.chunk"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"),
                     F.col("a.sig").alias("sig_a"),
                     F.col("b.sig").alias("sig_b"))
             .dropDuplicates(["id_a", "id_b"]))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (pairs.withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def embedding_near_pairs(emb: DataFrame, threshold: float = 0.95
                         ) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, brute force (oracle path;
    the scale path is similarity.lsh_bucketed_pairs)."""
    from pipeline.similarity import cosine
    a = emb.alias("a")
    b = emb.alias("b")
    return (a.crossJoin(b)
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("id_a"),
                    F.col("b.vec_id").alias("id_b"),
                    cosine(F.col("a.embedding"), F.col("b.embedding"))
                    .alias("cos"))
            .where(F.col("cos") >= threshold))
