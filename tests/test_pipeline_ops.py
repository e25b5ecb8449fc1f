"""Semantic checks for the hash-based pipeline operators that cannot
be DuckDB-oracled (xxhash64-specific): MinHash-LSH recall against the
exact-Jaccard oracle, hyperplane-LSH precision against brute-force
cosine, SimHash sanity."""

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .withColumn("embedding",
                        F.expr("transform(embedding, "
                               "x -> CAST(x AS DOUBLE))")).cache())


def pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_lsh_recall_and_precision(spark, docs):
    from pipeline.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    exact = pairs(ngram_jaccard_pairs(docs, threshold=0.3))
    lsh = pairs(minhash_lsh_pairs(docs, threshold=0.3))
    assert exact, "fixture should contain near-duplicate docs"
    # precision is 1.0 by construction (candidates verified exactly)
    assert lsh <= exact
    # banding (16 bands x 4 rows) at jaccard >= 0.3: high recall
    assert len(lsh) / len(exact) >= 0.8, (len(lsh), len(exact))


def test_minhash_md5_family_matches_semantics(spark, docs):
    # the portable (DuckDB-oracle-able) md5 hash family must give the
    # same precision/recall guarantees as the fast xxhash64 family
    from pipeline.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    exact = pairs(ngram_jaccard_pairs(docs, threshold=0.3))
    lsh = pairs(minhash_lsh_pairs(docs, threshold=0.3, family="md5"))
    assert lsh <= exact
    assert len(lsh) / len(exact) >= 0.8, (len(lsh), len(exact))


def test_bucket_cap_bounds_boilerplate(spark):
    # 300 identical docs: every banding bucket would hold all 300
    # (quadratic pair blowup at scale) — the MAX_BUCKET cap must drop
    # those buckets instead of exploding
    from pipeline.dedup import MAX_BUCKET, simhash_near_pairs, \
        minhash_lsh_pairs
    n = 300
    assert n > MAX_BUCKET
    boiler = spark.createDataFrame(
        [(i, "the same boilerplate text repeated forever and ever")
         for i in range(n)], "doc_id int, text string")
    assert simhash_near_pairs(boiler, max_hamming=3).count() == 0
    assert minhash_lsh_pairs(boiler, threshold=0.3).count() == 0


def test_simhash_finds_exact_duplicates(spark, docs):
    from pipeline.dedup import simhash_near_pairs
    # identical texts must have identical signatures (hamming 0);
    # give the copies fresh doc_ids so the pair join sees them
    base = docs.limit(5)
    copies = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    got = simhash_near_pairs(base.union(copies), max_hamming=0)
    assert got.count() >= 5


def test_lsh_bucketed_subset_of_bruteforce(spark, emb):
    from pipeline.dedup import embedding_near_pairs
    from pipeline.similarity import lsh_bucketed_pairs
    dim = len(emb.select("embedding").first()["embedding"])
    brute = pairs(embedding_near_pairs(emb, threshold=0.2))
    lsh = pairs(lsh_bucketed_pairs(emb, dim, threshold=0.2, planes=6))
    assert lsh <= brute  # exact verify inside buckets -> precision 1.0
    if brute:
        assert len(lsh) > 0  # some recall at 6 planes


def test_topk_contains_self(spark, emb):
    from pipeline.similarity import brute_force_topk
    q = (emb.where(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qvec")))
    top = brute_force_topk(emb, q, k=5).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        best = min(rows, key=lambda r: r["rank"])
        assert best["vec_id"] == qid and abs(best["cos"] - 1.0) < 1e-9


def test_exact_dedup_finds_planted_duplicates(spark, docs):
    from pipeline.dedup import exact_dedup
    planted = docs.limit(10).union(docs.limit(10))
    out = exact_dedup(planted)
    dups = out.where(F.col("n_copies") >= 2)
    assert dups.count() == 10


def test_multimodal_stub_raises_without_codecs():
    from pipeline import multimodal
    with pytest.raises(NotImplementedError):
        multimodal.require_codecs()


@pytest.mark.parametrize("family,min_found", [("xxhash64", 15),
                                               ("md5", 10)])
def test_simhash_128bit_band_space(spark, family, min_found):
    # r2 verdict fix: 4x16-bit bands saturate 65,536 buckets/band at
    # >>1e7 docs and the cap collapses recall. The 128-bit signature
    # bands on 4x32-bit chunks -> 2^32 bucket values per band, so
    # distinct texts land in distinct buckets and recall survives a
    # 300-doc boilerplate cluster being capped away. Fixture is fully
    # deterministic; measured recall 17/20 (xxhash64), 12/20 (md5) for
    # one-word-changed 150-word docs at max_hamming=6 (pairs at
    # distance <= 3 are pigeonhole-guaranteed a shared band).
    from pipeline.dedup import simhash_band_stats, simhash_near_pairs

    def text(i, nw=150):
        return " ".join(f"w{(i*97+k*13)%7919}token{k}" for k in range(nw))

    rows = [(i, text(i)) for i in range(60)]
    rows += [(i + 1_000_000, text(i) + " tailword") for i in range(20)]
    boiler = [(i + 2_000_000,
               "the same boilerplate text repeated forever and ever")
              for i in range(300)]
    docs = spark.createDataFrame(rows + boiler, "doc_id int, text string")
    got = pairs(simhash_near_pairs(docs, max_hamming=6, family=family))
    planted = {(i, i + 1_000_000) for i in range(20)}
    assert len(got & planted) >= min_found, len(got & planted)
    assert not (got - planted)  # precision 1.0: no cross-doc pairs
    # telemetry: the capped boilerplate cluster is reported, not silent
    st = simhash_band_stats(docs, family=family).collect()[0]
    assert st["n_dropped_buckets"] == 4  # one 300-doc cluster, 4 bands
    assert st["n_docs_in_dropped"] == 4 * 300
    # band space is 32 bits per chunk (structural pin)
    from pipeline.dedup import _simhash_banded
    banded, _, _ = _simhash_banded(docs, "text", family)
    b = banded.select("bucket").limit(50).collect()
    if family == "md5":
        assert all(len(r["bucket"]) == 32 for r in b)  # 32 sig bits
    else:
        assert all(0 <= int(r["bucket"]) <= 0xFFFFFFFF for r in b)
