"""Text analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting. All pure column expressions
(JVM codegen) — ANSI-SQL-expressible, so every one has a DuckDB
oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "de", "et", "est", "une", "dans", "que"],
    "es": ["el", "la", "los", "de", "y", "es", "una", "en", "que"],
}


def words(col):
    return F.split(F.trim(F.lower(col)), "\\s+")


def stopword_ratio(col, lang: str):
    w = words(col)
    hits = F.size(F.filter(
        w, lambda x: x.isin(*STOPWORDS[lang])))
    return hits / F.greatest(F.size(w), F.lit(1))


def lang_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio score per language + argmax guess."""
    d = docs.select("doc_id", F.col(text_col).alias("t"))
    for lang in STOPWORDS:
        d = d.withColumn(f"score_{lang}",
                         stopword_ratio(F.col("t"), lang))
    score_cols = [f"score_{lang}" for lang in STOPWORDS]
    best = F.array_max(F.array(*[F.col(c) for c in score_cols]))
    guess = F.coalesce(
        *[F.when(F.col(c) == best, F.lit(c[6:])) for c in score_cols])
    return d.select("doc_id", *score_cols,
                    F.when(best > 0, guess).otherwise(F.lit("und"))
                    .alias("lang_guess"))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, punctuation ratio, stopword
    ratio (en), mean word length, digit ratio."""
    t = F.col(text_col)
    n = F.length(t)
    no_punct = F.regexp_replace(t, "[.,!?;:]", "")
    no_digit = F.regexp_replace(t, "[0-9]", "")
    w = words(t)
    return docs.select(
        "doc_id",
        n.alias("n_chars_m"),
        F.size(w).alias("n_words"),
        ((n - F.length(no_punct)) / F.greatest(n, F.lit(1)))
        .alias("punct_ratio"),
        ((n - F.length(no_digit)) / F.greatest(n, F.lit(1)))
        .alias("digit_ratio"),
        stopword_ratio(t, "en").alias("stopword_en"),
        (F.aggregate(w, F.lit(0).cast("long"),
                     lambda a, x: a + F.length(x))
         / F.greatest(F.size(w), F.lit(1)))
        .alias("mean_word_len"))


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish regex token
    count (word pieces + standalone punctuation), plus bytes."""
    t = F.col(text_col)
    ws = F.size(words(t))
    # BPE-ish: letter runs, digit runs, single non-space punctuation —
    # expressed with regexp_extract_all (RE2-compatible, so the DuckDB
    # oracle evaluates the identical pattern)
    bpe = F.size(F.expr(
        r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"))
    return docs.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"),
        F.length(t).alias("n_chars_m"),
        F.octet_length(t).alias("n_bytes"))


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (md5 matches across engines, unlike xxhash)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col),
                                           "\\s+", " ")))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))
