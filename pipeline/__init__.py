"""Large-scale training-data pipeline operators over the engine's
tables (documents, embeddings): deduplication, similarity search,
text analysis, multimodal column plumbing.

All operators are Spark-first: built-in pyspark.sql.functions
expressions (JVM-side, codegen) wherever the semantics allow; LSH
band-hashing and candidate verification are compositions of
transform/aggregate/array_* + joins — no per-row Python anywhere on
the hot path. Each operator ships a queries() entry in
__spark_entry__ with a DuckDB oracle when ANSI-SQL can express it.
"""
