"""Streaming encode (Structured Streaming): continuously encode token
rows arriving as parquet files into the blocks table.

The reference is a batch storage library with no streaming surface, so
this is engine-side capability (like pipeline/): a file-source
``readStream`` feeding the SAME deterministic encode pipeline through
``foreachBatch`` — each micro-batch appends blocks with
``part_id = (stream epoch << 16) | shuffle partition`` so block ids
stay unique and lineage records the epoch (part_id is int64 in
BLOCKS_SCHEMA, so epochs far beyond 2^31 are safe). Exactly-once at the block
level comes from the Spark checkpoint (epoch replays overwrite the
same deterministic block ids and the reader deduplicates by
(part_id, block_id, attempt) — jobs/encode.read_blocks).
"""

from __future__ import annotations

from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession, functions as F

from engine.blocks import BLOCKS_DDL, DEFAULT_BLOCK_ROWS, encode_batches
from jobs import table_io
from jobs.encode import SALT_BUCKETS


def _epoch_kernel(epoch: int, block_rows: int, codec: str):
    def kernel(batches):
        part = TaskContext.get().partitionId()
        clean = (b.drop_columns([c for c in ("salt", "pid")
                                 if c in b.schema.names]) for b in batches)
        yield from encode_batches(clean,
                                  part_id=(epoch << 16) | part,
                                  block_rows=block_rows, attempt=0,
                                  codec=codec)
    return kernel


def start_streaming_encode(spark: SparkSession, input_dir: str,
                           out_path: str, checkpoint_dir: str,
                           block_rows: int = DEFAULT_BLOCK_ROWS,
                           codec: str = "mixed",
                           num_partitions: int = 4,
                           trigger_once: bool = False):
    """Start the streaming encode query; returns the StreamingQuery."""
    from engine.blocks import TOKEN_SCHEMA  # noqa: F401 (doc)

    stream = (spark.readStream
              .schema("doc_id string, tokens array<int>, n_tok int, "
                      "source string")
              .parquet(input_dir))

    ddir = table_io.data_dir(out_path)

    def sink(df: DataFrame, epoch: int) -> None:
        salted = df.withColumn(
            "pid", F.pmod(F.xxhash64("doc_id"), F.lit(SALT_BUCKETS)))
        blocks = (salted.repartition(num_partitions, "pid")
                  .mapInArrow(_epoch_kernel(epoch, block_rows, codec),
                              BLOCKS_DDL))
        blocks.write.mode("append") \
            .option("compression", "uncompressed").parquet(ddir)
        table_io.commit(out_path, [{"part_id": -1, "epoch": int(epoch)}],
                        {"streaming": True})

    writer = (stream.writeStream
              .option("checkpointLocation", checkpoint_dir)
              .foreachBatch(sink))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
