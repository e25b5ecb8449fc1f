"""Distributed ORC file emission (SURVEY.md §2.5 M4, scale-true form).

Each physical partition writes ONE ``part-<pid>.orc`` file with the
engine's spec-conformant ORC v1 writer (engine/orc_file.py) from
inside a ``mapInArrow`` kernel — the multi-file layout every
distributed ORC writer produces (orc-core PhysicalFsWriter, one
writer per task; reference-extract/javap/PhysicalFsWriter.txt:34-48).
Nothing funnels through the driver: the kernel's output is a tiny
per-file manifest row, and readers (``spark.read.orc(dir)``,
ORC C++/pyarrow per file) scan the directory in parallel.

Memory: a task buffers its partition before writing (write_orc takes
a table and slices stripes internally), so partition sizing bounds
writer memory exactly like ORC's stripe-flush budget — size the
upstream ``repartition`` so partitions fit the executor arena.

Path contract: ``out_dir`` must be visible to every task (shared FS,
NFS, or local mode) — same POSIX constraint as jobs/table_io.py; the
swap-in for object stores is writing to the Hadoop FS API.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

from jobs.table_io import _require_local

MANIFEST_DDL = "path string, part_id bigint, n_rows bigint, n_bytes bigint"


def write_orc_dir(df: DataFrame, out_dir: str,
                  stripe_rows: int = 1_000_000,
                  timestamp_convention: str = "cpp",
                  row_index_stride: int = 10_000,
                  compression: str = "zlib",
                  bloom_columns: tuple | list = (),
                  timestamp_instant: bool = False) -> DataFrame:
    """Write ``df`` as a directory of ORC part-files, one per physical
    partition; returns the (lazy) per-file manifest DataFrame —
    ``.collect()`` it to run the write. Empty partitions emit nothing.
    ``timestamp_convention``: see engine.orc_file.write_orc ("java"
    for files orc-core/Spark must read with pre-1970 instants).
    ``row_index_stride``: rows per ROW_INDEX entry (0 = no index);
    index-aware readers seek/skip at this granularity.
    ``compression``: "zlib" (default — ORC's own default codec, ~2x
    smaller part-files, positions stay seekable), "snappy", "lz4",
    "zstd", "brotli", or "none" (engine.orc_file.write_orc).
    ``bloom_columns``: per-row-group BLOOM_FILTER_UTF8 streams for
    these columns (engine.orc_file.write_orc).
    ``timestamp_instant``: emit tz-aware columns as TIMESTAMP_INSTANT
    (engine.orc_file.write_orc — default off because Spark's own ORC
    reader rejects instant columns).
    """
    out_dir = _require_local(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def kernel(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        from engine.orc_file import write_orc
        parts = [b for b in batches if b.num_rows]
        if not parts:
            return
        pid = TaskContext.get().partitionId()
        tbl = pa.Table.from_batches(parts)
        path = os.path.join(out_dir, f"part-{pid:05d}.orc")
        # attempt-unique temp name: a speculative/retried attempt of
        # the same partition must not interleave writes into a shared
        # tmp file (same hazard engine/orc_concat.py fixed); the last
        # os.replace wins atomically
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        try:
            write_orc(tbl, tmp, stripe_rows=stripe_rows,
                      timestamp_convention=timestamp_convention,
                      row_index_stride=row_index_stride,
                      compression=compression,
                      bloom_columns=tuple(bloom_columns),
                      timestamp_instant=timestamp_instant)
            os.replace(tmp, path)  # atomic publish, no partials on crash
        finally:
            if os.path.exists(tmp):  # failed attempt: drop the partial
                os.unlink(tmp)
        yield pa.RecordBatch.from_arrays(
            [pa.array([path]), pa.array([pid], type=pa.int64()),
             pa.array([tbl.num_rows], type=pa.int64()),
             pa.array([os.path.getsize(path)], type=pa.int64())],
            names=["path", "part_id", "n_rows", "n_bytes"])

    return df.mapInArrow(kernel, MANIFEST_DDL)
