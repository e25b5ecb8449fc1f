"""Distributed decode + verify job (SURVEY.md §3.3, §2.5 M6).

decode: blocks table -> token rows via mapInArrow(decode kernel).
verify: join-free bit-identity check of decode(encode(input)) against
the input — xxhash64 over (doc_id, token array, n_tok, source) per
row, compared with exceptAll in both directions (the BASELINE.json
"decode bit-identity" metric, scalable: two shuffles, no wide join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from engine.blocks import TOKEN_DDL, decode_batches
from jobs.encode import read_blocks


def stride_pruned_kernel(ntok_min=None, ntok_max=None,
                         tok_min=None, tok_max=None, columns=None):
    """mapInArrow kernel: per block, decode ONLY the strides whose
    metadata intersects the predicates (engine.blocks.stride_row_spans
    plans the row spans; decode_block_rows seeks inside the token
    stream via the chunk directories), and ONLY the projected columns'
    streams (``columns``). Returned rows are a SUPERSET of matching
    rows — apply the exact filter downstream."""
    def kernel(batches):
        from engine.blocks import decode_block_rows, stride_row_spans
        for batch in batches:
            for row in batch.to_pylist():
                for r0, r1 in stride_row_spans(
                        row, ntok_min=ntok_min, ntok_max=ntok_max,
                        tok_min=tok_min, tok_max=tok_max):
                    rb, _ = decode_block_rows(row, r0, r1,
                                              columns=columns)
                    if rb.num_rows:
                        yield rb
    return kernel


def decode_table(spark: SparkSession, blocks_path: str,
                 tok_min: int | None = None,
                 tok_max: int | None = None,
                 ntok_min: int | None = None,
                 ntok_max: int | None = None,
                 stride_seek: bool = True,
                 columns: list[str] | None = None) -> DataFrame:
    """Decode the blocks table, pruning by footer-style block
    statistics BEFORE any decode work, then by stride statistics
    INSIDE each surviving block.

    Block level: the stat columns are plain int64 parquet columns, so
    Catalyst pushes these filters into the scan (PushedFilters on
    tokens.vmin / tokens.vmax — parquet row-group min/max skipping
    applies) and whole blocks are skipped without touching their
    binary streams. Stride level (``stride_seek``): surviving blocks
    decode only the ~10k-row strides whose min/max intersect the
    predicates, seeking into the token stream via the chunk
    directories (the ORC RowIndexEntry.positions capability). Rows
    returned are a superset of matching rows (pruning, not filtering).
    """
    blocks = read_blocks(spark, blocks_path)
    if tok_min is not None:
        blocks = blocks.where(F.col("tokens.vmax") >= tok_min)
    if tok_max is not None:
        blocks = blocks.where(F.col("tokens.vmin") <= tok_max)
    if ntok_min is not None:
        blocks = blocks.where(F.col("ntok.vmax") >= ntok_min)
    if ntok_max is not None:
        blocks = blocks.where(F.col("ntok.vmin") <= ntok_max)
    any_pred = any(p is not None
                   for p in (tok_min, tok_max, ntok_min, ntok_max))
    if stride_seek and any_pred:
        from engine.blocks import projected_ddl
        ddl = projected_ddl(columns) if columns else TOKEN_DDL
        return blocks.mapInArrow(
            stride_pruned_kernel(ntok_min=ntok_min, ntok_max=ntok_max,
                                 tok_min=tok_min, tok_max=tok_max,
                                 columns=columns),
            ddl)
    if columns:
        # decode-side column pruning: the kernel inflates/decodes only
        # the streams the projection needs (an n_tok-only projection
        # never touches the token DATA stream — engine.blocks
        # decode_block) AND only the projected Arrow columns cross the
        # Python->JVM boundary
        from engine.blocks import projected_ddl

        def kernel(batches):
            yield from decode_batches(batches, columns=columns)

        return blocks.mapInArrow(kernel, projected_ddl(columns))
    return blocks.mapInArrow(decode_batches, TOKEN_DDL)


def row_hashes(df: DataFrame) -> DataFrame:
    """One xxhash64 per row over every column (token arrays included —
    Spark hashes array elements structurally)."""
    return df.select(
        F.xxhash64("doc_id", "tokens", "n_tok", "source").alias("h"))


def verify_identity(input_df: DataFrame, decoded_df: DataFrame) -> dict:
    """Bit-identity report: row counts and symmetric hash differences."""
    a = row_hashes(input_df)
    b = row_hashes(decoded_df)
    missing = a.exceptAll(b).count()
    extra = b.exceptAll(a).count()
    n_in = input_df.count()
    n_out = decoded_df.count()
    return {
        "rows_in": n_in, "rows_out": n_out,
        "missing": missing, "extra": extra,
        "identical": missing == 0 and extra == 0 and n_in == n_out,
    }


def block_point_lookup(row: dict, ids: list[str],
                       qdata=None, qlens=None):
    """Point-lookup decode of ONE block row, composing all three prune
    levels: bloom -> doc_id-projected decode -> stride/chunk seek.

    1. The block's doc_id bloom (ORC BloomFilterUtf8 semantics) is
       tested first — a miss skips the block without touching any
       value stream.
    2. Surviving blocks decode ONLY the doc_id column (decode-side
       projection: the token DATA stream, ~97% of block bytes, is not
       inflated) to locate the exact matching row positions.
    3. Only the matching row runs are decoded in full, seeking into
       the token stream via the chunk directories
       (engine.blocks.decode_block_rows) — token bytes touched scale
       with HITS, not block size.

    Returns ``(record_batch_or_None, token_bytes_touched)``; the batch
    still needs the exact doc_id filter downstream (decode_block_rows
    returns whole chunk-covered runs only when hits are adjacent —
    here runs are exact row spans, but keep the filter for safety).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from engine.blocks import decode_block, decode_block_rows
    from engine.bloom import BloomFilter

    if qdata is None:
        qdata = np.frombuffer("".join(ids).encode(), np.uint8)
        qlens = np.array([len(i.encode()) for i in ids], dtype=np.int64)
    blob = row.get("bloom_doc_id")
    if blob:
        bf = BloomFilter.deserialize(blob)
        if not bf.test_strings(qdata, qlens).any():
            return None, 0  # bloom-pruned: skip whole block
    id_batch = decode_block(row, columns=["doc_id"])
    hit = np.flatnonzero(
        np.asarray(pc.is_in(id_batch.column("doc_id"),
                            value_set=pa.array(ids))))
    if hit.size == 0:
        return None, 0  # bloom false positive: still no token bytes
    # merge consecutive hit rows into runs; decode each run via the
    # chunk-directory seek path
    splits = np.flatnonzero(np.diff(hit) > 1) + 1
    batches, touched = [], 0
    for run in np.split(hit, splits):
        rb, tb = decode_block_rows(row, int(run[0]), int(run[-1]) + 1)
        batches.append(rb)
        touched += tb
    tbl = pa.Table.from_batches(batches).combine_chunks()
    return tbl.to_batches()[0] if tbl.num_rows else None, touched


def lookup_doc_ids(spark: SparkSession, blocks_path: str,
                   doc_ids: list[str]) -> DataFrame:
    """Point lookups composing bloom -> projection -> stride seek per
    block (:func:`block_point_lookup`). At 10^12 rows a point query
    reads bloom blobs (~1.5 KB per 8k-row block) for most blocks, the
    small doc_id streams for bloom-surviving blocks, and token-stream
    chunks only around actual hits."""
    ids = [str(d) for d in doc_ids]

    def prune_and_decode(batches):
        import numpy as np
        qdata = np.frombuffer("".join(ids).encode(), np.uint8)
        qlens = np.array([len(i.encode()) for i in ids], dtype=np.int64)
        for batch in batches:
            for row in batch.to_pylist():
                rb, _ = block_point_lookup(row, ids, qdata, qlens)
                if rb is not None:
                    yield rb

    blocks = read_blocks(spark, blocks_path)
    dec = blocks.mapInArrow(prune_and_decode, TOKEN_DDL)
    return dec.where(F.col("doc_id").isin(ids))
