"""Deterministic synthetic token table (FIXTURES.md F-MAIN).

The `input_hint` shape: (doc_id string, tokens array<int32>, n_tok
int32, source string). Fully numpy-vectorized; deterministic in
(seed, row_offset) so Spark partitions can generate disjoint slices
independently (seed + partition id) and re-runs reproduce bit-identical
input — required for resumable checkpointing (SURVEY.md §7.3.4).

Four per-row token styles (row index mod 4) guarantee every RLEv2
sub-encoding is exercised: run-heavy (SHORT_REPEAT / fixed DELTA),
monotonic (DELTA), outlier-spiked (PATCHED_BASE), uniform (DIRECT).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SOURCES = np.array(["commoncrawl", "wikipedia", "github", "books", "arxiv"])
SOURCE_W = np.array([0.5, 0.2, 0.15, 0.1, 0.05])
VOCAB = 50_000


def _segmented_cumsum(vals: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-row cumulative sum over a concatenated array."""
    c = np.cumsum(vals)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    corr = np.concatenate([[0], c])[starts]
    return c - np.repeat(corr, lens)


def token_table(rows: int, seed: int = 42, row_offset: int = 0) -> pa.Table:
    """Generate `rows` rows of the F-MAIN token table."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, row_offset]))
    gidx = row_offset + np.arange(rows, dtype=np.int64)

    n_tok = np.clip(rng.lognormal(5.0, 1.0, rows), 8, 8192).astype(np.int32)
    src_idx = rng.choice(len(SOURCES), size=rows, p=SOURCE_W)
    style = (gidx % 4).astype(np.int64)

    total = int(n_tok.sum())
    vals = np.empty(total, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(n_tok, dtype=np.int64)])
    lens64 = n_tok.astype(np.int64)
    # per-token row/style ids
    tok_style = np.repeat(style, lens64)

    def positions(s):
        return np.flatnonzero(tok_style == s)

    # style 0: run-heavy — ids repeated 3..10 times
    p0 = positions(0)
    if p0.size:
        m = p0.size // 3 + 2
        rl = rng.integers(3, 11, m)
        ids = rng.integers(0, VOCAB, m)
        runs = np.repeat(ids, rl)[: p0.size]
        if runs.size < p0.size:  # pathological, pad
            runs = np.concatenate(
                [runs, np.zeros(p0.size - runs.size, dtype=np.int64)])
        vals[p0] = runs

    # style 1: monotonic — per-row cumsum of 0..6 steps, mod 2^31
    rows1 = np.flatnonzero(style == 1)
    if rows1.size:
        l1 = lens64[rows1]
        steps = rng.integers(0, 7, int(l1.sum()))
        vals[np.flatnonzero(tok_style == 1)] = \
            _segmented_cumsum(steps, l1) % (2 ** 31)

    # style 2: zipf with 2% large outliers (PATCHED_BASE)
    p2 = positions(2)
    if p2.size:
        z = rng.zipf(1.3, p2.size) % VOCAB
        out_mask = rng.random(p2.size) < 0.02
        z[out_mask] = rng.integers(2 ** 20, 2 ** 30, int(out_mask.sum()))
        vals[p2] = z

    # style 3: uniform random
    p3 = positions(3)
    if p3.size:
        vals[p3] = rng.integers(0, VOCAB, p3.size)

    doc_id = np.char.add(
        np.char.add(SOURCES[src_idx], "/"),
        np.char.mod("%012d", gidx))
    tokens = pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32), type=pa.int32()),
        pa.array(vals.astype(np.int32), type=pa.int32()))
    return pa.table({
        "doc_id": pa.array(doc_id.tolist(), type=pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": pa.array(SOURCES[src_idx].tolist(), type=pa.string()),
    })


def write_token_table(spark, path: str, rows: int, partitions: int = 8,
                      seed: int = 42, rows_per_batch: int = 20_000) -> None:
    """Distributed deterministic write of the F-MAIN table to parquet.

    Each Spark partition generates disjoint row ranges; determinism
    comes from (seed, first row id of each Arrow batch).
    """
    import pyarrow as pa  # noqa: F401 (worker-side)

    def gen(batches):
        for b in batches:
            ids = b.column("id").to_numpy()
            for i in range(0, len(ids), rows_per_batch):
                chunk = ids[i: i + rows_per_batch]
                t = token_table(len(chunk), seed=seed,
                                row_offset=int(chunk[0]))
                yield from t.to_batches()

    df = spark.range(0, rows, 1, partitions)
    from engine.blocks import TOKEN_DDL
    df.mapInArrow(gen, TOKEN_DDL).write.mode("overwrite").parquet(path)
