"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The real decoders (PIL/ffmpeg/soundfile) are not in this container,
so the *decode step* is stubbed behind ``require_codecs()`` /
deterministic fakes — but everything Spark-side is real and tested:
the schema (binary blob + metadata struct), the partition-preserving
``mapInPandas`` kernels with Arrow-batched signatures, frame slicing
via binary substring, and the feature-extraction dataflow.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

BLOB_SCHEMA = ("doc_id string, blob binary, "
               "meta struct<format:string, width:int, height:int, "
               "n_frames:int>")

HAVE_IMAGE_CODECS = False  # PIL/cv2 not installed in this sandbox


def require_codecs():
    if not HAVE_IMAGE_CODECS:
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "install pillow/av and set HAVE_IMAGE_CODECS to enable "
            "real decoding — the Spark plumbing below is live either way")


def synth_blobs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake blobs: the UTF-8 bytes of the text stand in
    for encoded media; metadata derives from the byte length. Lets the
    whole multimodal dataflow run and oracle-check without codecs."""
    t = F.col(text_col)
    blob = F.encode(t, "UTF-8")
    n = F.octet_length(blob)
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        blob.alias("blob"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.pmod(n, F.lit(640)) + 1).cast("int").alias("width"),
            (F.pmod(n, F.lit(480)) + 1).cast("int").alias("height"),
            (F.pmod(n, F.lit(30)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"))


def blob_features(blobs: DataFrame) -> DataFrame:
    """Cheap feature extraction on the blob bytes — pure built-ins:
    size, md5, header byte. (A real image featurizer would be the
    mapInPandas kernel below.)"""
    return blobs.select(
        "doc_id",
        F.octet_length("blob").alias("n_bytes"),
        F.md5("blob").alias("digest"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"))


def frame_sample(blobs: DataFrame, every: int = 4) -> DataFrame:
    """'Video' frame sampling: slice the blob into meta.n_frames equal
    chunks and keep every ``every``-th — binary slicing with built-in
    substring, fully JVM-side."""
    n = F.octet_length("blob")
    fsz = F.greatest(F.floor(n / F.col("meta.n_frames")), F.lit(1)) \
        .cast("int")
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1)
    frames = F.filter(idx, lambda i: i % every == 0)
    return blobs.select(
        "doc_id",
        F.explode(F.transform(
            frames,
            lambda i: F.struct(
                i.cast("int").alias("frame_no"),
                F.col("blob").substr(
                    (i * fsz + 1).cast("int"), fsz).alias("frame")))
        ).alias("fr")) \
        .select("doc_id", F.col("fr.frame_no").alias("frame_no"),
                F.col("fr.frame").alias("frame"))


def resize_stub(blobs: DataFrame, factor: int = 4) -> DataFrame:
    """'Resize' stand-in: keep every ``factor``-th byte of the decoded
    buffer (a real implementation would decode + PIL-resize behind
    ``require_codecs``; the Spark-side plumbing — Arrow-batched
    mapInPandas, binary in/binary out, deterministic downsampling — is
    what this exercises for real).

    Vectorized: one fancy-gather over the batch's concatenated buffer;
    no per-row Python arithmetic."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in it:
            vals = pdf["blob"].to_numpy()
            n = len(vals)
            lens = np.fromiter((len(b) for b in vals), dtype=np.int64,
                               count=n)
            buf = np.frombuffer(b"".join(vals), dtype=np.uint8)
            offs = np.concatenate(([0], np.cumsum(lens)))
            out_lens = (lens + factor - 1) // factor
            # position k of row i reads byte offs[i] + k*factor
            within = np.arange(int(out_lens.sum()), dtype=np.int64)
            row_of = np.repeat(np.arange(n), out_lens)
            out_offs = np.concatenate(([0], np.cumsum(out_lens)))
            within -= out_offs[row_of]
            small = buf[np.repeat(offs[:-1], out_lens)
                        + within * factor]
            thumbs = [small[out_offs[i]: out_offs[i + 1]].tobytes()
                      for i in range(n)]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes_out": out_lens,
                "thumb": thumbs,
            })

    return blobs.mapInPandas(
        kernel, "doc_id string, n_bytes_out long, thumb binary")


def decode_stub_features(blobs: DataFrame) -> DataFrame:
    """The mapInPandas featurizer shape: Arrow-batched, partition-
    preserving. The per-blob 'decode' is a deterministic fake (sum of
    bytes) standing in for a pixel decode; swap the numpy body for PIL
    when available (require_codecs).

    Vectorized: the batch's blobs are concatenated into ONE uint8
    buffer and per-row sums come from a cumulative-sum gather — no
    per-row Python arithmetic (the pattern a real featurizer should
    follow: decode into a single arena, reduce with numpy)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in it:
            vals = pdf["blob"].to_numpy()
            n = len(vals)
            lens = np.fromiter((len(b) for b in vals), dtype=np.int64,
                               count=n)
            buf = np.frombuffer(b"".join(vals), dtype=np.uint8)
            cum = np.concatenate(
                ([0], np.cumsum(buf, dtype=np.int64)))
            offs = np.concatenate(([0], np.cumsum(lens)))
            sums = cum[offs[1:]] - cum[offs[:-1]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": lens,
                "byte_sum": sums,
            })

    return blobs.mapInPandas(kernel,
                             "doc_id string, n_bytes long, byte_sum long")
