"""ORC file concatenation WITHOUT decode — the small-files compactor.

A distributed writer (one part-file per task) inevitably produces
many small ORC files; at 10^12-row scale the resulting
file-count/stripe-size degradation is the classic "small files
problem". Because ORC stripes are self-contained (stream byte ranges
+ a stripe footer; ROW_INDEX positions are stripe-relative), files
with identical schema, compression and row-index stride can be merged
by COPYING stripe bytes verbatim and rewriting only the ~KB tail —
the same trick as orc-core's ConcatenateFiles / Hive's ALTER TABLE
CONCATENATE, at zero decode/re-encode CPU and I/O cost proportional
to the data copied once.

What the rewritten tail preserves:

* **Metadata** — each input's per-stripe StripeStatistics messages
  are copied RAW in stripe order, so planning-time stripe pruning
  (engine.orc_read.stripes_matching) over the merged file prunes
  exactly as it did over the inputs.
* **Footer stripe directory** — same (indexLength, dataLength,
  footerLength, numberOfRows), offsets rebased to the output.
* **Type tree** — copied raw from the first input (inputs are
  checked for semantic type equality first).
* **File-level ColumnStatistics** — recombined across inputs:
  numberOfValues sums, hasNull ORs, and typed min/max merge for
  int/double/string/date/timestamp/decimal kinds. A column whose
  min/max any input omitted while holding values (e.g. the NaN
  convention for floats) stays omitted in the output — the same
  conservative poisoning rule as the writer (engine/orc_file.py).
  Statistics sums (IntegerStatistics/DoubleStatistics field 3) merge
  by adding, and only when EVERY input carried one — an omitted
  input sum means overflow (the writers' omit-on-overflow
  convention), so the merged sum is omitted too rather than guessed.

ROW_INDEX, bloom filter streams, dictionaries and all data bytes are
untouched — readers seek inside the copied stripes exactly as before
(cross-checked against ORC C++ and orc-core in tests).
"""

from __future__ import annotations

import decimal
import os
import shutil

from .orc_file import (MAGIC, STAT_DATE, STAT_DEC, STAT_DOUBLE, STAT_INT,
                       STAT_STRING, STAT_TS, _col_stats_pb, _frame,
                       _sum_ok, pb_bytes, pb_varint)
from .orc_read import (COMP_NONE, K_BYTE, K_CHAR, K_DATE, K_DECIMAL,
                       K_DOUBLE, K_FLOAT, K_INT, K_LONG, K_SHORT,
                       K_STRING, K_TIMESTAMP, K_TIMESTAMP_INSTANT,
                       K_VARCHAR, OrcFileInfo, _deframe, _fields,
                       _parse_col_stats, read_orc_tail)

# ColumnStatistics min/max field number for each stat-capable kind;
# everything else (bool buckets, binary sums, containers) carries
# counts only after a merge
_KIND_TO_STAT = {
    K_BYTE: STAT_INT, K_SHORT: STAT_INT, K_INT: STAT_INT,
    K_LONG: STAT_INT,
    K_FLOAT: STAT_DOUBLE, K_DOUBLE: STAT_DOUBLE,
    K_STRING: STAT_STRING, K_VARCHAR: STAT_STRING, K_CHAR: STAT_STRING,
    K_DATE: STAT_DATE,
    K_TIMESTAMP: STAT_TS, K_TIMESTAMP_INSTANT: STAT_TS,
    K_DECIMAL: STAT_DEC,
}

_CODEC_NAMES = {0: "none", 1: "zlib", 2: "snappy", 3: "lzo", 4: "lz4",
                5: "zstd", 6: "brotli"}


def _tail_regions(info: OrcFileInfo) -> tuple[bytes, bytes, int]:
    """(decompressed footer bytes, decompressed metadata bytes,
    PostScript writerVersion) from a parsed tail — the raw regions
    OrcFileInfo walked in __init__."""
    data = info.data
    ps_len = data[-1]
    footer_len = metadata_len = 0
    writer_version = 0
    for fno, _, v in _fields(data[-1 - ps_len: -1]):
        if fno == 1:
            footer_len = v
        elif fno == 5:
            metadata_len = v
        elif fno == 6:
            writer_version = v
    footer = _deframe(data[-1 - ps_len - footer_len: -1 - ps_len],
                      info.compression)
    meta = _deframe(
        data[-1 - ps_len - footer_len - metadata_len:
             -1 - ps_len - footer_len],
        info.compression) if metadata_len else b""
    return footer, meta, writer_version


def _type_signature(info: OrcFileInfo) -> tuple:
    return tuple((t.kind, tuple(t.subtypes), tuple(t.field_names),
                  t.max_length, t.precision, t.scale)
                 for t in info.types)


def _merge_file_stats(infos: list[OrcFileInfo]) -> list[bytes]:
    """Recombined file-level ColumnStatistics messages (flattened
    column order), one per column of the shared type tree."""
    n_cols = len(infos[0].types)
    out = []
    for ci in range(n_cols):
        n = 0
        has_null = False
        poisoned = False
        mn = mx = None
        total = 0
        have_sum = True  # int sums add only if EVERY input carried one
        for info in infos:
            if ci >= len(info._file_stats_raw):
                # the same-writer precondition (checked in concat_orc)
                # makes a missing footer ColumnStatistics an anomaly;
                # silently merging would undercount numberOfValues and
                # could report hasNull=false despite nulls in the
                # copied stripes — fail loud instead of lying to
                # third-party tail readers
                raise ValueError(
                    f"concat_orc: an input carries no footer "
                    f"ColumnStatistics for column {ci} (got "
                    f"{len(info._file_stats_raw)} stat messages for "
                    f"{n_cols} columns); merged file statistics would "
                    "be wrong — decode-and-rewrite this file instead")
            d = _parse_col_stats(info._file_stats_raw[ci])
            n += d["n"]
            # absent hasNull (legacy third-party writer) reads as
            # unknown -> conservatively true, like orc-core
            has_null = has_null or d.get("has_null", True)
            if "sum" in d:
                total += d["sum"]
            elif d["n"] > 0:
                have_sum = False
            if "min" not in d or "max" not in d:
                if d["n"] > 0:
                    poisoned = True  # values but no bounds (e.g. NaN)
                continue
            mn = d["min"] if mn is None else min(mn, d["min"])
            mx = d["max"] if mx is None else max(mx, d["max"])
        fno = _KIND_TO_STAT.get(infos[0].types[ci].kind)
        stat = None
        if fno is not None and not poisoned and mn is not None:
            if fno == STAT_DEC and not isinstance(mn, decimal.Decimal):
                stat = None  # mismatched parse: stay conservative
            elif fno in (STAT_INT, STAT_DOUBLE) and have_sum \
                    and _sum_ok(fno, total):
                stat = (fno, mn, mx, total)
            else:
                stat = (fno, mn, mx)
        out.append(_col_stats_pb(n, has_null, stat))
    return out


def concat_orc(in_paths: list[str], out_path: str) -> dict:
    """Merge ``in_paths`` (order preserved) into one ORC file at
    ``out_path`` by raw stripe copy + tail rewrite. All inputs must
    share the type tree, compression kind/block size, row-index
    stride and writer id (fail-loud otherwise — a mixed directory
    needs a decode-and-rewrite, not a concat). Returns a manifest
    dict {n_files, n_stripes, n_rows, n_bytes}."""
    if not in_paths:
        raise ValueError("concat_orc needs at least one input")
    infos = [read_orc_tail(p) for p in in_paths]
    ref = infos[0]
    sig = _type_signature(ref)
    for p, info in zip(in_paths[1:], infos[1:]):
        if _type_signature(info) != sig:
            raise ValueError(f"{p}: schema differs from {in_paths[0]}")
        if info.compression != ref.compression \
                or info.block_size != ref.block_size:
            raise ValueError(
                f"{p}: compression {info.compression}/{info.block_size} "
                f"!= {ref.compression}/{ref.block_size}; stripes of "
                "differently-compressed files cannot share a file")
        if info.row_index_stride != ref.row_index_stride:
            raise ValueError(
                f"{p}: rowIndexStride {info.row_index_stride} != "
                f"{ref.row_index_stride} (file-level field; readers "
                "would mis-tile the copied ROW_INDEX entries)")
        if info.writer != ref.writer:
            raise ValueError(
                f"{p}: writer id {info.writer} != {ref.writer} "
                "(timestamp-convention resolution is per file)")

    comp_name = _CODEC_NAMES[ref.compression]

    def region(raw: bytes) -> bytes:
        if ref.compression == COMP_NONE or not raw:
            return raw
        return _frame(raw, ref.block_size, comp_name)[0]

    footers = [_tail_regions(i) for i in infos]
    # attempt-unique temp name: two concurrent attempts of one task
    # (speculative execution, a zombie executor racing a retry) must
    # write disjoint files — a SHARED tmp path would interleave their
    # writes and os.replace could publish a torn output. With unique
    # names the last os.replace wins atomically (both attempts wrote
    # identical content).
    import uuid as _uuid
    tmp = f"{out_path}.{_uuid.uuid4().hex}.tmp"
    stripes_pb = b""
    metadata = b""
    total_rows = 0
    n_stripes = 0
    try:
        with open(tmp, "wb") as out:
            out.write(MAGIC)
            pos = len(MAGIC)
            for path, info, (_, meta, _wv) in zip(in_paths, infos,
                                                  footers):
                with open(path, "rb") as f:
                    for si in info.stripes:
                        off, ilen, dlen, flen, rows = (
                            si[1], si[2], si[3], si[4], si[5])
                        f.seek(off)
                        _copy_exact(f, out, ilen + dlen + flen, path)
                        stripes_pb += pb_bytes(3, pb_varint(1, pos)
                                               + pb_varint(2, ilen)
                                               + pb_varint(3, dlen)
                                               + pb_varint(4, flen)
                                               + pb_varint(5, rows))
                        pos += ilen + dlen + flen
                        total_rows += rows
                        n_stripes += 1
                # per-stripe StripeStatistics copied raw, stripe order
                for fno, _, v in _fields(meta):
                    if fno == 1:
                        metadata += pb_bytes(1, bytes(v))
            content_len = pos
            meta_region = region(metadata)
            out.write(meta_region)
            # type tree raw from the first input (semantic equality
            # checked)
            types_raw = b"".join(pb_bytes(4, bytes(v))
                                 for fno, _, v in _fields(footers[0][0])
                                 if fno == 4)
            footer = pb_varint(1, len(MAGIC)) \
                + pb_varint(2, content_len) \
                + stripes_pb + types_raw + pb_varint(6, total_rows)
            for cs in _merge_file_stats(infos):
                footer += pb_bytes(7, cs)
            footer += pb_varint(8, ref.row_index_stride)
            if ref.writer:
                footer += pb_varint(9, ref.writer)
            footer = region(footer)
            out.write(footer)
            # writerVersion copied from the first input (reader quirk
            # switches key off it; the copied stripes ARE that
            # writer's)
            ps = pb_varint(1, len(footer)) \
                + pb_varint(2, ref.compression) \
                + pb_varint(3, ref.block_size) + pb_varint(4, 0) \
                + pb_varint(4, 12) + pb_varint(5, len(meta_region)) \
                + pb_varint(6, footers[0][2]) + pb_bytes(8000, MAGIC)
            out.write(ps)
            out.write(bytes([len(ps)]))
    except BaseException:
        # unique-named tmps are never reused by a retry (unlike the
        # old shared name): delete on ANY failure, or each failing
        # attempt of a flaky compaction leaks a fresh orphan in the
        # output directory
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    os.replace(tmp, out_path)
    return {"n_files": len(in_paths), "n_stripes": n_stripes,
            "n_rows": total_rows, "n_bytes": os.path.getsize(out_path)}


def _copy_exact(src, dst, n: int, path: str) -> None:
    """Copy exactly n bytes or fail loud (a short read means the
    stripe directory lies about the file — never write a torn file)."""
    copied = 0
    while copied < n:
        chunk = src.read(min(1 << 20, n - copied))
        if not chunk:
            raise IOError(f"{path}: stripe range truncated at "
                          f"{copied}/{n} bytes")
        dst.write(chunk)
        copied += len(chunk)
