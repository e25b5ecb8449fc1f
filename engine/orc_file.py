"""Real ORC v1 file emission (SURVEY.md M4 completion): assemble the
engine's byte-compatible streams into a `.orc` file that independent
ORC readers (ORC C++ / orc-core) open directly.

Layout (ORC v1 spec; field numbers verified against the runtime proto
descriptor, reference-extract/orc_proto_descriptor.txt):

    "ORC"                      3-byte header magic
    stripe*:  data streams ... StripeFooter(pb)
    Metadata(pb)               per-stripe ColumnStatistics (min/max
                               for int/double/string/date columns —
                               the stripe-pruning surface)
    Footer(pb)                 incl file-level aggregated statistics
    PostScript(pb)  +  1 trailing byte = len(PostScript)

The protobuf layer is hand-rolled (varint / length-delimited only —
exactly what the ORC tail needs), mirroring tests/orc_tail.py's
hand-rolled parser on the read side. Compression: NONE (the outer C1
wrapper is this engine's block-level concern; ORC interchange files
are written uncompressed so any reader, however minimal, can consume
them).

Supported column types: struct root, string (dict/direct via the
engine selector), binary, int8/16/32/64, float32/64, date32,
timestamp[ns] (C++ pre-1970 convention, engine/types.py),
decimal128(p,s), list<supported>. Nulls become PRESENT streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import decimal128 as d128
from . import rle1, rle2, strings, types as T

MAGIC = b"ORC"

# Stream.Kind
PRESENT, DATA, LENGTH, DICTIONARY_DATA, _, SECONDARY = range(6)
# ColumnEncoding.Kind
ENC_DIRECT, ENC_DICTIONARY, ENC_DIRECT_V2, ENC_DICTIONARY_V2 = range(4)
# Type.Kind
K_BOOLEAN, K_BYTE, K_SHORT, K_INT, K_LONG, K_FLOAT, K_DOUBLE, K_STRING, \
    K_BINARY, K_TIMESTAMP, K_LIST, K_MAP, K_STRUCT, K_UNION, K_DECIMAL, \
    K_DATE = range(16)


# --- minimal protobuf writer ----------------------------------------------

def _uv(n: int) -> bytes:
    out = bytearray()
    n = int(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def pb_varint(field: int, val: int) -> bytes:
    return _uv((field << 3) | 0) + _uv(val)


def pb_bytes(field: int, payload: bytes) -> bytes:
    return _uv((field << 3) | 2) + _uv(len(payload)) + payload


def pb_str(field: int, s: str) -> bytes:
    return pb_bytes(field, s.encode())


def pb_svarint(field: int, val: int) -> bytes:
    """TYPE_SINT: zigzag varint."""
    v = int(val)
    # Python's arithmetic shift keeps the sign for arbitrary
    # magnitude: v >> 63 is 0 for v >= 0 and -1 (all ones) otherwise
    return _uv((field << 3) | 0) + _uv((v << 1) ^ (v >> 63))


def pb_double(field: int, x: float) -> bytes:
    import struct
    return _uv((field << 3) | 1) + struct.pack("<d", float(x))


# ColumnStatistics sub-message field per stat kind
STAT_INT, STAT_DOUBLE, STAT_STRING, STAT_DATE = 2, 3, 4, 7


def _stat_sub(stat) -> bytes:
    """(field_no, min, max) -> typed min/max sub-message bytes."""
    fno, mn, mx = stat
    if fno == STAT_INT or fno == STAT_DATE:
        body = pb_svarint(1, mn) + pb_svarint(2, mx)
    elif fno == STAT_DOUBLE:
        body = pb_double(1, mn) + pb_double(2, mx)
    else:
        body = pb_str(1, mn) + pb_str(2, mx)
    return pb_bytes(fno, body)


def _col_stats_pb(nv: int, has_null: bool, stat) -> bytes:
    """One ColumnStatistics message (numberOfValues, typed min/max,
    hasNull) — used identically for the Footer (file-level) and the
    Metadata section (per-stripe)."""
    body = pb_varint(1, nv)
    if stat is not None:
        body += _stat_sub(stat)
    return body + pb_varint(10, 1 if has_null else 0)


def _minmax(vals: pa.Array):
    """(min, max) of a non-null arrow array, or None when empty."""
    if len(vals) == 0:
        return None
    import pyarrow.compute as pc
    mm = pc.min_max(vals)
    return mm["min"].as_py(), mm["max"].as_py()


# --- per-type column encoders ---------------------------------------------

_INT_KINDS = {pa.int8(): K_BYTE, pa.int16(): K_SHORT,
              pa.int32(): K_INT, pa.int64(): K_LONG}


def _present(arr: pa.Array):
    if arr.null_count == 0:
        return None, arr
    valid = ~np.asarray(arr.is_null())
    return rle1.encode_bool(valid).tobytes(), arr.drop_null()


class _Col:
    """One encoded column: ORC type node + streams + encoding."""

    def __init__(self, kind: int, streams, encoding=ENC_DIRECT_V2,
                 dict_size: int = 0, subtypes=(), field_names=(),
                 precision: int = 0, scale: int = 0,
                 n_values: int = 0, has_null: bool = False,
                 stat=None):
        self.kind = kind
        self.streams = streams          # [(stream_kind, bytes), ...]
        self.encoding = encoding
        self.dict_size = dict_size
        self.subtypes = list(subtypes)  # child _Col objects
        self.field_names = list(field_names)
        self.precision = precision
        self.scale = scale
        self.n_values = n_values
        self.has_null = has_null
        self.stat = stat            # (stat_field_no, min, max) | None


def _encode_column(arr: pa.Array, ts_conv: str = "cpp") -> _Col:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    pres, vals = _present(arr)
    streams = [] if pres is None else [(PRESENT, pres)]
    nv = len(vals)
    hn = pres is not None

    if pa.types.is_struct(t):
        children = [_encode_column(arr.field(i), ts_conv)
                    for i in range(t.num_fields)]
        return _Col(K_STRUCT, streams, ENC_DIRECT, subtypes=children,
                    field_names=[t.field(i).name
                                 for i in range(t.num_fields)],
                    n_values=nv, has_null=hn)
    if pa.types.is_list(t):
        lens = np.diff(np.asarray(vals.offsets, dtype=np.int64))
        streams.append((LENGTH, rle2.encode_rlev2(
            lens, signed=False).tobytes()))
        child = _encode_column(vals.flatten(), ts_conv)
        return _Col(K_LIST, streams, ENC_DIRECT_V2, subtypes=[child],
                    n_values=nv, has_null=hn)
    if pa.types.is_map(t):
        # MAP = LENGTH + key/value child writers
        # (javap/MapTreeWriter.txt:3-6). A sliced MapArray exposes the
        # FULL child arrays with window-absolute offsets — slice the
        # children to the window explicitly.
        off = np.asarray(vals.offsets, dtype=np.int64)
        lens = np.diff(off)
        streams.append((LENGTH, rle2.encode_rlev2(
            lens, signed=False).tobytes()))
        kcol = _encode_column(
            vals.keys.slice(off[0], off[-1] - off[0]), ts_conv)
        vcol = _encode_column(
            vals.items.slice(off[0], off[-1] - off[0]), ts_conv)
        return _Col(K_MAP, streams, ENC_DIRECT_V2, subtypes=[kcol, vcol],
                    n_values=nv, has_null=hn)
    if t in _INT_KINDS:
        v = np.asarray(vals, dtype=np.int64)
        streams.append((DATA, rle2.encode_rlev2(v, signed=True).tobytes()))
        stat = (STAT_INT, int(v.min()), int(v.max())) if nv else None
        return _Col(_INT_KINDS[t], streams, ENC_DIRECT_V2,
                    n_values=nv, has_null=hn, stat=stat)
    if pa.types.is_floating(t):
        double = t == pa.float64()
        v = np.asarray(vals, dtype=np.float64 if double else np.float32)
        streams.append((DATA, T.encode_floats(v, double=double).tobytes()))
        # ORC writers omit double min/max when NaN is present
        stat = None
        if nv and not np.isnan(mn := float(v.min())):
            stat = (STAT_DOUBLE, mn, float(v.max()))
        return _Col(K_DOUBLE if double else K_FLOAT, streams, ENC_DIRECT,
                    n_values=nv, has_null=hn, stat=stat)
    if pa.types.is_date32(t):
        v = np.asarray(vals.cast(pa.int32()), dtype=np.int64)
        streams.append((DATA, T.encode_date(v).tobytes()))
        stat = (STAT_DATE, int(v.min()), int(v.max())) if nv else None
        return _Col(K_DATE, streams, ENC_DIRECT_V2,
                    n_values=nv, has_null=hn, stat=stat)
    if pa.types.is_timestamp(t):
        ns = np.asarray(vals.cast(pa.timestamp("ns")).cast(pa.int64()),
                        dtype=np.int64)
        data, sec = T.encode_timestamp(ns, convention=ts_conv)
        streams.append((DATA, data.tobytes()))
        streams.append((SECONDARY, sec.tobytes()))
        return _Col(K_TIMESTAMP, streams, ENC_DIRECT_V2,
                    n_values=nv, has_null=hn)
    if pa.types.is_decimal(t):
        buf = vals.buffers()[1]
        raw = np.frombuffer(buf, dtype=np.uint64,
                            count=2 * nv, offset=16 * vals.offset)
        lo, hi = raw[0::2].copy(), raw[1::2].view(np.int64).copy()
        streams.append((DATA, d128.encode_unbounded_varints(
            lo, hi).tobytes()))
        streams.append((SECONDARY, rle2.encode_rlev2(
            np.full(nv, t.scale, dtype=np.int64), signed=True).tobytes()))
        return _Col(K_DECIMAL, streams, ENC_DIRECT_V2,
                    precision=t.precision, scale=t.scale,
                    n_values=nv, has_null=hn)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        data, lens = strings.arrow_bytes_lengths(vals)
        streams.append((DATA, data.tobytes()))
        streams.append((LENGTH, rle2.encode_rlev2(
            lens, signed=False).tobytes()))
        return _Col(K_BINARY, streams, ENC_DIRECT_V2,
                    n_values=nv, has_null=hn)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        enc = strings.encode_strings(vals.cast(pa.large_string()))
        stat = None
        if nv:
            mn, mx = _minmax(vals)
            stat = (STAT_STRING, mn, mx)
        if enc["kind"] == "DICTIONARY_V2":
            streams.append((DATA, enc["data"].tobytes()))
            streams.append((LENGTH, enc["length"].tobytes()))
            streams.append((DICTIONARY_DATA, enc["dict_data"].tobytes()))
            return _Col(K_STRING, streams, ENC_DICTIONARY_V2,
                        dict_size=int(enc["dict_size"]),
                        n_values=nv, has_null=hn, stat=stat)
        streams.append((DATA, enc["data"].tobytes()))
        streams.append((LENGTH, enc["length"].tobytes()))
        return _Col(K_STRING, streams, ENC_DIRECT_V2,
                    n_values=nv, has_null=hn, stat=stat)
    raise NotImplementedError(f"ORC writer: unsupported type {t}")


def _flatten(col: _Col, out: list[_Col]) -> None:
    out.append(col)
    for c in col.subtypes:
        _flatten(c, out)


def _type_tree(cols: list[_Col]) -> bytes:
    """Footer.types: pre-order nodes with subtype column ids."""
    ids = {id(c): i for i, c in enumerate(cols)}
    out = b""
    for c in cols:
        body = pb_varint(1, c.kind)
        for sub in c.subtypes:
            body += pb_varint(2, ids[id(sub)])
        for fn in c.field_names:
            body += pb_str(3, fn)
        if c.precision:
            body += pb_varint(5, c.precision) + pb_varint(6, c.scale)
        out += pb_bytes(4, body)
    return out


def write_orc(table: pa.Table, path: str,
              stripe_rows: int = 1_000_000,
              timestamp_convention: str = "cpp") -> None:
    """Write ``table`` as an uncompressed ORC v1 file readable by ORC
    C++ / orc-core (verified via pyarrow.orc in tests).

    ``timestamp_convention``: pre-1970 sub-second layout — "cpp"
    (default, ORC C++ signed nanos) or "java" (orc-core positive
    nanos + seconds fix-up, the ORC-611 divergence); pick "java" for
    files that orc-core/Spark must read with pre-1970 instants
    (engine/types.py encode_timestamp).
    """
    table = table.combine_chunks()
    out = bytearray(MAGIC)
    stripes_pb = b""
    total_rows = table.num_rows
    n_stripes = 0
    stats_cols: list[_Col] | None = None
    # file-level statistics accumulate across ALL stripes (per flattened
    # column index): numberOfValues is the sum of per-stripe non-null
    # counts and hasNull the OR — readers that trust file stats (COUNT
    # pushdown, hasNull-based IS NULL pruning) see the whole file, not
    # just the last stripe
    agg_nvals: list[int] = []
    agg_hasnull: list[bool] = []
    agg_stat: list[tuple | None] = []
    # Metadata section: one StripeStatistics (repeated ColumnStatistics,
    # flattened pre-order) per stripe — what planning-time stripe
    # pruning reads (engine.orc_read.stripes_matching)
    metadata = b""

    for s0 in range(0, max(total_rows, 1), stripe_rows):
        chunk = table.slice(s0, stripe_rows)
        if chunk.num_rows == 0 and total_rows > 0:
            break
        root = _encode_column(pa.StructArray.from_arrays(
            [chunk.column(i).combine_chunks()
             for i in range(chunk.num_columns)],
            names=chunk.column_names), timestamp_convention)
        cols: list[_Col] = []
        _flatten(root, cols)
        if not agg_nvals:
            agg_nvals = [0] * len(cols)
            agg_hasnull = [False] * len(cols)
            agg_stat = [None] * len(cols)
        for i, c in enumerate(cols):
            agg_nvals[i] += c.n_values
            agg_hasnull[i] = agg_hasnull[i] or c.has_null
            if c.stat is not None:
                if agg_stat[i] is None:
                    agg_stat[i] = c.stat
                else:
                    fno, mn, mx = agg_stat[i]
                    agg_stat[i] = (fno, min(mn, c.stat[1]),
                                   max(mx, c.stat[2]))
        metadata += pb_bytes(1, b"".join(
            pb_bytes(1, _col_stats_pb(c.n_values, c.has_null, c.stat))
            for c in cols))
        offset = len(out)
        sf = b""
        data_len = 0
        for ci, c in enumerate(cols):
            for kind, payload in c.streams:
                out += payload
                data_len += len(payload)
                sf += pb_bytes(1, pb_varint(1, kind) + pb_varint(2, ci)
                               + pb_varint(3, len(payload)))
        for c in cols:
            sf += pb_bytes(2, pb_varint(1, c.encoding)
                           + (pb_varint(2, c.dict_size)
                              if c.dict_size else b""))
        sf += pb_str(3, "UTC")
        out += sf
        stripes_pb += pb_bytes(3, pb_varint(1, offset)
                               + pb_varint(2, 0)
                               + pb_varint(3, data_len)
                               + pb_varint(4, len(sf))
                               + pb_varint(5, chunk.num_rows))
        stats_cols = cols
        n_stripes += 1

    content_len = len(out)
    out += metadata
    footer = pb_varint(1, len(MAGIC)) + pb_varint(2, content_len) \
        + stripes_pb + _type_tree(stats_cols or []) \
        + pb_varint(6, total_rows)
    for nv, hn, st in zip(agg_nvals, agg_hasnull, agg_stat):
        footer += pb_bytes(7, _col_stats_pb(nv, hn, st))
    footer += pb_varint(8, 0)  # row_index_stride=0: no ROW_INDEX streams
    out += footer
    ps = pb_varint(1, len(footer)) + pb_varint(2, 0) \
        + pb_varint(3, 64 * 1024) + pb_varint(4, 0) + pb_varint(4, 12) \
        + pb_varint(5, len(metadata)) + pb_varint(6, 6) \
        + pb_bytes(8000, MAGIC)
    out += ps
    out.append(len(ps))
    with open(path, "wb") as f:
        f.write(bytes(out))
