"""Minimal pure-Python ORC tail parser (test oracle, PROBES.md P6).

Parses PostScript -> Footer -> StripeFooter of an *uncompressed* ORC
file using a hand-rolled protobuf wire-format walker (varint +
len-delimited only), and slices the exact per-stream byte ranges. Used
to cross-check our codecs against streams written by ORC C++
(pyarrow.orc) — an independent reference implementation.

Message/field numbers from reference-extract/orc_proto_descriptor.txt:
PostScript(:1059) footerLength=1 compression=2; Footer(:978)
stripes=3; StripeInformation(:767) offset=1 indexLength=2 dataLength=3
footerLength=4 numberOfRows=5; StripeFooter(:549) streams=1 columns=2;
Stream(:414) kind=1 column=2 length=3; ColumnEncoding(:491) kind=1
dictionarySize=2.
"""

from __future__ import annotations

STREAM_KINDS = {0: "PRESENT", 1: "DATA", 2: "LENGTH", 3: "DICTIONARY_DATA",
                4: "DICTIONARY_COUNT", 5: "SECONDARY", 6: "ROW_INDEX",
                7: "BLOOM_FILTER", 8: "BLOOM_FILTER_UTF8"}
ENCODINGS = {0: "DIRECT", 1: "DICTIONARY", 2: "DIRECT_V2", 3: "DICTIONARY_V2"}


def _varint(b: bytes, p: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        x = b[p]
        p += 1
        result |= (x & 0x7F) << shift
        if not (x & 0x80):
            return result, p
        shift += 7


def _fields(b: bytes):
    """Yield (field_number, wire_type, value) from a protobuf message."""
    p = 0
    while p < len(b):
        key, p = _varint(b, p)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, p = _varint(b, p)
        elif wt == 2:
            ln, p = _varint(b, p)
            v = b[p: p + ln]
            p += ln
        elif wt == 5:
            v = b[p: p + 4]
            p += 4
        elif wt == 1:
            v = b[p: p + 8]
            p += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def parse_orc(path: str) -> list[dict]:
    """Parse an uncompressed ORC file into per-stripe stream slices.

    Returns a list of stripes; each is a dict with:
      n_rows, encodings: {col: (name, dict_size)},
      streams: {(col, kind_name): bytes}
    """
    with open(path, "rb") as f:
        data = f.read()
    ps_len = data[-1]
    ps = data[-1 - ps_len: -1]
    footer_len = 0
    compression = 0
    for fno, _, v in _fields(ps):
        if fno == 1:
            footer_len = v
        elif fno == 2:
            compression = v
    if compression != 0:
        raise ValueError("only compression=NONE files supported")
    footer = data[-1 - ps_len - footer_len: -1 - ps_len]
    stripes_info = []
    for fno, _, v in _fields(footer):
        if fno == 3:  # StripeInformation
            si = {1: 0, 2: 0, 3: 0, 4: 0, 5: 0}
            for f2, _, v2 in _fields(v):
                si[f2] = v2
            stripes_info.append(si)
    out = []
    for si in stripes_info:
        off, ilen, dlen, flen, nrows = (si[1], si[2], si[3], si[4], si[5])
        sf = data[off + ilen + dlen: off + ilen + dlen + flen]
        streams = []
        encodings = {}
        col = 0
        for fno, _, v in _fields(sf):
            if fno == 1:  # Stream
                s = {1: 0, 2: 0, 3: 0}
                for f2, _, v2 in _fields(v):
                    s[f2] = v2
                streams.append((s[2], STREAM_KINDS.get(s[1], s[1]), s[3]))
            elif fno == 2:  # ColumnEncoding
                kind = 0
                dsz = 0
                for f2, _, v2 in _fields(v):
                    if f2 == 1:
                        kind = v2
                    elif f2 == 2:
                        dsz = v2
                encodings[col] = (ENCODINGS.get(kind, kind), dsz)
                col += 1
        # slice stream bytes: index streams live in [off, off+ilen),
        # data streams in [off+ilen, off+ilen+dlen), both in list order
        smap = {}
        pos = off
        for scol, skind, slen in streams:
            smap[(scol, skind)] = data[pos: pos + slen]
            pos += slen
        out.append({"n_rows": nrows, "encodings": encodings,
                    "streams": smap})
    return out
