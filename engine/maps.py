"""MAP column codec (SURVEY.md §2.4 T6 completion).

ORC's MapTreeWriter (reference-extract/javap/MapTreeWriter.txt:3-6 —
an IntegerWriter ``lengths`` plus key/value child TreeWriters) writes
a map column as a LENGTH stream (entries per row, RLEv2 unsigned) plus
two child columns — keys and values — each encoded by the standard
child writer for its type. This module mirrors that decomposition for
the common metadata shape ``map<string, int64>``: keys run the full
dictionary-vs-FSST-vs-direct string selector, values run RLEv2 signed;
null map rows get a PRESENT stream, null values a PRESENT stream on
the values child (ORC semantics: a null row contributes no entries).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import rle1, rle2
from .blocks import (_decode_int_column, _decode_str_column,
                     _encode_str_column, _present)

MAP_TYPE = pa.map_(pa.string(), pa.int64())


def encode_map(arr) -> dict:
    """Encode a ``map<string, int64>`` array into a stream dict:
    {length, present, n_nulls, keys: <str col dict>, values: <int col
    dict>}."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_map(arr.type):
        raise TypeError(f"expected a map array, got {arr.type}")
    present, n_nulls, vals = _present(arr)
    # a sliced MapArray exposes FULL children with window-absolute
    # offsets — slice the children to the window explicitly
    off = np.asarray(vals.offsets, dtype=np.int64)
    lens = np.diff(off)
    keys = vals.keys.slice(off[0], off[-1] - off[0])
    items = vals.items.slice(off[0], off[-1] - off[0])
    if keys.null_count:
        raise ValueError("map keys must be non-null (ORC semantics)")
    ipres, invals, ivals = _present(items)
    iv = np.asarray(ivals, dtype=np.int64)
    return {
        "length": rle2.encode_rlev2(lens, signed=False).tobytes(),
        "present": present, "n_nulls": int(n_nulls),
        "keys": _encode_str_column(keys.cast(pa.large_string())),
        "values": {"data": rle2.encode_rlev2(iv, signed=True).tobytes(),
                   "present": ipres, "n_nulls": int(invals)},
    }


def decode_map(enc: dict, n: int) -> pa.Array:
    """Inverse of :func:`encode_map`: ``n`` counts rows incl nulls."""
    n_nulls = int(enc["n_nulls"])
    lens = rle2.decode_rlev2(
        np.frombuffer(enc["length"], dtype=np.uint8), n - n_nulls,
        signed=False)
    n_entries = int(lens.sum())
    keys, kvalid = _decode_str_column(enc["keys"], n_entries)
    assert kvalid is None
    vcol = enc["values"]
    ivals, ivalid = _decode_int_column(vcol, n_entries)
    if ivalid is None:
        items = pa.array(ivals, type=pa.int64())
    else:
        full = np.zeros(n_entries, dtype=np.int64)
        full[ivalid] = ivals
        items = pa.array(full, mask=~ivalid)
    offsets = np.zeros(n - n_nulls + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    dense = pa.MapArray.from_arrays(
        pa.array(offsets, type=pa.int32()), keys.cast(pa.string()),
        items)
    if n_nulls == 0:
        return dense
    valid = rle1.decode_bool(
        np.frombuffer(enc["present"], np.uint8), n)
    idx = np.zeros(n, dtype=np.int64)
    idx[valid] = np.arange(n - n_nulls)
    return dense.take(pa.array(
        [int(i) if v else None for i, v in zip(idx, valid)],
        type=pa.int64()))
