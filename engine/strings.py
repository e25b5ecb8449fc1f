"""String column codecs: DIRECT_V2 and sorted-dictionary DICTIONARY_V2
with the ORC dictionary-vs-direct selector (SURVEY.md §2.3 S1-S3).

Semantics match ORC (orc_proto_descriptor.txt:491-527, verified live
against ORC C++ stream bytes in reference-extract/PROBES.md P5):

- DIRECT_V2: DATA = concatenated UTF-8 bytes, LENGTH = RLEv2 unsigned
  per-row byte lengths.
- DICTIONARY_V2: dictionary keys sorted bytewise; DATA = RLEv2 unsigned
  ids remapped to sorted order, DICTIONARY_DATA = concatenated sorted
  keys, LENGTH = RLEv2 unsigned key lengths; ``dict_size`` recorded in
  the column encoding (javap/StringBaseTreeWriter.txt:21 flushDictionary).
- selector: dictionary unless distinct/non-null exceeds
  ``orc.dictionary.key.threshold`` = 0.8 (orcconf.txt:23,
  javap/StringBaseTreeWriter.txt:11 dictionaryKeySizeThreshold).

All kernels operate on Arrow arrays (zero-copy offsets/bytes views) —
no per-row Python. Nulls are the block layer's concern: inputs here
must be null-free (the block layer strips nulls via the PRESENT mask
exactly like ORC's TreeWriterBase, javap/TreeWriterBase.txt:4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import rle2
from ._util import cumsum0

DICT_KEY_THRESHOLD = 0.8  # orc.dictionary.key.threshold default


def arrow_bytes_lengths(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(utf8 bytes, per-row byte lengths) views of a string array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    a = arr.cast(pa.large_binary())
    offs = np.frombuffer(a.buffers()[1], dtype=np.int64)[
        a.offset: a.offset + len(a) + 1]
    data = np.frombuffer(a.buffers()[2] or b"", dtype=np.uint8)[
        offs[0]: offs[-1]]
    return data, np.diff(offs)


def strings_from_bytes(data: np.ndarray, lengths: np.ndarray) -> pa.Array:
    """Rebuild a large_utf8 array from concatenated bytes + lengths."""
    offs = cumsum0(lengths)
    return pa.Array.from_buffers(
        pa.large_utf8(), len(lengths),
        [None, pa.py_buffer(offs), pa.py_buffer(np.ascontiguousarray(data))])


def sorted_dictionary(arr: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(ids, sorted_keys): dictionary-encode with bytewise-sorted keys,
    ORC's sorted-dictionary semantics (PROBES.md P5: 'applebananawalnut')."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = arr.dictionary_encode()
    keys = d.dictionary
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = pc.sort_indices(keys).to_numpy().astype(np.int64)
    remap = np.empty(len(keys), dtype=np.int64)
    remap[order] = np.arange(len(keys), dtype=np.int64)
    return remap[idx], keys.take(pa.array(order))


def encode_strings(arr: pa.Array, dict_threshold: float = DICT_KEY_THRESHOLD,
                   aligned: bool = True) -> dict:
    """Encode a null-free string array; auto-selects dictionary vs direct.

    Returns streams as uint8 arrays: ``kind`` ('DICTIONARY_V2' or
    'DIRECT_V2'), ``data``, ``length``, ``dict_data`` (dict only),
    ``dict_size``, ``n``.
    """
    n = len(arr)
    if n == 0:
        z = np.zeros(0, dtype=np.uint8)
        return {"kind": "DIRECT_V2", "data": z, "length": z,
                "dict_data": z, "dict_size": 0, "n": 0}
    ids, keys = sorted_dictionary(arr)
    if len(keys) / n > dict_threshold:
        data, lengths = arrow_bytes_lengths(arr)
        return {"kind": "DIRECT_V2", "data": data,
                "length": rle2.encode_rlev2(lengths, signed=False,
                                            aligned=aligned),
                "dict_data": np.zeros(0, dtype=np.uint8),
                "dict_size": 0, "n": n}
    kdata, klens = arrow_bytes_lengths(keys)
    return {"kind": "DICTIONARY_V2",
            "data": rle2.encode_rlev2(ids, signed=False, aligned=aligned),
            "length": rle2.encode_rlev2(klens, signed=False,
                                        aligned=aligned),
            "dict_data": kdata, "dict_size": len(keys), "n": n}


def decode_strings(enc: dict, n: int | None = None) -> pa.Array:
    """Inverse of :func:`encode_strings` -> large_utf8 array."""
    if n is None:
        n = enc["n"]
    if n == 0:
        return pa.array([], type=pa.large_utf8())
    if enc["kind"] == "DIRECT_V2":
        lengths = rle2.decode_rlev2(enc["length"], n, signed=False)
        return strings_from_bytes(np.asarray(enc["data"], dtype=np.uint8),
                                  lengths)
    dict_size = int(enc["dict_size"])
    klens = rle2.decode_rlev2(enc["length"], dict_size, signed=False)
    keys = strings_from_bytes(np.asarray(enc["dict_data"], dtype=np.uint8),
                              klens)
    ids = rle2.decode_rlev2(enc["data"], n, signed=False)
    return keys.take(pa.array(ids))
