"""T8 union: TAG byte stream + per-branch child streams (orc-core
UnionTreeWriter; Type.Kind UNION, orc_proto_descriptor.txt:656).

ORC's DIRECT union encoding writes one byte-RLE DATA stream of branch
tags (0..127) and then encodes each branch's values as an ordinary
child column holding ONLY the rows whose tag selects that branch;
readers scatter branch values back by tag. The splitter/scatter
helpers here are numpy-vectorized; branch payloads are encoded by the
caller with whichever engine codec fits the branch type.
"""

from __future__ import annotations

import numpy as np

from . import rle1


def encode_tags(tags) -> np.ndarray:
    """Branch tag stream (byte RLE, B1) — the union's DATA stream."""
    t = np.ascontiguousarray(tags, dtype=np.uint8)
    if t.size and t.max() > 127:
        raise ValueError("ORC union supports at most 128 branches")
    return rle1.encode_byte_rle(t)


def decode_tags(buf, n: int) -> np.ndarray:
    return rle1.decode_byte_rle(buf, n)


def split_by_tag(tags: np.ndarray, values: np.ndarray,
                 n_branches: int) -> list[np.ndarray]:
    """Rows -> per-branch value arrays (branch k keeps rows tag==k),
    preserving row order inside each branch, as ORC child writers see
    them."""
    t = np.asarray(tags)
    return [np.asarray(values)[t == k] for k in range(n_branches)]


def scatter_by_tag(tags: np.ndarray, branches: list[np.ndarray],
                   dtype=None) -> np.ndarray:
    """Inverse of split_by_tag: per-branch arrays -> row-ordered values."""
    t = np.asarray(tags)
    n = t.size
    if dtype is None:
        dtype = branches[0].dtype if branches else np.int64
    out = np.zeros(n, dtype=dtype)
    for k, bv in enumerate(branches):
        out[t == k] = bv
    return out
