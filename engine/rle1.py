"""ORC RLEv1 integer codec, byte-RLE, and boolean bit-field codec
(SURVEY.md §2.1 I3, §2.2 B1/B2).

Byte layouts follow the ORC v1 specification; constants recovered from
orc-core 2.2.2 (reference-extract/javap/RunLengthIntegerWriter.txt:3-7,
18-19 and javap/RunLengthByteWriter.txt:3-5):

- integer RLEv1: control byte 0..127 => (control+3) repeats (3..130,
  MIN_REPEAT_SIZE=3 / MAX_REPEAT_SIZE=130) of a base varint followed by
  a per-step signed delta byte in [-128, 127] (MIN_DELTA/MAX_DELTA);
  control -1..-128 (two's complement) => 1..128 literal varints
  (MAX_LITERAL_SIZE=128). Layout of a run is
  ``[control, delta_byte, base_varint]``.
- byte RLE: control 0..127 => (control+3) repeats of one byte;
  control -1..-128 => 1..128 literal bytes.
- boolean (PRESENT stream): bits packed MSB-first into bytes
  (javap/BitFieldWriter.txt:9-10), then byte-RLE.

Encoding is vectorized: one numpy segmentation pass over the value
deltas, then batch emission per chunk kind. The value<->segment tiling
is deterministic (each constant-delta segment claims its trailing
values; the shared boundary value belongs to the earlier segment),
which is spec-conformant though not always byte-identical to the Java
writer's greedy buffer — decode round-trips both.
"""

from __future__ import annotations

import numpy as np

from . import varint as vi
from ._util import cumsum0, gather_spans, ramp, span_positions

MIN_REPEAT = 3
MAX_REPEAT = 130
MAX_LITERAL = 128
MIN_DELTA = -128
MAX_DELTA = 127

_I64 = np.int64
_U64 = np.uint64


def _split_max(starts: np.ndarray, lens: np.ndarray, cap: int
               ) -> tuple[np.ndarray, np.ndarray]:
    if len(starts) == 0:
        return starts, lens
    npieces = (lens + cap - 1) // cap
    r = ramp(npieces)
    ps = np.repeat(starts, npieces) + r * cap
    pl = np.minimum(cap, np.repeat(lens, npieces) - r * cap)
    return ps, pl


def _segment(is_same_seg: np.ndarray, n: int
             ) -> tuple[np.ndarray, np.ndarray]:
    """Tile n values into segments. ``is_same_seg[i]`` says positions
    i and i+1 of the *delta* array belong to one segment. Segment i
    claims values (seg_start_d + 1 .. seg_end_d + 1), plus value 0 for
    the first segment. Returns (value_starts, value_counts)."""
    if n == 1:
        return np.zeros(1, dtype=_I64), np.ones(1, dtype=_I64)
    nd = n - 1
    new = np.empty(nd, dtype=bool)
    new[0] = True
    new[1:] = ~is_same_seg
    dstart = np.flatnonzero(new)
    dlen = np.diff(np.append(dstart, nd))
    vstart = dstart + 1
    vcount = dlen.copy()
    vstart[0] = 0
    vcount[0] += 1
    return vstart, vcount


def encode_rlev1(values, signed: bool = True) -> np.ndarray:
    """Encode an integer array as an ORC RLEv1 stream (uint8 array)."""
    v = np.ascontiguousarray(values, dtype=_I64)
    n = v.size
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    d = np.empty(0, dtype=_I64) if n < 2 else (v[1:] - v[:-1])
    if n == 1:
        same = np.zeros(0, dtype=bool)
    else:
        same = d[1:] == d[:-1]
    vstart, vcount = _segment(same, n)
    seg_delta = np.zeros(len(vstart), dtype=_I64)
    if n > 1:
        # delta of segment covering values [s, s+c): d[s] when c >= 2
        has_d = vcount >= 2
        seg_delta[has_d] = d[vstart[has_d]]

    runm = (vcount >= MIN_REPEAT) & (seg_delta >= MIN_DELTA) & \
        (seg_delta <= MAX_DELTA)

    rs, rl = _split_max(vstart[runm], vcount[runm], MAX_REPEAT)
    rdelta = np.repeat(seg_delta[runm],
                       (vcount[runm] + MAX_REPEAT - 1) // MAX_REPEAT)
    # split pieces shorter than MIN_REPEAT fall back to literals
    short = rl < MIN_REPEAT
    lit_extra_s, lit_extra_l = rs[short], rl[short]
    rs, rl, rdelta = rs[~short], rl[~short], rdelta[~short]

    # literal stretches: merge consecutive non-run segments
    lits = ~runm
    ls_parts, ll_parts = [], []
    if lits.any():
        gid = np.cumsum(runm)[lits]
        first = np.ones(int(lits.sum()), dtype=bool)
        first[1:] = gid[1:] != gid[:-1]
        gf = np.flatnonzero(first)
        ls_parts.append(vstart[lits][gf])
        ll_parts.append(np.add.reduceat(vcount[lits], gf))
    if len(lit_extra_s):
        ls_parts.append(lit_extra_s)
        ll_parts.append(lit_extra_l)
    if ls_parts:
        ls = np.concatenate(ls_parts)
        ll = np.concatenate(ll_parts)
        order = np.argsort(ls, kind="stable")
        ls, ll = ls[order], ll[order]
        ls, ll = _split_max(ls, ll, MAX_LITERAL)
    else:
        ls = np.zeros(0, dtype=_I64)
        ll = np.zeros(0, dtype=_I64)

    # sizes
    enc = vi.zigzag_encode(v) if signed else v.view(_U64)
    vlens = vi.varint_lengths(enc)
    run_base_len = vlens[rs] if len(rs) else np.zeros(0, dtype=_I64)
    run_sizes = 2 + run_base_len
    vcum = cumsum0(vlens)
    lit_sizes = 1 + (vcum[ls + ll] - vcum[ls]) if len(ls) \
        else np.zeros(0, dtype=_I64)

    starts_all = np.concatenate([rs, ls])
    order = np.argsort(starts_all, kind="stable")
    sizes_all = np.concatenate([run_sizes, lit_sizes])[order]
    offs_all = cumsum0(sizes_all)
    out = np.zeros(int(offs_all[-1]), dtype=np.uint8)
    is_run = np.concatenate(
        [np.ones(len(rs), dtype=bool), np.zeros(len(ls), dtype=bool)])[order]
    offs_run = offs_all[:-1][is_run]
    offs_lit = offs_all[:-1][~is_run]

    if len(rs):
        out[offs_run] = (rl - MIN_REPEAT).astype(np.uint8)
        out[offs_run + 1] = rdelta.astype(np.int8).view(np.uint8)
        base_bytes = vi.encode_varints(enc[rs])
        out[span_positions(offs_run + 2, run_base_len)] = base_bytes
    if len(ls):
        out[offs_lit] = (-ll).astype(np.int8).view(np.uint8)
        all_bytes = vi.encode_varints(enc)
        lit_bytes = gather_spans(all_bytes, vcum[ls], vcum[ls + ll] - vcum[ls])
        out[span_positions(offs_lit + 1, vcum[ls + ll] - vcum[ls])] = lit_bytes
    return out


def decode_rlev1(buf, n: int, signed: bool = True,
                 exact: bool = True) -> np.ndarray:
    """Decode an ORC RLEv1 stream into ``n`` int64 values.
    ``exact=False`` permits the final run to overshoot ``n`` (mid-
    stream row-group seeks land inside runs); the tail is truncated."""
    if n == 0:
        return np.zeros(0, dtype=_I64)
    want = n
    raw = bytes(buf)
    data = np.frombuffer(raw, dtype=np.uint8)
    pos = 0
    produced = 0
    run_off, run_base, run_delta, run_cnt = [], [], [], []
    lit_off, lit_pos, lit_cnt = [], [], []
    while produced < n:
        h = raw[pos]
        if h < 128:  # run
            cnt = h + MIN_REPEAT
            delta = raw[pos + 1]
            if delta >= 128:
                delta -= 256
            base_u, consumed = vi.decode_varints(data[pos + 2:], 1)
            run_off.append(produced)
            run_base.append(int(base_u[0]))
            run_delta.append(delta)
            run_cnt.append(cnt)
            pos += 2 + consumed
        else:  # literals
            cnt = 256 - h
            _, consumed = vi.decode_varints(data[pos + 1:], cnt)
            lit_off.append(produced)
            lit_pos.append(pos + 1)
            lit_cnt.append(cnt)
            pos += 1 + consumed
        produced += cnt
    if produced != n:
        if exact:
            raise ValueError(f"RLEv1 produced {produced}, expected {n}")
        n = produced
    out = np.empty(n, dtype=_I64)
    if run_off:
        ro = np.array(run_off, dtype=_I64)
        rb = np.array(run_base, dtype=_U64)
        rd = np.array(run_delta, dtype=_I64)
        rc = np.array(run_cnt, dtype=_I64)
        base = vi.zigzag_decode(rb) if signed else rb.view(_I64)
        vals = np.repeat(base, rc) + np.repeat(rd, rc) * ramp(rc)
        out[span_positions(ro, rc)] = vals
    if lit_off:
        lo = np.array(lit_off, dtype=_I64)
        lp = np.array(lit_pos, dtype=_I64)
        lc = np.array(lit_cnt, dtype=_I64)
        # varint payloads are self-delimiting; concatenate the byte spans
        # (ends found via a per-chunk decode) — decode once, batched
        total = int(lc.sum())
        ends = np.flatnonzero((data & 0x80) == 0)
        # for each literal chunk starting at lp[i] with lc[i] varints, the
        # payload is bytes [lp[i], end_of_lc[i]-th terminator]
        idx0 = np.searchsorted(ends, lp)
        payload_ends = ends[idx0 + lc - 1] + 1
        payload = gather_spans(data, lp, payload_ends - lp)
        u, _ = vi.decode_varints(payload, total)
        vals = vi.zigzag_decode(u) if signed else u.view(_I64)
        out[span_positions(lo, lc)] = vals
    return out if n == want else out[:want]


def encode_byte_rle(values, return_runs: bool = False):
    """Encode a uint8 array as an ORC byte-RLE stream.

    With ``return_runs`` returns ``(out, run_starts, run_offs)`` where
    ``run_starts[i]`` is the input value index where emitted run/
    literal-group i begins and ``run_offs[i]`` its byte offset in the
    stream — the seek-position surface: the ORC position of value k is
    ``(run_offs[j], k - run_starts[j])`` for the covering run j
    (RunLengthByteReader semantics: [stream offset, values consumed])."""
    b = np.ascontiguousarray(values, dtype=np.uint8)
    n = b.size
    if n == 0:
        z = np.zeros(0, dtype=np.uint8)
        return (z, np.zeros(0, dtype=_I64), np.zeros(0, dtype=_I64)) \
            if return_runs else z
    # runs of equal bytes: boundaries where the byte changes
    newrun = np.empty(n, dtype=bool)
    newrun[0] = True
    if n > 1:
        newrun[1:] = b[1:] != b[:-1]
    rstart = np.flatnonzero(newrun)
    rlen = np.diff(np.append(rstart, n))
    big = rlen >= MIN_REPEAT

    rs, rl = _split_max(rstart[big], rlen[big], MAX_REPEAT)
    short = rl < MIN_REPEAT
    extra_s, extra_l = rs[short], rl[short]
    rs, rl = rs[~short], rl[~short]

    small = ~big
    ls_parts, ll_parts = [], []
    if small.any():
        gid = np.cumsum(big)[small]
        first = np.ones(int(small.sum()), dtype=bool)
        first[1:] = gid[1:] != gid[:-1]
        gf = np.flatnonzero(first)
        ls_parts.append(rstart[small][gf])
        ll_parts.append(np.add.reduceat(rlen[small], gf))
    if len(extra_s):
        ls_parts.append(extra_s)
        ll_parts.append(extra_l)
    if ls_parts:
        ls = np.concatenate(ls_parts)
        ll = np.concatenate(ll_parts)
        order = np.argsort(ls, kind="stable")
        ls, ll = _split_max(ls[order], ll[order], MAX_LITERAL)
    else:
        ls = np.zeros(0, dtype=_I64)
        ll = np.zeros(0, dtype=_I64)

    starts_all = np.concatenate([rs, ls])
    order = np.argsort(starts_all, kind="stable")
    sizes_all = np.concatenate([np.full(len(rs), 2, dtype=_I64), 1 + ll])[order]
    offs_all = cumsum0(sizes_all)
    out = np.zeros(int(offs_all[-1]), dtype=np.uint8)
    is_run = np.concatenate(
        [np.ones(len(rs), dtype=bool), np.zeros(len(ls), dtype=bool)])[order]
    offs_run = offs_all[:-1][is_run]
    offs_lit = offs_all[:-1][~is_run]
    if len(rs):
        out[offs_run] = (rl - MIN_REPEAT).astype(np.uint8)
        out[offs_run + 1] = b[rs]
    if len(ls):
        out[offs_lit] = (-ll).astype(np.int8).view(np.uint8)
        out[span_positions(offs_lit + 1, ll)] = gather_spans(b, ls, ll)
    if return_runs:
        return out, starts_all[order], offs_all[:-1]
    return out


def decode_byte_rle(buf, n: int, exact: bool = True) -> np.ndarray:
    """Decode an ORC byte-RLE stream into ``n`` uint8 values.
    ``exact=False`` truncates a final run that overshoots ``n``."""
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    want = n
    raw = bytes(buf)
    data = np.frombuffer(raw, dtype=np.uint8)
    pos = 0
    produced = 0
    run_off, run_val, run_cnt = [], [], []
    lit_off, lit_pos, lit_cnt = [], [], []
    while produced < n:
        h = raw[pos]
        if h < 128:
            cnt = h + MIN_REPEAT
            run_off.append(produced)
            run_val.append(raw[pos + 1])
            run_cnt.append(cnt)
            pos += 2
        else:
            cnt = 256 - h
            lit_off.append(produced)
            lit_pos.append(pos + 1)
            lit_cnt.append(cnt)
            pos += 1 + cnt
        produced += cnt
    if produced != n:
        if exact:
            raise ValueError(
                f"byte-RLE produced {produced}, expected {n}")
        n = produced
    out = np.empty(n, dtype=np.uint8)
    if run_off:
        ro = np.array(run_off, dtype=_I64)
        rc = np.array(run_cnt, dtype=_I64)
        out[span_positions(ro, rc)] = \
            np.repeat(np.array(run_val, dtype=np.uint8), rc)
    if lit_off:
        lo = np.array(lit_off, dtype=_I64)
        lp = np.array(lit_pos, dtype=_I64)
        lc = np.array(lit_cnt, dtype=_I64)
        out[span_positions(lo, lc)] = gather_spans(data, lp, lc)
    return out if n == want else out[:want]


def encode_bool(mask, return_runs: bool = False):
    """Encode a boolean array as an ORC bit-field stream: bits MSB-first
    per byte (BitFieldWriter), then byte-RLE. ``return_runs`` as in
    :func:`encode_byte_rle` (run starts are in PACKED-BYTE coordinates;
    the bit position of value k is ``k % 8`` within byte ``k // 8``)."""
    m = np.ascontiguousarray(mask, dtype=bool)
    if m.size == 0:
        z = np.zeros(0, dtype=np.uint8)
        return (z, np.zeros(0, dtype=_I64), np.zeros(0, dtype=_I64)) \
            if return_runs else z
    return encode_byte_rle(np.packbits(m), return_runs=return_runs)


def decode_bool(buf, n: int, exact: bool = True) -> np.ndarray:
    """Decode an ORC bit-field stream into ``n`` booleans.
    ``exact=False`` as in :func:`decode_byte_rle` (seek decodes)."""
    if n == 0:
        return np.zeros(0, dtype=bool)
    nbytes = (n + 7) // 8
    packed = decode_byte_rle(buf, nbytes, exact=exact)
    return np.unpackbits(packed)[:n].astype(bool)
