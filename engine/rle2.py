"""ORC RLEv2 integer codec — encode, decode, and the writer heuristic
selector (SURVEY.md §2.1 I4-I7, I10, I11).

Byte layouts follow the ORC v1 specification, verified against golden
bytes produced by ORC C++ (reference-extract/PROBES.md P4/P5) and
constants recovered from orc-core 2.2.2
(reference-extract/javap/RunLengthIntegerWriterV2.txt): MIN_REPEAT=3,
MAX_SHORT_REPEAT_LENGTH=10, MAX_SCOPE=512, BASE_VALUE_LIMIT=2^56.

Sub-encodings (2-bit tag in the first header byte):

- ``00`` SHORT_REPEAT: 3-bit value-width-1, 3-bit count-3 (3..10 repeats),
  value big-endian (zigzag if signed).
- ``01`` DIRECT: 5-bit width code + 9-bit length-1; values (zigzag if
  signed) bit-packed big-endian.
- ``10`` PATCHED_BASE: 4-byte header; frame-of-reference against min
  (sign-magnitude base), literals packed at the 95th-percentile width,
  outliers' high bits in a gap+patch list.
- ``11`` DELTA: 5-bit delta width code (0 = fixed delta) + 9-bit
  length-1; base varint, first-delta signed varint, remaining |deltas|
  bit-packed.

The selector mirrors ORC's ``determineEncoding``
(javap/RunLengthIntegerWriterV2.txt:42): fixed runs of 3..10 ->
SHORT_REPEAT; longer fixed or arithmetic runs -> DELTA(fixed);
monotonic windows -> DELTA; windows whose 100p-90p zigzag widths differ
by more than 1 bit -> PATCHED_BASE (with the 2^56 base guard); else
DIRECT. ``aligned=True`` reproduces the SPEED / alignedBitpacking
strategy ORC C++ uses (PROBES.md P4: 17-bit max delta packed at 24).

The encoder is fully vectorized: one pass of numpy run/window
segmentation, then batch emission per (sub-encoding, width) group into
a single preallocated byte buffer. Only PATCHED_BASE windows (rare by
construction) are encoded in a per-window loop. The decoder is a cheap
header walk followed by batch decodes per group.
"""

from __future__ import annotations

import numpy as np

from . import bitpack as bp
from . import varint as vi
from ._util import cumsum0, gather_spans, ramp, span_positions

MIN_REPEAT = 3
MAX_SHORT_REPEAT = 10
MAX_SCOPE = 512
BASE_VALUE_LIMIT = 1 << 56

# internal chunk kinds
_SR, _DF, _DMON, _DIR, _PAT = 0, 1, 2, 3, 4

_I64 = np.int64
_U64 = np.uint64


# ---------------------------------------------------------------------------
# planning
# ---------------------------------------------------------------------------

def _split_max(starts: np.ndarray, lens: np.ndarray, cap: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """Split spans into pieces of at most ``cap`` values."""
    if len(starts) == 0:
        return starts, lens
    npieces = (lens + cap - 1) // cap
    r = ramp(npieces)
    ps = np.repeat(starts, npieces) + r * cap
    pl = np.minimum(cap, np.repeat(lens, npieces) - r * cap)
    return ps, pl


def _pairwise_reduceat(op, arr: np.ndarray, starts: np.ndarray,
                       ends: np.ndarray) -> np.ndarray:
    """Segment-reduce arr over [starts[i], ends[i]) for non-overlapping,
    ordered segments with ends[i] > starts[i]."""
    idx = np.empty(2 * len(starts), dtype=np.int64)
    idx[0::2] = starts
    idx[1::2] = ends
    if idx[-1] >= len(arr):  # reduceat indices must be < len(arr)
        idx = idx[:-1]
        return op.reduceat(arr, idx)[0::2]
    return op.reduceat(arr, idx)[0::2]


def _plan(v: np.ndarray, zz: np.ndarray, aligned: bool):
    """Segment the column into chunks. Returns dict of chunk arrays:
    kind, start, length, width (DIR), delta (DF)."""
    n = v.size
    d = np.empty(0, dtype=_I64) if n < 2 else (v[1:] - v[:-1])

    newrun = np.empty(n, dtype=bool)
    newrun[0] = True
    if n > 1:
        newrun[1:] = d != 0
    rstart = np.flatnonzero(newrun)
    rlen = np.diff(np.append(rstart, n))
    big = rlen >= MIN_REPEAT

    kinds, starts, lens = [], [], []
    widths, deltas, lits, w95s = [], [], [], []

    # --- fixed runs ---
    sr = big & (rlen <= MAX_SHORT_REPEAT)
    if sr.any():
        kinds.append(np.full(int(sr.sum()), _SR, dtype=np.int8))
        starts.append(rstart[sr])
        lens.append(rlen[sr])
        widths.append(np.zeros(int(sr.sum()), dtype=np.int64))
        deltas.append(np.zeros(int(sr.sum()), dtype=_I64))
        lits.append(np.zeros(int(sr.sum()), dtype=bool))
        w95s.append(np.zeros(int(sr.sum()), dtype=np.int64))
    lg = big & ~sr
    if lg.any():
        ps, pl = _split_max(rstart[lg], rlen[lg], MAX_SCOPE)
        kinds.append(np.full(len(ps), _DF, dtype=np.int8))
        starts.append(ps)
        lens.append(pl)
        widths.append(np.zeros(len(ps), dtype=np.int64))
        deltas.append(np.zeros(len(ps), dtype=_I64))
        lits.append(np.zeros(len(ps), dtype=bool))
        w95s.append(np.zeros(len(ps), dtype=np.int64))

    # --- literal stretches (consecutive runs shorter than MIN_REPEAT) ---
    small = ~big
    if small.any():
        gid = np.cumsum(big)[small]
        m = int(small.sum())
        first = np.ones(m, dtype=bool)
        first[1:] = gid[1:] != gid[:-1]
        gfirst = np.flatnonzero(first)
        s_starts = rstart[small][gfirst]
        s_lens = np.add.reduceat(rlen[small], gfirst)
        ws, wl = _split_max(s_starts, s_lens, MAX_SCOPE)
        k = len(ws)

        kind_w = np.full(k, _DIR, dtype=np.int8)
        delta_w = np.zeros(k, dtype=_I64)

        multi = wl >= 2
        if multi.any():
            ms, ml = ws[multi], wl[multi]
            dmin = _pairwise_reduceat(np.minimum, d, ms, ms + ml - 1)
            dmax = _pairwise_reduceat(np.maximum, d, ms, ms + ml - 1)
            vmin = _pairwise_reduceat(np.minimum, v, ms, ms + ml)
            vmax = _pairwise_reduceat(np.maximum, v, ms, ms + ml)
            safe = (vmax.astype(np.float64) - vmin.astype(np.float64)) \
                < float(2 ** 62)
            first_d = d[ms]
            fixed = safe & (dmin == dmax)
            mono = safe & ~fixed & (ml >= 3) & \
                ((dmin >= 0) | ((dmax <= 0) & (first_d < 0)))
            kind_w[np.flatnonzero(multi)[fixed]] = _DF
            kind_w[np.flatnonzero(multi)[mono]] = _DMON
            delta_w[np.flatnonzero(multi)[fixed]] = first_d[fixed]

        # DIRECT width for every literal window (also the fallback cost
        # for DELTA demotion), and DIRECT-vs-PATCHED via per-window hist
        zz_w = gather_spans(zz, ws, wl)
        codes = bp._WIDTH_TO_CODE[bp._CLOSEST[vi.bit_length_u64(zz_w)]]
        wid = np.repeat(np.arange(k), wl)
        hist = np.bincount(wid * 32 + codes, minlength=k * 32) \
            .reshape(k, 32)
        revcum = np.cumsum(hist[:, ::-1], axis=1)
        code100 = 31 - np.argmax(hist[:, ::-1] > 0, axis=1)
        allowed90 = (wl * 0.1).astype(np.int64)
        code90 = 31 - np.argmax(revcum > allowed90[:, None], axis=1)
        w100 = bp._CODE_TO_WIDTH[code100]
        w90 = bp._CODE_TO_WIDTH[code90]
        width_w = w100.copy()
        if aligned:
            width_w = bp._CLOSEST_ALIGNED[width_w]
        pat = (kind_w == _DIR) & (w100 - w90 > 1) & (wl > 1)

        # PATCHED_BASE viability, vectorized over candidate windows: build
        # a second hist over base-reduced (frame-of-reference) values; the
        # exact outlier count at the 95p width falls out of the histogram
        # because closest-fixed-bits buckets are bit-length boundaries.
        w95_w = np.zeros(k, dtype=np.int64)
        if pat.any():
            ps_, pl_ = ws[pat], wl[pat]
            npw = len(ps_)
            pvmin = _pairwise_reduceat(np.minimum, v, ps_, ps_ + pl_)
            pvmax = _pairwise_reduceat(np.maximum, v, ps_, ps_ + pl_)
            ok = (np.abs(pvmin) < BASE_VALUE_LIMIT) & \
                ((pvmax.astype(np.float64) - pvmin.astype(np.float64))
                 < float(2 ** 62))
            br = gather_spans(v, ps_, pl_) - np.repeat(pvmin, pl_)
            bcodes = bp._WIDTH_TO_CODE[
                bp._CLOSEST[vi.bit_length_u64(br.view(_U64))]]
            bwid = np.repeat(np.arange(npw), pl_)
            bhist = np.bincount(bwid * 32 + bcodes, minlength=npw * 32) \
                .reshape(npw, 32)
            brev = np.cumsum(bhist[:, ::-1], axis=1)
            allowed95 = (pl_ * 0.05).astype(np.int64)
            c95 = 31 - np.argmax(brev > allowed95[:, None], axis=1)
            c100 = 31 - np.argmax(bhist[:, ::-1] > 0, axis=1)
            # exact count of values whose base-reduced form exceeds the
            # 95p-width mask = count of hist codes above c95
            outcnt = np.where(c95 >= 31, 0, brev[np.arange(npw), 30 - c95])
            viable = ok & (c100 > c95) & (outcnt > 0) & (outcnt <= 31)
            w95 = bp._CODE_TO_WIDTH[c95]
            if aligned:
                w95 = bp._CLOSEST_ALIGNED[w95]
            pat_idx = np.flatnonzero(pat)
            kind_w[pat_idx[~viable]] = _DIR
            kind_w[pat_idx[viable]] = _PAT
            w95_w[pat_idx[viable]] = w95[viable]

        kinds.append(kind_w)
        starts.append(ws)
        lens.append(wl)
        widths.append(width_w)
        deltas.append(delta_w)
        lits.append(np.ones(k, dtype=bool))
        w95s.append(w95_w)

    kind = np.concatenate(kinds)
    start = np.concatenate(starts)
    length = np.concatenate(lens)
    width = np.concatenate(widths)
    delta = np.concatenate(deltas)
    lit = np.concatenate(lits)
    w95 = np.concatenate(w95s)
    order = np.argsort(start, kind="stable")
    return {
        "kind": kind[order], "start": start[order], "len": length[order],
        "width": width[order], "delta": delta[order], "lit": lit[order],
        "w95": w95[order],
    }


# ---------------------------------------------------------------------------
# PATCHED_BASE (per-window; windows are rare by construction)
# ---------------------------------------------------------------------------

def _prepare_patched(v: np.ndarray, ps: np.ndarray, pl_: np.ndarray,
                     w95: np.ndarray) -> tuple[np.ndarray, dict]:
    """Batch-prepare PATCHED_BASE encodings for many windows at once.

    Mirrors orc-core's preparePatchedBlob/writePatchedBaseValues
    (javap/RunLengthIntegerWriterV2.txt:37,5): frame-of-reference against
    the window min, sign-magnitude base, 95p-width literals, gap+patch
    outlier list with >255-gap zero-patch fillers, <=31 patch entries.
    Fully vectorized across windows — no per-window Python.

    Returns ``(ok_mask, state)``: windows with ok_mask False must fall
    back to DIRECT; ``state`` (filtered to ok windows) feeds
    :func:`_emit_patched`.
    """
    k = len(ps)
    vmin = _pairwise_reduceat(np.minimum, v, ps, ps + pl_)
    eo = cumsum0(pl_)
    br = (gather_spans(v, ps, pl_) - np.repeat(vmin, pl_)).view(_U64)
    mask = (_U64(1) << w95.astype(_U64)) - _U64(1)
    wid = np.repeat(np.arange(k), pl_)
    over = br > mask[wid]
    pos = np.flatnonzero(over)
    if pos.size == 0:
        # aligned-width rounding can swallow every outlier -> windows
        # must fall back to DIRECT (no patch list to write)
        return np.zeros(k, dtype=bool), {"sizes": np.zeros(k, np.int64)}
    ow = wid[pos]                      # window of each outlier
    local = pos - eo[ow]               # index within its window
    patches = br[pos] >> w95[ow].astype(_U64)
    br[pos] &= mask[ow]

    # gaps: i - prev outlier index (prev starts at 0), per window
    first = np.ones(len(pos), dtype=bool)
    first[1:] = ow[1:] != ow[:-1]
    prevloc = np.empty_like(local)
    prevloc[0] = 0
    prevloc[1:] = local[:-1]
    gap = np.where(first, local, local - prevloc)
    # >255 gaps need (255, 0) filler entries
    nfill = np.maximum(0, (gap - 1) // 255)
    rep = nfill + 1
    r = ramp(rep)
    is_last = r == np.repeat(nfill, rep)
    egap = np.where(is_last, np.repeat(gap - 255 * nfill, rep), 255) \
        .astype(_U64)
    epatch = np.where(is_last, np.repeat(patches, rep), 0).astype(_U64)
    eow = np.repeat(ow, rep)
    pl_cnt = np.bincount(eow, minlength=k)

    # per-window patch/gap widths
    po = cumsum0(pl_cnt)
    has = pl_cnt > 0
    pmax = np.zeros(k, dtype=_U64)
    gmax = np.zeros(k, dtype=_U64)
    if has.any():
        hs, he = po[:-1][has], po[1:][has]
        pmax[has] = _pairwise_reduceat(np.maximum, epatch, hs, he)
        gmax[has] = _pairwise_reduceat(np.maximum, egap, hs, he)
    pw = bp._CLOSEST[np.maximum(vi.bit_length_u64(pmax), 1)]
    pgw = np.maximum(vi.bit_length_u64(gmax), 1)
    cfb = np.zeros(k, dtype=np.int64)
    fits = pgw + pw <= 64
    cfb[fits] = bp._CLOSEST[(pgw + pw)[fits]]

    ok = has & (pl_cnt <= 31) & fits & (np.abs(vmin) < BASE_VALUE_LIMIT)

    entries = (egap << pw[eow].astype(_U64)) | epatch

    neg = vmin < 0
    mag = np.abs(vmin).view(_U64)
    bb = (vi.bit_length_u64(mag) + 1 + 7) // 8  # +1 sign bit
    sizes = 4 + bb + (pl_ * w95 + 7) // 8 + (pl_cnt * cfb + 7) // 8

    state = {
        "ps": ps, "pl": pl_, "w95": w95, "br": br, "eo": eo,
        "entries": entries, "eow": eow, "pl_cnt": pl_cnt, "po": po,
        "cfb": cfb, "pw": pw, "pgw": pgw, "neg": neg, "mag": mag,
        "bb": bb, "sizes": sizes, "ok": ok,
    }
    return ok, state


def _emit_patched(out: np.ndarray, offs: np.ndarray, st: dict,
                  sel: np.ndarray) -> None:
    """Emit prepared PATCHED_BASE windows (those in ``sel``) at ``offs``."""
    pl_, w95, bb = st["pl"][sel], st["w95"][sel], st["bb"][sel]
    cfb, pw, pgw = st["cfb"][sel], st["pw"][sel], st["pgw"][sel]
    pl_cnt = st["pl_cnt"][sel]
    neg, mag = st["neg"][sel], st["mag"][sel]
    k = len(offs)
    l1 = pl_ - 1
    out[offs] = (0x80 | (bp._WIDTH_TO_CODE[w95] << 1) | (l1 >> 8)) \
        .astype(np.uint8)
    out[offs + 1] = (l1 & 0xFF).astype(np.uint8)
    out[offs + 2] = (((bb - 1) << 5) | bp._WIDTH_TO_CODE[pw]).astype(np.uint8)
    out[offs + 3] = (((pgw - 1) << 5) | pl_cnt).astype(np.uint8)

    # base: sign-magnitude big-endian, per byte-width group
    magbytes = mag.astype(">u8").view(np.uint8).reshape(k, 8)
    for b in np.unique(bb):
        g = np.flatnonzero(bb == b)
        mb = magbytes[g, 8 - int(b):].reshape(len(g), int(b)).copy()
        mb[:, 0] |= np.where(neg[g], 0x80, 0).astype(np.uint8)
        _scatter_rect(out, offs[g] + 4, mb)

    # main payload per w95 group
    main_off = offs + 4 + bb
    sel_idx = np.flatnonzero(sel)
    for w in np.unique(w95):
        g = np.flatnonzero(w95 == w)
        vals = gather_spans(st["br"], st["eo"][:-1][sel_idx[g]], pl_[g])
        payload, nbytes = bp.packed_matrix(vals, pl_[g], int(w))
        _scatter_var(out, main_off[g], nbytes, payload)

    # patch payload per cfb group
    patch_off = main_off + (pl_ * w95 + 7) // 8
    for c in np.unique(cfb):
        g = np.flatnonzero(cfb == c)
        vals = gather_spans(st["entries"], st["po"][:-1][sel_idx[g]],
                            pl_cnt[g])
        payload, nbytes = bp.packed_matrix(vals, pl_cnt[g], int(c))
        _scatter_var(out, patch_off[g], nbytes, payload)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _scatter_rect(out, offs, mat):
    """Write rectangular byte matrix rows at the given offsets."""
    pos = offs[:, None] + np.arange(mat.shape[1])
    out[pos.reshape(-1)] = mat.reshape(-1)


def _scatter_var(out, offs, lens, data):
    """Write concatenated variable-length byte spans at offsets."""
    out[span_positions(offs, lens)] = data


def encode_rlev2(values, signed: bool = True, aligned: bool = True
                 ) -> np.ndarray:
    """Encode an integer array as an ORC RLEv2 stream (uint8 array)."""
    v = np.ascontiguousarray(values, dtype=_I64)
    n = v.size
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    zz = vi.zigzag_encode(v) if signed else v.view(_U64)

    ch = _plan(v, zz, aligned)
    kind, start, length = ch["kind"], ch["start"], ch["len"]
    width, delta, lit = ch["width"], ch["delta"], ch["lit"]
    nch = len(kind)

    sizes = np.zeros(nch, dtype=np.int64)
    d = np.empty(0, dtype=_I64) if n < 2 else (v[1:] - v[:-1])

    # -- SHORT_REPEAT sizes
    srm = kind == _SR
    sr_idx = np.flatnonzero(srm)
    if len(sr_idx):
        sr_zz = zz[start[sr_idx]]
        sr_wb = np.maximum(1, (vi.bit_length_u64(sr_zz) + 7) // 8)
        sizes[sr_idx] = 1 + sr_wb

    # -- DELTA fixed sizes (+ cost-based demotion of literal windows whose
    # DIRECT form is strictly smaller — matches ORC C++ behavior on short
    # low-width windows, PROBES.md P5 LENGTH stream)
    df_idx = np.flatnonzero(kind == _DF)
    if len(df_idx):
        df_base = v[start[df_idx]]
        df_base_enc = vi.zigzag_encode(df_base) if signed \
            else df_base.view(_U64)
        df_lb = vi.varint_lengths(df_base_enc)
        df_dzz = vi.zigzag_encode(delta[df_idx])
        df_ld = vi.varint_lengths(df_dzz)
        df_size = 2 + df_lb + df_ld
        dir_size = 2 + (length[df_idx] * width[df_idx] + 7) // 8
        demote = lit[df_idx] & (dir_size < df_size)
        kind[df_idx[demote]] = _DIR
        keep = ~demote
        df_idx = df_idx[keep]
        df_base_enc, df_lb = df_base_enc[keep], df_lb[keep]
        df_dzz, df_ld = df_dzz[keep], df_ld[keep]
        sizes[df_idx] = df_size[keep]

    # -- DELTA monotonic sizes (+ same demotion)
    dm_idx = np.flatnonzero(kind == _DMON)
    if len(dm_idx):
        dm_s, dm_l = start[dm_idx], length[dm_idx]
        dm_base = v[dm_s]
        dm_base_enc = vi.zigzag_encode(dm_base) if signed \
            else dm_base.view(_U64)
        dm_lb = vi.varint_lengths(dm_base_enc)
        dm_first = d[dm_s]
        dm_lf = vi.varint_lengths(vi.zigzag_encode(dm_first))
        # remaining |deltas|: d[s+1 : s+l-1]
        rest_lens = dm_l - 2
        dm_rest = np.abs(gather_spans(d, dm_s + 1, rest_lens)).view(_U64)
        ro = cumsum0(rest_lens)
        rest_max = _pairwise_reduceat(
            np.maximum, dm_rest, ro[:-1], np.maximum(ro[1:], ro[:-1] + 1))
        dm_w = bp._CLOSEST[np.maximum(vi.bit_length_u64(rest_max), 1)]
        if aligned:
            dm_w = bp._CLOSEST_ALIGNED[dm_w]
        dm_w = np.maximum(dm_w, 2)  # width code 0 is reserved for fixed
        dm_size = 2 + dm_lb + dm_lf + (rest_lens * dm_w + 7) // 8
        dir_size = 2 + (dm_l * width[dm_idx] + 7) // 8
        demote = dir_size < dm_size
        kind[dm_idx[demote]] = _DIR
        keep = ~demote
        if demote.any():
            dm_idx = dm_idx[keep]
            dm_s, dm_l, rest_lens = dm_s[keep], dm_l[keep], rest_lens[keep]
            dm_base_enc, dm_lb = dm_base_enc[keep], dm_lb[keep]
            dm_first, dm_lf = dm_first[keep], dm_lf[keep]
            dm_w = dm_w[keep]
            dm_rest = gather_spans(d, dm_s + 1, rest_lens).view(_I64)
            dm_rest = np.abs(dm_rest).view(_U64)
        sizes[dm_idx] = dm_size[keep]

    # -- PATCHED windows: batch-prepare; fall back to DIRECT where not
    # encodable (>31 patch entries after gap splitting, 2^56 base guard)
    pt_idx = np.flatnonzero(kind == _PAT)
    pat_state = None
    pat_ok = np.zeros(0, dtype=bool)
    if len(pt_idx):
        pat_ok, pat_state = _prepare_patched(
            v, start[pt_idx], length[pt_idx], ch["w95"][pt_idx])
        kind[pt_idx[~pat_ok]] = _DIR  # width[] still holds the DIRECT width
        sizes[pt_idx[pat_ok]] = pat_state["sizes"][pat_ok]

    # -- DIRECT sizes
    dirm = kind == _DIR
    dir_idx = np.flatnonzero(dirm)
    if len(dir_idx):
        sizes[dir_idx] = 2 + (length[dir_idx] * width[dir_idx] + 7) // 8

    offs = cumsum0(sizes)
    out = np.zeros(int(offs[-1]), dtype=np.uint8)

    # -- emit SHORT_REPEAT (batch per value-byte-width)
    if len(sr_idx):
        for w in np.unique(sr_wb):
            g = sr_idx[sr_wb == w]
            gz = zz[start[g]]
            hdr = (((int(w) - 1) << 3) | (length[g] - 3)).astype(np.uint8)
            mat = np.empty((len(g), 1 + int(w)), dtype=np.uint8)
            mat[:, 0] = hdr
            mat[:, 1:] = gz.astype(">u8").view(np.uint8) \
                .reshape(-1, 8)[:, 8 - int(w):]
            _scatter_rect(out, offs[g], mat)

    # -- emit DELTA fixed
    if len(df_idx):
        l1 = length[df_idx] - 1
        out[offs[df_idx]] = (0xC0 | (l1 >> 8)).astype(np.uint8)
        out[offs[df_idx] + 1] = (l1 & 0xFF).astype(np.uint8)
        _scatter_var(out, offs[df_idx] + 2, df_lb,
                     vi.encode_varints(df_base_enc))
        _scatter_var(out, offs[df_idx] + 2 + df_lb, df_ld,
                     vi.encode_varints(df_dzz))

    # -- emit DELTA monotonic (batch per delta width)
    if len(dm_idx):
        l1 = length[dm_idx] - 1
        code = bp._WIDTH_TO_CODE[dm_w]
        out[offs[dm_idx]] = (0xC0 | (code << 1) | (l1 >> 8)).astype(np.uint8)
        out[offs[dm_idx] + 1] = (l1 & 0xFF).astype(np.uint8)
        _scatter_var(out, offs[dm_idx] + 2, dm_lb,
                     vi.encode_varints(dm_base_enc))
        _scatter_var(out, offs[dm_idx] + 2 + dm_lb, dm_lf,
                     vi.encode_varints(vi.zigzag_encode(dm_first)))
        pay_off = offs[dm_idx] + 2 + dm_lb + dm_lf
        rest_off = cumsum0(rest_lens)
        for w in np.unique(dm_w):
            sel = dm_w == w
            vals = gather_spans(dm_rest, rest_off[:-1][sel], rest_lens[sel])
            payload, nbytes = bp.packed_matrix(vals, rest_lens[sel], int(w))
            _scatter_var(out, pay_off[sel], nbytes, payload)

    # -- emit DIRECT (batch per width)
    if len(dir_idx):
        l1 = length[dir_idx] - 1
        dws = width[dir_idx]
        code = bp._WIDTH_TO_CODE[dws]
        out[offs[dir_idx]] = (0x40 | (code << 1) | (l1 >> 8)).astype(np.uint8)
        out[offs[dir_idx] + 1] = (l1 & 0xFF).astype(np.uint8)
        for w in np.unique(dws):
            sel = dws == w
            g = dir_idx[sel]
            vals = gather_spans(zz, start[g], length[g])
            payload, nbytes = bp.packed_matrix(vals, length[g], int(w))
            _scatter_var(out, offs[g] + 2, nbytes, payload)

    # -- emit PATCHED
    if pat_state is not None and pat_ok.any():
        _emit_patched(out, offs[pt_idx[pat_ok]], pat_state, pat_ok)

    return out


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7


def _unzigzag_int(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def decode_rlev2(buf, n: int, signed: bool = True) -> np.ndarray:
    """Decode an ORC RLEv2 stream into ``n`` int64 values.

    Decodes any spec-conformant stream (cross-implementation: streams
    sliced from ORC C++ / orc-core files decode too, SURVEY.md §5.2.3).
    """
    if n == 0:
        return np.zeros(0, dtype=_I64)
    data = bytes(buf)
    # ---- pass 1: header walk -------------------------------------------
    # per-kind chunk tables: (chunk_index, out_offset, count, params...)
    sr_t, dir_t, df_t, dm_t, pat_t = [], [], [], [], []
    pos = 0
    produced = 0
    ci = 0
    out_offs = []
    counts = []
    while produced < n:
        h = data[pos]
        tag = h >> 6
        if tag == 0:  # SHORT_REPEAT
            w = ((h >> 3) & 7) + 1
            cnt = (h & 7) + 3
            val = int.from_bytes(data[pos + 1: pos + 1 + w], "big")
            sr_t.append((ci, val, cnt))
            pos += 1 + w
        elif tag == 1:  # DIRECT
            w = bp.decode_bit_width((h >> 1) & 31)
            cnt = (((h & 1) << 8) | data[pos + 1]) + 1
            nb = (cnt * w + 7) // 8
            dir_t.append((ci, pos + 2, cnt, w))
            pos += 2 + nb
        elif tag == 3:  # DELTA
            code = (h >> 1) & 31
            dw = 0 if code == 0 else bp.decode_bit_width(code)
            cnt = (((h & 1) << 8) | data[pos + 1]) + 1
            p = pos + 2
            base_u, p = _read_varint(data, p)
            base = _unzigzag_int(base_u) if signed \
                else (base_u - (1 << 64) if base_u >= (1 << 63) else base_u)
            # ORC always writes the delta varint (signed), even for cnt==1
            first_u, p = _read_varint(data, p)
            first = _unzigzag_int(first_u)
            if dw > 0:
                nb = ((cnt - 2) * dw + 7) // 8
                dm_t.append((ci, p, cnt, dw, base, first))
                p += nb
            else:
                df_t.append((ci, base, first, cnt))
            pos = p
        else:  # PATCHED_BASE
            w = bp.decode_bit_width((h >> 1) & 31)
            cnt = (((h & 1) << 8) | data[pos + 1]) + 1
            h3 = data[pos + 2]
            h4 = data[pos + 3]
            bb = ((h3 >> 5) & 7) + 1
            pw = bp.decode_bit_width(h3 & 31)
            pgw = ((h4 >> 5) & 7) + 1
            pl = h4 & 31
            p = pos + 4
            raw = int.from_bytes(data[p: p + bb], "big")
            sign = raw >> (bb * 8 - 1)
            mag = raw & ((1 << (bb * 8 - 1)) - 1)
            base = -mag if sign else mag
            p += bb
            main_nb = (cnt * w + 7) // 8
            cfb = bp.closest_fixed_bits(pgw + pw)
            patch_nb = (pl * cfb + 7) // 8
            pat_t.append((ci, p, cnt, w, base, pw, pgw, pl, p + main_nb))
            pos = p + main_nb + patch_nb
        out_offs.append(produced)
        counts.append(cnt)
        produced += cnt
        ci += 1
    if produced != n:
        raise ValueError(f"RLEv2 stream produced {produced} values, "
                         f"expected {n}")
    out_offs = np.array(out_offs, dtype=np.int64)
    counts = np.array(counts, dtype=np.int64)
    out = np.empty(n, dtype=_I64)
    bufarr = np.frombuffer(data, dtype=np.uint8)

    # ---- pass 2: batch decode per kind ---------------------------------
    if sr_t:
        ci_a, val_a, cnt_a = (np.array(x, dtype=np.int64)
                              for x in zip(*sr_t))
        vals = vi.zigzag_decode(val_a.view(_U64)) if signed \
            else val_a.view(_U64).view(_I64)
        out[span_positions(out_offs[ci_a], cnt_a)] = np.repeat(vals, cnt_a)

    if df_t:
        ci_a, base_a, dlt_a, cnt_a = (np.array(x, dtype=np.int64)
                                      for x in zip(*df_t))
        r = ramp(cnt_a)
        out[span_positions(out_offs[ci_a], cnt_a)] = \
            np.repeat(base_a, cnt_a) + np.repeat(dlt_a, cnt_a) * r

    if dir_t:
        ci_a, poff_a, cnt_a, w_a = (np.array(x, dtype=np.int64)
                                    for x in zip(*dir_t))
        for w in np.unique(w_a):
            sel = w_a == w
            nb = (cnt_a[sel] * int(w) + 7) // 8
            payload = gather_spans(bufarr, poff_a[sel], nb)
            vals = bp.unpack_matrix(payload, cnt_a[sel], int(w))
            dec = vi.zigzag_decode(vals) if signed else vals.view(_I64)
            out[span_positions(out_offs[ci_a[sel]], cnt_a[sel])] = dec

    if dm_t:
        ci_a, poff_a, cnt_a, w_a, base_a, first_a = \
            (np.array(x, dtype=np.int64) for x in zip(*dm_t))
        total = int(cnt_a.sum())
        darr = np.zeros(total, dtype=_I64)
        starts = cumsum0(cnt_a)[:-1]
        sgn = np.where(first_a < 0, -1, 1).astype(_I64)
        darr[starts + 1] = first_a
        for w in np.unique(w_a):
            sel = w_a == w
            nb = ((cnt_a[sel] - 2) * int(w) + 7) // 8
            payload = gather_spans(bufarr, poff_a[sel], nb)
            rest = bp.unpack_matrix(payload, cnt_a[sel] - 2, int(w)) \
                .view(_I64)
            rest = rest * np.repeat(sgn[sel], cnt_a[sel] - 2)
            darr[span_positions(starts[sel] + 2, cnt_a[sel] - 2)] = rest
        c = np.cumsum(darr)
        corr = np.concatenate([[0], c])[starts]
        vals = np.repeat(base_a, cnt_a) + (c - np.repeat(corr, cnt_a))
        out[span_positions(out_offs[ci_a], cnt_a)] = vals

    for (ci_i, poff, cnt, w, base, pw, pgw, pl, patch_off) in pat_t:
        main = bp.unpack_bits(bufarr[poff: poff + (cnt * w + 7) // 8],
                              cnt, w)
        if pl:
            cfb = bp.closest_fixed_bits(pgw + pw)
            entries = bp.unpack_bits(
                bufarr[patch_off: patch_off + (pl * cfb + 7) // 8], pl, cfb)
            gaps = (entries >> _U64(pw)).astype(np.int64)
            patches = entries & _U64((1 << pw) - 1)
            idx = np.cumsum(gaps)
            # zero-patch entries are gap fillers; real patches OR high bits
            main[idx] |= patches << _U64(w)
        vals = main.view(_I64) + base
        off = out_offs[ci_i]
        out[off: off + cnt] = vals

    return out
