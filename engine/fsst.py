"""FSST string compression (SURVEY.md §2.3 S4; PAPERS.md: "FSST: Fast
Random Access String Compression", VLDB 2020).

Not part of ORC — mandated by BASELINE.json:6 for the ``doc_id`` /
``source`` string columns. Semantics per the paper:

- static symbol table of at most 255 symbols, each 1..8 bytes;
  code 255 = escape, followed by one literal byte;
- encode = greedy longest-match left to right;
- table built bottom-up over a few iterations on a sample: each
  iteration re-encodes the sample with the current table, counts
  symbol and adjacent-pair frequencies, and keeps the top symbols by
  gain = freq x length;
- decode = per-code table gather; random access preserved (each
  string's code stream decodes independently).

All kernels are numpy-vectorized across an entire column at once:
symbols of length L are matched by uint64 L-gram equality (exact — an
8-byte gram fits a uint64, no hashing), and the sequential greedy
parse runs as a frontier sweep whose iteration count is the *longest
string's* code count, not the row count, so a million short doc_ids
parse in ~tens of numpy passes.
"""

from __future__ import annotations

import numpy as np

from ._util import cumsum0, span_positions

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
_U64 = np.uint64

_EMPTY_U8 = np.zeros(0, dtype=np.uint8)


def _grams(data: np.ndarray, L: int) -> np.ndarray:
    """uint64 value of the big-endian L-gram starting at each position
    0..len(data)-L (empty if data shorter than L)."""
    m = data.size
    if m < L:
        return np.zeros(0, dtype=_U64)
    g = np.zeros(m - L + 1, dtype=_U64)
    for k in range(L):
        g |= data[k: m - L + 1 + k].astype(_U64) << _U64(8 * (L - 1 - k))
    return g


def _sym_gram(sym: bytes) -> int:
    return int.from_bytes(sym, "big")


_HASH_BITS = 16
_HASH_PRIME = np.uint64(2971215073)  # FSST paper's multiplicative hash


class SymbolTable:
    """An FSST symbol table: ``symbols[code] = bytes`` for codes
    0..len-1; code 255 is the escape.

    Encode-side lookup mirrors the reference FSST design (PAPERS.md):
    a 65536-entry ``shortCodes`` table directly indexed by the next two
    bytes resolves 1- and 2-byte symbols in one gather, and a
    single-probe hash table keyed on the first three bytes resolves
    3..8-byte symbols (on a bucket collision the earlier = higher-gain
    symbol wins, exactly like the reference's lossy insert). Symbols
    are expected in descending-gain order.
    """

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.symbols = symbols
        # decode-side: concatenated symbol bytes + offsets + lengths
        concat = b"".join(symbols)
        self._sym_bytes = np.frombuffer(concat, dtype=np.uint8)
        self._sym_lens = np.array([len(s) for s in symbols] + [1],
                                  dtype=np.int64)  # [ESCAPE]=1 placeholder
        self._sym_offs = cumsum0(self._sym_lens[:-1])
        # --- encode-side lookup structures ---
        # 1-byte direct table
        self._code1 = np.full(256, ESCAPE, dtype=np.int64)
        for code, s in enumerate(symbols):
            if len(s) == 1 and self._code1[s[0]] == ESCAPE:
                self._code1[s[0]] = code
        # shortCodes: 2-gram -> (code, len) covering 2-byte symbols with
        # 1-byte fallback on the high byte
        self._short_code = np.repeat(self._code1, 256)
        self._short_len = np.ones(65536, dtype=np.int64)
        for code, s in enumerate(symbols):
            if len(s) == 2:
                idx = (s[0] << 8) | s[1]
                if self._short_len[idx] != 2:
                    self._short_code[idx] = code
                    self._short_len[idx] = 2
        # hash table for 3..8-byte symbols, keyed on the first 3 bytes
        size = 1 << _HASH_BITS
        self._ht_gram = np.zeros(size, dtype=_U64)
        self._ht_code = np.full(size, ESCAPE, dtype=np.int64)
        self._ht_len = np.zeros(size, dtype=np.int64)
        for code, s in enumerate(symbols):
            if len(s) >= 3:
                g3 = _U64(_sym_gram(s[:3]))
                h = int((g3 * _HASH_PRIME) >> _U64(64 - _HASH_BITS))
                if self._ht_len[h] == 0:
                    # full gram left-aligned in 8 bytes for prefix compare
                    self._ht_gram[h] = _U64(
                        _sym_gram(s) << (8 * (8 - len(s))))
                    self._ht_code[h] = code
                    self._ht_len[h] = len(s)

    def serialize(self) -> np.ndarray:
        """[n_symbols u8][lens u8 x n][concat bytes] — stored per block
        in the footer-style metadata (BASELINE.json:6 'symbol tables')."""
        n = len(self.symbols)
        head = np.array([n], dtype=np.uint8)
        lens = self._sym_lens[:-1].astype(np.uint8)
        return np.concatenate([head, lens, self._sym_bytes])

    @classmethod
    def deserialize(cls, buf) -> "SymbolTable":
        b = np.ascontiguousarray(buf, dtype=np.uint8)
        n = int(b[0])
        lens = b[1: 1 + n].astype(np.int64)
        offs = cumsum0(lens) + (1 + n)
        raw = b.tobytes()
        return cls([raw[offs[i]: offs[i + 1]] for i in range(n)])


def _match(data: np.ndarray, str_end: np.ndarray, table: SymbolTable
           ) -> tuple[np.ndarray, np.ndarray]:
    """Greedy match code/length at every byte position, FSST-style:
    hash-table probe for 3..8-byte symbols, then the shortCodes 2-gram
    table, then 1-byte / escape.

    ``str_end[i]`` is the (exclusive) end offset of the string owning
    byte i — matches may not cross string boundaries. Returns
    (matchcode, matchlen); positions with no symbol get (ESCAPE, 1).
    """
    m = data.size
    if m == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    # 8-byte prefix gram at every position (zero-padded past the end)
    padded = np.concatenate([data, np.zeros(8, dtype=np.uint8)])
    g8 = np.zeros(m, dtype=_U64)
    for k in range(8):
        g8 |= padded[k: k + m].astype(_U64) << _U64(8 * (7 - k))
    avail = str_end - np.arange(m, dtype=np.int64)

    # base: 1- and 2-byte via shortCodes (guard 2-byte at string ends)
    g2 = (g8 >> _U64(48)).astype(np.int64)
    matchcode = table._short_code[g2]
    matchlen = table._short_len[g2]
    tail = (avail < 2) & (matchlen == 2)
    if tail.any():
        matchcode[tail] = table._code1[data[tail]]
        matchlen[tail] = 1

    # hash-table probe for 3..8-byte symbols
    g3 = g8 >> _U64(40)
    h = ((g3 * _HASH_PRIME) >> _U64(64 - _HASH_BITS)).astype(np.int64)
    hlen = table._ht_len[h]
    cand = hlen > 0
    if cand.any():
        w = np.flatnonzero(cand)
        wl = hlen[w]
        # prefix compare: mask g8 down to the symbol's length
        shift = ((8 - wl) * 8).astype(_U64)
        hit = ((g8[w] >> shift) << shift) == table._ht_gram[h[w]]
        hit &= wl <= avail[w]
        ww = w[hit]
        matchcode[ww] = table._ht_code[h[ww]]
        matchlen[ww] = hlen[ww]
    return matchcode, matchlen


def _parse(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
           matchcode: np.ndarray, matchlen: np.ndarray
           ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Greedy frontier parse. Returns per-token arrays sorted by
    (string, position): (sid, code, literal_byte, in_len)."""
    n = len(starts)
    sid = np.arange(n, dtype=np.int64)
    cur = starts.copy()
    keep0 = cur < ends
    sid, cur = sid[keep0], cur[keep0]
    sids, codes, lits, lens_, steps = [], [], [], [], []
    step = 0
    while sid.size:
        c = matchcode[cur]
        ln = matchlen[cur]
        sids.append(sid)
        codes.append(c)
        lits.append(data[cur])
        lens_.append(ln)
        steps.append(np.full(sid.size, step, dtype=np.int64))
        cur = cur + ln
        keep = cur < ends[sid]
        sid, cur = sid[keep], cur[keep]
        step += 1
    if not sids:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z.astype(np.uint8), z
    sid_a = np.concatenate(sids)
    code_a = np.concatenate(codes)
    lit_a = np.concatenate(lits)
    len_a = np.concatenate(lens_)
    step_a = np.concatenate(steps)
    # a string active at steps 0..k-1 emits exactly one token per step,
    # so its tokens live at tok_start[sid] + step — no sort needed
    tok_count = np.bincount(sid_a, minlength=n)
    tok_start = cumsum0(tok_count)[:-1]
    out_idx = tok_start[sid_a] + step_a
    sid_o = np.empty_like(sid_a)
    code_o = np.empty_like(code_a)
    lit_o = np.empty_like(lit_a)
    len_o = np.empty_like(len_a)
    sid_o[out_idx] = sid_a
    code_o[out_idx] = code_a
    lit_o[out_idx] = lit_a
    len_o[out_idx] = len_a
    return sid_o, code_o, lit_o, len_o


def _match_at(padded: np.ndarray, p: np.ndarray, avail: np.ndarray,
              table: SymbolTable) -> tuple[np.ndarray, np.ndarray]:
    """FSST lookup at the given positions only (the parse frontier):
    hash-table probe for 3..8-byte symbols, then shortCodes, then
    1-byte / escape. ``avail`` = bytes remaining in each position's
    string. Vectorized over the frontier, lazy over the buffer."""
    k = p.size
    g8 = np.zeros(k, dtype=_U64)
    for j in range(8):
        g8 |= padded[p + j].astype(_U64) << _U64(8 * (7 - j))
    h = ((g8 >> _U64(40)) * _HASH_PRIME) >> _U64(64 - _HASH_BITS)
    h = h.astype(np.int64)
    hlen = table._ht_len[h]
    shift = ((8 - hlen) * 8).astype(_U64)
    hit = (hlen > 0) & (hlen <= avail) & \
        (((g8 >> shift) << shift) == table._ht_gram[h])
    code = np.empty(k, dtype=np.int64)
    ln = np.empty(k, dtype=np.int64)
    miss = np.flatnonzero(~hit)
    w = np.flatnonzero(hit)
    code[w] = table._ht_code[h[w]]
    ln[w] = hlen[w]
    if miss.size:
        g2 = (g8[miss] >> _U64(48)).astype(np.int64)
        mc = table._short_code[g2]
        ml = table._short_len[g2]
        tail = (avail[miss] < 2) & (ml == 2)
        if tail.any():
            t = np.flatnonzero(tail)
            mc[t] = table._code1[(g2[t] >> 8)]
            ml[t] = 1
        code[miss] = mc
        ln[miss] = ml
    return code, ln


def encode_fsst(data: np.ndarray, lengths: np.ndarray, table: SymbolTable
                ) -> tuple[np.ndarray, np.ndarray]:
    """Encode concatenated string bytes with per-string ``lengths``.

    Returns (code_bytes, code_lengths): the concatenated code streams
    and each string's encoded byte length. Greedy parse runs as a
    frontier sweep with lazy symbol lookup — only visited positions
    (one per output token) pay for matching.
    """
    n = len(lengths)
    if n == 0 or data.size == 0:
        return _EMPTY_U8, np.zeros(n, dtype=np.int64)
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offs = cumsum0(lengths)
    starts, ends = offs[:-1], offs[1:]
    padded = np.concatenate([data, np.zeros(8, dtype=np.uint8)])

    sid = np.arange(n, dtype=np.int64)
    cur = starts.copy()
    end_of = ends
    keep0 = cur < end_of
    sid, cur = sid[keep0], cur[keep0]
    sids, codes_l, lits, steps = [], [], [], []
    step = 0
    while sid.size:
        c, ln = _match_at(padded, cur, end_of[sid] - cur, table)
        sids.append(sid)
        codes_l.append(c)
        lits.append(data[cur])
        steps.append(np.full(sid.size, step, dtype=np.int64))
        cur = cur + ln
        keep = cur < end_of[sid]
        sid, cur = sid[keep], cur[keep]
        step += 1
    if not sids:
        return _EMPTY_U8, np.zeros(n, dtype=np.int64)
    sid_a = np.concatenate(sids)
    code_a = np.concatenate(codes_l)
    lit_a = np.concatenate(lits)
    step_a = np.concatenate(steps)
    tok_count = np.bincount(sid_a, minlength=n)
    tok_start = cumsum0(tok_count)[:-1]
    tidx = tok_start[sid_a] + step_a

    esc_a = code_a == ESCAPE
    w_a = np.where(esc_a, 2, 1).astype(np.int64)
    w_o = np.empty_like(w_a)
    w_o[tidx] = w_a
    out_offs = cumsum0(w_o)
    pos = out_offs[:-1][tidx]
    out = np.empty(int(out_offs[-1]), dtype=np.uint8)
    out[pos] = code_a.astype(np.uint8)
    out[pos[esc_a] + 1] = lit_a[esc_a]
    code_lengths = np.bincount(sid_a, weights=w_a, minlength=n) \
        .astype(np.int64)
    return out, code_lengths


def decode_fsst(codes: np.ndarray, code_lengths: np.ndarray,
                table: SymbolTable) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_fsst`.

    Returns (bytes, lengths): concatenated decoded strings and each
    string's decoded byte length.
    """
    n = len(code_lengths)
    b = np.ascontiguousarray(codes, dtype=np.uint8)
    m = b.size
    if m == 0:
        return _EMPTY_U8, np.zeros(n, dtype=np.int64)
    offs = cumsum0(code_lengths)
    # classify positions: a 0xFF at an even offset within its
    # (string-start-split) run of consecutive 0xFFs is an escape; the
    # following byte is its literal.
    is255 = b == ESCAPE
    strstart = np.zeros(m, dtype=bool)
    strstart[offs[:-1][code_lengths > 0]] = True
    prev255 = np.empty(m, dtype=bool)
    prev255[0] = False
    prev255[1:] = is255[:-1]
    run_start = is255 & (~prev255 | strstart)
    # offset within run: position - start of run (runs are short; use
    # cumulative max of run-start indices)
    pos = np.arange(m, dtype=np.int64)
    start_idx = np.where(run_start, pos, 0)
    np.maximum.accumulate(start_idx, out=start_idx)
    in_run_off = pos - start_idx
    escape = is255 & (in_run_off % 2 == 0)
    literal = np.zeros(m, dtype=bool)
    literal[1:] = escape[:-1]
    is_code = ~literal

    cpos = np.flatnonzero(is_code)
    ccode = b[cpos].astype(np.int64)
    cesc = escape[cpos]
    out_len = np.where(cesc, 1, table._sym_lens[np.where(cesc, 0, ccode)])
    out_offs = cumsum0(out_len)
    out = np.empty(int(out_offs[-1]), dtype=np.uint8)
    # literals
    lit_rows = np.flatnonzero(cesc)
    out[out_offs[lit_rows]] = b[cpos[lit_rows] + 1]
    # symbols: gather from the table's concatenated bytes
    sym_rows = np.flatnonzero(~cesc)
    sc = ccode[sym_rows]
    out[span_positions(out_offs[sym_rows], table._sym_lens[sc])] = \
        table._sym_bytes[span_positions(table._sym_offs[sc],
                                        table._sym_lens[sc])]
    # per-string decoded lengths: sum out_len per string
    strid = np.searchsorted(offs[1:], cpos, side="right")
    lengths = np.bincount(strid, weights=out_len, minlength=n) \
        .astype(np.int64)
    return out, lengths


def build_table(data: np.ndarray, lengths: np.ndarray,
                iterations: int = 5, sample_bytes: int = 1 << 16
                ) -> SymbolTable:
    """Build a symbol table from a sample, FSST-paper style bottom-up:
    re-encode the sample each iteration, count symbol + adjacent-pair
    gains, keep the top 255 by gain = freq x length."""
    n = len(lengths)
    data = np.ascontiguousarray(data, dtype=np.uint8)
    if n == 0 or data.size == 0:
        return SymbolTable([])
    # sample: prefix of whole strings up to sample_bytes
    offs = cumsum0(lengths)
    k = int(np.searchsorted(offs, sample_bytes))
    k = max(1, min(n, k))
    s_lens = lengths[:k]
    s_data = data[: int(offs[k])]
    s_offs = offs[: k + 1]
    starts, ends = s_offs[:-1], s_offs[1:]
    str_end = np.repeat(ends, s_lens)

    table = SymbolTable([])
    for _ in range(iterations):
        if table.symbols:
            mc, ml = _match(s_data, str_end, table)
        else:
            mc = np.full(s_data.size, ESCAPE, dtype=np.int64)
            ml = np.ones(s_data.size, dtype=np.int64)
        sid, code, lit, ln = _parse(s_data, starts, ends, mc, ml)
        if sid.size == 0:
            break
        # token grams: symbol gram or literal byte
        tok_gram = np.where(code == ESCAPE, lit.astype(_U64), 0)
        tok_len = ln
        if table.symbols:
            sym_grams = np.array(
                [_sym_gram(s) for s in table.symbols] + [0], dtype=_U64)
            nz = code != ESCAPE
            tok_gram[nz] = sym_grams[code[nz]]
        # singles
        cand_g = [tok_gram]
        cand_l = [tok_len]
        # adjacent pairs within the same string
        same = sid[1:] == sid[:-1]
        plen = tok_len[:-1] + tok_len[1:]
        okp = same & (plen <= MAX_SYMBOL_LEN)
        pg = (tok_gram[:-1] << (tok_len[1:].astype(_U64) * _U64(8))) \
            | tok_gram[1:]
        cand_g.append(pg[okp])
        cand_l.append(plen[okp])
        g_all = np.concatenate(cand_g)
        l_all = np.concatenate(cand_l)
        # count (gram, len) pairs
        order = np.lexsort((g_all, l_all))
        g_s, l_s = g_all[order], l_all[order]
        new = np.empty(g_s.size, dtype=bool)
        new[0] = True
        new[1:] = (g_s[1:] != g_s[:-1]) | (l_s[1:] != l_s[:-1])
        firsts = np.flatnonzero(new)
        freqs = np.diff(np.append(firsts, g_s.size))
        ug, ul = g_s[firsts], l_s[firsts]
        gain = freqs * ul
        # greedily accept candidates in gain order, skipping ones whose
        # lookup slot (1-byte cell / 2-gram cell / 3-byte-prefix hash
        # bucket) is already taken — a slot-losing symbol would never
        # match at encode time, wasting its code (the reference FSST's
        # lossy hash insert has the same constraint).
        order = np.argsort(gain, kind="stable")[::-1]
        syms: list[bytes] = []
        used1: set[int] = set()
        used2: set[int] = set()
        usedh: set[int] = set()
        for i in order:
            if len(syms) >= MAX_SYMBOLS or gain[i] <= int(ul[i]):
                break
            s = int(ug[i]).to_bytes(int(ul[i]), "big")
            if len(s) == 1:
                if s[0] in used1:
                    continue
                used1.add(s[0])
            elif len(s) == 2:
                g2 = (s[0] << 8) | s[1]
                if g2 in used2:
                    continue
                used2.add(g2)
            else:
                g3 = _U64(_sym_gram(s[:3]))
                hh = int((g3 * _HASH_PRIME) >> _U64(64 - _HASH_BITS))
                if hh in usedh:
                    continue
                usedh.add(hh)
            syms.append(s)
        table = SymbolTable(syms)
    return table
