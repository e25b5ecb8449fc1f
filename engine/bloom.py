"""ORC bloom filters (SURVEY.md §2.5 M3): BLOOM_FILTER_UTF8 semantics.

Layout and hashing follow apache/orc BloomFilter / BloomFilterUtf8:

- sizing: numBits = ceil(-n ln(fpp) / ln(2)^2) rounded up to 64;
  numHashFunctions = max(1, round(numBits/n * ln 2))
  (orcconf.txt:18 orc.bloom.filter.fpp default 0.01 — ORC caps 1..15%)
- per value a single 64-bit base hash: Thomas Wang's 64-bit mix for
  longs, orc-core's single-lane Murmur3.hash64 (seed 104729) of the
  UTF-8 bytes for strings;
- k derived probes: hash1 + i*hash2 over the int halves, bit-flipped
  when negative, modulo numBits (BloomFilter.addHash in orc-core).

All hashing is vectorized: the Wang mix is pure uint64 numpy; Murmur3
processes a (n, ceil(L/16)*16) padded byte matrix per 16-byte block —
no per-value Python. Membership tests decode-side give the stride/
stripe skipping ORC's SearchArguments use.
"""

from __future__ import annotations

import math

import numpy as np

_U64 = np.uint64
_M = _U64(0xFFFFFFFFFFFFFFFF)
DEFAULT_FPP = 0.01
_MURMUR_SEED = _U64(104729)  # orc Murmur3 DEFAULT_SEED
_C1 = _U64(0x87C37B91114253D5)
_C2 = _U64(0x4CF5AD432745937F)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _fmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> _U64(33))
    return k


def wang_hash64(v) -> np.ndarray:
    """Thomas Wang 64-bit mix — orc-core BloomFilter.getLongHash.

    orc-core's Java source uses SIGNED ``>>`` (arithmetic) shifts, not
    Wang's original unsigned ones (verified in the orc-core 2.2.2
    bytecode: ``lshr``, not ``lushr``). The two agree whenever every
    intermediate value stays non-negative — true for the small
    positive longs typical of id columns, which is why a logical-shift
    version cross-validates on those — but diverge for negative /
    large (≳2^42) longs and for doubleToLongBits patterns, where a
    logical-shift probe silently misses every real ORC bloom entry.
    All ops are int64 with wrap-around (Java semantics)."""
    k = np.asarray(v, dtype=np.int64)
    _i = np.int64
    with np.errstate(over="ignore"):
        k = (~k) + (k << _i(21))
        k = k ^ (k >> _i(24))
        k = (k + (k << _i(3))) + (k << _i(8))
        k = k ^ (k >> _i(14))
        k = (k + (k << _i(2))) + (k << _i(4))
        k = k ^ (k >> _i(28))
        k = k + (k << _i(31))
    return k.view(_U64)


def orc_hash64(data: np.ndarray, lengths: np.ndarray,
               seed: int | np.uint64 = _MURMUR_SEED) -> np.ndarray:
    """orc-core Murmur3.hash64: single-lane 64-bit murmur over 8-byte
    little-endian blocks, seed 104729 — verified hash-compatible with
    ORC C++-written bloom bitsets (tests/test_bloom.py).

    ``data`` is the concatenation of the strings, ``lengths`` their
    byte lengths. Vectorized: values are laid into a zero-padded
    (n, blocks*8) matrix and mixed block-by-block.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    n = lengths.size
    if n == 0:
        return np.zeros(0, dtype=_U64)
    maxlen = int(lengths.max()) if n else 0
    nblocks = (maxlen + 7) // 8 if maxlen else 0
    width = max(nblocks * 8, 8)
    mat = np.zeros((n, width), dtype=np.uint8)
    col = np.arange(width)
    valid = col[None, :] < lengths[:, None]
    mat[valid] = np.asarray(data, dtype=np.uint8)
    lanes = mat.view("<u8")  # (n, width//8) little-endian lanes

    h = np.full(n, np.uint64(seed), dtype=_U64)
    full_blocks = lengths // 8
    for b in range(nblocks):
        sel = full_blocks > b
        if not sel.any():
            break
        k = _rotl(lanes[sel, b] * _C1, 31) * _C2
        hh = h[sel] ^ k
        h[sel] = _rotl(hh, 27) * _U64(5) + _U64(0x52DCE729)
    tail_rows = np.flatnonzero(lengths % 8 > 0)
    if tail_rows.size:
        tb = full_blocks[tail_rows]
        k1 = _rotl(lanes[tail_rows, tb] * _C1, 31) * _C2
        h[tail_rows] = h[tail_rows] ^ k1
    h = h ^ lengths.astype(_U64)
    return _fmix(h)


class BloomFilter:
    """Bitset bloom filter with ORC's probe derivation."""

    def __init__(self, expected_n: int, fpp: float = DEFAULT_FPP):
        nb = int(math.ceil(-expected_n * math.log(fpp)
                           / (math.log(2) ** 2)))
        self.num_bits = max(64, (nb + 63) // 64 * 64)
        self.num_hash_functions = max(
            1, int(round(self.num_bits / expected_n * math.log(2))))
        self.bits = np.zeros(self.num_bits // 64, dtype=_U64)

    def _positions(self, hash64: np.ndarray) -> tuple[np.ndarray,
                                                      np.ndarray]:
        """(k, n) bit positions per ORC addHash: int-half combination
        with bit-flip on negative."""
        h1 = (hash64 & _U64(0xFFFFFFFF)).astype(np.int64).astype(np.int32)
        h2 = (hash64 >> _U64(32)).astype(np.int64).astype(np.int32)
        ks = []
        for i in range(1, self.num_hash_functions + 1):
            with np.errstate(over="ignore"):
                c = (h1.astype(np.int32)
                     + np.int32(i) * h2.astype(np.int32))
            c = np.where(c < 0, ~c, c)
            ks.append(c.astype(np.int64) % self.num_bits)
        return np.stack(ks), None

    def add_hashes(self, hash64: np.ndarray) -> None:
        pos, _ = self._positions(hash64)
        flat = pos.reshape(-1)
        np.bitwise_or.at(self.bits, flat >> 6,
                         _U64(1) << (flat & 63).astype(_U64))

    def add_longs(self, values) -> None:
        self.add_hashes(wang_hash64(values))

    def add_strings(self, data: np.ndarray, lengths: np.ndarray) -> None:
        self.add_hashes(orc_hash64(data, lengths))

    def test_hashes(self, hash64: np.ndarray) -> np.ndarray:
        pos, _ = self._positions(hash64)
        hit = np.ones(hash64.size, dtype=bool)
        for row in pos:
            hit &= (self.bits[row >> 6]
                    >> (row & 63).astype(_U64)) & _U64(1) == 1
        return hit

    def test_longs(self, values) -> np.ndarray:
        return self.test_hashes(wang_hash64(values))

    def test_strings(self, data, lengths) -> np.ndarray:
        return self.test_hashes(orc_hash64(data, lengths))

    def serialize(self) -> bytes:
        head = np.array([self.num_hash_functions, self.num_bits],
                        dtype="<u4").tobytes()
        return head + self.bits.astype("<u8").tobytes()

    @classmethod
    def deserialize(cls, buf) -> "BloomFilter":
        raw = bytes(buf)
        k, nb = np.frombuffer(raw[:8], dtype="<u4")
        self = cls.__new__(cls)
        self.num_hash_functions = int(k)
        self.num_bits = int(nb)
        self.bits = np.frombuffer(raw[8:], dtype="<u8").astype(_U64).copy()
        return self
