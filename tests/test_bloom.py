"""Bloom filter tests: murmur3 reference vectors, membership
properties, and cross-implementation compatibility with ORC C++
bloom streams (BLOOM_FILTER_UTF8)."""

import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.orc as orc
import pytest

from engine.bloom import BloomFilter, orc_hash64, wang_hash64
from tests.orc_tail import _fields, parse_orc


def _murmur3_ref(data: bytes, seed: int) -> int:
    """Reference scalar orc-core Murmur3.hash64 (single 64-bit lane)."""
    M = (1 << 64) - 1
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & M
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & M
        k ^= k >> 33
        return k

    h = seed
    nblocks = len(data) >> 3
    for i in range(nblocks):
        k = int.from_bytes(data[i * 8: (i + 1) * 8], "little")
        k = (k * c1) & M
        k = rotl(k, 31)
        k = (k * c2) & M
        h ^= k
        h = (rotl(h, 27) * 5 + 0x52DCE729) & M
    tail = data[nblocks * 8:]
    if tail:
        k1 = int.from_bytes(tail.ljust(8, b"\0"), "little")
        k1 = (k1 * c1) & M
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & M
        h ^= k1
    h ^= len(data)
    return fmix(h)


def test_murmur3_matches_reference():
    vals = [b"", b"a", b"abcdefg", b"12345678", b"123456789",
            b"x" * 15, b"x" * 16, b"x" * 17, b"x" * 31, b"x" * 32,
            b"the quick brown fox jumps over the lazy dog",
            bytes(range(256))]
    data = np.frombuffer(b"".join(vals), np.uint8)
    lens = np.array([len(v) for v in vals], dtype=np.int64)
    got = orc_hash64(data, lens)
    want = [_murmur3_ref(v, 104729) for v in vals]
    assert [int(g) for g in got] == want


def test_bloom_longs_membership():
    rng = np.random.default_rng(5)
    vals = rng.integers(-(2 ** 60), 2 ** 60, 5000)
    bf = BloomFilter(5000, fpp=0.01)
    bf.add_longs(vals)
    assert bf.test_longs(vals).all()  # no false negatives
    other = rng.integers(-(2 ** 60), 2 ** 60, 20000)
    fresh = other[~np.isin(other, vals)]
    fp = bf.test_longs(fresh).mean()
    assert fp < 0.03, fp  # near the target fpp


def test_bloom_strings_membership_and_serialize():
    vals = [f"doc-{i:08d}".encode() for i in range(3000)]
    data = np.frombuffer(b"".join(vals), np.uint8)
    lens = np.array([len(v) for v in vals], dtype=np.int64)
    bf = BloomFilter(3000)
    bf.add_strings(data, lens)
    assert bf.test_strings(data, lens).all()
    bf2 = BloomFilter.deserialize(bf.serialize())
    assert bf2.test_strings(data, lens).all()
    other = [f"nope-{i:08d}".encode() for i in range(3000)]
    od = np.frombuffer(b"".join(other), np.uint8)
    ol = np.array([len(v) for v in other], dtype=np.int64)
    assert bf2.test_strings(od, ol).mean() < 0.03


def _orc_bloom_bitsets(vals, pa_type):
    """Write an ORC file with blooms via ORC C++; parse the
    BLOOM_FILTER_UTF8 stream -> list of (numHashFunctions, bitset bytes)."""
    f = tempfile.mktemp(suffix=".orc")
    orc.write_table(pa.table({"x": pa.array(vals, type=pa_type)}), f,
                    compression="uncompressed",
                    bloom_filter_columns=[1], bloom_filter_fpp=0.01,
                    row_index_stride=10000)
    stripe = parse_orc(f)[0]
    blob = stripe["streams"].get((1, "BLOOM_FILTER_UTF8"))
    assert blob, "no bloom stream written"
    out = []
    for fno, _, v in _fields(blob):  # BloomFilterIndex.bloomFilter
        if fno == 1:
            k = None
            bitset = b""
            for f2, wt, v2 in _fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 3:  # utf8bitset bytes
                    bitset = v2
            out.append((k, bitset))
    return out


def test_cross_impl_string_bloom_hash_compat():
    """Our murmur3/probe derivation finds every value present in an ORC
    C++-written bloom bitset (hash compatibility, the property stripe
    skipping relies on)."""
    vals = [f"key-{i:06d}" for i in range(5000)]
    blooms = _orc_bloom_bitsets(vals, pa.string())
    k, bitset = blooms[0]
    bf = BloomFilter.__new__(BloomFilter)
    bf.num_hash_functions = int(k)
    bf.num_bits = len(bitset) * 8
    bf.bits = np.frombuffer(bitset, dtype="<u8").astype(np.uint64).copy()
    data = np.frombuffer("".join(vals).encode(), np.uint8)
    lens = np.array([len(v) for v in vals], dtype=np.int64)
    assert bf.test_strings(data, lens).all()
    # and absent keys mostly miss
    other = [f"zzz-{i:06d}" for i in range(5000)]
    od = np.frombuffer("".join(other).encode(), np.uint8)
    ol = np.array([len(v) for v in other], dtype=np.int64)
    assert bf.test_strings(od, ol).mean() < 0.05


def test_cross_impl_long_bloom_hash_compat():
    """Thomas Wang long hash matches ORC C++'s integer bloom insert."""
    vals = list(range(100000, 105000))
    blooms = _orc_bloom_bitsets(vals, pa.int64())
    k, bitset = blooms[0]
    bf = BloomFilter.__new__(BloomFilter)
    bf.num_hash_functions = int(k)
    bf.num_bits = len(bitset) * 8
    bf.bits = np.frombuffer(bitset, dtype="<u8").astype(np.uint64).copy()
    assert bf.test_longs(np.array(vals)).all()
    absent = np.arange(900000, 905000)
    assert bf.test_longs(absent).mean() < 0.05
