"""FSST tests: round-trip, escape paths, table build, compression gains
(FIXTURES.md F-STR S3/S4/S5)."""

import numpy as np
import pytest

from engine.fsst import (MAX_SYMBOL_LEN, SymbolTable, build_table,
                         decode_fsst, encode_fsst)

RNG = np.random.default_rng(23)


def pack(strings):
    bs = [s.encode() if isinstance(s, str) else s for s in strings]
    data = np.frombuffer(b"".join(bs), dtype=np.uint8)
    lens = np.array([len(b) for b in bs], dtype=np.int64)
    return data, lens


def unpack(data, lens):
    raw = data.tobytes()
    offs = np.concatenate([[0], np.cumsum(lens)])
    return [raw[offs[i]: offs[i + 1]] for i in range(len(lens))]


def rt(strings, table=None):
    data, lens = pack(strings)
    if table is None:
        table = build_table(data, lens)
    codes, clens = encode_fsst(data, lens, table)
    dec, dlens = decode_fsst(codes, clens, table)
    got = unpack(dec, dlens)
    want = [s.encode() if isinstance(s, str) else s for s in strings]
    assert got == want, (got[:5], want[:5])
    return codes, clens, table


def test_empty_input():
    rt([])
    rt(["", "", ""])


def test_empty_table_all_escapes():
    data, lens = pack(["abc", "d"])
    t = SymbolTable([])
    codes, clens = encode_fsst(data, lens, t)
    assert codes.size == 8  # every byte escaped: 2 bytes each
    assert list(clens) == [6, 2]
    dec, dlens = decode_fsst(codes, clens, t)
    assert unpack(dec, dlens) == [b"abc", b"d"]


def test_known_table_longest_match():
    t = SymbolTable([b"ab", b"abcd", b"c"])
    data, lens = pack(["abcdc", "ab"])
    codes, clens = encode_fsst(data, lens, t)
    # abcdc -> [abcd][c] = codes 1, 2; ab -> code 0
    assert codes.tobytes() == bytes([1, 2, 0])
    assert list(clens) == [2, 1]
    dec, dlens = decode_fsst(codes, clens, t)
    assert unpack(dec, dlens) == [b"abcdc", b"ab"]


def test_match_does_not_cross_string_boundary():
    t = SymbolTable([b"ab"])
    # "a" + "b" adjacent in the buffer must NOT match the 2-byte symbol
    codes, clens = encode_fsst(*pack(["a", "b"]), t)
    assert list(clens) == [2, 2]  # both escaped


def test_s4_escape_heavy():
    vals = [bytes([255] * k) for k in range(1, 20)] + \
           [bytes([255, 65, 255, 255, 66])] * 5
    rt(vals)


def test_s4_escape_heavy_random():
    vals = [bytes(RNG.choice([255, 254, 65, 66], size=RNG.integers(0, 30))
                  .astype(np.uint8)) for _ in range(300)]
    rt(vals)


def test_s5_symbol_length_boundaries():
    # strings of exactly 1..8+ identical bytes: symbols cap at 8
    vals = ["x" * k for k in range(1, 12)] * 50
    rt(vals)


def test_s3_doc_id_style_compresses():
    vals = [f"commoncrawl/{i:012d}" for i in range(2000)]
    codes, clens, t = rt(vals)
    in_bytes = sum(len(v) for v in vals)
    ratio = (codes.size + t.serialize().size) / in_bytes
    assert ratio < 0.55, ratio


def test_url_style_compresses():
    hosts = ["example.com", "data.org", "files.net"]
    vals = [f"https://{hosts[i % 3]}/path/to/resource/{i:08x}.html"
            for i in range(3000)]
    codes, clens, t = rt(vals)
    in_bytes = sum(len(v) for v in vals)
    assert (codes.size + t.serialize().size) / in_bytes < 0.6


def test_random_strings_roundtrip():
    vals = [bytes(RNG.integers(0, 256, RNG.integers(0, 40)).astype(np.uint8))
            for _ in range(500)]
    rt(vals)


def test_table_serialize_roundtrip():
    data, lens = pack([f"wikipedia/{i:09d}" for i in range(500)])
    t = build_table(data, lens)
    assert 0 < len(t.symbols) <= 255
    assert all(1 <= len(s) <= MAX_SYMBOL_LEN for s in t.symbols)
    t2 = SymbolTable.deserialize(t.serialize())
    assert t2.symbols == t.symbols
    c1, l1 = encode_fsst(data, lens, t)
    c2, l2 = encode_fsst(data, lens, t2)
    assert np.array_equal(c1, c2) and np.array_equal(l1, l2)


def test_mixed_sources_fixture():
    srcs = ["commoncrawl", "wikipedia", "github", "books", "arxiv"]
    vals = [f"{srcs[i % 5]}/{i:012d}" for i in range(5000)]
    rt(vals)
