"""String codec tests: round-trip, selector threshold, and golden byte /
cross-implementation checks against ORC C++ (FIXTURES.md F-STR S1/S2)."""

import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.orc as orc
import pytest

from engine.strings import (decode_strings, encode_strings,
                            sorted_dictionary, strings_from_bytes,
                            arrow_bytes_lengths)
from tests.orc_tail import parse_orc

RNG = np.random.default_rng(11)


def rt(values, **kw):
    arr = pa.array(values, type=pa.large_utf8())
    enc = encode_strings(arr, **kw)
    dec = decode_strings(enc)
    assert dec.to_pylist() == list(values)
    return enc


def test_empty():
    enc = rt([])
    assert enc["n"] == 0


def test_s1_low_cardinality_dictionary():
    vals = ["banana", "apple", "walnut"] * 800
    enc = rt(vals)
    assert enc["kind"] == "DICTIONARY_V2"
    assert enc["dict_size"] == 3
    # sorted dictionary bytes, PROBES.md P5 golden
    assert enc["dict_data"].tobytes() == b"applebananawalnut"


def test_sorted_dictionary_remap():
    arr = pa.array(["b", "c", "a", "b", "a"])
    ids, keys = sorted_dictionary(arr)
    assert keys.to_pylist() == ["a", "b", "c"]
    assert list(ids) == [1, 2, 0, 1, 0]


def test_s2_threshold_boundary():
    # cardinality / n around the 0.8 threshold
    n = 1000
    for card, expect in ((790, "DICTIONARY_V2"), (800, "DICTIONARY_V2"),
                         (810, "DIRECT_V2")):
        vals = [f"k{i % card:06d}" for i in range(n)]
        enc = rt(vals)
        assert enc["kind"] == expect, (card, enc["kind"])


def test_direct_roundtrip_unicode():
    vals = ["", "a", "héllo wörld", "日本語テキスト", "x" * 1000,
            "tab\tnew\nline"] * 200
    enc = rt(vals, dict_threshold=0.0)  # force direct
    assert enc["kind"] == "DIRECT_V2"


def test_empty_strings_dictionary():
    enc = rt(["", "", "", "a"] * 100)
    assert enc["kind"] == "DICTIONARY_V2"


def test_random_binaryish():
    vals = ["".join(chr(c) for c in RNG.integers(1, 0x300, 12))
            for _ in range(500)]
    rt(vals)


def test_bytes_lengths_roundtrip():
    arr = pa.array(["ab", "", "cde"], type=pa.large_utf8())
    data, lens = arrow_bytes_lengths(arr)
    assert data.tobytes() == b"abcde"
    assert list(lens) == [2, 0, 3]
    back = strings_from_bytes(data, lens)
    assert back.to_pylist() == ["ab", "", "cde"]


# --- cross-implementation vs ORC C++ ---------------------------------------

def _orc_streams(vals, dict_threshold=0.8):
    f = tempfile.mktemp(suffix=".orc")
    orc.write_table(pa.table({"s": pa.array(vals)}), f,
                    compression="uncompressed",
                    dictionary_key_size_threshold=dict_threshold)
    return parse_orc(f)[0]


def test_golden_byte_identical_to_orc_cpp():
    """Our encoder reproduces ORC C++'s DICTIONARY_V2 streams exactly
    (PROBES.md P5 scenario)."""
    vals = ["banana", "apple", "walnut"] * 800
    stripe = _orc_streams(vals)
    assert stripe["encodings"][1][0] == "DICTIONARY_V2"
    enc = encode_strings(pa.array(vals, type=pa.large_utf8()))
    assert enc["data"].tobytes() == stripe["streams"][(1, "DATA")]
    assert enc["dict_data"].tobytes() == \
        stripe["streams"][(1, "DICTIONARY_DATA")]
    assert enc["length"].tobytes() == stripe["streams"][(1, "LENGTH")]


def test_cross_impl_decode_dictionary():
    """Decode streams written by ORC C++ with our decoder."""
    vals = [f"src{i % 17:03d}" for i in range(5000)]
    stripe = _orc_streams(vals)
    kind, dsz = stripe["encodings"][1]
    assert kind == "DICTIONARY_V2"
    dec = decode_strings({
        "kind": kind,
        "data": np.frombuffer(stripe["streams"][(1, "DATA")], np.uint8),
        "length": np.frombuffer(stripe["streams"][(1, "LENGTH")], np.uint8),
        "dict_data": np.frombuffer(
            stripe["streams"][(1, "DICTIONARY_DATA")], np.uint8),
        "dict_size": dsz}, stripe["n_rows"])
    assert dec.to_pylist() == vals


def test_cross_impl_decode_direct():
    vals = [f"unique-{i:08d}-{RNG.integers(0, 1 << 30):x}"
            for i in range(3000)]
    stripe = _orc_streams(vals)
    kind, _ = stripe["encodings"][1]
    assert kind == "DIRECT_V2"
    dec = decode_strings({
        "kind": kind,
        "data": np.frombuffer(stripe["streams"][(1, "DATA")], np.uint8),
        "length": np.frombuffer(stripe["streams"][(1, "LENGTH")], np.uint8),
        "dict_data": b"", "dict_size": 0}, stripe["n_rows"])
    assert dec.to_pylist() == vals
