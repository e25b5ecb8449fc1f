"""General-compression chunk wrapper (SURVEY.md §2.5 C1).

ORC wraps every stream in compression chunks of at most
``orc.compress.size`` (256 KiB, orcconf.txt:6) with a 3-byte
little-endian header ``(compressedLength << 1) | isOriginal`` — a
chunk that doesn't shrink is stored raw with the isOriginal bit set,
so pathological inputs never grow by more than 3 bytes per 256 KiB.

The reference's default codec is zstd (orcconf.txt:9); this sandbox
only ships zlib/lzma in the stdlib, so the codec registry names the
algorithms explicitly and ``CODECS`` is the one-line extension point
when zstd is available. Lightweight codecs (engine/rle2 etc.) remain
the primary compressors; this wrapper is the optional outer layer that
chases the reference's zstd-compressed byte size (BASELINE.md: 9.56
bits/token).
"""

from __future__ import annotations

import lzma
import zlib

import numpy as np

CHUNK_SIZE = 256 * 1024  # orc.compress.size default

_LZMA_FILTERS = [{"id": lzma.FILTER_LZMA2, "preset": 1}]

def _deflate_rle(level: int):
    def f(b):
        return _deflate(b, level)
    return f


def _deflate(b, level: int) -> bytes:
    """zlib with the Z_RLE match strategy, falling back to the
    default strategy on small inputs when that wins.

    On this engine's bit-packed / varint streams Z_RLE (run-length
    matches only + Huffman literals) measured 3.7x faster than the
    default strategy AND 2% smaller net (r3, 179 real streams from
    F-MAIN 100k rows: 31.17 -> 30.48 MB, 1.81 -> 0.57 s): packed token
    deltas have almost no long-range matches for the full matcher to
    find, so its O(chain) search buys nothing. The only streams where
    the full matcher wins are tiny (<6 KB directory / source streams),
    so those try both and keep the smaller — any inflate reads either
    output, the strategy is not part of the format.
    """
    data = bytes(b)
    co = zlib.compressobj(level, zlib.DEFLATED, 15, 8, zlib.Z_RLE)
    out = co.compress(data) + co.flush()
    if len(data) < 16384:
        alt = zlib.compress(data, level)
        if len(alt) < len(out):
            return alt
    return out


CODECS: dict[str, tuple] = {
    # name -> (compress(bytes)->bytes, decompress(bytes)->bytes)
    "zlib": (_deflate_rle(4), zlib.decompress),
    "zlib5": (_deflate_rle(5), zlib.decompress),
    "zlib6": (lambda b: zlib.compress(b, 6), zlib.decompress),
    "zlib9": (lambda b: zlib.compress(b, 9), zlib.decompress),
    "lzma1": (lambda b: lzma.compress(b, format=lzma.FORMAT_RAW,
                                      filters=_LZMA_FILTERS),
              lambda b: lzma.decompress(b, format=lzma.FORMAT_RAW,
                                        filters=_LZMA_FILTERS)),
}

# zstd is the reference's default outer codec (orcconf.txt:9):
# register the `zstandard` binding when installed, else pyarrow's
# bundled zstd codec (always shipped with pyarrow >= 4).
def _zstd_content_size(b: bytes) -> int:
    """Frame_Content_Size from a zstd frame header (RFC 8878 §3.1.1)
    — pyarrow's one-shot Codec.decompress requires the exact size, and
    every frame this module writes (one-shot compress of an in-memory
    chunk) embeds it."""
    if b[:4] != b"\x28\xb5\x2f\xfd":
        raise ValueError("not a zstd frame")
    fhd = b[4]
    fcs_flag = fhd >> 6
    single = (fhd >> 5) & 1
    pos = 5 + (0 if single else 1)           # Window_Descriptor
    pos += (0, 1, 2, 4)[fhd & 3]             # Dictionary_ID
    if fcs_flag == 0:
        if not single:
            raise ValueError("zstd frame lacks Frame_Content_Size")
        return b[pos]
    if fcs_flag == 1:
        return int.from_bytes(b[pos:pos + 2], "little") + 256
    n = 4 if fcs_flag == 2 else 8
    return int.from_bytes(b[pos:pos + n], "little")


try:  # pragma: no cover - exercised only where zstandard is installed
    import zstandard as _zstd

    CODECS["zstd"] = (
        lambda b: _zstd.ZstdCompressor(level=3).compress(b),
        lambda b: _zstd.ZstdDecompressor().decompress(b))
    HAVE_ZSTD = True
except ImportError:
    try:
        import pyarrow as _pa

        if not _pa.Codec.is_available("zstd"):
            raise ImportError("pyarrow built without zstd")
        _ZSTD_C = _pa.Codec("zstd", compression_level=3)
        _ZSTD_D = _pa.Codec("zstd")
        CODECS["zstd"] = (
            lambda b: bytes(_ZSTD_C.compress(b)),
            lambda b: bytes(_ZSTD_D.decompress(
                b, _zstd_content_size(bytes(b)))))
        HAVE_ZSTD = True
    except ImportError:
        HAVE_ZSTD = False


def resolve_stream_codec(codec: str, kind: str, key: str,
                         enc: str | None = None) -> str:
    """Per-stream codec for the ``mixed`` profile (the default): string
    DATA / DICTIONARY_DATA streams take lzma1, every other stream takes
    zlib5 — or zstd for everything when the library is present. The
    mapping is a pure function of (profile, column kind, stream key,
    string encoding kind ``enc``), so readers resolve it without extra
    metadata.

    Measured (r3, interleaved A/B on F-MAIN 200k rows): remapping the
    FSST code / dict index streams to zlib5 — the r2 verdict's 1-core
    decode hypothesis — is 3% SLOWER to decode and +0.03 bits/token;
    lzma1 inflate of those entropy-reduced streams is not the decode
    bottleneck (the RLEv2 bit-unpack walk is, see BENCH.md). The
    lzma1 mapping stays.

    The mapping is FIXED per profile name — a profile must resolve
    identically forever because readers re-derive it from the name
    stored in the blocks table. (r3 fix: the earlier detect-and-prefer
    behavior resolved "mixed" to zstd whenever the library appeared,
    which would mis-read every mixed table written before the install;
    zstd now has its own profile names.) "zstd" = every stream zstd-3;
    "mixed-zstd" = string DATA/DICT lzma1, zstd-3 elsewhere. Measured
    (r3, interleaved A/B, F-MAIN 100k rows, 1 core, best-of-3):
    mixed 10.098 bits/token enc 4.87 / dec 7.95 Mtok/s; zstd 10.233,
    4.90 / 9.00; mixed-zstd 10.206, 5.48 / 8.48 — all under the
    reference's 10.354 same-table zstd bar; mixed stays the default
    as the smallest, zstd modes trade ~1% size for 7-13% speed.
    """
    if codec == "mixed-zstd":
        if kind == "str" and key in ("data", "dict"):
            return "lzma1"
        return "zstd"
    if codec != "mixed":
        return codec
    if kind == "str" and key in ("data", "dict"):
        return "lzma1"
    return "zlib5"


def compress_stream(data, codec: str = "zlib",
                    chunk_size: int = CHUNK_SIZE) -> bytes:
    """ORC-framed chunked compression of a byte stream."""
    if codec == "none":
        raise ValueError("frame only wraps real codecs; store raw instead")
    comp, _ = CODECS[codec]
    raw = data.tobytes() if isinstance(data, np.ndarray) else bytes(data)
    out = bytearray()
    for i in range(0, len(raw), chunk_size):
        chunk = raw[i: i + chunk_size]
        c = comp(chunk)
        if len(c) < len(chunk):
            header = len(c) << 1
            body = c
        else:
            header = (len(chunk) << 1) | 1
            body = chunk
        out += header.to_bytes(3, "little")
        out += body
    return bytes(out)


class FrameReader:
    """Random access into a C1-framed stream without inflating it all.

    Frames cover fixed ``chunk_size`` spans of the RAW stream, so a raw
    byte range maps to a contiguous frame range; ``fetch(lo, hi)``
    decompresses ONLY the covering frames (cached per frame) — the
    seek primitive that stride-level decode uses on wrapped blocks.
    ``bytes_touched`` counts compressed bytes actually read."""

    def __init__(self, buf, codec: str = "zlib",
                 chunk_size: int = CHUNK_SIZE):
        self.raw = buf.tobytes() if isinstance(buf, np.ndarray) \
            else bytes(buf)
        self.codec = codec
        self.chunk_size = chunk_size
        self._frames: list[tuple[int, int, bool]] = []  # (off, len, raw?)
        pos = 0
        n = len(self.raw)
        while pos < n:
            header = int.from_bytes(self.raw[pos: pos + 3], "little")
            pos += 3
            self._frames.append((pos, header >> 1, bool(header & 1)))
            pos += header >> 1
        self._cache: dict[int, bytes] = {}
        self.bytes_touched = 0

    def _frame(self, i: int) -> bytes:
        got = self._cache.get(i)
        if got is None:
            off, length, is_raw = self._frames[i]
            body = self.raw[off: off + length]
            self.bytes_touched += length + 3
            got = body if is_raw else CODECS[self.codec][1](body)
            self._cache[i] = got
        return got

    def fetch(self, lo: int, hi: int) -> bytes:
        if hi <= lo:
            return b""
        f0 = lo // self.chunk_size
        f1 = (hi - 1) // self.chunk_size
        parts = [self._frame(i) for i in range(f0, f1 + 1)]
        blob = b"".join(parts)
        base = f0 * self.chunk_size
        return blob[lo - base: hi - base]

    def fetch_rest(self, lo: int) -> bytes:
        """Raw bytes from ``lo`` to the end of the stream."""
        f0 = lo // self.chunk_size
        parts = [self._frame(i) for i in range(f0, len(self._frames))]
        return b"".join(parts)[lo - f0 * self.chunk_size:]


class RawReader:
    """Same fetch interface over an unwrapped byte stream."""

    def __init__(self, buf):
        self.raw = buf.tobytes() if isinstance(buf, np.ndarray) \
            else bytes(buf)
        self.bytes_touched = 0

    def fetch(self, lo: int, hi: int) -> bytes:
        self.bytes_touched += max(0, hi - lo)
        return self.raw[lo: hi]

    def fetch_rest(self, lo: int) -> bytes:
        self.bytes_touched += max(0, len(self.raw) - lo)
        return self.raw[lo:]


def decompress_stream(buf, codec: str = "zlib") -> bytes:
    """Inverse of :func:`compress_stream`."""
    _, decomp = CODECS[codec]
    raw = buf.tobytes() if isinstance(buf, np.ndarray) else bytes(buf)
    out = bytearray()
    pos = 0
    n = len(raw)
    while pos < n:
        header = int.from_bytes(raw[pos: pos + 3], "little")
        pos += 3
        length = header >> 1
        body = raw[pos: pos + length]
        pos += length
        if header & 1:
            out += body
        else:
            try:
                out += decomp(body)
            except Exception as e:
                raise ValueError(
                    f"stream inflate failed with codec {codec!r}: "
                    f"{e} — if this block was written by an older "
                    "engine revision (pre-v3 'mixed' stream mapping), "
                    "decode it with that revision or re-encode the "
                    "table") from e
    return bytes(out)
