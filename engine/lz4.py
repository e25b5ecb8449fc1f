"""LZ4 *block* decompression (pure Python, no dependencies).

ORC's LZ4 CompressionKind chunk-frames raw LZ4 blocks (no frame
header, no embedded content size — the 3-byte ORC chunk header bounds
the compressed bytes and ``compressionBlockSize`` bounds the
uncompressed size). The block format is public (lz4.org block spec):

    repeat:
      token        1 byte: high nibble = literal run length
                   (15 => extension bytes follow, each adds 0..255,
                   terminated by a byte != 255); low nibble =
                   match length - 4 with the same extension rule
      literals     <literal run length> bytes copied to the output
      (end of input after literals => done: the last sequence is
       literals-only and carries no match)
      offset       2 bytes little-endian, 1..65535 back-distance
      match        copy <match length> bytes from the already-decoded
                   output at <offset> back; overlapping copies repeat
                   the earlier bytes (offset=1 => RLE)

This is the read-compatibility path for real-world ORC corpora
(engine/orc_read.py); the write side deliberately emits only
zlib/snappy/zstd, whose chunk bodies are self-describing. Throughput
is secondary to coverage here — the hot decode paths stay on the
numpy codecs.
"""

from __future__ import annotations


def decompress_block(src: bytes, max_size: int | None = None) -> bytes:
    """Decode one raw LZ4 block to its exact uncompressed bytes.

    ``max_size``: optional sanity bound (ORC's compressionBlockSize);
    decoding past it raises instead of growing unboundedly on corrupt
    input.
    """
    src = bytes(src)
    n = len(src)
    out = bytearray()
    p = 0
    while p < n:
        token = src[p]
        p += 1
        # literal run
        ll = token >> 4
        if ll == 15:
            while True:
                b = src[p]
                p += 1
                ll += b
                if b != 255:
                    break
        if ll:
            if p + ll > n:
                raise ValueError("lz4: literal run past end of block")
            out += src[p:p + ll]
            p += ll
        if p >= n:
            break               # last sequence: literals only
        # match
        off = src[p] | (src[p + 1] << 8)
        p += 2
        if off == 0 or off > len(out):
            raise ValueError(f"lz4: bad match offset {off}")
        ml = (token & 15) + 4
        if (token & 15) == 15:
            while True:
                b = src[p]
                p += 1
                ml += b
                if b != 255:
                    break
        if max_size is not None and len(out) + ml > max_size:
            # bound BEFORE copying: a corrupt match length must not
            # allocate (up to 255x the chunk size) before the check
            raise ValueError("lz4: output exceeds declared block size")
        if off >= ml:
            start = len(out) - off
            out += out[start:start + ml]
        else:
            # overlapping copy: bytes become available as they are
            # written; extend by whole <off>-sized repetitions
            start = len(out) - off
            chunk = out[start:]
            reps, rem = divmod(ml, off)
            out += chunk * reps + chunk[:rem]
    return bytes(out)
