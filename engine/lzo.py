"""LZO1X *block* decompression (pure Python, no dependencies).

ORC's LZO CompressionKind (orc_proto_descriptor.txt, PostScript
CompressionKind = 3) chunk-frames raw LZO1X streams — orc-core
compresses each chunk with aircompressor's LZO codec, whose output is
the standard LZO1X format. That format is public (the LZO stream
format document shipped with the Linux kernel, and the minilzo
reference sources); like LZ4 blocks it embeds no content size, but it
is self-terminating (explicit end-of-stream instruction), so chunks
decode to their exact uncompressed bytes with only ORC's
``compressionBlockSize`` as a sanity bound.

Instruction encoding (op = first byte of each instruction; ``state``
is the number of trailing literals the previous instruction copied,
0..3, or 4 meaning "previous instruction copied >= 4 literals"):

    first byte 18..255   initial literal run of (byte - 17) bytes;
                         state = min(run, 4)
    op < 16, state == 0  literal run of 3 + (op, or 15 + zero-run
                         extension when op == 0) bytes; state = 4
    op < 16, state 1..3  2-byte match, distance = (H << 2) +
                         (op >> 2) + 1 (H = next byte)
    op < 16, state == 4  3-byte match, distance = (H << 2) +
                         (op >> 2) + 2049
    op 16..31            match of 2 + (op & 7, zero-run extension
                         when 0) bytes; two LE bytes D follow:
                         distance = 16384 + ((op & 8) << 11) + (D >> 2)
                         — distance 16384 is the end-of-stream marker
    op 32..63            match of 2 + (op & 31, extension when 0)
                         bytes; distance = (D >> 2) + 1
    op 64..127           match of 3 + ((op >> 5) & 1) bytes,
                         distance = (H << 3) + ((op >> 2) & 7) + 1
    op 128..255          match of 5 + ((op >> 5) & 3) bytes,
                         distance = (H << 3) + ((op >> 2) & 7) + 1

    every match op carries S = op & 3 (or D & 3 for the two-byte-
    distance forms) trailing literals, copied after the match;
    state = S.

This is the read-compatibility path for real-world ORC corpora
(engine/orc_read.py) — verified against orc-core/aircompressor-written
files in tests/test_orc_read.py. Throughput is secondary to coverage
here; the hot decode paths stay on the numpy codecs.
"""

from __future__ import annotations


def decompress_block(src: bytes, max_size: int | None = None) -> bytes:
    """Decode one raw LZO1X stream to its exact uncompressed bytes.

    ``max_size``: optional sanity bound (ORC's compressionBlockSize);
    decoding past it raises instead of growing unboundedly on corrupt
    input.
    """
    src = bytes(src)
    n = len(src)
    out = bytearray()
    p = 0
    state = 0
    if p < n and src[p] > 17:
        t = src[p] - 17
        p += 1
        if p + t > n:
            raise ValueError("lzo: initial literal run past end")
        out += src[p:p + t]
        p += t
        state = 4 if t >= 4 else t
    while p < n:
        op = src[p]
        p += 1
        if op < 16:
            if state == 0:
                ll = op
                if ll == 0:
                    ll = 15
                    while p < n and src[p] == 0:
                        ll += 255
                        p += 1
                    if p >= n:
                        raise ValueError("lzo: bad literal extension")
                    ll += src[p]
                    p += 1
                ll += 3
                if p + ll > n:
                    raise ValueError("lzo: literal run past end")
                out += src[p:p + ll]
                p += ll
                state = 4
                continue
            if state < 4:
                dist = (src[p] << 2) + (op >> 2) + 1
                p += 1
                length = 2
            else:
                dist = (src[p] << 2) + (op >> 2) + 2049
                p += 1
                length = 3
            s = op & 3
        elif op < 64:
            lbits = 7 if op < 32 else 31
            ll = op & lbits
            if ll == 0:
                ll = lbits
                while p < n and src[p] == 0:
                    ll += 255
                    p += 1
                if p >= n:
                    raise ValueError("lzo: bad match extension")
                ll += src[p]
                p += 1
            length = ll + 2
            d = src[p] | (src[p + 1] << 8)
            p += 2
            if op < 32:
                dist = 16384 + ((op & 8) << 11) + (d >> 2)
                if dist == 16384:
                    break       # end-of-stream instruction
            else:
                dist = (d >> 2) + 1
            s = d & 3
        else:
            length = (3 + ((op >> 5) & 1)) if op < 128 \
                else (5 + ((op >> 5) & 3))
            dist = (src[p] << 3) + ((op >> 2) & 7) + 1
            p += 1
            s = op & 3
        if dist > len(out):
            raise ValueError(f"lzo: bad match distance {dist}")
        if max_size is not None and len(out) + length > max_size:
            # bound BEFORE copying: a corrupt match length must not
            # allocate (up to 255x the chunk size) before the check
            raise ValueError("lzo: output exceeds declared block size")
        start = len(out) - dist
        if dist >= length:
            out += out[start:start + length]
        else:
            # overlapping copy (dist < length): repeat the tail
            chunk = out[start:]
            reps, rem = divmod(length, dist)
            out += chunk * reps + chunk[:rem]
        if s:
            if p + s > n:
                raise ValueError("lzo: trailing literals past end")
            out += src[p:p + s]
            p += s
        state = s
        if max_size is not None and len(out) > max_size:
            raise ValueError("lzo: output exceeds declared block size")
    return bytes(out)
