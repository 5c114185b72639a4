"""Pure-Python snappy raw-block codec (decompress + minimal compress).

Implements the public Snappy format description
(https://github.com/google/snappy — ``format_description.txt``): a
little-endian-varint preamble holding the uncompressed length, then a
sequence of tagged elements — literals (tag ``00``) and back-reference
copies with 1/2/4-byte offsets (tags ``01``/``10``/``11``).  Copies may
overlap their output (offset < length ⇒ the tail repeats), which is how
snappy encodes runs.

This exists so the Avro ``snappy`` codec works without python-snappy
(the reference's InputFormat inherits snappy support from the Hadoop
Avro libraries; see ``AvroSCDInputFormat.java:60-74`` which defers all
codec handling to ``DataFileReader``).  Decompression is complete per
the spec.  Compression is intentionally minimal: one spec-valid
all-literal stream (snappy explicitly permits any literal/copy mix; an
all-literal stream costs ≤ 6 bytes overhead per block).  Any compliant
snappy decoder — including the C library — reads our output, and we
read theirs.

Per-call cost is O(n); these run inside executor decode tasks on
block-sized buffers (Avro blocks are typically ≤ 64 KiB–16 MiB), never
on the driver.
"""

from __future__ import annotations


class SnappyError(ValueError):
    pass


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise SnappyError("truncated varint preamble")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise SnappyError("varint preamble too long")


def decompress(data: bytes) -> bytes:
    """Decompress one raw snappy block (no framing/CRC — callers strip
    container-level checksums first, as Avro's 4-byte suffix)."""
    expected, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            length = tag >> 2
            if length >= 60:  # 60..63 ⇒ that many extra length bytes
                extra = length - 59
                if pos + extra > n:
                    raise SnappyError("truncated literal length")
                length = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            length += 1
            if pos + length > n:
                raise SnappyError("truncated literal body")
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset: 3-bit len, 11-bit offset
            length = ((tag >> 2) & 0x07) + 4
            if pos >= n:
                raise SnappyError("truncated copy-1 offset")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte little-endian offset
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise SnappyError("truncated copy-2 offset")
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte little-endian offset
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise SnappyError("truncated copy-4 offset")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise SnappyError(f"copy offset {offset} outside window {len(out)}")
        start = len(out) - offset
        if offset >= length:
            out += out[start : start + length]
        else:
            # overlapping copy: output repeats with period `offset`
            for i in range(length):
                out.append(out[start + i])
    if len(out) != expected:
        raise SnappyError(f"decompressed {len(out)} bytes, preamble said {expected}")
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Spec-valid all-literal encoding (see module docstring): varint
    preamble + one maximal-length literal element."""
    out = bytearray()
    # preamble: uncompressed length, LE varint
    n = len(data)
    while True:
        if n < 0x80:
            out.append(n)
            break
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    if not data:
        return bytes(out)
    length = len(data) - 1
    if length < 60:
        out.append(length << 2)
    else:
        extra = (length.bit_length() + 7) // 8
        out.append((59 + extra) << 2)
        out += length.to_bytes(extra, "little")
    out += data
    return bytes(out)
