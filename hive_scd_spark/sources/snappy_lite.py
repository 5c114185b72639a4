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
the spec.  Compression is a greedy hash-table matcher (the same
structure as the C implementation): 4-byte prefix hashing, maximal
match extension, literal + back-reference emission with runs encoded
as overlapping copies.  Any compliant snappy decoder — including the C
library — reads our output, and we read theirs.

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


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    if start >= end:
        return
    length = end - start - 1
    if length < 60:
        out.append(length << 2)
    else:
        extra = (length.bit_length() + 7) // 8
        out.append((59 + extra) << 2)
        out += length.to_bytes(extra, "little")
    out += data[start:end]


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # one copy element encodes ≤ 64 bytes; chunk so every piece is in
    # [4, 64] (the standard split: peel 64s, then avoid a <4 remainder)
    while length >= 68:
        _emit_one_copy(out, offset, 64)
        length -= 64
    if length > 64:
        _emit_one_copy(out, offset, 60)
        length -= 60
    if length:
        _emit_one_copy(out, offset, length)


def _emit_one_copy(out: bytearray, offset: int, length: int) -> None:
    if 4 <= length <= 11 and offset < 2048:
        out.append(0x01 | ((length - 4) << 2) | ((offset >> 8) << 5))
        out.append(offset & 0xFF)
    elif offset < 65536:
        out.append(0x02 | ((length - 1) << 2))
        out += offset.to_bytes(2, "little")
    else:
        out.append(0x03 | ((length - 1) << 2))
        out += offset.to_bytes(4, "little")


_HASH_MUL = 0x1E35A7BD  # the C implementation's multiplicative hash constant
_MAX_TABLE_BITS = 14  # 16 K slots — memory is O(2^bits) ints, never O(n)


def compress(data: bytes) -> bytes:
    """Greedy hash-table compressor over the public format: hash every
    4-byte prefix, on a match extend it maximally, emit the pending
    literal + a back-reference copy.  Runs (offset < length) encode as
    overlapping copies, exactly like the C implementation's output
    shape.  O(n) time and — like the C implementation — O(table) memory:
    a fixed-size slot array indexed by a multiplicative hash of the
    4-byte prefix, overwritten on collision (a collision just means a
    missed match, never a wrong one — candidates are re-verified before
    emitting a copy).  At the 16 MiB Avro block bound this is ≤ 16 K
    ints, not one dict entry per input offset.  Any compliant decoder
    reads our output.  python-snappy is still preferred when importable
    (``sources/avro.py`` hooks)."""
    out = bytearray()
    n = len(data)
    v = n
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    if n < 4:
        _emit_literal(out, data, 0, n)
        return bytes(out)
    # size the table to the input (small blocks need few slots), capped
    table_bits = min(_MAX_TABLE_BITS, max(8, (n - 1).bit_length()))
    shift = 32 - table_bits
    table = [-1] * (1 << table_bits)
    i = 0
    lit_start = 0
    limit = n - 3
    while i < limit:
        u32 = int.from_bytes(data[i : i + 4], "little")
        slot = ((u32 * _HASH_MUL) & 0xFFFFFFFF) >> shift
        cand = table[slot]
        table[slot] = i
        # hash collision ⇒ cand's bytes may differ: verify before trusting
        if cand < 0 or data[cand : cand + 4] != data[i : i + 4]:
            i += 1
            continue
        # maximal extension of the verified-4-byte match
        match_len = 4
        max_len = n - i
        while match_len < max_len and data[cand + match_len] == data[i + match_len]:
            match_len += 1
        _emit_literal(out, data, lit_start, i)
        _emit_copy(out, i - cand, match_len)
        i += match_len
        lit_start = i
    _emit_literal(out, data, lit_start, n)
    return bytes(out)
