"""Pure-Python Snappy codec (raw block format + xerial stream framing),
from the published format description.

Kafka's snappy codec wraps record sections in the *xerial* stream
framing (the Java ``SnappyOutputStream`` layout: an 8-byte magic +
version/compat words, then ``[int32 BE block length][raw snappy
block]``...), with each block in Google's raw snappy format:

* preamble: uncompressed length as a plain (non-zigzag) LEB128 varint;
* elements: a tag byte whose low 2 bits select literal / copy with
  1-, 2- or 4-byte little-endian offsets, lengths packed in the high
  bits (literals >= 60 spill their length into 1-4 trailing bytes).

The compressor is a greedy 4-byte hash matcher (the classic LZ77
shape); the decompressor handles every tag the format defines,
including overlapping copies (offset < length), which must be copied
byte-wise by definition.
"""

from __future__ import annotations

import struct

_XERIAL_MAGIC = b"\x82SNAPPY\x00"
_MIN_MATCH = 4


class SnappyError(ValueError):
    pass


# ---------------------------------------------------------------------------
# raw block format
# ---------------------------------------------------------------------------


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    n = 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _emit_literal(out: bytearray, lit: bytes) -> None:
    n = len(lit) - 1
    if n < 60:
        out.append(n << 2)
    elif n < (1 << 8):
        out.append(60 << 2)
        out.append(n)
    elif n < (1 << 16):
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < (1 << 24):
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += lit


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # prefer the compact 1-byte-offset form when it fits
    while length > 0:
        if 4 <= length <= 11 and offset < (1 << 11):
            out.append(0x01 | ((length - 4) << 2) | ((offset >> 8) << 5))
            out.append(offset & 0xFF)
            return
        chunk = min(length, 64)
        if length - chunk in (1, 2, 3):
            chunk = length - 4  # never leave a tail copy shorter than 4
        out.append(0x02 | ((chunk - 1) << 2))
        out += offset.to_bytes(2, "little")
        length -= chunk


def snappy_compress(data: bytes) -> bytes:
    """Raw snappy block: greedy hash-matched LZ77."""
    out = bytearray(_uvarint(len(data)))
    n = len(data)
    if n == 0:
        return bytes(out)
    table: dict[bytes, int] = {}
    pos = 0
    lit_start = 0
    while pos + _MIN_MATCH <= n:
        key = data[pos:pos + _MIN_MATCH]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand < (1 << 16):
            # extend the match forward
            length = _MIN_MATCH
            while (pos + length < n
                   and data[cand + length] == data[pos + length]
                   and length < 64):
                length += 1
            if lit_start < pos:
                _emit_literal(out, data[lit_start:pos])
            _emit_copy(out, pos - cand, length)
            pos += length
            lit_start = pos
        else:
            pos += 1
    if lit_start < n:
        _emit_literal(out, data[lit_start:n])
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    expected, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                length = int.from_bytes(data[pos:pos + extra],
                                        "little") + 1
                pos += extra
            out += data[pos:pos + length]
            pos += length
            continue
        if kind == 1:
            length = ((tag >> 2) & 0x07) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise SnappyError("copy offset out of range")
        start = len(out) - offset
        if offset >= length:
            out += out[start:start + length]
        else:
            # overlapping copy: byte-wise by definition (RLE-style)
            for i in range(length):
                out.append(out[start + i])
    if len(out) != expected:
        raise SnappyError(
            f"decompressed {len(out)} bytes, header claims {expected}")
    return bytes(out)


# ---------------------------------------------------------------------------
# xerial stream framing (Kafka's snappy wrapper)
# ---------------------------------------------------------------------------

_XERIAL_BLOCK = 32 * 1024


def xerial_compress(data: bytes) -> bytes:
    out = bytearray(_XERIAL_MAGIC)
    out += struct.pack(">ii", 1, 1)  # version, compat-version
    for off in range(0, len(data), _XERIAL_BLOCK):
        block = snappy_compress(data[off:off + _XERIAL_BLOCK])
        out += struct.pack(">i", len(block)) + block
    if not data:
        block = snappy_compress(b"")
        out += struct.pack(">i", len(block)) + block
    return bytes(out)


def xerial_decompress(data: bytes) -> bytes:
    if data[:8] != _XERIAL_MAGIC:
        # some producers ship RAW snappy without the xerial wrapper —
        # brokers accept both, so mirror that
        return snappy_decompress(data)
    pos = 16  # magic + version + compat
    out = bytearray()
    while pos + 4 <= len(data):
        (blen,) = struct.unpack(">i", data[pos:pos + 4])
        pos += 4
        out += snappy_decompress(data[pos:pos + blen])
        pos += blen
    return bytes(out)
