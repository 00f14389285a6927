"""Pure-Python LZ4 (block + frame format) and xxHash32, from the
published specifications.

Kafka's codec 3 wraps record sections in the LZ4 **frame** format
(magic 0x184D2204, FLG/BD descriptor, xxHash32 header checksum,
size-prefixed blocks, zero end mark); each block is the LZ4 **block**
format — token-packed literal/match sequences with 2-byte little-endian
offsets and 255-extension length bytes. xxHash32 is implemented here
too (the frame checksums require it; ~40 lines of the published
algorithm).

The compressor is a greedy 4-byte hash matcher honoring the format's
end-of-block rules (last 5 bytes literal, no match starting within the
final 12); the decompressor handles overlapping matches byte-wise as
the spec requires.
"""

from __future__ import annotations

import struct

_MAGIC = 0x184D2204
_MIN_MATCH = 4
_MASK32 = 0xFFFFFFFF


class Lz4Error(ValueError):
    pass


# ---------------------------------------------------------------------------
# xxHash32 (spec constants)
# ---------------------------------------------------------------------------

_P1, _P2, _P3, _P4, _P5 = (2654435761, 2246822519, 3266489917,
                           668265263, 374761393)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def xxhash32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _MASK32
        v2 = (seed + _P2) & _MASK32
        v3 = seed & _MASK32
        v4 = (seed - _P1) & _MASK32
        while pos + 16 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                lane = struct.unpack_from("<I", data, pos + 4 * i)[0]
                v = (v + lane * _P2) & _MASK32
                v = (_rotl(v, 13) * _P1) & _MASK32
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            pos += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _MASK32
    else:
        h = (seed + _P5) & _MASK32
    h = (h + n) & _MASK32
    while pos + 4 <= n:
        h = (h + struct.unpack_from("<I", data, pos)[0] * _P3) & _MASK32
        h = (_rotl(h, 17) * _P4) & _MASK32
        pos += 4
    while pos < n:
        h = (h + data[pos] * _P5) & _MASK32
        h = (_rotl(h, 11) * _P1) & _MASK32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _MASK32
    h ^= h >> 13
    h = (h * _P3) & _MASK32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# block format
# ---------------------------------------------------------------------------


def _emit_len(out: bytearray, n: int) -> None:
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def lz4_block_compress(data: bytes) -> bytes:
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    pos = 0
    lit_start = 0
    # format rules: the last match must not start within the final 12
    # bytes, and the last 5 bytes are always literals
    match_limit = n - 12
    while pos < match_limit:
        key = data[pos:pos + _MIN_MATCH]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand > 0xFFFF:
            pos += 1
            continue
        length = _MIN_MATCH
        max_len = n - 5 - pos
        while (length < max_len
               and data[cand + length] == data[pos + length]):
            length += 1
        lit = data[lit_start:pos]
        lit_n = len(lit)
        m_n = length - _MIN_MATCH
        out.append((min(lit_n, 15) << 4) | min(m_n, 15))
        if lit_n >= 15:
            _emit_len(out, lit_n - 15)
        out += lit
        out += (pos - cand).to_bytes(2, "little")
        if m_n >= 15:
            _emit_len(out, m_n - 15)
        pos += length
        lit_start = pos
    # final literal-only sequence
    lit = data[lit_start:]
    out.append(min(len(lit), 15) << 4)
    if len(lit) >= 15:
        _emit_len(out, len(lit) - 15)
    out += lit
    return bytes(out)


def lz4_block_decompress(data: bytes, max_size: int = 1 << 30) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_n = token >> 4
        if lit_n == 15:
            while True:
                b = data[pos]
                pos += 1
                lit_n += b
                if b != 255:
                    break
        out += data[pos:pos + lit_n]
        pos += lit_n
        if pos >= n:
            break  # final sequence carries no match
        offset = int.from_bytes(data[pos:pos + 2], "little")
        pos += 2
        if offset == 0 or offset > len(out):
            raise Lz4Error("match offset out of range")
        m_n = (token & 0x0F) + _MIN_MATCH
        if token & 0x0F == 15:
            while True:
                b = data[pos]
                pos += 1
                m_n += b
                if b != 255:
                    break
        start = len(out) - offset
        if offset >= m_n:
            out += out[start:start + m_n]
        else:
            for i in range(m_n):  # overlapping: byte-wise by spec
                out.append(out[start + i])
        if len(out) > max_size:
            raise Lz4Error("decompressed size exceeds limit")
    return bytes(out)


# ---------------------------------------------------------------------------
# frame format (what Kafka codec 3 carries)
# ---------------------------------------------------------------------------

_BLOCK_MAX = 64 * 1024  # BD byte 4 -> 64 KB blocks


def lz4_frame_compress(data: bytes) -> bytes:
    # FLG: version 01, block-independence 1, no checksums/content size
    flg = 0b0110_0000
    bd = 0x40  # 64 KB max block size
    header = bytes([flg, bd])
    hc = (xxhash32(header) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + header + bytes([hc]))
    for off in range(0, len(data), _BLOCK_MAX):
        chunk = data[off:off + _BLOCK_MAX]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp)) + comp
        else:  # incompressible: stored raw, high bit set
            out += struct.pack("<I", len(chunk) | 0x80000000) + chunk
    out += struct.pack("<I", 0)  # end mark
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    if struct.unpack_from("<I", data, 0)[0] != _MAGIC:
        raise Lz4Error("not an LZ4 frame")
    flg = data[4]
    if (flg >> 6) != 0b01:
        raise Lz4Error("unsupported LZ4 frame version")
    pos = 6  # magic + FLG + BD
    if flg & 0x08:  # content-size field present
        pos += 8
    if flg & 0x01:  # dict id
        pos += 4
    expect_hc = data[pos]
    header = data[4:pos]
    if (xxhash32(header) >> 8) & 0xFF != expect_hc:
        raise Lz4Error("frame header checksum mismatch")
    pos += 1
    block_checksums = bool(flg & 0x10)
    out = bytearray()
    while True:
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if size == 0:
            break
        raw = bool(size & 0x80000000)
        size &= 0x7FFFFFFF
        block = data[pos:pos + size]
        pos += size
        if block_checksums:
            (bc,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxhash32(block) != bc:
                raise Lz4Error("block checksum mismatch")
        out += block if raw else lz4_block_decompress(block)
    if flg & 0x04:  # content checksum
        (cc,) = struct.unpack_from("<I", data, pos)
        if xxhash32(bytes(out)) != cc:
            raise Lz4Error("content checksum mismatch")
    return bytes(out)
