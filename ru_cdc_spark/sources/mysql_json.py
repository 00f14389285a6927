"""MySQL binary JSON (type 245) codec — the JSON column type the
reference cannot decode at all (SURVEY §1.2: "no JSON column type").

MySQL stores JSON columns pre-parsed in a binary tree format (public
layout, documented in the server's json_binary.h): a 1-byte type code
then the value —

    0x00 small object   0x02 small array     count,size: 2-byte LE
    0x01 large object   0x03 large array     count,size: 4-byte LE
    0x04 literal (0x00 null / 0x01 true / 0x02 false)
    0x05 int16  0x06 uint16  0x07 int32  0x08 uint32
    0x09 int64  0x0a uint64  0x0b double          (all LE)
    0x0c string: varint length (7 bits/byte, high bit = continue) + utf8

Objects/arrays hold an entry table (per key: offset + 2-byte length;
per value: 1-byte type + offset) followed by the serialized children;
SMALL-inlinable scalars (literals, int16/uint16) sit directly in the
2-byte offset slot instead of the value area. Object keys are sorted by
(length, bytes) — MySQL's canonical key order — which this encoder
reproduces, so decode order is deterministic and the DuckDB oracle can
reconstruct the exact JSON text.

On the row image, a JSON column is framed like BLOB: length-prefixed by
the TABLE_MAP's length_size meta (T_JSON in binlog_wire).

This codec implements BOTH container variants: SMALL (2-byte
count/size/offsets, 64 KB bound) and LARGE (4-byte — what a real
server stores for documents whose serialization exceeds 64 KB; the
large value slot also inlines int32/uint32). The encoder picks the
smallest format that fits, per container, exactly like the server."""

from __future__ import annotations

import json
import struct

J_SMALL_OBJECT = 0x00
J_LARGE_OBJECT = 0x01
J_SMALL_ARRAY = 0x02
J_LARGE_ARRAY = 0x03
J_LITERAL = 0x04
J_INT16 = 0x05
J_UINT16 = 0x06
J_INT32 = 0x07
J_UINT32 = 0x08
J_INT64 = 0x09
J_UINT64 = 0x0A
J_DOUBLE = 0x0B
J_STRING = 0x0C

L_NULL, L_TRUE, L_FALSE = 0x00, 0x01, 0x02


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(b: bytes, off: int) -> tuple[int, int]:
    n, shift = 0, 0
    while True:
        byte = b[off]
        off += 1
        n |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return n, off
        shift += 7


def _scalar_type(v) -> int:
    if v is None or isinstance(v, bool):
        return J_LITERAL
    if isinstance(v, int):
        if -(1 << 15) <= v < (1 << 15):
            return J_INT16
        if -(1 << 31) <= v < (1 << 31):
            return J_INT32
        if -(1 << 63) <= v < (1 << 63):
            return J_INT64
        return J_UINT64
    if isinstance(v, float):
        return J_DOUBLE
    if isinstance(v, str):
        return J_STRING
    if isinstance(v, list):
        return J_SMALL_ARRAY
    if isinstance(v, dict):
        return J_SMALL_OBJECT
    raise TypeError(f"unsupported JSON value {type(v)}")


def _encode_scalar_body(t: int, v) -> bytes:
    if t == J_LITERAL:
        return bytes([L_NULL if v is None else (L_TRUE if v else L_FALSE)])
    if t == J_INT16:
        return struct.pack("<h", v)
    if t == J_INT32:
        return struct.pack("<i", v)
    if t == J_INT64:
        return struct.pack("<q", v)
    if t == J_UINT64:
        return struct.pack("<Q", v)
    if t == J_DOUBLE:
        return struct.pack("<d", v)
    if t == J_STRING:
        data = v.encode("utf-8")
        return _varint(len(data)) + data
    raise TypeError(f"not a scalar type 0x{t:02x}")


def _encode_value(v) -> tuple[int, bytes]:
    """(type code, body) — containers pick SMALL or LARGE themselves."""
    t = _scalar_type(v)
    if t in (J_SMALL_OBJECT, J_SMALL_ARRAY):
        return _encode_container(v)
    return t, _encode_scalar_body(t, v)


# inlinable types per format: the value slot is 2 bytes in small
# containers, 4 in large — so large format also inlines int32/uint32
_INLINE_SMALL = {J_LITERAL, J_INT16, J_UINT16}
_INLINE_LARGE = _INLINE_SMALL | {J_INT32, J_UINT32}


def _encode_container(v) -> tuple[int, bytes]:
    """Object/array body: count, size, entry table, children. Emits the
    SMALL format when everything fits its 64 KB / 2-byte-offset bound,
    else the LARGE format (4-byte count/size/offsets — what a real
    server stores for big documents)."""
    is_obj = isinstance(v, dict)
    if is_obj:
        # MySQL canonical key order: by length, then bytes
        keys = sorted(v.keys(), key=lambda k: (len(k.encode()),
                                               k.encode()))
        items = [v[k] for k in keys]
    else:
        keys = []
        items = list(v)
    key_bytes = [k.encode("utf-8") for k in keys]
    encoded = [_encode_value(it) for it in items]

    def build(large: bool) -> tuple[bytes, int]:
        header = 8 if large else 4
        kentry = 6 if large else 4
        ventry = 5 if large else 3
        inline = _INLINE_LARGE if large else _INLINE_SMALL
        inline_w = 4 if large else 2
        off_fmt = "<I" if large else "<H"
        off = header + len(items) * ventry + len(key_bytes) * kentry
        key_entries = bytearray()
        key_area = bytearray()
        for kb in key_bytes:
            key_entries += struct.pack(off_fmt, off) \
                + struct.pack("<H", len(kb))
            key_area += kb
            off += len(kb)
        val_entries = bytearray()
        val_area = bytearray()
        for (t, body), it in zip(encoded, items):
            if t in inline:
                val_entries += bytes([t]) + body.ljust(inline_w, b"\x00")
            else:
                val_entries += bytes([t]) + struct.pack(off_fmt, off)
                val_area += body
                off += len(body)
        hdr = struct.pack("<II" if large else "<HH", len(items), off) \
            if off <= (0xFFFFFFFF if large else 0xFFFF) else None
        if hdr is None:
            raise ValueError("container exceeds large-format 4 GB bound")
        return (hdr + bytes(key_entries) + bytes(val_entries)
                + bytes(key_area) + bytes(val_area)), off

    small_limit = 0xFFFF
    # quick bound check before building: total payload must fit 2-byte
    # offsets AND every child offset must
    body, total = None, None
    try:
        body, total = build(False)
        if total > small_limit:
            body = None
    except struct.error:
        body = None
    if body is not None:
        return (J_SMALL_OBJECT if is_obj else J_SMALL_ARRAY), body
    body, _ = build(True)
    return (J_LARGE_OBJECT if is_obj else J_LARGE_ARRAY), body


def encode_json(v) -> bytes:
    """Python value -> full MySQL binary JSON document (type byte +
    value)."""
    t, body = _encode_value(v)
    return bytes([t]) + body


def _decode_value(t: int, b: bytes, off: int):
    if t == J_LITERAL:
        lit = b[off]
        return None if lit == L_NULL else lit == L_TRUE
    if t == J_INT16:
        return struct.unpack_from("<h", b, off)[0]
    if t == J_UINT16:
        return struct.unpack_from("<H", b, off)[0]
    if t == J_INT32:
        return struct.unpack_from("<i", b, off)[0]
    if t == J_UINT32:
        return struct.unpack_from("<I", b, off)[0]
    if t == J_INT64:
        return struct.unpack_from("<q", b, off)[0]
    if t == J_UINT64:
        return struct.unpack_from("<Q", b, off)[0]
    if t == J_DOUBLE:
        return struct.unpack_from("<d", b, off)[0]
    if t == J_STRING:
        n, p = _read_varint(b, off)
        return b[p:p + n].decode("utf-8")
    if t in (J_SMALL_OBJECT, J_SMALL_ARRAY, J_LARGE_OBJECT,
             J_LARGE_ARRAY):
        return _decode_container(t, b, off)
    raise ValueError(f"unsupported binary-JSON type 0x{t:02x}")


def _decode_container(t: int, b: bytes, base: int):
    large = t in (J_LARGE_OBJECT, J_LARGE_ARRAY)
    is_obj = t in (J_SMALL_OBJECT, J_LARGE_OBJECT)
    off_fmt = "<I" if large else "<H"
    off_w = 4 if large else 2
    inline = _INLINE_LARGE if large else _INLINE_SMALL
    count, _size = struct.unpack_from("<II" if large else "<HH", b, base)
    p = base + (8 if large else 4)
    keys = []
    if is_obj:
        for _ in range(count):
            koff = struct.unpack_from(off_fmt, b, p)[0]
            klen = struct.unpack_from("<H", b, p + off_w)[0]
            keys.append(b[base + koff:base + koff + klen].decode("utf-8"))
            p += off_w + 2
    vals = []
    for _ in range(count):
        vt = b[p]
        if vt in inline:
            vals.append(_decode_value(vt, b, p + 1))
        else:
            voff = struct.unpack_from(off_fmt, b, p + 1)[0]
            vals.append(_decode_value(vt, b, base + voff))
        p += 1 + off_w
    return dict(zip(keys, vals)) if is_obj else vals


def decode_json(b: bytes):
    """Full binary JSON document -> Python value."""
    return _decode_value(b[0], b, 1)


def decode_json_text(b: bytes) -> str:
    """-> compact JSON text, keys in stored (MySQL-canonical) order —
    the deterministic string a SQL oracle can reconstruct."""
    return json.dumps(decode_json(b), separators=(",", ":"))
