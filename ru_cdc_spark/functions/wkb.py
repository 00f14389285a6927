"""OGC Well-Known-Binary geometry codec (spec-built, no library).

MySQL stores a spatial column as 4-byte LE SRID + WKB and ships it
through the binlog as an opaque BLOB-framed value (type 255); the
reference drops the type entirely (``/root/reference/src/binlog.rs``
:159-204 matches no type 255). This module decodes the WKB payload into
typed coordinates so spatial columns are queryable downstream.

Layout per the published OGC 99-049 / ISO 19125 WKB spec:

  geometry := byte_order(u8: 0=XDR big, 1=NDR little)
              wkb_type(u32) body
  POINT(1)       := x(f64) y(f64)
  LINESTRING(2)  := n(u32) point*n        (bare coordinate pairs)
  POLYGON(3)     := n_rings(u32) ring*n; ring := n(u32) point*n
  MULTIPOINT(4) / MULTILINESTRING(5) / MULTIPOLYGON(6) /
  GEOMETRYCOLLECTION(7) := n(u32) geometry*n  (each member carries its
  OWN byte-order byte and type tag — members may even mix endianness)

Decoding is STRICT (the engine's loud-failure contract): unknown types,
truncated bodies, trailing bytes, and wrong member types inside a
typed multi-geometry all raise — a misframed geometry must never
silently misdecode.
"""

from __future__ import annotations

import math
import struct

WKB_POINT, WKB_LINESTRING, WKB_POLYGON = 1, 2, 3
WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON = 4, 5, 6
WKB_GEOMETRYCOLLECTION = 7
_TYPE_NAMES = {WKB_POINT: "POINT", WKB_LINESTRING: "LINESTRING",
               WKB_POLYGON: "POLYGON"}
_MULTI_MEMBER = {WKB_MULTIPOINT: "POINT",
                 WKB_MULTILINESTRING: "LINESTRING",
                 WKB_MULTIPOLYGON: "POLYGON"}
_MULTI_NAMES = {WKB_MULTIPOINT: "MULTIPOINT",
                WKB_MULTILINESTRING: "MULTILINESTRING",
                WKB_MULTIPOLYGON: "MULTIPOLYGON",
                WKB_GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION"}


def encode_wkb_point(x: float, y: float, little: bool = True) -> bytes:
    e = "<" if little else ">"
    return (bytes([1 if little else 0])
            + struct.pack(f"{e}I", WKB_POINT)
            + struct.pack(f"{e}dd", x, y))


def encode_wkb_linestring(points: list[tuple[float, float]],
                          little: bool = True) -> bytes:
    e = "<" if little else ">"
    out = (bytes([1 if little else 0])
           + struct.pack(f"{e}I", WKB_LINESTRING)
           + struct.pack(f"{e}I", len(points)))
    for x, y in points:
        out += struct.pack(f"{e}dd", x, y)
    return out


def encode_wkb_polygon(rings: list[list[tuple[float, float]]],
                       little: bool = True) -> bytes:
    e = "<" if little else ">"
    out = (bytes([1 if little else 0])
           + struct.pack(f"{e}I", WKB_POLYGON)
           + struct.pack(f"{e}I", len(rings)))
    for ring in rings:
        out += struct.pack(f"{e}I", len(ring))
        for x, y in ring:
            out += struct.pack(f"{e}dd", x, y)
    return out


def encode_wkb_multi(wkb_type: int, members: list[bytes],
                     little: bool = True) -> bytes:
    """Assemble a multi-geometry / collection from already-encoded
    member geometries (each member keeps its own header, per spec)."""
    e = "<" if little else ">"
    return (bytes([1 if little else 0])
            + struct.pack(f"{e}I", wkb_type)
            + struct.pack(f"{e}I", len(members))
            + b"".join(members))


def _need(data: bytes, pos: int, n: int, what: str) -> None:
    if pos + n > len(data):
        raise ValueError(
            f"truncated WKB: need {n} bytes for {what} at {pos}, "
            f"have {len(data) - pos}")


def decode_wkb(data: bytes) -> dict:
    """Strict decode -> {"type": name, "coords": ...}.

    coords is (x, y) for POINT, [(x, y), ...] for LINESTRING, and
    [[(x, y), ...], ...] (one list per ring) for POLYGON.
    Raises ValueError on unknown byte order / type, truncation, or
    trailing bytes.
    """
    geom, pos = _decode_geom(data, 0)
    if pos != len(data):
        raise ValueError(
            f"{len(data) - pos} trailing bytes after WKB geometry")
    return geom


def _decode_geom(data: bytes, pos: int) -> tuple[dict, int]:
    _need(data, pos, 5, "header")
    order = data[pos]
    if order not in (0, 1):
        raise ValueError(f"bad WKB byte order {order}")
    e = "<" if order == 1 else ">"
    wtype = struct.unpack_from(f"{e}I", data, pos + 1)[0]
    pos += 5
    if wtype == WKB_POINT:
        _need(data, pos, 16, "point")
        x, y = struct.unpack_from(f"{e}dd", data, pos)
        return {"type": "POINT", "coords": (x, y)}, pos + 16
    if wtype == WKB_LINESTRING:
        pts, pos = _decode_points(data, pos, e)
        return {"type": "LINESTRING", "coords": pts}, pos
    if wtype == WKB_POLYGON:
        _need(data, pos, 4, "ring count")
        n_rings = struct.unpack_from(f"{e}I", data, pos)[0]
        pos += 4
        rings = []
        for _ in range(n_rings):
            pts, pos = _decode_points(data, pos, e)
            rings.append(pts)
        return {"type": "POLYGON", "coords": rings}, pos
    if wtype in _MULTI_NAMES:
        _need(data, pos, 4, "member count")
        n = struct.unpack_from(f"{e}I", data, pos)[0]
        pos += 4
        members = []
        want = _MULTI_MEMBER.get(wtype)
        for k in range(n):
            member, pos = _decode_geom(data, pos)
            if want is not None and member["type"] != want:
                raise ValueError(
                    f"{_MULTI_NAMES[wtype]} member {k} is a "
                    f"{member['type']}, expected {want}")
            members.append(member)
        return {"type": _MULTI_NAMES[wtype], "coords": members}, pos
    raise ValueError(f"unsupported WKB geometry type {wtype}")


def _decode_points(data: bytes, pos: int,
                   e: str) -> tuple[list[tuple[float, float]], int]:
    _need(data, pos, 4, "point count")
    n = struct.unpack_from(f"{e}I", data, pos)[0]
    pos += 4
    _need(data, pos, 16 * n, f"{n} points")
    pts = [struct.unpack_from(f"{e}dd", data, pos + 16 * k)
           for k in range(n)]
    return pts, pos + 16 * n


def _fmt(v: float) -> str:
    if not math.isfinite(v):
        # keep the module's single failure type: a non-finite
        # coordinate is a misframed geometry, not an OverflowError
        raise ValueError(f"non-finite WKB coordinate {v!r}")
    return str(int(v)) if v == int(v) else repr(v)


def wkt(geom: dict) -> str:
    """Canonical WKT text of a decoded geometry (integral coordinates
    print without a decimal point, so arithmetic oracles can recompute
    the exact string)."""
    t = geom["type"]
    c = geom["coords"]
    if t == "POINT":
        return f"POINT({_fmt(c[0])} {_fmt(c[1])})"
    if t == "LINESTRING":
        body = ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in c)
        return f"LINESTRING({body})"
    if t == "POLYGON":
        rings = ",".join(
            "(" + ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring) + ")"
            for ring in c)
        return f"POLYGON({rings})"
    if t == "GEOMETRYCOLLECTION":
        return f"GEOMETRYCOLLECTION({','.join(wkt(m) for m in c)})"
    if t in ("MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON"):
        # canonical multi-WKT strips the member keyword and keeps each
        # member's parenthesized body
        def body(m: dict) -> str:
            w = wkt(m)
            return "(" + w[w.index("(") + 1:-1] + ")"

        return f"{t}({','.join(body(m) for m in c)})"
    raise ValueError(f"no WKT form for {t}")


def n_points(geom: dict) -> int:
    t = geom["type"]
    if t == "POINT":
        return 1
    if t == "LINESTRING":
        return len(geom["coords"])
    if t == "POLYGON":
        return sum(len(r) for r in geom["coords"])
    return sum(n_points(m) for m in geom["coords"])


def decode_mysql_geometry(value: bytes) -> tuple[int, dict]:
    """MySQL internal spatial value -> (srid, decoded WKB geometry).
    The 4-byte little-endian SRID prefix is MySQL's storage framing
    (the binlog ships it verbatim inside the BLOB frame)."""
    if len(value) < 4:
        raise ValueError("geometry value shorter than its SRID prefix")
    return int.from_bytes(value[:4], "little"), decode_wkb(value[4:])
