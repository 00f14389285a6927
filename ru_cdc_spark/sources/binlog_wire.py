"""MySQL binlog wire codec: byte-level event encode/decode (binlog v4).

This is the engine's real-parity counterpart of the reference's decoder
stack (/root/reference/src/binlog.rs — EventHeader D1, TableMapEvent D4/D5,
Write/Update/DeleteRows D6-D9, per-column value decoders D10 + F1-F6),
implemented independently from the PUBLIC binlog format documentation
(MySQL internals manual, binary-log-event layouts). Events here are in
binlog FILE format — the reference reads the network form, which prefixes
each packet with an OK byte (src/binlog.rs:526-544 skips it); everything
after that byte is identical.

Wire features covered:

* event header: timestamp u32, type u8, server_id u32, event_size u32,
  log_pos u32, flags u16 (19 bytes, LE)
* TABLE_MAP (type 19): 6-byte table_id, schema/table names, column-type
  array, per-type metadata block, nullability bitmap. NOTE: the binlog
  carries NO column names — they come from the catalog (``DESC`` in the
  reference, executor.rs:404-443; a name list parameter here).
* WRITE/UPDATE/DELETE_ROWS v2 (types 30/31/32): post-header + extra-data,
  present-column bitmaps, per-image NULL bitmap, multi-row payloads
  (D7's loop-until-checksum), UPDATE before/after image pairs.
* column codecs: TINY/SHORT/INT24/LONG/LONGLONG (signed LE),
  FLOAT/DOUBLE (IEEE LE), NEWDECIMAL (packed base-10^9 groups, sign-bit
  XOR, negative = bitwise complement — F1), DATE (day|month<<5|year<<9
  bitfield, zero date -> NULL — F2), TIME2 (offset-binary 3-byte packed
  +fsp, negative times — F3), DATETIME2 (5-byte BE + 0x8000000000 offset,
  year*13+month packing, fsp — F4), TIMESTAMP2 (BE epoch + fsp — F5/F6),
  YEAR (1900+u8), VARCHAR/CHAR (1- or 2-byte length prefix by max_length,
  the reference's prefix-width rule binlog.rs:311-321), BLOB/TEXT
  (length_size-prefixed).

Deviation from the reference (documented, deliberate): TINY/SHORT/INT24
decode SIGNED — the reference drops the sign (SURVEY §1.2 notes the
lossy u8/u16 reads); MySQL's signed column types are signed on the wire.

Beyond the reference's 16 types (SURVEY §1.2 lists ENUM/SET/BIT as
unsupported there): ENUM and SET ride the wire as STRING with their real
type in TABLE_MAP meta byte 0 and decode to the 1-based index / member
bitmask (label resolution is the catalog's job, like column names); BIT
carries its width split across two meta bytes (bits%8, bits//8) and its
value big-endian — all per the public binary-log-event layouts.

Scale shape: frames (one TABLE_MAP + one ROWS event, the reference's
RowEvents pairing, executor.rs:33-48) are opaque ``binary`` cells in a
DataFrame; decoding runs inside ``mapInPandas`` — Arrow-batched, pure
narrow map, parallel across partitions, no shuffle. At 100 TB of binlog
the decode scales with scan bandwidth exactly like every other narrow
operator in the engine.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from datetime import date, datetime, timedelta
from decimal import Decimal

# binlog event type codes (public)
QUERY_EVENT = 2
XID_EVENT = 16
TABLE_MAP_EVENT = 19
WRITE_ROWS_V2 = 30
UPDATE_ROWS_V2 = 31
DELETE_ROWS_V2 = 32
# MySQL 8 binlog_row_value_options=PARTIAL_JSON: UPDATE events where
# JSON columns may carry diffs against the before-image instead of full
# values (decoded here; the reference treats JSON as opaque blobs and
# has no type-39 handling, binlog.rs:322-329)
PARTIAL_UPDATE_ROWS_EVENT = 39
ROTATE_EVENT = 4
FORMAT_DESCRIPTION_EVENT = 15
HEARTBEAT_EVENT = 27
ROWS_QUERY_EVENT = 29
GTID_EVENT = 33

# MySQL column type codes (public; reference binlog.rs:159-204)
T_TINY, T_SHORT, T_LONG, T_FLOAT, T_DOUBLE = 1, 2, 3, 4, 5
T_TIMESTAMP = 7   # pre-5.6.4 TIMESTAMP: 4-byte LE unix seconds
T_LONGLONG, T_INT24, T_DATE = 8, 9, 10
T_TIME = 11       # pre-5.6.4 TIME: 3-byte LE signed packed hhmmss
T_DATETIME = 12   # pre-5.6.4 DATETIME: 8-byte LE packed YYYYMMDDhhmmss
T_YEAR = 13
T_VARCHAR = 15
T_BIT = 16
T_TIMESTAMP2, T_DATETIME2, T_TIME2 = 17, 18, 19
T_JSON = 245   # binary JSON document, BLOB-framed (sources/mysql_json.py)
T_NEWDECIMAL = 246
T_ENUM = 247   # wire: appears as T_STRING with real type in meta byte 0
T_SET = 248    # wire: same packing as ENUM
T_BLOB = 252
T_STRING = 254
T_GEOMETRY = 255  # BLOB-framed 4-byte-LE-SRID-prefixed WKB, passthrough

# bytes needed to store 0..9 leftover decimal digits (public dig2bytes)
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]

# WL#4618 optional TABLE_MAP metadata field type codes (public:
# libbinlogevents rows_event.h Table_map_event::Optional_metadata_field_type)
TM_SIGNEDNESS = 1
TM_DEFAULT_CHARSET = 2
TM_COLUMN_CHARSET = 3
TM_COLUMN_NAME = 4
TM_SET_STR_VALUE = 5
TM_ENUM_STR_VALUE = 6
TM_GEOMETRY_TYPE = 7
TM_SIMPLE_PRIMARY_KEY = 8
TM_PRIMARY_KEY_WITH_PREFIX = 9
TM_ENUM_AND_SET_DEFAULT_CHARSET = 10
TM_ENUM_AND_SET_COLUMN_CHARSET = 11
TM_COLUMN_VISIBILITY = 12
_TM_MAX = 12

# the types whose SIGNEDNESS bits exist in the WL#4618 bitmap (public:
# libbinlogevents rows_event.cpp is_numeric_type) — one bit per column
# of these types, in column order, MSB-first within each byte
_NUMERIC_TYPES = (T_TINY, T_SHORT, T_INT24, T_LONG, T_LONGLONG,
                  T_NEWDECIMAL, T_FLOAT, T_DOUBLE)


@dataclass(frozen=True)
class ColSpec:
    """One column's wire spec: type code + metadata the TABLE_MAP carries.

    meta meaning per type: NEWDECIMAL -> (precision, scale);
    VARCHAR/STRING -> max_length; BLOB/GEOMETRY -> length_size;
    TIME2/DATETIME2/TIMESTAMP2 -> fsp; others -> ().

    ``unsigned`` and ``labels`` come from the WL#4618 optional TABLE_MAP
    metadata when a MySQL 8 server runs binlog_row_metadata=FULL:
    unsigned integer columns then decode wire-side without any catalog
    DESC round-trip, and ENUM/SET values resolve to their string labels
    (1-based member for ENUM, comma-joined bitmask members for SET).
    Absent metadata leaves the classic behavior (signed decode + integer
    index, catalog-driven reinterpretation downstream).
    """

    type_code: int
    meta: tuple = ()
    unsigned: bool = False
    labels: tuple = ()


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def write_lenenc(n: int) -> bytes:
    if n < 251:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + n.to_bytes(2, "little")
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + n.to_bytes(8, "little")


def read_lenenc(b: bytes, off: int) -> tuple[int, int]:
    first = b[off]
    if first < 251:
        return first, off + 1
    if first == 0xFC:
        return int.from_bytes(b[off + 1:off + 3], "little"), off + 3
    if first == 0xFD:
        return int.from_bytes(b[off + 1:off + 4], "little"), off + 4
    return int.from_bytes(b[off + 1:off + 9], "little"), off + 9


def _frac_bytes(fsp: int) -> int:
    return (fsp + 1) // 2


def _frac_to_micros(raw: int, fsp: int) -> int:
    # stored unit is 10^-(2*ceil(fsp/2)) seconds; scale up to microseconds
    return raw * 10 ** (6 - 2 * _frac_bytes(fsp))


def _micros_to_frac(micros: int, fsp: int) -> int:
    return micros // 10 ** (6 - 2 * _frac_bytes(fsp))


# ---------------------------------------------------------------------------
# NEWDECIMAL (F1): packed base-10^9, sign-bit XOR, negative = complement
# ---------------------------------------------------------------------------


import decimal as _decimal

# the DEFAULT decimal context has 28 significant digits — arithmetic ops
# (scaleb, to_integral_value, unary minus) under it silently ROUND a
# DECIMAL(29+) value. MySQL's max DECIMAL precision is 65; one shared
# wide context passed explicitly to each op is exact for every legal
# column and avoids a per-value localcontext push/pop (measured ~25% of
# the txn-assembly decode budget before hoisting).
_WIDE_CTX = _decimal.Context(prec=70)


def encode_decimal(value: Decimal, precision: int, scale: int) -> bytes:
    sign = 1 if value >= 0 else -1
    # copy_abs (not abs): abs() is ARITHMETIC and rounds 29+-digit
    # values under whatever context is current; copy_abs is exact
    q = value.copy_abs().scaleb(scale, _WIDE_CTX).to_integral_value(
        context=_WIDE_CTX)
    digits = f"{int(q):0{precision}d}"
    if len(digits) > precision:
        raise ValueError(
            f"value {value} does not fit DECIMAL({precision},{scale})")
    intg_digits, frac_digits = digits[: precision - scale], digits[precision - scale:]

    out = bytearray()

    def pack_side(ds: str, leading: bool) -> None:
        extra = len(ds) % 9
        groups = []
        if leading:
            if extra:
                groups.append((ds[:extra], _DIG2BYTES[extra]))
            for i in range(extra, len(ds), 9):
                groups.append((ds[i:i + 9], 4))
        else:
            for i in range(0, len(ds) - extra, 9):
                groups.append((ds[i:i + 9], 4))
            if extra:
                groups.append((ds[len(ds) - extra:], _DIG2BYTES[extra]))
        for g, nb in groups:
            out.extend(int(g or "0").to_bytes(nb, "big"))

    pack_side(intg_digits, leading=True)
    pack_side(frac_digits, leading=False)
    out[0] ^= 0x80
    if sign < 0:
        out = bytearray(~b & 0xFF for b in out)
    return bytes(out)


def _decimal_layout(precision: int, scale: int) -> tuple[int, tuple]:
    """Precomputed unpack plan for DECIMAL(precision, scale): total packed
    byte length plus, per base-10^9 group, (bit shift into the packed big
    int, group mask, 10^digits multiplier). Lets the per-value decode be
    pure int arithmetic — one ``int.from_bytes`` over the whole field,
    then shift/mask/accumulate — instead of per-group slicing and string
    formatting (the old path; ~23% of txn-assembly CPU)."""
    intg = precision - scale
    groups: list[tuple[int, int]] = []  # (nbytes, ndigits)
    extra = intg % 9
    if extra:
        groups.append((_DIG2BYTES[extra], extra))
    groups.extend([(4, 9)] * (intg // 9))
    groups.extend([(4, 9)] * (scale // 9))
    extra = scale % 9
    if extra:
        groups.append((_DIG2BYTES[extra], extra))
    nbytes = sum(nb for nb, _ in groups)
    plan = []
    rem = nbytes
    for nb, nd in groups:
        rem -= nb
        plan.append((rem * 8, (1 << (nb * 8)) - 1, 10 ** nd))
    return nbytes, tuple(plan)


_DECIMAL_LAYOUTS: dict[tuple[int, int], tuple[int, tuple]] = {}


def decode_decimal(b: bytes, off: int, precision: int, scale: int
                   ) -> tuple[Decimal, int]:
    layout = _DECIMAL_LAYOUTS.get((precision, scale))
    if layout is None:
        layout = _DECIMAL_LAYOUTS[(precision, scale)] = _decimal_layout(
            precision, scale)
    nbytes, plan = layout
    big = int.from_bytes(b[off:off + nbytes], "big")
    top = 0x80 << ((nbytes - 1) * 8)
    negative = not (big & top)
    if negative:
        big ^= (1 << (nbytes * 8)) - 1
    big ^= top
    v = 0
    for shift, mask, mult in plan:
        v = v * mult + ((big >> shift) & mask)
    # Decimal(int) construction is context-exact for any width; scaleb
    # under the shared wide context is exact for every legal MySQL
    # precision (<= 65 digits) — no string round-trip, no localcontext
    val = Decimal(-v if negative else v).scaleb(-scale, _WIDE_CTX)
    return val, off + nbytes


# ---------------------------------------------------------------------------
# temporal codecs (F2-F6)
# ---------------------------------------------------------------------------


# sentinel for MySQL's zero date '0000-00-00' — a PRESENT value on the
# wire (all bits zero), decoded to NULL (F2); distinct from bitmap-NULL
ZERO_DATE = "0000-00-00"


def encode_date(d) -> bytes:
    # zero date (F2): all bits zero
    v = 0 if (d is None or d == ZERO_DATE) else (
        d.day | (d.month << 5) | (d.year << 9))
    return v.to_bytes(3, "little")


def decode_date(b: bytes, off: int) -> tuple[date | None, int]:
    v = int.from_bytes(b[off:off + 3], "little")
    if v == 0:
        return None, off + 3
    return date(v >> 9, (v >> 5) & 0x0F, v & 0x1F), off + 3


def encode_time2(total_micros: int, fsp: int) -> bytes:
    """TIME2: 3-byte offset-binary packed h/m/s + fsp frac (BE).

    Negative times with a fractional part use the full-word complement
    form; this codec supports negative whole-second times (frac == 0),
    which is the reference's tested negative path (F3).
    """
    neg = total_micros < 0
    a = abs(total_micros)
    secs, micros = divmod(a, 1_000_000)
    if neg and micros:
        raise ValueError("negative TIME with fractional part not supported")
    h, rem = divmod(secs, 3600)
    m, s = divmod(rem, 60)
    packed = (h << 12) | (m << 6) | s
    word = 0x800000 + (-packed if neg else packed)
    out = word.to_bytes(3, "big")
    if fsp:
        out += _micros_to_frac(micros, fsp).to_bytes(_frac_bytes(fsp), "big")
    return out


def decode_time2(b: bytes, off: int, fsp: int) -> tuple[int, int]:
    word = int.from_bytes(b[off:off + 3], "big")
    off += 3
    signed = word - 0x800000
    neg = signed < 0
    packed = -signed if neg else signed
    h, m, s = packed >> 12, (packed >> 6) & 0x3F, packed & 0x3F
    micros = 0
    if fsp:
        nb = _frac_bytes(fsp)
        micros = _frac_to_micros(int.from_bytes(b[off:off + nb], "big"), fsp)
        off += nb
    total = (h * 3600 + m * 60 + s) * 1_000_000 + micros
    return (-total if neg else total), off


def encode_datetime2(dt: datetime, fsp: int) -> bytes:
    ym = dt.year * 13 + dt.month
    packed = (((ym << 5) | dt.day) << 17) | (dt.hour << 12) | (dt.minute << 6) | dt.second
    out = (packed + 0x8000000000).to_bytes(5, "big")
    if fsp:
        out += _micros_to_frac(dt.microsecond, fsp).to_bytes(_frac_bytes(fsp), "big")
    return out


def decode_datetime2(b: bytes, off: int, fsp: int) -> tuple[datetime, int]:
    packed = int.from_bytes(b[off:off + 5], "big") - 0x8000000000
    off += 5
    second = packed & 0x3F
    minute = (packed >> 6) & 0x3F
    hour = (packed >> 12) & 0x1F
    ymd = packed >> 17
    day = ymd & 0x1F
    ym = ymd >> 5
    micros = 0
    if fsp:
        nb = _frac_bytes(fsp)
        micros = _frac_to_micros(int.from_bytes(b[off:off + nb], "big"), fsp)
        off += nb
    return datetime(ym // 13, ym % 13, day, hour, minute, second, micros), off


def encode_timestamp2(epoch_micros: int, fsp: int) -> bytes:
    secs, micros = divmod(epoch_micros, 1_000_000)
    out = secs.to_bytes(4, "big")
    if fsp:
        out += _micros_to_frac(micros, fsp).to_bytes(_frac_bytes(fsp), "big")
    return out


def decode_timestamp2(b: bytes, off: int, fsp: int) -> tuple[int, int]:
    secs = int.from_bytes(b[off:off + 4], "big")
    off += 4
    micros = 0
    if fsp:
        nb = _frac_bytes(fsp)
        micros = _frac_to_micros(int.from_bytes(b[off:off + nb], "big"), fsp)
        off += nb
    return secs * 1_000_000 + micros, off


# -- pre-5.6.4 temporal wire formats (public: MySQL source
# sql-common/my_time.cc TIME_to_ulonglong_* / field.cc Field_timestamp)
# — captures from old servers still carry these type codes -----------------


def encode_timestamp_legacy(epoch_micros: int) -> bytes:
    """Type 7: 4-byte little-endian unix seconds (no fractional part in
    the old format; sub-second input truncates like the old server)."""
    return (epoch_micros // 1_000_000).to_bytes(4, "little")


def decode_timestamp_legacy(b: bytes, off: int) -> tuple[int, int]:
    # epoch micros, matching decode_timestamp2's unit contract
    return int.from_bytes(b[off:off + 4], "little") * 1_000_000, off + 4


def encode_time_legacy(total_micros: int) -> bytes:
    """Type 11: 3-byte little-endian SIGNED packed decimal hhmmss
    (h*10000 + m*100 + s); no fractional part in the old format."""
    neg = total_micros < 0
    secs = abs(total_micros) // 1_000_000
    h, rem = divmod(secs, 3600)
    m, s = divmod(rem, 60)
    packed = h * 10000 + m * 100 + s
    return (-packed if neg else packed).to_bytes(3, "little", signed=True)


def decode_time_legacy(b: bytes, off: int) -> tuple[int, int]:
    # total micros (signed), matching decode_time2's unit contract
    packed = int.from_bytes(b[off:off + 3], "little", signed=True)
    neg = packed < 0
    a = -packed if neg else packed
    h, rem = divmod(a, 10000)
    m, s = divmod(rem, 100)
    total = (h * 3600 + m * 60 + s) * 1_000_000
    return (-total if neg else total), off + 3


def encode_datetime_legacy(dt: datetime | None) -> bytes:
    """Type 12: 8-byte little-endian packed decimal YYYYMMDDhhmmss;
    the all-zero value is the old zero-date."""
    if dt is None:
        return (0).to_bytes(8, "little")
    packed = ((dt.year * 10000 + dt.month * 100 + dt.day) * 1_000_000
              + dt.hour * 10000 + dt.minute * 100 + dt.second)
    return packed.to_bytes(8, "little")


def decode_datetime_legacy(b: bytes, off: int) -> tuple[datetime | None,
                                                        int]:
    packed = int.from_bytes(b[off:off + 8], "little")
    off += 8
    if packed == 0:
        return None, off  # zero-date -> NULL (F2 semantics)
    d, t = divmod(packed, 1_000_000)
    return datetime(d // 10000, d // 100 % 100, d % 100,
                    t // 10000, t // 100 % 100, t % 100), off


# ---------------------------------------------------------------------------
# column value encode/decode dispatch (D10)
# ---------------------------------------------------------------------------


def _int_bytes(v, w: int, spec: ColSpec) -> bytes:
    return int(v).to_bytes(w, "little", signed=not spec.unsigned)


def encode_value(v, spec: ColSpec) -> bytes:
    t = spec.type_code
    if t == T_TINY:
        return _int_bytes(v, 1, spec)
    if t == T_SHORT:
        return _int_bytes(v, 2, spec)
    if t == T_INT24:
        return _int_bytes(v, 3, spec)
    if t == T_LONG:
        return _int_bytes(v, 4, spec)
    if t == T_LONGLONG:
        return _int_bytes(v, 8, spec)
    if t == T_FLOAT:
        return struct.pack("<f", v)
    if t == T_DOUBLE:
        return struct.pack("<d", v)
    if t == T_NEWDECIMAL:
        return encode_decimal(v, *spec.meta)
    if t == T_DATE:
        return encode_date(v)
    if t == T_TIME2:
        return encode_time2(v, spec.meta[0])
    if t == T_DATETIME2:
        return encode_datetime2(v, spec.meta[0])
    if t == T_TIMESTAMP2:
        return encode_timestamp2(v, spec.meta[0])
    if t == T_YEAR:
        return bytes([int(v) - 1900])
    if t in (T_VARCHAR, T_STRING):
        data = v.encode("utf-8")
        width = 2 if spec.meta[0] > 255 else 1  # prefix-width rule (F)
        return len(data).to_bytes(width, "little") + data
    if t == T_BLOB:
        data = v if isinstance(v, bytes) else v.encode("utf-8")
        return len(data).to_bytes(spec.meta[0], "little") + data
    if t == T_JSON:
        from ru_cdc_spark.sources.mysql_json import encode_json

        data = encode_json(v)
        return len(data).to_bytes(spec.meta[0], "little") + data
    if t == T_ENUM:
        return int(v).to_bytes(spec.meta[0], "little")  # 1-based index
    if t == T_SET:
        return int(v).to_bytes(spec.meta[0], "little")  # member bitmask
    if t == T_BIT:
        return int(v).to_bytes((spec.meta[0] + 7) // 8, "big")  # BE!
    if t == T_TIMESTAMP:
        return encode_timestamp_legacy(v)
    if t == T_TIME:
        return encode_time_legacy(v)
    if t == T_DATETIME:
        return encode_datetime_legacy(v)
    if t == T_GEOMETRY:
        # SRID-prefixed WKB bytes, BLOB-framed: surfaced as-is
        data = bytes(v)
        return len(data).to_bytes(spec.meta[0], "little") + data
    raise ValueError(f"unsupported type code {t}")


def decode_value(b: bytes, off: int, spec: ColSpec):
    t = spec.type_code
    sgn = not spec.unsigned  # WL#4618 SIGNEDNESS, default signed
    if t == T_TINY:
        return int.from_bytes(b[off:off + 1], "little", signed=sgn), off + 1
    if t == T_SHORT:
        return int.from_bytes(b[off:off + 2], "little", signed=sgn), off + 2
    if t == T_INT24:
        return int.from_bytes(b[off:off + 3], "little", signed=sgn), off + 3
    if t == T_LONG:
        return int.from_bytes(b[off:off + 4], "little", signed=sgn), off + 4
    if t == T_LONGLONG:
        return int.from_bytes(b[off:off + 8], "little", signed=sgn), off + 8
    if t == T_FLOAT:
        return struct.unpack("<f", b[off:off + 4])[0], off + 4
    if t == T_DOUBLE:
        return struct.unpack("<d", b[off:off + 8])[0], off + 8
    if t == T_NEWDECIMAL:
        return decode_decimal(b, off, *spec.meta)
    if t == T_DATE:
        return decode_date(b, off)
    if t == T_TIME2:
        return decode_time2(b, off, spec.meta[0])
    if t == T_DATETIME2:
        return decode_datetime2(b, off, spec.meta[0])
    if t == T_TIMESTAMP2:
        return decode_timestamp2(b, off, spec.meta[0])
    if t == T_YEAR:
        return 1900 + b[off], off + 1
    if t in (T_VARCHAR, T_STRING):
        width = 2 if spec.meta[0] > 255 else 1
        n = int.from_bytes(b[off:off + width], "little")
        off += width
        return b[off:off + n].decode("utf-8"), off + n
    if t == T_BLOB:
        ls = spec.meta[0]
        n = int.from_bytes(b[off:off + ls], "little")
        off += ls
        return b[off:off + n].decode("utf-8"), off + n
    if t == T_JSON:
        from ru_cdc_spark.sources.mysql_json import decode_json_text

        ls = spec.meta[0]
        n = int.from_bytes(b[off:off + ls], "little")
        off += ls
        return decode_json_text(b[off:off + n]), off + n
    if t in (T_ENUM, T_SET):
        w = spec.meta[0]
        v = int.from_bytes(b[off:off + w], "little")
        return _enum_set_value(t, v, spec.labels), off + w
    if t == T_BIT:
        w = (spec.meta[0] + 7) // 8
        return int.from_bytes(b[off:off + w], "big"), off + w
    if t == T_TIMESTAMP:
        return decode_timestamp_legacy(b, off)
    if t == T_TIME:
        return decode_time_legacy(b, off)
    if t == T_DATETIME:
        return decode_datetime_legacy(b, off)
    if t == T_GEOMETRY:
        # passthrough: raw 4-byte-LE-SRID + WKB bytes (spatial decode is
        # downstream's concern; the log's job is lossless capture)
        ls = spec.meta[0]
        n = int.from_bytes(b[off:off + ls], "little")
        off += ls
        return bytes(b[off:off + n]), off + n
    raise ValueError(f"unsupported type code {t}")


def _enum_set_value(t: int, v: int, labels: tuple):
    """ENUM/SET wire value -> string label(s) when WL#4618 metadata
    supplied them, else the raw integer (classic behavior). ENUM 0 is
    MySQL's invalid-value empty string; SET joins set bits in member
    order."""
    if not labels:
        return v
    if t == T_ENUM:
        return labels[v - 1] if 1 <= v <= len(labels) else ""
    return ",".join(lab for i, lab in enumerate(labels) if v >> i & 1)


# ---------------------------------------------------------------------------
# events (D1, D4-D9)
# ---------------------------------------------------------------------------


def _header(event_type: int, payload_len: int, timestamp: int = 0,
            server_id: int = 1, log_pos: int = 0) -> bytes:
    size = 19 + payload_len
    return struct.pack("<IBIIIH", timestamp, event_type, server_id, size,
                       log_pos, 0)


def _type_meta_bytes(spec: ColSpec) -> bytes:
    t = spec.type_code
    if t == T_FLOAT:
        return bytes([4])
    if t == T_DOUBLE:
        return bytes([8])
    if t == T_NEWDECIMAL:
        return bytes([spec.meta[0], spec.meta[1]])
    if t == T_VARCHAR:
        return spec.meta[0].to_bytes(2, "little")
    if t == T_STRING:
        # real TABLE_MAP packing for CHAR: byte0 = real type with the
        # length's high bits folded into (inverted) bits 4-5, byte1 = low
        # length byte (MySQL's if ((m0 & 0x30) != 0x30) length extension)
        length = spec.meta[0]
        m0 = T_STRING ^ ((length >> 4) & 0x30)
        return bytes([m0, length & 0xFF])
    if t in (T_BLOB, T_JSON, T_GEOMETRY):
        return bytes([spec.meta[0]])
    if t in (T_TIME2, T_DATETIME2, T_TIMESTAMP2):
        return bytes([spec.meta[0]])
    if t in (T_ENUM, T_SET):
        # real packing: the type array says STRING; meta byte0 carries the
        # REAL type (247/248), byte1 the value's packed byte width
        return bytes([t, spec.meta[0]])
    if t == T_BIT:
        bits = spec.meta[0]
        return bytes([bits % 8, bits // 8])
    return b""


def encode_table_map(table_id: int, schema: str, table: str,
                     specs: list[ColSpec], log_pos: int = 0, *,
                     full_metadata: bool = False,
                     column_names: list[str] | None = None,
                     primary_key: list[int] | None = None) -> bytes:
    """TABLE_MAP event. With ``full_metadata`` the WL#4618 optional
    TLV block follows the nullability bitmap, carrying SIGNEDNESS (from
    each spec's ``unsigned``), COLUMN_NAME, ENUM/SET_STR_VALUE (from
    ``labels``) and SIMPLE_PRIMARY_KEY — what a MySQL 8 server with
    binlog_row_metadata=FULL writes."""
    p = bytearray()
    p += table_id.to_bytes(6, "little") + b"\x01\x00"  # table_id + flags
    sb, tb = schema.encode(), table.encode()
    p += bytes([len(sb)]) + sb + b"\x00"
    p += bytes([len(tb)]) + tb + b"\x00"
    p += write_lenenc(len(specs))
    # ENUM/SET ride the wire as STRING; their real type lives in the meta
    p += bytes(T_STRING if s.type_code in (T_ENUM, T_SET) else s.type_code
               for s in specs)
    meta = b"".join(_type_meta_bytes(s) for s in specs)
    p += write_lenenc(len(meta)) + meta
    # nullability bitmap: every column nullable (partial final byte)
    p += bytes((1 << min(8, len(specs) - 8 * i)) - 1
               for i in range((len(specs) + 7) // 8))
    if full_metadata:
        p += _encode_optional_metadata(specs, column_names, primary_key)
    return _header(TABLE_MAP_EVENT, len(p), log_pos=log_pos) + bytes(p)


def decode_table_map(b: bytes) -> tuple[int, str, str, list[ColSpec]]:
    """Classic 4-tuple view; specs are already enriched with WL#4618
    signedness/labels when the event carries the FULL metadata block."""
    table_id, schema, table, specs, _ = decode_table_map_ext(b)
    return table_id, schema, table, specs


def decode_table_map_metadata(b: bytes) -> dict:
    """Just the WL#4618 optional-metadata dict of a TABLE_MAP event:
    column_names, primary_key, signedness, enum/set labels, visibility
    — {} when the server didn't write the block."""
    return decode_table_map_ext(b)[4]


def decode_table_map_ext(b: bytes) -> tuple[int, str, str, list[ColSpec],
                                            dict]:
    if b[4] != TABLE_MAP_EVENT:
        raise ValueError(f"not a TABLE_MAP event (type {b[4]})")
    off = 19
    table_id = int.from_bytes(b[off:off + 6], "little")
    off += 8  # table_id + flags
    n = b[off]
    schema = b[off + 1:off + 1 + n].decode()
    off += 1 + n + 1
    n = b[off]
    table = b[off + 1:off + 1 + n].decode()
    off += 1 + n + 1
    ncols, off = read_lenenc(b, off)
    type_codes = list(b[off:off + ncols])
    off += ncols
    meta_len, off = read_lenenc(b, off)
    meta = b[off:off + meta_len]
    off += meta_len
    specs: list[ColSpec] = []
    mp = 0
    for t in type_codes:
        if t == T_FLOAT:
            specs.append(ColSpec(t, ()))
            mp += 1
        elif t == T_DOUBLE:
            specs.append(ColSpec(t, ()))
            mp += 1
        elif t == T_NEWDECIMAL:
            specs.append(ColSpec(t, (meta[mp], meta[mp + 1])))
            mp += 2
        elif t == T_VARCHAR:
            specs.append(ColSpec(t, (int.from_bytes(meta[mp:mp + 2], "little"),)))
            mp += 2
        elif t == T_STRING:
            m0, m1 = meta[mp], meta[mp + 1]
            if m0 in (T_ENUM, T_SET):
                # meta byte0 carries the REAL type for ENUM/SET columns
                specs.append(ColSpec(m0, (m1,)))
            elif (m0 & 0x30) != 0x30:
                # inverse of the CHAR packing above: high length bits
                # live (inverted) in bits 4-5 of byte 0
                specs.append(ColSpec(t, (m1 | (((m0 & 0x30) ^ 0x30) << 4),)))
            else:
                specs.append(ColSpec(t, (m1,)))
            mp += 2
        elif t == T_BIT:
            m0, m1 = meta[mp], meta[mp + 1]
            specs.append(ColSpec(t, (m1 * 8 + m0,)))
            mp += 2
        elif t in (T_BLOB, T_JSON, T_GEOMETRY):
            specs.append(ColSpec(t, (meta[mp],)))
            mp += 1
        elif t in (T_TIME2, T_DATETIME2, T_TIMESTAMP2):
            specs.append(ColSpec(t, (meta[mp],)))
            mp += 1
        else:
            specs.append(ColSpec(t, ()))
    # nullability bitmap, then (MySQL 8, binlog_row_metadata) the
    # WL#4618 optional-metadata TLV block
    off += (ncols + 7) // 8
    tm_meta = _decode_optional_metadata(b, off, specs)
    if tm_meta.get("signedness") or tm_meta.get("enum_labels") \
            or tm_meta.get("set_labels"):
        specs = _apply_optional_metadata(specs, tm_meta)
    return table_id, schema, table, specs, tm_meta


def _decode_optional_metadata(b: bytes, off: int,
                              specs: list[ColSpec]) -> dict:
    """Parse the WL#4618 TLV block that binlog_row_metadata=MINIMAL/FULL
    servers append after the nullability bitmap (public layout:
    libbinlogevents rows_event.h, 1-byte field type + lenenc length +
    value). Unknown-but-valid field types are skipped by length — the
    forward-compatibility contract the format was designed for. Parsing
    stops at the first byte that cannot open a well-formed field, which
    also tolerates a stray checksum trailer on events an upstream layer
    forgot to strip."""
    out: dict = {}
    numeric_idx = [i for i, s in enumerate(specs)
                   if s.type_code in _NUMERIC_TYPES]
    enum_idx = [i for i, s in enumerate(specs) if s.type_code == T_ENUM]
    set_idx = [i for i, s in enumerate(specs) if s.type_code == T_SET]
    while off + 2 <= len(b):
        ftype = b[off]
        if ftype == 0 or ftype > _TM_MAX:
            break
        try:
            flen, voff = read_lenenc(b, off + 1)
        except (IndexError, ValueError):
            break
        if voff + flen > len(b):
            break
        field = b[voff:voff + flen]
        off = voff + flen
        if ftype == TM_SIGNEDNESS:
            # one bit per NUMERIC column, in column order, MSB-first
            out["signedness"] = {
                col: bool(field[i // 8] & (0x80 >> (i % 8)))
                for i, col in enumerate(numeric_idx)
                if i // 8 < len(field)}
        elif ftype == TM_COLUMN_NAME:
            names, p = [], 0
            while p < len(field):
                n, p = read_lenenc(field, p)
                names.append(field[p:p + n].decode("utf-8"))
                p += n
            out["column_names"] = names
        elif ftype in (TM_ENUM_STR_VALUE, TM_SET_STR_VALUE):
            cols = enum_idx if ftype == TM_ENUM_STR_VALUE else set_idx
            key = ("enum_labels" if ftype == TM_ENUM_STR_VALUE
                   else "set_labels")
            per_col, p = {}, 0
            for col in cols:
                if p >= len(field):
                    break
                cnt, p = read_lenenc(field, p)
                vals = []
                for _ in range(cnt):
                    n, p = read_lenenc(field, p)
                    vals.append(field[p:p + n].decode("utf-8"))
                    p += n
                per_col[col] = tuple(vals)
            out[key] = per_col
        elif ftype == TM_SIMPLE_PRIMARY_KEY:
            pk, p = [], 0
            while p < len(field):
                idx, p = read_lenenc(field, p)
                pk.append(idx)
            out["primary_key"] = pk
        elif ftype == TM_COLUMN_VISIBILITY:
            out["visibility"] = [
                bool(field[i // 8] & (0x80 >> (i % 8)))
                for i in range(min(len(specs), len(field) * 8))]
        else:
            # charsets / geometry types / pk-with-prefix: kept raw —
            # decode currently needs none of them (all text here is
            # utf8-family, geometry is passthrough)
            out.setdefault("raw", {})[ftype] = bytes(field)
    return out


def _apply_optional_metadata(specs: list[ColSpec],
                             tm_meta: dict) -> list[ColSpec]:
    """Fold SIGNEDNESS + ENUM/SET label metadata into the column specs,
    so downstream row decode is catalog-free: unsigned ints widen
    correctly and ENUM/SET surface their string labels directly."""
    import dataclasses

    signed = tm_meta.get("signedness", {})
    enum_l = tm_meta.get("enum_labels", {})
    set_l = tm_meta.get("set_labels", {})
    out = []
    for i, s in enumerate(specs):
        changes = {}
        if signed.get(i):
            changes["unsigned"] = True
        if i in enum_l:
            changes["labels"] = enum_l[i]
        elif i in set_l:
            changes["labels"] = set_l[i]
        out.append(dataclasses.replace(s, **changes) if changes else s)
    return out


def _encode_optional_metadata(specs: list[ColSpec],
                              column_names: list[str] | None,
                              primary_key: list[int] | None) -> bytes:
    """Build the WL#4618 TLV block from spec-carried unsigned/labels
    plus explicit names/pk — what a binlog_row_metadata=FULL server
    writes."""
    def tlv(ftype: int, payload: bytes) -> bytes:
        return bytes([ftype]) + write_lenenc(len(payload)) + payload

    out = bytearray()
    numeric = [s for s in specs if s.type_code in _NUMERIC_TYPES]
    if numeric:
        bits = bytearray((len(numeric) + 7) // 8)
        for i, s in enumerate(numeric):
            if s.unsigned:
                bits[i // 8] |= 0x80 >> (i % 8)
        out += tlv(TM_SIGNEDNESS, bytes(bits))
    if column_names is not None:
        payload = b"".join(write_lenenc(len(n.encode())) + n.encode()
                           for n in column_names)
        out += tlv(TM_COLUMN_NAME, payload)
    enums = [s for s in specs if s.type_code == T_ENUM]
    if any(s.labels for s in enums):
        payload = bytearray()
        for s in enums:
            payload += write_lenenc(len(s.labels))
            for lab in s.labels:
                lb = lab.encode()
                payload += write_lenenc(len(lb)) + lb
        out += tlv(TM_ENUM_STR_VALUE, bytes(payload))
    sets = [s for s in specs if s.type_code == T_SET]
    if any(s.labels for s in sets):
        payload = bytearray()
        for s in sets:
            payload += write_lenenc(len(s.labels))
            for lab in s.labels:
                lb = lab.encode()
                payload += write_lenenc(len(lb)) + lb
        out += tlv(TM_SET_STR_VALUE, bytes(payload))
    if primary_key is not None:
        out += tlv(TM_SIMPLE_PRIMARY_KEY,
                   b"".join(write_lenenc(i) for i in primary_key))
    return bytes(out)


class _Absent:
    """Column-not-in-image marker for partial row images
    (binlog_row_image=MINIMAL/NOBLOB). DISTINCT from None: None means
    the column was present on the wire and NULL; ABSENT means the
    column consumed no image bytes at all and its value is unknown.
    Falsy so presence tests read naturally; a singleton so identity
    checks (``v is ABSENT``) work across pickling boundaries."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:
        return "ABSENT"

    def __bool__(self) -> bool:
        return False

    def __reduce__(self):
        return (_Absent, ())


ABSENT = _Absent()


def row_image_present(specs: list["ColSpec"], mode: str,
                      pk_cols: list[int],
                      changed_cols: list[int] | None = None,
                      ) -> tuple[list[bool], list[bool]]:
    """The (before, after) present bitmaps a server configured with
    ``binlog_row_image=<mode>`` writes for an UPDATE statement touching
    ``changed_cols`` on a table whose primary key is ``pk_cols``
    (MySQL reference manual, Replication Options / binlog_row_image):

    * FULL    — every column in both images (the default).
    * MINIMAL — before image: PK columns only; after image: changed
      columns only (the PK travels in the before image).
    * NOBLOB  — all columns in both images EXCEPT BLOB/TEXT columns
      that are neither part of the PK (before) nor changed (after).

    WRITE events use only the after half (all columns are "changed" by
    an INSERT); DELETE events use only the before half."""
    n = len(specs)
    changed = set(changed_cols if changed_cols is not None else range(n))
    pk = set(pk_cols)
    if mode == "FULL":
        return [True] * n, [True] * n
    if mode == "MINIMAL":
        return [i in pk for i in range(n)], [i in changed for i in range(n)]
    if mode == "NOBLOB":
        blob = {i for i, s in enumerate(specs)
                if s.type_code in (T_BLOB, T_JSON, T_GEOMETRY)}
        before = [i not in blob or i in pk for i in range(n)]
        after = [i not in blob or i in changed for i in range(n)]
        return before, after
    raise ValueError(f"unknown binlog_row_image mode {mode!r}")


def _bitmap(bits: list[bool]) -> bytes:
    out = bytearray((len(bits) + 7) // 8)
    for i, bit in enumerate(bits):
        if bit:
            out[i // 8] |= 1 << (i % 8)
    return bytes(out)


def _read_bit(b: bytes, off: int, i: int) -> bool:
    return bool(b[off + i // 8] & (1 << (i % 8)))


def _encode_image(row: tuple, specs: list[ColSpec],
                  pidx: list[int] | None = None) -> bytes:
    """One row image. With ``pidx`` (ascending present-column indices,
    the partial-image case) the null bitmap is sized over the PRESENT
    columns only and its bit k refers to pidx[k] — the wire detail
    MINIMAL/NOBLOB decoding hinges on. Absent slots of ``row`` must
    hold ABSENT (cross-checked, so a bitmap/row mismatch fails at
    encode time, not as downstream garbage)."""
    if pidx is None:
        nulls = [v is None for v in row]
        out = bytearray(_bitmap(nulls))
        for v, spec in zip(row, specs):
            if v is not None:
                out += encode_value(v, spec)
        return bytes(out)
    pset = set(pidx)
    for i, v in enumerate(row):
        if (v is ABSENT) == (i in pset):
            raise ValueError(
                f"column {i}: row value {'ABSENT' if v is ABSENT else repr(v)}"
                f" contradicts present bitmap (present={i in pset})")
    nulls = [row[i] is None for i in pidx]
    out = bytearray(_bitmap(nulls))
    for i in pidx:
        if row[i] is not None:
            out += encode_value(row[i], specs[i])
    return bytes(out)


_DECODER_CACHE: dict[tuple, list] = {}


class _Decoders(list):
    """Compiled per-column decoder list, carrying the exec-generated
    full-row fast path as ``.row`` (None when unavailable). A subclass
    so existing callers keep indexing it like a plain list."""

    __slots__ = ("row",)

    def __init__(self, cols, row=None):
        super().__init__(cols)
        self.row = row

    def __reduce__(self):
        # closures/exec functions don't pickle; rebuilders recompile
        # from specs (TxnAssembler.__setstate__ does), so a stray
        # pickle just drops to the closure-only form
        return (list, (list(self),))


def _compile_row_decoder(specs: list[ColSpec], decoders: list):
    """exec-generate ONE function decoding a full no-NULL row image —
    the engine's whole-stage-codegen analog for the byte decoder:
    per-column closure dispatch (a Python call per column) collapses
    into straight-line code for fixed-width ints, floats, YEAR, and
    length-prefixed strings; rarer types call their compiled closure.
    Generated source interpolates only ints/bools derived from ColSpec
    (never strings), so the codegen surface is closed. Measured ~1.5x
    on the 4-column txn-fixture image decode, more on wide tables."""
    ns: dict = {"ib": int.from_bytes}
    lines = ["def _row(b, off):"]
    parts = []
    widths = {T_TINY: 1, T_SHORT: 2, T_INT24: 3, T_LONG: 4, T_LONGLONG: 8}
    for i, s in enumerate(specs):
        t = s.type_code
        v = f"v{i}"
        parts.append(v)
        if t in widths:
            w = widths[t]
            sgn = bool(not s.unsigned)
            lines.append(f"    {v} = ib(b[off:off+{w}], 'little', "
                         f"signed={sgn}); off += {w}")
        elif t == T_YEAR:
            lines.append(f"    {v} = 1900 + b[off]; off += 1")
        elif t == T_FLOAT:
            ns[f"up{i}"] = struct.Struct("<f").unpack_from
            lines.append(f"    {v} = up{i}(b, off)[0]; off += 4")
        elif t == T_DOUBLE:
            ns[f"up{i}"] = struct.Struct("<d").unpack_from
            lines.append(f"    {v} = up{i}(b, off)[0]; off += 8")
        elif t in (T_VARCHAR, T_STRING):
            w = 2 if s.meta[0] > 255 else 1
            if w == 1:
                lines.append("    n = b[off]; off += 1")
            else:
                lines.append(f"    n = ib(b[off:off+{w}], 'little'); "
                             f"off += {w}")
            lines.append(f"    {v} = b[off:off+n].decode('utf-8'); off += n")
        else:
            ns[f"d{i}"] = decoders[i]
            lines.append(f"    {v}, off = d{i}(b, off)")
    lines.append(f"    return ({', '.join(parts)},), off")
    exec("\n".join(lines), ns)  # noqa: S102 — closed int/bool template
    return ns["_row"]


def compile_decoders(specs: list[ColSpec]) -> list:
    """Resolve decode_value's per-call type branching ONCE per spec list
    (cached): each column gets a small closure ``(b, off) -> (v, off)``.
    Measured ~1.7x on the 35-column fixture decode — the hot path of
    every byte-level CDC query, where the same TABLE_MAP schema decodes
    millions of rows."""
    key = tuple(specs)
    cached = _DECODER_CACHE.get(key)
    if cached is not None:
        return cached
    if len(_DECODER_CACHE) >= 1024:
        # schema churn bound (same discipline as the TxnAssembler spec
        # cache): a long-lived worker seeing endless distinct schemas
        # must not grow closures forever
        _DECODER_CACHE.clear()

    def make(spec: ColSpec):
        t = spec.type_code
        ib = int.from_bytes
        if t in (T_TINY, T_SHORT, T_INT24, T_LONG, T_LONGLONG):
            w = {T_TINY: 1, T_SHORT: 2, T_INT24: 3, T_LONG: 4,
                 T_LONGLONG: 8}[t]
            sgn = not spec.unsigned  # WL#4618 SIGNEDNESS
            return lambda b, off: (ib(b[off:off + w], "little",
                                      signed=sgn), off + w)
        if t == T_FLOAT:
            up = struct.Struct("<f").unpack_from
            return lambda b, off: (up(b, off)[0], off + 4)
        if t == T_DOUBLE:
            up = struct.Struct("<d").unpack_from
            return lambda b, off: (up(b, off)[0], off + 8)
        if t == T_NEWDECIMAL:
            prec, scale = spec.meta
            nbytes, plan = _decimal_layout(prec, scale)
            top = 0x80 << ((nbytes - 1) * 8)
            full = (1 << (nbytes * 8)) - 1

            def dec(b, off, nbytes=nbytes, plan=plan, top=top, full=full,
                    neg_scale=-scale):
                big = ib(b[off:off + nbytes], "big")
                negative = not (big & top)
                if negative:
                    big ^= full
                big ^= top
                v = 0
                for shift, mask, mult in plan:
                    v = v * mult + ((big >> shift) & mask)
                return (Decimal(-v if negative else v)
                        .scaleb(neg_scale, _WIDE_CTX), off + nbytes)
            return dec
        if t == T_DATE:
            return decode_date
        if t == T_TIME2:
            fsp = spec.meta[0]
            return lambda b, off: decode_time2(b, off, fsp)
        if t == T_DATETIME2:
            fsp = spec.meta[0]
            return lambda b, off: decode_datetime2(b, off, fsp)
        if t == T_TIMESTAMP2:
            fsp = spec.meta[0]
            return lambda b, off: decode_timestamp2(b, off, fsp)
        if t == T_YEAR:
            return lambda b, off: (1900 + b[off], off + 1)
        if t in (T_VARCHAR, T_STRING):
            width = 2 if spec.meta[0] > 255 else 1

            def var(b, off, width=width):
                n = ib(b[off:off + width], "little")
                off += width
                return b[off:off + n].decode("utf-8"), off + n
            return var
        # rarer types keep the generic path
        return lambda b, off: decode_value(b, off, spec)

    cols = [make(s) for s in specs]
    decoders = _Decoders(cols, _compile_row_decoder(specs, cols))
    _DECODER_CACHE[key] = decoders
    return decoders


def _decode_image(b: bytes, off: int, specs: list[ColSpec],
                  decoders: list | None = None) -> tuple[tuple, int]:
    nb = (len(specs) + 7) // 8
    # the null bitmap as one int: per-column bit tests become shifts
    bits = int.from_bytes(b[off:off + nb], "little")
    off += nb
    if decoders is None:
        decoders = compile_decoders(specs)
    if bits == 0:
        # no NULLs in this row (the common case on insert-heavy
        # streams): the exec-compiled straight-line row decoder, or at
        # least skip the per-column bit tests
        row = getattr(decoders, "row", None)
        if row is not None:
            return row(b, off)
        vals0 = []
        ap0 = vals0.append
        for dec in decoders:
            v, off = dec(b, off)
            ap0(v)
        return tuple(vals0), off
    vals = []
    append = vals.append
    for i, dec in enumerate(decoders):
        if bits >> i & 1:
            append(None)  # NULL columns consume no payload bytes
        else:
            v, off = dec(b, off)
            append(v)
    return tuple(vals), off


def _decode_sparse_image(b: bytes, off: int, decoders: list,
                         pidx: list[int], ncols: int) -> tuple[tuple, int]:
    """Partial row image (binlog_row_image=MINIMAL/NOBLOB): the null
    bitmap covers only the PRESENT columns — bit k is pidx[k] — and
    absent columns consume zero payload bytes. They surface as ABSENT
    (unknown), never None (NULL): conflating the two corrupts merges."""
    npb = (len(pidx) + 7) // 8
    bits = int.from_bytes(b[off:off + npb], "little")
    off += npb
    vals = [ABSENT] * ncols
    for k, i in enumerate(pidx):
        if not bits >> k & 1:
            vals[i], off = decoders[i](b, off)
        else:
            vals[i] = None
    return tuple(vals), off


def encode_rows_event(event_type: int, table_id: int, specs: list[ColSpec],
                      rows: list, log_pos: int = 0, *,
                      present: list[bool] | None = None,
                      present_after: list[bool] | None = None) -> bytes:
    """rows: list of images (WRITE/DELETE) or of (before, after) pairs
    (UPDATE). Multi-row events supported (D7).

    ``present`` / ``present_after`` are the columns-present bitmaps a
    server writes under binlog_row_image=MINIMAL/NOBLOB (compute them
    with ``row_image_present``); defaults are all-columns (FULL). Row
    tuples stay full-width — absent slots hold ABSENT. For WRITE events
    ``present`` describes the (only) after image; for DELETE the (only)
    before image."""
    n = len(specs)
    p = bytearray()
    p += table_id.to_bytes(6, "little") + b"\x01\x00"
    p += (2).to_bytes(2, "little")  # extra-data length (just itself)
    p += write_lenenc(n)
    if present is None:
        present = [True] * n
    pidx = None if all(present) else [i for i in range(n) if present[i]]
    p += _bitmap(present)
    if event_type == UPDATE_ROWS_V2:
        if present_after is None:
            present_after = [True] * n
        aidx = None if all(present_after) else \
            [i for i in range(n) if present_after[i]]
        p += _bitmap(present_after)  # second bitmap (after-image columns)
        for before, after in rows:
            p += _encode_image(before, specs, pidx)
            p += _encode_image(after, specs, aidx)
    else:
        for row in rows:
            p += _encode_image(row, specs, pidx)
    return _header(event_type, len(p), log_pos=log_pos) + bytes(p)


def encode_partial_update_rows_event(table_id: int, specs: list[ColSpec],
                                     rows: list, log_pos: int = 0, *,
                                     present: list[bool] | None = None,
                                     present_after: list[bool] | None = None
                                     ) -> bytes:
    """PARTIAL_UPDATE_ROWS_EVENT (type 39). ``rows`` is
    [(before, after, partial)] where ``partial`` maps a JSON column
    index to its diff list ([(op, path, value)]); those columns ship
    the encoded diff sequence in the after-image (BLOB-framed by the
    column's length-bytes meta), all other columns ship full values.
    Layout per the published format: each row's after-image is preceded
    by a shared-image block — lenenc value_options (bit0 =
    PARTIAL_JSON) and, when set, partial_bits with one bit per JSON
    column of the table."""
    from ru_cdc_spark.sources.mysql_json_diff import encode_json_diffs

    json_cols = [i for i, s in enumerate(specs) if s.type_code == T_JSON]
    n = len(specs)
    if present is None:
        present = [True] * n
    if present_after is None:
        present_after = [True] * n
    pidx = None if all(present) else [i for i in range(n) if present[i]]
    aidx = [i for i in range(n) if present_after[i]]
    p = bytearray()
    p += table_id.to_bytes(6, "little") + b"\x01\x00"
    p += (2).to_bytes(2, "little")
    p += write_lenenc(n)
    p += _bitmap(present) + _bitmap(present_after)
    for before, after, partial in rows:
        p += _encode_image(before, specs, pidx)
        # shared-image: value_options; partial_bits over JSON columns
        p += write_lenenc(1)  # PARTIAL_JSON bit set
        p += _bitmap([c in partial for c in json_cols])
        # a diff-carrying column is never NULL (the diff IS its payload);
        # its after slot may be None as a placeholder
        nulls = [after[i] is None and i not in partial for i in aidx]
        p += _bitmap(nulls)
        for idx in aidx:
            v, spec = after[idx], specs[idx]
            if v is None and idx not in partial:
                continue
            if idx in partial:
                diff_bytes = encode_json_diffs(partial[idx])
                p += len(diff_bytes).to_bytes(spec.meta[0], "little")
                p += diff_bytes
            else:
                p += encode_value(v, spec)
    return _header(PARTIAL_UPDATE_ROWS_EVENT, len(p),
                   log_pos=log_pos) + bytes(p)


def _decode_partial_update(b: bytes, specs: list[ColSpec], size: int,
                           decoders: list) -> list:
    """Row loop for type 39: (before, after) pairs with the after-image
    JSON diffs already APPLIED — downstream consumers see exactly the
    same shape as a full UPDATE_ROWS_V2."""
    import json as _json

    from ru_cdc_spark.sources.mysql_json_diff import (
        apply_json_diffs,
        decode_json_diffs,
    )

    ncols = len(specs)
    nb = (ncols + 7) // 8
    json_cols = [i for i, s in enumerate(specs) if s.type_code == T_JSON]
    njb = (len(json_cols) + 7) // 8
    off = 19 + 8
    extra = int.from_bytes(b[off:off + 2], "little")
    off += extra
    n_declared, off = read_lenenc(b, off)
    if n_declared != ncols:
        raise ValueError("column count mismatch in partial update")
    full = (1 << ncols) - 1
    before_bits = int.from_bytes(b[off:off + nb], "little") & full
    off += nb
    after_bits = int.from_bytes(b[off:off + nb], "little") & full
    off += nb
    bidx = None if before_bits == full else \
        [i for i in range(ncols) if before_bits >> i & 1]
    aidx = [i for i in range(ncols) if after_bits >> i & 1]
    anb = (len(aidx) + 7) // 8  # after null bitmap sized over PRESENT cols
    rows = []
    while off < size:
        if bidx is None:
            before, off = _decode_image(b, off, specs, decoders)
        else:
            before, off = _decode_sparse_image(b, off, decoders, bidx, ncols)
        value_options, off = read_lenenc(b, off)
        partial_flags = 0
        if value_options & 1:
            partial_flags = int.from_bytes(b[off:off + njb], "little")
            off += njb
        nulls = int.from_bytes(b[off:off + anb], "little")
        off += anb
        after = [ABSENT] * ncols
        for k, i in enumerate(aidx):
            spec = specs[i]
            if nulls >> k & 1:
                after[i] = None
                continue
            if spec.type_code == T_JSON and \
                    partial_flags >> json_cols.index(i) & 1:
                ls = spec.meta[0]
                n = int.from_bytes(b[off:off + ls], "little")
                off += ls
                diffs = decode_json_diffs(b[off:off + n])
                off += n
                if before[i] is ABSENT:
                    raise ValueError(
                        "partial JSON diff against an ABSENT before image "
                        "(column not in before image; the server never "
                        "emits this — diffs need the base document)")
                doc = _json.loads(before[i]) if before[i] is not None \
                    else None
                after[i] = _json.dumps(apply_json_diffs(doc, diffs),
                                       separators=(",", ":"))
            else:
                after[i], off = decoders[i](b, off)
        rows.append((before, tuple(after)))
    return rows


def decode_rows_event(b: bytes, specs: list[ColSpec],
                      checksum_bytes: int = 0,
                      decoders: list | None = None) -> tuple[int, list]:
    """Returns (event_type, rows) — rows are images, or (before, after)
    pairs for UPDATE. Loops rows to end-of-payload minus the trailing
    checksum (D7's loop-until-checksum): pass ``checksum_bytes=4`` for
    streams written with binlog_checksum=CRC32 (the MySQL default since
    5.6); this module's own encoder writes checksum-free events.
    Callers that decode many events against one TABLE_MAP (the txn
    assembler) pass ``decoders`` from one up-front ``compile_decoders``
    so the per-event spec-tuple cache hash is not re-paid.
    """
    event_type = b[4]
    declared = int.from_bytes(b[9:13], "little")
    if declared > len(b):
        # torn event: the header promises more bytes than the buffer
        # holds. Failing HERE is the loud-failure contract — short
        # slices further down would otherwise int.from_bytes() to
        # small values and could append a silently-misdecoded row.
        raise ValueError(
            f"torn rows event: header declares {declared} bytes, "
            f"buffer holds {len(b)}")
    size = declared - checksum_bytes
    if event_type == PARTIAL_UPDATE_ROWS_EVENT:
        if decoders is None:
            decoders = compile_decoders(specs)
        return event_type, _decode_partial_update(b, specs, size, decoders)
    off = 19
    off += 8  # table_id + flags
    extra = int.from_bytes(b[off:off + 2], "little")
    off += extra
    ncols, off = read_lenenc(b, off)
    if ncols != len(specs):
        raise ValueError(
            f"rows event carries {ncols} columns, specs have {len(specs)} "
            "(catalog drift? re-resolve the TABLE_MAP)")
    nb = (ncols + 7) // 8
    full = (1 << ncols) - 1
    # columns-present bitmaps: all-set under binlog_row_image=FULL (the
    # fast path below), sparse under MINIMAL/NOBLOB. The reference reads
    # the bitmap but assumes it full (src/binlog.rs:646-667); here sparse
    # images decode with real semantics (ABSENT markers, present-sized
    # null bitmaps).
    before_bits = int.from_bytes(b[off:off + nb], "little") & full
    off += nb
    after_bits = full
    if event_type == UPDATE_ROWS_V2:
        after_bits = int.from_bytes(b[off:off + nb], "little") & full
        off += nb
    rows = []
    if decoders is None:
        decoders = compile_decoders(specs)
    if before_bits == full and after_bits == full:
        row_dec = getattr(decoders, "row", None)
        if row_dec is not None and event_type != UPDATE_ROWS_V2:
            # hottest shape (WRITE/DELETE, no NULLs): bitmap peek +
            # straight-line codegen row decode, zero per-row dispatch
            ib2 = int.from_bytes
            append = rows.append
            while off < size:
                bits = ib2(b[off:off + nb], "little")
                if bits == 0:
                    img, off = row_dec(b, off + nb)
                else:
                    img, off = _decode_image(b, off, specs, decoders)
                append(img)
            return event_type, rows
        while off < size:
            img, off = _decode_image(b, off, specs, decoders)
            if event_type == UPDATE_ROWS_V2:
                after, off = _decode_image(b, off, specs, decoders)
                rows.append((img, after))
            else:
                rows.append(img)
        return event_type, rows
    bidx = [i for i in range(ncols) if before_bits >> i & 1]
    aidx = [i for i in range(ncols) if after_bits >> i & 1]
    while off < size:
        img, off = _decode_sparse_image(b, off, decoders, bidx, ncols)
        if event_type == UPDATE_ROWS_V2:
            after, off = _decode_sparse_image(b, off, decoders, aidx, ncols)
            rows.append((img, after))
        else:
            rows.append(img)
    return event_type, rows


# ---------------------------------------------------------------------------
# transaction-control events (GTID / XID / QUERY). The reference decodes
# QueryEvent but never uses it (D11 dead code, src/binlog.rs:768-811) and
# has NO transaction notion at all — every row event ships independently,
# so a consumer can observe half a transaction. These codecs (public
# binlog v4 layouts) carry the boundaries our assembly operator
# (sources/binlog_txn.py) needs for atomic, commit-consistent delivery.
# ---------------------------------------------------------------------------


def encode_gtid(sid: bytes, gno: int, last_committed: int = 0,
                sequence_number: int = 0, commit_flag: int = 1,
                log_pos: int = 0) -> bytes:
    """GTID_LOG_EVENT (type 33): 1-byte commit flag, 16-byte server UUID
    (SID), 8-byte GNO, then the MySQL 5.7 logical-clock block (1-byte
    typecode=2, last_committed, sequence_number — the group-commit
    intervals MTS parallel apply schedules by)."""
    if len(sid) != 16:
        raise ValueError("SID must be 16 raw UUID bytes")
    p = struct.pack("<B16sqBqq", commit_flag, sid, gno, 2,
                    last_committed, sequence_number)
    return _header(GTID_EVENT, len(p), log_pos=log_pos) + p


def decode_gtid(b: bytes) -> dict:
    if b[4] != GTID_EVENT:
        raise ValueError(f"not a GTID event (type {b[4]})")
    commit_flag, sid, gno, _lt_type, last_committed, sequence_number = (
        struct.unpack_from("<B16sqBqq", b, 19))
    return {"commit_flag": commit_flag, "sid": sid, "gno": gno,
            "last_committed": last_committed,
            "sequence_number": sequence_number}


def encode_rotate(next_log: str, position: int = 4,
                  log_pos: int = 0, timestamp: int = 0) -> bytes:
    """ROTATE_EVENT (type 4): u64 position-in-next-file + the next binlog
    filename — the master's announcement that subsequent events come from
    a new file. The reference decodes it (binlog.rs:814-828) but its
    workers drop it (executor.rs:540, SURVEY D12 'effectively dead');
    a resumable reader must track it so checkpoints carry (file, pos),
    not pos alone.

    ``timestamp==0 and log_pos==0`` is the ARTIFICIAL form a server
    prefixes to every COM_BINLOG_DUMP reply (naming the dump's starting
    file); a genuine file-boundary rotate carries a real timestamp."""
    p = position.to_bytes(8, "little") + next_log.encode()
    return _header(ROTATE_EVENT, len(p), log_pos=log_pos,
                   timestamp=timestamp) + p


def decode_rotate(b: bytes, checksum_bytes: int = 0) -> tuple[str, int]:
    """-> (next binlog filename, position in it)."""
    if b[4] != ROTATE_EVENT:
        raise ValueError(f"not a ROTATE event (type {b[4]})")
    size = int.from_bytes(b[9:13], "little") - checksum_bytes
    position = int.from_bytes(b[19:27], "little")
    return b[27:size].decode(), position


_BINLOG_VERSION = 4
_POST_HEADER_LENS = 40  # one length byte per event type 1..40 (5.7 layout)
CHECKSUM_NONE, CHECKSUM_CRC32 = 0, 1


def encode_format_description(checksum_alg: int = CHECKSUM_NONE,
                              server_version: str = "5.7.44-engine",
                              log_pos: int = 0) -> bytes:
    """FORMAT_DESCRIPTION_EVENT (type 15) — the first event of every
    binlog file: binlog version (u16), 50-byte server version string,
    create timestamp (u32), common header length (u8), the per-type
    post-header length table, and the checksum algorithm byte every later
    event's trailing bytes depend on. A reader that skips it (the
    reference hard-wires its checksum assumption via `set
    @master_binlog_checksum`, main.rs:82-84) cannot tell whether event
    payloads end in 4 CRC bytes."""
    sv = server_version.encode()[:50].ljust(50, b"\x00")
    p = (struct.pack("<H", _BINLOG_VERSION) + sv + struct.pack("<I", 0)
         + bytes([19]) + bytes([0] * _POST_HEADER_LENS)
         + bytes([checksum_alg]))
    return _header(FORMAT_DESCRIPTION_EVENT, len(p), log_pos=log_pos) + p


def decode_format_description(b: bytes) -> dict:
    """-> {binlog_version, server_version, checksum_bytes}: the stream
    bootstrap — ``checksum_bytes`` (0 or 4) is what every subsequent
    rows-event decode must strip (D7's loop-until-checksum bound)."""
    if b[4] != FORMAT_DESCRIPTION_EVENT:
        raise ValueError(f"not a FORMAT_DESCRIPTION event (type {b[4]})")
    size = int.from_bytes(b[9:13], "little")
    version = struct.unpack_from("<H", b, 19)[0]
    server_version = b[21:71].split(b"\x00")[0].decode()
    # A CRC32 stream's FDE itself ends alg-byte + 4 CRC bytes; an
    # unchecksummed FDE ends with the alg byte (0). The candidate
    # position alone is ambiguous (a checksum-free FDE whose post-header
    # table holds 0x01 there would be misread), so VERIFY: CRC mode is
    # claimed only if the trailing 4 bytes actually ARE the CRC32 of the
    # rest of the event (ADVICE fix, round 3).
    import zlib

    checksum_bytes = 0
    if size >= 24 and b[size - 5] == CHECKSUM_CRC32:
        claimed = int.from_bytes(b[size - 4:size], "little")
        if zlib.crc32(b[:size - 4]) & 0xFFFFFFFF == claimed:
            checksum_bytes = 4
    if checksum_bytes == 0 and b[size - 1] == CHECKSUM_CRC32:
        # alg byte in final position with no trailer: a CRC32-declaring
        # FDE written before checksums start applying (MySQL writes the
        # FDE itself unchecksummed in some versions) — honor the byte
        # only when the verified-trailer read ruled itself out AND the
        # post-header table can't be what we're looking at (the table
        # ends exactly at size-1 here, so this IS the alg byte).
        checksum_bytes = 4
    return {"binlog_version": version, "server_version": server_version,
            "checksum_bytes": checksum_bytes}


def encode_heartbeat(log_ident: str, log_pos: int = 0) -> bytes:
    """HEARTBEAT_LOG_EVENT (type 27): sent by an idle master so the
    replica's position (and, in this engine, the stream's WATERMARK)
    advances with no row traffic — the wire-level form of the liveness
    fence the stateful operators rely on. Payload is just the current
    binlog filename; the header's log_pos carries the position."""
    p = log_ident.encode()
    return _header(HEARTBEAT_EVENT, len(p), log_pos=log_pos) + p


def decode_heartbeat(b: bytes, checksum_bytes: int = 0) -> tuple[str, int]:
    """-> (binlog filename, log_pos)."""
    if b[4] != HEARTBEAT_EVENT:
        raise ValueError(f"not a HEARTBEAT event (type {b[4]})")
    size = int.from_bytes(b[9:13], "little") - checksum_bytes
    log_pos = struct.unpack_from("<I", b, 13)[0]
    return b[19:size].decode(), log_pos


def encode_rows_query(sql: str, log_pos: int = 0) -> bytes:
    """ROWS_QUERY_EVENT (type 29): emitted before each row event when
    MySQL runs with binlog_rows_query_log_events=ON — 1 length byte
    (informational; the text runs to the event end) + the original SQL.
    The reference never decodes it; Canal populates its envelope ``sql``
    field from exactly this event."""
    qb = sql.encode()
    p = bytes([min(len(qb), 255)]) + qb
    return _header(ROWS_QUERY_EVENT, len(p), log_pos=log_pos) + p


def decode_rows_query(b: bytes, checksum_bytes: int = 0) -> str:
    if b[4] != ROWS_QUERY_EVENT:
        raise ValueError(f"not a ROWS_QUERY event (type {b[4]})")
    size = int.from_bytes(b[9:13], "little") - checksum_bytes
    return b[20:size].decode()


def encode_xid(xid: int, log_pos: int = 0) -> bytes:
    """XID_EVENT (type 16): the storage-engine commit id — its presence
    IS the commit marker for a transactional row-event group."""
    p = xid.to_bytes(8, "little")
    return _header(XID_EVENT, len(p), log_pos=log_pos) + p


def decode_xid(b: bytes) -> int:
    if b[4] != XID_EVENT:
        raise ValueError(f"not an XID event (type {b[4]})")
    return int.from_bytes(b[19:27], "little")


# ---------------------------------------------------------------------------
# TRANSACTION_PAYLOAD_EVENT (type 40, MySQL 8.0.20+): the whole
# transaction's events shipped as one zstd-compressed blob when the
# server runs binlog_transaction_compression=ON. The reference has no
# type-40 handling at all (/root/reference/src/binlog.rs:159-204) — a
# 2026 server with compression on is undecodable to it. Field layout is
# the published TLV form: lenenc type, lenenc length, value; type 0 is
# the header-end mark, after which the (possibly compressed) payload
# runs to the end of the event. Inner events carry no checksums.
# ---------------------------------------------------------------------------

TRANSACTION_PAYLOAD_EVENT = 40

_TP_END_MARK = 0
_TP_PAYLOAD_SIZE = 1
_TP_COMPRESSION_TYPE = 2
_TP_UNCOMPRESSED_SIZE = 3

TP_COMPRESSION_ZSTD = 0
TP_COMPRESSION_NONE = 255


def encode_transaction_payload(inner: bytes, compress: bool = True,
                               log_pos: int = 0) -> bytes:
    """Wrap a complete transaction's inner event bytes (BEGIN query,
    table maps, row events, XID — the GTID event stays OUTSIDE, as on a
    real server). Compression is real zstd (functions/zstd.py compress,
    CLI/libzstd-validated RFC 8878 frames); pass ``compress=False`` for
    the NONE-type payload a server emits for incompressible
    transactions."""
    if compress:
        try:
            import pyarrow as _pa

            payload = _pa.Codec("zstd").compress(inner).to_pybytes()
        except ImportError:
            from ru_cdc_spark.functions.zstd import (
                compress as zstd_compress,
            )

            payload = zstd_compress(inner, checksum=False)
        ctype = TP_COMPRESSION_ZSTD
    else:
        payload = inner
        ctype = TP_COMPRESSION_NONE
    p = bytearray()
    p += write_lenenc(_TP_COMPRESSION_TYPE)
    p += write_lenenc(len(write_lenenc(ctype)))
    p += write_lenenc(ctype)
    if compress:
        usize = write_lenenc(len(inner))
        p += write_lenenc(_TP_UNCOMPRESSED_SIZE)
        p += write_lenenc(len(usize))
        p += usize
    psize = write_lenenc(len(payload))
    p += write_lenenc(_TP_PAYLOAD_SIZE)
    p += write_lenenc(len(psize))
    p += psize
    p += write_lenenc(_TP_END_MARK)
    p += payload
    return _header(TRANSACTION_PAYLOAD_EVENT, len(p),
                   log_pos=log_pos) + bytes(p)


def decode_transaction_payload(b: bytes, checksum_bytes: int = 0) -> bytes:
    """Returns the transaction's inner event bytes, decompressed. The
    decode path accepts ANY conformant zstd frame (a real server
    compresses with libzstd), via pyarrow's bundled libzstd when
    importable, else the spec decoder in functions/zstd.py."""
    if b[4] != TRANSACTION_PAYLOAD_EVENT:
        raise ValueError(f"not a TRANSACTION_PAYLOAD event (type {b[4]})")
    end = int.from_bytes(b[9:13], "little") - checksum_bytes
    off = 19
    ctype = TP_COMPRESSION_NONE
    usize = None
    psize = None
    while off < end:
        ftype, off = read_lenenc(b, off)
        if ftype == _TP_END_MARK:
            break
        flen, off = read_lenenc(b, off)
        if ftype == _TP_COMPRESSION_TYPE:
            ctype, _ = read_lenenc(b, off)
        elif ftype == _TP_UNCOMPRESSED_SIZE:
            usize, _ = read_lenenc(b, off)
        elif ftype == _TP_PAYLOAD_SIZE:
            psize, _ = read_lenenc(b, off)
        off += flen  # unknown fields skipped by declared length
    payload = b[off:end]
    if psize is not None and len(payload) != psize:
        raise ValueError(
            f"payload size field {psize} != actual {len(payload)}")
    if ctype == TP_COMPRESSION_NONE:
        return bytes(payload)
    if ctype != TP_COMPRESSION_ZSTD:
        raise ValueError(f"unknown payload compression type {ctype}")
    try:
        import pyarrow as _pa

        if usize is not None:
            return _pa.Codec("zstd").decompress(
                bytes(payload), usize).to_pybytes()
        raise ImportError  # no size hint: stream via the spec decoder
    except ImportError:
        from ru_cdc_spark.functions.zstd import decompress as _zstd_dec

        inner = _zstd_dec(bytes(payload))
        if usize is not None and len(inner) != usize:
            raise ValueError(
                f"uncompressed size field {usize} != actual {len(inner)}")
        return inner


def encode_query(sql: str, schema: str = "", thread_id: int = 0,
                 log_pos: int = 0) -> bytes:
    """QUERY_EVENT (type 2): thread_id u32, exec_time u32, schema_len u8,
    error_code u16, status_vars_len u16 (0 here), schema, NUL, SQL text.
    In ROW binlog format this carries BEGIN / ROLLBACK / DDL."""
    sb, qb = schema.encode(), sql.encode()
    p = struct.pack("<IIBHH", thread_id, 0, len(sb), 0, 0) + sb + b"\x00" + qb
    return _header(QUERY_EVENT, len(p), log_pos=log_pos) + p


def decode_query(b: bytes, checksum_bytes: int = 0) -> tuple[str, str]:
    """-> (schema, sql). Skips the status-vars block by its declared
    length (the reference's decoder does the same, binlog.rs:768-811)."""
    if b[4] != QUERY_EVENT:
        raise ValueError(f"not a QUERY event (type {b[4]})")
    size = int.from_bytes(b[9:13], "little") - checksum_bytes
    _thread_id, _exec_time, schema_len, _err, status_len = (
        struct.unpack_from("<IIBHH", b, 19))
    off = 19 + 13 + status_len
    schema = b[off:off + schema_len].decode()
    off += schema_len + 1  # + NUL
    return schema, b[off:size].decode()


# ---------------------------------------------------------------------------
# frames: the reference's RowEvents pairing as one binary cell
# ---------------------------------------------------------------------------


def encode_frame(table_id: int, schema: str, table: str, specs: list[ColSpec],
                 event_type: int, rows: list, log_pos: int = 0, *,
                 full_metadata: bool = False,
                 column_names: list[str] | None = None,
                 primary_key: list[int] | None = None,
                 present: list[bool] | None = None,
                 present_after: list[bool] | None = None) -> bytes:
    tm = encode_table_map(table_id, schema, table, specs, log_pos,
                          full_metadata=full_metadata,
                          column_names=column_names,
                          primary_key=primary_key)
    re_ = encode_rows_event(event_type, table_id, specs, rows, log_pos,
                            present=present, present_after=present_after)
    return tm + re_


def decode_frame(b: bytes, checksum_bytes: int = 0) -> tuple[str, str, int, list]:
    """One (TABLE_MAP, ROWS) pair -> (schema, table, event_type, rows).

    The TABLE_MAP's own metadata drives the value decode — schema-on-read
    exactly like the reference's two-layer registry (D4/D5 then D10).
    WL#4618 signedness/labels, when present, are already folded into the
    specs, so unsigned and ENUM/SET columns decode catalog-free."""
    tm_size = int.from_bytes(b[9:13], "little")
    _, schema, table, specs = decode_table_map(b[:tm_size])
    event_type, rows = decode_rows_event(b[tm_size:], specs, checksum_bytes)
    return schema, table, event_type, rows


def decode_frame_ext(b: bytes, checksum_bytes: int = 0
                     ) -> tuple[str, str, int, list, dict]:
    """decode_frame plus the TABLE_MAP's WL#4618 metadata dict — column
    names / primary key straight off the wire, no DESC round-trip."""
    tm_size = int.from_bytes(b[9:13], "little")
    _, schema, table, specs, tm_meta = decode_table_map_ext(b[:tm_size])
    event_type, rows = decode_rows_event(b[tm_size:], specs, checksum_bytes)
    return schema, table, event_type, rows, tm_meta
