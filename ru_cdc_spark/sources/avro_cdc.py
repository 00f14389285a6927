"""Avro binary codec + Confluent schema-registry framing for the CDC
change stream, from the public Avro 1.11 specification.

Production Debezium/Canal deployments overwhelmingly ship **Avro**
on the wire (Confluent wire format: ``0x00`` magic + 4-byte big-endian
schema id + Avro binary body), not JSON — this module makes the engine
speak that format with no Avro library in the image:

* zigzag-varint ints/longs, IEEE little-endian float/double,
  length-prefixed strings/bytes, union branch indexes, blocked arrays
  and maps — the complete binary encoding for the types a change
  record carries;
* logical types the CDC schema needs: ``date`` (int days),
  ``timestamp-micros`` (long), ``decimal`` (bytes, two's-complement
  big-endian unscaled);
* schema derivation straight from a Spark ``StructType`` (nullable
  fields become ``["null", T]`` unions, Avro's convention).

Codec work is row-at-a-time by nature (Avro is a record format), so it
runs inside ``mapInPandas`` Arrow batches — executor-side,
partition-parallel, like every other byte codec here.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timezone
from decimal import Decimal

from pyspark.sql import types as T

_EPOCH = date(1970, 1, 1)


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _zz_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return (u >> 1) ^ -(u & 1), pos
        shift += 7


# ---------------------------------------------------------------------------
# schema derivation from Spark types
# ---------------------------------------------------------------------------


def avro_schema_of(struct: T.StructType, name: str = "ChangeRecord") -> dict:
    """Spark StructType -> Avro record schema (dict form of the JSON).
    Nullable fields become ``["null", T]`` unions."""

    def conv(dt: T.DataType) -> object:
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            return "int"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DecimalType):
            return {"type": "bytes", "logicalType": "decimal",
                    "precision": dt.precision, "scale": dt.scale}
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": conv(dt.elementType)}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": conv(dt.valueType)}
        if isinstance(dt, T.StructType):
            return avro_schema_of(dt, name=f"{name}_nested")
        raise AvroError(f"unsupported Spark type {dt}")

    fields = []
    for f in struct.fields:
        t = conv(f.dataType)
        fields.append({"name": f.name,
                       "type": ["null", t] if f.nullable else t})
    return {"type": "record", "name": name, "fields": fields}


# ---------------------------------------------------------------------------
# encode / decode against a schema
# ---------------------------------------------------------------------------


def _encode_value(schema, value, out: bytearray) -> None:
    if isinstance(schema, list):  # union: branch index, then value
        if value is None:
            out += _zz_encode(schema.index("null"))
            return
        branch = next(i for i, s in enumerate(schema) if s != "null")
        out += _zz_encode(branch)
        _encode_value(schema[branch], value, out)
        return
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "date":
            out += _zz_encode((value - _EPOCH).days)
            return
        if lt == "timestamp-micros":
            if value.tzinfo is None:
                value = value.replace(tzinfo=timezone.utc)
            # timedelta floor-division is sign-correct for PRE-EPOCH
            # values (int(timestamp()) truncates toward zero while the
            # microsecond component is always positive — the two would
            # disagree in sign and shift 1969 rows by a second)
            from datetime import timedelta

            epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
            micros = (value - epoch) // timedelta(microseconds=1)
            out += _zz_encode(micros)
            return
        if lt == "decimal":
            unscaled = int(value.scaleb(schema["scale"])
                           .to_integral_value())
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(nbytes, "big", signed=True)
            out += _zz_encode(len(raw)) + raw
            return
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode_value(f["type"], value[f["name"]], out)
            return
        if t == "array":
            if value:
                out += _zz_encode(len(value))
                for item in value:
                    _encode_value(schema["items"], item, out)
            out += _zz_encode(0)
            return
        if t == "map":
            if value:
                out += _zz_encode(len(value))
                for k, v in value.items():
                    _encode_value("string", k, out)
                    _encode_value(schema["values"], v, out)
            out += _zz_encode(0)
            return
        schema = t  # {"type": "long"} plain wrapper
    if schema in ("long", "int"):
        out += _zz_encode(int(value))
    elif schema == "double":
        out += struct.pack("<d", float(value))
    elif schema == "float":
        out += struct.pack("<f", float(value))
    elif schema == "string":
        b = str(value).encode()
        out += _zz_encode(len(b)) + b
    elif schema == "bytes":
        out += _zz_encode(len(value)) + bytes(value)
    elif schema == "boolean":
        out.append(1 if value else 0)
    elif schema == "null":
        pass
    else:
        raise AvroError(f"unsupported schema {schema!r}")


def _decode_value(schema, data: bytes, pos: int):
    if isinstance(schema, list):
        branch, pos = _zz_decode(data, pos)
        return _decode_value(schema[branch], data, pos)
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "date":
            days, pos = _zz_decode(data, pos)
            return date.fromordinal(_EPOCH.toordinal() + days), pos
        if lt == "timestamp-micros":
            from datetime import timedelta

            micros, pos = _zz_decode(data, pos)
            return (datetime(1970, 1, 1)
                    + timedelta(microseconds=micros), pos)
        if lt == "decimal":
            n, pos = _zz_decode(data, pos)
            raw = data[pos:pos + n]
            pos += n
            unscaled = int.from_bytes(raw, "big", signed=True)
            return (Decimal(unscaled).scaleb(-schema["scale"]), pos)
        t = schema["type"]
        if t == "record":
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]], pos = _decode_value(f["type"], data, pos)
            return rec, pos
        if t == "array":
            items = []
            while True:
                n, pos = _zz_decode(data, pos)
                if n == 0:
                    return items, pos
                if n < 0:  # block with byte size prefix
                    _, pos = _zz_decode(data, pos)
                    n = -n
                for _ in range(n):
                    v, pos = _decode_value(schema["items"], data, pos)
                    items.append(v)
        if t == "map":
            m = {}
            while True:
                n, pos = _zz_decode(data, pos)
                if n == 0:
                    return m, pos
                if n < 0:
                    _, pos = _zz_decode(data, pos)
                    n = -n
                for _ in range(n):
                    k, pos = _decode_value("string", data, pos)
                    v, pos = _decode_value(schema["values"], data, pos)
                    m[k] = v
        schema = t
    if schema in ("long", "int"):
        return _zz_decode(data, pos)
    if schema == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if schema == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if schema == "string":
        n, pos = _zz_decode(data, pos)
        return data[pos:pos + n].decode(), pos + n
    if schema == "bytes":
        n, pos = _zz_decode(data, pos)
        return data[pos:pos + n], pos + n
    if schema == "boolean":
        return bool(data[pos]), pos + 1
    if schema == "null":
        return None, pos
    raise AvroError(f"unsupported schema {schema!r}")


def _skip_value(schema, data: bytes, pos: int) -> int:
    """Advance past a value WITHOUT materializing it — what schema
    resolution does with writer-only fields."""
    _, pos = _decode_value(schema, data, pos)
    return pos


def avro_resolve_read(writer: dict, reader: dict, data: bytes) -> dict:
    """Avro schema RESOLUTION (spec §Schema Resolution): decode a
    record written with ``writer``'s schema into ``reader``'s shape —
    writer-only fields are decoded-and-dropped, reader-only fields take
    their declared ``default``, shared fields match BY NAME (order may
    differ between versions). This is what lets a pipeline read topics
    spanning a schema migration: old consumers skip new columns, new
    consumers backfill defaults for old data."""
    if writer.get("type") != "record" or reader.get("type") != "record":
        raise AvroError("resolution implemented for record schemas")
    reader_fields = {f["name"]: f for f in reader["fields"]}
    out: dict = {}
    pos = 0
    for wf in writer["fields"]:
        rf = reader_fields.get(wf["name"])
        if rf is None:
            pos = _skip_value(wf["type"], data, pos)
            continue
        out[wf["name"]], pos = _decode_value(wf["type"], data, pos)
    if pos != len(data):
        raise AvroError(f"{len(data) - pos} trailing bytes after record")
    writer_names = {f["name"] for f in writer["fields"]}
    for rf in reader["fields"]:
        if rf["name"] not in writer_names:
            if "default" not in rf:
                raise AvroError(
                    f"reader field {rf['name']!r} missing from writer "
                    "and has no default")
            out[rf["name"]] = rf["default"]
    return out


def avro_encode(schema: dict, record: dict) -> bytes:
    out = bytearray()
    _encode_value(schema, record, out)
    return bytes(out)


def avro_decode(schema: dict, data: bytes) -> dict:
    rec, pos = _decode_value(schema, data, 0)
    if pos != len(data):
        raise AvroError(f"{len(data) - pos} trailing bytes after record")
    return rec


# ---------------------------------------------------------------------------
# Confluent schema-registry wire framing
# ---------------------------------------------------------------------------


def confluent_frame(schema_id: int, body: bytes) -> bytes:
    """0x00 magic + int32 BE schema id + Avro binary — the framing
    every schema-registry-integrated producer writes."""
    return b"\x00" + struct.pack(">i", schema_id) + body


def confluent_unframe(data: bytes) -> tuple[int, bytes]:
    if not data or data[0] != 0:
        raise AvroError("not Confluent-framed (missing 0x00 magic)")
    (schema_id,) = struct.unpack_from(">i", data, 1)
    return schema_id, data[5:]


# ---------------------------------------------------------------------------
# Spark operators: change stream <-> Confluent-framed Avro payloads
# ---------------------------------------------------------------------------


def changes_to_avro(changes, schema_id: int = 1):
    """Flat change rows -> ``payload binary`` (Confluent-framed Avro),
    one record per row, inside mapInPandas Arrow batches."""
    import pandas as pd

    spark_schema = changes.schema
    avro_schema = avro_schema_of(spark_schema)

    def op(batches):
        for pdf in batches:
            payloads = []
            for row in pdf.itertuples(index=False):
                rec = {}
                for f, v in zip(spark_schema.fields, row):
                    # pd.isna covers None, float NaN AND pandas NaT
                    if v is None or (not isinstance(v, (list, dict,
                                                        bytes, str))
                                     and pd.isna(v)):
                        rec[f.name] = None
                    elif isinstance(f.dataType,
                                    (T.TimestampType,
                                     T.TimestampNTZType)) and \
                            hasattr(v, "to_pydatetime"):
                        rec[f.name] = v.to_pydatetime()
                    else:
                        rec[f.name] = v
                payloads.append(confluent_frame(
                    schema_id, avro_encode(avro_schema, rec)))
            yield pd.DataFrame({"payload": payloads})

    return changes.mapInPandas(op, "payload binary")


def avro_to_changes(payloads, spark_schema: T.StructType,
                    expect_schema_id: int | None = None):
    """``payload binary`` -> typed change rows through the registry
    framing; a schema-id mismatch surfaces loudly (the reader is pinned
    to the schema it compiled against, like a registry consumer)."""
    import pandas as pd

    avro_schema = avro_schema_of(spark_schema)
    names = [f.name for f in spark_schema.fields]

    def op(batches):
        for pdf in batches:
            rows = []
            for p in pdf["payload"]:
                sid, body = confluent_unframe(bytes(p))
                if expect_schema_id is not None and \
                        sid != expect_schema_id:
                    raise AvroError(
                        f"schema id {sid}, expected {expect_schema_id}")
                rec = avro_decode(avro_schema, body)
                rows.append([rec[n] for n in names])
            yield pd.DataFrame(rows, columns=names)

    return payloads.mapInPandas(op, spark_schema)
