"""Avro binary codec + Confluent framing (sources/avro_cdc.py)."""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from ru_cdc_spark.sources.avro_cdc import (
    AvroError,
    avro_decode,
    avro_encode,
    avro_schema_of,
    confluent_frame,
    confluent_unframe,
)

_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("price", T.DoubleType(), True),
    T.StructField("d", T.DateType(), True),
    T.StructField("ts", T.TimestampNTZType(), True),
    T.StructField("dec", T.DecimalType(12, 2), True),
    T.StructField("flag", T.BooleanType(), True),
    T.StructField("blob", T.BinaryType(), True),
])


class TestCodec:
    def test_full_record_roundtrip(self):
        sch = avro_schema_of(_SCHEMA)
        rec = {"id": 42, "name": "héllo", "price": 3.25,
               "d": date(2020, 5, 17),
               "ts": datetime(2021, 3, 4, 5, 6, 7, 123456),
               "dec": Decimal("-12345.67"), "flag": True,
               "blob": b"\x00\xff\x01"}
        assert avro_decode(sch, avro_encode(sch, rec)) == rec

    def test_all_nulls_roundtrip(self):
        sch = avro_schema_of(_SCHEMA)
        rec = {f.name: (1 if f.name == "id" else None)
               for f in _SCHEMA.fields}
        assert avro_decode(sch, avro_encode(sch, rec)) == rec

    def test_zigzag_edges(self):
        sch = avro_schema_of(T.StructType(
            [T.StructField("v", T.LongType(), False)]))
        for v in (0, -1, 1, 63, -64, 2**62, -(2**62)):
            assert avro_decode(sch, avro_encode(sch, {"v": v})) == {"v": v}

    def test_decimal_negative_and_scale(self):
        sch = avro_schema_of(T.StructType(
            [T.StructField("m", T.DecimalType(20, 4), False)]))
        for s in ("0.0001", "-99999999999999.9999", "12.3400"):
            rec = {"m": Decimal(s)}
            out = avro_decode(sch, avro_encode(sch, rec))
            assert out["m"] == rec["m"]

    def test_trailing_bytes_rejected(self):
        sch = avro_schema_of(T.StructType(
            [T.StructField("v", T.LongType(), False)]))
        with pytest.raises(AvroError, match="trailing"):
            avro_decode(sch, avro_encode(sch, {"v": 1}) + b"\x00")

    def test_nullable_union_layout(self):
        """Nullable fields must be ["null", T] unions — the Avro
        convention every registry consumer expects."""
        sch = avro_schema_of(_SCHEMA)
        by_name = {f["name"]: f["type"] for f in sch["fields"]}
        assert by_name["id"] == "long"
        assert by_name["name"] == ["null", "string"]
        assert by_name["dec"][1]["logicalType"] == "decimal"


class TestConfluentFraming:
    def test_frame_layout(self):
        f = confluent_frame(1234, b"body")
        assert f[0] == 0
        assert int.from_bytes(f[1:5], "big") == 1234
        assert f[5:] == b"body"
        assert confluent_unframe(f) == (1234, b"body")

    def test_unframed_rejected(self):
        with pytest.raises(AvroError, match="magic"):
            confluent_unframe(b"\x01not framed")


class TestSparkOperators:
    def test_schema_id_mismatch_surfaces(self, spark, sf_dir):
        from pyspark.sql import functions as F
        from ru_cdc_spark.sources.avro_cdc import (
            avro_to_changes,
            changes_to_avro,
        )
        from ru_cdc_spark.sources.cdc_fixture import derive_order_changes

        flat = derive_order_changes(spark, sf_dir).select(
            "id", "type").limit(10)
        payloads = changes_to_avro(flat, schema_id=1)
        bad = avro_to_changes(payloads, flat.schema, expect_schema_id=2)
        with pytest.raises(Exception, match="schema id"):
            bad.collect()


class TestSchemaResolution:
    def test_writer_only_fields_skipped_reader_defaults_filled(self):
        from pyspark.sql import types as T
        from ru_cdc_spark.sources.avro_cdc import avro_resolve_read

        writer_t = T.StructType([
            T.StructField("b", T.StringType(), True),   # shuffled order
            T.StructField("extra", T.LongType(), True), # writer-only
            T.StructField("a", T.LongType(), False),
        ])
        reader_t = T.StructType([
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
            T.StructField("c", T.StringType(), True),   # reader-only
        ])
        w = avro_schema_of(writer_t)
        r = avro_schema_of(reader_t)
        for f in r["fields"]:
            if f["name"] == "c":
                f["default"] = "dflt"
        body = avro_encode(w, {"b": "x", "extra": 99, "a": 7})
        out = avro_resolve_read(w, r, body)
        assert out == {"a": 7, "b": "x", "c": "dflt"}

    def test_missing_default_raises(self):
        from pyspark.sql import types as T
        from ru_cdc_spark.sources.avro_cdc import avro_resolve_read

        w = avro_schema_of(T.StructType(
            [T.StructField("a", T.LongType(), False)]))
        r = avro_schema_of(T.StructType(
            [T.StructField("a", T.LongType(), False),
             T.StructField("nodefault", T.StringType(), True)]))
        body = avro_encode(w, {"a": 1})
        with pytest.raises(AvroError, match="default"):
            avro_resolve_read(w, r, body)
