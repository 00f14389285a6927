"""Golden vectors for the MySQL type-semantics layer (F1-F9, SURVEY.md §2.3)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from ru_cdc_spark.functions.mysql_types import (
    blob_to_base64,
    cast_decimal,
    time_to_microseconds,
    timestamp_from_epoch,
    truncate_fsp,
    zero_date_to_null,
)
from ru_cdc_spark.functions.typemap import jdbc_type_code, mysql_type_to_spark


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


# --- F1 decimal exactness (reference binlog.rs:17-106) ----------------------

@pytest.mark.parametrize("text,expected", [
    ("-0.000001", Decimal("-0.000001")),
    ("99999999999999.999999", Decimal("99999999999999.999999")),
    ("0.000000", Decimal("0.000000")),
    ("-12345678901234.500001", Decimal("-12345678901234.500001")),
])
def test_decimal_exact(spark, text, expected):
    got = _eval(spark, cast_decimal(F.lit(text), 20, 6))
    assert got == expected


def test_decimal_never_double(spark):
    # a value that double would corrupt: 0.1 + 0.2 style tail digits
    got = _eval(spark, cast_decimal(F.lit("0.300000000000000004"), 38, 18))
    assert str(got) == "0.300000000000000004"


# --- F2 zero-date -> NULL (binlog.rs:249-259) --------------------------------

@pytest.mark.parametrize("text,expected_null", [
    ("0000-00-00", True),
    ("", True),
    ("2024-02-29", False),
    ("1970-01-01", False),
])
def test_zero_date(spark, text, expected_null):
    got = _eval(spark, zero_date_to_null(F.lit(text)))
    assert (got is None) is expected_null
    if not expected_null:
        assert got.isoformat() == text


# --- F3 negative TIME (binlog.rs:260-277) ------------------------------------

@pytest.mark.parametrize("text,expected_us", [
    ("-01:02:03.004", -(3723 * 1_000_000 + 4_000)),
    ("01:02:03.004", 3723 * 1_000_000 + 4_000),
    ("00:00:00", 0),
    ("838:59:59", (838 * 3600 + 59 * 60 + 59) * 1_000_000),   # MySQL TIME max
    ("-838:59:59", -((838 * 3600 + 59 * 60 + 59) * 1_000_000)),
    ("00:00:00.5", 500_000),                                   # frac right-pad
])
def test_time_microseconds(spark, text, expected_us):
    assert _eval(spark, time_to_microseconds(F.lit(text))) == expected_us


# --- F5 TIMESTAMP epoch string (binlog.rs:302-310) ---------------------------

def test_timestamp_from_epoch(spark):
    got = _eval(spark, timestamp_from_epoch(F.lit("1700000000.123456")))
    assert got.isoformat() == "2023-11-14T22:13:20.123456"


# --- F6 fsp truncation (mysql.rs:379-400) ------------------------------------

@pytest.mark.parametrize("fsp,expected_frac", [
    (0, "2023-11-14 22:13:20"),
    (2, "2023-11-14 22:13:20.12"),
    (4, "2023-11-14 22:13:20.1234"),
    (6, "2023-11-14 22:13:20.123456"),
])
def test_truncate_fsp(spark, fsp, expected_frac):
    base = timestamp_from_epoch(F.lit("1700000000.123456"))
    got = _eval(spark, F.date_format(truncate_fsp(base, fsp),
                                     "yyyy-MM-dd HH:mm:ss" + (".".ljust(1) + "S" * fsp if fsp else "")))
    assert got == expected_frac


def test_truncate_fsp_rejects_bad_fsp():
    with pytest.raises(ValueError):
        truncate_fsp(F.lit("x"), 7)


# --- F8 BLOB stays binary-safe ------------------------------------------------

def test_blob_base64(spark):
    got = _eval(spark, blob_to_base64(F.lit(bytes([0, 255, 128, 10]))))
    import base64
    assert base64.b64decode(got) == bytes([0, 255, 128, 10])


# --- F9 JDBC type-code map (executor.rs:352-400) ------------------------------

@pytest.mark.parametrize("mysql_type,code", [
    ("tinyint(1)", -6),
    ("smallint(5) unsigned", 5),
    ("mediumint(9)", 4),
    ("int(11)", 4),
    ("integer", 4),
    ("bigint(20)", -5),
    ("float", 7),
    ("double", 8),
    ("decimal(20,6)", 3),
    ("date", 91),
    ("time(3)", 92),
    ("year(4)", 12),
    ("datetime(6)", 93),
    ("timestamp", 93),
    ("char(10)", 1),
    ("varchar(300)", 12),
    ("blob", 2004),
    ("mediumblob", 2004),
    ("longblob", 2004),
    ("text", 2005),
    ("tinytext", 2005),
    ("geometry", -999),
])
def test_jdbc_type_code(mysql_type, code):
    assert jdbc_type_code(mysql_type) == code


@pytest.mark.parametrize("mysql_type,spark_name", [
    ("tinyint(1)", "tinyint"),
    ("decimal(20,6)", "decimal(20,6)"),
    ("datetime(6)", "timestamp"),
    ("varchar(300)", "string"),
    ("mediumblob", "binary"),
    ("year(4)", "smallint"),
])
def test_mysql_type_to_spark(mysql_type, spark_name):
    assert mysql_type_to_spark(mysql_type).simpleString() == spark_name


def test_reinterpret_unsigned_all_widths(spark):
    from pyspark.sql import functions as F

    from ru_cdc_spark.functions.mysql_types import reinterpret_unsigned

    df = spark.createDataFrame(
        [(-128, -32768, -2147483648, -1), (127, 32767, 2147483647, -7),
         (-1, -1, -1, 9223372036854775807)],
        "t long, s long, i long, b long")
    out = df.select(
        reinterpret_unsigned(F.col("t"), 1).alias("u1"),
        reinterpret_unsigned(F.col("s"), 2).alias("u2"),
        reinterpret_unsigned(F.col("i"), 4).alias("u4"),
        reinterpret_unsigned(F.col("b"), 8).cast("string").alias("u8"),
    ).collect()
    assert (out[0]["u1"], out[0]["u2"], out[0]["u4"]) == (
        128, 32768, 2147483648)
    assert out[0]["u8"] == "18446744073709551615"   # -1 -> 2^64 - 1
    assert (out[1]["u1"], out[1]["u2"], out[1]["u4"]) == (
        127, 32767, 2147483647)                     # positives unchanged
    assert out[1]["u8"] == "18446744073709551609"   # -7
    assert (out[2]["u1"], out[2]["u2"], out[2]["u4"]) == (
        255, 65535, 4294967295)
    assert out[2]["u8"] == "9223372036854775807"    # max int64 unchanged


def test_time_to_native_range_and_null(spark):
    import datetime

    from pyspark.sql import functions as F

    from ru_cdc_spark.functions.mysql_types import time_to_native

    spark.conf.set("spark.sql.timeType.enabled", "true")
    df = spark.createDataFrame(
        [("07:05:06.123456",), ("23:59:59.999999",), ("00:00:00",),
         ("838:59:59",), ("-01:00:00",), (None,)], "w string")
    out = [r["t"] for r in df.select(time_to_native(F.col("w")).alias("t")).collect()]
    assert out[0] == datetime.time(7, 5, 6, 123456)
    assert out[1] == datetime.time(23, 59, 59, 999999)
    assert out[2] == datetime.time(0, 0, 0)
    # out-of-day-range and negative MySQL TIMEs cannot be a time-of-day
    assert out[3] is None and out[4] is None and out[5] is None
