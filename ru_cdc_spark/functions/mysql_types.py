"""MySQL column-type semantics (F1-F8 of SURVEY.md §2.3), Spark-native.

The reference decodes binlog byte images per MySQL type
(``/root/reference/src/binlog.rs:206-334``). In the Spark engine, values
arrive as Canal/Debezium JSON *strings*; this module supplies the semantic
casts from those strings to typed Spark columns, preserving the reference's
edge behaviors:

* F1 decimal exactness (``binlog.rs:17-106``) — parse straight to
  ``DecimalType``; never transit through double.
* F2 zero-date -> NULL (``binlog.rs:249-259``).
* F3 negative TIME values (``binlog.rs:260-277``).
* F5 TIMESTAMP epoch-seconds + fractional part (``binlog.rs:302-310``).
* F6 fractional-second scaling, fsp 0-6 (``mysql.rs:379-400``).
* F7/F8 TEXT -> UTF-8 string, BLOB -> binary (``executor.rs:224-236``).

All are Column -> Column built-in-function compositions (whole-stage
codegen eligible); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cast_decimal(col: Column, precision: int = 38, scale: int = 6) -> Column:
    """F1: exact decimal from wire string. CAST(string AS decimal) in Spark
    parses decimal text exactly (no double round-trip)."""
    return col.cast(T.DecimalType(precision, scale))


def zero_date_to_null(col: Column) -> Column:
    """F2: MySQL zero-date ('0000-00-00', or '' ) -> NULL, else DATE.

    The reference emits NULL when the packed date bitfield is zero
    (binlog.rs:252-254); MySQL also permits zero month/day which Spark's
    ANSI parser rejects — to_date returns NULL for those via try semantics.
    """
    s = F.trim(col)
    return F.when(
        s.isNull() | (s == "") | s.startswith("0000-00-00"), F.lit(None).cast(T.DateType())
    ).otherwise(F.try_to_timestamp(s, F.lit("yyyy-MM-dd")).cast(T.DateType()))


def time_to_microseconds(col: Column) -> Column:
    """F3: MySQL TIME string ('[-]HHH:MM:SS[.ffffff]') -> signed microseconds.

    Preserves the reference's negative-time semantics (sign bit +
    two's-complement handling, binlog.rs:260-277) in a range-safe integer
    representation (MySQL TIME spans -838:59:59..838:59:59 which does not
    fit a Spark TimestampType time-of-day).
    """
    s = F.trim(col)
    sign = F.when(s.startswith("-"), F.lit(-1)).otherwise(F.lit(1)).cast("long")
    body = F.regexp_replace(s, r"^-", "")
    h = F.split(body, ":").getItem(0).cast("long")
    m = F.split(body, ":").getItem(1).cast("long")
    sec_part = F.split(body, ":").getItem(2)
    sec = F.split(sec_part, r"\.").getItem(0).cast("long")
    frac = F.when(
        sec_part.contains("."),
        F.rpad(F.split(sec_part, r"\.").getItem(1), 6, "0").cast("long"),
    ).otherwise(F.lit(0))
    total = (h * 3600 + m * 60 + sec) * F.lit(1_000_000) + frac
    return (sign * total).alias("time_us")


def time_to_native(col: Column) -> Column:
    """F3 (native form): MySQL TIME wire string -> Spark ``TimeType``.

    Spark 4.1 adds a native TIME type (behind the runtime conf
    ``spark.sql.timeType.enabled``); for the common in-day range
    (00:00:00..23:59:59.999999) it is the faithful relational target for
    MySQL TIME columns — SURVEY.md §1.2's "no native TIME" mapping note
    predates it. Out-of-range MySQL values (TIME spans -838:59:59..
    838:59:59, ``binlog.rs:260-277``) do not fit a time-of-day and yield
    NULL here; duration-style columns should keep
    :func:`time_to_microseconds`, which preserves the full signed range.
    """
    return F.try_to_time(F.trim(col))


def timestamp_from_epoch(col: Column) -> Column:
    """F5: 'epoch_seconds[.micros]' wire string -> TimestampType.

    The reference emits TIMESTAMP as a decimal-seconds string
    (binlog.rs:302-310); Spark's cast from decimal seconds preserves
    microseconds exactly.
    """
    return F.timestamp_seconds(col.cast(T.DecimalType(20, 6)))


def truncate_fsp(ts: Column, fsp: int) -> Column:
    """F6: truncate a timestamp's fractional seconds to ``fsp`` digits
    (0-6), mirroring the wire's per-column fractional precision."""
    if not 0 <= fsp <= 6:
        raise ValueError(f"fsp must be 0..6, got {fsp}")
    if fsp == 6:
        return ts
    micros_scale = 10 ** (6 - fsp)
    us = F.unix_micros(ts)
    truncated = (us - (((us % 1_000_000) + 1_000_000) % 1_000_000) % micros_scale)
    return F.timestamp_micros(truncated)


def text_to_string(col: Column) -> Column:
    """F7: TEXT byte payload -> UTF-8 string (executor.rs:224-229)."""
    return F.decode(col, "UTF-8")


def blob_to_base64(col: Column) -> Column:
    """F8: BLOB byte payload -> transport-safe base64 string.

    Deliberate deviation from the reference, which runs BLOB bytes through a
    UTF-16 reinterpretation (executor.rs:231-236) — lossy for arbitrary
    binary. We keep bytes intact; documented as an improvement.
    """
    return F.base64(col)


def year_to_short(col: Column) -> Column:
    """YEAR wire value -> ShortType (1900 + u8 on the wire, binlog.rs:298-301;
    from JSON we receive the 4-digit year string)."""
    return col.cast(T.ShortType())


def reinterpret_unsigned(col: Column, byte_width: int) -> Column:
    """UNSIGNED column semantics the reference LOSES (SURVEY §1.2: its
    TINY/SHORT reads drop the sign outright, and signedness is not on
    the wire at all — MySQL puts it in the catalog, ``DESC``'s
    ``... unsigned`` suffix). The binlog value decodes SIGNED
    (binlog_wire policy); this reinterprets the two's-complement bits as
    the unsigned value when the catalog says so.

    Widths 1-4 fit in LongType via a bitmask; width 8 (BIGINT UNSIGNED)
    exceeds int64 and comes back as DECIMAL(20,0) — exact, as MySQL
    clients surface it."""
    from pyspark.sql import functions as F

    if byte_width < 8:
        return col.bitwiseAND((1 << (8 * byte_width)) - 1)
    if byte_width == 8:
        two64 = F.lit("18446744073709551616").cast("decimal(21,0)")
        wide = col.cast("decimal(21,0)")
        return (F.when(col < 0, wide + two64).otherwise(wide)
                .cast("decimal(20,0)"))
    raise ValueError(f"unsupported integer width {byte_width}")
