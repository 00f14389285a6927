"""MySQL type-string -> JDBC type code and Spark type mapping.

Reproduces the reference's prefix-matching classifier (F9,
``/root/reference/src/executor.rs:352-400``): the Canal envelope carries a
``sqlType`` map of column -> JDBC code and a ``mysqlType`` map of
column -> MySQL type string. Prefix order matters (e.g. ``tinyint`` must be
tested before ``int``; ``datetime``/``timestamp`` before ``time``) — the
reference gets this via an explicit if-chain; we keep an ordered list.
"""

from __future__ import annotations

from pyspark.sql import types as T

# (prefix, jdbc_code) in reference test order (src/executor.rs:352-400)
_PREFIX_CODES: list[tuple[str, int]] = [
    ("tinyint", -6),
    ("smallint", 5),
    ("mediumint", 4),
    ("bigint", -5),
    ("int", 4),
    ("float", 7),
    ("double", 8),
    ("decimal", 3),
    ("date", 91),       # NB: 'datetime' must win over 'date' — handled below
    ("time", 92),       # 'timestamp' must win over 'time'
    ("year", 12),
    ("datetime", 93),
    ("timestamp", 93),
    ("char", 1),
    ("varchar", 12),
]

# longest-prefix-first resolution table (the reference's if-chain tests
# datetime/timestamp explicitly before the date/time catches; model that by
# sorting on prefix length)
_ORDERED = sorted(_PREFIX_CODES, key=lambda p: -len(p[0]))

JDBC_TYPE_CODES: dict[str, int] = {p: c for p, c in _PREFIX_CODES}

_UNKNOWN = -999
_BLOB_CODE = 2004
_TEXT_CODE = 2005


def jdbc_type_code(mysql_type: str) -> int:
    """Map a MySQL type string (e.g. ``varchar(300)``) to its JDBC code.

    Blob/text suffix classes (``*blob`` -> 2004, ``*text`` -> 2005) follow
    src/executor.rs:386-396; unknown -> -999 (src/executor.rs:398).
    """
    t = mysql_type.strip().lower()
    base = t.split("(", 1)[0].strip()
    for prefix, code in _ORDERED:
        if base.startswith(prefix):
            return code
    if base.endswith("blob") or base == "blob":
        return _BLOB_CODE
    if base.endswith("text") or base == "text":
        return _TEXT_CODE
    return _UNKNOWN


def mysql_type_to_spark(mysql_type: str) -> T.DataType:
    """Map a MySQL column type string to the Spark type used for the
    materialized table (SURVEY.md §1.2 table)."""
    t = mysql_type.strip().lower()
    base = t.split("(", 1)[0].strip()
    if base == "tinyint":
        return T.ByteType()
    if base in ("smallint", "year"):
        return T.ShortType()
    if base in ("mediumint", "int", "integer"):
        return T.IntegerType()
    if base == "bigint":
        return T.LongType()
    if base == "float":
        return T.FloatType()
    if base in ("double", "real"):
        return T.DoubleType()
    if base in ("decimal", "numeric"):
        # precision/scale from the declaration, default (10, 0) like MySQL
        inner = t[t.find("(") + 1 : t.find(")")] if "(" in t else ""
        if inner:
            parts = [int(x) for x in inner.split(",")]
            prec, scale = parts[0], parts[1] if len(parts) > 1 else 0
        else:
            prec, scale = 10, 0
        return T.DecimalType(prec, scale)
    if base == "date":
        return T.DateType()
    if base in ("datetime", "timestamp"):
        return T.TimestampType()
    if base == "time":
        return T.StringType()  # no native TIME in Spark; keep wire string
    if base.endswith("blob") or base == "binary" or base == "varbinary":
        return T.BinaryType()
    return T.StringType()  # char/varchar/*text/enum/set fall back to string
