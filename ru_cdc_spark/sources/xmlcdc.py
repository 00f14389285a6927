"""XML change-record interop: a third wire format for the change model.

The reference speaks Canal JSON only (format_json,
/root/reference/src/executor.rs:120-222); this engine already adds the
Debezium JSON shape (sources/debezium.py). Enterprise CDC feeds (JMS
bridges, legacy ESBs, SOAP-era exports) routinely carry change records as
XML instead — Spark 4 makes that a first-class format (`to_xml` /
`from_xml` are JVM expressions, XML is a native batch/stream source), so
the conversion is the same narrow codegen'd projection as the JSON paths:
no shuffle, no Python.

Wire shape (one document per change record):

    <ROW>
        <id>..</id><type>INSERT|UPDATE|DELETE</type><es>..</es>
        <database>..</database><table>..</table>
        <before>...typed column elements...</before>
        <after>...</after>
    </ROW>

Decimals and NTZ timestamps survive the text boundary exactly (decimal
digits verbatim; ISO-8601 with fixed millis), which is oracle-checked in
``cdc_xml_roundtrip``.

Scale: encode and decode fuse into the scan stage. The decode keeps the
route-before-parse discipline: ``xml_routing_prefix`` parses only the two
routing elements with a cheap narrow schema; the full per-table row-image
schema is applied after filtering, mirroring the reference's
filter-before-decode (executor.rs:528-537, P5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def changes_to_xml(changes: DataFrame, database: str, table: str) -> DataFrame:
    """Unified change stream (id, type, es, before, after) -> one XML
    document per record, with (database, table, id) also kept as columns
    so routing never touches the document body."""
    doc = F.to_xml(F.struct(
        F.col("id"), F.col("type"), F.col("es"),
        F.lit(database).alias("database"), F.lit(table).alias("table"),
        F.col("before"), F.col("after"),
    ))
    return changes.select(
        F.lit(database).alias("database"), F.lit(table).alias("table"),
        F.col("id"), doc.alias("payload"))


def xml_routing_prefix(payloads: DataFrame,
                       payload_col: str = "payload") -> DataFrame:
    """Parse ONLY the routing elements (database, table, type) — the cheap
    prefix used to drop unrouted documents before the row images are
    decoded."""
    prefix = T.StructType([
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),
    ])
    return payloads.withColumn(
        "__route", F.from_xml(F.col(payload_col), prefix))


def xml_to_changes(payloads: DataFrame, row_schema: T.StructType,
                   payload_col: str = "payload") -> DataFrame:
    """XML documents -> the unified typed change model, using the
    per-table image StructType from the catalog (TABLE_MAP/DESC analog)."""
    env_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("es", T.LongType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("before", row_schema),
        T.StructField("after", row_schema),
    ])
    env = payloads.withColumn("__e", F.from_xml(F.col(payload_col), env_schema))
    return env.select(
        F.col("__e.id").alias("id"),
        F.col("__e.type").alias("type"),
        F.col("__e.es").alias("es"),
        F.col("__e.before").alias("before"),
        F.col("__e.after").alias("after"),
    )
