"""Debezium-envelope interop: encode/decode the *other* standard MySQL CDC
JSON format.

The reference emits Canal-compatible JSON only (format_json,
/root/reference/src/executor.rs:120-222). A Spark-native engine sitting in
a real pipeline must also accept the Debezium shape — `{before, after,
op: c|u|d, ts_ms, source: {db, table}}` — because that's what Kafka
Connect/Debezium upstreams produce. This module converts between the
engine's unified typed change model

    (id long, type string, es long, before struct, after struct)

and Debezium JSON strings, both directions, as pure `to_json`/`from_json`
expression work (no shuffle, no Python).

Scale: both directions are narrow codegen'd projections fused into the
scan; the decode keeps the two-phase discipline (route on the cheap
`source` block before parsing the full typed envelope) exactly like the
Canal path (streaming/pipeline.routed, P5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OP_FROM_TYPE = {"INSERT": "c", "UPDATE": "u", "DELETE": "d"}


def changes_to_debezium(changes: DataFrame, database: str,
                        table: str) -> DataFrame:
    """Unified change stream -> Debezium JSON payload strings, keeping
    (database, table, id) outside the payload for route-before-parse."""
    op = F.when(F.col("type") == "INSERT", "c") \
         .when(F.col("type") == "UPDATE", "u") \
         .otherwise("d")
    payload = F.to_json(F.struct(
        F.col("before"),
        F.col("after"),
        F.struct(F.lit(database).alias("db"),
                 F.lit(table).alias("table")).alias("source"),
        op.alias("op"),
        F.col("es").alias("ts_ms"),
        F.col("id").alias("txId"),
    ))
    return changes.select(
        F.lit(database).alias("database"), F.lit(table).alias("table"),
        F.col("id"), payload.alias("payload"))


def debezium_source_schema() -> T.StructType:
    """The cheap routing prefix — parse ONLY this to route, never the
    row images (the reference's filter-before-decode, executor.rs:528-537)."""
    return T.StructType([
        T.StructField("source", T.StructType([
            T.StructField("db", T.StringType()),
            T.StructField("table", T.StringType()),
        ])),
        T.StructField("op", T.StringType()),
    ])


def debezium_to_changes(payloads: DataFrame, row_schema: T.StructType,
                        payload_col: str = "payload") -> DataFrame:
    """Debezium JSON payload strings -> the unified typed change model.

    ``row_schema`` is the per-table image StructType from the catalog
    (the TABLE_MAP/DESC analog). op codes map c/r -> INSERT (r =
    snapshot read), u -> UPDATE, d -> DELETE.
    """
    env_schema = T.StructType([
        T.StructField("before", row_schema),
        T.StructField("after", row_schema),
        T.StructField("source", T.StructType([
            T.StructField("db", T.StringType()),
            T.StructField("table", T.StringType()),
        ])),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("txId", T.LongType()),
    ])
    env = payloads.withColumn("__e", F.from_json(F.col(payload_col), env_schema))
    typ = (F.when(F.col("__e.op").isin("c", "r"), "INSERT")
           .when(F.col("__e.op") == "u", "UPDATE")
           .otherwise("DELETE"))
    return env.select(
        F.col("__e.txId").alias("id"),
        typ.alias("type"),
        F.col("__e.ts_ms").alias("es"),
        F.col("__e.before").alias("before"),
        F.col("__e.after").alias("after"),
    )
