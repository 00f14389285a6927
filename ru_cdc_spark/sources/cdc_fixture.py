"""Deterministic CDC change-stream derivation (FIXTURES.md B1 generator).

The reference consumes a live MySQL binlog; for correctness testing we
derive a *deterministic* INSERT/UPDATE/DELETE stream from the ``orders``
test table so the identical stream is computable by both Spark and the
DuckDB oracle:

* every order yields an INSERT  (id = o_orderkey * 3)
* orders with  o_orderkey % 10 IN (0,1,2)  yield an UPDATE
  (id = o_orderkey * 3 + 1) that sets  o_totalprice += 10.00  and
  o_orderstatus = 'F'  (so the T2 diff sometimes has 1, sometimes 2
  changed columns)
* orders with  o_orderkey % 10 = 3  yield a DELETE (id = o_orderkey * 3 + 2)

``es`` is the order's event time in epoch millis — a deliberate improvement
over the reference, which re-stamps processing time into ``es``
(/root/reference/src/executor.rs:22-26,82; SURVEY.md T7 notes the deviation).

Money transits as DECIMAL(18,2) (exact, F1 semantics) — never double — so
stringified images are scale-stable across engines.

Scale note: the derivation is a single narrow projection + union over the
base scan (no shuffle, no driver work); a 100 TB orders table streams
through it partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ru_cdc_spark.sources.readers import load_table, spread

ORDERS_DATABASE = "testdb"
ORDERS_TABLE = "orders"
ORDERS_PK = ["o_orderkey"]

# catalog entry for the orders table: column -> MySQL type string (the
# analog of the reference's DESC-driven FieldMeta registry,
# /root/reference/src/executor.rs:404-443). Order defines envelope field
# order (T5 contract).
ORDERS_MYSQL_TYPES = {
    "o_orderkey": "bigint(20)",
    "o_custkey": "bigint(20)",
    "o_orderstatus": "char(1)",
    "o_totalprice": "decimal(18,2)",
    "o_orderdate": "datetime(6)",
    "o_orderpriority": "varchar(15)",
}


def _typed_image(prefix: str = "") -> list:
    p = prefix
    return [
        F.col(f"{p}o_orderkey"),
        F.col(f"{p}o_custkey"),
        F.col(f"{p}o_orderstatus"),
        F.col(f"{p}o_totalprice"),
        F.col(f"{p}o_orderdate"),
        F.col(f"{p}o_orderpriority"),
    ]


def derive_order_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the typed change stream: columns
    (id long, type string, es long, before struct, after struct)."""
    base = (
        spread(load_table(spark, sf_dir, "orders"))
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
            "o_orderdate", "o_orderpriority",
            # parquet naive timestamps surface as TIMESTAMP_NTZ in Spark 4;
            # session TZ is pinned to UTC so the cast is lossless and matches
            # DuckDB's epoch_ms() on the same naive value
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("es"),
        )
    )
    img = F.struct(*_typed_image())
    updated_img = F.struct(
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.lit("F").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(10).cast("decimal(18,2)"))
        .cast("decimal(18,2)").alias("o_totalprice"),
        F.col("o_orderdate"),
        F.col("o_orderpriority"),
    )
    null_img = F.when(F.lit(False), img)  # typed NULL struct

    # single pass: each order emits 1-2 change events (one scan, zero
    # extra shuffles — a union of three filtered branches would re-scan
    # and re-spread the base three times). The COMPACT int kind array
    # explodes first and the row images build once per OUTPUT row;
    # exploding fully-built change structs instead triples the per-row
    # struct work (measured 15-20% slower at sf0.1).
    kinds = F.filter(
        F.array(
            F.lit(0),
            F.when(F.col("o_orderkey") % 10 < 3, F.lit(1)),
            F.when(F.col("o_orderkey") % 10 == 3, F.lit(2)),
        ),
        lambda x: x.isNotNull(),
    )
    k = F.col("__k")
    return (
        base.select("*", F.explode(kinds).alias("__k"))
        .select(
            (F.col("o_orderkey") * 3 + k).alias("id"),
            F.when(k == 0, "INSERT").when(k == 1, "UPDATE")
            .otherwise("DELETE").alias("type"),
            F.col("es"),
            F.when(k == 0, null_img).otherwise(img).alias("before"),
            F.when(k == 0, img).when(k == 1, updated_img)
            .otherwise(null_img).alias("after"),
        )
    )


CUSTOMER_DATABASE = "testdb"
CUSTOMER_TABLE = "customer"
CUSTOMER_PK = ["c_custkey"]

CUSTOMER_MYSQL_TYPES = {
    "c_custkey": "bigint(20)",
    "c_name": "varchar(25)",
    "c_nationkey": "int(11)",
    "c_acctbal": "decimal(18,2)",
    "c_mktsegment": "char(10)",
}


def derive_customer_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-table change stream (multi-table CDC parity): every customer
    INSERTs; c_custkey % 5 IN (0,1) UPDATEs (acctbal += 5.25, segment ->
    MACHINERY); c_custkey % 5 = 2 DELETEs. Same single-pass shape as the
    orders derivation."""
    base = (
        spread(load_table(spark, sf_dir, "customer"))
        .select(
            "c_custkey", "c_name", "c_nationkey",
            F.col("c_acctbal").cast("decimal(18,2)").alias("c_acctbal"),
            "c_mktsegment",
            # deterministic event time derived from the key (customer has
            # no timestamp column)
            (F.lit(1_700_000_000_000) + F.col("c_custkey") * 1000).alias("es"),
        )
    )
    img = F.struct("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    updated = F.struct(
        F.col("c_custkey"), F.col("c_name"), F.col("c_nationkey"),
        (F.col("c_acctbal") + F.lit("5.25").cast("decimal(18,2)"))
        .cast("decimal(18,2)").alias("c_acctbal"),
        F.lit("MACHINERY").alias("c_mktsegment"),
    )
    null_img = F.when(F.lit(False), img)

    def change(id_col, type_lit, before, after):
        return F.struct(
            id_col.alias("id"), F.lit(type_lit).alias("type"),
            F.col("es").alias("es"), before.alias("before"), after.alias("after"),
        )

    events = F.filter(
        F.array(
            change(F.col("c_custkey") * 3, "INSERT", null_img, img),
            F.when(F.col("c_custkey") % 5 < 2,
                   change(F.col("c_custkey") * 3 + 1, "UPDATE", img, updated)),
            F.when(F.col("c_custkey") % 5 == 2,
                   change(F.col("c_custkey") * 3 + 2, "DELETE", img, null_img)),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        base.select(F.explode(events).alias("c"))
        .select("c.id", "c.type", "c.es", "c.before", "c.after")
    )


CUSTOMER_CHANGES_ORACLE_CTE = """
WITH cbase AS (
    SELECT c_custkey, c_name, c_nationkey,
           CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal, c_mktsegment,
           1700000000000 + c_custkey * 1000 AS es
    FROM customer
),
cchanges AS (
    SELECT c_custkey * 3 AS id, 'INSERT' AS type, es,
           NULL::BIGINT AS b_custkey, NULL::VARCHAR AS b_name,
           NULL::INTEGER AS b_nationkey, NULL::DECIMAL(18,2) AS b_acctbal,
           NULL::VARCHAR AS b_mktsegment,
           c_custkey AS a_custkey, c_name AS a_name, c_nationkey AS a_nationkey,
           c_acctbal AS a_acctbal, c_mktsegment AS a_mktsegment
    FROM cbase
    UNION ALL
    SELECT c_custkey * 3 + 1, 'UPDATE', es,
           c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           c_custkey, c_name, c_nationkey,
           CAST(c_acctbal + 5.25 AS DECIMAL(18,2)), 'MACHINERY'
    FROM cbase WHERE c_custkey % 5 < 2
    UNION ALL
    SELECT c_custkey * 3 + 2, 'DELETE', es,
           c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           NULL, NULL, NULL, NULL, NULL
    FROM cbase WHERE c_custkey % 5 = 2
)
"""


# DuckDB CTE computing the identical stream, flat (shared prefix for the
# oracle SQL of every cdc_* query). Columns: id, type, es, and the
# before/after images flattened with b_/a_ prefixes.
ORDER_CHANGES_ORACLE_CTE = """
WITH base AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
           o_orderdate, o_orderpriority,
           epoch_ms(o_orderdate) AS es
    FROM orders
),
changes AS (
    SELECT o_orderkey * 3 AS id, 'INSERT' AS type, es,
           NULL::BIGINT AS b_orderkey, NULL::BIGINT AS b_custkey,
           NULL::VARCHAR AS b_orderstatus, NULL::DECIMAL(18,2) AS b_totalprice,
           NULL::TIMESTAMP AS b_orderdate, NULL::VARCHAR AS b_orderpriority,
           o_orderkey AS a_orderkey, o_custkey AS a_custkey,
           o_orderstatus AS a_orderstatus, o_totalprice AS a_totalprice,
           o_orderdate AS a_orderdate, o_orderpriority AS a_orderpriority
    FROM base
    UNION ALL
    SELECT o_orderkey * 3 + 1, 'UPDATE', es,
           o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority,
           o_orderkey, o_custkey, 'F',
           CAST(o_totalprice + 10 AS DECIMAL(18,2)),
           o_orderdate, o_orderpriority
    FROM base WHERE o_orderkey % 10 < 3
    UNION ALL
    SELECT o_orderkey * 3 + 2, 'DELETE', es,
           o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority,
           NULL, NULL, NULL, NULL, NULL, NULL
    FROM base WHERE o_orderkey % 10 = 3
)
"""
