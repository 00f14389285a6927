"""Incremental (materialized-view) maintenance from a CDC change stream.

The headline CDC consumer use case: keep an aggregate up to date from the
change stream WITHOUT recomputing over the base table. Each change
contributes an algebraic delta:

    INSERT  -> +after
    DELETE  -> -before
    UPDATE  -> after - before

Summing deltas per group reproduces exactly the aggregate of the merged
snapshot — the equivalence the oracle checks. This is the streaming-MV
pattern (Materialize/ksqlDB semantics) on Spark: in production the same
delta frame runs under foreachBatch, adding each micro-batch's deltas to
the stored aggregate.

Scale: deltas are a narrow projection; the only shuffle is the group-by —
aggregate state is O(|groups|), never O(|rows|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ru_cdc_spark.sources.cdc_fixture import derive_order_changes


def customer_totals_from_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order count + total spend maintained purely from
    change deltas (never touching a materialized snapshot)."""
    ch = derive_order_changes(spark, sf_dir)
    t = F.col("type")
    zero = F.lit(0).cast("decimal(18,2)")
    plus_after = F.when(t.isin("INSERT", "UPDATE"),
                        F.col("after.o_totalprice")).otherwise(zero)
    minus_before = F.when(t.isin("DELETE", "UPDATE"),
                          F.col("before.o_totalprice")).otherwise(zero)
    deltas = ch.select(
        F.coalesce(F.col("after.o_custkey"), F.col("before.o_custkey")).alias("o_custkey"),
        F.when(t == "INSERT", 1).when(t == "DELETE", -1).otherwise(0).alias("n_delta"),
        (plus_after - minus_before).alias("spend_delta"),
    )
    return (
        deltas.groupBy("o_custkey")
        .agg(F.sum("n_delta").alias("n_orders"),
             F.sum("spend_delta").cast("decimal(38,2)").cast("double")
             .alias("total_spend"))
        .where(F.col("n_orders") > 0)
    )


def _oracle() -> str:
    from ru_cdc_spark.sources.cdc_fixture import ORDER_CHANGES_ORACLE_CTE

    # ground truth: aggregate of the MERGED snapshot (latest-wins, deletes
    # dropped) — incremental deltas must reproduce it exactly
    return ORDER_CHANGES_ORACLE_CTE + """
, snapshot AS (
    SELECT a_custkey AS o_custkey, a_totalprice AS o_totalprice
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY COALESCE(a_orderkey, b_orderkey)
            ORDER BY id DESC) AS rn
        FROM changes
    ) WHERE rn = 1 AND type <> 'DELETE'
)
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(CAST(CAST(SUM(o_totalprice) AS DECIMAL(38,2)) AS VARCHAR)
            AS DOUBLE) AS total_spend
FROM snapshot GROUP BY o_custkey
"""


CUSTOMER_TOTALS_FROM_DELTAS_SQL = _oracle()
