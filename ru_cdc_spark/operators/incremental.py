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


def join_revenue_from_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN + aggregate view: revenue by
    order priority over (surviving orders ⋈ lineitem), computed purely
    from change-stream deltas — never from a materialized snapshot.

    Delta algebra for the view V = γ(priority; Δorders ⋈ lineitem): each
    change carries a multiplicity weight (INSERT +1, DELETE -1, UPDATE
    after-minus-before = 0 here since neither the join key nor the group
    key changes), and the view delta is weight x the order's lineitem
    revenue. Summing weights per key yields exactly the surviving-order
    indicator, so the incremental result equals the snapshot recompute —
    which is what the oracle checks.

    Scale: the per-order revenue aggregate shuffles lineitem once on its
    join key; the delta side is a narrow projection of the change stream;
    their join is co-partitioned on o_orderkey. Each micro-batch adds its
    weighted deltas to the stored view (foreachBatch in production) —
    O(|batch| + |touched groups|) work, independent of table size.
    """
    from ru_cdc_spark.sources.readers import load_table

    ch = derive_order_changes(spark, sf_dir)
    t = F.col("type")
    weight = F.when(t == "INSERT", 1).when(t == "DELETE", -1).otherwise(0)
    deltas = ch.select(
        F.coalesce(F.col("after.o_orderkey"), F.col("before.o_orderkey"))
        .alias("o_orderkey"),
        F.coalesce(F.col("after.o_orderpriority"),
                   F.col("before.o_orderpriority")).alias("o_orderpriority"),
        weight.alias("w"),
    ).where(F.col("w") != 0)

    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(4,2)")
              - F.col("l_discount").cast("decimal(4,2)"))).cast("decimal(30,4)")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(rev).cast("decimal(38,4)").alias("order_rev"))

    return (
        deltas.join(per_order, deltas.o_orderkey == per_order.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("w").alias("n_orders"),
             F.sum(F.col("w") * F.col("order_rev")).cast("decimal(38,4)")
             .cast("double").alias("revenue"))
    )


def _join_oracle() -> str:
    from ru_cdc_spark.sources.cdc_fixture import ORDER_CHANGES_ORACLE_CTE

    # ground truth: the JOIN + aggregate over the MERGED snapshot — the
    # incremental deltas must reproduce it exactly
    return ORDER_CHANGES_ORACLE_CTE + """
, snap AS (
    SELECT a_orderkey AS o_orderkey, a_orderpriority AS o_orderpriority
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY COALESCE(a_orderkey, b_orderkey)
            ORDER BY id DESC) AS rn
        FROM changes
    ) WHERE rn = 1 AND type <> 'DELETE'
)
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
            AS DECIMAL(30,4))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
           AS revenue
FROM snap JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


JOIN_REVENUE_FROM_DELTAS_SQL = _join_oracle()
