"""Bucketed warehouse tables: shuffle-free co-located joins.

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Bucketing
both tables on the join key at write time (`bucketBy(n, key)` +
`saveAsTable`) lets Spark's FileSourceScan report a HashPartitioning that
matches the join requirement — SortMergeJoin runs with ZERO exchanges.

This module materializes bucketed copies of the test tables into a local
warehouse and exposes the co-located join; tests/test_plans assert the
exchange-free plan. The write itself is the one-time cost (amortized over
every downstream join in a real pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ru_cdc_spark.sources.readers import load_table

N_BUCKETS = 8


def write_bucketed(spark: SparkSession, sf_dir: str, table: str, key: str,
                   n_buckets: int = N_BUCKETS, suffix: str = "_bkt") -> str:
    """Materialize a bucketed+sorted copy of a test table into the session
    warehouse; returns the table name. Sorted buckets additionally skip
    the sort inside SortMergeJoin."""
    name = f"{table}{suffix}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a previous session may have left the managed location behind without
    # catalog metadata (in-memory catalog) — clear it
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    (load_table(spark, sf_dir, table)
     .write.mode("overwrite")
     .bucketBy(n_buckets, key).sortBy(key)
     .format("parquet")
     .saveAsTable(name))
    return name


def colocated_order_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem on orderkey with both sides bucketed on the key:
    the JOIN runs with no shuffle exchange (asserted in test_plans) — at
    100 TB this is the fact⋈fact strategy; only the final tiny group-by
    shuffles. Quantity sums transit DECIMAL and emit as double (the
    engine-wide oracle-exactness policy)."""
    from pyspark.sql import functions as F

    orders_t = write_bucketed(spark, sf_dir, "orders", "o_orderkey")
    li_t = write_bucketed(spark, sf_dir, "lineitem", "l_orderkey")
    orders = spark.table(orders_t)
    li = spark.table(li_t)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .cast("decimal(38,2)").cast("double").alias("sum_qty"))
    )


COLOCATED_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""
