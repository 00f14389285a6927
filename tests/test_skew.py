"""Salted aggregation/join equivalence: skewed plans must produce exactly
the unsalted results."""

from __future__ import annotations

from pyspark.sql import functions as F

from ru_cdc_spark.operators.skew import salted_agg, salted_join
from ru_cdc_spark.sources.readers import load_table


def _skewed_df(spark):
    # one hot key (0) with 10k rows, 50 cold keys with 10 each
    hot = spark.range(10_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(500).select((F.col("id") % 50 + 1).alias("k"),
                                   F.col("id").alias("v"))
    return hot.unionByName(cold)


def test_salted_agg_equals_plain(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    salted = salted_agg(
        df, ["k"],
        aggs=[F.sum("v").alias("s"), F.count("*").alias("n")],
        reaggs=[F.sum("s").alias("s"), F.sum("n").alias("n")],
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders") \
        .select(F.col("o_custkey").alias("k"), "o_orderkey")
    cust = load_table(spark, sf_dir, "customer") \
        .select(F.col("c_custkey").alias("k"), "c_mktsegment")
    plain = orders.join(cust, "k").select("k", "o_orderkey", "c_mktsegment")
    salted = salted_join(orders, cust, "k").select("k", "o_orderkey", "c_mktsegment")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0


def test_approx_distinct_within_bounds(spark, sf_dir):
    """approx_count_distinct (the 100 TB swap-in for exact distincts) lands
    within its documented rsd of the exact answer."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey").alias("d")).collect()[0]["d"]
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("d")).collect()[0]["d"]
    assert abs(approx - exact) / exact < 0.1
