"""Bloom runtime-pruning semi-join: the filter must be a superset of the
true match set (no false negatives — guaranteed by Bloom construction),
must actually prune, and the closing exact join must equal the plain
semi-join bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from ru_cdc_spark.operators.bloomjoin import (
    bloom_filter_column,
    bloom_pruned_semi_join,
    build_bloom_words,
)
from ru_cdc_spark.sources.readers import load_table


def test_bloom_no_false_negatives_and_prunes(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    build = load_table(spark, sf_dir, "customer").where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 8000))

    words = build_bloom_words(build, "c_custkey")
    survivors = (orders.withColumn("__bloom_words", F.lit(words))
                 .where(bloom_filter_column("o_custkey", words, 1 << 16))
                 .drop("__bloom_words"))
    exact = orders.join(
        build.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        "o_custkey", "left_semi")

    n_total = orders.count()
    n_surv = survivors.count()
    n_exact = exact.count()
    # no false negatives: every true match survives the filter
    assert exact.join(survivors.select("o_orderkey"), "o_orderkey",
                      "left_anti").count() == 0
    # the filter genuinely prunes the probe side
    assert n_exact <= n_surv < n_total


def test_bloom_pruned_semi_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    build = load_table(spark, sf_dir, "customer").where(
        F.col("c_acctbal") > 9000)
    got = bloom_pruned_semi_join(orders, build, "o_custkey", "c_custkey")
    want = orders.join(
        build.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        "o_custkey", "left_semi")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
