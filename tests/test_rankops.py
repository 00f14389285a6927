"""rankops two-pass primitives must be BIT-IDENTICAL to the
unpartitioned-window forms they replace (that is the whole contract —
same values, distributed plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ru_cdc_spark.operators.rankops import (
    global_row_number,
    grouped_running_sum,
    ntile_from_rank,
)


@pytest.fixture(scope="module")
def noisy(spark):
    # adversarial: duplicate order-values (ties), negatives, skewed key
    return spark.range(500).select(
        F.col("id"),
        (F.col("id") % 37).alias("v"),
        (F.col("id") % 7).alias("g"),
        ((F.col("id") * 31) % 113 - 56).alias("x"),
    )


class TestGlobalRowNumber:
    def test_matches_window_row_number(self, spark, noisy):
        order = [F.col("v").asc(), F.col("id").asc()]
        got, total = global_row_number(noisy, order, "rn")
        want = noisy.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order)))
        assert total == 500
        assert sorted(map(tuple, got.select("id", "rn").collect())) == \
            sorted(map(tuple, want.select("id", "rn").collect()))

    def test_descending_order(self, spark, noisy):
        order = [F.col("x").desc(), F.col("id").asc()]
        got, _ = global_row_number(noisy, order, "rn")
        want = noisy.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order)))
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, want.collect()))

    def test_empty_input(self, spark, noisy):
        got, total = global_row_number(noisy.where("id < 0"),
                                       [F.col("id").asc()], "rn")
        assert total == 0 and got.count() == 0

    def test_plan_is_distributed(self, spark, noisy):
        from ru_cdc_spark.plans import physical_plan

        got, _ = global_row_number(noisy, [F.col("v"), F.col("id")], "rn")
        plan = physical_plan(got)
        assert "rangepartitioning" in plan
        # every window is __pid-partitioned, never global
        import re
        assert not re.findall(
            r"windowspecdefinition\([^,()]+ (?:ASC|DESC)", plan)


class TestNtileFromRank:
    @pytest.mark.parametrize("n_rows,buckets", [
        (500, 4), (7, 4), (3, 4), (12, 5), (100, 3), (4, 4), (1, 4)])
    def test_matches_window_ntile(self, spark, n_rows, buckets):
        df = spark.range(n_rows).select(
            F.col("id"), ((F.col("id") * 13) % 29).alias("v"))
        order = [F.col("v").asc(), F.col("id").asc()]
        ranked, total = global_row_number(df, order, "rn")
        got = ranked.select(
            "id", ntile_from_rank("rn", total, buckets).alias("t"))
        want = df.select(
            "id", F.ntile(buckets).over(Window.orderBy(*order)).alias("t"))
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, want.collect()))


class TestGroupedRunningSum:
    def test_matches_window_running_sum(self, spark, noisy):
        counts = noisy.groupBy("g", "v").agg(
            F.count("*").alias("c"), F.sum("x").alias("sx"))
        got = grouped_running_sum(counts, ["g"], [F.col("v").asc()],
                                  ["c", "sx"])
        w = (Window.partitionBy("g").orderBy("v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        want = counts.select(
            "g", "v",
            F.sum("c").over(w).alias("cum_c"),
            F.sum("sx").over(w).alias("cum_sx"))
        assert sorted(map(tuple,
                          got.select("g", "v", "cum_c", "cum_sx")
                          .collect())) == \
            sorted(map(tuple, want.collect()))

    def test_whole_relation_running_sum(self, spark, noisy):
        counts = noisy.groupBy("v").agg(F.count("*").alias("c"))
        got = grouped_running_sum(counts, [], [F.col("v").asc()], ["c"])
        w = (Window.orderBy("v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        want = counts.select("v", F.sum("c").over(w).alias("cum_c"))
        assert sorted(map(tuple, got.select("v", "cum_c").collect())) == \
            sorted(map(tuple, want.collect()))

    def test_final_group_total_equals_group_sum(self, spark, noisy):
        counts = noisy.groupBy("g", "v").agg(F.count("*").alias("c"))
        got = grouped_running_sum(counts, ["g"], [F.col("v").asc()], ["c"])
        finals = (got.groupBy("g").agg(F.max("cum_c").alias("m")))
        totals = noisy.groupBy("g").agg(F.count("*").alias("n"))
        joined = finals.join(totals, "g").where("m <> n")
        assert joined.count() == 0
