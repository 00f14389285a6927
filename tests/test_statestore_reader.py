"""Offline state-store inspection: the checkpointed state of a stateful
streaming operator must be queryable as a batch DataFrame and agree with
an independent batch recomputation (the audit-without-replay contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ru_cdc_spark.streaming.stateful import running_user_totals
from ru_cdc_spark.streaming.statestore import read_state, state_operators


def _run_totals_stream(spark, tmp_path, rows):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(rows, "user_id long, value double") \
        .write.mode("overwrite").json(src)
    stream = spark.readStream.schema("user_id long, value double").json(src)
    q = running_user_totals(stream).writeStream.format("noop") \
        .outputMode("update").option("checkpointLocation", ck) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    return ck


def test_state_matches_batch_recomputation(spark, tmp_path):
    rows = [(i % 7, float(i) + 0.25) for i in range(200)]
    ck = _run_totals_stream(spark, tmp_path, rows)

    state = read_state(spark, ck).select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.groupState.n").alias("n"),
        F.col("value.groupState.cents").alias("cents"))
    batch = spark.createDataFrame(rows, "user_id long, value double") \
        .groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
             .alias("cents"))
    assert state.exceptAll(batch).count() == 0
    assert batch.exceptAll(state).count() == 0


def test_operator_inventory_lists_the_stateful_op(spark, tmp_path):
    ck = _run_totals_stream(
        spark, tmp_path, [(1, 1.0), (2, 2.0)])
    ops = state_operators(spark, ck).collect()
    assert len(ops) == 1
    assert ops[0]["operatorName"] == "applyInPandasWithState"
    assert ops[0]["maxBatchId"] >= 0
