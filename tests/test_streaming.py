"""End-to-end Structured Streaming tests: pipeline contract, checkpoint
resume (C1-C3 equivalence), merge materialization, watermarked windows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ru_cdc_spark.config import InstanceConfig, PipelineConfig
from ru_cdc_spark.operators.envelope import build_envelope, envelope_to_json
from ru_cdc_spark.sources.cdc_fixture import (
    ORDERS_DATABASE,
    ORDERS_MYSQL_TYPES,
    ORDERS_PK,
    ORDERS_TABLE,
    derive_order_changes,
)
from ru_cdc_spark.streaming.listener import ThroughputListener
from ru_cdc_spark.streaming.pipeline import CdcPipeline, windowed_event_counts


def _write_payload_files(spark, sf_dir, out_dir, parts=2):
    env = build_envelope(
        derive_order_changes(spark, sf_dir),
        ORDERS_DATABASE, ORDERS_TABLE, ORDERS_PK, ORDERS_MYSQL_TYPES,
        processing_ts=F.lit(0),
    )
    payloads = envelope_to_json(env).select("payload")
    payloads.repartition(parts).write.mode("overwrite").text(out_dir)
    return payloads.count()


def _config(source, checkpoint):
    return PipelineConfig(
        source_path=source,
        checkpoint_dir=checkpoint,
        instances=[
            InstanceConfig(mq="mq1", schemas="test*", tables="ord*",
                           black_list=["*_tmp"], topic="orders_topic"),
        ],
    )


def test_pipeline_end_to_end_memory(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    n = _write_payload_files(spark, sf_dir, src)
    pipe = CdcPipeline(spark, _config(src, str(tmp_path / "ck")))
    q = pipe.start_to_memory("cdc_mem_e2e")
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM cdc_mem_e2e")
    rows = out.collect()
    assert len(rows) == n  # every change routed exactly once
    assert set(out.columns) == {"mq", "topic", "key", "value"}
    r = rows[0]
    assert r["mq"] == "mq1" and r["topic"] == "orders_topic"
    assert r["key"].startswith("testdb.orders.")
    assert '"database":"testdb"' in r["value"]


def test_pipeline_routing_drops_unmatched(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    _write_payload_files(spark, sf_dir, src)
    cfg = _config(src, str(tmp_path / "ck2"))
    cfg.instances = [InstanceConfig(mq="m", schemas="otherdb", tables="*", topic="t")]
    pipe = CdcPipeline(spark, cfg)
    q = pipe.start_to_memory("cdc_mem_drop")
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT * FROM cdc_mem_drop").count() == 0


def test_checkpoint_resume_no_duplicates(spark, sf_dir, tmp_path):
    """Kill-and-restart from checkpoint: second run must process ONLY the
    new file — the Spark analog of the reference's position resume
    (position_manager.rs:114-150), minus its at-least-once duplicates."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck3")
    os.makedirs(src, exist_ok=True)

    n1 = _write_payload_files(spark, sf_dir, src, parts=1)
    pipe = CdcPipeline(spark, _config(src, ck))
    q = pipe.start_to_parquet(out, ck)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1

    # append one more file with 3 extra events (distinct ids)
    extra = spark.createDataFrame(
        [(f'{{"id": {10**9 + i}, "database": "testdb", "table": "orders", '
          f'"type": "INSERT", "es": 1, "ts": 2, "pkNames": ["o_orderkey"], '
          f'"data": [{{"o_orderkey": "{10**9 + i}"}}]}}',) for i in range(3)],
        ["value"],
    )
    extra.coalesce(1).write.mode("append").text(src)

    q2 = pipe.start_to_parquet(out, ck)
    q2.awaitTermination(120)
    total = spark.read.parquet(out).count()
    assert total == n1 + 3  # no reprocessing, no loss


def test_streaming_merge_matches_batch_snapshot(spark, sf_dir, tmp_path):
    """foreachBatch merge materialization converges to the same snapshot as
    the batch MERGE emulation (the oracle-checked cdc_merge_snapshot)."""
    from ru_cdc_spark.operators.merge import apply_changes

    src = str(tmp_path / "src")
    snap = str(tmp_path / "snapshot")
    _write_payload_files(spark, sf_dir, src, parts=3)

    value_schema = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DecimalType(18, 2)),
        T.StructField("o_orderpriority", T.StringType()),
    ])
    pipe = CdcPipeline(spark, _config(src, str(tmp_path / "ck4")))
    q = pipe.start_merge(snap, ["o_orderkey"], value_schema)
    q.awaitTermination(180)

    from ru_cdc_spark.operators.merge import snapshot_view

    got = snapshot_view(spark.read.parquet(snap))
    expected = apply_changes(derive_order_changes(spark, sf_dir), ORDERS_PK) \
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority")
    assert got.count() == expected.count()
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert diff == 0


def test_windowed_counts_with_watermark(spark, sf_dir, tmp_path):
    """Watermarked tumbling-window agg over a file stream equals the batch
    group-by on the same data once the stream is drained."""
    from ru_cdc_spark.sources.readers import load_table

    events = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    src = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema).parquet(src)
    )
    agg = windowed_event_counts(stream)
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").start())
    q.processAllAvailable()
    q.stop()

    got = spark.sql("SELECT event_type, sum(n_events) AS n FROM win_counts GROUP BY 1")
    expected = events.groupBy("event_type").agg(F.count("*").alias("n"))
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert diff == 0


def test_dead_letter_quarantine(spark, sf_dir, tmp_path):
    """Malformed payloads land in the dead-letter frame with the raw text
    preserved; good rows are unaffected."""
    src = str(tmp_path / "src")
    n = _write_payload_files(spark, sf_dir, src, parts=1)
    bad = spark.createDataFrame(
        [("{not json at all",), ('{"id": 1}',), ("",)], ["value"])
    bad.coalesce(1).write.mode("append").text(src)

    pipe = CdcPipeline(spark, _config(src, str(tmp_path / "ckd")))
    raw = spark.read.text(src).withColumnRenamed("value", "payload")
    good, dead = pipe.split_dead_letters(raw)
    # '' lines are dropped by the text reader? they are kept as empty rows
    assert good.count() == n
    dead_rows = dead.collect()
    assert len(dead_rows) >= 2  # the two clearly-bad payloads
    assert all(r["error"] for r in dead_rows)
    payloads = {r["payload"] for r in dead_rows}
    assert "{not json at all" in payloads


def test_multi_table_streaming_merge(spark, sf_dir, tmp_path):
    """A mixed orders+customer change stream merges into per-table
    snapshots that match each table's batch MERGE oracle."""
    from ru_cdc_spark.catalog import TableCatalog
    from ru_cdc_spark.operators.envelope import build_envelope, envelope_to_json
    from ru_cdc_spark.operators.merge import apply_changes, snapshot_view
    from ru_cdc_spark.sources.cdc_fixture import (
        CUSTOMER_DATABASE,
        CUSTOMER_MYSQL_TYPES,
        CUSTOMER_PK,
        CUSTOMER_TABLE,
        derive_customer_changes,
    )
    from ru_cdc_spark.streaming.pipeline import start_merge_evolving

    src = str(tmp_path / "src")
    snap = str(tmp_path / "snaps")

    env_orders = build_envelope(
        derive_order_changes(spark, sf_dir),
        ORDERS_DATABASE, ORDERS_TABLE, ORDERS_PK, ORDERS_MYSQL_TYPES,
        processing_ts=F.lit(0))
    env_cust = build_envelope(
        derive_customer_changes(spark, sf_dir),
        CUSTOMER_DATABASE, CUSTOMER_TABLE, CUSTOMER_PK, CUSTOMER_MYSQL_TYPES,
        processing_ts=F.lit(0))
    mixed = envelope_to_json(env_orders).select("payload").unionByName(
        envelope_to_json(env_cust).select("payload"))
    mixed.repartition(3).write.mode("overwrite").text(src)

    cfg = PipelineConfig(
        source_path=src, checkpoint_dir=str(tmp_path / "ck"),
        instances=[InstanceConfig(mq="m", schemas="testdb", tables="*", topic="t")],
    )
    q = start_merge_evolving(CdcPipeline(spark, cfg), snap, TableCatalog())
    q.awaitTermination(300)

    got_orders = snapshot_view(spark.read.parquet(f"{snap}/testdb.orders"))
    exp_orders = apply_changes(derive_order_changes(spark, sf_dir), ORDERS_PK) \
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderpriority")
    assert got_orders.select(exp_orders.columns).exceptAll(exp_orders).count() == 0
    assert got_orders.count() == exp_orders.count()

    got_cust = snapshot_view(spark.read.parquet(f"{snap}/testdb.customer"))
    exp_cust = apply_changes(derive_customer_changes(spark, sf_dir), CUSTOMER_PK)
    assert got_cust.select(exp_cust.columns).exceptAll(exp_cust).count() == 0
    assert got_cust.count() == exp_cust.count()


def test_negative_cache_drops_dead_tables(spark, sf_dir, tmp_path):
    """P6: events for tables in the catalog's negative cache are discarded
    before the envelope parse."""
    src = str(tmp_path / "src")
    n = _write_payload_files(spark, sf_dir, src)
    pipe = CdcPipeline(spark, _config(src, str(tmp_path / "ckn")))
    raw = spark.read.text(src).withColumnRenamed("value", "payload")
    kept = pipe.routed(raw)
    assert kept.count() == n
    dropped = pipe.routed(raw, dropped_tables=[("testdb", "orders")])
    assert dropped.count() == 0


def test_native_session_window(spark, sf_dir, tmp_path):
    """Streaming session_window (gap-based) agrees with the batch
    lag-gap sessionization on session counts."""
    from ru_cdc_spark.operators.analytics import sessionize_events
    from ru_cdc_spark.sources.readers import load_table

    events = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id")
    src = str(tmp_path / "sess_src")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = (stream.withWatermark("ts", "1 day")
           .groupBy(F.session_window("ts", "30 minutes"), "user_id")
           .agg(F.count("*").alias("n_events")))
    q = (agg.writeStream.format("memory").queryName("sess_win")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.sql(
        "SELECT user_id, count(*) AS n_sessions, sum(n_events) AS total "
        "FROM sess_win GROUP BY user_id")
    expected = sessionize_events(spark, sf_dir).select(
        "user_id", "n_sessions", F.col("total_events").alias("total"))
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert diff == 0


def test_dropduplicates_within_watermark(spark, tmp_path):
    """Streaming dedup with bounded state: duplicate event ids within the
    watermark window are emitted once."""
    src = str(tmp_path / "dups")
    schema = "event_id long, ts timestamp, v double"
    rows = [(1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:00:01", 1.0),   # dup id
            (2, "2024-01-01 00:01:00", 2.0),
            (2, "2024-01-01 00:01:30", 2.0),   # dup id
            (3, "2024-01-01 00:02:00", 3.0)]
    spark.createDataFrame(
        [(i, __import__("datetime").datetime.fromisoformat(t), v) for i, t, v in rows],
        schema).coalesce(1).write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(schema).parquet(src)
              .withWatermark("ts", "10 minutes")
              .dropDuplicatesWithinWatermark(["event_id"]))
    q = (stream.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect())
    assert got == [1, 2, 3]


def test_schema_evolution_through_streaming_merge(spark, tmp_path):
    """D11 end-to-end: a later batch carries a NEW column in its envelope;
    the catalog widens, the snapshot gains the column, and pre-evolution
    rows read NULL for it."""
    import json

    from ru_cdc_spark.catalog import TableCatalog
    from ru_cdc_spark.operators.merge import snapshot_view
    from ru_cdc_spark.streaming.pipeline import start_merge_evolving

    src = str(tmp_path / "src")
    snap = str(tmp_path / "snap")

    def payload(i, data, mysql_types):
        return json.dumps({
            "id": i, "database": "testdb", "table": "orders",
            "type": "INSERT", "es": 1, "ts": 2, "pkNames": ["k"],
            "isDdl": False, "sql": "",
            "mysqlType": mysql_types, "data": [data],
        })

    v1_types = {"k": "bigint(20)", "v": "varchar(10)"}
    batch1 = [payload(1, {"k": "1", "v": "a"}, v1_types),
              payload(2, {"k": "2", "v": "b"}, v1_types)]
    spark.createDataFrame([(p,) for p in batch1], ["value"]) \
        .coalesce(1).write.mode("overwrite").text(src)

    cfg = _config(src, str(tmp_path / "ck"))
    catalog = TableCatalog()
    pipe = CdcPipeline(spark, cfg)
    q = start_merge_evolving(pipe, snap, catalog)
    q.awaitTermination(120)
    assert catalog.lookup("testdb", "orders").version == 1

    # second batch: schema widened with a new column 'note'
    v2_types = {"k": "bigint(20)", "v": "varchar(10)", "note": "varchar(20)"}
    batch2 = [payload(3, {"k": "3", "v": "c", "note": "hello"}, v2_types),
              payload(4, {"k": "1", "v": "a2", "note": "upd"}, v2_types)]
    spark.createDataFrame([(p,) for p in batch2], ["value"]) \
        .coalesce(1).write.mode("append").text(src)
    q2 = start_merge_evolving(pipe, snap, catalog)
    q2.awaitTermination(120)

    assert catalog.lookup("testdb", "orders").version == 2
    rows = {r["k"]: (r["v"], r["note"])
            for r in snapshot_view(spark.read.parquet(snap)).collect()}
    assert rows[2] == ("b", None)        # pre-evolution row: NULL note
    assert rows[3] == ("c", "hello")     # new row with new column
    assert rows[1] == ("a2", "upd")      # updated row got the new column


def test_stateful_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    after a second file drop the totals include both batches."""
    from ru_cdc_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "ev")
    schema = "user_id long, value double"
    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], schema) \
        .coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = (running_user_totals(stream).writeStream.format("memory")
         .queryName("stateful_acc").outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()

    spark.createDataFrame([(1, 100.0), (3, 7.0)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    # 'update' mode appends one row per key per batch; take the latest
    rows = {r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.sql(
                "SELECT * FROM stateful_acc ORDER BY n_events").collect()}
    assert rows[1] == (3, 115.0)   # state carried: 2 events + 1 more
    assert rows[2] == (1, 1.0)
    assert rows[3] == (1, 7.0)


def test_throughput_listener(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    n = _write_payload_files(spark, sf_dir, src)
    listener = ThroughputListener()
    spark.streams.addListener(listener)
    try:
        pipe = CdcPipeline(spark, _config(src, str(tmp_path / "ck5")))
        q = pipe.start_to_memory("cdc_mem_listener")
        q.processAllAvailable()
        q.stop()
        # listener events are delivered asynchronously; wait for them
        import time
        for _ in range(50):
            if listener.stats.total_input_rows >= n:
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert listener.stats.total_input_rows == n
    assert listener.stats.batches >= 1


def test_streaming_winnowing_matches_batch_across_boundaries(spark, tmp_path):
    """Fingerprints from the chunked STREAM must equal the batch winnowing
    of the concatenated text — including windows that span the micro-batch
    boundary (the case the k+w-2 tail state exists for)."""
    from ru_cdc_spark.streaming.stateful import (
        _winnow_text,
        streaming_winnowing,
    )

    k, w = 5, 10
    full = "the quick brown fox jumps over the lazy dog and keeps running"
    cut = 23  # mid-word split so boundary windows genuinely span batches
    part1, part2 = full[:cut], full[cut:]

    src = str(tmp_path / "chunks")
    schema = "stream_id long, seq long, chunk string"
    spark.createDataFrame([(7, 0, part1)], schema) \
        .coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", "1").parquet(src)
    q = (streaming_winnowing(stream, k, w).writeStream.format("memory")
         .queryName("winnow_stream").outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()
    spark.createDataFrame([(7, 1, part2)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = sorted(r["fingerprint"]
                 for r in spark.sql("SELECT * FROM winnow_stream").collect())
    want = sorted(_winnow_text(full, k, w))
    assert got == want
    # and the boundary actually produced windows in BOTH batches
    assert 0 < len(_winnow_text(part1, k, w)) < len(want)


def test_scd2_closing_edges_across_batches(spark, tmp_path):
    """The streaming SCD2 operator must close versions whose opening
    and closing events arrive in DIFFERENT micro-batches (the one-long
    per-key state exists for exactly this), emit each edge exactly
    once, and drop state for deleted keys. Handcrafted split: key 1's
    INSERT lands in batch 0, its UPDATE and DELETE in batch 1; key 2
    opens in batch 0 and never closes; key 3 opens and closes within
    batch 1."""
    from ru_cdc_spark.streaming.stateful import scd2_closing_edges

    schema = "pk long, seq long, is_delete boolean"
    src = str(tmp_path / "changes")
    batch0 = [(1, 10, False), (2, 20, False)]
    batch1 = [(1, 30, False), (1, 40, True), (3, 50, False), (3, 60, False)]
    spark.createDataFrame(batch0, schema) \
        .coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", "1").parquet(src)
    q = (scd2_closing_edges(stream).writeStream.format("memory")
         .queryName("scd2_edges").outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()
    mid = {(r.pk, r.valid_from_seq, r.valid_to_seq)
           for r in spark.sql("SELECT * FROM scd2_edges").collect()}
    assert mid == set()  # nothing closed yet — both versions still open
    spark.createDataFrame(batch1, schema) \
        .coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {(r.pk, r.valid_from_seq, r.valid_to_seq)
           for r in spark.sql("SELECT * FROM scd2_edges").collect()}
    assert got == {
        (1, 10, 30),  # closed ACROSS the batch boundary
        (1, 30, 40),  # closed by the delete (which opens nothing)
        (3, 50, 60),  # closed within one batch
    }


def test_stream_interval_join_matches_batch(spark, sf_dir):
    """The watermarked stream-stream interval join, drained with
    availableNow, produces exactly the batch interval join's pairs."""
    from ru_cdc_spark.queries import REGISTRY
    from ru_cdc_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    out = REGISTRY["events_stream_interval_join"].fn(spark, sf_dir)
    got = {(r.event_id, r.n_prior, r.max_prior) for r in out.collect()}

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    batch = (
        e1.join(e2, F.expr(
            "e1.user_id = e2.user_id "
            "AND e2.ts >= e1.ts - INTERVAL 30 minutes AND e2.ts < e1.ts"))
        .groupBy("e1.event_id")
        .agg(F.count("*").alias("n_prior"), F.max("e2.value").alias("max_prior"))
    )
    want = {(r.event_id, r.n_prior, r.max_prior) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_static_join_enrichment(spark, sf_dir, tmp_path):
    """Stream-static broadcast join: each micro-batch joins the static
    dimension without state — the standard enrichment shape (static side
    re-resolved per batch, so a dim refresh is picked up live)."""
    from pyspark.sql import functions as F
    from ru_cdc_spark.sources.readers import load_table

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.limit(500).write.mode("overwrite").parquet(src)

    dim = spark.range(100).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("tier_"), (F.col("id") % 3).cast("string")).alias("tier"))

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    q = (enriched.writeStream.format("memory").queryName("__enriched")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("__enriched")
    batch = spark.read.parquet(src).join(F.broadcast(dim), "user_id", "left")
    assert got.count() == batch.count() == 500
    assert got.where(F.col("tier").isNull()).count() == \
        batch.where(F.col("tier").isNull()).count()


def test_binlog_source_exactly_once_across_restarts(spark, tmp_path):
    """The custom binlog DataSource resumes from the checkpointed log
    position across query restarts: every event id in [0, total) is
    delivered exactly once over eight separate runs (C1-C3 parity)."""
    from ru_cdc_spark.sources.binlog_source import register_binlog_source

    register_binlog_source(spark)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    pos_file = str(tmp_path / "meta.json")
    total = 1000

    # Python sources run ONE micro-batch per start (no availableNow
    # support), so 8 starts x 173-event batches = 8 genuine restarts;
    # the reader's advisory position file (the reference's meta.json
    # analog) carries the advance across them.
    for _ in range(8):
        stream = (spark.readStream.format("binlog_feed")
                  .option("total_events", total)
                  .option("events_per_batch", 173)
                  .option("position_file", pos_file)
                  .option("n_partitions", 4).load())
        q = (stream.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    got = spark.read.parquet(out).select("id").collect()
    ids = sorted(r.id for r in got)
    assert len(ids) == total, f"{len(ids)} != {total} (dup or loss)"
    assert ids == list(range(total))


def test_binlog_source_feeds_routing_pipeline(spark, tmp_path):
    """The DataSource output plugs straight into the engine's routing
    predicates — the reference's serve loop end-to-end in one plan."""
    from pyspark.sql import functions as F
    from ru_cdc_spark.config import InstanceConfig, route
    from ru_cdc_spark.sources.binlog_source import register_binlog_source

    register_binlog_source(spark)
    stream = (spark.readStream.format("binlog_feed")
              .option("total_events", 400)
              .option("events_per_batch", 400).load())
    routed = route(stream, [
        InstanceConfig(mq="m1", schemas="shard_1", tables="ord*", topic="t1"),
        InstanceConfig(mq="m2", schemas="shard_*", tables="customer",
                       black_list=["cust_tmp"], topic="t2"),
    ])
    q = (routed.writeStream.format("memory").queryName("__binlog_routed")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.table("__binlog_routed").collect()
    assert len(rows) > 0
    for r in rows:
        if r.topic == "t1":
            assert r.database == "shard_1" and r.table == "orders"
        else:
            assert r.table == "customer"
    # fan-out check: shard_1 orders only to t1; every customer row to t2
    n_t2 = sum(1 for r in rows if r.topic == "t2")
    assert n_t2 == 200  # all customer events (odd ids)


def test_streaming_partitioned_merge_matches_batch(spark, sf_dir, tmp_path):
    """The partition-scoped streaming materializer (dynamic partition
    overwrite per micro-batch) converges to the same snapshot as the batch
    merge, with the snapshot laid out as hive partition directories."""
    import os

    from ru_cdc_spark.operators.merge import apply_changes

    src = str(tmp_path / "srcp")
    snap = str(tmp_path / "snap_part")
    _write_payload_files(spark, sf_dir, src, parts=3)

    value_schema = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DecimalType(18, 2)),
        T.StructField("o_orderpriority", T.StringType()),
    ])
    pipe = CdcPipeline(spark, _config(src, str(tmp_path / "ckp")))
    q = pipe.start_merge_partitioned(
        snap, ["o_orderkey"], value_schema, "o_orderpriority")
    q.awaitTermination(180)

    # snapshot is genuinely hive-partitioned
    dirs = [d for d in os.listdir(snap) if d.startswith("o_orderpriority=")]
    assert len(dirs) >= 2

    from ru_cdc_spark.operators.merge import snapshot_view

    got = snapshot_view(spark.read.parquet(snap)).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority")
    expected = apply_changes(derive_order_changes(spark, sf_dir), ORDERS_PK) \
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                F.col("o_totalprice").cast("decimal(18,2)")
                .alias("o_totalprice"), "o_orderpriority")
    assert got.count() == expected.count()
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert diff == 0
