"""Sink mux tests: multi-sink fan-out by mq column, kafka option assembly,
live RESP redis sink (real wire protocol against the in-repo fixture
server)."""

from __future__ import annotations

import pytest

from ru_cdc_spark.config import InstanceConfig, PipelineConfig, SinkConfig
from ru_cdc_spark.streaming.pipeline import CdcPipeline
from ru_cdc_spark.streaming.sinks import kafka_writer_options, write_batch_to_sink


def test_kafka_options_mirror_reference_knobs():
    sink = SinkConfig(name="k", kind="kafka",
                      options={"kafka.bootstrap.servers": "b:9092",
                               "kafka.linger.ms": "300"})
    opts = kafka_writer_options(sink)
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["kafka.linger.ms"] == "300"
    assert opts["kafka.delivery.timeout.ms"] == "5000"  # ref message_queue.rs:103


def test_kafka_options_require_brokers():
    with pytest.raises(ValueError, match="bootstrap.servers"):
        kafka_writer_options(SinkConfig(name="k", kind="kafka"))


def test_redis_sink_rpush_per_row(spark):
    """The reference's exact call shape (message_queue.rs:155-166):
    RPUSH topic payload per change row, routed by the topic column, over
    a REAL RESP socket."""
    from ru_cdc_spark.sources.resp import RespClient, RespServerFixture

    with RespServerFixture() as srv:
        rows = [("m", f"t{i % 2}", f"k{i}", f"v{i}") for i in range(20)]
        batch = spark.createDataFrame(rows, ["mq", "topic", "key", "value"])
        sink = SinkConfig(name="r", kind="redis",
                          options={"host": "127.0.0.1",
                                   "port": str(srv.port)})
        write_batch_to_sink(batch, sink, 0)
        with RespClient.connect("127.0.0.1", srv.port) as rc:
            t0 = sorted(v.decode() for v in rc.lrange("t0"))
            t1 = sorted(v.decode() for v in rc.lrange("t1"))
        assert t0 == sorted(f"v{i}" for i in range(0, 20, 2))
        assert t1 == sorted(f"v{i}" for i in range(1, 20, 2))


def test_redis_sink_preserves_per_key_order(spark):
    """With a __seq column the redis writer applies the same per-key
    ordering discipline as Kafka (X2 fix): one key's changes arrive in
    seq order within the topic list."""
    from ru_cdc_spark.sources.resp import RespClient, RespServerFixture

    with RespServerFixture() as srv:
        rows = [("m", "t", "k1", f"v{s}", s) for s in (3, 1, 2, 0)]
        batch = spark.createDataFrame(
            rows, ["mq", "topic", "key", "value", "__seq"])
        sink = SinkConfig(name="r", kind="redis",
                          options={"host": "127.0.0.1",
                                   "port": str(srv.port)})
        write_batch_to_sink(batch, sink, 0)
        with RespClient.connect("127.0.0.1", srv.port) as rc:
            vals = [v.decode() for v in rc.lrange("t")]
        assert vals == ["v0", "v1", "v2", "v3"]


def test_redis_sink_replay_is_at_least_once(spark):
    """Replaying a batch (the crash-retry path) appends again — the
    documented at-least-once contract of a list sink (K4: the engine's
    exactly-once lives in the idempotent merge, not in redis)."""
    from ru_cdc_spark.sources.resp import RespClient, RespServerFixture

    with RespServerFixture() as srv:
        batch = spark.createDataFrame(
            [("m", "t", "k", "v")], ["mq", "topic", "key", "value"])
        sink = SinkConfig(name="r", kind="redis",
                          options={"host": "127.0.0.1",
                                   "port": str(srv.port)})
        write_batch_to_sink(batch, sink, 0)
        write_batch_to_sink(batch, sink, 0)  # replayed epoch
        with RespClient.connect("127.0.0.1", srv.port) as rc:
            assert rc.llen("t") == 2


def test_unknown_sink_kind_rejected(spark):
    batch = spark.createDataFrame([("m", "t", "k", "v")], ["mq", "topic", "key", "value"])
    with pytest.raises(ValueError, match="unknown sink kind"):
        write_batch_to_sink(batch, SinkConfig(name="x", kind="carrier-pigeon"), 0)


def test_multi_sink_fanout(spark, sf_dir, tmp_path):
    """Two instances route to two different mqs; the mux lands each row in
    its own parquet sink — the K1 name->channel registry, distributed."""
    from tests.test_streaming import _write_payload_files

    src = str(tmp_path / "src")
    n = _write_payload_files(spark, sf_dir, src)

    cfg = PipelineConfig(
        source_path=src,
        checkpoint_dir=str(tmp_path / "ck"),
        sinks=[
            SinkConfig(name="mq_a", kind="parquet",
                       options={"path": str(tmp_path / "out_a")}),
            SinkConfig(name="mq_b", kind="parquet",
                       options={"path": str(tmp_path / "out_b")}),
        ],
        instances=[
            InstanceConfig(mq="mq_a", schemas="test*", tables="*", topic="t_all"),
            InstanceConfig(mq="mq_b", schemas="*", tables="orders", topic="t_orders"),
        ],
    )
    q = CdcPipeline(spark, cfg).start_to_sinks()
    q.awaitTermination(180)

    a = spark.read.parquet(str(tmp_path / "out_a"))
    b = spark.read.parquet(str(tmp_path / "out_b"))
    # both instances match every event (db=testdb, table=orders) -> fan-out
    assert a.count() == n and b.count() == n
    assert a.select("mq").distinct().collect()[0][0] == "mq_a"
    assert b.select("topic").distinct().collect()[0][0] == "t_orders"


def test_ordered_for_kafka_per_key_order(spark):
    """All changes of one key land in ONE partition, in seq order — the
    property that makes per-key replay order survive the Kafka producer."""
    import random

    from pyspark.sql import functions as F

    from ru_cdc_spark.streaming.sinks import ordered_for_kafka

    rng = random.Random(3)
    rows = [(f"k{i % 7}", seq, f"v{i}") for i, seq in
            ((i, rng.randrange(1000)) for i in range(200))]
    batch = spark.createDataFrame(rows, "key string, __seq long, value string")

    ordered = ordered_for_kafka(batch, drop_seq=False) \
        .withColumn("pid", F.spark_partition_id())
    got = [(r["key"], r["__seq"], r["pid"]) for r in ordered.collect()]

    by_key: dict[str, list[tuple[int, int]]] = {}
    for k, seq, pid in got:
        by_key.setdefault(k, []).append((seq, pid))
    for k, pairs in by_key.items():
        pids = {p for _, p in pairs}
        assert len(pids) == 1, f"key {k} split across partitions {pids}"
    # collect() preserves per-partition row order; within a partition the
    # (key, seq) sort must hold
    last: dict[int, tuple] = {}
    for k, seq, pid in got:
        if pid in last:
            assert last[pid] <= (k, seq)
        last[pid] = (k, seq)
    # seq column dropped in the production path
    assert "__seq" not in ordered_for_kafka(batch).columns


def test_queue_sink_topic_fanout_and_replay_dedup(spark, tmp_path):
    """The native list-queue sink (K3 analog) routes rows to per-topic
    queues, and a replayed batch id publishes nothing twice — the
    exactly-once upgrade over the reference's send-then-checkpoint."""
    from pyspark.sql import functions as F
    from ru_cdc_spark.sources.binlog_source import register_binlog_source
    from ru_cdc_spark.sources.queue_sink import read_queue, register_queue_sink

    register_binlog_source(spark)
    register_queue_sink(spark)
    qdir = str(tmp_path / "queues")
    ck = str(tmp_path / "ck")
    pos = str(tmp_path / "meta.json")

    def run_once():
        stream = (spark.readStream.format("binlog_feed")
                  .option("total_events", 300)
                  .option("events_per_batch", 150)
                  .option("position_file", pos).load())
        routed = stream.select(
            F.concat(F.lit("t_"), F.col("table")).alias("topic"), "payload")
        q = (routed.writeStream.format("list_queue")
             .option("path", qdir).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    run_once()  # restart: second batch of 150

    orders = read_queue(qdir, "t_orders")
    cust = read_queue(qdir, "t_customer")
    assert len(orders) == 150 and len(cust) == 150  # 300 events, even/odd split
    ids = sorted(__import__("json").loads(p)["id"] for p in orders + cust)
    assert ids == list(range(300))  # exactly once, no replay duplication


def test_unmanifested_files_invisible_to_consumers(tmp_path):
    """A crash between publishing topic files and writing the manifest must
    leave those files invisible — replay can then re-publish without
    consumers ever seeing duplicates."""
    import json
    import os

    from ru_cdc_spark.sources.queue_sink import read_queue

    root = str(tmp_path / "q")
    tdir = os.path.join(root, "topicA")
    os.makedirs(tdir)
    # a manifested batch
    with open(os.path.join(tdir, "000000000001-a.jsonl"), "w") as fh:
        fh.write("m1\nm2")
    with open(os.path.join(root, "manifest-1.json"), "w") as fh:
        json.dump({"batch": 1, "published": [
            {"topic": "topicA",
             "file": os.path.join(tdir, "000000000001-a.jsonl"),
             "rows": 2}]}, fh)
    # an orphan from a crashed commit: file moved, manifest never written
    with open(os.path.join(tdir, "000000000002-crash.jsonl"), "w") as fh:
        fh.write("dup1\ndup2")

    assert read_queue(root, "topicA") == ["m1", "m2"]


def test_vacuum_unmanifested_removes_orphans_keeps_committed(tmp_path):
    import json
    import os

    from ru_cdc_spark.sources.queue_sink import read_queue, vacuum_unmanifested

    root = str(tmp_path / "q")
    tdir = os.path.join(root, "topicA")
    os.makedirs(os.path.join(root, ".staging"))
    os.makedirs(tdir)
    with open(os.path.join(tdir, "000000000001-a.jsonl"), "w") as fh:
        fh.write("m1")
    with open(os.path.join(root, "manifest-1.json"), "w") as fh:
        json.dump({"batch": 1, "published": [
            {"topic": "topicA",
             "file": os.path.join(tdir, "000000000001-a.jsonl"),
             "rows": 1}]}, fh)
    # crash orphans: a published-but-unmanifested file and a staging leftover
    with open(os.path.join(tdir, "000000000002-crash.jsonl"), "w") as fh:
        fh.write("dup")
    with open(os.path.join(root, ".staging", "topicA-zzz.jsonl"), "w") as fh:
        fh.write("staged")

    deleted = vacuum_unmanifested(root)
    assert len(deleted) == 2
    assert read_queue(root, "topicA") == ["m1"]
    assert os.path.exists(os.path.join(tdir, "000000000001-a.jsonl"))


def test_read_queue_survives_queue_relocation(tmp_path):
    """Manifests may record the producer's original absolute paths; the
    consumer resolves through its own queue root."""
    import json
    import os
    import shutil

    from ru_cdc_spark.sources.queue_sink import read_queue

    old_root = str(tmp_path / "old")
    os.makedirs(os.path.join(old_root, "t"))
    with open(os.path.join(old_root, "t", "000000000001-x.jsonl"), "w") as fh:
        fh.write("a\nb")
    with open(os.path.join(old_root, "manifest-1.json"), "w") as fh:
        json.dump({"batch": 1, "published": [
            {"topic": "t",
             "file": os.path.join(old_root, "t", "000000000001-x.jsonl"),
             "rows": 2}]}, fh)
    new_root = str(tmp_path / "moved")
    shutil.move(old_root, new_root)
    assert read_queue(new_root, "t") == ["a", "b"]


def _drive_queue(spark, qdir, ck, pos, total, per_batch, **sink_opts):
    from pyspark.sql import functions as F

    stream = (spark.readStream.format("binlog_feed")
              .option("total_events", total)
              .option("events_per_batch", per_batch)
              .option("position_file", pos).load())
    routed = stream.select(
        F.concat(F.lit("t_"), F.col("table")).alias("topic"), "payload")
    w = (routed.writeStream.format("list_queue")
         .option("path", qdir).option("checkpointLocation", ck))
    for k, v in sink_opts.items():
        w = w.option(k, v)
    q = w.trigger(availableNow=True).start()
    try:
        q.awaitTermination(120)
    except Exception:
        pass  # injected failures surface here; the checkpoint is the test


def test_queue_sink_task_killed_mid_write_still_exactly_once(
        spark, tmp_path):
    """A write task dies AFTER staging its file (injected one-shot
    failure). In local mode a failed task fails the whole batch, and the
    restarted query REPLAYS it: the replay stages fresh uuid-named files
    and the garbage from the dead attempt never becomes visible — queue
    contents are exactly the source rows (on a cluster the same
    invariant holds at task-retry granularity)."""
    from ru_cdc_spark.sources.binlog_source import register_binlog_source
    from ru_cdc_spark.sources.queue_sink import read_queue, register_queue_sink

    register_binlog_source(spark)
    register_queue_sink(spark)
    qdir = str(tmp_path / "q")
    marker = str(tmp_path / "task_fail_marker")
    for _ in range(3):
        _drive_queue(spark, qdir, str(tmp_path / "ck"),
                     str(tmp_path / "meta.json"), 200, 100,
                     fail_task_once=marker)
    import json as _json

    msgs = read_queue(qdir, "t_orders") + read_queue(qdir, "t_customer")
    ids = sorted(_json.loads(p)["id"] for p in msgs)
    assert ids == list(range(200)), "dup or loss after task retry"


def test_queue_sink_crash_after_publish_before_checkpoint(spark, tmp_path):
    """THE at-least-once window (reference message_queue.rs:74-83:
    send, then checkpoint): the sink publishes batch 0's files AND its
    manifest, then the query dies before Spark records the batch as
    committed. The restarted query REPLAYS batch 0; the manifest guard
    must swallow the replay so consumers see every row exactly once."""
    from ru_cdc_spark.sources.binlog_source import register_binlog_source
    from ru_cdc_spark.sources.queue_sink import read_queue, register_queue_sink

    register_binlog_source(spark)
    register_queue_sink(spark)
    qdir = str(tmp_path / "q")
    marker = str(tmp_path / "crash_marker")
    # run 1 crashes post-publish; runs 2-3 drain the rest
    for _ in range(3):
        _drive_queue(spark, qdir, str(tmp_path / "ck"),
                     str(tmp_path / "meta.json"), 200, 100,
                     crash_after_publish_once=marker)
    import json as _json

    msgs = read_queue(qdir, "t_orders") + read_queue(qdir, "t_customer")
    ids = sorted(_json.loads(p)["id"] for p in msgs)
    assert ids == list(range(200)), "replayed batch published twice"
