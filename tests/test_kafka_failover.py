"""Kafka broker failover (round-8 verdict item #5): bootstrap-list
walking with ApiVersions liveness probes, in-sync-replica snapshots,
and group-offset recovery from the survivor. The full streaming
scenario (kill A mid-stream, resume from B, hash-match) is the
registered ``cdc_kafka_broker_failover`` query; these tests pin the
mechanics it rests on."""

from __future__ import annotations

import time

import pytest

from ru_cdc_spark.sources.kafka_wire import (
    KafkaBrokerFixture,
    KafkaWireClient,
)


@pytest.fixture()
def broker():
    b = KafkaBrokerFixture().start()
    try:
        yield b
    finally:
        b.stop()


def _produce(broker, topic, n, group_commit: int | None = None):
    with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
        c.produce(topic, 0, [(b"k%d" % i, b"v%d" % i) for i in range(n)])
        if group_commit is not None:
            c.find_coordinator("g")
            c.offset_commit("g", topic, {0: group_commit})


class TestReplicaSnapshot:
    def test_replica_serves_identical_log_and_group_offsets(self, broker):
        _produce(broker, "t", 120, group_commit=37)
        twin = broker.snapshot_replica().start()
        try:
            with KafkaWireClient.connect("127.0.0.1", twin.port) as c:
                got = c.fetch_all("t", 0, 0)
                assert len(got) == 120
                assert got[0][1:] == (b"k0", b"v0")
                assert c.offset_fetch("g", "t", [0])[0][0] == 37
        finally:
            twin.stop()

    def test_replica_is_isolated_after_snapshot(self, broker):
        _produce(broker, "t", 10)
        twin = broker.snapshot_replica().start()
        try:
            _produce(broker, "t", 5)  # post-snapshot writes stay on A
            with KafkaWireClient.connect("127.0.0.1", twin.port) as c:
                assert c.fetch("t", 0, 0)["high_watermark"] == 10
        finally:
            twin.stop()


class TestDeadBrokerSemantics:
    def test_stopped_broker_resets_established_connections(self, broker):
        _produce(broker, "t", 5)
        c = KafkaWireClient.connect("127.0.0.1", broker.port)
        broker.stop()
        time.sleep(0.2)
        with pytest.raises(OSError):
            c.fetch("t", 0, 0)
        c.close()

    def test_first_io_fails_even_when_dial_succeeds(self, broker):
        """This sandbox's network stack (like real LBs) can accept a
        TCP dial to a dead port; liveness is only provable by a
        request — the property the reader's ApiVersions probe exists
        for."""
        port = broker.port
        broker.stop()
        time.sleep(0.2)
        try:
            c = KafkaWireClient.connect("127.0.0.1", port, timeout=3)
        except OSError:
            return  # stricter stack: dial itself refused — also fine
        with pytest.raises(OSError):
            c.api_versions()
        c.close()


class TestReaderEndpointFailover:
    def test_offsets_and_reads_fail_over_to_survivor(self, spark, broker):
        from ru_cdc_spark.sources import kafka_wire as kw

        _produce(broker, "t", 60, group_commit=20)
        twin = broker.snapshot_replica().start()
        dead_port = broker.port
        broker.stop()
        time.sleep(0.2)
        try:
            kw.register_kafka_wire_source(spark)
            df = (spark.readStream.format("kafka_wire")
                  .option("endpoints",
                          f"127.0.0.1:{dead_port},127.0.0.1:{twin.port}")
                  .option("topic", "t")
                  .option("group_id", "g")
                  .option("max_records_per_batch", "1000").load())
            import tempfile

            with tempfile.TemporaryDirectory() as work:
                q = (df.writeStream.format("parquet")
                     .option("path", f"{work}/out")
                     .option("checkpointLocation", f"{work}/ck")
                     .trigger(availableNow=True).start())
                q.awaitTermination(120)
                out = spark.read.parquet(f"{work}/out")
                offsets = sorted(r["offset"] for r in out.collect())
            # resumed from the BROKER-committed group offset (20), read
            # to the survivor's high watermark — nothing lost, nothing
            # re-read from before the committed position
            assert offsets == list(range(20, 60))
        finally:
            twin.stop()


class TestMidRangeFetchFailover:
    def test_broker_dies_between_fetch_windows(self, spark, broker):
        """The broker dies AFTER serving part of a committed offset
        range (die_after_fetches fault): the reader's fetch loop must
        fail over to the replica MID-RANGE and deliver exactly the
        committed [start, end) records — offsets are coordinates of
        the replicated log, so the survivor serves the identical
        tail."""
        import tempfile

        from ru_cdc_spark.sources import kafka_wire as kw

        # fat values force multiple fetch windows (client max_bytes
        # 1 MiB; each stored batch ~640 KiB)
        val = b"x" * 65536
        with kw.KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            for base in range(0, 60, 10):
                c.produce("t", 0, [(b"k%d" % i, val)
                                   for i in range(base, base + 10)])
        twin = broker.snapshot_replica().start()
        broker.die_after_fetches = 2  # watermark probe + one data fetch
        try:
            kw.register_kafka_wire_source(spark)
            df = (spark.readStream.format("kafka_wire")
                  .option("endpoints",
                          f"127.0.0.1:{broker.port},"
                          f"127.0.0.1:{twin.port}")
                  .option("topic", "t")
                  .option("max_records_per_batch", "1000").load())
            with tempfile.TemporaryDirectory() as work:
                q = (df.writeStream.format("parquet")
                     .option("path", f"{work}/out")
                     .option("checkpointLocation", f"{work}/ck")
                     .trigger(availableNow=True).start())
                q.awaitTermination(120)
                out = spark.read.parquet(f"{work}/out")
                rows = {(r["offset"], bytes(r["key"])) for r in
                        out.collect()}
            assert rows == {(i, b"k%d" % i) for i in range(60)}
        finally:
            twin.stop()
