"""KIP-98 idempotent produce (sources/kafka_wire.py): InitProducerId,
sequence-stamped record batches, broker-side retry dedup (original
offset, nothing appended), out-of-order/duplicate/epoch error codes,
and the idempotent kafka_wire sink end to end.

The reference produces through rdkafka fire-and-forget
(``/root/reference/src/message_queue.rs:91-135``) — a retried delivery
there lands twice; this path upgrades the produce side to
exactly-once-per-partition using only the published protocol.
"""

from __future__ import annotations

import pytest

from ru_cdc_spark.sources.kafka_wire import (
    ERR_DUPLICATE_SEQUENCE,
    ERR_INVALID_PRODUCER_EPOCH,
    ERR_OUT_OF_ORDER_SEQUENCE,
    ERR_UNKNOWN_PRODUCER_ID,
    IdempotentProducer,
    KafkaBrokerFixture,
    KafkaError,
    KafkaWireClient,
    decode_record_batches,
    encode_record_batch,
)


@pytest.fixture()
def broker():
    srv = KafkaBrokerFixture().start()
    yield srv
    srv.stop()


class TestProducerFieldsCodec:
    def test_batch_carries_pid_epoch_sequence(self):
        b = encode_record_batch([(None, b"v")], producer_id=7,
                                producer_epoch=3, base_sequence=42)
        out = decode_record_batches(b)[0]
        assert out["crc_ok"]
        assert (out["producer_id"], out["producer_epoch"],
                out["base_sequence"]) == (7, 3, 42)

    def test_default_is_non_idempotent(self):
        out = decode_record_batches(
            encode_record_batch([(None, b"v")]))[0]
        assert (out["producer_id"], out["producer_epoch"],
                out["base_sequence"]) == (-1, -1, -1)


class TestInitProducerId:
    def test_fresh_pids_are_distinct(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            p1, e1 = c.init_producer_id()
            p2, e2 = c.init_producer_id()
        assert p1 != p2 and e1 == 0 and e2 == 0

    def test_transactional_id_bumps_epoch_same_pid(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            p1, e1 = c.init_producer_id("app-1")
            p2, e2 = c.init_producer_id("app-1")
        assert p1 == p2 and (e1, e2) == (0, 1)

    def test_advertised_in_api_versions(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert c.api_versions()[22] == (0, 0)


class TestSequenceContract:
    def test_retry_returns_original_offset_appends_nothing(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            pid, epoch = c.init_producer_id()
            recs = [(b"k", b"v1"), (None, b"v2")]
            off1 = c.produce("t", 0, recs, producer_id=pid,
                             producer_epoch=epoch, base_sequence=0)
            # the ack-lost retry: identical batch, identical sequence
            off2 = c.produce("t", 0, recs, producer_id=pid,
                             producer_epoch=epoch, base_sequence=0)
            assert off1 == off2 == 0
            got = c.fetch("t", 0, 0)
            assert got["high_watermark"] == 2  # nothing duplicated
            assert [v for _, _, v in got["records"]] == [b"v1", b"v2"]

    def test_dedup_window_spans_last_five_batches(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            pid, epoch = c.init_producer_id()
            offs = []
            for i in range(5):
                offs.append(c.produce(
                    "t", 0, [(None, b"x%d" % i)], producer_id=pid,
                    producer_epoch=epoch, base_sequence=i))
            # retry of the OLDEST batch still inside the window
            assert c.produce("t", 0, [(None, b"x0")], producer_id=pid,
                             producer_epoch=epoch,
                             base_sequence=0) == offs[0]
            with KafkaWireClient.connect("127.0.0.1", broker.port) as c2:
                assert len(c2.fetch_all("t", 0)) == 5

    def test_out_of_order_sequence_rejected(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            pid, epoch = c.init_producer_id()
            c.produce("t", 0, [(None, b"a")], producer_id=pid,
                      producer_epoch=epoch, base_sequence=0)
            with pytest.raises(KafkaError) as ei:
                c.produce("t", 0, [(None, b"c")], producer_id=pid,
                          producer_epoch=epoch, base_sequence=5)
            assert ei.value.code == ERR_OUT_OF_ORDER_SEQUENCE
            # the gap batch never landed
            assert len(c.fetch_all("t", 0)) == 1

    def test_sequence_below_window_is_duplicate_error(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            pid, epoch = c.init_producer_id()
            for i in range(7):  # pushes seq 0 and 1 out of the window
                c.produce("t", 0, [(None, b"x%d" % i)], producer_id=pid,
                          producer_epoch=epoch, base_sequence=i)
            with pytest.raises(KafkaError) as ei:
                c.produce("t", 0, [(None, b"x0")], producer_id=pid,
                          producer_epoch=epoch, base_sequence=0)
            assert ei.value.code == ERR_DUPLICATE_SEQUENCE

    def test_unknown_pid_rejected(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            with pytest.raises(KafkaError) as ei:
                c.produce("t", 0, [(None, b"v")], producer_id=999999,
                          producer_epoch=0, base_sequence=0)
            assert ei.value.code == ERR_UNKNOWN_PRODUCER_ID

    def test_sequences_are_per_partition(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            pid, epoch = c.init_producer_id()
            # partition 0 and 1 both start at sequence 0
            assert c.produce("t", 0, [(None, b"a")], producer_id=pid,
                             producer_epoch=epoch, base_sequence=0) == 0
            assert c.produce("t", 1, [(None, b"b")], producer_id=pid,
                             producer_epoch=epoch, base_sequence=0) == 0

    def test_plain_batches_unaffected(self, broker):
        """pid -1 batches keep the pre-KIP-98 append-always path."""
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert c.produce("t", 0, [(None, b"a")]) == 0
            assert c.produce("t", 0, [(None, b"a")]) == 1


class TestEpochFencing:
    def test_stale_epoch_fenced(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            pid, epoch = c.init_producer_id("app-z")
            c.produce("t", 0, [(None, b"a")], producer_id=pid,
                      producer_epoch=epoch, base_sequence=0)
            # a restarted instance re-initializes the same txn id...
            pid2, epoch2 = c.init_producer_id("app-z")
            assert pid2 == pid and epoch2 == epoch + 1
            # ...and the zombie's next produce is rejected
            with pytest.raises(KafkaError) as ei:
                c.produce("t", 0, [(None, b"zombie")], producer_id=pid,
                          producer_epoch=epoch, base_sequence=1)
            assert ei.value.code == ERR_INVALID_PRODUCER_EPOCH

    def test_new_epoch_restarts_sequences(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            pid, epoch = c.init_producer_id("app-y")
            c.produce("t", 0, [(None, b"a")], producer_id=pid,
                      producer_epoch=epoch, base_sequence=0)
            pid2, epoch2 = c.init_producer_id("app-y")
            assert c.produce("t", 0, [(None, b"b")], producer_id=pid2,
                             producer_epoch=epoch2, base_sequence=0) == 1


class TestIdempotentProducer:
    def test_send_tracks_sequences(self, broker):
        with IdempotentProducer("127.0.0.1", broker.port) as p:
            assert p.send("t", 0, [(None, b"a"), (None, b"b")]) == 0
            assert p.send("t", 0, [(None, b"c")]) == 2
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert [v for _, _, v in c.fetch_all("t", 0)] == [
                b"a", b"b", b"c"]

    def test_retry_last_never_duplicates(self, broker):
        with IdempotentProducer("127.0.0.1", broker.port) as p:
            p.send("t", 0, [(None, b"a"), (None, b"b")])
            assert p.retry_last("t", 0) == 0  # original offset
            p.send("t", 0, [(None, b"c")])
            assert p.retry_last("t", 0) == 2
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert [v for _, _, v in c.fetch_all("t", 0)] == [
                b"a", b"b", b"c"]

    def test_stamped_batches_survive_fetch(self, broker):
        """The stored log keeps the producer stamp: a consumer can see
        which PID wrote each batch (what transactions build on)."""
        with IdempotentProducer("127.0.0.1", broker.port) as p:
            p.send("t", 0, [(None, b"a")])
            pid = p.producer_id
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            raw = c.fetch("t", 0, 0)
            assert raw["records"]
        # read the stored encoded batch straight from the fixture log
        enc = broker.enc_logs[("t", 0)]
        out = decode_record_batches(enc[0][2])[0]
        assert out["producer_id"] == pid
        assert out["base_sequence"] == 0


class TestIdempotentSink:
    def test_sink_option_produces_once(self, broker, spark):
        from ru_cdc_spark.config import SinkConfig
        from ru_cdc_spark.streaming.sinks import write_batch_to_sink

        df = spark.createDataFrame(
            [("ti", str(i), "v%d" % i) for i in range(100)],
            "topic string, key string, value string")
        sink = SinkConfig(name="k", kind="kafka_wire",
                          options={"host": "127.0.0.1",
                                   "port": str(broker.port),
                                   "idempotent": "true"})
        write_batch_to_sink(df, sink, 0)
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            vals = sorted(v for _, _, v in c.fetch_all("ti", 0))
        assert vals == sorted(b"v%d" % i for i in range(100))
