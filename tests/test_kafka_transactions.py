"""KIP-98 transactions (sources/kafka_wire.py): control-record codec,
AddPartitionsToTxn/EndTxn wire, broker-authored COMMIT/ABORT markers,
LSO bookkeeping, the aborted-transaction fetch index, read_committed
filtering, multi-partition atomicity, and transactional-id fencing."""

from __future__ import annotations

import pytest

from ru_cdc_spark.sources.kafka_wire import (
    CONTROL_ABORT,
    CONTROL_COMMIT,
    ERR_INVALID_TXN_STATE,
    KafkaBrokerFixture,
    KafkaError,
    KafkaWireClient,
    TransactionalProducer,
    decode_control_record,
    decode_record_batches,
    encode_control_record,
    encode_record_batch,
)


@pytest.fixture()
def broker():
    srv = KafkaBrokerFixture().start()
    yield srv
    srv.stop()


def _vals(client, topic, isolation):
    return [v for _, _, v in client.fetch_all(topic, 0,
                                              isolation=isolation)]


class TestControlRecordCodec:
    def test_marker_roundtrip(self):
        for marker in (CONTROL_ABORT, CONTROL_COMMIT):
            key, value = encode_control_record(marker)
            assert decode_control_record(key) == marker
            assert len(value) == 6  # version + coordinator epoch

    def test_attribute_bits_roundtrip(self):
        b = encode_record_batch([(b"k", b"v")], producer_id=5,
                                producer_epoch=0, base_sequence=0,
                                transactional=True, control=True)
        out = decode_record_batches(b)[0]
        assert out["transactional"] and out["control"] and out["crc_ok"]

    def test_plain_batch_has_neither_bit(self):
        out = decode_record_batches(
            encode_record_batch([(b"k", b"v")]))[0]
        assert not out["transactional"] and not out["control"]


class TestCommitAbortVisibility:
    def test_committed_txn_visible_read_committed(self, broker):
        with TransactionalProducer("127.0.0.1", broker.port, "t1") as p:
            p.begin()
            p.send("t", 0, [(None, b"a"), (None, b"b")])
            p.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert _vals(c, "t", "read_committed") == [b"a", b"b"]

    def test_aborted_txn_invisible_read_committed(self, broker):
        with TransactionalProducer("127.0.0.1", broker.port, "t1") as p:
            p.begin()
            p.send("t", 0, [(None, b"poison")])
            p.abort()
            p.begin()
            p.send("t", 0, [(None, b"good")])
            p.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert _vals(c, "t", "read_committed") == [b"good"]
            # read_uncommitted sees the aborted data too (and still
            # never the markers)
            assert _vals(c, "t", "read_uncommitted") == [b"poison",
                                                         b"good"]

    def test_markers_never_surface_as_records(self, broker):
        with TransactionalProducer("127.0.0.1", broker.port, "t1") as p:
            p.begin()
            p.send("t", 0, [(None, b"x")])
            p.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            got = c.fetch("t", 0, 0)
            assert got["high_watermark"] == 2  # record + marker
            assert [v for _, _, v in got["records"]] == [b"x"]

    def test_interleaved_transactions_filter_independently(self, broker):
        pa = TransactionalProducer("127.0.0.1", broker.port, "ta")
        pb = TransactionalProducer("127.0.0.1", broker.port, "tb")
        pa.begin(), pb.begin()
        pa.send("t", 0, [(None, b"a1")])
        pb.send("t", 0, [(None, b"b1")])
        pa.send("t", 0, [(None, b"a2")])
        pa.commit()
        pb.send("t", 0, [(None, b"b2")])
        pb.abort()
        pa.close(), pb.close()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert _vals(c, "t", "read_committed") == [b"a1", b"a2"]

    def test_multi_partition_atomicity(self, broker):
        with TransactionalProducer("127.0.0.1", broker.port, "t1") as p:
            p.begin()
            p.send("t", 0, [(None, b"p0")])
            p.send("t", 1, [(None, b"p1")])
            p.abort()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert _vals(c, "t", "read_committed") == []
            c2 = KafkaWireClient.connect("127.0.0.1", broker.port)
            assert [v for _, _, v in c2.fetch_all(
                "t", 1, isolation="read_committed")] == []
            c2.close()


class TestLastStableOffset:
    def test_open_txn_blocks_read_committed(self, broker):
        p = TransactionalProducer("127.0.0.1", broker.port, "t1")
        p.begin()
        p.send("t", 0, [(None, b"pending")])
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            got = c.fetch("t", 0, 0, isolation="read_committed")
            assert got["last_stable_offset"] == 0  # txn open at 0
            assert got["records"] == []
            # read_uncommitted is not blocked
            got_u = c.fetch("t", 0, 0)
            assert [v for _, _, v in got_u["records"]] == [b"pending"]
        p.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            got = c.fetch("t", 0, 0, isolation="read_committed")
            assert got["last_stable_offset"] == 2
            assert [v for _, _, v in got["records"]] == [b"pending"]
        p.close()


class TestTxnStateMachine:
    def test_unregistered_partition_rejected(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            pid, epoch = c.init_producer_id("t1")
            with pytest.raises(KafkaError) as ei:
                c.produce("t", 0, [(None, b"x")], producer_id=pid,
                          producer_epoch=epoch, base_sequence=0,
                          transactional=True, transactional_id="t1")
            assert ei.value.code == ERR_INVALID_TXN_STATE

    def test_end_txn_without_partitions_rejected(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            pid, epoch = c.init_producer_id("t1")
            with pytest.raises(KafkaError) as ei:
                c.end_txn("t1", pid, epoch, True)
            assert ei.value.code == ERR_INVALID_TXN_STATE

    def test_producer_guards_send_outside_txn(self, broker):
        with TransactionalProducer("127.0.0.1", broker.port, "t1") as p:
            with pytest.raises(RuntimeError):
                p.send("t", 0, [(None, b"x")])

    def test_reinit_fences_and_aborts_open_txn(self, broker):
        """The coordinator recovery rule: a restarted instance's
        InitProducerId aborts the zombie's unfinished transaction and
        fences its epoch."""
        p_old = TransactionalProducer("127.0.0.1", broker.port, "app")
        p_old.begin()
        p_old.send("t", 0, [(None, b"zombie-data")])
        # instance restarts (same transactional id)
        p_new = TransactionalProducer("127.0.0.1", broker.port, "app")
        assert p_new.producer_id == p_old.producer_id
        assert p_new.producer_epoch == p_old.producer_epoch + 1
        # the zombie's open txn was aborted at re-init
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert _vals(c, "t", "read_committed") == []
        # and the zombie itself is fenced now
        with pytest.raises(KafkaError):
            p_old.send("t", 0, [(None, b"more")])
        # the new instance works
        p_new.begin()
        p_new.send("t", 0, [(None, b"fresh")])
        p_new.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert _vals(c, "t", "read_committed") == [b"fresh"]
        p_old.close(), p_new.close()
