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


class TestMultiWindowFetch:
    """Regression for the round-5 wrong answer: the broker's aborted-
    transaction index stored only (pid, first_offset) and served every
    entry below the window end — so on the SECOND fetch window, an
    entry whose ABORT marker was already consumed re-marked the pid
    aborted and the client dropped COMMITTED batches. Real brokers'
    .txnindex stores the marker offset too and serves only entries
    overlapping the fetched range."""

    def test_committed_survive_tiny_fetch_windows(self, broker):
        # abort→commit→abort→commit from ONE producer, then read the
        # topic back 256 bytes at a time: every committed record must
        # surface, zero aborted ones. (With the round-5 index this
        # returned 0/50.)
        committed = []
        with TransactionalProducer("127.0.0.1", broker.port, "t1") as p:
            for round_ in range(5):
                p.begin()
                p.send("t", 0, [(None, b"poison-%d-%d" % (round_, i))
                                for i in range(5)])
                p.abort()
                p.begin()
                batch = [(None, b"good-%d-%d" % (round_, i))
                         for i in range(5)]
                p.send("t", 0, batch)
                committed.extend(v for _, v in batch)
                p.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            for mb in (256, 512, 1 << 20):
                got = [v for _, _, v in c.fetch_all(
                    "t", 0, isolation="read_committed", max_bytes=mb)]
                assert got == committed, f"max_bytes={mb}"

    def test_interleaved_pids_multi_window(self, broker):
        # two producers interleaved, committed data from one must not
        # be poisoned by the other's stale aborted-index entries
        pa = TransactionalProducer("127.0.0.1", broker.port, "ta")
        pb = TransactionalProducer("127.0.0.1", broker.port, "tb")
        want = []
        for i in range(8):
            pa.begin(), pb.begin()
            pa.send("t", 0, [(None, b"a-%d" % i)])
            pb.send("t", 0, [(None, b"b-%d" % i)])
            if i % 2:
                pa.commit()
                want.append(b"a-%d" % i)
                pb.abort()
            else:
                pa.abort()
                pb.commit()
                want.append(b"b-%d" % i)
        pa.close(), pb.close()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            got = [v for _, _, v in c.fetch_all(
                "t", 0, isolation="read_committed", max_bytes=128)]
            assert sorted(got) == sorted(want)

    def test_mid_stream_start_offset(self, broker):
        # starting a consumer mid-topic: entries whose marker precedes
        # the start offset must be excluded, entries spanning it kept
        with TransactionalProducer("127.0.0.1", broker.port, "t1") as p:
            p.begin()
            p.send("t", 0, [(None, b"dead-1"), (None, b"dead-2")])
            p.abort()  # offsets 0,1 + marker 2
            p.begin()
            p.send("t", 0, [(None, b"live-1")])  # offset 3
            p.commit()  # marker 4
            p.begin()
            p.send("t", 0, [(None, b"dead-3")])  # offset 5
            p.abort()  # marker 6
            p.begin()
            p.send("t", 0, [(None, b"live-2")])  # offset 7
            p.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            got = [v for _, _, v in c.fetch_all(
                "t", 0, offset=3, isolation="read_committed",
                max_bytes=96)]
            assert got == [b"live-1", b"live-2"]


class TestMultiPartitionTransactions:
    """KIP-98's point: markers are stamped on ALL registered
    partitions, atomically — not just partition 0 (round-5 gap)."""

    def test_abort_invisible_on_every_partition(self, broker):
        with TransactionalProducer("127.0.0.1", broker.port, "t1") as p:
            p.begin()
            for part in range(3):
                p.send("t", part, [(None, b"x%d" % part)])
            p.abort()
            p.begin()
            for part in range(3):
                p.send("t", part, [(None, b"keep%d" % part)])
            p.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            for part in range(3):
                got = [v for _, _, v in c.fetch_all(
                    "t", part, isolation="read_committed",
                    max_bytes=96)]
                assert got == [b"keep%d" % part], f"partition {part}"

    def test_commit_spans_partitions_atomically(self, broker):
        with TransactionalProducer("127.0.0.1", broker.port, "t1") as p:
            p.begin()
            p.send("t", 0, [(None, b"l")])
            p.send("t", 2, [(None, b"r")])
            p.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert _vals(c, "t", "read_committed") == [b"l"]
            assert [v for _, _, v in c.fetch_all(
                "t", 2, isolation="read_committed")] == [b"r"]
            # partition 1 was never touched: no log, no markers
            assert c.fetch("t", 1, 0)["high_watermark"] == 0

    def test_epoch_fence_rejects_old_producer_all_partitions(self, broker):
        p_old = TransactionalProducer("127.0.0.1", broker.port, "app")
        p_old.begin()
        p_old.send("t", 0, [(None, b"z0")])
        p_old.send("t", 1, [(None, b"z1")])
        p_new = TransactionalProducer("127.0.0.1", broker.port, "app")
        assert p_new.producer_epoch == p_old.producer_epoch + 1
        # zombie fenced on every partition it writes to
        for part in (0, 1):
            with pytest.raises(KafkaError):
                p_old.send("t", part, [(None, b"late")])
        p_new.begin()
        p_new.send("t", 1, [(None, b"fresh")])
        p_new.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert [v for _, _, v in c.fetch_all(
                "t", 1, isolation="read_committed")] == [b"fresh"]
            assert _vals(c, "t", "read_committed") == []
        p_old.close(), p_new.close()


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


class TestExactlyOnceOffsets:
    """sendOffsetsToTransaction (round 9): consumer offsets committed
    ATOMICALLY with the produced records — the consume-transform-
    produce exactly-once handshake (AddOffsetsToTxn + TxnOffsetCommit,
    applied at EndTxn COMMIT, discarded on ABORT)."""

    def _seed_input(self, broker, n=6):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            c.produce("in", 0, [(b"k%d" % i, b"v%d" % i)
                                for i in range(n)])

    def test_commit_applies_offsets_with_records(self, broker):
        self._seed_input(broker)
        with TransactionalProducer("127.0.0.1", broker.port,
                                   "eos1") as p:
            p.begin()
            p.send("out", 0, [(b"k", b"transformed")])
            p.send_offsets_to_transaction("g-eos", "in", {0: 6},
                                          metadata="eos")
            # BEFORE commit: neither the records nor the offsets exist
            with KafkaWireClient.connect("127.0.0.1",
                                         broker.port) as c:
                assert c.fetch_all("out", 0,
                                   isolation="read_committed") == []
                assert c.offset_fetch("g-eos", "in", [0])[0] == \
                    (-1, None)
            p.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            got = c.fetch_all("out", 0, isolation="read_committed")
            assert [v for _o, _k, v in got] == [b"transformed"]
            assert c.offset_fetch("g-eos", "in", [0])[0] == (6, "eos")

    def test_abort_discards_offsets_and_records_together(self, broker):
        self._seed_input(broker)
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            c.offset_commit("g-eos2", "in", {0: 2})  # pre-txn position
        with TransactionalProducer("127.0.0.1", broker.port,
                                   "eos2") as p:
            p.begin()
            p.send("out2", 0, [(b"k", b"half-done")])
            p.send_offsets_to_transaction("g-eos2", "in", {0: 6})
            p.abort()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            # output invisible AND the group still at its pre-txn
            # offset: the transform will replay, nothing was lost or
            # double-counted
            assert c.fetch_all("out2", 0,
                               isolation="read_committed") == []
            assert c.offset_fetch("g-eos2", "in", [0])[0][0] == 2

    def test_offsets_only_transaction_commits(self, broker):
        with TransactionalProducer("127.0.0.1", broker.port,
                                   "eos3") as p:
            p.begin()
            p.send_offsets_to_transaction("g-eos3", "in", {0: 3})
            p.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert c.offset_fetch("g-eos3", "in", [0])[0][0] == 3

    def test_txn_offset_commit_requires_registration(self, broker):
        from ru_cdc_spark.sources.kafka_wire import KafkaError

        with TransactionalProducer("127.0.0.1", broker.port,
                                   "eos4") as p:
            p.begin()
            with pytest.raises(KafkaError):
                # TxnOffsetCommit without AddOffsetsToTxn first
                p._client.txn_offset_commit(
                    "eos4", "g-eos4", p.producer_id,
                    p.producer_epoch, "in", {0: 1})
            # the rejected stage registered nothing, so ending the
            # empty transaction is itself INVALID_TXN_STATE
            with pytest.raises(KafkaError):
                p.abort()

    def test_fenced_zombie_cannot_stage_offsets(self, broker):
        from ru_cdc_spark.sources.kafka_wire import KafkaError

        old = TransactionalProducer("127.0.0.1", broker.port, "eos5")
        old.begin()
        old.send_offsets_to_transaction("g-eos5", "in", {0: 1})
        # a restart with the same transactional id bumps the epoch,
        # fencing the zombie
        new = TransactionalProducer("127.0.0.1", broker.port, "eos5")
        with pytest.raises(KafkaError):
            old.send_offsets_to_transaction("g-eos5", "in", {0: 2})
        new.begin()
        new.send_offsets_to_transaction("g-eos5", "in", {0: 9})
        new.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert c.offset_fetch("g-eos5", "in", [0])[0][0] == 9
        old.close()
        new.close()

    def test_fencing_aborts_offsets_only_zombie_txn(self, broker):
        """The reviewer-found hole: a zombie whose open transaction
        staged ONLY offsets (no data partitions) must have them
        discarded at fencing — otherwise the successor's next commit
        would apply the zombie's stale consumer position and records
        whose transformed output never landed would be skipped."""
        old = TransactionalProducer("127.0.0.1", broker.port, "eos6")
        old.begin()
        old.send_offsets_to_transaction("g-eos6", "in", {0: 5})
        # zombie dies silently; successor re-inits the same txn id
        new = TransactionalProducer("127.0.0.1", broker.port, "eos6")
        new.begin()
        # the successor commits offsets for a DIFFERENT partition: the
        # zombie's staged p0 offset must NOT ride along
        new.send_offsets_to_transaction("g-eos6", "in", {1: 7})
        new.commit()
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            got = c.offset_fetch("g-eos6", "in", [0, 1])
            assert got[0][0] == -1   # zombie's stage died with the fence
            assert got[1][0] == 7
        old.close()
        new.close()
