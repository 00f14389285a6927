"""rpl_semi_sync replication over live sockets (round 9): the replica
registers via SET @rpl_semi_sync_slave, the master frames every dumped
event with the 0xEF semisync header, and each flagged event (XID commit
boundary / stream tail) BLOCKS the master until the replica's ACK
(0xEF + u64 log_pos + filename) arrives — the AFTER_SYNC durability
wait. The fixture master records every ACK, so these tests assert the
replica side byte-exactly. The reference has no semi-sync support."""

from __future__ import annotations

import pytest

from ru_cdc_spark.sources.mysql_client import MySQLConnection
from ru_cdc_spark.sources.mysql_fixture_server import (
    MySQLFixtureServer,
    VirtualBinlog,
)

XID_EVENT = 16


@pytest.fixture
def semi_srv():
    srv = MySQLFixtureServer(
        binlog=VirtualBinlog.from_txn_fixture(20),
        semi_sync=True).start()
    yield srv
    srv.stop()


def _connect(srv):
    return MySQLConnection.connect("127.0.0.1", srv.port, srv.user,
                                   srv.password)


class TestSemiSync:
    def test_master_flag_probe(self, semi_srv):
        with _connect(semi_srv) as c:
            rs = c.query("SELECT @@global.rpl_semi_sync_master_enabled")
            assert rs.rows == [["1"]]

    def test_events_identical_to_plain_dump(self, semi_srv):
        fn = semi_srv.binlog.filename
        with _connect(semi_srv) as c:
            semi = list(c.binlog_dump(fn, 4, semi_sync=True))
        with _connect(semi_srv) as c:
            plain = list(c.binlog_dump(fn, 4))
        assert semi == plain  # framing strips cleanly, nothing lost

    def test_every_flagged_event_acked_at_its_log_pos(self, semi_srv):
        fn = semi_srv.binlog.filename
        with _connect(semi_srv) as c:
            evs = list(c.binlog_dump(fn, 4, semi_sync=True))
        flagged = [ev for k, ev in enumerate(evs)
                   if ev[4] == XID_EVENT or k == len(evs) - 1]
        want = [(fn, int.from_bytes(ev[13:17], "little"))
                for ev in flagged]
        assert semi_srv.semi_sync_acks == want
        assert semi_srv.semi_sync_bad_acks == 0
        # real transactions in the fixture: XID boundaries were flagged
        assert sum(1 for ev in evs if ev[4] == XID_EVENT) > 0

    def test_unregistered_client_gets_plain_framing(self, semi_srv):
        # a replica that never SET @rpl_semi_sync_slave must receive
        # the ordinary dump even when the master has semisync on
        fn = semi_srv.binlog.filename
        with _connect(semi_srv) as c:
            evs = list(c.binlog_dump(fn, 4))
        assert len(evs) > 0
        assert semi_srv.semi_sync_acks == []

    def test_missing_header_raises_loud(self):
        # master WITHOUT semisync + replica asking for it: the event
        # packets lack the 0xEF header and the client must fail loud,
        # not misparse event bytes shifted by two
        srv = MySQLFixtureServer(
            binlog=VirtualBinlog.from_txn_fixture(3)).start()
        try:
            with _connect(srv) as c:
                with pytest.raises(ValueError, match="semisync header"):
                    list(c.binlog_dump(srv.binlog.filename, 4,
                                       semi_sync=True))
        finally:
            srv.stop()

    def test_checksummed_rotate_acks_clean_filename(self):
        """binlog_checksum=CRC32 + a mid-stream file rotate: the ACK
        filename after the rotate must be the announced next file with
        the 4-byte CRC trailer stripped — not filename + 4 arbitrary
        checksum bytes (r9 advice: ev[27:].rstrip(b'\\x00') kept the
        CRC whenever it wasn't all-zero, corrupting every later ACK)."""
        from ru_cdc_spark.sources.binlog_txn import txn_event_bytes
        from ru_cdc_spark.sources.binlog_wire import (
            CHECKSUM_CRC32,
            encode_format_description,
        )

        chain = []
        for k, tids in enumerate(([0, 1], [2, 3])):
            vb = VirtualBinlog(f"crc.{k + 1:06d}", crc32=True)
            vb.append(encode_format_description(CHECKSUM_CRC32))
            for tid in tids:
                vb.append_blob(txn_event_bytes(tid))
            chain.append(vb)
        srv = MySQLFixtureServer(binlogs=chain, semi_sync=True).start()
        try:
            with _connect(srv) as c:
                evs = list(c.binlog_dump("crc.000001", 4,
                                         semi_sync=True))
            files = [f for f, _pos in srv.semi_sync_acks]
            # XID commits in file 1 ack the start file; XID commits
            # (and the stream tail) after the genuine rotate ack the
            # NEXT file — byte-clean, no CRC residue
            assert set(files) == {"crc.000001", "crc.000002"}
            assert files == sorted(files)  # monotone file switch
            assert srv.semi_sync_bad_acks == 0
            # the genuine rotate itself arrived checksummed
            rotates = [ev for ev in evs
                       if ev[4] == 4
                       and int.from_bytes(ev[0:4], "little") != 0]
            assert len(rotates) == 1
        finally:
            srv.stop()

    def test_cdc_fixture_tail_ack_only(self):
        # a stream with no XID events still acks the stream tail once
        srv = MySQLFixtureServer(
            binlog=VirtualBinlog.from_cdc_fixture(50),
            semi_sync=True).start()
        try:
            with _connect(srv) as c:
                evs = list(c.binlog_dump(srv.binlog.filename, 4,
                                         semi_sync=True))
            assert len(srv.semi_sync_acks) == 1
            assert srv.semi_sync_acks[0] == (
                srv.binlog.filename,
                int.from_bytes(evs[-1][13:17], "little"))
        finally:
            srv.stop()


def test_distributed_slices_ack_through_semisync(spark, sf_dir):
    """The fused socket reader under semisync transport: every slice
    connection registers as a semisync replica; slices that stop at
    their range bound hang up (a normal replica disconnect, never a
    bad ACK), the slice that drains to the stream tail ACKs the
    tail flag, and the decoded rows are IDENTICAL to the plain
    transport's."""
    from ru_cdc_spark.sources.mysql_socket_source import (
        socket_cdc_changes,
    )

    srv = MySQLFixtureServer(
        binlog=VirtualBinlog.from_cdc_fixture(200),
        semi_sync=True).start()
    try:
        semi = socket_cdc_changes(spark, "127.0.0.1", srv.port,
                                  srv.user, srv.password, n_slices=4,
                                  semi_sync=True).collect()
        assert len(semi) > 0
        assert len(srv.semi_sync_acks) >= 1  # the tail-flag ACK
        assert srv.semi_sync_bad_acks == 0
        plain = socket_cdc_changes(spark, "127.0.0.1", srv.port,
                                   srv.user, srv.password,
                                   n_slices=4).collect()
        assert sorted(map(tuple, semi)) == sorted(map(tuple, plain))
    finally:
        srv.stop()


def test_multi_file_semisync_matches_plain_and_acks_right_file():
    """A dump crossing a file boundary under semisync: the genuine
    inter-file ROTATE must be delivered (identical stream to a plain
    dump) and ACK filenames must advance to the new file."""
    vb1 = VirtualBinlog.from_txn_fixture(6, filename="binlog.000001")
    vb2 = VirtualBinlog.from_txn_fixture(6, filename="binlog.000002")
    srv = MySQLFixtureServer(binlogs=[vb1, vb2], semi_sync=True).start()
    try:
        with _connect(srv) as c:
            semi = list(c.binlog_dump("binlog.000001", 4,
                                      semi_sync=True))
        with _connect(srv) as c:
            plain = list(c.binlog_dump("binlog.000001", 4))
        assert semi == plain
        files = {f for f, _pos in srv.semi_sync_acks}
        assert files == {"binlog.000001", "binlog.000002"}
        assert srv.semi_sync_bad_acks == 0
    finally:
        srv.stop()
