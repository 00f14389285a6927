"""GTID failover (round-7 verdict item #5): a streaming reader loses its
server mid-stream and re-points at a SECOND server carrying the same
GTID history under a DIFFERENT binlog file layout — the exact case
COM_BINLOG_DUMP_GTID auto-positioning exists for. (file, pos) from the
dead server is meaningless on the survivor; the executed-GTID set is
portable, and delivery must stay loss-free and duplicate-free."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from ru_cdc_spark.sources.mysql_fixture_server import (
    MySQLFixtureServer,
    VirtualBinlog,
)

N = 120  # txns in the shared history (gnos 1..N)


def _committed_baseline():
    """Expected committed rows: assemble the raw history directly."""
    from ru_cdc_spark.sources.binlog_txn import TxnAssembler

    asm = TxnAssembler()
    rows = []
    for vb in VirtualBinlog.txn_chain(N, [40, 80], prefix="binlogX"):
        for _s, _e, ev in vb.events:
            rows += asm.feed(ev)
    return sorted(
        (r["gno"], r["xid"], r["op"], r["seq_in_txn"], r["i"], r["qty"],
         r["amount"], r["note"])
        for r in rows if r["status"] == "committed")


def _committed_output(spark, out):
    df = spark.read.parquet(out).where(F.col("status") == "committed")
    return sorted(
        (r["gno"], r["xid"], r["op"], r["seq_in_txn"], r["i"], r["qty"],
         r["amount"], r["note"]) for r in df.collect())


class TestGtidHelpers:
    def test_gtid_set_add_merges_intervals(self):
        from ru_cdc_spark.sources.mysql_socket_source import gtid_set_add

        s: dict = {}
        for gno in (5, 3, 4, 9, 1):
            gtid_set_add(s, "ab" * 16, gno)
        assert s == {"ab" * 16: [[1, 2], [3, 6], [9, 10]]}
        gtid_set_add(s, "ab" * 16, 2)
        assert s == {"ab" * 16: [[1, 6], [9, 10]]}

    def test_fetch_gtid_positions_parses_info(self):
        from ru_cdc_spark.sources.binlog_txn import TXN_SID
        from ru_cdc_spark.sources.mysql_socket_source import (
            fetch_gtid_positions,
        )

        with MySQLFixtureServer(
                binlog=VirtualBinlog.from_txn_fixture(10)) as srv:
            rows = fetch_gtid_positions("127.0.0.1", srv.port, srv.user,
                                        srv.password, "binlog.000001")
        assert [g for _, g, _ in rows] == list(range(1, 11))
        assert {sid for _, _, sid in rows} == {TXN_SID.hex()}
        starts = [s for s, _, _ in rows]
        assert starts == sorted(starts)

    def test_auto_position_probe(self):
        """The driver probe learns (file, pos) on a server with a
        DIFFERENT layout from the executed set alone."""
        from ru_cdc_spark.sources.binlog_txn import TXN_SID
        from ru_cdc_spark.sources.mysql_socket_source import (
            fetch_gtid_positions,
            gtid_auto_position,
        )

        chain = VirtualBinlog.txn_chain(N, [40, 80], prefix="binlogB")
        with MySQLFixtureServer(binlogs=chain) as srv:
            # executed: gnos 1..50 -> resume must land on gno 51, which
            # lives in the SECOND file of this layout
            fname, pos = gtid_auto_position(
                "127.0.0.1", srv.port, srv.user, srv.password,
                {TXN_SID: [(1, 51)]})
            assert fname == "binlogB.000002"
            g2 = fetch_gtid_positions("127.0.0.1", srv.port, srv.user,
                                      srv.password, fname)
            assert (pos, 51) in [(s, g) for s, g, _ in g2]
            # everything executed -> the tip
            fname, pos = gtid_auto_position(
                "127.0.0.1", srv.port, srv.user, srv.password,
                {TXN_SID: [(1, N + 1)]})
            assert fname == chain[-1].filename
            assert pos == chain[-1].end_pos


class TestCrossFileWindowOrder:
    def test_window_spanning_file_boundary_assembles_in_order(
            self, spark, tmp_path):
        """REGRESSION (the round-7 flake): a GTID window crossing the
        serving endpoint's file rotation. Positions are file-relative
        and RESET in the next file, so emitting raw log_pos as the
        batch seq let the assembler's sort order later transactions
        before earlier ones — rows glued to the wrong GTID, scattered
        loss + phantom seq_in_txn. The reader must emit a window-local
        monotonic counter instead; this window spans BOTH boundaries
        of a three-file layout, which fails deterministically under
        the old code."""
        from ru_cdc_spark.sources.binlog_txn import (
            TXN_SID,
            assemble_event_batch,
        )
        from ru_cdc_spark.sources.mysql_socket_source import (
            BinlogSocketStreamReader,
            _GtidWindowPartition,
        )

        chain = VirtualBinlog.txn_chain(N, [40, 80], prefix="binlogR")
        with MySQLFixtureServer(binlogs=chain) as srv:
            reader = BinlogSocketStreamReader({
                "endpoints": f"127.0.0.1:{srv.port}",
                "user": srv.user, "password": srv.password,
                "emit": "events", "cut_at": "gtid",
                "position_file": str(tmp_path / "meta.json"),
            })
            part = _GtidWindowPartition(
                {}, {TXN_SID.hex(): [[1, N + 1]]},
                [("127.0.0.1", srv.port)], 0)
            events = list(reader._read_gtid_window(part))
        seqs = [s for s, _ in events]
        assert seqs == sorted(seqs), "window seq must be monotonic"
        assert len(set(seqs)) == len(seqs), "window seq must be unique"
        bdf = spark.createDataFrame(
            [(s, bytearray(ev)) for s, ev in events],
            "pos long, frame binary")
        out = assemble_event_batch(bdf) \
            .where(F.col("status") == "committed")
        got = sorted(
            (r["gno"], r["xid"], r["op"], r["seq_in_txn"], r["i"],
             r["qty"], r["amount"], r["note"]) for r in out.collect())
        assert got == _committed_baseline()

    def test_rotation_recovery_biases_new_file_positions(self):
        """The (file, pos) crash-recovery pair: the new file's yielded
        positions must sort AFTER the old file's tail."""
        from ru_cdc_spark.sources.mysql_socket_source import (
            BinlogSocketStreamReader,
        )

        with MySQLFixtureServer(
                binlogs=VirtualBinlog.txn_chain(20, [10],
                                                prefix="binlogP")) as srv:
            reader = BinlogSocketStreamReader({
                "host": "127.0.0.1", "port": str(srv.port),
                "user": srv.user, "password": srv.password,
                "emit": "events",
            })
            parts = reader.partitions(
                {"file": "binlogP.000001", "pos": 400},
                {"file": "binlogP.000002",
                 "pos": srv.binlogs[1].end_pos})
            assert len(parts) == 2
            tail = [p for p, _ in reader.read(parts[0])]
            head = [p for p, _ in reader.read(parts[1])]
        assert tail and head
        # yielded positions are file-seq-biased (wire_seq), so the
        # cross-file order is total — across batches too, not just
        # inside the rotation-spanning one
        from ru_cdc_spark.sources.incremental_snapshot import wire_seq

        assert min(tail) >= wire_seq("binlogP.000001", 0)
        assert min(head) >= wire_seq("binlogP.000002", 0)
        assert max(tail) < min(head), \
            "new-file positions must outrank the old file's tail"


class TestFailoverStream:
    def test_mid_stream_failover_no_loss_no_dup(self, spark, tmp_path):
        from ru_cdc_spark.sources.binlog_txn import assemble_event_batch
        from ru_cdc_spark.sources.mysql_socket_source import (
            register_binlog_socket_source,
        )

        srv_a = MySQLFixtureServer(
            binlogs=VirtualBinlog.txn_chain(N, [60])).start()
        srv_b = MySQLFixtureServer(
            binlogs=VirtualBinlog.txn_chain(N, [40, 80],
                                            prefix="binlogB")).start()
        register_binlog_socket_source(spark)
        out = str(tmp_path / "out")
        ck = str(tmp_path / "ck")

        def apply_batch(bdf, batch_id):
            assemble_event_batch(bdf).write.mode("overwrite").parquet(
                f"{out}/epoch={batch_id}")

        def start_query():
            stream = (spark.readStream.format("binlog_socket")
                      .option("endpoints",
                              f"127.0.0.1:{srv_a.port},"
                              f"127.0.0.1:{srv_b.port}")
                      .option("user", srv_a.user)
                      .option("password", srv_a.password)
                      .option("emit", "events")
                      .option("cut_at", "gtid")
                      .option("position_file",
                              str(tmp_path / "meta.json"))
                      .option("events_per_batch", 120).load())
            return (stream.writeStream.foreachBatch(apply_batch)
                    .option("checkpointLocation", ck)
                    .trigger(processingTime="0 seconds").start())

        def covered(q):
            import ast
            import json as _json

            p = q.lastProgress
            if not p or not p["sources"]:
                return 0
            eo = p["sources"][0]["endOffset"]
            if isinstance(eo, str):
                try:
                    eo = _json.loads(eo)
                except ValueError:
                    eo = ast.literal_eval(eo)
            ivs = (eo or {}).get("gtid", {})
            return sum(hi - lo for v in ivs.values() for lo, hi in v)

        try:
            # phase 1 on server A: commit SOME batches, then crash
            q = start_query()
            deadline = time.time() + 360
            while covered(q) < 30:
                assert q.exception() is None, q.exception()
                assert time.time() < deadline, "phase 1 stalled"
                time.sleep(0.05)
            q.stop()
            srv_a.stop()  # the primary dies for good

            # phase 2: restart -> reader must fail over to B (different
            # files/positions) and drain the remaining history
            q = start_query()
            deadline = time.time() + 360
            while covered(q) < N:
                assert q.exception() is None, q.exception()
                assert time.time() < deadline, "failover drain stalled"
                time.sleep(0.05)
            # let the last planned batch commit
            deadline = time.time() + 360
            while time.time() < deadline:
                p = q.lastProgress
                if p and p["numInputRows"] == 0 and covered(q) >= N:
                    break
                time.sleep(0.05)
            q.stop()
        finally:
            srv_b.stop()
            try:
                srv_a.stop()
            except Exception:  # noqa: BLE001
                pass

        assert _committed_output(spark, out) == _committed_baseline()
