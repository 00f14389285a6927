"""DBLog-style incremental snapshot (sources/incremental_snapshot.py):
chunked PK-range reads with SHOW-MASTER-STATUS watermarks, per-chunk
dedup of pks touched inside the window, and the versioned merge with
the change stream. The fixture side is MySQLFixtureServer.LiveTable —
DML that both mutates the row store and appends real binlog events."""

from __future__ import annotations

from decimal import Decimal

import pytest

from ru_cdc_spark.sources.binlog_wire import (
    ColSpec,
    T_LONG,
    T_LONGLONG,
    T_NEWDECIMAL,
    T_VARCHAR,
    CHECKSUM_NONE,
    encode_format_description,
)
from ru_cdc_spark.sources.incremental_snapshot import (
    SnapshotPlan,
    plan_snapshot,
    read_chunk,
    snapshot_changes,
    snapshot_chunks,
)
from ru_cdc_spark.sources.mysql_fixture_server import (
    MySQLFixtureServer,
    VirtualBinlog,
)

COLS = [
    ("id", ColSpec(T_LONGLONG)),
    ("val", ColSpec(T_LONG)),
    ("name", ColSpec(T_VARCHAR, (300,))),
    ("amount", ColSpec(T_NEWDECIMAL, (12, 4))),
]


def _row(i: int) -> tuple:
    return (i, i * 10, f"n_{i}", Decimal(i * 11).scaleb(-4))


@pytest.fixture()
def srv():
    vb = VirtualBinlog()
    vb.append(encode_format_description(CHECKSUM_NONE))
    s = MySQLFixtureServer(binlog=vb).start()
    try:
        yield s
    finally:
        s.stop()


def _table(srv, n=30):
    t = srv.add_live_table("snaptab", COLS)
    t.insert(*[_row(i) for i in range(n)])
    return t


class TestLiveTableFixture:
    def test_select_range_and_minmax(self, srv):
        from ru_cdc_spark.sources.mysql_client import MySQLConnection

        _table(srv)
        with MySQLConnection.connect("127.0.0.1", srv.port, srv.user,
                                     srv.password) as conn:
            rs = conn.query("select id, val, name, amount from snaptab "
                            "where id > 4 and id <= 7 order by id")
            assert [r[0] for r in rs.rows] == ["5", "6", "7"]
            assert rs.rows[0] == ["5", "50", "n_5", "0.0055"]
            mm = conn.query("select min(id), max(id) from snaptab")
            assert mm.rows == [["0", "29"]]
            fields = conn.desc_table("app", "snaptab")
            assert [f.name for f in fields] == ["id", "val", "name",
                                                "amount"]
            assert fields[0].is_pk and not fields[1].is_pk

    def test_dml_appends_decodable_binlog_events(self, srv):
        from ru_cdc_spark.sources.binlog_wire import (
            decode_rows_event,
            decode_table_map,
        )

        t = _table(srv, n=3)
        t.update((1, 999, "upd", Decimal("1.5000")))
        t.delete(2)
        decoded = []
        specs = None
        for _s, _e, ev in srv.binlog.events:
            if ev[4] == 19:
                _tid, _sch, name, specs = decode_table_map(ev)
                assert name == "snaptab"
            elif ev[4] in (30, 31, 32):
                decoded.append(decode_rows_event(ev, specs))
        types = [t_ for t_, _ in decoded]
        assert types == [30, 31, 32]
        upd_rows = decoded[1][1]
        assert upd_rows[0][0] == (1, 10, "n_1", Decimal("0.0011"))
        assert upd_rows[0][1] == (1, 999, "upd", Decimal("1.5000"))
        assert decoded[2][1] == [(2, 20, "n_2", Decimal("0.0022"))]

    def test_positions_bracket_mutations(self, srv):
        """The whole watermark premise: a mutation between two SHOW
        MASTER STATUS reads lands inside the position window."""
        from ru_cdc_spark.sources.mysql_client import MySQLConnection

        t = _table(srv)
        with MySQLConnection.connect("127.0.0.1", srv.port, srv.user,
                                     srv.password) as conn:
            _, p1 = conn.show_master_status()
            t.update((3, -1, "raced", Decimal("0.0001")))
            _, p2 = conn.show_master_status()
        assert p2 > p1


class TestChunkRead:
    def test_quiet_chunk_keeps_all_rows(self, srv):
        _table(srv)
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        rows, pos_l = read_chunk("127.0.0.1", srv.port, srv.user,
                                 srv.password, plan, -1, 9)
        assert [r[0] for r in rows] == [str(i) for i in range(10)]
        from ru_cdc_spark.sources.incremental_snapshot import wire_seq

        assert pos_l == wire_seq("binlog.000001", srv.binlog.end_pos)

    def test_windowed_mutation_drops_only_its_pk(self, srv):
        """DBLog's dedup rule: the pk written inside [L, H] leaves the
        chunk (its SELECT value raced the write); neighbors stay."""
        t = _table(srv)
        srv.on_select = lambda _t, lo, hi: t.update(
            (5, 555, "raced", Decimal("5.5555")))
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        rows, _ = read_chunk("127.0.0.1", srv.port, srv.user,
                             srv.password, plan, -1, 9)
        assert [r[0] for r in rows] == [str(i) for i in range(10)
                                        if i != 5]

    def test_out_of_range_mutation_does_not_dedup(self, srv):
        t = _table(srv)
        srv.on_select = lambda _t, lo, hi: t.update(
            (25, 555, "elsewhere", Decimal("5.5555")))
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        rows, _ = read_chunk("127.0.0.1", srv.port, srv.user,
                             srv.password, plan, -1, 9)
        assert [r[0] for r in rows] == [str(i) for i in range(10)]


class TestPlan:
    def test_ranges_cover_exactly(self, srv):
        _table(srv, n=25)
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        assert plan.ranges == [(-1, 9), (9, 19), (19, 24)]
        assert plan.columns == ["id", "val", "name", "amount"]
        assert plan.pk == "id"
        assert plan.start_pos == srv.binlog.end_pos

    def test_empty_table(self, srv):
        srv.add_live_table("snaptab", COLS)
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        assert plan.ranges == []


class TestResumableRunner:
    def test_interrupted_run_resumes_without_rereading(self, spark, srv,
                                                       tmp_path):
        """Kill-and-resume: the first attempt completes only some
        chunks (simulated by a server that refuses SELECTs after two
        chunks); the resumed run executes ONLY the missing chunks (the
        completed ones' SELECTs are not re-issued) and the final
        output equals an uninterrupted run's."""
        import shutil

        from ru_cdc_spark.sources.incremental_snapshot import (
            run_snapshot_resumable,
        )

        _table(srv)
        out = str(tmp_path / "snap")
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        assert len(plan.ranges) == 3

        # attempt 1: chunks (9,19] and (19,29] never finish — model
        # the crash by running with a truncated range list under the
        # SAME persisted plan
        partial = run_snapshot_resumable(
            spark, "127.0.0.1", srv.port, srv.user, srv.password,
            SnapshotPlan(plan.table, plan.columns, plan.pk,
                         plan.ranges[:1], plan.start_file,
                         plan.start_pos),
            out)
        assert partial.count() == 10
        # the persisted plan must pin the ORIGINAL full range list for
        # resume, so rewrite it the way a full first attempt would have
        import json
        import os

        with open(os.path.join(out, "plan.json")) as fh:
            saved = json.load(fh)
        saved["ranges"] = plan.ranges
        with open(os.path.join(out, "plan.json"), "w") as fh:
            json.dump(saved, fh)
        shutil.rmtree(os.path.join(out, "chunk_9_19"),
                      ignore_errors=True)  # no such dir; belt+braces

        selects_before = sum("where id >" in c
                             for c in srv.command_log)
        full = run_snapshot_resumable(
            spark, "127.0.0.1", srv.port, srv.user, srv.password,
            plan, out)
        assert full.count() == 30
        selects_after = sum("where id >" in c for c in srv.command_log)
        # exactly the two missing chunks were read, not three
        assert selects_after - selects_before == 2
        ids = sorted(int(r["id"]) for r in full.collect())
        assert ids == list(range(30))

    def test_resume_is_noop_when_complete(self, spark, srv, tmp_path):
        from ru_cdc_spark.sources.incremental_snapshot import (
            run_snapshot_resumable,
        )

        _table(srv)
        out = str(tmp_path / "snap")
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        first = run_snapshot_resumable(spark, "127.0.0.1", srv.port,
                                       srv.user, srv.password, plan,
                                       out)
        assert first.count() == 30
        n_sel = sum("where id >" in c for c in srv.command_log)
        again = run_snapshot_resumable(spark, "127.0.0.1", srv.port,
                                       srv.user, srv.password, plan,
                                       out)
        assert again.count() == 30
        assert sum("where id >" in c
                   for c in srv.command_log) == n_sel


class TestDistributed:
    def test_chunks_then_changes_merge_to_final_state(self, spark, srv):
        """Serial mini end-to-end (the registered query runs the
        parallel scripted version): snapshot, then post-snapshot DML,
        then the change stream — merged latest-wins equals the table."""
        t = _table(srv)
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        snap = snapshot_chunks(spark, "127.0.0.1", srv.port, srv.user,
                               srv.password, plan).localCheckpoint()
        assert snap.count() == 30
        t.update((7, 777, "post", Decimal("7.0000")))
        t.delete(8)
        t.insert((40, 400, "new", Decimal("4.0000")))
        changes = snapshot_changes(spark, "127.0.0.1", srv.port,
                                   srv.user, srv.password, plan)
        ops = {r["op"] for r in changes.collect()}
        assert ops == {"UPDATE", "DELETE", "INSERT"}

        from pyspark.sql import functions as F

        both = snap.withColumn("op", F.lit("SNAP")).unionByName(changes)
        row = F.struct(*[F.col(c) for c in both.columns])
        final = (both.groupBy(F.col("id").cast("long").alias("pk"))
                 .agg(F.max_by(row, F.col("seq")).alias("r"))
                 .where(F.col("r.op") != "DELETE"))
        got = {(r["pk"], r["r"]["val"], r["r"]["name"], r["r"]["amount"])
               for r in final.collect()}
        exp = {(int(r[0]), str(r[1]), r[2], str(r[3]))
               for r in t.scan()}
        assert got == exp


class TestStreamingBootstrap:
    """The production handoff: ONE streaming query bootstraps the
    table (chunked snapshot phase, chunk index in Spark's offset log)
    and flows straight into live binlog frames. Killing the query
    mid-snapshot and restarting resumes at the committed chunk."""

    @staticmethod
    def _end_offset(q):
        import ast
        import json as _json

        p = q.lastProgress
        if not p or not p["sources"]:
            return {}
        eo = p["sources"][0]["endOffset"]
        if isinstance(eo, str):
            try:
                eo = _json.loads(eo)
            except ValueError:
                eo = ast.literal_eval(eo)
        return eo or {}

    def _decode_all(self, spark, out):
        """Differential decode: walk every collected frame byte-for-
        byte (synthetic snapshot frames and real binlog frames share
        the wire format) and latest-wins merge driver-side."""
        from ru_cdc_spark.sources.binlog_wire import (
            decode_rows_event,
            decode_table_map,
        )

        rows = spark.read.parquet(out).collect()
        state: dict[int, tuple] = {}
        events = []
        for r in rows:
            b = bytes(r["frame"])
            off = 0
            while off < len(b):
                tm_size = int.from_bytes(b[off + 9:off + 13], "little")
                _tid, _sch, _tbl, specs = decode_table_map(
                    b[off:off + tm_size])
                off += tm_size
                ev_size = int.from_bytes(b[off + 9:off + 13], "little")
                etype, imgs = decode_rows_event(b[off:off + ev_size],
                                                specs)
                off += ev_size
                for img in imgs:
                    events.append((int(r["pos"]), etype, img))
        for _pos, etype, img in sorted(events, key=lambda e: e[0]):
            if etype == 31:
                before, after = img
                state[int(after[0])] = after
            elif etype == 32:
                state.pop(int(img[0]), None)
            else:
                state[int(img[0])] = img
        return state

    def test_bootstrap_then_stream_with_kill_restart(self, spark, srv,
                                                     tmp_path):
        from pyspark.sql import functions as F

        from ru_cdc_spark.sources.mysql_socket_source import (
            register_binlog_socket_source,
        )

        t = _table(srv, n=60)
        # scripted writer: each chunk SELECT fires one batch
        applied = {"k": 0}

        def on_select(_t, lo, hi):
            k = applied["k"]
            if k >= 6:
                return
            applied["k"] = k + 1
            t.update((10 * k + 3, 9000 + k, f"w_{k}",
                      Decimal(k).scaleb(-4)))
            t.delete(10 * k + 6)
            t.insert((100 + k, k, f"ins_{k}", Decimal(k + 1).scaleb(-4)))

        srv.on_select = on_select
        register_binlog_socket_source(spark)
        out = str(tmp_path / "out")
        ck = str(tmp_path / "ck")

        def start_query():
            stream = (spark.readStream.format("binlog_socket")
                      .option("host", "127.0.0.1")
                      .option("port", srv.port)
                      .option("user", srv.user)
                      .option("password", srv.password)
                      .option("bootstrap_table", "snaptab")
                      .option("bootstrap_chunk", 10)
                      .option("chunks_per_trigger", 1)
                      .option("events_per_batch", 400)
                      .option("position_file",
                              str(tmp_path / "meta.json"))
                      .load())
            return (stream.writeStream.format("parquet")
                    .option("path", out)
                    .option("checkpointLocation", ck)
                    .trigger(processingTime="0 seconds").start())

        import time as _time

        q = start_query()
        # kill mid-snapshot: after at least 2 chunk batches committed
        deadline = _time.time() + 360
        while int(self._end_offset(q).get("snap") or 0) < 2:
            assert _time.time() < deadline, "snapshot never started"
            _time.sleep(0.05)
        q.stop()
        snap_at_kill = int(self._end_offset(q).get("snap") or 0)
        assert snap_at_kill < 6, "kill landed after the phase ended"

        # restart: must resume the chunk index from Spark's offset log
        # and drain the snapshot + the mutation frames
        q = start_query()
        deadline = _time.time() + 360
        while True:
            eo = self._end_offset(q)
            p = q.lastProgress
            if eo and "snap" not in eo and p \
                    and p["numInputRows"] == 0 \
                    and int(eo.get("pos") or 0) >= srv.binlog.end_pos:
                break
            assert _time.time() < deadline, "drain stalled"
            _time.sleep(0.05)
        q.stop()

        state = self._decode_all(spark, out)
        expected = {int(r[0]): tuple(r) for r in t.scan()}
        assert state.keys() == expected.keys()
        for pk, img in expected.items():
            assert state[pk] == img, f"pk {pk}: {state[pk]} != {img}"
        # all six scripted batches fired (enough SELECTs ran)
        assert applied["k"] == 6


class TestRandomizedDifferential:
    def test_random_scripts_converge_to_table_state(self):
        """Seeded fuzz over the algorithm core (no Spark jobs — pure
        sockets + python merge): random base sizes, chunk sizes, and
        per-chunk mutation batches that may touch the SAME pk several
        times across batches (beyond what the graded query's
        closed-form oracle can express), deletes-then-reinserts
        included. For every seed, the merged snapshot+changes state
        must equal the live table's final rows — the DBLog convergence
        claim under arbitrary interleavings."""
        import random

        from ru_cdc_spark.sources.binlog_wire import (
            decode_rows_event,
            decode_table_map,
        )
        from ru_cdc_spark.sources.mysql_socket_source import (
            _dump_events,
        )

        for seed in range(10):
            rng = random.Random(seed)
            vb = VirtualBinlog()
            vb.append(encode_format_description(CHECKSUM_NONE))
            srv = MySQLFixtureServer(binlog=vb).start()
            try:
                n = rng.randint(20, 60)
                t = srv.add_live_table("snaptab", COLS)
                t.insert(*[_row(i) for i in range(n)])
                next_id = [1000]

                def mutate(_t, lo, hi, t=t, rng=rng, n=n,
                           next_id=next_id):
                    for _ in range(rng.randint(0, 4)):
                        op = rng.random()
                        live = sorted(t.rows)
                        if op < 0.45 and live:
                            pk = rng.choice(live)
                            t.update((pk, rng.randint(0, 9999),
                                      f"u{pk}_{rng.randint(0, 99)}",
                                      Decimal(rng.randint(0, 10**6))
                                      .scaleb(-4)))
                        elif op < 0.7 and live:
                            t.delete(rng.choice(live))
                        else:
                            pk = (next_id[0] if rng.random() < 0.7
                                  else rng.randint(0, n - 1))
                            if pk == next_id[0]:
                                next_id[0] += 1
                            if pk not in t.rows:
                                t.insert((pk, rng.randint(0, 9999),
                                          f"i{pk}",
                                          Decimal(pk).scaleb(-4)))

                srv.on_select = mutate
                chunk = rng.randint(7, 15)
                plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                                     srv.password, "snaptab",
                                     chunk_size=chunk)
                snap: dict[int, tuple] = {}
                for lo, hi in plan.ranges:
                    rows, pos_l = read_chunk("127.0.0.1", srv.port,
                                             srv.user, srv.password,
                                             plan, lo, hi)
                    for r in rows:
                        snap[int(r[0])] = (pos_l, "SNAP", tuple(r))
                srv.on_select = None

                # change stream from snapshot start to the final tip
                merged = dict(snap)
                events = _dump_events("127.0.0.1", srv.port, srv.user,
                                      srv.password, plan.start_file,
                                      plan.start_pos, 1 << 60)
                from ru_cdc_spark.sources.incremental_snapshot import (
                    wire_seq,
                )

                specs_by_tid: dict[int, list] = {}
                for raw_pos, ev in events:
                    pos = wire_seq(plan.start_file, raw_pos)
                    if ev[4] == 19:
                        tid, _s, name, specs = decode_table_map(ev)
                        specs_by_tid[tid] = specs
                        continue
                    if ev[4] not in (30, 31, 32):
                        continue
                    tid = int.from_bytes(ev[19:25], "little")
                    etype, rows = decode_rows_event(
                        ev, specs_by_tid[tid])
                    for r in rows:
                        img = r[1] if etype == 31 else r
                        pk = int(img[0])
                        prev = merged.get(pk)
                        if prev is not None and prev[0] >= pos:
                            continue  # snapshot row is newer
                        if etype == 32:
                            merged[pk] = (pos, "DELETE", None)
                        else:
                            merged[pk] = (
                                pos, "ROW",
                                tuple("" if v is None else str(v)
                                      for v in img))

                got = {pk: v[2] for pk, v in merged.items()
                       if v[1] != "DELETE"}
                exp = {int(r[0]): tuple(str(v) for v in r)
                       for r in t.scan()}
                assert got.keys() == exp.keys(), \
                    f"seed {seed}: keys {sorted(got.keys() ^ exp.keys())}"
                for pk in exp:
                    g = tuple(str(x) for x in got[pk])
                    assert g == exp[pk], f"seed {seed} pk {pk}"
            finally:
                srv.stop()


class TestSnapshotOffsetDiscipline:
    def test_crossing_window_replays_unserved_chunks(self, srv,
                                                     tmp_path):
        """Crash-window contract: the advisory chunk index runs ahead
        in latestOffset (liveness — Spark only calls commit(N) while
        constructing batch N+1, so commit-gated progress deadlocks),
        and SAFETY comes from partitions(): a restarted query whose
        committed start is still mid-phase while the end offset has
        already crossed into the stream gets every unserved chunk
        replayed alongside the stream slice."""
        from ru_cdc_spark.sources.mysql_socket_source import (
            BinlogSocketStreamReader,
            _SlicePartition,
            _SnapChunkPartition,
        )

        _table(srv, n=30)
        reader = BinlogSocketStreamReader({
            "host": "127.0.0.1", "port": str(srv.port),
            "user": srv.user, "password": srv.password,
            "bootstrap_table": "snaptab", "bootstrap_chunk": "10",
            "chunks_per_trigger": "2",
            "position_file": str(tmp_path / "meta.json"),
        })
        o0 = reader.initialOffset()
        assert o0["snap"] == 0
        o1 = reader.latestOffset()
        assert o1["snap"] == 2
        o2 = reader.latestOffset()
        assert o2["snap"] == 3  # 3 chunks of 10 over 30 rows
        o3 = reader.latestOffset()
        assert "snap" not in o3  # phase complete -> stream offsets
        assert o3["pos"] >= o0["pos"]
        # snapshot-phase windows replay the exact chunk slices
        parts = reader.partitions(o1, o2)
        assert [type(p).__name__ for p in parts] == \
            ["_SnapChunkPartition"]
        assert (parts[0].lo, parts[0].hi) == (19, 29)

        # crossing-window recovery: a replayed window from mid-phase
        # into the stream serves the REMAINING chunks plus the slice
        # (end position grown past start, as live writes would)
        o3 = {"file": o3["file"], "pos": o3["pos"] + 100}
        parts = reader.partitions(
            {"file": o0["file"], "pos": o0["pos"], "snap": 1}, o3)
        kinds = [type(p).__name__ for p in parts]
        assert kinds.count("_SnapChunkPartition") == 2
        assert kinds.count("_SlicePartition") == 1
        chunk_ranges = sorted((p.lo, p.hi) for p in parts
                              if isinstance(p, _SnapChunkPartition))
        assert chunk_ranges == [(9, 19), (19, 29)]
        sl = next(p for p in parts if isinstance(p, _SlicePartition))
        assert sl.lo == o0["pos"] and sl.hi == o3["pos"]

        # commit() keeps the advisory monotonic when Spark does call
        # it (it never regresses the announced index)
        reader.commit({"file": o0["file"], "pos": o0["pos"],
                       "snap": 1})
        assert int(reader._load_state()["snap_done"]) == 3


class TestMultiTableBootstrap:
    def test_two_tables_one_stream(self, spark, srv, tmp_path):
        """bootstrap_table accepts a comma list: both tables chunk-
        snapshot inside one streaming query (flat chunk index across
        tables), then the shared change stream carries both tables'
        live writes; per-table decode+merge matches each live table."""
        from pyspark.sql import functions as F

        from ru_cdc_spark.sources.incremental_snapshot import (
            decode_table_frames,
        )
        from ru_cdc_spark.sources.mysql_socket_source import (
            register_binlog_socket_source,
        )

        ta = _table(srv, n=25)  # registers "snaptab"
        tb = srv.add_live_table("othertab", COLS)
        tb.insert(*[(i, i, f"b_{i}", Decimal(i).scaleb(-4))
                    for i in range(15)])
        hits = {"n": 0}

        def on_select(table, lo, hi):
            hits["n"] += 1
            ta.update((7, 7777, "wa", Decimal("7.0000")))
            tb.delete(3)

        srv.on_select = on_select
        register_binlog_socket_source(spark)
        out = str(tmp_path / "out")

        stream = (spark.readStream.format("binlog_socket")
                  .option("host", "127.0.0.1")
                  .option("port", srv.port)
                  .option("user", srv.user)
                  .option("password", srv.password)
                  .option("bootstrap_table", "snaptab, othertab")
                  .option("bootstrap_chunk", 10)
                  .option("chunks_per_trigger", 2)
                  .option("events_per_batch", 500)
                  .option("position_file", str(tmp_path / "meta.json"))
                  .load())
        q = (stream.writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(processingTime="0 seconds").start())
        import time as _time

        deadline = _time.time() + 360
        while True:
            eo = TestStreamingBootstrap._end_offset(q)
            p = q.lastProgress
            if eo and "snap" not in eo and p \
                    and p["numInputRows"] == 0 \
                    and int(eo.get("pos") or 0) >= srv.binlog.end_pos:
                break
            assert _time.time() < deadline, "drain stalled"
            _time.sleep(0.05)
        q.stop()

        frames = spark.read.schema("pos long, frame binary") \
            .parquet(out)
        for table, live in (("snaptab", ta), ("othertab", tb)):
            decoded = decode_table_frames(frames, table,
                                          ["id", "val", "name",
                                           "amount"])
            row = F.struct(*[F.col(c) for c in decoded.columns])
            got = {(r["pk"], r["r"]["val"], r["r"]["name"],
                    r["r"]["amount"])
                   for r in (decoded
                             .groupBy(F.col("id").cast("long")
                                      .alias("pk"))
                             .agg(F.max_by(row, F.col("seq"))
                                  .alias("r"))
                             .where(F.col("r.op") != "DELETE")
                             .collect())}
            exp = {(int(r[0]), str(r[1]), r[2], str(r[3]))
                   for r in live.scan()}
            assert got == exp, table
        # 3 + 2 chunks -> 5 SELECTs, each fired the script once
        assert hits["n"] == 5


class TestKeysetPlanning:
    def test_sparse_pk_space_gets_equal_count_chunks(self, srv):
        """Snowflake-style sparse pks: equal-WIDTH ranges degenerate
        (most are empty, one holds everything); keyset bounds every
        chunk at chunk_size rows regardless of density."""
        t = srv.add_live_table("snaptab", COLS)
        ids = ([i for i in range(10)]
               + [1_000_000 + 7 * i for i in range(30)]
               + [2_000_000_000 + i for i in range(20)])
        t.insert(*[(i, (i * 7) % 10000, f"n_{i % 97}",
                    Decimal((i * 11) % 10**7).scaleb(-4))
                   for i in ids])
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10,
                             keyset=True)
        assert len(plan.ranges) == 6  # 60 rows / 10 per chunk
        # contiguous cover of the pk space, ending at max
        assert plan.ranges[0][0] == ids[0] - 1
        for (l0, h0), (l1, _h1) in zip(plan.ranges, plan.ranges[1:]):
            assert l1 == h0
        assert plan.ranges[-1][1] == max(ids)
        # every chunk holds exactly chunk_size rows
        for lo, hi in plan.ranges:
            rows, _ = read_chunk("127.0.0.1", srv.port, srv.user,
                                 srv.password, plan, lo, hi)
            assert len(rows) == 10

    def test_keyset_equals_width_on_dense_pks(self, srv):
        _table(srv)  # ids 0..29 dense
        kw = plan_snapshot("127.0.0.1", srv.port, srv.user,
                           srv.password, "snaptab", chunk_size=10,
                           keyset=True)
        eq = plan_snapshot("127.0.0.1", srv.port, srv.user,
                           srv.password, "snaptab", chunk_size=10)
        assert kw.ranges == eq.ranges

    def test_streaming_bootstrap_keyset_option(self, spark, srv,
                                               tmp_path):
        """End-to-end with bootstrap_keyset=true over a sparse table:
        decoded output equals the table."""
        from pyspark.sql import functions as F

        from ru_cdc_spark.sources.incremental_snapshot import (
            decode_table_frames,
        )
        from ru_cdc_spark.sources.mysql_socket_source import (
            register_binlog_socket_source,
        )

        t = srv.add_live_table("snaptab", COLS)
        ids = [5 * i * i for i in range(1, 41)]  # quadratic gaps
        t.insert(*[_row(i) for i in ids])
        register_binlog_socket_source(spark)
        out = str(tmp_path / "out")
        stream = (spark.readStream.format("binlog_socket")
                  .option("host", "127.0.0.1")
                  .option("port", srv.port)
                  .option("user", srv.user)
                  .option("password", srv.password)
                  .option("bootstrap_table", "snaptab")
                  .option("bootstrap_chunk", 8)
                  .option("bootstrap_keyset", "true")
                  .option("chunks_per_trigger", 3)
                  .option("position_file", str(tmp_path / "meta.json"))
                  .load())
        q = (stream.writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(processingTime="0 seconds").start())
        import time as _time

        deadline = _time.time() + 360
        while True:
            eo = TestStreamingBootstrap._end_offset(q)
            p_ = q.lastProgress
            if eo and "snap" not in eo and p_ \
                    and p_["numInputRows"] == 0:
                break
            assert _time.time() < deadline, "drain stalled"
            _time.sleep(0.05)
        q.stop()

        decoded = decode_table_frames(
            spark.read.schema("pos long, frame binary").parquet(out),
            "snaptab", ["id", "val", "name", "amount"])
        got = sorted(int(r["id"]) for r in decoded.collect())
        assert got == sorted(ids)


class TestCli:
    def test_snapshot_subcommand(self, spark, srv, tmp_path, capsys):
        """python -m ru_cdc_spark snapshot — CLI parity for the new
        capability; re-invocation is a resume (no re-reads)."""
        from ru_cdc_spark.__main__ import main

        _table(srv)
        out = str(tmp_path / "snapcli")
        rc = main(["snapshot", "127.0.0.1", str(srv.port), "snaptab",
                   out, "--user", srv.user, "--password", srv.password,
                   "--chunk", "10"])
        assert rc == 0
        msg = capsys.readouterr().out
        assert "30 rows across 3 chunks" in msg
        n_sel = sum("where id >" in c for c in srv.command_log)
        rc = main(["snapshot", "127.0.0.1", str(srv.port), "snaptab",
                   out, "--user", srv.user, "--password", srv.password,
                   "--chunk", "10"])
        assert rc == 0
        assert sum("where id >" in c
                   for c in srv.command_log) == n_sel  # resume: no-op


class TestBinaryProtocolChunks:
    def test_prepare_execute_roundtrip(self, srv):
        """Full prepared-statement exchange against the live table:
        COM_STMT_PREPARE metadata, param binding (LONGLONG + NULL
        bitmap), binary resultset rows (offset-2 NULL bitmap, typed
        values incl. lenenc DECIMAL), COM_STMT_CLOSE."""
        from ru_cdc_spark.sources.mysql_client import MySQLConnection

        t = _table(srv, n=20)
        t.update((5, None, None, None))  # NULLs ride the row bitmap
        with MySQLConnection.connect("127.0.0.1", srv.port, srv.user,
                                     srv.password) as conn:
            stmt = conn.stmt_prepare(
                "select id, val, name, amount from snaptab "
                "where id > ? and id <= ? order by id")
            assert stmt.n_params == 2
            assert [c.name for c in stmt.col_defs] == \
                ["id", "val", "name", "amount"]
            assert [c.ty for c in stmt.col_defs] == \
                [0x08, 0x03, 0xFD, 0xF6]
            rows = conn.stmt_execute(stmt, (3, 6))
            assert [r[0] for r in rows] == [4, 5, 6]  # typed ints
            assert rows[0] == [4, 40, "n_4", "0.0044"]
            assert rows[1] == [5, None, None, None]
            # rebind and re-execute the SAME statement
            rows = conn.stmt_execute(stmt, (17, 19))
            assert [r[0] for r in rows] == [18, 19]
            conn.stmt_close(stmt)
            # the connection still serves normal queries afterwards
            assert conn.query("select min(id), max(id) from snaptab"
                              ).rows == [["0", "19"]]

    def test_chunk_read_binary_equals_text(self, srv):
        """The snapshot chunk read through the binary protocol returns
        byte-identical text rows to the text protocol — including the
        watermark dedup behavior (hook fires on the substituted
        statement exactly like on a text SELECT)."""
        t = _table(srv)
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        text_rows, _ = read_chunk("127.0.0.1", srv.port, srv.user,
                                  srv.password, plan, 9, 19)
        bin_rows, _ = read_chunk("127.0.0.1", srv.port, srv.user,
                                 srv.password, plan, 9, 19,
                                 binary_protocol=True)
        assert bin_rows == text_rows
        # dedup parity: a hook mutation inside the window drops the pk
        # on the binary path too
        srv.on_select = lambda _t, lo, hi: t.update(
            (12, 1, "raced", Decimal("1.0000")))
        got, _ = read_chunk("127.0.0.1", srv.port, srv.user,
                            srv.password, plan, 9, 19,
                            binary_protocol=True)
        assert [r[0] for r in got] == [str(i) for i in range(10, 20)
                                       if i != 12]


class TestReviewRegressions:
    """Latent-bug regressions from the round-7 self-review: CRC32
    watermark windows, rotation between watermarks, non-first pk,
    partial-update (type 39) events in the window."""

    def _crc_srv(self):
        from ru_cdc_spark.sources.binlog_wire import (
            CHECKSUM_CRC32,
            encode_format_description,
        )

        vb = VirtualBinlog(crc32=True)
        vb.append(encode_format_description(CHECKSUM_CRC32))
        return MySQLFixtureServer(binlog=vb).start()

    def test_crc32_window_dedup(self):
        """binlog_checksum=CRC32 (the MySQL default): the window dump
        delivers raw trailered events; dedup must strip per the FDE —
        parsing a CRC trailer as row payload would add a garbage pk
        and silently drop an innocent snapshot row."""
        srv = self._crc_srv()
        try:
            t = srv.add_live_table("snaptab", COLS)
            t.insert(*[_row(i) for i in range(20)])
            srv.on_select = lambda _t, lo, hi: t.update(
                (7, 777, "raced", Decimal("7.0000")))
            plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                                 srv.password, "snaptab",
                                 chunk_size=10)
            rows, _ = read_chunk("127.0.0.1", srv.port, srv.user,
                                 srv.password, plan, -1, 9)
            assert [r[0] for r in rows] == [str(i) for i in range(10)
                                            if i != 7]
        finally:
            srv.stop()

    def test_rotation_between_watermarks_still_dedups(self, srv):
        """FLUSH LOGS between the two SHOW MASTER STATUS reads: the
        watermark window spans two files; skipping it (the old
        pos_h > pos_l comparison was file-blind) would let the raced
        stale snapshot row win the merge permanently."""
        from ru_cdc_spark.sources.binlog_wire import (
            CHECKSUM_NONE,
            encode_format_description,
        )

        t = _table(srv)

        def rotate_then_write(_t, lo, hi):
            vb2 = VirtualBinlog("binlog.000002")
            vb2.append(encode_format_description(CHECKSUM_NONE))
            with srv.mutation():
                srv.binlogs.append(vb2)
                srv.binlog = vb2
            t.update((4, 444, "raced-after-rotate",
                      Decimal("4.0000")))

        srv.on_select = rotate_then_write
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        rows, seq = read_chunk("127.0.0.1", srv.port, srv.user,
                               srv.password, plan, -1, 9)
        assert [r[0] for r in rows] == [str(i) for i in range(10)
                                        if i != 4]
        # the chunk's version coordinate sorts BELOW any new-file event
        from ru_cdc_spark.sources.incremental_snapshot import wire_seq

        assert seq < wire_seq("binlog.000002", 4)

    def test_pk_not_first_column(self, srv):
        """Tables whose PRIMARY KEY is not the first column: the
        window dedup must key on the pk's DESC ordinal, not image
        column 0."""
        cols = [
            ("val", ColSpec(T_LONG)),
            ("id", ColSpec(T_LONGLONG)),
            ("name", ColSpec(T_VARCHAR, (300,))),
        ]
        t = srv.add_live_table("snaptab", cols)
        # catalog marks column 0 PRI by default — override to 'id'
        srv.catalog["snaptab"] = [("val", "int", ""),
                                  ("id", "bigint", "PRI"),
                                  ("name", "varchar(300)", "")]
        srv.catalog["app.snaptab"] = srv.catalog["snaptab"]
        # pk is the SECOND tuple slot now; LiveTable keys on slot 0,
        # so feed rows keyed by val==id to keep the fixture consistent
        t.insert(*[(i, i, f"n_{i}") for i in range(20)])
        srv.on_select = lambda _t, lo, hi: t.update((6, 6, "raced"))
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        assert plan.pk == "id"
        rows, _ = read_chunk("127.0.0.1", srv.port, srv.user,
                             srv.password, plan, -1, 9)
        ids = [r[plan.columns.index("id")] for r in rows]
        assert ids == [str(i) for i in range(10) if i != 6]

    def test_partial_update_event_in_window_dedups(self, srv):
        """A PARTIAL_UPDATE_ROWS (type 39) event inside the watermark
        window marks its pk touched — partial-JSON tables race
        snapshots too."""
        from ru_cdc_spark.sources.binlog_frames import JSON_SPECS
        from ru_cdc_spark.sources.binlog_wire import (
            encode_partial_update_rows_event,
            encode_table_map,
        )
        from ru_cdc_spark.sources.incremental_snapshot import (
            _window_touched_pks,
        )

        t = _table(srv)

        def emit_partial(_t, lo, hi):
            tm = encode_table_map(57, "app", "snaptab", JSON_SPECS)
            ev = encode_partial_update_rows_event(
                57, JSON_SPECS,
                [((3, '{"a": 1}'), (3, True),
                  {1: [(0, "$.a", 2)]})])
            with srv.mutation():
                srv.binlog.append(tm)
                srv.binlog.append(ev)

        srv.on_select = emit_partial
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        rows, _ = read_chunk("127.0.0.1", srv.port, srv.user,
                             srv.password, plan, -1, 9)
        assert [r[0] for r in rows] == [str(i) for i in range(10)
                                        if i != 3]


class TestBinaryProtocolProperty:
    def test_binary_row_roundtrip_fuzz(self):
        """Seeded fuzz over the Binary Protocol Resultset Row codec:
        random widths, type mixes, and NULL patterns (the offset-2
        bitmap's classic off-by-one habitat) must round-trip."""
        import random

        from ru_cdc_spark.sources.mysql_client import (
            TYPE_DOUBLE,
            TYPE_LONG,
            TYPE_LONGLONG,
            TYPE_NEWDECIMAL,
            TYPE_TINY,
            TYPE_VAR_STRING,
            decode_binary_row,
            encode_binary_row,
        )

        gens = {
            TYPE_TINY: lambda r: r.randint(-128, 127),
            TYPE_LONG: lambda r: r.randint(-2**31, 2**31 - 1),
            TYPE_LONGLONG: lambda r: r.randint(-2**63, 2**63 - 1),
            TYPE_DOUBLE: lambda r: r.random() * 10**r.randint(-5, 5),
            TYPE_VAR_STRING: lambda r: "".join(
                chr(r.randint(32, 0x2FA0)) for _ in range(r.randint(0, 40))),
            TYPE_NEWDECIMAL: lambda r: f"{r.randint(-10**8, 10**8)}.{r.randint(0, 9999):04d}",
        }
        for seed in range(200):
            rng = random.Random(seed)
            n = rng.randint(1, 12)
            types = [rng.choice(list(gens)) for _ in range(n)]
            vals = [None if rng.random() < 0.25 else gens[t](rng)
                    for t in types]
            got = decode_binary_row(encode_binary_row(vals, types),
                                    types)
            exp = [None if v is None
                   else (str(v) if t in (TYPE_VAR_STRING,
                                         TYPE_NEWDECIMAL) else v)
                   for v, t in zip(vals, types)]
            assert got == exp, f"seed {seed}"

    def test_execute_unknown_statement_errors(self, srv):
        from ru_cdc_spark.sources.mysql_client import (
            MySQLConnection,
            MySQLError,
            PreparedStatement,
        )

        _table(srv)
        with MySQLConnection.connect("127.0.0.1", srv.port, srv.user,
                                     srv.password) as conn:
            ghost = PreparedStatement(stmt_id=999, n_params=0,
                                      col_defs=[])
            with pytest.raises(MySQLError) as exc:
                conn.stmt_execute(ghost)
            assert exc.value.code == 1243

    def test_execute_wrong_param_count_raises_client_side(self, srv):
        from ru_cdc_spark.sources.mysql_client import MySQLConnection

        _table(srv)
        with MySQLConnection.connect("127.0.0.1", srv.port, srv.user,
                                     srv.password) as conn:
            stmt = conn.stmt_prepare(
                "select id from snaptab where id > ? and id <= ? "
                "order by id")
            with pytest.raises(ValueError, match="takes 2 params"):
                conn.stmt_execute(stmt, (1,))

    def test_wire_seq_non_numeric_suffix_passthrough(self):
        from ru_cdc_spark.sources.incremental_snapshot import wire_seq

        assert wire_seq("binlog.000007", 400) == (7 << 33) + 400
        assert wire_seq("relaylog", 400) == 400  # no suffix: raw pos
        assert wire_seq("binlog.000002", 4) > \
            wire_seq("binlog.000001", 1 << 32 - 1)


class TestLiveTableConcurrency:
    def test_watermarks_bracket_racing_writers(self, srv):
        """Stress the fixture's locking: four writer threads hammer
        DML while readers take watermark pairs and chunk SELECTs.
        Invariants: every reported master position is an event
        boundary (never between a TABLE_MAP and its ROWS event), and
        any row value a SELECT observes that differs from the base
        was written by an event INSIDE that SELECT's watermark pair —
        the property every DBLog correctness argument rests on."""
        import threading

        from ru_cdc_spark.sources.mysql_client import MySQLConnection

        t = _table(srv, n=40)
        stop = threading.Event()

        def writer(wid: int) -> None:
            k = 0
            while not stop.is_set():
                pk = (wid * 10 + k) % 40
                t.update((pk, 100000 + wid * 1000 + k,
                          f"w{wid}_{k}", Decimal(k % 100).scaleb(-4)))
                k += 1

        threads = [threading.Thread(target=writer, args=(w,),
                                    daemon=True) for w in range(4)]
        for th in threads:
            th.start()
        try:
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         srv.user,
                                         srv.password) as conn:
                for _ in range(30):
                    _, p1 = conn.show_master_status()
                    rs = conn.query(
                        "select id, val, name, amount from snaptab "
                        "where id > -1 and id <= 39 order by id")
                    _, p2 = conn.show_master_status()
                    assert p2 >= p1
                    # positions land on event boundaries only
                    bounds = {4} | {e for _s, e, _ev
                                    in srv.binlog.events}
                    assert p1 in bounds and p2 in bounds
                    assert len(rs.rows) == 40  # updates never tear rows
        finally:
            stop.set()
            for th in threads:
                th.join(timeout=5)

        # post-stress: a full snapshot+changes merge still converges
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=7)
        total = []
        for lo, hi in plan.ranges:
            rows, _ = read_chunk("127.0.0.1", srv.port, srv.user,
                                 srv.password, plan, lo, hi)
            total += rows
        assert len(total) == 40  # quiet table: nothing deduped
        exp = {int(r[0]): tuple(str(v) for v in r)
               for r in t.scan()}
        got = {int(r[0]): tuple(r) for r in total}
        assert got == exp


class TestRotationChainFixes:
    """Advisor round-8 fixes: windows and change streams must walk the
    WHOLE binlog file chain, not just its endpoints."""

    def _rotate(self, srv, name):
        vb = VirtualBinlog(name)
        vb.append(encode_format_description(CHECKSUM_NONE))
        with srv.mutation():
            srv.binlogs.append(vb)
            srv.binlog = vb

    def test_multi_rotation_window_scans_intermediate_files(self, srv):
        """TWO rotations land inside one watermark window and the raced
        update is in the MIDDLE file: dumping only file_l's tail and
        file_h's prefix (the old endpoint-only branch) never sees it,
        so the stale snapshot row would survive dedup and win the merge
        permanently."""
        t = _table(srv)

        def two_rotations(_t, lo, hi):
            self._rotate(srv, "binlog.000002")
            t.update((4, 444, "raced-mid-chain", Decimal("4.0000")))
            self._rotate(srv, "binlog.000003")

        srv.on_select = two_rotations
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        rows, seq = read_chunk("127.0.0.1", srv.port, srv.user,
                               srv.password, plan, -1, 9)
        assert [r[0] for r in rows] == [str(i) for i in range(10)
                                        if i != 4]

    def test_snapshot_changes_walks_chain_from_start_file(self, spark,
                                                          srv):
        """Rotations AFTER plan_snapshot: the change-stream leg must
        deliver the start file's tail, every intermediate file, and the
        tip — laying out only the tip (the old behavior) silently drops
        the earlier files' events and clips the tip by a position from
        a different file."""
        t = _table(srv)
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        t.update((7, 777, "tail-of-start-file", Decimal("7.0000")))
        self._rotate(srv, "binlog.000002")
        t.delete(8)                      # intermediate file event
        self._rotate(srv, "binlog.000003")
        t.insert((40, 400, "tip", Decimal("4.0000")))

        changes = snapshot_changes(spark, "127.0.0.1", srv.port,
                                   srv.user, srv.password, plan)
        rows = changes.collect()
        by_op = {r["op"]: r for r in rows}
        assert set(by_op) == {"UPDATE", "DELETE", "INSERT"}
        assert by_op["UPDATE"]["name"] == "tail-of-start-file"
        assert by_op["DELETE"]["id"] == "8"
        assert by_op["INSERT"]["id"] == "40"
        # cross-file seqs stay totally ordered (file-biased wire_seq)
        assert by_op["UPDATE"]["seq"] < by_op["DELETE"]["seq"] \
            < by_op["INSERT"]["seq"]

    def test_snapshot_changes_clips_only_inside_start_file(self, spark,
                                                           srv):
        """Events BEFORE the snapshot-start position in the start file
        stay excluded (they're already in the chunk rows), while a
        same-numbered position in a LATER file is delivered."""
        t = _table(srv)
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        self._rotate(srv, "binlog.000002")
        # lands near the new file's START: pos < plan.start_pos, which
        # a file-blind clip would wrongly exclude
        t.update((3, 333, "early-pos-later-file", Decimal("3.0000")))
        changes = snapshot_changes(spark, "127.0.0.1", srv.port,
                                   srv.user, srv.password, plan)
        rows = changes.collect()
        assert [r["name"] for r in rows] == ["early-pos-later-file"]

    def test_snap_offset_without_bootstrap_option_fails_loudly(self,
                                                               srv,
                                                               tmp_path):
        """A checkpoint whose offsets carry snapshot state replayed
        into a reader rebuilt WITHOUT bootstrap_table must raise the
        actual cause, not an unpack TypeError inside planning."""
        from ru_cdc_spark.sources.mysql_socket_source import (
            BinlogSocketStreamReader,
        )

        _table(srv)
        reader = BinlogSocketStreamReader({
            "host": "127.0.0.1", "port": str(srv.port),
            "user": srv.user, "password": srv.password,
            "position_file": str(tmp_path / "meta.json"),
        })
        o0 = reader.initialOffset()
        start = dict(o0, snap=0)
        end = dict(o0, snap=2)
        with pytest.raises(ValueError, match="bootstrap_table"):
            reader.partitions(start, end)


class TestObjectStoreSafeCommits:
    """Round-8 task: chunk commits must survive an object store with
    NO atomic rename (create-only puts) and DELAYED listings — the
    100 TB substrate. The runner's manifest protocol (staged unique
    file + put-if-absent commit marker) replaces the old directory
    rename."""

    def test_runner_never_renames(self, spark, srv, tmp_path,
                                  monkeypatch):
        """os.rename/os.replace are forbidden on object stores: fail
        the whole run if the runner (driver side) touches either."""
        import os as _os

        from ru_cdc_spark.sources.incremental_snapshot import (
            run_snapshot_resumable,
        )

        def forbid(*a, **k):
            raise AssertionError("rename/replace used in runner")

        monkeypatch.setattr(_os, "rename", forbid)
        monkeypatch.setattr(_os, "replace", forbid)
        _table(srv)
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        out = run_snapshot_resumable(spark, "127.0.0.1", srv.port,
                                     srv.user, srv.password, plan,
                                     str(tmp_path / "snap"))
        assert out.count() == 30

    def test_no_hardlink_fallback_exactly_one_winner(self, tmp_path,
                                                     monkeypatch):
        """Force the no-hardlink OSError fallback (mkdir-claim
        protocol): concurrent publishers get EXACTLY one True, a
        waiter never renames over a live claim holder's publish (r9
        advice: the old 500ms wait-then-rename let both callers return
        True and silently replace a published marker), and the claim
        dir never outlives the publish."""
        import os as _os
        import threading

        from ru_cdc_spark.sources.incremental_snapshot import ChunkStore

        def no_link(*a, **k):
            raise OSError(95, "hardlinks unsupported")

        monkeypatch.setattr(_os, "link", no_link)
        store = ChunkStore(str(tmp_path / "store"))

        # 8 concurrent publishers, one name, distinct payloads
        results: list[tuple[int, bool]] = []
        barrier = threading.Barrier(8)

        def publish(k: int) -> None:
            barrier.wait()
            results.append((k, store.put_if_absent(
                "commit-x.json", b"payload-%d" % k)))

        ts = [threading.Thread(target=publish, args=(k,))
              for k in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(30)
        winners = [k for k, won in results if won]
        assert len(results) == 8 and len(winners) == 1
        # the published bytes are the winner's, intact
        assert store.read("commit-x.json") == b"payload-%d" % winners[0]
        # no claim stub, no staged leftovers
        leftovers = [f for f in _os.listdir(store.root)
                     if f != "commit-x.json"]
        assert leftovers == []

    def test_no_hardlink_fallback_waiter_never_usurps_live_holder(
            self, tmp_path, monkeypatch):
        """While the claim dir is held and within the grace period, a
        waiter must NOT publish; once the holder publishes, the waiter
        returns False and the holder's bytes stand."""
        import os as _os
        import threading
        import time as _t

        from ru_cdc_spark.sources.incremental_snapshot import ChunkStore

        monkeypatch.setattr(
            _os, "link",
            lambda *a, **k: (_ for _ in ()).throw(OSError(95, "no")))
        store = ChunkStore(str(tmp_path / "store"))
        final = _os.path.join(store.root, "m.json")
        _os.makedirs(store.root, exist_ok=True)
        _os.mkdir(final + ".claim")  # we are the (slow) holder

        got: list[bool] = []
        w = threading.Thread(
            target=lambda: got.append(
                store.put_if_absent("m.json", b"waiter")))
        w.start()
        _t.sleep(1.0)  # well past the old 500ms usurp window
        assert not got and not _os.path.exists(final)
        # holder publishes (complete bytes) then releases its claim
        with open(final + ".tmp", "wb") as fh:
            fh.write(b"holder")
        _os.rename(final + ".tmp", final)
        _os.rmdir(final + ".claim")
        w.join(30)
        assert got == [False]
        assert store.read("m.json") == b"holder"

    def test_no_hardlink_fallback_takeover_after_crashed_holder(
            self, tmp_path, monkeypatch):
        """A claim dir whose holder crashed (no final ever appears) is
        taken over after the grace period — the chunk still publishes,
        and the stale claim is cleaned up."""
        import os as _os

        from ru_cdc_spark.sources.incremental_snapshot import ChunkStore

        monkeypatch.setattr(
            _os, "link",
            lambda *a, **k: (_ for _ in ()).throw(OSError(95, "no")))
        store = ChunkStore(str(tmp_path / "store"),
                           claim_takeover_grace_s=0.3)
        final = _os.path.join(store.root, "m.json")
        _os.makedirs(store.root, exist_ok=True)
        _os.mkdir(final + ".claim")  # crashed holder's stub
        assert store.put_if_absent("m.json", b"recovered") is True
        assert store.read("m.json") == b"recovered"
        assert not _os.path.exists(final + ".claim")

    def test_killed_then_resumed_on_delayed_listing_store(self, spark,
                                                          srv,
                                                          tmp_path):
        """Kill after one committed chunk, resume through a store shim
        whose existence checks LIE (eventual consistency): the resumed
        run re-executes the 'missing' chunk, loses the put-if-absent
        race against the real marker, and the final read still resolves
        one file per chunk — hash-identical to an uninterrupted run."""
        import json

        from ru_cdc_spark.sources.incremental_snapshot import (
            ChunkStore,
            run_snapshot_resumable,
        )

        class DelayedListingStore(ChunkStore):
            """exists() returns False for names created after the
            snapshot the test takes — the S3-style stale LIST."""

            def __init__(self, root):
                super().__init__(root)
                self.stale_as_of: set[str] | None = None

            def exists(self, name):
                if self.stale_as_of is not None:
                    return name in self.stale_as_of
                return super().exists(name)

        t = _table(srv)
        out_dir = str(tmp_path / "snap")
        plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                             srv.password, "snaptab", chunk_size=10)
        store = DelayedListingStore(out_dir)
        # attempt 1 "crashes" after the first chunk: truncated ranges
        run_snapshot_resumable(
            spark, "127.0.0.1", srv.port, srv.user, srv.password,
            SnapshotPlan(plan.table, plan.columns, plan.pk,
                         plan.ranges[:1], plan.start_file,
                         plan.start_pos),
            out_dir, store=store)
        # restore the original full plan (a real crash would have
        # persisted it whole on first write)
        import os as _os
        plan_file = _os.path.join(out_dir, "plan.json")
        saved = json.loads(open(plan_file).read())
        saved["ranges"] = plan.ranges
        open(plan_file, "w").write(json.dumps(saved))

        # the resumed run sees a LISTING FROZEN BEFORE attempt 1's
        # commit: even the completed chunk looks missing
        store.stale_as_of = {"plan.json"}
        full = run_snapshot_resumable(spark, "127.0.0.1", srv.port,
                                      srv.user, srv.password, plan,
                                      out_dir, store=store)
        ids = sorted(int(r["id"]) for r in full.collect())
        assert ids == list(range(30))
        # exactly ONE committed marker per chunk; the re-executed
        # duplicate lost the race and stays as unmanifested garbage
        store.stale_as_of = None
        data_files = _os.listdir(_os.path.join(out_dir, "data"))
        markers = [n for n in _os.listdir(out_dir)
                   if n.startswith("commit-")]
        assert len(markers) == 3
        assert len(data_files) == 4  # 3 committed + 1 orphaned stage
        manifested = {json.loads(store.read(m))["file"]
                      for m in markers}
        assert len(manifested) == 3
        # final state matches the live table exactly
        got = {(int(r["id"]), r["val"], r["name"]) for r in
               full.collect()}
        exp = {(int(r[0]), str(r[1]), r[2]) for r in t.scan()}
        assert got == exp
