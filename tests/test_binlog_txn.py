"""Transactional binlog assembly tests (sources/binlog_txn.py): codec
round-trips for the control events (GTID/XID/QUERY), transaction
atomicity, rollback discard, in-doubt holdback, and the commit-consistent
snapshot — semantics the reference's un-grouped event-at-a-time delivery
(executor.rs:528-607) cannot provide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ru_cdc_spark.sources import binlog_txn as bt
from ru_cdc_spark.sources import binlog_wire as w


# ---------------------------------------------------------------------------
# control-event codecs
# ---------------------------------------------------------------------------


def test_gtid_roundtrip_carries_logical_clock():
    sid = bytes(range(16))
    b = w.encode_gtid(sid, 42, last_committed=40, sequence_number=42,
                      commit_flag=1)
    g = w.decode_gtid(b)
    assert g == {"commit_flag": 1, "sid": sid, "gno": 42,
                 "last_committed": 40, "sequence_number": 42}


def test_xid_roundtrip_u64():
    assert w.decode_xid(w.encode_xid(2**63 - 7)) == 2**63 - 7
    assert w.decode_xid(w.encode_xid(0)) == 0


@pytest.mark.parametrize("schema,sql", [
    ("testdb", "BEGIN"),
    ("", "ROLLBACK"),
    ("db2", "ALTER TABLE t ADD COLUMN c INT"),
])
def test_query_event_roundtrip(schema, sql):
    assert w.decode_query(w.encode_query(sql, schema)) == (schema, sql)


def test_event_type_codes_are_public_values():
    # public binlog v4 type codes — a wrong code would desync any real
    # stream
    assert (w.QUERY_EVENT, w.XID_EVENT, w.GTID_EVENT) == (2, 16, 33)


# ---------------------------------------------------------------------------
# assembly semantics
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def assembled(spark):
    df = bt.assemble_transactions(bt.generate_txn_segments(spark))
    df = df.localCheckpoint()  # fixture reused by several tests
    return df


def test_statuses_partition_the_stream(assembled):
    counts = {r["status"]: r["n"] for r in
              assembled.groupBy("status").agg(F.count("*").alias("n"))
              .collect()}
    assert set(counts) == {"committed", "rolled_back", "in_doubt"}
    # the truncated tail txn (tid=499): 2 inserts + 1 delete = 3 images
    assert counts["in_doubt"] == 3


def test_atomicity_all_or_nothing_per_transaction(assembled):
    # every gno carries exactly one status — no transaction is split
    split = (assembled.groupBy("gno")
             .agg(F.count_distinct("status").alias("ns"))
             .where(F.col("ns") > 1).count())
    assert split == 0
    # and each committed txn's image count matches the fixture arithmetic:
    # tid%3+1 inserts, +1 image when tid%4 in (2,3)
    got = {r["gno"]: r["n"] for r in
           assembled.where(F.col("status") == "committed")
           .groupBy("gno").agg(F.count("*").alias("n")).collect()}
    for gno, n in got.items():
        tid = gno - 1
        expect = tid % 3 + 1 + (1 if tid % 4 in (2, 3) else 0)
        assert n == expect, (gno, n, expect)


def test_rolled_back_groups_never_reach_committed_view(spark, assembled):
    rolled = {r["gno"] for r in
              assembled.where(F.col("status") == "rolled_back")
              .select("gno").distinct().collect()}
    assert rolled == {t + 1 for t in range(bt.N_TXNS)
                      if t % bt.ROLLBACK_MOD == 5 and t != bt.TRUNCATED_TID}
    committed = bt.committed_changes(spark)
    assert committed.where(F.col("gno").isin(list(rolled))).count() == 0


def test_in_doubt_is_exactly_the_truncated_tail(assembled):
    doubt = assembled.where(F.col("status") == "in_doubt")
    assert {r["gno"] for r in doubt.select("gno").distinct().collect()} == \
        {bt.TRUNCATED_TID + 1}
    # in-doubt images carry no xid — nothing downstream can mistake them
    # for committed work
    assert doubt.where(F.col("xid").isNotNull()).count() == 0


def test_snapshot_never_contains_deleted_or_uncommitted_rows(spark):
    snap = bt.consistent_snapshot(spark)
    ids = {r["i"] for r in snap.select("i").collect()}
    for tid in range(bt.N_TXNS):
        block = {tid * 4 + k for k in range(tid % 3 + 1)}
        committed = tid % bt.ROLLBACK_MOD != 5 and tid != bt.TRUNCATED_TID
        if not committed:
            assert not (ids & block), f"uncommitted txn {tid} leaked"
        elif tid % 4 == 3:
            assert tid * 4 not in ids, f"deleted row of txn {tid} present"
            assert block - {tid * 4} <= ids
        else:
            assert block <= ids, f"committed txn {tid} incomplete"


def test_update_images_win_in_snapshot(spark):
    snap = bt.consistent_snapshot(spark)
    # txn tid=2 commits an UPDATE of row i=8: qty += 10000, note=upd_8
    row = snap.where(F.col("i") == 8).collect()[0]
    assert row["qty"] == (8 * 31) % 1000 + 10000
    assert row["note"] == "upd_8"


def test_assembler_reassembles_events_split_at_any_boundary():
    # feed one committed transaction byte-by-byte: nothing may surface
    # until the XID byte completes, then the whole group at once
    blob = bt.txn_event_bytes(2)  # 3 inserts + update, commits
    asm = bt.TxnAssembler()
    seen: list = []
    for j in range(len(blob)):
        rows = asm.feed(blob[j:j + 1])
        if rows:
            seen.append((j, rows))
    assert len(seen) == 1
    j, rows = seen[0]
    assert j == len(blob) - 1           # only the final byte delivers
    assert [r["op"] for r in rows] == ["INSERT"] * 3 + ["UPDATE"]
    assert all(r["status"] == "committed" for r in rows)
    assert asm.flush_open() == []       # nothing left open


def test_assembler_holds_open_txn_until_late_xid():
    # transaction bytes arrive WITHOUT the terminator; the XID lands in a
    # later chunk (even a later micro-batch) — holdback then delivery
    full = bt.txn_event_bytes(0)        # tid 0: 1 insert, commits
    xid_size = 27                       # 19-byte header + 8-byte xid
    body, xid_ev = full[:-xid_size], full[-xid_size:]
    asm = bt.TxnAssembler()
    assert asm.feed(body) == []
    rows = asm.feed(xid_ev)
    assert [r["status"] for r in rows] == ["committed"]
    assert rows[0]["xid"] == bt.XID_BASE


def test_streaming_assembly_matches_batch(spark, tmp_path):
    """Chunked multi-batch delivery through applyInPandasWithState equals
    the batch assembly's committed view — exactly once, no early rows."""

    schema = "stream_id long, chunk_seq long, data binary"
    src = str(tmp_path / "chunks")
    rounds = bt.stream_chunk_rounds(n_txns=60, txns_per_segment=20)
    spark.createDataFrame(rounds[0], schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (bt.streaming_txn_assembly(stream)
         .writeStream.format("memory").queryName("txn_stream_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    for pdf in rounds[1:]:
        spark.createDataFrame(pdf, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
    q.stop()
    got = (spark.table("txn_stream_t")
           .where(F.col("status") == "committed")
           .select("gno", "op", "seq_in_txn", "i", "qty", "amount", "note"))
    want = (bt.assemble_transactions(
        bt.generate_txn_segments(spark, 60, 20))
        .where(F.col("status") == "committed")
        .select("gno", "op", "seq_in_txn", "i", "qty", "amount", "note"))
    gl = sorted(map(tuple, got.collect()))
    wl = sorted(map(tuple, want.collect()))
    assert gl == wl and len(gl) > 0


def test_apply_groups_match_group_commit_size(spark):
    rep = bt.apply_group_report(spark).collect()
    by_lc = {r["last_committed"]: r for r in rep}
    # group 0 holds tids 0..4 minus nothing (none roll back below 5)
    assert by_lc[0]["n_txns"] == 5
    assert by_lc[0]["min_seq"] == 1 and by_lc[0]["max_seq"] == 5
    # every group's seq range stays inside its commit window
    for lc, r in by_lc.items():
        assert lc + 1 <= r["min_seq"] <= r["max_seq"] <= \
            lc + bt.GROUP_COMMIT_SIZE


def test_rows_query_populates_sql_per_statement():
    """ROWS_QUERY events (type 29, binlog_rows_query_log_events=ON) carry
    the originating SQL ahead of each row event; with capture_sql the
    assembler attaches it per image, per statement — the source Canal's
    envelope `sql` field comes from, which the reference never decodes."""
    from ru_cdc_spark.sources.binlog_txn import (
        TXN_COLUMNS,
        TxnAssembler,
    )
    from ru_cdc_spark.sources.binlog_wire import (
        encode_frame,
        encode_gtid,
        encode_query,
        encode_rows_query,
        encode_xid,
    )

    from ru_cdc_spark.sources.binlog_wire import WRITE_ROWS_V2

    specs = [s for _, s in TXN_COLUMNS]
    from decimal import Decimal
    vals1 = [1, 10, Decimal("1.00"), "a"]
    vals2 = [2, 20, Decimal("2.00"), "b"]
    frame1 = encode_frame(7, "testdb", "t", specs, WRITE_ROWS_V2, [vals1])
    frame2 = encode_frame(7, "testdb", "t", specs, WRITE_ROWS_V2, [vals2])
    stream = (
        encode_gtid(bytes(16), 1, 0, 1)
        + encode_query("BEGIN", schema="testdb")
        + encode_rows_query("INSERT INTO t VALUES (1)")
        + frame1
        + encode_rows_query("INSERT INTO t VALUES (2)")
        + frame2
        + encode_xid(99)
    )
    asm = TxnAssembler(capture_sql=True)
    out = asm.feed(stream)
    assert [r["sql"] for r in out] == [
        "INSERT INTO t VALUES (1)", "INSERT INTO t VALUES (2)"]
    assert all(r["status"] == "committed" for r in out)

    # default mode: schema unchanged, no sql key
    asm2 = TxnAssembler()
    out2 = asm2.feed(stream)
    assert out2 and all("sql" not in r for r in out2)


def test_rotate_switches_current_log_mid_stream():
    """ROTATE events (the reference decodes but drops them, D12) switch
    the tracked (file, position) so resume checkpoints name the right
    binlog file even across file boundaries — and transactions spanning
    the rotation still assemble atomically."""
    from decimal import Decimal

    from ru_cdc_spark.sources import binlog_wire as w
    from ru_cdc_spark.sources.binlog_txn import TXN_COLUMNS, TxnAssembler

    specs = [s for _, s in TXN_COLUMNS]
    frame = w.encode_frame(7, "testdb", "t", specs, w.WRITE_ROWS_V2,
                           [[9, 90, Decimal("9.00"), "r"]])
    stream = (
        w.encode_rotate("binlog.000001", 4)
        + w.encode_gtid(bytes(16), 5, 0, 5)
        + w.encode_query("BEGIN", schema="testdb")
        + frame
        # the file rotates while the transaction is still open
        + w.encode_rotate("binlog.000002", 4)
        + w.encode_xid(555)
    )
    asm = TxnAssembler()
    rows = asm.feed(stream)
    assert [r["status"] for r in rows] == ["committed"]
    assert rows[0]["xid"] == 555
    assert asm.current_log == "binlog.000002"
    assert asm.current_pos == 4


def test_spec_cache_bounded_and_cleared_on_rotate():
    """ADVICE fix: the TABLE_MAP spec cache is LRU-capped and cleared on
    ROTATE/FORMAT_DESCRIPTION, and an id reuse with a different column
    count re-decodes instead of using stale specs."""
    from ru_cdc_spark.sources.binlog_txn import TxnAssembler, TXN_SPECS
    from ru_cdc_spark.sources.binlog_wire import (
        CHECKSUM_NONE,
        ColSpec,
        T_LONG,
        T_LONGLONG,
        WRITE_ROWS_V2,
        encode_format_description,
        encode_frame,
        encode_gtid,
        encode_query,
        encode_rotate,
        encode_xid,
    )

    asm = TxnAssembler(spec_cache_cap=8)
    # table-id churn: 50 distinct ids -> cache stays at the cap
    for tid in range(50):
        blob = (encode_gtid(bytes(16), tid + 1, 0, tid + 1)
                + encode_query("BEGIN", "db")
                + encode_frame(1000 + tid, "db", "t", TXN_SPECS,
                               WRITE_ROWS_V2, [(tid, 1, None, "x")])
                + encode_xid(tid))
        asm.feed(blob)
    assert len(asm.specs_by_tid) <= 8

    # rotate clears the registry
    asm.feed(encode_rotate("binlog.000002"))
    assert asm.specs_by_tid == {}
    asm.feed(encode_format_description(CHECKSUM_NONE))
    assert asm.specs_by_tid == {}

    # id reuse with a DIFFERENT column count: the cheap count peek
    # forces a fresh decode instead of using the 4-column cached specs
    from ru_cdc_spark.sources.binlog_wire import encode_table_map

    asm.feed(encode_table_map(555, "db", "t4", TXN_SPECS))
    assert len(asm.specs_by_tid[555]) == 4
    two_cols = [ColSpec(T_LONGLONG), ColSpec(T_LONG)]
    asm.feed(encode_table_map(555, "db", "t2", two_cols))
    assert len(asm.specs_by_tid[555]) == 2
    rows = asm.feed(
        encode_gtid(bytes(16), 901, 0, 901)
        + encode_query("BEGIN", "db")
        + encode_frame(556, "db", "t4", TXN_SPECS,
                       WRITE_ROWS_V2, [(7, 8, None, "y")])
        + encode_xid(901))
    assert rows and rows[0]["i"] == 7 and rows[0]["qty"] == 8


# ---------------------------------------------------------------------------
# TRANSACTION_PAYLOAD_EVENT (type 40, MySQL 8 compressed transactions)
# ---------------------------------------------------------------------------


def _one_txn_body(tid=77):
    return (w.encode_query("BEGIN", "testdb")
            + w.encode_frame(bt.TXN_TABLE_ID, "testdb", "txn_rows",
                             bt.TXN_SPECS, bt.WRITE_ROWS_V2
                             if hasattr(bt, "WRITE_ROWS_V2")
                             else w.WRITE_ROWS_V2,
                             [bt._row_values(tid)])
            + w.encode_xid(5000 + tid))


def test_payload_event_roundtrip_zstd():
    inner = _one_txn_body()
    ev = w.encode_transaction_payload(inner)
    assert ev[4] == w.TRANSACTION_PAYLOAD_EVENT
    assert w.decode_transaction_payload(ev) == inner
    assert len(ev) != len(inner)  # actually wrapped


def test_payload_event_uncompressed_type():
    inner = _one_txn_body()
    ev = w.encode_transaction_payload(inner, compress=False)
    assert w.decode_transaction_payload(ev) == inner


def test_assembler_decodes_compressed_transaction():
    inner = _one_txn_body(31)
    stream = (w.encode_gtid(bytes(16), 700, 0, 700)
              + w.encode_transaction_payload(inner))
    asm = bt.TxnAssembler()
    rows = asm.feed(stream)
    assert len(rows) == 1
    assert rows[0]["status"] == "committed"
    assert rows[0]["i"] == 31
    assert rows[0]["xid"] == 5031


def test_assembler_decodes_real_libzstd_payload(monkeypatch):
    """A real server compresses with libzstd, not our store-mode
    encoder: swap the compressor for pyarrow's bundled libzstd and the
    assembler must still decode (differential-validation ask)."""
    pa = pytest.importorskip("pyarrow")
    import ru_cdc_spark.functions.zstd as zmod

    monkeypatch.setattr(
        zmod, "compress_store",
        lambda b, checksum=True: pa.Codec("zstd").compress(b).to_pybytes())
    inner = _one_txn_body(52)
    stream = (w.encode_gtid(bytes(16), 800, 0, 800)
              + w.encode_transaction_payload(inner))
    asm = bt.TxnAssembler()
    rows = asm.feed(stream)
    assert len(rows) == 1 and rows[0]["i"] == 52


def test_compressed_fixture_matches_uncompressed_rows():
    """txn_event_bytes(compressed=True) assembles to the exact same
    rows as the plain stream, transaction for transaction."""
    plain_rows, comp_rows = [], []
    for compressed, sink in ((False, plain_rows), (True, comp_rows)):
        asm = bt.TxnAssembler()
        for t in range(0, 40):
            sink.extend(asm.feed(bt.txn_event_bytes(t, compressed)))
        sink.extend(asm.flush_open())
    assert plain_rows == comp_rows


def test_payload_split_across_feeds_reassembles():
    """The type-40 event arriving in arbitrary chunks must behave like
    any other event: held in the tail until complete."""
    inner = _one_txn_body(9)
    stream = (w.encode_gtid(bytes(16), 901, 0, 901)
              + w.encode_transaction_payload(inner))
    for cut in (5, 25, len(stream) // 2, len(stream) - 3):
        asm = bt.TxnAssembler()
        rows = asm.feed(stream[:cut])
        rows += asm.feed(stream[cut:])
        assert len(rows) == 1 and rows[0]["i"] == 9, f"cut={cut}"


def test_corrupt_event_size_fails_loudly_not_oom():
    """A corrupted/adversarial header declaring a multi-GB event must
    raise with the stream position, not buffer forever waiting for
    bytes that never come (real events are capped by
    max_allowed_packet)."""
    import pytest as _pytest

    from ru_cdc_spark.sources.binlog_txn import TxnAssembler, txn_event_bytes

    good = txn_event_bytes(1)
    evil = bytearray(good)
    # patch the first event's size field to 2 GB
    evil[9:13] = (2 << 30).to_bytes(4, "little")
    asm = TxnAssembler()
    with _pytest.raises(ValueError, match="implausible event size"):
        asm.feed(bytes(evil))
    # size below the 19-byte header floor is equally corrupt
    evil[9:13] = (5).to_bytes(4, "little")
    with _pytest.raises(ValueError, match="implausible event size"):
        TxnAssembler().feed(bytes(evil))
