"""Python UDTF surface: binlog event scanning callable from SQL,
LATERAL-joined over a table of byte segments."""

from __future__ import annotations

from ru_cdc_spark.sources.binlog_txn import generate_txn_segments
from ru_cdc_spark.sources.binlog_udtf import register_binlog_udtf


def test_binlog_events_udtf_scans_segments_from_sql(spark):
    register_binlog_udtf(spark)
    generate_txn_segments(spark, 30, 10, n_partitions=3) \
        .createOrReplaceTempView("__segs")
    rows = spark.sql("""
        SELECT s.segment_id, e.seq, e.type_name, e.event_size
        FROM __segs AS s, LATERAL binlog_events(s.blob) AS e
    """).collect()
    assert rows
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r.segment_id, []).append(r)
    assert set(by_seg) == {0, 1, 2}
    names = {r.type_name for r in rows}
    assert {"GTID", "QUERY", "TABLE_MAP", "WRITE_ROWS_V2", "XID"} <= names
    # ordinals are dense per segment and sizes are header-consistent
    for seg_rows in by_seg.values():
        seqs = sorted(r.seq for r in seg_rows)
        assert seqs == list(range(len(seg_rows)))
        assert all(r.event_size >= 19 for r in seg_rows)


def test_binlog_events_udtf_holds_back_truncated_tail(spark):
    register_binlog_udtf(spark)
    from ru_cdc_spark.sources.binlog_txn import txn_event_bytes

    blob = txn_event_bytes(1)
    spark.createDataFrame([(blob,), (blob[:-5],)], "blob binary") \
        .createOrReplaceTempView("__trunc")
    counts = [r.n for r in spark.sql("""
        SELECT count(*) AS n
        FROM __trunc AS t, LATERAL binlog_events(t.blob) AS e
        GROUP BY t.blob ORDER BY n DESC
    """).collect()]
    assert len(counts) == 2
    assert counts[0] == counts[1] + 1  # the clipped final event yields no row
