"""Binlog event scanning as a SQL table function (Python UDTF, Spark 4).

The reference has no user-function surface at all (SURVEY §2.10: config
is pure JSON data). This engine's extension points are, in preference
order: built-in expressions, Arrow-batched pandas UDFs/maps, and — new in
Spark 4 — Python UDTFs: imperative logic that RETURNS A TABLE, callable
straight from SQL (including LATERAL over a column). The honest use case
here is the wire layer: event-boundary scanning of a raw binlog byte
segment is genuinely imperative (variable-length events, header-driven
sizes) yet its output is naturally relational — one row per event.

    SELECT s.segment_id, e.*
    FROM segments AS s,
         LATERAL binlog_events(s.blob) AS e

Scale: the UDTF runs per input row, Arrow-shipped, executor-parallel —
the same distribution story as mapInPandas, with a SQL-native call site.
Scanning only reads the 19-byte headers (payloads are skipped by size),
so it is an index/audit pass, not a decode.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

# public binlog v4 type-code names for the audit output
_TYPE_NAMES = {
    2: "QUERY", 4: "ROTATE", 15: "FORMAT_DESCRIPTION", 16: "XID",
    19: "TABLE_MAP", 27: "HEARTBEAT", 29: "ROWS_QUERY",
    30: "WRITE_ROWS_V2", 31: "UPDATE_ROWS_V2", 32: "DELETE_ROWS_V2",
    33: "GTID",
}


@udtf(returnType=("seq int, event_type int, type_name string, "
                  "event_size int, log_pos long"))
class BinlogEventScan:
    """blob -> one row per wire event: ordinal, type code + name,
    declared size, header log_pos. Truncated trailing bytes yield no row
    (the assembler's partial-event holdback, observable from SQL)."""

    def eval(self, blob):
        if blob is None:
            return
        b = bytes(blob)
        off, seq = 0, 0
        while len(b) - off >= 13:
            size = int.from_bytes(b[off + 9:off + 13], "little")
            if size < 19 or len(b) - off < size:
                break
            etype = b[off + 4]
            log_pos = int.from_bytes(b[off + 13:off + 17], "little")
            yield (seq, etype, _TYPE_NAMES.get(etype, f"TYPE_{etype}"),
                   size, log_pos)
            seq += 1
            off += size


def register_binlog_udtf(spark) -> None:
    """Expose the scanner as the SQL table function ``binlog_events``."""
    spark.udtf.register("binlog_events", BinlogEventScan)
