"""Transactional binlog assembly: GTID/BEGIN/rows/XID -> atomic change sets.

The reference has NO transaction notion: every row event ships to the sink
independently (/root/reference/src/executor.rs:528-607 processes events
one at a time; src/binlog.rs:768-811 decodes QueryEvent but nothing calls
it — D11 dead code), so a consumer can observe half a transaction, and a
crash between events of one COMMIT leaves the downstream snapshot
torn. This module closes that gap with the real binlog grammar (public
binlog v4 layouts, wire codecs in binlog_wire.py):

    GTID_EVENT(33) -> QUERY("BEGIN") -> (TABLE_MAP + ROWS)* ->
        XID_EVENT(16)          # commit:   deliver the group atomically
      | QUERY("ROLLBACK")      # rollback: discard the group
      | <stream ends>          # in-doubt: hold back, never deliver early

Assembly is a per-segment sequential scan — and that is the CORRECT scale
shape, not a compromise: a binlog segment (file) is a physically ordered
medium, and MySQL never splits a transaction across segment files
(rotation happens only at transaction boundaries — public replication
contract). So segments are embarrassingly parallel: `mapInPandas` walks
each segment's bytes once, O(largest transaction) memory, no shuffle; a
100 TB binlog backlog is thousands of segments decoding concurrently,
scan-bandwidth bound exactly like every other narrow operator here.

The GTID event's MySQL 5.7 logical clock (last_committed /
sequence_number) is decoded and carried through: transactions sharing a
`last_committed` value group-committed together on the primary and are
mutually conflict-free — the scheduling fact MySQL's own multi-threaded
replica applier (MTS LOGICAL_CLOCK) parallelizes by, which downstream
appliers of this stream can use the same way (`apply_group_report`).

Fixture values are pure functions of (transaction id, row id) so a DuckDB
oracle recomputes every byte-decoded value arithmetically.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ru_cdc_spark.sources.binlog_wire import (
    DELETE_ROWS_V2,
    FORMAT_DESCRIPTION_EVENT,
    GTID_EVENT,
    ROTATE_EVENT,
    HEARTBEAT_EVENT,
    QUERY_EVENT,
    ROWS_QUERY_EVENT,
    PARTIAL_UPDATE_ROWS_EVENT,
    TABLE_MAP_EVENT,
    TRANSACTION_PAYLOAD_EVENT,
    UPDATE_ROWS_V2,
    WRITE_ROWS_V2,
    XID_EVENT,
    ColSpec,
    read_lenenc,
    T_LONG,
    T_LONGLONG,
    T_NEWDECIMAL,
    T_VARCHAR,
    compile_decoders,
    decode_format_description,
    decode_gtid,
    decode_heartbeat,
    decode_query,
    decode_rotate,
    decode_rows_event,
    decode_rows_query,
    decode_table_map,
    decode_transaction_payload,
    decode_xid,
    encode_frame,
    encode_transaction_payload,
    encode_gtid,
    encode_query,
    encode_xid,
)

TXN_COLUMNS = [
    ("i", ColSpec(T_LONGLONG)),
    ("qty", ColSpec(T_LONG)),
    ("amount", ColSpec(T_NEWDECIMAL, (10, 2))),
    ("note", ColSpec(T_VARCHAR, (80,))),
]
TXN_SPECS = [s for _, s in TXN_COLUMNS]
# the per-row emit path (_rows) hand-unpacks exactly these four fields
assert [n for n, _ in TXN_COLUMNS] == ["i", "qty", "amount", "note"]
TXN_TABLE_ID = 77

# fixed server UUID (SID) for the fixture stream
TXN_SID = bytes(range(16))

N_TXNS = 500
TXNS_PER_SEGMENT = 50
GROUP_COMMIT_SIZE = 5      # txns per group commit -> shared last_committed
ROLLBACK_MOD = 7           # tid % 7 == 5 -> ROLLBACK
TRUNCATED_TID = N_TXNS - 1  # last txn is cut mid-flight (no terminator)
XID_BASE = 43000


def _row_values(i: int) -> tuple:
    return (i, (i * 31) % 1000,
            Decimal((i * 37) % 9999999 + 1).scaleb(-2),
            f"n_{i % 100}")


def _update_after(i: int) -> tuple:
    r = list(_row_values(i))
    r[1] += 10000
    r[3] = f"upd_{i}"
    return tuple(r)


def txn_event_bytes(tid: int, compressed: bool = False) -> bytes:
    """All wire bytes of transaction ``tid``: GTID + BEGIN + row frames +
    terminator (XID / ROLLBACK / nothing for the truncated tail).
    ``compressed=True`` ships the post-GTID body as one
    TRANSACTION_PAYLOAD_EVENT (the MySQL 8
    binlog_transaction_compression=ON layout: GTID stays outside; the
    truncated in-flight tail stays uncompressed, as a server only wraps
    COMPLETE transactions)."""
    n_rows = tid % 3 + 1
    ids = [tid * 4 + k for k in range(n_rows)]
    gtid = encode_gtid(TXN_SID, tid + 1,
                       last_committed=(tid // GROUP_COMMIT_SIZE)
                       * GROUP_COMMIT_SIZE,
                       sequence_number=tid + 1, log_pos=tid)
    blob = bytearray()
    blob += encode_query("BEGIN", "testdb", log_pos=tid)
    blob += encode_frame(TXN_TABLE_ID, "testdb", "txn_rows", TXN_SPECS,
                         WRITE_ROWS_V2, [_row_values(i) for i in ids],
                         log_pos=tid)
    if tid % 4 == 2:
        blob += encode_frame(TXN_TABLE_ID, "testdb", "txn_rows", TXN_SPECS,
                             UPDATE_ROWS_V2,
                             [(_row_values(ids[0]), _update_after(ids[0]))],
                             log_pos=tid)
    elif tid % 4 == 3:
        blob += encode_frame(TXN_TABLE_ID, "testdb", "txn_rows", TXN_SPECS,
                             DELETE_ROWS_V2, [_row_values(ids[0])],
                             log_pos=tid)
    if tid == TRUNCATED_TID:
        return gtid + bytes(blob)  # stream ends mid-transaction: in-doubt
    if tid % ROLLBACK_MOD == 5:
        blob += encode_query("ROLLBACK", "testdb", log_pos=tid)
    else:
        blob += encode_xid(XID_BASE + tid, log_pos=tid)
    if compressed:
        return gtid + encode_transaction_payload(bytes(blob), log_pos=tid)
    return gtid + bytes(blob)


def generate_txn_segments(spark: SparkSession, n_txns: int = N_TXNS,
                          txns_per_segment: int = TXNS_PER_SEGMENT,
                          n_partitions: int = 8,
                          compressed: bool = False) -> DataFrame:
    """Binlog segments (one binary blob each = one binlog file's ordered
    event bytes). Segment boundaries fall only between transactions —
    MySQL's rotation contract — which is what licenses the parallel
    per-segment assembly below. ``compressed=True`` emits every complete
    transaction as GTID + TRANSACTION_PAYLOAD_EVENT (zstd)."""
    n_segments = (n_txns + txns_per_segment - 1) // txns_per_segment

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sids, blobs = [], []
            for sid in pdf["id"]:
                lo = int(sid) * txns_per_segment
                hi = min(lo + txns_per_segment, n_txns)
                if lo >= hi:
                    continue
                blob = b"".join(txn_event_bytes(t, compressed)
                                for t in range(lo, hi))
                sids.append(int(sid))
                blobs.append(blob)
            yield pd.DataFrame({"segment_id": sids, "blob": blobs})

    return (spark.range(n_segments).repartition(n_partitions)
            .mapInPandas(gen, "segment_id long, blob binary"))


ASSEMBLED_SCHEMA = (
    "status string, gno long, xid long, seq_no long, last_committed long, "
    "op string, seq_in_txn long, i long, qty long, amount string, "
    "note string"
)

_OPNAMES = {WRITE_ROWS_V2: "INSERT", UPDATE_ROWS_V2: "UPDATE",
            DELETE_ROWS_V2: "DELETE",
            # type 39: partial-JSON UPDATE — diffs already applied by
            # the wire layer, downstream sees a normal UPDATE
            PARTIAL_UPDATE_ROWS_EVENT: "UPDATE"}

_OUT_COLS = ["status", "gno", "xid", "seq_no", "last_committed",
             "op", "seq_in_txn", *[n for n, _ in TXN_COLUMNS]]

# events can never exceed max_allowed_packet (hard server limit 1 GB);
# a larger declared size is stream corruption, not data
MAX_EVENT_SIZE = 1 << 30


def _tm_column_count(ev: bytes) -> int:
    """Cheap peek at a TABLE_MAP event's declared column count (skips
    table_id+flags and the two length-prefixed names) — the spec-cache
    validity guard without paying for a full metadata decode."""
    o = 19 + 6 + 2
    o += 1 + ev[o] + 1      # schema name (len byte + bytes + NUL)
    o += 1 + ev[o] + 1      # table name
    n, _ = read_lenenc(ev, o)
    return n


class TxnAssembler:
    """Incremental transaction assembler over a byte stream.

    ``feed(data)`` consumes any chunking of the stream — events may split
    across chunks (the socket-read reality) — and returns the rows of
    every transaction that REACHED ITS OUTCOME inside the fed bytes
    (status committed / rolled_back). An open transaction and the
    trailing partial event stay buffered; ``flush_open(status)`` drains
    them (batch mode marks segment-final opens ``in_doubt``; streaming
    keeps them in state instead, so nothing is ever delivered early).

    Memory: the undecoded tail of one event + one open transaction's
    images + a BOUNDED spec cache (LRU-capped at ``spec_cache_cap`` and
    cleared on ROTATE/FORMAT_DESCRIPTION, since table-id churn from DDL
    mints fresh ids over a long-lived stream — ADVICE fix) — independent
    of stream length."""

    SPEC_CACHE_CAP = 4096  # ~tables in flight, not tables ever seen

    def __init__(self, capture_sql: bool = False,
                 spec_cache_cap: int = SPEC_CACHE_CAP) -> None:
        self.tail = b""
        self.cur: dict | None = None
        self.images: list = []
        self.specs_by_tid: dict[int, list[ColSpec]] = {}
        # compiled column decoders, keyed and evicted in lockstep with
        # specs_by_tid: compiling once per TABLE_MAP (not per rows event)
        # removes the spec-tuple hash from the per-event hot path
        self.decoders_by_tid: dict[int, list] = {}
        self.spec_cache_cap = spec_cache_cap
        # Canal's envelope `sql` field source: ROWS_QUERY events (type 29,
        # binlog_rows_query_log_events=ON) carry the originating statement
        # text ahead of each row event. Opt-in so default output schemas
        # stay stable; the reference never decodes type 29 at all.
        self.capture_sql = capture_sql
        self.cur_sql: str | None = None
        # set by FORMAT_DESCRIPTION (type 15): 4 when the stream is
        # written with binlog_checksum=CRC32, else 0. Every later event's
        # trailing bytes depend on it.
        self.checksum_bytes = 0
        # advanced by HEARTBEAT (type 27) on idle masters: position (and
        # watermark) liveness without row traffic
        self.last_heartbeat_pos: int | None = None
        # tracked from ROTATE (type 4): the current binlog file — resume
        # positions are (file, pos) pairs, not a bare offset (the
        # reference decodes ROTATE but drops it, SURVEY D12)
        self.current_log: str | None = None
        self.current_pos: int = 0

    def __getstate__(self) -> dict:
        # compiled decoders are closures (unpicklable, and cheap to
        # rebuild from specs); the streaming state store pickles the
        # whole assembler between micro-batches
        d = self.__dict__.copy()
        d["decoders_by_tid"] = {}
        return d

    def __setstate__(self, d: dict) -> None:
        self.__dict__.update(d)
        self.decoders_by_tid = {
            tid: compile_decoders(specs)
            for tid, specs in self.specs_by_tid.items()}

    def _rows(self, status: str, xid) -> list[dict]:
        # one dict literal per row, txn fields hoisted out of the loop —
        # this is the per-row emit path, paid once per assembled image.
        # The `i, qty, amount, note` unpack is hand-specialized to
        # TXN_COLUMNS; the module-level assert under TXN_COLUMNS ties it
        # to the table definition so a column change fails loudly.
        cur = self.cur
        gno, seq = cur["gno"], cur["sequence_number"]
        lc = cur["last_committed"]
        cap = self.capture_sql
        out = []
        ap = out.append
        for k, (op, vals, sql) in enumerate(self.images):
            i, qty, amount, note = vals
            r = {"status": status, "gno": gno, "xid": xid,
                 "seq_no": seq, "last_committed": lc,
                 "op": op, "seq_in_txn": k, "i": i, "qty": qty,
                 "amount": None if amount is None else str(amount),
                 "note": note}
            if cap:
                r["sql"] = sql
            ap(r)
        return out

    def feed(self, data: bytes) -> list[dict]:
        buf = self.tail + data
        # reset before the walk: type-40 payload events recurse into
        # feed() for their decompressed inner events, and a stale tail
        # would otherwise be prepended twice
        self.tail = b""
        off = 0
        rows: list[dict] = []
        # dispatch order = event frequency (rows > table map > gtid/xid
        # > query > control): a committed-txn stream is ~1/3 rows
        # events, and the if-chain below is the per-event hot path
        n = len(buf)
        ib = int.from_bytes
        while n - off >= 13:
            size = ib(buf[off + 9:off + 13], "little")
            if size < 19 or size > MAX_EVENT_SIZE:
                # a corrupted/adversarial header, not a big event: real
                # servers cap events at max_allowed_packet (1 GB hard
                # limit). Waiting for a declared multi-GB "event" would
                # buffer the stream forever — fail with the position
                # instead of OOMing quietly.
                raise ValueError(
                    f"implausible event size {size} at stream offset "
                    f"{off} (type {buf[off + 4]}) — corrupted stream?")
            if n - off < size:
                break  # partial event: wait for more bytes
            ev = buf[off:off + size]
            off += size
            etype = ev[4]
            if etype in _OPNAMES:
                table_id = ib(ev[19:25], "little")
                et, imgs = decode_rows_event(ev, self.specs_by_tid[table_id],
                                             self.checksum_bytes,
                                             self.decoders_by_tid.get(
                                                 table_id))
                images_append = self.images.append
                cur_sql = self.cur_sql
                if et in (UPDATE_ROWS_V2, PARTIAL_UPDATE_ROWS_EVENT):
                    for img in imgs:
                        images_append(("UPDATE", img[1], cur_sql))
                else:
                    opname = _OPNAMES[et]
                    for img in imgs:
                        images_append((opname, img, cur_sql))
            elif etype == TABLE_MAP_EVENT:
                # registry keyed by table_id, fill-once (the reference's
                # TableMap, binlog.rs:390-501): MySQL issues a NEW
                # table_id when a table's definition changes, so a known
                # id never needs re-decoding — measured ~15% of assembly
                # CPU on table-map-per-frame streams
                tid_ = ib(ev[19:25], "little")
                cached = self.specs_by_tid.pop(tid_, None)
                if cached is not None and \
                        len(cached) == _tm_column_count(ev):
                    # hit: re-insert for LRU recency, skip the decode
                    # (the fill-once CPU win) — guarded by a cheap
                    # column-count peek so an id reuse with changed
                    # specs never decodes stale
                    self.specs_by_tid[tid_] = cached
                else:
                    _tid, _s, _t, specs = decode_table_map(ev)
                    self.specs_by_tid[tid_] = specs
                    self.decoders_by_tid[tid_] = compile_decoders(specs)
                    if len(self.specs_by_tid) > self.spec_cache_cap:
                        # dict preserves insertion order: evict the LRU
                        evicted = next(iter(self.specs_by_tid))
                        self.specs_by_tid.pop(evicted)
                        self.decoders_by_tid.pop(evicted, None)
            elif etype == XID_EVENT:
                if self.cur is not None:
                    rows += self._rows("committed", decode_xid(ev))
                    self.cur, self.images = None, []
            elif etype == GTID_EVENT:
                self.cur = decode_gtid(ev)
                self.images = []
                self.cur_sql = None
            elif etype == QUERY_EVENT:
                # the only QUERY bodies that matter here are ROLLBACK
                # (txn outcome) and, when capture_sql, the statement
                # text; BEGINs (the overwhelming majority) are skipped
                # by a cheap tail probe instead of a full decode
                cs = self.checksum_bytes
                tail_probe = ev[-(8 + cs):len(ev) - cs]
                if tail_probe == b"ROLLBACK":
                    _schema, sql = decode_query(ev, cs)
                    if sql == "ROLLBACK" and self.cur is not None:
                        rows += self._rows("rolled_back", None)
                        self.cur, self.images = None, []
                # BEGIN: transaction already opened by its GTID event
            elif etype == ROTATE_EVENT:
                self.current_log, self.current_pos = decode_rotate(
                    ev, self.checksum_bytes)
                # file switch: table ids are per-binlog-session — stale
                # specs must not survive into the next file
                self.specs_by_tid.clear()
                self.decoders_by_tid.clear()
            elif etype == FORMAT_DESCRIPTION_EVENT:
                fd = decode_format_description(ev)
                self.checksum_bytes = fd["checksum_bytes"]
                self.specs_by_tid.clear()
                self.decoders_by_tid.clear()
            elif etype == HEARTBEAT_EVENT:
                _ident, self.last_heartbeat_pos = decode_heartbeat(
                    ev, self.checksum_bytes)
            elif etype == ROWS_QUERY_EVENT:
                if self.capture_sql:
                    self.cur_sql = decode_rows_query(ev, self.checksum_bytes)
            elif etype == TRANSACTION_PAYLOAD_EVENT:
                # MySQL 8 compressed transaction (type 40): the whole
                # txn body (BEGIN/table map/rows/XID) arrives as one
                # zstd blob after the uncompressed GTID event. Inner
                # events carry NO checksums regardless of the stream's
                # checksum setting — recurse with checksum_bytes=0.
                inner = decode_transaction_payload(ev, self.checksum_bytes)
                outer_cs = self.checksum_bytes
                self.checksum_bytes = 0
                try:
                    rows += self.feed(inner)
                finally:
                    self.checksum_bytes = outer_cs
                if self.tail:
                    raise ValueError(
                        "truncated event inside transaction payload")
        self.tail = buf[off:]
        return rows

    def flush_open(self, status: str = "in_doubt") -> list[dict]:
        if self.cur is None:
            return []
        rows = self._rows(status, None)
        self.cur, self.images = None, []
        return rows


def assemble_transactions(segments: DataFrame) -> DataFrame:
    """Walk each segment's ordered bytes once, buffering row images per
    open transaction; emit each image tagged with its transaction identity
    (gno / xid / logical clock) and outcome status:

    * ``committed``   — an XID event closed the group
    * ``rolled_back`` — a ROLLBACK query closed it (images never valid)
    * ``in_doubt``    — the segment ended mid-transaction (deliver only
      after the position is re-read past the gap; never early)

    Memory: one transaction's images (bounded by the largest transaction,
    not the segment). The committed view downstream filters
    status='committed' — atomicity is structural, not best-effort."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for blob in pdf["blob"]:
                asm = TxnAssembler()
                rows += asm.feed(bytes(blob))
                rows += asm.flush_open("in_doubt")
            yield pd.DataFrame(rows, columns=_OUT_COLS)

    return segments.mapInPandas(walk, ASSEMBLED_SCHEMA)


def assemble_event_batch(events_df: DataFrame,
                         event_col: str = "frame",
                         pos_col: str = "pos") -> DataFrame:
    """Assemble one TRANSACTION-ALIGNED micro-batch of raw binlog
    events ``(pos, event bytes)`` into committed/rolled-back rows.

    Contract: the batch's offset range was cut at GTID starts (the
    ``binlog_socket`` source's ``cut_at=gtid`` mode), so every
    transaction lies whole inside the batch and a fresh assembler per
    batch is restart-safe — Spark replays the identical [start, end)
    range after a crash and gets the identical rows. Anything still
    open at batch end can only be a truncated log tail and is dropped,
    never delivered early (the atomic-delivery contract the reference
    lacks, executor.rs:528-607).

    The single sorted partition is the micro-batch, not the corpus:
    assembly is inherently serial per replication stream, and the
    source bounds batches by ``events_per_batch``."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        asm = TxnAssembler()
        rows: list[dict] = []
        for pdf in batches:
            for ev in pdf[event_col]:
                rows += asm.feed(bytes(ev))
        yield pd.DataFrame(rows, columns=_OUT_COLS)

    return (events_df.repartition(1).sortWithinPartitions(pos_col)
            .mapInPandas(walk, ASSEMBLED_SCHEMA))


# ---------------------------------------------------------------------------
# streaming assembly: socket chunks -> exactly-once committed delivery
# ---------------------------------------------------------------------------


def streaming_txn_assembly(chunks_stream: DataFrame) -> DataFrame:
    """STREAMING transaction assembly over arbitrarily-chunked bytes
    (``stream_id, chunk_seq, data``): per-stream state holds the
    assembler (undecoded tail + open transaction) across micro-batches,
    so an event split mid-chunk or a transaction split across BATCHES is
    reassembled and delivered only at its XID — exactly the holdback a
    socket reader needs, and precisely what the reference cannot do (it
    forwards each row event the moment it decodes,
    executor.rs:528-607). Output rows appear in the batch where the
    outcome event arrives; open transactions live in the checkpointed
    state store, surviving restarts.

    Scale: state per stream is O(tail + one open txn); streams (binlog
    shards) partition across executors; each batch touches only streams
    with new chunks."""
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def assemble(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        asm = (pickle.loads(bytes(state.get[0])) if state.exists
               else TxnAssembler())
        parts = [pdf for pdf in pdfs]
        rows: list[dict] = []
        if parts:
            pdf = pd.concat(parts).sort_values("chunk_seq")
            for d in pdf["data"]:
                rows += asm.feed(bytes(d))
        state.update((pickle.dumps(asm),))
        out = pd.DataFrame(rows, columns=_OUT_COLS)
        if rows:
            yield out

    return (chunks_stream.groupBy("stream_id")
            .applyInPandasWithState(
                assemble, ASSEMBLED_SCHEMA, "blob binary",
                "append", GroupStateTimeout.NoTimeout))


CHUNK_BYTES = 1999  # deliberately misaligned with every event size


def stream_chunk_rounds(n_txns: int = N_TXNS,
                        txns_per_segment: int = TXNS_PER_SEGMENT
                        ) -> list[pd.DataFrame]:
    """The fixture's segments cut into CHUNK_BYTES slices, grouped into
    delivery rounds: round k carries chunk k of every stream — so every
    micro-batch ends mid-event for most streams and transactions
    routinely span batches."""
    n_segments = (n_txns + txns_per_segment - 1) // txns_per_segment
    per_stream: list[list[bytes]] = []
    for sid in range(n_segments):
        lo = sid * txns_per_segment
        blob = b"".join(txn_event_bytes(t)
                        for t in range(lo, min(lo + txns_per_segment,
                                               n_txns)))
        per_stream.append([blob[o:o + CHUNK_BYTES]
                           for o in range(0, len(blob), CHUNK_BYTES)])
    rounds = []
    for k in range(max(len(c) for c in per_stream)):
        rows = [(sid, k, chunks[k])
                for sid, chunks in enumerate(per_stream)
                if k < len(chunks)]
        rounds.append(pd.DataFrame(
            rows, columns=["stream_id", "chunk_seq", "data"]))
    return rounds


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — recompute the committed stream arithmetically
# ---------------------------------------------------------------------------

BINLOG_TXN_CHANGES_ORACLE = f"""
WITH committed AS (
    SELECT tid FROM (SELECT UNNEST(range({N_TXNS})) AS tid)
    WHERE tid % {ROLLBACK_MOD} <> 5 AND tid <> {TRUNCATED_TID}
),
ins AS (
    SELECT tid, k AS seq_in_txn, tid * 4 + k AS i, 'INSERT' AS op
    FROM committed CROSS JOIN (SELECT UNNEST(range(3)) AS k)
    WHERE k < tid % 3 + 1
),
tail AS (
    SELECT tid, tid % 3 + 1 AS seq_in_txn, tid * 4 AS i,
           CASE WHEN tid % 4 = 2 THEN 'UPDATE' ELSE 'DELETE' END AS op
    FROM committed WHERE tid % 4 IN (2, 3)
),
ops AS (SELECT * FROM ins UNION ALL SELECT * FROM tail)
SELECT tid + 1 AS gno, {XID_BASE} + tid AS xid, tid + 1 AS seq_no,
       (tid // {GROUP_COMMIT_SIZE}) * {GROUP_COMMIT_SIZE} AS last_committed,
       op, seq_in_txn, i,
       CASE WHEN op = 'UPDATE' THEN (i * 31) % 1000 + 10000
            ELSE (i * 31) % 1000 END AS qty,
       CAST(((i * 37) % 9999999 + 1) // 100 AS VARCHAR) || '.' ||
           lpad(CAST(((i * 37) % 9999999 + 1) % 100 AS VARCHAR), 2, '0')
           AS amount,
       CASE WHEN op = 'UPDATE' THEN 'upd_' || CAST(i AS VARCHAR)
            ELSE 'n_' || CAST(i % 100 AS VARCHAR) END AS note
FROM ops
"""

BINLOG_TXN_SNAPSHOT_ORACLE = f"""
WITH committed AS (
    SELECT tid FROM (SELECT UNNEST(range({N_TXNS})) AS tid)
    WHERE tid % {ROLLBACK_MOD} <> 5 AND tid <> {TRUNCATED_TID}
),
live AS (
    SELECT tid, tid * 4 + k AS i
    FROM committed CROSS JOIN (SELECT UNNEST(range(3)) AS k)
    WHERE k < tid % 3 + 1
      AND NOT (tid % 4 = 3 AND k = 0)   -- DELETEd first row of those txns
)
SELECT i,
       CASE WHEN tid % 4 = 2 AND i = tid * 4
            THEN (i * 31) % 1000 + 10000
            ELSE (i * 31) % 1000 END AS qty,
       CAST(((i * 37) % 9999999 + 1) // 100 AS VARCHAR) || '.' ||
           lpad(CAST(((i * 37) % 9999999 + 1) % 100 AS VARCHAR), 2, '0')
           AS amount,
       CASE WHEN tid % 4 = 2 AND i = tid * 4
            THEN 'upd_' || CAST(i AS VARCHAR)
            ELSE 'n_' || CAST(i % 100 AS VARCHAR) END AS note
FROM live
"""

BINLOG_TXN_APPLY_GROUPS_ORACLE = f"""
WITH committed AS (
    SELECT tid FROM (SELECT UNNEST(range({N_TXNS})) AS tid)
    WHERE tid % {ROLLBACK_MOD} <> 5 AND tid <> {TRUNCATED_TID}
),
per_txn AS (
    SELECT tid,
           (tid // {GROUP_COMMIT_SIZE}) * {GROUP_COMMIT_SIZE}
               AS last_committed,
           tid + 1 AS seq_no,
           tid % 3 + 1
             + CASE WHEN tid % 4 IN (2, 3) THEN 1 ELSE 0 END AS n_images
    FROM committed
)
SELECT last_committed,
       COUNT(*) AS n_txns,
       CAST(MIN(seq_no) AS BIGINT) AS min_seq,
       CAST(MAX(seq_no) AS BIGINT) AS max_seq,
       CAST(SUM(n_images) AS BIGINT) AS n_images
FROM per_txn GROUP BY 1
"""


def committed_changes(spark: SparkSession,
                      compressed: bool = False) -> DataFrame:
    """The atomic, commit-consistent change stream: only images whose
    transaction reached XID; rolled-back and in-doubt groups never leak.
    ``compressed=True`` runs the identical pipeline over a
    binlog_transaction_compression=ON stream (type-40 zstd payloads) —
    same oracle, proving decompression is transparent."""
    assembled = assemble_transactions(
        generate_txn_segments(spark, compressed=compressed))
    return (assembled.where(F.col("status") == "committed")
            .select("gno", "xid", "seq_no", "last_committed", "op",
                    "seq_in_txn", "i", "qty", "amount", "note"))


def consistent_snapshot(spark: SparkSession) -> DataFrame:
    """Apply the committed stream in commit order (seq_no, then image
    order within the txn) -> final row state per PK. Latest-image-wins is
    the same max_by partial-agg shape as merge.merge_versioned: one
    shuffle on the PK, no sort."""
    changes = committed_changes(spark)
    # global image order: commits are totally ordered by seq_no; within a
    # txn by seq_in_txn. 2^20 bounds seq_in_txn far above any real txn.
    ordered = changes.withColumn(
        "ord", F.col("seq_no") * (1 << 20) + F.col("seq_in_txn"))
    last = (ordered.groupBy("i")
            .agg(F.max_by(F.struct("op", "qty", "amount", "note"),
                          "ord").alias("s")))
    return (last.where(F.col("s.op") != "DELETE")
            .select("i", "s.qty", "s.amount", "s.note"))


def apply_group_report(spark: SparkSession) -> DataFrame:
    """Group-commit intervals from the GTID logical clock: transactions
    sharing last_committed group-committed together on the primary and
    are conflict-free — the exact parallelism certificate MySQL MTS
    (slave_parallel_type=LOGICAL_CLOCK) schedules by. A downstream
    applier of this stream can replay each group concurrently and fence
    between groups."""
    changes = committed_changes(spark)
    per_txn = (changes.groupBy("gno", "last_committed", "seq_no")
               .agg(F.count("*").alias("n_images")))
    return (per_txn.groupBy("last_committed")
            .agg(F.count("*").alias("n_txns"),
                 F.min("seq_no").alias("min_seq"),
                 F.max("seq_no").alias("max_seq"),
                 F.sum("n_images").alias("n_images")))
