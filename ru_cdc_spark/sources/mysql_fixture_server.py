"""Server side of the MySQL wire protocol, for exercising the real
client over real TCP sockets without a MySQL install.

The reference's serve path assumes a live server on the other end of
the socket (``/root/reference/src/main.rs:73-130``); this module IS that
other end for tests and fixtures: it performs the HandshakeV10 /
HandshakeResponse41 / auth-switch exchange with real scramble
verification, answers the exact session-setup statements the reference
issues (``set @master_binlog_checksum`` main.rs:82-84, ``show master
status`` main.rs:86-90, ``desc db.table`` mysql.rs:185-199), and streams
a **virtual binlog** through COM_BINLOG_DUMP with correct per-event
``log_pos`` values and the network ``0x00`` OK prefix on every event
packet.

The virtual binlog's payload is the existing deterministic frame fixture
(``binlog_frames.cdc_frame_bytes``) — "what the socket would deliver"
stays defined once, so the socket-fed pipeline is hash-checked by the
SAME DuckDB oracle as the generator-fed one.

This is test infrastructure, not a MySQL re-implementation: one thread
per connection is plenty for local[32] task fan-in, and unknown
statements get an empty OK, the most forgiving server behavior.
"""

from __future__ import annotations

import re
import socket
import threading
import time
import uuid

from ru_cdc_spark.sources.mysql_client import (
    CLIENT_COMPRESS,
    CLIENT_SSL,
    CLIENT_ZSTD_COMPRESSION_ALGORITHM,
    COM_REGISTER_SLAVE,
    SERVER_CAPS,
    CompressedStream,
    ColDef,
    NATIVE_PASSWORD_PLUGIN,
    COM_BINLOG_DUMP,
    COM_BINLOG_DUMP_GTID,
    COM_STMT_CLOSE,
    COM_STMT_EXECUTE,
    COM_STMT_PREPARE,
    decode_com_binlog_dump_gtid,
    gtid_in_set,
    COM_PING,
    COM_QUERY,
    COM_QUIT,
    PacketIO,
    decode_com_binlog_dump,
    decode_handshake_response41,
    encode_auth_switch_request,
    encode_col_def,
    encode_err,
    encode_handshake_v10,
    encode_ok,
    encode_packet,
    encode_text_row,
    native_password_scramble,
    split_events,
    write_lenenc_int,
)
from ru_cdc_spark.sources.sha2_auth import CACHING_SHA2_PLUGIN

def _sid_uuid(sid: bytes) -> str:
    """16-byte server id -> the dashed uuid string real servers print."""
    h = sid.hex()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


_EVENT_NAMES = {2: "Query", 4: "Rotate", 15: "Format_desc", 16: "Xid",
                19: "Table_map", 27: "Heartbeat", 29: "Rows_query",
                30: "Write_rows", 31: "Update_rows", 32: "Delete_rows",
                33: "Gtid"}


def patch_log_pos(ev: bytes, log_pos: int) -> bytes:
    """Rewrite the header's end-position field (bytes 13:17)."""
    return ev[:13] + log_pos.to_bytes(4, "little") + ev[17:]


class VirtualBinlog:
    """A binlog file materialized as a position-indexed event list.

    Events are laid out at real byte positions (first event starts at
    pos 4, like an on-disk binlog after its magic); every header's
    ``log_pos`` holds the event's END position, which is what the
    server reports in SHOW MASTER STATUS / SHOW BINLOG EVENTS and what
    resume positions mean in COM_BINLOG_DUMP (position_manager.rs
    semantics)."""

    def __init__(self, filename: str = "binlog.000001",
                 crc32: bool = False) -> None:
        self.filename = filename
        self.crc32 = crc32  # MySQL 8's default binlog_checksum=CRC32
        self.events: list[tuple[int, int, bytes]] = []  # (start, end, bytes)
        self._pos = 4

    def append(self, ev: bytes) -> None:
        import zlib

        if self.crc32:
            # widen the declared size for the 4-byte trailer BEFORE
            # patching log_pos (the CRC covers the final header bytes)
            size = int.from_bytes(ev[9:13], "little") + 4
            ev = ev[:9] + size.to_bytes(4, "little") + ev[13:]
        start = self._pos
        end = start + len(ev) + (4 if self.crc32 else 0)
        ev = patch_log_pos(ev, end)
        if self.crc32:
            ev += zlib.crc32(ev).to_bytes(4, "little")
        self.events.append((start, end, ev))
        self._pos = end

    def append_blob(self, blob: bytes) -> None:
        for ev in split_events(blob):
            self.append(ev)

    @property
    def end_pos(self) -> int:
        return self._pos

    def events_from(self, pos: int) -> list[bytes]:
        return [ev for start, _, ev in self.events if start >= pos]

    def boundaries(self, event_type: int | None = None) -> list[int]:
        """Start positions (optionally of one event type) — safe dump
        resume points."""
        return [start for start, _, ev in self.events
                if event_type is None or ev[4] == event_type]

    @classmethod
    def from_cdc_fixture(cls, n_rows: int,
                         filename: str = "binlog.000001",
                         crc32: bool = False,
                         row_image: str = "FULL",
                         full_metadata: bool = False) -> "VirtualBinlog":
        """The standard CDC fixture stream as a positioned binlog:
        FORMAT_DESCRIPTION first (declaring NONE or CRC32 — MySQL 8's
        default is CRC32), then every frame's TABLE_MAP/ROWS events.
        ``row_image`` = MINIMAL or NOBLOB serves the SPARSE-image dump a
        server configured with that binlog_row_image writes (PK-only /
        changed-cols-only / blob-stripped images)."""
        from ru_cdc_spark.sources.binlog_frames import (
            ROWS_PER_EVENT,
            cdc_frame_bytes,
            sparse_cdc_frame_bytes,
        )
        from ru_cdc_spark.sources.binlog_wire import (
            CHECKSUM_CRC32,
            CHECKSUM_NONE,
            encode_format_description,
        )

        vb = cls(filename, crc32=crc32)
        vb.append(encode_format_description(
            CHECKSUM_CRC32 if crc32 else CHECKSUM_NONE))
        n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT
        for fid in range(n_frames):
            blob = cdc_frame_bytes(fid, n_rows, full_metadata) \
                if row_image == "FULL" \
                else sparse_cdc_frame_bytes(fid, n_rows, row_image)
            if blob is not None:
                vb.append_blob(blob)
        return vb

    @classmethod
    def from_txn_fixture(cls, n_txns: int,
                         filename: str = "binlog.000001",
                         compressed: bool = False) -> "VirtualBinlog":
        """The TRANSACTIONAL fixture stream (GTID/BEGIN/rows/XID or
        ROLLBACK, sources/binlog_txn.txn_event_bytes) as a positioned
        binlog — the stream GTID-aware dumps filter.
        ``compressed=True`` serves each complete transaction as GTID +
        TRANSACTION_PAYLOAD_EVENT (zstd), the
        binlog_transaction_compression=ON wire a MySQL 8.0.20+ server
        produces."""
        from ru_cdc_spark.sources.binlog_txn import txn_event_bytes
        from ru_cdc_spark.sources.binlog_wire import (
            CHECKSUM_NONE,
            encode_format_description,
        )

        vb = cls(filename)
        vb.append(encode_format_description(CHECKSUM_NONE))
        for tid in range(n_txns):
            vb.append_blob(txn_event_bytes(tid, compressed))
        return vb

    @classmethod
    def txn_chain(cls, n_txns: int, splits: list[int],
                  prefix: str = "binlog") -> list["VirtualBinlog"]:
        """The SAME transactional history as ``from_txn_fixture`` cut
        into multiple binlog files at the given txn-id boundaries —
        two servers built with different ``splits`` (and prefixes)
        carry identical GTID histories under different physical file
        layouts, the exact shape GTID auto-positioning failover exists
        for: (file, pos) from one server is meaningless on the other,
        the executed-GTID set is portable."""
        from ru_cdc_spark.sources.binlog_txn import txn_event_bytes
        from ru_cdc_spark.sources.binlog_wire import (
            CHECKSUM_NONE,
            encode_format_description,
        )

        bounds = [0, *splits, n_txns]
        chain = []
        for k in range(len(bounds) - 1):
            vb = cls(f"{prefix}.{k + 1:06d}")
            vb.append(encode_format_description(CHECKSUM_NONE))
            for tid in range(bounds[k], bounds[k + 1]):
                vb.append_blob(txn_event_bytes(tid))
            chain.append(vb)
        return chain


class LiveTable:
    """A mutable table whose DML appends REAL row events to the
    server's binlog — the moving target a DBLog-style incremental
    snapshot reads while changes keep flowing.

    Every ``insert``/``update``/``delete`` both mutates the in-memory
    row store (what SELECT serves) and appends a TABLE_MAP + ROWS
    event pair to the server's virtual binlog under the server lock,
    exactly the coupling a real server's storage engine + binlog give:
    SHOW MASTER STATUS positions taken before/after a SELECT bracket
    every change that could have raced it.

    The first column is the integer primary key."""

    def __init__(self, name: str, columns: list, server,
                 table_id: int = 901, schema: str = "app") -> None:
        self.name = name
        self.schema = schema
        self.columns = columns           # [(name, ColSpec)]
        self.specs = [s for _, s in columns]
        self.col_names = [n for n, _ in columns]
        self.server = server
        self.table_id = table_id
        self.rows: dict[int, tuple] = {}
        # text-protocol row payloads cached per (projection, pk): rows
        # are immutable between DMLs (which invalidate their pk), so a
        # chunked snapshot re-serving ranges pays the stringify +
        # lenenc encode once per row, not once per SELECT — the same
        # log-segment discipline as the binlog _framed cache. Python-
        # side cost matters because 25+ concurrent chunk SELECTs all
        # funnel through this one process's GIL.
        self._row_enc: dict[tuple, dict[int, bytes]] = {}

    # -- DML (each call = one binlog event pair) -------------------------

    def _emit(self, event_type: int, images: list) -> None:
        from ru_cdc_spark.sources.binlog_wire import (
            encode_rows_event,
            encode_table_map,
        )

        tm = encode_table_map(self.table_id, self.schema, self.name,
                              self.specs)
        ev = encode_rows_event(event_type, self.table_id, self.specs,
                               images)
        with self.server.mutation():
            self.server.binlog.append(tm)
            self.server.binlog.append(ev)

    def _invalidate(self, pk: int) -> None:
        for cache in self._row_enc.values():
            cache.pop(pk, None)

    def insert(self, *rows: tuple) -> None:
        from ru_cdc_spark.sources.binlog_wire import WRITE_ROWS_V2

        with self.server.mutation():
            for r in rows:
                self.rows[int(r[0])] = tuple(r)
                self._invalidate(int(r[0]))
            self._emit(WRITE_ROWS_V2, [tuple(r) for r in rows])

    def update(self, *rows: tuple) -> None:
        """Each row is the full AFTER image; the before image is the
        current stored row (row-based replication semantics)."""
        from ru_cdc_spark.sources.binlog_wire import UPDATE_ROWS_V2

        with self.server.mutation():
            pairs = []
            for r in rows:
                pk = int(r[0])
                pairs.append((self.rows[pk], tuple(r)))
                self.rows[pk] = tuple(r)
                self._invalidate(pk)
            self._emit(UPDATE_ROWS_V2, pairs)

    def delete(self, *pks: int) -> None:
        from ru_cdc_spark.sources.binlog_wire import DELETE_ROWS_V2

        with self.server.mutation():
            images = []
            for pk in pks:
                if int(pk) in self.rows:
                    images.append(self.rows.pop(int(pk)))
                    self._invalidate(int(pk))
            if images:
                self._emit(DELETE_ROWS_V2, images)

    # -- reads (SELECT serving) ------------------------------------------

    def text_payloads(self, idx: list[int],
                      lo: int | None = None,
                      hi: int | None = None) -> list[bytes]:
        """encode_text_row payloads for scan(lo, hi) under the given
        column projection, cached per pk (see _row_enc)."""
        from ru_cdc_spark.sources.mysql_client import encode_text_row

        key = tuple(idx)
        cache = self._row_enc.setdefault(key, {})
        out = []
        pks = sorted(k for k in self.rows
                     if (lo is None or k > lo) and (hi is None or k <= hi))
        for pk in pks:
            p = cache.get(pk)
            if p is None:
                r = self.rows[pk]
                p = cache[pk] = encode_text_row(
                    [None if r[i] is None else str(r[i]) for i in idx])
            out.append(p)
        return out

    def scan(self, lo: int | None = None, hi: int | None = None
             ) -> list[tuple]:
        out = [v for k, v in self.rows.items()
               if (lo is None or k > lo) and (hi is None or k <= hi)]
        out.sort(key=lambda r: int(r[0]))
        return out

    def desc_rows(self) -> list[list]:
        """DESC-shaped catalog rows (Field/Type/Null/Key triples)."""
        type_names = {3: "int", 8: "bigint", 15: "varchar(300)",
                      246: "decimal(12,4)"}
        return [(n, type_names.get(s.type_code, "text"),
                 "PRI" if i == 0 else "")
                for i, (n, s) in enumerate(self.columns)]


class MySQLFixtureServer:
    """Threaded TCP server speaking the MySQL server-side protocol.

    ``catalog`` maps ``db.table`` -> list of (name, type, key) tuples
    for DESC. Start with ``start()``; ``port`` is assigned by the OS.
    """

    def __init__(self, user: str = "repl", password: str = "replpass",
                 binlog: VirtualBinlog | None = None,
                 binlogs: list[VirtualBinlog] | None = None,
                 catalog: dict | None = None,
                 nonce: bytes | None = None,
                 host: str = "127.0.0.1",
                 die_after_events: int | None = None,
                 err_after_events: int | None = None,
                 stall_mid_dump_secs: float = 0.0,
                 default_auth: str = CACHING_SHA2_PLUGIN,
                 tls: bool = False,
                 tls_required: bool = False,
                 deny_desc: bool = False,
                 semi_sync: bool = False) -> None:
        # fault injection: hang up mid-dump after N event packets
        # WITHOUT the EOF terminator (the server-crash contract test)
        self.die_after_events = die_after_events
        # fault injection: after N event packets send a real ERR packet
        # (1236, like a server whose binlog was purged under the
        # reader) — clients must surface it as an error, never as a
        # clean end-of-stream
        self.err_after_events = err_after_events
        # privilege fence: reject DESC outright (a replication user
        # granted only REPLICATION SLAVE/CLIENT — the catalog-free
        # WL#4618 decode path must work against such a server)
        self.deny_desc = deny_desc
        # fault injection: send half the dump, go silent for N seconds,
        # then send the rest — models a contended/WAN master whose read
        # stalls exceed any client-side connect timeout (the round-5
        # driver-bench killer: a 10s connect deadline left armed on the
        # established socket converted one stall into a fatal 2013)
        self.stall_mid_dump_secs = stall_mid_dump_secs
        self.user = user
        self.password = password
        # MySQL 8's default is caching_sha2_password; pass
        # default_auth=NATIVE_PASSWORD_PLUGIN to model a 5.7-style
        # server (the only thing the reference client can talk to)
        self.default_auth = default_auth
        # tls=True: advertise CLIENT_SSL and upgrade on SSLRequest with
        # an in-repo self-signed certificate (functions/x509.py) —
        # clients VERIFY it via ``tls_ca_path()``
        self.tls = tls or tls_required
        # require-secure-transport: plaintext handshake responses are
        # rejected with ERR 3159, like a real server with
        # require_secure_transport=ON
        self.tls_required = tls_required
        self._tls_ctx = None
        self._tls_dir: str | None = None
        # the sha2 fast-auth cache: users who completed FULL auth once;
        # later connections take the scramble-only fast path
        self._sha2_cache: set[str] = set()
        self._rsa_key: tuple[int, int, int] | None = None
        self._rsa_lock = threading.Lock()
        # every COM_QUERY sql, in arrival order — lets tests assert
        # metadata-path cost (e.g. SHOW BINLOG EVENTS per trigger)
        self.command_log: list[str] = []
        # server ids that sent COM_REGISTER_SLAVE (SHOW SLAVE HOSTS)
        self.registered_slaves: set[int] = set()
        # rpl_semi_sync master side: when enabled AND the connection
        # registered via SET @rpl_semi_sync_slave = 1, every dumped
        # event carries the 0xEF semisync header and the master BLOCKS
        # on the replica's ACK after each flagged event (XID / stream
        # tail) — the AFTER_SYNC durability wait. ACKs land here as
        # (filename, log_pos); malformed ACKs count separately.
        self.semi_sync = semi_sync
        self.semi_sync_acks: list[tuple[str, int]] = []
        self.semi_sync_bad_acks = 0
        # multi-file log: a dump crossing a file boundary emits a ROTATE
        # event and continues into the next file (D12 over the socket)
        self.binlogs = binlogs or [binlog or VirtualBinlog()]
        self.binlog = self.binlogs[-1]  # SHOW MASTER STATUS = current tip
        self.catalog = catalog or {}
        self.nonce = nonce or bytes(range(1, 21))
        # per-instance @@server_uuid, regenerated on every construction —
        # layout caches key on it so a restarted server on a reused port
        # can never serve a stale listing
        self.server_uuid = uuid.uuid4().hex
        # live tables (incremental-snapshot fixtures): name -> LiveTable;
        # their DML appends to self.binlog under self._mu, and SELECTs
        # serve the current row store under the same lock, so master
        # positions bracket every racing change like a real server's
        self.tables: dict[str, LiveTable] = {}
        # test hook: called (table, lo, hi) under the lock BEFORE a
        # range SELECT's result set is built — scripted concurrent
        # writers interleave deterministically with chunk reads
        self.on_select = None
        self._mu = threading.RLock()
        # blocking (flags&1 == 0) dumps park here between appends; a
        # LiveTable DML notifies so live tails deliver without polling
        self._binlog_cv = threading.Condition(self._mu)
        # idle masters send HEARTBEAT(27) at this cadence so a blocked
        # replica can tell "no events" from "dead master"
        self.heartbeat_period_s = 0.2
        self.host = host
        self.port = 0
        self._sock: socket.socket | None = None
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()

    # -- live tables (incremental-snapshot fixture surface) ----------------

    def mutation(self):
        """Lock scope for anything that appends to the binlog or reads
        a master position: the framed-dump cache is dropped on exit so
        later dump connections see the appended events. Re-entrant —
        LiveTable DML nests it."""
        import contextlib

        @contextlib.contextmanager
        def scope():
            with self._mu:
                try:
                    yield self.binlog
                finally:
                    self._framed_cache = {}
                    self._binlog_cv.notify_all()
        return scope()

    def add_live_table(self, name: str, columns: list,
                       table_id: int | None = None) -> "LiveTable":
        if table_id is None:  # distinct per table, like a real server
            table_id = 901 + len(self.tables)
        t = LiveTable(name, columns, self, table_id=table_id)
        self.tables[name] = t
        # DESC works both bare and db-qualified (mysql.rs:185 sends
        # ``desc db.table``)
        self.catalog[name] = t.desc_rows()
        self.catalog[f"{t.schema}.{name}"] = t.desc_rows()
        return t

    _SELECT_RANGE = re.compile(
        r"select\s+(.+?)\s+from\s+([\w.]+)"
        r"(?:\s+where\s+(\w+)\s*>\s*(-?\d+)\s+and\s+\3\s*<=\s*(-?\d+))?"
        r"(?:\s+order\s+by\s+\w+)?$")
    # the keyset chunk-bound probe a density-adaptive snapshot planner
    # issues (Debezium incremental-snapshot form): the max pk of the
    # next N rows past a bound — index-only on a real server
    _SELECT_KEYSET = re.compile(
        r"select\s+max\((\w+)\)\s+from\s+\(select\s+\1\s+from\s+"
        r"([\w.]+)\s+where\s+\1\s*>\s*(-?\d+)\s+order\s+by\s+\1"
        r"\s+limit\s+(\d+)\)\s*\w*$")

    # wire ColSpec type codes -> binary-protocol result types (same
    # numbering space; VARCHAR is declared VAR_STRING in result sets)
    _BIN_TYPES = {15: 0xFD}

    def _select_compute(self, q: str, fire_hook: bool = True):
        """(names, TYPED rows, binary type codes) for a live-table
        SELECT, or None when the query doesn't target one. Shared by
        the text path (stringifies) and the prepared-statement path
        (binary rows keep the types)."""
        km = self._SELECT_KEYSET.match(q)
        if km:
            pk_col, target, lo_s, lim_s = km.groups()
            t = self.tables.get(target.split(".")[-1])
            if t is None:
                return None
            with self._mu:
                pks = sorted(k for k in t.rows if k > int(lo_s))
            nxt = pks[:int(lim_s)]
            return ([f"max({pk_col})"],
                    [[nxt[-1] if nxt else None]], [8])
        m = self._SELECT_RANGE.match(q)
        if not m:
            return None
        cols_sql, target, _pk, lo_s, hi_s = m.groups()
        t = self.tables.get(target.split(".")[-1])
        if t is None:
            return None
        lo = int(lo_s) if lo_s is not None else None
        hi = int(hi_s) if hi_s is not None else None
        with self._mu:
            if self.on_select is not None and lo_s is not None \
                    and fire_hook:
                # scripted concurrent writer: lands in the binlog
                # BEFORE the result set, i.e. inside the [low, high]
                # watermark window the client reads around this SELECT
                self.on_select(t.name, lo, hi)
            rows = t.scan(lo, hi)
        agg = re.match(r"min\((\w+)\)\s*,\s*max\(\1\)", cols_sql)
        if agg:
            pks = [int(r[0]) for r in rows]
            return ([f"min({agg.group(1)})", f"max({agg.group(1)})"],
                    [[min(pks) if pks else None,
                      max(pks) if pks else None]], [8, 8])
        if cols_sql.strip() == "*":
            names = t.col_names
        else:
            names = [c.strip() for c in cols_sql.split(",")]
        idx = [t.col_names.index(n) for n in names]
        out = [[r[i] for i in idx] for r in rows]
        types = [self._BIN_TYPES.get(t.specs[i].type_code,
                                     t.specs[i].type_code)
                 for i in idx]
        return names, out, types

    def _select(self, io: PacketIO, q: str) -> bool:
        """Serve SELECT over a live table: the chunk-range, MIN/MAX
        and keyset-probe forms an incremental snapshotter issues.
        Returns False if the query is not against a live table (caller
        falls through). Plain column-projection range reads serve
        PRE-ENCODED per-row payloads (LiveTable.text_payloads): chunked
        snapshots re-read ranges constantly and the per-row stringify +
        lenenc encode was the serving hot path under the GIL."""
        m = self._SELECT_RANGE.match(q)
        if m:
            cols_sql, target, _pk, lo_s, hi_s = m.groups()
            t = self.tables.get(target.split(".")[-1])
            if (t is not None and cols_sql.strip() != "*"
                    and "(" not in cols_sql):
                names = [c.strip() for c in cols_sql.split(",")]
                if all(n in t.col_names for n in names):
                    lo = int(lo_s) if lo_s is not None else None
                    hi = int(hi_s) if hi_s is not None else None
                    with self._mu:
                        if self.on_select is not None \
                                and lo_s is not None:
                            self.on_select(t.name, lo, hi)
                        payloads = t.text_payloads(
                            [t.col_names.index(n) for n in names],
                            lo, hi)
                    self._send_result_set(io, names, payloads,
                                          preencoded=True)
                    return True
        got = self._select_compute(q)
        if got is None:
            return False
        names, rows, _types = got
        self._send_result_set(
            io, names,
            [[None if v is None else str(v) for v in r] for r in rows])
        return True

    def _send_binary_result_set(self, io: PacketIO, names: list[str],
                                rows: list[list],
                                bin_types: list[int]) -> None:
        """Binary Protocol Resultset (DEPRECATE_EOF shape): count,
        typed col defs, binary rows (NULL bitmap offset 2), OK-as-EOF."""
        from ru_cdc_spark.sources.mysql_client import encode_binary_row

        seq = 1
        out = bytearray(encode_packet(seq, write_lenenc_int(len(names))))
        for name, ty in zip(names, bin_types):
            seq += 1
            out += encode_packet(seq, encode_col_def(
                ColDef(name=name, ty=ty)))
        for row in rows:
            seq += 1
            out += encode_packet(seq, encode_binary_row(row, bin_types))
        out += encode_packet(seq + 1, encode_ok(header=0xFE))
        io.sock.sendall(bytes(out))
        io.seq = (seq + 2) & 0xFF

    def _handle_stmt_prepare(self, io: PacketIO, sql: str,
                             stmts: dict) -> None:
        """COM_STMT_PREPARE: learn the result metadata by binding
        placeholder zeros (a real server resolves result columns at
        prepare time too) and register the statement template."""
        q = sql.strip().rstrip(";").lower()
        self.command_log.append(f"prepare:{q}")
        n_params = q.count("?")
        probe = q.replace("?", "0")
        # metadata-only: the scripted-writer hook must not fire here
        got = self._select_compute(probe, fire_hook=False)
        names, bin_types = (got[0], got[2]) if got else ([], [])
        stmt_id = len(stmts) + 1
        stmts[stmt_id] = (q, n_params)
        head = (b"\x00" + stmt_id.to_bytes(4, "little")
                + len(names).to_bytes(2, "little")
                + n_params.to_bytes(2, "little")
                + b"\x00" + (0).to_bytes(2, "little"))
        seq = 1
        out = bytearray(encode_packet(seq, head))
        for _ in range(n_params):
            seq += 1
            out += encode_packet(seq, encode_col_def(ColDef(name="?")))
        for name, ty in zip(names, bin_types):
            seq += 1
            out += encode_packet(seq, encode_col_def(
                ColDef(name=name, ty=ty)))
        io.sock.sendall(bytes(out))
        io.seq = (seq + 1) & 0xFF

    def _handle_stmt_execute(self, io: PacketIO, pkt: bytes,
                             stmts: dict) -> None:
        """COM_STMT_EXECUTE: decode the bound params (null bitmap +
        types-on-first-bind + binary values), substitute into the
        template, and serve a BINARY result set."""
        from ru_cdc_spark.sources.mysql_client import (
            decode_binary_value,
        )

        stmt_id = int.from_bytes(pkt[1:5], "little")
        if stmt_id not in stmts:
            io.write_packet(
                encode_err(1243, "Unknown prepared statement handler"),
                seq=1)
            return
        sql, n_params = stmts[stmt_id]
        params: list = []
        if n_params:
            off = 10  # cmd(1) + id(4) + flags(1) + iter(4)
            bm_len = (n_params + 7) // 8
            null_bm = pkt[off:off + bm_len]
            off += bm_len
            bound = pkt[off]
            off += 1
            if not bound:
                io.write_packet(
                    encode_err(1210, "parameters not bound"), seq=1)
                return
            ptypes = [pkt[off + 2 * i] for i in range(n_params)]
            off += 2 * n_params
            for i in range(n_params):
                if null_bm[i // 8] & (1 << (i % 8)):
                    params.append(None)
                    continue
                v, off = decode_binary_value(ptypes[i], pkt, off)
                params.append(v)
        parts = sql.split("?")
        concrete = parts[0]
        for part, v in zip(parts[1:], params):
            concrete += ("null" if v is None else str(v)) + part
        self.command_log.append(concrete)
        got = self._select_compute(concrete)
        if got is None:
            io.write_packet(encode_ok(), seq=1)
            return
        names, rows, bin_types = got
        self._send_binary_result_set(io, names, rows, bin_types)

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "MySQLFixtureServer":
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, 0))
        self.port = self._sock.getsockname()[1]
        self._sock.listen(64)
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass

    def __enter__(self) -> "MySQLFixtureServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def _accept_loop(self) -> None:
        assert self._sock is not None
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            # daemon per-connection threads; deliberately NOT tracked —
            # a long-lived server would otherwise grow the list forever
            threading.Thread(target=self._serve_conn, args=(conn,),
                             daemon=True).start()

    # -- per-connection protocol -------------------------------------------

    def _serve_conn(self, conn: socket.socket) -> None:
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        io = PacketIO(conn)
        try:
            if not self._handshake(io):
                return
            stmts: dict[int, tuple[str, int]] = {}  # per-connection
            # compressed framing (zlib --compress / 8.0.18+ zstd)
            # starts with the first post-auth command, exactly when the
            # client switches; handshake+auth stay uncompressed
            ccaps = getattr(io, "client_caps", 0)
            if ccaps & CLIENT_ZSTD_COMPRESSION_ALGORITHM:
                io.sock = CompressedStream(io.sock, "zstd")
            elif ccaps & CLIENT_COMPRESS:
                io.sock = CompressedStream(io.sock, "zlib")
            while not self._stop.is_set():
                io.reset_seq()
                try:
                    pkt = io.read_packet()
                except (ConnectionError, OSError):
                    return
                if not pkt:
                    return
                cmd = pkt[0]
                if cmd == COM_QUIT:
                    return
                if cmd == COM_PING:
                    io.write_packet(encode_ok(), seq=1)
                elif cmd == COM_REGISTER_SLAVE:
                    # record the replica (SHOW SLAVE HOSTS material)
                    sid = int.from_bytes(pkt[1:5], "little")
                    self.registered_slaves.add(sid)
                    io.write_packet(encode_ok(), seq=1)
                elif cmd == COM_QUERY:
                    self._handle_query(io, pkt[1:].decode("utf-8", "replace"))
                elif cmd == COM_STMT_PREPARE:
                    self._handle_stmt_prepare(
                        io, pkt[1:].decode("utf-8", "replace"), stmts)
                elif cmd == COM_STMT_EXECUTE:
                    self._handle_stmt_execute(io, pkt, stmts)
                elif cmd == COM_STMT_CLOSE:
                    stmts.pop(int.from_bytes(pkt[1:5], "little"), None)
                    # no response — the published fire-and-forget rule
                elif cmd == COM_BINLOG_DUMP:
                    self._handle_dump(io, pkt)
                elif cmd == COM_BINLOG_DUMP_GTID:
                    self._handle_dump_gtid(io, pkt)
                else:
                    io.write_packet(
                        encode_err(1047, f"unknown command 0x{cmd:02x}"),
                        seq=1)
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _rsa(self) -> tuple[int, int, int]:
        """Lazily generated per-server RSA keypair for the sha2 full
        auth exchange (a real server reads its from disk)."""
        from ru_cdc_spark.sources.sha2_auth import generate_rsa_keypair

        with self._rsa_lock:
            if self._rsa_key is None:
                self._rsa_key = generate_rsa_keypair(1024)
            return self._rsa_key

    def _deny(self, io: PacketIO, user: str) -> bool:
        io.write_packet(encode_err(
            1045, f"Access denied for user '{user}'", "28000"))
        return False

    def tls_ca_path(self) -> str:
        """The CA bundle (our self-signed cert) a verifying client
        loads; also lazily builds the server context."""
        import ssl as _ssl
        import tempfile

        with self._rsa_lock:  # keygen takes seconds; racers must wait
            if self._tls_dir is None:
                tls_dir = tempfile.mkdtemp(prefix="mysql_tls_")
                from ru_cdc_spark.functions.x509 import (
                    write_tls_materials,
                )

                cert, key = write_tls_materials(tls_dir, cn="localhost")
                ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
                ctx.load_cert_chain(cert, key)
                self._tls_ctx = ctx
                self._cert_path = cert
                self._tls_dir = tls_dir  # publish LAST
            return self._cert_path

    def _handshake(self, io: PacketIO) -> bool:
        caps = SERVER_CAPS | (CLIENT_SSL if self.tls else 0)
        io.write_packet(
            encode_handshake_v10("8.0.0-fixture", 7, self.nonce,
                                 caps=caps,
                                 plugin=self.default_auth), seq=0)
        first = io.read_packet(exact=self.tls)
        if self.tls and len(first) == 32:
            client_caps = int.from_bytes(first[:4], "little")
            if client_caps & CLIENT_SSL:
                # SSLRequest: upgrade in place; packet seq continues
                self.tls_ca_path()
                assert not io.unconsumed(), \
                    "overread across the TLS boundary"
                io.sock = self._tls_ctx.wrap_socket(io.sock,
                                                    server_side=True)
                first = io.read_packet()
        elif self.tls_required:
            io.write_packet(encode_err(
                3159, "Connections using insecure transport are "
                      "prohibited while --require_secure_transport=ON.",
                "HY000"))
            return False
        resp = decode_handshake_response41(first)
        io.client_caps = resp.caps  # read post-auth for compression
        auth = resp.auth_resp
        # clients whose plugin differs from the server default, or that
        # sent no auth data (the reference does — it puts the password
        # in the plugin-name field, mysql.rs:66), get the AuthSwitch
        # path to the DEFAULT plugin, like a real server would
        if resp.plugin != self.default_auth or not auth:
            io.write_packet(encode_auth_switch_request(
                self.default_auth, self.nonce))
            auth = io.read_packet()
        if resp.user != self.user:
            return self._deny(io, resp.user)
        if self.default_auth == CACHING_SHA2_PLUGIN:
            return self._sha2_auth(io, resp.user, auth)
        expected = native_password_scramble(self.password.encode(),
                                            self.nonce)
        if auth != expected:
            return self._deny(io, resp.user)
        io.write_packet(encode_ok())
        return True

    def _sha2_auth(self, io: PacketIO, user: str, auth: bytes) -> bool:
        """caching_sha2_password server flow: verify the scramble; a
        cache hit answers fast-auth-success (0x01 0x03) + OK, a miss
        demands full authentication (0x01 0x04) — the client asks for
        the RSA public key (0x02), gets it PEM-framed behind 0x01, and
        sends RSA-OAEP(password NUL XOR nonce). Success populates the
        cache, so the next connection for this user fast-auths — both
        paths exercised in every multi-connection test by nature."""
        from ru_cdc_spark.sources.sha2_auth import (
            FAST_AUTH_SUCCESS,
            PERFORM_FULL_AUTHENTICATION,
            REQUEST_PUBLIC_KEY,
            encode_public_key_pem,
            oaep_decrypt,
            sha2_scramble,
            xor_password_nonce,
        )

        expected = sha2_scramble(self.password.encode(), self.nonce)
        if auth != expected:
            return self._deny(io, user)
        if user in self._sha2_cache:
            io.write_packet(bytes([1, FAST_AUTH_SUCCESS]))
            io.write_packet(encode_ok())
            return True
        io.write_packet(bytes([1, PERFORM_FULL_AUTHENTICATION]))
        req = io.read_packet()
        import ssl as _ssl

        if isinstance(io.sock, _ssl.SSLSocket) and \
                req[:1] != bytes([REQUEST_PUBLIC_KEY]):
            # TLS cleartext fast path: NUL-terminated password inside
            # the encrypted channel (libmysqlclient's behavior)
            if req.rstrip(b"\x00") == self.password.encode():
                self._sha2_cache.add(user)
                io.write_packet(encode_ok())
                return True
            return self._deny(io, user)
        if not req or req[0] != REQUEST_PUBLIC_KEY:
            return self._deny(io, user)
        n, e, d = self._rsa()
        io.write_packet(b"\x01" + encode_public_key_pem(n, e))
        blob = io.read_packet()
        try:
            plain = oaep_decrypt(n, d, blob)
        except ValueError:
            return self._deny(io, user)
        if plain != xor_password_nonce(self.password.encode(),
                                       self.nonce):
            return self._deny(io, user)
        self._sha2_cache.add(user)
        io.write_packet(encode_ok())
        return True

    # -- COM_QUERY dispatch ------------------------------------------------

    def _send_result_set(self, io: PacketIO, cols: list[str],
                         rows: list[list],
                         preencoded: bool = False) -> None:
        """DEPRECATE_EOF shape: count, defs, rows, OK-as-EOF (the framing
        the reference's read_text_result_set expects, mysql.rs:140-178).
        ``preencoded`` rows are ready encode_text_row payloads (the
        LiveTable per-pk cache) and only get packet-framed here."""
        # one buffered sendall for the whole result set: a per-row
        # write_packet is a syscall per row, and a 16k-row SHOW BINLOG
        # EVENTS listing then costs more wall time in socket dribble
        # than the entire 16-slice binlog dump it plans
        seq = 1
        out = bytearray(encode_packet(seq, write_lenenc_int(len(cols))))
        for c in cols:
            seq += 1
            out += encode_packet(seq, encode_col_def(ColDef(name=c)))
        for row in rows:
            seq += 1
            out += encode_packet(seq,
                                 row if preencoded
                                 else encode_text_row(row))
        out += encode_packet(seq + 1, encode_ok(header=0xFE))
        io.sock.sendall(bytes(out))
        io.seq = (seq + 2) & 0xFF

    def _handle_query(self, io: PacketIO, sql: str) -> None:
        q = sql.strip().rstrip(";").lower()
        self.command_log.append(q)
        if q.startswith("set "):
            squeezed = q.replace(" ", "")
            if ("rpl_semi_sync_slave" in squeezed
                    and squeezed.endswith("=1")):
                # per-connection semisync registration (the real
                # master reads this session var before the dump);
                # whitespace-insensitive: 'slave=1' and 'slave = 1'
                # are the same statement
                io.semi_sync = True
            io.write_packet(encode_ok(), seq=1)
        elif q == "select @@global.rpl_semi_sync_master_enabled":
            self._send_result_set(
                io, ["@@global.rpl_semi_sync_master_enabled"],
                [["1" if self.semi_sync else "0"]])
        elif q == "show master status":
            with self._mu:
                # under the live-table lock: a position can never land
                # between a TABLE_MAP and its ROWS event
                tip = [[self.binlog.filename, str(self.binlog.end_pos),
                        "", ""]]
            self._send_result_set(
                io,
                ["File", "Position", "Binlog_Do_DB", "Binlog_Ignore_DB"],
                tip)
        elif q.startswith("show binlog events"):
            # pass the ORIGINAL sql: binlog filenames are case-sensitive
            # and the lowercased q would miss mixed-case names
            self._show_binlog_events(io, sql.strip().rstrip(";"))
        elif q == "show binary logs":
            self._send_result_set(
                io, ["Log_name", "File_size"],
                [[b.filename, str(b.end_pos)] for b in self.binlogs])
        elif q.startswith("desc "):
            if self.deny_desc:
                io.write_packet(encode_err(
                    1142, "SELECT command denied to user 'repl' for "
                          f"table '{q[5:].strip()}'", "42000"), seq=1)
            else:
                self._desc(io, q[5:].strip())
        elif q == "select @@global.binlog_checksum":
            self._send_result_set(io, ["@@global.binlog_checksum"],
                                  [["NONE"]])
        elif q == "select @@server_uuid":
            self._send_result_set(io, ["@@server_uuid"],
                                  [[self.server_uuid]])
        elif (q.startswith("select ") and " from " in q
                and self._select(io, q)):
            pass
        else:
            io.write_packet(encode_ok(), seq=1)

    def _show_binlog_events(self, io: PacketIO, q: str) -> None:
        m = re.search(r"in\s+'([^']+)'", q, re.IGNORECASE)
        vb = self.binlog
        if m:
            vb = next((b for b in self.binlogs
                       if b.filename == m.group(1)), self.binlog)
        m = re.search(r"from\s+(\d+)", q, re.IGNORECASE)
        from_pos = int(m.group(1)) if m else 4
        m = re.search(r"limit\s+(\d+)", q, re.IGNORECASE)
        limit = int(m.group(1)) if m else len(vb.events)
        rows = []
        for start, end, ev in vb.events:
            if start < from_pos or len(rows) >= limit:
                continue
            etype = ev[4]
            info = ""
            if etype == 33:
                # real servers print the txn's GTID here — the Info a
                # GTID-tracking planner parses (gtid offsets / failover)
                from ru_cdc_spark.sources.binlog_wire import decode_gtid

                g = decode_gtid(ev)
                info = ("SET @@SESSION.GTID_NEXT= "
                        f"'{_sid_uuid(g['sid'])}:{g['gno']}'")
            rows.append([vb.filename, str(start),
                         _EVENT_NAMES.get(etype, str(etype)), "1",
                         str(end), info])
        self._send_result_set(
            io, ["Log_name", "Pos", "Event_type", "Server_id",
                 "End_log_pos", "Info"], rows)

    def _desc(self, io: PacketIO, target: str) -> None:
        cols = self.catalog.get(target)
        if cols is None:
            io.write_packet(
                encode_err(1146, f"Table '{target}' doesn't exist", "42S02"),
                seq=1)
            return
        rows = [[name, ftype, "YES" if key != "PRI" else "NO", key, None, ""]
                for name, ftype, key in cols]
        self._send_result_set(
            io, ["Field", "Type", "Null", "Key", "Default", "Extra"], rows)

    # -- COM_BINLOG_DUMP ---------------------------------------------------

    def _handle_dump(self, io: PacketIO, pkt: bytes) -> None:
        pos, flags, _server_id, filename = decode_com_binlog_dump(pkt)
        names = [b.filename for b in self.binlogs]
        start_idx = names.index(filename) if filename in names else None
        if filename and start_idx is None:
            io.write_packet(
                encode_err(1236, f"Could not find first log file name "
                                 f"'{filename}'"), seq=1)
            return
        if start_idx is None:
            start_idx = 0
        if self.die_after_events is not None:
            # crash injection: stream exactly N events, then hang up
            # with NO EOF packet — the client must treat this as a
            # failure, not end-of-stream
            from ru_cdc_spark.sources.mysql_client import encode_packet

            out = bytearray()
            seq = 1
            for start, _end, ev in self.binlogs[start_idx].events:
                if start < pos:
                    continue
                if (len(out) and seq > self.die_after_events):
                    break
                out += encode_packet(seq, b"\x00" + ev)
                seq += 1
            try:
                io.sock.sendall(bytes(out))
            finally:
                io.sock.close()
            return
        if self.err_after_events is not None:
            # purge injection: N real events, then ERR 1236 mid-stream
            from ru_cdc_spark.sources.mysql_client import encode_packet

            out = bytearray()
            seq = 1
            for start, _end, ev in self.binlogs[start_idx].events:
                if start < pos or seq > self.err_after_events:
                    continue
                out += encode_packet(seq, b"\x00" + ev)
                seq += 1
            out += encode_packet(
                seq, encode_err(
                    1236, "Could not find first log file name in binary "
                          "log index file"))
            try:
                io.sock.sendall(bytes(out))
            except (ConnectionError, OSError):
                pass
            return
        if self.semi_sync and getattr(io, "semi_sync", False):
            self._handle_dump_semisync(io, start_idx, pos)
            return
        blocking = (flags & 1) == 0  # real replica default: no
        #                              BINLOG_DUMP_NON_BLOCK bit
        with self._mu:
            out = bytearray()
            for part in self._dump_parts(
                    start_idx, pos, eof=not blocking):
                out += part
            sent_end = self.binlog.end_pos
        try:
            # one buffered sendall: the event stream leaves in TCP-sized
            # writes instead of one syscall per tiny packet
            if self.stall_mid_dump_secs:
                half = len(out) // 2
                io.sock.sendall(bytes(out[:half]))
                time.sleep(self.stall_mid_dump_secs)
                io.sock.sendall(bytes(out[half:]))
            else:
                io.sock.sendall(bytes(out))
        except (ConnectionError, OSError):
            # slice readers hang up once their [lo, hi) range is
            # satisfied — a client disconnect mid-dump is normal
            return
        if blocking:
            # the live tail a real replica runs: BLOCK at the log end,
            # stream every appended event as it lands, heartbeat(27)
            # through idle stretches — never an EOF packet
            self._tail_dump(io, sent_end)

    def _tail_dump(self, io: PacketIO, sent_end: int) -> None:
        import zlib

        from ru_cdc_spark.sources.binlog_wire import encode_heartbeat
        from ru_cdc_spark.sources.mysql_client import encode_packet

        # events are append-only and position-ordered: track an INDEX
        # into tip.events instead of rescanning the whole list per
        # wakeup (a busy long-lived tail would otherwise do O(E^2)
        # total filtering work under the server lock)
        idx = None
        last_tip = None
        while not self._stop.is_set():
            with self._binlog_cv:
                tip = self.binlog
                if tip is not last_tip:
                    # first pass (or a tip swap): locate the resume
                    # point once, then advance incrementally
                    idx = sum(1 for s, _e, _ev in tip.events
                              if s < sent_end)
                    last_tip = tip
                new = tip.events[idx:]
                if not new:
                    self._binlog_cv.wait(
                        timeout=self.heartbeat_period_s)
                    new = tip.events[idx:]
                idx += len(new)
                name, crc = tip.filename, tip.crc32
            try:
                if new:
                    buf = bytearray()
                    for _s, e, ev in new:
                        buf += encode_packet(0, b"\x00" + ev)
                        sent_end = e
                    io.sock.sendall(bytes(buf))
                else:
                    hb = encode_heartbeat(name, log_pos=sent_end)
                    if crc:  # checksummed streams checksum heartbeats
                        size = int.from_bytes(hb[9:13], "little") + 4
                        hb = (hb[:9] + size.to_bytes(4, "little")
                              + hb[13:])
                        hb += zlib.crc32(hb).to_bytes(4, "little")
                    io.sock.sendall(encode_packet(0, b"\x00" + hb))
            except (ConnectionError, OSError):
                return  # replica hung up — a normal tail end

    def _handle_dump_semisync(self, io: PacketIO, start_idx: int,
                              pos: int) -> None:
        """rpl_semi_sync master side: every event packet is
        ``0x00 0xEF <need_ack> <event>``; after each flagged event
        (XID commit boundary, or the stream tail) the master BLOCKS
        reading the replica's ACK — 0xEF + u64 log_pos + filename —
        before sending more, exactly the AFTER_SYNC wait. ACKs are
        recorded so tests assert the replica acked every flagged
        event. Event-at-a-time (no framed-blob cache): semisync
        framing is per-connection and the wait is the point."""
        from ru_cdc_spark.sources.binlog_wire import encode_rotate
        from ru_cdc_spark.sources.mysql_client import encode_packet

        XID_EVENT, FDE_EVENT = 16, 15
        seq = 1

        def send(ev: bytes, need_ack: int) -> None:
            nonlocal seq
            io.sock.sendall(encode_packet(
                seq, b"\x00\xef" + bytes([need_ack]) + ev))
            seq = (seq + 1) & 0xFF
            if need_ack:
                ack = io.read_packet()
                if not ack:
                    # replica hung up instead of acking (slice readers
                    # stop at their range bound) — end of dump, not a
                    # protocol violation
                    raise ConnectionResetError("replica hangup")
                if ack[0] == 0xEF and len(ack) >= 9:
                    self.semi_sync_acks.append(
                        (ack[9:].decode("utf-8", "replace"),
                         int.from_bytes(ack[1:9], "little")))
                elif ack == b"\x01":
                    # a lone COM_QUIT instead of an ACK is a clean
                    # replica goodbye (a client closing mid-dump), not
                    # a malformed ACK — end the dump like a hangup
                    raise ConnectionResetError("replica quit")
                else:
                    self.semi_sync_bad_acks += 1

        with self._mu:
            events: list[bytes] = []
            # artificial rotate naming the start file (never flagged)
            events.append(encode_rotate(
                self.binlogs[start_idx].filename, position=pos))
            for idx in range(start_idx, len(self.binlogs)):
                vb = self.binlogs[idx]
                from_pos = pos if idx == start_idx else 4
                evs = [ev for s, _e, ev in vb.events if s >= from_pos]
                if evs and evs[0][4] != FDE_EVENT:
                    fde = next((ev for _, _, ev in vb.events
                                if ev[4] == FDE_EVENT), None)
                    if fde is not None:
                        evs.insert(0, fde)
                events.extend(evs)
                if idx + 1 < len(self.binlogs):
                    # genuine inter-file ROTATE — shared with
                    # _dump_parts so the semisync stream stays
                    # byte-identical to a plain dump
                    events.append(self._boundary_rotate(idx))
        try:
            for k, ev in enumerate(events):
                need = 1 if (ev[4] == XID_EVENT
                             or k == len(events) - 1) else 0
                send(ev, need)
            io.sock.sendall(encode_packet(0, b"\xfe\x00\x00\x02\x00"))
        except (ConnectionError, OSError):
            return

    def _boundary_rotate(self, idx: int) -> bytes:
        """The GENUINE file-boundary ROTATE event (D12) announcing
        binlogs[idx + 1] — real timestamp + log_pos, like the rotate a
        server logs at the physical end of each binlog file. ONE
        implementation for both the plain (_dump_parts) and semisync
        dump paths: their streams must stay byte-identical."""
        from ru_cdc_spark.sources.binlog_wire import encode_rotate

        file_end = max((e for _, e, _ in self.binlogs[idx].events),
                       default=4)
        ev = encode_rotate(self.binlogs[idx + 1].filename,
                           log_pos=file_end, timestamp=1)
        if self.binlogs[idx].crc32:
            # binlog_checksum=CRC32 covers the boundary rotate too —
            # a real server checksums EVERY logged event, and clients
            # that learned checksum_bytes from the FDE strip 4 bytes
            # off the rotate's trailing filename accordingly
            import zlib

            size = int.from_bytes(ev[9:13], "little") + 4
            ev = ev[:9] + size.to_bytes(4, "little") + ev[13:]
            ev += zlib.crc32(ev).to_bytes(4, "little")
        return ev

    def _framed(self, idx: int) -> tuple[bytes, list[tuple[int, int]]]:
        """Packet-framed byte stream of file ``idx``, cached: serving a
        dump becomes a byte-slice + sendall instead of re-framing every
        event per connection (16 slice readers × a 20k-row log was
        Python-loop-bound). Sequence ids are assigned at cache build —
        a dump starting mid-file begins at that event's cached seq,
        which MySQL clients (including ours) follow rather than check."""
        from ru_cdc_spark.sources.mysql_client import encode_packet

        with self._mu:
            # under the live-table lock: a concurrent LiveTable append
            # invalidates the cache, and the rebuild below must not
            # read the events list mid-append
            cache = getattr(self, "_framed_cache", None)
            if cache is None:
                cache = self._framed_cache = {}
            if idx not in cache:
                vb = self.binlogs[idx]
                blob = bytearray()
                index: list[tuple[int, int]] = []  # (start pos, offset)
                seq = 1
                for start, _end, ev in vb.events:
                    index.append((start, len(blob)))
                    blob += encode_packet(seq, b"\x00" + ev)
                    seq = (seq + 1) & 0xFF
                cache[idx] = (bytes(blob), index)
            return cache[idx]

    def _handle_dump_gtid(self, io: PacketIO, pkt: bytes) -> None:
        """COM_BINLOG_DUMP_GTID: stream every transaction whose GTID is
        NOT in the client's executed set (auto-positioning — the server
        owns the scan position, the client owns the executed set). The
        skip state machine mirrors a real server's: a GTID event toggles
        skipping for its whole transaction group until the next GTID.
        Like a real dump reply, the stream opens with an artificial
        ROTATE naming the starting file, replays each file's FDE, and
        emits a genuine ROTATE at every file boundary — so a client can
        learn (file, pos) coordinates from an auto-positioned dump (the
        failover repositioning probe relies on this)."""
        from ru_cdc_spark.sources.binlog_wire import (
            decode_gtid,
            encode_rotate,
        )

        _flags, _sid_srv, filename, pos, executed = \
            decode_com_binlog_dump_gtid(pkt)
        names = [b.filename for b in self.binlogs]
        start_idx = names.index(filename) if filename in names else 0
        from ru_cdc_spark.sources.mysql_client import encode_packet

        out = bytearray()
        seq = 1

        def emit(ev: bytes) -> None:
            nonlocal seq
            out.extend(encode_packet(seq, b"\x00" + ev))
            seq = (seq + 1) & 0xFF

        emit(encode_rotate(self.binlogs[start_idx].filename,
                           position=4))
        skipping = False
        for idx in range(start_idx, len(self.binlogs)):
            vb = self.binlogs[idx]
            if idx > start_idx:
                # genuine rotate at the physical file boundary (D12) —
                # the SHARED builder so checksummed chains carry the
                # CRC32 trailer here too (a checksum-aware client
                # strips 4 bytes off every rotate after the FDE)
                emit(self._boundary_rotate(idx - 1))
            for start, _end, ev in vb.events:
                etype = ev[4]
                if etype == 33:  # GTID: decide this transaction's fate
                    g = decode_gtid(ev)
                    skipping = gtid_in_set(executed, g["sid"], g["gno"])
                elif etype == 15:
                    skipping = False  # control events always stream
                if skipping and etype != 15:
                    continue
                emit(ev)
        out += encode_packet(seq, b"\xfe\x00\x00\x02\x00")
        try:
            io.sock.sendall(bytes(out))
        except (ConnectionError, OSError):
            return

    def _dump_parts(self, start_idx: int, pos: int, eof: bool = True):
        from ru_cdc_spark.sources.mysql_client import encode_packet
        from ru_cdc_spark.sources.binlog_wire import encode_rotate

        # a real server prefixes EVERY dump reply with an artificial
        # ROTATE (timestamp 0, log_pos 0) naming the starting file —
        # clients must skip it, not treat it as a file boundary
        yield encode_packet(
            1, b"\x00" + encode_rotate(self.binlogs[start_idx].filename,
                                       position=pos))
        for idx in range(start_idx, len(self.binlogs)):
            blob, index = self._framed(idx)
            from_pos = pos if idx == start_idx else 4
            offset = next((off for start, off in index
                           if start >= from_pos), len(blob))
            if offset > 0:
                # a real dump replays the FDE first regardless of start
                # pos so the client can configure its decoder
                fde = next((ev for _, _, ev in self.binlogs[idx].events
                            if ev[4] == 15), None)
                if fde is not None:
                    yield encode_packet(1, b"\x00" + fde)
            yield blob[offset:]
            if idx + 1 < len(self.binlogs):
                yield encode_packet(0,
                                    b"\x00" + self._boundary_rotate(idx))
        # non-block dumps end with EOF at the log tail; blocking dumps
        # (eof=False) flow into the live tail loop instead
        if eof:
            yield encode_packet(0, b"\xfe\x00\x00\x02\x00")
