"""DBLog-style incremental snapshot: chunked PK-range reads
interleaved with the live binlog, deduplicated per chunk by low/high
watermarks.

The reference has no initial-snapshot support at all — it subscribes at
the current master position (``/root/reference/src/main.rs:86-130``)
and only ever sees rows that change afterwards; bootstrapping existing
table contents requires stopping writes. This module implements the
public DBLog algorithm (Andreakis & Papapanagiotou, "DBLog: A
Watermark Based Change-Data-Capture Framework", Netflix 2019 —
Debezium's incremental snapshots are the production deployment of the
same idea), in the read-only variant: the low/high watermarks are SHOW
MASTER STATUS positions read around each chunk SELECT instead of
writes to a signal table.

Per chunk (pk-range ``(lo, hi]``):

1. read the master position -> low watermark L
2. ``SELECT`` the chunk rows
3. read the master position -> high watermark H
4. dump the binlog window [L, H]; any pk in ``(lo, hi]`` touched there
   is dropped from the chunk (its SELECT-time value raced a write and
   is ambiguous; the change stream replays the authoritative image)
5. emit the surviving rows versioned at L

Merging the emitted rows with the change stream from the global
snapshot-start position by (pk, position) latest-wins converges to the
consistent final state REGARDLESS of how chunk reads interleave with
writes: a change event always outranks any snapshot row it could have
raced (the snapshot row's version is its chunk's L, strictly below the
event's end position), and a later chunk's row that already reflects
an event carries the same value the event replays.

Scale: each chunk is one executor task dialing its own SELECT and
window-dump connections; the driver plans ranges from two scalars
(MIN/MAX pk) and never sees a row. Chunk size bounds per-task memory
and per-query source impact; chunks are idempotent (a re-run re-emits
the same rows at a fresh L and the merge is versioned), so a resumable
runner checkpoints only the chunk index. The change-stream leg reuses
the engine's sliced socket reader and the merge is the engine's
standard single PK shuffle — a 10 TB table bootstraps at the source
database's read bandwidth while the pipeline keeps streaming.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ru_cdc_spark.sources.mysql_socket_source import (
    _dump_events,
    _dump_frames,
    fetch_binlog_layout,
    slice_at_table_maps,
)

# WRITE/UPDATE/DELETE_ROWS_v2 + PARTIAL_UPDATE_ROWS (39 — decoded by
# decode_rows_event into UPDATE-shaped pairs with JSON diffs applied)
_ROWS_EVENT_TYPES = (30, 31, 32, 39)


@dataclass
class SnapshotPlan:
    """Driver-side plan: column order (DESC order = binlog image
    order), the pk column, the chunk pk-ranges, and the global
    snapshot-start position the change stream resumes from.
    ``types`` are the DESC type strings (drive the synthetic
    WRITE_ROWS encode in the streaming bootstrap)."""

    table: str
    columns: list[str]
    pk: str
    ranges: list[tuple[int, int]]
    start_file: str
    start_pos: int
    types: list[str] | None = None


def colspec_from_mysql_type(t: str):
    """DESC type string -> wire ColSpec, for re-encoding snapshot rows
    as synthetic WRITE_ROWS events (Debezium's 'READ' records ride the
    same envelope as real inserts; here they ride the same WIRE)."""
    import re as _re

    from ru_cdc_spark.sources.binlog_wire import (
        ColSpec,
        T_LONG,
        T_LONGLONG,
        T_NEWDECIMAL,
        T_VARCHAR,
    )

    t = t.strip().lower()
    if t.startswith("bigint"):
        return ColSpec(T_LONGLONG)
    if t.startswith("int"):
        return ColSpec(T_LONG)
    m = _re.match(r"varchar\((\d+)\)", t)
    if m:
        return ColSpec(T_VARCHAR, (int(m.group(1)),))
    m = _re.match(r"decimal\((\d+),(\d+)\)", t)
    if m:
        return ColSpec(T_NEWDECIMAL, (int(m.group(1)), int(m.group(2))))
    raise ValueError(f"no wire mapping for mysql type {t!r}")


def text_to_typed(v: str | None, spec):
    """MySQL text-protocol string -> the Python value encode_value
    expects for this spec."""
    from decimal import Decimal

    from ru_cdc_spark.sources.binlog_wire import (
        T_LONG,
        T_LONGLONG,
        T_NEWDECIMAL,
    )

    if v is None:
        return None
    if spec.type_code in (T_LONG, T_LONGLONG):
        return int(v)
    if spec.type_code == T_NEWDECIMAL:
        return Decimal(v)
    return v


def plan_snapshot(host: str, port: int, user: str, password: str,
                  table: str, chunk_size: int,
                  db: str = "app",
                  keyset: bool = False) -> SnapshotPlan:
    """Scalar queries + DESC only: never materializes a data row on
    the driver. The start position is read BEFORE the pk bounds so no
    committed change can fall between stream start and any chunk's
    low watermark.

    ``keyset=False`` cuts equal-WIDTH pk ranges (two scalar queries
    total) — right for dense sequential pks. ``keyset=True`` cuts
    equal-COUNT ranges by walking ``max(pk) of the next chunk_size
    rows`` (Debezium's incremental-snapshot probe; index-only on a
    real server, one scalar per chunk): on sparse or skewed pk spaces
    (snowflake ids, tombstoned ranges) equal width degenerates into
    millions of empty ranges or million-row chunks, while keyset
    bounds every chunk at exactly chunk_size rows regardless of
    density."""
    from ru_cdc_spark.sources.mysql_client import pooled_connection

    ranges: list[tuple[int, int]] = []
    with pooled_connection(host, port, user, password) as conn:
        start_file, start_pos = conn.show_master_status()
        fields = conn.desc_table(db, table)
        columns = [f.name for f in fields]
        types = [f.field_type for f in fields]
        pk = next(f.name for f in fields if f.is_pk)
        rs = conn.query(f"select min({pk}), max({pk}) from {table}")
        mn_s, mx_s = (rs.rows[0] if rs.rows else (None, None))
        if mn_s is not None and mx_s is not None:
            mn, mx = int(mn_s), int(mx_s)
            lo = mn - 1
            if keyset:
                while lo < mx:
                    rs = conn.query(
                        f"select max({pk}) from (select {pk} from "
                        f"{table} where {pk} > {lo} order by {pk} "
                        f"limit {chunk_size}) c")
                    hi_s = rs.rows[0][0] if rs.rows else None
                    if hi_s is None:
                        break
                    hi = int(hi_s)
                    # rows inserted past the probe are the change
                    # stream's job; cap at the planning-time max so
                    # the plan stays finite under concurrent inserts
                    ranges.append((lo, min(hi, mx)))
                    lo = hi
            else:
                while lo < mx:
                    hi = min(lo + chunk_size, mx)
                    ranges.append((lo, hi))
                    lo = hi
    return SnapshotPlan(table=table, columns=columns, pk=pk,
                        ranges=ranges, start_file=start_file,
                        start_pos=start_pos, types=types)


def wire_seq(binlog_file: str, pos: int) -> int:
    """Globally ordered sequence for a (file, position) coordinate:
    MySQL binlog filenames carry a monotonic numeric suffix, and
    positions are FILE-relative (they restart near 4 after every
    rotation) — any cross-file order-by-position consumer needs the
    file's sequence number folded in. Positions are u32, so
    ``suffix << 33`` can never collide."""
    suffix = binlog_file.rsplit(".", 1)[-1]
    return (int(suffix) << 33) + pos if suffix.isdigit() else pos


def _window_touched_pks(events: list[tuple[int, bytes]], table: str,
                        lo: int, hi: int, pk_i: int = 0) -> set[int]:
    """Pks in (lo, hi] touched by any row event for ``table`` in the
    watermark window — the DBLog chunk-dedup set. The TABLE_MAP
    registry keys on table_id exactly like the live decode path; the
    pk is read at its DESC ordinal (binlog images are in table column
    order), never assumed first. Checksum trailers are stripped per
    the FDE before decode — ``_dump_events`` deliberately delivers
    raw bytes, and a CRC32 trailer parsed as row payload would add a
    garbage pk to the dedup set (silently dropping an innocent
    snapshot row that nothing ever replays)."""
    from ru_cdc_spark.sources.binlog_wire import (
        ABSENT,
        decode_format_description,
        decode_rows_event,
        decode_table_map,
    )
    from ru_cdc_spark.sources.mysql_client import strip_checksum

    touched: set[int] = set()
    specs_by_tid: dict[int, list] = {}
    checksum_bytes = 0
    for _pos, ev in events:
        etype = ev[4]
        if etype == 15:  # FDE declares the stream's checksum algorithm
            checksum_bytes = decode_format_description(
                ev)["checksum_bytes"]
            continue
        if checksum_bytes:
            ev = strip_checksum(ev)
        if etype == 19:  # TABLE_MAP
            tid, _schema, tname, specs = decode_table_map(ev)
            if tname == table:
                specs_by_tid[tid] = specs
            else:
                specs_by_tid.pop(tid, None)
            continue
        if etype not in _ROWS_EVENT_TYPES:
            continue
        tid = int.from_bytes(ev[19:25], "little")
        specs = specs_by_tid.get(tid)
        if specs is None:
            continue
        # decode_rows_event handles 30/31/32 AND 39 (partial updates
        # come back as (before, after) pairs with JSON diffs applied)
        ev_type, rows = decode_rows_event(ev, specs)
        images = []
        for r in rows:
            images.extend(r if ev_type in (31, 39) else (r,))
        for img in images:
            v = img[pk_i]
            # ABSENT (binlog_row_image=MINIMAL: the UPDATE after-image
            # carries no pk — it travels in the before image, which is
            # also scanned here) is "unknown", never a key
            if v is not None and v is not ABSENT and lo < int(v) <= hi:
                touched.add(int(v))
    return touched


def _chain_between(host: str, port: int, user: str, password: str,
                   file_l: str, file_h: str) -> list[tuple[str, int]]:
    """The binlog files STRICTLY BETWEEN two watermark files in SHOW
    BINARY LOGS order — the intermediate files a multi-rotation window
    must also scan. Empty when the files are adjacent (the common
    single-rotation case) or either endpoint is missing (purged logs:
    the caller's endpoint dumps still cover what remains)."""
    from ru_cdc_spark.sources.mysql_socket_source import fetch_binary_logs

    chain = fetch_binary_logs(host, port, user, password)
    names = [n for n, _ in chain]
    if file_l not in names or file_h not in names:
        return []
    return chain[names.index(file_l) + 1:names.index(file_h)]


def read_chunk(host: str, port: int, user: str, password: str,
               plan: SnapshotPlan, lo: int, hi: int,
               binary_protocol: bool = False
               ) -> tuple[list[list[str | None]], int]:
    """One chunk: watermark, SELECT, watermark, window-dedup. Returns
    (surviving text rows in DESC column order, low watermark).

    ``binary_protocol=True`` issues the chunk read as a prepared
    statement (COM_STMT_PREPARE/EXECUTE, binary resultset rows) — what
    production snapshotters actually send; values are normalized back
    to the text-protocol strings so both transports hash identically."""
    from ru_cdc_spark.sources.mysql_client import MySQLConnection

    cols_sql = ", ".join(plan.columns)
    with MySQLConnection.connect(host, port, user, password) as conn:
        file_l, pos_l = conn.show_master_status()
        if binary_protocol:
            stmt = conn.stmt_prepare(
                f"select {cols_sql} from {plan.table} "
                f"where {plan.pk} > ? and {plan.pk} <= ? "
                f"order by {plan.pk}")
            raw = conn.stmt_execute(stmt, (lo, hi))
            conn.stmt_close(stmt)

            class rs:  # noqa: N801 — text-shape adapter
                rows = [[None if v is None else str(v) for v in r]
                        for r in raw]
        else:
            rs = conn.query(
                f"select {cols_sql} from {plan.table} "
                f"where {plan.pk} > {lo} and {plan.pk} <= {hi} "
                f"order by {plan.pk}")
        file_h, pos_h = conn.show_master_status()
    pk_i = plan.columns.index(plan.pk)
    touched: set[int] = set()
    if file_h != file_l:
        # the binlog rotated between the watermarks: the window spans
        # MULTIPLE files — the old file's tail, EVERY intermediate file
        # in the chain (more than one rotation can land inside a slow
        # chunk read), and the new file's prefix. Skipping any of them
        # would let a raced snapshot row survive dedup and win the
        # merge permanently (low watermark L outranks events that were
        # never scanned).
        window = _dump_events(host, port, user, password,
                              file_l, pos_l, 1 << 62)
        for name, _size in _chain_between(host, port, user, password,
                                          file_l, file_h):
            window += _dump_events(host, port, user, password,
                                   name, 4, 1 << 62)
        window += _dump_events(host, port, user, password,
                               file_h, 4, pos_h)
        touched = _window_touched_pks(window, plan.table, lo, hi,
                                      pk_i=pk_i)
    elif pos_h > pos_l:
        window = _dump_events(host, port, user, password,
                              file_l, pos_l, pos_h)
        touched = _window_touched_pks(window, plan.table, lo, hi,
                                      pk_i=pk_i)
    seq = wire_seq(file_l, pos_l)
    if not touched:
        return rs.rows, seq
    kept = [r for r in rs.rows if int(r[pk_i] or 0) not in touched]
    return kept, seq


def chunk_as_frames(host: str, port: int, user: str, password: str,
                    plan: SnapshotPlan, lo: int, hi: int,
                    db: str = "app", table_id: int = 90,
                    rows_per_event: int = 100
                    ) -> list[tuple[int, bytes]]:
    """One bootstrap chunk re-encoded as synthetic TABLE_MAP +
    WRITE_ROWS frames (Debezium's 'READ' records, except they ride the
    actual WIRE format) — the streaming source's snapshot phase emits
    these so the downstream pipeline decodes bootstrap rows and live
    changes through the IDENTICAL path. Frame position = the chunk's
    low watermark, so order-by-pos merges rank snapshot rows below
    every change event that could supersede them."""
    from ru_cdc_spark.sources.binlog_wire import (
        WRITE_ROWS_V2,
        encode_rows_event,
        encode_table_map,
    )

    rows, pos_l = read_chunk(host, port, user, password, plan, lo, hi)
    specs = [colspec_from_mysql_type(t) for t in (plan.types or [])]
    if len(specs) != len(plan.columns):
        raise ValueError("bootstrap needs DESC types for every column")
    typed = [tuple(text_to_typed(v, s) for v, s in zip(r, specs))
             for r in rows]
    tm = encode_table_map(table_id, db, plan.table, specs)
    frames = []
    for base in range(0, len(typed), rows_per_event):
        ev = encode_rows_event(WRITE_ROWS_V2, table_id, specs,
                               typed[base:base + rows_per_event])
        frames.append((pos_l, tm + ev))
    return frames


def snapshot_chunks(spark: SparkSession, host: str, port: int,
                    user: str, password: str, plan: SnapshotPlan,
                    binary_protocol: bool = False) -> DataFrame:
    """The distributed chunk phase: one executor task per chunk range,
    each dialing its own connections (the driver ships only the plan's
    (lo, hi] scalars). Output columns are the MySQL text-protocol
    strings plus ``seq`` = the chunk's low watermark — ready for the
    versioned merge against the change stream."""
    schema = "seq long, " + ", ".join(f"`{c}` string"
                                      for c in plan.columns)
    if not plan.ranges:
        return spark.createDataFrame([], schema)
    ranges = spark.createDataFrame(plan.ranges, "lo long, hi long") \
        .repartition(len(plan.ranges))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"seq": []}
            for c in plan.columns:
                out[c] = []
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                rows, pos_l = read_chunk(host, port, user, password,
                                         plan, int(lo), int(hi),
                                         binary_protocol=binary_protocol)
                for r in rows:
                    out["seq"].append(pos_l)
                    for c, v in zip(plan.columns, r):
                        out[c].append(v)
            out["seq"] = pd.Series(out["seq"], dtype="int64")
            yield pd.DataFrame(out)

    return ranges.mapInPandas(run, schema)


@dataclass
class ChunkStore:
    """Create-only object-store discipline over a directory: unique-name
    puts plus put-if-absent commits — NO rename or replace anywhere.
    Local put-if-absent = write staged bytes, then ``os.link`` to the
    final name (atomic; fails if the target exists), the same contract
    as S3 conditional PUT (``If-None-Match: *``), GCS preconditions, or
    an ABFS etag guard. Listing/existence may LAG on real stores; the
    commit protocol tolerates that: resolution goes only through commit
    markers, a staged file without its marker is invisible garbage, and
    re-executing an already-committed chunk just loses the
    put-if-absent race and leaves its staged file unmanifested."""

    root: str
    # how long a waiter gives a claim holder to finish its rename
    # before presuming it crashed and re-racing the claim (no-hardlink
    # fallback path only); the holder's claim->rename window is
    # microseconds, so 5s is a crash verdict, not a latency bet
    claim_takeover_grace_s: float = 5.0

    def _full(self, name: str) -> str:
        full = os.path.join(self.root, name)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        return full

    def put(self, name: str, data: bytes) -> None:
        """Unique-name write (callers embed a uuid): visibility comes
        only from a later commit marker, so non-atomic local writes are
        safe — a torn file is never referenced."""
        with open(self._full(name), "wb") as fh:
            fh.write(data)

    def put_if_absent(self, name: str, data: bytes) -> bool:
        """Atomic create-only publish; False = another attempt won."""
        import uuid

        staged = self._full(f".staged-{uuid.uuid4().hex}")
        with open(staged, "wb") as fh:
            fh.write(data)
        try:
            os.link(staged, self._full(name))
            return True
        except FileExistsError:
            return False
        except OSError:
            # Filesystems without hardlinks (some NFS/FUSE/object-store
            # mounts): mkdir is the portable atomic CREATE-ONLY
            # primitive, and rename is the portable atomic-CONTENT
            # primitive — combine them. The winner is whoever mkdirs
            # the claim; only the winner renames its fully-written,
            # fsynced staged file to the final name, so a reader can
            # never observe a torn/empty marker and concurrent
            # attempts get exactly one winner. If a previous attempt
            # crashed between claim and rename (claim exists, final
            # absent), the retry takes over and completes the publish
            # with its own complete bytes.
            final = self._full(name)
            claim = final + ".claim"
            with open(staged, "rb+") as fh:
                os.fsync(fh.fileno())
            import time as _time

            # Exactly-one-winner: the mkdir of the claim dir is the
            # ONLY arbiter, and only the current claim holder ever
            # renames to the final name. The holder stamps an
            # ownership TOKEN file inside its claim and re-verifies the
            # token immediately before the rename, so a takeover
            # (waiter evicting a claim whose holder crashed between
            # claim and rename) can never be overwritten by the
            # presumed-dead holder waking up late — the stalled holder
            # finds its token gone and returns False. Eviction is by
            # CLAIM AGE (the dir's mtime), never a waiter-local
            # deadline, so a freshly re-acquired claim is never evicted
            # by a waiter whose clock started against the previous
            # holder. Holders always clean their claim up; a foreign
            # token makes the rmdir fail (non-empty), protecting the
            # new owner's claim. The residual window — token check to
            # rename, a few instructions with no syscall between — is
            # the POSIX floor without a compare-and-swap rename.
            import uuid as _uuid

            token = os.path.join(claim, f"owner-{_uuid.uuid4().hex}")
            while True:
                try:
                    os.mkdir(claim)
                except FileExistsError:
                    if os.path.exists(final):
                        return False  # holder published — we lost
                    try:
                        age = _time.time() - os.stat(claim).st_mtime
                    except OSError:
                        continue  # claim vanished: re-race the mkdir
                    if age > self.claim_takeover_grace_s:
                        # presumed-crashed holder: revoke its token,
                        # then the dir; every step tolerates racing
                        # waiters doing the same
                        try:
                            for t in os.listdir(claim):
                                try:
                                    os.unlink(os.path.join(claim, t))
                                except OSError:
                                    pass
                            os.rmdir(claim)
                        except OSError:
                            pass
                    _time.sleep(0.01)
                    continue
                try:
                    try:
                        with open(token, "wb"):
                            pass
                    except OSError:
                        # the claim dir was evicted between our mkdir
                        # and the stamp — treat as usurped
                        return False
                    # we hold a live claim: publish only if nobody
                    # already has (a pre-crash winner's final stays)
                    if os.path.exists(final):
                        return False
                    if not os.path.exists(token):
                        # usurped between stamp and publish — the
                        # taker owns the name now; stand down
                        return False
                    os.rename(staged, final)
                    staged = None
                    return True
                finally:
                    try:
                        os.unlink(token)
                    except OSError:
                        pass
                    try:
                        os.rmdir(claim)
                    except OSError:
                        pass  # a taker's token keeps THEIR claim alive
        finally:
            if staged is not None:
                os.unlink(staged)

    def read(self, name: str) -> bytes:
        with open(os.path.join(self.root, name), "rb") as fh:
            return fh.read()

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.root, name))


def run_snapshot_resumable(spark: SparkSession, host: str, port: int,
                           user: str, password: str, plan: SnapshotPlan,
                           out_dir: str,
                           store: ChunkStore | None = None) -> DataFrame:
    """The resumable runner the module docstring promises, with
    OBJECT-STORE-SAFE chunk commits: each chunk's rows land in a
    uniquely-named staged parquet file, then a ``commit-<lo>_<hi>.json``
    marker naming that file is published create-only (put-if-absent) —
    the manifest protocol of ``sources/queue_sink.py``, no renames. A
    killed run leaves staged files without markers (invisible) and
    whole committed chunks; a re-run re-reads the PERSISTED plan (the
    original ranges and stream-start position stay authoritative —
    re-deriving bounds now would miss rows inserted below the new MIN)
    and executes only chunks whose marker is missing. Racing or
    resumed duplicate executions are safe: chunks are idempotent under
    the versioned merge, and only one attempt's marker can ever win.

    Scale: state is one marker object per chunk (a 10 TB table at 1 GB
    chunks = 10k markers); no driver bookkeeping beyond marker
    existence checks; correct on eventually-consistent listings because
    a stale miss only causes a redundant idempotent re-read."""
    import json

    store = store or ChunkStore(out_dir)
    os.makedirs(store.root, exist_ok=True)
    store.put_if_absent("plan.json", json.dumps(
        {"table": plan.table, "columns": plan.columns, "pk": plan.pk,
         "ranges": plan.ranges, "start_file": plan.start_file,
         "start_pos": plan.start_pos}).encode())
    saved = json.loads(store.read("plan.json"))
    plan = SnapshotPlan(table=saved["table"], columns=saved["columns"],
                        pk=saved["pk"],
                        ranges=[tuple(r) for r in saved["ranges"]],
                        start_file=saved["start_file"],
                        start_pos=saved["start_pos"])

    def marker(lo: int, hi: int) -> str:
        return f"commit-{lo}_{hi}.json"

    todo = [(lo, hi) for lo, hi in plan.ranges
            if not store.exists(marker(lo, hi))]
    if todo:
        part = SnapshotPlan(table=plan.table, columns=plan.columns,
                            pk=plan.pk, ranges=todo,
                            start_file=plan.start_file,
                            start_pos=plan.start_pos)

        def write_chunk(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
            import io
            import uuid

            import pyarrow as pa
            import pyarrow.parquet as pq

            done = []
            for pdf in batches:
                for lo, hi in zip(pdf["lo"], pdf["hi"]):
                    rows, pos_l = read_chunk(host, port, user, password,
                                             part, int(lo), int(hi))
                    cols = {"seq": pd.Series([pos_l] * len(rows),
                                             dtype="int64")}
                    for j, c in enumerate(part.columns):
                        cols[c] = pd.Series([r[j] for r in rows],
                                            dtype="object")
                    buf = io.BytesIO()
                    pq.write_table(
                        pa.Table.from_pandas(pd.DataFrame(cols),
                                             preserve_index=False), buf)
                    data_name = (f"data/chunk_{int(lo)}_{int(hi)}-"
                                 f"{uuid.uuid4().hex}.parquet")
                    store.put(data_name, buf.getvalue())
                    store.put_if_absent(
                        marker(int(lo), int(hi)),
                        json.dumps({"file": data_name}).encode())
                    # a lost race leaves this attempt's staged file
                    # unmanifested — invisible garbage, never read
                    done.append(int(lo))
            yield pd.DataFrame({"lo": pd.Series(done, dtype="int64")})

        ranges = spark.createDataFrame(todo, "lo long, hi long") \
            .repartition(len(todo))
        # tiny: one int per completed chunk
        ranges.mapInPandas(write_chunk, "lo long").collect()

    schema = "seq long, " + ", ".join(f"`{c}` string"
                                      for c in plan.columns)
    if not plan.ranges:
        return spark.createDataFrame([], schema)
    files = [os.path.join(store.root,
                          json.loads(store.read(marker(lo, hi)))["file"])
             for lo, hi in plan.ranges]
    return spark.read.schema(schema).parquet(*files)


def decode_table_frames(frames: DataFrame, table: str,
                        columns: list[str]) -> DataFrame:
    """Generic TABLE_MAP-driven decode of a (pos, frame) DataFrame —
    synthetic bootstrap frames and real binlog frames share the wire
    format, so ONE decoder serves the whole bootstrap-then-stream
    output. Emits (seq = frame pos, op, text columns); UPDATE rows
    carry the after image, DELETEs the before image (tombstones)."""
    from ru_cdc_spark.sources.binlog_wire import (
        ABSENT,
        decode_rows_event,
        decode_table_map,
    )

    schema = ("seq long, op string, "
              + ", ".join(f"`{c}` string" for c in columns))
    op_names = {30: "INSERT", 31: "UPDATE", 32: "DELETE",
                39: "UPDATE"}

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"seq": [], "op": []}
            for c in columns:
                out[c] = []
            for pos, blob in zip(pdf["pos"], pdf["frame"]):
                b = bytes(blob)
                off = 0
                while off < len(b):
                    tm_size = int.from_bytes(b[off + 9:off + 13],
                                             "little")
                    _tid, _sch, tname, specs = decode_table_map(
                        b[off:off + tm_size])
                    off += tm_size
                    ev_size = int.from_bytes(b[off + 9:off + 13],
                                             "little")
                    ev_type, rows = decode_rows_event(
                        b[off:off + ev_size], specs)
                    off += ev_size
                    if tname != table:
                        continue
                    for r in rows:
                        img = r[1] if ev_type in (31, 39) else r
                        out["seq"].append(int(pos))
                        out["op"].append(op_names[ev_type])
                        for c, v in zip(columns, img):
                            if v is ABSENT:
                                # a MINIMAL/NOBLOB server: the whole-
                                # row versioned merge downstream cannot
                                # express "column unknown" — failing
                                # loudly beats stringifying a sentinel
                                # into the snapshot
                                raise ValueError(
                                    "partial row image (binlog_row_"
                                    "image=MINIMAL/NOBLOB) in the "
                                    "bootstrap change stream — use the"
                                    " sparse pipeline (merge_sparse_"
                                    f"changes) for column {c!r}")
                            out[c].append(None if v is None
                                          else str(v))
            out["seq"] = pd.Series(out["seq"], dtype="int64")
            yield pd.DataFrame(out)

    return frames.mapInPandas(dec, schema)


def snapshot_changes(spark: SparkSession, host: str, port: int,
                     user: str, password: str, plan: SnapshotPlan,
                     n_slices: int = 8) -> DataFrame:
    """The change-stream leg: every row event for ``plan.table`` from
    the snapshot-start position to the current tip, as (seq =
    file-biased event position, op, text columns). Slices cut at
    TABLE_MAP starts like the engine's CDC reader; each task dumps only
    its range. DELETEs carry the before image (tombstone payload).

    The read walks the WHOLE file chain from ``plan.start_file`` (SHOW
    BINARY LOGS order): if the binlog rotated between ``plan_snapshot``
    and this read, the start file's tail and every later file are laid
    out and sliced separately, and ``start_pos`` clips only inside
    ``start_file`` (positions are file-relative — comparing it against
    another file's offsets would drop or duplicate events). Each
    emitted seq folds in its OWN file's sequence number (``wire_seq``),
    so cross-file order stays total against the chunk rows."""
    from ru_cdc_spark.sources.binlog_wire import (
        ABSENT,
        decode_rows_event,
        decode_table_map,
    )
    from ru_cdc_spark.sources.mysql_socket_source import fetch_binary_logs

    tip_file, _end, _tip_events = fetch_binlog_layout(host, port, user,
                                                      password)
    names = [n for n, _ in fetch_binary_logs(host, port, user, password)]
    if plan.start_file in names:
        files = names[names.index(plan.start_file):]
    else:  # purged below the start file (or no SHOW BINARY LOGS rows)
        files = names or [tip_file]
    schema = ("seq long, op string, "
              + ", ".join(f"`{c}` string" for c in plan.columns))
    slices: list[tuple[str, int, int]] = []
    for f in files:
        _f, _fend, events = fetch_binlog_layout(host, port, user,
                                                password, filename=f)
        clip = plan.start_pos if f == plan.start_file else 0
        slices += [(f, max(lo, clip), hi)
                   for lo, hi in slice_at_table_maps(events, n_slices)
                   if hi > clip]
    if not slices:
        return spark.createDataFrame([], schema)
    ranges = spark.createDataFrame(slices, "f string, lo long, hi long") \
        .repartition(max(1, len(slices)))
    op_names = {30: "INSERT", 31: "UPDATE", 32: "DELETE",
                39: "UPDATE"}

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"seq": [], "op": []}
            for c in plan.columns:
                out[c] = []
            for f, lo, hi in zip(pdf["f"], pdf["lo"], pdf["hi"]):
                frames = _dump_frames(host, port, user, password,
                                      str(f), int(lo), int(hi))
                for pos, frame in frames:
                    tm_size = int.from_bytes(frame[9:13], "little")
                    _tid, _sch, tname, specs = decode_table_map(
                        frame[:tm_size])
                    if tname != plan.table:
                        continue
                    ev_type, rows = decode_rows_event(frame[tm_size:],
                                                      specs)
                    for r in rows:
                        img = r[1] if ev_type in (31, 39) else r
                        # the SAME file-biased coordinate the chunk
                        # rows carry — cross-file order stays total
                        out["seq"].append(wire_seq(str(f), pos))
                        out["op"].append(op_names[ev_type])
                        for c, v in zip(plan.columns, img):
                            if v is ABSENT:
                                raise ValueError(
                                    "partial row image in the change "
                                    "stream — the versioned whole-row "
                                    "merge needs FULL images; use the "
                                    "sparse pipeline for column "
                                    f"{c!r}")
                            out[c].append(None if v is None else str(v))
            out["seq"] = pd.Series(out["seq"], dtype="int64")
            yield pd.DataFrame(out)

    return ranges.mapInPandas(decode, schema)
