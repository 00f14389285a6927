"""Distributed binlog-frame generation and decode (Spark glue over
sources/binlog_wire.py).

The deterministic fixture covers every wire codec the reference implements
(/root/reference/src/binlog.rs §2.2/§2.3 rows): all integer widths, float/
double, packed NEWDECIMAL with signs, zero-DATE -> NULL, negative TIME2,
DATETIME2/TIMESTAMP2 with fractional seconds, 1- and 2-byte-prefixed
strings, BLOB/TEXT, and a rotating NULL-bitmap pattern that exercises every
column's null path. Values are pure functions of the row id so a DuckDB
oracle can recompute them arithmetically — the same trick as
``binlog_source_feed``, but here the payload is real binlog BYTES, not
JSON.

Both stages are ``mapInPandas`` narrow maps: frames are produced and
decoded partition-parallel with zero shuffle; at scale the generate stage
is replaced by the actual binlog file/network bytes and the decode stage
is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta
from decimal import Decimal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ru_cdc_spark.sources.binlog_wire import (
    WRITE_ROWS_V2,
    T_BIT,
    T_ENUM,
    T_JSON,
    T_SET,
    ZERO_DATE,
    ColSpec,
    T_BLOB,
    T_DATE,
    T_DATETIME2,
    T_DOUBLE,
    T_FLOAT,
    T_INT24,
    T_LONG,
    T_LONGLONG,
    T_NEWDECIMAL,
    T_SHORT,
    T_STRING,
    T_TIME2,
    T_TIMESTAMP2,
    T_TINY,
    T_VARCHAR,
    T_YEAR,
    decode_frame,
    encode_frame,
)

ROWS_PER_EVENT = 5

# the catalog entry (DESC analog): binlog frames carry no column names
COLUMNS = [
    ("i", ColSpec(T_LONGLONG)),
    ("t_tiny", ColSpec(T_TINY)),
    ("t_short", ColSpec(T_SHORT)),
    ("t_int24", ColSpec(T_INT24)),
    ("t_long", ColSpec(T_LONG)),
    ("t_float", ColSpec(T_FLOAT)),
    ("t_double", ColSpec(T_DOUBLE)),
    ("t_dec", ColSpec(T_NEWDECIMAL, (12, 4))),
    ("t_date", ColSpec(T_DATE)),
    ("t_time_us", ColSpec(T_TIME2, (3,))),
    ("t_datetime", ColSpec(T_DATETIME2, (6,))),
    ("t_ts", ColSpec(T_TIMESTAMP2, (2,))),
    ("t_year", ColSpec(T_YEAR)),
    ("t_varchar", ColSpec(T_VARCHAR, (300,))),   # 2-byte length prefix
    ("t_char", ColSpec(T_STRING, (36,))),        # 1-byte length prefix
    ("t_text", ColSpec(T_BLOB, (2,))),           # TEXT with length_size=2
]
SPECS = [s for _, s in COLUMNS]

_EPOCH_2000 = datetime(2000, 1, 1)
_DATE_BASE = datetime(1990, 1, 1)


def _row_values(i: int) -> tuple:
    """The generating formulas — mirrored 1:1 by the DuckDB oracle."""

    def null_at(k: int):
        return i % 13 == k

    dec_raw = (i * 10007) % 99999999 + 1
    dec = Decimal(dec_raw).scaleb(-4)
    if i % 5 == 0:
        dec = -dec
    time_sign = -1 if i % 2 == 1 else 1
    time_ms = (i % 1000) if time_sign > 0 else 0
    time_us = time_sign * (
        ((i % 800) * 3600 + (i % 60) * 60 + (i * 7) % 60) * 1_000_000
        + time_ms * 1000)
    return (
        i,
        None if null_at(1) else (i % 200) - 100,
        None if null_at(2) else (i * 7) % 60000 - 30000,
        None if null_at(3) else (i * 131) % 16_000_000 - 8_000_000,
        None if null_at(4) else (i * 2654435761) % 4_000_000_000 - 2_000_000_000,
        None if null_at(5) else i * 0.25,
        None if null_at(6) else i * 0.1,
        None if null_at(7) else dec,
        # i%97: an explicit zero date — PRESENT on the wire (all-zero
        # bits), decoded to NULL (F2); bitmap-NULL at i%13==8 separately
        None if null_at(8) else (
            ZERO_DATE if i % 97 == 0
            else (_DATE_BASE + timedelta(days=i % 15000)).date()),
        None if null_at(9) else time_us,
        None if null_at(10) else
        _EPOCH_2000 + timedelta(seconds=i * 13, microseconds=(i % 1000) * 1000),
        None if null_at(11) else (1_600_000_000 + i) * 1_000_000 + (i % 100) * 10_000,
        None if null_at(12) else 1900 + i % 155,
        None if null_at(0) else "x" * (i % 280) + f"_{i}",
        "c" + str(i % 1000),
        "t" + str(i * 3),
    )


def generate_frames(spark: SparkSession, n_rows: int,
                    n_partitions: int = 8) -> DataFrame:
    """(frame_id, frame binary) — each frame is one TABLE_MAP + one
    multi-row WRITE_ROWS_v2 event of ROWS_PER_EVENT rows."""
    n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for fid in pdf["id"]:
                rows = []
                for r in range(ROWS_PER_EVENT):
                    i = int(fid) * ROWS_PER_EVENT + r
                    if i >= n_rows:
                        break
                    rows.append(_row_values(i))
                frames.append(encode_frame(42, "testdb", "wiretypes", SPECS,
                                           WRITE_ROWS_V2, rows,
                                           log_pos=int(fid)))
            yield pd.DataFrame({"frame_id": pdf["id"], "frame": frames})

    return (spark.range(n_frames).repartition(n_partitions)
            .mapInPandas(gen, "frame_id long, frame binary"))


DECODED_SCHEMA = (
    "i long, t_tiny long, t_short long, t_int24 long, t_long long, "
    "t_float double, t_double double, t_dec string, t_date timestamp_ntz, "
    "t_time_us long, t_datetime timestamp_ntz, t_ts timestamp_ntz, "
    "t_year long, t_varchar string, t_char string, t_text string"
)


def decode_frames(frames: DataFrame, checksum_bytes: int = 0) -> DataFrame:
    """binary frames -> typed rows via the wire decoder (mapInPandas).

    Positional values are zipped with catalog names (COLUMNS) — the
    reference's T1 positional->named projection (executor.rs:238-322).
    Pass ``checksum_bytes=4`` for streams written with
    binlog_checksum=CRC32."""
    names = [n for n, _ in COLUMNS]

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {n: [] for n in names}
            for raw in pdf["frame"]:
                schema, table, etype, rows = decode_frame(
                    bytes(raw), checksum_bytes)
                if (schema, table) != ("testdb", "wiretypes"):
                    raise ValueError(f"unexpected table {schema}.{table}")
                for row in rows:
                    for n, v in zip(names, row):
                        out[n].append(v)
            pf = pd.DataFrame(out)
            if len(pf):
                # Decimal -> exact string (fixed-scale decimal text is the
                # engine-identical representation); epoch-µs ints -> naive
                # UTC timestamps; date objects -> midnight timestamps
                pf["t_dec"] = pf["t_dec"].map(
                    lambda d: None if d is None else str(d))
                pf["t_ts"] = pd.to_datetime(pf["t_ts"], unit="us")
                pf["t_date"] = pd.to_datetime(pf["t_date"])
                pf["t_datetime"] = pd.to_datetime(pf["t_datetime"])
            yield pf

    return frames.mapInPandas(dec, DECODED_SCHEMA)


BINLOG_WIRE_N_ROWS = 2000

BINLOG_WIRE_ORACLE = f"""
WITH ids AS (SELECT UNNEST(range({BINLOG_WIRE_N_ROWS})) AS i)
SELECT i,
  CASE WHEN i % 13 = 1 THEN NULL ELSE (i % 200) - 100 END AS t_tiny,
  CASE WHEN i % 13 = 2 THEN NULL ELSE (i * 7) % 60000 - 30000 END AS t_short,
  CASE WHEN i % 13 = 3 THEN NULL ELSE (i * 131) % 16000000 - 8000000 END AS t_int24,
  CASE WHEN i % 13 = 4 THEN NULL
       ELSE (i * 2654435761) % 4000000000 - 2000000000 END AS t_long,
  CASE WHEN i % 13 = 5 THEN NULL
       ELSE i * CAST(0.25 AS DOUBLE) END AS t_float,
  CASE WHEN i % 13 = 6 THEN NULL
       ELSE i * CAST(0.1 AS DOUBLE) END AS t_double,
  CASE WHEN i % 13 = 7 THEN NULL ELSE
    (CASE WHEN i % 5 = 0 THEN '-' ELSE '' END)
    || CAST(((i * 10007) % 99999999 + 1) // 10000 AS VARCHAR)
    || '.' || lpad(CAST(((i * 10007) % 99999999 + 1) % 10000 AS VARCHAR), 4, '0')
  END AS t_dec,
  CASE WHEN i % 13 = 8 OR i % 97 = 0 THEN NULL
       ELSE CAST(DATE '1990-01-01' + INTERVAL (i % 15000) DAY AS TIMESTAMP)
  END AS t_date,
  CASE WHEN i % 13 = 9 THEN NULL ELSE
    (CASE WHEN i % 2 = 1 THEN -1 ELSE 1 END)
    * (((i % 800) * 3600 + (i % 60) * 60 + (i * 7) % 60) * 1000000
       + (CASE WHEN i % 2 = 0 THEN (i % 1000) * 1000 ELSE 0 END))
  END AS t_time_us,
  CASE WHEN i % 13 = 10 THEN NULL
       ELSE make_timestamp((946684800 + i * 13) * 1000000 + (i % 1000) * 1000)
  END AS t_datetime,
  CASE WHEN i % 13 = 11 THEN NULL
       ELSE make_timestamp((1600000000 + i) * 1000000 + (i % 100) * 10000)
  END AS t_ts,
  CASE WHEN i % 13 = 12 THEN NULL ELSE 1900 + i % 155 END AS t_year,
  CASE WHEN i % 13 = 0 THEN NULL
       ELSE repeat('x', i % 280) || '_' || CAST(i AS VARCHAR) END AS t_varchar,
  'c' || CAST(i % 1000 AS VARCHAR) AS t_char,
  't' || CAST(i * 3 AS VARCHAR) AS t_text
FROM ids
"""


# ---------------------------------------------------------------------------
# CDC composition on wire bytes: INSERT/UPDATE/DELETE frames -> snapshot
# ---------------------------------------------------------------------------

def _update_after(i: int) -> tuple:
    """The UPDATE's after-image: two columns change (t_long, t_varchar),
    everything else keeps the insert image — so the decoded change stream
    exercises partial-change semantics downstream."""
    row = list(_row_values(i))
    row[4] = i + 5_000_000          # t_long
    row[13] = f"upd_{i}"            # t_varchar
    return tuple(row)


def cdc_frame_bytes(fid: int, n_rows: int,
                    full_metadata: bool = False) -> bytes | None:
    """The deterministic wire bytes of CDC frame ``fid`` (None past the
    end): one WRITE_ROWS event for the frame's rows plus UPDATE/DELETE
    events for the rows the fixture discipline mutates. Shared by the
    mapInPandas generator and the streaming wire DataSource — 'what the
    socket would deliver' is defined once. ``full_metadata`` makes every
    TABLE_MAP carry the WL#4618 TLV block (binlog_row_metadata=FULL:
    column names, signedness, primary key) — the wire a consumer can
    decode with ZERO catalog round-trips."""
    from ru_cdc_spark.sources.binlog_wire import DELETE_ROWS_V2, UPDATE_ROWS_V2

    lo = fid * ROWS_PER_EVENT
    rng = [i for i in range(lo, min(lo + ROWS_PER_EVENT, n_rows))]
    if not rng:
        return None
    meta = dict(full_metadata=full_metadata,
                column_names=[n for n, _ in COLUMNS] if full_metadata
                else None,
                primary_key=[0] if full_metadata else None)
    inserts = [_row_values(i) for i in rng]
    updates = [(_row_values(i), _update_after(i)) for i in rng if i % 10 < 3]
    deletes = [_row_values(i) for i in rng if i % 10 == 3]
    blob = encode_frame(42, "testdb", "wiretypes", SPECS,
                        WRITE_ROWS_V2, inserts, log_pos=lo, **meta)
    if updates:
        blob += encode_frame(42, "testdb", "wiretypes", SPECS,
                             UPDATE_ROWS_V2, updates, log_pos=lo, **meta)
    if deletes:
        blob += encode_frame(42, "testdb", "wiretypes", SPECS,
                             DELETE_ROWS_V2, deletes, log_pos=lo, **meta)
    return blob


def generate_cdc_frames(spark: SparkSession, n_rows: int,
                        n_partitions: int = 8) -> DataFrame:
    """Mixed change traffic as real binlog frames, mirroring the
    cdc_fixture derivation: every i INSERTs; i%10<3 UPDATEs (before/after
    pairs in one UPDATE_ROWS_v2 event); i%10==3 DELETEs (before images)."""
    n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames = [], []
            for fid in pdf["id"]:
                blob = cdc_frame_bytes(int(fid), n_rows)
                if blob is None:
                    continue
                ids.append(int(fid))
                frames.append(blob)
            yield pd.DataFrame({"frame_id": ids, "frame": frames})

    return (spark.range(n_frames).repartition(n_partitions)
            .mapInPandas(gen, "frame_id long, frame binary"))


CDC_DECODED_SCHEMA = (
    "seq long, type string, i long, t_long long, t_dec string, "
    "t_varchar string, t_datetime timestamp_ntz"
)


_EMIT_NAMES = ("i", "t_long", "t_dec", "t_varchar", "t_datetime")
_EMIT_IDX = tuple([n for n, _ in COLUMNS].index(c) for c in _EMIT_NAMES)


def decode_cdc_blobs(blobs, wire_named: bool = False) -> pd.DataFrame:
    """Decode an iterable of frame blobs (each 1-3 concatenated
    TABLE_MAP+ROWS pairs) into one pandas frame of the flat change
    stream — the executor-side core shared by ``decode_cdc_frames``
    (frames already in a DataFrame) and the fused socket reader
    (``mysql_socket_source.socket_cdc_changes``, which decodes in the
    same task that dumped the bytes so frames never cross the JVM).

    ``wire_named=True`` = CATALOG-FREE decode: column positions are
    resolved from each TABLE_MAP's own WL#4618 COLUMN_NAME metadata
    (binlog_row_metadata=FULL) instead of the engine's out-of-band
    catalog knowledge — no DESC connection exists anywhere in that
    path. (The reference's per-worker DESC round-trip,
    src/executor.rs:404-443, exists only because classic TABLE_MAPs
    lack names.) Signedness and ENUM/SET labels fold into the specs
    inside ``decode_table_map_ext``."""
    from ru_cdc_spark.sources.binlog_wire import (
        DELETE_ROWS_V2,
        UPDATE_ROWS_V2,
        decode_rows_event,
        decode_table_map,
        decode_table_map_ext,
    )

    cols = {"seq": [], "type": [], "i": [], "t_long": [], "t_dec": [],
            "t_varchar": [], "t_datetime": []}
    idx = _EMIT_IDX

    def emit(seq, typ, row):
        cols["seq"].append(seq)
        cols["type"].append(typ)
        cols["i"].append(row[idx[0]])
        v_dec = row[idx[2]]
        cols["t_long"].append(row[idx[1]])
        cols["t_dec"].append(None if v_dec is None else str(v_dec))
        cols["t_varchar"].append(row[idx[3]])
        cols["t_datetime"].append(row[idx[4]])

    for blob in blobs:
        b = bytes(blob)
        off = 0
        while off < len(b):
            tm_size = int.from_bytes(b[off + 9:off + 13], "little")
            if wire_named:
                _, _, _, specs, tm_meta = decode_table_map_ext(
                    b[off:off + tm_size])
                names = tm_meta.get("column_names")
                if not names:
                    raise ValueError(
                        "wire_named decode needs binlog_row_metadata="
                        "FULL (TABLE_MAP carries no COLUMN_NAME TLV)")
                idx = tuple(names.index(c) for c in _EMIT_NAMES)
            else:
                _, _, _, specs = decode_table_map(b[off:off + tm_size])
            off += tm_size
            ev_size = int.from_bytes(b[off + 9:off + 13], "little")
            etype, rows = decode_rows_event(b[off:off + ev_size], specs)
            off += ev_size
            pk = idx[0]
            for r in rows:
                if etype == UPDATE_ROWS_V2:
                    before, after = r
                    emit(before[pk] * 3 + 1, "UPDATE", after)
                elif etype == DELETE_ROWS_V2:
                    emit(r[pk] * 3 + 2, "DELETE", r)
                else:
                    emit(r[pk] * 3, "INSERT", r)
    out = pd.DataFrame(cols)
    if len(out):
        out["t_datetime"] = pd.to_datetime(out["t_datetime"])
    return out


def decode_cdc_frames(frames: DataFrame) -> DataFrame:
    """Frame blobs (1-3 concatenated TABLE_MAP+ROWS pairs) -> flat change
    stream (seq, type, pk, payload columns). The sequence column carries
    the fixture's id discipline (i*3 / +1 / +2) so latest-wins ordering is
    total per key, independent of frame arrival order — the engine's fix
    for the reference's X2 round-robin ordering hazard."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # yield per Arrow batch (NOT once per partition): memory stays
        # O(batch), the property the mapInPandas scale story rests on
        for pdf in batches:
            yield decode_cdc_blobs(pdf["frame"])

    return frames.mapInPandas(dec, CDC_DECODED_SCHEMA)


BINLOG_CDC_N_ROWS = 2000


def cdc_snapshot_oracle(n_rows: int) -> str:
    """The CDC snapshot oracle parameterized by fixture size (the socket
    streaming variant uses a smaller stream than the batch pipeline)."""
    return BINLOG_CDC_SNAPSHOT_ORACLE.replace(
        f"range({BINLOG_CDC_N_ROWS})", f"range({n_rows})")


BINLOG_CDC_SNAPSHOT_ORACLE = f"""
WITH ids AS (SELECT UNNEST(range({BINLOG_CDC_N_ROWS})) AS i)
SELECT i,
  CASE WHEN i % 10 < 3 THEN i + 5000000
       WHEN i % 13 = 4 THEN NULL
       ELSE (i * 2654435761) % 4000000000 - 2000000000 END AS t_long,
  CASE WHEN i % 13 = 7 THEN NULL ELSE
    (CASE WHEN i % 5 = 0 THEN '-' ELSE '' END)
    || CAST(((i * 10007) % 99999999 + 1) // 10000 AS VARCHAR)
    || '.' || lpad(CAST(((i * 10007) % 99999999 + 1) % 10000 AS VARCHAR), 4, '0')
  END AS t_dec,
  CASE WHEN i % 10 < 3 THEN 'upd_' || CAST(i AS VARCHAR)
       WHEN i % 13 = 0 THEN NULL
       ELSE repeat('x', i % 280) || '_' || CAST(i AS VARCHAR) END AS t_varchar,
  CASE WHEN i % 13 = 10 THEN NULL
       ELSE make_timestamp((946684800 + i * 13) * 1000000 + (i % 1000) * 1000)
  END AS t_datetime
FROM ids WHERE i % 10 <> 3
"""


# ---------------------------------------------------------------------------
# partial row images: binlog_row_image=MINIMAL / NOBLOB
#
# The same INSERT/UPDATE/DELETE discipline as the cdc frames above, but the
# UPDATE/DELETE events carry SPARSE images the way a server configured with
# binlog_row_image=MINIMAL (before = PK only, after = changed columns only)
# or NOBLOB (blob/TEXT columns omitted unless PK or changed) writes them.
# The reference reads the bitmap but assumes it full (src/binlog.rs:646-667)
# — it would decode garbage on such a stream; here absent columns surface
# as ABSENT (unknown != NULL) and the per-column merge reconstructs the
# exact same final table as the full-image pipeline, proven by sharing its
# arithmetic oracle.
# ---------------------------------------------------------------------------

SPARSE_CDC_N_ROWS = 2000
_SPARSE_PK = [0]          # wiretypes primary key: i
_SPARSE_CHANGED = [4, 13]  # the fixture UPDATE touches t_long, t_varchar


def sparse_cdc_frame_bytes(fid: int, n_rows: int, mode: str) -> bytes | None:
    """Deterministic wire bytes of partial-image CDC frame ``fid``:
    INSERTs ship full after-images (every column is "changed" by an
    INSERT, both modes), UPDATEs/DELETEs ship mode-shaped sparse ones."""
    from ru_cdc_spark.sources.binlog_wire import (
        ABSENT,
        DELETE_ROWS_V2,
        UPDATE_ROWS_V2,
        row_image_present,
    )

    lo = fid * ROWS_PER_EVENT
    rng = [i for i in range(lo, min(lo + ROWS_PER_EVENT, n_rows))]
    if not rng:
        return None
    ncols = len(SPECS)

    def mask(row: tuple, present: list[bool]) -> tuple:
        return tuple(v if p else ABSENT for v, p in zip(row, present))

    _, ins_a = row_image_present(SPECS, mode, _SPARSE_PK,
                                 changed_cols=list(range(ncols)))
    upd_b, upd_a = row_image_present(SPECS, mode, _SPARSE_PK,
                                     changed_cols=_SPARSE_CHANGED)
    del_b, _ = row_image_present(SPECS, mode, _SPARSE_PK, changed_cols=[])

    inserts = [mask(_row_values(i), ins_a) for i in rng]
    updates = [(mask(_row_values(i), upd_b), mask(_update_after(i), upd_a))
               for i in rng if i % 10 < 3]
    deletes = [mask(_row_values(i), del_b) for i in rng if i % 10 == 3]
    blob = encode_frame(43, "testdb", "wiretypes", SPECS,
                        WRITE_ROWS_V2, inserts, log_pos=lo, present=ins_a)
    if updates:
        blob += encode_frame(43, "testdb", "wiretypes", SPECS,
                             UPDATE_ROWS_V2, updates, log_pos=lo,
                             present=upd_b, present_after=upd_a)
    if deletes:
        blob += encode_frame(43, "testdb", "wiretypes", SPECS,
                             DELETE_ROWS_V2, deletes, log_pos=lo,
                             present=del_b)
    return blob


def generate_sparse_cdc_frames(spark: SparkSession, n_rows: int,
                               mode: str = "MINIMAL",
                               n_partitions: int = 8) -> DataFrame:
    n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames = [], []
            for fid in pdf["id"]:
                blob = sparse_cdc_frame_bytes(int(fid), n_rows, mode)
                if blob is None:
                    continue
                ids.append(int(fid))
                frames.append(blob)
            yield pd.DataFrame({"frame_id": ids, "frame": frames})

    return (spark.range(n_frames).repartition(n_partitions)
            .mapInPandas(gen, "frame_id long, frame binary"))


# value columns surfaced by the sparse decode; each carries a _present
# companion so the DataFrame keeps the ABSENT/NULL distinction the wire
# makes (a typed column can't hold a third marker value)
SPARSE_EMIT_COLS = [("t_long", 4), ("t_dec", 7), ("t_varchar", 13),
                    ("t_datetime", 10), ("t_text", 15)]

SPARSE_DECODED_SCHEMA = (
    "seq long, type string, i long, "
    "t_long long, t_long_present boolean, "
    "t_dec string, t_dec_present boolean, "
    "t_varchar string, t_varchar_present boolean, "
    "t_datetime timestamp_ntz, t_datetime_present boolean, "
    "t_text string, t_text_present boolean"
)


def decode_sparse_cdc_frames(frames: DataFrame) -> DataFrame:
    """Partial-image frame blobs -> sparse change stream. UPDATE rows key
    on the BEFORE image's PK (under MINIMAL the after image has no PK at
    all); each payload column ships (value, present) with present=False
    exactly where the wire carried no bytes."""
    from ru_cdc_spark.sources.binlog_wire import (
        ABSENT,
        DELETE_ROWS_V2,
        UPDATE_ROWS_V2,
        decode_rows_event,
        decode_table_map,
    )

    names = [n for n, _ in SPARSE_EMIT_COLS]

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {"seq": [], "type": [], "i": []}
            for n in names:
                cols[n] = []
                cols[n + "_present"] = []

            def emit(seq, typ, row):
                cols["seq"].append(seq)
                cols["type"].append(typ)
                cols["i"].append(row[0])
                for name, idx in SPARSE_EMIT_COLS:
                    v = row[idx]
                    present = v is not ABSENT
                    if not present:
                        v = None
                    elif name == "t_dec" and v is not None:
                        v = str(v)
                    cols[name].append(v)
                    cols[name + "_present"].append(present)

            for blob in pdf["frame"]:
                b = bytes(blob)
                off = 0
                while off < len(b):
                    tm_size = int.from_bytes(b[off + 9:off + 13], "little")
                    _, _, _, specs = decode_table_map(b[off:off + tm_size])
                    off += tm_size
                    ev_size = int.from_bytes(b[off + 9:off + 13], "little")
                    etype, rows = decode_rows_event(b[off:off + ev_size],
                                                    specs)
                    off += ev_size
                    for r in rows:
                        if etype == UPDATE_ROWS_V2:
                            before, after = r
                            pk = before[0]
                            emit(pk * 3 + 1, "UPDATE", (pk,) + after[1:])
                        elif etype == DELETE_ROWS_V2:
                            emit(r[0] * 3 + 2, "DELETE", r)
                        else:
                            emit(r[0] * 3, "INSERT", r)
            out = pd.DataFrame(cols)
            if len(out):
                out["t_datetime"] = pd.to_datetime(out["t_datetime"])
            yield out

    return frames.mapInPandas(dec, SPARSE_DECODED_SCHEMA)


# final state identical to the full-image pipeline's: the sparse merge
# must reconstruct exactly what FULL images would have produced, plus the
# t_text column the UPDATE never touches (its value must SURVIVE sparse
# updates — the bug a full-image-assuming decoder can't even express)
BINLOG_SPARSE_SNAPSHOT_ORACLE = BINLOG_CDC_SNAPSHOT_ORACLE.replace(
    f"range({BINLOG_CDC_N_ROWS})", f"range({SPARSE_CDC_N_ROWS})").replace(
    "FROM ids WHERE",
    "  , 't' || CAST(i * 3 AS VARCHAR) AS t_text\nFROM ids WHERE")


# ---------------------------------------------------------------------------
# multi-table streams: per-frame TABLE_MAP schema dispatch (D4/D5 registry)
# ---------------------------------------------------------------------------

MINI_COLUMNS = [
    ("i", ColSpec(T_LONGLONG)),
    ("m_dec", ColSpec(T_NEWDECIMAL, (10, 2))),
    ("m_name", ColSpec(T_VARCHAR, (120,))),   # 1-byte prefix
]
MINI_SPECS = [s for _, s in MINI_COLUMNS]

# the catalog: table name -> column names (binlog frames carry only types)
WIRE_CATALOG = {
    "wiretypes": [n for n, _ in COLUMNS],
    "minitable": [n for n, _ in MINI_COLUMNS],
}


def _mini_row(i: int) -> tuple:
    return (
        i,
        Decimal((i * 37) % 9999999 + 1).scaleb(-2),
        f"m_{i % 500}",
    )


def generate_multitable_frames(spark: SparkSession, n_rows: int,
                               n_partitions: int = 8) -> DataFrame:
    """Interleaved frames from TWO tables with different schemas — each
    frame's TABLE_MAP drives its own decode (the reference's table_id ->
    column-spec registry, binlog.rs:390-501, exercised across tables)."""
    n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames = [], []
            for fid in pdf["id"]:
                lo = int(fid) * ROWS_PER_EVENT
                rng = range(lo, min(lo + ROWS_PER_EVENT, n_rows))
                if not rng:
                    continue
                if int(fid) % 2 == 0:
                    blob = encode_frame(42, "testdb", "wiretypes", SPECS,
                                        WRITE_ROWS_V2,
                                        [_row_values(i) for i in rng],
                                        log_pos=lo)
                else:
                    blob = encode_frame(43, "testdb", "minitable", MINI_SPECS,
                                        WRITE_ROWS_V2,
                                        [_mini_row(i) for i in rng],
                                        log_pos=lo)
                ids.append(int(fid))
                frames.append(blob)
            yield pd.DataFrame({"frame_id": ids, "frame": frames})

    return (spark.range(n_frames).repartition(n_partitions)
            .mapInPandas(gen, "frame_id long, frame binary"))


def decode_multitable_stats(frames: DataFrame) -> DataFrame:
    """Decode a heterogeneous frame stream and emit per-table audit stats.

    The per-frame TABLE_MAP supplies the column SPECS; the catalog
    (WIRE_CATALOG) supplies the NAMES — the reference's split between the
    binlog-side and DESC-side registries (SURVEY §1.1)."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-batch yield: memory stays O(Arrow batch), not O(partition)
        for pdf in batches:
            out = {"table": [], "i": [], "payload_text": []}
            for blob in pdf["frame"]:
                schema, table, _etype, rows = decode_frame(bytes(blob))
                names = WIRE_CATALOG[table]
                for r in rows:
                    named = dict(zip(names, r))
                    out["table"].append(table)
                    out["i"].append(named["i"])
                    out["payload_text"].append(
                        named["t_varchar"] if table == "wiretypes"
                        else named["m_name"])
            yield pd.DataFrame(out)

    decoded = frames.mapInPandas(
        dec, "table string, i long, payload_text string")
    from pyspark.sql import functions as F
    return (decoded.groupBy("table")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("i").alias("sum_i"),
                 F.count("payload_text").alias("n_text")))


BINLOG_MULTITABLE_N_ROWS = 2000

BINLOG_MULTITABLE_ORACLE = f"""
WITH ids AS (SELECT UNNEST(range({BINLOG_MULTITABLE_N_ROWS})) AS i),
assigned AS (
    SELECT i,
           CASE WHEN (i // {ROWS_PER_EVENT}) % 2 = 0
                THEN 'wiretypes' ELSE 'minitable' END AS "table",
           CASE WHEN (i // {ROWS_PER_EVENT}) % 2 = 0
                THEN (CASE WHEN i % 13 = 0 THEN NULL ELSE 'x' END)
                ELSE 'm' END AS has_text
    FROM ids
)
SELECT "table", COUNT(*) AS n_rows,
       CAST(SUM(i) AS BIGINT) AS sum_i,
       COUNT(has_text) AS n_text
FROM assigned GROUP BY 1
"""


# ---------------------------------------------------------------------------
# schema evolution on the wire (the reference's D11 dead-code gap)
# ---------------------------------------------------------------------------

MINI_V2_COLUMNS = [*MINI_COLUMNS, ("m_year", ColSpec(T_YEAR))]
MINI_V2_SPECS = [s for _, s in MINI_V2_COLUMNS]

EVOLUTION_SPLIT_FRAME = 200  # frames >= this carry the widened schema


def _mini_v2_row(i: int) -> tuple:
    return (*_mini_row(i), 1900 + i % 155)


def generate_evolving_frames(spark: SparkSession, n_rows: int,
                             n_partitions: int = 8) -> DataFrame:
    """One table whose TABLE_MAP column set WIDENS mid-stream (an ALTER
    TABLE ADD COLUMN in binlog terms — the DDL path the reference decodes
    but never handles, D11). Early frames carry 3 columns, later frames 4;
    every frame's own TABLE_MAP remains self-describing."""
    n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames = [], []
            for fid in pdf["id"]:
                lo = int(fid) * ROWS_PER_EVENT
                rng = range(lo, min(lo + ROWS_PER_EVENT, n_rows))
                if not rng:
                    continue
                if int(fid) < EVOLUTION_SPLIT_FRAME:
                    blob = encode_frame(43, "testdb", "minitable", MINI_SPECS,
                                        WRITE_ROWS_V2,
                                        [_mini_row(i) for i in rng],
                                        log_pos=lo)
                else:
                    blob = encode_frame(43, "testdb", "minitable",
                                        MINI_V2_SPECS, WRITE_ROWS_V2,
                                        [_mini_v2_row(i) for i in rng],
                                        log_pos=lo)
                ids.append(int(fid))
                frames.append(blob)
            yield pd.DataFrame({"frame_id": ids, "frame": frames})

    return (spark.range(n_frames).repartition(n_partitions)
            .mapInPandas(gen, "frame_id long, frame binary"))


def decode_evolving(frames: DataFrame) -> DataFrame:
    """Decode the widening stream into the WIDENED schema: pre-evolution
    rows surface NULL for the added column — the catalog's widening rule
    (catalog.TableCatalog.evolve) applied at the byte layer. Column names
    resolve positionally against the version whose arity the frame's
    TABLE_MAP declares."""
    names_by_arity = {
        len(MINI_COLUMNS): [n for n, _ in MINI_COLUMNS],
        len(MINI_V2_COLUMNS): [n for n, _ in MINI_V2_COLUMNS],
    }
    wide = [n for n, _ in MINI_V2_COLUMNS]

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {n: [] for n in wide}
            for blob in pdf["frame"]:
                _schema, _table, _etype, rows = decode_frame(bytes(blob))
                for r in rows:
                    named = dict(zip(names_by_arity[len(r)], r))
                    for n in wide:
                        v = named.get(n)
                        if n == "m_dec" and v is not None:
                            v = str(v)
                        out[n].append(v)
            yield pd.DataFrame(out)

    return frames.mapInPandas(
        dec, "i long, m_dec string, m_name string, m_year long")


EVOLUTION_N_ROWS = 2000

BINLOG_EVOLUTION_ORACLE = f"""
WITH ids AS (SELECT UNNEST(range({EVOLUTION_N_ROWS})) AS i)
SELECT i,
       CAST(((i * 37) % 9999999 + 1) // 100 AS VARCHAR) || '.'
           || lpad(CAST(((i * 37) % 9999999 + 1) % 100 AS VARCHAR), 2, '0')
           AS m_dec,
       'm_' || CAST(i % 500 AS VARCHAR) AS m_name,
       CASE WHEN i // {ROWS_PER_EVENT} >= {EVOLUTION_SPLIT_FRAME}
            THEN 1900 + i % 155 END AS m_year
FROM ids
"""


# ---------------------------------------------------------------------------
# ENUM / SET / BIT columns (beyond the reference's 16 supported types —
# SURVEY §1.2 lists them as unsupported there; real MySQL tables use them)
# ---------------------------------------------------------------------------

ENUM_LABELS = ["red", "green", "blue", "black"]
SET_LABELS = ["r", "w", "x"]

ESB_COLUMNS = [
    ("i", ColSpec(T_LONGLONG)),
    ("color", ColSpec(T_ENUM, (1,))),   # 1-byte index (< 256 labels)
    ("perms", ColSpec(T_SET, (1,))),    # 1-byte member bitmask
    ("flags", ColSpec(T_BIT, (10,))),   # BIT(10): 2 bytes big-endian
]
ESB_SPECS = [s for _, s in ESB_COLUMNS]
ESB_N_ROWS = 2000


def _esb_row(i: int) -> tuple:
    return (i, i % 4 + 1, i % 8, i % 1024)


def generate_esb_frames(spark: SparkSession, n_rows: int = ESB_N_ROWS,
                        n_partitions: int = 8) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames = [], []
            for fid in pdf["id"]:
                lo = int(fid) * ROWS_PER_EVENT
                rng = range(lo, min(lo + ROWS_PER_EVENT, n_rows))
                if not rng:
                    continue
                ids.append(int(fid))
                frames.append(encode_frame(
                    55, "testdb", "esbtable", ESB_SPECS, WRITE_ROWS_V2,
                    [_esb_row(i) for i in rng], log_pos=lo))
            yield pd.DataFrame({"frame_id": ids, "frame": frames})

    n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT
    return (spark.range(n_frames).repartition(n_partitions)
            .mapInPandas(gen, "frame_id long, frame binary"))


def decode_esb(frames: DataFrame) -> DataFrame:
    """Wire decode (index/bitmask/int) then catalog-side label
    resolution: ENUM index -> label array lookup, SET bitmask ->
    comma-joined member labels, BIT -> integer. The split mirrors the
    two-layer registry: the binlog never carries labels — ``DESC`` does
    (reference executor.rs:404-443)."""
    from pyspark.sql import functions as F

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"i": [], "color_idx": [], "perms_mask": [], "flags": []}
            for blob in pdf["frame"]:
                _s, _t, _e, rows = decode_frame(bytes(blob))
                for i, color, perms, flags in rows:
                    out["i"].append(i)
                    out["color_idx"].append(color)
                    out["perms_mask"].append(perms)
                    out["flags"].append(flags)
            yield pd.DataFrame(out)

    raw = frames.mapInPandas(
        dec, "i long, color_idx long, perms_mask long, flags long")
    color = F.element_at(
        F.array(*[F.lit(x) for x in ENUM_LABELS]),
        F.col("color_idx").cast("int"))
    perms = F.concat_ws(",", *[
        F.when(F.col("perms_mask").bitwiseAND(1 << b) != 0, F.lit(lab))
        for b, lab in enumerate(SET_LABELS)])
    return raw.select("i", color.alias("color"), perms.alias("perms"),
                      "flags")


BINLOG_ESB_ORACLE = f"""
WITH ids AS (SELECT UNNEST(range({ESB_N_ROWS})) AS i)
SELECT i,
       ['red', 'green', 'blue', 'black'][i % 4 + 1] AS color,
       concat_ws(',',
           CASE WHEN (i % 8) & 1 = 1 THEN 'r' END,
           CASE WHEN (i % 8) & 2 = 2 THEN 'w' END,
           CASE WHEN (i % 8) & 4 = 4 THEN 'x' END) AS perms,
       i % 1024 AS flags
FROM ids
"""


# ---------------------------------------------------------------------------
# JSON columns (type 245 — reference: "no JSON column type", SURVEY §1.2)
# ---------------------------------------------------------------------------

JSON_COLUMNS = [
    ("i", ColSpec(T_LONGLONG)),
    ("doc", ColSpec(T_JSON, (2,))),
]
JSON_SPECS = [s for _, s in JSON_COLUMNS]
JSON_N_ROWS = 2000


def _json_doc(i: int) -> dict:
    # canonical key order (len, bytes): id, tag, meta, vals — what the
    # binary encoder stores and the decoder re-emits
    return {
        "id": i,
        "tag": f"t_{i % 50}",
        "meta": {"ok": None if i % 5 == 0 else True},
        "vals": [i % 7, i % 2 == 0],
    }


def generate_json_frames(spark: SparkSession, n_rows: int = JSON_N_ROWS,
                         n_partitions: int = 8) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames = [], []
            for fid in pdf["id"]:
                lo = int(fid) * ROWS_PER_EVENT
                rng = range(lo, min(lo + ROWS_PER_EVENT, n_rows))
                if not rng:
                    continue
                ids.append(int(fid))
                frames.append(encode_frame(
                    56, "testdb", "jsontable", JSON_SPECS, WRITE_ROWS_V2,
                    [(i, _json_doc(i)) for i in rng], log_pos=lo))
            yield pd.DataFrame({"frame_id": ids, "frame": frames})

    n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT
    return (spark.range(n_frames).repartition(n_partitions)
            .mapInPandas(gen, "frame_id long, frame binary"))


def decode_json_frames(frames: DataFrame) -> DataFrame:
    """Binary JSON documents decoded to canonical text, then queried with
    Spark's NATIVE JSON functions (get_json_object — JVM-side, codegen):
    the handoff a CDC consumer needs is wire bytes -> JSON text -> SQL
    path extraction, all inside the engine."""
    from pyspark.sql import functions as F

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"i": [], "doc": []}
            for blob in pdf["frame"]:
                _s, _t, _e, rows = decode_frame(bytes(blob))
                for i, doc in rows:
                    out["i"].append(i)
                    out["doc"].append(doc)
            yield pd.DataFrame(out)

    raw = frames.mapInPandas(dec, "i long, doc string")
    return raw.select(
        "i", "doc",
        F.get_json_object("doc", "$.id").cast("long").alias("jid"),
        F.get_json_object("doc", "$.tag").alias("tag"),
        F.get_json_object("doc", "$.vals[0]").cast("long").alias("v0"))


BINLOG_JSON_ORACLE = f"""
WITH ids AS (SELECT UNNEST(range({JSON_N_ROWS})) AS i)
SELECT i,
       '{{"id":' || CAST(i AS VARCHAR)
         || ',"tag":"t_' || CAST(i % 50 AS VARCHAR)
         || '","meta":{{"ok":'
         || CASE WHEN i % 5 = 0 THEN 'null' ELSE 'true' END
         || '}},"vals":[' || CAST(i % 7 AS VARCHAR) || ','
         || CASE WHEN i % 2 = 0 THEN 'true' ELSE 'false' END
         || ']}}' AS doc,
       i AS jid,
       't_' || CAST(i % 50 AS VARCHAR) AS tag,
       i % 7 AS v0
FROM ids
"""


# ---------------------------------------------------------------------------
# MySQL 8 partial JSON updates (PARTIAL_UPDATE_ROWS_EVENT, type 39):
# UPDATEs whose JSON after-image is a DIFF sequence against the before
# image (binlog_row_value_options=PARTIAL_JSON). The wire layer applies
# the diffs (sources/mysql_json_diff.py), so downstream sees normal
# (before, after) pairs — proven here by hash-matching a DuckDB oracle
# that reconstructs every post-diff document arithmetically.
# ---------------------------------------------------------------------------

PARTIAL_JSON_N_ROWS = 2000


def _partial_json_diffs(i: int) -> list:
    from ru_cdc_spark.sources.mysql_json_diff import (
        DIFF_INSERT,
        DIFF_REMOVE,
        DIFF_REPLACE,
    )

    diffs = [
        (DIFF_REPLACE, "$.tag", f"u_{i % 50}"),
        (DIFF_REPLACE, "$.vals[0]", (i * 3) % 7),
        (DIFF_INSERT, "$.rev", i % 9),
    ]
    if i % 3 == 0:
        diffs.append((DIFF_REMOVE, "$.meta.ok"))
    return diffs


def generate_partial_json_frames(spark: SparkSession,
                                 n_rows: int = PARTIAL_JSON_N_ROWS,
                                 n_partitions: int = 8) -> DataFrame:
    from ru_cdc_spark.sources.binlog_wire import (
        encode_partial_update_rows_event,
        encode_table_map,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames = [], []
            for fid in pdf["id"]:
                lo = int(fid) * ROWS_PER_EVENT
                rng = range(lo, min(lo + ROWS_PER_EVENT, n_rows))
                if not rng:
                    continue
                rows = [((i, _json_doc(i)), (i, True),
                         {1: _partial_json_diffs(i)}) for i in rng]
                ids.append(int(fid))
                frames.append(
                    encode_table_map(57, "testdb", "jsonpartial",
                                     JSON_SPECS)
                    + encode_partial_update_rows_event(57, JSON_SPECS,
                                                       rows, log_pos=lo))
            yield pd.DataFrame({"frame_id": ids, "frame": frames})

    n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT
    return (spark.range(n_frames).repartition(n_partitions)
            .mapInPandas(gen, "frame_id long, frame binary"))


def decode_partial_json_frames(frames: DataFrame) -> DataFrame:
    """Type-39 frames -> (i, doc, tag, rev, v0): the reconstructed
    after-image document queried with Spark's native get_json_object,
    exactly like the full-image JSON path."""
    from pyspark.sql import functions as F

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"i": [], "doc": []}
            for blob in pdf["frame"]:
                _s, _t, _e, rows = decode_frame(bytes(blob))
                for before, after in rows:
                    out["i"].append(after[0])
                    out["doc"].append(after[1])
            yield pd.DataFrame(out)

    raw = frames.mapInPandas(dec, "i long, doc string")
    return raw.select(
        "i", "doc",
        F.get_json_object("doc", "$.tag").alias("tag"),
        F.get_json_object("doc", "$.rev").cast("long").alias("rev"),
        F.get_json_object("doc", "$.vals[0]").cast("long").alias("v0"))


BINLOG_PARTIAL_JSON_ORACLE = f"""
WITH ids AS (SELECT UNNEST(range({PARTIAL_JSON_N_ROWS})) AS i)
SELECT i,
       '{{"id":' || CAST(i AS VARCHAR)
         || ',"tag":"u_' || CAST(i % 50 AS VARCHAR)
         || '","meta":'
         || CASE WHEN i % 3 = 0 THEN '{{}}'
                 WHEN i % 5 = 0 THEN '{{"ok":null}}'
                 ELSE '{{"ok":true}}' END
         || ',"vals":[' || CAST((i * 3) % 7 AS VARCHAR) || ','
         || CASE WHEN i % 2 = 0 THEN 'true' ELSE 'false' END
         || '],"rev":' || CAST(i % 9 AS VARCHAR) || '}}' AS doc,
       'u_' || CAST(i % 50 AS VARCHAR) AS tag,
       i % 9 AS rev,
       (i * 3) % 7 AS v0
FROM ids
"""


# ---------------------------------------------------------------------------
# WL#4618 FULL-metadata decode (MySQL 8 binlog_row_metadata=FULL) and
# pre-5.6 legacy temporal / GEOMETRY wire types — round-7 verdict items
# #3 and #8. Both fixtures are pure functions of the row id, so DuckDB
# oracles recompute every value arithmetically.
# ---------------------------------------------------------------------------

META_FULL_NAMES = ["k", "u8", "u16", "u32", "u64", "color", "flags"]
_ENUM_LABELS = ("red", "green", "blue", "teal", "mauve")
_SET_LABELS = ("a", "b", "c")


def _meta_full_specs():
    from ru_cdc_spark.sources.binlog_wire import T_ENUM as E, T_SET as S

    return [
        ColSpec(T_LONGLONG),
        ColSpec(T_TINY, unsigned=True),
        ColSpec(T_SHORT, unsigned=True),
        ColSpec(T_LONG, unsigned=True),
        ColSpec(T_LONGLONG, unsigned=True),
        ColSpec(E, (1,), labels=_ENUM_LABELS),
        ColSpec(S, (1,), labels=_SET_LABELS),
    ]


def _meta_row_values(i: int) -> tuple:
    """Full-range unsigned values (every one would decode WRONG as
    signed) + enum index incl. the invalid-0 empty string + set mask."""
    return (
        i,
        (i * 37) % 256,                       # top bit set half the time
        (i * 7919) % 65536,
        (i * 2654435761) % (1 << 32),
        (1 << 63) + i,                        # always beyond int64
        i % (len(_ENUM_LABELS) + 1),          # 0 = MySQL invalid -> ''
        i % (1 << len(_SET_LABELS)),
    )


def generate_metadata_frames(spark: SparkSession, n_rows: int,
                             n_partitions: int = 8) -> DataFrame:
    """Frames whose TABLE_MAP carries the WL#4618 FULL metadata block:
    SIGNEDNESS, COLUMN_NAME, ENUM/SET_STR_VALUE, SIMPLE_PRIMARY_KEY."""
    specs = _meta_full_specs()
    n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for fid in pdf["id"]:
                rows = [_meta_row_values(i)
                        for i in range(int(fid) * ROWS_PER_EVENT,
                                       min((int(fid) + 1) * ROWS_PER_EVENT,
                                           n_rows))]
                frames.append(encode_frame(
                    51, "testdb", "meta_full", specs, WRITE_ROWS_V2, rows,
                    log_pos=int(fid), full_metadata=True,
                    column_names=META_FULL_NAMES, primary_key=[0]))
            yield pd.DataFrame({"frame_id": pdf["id"], "frame": frames})

    return (spark.range(n_frames).repartition(n_partitions)
            .mapInPandas(gen, "frame_id long, frame binary"))


def decode_metadata_frames(frames: DataFrame) -> DataFrame:
    """Catalog-FREE decode: column names come off the wire (COLUMN_NAME
    TLV), signedness/labels are already folded into the specs by
    decode_table_map — no DESC connection anywhere. Raises if the frame
    lacks the metadata block (this path must never silently fall back)."""
    from ru_cdc_spark.sources.binlog_wire import decode_frame_ext

    out_schema = ("k long, u8 long, u16 long, u32 long, u64 string, "
                  "color string, flags string")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for raw in pdf["frame"]:
                schema, table, _etype, rows, tm = decode_frame_ext(
                    bytes(raw))
                names = tm.get("column_names")
                if not names:
                    raise ValueError(
                        "TABLE_MAP carries no WL#4618 COLUMN_NAME block")
                if tm.get("primary_key") != [0]:
                    raise ValueError("missing/wrong SIMPLE_PRIMARY_KEY")
                for row in rows:
                    r = dict(zip(names, row))
                    r["u64"] = str(r["u64"])
                    recs.append(r)
            yield pd.DataFrame(recs, columns=META_FULL_NAMES)

    return frames.mapInPandas(dec, out_schema)


BINLOG_METADATA_N_ROWS = 2000

BINLOG_METADATA_ORACLE = f"""
WITH ids AS (SELECT UNNEST(range({BINLOG_METADATA_N_ROWS})) AS i)
SELECT i AS k,
  (i * 37) % 256 AS u8,
  (i * 7919) % 65536 AS u16,
  (i * 2654435761) % 4294967296 AS u32,
  CAST(CAST(9223372036854775808 AS HUGEINT) + i AS VARCHAR) AS u64,
  CASE i % 6 WHEN 1 THEN 'red' WHEN 2 THEN 'green' WHEN 3 THEN 'blue'
             WHEN 4 THEN 'teal' WHEN 5 THEN 'mauve' ELSE '' END AS color,
  CASE i % 8 WHEN 0 THEN '' WHEN 1 THEN 'a' WHEN 2 THEN 'b'
             WHEN 3 THEN 'a,b' WHEN 4 THEN 'c' WHEN 5 THEN 'a,c'
             WHEN 6 THEN 'b,c' ELSE 'a,b,c' END AS flags
FROM ids
"""


LEGACY_NAMES = ["k", "ts7_epoch_us", "time11_us", "dt12", "srid",
                "wkb_hex"]


def _legacy_specs():
    from ru_cdc_spark.sources.binlog_wire import (
        T_DATETIME,
        T_GEOMETRY,
        T_TIME,
        T_TIMESTAMP,
    )

    return [
        ColSpec(T_LONGLONG),
        ColSpec(T_TIMESTAMP),
        ColSpec(T_TIME),
        ColSpec(T_DATETIME),
        ColSpec(T_GEOMETRY, (2,)),
    ]


def _legacy_row_values(i: int) -> tuple:
    sign = -1 if i % 2 else 1
    tm = sign * (((i % 120) * 3600 + (i % 60) * 60 + (i * 7) % 60)
                 * 1_000_000)
    dt = (None if i % 19 == 0
          else datetime(1995 + i % 30, 1 + i % 12, 1 + i % 28,
                        i % 24, i % 60, (i * 3) % 60))
    srid = (i * 31) % 10000
    geo = srid.to_bytes(4, "little") + i.to_bytes(8, "big")
    return (i, (1_500_000_000 + i) * 1_000_000, tm, dt, geo)


def generate_legacy_frames(spark: SparkSession, n_rows: int,
                           n_partitions: int = 8) -> DataFrame:
    """Frames using the PRE-5.6.4 temporal type codes (7/11/12) and
    GEOMETRY (255) — what a capture from an old server or a spatial
    table carries. The reference fails on all four (binlog.rs:159-204
    matches only the v2 temporals and no type 255)."""
    specs = _legacy_specs()
    n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for fid in pdf["id"]:
                rows = [_legacy_row_values(i)
                        for i in range(int(fid) * ROWS_PER_EVENT,
                                       min((int(fid) + 1) * ROWS_PER_EVENT,
                                           n_rows))]
                frames.append(encode_frame(
                    52, "testdb", "legacy_types", specs, WRITE_ROWS_V2,
                    rows, log_pos=int(fid)))
            yield pd.DataFrame({"frame_id": pdf["id"], "frame": frames})

    return (spark.range(n_frames).repartition(n_partitions)
            .mapInPandas(gen, "frame_id long, frame binary"))


def decode_legacy_frames(frames: DataFrame) -> DataFrame:
    out_schema = ("k long, ts7_epoch_us long, time11_us long, "
                  "dt12 timestamp_ntz, srid long, wkb_hex string")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for raw in pdf["frame"]:
                _s, _t, _e, rows = decode_frame(bytes(raw))
                for k, ts7, tm, dt, geo in rows:
                    recs.append((k, ts7, tm, dt,
                                 int.from_bytes(geo[:4], "little"),
                                 geo[4:].hex()))
            pf = pd.DataFrame(recs, columns=LEGACY_NAMES)
            if len(pf):
                pf["dt12"] = pd.to_datetime(pf["dt12"])
            yield pf

    return frames.mapInPandas(dec, out_schema)


BINLOG_LEGACY_N_ROWS = 2000

BINLOG_LEGACY_ORACLE = f"""
WITH ids AS (SELECT UNNEST(range({BINLOG_LEGACY_N_ROWS})) AS i)
SELECT i AS k,
  (1500000000 + i) * 1000000 AS ts7_epoch_us,
  (CASE WHEN i % 2 = 1 THEN -1 ELSE 1 END)
    * (((i % 120) * 3600 + (i % 60) * 60 + (i * 7) % 60) * 1000000)
    AS time11_us,
  CASE WHEN i % 19 = 0 THEN NULL
       ELSE make_timestamp(1995 + i % 30, 1 + i % 12, 1 + i % 28,
                           i % 24, i % 60, (i * 3) % 60)
  END AS dt12,
  (i * 31) % 10000 AS srid,
  lpad(lower(hex(i)), 16, '0') AS wkb_hex
FROM ids
"""


# ---------------------------------------------------------------------------
# GEOMETRY decode beyond passthrough (round-9 verdict item #7): REAL
# OGC WKB bodies (point / linestring / polygon, BOTH byte orders)
# carried through the binlog type-255 BLOB framing, decoded by the
# spec-built functions/wkb.py parser into queryable typed columns.
# The fixture is a pure function of the row id, so the DuckDB oracle
# recomputes SRID, type, point count, and the exact WKT string
# arithmetically — no spatial extension needed.
# ---------------------------------------------------------------------------

GEOMETRY_NAMES = ["k", "srid", "geom_type", "n_points", "wkt"]


def _geometry_specs():
    from ru_cdc_spark.sources.binlog_wire import T_GEOMETRY

    return [ColSpec(T_LONGLONG), ColSpec(T_GEOMETRY, (2,))]


def _geometry_row_values(i: int) -> tuple:
    from ru_cdc_spark.functions.wkb import (
        WKB_GEOMETRYCOLLECTION,
        WKB_MULTIPOINT,
        encode_wkb_linestring,
        encode_wkb_multi,
        encode_wkb_point,
        encode_wkb_polygon,
    )

    srid = (i * 31) % 10000
    little = i % 2 == 1  # alternate byte orders: both must decode
    t = i % 5
    if t == 0:
        wkb = encode_wkb_point(float(i % 181), float((i * 7) % 293),
                               little)
    elif t == 1:
        lx, ly = i % 50, i % 60
        wkb = encode_wkb_linestring(
            [(float(lx), float(ly)), (float(lx + 5), float(ly + 3)),
             (float(lx + 9), float(ly + 11))], little)
    elif t == 2:
        ax, ay = i % 40, (i * 3) % 50
        ring = [(float(ax), float(ay)), (float(ax + 4), float(ay)),
                (float(ax + 4), float(ay + 4)),
                (float(ax), float(ay + 4)), (float(ax), float(ay))]
        wkb = encode_wkb_polygon([ring], little)
    elif t == 3:
        mx, my = i % 100, i % 90
        # members deliberately mix byte orders (the spec allows it)
        wkb = encode_wkb_multi(WKB_MULTIPOINT, [
            encode_wkb_point(float(mx), float(my), little),
            encode_wkb_point(float(mx + 3), float(my + 2),
                             not little)], little)
    else:
        gx, gy = i % 70, (i * 11) % 80
        wkb = encode_wkb_multi(WKB_GEOMETRYCOLLECTION, [
            encode_wkb_point(float(gx), float(gy), little),
            encode_wkb_linestring(
                [(float(gx + 1), float(gy + 1)),
                 (float(gx + 2), float(gy + 5))], little)], little)
    return (i, srid.to_bytes(4, "little") + wkb)


def generate_geometry_frames(spark: SparkSession, n_rows: int,
                             n_partitions: int = 8) -> DataFrame:
    """WRITE_ROWS_v2 frames whose type-255 column carries real
    SRID-prefixed WKB (what a spatial table's binlog rows hold)."""
    specs = _geometry_specs()
    n_frames = (n_rows + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for fid in pdf["id"]:
                rows = [_geometry_row_values(i)
                        for i in range(int(fid) * ROWS_PER_EVENT,
                                       min((int(fid) + 1) * ROWS_PER_EVENT,
                                           n_rows))]
                frames.append(encode_frame(
                    53, "testdb", "spatial", specs, WRITE_ROWS_V2,
                    rows, log_pos=int(fid)))
            yield pd.DataFrame({"frame_id": pdf["id"], "frame": frames})

    return (spark.range(n_frames).repartition(n_partitions)
            .mapInPandas(gen, "frame_id long, frame binary"))


def decode_geometry_frames(frames: DataFrame) -> DataFrame:
    """Wire passthrough -> typed spatial columns: SRID off the 4-byte
    LE prefix, the WKB body STRICTLY parsed (unknown type / truncation
    / trailing bytes raise), point count and canonical WKT emitted."""
    out_schema = ("k long, srid long, geom_type string, "
                  "n_points int, wkt string")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ru_cdc_spark.functions.wkb import (
            decode_mysql_geometry,
            n_points,
            wkt,
        )

        for pdf in batches:
            recs = []
            for raw in pdf["frame"]:
                _s, _t, _e, rows = decode_frame(bytes(raw))
                for k, geo in rows:
                    srid, geom = decode_mysql_geometry(bytes(geo))
                    recs.append((k, srid, geom["type"],
                                 n_points(geom), wkt(geom)))
            yield pd.DataFrame(recs, columns=GEOMETRY_NAMES)

    return frames.mapInPandas(dec, out_schema)


BINLOG_GEOMETRY_N_ROWS = 2000

BINLOG_GEOMETRY_ORACLE = f"""
WITH ids AS (SELECT UNNEST(range({BINLOG_GEOMETRY_N_ROWS})) AS i),
g AS (
    SELECT i, (i * 31) % 10000 AS srid, i % 5 AS t,
           i % 181 AS px, (i * 7) % 293 AS py,
           i % 50 AS lx, i % 60 AS ly,
           i % 40 AS ax, (i * 3) % 50 AS ay,
           i % 100 AS mx, i % 90 AS my,
           i % 70 AS gx, (i * 11) % 80 AS gy
    FROM ids)
SELECT i AS k, srid,
  CASE t WHEN 0 THEN 'POINT' WHEN 1 THEN 'LINESTRING'
         WHEN 2 THEN 'POLYGON' WHEN 3 THEN 'MULTIPOINT'
         ELSE 'GEOMETRYCOLLECTION' END AS geom_type,
  CAST(CASE t WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 5
              WHEN 3 THEN 2 ELSE 3 END AS INT) AS n_points,
  CASE t
    WHEN 0 THEN 'POINT(' || px || ' ' || py || ')'
    WHEN 1 THEN 'LINESTRING(' || lx || ' ' || ly || ','
                || (lx + 5) || ' ' || (ly + 3) || ','
                || (lx + 9) || ' ' || (ly + 11) || ')'
    WHEN 2 THEN 'POLYGON((' || ax || ' ' || ay || ','
         || (ax + 4) || ' ' || ay || ','
         || (ax + 4) || ' ' || (ay + 4) || ','
         || ax || ' ' || (ay + 4) || ','
         || ax || ' ' || ay || '))'
    WHEN 3 THEN 'MULTIPOINT((' || mx || ' ' || my || '),('
         || (mx + 3) || ' ' || (my + 2) || '))'
    ELSE 'GEOMETRYCOLLECTION(POINT(' || gx || ' ' || gy
         || '),LINESTRING(' || (gx + 1) || ' ' || (gy + 1) || ','
         || (gx + 2) || ' ' || (gy + 5) || '))'
  END AS wkt
FROM g
"""
