"""A real Structured Streaming DataSource for binlog-style CDC ingestion
(Spark 4 Python DataSource V2 API).

This is the engine-native analog of the reference's binlog subscription
path — not a file drop: the source tracks a monotone log position as its
streaming offset, exactly like the reference's ``PositionSet``:

| reference                                               | here |
|---------------------------------------------------------|------|
| ``COM_BINLOG_DUMP`` from (file, pos) (protocal.rs:277-293, main.rs:94-100) | ``initialOffset`` / checkpointed offset |
| serve read loop (main.rs:109-130)                       | ``latestOffset`` + ``partitions`` + ``read`` micro-batch cycle |
| position checkpoint (position_manager.rs:17-53)         | Spark's offset/commit logs (``commit`` callback) |
| resume resolution incl. ``from_start`` (position_manager.rs:114-150) | ``start_pos`` option vs checkpoint-restored offset |
| flow control absent (README.md:8-12 OOM story)          | ``events_per_batch`` bounds every micro-batch |

The feed itself is a deterministic generator (no MySQL in the container):
event ``i`` is a Canal-style payload derived from ``i`` alone, so tests
can assert exactly-once across kill/restart by id arithmetic.

Scale: ``partitions()`` splits each offset range into ``n_partitions``
independent slices read executor-side — reader parallelism is a config,
the driver never materializes events. A real MySQL implementation swaps
the generator in ``read`` for a socket client; offsets, partitioning,
resume, and backpressure stay exactly as written here.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = ("pos long, id long, database string, table string, "
              "type string, es long, payload string")

_TYPES = ("INSERT", "UPDATE", "DELETE")


def _event(i: int) -> tuple:
    """Deterministic binlog event #i (the stand-in for socket decode)."""
    etype = _TYPES[i % 10 % 3] if i % 10 < 6 else "INSERT"
    database = f"shard_{i % 4}"
    table = "orders" if i % 2 == 0 else "customer"
    es = 1_700_000_000_000 + i * 1000
    payload = json.dumps({
        "id": i, "database": database, "table": table, "type": etype,
        "es": es, "data": [{"k": str(i), "v": str(i * 7 % 1000)}],
    }, separators=(",", ":"))
    return (i, i, database, table, etype, es, payload)


class RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int) -> None:
        self.lo = lo
        self.hi = hi


class BinlogFeedStreamReader(DataSourceStreamReader):
    """Reader state does NOT survive a query restart (a fresh reader is
    constructed), so the advancing position is persisted to a tiny JSON
    file — the same design as the reference's ``~/.ru_cdc/meta.json``
    position store (position_manager.rs:10-53), here only *advisory*:
    Spark's offset log remains the source of truth for what was read, the
    file merely lets a restarted reader continue advancing instead of
    re-announcing old offsets (re-announced ranges would yield empty
    batches, never duplicates — ``read`` spans exactly [start, end)).
    """

    def __init__(self, options: dict) -> None:
        self.total = int(options.get("total_events", 1000))
        self.per_batch = int(options.get("events_per_batch", 250))
        self.n_parts = int(options.get("n_partitions", 4))
        self.start_pos = int(options.get("start_pos", 0))
        self.position_file = options.get("position_file")

    def _load_pos(self) -> int:
        if self.position_file and os.path.exists(self.position_file):
            with open(self.position_file) as fh:
                return int(json.load(fh)["pos"])
        return self.start_pos

    def _save_pos(self, pos: int) -> None:
        if self.position_file:
            tmp = f"{self.position_file}.tmp"
            with open(tmp, "w") as fh:
                json.dump({"pos": pos}, fh)
            os.replace(tmp, self.position_file)

    def initialOffset(self) -> dict:  # noqa: N802
        return {"pos": self.start_pos}

    def latestOffset(self) -> dict:  # noqa: N802
        # advance at most one bounded batch per trigger — the flow control
        # the reference lacks (its unbounded mpsc is the Canal OOM story)
        pos = min(self._load_pos() + self.per_batch, self.total)
        self._save_pos(pos)
        return {"pos": pos}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["pos"]), int(end["pos"])
        if hi <= lo:
            return [RangePartition(lo, lo)]
        step = max(1, (hi - lo + self.n_parts - 1) // self.n_parts)
        return [RangePartition(p, min(p + step, hi))
                for p in range(lo, hi, step)]

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        for i in range(partition.lo, partition.hi):
            yield _event(i)

    def commit(self, end: dict) -> None:
        # positions are durable in Spark's commit log; nothing to do —
        # this hook is where a real reader would ack/trim upstream
        pass


class BinlogFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "binlog_feed"

    def schema(self) -> str:
        return SCHEMA_DDL

    def streamReader(self, schema: StructType) -> BinlogFeedStreamReader:  # noqa: N802
        return BinlogFeedStreamReader(dict(self.options))


def register_binlog_source(spark) -> None:
    spark.dataSource.register(BinlogFeedDataSource)


# ---------------------------------------------------------------------------
# wire-bytes variant: the source delivers RAW binlog frames
# ---------------------------------------------------------------------------

WIRE_SCHEMA_DDL = "pos long, frame binary"


class BinlogWireStreamReader(BinlogFeedStreamReader):
    """Same offset/partitioning/resume machinery as the JSON feed, but the
    payload is the raw binlog FRAME BYTES (TABLE_MAP + ROWS events) — the
    exact production shape: a socket client's bytes land here, and
    everything downstream (decode_cdc_frames -> merge) is unchanged.
    Offsets count FRAMES (log positions), as the reference checkpoints
    binlog positions, not row counts."""

    def __init__(self, options: dict) -> None:
        super().__init__(options)
        self.rows_total = int(options.get("total_rows", 1000))
        if "total_events" not in options:
            # offsets count FRAMES: derive the frame total from the row
            # total so default-configured readers don't announce ranges
            # past the end of the data
            from ru_cdc_spark.sources.binlog_frames import ROWS_PER_EVENT

            self.total = (self.rows_total + ROWS_PER_EVENT - 1) // ROWS_PER_EVENT

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        from ru_cdc_spark.sources.binlog_frames import cdc_frame_bytes

        for fid in range(partition.lo, partition.hi):
            blob = cdc_frame_bytes(fid, self.rows_total)
            if blob is not None:
                yield (fid, blob)


class BinlogWireDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "binlog_wire_feed"

    def schema(self) -> str:
        return WIRE_SCHEMA_DDL

    def streamReader(self, schema: StructType) -> BinlogWireStreamReader:  # noqa: N802
        return BinlogWireStreamReader(dict(self.options))


def register_binlog_wire_source(spark) -> None:
    spark.dataSource.register(BinlogWireDataSource)
