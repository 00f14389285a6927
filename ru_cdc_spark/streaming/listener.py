"""Throughput observability (SURVEY.md §2.9 O1).

The reference prints per-second MB/s + packet counts from the reader thread
(/root/reference/src/statistics.rs:4-35). Spark surfaces the same numbers
through StreamingQueryListener progress events; this listener collects them
(rows/sec in and processed, batch durations) and can print the same style
of line."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ProgressStats:
    batches: int = 0
    total_input_rows: int = 0
    last_input_rows_per_sec: float = 0.0
    last_processed_rows_per_sec: float = 0.0
    history: list = field(default_factory=list)


class ThroughputListener(StreamingQueryListener):
    """Collects per-batch throughput; ``stats`` is read by tests/operators.

    On a production cluster the same events feed the metrics sink
    (Prometheus/StreamingQueryListener -> event log); nothing here touches
    the data plane.
    """

    def __init__(self, echo: bool = False) -> None:
        self.stats = ProgressStats()
        self._echo = echo

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.stats.batches += 1
        self.stats.total_input_rows += p.numInputRows
        self.stats.last_input_rows_per_sec = p.inputRowsPerSecond or 0.0
        self.stats.last_processed_rows_per_sec = p.processedRowsPerSecond or 0.0
        self.stats.history.append(
            (time.time(), p.numInputRows, p.processedRowsPerSecond))
        if self._echo:
            print(f"[stream] batch={p.batchId} rows={p.numInputRows} "
                  f"proc/s={p.processedRowsPerSecond:.0f}")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
