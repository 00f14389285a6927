"""Custom stateful streaming operator via applyInPandasWithState.

The engine's extension point for operators Structured Streaming lacks as
built-ins (SURVEY.md §2.10 lists the reference as having none at all):
arbitrary per-key state updated batch-by-batch with Arrow-batched pandas.

Demonstrated operator: per-user running event counter + running value sum,
emitting the updated totals each micro-batch (the shape of a feature-store
accumulator or per-entity CDC statistics).

Scale: state is partitioned by key across executors and checkpointed in
the state store; each micro-batch touches only keys present in the batch.
State size per key is O(1) here — for unbounded-state operators add TTL
via GroupStateTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({
        "user_id": [key[0]], "n_events": [n], "total_value": [total],
    })


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """events (user_id, value, ...) stream -> per-user running totals,
    one output row per key per batch with the post-batch state."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
