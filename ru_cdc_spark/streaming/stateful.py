"""Custom stateful streaming operator via applyInPandasWithState.

The engine's extension point for operators Structured Streaming lacks as
built-ins (SURVEY.md §2.10 lists the reference as having none at all):
arbitrary per-key state updated batch-by-batch with Arrow-batched pandas.

(Spark 4's successor API, ``transformWithStateInPandas`` — typed state
variables, timers, TTL — is present in this PySpark build but its Python
runner requires ``google.protobuf``, which is broken in this container
(``cannot import name 'descriptor'``; probed empirically). The operators
here use ``applyInPandasWithState``, which has no such dependency; the
migration is mechanical once the environment carries protobuf.)

Demonstrated operator: per-user running event counter + running value sum,
emitting the updated totals each micro-batch (the shape of a feature-store
accumulator or per-entity CDC statistics). The sum accumulates CENTS
(floor(v*100 + 0.5) — identical double math on any engine), so the state
is an exact integer: no float accumulation-order drift batch-to-batch, and
the batch oracle reproduces it bit-for-bit.

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
STATE_SCHEMA = "n long, cents long"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        v = pdf["value"].to_numpy(dtype="float64")
        cents += int(np.floor(v * 100.0 + 0.5).astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame({
        "user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0],
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


# ---------------------------------------------------------------------------
# streaming winnowing: fingerprints over an unbounded text/token stream
# ---------------------------------------------------------------------------

# mirrors operators/textops.doc_winnowing (batch): k-gram md5, min per
# w-window. The state is ONLY the last k+w-2 characters per key — every
# fingerprint window spans k+w-1 chars, so no window fits entirely inside
# the carried tail and none is double-emitted, yet every window crossing a
# micro-batch boundary is still seen. Equivalence with the batch algorithm
# on the concatenated stream is pytest-checked.
WINNOW_OUTPUT_SCHEMA = "stream_id long, fingerprint string"
WINNOW_STATE_SCHEMA = "tail string"


def _winnow_text(text: str, k: int, w: int) -> list[str]:
    """Window-min fingerprints of one contiguous text (dupes preserved —
    cross-batch dedup is a downstream concern)."""
    import hashlib

    grams = [hashlib.md5(text[i:i + k].encode()).hexdigest()
             for i in range(len(text) - k + 1)]
    return [min(grams[i:i + w]) for i in range(len(grams) - w + 1)]


def _make_winnow_update(k: int, w: int):
    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (tail,) = state.get if state.exists else ("",)
        chunks: list[pd.DataFrame] = [pdf for pdf in pdfs]
        batch = pd.concat(chunks).sort_values("seq")
        text = tail + "".join(batch["chunk"].tolist())
        fps = _winnow_text(text, k, w)
        state.update((text[-(k + w - 2):],))
        yield pd.DataFrame({
            "stream_id": [key[0]] * len(fps),
            "fingerprint": fps,
        })
    return update


def streaming_winnowing(chunk_stream: DataFrame, k: int = 5, w: int = 10) -> DataFrame:
    """(stream_id, seq, chunk) text-chunk stream -> winnowing fingerprints,
    emitted as windows complete — boundary windows included exactly once.

    Scale: state per key is k+w-2 CHARACTERS (bytes, not documents) —
    bounded regardless of stream length; keys partition across executors
    and only keys present in a batch are touched. The pandas work per
    batch is O(batch chars x w) — Arrow-batched, no JVM round trips.
    """
    return (
        chunk_stream.select("stream_id", "seq", "chunk")
        .groupBy("stream_id")
        .applyInPandasWithState(
            _make_winnow_update(k, w),
            outputStructType=WINNOW_OUTPUT_SCHEMA,
            stateStructType=WINNOW_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
