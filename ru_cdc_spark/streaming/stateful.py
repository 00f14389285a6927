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
from pyspark.sql import functions as F
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


# ---------------------------------------------------------------------------
# custom stateful sessionization with EVENT-TIME TIMEOUT
# ---------------------------------------------------------------------------

# The native session_window operator (events_session_window_stream) closes
# sessions inside the engine; this is the CUSTOM form — explicit per-key
# state + GroupStateTimeout.EventTimeTimeout — for session semantics the
# built-in can't express (e.g. emitting per-session aggregates only at
# close, custom gap rules, side outputs). A session closes either when a
# later event exceeds the gap (in-batch) or when the WATERMARK passes
# last_event + gap (the timeout callback fires with an empty iterator and
# hasTimedOut=True). State per key is O(1): (start, last, n) in micros.

SESSION_GAP_SECONDS = 1800
SESSION_OUTPUT_SCHEMA = (
    "user_id long, start_us long, end_us long, n_events long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"


def _session_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    closed: list[tuple[int, int, int]] = []

    if state.hasTimedOut:
        start, last, n = state.get
        closed.append((start, last, n))
        state.remove()
    else:
        batch = pd.concat(list(pdfs))
        ts_sorted = batch["ts_us"].sort_values().tolist()
        start, last, n = state.get if state.exists else (None, None, 0)
        for t in ts_sorted:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        # close via watermark: fire when event time passes last + gap
        state.setTimeoutTimestamp((last + gap_us) // 1000)

    yield pd.DataFrame({
        "user_id": [key[0]] * len(closed),
        "start_us": [c[0] for c in closed],
        "end_us": [c[1] for c in closed],
        "n_events": [c[2] for c in closed],
    })


def sessionize_with_timeout(events_stream: DataFrame,
                            watermark: str = "1 second") -> DataFrame:
    """events stream (user_id, ts timestamp) -> closed sessions, emitted
    exactly once each: in-batch when a gap-exceeding event arrives,
    otherwise by event-time timeout when the watermark passes
    last_event + gap. Liveness = watermark progress (quiet streams need a
    heartbeat/fence row, same as the outer-join flush)."""
    withw = events_stream.withWatermark("ts", watermark)
    flat = withw.select(
        "user_id", "ts", F.unix_micros(F.col("ts")).alias("ts_us"))
    return (
        flat.groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# streaming SCD2 maintenance: incremental closing edges over a change stream
# ---------------------------------------------------------------------------

# The batch formulation (operators/merge.scd2_history) closes version N
# with a per-key LEAD — but a stream cannot LEAD into events that haven't
# arrived. The streaming form keeps O(1) state per key (the OPEN version's
# opening sequence) and emits a (pk, valid_from, valid_to) CLOSING EDGE
# the moment the next event for that key arrives — possibly many batches
# later. Version attributes never pass through the state store: the final
# table joins the edges back to the change events by opening sequence, so
# state stays one long per live key regardless of row width.

SCD2_EDGE_OUTPUT_SCHEMA = (
    "pk long, valid_from_seq long, valid_to_seq long"
)
SCD2_EDGE_STATE_SCHEMA = "open_from long"


def _scd2_edge_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch = pd.concat(list(pdfs)).sort_values("seq")
    open_from = state.get[0] if state.exists else None
    closed: list[tuple[int, int]] = []
    for seq, is_del in zip(batch["seq"], batch["is_delete"]):
        seq = int(seq)
        if open_from is not None:
            closed.append((open_from, seq))
        open_from = None if bool(is_del) else seq
    if open_from is None:
        if state.exists:
            state.remove()
    else:
        state.update((open_from,))
    yield pd.DataFrame({
        "pk": [key[0]] * len(closed),
        "valid_from_seq": [c[0] for c in closed],
        "valid_to_seq": [c[1] for c in closed],
    })


def scd2_closing_edges(change_stream: DataFrame) -> DataFrame:
    """(pk long, seq long, is_delete boolean) change stream -> closing
    edges of SCD2 versions, each emitted exactly once, in the batch
    where the closing event arrives. Events for one key may span
    micro-batches (the state carries the open version across); within
    a batch they are replayed in sequence order.

    Scale: state per key is ONE long — bounded by live keys, not
    history length; the state store checkpoints incrementally and keys
    partition across executors. Each batch touches only the keys
    present in it."""
    return (
        change_stream.select("pk", "seq", "is_delete")
        .groupBy("pk")
        .applyInPandasWithState(
            _scd2_edge_update,
            outputStructType=SCD2_EDGE_OUTPUT_SCHEMA,
            stateStructType=SCD2_EDGE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
