"""Stream-stream joins: watermarked interval joins between two unbounded
streams.

The reference has no joins of any kind (SURVEY.md §2.10); this is an
engine capability the Canal/CDC world routinely needs downstream —
"enrich each event with the change records / signals that preceded it by
at most X minutes".

Spark semantics recap (why every piece is here):
- BOTH sides must carry a watermark, and the join condition must bound
  event time on both sides (an interval condition), or state grows
  unboundedly — Spark would have to keep every past row forever.
- With the interval bound, each side's state store retains only rows
  inside (max seen event time - watermark - interval); eviction is
  automatic and O(state) is the interval width x input rate, independent
  of stream length. That is the 100 TB/day-survivable design.
- Inner joins emit as matches arrive; outer variants wait for watermark
  expiry before emitting nulls.

Scale: the join shuffles both streams on the equality key once per
micro-batch; state is partitioned by the same key, so skewed keys (one
hot user) concentrate state — salt the key upstream if a single key's
interval-window exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
    keep_right_key: bool = False,
) -> DataFrame:
    """Join two streams on ``key`` where the right row's event time falls
    in ``[left_ts - lookback, left_ts)`` — strictly before the left event,
    at most ``lookback`` old. Column names (other than ``key``) must be
    disjoint between the two sides; rename upstream.

    Returns the joined stream with the left side's columns first;
    ``keep_right_key`` adds the right side's key as ``r_<key>`` (outer
    variants need it — on right-unmatched padded rows the left key is
    NULL and the right key is the only identity left). The half-open
    bound excludes self-pairs when both streams derive from the same
    feed.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} "
        f"AND r.{right_ts} >= l.{left_ts} - INTERVAL {lookback} "
        f"AND r.{right_ts} < l.{left_ts}"
    )
    joined = lw.join(rw, cond, how)
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c != key
    ]
    if keep_right_key:
        keep.append(F.col(f"r.{key}").alias(f"r_{key}"))
    return joined.select(*keep)
