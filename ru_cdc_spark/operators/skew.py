"""Skew mitigation: salted aggregation and salted broadcast-ish joins.

AQE's skew-join handles moderate skew automatically (enabled in
session.py); this module is the explicit strategy for pathological keys —
the classic two-phase salted aggregate and the replicated-dimension salted
join — exposed as reusable transforms with equivalence guarantees tested
against the unsalted plans.

When to reach for it at 100 TB: one key holding >~1 partition's worth of
rows (null-heavy foreign keys, bot users in event streams, boilerplate
docs in LSH buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, keys: list[str], aggs: list[Column],
               reaggs: list[Column], salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation: partial agg on (keys + salt), then final agg
    on keys. ``aggs`` aggregate the raw rows; ``reaggs`` combine the
    partials (e.g. sum->sum, count->sum, min->min). Only algebraic
    aggregates qualify — medians/distincts need different machinery.

    The salt spreads one hot key over ``salt_buckets`` reducers; the
    second shuffle moves only |keys| x salt_buckets rows.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*reaggs)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_buckets: int = 8) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key, replicate the small
    side across every salt value, join on (key, salt). Use when the small
    side is too large to broadcast outright but one big-side key floods a
    single reducer.

    Row multiplication is small-side-only (x salt_buckets) — bounded and
    chosen, unlike the unbounded single-reducer pileup it prevents.
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    replicated_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    return (
        salted_big.join(replicated_small, [key, "__salt"])
        .drop("__salt")
    )
