"""Advanced join operators Spark lacks natively: as-of join, range join,
plus the semi/anti idioms — each composed from built-in ops so Catalyst
keeps optimizing, with the 100 TB strategy documented per operator.

As-of join is the union+window formulation (no per-group pandas, no
skew-prone inequality join): tag both sides, sort within key, carry the
last seen right-side row forward. One shuffle on the key, linear scan —
the same shape TimescaleDB/kdb attribute to ordered merge.

Range join is bucketized: quantize the range key so candidates meet on an
equi-join (bucket), then filter exactly. Candidate blow-up is bounded by
(range width / bucket width) + 1 buckets per row instead of a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ru_cdc_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# as-of join: each event matched to the latest order at-or-before its time
# ---------------------------------------------------------------------------


def asof_join(left: DataFrame, right: DataFrame, key: str, left_ts: str,
              right_ts: str, payload_cols: list[str],
              left_id: str) -> DataFrame:
    """Generic left as-of join (latest right row with right_ts <= left_ts
    per key; ``key`` must be the column name on BOTH sides — rename first).

    Implementation: union both sides with a side tag, window-sort within
    key by (time, side) — right rows at the same timestamp sort first, so
    ``<=`` semantics hold — and carry the last right payload forward with
    last(ignorenulls). ``left_id`` is a unique left-row id used to join the
    carried payload back. Right side must be unique per (key, ts); dedupe
    upstream for determinism.
    """
    r = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(dict(left.dtypes)[left_id]).alias(left_id),
        *[F.col(c) for c in payload_cols],
    )
    l_tagged = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"), F.col(left_id),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload_cols],
    )
    unioned = r.unionByName(l_tagged)
    w = Window.partitionBy("__k").orderBy("__t", "__side") \
        .rowsBetween(Window.unboundedPreceding, 0)
    carried = unioned.select(
        "__side", F.col(left_id),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
    ).where(F.col("__side") == 1)
    return left.join(carried.select(left_id, *payload_cols), left_id)


def events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event joined to the user's latest order at-or-before the event
    time (orders deduped to one per (custkey, date) by max orderkey so the
    match is unique — DuckDB's ASOF JOIN needs the same for determinism).

    Scale: one shuffle each side on the key + linear window — no
    inequality join, no pandas.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("timestamp").alias("o_ts"),
        "o_orderkey")
    dw = Window.partitionBy("o_custkey", "o_ts").orderBy(F.col("o_orderkey").desc())
    orders_uniq = (
        orders.withColumn("__rn", F.row_number().over(dw))
        .where(F.col("__rn") == 1).drop("__rn")
        .withColumnRenamed("o_custkey", "user_id")
    )
    out = asof_join(ev, orders_uniq, key="user_id", left_ts="ts",
                    right_ts="o_ts", payload_cols=["o_orderkey"],
                    left_id="event_id")
    return out.select("event_id", "user_id", "ts", "o_orderkey")


EVENTS_ASOF_ORDERS_SQL = """
WITH orders_uniq AS (
    SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS o_ts,
           MAX(o_orderkey) AS o_orderkey
    FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, o.o_orderkey
FROM events e
ASOF LEFT JOIN orders_uniq o
  ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o.o_ts
"""


# ---------------------------------------------------------------------------
# range join: orders within a trailing window of each event
# ---------------------------------------------------------------------------

_BUCKET_DAYS = 30


def events_orders_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count each user's orders in the 30 days before each event.

    Scale: quantize time into 30-day buckets; each event probes exactly two
    buckets (its own + previous) via equi-join on (key, bucket), then the
    precise range predicate filters. Candidates per event are bounded by
    bucket occupancy — never a full inequality join.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("timestamp").alias("o_ts"))

    bucket = lambda t: F.floor(F.unix_seconds(t) / (86400 * _BUCKET_DAYS))  # noqa: E731
    o = orders.withColumn("__b", bucket(F.col("o_ts")))
    e = ev.withColumn("__b0", bucket(F.col("ts"))) \
          .withColumn("__b", F.explode(F.array(F.col("__b0") - 1, F.col("__b0"))))

    joined = e.join(o, (e.user_id == o.o_custkey) & (e["__b"] == o["__b"]), "left")
    in_range = (F.col("o_ts") <= F.col("ts")) & \
               (F.col("o_ts") > F.col("ts") - F.expr(f"INTERVAL {_BUCKET_DAYS} DAYS"))
    return (
        joined.groupBy("event_id", "user_id", "ts")
        .agg(F.sum(F.when(in_range, 1).otherwise(0)).alias("orders_30d"))
    )


EVENTS_ORDERS_RANGE_JOIN_SQL = f"""
SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
       CAST(COALESCE(SUM(CASE
                 WHEN CAST(o.o_orderdate AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
                 AND CAST(o.o_orderdate AS TIMESTAMP) >
                     CAST(e.ts AS TIMESTAMP) - INTERVAL {_BUCKET_DAYS} DAY
            THEN 1 ELSE 0 END), 0) AS BIGINT) AS orders_30d
FROM events e
LEFT JOIN orders o ON e.user_id = o.o_custkey
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# semi / anti joins (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------


def customers_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT EXISTS idioms: customers flagged by whether they have any
    urgent order — left_semi/left_anti, the shuffle-light existence joins
    (no row multiplication, early-out probe)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    urgent = load_table(spark, sf_dir, "orders") \
        .where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    with_u = cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi") \
                 .withColumn("has_urgent", F.lit(True))
    without_u = cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti") \
                    .withColumn("has_urgent", F.lit(False))
    return with_u.unionByName(without_u)


CUSTOMERS_SEMI_ANTI_SQL = """
SELECT c_custkey, TRUE AS has_urgent FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderpriority = '1-URGENT')
UNION ALL
SELECT c_custkey, FALSE AS has_urgent FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
"""
