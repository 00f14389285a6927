"""Data profiling: per-column statistics in long format — the pipeline
health-check operator (null rates, cardinalities, ranges) every ingest
stage runs before trusting a new drop of data.

One wide aggregation pass over the table (all columns' stats in a single
shuffle-free partial-agg + tiny final agg), then a literal unpivot.
Values are stringified with engine-stable formats (timestamps via fixed
pattern, numerics via plain cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ru_cdc_spark.sources.readers import load_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

# (column, kind) — kind drives the stringification of min/max
ORDERS_PROFILE_COLS: list[tuple[str, str]] = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "money"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _fmt_spark(col, kind: str):
    if kind == "ts":
        return F.date_format(col, _TS_FMT_SPARK)
    if kind == "money":
        return col.cast("decimal(18,2)").cast("string")
    return col.cast("string")


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c, kind in ORDERS_PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            _fmt_spark(F.min(c), kind).alias(f"{c}__min"),
            _fmt_spark(F.max(c), kind).alias(f"{c}__max"),
        ]
    wide = orders.agg(F.count("*").alias("__n"), *aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c, _ in ORDERS_PROFILE_COLS
    ])
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def _fmt_duck(c: str, kind: str, agg: str) -> str:
    if kind == "ts":
        return f"strftime({agg}({c}), '{_TS_FMT_DUCK}')"
    if kind == "money":
        return f"CAST(CAST({agg}({c}) AS DECIMAL(18,2)) AS VARCHAR)"
    return f"CAST({agg}({c}) AS VARCHAR)"


def _profile_orders_sql() -> str:
    selects = []
    for c, kind in ORDERS_PROFILE_COLS:
        selects.append(f"""
    SELECT '{c}' AS "column", COUNT(*) AS n_rows,
           COUNT(*) FILTER ({c} IS NULL) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           {_fmt_duck(c, kind, 'MIN')} AS min_value,
           {_fmt_duck(c, kind, 'MAX')} AS max_value
    FROM orders""")
    return "\n    UNION ALL\n".join(selects)


PROFILE_ORDERS_SQL = _profile_orders_sql()
