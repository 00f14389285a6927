"""Data profiling: per-column statistics in long format — the pipeline
health-check operator (null rates, cardinalities, ranges) every ingest
stage runs before trusting a new drop of data.

One wide aggregation pass over the table (all columns' stats in a single
shuffle-free partial-agg + tiny final agg), then a literal unpivot.
Values are stringified with engine-stable formats (timestamps via fixed
pattern, numerics via plain cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def numeric_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation over the lineitem measures, computed
    from EXACT decimal moments: one aggregate pass collects n, sums, sums
    of squares and cross-products as DECIMAL (order-independent, no float
    accumulation drift), then r = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²) ·
    √(n·Syy − Sy²)) with every float step an IEEE correctly-rounded
    operation on exact operands — bit-reproducible on any cluster size
    and engine (sqrt IS correctly rounded per IEEE-754), hence
    oracle-exact rather than approximately equal.

    Scale: the fact collapses to ONE moment row in a map-side-combined
    aggregate (shuffle = #partitions rows of ~20 decimals); the pair
    explosion happens after, on that single row. Compare F.corr: same
    shuffle shape but float partials — irreproducible at 1000 executors.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dec = {c: F.col(c).cast("decimal(18,2)") for c in _CORR_COLS}
    aggs: list = [F.count("*").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(dec[c]).cast("decimal(38,4)").alias(f"s_{c}"))
    pairs = [(a, b) for i, a in enumerate(_CORR_COLS)
             for b in _CORR_COLS[i:]]
    for a, b in pairs:
        aggs.append(F.sum((dec[a] * dec[b]).cast("decimal(38,4)"))
                    .cast("decimal(38,4)").alias(f"sp_{a}_{b}"))
    m = li.agg(*aggs)

    def _dev(a: str, b: str):
        # n·Sab − Sa·Sb, exact decimal -> double at the boundary
        return (F.col("n") * F.col(f"sp_{a}_{b}")
                - F.col(f"s_{a}") * F.col(f"s_{b}")) \
            .cast("decimal(38,4)").cast("double")

    out_rows = F.array(*[
        F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            (_dev(a, b) / (F.sqrt(_dev(a, a)) * F.sqrt(_dev(b, b))))
            .alias("corr"),
        )
        for a, b in pairs if a != b
    ])
    return (m.select(F.col("n"), F.explode(out_rows).alias("r"))
            .select("n", "r.col_a", "r.col_b", "r.corr"))


_CORR_PAIRS_SQL = []
for _i, _a in enumerate(_CORR_COLS):
    for _b in _CORR_COLS[_i:]:
        if _a != _b:
            _CORR_PAIRS_SQL.append((_a, _b))

_DEV_SQL = ("CAST(CAST(CAST(n * sp_{a}_{b} - s_{a} * s_{b} "
            "AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)")

NUMERIC_CORR_MATRIX_SQL = (
    "WITH m AS (SELECT COUNT(*) AS n, "
    + ", ".join(
        f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS s_{c}"
        for c in _CORR_COLS)
    + ", "
    + ", ".join(
        f"CAST(SUM(CAST(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2)) "
        f"AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sp_{a}_{b}"
        for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i:])
    + " FROM lineitem) "
    + " UNION ALL ".join(
        f"SELECT n, '{a}' AS col_a, '{b}' AS col_b, "
        + _DEV_SQL.format(a=a, b=b)
        + f" / (sqrt({_DEV_SQL.format(a=a, b=a)})"
        f" * sqrt({_DEV_SQL.format(a=b, b=b)})) AS corr FROM m"
        for a, b in _CORR_PAIRS_SQL)
)


def numeric_spearman_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the lineitem measures: Pearson
    over AVERAGE RANKS, which are exact .5-quantized rationals (ties get
    the mean of their rank range), so the same exact-decimal-moment
    machinery as `numeric_corr_matrix` applies and the matrix hash-
    matches the oracle — monotone association without Pearson's
    outlier sensitivity, still bit-reproducible at any cluster size.

    Scale: the average rank of a tied value group is a pure function of
    the cumulative count before it — avg = before + (cnt+1)/2 — so ranks
    are computed on the per-DISTINCT-VALUE relation with a distributed
    running count (rankops.grouped_running_sum: range shuffle +
    partition-local windows + broadcast offsets) and joined back, instead
    of a per-column unpartitioned row_number window over the fact table
    (round-2 verdict follow-up). Values are bit-identical (.5-quantized
    exact rationals), so the oracle hash is unchanged; then the single
    moment-row aggregate — the pair explosion happens on that one row.
    """
    from ru_cdc_spark.operators.rankops import grouped_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    ranked = li.select(*_CORR_COLS)
    for c in _CORR_COLS:
        vc = li.groupBy(c).agg(F.count("*").alias("cnt"))
        cum = grouped_running_sum(vc, [], [F.col(c).asc()], ["cnt"])
        # avg rank of the tie group = before + (cnt+1)/2, exact to .5
        num = (2 * (F.col("cum_cnt") - F.col("cnt"))
               + F.col("cnt") + 1).cast("decimal(19,1)")
        avg_rank = (num / 2).cast("decimal(18,1)")
        rank_map = cum.select(F.col(c).alias(f"__v_{c}"),
                              avg_rank.alias(f"r_{c}"))
        ranked = ranked.join(rank_map,
                             ranked[c] == F.col(f"__v_{c}")).drop(f"__v_{c}")
    ranked = ranked.select(*[f"r_{c}" for c in _CORR_COLS])

    cols = [f"r_{c}" for c in _CORR_COLS]
    aggs: list = [F.count("*").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).cast("decimal(38,2)").alias(f"s_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    for a, b in pairs:
        aggs.append(F.sum((F.col(a) * F.col(b)).cast("decimal(38,2)"))
                    .cast("decimal(38,2)").alias(f"sp_{a}_{b}"))
    m = ranked.agg(*aggs)

    def _dev(a: str, b: str):
        return (F.col("n") * F.col(f"sp_{a}_{b}")
                - F.col(f"s_{a}") * F.col(f"s_{b}")) \
            .cast("decimal(38,2)").cast("double")

    out_rows = F.array(*[
        F.struct(
            F.lit(a.removeprefix("r_")).alias("col_a"),
            F.lit(b.removeprefix("r_")).alias("col_b"),
            (_dev(a, b) / (F.sqrt(_dev(a, a)) * F.sqrt(_dev(b, b))))
            .alias("spearman"),
        )
        for a, b in pairs if a != b
    ])
    return (m.select(F.col("n"), F.explode(out_rows).alias("r"))
            .select("n", "r.col_a", "r.col_b", "r.spearman"))


_SP_DEV_SQL = ("CAST(CAST(CAST(n * sp_{a}_{b} - s_{a} * s_{b} "
               "AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)")

NUMERIC_SPEARMAN_SQL = (
    "WITH rn AS (SELECT "
    + ", ".join(_CORR_COLS) + ", "
    + ", ".join(
        f"row_number() OVER (ORDER BY {c}, l_orderkey, l_linenumber) AS rn_{c}"
        for c in _CORR_COLS)
    + " FROM lineitem), ranked AS (SELECT "
    + ", ".join(
        f"CAST(AVG(rn_{c}) OVER (PARTITION BY {c}) AS DECIMAL(18,1)) AS r_{c}"
        for c in _CORR_COLS)
    + " FROM rn), m AS (SELECT COUNT(*) AS n, "
    + ", ".join(
        f"CAST(SUM(r_{c}) AS DECIMAL(38,2)) AS s_r_{c}" for c in _CORR_COLS)
    + ", "
    + ", ".join(
        f"CAST(SUM(CAST(r_{a} * r_{b} AS DECIMAL(38,2))) AS DECIMAL(38,2))"
        f" AS sp_r_{a}_r_{b}"
        for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i:])
    + " FROM ranked) "
    + " UNION ALL ".join(
        f"SELECT n, '{a}' AS col_a, '{b}' AS col_b, "
        + _SP_DEV_SQL.format(a=f"r_{a}", b=f"r_{b}")
        + f" / (sqrt({_SP_DEV_SQL.format(a=f'r_{a}', b=f'r_{a}')})"
        f" * sqrt({_SP_DEV_SQL.format(a=f'r_{b}', b=f'r_{b}')})) AS spearman"
        " FROM m"
        for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i:] if a != b)
)


def part_size_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed simple linear regression: retail price regressed
    on part size, per part type — slope, intercept, and r² all derived
    from one map-side-combined decimal-moment row per group (the same
    argument as the correlation matrix: every float step is a correctly-
    rounded op on exact operands, so the fit is bit-reproducible at any
    cluster size and hash-matches the oracle — unlike regr_slope/
    REGR_* whose float partials drift with partitioning).

    Scale: ONE aggregate pass to |groups| rows; the algebra runs on
    those rows only.
    """
    p = load_table(spark, sf_dir, "part")
    x = F.col("p_size").cast("decimal(18,2)")
    y = F.col("p_retailprice").cast("decimal(18,2)")
    m = p.groupBy("p_type").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("decimal(38,4)").alias("sx"),
        F.sum(y).cast("decimal(38,4)").alias("sy"),
        F.sum((x * x).cast("decimal(38,4)")).cast("decimal(38,4)").alias("sxx"),
        F.sum((y * y).cast("decimal(38,4)")).cast("decimal(38,4)").alias("syy"),
        F.sum((x * y).cast("decimal(38,4)")).cast("decimal(38,4)").alias("sxy"))

    def dev(sab, sa, sb):
        return (F.col("n") * F.col(sab) - F.col(sa) * F.col(sb)) \
            .cast("decimal(38,4)").cast("double")

    slope = dev("sxy", "sx", "sy") / dev("sxx", "sx", "sx")
    intercept = (F.col("sy").cast("double")
                 - slope * F.col("sx").cast("double")) \
        / F.col("n").cast("double")
    r2 = ((dev("sxy", "sx", "sy") * dev("sxy", "sx", "sy"))
          / (dev("sxx", "sx", "sx") * dev("syy", "sy", "sy")))
    return m.select("p_type", "n", slope.alias("slope"),
                    intercept.alias("intercept"), r2.alias("r2"))


_REG_DEV = ("CAST(CAST(CAST(n * {sab} - {sa} * {sb} AS DECIMAL(38,4)) "
            "AS VARCHAR) AS DOUBLE)")

PART_SIZE_PRICE_REGRESSION_SQL = (
    """
WITH m AS (
    SELECT p_type, COUNT(*) AS n,
           CAST(SUM(CAST(p_size AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sx,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(38,4))
               AS sy,
           CAST(SUM(CAST(CAST(p_size AS DECIMAL(18,2))
                * CAST(p_size AS DECIMAL(18,2)) AS DECIMAL(38,4)))
                AS DECIMAL(38,4)) AS sxx,
           CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2))
                * CAST(p_retailprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
                AS DECIMAL(38,4)) AS syy,
           CAST(SUM(CAST(CAST(p_size AS DECIMAL(18,2))
                * CAST(p_retailprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
                AS DECIMAL(38,4)) AS sxy
    FROM part GROUP BY 1
)
SELECT p_type, n,
       """
    + _REG_DEV.format(sab="sxy", sa="sx", sb="sy") + " / "
    + _REG_DEV.format(sab="sxx", sa="sx", sb="sx") + """ AS slope,
       (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
        - (""" + _REG_DEV.format(sab="sxy", sa="sx", sb="sy") + " / "
    + _REG_DEV.format(sab="sxx", sa="sx", sb="sx")
    + """) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) / CAST(n AS DOUBLE)
           AS intercept,
       (""" + _REG_DEV.format(sab="sxy", sa="sx", sb="sy") + " * "
    + _REG_DEV.format(sab="sxy", sa="sx", sb="sy") + ") / ("
    + _REG_DEV.format(sab="sxx", sa="sx", sb="sx") + " * "
    + _REG_DEV.format(sab="syy", sa="sy", sb="sy") + """) AS r2
FROM m
""")
