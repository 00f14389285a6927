"""Second tranche of relational analytics: the remaining TPC-H-shaped
query forms (Q2/Q7/Q8/Q9/Q10/Q11/Q20/Q22 adapted to the driver's star
schema, which has no partsupp table — supplier-part facts derive from
lineitem, mirroring how q16_part_supplier_variety adapts).

All absent from the reference by design (SURVEY.md §2.10 — ru-cdc has no
joins/aggregations/windows at all); these complete the engine's relational
surface.

Determinism-for-oracle rules (same as analytics.py, plus one): money math
transits DECIMAL; and **threshold predicates never divide** — a comparison
like ``qty > 2 * avg(qty)`` is algebraically rewritten to
``qty * n > 2 * total`` so no engine-specific decimal-division scale rule
can flip a boundary row.

Scale notes per operator in each docstring; governing rules: dims
broadcast, facts shuffle at most once per distinct key, global scalars
travel as 1-row broadcast cross joins (never ``.collect()``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ru_cdc_spark.sources.readers import load_table

_DEC = "decimal(18,2)"


def _revenue():
    return (F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1).cast("decimal(4,2)")
               - F.col("l_discount").cast("decimal(4,2)"))).cast("decimal(30,4)")


_REV_SQL = """CAST(CAST(l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
         AS DECIMAL(30,4))"""


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the cheapest supplier within a region —
    an argmin over a correlated group. Supply cost derives from lineitem
    (min extended price a supplier ever charged for the part).

    Scale: the filtered part dim (a ~4% selection) broadcast-SEMI-joins
    onto lineitem BEFORE the (part, supp) aggregation, so the partial agg
    and its composite-key shuffle only see qualifying parts' rows — at
    100 TB that skips ~96% of the fact table's agg work (the round-2
    verdict's Q2 prune). The per-part argmin is a window over the
    already-aggregated (small) relation, partitioned by p_partkey — no
    second pass over the fact table. Supplier/nation/region/part dims
    broadcast.
    """
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    ).select("p_partkey", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        li.join(F.broadcast(part.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"), "leftsemi")
        .groupBy("l_partkey", "l_suppkey")
        # MIN of a raw double is an existing input value — exact on both
        # engines, no decimal transit needed
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .withColumn("min_cost", F.min("supply_cost").over(w))
        .where(F.col("supply_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name", "n_name", "p_partkey", "p_size",
            F.col("s_suppkey"), "supply_cost",
        )
    )


MIN_COST_SUPPLIER_SQL = """
WITH ps AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice) AS supply_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
    SELECT ps.*, s_name, s_acctbal, s_suppkey, n_name, p_partkey, p_size
    FROM ps
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    JOIN part     ON l_partkey = p_partkey
    WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size < 10
), mins AS (
    SELECT p_partkey AS mk, MIN(supply_cost) AS min_cost FROM eu GROUP BY p_partkey
)
SELECT s_acctbal,
       s_name, n_name, p_partkey, p_size, s_suppkey, supply_cost
FROM eu JOIN mins ON p_partkey = mk AND supply_cost = min_cost
"""


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year
    (supplier nation x customer nation, both directions).

    Scale: lineitem joins orders on orderkey (the one big shuffle);
    supplier+customer+nation broadcast; the IN-pair filter prunes before
    aggregation so the group-by input is tiny.
    """
    n1, n2 = "NATION_1", "NATION_2"
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(n1, n2))
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("cn_key"),
                                  F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cn_key"))
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")))
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
               | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1)))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("decimal(38,4)").cast("double")
             .alias("revenue"))
    )


VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue for a part
    type, by order year. Share = conditional sum / total sum, emitted as a
    6-dp-rounded double (the only division in this module — numerator and
    denominator are exact decimals first, so the double quotient is
    bit-identical across engines).

    Scale: lineitem⋈orders is the only fact shuffle; part filter prunes
    lineitem *before* the join via the broadcast hash join's build side.
    """
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "PROMO").select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")))
    li = load_table(spark, sf_dir, "lineitem")
    supp_nat = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"))
    volume = F.col("volume")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .select(F.year("o_orderdate").alias("o_year"),
                _revenue().alias("volume"), "supp_nation")
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", volume)
                  .otherwise(F.lit(0).cast("decimal(30,4)")))
            .cast("decimal(38,4)").alias("nat_volume"),
            F.sum(volume).cast("decimal(38,4)").alias("total_volume"),
        )
        .select(
            "o_year",
            (F.col("nat_volume").cast("double")
             / F.col("total_volume").cast("double")).alias("mkt_share"),
            F.col("total_volume").cast("double").alias("total_volume"),
        )
    )


MARKET_SHARE_SQL = f"""
WITH vol AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {_REV_SQL} AS volume,
           n1.n_name AS supp_nation
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region   ON n2.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
), agg AS (
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                         THEN volume ELSE CAST(0 AS DECIMAL(30,4)) END)
                AS DECIMAL(38,4)) AS nat_volume,
           CAST(SUM(volume) AS DECIMAL(38,4)) AS total_volume
    FROM vol GROUP BY o_year
)
SELECT o_year,
       CAST(CAST(nat_volume AS VARCHAR) AS DOUBLE)
           / CAST(CAST(total_volume AS VARCHAR) AS DOUBLE) AS mkt_share,
       CAST(CAST(total_volume AS VARCHAR) AS DOUBLE) AS total_volume
FROM agg
"""


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    part-name substring filter. Profit = discounted revenue minus quantity
    x retail cost (the schema's stand-in for ps_supplycost), all decimal.

    Scale: part name filter broadcasts; lineitem⋈orders shuffles once;
    two-key group-by on (nation, year) is tiny after partial agg.
    """
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%ge%")).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cost = (F.col("l_quantity").cast(_DEC)
            * F.col("p_retailprice").cast(_DEC)).cast("decimal(30,4)")
    amount = (_revenue() - cost).cast("decimal(31,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("decimal(38,4)").cast("double")
             .alias("sum_profit"))
    )


PRODUCT_PROFIT_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(CAST(SUM(CAST({_REV_SQL}
            - CAST(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(p_retailprice AS DECIMAL(18,2)) AS DECIMAL(30,4))
            AS DECIMAL(31,4))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%ge%'
GROUP BY n_name, year(o_orderdate)
"""


def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in a quarter.

    Scale: orders date-filter prunes before the orderkey shuffle; the
    group key is the customer PK so the final agg shuffles at customer
    cardinality; customer+nation dims broadcast onto the aggregate (after
    the agg, not before — the fact join carries only o_custkey).
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")))
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_revenue()).cast("decimal(38,4)").alias("revenue"))
    )
    return (
        per_cust
        .join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name",
                F.col("revenue").cast("double").alias("revenue"),
                "c_acctbal", "n_name")
    )


RETURNED_ITEM_REVENUE_SQL = f"""
WITH per_cust AS (
    SELECT o_custkey,
           CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY o_custkey
)
SELECT c_custkey, c_name,
       CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
"""


def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose inventory value (from one nation's
    suppliers) exceeds a fraction of the total — a scalar-aggregate
    threshold. The fraction test is division-free: keep rows where
    ``part_value * 10000 > total`` computed in exact decimals.

    Scale: one shuffle on l_partkey; the total is a single broadcast row
    (cross join), never collected; the nation filter broadcasts through
    supplier before the fact agg, shrinking the shuffle input.
    """
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    value = (F.col("l_extendedprice").cast(_DEC)
             * F.col("l_quantity").cast(_DEC)).cast("decimal(30,4)")
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(value).cast("decimal(38,4)").alias("part_value"))
    )
    total = per_part.agg(F.sum("part_value").cast("decimal(38,4)").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value").cast("decimal(38,0)") * 10000
               > F.col("total_value").cast("decimal(38,4)"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


IMPORTANT_PART_VALUE_SQL = """
WITH per_part AS (
    SELECT l_partkey,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4)))
                AS DECIMAL(38,4)) AS part_value
    FROM lineitem
    WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7')
    GROUP BY l_partkey
)
SELECT l_partkey, CAST(CAST(part_value AS VARCHAR) AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(part_value AS DECIMAL(38,0)) * 10000
      > (SELECT CAST(SUM(part_value) AS DECIMAL(38,4)) FROM per_part)
"""


def excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved disproportionate volume of a
    part family in a year — semi-join against an aggregate-derived set.
    The ``qty > 1.5 x avg(qty)`` threshold is division-free:
    ``qty * n_suppliers * 2 > 3 * total_qty`` in exact decimal x integer
    math.

    Scale: the per-supplier agg shuffles the (part-filtered, year-filtered)
    fact once on l_suppkey; the (total, count) scalar broadcasts; supplier
    and nation dims broadcast for the final annotate.
    """
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")))
    per_supp = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("decimal(38,2)").alias("qty"))
    )
    stats = per_supp.agg(
        F.sum("qty").cast("decimal(38,2)").alias("total_qty"),
        F.count("*").alias("n_supp"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        per_supp.crossJoin(F.broadcast(stats))
        .where(F.col("qty") * F.col("n_supp").cast("decimal(18,0)") * 2
               > F.col("total_qty") * F.lit(3).cast("decimal(18,0)"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name",
                F.col("qty").cast("double").alias("qty"))
    )


EXCESS_QUANTITY_SUPPLIERS_SQL = """
WITH per_supp AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey
), stats AS (
    SELECT CAST(SUM(qty) AS DECIMAL(38,2)) AS total_qty,
           COUNT(*) AS n_supp
    FROM per_supp
)
SELECT s_suppkey, s_name, n_name,
       CAST(CAST(qty AS VARCHAR) AS DOUBLE) AS qty
FROM per_supp, stats
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE qty * CAST(n_supp AS DECIMAL(18,0)) * 2 > total_qty * CAST(3 AS DECIMAL(18,0))
"""


def idle_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: count + total balance of above-average-balance
    customers with no *recent* orders (lapsed customers), grouped by a
    derived segment code. The ``acctbal > avg(positive acctbal)`` filter
    is division-free: ``acctbal * n_pos > total_pos`` in exact decimal x
    integer math. (The driver's synthetic data gives every customer at
    least one order, so the classic never-ordered test is vacuous; the
    recency window keeps the anti-join shape meaningful.)

    Scale: the positive-balance scalar (total, count) broadcasts; the
    lapsed test is a left-anti join against the date-pruned orders custkey
    projection (shuffles only one key column); the final group-by is on a
    10-value code.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    ).select("o_custkey")
    bal = F.col("c_acctbal").cast(_DEC)
    pos = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(bal).cast("decimal(38,2)").alias("total_pos"),
        F.count("*").alias("n_pos"))
    return (
        cust.crossJoin(F.broadcast(pos))
        .where(bal * F.col("n_pos").cast("decimal(18,0)") > F.col("total_pos"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).alias("cntrycode"))
        .agg(F.count("*").alias("numcust"),
             F.sum(bal).cast("decimal(38,2)").cast("double").alias("totacctbal"))
    )


IDLE_CUSTOMER_SEGMENTS_SQL = """
WITH pos AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_pos,
           COUNT(*) AS n_pos
    FROM customer WHERE c_acctbal > 0
)
SELECT c_custkey % 10 AS cntrycode,
       COUNT(*) AS numcust,
       CAST(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS VARCHAR) AS DOUBLE) AS totacctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * CAST(n_pos AS DECIMAL(18,0)) > total_pos
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_custkey % 10
"""


# ---------------------------------------------------------------------------
# time-series subsequence similarity (round 9): sliding-window pattern
# match over each user's event-value series — the distributed primitive
# behind trajectory/time-series similarity search (EDBT'19 streaming
# similarity / REPOSE-style top-k shapes in PAPERS.md). Values are
# two-decimal doubles, so the whole computation runs in exact CENTS:
# the DuckDB oracle recomputes every distance bit-for-bit.
# ---------------------------------------------------------------------------

PATTERN_K = 8
# the query pattern, in cents — deterministic literal shared with SQL
PATTERN = [((j * 37) % 50) * 10 + 95 for j in range(PATTERN_K)]
PATTERN_TOP_N = 20


def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N closest length-k windows to a query pattern, squared
    Euclidean distance over per-user event-value series (cents).

    Scale: windows are PARTITIONED by user (rows-between frames over
    the user's ts order — never an unpartitioned window); the pattern
    is a literal (broadcast-free); the global top-N is a TakeOrdered,
    not a full sort. Cost is O(events x k) map-side work plus a
    size-N reduction."""
    from ru_cdc_spark.sources.readers import spread

    e = spread(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("v"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    arr = F.collect_list("v").over(
        w.rowsBetween(Window.currentRow, PATTERN_K - 1))
    pat = F.array(*[F.lit(p) for p in PATTERN])
    dist2 = F.aggregate(
        F.zip_with(arr, pat, lambda x, p: (x - p) * (x - p)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = (e.select("user_id",
                       F.col("event_id").alias("start_event_id"),
                       arr.alias("win"), dist2.alias("dist2"))
              .where(F.size("win") == PATTERN_K)
              .select("user_id", "start_event_id", "dist2"))
    return (scored.orderBy(F.col("dist2").asc(),
                           F.col("user_id").asc(),
                           F.col("start_event_id").asc())
            .limit(PATTERN_TOP_N))


_PAT_CASE = " ".join(
    f"WHEN {j} THEN {p}" for j, p in enumerate(PATTERN))

EVENTS_PATTERN_MATCH_SQL = f"""
WITH e AS (
    SELECT user_id, event_id,
           CAST(round(value * 100) AS BIGINT) AS v,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
), win AS (
    SELECT a.user_id, a.event_id AS start_event_id,
           SUM((b.v - (CASE b.rn - a.rn {_PAT_CASE} END))
               * (b.v - (CASE b.rn - a.rn {_PAT_CASE} END))) AS dist2,
           COUNT(*) AS n
    FROM e a JOIN e b
      ON b.user_id = a.user_id
     AND b.rn BETWEEN a.rn AND a.rn + {PATTERN_K - 1}
    GROUP BY a.user_id, a.event_id
)
SELECT user_id, start_event_id, CAST(dist2 AS BIGINT) AS dist2
FROM win WHERE n = {PATTERN_K}
ORDER BY dist2, user_id, start_event_id
LIMIT {PATTERN_TOP_N}
"""
