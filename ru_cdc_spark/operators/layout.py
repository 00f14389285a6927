"""Z-order (Morton-curve) data layout — the multi-dimensional
clustering that makes min/max file skipping work on more than one
predicate column (the public technique behind Delta's OPTIMIZE ZORDER
and Iceberg's sort-order z-curve; the reference has no layout story at
all — it hands rows to MQ sinks).

The engine-side contract is deliberately SHUFFLE-FREE: a row's target
file is a fixed Z-RANGE CELL (``z >> k``), never "the Nth row of a
global sort" — fixed-cell assignment is pure per-row arithmetic, so
laying out 100 TB is a map-only pass followed by a partitioned write
(``df.repartition(cell).write...``), while row-count-balanced variants
need a global sort whose range exchange becomes the job. The cost is
variable file sizes (cells inherit data skew), the same trade Delta
documents for its Hilbert/Z binning.

Everything here is integer arithmetic with IDENTICAL expression trees
in Spark SQL and DuckDB SQL, so the layout decision artifact —
per-cell row counts, min/max envelopes per dimension, and the
files-scanned fraction a box predicate would touch under the z-order
vs the key-striped baseline — is exactness-gated against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ru_cdc_spark.sources.readers import load_table, spread

Z_BITS = 10          # bits per dimension (2 dims -> 20-bit z)
Z_CELL_SHIFT = 12    # file cell = z >> 12 -> up to 256 cells
# the box predicate whose scan cost the layouts are judged on:
# a "one customer band x one date band" lookup, each ~1/8 of the domain
BOX = (128, 255, 256, 383)  # x0, x1, y0, y1


def _interleave_sql(xe: str, ye: str, bits: int, spark_side: bool) -> str:
    """The Morton interleave of two ``bits``-wide non-negative ints as
    ONE expression string: x's bit j lands at position 2j, y's at
    2j+1. Spark spells shifts as shiftleft/shiftright; DuckDB as
    << / >> — same arithmetic, bit-identical results."""
    terms = []
    for j in range(bits):
        if spark_side:
            terms.append(
                f"shiftleft(shiftright({xe}, {j}) & 1, {2 * j})")
            terms.append(
                f"shiftleft(shiftright({ye}, {j}) & 1, {2 * j + 1})")
        else:
            terms.append(f"((({xe} >> {j}) & 1) << {2 * j})")
            terms.append(f"((({ye} >> {j}) & 1) << {2 * j + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file-cell layout decision artifact for z-ordering ``orders``
    by (customer band, order-day band), judged against a key-striped
    baseline (orderkey modulo) on the SAME cell count:

    output one row per (layout, cell): the cell's row count, its
    min/max envelope in both dimensions, and whether the fixed BOX
    predicate has to scan it (envelope intersection — exactly the
    min/max pruning a parquet reader does with file footers).

    Scale: both layouts are pure per-row integer expressions plus ONE
    groupBy(cell) with map-side partials — no global sort anywhere; at
    100 TB the same expressions feed ``repartition(cell)`` + a
    partitioned write, keeping layout a map-only pass."""
    x0, x1, y0, y1 = BOX
    orders = spread(load_table(spark, sf_dir, "orders"))
    base = orders.select(
        F.col("o_orderkey"),
        F.expr(f"o_custkey % {1 << Z_BITS}").alias("zx"),
        # day-precision date band via INTEGER division (bit-identical
        # to the oracle's // — no float rounding anywhere)
        F.expr("(unix_millis(cast(o_orderdate AS timestamp)) "
               f"div 86400000) % {1 << Z_BITS}").alias("zy"))
    z = F.expr(_interleave_sql("zx", "zy", Z_BITS, spark_side=True))
    with_cells = base.select(
        "zx", "zy",
        F.shiftright(z, Z_CELL_SHIFT).cast("long").alias("zcell"),
        # key-striped strawman (same NUMBER of cells): file chosen by
        # orderkey modulo — a layout blind to both predicate
        # dimensions, like any key-hash/round-robin writer; every cell
        # inherits the full customer/date domain, so min/max pruning
        # cannot skip anything. (A contiguous-range append baseline
        # behaves identically here since orderkey is uncorrelated with
        # both dimensions, but would need a data-dependent key bound.)
        (F.col("o_orderkey")
         % F.lit(1 << (2 * Z_BITS - Z_CELL_SHIFT))).alias("icell"))
    # ONE pass (r13): the previous per-layout groupBy + union scanned
    # orders and evaluated the bit-interleave twice; exploding each row
    # into its two (layout, cell) assignments feeds a single
    # groupBy(layout, cell) with map-side partials — same groups, same
    # integer aggregates, half the scan/compute and one shuffle
    both = (with_cells.select(
        "zx", "zy",
        F.explode(F.array(
            F.struct(F.lit("zorder").alias("layout"),
                     F.col("zcell").alias("cell")),
            F.struct(F.lit("striped").alias("layout"),
                     F.col("icell").alias("cell")))).alias("lc"))
        .select("lc.layout", "lc.cell", "zx", "zy"))
    return (both.groupBy("layout", "cell")
            .agg(F.count("*").alias("n_rows"),
                 F.min("zx").alias("min_x"), F.max("zx").alias("max_x"),
                 F.min("zy").alias("min_y"), F.max("zy").alias("max_y"))
            .select("layout", "cell", "n_rows",
                    "min_x", "max_x", "min_y", "max_y",
                    (~((F.col("max_x") < x0) | (F.col("min_x") > x1)
                       | (F.col("max_y") < y0)
                       | (F.col("min_y") > y1))).alias("scanned")))


def zorder_layout_stats_sql() -> str:
    x0, x1, y0, y1 = BOX
    z = _interleave_sql("zx", "zy", Z_BITS, spark_side=False)
    return f"""
WITH base AS (
    SELECT o_orderkey,
           (o_custkey % {1 << Z_BITS}) AS zx,
           (epoch_ms(o_orderdate) // 86400000) % {1 << Z_BITS} AS zy
    FROM orders
), cells AS (
    SELECT zx, zy,
           CAST(({z} >> {Z_CELL_SHIFT}) AS BIGINT) AS zcell,
           (o_orderkey % {1 << (2 * Z_BITS - Z_CELL_SHIFT)}) AS icell
    FROM base
), both_layouts AS (
    SELECT 'zorder' AS layout, zcell AS cell, zx, zy FROM cells
    UNION ALL
    SELECT 'striped' AS layout, icell AS cell, zx, zy FROM cells
)
SELECT layout, cell, COUNT(*) AS n_rows,
       MIN(zx) AS min_x, MAX(zx) AS max_x,
       MIN(zy) AS min_y, MAX(zy) AS max_y,
       NOT (MAX(zx) < {x0} OR MIN(zx) > {x1}
            OR MAX(zy) < {y0} OR MIN(zy) > {y1}) AS scanned
FROM both_layouts
GROUP BY layout, cell
"""


def zorder_scan_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline number a layout decision needs: for the fixed BOX
    predicate, what fraction of files (cells) and rows must be scanned
    under each layout. Z-order should scan a small envelope; the
    key-striped baseline scans nearly everything because every stripe
    spans the full customer/date domain."""
    stats = zorder_layout_stats(spark, sf_dir)
    return (stats.groupBy("layout")
            .agg(F.count("*").alias("n_files"),
                 F.sum(F.col("scanned").cast("long"))
                 .alias("files_scanned"),
                 F.sum("n_rows").alias("n_rows"),
                 F.sum(F.when(F.col("scanned"), F.col("n_rows"))
                       .otherwise(F.lit(0))).alias("rows_scanned"))
            .select("layout", "n_files", "files_scanned", "n_rows",
                    "rows_scanned"))


def zorder_scan_fraction_sql() -> str:
    return f"""
WITH stats AS ({zorder_layout_stats_sql()})
SELECT layout, COUNT(*) AS n_files,
       CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT)
           AS files_scanned,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN scanned THEN n_rows ELSE 0 END) AS BIGINT)
           AS rows_scanned
FROM stats
GROUP BY layout
"""
