"""Scale-safe EXACT global ordering primitives.

Unpartitioned ``Window.orderBy`` (rank / row_number / running sum over a
whole relation) is the classic single-task ceiling: Spark funnels every
row through one sort task. These helpers compute the SAME exact values
with the classic two-pass scheme instead:

1. ``repartitionByRange`` on the order keys — a range shuffle giving
   globally ordered, roughly equal partitions (sampled boundaries);
2. a tiny per-partition partial-aggregate collected to the driver
   (``n_partitions`` rows — bytes, not data);
3. partition-local windows (``Window.partitionBy(__pid)``) plus the
   broadcast offsets.

Every value is bit-identical to the unpartitioned window's output —
row_number over a TOTAL order (callers must include a tiebreak) and
running sums are layout-independent — so DuckDB oracle hashes are
unchanged; only the physical plan changes. This is the round-2 verdict's
'two-pass histogram ranks' follow-up, applied as the default rather than
the footnote.

The intermediate is persisted so the offset pass and the final pass see
the SAME range boundaries (RangePartitioner samples its input; a
recompute could legally re-draw boundaries).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Persisted range-shuffle intermediates, tracked so consumers can
# release them deliberately. The persist is correctness-load-bearing
# for the LIFETIME of the returned plan (RangePartitioner samples its
# input: a recompute may legally redraw boundaries, and the
# driver-collected offsets would then disagree with the re-shuffled
# layout) — but once a caller has MATERIALIZED the result (collect /
# write / toPandas), holding the blocks only squeezes the executor
# cache for every later job in the session.
_TRACKED: list[DataFrame] = []


def _persist_tracked(df: DataFrame) -> DataFrame:
    p = df.persist(StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(p)
    return p


def release_rank_caches() -> int:
    """Unpersist every tracked rank/running-sum intermediate. Call ONLY
    after the consuming plans have been materialized — re-executing a
    released plan recomputes the range shuffle, which may redraw
    boundaries and desynchronize the broadcast offsets. Section
    boundaries in bench runs and one-shot query materializations are
    the intended call sites. Returns the number of releases."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — a dead session is fine
            pass
    return n


def _n_parts(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                        "32"))


def global_row_number(df: DataFrame, order_by: list[Column],
                      out_col: str = "rn") -> tuple[DataFrame, int]:
    """Exact 1-based global row_number over a total order, distributed.

    ``order_by`` must define a TOTAL order (include a unique tiebreak) —
    the same requirement the unpartitioned-window form has for
    determinism. Returns (df + out_col, total_row_count).
    """
    # persisted (tracked) so the offset pass and the final pass see
    # identical range boundaries; release via release_rank_caches()
    # once the consuming plan has materialized
    ranged = _persist_tracked(
        df.repartitionByRange(_n_parts(df), *order_by)
        .withColumn("__pid", F.spark_partition_id()))
    counts = {r["__pid"]: r["cnt"]
              for r in ranged.groupBy("__pid")
              .agg(F.count("*").alias("cnt")).collect()}
    acc = 0
    offsets = []
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        return df.withColumn(out_col, F.lit(0).cast("long")), 0
    spark = df.sparkSession
    off = F.broadcast(spark.createDataFrame(offsets, "__pid int, __off long"))
    w = Window.partitionBy("__pid").orderBy(*order_by)
    out = (ranged.join(off, "__pid")
           .withColumn(out_col, (F.row_number().over(w)
                                 + F.col("__off")).cast("long"))
           .drop("__pid", "__off"))
    return out, acc


def ntile_from_rank(rank_col: str, n_total: int, n_buckets: int) -> Column:
    """SQL ``ntile(n)`` reconstructed from an exact global rank: the
    first ``n_total % n`` buckets take one extra row (the standard
    first-buckets-larger rule), so the output is bit-identical to the
    window ntile over the same total order."""
    q, r = divmod(n_total, n_buckets)
    rank = F.col(rank_col)
    if q == 0:
        return rank.cast("int")
    threshold = r * (q + 1)
    small = F.ceil(rank / F.lit(q + 1))
    large = F.lit(r) + F.ceil((rank - F.lit(threshold)) / F.lit(q))
    return F.when(rank <= threshold, small).otherwise(large).cast("int")


def grouped_running_sum(df: DataFrame, part_cols: list[str],
                        order_by: list[Column],
                        sum_cols: list[str],
                        prefix: str = "cum_",
                        sum_type: str = "long",
                        totals_sink: dict | None = None) -> DataFrame:
    """Exact running sums per group over an order, distributed.

    Equivalent to ``SUM(c) OVER (PARTITION BY part ORDER BY order ROWS
    UNBOUNDED PRECEDING)`` for each c in sum_cols, but the sort is a
    range shuffle on (part, order) and each task only carries its own
    slice plus a broadcast offset per (partition, group) pair.

    ``order_by`` must be total WITHIN each group for the running sum to
    be well-defined (same caveat as the window form). part_cols may be
    empty for a whole-relation running sum.

    ``sum_type`` is the accumulator DDL type — ``long`` (default) or an
    exact decimal like ``decimal(38,2)`` for money columns; decimal
    offsets add exactly, so results stay bit-identical to the window
    form. When ``totals_sink`` is given it is filled with
    {group_tuple: [final_sum per sum_col]} — the per-group grand totals
    the offset pass already computed, free to the caller (saves a
    separate full aggregate when a share-of-total is needed).
    """
    import decimal

    spark = df.sparkSession
    zero = (decimal.Decimal(0) if sum_type.startswith("decimal")
            else 0)
    keys = [F.col(c) for c in part_cols] + list(order_by)
    ranged = _persist_tracked(
        df.repartitionByRange(_n_parts(df), *keys)
        .withColumn("__pid", F.spark_partition_id()))
    partial = (ranged.groupBy("__pid", *part_cols)
               .agg(*[F.sum(c).alias(c) for c in sum_cols])
               .collect())
    # per-group prefix offsets in pid order: tiny (≈ n_partitions + groups)
    acc: dict[tuple, list] = {}
    rows = []
    for row in sorted(partial, key=lambda r: r["__pid"]):
        g = tuple(row[c] for c in part_cols)
        cur = acc.setdefault(g, [zero] * len(sum_cols))
        rows.append((row["__pid"], *g, *cur))
        acc[g] = [cur[i] + (row[sum_cols[i]] if row[sum_cols[i]]
                            is not None else zero)
                  for i in range(len(sum_cols))]
    if totals_sink is not None:
        totals_sink.update(acc)
    if not rows:
        out = df
        for c in sum_cols:
            out = out.withColumn(f"{prefix}{c}",
                                 F.col(c).cast(sum_type))
        return out
    part_schema = df.select(*part_cols).schema if part_cols else None
    fields = "__pid int"
    if part_schema is not None:
        fields += ", " + ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in part_schema)
    fields += ", " + ", ".join(f"__off_{c} {sum_type}" for c in sum_cols)
    off = F.broadcast(spark.createDataFrame(rows, fields))
    w = (Window.partitionBy("__pid", *part_cols).orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = ranged.join(off, ["__pid", *part_cols])
    for c in sum_cols:
        out = out.withColumn(f"{prefix}{c}",
                             (F.sum(c).over(w) + F.col(f"__off_{c}"))
                             .cast(sum_type))
    return out.drop("__pid", *[f"__off_{c}" for c in sum_cols])
