"""Data layout for scan efficiency: range-clustered writes.

At 100 TB the cheapest predicate is the one that never reads the data:
parquet stores per-row-group min/max statistics, and both Spark's scan
and any downstream engine skip files/row groups whose stat range cannot
match the filter. That only works if the writer CLUSTERS rows so each
file covers a narrow key range — an unsorted table has every file
spanning the full domain and nothing skips.

``write_clustered`` = ``repartitionByRange`` (contiguous, roughly equal
key ranges per output file via reservoir-sampled range bounds — one
shuffle) + ``sortWithinPartitions`` (tightens row-group stats inside
each file; no extra shuffle). The test reads the written footers with
pyarrow and asserts the per-file ranges are (nearly) disjoint.

This mirrors what table formats call clustering/Z-ORDER for the 1-D
case; for multi-column skipping, pass multiple columns — lexicographic
range partitioning gives the leading column full skipping power.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(df: DataFrame, path: str, by: list[str],
                    n_files: int | None = None) -> None:
    """Write ``df`` as parquet clustered on ``by``: each output file holds
    a contiguous range of the leading cluster key, rows sorted within.

    Scale: one range shuffle (sampled bounds, balanced output files —
    skew in the cluster key becomes file-size skew, not task failure);
    the sort is per-partition and spills if needed. Readers get file- and
    row-group-level skipping on ``by`` predicates for free.
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *by)
        .sortWithinPartitions(*by)
        .write.mode("overwrite").parquet(path)
    )
