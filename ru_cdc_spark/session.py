"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same settings translate to a real
cluster: AQE handles runtime re-planning and skew joins, shuffle partition
count is sized to cores (locally) and should be sized to ~2-3x total executor
cores at 100 TB, and timestamps are pinned to UTC so results are comparable
with the DuckDB oracle (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ru_cdc_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    shuffle partitions default to the same so small-SF local runs don't
    over-parallelize (200 tiny tasks) while cluster deploys override it.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("RU_CDC_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # parquet scans: keep splits big enough that task overhead doesn't
        # dominate at small SF, small enough to parallelize at large SF
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # the events table stores timestamp[ns]; Spark has no nanos type —
        # read as long and convert in the loader (sources/readers.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # native TimeType (Spark 4.1) for MySQL TIME columns — enabled at
        # session scope so no query mutates shared conf mid-run (ADVICE
        # fix: the per-query set leaked into sibling queries)
        .config("spark.sql.timeType.enabled", "true")
        # forked python workers get 15s by default to connect back to the
        # JVM; on a loaded box (the full test suite saturating every core)
        # that handshake can miss the window and kill a streaming query
        # with "Python worker failed to connect back". Pure robustness
        # timeout — no effect on results or happy-path latency.
        .config("spark.python.authenticate.socketTimeout", "120s")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
