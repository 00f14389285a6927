"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator (one per SURVEY.md §2 row / north-star
op); ``oracle_sql()`` gives the DuckDB-equivalent SQL for the hash-match
correctness gate. The real implementations live in ``ru_cdc_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ru_cdc_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: CDC change stream -> Canal envelope -> MERGE snapshot
    on /root/testdata/sf0.001 (the reference's whole pipeline as one plan)."""
    return REGISTRY["cdc_merge_snapshot"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
