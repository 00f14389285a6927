"""Vector math over array<float|double> columns — built-in functions only.

Cross-engine determinism note (validated empirically): Spark's
``F.aggregate`` folds left-to-right, which is bit-identical to DuckDB's
``list_dot_product`` / ``list_cosine_similarity`` sequential accumulation —
so cosine scores hash-match the oracle exactly, no rounding needed.

Scale: these run inside whole-stage codegen per row (no UDF, no Python).
For 100 TB ANN, pair generation is the cost driver — see
operators/similarity.py for the bucketed strategies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (order matters for float determinism)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double_array(a: Column) -> Column:
    """float32 -> float64 is exact; do it once before any arithmetic so both
    engines compute over identical doubles."""
    return a.cast("array<double>")
