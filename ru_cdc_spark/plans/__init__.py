"""Plan inspection helpers: programmatic checks that the physical plan is
the one we want (filters pushed into the parquet scan, dimensions
broadcast, no stray shuffles). Used by tests and by bench diagnostics —
the 100 TB discipline is enforced here, not by eyeballing explain output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Parquet-pushed predicates (empty list = nothing reached the scan)."""
    import re

    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each parquet scan — verifies column pruning."""
    import re

    return [m.group(1) for m in
            re.finditer(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))]


def count_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges in the physical plan (broadcast
    exchanges excluded — they're the cheap kind we want)."""
    import re

    return len(re.findall(r"(?<!Broadcast)Exchange ", physical_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or \
        "BroadcastNestedLoopJoin" in physical_plan(df)


def assert_pushed(df: DataFrame, column: str) -> None:
    filters = pushed_filters(df)
    if not any(column in f for f in filters):
        raise AssertionError(
            f"no pushed filter on {column}; PushedFilters={filters}\n"
            f"{formatted_plan(df)[:2000]}")


def assert_pruned(df: DataFrame, table_cols: int, max_read_cols: int) -> None:
    """Assert at least one scan reads <= max_read_cols of table_cols."""
    schemas = scan_read_schemas(df)
    counts = [s.count(":") for s in schemas]
    if not counts or min(counts) > max_read_cols:
        raise AssertionError(
            f"column pruning failed: scans read {counts} cols (table has {table_cols})")
