"""Z-order layout operator (operators/layout.py): Morton interleave
correctness, cell assignment's locality property, and the decision
artifact's headline claim — the z-layout scans a small envelope for a
box predicate while the key-striped baseline scans everything."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ru_cdc_spark.operators.layout import (
    BOX,
    Z_BITS,
    _interleave_sql,
    zorder_scan_fraction,
)


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


class TestInterleave:
    @given(st.integers(0, (1 << Z_BITS) - 1),
           st.integers(0, (1 << Z_BITS) - 1))
    @settings(max_examples=200, deadline=None)
    def test_duckdb_expr_matches_reference(self, x, y):
        sql = _interleave_sql(str(x), str(y), Z_BITS, spark_side=False)
        got = duckdb.sql(f"SELECT {sql} AS z").fetchone()[0]
        assert got == _morton_ref(x, y, Z_BITS)

    def test_spark_expr_matches_reference(self, spark):
        from pyspark.sql import functions as F

        rows = [(x, y) for x in (0, 1, 5, 512, 1023)
                for y in (0, 3, 7, 600, 1023)]
        df = spark.createDataFrame(rows, "zx long, zy long")
        expr = _interleave_sql("zx", "zy", Z_BITS, spark_side=True)
        got = {(r.zx, r.zy): r.z
               for r in df.select("zx", "zy",
                                  F.expr(expr).alias("z")).collect()}
        for (x, y), z in got.items():
            assert z == _morton_ref(x, y, Z_BITS)

    def test_locality(self):
        # the curve's defining property: near points in (x, y) share
        # z prefixes — the unit square's four quadrants map to the
        # four quarters of the z range
        half = 1 << (Z_BITS - 1)
        quarter = 1 << (2 * Z_BITS - 2)
        for (x, y), q in (((0, 0), 0), ((half, 0), 1),
                          ((0, half), 2), ((half, half), 3)):
            z = _morton_ref(x, y, Z_BITS)
            assert q * quarter <= z < (q + 1) * quarter


class TestScanFraction:
    def test_zorder_beats_striped_baseline(self, spark, sf_dir):
        rows = {r["layout"]: r for r in
                zorder_scan_fraction(spark, sf_dir).collect()}
        zo, ins = rows["zorder"], rows["striped"]
        assert zo["n_rows"] == ins["n_rows"]
        # the striped baseline barely skips: orderkey stripes are blind to
        # the customer/date domain (at tiny fixtures a sparse cell's
        # envelope may miss the box by luck — majority, not totality)
        assert ins["files_scanned"] > ins["n_files"] / 2
        # the z-layout scans a small envelope of the box predicate —
        # an order of magnitude under the striped baseline
        assert zo["files_scanned"] * 8 <= ins["files_scanned"]
        assert zo["rows_scanned"] * 8 <= ins["rows_scanned"]
        assert zo["files_scanned"] < zo["n_files"] / 8
        # and the box's rows all live in scanned cells: rows_scanned
        # is a superset bound of the true box selectivity
        x0, x1, y0, y1 = BOX
        from pyspark.sql import functions as F

        from ru_cdc_spark.sources.readers import load_table

        orders = load_table(spark, sf_dir, "orders")
        in_box = orders.where(
            (F.expr(f"o_custkey % {1 << Z_BITS}").between(x0, x1))
            & (F.expr("(unix_millis(cast(o_orderdate AS timestamp)) "
                      f"div 86400000) % {1 << Z_BITS}")
               .between(y0, y1))).count()
        assert zo["rows_scanned"] >= in_box
