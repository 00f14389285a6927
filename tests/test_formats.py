"""Source-format breadth: the engine round-trips its tables through ORC,
CSV, and JSON with explicit schemas (never inference in the data path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ru_cdc_spark.sources.readers import load_table


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_orders_round_trip(spark, sf_dir, tmp_path, fmt):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / f"orders_{fmt}")
    writer = orders.write.mode("overwrite")
    if fmt == "csv":
        # CSV has no native timestamp type: pin the format on both sides
        writer = writer.option("header", "true") \
                       .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    getattr(writer, fmt)(out)

    reader = spark.read.schema(orders.schema)
    if fmt == "csv":
        reader = reader.option("header", "true") \
                       .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    back = getattr(reader, fmt)(out)

    assert back.schema == orders.schema
    diff = back.exceptAll(orders).count() + orders.exceptAll(back).count()
    assert diff == 0


def test_embeddings_array_round_trip_json(spark, sf_dir, tmp_path):
    """Array<float> columns survive the JSON path (multimodal/vector
    transport format)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "emb_json")
    emb.write.mode("overwrite").json(out)
    back = spark.read.schema(emb.schema).json(out)
    a = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    b = back.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_write_clustered_file_ranges_disjoint(spark, sf_dir, tmp_path):
    """Range-clustered output: each parquet file covers a contiguous,
    non-overlapping o_orderkey range (verified from the real footers), so
    a key-range predicate can skip every other file."""
    import pyarrow.parquet as pq
    from pathlib import Path
    from ru_cdc_spark.sources.layout import write_clustered
    from ru_cdc_spark.sources.readers import load_table

    out = str(tmp_path / "clustered")
    orders = load_table(spark, sf_dir, "orders")
    write_clustered(orders, out, ["o_orderkey"], n_files=8)

    ranges = []
    for f in Path(out).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        idx = next(i for i in range(md.schema.to_arrow_schema().__len__())
                   if md.schema.column(i).name == "o_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1,hi1)} vs {(lo2,hi2)}"

    # and Spark's scan actually prunes: a narrow filter reads < all files
    lo, hi = ranges[0]
    narrow = spark.read.parquet(out).where(f"o_orderkey <= {hi}")
    read_files = {r.f for r in
                  narrow.selectExpr("input_file_name() AS f").distinct().collect()}
    assert len(read_files) < len(ranges)


def test_write_zordered_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered output: per-file min/max ranges are narrow on BOTH
    cluster columns (verified from real footers), and a predicate on the
    NON-leading column alone prunes files — the case lexicographic
    clustering cannot serve."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from ru_cdc_spark.sources.layout import write_zordered
    from ru_cdc_spark.sources.readers import load_table

    out = str(tmp_path / "zordered")
    orders = load_table(spark, sf_dir, "orders")
    write_zordered(orders, out, ["o_custkey", "o_totalprice"], n_files=16)

    def file_ranges(col):
        ranges = []
        for f in Path(out).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            idx = next(i for i in range(md.num_columns)
                       if md.schema.column(i).name == col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min); maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        return ranges

    for col in ("o_custkey", "o_totalprice"):
        ranges = file_ranges(col)
        assert len(ranges) >= 8
        glo = min(r[0] for r in ranges)
        ghi = max(r[1] for r in ranges)
        gspan = float(ghi) - float(glo)
        avg_span = sum(float(hi) - float(lo) for lo, hi in ranges) / len(ranges)
        # every file spanning the full domain would give ratio ~1.0;
        # z-clustering must shrink the average file range on BOTH columns
        assert avg_span / gspan < 0.7, f"{col}: no skipping power ({avg_span/gspan:.2f})"

    # Spark's scan prunes on the second dimension alone
    ranges = sorted(file_ranges("o_totalprice"))
    lo, hi = ranges[0]
    narrow = spark.read.parquet(out).where(f"o_totalprice <= {hi}")
    read_files = {r.f for r in
                  narrow.selectExpr("input_file_name() AS f").distinct().collect()}
    assert len(read_files) < len(ranges)
