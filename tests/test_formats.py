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
