"""Debezium interop: op-code mapping (incl. snapshot 'r' reads), routing
prefix parse, and the lossless encode/decode round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from ru_cdc_spark.sources.cdc_fixture import derive_order_changes
from ru_cdc_spark.sources.debezium import (
    changes_to_debezium,
    debezium_source_schema,
    debezium_to_changes,
)


def test_roundtrip_is_lossless(spark, sf_dir):
    changes = derive_order_changes(spark, sf_dir)
    row_schema = changes.schema["after"].dataType
    payloads = changes_to_debezium(changes, "testdb", "orders")
    decoded = debezium_to_changes(payloads.select("payload"), row_schema)
    # identical names + types (nullability flags may tighten: the decoded
    # `type` column is a literal CASE, provably non-null)
    assert decoded.schema.simpleString() == changes.schema.simpleString()
    assert changes.exceptAll(decoded).count() == 0
    assert decoded.exceptAll(changes).count() == 0


def test_snapshot_read_op_maps_to_insert(spark, sf_dir):
    changes = derive_order_changes(spark, sf_dir).limit(10)
    row_schema = changes.schema["after"].dataType
    payloads = changes_to_debezium(changes, "testdb", "orders").where(
        F.get_json_object("payload", "$.op") == "c")
    # rewrite op c -> r: Debezium marks initial-snapshot rows as 'r'
    snap = payloads.select(
        F.regexp_replace("payload", '"op":"c"', '"op":"r"').alias("payload"))
    decoded = debezium_to_changes(snap, row_schema)
    types = [r["type"] for r in decoded.select("type").distinct().collect()]
    assert types == ["INSERT"]


def test_routing_prefix_parses_without_row_images(spark, sf_dir):
    changes = derive_order_changes(spark, sf_dir).limit(5)
    payloads = changes_to_debezium(changes, "testdb", "orders")
    meta = payloads.select(
        F.from_json("payload", debezium_source_schema()).alias("m"))
    rows = meta.select("m.source.db", "m.source.table", "m.op").collect()
    assert all(r["db"] == "testdb" and r["table"] == "orders" for r in rows)
    assert {r["op"] for r in rows} <= {"c", "u", "d"}
