"""XML wire-format interop: lossless encode/decode round trip and the
route-before-parse prefix discipline."""

from __future__ import annotations

from ru_cdc_spark.sources.cdc_fixture import derive_order_changes
from ru_cdc_spark.sources.xmlcdc import (
    changes_to_xml,
    xml_routing_prefix,
    xml_to_changes,
)


def test_xml_roundtrip_is_lossless(spark, sf_dir):
    changes = derive_order_changes(spark, sf_dir)
    row_schema = changes.schema["after"].dataType
    payloads = changes_to_xml(changes, "testdb", "orders")
    decoded = xml_to_changes(payloads.select("payload"), row_schema)
    assert decoded.schema.simpleString() == changes.schema.simpleString()
    assert changes.exceptAll(decoded).count() == 0
    assert decoded.exceptAll(changes).count() == 0


def test_xml_routing_prefix_skips_row_images(spark, sf_dir):
    changes = derive_order_changes(spark, sf_dir).limit(5)
    payloads = changes_to_xml(changes, "testdb", "orders")
    routed = xml_routing_prefix(payloads.select("payload"))
    rows = routed.select("__route.database", "__route.table",
                         "__route.type").collect()
    assert all(r["database"] == "testdb" and r["table"] == "orders"
               for r in rows)
    assert {r["type"] for r in rows} <= {"INSERT", "UPDATE", "DELETE"}


def test_xml_streams_end_to_end_to_snapshot(spark, sf_dir, tmp_path):
    """The third wire format under Structured Streaming: XML documents
    arrive as text files, route on the cheap prefix, decode through the
    catalog schema, and merge — the final snapshot equals the batch
    apply_changes over the same change set."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators.merge import apply_changes
    from ru_cdc_spark.sources.xmlcdc import changes_to_xml, xml_to_changes

    changes = derive_order_changes(spark, sf_dir)
    row_schema = changes.schema["after"].dataType
    src = str(tmp_path / "xml_src")
    # XML documents are multi-line; ship one doc per text row by
    # flattening the pretty-printed newlines (content bytes unchanged)
    changes_to_xml(changes, "testdb", "orders") \
        .select(F.regexp_replace("payload", "\n\\s*", "").alias("payload")) \
        .write.mode("overwrite").text(src)

    stream = spark.readStream.schema("value string").text(src)
    decoded = xml_to_changes(stream, row_schema, payload_col="value")
    q = (decoded.writeStream.format("memory").queryName("__xml_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    streamed = spark.table("__xml_stream")

    got = apply_changes(streamed, ["o_orderkey"])
    want = apply_changes(changes, ["o_orderkey"])
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
