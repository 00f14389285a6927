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
