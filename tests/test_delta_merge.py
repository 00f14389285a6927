"""Delta MERGE wiring: statement generation + availability gating."""

from __future__ import annotations

import pytest

from ru_cdc_spark.operators.delta_merge import (
    delta_available,
    merge_into_delta,
    merge_statement,
)


def test_merge_statement_shape():
    sql = merge_statement("target", "src", ["id"], ["name", "balance"])
    assert "MERGE INTO target t" in sql
    assert "ON t.id = s.id" in sql
    # version guard prevents out-of-order regressions
    assert "t.__seq < s.id" in sql
    # delete becomes a tombstone, not a hard delete
    assert "SET t.__deleted = true" in sql
    assert "WHEN NOT MATCHED" in sql


def test_delta_gated_in_this_image(spark):
    if delta_available(spark):
        pytest.skip("delta present; gating test not applicable")
    batch = spark.createDataFrame([(1, "a", 1, "INSERT")],
                                  ["id", "name", "seq", "type"])
    with pytest.raises(NotImplementedError, match="merge_versioned"):
        merge_into_delta(spark, "t", batch, ["id"], ["name"])
