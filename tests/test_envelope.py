"""Canal envelope contract tests (FIXTURES.md B1; reference
src/executor.rs:90-105,120-222,238-322)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ru_cdc_spark.operators.envelope import build_envelope, envelope_to_json
from ru_cdc_spark.sources.cdc_fixture import (
    ORDERS_DATABASE,
    ORDERS_MYSQL_TYPES,
    ORDERS_PK,
    ORDERS_TABLE,
    derive_order_changes,
)

ENVELOPE_FIELDS = [
    "id", "database", "table", "pkNames", "isDdl", "type", "es", "ts",
    "sql", "sqlType", "mysqlType", "data", "old",
]


def _envelope(spark, sf_dir):
    return build_envelope(
        derive_order_changes(spark, sf_dir),
        ORDERS_DATABASE, ORDERS_TABLE, ORDERS_PK, ORDERS_MYSQL_TYPES,
        processing_ts=F.lit(1_700_000_000_000),
    )


def test_envelope_schema(spark, sf_dir):
    env = _envelope(spark, sf_dir)
    assert env.columns == ENVELOPE_FIELDS


def test_insert_has_no_old(spark, sf_dir):
    env = _envelope(spark, sf_dir)
    row = env.where("type = 'INSERT'").limit(1).collect()[0]
    assert row["old"] is None
    assert row["isDdl"] is False
    assert row["pkNames"] == ["o_orderkey"]
    assert row["sql"] == ""
    assert len(row["data"]) == 1
    assert set(row["data"][0].keys()) == set(ORDERS_MYSQL_TYPES)


def test_update_old_contains_only_changed(spark, sf_dir):
    env = _envelope(spark, sf_dir)
    rows = env.where("type = 'UPDATE'").limit(50).collect()
    assert rows
    for r in rows:
        old = r["old"][0]
        # totalprice always changes (+10); status changes iff it wasn't 'F'
        assert "o_totalprice" in old
        assert set(old) <= {"o_totalprice", "o_orderstatus"}
        if "o_orderstatus" in old:
            assert old["o_orderstatus"] != "F"
        # unchanged columns never leak into old
        assert "o_custkey" not in old


def test_delete_data_is_before_image(spark, sf_dir):
    env = _envelope(spark, sf_dir)
    row = env.where("type = 'DELETE'").limit(1).collect()[0]
    assert row["old"] is None
    assert row["data"][0]["o_orderkey"] is not None


def test_jdbc_type_codes_in_envelope(spark, sf_dir):
    env = _envelope(spark, sf_dir)
    row = env.limit(1).collect()[0]
    # F9 codes (reference src/executor.rs:352-400)
    assert row["sqlType"] == {
        "o_orderkey": -5, "o_custkey": -5, "o_orderstatus": 1,
        "o_totalprice": 3, "o_orderdate": 93, "o_orderpriority": 12,
    }
    assert row["mysqlType"]["o_totalprice"] == "decimal(18,2)"


def test_json_serialization_parses_and_keeps_routing_cols(spark, sf_dir):
    out = envelope_to_json(_envelope(spark, sf_dir))
    assert out.columns == ["database", "table", "id", "payload"]
    row = out.limit(1).collect()[0]
    payload = json.loads(row["payload"])
    assert payload["database"] == "testdb"
    assert payload["type"] in ("INSERT", "UPDATE", "DELETE")
    assert isinstance(payload["data"], list)


def test_envelope_json_round_trip(spark, sf_dir):
    """Serde round trip: envelope -> Canal JSON -> ENVELOPE_SCHEMA parse
    reproduces the original fields (the producer/consumer contract)."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.streaming.pipeline import ENVELOPE_SCHEMA

    env = _envelope(spark, sf_dir).limit(200)
    serialized = envelope_to_json(env)
    parsed = serialized.select(
        F.from_json("payload", ENVELOPE_SCHEMA).alias("e")).select("e.*")
    back = parsed.select("id", "database", "table", "type", "es",
                         F.col("data")[0]["o_totalprice"].alias("tp"),
                         F.col("old")[0]["o_totalprice"].alias("old_tp"))
    orig = env.select("id", "database", "table", "type", "es",
                      F.col("data")[0]["o_totalprice"].alias("tp"),
                      F.col("old")[0]["o_totalprice"].alias("old_tp"))
    assert orig.exceptAll(back).count() == 0
    assert back.exceptAll(orig).count() == 0


def test_cli_gen_config_round_trip(tmp_path):
    from ru_cdc_spark.__main__ import main
    from ru_cdc_spark.config import PipelineConfig

    p = str(tmp_path / "cfg.json")
    assert main(["gen-config", p]) == 0
    cfg = PipelineConfig.load_from(p)
    assert cfg.instances[0].schemas == "test*"


def test_numbers_are_stringified(spark, sf_dir):
    """F10 quirk: Canal emits numbers as quoted strings."""
    env = _envelope(spark, sf_dir)
    row = env.where("type = 'INSERT'").limit(1).collect()[0]
    for v in row["data"][0].values():
        assert v is None or isinstance(v, str)


def test_variant_spans_heterogeneous_tables(spark, sf_dir):
    """One VARIANT column over a topic mixing two tables' payload schemas:
    shared envelope paths extract everywhere; table-specific data fields
    come back NULL (not an error) on the other table's rows."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators.envelope import build_envelope, envelope_to_json
    from ru_cdc_spark.sources.cdc_fixture import (
        CUSTOMER_DATABASE,
        CUSTOMER_MYSQL_TYPES,
        CUSTOMER_PK,
        CUSTOMER_TABLE,
        ORDERS_DATABASE,
        ORDERS_MYSQL_TYPES,
        ORDERS_PK,
        ORDERS_TABLE,
        derive_customer_changes,
        derive_order_changes,
    )

    orders = envelope_to_json(build_envelope(
        derive_order_changes(spark, sf_dir),
        ORDERS_DATABASE, ORDERS_TABLE, ORDERS_PK, ORDERS_MYSQL_TYPES,
        processing_ts=F.lit(0)))
    cust = envelope_to_json(build_envelope(
        derive_customer_changes(spark, sf_dir),
        CUSTOMER_DATABASE, CUSTOMER_TABLE, CUSTOMER_PK, CUSTOMER_MYSQL_TYPES,
        processing_ts=F.lit(0)))
    mixed = orders.select("payload").unionAll(cust.select("payload"))
    v = F.parse_json("payload")
    out = mixed.select(
        F.variant_get(v, "$.table", "string").alias("tbl"),
        F.try_variant_get(v, "$.data[0].o_totalprice", "string").alias("o_price"),
        F.try_variant_get(v, "$.data[0].c_acctbal", "string").alias("c_bal"),
    )
    agg = {r["tbl"]: r for r in out.groupBy("tbl").agg(
        F.count("*").alias("n"),
        F.count("o_price").alias("n_o"),
        F.count("c_bal").alias("n_c")).collect()}
    assert set(agg) == {"orders", "customer"}
    # shared paths resolve on every row; foreign paths resolve on none
    assert agg["orders"]["n_o"] == agg["orders"]["n"] > 0
    assert agg["orders"]["n_c"] == 0
    assert agg["customer"]["n_c"] == agg["customer"]["n"] > 0
    assert agg["customer"]["n_o"] == 0


class TestSparseImageEnvelope:
    """Partial-row-image (binlog_row_image=MINIMAL/NOBLOB) envelope
    semantics: absent columns never forge values into `data`, and an
    absent BEFORE value makes the changed-col diff emit the column with
    an unknown (NULL) old value instead of silently dropping it."""

    FIELDS = [("pk", "long"), ("v", "long"), ("w", "string")]

    def _df(self, spark):
        # one MINIMAL update: before = PK only; after = {pk?, v} changed
        return spark.createDataFrame(
            [(
                (1, 10, None),            # before values (absent -> None)
                (True, True, False),      # before_present: pk, v known
                (None, 20, None),         # after values
                (False, True, False),     # after_present: only v shipped
            )],
            "before struct<pk:long,v:long,w:string>, "
            "bp struct<pk:boolean,v:boolean,w:boolean>, "
            "after struct<pk:long,v:long,w:string>, "
            "ap struct<pk:boolean,v:boolean,w:boolean>")

    def test_sparse_data_map_emits_present_columns_only(self, spark):
        from ru_cdc_spark.operators.envelope import image_map_sparse

        df = self._df(spark)
        out = df.select(image_map_sparse(
            F.col("after"), self.FIELDS, F.col("ap")).alias("m")).collect()
        assert out[0]["m"] == {"v": "20"}

    def test_absent_before_emits_unknown_old(self, spark):
        from ru_cdc_spark.operators.envelope import changed_old_map_sparse

        # before_present lacks v -> old value unknown -> emit v: NULL
        df = spark.createDataFrame(
            [((1, None, None), (True, False, False),
              (None, 20, None), (False, True, False))],
            "before struct<pk:long,v:long,w:string>, "
            "bp struct<pk:boolean,v:boolean,w:boolean>, "
            "after struct<pk:long,v:long,w:string>, "
            "ap struct<pk:boolean,v:boolean,w:boolean>")
        out = df.select(changed_old_map_sparse(
            F.col("before"), F.col("after"), self.FIELDS,
            F.col("bp"), F.col("ap")).alias("old")).collect()
        assert out[0]["old"] == {"v": None}

    def test_known_unchanged_present_column_not_emitted(self, spark):
        from ru_cdc_spark.operators.envelope import changed_old_map_sparse

        # v present both sides and equal -> NOT in old; w changed -> in old
        df = spark.createDataFrame(
            [((1, 10, "a"), (True, True, True),
              (None, 10, "b"), (False, True, True))],
            "before struct<pk:long,v:long,w:string>, "
            "bp struct<pk:boolean,v:boolean,w:boolean>, "
            "after struct<pk:long,v:long,w:string>, "
            "ap struct<pk:boolean,v:boolean,w:boolean>")
        out = df.select(changed_old_map_sparse(
            F.col("before"), F.col("after"), self.FIELDS,
            F.col("bp"), F.col("ap")).alias("old")).collect()
        assert out[0]["old"] == {"w": "a"}

    def test_absent_after_column_never_in_diff(self, spark):
        from ru_cdc_spark.operators.envelope import changed_old_map_sparse

        df = self._df(spark)
        out = df.select(changed_old_map_sparse(
            F.col("before"), F.col("after"), self.FIELDS,
            F.col("bp"), F.col("ap")).alias("old")).collect()
        # v: present both sides, 10 -> 20, known change with real old
        assert out[0]["old"] == {"v": "10"}
