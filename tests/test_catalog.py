"""Catalog / schema-registry semantics: S8 DESC construction, P6 negative
cache, D11-gap schema evolution."""

from __future__ import annotations

from pyspark.sql import types as T

from ru_cdc_spark.catalog import FieldMeta, TableCatalog, TableSchema

DESC_ROWS = [
    ("id", "bigint(20)", "PRI"),
    ("name", "varchar(100)", ""),
    ("balance", "decimal(18,2)", ""),
    ("created", "datetime(6)", ""),
]


def _schema() -> TableSchema:
    return TableSchema("shop", "accounts", TableCatalog.fields_from_desc(DESC_ROWS))


def test_fields_from_desc_pk_and_types():
    s = _schema()
    assert s.pk_names == ["id"]
    assert s.mysql_types["balance"] == "decimal(18,2)"
    st = s.struct_type()
    assert st["balance"].dataType == T.DecimalType(18, 2)
    assert st["created"].dataType == T.TimestampType()


def test_lookup_and_negative_cache():
    cat = TableCatalog()
    cat.register(_schema())
    assert cat.lookup("shop", "accounts") is not None

    cat.mark_dropped("shop", "accounts")
    assert cat.lookup("shop", "accounts") is None  # P6: skipped permanently
    assert cat.is_dropped("shop", "accounts")
    assert cat.known_tables() == []

    # re-register clears the negative cache (table re-created upstream)
    cat.register(_schema())
    assert not cat.is_dropped("shop", "accounts")
    assert cat.lookup("shop", "accounts") is not None


def test_evolution_widens_never_narrows():
    cat = TableCatalog()
    cat.register(_schema())
    evolved = cat.evolve("shop", "accounts", [
        FieldMeta("id", "bigint(20)", True),
        FieldMeta("email", "varchar(200)"),      # new column
        # 'name' missing from the new DESC -> must NOT be dropped
    ])
    names = [f.name for f in evolved.fields]
    assert "email" in names and "name" in names
    assert evolved.version == 1

    again = cat.evolve("shop", "accounts", [FieldMeta("email", "varchar(200)")])
    assert again.version == 1  # no-op evolution doesn't bump


def test_evolve_unknown_table_registers():
    cat = TableCatalog()
    s = cat.evolve("shop", "orders", [FieldMeta("id", "int(11)", True)])
    assert s.version == 1
    assert cat.lookup("shop", "orders") is not None
