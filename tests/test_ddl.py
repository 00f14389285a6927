"""DDL-text schema evolution (the reference's dead QueryEvent, D11, made
live): parser grammar, catalog application, and the byte-level path from
an encoded QUERY_EVENT to an evolved StructType."""

from __future__ import annotations

import pytest

from ru_cdc_spark.catalog import FieldMeta, TableCatalog, TableSchema
from ru_cdc_spark.sources.ddl import apply_ddl, parse_ddl


def _catalog() -> TableCatalog:
    cat = TableCatalog()
    cat.register(TableSchema("testdb", "orders", [
        FieldMeta("o_orderkey", "bigint", True),
        FieldMeta("o_totalprice", "decimal(18,2)"),
    ], version=1))
    return cat


@pytest.mark.parametrize("sql,names,types", [
    ("ALTER TABLE orders ADD COLUMN note varchar(255)",
     ["note"], ["varchar(255)"]),
    ("ALTER TABLE `testdb`.`orders` ADD `note` TEXT AFTER o_totalprice",
     ["note"], ["text"]),
    ("alter table orders add column a int unsigned not null default 0, "
     "add column b decimal(10,2) first",
     ["a", "b"], ["int unsigned", "decimal(10,2)"]),
])
def test_parse_alter_add(sql, names, types):
    ch = parse_ddl(sql, default_db="testdb")
    assert ch is not None and ch.kind == "add_columns"
    assert (ch.database, ch.table) == ("testdb", "orders")
    assert [f.name for f in ch.columns] == names
    assert [f.mysql_type for f in ch.columns] == types


def test_parse_non_ddl_returns_none():
    for sql in ["BEGIN", "COMMIT", "GRANT ALL ON *.* TO x",
                "ANALYZE TABLE orders", "INSERT INTO t VALUES (1)"]:
        assert parse_ddl(sql, "testdb") is None


def test_apply_add_column_widens_and_bumps_version():
    cat = _catalog()
    ch = apply_ddl(cat, "ALTER TABLE orders ADD COLUMN note varchar(64)",
                   default_db="testdb")
    assert ch is not None
    sch = cat.lookup("testdb", "orders")
    assert [f.name for f in sch.fields] == [
        "o_orderkey", "o_totalprice", "note"]
    assert sch.version == 2
    assert "note" in sch.struct_type().fieldNames()


def test_apply_drop_column_is_widening_noop():
    cat = _catalog()
    ch = apply_ddl(cat, "ALTER TABLE orders DROP COLUMN o_totalprice",
                   default_db="testdb")
    assert ch is not None and ch.kind == "drop_columns"
    sch = cat.lookup("testdb", "orders")
    assert [f.name for f in sch.fields] == ["o_orderkey", "o_totalprice"]
    assert sch.version == 1


def test_apply_create_and_drop_table():
    cat = _catalog()
    apply_ddl(cat, """CREATE TABLE testdb.audit (
        id bigint PRIMARY KEY,
        what varchar(100) NOT NULL,
        at datetime(6),
        KEY idx_at (at)
    )""")
    sch = cat.lookup("testdb", "audit")
    assert [f.name for f in sch.fields] == ["id", "what", "at"]
    assert sch.pk_names == ["id"]

    apply_ddl(cat, "DROP TABLE testdb.audit")
    assert cat.lookup("testdb", "audit") is None
    assert cat.is_dropped("testdb", "audit")


def test_create_with_separate_primary_key_clause():
    cat = TableCatalog()
    apply_ddl(cat, "CREATE TABLE t (a int, b int, PRIMARY KEY (a))",
              default_db="d")
    assert cat.lookup("d", "t").pk_names == ["a"]


def test_query_event_bytes_to_evolved_schema():
    """Wire integration: QUERY_EVENT bytes -> decode -> parse -> catalog
    evolution, the proactive path the reference never wired up."""
    from ru_cdc_spark.sources.binlog_wire import decode_query, encode_query

    cat = _catalog()
    ev = encode_query("ALTER TABLE orders ADD COLUMN flag tinyint",
                      schema="testdb")
    schema_name, sql = decode_query(ev)
    ch = apply_ddl(cat, sql, default_db=schema_name)
    assert ch is not None and ch.kind == "add_columns"
    evolved = cat.lookup("testdb", "orders")
    assert evolved.version == 2
    assert evolved.struct_type().fieldNames()[-1] == "flag"
