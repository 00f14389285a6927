"""JDBC source plumbing (S1-S5/S8 parity): option assembly, partitioned
scan math, catalog query, and gated read."""

from __future__ import annotations

import pytest

from ru_cdc_spark.catalog import TableCatalog
from ru_cdc_spark.sources.jdbc import (
    MySqlSource,
    desc_table_options,
    jdbc_read_options,
    read_mysql_table,
)

SRC = MySqlSource(host="127.0.0.1", database="shop", user="canal", password="canal")


def test_url_shape():
    assert SRC.url == "jdbc:mysql://127.0.0.1:3306/shop?useSSL=false&serverTimezone=UTC"


def test_partitioned_read_options():
    opts = jdbc_read_options(SRC, "orders", partition_column="o_orderkey",
                             lower_bound=1, upper_bound=1_000_000,
                             num_partitions=16)
    assert opts["partitionColumn"] == "o_orderkey"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "1000000")
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"


def test_partitioned_read_requires_bounds():
    with pytest.raises(ValueError, match="lower_bound"):
        jdbc_read_options(SRC, "orders", partition_column="o_orderkey")


def test_desc_query_feeds_catalog():
    opts = desc_table_options(SRC, "accounts")
    q = opts["dbtable"]
    assert "information_schema.columns" in q
    assert "table_schema = 'shop'" in q and "table_name = 'accounts'" in q
    # the projected columns are exactly the fields_from_desc contract
    rows = [("id", "bigint(20)", "PRI"), ("v", "varchar(10)", "")]
    fields = TableCatalog.fields_from_desc(rows)
    assert fields[0].is_pk and fields[0].name == "id"


def test_read_gated_without_driver(spark):
    with pytest.raises(NotImplementedError, match="mysql-connector-j"):
        read_mysql_table(spark, SRC, "orders")
