"""Scalar-function library: MySQL type semantics, type-code maps, text and
vector math. All built from pyspark.sql.functions (JVM-side, codegen'd) —
no row-at-a-time Python UDFs in any hot path."""

from ru_cdc_spark.functions.typemap import (  # noqa: F401
    JDBC_TYPE_CODES,
    jdbc_type_code,
    mysql_type_to_spark,
)
