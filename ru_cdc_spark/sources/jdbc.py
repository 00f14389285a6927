"""MySQL-over-JDBC source plumbing (SURVEY §2.1 S1-S5, S8).

The reference speaks the MySQL wire protocol by hand (connect/auth S1,
packet framing S2/S3, text-protocol queries S4/S5); in Spark all of that
belongs to the JDBC connector — the engine's job is assembling the options
that make the read *partitioned* (parallel scan) and pushdown-friendly,
plus the catalog fetch (S8) as an information_schema query.

The test image carries no MySQL server or JDBC driver jar, so actual reads
are gated: option assembly and partitioning math are unit-tested, the
read call degrades with a clear error.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class MySqlSource:
    host: str
    port: int = 3306
    database: str = ""
    user: str = "canal"
    password: str = "canal"

    @property
    def url(self) -> str:
        return (f"jdbc:mysql://{self.host}:{self.port}/{self.database}"
                "?useSSL=false&serverTimezone=UTC")


def jdbc_read_options(src: MySqlSource, table: str,
                      partition_column: str | None = None,
                      lower_bound: int | None = None,
                      upper_bound: int | None = None,
                      num_partitions: int = 8,
                      fetch_size: int = 10_000) -> dict[str, str]:
    """Reader options for a parallel, pushdown-friendly JDBC scan.

    ``partition_column`` (a numeric/PK column) splits the scan into
    ``num_partitions`` stride ranges — without it the whole table funnels
    through ONE task, the classic JDBC-at-scale mistake. ``fetchsize``
    controls the row batch per round-trip (MySQL defaults to
    row-at-a-time).
    """
    opts = {
        "url": src.url,
        "dbtable": table,
        "user": src.user,
        "password": src.password,
        "driver": "com.mysql.cj.jdbc.Driver",
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower_bound and upper_bound")
        opts.update({
            "partitionColumn": partition_column,
            "lowerBound": str(lower_bound),
            "upperBound": str(upper_bound),
            "numPartitions": str(num_partitions),
        })
    return opts


DESC_QUERY = """
(SELECT column_name AS Field, column_type AS Type,
        CASE WHEN column_key = 'PRI' THEN 'PRI' ELSE '' END AS `Key`
 FROM information_schema.columns
 WHERE table_schema = '{database}' AND table_name = '{table}'
 ORDER BY ordinal_position) AS t
"""


def desc_table_options(src: MySqlSource, table: str) -> dict[str, str]:
    """S8 catalog fetch as a pushdown query: the information_schema
    equivalent of the reference's ``DESC db.table``
    (/root/reference/src/mysql.rs:190-223) — result rows feed
    ``TableCatalog.fields_from_desc`` unchanged."""
    return {
        "url": src.url,
        "dbtable": DESC_QUERY.format(database=src.database, table=table),
        "user": src.user,
        "password": src.password,
        "driver": "com.mysql.cj.jdbc.Driver",
    }


def read_mysql_table(spark: SparkSession, src: MySqlSource, table: str,
                     **partition_kwargs) -> DataFrame:
    """Run the JDBC read (requires the MySQL driver jar on the classpath —
    not present in the test image; raises with guidance)."""
    opts = jdbc_read_options(src, table, **partition_kwargs)
    try:
        return spark.read.format("jdbc").options(**opts).load()
    except Exception as exc:  # driver jar missing in this image
        raise NotImplementedError(
            "JDBC read requires mysql-connector-j on the Spark classpath "
            "(--jars / spark.jars.packages); not available in this image"
        ) from exc
