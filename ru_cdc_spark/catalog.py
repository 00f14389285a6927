"""Table catalog: the engine's schema registry.

Reproduces the reference's two-layer schema machinery (SURVEY.md §1.1):
TABLE_MAP registry + lazily-populated ``DESC`` cache with a negative cache
for dropped tables (/root/reference/src/executor.rs:404-443, S8/X3/P6) and
fills the DDL gap the reference leaves open (D11 dead code — QueryEvent is
decoded but never handled): unknown columns trigger widening schema
evolution instead of silent drops.

The catalog lives on the driver and is closed over by plan-construction
code (broadcast to executors implicitly through the generated expressions;
no task-side lookups) — the Spark analog of the reference's
``Arc<Mutex<HashMap>>`` shared across workers (X3) without the lock.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from ru_cdc_spark.functions.typemap import jdbc_type_code, mysql_type_to_spark


@dataclass
class FieldMeta:
    """One column of a registered table (reference ``FieldMeta``,
    src/mysql.rs:190-216: name, type string, PK flag)."""

    name: str
    mysql_type: str
    is_pk: bool = False

    @property
    def spark_type(self) -> T.DataType:
        return mysql_type_to_spark(self.mysql_type)

    @property
    def jdbc_code(self) -> int:
        return jdbc_type_code(self.mysql_type)


@dataclass
class TableSchema:
    database: str
    table: str
    fields: list[FieldMeta] = field(default_factory=list)
    version: int = 0

    @property
    def qualified(self) -> str:
        return f"{self.database}.{self.table}"

    @property
    def pk_names(self) -> list[str]:
        return [f.name for f in self.fields if f.is_pk]

    @property
    def mysql_types(self) -> dict[str, str]:
        return {f.name: f.mysql_type for f in self.fields}

    def struct_type(self) -> T.StructType:
        return T.StructType([
            T.StructField(f.name, f.spark_type, True) for f in self.fields
        ])


class TableCatalog:
    """Register/lookup with negative caching and widening evolution."""

    def __init__(self) -> None:
        self._tables: dict[str, TableSchema] = {}
        self._not_exists: set[str] = set()

    # -- registration / lookup (S8 + P6) -----------------------------------

    def register(self, schema: TableSchema) -> None:
        self._tables[schema.qualified] = schema
        self._not_exists.discard(schema.qualified)

    def mark_dropped(self, database: str, table: str) -> None:
        """Negative cache: a table that failed the catalog fetch is skipped
        permanently (reference executor.rs:416-418,427-429) until a
        re-register."""
        key = f"{database}.{table}"
        self._tables.pop(key, None)
        self._not_exists.add(key)

    def is_dropped(self, database: str, table: str) -> bool:
        return f"{database}.{table}" in self._not_exists

    def lookup(self, database: str, table: str) -> TableSchema | None:
        """None for unknown AND for dropped tables — callers filter the
        stream against known tables (left-anti against dropped)."""
        if self.is_dropped(database, table):
            return None
        return self._tables.get(f"{database}.{table}")

    def known_tables(self) -> list[str]:
        return sorted(self._tables)

    # -- schema evolution (the D11 gap) -------------------------------------

    def evolve(self, database: str, table: str,
               new_fields: list[FieldMeta]) -> TableSchema:
        """Widening evolution: add unseen columns (never drop, never
        narrow — dropped source columns simply stay NULL downstream, the
        safe default for CDC consumers). Bumps the schema version so
        downstream snapshots can fence on it."""
        current = self.lookup(database, table)
        if current is None:
            schema = TableSchema(database, table, list(new_fields), version=1)
            self.register(schema)
            return schema
        known = {f.name for f in current.fields}
        added = [f for f in new_fields if f.name not in known]
        if not added:
            return current
        evolved = TableSchema(
            database, table, current.fields + added, version=current.version + 1)
        self.register(evolved)
        return evolved

    # -- construction from a DESC-style result (S8) --------------------------

    @staticmethod
    def fields_from_desc(rows: list[tuple[str, str, str]]) -> list[FieldMeta]:
        """Build FieldMeta from (Field, Type, Key) tuples — the shape of a
        MySQL ``DESC`` text result set (reference mysql.rs:190-223; PK when
        Key == 'PRI')."""
        return [FieldMeta(name, mysql_type, key == "PRI")
                for name, mysql_type, key in rows]

    def load_from_mysql(self, conn, tables: list[tuple[str, str]]) -> None:
        """Populate the catalog over a LIVE wire-protocol connection
        (sources/mysql_client.MySQLConnection): DESC each table and
        register its FieldMeta — the reference's exact startup path
        (executor.rs catalog fetch via mysql.rs:185-215), now running
        against real sockets (round 3). Missing tables go to the
        negative cache (P6) instead of raising, matching the
        reference's skip-on-DESC-failure behavior."""
        from ru_cdc_spark.sources.mysql_client import MySQLError

        for database, table in tables:
            try:
                metas = conn.desc_table(database, table)
            except MySQLError:
                self.mark_dropped(database, table)
                continue
            self.register(TableSchema(database, table, [
                FieldMeta(m.name, m.field_type, m.is_pk) for m in metas
            ]))


# ---------------------------------------------------------------------------
# data-plane catalog (10k+ tables)
# ---------------------------------------------------------------------------

def catalog_to_dataframe(spark, catalog: TableCatalog):
    """The catalog as a (database, table, version, pk0, n_fields) DataFrame.

    Driver-dict lookups closed over by generated expressions stop scaling
    around a few hundred tables: every table adds predicate text to the
    plan, and analysis time grows with catalog size. As data, the catalog
    joins the stream in ONE broadcast hash join whose plan is O(1) in the
    number of tables — the 10k-tenant shape.
    """
    rows = [
        (s.database, s.table, s.version,
         (s.pk_names or [None])[0], len(s.fields))
        for s in (catalog.lookup(*k.split(".", 1))
                  for k in catalog.known_tables())
        if s is not None
    ]
    return spark.createDataFrame(
        rows, "database string, table string, version int, pk0 string, n_fields int")


def annotate_stream_with_catalog(stream, cat_df):
    """Broadcast-join a change stream against the catalog: rows of unknown
    or dropped tables fall out (inner join = the P6 negative-cache filter
    in data-plane form); survivors carry schema version + pk for the
    downstream merge."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(cat_df), ["database", "table"])
