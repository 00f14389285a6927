"""DDL-text schema evolution: the reference's dead QueryEvent, made live.

The reference decodes QUERY_EVENT (DDL statements travel in it under ROW
binlog format) but never wires it into the pipeline — `QueryEvent::decode`
exists at /root/reference/src/binlog.rs:768-811 and is only imported, never
invoked (SURVEY.md D11); DDL is silently dropped and the schema cache goes
stale until a manual restart. This engine already evolves reactively from
TABLE_MAP arity changes (`binlog_wire_schema_evolution`); this module adds
the PROACTIVE path: parse the DDL text itself and evolve the catalog the
moment the statement replicates — before any row event arrives under the
new shape — so `ALTER TABLE ... ADD COLUMN` never produces even a
transient decode under the stale schema.

Supported statements (regex grammar over the MySQL dialect actually seen
in binlogs):

* ``ALTER TABLE [db.]tbl ADD [COLUMN] name type [...], ADD ...`` —
  widening evolution via ``TableCatalog.evolve`` (multiple ADD clauses,
  backtick quoting, FIRST/AFTER placement — placement is ignored: column
  identity, not order, addresses values here);
* ``ALTER TABLE ... DROP COLUMN x`` — deliberately a no-op on the schema
  (the engine's widening-only policy: dropped source columns read NULL
  downstream; consumers never lose a column mid-stream);
* ``CREATE TABLE [db.]tbl (col defs...)`` — registers a fresh schema,
  with PRIMARY KEY columns marked;
* ``DROP TABLE [db.]tbl`` — negative-caches the table (P6), exactly like
  a failed DESC in the reference (executor.rs:416-418).

Driver-side control plane: DDL is a handful of statements per day against
millions of row events — parsing happens on the driver inside the
micro-batch loop, and only the resulting StructType is broadcast.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ru_cdc_spark.catalog import FieldMeta, TableCatalog

_IDENT = r"`(?:[^`]+)`|[A-Za-z_][A-Za-z0-9_]*"
# a MySQL column type: word, optional (args), optional unsigned/zerofill
_COLTYPE = r"[A-Za-z]+(?:\s*\([^)]*\))?(?:\s+unsigned)?(?:\s+zerofill)?"


def _unq(ident: str) -> str:
    return ident[1:-1] if ident.startswith("`") else ident


def _split_qualified(name: str, default_db: str) -> tuple[str, str]:
    m = re.match(rf"^\s*(?:({_IDENT})\s*\.\s*)?({_IDENT})\s*$", name)
    if not m:
        raise ValueError(f"bad table name: {name!r}")
    db = _unq(m.group(1)) if m.group(1) else default_db
    return db, _unq(m.group(2))


@dataclass
class DdlChange:
    kind: str                     # add_columns | drop_columns | create | drop_table
    database: str
    table: str
    columns: list[FieldMeta] = field(default_factory=list)
    dropped: list[str] = field(default_factory=list)


def parse_ddl(sql: str, default_db: str = "") -> DdlChange | None:
    """Parse one replicated DDL statement; None for non-DDL (BEGIN,
    COMMIT, GRANT, ANALYZE, ...) — callers pass every QUERY event through
    and act only on parsed changes."""
    s = sql.strip().rstrip(";").strip()

    m = re.match(rf"^ALTER\s+TABLE\s+((?:{_IDENT})(?:\s*\.\s*(?:{_IDENT}))?)\s+(.*)$",
                 s, re.IGNORECASE | re.DOTALL)
    if m:
        db, tbl = _split_qualified(m.group(1), default_db)
        body = m.group(2)
        adds: list[FieldMeta] = []
        drops: list[str] = []
        for clause in re.split(r",(?![^()]*\))", body):
            c = clause.strip()
            am = re.match(
                rf"^ADD\s+(?:COLUMN\s+)?({_IDENT})\s+({_COLTYPE})"
                rf"(?:\s+.*)?$",
                c, re.IGNORECASE | re.DOTALL)
            if am:
                adds.append(FieldMeta(_unq(am.group(1)),
                                      am.group(2).strip().lower(), False))
                continue
            dm = re.match(rf"^DROP\s+(?:COLUMN\s+)?({_IDENT})\s*$",
                          c, re.IGNORECASE)
            if dm:
                drops.append(_unq(dm.group(1)))
        if adds:
            return DdlChange("add_columns", db, tbl, columns=adds,
                             dropped=drops)
        if drops:
            return DdlChange("drop_columns", db, tbl, dropped=drops)
        return None

    m = re.match(
        rf"^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
        rf"((?:{_IDENT})(?:\s*\.\s*(?:{_IDENT}))?)\s*\((.*)\)[^)]*$",
        s, re.IGNORECASE | re.DOTALL)
    if m:
        db, tbl = _split_qualified(m.group(1), default_db)
        cols: list[FieldMeta] = []
        pks: set[str] = set()
        for clause in re.split(r",(?![^()]*\))", m.group(2)):
            c = clause.strip()
            pk = re.match(rf"^PRIMARY\s+KEY\s*\(\s*({_IDENT})"
                          rf"(?:\s*,\s*(?:{_IDENT}))*\s*\)$",
                          c, re.IGNORECASE)
            if pk:
                pks.update(_unq(x) for x in re.findall(_IDENT, pk.group(0))
                           if x.upper() not in ("PRIMARY", "KEY"))
                continue
            if re.match(r"^(?:UNIQUE|KEY|INDEX|CONSTRAINT|FOREIGN)\b", c,
                        re.IGNORECASE):
                continue
            cm = re.match(rf"^({_IDENT})\s+({_COLTYPE})(?:\s+.*)?$",
                          c, re.IGNORECASE | re.DOTALL)
            if cm:
                is_pk = bool(re.search(r"\bPRIMARY\s+KEY\b", c, re.IGNORECASE))
                cols.append(FieldMeta(_unq(cm.group(1)),
                                      cm.group(2).strip().lower(), is_pk))
        for f in cols:
            if f.name in pks:
                f.is_pk = True
        return DdlChange("create", db, tbl, columns=cols)

    m = re.match(rf"^DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?"
                 rf"((?:{_IDENT})(?:\s*\.\s*(?:{_IDENT}))?)\s*$",
                 s, re.IGNORECASE)
    if m:
        db, tbl = _split_qualified(m.group(1), default_db)
        return DdlChange("drop_table", db, tbl)

    return None


def apply_ddl(catalog: TableCatalog, sql: str,
              default_db: str = "") -> DdlChange | None:
    """Parse + apply one QUERY-event statement to the catalog. Returns the
    parsed change (for audit logs) or None if the statement was not DDL.

    ADD COLUMN widens through ``TableCatalog.evolve`` (version bump —
    downstream snapshots fence on it); DROP COLUMN is a policy no-op;
    CREATE registers; DROP TABLE negative-caches.
    """
    change = parse_ddl(sql, default_db)
    if change is None:
        return None
    if change.kind == "add_columns":
        catalog.evolve(change.database, change.table, change.columns)
    elif change.kind == "create":
        from ru_cdc_spark.catalog import TableSchema
        catalog.register(TableSchema(change.database, change.table,
                                     change.columns, version=1))
    elif change.kind == "drop_table":
        catalog.mark_dropped(change.database, change.table)
    # drop_columns: widening-only policy — schema unchanged
    return change
