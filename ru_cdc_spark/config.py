"""Pipeline configuration model + wildcard routing semantics.

Reproduces the reference's config surface (ru-cdc ``src/config.rs:74-85``) and
its wildcard matcher / instance-routing predicate (``src/config.rs:41-72``),
re-expressed two ways:

* :func:`match_pattern` — driver-side Python, used for config validation and
  unit truth tables.
* :func:`pattern_to_sql_condition` / :func:`routing_condition` — Catalyst
  ``Column`` expressions so routing runs distributed, JVM-side, and is
  pushdown-eligible (the reference evaluates routing *before* row decode,
  ``src/executor.rs:528-537``; in Spark we filter on the cheap metadata
  columns before ``from_json`` for the same effect).

Wildcard semantics (``src/config.rs:57-72``), order matters:

1. pattern ends with ``*``  -> prefix match (checked FIRST, so ``*`` alone
   matches everything via the empty prefix)
2. pattern starts with ``*`` -> suffix match
3. pattern contains exactly one interior ``*`` -> prefix AND suffix match
4. otherwise -> exact equality

Routing (``src/config.rs:41-55`` driven by ``src/executor.rs:529-537``): for
EACH configured instance, if the schema pattern matches the database AND no
blacklist pattern matches the table AND the table pattern matches the table,
the event fans out to that instance's (mq, topic). One event can match many
instances.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# config model (mirrors reference Config/Mq/Instance JSON shape)
# ---------------------------------------------------------------------------


@dataclass
class SinkConfig:
    """A named sink (reference ``Mq``, src/config.rs:26-30).

    ``kind`` is 'kafka' | 'redis' | 'memory' | 'parquet' | 'json'; options are
    passed to the Spark writer (e.g. kafka.bootstrap.servers). The local test
    image has no Kafka broker, so kafka configs are constructed but the
    actual network sink is exercised only through file/memory sinks.
    """

    name: str
    kind: str = "kafka"
    options: dict[str, str] = field(default_factory=dict)


@dataclass
class InstanceConfig:
    """A routing rule (reference ``Instance``, src/config.rs:32-39)."""

    mq: str
    schemas: str
    tables: str
    topic: str
    black_list: list[str] = field(default_factory=list)


@dataclass
class PipelineConfig:
    """Top-level config (reference ``Config``, src/config.rs:74-85).

    MySQL connection fields are retained for config parity; in the Spark
    engine the binlog source is replaced by a Canal/Debezium-JSON change
    stream (Kafka topic or file feed) — see SURVEY.md §1.3.
    """

    source_path: str = ""
    source_format: str = "json"
    checkpoint_dir: str = ""
    from_start: bool = False
    workers: int = 0  # 0 = let Spark decide (shuffle partitions)
    max_events_per_trigger: int | None = 10_000  # backpressure (ref lacks it)
    sinks: list[SinkConfig] = field(default_factory=list)
    instances: list[InstanceConfig] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "PipelineConfig":
        raw = json.loads(text)
        sinks = [SinkConfig(**s) for s in raw.pop("sinks", [])]
        instances = [InstanceConfig(**i) for i in raw.pop("instances", [])]
        return cls(sinks=sinks, instances=instances, **raw)

    @classmethod
    def load_from(cls, path: str) -> "PipelineConfig":
        with open(path, "r", encoding="utf-8") as fh:
            return cls.from_json(fh.read())

    def save_to(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(self.to_json())

    @classmethod
    def gen_default(cls) -> "PipelineConfig":
        """Scaffold config (reference ``gen_default``, src/config.rs:116-134)."""
        return cls(
            source_path="/tmp/ru_cdc_spark/changes",
            checkpoint_dir="/tmp/ru_cdc_spark/checkpoint",
            sinks=[SinkConfig(name="the_kafka", kind="kafka",
                              options={"kafka.bootstrap.servers": "127.0.0.1:9092",
                                       "kafka.linger.ms": "333"})],
            instances=[InstanceConfig(mq="the_kafka", schemas="test*", tables="s*",
                                      black_list=["tb01", "tb02"], topic="db_change")],
        )


# ---------------------------------------------------------------------------
# wildcard matcher — Python side
# ---------------------------------------------------------------------------


def match_pattern(pattern: str, value: str) -> bool:
    """Reference wildcard semantics (src/config.rs:57-72). See module doc."""
    if pattern.endswith("*"):
        return value.startswith(pattern[:-1])
    if pattern.startswith("*"):
        return value.endswith(pattern[1:])
    parts = pattern.split("*")
    if len(parts) == 2:
        return value.startswith(parts[0]) and value.endswith(parts[1])
    return value == pattern


# ---------------------------------------------------------------------------
# wildcard matcher — Catalyst Column side (distributed, codegen'd)
# ---------------------------------------------------------------------------


def pattern_condition(pattern: str, col: Column) -> Column:
    """Compile one wildcard pattern to a Column predicate.

    Uses startswith/endswith (JVM string ops inside whole-stage codegen) —
    no regex, no UDF, so Catalyst can constant-fold and push the predicate
    into the scan when ``col`` is a top-level source column.
    """
    if pattern.endswith("*"):
        prefix = pattern[:-1]
        return F.lit(True) if prefix == "" else col.startswith(prefix)
    if pattern.startswith("*"):
        return col.endswith(pattern[1:])
    parts = pattern.split("*")
    if len(parts) == 2:
        head = F.lit(True) if parts[0] == "" else col.startswith(parts[0])
        tail = F.lit(True) if parts[1] == "" else col.endswith(parts[1])
        return head & tail
    return col == F.lit(pattern)


def pattern_to_sql_condition(pattern: str, col_name: str) -> str:
    """Same compilation targeting SQL text (for the DuckDB oracle).

    Uses ``starts_with``/``ends_with`` instead of LIKE so literal ``%``/``_``
    in patterns need no escaping.
    """

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    if pattern.endswith("*"):
        prefix = pattern[:-1]
        return "TRUE" if prefix == "" else f"starts_with({col_name}, {q(prefix)})"
    if pattern.startswith("*"):
        return f"ends_with({col_name}, {q(pattern[1:])})"
    parts = pattern.split("*")
    if len(parts) == 2:
        conds = []
        if parts[0]:
            conds.append(f"starts_with({col_name}, {q(parts[0])})")
        if parts[1]:
            conds.append(f"ends_with({col_name}, {q(parts[1])})")
        return " AND ".join(conds) if conds else "TRUE"
    return f"{col_name} = {q(pattern)}"


def instance_condition_sql(inst: InstanceConfig, db_col: str, table_col: str) -> str:
    """SQL text of the full routing predicate for one instance."""
    conds = [pattern_to_sql_condition(inst.schemas, db_col)]
    conds += [f"NOT ({pattern_to_sql_condition(b, table_col)})" for b in inst.black_list]
    conds.append(pattern_to_sql_condition(inst.tables, table_col))
    return " AND ".join(f"({c})" for c in conds)


def instance_condition(inst: InstanceConfig, db: Column, table: Column) -> Column:
    """Full routing predicate for one instance (src/config.rs:41-55):
    schemas matches db AND no blacklist pattern matches table AND tables
    matches table."""
    cond = pattern_condition(inst.schemas, db)
    for black in inst.black_list:
        cond = cond & ~pattern_condition(black, table)
    return cond & pattern_condition(inst.tables, table)


def route(df: DataFrame, instances: list[InstanceConfig],
          db_col: str = "database", table_col: str = "table") -> DataFrame:
    """Fan out each change event to every matching instance.

    Adds ``mq`` and ``topic`` columns; events matching no instance are
    dropped (reference drops them before row decode,
    src/executor.rs:529-537). Implemented as a generated
    ``array(struct(mq, topic))`` filtered per instance + ``explode`` —
    a narrow, shuffle-free transformation that scales linearly and keeps
    the (db, table) filter ahead of any payload parsing.
    """
    if not instances:
        # zero rules match zero events (typed empty result, same schema)
        return (
            df.withColumn("mq", F.lit(None).cast("string"))
            .withColumn("topic", F.lit(None).cast("string"))
            .where(F.lit(False))
        )
    db, table = F.col(db_col), F.col(table_col)
    matches = F.array(*[
        F.when(instance_condition(inst, db, table),
               F.struct(F.lit(inst.mq).alias("mq"), F.lit(inst.topic).alias("topic")))
        for inst in instances
    ])
    matches = F.filter(matches, lambda x: x.isNotNull())
    return (
        df.withColumn("__routes", matches)
        .where(F.size("__routes") > 0)
        .withColumn("__route", F.explode("__routes"))
        .withColumn("mq", F.col("__route.mq"))
        .withColumn("topic", F.col("__route.topic"))
        .drop("__routes", "__route")
    )
