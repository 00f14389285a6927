"""The streaming CDC pipeline: source -> lazy parse -> route -> sink.

Spark-first re-expression of the reference's serve loop
(/root/reference/src/main.rs:74-131 and worker path executor.rs:501-616):

| reference stage                          | here |
|------------------------------------------|------|
| binlog dump subscription (S6/S7)         | readStream on a Canal-JSON feed (file dir locally; Kafka topic in prod — same plan) |
| lazy payload decode (D2, executor P5)    | two-phase from_json: a 2-field routing schema first, full envelope only for routed rows |
| instance routing (P1/P2)                 | config.route — codegen'd string predicates, fan-out to (mq, topic) |
| worker pool + round-robin (X1/X2)        | micro-batch task scheduling; ordering restored per-key by the seq column instead of thread order |
| Kafka/Redis sinks (K1-K3)                | writeStream to kafka (per-row topic) or file/memory sinks locally |
| position checkpoint (C1-C3)              | checkpointLocation offset+commit logs (exactly-once to idempotent sinks) |
| unbounded mpsc hazard (§4 flow control)  | maxFilesPerTrigger / maxOffsetsPerTrigger backpressure |

Scale: stateless map pipeline — parallelism is source partitions; no
shuffle anywhere in the hot path. The merge materialization
(foreachBatch -> merge_upsert) adds the single PK shuffle per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ru_cdc_spark.config import PipelineConfig, route

# Canal envelope schema (FIXTURES.md B1 / reference executor.rs:90-105)
ENVELOPE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("database", T.StringType()),
    T.StructField("table", T.StringType()),
    T.StructField("pkNames", T.ArrayType(T.StringType())),
    T.StructField("isDdl", T.BooleanType()),
    T.StructField("type", T.StringType()),
    T.StructField("es", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("sql", T.StringType()),
    T.StructField("sqlType", T.MapType(T.StringType(), T.IntegerType())),
    T.StructField("mysqlType", T.MapType(T.StringType(), T.StringType())),
    T.StructField("data", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
    T.StructField("old", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
])

# cheap projection parsed BEFORE routing (P5 filter-before-decode analog)
ROUTING_SCHEMA = T.StructType([
    T.StructField("database", T.StringType()),
    T.StructField("table", T.StringType()),
])


class CdcPipeline:
    """Builds and runs the streaming query from a PipelineConfig."""

    def __init__(self, spark: SparkSession, config: PipelineConfig) -> None:
        self.spark = spark
        self.config = config

    # -- source --------------------------------------------------------------

    def read_stream(self) -> DataFrame:
        """Canal-JSON line feed as a rate-limited stream. Locally a file
        dir; on a cluster the same two-phase parse runs on Kafka's
        ``value`` column."""
        reader = (
            self.spark.readStream.format("text")
            .option("maxFilesPerTrigger",
                    str(max(1, (self.config.max_events_per_trigger or 10_000) // 10_000)))
        )
        return reader.load(self.config.source_path).withColumnRenamed("value", "payload")

    # -- transform -----------------------------------------------------------

    def routed(self, raw: DataFrame,
               dropped_tables: list[tuple[str, str]] | None = None) -> DataFrame:
        """Two-phase parse + route: extract only (database, table), filter
        against instance rules, and parse the full envelope just for
        surviving rows — the reference's decode-after-filter optimization
        (executor.rs:528-553), expressed so Catalyst prunes the heavy
        from_json behind the filter.

        ``dropped_tables`` is the catalog's negative cache (P6, reference
        executor.rs:416-429): events for permanently-failed tables are
        discarded before parsing, as a broadcastable literal filter.
        """
        with_meta = raw.withColumn("__meta", F.from_json("payload", ROUTING_SCHEMA))
        flat = with_meta.select(
            F.col("__meta.database").alias("database"),
            F.col("__meta.table").alias("table"),
            "payload",
        )
        if dropped_tables:
            qualified = F.concat_ws(".", F.col("database"), F.col("table"))
            flat = flat.where(~qualified.isin(*[f"{d}.{t}" for d, t in dropped_tables]))
        routed = route(flat, self.config.instances)
        return routed.withColumn("envelope", F.from_json("payload", ENVELOPE_SCHEMA))

    @staticmethod
    def split_dead_letters(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Malformed-payload quarantine (dead-letter queue): rows whose
        payload fails the routing-schema parse (or carries no database/
        table) are split off instead of silently dropped — the reference
        has no bad-input path at all (binlog bytes are trusted); a
        JSON-transport engine needs one.

        Returns (good, dead) frames. Both lanes preserve every input
        column (source offsets/keys ride along for replay); ``good`` adds
        the parsed routing fields, ``dead`` adds an error tag. Input
        columns already named database/table are excluded from the
        passthrough (the parsed routing fields own those names).
        """
        passthrough = [c for c in raw.columns if c not in ("database", "table")]
        with_meta = raw.withColumn("__meta", F.from_json("payload", ROUTING_SCHEMA))
        ok = F.col("__meta").isNotNull() & F.col("__meta.database").isNotNull() \
            & F.col("__meta.table").isNotNull()
        good = with_meta.where(ok).select(
            F.col("__meta.database").alias("database"),
            F.col("__meta.table").alias("table"),
            *passthrough,
        )
        dead = with_meta.where(~ok).select(
            *passthrough,
            F.lit("unparseable_or_missing_routing_fields").alias("error"),
            F.current_timestamp().alias("quarantined_at"),
        )
        return good, dead

    def sink_rows(self, routed: DataFrame) -> DataFrame:
        """Kafka-shaped output: (topic, key, value). Key = database.table:pk
        so log-compacted topics keep per-row latest (and per-key ordering
        within a partition — fixing the reference's X2 ordering hazard)."""
        pk_vals = F.transform(
            F.col("envelope.pkNames"),
            lambda pk: F.element_at(F.element_at(F.col("envelope.data"), 1), pk),
        )
        key = F.concat_ws(".", F.col("database"), F.col("table"),
                          F.concat_ws("_", pk_vals))
        return routed.select(
            F.col("mq"), F.col("topic"), key.alias("key"),
            F.col("payload").alias("value"),
        )

    # -- sinks ---------------------------------------------------------------

    def start_to_parquet(self, out_dir: str, checkpoint_dir: str | None = None,
                         query_name: str = "cdc_pipeline") -> StreamingQuery:
        """File sink (local stand-in for the Kafka sink; same routed rows).
        Exactly-once via checkpoint + transactional file commit."""
        rows = self.sink_rows(self.routed(self.read_stream()))
        return (
            rows.writeStream.format("parquet")
            .queryName(query_name)
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir or self.config.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def start_to_memory(self, query_name: str = "cdc_mem") -> StreamingQuery:
        rows = self.sink_rows(self.routed(self.read_stream()))
        return (
            rows.writeStream.format("memory").queryName(query_name)
            .outputMode("append").start()
        )

    def start_to_sinks(self, checkpoint_dir: str | None = None,
                       query_name: str = "cdc_mux") -> StreamingQuery:
        """Fan out to every configured sink via the foreachBatch mux
        (streaming/sinks.py) — one stream serving heterogeneous sinks."""
        from ru_cdc_spark.streaming.sinks import make_mux

        rows = self.sink_rows(self.routed(self.read_stream()))
        return (
            rows.writeStream.queryName(query_name)
            .foreachBatch(make_mux(self.config.sinks))
            .option("checkpointLocation", checkpoint_dir or self.config.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def start_merge(self, snapshot_dir: str, pk_cols: list[str],
                    value_schema: T.StructType,
                    checkpoint_dir: str | None = None) -> StreamingQuery:
        """Materialization: apply each micro-batch to a parquet snapshot via
        merge semantics (foreachBatch; with Delta jars this becomes
        ``MERGE INTO`` on the same change rows).

        Version-aware with tombstones (operators/merge.merge_versioned), so
        the result is correct under out-of-order delivery across batches
        AND idempotent under checkpoint replay — effective exactly-once
        where the reference is at-least-once (K4/C1). The stored snapshot
        carries __seq/__deleted meta; read it via merge.snapshot_view."""
        from ru_cdc_spark.operators.merge import merge_versioned

        spark = self.spark
        envelopes = self.routed(self.read_stream()).select("envelope.*").dropDuplicates(["id"])

        def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
            if batch_df.isEmpty():
                return
            data_map = F.element_at(F.col("data"), 1)
            typed = batch_df.select(
                "id", "type",
                F.struct(*[
                    data_map.getItem(f.name).cast(f.dataType).alias(f.name)
                    for f in value_schema.fields
                ]).alias("after"),
            ).withColumn("before", F.col("after"))
            try:
                snapshot_meta = spark.read.parquet(snapshot_dir)
            except Exception:  # first batch: no snapshot yet
                snapshot_meta = None
            merged = merge_versioned(snapshot_meta, typed, pk_cols)
            merged.write.mode("overwrite").parquet(snapshot_dir + "_next")
            # swap via rewrite of the read path (Delta/Iceberg would commit
            # a new table version instead)
            spark.read.parquet(snapshot_dir + "_next").write.mode("overwrite").parquet(snapshot_dir)

        return (
            envelopes.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_dir or self.config.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def start_merge_partitioned(
        self, snapshot_dir: str, pk_cols: list[str],
        value_schema: T.StructType, partition_col: str,
        checkpoint_dir: str | None = None,
    ) -> StreamingQuery:
        """Streaming partition-scoped materialization: each micro-batch
        applies through merge_into_partitioned, so only the hive
        directories whose partition value appears in the batch are read
        and rewritten (dynamic partition overwrite) — the per-batch IO is
        proportional to the partitions touched, not the snapshot.

        This is the production shape for a date-/tenant-partitioned CDC
        sink at 100 TB. The stored snapshot carries __seq/__deleted meta
        (merge_versioned_partitioned), so it stays correct when one key's
        changes split across micro-batches in arbitrary order — a file
        source with round-robin payload files delivers exactly that — and
        tombstones stop late INSERTs from resurrecting deletes. Read live
        rows via merge.snapshot_view.
        """
        import os

        from ru_cdc_spark.operators.merge import (
            merge_versioned,
            merge_versioned_partitioned,
        )
        from ru_cdc_spark.sources.layout import write_hive_partitioned

        spark = self.spark
        envelopes = self.routed(self.read_stream()) \
            .select("envelope.*").dropDuplicates(["id"])

        def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
            if batch_df.isEmpty():
                return
            data_map = F.element_at(F.col("data"), 1)
            typed = batch_df.select(
                "id", "type",
                F.struct(*[
                    data_map.getItem(f.name).cast(f.dataType).alias(f.name)
                    for f in value_schema.fields
                ]).alias("after"),
            ).withColumn("before", F.col("after"))
            if not os.path.isdir(snapshot_dir):
                write_hive_partitioned(
                    merge_versioned(None, typed, pk_cols), snapshot_dir,
                    [partition_col])
            else:
                merge_versioned_partitioned(
                    spark, snapshot_dir, typed, pk_cols, partition_col)

        return (
            envelopes.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation",
                    checkpoint_dir or self.config.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )


def start_merge_to_store(pipeline: CdcPipeline, store,
                         pk_cols: list[str], value_schema: T.StructType,
                         checkpoint_dir: str | None = None) -> StreamingQuery:
    """Streaming materialization into the VERSIONED snapshot store
    (operators/versioned_store.SnapshotStore): each micro-batch merges into
    the latest committed version and commits the next one, recording the
    batch's max sequence. Because commit() is idempotent per sequence,
    checkpoint replay after a crash between merge and commit cannot
    double-apply — exactly-once end to end, with time travel over every
    committed version for free.

    The stored frame is the VERSIONED meta form (payload + __seq +
    __deleted tombstones, operators/merge.merge_versioned): micro-batch
    boundaries cut the stream at arbitrary points, so a key's DELETE can
    arrive a batch before its INSERT — ordered-merge (SCD1 upsert) would
    resurrect the row; tombstones make the result order-independent.
    Read the live rows through ``merge.snapshot_view``.

    The committed sequence watermark is the MONOTONE running max of batch
    sequences (a later batch can carry earlier ids when arrival order
    disagrees with sequence order, and a commit watermark must never move
    backwards). ``read_as_of_seq`` is sequence-precise only for
    sequence-aligned sources (the single-reader binlog in production);
    for shuffled arrivals it resolves to arrival-time versions.
    """
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators.merge import merge_versioned

    envelopes = pipeline.routed(pipeline.read_stream()) \
        .select("envelope.*").dropDuplicates(["id"])

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        data_map = F.element_at(F.col("data"), 1)
        typed = batch_df.select(
            "id", "type",
            F.struct(*[
                data_map.getItem(f.name).cast(f.dataType).alias(f.name)
                for f in value_schema.fields
            ]).alias("after"),
        ).withColumn("before", F.col("after"))
        batch_max = typed.agg(F.max("id")).collect()[0][0]
        if batch_max is None:
            return
        log = store._log()
        prev_through = log[-1]["through_seq"] if log else 0
        through = max(int(batch_max), prev_through + 1)  # monotone watermark
        prev = None if store.latest_version() is None else store.read()
        store.commit(merge_versioned(prev, typed, pk_cols), through)

    return (
        envelopes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation",
                checkpoint_dir or pipeline.config.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_merge_to_acid_table(pipeline: CdcPipeline, table,
                              value_schema: T.StructType,
                              checkpoint_dir: str | None = None,
                              app_id: str = "cdc") -> StreamingQuery:
    """Streaming materialization through the LOG-STRUCTURED ACID table
    (operators/acid_table.AcidTable) — the literal north-star shape,
    ``readStream -> foreachBatch(MERGE INTO)``, with table-format
    mechanics instead of full-snapshot rewrites: each micro-batch
    copy-on-write-merges into the table, rewriting only the files its
    keys hit.

    Exactly-once: every batch commits with a ``txn`` stamp
    (``app_id:epoch`` — the Delta idempotent-writes pattern); a crash
    between the table commit and the stream checkpoint replays the
    batch, the stamp is recognized, and the replay is a no-op. The
    table must already hold version 0 (``create``), matching MERGE's
    requirement of an existing target.
    """
    from pyspark.sql import functions as F

    envelopes = pipeline.routed(pipeline.read_stream()) \
        .select("envelope.*").dropDuplicates(["id"])

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        data_map = F.element_at(F.col("data"), 1)
        typed = batch_df.select(
            F.col("id").alias(table.seq_col), "type",
            *[data_map.getItem(f.name).cast(f.dataType).alias(f.name)
              for f in value_schema.fields],
        )
        # versioned form: micro-batch boundaries cut the stream at
        # arbitrary points, so cross-batch arrival order can disagree
        # with sequence order — the seq-guarded tombstone merge keeps
        # the result order-independent (same rationale as
        # start_merge_to_store's meta form)
        table.merge_versioned(typed, txn=f"{app_id}:{epoch_id}")

    return (
        envelopes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation",
                checkpoint_dir or pipeline.config.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_merge_evolving(pipeline: CdcPipeline, snapshot_dir: str,
                         catalog, checkpoint_dir: str | None = None) -> StreamingQuery:
    """Schema-evolution-aware streaming merge (fills the reference's D11
    gap end-to-end): each batch folds the envelopes' ``mysqlType`` maps
    into the TableCatalog (widening only), rebuilds the value schema, and
    merges — pre-evolution snapshot rows surface NULL for new columns.

    Multi-table streams merge each table into its own snapshot directory
    (``snapshot_dir/db.table``); a single-table stream writes directly to
    ``snapshot_dir``. Sequence ids are per-table (what merge ordering
    needs — the reference's global reader seq also orders within table).

    Scale: the per-batch catalog fold collects one row per distinct
    (table, schema-version), and the merge loop runs once per TABLE in
    the batch — bounded by table count, never data size.
    """
    from ru_cdc_spark.catalog import FieldMeta
    from ru_cdc_spark.operators.merge import merge_versioned

    spark = pipeline.spark
    envelopes = pipeline.routed(pipeline.read_stream()) \
        .select("envelope.*").dropDuplicates(["id", "database", "table"])

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        try:
            metas = (batch_df.select(
                        "database", "table", "pkNames", "mysqlType",
                        F.to_json("mysqlType").alias("__mt"))  # maps can't dedupe
                     .dropDuplicates(["database", "table", "__mt"]).collect())
            for r in metas:
                pks = set(r["pkNames"] or [])
                fields = [FieldMeta(name, t, name in pks)
                          for name, t in r["mysqlType"].items()]
                catalog.evolve(r["database"], r["table"], fields)

            # one merge per table present in the batch (multi-table streams:
            # the loop is over the bounded table list, never over rows)
            tables = sorted({(r["database"], r["table"]) for r in metas})
            for db, tb in tables:
                schema_obj = catalog.lookup(db, tb)
                value_schema = schema_obj.struct_type()
                pk_cols = schema_obj.pk_names
                table_dir = (snapshot_dir if len(tables) == 1
                             else f"{snapshot_dir}/{db}.{tb}")

                data_map = F.element_at(F.col("data"), 1)
                typed = batch_df.where(
                    (F.col("database") == db) & (F.col("table") == tb)
                ).select(
                    "id", "type",
                    F.struct(*[
                        data_map.getItem(f.name).cast(f.dataType).alias(f.name)
                        for f in value_schema.fields
                    ]).alias("after"),
                ).withColumn("before", F.col("after"))
                try:
                    snapshot_meta = spark.read.option("mergeSchema", "true").parquet(table_dir)
                except Exception:
                    snapshot_meta = None
                merged = merge_versioned(snapshot_meta, typed, pk_cols)
                merged.write.mode("overwrite").parquet(table_dir + "_next")
                spark.read.parquet(table_dir + "_next").write.mode("overwrite").parquet(table_dir)
        finally:
            batch_df.unpersist()

    return (
        envelopes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation",
                checkpoint_dir or pipeline.config.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events_stream: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling window with watermark (the late-data handling the
    reference lacks — SURVEY.md §2.10): counts + value sums per
    (window, event_type); append-mode emits only finalized windows."""
    return (
        events_stream
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(38,2)").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )
