"""Sink mux: deliver routed change rows to every configured sink (K1-K4).

The reference runs one OS thread per MQ fed by channels
(/root/reference/src/message_queue.rs:21-83) with Kafka and Redis
producers. Here:

* one streaming query can serve ALL Kafka topics on one cluster (the sink
  routes per-row by the ``topic`` column) — K1's mux collapses into the
  sink itself;
* heterogeneous sinks (multiple clusters, redis, files) fan out inside a
  single ``foreachBatch``: the batch is written once per matching sink,
  filtered by the ``mq`` column. Exactly-once per sink follows from the
  checkpointed batch id + idempotent writes (vs the reference's
  at-least-once, K4).

Spark's built-in kafka sink format isn't in the test image (its writer
is constructed and config-checked but doesn't execute locally) — but
the ``kafka_wire`` sink kind DOES execute for real (round 4):
sources/kafka_wire.py speaks the public Kafka protocol directly
(Produce v3, magic-2 record batches, CRC32C), verified against the
in-repo broker fixture, which validates CRCs and serves the records
back over Fetch v4. The redis sink likewise executes for real
(round 3, sources/resp.py RESP wire client vs the in-repo RESP
server).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ru_cdc_spark.config import SinkConfig


def kafka_writer_options(sink: SinkConfig) -> dict[str, str]:
    """writeStream options for a Kafka sink (per-row topic column routing).

    Mirrors the reference's producer knobs: ``queue_buffering_max`` ->
    ``kafka.linger.ms`` (config.rs:125, message_queue.rs:104), send timeout
    -> ``kafka.delivery.timeout.ms`` (message_queue.rs:103)."""
    opts = {"kafka.delivery.timeout.ms": "5000"}
    opts.update(sink.options)
    if "kafka.bootstrap.servers" not in opts:
        raise ValueError(f"kafka sink {sink.name!r} needs kafka.bootstrap.servers")
    return opts


def write_batch_to_sink(batch: DataFrame, sink: SinkConfig, epoch_id: int) -> None:
    """Write one micro-batch's rows for one sink (already filtered to
    ``mq == sink.name``)."""
    if sink.kind == "kafka":
        if "__seq" in batch.columns:  # per-key change order (see below)
            batch = ordered_for_kafka(batch)
        (batch.selectExpr("topic", "CAST(key AS BINARY) AS key",
                          "CAST(value AS BINARY) AS value")
         .write.format("kafka").options(**kafka_writer_options(sink)).save())
    elif sink.kind == "redis":
        # real RESP wire client (sources/resp.py — round 3 closed the
        # stub): RPUSH topic payload per row, the reference's exact call
        # (message_queue.rs:155-166). One connection per PARTITION with
        # pipelined commands — executor-side sockets, driver relays
        # nothing; per-key order is preserved by the same __seq
        # discipline as Kafka (X2 ordering fix).
        host = sink.options.get("host", "127.0.0.1")
        port = int(sink.options["port"])
        if "__seq" in batch.columns:
            batch = ordered_for_kafka(batch)

        def push_partition(rows) -> None:
            from ru_cdc_spark.sources.resp import RespClient

            cmds = [("RPUSH", row["topic"], row["value"]) for row in rows]
            if not cmds:
                return
            with RespClient.connect(host, port) as rc:
                rc.pipeline(cmds)

        batch.select("topic", "value").foreachPartition(push_partition)
    elif sink.kind == "kafka_wire":
        # real Kafka wire producer (sources/kafka_wire.py — round 4):
        # magic-2 record batches with CRC32C, one Produce request per
        # executor partition per topic (records BATCHED, not per-row
        # round-trips), against any broker speaking Produce v3. Per-key
        # order via the same __seq repartition+sort discipline; the
        # fixture broker verifies every batch CRC like a live one.
        host = sink.options.get("host", "127.0.0.1")
        port = int(sink.options["port"])
        compression = sink.options.get("compression", "none")
        idempotent = sink.options.get("idempotent", "") == "true"
        if "__seq" in batch.columns:
            batch = ordered_for_kafka(batch)

        def produce_partition(rows) -> None:
            from ru_cdc_spark.sources.kafka_wire import (
                IdempotentProducer,
                KafkaWireClient,
            )

            by_topic: dict[str, list] = {}
            for row in rows:
                key = row["key"]
                key_b = (key.encode() if isinstance(key, str)
                         else key) if key is not None else None
                val = row["value"]
                val_b = val.encode() if isinstance(val, str) else val
                by_topic.setdefault(row["topic"], []).append(
                    (key_b, val_b))
            if not by_topic:
                return
            # idempotent mode (KIP-98): each partition task holds its
            # own producer session (own PID) whose send() retries
            # re-use the original sequence — a task-level retry after
            # a lost ack can never duplicate records in the log
            ctx = (IdempotentProducer(host, port) if idempotent
                   else KafkaWireClient.connect(host, port))
            with ctx as kc:
                for topic, records in by_topic.items():
                    # bounded batches (like linger/batch.size producers):
                    # one giant batch per partition stalls the broker's
                    # CRC verify and risks request-size ceilings
                    for i in range(0, len(records), 2000):
                        chunk = records[i:i + 2000]
                        if idempotent:
                            kc.send(topic, 0, chunk,
                                    compression=compression)
                        else:
                            kc.produce(topic, 0, chunk,
                                       compression=compression)

        batch.select("topic", "key", "value") \
            .foreachPartition(produce_partition)
    elif sink.kind == "parquet":
        batch.write.mode("append").parquet(sink.options["path"])
    elif sink.kind == "json":
        batch.write.mode("append").json(sink.options["path"])
    else:
        raise ValueError(f"unknown sink kind {sink.kind!r}")


def make_mux(sinks: list[SinkConfig]):
    """foreachBatch function fanning each batch out to every configured
    sink by the ``mq`` routing column (K1's name->channel registry,
    message_queue.rs:21-72, as a data-parallel filter per sink)."""

    def mux(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        # one pass per sink; persist so the batch isn't recomputed per sink
        batch.persist()
        try:
            for sink in sinks:
                write_batch_to_sink(batch.where(batch.mq == sink.name), sink, epoch_id)
        finally:
            batch.unpersist()

    return mux


def ordered_for_kafka(batch: DataFrame, key_col: str = "key",
                      seq_col: str = "__seq", drop_seq: bool = True) -> DataFrame:
    """Enforce per-key change order through the Kafka producer.

    Kafka guarantees order only per (producer, topic-partition); Spark's
    kafka sink emits each task's rows in iteration order. Repartitioning
    on the message key puts ALL changes of one PK in one task, and the
    within-partition sort by (key, seq) makes the producer see them in
    change order — so a log-compacted topic converges to the latest state
    and consumers replay per-key history in order (the reference's X2
    ordering hazard, fixed structurally).

    Scale: one hash shuffle of the outgoing batch (small: only the
    current micro-batch), sort is per-partition spillable.
    """
    from pyspark.sql import functions as F

    ordered = (batch.repartition(F.col(key_col))
               .sortWithinPartitions(key_col, seq_col))
    return ordered.drop(seq_col) if drop_seq else ordered
