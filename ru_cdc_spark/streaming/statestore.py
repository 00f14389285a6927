"""Offline state-store inspection: audit streaming state without replay.

The reference's only visibility into its resume state is the checkpoint
JSON it writes (`~/.ru_cdc/meta.json`, position_manager.rs:10-15) — the
*contents* of in-flight operator state are opaque. Spark 4 exposes every
stateful operator's checkpointed state as a batch DataFrame (the
`statestore` / `state-metadata` readers), which turns three production
jobs into plain queries:

* **audit** — diff live state against a batch recomputation (the test
  gate here does exactly that);
* **debug** — inspect the keys/values of a stuck or skewed operator
  (e.g. find the hot key pinning a watermark);
* **capacity** — count keys and bytes per partition to size state stores
  before a scale-up.

Scale: the readers scan the checkpoint's state files directly (no
streaming query, no replay of the source); the result is an ordinary
DataFrame — partition-pruned by `batchId`/`operatorId` options and
aggregated with the usual distributed operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def state_operators(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """The checkpoint's stateful-operator inventory: operator id/name,
    state store name, partition count, and the batch-id range held."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def read_state(spark: SparkSession, checkpoint_dir: str,
               batch_id: int | None = None,
               operator_id: int = 0) -> DataFrame:
    """One stateful operator's checkpointed state as (key, value,
    partition_id) rows — by default the latest committed batch."""
    reader = spark.read.format("statestore") \
        .option("operatorId", str(operator_id))
    if batch_id is not None:
        reader = reader.option("batchId", str(batch_id))
    return reader.load(checkpoint_dir)
