"""CDC materialization: apply a change stream to produce the table snapshot.

The reference only *delivers* changes (Kafka/Redis sinks,
/root/reference/src/message_queue.rs); applying them is left to consumers.
The driver's north star adds materialization ("Structured Streaming + Delta
merge"). The v1 image has no Delta jars, so we implement MERGE semantics
with pure DataFrame ops (the documented emulation: window-dedup latest-wins,
then drop deletes). With Delta on the classpath the same change stream
feeds ``MERGE INTO`` via ``foreachBatch`` — see streaming/pipeline.py.

Scale design: one shuffle on the primary key (unavoidable for a key-wise
merge), then a codegen'd window; AQE handles skewed keys. At 100 TB the
shuffle partitions count must be sized so each partition's state fits in
executor memory; with Delta, partition pruning on the merge condition
limits rewrite scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(changes: DataFrame, pk_cols: list[str],
                   seq_col: str = "id") -> DataFrame:
    """Keep only the last change per primary key (highest sequence).

    The reference guarantees per-stream ordering by the reader thread's
    ``seq_idx`` (src/main.rs:107,122) but then *breaks* per-table order via
    round-robin dispatch (X2 hazard, src/executor.rs:455-464). Here order
    is restored deterministically from the sequence column — correct under
    any partitioning.
    """
    key_cols = [
        F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).alias(f"__pk_{c}")
        for c in pk_cols
    ]
    with_keys = changes.select("*", *key_cols)
    w = Window.partitionBy(*[f"__pk_{c}" for c in pk_cols]).orderBy(F.col(seq_col).desc())
    return (
        with_keys.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", *[f"__pk_{c}" for c in pk_cols])
    )


def apply_changes(changes: DataFrame, pk_cols: list[str],
                  seq_col: str = "id", type_col: str = "type") -> DataFrame:
    """MERGE-emulation: latest-wins per PK, deletes drop the row, output is
    the final after-image (one row per surviving key)."""
    last = latest_changes(changes, pk_cols, seq_col)
    return (
        last.where(F.col(type_col) != "DELETE")
        .select("after.*")
    )


def merge_upsert(snapshot: DataFrame, changes: DataFrame, pk_cols: list[str],
                 seq_col: str = "id", type_col: str = "type") -> DataFrame:
    """Incremental MERGE of a change batch into an existing snapshot
    (anti-join + union — the Delta-less SCD1 emulation).

    snapshot: current table rows (after-image schema).
    changes:  new change batch (id/type/before/after).
    """
    last = latest_changes(changes, pk_cols, seq_col)
    upserts = last.where(F.col(type_col) != "DELETE").select("after.*")
    touched = last.select(*[F.col(f"before.{c}") if False else F.coalesce(
        F.col(f"after.{c}"), F.col(f"before.{c}")).alias(c) for c in pk_cols])
    untouched = snapshot.join(touched, on=pk_cols, how="left_anti")
    return untouched.unionByName(upserts)
