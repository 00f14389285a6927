"""Versioned snapshot store: commit-log atomicity, time travel, idempotent
re-apply, vacuum retention — the table-format contract the CDC
materializer needs (operators/versioned_store.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ru_cdc_spark.operators.merge import apply_changes
from ru_cdc_spark.operators.versioned_store import (
    SnapshotStore,
    apply_change_batches,
)
from ru_cdc_spark.sources.cdc_fixture import ORDERS_PK, derive_order_changes


def _batches(spark, sf_dir, n=3):
    ch = derive_order_changes(spark, sf_dir)
    hi = ch.agg(F.max("id")).collect()[0][0]
    cut = hi // n + 1
    return ch, [ch.where((F.col("id") >= k * cut) & (F.col("id") < (k + 1) * cut))
                for k in range(n)]


def test_versions_accumulate_and_match_replay(spark, sf_dir, tmp_path):
    ch, batches = _batches(spark, sf_dir)
    store = SnapshotStore(spark, str(tmp_path / "store"))
    versions = apply_change_batches(spark, store, batches, ORDERS_PK)
    assert versions == [1, 2, 3]

    # each stored version equals a from-scratch replay of the prefix
    for e in store._log():
        replay = apply_changes(ch.where(F.col("id") <= e["through_seq"]), ORDERS_PK)
        stored = store.read(e["version"])
        assert stored.count() == replay.count(), e
        diff = stored.exceptAll(replay).count() + replay.exceptAll(stored).count()
        assert diff == 0, f"version {e['version']} diverges from replay"


def test_as_of_seq_resolves_to_covering_version(spark, sf_dir, tmp_path):
    _, batches = _batches(spark, sf_dir)
    store = SnapshotStore(spark, str(tmp_path / "store"))
    apply_change_batches(spark, store, batches, ORDERS_PK)
    log = store._log()
    mid = log[1]["through_seq"]
    assert store.read_as_of_seq(mid).count() == store.read(2).count()
    assert store.read_as_of_seq(mid + 1).count() == store.read(2).count()
    with pytest.raises(KeyError):
        store.read_as_of_seq(-1)


def test_table_changes_reconstructs_each_commit(spark, sf_dir, tmp_path):
    """CDF contract: applying version v-1 + table_changes(v-1, v) must
    reproduce version v exactly, for every committed version."""
    from ru_cdc_spark.operators.versioned_store import table_changes

    _, batches = _batches(spark, sf_dir)
    store = SnapshotStore(spark, str(tmp_path / "store"))
    apply_change_batches(spark, store, batches, ORDERS_PK)

    cdf = table_changes(store, ORDERS_PK, 1, 3).cache()
    assert set(r["_change_type"] for r in
               cdf.select("_change_type").distinct().collect()) <= {
        "insert", "delete", "update_preimage", "update_postimage"}
    for v in (2, 3):
        step = cdf.where(F.col("_commit_version") == v)
        prev = store.read(v - 1)
        # apply: delete pre-images and deleted keys, add post/insert rows
        gone = step.where(F.col("_change_type").isin(
            "delete", "update_preimage")).drop("_change_type",
                                               "_commit_version")
        added = step.where(F.col("_change_type").isin(
            "insert", "update_postimage")).drop("_change_type",
                                                "_commit_version")
        rebuilt = prev.exceptAll(gone.select(*prev.columns)) \
            .unionByName(added.select(*prev.columns))
        cur = store.read(v)
        diff = rebuilt.exceptAll(cur).count() + cur.exceptAll(rebuilt).count()
        assert diff == 0, f"CDF of version {v} does not reconstruct it"


def test_snapshot_diff_emits_update_pairs(spark):
    from ru_cdc_spark.operators.versioned_store import snapshot_diff

    pre = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long")
    post = spark.createDataFrame(
        [(2, "b", 20), (3, "c2", 30), (4, "d", 40)], "k long, s string, v long")
    rows = {(r["k"], r["_change_type"], r["s"], r["v"])
            for r in snapshot_diff(pre, post, ["k"]).collect()}
    assert rows == {
        (1, "delete", "a", 10),
        (3, "update_preimage", "c", 30),
        (3, "update_postimage", "c2", 30),
        (4, "insert", "d", 40),
    }


def test_recommit_same_seq_is_idempotent(spark, sf_dir, tmp_path):
    _, batches = _batches(spark, sf_dir)
    store = SnapshotStore(spark, str(tmp_path / "store"))
    snap = apply_changes(batches[0], ORDERS_PK)
    through = batches[0].agg(F.max("id")).collect()[0][0]
    v1 = store.commit(snap, int(through))
    v_again = store.commit(snap, int(through))  # checkpoint replay
    assert (v1, v_again) == (1, 1)
    assert store.latest_version() == 1


def test_vacuum_drops_old_data_keeps_log(spark, sf_dir, tmp_path):
    import os

    _, batches = _batches(spark, sf_dir)
    store = SnapshotStore(spark, str(tmp_path / "store"))
    apply_change_batches(spark, store, batches, ORDERS_PK)
    dropped = store.vacuum(keep_last=1)
    assert dropped == [1, 2]
    assert store.read().count() > 0          # latest still readable
    with pytest.raises(Exception):
        store.read(1).count()                 # data gone
    assert len(store._log()) == 3             # history metadata survives
    assert not os.path.exists(store._log()[0]["path"])


def test_streaming_merge_into_store_with_restart(spark, sf_dir, tmp_path):
    """The streaming materializer commits one store version per micro-batch;
    a second run from the same checkpoint (simulated restart after all data
    was processed) adds no versions and no duplicate state."""
    from pyspark.sql import types as T

    from ru_cdc_spark.config import InstanceConfig, PipelineConfig
    from ru_cdc_spark.operators.envelope import build_envelope, envelope_to_json
    from ru_cdc_spark.sources.cdc_fixture import (
        ORDERS_DATABASE,
        ORDERS_MYSQL_TYPES,
        ORDERS_PK,
        ORDERS_TABLE,
        derive_order_changes,
    )
    from ru_cdc_spark.streaming.pipeline import CdcPipeline, start_merge_to_store

    src = str(tmp_path / "src")
    env = build_envelope(
        derive_order_changes(spark, sf_dir),
        ORDERS_DATABASE, ORDERS_TABLE, ORDERS_PK, ORDERS_MYSQL_TYPES,
        processing_ts=__import__("pyspark.sql.functions", fromlist=["lit"]).lit(0))
    envelope_to_json(env).select("payload").repartition(3) \
        .write.mode("overwrite").text(src)

    cfg = PipelineConfig(
        source_path=src, checkpoint_dir=str(tmp_path / "ck"),
        max_events_per_trigger=20_000,  # several micro-batches
        instances=[InstanceConfig(mq="m", schemas="test*", tables="*",
                                  topic="t")],
    )
    value_schema = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.StringType()),
    ])
    store = SnapshotStore(spark, str(tmp_path / "store"))
    pipe = CdcPipeline(spark, cfg)
    q = start_merge_to_store(pipe, store, ["o_orderkey"], value_schema)
    q.awaitTermination(300)
    v_after_first = store.latest_version()
    assert v_after_first and v_after_first >= 1

    # restart from the same checkpoint: nothing new -> no new versions
    q2 = start_merge_to_store(pipe, store, ["o_orderkey"], value_schema)
    q2.awaitTermination(300)
    assert store.latest_version() == v_after_first

    # final LIVE state equals the batch latest-wins snapshot (tombstones
    # make it correct even though batch boundaries reorder keys' changes)
    from ru_cdc_spark.operators.merge import snapshot_view

    expected = apply_changes(derive_order_changes(spark, sf_dir), ORDERS_PK)
    got = snapshot_view(store.read())
    assert got.count() == expected.count()
    assert (got.select("o_orderkey").exceptAll(
        expected.select("o_orderkey")).count() == 0)
