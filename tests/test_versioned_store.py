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
