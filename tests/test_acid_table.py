"""AcidTable: file-level transaction log, copy-on-write MERGE, stats
skipping, optimistic concurrency, time travel, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ru_cdc_spark.operators.acid_table import AcidTable, CommitConflict


def _base(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
        F.concat(F.lit("r"), F.col("id")).alias("tag"))


def _changes(spark, rows):
    # rows: (k, v, tag, type, seq)
    return spark.createDataFrame(
        rows, "k long, v long, tag string, type string, seq long")


class TestCreateAndSnapshot:
    def test_create_then_read(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark).repartition(4))
        assert t.latest_version() == 0
        assert t.snapshot().count() == 1000

    def test_unreferenced_files_invisible(self, spark, tmp_path):
        """A torn write (data files without a log entry) must not change
        any snapshot."""
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark).repartition(2))
        # simulate a crashed writer: files land, commit never happens
        orphan_dir = os.path.join(str(tmp_path / "t"), "data", "orphan")
        _base(spark, 50).write.parquet(orphan_dir)
        assert t.snapshot().count() == 1000

    def test_snapshot_empty_raises(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        with pytest.raises(ValueError, match="empty table"):
            t.snapshot()


class TestMerge:
    def test_upsert_and_delete(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark).repartition(4))
        v = t.merge(_changes(spark, [
            (5, 999, "upd5", "UPDATE", 1),
            (2000, 1, "new", "INSERT", 2),
            (7, 0, "x", "DELETE", 3),
        ]))
        assert v == 1
        snap = {r["k"]: r for r in t.snapshot().collect()}
        assert snap[5]["v"] == 999 and snap[5]["tag"] == "upd5"
        assert snap[2000]["tag"] == "new"
        assert 7 not in snap
        assert len(snap) == 1000  # +1 insert -1 delete

    def test_latest_wins_within_batch(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark).repartition(2))
        t.merge(_changes(spark, [
            (3, 111, "first", "UPDATE", 10),
            (3, 222, "second", "UPDATE", 20),
            (4, 0, "x", "DELETE", 5),
            (4, 444, "resurrected", "INSERT", 6),
        ]))
        snap = {r["k"]: r for r in t.snapshot().collect()}
        assert snap[3]["v"] == 222
        assert snap[4]["tag"] == "resurrected"

    def test_copy_on_write_skips_unhit_files(self, spark, tmp_path):
        """Only files whose pk range covers a changed key are rewritten;
        the rest carry over by file reference."""
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        # range-partitioned layout -> disjoint pk ranges per file
        t.create(_base(spark).repartitionByRange(8, "k"))
        before = {f["path"] for f in t.active_files()}
        t.merge(_changes(spark, [(1, 5, "u", "UPDATE", 1)]))
        after = {f["path"] for f in t.active_files()}
        carried = before & after
        assert carried, "every file was rewritten — no copy-on-write"
        # only the file(s) whose range covers k=1 changed
        assert len(before - after) <= 2
        assert t.snapshot().count() == 1000

    def test_merge_result_matches_full_recompute(self, spark, tmp_path):
        import random

        rnd = random.Random(7)
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark).repartitionByRange(4, "k"))
        rows = []
        seq = 0
        for _ in range(60):
            k = rnd.randrange(1200)
            op = rnd.choice(["UPDATE", "DELETE", "INSERT"])
            seq += 1
            rows.append((k, rnd.randrange(1000), f"s{seq}", op, seq))
        t.merge(_changes(spark, rows))
        got = {(r["k"], r["v"], r["tag"])
               for r in t.snapshot().collect()}
        # reference computation in python
        state = {r["k"]: (r["k"], r["v"], r["tag"])
                 for r in _base(spark).collect()}
        last = {}
        for k, v, tag, op, seq in rows:
            if k not in last or seq > last[k][4]:
                last[k] = (k, v, tag, op, seq)
        for k, v, tag, op, seq in last.values():
            if op == "DELETE":
                state.pop(k, None)
            else:
                state[k] = (k, v, tag)
        assert got == set(state.values())


class TestConcurrency:
    def test_put_if_absent_conflict(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 100))
        t2 = AcidTable(spark, str(tmp_path / "t"), pk="k")  # second writer
        t.merge(_changes(spark, [(1, 1, "a", "UPDATE", 1)]))
        # t2 still believes base is version 0 -> claims version 1 -> loses
        with pytest.raises(CommitConflict):
            t2._try_commit(1, [], op="MERGE")
        # after rebase (re-reading the log) t2 commits fine
        assert t2.merge(_changes(spark, [(2, 2, "b", "UPDATE", 2)])) == 2


class TestTimeTravelAndVacuum:
    def test_time_travel(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 100).repartition(2))
        t.merge(_changes(spark, [(1, 999, "u", "UPDATE", 1)]))
        t.merge(_changes(spark, [(1, 0, "x", "DELETE", 2)]))
        v0 = {r["k"]: r["v"] for r in t.snapshot(version=0).collect()}
        v1 = {r["k"]: r["v"] for r in t.snapshot(version=1).collect()}
        v2 = {r["k"]: r["v"] for r in t.snapshot(version=2).collect()}
        assert v0[1] == 1 % 97
        assert v1[1] == 999
        assert 1 not in v2
        ops = [h["op"] for h in t.history()]
        assert ops == ["CREATE", "MERGE", "MERGE"]

    def test_pk_range_snapshot_prunes_files(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark).repartitionByRange(8, "k"))
        pruned = t.snapshot(where_pk_between=(10, 20))
        # the pruned scan reads a strict subset of the table's files
        all_files = {f["path"] for f in t.active_files()}
        read_files = {p.removeprefix("file://")
                      for p in pruned.inputFiles()}
        assert read_files < all_files
        assert sorted(r["k"] for r in pruned.collect()) == \
            list(range(10, 21))

    def test_vacuum_keeps_live_versions(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 200).repartitionByRange(4, "k"))
        t.merge(_changes(spark, [(1, 9, "u", "UPDATE", 1)]))
        deleted = t.vacuum(keep_last=1)
        # the rewritten file from v0 is gone; latest still reads fine
        assert deleted
        assert t.snapshot().count() == 200
        with pytest.raises(Exception):
            t.snapshot(version=0).count()


class TestVersionedMerge:
    def test_out_of_order_batches_converge(self, spark, tmp_path):
        """DELETE arrives in an EARLIER batch than the stale INSERT it
        must dominate: the seq-guarded tombstone merge keeps the row
        dead (plain replace-merge would resurrect it)."""
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        empty = _changes(spark, []).withColumn(
            "__deleted", F.lit(True)).drop("type").where("1=0") \
            .select("k", "v", "tag", "seq", "__deleted")
        t.create(empty)
        # batch 1: the DELETE (seq 30)
        t.merge_versioned(_changes(spark, [(1, 0, "x", "DELETE", 30)]),
                          txn="app:1")
        # batch 2: the stale INSERT (seq 10) arriving late
        t.merge_versioned(_changes(spark, [(1, 7, "old", "INSERT", 10)]),
                          txn="app:2")
        assert t.snapshot_live().where("k = 1").count() == 0

    def test_txn_replay_is_noop(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        base = _base(spark, 100).withColumn("seq", F.lit(0)) \
            .withColumn("__deleted", F.lit(False))
        t.create(base.repartition(2))
        v1 = t.merge_versioned(
            _changes(spark, [(1, 9, "u", "UPDATE", 5)]), txn="app:7")
        v_replay = t.merge_versioned(
            _changes(spark, [(1, 9, "u", "UPDATE", 5)]), txn="app:7")
        assert v1 == v_replay == t.latest_version()

    def test_streaming_pipeline_into_acid_table(self, spark, sf_dir,
                                                tmp_path):
        """readStream -> foreachBatch(copy-on-write MERGE) across a
        restart: the live snapshot equals the batch latest-wins oracle
        and the replayed epoch commits nothing twice."""
        from pyspark.sql import types as T
        from ru_cdc_spark.config import InstanceConfig, PipelineConfig
        from ru_cdc_spark.operators.envelope import (
            build_envelope,
            envelope_to_json,
        )
        from ru_cdc_spark.operators.merge import apply_changes
        from ru_cdc_spark.sources.cdc_fixture import (
            ORDERS_DATABASE,
            ORDERS_MYSQL_TYPES,
            ORDERS_PK,
            ORDERS_TABLE,
            derive_order_changes,
        )
        from ru_cdc_spark.streaming.pipeline import (
            CdcPipeline,
            start_merge_to_acid_table,
        )

        src = str(tmp_path / "src")
        env = build_envelope(
            derive_order_changes(spark, sf_dir),
            ORDERS_DATABASE, ORDERS_TABLE, ORDERS_PK, ORDERS_MYSQL_TYPES,
            processing_ts=F.lit(0))
        envelope_to_json(env).select("payload").repartition(3) \
            .write.mode("overwrite").text(src)

        cfg = PipelineConfig(
            source_path=src, checkpoint_dir=str(tmp_path / "ck"),
            max_events_per_trigger=20_000,
            instances=[InstanceConfig(mq="m", schemas="test*",
                                      tables="*", topic="t")])
        value_schema = T.StructType([
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.StringType()),
        ])
        t = AcidTable(spark, str(tmp_path / "acid"), pk="o_orderkey",
                      seq_col="id")
        empty = spark.createDataFrame(
            [], "id long, o_orderkey long, o_orderstatus string, "
                "o_totalprice string, __deleted boolean")
        t.create(empty)
        pipe = CdcPipeline(spark, cfg)
        q = start_merge_to_acid_table(pipe, t, value_schema)
        q.awaitTermination(300)
        v_first = t.latest_version()
        assert v_first and v_first >= 1

        # restart on the same checkpoint: no new data -> no new versions
        q2 = start_merge_to_acid_table(pipe, t, value_schema)
        q2.awaitTermination(300)
        assert t.latest_version() == v_first

        expected = apply_changes(derive_order_changes(spark, sf_dir),
                                 ORDERS_PK)
        got = t.snapshot_live()
        assert got.count() == expected.count()
        assert (got.select("o_orderkey").exceptAll(
            expected.select("o_orderkey")).count() == 0)


class TestCompact:
    def test_bin_packs_small_files(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 2000).repartition(16))  # 16 tiny files
        n_before = len(t.active_files())
        v = t.compact(small_file_rows=10_000, target_partitions=2)
        assert v == 1
        files = t.active_files()
        assert len(files) < n_before
        assert t.snapshot().count() == 2000
        # history preserved: v0 still time-travels
        assert t.snapshot(version=0).count() == 2000

    def test_drops_tombstones_below_watermark(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        base = _base(spark, 100).withColumn("seq", F.lit(0)) \
            .withColumn("__deleted", F.lit(False))
        t.create(base.repartition(2))
        t.merge_versioned(_changes(spark, [
            (1, 0, "x", "DELETE", 10),
            (2, 0, "x", "DELETE", 99),
        ]))
        t.compact(tombstone_watermark=50, target_partitions=1)
        snap = t.snapshot()
        # seq-10 tombstone physically gone; seq-99 retained (still needed
        # to dominate potential late arrivals)
        dead = {r["k"] for r in snap.where("__deleted").collect()}
        assert dead == {2}
        assert t.snapshot_live().count() == 98

    def test_noop_when_nothing_to_do(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 100).repartition(1))
        assert t.compact(small_file_rows=10) is None


class TestLogCheckpoint:
    def test_checkpoint_written_and_replay_equivalent(self, spark,
                                                      tmp_path):
        """After CHECKPOINT_INTERVAL commits a log checkpoint snapshots
        the live file set; replay through it equals full replay and
        every snapshot stays correct."""
        import glob

        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 500).repartitionByRange(4, "k"))
        for i in range(12):
            t.merge(_changes(spark, [(i, 10_000 + i, f"u{i}",
                                      "UPDATE", i + 1)]))
        cps = glob.glob(str(tmp_path / "t" / "_log" /
                            "*.checkpoint.json"))
        assert cps, "no checkpoint written after 12 commits"
        # checkpointed replay == brute-force replay from scratch
        full = {f["path"]: f for f in t._replay_files(t.latest_version())}
        fast = {f["path"]: f for f in t.active_files()}
        assert full == fast
        snap = {r["k"]: r["v"] for r in t.snapshot().collect()}
        for i in range(12):
            assert snap[i] == 10_000 + i
        # time travel below the checkpoint still works
        assert t.snapshot(version=3).count() == 500


class TestSchemaWidening:
    def test_merge_with_new_column_widens(self, spark, tmp_path):
        """ALTER TABLE ADD COLUMN mid-stream: a change batch carrying an
        extra column merges; untouched files' rows surface NULL for it
        (widening-only evolution, the CDC-safe default)."""
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 100).repartitionByRange(4, "k"))
        wide = spark.createDataFrame(
            [(1, 5, "u1", "EU", "UPDATE", 1),
             (500, 7, "new", "US", "INSERT", 2)],
            "k long, v long, tag string, region string, type string, "
            "seq long")
        t.merge(wide)
        snap = t.snapshot()
        assert "region" in snap.columns
        rows = {r["k"]: r for r in snap.collect()}
        assert rows[1]["region"] == "EU"
        assert rows[500]["region"] == "US"
        # a key from an untouched file: NULL for the new column
        assert rows[99]["region"] is None
        assert len(rows) == 101

    def test_history_excludes_checkpoint_artifacts(self, spark, tmp_path):
        """Checkpoint files must not masquerade as commits in versions()
        or history()."""
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 100).repartition(1))
        for i in range(11):
            t.merge(_changes(spark, [(i, i, "u", "UPDATE", i + 1)]))
        vs = t.versions()
        assert vs == sorted(set(vs)) == list(range(12))
        assert len(t.history()) == 12


class TestPartitionedTable:
    def _pt(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "pt"), pk="k",
                      partition_col="region")
        base = spark.range(600).select(
            F.col("id").alias("k"),
            (F.col("id") % 13).alias("v"),
            F.element_at(F.array(F.lit("eu"), F.lit("us"), F.lit("ap")),
                         (F.col("id") % 3 + 1).cast("int")).alias("region"))
        t.create(base)
        return t

    def test_add_actions_record_partitions(self, spark, tmp_path):
        t = self._pt(spark, tmp_path)
        parts = {f.get("partition") for f in t.active_files()}
        assert parts == {"eu", "us", "ap"}

    def test_partition_snapshot_prunes_files_from_log(self, spark,
                                                      tmp_path):
        t = self._pt(spark, tmp_path)
        eu = t.snapshot(where_partition="eu")
        all_files = {f["path"] for f in t.active_files()}
        read = {p.removeprefix("file://") for p in eu.inputFiles()}
        assert read < all_files
        assert eu.count() == 200
        assert eu.where("region <> 'eu'").count() == 0

    def test_merge_rewrites_only_hit_partition(self, spark, tmp_path):
        t = self._pt(spark, tmp_path)
        before = {f["path"]: f.get("partition")
                  for f in t.active_files()}
        ch = spark.createDataFrame(
            [(0, 999, "eu", "UPDATE", 1)],
            "k long, v long, region string, type string, seq long")
        t.merge(ch)
        after = {f["path"] for f in t.active_files()}
        removed = set(before) - after
        # only eu files rewrote; us/ap carried by reference
        assert removed and all(before[p] == "eu" for p in removed)
        assert t.snapshot().where("k = 0").first()["v"] == 999

    def test_merge_retrying_rebases_past_conflicts(self, spark, tmp_path):
        t = self._pt(spark, tmp_path)
        t2 = AcidTable(spark, str(tmp_path / "pt"), pk="k",
                       partition_col="region")  # competing writer
        ch1 = spark.createDataFrame(
            [(1, 100, "us", "UPDATE", 1)],
            "k long, v long, region string, type string, seq long")
        ch2 = spark.createDataFrame(
            [(2, 200, "ap", "UPDATE", 2)],
            "k long, v long, region string, type string, seq long")
        t.merge(ch1)
        # t2's cached view is stale (it would claim the same version) —
        # merge_retrying must rebase and land on the next one
        v = t2.merge_retrying(ch2)
        assert v == t2.latest_version()
        snap = {r["k"]: r["v"] for r in t2.snapshot().collect()}
        assert snap[1] == 100 and snap[2] == 200


class TestConcurrentWriters:
    def test_threaded_merges_all_land_serializably(self, spark, tmp_path):
        """Four writers race real merges through merge_retrying; the
        put-if-absent protocol serializes them — every change lands,
        version numbers are dense, and the final state equals the
        union of all changes."""
        import threading

        root = str(tmp_path / "race")
        t0 = AcidTable(spark, root, pk="k")
        t0.create(_base(spark, 400).repartitionByRange(4, "k"))

        errors = []

        def writer(wid: int) -> None:
            try:
                t = AcidTable(spark, root, pk="k")
                ch = _changes(spark, [
                    (wid * 100 + j, 9000 + wid, f"w{wid}", "UPDATE",
                     wid + 1) for j in range(3)])
                t.merge_retrying(ch, max_retries=20)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=writer, args=(i,))
                   for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert not errors, errors
        assert t0.versions() == list(range(5))  # create + 4 merges, dense
        snap = {r["k"]: r for r in t0.snapshot().collect()}
        for wid in range(4):
            for j in range(3):
                assert snap[wid * 100 + j]["v"] == 9000 + wid, \
                    f"writer {wid} change lost"


class TestVersionedMergeProperty:
    def test_shuffled_batches_converge_to_latest_wins(self, spark,
                                                      tmp_path):
        """Randomized change streams cut into SHUFFLED batches (arrival
        order maximally disagrees with sequence order) applied through
        merge_versioned converge to the same state as a single latest-
        wins pass — 5 seeds, deletes included."""
        import random

        for seed in range(5):
            rnd = random.Random(seed)
            root = str(tmp_path / f"prop{seed}")
            t = AcidTable(spark, root, pk="k")
            empty = spark.createDataFrame(
                [], "k long, v long, tag string, seq long, "
                    "__deleted boolean")
            t.create(empty)
            changes = []
            for seq in range(1, 61):
                k = rnd.randrange(15)
                op = rnd.choice(["INSERT", "UPDATE", "UPDATE", "DELETE"])
                changes.append((k, rnd.randrange(1000), f"s{seq}", op,
                                seq))
            shuffled = changes[:]
            rnd.shuffle(shuffled)
            batches = [shuffled[i::4] for i in range(4)]
            for bi, batch in enumerate(batches):
                t.merge_versioned(_changes(
                    spark, [(k, v, tag, op, seq)
                            for k, v, tag, op, seq in batch]),
                    txn=f"p{seed}:{bi}")
            got = {(r["k"], r["v"], r["tag"])
                   for r in t.snapshot_live().collect()}
            last: dict = {}
            for k, v, tag, op, seq in changes:
                if k not in last or seq > last[k][4]:
                    last[k] = (k, v, tag, op, seq)
            want = {(k, v, tag) for k, v, tag, op, _ in last.values()
                    if op != "DELETE"}
            assert got == want, f"seed {seed}"


class TestMetadataViews:
    def test_history_and_files_dataframes(self, spark, tmp_path):
        from ru_cdc_spark.operators.acid_table import (
            table_files,
            table_history,
        )

        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 200).repartitionByRange(4, "k"))
        t.merge(_changes(spark, [(1, 9, "u", "UPDATE", 1)]), txn="a:0")
        h = table_history(t).collect()
        assert [r["op"] for r in h] == ["CREATE", "MERGE"]
        assert h[1]["txn"] == "a:0"
        f = table_files(t)
        assert f.count() == len(t.active_files())
        assert f.agg(F.sum("rows")).first()[0] == 200

    def test_change_feed_between_versions(self, spark, tmp_path):
        from ru_cdc_spark.operators.acid_table import table_changes_between

        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 100).repartition(2))
        t.merge(_changes(spark, [
            (1, 999, "upd", "UPDATE", 1),
            (500, 5, "new", "INSERT", 2),
            (7, 0, "x", "DELETE", 3),
        ]))
        cdf = table_changes_between(t, 0, 1)
        by_type = {r["_change_type"]: r for r in cdf.collect()}
        assert set(by_type) == {"insert", "delete", "update_preimage",
                                "update_postimage"}
        assert by_type["insert"]["k"] == 500
        assert by_type["delete"]["k"] == 7
        assert by_type["update_postimage"]["v"] == 999


class TestMetaColumnNullSafety:
    """ADVICE fixes: version 0 created WITHOUT __deleted/seq meta
    columns must not lose rows through ~NULL filters or NULL-ordering
    max_by, and non-long primary keys must plan correctly."""

    def test_versioned_merge_over_plain_create(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        # plain create: no __deleted, no seq — the meta columns only
        # arrive with the first versioned merge
        t.create(_base(spark, 50).repartition(2))
        t.merge_versioned(_changes(spark, [
            (1, 999, "upd", "UPDATE", 10),
            (500, 5, "new", "INSERT", 11),
            (7, 0, "x", "DELETE", 12),
        ]))
        live = {r["k"]: r for r in t.snapshot_live().collect()}
        # rows in files never rewritten by the merge (NULL __deleted
        # via mergeSchema) must remain live
        assert len(live) == 50  # 50 - 1 deleted + 1 inserted
        assert live[1]["v"] == 999
        assert live[500]["v"] == 5
        assert 7 not in live
        # untouched base rows survive
        assert live[13]["v"] == 13 % 97

    def test_string_pk_merge_plans_and_applies(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        base = spark.range(40).select(
            F.concat(F.lit("key"), F.format_string("%03d", "id"))
            .alias("k"),
            F.col("id").alias("v"))
        t.create(base.repartition(2))
        changes = spark.createDataFrame(
            [("key005", 500, "UPDATE", 1),
             ("key999", 999, "INSERT", 2),
             ("key010", 0, "DELETE", 3)],
            "k string, v long, type string, seq long")
        t.merge(changes)
        live = {r["k"]: r["v"] for r in t.snapshot().collect()}
        assert live["key005"] == 500
        assert live["key999"] == 999
        assert "key010" not in live
        assert len(live) == 40  # 40 - 1 + 1

    def test_string_pk_table_files_schema(self, spark, tmp_path):
        from ru_cdc_spark.operators.acid_table import table_files

        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        base = spark.range(10).select(
            F.concat(F.lit("k"), "id").alias("k"),
            F.col("id").alias("v"))
        t.create(base)
        f = table_files(t)
        assert dict(f.dtypes)["min_pk"] == "string"
        assert f.count() >= 1


class TestCdfStreaming:
    def test_stream_follows_new_versions_incrementally(self, spark,
                                                       tmp_path):
        """The CDF source's offsets are table versions: an availableNow
        run drains the existing commits, a LATER merge produces a new
        version, and the next run from the same checkpoint delivers
        ONLY that version's changes."""
        from ru_cdc_spark.sources.acid_cdf_source import (
            register_acid_cdf_source,
        )

        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 60).repartition(2))
        t.merge(_changes(spark, [(1, 111, "a", "UPDATE", 1)]))
        register_acid_cdf_source(spark)
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

        def run():
            stream = (spark.readStream.format("acid_cdf")
                      .option("root", str(tmp_path / "t"))
                      .option("pk", "k")
                      .option("start_version", 0).load())
            q = (stream.writeStream.format("parquet")
                 .option("path", out)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        run()
        first = spark.read.parquet(out).collect()
        assert {r["_change_type"] for r in first} == {
            "update_preimage", "update_postimage"}
        assert all(r["version"] == 1 for r in first)

        t.merge(_changes(spark, [(2, 222, "b", "UPDATE", 2),
                                 (7, 0, "x", "DELETE", 3),
                                 (500, 5, "new", "INSERT", 4)]))
        run()
        rows = spark.read.parquet(out).collect()
        v2 = [r for r in rows if r["version"] == 2]
        kinds = {(r["k"], r["_change_type"]) for r in v2}
        assert (2, "update_preimage") in kinds
        assert (2, "update_postimage") in kinds
        assert (7, "delete") in kinds
        assert (500, "insert") in kinds
        # version-1 rows were NOT re-delivered
        assert len([r for r in rows if r["version"] == 1]) == len(first)

    def test_cdf_reads_only_changed_files(self, spark, tmp_path):
        """Copy-on-write locality: a single-key merge's CDF batch must
        open only the files that commit touched, not the table."""
        from ru_cdc_spark.sources.acid_cdf_source import (
            AcidCdfStreamReader,
            _CdfPartition,
        )

        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 200).repartitionByRange(4, "k"))
        v0_files = {f["path"] for f in t.active_files(0)}
        t.merge(_changes(spark, [(5, 999, "u", "UPDATE", 1)]))
        v1_files = {f["path"] for f in t.active_files(1)}
        # the commit rewrote exactly one pk-range file
        assert len(v0_files - v1_files) == 1
        reader = AcidCdfStreamReader(
            {"root": str(tmp_path / "t"), "pk": "k", "n_buckets": "1"},
            ["version", "_change_type", "k", "v", "tag"])
        rows = list(reader.read(_CdfPartition(0, 1, 0, 1)))
        assert {r[1] for r in rows} == {"update_preimage",
                                        "update_postimage"}
        ks = {r[2] for r in rows}
        assert ks == {5}


class TestMetaColumnFlag:
    """The log's per-file ``meta`` flag: NULL-coalesce guards run only
    when some live file might lack real seq/__deleted columns."""

    def test_meta_recorded_per_file(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 50))  # no meta columns
        assert not t._all_meta(t.active_files())
        t2 = AcidTable(spark, str(tmp_path / "t2"), pk="k")
        base = _base(spark, 50).withColumn("seq", F.lit(0)) \
            .withColumn("__deleted", F.lit(False))
        t2.create(base)
        assert t2._all_meta(t2.active_files())

    def test_legacy_log_without_flag_stays_guarded(self, spark, tmp_path):
        import json

        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        base = _base(spark, 30).withColumn("seq", F.lit(0)) \
            .withColumn("__deleted", F.lit(False))
        t.create(base)
        # strip the flag the way a pre-upgrade log would look
        log = t._log_file(0)
        c = json.load(open(log))
        for a in c["actions"]:
            a.get("add", {}).pop("meta", None)
        json.dump(c, open(log, "w"))
        assert not t._all_meta(t.active_files())
        assert t.snapshot_live().count() == 30  # guarded path still right

    def test_fast_path_plan_has_no_coalesce(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        base = _base(spark, 30).withColumn("seq", F.lit(0).cast("long")) \
            .withColumn("__deleted", F.lit(False))
        t.create(base)
        t.merge_versioned(_changes(spark, [(1, 9, "u", "UPDATE", 5)]))
        plan = t.snapshot_live()._jdf.queryExecution().optimizedPlan() \
            .toString()
        assert "coalesce(__deleted" not in plan
        assert t.snapshot_live().count() == 30

    def test_mixed_files_keep_null_safety(self, spark, tmp_path):
        """A table created WITHOUT meta columns then merged versioned:
        rows living only in the legacy file must survive
        snapshot_live (the exact ADVICE regression)."""
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.create(_base(spark, 40))  # legacy file, no meta columns
        t.merge_versioned(_changes(spark, [(1, 9, "u", "UPDATE", 5)]))
        assert not t._all_meta(t.active_files())
        live = t.snapshot_live()
        assert live.count() == 40
        assert live.where("k = 1").collect()[0]["v"] == 9


class TestFooterStats:
    def test_stats_bytes_read_is_footer_sized(self, spark, tmp_path):
        """The write-path stats pass must read footers, not data: on a
        file big enough to dwarf its footer, the helper's counted bytes
        stay orders of magnitude below the file size (round-6 verdict
        item #1 — the old path re-scanned every just-written file)."""
        from ru_cdc_spark.operators.acid_table import _footer_stats_one

        p = str(tmp_path / "big")
        spark.range(2_000_000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("body")) \
            .coalesce(1).write.parquet(p)
        f = next(os.path.join(p, x) for x in os.listdir(p)
                 if x.endswith(".parquet"))
        size = os.path.getsize(f)
        rows, mn, mx, bytes_read = _footer_stats_one(f, "k", True)
        assert (rows, mn, mx) == (2_000_000, 0, 1_999_999)
        assert size > 1_000_000          # the file is genuinely big
        assert bytes_read < size / 50, (bytes_read, size)

    def test_string_pk_falls_back_to_column_read(self, spark, tmp_path):
        """String stats can be writer-truncated, so string pks take the
        single-column fallback — still column-pruned, never a full
        scan, and the values are exact even for long keys."""
        from ru_cdc_spark.operators.acid_table import _footer_stats_one

        p = str(tmp_path / "s")
        spark.createDataFrame(
            [("k" * 100 + "a", 1), ("k" * 100 + "z", 2)],
            "pk string, v long").coalesce(1).write.parquet(p)
        f = next(os.path.join(p, x) for x in os.listdir(p)
                 if x.endswith(".parquet"))
        rows, mn, mx, _ = _footer_stats_one(f, "pk", False)
        assert rows == 2
        assert mn == "k" * 100 + "a" and mx == "k" * 100 + "z"

    def test_distributed_footer_pass_matches_driver_loop(self, spark,
                                                         tmp_path):
        """Above FOOTER_STATS_DISTRIBUTE_OVER files the pass runs as a
        mapInPandas job; its add-actions must equal the driver loop's."""
        t = AcidTable(spark, str(tmp_path / "t"), pk="k")
        t.FOOTER_STATS_DISTRIBUTE_OVER = 2   # force the job path
        t.create(_base(spark, 500).repartition(5))
        files = sorted((f["path"], f["rows"], f["min_pk"], f["max_pk"])
                       for f in t.active_files())
        t2 = AcidTable(spark, str(tmp_path / "t2"), pk="k")
        t2.create(_base(spark, 500).repartition(5))
        files2 = sorted((f["rows"], f["min_pk"], f["max_pk"])
                        for f in t2.active_files())
        assert sorted((r, mn, mx) for _, r, mn, mx in files) == files2
        assert sum(r for _, r, _, _ in files) == 500

    def test_partition_values_keep_write_side_types(self, spark,
                                                    tmp_path):
        """Hive path parsing casts the partition value back via the
        WRITE-side schema: an int partition column round-trips as int,
        a string column holding digits stays a string (read-side
        inference would have guessed int)."""
        t = AcidTable(spark, str(tmp_path / "ti"), pk="k",
                      partition_col="bucket")
        t.create(spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("bucket")))
        assert {f["partition"] for f in t.active_files()} == {0, 1, 2}

        ts = AcidTable(spark, str(tmp_path / "ts"), pk="k",
                       partition_col="bucket")
        ts.create(spark.range(20).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("bucket")))
        assert {f["partition"] for f in ts.active_files()} == \
            {"0", "1", "2"}
