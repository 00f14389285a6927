"""Delta MERGE wiring: statement generation + availability gating."""

from __future__ import annotations

import pytest

from ru_cdc_spark.operators.delta_merge import (
    delta_available,
    merge_into_delta,
    merge_statement,
)


def test_merge_statement_shape():
    sql = merge_statement("target", "src", ["id"], ["name", "balance"])
    assert "MERGE INTO target t" in sql
    assert "ON t.id = s.id" in sql
    # version guard prevents out-of-order regressions
    assert "t.__seq < s.id" in sql
    # delete becomes a tombstone, not a hard delete
    assert "SET t.__deleted = true" in sql
    assert "WHEN NOT MATCHED" in sql


def test_delta_gated_in_this_image(spark):
    if delta_available(spark):
        pytest.skip("delta present; gating test not applicable")
    batch = spark.createDataFrame([(1, "a", 1, "INSERT")],
                                  ["id", "name", "seq", "type"])
    with pytest.raises(NotImplementedError, match="merge_versioned"):
        merge_into_delta(spark, "t", batch, ["id"], ["name"])


# ---------------------------------------------------------------------------
# property: versioned merge over ANY batch split == latest-wins replay
# ---------------------------------------------------------------------------

def test_merge_versioned_random_splits_match_replay(spark):
    """Randomized (seeded) change sequences, shuffled into arbitrary batch
    splits: folding merge_versioned over the batches must equal the
    latest-wins replay of the whole log, for every permutation tried —
    the order-independence contract tombstones exist to provide."""
    import random

    from pyspark.sql import functions as F

    from ru_cdc_spark.operators.merge import (
        apply_changes,
        merge_versioned,
        snapshot_view,
    )

    rng = random.Random(2024)
    for trial in range(4):
        n_keys = rng.randint(3, 8)
        events = []
        seq = 0
        for key in range(n_keys):
            alive = False
            for _ in range(rng.randint(1, 5)):
                seq += 1
                if not alive:
                    events.append((seq, "INSERT", key, f"v{seq}"))
                    alive = True
                elif rng.random() < 0.3:
                    events.append((seq, "DELETE", key, None))
                    alive = False
                else:
                    events.append((seq, "UPDATE", key, f"v{seq}"))
        rows = [
            (s, t,
             {"k": k, "val": None if t == "INSERT" else f"old{s}"},
             None if t == "DELETE" else {"k": k, "val": v})
            for s, t, k, v in events
        ]
        schema = ("id long, type string, "
                  "before struct<k:long,val:string>, "
                  "after struct<k:long,val:string>")
        all_changes = spark.createDataFrame(rows, schema)

        # arbitrary arrival order + random batch boundaries
        shuffled = rows[:]
        rng.shuffle(shuffled)
        cuts = sorted(rng.sample(range(1, len(shuffled)), 
                                 min(2, len(shuffled) - 1)))
        pieces, lo = [], 0
        for c in [*cuts, len(shuffled)]:
            pieces.append(spark.createDataFrame(shuffled[lo:c], schema))
            lo = c

        snapshot_meta = None
        for piece in pieces:
            snapshot_meta = merge_versioned(snapshot_meta, piece, ["k"])
        got = snapshot_view(snapshot_meta).orderBy("k")
        expected = apply_changes(all_changes, ["k"]).orderBy("k")
        diff = (got.exceptAll(expected).count()
                + expected.exceptAll(got).count())
        assert diff == 0, f"trial {trial}: split result diverges from replay"


def test_merge_into_partitioned_touches_only_affected_dirs(spark, sf_dir, tmp_path):
    """A batch confined to one partition value must leave every other
    directory's files physically untouched, and a partition emptied by
    deletes must disappear."""
    import os

    from pyspark.sql import functions as F

    from ru_cdc_spark.operators.merge import merge_into_partitioned
    from ru_cdc_spark.sources.layout import write_hive_partitioned
    from ru_cdc_spark.sources.readers import load_table

    snap_dir = str(tmp_path / "snap")
    orders = load_table(spark, sf_dir, "orders").limit(200)
    write_hive_partitioned(orders, snap_dir, ["o_orderpriority"])

    def files_by_dir():
        out = {}
        for d in os.listdir(snap_dir):
            if d.startswith("o_orderpriority="):
                p = os.path.join(snap_dir, d)
                out[d] = {(f, os.path.getmtime(os.path.join(p, f)))
                          for f in os.listdir(p) if f.endswith(".parquet")}
        return out

    before = files_by_dir()
    target = orders.where(F.col("o_orderpriority") == "1-URGENT").first()
    img = F.struct(*[F.col(c) for c in orders.columns])
    batch = (orders.where(F.col("o_orderkey") == target["o_orderkey"])
             .select(F.lit(100).cast("long").alias("id"),
                     F.lit("UPDATE").alias("type"),
                     img.alias("before"),
                     img.alias("after"))
             .withColumn("after", F.col("after")
                         .withField("o_orderstatus", F.lit("X"))))
    affected = merge_into_partitioned(
        spark, snap_dir, batch, ["o_orderkey"], "o_orderpriority")
    assert affected == ["1-URGENT"]

    after = files_by_dir()
    for d in before:
        if d == "o_orderpriority=1-URGENT":
            assert before[d] != after[d]          # rewritten
        else:
            assert before[d] == after[d], f"{d} was touched"
    got = (spark.read.parquet(snap_dir)
           .where(F.col("o_orderkey") == target["o_orderkey"]).first())
    assert got["o_orderstatus"] == "X"

    # delete every 1-URGENT row -> that directory must vanish entirely
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    dels = urgent.select(
        (F.lit(200) + F.col("o_orderkey")).cast("long").alias("id"),
        F.lit("DELETE").alias("type"),
        img.alias("before"), img.alias("after"))
    merge_into_partitioned(
        spark, snap_dir, dels, ["o_orderkey"], "o_orderpriority")
    assert not os.path.exists(os.path.join(snap_dir, "o_orderpriority=1-URGENT"))
    assert (spark.read.parquet(snap_dir)
            .where(F.col("o_orderpriority") == "1-URGENT").count() == 0)
