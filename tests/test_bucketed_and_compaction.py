"""Bucketed co-located joins (zero-exchange plan) + tombstone compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from ru_cdc_spark.operators.merge import (
    compact_tombstones,
    merge_versioned,
    snapshot_view,
)
from ru_cdc_spark.plans import count_exchanges
from ru_cdc_spark.sources.bucketed import colocated_order_lineitem_join


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # disable auto-broadcast: at test scale Catalyst would broadcast the
    # tiny side and hide the property under test (bucketed co-location
    # eliminating the join shuffle for the fact⋈fact case)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # writes go to the session's default warehouse (gitignored locally)
        df = colocated_order_lineitem_join(spark, sf_dir)
        # the join itself must be exchange-free; the final small groupBy
        # agg is the only allowed shuffle
        assert count_exchanges(df) <= 1
        plan = str(df._jdf.queryExecution().executedPlan())
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "id long, type string, after struct<k:long, v:string>"
    ).withColumn(
        "before", F.col("after")
    )


def test_compaction_drops_only_settled_tombstones(spark):
    b1 = _changes(spark, [
        (1, "INSERT", (1, "a")), (2, "DELETE", (1, "a")),   # settled delete
        (3, "INSERT", (2, "b")), (9, "DELETE", (3, "c")),   # recent delete
    ])
    snap = merge_versioned(None, b1, ["k"])
    assert snapshot_view(snap).count() == 1  # only k=2 lives

    compacted = compact_tombstones(snap, low_watermark_seq=5)
    metas = {r["k"]: (r["__seq"], r["__deleted"]) for r in compacted.collect()}
    assert 1 not in metas            # old tombstone physically dropped
    assert metas[3] == (9, True)     # recent tombstone retained
    assert metas[2] == (3, False)

    # late old INSERT for k=3 still cannot resurrect (tombstone retained)
    late = _changes(spark, [(8, "INSERT", (3, "zombie"))])
    after = merge_versioned(compacted, late, ["k"])
    assert snapshot_view(after).where("k = 3").count() == 0


def test_compact_files_reduces_count_preserves_rows(spark, sf_dir, tmp_path):
    from ru_cdc_spark.sources.layout import compact_files

    src = str(tmp_path / "frag")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(64).write.parquet(src)   # fragment: 64 tiny files
    before = orders.count()

    stats = compact_files(spark, src, target_bytes=10 * 1024 * 1024)
    assert stats["files_before"] == 64
    assert stats["files_after"] < 64
    after_df = spark.read.parquet(src)
    assert after_df.count() == before
    assert set(after_df.columns) == set(orders.columns)
    import os
    assert not os.path.exists(src + ".__old__")     # swap fully cleaned
    assert not os.path.exists(src + ".__compact__")


def test_compact_files_preserving_cluster_keeps_disjoint_ranges(
        spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    from ru_cdc_spark.sources.layout import compact_files

    import os

    src = str(tmp_path / "fragc")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(32).write.parquet(src)
    total = sum(os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(src) for f in fs
                if f.endswith(".parquet"))
    # target ~ a third of the payload: forces >= 3 compacted files at any
    # scale factor
    compact_files(spark, src, target_bytes=total // 3,
                  preserve_cluster=["o_orderkey"])
    ranges = []
    for root, _d, files in os.walk(src):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, f))
            idx = md.schema.names.index("o_orderkey")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "compacted files overlap on the cluster key"


def test_hive_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (planning-time directory pruning) and the scan must only read files
    under the matching partition directory."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.plans import formatted_plan
    from ru_cdc_spark.sources.layout import write_hive_partitioned
    from ru_cdc_spark.sources.readers import load_table

    out = str(tmp_path / "orders_by_priority")
    orders = load_table(spark, sf_dir, "orders")
    write_hive_partitioned(orders, out, ["o_orderpriority"])

    pruned = (spark.read.parquet(out)
              .where(F.col("o_orderpriority") == "1-URGENT"))
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    # executed-plan metrics prove only 1 of the 5 directories was read
    # (inputFiles() reflects the pre-pruning FileIndex, so ask the
    # executed scan node instead)
    n_rows = len(pruned.collect())
    assert n_rows > 0

    def find_scan(node):
        if "Scan" in node.nodeName():
            return node
        for i in range(node.children().length()):
            hit = find_scan(node.children().apply(i))
            if hit is not None:
                return hit
        return None

    scan = find_scan(pruned._jdf.queryExecution().executedPlan())
    assert scan is not None
    n_parts = scan.metrics().apply("numPartitions").value()
    assert n_parts == 1, f"expected 1 pruned partition dir, read {n_parts}"
    # layout never changes semantics
    want = orders.where(F.col("o_orderpriority") == "1-URGENT").count()
    assert pruned.count() == want


def test_bloom_sidecar_prunes_files_for_point_lookup(spark, tmp_path):
    """Per-file Bloom index: a point lookup consults the sidecar and
    scans a strict subset of files, returning exactly the full-scan
    answer; an absent key admits no files (whp) and returns empty."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.sources.layout import (
        bloom_prune_files,
        write_bloom_index,
        write_clustered,
    )

    data = str(tmp_path / "keyed")
    df = spark.range(20_000).select(
        (F.col("id") * 7919 % 100_000).alias("k"),
        (F.col("id") % 97).alias("v"))
    write_clustered(df, data, by=["k"], n_files=8)
    write_bloom_index(spark, data, "k")

    probe = df.limit(1).collect()[0]["k"]
    files, pruned = bloom_prune_files(spark, data, "k", probe)
    assert 1 <= len(files) < 8, f"no pruning: {len(files)} files"
    full = spark.read.parquet(data).where(F.col("k") == probe)
    assert sorted(r["v"] for r in pruned.collect()) == \
        sorted(r["v"] for r in full.collect())

    # absent key: sidecar admits nothing (8 files x 5 hashes in 2^13 bits
    # keeps the false-positive odds negligible), result is empty
    files2, pruned2 = bloom_prune_files(spark, data, "k", 123_456_789)
    assert files2 == []
    assert pruned2.count() == 0


def test_bucket_pruning_on_point_lookup(spark, sf_dir):
    """Filtering a bucketed table on its bucket key must prune buckets at
    planning time (SelectedBucketsCount 1/N in the scan) — the managed-
    table complement to the Bloom sidecar's file skipping."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.sources.bucketed import write_bucketed

    name = write_bucketed(spark, sf_dir, "orders", "o_orderkey",
                          n_buckets=8, suffix="_bp_test")
    # the planner turns bucketed scans off for pure filters unless told
    # otherwise (autoBucketedScan optimizes for joins/aggs); pruning only
    # applies to a bucketed scan
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(name).where(F.col("o_orderkey") == 7)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:800]
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")


def test_bloom_sidecar_stale_after_rewrite_falls_back(spark, tmp_path):
    """ADVICE fix: a compaction/rewrite after write_bloom_index changes
    the file listing; the probe must detect the stale sidecar via its
    manifest and fall back to a correct full scan instead of silently
    returning zero rows."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.sources.layout import (
        bloom_prune_files,
        write_bloom_index,
        write_clustered,
    )

    data = str(tmp_path / "keyed2")
    df = spark.range(5_000).select(
        (F.col("id") * 7919 % 50_000).alias("k"),
        (F.col("id") % 97).alias("v"))
    write_clustered(df, data, by=["k"], n_files=8)
    write_bloom_index(spark, data, "k")
    probe = df.limit(1).collect()[0]["k"]

    # fresh index: prunes and matches the full scan
    files, pruned = bloom_prune_files(spark, data, "k", probe)
    assert 1 <= len(files) < 8
    expected = sorted(r["v"] for r in
                      spark.read.parquet(data)
                      .where(F.col("k") == probe).collect())
    assert sorted(r["v"] for r in pruned.collect()) == expected

    # compact to 2 files WITHOUT rebuilding the index
    compacted = spark.read.parquet(data).repartition(2)
    compacted.write.mode("overwrite").parquet(str(tmp_path / "keyed2_new"))
    spark.read.parquet(str(tmp_path / "keyed2_new")).write \
        .mode("overwrite").parquet(data)

    files2, pruned2 = bloom_prune_files(spark, data, "k", probe)
    # fallback scans everything but returns the right rows
    assert sorted(r["v"] for r in pruned2.collect()) == expected
    assert set(files2) == set(spark.read.parquet(data).inputFiles())
