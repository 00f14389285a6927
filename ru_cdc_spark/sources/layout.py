"""Data layout for scan efficiency: range-clustered writes.

At 100 TB the cheapest predicate is the one that never reads the data:
parquet stores per-row-group min/max statistics, and both Spark's scan
and any downstream engine skip files/row groups whose stat range cannot
match the filter. That only works if the writer CLUSTERS rows so each
file covers a narrow key range — an unsorted table has every file
spanning the full domain and nothing skips.

``write_clustered`` = ``repartitionByRange`` (contiguous, roughly equal
key ranges per output file via reservoir-sampled range bounds — one
shuffle) + ``sortWithinPartitions`` (tightens row-group stats inside
each file; no extra shuffle). The test reads the written footers with
pyarrow and asserts the per-file ranges are (nearly) disjoint.

This mirrors what table formats call clustering for the 1-D case —
lexicographic range partitioning gives the leading column full skipping
power. For skipping on SEVERAL columns at once, ``write_zordered``
bit-interleaves normalized column grids into a Morton curve so every
cluster column gets narrow per-file stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_clustered(df: DataFrame, path: str, by: list[str],
                    n_files: int | None = None) -> None:
    """Write ``df`` as parquet clustered on ``by``: each output file holds
    a contiguous range of the leading cluster key, rows sorted within.

    Scale: one range shuffle (sampled bounds, balanced output files —
    skew in the cluster key becomes file-size skew, not task failure);
    the sort is per-partition and spills if needed. Readers get file- and
    row-group-level skipping on ``by`` predicates for free.
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *by)
        .sortWithinPartitions(*by)
        .write.mode("overwrite").parquet(path)
    )


def zvalue(cols, bits: int = 16):
    """Interleave the low ``bits`` bits of each (already normalized,
    non-negative integer) column into one Morton/Z-value — pure bitwise
    column expressions, fully codegen'd, no UDF."""
    from pyspark.sql import functions as F

    n = len(cols)
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        ic = c.cast("long")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(ic, b).bitwiseAND(F.lit(1)),
                            b * n + ci))
    return z


def write_zordered(df: DataFrame, path: str, by: list[str],
                   n_files: int | None = None, bits: int = 12) -> None:
    """Write parquet Z-ordered on 2+ numeric columns: every column in
    ``by`` gets file/row-group skipping power, not just the leading one
    (the limitation of lexicographic ``write_clustered``).

    Each column is min/max-normalized to a ``bits``-wide integer grid
    (one cheap global aggregate — a few bytes to the driver), the grids
    are bit-interleaved into a Z-value, and rows are range-partitioned +
    sorted by that Z-value. Nearby rows in ANY ``by`` dimension land in
    the same file, so per-file min/max stats are narrow on all of them.

    Scale: the stats pass is a full scan but map-side-combined to one
    row; the write is one range shuffle, same cost as write_clustered.
    Skew in a column collapses its normalized grid (fine — skipping
    degrades gracefully to the other dimensions).
    """
    from pyspark.sql import functions as F

    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    stats = df.agg(*[f(c).alias(f"{name}_{c}")
                     for c in by for f, name in ((F.min, "mn"), (F.max, "mx"))]
                   ).collect()[0]
    grid = (1 << bits) - 1
    norm = []
    for c in by:
        mn, mx = float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        # double math is fine here: the grid is a layout heuristic, never
        # a query result
        norm.append(((F.col(c).cast("double") - mn) * (grid / span))
                    .cast("long"))
    z = zvalue(norm, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(path)
    )


def compact_files(spark, path: str, target_bytes: int = 128 * 1024 * 1024,
                  preserve_cluster: list[str] | None = None) -> dict:
    """OPTIMIZE-style small-file compaction: rewrite a parquet directory
    into ceil(total_bytes / target_bytes) files, atomically.

    Streaming sinks and frequent small merges leave thousands of tiny
    files; at 100 TB that means task-scheduling overhead and footer reads
    dominating scans (every file costs a driver listing entry, an open,
    and a footer parse). Compaction restores scan efficiency without
    changing a single row.

    * bin count from ACTUAL on-disk bytes (os.walk), not row counts —
      the quantity that matters to the scheduler;
    * ``preserve_cluster`` re-range-partitions on the cluster key so
      compaction KEEPS skipping power (plain coalesce would interleave
      ranges and destroy footer stats); otherwise ``coalesce`` avoids
      any shuffle at all;
    * atomic swap: rewrite to ``path.__compact__``, then directory
      rename — readers see the old or the new layout, never a mix (the
      single-writer analogue of a table-format commit; with a real table
      format this is OPTIMIZE's snapshot swap).

    Returns {"files_before", "files_after", "bytes"}.
    """
    import os
    import shutil

    def _parquet_files(p):
        out = []
        for root, _dirs, files in os.walk(p):
            out += [os.path.join(root, f) for f in files
                    if f.endswith(".parquet")]
        return out

    before = _parquet_files(path)
    total = sum(os.path.getsize(f) for f in before)
    n_files = max(1, -(-total // target_bytes))  # ceil
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact__"
    if preserve_cluster:
        (df.repartitionByRange(n_files, *preserve_cluster)
         .sortWithinPartitions(*preserve_cluster)
         .write.mode("overwrite").parquet(tmp))
    else:
        df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".__old__"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {"files_before": len(before),
            "files_after": len(_parquet_files(path)), "bytes": total}


def write_hive_partitioned(df: DataFrame, path: str,
                           partition_cols: list[str]) -> None:
    """Hive-style directory partitioning: one subdirectory per partition
    value (``col=value/``). The partition column is encoded in the path,
    not the files, so a filter on it prunes whole directories at PLANNING
    time — the scan never lists, opens, or reads non-matching partitions
    (``PartitionFilters`` in the plan, vs ``PushedFilters`` which still
    reads footers).

    At 100 TB this is the first-line pruning strategy: partition by the
    dominant access dimension (ingest date, tenant), cluster/Z-order
    WITHIN partitions for secondary columns (write_clustered/
    write_zordered), and keep partition count in the 10^3-10^5 range so
    listing stays cheap."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


# ---------------------------------------------------------------------------
# file-level Bloom sidecar index: point-lookup file skipping
# ---------------------------------------------------------------------------

# 2^17 bits = 16 KiB per file: ~6e-6 false-positive rate at 2.5k distinct
# keys per file (k=5) — size m_bits at ~50x the expected per-file key
# cardinality to keep kn/m near 0.1
BLOOM_IDX_M_BITS = 1 << 17
BLOOM_IDX_K = 5


def write_bloom_index(spark, data_path: str, key: str,
                      m_bits: int = BLOOM_IDX_M_BITS,
                      k: int = BLOOM_IDX_K) -> str:
    """Per-FILE Bloom sidecar for ``key``: each data file gets a packed
    bit array of its key set, written as a tiny parquet table
    (file, word_idx, word) next to the data. Point lookups then read
    ONLY the files whose bloom admits the probe value — the footer
    min/max skipping complement for high-cardinality keys that clustering
    can't order by (Delta's bloom filter index, as a sidecar).

    Build is fully distributed: (file, bit) positions dedupe in a
    combiner-reduced shuffle bounded by files x m_bits, then pack into
    words with a bit_or aggregate — the driver never sees a bit.
    """
    assert m_bits % 64 == 0
    df = spark.read.parquet(data_path).select(
        F.col(key).alias("__k"),
        F.input_file_name().alias("f"))
    seeds = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("__seed")
    pos = (df.select("f", "__k", seeds)
           .select("f", F.pmod(F.xxhash64("__k", "__seed"), F.lit(m_bits))
                   .alias("p"))
           .distinct())
    words = (pos.select(
                "f", (F.col("p") / 64).cast("int").alias("word_idx"),
                F.expr("shiftleft(CAST(1 AS BIGINT), "
                       "CAST(pmod(p, 64) AS INT))").alias("bit"))
             .groupBy("f", "word_idx")
             .agg(F.bit_or("bit").alias("word")))
    # manifest rows (word_idx = -1): the exact file listing this index
    # was built from, so probes can detect a rewritten/compacted
    # directory and fall back instead of silently returning nothing
    manifest = spark.createDataFrame(
        [(f,) for f in spark.read.parquet(data_path).inputFiles()],
        "f string").select("f", F.lit(-1).alias("word_idx"),
                           F.lit(0).cast("long").alias("word"))
    out = data_path.rstrip("/") + f"__bloom_{key}"
    words.select("f", "word_idx", "word").unionByName(manifest) \
        .write.mode("overwrite").parquet(out)
    return out


def bloom_prune_files(spark, data_path: str, key: str, value,
                      m_bits: int = BLOOM_IDX_M_BITS,
                      k: int = BLOOM_IDX_K):
    """Point-lookup planning: consult the sidecar and return
    (candidate_files, dataframe) where the DataFrame scans ONLY the
    admitted files. False positives re-filter at scan time (the filter
    is still applied); false negatives are impossible.

    The probe value's k bit positions are computed with the SAME engine
    hash (a 1-row plan-time job — an index lookup, not a data collect).
    The literal is cast to the data column's exact type first: xxhash64
    hashes an int32 and an int64 of the same value differently.

    Staleness guard: the sidecar carries the file listing it was built
    from (word_idx = -1 manifest rows); if the directory has since been
    rewritten/compacted the listings disagree and the probe falls back
    to a full filtered scan — pruning is an optimization, never a
    correctness risk.
    """
    reader = spark.read.parquet(data_path)
    key_type = reader.schema[key].dataType
    sidecar_all = spark.read.parquet(data_path.rstrip("/")
                                     + f"__bloom_{key}")
    indexed = {r["f"] for r in
               sidecar_all.where(F.col("word_idx") == -1)
               .select("f").collect()}
    current = set(reader.inputFiles())
    if indexed != current:
        # stale index (or pre-manifest sidecar): correct full scan
        files = sorted(current)
        return files, reader.where(F.col(key) == F.lit(value))
    probe = spark.range(1).select(F.lit(value).cast(key_type).alias("__k"))
    positions = [
        r["p"] for r in probe.select(F.explode(F.array(*[
            F.pmod(F.xxhash64("__k", F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ])).alias("p")).collect()
    ]
    need = {(p >> 6, p & 63) for p in positions}
    sidecar = sidecar_all.where(F.col("word_idx") >= 0)
    checks = spark.createDataFrame(
        [(w, b) for w, b in sorted(need)], "word_idx int, bit_pos int")
    hits = (sidecar.join(F.broadcast(checks), "word_idx")
            .where(F.expr("(word & shiftleft(CAST(1 AS BIGINT), bit_pos)) "
                          "<> 0"))
            .groupBy("f")
            .agg(F.count_distinct("word_idx", "bit_pos").alias("n_hit"))
            .where(F.col("n_hit") == len(need)))
    files = [r["f"] for r in hits.select("f").collect()]
    if not files:
        empty = spark.read.parquet(data_path).where(F.lit(False))
        return [], empty.where(F.col(key) == F.lit(value))
    df = spark.read.parquet(*files).where(F.col(key) == F.lit(value))
    return files, df
