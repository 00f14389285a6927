"""Bounded-memory frequency/sampling operators with EXACT results.

Two classic 100 TB patterns the built-in operators don't provide:

* **Exact heavy hitters in two passes** (`frequent_terms_exact`):
  a per-partition Misra-Gries pass produces a small candidate superset —
  guaranteed to contain every item with global count > N/k — and a second
  pass counts ONLY the candidates exactly. The expensive full-cardinality
  term shuffle (billions of distinct terms at corpus scale) never
  happens: the only shuffle is over |candidates| <= k x partitions rows.
  The sketch's approximation error is *structurally laundered out*: a
  candidate set that is merely a superset yields an exact final answer.

* **Weighted sampling without replacement** (`weighted_priority_sample`):
  priority sampling (Duffield-Lund-Thorup, JACM 2007) — each row draws
  priority w/u with u a deterministic md5-uniform, and the top-k
  priorities per stratum are the sample. One narrow map + one bounded
  top-k per group; reproducible run-to-run and engine-to-engine because
  u is hash-derived (no RNG state) and the only float math is division
  of exact operands (IEEE-correctly-rounded identically everywhere —
  the SCALE.md numeric-determinism policy).

Reference parity note: the reference has no aggregation at all
(SURVEY §2.10); these are north-star pipeline operators. Misra-Gries:
"Finding repeated elements" (Sci. Comp. Prog. 1982), the weighted merge
form per Berinde et al. (PODS 2009).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ru_cdc_spark.operators.dedup import words_col, _WORDS_SQL
from ru_cdc_spark.sources.readers import load_table

HH_K = 200  # heavy hitter threshold: count * K > N


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summary with k counters -> candidate
    values (one output batch of <= k rows per partition).

    Guarantee (the one phase 2 relies on): within a partition of N_p
    items, any value occurring > N_p/(k+1) times survives. If a value's
    GLOBAL count exceeds N/k then by pigeonhole some partition has
    count_p > N_p/k > N_p/(k+1), so every global heavy hitter appears in
    the union of partition candidates.

    The update is the weighted/batch form: each Arrow batch collapses to
    value_counts (vectorized) before touching the dict, so Python-loop
    cost is O(distinct per batch), not O(rows); a decrement round
    subtracts the minimum count from ALL k+ counters at once (Berinde et
    al.'s weighted Misra-Gries), preserving the error bound. State is k
    counters — independent of partition size; at 100 TB the pass is a
    pure narrow map emitting k rows per partition."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
                if len(counters) > k:
                    m = min(counters.values())
                    counters = {key: n - m for key, n in counters.items()
                                if n > m}
        yield pd.DataFrame({col: list(counters.keys())})

    return items.mapInPandas(mg, f"{col} string")


def frequent_terms_exact(spark: SparkSession, sf_dir: str,
                         k: int = HH_K) -> DataFrame:
    """All terms with count * k > N (strict majority-style threshold),
    with EXACT counts — phase 1 Misra-Gries candidates, phase 2 exact
    count of candidates only, threshold division-free against the 1-row
    broadcast total."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(words_col(F.col("text"))).alias("term"))
    cands = misra_gries_candidates(terms, "term", k).distinct()
    total = terms.agg(F.count("*").alias("n_total"))
    exact = (terms.join(F.broadcast(cands), "term", "left_semi")
             .groupBy("term").agg(F.count("*").alias("n")))
    return (exact.join(F.broadcast(total))
            .where(F.col("n") * k > F.col("n_total"))
            .select("term", "n"))


FREQUENT_TERMS_SQL = f"""
WITH w AS (SELECT unnest({_WORDS_SQL}) AS term FROM documents),
tot AS (SELECT COUNT(*) AS n_total FROM w)
SELECT term, COUNT(*) AS n
FROM w, tot
GROUP BY term, tot.n_total
HAVING COUNT(*) * {HH_K} > tot.n_total
"""


# ---------------------------------------------------------------------------
# priority sampling (weighted, without replacement, deterministic)
# ---------------------------------------------------------------------------

SAMPLE_PER_STRATUM = 5


def weighted_priority_sample(spark: SparkSession, sf_dir: str,
                             k: int = SAMPLE_PER_STRATUM) -> DataFrame:
    """Per-language weighted sample of k docs, weight = n_chars: draw
    u = md5-uniform in (0,1], priority = weight/u, keep the k largest
    priorities per stratum. Longer documents are proportionally likelier
    to be drawn, yet the draw is a pure function of doc_id — join-stable
    across runs and reproducible on any cluster layout.

    Scale: priorities are a narrow map over the scan; per-group top-k is
    one bounded window (rows per group never materialize beyond the
    shuffle Spark already does for the partition key)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long")
    u = (h + F.lit(1).cast("double")) / F.lit(float(1 << 60))
    pri = F.col("n_chars").cast("double") / u
    w = (Window.partitionBy("lang")
         .orderBy(F.desc("priority"), F.asc("doc_id")))
    return (docs.select("doc_id", "lang", "n_chars",
                        pri.alias("priority"))
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("doc_id", "lang", "n_chars", "priority"))


WEIGHTED_PRIORITY_SAMPLE_SQL = f"""
WITH p AS (
    SELECT doc_id, lang, n_chars,
           CAST(n_chars AS DOUBLE) /
             ((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) + CAST(1 AS DOUBLE)) / 1152921504606846976.0)
               AS priority
    FROM documents
)
SELECT doc_id, lang, n_chars, priority
FROM p
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY priority DESC, doc_id) <= {SAMPLE_PER_STRATUM}
"""


# ---------------------------------------------------------------------------
# count-min sketch as a relational aggregate (mergeable, engine-exact)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_PROBES = 20


def _cms_bucket(term: Column, i: int, width: int = CMS_WIDTH) -> Column:
    """Row i's bucket for a term: md5 first-8-hex -> int % width — the
    same deterministic hash family on every engine and cluster layout."""
    return (F.conv(F.substring(
        F.md5(F.concat(term, F.lit(f"|{i}"))), 1, 8), 16, 10)
        .cast("long") % width)


def count_min_table(terms: DataFrame, depth: int = CMS_DEPTH,
                    width: int = CMS_WIDTH) -> DataFrame:
    """Count-min sketch (Cormode-Muthukrishnan 2005) built as a plain
    aggregate: one (i, bucket, cnt) row per non-empty cell.

    Why relational instead of an opaque binary blob: the table IS the
    mergeable partial — map-side combine collapses each partition to at
    most depth x width rows before the shuffle, so sketching a 100 TB
    corpus shuffles O(depth x width x partitions) rows no matter how many
    distinct terms exist (the full-cardinality term shuffle never
    happens). Sketches of separate corpora/days union by summing cnt per
    cell (linearity of CMS), and the result stays queryable, diffable,
    and oracle-checkable with ordinary SQL.
    """
    buckets = F.array(*[
        F.struct(F.lit(i).alias("i"),
                 _cms_bucket(F.col("term"), i, width).alias("bucket"))
        for i in range(depth)
    ])
    return (terms.select(F.explode(buckets).alias("c"))
            .groupBy(F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
            .agg(F.count("*").alias("cnt")))


def terms_count_min_estimate(spark: SparkSession, sf_dir: str,
                             depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
                             n_probes: int = CMS_PROBES) -> DataFrame:
    """Point-frequency estimates from the sketch for a deterministic probe
    vocabulary (the longest distinct terms): est(term) = min over rows of
    the term's bucket count — an overestimate by at most the collision
    mass, never an underestimate (pytest-gated against exact counts).

    Scale: the probe side is tiny and broadcast; the sketch side is
    depth x width rows regardless of corpus size. Estimating frequencies
    this way costs one bounded-size aggregate + a broadcast join — vs the
    exact path's full term shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(words_col(F.col("text"))).alias("term"))
    cms = count_min_table(terms, depth, width)
    probes = (terms.distinct()
              .orderBy(F.length("term").desc(), F.asc("term"))
              .limit(n_probes))
    probe_cells = probes.select("term", F.explode(F.array(*[
        F.struct(F.lit(i).alias("i"),
                 _cms_bucket(F.col("term"), i, width).alias("bucket"))
        for i in range(depth)
    ])).alias("c")).select("term", "c.i", "c.bucket")
    joined = probe_cells.join(F.broadcast(cms), ["i", "bucket"], "left")
    return (joined.groupBy("term")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")))


TERMS_COUNT_MIN_SQL = f"""
WITH w AS (SELECT unnest({_WORDS_SQL}) AS term FROM documents),
cells AS (
    SELECT i,
           CAST('0x' || substr(md5(term || '|' || CAST(i AS VARCHAR)), 1, 8)
                AS BIGINT) % {CMS_WIDTH} AS bucket,
           COUNT(*) AS cnt
    FROM w, range({CMS_DEPTH}) t(i)
    GROUP BY 1, 2
),
probes AS (
    SELECT DISTINCT term FROM w
    ORDER BY length(term) DESC, term LIMIT {CMS_PROBES}
),
pc AS (
    SELECT p.term, t.i,
           CAST('0x' || substr(md5(p.term || '|' || CAST(t.i AS VARCHAR)), 1, 8)
                AS BIGINT) % {CMS_WIDTH} AS bucket
    FROM probes p, range({CMS_DEPTH}) t(i)
)
SELECT pc.term, MIN(COALESCE(c.cnt, 0)) AS est
FROM pc LEFT JOIN cells c ON c.i = pc.i AND c.bucket = pc.bucket
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# exact order statistics WITHOUT a global sort (two-pass bucket refine)
# ---------------------------------------------------------------------------

MEDIAN_BUCKETS = 1000


def exact_median_two_pass(spark: SparkSession, sf_dir: str,
                          n_buckets: int = MEDIAN_BUCKETS) -> DataFrame:
    """EXACT per-group median with NO global sort — the 100 TB pattern for
    exact order statistics: pass 1 histograms values into equi-width
    buckets and locates, per group, which bucket holds each middle rank;
    pass 2 sorts ONLY those buckets' rows (a ~1/n_buckets sliver) to pull
    the exact order statistics. The median is (lo + hi) / 2 written as
    that exact expression on both engines (quantile_cont's a+(b-a)*f is a
    DIFFERENT float op order and can differ in the last bit).

    Scale: pass 1 is a map-side-combined (group, bucket) count — the same
    shuffle as any histogram; pass 2's window sorts only the target
    buckets' rows per group. Against F.percentile / a full sort: the
    sort input shrinks by ~n_buckets x, and partial agg does the rest.
    The candidate filter is a broadcast semi-join, so the fact is scanned
    twice but never globally sorted.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").alias("v"),
        "l_orderkey", "l_linenumber")
    lo, hi = li.agg(F.min("v"), F.max("v")).collect()[0]
    width = (hi - lo) / n_buckets or 1.0
    bucket = F.least(F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
                     F.lit(n_buckets - 1)).cast("int")

    hist = (li.select("l_returnflag", bucket.alias("b"))
            .groupBy("l_returnflag", "b").agg(F.count("*").alias("c")))
    wcum = Window.partitionBy("l_returnflag").orderBy("b") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag", "b", "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wtot).alias("n"))
    # middle ranks: k1 = (n+1) div 2, k2 = (n+2) div 2 (equal when odd)
    k1 = F.expr("(n + 1) div 2")
    k2 = F.expr("(n + 2) div 2")
    targets = (cum.where((F.col("cum") >= k1)
                         & (F.col("cum") - F.col("c") < k2))
               .select("l_returnflag", "b",
                       (F.col("cum") - F.col("c")).alias("rank_before"),
                       k1.alias("k1"), k2.alias("k2")))

    cand = (li.select("l_returnflag", "v", bucket.alias("b"),
                      "l_orderkey", "l_linenumber")
            .join(F.broadcast(targets), ["l_returnflag", "b"]))
    wrank = Window.partitionBy("l_returnflag", "b").orderBy(
        F.col("v").asc(), F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc())
    ranked = cand.withColumn(
        "rk", F.row_number().over(wrank) + F.col("rank_before"))
    picks = ranked.where((F.col("rk") == F.col("k1"))
                         | (F.col("rk") == F.col("k2")))
    return (picks.groupBy("l_returnflag")
            .agg(F.min("v").alias("lo_mid"), F.max("v").alias("hi_mid"),
                 F.max("k2").alias("upper_rank"))
            .select("l_returnflag", "lo_mid", "hi_mid", "upper_rank",
                    ((F.col("lo_mid") + F.col("hi_mid")) / F.lit(2.0))
                    .alias("median")))


EXACT_MEDIAN_TWO_PASS_SQL = """
WITH ranked AS (
    SELECT l_returnflag, l_quantity AS v,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY l_quantity, l_orderkey, l_linenumber)
               AS rk,
           COUNT(*) OVER (PARTITION BY l_returnflag) AS n
    FROM lineitem
),
picks AS (
    SELECT l_returnflag, v, n FROM ranked
    WHERE rk = (n + 1) // 2 OR rk = (n + 2) // 2
)
SELECT l_returnflag, MIN(v) AS lo_mid, MAX(v) AS hi_mid,
       CAST(MAX((n + 2) // 2) AS BIGINT) AS upper_rank,
       (MIN(v) + MAX(v)) / 2.0 AS median
FROM picks GROUP BY 1
"""
