"""Training-corpus curation operators beyond dedup: sequence packing
and benchmark decontamination — the two pipeline stages that sit between
"clean corpus" and "tokens on the GPUs".

* **Sequence packing** — LLM pretraining concatenates the tokenized
  corpus into one stream and cuts fixed-length context windows (the
  GPT-style pack-then-chunk discipline); the planner's job is mapping
  every document to its window coordinates without materializing the
  stream. That is exactly a running sum over the corpus order, which
  this engine already distributes (operators/rankops.grouped_running_sum:
  range shuffle + partition-local windows + broadcast offsets — no
  single-task window at any corpus size).
* **Decontamination** — eval benchmarks must not leak into training
  data; the standard check (GPT-3 appendix C, The Pile, Dolma) flags
  training documents sharing ≥1 long n-gram with any benchmark text.
  Benchmark gram sets are small (eval suites, not corpora), so the scan
  is a broadcast semi-join against the corpus's n-gram stream — the
  corpus is never shuffled.

No reference counterpart: ru-cdc is a CDC engine (src/ has no corpus
tooling); these follow the published pipeline papers above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ru_cdc_spark.operators.dedup import _WORDS_SQL, words_col
from ru_cdc_spark.sources.readers import load_table, spread

PACK_WINDOW = 512        # context length in (whitespace) tokens
DECON_NGRAM = 5          # contamination gram length, words — real
# pipelines use 8-13 TOKEN grams; this synthetic corpus's small
# vocabulary makes 5 words the discriminative length (k=4 flags ~15%
# of the corpus, k=6+ only verbatim twins; measured at sf0.1)
DECON_BENCH_MOD = 97     # doc_id % 97 == 0 -> the "benchmark" set


def corpus_pack_windows(spark: SparkSession, sf_dir: str,
                        window: int = PACK_WINDOW) -> DataFrame:
    """Map every document to its packed-window coordinates: documents
    are concatenated in doc_id order into one token stream cut every
    ``window`` tokens; each doc gets its stream offset, first window
    id, offset inside that window, and the number of windows it spans
    (boundary-straddling docs are the packing plan's whole point —
    counting them wrong silently truncates training text).

    Scale: one narrow token-count projection, then the distributed
    running sum (rangepartitioning + __pid-local windows + broadcast
    offsets); no unpartitioned window, no collect. The token stream is
    never materialized — only its coordinates."""
    from ru_cdc_spark.operators.rankops import grouped_running_sum

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.size(words_col(F.col("text"))).alias("n_tok"))
    toks = toks.where(F.col("n_tok") > 0)
    cum = grouped_running_sum(toks, [], [F.col("doc_id").asc()],
                              ["n_tok"], prefix="cum_")
    start = (F.col("cum_n_tok") - F.col("n_tok"))
    return cum.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        start.cast("long").alias("stream_off"),
        F.floor(start / window).cast("long").alias("window_id"),
        (start % window).cast("long").alias("window_off"),
        (F.floor((F.col("cum_n_tok") - 1) / window)
         - F.floor(start / window) + 1).cast("long").alias("n_windows"),
    )


CORPUS_PACK_WINDOWS_SQL = f"""
WITH toks AS (
    SELECT doc_id, len({_WORDS_SQL}) AS n_tok FROM documents
), nz AS (SELECT * FROM toks WHERE n_tok > 0),
cum AS (
    SELECT doc_id, n_tok,
           SUM(n_tok) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS c
    FROM nz
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(c - n_tok AS BIGINT) AS stream_off,
       CAST((c - n_tok) // {PACK_WINDOW} AS BIGINT) AS window_id,
       CAST((c - n_tok) % {PACK_WINDOW} AS BIGINT) AS window_off,
       CAST((c - 1) // {PACK_WINDOW}
            - (c - n_tok) // {PACK_WINDOW} + 1 AS BIGINT) AS n_windows
FROM cum
"""


def _grams(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, gram) pairs, distinct k-word grams."""
    w = F.col("w")
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(w) - (k - 1)),
        lambda i: F.array_join(F.slice(w, i, k), " "),
    ))
    return (docs.select("doc_id", words_col(F.col("text")).alias("w"))
            .where(F.size("w") >= k)
            .select("doc_id", F.explode(grams).alias("gram")))


def corpus_decontaminate(spark: SparkSession, sf_dir: str,
                         k: int = DECON_NGRAM,
                         bench_mod: int = DECON_BENCH_MOD) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing
    at least one ``k``-word gram with the benchmark set (here the
    deterministic holdout doc_id % bench_mod == 0 — in production, the
    eval suites). Output: one row per CONTAMINATED training doc with
    the count of distinct leaked grams; benchmark docs themselves are
    excluded (they are not training data).

    Scale: the benchmark gram set is eval-suite-sized, never
    corpus-sized — it broadcasts; the corpus side is a narrow gram
    explode into a broadcast semi-join (no corpus shuffle), and only
    the matching (doc, gram) rows reach the per-doc count aggregation.
    The same shape handles multi-benchmark suites by unioning gram
    sets."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    bench = docs.where(F.col("doc_id") % bench_mod == 0)
    train = docs.where(F.col("doc_id") % bench_mod != 0)
    bench_grams = _grams(bench, k).select("gram").distinct()
    hits = (_grams(train, k)
            .join(F.broadcast(bench_grams), "gram"))
    return (hits.groupBy("doc_id")
            .agg(F.count_distinct("gram").alias("n_leaked_grams"))
            .select("doc_id", "n_leaked_grams"))


CORPUS_DECONTAMINATE_SQL = f"""
WITH words AS (
    SELECT doc_id, {_WORDS_SQL} AS w FROM documents
), grams AS (
    SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - {DECON_NGRAM - 2}),
                      i -> array_to_string(w[i:i+{DECON_NGRAM - 1}], ' ')))
                   AS gram
        FROM words WHERE len(w) >= {DECON_NGRAM}
    )
), bench AS (
    SELECT DISTINCT gram FROM grams
    WHERE doc_id % {DECON_BENCH_MOD} = 0
)
SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_leaked_grams
FROM grams g JOIN bench b USING (gram)
WHERE g.doc_id % {DECON_BENCH_MOD} <> 0
GROUP BY g.doc_id
"""


# ---------------------------------------------------------------------------
# Domain mixing (round 9): sample each source down to target token
# proportions — the Pile/Dolma "mixing weights" stage. Given per-domain
# weights w_d, the largest non-upsampled output S satisfies
# S*w_d <= T_d for every domain, i.e. S = min_d floor(T_d / w_d); each
# domain then contributes docs (in a deterministic pseudo-random order)
# until its token budget floor(S*w_d) is reached. All arithmetic is
# integer (weights carried as numerator/denominator), so the DuckDB
# oracle recomputes the exact selected set.
# ---------------------------------------------------------------------------

MIX_DENOM = 210          # sum of weight numerators 1..20 (srcK gets
#                          (K+1)/210 of output tokens)
MIX_HASH_MUL = 2654435761  # Knuth multiplicative step for the
#                            deterministic shuffle order (identical
#                            arithmetic both engines; fixture doc_ids
#                            stay far below int64 overflow)
MIX_HASH_MOD = 1 << 32


def corpus_mix_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select a maximal non-upsampled training mix hitting per-domain
    token proportions: source srcK is weighted (K+1)/210. Emits the
    selected documents with their domain budget.

    Scale: one narrow token-count projection; domain totals are a
    20-row aggregate (broadcast); the per-domain running sum is the
    distributed two-pass scheme (range shuffle + partition-local
    windows + broadcast offsets) — no collect of the corpus, no
    unpartitioned window; the budget filter is a broadcast join."""
    from ru_cdc_spark.operators.rankops import grouped_running_sum

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = (docs.select(
        "doc_id", "source",
        F.size(words_col(F.col("text"))).alias("n_tok"))
        .where(F.col("n_tok") > 0)
        .withColumn("w_num", F.regexp_replace(
            "source", "^src", "").cast("long") + 1)
        .withColumn("h", (F.col("doc_id") * MIX_HASH_MUL)
                    % MIX_HASH_MOD))
    avail = toks.groupBy("source", "w_num").agg(
        F.sum("n_tok").alias("t_d"))
    s_units = avail.select(F.min(F.expr(
        f"t_d * {MIX_DENOM} div w_num")).alias("s_units"))
    budgets = (avail.crossJoin(F.broadcast(s_units))
               .select("source", F.expr(
                   f"s_units * w_num div {MIX_DENOM}").alias("b")))
    cum = grouped_running_sum(
        toks, ["source"], [F.col("h").asc(), F.col("doc_id").asc()],
        ["n_tok"], prefix="cum_")
    return (cum.join(F.broadcast(budgets), "source")
            .where(F.col("cum_n_tok") <= F.col("b"))
            .select("doc_id", "source",
                    F.col("n_tok").cast("long").alias("n_tok"),
                    F.col("b").cast("long").alias("domain_budget")))


CORPUS_MIX_DOMAINS_SQL = f"""
WITH toks AS (
    SELECT doc_id, source, len({_WORDS_SQL}) AS n_tok FROM documents
), nz AS (
    SELECT doc_id, source, n_tok,
           CAST(REPLACE(source, 'src', '') AS BIGINT) + 1 AS w_num,
           (doc_id * {MIX_HASH_MUL}) % {MIX_HASH_MOD} AS h
    FROM toks WHERE n_tok > 0
), avail AS (
    SELECT source, w_num, SUM(n_tok) AS t_d FROM nz GROUP BY 1, 2
), s AS (
    SELECT MIN((t_d * {MIX_DENOM}) // w_num) AS s_units FROM avail
), budget AS (
    SELECT source, (s_units * w_num) // {MIX_DENOM} AS b
    FROM avail, s
), ordered AS (
    SELECT doc_id, source, n_tok,
           SUM(n_tok) OVER (PARTITION BY source
                            ORDER BY h, doc_id
                            ROWS UNBOUNDED PRECEDING) AS c
    FROM nz
)
SELECT o.doc_id, o.source, CAST(o.n_tok AS BIGINT) AS n_tok,
       CAST(b.b AS BIGINT) AS domain_budget
FROM ordered o JOIN budget b USING (source)
WHERE o.c <= b.b
"""


# ---------------------------------------------------------------------------
# Sequence-length bucketing (round 9): batching documents of similar
# length is how serving/fine-tuning pipelines avoid padding waste —
# each doc goes to the power-of-two bucket covering its token count,
# and the padding bill of batching at bucket width is accounted
# exactly. Pure arithmetic -> exact DuckDB oracle.
# ---------------------------------------------------------------------------


def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per power-of-two length bucket: document count, token sum, the
    padding tokens batching at bucket width would add, and the waste
    ratio. The decision artifact for choosing bucket boundaries.

    Scale: one narrow token-count projection and a ~log(max_len)-
    cardinality aggregate — map-side partials make the shuffle a few
    dozen rows regardless of corpus size."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.size(words_col(F.col("text"))).alias("n_tok")) \
        .where(F.col("n_tok") > 0)
    # smallest power of two >= n_tok, in INTEGER arithmetic on both
    # engines: Spark computes LOG2 as ln(x)/ln(2) (2^29 evaluates to
    # 29.000000000000004) while DuckDB's log2 is exact for powers of
    # two, so the float form silently diverges at exact powers >= 2^29
    # (r9 advice). bin(n-1) length == bit_length(n-1), and
    # 1 << bit_length(n-1) is the exact ceil-power-of-two for n > 1.
    bucket = F.expr(
        "CASE WHEN n_tok <= 1 THEN CAST(1 AS BIGINT) "
        "ELSE shiftleft(CAST(1 AS BIGINT), length(bin(n_tok - 1))) "
        "END")
    agg = (toks.withColumn("bucket", bucket)
           .groupBy("bucket")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_tok").alias("n_tokens")))
    pad = (F.col("bucket") * F.col("n_docs") - F.col("n_tokens"))
    return agg.select(
        "bucket", "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        pad.cast("long").alias("pad_tokens"),
        (pad / (F.col("bucket") * F.col("n_docs")))
        .alias("waste_ratio"))


CORPUS_LENGTH_BUCKETS_SQL = f"""
WITH toks AS (
    SELECT len({_WORDS_SQL}) AS n_tok FROM documents
), nz AS (SELECT n_tok FROM toks WHERE n_tok > 0),
b AS (
    SELECT CASE WHEN n_tok <= 1 THEN CAST(1 AS BIGINT)
                ELSE CAST(1 AS BIGINT) << length(bin(n_tok - 1))
           END AS bucket,
           n_tok
    FROM nz
), agg AS (
    SELECT bucket, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens
    FROM b GROUP BY bucket
)
SELECT bucket, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(bucket * n_docs - n_tokens AS BIGINT) AS pad_tokens,
       CAST(bucket * n_docs - n_tokens AS DOUBLE)
           / (bucket * n_docs) AS waste_ratio
FROM agg
"""
