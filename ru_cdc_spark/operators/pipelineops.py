"""Training-data pipeline operators: the filter → redact → sample → pack
chain a large-scale LLM data pipeline runs between raw documents and
training sequences.

All stages are narrow (per-row) or partition-local window work — nothing
here shuffles the corpus except the final mixture report (a tiny groupBy).
That is deliberate: at 100 TB these run as one fused scan per stage.

Determinism: sampling uses md5-hash buckets (identical hex in Spark and
DuckDB; first-8-hex -> int via conv/'0x' cast), packing uses exact integer
cumulative sums, and every rule threshold is integer or exact-rational.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ru_cdc_spark.operators.dedup import _WORDS_SQL, words_col
from ru_cdc_spark.operators.textops import STOPWORDS
from ru_cdc_spark.sources.readers import load_table, spread

# ---------------------------------------------------------------------------
# quality filter chain (C4/Gopher-style named rules)
# ---------------------------------------------------------------------------

# (name, fails-if) — names surface in the `reasons` audit column so a
# pipeline owner can see WHY a document was dropped, not just that it was.
_MIN_WORDS, _MAX_WORDS = 10, 200


def _rule_cols(w: Column) -> list[tuple[str, Column]]:
    n = F.size(w)
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n
    avg_len = (F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
               .cast("double") / n)
    has_stop = F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in STOPWORDS]))) > 0
    return [
        ("too_short", n < _MIN_WORDS),
        ("too_long", n > _MAX_WORDS),
        ("low_diversity", distinct_ratio < 0.25),
        ("no_stopwords", ~has_stop),
        ("odd_word_len", (avg_len < 2.5) | (avg_len > 10.0)),
    ]


def quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style filter chain with an audit trail: every document is
    kept or dropped with the comma-joined list of named rules it failed.

    Scale: pure narrow map over the scan — rules are codegen'd array
    expressions, no shuffle, no UDF. The audit column costs nothing extra
    because every rule predicate is needed for `kept` anyway.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = words_col(F.col("text"))
    base = docs.select("doc_id", "lang", w.alias("w")).where(F.size("w") > 0)
    rules = _rule_cols(F.col("w"))
    reasons = F.concat_ws(",", *[F.when(cond, F.lit(name)) for name, cond in rules])
    kept = ~rules[0][1]
    for _, cond in rules[1:]:
        kept = kept & ~cond
    return base.select("doc_id", "lang", kept.alias("kept"),
                       reasons.alias("reasons"))


_SQL_RULES = f"""
    SELECT doc_id, lang,
           len(w) < {_MIN_WORDS} AS too_short,
           len(w) > {_MAX_WORDS} AS too_long,
           CAST(len(list_distinct(w)) AS DOUBLE) / len(w) < 0.25 AS low_diversity,
           NOT len(list_intersect(w, {STOPWORDS!r})) > 0 AS no_stopwords,
           (CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) < 2.5
            OR CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) > 10.0)
               AS odd_word_len
    FROM (SELECT doc_id, lang, {_WORDS_SQL} AS w FROM documents)
    WHERE len(w) > 0
"""

QUALITY_FILTER_CHAIN_SQL = f"""
WITH r AS ({_SQL_RULES})
SELECT doc_id, lang,
       NOT (too_short OR too_long OR low_diversity OR no_stopwords OR odd_word_len)
           AS kept,
       concat_ws(',',
           CASE WHEN too_short THEN 'too_short' END,
           CASE WHEN too_long THEN 'too_long' END,
           CASE WHEN low_diversity THEN 'low_diversity' END,
           CASE WHEN no_stopwords THEN 'no_stopwords' END,
           CASE WHEN odd_word_len THEN 'odd_word_len' END) AS reasons
FROM r
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# The synthetic corpus carries no PII, so the op plants a deterministic
# email + phone per document first (identically in the oracle), then
# redacts — the regexes do real work and the comparison is meaningful.
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub (email/phone) with per-type hit counts and an md5 of
    the redacted text for audit.

    Scale: narrow codegen'd map — regexp_replace/regexp_count run JVM-side
    per row; no shuffle, no UDF. Patterns are RE2-safe (no backtracking
    blowup on adversarial documents).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    planted = F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    redacted = F.regexp_replace(
        F.regexp_replace(planted, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]")
    return docs.select(
        "doc_id",
        F.regexp_count(planted, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(planted, F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


PII_REDACTION_SQL = f"""
WITH p AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or +1-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS planted
    FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(planted, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(planted, '{_PHONE_RE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(planted, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5
FROM p
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------

_STRATUM_PCT = {"es": 50, "zh": 30}  # percent kept per lang; default below
_DEFAULT_PCT = 20


def _hash_key(key: Column) -> Column:
    """md5 first-8-hex -> non-negative int64: the engine-portable hash
    (DuckDB spells it CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) —
    stable across engines, runs, and partitioning. The ONE copy of the
    recipe; bucket/shard deriviations mod it down."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10) \
            .cast("bigint")


def _hash_bucket(key: Column) -> Column:
    """md5 bucket in [0, 100): re-running the pipeline keeps the SAME
    documents, which downstream dedup/packing relies on."""
    return _hash_key(key) % 100


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling (the mixture-rebalancing
    step of a training pipeline): keep a fixed md5-bucket slice per
    stratum, so the sample is reproducible and join-stable.

    Scale: narrow filter on the scan — no shuffle, no per-stratum pass;
    rates live in a CASE expression, not a driver-side loop.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    pct = F.lit(_DEFAULT_PCT)
    for lang, p in _STRATUM_PCT.items():
        pct = F.when(F.col("lang") == lang, F.lit(p)).otherwise(pct)
    return (
        docs.where(_hash_bucket(F.col("doc_id")) < pct)
        .select("doc_id", "lang", "source", "n_chars")
    )


_PCT_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {p}" for lang, p in _STRATUM_PCT.items()
) + f" ELSE {_DEFAULT_PCT} END"

STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
      < {_PCT_CASE}
"""


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------

_SEQ_LEN = 256


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing: within each (lang, source)
    shard, documents are concatenated in doc_id order and cut into
    fixed-length training sequences; each document learns which sequence
    it starts in and at what token offset.

    seq_id = floor(cum_tokens_before / L), seq_offset = cum % L — exact
    integer window math, no iteration.

    Scale: ONE shuffle to co-locate each (lang, source) shard, then a
    partition-local running sum. With few huge shards you'd salt the shard
    key into ranges and two-phase the prefix sum (per-range totals are a
    tiny second pass); the operator keys on (lang, source) here because
    that is the corpus's natural sharding.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_tok = F.size(words_col(F.col("text")))
    w = (Window.partitionBy("lang", "source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.select("doc_id", "lang", "source", n_tok.alias("n_tokens"))
        .where(F.col("n_tokens") > 0)
        .select("doc_id", "lang", "source", "n_tokens",
                (cum_before / _SEQ_LEN).cast("bigint").alias("seq_id"),
                (cum_before % _SEQ_LEN).alias("seq_offset"))
    )


SEQUENCE_PACKING_SQL = f"""
WITH t AS (
    SELECT doc_id, lang, source, len({_WORDS_SQL}) AS n_tokens
    FROM documents
), c AS (
    SELECT *, COALESCE(SUM(n_tokens) OVER (
        PARTITION BY lang, source ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM t WHERE n_tokens > 0
)
SELECT doc_id, lang, source, n_tokens,
       CAST(floor(cum_before / {_SEQ_LEN}) AS BIGINT) AS seq_id,
       CAST(cum_before % {_SEQ_LEN} AS BIGINT) AS seq_offset
FROM c
"""


# ---------------------------------------------------------------------------
# token mixture report
# ---------------------------------------------------------------------------


def token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budget per (lang, source) with corpus share — the mixture
    table a pipeline owner reads before setting sampling weights.

    Scale: map-side partial agg to |lang x source| rows, then one
    broadcast scalar for the total. The share division happens on exact
    integer token counts, so the doubles agree cross-engine.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "lang", "source", F.size(words_col(F.col("text"))).alias("n_tokens"))
    per = toks.groupBy("lang", "source").agg(
        F.sum("n_tokens").alias("tokens"), F.count("*").alias("docs"))
    total = per.agg(F.sum("tokens").alias("total"))
    return (
        per.crossJoin(F.broadcast(total))
        .select("lang", "source", "tokens", "docs",
                F.round(F.col("tokens").cast("double") / F.col("total"), 6)
                 .alias("share"))
    )


TOKEN_MIXTURE_SQL = f"""
WITH per AS (
    SELECT lang, source, SUM(len({_WORDS_SQL})) AS tokens, COUNT(*) AS docs
    FROM documents GROUP BY lang, source
)
SELECT lang, source, CAST(tokens AS BIGINT) AS tokens, docs,
       round(CAST(tokens AS DOUBLE)
             / CAST((SELECT SUM(tokens) FROM per) AS DOUBLE), 6) AS share
FROM per
"""


# ---------------------------------------------------------------------------
# per-group cap sampling (domain caps)
# ---------------------------------------------------------------------------

_GROUP_CAP = 40


def capped_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at N documents — the "no domain dominates" rule.
    Deterministic reservoir: rank by md5(doc_id) within the group and keep
    the first N, so re-runs (and the oracle) pick the same documents and
    the choice is unbiased w.r.t. document order.

    Scale: one shuffle on the group key; the window ranks within each
    group only. For heavy-hitter groups at 100 TB, pre-filter with an
    approximate per-group count and sample only oversized groups.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", "source")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= _GROUP_CAP)
        .select("doc_id", "lang", "source")
    )


CAPPED_PER_SOURCE_SQL = f"""
SELECT doc_id, lang, source FROM (
    SELECT doc_id, lang, source,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
    FROM documents
) WHERE rn <= {_GROUP_CAP}
"""


# ---------------------------------------------------------------------------
# corpus snapshot diff (CDC for corpora)
# ---------------------------------------------------------------------------


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two corpus snapshots into an INSERT/UPDATE/DELETE change set —
    the corpus-refresh analog of the engine's CDC diff. Snapshots are
    derived deterministically here (old = doc_id % 10 != 0 with a text
    tweak on % 7, new = the corpus); in production both sides are dated
    parquet roots.

    Content equality compares md5, not the text itself — at 100 TB the
    full outer join then moves 16-byte digests, not documents.

    Scale: one full outer join hashed on doc_id (both sides co-partition);
    everything else is narrow.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    new = docs.select("doc_id", F.md5(F.col("text")).alias("h_new"))
    old = (
        docs.where(F.col("doc_id") % 10 != 0)
        .select("doc_id",
                F.md5(F.when(F.col("doc_id") % 7 == 0,
                             F.concat(F.col("text"), F.lit(" v1")))
                       .otherwise(F.col("text"))).alias("h_old"))
    )
    j = old.join(new, "doc_id", "full_outer")
    change = (
        F.when(F.col("h_old").isNull(), F.lit("INSERT"))
        .when(F.col("h_new").isNull(), F.lit("DELETE"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("UPDATE"))
    )
    return (
        j.select("doc_id", change.alias("change"), "h_old", "h_new")
        .where(F.col("change").isNotNull())
    )


CORPUS_SNAPSHOT_DIFF_SQL = """
WITH new AS (
    SELECT doc_id, md5(text) AS h_new FROM documents
), old AS (
    SELECT doc_id,
           md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v1' ELSE text END) AS h_old
    FROM documents WHERE doc_id % 10 <> 0
), j AS (
    SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id, h_old, h_new
    FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
)
SELECT doc_id,
       CASE WHEN h_old IS NULL THEN 'INSERT'
            WHEN h_new IS NULL THEN 'DELETE'
            WHEN h_old <> h_new THEN 'UPDATE' END AS change,
       h_old, h_new
FROM j
WHERE h_old IS NULL OR h_new IS NULL OR h_old <> h_new
"""


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

_CONTAM_N = 8       # n-gram length for overlap detection
_EVAL_MOD = 97      # eval set = doc_id % 97 == 0 (deterministic stand-in)


def decontaminate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: count distinct 8-gram collisions
    between every training document and the eval set's n-gram table, the
    standard pre-training decontamination gate.

    Scale: the eval n-gram table is tiny (benchmarks are MBs, the corpus
    is TBs) — broadcast it; the training side explodes to distinct n-grams
    (bounded per doc) and the only wide op is a broadcast semi-ish join +
    per-doc count. Training docs in the eval set are excluded.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    wc = F.col("w")
    # slice + array_join instead of per-position element_at chains: one
    # array view per gram vs _CONTAM_N random accesses — ~5x faster here
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(wc) - (_CONTAM_N - 1)),
        lambda i: F.array_join(F.slice(wc, i, _CONTAM_N), " "),
    ))
    base = (docs.select("doc_id", words_col(F.col("text")).alias("w"))
            .where(F.size("w") >= _CONTAM_N)
            .select("doc_id", grams.alias("grams")))
    eval_grams = (
        base.where(F.col("doc_id") % _EVAL_MOD == 0)
        .select(F.explode("grams").alias("gram")).distinct()
    )
    train = (base.where(F.col("doc_id") % _EVAL_MOD != 0)
             .select("doc_id", F.explode("grams").alias("gram")))
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_grams"))
    )


_GRAM_JOIN = " || ' ' || ".join(f"w[i+{j}]" for j in range(_CONTAM_N))

DECONTAMINATE_REPORT_SQL = f"""
WITH base AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, len(w) - {_CONTAM_N - 2}),
               i -> {_GRAM_JOIN})) AS grams
    FROM (SELECT doc_id, {_WORDS_SQL} AS w FROM documents)
    WHERE len(w) >= {_CONTAM_N}
), eval_grams AS (
    SELECT DISTINCT unnest(grams) AS gram FROM base
    WHERE doc_id % {_EVAL_MOD} = 0
), train AS (
    SELECT doc_id, unnest(grams) AS gram FROM base
    WHERE doc_id % {_EVAL_MOD} <> 0
)
SELECT doc_id, COUNT(*) AS n_contaminated_grams
FROM train JOIN eval_grams USING (gram)
GROUP BY doc_id
"""


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment via md5 buckets of
    doc_id, reported per (lang, split) — the reproducible corpus split
    every training run depends on. Re-running the pipeline (or adding new
    documents) never moves an existing document between splits.

    Scale: the assignment is a narrow hash expression on the scan (no
    shuffle, no global sort, no sampling pass); only the tiny report
    aggregate shuffles. The same expression tags the full corpus at
    100 TB as a write-time column.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = _hash_bucket(F.col("doc_id"))
    split = (F.when(b < 80, "train")
             .when(b < 90, "val")
             .otherwise("test"))
    return (
        docs.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"))
    )


TRAIN_VAL_TEST_SPLIT_SQL = """
WITH tagged AS (
    SELECT lang, n_chars,
           CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
)
SELECT lang, split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM tagged GROUP BY 1, 2
"""


# ===========================================================================
# deterministic shuffle-sharding (epoch-stable training-shard writer)
# ===========================================================================

SHUFFLE_N_SHARDS = 8
SHUFFLE_SEED = "epoch0"


def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: every document
    gets a seeded hash key, lands in shard = key mod N, and takes its
    position from the key order WITHIN the shard — the exact layout a
    shard-writing pass materializes before training. Seeded, so the
    epoch permutation is reproducible across reruns and resumable
    mid-write; changing the seed string reshuffles every epoch.

    Scale: NO global sort (the naive take — row_number over the whole
    corpus — funnels 100 TB through one reducer). One hash-partition
    exchange on shard + a within-partition sort; each shard's order is
    still globally deterministic because the seeded key, not arrival
    order, defines it."""
    docs = load_table(spark, sf_dir, "documents")
    key = _hash_key(F.concat(F.lit(SHUFFLE_SEED + ":"),
                             F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (docs.select("doc_id", key.alias("shuffle_key"))
            .withColumn("shard",
                        (F.col("shuffle_key") % SHUFFLE_N_SHARDS)
                        .cast("int"))
            .select("doc_id", "shard",
                    F.row_number().over(w).alias("pos")))


CORPUS_SHUFFLE_SHARDS_SQL = f"""
WITH keyed AS (
    SELECT doc_id,
           CAST('0x' || substr(md5('{SHUFFLE_SEED}:'
                                   || CAST(doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) AS shuffle_key
    FROM documents
)
SELECT doc_id,
       CAST(shuffle_key % {SHUFFLE_N_SHARDS} AS INTEGER) AS shard,
       CAST(row_number() OVER (
           PARTITION BY shuffle_key % {SHUFFLE_N_SHARDS}
           ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
FROM keyed
"""


# ===========================================================================
# boilerplate paragraph removal (CCNet-style corpus cleaning)
# ===========================================================================

BOILERPLATE_CHUNK_WORDS = 10
BOILERPLATE_MIN_DOCS = 3


def _chunks_col(w: Column) -> Column:
    """Non-overlapping 10-word windows of a word array — the paragraph
    stand-in for corpora without structural separators. Spark slice is
    1-based; sequence is inclusive, so guard the empty doc."""
    n_chunks = F.ceil(F.size(w) / BOILERPLATE_CHUNK_WORDS).cast("int")
    return F.when(F.size(w) == 0, F.array().cast("array<string>")) \
        .otherwise(F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda c: F.array_join(
                F.slice(w, c * BOILERPLATE_CHUNK_WORDS + 1,
                        BOILERPLATE_CHUNK_WORDS), " ")))


def _chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(_chunks_col(words_col(F.col("text"))))
        .alias("cidx", "chunk"))


def corpus_boilerplate_chunks(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Boilerplate detection at paragraph granularity (the CCNet /
    Gopher corpus-cleaning step): a chunk repeated across >= K distinct
    documents is template text (headers, footers, nav), not content.

    Scale: chunking is a narrow map; the only shuffle is a uniform
    hash aggregate on the chunk text with map-side partial
    count_distinct — the same shape as exact dedup, at ~1/10 the key
    count of word-level aggregation."""
    return (_chunked(spark, sf_dir)
            .groupBy("chunk")
            .agg(F.count_distinct("doc_id").alias("n_docs"))
            .where(F.col("n_docs") >= BOILERPLATE_MIN_DOCS))


CORPUS_BOILERPLATE_CHUNKS_SQL = f"""
WITH words AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
chunks AS (
    SELECT doc_id,
           unnest(list_transform(
               range(0, CAST(ceil(len(w) / 10.0) AS BIGINT)),
               c -> array_to_string(w[c*10+1 : c*10+10], ' '))) AS chunk
    FROM words)
SELECT chunk, COUNT(DISTINCT doc_id) AS n_docs FROM chunks
GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
"""


def corpus_boilerplate_strip(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Documents reassembled WITHOUT their boilerplate chunks — the
    apply step of template removal, keeping in-document chunk order.

    Scale: the boilerplate set is tiny by construction (chunks repeated
    across documents), so the anti join broadcasts; reassembly is one
    doc_id shuffle with an order-preserving collect_list over (cidx,
    chunk) structs. Documents that are PURE boilerplate drop out —
    exactly what the curation step intends."""
    chunked = _chunked(spark, sf_dir)
    boiler = (chunked.groupBy("chunk")
              .agg(F.count_distinct("doc_id").alias("n_docs"))
              .where(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
              .select("chunk"))
    kept = chunked.join(F.broadcast(boiler), "chunk", "left_anti")
    return (kept.groupBy("doc_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("cidx", "chunk"))),
                    lambda s: s["chunk"]), " ").alias("clean_text"),
                F.count("*").alias("n_kept_chunks")))


CORPUS_BOILERPLATE_STRIP_SQL = f"""
WITH words AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
chunks AS (
    SELECT doc_id,
           unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS cidx,
           unnest(list_transform(
               range(0, CAST(ceil(len(w) / 10.0) AS BIGINT)),
               c -> array_to_string(w[c*10+1 : c*10+10], ' '))) AS chunk
    FROM words),
boiler AS (
    SELECT chunk FROM chunks GROUP BY 1
    HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS})
SELECT doc_id,
       array_to_string(list(chunk ORDER BY cidx), ' ') AS clean_text,
       COUNT(*) AS n_kept_chunks
FROM chunks WHERE chunk NOT IN (SELECT chunk FROM boiler)
GROUP BY doc_id
"""


# ===========================================================================
# unicode normalization (corpus cleaning)
# ===========================================================================


def corpus_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization + control-character strip — the
    canonicalization step every multilingual corpus pipeline runs
    before dedup (composed vs decomposed accents hash differently;
    stray C0/C1 controls poison tokenizers).

    Python's unicodedata applies NFC inside Arrow batches; the DuckDB
    oracle uses its native nfc_normalize, so the two INDEPENDENT
    implementations must agree byte-for-byte — a cross-engine proof of
    the normalization itself, not just of plumbing."""
    import unicodedata

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")

    def op(batches):
        for pdf in batches:
            norm = [
                "".join(ch for ch in unicodedata.normalize("NFC", t)
                        if unicodedata.category(ch) != "Cc"
                        or ch in "\t\n\r")
                for t in pdf["text"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "norm_text": norm,
                "n_chars_norm": [len(t) for t in norm]})

    return (docs.select("doc_id", "text")
            .mapInPandas(op, "doc_id long, norm_text string, "
                             "n_chars_norm long"))


CORPUS_NFC_NORMALIZE_SQL = """
SELECT doc_id,
       regexp_replace(nfc_normalize(text),
                      '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '',
                      'g') AS norm_text,
       length(regexp_replace(nfc_normalize(text),
              '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))
           AS n_chars_norm
FROM documents
"""
