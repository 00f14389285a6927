"""Text-analysis operators for LLM-training-data pipelines.

Language ID (marker-word scoring), quality scoring (length/punct/stopword
ratios), token counting (whitespace + regex BPE-ish), and document
fingerprinting (min-hash of char 5-grams, the winnowing-style shape).

All ratios are exact integer rationals evaluated in double — identical
across engines; hashes are md5.

Scale: every operator is a narrow per-row projection (regex + array ops in
codegen); nothing shuffles except the optional corpus-level rollups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ru_cdc_spark.operators.dedup import words_col, _WORDS_CTE, _WORDS_SQL
from ru_cdc_spark.sources.readers import load_table, spread

# marker stopwords per language — deliberately tiny; deterministic argmax
# with lexicographic tiebreak. (A real lang-id uses char-ngram profiles;
# this keeps the operator shape while staying oracle-checkable.)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "a", "and", "is", "of"],
    "es": ["el", "la", "los", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de5", "le5", "shi4", "zai4", "he2"],
}

STOPWORDS = ["the", "a", "and", "is", "of", "to", "in", "it"]

# BPE-ish tokenizer: letter runs, digit runs, or single non-space symbols
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats surface: word/char counts, distinct ratio, average
    word length, stopword ratio — the quality-signal raw material."""
    docs = load_table(spark, sf_dir, "documents")
    # tokenize ONCE in its own projection (r13): the stats expressions
    # below reference the words array seven times, several through
    # interpreted higher-order functions with no codegen CSE, so
    # inlining words_col would re-tokenize every document per
    # expression. CollapseProject keeps the alias un-collapsed
    # (non-cheap, referenced more than once). No spread: the scan is
    # already wide enough here and the exchange measurably loses
    # (A/B'd 0.62/1j vs 0.70/2j warm at sf0.1).
    toks = docs.select(
        "doc_id", "lang", "source",
        F.length("text").alias("n_chars_actual"),
        words_col(F.col("text")).alias("w"))
    w = F.col("w")
    n_words = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    total_len = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return toks.select(
        "doc_id", "lang", "source", "n_chars_actual",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        (n_distinct.cast("double") / n_words).alias("distinct_ratio"),
        (total_len.cast("double") / n_words).alias("avg_word_len"),
        (n_stop.cast("double") / n_words).alias("stopword_ratio"),
    ).where(n_words > 0)


TEXT_STATS_SQL = f"""
WITH w AS (SELECT doc_id, lang, source, text, {_WORDS_SQL} AS words FROM documents)
SELECT doc_id, lang, source,
       length(text) AS n_chars_actual,
       len(words) AS n_words,
       len(list_distinct(words)) AS n_distinct_words,
       CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS distinct_ratio,
       CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
           / len(words) AS avg_word_len,
       CAST(len(list_filter(words, x -> list_contains({STOPWORDS!r}, x))) AS DOUBLE)
           / len(words) AS stopword_ratio
FROM w WHERE len(words) > 0
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: score = |doc words ∩ markers(lang)| per
    language; argmax with lexicographic tiebreak; 'und' when all scores 0."""
    docs = load_table(spark, sf_dir, "documents")
    # tokenize+dedupe ONCE in its own projection (r13, same reasoning
    # as text_stats): the per-language score filters are interpreted
    # higher-order functions, so inlining the words derivation would
    # re-tokenize every document once per language
    toks = docs.select(
        "doc_id", F.col("lang").alias("declared_lang"),
        F.array_distinct(words_col(F.col("text"))).alias("dw"))
    w = F.col("dw")
    scores = [
        F.size(F.filter(w, lambda x: x.isin(*markers))).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = toks.select("doc_id", "declared_lang", *scores)
    best_score = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_MARKERS)])
    predicted = F.lit("und")
    # reverse-lexicographic fold so earlier languages win ties
    for lang in sorted(LANG_MARKERS, reverse=True):
        predicted = F.when(
            (F.col(f"score_{lang}") == best_score) & (best_score > 0), F.lit(lang)
        ).otherwise(predicted)
    return scored.select("doc_id", "declared_lang",
                         predicted.alias("predicted_lang"),
                         best_score.alias("best_score"))


def _lang_id_sql() -> str:
    score_exprs = ",\n".join(
        f"       len(list_filter(dw, x -> list_contains({markers!r}, x))) AS score_{lang}"
        for lang, markers in sorted(LANG_MARKERS.items())
    )
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{la}" for la in langs) + ")"
    case = "CASE "
    for la in langs:
        case += f"WHEN score_{la} = {best} AND {best} > 0 THEN '{la}' "
    case += "ELSE 'und' END"
    return f"""
WITH dw AS (
    SELECT doc_id, lang AS declared_lang,
           list_distinct({_WORDS_SQL}) AS dw
    FROM documents
),
scored AS (
    SELECT doc_id, declared_lang,
{score_exprs}
    FROM dw
)
SELECT doc_id, declared_lang, {case} AS predicted_lang,
       {best} AS best_score
FROM scored
"""


LANG_ID_SQL = _lang_id_sql()


# per-language character-bigram profiles (tiny, deterministic stand-ins for
# trained profiles; the operator shape — profile overlap scoring — is the
# real thing)
LANG_BIGRAM_PROFILES: dict[str, list[str]] = {
    "de": ["ch", "ei", "en", "er", "sc"],
    "en": ["th", "he", "in", "er", "an"],
    "es": ["de", "la", "os", "en", "el"],
    "fr": ["le", "es", "en", "ou", "qu"],
    "zh": ["zh", "sh", "ng", "ia", "uo"],
}


def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-n-gram language ID (the classic textcat/CLD shape): count how
    many of the doc's distinct character bigrams hit each language's
    profile; argmax with lexicographic tiebreak, 'und' on zero.

    Scale: narrow per-row array math (bigram set vs literal profiles)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z]", " ")
    base = docs.select("doc_id", F.col("lang").alias("declared_lang"),
                       norm.alias("nm"))
    nm = F.col("nm")
    bigrams = F.array_distinct(F.filter(
        F.transform(F.sequence(F.lit(1), F.length(nm) - 1),
                    lambda i: nm.substr(i, F.lit(2))),
        lambda g: ~g.contains(" "),
    ))
    with_grams = base.select("doc_id", "declared_lang", bigrams.alias("g"))

    def score(lang: str):
        profile = LANG_BIGRAM_PROFILES[lang]
        return F.size(F.filter(F.col("g"), lambda x: x.isin(*profile))) \
            .alias(f"score_{lang}")

    langs = sorted(LANG_BIGRAM_PROFILES)
    scored = with_grams.select("doc_id", "declared_lang",
                               *[score(lang) for lang in langs])
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    predicted = F.lit("und")
    for lang in reversed(langs):
        predicted = F.when((F.col(f"score_{lang}") == best) & (best > 0),
                           F.lit(lang)).otherwise(predicted)
    return scored.select("doc_id", "declared_lang",
                         predicted.alias("predicted_lang"),
                         best.alias("best_score"))


def _lang_id_ngram_sql() -> str:
    langs = sorted(LANG_BIGRAM_PROFILES)
    score_exprs = ",\n".join(
        f"       len(list_filter(g, x -> list_contains("
        f"{LANG_BIGRAM_PROFILES[lang]!r}, x))) AS score_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"score_{la}" for la in langs) + ")"
    case = "CASE "
    for la in langs:
        case += f"WHEN score_{la} = {best} AND {best} > 0 THEN '{la}' "
    case += "ELSE 'und' END"
    return f"""
WITH n AS (
    SELECT doc_id, lang AS declared_lang,
           regexp_replace(lower(text), '[^a-z]', ' ', 'g') AS nm
    FROM documents
),
g AS (
    SELECT doc_id, declared_lang,
           list_distinct(list_filter(
               list_transform(range(1, length(nm)), i -> substr(nm, i, 2)),
               x -> NOT contains(x, ' '))) AS g
    FROM n
),
scored AS (
    SELECT doc_id, declared_lang,
{score_exprs}
    FROM g
)
SELECT doc_id, declared_lang, {case} AS predicted_lang, {best} AS best_score
FROM scored
"""


LANG_ID_NGRAM_SQL = _lang_id_ngram_sql()


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval confusion matrix over the LABELED corpus (round
    10): the n-gram language-ID's predictions vs the documents table's
    declared labels — one row per (declared, predicted) pair with its
    count and the declared label's total, the drift artifact a corpus
    pipeline tracks per ingestion batch (a labeler whose agreement
    falls between snapshots is the first sign the source mix shifted).

    Scale: the per-row scorer plus one low-cardinality (|langs|^2 max)
    aggregate — map-side partials make the shuffle a handful of rows."""
    scored = lang_id_ngram(spark, sf_dir)
    totals = Window.partitionBy("declared_lang")
    return (scored.groupBy("declared_lang", "predicted_lang")
            .agg(F.count("*").alias("n_docs"))
            .withColumn("declared_total",
                        F.sum("n_docs").over(totals))
            .select("declared_lang", "predicted_lang", "n_docs",
                    F.col("declared_total").cast("long")
                    .alias("declared_total")))


LANG_ID_CONFUSION_SQL = f"""
WITH scored AS ({LANG_ID_NGRAM_SQL})
SELECT declared_lang, predicted_lang,
       COUNT(*) AS n_docs,
       CAST(SUM(COUNT(*)) OVER (PARTITION BY declared_lang)
            AS BIGINT) AS declared_total
FROM scored
GROUP BY declared_lang, predicted_lang
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (Gopher/C4-style signals, simplified):
    penalize too-short/too-long docs, low distinct ratio, zero stopwords.
    Score in [0,1] as an exact rational; keep/drop flag at 0.5."""
    stats = text_stats(spark, sf_dir)
    length_ok = (F.col("n_words") >= 15) & (F.col("n_words") <= 80)
    # integer points / 10 so the double is exact and engine-identical
    pts = (
        F.when(length_ok, F.lit(4)).otherwise(F.lit(0))
        + F.when(F.col("distinct_ratio") >= 0.3, F.lit(3)).otherwise(F.lit(0))
        + F.when(F.col("stopword_ratio") > 0, F.lit(2)).otherwise(F.lit(0))
        + F.when(F.col("avg_word_len") >= 3, F.lit(1)).otherwise(F.lit(0))
    )
    quality = pts.cast("double") / 10.0
    return stats.select(
        "doc_id", quality.alias("quality"),
        (pts >= 5).alias("keep"),
    )


QUALITY_SCORE_SQL = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words, text FROM documents),
stats AS (
    SELECT doc_id,
           len(words) AS n_words,
           CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS distinct_ratio,
           CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
               / len(words) AS avg_word_len,
           CAST(len(list_filter(words, x -> list_contains({STOPWORDS!r}, x))) AS DOUBLE)
               / len(words) AS stopword_ratio
    FROM w WHERE len(words) > 0
)
, pts AS (
    SELECT doc_id,
           (CASE WHEN n_words BETWEEN 15 AND 80 THEN 4 ELSE 0 END)
         + (CASE WHEN distinct_ratio >= 0.3 THEN 3 ELSE 0 END)
         + (CASE WHEN stopword_ratio > 0 THEN 2 ELSE 0 END)
         + (CASE WHEN avg_word_len >= 3 THEN 1 ELSE 0 END) AS p
    FROM stats
)
SELECT doc_id, CAST(p AS DOUBLE) / 10.0 AS quality, p >= 5 AS keep FROM pts
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    (letter runs / digit runs / single symbols) — the usual budget metric
    for training-data sizing."""
    docs = load_table(spark, sf_dir, "documents")
    ws_tokens = F.size(words_col(F.col("text")))
    bpe_tokens = F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                             F.lit(TOKEN_REGEX), F.lit(0)))
    return docs.select(
        "doc_id",
        ws_tokens.alias("ws_tokens"),
        bpe_tokens.alias("bpe_tokens"),
        (F.length("text").cast("double") / bpe_tokens).alias("chars_per_token"),
    ).where(bpe_tokens > 0)


TOKEN_COUNTS_SQL = f"""
WITH t AS (
    SELECT doc_id, text,
           len({_WORDS_SQL}) AS ws_tokens,
           len(regexp_extract_all(lower(text), '{TOKEN_REGEX}')) AS bpe_tokens
    FROM documents
)
SELECT doc_id, ws_tokens, bpe_tokens,
       CAST(length(text) AS DOUBLE) / bpe_tokens AS chars_per_token
FROM t WHERE bpe_tokens > 0
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: min md5 over char 5-grams of the
    normalized text (the winnowing/min-hash shape at window = whole doc),
    plus the full-text hash. Fingerprint collisions across docs signal
    boilerplate overlap."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize norm once — referencing the regexp_replace expression
    # inside the per-gram lambda would re-run the regex per element
    normed = spread(docs).select(
        "doc_id",
        F.regexp_replace(F.lower(F.col("text")), r"\s+", " ").alias("norm"),
    )
    norm = F.col("norm")
    grams = F.transform(
        F.sequence(F.lit(1), F.length(norm) - 4),
        lambda i: norm.substr(i, F.lit(5)),
    )
    return normed.select(
        "doc_id",
        F.md5(norm).alias("full_hash"),
        F.array_min(F.transform(grams, F.md5)).alias("min_gram_hash"),
    ).where(F.length(norm) >= 5)


def tfidf_top_terms(spark: SparkSession, sf_dir: str, top_k: int = 3) -> DataFrame:
    """TF-IDF-style top terms per document, with a rational score
    (tf x N/df computed as an exact integer ratio — no logarithms, whose
    last-ulp platform differences would break cross-engine ranking):

        score = (term_count_in_doc * N_docs) / (doc_len * docs_with_term)

    Scale: the explode + (doc, word) count is one shuffle; document
    frequency is a broadcastable word-level aggregate; ranking partitions
    by doc. The inverted-index/feature-extraction shape for search and
    clustering pipelines.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    doc_len = words.groupBy("doc_id").agg(F.count("*").alias("doc_len"))
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))

    from pyspark.sql import Window
    scored = (
        tf.join(doc_len, "doc_id")
        .join(F.broadcast(df_), "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "word",
            ((F.col("tf") * F.col("n_docs")).cast("double")
             / (F.col("doc_len") * F.col("df")).cast("double")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("word").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


TFIDF_TOP_TERMS_SQL = _WORDS_CTE + """,
exploded AS (SELECT doc_id, unnest(w) AS word FROM words),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM exploded GROUP BY 1, 2),
doc_len AS (SELECT doc_id, COUNT(*) AS doc_len FROM exploded GROUP BY 1),
dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
SELECT doc_id, word, score, rank FROM (
    SELECT tf.doc_id, tf.word,
           CAST(tf.tf * n.n_docs AS DOUBLE)
               / CAST(doc_len.doc_len * dfreq.df AS DOUBLE) AS score,
           row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE)
                        / CAST(doc_len.doc_len * dfreq.df AS DOUBLE) DESC,
                        tf.word ASC) AS rank
    FROM tf JOIN doc_len USING (doc_id) JOIN dfreq USING (word), n
)
WHERE rank <= 3
"""


def posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: per word, the sorted posting list of documents
    (joined to a string for engine-stable comparison) + document
    frequency. The search-index build step.

    Scale: one shuffle on the word; posting lists for stop-words are the
    skew hazard — production caps or tiers them (the df column is the
    signal)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("word"))
    return (
        words.groupBy("word")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.array_join(F.array_sort(F.collect_set("doc_id")), ",").alias("postings"),
        )
    )


POSTING_LISTS_SQL = _WORDS_CTE + """,
exploded AS (SELECT doc_id, unnest(w) AS word FROM words)
SELECT word, COUNT(DISTINCT doc_id) AS df,
       array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
FROM exploded GROUP BY word
"""


WINNOW_K = 5   # char k-gram size
WINNOW_W = 10  # winnowing window (min of each w consecutive gram hashes)


def doc_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken '03): hash char
    k-grams, keep the min hash of every w-gram window, emit the distinct
    sorted fingerprint set. Guarantees a shared fingerprint for any
    sufficiently long common substring — the plagiarism/boilerplate
    detector shape.

    Scale: per-row array ops in codegen; output is a bounded fingerprint
    set per doc (corpus-level matching joins on exploded fingerprints).
    """
    docs = load_table(spark, sf_dir, "documents")
    normed = spread(docs).select(
        "doc_id",
        F.regexp_replace(F.lower(F.col("text")), r"\s+", " ").alias("norm"),
    ).where(F.length("norm") >= WINNOW_K + WINNOW_W - 1)
    norm = F.col("norm")
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.length(norm) - (WINNOW_K - 1)),
        lambda i: F.md5(norm.substr(i, F.lit(WINNOW_K))),
    )
    with_h = normed.select("doc_id", gram_hashes.alias("h"))
    windows_min = F.transform(
        F.sequence(F.lit(1), F.size("h") - (WINNOW_W - 1)),
        lambda i: F.array_min(F.slice("h", i, WINNOW_W)),
    )
    return with_h.select(
        "doc_id",
        F.array_sort(F.array_distinct(windows_min)).alias("fingerprints"),
    ).select("doc_id", F.size("fingerprints").alias("n_fingerprints"),
             F.col("fingerprints")[0].alias("first_fp"),
             F.element_at("fingerprints", -1).alias("last_fp"))


DOC_WINNOWING_SQL = f"""
WITH n AS (
    SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
    FROM documents
    WHERE length(regexp_replace(lower(text), '\\s+', ' ', 'g')) >= {WINNOW_K + WINNOW_W - 1}
),
h AS (
    SELECT doc_id,
           list_transform(range(1, length(norm) - {WINNOW_K - 2}),
                          i -> md5(substr(norm, i, {WINNOW_K}))) AS h
    FROM n
),
fp AS (
    SELECT doc_id,
           list_sort(list_distinct(
               list_transform(range(1, len(h) - {WINNOW_W - 2}),
                              i -> list_min(h[i:i+{WINNOW_W - 1}])))) AS fingerprints
    FROM h
)
SELECT doc_id, len(fingerprints) AS n_fingerprints,
       fingerprints[1] AS first_fp, fingerprints[-1] AS last_fp
FROM fp
"""


DOC_FINGERPRINT_SQL = """
WITH n AS (
    SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
    FROM documents
)
SELECT doc_id, md5(norm) AS full_hash,
       list_min(list_transform(range(1, length(norm) - 3),
                i -> md5(substr(norm, i, 5)))) AS min_gram_hash
FROM n WHERE length(norm) >= 5
"""


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: the share of bigram
    occurrences taken by the single most frequent bigram, and the fraction
    of trigram occurrences whose trigram appears more than once.

    Both are strong boilerplate/spam indicators for training-data
    filtering (the reference has no text surface at all — north-star op).

    Scale: the raw documents are repartitioned by doc_id BEFORE the gram
    explode — hashpartitioning(doc_id) satisfies the clustered
    distribution of every downstream grouping key (doc_id, ...), so the
    whole three-level aggregate runs with exactly ONE exchange, and the
    bytes shuffled are the compact (doc_id, words) rows rather than the
    ~2L exploded gram rows. doc_id is unique, so the shuffle cannot skew.
    """
    docs = load_table(spark, sf_dir, "documents")

    def grams(k: int):
        w = F.col("w")
        return F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(k)]),
        )

    base = docs.select("doc_id", words_col(F.col("text")).alias("w")) \
               .where(F.size("w") >= 3).repartition("doc_id")
    tagged = F.concat(
        F.transform(grams(2), lambda g: F.struct(F.lit("bg").alias("kind"),
                                                 g.alias("gram"))),
        F.transform(grams(3), lambda g: F.struct(F.lit("tg").alias("kind"),
                                                 g.alias("gram"))),
    )
    ex = base.select("doc_id", F.explode(tagged).alias("g")) \
             .select("doc_id", F.col("g.kind").alias("kind"),
                     F.col("g.gram").alias("gram"))
    counts = ex.groupBy("doc_id", "kind", "gram").agg(F.count("*").alias("cnt"))
    per = counts.groupBy("doc_id", "kind").agg(
        F.max("cnt").alias("mx"),
        F.sum("cnt").alias("tot"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(F.lit(0))).alias("dup"),
    )
    return per.groupBy("doc_id").agg(
        F.max(F.when(F.col("kind") == "bg",
                     F.col("mx").cast("double") / F.col("tot").cast("double"))
              ).alias("top_bigram_share"),
        F.max(F.when(F.col("kind") == "tg",
                     F.col("dup").cast("double") / F.col("tot").cast("double"))
              ).alias("dup_trigram_frac"),
    )


REPETITION_SIGNALS_SQL = f"""
WITH words AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
grams AS (
    SELECT doc_id, 'bg' AS kind,
           unnest(list_transform(range(1, len(w)),
                  i -> w[i] || ' ' || w[i+1])) AS gram
    FROM words WHERE len(w) >= 3
    UNION ALL
    SELECT doc_id, 'tg' AS kind,
           unnest(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
    FROM words WHERE len(w) >= 3
),
counts AS (
    SELECT doc_id, kind, gram, COUNT(*) AS cnt FROM grams GROUP BY 1, 2, 3
),
per AS (
    SELECT doc_id, kind, MAX(cnt) AS mx, SUM(cnt) AS tot,
           COALESCE(SUM(cnt) FILTER (WHERE cnt >= 2), 0) AS dup
    FROM counts GROUP BY 1, 2
)
SELECT doc_id,
       MAX(CASE WHEN kind = 'bg'
                THEN CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE) END)
           AS top_bigram_share,
       MAX(CASE WHEN kind = 'tg'
                THEN CAST(dup AS DOUBLE) / CAST(tot AS DOUBLE) END)
           AS dup_trigram_frac
FROM per GROUP BY doc_id
"""


def corpus_top_terms(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """Corpus-level heavy hitters: the k most frequent words with exact
    counts (vocabulary head — the input to tokenizer/stopword decisions).

    Scale: two-level aggregate — map-side partial counts collapse
    within-partition repeats before the (uniform, high-cardinality) word
    shuffle; the global top-k is TakeOrderedAndProject over the counted
    relation (no full sort). Deterministic tiebreak on the term itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(words_col(F.col("text"))).alias("term"))
        .groupBy("term").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(k)
    )


CORPUS_TOP_TERMS_SQL = f"""
WITH w AS (SELECT unnest({_WORDS_SQL}) AS term FROM documents)
SELECT term, COUNT(*) AS n FROM w GROUP BY 1
ORDER BY n DESC, term LIMIT 25
"""


def doc_chunk_overlap(spark: SparkSession, sf_dir: str,
                      size: int = 30, stride: int = 20) -> DataFrame:
    """RAG-style chunking: split each document's token stream into
    overlapping windows (size 30, stride 20 — 10-token overlap), emitting
    one row per chunk with its token span and reassembled text.

    Scale: per-row array math — tokenize once, explode only the chunk
    INDEX sequence (a few ints per doc, never the tokens), then slice.
    Zero shuffle; output row count = total chunks, each carrying only its
    own tokens. At 100 TB this is a narrow map fused into the scan, and
    chunk rows land ready for the embedding stage without a repartition.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = docs.select(
        "doc_id", words_col(F.col("text")).alias("w"))
    w = w.withColumn("n", F.size("w")).where(F.col("n") >= 1)
    starts = F.sequence(F.lit(0), F.floor((F.col("n") - 1) / F.lit(stride)).cast("int"))
    return (
        w.select("doc_id", "w", F.explode(starts).alias("chunk_id"))
        .select(
            "doc_id",
            "chunk_id",
            F.slice(F.col("w"), F.col("chunk_id") * stride + 1, size).alias("chunk"),
        )
        .select(
            "doc_id", "chunk_id",
            F.size("chunk").alias("n_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


DOC_CHUNK_OVERLAP_SQL = f"""
WITH w AS (
    SELECT doc_id, {_WORDS_SQL} AS w, len({_WORDS_SQL}) AS n
    FROM documents
),
c AS (
    SELECT doc_id, g.i AS chunk_id,
           list_slice(w, g.i * 20 + 1, g.i * 20 + 30) AS chunk
    FROM w, generate_series(0, 512) g(i)
    WHERE n >= 1 AND g.i <= (n - 1) // 20
)
SELECT doc_id, chunk_id,
       len(chunk) AS n_tokens,
       list_aggregate(chunk, 'string_agg', ' ') AS chunk_text
FROM c
"""


def text_oov_rate(spark: SparkSession, sf_dir: str, vocab_k: int = 1000) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's top-1000
    term vocabulary — the tokenizer-fit / domain-shift signal (high OOV =
    the doc's vocabulary is unlike the corpus head).

    Oracle determinism: vocabulary membership is a row_number cut with a
    (count desc, term) total order; the rate is one exact integer ratio.

    Scale: vocab is a two-level aggregate capped at 1000 rows ->
    broadcast; per-doc membership is a broadcast semi-join on the
    exploded tokens, re-aggregated by doc_id. The corpus shuffles only
    token counts (map-side combined) and (doc_id) partials.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("term"))
    # TakeOrderedAndProject, not a one-partition row_number window (same
    # deterministic cut under the total order)
    vocab = (
        toks.groupBy("term").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(vocab_k)
        .select("term")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "term", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"),
             F.count_if(F.col("in_vocab").isNull()).alias("n_oov"))
        .select("doc_id", "n_tokens", "n_oov",
                F.round(F.col("n_oov").cast("double")
                        / F.col("n_tokens").cast("double"), 6).alias("oov_rate"))
    )


TEXT_OOV_RATE_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest({_WORDS_SQL}) AS term FROM documents
),
vocab AS (
    SELECT term FROM (
        SELECT term, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rn
        FROM toks GROUP BY term
    ) WHERE rn <= 1000
)
SELECT doc_id, COUNT(*) AS n_tokens,
       COUNT(*) FILTER (v.term IS NULL) AS n_oov,
       ROUND(CAST(COUNT(*) FILTER (v.term IS NULL) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v USING (term)
GROUP BY doc_id
"""


# ===========================================================================
# BM25 document search
# ===========================================================================

BM25_TERMS = ["join", "window", "merge"]


def bm25_search(spark: SparkSession, sf_dir: str,
                terms: list[str] | None = None, top_k: int = 10) -> DataFrame:
    """BM25 ranking of the corpus against a fixed query-term set — the
    canonical text-retrieval scorer, in a division-exact rational form so
    the score is bit-identical on any engine (the repo's numeric policy,
    SCALE.md): the log-idf is replaced by its monotone rational core
    (N - df + 0.5)/(df + 0.5) written as exact-integer (2(N-df)+1)/(2df+1),
    the length norm doc_len/avg_len becomes the single exact division
    (doc_len*N)/total_len, and every +,*,/ is IEEE-correctly-rounded with
    the SAME expression tree on both engines. k1=1.2, b=0.75. A term
    absent from a doc contributes exactly 0.0 (no CASE needed: tf=0 zeroes
    the numerator), and zero-score docs are excluded.

    Scale: ZERO data shuffles (r13) — per-doc term frequencies are
    per-row array expressions (``size(filter(words, w -> w = term))``),
    not an explode + groupBy(doc_id) re-aggregation, so the corpus
    never leaves its scan partitions; corpus statistics travel as a
    1-row broadcast cross join (never .collect()); the final top-k is
    TakeOrderedAndProject — no global sort of the corpus. Exactness vs
    the exploded shape: tf/doc_len are the same integers (count of
    equal words / word count), and a zero-word document — absent from
    the exploded groupBy — now carries tf=0, doc_len=0, contributing
    exactly 0 to every stat sum and scoring 0 (tf=0 zeroes the
    numerator), which the score>0 filter drops either way.
    """
    terms = terms or BM25_TERMS
    docs = spread(load_table(spark, sf_dir, "documents"))
    # tokenize in its OWN projection: the tf expressions below
    # reference the words array len(terms)+1 times, so inlining
    # words_col into each would tokenize every document 4 times per
    # row — measured 2.5x slower. CollapseProject keeps this alias
    # un-collapsed because it is non-cheap and referenced more than
    # once.
    toks = docs.select("doc_id", words_col(F.col("text")).alias("w"))
    per_doc = toks.select(
        "doc_id",
        # tf via size − size(array_remove(w, t)): array_remove is a
        # codegen'd collection expression (a higher-order filter() is
        # interpreted and measured ~2x slower); counts are the same
        # exact integers as the exploded SUM(CASE WHEN word = t)
        *[(F.size("w") - F.size(F.array_remove("w", t))).alias(f"tf{i}")
          for i, t in enumerate(terms)],
        F.size("w").alias("doc_len"),
    )
    # per_doc is now a narrow map-only relation (doc_id + 4 ints per
    # document) with two consumers (stats, scored): persisting it runs
    # the tokenize pass ONCE total. The pre-r13 explode+groupBy shape
    # lost this A/B because its per_doc materialization carried the
    # doc_id shuffle with it.
    from ru_cdc_spark.operators.rankops import _persist_tracked
    per_doc = _persist_tracked(per_doc)
    stats = per_doc.agg(
        F.sum("doc_len").alias("total_len"),
        *[F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
          for i in range(len(terms))],
    ).crossJoin(
        load_table(spark, sf_dir, "documents")
        .agg(F.count("*").alias("n_docs")))

    scored = per_doc.crossJoin(F.broadcast(stats))
    ratio = ((F.col("doc_len") * F.col("n_docs")).cast("double")
             / F.col("total_len").cast("double"))

    def term_score(i: int):
        tf = F.col(f"tf{i}").cast("double")
        idf = ((F.lit(2) * (F.col("n_docs") - F.col(f"df{i}")) + F.lit(1))
               .cast("double")
               / (F.lit(2) * F.col(f"df{i}") + F.lit(1)).cast("double"))
        denom = tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * ratio)
        return idf * ((tf * F.lit(2.2)) / denom)

    score = term_score(0)
    for i in range(1, len(terms)):
        score = score + term_score(i)
    ranked = (scored.select("doc_id", score.alias("score"))
              .where(F.col("score") > 0)
              .orderBy(F.desc("score"), F.asc("doc_id"))
              .limit(top_k))
    return ranked.select(
        F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("doc_id"))).alias("rank"),
        "doc_id", "score")


def _bm25_sql(terms: list[str], top_k: int = 10) -> str:
    tf_cols = ",\n           ".join(
        f"SUM(CASE WHEN word = '{t}' THEN 1 ELSE 0 END) AS tf{i}"
        for i, t in enumerate(terms))
    df_cols = ",\n           ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms)))
    term_scores = " + ".join(
        f"((CAST(2*(n_docs - df{i}) + 1 AS DOUBLE) / CAST(2*df{i} + 1 AS DOUBLE))"
        f" * ((CAST(tf{i} AS DOUBLE) * CAST(2.2 AS DOUBLE))"
        f" / (CAST(tf{i} AS DOUBLE) + CAST(1.2 AS DOUBLE)"
        f" * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)"
        f" * (CAST(doc_len * n_docs AS DOUBLE) / CAST(total_len AS DOUBLE))))))"
        for i in range(len(terms)))
    return f"""
WITH w AS (SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents),
per_doc AS (
    SELECT doc_id,
           {tf_cols},
           COUNT(*) AS doc_len
    FROM w GROUP BY doc_id
),
stats AS (
    SELECT SUM(doc_len) AS total_len,
           {df_cols}
    FROM per_doc
),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT doc_id, {term_scores} AS score
    FROM per_doc, stats, nd
)
SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank, doc_id, score
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT {top_k}
"""


TEXT_BM25_SEARCH_SQL = _bm25_sql(BM25_TERMS)


def text_trigram_lm_score(spark: SparkSession, sf_dir: str,
                          model_k: int = 500) -> DataFrame:
    """Character-trigram language-model quality proxy: each document is
    scored by the mean corpus frequency of its character trigrams under a
    top-k trigram model — fluent in-domain text is built from common
    trigrams and scores high; boilerplate-stripped noise, foreign-script
    spills, and mojibake score low. The arithmetic-mean form (instead of
    the geometric mean a perplexity would take) keeps the score a ratio
    of EXACT integers — one double division at the boundary, engine- and
    cluster-reproducible, no transcendental functions whose last bit
    differs across libm builds.

    Scale: the model is a two-level trigram count capped at k rows ->
    broadcast (the corpus shuffles map-side-combined trigram partials
    only, bounded by |alphabet|^3 distinct keys); per-doc scoring is a
    broadcast join on the exploded trigrams re-aggregated by doc_id.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " ")
    tris = docs.select("doc_id", norm.alias("t")).select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, greatest(length(t) - 2, 0)),"
            " i -> substring(t, i, 3))"
        )).alias("tri"))
    # top-k cut via TakeOrderedAndProject (per-partition top-k + driver
    # merge of k x partitions rows) — the row_number window formulation
    # would drag the full trigram-count relation through ONE partition
    model = (
        tris.groupBy("tri").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tri"))
        .limit(model_k)
    )
    scored = tris.join(F.broadcast(model), "tri", "left")
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_trigrams"),
             F.sum(F.coalesce(F.col("n"), F.lit(0))).alias("freq_mass"))
        .select("doc_id", "n_trigrams", "freq_mass",
                (F.col("freq_mass").cast("double")
                 / F.col("n_trigrams").cast("double")).alias("lm_score"))
    )


TEXT_TRIGRAM_LM_SQL = """
WITH d AS (
    SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g') AS t
    FROM documents
),
tris AS (
    SELECT doc_id, substr(t, CAST(i AS INTEGER), 3) AS tri
    FROM (
        SELECT doc_id, t,
               unnest(range(1, greatest(length(t) - 2, 0) + 1)) AS i
        FROM d
    )
),
model AS (
    SELECT tri, n FROM (
        SELECT tri, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tri) AS rn
        FROM tris GROUP BY tri
    ) WHERE rn <= 500
)
SELECT doc_id, COUNT(*) AS n_trigrams,
       CAST(SUM(COALESCE(m.n, 0)) AS BIGINT) AS freq_mass,
       CAST(SUM(COALESCE(m.n, 0)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           AS lm_score
FROM tris LEFT JOIN model m USING (tri)
GROUP BY doc_id
"""


def source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source novelty: the share of a source's distinct word bigrams
    that appear in NO other source — the corpus-curation signal for
    which feeds contribute unique content vs recycle shared boilerplate.
    Exact integer ratio per source.

    Scale: one (bigram -> distinct sources) aggregate (map-side
    combined), novel iff the source count is 1, then a per-source rollup
    — no pairwise source comparison, so cost is linear in distinct
    bigrams regardless of source count.
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    wc = words_col(F.col("text"))
    bigrams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size("w") - 1),
        lambda i: F.array_join(F.slice("w", i, 2), " "),
    ))
    sb = (docs.select("source", wc.alias("w"))
          .where(F.size("w") >= 2)
          .select("source", F.explode(bigrams).alias("g"))
          .distinct())
    spread_count = sb.groupBy("g").agg(
        F.count_distinct("source").alias("ns"))
    j = sb.join(spread_count, "g")
    return (j.groupBy("source")
            .agg(F.count("*").alias("n_bigrams"),
                 F.count_if(F.col("ns") == 1).alias("n_unique"))
            .select("source", "n_bigrams", "n_unique",
                    (F.col("n_unique").cast("double")
                     / F.col("n_bigrams").cast("double")).alias("novelty")))


SOURCE_NOVELTY_SQL = """
WITH sb AS (
    SELECT DISTINCT source, g
    FROM (
        SELECT source,
               unnest(list_distinct(list_transform(range(1, len(w)),
                      i -> w[i] || ' ' || w[i+1]))) AS g
        FROM (SELECT source, {words} AS w FROM documents)
        WHERE len(w) >= 2
    )
),
spread AS (SELECT g, COUNT(DISTINCT source) AS ns FROM sb GROUP BY 1)
SELECT source, COUNT(*) AS n_bigrams,
       COUNT(*) FILTER (ns = 1) AS n_unique,
       CAST(COUNT(*) FILTER (ns = 1) AS DOUBLE) / COUNT(*) AS novelty
FROM sb JOIN spread USING (g)
GROUP BY 1
""".replace("{words}", _WORDS_SQL)


# ---------------------------------------------------------------------------
# exhaustive duplicated-span detection (exact substring dedup)
# ---------------------------------------------------------------------------

DUPSPAN_K = 6  # token n-gram length (the paper's ~50-token unit, scaled
               # to the fixture's short documents)


def text_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive duplicated-n-gram measurement (the exact-substring
    dedup signal from Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL'22): EVERY word 6-gram is hashed with
    its position; an n-gram occurring in more than one document marks
    its positions duplicated, and each document reports how much of it
    is cross-document duplicated text. Winnowing SAMPLES fingerprints;
    this is the exhaustive variant real dedup passes run before cutting
    spans.

    Scale: per-row n-gram arrays (codegen) -> posexplode -> one groupBy
    on the 128-bit gram hash (uniform, no skew) to find cross-doc grams
    -> one groupBy back on doc_id. Both shuffles carry (hash, doc, pos)
    triples, never text. The count_distinct(doc) per gram partial-
    aggregates map-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.col("w")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (DUPSPAN_K - 1)),
        lambda i: F.md5(F.array_join(F.slice(w, i, DUPSPAN_K), " ")),
    )
    positions = (spread(docs)
                 .select("doc_id", words_col(F.col("text")).alias("w"))
                 .where(F.size("w") >= DUPSPAN_K)
                 .select("doc_id", F.size("w").alias("n_words"),
                         F.posexplode(grams).alias("pos", "g")))
    cross = (positions.groupBy("g")
             .agg(F.count_distinct("doc_id").alias("nd"))
             .where(F.col("nd") > 1)
             .select("g"))
    dup = positions.join(cross, "g")
    return (positions.groupBy("doc_id")
            .agg(F.max("n_words").alias("n_words"),
                 F.count("*").alias("n_grams"))
            .join(dup.groupBy("doc_id")
                  .agg(F.count("*").alias("dup_grams"),
                       F.min("pos").alias("first_dup_pos")),
                  "doc_id", "left")
            .select("doc_id", "n_words", "n_grams",
                    F.coalesce("dup_grams", F.lit(0)).alias("dup_grams"),
                    F.col("first_dup_pos").cast("long")
                    .alias("first_dup_pos"),
                    (F.coalesce("dup_grams", F.lit(0))
                     / F.col("n_grams")).alias("dup_ratio")))


TEXT_DUPLICATE_SPANS_SQL = f"""
WITH words AS (SELECT doc_id, {{words}} AS w FROM documents),
pos AS (
    SELECT doc_id, len(w) AS n_words, i - 1 AS pos,
           md5(array_to_string(w[i:i+{DUPSPAN_K - 1}], ' ')) AS g
    FROM words, UNNEST(range(1, len(w) - {DUPSPAN_K - 2})) AS t(i)
    WHERE len(w) >= {DUPSPAN_K}
),
cross_grams AS (
    SELECT g FROM pos GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1
),
dup AS (
    SELECT doc_id, COUNT(*) AS dup_grams, MIN(pos) AS first_dup_pos
    FROM pos JOIN cross_grams USING (g) GROUP BY 1
)
SELECT p.doc_id, MAX(n_words) AS n_words, COUNT(*) AS n_grams,
       COALESCE(MAX(dup_grams), 0) AS dup_grams,
       CAST(MAX(first_dup_pos) AS BIGINT) AS first_dup_pos,
       CAST(COALESCE(MAX(dup_grams), 0) AS DOUBLE) / COUNT(*) AS dup_ratio
FROM pos p LEFT JOIN dup USING (doc_id)
GROUP BY 1
""".replace("{words}", _WORDS_SQL)


DUPSPAN_STRIP_K = 20  # strip unit: ~the ACL'22 50-token standard,
# scaled to the fixture's ~50-word documents so the operator fires

# broadcast cap for the strip rebuild's covered side, in AFFECTED-DOC
# rows (each row: doc_id + a sorted int array bounded by the doc's
# word count — ~100-500 B framed). 200k rows keeps the built relation
# well under 100 MB; above it the join falls back to AQE/stats choice
# (shuffled at corpus scale — slower, cannot OOM). Parameterised for
# cluster deploys; the local default never triggers at fixture scale.
SPAN_STRIP_BROADCAST_MAX_DOCS = int(os.environ.get(
    "RU_CDC_SPAN_STRIP_BROADCAST_MAX_DOCS", "200000"))


def _documents_row_count(sf_dir: str) -> int:
    """Documents-table row count from the parquet FOOTERS, driver-side
    — no Spark job (the acid-table file-planning pattern). Upper-bounds
    the strip's covered relation (≤ one row per document); metadata
    only, never results."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path) if f.endswith(".parquet"))
    return pq.ParquetFile(path).metadata.num_rows


def text_duplicate_span_strip(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """CUT duplicated spans, not just count them (the second half of
    the Lee et al. ACL'22 exact-substring pipeline): every word
    position covered by a cross-document duplicate ``DUPSPAN_STRIP_K``-
    gram is removed, and the document's retained text is rebuilt from
    the surviving words in order. Documents with no duplicated span
    pass through with their normalized word stream intact.

    Scale: the gram hash shuffle is the same uniform 128-bit key as
    ``text_duplicate_spans``; coverage expansion is bounded by
    K x dup-occurrences (never words x docs); and the rebuild (r13) is
    map-side — covered positions aggregate to ONE small
    (doc_id, sorted int array) row per affected document, broadcast
    back onto the document scan, and each doc's retained words are cut
    by a per-row array filter. Document text NEVER crosses the wire:
    the old shape anti-joined the full exploded word stream and
    re-assembled it through a groupBy(doc_id) exchange (the largest
    shuffle in the leg); the only rows that shuffle now are gram hits.

    Exactness: covered = distinct positions in [pos, pos+k-1] per dup
    gram — identical set whether deduped by ``.distinct()`` rows (old)
    or ``collect_set`` per doc (new); retained words are the same
    words at the same positions in the same ascending order (array
    order == position order), joined with the same separator; a doc
    with no covered positions keeps its full word stream (null
    covered array -> filter passes all); n_kept = n_words − |covered|
    because every covered position indexes a real word (pos+k-1 is
    bounded by the gram's end ≤ n_words-1)."""
    docs = load_table(spark, sf_dir, "documents")
    k = DUPSPAN_STRIP_K
    # single-pass gram derivation (r13): ONE scan + ONE spread
    # exchange produces every (doc_id, pos, g) gram row, persisted for
    # its two consumers (cross-gram detection, coverage expansion).
    positions = (spread(docs)
                 .select("doc_id", words_col(F.col("text")).alias("w"))
                 .where(F.size("w") >= k)
                 .select("doc_id",
                         F.posexplode(F.transform(
                             F.sequence(F.lit(1), F.size("w") - (k - 1)),
                             lambda i: F.md5(F.array_join(
                                 F.slice(F.col("w"), i, k), " "))))
                         .alias("pos", "g")))
    from ru_cdc_spark.operators.rankops import _persist_tracked
    positions = _persist_tracked(positions)
    cross = (positions.groupBy("g")
             .agg(F.count_distinct("doc_id").alias("nd"))
             .where(F.col("nd") > 1).select("g"))
    covered = (positions.join(cross, "g")
               .select("doc_id",
                       F.explode(F.sequence(
                           F.col("pos"),
                           F.col("pos") + (k - 1))).alias("cpos"))
               .groupBy("doc_id")
               .agg(F.sort_array(F.collect_set("cpos")).alias("cov")))
    # SIZE-GATE the rebuild join's broadcast (r14, the r13 verdict's
    # top item): `covered` has one row per duplicate-affected document
    # — data-dependent and unbounded (dedup corpora routinely run
    # 30-50% affected), so an unconditional F.broadcast hint would
    # blow the broadcast limit / driver memory at 100 TB. The gate is
    # the DOCUMENT COUNT read driver-side from the parquet footers
    # (covered ≤ one row per document; pure metadata, ZERO Spark jobs
    # — the same driver-side planning the ACID merge uses). A small
    # corpus keeps the hint; a corpus past the cap falls back to the
    # AQE/stats choice, which still broadcast-converts at runtime when
    # the MEASURED covered set is small and shuffles — slower, cannot
    # OOM — when it is not. Two rejected variants, A/B'd at sf0.1:
    # hint-free AQE (3.05s vs 2.54 — the docs side pays a
    # text-carrying shuffle materialization before the runtime
    # conversion) and a persisted covered.count() gate (parity warm
    # but +3 scheduling-floor jobs per run, ~+0.45s on the driver's
    # cold floor).
    broadcast_ok = (_documents_row_count(sf_dir)
                    <= SPAN_STRIP_BROADCAST_MAX_DOCS)
    # rebuild straight off the scan: retained words are a per-row cut
    # of the (word, position) zip against the doc's covered-set array
    w_ = words_col(F.col("text"))
    kept = F.filter(
        F.transform(w_, lambda word, i: F.struct(word.alias("word"),
                                                 i.alias("pos"))),
        lambda s: ~F.array_contains(F.col("cov"), s["pos"]))
    cov_side = F.broadcast(covered) if broadcast_ok else covered
    base = (docs.join(cov_side, "doc_id", "left")
            .select("doc_id", F.size(w_).alias("n_words"),
                    F.coalesce("cov", F.array().cast("array<int>"))
                    .alias("cov"), F.col("text")))
    return (base
            .select("doc_id", "n_words",
                    (F.col("n_words") - F.size("cov")).alias("n_kept"),
                    F.size("cov").alias("n_removed"),
                    F.array_join(F.transform(
                        kept, lambda s: s["word"]), " ")
                    .alias("retained_text")))


TEXT_DUPLICATE_SPAN_STRIP_SQL = f"""
WITH words AS (SELECT doc_id, {{words}} AS w FROM documents),
pos AS (
    SELECT doc_id, i - 1 AS pos,
           md5(array_to_string(w[i:i+{DUPSPAN_STRIP_K - 1}], ' ')) AS g
    FROM words, UNNEST(range(1, len(w) - {DUPSPAN_STRIP_K - 2})) AS t(i)
    WHERE len(w) >= {DUPSPAN_STRIP_K}
),
cross_grams AS (
    SELECT g FROM pos GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1
),
covered AS (
    SELECT DISTINCT doc_id, pos + u.c AS cpos
    FROM pos JOIN cross_grams USING (g),
         UNNEST(range({DUPSPAN_STRIP_K})) AS u(c)
),
word_pos AS (
    SELECT doc_id, i - 1 AS pos, w[i] AS word
    FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)
),
retained AS (
    SELECT wp.doc_id, wp.pos, wp.word
    FROM word_pos wp
    WHERE NOT EXISTS (SELECT 1 FROM covered c
                      WHERE c.doc_id = wp.doc_id AND c.cpos = wp.pos)
),
rebuilt AS (
    SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS retained_text,
           COUNT(*) AS n_kept
    FROM retained GROUP BY 1
)
SELECT w.doc_id, len(w.w) AS n_words,
       COALESCE(r.n_kept, 0) AS n_kept,
       len(w.w) - COALESCE(r.n_kept, 0) AS n_removed,
       COALESCE(r.retained_text, '') AS retained_text
FROM words w LEFT JOIN rebuilt r USING (doc_id)
""".replace("{words}", _WORDS_SQL)


def corpus_stemmed_terms(spark: SparkSession, sf_dir: str,
                         k: int = 25) -> DataFrame:
    """Vocabulary head AFTER Porter stemming (functions/stemmer.py) —
    inflected forms collapse onto stems before counting, the
    normalization step tokenizer/stopword decisions actually consume.
    Correctness (since r11): the automaton is not SQL-expressible, but
    the head is deterministic, so a golden oracle pins the distributed
    path against a sequential recount (tools/gen_stem_oracle.py; the
    stemmer itself stays vector-gated in pytest).

    Scale: stemming is a per-token map inside Arrow batches; the only
    shuffle is the uniform stem-count aggregate with map-side partials,
    and the global top-k is TakeOrderedAndProject."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")

    def op(batches):
        from ru_cdc_spark.functions.stemmer import porter_stem

        cache: dict[str, str] = {}
        for pdf in batches:
            out = []
            for text in pdf["text"]:
                for w in text.lower().split():
                    w = "".join(ch for ch in w if ch.isalnum())
                    if not w:
                        continue
                    s = cache.get(w)
                    if s is None:
                        s = cache[w] = porter_stem(w)
                    out.append(s)
            yield pd.DataFrame({"stem": out})

    stems = docs.select("text").mapInPandas(op, "stem string")
    return (stems.groupBy("stem").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("stem")).limit(k))
