"""Bounded-memory frequency/sampling operators (operators/sketch.py):
the Misra-Gries candidate guarantee, the exactness of the two-pass heavy
hitter result, and determinism of priority sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from ru_cdc_spark.operators import sketch as sk
from ru_cdc_spark.operators.dedup import words_col
from ru_cdc_spark.sources.readers import load_table


def _terms(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(words_col(F.col("text"))).alias("term"))


def test_mg_candidates_superset_of_true_heavy_hitters(spark, sf_dir):
    terms = _terms(spark, sf_dir)
    k = 50
    n = terms.count()
    truth = {r["term"] for r in
             terms.groupBy("term").agg(F.count("*").alias("n"))
             .where(F.col("n") * k > F.lit(n)).collect()}
    cands = {r["term"] for r in
             sk.misra_gries_candidates(terms, "term", k).collect()}
    assert truth <= cands, truth - cands


def test_mg_emits_at_most_k_rows_per_partition(spark, sf_dir):
    terms = _terms(spark, sf_dir).repartition(4)
    k = 20
    per_part = (sk.misra_gries_candidates(terms, "term", k)
                .withColumn("p", F.spark_partition_id())
                .groupBy("p").count().collect())
    assert all(r["count"] <= k for r in per_part)


def test_frequent_terms_exact_equals_bruteforce(spark, sf_dir):
    got = {(r["term"], r["n"]) for r in
           sk.frequent_terms_exact(spark, sf_dir).collect()}
    terms = _terms(spark, sf_dir)
    n = terms.count()
    want = {(r["term"], r["n"]) for r in
            terms.groupBy("term").agg(F.count("*").alias("n"))
            .where(F.col("n") * sk.HH_K > F.lit(n)).collect()}
    assert got == want


def test_priority_sample_is_deterministic_and_bounded(spark, sf_dir):
    a = sk.weighted_priority_sample(spark, sf_dir).collect()
    b = sk.weighted_priority_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_lang: dict = {}
    for r in a:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in per_lang.items():
        assert len(rows) <= sk.SAMPLE_PER_STRATUM, lang


def test_priority_sample_favors_weight(spark, sf_dir):
    # the sampled docs' mean n_chars should exceed the corpus mean —
    # weight-proportional inclusion is the whole point of the scheme
    docs = load_table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    samp = sk.weighted_priority_sample(spark, sf_dir)
    sample_mean = samp.agg(F.avg("n_chars")).collect()[0][0]
    assert sample_mean > corpus_mean


def test_cms_never_underestimates_and_bounds_error(spark, sf_dir):
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators.dedup import words_col
    from ru_cdc_spark.operators.sketch import terms_count_min_estimate
    from ru_cdc_spark.sources.readers import load_table

    est = {r["term"]: r["est"]
           for r in terms_count_min_estimate(spark, sf_dir).collect()}
    terms = load_table(spark, sf_dir, "documents").select(
        F.explode(words_col(F.col("text"))).alias("term"))
    n_total = terms.count()
    exact = {r["term"]: r["n"] for r in terms.groupBy("term")
             .agg(F.count("*").alias("n")).collect()}
    for t, e in est.items():
        true = exact.get(t, 0)
        assert e >= true, f"CMS underestimated {t}: {e} < {true}"
        # eps = e_const/width ~ 2.72/512; collision mass <= eps * N whp
        assert e - true <= max(10, int(0.01 * n_total)), (t, e, true)


def test_cms_tables_merge_by_cell_sum(spark):
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators.sketch import count_min_table

    a = spark.createDataFrame([("x",), ("y",), ("x",)], "term string")
    b = spark.createDataFrame([("y",), ("z",)], "term string")
    both = count_min_table(a.unionAll(b))
    merged = (count_min_table(a).unionAll(count_min_table(b))
              .groupBy("i", "bucket").agg(F.sum("cnt").alias("cnt")))
    assert both.exceptAll(merged).count() == 0
    assert merged.exceptAll(both).count() == 0
