"""Training-corpus curation operators (operators/curation.py):
sequence packing and benchmark decontamination. Oracle equality is the
registered queries' job; these tests pin the invariants and the plan
shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from ru_cdc_spark.operators.curation import (
    PACK_WINDOW,
    corpus_decontaminate,
    corpus_pack_windows,
)


class TestPackWindows:
    def test_coordinates_are_a_consistent_stream(self, spark, sf_dir):
        out = corpus_pack_windows(spark, sf_dir).orderBy("doc_id")
        rows = out.collect()
        # the stream is gapless: each doc starts where the previous ended
        off = 0
        for r in rows:
            assert r["stream_off"] == off
            off += r["n_tok"]
        # window coordinates derive exactly from the stream offset
        for r in rows:
            assert r["window_id"] == r["stream_off"] // PACK_WINDOW
            assert r["window_off"] == r["stream_off"] % PACK_WINDOW
            end = r["stream_off"] + r["n_tok"] - 1
            assert r["n_windows"] == end // PACK_WINDOW - r["window_id"] + 1

    def test_boundary_straddlers_span_multiple_windows(self, spark,
                                                       sf_dir):
        out = corpus_pack_windows(spark, sf_dir)
        multi = out.where(F.col("n_windows") > 1).count()
        assert multi > 0  # the packing plan's raison d'etre
        # every window between first and last is fully accounted for:
        # total token mass == final stream offset
        agg = out.agg(F.sum("n_tok").alias("t"),
                      F.max(F.col("stream_off") + F.col("n_tok"))
                      .alias("end")).collect()[0]
        assert agg["t"] == agg["end"]

    def test_plan_has_no_unpartitioned_window(self, spark, sf_dir):
        out = corpus_pack_windows(spark, sf_dir)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan  # distributed two-pass sums
        # no global single-task sort-window anywhere: every exchange is
        # range or hash partitioned (the rankops two-pass discipline)
        assert "Exchange SinglePartition" not in plan


class TestDecontaminate:
    def test_benchmark_docs_never_flagged(self, spark, sf_dir):
        out = corpus_decontaminate(spark, sf_dir)
        assert out.where(F.col("doc_id") % 97 == 0).count() == 0

    def test_flagged_docs_really_share_a_gram(self, spark, sf_dir):
        # re-derive one flagged doc's grams and intersect by hand
        from ru_cdc_spark.operators.curation import _grams
        from ru_cdc_spark.sources.readers import load_table

        out = corpus_decontaminate(spark, sf_dir).collect()
        if not out:  # tiny sf may have no contamination
            return
        doc_id = out[0]["doc_id"]
        docs = load_table(spark, sf_dir, "documents")
        mine = {r["gram"] for r in _grams(
            docs.where(F.col("doc_id") == doc_id), 5).collect()}
        bench = {r["gram"] for r in _grams(
            docs.where(F.col("doc_id") % 97 == 0), 5).collect()}
        assert len(mine & bench) == out[0]["n_leaked_grams"]

    def test_corpus_is_never_shuffled_before_the_hit_join(self, spark,
                                                          sf_dir):
        out = corpus_decontaminate(spark, sf_dir)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # exactly one aggregation exchange (the per-doc hit count; plus
        # the broadcast side's internal distinct) — the corpus gram
        # stream itself reaches the join without an exchange
        assert "SortMergeJoin" not in plan
