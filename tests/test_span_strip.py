"""Exact-substring duplicate-span STRIPPING (operators/textops.py
text_duplicate_span_strip): crafted corpora where the expected cuts are
known by construction."""

from __future__ import annotations

import pytest

from ru_cdc_spark.operators.textops import (
    DUPSPAN_STRIP_K,
    text_duplicate_span_strip,
)

K = DUPSPAN_STRIP_K


def _words(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def strip_result(spark, tmp_path_factory):
    shared = _words(K, "dup")          # exactly one duplicated K-gram
    docs = [
        # 0/1: share `shared` mid-document, unique elsewhere
        (0, _words(10, "a") + " " + shared + " " + _words(10, "b")),
        (1, _words(10, "c") + " " + shared + " " + _words(10, "d")),
        # 2: fully unique, longer than K
        (2, _words(K + 15, "e")),
        # 3: shorter than K — can never be stripped
        (3, _words(5, "f")),
        # 4/5: ENTIRE document duplicated
        (4, _words(K, "g")),
        (5, _words(K, "g")),
    ]
    d = tmp_path_factory.mktemp("spanstrip")
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.parquet(str(d / "documents.parquet"))
    rows = text_duplicate_span_strip(spark, str(d)).collect()
    return {r["doc_id"]: r for r in rows}


def test_shared_span_cut_from_both(strip_result):
    for doc in (0, 1):
        r = strip_result[doc]
        assert r["n_removed"] == K
        assert "dup0" not in r["retained_text"]
        assert r["n_kept"] == 20


def test_unique_docs_untouched(strip_result):
    r = strip_result[2]
    assert r["n_removed"] == 0
    assert r["n_kept"] == r["n_words"] == K + 15


def test_short_docs_pass_through(strip_result):
    r = strip_result[3]
    assert r["n_removed"] == 0 and r["n_kept"] == 5


def test_fully_duplicated_doc_strips_to_empty(strip_result):
    for doc in (4, 5):
        r = strip_result[doc]
        assert r["n_kept"] == 0
        assert r["retained_text"] == ""


def test_retained_order_preserved(strip_result):
    r = strip_result[0]
    toks = r["retained_text"].split()
    assert toks == [f"a{i}" for i in range(10)] + \
        [f"b{i}" for i in range(10)]


def test_over_cap_shuffled_join_identical(spark, tmp_path_factory,
                                          monkeypatch):
    """The r14 size gate: when the covered side exceeds the broadcast
    cap, the rebuild join falls back to the AQE/stats choice — results
    must be identical to the broadcast path (non-vacuous: the cap is
    forced to 0 so the fallback branch provably runs)."""
    from ru_cdc_spark.operators import textops

    shared = _words(K, "dup")
    docs = [
        (0, _words(10, "a") + " " + shared + " " + _words(10, "b")),
        (1, _words(10, "c") + " " + shared + " " + _words(10, "d")),
        (2, _words(K + 15, "e")),
    ]
    d = tmp_path_factory.mktemp("spanstrip_cap")
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.parquet(str(d / "documents.parquet"))
    fast = sorted(map(tuple, text_duplicate_span_strip(
        spark, str(d)).collect()))
    monkeypatch.setattr(textops, "SPAN_STRIP_BROADCAST_MAX_DOCS", 0)
    slow = sorted(map(tuple, text_duplicate_span_strip(
        spark, str(d)).collect()))
    assert fast == slow
    assert any(r[3] > 0 for r in fast)  # n_removed fired
