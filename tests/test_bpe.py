"""Byte-level BPE (operators/bpe.py): determinism, lossless round-trip,
and a differential check against an INDEPENDENT naive implementation —
encoding by replaying merges in training order (replace-all per merge),
a different algorithm from the engine's lowest-rank-first search; the
two provably coincide for BPE, so any divergence is a bug in one."""

from __future__ import annotations

import pytest

from ru_cdc_spark.operators.bpe import (
    EOW,
    bpe_token_counts,
    encode_word,
    train_bpe,
    train_merges,
    word_frequencies,
)

CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a catalog of category theory",
    "low lower lowest slow slower slowest",
    "the the the banana bandana",
]


def _ranks(merges):
    return {(l, r): (rank, nid) for rank, (l, r, nid) in enumerate(merges)}


def _naive_encode(word: str, merges) -> list[int]:
    """Independent formulation: apply each merge in TRAINING order,
    replacing all occurrences, one merge at a time."""
    sym = list(word.encode("utf-8")) + [EOW]
    for left, right, new_id in merges:
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                out.append(new_id)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def _expand(token: int, merges_by_id) -> bytes:
    if token == EOW:
        return b""
    if token < 256:
        return bytes([token])
    left, right = merges_by_id[token]
    return _expand(left, merges_by_id) + _expand(right, merges_by_id)


class TestTraining:
    def test_deterministic(self):
        wc = [("abab", 3), ("abc", 2), ("ab", 5)]
        m1 = train_merges(wc, 10)
        m2 = train_merges(list(reversed(wc)), 10)
        assert m1 == m2  # input order must not matter

    def test_first_merge_is_most_frequent_pair(self):
        # "ab" appears in every word with total weight 3+2+5 (+3 again
        # in the second 'ab' of abab) -> (97, 98) must merge first
        merges = train_merges([("abab", 3), ("abc", 2), ("ab", 5)], 1)
        assert merges[0][:2] == (97, 98)

    def test_merge_ids_sequential_from_257(self):
        merges = train_merges([("aaaa", 10)], 3)
        assert [m[2] for m in merges] == [257, 258, 259]

    def test_tie_break_smallest_pair(self):
        # "ab" and "cd" both appear exactly once: the smaller pair wins
        merges = train_merges([("ab", 1), ("cd", 1)], 1)
        assert merges[0][:2] == (97, 98)


class TestEncoding:
    @pytest.fixture(scope="class")
    def merges(self):
        wc = {}
        for line in CORPUS:
            for w in line.split():
                wc[w] = wc.get(w, 0) + 1
        return train_merges(sorted(wc.items()), 60)

    def test_differential_vs_naive(self, merges):
        ranks = _ranks(merges)
        words = {w for line in CORPUS for w in line.split()}
        words |= {"unseen", "catastrophe", "slowly", "zzz", "a"}
        for w in sorted(words):
            assert encode_word(w, ranks) == _naive_encode(w, merges), w

    def test_lossless_roundtrip(self, merges):
        ranks = _ranks(merges)
        by_id = {nid: (l, r) for l, r, nid in merges}
        for w in ("the", "catalog", "slowest", "bandana", "verbatim"):
            toks = encode_word(w, ranks)
            assert toks[-1] == EOW or any(
                EOW in _token_closure(t, by_id) for t in toks)
            restored = b"".join(_expand(t, by_id) for t in toks)
            assert restored == w.encode("utf-8"), w

    def test_frequent_words_compress(self, merges):
        ranks = _ranks(merges)
        # "the" occurs constantly in the corpus: must be few tokens
        assert len(encode_word("the", ranks)) <= 2
        # random bytes never merge below per-byte
        assert len(encode_word("zqxj", ranks)) >= 4


def _token_closure(token, by_id):
    if token < 257:
        return {token}
    l, r = by_id[token]
    return _token_closure(l, by_id) | _token_closure(r, by_id)


class TestSparkPath:
    def test_distributed_counts_match_single_node(self, spark):
        docs = spark.createDataFrame(
            [(i, line) for i, line in enumerate(CORPUS)],
            "doc_id long, text string")
        wf = word_frequencies(docs, max_words=1000)
        merges = train_merges(wf, 40)
        got = {r["doc_id"]: (r["bpe_tokens"], r["ws_tokens"])
               for r in bpe_token_counts(docs, merges).collect()}
        ranks = _ranks(merges)
        for i, line in enumerate(CORPUS):
            want_bpe = sum(len(encode_word(w, ranks))
                           for w in line.lower().split())
            assert got[i] == (want_bpe, len(line.split())), i

    def test_word_frequencies_bounded_and_ordered(self, spark):
        docs = spark.createDataFrame(
            [(i, line) for i, line in enumerate(CORPUS)],
            "doc_id long, text string")
        wf = word_frequencies(docs, max_words=5)
        assert len(wf) == 5
        counts = [c for _, c in wf]
        assert counts == sorted(counts, reverse=True)
        assert wf[0][0] == "the"
