"""Byte-level BPE tokenizer, trained in-repo on the corpus.

Replaces the regex token-count approximation (textops.py ``TOKEN_REGEX``)
with a REAL byte-pair-encoding pipeline — the token-budget metric that
drives sequence packing / mixture sizing in an LLM data pipeline.

Scale shape (the classic Sennrich recipe, which is exactly the right
100 TB decomposition):

1. **one distributed pass** builds the word-frequency table — split,
   explode, groupBy(word).count(): a single shuffle whose cardinality is
   the word VOCABULARY (bounded, Zipf-capped via top-``max_words``),
   not the corpus;
2. **driver-side merge training** over that bounded table — BPE
   training only ever needs (word -> count), so after the cap this is
   O(max_words x n_merges) pure Python on a few MB, same bounded-
   driver-work pattern as the PQ/IVF codebook training (<= 65k sample);
3. **broadcast encode** — the merge table (a few KB) broadcasts to
   executors; encoding is an Arrow-batched map with a per-word memo
   (natural-language words repeat heavily, so the memo hit rate is the
   Zipf mass), zero shuffles.

Determinism: ties in pair frequency break on the lexicographically
smallest pair, so the same corpus always trains the same merges — the
property the differential test (tests/test_bpe.py) relies on: an
independent naive single-node implementation must reproduce both the
merge table and every encoding.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# end-of-word sentinel symbol id (byte-level symbols are 0..255; merged
# symbols are 257+). Marking word ends lets merges distinguish suffix
# pairs ("ing</w>") from mid-word pairs, the standard byte-level setup.
EOW = 256


def word_frequencies(docs: DataFrame, text_col: str = "text",
                     max_words: int = 100_000) -> list[tuple[str, int]]:
    """The single distributed pass: lowercased whitespace words ->
    (word, count), truncated to the ``max_words`` most frequent
    (deterministic tie-break on the word itself). The collect is
    bounded by max_words — never by corpus size."""
    rows = (docs.select(F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
            .where(F.length("w") > 0)
            .groupBy("w").agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("w"))
            .limit(max_words)
            .collect())
    return [(r["w"], r["cnt"]) for r in rows]


def train_merges(word_counts: list[tuple[str, int]],
                 n_merges: int = 200) -> list[tuple[int, int, int]]:
    """Classic BPE training over the bounded word-frequency table:
    repeatedly merge the most frequent adjacent symbol pair. Returns
    [(left_id, right_id, new_id)] in merge order; new ids start at 257
    (256 is the end-of-word sentinel)."""
    words: dict[tuple[int, ...], int] = {}
    for w, c in word_counts:
        sym = tuple(w.encode("utf-8")) + (EOW,)
        words[sym] = words.get(sym, 0) + c
    merges: list[tuple[int, int, int]] = []
    for step in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # deterministic: max count, ties -> smallest (left, right) pair
        (left, right), _cnt = max(
            pairs.items(), key=lambda kv: (kv[1], -kv[0][0], -kv[0][1]))
        new_id = 257 + step
        merges.append((left, right, new_id))
        out: dict[tuple[int, ...], int] = {}
        for sym, c in words.items():
            merged = []
            i = 0
            n = len(sym)
            while i < n:
                if i + 1 < n and sym[i] == left and sym[i + 1] == right:
                    merged.append(new_id)
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            key = tuple(merged)
            out[key] = out.get(key, 0) + c
        words = out
    return merges


def encode_word(word: str, ranks: dict[tuple[int, int], tuple[int, int]]
                ) -> list[int]:
    """Encode one word with the trained merges: repeatedly apply the
    LOWEST-rank applicable merge (standard BPE inference)."""
    sym = list(word.encode("utf-8")) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r[0] < best_rank):
                best_rank = r[0]
                best_i = i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [ranks[(sym[best_i],
                                         sym[best_i + 1])][1]]
    return sym


def train_bpe(spark: SparkSession, docs: DataFrame,
              text_col: str = "text", n_merges: int = 200,
              max_words: int = 100_000) -> list[tuple[int, int, int]]:
    return train_merges(word_frequencies(docs, text_col, max_words),
                        n_merges)


def bpe_token_counts(docs: DataFrame,
                     merges: list[tuple[int, int, int]],
                     text_col: str = "text") -> DataFrame:
    """doc_id + real BPE token count (plus whitespace-token count for
    the legacy comparison): broadcast merge ranks, Arrow-batched encode
    with a per-word memo — a narrow map, no shuffle."""
    spark = docs.sparkSession
    b_merges = spark.sparkContext.broadcast(merges)

    def count_batches(batches: Iterator[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
        ranks = {(l, r): (rank, nid)
                 for rank, (l, r, nid) in enumerate(b_merges.value)}
        memo: dict[str, int] = {}

        def doc_tokens(text: str) -> int:
            total = 0
            for w in text.lower().split():
                n = memo.get(w)
                if n is None:
                    if len(memo) > 1 << 20:  # bound executor memory
                        memo.clear()
                    n = memo[w] = len(encode_word(w, ranks))
                total += n
            return total

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "bpe_tokens": pdf[text_col].map(doc_tokens),
                "ws_tokens": pdf[text_col].map(
                    lambda t: len(t.split())),
            })

    return (docs.select("doc_id", text_col)
            .mapInPandas(count_batches,
                         "doc_id long, bpe_tokens long, ws_tokens long"))
