"""Round-11 verdict item #5: measure the L/k frontier for the L-tables
LSH index (recall@3, candidate count, wall time) at sf0.1 and sf1, plus
the existing IVF-PQ rerank hybrid at its own budget, so the canonical
index constants can be adopted from MEASUREMENT, not the p^k formula.

Candidate budget accounting: with n corpus vectors, 2^k buckets per
table and L tables, expected candidates per query ~ L * n / 2^k, so the
budget relative to the shipping (L=10, k=5) index is (L/2^k) / (10/32).
The adoption rule from VERDICT.md: >= 0.8 recall@3 at sf1 within ~2x
the current candidate cost.

Usage: python tools/ann_frontier.py [sf1_dir]   (default /tmp/sfdata/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ru_cdc_spark.operators.similarity import (
    ANN_TOP_K,
    QUERY_MOD,
    _emb,
    dot,
    lsh_postings,
)
from ru_cdc_spark.queries import REGISTRY
from ru_cdc_spark.session import get_spark

# (32, 7) added r12: the scale-adaptive k switch point — measured at
# sf1 (n=20k): recall@3 0.804 at 0.59x the k=6 candidate cost, the
# largest k holding the >=0.8 adoption bar at L=32. That measurement
# calibrates LSH_BUCKET_TARGET=150 (lsh_adaptive_bits picks k=7 at
# n=20k); k=8 drops well below the bar (r11 table).
CONFIGS = [(10, 5), (20, 5), (20, 6), (32, 6), (32, 7), (32, 8)]


def lsh_pairs(emb, L: int, k: int):
    """Candidate generation at (L, k) — since r12 this reuses the
    engine's parameterized Arrow-vectorized coding path directly
    (similarity.lsh_postings), so the frontier measures exactly what a
    build at this (L, k) would ship."""
    coded = lsh_postings(emb, L, k) \
        .select(F.col("vec_id"), "t", "b")
    q = coded.where(F.col("vec_id") % QUERY_MOD == 0) \
        .select(F.col("vec_id").alias("q_vec"), "t", "b")
    cand = coded.select(F.col("vec_id").alias("neighbor"), "t", "b")
    return (cand.join(F.broadcast(q), ["t", "b"])
            .where(F.col("neighbor") != F.col("q_vec"))
            .select("q_vec", "neighbor").distinct())


def lsh_topk(spark, sf_dir: str, L: int, k: int):
    emb = _emb(spark, sf_dir)
    pairs = lsh_pairs(emb, L, k)
    qv = emb.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_vec"), F.col("e").alias("qe"),
        F.col("nrm").alias("qn"))
    cv = emb.select(F.col("vec_id").alias("neighbor"),
                    F.col("e").alias("ce"), F.col("nrm").alias("cn"))
    cos = dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("q_vec").orderBy(F.col("cos_sim").desc(),
                                            F.col("neighbor").asc())
    return (pairs.join(F.broadcast(qv), "q_vec").join(cv, "neighbor")
            .select("q_vec", "neighbor", cos.alias("cos_sim"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= ANN_TOP_K))


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdata/sf1"
    spark = get_spark("ann-frontier")
    out: dict = {}
    for sf_label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                             ("sf1", sf1_dir)):
        exact = REGISTRY["knn_brute_force"].fn(spark, sf_dir)
        truth = {(r.q_vec, r.neighbor) for r in exact.collect()
                 if r.rank <= 3}
        emb = _emb(spark, sf_dir)
        for (L, k) in CONFIGS:
            n_cand = lsh_pairs(emb, L, k).count()
            df = lsh_topk(spark, sf_dir, L, k)
            t0 = time.time()
            rows = df.collect()
            sec = round(time.time() - t0, 2)
            got = {(r.q_vec, r.neighbor) for r in rows}
            rec = round(len(truth & got) / max(len(truth), 1), 3)
            budget = round((L / 2 ** k) / (10 / 32), 2)
            key = f"L{L}k{k}"
            out.setdefault(key, {})[sf_label] = dict(
                recall=rec, candidates=n_cand, sec=sec,
                budget_vs_current=budget)
            print(f"{sf_label} L={L} k={k}: recall@3={rec} "
                  f"candidates={n_cand} ({budget}x budget) {sec}s",
                  flush=True)
        # the IVF-PQ hybrid at its own (cell-probe) budget, for contrast
        t0 = time.time()
        rows = REGISTRY["ann_ivfpq_rerank"].fn(spark, sf_dir).collect()
        sec = round(time.time() - t0, 2)
        got = {(r.q_vec, r.neighbor) for r in rows}
        rec = round(len(truth & got) / max(len(truth), 1), 3)
        out.setdefault("ivfpq_rerank", {})[sf_label] = dict(
            recall=rec, sec=sec)
        print(f"{sf_label} ivfpq_rerank: recall@3={rec} {sec}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
