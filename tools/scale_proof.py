"""Measured sf0.1 -> sf1 scaling of the most expensive headline queries
(round-7 verdict item #2): run each query once warmed at both scale
factors and print wall-time ratios. A 10x data step should cost <=~10x
on a fixed-size machine; anything clearly superlinear (> ~12x) names a
plan to fix or a ceiling to document in SCALE.md.

Usage: python tools/scale_proof.py [sf1_dir]
(generate sf1 first: python tools/gen_sf1.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ru_cdc_spark.queries import REGISTRY  # noqa: E402
from ru_cdc_spark.session import get_spark  # noqa: E402

QUERIES = [
    "acid_merge_snapshot",
    "text_duplicate_span_strip",
    "ann_pq_rerank",
    "corpus_dedup_retain",
    "dedup_clusters_star",
    "cdc_merge_snapshot",
]


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdata/sf1"
    sf01 = "/root/testdata/sf0.1"
    spark = get_spark("scale-proof")
    from ru_cdc_spark.operators.rankops import release_rank_caches

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup
    force(REGISTRY["cdc_envelope"].fn(spark, sf01))

    out = {}
    for name in QUERIES:
        times = {}
        for label, sf_dir in (("sf0.1", sf01), ("sf1", sf1)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                force(REGISTRY[name].fn(spark, sf_dir))
                best = min(best, time.time() - t0)
                release_rank_caches()
                spark.catalog.clearCache()
            times[label] = round(best, 2)
        ratio = round(times["sf1"] / max(times["sf0.1"], 1e-9), 2)
        out[name] = {**times, "ratio": ratio}
        print(f"{name}: sf0.1={times['sf0.1']}s sf1={times['sf1']}s "
              f"ratio={ratio}x", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
