"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

Execution is forced through the ``noop`` datasource writer so every plan
runs end-to-end (no count()-only shortcuts where Catalyst could prune the
expensive projections) without materializing results on the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ru_cdc_spark.queries import REGISTRY  # noqa: E402
from ru_cdc_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "cdc_envelope",
    "cdc_merge_snapshot",
    "cdc_route",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top_orders_per_customer",
    "events_hourly_rollup",
    "events_sessionize",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_signatures",
    "knn_brute_force",
    "text_stats",
    "doc_fingerprint",
    "multimodal_meta",
    "mysql_type_semantics",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")

    # warm the JVM / parquet footers with a trivial action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):  # min of 2 damps machine noise + JIT warmup
            t0 = time.time()
            force(REGISTRY[name].fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
