"""Per-leg profiler for the optimization rounds (guide §1): for each
bench HEADLINE leg, run the query through the noop sink (min of N),
count the Spark jobs the leg launches (StatusTracker job groups), and
dump ``explain("formatted")`` to ``plans/<tag>/<name>_<suffix>.txt``.

Usage:
    python tools/profile_legs.py <tag> <suffix> [leg ...]

e.g. ``python tools/profile_legs.py r13 before`` profiles every
HEADLINE leg at $SPARK_GRAFT_SF_DIR and writes plans/r13/*_before.txt.
Prints one JSON line: {"legs": {name: {"sec": s, "jobs": n}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, force, run_in_job_group  # noqa: E402
from ru_cdc_spark.operators.rankops import release_rank_caches  # noqa: E402
from ru_cdc_spark.plans import formatted_plan  # noqa: E402
from ru_cdc_spark.queries import REGISTRY  # noqa: E402
from ru_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    legs = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("profile")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    force(REGISTRY["cdc_envelope"].fn(spark, sf_dir))  # JIT warm

    results: dict[str, dict] = {}
    for name in legs:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best, best_jobs = float("inf"), 0
        for _ in range(2):
            t0 = time.time()
            _, jobs = run_in_job_group(
                spark, lambda: force(REGISTRY[name].fn(spark, sf_dir)))
            sec = time.time() - t0
            release_rank_caches()
            if sec < best:
                best, best_jobs = sec, jobs
        # plan AFTER the timed runs (plan construction may itself build
        # fixtures; the timed run already materialized session caches)
        df = REGISTRY[name].fn(spark, sf_dir)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(formatted_plan(df))
        results[name] = {"sec": round(best, 3), "jobs": best_jobs}
        print(f"PROFILED {name}: {best:.3f}s jobs={best_jobs}",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "legs": results}))


if __name__ == "__main__":
    main()
