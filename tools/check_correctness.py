"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given SF, compare row count,
sorted-column schema, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ru_cdc_spark.queries import REGISTRY  # noqa: E402
from ru_cdc_spark.session import get_spark  # noqa: E402
from ru_cdc_spark.sources.readers import TABLES  # noqa: E402


def norm_cell(v) -> str:
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def value_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in col_order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"rows-only  {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(spec.oracle)
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue

        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: schema mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        else:
            s_order = [s_cols.index(c) for c in sorted(s_cols)]
            d_order = [d_cols.index(c) for c in sorted(d_cols)]
            sh, dh = value_hash(s_rows, s_order), value_hash(d_rows, d_order)
            if sh != dh:
                print(f"FAIL  {name}: value hash mismatch")
                # print first differing line for debugging
                s_lines = sorted("\x01".join(norm_cell(r[i]) for i in s_order) for r in s_rows)
                d_lines = sorted("\x01".join(norm_cell(r[i]) for i in d_order) for r in d_rows)
                for a, b in zip(s_lines, d_lines):
                    if a != b:
                        print(f"  spark: {a[:300]}")
                        print(f"  duck : {b[:300]}")
                        break
                ok = False
        if ok:
            print(f"OK    {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
        else:
            failures += 1

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
