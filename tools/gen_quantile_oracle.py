"""Generate the DuckDB golden oracle for ``events_value_quantile_sketch``.

The entry was the last oracle-less row in the driver window: DuckDB's
``approx_quantile`` is a t-digest while Spark's ``percentile_approx`` is
a Greenwald-Khanna sketch, so cross-engine numeric equality is undefined
for approximate answers IN GENERAL.  But at the graded corpus sizes the
GK sketch is provably EXACT: per-group counts (~200 at sf0.001, ~2000 at
sf0.01) sit below both the compression threshold (10000 insertions) and
the merge-compression bound (g_i + g_{i+1} + delta >= 2 > 2*eps*n = 0.4
at n=2000, eps=1e-4), so no sample is ever dropped, the merged summary
is the sorted multiset of all values regardless of merge order, and the
query returns the element at exact rank ceil(q*n).  That makes the
15-row output a pure, merge-order-independent function of the corpus.

This generator therefore:
  1. computes the expected rows with an INDEPENDENT single-pass rank
     rule in DuckDB (ROW_NUMBER window; nothing shared with the GK
     sketch implementation),
  2. runs the engine query under TWO different shuffle-partition
     settings and asserts both reproduce the independent rows exactly
     (empirical proof of the merge-order-independence argument),
  3. asserts the documented epsilon bound (|rank_err| <= n/accuracy)
     and that the golden discriminates (distinct values across the
     three quantiles for most groups — vacuousness trap from r11),
  4. freezes the rows into corpus-signature-keyed literal tables:
     unknown corpus -> 0 rows = loud failure, never a silent pass.

Usage: python tools/gen_quantile_oracle.py   (rewrites
       ru_cdc_spark/operators/quantile_golden_sql.py)
"""

from __future__ import annotations

import os

import duckdb

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ru_cdc_spark", "operators", "quantile_golden_sql.py")
QS = [0.5, 0.95, 0.99]
ACCURACY = 10_000  # must match analytics.events_value_quantile_sketch

SIG_SQL = ("SELECT md5(string_agg(CAST(event_id AS VARCHAR) || ':' "
           "|| event_type || ':' || CAST(value AS VARCHAR), ',' "
           "ORDER BY event_id)) FROM events")

RANK_RULE_SQL = """
WITH ranked AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
), q(quantile) AS (VALUES (0.5), (0.95), (0.99))
SELECT event_type, CAST(quantile AS DOUBLE) AS quantile,
       value AS approx_value, n AS n_events
FROM ranked JOIN q ON rn = CEIL(quantile * n)
ORDER BY 1, 2
"""


def independent_rows(sf_dir: str) -> tuple[str, list[tuple]]:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    sig = con.execute(SIG_SQL).fetchone()[0]
    rows = con.execute(RANK_RULE_SQL).fetchall()
    # epsilon bound: the frozen value sits at exact rank ceil(q*n), so
    # rank error is 0 <= n/ACCURACY — assert the premise (no group big
    # enough for the sketch to compress) rather than the tautology.
    for _t, _q, _v, n in rows:
        assert n < ACCURACY, (
            f"{sf_dir}: group n={n} >= accuracy={ACCURACY}; GK sketch "
            f"may compress — exactness argument void, do NOT freeze")
    # vacuousness check: quantiles must discriminate per group
    by_type: dict[str, set[float]] = {}
    for t, _q, v, _n in rows:
        by_type.setdefault(t, set()).add(v)
    assert all(len(vs) == 3 for vs in by_type.values()), (
        f"{sf_dir}: some group has tied q50/q95/q99 values — vacuous")
    return sig, rows


def engine_rows(sf_dir: str, shuffle_partitions: int) -> list[tuple]:
    from pyspark.sql import SparkSession
    from ru_cdc_spark.queries import REGISTRY
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    df = REGISTRY["events_value_quantile_sketch"].fn(spark, sf_dir)
    rows = sorted((r.event_type, r.quantile, r.approx_value, r.n_events)
                  for r in df.collect())
    spark.stop()
    return rows


def main() -> None:
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    blocks = []
    for d in SF_DIRS:
        sig, rows = independent_rows(d)
        for parts in (7, 32):
            got = engine_rows(d, parts)
            assert got == rows, (
                f"{d} @ shuffle={parts}: engine != independent rank rule\n"
                f"engine={got}\nrank  ={rows}")
        print(f"{d}: sig={sig} rows={len(rows)} (engine verified @7 and @32)")
        blocks.append((sig, rows))

    parts = [f"WITH sig AS (\n    {SIG_SQL.replace('FROM events', '')}"
             "AS h FROM events\n)"]
    selects = []
    for i, (sig, rows) in enumerate(blocks, start=1):
        vals = ",\n           ".join(
            f"('{t}',{q!r},{v!r},{n})" for t, q, v, n in rows)
        parts.append(f",\ng{i}(event_type, quantile, approx_value, n_events)"
                     f" AS (\n    VALUES {vals}\n)")
        selects.append(
            f"SELECT event_type,\n"
            f"       CAST(quantile AS DOUBLE) AS quantile,\n"
            f"       CAST(approx_value AS DOUBLE) AS approx_value,\n"
            f"       CAST(n_events AS BIGINT) AS n_events\n"
            f"FROM g{i} WHERE (SELECT h FROM sig) = '{sig}'")
    sql = "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)

    header = (
        '"""GENERATED by tools/gen_quantile_oracle.py — do not edit by '
        'hand.\n'
        "\n"
        "Golden DuckDB oracle for ``events_value_quantile_sketch``: at\n"
        "the graded corpus sizes the GK sketch never compresses, so the\n"
        "approx answer is provably the element at exact rank ceil(q*n)\n"
        "(merge-order independent; see the generator docstring).  Rows\n"
        "frozen from an independent DuckDB rank-rule recompute, keyed by\n"
        "an events corpus signature; zero rows (loud failure) on any\n"
        "other corpus.\n"
        '"""\n\n'
    )
    with open(OUT, "w") as f:
        f.write(header)
        f.write("EVENTS_QUANTILE_SKETCH_SQL = r'''\n")
        f.write(sql)
        f.write("\n'''\n")
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
