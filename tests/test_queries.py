"""Run every registered query against its DuckDB oracle at sf0.001 —
the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from ru_cdc_spark.queries import REGISTRY
from tools.check_correctness import norm_cell, value_hash


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        assert len(s_rows) >= 0  # rows-only check: must at least execute
        return

    cur = duck.execute(spec.oracle)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"schema mismatch in {name}"
    assert len(s_rows) == len(d_rows), f"rowcount mismatch in {name}"
    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [d_cols.index(c) for c in sorted(d_cols)]
    sh = value_hash(s_rows, s_order)
    dh = value_hash(d_rows, d_order)
    if sh != dh:
        s_lines = sorted("\x01".join(norm_cell(r[i]) for i in s_order) for r in s_rows)
        d_lines = sorted("\x01".join(norm_cell(r[i]) for i in d_order) for r in d_rows)
        diff = next((a, b) for a, b in zip(s_lines, d_lines) if a != b)
        pytest.fail(f"value mismatch in {name}:\n spark={diff[0][:200]}\n duck ={diff[1][:200]}")
