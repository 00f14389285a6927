"""Wildcard matcher + routing truth table (FIXTURES.md B3; reference
semantics /root/reference/src/config.rs:41-72)."""

from __future__ import annotations

import pytest

from ru_cdc_spark.config import (
    InstanceConfig,
    PipelineConfig,
    match_pattern,
    pattern_to_sql_condition,
)

TRUTH_TABLE = [
    # (pattern, input, expected)
    ("test*", "test_db", True),      # prefix
    ("test*", "tes", False),
    ("test*", "test", True),
    ("*_log", "access_log", True),   # suffix
    ("*_log", "log", False),
    ("*_log", "_log", True),
    ("ord*rs", "orders", True),      # middle
    ("ord*rs", "ordrs", True),
    ("ord*rs", "orders_x", False),
    ("customer", "customer", True),  # exact
    ("customer", "customers", False),
    ("*", "anything", True),         # bare star (prefix branch, empty prefix)
    ("*", "", True),
    ("a*b*c", "abc", False),         # two stars -> exact (reference quirk)
    ("a*b*c", "a*b*c", True),
]


@pytest.mark.parametrize("pattern,value,expected", TRUTH_TABLE)
def test_match_pattern(pattern, value, expected):
    assert match_pattern(pattern, value) is expected


@pytest.mark.parametrize("pattern,value,expected", TRUTH_TABLE)
def test_sql_condition_agrees(duck, pattern, value, expected):
    cond = pattern_to_sql_condition(pattern, "v")
    got = duck.execute(f"SELECT {cond} FROM (SELECT ? AS v)", [value]).fetchone()[0]
    assert bool(got) is expected


def test_config_roundtrip(tmp_path):
    cfg = PipelineConfig.gen_default()
    p = str(tmp_path / "cfg.json")
    cfg.save_to(p)
    loaded = PipelineConfig.load_from(p)
    assert loaded == cfg
    assert loaded.instances[0].black_list == ["tb01", "tb02"]


def test_instance_blacklist_precedence():
    inst = InstanceConfig(mq="m", schemas="test*", tables="s*",
                          black_list=["s_secret*"], topic="t")
    # blacklist beats table pattern (config.rs:44-48 checked before tables)
    assert match_pattern(inst.schemas, "testdb")
    assert match_pattern(inst.tables, "s_secret_1")
    assert match_pattern("s_secret*", "s_secret_1")
