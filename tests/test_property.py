"""Property-based tests (hypothesis): the wildcard matcher agrees with its
SQL compilation on arbitrary inputs; type-code mapping is total; TIME
parsing matches an independent Python model on random batches."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from ru_cdc_spark.config import match_pattern, pattern_to_sql_condition
from ru_cdc_spark.functions.typemap import jdbc_type_code, mysql_type_to_spark

_chars = st.text(alphabet="ab_%'", max_size=6)
_pattern = st.one_of(
    _chars,                                                   # exact
    _chars.map(lambda s: s + "*"),                            # prefix
    _chars.map(lambda s: "*" + s),                            # suffix
    st.tuples(_chars, _chars).map(lambda t: t[0] + "*" + t[1]),  # middle
    st.just("*"),
)


@given(pattern=_pattern, value=st.text(alphabet="ab_%'", max_size=8))
@settings(max_examples=300, deadline=None)
def test_wildcard_python_sql_agree(pattern, value):
    cond = pattern_to_sql_condition(pattern, "v")
    got = duckdb.sql(
        f"SELECT {cond} FROM (SELECT ? AS v)", params=[value]
    ).fetchone()[0]
    assert bool(got) is match_pattern(pattern, value), (pattern, value, cond)


@given(t=st.text(max_size=30))
@settings(max_examples=300, deadline=None)
def test_type_code_total(t):
    code = jdbc_type_code(t)
    assert isinstance(code, int)
    mysql_type_to_spark(t)  # never raises either


@given(
    rows=st.lists(
        st.tuples(
            st.booleans(),                      # negative?
            st.integers(0, 838),                # hours
            st.integers(0, 59), st.integers(0, 59),
            st.one_of(st.none(), st.integers(0, 999999)),  # frac micros
        ),
        min_size=1, max_size=50,
    )
)
@settings(max_examples=10, deadline=None)
def test_time_parse_matches_model(spark, rows):
    from pyspark.sql import functions as F

    from ru_cdc_spark.functions.mysql_types import time_to_microseconds

    def fmt(neg, h, m, s, frac):
        base = f"{'-' if neg else ''}{h:02d}:{m:02d}:{s:02d}"
        if frac is not None:
            base += f".{frac:06d}"
        return base

    def model(neg, h, m, s, frac):
        us = (h * 3600 + m * 60 + s) * 1_000_000 + (frac or 0)
        return -us if neg else us

    texts = [(fmt(*r),) for r in rows]
    expected = [model(*r) for r in rows]
    df = spark.createDataFrame(texts, ["t"])
    got = [r["us"] for r in
           df.select(time_to_microseconds(F.col("t")).alias("us")).collect()]
    assert got == expected
