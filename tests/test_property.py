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


@given(
    ops=st.lists(
        st.tuples(
            st.integers(1, 5),                 # pk
            st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
            st.integers(0, 999),               # value payload
        ),
        min_size=1, max_size=12,
    ),
    data=st.data(),
)
@settings(max_examples=8, deadline=None)
def test_merge_versioned_order_independent(spark, ops, data):
    """The version-guarded merge converges to the same snapshot no matter
    how the change stream is permuted across micro-batches — the tombstone
    + seq-guard guarantee (the reference would corrupt under reorder; this
    is the documented fix)."""
    from pyspark.sql import functions as F
    from ru_cdc_spark.operators.merge import merge_versioned, snapshot_view

    seq_ops = list(enumerate(ops))  # (seq, (pk, type, val))
    perm = data.draw(st.permutations(seq_ops))
    n_splits = data.draw(st.integers(1, min(3, len(perm))))
    bounds = sorted(data.draw(
        st.lists(st.integers(0, len(perm)), min_size=n_splits - 1,
                 max_size=n_splits - 1)))
    batches, prev = [], 0
    for b in bounds + [len(perm)]:
        batches.append(perm[prev:b]); prev = b

    def to_df(items):
        rows = [
            (seq, typ,
             {"pk": pk, "v": val} if typ != "INSERT" else None,
             {"pk": pk, "v": val} if typ != "DELETE" else None)
            for seq, (pk, typ, val) in items
        ]
        return spark.createDataFrame(
            rows, "id long, type string, "
                  "before struct<pk:long,v:long>, after struct<pk:long,v:long>")

    snap = None
    for batch in batches:
        if batch:
            snap = merge_versioned(snap, to_df(batch), ["pk"])
    got = {(r.pk, r.v) for r in snapshot_view(snap).collect()}

    ordered = None
    for seq, op in sorted(seq_ops):
        ordered = merge_versioned(ordered, to_df([(seq, op)]), ["pk"])
    want = {(r.pk, r.v) for r in snapshot_view(ordered).collect()}
    assert got == want
