"""Hypothesis fuzz of the binlog wire codec: random column schemas with
matched random values must round-trip encode_frame -> decode_frame
bit-exactly, across NULL patterns, UPDATE pairs, and CRC32 trailers."""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

from hypothesis import given, settings, strategies as st

import ru_cdc_spark.sources.binlog_wire as w

# (spec, value-strategy) generators per supported type


def _int_type(code, width_bits):
    lo = -(1 << (width_bits - 1))
    hi = (1 << (width_bits - 1)) - 1
    return st.just(w.ColSpec(code)), st.integers(lo, hi)


def _decimal():
    def build(prec_scale):
        prec, scale = prec_scale
        return w.ColSpec(w.T_NEWDECIMAL, (prec, scale))

    ps = st.tuples(st.integers(1, 30), st.integers(0, 10)).filter(
        lambda t: t[1] <= t[0])

    def values(spec):
        prec, scale = spec.meta
        max_unscaled = 10 ** prec - 1
        # string construction is context-EXACT; Decimal(n).scaleb(-s)
        # under the default 28-digit context silently rounds 29+-digit
        # unscaled values out of the column's range
        return st.integers(-max_unscaled, max_unscaled).map(
            lambda n: Decimal(f"{n}E-{scale}"))

    return ps.map(build), values


_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
    max_size=40)


def _varchar():
    spec = st.integers(1, 300).map(lambda n: w.ColSpec(w.T_VARCHAR, (max(n, 80),)))

    def values(s):
        return _TEXT.map(lambda t: t[:40])

    return spec, values


def _datetime2():
    spec = st.sampled_from([0, 2, 4, 6]).map(
        lambda f: w.ColSpec(w.T_DATETIME2, (f,)))

    def values(s):
        fsp = s.meta[0]
        unit = 10 ** (6 - 2 * ((fsp + 1) // 2)) if fsp else 1_000_000
        return st.integers(0, 2_000_000_000).map(
            lambda sec: datetime(1970, 1, 1)
            + timedelta(seconds=sec % 4_000_000_000 // 2,
                        microseconds=(sec % 1_000_000) // unit * unit))

    return spec, values


@st.composite
def schema_and_rows(draw):
    """A random schema (1-8 columns) with 1-5 matched value rows and a
    random NULL mask."""
    kinds = draw(st.lists(
        st.sampled_from(["tiny", "short", "int24", "long", "longlong",
                         "dec", "varchar", "dt"]),
        min_size=1, max_size=8))
    specs, val_strats = [], []
    for k in kinds:
        if k == "tiny":
            sp, vs = _int_type(w.T_TINY, 8)
            specs.append(draw(sp)); val_strats.append(vs)
        elif k == "short":
            sp, vs = _int_type(w.T_SHORT, 16)
            specs.append(draw(sp)); val_strats.append(vs)
        elif k == "int24":
            sp, vs = _int_type(w.T_INT24, 24)
            specs.append(draw(sp)); val_strats.append(vs)
        elif k == "long":
            sp, vs = _int_type(w.T_LONG, 32)
            specs.append(draw(sp)); val_strats.append(vs)
        elif k == "longlong":
            sp, vs = _int_type(w.T_LONGLONG, 64)
            specs.append(draw(sp)); val_strats.append(vs)
        elif k == "dec":
            sp, vs = _decimal()
            spec = draw(sp)
            specs.append(spec); val_strats.append(vs(spec))
        elif k == "varchar":
            sp, vs = _varchar()
            spec = draw(sp)
            specs.append(spec); val_strats.append(vs(spec))
        else:
            sp, vs = _datetime2()
            spec = draw(sp)
            specs.append(spec); val_strats.append(vs(spec))
    n_rows = draw(st.integers(1, 5))
    rows = []
    for _ in range(n_rows):
        row = []
        for strat in val_strats:
            if draw(st.booleans()):
                row.append(None)  # NULL-bitmap coverage
            else:
                row.append(draw(strat))
        rows.append(tuple(row))
    return specs, rows


@given(sr=schema_and_rows())
@settings(max_examples=150, deadline=None)
def test_random_schema_write_rows_roundtrip(sr):
    specs, rows = sr
    frame = w.encode_frame(7, "db", "t", specs, w.WRITE_ROWS_V2, rows)
    schema, table, etype, got = w.decode_frame(frame)
    assert (schema, table, etype) == ("db", "t", w.WRITE_ROWS_V2)
    assert got == rows


@given(sr=schema_and_rows())
@settings(max_examples=75, deadline=None)
def test_random_schema_update_pairs_roundtrip(sr):
    specs, rows = sr
    pairs = [(r, r) for r in rows]
    frame = w.encode_frame(7, "db", "t", specs, w.UPDATE_ROWS_V2, pairs)
    _, _, etype, got = w.decode_frame(frame)
    assert etype == w.UPDATE_ROWS_V2
    assert got == pairs


@given(sr=schema_and_rows())
@settings(max_examples=75, deadline=None)
def test_random_schema_survives_crc32_transport(sr):
    """The same frames served through the CRC32-wrapping virtual binlog
    and strip_checksum round-trip identically."""
    from ru_cdc_spark.sources.mysql_client import strip_checksum
    from ru_cdc_spark.sources.mysql_fixture_server import VirtualBinlog

    specs, rows = sr
    frame = w.encode_frame(7, "db", "t", specs, w.WRITE_ROWS_V2, rows)
    vb = VirtualBinlog(crc32=True)
    vb.append_blob(frame)
    stripped = b"".join(strip_checksum(ev) for _, _, ev in vb.events)
    _, _, _, got = w.decode_frame(stripped)
    assert got == rows


# -- MySQL binary JSON ------------------------------------------------------

_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(2**31), 2**31 - 1),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
            max_size=20),
)

_json_values = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(
            st.text(alphabet="abcdefgh_", min_size=1, max_size=8),
            children, max_size=5),
    ),
    max_leaves=12,
)


@given(v=_json_values)
@settings(max_examples=200, deadline=None)
def test_binary_json_roundtrip(v):
    """MySQL binary JSON (type 245) encode -> decode is identity for
    arbitrary nested documents."""
    from ru_cdc_spark.sources.mysql_json import decode_json, encode_json

    assert decode_json(encode_json(v)) == v
