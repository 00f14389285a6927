"""Hypothesis fuzz of the binlog wire codec: random column schemas with
matched random values must round-trip encode_frame -> decode_frame
bit-exactly, across NULL patterns, UPDATE pairs, and CRC32 trailers."""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

import struct

import pytest
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


# ---------------------------------------------------------------------------
# adversarial MINIMAL/NOBLOB sparse-image fuzz (round-9 verdict item #8):
# random present/null bitmap combinations must round-trip exactly;
# truncated sparse payloads and bitmap/column-count mismatches must fail
# LOUD (the torn-frame contract), never silently misdecode.
# ---------------------------------------------------------------------------


@st.composite
def sparse_schema_and_pairs(draw):
    """Random schema + random (before, after) pairs with independent
    random present bitmaps (each at least one column, like any real
    row image)."""
    specs, rows = draw(schema_and_rows())
    n = len(specs)
    mask = st.lists(st.booleans(), min_size=n, max_size=n).filter(any)
    pb = draw(mask)
    pa = draw(mask)
    pairs = [
        (tuple(v if keep else w.ABSENT for v, keep in zip(row, pb)),
         tuple(v if keep else w.ABSENT for v, keep in zip(row, pa)))
        for row in rows
    ]
    return specs, pairs, pb, pa


@given(sp=sparse_schema_and_pairs())
@settings(max_examples=150, deadline=None)
def test_sparse_update_random_bitmaps_roundtrip(sp):
    """UPDATE_ROWS_V2 under arbitrary present bitmaps: absent slots
    come back ABSENT (never None), present slots keep value/NULL
    exactly — across every random present/null combination."""
    specs, pairs, pb, pa = sp
    ev = w.encode_rows_event(w.UPDATE_ROWS_V2, 7, specs, pairs,
                             present=pb, present_after=pa)
    etype, got = w.decode_rows_event(ev, specs)
    assert etype == w.UPDATE_ROWS_V2
    assert got == pairs


@given(sp=sparse_schema_and_pairs())
@settings(max_examples=100, deadline=None)
def test_sparse_write_random_bitmaps_roundtrip(sp):
    specs, pairs, pb, _pa = sp
    images = [before for before, _ in pairs]
    ev = w.encode_rows_event(w.WRITE_ROWS_V2, 7, specs, images,
                             present=pb)
    _et, got = w.decode_rows_event(ev, specs)
    assert got == images


@given(sp=sparse_schema_and_pairs(), data=st.data())
@settings(max_examples=150, deadline=None)
def test_truncated_sparse_event_raises(sp, data):
    """Any truncation of a sparse rows event — mid-bitmap, mid-null-
    bitmap, mid-value, even one byte short — must raise, not decode:
    short slices silently int.from_bytes() to zeros otherwise."""
    specs, pairs, pb, pa = sp
    ev = w.encode_rows_event(w.UPDATE_ROWS_V2, 7, specs, pairs,
                             present=pb, present_after=pa)
    cut = data.draw(st.integers(min_value=0, max_value=len(ev) - 1),
                    label="cut")
    with pytest.raises((ValueError, IndexError, struct.error)):
        w.decode_rows_event(ev[:cut], specs)


@given(sp=sparse_schema_and_pairs(), extra=st.integers(1, 4))
@settings(max_examples=50, deadline=None)
def test_column_count_mismatch_raises(sp, extra):
    """A rows event whose lenenc column count disagrees with the
    TABLE_MAP's specs (catalog drift / corrupted frame) raises the
    drift error instead of shifting every bitmap and value."""
    specs, pairs, pb, pa = sp
    ev = w.encode_rows_event(w.UPDATE_ROWS_V2, 7, specs, pairs,
                             present=pb, present_after=pa)
    wrong = specs + [w.ColSpec(w.T_LONG)] * extra
    with pytest.raises(ValueError, match="columns"):
        w.decode_rows_event(ev, wrong)


@given(sp=sparse_schema_and_pairs())
@settings(max_examples=50, deadline=None)
def test_encoder_rejects_value_in_absent_slot(sp):
    """Encode-side contract: a row carrying a real value where the
    present bitmap says ABSENT is a caller bug and must raise (a
    silent drop would fabricate a sparse image that lies)."""
    specs, pairs, pb, pa = sp
    if all(pb):
        pb = pb[:-1] + [False]
    absent_at = pb.index(False)
    bad_before = tuple(
        0 if i == absent_at else v
        for i, v in enumerate(pairs[0][0]))
    with pytest.raises(ValueError, match="present bitmap"):
        w.encode_rows_event(
            w.UPDATE_ROWS_V2, 7, specs, [(bad_before, pairs[0][1])],
            present=pb, present_after=pa)


@given(sr=schema_and_rows())
@settings(max_examples=50, deadline=None)
def test_minimal_noblob_helper_masks_roundtrip(sr):
    """The real server-shaped masks (row_image_present MINIMAL/NOBLOB)
    round-trip through the same path as the random ones."""
    specs, rows = sr
    pk = [0]
    changed = [len(specs) - 1]
    for mode in ("MINIMAL", "NOBLOB"):
        pb, pa = w.row_image_present(specs, mode, pk,
                                     changed_cols=changed)
        masked = [
            (tuple(v if keep else w.ABSENT
                   for v, keep in zip(row, pb)),
             tuple(v if keep else w.ABSENT
                   for v, keep in zip(row, pa)))
            for row in rows
        ]
        ev = w.encode_rows_event(w.UPDATE_ROWS_V2, 7, specs, masked,
                                 present=pb, present_after=pa)
        _et, got = w.decode_rows_event(ev, specs)
        assert got == masked
