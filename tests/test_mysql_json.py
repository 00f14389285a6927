"""MySQL binary JSON codec (sources/mysql_json.py): scalar/container
round-trips, inline-value rules, canonical key order, wire framing."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ru_cdc_spark.sources import mysql_json as mj
from ru_cdc_spark.sources import binlog_wire as bw


@pytest.mark.parametrize("v", [
    None, True, False,
    0, 1, -1, 32767, -32768, 32768, -32769, 2**31 - 1, -2**31,
    2**31, 2**63 - 1, -2**63, 2**63, 2**64 - 1,
    0.0, -1.5, 3.141592653589793,
    "", "x", "héllo wörld", "a" * 300,
    [], {}, [1, 2, 3], {"k": "v"},
    {"a": [1, {"b": None}], "c": {"d": [True, "s"]}},
])
def test_roundtrip(v):
    assert mj.decode_json(mj.encode_json(v)) == v


def test_type_codes_match_public_layout():
    # first byte of the document is the public type code
    assert mj.encode_json(None)[0] == 0x04
    assert mj.encode_json(5)[0] == 0x05          # int16
    assert mj.encode_json(40000)[0] == 0x07      # int32
    assert mj.encode_json(2**40)[0] == 0x09      # int64
    assert mj.encode_json(2**63)[0] == 0x0A      # uint64
    assert mj.encode_json(1.5)[0] == 0x0B
    assert mj.encode_json("s")[0] == 0x0C
    assert mj.encode_json({})[0] == 0x00         # small object
    assert mj.encode_json([])[0] == 0x02         # small array


def test_varint_string_length_multi_byte():
    s = "x" * 300          # length needs 2 varint bytes (300 > 127)
    b = mj.encode_json(s)
    assert b[1] == (300 & 0x7F) | 0x80 and b[2] == 300 >> 7
    assert mj.decode_json(b) == s


def test_canonical_key_order_by_length_then_bytes():
    doc = {"bb": 1, "a": 2, "ccc": 3, "ab": 4}
    assert mj.decode_json_text(mj.encode_json(doc)) == \
        '{"a":2,"ab":4,"bb":1,"ccc":3}'


def test_inline_scalars_stay_in_entry_table():
    # [true, 7] : both inlinable -> container size == header + entries
    b = mj.encode_json([True, 7])
    count = int.from_bytes(b[1:3], "little")
    size = int.from_bytes(b[3:5], "little")
    assert count == 2
    assert size == 4 + 2 * 3  # no value area at all


def test_wire_framing_as_json_column():
    spec = bw.ColSpec(bw.T_JSON, (2,))
    doc = {"id": 9, "vals": [1, None]}
    enc = bw.encode_value(doc, spec)
    n = int.from_bytes(enc[:2], "little")
    assert n == len(enc) - 2
    v, off = bw.decode_value(enc, 0, spec)
    assert off == len(enc)
    assert json.loads(v) == doc


json_scalars = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-(1 << 63), max_value=(1 << 64) - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=50))
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=8), children, max_size=6)),
    max_leaves=25)


@given(v=json_values)
@settings(max_examples=300, deadline=None)
def test_json_roundtrip_property(v):
    assert mj.decode_json(mj.encode_json(v)) == v


class TestLargeContainers:
    """LARGE-format containers (4-byte count/size/offsets): what a real
    server stores for documents > 64 KB."""

    def test_large_object_roundtrip(self):
        big = {"k%05d" % i: "v" * 50 for i in range(2000)}
        b = mj.encode_json(big)
        assert b[0] == 0x01  # J_LARGE_OBJECT
        assert mj.decode_json(b) == big

    def test_large_array_roundtrip(self):
        arr = ["x" * 100] * 1500
        b = mj.encode_json(arr)
        assert b[0] == 0x03  # J_LARGE_ARRAY
        assert mj.decode_json(b) == arr

    def test_int32_inlined_only_in_large(self):
        # int32 fits the large format's 4-byte value slot inline
        big = {"k%05d" % i: 100_000 + i for i in range(9000)}
        b = mj.encode_json(big)
        assert b[0] == 0x01
        assert mj.decode_json(b) == big

    def test_small_stays_small(self):
        b = mj.encode_json({"a": 1, "b": [True, None, "s"]})
        assert b[0] == 0x00

    def test_nested_small_inside_large(self):
        big = {"k%05d" % i: {"n": i, "s": "y" * 60} for i in range(1500)}
        b = mj.encode_json(big)
        assert b[0] == 0x01
        assert mj.decode_json(b) == big

    def test_boundary_just_under_and_over(self):
        # straddle the 64 KB small bound
        for n, expect_large in ((500, False), (1200, True)):
            doc = {"k%04d" % i: "w" * 50 for i in range(n)}
            b = mj.encode_json(doc)
            assert (b[0] == 0x01) == expect_large, (n, hex(b[0]))
            assert mj.decode_json(b) == doc

    def test_json_diff_value_may_be_large(self):
        from ru_cdc_spark.sources.mysql_json_diff import (
            DIFF_REPLACE,
            decode_json_diffs,
            encode_json_diffs,
        )

        big = {"k%05d" % i: "v" * 60 for i in range(1500)}
        diffs = [(DIFF_REPLACE, "$.payload", big)]
        assert decode_json_diffs(encode_json_diffs(diffs)) == diffs
