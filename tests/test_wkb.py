"""OGC WKB codec (functions/wkb.py): golden vectors from the published
spec layout, both byte orders, strict loud-failure decode, and
encode/decode roundtrip properties."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given
from hypothesis import strategies as st

from ru_cdc_spark.functions.wkb import (
    decode_mysql_geometry,
    decode_wkb,
    encode_wkb_linestring,
    encode_wkb_point,
    encode_wkb_polygon,
    n_points,
    wkt,
)


class TestGoldenVectors:
    def test_point_little_endian(self):
        # 01 (NDR) 01000000 (type 1) + doubles 10.0, 20.0 — assembled
        # from the spec layout independently of the encoder
        raw = bytes.fromhex(
            "0101000000"
            "0000000000002440"   # 10.0 LE
            "0000000000003440")  # 20.0 LE
        g = decode_wkb(raw)
        assert g == {"type": "POINT", "coords": (10.0, 20.0)}
        assert wkt(g) == "POINT(10 20)"
        assert encode_wkb_point(10.0, 20.0, little=True) == raw

    def test_point_big_endian(self):
        raw = bytes.fromhex(
            "00"
            "00000001"
            "4024000000000000"   # 10.0 BE
            "4034000000000000")  # 20.0 BE
        assert decode_wkb(raw)["coords"] == (10.0, 20.0)
        assert encode_wkb_point(10.0, 20.0, little=False) == raw

    def test_linestring_layout(self):
        raw = bytes.fromhex(
            "0102000000" "02000000"
            "000000000000f03f" "0000000000000040"   # (1, 2)
            "0000000000000840" "0000000000001040")  # (3, 4)
        g = decode_wkb(raw)
        assert g["type"] == "LINESTRING"
        assert g["coords"] == [(1.0, 2.0), (3.0, 4.0)]
        assert wkt(g) == "LINESTRING(1 2,3 4)"
        assert n_points(g) == 2

    def test_polygon_one_ring(self):
        ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]
        raw = encode_wkb_polygon([ring])
        g = decode_wkb(raw)
        assert g["type"] == "POLYGON"
        assert g["coords"] == [ring]
        assert wkt(g) == "POLYGON((0 0,4 0,4 4,0 0))"
        assert n_points(g) == 4


class TestStrictFailure:
    def test_unknown_type_raises(self):
        # 8 = CircularString, outside the simple-feature set MySQL stores
        raw = bytes([1]) + struct.pack("<I", 8) + b"\x00" * 16
        with pytest.raises(ValueError, match="unsupported WKB"):
            decode_wkb(raw)

    def test_bad_byte_order_raises(self):
        with pytest.raises(ValueError, match="byte order"):
            decode_wkb(bytes([2]) + b"\x00" * 20)

    def test_truncated_point_raises(self):
        raw = encode_wkb_point(1.0, 2.0)
        with pytest.raises(ValueError, match="truncated"):
            decode_wkb(raw[:-1])

    def test_truncated_ring_count_raises(self):
        raw = encode_wkb_polygon([[(0.0, 0.0)] * 4])
        with pytest.raises(ValueError, match="truncated"):
            decode_wkb(raw[:7])

    def test_trailing_bytes_raise(self):
        raw = encode_wkb_point(1.0, 2.0) + b"\x00"
        with pytest.raises(ValueError, match="trailing"):
            decode_wkb(raw)

    def test_short_srid_prefix_raises(self):
        with pytest.raises(ValueError, match="SRID"):
            decode_mysql_geometry(b"\x01\x02")


finite = st.floats(allow_nan=False, allow_infinity=False, width=64)
coord = st.tuples(finite, finite)


class TestRoundtrip:
    @given(coord, st.booleans())
    def test_point(self, pt, little):
        g = decode_wkb(encode_wkb_point(pt[0], pt[1], little))
        assert g == {"type": "POINT", "coords": pt}

    @given(st.lists(coord, max_size=20), st.booleans())
    def test_linestring(self, pts, little):
        g = decode_wkb(encode_wkb_linestring(pts, little))
        assert g == {"type": "LINESTRING", "coords": pts}

    @given(st.lists(st.lists(coord, max_size=8), max_size=4),
           st.booleans())
    def test_polygon(self, rings, little):
        g = decode_wkb(encode_wkb_polygon(rings, little))
        assert g == {"type": "POLYGON", "coords": rings}

    @given(st.integers(0, 0xFFFFFFFF), coord, st.booleans())
    def test_mysql_framing(self, srid, pt, little):
        raw = srid.to_bytes(4, "little") + encode_wkb_point(
            pt[0], pt[1], little)
        got_srid, g = decode_mysql_geometry(raw)
        assert got_srid == srid
        assert g["coords"] == pt


class TestMultiGeometries:
    def test_multipoint_mixed_endianness_members(self):
        from ru_cdc_spark.functions.wkb import (
            WKB_MULTIPOINT,
            encode_wkb_multi,
        )

        raw = encode_wkb_multi(WKB_MULTIPOINT, [
            encode_wkb_point(1.0, 2.0, little=True),
            encode_wkb_point(3.0, 4.0, little=False),  # spec allows it
        ])
        g = decode_wkb(raw)
        assert g["type"] == "MULTIPOINT"
        assert [m["coords"] for m in g["coords"]] == \
            [(1.0, 2.0), (3.0, 4.0)]
        assert wkt(g) == "MULTIPOINT((1 2),(3 4))"
        assert n_points(g) == 2

    def test_multipolygon_wkt_and_counts(self):
        from ru_cdc_spark.functions.wkb import (
            WKB_MULTIPOLYGON,
            encode_wkb_multi,
        )

        r1 = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]
        r2 = [(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 5.0)]
        raw = encode_wkb_multi(WKB_MULTIPOLYGON, [
            encode_wkb_polygon([r1]), encode_wkb_polygon([r2])])
        g = decode_wkb(raw)
        assert wkt(g) == ("MULTIPOLYGON(((0 0,2 0,2 2,0 0)),"
                          "((5 5,6 5,6 6,5 5)))")
        assert n_points(g) == 8

    def test_geometrycollection_heterogeneous(self):
        from ru_cdc_spark.functions.wkb import (
            WKB_GEOMETRYCOLLECTION,
            encode_wkb_multi,
        )

        raw = encode_wkb_multi(WKB_GEOMETRYCOLLECTION, [
            encode_wkb_point(7.0, 8.0),
            encode_wkb_linestring([(0.0, 0.0), (1.0, 1.0)])])
        g = decode_wkb(raw)
        assert wkt(g) == ("GEOMETRYCOLLECTION(POINT(7 8),"
                          "LINESTRING(0 0,1 1))")
        assert n_points(g) == 3

    def test_typed_multi_rejects_wrong_member(self):
        from ru_cdc_spark.functions.wkb import (
            WKB_MULTIPOINT,
            encode_wkb_multi,
        )

        raw = encode_wkb_multi(WKB_MULTIPOINT, [
            encode_wkb_linestring([(0.0, 0.0), (1.0, 1.0)])])
        with pytest.raises(ValueError, match="expected POINT"):
            decode_wkb(raw)

    def test_truncated_member_raises(self):
        from ru_cdc_spark.functions.wkb import (
            WKB_MULTIPOINT,
            encode_wkb_multi,
        )

        raw = encode_wkb_multi(WKB_MULTIPOINT, [
            encode_wkb_point(1.0, 2.0)])
        with pytest.raises(ValueError, match="truncated"):
            decode_wkb(raw[:-3])
