"""Byte-level binlog codec tests (sources/binlog_wire.py): golden vectors
from the public format documentation plus structural roundtrips for every
event and column type the reference decodes (binlog.rs D1-D10, F1-F6)."""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal

import pytest

from ru_cdc_spark.sources import binlog_wire as w
from ru_cdc_spark.sources.binlog_frames import COLUMNS, SPECS, _row_values


def test_decimal_golden_vector_from_format_docs():
    # the documented example: DECIMAL(14,4) 1234567890.1234
    b = w.encode_decimal(Decimal("1234567890.1234"), 14, 4)
    assert b.hex() == "810dfb38d204d2"
    v, off = w.decode_decimal(b, 0, 14, 4)
    assert v == Decimal("1234567890.1234") and off == len(b)


@pytest.mark.parametrize("text", [
    "0.0001", "-0.0001", "99999999.9999", "-99999999.9999", "1.0000",
    "12345678.0001", "-1.5000",
])
def test_decimal_roundtrip_signs_and_scales(text):
    v, _ = w.decode_decimal(w.encode_decimal(Decimal(text), 12, 4), 0, 12, 4)
    assert v == Decimal(text)


def test_zero_date_decodes_null_and_real_date_roundtrips():
    assert w.decode_date(w.encode_date(w.ZERO_DATE), 0)[0] is None
    assert w.decode_date(w.encode_date(date(1995, 7, 14)), 0)[0] == date(1995, 7, 14)


@pytest.mark.parametrize("us", [
    0, 1000, 59_000, 3_600_000_000 + 123_000,
    -5 * 3600 * 1_000_000,                      # negative whole-second time
    837 * 3600 * 1_000_000 + 59 * 60 * 1_000_000 + 59_000_000 + 999_000,
])
def test_time2_roundtrip_including_negative(us):
    got, _ = w.decode_time2(w.encode_time2(us, 3), 0, 3)
    assert got == us


def test_time2_negative_fraction_rejected():
    with pytest.raises(ValueError):
        w.encode_time2(-1_500_000, 3)


def test_datetime2_and_timestamp2_fsp_roundtrip():
    dt = datetime(2024, 2, 29, 23, 59, 59, 999999)
    assert w.decode_datetime2(w.encode_datetime2(dt, 6), 0, 6)[0] == dt
    ts = 1_600_000_123 * 1_000_000 + 450_000
    assert w.decode_timestamp2(w.encode_timestamp2(ts, 2), 0, 2)[0] == ts
    # fsp=2 stores hundredths: sub-precision truncates (MySQL quantizes)
    assert w.decode_timestamp2(w.encode_timestamp2(ts + 999, 2), 0, 2)[0] == ts


def test_table_map_roundtrip_carries_specs_not_names():
    b = w.encode_table_map(42, "testdb", "wiretypes", SPECS)
    table_id, schema, table, specs = w.decode_table_map(b)
    assert (table_id, schema, table) == (42, "testdb", "wiretypes")
    assert specs == SPECS  # metadata (precision/scale/fsp/prefix) survives


def _norm(row):
    return tuple(None if v == w.ZERO_DATE else v for v in row)


def test_write_rows_multirow_with_null_bitmaps():
    rows = [_row_values(i) for i in range(13)]  # one full NULL-pattern cycle
    fr = w.encode_frame(42, "testdb", "wiretypes", SPECS, w.WRITE_ROWS_V2, rows)
    schema, table, etype, out = w.decode_frame(fr)
    assert (schema, table, etype) == ("testdb", "wiretypes", w.WRITE_ROWS_V2)
    assert len(out) == 13
    for want, got in zip(rows, out):
        for (name, _), a, b in zip(COLUMNS, _norm(want), got):
            if isinstance(a, float):
                assert b == pytest.approx(a, abs=1e-6), name
            else:
                assert b == a, name


def test_update_rows_pairs_and_delete_images():
    r0, r1, r2 = _row_values(20), _row_values(21), _row_values(22)
    upd = w.encode_rows_event(w.UPDATE_ROWS_V2, 42, SPECS, [(r0, r1)])
    et, pairs = w.decode_rows_event(upd, SPECS)
    assert et == w.UPDATE_ROWS_V2
    assert pairs[0][0][0] == 20 and pairs[0][1][0] == 21
    dele = w.encode_rows_event(w.DELETE_ROWS_V2, 42, SPECS, [r2])
    et, imgs = w.decode_rows_event(dele, SPECS)
    assert et == w.DELETE_ROWS_V2 and imgs[0][0] == 22


def test_signed_integer_widths():
    for t, lo, hi in [(w.T_TINY, -128, 127), (w.T_SHORT, -32768, 32767),
                      (w.T_INT24, -(1 << 23), (1 << 23) - 1),
                      (w.T_LONG, -(1 << 31), (1 << 31) - 1),
                      (w.T_LONGLONG, -(1 << 63), (1 << 63) - 1)]:
        spec = w.ColSpec(t)
        for v in (lo, -1, 0, 1, hi):
            got, _ = w.decode_value(w.encode_value(v, spec), 0, spec)
            assert got == v, (t, v)


def test_string_prefix_width_rule():
    # max_length > 255 -> 2-byte prefix; <= 255 -> 1-byte (reference
    # binlog.rs:311-321)
    long_spec = w.ColSpec(w.T_VARCHAR, (300,))
    short_spec = w.ColSpec(w.T_VARCHAR, (36,))
    s = "x" * 280
    assert w.encode_value(s, long_spec)[:2] == (280).to_bytes(2, "little")
    assert w.encode_value("ab", short_spec)[0] == 2
    assert w.decode_value(w.encode_value(s, long_spec), 0, long_spec)[0] == s


def test_rows_event_with_crc32_trailer():
    # streams written with binlog_checksum=CRC32 carry 4 trailing bytes;
    # checksum_bytes=4 must stop the row loop before them
    rows = [_row_values(i) for i in range(3)]
    ev = w.encode_rows_event(w.WRITE_ROWS_V2, 42, SPECS, rows)
    # append a fake CRC and patch event_size to include it (file format)
    size = int.from_bytes(ev[9:13], "little") + 4
    ev = ev[:9] + size.to_bytes(4, "little") + ev[13:] + b"\xde\xad\xbe\xef"
    et, out = w.decode_rows_event(ev, SPECS, checksum_bytes=4)
    assert et == w.WRITE_ROWS_V2 and len(out) == 3
    with pytest.raises(Exception):
        # without the allowance the CRC decodes as a bogus row image
        w.decode_rows_event(ev, SPECS, checksum_bytes=0)


def test_char_metadata_packing_roundtrip():
    # real TABLE_MAP packs CHAR length high bits into byte 0; lengths on
    # both sides of 255 must survive encode->decode
    for length in (1, 36, 255, 300, 1023):
        specs = [w.ColSpec(w.T_STRING, (length,))]
        b = w.encode_table_map(7, "db", "t", specs)
        _, _, _, got = w.decode_table_map(b)
        assert got[0].meta[0] == length, length


def test_mismatched_specs_raise():
    rows = [_row_values(0)]
    ev = w.encode_rows_event(w.WRITE_ROWS_V2, 42, SPECS, rows)
    with pytest.raises(ValueError, match="catalog drift"):
        w.decode_rows_event(ev, SPECS[:-1])


# ---------------------------------------------------------------------------
# ENUM / SET / BIT (beyond the reference's 16 types)
# ---------------------------------------------------------------------------


def test_enum_set_bit_value_codecs():
    # ENUM: 1-based index, little-endian in its packed width
    assert w.encode_value(3, w.ColSpec(w.T_ENUM, (1,))) == b"\x03"
    assert w.encode_value(300, w.ColSpec(w.T_ENUM, (2,))) == b"\x2c\x01"
    v, off = w.decode_value(b"\x2c\x01", 0, w.ColSpec(w.T_ENUM, (2,)))
    assert (v, off) == (300, 2)
    # SET: member bitmask
    assert w.encode_value(0b101, w.ColSpec(w.T_SET, (1,))) == b"\x05"
    # BIT: big-endian, ceil(bits/8) bytes — BIT(10) -> 2 bytes
    assert w.encode_value(0x2FF, w.ColSpec(w.T_BIT, (10,))) == b"\x02\xff"
    v, off = w.decode_value(b"\x02\xff", 0, w.ColSpec(w.T_BIT, (10,)))
    assert (v, off) == (0x2FF, 2)


def test_enum_set_ride_wire_as_string_with_real_type_in_meta():
    specs = [w.ColSpec(w.T_ENUM, (1,)), w.ColSpec(w.T_SET, (2,)),
             w.ColSpec(w.T_BIT, (10,)), w.ColSpec(w.T_STRING, (20,))]
    tm = w.encode_table_map(9, "db", "t", specs)
    # the on-wire column-type array shows STRING for ENUM/SET, BIT for BIT
    _, _, _, decoded = w.decode_table_map(tm)
    assert decoded == specs  # real types + widths recovered from meta
    # and a full frame roundtrips through that TABLE_MAP
    rows = [(2, 0b11, 777, "ch"), (1, 0, 0, "x" * 20)]
    frame = w.encode_frame(9, "db", "t", specs, w.WRITE_ROWS_V2, rows)
    _, _, _, out = w.decode_frame(frame)
    assert out == rows


def test_bit_widths_1_to_64_roundtrip():
    for bits in (1, 7, 8, 9, 16, 33, 64):
        spec = w.ColSpec(w.T_BIT, (bits,))
        val = (1 << bits) - 1
        enc = w.encode_value(val, spec)
        assert len(enc) == (bits + 7) // 8
        v, _ = w.decode_value(enc, 0, spec)
        assert v == val, bits


def test_format_description_bootstraps_checksum_mode():
    from ru_cdc_spark.sources import binlog_wire as w

    fde = w.encode_format_description(w.CHECKSUM_NONE)
    d = w.decode_format_description(fde)
    assert d["binlog_version"] == 4
    assert d["server_version"].startswith("5.7")
    assert d["checksum_bytes"] == 0


def test_heartbeat_roundtrip_carries_position():
    from ru_cdc_spark.sources import binlog_wire as w

    hb = w.encode_heartbeat("binlog.000042", log_pos=123456)
    ident, pos = w.decode_heartbeat(hb)
    assert (ident, pos) == ("binlog.000042", 123456)


def _crc_wrap(ev: bytes) -> bytes:
    """Append a real CRC32 trailer and fix the header size, as a
    binlog_checksum=CRC32 master would write the event."""
    import struct
    import zlib

    size = len(ev) + 4
    ev2 = bytearray(ev)
    struct.pack_into("<I", ev2, 9, size)
    return bytes(ev2) + zlib.crc32(bytes(ev2)).to_bytes(4, "little")


def test_assembler_strips_crc32_when_fde_declares_it():
    """A CRC32 stream: FORMAT_DESCRIPTION declares the algorithm, and the
    assembler strips 4 trailing bytes from every later event — SQL text
    stays clean, row decode loops stop before the trailer, and heartbeats
    advance the position with no row traffic."""
    from decimal import Decimal

    from ru_cdc_spark.sources import binlog_wire as w
    from ru_cdc_spark.sources.binlog_txn import TXN_COLUMNS, TxnAssembler

    specs = [s for _, s in TXN_COLUMNS]
    fde = _crc_wrap(w.encode_format_description(w.CHECKSUM_CRC32))
    assert w.decode_format_description(fde)["checksum_bytes"] == 4

    frame = w.encode_frame(7, "testdb", "t", specs, w.WRITE_ROWS_V2,
                           [[5, 50, Decimal("5.00"), "zz"]])
    tm_size = int.from_bytes(frame[9:13], "little")
    stream = (
        fde
        + _crc_wrap(w.encode_heartbeat("binlog.000007", log_pos=777))
        + _crc_wrap(w.encode_gtid(bytes(16), 3, 0, 3))
        + _crc_wrap(w.encode_query("BEGIN", schema="testdb"))
        + _crc_wrap(w.encode_rows_query("INSERT INTO t VALUES (5)"))
        + _crc_wrap(frame[:tm_size])          # TABLE_MAP
        + _crc_wrap(frame[tm_size:])          # WRITE_ROWS
        + _crc_wrap(w.encode_xid(321))
    )
    asm = TxnAssembler(capture_sql=True)
    rows = asm.feed(stream)
    assert len(rows) == 1
    r = rows[0]
    assert r["status"] == "committed" and r["xid"] == 321
    assert (r["i"], r["qty"], r["amount"], r["note"]) == (5, 50, "5.00", "zz")
    assert r["sql"] == "INSERT INTO t VALUES (5)"
    assert asm.last_heartbeat_pos == 777
    assert asm.checksum_bytes == 4


def test_fde_checksum_probe_verifies_crc_not_byte():
    """ADVICE fix: a checksum-free FDE whose post-header-length table
    happens to hold 0x01 at the CRC-probe offset must still decode as
    checksum_bytes=0 — CRC mode is only claimed when the trailing four
    bytes actually verify as the event's CRC32."""
    import ru_cdc_spark.sources.binlog_wire as w

    fde = bytearray(w.encode_format_description(w.CHECKSUM_NONE))
    size = int.from_bytes(fde[9:13], "little")
    fde[size - 5] = 0x01  # adversarial post-header-table byte
    got = w.decode_format_description(bytes(fde))
    assert got["checksum_bytes"] == 0

    # and the genuine CRC32 stream still detects its trailer
    crc_fde = _crc_wrap(w.encode_format_description(w.CHECKSUM_CRC32))
    assert w.decode_format_description(crc_fde)["checksum_bytes"] == 4


class TestOptionalMetadata:
    """WL#4618 TLV block golden vectors (layout: 1-byte field type +
    lenenc length + value; public libbinlogevents rows_event.h)."""

    def _specs(self):
        from ru_cdc_spark.sources.binlog_wire import (
            ColSpec,
            T_ENUM,
            T_LONG,
            T_SET,
            T_TINY,
            T_VARCHAR,
        )

        return [ColSpec(T_TINY), ColSpec(T_VARCHAR, (20,)),
                ColSpec(T_LONG), ColSpec(T_ENUM, (1,)),
                ColSpec(T_SET, (1,))]

    def test_golden_tlv_block_parses(self):
        from ru_cdc_spark.sources.binlog_wire import (
            _decode_optional_metadata,
        )

        # hand-assembled block over (tiny, varchar, long, enum, set):
        # numeric columns = [0 tiny, 2 long] -> SIGNEDNESS bits MSB-first
        blk = bytes([
            1, 1, 0b10000000,              # SIGNEDNESS: tiny unsigned
            4, 11,                         # COLUMN_NAME, 11 bytes
            1, ord("a"), 2, ord("b"), ord("c"),
            1, ord("d"), 1, ord("e"), 1, ord("f"),
            6, 8,                          # ENUM_STR_VALUE, 8 bytes
            2, 2, ord("o"), ord("n"), 3, ord("o"), ord("f"), ord("f"),
            5, 5,                          # SET_STR_VALUE, 5 bytes
            2, 1, ord("x"), 1, ord("y"),
            8, 1, 0,                       # SIMPLE_PRIMARY_KEY: col 0
        ])
        meta = _decode_optional_metadata(blk, 0, self._specs())
        assert meta["signedness"] == {0: True, 2: False}
        assert meta["column_names"] == ["a", "bc", "d", "e", "f"]
        assert meta["enum_labels"] == {3: ("on", "off")}
        assert meta["set_labels"] == {4: ("x", "y")}
        assert meta["primary_key"] == [0]

    def test_unknown_field_skipped_by_length(self):
        from ru_cdc_spark.sources.binlog_wire import (
            _decode_optional_metadata,
        )

        # DEFAULT_CHARSET (2) and GEOMETRY_TYPE (7) are valid-but-unused:
        # both must be skipped by length, and the pk after them parsed
        blk = bytes([2, 1, 255, 7, 2, 0, 0, 8, 1, 1])
        meta = _decode_optional_metadata(blk, 0, self._specs())
        assert meta["primary_key"] == [1]
        assert set(meta["raw"]) == {2, 7}

    def test_full_metadata_roundtrip_and_catalog_free_decode(self):
        from ru_cdc_spark.sources.binlog_wire import (
            ColSpec,
            T_ENUM,
            T_LONGLONG,
            T_SET,
            T_TINY,
            WRITE_ROWS_V2,
            decode_frame_ext,
            encode_frame,
        )

        specs = [ColSpec(T_TINY, unsigned=True),
                 ColSpec(T_LONGLONG, unsigned=True),
                 ColSpec(T_ENUM, (1,), labels=("p", "q")),
                 ColSpec(T_SET, (1,), labels=("m", "n"))]
        rows = [(200, (1 << 63) + 7, 2, 0b11), (255, (1 << 64) - 1, 0, 0)]
        fr = encode_frame(9, "db", "t", specs, WRITE_ROWS_V2, rows,
                          full_metadata=True,
                          column_names=["a", "b", "c", "d"],
                          primary_key=[1, 0])
        schema, table, _et, out, tm = decode_frame_ext(fr)
        assert (schema, table) == ("db", "t")
        assert tm["column_names"] == ["a", "b", "c", "d"]
        assert tm["primary_key"] == [1, 0]
        assert out == [(200, (1 << 63) + 7, "q", "m,n"),
                       (255, (1 << 64) - 1, "", "")]

    def test_without_metadata_classic_signed_decode(self):
        """No TLV block -> byte-identical classic behavior: signed ints,
        integer ENUM/SET values."""
        from ru_cdc_spark.sources.binlog_wire import (
            ColSpec,
            T_ENUM,
            T_TINY,
            WRITE_ROWS_V2,
            decode_frame,
            encode_frame,
        )

        specs = [ColSpec(T_TINY), ColSpec(T_ENUM, (1,))]
        fr = encode_frame(9, "db", "t", specs, WRITE_ROWS_V2, [(-56, 2)])
        assert decode_frame(fr)[3] == [(-56, 2)]


class TestLegacyTemporalGoldens:
    """Pre-5.6.4 wire formats, golden byte vectors from the public
    format (my_time.cc packing)."""

    def test_timestamp_type7(self):
        from ru_cdc_spark.sources.binlog_wire import (
            decode_timestamp_legacy,
        )

        # 2009-02-13 23:31:30 UTC = 1234567890
        assert decode_timestamp_legacy(
            (1234567890).to_bytes(4, "little"), 0) == \
            (1234567890_000000, 4)

    def test_time_type11_signed_packed(self):
        from ru_cdc_spark.sources.binlog_wire import decode_time_legacy

        # +101:30:45 -> packed 1013045; -02:30:15 -> -23015
        pos = (1013045).to_bytes(3, "little", signed=True)
        neg = (-23015).to_bytes(3, "little", signed=True)
        assert decode_time_legacy(pos, 0)[0] == \
            (101 * 3600 + 30 * 60 + 45) * 1_000_000
        assert decode_time_legacy(neg, 0)[0] == \
            -(2 * 3600 + 30 * 60 + 15) * 1_000_000

    def test_datetime_type12_packed_and_zero_date(self):
        from datetime import datetime

        from ru_cdc_spark.sources.binlog_wire import (
            decode_datetime_legacy,
        )

        b = (19991231235958).to_bytes(8, "little")
        assert decode_datetime_legacy(b, 0)[0] == \
            datetime(1999, 12, 31, 23, 59, 58)
        assert decode_datetime_legacy(bytes(8), 0)[0] is None

    def test_geometry_passthrough_keeps_srid_wkb(self):
        from ru_cdc_spark.sources.binlog_wire import (
            ColSpec,
            T_GEOMETRY,
            decode_value,
            encode_value,
        )

        payload = (4326).to_bytes(4, "little") + b"\x01\x01WKBBYTES"
        spec = ColSpec(T_GEOMETRY, (2,))
        wire = encode_value(payload, spec)
        assert wire[:2] == len(payload).to_bytes(2, "little")
        v, off = decode_value(wire, 0, spec)
        assert v == payload and off == len(wire)


class TestPartialRowImages:
    """binlog_row_image=MINIMAL/NOBLOB: sparse columns-present bitmaps,
    present-sized null bitmaps, ABSENT (unknown) distinct from None
    (NULL). Layout per the public ROWS_EVENT documentation; the
    reference reads the bitmap but assumes it full (binlog.rs:646-667)."""

    SPECS3 = [w.ColSpec(w.T_LONGLONG), w.ColSpec(w.T_LONG),
              w.ColSpec(w.T_VARCHAR, (36,))]

    def test_minimal_update_golden_bytes(self):
        # before: PK only (bit 0); after: changed col only (bit 1)
        ev = w.encode_rows_event(
            w.UPDATE_ROWS_V2, 9, self.SPECS3,
            [((7, w.ABSENT, w.ABSENT), (w.ABSENT, -5, w.ABSENT))],
            present=[True, False, False], present_after=[False, True, False])
        body = ev[19:]
        want = (
            (9).to_bytes(6, "little") + b"\x01\x00"   # table id + flags
            + b"\x02\x00"                              # extra-data len
            + b"\x03"                                  # lenenc ncols=3
            + b"\x01"                                  # before bitmap {0}
            + b"\x02"                                  # after bitmap {1}
            + b"\x00" + (7).to_bytes(8, "little")      # before: nulls, pk
            + b"\x00" + (-5 % (1 << 32)).to_bytes(4, "little")  # after
        )
        assert body == want
        et, rows = w.decode_rows_event(ev, self.SPECS3)
        assert et == w.UPDATE_ROWS_V2
        assert rows == [((7, w.ABSENT, w.ABSENT), (w.ABSENT, -5, w.ABSENT))]

    def test_null_bitmap_sized_over_present_columns_only(self):
        # 9 present of 16 -> 2-byte null bitmap (not 16-col 2-byte by
        # accident: use 8 present -> 1 byte vs full 16 -> 2 bytes)
        present = [True] * 8 + [False] * 8
        row = tuple(_row_values(26)[k] if k < 8 else w.ABSENT
                    for k in range(16))
        ev = w.encode_rows_event(w.DELETE_ROWS_V2, 42, SPECS, [row],
                                 present=present)
        et, out = w.decode_rows_event(ev, SPECS)
        got = out[0]
        assert got[8:] == (w.ABSENT,) * 8
        assert got[0] == 26
        # a NULL inside the sparse window stays NULL, not ABSENT
        assert _row_values(26)[0:8] == tuple(
            v if v is not None else None for v in got[0:8])

    def test_sparse_null_distinct_from_absent(self):
        before = (3, w.ABSENT, w.ABSENT)
        after = (w.ABSENT, None, w.ABSENT)  # present-but-NULL change
        ev = w.encode_rows_event(
            w.UPDATE_ROWS_V2, 9, self.SPECS3, [(before, after)],
            present=[True, False, False], present_after=[False, True, False])
        _, rows = w.decode_rows_event(ev, self.SPECS3)
        b, a = rows[0]
        assert a[1] is None and a[1] is not w.ABSENT
        assert a[0] is w.ABSENT and a[2] is w.ABSENT

    def test_absent_is_falsy_pickled_singleton(self):
        import pickle
        assert not w.ABSENT
        assert pickle.loads(pickle.dumps(w.ABSENT)) is w.ABSENT
        assert repr(w.ABSENT) == "ABSENT"

    def test_encoder_rejects_bitmap_row_mismatch(self):
        with pytest.raises(ValueError, match="contradicts present bitmap"):
            w.encode_rows_event(w.DELETE_ROWS_V2, 9, self.SPECS3,
                                [(3, 1, w.ABSENT)],
                                present=[True, False, False])
        with pytest.raises(ValueError, match="contradicts present bitmap"):
            w.encode_rows_event(w.DELETE_ROWS_V2, 9, self.SPECS3,
                                [(w.ABSENT, w.ABSENT, w.ABSENT)],
                                present=[True, False, False])

    def test_row_image_present_modes(self):
        specs = [w.ColSpec(w.T_LONGLONG), w.ColSpec(w.T_LONG),
                 w.ColSpec(w.T_BLOB, (2,)), w.ColSpec(w.T_JSON, (4,))]
        b, a = w.row_image_present(specs, "MINIMAL", [0], changed_cols=[1])
        assert b == [True, False, False, False]
        assert a == [False, True, False, False]
        b, a = w.row_image_present(specs, "NOBLOB", [0], changed_cols=[1])
        assert b == [True, True, False, False]   # blobs out of before
        assert a == [True, True, False, False]
        b, a = w.row_image_present(specs, "NOBLOB", [0], changed_cols=[3])
        assert a == [True, True, False, True]    # changed JSON stays in
        b, a = w.row_image_present(specs, "FULL", [0], changed_cols=[1])
        assert b == [True] * 4 and a == [True] * 4
        with pytest.raises(ValueError, match="binlog_row_image"):
            w.row_image_present(specs, "minimal", [0])

    def test_sparse_rows_with_crc32_trailer(self):
        ev = w.encode_rows_event(
            w.DELETE_ROWS_V2, 9, self.SPECS3,
            [(5, w.ABSENT, w.ABSENT), (6, w.ABSENT, w.ABSENT)],
            present=[True, False, False])
        size = int.from_bytes(ev[9:13], "little") + 4
        ev = ev[:9] + size.to_bytes(4, "little") + ev[13:] + b"\xde\xad\xbe\xef"
        et, out = w.decode_rows_event(ev, self.SPECS3, checksum_bytes=4)
        assert [r[0] for r in out] == [5, 6]

    def test_partial_json_update_with_minimal_images(self):
        # type 39 (PARTIAL_UPDATE) under MINIMAL: sparse before (PK only)
        # with a FULL JSON column present so diffs have a base, sparse
        # after carrying only the diffed JSON column
        specs = [w.ColSpec(w.T_LONGLONG), w.ColSpec(w.T_LONG),
                 w.ColSpec(w.T_JSON, (4,))]
        doc = {"a": 1, "b": [1, 2]}
        diffs = [(0, "$.a", 9)]  # REPLACE $.a
        before = (11, w.ABSENT, doc)
        after = (w.ABSENT, w.ABSENT, None)  # value comes from the diff
        ev = w.encode_partial_update_rows_event(
            7, specs, [(before, after, {2: diffs})],
            present=[True, False, True], present_after=[False, False, True])
        et, rows = w.decode_rows_event(ev, specs)
        assert et == w.PARTIAL_UPDATE_ROWS_EVENT
        import json
        b, a = rows[0]
        assert b[0] == 11 and b[1] is w.ABSENT
        assert json.loads(b[2]) == doc
        assert a[0] is w.ABSENT and a[1] is w.ABSENT
        assert json.loads(a[2]) == {"a": 9, "b": [1, 2]}

    def test_partial_json_diff_against_absent_base_raises(self):
        specs = [w.ColSpec(w.T_LONGLONG), w.ColSpec(w.T_JSON, (4,))]
        ev = w.encode_partial_update_rows_event(
            7, specs, [((11, w.ABSENT), (w.ABSENT, None),
                        {1: [(0, "$.a", 9)]})],
            present=[True, False], present_after=[False, True])
        with pytest.raises(ValueError, match="ABSENT before image"):
            w.decode_rows_event(ev, specs)

    def test_full_image_fast_path_unchanged(self):
        # default all-set bitmaps decode exactly as before (fast path)
        rows = [_row_values(i) for i in range(3)]
        ev = w.encode_rows_event(w.WRITE_ROWS_V2, 42, SPECS, rows)
        et, out = w.decode_rows_event(ev, SPECS)
        assert len(out) == 3 and all(w.ABSENT not in r for r in out)


class TestMalformedOptionalMetadata:
    """Adversarial WL#4618 TLV shapes a buggy or hostile server could
    emit: the parser's contract is stop-at-first-malformed-field (keep
    every well-formed field already parsed) and never throw — classic
    metadata decode must still succeed."""

    def _frame_with_tlv_tail(self, tail: bytes) -> bytes:
        # a well-formed TABLE_MAP for (LONGLONG, VARCHAR) with `tail`
        # appended where the TLV block lives
        specs = [w.ColSpec(w.T_LONGLONG), w.ColSpec(w.T_VARCHAR, (20,))]
        tm = w.encode_table_map(7, "db", "t", specs)
        body = tm[19:]
        patched = body + tail
        return w._header(w.TABLE_MAP_EVENT, len(patched)) + patched

    def test_truncated_length_prefix_stops_cleanly(self):
        # field type byte present, lenenc length cut off mid-varint
        ev = self._frame_with_tlv_tail(bytes([4, 0xFC]))  # COLUMN_NAME
        tid, _s, _t, specs, meta = w.decode_table_map_ext(ev)
        assert tid == 7 and len(specs) == 2
        assert "column_names" not in meta

    def test_declared_length_past_end_stops_cleanly(self):
        # SIGNEDNESS field claiming 200 bytes with 1 available
        ev = self._frame_with_tlv_tail(bytes([1, 200, 0xFF]))
        _tid, _s, _t, specs, meta = w.decode_table_map_ext(ev)
        assert len(specs) == 2
        assert not meta.get("signedness")

    def test_good_field_then_garbage_keeps_the_good_field(self):
        from ru_cdc_spark.sources.binlog_wire import (
            _encode_optional_metadata,
        )

        specs = [w.ColSpec(w.T_LONGLONG), w.ColSpec(w.T_VARCHAR, (20,))]
        good = _encode_optional_metadata(specs, ["pk", "name"], None)
        ev = self._frame_with_tlv_tail(good + bytes([9, 0xFE]))  # torn PK field
        _tid, _s, _t, _specs, meta = w.decode_table_map_ext(ev)
        assert meta.get("column_names") == ["pk", "name"]
        assert "primary_key" not in meta
