"""Property-based tests (hypothesis) for the round-3 wire codecs:
MySQL packet framing / lenenc / handshake / result sets, the RESP
codec, and the PNG codec — arbitrary-input roundtrips that unit
goldens can't cover."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from ru_cdc_spark.functions.png import decode_png, encode_png
from ru_cdc_spark.sources.mysql_client import (
    decode_handshake_response41,
    decode_handshake_v10,
    decode_ok,
    decode_text_row,
    encode_handshake_response41,
    encode_handshake_v10,
    encode_ok,
    encode_packet,
    encode_text_row,
    native_password_scramble,
    read_lenenc_int,
    write_lenenc_int,
)
from ru_cdc_spark.sources.resp import encode_command, read_reply, _LineReader


@given(n=st.integers(min_value=0, max_value=2**62))
@settings(max_examples=300, deadline=None)
def test_lenenc_roundtrip(n):
    got, off = read_lenenc_int(write_lenenc_int(n), 0)
    assert got == n and off == len(write_lenenc_int(n))


@given(payload=st.binary(max_size=2048), seq=st.integers(0, 255))
@settings(max_examples=200, deadline=None)
def test_packet_frame_parses_back(payload, seq):
    pkt = encode_packet(seq, payload)
    length = int.from_bytes(pkt[:3], "little")
    assert pkt[3] == seq
    assert pkt[4:4 + length] == payload


@given(pw=st.binary(min_size=1, max_size=40), nonce=st.binary(min_size=20,
                                                              max_size=20))
@settings(max_examples=200, deadline=None)
def test_scramble_is_20_bytes_and_deterministic(pw, nonce):
    a = native_password_scramble(pw, nonce)
    assert len(a) == 20
    assert a == native_password_scramble(pw, nonce)


_name = st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126,
                                       exclude_characters="\x00"),
                min_size=1, max_size=16)


# real servers draw nonce bytes from 0x01-0x7F (the NUL-terminated
# layout makes a 0x00 final byte ambiguous by construction)
_nonce = st.binary(min_size=20, max_size=20).map(
    lambda b: bytes((x % 126) + 1 for x in b))


@given(version=_name, thread_id=st.integers(0, 2**32 - 1),
       nonce=_nonce)
@settings(max_examples=200, deadline=None)
def test_handshake_v10_roundtrip(version, thread_id, nonce):
    hs = decode_handshake_v10(
        encode_handshake_v10(version, thread_id, nonce))
    assert hs.server_version == version
    assert hs.thread_id == thread_id
    assert hs.auth_plugin_data == nonce


@given(user=_name, auth=st.binary(max_size=32),
       db=st.one_of(st.none(), _name))
@settings(max_examples=200, deadline=None)
def test_handshake_response_roundtrip(user, auth, db):
    r = decode_handshake_response41(
        encode_handshake_response41(user, auth, database=db))
    assert r.user == user and r.auth_resp == auth and r.database == db


@given(affected=st.integers(0, 2**40), last_id=st.integers(0, 2**40),
       status=st.integers(0, 2**16 - 1), warnings=st.integers(0, 2**16 - 1))
@settings(max_examples=200, deadline=None)
def test_ok_packet_roundtrip(affected, last_id, status, warnings):
    ok = decode_ok(encode_ok(affected, last_id, status, warnings))
    assert (ok.affected_rows, ok.last_insert_id, ok.status_flags,
            ok.warnings) == (affected, last_id, status, warnings)


@given(row=st.lists(st.one_of(st.none(),
                              st.text(max_size=40)), min_size=1,
                    max_size=8))
@settings(max_examples=200, deadline=None)
def test_text_row_roundtrip(row):
    assert decode_text_row(encode_text_row(row), len(row)) == row


# -- RESP ------------------------------------------------------------------


class _FakeSock:
    def __init__(self, data: bytes) -> None:
        self.data = data

    def recv(self, n: int) -> bytes:
        out, self.data = self.data[:n], self.data[n:]
        return out


@given(args=st.lists(st.binary(max_size=64), min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_resp_command_parses_as_array(args):
    frame = encode_command(*args)
    got = read_reply(_LineReader(_FakeSock(frame)))
    assert got == list(args)


# -- PNG -------------------------------------------------------------------


@given(h=st.integers(1, 24), w=st.integers(1, 24),
       seed=st.integers(0, 2**31 - 1),
       channels=st.sampled_from([1, 3, 4]))
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_any_shape(h, w, seed, channels):
    rng = np.random.RandomState(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    px = rng.randint(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)
