"""Independent golden wire captures (round-11 verdict item #4).

Every MySQL/Kafka protocol path in this repo is otherwise verified
client-vs-fixture — both ends written here, so a shared misreading of a
spec could sit on both sides and pass silently. This module pins the
byte layouts against captures built BY HAND, field by field, straight
from the public protocol documentation (MySQL Internals manual packet
layouts; the Kafka protocol guide + KIP-98 record-batch spec; RFC
1952/8878, the LZ4 frame spec, the snappy format description, the
protobuf varint spec), and — where a checksum is involved — recomputes
it with an INLINE independent implementation (bit-serial CRC32C, a
from-scratch xxHash32), never the repo's table-driven codecs.

Both directions are pinned: the repo ENCODER must reproduce the hand
literal exactly, and the repo DECODER must parse the hand literal (which
never passed through the encoder) back to the source fields. The
compressed-batch captures splice spec-constructed frames (raw/stored
blocks only — hand-computable) into hand-built batches, so the fetch
path's decompressors are exercised on input no repo encoder produced.
"""

from __future__ import annotations

import socket
import struct
import threading
import zlib

import pytest

from ru_cdc_spark.sources.binlog_wire import decode_rotate
from ru_cdc_spark.sources.kafka_wire import (
    KafkaBrokerFixture,
    KafkaWireClient,
    _varint,
    crc32c,
    decode_record_batches,
    encode_record_batch,
    encode_subscription,
)
from ru_cdc_spark.sources.mysql_client import (
    decode_com_binlog_dump,
    decode_err,
    decode_handshake_v10,
    encode_com_binlog_dump,
    encode_com_ping,
    encode_com_query,
    encode_com_quit,
    encode_err,
    encode_handshake_v10,
    encode_packet,
    event_header,
    is_eof_packet,
    read_lenenc_int,
    write_lenenc_int,
)

# ---------------------------------------------------------------------------
# inline independent checksum implementations (never the repo's)
# ---------------------------------------------------------------------------


def crc32c_bitserial(data: bytes) -> int:
    """Castagnoli CRC, bit-at-a-time with the reflected polynomial
    0x82F63B78 — algorithmically different from kafka_wire's
    table-driven implementation."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0x82F63B78 if crc & 1 else crc >> 1
    return crc ^ 0xFFFFFFFF


def xxh32_independent(data: bytes, seed: int = 0) -> int:
    """xxHash32 from the published spec constants, written fresh here
    (functions/lz4.py has its own; this one exists so the LZ4 frame
    header-checksum golden isn't self-referential)."""
    P1, P2, P3, P4, P5 = (2654435761, 2246822519, 3266489917,
                          668265263, 374761393)
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 16 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = struct.unpack_from("<I", data, i + 4 * j)[0]
                v = (v + lane * P2) & M
                v = (rotl(v, 13) * P1) & M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 4 <= n:
        h = (h + struct.unpack_from("<I", data, i)[0] * P3) & M
        h = (rotl(h, 17) * P4) & M
        i += 4
    while i < n:
        h = (h + data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


class TestChecksumIndependents:
    def test_crc32c_check_value(self):
        # RFC 3720 appendix B.4 check value — pins BOTH implementations
        assert crc32c_bitserial(b"123456789") == 0xE3069283
        assert crc32c(b"123456789") == 0xE3069283

    def test_xxh32_agrees_with_repo(self):
        from ru_cdc_spark.functions.lz4 import xxhash32

        for blob in (b"", b"a", b"hello wire capture", bytes(range(64))):
            assert xxh32_independent(blob) == xxhash32(blob)


# ===========================================================================
# MySQL protocol goldens (MySQL Internals manual layouts)
# ===========================================================================

NONCE20 = bytes(range(1, 21))

# HandshakeV10, hand-built per the documented layout:
#   protocol(1) server_version(NUL) thread_id(4LE) auth-data-1(8)
#   filler(1) caps_low(2LE) charset(1) status(2LE) caps_high(2LE)
#   auth_data_len(1) reserved(10x00) auth-data-2(max(13,len-8), NUL-term)
#   auth_plugin_name(NUL)
HANDSHAKE_V10_GOLDEN = (
    b"\x0a"                                # protocol version 10
    + b"8.0.99-fixture\x00"                # server version
    + b"\x78\x56\x34\x12"                  # thread id 0x12345678 LE
    + NONCE20[:8]                          # auth-plugin-data part 1
    + b"\x00"                              # filler
    + b"\xff\x07"                          # capability flags, low 2 bytes
    + b"\xff"                              # charset 255 (utf8mb4_0900_ai_ci)
    + b"\x02\x00"                          # status: SERVER_STATUS_AUTOCOMMIT
    + b"\x08\x00"                          # capability flags, high 2 bytes
    + b"\x15"                              # auth data len = 21
    + b"\x00" * 10                         # reserved
    + NONCE20[8:] + b"\x00"                # part 2: 12 bytes + NUL = 13
    + b"mysql_native_password\x00"
)
HANDSHAKE_CAPS = 0x000807FF  # CLIENT_PLUGIN_AUTH (0x80000) | low 11 bits


class TestHandshakeV10Golden:
    def test_fixture_encoder_reproduces_capture(self):
        got = encode_handshake_v10(
            "8.0.99-fixture", 0x12345678, NONCE20, caps=HANDSHAKE_CAPS,
            charset=255, status=2, plugin="mysql_native_password")
        assert got == HANDSHAKE_V10_GOLDEN

    def test_client_decoder_parses_capture(self):
        hs = decode_handshake_v10(HANDSHAKE_V10_GOLDEN)
        assert hs.protocol_version == 10
        assert hs.server_version == "8.0.99-fixture"
        assert hs.thread_id == 0x12345678
        assert hs.caps == HANDSHAKE_CAPS
        assert hs.charset == 255
        assert hs.status == 2
        assert hs.auth_plugin_name == "mysql_native_password"
        assert hs.auth_plugin_data == NONCE20  # both parts, reassembled


class TestCommandGoldens:
    def test_com_query_framed(self):
        # the manual's classic example: COM_QUERY "select 1" is a
        # 9-byte payload framed as 09 00 00 00 03 ...
        assert (encode_packet(0, encode_com_query("select 1"))
                == b"\x09\x00\x00\x00\x03select 1")

    def test_com_ping_and_quit_framed(self):
        assert encode_packet(0, encode_com_ping()) == b"\x01\x00\x00\x00\x0e"
        assert encode_packet(0, encode_com_quit()) == b"\x01\x00\x00\x00\x01"

    def test_com_binlog_dump_capture(self):
        # 0x12 + pos(4LE) + flags(2LE) + server_id(4LE) + filename
        golden = (b"\x12"
                  + b"\x04\x00\x00\x00"     # pos 4 (first event)
                  + b"\x00\x00"             # flags 0 (block at EOF)
                  + b"\x64\x00\x00\x00"     # server id 100
                  + b"mysql-bin.000001")
        assert encode_com_binlog_dump(4, 100, "mysql-bin.000001") == golden
        assert decode_com_binlog_dump(golden) == (
            4, 0, 100, "mysql-bin.000001")


class TestErrEofGoldens:
    # the manual's ERR_Packet example: error 1096 (ER_NO_TABLES_USED),
    # SQL state HY000, "No tables used"
    ERR_GOLDEN = b"\xff\x48\x04#HY000No tables used"

    def test_err_encoder_reproduces_capture(self):
        assert encode_err(1096, "No tables used") == self.ERR_GOLDEN

    def test_err_decoder_parses_capture(self):
        e = decode_err(self.ERR_GOLDEN)
        assert (e.code, e.sql_state, e.message) == (
            1096, "HY000", "No tables used")

    def test_eof_capture(self):
        # EOF_Packet: fe + warnings(2LE) + status(2LE), total < 9 bytes
        assert is_eof_packet(b"\xfe\x00\x00\x02\x00")
        assert not is_eof_packet(b"\x00\x00\x00\x02\x00\x00\x00")


class TestLenencGoldens:
    # the documented length-encoded-integer forms
    CASES = [
        (0, b"\x00"),
        (250, b"\xfa"),
        (251, b"\xfc\xfb\x00"),
        (65535, b"\xfc\xff\xff"),
        (65536, b"\xfd\x00\x00\x01"),
        (16777215, b"\xfd\xff\xff\xff"),
        (16777216, b"\xfe\x00\x00\x00\x01\x00\x00\x00\x00"),
    ]

    @pytest.mark.parametrize("n,golden", CASES)
    def test_both_directions(self, n, golden):
        assert write_lenenc_int(n) == golden
        assert read_lenenc_int(golden, 0) == (n, len(golden))


class TestBinlogEventGoldens:
    def test_event_header_capture(self):
        # 19-byte common header: timestamp(4) type(1) server_id(4)
        # event_size(4) log_pos(4) flags(2)
        hdr = (b"\x00\x10\x5e\x5f"          # ts 1600000000
               + b"\x1e"                    # WRITE_ROWS_EVENTv2 (30)
               + b"\x01\x00\x00\x00"        # server id 1
               + b"\x1b\x00\x00\x00"        # event size 27
               + b"\xe8\x03\x00\x00"        # log pos 1000
               + b"\x00\x00")               # flags
        assert event_header(hdr + bytes(8)) == (30, 27, 1000)

    def test_rotate_capture(self):
        # ROTATE payload: position(8LE) + next file name (no NUL)
        name = b"mysql-bin.000007"
        ev = (b"\x00\x00\x00\x00"            # ts 0 (rotate is artificial)
              + b"\x04"                      # ROTATE_EVENT (4)
              + b"\x01\x00\x00\x00"
              + (19 + 8 + len(name)).to_bytes(4, "little")
              + b"\x00\x00\x00\x00"
              + b"\x00\x00"
              + b"\x04\x00\x00\x00\x00\x00\x00\x00"  # position 4
              + name)
        assert decode_rotate(ev) == ("mysql-bin.000007", 4)


# ===========================================================================
# Kafka protocol goldens (protocol guide + KIP-98 batch layout)
# ===========================================================================


class TestVarintGoldens:
    # zigzag varint vectors from the protobuf encoding spec Kafka cites
    CASES = [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-2, b"\x03"),
        (150, b"\xac\x02"),   # zigzag(150)=300
        (300, b"\xd8\x04"),   # zigzag(300)=600
        (-64, b"\x7f"),
        (64, b"\x80\x01"),
    ]

    @pytest.mark.parametrize("v,golden", CASES)
    def test_encode(self, v, golden):
        assert _varint(v) == golden


def _hand_batch(records_section: bytes, codec_bits: int,
                record_count: int) -> bytes:
    """Assemble a magic-2 record batch around a records section, with
    every framing field hand-packed and the CRC from the independent
    bit-serial implementation."""
    after_crc = (struct.pack(">h", codec_bits)          # attributes
                 + struct.pack(">i", record_count - 1)  # lastOffsetDelta
                 + struct.pack(">q", 0)                 # baseTimestamp
                 + struct.pack(">q", 0)                 # maxTimestamp
                 + struct.pack(">q", -1)                # producerId
                 + struct.pack(">h", -1)                # producerEpoch
                 + struct.pack(">i", -1)                # baseSequence
                 + struct.pack(">i", record_count)
                 + records_section)
    crc = crc32c_bitserial(after_crc)
    after_len = (struct.pack(">i", 0)                   # partitionLeaderEpoch
                 + bytes([2])                           # magic
                 + struct.pack(">I", crc)
                 + after_crc)
    return (struct.pack(">q", 0)                        # baseOffset
            + struct.pack(">i", len(after_len))
            + after_len)


# one record (key=b"k1", value=b"v1", no headers), every varint by hand
HAND_RECORD = (b"\x00"        # record attributes
               + b"\x00"      # timestamp delta (varint 0)
               + b"\x00"      # offset delta (varint 0)
               + b"\x04k1"    # key: zigzag varint len 2 + bytes
               + b"\x04v1"    # value
               + b"\x00")     # header count 0
HAND_RECORDS_SECTION = bytes([len(HAND_RECORD) << 1]) + HAND_RECORD


class TestRecordBatchGolden:
    def test_producer_reproduces_capture(self):
        golden = _hand_batch(HAND_RECORDS_SECTION, 0, 1)
        assert encode_record_batch([(b"k1", b"v1")]) == golden

    def test_consumer_parses_capture(self):
        out = decode_record_batches(_hand_batch(HAND_RECORDS_SECTION, 0, 1))
        assert len(out) == 1
        assert out[0]["crc_ok"]
        assert out[0]["base_offset"] == 0
        assert out[0]["producer_id"] == -1
        assert out[0]["records"] == [(0, b"k1", b"v1")]


class TestCompressedBatchGoldens:
    """One spec-constructed compressed frame per KIP-110 codec, spliced
    into a hand-built batch — input no repo encoder ever produced, so a
    shared encode/decode misreading cannot pass."""

    def _check(self, frame: bytes, codec_bits: int):
        out = decode_record_batches(_hand_batch(frame, codec_bits, 1))
        assert out[0]["crc_ok"]
        assert out[0]["records"] == [(0, b"k1", b"v1")]

    def test_gzip_stored_deflate(self):
        # RFC 1952 header + one stored (BTYPE=00) deflate block + trailer
        raw = HAND_RECORDS_SECTION
        n = len(raw)
        defl = b"\x01" + struct.pack("<HH", n, n ^ 0xFFFF) + raw
        frame = (b"\x1f\x8b\x08\x00"            # magic, deflate, no flags
                 + b"\x00\x00\x00\x00"          # mtime 0
                 + b"\x00\xff"                  # XFL 0, OS unknown
                 + defl
                 + struct.pack("<II", zlib.crc32(raw), n))
        self._check(frame, 1)

    def test_snappy_xerial_literal_block(self):
        # snappy format: uvarint(uncompressed len) + literal element
        # (tag = (len-1)<<2 for len <= 60), wrapped in xerial framing
        raw = HAND_RECORDS_SECTION
        sn = bytes([len(raw)]) + bytes([(len(raw) - 1) << 2]) + raw
        frame = (b"\x82SNAPPY\x00" + struct.pack(">ii", 1, 1)
                 + struct.pack(">i", len(sn)) + sn)
        self._check(frame, 2)

    def test_snappy_raw_unframed(self):
        # brokers also accept bare snappy without the xerial wrapper
        raw = HAND_RECORDS_SECTION
        sn = bytes([len(raw)]) + bytes([(len(raw) - 1) << 2]) + raw
        self._check(sn, 2)

    def test_lz4_frame_stored_block(self):
        # LZ4 frame: magic + FLG(version 01, block-indep) + BD(64KB) +
        # HC((xxh32(FLG..BD)>>8)&0xFF, independent impl) + one
        # uncompressed block (high bit of size set) + end mark
        raw = HAND_RECORDS_SECTION
        hdr = bytes([0x60, 0x40])
        hc = (xxh32_independent(hdr) >> 8) & 0xFF
        frame = (struct.pack("<I", 0x184D2204) + hdr + bytes([hc])
                 + struct.pack("<I", len(raw) | 0x80000000) + raw
                 + struct.pack("<I", 0))
        self._check(frame, 3)

    def test_zstd_raw_block(self):
        # RFC 8878: magic + FHD(single-segment, 1-byte FCS) + FCS +
        # one block header (last=1, type=raw, size) + raw bytes
        raw = HAND_RECORDS_SECTION
        n = len(raw)
        frame = (b"\x28\xb5\x2f\xfd" + bytes([0x20, n])
                 + (1 | (n << 3)).to_bytes(3, "little") + raw)
        self._check(frame, 4)


# ===========================================================================
# group-protocol goldens: JoinGroup v5 / SyncGroup v3
# ===========================================================================


def _str16(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _bytes32_hand(b: bytes) -> bytes:
    return struct.pack(">i", len(b)) + b


# ConsumerProtocolSubscription v0 for ["t1"], hand-built:
HAND_SUBSCRIPTION = (struct.pack(">h", 0)       # version
                     + struct.pack(">i", 1)     # topic count
                     + _str16("t1")
                     + _bytes32_hand(b""))      # user data

# ConsumerProtocolAssignment v0 {t1: [0]}, hand-built:
HAND_ASSIGNMENT = (struct.pack(">h", 0)
                   + struct.pack(">i", 1)
                   + _str16("t1")
                   + struct.pack(">i", 1) + struct.pack(">i", 0)
                   + _bytes32_hand(b""))


class _CaptureServer:
    """Accepts one connection, records each length-framed request, and
    answers from a scripted list of response bodies (correlation id is
    prepended automatically, mirroring the wire rule)."""

    def __init__(self, responses: list[bytes]) -> None:
        self.requests: list[bytes] = []
        self._responses = responses
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        conn, _ = self._srv.accept()
        with conn:
            for body in self._responses:
                hdr = conn.recv(4)
                if len(hdr) < 4:
                    return
                (size,) = struct.unpack(">i", hdr)
                req = b""
                while len(req) < size:
                    chunk = conn.recv(size - len(req))
                    if not chunk:
                        return
                    req += chunk
                self.requests.append(req)
                corr = req[4:8]  # api_key(2) + api_version(2) precede it
                msg = corr + body
                conn.sendall(struct.pack(">i", len(msg)) + msg)

    def close(self) -> None:
        self._srv.close()
        self._thread.join(timeout=2)


class TestGroupProtocolClientGoldens:
    """The CLIENT side against hand-built captures: the encoder must
    emit exactly the literal request, and the parser must read a
    hand-built literal response (which never touched the fixture)."""

    def test_join_group_v5_request_and_response(self):
        sub = encode_subscription(["t1"])
        assert sub == HAND_SUBSCRIPTION  # pin the subscription codec too

        response = (struct.pack(">i", 0)          # throttle (v2+)
                    + struct.pack(">h", 0)        # error
                    + struct.pack(">i", 3)        # generation
                    + _str16("range")
                    + _str16("m-1")               # leader
                    + _str16("m-1")               # this member
                    + struct.pack(">i", 1)        # member count
                    + _str16("m-1")
                    + _str16("i-1")               # instance id (v5+)
                    + _bytes32_hand(HAND_SUBSCRIPTION))  # metadata: BYTES
        srv = _CaptureServer([response])
        try:
            sock = socket.create_connection(("127.0.0.1", srv.port),
                                            timeout=5)
            sock.settimeout(5)
            c = KafkaWireClient(sock)
            got = c.join_group("g1", "", ["t1"], session_timeout_s=6.0,
                               instance_id="i-1", protocol="range",
                               user_data=b"")
            sock.close()
        finally:
            srv.close()

        assert got == (0, 3, "range", "m-1", "m-1",
                       [("m-1", HAND_SUBSCRIPTION)])

        # JoinGroup v5 request, hand-built per the protocol guide
        expected = (struct.pack(">h", 11)          # api_key JOIN_GROUP
                    + struct.pack(">h", 5)         # api_version
                    + struct.pack(">i", 1)         # correlation id
                    + _str16("ru-cdc-spark")       # client id
                    + _str16("g1")
                    + struct.pack(">i", 6000)      # session timeout ms
                    + struct.pack(">i", 30000)     # rebalance timeout ms
                    + _str16("")                   # member id (first join)
                    + _str16("i-1")                # group instance id
                    + _str16("consumer")           # protocol type
                    + struct.pack(">i", 1)         # protocol count
                    + _str16("range")
                    + _bytes32_hand(HAND_SUBSCRIPTION))
        assert srv.requests == [expected]

    def test_sync_group_v3_request_and_response(self):
        response = (struct.pack(">i", 0)           # throttle (v1+)
                    + struct.pack(">h", 0)
                    + _bytes32_hand(HAND_ASSIGNMENT))
        srv = _CaptureServer([response])
        try:
            sock = socket.create_connection(("127.0.0.1", srv.port),
                                            timeout=5)
            sock.settimeout(5)
            c = KafkaWireClient(sock)
            err, mine = c.sync_group("g1", 3, "m-1",
                                     [("m-1", HAND_ASSIGNMENT)],
                                     instance_id="i-1")
            sock.close()
        finally:
            srv.close()

        assert (err, mine) == (0, HAND_ASSIGNMENT)

        expected = (struct.pack(">h", 14)          # api_key SYNC_GROUP
                    + struct.pack(">h", 3)
                    + struct.pack(">i", 1)
                    + _str16("ru-cdc-spark")
                    + _str16("g1")
                    + struct.pack(">i", 3)         # generation
                    + _str16("m-1")
                    + _str16("i-1")
                    + struct.pack(">i", 1)         # assignment count
                    + _str16("m-1")
                    + _bytes32_hand(HAND_ASSIGNMENT))
        assert srv.requests == [expected]


class TestGroupProtocolFixtureGoldens:
    """The FIXTURE side against the same hand-built request bytes, sent
    over a raw socket (no KafkaWireClient anywhere): the coordinator
    must parse the literal v5/v3 layouts and answer per spec."""

    def _rpc(self, sock: socket.socket, payload: bytes) -> bytes:
        sock.sendall(struct.pack(">i", len(payload)) + payload)
        hdr = b""
        while len(hdr) < 4:
            hdr += sock.recv(4 - len(hdr))
        (size,) = struct.unpack(">i", hdr)
        resp = b""
        while len(resp) < size:
            resp += sock.recv(size - len(resp))
        return resp

    def test_join_then_sync_raw_bytes(self):
        broker = KafkaBrokerFixture().start()
        try:
            sock = socket.create_connection(("127.0.0.1", broker.port),
                                            timeout=15)
            sock.settimeout(15)
            join_req = (struct.pack(">h", 11) + struct.pack(">h", 5)
                        + struct.pack(">i", 7) + _str16("raw-golden")
                        + _str16("gg") + struct.pack(">i", 6000)
                        + struct.pack(">i", 30000)
                        + _str16("") + _str16("inst-raw")
                        + _str16("consumer") + struct.pack(">i", 1)
                        + _str16("range")
                        + _bytes32_hand(HAND_SUBSCRIPTION))
            resp = self._rpc(sock, join_req)

            # parse the v5 response with inline reads only
            pos = 0
            (corr,) = struct.unpack_from(">i", resp, pos); pos += 4
            assert corr == 7
            pos += 4  # throttle
            (err,) = struct.unpack_from(">h", resp, pos); pos += 2
            assert err == 0
            (gen,) = struct.unpack_from(">i", resp, pos); pos += 4
            assert gen >= 1

            def rd_str():
                nonlocal pos
                (ln,) = struct.unpack_from(">h", resp, pos)
                pos += 2
                if ln < 0:
                    return None
                s = resp[pos:pos + ln].decode()
                pos += ln
                return s

            proto = rd_str()
            leader = rd_str()
            member = rd_str()
            assert proto == "range"
            assert leader == member  # sole member leads
            (n_members,) = struct.unpack_from(">i", resp, pos); pos += 4
            assert n_members == 1
            assert rd_str() == member
            assert rd_str() == "inst-raw"   # v5 per-member instance id
            (mlen,) = struct.unpack_from(">i", resp, pos); pos += 4
            assert resp[pos:pos + mlen] == HAND_SUBSCRIPTION

            sync_req = (struct.pack(">h", 14) + struct.pack(">h", 3)
                        + struct.pack(">i", 8) + _str16("raw-golden")
                        + _str16("gg") + struct.pack(">i", gen)
                        + _str16(member) + _str16("inst-raw")
                        + struct.pack(">i", 1)
                        + _str16(member) + _bytes32_hand(HAND_ASSIGNMENT))
            resp2 = self._rpc(sock, sync_req)
            (corr2,) = struct.unpack_from(">i", resp2, 0)
            (err2,) = struct.unpack_from(">h", resp2, 8)  # after throttle
            (alen,) = struct.unpack_from(">i", resp2, 10)
            assert corr2 == 8 and err2 == 0
            assert resp2[14:14 + alen] == HAND_ASSIGNMENT
            sock.close()
        finally:
            broker.stop()
