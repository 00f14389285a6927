"""MySQL wire-protocol client tests: golden auth vectors, packet codecs,
and full client<->fixture-server exchanges over real TCP sockets
(reference parity: mysql.rs:47-94 connect/auth, protocal.rs:277-293
COM_BINLOG_DUMP, main.rs:109-130 serve loop)."""

from __future__ import annotations

import hashlib

import pytest

from ru_cdc_spark.sources.binlog_wire import decode_frame, decode_rotate
from ru_cdc_spark.sources.mysql_client import (
    ColDef,
    MySQLConnection,
    MySQLError,
    PacketIO,
    REFERENCE_CLIENT_CAPS,
    CLIENT_PLUGIN_AUTH,
    CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA,
    CLIENT_PROTOCOL_41,
    decode_col_def,
    decode_com_binlog_dump,
    decode_handshake_response41,
    decode_handshake_v10,
    decode_ok,
    decode_text_row,
    encode_col_def,
    encode_com_binlog_dump,
    encode_com_query,
    encode_handshake_response41,
    encode_handshake_v10,
    encode_ok,
    encode_packet,
    encode_text_row,
    event_header,
    iter_binlog_frames,
    native_password_scramble,
    read_lenenc_int,
    split_events,
    write_lenenc_int,
)
from ru_cdc_spark.sources.mysql_fixture_server import (
    MySQLFixtureServer,
    VirtualBinlog,
    patch_log_pos,
)


# --------------------------------------------------------------------------
# golden vectors
# --------------------------------------------------------------------------


class TestNativePasswordGolden:
    def test_known_vector(self):
        """Scramble recomputed by hand from the public construction:
        SHA1(pw) XOR SHA1(nonce + SHA1(SHA1(pw))) (mysql.rs:480-494)."""
        pw = b"replpass"
        nonce = bytes(range(1, 21))
        h1 = hashlib.sha1(pw).digest()
        h2 = hashlib.sha1(h1).digest()
        expected = bytes(
            a ^ b for a, b in
            zip(h1, hashlib.sha1(nonce + h2).digest()))
        assert native_password_scramble(pw, nonce) == expected
        assert len(expected) == 20

    def test_fixed_bytes(self):
        """Pinned output — any codec drift breaks this literal."""
        out = native_password_scramble(b"secret", bytes(20))
        assert out.hex() == (
            "8e7e678b27f70747e65fb2b381214427b0fced48")

    def test_empty_password_empty_scramble(self):
        assert native_password_scramble(b"", bytes(20)) == b""

    def test_nonce_truncated_to_20(self):
        a = native_password_scramble(b"x", bytes(range(1, 21)))
        b = native_password_scramble(b"x", bytes(range(1, 21)) + b"extra")
        assert a == b


class TestLenenc:
    @pytest.mark.parametrize("n", [0, 1, 250, 251, 65535, 65536,
                                   16777215, 16777216, 2**40])
    def test_roundtrip(self, n):
        b = write_lenenc_int(n)
        got, off = read_lenenc_int(b, 0)
        assert got == n and off == len(b)


class TestPacketFraming:
    def test_header_layout(self):
        pkt = encode_packet(3, b"abc")
        assert pkt == b"\x03\x00\x00\x03abc"

    def test_large_payload_splits(self):
        payload = bytes(0xFFFFFF) + b"xy"
        pkt = encode_packet(0, payload)
        # first frame: max length, seq 0; second: 2 bytes, seq 1
        assert pkt[:4] == b"\xff\xff\xff\x00"
        tail = pkt[4 + 0xFFFFFF:]
        assert tail == b"\x02\x00\x00\x01xy"


# --------------------------------------------------------------------------
# handshake packet codecs
# --------------------------------------------------------------------------


class TestHandshakeCodecs:
    def test_handshake_v10_roundtrip(self):
        nonce = bytes(range(40, 60))
        b = encode_handshake_v10("8.0.0-fixture", 7, nonce)
        hs = decode_handshake_v10(b)
        assert hs.server_version == "8.0.0-fixture"
        assert hs.thread_id == 7
        assert hs.auth_plugin_data == nonce
        assert hs.auth_plugin_name == "mysql_native_password"
        assert hs.caps & CLIENT_PLUGIN_AUTH
        assert hs.caps & CLIENT_PROTOCOL_41

    def test_handshake_response_roundtrip(self):
        scr = native_password_scramble(b"pw", bytes(20))
        b = encode_handshake_response41("repl", scr)
        r = decode_handshake_response41(b)
        assert r.user == "repl"
        assert r.auth_resp == scr
        assert r.plugin == "mysql_native_password"
        assert r.caps == REFERENCE_CLIENT_CAPS
        assert r.caps & CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA

    def test_handshake_response_with_db(self):
        b = encode_handshake_response41("u", b"", database="mydb")
        r = decode_handshake_response41(b)
        assert r.database == "mydb"

    def test_ok_roundtrip(self):
        ok = decode_ok(encode_ok(affected=3, last_insert_id=9,
                                 status=2, warnings=1))
        assert (ok.affected_rows, ok.last_insert_id,
                ok.status_flags, ok.warnings) == (3, 9, 2, 1)
        assert ok.is_ok


class TestComBinlogDump:
    def test_layout(self):
        """0x12 + pos(4 LE) + flags(2) + server_id(4) + filename
        (protocal.rs:285-293)."""
        b = encode_com_binlog_dump(1234, 100, "binlog.000001")
        assert b[0] == 0x12
        assert b[1:5] == (1234).to_bytes(4, "little")
        assert b[5:7] == b"\x00\x00"
        assert b[7:11] == (100).to_bytes(4, "little")
        assert b[11:] == b"binlog.000001"
        assert decode_com_binlog_dump(b) == (1234, 0, 100, "binlog.000001")

    def test_com_query(self):
        assert encode_com_query("desc t") == b"\x03desc t"


class TestResultSetCodecs:
    def test_col_def_roundtrip(self):
        c = decode_col_def(encode_col_def(ColDef(name="Position")))
        assert c.name == "Position"

    def test_text_row_null_is_none(self):
        """0xfb -> None (fixing the reference's literal-'NULL' quirk,
        protocal.rs:213)."""
        row = decode_text_row(encode_text_row(["a", None, "c"]), 3)
        assert row == ["a", None, "c"]


# --------------------------------------------------------------------------
# virtual binlog
# --------------------------------------------------------------------------


class TestVirtualBinlog:
    def test_positions_are_contiguous(self):
        vb = VirtualBinlog.from_cdc_fixture(100)
        pos = 4
        for start, end, ev in vb.events:
            assert start == pos
            assert end - start == len(ev)
            # header's log_pos field holds the end position
            assert event_header(ev)[2] == end
            pos = end
        assert vb.end_pos == pos

    def test_patch_log_pos(self):
        vb = VirtualBinlog.from_cdc_fixture(10)
        ev = patch_log_pos(vb.events[0][2], 999)
        assert event_header(ev)[2] == 999

    def test_split_events_inverts_concat(self):
        vb = VirtualBinlog.from_cdc_fixture(50)
        blob = b"".join(ev for _, _, ev in vb.events)
        assert split_events(blob) == [ev for _, _, ev in vb.events]


# --------------------------------------------------------------------------
# live socket exchanges
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def server():
    srv = MySQLFixtureServer(
        user="repl", password="replpass",
        binlog=VirtualBinlog.from_cdc_fixture(200),
        catalog={"testdb.wiretypes": [
            ("i", "bigint", "PRI"), ("t_long", "int", ""),
            ("t_varchar", "varchar(300)", "")]},
    ).start()
    yield srv
    srv.stop()


class TestClientServerExchange:
    def test_connect_and_ping(self, server):
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            assert conn.ping()
            assert conn.handshake.server_version == "8.0.0-fixture"
            # MySQL 8 default: the fixture advertises (and the client
            # speaks) caching_sha2_password out of the box
            assert conn.handshake.auth_plugin_name == \
                "caching_sha2_password"

    def test_wrong_password_rejected(self, server):
        with pytest.raises(MySQLError) as exc:
            MySQLConnection.connect("127.0.0.1", server.port,
                                    "repl", "wrong")
        assert exc.value.code == 1045

    def test_wrong_user_rejected(self, server):
        with pytest.raises(MySQLError):
            MySQLConnection.connect("127.0.0.1", server.port,
                                    "intruder", "replpass")

    def test_session_setup_statements(self, server):
        """The exact statements the reference issues before dumping
        (main.rs:82-90)."""
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            assert conn.disable_checksum_var().is_ok
            fname, pos = conn.show_master_status()
            assert fname == "binlog.000001"
            assert pos == server.binlog.end_pos

    def test_desc_table_field_meta(self, server):
        """DESC -> FieldMeta with PRI detection (mysql.rs:185-222)."""
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            metas = conn.desc_table("testdb", "wiretypes")
        assert [m.name for m in metas] == ["i", "t_long", "t_varchar"]
        assert [m.is_pk for m in metas] == [True, False, False]
        assert metas[0].field_type == "bigint"

    def test_desc_missing_table_errors(self, server):
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            with pytest.raises(MySQLError) as exc:
                conn.desc_table("nope", "nothing")
            assert exc.value.code == 1146

    def test_show_binlog_events(self, server):
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            rs = conn.query("show binlog events in 'binlog.000001'")
        assert rs.column_names[:3] == ["Log_name", "Pos", "Event_type"]
        assert rs.rows[0][2] == "Format_desc"
        # positions strictly increase
        positions = [int(r[1]) for r in rs.rows]
        assert positions == sorted(positions)

    def test_full_dump_decodes(self, server):
        """Dump from pos 4, reassemble frames the serve-loop way, byte-
        decode one — the complete reference read path over a socket."""
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            events = list(conn.binlog_dump("binlog.000001", 4))
        assert events, "no events streamed"
        frames = iter_binlog_frames(events)
        assert frames
        schema, table, etype, rows = decode_frame(frames[0][1])
        assert (schema, table) == ("testdb", "wiretypes")
        assert etype == 30 and len(rows) == 5

    def test_dump_resume_from_mid_position(self, server):
        """COM_BINLOG_DUMP from a later position yields exactly the
        suffix (C1-C3 resume semantics)."""
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            all_events = list(conn.binlog_dump("binlog.000001", 4))
        mid = event_header(all_events[len(all_events) // 2])[2]
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            tail = list(conn.binlog_dump("binlog.000001", mid))
        # the artificial ROTATE (timestamp 0) announces the file, then
        # the FDE replay precedes the suffix — exactly a live server's
        # dump preamble
        assert tail[0][4] == 4
        assert int.from_bytes(tail[0][0:4], "little") == 0
        assert tail[1][4] == 15
        suffix = [ev for ev in all_events if event_header(ev)[2] > mid]
        assert tail[2:] == suffix

    def test_dump_unknown_file_errors(self, server):
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            with pytest.raises(MySQLError) as exc:
                list(conn.binlog_dump("binlog.999999", 4))
            assert exc.value.code == 1236

    def test_dump_survives_server_stall_past_connect_timeout(self):
        """Round-6 regression for the round-5 driver-bench crash: the
        10s CONNECT timeout was left armed on the established socket,
        so any read stall >10s mid-dump raised a fatal 2013. The server
        here goes silent for 12s mid-dump; the dump must complete."""
        vb = VirtualBinlog.from_cdc_fixture(50)
        ref = MySQLFixtureServer(user="repl", password="replpass",
                                 binlog=vb).start()
        try:
            with MySQLConnection.connect("127.0.0.1", ref.port,
                                         "repl", "replpass") as conn:
                expected = list(conn.binlog_dump("binlog.000001", 4))
        finally:
            ref.stop()
        srv = MySQLFixtureServer(
            user="repl", password="replpass",
            binlog=vb,
            stall_mid_dump_secs=12.0,
        ).start()
        try:
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         "repl", "replpass",
                                         timeout=10.0) as conn:
                # post-connect the socket must block indefinitely
                assert conn.io.sock.gettimeout() is None
                events = list(conn.binlog_dump("binlog.000001", 4))
            assert events == expected  # full stream, nothing truncated
        finally:
            srv.stop()

    def test_concurrent_connections(self, server):
        """Slice-parallel readers each get a private, complete stream."""
        conns = [MySQLConnection.connect("127.0.0.1", server.port,
                                         "repl", "replpass")
                 for _ in range(4)]
        try:
            counts = {len(list(c.binlog_dump("binlog.000001", 4)))
                      for c in conns}
            assert len(counts) == 1
        finally:
            for c in conns:
                c.close()


class TestReferenceStyleClient:
    def test_auth_switch_path(self):
        """A client that (like the reference, mysql.rs:63-79) sends an
        empty auth response and garbage plugin name still authenticates
        via the AuthSwitch exchange — against a 5.7-style server whose
        default is mysql_native_password (the ONLY configuration the
        reference client can talk to; against a sha2-default server it
        would be switched to a plugin it cannot speak)."""
        import socket as socket_mod

        from ru_cdc_spark.sources.mysql_client import (
            decode_auth_switch_request,
            encode_handshake_response41,
        )

        server = MySQLFixtureServer(
            binlog=VirtualBinlog.from_cdc_fixture(5),
            default_auth="mysql_native_password").start()
        sock = socket_mod.create_connection(("127.0.0.1", server.port))
        io = PacketIO(sock)
        hs = decode_handshake_v10(io.read_packet())
        # reference quirk: password in the plugin-name field, empty auth
        io.write_packet(encode_handshake_response41(
            "repl", b"", plugin="replpass"))
        req = io.read_packet()
        plugin, _nonce = decode_auth_switch_request(req)
        assert plugin == "mysql_native_password"
        io.write_packet(native_password_scramble(
            b"replpass", hs.auth_plugin_data))
        ok = decode_ok(io.read_packet())
        assert ok.is_ok
        sock.close()
        server.stop()


class TestCatalogOverSocket:
    def test_load_from_mysql_populates_catalog(self, server):
        """The reference's startup path end to end: live DESC over the
        socket -> FieldMeta -> catalog registry, with missing tables
        landing in the negative cache (P6)."""
        from ru_cdc_spark.catalog import TableCatalog

        cat = TableCatalog()
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            cat.load_from_mysql(conn, [("testdb", "wiretypes"),
                                       ("testdb", "ghost")])
        schema = cat.lookup("testdb", "wiretypes")
        assert schema is not None
        assert schema.pk_names == ["i"]
        assert schema.mysql_types["t_long"] == "int"
        assert cat.is_dropped("testdb", "ghost")
        assert cat.lookup("testdb", "ghost") is None


class TestMultiFileRotation:
    def test_dump_crosses_file_boundary_with_rotate(self):
        """A dump starting in file 1 streams its events, a ROTATE (D12),
        then file 2's events — and the serve-loop frame reassembly
        resets its TABLE_MAP on the rotate so every frame decodes with
        in-file state only."""
        vb1 = VirtualBinlog.from_cdc_fixture(50, "binlog.000001")
        vb2 = VirtualBinlog.from_cdc_fixture(50, "binlog.000002")
        srv = MySQLFixtureServer(binlogs=[vb1, vb2]).start()
        try:
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         "repl", "replpass") as conn:
                fname, pos = conn.show_master_status()
                assert fname == "binlog.000002"
                events = list(conn.binlog_dump("binlog.000001", 4))
            types = [ev[4] for ev in events]
            assert 4 in types, "no ROTATE event streamed"
            rot_at = types.index(4)
            # events continue after the rotate (file 2's FDE + frames)
            assert 15 in types[rot_at + 1:]
            assert any(t in (30, 31, 32) for t in types[rot_at + 1:])
            frames = iter_binlog_frames(events)
            # both files' frames present and decodable
            assert len(frames) == 2 * len(iter_binlog_frames(
                [ev for _, _, ev in vb1.events]))
            decode_frame(frames[-1][1])
        finally:
            srv.stop()

    def test_resume_in_second_file(self):
        vb1 = VirtualBinlog.from_cdc_fixture(20, "binlog.000001")
        vb2 = VirtualBinlog.from_cdc_fixture(20, "binlog.000002")
        srv = MySQLFixtureServer(binlogs=[vb1, vb2]).start()
        try:
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         "repl", "replpass") as conn:
                rs = conn.query(
                    "show binlog events in 'binlog.000002'")
                assert all(r[0] == "binlog.000002" for r in rs.rows)
                mid = int(rs.rows[len(rs.rows) // 2][1])
                tail = list(conn.binlog_dump("binlog.000002", mid))
            # dump preamble is the artificial rotate naming file 2 (no
            # GENUINE file-boundary rotate — the dump starts in the
            # last file), then the replayed FDE, then only the suffix
            rotates = [ev for ev in tail if ev[4] == 4]
            assert len(rotates) == 1
            assert int.from_bytes(rotates[0][0:4], "little") == 0
            assert decode_rotate(rotates[0])[0] == "binlog.000002"
            suffix = [ev for s, _, ev in vb2.events if s >= mid]
            assert tail[2:] == suffix
        finally:
            srv.stop()


class TestConnectionPool:
    def test_recycles_clean_connections(self, server):
        from ru_cdc_spark.sources.mysql_client import (
            ConnectionPool,
            pooled_connection,
        )

        ConnectionPool.clear()
        with pooled_connection("127.0.0.1", server.port,
                               "repl", "replpass") as c1:
            first = c1
        with pooled_connection("127.0.0.1", server.port,
                               "repl", "replpass") as c2:
            assert c2 is first  # recycled, not re-dialed
            assert c2.show_master_status()[1] > 4
        ConnectionPool.clear()

    def test_error_exit_closes_instead_of_recycling(self, server):
        from ru_cdc_spark.sources.mysql_client import (
            ConnectionPool,
            pooled_connection,
        )

        ConnectionPool.clear()
        with pytest.raises(RuntimeError):
            with pooled_connection("127.0.0.1", server.port,
                                   "repl", "replpass") as c1:
                dirty = c1
                raise RuntimeError("boom")
        with pooled_connection("127.0.0.1", server.port,
                               "repl", "replpass") as c2:
            assert c2 is not dirty
        ConnectionPool.clear()

    def test_dead_idle_connection_discarded(self, server):
        from ru_cdc_spark.sources.mysql_client import (
            ConnectionPool,
            pooled_connection,
        )

        ConnectionPool.clear()
        with pooled_connection("127.0.0.1", server.port,
                               "repl", "replpass") as c1:
            zombie = c1
        zombie.io.sock.close()  # dies while idle in the pool
        with pooled_connection("127.0.0.1", server.port,
                               "repl", "replpass") as c2:
            assert c2 is not zombie
            assert c2.ping()
        ConnectionPool.clear()

    def test_pool_keys_include_credentials(self, server):
        """ADVICE fix: a caller with a DIFFERENT password must never be
        handed a connection authenticated under another credential —
        the wrong password has to surface as an auth failure."""
        from ru_cdc_spark.sources.mysql_client import (
            ConnectionPool,
            pooled_connection,
        )

        ConnectionPool.clear()
        with pooled_connection("127.0.0.1", server.port,
                               "repl", "replpass") as c1:
            good = c1
        with pytest.raises(MySQLError):
            with pooled_connection("127.0.0.1", server.port,
                                   "repl", "WRONGpass"):
                pass
        # the correctly-credentialed pool entry is untouched
        with pooled_connection("127.0.0.1", server.port,
                               "repl", "replpass") as c2:
            assert c2 is good
        ConnectionPool.clear()


class TestErrMidDump:
    def test_err_packet_mid_stream_raises_not_eof(self):
        """A server can abort a running dump with a real ERR packet
        (1236 — binlog purged under the reader). The client must raise
        it; treating it as end-of-stream would silently truncate the
        slice and commit offsets past undelivered frames."""
        vb = VirtualBinlog.from_cdc_fixture(100)
        srv = MySQLFixtureServer(binlog=vb, err_after_events=5).start()
        try:
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         "repl", "replpass") as conn:
                got = []
                with pytest.raises(MySQLError) as exc:
                    for ev in conn.binlog_dump("binlog.000001", 4):
                        got.append(ev)
                assert exc.value.code == 1236
                assert len(got) == 5  # events before the ERR delivered
        finally:
            srv.stop()

    def test_slice_reader_fails_loudly_on_mid_dump_err(self):
        """The socket source's slice reader propagates the mid-dump
        ERR instead of emitting a short slice."""
        from ru_cdc_spark.sources.mysql_socket_source import _dump_frames

        vb = VirtualBinlog.from_cdc_fixture(100)
        srv = MySQLFixtureServer(binlog=vb, err_after_events=3).start()
        try:
            with pytest.raises(MySQLError) as exc:
                _dump_frames("127.0.0.1", srv.port, "repl", "replpass",
                             "binlog.000001", 4, 1 << 30)
            assert exc.value.code == 1236
        finally:
            srv.stop()


class _FragmentedSocket:
    """A mock socket whose recv returns deterministically tiny
    fragments — the torn-TCP-segment adversary for PacketIO."""

    def __init__(self, data: bytes, sizes) -> None:
        self._data = data
        self._off = 0
        self._sizes = sizes  # iterator of fragment sizes
        self.sent = bytearray()

    def recv(self, want: int) -> bytes:
        if self._off >= len(self._data):
            return b""
        n = min(next(self._sizes), want, len(self._data) - self._off)
        n = max(n, 1)
        out = self._data[self._off:self._off + n]
        self._off += n
        return out

    def sendall(self, b: bytes) -> None:
        self.sent += b


class TestPacketIOFragmentation:
    """Short reads are the normal case on a real network (MTU-sized
    segments, GC-paused peers): framing must reassemble identical
    packets no matter how the byte stream is torn."""

    def _stream(self) -> tuple[bytes, list[bytes]]:
        payloads = [bytes([i % 251]) * (7 + 13 * i) for i in range(40)]
        wire = bytearray()
        for i, p in enumerate(payloads):
            wire += encode_packet(i & 0xFF, p)
        return bytes(wire), payloads

    def test_one_byte_recv(self):
        import itertools

        wire, payloads = self._stream()
        io = PacketIO(_FragmentedSocket(wire, itertools.repeat(1)))
        for want in payloads:
            assert io.read_packet() == want

    def test_deterministic_ragged_fragments(self):
        import itertools

        wire, payloads = self._stream()
        # fragment sizes cycle through awkward primes so packet
        # boundaries land mid-header, mid-length, mid-payload
        sizes = itertools.cycle([1, 2, 3, 5, 7, 11, 13, 1, 17, 2])
        io = PacketIO(_FragmentedSocket(wire, sizes))
        for want in payloads:
            assert io.read_packet() == want

    def test_jumbo_coalesced_recv(self):
        """The opposite adversary: everything arrives in ONE segment;
        the buffered reader must split it back into packets."""
        import itertools

        wire, payloads = self._stream()
        io = PacketIO(_FragmentedSocket(wire, itertools.repeat(1 << 30)))
        for want in payloads:
            assert io.read_packet() == want

    def test_peer_close_mid_packet_raises(self):
        import itertools

        wire, _ = self._stream()
        io = PacketIO(_FragmentedSocket(wire[:10], itertools.repeat(3)))
        with pytest.raises(ConnectionError):
            while True:
                io.read_packet()


class TestServerCrashMidDump:
    def test_disconnect_without_eof_raises(self):
        """A server that dies mid-dump (no EOF packet) must FAIL the
        read — treating the disconnect as end-of-stream would let a
        Spark task commit an offset past undelivered frames."""
        vb = VirtualBinlog.from_cdc_fixture(100)
        srv = MySQLFixtureServer(binlog=vb, die_after_events=5).start()
        try:
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         "repl", "replpass") as conn:
                with pytest.raises(MySQLError, match="mid-dump"):
                    list(conn.binlog_dump("binlog.000001", 4))
        finally:
            srv.stop()

    def test_clean_eof_still_terminates(self, server):
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            events = list(conn.binlog_dump("binlog.000001", 4))
        assert events  # ended via the EOF packet, no exception


class TestGtidDump:
    def test_gtid_set_codec_roundtrip(self):
        from ru_cdc_spark.sources.mysql_client import (
            decode_gtid_set,
            encode_gtid_set,
            gtid_in_set,
        )

        s = {bytes(range(16)): [(1, 21), (40, 51)],
             bytes(range(16, 32)): [(5, 6)]}
        assert decode_gtid_set(encode_gtid_set(s)) == s
        assert gtid_in_set(s, bytes(range(16)), 20)
        assert not gtid_in_set(s, bytes(range(16)), 21)
        assert not gtid_in_set(s, b"\x00" * 16, 1)

    def test_command_layout_roundtrip(self):
        from ru_cdc_spark.sources.mysql_client import (
            COM_BINLOG_DUMP_GTID,
            decode_com_binlog_dump_gtid,
            encode_com_binlog_dump_gtid,
        )

        gs = {bytes(16): [(1, 10)]}
        b = encode_com_binlog_dump_gtid(100, "binlog.000001", 4, gs)
        assert b[0] == COM_BINLOG_DUMP_GTID
        flags, sid, fname, pos, got = decode_com_binlog_dump_gtid(b)
        assert (flags, sid, fname, pos) == (0, 100, "binlog.000001", 4)
        assert got == gs

    def test_executed_set_filters_whole_transactions(self):
        """The server skips a masked GTID's ENTIRE group (BEGIN, rows,
        XID) — never a partial transaction."""
        from ru_cdc_spark.sources.binlog_txn import TXN_SID, TxnAssembler
        from ru_cdc_spark.sources.binlog_wire import decode_gtid

        vb = VirtualBinlog.from_txn_fixture(30)
        srv = MySQLFixtureServer(binlog=vb).start()
        try:
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         "repl", "replpass") as conn:
                evs = list(conn.binlog_dump_gtid(
                    {TXN_SID: [(1, 11), (20, 26)]}))
            gnos = {decode_gtid(ev)["gno"] for ev in evs if ev[4] == 33}
            assert gnos == set(range(11, 20)) | set(range(26, 31))
            # groups assemble whole: every committed txn has its rows
            asm = TxnAssembler()
            rows = []
            for ev in evs:
                rows += asm.feed(ev)
            assert {r["gno"] for r in rows} <= gnos
            committed = [r for r in rows if r["status"] == "committed"]
            assert committed
        finally:
            srv.stop()

    def test_empty_set_streams_everything(self):
        vb = VirtualBinlog.from_txn_fixture(10)
        srv = MySQLFixtureServer(binlog=vb).start()
        try:
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         "repl", "replpass") as conn:
                evs = list(conn.binlog_dump_gtid({}))
            assert sum(1 for ev in evs if ev[4] == 33) == 10
        finally:
            srv.stop()

    def test_checksummed_chain_boundary_rotate_decodes_clean(self):
        """A CRC32-checksummed multi-file chain dumped via GTID: the
        genuine file-boundary rotate carries a checksum trailer (like
        every other logged event), so decode_rotate(ev, 4) — what a
        checksum-aware assembler calls after learning checksum_bytes
        from the FDE — yields the EXACT next filename, not one
        truncated by 4 bytes (round-10 review finding: the GTID path
        built its rotate inline, bypassing the shared checksummed
        builder)."""
        from ru_cdc_spark.sources.binlog_txn import txn_event_bytes
        from ru_cdc_spark.sources.binlog_wire import (
            CHECKSUM_CRC32,
            encode_format_description,
        )

        chain = []
        for k, tids in enumerate(([0, 1], [2, 3])):
            vb = VirtualBinlog(f"crc.{k + 1:06d}", crc32=True)
            vb.append(encode_format_description(CHECKSUM_CRC32))
            for tid in tids:
                vb.append_blob(txn_event_bytes(tid))
            chain.append(vb)
        srv = MySQLFixtureServer(binlogs=chain).start()
        try:
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         "repl", "replpass") as conn:
                evs = list(conn.binlog_dump_gtid({}))
            genuine = [ev for ev in evs
                       if ev[4] == 4
                       and int.from_bytes(ev[0:4], "little") != 0]
            assert len(genuine) == 1
            assert decode_rotate(genuine[0], 4)[0] == "crc.000002"
            # the same chain over the legacy dump: byte-identical rotate
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         "repl", "replpass") as conn:
                evs2 = list(conn.binlog_dump("crc.000001", 4))
            genuine2 = [ev for ev in evs2
                        if ev[4] == 4
                        and int.from_bytes(ev[0:4], "little") != 0]
            assert genuine2 == genuine
        finally:
            srv.stop()


class TestBlockingLiveTail:
    """COM_BINLOG_DUMP without BINLOG_DUMP_NON_BLOCK (round 10): the
    real replica discipline — the server never EOFs at the tail, every
    appended event streams live over the SAME connection, and idle
    stretches carry HEARTBEAT(27) events whose log_pos advances the
    resume coordinate."""

    def _srv(self):
        from ru_cdc_spark.sources.binlog_wire import (
            CHECKSUM_NONE,
            ColSpec,
            T_LONG,
            T_LONGLONG,
            encode_format_description,
        )

        vb = VirtualBinlog()
        vb.append(encode_format_description(CHECKSUM_NONE))
        srv = MySQLFixtureServer(binlog=vb)
        srv.heartbeat_period_s = 0.05
        srv.start()
        t = srv.add_live_table("livetab", [
            ("id", ColSpec(T_LONGLONG)), ("val", ColSpec(T_LONG))])
        return srv, t

    def test_tail_streams_live_appends_and_heartbeats(self):
        import threading
        import time as _t

        srv, table = self._srv()
        try:
            table.insert((1, 10))
            events: list[bytes] = []
            saw_rows = threading.Event()
            done = threading.Event()

            def n_writes() -> int:
                return sum(1 for e in events if e[4] == 30)

            def tail():
                try:
                    with MySQLConnection.connect(
                            "127.0.0.1", srv.port, srv.user,
                            srv.password) as c:
                        for ev in c.binlog_dump("binlog.000001", 4,
                                                flags=0):
                            events.append(ev)
                            if ev[4] == 30:
                                saw_rows.set()
                            if n_writes() >= 2:
                                return  # hang up: ends the tail
                finally:
                    done.set()

            th = threading.Thread(target=tail)
            th.start()
            assert saw_rows.wait(10)  # pre-dump insert delivered
            # idle stretch: heartbeats must flow
            _t.sleep(0.3)
            hbs = [e for e in events if e[4] == 27]
            assert len(hbs) >= 2
            # heartbeat names the tip file and carries the sent end
            assert hbs[-1][19:].decode() == "binlog.000001"
            assert int.from_bytes(hbs[-1][13:17], "little") == \
                srv.binlog.end_pos
            # live append: arrives on the SAME connection, no redial
            table.insert((2, 20))
            assert done.wait(10)
            th.join(10)
            assert n_writes() == 2
            # the tail NEVER ended with an EOF — the client hung up
            assert all(e[4] != 0xFE for e in events)
        finally:
            srv.stop()

    def test_nonblock_dump_still_eofs_at_tail(self):
        srv, table = self._srv()
        try:
            table.insert((1, 10))
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         srv.user,
                                         srv.password) as c:
                evs = list(c.binlog_dump("binlog.000001", 4))  # default
            assert sum(1 for e in evs if e[4] == 30) == 1
            assert all(e[4] != 27 for e in evs)  # no heartbeats
        finally:
            srv.stop()


class TestAuthSwitchNonceEdge:
    def test_trailing_zero_nonce_survives_codec(self):
        """A server nonce may legitimately end in 0x00 — only the single
        terminator NUL may be stripped, or every derived scramble is
        wrong against a real server."""
        from ru_cdc_spark.sources.mysql_client import (
            decode_auth_switch_request,
            encode_auth_switch_request,
        )

        nonce = bytes(range(18)) + b"\x00\x00"
        plugin, data = decode_auth_switch_request(
            encode_auth_switch_request("caching_sha2_password", nonce))
        assert plugin == "caching_sha2_password"
        assert data == nonce


class TestRegisterSlave:
    def test_register_then_dump(self, server):
        """A real replica's startup order: COM_REGISTER_SLAVE (visible
        in SHOW SLAVE HOSTS) before COM_BINLOG_DUMP."""
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            ok = conn.register_slave(server_id=4242,
                                     report_host="replica-1",
                                     report_port=3307)
            assert ok.is_ok
            assert 4242 in server.registered_slaves
            assert list(conn.binlog_dump("binlog.000001", 4))
