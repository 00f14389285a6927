"""MySQL compressed client/server protocol (CLIENT_COMPRESS zlib and
8.0.18+ CLIENT_ZSTD_COMPRESSION_ALGORITHM), from the published framing:
``3-byte compressed len | 1-byte compressed seq | 3-byte uncompressed
len`` with 0 marking a stored-raw payload. The reference negotiates
neither (its caps, mysql.rs:55-62) — a ``--compress``-configured WAN
replica account is unusable for it.

Covers the frame codec against raw captured bytes, threshold behavior,
multi-packet result sets, binlog dumps over compressed connections
(both algorithms, byte-identical to plain), TLS+compression stacking,
and the handshake-response zstd level byte."""

from __future__ import annotations

import socket
import threading
import zlib

import pytest

from ru_cdc_spark.sources.mysql_client import (
    CLIENT_COMPRESS,
    CLIENT_ZSTD_COMPRESSION_ALGORITHM,
    CompressedStream,
    MySQLConnection,
    MySQLError,
    PacketIO,
    decode_handshake_response41,
    encode_handshake_response41,
)
from ru_cdc_spark.sources.mysql_fixture_server import (
    MySQLFixtureServer,
    VirtualBinlog,
)


def _pair() -> tuple[socket.socket, socket.socket]:
    a, b = socket.socketpair()
    return a, b


class TestCompressedFrameCodec:
    def test_small_payload_stored_raw(self):
        a, b = _pair()
        cs = CompressedStream(a, "zlib")
        cs.sendall(b"tiny")  # < 50-byte threshold
        raw = b.recv(4096)
        a.close(), b.close()
        assert raw[:3] == (4).to_bytes(3, "little")
        assert raw[3] == 0                      # compressed seq
        assert raw[4:7] == b"\x00\x00\x00"      # ulen 0 = stored raw
        assert raw[7:] == b"tiny"

    def test_large_payload_zlib_compressed(self):
        a, b = _pair()
        cs = CompressedStream(a, "zlib")
        payload = b"A" * 1000
        cs.sendall(payload)
        raw = b.recv(4096)
        a.close(), b.close()
        clen = int.from_bytes(raw[:3], "little")
        ulen = int.from_bytes(raw[4:7], "little")
        assert ulen == 1000 and clen < 1000     # it actually shrank
        assert zlib.decompress(raw[7:7 + clen]) == payload

    def test_roundtrip_both_algorithms(self):
        for alg in ("zlib", "zstd"):
            a, b = _pair()
            tx, rx = CompressedStream(a, alg), CompressedStream(b, alg)
            msg = bytes(range(256)) * 300
            tx.sendall(msg)
            got = bytearray()
            while len(got) < len(msg):
                got += rx.recv(len(msg) - len(got))
            a.close(), b.close()
            assert bytes(got) == msg, alg

    def test_incompressible_payload_falls_back_to_raw(self):
        import os as _os

        a, b = _pair()
        cs = CompressedStream(a, "zlib")
        payload = _os.urandom(4096)  # deflate cannot shrink this
        cs.sendall(payload)
        raw = b.recv(1 << 16)
        a.close(), b.close()
        assert raw[4:7] == b"\x00\x00\x00"  # stored raw, not inflated
        assert raw[7:] == payload

    def test_declared_length_mismatch_rejected(self):
        a, b = _pair()
        comp = zlib.compress(b"X" * 100)
        # header lies: declares 999 uncompressed bytes
        a.sendall(len(comp).to_bytes(3, "little") + b"\x00"
                  + (999).to_bytes(3, "little") + comp)
        rx = CompressedStream(b, "zlib")
        with pytest.raises(ConnectionError):
            rx.recv(1)
        a.close(), b.close()

    def test_seq_resets_with_packet_io(self):
        a, b = _pair()
        io = PacketIO(a)
        io.sock = CompressedStream(a, "zlib")
        io.write_packet(b"\x03SELECT 1")
        assert io.sock.seq == 1
        io.reset_seq()
        assert io.sock.seq == 0 and io.seq == 0
        a.close(), b.close()


class TestHandshakeZstdLevel:
    def test_level_byte_roundtrip(self):
        caps = CLIENT_ZSTD_COMPRESSION_ALGORITHM | 0x0200 | 0x00080000
        resp = encode_handshake_response41(
            "u", b"x" * 20, caps=caps, plugin="mysql_native_password",
            zstd_level=7)
        out = decode_handshake_response41(resp)
        assert out.zstd_level == 7
        assert out.caps & CLIENT_ZSTD_COMPRESSION_ALGORITHM

    def test_absent_without_cap(self):
        resp = encode_handshake_response41("u", b"x" * 20)
        assert decode_handshake_response41(resp).zstd_level is None


@pytest.fixture(scope="module")
def server():
    srv = MySQLFixtureServer(
        binlog=VirtualBinlog.from_cdc_fixture(200)).start()
    yield srv
    srv.stop()


class TestCompressedConnection:
    @pytest.mark.parametrize("alg", ["zlib", "zstd"])
    def test_query_over_compressed(self, server, alg):
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     server.user, server.password,
                                     compress=alg) as conn:
            assert isinstance(conn.io.sock, CompressedStream)
            rs = conn.query("show binary logs")
            assert rs.rows and rs.rows[0][0] == "binlog.000001"
            assert conn.ping()

    @pytest.mark.parametrize("alg", ["zlib", "zstd"])
    def test_binlog_dump_byte_identical_to_plain(self, server, alg):
        def dump(**kw) -> list[bytes]:
            with MySQLConnection.connect(
                    "127.0.0.1", server.port, server.user,
                    server.password, **kw) as conn:
                conn.disable_checksum_var()
                return list(conn.binlog_dump("binlog.000001", 4))

        plain = dump()
        compressed = dump(compress=alg)
        assert len(plain) > 100
        assert compressed == plain  # framing transparent to the byte

    def test_large_result_set_over_compressed(self, server):
        """SHOW BINLOG EVENTS is the fat metadata listing — thousands
        of rows crossing many compressed frames."""
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     server.user, server.password,
                                     compress="zlib") as conn:
            rs = conn.query("show binlog events in 'binlog.000001'")
            plain_conn = MySQLConnection.connect(
                "127.0.0.1", server.port, server.user, server.password)
            rs2 = plain_conn.query("show binlog events in 'binlog.000001'")
            plain_conn.close()
            assert rs.rows == rs2.rows

    def test_unknown_algorithm_rejected(self, server):
        with pytest.raises(ValueError):
            MySQLConnection.connect("127.0.0.1", server.port,
                                    server.user, server.password,
                                    compress="lz77")

    def test_wrong_password_still_denied(self, server):
        with pytest.raises(MySQLError):
            MySQLConnection.connect("127.0.0.1", server.port,
                                    server.user, "wrong",
                                    compress="zlib")


class TestCompressedOverTls:
    def test_tls_then_compression_stack(self):
        srv = MySQLFixtureServer(
            binlog=VirtualBinlog.from_cdc_fixture(50), tls=True).start()
        try:
            ca = srv.tls_ca_path()
            with MySQLConnection.connect(
                    "127.0.0.1", srv.port, srv.user, srv.password,
                    ssl_ca=ca, ssl_hostname="localhost",
                    compress="zlib") as conn:
                import ssl as _ssl

                # compression wraps the TLS socket, not the raw one
                assert isinstance(conn.io.sock, CompressedStream)
                assert isinstance(conn.io.sock.sock, _ssl.SSLSocket)
                conn.disable_checksum_var()
                events = list(conn.binlog_dump("binlog.000001", 4))
                assert len(events) > 20
        finally:
            srv.stop()


class TestCompressCapabilityGate:
    def test_server_without_cap_refused(self):
        """A pre-8.0.18 server (no zstd cap bit) must make the client
        raise instead of silently sending uncompressed."""
        from ru_cdc_spark.sources.mysql_client import (
            SERVER_CAPS,
            encode_handshake_v10,
        )

        caps = SERVER_CAPS & ~(CLIENT_ZSTD_COMPRESSION_ALGORITHM
                               | CLIENT_COMPRESS)
        lsock = socket.socket()
        lsock.bind(("127.0.0.1", 0))
        lsock.listen(1)
        port = lsock.getsockname()[1]

        def serve() -> None:
            for _ in range(2):  # one accept per attempted algorithm
                conn, _ = lsock.accept()
                io = PacketIO(conn)
                io.write_packet(encode_handshake_v10(
                    "5.7.0-old", 1, b"n" * 20, caps=caps), seq=0)
                try:
                    io.read_packet()
                except (ConnectionError, OSError):
                    pass
                conn.close()

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        try:
            for alg in ("zlib", "zstd"):
                with pytest.raises(MySQLError) as ei:
                    MySQLConnection.connect("127.0.0.1", port, "u", "p",
                                            compress=alg)
                assert ei.value.code == 2026
        finally:
            lsock.close()
