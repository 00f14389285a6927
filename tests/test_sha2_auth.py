"""caching_sha2_password: golden scramble vectors, RSA-OAEP/PEM codec
properties, and the live-socket fast-auth / full-auth / AuthSwitch
flows against the fixture server (MySQL 8's default plugin — the one
the reference client cannot speak, mysql.rs:480-494)."""

from __future__ import annotations

import hashlib

import pytest

from ru_cdc_spark.sources.mysql_client import (
    MySQLConnection,
    MySQLError,
)
from ru_cdc_spark.sources.mysql_fixture_server import (
    MySQLFixtureServer,
    VirtualBinlog,
)
from ru_cdc_spark.sources.sha2_auth import (
    encode_public_key_pem,
    generate_rsa_keypair,
    oaep_decrypt,
    oaep_encrypt,
    parse_public_key_pem,
    sha2_scramble,
    xor_password_nonce,
)


class TestScrambleGolden:
    def test_construction(self):
        """XOR(SHA256(pw), SHA256(SHA256(SHA256(pw)) || nonce)) — the
        published algorithm, recomputed by hand."""
        pw, nonce = b"replpass", bytes(range(1, 21))
        h1 = hashlib.sha256(pw).digest()
        h2 = hashlib.sha256(h1).digest()
        expected = bytes(a ^ b for a, b in
                         zip(h1, hashlib.sha256(h2 + nonce).digest()))
        assert sha2_scramble(pw, nonce) == expected
        assert len(expected) == 32

    def test_fixed_bytes(self):
        """Pinned literal — codec drift breaks this."""
        out = sha2_scramble(b"secret", bytes(20))
        assert out.hex() == ("43f310e10bb5dc03a3d70f912ba62b06"
                             "47a3be1d0562cb82a9ba3acbde2dc825")

    def test_empty_password(self):
        assert sha2_scramble(b"", bytes(20)) == b""

    def test_xor_password_repeats_nonce(self):
        nonce = bytes(range(1, 21))
        out = xor_password_nonce(b"x" * 30, nonce)
        assert len(out) == 31  # password + NUL terminator
        # position i undoes with nonce[i % 20]
        assert bytes(b ^ nonce[i % 20] for i, b in enumerate(out)) \
            == b"x" * 30 + b"\x00"


class TestRsaOaep:
    @pytest.fixture(scope="class")
    def keypair(self):
        return generate_rsa_keypair(1024)

    def test_pem_roundtrip(self, keypair):
        n, e, _d = keypair
        pem = encode_public_key_pem(n, e)
        assert pem.startswith(b"-----BEGIN PUBLIC KEY-----")
        assert parse_public_key_pem(pem) == (n, e)

    def test_encrypt_decrypt_roundtrip(self, keypair):
        n, e, d = keypair
        msg = xor_password_nonce(b"replpass", bytes(range(1, 21)))
        ct = oaep_encrypt(n, e, msg)
        assert len(ct) == 128  # k = 1024 bits
        assert oaep_decrypt(n, d, ct) == msg

    def test_tampered_ciphertext_rejected(self, keypair):
        n, e, d = keypair
        ct = bytearray(oaep_encrypt(n, e, b"hello"))
        ct[64] ^= 0xFF
        with pytest.raises(ValueError):
            oaep_decrypt(n, d, bytes(ct))

    def test_message_too_long_raises(self, keypair):
        n, e, _d = keypair
        with pytest.raises(ValueError):
            oaep_encrypt(n, e, bytes(128 - 2 * 20 - 1))


class TestLiveSha2Flows:
    @pytest.fixture()
    def server(self):
        srv = MySQLFixtureServer(
            binlog=VirtualBinlog.from_cdc_fixture(5)).start()
        yield srv
        srv.stop()

    def test_full_then_fast_auth(self, server):
        """First connection takes the RSA full-auth path (cache miss),
        the second fast-auths off the populated cache — both must
        succeed and behave identically afterwards."""
        assert not server._sha2_cache
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as c1:
            assert c1.ping()
        assert "repl" in server._sha2_cache  # full auth ran
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as c2:
            assert c2.ping()
            assert c2.show_master_status()[1] > 4

    def test_wrong_password_rejected_both_paths(self, server):
        with pytest.raises(MySQLError) as exc:
            MySQLConnection.connect("127.0.0.1", server.port,
                                    "repl", "wrong")
        assert exc.value.code == 1045
        # populate the cache, then fail again on the FAST path
        MySQLConnection.connect("127.0.0.1", server.port,
                                "repl", "replpass").close()
        with pytest.raises(MySQLError) as exc:
            MySQLConnection.connect("127.0.0.1", server.port,
                                    "repl", "wrong")
        assert exc.value.code == 1045

    def test_switch_down_to_native(self):
        """sha2-capable client vs a 5.7-style native-default server:
        the server AuthSwitches the client DOWN and the client
        re-scrambles under mysql_native_password."""
        srv = MySQLFixtureServer(
            binlog=VirtualBinlog.from_cdc_fixture(5),
            default_auth="mysql_native_password").start()
        try:
            with MySQLConnection.connect("127.0.0.1", srv.port,
                                         "repl", "replpass") as conn:
                assert conn.ping()
                assert conn.handshake.auth_plugin_name == \
                    "mysql_native_password"
        finally:
            srv.stop()

    def test_switch_up_to_sha2(self, server):
        """A client that initially offers mysql_native_password against
        the sha2-default server gets switched UP: the server sends
        AuthSwitchRequest(caching_sha2_password) and the exchange
        completes through the full sha2 flow."""
        import socket as socket_mod

        from ru_cdc_spark.sources.mysql_client import (
            PacketIO,
            decode_auth_switch_request,
            decode_handshake_v10,
            decode_ok,
            encode_handshake_response41,
            native_password_scramble,
        )
        from ru_cdc_spark.sources.sha2_auth import (
            FAST_AUTH_SUCCESS,
            PERFORM_FULL_AUTHENTICATION,
        )

        sock = socket_mod.create_connection(("127.0.0.1", server.port))
        try:
            io = PacketIO(sock)
            hs = decode_handshake_v10(io.read_packet())
            io.write_packet(encode_handshake_response41(
                "repl",
                native_password_scramble(b"replpass",
                                         hs.auth_plugin_data),
                plugin="mysql_native_password"))
            plugin, nonce = decode_auth_switch_request(io.read_packet())
            assert plugin == "caching_sha2_password"
            io.write_packet(sha2_scramble(
                b"replpass", nonce or hs.auth_plugin_data))
            more = io.read_packet()
            assert more[0] == 1
            if more[1] == PERFORM_FULL_AUTHENTICATION:
                io.write_packet(b"\x02")
                key_pkt = io.read_packet()
                n, e = parse_public_key_pem(key_pkt[1:])
                io.write_packet(oaep_encrypt(n, e, xor_password_nonce(
                    b"replpass", nonce or hs.auth_plugin_data)))
            else:
                assert more[1] == FAST_AUTH_SUCCESS
            assert decode_ok(io.read_packet()).is_ok
        finally:
            sock.close()

    def test_socket_cdc_pipeline_over_sha2(self, spark, server):
        """The distributed dump path authenticates per-task over the
        sha2 default — end-to-end proof the Spark ingest works against
        a MySQL-8-style server."""
        from ru_cdc_spark.sources.mysql_socket_source import (
            socket_cdc_frames,
        )

        frames = socket_cdc_frames(spark, "127.0.0.1", server.port,
                                   server.user, server.password,
                                   n_slices=4)
        assert frames.count() > 0
