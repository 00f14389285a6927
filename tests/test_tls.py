"""Hand-rolled X.509/TLS materials (functions/x509.py) and the MySQL
CLIENT_SSL upgrade — certificate VERIFICATION included."""

from __future__ import annotations

import ssl

import pytest

from ru_cdc_spark.functions.x509 import (
    generate_rsa_private,
    pkcs1_v15_sign_sha256,
    rsa_private_key_pem,
    self_signed_cert_pem,
    write_tls_materials,
)
from ru_cdc_spark.sources.mysql_client import MySQLConnection, MySQLError
from ru_cdc_spark.sources.mysql_fixture_server import (
    MySQLFixtureServer,
    VirtualBinlog,
)


@pytest.fixture(scope="module")
def key():
    return generate_rsa_private(2048)


class TestMaterials:
    def test_signature_verifies_with_public_exponent(self, key):
        msg = b"to be signed"
        sig = pkcs1_v15_sign_sha256(key, msg)
        em = pow(int.from_bytes(sig, "big"), key["e"], key["n"])
        raw = em.to_bytes((key["n"].bit_length() + 7) // 8, "big")
        assert raw[:2] == b"\x00\x01"
        import hashlib

        assert raw.endswith(hashlib.sha256(msg).digest())

    def test_openssl_loads_chain(self, key, tmp_path):
        cert = tmp_path / "c.pem"
        kf = tmp_path / "k.pem"
        cert.write_bytes(self_signed_cert_pem(key))
        kf.write_bytes(rsa_private_key_pem(key))
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(str(cert), str(kf))  # raises if malformed

    def test_verified_loopback_handshake(self, tmp_path):
        import socket
        import threading

        cert, kf = write_tls_materials(str(tmp_path), cn="localhost",
                                       bits=2048)
        sctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        sctx.load_cert_chain(cert, kf)
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)

        def serve():
            conn, _ = srv.accept()
            tls = sctx.wrap_socket(conn, server_side=True)
            tls.sendall(b"ok")
            tls.close()

        threading.Thread(target=serve, daemon=True).start()
        cctx = ssl.create_default_context(cafile=cert)
        c = socket.create_connection(
            ("127.0.0.1", srv.getsockname()[1]))
        tls = cctx.wrap_socket(c, server_hostname="localhost")
        assert tls.recv(2) == b"ok"  # full chain + hostname verified
        tls.close()
        srv.close()


class TestMySQLOverTLS:
    @pytest.fixture(scope="class")
    def server(self):
        srv = MySQLFixtureServer(
            binlog=VirtualBinlog.from_cdc_fixture(60), tls=True).start()
        yield srv
        srv.stop()

    def test_connect_query_dump_over_tls(self, server):
        ca = server.tls_ca_path()
        with MySQLConnection.connect(
                "127.0.0.1", server.port, "repl", "replpass",
                ssl_ca=ca, ssl_hostname="localhost") as conn:
            assert conn.ping()
            assert conn.show_master_status()[1] > 4
            evs = list(conn.binlog_dump("binlog.000001", 4))
            assert len(evs) > 5
        # plaintext clients still work against a tls-OPTIONAL server
        with MySQLConnection.connect("127.0.0.1", server.port,
                                     "repl", "replpass") as conn:
            assert conn.ping()

    def test_wrong_ca_rejected(self, server, tmp_path):
        """A certificate signed by a DIFFERENT key must fail
        verification — proof the client actually checks."""
        other_ca, _ = write_tls_materials(str(tmp_path), bits=2048)
        with pytest.raises(ssl.SSLError):
            MySQLConnection.connect(
                "127.0.0.1", server.port, "repl", "replpass",
                ssl_ca=other_ca, ssl_hostname="localhost")

    def test_tls_required_against_non_tls_server_errors(self):
        srv = MySQLFixtureServer(
            binlog=VirtualBinlog.from_cdc_fixture(5)).start()
        try:
            ca = MySQLFixtureServer(
                binlog=VirtualBinlog.from_cdc_fixture(5),
                tls=True).tls_ca_path()
            with pytest.raises(MySQLError, match="TLS"):
                MySQLConnection.connect(
                    "127.0.0.1", srv.port, "repl", "replpass",
                    ssl_ca=ca)
        finally:
            srv.stop()

    def test_distributed_dump_over_tls(self, spark, server):
        """Every TASK's connection runs the verified-TLS upgrade —
        the socket CDC pipeline, encrypted end to end."""
        from ru_cdc_spark.sources.binlog_frames import decode_cdc_frames
        from ru_cdc_spark.sources.mysql_socket_source import (
            socket_cdc_frames,
        )

        frames = socket_cdc_frames(
            spark, "127.0.0.1", server.port, server.user,
            server.password, n_slices=4,
            ssl_ca=server.tls_ca_path(), ssl_hostname="localhost")
        n = decode_cdc_frames(frames.select("frame")).count()
        assert n > 0


class TestSha2OverTls:
    def test_full_auth_uses_cleartext_inside_tls(self):
        """Over TLS, the sha2 full-auth path sends the password in the
        clear INSIDE the encrypted channel (libmysqlclient behavior) —
        no RSA roundtrip; wrong passwords still reject."""
        srv = MySQLFixtureServer(
            binlog=VirtualBinlog.from_cdc_fixture(5), tls=True).start()
        try:
            ca = srv.tls_ca_path()
            assert not srv._sha2_cache
            with MySQLConnection.connect(
                    "127.0.0.1", srv.port, "repl", "replpass",
                    ssl_ca=ca, ssl_hostname="localhost") as conn:
                assert conn.ping()
            assert "repl" in srv._sha2_cache  # full auth completed
            # no RSA key was ever generated: the cleartext path ran
            assert srv._rsa_key is None
            with pytest.raises(MySQLError):
                MySQLConnection.connect(
                    "127.0.0.1", srv.port, "repl", "wrong",
                    ssl_ca=ca, ssl_hostname="localhost")
        finally:
            srv.stop()


class TestRequireSecureTransport:
    def test_plaintext_rejected_tls_accepted(self):
        """require_secure_transport=ON semantics: a plaintext handshake
        response gets ERR 3159; the TLS upgrade path works, including
        the pooled metadata connections."""
        from ru_cdc_spark.sources.mysql_client import (
            ConnectionPool,
            pooled_connection,
        )
        from ru_cdc_spark.sources.mysql_socket_source import (
            fetch_binlog_layout,
        )

        srv = MySQLFixtureServer(
            binlog=VirtualBinlog.from_cdc_fixture(20),
            tls_required=True).start()
        try:
            with pytest.raises(MySQLError) as exc:
                MySQLConnection.connect("127.0.0.1", srv.port,
                                        "repl", "replpass")
            assert exc.value.code == 3159
            ca = srv.tls_ca_path()
            with MySQLConnection.connect(
                    "127.0.0.1", srv.port, "repl", "replpass",
                    ssl_ca=ca, ssl_hostname="localhost") as conn:
                assert conn.ping()
            # metadata path over pooled TLS connections
            ConnectionPool.clear()
            fname, end, events = fetch_binlog_layout(
                "127.0.0.1", srv.port, "repl", "replpass",
                ssl_ca=ca, ssl_hostname="localhost")
            assert fname == "binlog.000001" and len(events) > 3
            # pooled TLS connection is recycled under its ssl-aware key
            with pooled_connection("127.0.0.1", srv.port, "repl",
                                   "replpass", ssl_ca=ca,
                                   ssl_hostname="localhost") as c1:
                first = c1
            with pooled_connection("127.0.0.1", srv.port, "repl",
                                   "replpass", ssl_ca=ca,
                                   ssl_hostname="localhost") as c2:
                assert c2 is first
            ConnectionPool.clear()
        finally:
            srv.stop()


class TestStreamingSourceOverTls:
    def test_stream_drains_against_tls_required_server(self, spark,
                                                       tmp_path):
        """The (file,pos)-offset streaming source against
        require_secure_transport=ON: metadata triggers AND dump reads
        all encrypt, and the topic drains exactly once."""
        from ru_cdc_spark.sources.binlog_frames import decode_cdc_frames
        from ru_cdc_spark.sources.mysql_socket_source import (
            register_binlog_socket_source,
        )

        srv = MySQLFixtureServer(
            binlog=VirtualBinlog.from_cdc_fixture(60),
            tls_required=True).start()
        try:
            register_binlog_socket_source(spark)
            out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
            for _ in range(3):
                stream = (spark.readStream.format("binlog_socket")
                          .option("host", "127.0.0.1")
                          .option("port", srv.port)
                          .option("user", srv.user)
                          .option("password", srv.password)
                          .option("ssl_ca", srv.tls_ca_path())
                          .option("ssl_hostname", "localhost")
                          .option("position_file",
                                  str(tmp_path / "pos.json"))
                          .option("events_per_batch", 20).load())
                q = (stream.writeStream.format("parquet")
                     .option("path", out)
                     .option("checkpointLocation", ck)
                     .trigger(availableNow=True).start())
                q.awaitTermination(120)
            frames = spark.read.parquet(out)
            decoded = decode_cdc_frames(frames.select("frame"))
            assert decoded.where("type = 'INSERT'") \
                .select("i").distinct().count() == 60
        finally:
            srv.stop()
