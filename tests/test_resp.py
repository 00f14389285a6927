"""RESP wire-protocol codec tests (golden frames from the public spec)
plus live client<->fixture exchanges."""

from __future__ import annotations

import pytest

from ru_cdc_spark.sources.resp import (
    RespClient,
    RespError,
    RespServerFixture,
    encode_command,
)


class TestEncoding:
    def test_command_frame_golden(self):
        """The spec's canonical example framing."""
        assert encode_command("LLEN", "mylist") == \
            b"*2\r\n$4\r\nLLEN\r\n$6\r\nmylist\r\n"

    def test_binary_safe_payload(self):
        raw = b"\x00\xff\r\nbinary"
        frame = encode_command("RPUSH", "k", raw)
        assert b"$%d\r\n" % len(raw) + raw in frame


@pytest.fixture()
def server():
    with RespServerFixture() as srv:
        yield srv


class TestLiveExchange:
    def test_ping(self, server):
        with RespClient.connect("127.0.0.1", server.port) as rc:
            assert rc.ping()

    def test_rpush_llen_lrange(self, server):
        with RespClient.connect("127.0.0.1", server.port) as rc:
            assert rc.rpush("q", "a") == 1
            assert rc.rpush("q", "b") == 2
            assert rc.llen("q") == 2
            assert rc.lrange("q") == [b"a", b"b"]
            assert rc.lrange("q", -1, -1) == [b"b"]

    def test_order_is_append_order(self, server):
        with RespClient.connect("127.0.0.1", server.port) as rc:
            for i in range(50):
                rc.rpush("seq", f"v{i}")
            assert [v.decode() for v in rc.lrange("seq")] == \
                [f"v{i}" for i in range(50)]

    def test_pipeline_round_trip(self, server):
        with RespClient.connect("127.0.0.1", server.port) as rc:
            replies = rc.pipeline([("RPUSH", "p", f"x{i}")
                                   for i in range(10)])
            assert replies == list(range(1, 11))
            assert rc.llen("p") == 10

    def test_del_and_missing_key(self, server):
        with RespClient.connect("127.0.0.1", server.port) as rc:
            rc.rpush("gone", "x")
            assert rc.delete("gone") == 1
            assert rc.llen("gone") == 0
            assert rc.lrange("gone") == []

    def test_unknown_command_is_error(self, server):
        with RespClient.connect("127.0.0.1", server.port) as rc:
            with pytest.raises(RespError, match="unknown command"):
                rc.command("SUBSCRIBE", "chan")

    def test_binary_payload_round_trip(self, server):
        raw = bytes(range(256)) + b"\r\n$5\r\n"
        with RespClient.connect("127.0.0.1", server.port) as rc:
            rc.rpush("bin", raw)
            assert rc.lrange("bin") == [raw]

    def test_concurrent_clients_share_store(self, server):
        a = RespClient.connect("127.0.0.1", server.port)
        b = RespClient.connect("127.0.0.1", server.port)
        try:
            a.rpush("shared", "from_a")
            b.rpush("shared", "from_b")
            assert a.llen("shared") == 2
        finally:
            a.close()
            b.close()
