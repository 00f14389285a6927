"""Pure-Python LZ4 (block + frame) and xxHash32."""

from __future__ import annotations

import os

import pytest

from ru_cdc_spark.functions.lz4 import (
    Lz4Error,
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxhash32,
)


class TestXxHash32:
    def test_published_vectors(self):
        assert xxhash32(b"") == 0x02CC5D05
        assert xxhash32(b"a") == 0x550D7456
        assert xxhash32(b"abc") == 0x32D153FF
        assert xxhash32(b"Hello World") == 0xB1FD16EE

    def test_seeded(self):
        assert xxhash32(b"abc", seed=1) != xxhash32(b"abc")


class TestBlock:
    @pytest.mark.parametrize("data", [
        b"", b"x", b"hello world " * 200, b"\x00" * 200000,
        bytes(range(256)) * 100,
    ])
    def test_roundtrip(self, data):
        assert lz4_block_decompress(lz4_block_compress(data)) == data

    def test_random_roundtrip(self):
        for n in (1, 13, 1000, 5000):
            data = os.urandom(n)
            assert lz4_block_decompress(lz4_block_compress(data)) == data

    def test_repetitive_compresses_hard(self):
        data = b"abcd" * 10000
        assert len(lz4_block_compress(data)) < len(data) // 50

    def test_bad_offset_rejected(self):
        # token: 0 literals, match of 4 at offset 9 into an empty output
        with pytest.raises(Lz4Error, match="offset"):
            lz4_block_decompress(bytes([0x00]) + (9).to_bytes(2, "little"))


class TestFrame:
    def test_magic_and_header_checksum(self):
        f = lz4_frame_compress(b"data")
        assert f[:4] == b"\x04\x22\x4d\x18"
        corrupted = bytearray(f)
        corrupted[4] ^= 0x10  # flip a FLG bit; header checksum must trip
        with pytest.raises(Lz4Error):
            lz4_frame_decompress(bytes(corrupted))

    @pytest.mark.parametrize("n", [0, 1, 100, 70_000, 200_000])
    def test_roundtrip_across_blocks(self, n):
        data = (b"0123456789abcdef" * (n // 16 + 1))[:n]
        assert lz4_frame_decompress(lz4_frame_compress(data)) == data

    def test_incompressible_stored_raw(self):
        data = os.urandom(1000)
        f = lz4_frame_compress(data)
        assert lz4_frame_decompress(f) == data


class TestKafkaLz4Codec:
    def test_lz4_batch_roundtrip(self):
        from ru_cdc_spark.sources.kafka_wire import (
            decode_record_batches,
            encode_record_batch,
        )

        recs = [(b"k%d" % i, b"value-%d " % i * 15) for i in range(40)]
        plain = encode_record_batch(recs)
        lz = encode_record_batch(recs, compression="lz4")
        assert len(lz) < len(plain)
        out = decode_record_batches(lz)
        assert out[0]["crc_ok"]
        assert [(k, v) for _, k, v in out[0]["records"]] == recs

    def test_lz4_through_broker(self):
        from ru_cdc_spark.sources.kafka_wire import (
            KafkaBrokerFixture,
            KafkaWireClient,
        )

        srv = KafkaBrokerFixture().start()
        try:
            with KafkaWireClient.connect("127.0.0.1", srv.port) as c:
                c.produce("lz", 0, [(None, b"lz4 frame " * 25)] * 6,
                          compression="lz4")
                got = c.fetch("lz", 0, 0)
                assert len(got["records"]) == 6
                assert got["records"][0][2] == b"lz4 frame " * 25
        finally:
            srv.stop()
