"""Kafka wire protocol (sources/kafka_wire.py): CRC32C golden vector,
record-batch codec, live produce/fetch roundtrips against the in-repo
broker fixture, CRC rejection, and the kafka_wire sink end to end."""

from __future__ import annotations

import pytest

from ru_cdc_spark.sources.kafka_wire import (
    KafkaBrokerFixture,
    KafkaError,
    KafkaWireClient,
    crc32c,
    decode_record_batches,
    encode_record_batch,
)


class TestCrc32c:
    def test_golden_vector(self):
        """The Castagnoli check value from RFC 3720 appendix B.4."""
        assert crc32c(b"123456789") == 0xE3069283

    def test_empty_and_zeros(self):
        assert crc32c(b"") == 0
        assert crc32c(b"\x00" * 32) == 0x8A9136AA  # published vector


class TestRecordBatchCodec:
    def test_roundtrip_with_null_key(self):
        batch = encode_record_batch([(b"k1", b"v1"), (None, b"v2")],
                                    base_offset=5)
        out = decode_record_batches(batch)
        assert len(out) == 1
        assert out[0]["crc_ok"] and out[0]["base_offset"] == 5
        assert out[0]["records"] == [(5, b"k1", b"v1"), (6, None, b"v2")]

    def test_corruption_detected(self):
        batch = bytearray(encode_record_batch([(b"k", b"value")]))
        batch[-1] ^= 0xFF
        assert not decode_record_batches(bytes(batch))[0]["crc_ok"]

    def test_multiple_batches_concatenated(self):
        blob = (encode_record_batch([(None, b"a")], base_offset=0)
                + encode_record_batch([(None, b"b")], base_offset=1))
        out = decode_record_batches(blob)
        assert [b["base_offset"] for b in out] == [0, 1]


class TestLiveBroker:
    @pytest.fixture()
    def broker(self):
        srv = KafkaBrokerFixture().start()
        yield srv
        srv.stop()

    def test_api_versions_and_metadata(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            vs = c.api_versions()
            assert vs[0] == (3, 3) and vs[1] == (4, 4)
            c.produce("t", 0, [(None, b"x")])
            md = c.metadata()
            assert md["brokers"][0][2] == broker.port
            assert md["topics"]["t"]["partitions"][0]["leader"] == 0

    def test_produce_fetch_roundtrip(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            assert c.produce("t", 0, [(b"k", b"hello"),
                                      (None, b"world")]) == 0
            assert c.produce("t", 0, [(None, b"again")]) == 2
            got = c.fetch("t", 0, 0)
            assert got["high_watermark"] == 3
            assert [v for _, _, v in got["records"]] == [
                b"hello", b"world", b"again"]
            assert [o for o, _, _ in got["records"]] == [0, 1, 2]
            # offset-addressed tail read
            tail = c.fetch("t", 0, 2)
            assert [v for _, _, v in tail["records"]] == [b"again"]
            assert [o for o, _, _ in tail["records"]] == [2]

    def test_corrupt_batch_rejected_like_a_real_broker(self, broker):
        import socket
        import struct

        from ru_cdc_spark.sources.kafka_wire import (
            _bytes32,
            _i16,
            _i32,
            _string,
        )

        batch = bytearray(encode_record_batch([(None, b"payload")]))
        batch[-1] ^= 0xFF  # flip a record byte AFTER the CRC was set
        body = (_string(None) + _i16(-1) + _i32(1000)
                + _i32(1) + _string("t")
                + _i32(1) + _i32(0) + _bytes32(bytes(batch)))
        sock = socket.create_connection(("127.0.0.1", broker.port))
        try:
            c = KafkaWireClient(sock)
            with pytest.raises(KafkaError) as exc:
                r = c._request(0, 3, body)
                for _ in range(r.i32()):
                    r.string()
                    for _ in range(r.i32()):
                        _pid, err, _off, _ts = (r.i32(), r.i16(),
                                                r.i64(), r.i64())
                        if err:
                            raise KafkaError(err, "Produce")
            assert exc.value.code == 2  # CORRUPT_MESSAGE
        finally:
            sock.close()

    def test_partition_logs_are_independent(self, broker):
        with KafkaWireClient.connect("127.0.0.1", broker.port) as c:
            c.produce("a", 0, [(None, b"1")])
            c.produce("b", 0, [(None, b"2"), (None, b"3")])
            assert len(c.fetch("a", 0, 0)["records"]) == 1
            assert len(c.fetch("b", 0, 0)["records"]) == 2


class TestKafkaWireSink:
    def test_sink_routes_topics_and_batches_per_partition(self, spark):
        """The reference's Kafka producer path (message_queue.rs:74-135)
        over the real wire: routed rows produce per-topic record
        batches; the fixture broker CRC-verifies and serves them back."""
        from ru_cdc_spark.config import SinkConfig
        from ru_cdc_spark.streaming.sinks import write_batch_to_sink

        srv = KafkaBrokerFixture().start()
        try:
            rows = [("m", f"t{i % 2}", f"k{i}", f"v{i}")
                    for i in range(20)]
            batch = spark.createDataFrame(
                rows, ["mq", "topic", "key", "value"])
            sink = SinkConfig(name="k", kind="kafka_wire",
                              options={"host": "127.0.0.1",
                                       "port": str(srv.port)})
            write_batch_to_sink(batch, sink, 0)
            with KafkaWireClient.connect("127.0.0.1", srv.port) as c:
                t0 = sorted(v.decode()
                            for _, _, v in c.fetch("t0", 0, 0)["records"])
                t1 = sorted(v.decode()
                            for _, _, v in c.fetch("t1", 0, 0)["records"])
            assert t0 == sorted(f"v{i}" for i in range(0, 20, 2))
            assert t1 == sorted(f"v{i}" for i in range(1, 20, 2))
        finally:
            srv.stop()

    def test_sink_preserves_per_key_order(self, spark):
        """__seq discipline (X2): one key's changes reach the broker in
        change order within its topic-partition."""
        from ru_cdc_spark.config import SinkConfig
        from ru_cdc_spark.streaming.sinks import write_batch_to_sink

        srv = KafkaBrokerFixture().start()
        try:
            rows = [("m", "t", "k1", f"v{s}", s) for s in (3, 1, 2, 0)]
            batch = spark.createDataFrame(
                rows, ["mq", "topic", "key", "value", "__seq"])
            sink = SinkConfig(name="k", kind="kafka_wire",
                              options={"host": "127.0.0.1",
                                       "port": str(srv.port)})
            write_batch_to_sink(batch, sink, 0)
            with KafkaWireClient.connect("127.0.0.1", srv.port) as c:
                vals = [v.decode()
                        for _, _, v in c.fetch("t", 0, 0)["records"]]
            assert vals == ["v0", "v1", "v2", "v3"]
        finally:
            srv.stop()


class TestKafkaWireStreamSource:
    def test_stream_drains_topic_exactly_once_across_restarts(
            self, spark, tmp_path):
        """The consume side: Spark-checkpointed Kafka offsets over the
        real wire. Three availableNow restarts drain the topic with no
        duplicate or lost offsets."""
        from ru_cdc_spark.sources.kafka_wire import (
            register_kafka_wire_source,
        )

        srv = KafkaBrokerFixture().start()
        try:
            with KafkaWireClient.connect("127.0.0.1", srv.port) as c:
                for i in range(0, 120, 40):
                    c.produce("feed", 0,
                              [(None, f"m{j}".encode())
                               for j in range(i, i + 40)])
            register_kafka_wire_source(spark)
            out = str(tmp_path / "out")
            ck = str(tmp_path / "ck")
            for _ in range(3):
                stream = (spark.readStream.format("kafka_wire")
                          .option("host", "127.0.0.1")
                          .option("port", srv.port)
                          .option("topic", "feed")
                          .option("position_file",
                                  str(tmp_path / "pos.json"))
                          .option("max_records_per_batch", 50).load())
                q = (stream.writeStream.format("parquet")
                     .option("path", out)
                     .option("checkpointLocation", ck)
                     .trigger(availableNow=True).start())
                q.awaitTermination(120)
            got = spark.read.parquet(out)
            assert got.count() == 120
            vals = sorted(bytes(r["value"]).decode()
                          for r in got.collect())
            assert vals == sorted(f"m{j}" for j in range(120))
            offs = [r["offset"] for r in got.collect()]
            assert len(set(offs)) == 120  # no duplicates
        finally:
            srv.stop()

    def test_produce_then_consume_loop(self, spark, tmp_path):
        """Both ends of the wire in one engine: the kafka_wire SINK
        produces a batch, the kafka_wire SOURCE streams it back."""
        from ru_cdc_spark.config import SinkConfig
        from ru_cdc_spark.sources.kafka_wire import (
            register_kafka_wire_source,
        )
        from ru_cdc_spark.streaming.sinks import write_batch_to_sink

        srv = KafkaBrokerFixture().start()
        try:
            batch = spark.createDataFrame(
                [("m", "loop", f"k{i}", f"v{i}") for i in range(25)],
                ["mq", "topic", "key", "value"])
            write_batch_to_sink(batch, SinkConfig(
                name="k", kind="kafka_wire",
                options={"host": "127.0.0.1",
                         "port": str(srv.port)}), 0)
            register_kafka_wire_source(spark)
            stream = (spark.readStream.format("kafka_wire")
                      .option("host", "127.0.0.1")
                      .option("port", srv.port)
                      .option("topic", "loop").load())
            q = (stream.writeStream.format("parquet")
                 .option("path", str(tmp_path / "o"))
                 .option("checkpointLocation", str(tmp_path / "c"))
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            got = spark.read.parquet(str(tmp_path / "o"))
            assert sorted(bytes(r["value"]).decode()
                          for r in got.collect()) == \
                sorted(f"v{i}" for i in range(25))
        finally:
            srv.stop()


class TestGzipCompression:
    def test_gzip_batch_roundtrip(self):
        recs = [(b"k%d" % i, b"payload-%d" % i * 10) for i in range(50)]
        plain = encode_record_batch(recs)
        gz = encode_record_batch(recs, compression="gzip")
        assert len(gz) < len(plain)  # actually compressed
        out = decode_record_batches(gz)
        assert out[0]["crc_ok"]
        assert [(k, v) for _, k, v in out[0]["records"]] == recs

    def test_gzip_produce_fetch_through_broker(self):
        srv = KafkaBrokerFixture().start()
        try:
            with KafkaWireClient.connect("127.0.0.1", srv.port) as c:
                c.produce("gz", 0, [(None, b"compressed " * 20)] * 10,
                          compression="gzip")
                got = c.fetch("gz", 0, 0)
                assert len(got["records"]) == 10
                assert got["records"][0][2] == b"compressed " * 20
        finally:
            srv.stop()


class TestSnappyCompression:
    def test_snappy_batch_roundtrip(self):
        recs = [(b"k%d" % i, b"payload-%d " % i * 12) for i in range(60)]
        plain = encode_record_batch(recs)
        sn = encode_record_batch(recs, compression="snappy")
        assert len(sn) < len(plain)
        out = decode_record_batches(sn)
        assert out[0]["crc_ok"]
        assert [(k, v) for _, k, v in out[0]["records"]] == recs

    def test_snappy_through_broker(self):
        srv = KafkaBrokerFixture().start()
        try:
            with KafkaWireClient.connect("127.0.0.1", srv.port) as c:
                c.produce("sn", 0, [(None, b"snappy " * 30)] * 8,
                          compression="snappy")
                got = c.fetch("sn", 0, 0)
                assert len(got["records"]) == 8
                assert got["records"][0][2] == b"snappy " * 30
        finally:
            srv.stop()


class TestRecordHeaders:
    """Magic-2 per-record header arrays (round 10): the metadata
    side-channel Debezium-style pipelines route on without parsing
    payloads — encoded, broker-stored (the re-encoded log keeps them),
    and fetched back byte-exactly."""

    def test_headers_codec_roundtrip(self):
        recs = [
            (b"k0", b"v0", [("db", b"test"), ("type", b"INSERT")]),
            (b"k1", b"v1"),                      # header-free record
            (None, b"v2", [("empty", b""), ("null", None)]),
        ]
        out = decode_record_batches(encode_record_batch(recs))[0]
        assert out["crc_ok"]
        assert out["rec_headers"] == [
            [("db", b"test"), ("type", b"INSERT")],
            [],
            [("empty", b""), ("null", None)],
        ]
        assert [(k, v) for _, k, v in out["records"]] == \
            [(b"k0", b"v0"), (b"k1", b"v1"), (None, b"v2")]

    @pytest.mark.parametrize("codec",
                             ["none", "gzip", "snappy", "lz4", "zstd"])
    def test_headers_through_broker_all_codecs(self, codec):
        srv = KafkaBrokerFixture().start()
        try:
            with KafkaWireClient.connect("127.0.0.1", srv.port) as c:
                c.produce("h", 0,
                          [(b"k%d" % i, b"v%d " % i * 10,
                            [("i", str(i).encode()),
                             ("route", b"even" if i % 2 == 0
                              else b"odd")])
                           for i in range(6)],
                          compression=codec)
                got = c.fetch("h", 0, 0)
            assert len(got["records"]) == 6
            assert got["headers"] == [
                [("i", str(i).encode()),
                 ("route", b"even" if i % 2 == 0 else b"odd")]
                for i in range(6)]
        finally:
            srv.stop()

    def test_headers_aligned_after_mid_batch_seek(self):
        """Fetch from an offset INSIDE a batch: the client filters
        leading records out — headers must stay aligned."""
        srv = KafkaBrokerFixture().start()
        try:
            with KafkaWireClient.connect("127.0.0.1", srv.port) as c:
                c.produce("h", 0,
                          [(None, b"v%d" % i, [("i", str(i).encode())])
                           for i in range(5)])
                got = c.fetch("h", 0, 3)
            assert [v for _, _, v in got["records"]] == [b"v3", b"v4"]
            assert got["headers"] == [[("i", b"3")], [("i", b"4")]]
        finally:
            srv.stop()


class TestZstdCompression:
    def test_zstd_batch_roundtrip(self):
        recs = [(b"k%d" % i, b"payload-%d " % i * 12) for i in range(60)]
        zs = encode_record_batch(recs, compression="zstd")
        out = decode_record_batches(zs)
        assert out[0]["crc_ok"]
        assert [(k, v) for _, k, v in out[0]["records"]] == recs

    def test_zstd_through_broker(self):
        srv = KafkaBrokerFixture().start()
        try:
            with KafkaWireClient.connect("127.0.0.1", srv.port) as c:
                c.produce("zs", 0, [(None, b"zstd " * 30)] * 8,
                          compression="zstd")
                got = c.fetch("zs", 0, 0)
                assert len(got["records"]) == 8
                assert got["records"][0][2] == b"zstd " * 30
        finally:
            srv.stop()

    def test_streaming_consume_zstd_topic(self, spark, tmp_path):
        """A zstd-compressed topic consumed through the Spark streaming
        source (readStream -> availableNow drain): batches decompress
        inside the fetch path and every record value survives byte-
        exactly — the KIP-110 codec is invisible to the stream."""
        from ru_cdc_spark.sources.kafka_wire import (
            register_kafka_wire_source,
        )

        srv = KafkaBrokerFixture().start()
        try:
            with KafkaWireClient.connect("127.0.0.1", srv.port) as c:
                for i in range(0, 90, 30):
                    c.produce("zfeed", 0,
                              [(str(j).encode(),
                                (f"zv{j} " * 8).encode())
                               for j in range(i, i + 30)],
                              compression="zstd")
            register_kafka_wire_source(spark)
            for _ in range(3):  # one capped micro-batch per drain
                stream = (spark.readStream.format("kafka_wire")
                          .option("host", "127.0.0.1")
                          .option("port", srv.port)
                          .option("topic", "zfeed")
                          .option("position_file",
                                  str(tmp_path / "pos.json"))
                          .option("max_records_per_batch", 40).load())
                q = (stream.writeStream.format("parquet")
                     .option("path", str(tmp_path / "out"))
                     .option("checkpointLocation",
                             str(tmp_path / "ck"))
                     .trigger(availableNow=True).start())
                q.awaitTermination(120)
            got = spark.read.parquet(str(tmp_path / "out")).collect()
            assert len(got) == 90
            vals = {int(bytes(r["key"]).decode()):
                    bytes(r["value"]).decode() for r in got}
            assert vals == {j: f"zv{j} " * 8 for j in range(90)}
        finally:
            srv.stop()

    def test_fetch_decodes_real_libzstd_batches(self, monkeypatch):
        """A broker/producer in the wild compresses with real libzstd,
        not our store-mode encoder: swap the compressor for pyarrow's
        bundled libzstd and prove the fetch path still decodes."""
        pa = pytest.importorskip("pyarrow")
        import ru_cdc_spark.functions.zstd as zmod

        monkeypatch.setattr(
            zmod, "compress_store",
            lambda b, checksum=True: pa.Codec("zstd").compress(b)
            .to_pybytes())
        recs = [(None, b"third-party compressed " * 10)] * 12
        batch = encode_record_batch(recs, compression="zstd")
        out = decode_record_batches(batch)
        assert out[0]["crc_ok"]
        assert [v for _, _, v in out[0]["records"]] == [v for _, v in recs]


class _FragmentedSock:
    """recv returns deterministically tiny fragments — the torn-TCP
    adversary for the 4-byte length-prefixed Kafka framing."""

    def __init__(self, data: bytes, sizes) -> None:
        self._data, self._off, self._sizes = data, 0, sizes
        self.sent = bytearray()

    def recv(self, want: int) -> bytes:
        if self._off >= len(self._data):
            return b""
        n = max(1, min(next(self._sizes), want,
                       len(self._data) - self._off))
        out = self._data[self._off:self._off + n]
        self._off += n
        return out

    def sendall(self, b: bytes) -> None:
        self.sent += b


class TestKafkaFramingFragmentation:
    def _canned_response(self, corr: int) -> bytes:
        import struct as _s

        body = _s.pack(">ih", corr, 0)  # corr + error_code 0
        return _s.pack(">i", len(body)) + body

    def test_one_byte_recv_reassembles(self):
        import itertools

        from ru_cdc_spark.sources.kafka_wire import KafkaWireClient

        c = KafkaWireClient.__new__(KafkaWireClient)
        c.client_id = "t"
        c._corr = 0
        c.sock = _FragmentedSock(self._canned_response(1),
                                 itertools.repeat(1))
        r = c._request(18, 0, b"")  # ApiVersions header shape
        assert r.i16() == 0

    def test_broker_close_mid_frame_raises(self):
        import itertools

        from ru_cdc_spark.sources.kafka_wire import KafkaWireClient

        c = KafkaWireClient.__new__(KafkaWireClient)
        c.client_id = "t"
        c._corr = 0
        c.sock = _FragmentedSock(self._canned_response(1)[:5],
                                 itertools.repeat(2))
        import pytest as _pytest
        with _pytest.raises(ConnectionError):
            c._request(18, 0, b"")
