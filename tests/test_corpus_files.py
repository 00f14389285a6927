"""Compressed-JSONL corpus shards (sources/corpus_files.py): codec
sniffing, multi-frame zstd and multi-member gzip shards, the typed
read path (from_json permissive NULLs), and the distributed write ->
read roundtrip for all three codecs."""

from __future__ import annotations

import gzip
import json

import pytest

from ru_cdc_spark.sources.corpus_files import (
    decompress_shard,
    read_jsonl,
    read_jsonl_lines,
    write_jsonl_shards,
)


class TestDecompressShard:
    def test_plain_passthrough(self):
        assert decompress_shard(b'{"a":1}\n') == b'{"a":1}\n'

    def test_gzip_multi_member(self):
        blob = gzip.compress(b"line1\n", mtime=0) + \
            gzip.compress(b"line2\n", mtime=0)
        assert decompress_shard(blob) == b"line1\nline2\n"

    def test_zstd_single_and_multi_frame(self):
        pytest.importorskip("pyarrow")
        import pyarrow as pa

        c = pa.Codec("zstd")
        one = c.compress(b"alpha\n").to_pybytes()
        two = c.compress(b"beta\n").to_pybytes()
        assert decompress_shard(one) == b"alpha\n"
        # frame concatenation is legal zstd; real shard writers do it
        assert decompress_shard(one + two) == b"alpha\nbeta\n"

    def test_zstd_skippable_frame_prefix(self):
        pytest.importorskip("pyarrow")
        import pyarrow as pa

        skippable = b"\x50\x2a\x4d\x18" + (4).to_bytes(4, "little") + b"meta"
        frame = pa.Codec("zstd").compress(b"data\n").to_pybytes()
        assert decompress_shard(skippable + frame) == b"data\n"


class TestDistributedRoundtrip:
    @pytest.mark.parametrize("codec", ["zstd", "gzip", "none"])
    def test_write_read_roundtrip(self, spark, tmp_path, codec):
        df = spark.createDataFrame(
            [(i, f"text {i}", "en") for i in range(200)],
            "id long, body string, lang string")
        out = str(tmp_path / codec)
        n = write_jsonl_shards(df, out, codec=codec, n_shards=4)
        assert n == 200
        back = read_jsonl(spark, f"{out}/*",
                          "id long, body string, lang string")
        rows = back.orderBy("id").collect()
        assert len(rows) == 200
        assert rows[7].body == "text 7" and rows[7].lang == "en"
        # shard column names the source file
        assert rows[0].shard.startswith("shard")

    def test_malformed_lines_surface_as_nulls(self, spark, tmp_path):
        p = tmp_path / "bad.jsonl"
        p.write_text('{"id": 1}\nnot json at all\n{"id": 3}\n')
        back = read_jsonl(spark, str(p), "id long")
        ids = [r.id for r in back.collect()]
        assert sorted(x for x in ids if x is not None) == [1, 3]
        assert ids.count(None) == 1

    def test_line_counts_per_shard(self, spark, tmp_path):
        df = spark.createDataFrame([(i,) for i in range(50)], "id long")
        out = str(tmp_path / "s")
        write_jsonl_shards(df, out, codec="gzip", n_shards=3)
        lines = read_jsonl_lines(spark, f"{out}/*")
        per_shard = {r.shard: r.n for r in
                     lines.groupBy("shard").count()
                     .withColumnRenamed("count", "n").collect()}
        assert sum(per_shard.values()) == 50
        assert len(per_shard) <= 3
        # every line is intact JSON
        for r in lines.collect():
            json.loads(r.line)
