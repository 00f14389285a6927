"""WARC reader/writer (sources/warc.py, ISO 28500): record grammar
against a hand-written byte fixture (independent of our encoder), gzip
member-per-record packaging, HTTP response payload split, charset
handling, HTML tag strip, and the distributed read_warc path."""

from __future__ import annotations

import gzip

import pytest

from ru_cdc_spark.sources.warc import (
    decode_http_response,
    decode_warc_gz,
    decode_warc_records,
    encode_http_response,
    encode_warc_record,
    html_to_text,
    iter_warc_gz_members,
    read_warc,
    write_warc_gz,
)

# A record written BY HAND from the WARC/1.1 spec's grammar (section 4)
# — expected bytes that did not originate from this repo's encoder.
HAND_WRITTEN = (
    b"WARC/1.1\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n"
    b"WARC-Date: 2016-09-19T17:20:24Z\r\n"
    b"WARC-Target-URI: http://example.com/\r\n"
    b"Content-Type: application/http;msgtype=response\r\n"
    b"Content-Length: 78\r\n"
    b"\r\n"
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/plain\r\n"
    b"Content-Length: 13\r\n"
    b"\r\n"
    b"Hello, world."
    b"\r\n\r\n"
)


class TestRecordGrammar:
    def test_hand_written_fixture_parses(self):
        recs = decode_warc_records(HAND_WRITTEN)
        assert len(recs) == 1
        h = recs[0]["headers"]
        assert h["WARC-Type"] == "response"
        assert h["WARC-Target-URI"] == "http://example.com/"
        assert len(recs[0]["content"]) == 78
        http = decode_http_response(recs[0]["content"])
        assert http["status"] == 200
        assert http["text"] == "Hello, world."

    def test_encoder_output_matches_hand_written(self):
        """Our encoder reproduces the spec fixture byte for byte."""
        body = encode_http_response(
            b"Hello, world.", content_type="text/plain")
        rec = encode_warc_record(
            "response", body,
            record_id="<urn:uuid:00000000-0000-0000-0000-000000000001>",
            date="2016-09-19T17:20:24Z",
            target_uri="http://example.com/",
            content_type="application/http;msgtype=response")
        assert rec == HAND_WRITTEN

    def test_multiple_records_stream(self):
        blob = HAND_WRITTEN + encode_warc_record(
            "metadata", b"k: v", record_id="<urn:uuid:2>")
        recs = decode_warc_records(blob)
        assert [r["headers"]["WARC-Type"] for r in recs] == [
            "response", "metadata"]

    def test_missing_content_length_rejected(self):
        bad = b"WARC/1.1\r\nWARC-Type: metadata\r\n\r\nxx\r\n\r\n"
        with pytest.raises(ValueError, match="Content-Length"):
            decode_warc_records(bad)

    def test_truncated_block_rejected(self):
        with pytest.raises(ValueError, match="truncated"):
            decode_warc_records(HAND_WRITTEN[:-20])

    def test_warc_10_version_line_accepted(self):
        """Common Crawl still ships WARC/1.0."""
        blob = HAND_WRITTEN.replace(b"WARC/1.1", b"WARC/1.0", 1)
        assert decode_warc_records(blob)[0]["headers"]["WARC-Type"] == \
            "response"


class TestGzipPackaging:
    def test_member_per_record_splits(self):
        r2 = encode_warc_record("metadata", b"x", record_id="<urn:uuid:2>")
        gz = write_warc_gz([HAND_WRITTEN, r2])
        members = iter_warc_gz_members(gz)
        assert members == [HAND_WRITTEN, r2]
        recs = decode_warc_gz(gz)
        assert len(recs) == 2

    def test_whole_file_gzip_also_reads(self):
        """A single-member archive (non-CC tools write these)."""
        r2 = encode_warc_record("metadata", b"x", record_id="<urn:uuid:2>")
        gz = gzip.compress(HAND_WRITTEN + r2)
        assert len(decode_warc_gz(gz)) == 2


class TestHttpPayload:
    def test_charset_honored(self):
        body = "héllo".encode("latin-1")
        block = encode_http_response(
            body, content_type="text/plain; charset=latin-1")
        assert decode_http_response(block)["text"] == "héllo"

    def test_unknown_charset_falls_back(self):
        block = encode_http_response(
            b"abc", content_type="text/plain; charset=klingon-8")
        assert decode_http_response(block)["text"] == "abc"

    def test_status_codes(self):
        for code in (200, 301, 404, 500):
            block = encode_http_response(b"", status=code)
            assert decode_http_response(block)["status"] == code


class TestHtmlToText:
    def test_tags_stripped_blocks_spaced(self):
        html = ("<html><head><title>T</title><style>p{}</style></head>"
                "<body><h1>Head</h1><p>One</p><p>Two &amp; three</p>"
                "<script>var x=1;</script></body></html>")
        text = html_to_text(html)
        assert "var x" not in text and "p{}" not in text
        assert "Head" in text and "One" in text
        assert "Two & three" in text

    def test_entities_double_escape_rule(self):
        assert html_to_text("&amp;lt;") == "&lt;"  # NOT '<'

    def test_plain_text_unchanged(self):
        assert html_to_text("just words") == "just words"


class TestReadWarcDistributed:
    def test_roundtrip_over_spark(self, spark, tmp_path):
        # two archive files, three records each
        for f in range(2):
            recs = []
            for i in range(3):
                doc = f"doc {f}-{i} body text"
                body = encode_http_response(
                    doc.encode(), content_type="text/plain; charset=utf-8")
                recs.append(encode_warc_record(
                    "response", body,
                    record_id=f"<urn:uuid:{f}-{i}>",
                    target_uri=f"http://t/{f}/{i}",
                    content_type="application/http;msgtype=response"))
            recs.append(encode_warc_record(
                "warcinfo", b"software: test", record_id=f"<urn:uuid:w{f}>"))
            (tmp_path / f"part{f}.warc.gz").write_bytes(write_warc_gz(recs))
        df = read_warc(spark, str(tmp_path / "*.warc.gz"))
        rows = df.collect()
        assert len(rows) == 8
        responses = [r for r in rows if r.warc_type == "response"]
        assert len(responses) == 6
        assert sorted(r.text for r in responses) == sorted(
            f"doc {f}-{i} body text" for f in range(2) for i in range(3))
        info = [r for r in rows if r.warc_type == "warcinfo"]
        assert all(r.http_status is None for r in info)
        assert all(r.http_status == 200 for r in responses)
