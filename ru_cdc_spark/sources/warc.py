"""WARC (Web ARChive, ISO 28500 / WARC/1.1) reader and writer — the
delivery format of Common Crawl and every web-archive corpus, i.e. the
raw input of a real LLM training-data pipeline.

Built from the published specification (the WARC/1.1 standard and the
Common Crawl conventions) — this container has no warcio, so the format
is implemented directly:

* **record grammar**: ``WARC/1.1 CRLF`` version line, named-field
  header block terminated by an empty line (CRLF CRLF), exactly
  ``Content-Length`` octets of block, then two CRLFs of record
  separation;
* **mandatory fields**: WARC-Record-ID, Content-Length, WARC-Date,
  WARC-Type (the spec's section 5) — writers emit them, the reader
  rejects records missing Content-Length;
* **gzip member-per-record** (the Common Crawl packaging): each record
  is its own gzip member so a reader can split a ``.warc.gz`` at
  member boundaries; Python's zlib exposes unused_data after each
  member, which is exactly the member-boundary walk;
* **HTTP response payloads**: ``application/http;msgtype=response``
  blocks carry a status line + headers + body; the reader splits them
  and decodes the body by the declared charset.

Scale shape: Common Crawl ships ~1 GB ``.warc.gz`` files by the tens
of thousands — file-level parallelism (one Spark task per archive
file, ``binaryFile`` source) is the standard layout and what
``read_warc`` does; records never leave the executor that read them.
The reference has no file-corpus ingestion at all; this is engine-side
surface for the LLM-pipeline operators (SURVEY §2 north-star set).
"""

from __future__ import annotations

import gzip
import io
import zlib

# ---------------------------------------------------------------------------
# record codec
# ---------------------------------------------------------------------------

CRLF = b"\r\n"


def encode_warc_record(warc_type: str, content: bytes,
                       record_id: str,
                       date: str = "2024-01-01T00:00:00Z",
                       target_uri: str | None = None,
                       content_type: str | None = None,
                       extra: dict[str, str] | None = None) -> bytes:
    """One WARC/1.1 record with the spec's mandatory named fields.
    ``record_id`` must be a URI (the ``<urn:uuid:...>`` convention);
    deterministic ids keep fixture archives reproducible."""
    h = [b"WARC/1.1",
         b"WARC-Type: " + warc_type.encode(),
         b"WARC-Record-ID: " + record_id.encode(),
         b"WARC-Date: " + date.encode()]
    if target_uri is not None:
        h.append(b"WARC-Target-URI: " + target_uri.encode())
    if content_type is not None:
        h.append(b"Content-Type: " + content_type.encode())
    for k, v in (extra or {}).items():
        h.append(k.encode() + b": " + v.encode())
    # field order is not significant (spec 4) — Content-Length last is
    # the conventional layout real writers emit
    h.append(b"Content-Length: " + str(len(content)).encode())
    return CRLF.join(h) + CRLF + CRLF + content + CRLF + CRLF


def encode_http_response(body: bytes, status: int = 200,
                         content_type: str = "text/html; charset=utf-8",
                         headers: dict[str, str] | None = None) -> bytes:
    """The HTTP/1.1 response block a ``response`` record carries."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently",
              500: "Internal Server Error"}.get(status, "Unknown")
    h = [f"HTTP/1.1 {status} {reason}".encode(),
         b"Content-Type: " + content_type.encode(),
         b"Content-Length: " + str(len(body)).encode()]
    for k, v in (headers or {}).items():
        h.append(k.encode() + b": " + v.encode())
    return CRLF.join(h) + CRLF + CRLF + body


def decode_warc_records(data: bytes) -> list[dict]:
    """Parse a (decompressed) WARC stream -> [{headers, content}].
    Tolerates WARC/1.0 version lines (Common Crawl still writes 1.0);
    rejects a record without Content-Length — without it the grammar
    cannot delimit the block."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: "
                             f"{lines[0][:40]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip()] = v.strip()
        if "Content-Length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        clen = int(headers["Content-Length"])
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError("truncated WARC record block")
        out.append({"headers": headers,
                    "content": data[body_start:body_start + clen]})
        pos = body_start + clen
    return out


def decode_http_response(block: bytes) -> dict:
    """Split a response record's HTTP block -> {status, headers, body,
    text} with the body decoded by the declared charset (utf-8
    fallback)."""
    sep = block.find(CRLF + CRLF)
    if sep < 0:
        raise ValueError("HTTP block without header terminator")
    head = block[:sep].decode("latin-1")
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
    headers: dict[str, str] = {}
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    body = block[sep + 4:]
    charset = "utf-8"
    ct = headers.get("content-type", "")
    if "charset=" in ct:
        charset = ct.split("charset=", 1)[1].split(";")[0].strip()
    try:
        text = body.decode(charset, "replace")
    except LookupError:
        text = body.decode("utf-8", "replace")
    return {"status": status, "headers": headers, "body": body,
            "text": text}


# ---------------------------------------------------------------------------
# gzip member-per-record packaging (the Common Crawl convention)
# ---------------------------------------------------------------------------


def write_warc_gz(records: list[bytes]) -> bytes:
    """Each record its own gzip member — the packaging that makes a
    .warc.gz splittable at member boundaries."""
    out = io.BytesIO()
    for rec in records:
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(rec)
    return out.getvalue()


def iter_warc_gz_members(data: bytes) -> list[bytes]:
    """Walk gzip members via zlib's unused_data — each member inflates
    independently, exactly how a splittable reader skips ahead."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed
    return out


def decode_warc_gz(data: bytes) -> list[dict]:
    """.warc.gz bytes -> records; accepts BOTH member-per-record and
    whole-file gzip (a single member holding many records)."""
    recs: list[dict] = []
    for member in iter_warc_gz_members(data):
        recs.extend(decode_warc_records(member))
    return recs


# ---------------------------------------------------------------------------
# minimal HTML -> text (tag strip for the documents pipeline)
# ---------------------------------------------------------------------------

_BLANK_TAGS = ("script", "style")


def html_to_text(html: str) -> str:
    """Tag-stripping text extraction (single pass, no backtracking):
    script/style subtrees dropped whole, entities for the five XML
    predefineds decoded, whitespace collapsed. A trafilatura-class
    extractor is out of scope — this is the deterministic baseline the
    quality operators run on."""
    out: list[str] = []
    i = 0
    n = len(html)
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            out.append(html[i:])
            break
        out.append(html[i:lt])
        gt = html.find(">", lt)
        if gt < 0:
            break
        tag = html[lt + 1:gt].strip().lower()
        name = tag.split()[0] if tag else ""
        if name in _BLANK_TAGS:
            close = html.lower().find(f"</{name}", gt)
            i = (html.find(">", close) + 1) if close >= 0 else n
            continue
        if name in ("p", "br", "/p", "div", "/div", "li", "/li",
                    "tr", "/tr") or name.startswith(("h1", "h2", "h3",
                                                     "/h1", "/h2", "/h3")):
            out.append("\n")
        i = gt + 1
    text = "".join(out)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&")):
        text = text.replace(ent, ch)  # &amp; LAST (double-escape rule)
    return " ".join(text.split())


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

WARC_SCHEMA_DDL = ("archive string, record_id string, warc_type string, "
                   "target_uri string, warc_date string, "
                   "http_status int, content_type string, text string")


def read_warc(spark, path_glob: str):
    """Distributed WARC ingest: one task per archive file (Spark's
    binaryFile source — the Common Crawl layout where parallelism = the
    tens of thousands of ~1 GB .warc.gz shards), records parsed
    executor-side in an Arrow batch map, response payloads split into
    HTTP status/headers/decoded text. Non-response records (warcinfo,
    request, metadata) pass through with NULL http fields so a pipeline
    can filter by ``warc_type`` — predicate pushdown keeps the
    binaryFile listing pruned by path, and nothing but the final rows
    ever reaches the driver."""
    import os

    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob) \
        .select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows = {k: [] for k in ("archive", "record_id", "warc_type",
                                    "target_uri", "warc_date",
                                    "http_status", "content_type",
                                    "text")}
            for path, blob in zip(pdf["path"], pdf["content"]):
                blob = bytes(blob)
                recs = (decode_warc_gz(blob) if blob[:2] == b"\x1f\x8b"
                        else decode_warc_records(blob))
                name = os.path.basename(path)
                for rec in recs:
                    h = rec["headers"]
                    wtype = h.get("WARC-Type", "")
                    status = None
                    ctype = h.get("Content-Type")
                    text = None
                    if wtype == "response" and (ctype or "").startswith(
                            "application/http"):
                        http = decode_http_response(rec["content"])
                        status = http["status"]
                        ctype = http["headers"].get("content-type")
                        text = http["text"]
                    rows["archive"].append(name)
                    rows["record_id"].append(h.get("WARC-Record-ID", ""))
                    rows["warc_type"].append(wtype)
                    rows["target_uri"].append(h.get("WARC-Target-URI"))
                    rows["warc_date"].append(h.get("WARC-Date", ""))
                    rows["http_status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["text"].append(text)
            # column order mirrors WARC_SCHEMA_DDL exactly
            yield pd.DataFrame({
                "archive": rows["archive"],
                "record_id": rows["record_id"],
                "warc_type": rows["warc_type"],
                "target_uri": rows["target_uri"],
                "warc_date": rows["warc_date"],
                "http_status": pd.Series(rows["http_status"],
                                         dtype="Int32"),
                "content_type": rows["content_type"],
                "text": rows["text"],
            })

    return files.mapInPandas(parse, WARC_SCHEMA_DDL)
