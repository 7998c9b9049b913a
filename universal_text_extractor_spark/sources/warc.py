"""WARC ingestion source — .warc / .warc.gz → the pages table.

The north-star input (BASELINE.json input_hint) is an Iceberg/parquet
table of Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``;
this module supplies the step BEFORE that table exists: reading real
crawl archives. Scope is the Common Crawl layout (ISO 28500 WARC/1.0/1.1):

- plain ``.warc`` and ``.warc.gz`` where EACH RECORD is its own gzip
  member (the Common Crawl convention that makes archives streamable;
  Python's zlib consumes member-concatenated streams incrementally)
- ``response`` records: the block is an HTTP/1.x response — status line
  + headers + CRLF CRLF + body; the body becomes the ``html`` column
  (Transfer-Encoding: chunked is de-chunked; Content-Encoding gzip is
  left intact — the dispatch layer decompresses payloads transparently)
- ``resource``/``conversion`` records: the block IS the payload
- url ← WARC-Target-URI, warc_ts ← WARC-Date (ISO 8601)

Scale design: one Spark task per WARC file (``binaryFile`` source →
``mapInPandas`` parse), matching the Common Crawl layout of many ~1 GB
files — parallelism comes from file count, exactly how a 1000-executor
cluster consumes a crawl dump. The parser is a generator (bounded
memory per record, not per archive) and malformed records are skipped
with a per-file tolerance, never raised (D2 containment at the source).

The test fixture writer :func:`make_warc` is an independent spec
implementation (own header layout, per-record gzip members, mtime=0 for
byte-stability) — writer ≠ parser, same pattern as every kernel.
"""

from __future__ import annotations

import io
import zlib
from datetime import datetime, timezone

MAX_RECORD_BYTES = 256 * 1024 * 1024  # per-record containment bound

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _gzip_members(data: bytes):
    """Yield decompressed gzip members from a member-concatenated stream
    (the Common Crawl .warc.gz layout). Non-gzip input yields itself."""
    if not data.startswith(b"\x1f\x8b"):
        yield data
        return
    pos = 0
    while pos < len(data) and data.startswith(b"\x1f\x8b", pos):
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:], MAX_RECORD_BYTES)
        except zlib.error:
            return  # corrupt tail: keep the members already yielded
        if d.unconsumed_tail or not d.eof:
            if out:
                yield out  # truncated final member: keep what decoded
            return
        yield out
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _parse_http_response(block: bytes) -> bytes:
    """HTTP response block → body bytes (headers dropped; chunked
    transfer-encoding reassembled). Returns the block unchanged when it
    doesn't parse as HTTP (resource-style payloads)."""
    if not block.startswith((b"HTTP/1.", b"HTTP/2")):
        return block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return block
    headers = block[:sep].decode("latin-1", "replace").lower()
    body = block[sep + 4 :]
    if "transfer-encoding:" in headers and "chunked" in headers:
        out = bytearray()
        pos = 0
        while pos < len(body):
            eol = body.find(b"\r\n", pos)
            if eol < 0:
                break
            try:
                size = int(body[pos:eol].split(b";")[0], 16)
            except ValueError:
                break
            if size == 0:
                break
            out += body[eol + 2 : eol + 2 + size]
            pos = eol + 2 + size + 2
        return bytes(out)
    return body


def iter_warc_records(data: bytes, record_types: tuple[str, ...] = ("response",)):
    """Yield ``(url, warc_ts | None, payload)`` from one WARC archive's
    bytes. Malformed records are skipped; never raises."""
    for member in _gzip_members(data):
        pos = 0
        n = len(member)
        while pos < n:
            head = member.find(b"WARC/", pos)
            if head < 0:
                break
            hdr_end = member.find(b"\r\n\r\n", head)
            if hdr_end < 0:
                break
            try:
                lines = member[head:hdr_end].decode("latin-1").split("\r\n")
                fields = {}
                for ln in lines[1:]:
                    k, _, v = ln.partition(":")
                    fields[k.strip().lower()] = v.strip()
                length = int(fields.get("content-length", "-1"))
            except Exception:
                pos = hdr_end + 4
                continue
            if length < 0 or length > MAX_RECORD_BYTES:
                pos = hdr_end + 4
                continue
            block = member[hdr_end + 4 : hdr_end + 4 + length]
            pos = hdr_end + 4 + length
            rtype = fields.get("warc-type", "")
            if rtype not in record_types:
                continue
            url = fields.get("warc-target-uri", "")
            ts = None
            raw_ts = fields.get("warc-date", "")
            try:
                ts = datetime.fromisoformat(raw_ts.replace("Z", "+00:00"))
            except ValueError:
                ts = None
            payload = (
                _parse_http_response(block) if rtype == "response" else block
            )
            if url:
                yield url, ts, payload


def _warc_parser(record_types: tuple[str, ...]):
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            for data in pdf["content"]:
                rows = [
                    (url, ts, bytes(payload), "", "")
                    for url, ts, payload in iter_warc_records(
                        bytes(data), record_types
                    )
                ]
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["url", "warc_ts", "html", "text", "lang"]
                    )

    return parse


def read_warc(spark, path: str, record_types: tuple[str, ...] = ("response",)):
    """Distributed WARC read: ``path`` (file / dir / glob of .warc[.gz])
    → pages DataFrame ``(url, warc_ts, html, text, lang)``. One task per
    archive file (binaryFile source), records parsed Arrow-batched."""
    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(_warc_parser(record_types), PAGES_SCHEMA)


_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_stream(
    spark, path: str, record_types: tuple[str, ...] = ("response",)
):
    """Streaming variant: a directory where .warc.gz archives keep
    arriving (a live crawl drop) → an unbounded pages stream for
    streaming/stream_extract. Same parser, binaryFile file-stream source
    (each new archive becomes one micro-batch input file; exactly-once
    via the stream checkpoint, like every file source)."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .load(path)
        .select("content")
    )
    return files.mapInPandas(_warc_parser(record_types), PAGES_SCHEMA)


# --- independent test-fixture writer --------------------------------------

def make_warc(
    records: list[tuple[str, str, bytes]],
    gz: bool = True,
    http_wrap: bool = True,
    chunked: bool = False,
) -> bytes:
    """WARC/1.0 writer (fixture side; independent of the parser above).
    ``records``: (url, iso_date, body). ``gz=True`` emits the Common
    Crawl shape — one gzip member per record, mtime=0 (byte-stable).
    ``http_wrap`` wraps bodies as HTTP/1.1 responses; ``chunked`` uses
    chunked transfer-encoding (exercises de-chunking)."""
    import gzip as _gzip

    out = bytearray()
    for i, (url, date, body) in enumerate(records):
        if http_wrap:
            if chunked:
                chunks = bytearray()
                step = 7
                for off in range(0, len(body), step):
                    part = body[off : off + step]
                    chunks += b"%x\r\n" % len(part) + part + b"\r\n"
                chunks += b"0\r\n\r\n"
                block = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Transfer-Encoding: chunked\r\n\r\n" + bytes(chunks)
                )
            else:
                block = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
                    + body
                )
        else:
            block = body
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + (b"response" if http_wrap else b"resource") + b"\r\n"
            b"WARC-Record-ID: <urn:uuid:0000-" + str(i).encode() + b">\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + date.encode() + b"\r\n"
            b"Content-Length: " + str(len(block)).encode() + b"\r\n"
            b"\r\n" + block + b"\r\n\r\n"
        )
        if gz:
            buf = io.BytesIO()
            with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
                f.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)
