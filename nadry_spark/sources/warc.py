"""WARC source — read real Common-Crawl-style web archives into the
engine's pages shape (url, warc_ts, html, text, lang).

The reference crawls live HTTP; at 100TB scale the corpus arrives as
WARC files (ISO 28500 — the Common Crawl container). This reader is
pure stdlib + Spark:

* ``spark.read.format("binaryFile")`` distributes WHOLE FILES — the
  natural WARC split unit, because Common Crawl gzips each record as
  its own member, so a file can only be cut at member boundaries
  anyway. One ~1GB WARC per task is the standard CC processing shape;
  parallelism comes from the file count (CC ships ~64k files per
  crawl).
* A ``mapInPandas`` stage parses records: multi-member gzip handled by
  stdlib ``gzip`` (GzipFile reads concatenated members), WARC/1.0
  headers parsed case-insensitively, only ``WARC-Type: response``
  records with an HTTP payload survive, html = the HTTP body bytes
  (headers stripped at the first CRLFCRLF), warc_ts from ``WARC-Date``
  (ISO-8601).
* ``text``/``lang`` are left empty — extraction is the indexing
  pipeline's job (extract_documents), keeping the per-url
  byte-identity invariant intact.

``write_warc`` emits valid (optionally per-record-gzipped) WARC files
from a pages frame/rows — the test-fixture writer, and the round-trip
proof that the parser implements the format rather than a private
dialect.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"

_GZIP_MAGIC = b"\x1f\x8b"


def parse_warc_bytes(data: bytes) -> Iterator[tuple[str, _dt.datetime, bytes]]:
    """Yield (url, warc_ts, html_bytes) for every response record.

    Handles plain and gzipped (single- or multi-member) buffers.
    Malformed records are skipped, not fatal — hostile/truncated
    archives must never kill the job (same policy as media decode).
    """
    if data[:2] == _GZIP_MAGIC:
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
            data = gz.read()
    pos = 0
    n = len(data)
    while pos < n:
        # find the record header block
        head_start = data.find(b"WARC/", pos)
        if head_start < 0:
            break
        head_end = data.find(b"\r\n\r\n", head_start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[head_start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        body_start = head_end + 4
        body = data[body_start : body_start + length]
        pos = body_start + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts_raw = headers.get("warc-date")
        if not url or not ts_raw:
            continue
        try:
            ts = _dt.datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
        except ValueError:
            continue
        # HTTP payload: strip the status line + headers
        http_end = body.find(b"\r\n\r\n")
        html = body[http_end + 4 :] if http_end >= 0 else body
        yield url, ts, html


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files -> pages DataFrame (input_hint shape). One task per
    file (binaryFile source); records parse inside mapInPandas."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path_glob)

    def gen(batches):
        for pdf in batches:
            urls, tss, htmls = [], [], []
            for content in pdf["content"]:
                for url, ts, html in parse_warc_bytes(bytes(content)):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(html)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": tss,
                    "html": htmls,
                    "text": [""] * len(urls),
                    "lang": [""] * len(urls),
                }
            )

    return raw.select("content").mapInPandas(gen, PAGES_DDL)


def warc_record(url: str, ts: _dt.datetime, html: bytes) -> bytes:
    """One WARC/1.0 response record wrapping an HTTP 200 payload."""
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
        + html
    )
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        f"Content-Length: {len(http)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
    ).encode()
    return head + b"\r\n" + http + b"\r\n\r\n"


def write_warc(path: str, rows, per_record_gzip: bool = False) -> str:
    """rows of (url, warc_ts, html_bytes) -> one WARC file on disk.
    per_record_gzip=True writes each record as its own gzip member —
    the Common Crawl layout."""
    with open(path, "wb") as f:
        for url, ts, html in rows:
            rec = warc_record(url, ts, html)
            f.write(gzip.compress(rec) if per_record_gzip else rec)
    return path
