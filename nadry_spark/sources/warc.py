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
* Decoding is STREAMING with bounded memory: records are parsed out of
  a chunked read loop whose resident buffer never exceeds one record +
  one chunk (``parse_warc_stream``; ``stats['max_buf']`` exposes the
  high-water mark so tests can assert the bound instead of sampling
  RSS). Multi-member gzip (the CC per-record layout) decompresses
  member-at-a-time through stdlib ``gzip.GzipFile`` — the raw archive
  is never inflated into one buffer.
* For local (``file:``) inputs the task projects ONLY the binaryFile
  ``path`` column (binaryFile prunes ``content`` when unreferenced)
  and streams straight off disk, so not even the compressed archive is
  resident; for remote filesystems it falls back to the ``content``
  bytes (the compressed size is then the floor, decode still bounded).
* Output crosses mapInPandas in bounded record batches (not one frame
  per file), so a 1GB archive never materializes as a single pandas
  frame either.
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
from urllib.parse import urlparse
from urllib.request import url2pathname

from pyspark.sql import DataFrame, SparkSession

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"

_GZIP_MAGIC = b"\x1f\x8b"
_CHUNK = 1 << 20  # 1 MiB decompressed read unit
# output batch bounds: whichever trips first ends the pandas frame
_BATCH_RECORDS = 512
_BATCH_BYTES = 64 << 20


class _TolerantMultiGzip:
    """Member-at-a-time gzip decoder (zlib.decompressobj(31)) that
    returns everything decodable BEFORE any corruption instead of
    raising: GzipFile.read() raises EOFError/BadGzipFile mid-call on a
    truncated member and the data it had already inflated in that call
    is lost — here a truncated or corrupt tail just ends the stream at
    the last clean byte (records decoded so far survive). Inflates only
    what the caller read()s, so memory stays bounded."""

    def __init__(self, raw, comp_chunk: int = 1 << 18):
        import zlib

        self._zlib = zlib
        self._raw = raw
        self._n = comp_chunk
        self._d = zlib.decompressobj(31)
        self._buf = b""  # compressed bytes not yet consumed
        self._dead = False

    def read(self, size: int = -1) -> bytes:
        if size is None or size < 0:
            size = 1 << 62  # "all": loop to EOF
        out = bytearray()
        while len(out) < size and not self._dead:
            if self._d.eof:
                # member boundary: next member starts in unused_data
                tail = self._d.unused_data + self._buf
                if not tail:
                    tail = self._raw.read(self._n)
                    if not tail:
                        break  # clean EOF
                self._d = self._zlib.decompressobj(31)
                self._buf = tail
                continue
            if not self._buf:
                self._buf = self._raw.read(self._n)
                if not self._buf:
                    self._dead = True  # truncated mid-member
                    break
            try:
                data = self._d.decompress(self._buf, size - len(out))
            except self._zlib.error:
                self._dead = True  # corrupt member: stop at last clean byte
                break
            # CPython quirk: when the member ENDS under a max_length cap,
            # the remainder shows up in BOTH unused_data and
            # unconsumed_tail — keeping the tail too would duplicate
            # those compressed bytes at the member hand-off
            self._buf = b"" if self._d.eof else self._d.unconsumed_tail
            out += data
        return bytes(out)


def _decompressed_stream(raw: io.BufferedIOBase):
    """Wrap gzipped input in a tolerant member-at-a-time streaming
    decoder; pass plain WARC through. Peeks 2 bytes without consuming."""
    head = raw.peek(2)[:2] if hasattr(raw, "peek") else b""
    if not head:  # unpeekable (e.g. bare BytesIO): read + push back
        pos = raw.tell()
        head = raw.read(2)
        raw.seek(pos)
    if head == _GZIP_MAGIC:
        return _TolerantMultiGzip(raw)
    return raw


_MAX_HEADER_BYTES = 1 << 20  # a real WARC header block is < 1 KiB
_MAX_RECORD_BYTES = 1 << 30  # spec allows huge records; cap what we BUFFER


def parse_warc_stream(
    stream,
    chunk_size: int = _CHUNK,
    stats: dict | None = None,
    max_record_bytes: int = _MAX_RECORD_BYTES,
    record_types: tuple[str, ...] = ("response",),
) -> Iterator[tuple[str, _dt.datetime, bytes]]:
    """Yield (url, warc_ts, payload_bytes) records of the requested
    WARC-Types from a
    readable byte stream, incrementally: the resident buffer holds at
    most one record body + one chunk (``stats['max_buf']`` records the
    observed high-water mark — the testable memory bound). Malformed
    records are skipped, not fatal — hostile/truncated archives must
    never kill the job (same policy as media decode):

    * gzip-level corruption (truncated member, junk between members)
      ends the stream at the last decodable byte instead of raising —
      records before the corruption survive;
    * a header block that never terminates within 1 MiB is discarded as
      garbage rather than buffered to EOF;
    * a record declaring Content-Length beyond ``max_record_bytes`` is
      SKIPPED by streaming-discard — its bytes pass through in chunks
      without ever residing in the buffer, so a hostile length field
      cannot OOM the task.
    """
    import zlib

    buf = bytearray()
    eof = False
    max_buf = 0

    def read_chunk() -> bytes:
        """One decompressed chunk; corruption == EOF, never fatal."""
        nonlocal eof
        if eof:
            return b""
        try:
            chunk = stream.read(chunk_size)
        except (EOFError, OSError, gzip.BadGzipFile, zlib.error):
            chunk = b""
        if not chunk:
            eof = True
        return chunk

    def fill() -> bool:
        """Append one chunk; False at EOF."""
        nonlocal max_buf
        chunk = read_chunk()
        if not chunk:
            return False
        buf.extend(chunk)
        max_buf = max(max_buf, len(buf))
        return True

    try:
        while True:
            # locate the next record header start, discarding garbage
            # (keep a 4-byte tail so 'WARC/' can't hide on a boundary)
            head_start = buf.find(b"WARC/")
            while head_start < 0:
                if len(buf) > 4:
                    del buf[: len(buf) - 4]
                if not fill():
                    return
                head_start = buf.find(b"WARC/")
            if head_start:
                del buf[:head_start]

            # complete the header block (bounded: hostile input with a
            # magic but no terminator must not buffer to EOF)
            head_end = buf.find(b"\r\n\r\n")
            while head_end < 0 and len(buf) <= _MAX_HEADER_BYTES:
                if not fill():
                    return
                head_end = buf.find(b"\r\n\r\n")
            if head_end < 0:  # unterminated: drop this magic, rescan
                del buf[:5]
                continue

            headers: dict[str, str] = {}
            for line in bytes(buf[:head_end]).split(b"\r\n")[1:]:
                k, sep, v = line.partition(b":")
                if sep:
                    headers[k.strip().lower().decode("ascii", "replace")] = (
                        v.strip().decode("utf-8", "replace")
                    )
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                del buf[: head_end + 4]
                continue

            if length < 0:
                del buf[: head_end + 4]
                continue
            if length > max_record_bytes:
                # streaming-discard: consume the oversized body chunk by
                # chunk without growing the buffer past one chunk
                remaining = length - (len(buf) - head_end - 4)
                del buf[:]
                while remaining > 0:
                    chunk = read_chunk()
                    if not chunk:
                        return
                    remaining -= len(chunk)
                if remaining < 0:  # chunk overshot into the next record
                    buf.extend(chunk[remaining:])
                    max_buf = max(max_buf, len(buf))
                continue

            # complete the body (resident bound: one record + one chunk)
            body_end = head_end + 4 + length
            while len(buf) < body_end and fill():
                pass
            body = bytes(buf[head_end + 4 : body_end])
            del buf[:body_end]

            rtype = headers.get("warc-type")
            if rtype not in record_types:
                continue
            url = headers.get("warc-target-uri")
            ts_raw = headers.get("warc-date")
            if not url or not ts_raw:
                continue
            try:
                ts = _dt.datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
            except ValueError:
                continue
            if rtype == "response":
                # HTTP payload: strip the status line + headers
                http_end = body.find(b"\r\n\r\n")
                body = body[http_end + 4 :] if http_end >= 0 else body
            # conversion (WET) bodies are the bare extracted text
            yield url, ts, body
    finally:
        if stats is not None:
            stats["max_buf"] = max_buf


def parse_warc_bytes(data: bytes) -> Iterator[tuple[str, _dt.datetime, bytes]]:
    """Yield (url, warc_ts, html_bytes) for every response record in an
    in-memory buffer (plain or gzipped, single- or multi-member) —
    thin wrapper over the streaming parser."""
    yield from parse_warc_stream(_decompressed_stream(io.BufferedReader(io.BytesIO(data))))


def _record_frames(
    records: Iterator[tuple[str, _dt.datetime, bytes]], as_text: bool = False
):
    """Pack a record iterator into bounded pandas frames. ``as_text``
    (WET conversion records) routes the payload to the ``text``
    column — extraction is already done, html stays empty."""
    import pandas as pd

    urls: list[str] = []
    tss: list[_dt.datetime] = []
    htmls: list[bytes] = []
    nbytes = 0

    def frame():
        if as_text:
            return pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": tss,
                    "html": [b""] * len(urls),
                    "text": [h.decode("utf-8", "replace") for h in htmls],
                    "lang": [""] * len(urls),
                }
            )
        return pd.DataFrame(
            {
                "url": urls,
                "warc_ts": tss,
                "html": htmls,
                "text": [""] * len(urls),
                "lang": [""] * len(urls),
            }
        )

    for url, ts, html in records:
        urls.append(url)
        tss.append(ts)
        htmls.append(html)
        nbytes += len(html)
        if len(urls) >= _BATCH_RECORDS or nbytes >= _BATCH_BYTES:
            yield frame()
            urls, tss, htmls, nbytes = [], [], [], 0
    if urls:
        yield frame()


def _pages_from_paths(batches, record_types=("response",), as_text=False):
    """mapInPandas gen over binaryFile ``path`` rows: open each local
    archive and stream-decode (bounded memory, disk -> records)."""
    for pdf in batches:
        for uri in pdf["path"]:
            parsed = urlparse(uri)
            if parsed.scheme not in ("", "file"):
                raise ValueError(
                    f"local-path WARC decode got non-file URI {uri!r} — "
                    "the defaultFS sniff in read_warc chose wrongly; "
                    "pass an explicit scheme in the glob"
                )
            local = url2pathname(parsed.path)
            with open(local, "rb") as f:
                yield from _record_frames(
                    parse_warc_stream(
                        _decompressed_stream(f), record_types=record_types
                    ),
                    as_text=as_text,
                )


def _pages_from_content(batches, record_types=("response",), as_text=False):
    """mapInPandas gen over binaryFile ``content`` rows (non-local
    filesystems): compressed bytes resident, decode still bounded."""
    for pdf in batches:
        for content in pdf["content"]:
            stream = _decompressed_stream(
                io.BufferedReader(io.BytesIO(bytes(content)))
            )
            yield from _record_frames(
                parse_warc_stream(stream, record_types=record_types),
                as_text=as_text,
            )


def _is_local_glob(spark: SparkSession, path_glob: str) -> bool:
    """Whether a binaryFile glob resolves to local files tasks can
    open() directly. An explicit scheme decides outright; a bare path
    resolves against Hadoop's fs.defaultFS (on a cluster whose default
    filesystem is HDFS/S3, a scheme-less glob is NOT local)."""
    scheme = urlparse(path_glob).scheme
    if scheme:
        return scheme == "file"
    default = spark.sparkContext._jsc.hadoopConfiguration().get(
        "fs.defaultFS", "file:///"
    )
    return default.startswith("file:")


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files -> pages DataFrame (input_hint shape). One task per
    file (binaryFile source); records stream out of mapInPandas in
    bounded batches. Local globs (explicit file: scheme, or scheme-less
    when fs.defaultFS is local) stream straight off disk — only the
    ``path`` column is projected, so binaryFile never loads the archive
    bytes into the row; other filesystems fall back to the ``content``
    column with streaming decode on top."""
    raw = spark.read.format("binaryFile").load(path_glob)
    if _is_local_glob(spark, path_glob):
        return raw.select("path").mapInPandas(_pages_from_paths, PAGES_DDL)
    return raw.select("content").mapInPandas(_pages_from_content, PAGES_DDL)


def read_warc_stream(
    spark: SparkSession, path_glob: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_warc`: a binaryFile
    file-source stream over a (growing) directory of WARC archives —
    drop Common-Crawl files into the directory and each micro-batch
    parses up to ``max_files_per_trigger`` whole archives (the natural
    WARC split unit) into pages rows with the same bounded-memory
    decode as the batch reader. Feed to streaming/ingest.stream_ingest
    via the ``warc:`` input scheme."""
    raw = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; binaryFile's is
        # fixed by the format
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path_glob)
    )
    if _is_local_glob(spark, path_glob):
        return raw.select("path").mapInPandas(_pages_from_paths, PAGES_DDL)
    return raw.select("content").mapInPandas(_pages_from_content, PAGES_DDL)


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


def read_wet(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET (Common Crawl extracted-text) archives -> pages DataFrame:
    conversion records carry the already-extracted plain text, so rows
    come back with ``text`` filled and ``html`` empty — the index
    build's text fall-through (operators/index_build.py) indexes them
    without re-extraction. Same bounded-memory streaming decode and
    local-path/content dispatch as :func:`read_warc`."""
    from functools import partial

    raw = spark.read.format("binaryFile").load(path_glob)
    if _is_local_glob(spark, path_glob):
        return raw.select("path").mapInPandas(
            partial(_pages_from_paths, record_types=("conversion",), as_text=True),
            PAGES_DDL,
        )
    return raw.select("content").mapInPandas(
        partial(_pages_from_content, record_types=("conversion",), as_text=True),
        PAGES_DDL,
    )


def wet_record(url: str, ts: _dt.datetime, text: str) -> bytes:
    """One WET conversion record (bare text payload, no HTTP)."""
    body = text.encode("utf-8")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "Content-Type: text/plain\r\n"
    ).encode()
    return head + b"\r\n" + body + b"\r\n\r\n"


def write_wet(path: str, rows, per_record_gzip: bool = False) -> str:
    """rows of (url, warc_ts, text) -> one WET file on disk."""
    with open(path, "wb") as f:
        for url, ts, text in rows:
            rec = wet_record(url, ts, text)
            f.write(gzip.compress(rec) if per_record_gzip else rec)
    return path


def read_wet_stream(
    spark: SparkSession, path_glob: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_wet` — watch a
    directory of WET archives, same bounded decode per micro-batch."""
    from functools import partial

    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path_glob)
    )
    if _is_local_glob(spark, path_glob):
        return raw.select("path").mapInPandas(
            partial(_pages_from_paths, record_types=("conversion",), as_text=True),
            PAGES_DDL,
        )
    return raw.select("content").mapInPandas(
        partial(_pages_from_content, record_types=("conversion",), as_text=True),
        PAGES_DDL,
    )
