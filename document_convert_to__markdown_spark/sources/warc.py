"""WARC (ISO 28500) source: Common-Crawl-style web archives → pages.

The natural 100 TB ingest path for this engine is Common Crawl, whose
unit of storage is the ~1 GB gzipped WARC file.  This module provides

- a from-scratch, dependency-free WARC record parser (``iter_records``)
  for plain or gzip-compressed archives (including the per-record-member
  gzip framing Common Crawl uses — Python's ``gzip`` transparently
  concatenates members);
- ``read_warc_pages(spark, path_glob)``: a Spark reader that turns a
  directory of WARC files into the standard pages relation
  (url, warc_ts, html, text, lang) ready for ``run_extraction``;
- ``write_warc`` (driver-side, test fixture use) to serialize pages
  rows back into a valid WARC file.

Scale shape: one WARC file = one ``binaryFile`` row = one task —
exactly the Common Crawl contract (files are sized ~1 GB so a task is
a good work unit; a 100 TB crawl is ~100k files → ~100k tasks).  The
record explosion runs in ``mapInPandas`` (Arrow-batched, one file per
batch row), so record parsing streams inside the executor without a
shuffle; the output feeds the extraction repartition directly.

Format reference: ISO 28500 / the public WARC 1.0 specification
(warc-specifications.iipc.org) — record framing is
``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<Content-Length bytes>\\r\\n\\r\\n``.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator, Optional

CRLF = b"\r\n"


@dataclass
class WarcRecord:
    rec_type: str
    target_uri: Optional[str]
    date: Optional[str]
    headers: dict
    payload: bytes


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace"))
    return headers


# Decompression ceiling per archive: Common Crawl WARCs are ~1 GB
# compressed / ~4-5 GB raw.  A crafted gzip bomb would otherwise expand
# without bound inside the executor (review r2).
MAX_DECOMPRESSED_BYTES = 8 << 30


def _decompress_salvage(data: bytes,
                        max_bytes: int = MAX_DECOMPRESSED_BYTES) -> bytes:
    """Decompress a (possibly multi-member) gzip stream, salvaging every
    complete member from a truncated or trailing-garbage file instead of
    raising — crawl segments do arrive cut off, and one bad tail must
    not lose the records before it (per-row isolation, extractor
    contract).  Output is capped at ``max_bytes``: members decoded
    before the ceiling are kept, the rest of the archive is dropped
    (a gzip bomb must not OOM the executor)."""
    import zlib

    out, total, pos, n = [], 0, 0, len(data)
    while pos < n and data[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:], max_bytes - total)
            if d.unconsumed_tail:
                break  # member alone exceeds the ceiling: stop here
            chunk += d.flush()
        except zlib.error:
            break
        out.append(chunk)
        total += len(chunk)
        if not d.eof:
            break  # truncated final member: keep what decompressed
        if total >= max_bytes:
            break
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def iter_records(data: bytes) -> Iterator[WarcRecord]:
    """Yield records from raw WARC bytes (gzip'd or plain).

    Tolerant of trailing garbage / truncated final records (real crawls
    have them): a record that cannot be framed ends iteration instead
    of raising.
    """
    if data[:2] == b"\x1f\x8b":
        data = _decompress_salvage(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos:pos + 2] == CRLF:
            pos += 2
        if not data[pos:pos + 5] == b"WARC/":
            break
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            break
        headers = _parse_headers(data[pos:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        if body_start + length > n:
            break  # truncated record
        yield WarcRecord(
            rec_type=headers.get("warc-type", ""),
            target_uri=headers.get("warc-target-uri"),
            date=headers.get("warc-date"),
            headers=headers,
            payload=data[body_start:body_start + length],
        )
        pos = body_start + length


def http_response_body(payload: bytes) -> bytes:
    """Strip the HTTP status line + headers from a response payload."""
    sep = payload.find(CRLF + CRLF)
    return payload[sep + 4:] if sep >= 0 else payload


def _parse_warc_date(s: Optional[str]):
    if not s:
        return None
    try:
        return (datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
                .replace(tzinfo=timezone.utc))
    except ValueError:
        return None


def responses_from_warc(data: bytes) -> Iterator[tuple]:
    """(url, warc_ts, html) for every response record with a target."""
    for rec in iter_records(data):
        if rec.rec_type != "response" or not rec.target_uri:
            continue
        yield (rec.target_uri, _parse_warc_date(rec.date),
               http_response_body(rec.payload))


def _explode_warc_blobs(batches):
    """mapInPandas kernel: (content) file-blob rows → pages rows.

    Yields one frame PER FILE, not per Arrow batch: a batch can hold
    several ~1GB archives, and accumulating every decoded record of the
    whole batch before emitting would spike executor memory to
    O(sum of decompressed files) (review r2).  Per-file emission bounds
    the peak at one decompressed archive + its decoded records.
    ``text``/``lang`` are None — they are oracle columns the synthetic
    corpus carries, not crawl data."""
    import pandas as pd

    for pdf in batches:
        for blob in pdf["content"]:
            urls, tss, bodies = [], [], []
            for url, ts, body in responses_from_warc(bytes(blob)):
                urls.append(url)
                tss.append(ts)
                bodies.append(body)
            yield pd.DataFrame({
                "url": urls,
                "warc_ts": tss,
                "html": bodies,
                "text": [None] * len(urls),
                "lang": [None] * len(urls),
            })


# binaryFile's fixed schema — needed explicitly for the streaming
# reader (file-stream sources cannot infer).
BINARY_FILE_SCHEMA = ("path string, modificationTime timestamp, "
                      "length long, content binary")


def read_warc_pages(spark, path_glob: str):
    """Directory/glob of ``.warc``/``.warc.gz`` files → pages relation.

    ``binaryFile`` gives (path, content) rows; each file's records are
    exploded by an Arrow-batched ``mapInPandas``.
    """
    from ..pipeline.schemas import PAGES_SCHEMA

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path_glob)
             .select("content"))
    return files.mapInPandas(_explode_warc_blobs, schema=PAGES_SCHEMA)


def read_warc_pages_stream(spark, path_glob: str,
                           max_files_per_trigger: Optional[int] = None):
    """Streaming twin of ``read_warc_pages``: new WARC files arriving in
    the directory become micro-batches (the continuous-crawl ingest
    shape — each Common Crawl segment shows up as a file, the stream
    checkpoint guarantees each is extracted exactly once)."""
    from ..pipeline.schemas import PAGES_SCHEMA

    reader = (spark.readStream.format("binaryFile")
              .schema(BINARY_FILE_SCHEMA)
              .option("pathGlobFilter", "*.warc*"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path_glob).select("content")
    return files.mapInPandas(_explode_warc_blobs, schema=PAGES_SCHEMA)


def write_warc(rows, fh: io.BufferedIOBase, compress: bool = False,
               warc_date: str = "2024-01-01T00:00:00Z") -> int:
    """Serialize (url, html_bytes) pairs as WARC response records.

    Driver-side helper for fixtures/round-trip tests (a production sink
    would write parquet, not WARC).  Deterministic: fixed WARC-Date
    unless the caller passes per-row dates via 3-tuples.
    """
    out = fh if not compress else gzip.GzipFile(fileobj=fh, mode="wb",
                                                mtime=0)
    n = 0
    for row in rows:
        url, html = row[0], row[1]
        date = row[2] if len(row) > 2 else warc_date
        http = (b"HTTP/1.1 200 OK" + CRLF
                + b"Content-Type: text/html" + CRLF + CRLF + html)
        head = (
            b"WARC/1.0" + CRLF
            + b"WARC-Type: response" + CRLF
            + b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
            + b"WARC-Date: " + str(date).encode("ascii") + CRLF
            + b"WARC-Record-ID: <urn:uuid:" + str(n).encode() + b">" + CRLF
            + b"Content-Length: " + str(len(http)).encode("ascii") + CRLF
            + CRLF
        )
        out.write(head + http + CRLF + CRLF)
        n += 1
    if compress:
        out.close()
    return n
