"""CDXJ capture-index source — the third leg of the Common Crawl trio.

Common Crawl publishes three artifact families per crawl: WARC (raw
responses — ``sources/warc.py``), WET (extracted text —
``read_wet_pages`` / the ``wet`` DataSource), and the **CDX index**:
one line per capture, sorted by SURT key, that tells you *where* in
which WARC file a url's record lives without touching the archive.
A 100 TB crawl's index is ~200 GB — the thing you scan to plan the
scan.  This module reads the modern CDXJ flavor (IIPC CDX file
format; cc-index "collinfo" files):

    <surt key> <14-digit timestamp> <JSON blob>

e.g. ``com,example)/page 20240101000000 {"url": "https://example.com/page",
"mime": "text/html", "status": "200", "digest": "sha1:..", "length":
"2042", "offset": "384", "filename": "crawl-00.warc.gz"}``

Spark-first shape: ``spark.read.text`` handles the (gzipped) line
files with ordinary file-split parallelism; the line splits once with
a **limit of 3** (the JSON blob itself contains spaces), the blob
parses with ``from_json`` — scan, split, parse all JVM-side, zero
Python in the hot path.  Typical downstream: filter on surt prefix /
status / mime (all pushable predicates), then range-group by
``filename`` + ``offset`` to fetch exactly the WARC members you need.

``write_cdx`` is the driver-side fixture serializer (a production
index is written by the crawler, not this engine).
"""
from __future__ import annotations

import gzip
import io
import json

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# The JSON blob's documented fields.  Common Crawl stores numerics as
# JSON strings; length/offset are cast to long after parsing.
CDX_JSON_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("digest", T.StringType()),
    T.StructField("length", T.StringType()),
    T.StructField("offset", T.StringType()),
    T.StructField("filename", T.StringType()),
])


def read_cdx(spark, path_glob: str) -> DataFrame:
    """Directory/glob of ``.cdx``/``.cdx.gz`` line files → the typed
    capture relation (surt, ts, url, mime, status, digest, length,
    offset, filename).  Malformed lines (no JSON brace, short split)
    surface as null-url rows rather than killing the scan — filter on
    ``url is not null`` for the strict view (no silent drops: the row
    count is preserved)."""
    return _parse_cdx_lines(spark.read.text(path_glob))


def _parse_cdx_lines(lines: DataFrame) -> DataFrame:
    parts = F.split(F.col("value"), " ", 3)
    # F.get (not []): a short line must yield nulls, not an ANSI
    # array-index error that kills the whole scan.
    blob = F.from_json(F.get(parts, 2), CDX_JSON_SCHEMA)
    return (
        lines
        .select(
            F.get(parts, 0).alias("surt"),
            F.try_to_timestamp(F.get(parts, 1),
                               F.lit("yyyyMMddHHmmss")).alias("ts"),
            blob.alias("j"),
        )
        .select(
            "surt", "ts",
            F.col("j.url").alias("url"),
            F.col("j.mime").alias("mime"),
            F.col("j.status").alias("status"),
            F.col("j.digest").alias("digest"),
            F.col("j.length").cast("long").alias("length"),
            F.col("j.offset").cast("long").alias("offset"),
            F.col("j.filename").alias("filename"),
        )
    )


def read_cdx_stream(spark, path_glob: str,
                    max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming twin of ``read_cdx``: each crawl publishes new index
    files; they arrive as micro-batches (checkpointed exactly-once per
    file), parsed by the same relational pipeline — the continuous
    front half of an index-driven selective-fetch loop."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               max_files_per_trigger)
    return _parse_cdx_lines(reader.load(path_glob))


def write_cdx(rows, fh: io.BufferedIOBase, compress: bool = False) -> int:
    """Serialize capture dicts as sorted CDXJ lines (fixture helper).

    ``rows``: iterable of (surt, ts14, blob_dict).  Lines are emitted
    sorted by (surt, ts) — the format's invariant (range scans depend
    on it).
    """
    out = fh if not compress else gzip.GzipFile(fileobj=fh, mode="wb",
                                                mtime=0)
    n = 0
    for surt, ts14, blob in sorted(rows, key=lambda r: (r[0], r[1])):
        line = f"{surt} {ts14} {json.dumps(blob, sort_keys=True)}\n"
        out.write(line.encode("utf-8"))
        n += 1
    if compress:
        out.close()
    return n
