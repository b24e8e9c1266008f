"""Explicit StructTypes (the reference's implicit dicts, made fixed).

SURVEY.md §1.2: the rebuild uses fixed, explicit schemas everywhere —
required for Arrow UDF return types and stable golden hashes.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input pages table — BASELINE.json input_hint, FIXTURES.md §1.
PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

# Asset struct — SURVEY.md §1.1 "Extracted image set".
ASSET_STRUCT = StructType([
    StructField("name", StringType(), False),
    StructField("page", IntegerType(), True),
    StructField("data", BinaryType(), True),
])

# Raw extraction output: one 'doc' row per input row plus one 'metrics'
# trailer row per partition (per-partition lineage checkpoint, north rule).
EXTRACT_SCHEMA = StructType([
    StructField("kind", StringType(), False),          # 'doc' | 'metrics'
    StructField("url", StringType(), True),
    StructField("doc_name", StringType(), True),
    StructField("format", StringType(), True),
    StructField("status", StringType(), True),
    StructField("error", StringType(), True),
    StructField("markdown", StringType(), True),
    StructField("md_sha256", StringType(), True),
    StructField("n_images", IntegerType(), True),
    StructField("extractor_used", StringType(), True),
    StructField("elapsed_us", LongType(), True),
    StructField("input_bytes", LongType(), True),
    StructField("assets", ArrayType(ASSET_STRUCT), True),
    # metrics-row fields (null on doc rows)
    StructField("partition_id", IntegerType(), True),
    StructField("m_docs", LongType(), True),
    StructField("m_ok", LongType(), True),
    StructField("m_failed", LongType(), True),
    StructField("m_skipped", LongType(), True),
    StructField("m_bytes", LongType(), True),
    StructField("m_elapsed_us", LongType(), True),
])

RESULT_COLUMNS = [
    "url", "doc_name", "format", "status", "error", "markdown",
    "md_sha256", "n_images", "extractor_used", "elapsed_us", "input_bytes",
]

LEDGER_COLUMNS = [
    "partition_id", "m_docs", "m_ok", "m_failed", "m_skipped",
    "m_bytes", "m_elapsed_us",
]

# Golden fixtures table — FIXTURES.md §2.
GOLDEN_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("golden_md", StringType(), True),
    StructField("golden_sha256", StringType(), True),
    StructField("n_images", IntegerType(), True),
    StructField("format", StringType(), True),
])
