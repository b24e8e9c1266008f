"""Structured Streaming front-end for the extraction pipeline.

The reference is strictly batch (SURVEY.md §2 Part B "Streaming:
absent"), but at 10^12-document scale new Common-Crawl snapshots arrive
continuously; the Spark-native shape is a file/Iceberg *stream* into the
same extraction logic the batch job uses:

    readStream(pages) ─ size gate ─ mapInPandas(extract) ─ writeStream

Checkpoint semantics come from Spark itself: the streaming checkpoint
(WAL + source offsets) makes the run **resumable exactly-once at the
input-file granularity** — a crash mid-run resumes from the last
committed micro-batch with no duplicate extraction.  This complements
the batch layer's url-keyed anti-join resume (pipeline/job.py): batch
resume recovers *within* a snapshot, the stream checkpoint recovers
*across* arrivals.

Watermarked windowed metrics (`stream_window_metrics`) demonstrate
late-data handling over `warc_ts`: per-window/per-format doc and byte
counts, tolerating `watermark_delay` of out-of-order crawl timestamps.

Everything here reuses the batch extractor body — one code path to keep
byte-parity guarantees identical between batch and streaming.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extractors.extract import MAX_DOCUMENT_BYTES
from ..pipeline.job import _extract_partition
from ..pipeline.schemas import EXTRACT_SCHEMA, PAGES_SCHEMA, RESULT_COLUMNS


def stream_extract_df(
    spark: SparkSession,
    input_path: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming extraction plan over a parquet directory of pages.

    File-source streaming is the sandbox stand-in for an Iceberg
    incremental scan (`spark.readStream.format("iceberg")` on a real
    cluster — same plan shape, different source).  Giant-doc routing is
    not split into a second branch here: streaming unions of two
    repartitioned branches would need two stateful queries; instead the
    micro-batch boundary itself bounds skew (small
    ``maxFilesPerTrigger`` keeps any one batch's giant count low).
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_path)

    sized = pages.select("url", "html").filter(
        F.coalesce(F.length("html"), F.lit(0)) <= F.lit(MAX_DOCUMENT_BYTES)
    )
    raw = sized.mapInPandas(_extract_partition, schema=EXTRACT_SCHEMA)
    return raw.filter(F.col("kind") == "doc").select(*RESULT_COLUMNS)


def run_stream_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Run the stream to parquet; returns the StreamingQuery.

    ``available_now=True`` drains everything currently in the source and
    stops — batch-like semantics with streaming's checkpoint/resume
    guarantees (the test-and-sandbox mode).  ``False`` runs continuous
    micro-batches for a live ingest.  Re-running with the same
    checkpoint only processes files added since the last commit.
    """
    results = stream_extract_df(spark, input_path, max_files_per_trigger)
    writer = (
        results.writeStream
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_window_metrics(
    spark: SparkSession,
    input_path: str,
    window: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Watermarked per-window ingest metrics (streaming aggregation).

    Groups arriving pages into event-time windows on ``warc_ts`` with a
    late-data watermark: crawl records up to ``watermark_delay`` out of
    order still land in their window; older ones are dropped and state
    for closed windows is reclaimed (bounded state at unbounded input —
    the property that matters at 10^12 rows).
    """
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_path)
    return (
        pages.withWatermark("warc_ts", watermark_delay)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.length("html"), F.lit(0))).alias("total_bytes"),
        )
        .select("w.start", "w.end", "lang", "n_docs", "total_bytes")
    )


def stream_dedup_user_counts(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming exact dedup (the crawl-ingest pattern: repeated urls
    across arrivals keep only their first occurrence) demonstrated on the
    events table: distinct users per event_type via stream-side
    ``dropDuplicates`` state.

    Drained, the result equals batch ``count(DISTINCT ...)`` — the DuckDB
    oracle.  At scale the dedup state is hash-partitioned by key across
    the state store; a production crawl feed adds
    ``dropDuplicatesWithinWatermark`` so state for old events expires.
    """
    import os
    import tempfile

    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="doc2md_stream_src_")
        os.symlink(os.path.abspath(events_path),
                   os.path.join(d, os.path.basename(events_path)))
        events_path = d
    events = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
        .parquet(events_path)
    )
    agg = (
        events.select("event_type", "user_id")
        .dropDuplicates(["event_type", "user_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_distinct_users"))
    )
    return drain_stream_agg(agg, "stream_dedup_users")


def drain_stream_agg(agg: DataFrame, name: str) -> DataFrame:
    """Run a streaming aggregation to completion (availableNow) into a
    memory sink and return the result as a batch DataFrame.

    Complete-mode + availableNow drains everything currently in the
    source, so the result is deterministic and oracle-comparable — the
    harness path that lets streaming operators face the same DuckDB
    check as batch ones.
    """
    spark = agg.sparkSession
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def stream_events_daily(spark: SparkSession, events_path: str) -> DataFrame:
    """Watermarked 1-day tumbling-window rollup of the events stream.

    Exactly SQL-expressible once drained: window start == day truncation
    — the DuckDB oracle is a plain ``date_trunc('day', ts)`` GROUP BY.
    """
    import os
    import tempfile

    if os.path.isfile(events_path):
        # File-source streaming requires a directory; link the file in.
        d = tempfile.mkdtemp(prefix="doc2md_stream_src_")
        os.symlink(os.path.abspath(events_path),
                   os.path.join(d, os.path.basename(events_path)))
        events_path = d
    events = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
        .parquet(events_path)
    )
    agg = (
        events.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"),
            "event_type", "n_events", "total_value",
        )
    )
    return drain_stream_agg(agg, "stream_events_daily")
