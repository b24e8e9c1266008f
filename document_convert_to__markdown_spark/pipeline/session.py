"""SparkSession builder tuned for multi-MB binary rows.

The defaults here are the rebuild's replacement for the reference's dead
performance config (/root/reference/src/config.py:133-139): Spark supplies
real task parallelism, retry and memory management; we only tune what the
workload shape demands (SURVEY.md §4.2 item 3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "doc2md",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 128,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Session with AQE, Arrow, and small Arrow batches for blob rows.

    ``arrow_batch_rows`` is deliberately low (64-256): pages rows carry
    multi-MB ``html`` blobs, and an Arrow batch of the default 10k rows
    would hold gigabytes (SURVEY §4.2; the analog of the reference's
    unused ``chunk_size``/``memory_limit``).  Measured on the ~25KB-page
    bench corpus at local[32]: batch 32 → 7.81s, 128 → 7.51s,
    512 → 8.13s — 128 is the sweet spot between per-batch overhead and
    batch memory footprint.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else "32"
        shuffle_partitions = max(2 * int(n), 8)

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(arrow_batch_rows))
        # Self-describing timestamps for parquet round-trips.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
