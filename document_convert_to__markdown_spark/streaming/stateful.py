"""Custom stateful streaming operator: cross-batch sessionization.

The batch layer sessionizes with window functions
(``__spark_entry__._q_sessionize_events``); a live ingest cannot — a
session that spans two micro-batches needs carried state.  This is the
``applyInPandasWithState`` shape: per-user state
``(last_ts, n_sessions, n_events)`` lives in the state store, survives
across micro-batches AND restarts (checkpointed with the query), and
each batch emits the updated running totals for the users it touched.

Scale notes: state is keyed by user_id — the same hash partitioning as
any groupBy, so state shards scale with ``spark.sql.shuffle.partitions``;
per-key state is three longs (bounded, no event retention).  A
production variant would add a GroupStateTimeout to expire idle users
and emit closed sessions instead of running totals.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .stream_job import EVENTS_STREAM_SCHEMA as EVENTS_SCHEMA
OUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_ts long, n_sessions long, n_events long"


def _sessionize_group(key: tuple, pdfs: Iterable[pd.DataFrame],
                      state: Any) -> Iterator[pd.DataFrame]:
    gap_sec = 1800
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = None, 0, 0

    batch = pd.concat(list(pdfs))
    # Order within the micro-batch; cross-batch order comes from arrival
    # order (file commit order), which the caller must make time-ordered.
    batch = batch.sort_values(["ts", "event_id"])
    for ts in batch["ts"]:
        epoch = int(ts.timestamp())
        if last_ts is None or epoch - last_ts > gap_sec:
            n_sessions += 1
        last_ts = epoch
        n_events += 1

    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [n_sessions],
                        "n_events": [n_events]})


def stream_sessionize(
    spark: SparkSession,
    input_path: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming plan: events file-stream → stateful per-user sessions."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .stream_job import _as_stream_source

    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(_as_stream_source(input_path))
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_sessionize(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drain the stateful stream (availableNow) through a foreachBatch
    parquet sink and return the latest per-user totals.

    foreachBatch is a fault-tolerant sink, so re-running with the same
    checkpoint resumes the state store: only new files are processed and
    session counts continue where they left off — the streaming analog
    of the batch ledger resume.  Each micro-batch appends rows tagged
    with its batch_id; batch ids keep increasing across restarts, so the
    max-batch_id row per user is the current total.

    ``state_partitions`` sizes the ``applyInPandasWithState`` state
    store for THIS query, same contract as
    ``stream_job.drain_stream_agg``: the shuffle-partition count is
    frozen into the checkpoint at first start, and a short availableNow
    drain over the session default pays partitions × micro-batches of
    pure store init/commit fixed cost.  A continuous production query
    sizes this to steady-state throughput; results are partition-count
    independent either way.  Pass ``None`` to keep the session value
    (required when resuming a checkpoint created under it).
    """
    from pyspark.sql import functions as F

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(output_path))

    conf_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(conf_key)
    if state_partitions is not None:
        spark.conf.set(conf_key, str(state_partitions))
    try:
        q = (
            stream_sessionize(spark, input_path)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_path)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if state_partitions is not None:
            spark.conf.set(conf_key, saved)
    if not q.awaitTermination(120):
        q.stop()
        # Silent partials masquerade as complete session totals — fail
        # loudly instead (review r2).
        raise TimeoutError("sessionize drain exceeded 120s; partial "
                           "state would be returned as final")

    from pyspark.sql.window import Window

    rows = spark.read.parquet(output_path)
    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("user_id", "n_sessions", "n_events")
    )
