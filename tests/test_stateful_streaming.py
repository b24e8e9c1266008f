"""applyInPandasWithState sessionization: cross-run state via checkpoint
must reproduce batch window-function sessionization exactly."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from document_convert_to__markdown_spark.streaming import run_stream_sessionize


def _batch_sessions(events):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag(F.unix_timestamp("ts")).over(w)
    new_sess = F.when(
        prev_ts.isNull() | ((F.unix_timestamp("ts") - prev_ts) > 1800), 1
    ).otherwise(0)
    return (
        events.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"),
             F.count("*").alias("n_events"))
    )


@pytest.fixture(scope="module")
def split_events(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stateful")
    inp, chk, out = str(base / "in"), str(base / "chk"), str(base / "out")
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet") \
        .filter("user_id < 20")
    median_ts = ev.selectExpr("percentile(unix_timestamp(ts), 0.5) p").first()["p"]
    early = ev.filter(F.unix_timestamp("ts") <= median_ts)
    late = ev.filter(F.unix_timestamp("ts") > median_ts)
    return ev, early, late, inp, chk, out


def test_stateful_sessionize_across_runs(spark, split_events):
    ev, early, late, inp, chk, out = split_events

    # Run 1: only the early half is in the source.
    early.repartition(2).write.mode("overwrite").parquet(inp)
    mid = run_stream_sessionize(spark, inp, chk, out)
    mid_batch = _batch_sessions(early)
    assert mid.exceptAll(mid_batch).count() == 0
    assert mid_batch.exceptAll(mid).count() == 0

    # Run 2: late half arrives; same checkpoint → state resumes, sessions
    # spanning the split boundary must NOT be double-counted.
    late.repartition(2).write.mode("append").parquet(inp)
    final = run_stream_sessionize(spark, inp, chk, out)
    final_batch = _batch_sessions(ev)
    assert final.exceptAll(final_batch).count() == 0
    assert final_batch.exceptAll(final).count() == 0
