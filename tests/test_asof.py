"""As-of join: backward/forward semantics, ties, left-join nulls."""

from datetime import datetime

from pyspark.sql import functions as F

from document_convert_to__markdown_spark.operators.asof import asof_join


def _t(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", _t("2024-01-01T10:00:00")),
         (2, "u1", _t("2024-01-01T12:00:00")),
         (3, "u2", _t("2024-01-01T09:00:00")),   # before any right row
         (4, "u1", _t("2024-01-01T11:00:00"))],  # exact tie with right
        ["id", "user", "ts"])
    right = spark.createDataFrame(
        [("u1", _t("2024-01-01T09:30:00"), 1.0),
         ("u1", _t("2024-01-01T11:00:00"), 2.0),
         ("u2", _t("2024-01-01T23:00:00"), 9.0)],
        ["user", "ts", "v"])
    return left, right


def test_backward_semantics_and_ties(spark):
    left, right = _frames(spark)
    out = {r["id"]: r for r in
           asof_join(left, right, on="ts", by="user",
                     right_cols=["v"]).collect()}
    assert out[1]["v_right"] == 1.0          # latest at-or-before 10:00
    assert out[2]["v_right"] == 2.0          # 11:00 row wins at 12:00
    assert out[4]["v_right"] == 2.0          # inclusive: equal ts matches
    assert out[3]["v_right"] is None         # left-join: no earlier row
    assert out[3]["ts_right"] is None


def test_forward_semantics(spark):
    left, right = _frames(spark)
    out = {r["id"]: r for r in
           asof_join(left, right, on="ts", by="user", right_cols=["v"],
                     direction="forward").collect()}
    assert out[1]["v_right"] == 2.0          # earliest at-or-after 10:00
    assert out[3]["v_right"] == 9.0          # u2's 23:00 row
    assert out[4]["v_right"] == 2.0          # inclusive tie
    assert out[2]["v_right"] is None         # nothing after 12:00


def test_unkeyed_small_works_and_large_refused(spark, monkeypatch):
    """by=None funnels everything through one window partition — allowed
    for small reference relations, refused beyond the row limit
    (VERDICT r2 #4)."""
    import pytest

    from document_convert_to__markdown_spark.operators import asof as mod

    left, right = _frames(spark)
    out = {r["id"]: r for r in
           asof_join(left.drop("user"), right.drop("user"), on="ts",
                     right_cols=["v"]).collect()}
    assert out[3]["v_right"] is None     # 09:00 precedes every right row
    assert out[1]["v_right"] == 1.0      # keyless: 09:30 row wins at 10:00

    monkeypatch.setattr(mod, "_UNKEYED_ROW_LIMIT", 5)
    with pytest.raises(ValueError, match="one window partition"):
        mod.asof_join(left.drop("user"), right.drop("user"), on="ts",
                      right_cols=["v"])


def test_asof_matches_duckdb_on_events(spark):
    """Cross-engine: the union-window plan equals DuckDB's native ASOF
    LEFT JOIN on the sf0.01 events table, row for row."""
    import duckdb

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view") \
        .select("user_id", "ts", "value")
    got = {r["event_id"]: (r["ts_m"], r["value_m"]) for r in
           asof_join(clicks, views, on="ts", by="user_id",
                     right_cols=["value"], suffix="_m").collect()}

    con = duckdb.connect()
    con.execute("SET threads TO 2")
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.01/events.parquet')")
    want = {row[0]: (row[1], row[2]) for row in con.execute("""
        SELECT l.event_id, r.ts, r.value
        FROM (SELECT * FROM events WHERE event_type='click') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='view') r
          ON l.user_id = r.user_id AND l.ts >= r.ts""").fetchall()}
    assert got == want


def test_interval_join_matches_naive(spark):
    """Binned equi-join == naive BETWEEN join, incl. boundary points."""
    from document_convert_to__markdown_spark.operators.asof import (
        interval_join,
    )

    pts = spark.createDataFrame(
        [(1, "u", _t("2024-01-01T10:00:00")),
         (2, "u", _t("2024-01-01T10:15:00")),   # exact end boundary
         (3, "u", _t("2024-01-01T10:15:01")),   # just outside
         (4, "v", _t("2024-01-01T10:00:00"))],  # other key
        ["pid", "user", "ts"])
    ivs = spark.createDataFrame(
        [(100, "u", _t("2024-01-01T09:45:00"), _t("2024-01-01T10:15:00"))],
        ["iid", "user", "start", "end"])

    got = interval_join(pts, ivs, point_col="ts", by="user",
                        bin_seconds=60)
    assert sorted(r["pid"] for r in got.collect()) == [1, 2]

    naive = pts.join(ivs, "user").filter(
        (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
    assert sorted(r["pid"] for r in naive.collect()) == [1, 2]


def test_interval_join_corpus_parity_with_naive(spark):
    """On real events, the binned plan returns exactly the naive
    BETWEEN join's pairs for several bin widths."""
    from document_convert_to__markdown_spark.operators.asof import (
        interval_join,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    clicks = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id",
        (F.col("ts") - F.expr("INTERVAL 15 MINUTES")).alias("start"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("end"))
    errors = ev.filter("event_type = 'error'") \
        .select("user_id", F.col("ts"), F.col("event_id").alias("err_id"))

    naive = errors.join(clicks, "user_id").filter(
        "ts >= start and ts <= end").select("click_id", "err_id")
    for bins in (60, 900, 7200):
        got = interval_join(errors, clicks, point_col="ts",
                            by="user_id", bin_seconds=bins) \
            .select("click_id", "err_id")
        assert got.exceptAll(naive).count() == 0
        assert naive.exceptAll(got).count() == 0
