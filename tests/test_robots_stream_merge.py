"""Robots-policy URL filter + streaming foreachBatch merge sink."""

import os

import pytest
from pyspark.sql import functions as F

from document_convert_to__markdown_spark.operators.robots import apply_robots
from document_convert_to__markdown_spark.sources import snapshot as snap
from document_convert_to__markdown_spark.streaming.stream_job import (
    run_stream_merge,
)


def _rules(spark):
    return spark.createDataFrame(
        [
            ("a.com", "/", False),          # disallow all ...
            ("a.com", "/public", True),     # ... except /public
            ("a.com", "/public/tmp", False),  # ... except its /tmp
            ("b.com", "/x", False),
            ("b.com", "/x", True),          # tie: allow wins (RFC 9309)
        ],
        "host string, prefix string, allow boolean")


def test_robots_longest_prefix_wins(spark):
    urls = spark.createDataFrame(
        [("https://a.com/private/1",),
         ("https://a.com/public/doc",),
         ("https://a.com/public/tmp/x",)], "url string")
    got = {r["url"]: (r["allowed"], r["matched_prefix"])
           for r in apply_robots(urls, _rules(spark)).collect()}
    assert got["https://a.com/private/1"] == (False, "/")
    assert got["https://a.com/public/doc"] == (True, "/public")
    assert got["https://a.com/public/tmp/x"] == (False, "/public/tmp")


def test_robots_tie_least_restrictive_and_default_allow(spark):
    urls = spark.createDataFrame(
        [("https://b.com/x/1",),          # tie at length 2 -> allow
         ("https://nobody.com/anything",)  # no rules -> default allow
         ], "url string")
    got = {r["url"]: (r["allowed"], r["matched_allow"])
           for r in apply_robots(urls, _rules(spark)).collect()}
    assert got["https://b.com/x/1"] == (True, True)
    assert got["https://nobody.com/anything"] == (True, None)


def test_robots_every_row_accounted(spark):
    urls = spark.createDataFrame(
        [(f"https://a.com/p{i}",) for i in range(20)], "url string")
    out = apply_robots(urls, _rules(spark))
    assert out.count() == 20
    assert out.filter("allowed").count() == 0  # '/' disallow catches all


def test_robots_wildcard_star_and_dollar(spark):
    """RFC 9309 §2.2.3: '*' spans any run, a trailing '$' anchors —
    previously both were treated as literal prefix bytes and wildcard
    Disallows matched nothing (round-5 advice, medium)."""
    rules = spark.createDataFrame(
        [("w.com", "/a/*/c", False),     # '*' spans a segment
         ("w.com", "/img*.png$", False),  # both wildcards
         ("w.com", "/d$", False),        # anchored exact path
         ("w.com", "/lit$x", False)],    # inner '$' is a literal octet
        "host string, prefix string, allow boolean")
    urls = spark.createDataFrame(
        [(f"https://w.com{p}",)
         for p in ["/a/b/c", "/a/xyz/c/d", "/a/c",
                   "/img123.png", "/img.png.txt",
                   "/d", "/dd", "/lit$xq"]], "url string")
    got = {r["url"].removeprefix("https://w.com"): r["allowed"]
           for r in apply_robots(urls, rules).collect()}
    assert got["/a/b/c"] is False
    assert got["/a/xyz/c/d"] is False     # prefix match past the rule
    assert got["/a/c"] is True            # '^/a/.*/c' needs '/a/'+'/c'
    assert got["/img123.png"] is False
    assert got["/img.png.txt"] is True    # '$' anchored: no match
    assert got["/d"] is False
    assert got["/dd"] is True             # anchored rule can't prefix-match
    assert got["/lit$xq"] is False        # inner '$' literal, prefix match


def test_robots_wildcard_star_matches_empty(spark):
    # '*' matches the empty run too ('.*' semantics).
    rules = spark.createDataFrame([("w.com", "/p*q", False)],
                                  "host string, prefix string, allow boolean")
    urls = spark.createDataFrame(
        [("https://w.com/pq",), ("https://w.com/pXYq",)], "url string")
    got = {r["url"]: r["allowed"]
           for r in apply_robots(urls, rules).collect()}
    assert got["https://w.com/pq"] is False
    assert got["https://w.com/pXYq"] is False


def test_parse_robots_star_group_fallback(spark):
    """RFC 9309 §2.2.1: a named agent with no exactly-matching group
    falls back to the '*' group; an exact group shuts the '*' group
    out entirely (round-5 advice, medium)."""
    from document_convert_to__markdown_spark.operators.robots import (
        parse_robots_txt,
    )

    body_star_only = ("User-agent: *\nDisallow: /all\n")
    body_both = ("User-agent: *\nDisallow: /all\n\n"
                 "User-agent: archiver\nDisallow: /mine\n")
    robots = spark.createDataFrame(
        [("s.com", body_star_only), ("b.com", body_both)],
        "host string, robots_txt string")

    got = {(r["host"], r["prefix"], r["allow"])
           for r in parse_robots_txt(robots, agent="archiver").collect()}
    # s.com: no 'archiver' group -> '*' fallback applies.
    # b.com: exact 'archiver' group wins; its '*' rules must NOT leak in.
    assert got == {("s.com", "/all", False), ("b.com", "/mine", False)}

    # A generic '*' crawler still matches '*' groups on both hosts.
    got_star = {(r["host"], r["prefix"])
                for r in parse_robots_txt(robots, agent="*").collect()}
    assert got_star == {("s.com", "/all"), ("b.com", "/all")}


def test_robots_rules_side_broadcasts(spark):
    urls = spark.createDataFrame([("https://a.com/p",)], "url string")
    plan = (apply_robots(urls, _rules(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------ streaming merge sink

SCHEMA = "doc_id long, ts timestamp, text string"


def _write_arrival(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def test_stream_merge_upserts_and_resumes(spark, tmp_path):
    import datetime as dt

    arrivals = str(tmp_path / "arrivals")
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)

    _write_arrival(spark, arrivals, [(1, t1, "a"), (2, t1, "b")])
    run_stream_merge(spark, arrivals, root, ckpt, key="doc_id",
                     schema=SCHEMA, order_col="ts")
    got = {r["doc_id"]: r["text"] for r in snap.read(spark, root).collect()}
    assert got == {1: "a", 2: "b"}
    v_after_first = snap.current_version(root)

    # second arrival: update doc 2, insert doc 3
    _write_arrival(spark, arrivals, [(2, t2, "B2"), (3, t2, "c")])
    run_stream_merge(spark, arrivals, root, ckpt, key="doc_id",
                     schema=SCHEMA, order_col="ts")
    got = {r["doc_id"]: r["text"] for r in snap.read(spark, root).collect()}
    assert got == {1: "a", 2: "B2", 3: "c"}

    # exactly-once at file granularity: a third drain with NO new files
    # must not commit a new snapshot version
    v_before = snap.current_version(root)
    run_stream_merge(spark, arrivals, root, ckpt, key="doc_id",
                     schema=SCHEMA, order_col="ts")
    assert snap.current_version(root) == v_before
    assert v_before > v_after_first


def test_stream_merge_in_batch_recrawl_latest_wins(spark, tmp_path):
    import datetime as dt

    arrivals = str(tmp_path / "arrivals")
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    # same url twice within one batch: the later fetch must win and
    # the key must not insert twice
    _write_arrival(spark, arrivals, [(1, t1, "old"), (1, t2, "new")])
    run_stream_merge(spark, arrivals, root, ckpt, key="doc_id",
                     schema=SCHEMA, order_col="ts")
    rows = snap.read(spark, root).collect()
    assert len(rows) == 1 and rows[0]["text"] == "new"


# ------------------------------------------------ frontier scheduling

def test_frontier_slots_priority_ordered_per_host(spark):
    from document_convert_to__markdown_spark.operators.robots import (
        frontier_schedule,
    )
    urls = spark.createDataFrame(
        [("u1", "a.com", 10.0), ("u2", "a.com", 30.0),
         ("u3", "a.com", 20.0), ("u4", "b.com", 1.0)],
        "url string, host string, priority double")
    got = {r["url"]: (r["slot"], r["fetch_offset_sec"])
           for r in frontier_schedule(urls, delay_sec=5).collect()}
    assert got["u2"] == (0, 0)    # highest priority fetches first
    assert got["u3"] == (1, 5)
    assert got["u1"] == (2, 10)
    assert got["u4"] == (0, 0)    # other host schedules independently


def test_frontier_ties_break_deterministically(spark):
    from document_convert_to__markdown_spark.operators.robots import (
        frontier_schedule,
    )
    urls = spark.createDataFrame(
        [(f"u{i}", "a.com", 1.0) for i in range(8)],
        "url string, host string, priority double")
    a = sorted((r["url"], r["slot"])
               for r in frontier_schedule(urls).collect())
    b = sorted((r["url"], r["slot"])
               for r in frontier_schedule(urls).collect())
    assert a == b
    # url tiebreak: lexicographic order
    assert dict(a)["u0"] == 0 and dict(a)["u7"] == 7
