"""Round-4 hardening: robots join-strategy knob, ngram-novelty shuffle
fallback, semdedup trained-centroid routing, 64-bit LSH band hashes,
half-away-from-zero rounding in numpy kernels, and the cross-batch
recency guard in the streaming MERGE sink (VERDICT r3 items 2-5 +
ADVICE r3)."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from document_convert_to__markdown_spark.operators.robots import apply_robots


def _rules(spark):
    return spark.createDataFrame(
        [("a.com", "/", False),
         ("a.com", "/public", True),
         ("b.com", "/x", False)],
        "host string, prefix string, allow boolean")


def _urls(spark):
    return spark.createDataFrame(
        [(f"https://{h}/p{i}",) for h in ("a.com", "b.com", "c.com")
         for i in range(10)] + [("https://a.com/public/doc",)],
        "url string")


# -------------------------------------------- robots join-strategy knob

def test_robots_shuffle_fallback_matches_broadcast(spark):
    urls, rules = _urls(spark), _rules(spark)
    bc = {r["url"]: (r["allowed"], r["matched_prefix"]) for r in
          apply_robots(urls, rules, broadcast_rules=True).collect()}
    sh = {r["url"]: (r["allowed"], r["matched_prefix"]) for r in
          apply_robots(urls, rules, broadcast_rules=False).collect()}
    assert bc == sh and len(bc) == 31


def test_robots_forced_shuffle_plan_has_no_broadcast(spark):
    # the production 10^8-host shape: rules must NOT broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (apply_robots(_urls(spark), _rules(spark),
                             broadcast_rules=False)
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_robots_auto_knob_probes_size(spark):
    # small rules relation + default knob -> broadcast plan (the
    # existing test_robots_rules_side_broadcasts pins the same shape
    # for the explicit default; this pins the auto probe)
    plan = (apply_robots(_urls(spark), _rules(spark), broadcast_rules=None,
                         max_broadcast_rows=1000)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # rules bigger than the cap -> shuffle path
    plan2 = (apply_robots(_urls(spark), _rules(spark), broadcast_rules=None,
                          max_broadcast_rows=1)
             ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" not in plan2


# ------------------------------------------- robots.txt parsing

ROBOTS_BODY = """Disallow: /orphan
# policy file
User-agent: evilbot
Disallow: /

User-agent: *
User-Agent: archiver
Disallow: /private   # trailing comment
Allow: /private/pub
Disallow:
Crawl-delay: 10
Sitemap: https://a.com/map.xml
"""


def test_parse_robots_txt_grammar(spark):
    from document_convert_to__markdown_spark.operators.robots import (
        parse_robots_txt,
    )
    robots = spark.createDataFrame([("a.com", ROBOTS_BODY)],
                                   "host string, robots_txt string")
    got = {(r["prefix"], r["allow"])
           for r in parse_robots_txt(robots).collect()}
    # only the '*' group's non-empty rules survive: the orphan rule
    # (before any User-agent) is ignored, the evilbot group doesn't
    # match, the empty Disallow emits nothing, Crawl-delay/Sitemap are
    # ignored, and consecutive User-agent lines share one group
    assert got == {("/private", False), ("/private/pub", True)}
    # the same body parsed for the named agent picks the other group
    evil = {(r["prefix"], r["allow"])
            for r in parse_robots_txt(robots, agent="evilbot").collect()}
    assert evil == {("/", False)}


def test_parse_robots_txt_crlf_bodies(spark):
    """Review finding: CRLF robots.txt left '\\r' glued to agent
    tokens and prefixes (trim strips spaces only), so no group ever
    matched and everything default-allowed."""
    from document_convert_to__markdown_spark.operators.robots import (
        parse_robots_txt,
        sitemap_directives,
    )
    body = ROBOTS_BODY.replace("\n", "\r\n")
    robots = spark.createDataFrame([("a.com", body)],
                                   "host string, robots_txt string")
    got = {(r["prefix"], r["allow"])
           for r in parse_robots_txt(robots).collect()}
    assert got == {("/private", False), ("/private/pub", True)}
    maps = [r["sitemap_url"] for r in sitemap_directives(robots).collect()]
    assert maps == ["https://a.com/map.xml"]


def test_parse_robots_then_apply(spark):
    from document_convert_to__markdown_spark.operators.robots import (
        apply_robots, parse_robots_txt,
    )
    robots = spark.createDataFrame([("a.com", ROBOTS_BODY)],
                                   "host string, robots_txt string")
    urls = spark.createDataFrame(
        [("https://a.com/private/x",),
         ("https://a.com/private/pub/y",),
         ("https://a.com/open",),
         ("https://a.com/orphan/z",)], "url string")
    rules = parse_robots_txt(robots)
    got = {r["url"]: r["allowed"]
           for r in apply_robots(urls, rules).collect()}
    assert got == {"https://a.com/private/x": False,
                   "https://a.com/private/pub/y": True,
                   "https://a.com/open": True,
                   # the pre-group orphan rule was ignored by the parse
                   "https://a.com/orphan/z": True}


# ------------------------------------- ngram-novelty shuffle fallback

def test_ngram_novelty_fallback_matches_broadcast(spark):
    from document_convert_to__markdown_spark.operators.text import (
        ngram_novelty,
    )
    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the cat sat on the moon"),
         (3, "entirely unseen words here"),
         (4, "single")],
        "doc_id long, text string")
    bc = {r["doc_id"]: (r["n_bigrams"], r["n_novel"], r["novelty"])
          for r in ngram_novelty(docs, ref, broadcast_ref=True).collect()}
    sh = {r["doc_id"]: (r["n_bigrams"], r["n_novel"], r["novelty"])
          for r in ngram_novelty(docs, ref, broadcast_ref=False).collect()}
    assert bc == sh and len(bc) == 4
    assert bc[2] == (5, 1, 0.2)


def test_ngram_novelty_fallback_exchange_carries_hashes(spark):
    from document_convert_to__markdown_spark.operators.text import (
        ngram_novelty,
    )
    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (ngram_novelty(docs, docs, broadcast_ref=False)
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the membership join shuffles on md5(bigram), never the raw string
    assert "bgh" in plan and "md5" in plan
    assert "BroadcastHashJoin" not in plan


# ------------------------------------ semdedup trained-centroid routing

def test_semdedup_trained_centroids_route_and_prune(spark):
    from document_convert_to__markdown_spark.operators.similarity import (
        semdedup, train_ivf_centroids,
    )
    dim = 64
    rng = np.random.RandomState(3)
    base_a = rng.standard_normal(dim)
    base_b = rng.standard_normal(dim)
    rows = []
    # two well-separated direction families, 20 vectors each; within a
    # family every vector is a tiny perturbation (cosine ~ 1)
    for i in range(20):
        rows.append((int(i), (base_a + 0.001 * rng.standard_normal(dim))
                     .tolist()))
        rows.append((100 + int(i), (base_b + 0.001 * rng.standard_normal(dim))
                     .tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(emb, n_centroids=2)
    out = {r["vec_id"]: r for r in
           semdedup(emb, threshold=0.99, centroids=cents).collect()}
    assert len(out) == 40
    # routed to the 2 trained cells, one family per cell
    cells_a = {out[i]["cell"] for i in range(20)}
    cells_b = {out[100 + i]["cell"] for i in range(20)}
    assert len(cells_a) == 1 and len(cells_b) == 1 and cells_a != cells_b
    # keep-first inside each cell: exactly the min id survives per family
    kept = sorted(v["vec_id"] for v in out.values() if v["keep"])
    assert kept == [0, 100]


def test_semdedup_trained_centroids_break_up_mega_cells(spark):
    """VERDICT r3 item 4 done-criterion: on a corpus the fixed 64-cell
    quantizer lumps into few wide cells, trained k-means routing (the
    paper's k ~ n/1000) spreads rows into balanced cells."""
    from document_convert_to__markdown_spark.operators.similarity import (
        semdedup, train_ivf_centroids,
    )
    dim = 64
    rng = np.random.RandomState(17)
    fams = rng.standard_normal((8, dim))
    rows = []
    for f in range(8):
        for i in range(25):
            rows.append((int(f * 100 + i),
                         (fams[f] + 0.001 * rng.standard_normal(dim))
                         .tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def widths(df):
        out = df.groupBy("cell").count().collect()
        return sorted(r["count"] for r in out)

    default_w = widths(semdedup(emb, threshold=2.0))  # no prune, audit only
    cents = train_ivf_centroids(emb, n_centroids=8)
    trained_w = widths(semdedup(emb, threshold=2.0, centroids=cents))
    # trained: exactly 8 perfectly balanced cells, one per family
    assert trained_w == [25] * 8
    # and the fixed quantizer's widest cell is at least as wide (it can
    # only merge families, never split one — seeded, so deterministic)
    assert max(default_w) >= max(trained_w)
    assert len(default_w) <= 8


# --------------------------------------------- 64-bit LSH band hashes

def test_minhash_bands_use_xxhash64(spark):
    from document_convert_to__markdown_spark.operators.dedup import (
        minhash_bands,
    )
    docs = spark.createDataFrame(
        [(1, "some text here for hashing")], "doc_id long, text string")
    bands = minhash_bands(docs)
    plan = bands._jdf.queryExecution().analyzed().toString()
    assert "xxhash64" in plan
    # 8 bands per doc, 64-bit values (beyond-32-bit magnitudes are
    # overwhelmingly likely for any real signature)
    vals = [r["band_hash"] for r in bands.collect()]
    assert len(vals) == 8
    assert any(abs(v) > (1 << 32) for v in vals)


# -------------------------------------- half-away-from-zero rounding

def test_round_half_up_ties_away_from_zero():
    from document_convert_to__markdown_spark.operators.quantize import (
        _round_half_up,
    )
    got = _round_half_up(np.array([1.5, 2.5, -1.5, -2.5, 0.4, -0.4]))
    # np.round would give 2, 2, -2, -2 (ties-to-even)
    assert got.tolist() == [2.0, 3.0, -2.0, -3.0, 0.0, -0.0]


def test_round_half_away_4dp_and_nan():
    from document_convert_to__markdown_spark.operators.quantize import (
        round_half_away,
    )
    v = np.array([12345.0, 12346.0]) / 2.0 / 1e4  # exact .5 ties at 4dp
    got = round_half_away(v)
    assert got.tolist() == [0.6173, 0.6173]
    assert np.isnan(round_half_away(np.array([np.nan])))[0]
    # sanity on a non-tie
    assert round_half_away(np.array([0.61728]))[0] == pytest.approx(0.6173)


# ------------------------------- streaming MERGE cross-batch recency

SCHEMA = "doc_id long, ts timestamp, text string"


def _write_arrival(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def test_stream_merge_out_of_order_file_never_regresses(spark, tmp_path):
    from document_convert_to__markdown_spark.sources import snapshot as snap
    from document_convert_to__markdown_spark.streaming.stream_job import (
        run_stream_merge,
    )
    arrivals = str(tmp_path / "arrivals")
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)

    # the NEWER crawl lands first
    _write_arrival(spark, arrivals, [(1, t2, "new"), (2, t2, "b-new")])
    run_stream_merge(spark, arrivals, root, ckpt, key="doc_id",
                     schema=SCHEMA, order_col="ts")
    # then an OLDER file arrives (out-of-order drop / backfill replay):
    # stale content for key 1, plus a genuinely new key 3
    _write_arrival(spark, arrivals, [(1, t1, "stale"), (3, t1, "c")])
    run_stream_merge(spark, arrivals, root, ckpt, key="doc_id",
                     schema=SCHEMA, order_col="ts")
    got = {r["doc_id"]: (r["text"], r["ts"]) for r in
           snap.read(spark, root).collect()}
    # key 1 must NOT regress; key 3 (unmatched) must still insert
    assert got[1] == ("new", t2)
    assert got[2] == ("b-new", t2)
    assert got[3] == ("c", t1)


# ------------------------------------ stats-based data skipping

def test_read_pruned_skips_files_and_matches_full_scan(spark, tmp_path):
    from document_convert_to__markdown_spark.sources import snapshot as snap

    root = str(tmp_path / "table")
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"))
    snap.commit_with_stats(docs.repartitionByRange(10, "doc_id"), root,
                           stats_cols=["doc_id"])
    df, n_scanned, n_total = snap.read_pruned(spark, root, "doc_id",
                                              100, 149)
    assert n_total == 10 and 0 < n_scanned < n_total
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == list(range(100, 150))
    # disjoint range: zero files touched, zero rows, schema preserved
    df0, n0, _ = snap.read_pruned(spark, root, "doc_id", 5000, 6000)
    assert n0 == 0 and df0.count() == 0
    assert df0.columns == ["doc_id", "text"]


def test_read_pruned_timestamp_column(spark, tmp_path):
    """Review finding: timestamp stats json-serialize via str(), and
    type(lo)(rng[0]) crashed reconstructing a datetime from that
    string — pruning on a timestamp column must skip files and match
    the full scan instead."""
    import datetime as dt

    from document_convert_to__markdown_spark.sources import snapshot as snap

    root = str(tmp_path / "ts_table")
    base = dt.datetime(2024, 1, 1)
    docs = spark.range(0, 960).select(
        F.col("id").alias("doc_id"),
        (F.lit(base) + F.make_interval(hours=F.col("id"))).alias("ts"))
    snap.commit_with_stats(docs.repartitionByRange(8, "ts"), root,
                           stats_cols=["ts"])
    lo, hi = base + dt.timedelta(hours=100), base + dt.timedelta(hours=149)
    df, n_scanned, n_total = snap.read_pruned(spark, root, "ts", lo, hi)
    assert n_total == 8 and 0 < n_scanned < n_total
    assert df.count() == 50
    assert sorted(r["doc_id"] for r in df.collect()) == \
        list(range(100, 150))


def test_read_pruned_without_stats_is_correct_conservative(spark, tmp_path):
    from document_convert_to__markdown_spark.sources import snapshot as snap

    root = str(tmp_path / "table")
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text"))
    snap.commit_overwrite(docs.repartition(4), root)  # no stats sidecar
    df, n_scanned, n_total = snap.read_pruned(spark, root, "doc_id", 10, 19)
    assert n_scanned == n_total == 4  # conservative: nothing skipped
    assert df.count() == 10


def test_zorder_clustered_commit_prunes_on_both_dimensions(spark, tmp_path):
    from document_convert_to__markdown_spark.functions.layout import (
        zorder_key2,
    )
    from document_convert_to__markdown_spark.sources import snapshot as snap

    root = str(tmp_path / "table")
    grid = spark.range(0, 32 * 32).select(
        (F.col("id") % 32).alias("x"),
        (F.col("id") / 32).cast("long").alias("y"))
    zsorted = (grid.withColumn("zkey", zorder_key2(F.col("x"), F.col("y"),
                                                   bits=8))
               .repartitionByRange(16, "zkey").drop("zkey"))
    snap.commit_with_stats(zsorted, root, stats_cols=["x", "y"])
    # a narrow slab on EITHER dimension skips files — the property
    # single-column sorting cannot give the second column
    _, nx, total = snap.read_pruned(spark, root, "x", 0, 3)
    _, ny, _ = snap.read_pruned(spark, root, "y", 0, 3)
    assert total == 16
    assert nx < total and ny < total


# ----------------------------------------- CDC snapshot changelog

def test_snapshot_changelog_cdc_semantics(spark, tmp_path):
    from document_convert_to__markdown_spark.operators.delta import (
        snapshot_changelog,
    )
    from document_convert_to__markdown_spark.sources import snapshot as snap

    root = str(tmp_path / "table")
    sch = "doc_id long, text string"
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], sch)
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], sch)  # 2 changed, 3 gone, 4 new
    snap.commit_overwrite(v1, root)
    snap.commit_overwrite(v2, root)

    got = {r["doc_id"]: r for r in
           snapshot_changelog(spark, root, 1, 2, key="doc_id").collect()}
    # unchanged rows are not emitted
    assert set(got) == {2, 3, 4}
    assert got[4]["_change_type"] == "insert" and got[4]["text"] == "d"
    assert (got[2]["_change_type"] == "update_postimage"
            and got[2]["text"] == "B2")
    # delete is a key-only tombstone: payload columns null
    assert got[3]["_change_type"] == "delete" and got[3]["text"] is None


def test_snapshot_changelog_sees_non_text_column_changes(spark,
                                                         tmp_path):
    """Review finding: the old text-only compare made a lang-only
    correction invisible to changelog subscribers; the default is now
    full-row CDC."""
    from document_convert_to__markdown_spark.operators.delta import (
        snapshot_changelog,
    )
    from document_convert_to__markdown_spark.sources import snapshot as snap

    root = str(tmp_path / "table")
    sch = "doc_id long, text string, lang string"
    snap.commit_overwrite(spark.createDataFrame(
        [(1, "same text", "en"), (2, "other", "en")], sch), root)
    snap.commit_overwrite(spark.createDataFrame(
        [(1, "same text", "de"), (2, "other", "en")], sch), root)
    got = {r["doc_id"]: r for r in
           snapshot_changelog(spark, root, 1, 2, key="doc_id").collect()}
    assert set(got) == {1}
    assert got[1]["_change_type"] == "update_postimage"
    assert got[1]["lang"] == "de"
    # the narrow compare is still available explicitly
    narrow = snapshot_changelog(spark, root, 1, 2, key="doc_id",
                                content="text")
    assert narrow.count() == 0


def test_snapshot_changelog_across_schema_evolution(spark, tmp_path):
    """Round-5 advice: the default full-row compare raised
    AnalysisException when from_version predates an additive schema
    evolution.  An added column reads as null on old rows, so a
    non-null new value is an update and an all-null one is unchanged."""
    from document_convert_to__markdown_spark.operators.delta import (
        snapshot_changelog,
    )
    from document_convert_to__markdown_spark.sources import snapshot as snap

    root = str(tmp_path / "table")
    snap.commit_append(spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"), root)
    snap.commit_append(spark.createDataFrame(
        [(3, "c", 0.9)], "doc_id long, text string, quality double"),
        root, allow_evolution=True)

    got = {r["doc_id"]: r for r in
           snapshot_changelog(spark, root, 1, 2, key="doc_id").collect()}
    # 1 and 2 carry null quality in v2 — unchanged; 3 is the insert.
    assert set(got) == {3}
    assert got[3]["_change_type"] == "insert"
    assert got[3]["quality"] == 0.9

    # A backfilled value in the evolved column IS a change.
    snap.delete_keys(
        spark, root,
        spark.createDataFrame([(2,)], "doc_id long"), key="doc_id")
    snap.commit_append(spark.createDataFrame(
        [(2, "b", 0.5)], "doc_id long, text string, quality double"),
        root, allow_evolution=True)
    got2 = {r["doc_id"]: r["_change_type"] for r in
            snapshot_changelog(spark, root, 2, 4, key="doc_id").collect()}
    assert got2 == {2: "update_postimage"}


def test_commit_with_stats_append_is_incremental(spark, tmp_path):
    """Review finding: append used to rescan every file in the table
    for stats; it must aggregate only the new files and carry the
    parent sidecar forward — while read_pruned keeps pruning across
    both commits."""
    from document_convert_to__markdown_spark.sources import snapshot as snap

    root = str(tmp_path / "table")
    a = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    b = spark.range(500, 1000).select(F.col("id").alias("doc_id"))
    snap.commit_with_stats(a.repartitionByRange(5, "doc_id"), root,
                           stats_cols=["doc_id"], op="overwrite")
    snap.commit_with_stats(b.repartitionByRange(5, "doc_id"), root,
                           stats_cols=["doc_id"], op="append")
    df, n_scanned, n_total = snap.read_pruned(spark, root, "doc_id",
                                              0, 99)
    assert n_total == 10 and 0 < n_scanned < 5   # v1 files prune too
    assert sorted(r["doc_id"] for r in df.collect()) == list(range(100))
    df2, n2, _ = snap.read_pruned(spark, root, "doc_id", 900, 999)
    assert 0 < n2 < 5                            # v2 files prune too


def test_snapshot_changelog_identity_is_empty(spark, tmp_path):
    from document_convert_to__markdown_spark.operators.delta import (
        snapshot_changelog,
    )
    from document_convert_to__markdown_spark.sources import snapshot as snap

    root = str(tmp_path / "table")
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    snap.commit_overwrite(df, root)
    snap.commit_overwrite(df, root)
    assert snapshot_changelog(spark, root, 1, 2, key="doc_id").count() == 0


# ------------------------- large-star/small-star connected components

def _cc_star(spark, edge_rows, **kw):
    from document_convert_to__markdown_spark.operators.graph import (
        connected_components_star,
    )
    edges = spark.createDataFrame(edge_rows, "a long, b long")
    return {r["node"]: r["component"]
            for r in connected_components_star(edges, **kw).collect()}


def test_cc_star_long_chain_and_bridge(spark):
    # a 9-node chain (diameter 8) plus a separate triangle
    rows = [(i, i + 1) for i in range(8)] + [(20, 21), (21, 22), (20, 22)]
    got = _cc_star(spark, rows)
    assert all(got[i] == 0 for i in range(9))
    assert all(got[i] == 20 for i in (20, 21, 22))
    assert len(got) == 12


def test_cc_star_agrees_with_propagation(spark):
    from document_convert_to__markdown_spark.operators.graph import (
        connected_components,
    )
    import random
    rng = random.Random(5)
    rows = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    rows = [(a, b) for a, b in rows if a != b]
    edges = spark.createDataFrame(rows, "a long, b long")
    star = {r["node"]: r["component"]
            for r in __import__(
                "document_convert_to__markdown_spark.operators.graph",
                fromlist=["connected_components_star"])
            .connected_components_star(edges).collect()}
    prop = {r["node"]: r["component"]
            for r in connected_components(edges).collect()}
    assert star == prop


def test_cc_star_self_loops_and_duplicates(spark):
    got = _cc_star(spark, [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)])
    # self-loop-only nodes vanish (isolated-node contract)
    assert got == {1: 1, 2: 1}


def test_cc_star_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_star(spark, [(i, i + 1) for i in range(40)], max_iter=1)


# ---------------------------------- streaming dedup-ingest loop

def test_stream_dedup_ingest_full_loop(spark, tmp_path):
    from document_convert_to__markdown_spark.sources import snapshot as snap
    from document_convert_to__markdown_spark.streaming.stream_job import (
        run_stream_dedup_ingest,
    )
    arrivals = str(tmp_path / "arrivals")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    sch = "doc_id long, text string"

    t_a = "the quick brown fox jumps over the lazy dog tonight"
    t_b = "an entirely different document about spark physical plans"
    t_c = "novel third arrival content sharing nothing with the others"

    def drain(rows):
        spark.createDataFrame(rows, sch).coalesce(1) \
            .write.mode("append").parquet(arrivals)
        run_stream_dedup_ingest(spark, arrivals, corpus, index, ckpt,
                                schema=sch)

    # batch 1: two uniques + one exact in-batch copy of doc 1
    drain([(1, t_a), (2, t_b), (3, t_a)])
    got = {r["doc_id"]: r for r in snap.read(spark, corpus).collect()}
    assert len(got) == 3  # no silent drops
    assert not got[1]["is_dup"] and not got[2]["is_dup"]
    assert got[3]["is_dup"] and got[3]["dup_of"] == 1
    # index carries bands for the 2 survivors only
    assert snap.read(spark, index).count() == 2 * 8

    # batch 2: a cross-batch copy of doc 2 + a genuinely novel doc
    drain([(10, t_b), (11, t_c)])
    got = {r["doc_id"]: r for r in snap.read(spark, corpus).collect()}
    assert len(got) == 5
    assert got[10]["is_dup"] and got[10]["dup_of"] == 2
    assert got[10]["n_corpus_hits"] >= 1
    assert not got[11]["is_dup"]
    assert snap.read(spark, index).count() == 3 * 8

    # exactly-once: a re-drain with no new files commits nothing
    vc, vi = snap.current_version(corpus), snap.current_version(index)
    run_stream_dedup_ingest(spark, arrivals, corpus, index, ckpt,
                            schema=sch)
    assert snap.current_version(corpus) == vc
    assert snap.current_version(index) == vi


def test_stream_dedup_ingest_null_text_is_not_dropped(spark, tmp_path):
    """Review finding: md5(NULL) is NULL and an equi-join never
    matches NULL keys, so null-text arrivals used to vanish.  They
    must land in the corpus (null folds into the empty-text dedup
    group, keep-first flags the rest)."""
    from document_convert_to__markdown_spark.sources import snapshot as snap
    from document_convert_to__markdown_spark.streaming.stream_job import (
        run_stream_dedup_ingest,
    )
    arrivals = str(tmp_path / "arrivals")
    corpus = str(tmp_path / "corpus")
    sch = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "real document text"), (2, None), (3, ""), (4, None)],
        sch).coalesce(1).write.mode("append").parquet(arrivals)
    run_stream_dedup_ingest(spark, arrivals, corpus,
                            str(tmp_path / "index"),
                            str(tmp_path / "ckpt"), schema=sch)
    got = {r["doc_id"]: r for r in snap.read(spark, corpus).collect()}
    assert set(got) == {1, 2, 3, 4}          # no silent drops
    assert not got[1]["is_dup"]
    assert not got[2]["is_dup"]              # first empty-content doc
    assert got[3]["is_dup"] and got[3]["dup_of"] == 2
    assert got[4]["is_dup"] and got[4]["dup_of"] == 2


# ------------------------------------ approx_top_k heavy hitters

def test_topk_terms_sketch_exact_below_capacity(spark):
    from document_convert_to__markdown_spark.operators.heavy_hitters import (
        topk_terms_sketch,
    )
    docs = spark.createDataFrame(
        [(1, "en", "a a a b b c"),
         (2, "en", "a b d d d d"),
         (3, "fr", "x y y z z z")],
        "doc_id long, lang string, text string")
    got = {(r["lang"], r["rank"]): (r["term"], r["term_count"])
           for r in topk_terms_sketch(docs, k=3).collect()}
    # en counts: a=4, d=4, b=3 -> tiebreak a before d
    assert got[("en", 1)] == ("a", 4)
    assert got[("en", 2)] == ("d", 4)
    assert got[("en", 3)] == ("b", 3)
    # fr counts: z=3, y=2, x=1
    assert got[("fr", 1)] == ("z", 3)
    assert got[("fr", 2)] == ("y", 2)
    assert got[("fr", 3)] == ("x", 1)


def test_topk_terms_sketch_survives_eviction(spark):
    """Past capacity the counts are estimates, but the dominant heavy
    hitter must still surface (the Space-Saving guarantee)."""
    from document_convert_to__markdown_spark.operators.heavy_hitters import (
        topk_terms_sketch,
    )
    rows = [(i, "en", "heavy " * 50 + f"rare{i} rare{i + 1000}")
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    top1 = (topk_terms_sketch(docs, k=1, max_items=16)
            .filter("rank = 1").collect())
    assert len(top1) == 1 and top1[0]["term"] == "heavy"


# ------------------------------------- copy-on-write snapshot delete

def test_delete_keys_rewrites_only_affected_files(spark, tmp_path):
    from document_convert_to__markdown_spark.sources import snapshot as snap

    root = str(tmp_path / "table")
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"))
    # range-partitioned base commit: doc_ids 0..99 in one file region,
    # so a takedown of low ids touches a strict subset of files
    snap.commit_overwrite(docs.repartitionByRange(10, "doc_id"), root)
    base = snap.load_snapshot(root, 1)
    assert len(base.files) == 10

    takedown = spark.createDataFrame([(i,) for i in range(5)],
                                     "doc_id long")
    s, n_deleted, n_rewritten = snap.delete_keys(spark, root, takedown,
                                                 key="doc_id")
    assert n_deleted == 5
    # partial rewrite: most of the base files survive untouched,
    # by identity (same paths), in the new manifest
    assert 0 < n_rewritten < len(base.files)
    untouched = set(base.files) & set(s.files)
    assert len(untouched) == len(base.files) - n_rewritten
    # current version serves the post-delete table...
    cur = snap.read(spark, root)
    assert cur.count() == 995
    assert cur.filter(F.col("doc_id") < 5).count() == 0
    # ...while the parent version still time-travels to the full set
    assert snap.read(spark, root, version=1).count() == 1000


def test_delete_keys_no_match_is_a_no_op(spark, tmp_path):
    from document_convert_to__markdown_spark.sources import snapshot as snap

    root = str(tmp_path / "table")
    docs = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text"))
    snap.commit_overwrite(docs, root)
    v_before = snap.current_version(root)
    ghost = spark.createDataFrame([(999999,)], "doc_id long")
    s, n_deleted, n_rewritten = snap.delete_keys(spark, root, ghost,
                                                 key="doc_id")
    assert (n_deleted, n_rewritten) == (0, 0)
    assert snap.current_version(root) == v_before
    assert s.version == v_before


def test_stream_merge_equal_ts_keeps_committed_row(spark, tmp_path):
    from document_convert_to__markdown_spark.sources import snapshot as snap
    from document_convert_to__markdown_spark.streaming.stream_job import (
        run_stream_merge,
    )
    arrivals = str(tmp_path / "arrivals")
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    t1 = dt.datetime(2024, 1, 1)
    _write_arrival(spark, arrivals, [(1, t1, "first")])
    run_stream_merge(spark, arrivals, root, ckpt, key="doc_id",
                     schema=SCHEMA, order_col="ts")
    # same-ts re-send (e.g. duplicated upstream file): strictly-newer
    # rule keeps the committed row -> deterministic regardless of
    # file processing order
    _write_arrival(spark, arrivals, [(1, t1, "second")])
    run_stream_merge(spark, arrivals, root, ckpt, key="doc_id",
                     schema=SCHEMA, order_col="ts")
    rows = snap.read(spark, root).collect()
    assert len(rows) == 1 and rows[0]["text"] == "first"
