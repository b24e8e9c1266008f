"""Round-3c operators: stream-stream watermarked join, snapshot MERGE
upsert, product quantization."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from document_convert_to__markdown_spark.operators.quantize import (
    pq_encode, pq_topk, train_pq_codebooks,
)
from document_convert_to__markdown_spark.operators.similarity import (
    brute_force_topk,
)
from document_convert_to__markdown_spark.sources import snapshot as snap
from document_convert_to__markdown_spark.streaming.stream_job import (
    stream_stream_attribution,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- stream-stream join

def test_stream_stream_join_equals_batch_interval_join(spark):
    got = {
        r["user_id"]: (r["n_pairs"], r["sum_click_id"], r["sum_buy_id"])
        for r in stream_stream_attribution(
            spark, f"{SF}/events.parquet").collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"))
    b = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("bu"), F.col("ts").alias("bts"),
        F.col("event_id").alias("bid"))
    want = {
        r["cu"]: (r["n"], r["sc"], r["sb"])
        for r in c.join(
            b, F.expr("cu = bu AND bts >= cts "
                      "AND bts <= cts + interval 2 hours"))
        .groupBy("cu")
        .agg(F.count("*").alias("n"), F.sum("cid").alias("sc"),
             F.sum("bid").alias("sb")).collect()
    }
    assert got == want and len(got) > 0


# ------------------------------------------------------- merge upsert

def test_merge_upsert_replaces_and_inserts(spark, tmp_path):
    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    snap.commit_overwrite(base, root)
    updates = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "doc_id long, text string")
    s = snap.merge_upsert(spark, root, updates, key="doc_id")
    got = {r["doc_id"]: r["text"]
           for r in snap.read(spark, root).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}
    assert s.version == 2 and s.parent == 1
    # parent still time-travel readable (A20 guarantee preserved)
    old = {r["doc_id"]: r["text"]
           for r in snap.read(spark, root, version=1).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_merge_upsert_schema_mismatch_raises(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snap.commit_overwrite(
        spark.createDataFrame([(1, "a")], "doc_id long, text string"), root)
    bad = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="schema mismatch"):
        snap.merge_upsert(spark, root, bad, key="doc_id")


def test_merge_upsert_idempotent_reapply(spark, tmp_path):
    """Re-running the same merge (crash-retry) converges to the same
    table state — the resume guarantee the extraction job relies on."""
    root = str(tmp_path / "tbl")
    snap.commit_overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "doc_id long, text string"), root)
    updates = spark.createDataFrame([(2, "B2")], "doc_id long, text string")
    snap.merge_upsert(spark, root, updates, key="doc_id")
    snap.merge_upsert(spark, root, updates, key="doc_id")
    got = sorted((r["doc_id"], r["text"])
                 for r in snap.read(spark, root).collect())
    assert got == [(1, "a"), (2, "B2")]


# --------------------------------------------------------------- PQ

def test_pq_codebooks_deterministic_and_shaped(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    b1 = train_pq_codebooks(emb, m=8, k=16)
    b2 = train_pq_codebooks(emb, m=8, k=16)
    assert b1.shape == (8, 16, 8)
    assert np.array_equal(b1, b2)


def test_pq_encode_codes_in_range(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = train_pq_codebooks(emb, m=8, k=16)
    rows = pq_encode(emb, books).collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_pq_topk_recall_vs_brute(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = train_pq_codebooks(emb, m=16, k=16)
    import math
    q = [math.sin(i * 0.7) for i in range(64)]
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    # raw ADC: coarse codes, mid recall
    adc = {r["vec_id"] for r in pq_topk(emb, q, books, k=10,
                                        rerank=0).collect()}
    # ADC + exact rerank over 4k candidates (the FAISS refine shape)
    refined = {r["vec_id"] for r in pq_topk(emb, q, books, k=10).collect()}
    assert len(exact & adc) >= 4
    assert len(exact & refined) >= 8
    assert len(exact & refined) >= len(exact & adc)


def test_pq_topk_scoring_stays_jvm_side(spark):
    """Exactly ONE Python stage (the encode); ADC scoring + top-k are
    Catalyst element_at arithmetic."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = train_pq_codebooks(emb, m=16, k=16)
    plan = (pq_topk(emb, [0.1] * 64, books, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("ArrowEvalPython") == 1
    assert "TakeOrderedAndProject" in plan




# ------------------------------------------------------------ z-order

def test_zorder_interleave_known_bits(spark):
    from document_convert_to__markdown_spark.functions.layout import (
        zorder_key2,
    )
    df = spark.createDataFrame([(3, 1), (0, 0), (255, 255)],
                               "x long, y long")
    got = [r["z"] for r in
           df.select(zorder_key2("x", "y", bits=8).alias("z"))
           .orderBy("x").collect()]
    # x=0,y=0 -> 0; x=3(0b11),y=1(0b01) -> 0b0111 = 7; 255,255 -> 65535
    assert got == [0, 7, 65535]


def test_zorder_clusters_both_dimensions(spark):
    """Sorted by zkey and cut into contiguous chunks, BOTH x and y
    ranges shrink per chunk — the data-skipping property; a plain sort
    on x leaves the y range at full width."""
    from document_convert_to__markdown_spark.functions.layout import (
        zorder_key2,
    )
    rows = [(i % 64, (i * 7) % 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long")
    keyed = df.withColumn("z", zorder_key2("x", "y", bits=6))
    chunks = (keyed.withColumn(
        "chunk", F.shiftright("z", 8))  # 16 contiguous z-ranges
        .groupBy("chunk")
        .agg((F.max("x") - F.min("x")).alias("xr"),
             (F.max("y") - F.min("y")).alias("yr"))
        .agg(F.avg("xr").alias("axr"), F.avg("yr").alias("ayr"))
        .first())
    # global range is 63; z-order chunks must bound both well below it
    assert chunks["axr"] < 32 and chunks["ayr"] < 32


# ------------------------------------------------- incremental dedup

def test_incremental_dedup_flags_corpus_copies(spark):
    from document_convert_to__markdown_spark.operators.dedup import (
        incremental_dedup, minhash_bands,
    )
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again"),
         (2, "an entirely different corpus document about spark plans")],
        "doc_id long, text string")
    arrivals = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog again"),  # copy
         (11, "novel arrival text with words shared by no corpus doc")],
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in incremental_dedup(arrivals,
                                      minhash_bands(corpus)).collect()}
    assert out[10]["is_dup_of_corpus"] is True
    assert out[10]["dup_of"] == 1 and out[10]["n_corpus_hits"] >= 1
    assert out[11]["is_dup_of_corpus"] is False
    assert out[11]["dup_of"] is None and out[11]["n_corpus_hits"] == 0
    assert len(out) == 2  # every arrival accounted


def test_incremental_dedup_corpus_text_never_read(spark):
    """The screen consumes only the band index: exactly ONE Arrow
    stage in the plan (the arrival-side minhash) — a regression that
    re-minhashes the corpus would add a second."""
    from document_convert_to__markdown_spark.operators.dedup import (
        incremental_dedup, minhash_bands,
    )
    corpus = spark.createDataFrame(
        [(1, "corpus text one"), (2, "corpus text two")],
        "doc_id long, text string")
    # materialized index shape: band columns only, no text
    bands = (spark.createDataFrame(
        minhash_bands(corpus).select("doc_id", "band", "band_hash")
        .collect(), "doc_id long, band int, band_hash long"))
    arrivals = spark.createDataFrame(
        [(10, "some arrival")], "doc_id long, text string")
    out = incremental_dedup(arrivals, bands)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert out.count() == 1  # every arrival accounted


# ------------------------------------------------- truncation recall

def test_truncation_recall_full_dim_is_perfect_and_monotonicish(spark):
    from document_convert_to__markdown_spark.operators.similarity import (
        truncation_recall,
    )
    import math
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [math.sin(i * 0.7) for i in range(64)]
    rows = {r["dim"]: r["recall_at_k"]
            for r in truncation_recall(emb, q, dims=[8, 32, 64],
                                       k=10).collect()}
    assert rows[64] == 10           # full width reproduces itself
    assert 0 <= rows[8] <= rows[64]
    assert rows[32] >= rows[8] - 2  # wider prefix, roughly no worse


# ---------------------------------------------------- keep-best dedup

def test_dedup_keep_best_prefers_quality_then_id(spark):
    from document_convert_to__markdown_spark.operators.dedup import (
        dedup_keep_best,
    )
    docs = spark.createDataFrame(
        [(1, "short", 5, "u1"), (2, "a longer copy", 13, "u1"),
         (3, "same", 4, "u2"), (4, "same", 4, "u2"),
         (5, "solo", 4, "u3")],
        "doc_id long, text string, q long, url_key string")
    kept = sorted(r["doc_id"] for r in dedup_keep_best(
        docs, quality_col="q", group_expr=F.col("url_key")).collect())
    # u1: higher q wins (2); u2: quality tie -> min doc_id (3); u3: solo
    assert kept == [2, 3, 5]


def test_dedup_keep_best_default_groups_by_content(spark):
    from document_convert_to__markdown_spark.operators.dedup import (
        dedup_keep_best,
    )
    docs = spark.createDataFrame(
        [(1, "dup", 1), (2, "dup", 9), (3, "other", 0)],
        "doc_id long, text string, q long")
    kept = sorted(r["doc_id"] for r in
                  dedup_keep_best(docs, quality_col="q").collect())
    assert kept == [2, 3]


# ------------------------------------------------------ bigram novelty

def test_ngram_novelty_reference_docs_score_zero(spark):
    from document_convert_to__markdown_spark.operators.text import (
        ngram_novelty,
    )
    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),      # in-reference -> 0
         (2, "the cat sat on the moon"),     # one novel bigram of 5
         (3, "entirely unseen words here"),  # all novel
         (4, "single")],                     # <2 tokens -> null
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(docs, ref).collect()}
    assert got[1]["novelty"] == 0.0
    # only 'the moon' is unseen: 1 of 5 bigrams
    assert got[2]["n_novel"] == 1 and got[2]["novelty"] == 0.2
    assert got[3]["novelty"] == 1.0
    assert got[4]["novelty"] is None and got[4]["n_bigrams"] == 0
    assert len(got) == 4  # every input row accounted


# --------------------------------------------------- cluster-safe split

def test_cluster_safe_split_no_leakage(spark):
    from document_convert_to__markdown_spark.operators.sampling import (
        cluster_safe_split,
    )
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(60)], "doc_id long, text string")
    # chain 0-1-2 into one cluster, pair 10-11 into another
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "a long, b long")
    out = cluster_safe_split(docs, edges)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 60  # every doc present
    # whole cluster shares one split AND one cluster id
    assert len({rows[i]["split"] for i in (0, 1, 2)}) == 1
    assert len({rows[i]["cluster"] for i in (0, 1, 2)}) == 1
    assert rows[10]["split"] == rows[11]["split"]
    # isolated docs get their own id as cluster
    assert rows[30]["cluster"] == 30
    # global invariant: no cluster spans two splits
    leak = (out.groupBy("cluster")
            .agg(F.countDistinct("split").alias("ns"))
            .filter("ns > 1").count())
    assert leak == 0
