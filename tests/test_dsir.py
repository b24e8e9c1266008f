"""DSIR importance-resampling selection (operators/dsir.py): weight
arithmetic replayed in pure Python, empty-doc row preservation,
target-affinity of the Gumbel-top-k cut, and the broadcast plan shape.
"""

import hashlib
import math

from pyspark.sql import functions as F

from document_convert_to__markdown_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select,
)

from test_plans import plan_str


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _bucket(bigram: str, n_buckets: int) -> int:
    return int(hashlib.md5(bigram.encode()).hexdigest()[:4], 16) % n_buckets


def _bigrams(text: str):
    toks = [t for t in text.lower().split(" ") if t]
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_log_weights(raw, target, n_buckets=16, alpha=0.5):
    """Reference replay of the hashed-bigram importance weight."""
    ct, cr = {}, {}
    for _, text in target:
        for bg in _bigrams(text):
            b = _bucket(bg, n_buckets)
            ct[b] = ct.get(b, 0) + 1
    for _, text in raw:
        for bg in _bigrams(text):
            b = _bucket(bg, n_buckets)
            cr[b] = cr.get(b, 0) + 1
    t_total, r_total = sum(ct.values()), sum(cr.values())
    out = {}
    for doc_id, text in raw:
        w = 0.0
        for bg in _bigrams(text):
            b = _bucket(bg, n_buckets)
            w += math.log((ct.get(b, 0) + alpha)
                          / (t_total + alpha * n_buckets))
            w -= math.log((cr.get(b, 0) + alpha)
                          / (r_total + alpha * n_buckets))
        out[doc_id] = (len(_bigrams(text)), w)
    return out


RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices rose sharply today"),
    (3, "the dog sat on the rug"),
    (4, ""),                       # no tokens -> no bigrams
    (5, "single"),                 # one token -> no bigrams
]
TARGET = [
    (101, "the cat sat quietly"),
    (102, "the dog sat on grass"),
]


def test_log_weights_match_pure_python_replay(spark):
    got = {r["doc_id"]: (r["n_grams"], r["log_w"]) for r in
           dsir_log_weights(_df(spark, RAW), _df(spark, TARGET),
                            n_buckets=16).collect()}
    want = _py_log_weights(RAW, TARGET, n_buckets=16)
    assert set(got) == {1, 2, 3, 4, 5}
    for doc_id, (n, w) in want.items():
        assert got[doc_id][0] == n
        assert abs(got[doc_id][1] - w) < 1e-9, (doc_id, got[doc_id], w)


def test_empty_docs_keep_rows_with_zero_weight(spark):
    got = {r["doc_id"]: r for r in
           dsir_log_weights(_df(spark, RAW), _df(spark, TARGET),
                            n_buckets=16).collect()}
    for doc_id in (4, 5):
        assert got[doc_id]["n_grams"] == 0
        assert got[doc_id]["log_w"] == 0.0


def test_select_prefers_target_like_documents(spark):
    """Raw corpus = 20 target-like docs + 20 junk docs; target-like
    docs must dominate the top half of the Gumbel-top-k resample."""
    # Both groups repeat one sentence, so p_raw is symmetric between
    # them and only target affinity moves the weight (DSIR penalizes
    # bigrams *overrepresented in raw*, so asymmetric duplication
    # would swamp the target signal).
    targetish = [(i, "the cat sat on the mat near the dog")
                 for i in range(20)]
    junk = [(100 + i, "zzz qqq xxx vvv kkk www yyy nnn ppp")
            for i in range(20)]
    raw = _df(spark, targetish + junk)
    target = _df(spark, TARGET)
    picked = [r["doc_id"] for r in
              dsir_select(raw, target, k=20, n_buckets=64).collect()]
    assert len(picked) == 20
    assert sum(1 for d in picked if d < 100) >= 15  # target-like wins

    again = [r["doc_id"] for r in
             dsir_select(raw, target, k=20, n_buckets=64).collect()]
    assert picked == again  # deterministic, ordered identically


def test_gumbel_score_never_null(spark):
    """The (u32 + 0.5)/2^32 draw is strictly inside (0,1), so the
    double-log Gumbel never hits ln(0) -> NULL (and the DuckDB oracle
    never hits its ln(0) hard error)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    out = dsir_select(docs, target, k=500)
    assert out.filter(F.col("gumbel_score").isNull()).count() == 0
    assert out.count() == 500


def test_plan_broadcasts_ratio_and_single_wide_shuffle(spark):
    """The B-row log-ratio table must reach the exploded corpus via
    broadcast (never a sort-merge join), and the per-doc reduction is
    the only exchange downstream of the explode."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    plan = plan_str(dsir_log_weights(docs, target))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
