"""BM25 ranked retrieval (operators/retrieval.py): semantics + the
inverted-index plan shape (query-term filter before the exchange,
broadcast stats/df, TakeOrderedAndProject top-k)."""

import math

import pytest
from pyspark.sql import functions as F

from document_convert_to__markdown_spark.operators.retrieval import bm25_topk
from tests.test_plans import plan_str


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark shuffle join shuffle spark"),
        (1, "spark vector index"),
        (2, "vector vector vector search index"),
        (3, "the quick brown spark"),
        (4, "index only"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_matches_hand_computation(corpus):
    rows = {r["doc_id"]: r for r in
            bm25_topk(corpus, ["vector", "index"], k=5).collect()}
    # doc 3 matches no query term -> absent
    assert set(rows) == {1, 2, 4}
    # hand-compute doc 4 ("index only"): tf=1, dl=2, N=5, avgdl=3.8
    idf_index = math.log(1 + (5 - 3 + 0.5) / (3 + 0.5))
    expect = idf_index * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 3.8))
    assert rows[4]["score"] == pytest.approx(round(expect, 4), abs=1e-4)
    assert rows[4]["n_matched"] == 1
    assert rows[2]["n_matched"] == 2
    # doc 2 is the clear winner: 3x 'vector' (rarest term) + 'index'
    assert rows[2]["score"] > rows[1]["score"] > 0


def test_bm25_rare_term_outranks_common(corpus):
    scores = {r["doc_id"]: r["score"] for r in
              bm25_topk(corpus, ["vector", "spark"], k=5).collect()}
    # single-term docs: 'vector'-heavy doc 2 (tf=3, df=2) outranks the
    # 'spark'-heavy doc 0 (tf=2, df=3) — rarer term, higher idf, same dl
    assert scores[2] > scores[0]
    # the doc matching BOTH terms tops the list
    assert max(scores, key=scores.get) == 1


def test_bm25_k_limits_and_orders(corpus):
    out = bm25_topk(corpus, ["vector", "index", "spark"], k=2).collect()
    assert len(out) == 2
    assert out[0]["score"] >= out[1]["score"]


def test_bm25_empty_query_raises(corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, [])


def test_bm25_plan_shape(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = plan_str(bm25_topk(docs, ["dup", "key", "vector"], k=10))
    # top-k never global-sorts
    assert "TakeOrderedAndProject" in plan, plan
    # df + corpus stats arrive via broadcast, never a shuffle join
    assert plan.count("BroadcastExchange") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    # the term filter sits on the generate output, BEFORE the exchange:
    # formatted plans list operators bottom-up per subtree, so Filter on
    # term must appear and no per-row Python evaluation anywhere
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # exactly two aggregation exchanges (tf+dl groupBy, final per-doc
    # sum) plus the broadcasts — no stray repartitions
    assert plan.count("Exchange hashpartitioning") <= 2, plan
