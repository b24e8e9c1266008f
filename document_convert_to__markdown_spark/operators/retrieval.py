"""BM25 ranked retrieval over the documents table.

Okapi BM25 (Robertson et al., TREC-3; the idf variant is Lucene's
``ln(1 + (N - df + 0.5)/(df + 0.5))``, which is non-negative even for
terms appearing in most documents — that matters here because web-corpus
boilerplate terms routinely exceed df > N/2, where the classic idf goes
negative).  Everything is relational Catalyst — no Python UDFs.

Scale shape (the inverted-index discipline):

- Document length and per-term tf come out of ONE pass over the corpus:
  ``dl`` is computed scan-side (``F.size`` of the split array, no
  explode), carried through the explode, and recovered with ``first()``
  in the same ``groupBy(doc, term)`` that builds tf — one wide shuffle
  total, and it only carries rows whose term is in the query set (the
  ``isin`` filter sits directly on the generate output, so non-query
  terms never reach the exchange).
- Corpus stats (N, avgdl) and per-term df are tiny relations —
  broadcast, never shuffled against.
- Top-k is ``orderBy(...).limit(k)`` = TakeOrderedAndProject: each
  partition keeps k rows, the driver merges — no global sort.

At 100 TB the tf relation is bounded by |query_terms| x n_docs rows
before aggregation and far fewer after, so the single shuffle is the
floor for any exact scorer.

Cross-engine float parity: scores are rounded to 4 decimals BEFORE the
top-k cut and ties are broken on doc_id, so Spark and the DuckDB oracle
select identical row sets even when ln() differs in the last ulp.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bm25_topk(documents: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-words query.

    Returns (id_col, score, n_matched) — n_matched is how many distinct
    query terms the document contains (useful as a coverage filter).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                     lambda x: x != F.lit(""))

    # One corpus pass: dl scan-side, tf for query terms only.
    tf = (
        documents
        .select(F.col(id_col), F.size(words).alias("dl"),
                F.explode(words).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )

    stats = documents.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(words)).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        tf
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(F.lit(1.0)
                  + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                  / (F.col("df") + F.lit(0.5))),
        )
        .withColumn(
            "contrib",
            F.col("idf") * F.col("tf") * (F.lit(k1) + 1.0)
            / (F.col("tf")
               + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                              + F.lit(b) * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 4).alias("score"),
             F.count("*").alias("n_matched"))
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def rrf_fuse(rankings: list, id_col: str = "doc_id",
             score_col: str = "score", k_rrf: int = 60,
             k: int = 10) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (Cormack et al.,
    SIGIR 2009): score(d) = Σ_lists 1/(k_rrf + rank_list(d)).

    The standard hybrid-retrieval combiner: fuse a lexical (BM25) and
    a dense (embedding-cosine ANN) top-k WITHOUT score calibration —
    only ranks matter, so the wildly different score scales never meet.

    Inputs are DataFrames of (id_col, score_col); each is a top-k list
    already cut by its retriever, so every input is k-bounded — the
    unpartitioned row_number window below runs over ≤ k rows per list,
    and the fused relation is ≤ N·k rows.  This operator is driver-
    cheap by construction; the heavy lifting happened in the
    retrievers.  Ranks tie-break on id for cross-engine determinism.

    Returns (id_col, rrf_score, n_lists) — n_lists is how many input
    lists surfaced the doc (a useful agreement signal).
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    from pyspark.sql import Window

    tagged = []
    for df in rankings:
        w = Window.orderBy(F.desc(score_col), F.col(id_col))
        tagged.append(df.select(F.col(id_col),
                                F.row_number().over(w).alias("rank")))
    all_ranks = tagged[0]
    for t in tagged[1:]:
        all_ranks = all_ranks.unionByName(t)
    fused = (all_ranks
             .groupBy(id_col)
             .agg(F.round(F.sum(F.lit(1.0) / (F.lit(k_rrf) + F.col("rank"))),
                          6).alias("rrf_score"),
                  F.count("*").alias("n_lists")))
    return fused.orderBy(F.desc("rrf_score"), F.col(id_col)).limit(k)
