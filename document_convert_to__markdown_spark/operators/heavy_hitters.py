"""Heavy-hitter terms via Spark 4's mergeable approx_top_k sketches.

The exact top-terms query (``__spark_entry__._q_text_top_terms``) is a
full (term → count) aggregation plus a rank — at 10^12 documents the
term dictionary itself is billions of rows and the rank shuffles all of
it for an answer that only needs the top handful.  The sketch path
bounds that: ``approx_top_k_accumulate`` keeps a fixed-size
frequent-items summary per group (map-side partial aggregation — each
task tracks ``max_items`` candidates, the Space-Saving/Misra-Gries
family guarantee), ``approx_top_k_combine`` union-merges summaries
across partitions/groups, ``approx_top_k_estimate`` reads the answer.
The shuffle carries ONE sketch row per group instead of the whole
dictionary — the identical store-and-merge contract the Datasketches
HLL path (``sketch_union_hll``) gives distinct counts.

When the number of distinct items a group ever sees stays at or below
``max_items``, the summary never evicts and every reported count is
EXACT — that is what makes the sf0.01 contract query oracle-checkable
against plain relational SQL while the same plan carries the 10^12-row
case (where counts become  ±n/max_items estimates, the standard
frequent-items trade).

Reference anchor: the reference's stats stage counts per-format
successes in a driver dict (``converter.py:94-101``); this is that
counter generalized to open-vocabulary keys at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk_terms_sketch(documents: DataFrame, k: int = 5,
                      max_items: int = 10_000,
                      text_col: str = "text",
                      group_col: str = "lang") -> DataFrame:
    """Top-``k`` most frequent terms per ``group_col`` via mergeable
    frequent-items sketches.

    Two aggregation levels prove mergeability end-to-end: terms
    accumulate into one sketch per (group, term-shard) — the shard key
    (``xxhash64(term) % 8``) stands in for "sketches stored per
    partition/snapshot and merged later" — then ``approx_top_k_combine``
    union-merges the shards into one sketch per group before the
    estimate.  Eviction never loses a true heavy hitter across shards
    because each shard owns a disjoint term subset.

    The final selection re-ranks the estimate with the repo-wide
    deterministic tiebreak (count DESC, term ASC) so Spark and the
    DuckDB oracle cut identical rows; the estimate is asked for 4·k
    items so a tie straddling position k is resolved by the re-rank,
    not by sketch internals.  Contract boundary: if MORE than 4·k
    terms share the rank-k boundary count (degenerate groups where
    most terms tie at count 1-2), the sketch surfaces an arbitrary
    4·k of them and the ASC tiebreak picks among those — approximate
    at the tie frontier, like every bounded-memory heavy-hitter
    sketch.  Raise ``k``'s over-fetch (or use the exact
    ``top_terms_per_lang`` relational twin) when boundary ties matter.

    Returns ``(group_col, term, term_count, rank)`` — exact counts
    whenever per-shard distinct terms ≤ ``max_items``.
    """
    from pyspark.sql import Window

    toks = documents.select(
        F.col(group_col),
        F.explode(F.split(F.lower(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    sharded = toks.withColumn(
        "_shard", F.pmod(F.xxhash64("term"), F.lit(8)))
    sketches = (
        sharded.groupBy(group_col, "_shard")
        .agg(F.expr(f"approx_top_k_accumulate(term, {max_items})")
             .alias("sk"))
    )
    merged = (
        sketches.groupBy(group_col)
        .agg(F.expr("approx_top_k_combine(sk)").alias("sk"))
    )
    # over-fetch 4k candidates, then apply the deterministic tiebreak
    est = merged.select(
        group_col,
        F.explode(F.expr(f"approx_top_k_estimate(sk, {4 * k})"))
        .alias("e"),
    ).select(group_col, F.col("e.item").alias("term"),
             F.col("e.count").alias("term_count"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("term_count").desc(), F.col("term"))
    return (
        est.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
