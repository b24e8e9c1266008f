"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over hashed n-gram features, fully relational.

Selects raw-corpus documents whose hashed-bigram distribution looks
like a trusted *target* corpus: each document's log importance weight
is

    log w(doc) = sum over bigram occurrences of
                 ln( p_target(bucket) / p_raw(bucket) )

with bigrams hashed into ``n_buckets`` buckets (the paper's hashed
n-gram generative model) and add-alpha smoothing on both
distributions.  Selection is the paper's Gumbel-top-k importance
resample: rank by ``log w + Gumbel(0,1)`` — here the Gumbel draw is a
pure function of the document key (md5-uniform, like
``sampling.weighted_sample``), so the selected set is deterministic
and backfill-stable.

Scale shape:

- The bucket-count relation is ONE tagged-union aggregation onto
  ``n_buckets`` rows (map-side partial combine collapses each
  partition to at most B rows before the exchange); totals come from
  an unpartitioned window over that tiny relation — broadcast
  afterwards, never shuffled against.
- Per-document weights cost ONE wide shuffle: explode bigrams →
  broadcast-join the B-row log-ratio table → groupBy(doc) sum.
- Top-k is round-then-cut ``orderBy(...).limit(k)`` =
  TakeOrderedAndProject with a doc-id tie-break (engine-stable rows).

The md5-based bucket hash (not ``F.hash``) is deliberate: Spark's
murmur3 and DuckDB's hash disagree, md5 is identical everywhere, so
the DuckDB oracle replays the weights bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sampling import md5_u32
from .text import bigram_array as _bigrams
from .text import space_tokens as _toks


def _bucket(col, n_buckets: int):
    """Hash a bigram string into [0, n_buckets) identically in Spark
    and DuckDB: first 4 md5 hex digits -> int -> mod."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("int"),
        F.lit(n_buckets),
    )


def _buckets(df: DataFrame, text_col: str, n_buckets: int,
             side: str) -> DataFrame:
    return (
        df.select(_toks(F.col(text_col)).alias("toks"))
        .select(F.explode(_bigrams("toks")).alias("bg"))
        .select(_bucket(F.col("bg"), n_buckets).alias("bucket"),
                F.lit(side).alias("side"))
    )


def dsir_log_weights(raw: DataFrame, target: DataFrame,
                     n_buckets: int = 256, alpha: float = 0.5,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document DSIR log importance weight.

    Returns (id_col, n_grams, log_w).  Documents with no bigrams keep
    their row with n_grams=0 and log_w=0.0 (an empty feature vector is
    equidistant from both distributions — weight ratio 1).
    """
    from pyspark.sql import Window

    # One tagged union -> one aggregation gives BOTH per-bucket count
    # columns (buckets seen by only one side get 0 on the other), and
    # the unpartitioned window sums the totals over the <=B-row counts
    # relation — no full-outer self-join, no cross joins, one upstream
    # scan of each corpus.  The single-partition window is fine: it
    # runs on at most n_buckets rows, broadcast-side.
    counts = (
        _buckets(target, text_col, n_buckets, "t")
        .unionByName(_buckets(raw, text_col, n_buckets, "r"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("side") == "t", 1).otherwise(0))
            .alias("ct"),
            F.sum(F.when(F.col("side") == "r", 1).otherwise(0))
            .alias("cr"),
        )
    )
    w_all = Window.partitionBy()
    ratio = counts.select(
        "bucket",
        (F.log((F.col("ct") + F.lit(alpha))
               / (F.sum("ct").over(w_all).cast("double")
                  + F.lit(alpha * n_buckets)))
         - F.log((F.col("cr") + F.lit(alpha))
                 / (F.sum("cr").over(w_all).cast("double")
                    + F.lit(alpha * n_buckets)))
         ).alias("lam"),
    )
    doc_buckets = (
        raw.select(F.col(id_col), _toks(F.col(text_col)).alias("toks"))
        .select(id_col, F.explode_outer(_bigrams("toks")).alias("bg"))
        .withColumn("bucket", _bucket(F.col("bg"), n_buckets))
    )
    return (
        doc_buckets
        .join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bg").alias("n_grams"),
            F.coalesce(F.sum(F.when(F.col("bg").isNotNull(),
                                    F.col("lam"))),
                       F.lit(0.0)).alias("log_w"),
        )
    )


def dsir_select(raw: DataFrame, target: DataFrame, k: int = 100,
                n_buckets: int = 256, alpha: float = 0.5,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Gumbel-top-k importance resample: the k raw documents maximizing
    ``log_w + Gumbel(md5(doc))``.  Scores are rounded to 4 decimals
    BEFORE the cut with an id tie-break so the selected row set is
    identical across engines."""
    w = dsir_log_weights(raw, target, n_buckets=n_buckets, alpha=alpha,
                         text_col=text_col, id_col=id_col)
    # +0.5 centers the 32-bit draw inside (0,1) STRICTLY — at u=0 the
    # outer ln would see -ln(1)=0 (NULL in Spark, a hard error in the
    # DuckDB oracle), and a doc_id whose md5 starts '00000000' is
    # certain at 10^12 rows (review r3).
    u = (md5_u32(id_col) + F.lit(0.5)) / F.lit(float(1 << 32))
    gumbel = -F.log(-F.log(u))
    scored = w.select(
        id_col, "n_grams",
        F.round(F.col("log_w"), 4).alias("log_w"),
        F.round(F.col("log_w") + gumbel, 4).alias("gumbel_score"),
    )
    return scored.orderBy(F.desc("gumbel_score"), F.col(id_col)).limit(k)
