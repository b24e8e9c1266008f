"""Dataset curation operators: deterministic splits and stratified
sampling — the last mile before training-data export.

``dataset_split`` keys the train/val/test assignment on a content-hash
bucket (first 16 bits of md5), NOT on a random draw: the split of a
document is a pure function of its content, so re-runs, backfills, and
incremental arrivals land each document in the same split forever — the
property that prevents train/test leakage across pipeline versions.
SQL-expressible, so the driver oracle checks it exactly.

``stratified_sample`` wraps ``DataFrame.sampleBy`` (per-stratum
Bernoulli with a fixed seed) for per-language mixing ratios.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(col: Column, buckets: int = 100) -> Column:
    """Stable [0, buckets) bucket from a column's md5 (16-bit prefix)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long") % buckets
    )


def dataset_split(documents: DataFrame, key: str = "text",
                  train_pct: int = 80, val_pct: int = 10) -> DataFrame:
    """Assign train/val/test by content-hash bucket (80/10/10 default)."""
    bucket = split_bucket(F.col(key))
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return documents.withColumn("split", split)


def export_training_jsonl(
    df: DataFrame,
    path: str,
    partition_by: str = "split",
    max_records_per_file: int = 100_000,
    compress: bool = True,
) -> None:
    """Write curated rows as sharded (optionally gzipped) JSONL — the
    interchange format training loaders consume.

    - One JSON object per line (``to_json(struct(*))``, JVM-side).
    - Hive-partitioned by ``partition_by`` (``split=train/`` …), so a
      loader mounts exactly the splits it needs and Spark prunes the
      rest on any later read.
    - ``maxRecordsPerFile`` bounds shard size: at 10^12 rows you get
      many uniform shards per split instead of one file per task skewed
      by partition contents.
    """
    writer = (
        df.select(partition_by,
                  F.to_json(F.struct(*[c for c in df.columns])).alias("value"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_by)
    )
    if compress:
        writer = writer.option("compression", "gzip")
    writer.text(path)


def stratified_sample(documents: DataFrame, fractions: dict,
                      stratum_col: str = "lang", seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample with a fixed seed (deterministic for
    a given input partitioning): the data-mixing knob for training
    corpora — e.g. downsample dominant languages."""
    return documents.sampleBy(stratum_col, fractions, seed=seed)


def domain_cap(df: DataFrame, domain_col: str = "source", cap: int = 10,
               order_cols: list | None = None, key_col: str = "doc_id",
               num_salts: int = 16) -> DataFrame:
    """Per-domain document cap (the C4-style host quota): keep at most
    ``cap`` rows per domain under a deterministic total order.

    Scale shape: a naive ``row_number() OVER (PARTITION BY domain)``
    puts every row of a mega-domain through one task.  This runs the
    standard salted two-stage top-k instead:

    1. rank within ``(domain, salt)`` where salt = hash(``key_col``) %
       ``num_salts`` — each partition holds ~1/num_salts of the domain,
       and only ``cap`` rows per salt bucket survive;
    2. re-rank the ≤ cap x num_salts survivors within ``domain``.

    Any row in the domain's true top ``cap`` ranks ≤ cap inside its salt
    bucket too, so the result is *identical* to the single-window form
    (the oracle checks it with plain SQL ``row_number``) while stage 2's
    per-domain input is bounded by construction.  The order must be
    total (callers should end with a unique key, e.g. doc_id) or ranks
    are nondeterministic.
    """
    from pyspark.sql import Window

    order_cols = order_cols or [F.col(key_col)]
    salt = F.pmod(F.hash(key_col), F.lit(num_salts))
    staged = df.withColumn("_salt", salt)
    w1 = Window.partitionBy(domain_col, "_salt").orderBy(*order_cols)
    survivors = (
        staged.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= cap)
        .drop("_salt", "_rn1")
    )
    w2 = Window.partitionBy(domain_col).orderBy(*order_cols)
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= cap)
    )
