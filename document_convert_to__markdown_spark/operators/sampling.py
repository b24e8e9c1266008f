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


def stratified_sample(documents: DataFrame, fractions: dict,
                      stratum_col: str = "lang", seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample with a fixed seed (deterministic for
    a given input partitioning): the data-mixing knob for training
    corpora — e.g. downsample dominant languages."""
    return documents.sampleBy(stratum_col, fractions, seed=seed)
