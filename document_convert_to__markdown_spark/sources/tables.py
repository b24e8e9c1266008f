"""Pages-table readers/writers.

Production target is an Iceberg table (north rule); the sandbox has no
Iceberg catalog jars, so IO degrades to parquet paths with the same
schema.  Either way the scan benefits from Catalyst column pruning and
predicate pushdown: callers select only (url, html) for extraction, and
filters on ``lang``/``warc_ts`` prune partitions/row-groups before any
bytes move (SURVEY.md §4.2 "free" list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Read the pages table from an Iceberg identifier or a parquet path.

    ``source`` forms:
    - ``iceberg:<catalog.db.table>`` — Iceberg table (requires catalog)
    - ``table:<name>``              — any catalog table
    - anything else                 — parquet path/glob
    """
    if source.startswith("iceberg:") or source.startswith("table:"):
        return spark.read.table(source.split(":", 1)[1])
    if source.startswith("snapshot:"):
        from . import snapshot
        return snapshot.read(spark, source.split(":", 1)[1])
    return spark.read.parquet(source)


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    """Write to an Iceberg identifier (``iceberg:db.table``) or parquet path."""
    if target.startswith("iceberg:") or target.startswith("table:"):
        name = target.split(":", 1)[1]
        df.writeTo(name).using("iceberg").createOrReplace()
        return
    if target.startswith("snapshot:"):
        from . import snapshot
        root = target.split(":", 1)[1]
        if mode == "append":
            snapshot.commit_append(df, root)
        else:
            snapshot.commit_overwrite(df, root)
        return
    df.write.mode(mode).parquet(target)
