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


def read_pages_from_files(spark: SparkSession, path: str,
                          lang: str = "") -> DataFrame:
    """Directory/glob of loose files → pages DataFrame.

    The reference's primary input is a directory walked with ``rglob``
    (main.py:57-89); this is that entry point at Spark scale, using the
    built-in ``binaryFile`` source: file path becomes the url (document
    identity), modification time the crawl timestamp, raw bytes the
    payload.  Format still comes from sniffing, never the extension.
    """
    from pyspark.sql import functions as F

    binf = spark.read.format("binaryFile") \
        .option("recursiveFileLookup", "true").load(path)
    return binf.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit(lang).alias("lang"),
    )


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
