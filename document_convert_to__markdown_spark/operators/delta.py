"""Crawl snapshot delta — what changed between two crawls of the web.

A recrawl pipeline's first question is differential: which urls are new,
which disappeared, which changed content, which are byte-identical?
Only the changed/new slice needs re-extraction (the reference re-runs
its whole batch and relies on idempotent overwrite,
``/root/reference/src/image_processor.py:100-110``; at 10^12 rows the
delta IS the job).

``snapshot_delta`` is one full-outer hash-compare join:

- both sides are reduced to ``(key, content_hash)`` BEFORE the join —
  the exchange carries 16-byte hashes, never document bodies (same rule
  as exact dedup: text must not cross a shuffle it doesn't need to);
- the join is a plain hash equi-join on the key, so AQE handles skew
  and the two scans prune to two columns each;
- status is a pure projection over null-ness + hash equality.

At scale both inputs arrive hash-partitioned by url from the ingest
write (bucketed tables), so the join co-locates without a new shuffle;
with Iceberg, ``old`` is simply a time-travel read of the same table
(``sources/snapshot.py``), making this the incremental-processing
primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_delta(old: DataFrame, new: DataFrame, key: str = "doc_id",
                   content: str = "text") -> DataFrame:
    """Per-key change status between two snapshots.

    Returns ``(key, status)`` with status in
    ``added | deleted | changed | unchanged``:

    - ``added``: key only in ``new``
    - ``deleted``: key only in ``old``
    - ``changed``: in both, content hash differs
    - ``unchanged``: in both, content hash identical

    md5 at 10^12 rows: collision odds ~10^-14 — the standard
    content-equality proxy (same choice as ``dedup_exact``).
    """
    o = old.select(F.col(key).alias("_ko"),
                   F.md5(F.col(content).cast("string")).alias("_ho"))
    n = new.select(F.col(key).alias("_kn"),
                   F.md5(F.col(content).cast("string")).alias("_hn"))
    joined = o.join(n, o["_ko"] == n["_kn"], "full_outer")
    return joined.select(
        F.coalesce("_kn", "_ko").alias(key),
        F.when(F.col("_ko").isNull(), F.lit("added"))
        .when(F.col("_kn").isNull(), F.lit("deleted"))
        # null-safe: content changing to or from NULL is 'changed', not
        # the NULL-comparison fall-through (review r3b) — a page whose
        # extraction newly fails must re-process
        .when(~F.col("_ho").eqNullSafe(F.col("_hn")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
