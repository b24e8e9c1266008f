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

    ``content`` may be one column name or a list — a multi-column
    compare hashes each column separately (null-distinct sentinel)
    and then the combination, so a change in ANY listed column is
    'changed' (review finding: single-column compare made the
    changelog blind to other payload columns).
    """
    cols = [content] if isinstance(content, str) else list(content)

    def h(df):
        per_col = [F.coalesce(F.md5(F.col(c).cast("string")),
                              F.lit("\x00null")) for c in cols]
        return F.md5(F.concat_ws("\x01", *per_col))

    o = old.select(F.col(key).alias("_ko"), h(old).alias("_ho"))
    n = new.select(F.col(key).alias("_kn"), h(new).alias("_hn"))
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


def snapshot_changelog(spark, root: str, from_version: int,
                       to_version: int, key: str = "url",
                       content=None) -> DataFrame:
    """CDC read over the snapshot table: the row-level changelog
    between two committed versions — Iceberg's
    ``table_changes``/``create_changelog_view`` shape on the sandbox
    snapshot format (``sources/snapshot.py``).

    Consumers of a 100 TB table don't rescan it per downstream job;
    they subscribe to changes: ``changelog(v_n, v_m)`` is exactly the
    work list for incremental re-extraction, index maintenance
    (``incremental_dedup``), or downstream MERGE replication.  Built as
    two time-travel reads + :func:`snapshot_delta` (hash-compare join,
    exchange carries 16-byte hashes), then the changed/added rows are
    re-joined to the NEW snapshot only for keys that need payloads —
    deleted keys emit a key-only tombstone row (payload columns null),
    matching CDC DELETE semantics.

    Returns ``(key, _change_type in insert|update_postimage|delete,
    <payload columns of the table>)`` — unchanged rows are NOT emitted
    (the point of CDC).

    ``content=None`` (default) compares ALL payload columns — full-row
    CDC, the Iceberg ``table_changes`` semantics: a change in any
    column emits an update (review finding: the earlier text-only
    default made a lang-only correction invisible to replicas).  Pass
    a column name or list to narrow the compare deliberately.

    Additive schema evolution between the two versions is handled the
    way the evolved table reads: a column added after ``from_version``
    is null on every old row (round-5 advice — selecting it on the old
    snapshot raised AnalysisException), so a key whose new value in
    that column is non-null emits ``update_postimage`` and all-null
    new values stay ``unchanged``.
    """
    from ..sources import snapshot as snap

    old = snap.read(spark, root, version=from_version)
    new = snap.read(spark, root, version=to_version)
    if content is None:
        content = [c for c in new.columns if c != key]
    else:
        content = [content] if isinstance(content, str) else list(content)
    new_types = dict(new.dtypes)
    evolved = [c for c in content if c not in old.columns]
    if evolved:
        old = old.select(
            "*", *[F.lit(None).cast(new_types[c]).alias(c)
                   for c in evolved])
    d = snapshot_delta(old, new, key=key, content=content)
    changed = d.filter(F.col("status") != "unchanged").select(
        key,
        F.when(F.col("status") == "added", "insert")
        .when(F.col("status") == "changed", "update_postimage")
        .otherwise("delete").alias("_change_type"),
    )
    payload_cols = [c for c in new.columns if c != key]
    upserts = (changed.filter(F.col("_change_type") != "delete")
               .join(new, key))
    tombstones = changed.filter(F.col("_change_type") == "delete").select(
        key, "_change_type",
        *[F.lit(None).cast(dict(new.dtypes)[c]).alias(c)
          for c in payload_cols])
    return upserts.select(key, "_change_type", *payload_cols) \
        .unionByName(tombstones)
