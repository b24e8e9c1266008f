"""Snapshot-manifest table on plain parquet — the Iceberg-shaped sandbox
stand-in (the container ships no Iceberg runtime jars).

Gives the three properties the north rule buys from Iceberg, on any
filesystem Spark can write:

- **atomic commits**: readers only see files listed in the current
  manifest; the current-pointer flips via ``os.replace`` (atomic on
  POSIX).  A crash mid-write leaves orphan data files that no manifest
  references — invisible, exactly like Iceberg's uncommitted snapshots.
- **snapshot isolation / time travel**: every commit writes manifest
  ``v{n}.json`` listing its full file set; ``read(version=...)`` scans
  any historical snapshot.
- **idempotent url-keyed overwrite** (SURVEY A20): ``commit_overwrite``
  publishes a manifest containing only the new files — the re-run
  replace semantics of ``image_processor.py:100-110`` at table scope.

Single-writer by design (the extraction job owns its output table); a
real deployment swaps this module for `spark.read/writeTo("iceberg")`
with zero changes elsewhere (`sources/tables.py` dispatches on prefix).

Layout:
    root/data/c{n:05d}/part-*.parquet   one subdir per commit
    root/_snapshots/v{n:05d}.json       {"files": [...], "op": ..., "parent": n-1}
    root/_current                       text: latest version number
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Snapshot:
    version: int
    op: str
    parent: int
    files: list
    # Schema of the table AS OF this snapshot (StructType.jsonValue()).
    # None on manifests written before schema tracking existed.
    schema: dict | None = None


def _snap_dir(root: str) -> str:
    return os.path.join(root, "_snapshots")


def current_version(root: str) -> int:
    """Latest committed version, 0 if the table doesn't exist yet."""
    try:
        with open(os.path.join(root, "_current")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def load_snapshot(root: str, version: int) -> Snapshot:
    with open(os.path.join(_snap_dir(root), f"v{version:05d}.json")) as f:
        d = json.load(f)
    return Snapshot(version=version, op=d["op"], parent=d["parent"],
                    files=d["files"], schema=d.get("schema"))


def versions(root: str) -> list:
    v = current_version(root)
    out = []
    while v > 0:
        s = load_snapshot(root, v)
        out.append(s)
        v = s.parent
    return list(reversed(out))


def _commit(root: str, df: DataFrame, op: str,
            base_files: list | None = None) -> Snapshot:
    os.makedirs(_snap_dir(root), exist_ok=True)
    parent = current_version(root)
    version = parent + 1
    commit_dir = os.path.join(root, "data", f"c{version:05d}")

    df.write.mode("overwrite").parquet(commit_dir)
    new_files = sorted(
        os.path.join(commit_dir, f)
        for f in os.listdir(commit_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )

    if base_files is not None:
        files = sorted(base_files) + new_files
    elif op == "overwrite" or parent == 0:
        files = new_files
    else:
        files = load_snapshot(root, parent).files + new_files
    manifest = {"op": op, "parent": parent, "files": files,
                # Table schema as of this snapshot: lets `read` hand
                # the scan an explicit schema (older files null-fill
                # columns added later — additive evolution without
                # mergeSchema's per-file footer reads) and pins
                # deterministic column order per version.
                "schema": df.schema.jsonValue()}

    # Write-then-rename: the manifest and the current pointer both land
    # atomically; a crash before either leaves the table at `parent`.
    fd, tmp = tempfile.mkstemp(dir=_snap_dir(root), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(_snap_dir(root), f"v{version:05d}.json"))

    fd, tmp = tempfile.mkstemp(dir=root, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(root, "_current"))
    return Snapshot(version=version, op=op, parent=parent, files=files)


def commit_append(df: DataFrame, root: str,
                  allow_evolution: bool = False) -> Snapshot:
    """Append-commit: new snapshot = parent files + this df's files.

    Schema compatibility is gated Iceberg-style: dropping or
    re-typing an existing column is ALWAYS refused (existing readers
    would silently lose data); ADDING columns is additive evolution —
    allowed with ``allow_evolution=True``, after which ``read`` of the
    new version null-fills the column for pre-evolution files, while
    time travel to an older version still presents that version's own
    schema (each manifest carries its schema).
    """
    parent = current_version(root)
    if parent > 0:
        prev = load_snapshot(root, parent).schema
        if prev is not None:
            prev_f = {f["name"]: f["type"] for f in prev["fields"]}
            new_f = {f["name"]: f["type"]
                     for f in df.schema.jsonValue()["fields"]}
            dropped = sorted(n for n in prev_f if n not in new_f)
            retyped = sorted(n for n in prev_f
                             if n in new_f and prev_f[n] != new_f[n])
            if dropped or retyped:
                raise ValueError(
                    f"incompatible append schema: dropped={dropped} "
                    f"retyped={retyped} — dropping/re-typing a column "
                    f"breaks existing snapshot readers")
            added = sorted(n for n in new_f if n not in prev_f)
            if added and not allow_evolution:
                raise ValueError(
                    f"append adds columns {added}; pass "
                    f"allow_evolution=True to evolve the table schema")
    return _commit(root, df, "append")


def commit_overwrite(df: DataFrame, root: str) -> Snapshot:
    """Overwrite-commit: new snapshot = only this df's files (A20
    idempotent replace — old files stay on disk for time travel until
    an expire pass removes unreferenced snapshots)."""
    return _commit(root, df, "overwrite")


def read(spark: SparkSession, root: str, version: int | None = None
         ) -> DataFrame:
    """Scan a snapshot (default: current).  Orphan files from crashed
    writers are never listed, so they are never read."""
    v = current_version(root) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    snap = load_snapshot(root, v)
    if snap.schema is not None:
        # Explicit per-version schema: files written before an
        # additive evolution null-fill the newer columns, without
        # mergeSchema's per-file footer reads; column order is pinned
        # per version.  Top-level fields read as nullable (a column
        # absent from an old file IS null there).
        from pyspark.sql.types import StructField, StructType

        st = StructType.fromJson(snap.schema)
        st = StructType([StructField(f.name, f.dataType, True, f.metadata)
                         for f in st.fields])
        return spark.read.schema(st).parquet(*snap.files)
    return spark.read.parquet(*snap.files)


def compact(spark: SparkSession, root: str,
            small_file_bytes: int = 32 * 1024 * 1024,
            target_file_bytes: int = 128 * 1024 * 1024) -> Snapshot | None:
    """Bin-pack small data files into ~target-sized ones (the Iceberg
    ``rewrite_data_files`` analog — the maintenance pass a 100 TB table
    of streaming/append commits needs, or scans drown in file-open
    overhead and tiny row groups defeat column-statistics pruning).

    Reads only the files under ``small_file_bytes``, rewrites them as
    ``ceil(total/target)`` files, and commits a manifest that keeps the
    already-large files untouched — readers atomically flip from the
    old file set to the new one with identical row contents.  The
    superseded small files stay on disk for time travel until
    ``expire_snapshots`` collects them.  Returns the new snapshot, or
    None when fewer than two small files exist (nothing to gain).
    """
    v = current_version(root)
    if v == 0:
        return None
    snap = load_snapshot(root, v)
    sizes = {f: os.path.getsize(f) for f in snap.files}
    small = [f for f, s in sizes.items() if s < small_file_bytes]
    if len(small) < 2:
        return None
    small_set = set(small)
    big = [f for f in snap.files if f not in small_set]
    total = sum(sizes[f] for f in small)
    n_out = max(1, -(-total // target_file_bytes))
    compacted = spark.read.parquet(*small).repartition(n_out)
    return _commit(root, compacted, "compact", base_files=big)


def expire_snapshots(root: str, keep_last: int = 1) -> int:
    """Delete data files referenced only by expired snapshots (the
    operational analog of Iceberg table maintenance — SURVEY A28).
    Returns the number of files deleted."""
    snaps = versions(root)
    if len(snaps) <= keep_last:
        return 0
    keep = snaps[-keep_last:]
    live = {f for s in keep for f in s.files}
    dead = {f for s in snaps[:-keep_last] for f in s.files} - live
    for f in dead:
        try:
            os.remove(f)
        except FileNotFoundError:
            pass
    for s in snaps[:-keep_last]:
        os.remove(os.path.join(_snap_dir(root), f"v{s.version:05d}.json"))
        # re-parent the oldest kept snapshot so the chain stays walkable
    if keep:
        oldest = keep[0]
        path = os.path.join(_snap_dir(root), f"v{oldest.version:05d}.json")
        with open(path) as f:
            d = json.load(f)
        d["parent"] = 0
        fd, tmp = tempfile.mkstemp(dir=_snap_dir(root), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(d, f)
        os.replace(tmp, path)
    return len(dead)


def merge_upsert(spark: SparkSession, root: str, updates: DataFrame,
                 key: str = "url", validate: bool = True) -> Snapshot:
    """MERGE INTO-style upsert: rows of ``updates`` replace same-key rows
    in the current snapshot, new keys insert — the write half of the
    incremental-recrawl loop (``operators/delta.py`` decides WHAT
    changed; this applies it).  Equivalent Iceberg form:
    ``MERGE INTO t USING u ON t.url = u.url WHEN MATCHED THEN UPDATE *
    WHEN NOT MATCHED THEN INSERT *``.

    Plan: one LEFT ANTI join (current ⟕̸ updates on key — hash join,
    updates side broadcast when small) + union + overwrite-commit.
    The commit inherits ``_commit``'s write-then-rename atomicity: a
    crash mid-merge leaves the table at the parent version, and the
    parent stays time-travel readable afterward (same A20 idempotent
    guarantee as ``commit_overwrite``).  At Iceberg scale the anti-join
    becomes a partition-pruned merge-on-read; the logical shape here is
    identical.
    """
    current = read(spark, root)
    if set(current.columns) != set(updates.columns):
        raise ValueError(
            f"merge_upsert schema mismatch: table has {current.columns}, "
            f"updates has {updates.columns}")
    if validate:
        # ANSI MERGE errors when a target row matches multiple source
        # rows; replaying that here keeps the one-row-per-key table
        # invariant from breaking silently (review r3b).  One cheap
        # aggregation over the (small) updates side; callers that
        # pre-dedup (run_stream_merge) pass validate=False.
        n_dup = (updates.groupBy(key).count()
                 .filter(F.col("count") > 1).limit(1).count())
        if n_dup:
            raise ValueError(
                f"merge_upsert: updates contain duplicate '{key}' values "
                f"— dedup first (e.g. latest-fetch-wins) or the table "
                f"would commit multiple rows per key")
    carried = current.join(updates.select(key).distinct(), key, "left_anti")
    merged = carried.unionByName(updates.select(*current.columns))
    return commit_overwrite(merged, root)


def commit_with_stats(df: DataFrame, root: str, stats_cols: list,
                      op: str = "overwrite") -> Snapshot:
    """Commit ``df`` and record per-file min/max column statistics in a
    sidecar (``v{n}.stats.json``) — the Iceberg manifest-stats analog
    that makes :func:`read_pruned` possible.  Pair with a range- or
    Z-order-clustered write (``repartitionByRange`` on the key, or
    ``functions.layout.zorder_key``) so each file covers a NARROW
    value range; stats over randomly-distributed files are wide and
    prune nothing — clustering is what turns stats into skipped IO.

    The stats pass is one extra aggregation over the JUST-WRITTEN
    files only, grouped on ``_metadata.file_path`` — it reads only the
    stats columns (column-pruned), never payloads.  On ``append`` the
    parent version's sidecar is carried forward and merged, so each
    append's stats work is O(batch), never O(table) (review finding:
    scanning ``snap.files`` wholesale made the Nth append rescan all
    N commits).
    """
    if op == "overwrite":
        snap = commit_overwrite(df, root)
        prior: dict = {}
        new_files = snap.files
    elif op == "append":
        snap = commit_append(df, root)
        parent_sidecar = os.path.join(
            _snap_dir(root), f"v{snap.parent:05d}.stats.json")
        try:
            with open(parent_sidecar) as f:
                prior = json.load(f)
        except FileNotFoundError:
            prior = {}
        prior_set = set(load_snapshot(root, snap.parent).files) \
            if snap.parent > 0 else set()
        new_files = [f for f in snap.files if f not in prior_set]
    else:
        raise ValueError(f"unsupported op {op!r}")
    spark = df.sparkSession
    norm = F.regexp_replace(F.col("_metadata.file_path"), "^file:(//)?", "")
    aggs = []
    for c in stats_cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    rows = (spark.read.parquet(*new_files)
            .groupBy(norm.alias("_f")).agg(*aggs).collect()) \
        if new_files else []
    stats = dict(prior)
    stats.update({r["_f"]: {c: [r[f"_min_{c}"], r[f"_max_{c}"]]
                            for c in stats_cols} for r in rows})
    path = os.path.join(_snap_dir(root), f"v{snap.version:05d}.stats.json")
    fd, tmp = tempfile.mkstemp(dir=_snap_dir(root), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(stats, f, default=str)
    os.replace(tmp, path)
    return snap


def read_pruned(spark: SparkSession, root: str, col: str, lo, hi,
                version: int | None = None) -> tuple:
    """Data-skipping scan: read only the files whose recorded
    ``[min, max]`` range for ``col`` overlaps ``[lo, hi]`` (Iceberg's
    min/max file pruning on the sandbox snapshot format), then apply
    the row-level filter on the survivors.  Files without recorded
    stats are conservatively read (never a wrong answer, only missed
    skipping — the same contract real manifest stats carry).

    Returns ``(df, n_files_scanned, n_files_total)`` — the file counts
    are the skipping evidence tests pin; the row result is identical
    to an unpruned filtered scan by construction.
    """
    v = current_version(root) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    snap = load_snapshot(root, v)
    stats_path = os.path.join(_snap_dir(root), f"v{v:05d}.stats.json")
    try:
        with open(stats_path) as f:
            stats = json.load(f)
    except FileNotFoundError:
        stats = {}

    def overlaps(f: str) -> bool:
        rng = stats.get(f, {}).get(col)
        if not rng or rng[0] is None or rng[1] is None:
            return True
        if isinstance(lo, (int, float)) and not isinstance(lo, bool):
            mn, mx = type(lo)(rng[0]), type(hi)(rng[1])
            return not (mx < lo or mn > hi)
        # Non-numeric stats (timestamps, dates, strings) are json-
        # serialized via str() at commit time; their ISO / lexical
        # string forms order consistently, so compare in string space
        # rather than crashing on type(lo)(str) reconstruction.
        s_lo, s_hi, mn, mx = str(lo), str(hi), str(rng[0]), str(rng[1])
        return not (mx < s_lo or mn > s_hi)

    files = [f for f in snap.files if overlaps(f)]
    if not files:
        # preserve the schema without reading payloads
        empty = spark.read.parquet(*snap.files).limit(0)
        return empty, 0, len(snap.files)
    df = spark.read.parquet(*files).filter(F.col(col).between(lo, hi))
    return df, len(files), len(snap.files)


def delete_keys(spark: SparkSession, root: str, keys: DataFrame,
                key: str = "url") -> tuple:
    """Copy-on-write DELETE (the takedown/GDPR-erasure primitive):
    remove every row whose ``key`` appears in ``keys``, rewriting ONLY
    the data files that actually contain an affected key — the Iceberg
    copy-on-write ``DELETE FROM t WHERE url IN (...)`` shape.  At
    100 TB a takedown list of a few thousand urls touches a handful of
    files; rewriting the whole table (what a naive anti-join +
    overwrite-commit does) would be a full-table write for a 0.001%
    change.

    Plan: one scan of the current snapshot projecting ``(key,
    _metadata.file_path)`` — column-pruned to the key column — semi-
    joined against the (broadcast) takedown list to find the affected
    files; those files' surviving rows are rewritten as new data files
    and the commit manifest carries (untouched files + rewritten
    files).  Untouched files never read their payload columns, never
    rewrite.  Earlier snapshots still reference the old files, so the
    deleted rows remain time-travel readable until ``expire_snapshots``
    — true erasure requires an expire pass after the delete commit, which
    is exactly Iceberg's documented GDPR procedure.

    Returns ``(snapshot, n_deleted, n_files_rewritten)``.  When no row
    matches, no commit is made and the current snapshot is returned
    unchanged.
    """
    v = current_version(root)
    if v == 0:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    snap = load_snapshot(root, v)
    del_keys = F.broadcast(keys.select(key).distinct())

    # _metadata.file_path is a file:* URI; manifests store plain paths.
    norm = F.regexp_replace(F.col("_metadata.file_path"),
                            "^file:(//)?", "")
    keyed = (spark.read.parquet(*snap.files)
             .select(F.col(key), norm.alias("_f")))
    affected = sorted(
        r["_f"] for r in
        keyed.join(del_keys, key, "left_semi").select("_f")
        .distinct().collect())
    if not affected:
        return snap, 0, 0

    victims = spark.read.parquet(*affected)
    n_before = victims.count()
    survivors = victims.join(del_keys, key, "left_anti")
    affected_set = set(affected)
    untouched = [f for f in snap.files if f not in affected_set]
    new_snap = _commit(root, survivors, "delete", base_files=untouched)
    untouched_set = set(untouched)
    rewritten = [f for f in new_snap.files if f not in untouched_set]
    n_surv = (spark.read.parquet(*rewritten).count() if rewritten else 0)
    return new_snap, n_before - n_surv, len(affected)
