"""Snapshot-manifest table: atomic commits, time travel, crash
invisibility, idempotent overwrite, snapshot expiry."""

import os

import pytest

from document_convert_to__markdown_spark.sources import snapshot as snap


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def test_append_and_time_travel(spark, root):
    s1 = snap.commit_append(_df(spark, 0, 10), root)
    s2 = snap.commit_append(_df(spark, 10, 30), root)
    assert (s1.version, s2.version) == (1, 2)
    assert snap.read(spark, root).count() == 30
    assert snap.read(spark, root, version=1).count() == 10  # time travel
    assert [s.op for s in snap.versions(root)] == ["append", "append"]


def test_overwrite_replaces_visible_set(spark, root):
    snap.commit_append(_df(spark, 0, 10), root)
    snap.commit_overwrite(_df(spark, 100, 105), root)
    cur = snap.read(spark, root)
    assert cur.count() == 5
    assert cur.agg({"k": "min"}).first()[0] == 100
    # previous snapshot still readable until expired
    assert snap.read(spark, root, version=1).count() == 10


def test_uncommitted_files_are_invisible(spark, root):
    snap.commit_append(_df(spark, 0, 10), root)
    # simulate a crashed writer: data files on disk, no manifest
    orphan_dir = os.path.join(root, "data", "c99999")
    _df(spark, 500, 600).write.parquet(orphan_dir)
    assert snap.read(spark, root).count() == 10  # orphans never read


def test_expire_snapshots_deletes_dead_files(spark, root):
    snap.commit_append(_df(spark, 0, 10), root)
    snap.commit_overwrite(_df(spark, 50, 55), root)
    n_deleted = snap.expire_snapshots(root, keep_last=1)
    assert n_deleted > 0
    assert snap.read(spark, root).count() == 5  # current unaffected
    with pytest.raises(FileNotFoundError):
        snap.load_snapshot(root, 1)


def test_read_empty_table_raises(spark, root):
    with pytest.raises(FileNotFoundError):
        snap.read(spark, root)


def test_compact_bin_packs_small_files(spark, root):
    # 4 append commits x 4 partitions = 16 tiny files
    for lo in range(0, 400, 100):
        snap.commit_append(_df(spark, lo, lo + 100).repartition(4), root)
    before = snap.load_snapshot(root, snap.current_version(root))
    assert len(before.files) == 16

    s = snap.compact(spark, root, small_file_bytes=1 << 20,
                     target_file_bytes=1 << 20)
    assert s is not None and s.op == "compact"
    after = snap.load_snapshot(root, snap.current_version(root))
    assert len(after.files) < len(before.files)

    # identical contents, atomically flipped; old snapshot still readable
    cur = snap.read(spark, root)
    assert cur.count() == 400
    assert cur.agg({"k": "sum"}).first()[0] == sum(range(400))
    assert snap.read(spark, root, version=before.version).count() == 400

    # expire now collects the superseded small files
    deleted = snap.expire_snapshots(root, keep_last=1)
    assert deleted >= len(before.files) - len(after.files) > 0
    assert snap.read(spark, root).count() == 400


def test_compact_noop_when_nothing_small(spark, root):
    snap.commit_append(_df(spark, 0, 10).coalesce(1), root)
    assert snap.compact(spark, root, small_file_bytes=1) is None
