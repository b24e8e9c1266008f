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
