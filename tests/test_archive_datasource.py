"""Spark 4 Python DataSource front door for archive bundles
(read: bundle explode; write: two-phase-commit tar-shard export)."""

import io
import json
import os
import tarfile
import zipfile

import pytest

from document_convert_to__markdown_spark.sources.archive import (
    read_archive_docs,
)
from document_convert_to__markdown_spark.sources.archive_datasource import (
    ArchiveDataSourceReader,
    ShardCommitMessage,
    TarShardWriter,
    register,
)


def _zip_bytes(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def _tar_bytes(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


@pytest.fixture()
def bundle_dir(tmp_path):
    (tmp_path / "a.zip").write_bytes(
        _zip_bytes([("x.html", b"<p>one</p>"), ("y.txt", b"two")]))
    (tmp_path / "b.tar").write_bytes(_tar_bytes([("z.bin", b"\x00\x01")]))
    return str(tmp_path)


class TestReader:
    def test_format_read_roundtrip(self, spark, bundle_dir):
        register(spark)
        df = spark.read.format("archive").load(bundle_dir)
        assert df.columns == ["url", "archive", "member", "html",
                              "size", "status"]
        got = {(r["archive"], r["member"]): bytes(r["html"])
               for r in df.collect()}
        assert got == {("a.zip", "x.html"): b"<p>one</p>",
                       ("a.zip", "y.txt"): b"two",
                       ("b.tar", "z.bin"): b"\x00\x01"}

    def test_one_partition_per_bundle(self, spark, bundle_dir):
        reader = ArchiveDataSourceReader({"path": bundle_dir})
        parts = reader.partitions()
        assert sorted(p.path.rsplit("/", 1)[-1] for p in parts) == \
            ["a.zip", "b.tar"]
        register(spark)
        df = spark.read.format("archive").load(bundle_dir)
        assert df.rdd.getNumPartitions() == 2

    def test_identical_to_mapinpandas_path(self, spark, bundle_dir):
        register(spark)
        via_ds = sorted(map(tuple,
                            spark.read.format("archive").load(bundle_dir)
                            .collect()))
        via_mip = sorted(map(tuple,
                             read_archive_docs(spark, bundle_dir)
                             .collect()))
        assert via_ds == via_mip

    def test_empty_dir_plans_empty_relation(self, spark, tmp_path):
        register(spark)
        df = spark.read.format("archive").load(str(tmp_path))
        assert df.count() == 0


class TestWriter:
    def test_write_commit_and_read_back(self, spark, tmp_path):
        register(spark)
        out = str(tmp_path / "shards")
        df = spark.createDataFrame(
            [(f"u{i:02d}", f"body-{i}".encode()) for i in range(30)],
            "url string, html binary")
        df.write.format("archive").option("target_bytes", 100) \
            .mode("overwrite").save(out)
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        man = json.load(open(os.path.join(out, "_manifest.json")))
        assert man["n_members"] == 30
        assert sorted(man["shards"]) == sorted(
            f for f in os.listdir(out) if f.endswith(".tar"))
        back = spark.read.format("archive").load(out)
        got = {r["member"]: bytes(r["html"]) for r in back.collect()}
        assert got == {f"u{i:02d}": f"body-{i}".encode()
                       for i in range(30)}

    def test_overwrite_clears_previous_export(self, spark, tmp_path):
        register(spark)
        out = str(tmp_path / "shards2")
        big = spark.createDataFrame(
            [(f"u{i}", b"x") for i in range(20)],
            "url string, html binary")
        big.write.format("archive").mode("overwrite").save(out)
        small = spark.createDataFrame([("only", b"y")],
                                      "url string, html binary")
        small.write.format("archive").mode("overwrite").save(out)
        man = json.load(open(os.path.join(out, "_manifest.json")))
        assert man["n_members"] == 1
        back = spark.read.format("archive").load(out)
        assert back.count() == 1

    def test_abort_sweeps_staging_incl_unreported_partials(self, tmp_path):
        out = str(tmp_path / "shards3")
        w = TarShardWriter({"path": out}, overwrite=False)
        stg = os.path.join(out, "_staging")
        # one reported shard, one partial from a task that died
        # mid-write and never returned a commit message
        open(os.path.join(stg, "aaaa-0000.tar"), "wb").write(b"x")
        open(os.path.join(stg, "bbbb-0000.tar"), "wb").write(b"partial")
        w.abort([ShardCommitMessage(shards=["aaaa-0000.tar"]), None])
        assert os.listdir(stg) == []
        # nothing was ever published
        assert [f for f in os.listdir(out) if f != "_staging"] == []

    def test_crashed_task_partial_never_visible_to_readers(
            self, spark, tmp_path):
        register(spark)
        out = str(tmp_path / "shards4")
        df = spark.createDataFrame([("u", b"x")],
                                   "url string, html binary")
        df.write.format("archive").mode("overwrite").save(out)
        # simulate a later crashed attempt's partial staging debris
        open(os.path.join(out, "_staging", "dead-0000.tar"),
             "wb").write(b"garbage")
        back = spark.read.format("archive").load(out)
        assert back.count() == 1          # staging is invisible
        twin = read_archive_docs(spark, out, path_glob_filter="*.tar")
        assert twin.count() == 1

    def test_append_mode_preserves_prior_export(self, spark, tmp_path):
        register(spark)
        out = str(tmp_path / "shards5")
        spark.createDataFrame([(f"a{i}", b"1") for i in range(3)],
                              "url string, html binary")             .write.format("archive").mode("overwrite").save(out)
        spark.createDataFrame([(f"b{i}", b"2") for i in range(2)],
                              "url string, html binary")             .write.format("archive").mode("append").save(out)
        man = json.load(open(os.path.join(out, "_manifest.json")))
        assert man["n_members"] == 5
        back = spark.read.format("archive").load(out)
        members = sorted(r["member"] for r in back.collect())
        assert members == ["a0", "a1", "a2", "b0", "b1"]

    def test_missing_literal_path_raises(self):
        with pytest.raises(ValueError, match="not found"):
            ArchiveDataSourceReader({"path": "/nonexistent/bundels"})


class TestStreamWriter:
    def test_two_batches_commit_and_read_back(self, spark, tmp_path):
        register(spark)
        src = str(tmp_path / "in")
        out = str(tmp_path / "shards_stream")
        cp = str(tmp_path / "cp")
        os.makedirs(src)

        def drain():
            stream = (spark.readStream
                      .schema("url string, html binary").parquet(src)
                      .writeStream.format("archive")
                      .option("path", out)
                      .option("checkpointLocation", cp)
                      .option("target_bytes", 200)
                      .trigger(availableNow=True).start())
            assert stream.awaitTermination(120)

        spark.createDataFrame(
            [(f"a{i}", f"batch1-{i}".encode()) for i in range(12)],
            "url string, html binary").write.mode("append").parquet(src)
        drain()
        spark.createDataFrame(
            [(f"b{i}", f"batch2-{i}".encode()) for i in range(5)],
            "url string, html binary").write.mode("append").parquet(src)
        drain()

        manifests = sorted(f for f in os.listdir(out)
                           if f.startswith("manifest-"))
        assert len(manifests) == 2
        total = sum(json.load(open(os.path.join(out, m)))["n_members"]
                    for m in manifests)
        assert total == 17
        # every committed shard is batch-named; staging left empty
        tars = [f for f in os.listdir(out) if f.endswith(".tar")]
        assert tars and all(f.startswith("batch-") for f in tars)
        assert os.listdir(os.path.join(out, "_staging")) == []

        back = spark.read.format("archive").load(out)
        got = {r["member"]: bytes(r["html"])
               for r in back.filter("status='ok'").collect()}
        want = {f"a{i}": f"batch1-{i}".encode() for i in range(12)}
        want.update({f"b{i}": f"batch2-{i}".encode() for i in range(5)})
        assert got == want

    def test_replayed_batch_commits_idempotently(self, tmp_path):
        from document_convert_to__markdown_spark.sources.archive_datasource \
            import TarShardStreamWriter

        out = str(tmp_path / "replay")
        w = TarShardStreamWriter({"path": out}, overwrite=False)
        # attempt 1 of batch 7 committed two shards
        for tok in ("aaaa", "bbbb"):
            open(os.path.join(out, "_staging", f"{tok}-0000.tar"),
                 "wb").write(b"x")
        w.commit([ShardCommitMessage(shards=["aaaa-0000.tar"],
                                     n_members=1, raw_bytes=1),
                  ShardCommitMessage(shards=["bbbb-0000.tar"],
                                     n_members=1, raw_bytes=1)], 7)
        # replay of batch 7 (different staging names) must replace,
        # not duplicate
        open(os.path.join(out, "_staging", "cccc-0000.tar"),
             "wb").write(b"y")
        w.commit([ShardCommitMessage(shards=["cccc-0000.tar"],
                                     n_members=1, raw_bytes=1)], 7)
        tars = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
        assert tars == ["batch-000007-0000.tar"]
        man = json.load(open(os.path.join(out, "manifest-000007.json")))
        assert man["shards"] == tars and man["n_members"] == 1
