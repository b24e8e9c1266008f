"""Spark 4 Python DataSource front door for WET archives."""

import pytest

from document_convert_to__markdown_spark.sources.warc import write_wet
from document_convert_to__markdown_spark.sources.wet_datasource import (
    WetDataSourceReader,
    register,
)

ROWS = [(f"https://ds{i}.org/p", f"datasource text {i}") for i in range(40)]


@pytest.fixture()
def wet_dir(tmp_path):
    with open(tmp_path / "a.wet.gz", "wb") as fh:
        write_wet(ROWS[:25], fh, compress=True)
    with open(tmp_path / "b.wet", "wb") as fh:
        write_wet(ROWS[25:], fh, compress=False)
    return str(tmp_path)


def test_format_read_roundtrip(spark, wet_dir):
    register(spark)
    df = spark.read.format("wet").load(wet_dir)
    assert df.columns == ["url", "warc_ts", "text"]
    got = sorted((r["url"], r["text"]) for r in df.collect())
    assert got == sorted(ROWS)


def test_one_partition_per_file(spark, wet_dir):
    reader = WetDataSourceReader({"path": wet_dir})
    parts = reader.partitions()
    assert len(parts) == 2
    assert [p.path.rsplit("/", 1)[-1] for p in parts] == ["a.wet.gz",
                                                          "b.wet"]
    register(spark)
    df = spark.read.format("wet").load(wet_dir)
    assert df.rdd.getNumPartitions() == 2


def test_identical_to_mapinpandas_path(spark, wet_dir):
    from document_convert_to__markdown_spark.sources.warc import (
        read_wet_pages,
    )

    register(spark)
    via_ds = sorted(map(tuple, spark.read.format("wet").load(wet_dir)
                        .collect()))
    via_mip = sorted(map(tuple, read_wet_pages(spark, wet_dir).collect()))
    assert via_ds == via_mip


def test_column_pruning_reaches_scan(spark, wet_dir):
    # Selecting one column must plan a one-column scan (the Python
    # data source hands Spark only requested columns post-pruning).
    register(spark)
    df = spark.read.format("wet").load(wet_dir).select("url")
    assert df.columns == ["url"]
    assert df.count() == len(ROWS)


def test_empty_dir_yields_empty_relation(spark, tmp_path):
    register(spark)
    df = spark.read.format("wet").load(str(tmp_path / "nothing"))
    assert df.count() == 0


def test_missing_path_raises(spark):
    register(spark)
    with pytest.raises(Exception):
        spark.read.format("wet").load().collect()
