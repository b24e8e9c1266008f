# -*- coding: utf-8 -*-
"""Golden fixtures: pinned hashes + the Spark golden-comparison join.

Three layers (SURVEY.md §5.2):
1. standalone extractors reproduce the committed golden hashes
2. the Spark pipeline produces byte-identical markdown per url
   (golden join: 100% match, no missing urls)
3. re-running is idempotent
"""

import json
import os

import pytest

from document_convert_to__markdown_spark.data.fixtures import (
    fixture_pages,
    golden_records,
)

HERE = os.path.dirname(__file__)


def load_pinned():
    with open(os.path.join(HERE, "golden_fixtures.json")) as f:
        return {r["url"]: r for r in json.load(f)}


def test_standalone_extractors_match_pinned_hashes():
    pinned = load_pinned()
    records = golden_records()
    assert len(records) == len(pinned)
    for rec in records:
        pin = pinned[rec["url"]]
        assert rec["golden_sha256"] == pin["golden_sha256"], rec["url"]
        assert rec["n_images"] == pin["n_images"], rec["url"]
        assert rec["format"] == pin["format"], rec["url"]


@pytest.mark.spark
def test_spark_golden_comparison_join(spark):
    from document_convert_to__markdown_spark.pipeline.golden import golden_compare
    from document_convert_to__markdown_spark.pipeline.job import run_extraction
    from document_convert_to__markdown_spark.pipeline.schemas import (
        GOLDEN_SCHEMA,
        PAGES_SCHEMA,
    )

    pages_rows = [
        (url, None, payload, "", "en") for url, payload in fixture_pages()
    ]
    pages = spark.createDataFrame(pages_rows, schema=PAGES_SCHEMA)

    golden_rows = [
        (r["url"], r["golden_md"], r["golden_sha256"], r["n_images"], r["format"])
        for r in golden_records()
    ]
    golden = spark.createDataFrame(golden_rows, schema=GOLDEN_SCHEMA)

    plan = run_extraction(pages, partitions=8)
    # The 'empty' fixture is skipped by design; exclude non-ok statuses
    # the same way the reference excludes failures from golden checks.
    results = plan.results.filter("status = 'ok'")
    golden_ok = golden.filter("format <> 'empty'")

    report = golden_compare(results, golden_ok)
    assert report.n_hash_mismatch == 0, report.mismatches.collect()
    assert report.n_missing == 0
    assert report.passed
