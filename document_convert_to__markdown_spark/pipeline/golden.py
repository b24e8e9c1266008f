"""Golden-file comparison join (north_star requirement).

The reference's pytest fixture expectations, replayed as a Spark join
(SURVEY.md §5.2 items 2-3): results ⋈ golden on url, comparing
``sha2(markdown)`` against the stored golden hash, plus anti-joins in
both directions so missing/extra urls surface explicitly.

The golden side is a small fixture table → ``F.broadcast`` keeps the
join shuffle-free at any results scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class GoldenReport:
    n_golden: int
    n_matched: int
    n_hash_mismatch: int
    n_missing: int          # golden urls absent from results
    n_unexpected_failed: int
    mismatches: DataFrame   # (url, md_sha256, golden_sha256)

    @property
    def passed(self) -> bool:
        return (self.n_hash_mismatch == 0 and self.n_missing == 0
                and self.n_matched == self.n_golden)


def golden_compare(results: DataFrame, golden: DataFrame) -> GoldenReport:
    """Compare extraction results to golden fixtures; 100% match required."""
    g = F.broadcast(golden.select("url", "golden_sha256"))

    joined = results.join(g, "url", "inner").select(
        "url", "md_sha256", "golden_sha256", "status"
    )
    joined = joined.cache()
    try:
        n_matched = joined.filter(
            F.col("md_sha256") == F.col("golden_sha256")
        ).count()
        mismatches = joined.filter(
            (F.col("md_sha256").isNull())
            | (F.col("md_sha256") != F.col("golden_sha256"))
        )
        n_mismatch = mismatches.count()
        n_unexpected_failed = joined.filter(F.col("status") != "ok").count()
        missing = golden.join(results.select("url"), "url", "left_anti")
        n_missing = missing.count()
        n_golden = golden.count()
        return GoldenReport(
            n_golden=n_golden,
            n_matched=n_matched,
            n_hash_mismatch=n_mismatch,
            n_missing=n_missing,
            n_unexpected_failed=n_unexpected_failed,
            mismatches=mismatches,
        )
    finally:
        joined.unpersist()
