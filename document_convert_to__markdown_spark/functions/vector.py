"""Vector math over ``array<float>`` columns — pure Catalyst expressions.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside whole-stage
codegen; no Python boundary, no UDF (the "stay JVM-side" rule).  Elements
are cast to double before multiplication so Spark and the DuckDB oracle
accumulate in the same precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
