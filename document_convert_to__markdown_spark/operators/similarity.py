"""Similarity search over the ``embeddings`` table (``array<float>``).

- ``brute_force_topk``: exact cosine top-k — broadcast the (tiny) query
  vector, JVM-side ``zip_with``/``aggregate`` arithmetic, one pass, no
  Python.  The correctness baseline.
- ``neardup_pairs_cosine``: all-pairs above a threshold, blocked by an
  LSH sign-bucket so the self-join never goes quadratic.
- ``lsh_ann_topk``: the scale path — random-hyperplane signatures bucket
  the corpus; only the query's bucket (± probing) is scored.  Recall<1
  by design; verified against brute force in tests.

Random hyperplanes are seeded constants (deterministic across runs and
executors — same reason the corpus synthesizer is seeded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import IntegerType

from ..functions.vector import cosine_similarity, dot, l2_norm

_DIM = 64
# 6 planes → 64 buckets: sized so sandbox-scale corpora (~10²-10⁵ vectors)
# keep several vectors per bucket.  At 10⁹+ vectors this would be 16-24
# planes (bucket count ~n/1000) — the knob trades recall for pruning.
_N_PLANES = 6
_planes = np.random.RandomState(7).standard_normal((_N_PLANES, _DIM))


def brute_force_topk(embeddings: DataFrame, query_vec: list[float],
                     k: int = 10) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query is a literal array → constant-folded; the scan is a single
    projection + TakeOrderedAndProject (no shuffle beyond the top-k).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        embeddings
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), q), 4).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def neardup_pairs_cosine(embeddings: DataFrame, threshold: float = 0.8,
                         block: bool = True) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold.

    Blocking: label equality (cheap stand-in for an IVF/LSH bucket at
    scale) keeps the self-join from exploding; set ``block=False`` for
    the exact small-data variant.
    """
    # Pre-project the L2 norm per row: computed n times, not n² times —
    # the join then only evaluates the dot product per pair.
    normed = embeddings.select(
        "vec_id", "label", "embedding", l2_norm("embedding").alias("norm")
    )
    a = normed.alias("a")
    b = normed.alias("b")
    cond = [F.col("a.vec_id") < F.col("b.vec_id")]
    if block:
        cond.append(F.col("a.label") == F.col("b.label"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.norm") * F.col("b.norm")),
                4,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


@pandas_udf(IntegerType())
def _lsh_bucket(embs: pd.Series) -> pd.Series:
    """Random-hyperplane sign bucket (16-bit) per embedding — Arrow batch."""
    mat = np.vstack(embs.to_numpy())
    signs = (mat @ _planes.T) > 0
    buckets = (signs * (1 << np.arange(_N_PLANES))).sum(axis=1)
    return pd.Series(buckets.astype(np.int32))


def lsh_ann_topk(embeddings: DataFrame, query_vec: list[float],
                 k: int = 10) -> DataFrame:
    """ANN top-k: score only vectors in the query's hyperplane bucket.

    At 10^9+ vectors the bucket predicate prunes the scan to ~n/2^16;
    multi-probe (flipping low-margin bits) would trade compute for
    recall — kept single-probe here for determinism.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    q_bucket = int(((q @ _planes.T > 0) * (1 << np.arange(_N_PLANES))).sum())

    bucketed = embeddings.withColumn("bucket", _lsh_bucket("embedding"))
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        bucketed
        .filter(F.col("bucket") == F.lit(q_bucket))
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), qcol), 4).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )
