"""Connected components + composed near-dup pipeline."""

import pytest
from pyspark.sql import functions as F


def _cc(spark, pairs):
    from document_convert_to__markdown_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(pairs, "a long, b long")
    return {r["node"]: r["component"]
            for r in connected_components(edges).collect()}


def test_chain_converges_to_single_component(spark):
    # path graph 1-2-3-4-5-6: diameter > 1 forces multiple rounds
    comp = _cc(spark, [(i, i + 1) for i in range(1, 6)])
    assert set(comp.values()) == {1}
    assert len(comp) == 6


def test_two_components_stay_separate(spark):
    comp = _cc(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == comp[12] == 10


def test_bridged_clusters_merge(spark):
    # two cliques joined by one bridge edge → one component
    comp = _cc(spark, [(1, 2), (1, 3), (10, 11), (10, 12), (3, 10)])
    assert set(comp.values()) == {1}


def test_neardup_pipeline_drops_planted_dups(spark):
    from document_convert_to__markdown_spark.operators.dedup import (
        neardup_pipeline,
    )

    base = ("large scale web corpora require careful near duplicate "
            "removal before language model training begins " * 5)
    rows = [
        (0, base, "en", "s", len(base)),
        (1, base.replace("careful", "serious", 1), "en", "s", len(base)),
        (2, "a totally different document about spark physical plans "
            "and shuffle exchanges in adaptive execution " * 5, "en", "s", 400),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    kept = neardup_pipeline(docs, jaccard_threshold=0.8)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {0, 2}  # 1 is a near-dup of 0; min doc_id survives


def test_nonconvergence_raises_not_silently_splits(spark):
    """A component with diameter > max_iter must raise (strict) or warn,
    never return split labels quietly (ADVICE.md round 1)."""
    import warnings

    import pytest as _pytest

    from document_convert_to__markdown_spark.operators.graph import (
        connected_components,
    )

    # path graph 1-2-...-12: diameter 11 > max_iter=3
    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 12)],
                                  "a long, b long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=3).collect()

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = connected_components(edges, max_iter=3, strict=False)
        assert labels.count() == 12
    assert any("did not converge" in str(w.message) for w in caught)
