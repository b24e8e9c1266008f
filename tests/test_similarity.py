"""ANN operators: brute-force ground truth vs LSH / IVF recall."""

import pytest

K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return list(emb.filter("vec_id = 0").first()["embedding"])


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_brute_force_topk_is_sorted(emb, qvec):
    from document_convert_to__markdown_spark.operators.similarity import (
        brute_force_topk,
    )

    rows = brute_force_topk(emb.filter("vec_id <> 0"), qvec, k=K).collect()
    assert len(rows) == K
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)


@pytest.mark.parametrize("variant", ["lsh", "ivf"])
def test_ann_recall_vs_brute_force(emb, qvec, variant):
    from document_convert_to__markdown_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
        lsh_ann_topk,
    )

    base = emb.filter("vec_id <> 0")
    truth = set(_ids(brute_force_topk(base, qvec, k=K)))
    fn = lsh_ann_topk if variant == "lsh" else ivf_ann_topk
    approx = set(_ids(fn(base, qvec, k=K)))
    recall = len(truth & approx) / K
    # Single-probe LSH / 4-probe IVF on clustered synthetic embeddings:
    # both should keep at least half the true neighbors.
    assert recall >= 0.5, f"{variant} recall@{K} = {recall}"


def test_trained_ivf_on_clustered_data(spark):
    """Spherical k-means IVF earns its keep on genuinely clustered
    vectors: high recall at a small probe fraction."""
    import numpy as np

    from document_convert_to__markdown_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((8, 64)) * 5
    vecs = np.vstack([
        centers[i % 8] + rng.standard_normal(64) * 0.3
        for i in range(400)
    ]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, int(i % 8), vecs[i].tolist()) for i in range(400)],
        "vec_id long, label int, embedding array<float>",
    )
    query = (centers[2] + rng.standard_normal(64) * 0.3).tolist()

    truth = {r["vec_id"]
             for r in brute_force_topk(df, query, k=K).collect()}
    cents = train_ivf_centroids(df, n_centroids=8)
    got = {r["vec_id"]
           for r in ivf_ann_topk(df, query, k=K, nprobe=2,
                                 centroids=cents).collect()}
    # 2 of 8 cells probed (25% scan) must retain >=90% of neighbors
    assert len(truth & got) / K >= 0.9


def test_ivf_prunes_scan(emb, qvec):
    from document_convert_to__markdown_spark.operators.similarity import (
        _N_CENTROIDS,
        _ivf_cell,
    )

    cells = emb.withColumn("cell", _ivf_cell("embedding"))
    n_cells = cells.select("cell").distinct().count()
    # The quantizer spreads the corpus across many cells — the nprobe=4
    # filter really does prune (reads < half the corpus).
    assert n_cells > _N_CENTROIDS // 2
    from pyspark.sql import functions as F
    biggest = (cells.groupBy("cell").count()
               .agg(F.max("count")).first()[0])
    assert biggest < emb.count() / 2


def test_neardup_chunked_matmul_matches_single_chunk(spark):
    """The bounded-memory chunked path must produce exactly the pairs the
    one-shot dense matmul did, on a block far wider than the chunk
    (VERDICT.md round 1 scale-killer #1)."""
    import numpy as np

    from document_convert_to__markdown_spark.operators.similarity import (
        neardup_pairs_cosine,
    )

    rng = np.random.RandomState(3)
    n = 600  # one label → one oversized block
    base = rng.standard_normal((6, 64))
    vecs = base[rng.randint(0, 6, n)] + 0.05 * rng.standard_normal((n, 64))
    rows = [(int(i), "single", [float(x) for x in vecs[i]])
            for i in range(n)]
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>")

    def pairset(df):
        return {(r["vec_a"], r["vec_b"], r["cosine"]) for r in df.collect()}

    chunked = pairset(neardup_pairs_cosine(emb, threshold=0.9,
                                           chunk_rows=64))
    one_shot = pairset(neardup_pairs_cosine(emb, threshold=0.9,
                                            chunk_rows=10**9))
    exact = pairset(neardup_pairs_cosine(emb, threshold=0.9, block=False))
    assert chunked == one_shot == exact
    assert len(chunked) > 100  # the threshold actually bites


def test_neardup_sub_bucket_is_subset(spark):
    """LSH sub-bucketing bounds group width; its pairs are a subset of
    the exact within-label pairs (recall tradeoff, no false positives)."""
    import numpy as np

    from document_convert_to__markdown_spark.operators.similarity import (
        neardup_pairs_cosine,
    )

    rng = np.random.RandomState(4)
    vecs = rng.standard_normal((200, 64))
    rows = [(int(i), "L", [float(x) for x in vecs[i]]) for i in range(200)]
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>")
    full = {(r["vec_a"], r["vec_b"])
            for r in neardup_pairs_cosine(emb, threshold=0.3).collect()}
    sub = {(r["vec_a"], r["vec_b"])
           for r in neardup_pairs_cosine(emb, threshold=0.3,
                                         sub_bucket=True).collect()}
    assert sub <= full


def test_neardup_auto_buckets_mega_label_only(spark):
    """Default (auto) mode: labels at/under the width cap keep exact
    within-label pairs; a mega-label auto-engages LSH sub-buckets so
    per-group compute is bounded by construction (VERDICT r2 #3)."""
    import numpy as np

    from document_convert_to__markdown_spark.operators.similarity import (
        neardup_pairs_cosine,
    )

    rng = np.random.RandomState(5)
    rows = [(int(i), "mega", [float(x) for x in v])
            for i, v in enumerate(rng.standard_normal((200, 64)))]
    rows += [(1000 + int(i), "small", [float(x) for x in v])
             for i, v in enumerate(rng.standard_normal((30, 64)))]
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>")

    def pairs(df):
        return {(r["vec_a"], r["vec_b"]) for r in df.collect()}

    auto = pairs(neardup_pairs_cosine(emb, threshold=0.3,
                                      auto_bucket_threshold=50))
    exact = pairs(neardup_pairs_cosine(emb, threshold=0.3,
                                       sub_bucket=False))
    bucketed = pairs(neardup_pairs_cosine(emb, threshold=0.3,
                                          sub_bucket=True))
    small_ids = {r[0] for r in rows if r[1] == "small"}

    def side(ps, ids):
        return {p for p in ps if p[0] in ids}

    # small label: exact pairs survive untouched; mega label: exactly
    # the sub-bucketed (bounded-width) pairs.
    assert side(auto, small_ids) == side(exact, small_ids)
    mega_ids = {r[0] for r in rows if r[1] == "mega"}
    assert side(auto, mega_ids) == side(bucketed, mega_ids)
    assert side(bucketed, mega_ids) < side(exact, mega_ids)  # strictly pruned

    # the mega label really was subdivided: no LSH bucket holds the
    # whole label, so no grouped-map call sees an O(label²) block.
    from document_convert_to__markdown_spark.operators.similarity import (
        _lsh_bucket,
    )
    widths = (emb.filter("label = 'mega'")
              .withColumn("bucket", _lsh_bucket("embedding"))
              .groupBy("bucket").count().agg({"count": "max"}).first()[0])
    assert widths < 200


def test_tfidf_cosine_pairs_pruning_and_ranking(spark):
    """Near-identical docs score above unrelated ones; stop-terms over
    max_df are pruned from the inverted index before the self-join."""
    from document_convert_to__markdown_spark.operators.similarity import (
        tfidf_cosine_pairs,
    )

    rows = [
        (1, "the spark engine shuffles data across the cluster"),
        (2, "the spark engine shuffles data across the network"),  # ~doc1
        (3, "the cat sat on the mat with the hat"),                # unrelated
        (4, "completely different vocabulary entirely here now"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r["doc_a"], r["doc_b"]): r["cosine"]
             for r in tfidf_cosine_pairs(docs, threshold=0.0,
                                         max_df=3).collect()}
    assert pairs[(1, 2)] > 0.5                  # near-dup pair dominates
    assert pairs[(1, 2)] > pairs.get((1, 3), 0.0)
    assert (1, 4) not in pairs                  # zero shared terms

    # "the" appears in 3 docs: max_df=2 prunes it from the index
    pruned = {(r["doc_a"], r["doc_b"]): r["cosine"]
              for r in tfidf_cosine_pairs(docs, threshold=0.0,
                                          max_df=2).collect()}
    assert (1, 3) not in pruned  # only shared term was the stop-term
    assert pruned[(1, 2)] > 0.5
