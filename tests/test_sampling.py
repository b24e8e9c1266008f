"""Dataset split / stratified sampling: determinism and proportions."""

from pyspark.sql import functions as F

from document_convert_to__markdown_spark.operators.sampling import (
    dataset_split,
    stratified_sample,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_split_is_pure_function_of_content(spark):
    docs = _docs(spark)
    a = dataset_split(docs).select("doc_id", "split")
    b = dataset_split(docs).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0  # identical across runs

    # every doc assigned exactly one split; proportions near 80/10/10
    counts = {r["split"]: r["count"]
              for r in dataset_split(docs).groupBy("split").count().collect()}
    n = sum(counts.values())
    assert n == docs.count()
    assert 0.7 < counts["train"] / n < 0.9
    assert 0.04 < counts["val"] / n < 0.18
    assert 0.04 < counts["test"] / n < 0.18


def test_split_stable_under_corpus_growth(spark):
    """Adding documents must not move existing ones between splits —
    the no-leakage property random splits lack."""
    docs = _docs(spark)
    half = docs.filter("doc_id < 250")
    full_assign = {r["doc_id"]: r["split"] for r in
                   dataset_split(docs).select("doc_id", "split").collect()}
    half_assign = {r["doc_id"]: r["split"] for r in
                   dataset_split(half).select("doc_id", "split").collect()}
    assert all(full_assign[k] == v for k, v in half_assign.items())


def test_export_training_jsonl_roundtrip(spark, tmp_path):
    import json

    from document_convert_to__markdown_spark.operators.sampling import (
        export_training_jsonl,
    )

    docs = dataset_split(_docs(spark).filter("doc_id < 100"))
    out = str(tmp_path / "export")
    export_training_jsonl(docs, out, compress=True)

    back = spark.read.text(f"{out}/split=train/")
    rows = [json.loads(r["value"]) for r in back.collect()]
    assert rows and all(r["split"] == "train" for r in rows)
    # full roundtrip: every exported doc_id is a train-split doc_id
    train_ids = {r["doc_id"] for r in
                 docs.filter("split = 'train'").collect()}
    assert {r["doc_id"] for r in rows} == train_ids


def test_stratified_sample_ratios_and_determinism(spark):
    docs = _docs(spark)
    fr = {"en": 0.5, "zh": 1.0, "es": 0.2, "de": 0.2, "fr": 0.2}
    s1 = stratified_sample(docs, fr, seed=7)
    s2 = stratified_sample(docs, fr, seed=7)
    assert s1.exceptAll(s2).count() == 0  # same seed, same rows

    got = {r["lang"]: r["count"]
           for r in s1.groupBy("lang").count().collect()}
    base = {r["lang"]: r["count"]
            for r in docs.groupBy("lang").count().collect()}
    assert got["zh"] == base["zh"]  # fraction 1.0 keeps everything
    assert 0.3 < got["en"] / base["en"] < 0.7


def test_pack_sequences_equals_global_window_any_range_width(spark):
    """The two-phase driver-prefix packing must equal the naive global
    per-language cumulative window for every range width, including
    widths that split languages into many ranges."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from document_convert_to__markdown_spark.operators.sampling import (
        pack_sequences,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    w = Window.partitionBy("lang").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    start = F.sum("n_chars").over(w) - F.col("n_chars")
    naive = docs.select(
        "doc_id", "lang", F.col("n_chars").alias("tokens"),
        F.floor(start / 512).alias("seq_id"),
        (start % 512).alias("offset"))
    want = sorted(map(tuple, naive.collect()))
    for width in (10, 100, 10**9):
        got = sorted(map(tuple, pack_sequences(
            docs, seq_len=512, range_width=width).collect()))
        assert got == want, width


def test_pack_sequences_stream_is_gapless(spark):
    """Consecutive docs in one language tile the token stream with no
    gaps or overlaps: next start == previous start + previous tokens."""
    from pyspark.sql import functions as F

    from document_convert_to__markdown_spark.operators.sampling import (
        pack_sequences,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_sequences(docs, seq_len=256, range_width=7)
    rows = sorted(
        ((r["lang"], r["doc_id"], r["seq_id"] * 256 + r["offset"],
          r["tokens"]) for r in out.collect()))
    pos = {}
    for lang, _doc, start, tokens in rows:
        assert start == pos.get(lang, 0), (lang, start)
        pos[lang] = start + tokens


def test_temperature_resample_flattens_and_clamps(spark):
    from document_convert_to__markdown_spark.operators.sampling import (
        temperature_resample,
    )

    # 400 'en' docs vs 20 'is' docs: alpha=0.3 must give the
    # low-resource language a strictly higher keep rate, and a small
    # enough budget keeps both rates < 1.
    docs = spark.range(420).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 400, F.lit("en")).otherwise(F.lit("is"))
        .alias("lang"),
    )
    kept = temperature_resample(docs, alpha=0.3, budget=100)
    rates = {r["lang"]: r["rate"] for r in
             kept.groupBy("lang").agg(F.first("keep_rate").alias("rate"))
             .collect()}
    assert rates["is"] > rates["en"]
    assert rates["en"] < 1.0

    # expected kept count ~ budget (Bernoulli, so allow slack)
    n = kept.count()
    assert 60 <= n <= 140, n

    # a huge budget clamps every rate at exactly 1.0 -> whole corpus
    full = temperature_resample(docs, alpha=0.3, budget=10**6)
    assert full.count() == 420
    assert all(r["keep_rate"] == 1.0 for r in
               full.select("keep_rate").distinct().collect())


def test_temperature_resample_null_lang_stratum_survives(spark):
    """A NULL-lang stratum is counted into the normalizer, so it must
    also meet its own rate row (eqNullSafe join) and be *sampled* at
    that rate — not silently dropped wholesale (review r3)."""
    from document_convert_to__markdown_spark.operators.sampling import (
        temperature_resample,
    )

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, F.lit("en")).alias("lang"),  # 100 NULL
    )
    kept = temperature_resample(docs, alpha=0.3, budget=10**6)
    # budget clamps every rate to 1.0: all 300 rows survive, including
    # the whole NULL stratum, each carrying keep_rate.
    assert kept.count() == 300
    assert kept.filter(F.col("lang").isNull()).count() == 100
    assert kept.filter(F.col("keep_rate").isNull()).count() == 0

    # at a partial budget the NULL stratum is Bernoulli-sampled, not
    # zeroed out
    part = temperature_resample(docs, alpha=0.3, budget=150)
    n_null = part.filter(F.col("lang").isNull()).count()
    assert 0 < n_null < 100, n_null


def test_temperature_resample_deterministic(spark):
    from document_convert_to__markdown_spark.operators.sampling import (
        temperature_resample,
    )

    docs = _docs(spark)
    a = sorted(r["doc_id"] for r in
               temperature_resample(docs, budget=250).collect())
    b = sorted(r["doc_id"] for r in
               temperature_resample(docs, budget=250).collect())
    assert a == b and 0 < len(a) < 500


def test_temperature_resample_plan_broadcasts_rates(spark):
    from document_convert_to__markdown_spark.operators.sampling import (
        temperature_resample,
    )
    from tests.test_plans import plan_str

    plan = plan_str(temperature_resample(_docs(spark), budget=250))
    # the per-lang rate relation reaches the corpus via broadcast — the
    # wide side never shuffles for the join
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
