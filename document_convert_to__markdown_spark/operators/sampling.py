"""Dataset curation operators: deterministic splits and stratified
sampling — the last mile before training-data export.

``dataset_split`` keys the train/val/test assignment on a content-hash
bucket (first 16 bits of md5), NOT on a random draw: the split of a
document is a pure function of its content, so re-runs, backfills, and
incremental arrivals land each document in the same split forever — the
property that prevents train/test leakage across pipeline versions.
SQL-expressible, so the driver oracle checks it exactly.

``stratified_sample`` wraps ``DataFrame.sampleBy`` (per-stratum
Bernoulli with a fixed seed) for per-language mixing ratios.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(col: Column, buckets: int = 100) -> Column:
    """Stable [0, buckets) bucket from a column's md5 (16-bit prefix)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long") % buckets
    )


def dataset_split(documents: DataFrame, key: str = "text",
                  train_pct: int = 80, val_pct: int = 10) -> DataFrame:
    """Assign train/val/test by content-hash bucket (80/10/10 default)."""
    bucket = split_bucket(F.col(key))
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return documents.withColumn("split", split)


def export_training_jsonl(
    df: DataFrame,
    path: str,
    partition_by: str = "split",
    max_records_per_file: int = 100_000,
    compress: bool = True,
) -> None:
    """Write curated rows as sharded (optionally gzipped) JSONL — the
    interchange format training loaders consume.

    - One JSON object per line (``to_json(struct(*))``, JVM-side).
    - Hive-partitioned by ``partition_by`` (``split=train/`` …), so a
      loader mounts exactly the splits it needs and Spark prunes the
      rest on any later read.
    - ``maxRecordsPerFile`` bounds shard size: at 10^12 rows you get
      many uniform shards per split instead of one file per task skewed
      by partition contents.
    """
    writer = (
        df.select(partition_by,
                  F.to_json(F.struct(*[c for c in df.columns])).alias("value"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_by)
    )
    if compress:
        writer = writer.option("compression", "gzip")
    writer.text(path)


def stratified_sample(documents: DataFrame, fractions: dict,
                      stratum_col: str = "lang", seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample with a fixed seed (deterministic for
    a given input partitioning): the data-mixing knob for training
    corpora — e.g. downsample dominant languages."""
    return documents.sampleBy(stratum_col, fractions, seed=seed)


def domain_cap(df: DataFrame, domain_col: str = "source", cap: int = 10,
               order_cols: list | None = None, key_col: str = "doc_id",
               num_salts: int = 16) -> DataFrame:
    """Per-domain document cap (the C4-style host quota): keep at most
    ``cap`` rows per domain under a deterministic total order.

    Scale shape: a naive ``row_number() OVER (PARTITION BY domain)``
    puts every row of a mega-domain through one task.  This runs the
    standard salted two-stage top-k instead:

    1. rank within ``(domain, salt)`` where salt = hash(``key_col``) %
       ``num_salts`` — each partition holds ~1/num_salts of the domain,
       and only ``cap`` rows per salt bucket survive;
    2. re-rank the ≤ cap x num_salts survivors within ``domain``.

    Any row in the domain's true top ``cap`` ranks ≤ cap inside its salt
    bucket too, so the result is *identical* to the single-window form
    (the oracle checks it with plain SQL ``row_number``) while stage 2's
    per-domain input is bounded by construction.  The order must be
    total (callers should end with a unique key, e.g. doc_id) or ranks
    are nondeterministic.
    """
    from pyspark.sql import Window

    order_cols = order_cols or [F.col(key_col)]
    salt = F.pmod(F.hash(key_col), F.lit(num_salts))
    staged = df.withColumn("_salt", salt)
    w1 = Window.partitionBy(domain_col, "_salt").orderBy(*order_cols)
    survivors = (
        staged.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= cap)
        .drop("_salt", "_rn1")
    )
    w2 = Window.partitionBy(domain_col).orderBy(*order_cols)
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= cap)
    )


def md5_u32(key_col: str):
    """First 8 hex digits of md5(key) as a double in [0, 2^32) — the
    ONE deterministic per-row randomness source (``weighted_sample``,
    ``temperature_resample``, DSIR's Gumbel draw).  Oracle form:
    ``('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT`` — any
    change here must land in every oracle that replays it."""
    return F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8),
        16, 10).cast("double")


def md5_uniform(key_col: str):
    """Deterministic uniform [0,1) draw, a pure function of the key —
    re-runs, backfills and incremental arrivals draw identically."""
    return md5_u32(key_col) / F.lit(float(1 << 32))


def weighted_sample(df: DataFrame, weight_col: str,
                    key_col: str = "doc_id") -> DataFrame:
    """Deterministic per-row Bernoulli sample: keep a row iff
    uniform(key) < weight.

    The uniform draw is a pure function of the row key (first 8 hex
    digits of its md5, scaled to [0,1)) — re-runs, backfills and
    incremental arrivals make identical keep/drop decisions, the same
    no-leakage property ``dataset_split`` has, generalized to
    per-row importance weights (e.g. quality-proportional downsampling
    of boilerplate-heavy domains).  Pure Catalyst expressions; exactly
    SQL-expressible, so the driver oracle checks it bit-for-bit
    (``sampleBy``'s RNG draw, by contrast, depends on partitioning).
    """
    return df.filter(md5_uniform(key_col) < F.col(weight_col))


def temperature_resample(documents: DataFrame, alpha: float = 0.3,
                         budget: int = 1000, lang_col: str = "lang",
                         key_col: str = "doc_id") -> DataFrame:
    """Temperature-based language rebalancing (XLM-R, Conneau et al.
    2020 §3.1; the exponentiated-count sampling UniMax [Chung et al.
    2023] improves on): sample language l with probability
    p_l ∝ n_l^alpha, alpha < 1 flattening the head so low-resource
    languages are upweighted relative to their corpus share.

    Realized as a deterministic per-row Bernoulli: keep_rate_l =
    min(1, budget * p_l / n_l), decided by the same md5-uniform draw
    ``weighted_sample`` uses — re-runs and backfills keep identical
    rows, and the expected kept count is ~budget.

    Scale shape: the per-language rate relation is ONE aggregation of
    (lang) — thousands of rows at most — broadcast back onto the
    corpus; the corpus itself never shuffles, so this composes with an
    upstream scan at zero extra exchanges on the wide side.  Returns
    the input rows that survive, plus their language's ``keep_rate``.
    """
    counts = documents.groupBy(lang_col).agg(F.count("*").alias("_n_l"))
    # normalizer as a 1-row relation: sum over langs of n_l^alpha
    z = counts.agg(F.sum(F.pow("_n_l", F.lit(alpha))).alias("_z"))
    # round-before-cut: the rate decides row membership, so pin it to 6
    # decimals in BOTH engines (Java Math.pow / partial-agg sum order vs
    # DuckDB's libm can differ in the last ulp — same discipline as the
    # bm25/dsir score cuts).
    rates = (
        counts.crossJoin(F.broadcast(z))
        .select(
            lang_col,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(budget)) * F.pow("_n_l", F.lit(alpha))
                    / F.col("_z") / F.col("_n_l"),
                ), 6,
            ).alias("keep_rate"),
        )
    )
    # eqNullSafe: a NULL-lang stratum must meet its own rate row (it was
    # counted into z), not silently vanish at the equi-join (review r3).
    return (
        documents.join(
            F.broadcast(rates),
            documents[lang_col].eqNullSafe(rates[lang_col]))
        .drop(rates[lang_col])
        .filter(md5_uniform(key_col) < F.col("keep_rate"))
    )


def token_budget_select(documents: DataFrame, budget: int,
                        tokens_col: str = "n_chars",
                        lang_col: str = "lang") -> DataFrame:
    """Keep the best documents per language until a token budget fills
    (the data-mixing primitive: "give me 50B tokens of each language,
    best-first").

    Order is (tokens_col DESC, doc_id) — a total order — and a document
    is kept while the running token total *including it* stays within
    ``budget``.  Implemented as a per-language cumulative window; the
    two-phase bucketed form that survives a mega-language (prefix-sum
    coarse value buckets on the driver, exact window only inside the
    boundary bucket) is ``token_budget_select_bucketed`` — both return
    identical rows and share one oracle.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(lang_col)
         .orderBy(F.col(tokens_col).desc(), F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        documents.withColumn("cum_tokens", F.sum(tokens_col).over(w))
        .filter(F.col("cum_tokens") <= budget)
    )


def token_budget_select_bucketed(documents: DataFrame, budget: int,
                                 tokens_col: str = "n_chars",
                                 lang_col: str = "lang",
                                 bucket_width: int = 64) -> DataFrame:
    """Scale-safe twin of ``token_budget_select``.

    A per-language cumulative window puts the whole language through
    one task.  But the cumsum order is (tokens DESC, doc_id), so
    value-range buckets of the token count are *aligned prefixes* of
    that order: bucket b = floor(tokens / width) descending.  Phase 1
    aggregates (lang, bucket) → (sum, count) — a fine-grained shuffle
    that partial-aggregates map-side; the per-language bucket lists are
    tiny and prefix-summed on the driver.  Buckets whose prefix fits
    entirely inside the budget are kept wholesale with no window at
    all; exactly one boundary bucket per language still needs the exact
    cumulative window, seeded with the prefix total — and its width is
    bounded by the value range, not the language size.
    """
    from pyspark.sql import Window

    bucket = F.floor(F.col(tokens_col) / bucket_width).alias("bucket")
    per_bucket = (
        documents.groupBy(lang_col, bucket)
        .agg(F.sum(tokens_col).alias("tok"))
        .collect()
    )
    by_lang: dict = {}
    for r in per_bucket:
        by_lang.setdefault(r[lang_col], []).append((r["bucket"], r["tok"]))

    full, boundary = [], []  # (lang, min_bucket_kept) / (lang, bucket, base)
    for lang, buckets in by_lang.items():
        buckets.sort(key=lambda t: -t[0])  # tokens DESC == bucket DESC
        run = 0
        for b, tok in buckets:
            if run + tok <= budget:
                run += tok
                full.append((lang, b))
            else:
                boundary.append((lang, b, run))
                break  # later buckets cannot fit ahead of this one

    spark = documents.sparkSession
    docs_b = documents.withColumn(
        "bucket", F.floor(F.col(tokens_col) / bucket_width))

    parts = []
    if full:
        full_df = F.broadcast(spark.createDataFrame(
            full, f"{lang_col} string, min_bucket long")
            .groupBy(lang_col).agg(F.min("min_bucket").alias("min_bucket")))
        kept_full = (
            docs_b.join(full_df, lang_col)
            .filter(F.col("bucket") >= F.col("min_bucket"))
            .drop("min_bucket")
        )
        # exact running totals for the kept-wholesale rows (same window,
        # but over the bounded prefix relation, not the whole language)
        parts.append(kept_full)
    if boundary:
        bdf = F.broadcast(spark.createDataFrame(
            boundary, f"{lang_col} string, bucket long, base long"))
        parts.append(
            docs_b.join(bdf, [lang_col, "bucket"]).drop("base"))
    if not parts:
        return token_budget_select(documents, budget, tokens_col, lang_col)

    candidates = parts[0]
    for p in parts[1:]:
        candidates = candidates.unionByName(p)
    # One exact window over the pruned candidate set: full buckets plus
    # the single boundary bucket per language — everything past the
    # boundary was dropped before any window ran.
    w = (Window.partitionBy(lang_col)
         .orderBy(F.col(tokens_col).desc(), F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        candidates.drop("bucket")
        .withColumn("cum_tokens", F.sum(tokens_col).over(w))
        .filter(F.col("cum_tokens") <= budget)
    )


def pack_sequences(documents: DataFrame, seq_len: int = 4096,
                   tokens_col: str = "n_chars", lang_col: str = "lang",
                   id_col: str = "doc_id",
                   range_width: int = 100_000) -> DataFrame:
    """Sequence packing: each document's position in the per-language
    packed token stream — the training-data step that concatenates
    documents and slices the stream into fixed ``seq_len`` windows.
    Returns (id, lang, tokens, seq_id, offset): the document starts in
    sequence ``seq_id`` at token ``offset`` (documents may straddle
    sequence boundaries; the loader consumes them from the stream).

    Assignment needs each doc's exact running-total start position, which
    a naive per-language cumulative window serializes through one task.
    Two-phase instead (same driver-prefix pattern as
    ``token_budget_select_bucketed``): docs bucket into id ranges of
    ``range_width``; per-(lang, range) token sums — one fine-grained
    aggregation — are prefix-summed on the driver (bounded by
    n_docs / range_width rows per language, not corpus size) and
    broadcast back as each range's base offset; the exact cumulative
    window then runs per (lang, range), whose width is capped by
    construction.  Provably identical to the single global window (the
    oracle checks it with plain SQL ``sum() OVER``): prefix(base) +
    within-range cumsum == global cumsum under the same
    (lang, id) total order.
    """
    from pyspark.sql import Window

    spark = documents.sparkSession
    rng_col = F.floor(F.col(id_col) / range_width)
    per_range = (
        documents.groupBy(F.col(lang_col).alias("_l"),
                          rng_col.alias("_r"))
        .agg(F.sum(tokens_col).alias("_tok"))
        .collect()
    )
    by_lang: dict = {}
    for r in per_range:
        by_lang.setdefault(r["_l"], []).append((r["_r"], r["_tok"]))
    bases = []
    for lang, ranges in by_lang.items():
        run = 0
        for rid, tok in sorted(ranges):
            bases.append((lang, rid, run))
            run += tok
    base_df = F.broadcast(spark.createDataFrame(
        bases, f"{lang_col} string, _rng long, _base long"))

    w = (Window.partitionBy(lang_col, "_rng").orderBy(F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    staged = (
        documents.select(id_col, lang_col, F.col(tokens_col).alias("tokens"))
        .withColumn("_rng", F.floor(F.col(id_col) / range_width))
        .join(base_df, [lang_col, "_rng"])
        .withColumn("_cum", F.col("_base") + F.sum("tokens").over(w))
    )
    start = F.col("_cum") - F.col("tokens")
    return staged.select(
        id_col, lang_col, "tokens",
        F.floor(start / seq_len).alias("seq_id"),
        (start % seq_len).alias("offset"),
    )


def cluster_safe_split(documents: DataFrame, edges: DataFrame,
                       train_pct: int = 80, val_pct: int = 10,
                       key_col: str = "doc_id") -> DataFrame:
    """Leakage-proof train/val/test split: the split key is the
    NEAR-DUP CLUSTER, not the document.

    ``dataset_split`` keys on the content hash, which keeps exact
    copies together but lets near-duplicates (one-word edits, template
    variants) straddle train and test — the classic eval-contamination
    leak (the reason The Pile/C4 test sets needed post-hoc dedup
    audits).  Here pairwise near-dup ``edges`` resolve to connected
    components first (``operators/graph.py``), every document adopts
    its component id (isolated docs: their own id), and the
    md5-uniform bucket is drawn on the CLUSTER id — whole clusters
    land in one split by construction.

    Returns the input plus ``cluster`` and ``split``; the companion
    invariant (no cluster spans two splits) is pinned by test and by
    the contract query's leakage count, which must be 0.
    """
    from .graph import connected_components

    comp = connected_components(edges)
    clustered = (
        documents.join(
            comp.withColumnRenamed("node", key_col), key_col, "left")
        .withColumn("cluster",
                    F.coalesce("component", F.col(key_col)))
        .drop("component")
    )
    bucket = split_bucket(F.col("cluster").cast("string"))
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return clustered.withColumn("split", split)
