"""End-to-end curation over extraction results: markdown → training set.

The missing last mile between ``run_extraction`` and a training loader —
the CLI's ``--curate`` stage chains the curation operators over the
extracted markdown in the standard web-pipeline order:

    ok results → language ID → Gopher quality gate → PII scrub
      → exact dedup (keep-first by content hash)
      → corpus-level duplicate-paragraph removal (C4 rule)
      → per-domain cap (registrable domain from the url)
      → content-hash train/val/test split
      → sequence packing → sharded JSONL export

Everything is the already-tested operators composed; this module adds
only the glue (url→doc_id/domain keys, markdown→text adapter) and a
funnel audit — per-stage surviving-row counts, because a curation run
that silently dropped 40% of the corpus at one gate must say so.

Determinism: every stage keys on content or url hashes (no RNG, no
wall clock), so re-running over the same extraction output yields the
same training set — the same backfill-stability property the
operators guarantee individually.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_extracted(results: DataFrame,
                     paragraph_min_docs: int = 5,
                     domain_cap_docs: int = 10_000,
                     seq_len: int = 4096) -> tuple[DataFrame, dict]:
    """Curate extraction ``results`` into training rows.

    Returns ``(curated, funnel)``: curated rows
    (doc_id, url, domain, lang, text, split, seq_id, offset) and the
    per-stage funnel counts.  The funnel runs one count per stage —
    acceptable for a terminal CLI stage (each count reuses the stage's
    plan; at 100 TB run it with ``funnel=False``-style sampling if the
    extra actions matter).
    """
    from ..functions.url import registered_domain, url_host
    from ..operators.dedup import (
        dedup_keep_first,
        remove_duplicate_paragraphs,
    )
    from ..operators.filters import gopher_flags, pii_scrub
    from ..operators.sampling import dataset_split, domain_cap, pack_sequences
    from ..operators.text import predicted_lang

    funnel: dict = {}

    docs = (
        results.filter(F.col("status") == "ok")
        .select(
            "url",
            F.xxhash64("url").alias("doc_id"),
            F.col("markdown").alias("text"),
        )
        .withColumn("lang", predicted_lang(F.col("text")))
        .withColumn("domain", registered_domain(url_host(F.col("url"))))
    )
    funnel["extracted_ok"] = docs.count()

    gated = (gopher_flags(docs)
             .filter(F.col("gopher_verdict") == "keep")
             .drop("gopher_verdict"))
    funnel["gopher_keep"] = gated.count()

    scrubbed = (pii_scrub(gated)
                .drop("text", "n_email", "n_ip", "n_phone")
                .withColumnRenamed("text_scrubbed", "text"))

    deduped = dedup_keep_first(scrubbed)
    funnel["after_exact_dedup"] = deduped.count()

    paras = remove_duplicate_paragraphs(
        deduped, min_docs=paragraph_min_docs)
    rebuilt = (
        deduped.drop("text")
        .join(paras.select("doc_id",
                           F.col("text_deduped").alias("text")), "doc_id")
        .filter(F.length(F.trim("text")) > 0)
    )
    funnel["after_paragraph_dedup"] = rebuilt.count()

    capped = domain_cap(
        rebuilt, domain_col="domain", cap=domain_cap_docs,
        order_cols=[F.col("doc_id")]).drop("rn")
    funnel["after_domain_cap"] = capped.count()

    split = dataset_split(capped, key="text")
    # doc_id here is a 64-bit hash, uniform over the full signed range —
    # range_width must partition the HASH domain (2^64 / 2^50 = 16384
    # ranges), not assume dense ids like the contract query's corpus.
    packed = pack_sequences(
        split.withColumn("n_chars", F.length("text")),
        seq_len=seq_len, range_width=1 << 50)
    curated = (
        split.join(packed.select("doc_id", "seq_id", "offset"), "doc_id")
        .select("doc_id", "url", "domain", "lang", "text", "split",
                "seq_id", "offset")
    )
    funnel["curated"] = curated.count()
    return curated, funnel


def run_curation(results: DataFrame, out_dir: str,
                 paragraph_min_docs: int = 5,
                 domain_cap_docs: int = 10_000,
                 seq_len: int = 4096) -> dict:
    """Curate + export: writes sharded JSONL under ``out_dir`` (Hive
    split=... partitions) and returns the funnel dict."""
    from ..operators.sampling import export_training_jsonl

    curated, funnel = curate_extracted(
        results, paragraph_min_docs=paragraph_min_docs,
        domain_cap_docs=domain_cap_docs, seq_len=seq_len)
    export_training_jsonl(curated, out_dir)
    return funnel
