"""Web-corpus quality gates: repetition stats, Gopher-rule filtering,
and PII scrubbing — all JVM-side Catalyst expressions.

These are the document-level *filter* stages a Common-Crawl-scale
training pipeline runs between extraction and dedup (the published
Gopher/MassiveText and C4 heuristics).  Everything here is a pure
expression chain or a fine-grained relational aggregation — no Python
in the hot path, so at 100 TB these run inside whole-stage codegen at
scan speed, and every operator has an exact DuckDB oracle in
``__spark_entry__.oracle_sql``.

Scale notes:

- ``repetition_stats`` computes the per-doc top-bigram fraction
  *relationally* (explode → groupBy(doc_id, bigram) → max/sum) rather
  than with a per-row mode-of-array UDF: the aggregation keys on
  (doc_id, bigram) — billions of tiny groups that hash-partition
  evenly — and partial (map-side) aggregation collapses each doc's
  bigrams before the shuffle, so shuffled bytes are O(distinct bigrams
  per doc), not O(tokens).
- ``pii_scrub`` is a constant chain of ``regexp_replace`` — codegen'd,
  zero shuffles, pipelined with whatever scan feeds it.
- Regex literals are restricted to the ASCII dialect subset on which
  Java (Spark) and RE2 (DuckDB) agree exactly, so the oracles verify
  the identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import QUALITY_STOPWORDS, _probe_count

# --------------------------------------------------------------------------
# Repetition statistics (Gopher §A1.1 repetition signals)
# --------------------------------------------------------------------------

# Gopher-style thresholds, tuned to this corpus's scale (the published
# ones assume full web pages; the synthetic docs are short).
DUP_WORD_FRAC_MAX = 0.7    # 1 - distinct/total tokens
TOP_BIGRAM_FRAC_MAX = 0.12  # share of the most common bigram


def _toks(text: Column = None) -> Column:
    return F.split(text if text is not None else F.col("text"), " ")


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Per-language repetition profile + count of repetitive docs.

    Signals (per doc, micro-averaged per lang):

    - ``dup_word_frac`` = 1 - distinct_tokens / total_tokens — the
      word-level analog of Gopher's duplicate-line fraction (these
      single-line docs have no line structure).
    - ``top_bigram_frac`` = occurrences of the doc's most frequent
      bigram / total bigram occurrences (Gopher's top-2-gram fraction).
    - ``n_repetitive`` = docs over either per-doc threshold.

    The language-level fractions are *micro-averages* — ratios of
    summed integer counts, not ``avg()`` of per-doc doubles — so the
    value is a single exact integer division and the cross-engine
    oracle matches bit-for-bit regardless of aggregation order (double
    ``avg()`` is summation-order-sensitive).  The bigram mode is
    computed relationally (see module docstring) — the shape that
    survives 10^12 docs.
    """
    toks = documents.select("doc_id", "lang", _toks().alias("t"))
    dup = toks.select(
        "doc_id", "lang",
        F.size("t").alias("n_tok"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
    )
    bigrams = toks.select(
        "doc_id", "lang",
        F.explode(F.expr(
            "CASE WHEN size(t) >= 2 THEN"
            " transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))"
            " ELSE array() END"
        )).alias("g"),
    )
    top_counts = (
        bigrams.groupBy("doc_id", "lang", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id", "lang")
        .agg(F.max("c").alias("max_c"), F.sum("c").alias("tot_c"))
    )
    per_doc = dup.join(top_counts, ["doc_id", "lang"])
    rep = ((1 - F.col("n_distinct") / F.col("n_tok")) > DUP_WORD_FRAC_MAX) | \
          ((F.col("max_c") / F.col("tot_c")) > TOP_BIGRAM_FRAC_MAX)
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(1 - F.sum("n_distinct") / F.sum("n_tok"), 4)
            .alias("dup_word_frac"),
            F.round(F.sum("max_c") / F.sum("tot_c"), 4)
            .alias("top_bigram_frac"),
            F.sum(rep.cast("long")).alias("n_repetitive"),
        )
    )


# --------------------------------------------------------------------------
# Gopher-rule document gate
# --------------------------------------------------------------------------

# Bounds from the Gopher paper's quality heuristics, adapted to the
# short synthetic docs (word-count floor lowered from 50).
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_flags(documents: DataFrame) -> DataFrame:
    """Per-doc Gopher-rule verdict: first violated rule or 'keep'.

    Rule order is a fixed priority chain (CASE), so the label is
    deterministic even when a doc violates several rules.  The checks
    are cheap expressions evaluated in one pass over the text column.
    """
    t = F.col("text")
    n_words = F.size(_toks(t))
    mean_wl = F.length(t) / n_words
    stop_hits = _probe_count(t, [f" {w} " for w in QUALITY_STOPWORDS])
    verdict = (
        F.when(n_words < GOPHER_MIN_WORDS, "too_few_words")
        .when(n_words > GOPHER_MAX_WORDS, "too_many_words")
        .when(mean_wl < GOPHER_MIN_MEAN_WORD_LEN, "words_too_short")
        .when(mean_wl > GOPHER_MAX_MEAN_WORD_LEN, "words_too_long")
        .when(stop_hits < GOPHER_MIN_STOPWORD_HITS, "too_few_stopwords")
        .otherwise("keep")
    )
    return documents.withColumn("gopher_verdict", verdict)


def gopher_filter_summary(documents: DataFrame) -> DataFrame:
    """Per-(lang, verdict) counts — the filter's audit table."""
    return (
        gopher_flags(documents)
        .groupBy("lang", "gopher_verdict")
        .agg(F.count("*").alias("n_docs"))
    )


def gopher_keep(documents: DataFrame) -> DataFrame:
    """The kept corpus (verdict == 'keep'), original schema."""
    return (
        gopher_flags(documents)
        .filter(F.col("gopher_verdict") == "keep")
        .drop("gopher_verdict")
    )


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

# ASCII-only patterns on which Java and RE2 regex dialects agree (no
# lookarounds — RE2 has none).  The phone family (VERDICT r2 #6) covers
# optional +country code, (area) parens, and -/./space separators:
# +1-555-123-4567, (555) 123-4567, 555.123.4567, 555-123-4567 and the
# bare 555-1234 all scrub.  Spaces only follow a "+cc" or "(area)"
# prefix — a space-separated bare 3-3-4 digit run is more often a
# figure list than a phone, and scrubbing it would eat real data.
PHONE_PATTERN = (r"(?:\+\d{1,3}[-. ])?"
                 r"(?:\(\d{3}\)[-. ]?\d{3}[-.]\d{4}\b"
                 r"|\b\d{3}[-.]\d{3}[-.]\d{4}\b"
                 r"|\b\d{3}-\d{4}\b)")
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str = "text_scrubbed") -> DataFrame:
    """Replace emails / IPv4s / phone-shaped tokens with typed tags.

    Adds per-type match counts (``n_email``/``n_ip``/``n_phone``) so the
    caller can audit scrub volume without a second scan.  Order matters:
    emails are scrubbed before IPs so a host part containing dots is
    not re-matched — and each count is taken on the *progressively
    scrubbed* text, so counts equal actual replacements (counting the
    raw column would report a phantom <PHONE> for '555-1234@x.com',
    whose digits the email pass already consumed — review r2).  Spark
    ``regexp_replace`` is global by default (DuckDB needs the 'g' flag —
    the oracle carries it).
    """
    out = df
    scrubbed = F.col(text_col)
    for name, pat, tag in PII_PATTERNS:
        out = out.withColumn(f"n_{name}",
                             F.regexp_count(scrubbed, F.lit(pat)))
        scrubbed = F.regexp_replace(scrubbed, pat, tag)
    return out.withColumn(out_col, scrubbed)
