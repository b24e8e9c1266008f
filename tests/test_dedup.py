"""Dedup operators: near-duplicates are found, distinct docs are not."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight ")
    rows = [
        # 0/1: near-identical (one word changed) → near-dup pair
        (0, base * 4, "en", "srcA", len(base) * 4),
        (1, (base * 4).replace("green", "dark", 1), "en", "srcA",
         len(base) * 4),
        # 2/3: exact duplicates
        (2, "identical content here " * 10, "en", "srcB", 230),
        (3, "identical content here " * 10, "en", "srcB", 230),
        # 4: unrelated
        (4, "completely different words about spark catalyst optimizer "
            "plans shuffles partitions executors " * 5, "en", "srcC", 460),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def test_exact_duplicates_groups(spark, docs):
    from document_convert_to__markdown_spark.operators.dedup import (
        dedup_keep_first,
        exact_duplicates,
    )

    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_copies"] == 2
    assert groups[0]["keeper_doc_id"] == 2

    kept = dedup_keep_first(docs)
    assert kept.count() == 4  # one of 2/3 dropped
    assert kept.filter("doc_id = 3").count() == 0


def test_minhash_lsh_finds_neardup_not_unrelated(spark, docs):
    from document_convert_to__markdown_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    pairs = {(r["doc_a"], r["doc_b"])
             for r in lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in pairs          # near-identical share bands
    assert (2, 3) in pairs          # exact dups always collide
    assert (0, 4) not in pairs and (1, 4) not in pairs


def test_simhash_hamming_separates(spark, docs):
    from document_convert_to__markdown_spark.operators.dedup import (
        simhash64,
    )

    sigs = {r["doc_id"]: r["sig"] for r in
            docs.select("doc_id", simhash64("text").alias("sig")).collect()}
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
    assert ham(2, 3) == 0           # identical text → identical sig
    assert ham(0, 1) <= 6           # one-word edit → few bits flip
    assert ham(0, 4) > 10           # unrelated → far apart


def test_ngram_jaccard_verifies_candidates(spark, docs):
    from document_convert_to__markdown_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, block="none")
             .collect()}
    assert pairs[(2, 3)] == 1.0
    assert pairs[(0, 1)] > 0.8
    assert pairs.get((0, 4), 0.0) < 0.05


def test_ngram_minhash_band_blocking_finds_neardups(spark, docs):
    """The min-md5-gram band (1-perm MinHash) must recover the planted
    near-dup pairs the old (lang, n_chars) key could miss whenever an
    edit changed the byte length (VERDICT.md round 1 scale-killer #3)."""
    from document_convert_to__markdown_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, block="minhash").collect()}
    assert pairs[(2, 3)] == 1.0          # identical docs share every gram
    # high-jaccard pair: collision prob == jaccard, and doc 0/1 share
    # their minimum-hash gram in this fixture
    assert pairs.get((0, 1), 0.0) > 0.8
    # dissimilar docs must not be paired by the band
    assert (0, 4) not in pairs


def test_ngram_pairs_tolerate_short_docs(spark):
    """Docs under 4 tokens must produce empty gram arrays, not an ANSI
    array-index crash (sequence(0,-1) -> toks[-1]) — code-review r2."""
    from document_convert_to__markdown_spark.operators.dedup import (
        neardup_pipeline,
        ngram_jaccard_pairs,
    )

    rows = [
        (1, "a", "en", 1),
        (2, "", "en", 0),
        (3, "a b c", "en", 5),
        (4, "w x y z longer doc with enough tokens here", "en", 43),
        (5, "w x y z longer doc with enough tokens here", "en", 43),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])
    pairs = ngram_jaccard_pairs(docs, block="minhash").collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(4, 5)}
    kept = neardup_pipeline(docs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3, 4]


def test_remove_duplicate_paragraphs_drops_boilerplate_keeps_order(spark):
    """C4 repeated-line rule: a paragraph in >= min_docs distinct docs
    drops everywhere; unique paragraphs survive in original order."""
    from document_convert_to__markdown_spark.operators.dedup import (
        remove_duplicate_paragraphs,
    )

    boiler = "share this article"
    rows = [
        (1, f"alpha one\n{boiler}\nbeta two"),
        (2, f"{boiler}\ngamma three"),
        (3, f"delta four\n{boiler}"),
        (4, "unique only\nno boiler here"),
        (5, boiler),  # entirely boilerplate
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_duplicate_paragraphs(docs, min_docs=3).collect()}

    assert out[1]["text_deduped"] == "alpha one\nbeta two"
    assert out[1]["n_paras_dropped"] == 1
    assert out[2]["text_deduped"] == "gamma three"
    assert out[3]["text_deduped"] == "delta four"
    assert out[4]["text_deduped"] == "unique only\nno boiler here"
    assert out[4]["n_paras_dropped"] == 0
    # all-boilerplate doc stays present with empty text (no silent drop)
    assert out[5]["text_deduped"] == ""
    assert out[5]["n_paras_kept"] == 0 and out[5]["n_paras_dropped"] == 1


def test_remove_duplicate_paragraphs_within_doc_repeat_not_dropped(spark):
    """The count is distinct-DOC occurrences: a paragraph repeated many
    times inside ONE document is not corpus boilerplate."""
    from document_convert_to__markdown_spark.operators.dedup import (
        remove_duplicate_paragraphs,
    )

    docs = spark.createDataFrame(
        [(1, "same line\nsame line\nsame line"), (2, "other text")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_duplicate_paragraphs(docs, min_docs=2).collect()}
    assert out[1]["text_deduped"] == "same line\nsame line\nsame line"
    assert out[1]["n_paras_dropped"] == 0


def test_remove_duplicate_spans_cuts_shared_window_everywhere(spark):
    """ExactSubstr (Lee et al. 2022) drop-all default: an 8-word span
    shared by >= min_docs docs is cut from every copy, including
    overlap-merged coverage; unique docs and sub-window docs pass
    through verbatim."""
    from document_convert_to__markdown_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"{shared} unique1 tail1"),
        (2, f"prefix2 {shared} tail2 more2"),
        (3, "totally different words here nothing shared at all today"),
        (4, "short doc"),  # < n words: no windows, passes through
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, n=8, min_docs=2).collect()}

    assert out[1]["text_deduped"] == "unique1 tail1"
    assert out[1]["n_words_removed"] == 8
    assert out[2]["text_deduped"] == "prefix2 tail2 more2"
    assert out[2]["n_words_removed"] == 8
    assert out[3]["n_words_removed"] == 0
    assert out[4]["text_deduped"] == "short doc"
    assert out[4]["n_words_before"] == 2
    assert len(out) == 4  # no silent drops


def test_remove_duplicate_spans_keep_first_retains_one_copy(spark):
    """keep_first=True is the paper's semantics: the globally-first
    occurrence (min (doc, start)) survives, later copies are cut."""
    from document_convert_to__markdown_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"{shared} unique1 tail1"),
        (2, f"prefix2 {shared} tail2 more2"),
        (3, f"p3 q3 {shared}"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, n=8, min_docs=2,
                                  keep_first=True).collect()}
    assert out[1]["text_deduped"].startswith(shared)
    assert out[1]["n_words_removed"] == 0
    assert out[2]["text_deduped"] == "prefix2 tail2 more2"
    assert out[3]["text_deduped"] == "p3 q3"


def test_remove_duplicate_spans_overlapping_windows_merge(spark):
    """A 10-word shared run produces three overlapping duplicated
    8-windows; coverage merges to exactly the 10 shared words."""
    from document_convert_to__markdown_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [(1, f"a1 {shared} z1"), (2, f"b2 c2 {shared}")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, n=8, min_docs=2).collect()}
    assert out[1]["text_deduped"] == "a1 z1"
    assert out[1]["n_words_removed"] == 10
    assert out[2]["text_deduped"] == "b2 c2"
    assert out[2]["n_words_removed"] == 10


def test_remove_duplicate_spans_keep_first_overlap_protected(spark):
    """Review r3 regression: two overlapping duplicated windows with
    canonical occurrences in DIFFERENT docs must not destroy each
    other's kept copy — canonical-covered indices are protected, so an
    intact copy of every duplicated window survives somewhere."""
    from document_convert_to__markdown_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    rows = [
        (1, "A B C D E F G H x1 y1"),        # canonical for "A..H"
        (2, "A B C D E F G H I z2"),          # canonical for "B..I"
        (3, "p3 B C D E F G H I q3"),         # non-canonical copy
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, n=8, min_docs=2,
                                  keep_first=True).collect()}
    # doc1 keeps its canonical "A..H" intact
    assert out[1]["text_deduped"] == "A B C D E F G H x1 y1"
    # doc2: index 0 ("A", covered only by the non-canonical "A..H"
    # occurrence) is cut; B..I are protected by doc2's canonical "B..I"
    assert out[2]["text_deduped"] == "B C D E F G H I z2"
    # doc3's copy is non-canonical for every window: fully cut
    assert out[3]["text_deduped"] == "p3 q3"
    # every duplicated window has an intact surviving copy
    assert "A B C D E F G H" in out[1]["text_deduped"]
    assert "B C D E F G H I" in out[2]["text_deduped"]
