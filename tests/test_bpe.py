"""BPE tokenizer: relational training parity with the classic algorithm,
greedy-encode roundtrip, and edge cases."""

import pytest


def _merges_ref(word_freqs, num_merges, min_pair_count=2):
    """Driver-side reference implementation of Sennrich BPE training
    (dict-of-tuples form, the canonical published algorithm)."""
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(num_merges):
        pairs = {}
        for syms, f in vocab.items():
            for j in range(len(syms) - 1):
                pairs[(syms[j], syms[j + 1])] = \
                    pairs.get((syms[j], syms[j + 1]), 0) + f
        if not pairs:
            break
        # deterministic tiebreak: count desc, then (left, right) asc
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((rank, l, r, c))
        new_vocab = {}
        for syms, f in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if (j < len(syms) - 1 and syms[j] == l
                        and syms[j + 1] == r):
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference_algorithm(spark):
    """The relational fold-merge training produces exactly the merge
    sequence of the canonical driver-side algorithm, tiebreaks
    included."""
    from document_convert_to__markdown_spark.operators.bpe import bpe_train

    corpus = ("low low low lower lower newest newest newest newest "
              "widest widest hug hug hug pug pun bun hugs")
    docs = spark.createDataFrame([(1, corpus)], ["doc_id", "text"])
    got = bpe_train(docs, num_merges=10)

    freqs = {}
    for w in corpus.split():
        freqs[w] = freqs.get(w, 0) + 1
    want = _merges_ref(freqs, 10)
    assert got == want


def test_bpe_train_handles_fully_merged_words(spark):
    """A word that collapses to a single symbol must not crash the
    pair enumeration (sequence(1,0) would descend and index OOB)."""
    from document_convert_to__markdown_spark.operators.bpe import bpe_train

    # 'aa' merges to the single symbol 'aa</w>' within two rounds
    # ((a,</w>) wins the tiebreak over (a,a): '<' sorts below 'a'),
    # and training keeps running afterwards without indexing OOB.
    docs = spark.createDataFrame(
        [(1, "aa aa aa aa aa aa bb cc dd")], ["doc_id", "text"])
    merges = bpe_train(docs, num_merges=8)
    pairs = {(l, r) for _, l, r, _c in merges}
    assert ("a", "</w>") in pairs
    assert ("a", "a</w>") in pairs  # forms the single symbol 'aa</w>'


def test_bpe_encode_roundtrip_and_counts(spark):
    """Stripping </w> markers and rejoining the tokens reconstructs the
    lowercased input exactly; n_tokens == len(tokens)."""
    from document_convert_to__markdown_spark.operators.bpe import (
        bpe_encode, bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "The newest WIDEST low lower"), (2, "unseen zebra qq"),
         (3, "")],
        ["doc_id", "text"])
    merges = bpe_train(docs, num_merges=6)
    out = {r["doc_id"]: r for r in
           bpe_encode(docs, merges).collect()}
    for i in (1, 2, 3):
        toks = out[i]["tokens"]
        assert out[i]["n_tokens"] == len(toks)
        rebuilt = "".join(toks).replace("</w>", " ").strip()
        assert rebuilt == out[i]["text"].lower().strip() \
            .replace("  ", " ") or out[i]["text"] == ""
    assert out[3]["tokens"] == []  # empty doc -> zero tokens, no crash


def test_bpe_encode_is_single_arrow_pass_no_shuffle(spark):
    """Encoding is one ArrowEvalPython projection over the corpus —
    no exchange, no per-row Python."""
    import contextlib
    import io

    from document_convert_to__markdown_spark.operators.bpe import (
        bpe_encode,
    )

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    df = bpe_encode(docs, [(0, "a", "b", 2)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    p = buf.getvalue()
    assert p.count("ArrowEvalPython") == 1, p
    assert "Exchange" not in p, p


def test_bpe_train_encode_share_tokenization(spark):
    """Review r3 regression: NBSP (U+00A0) is NOT a Java \\s character,
    so 'foo\\xa0bar' is ONE dictionary word in training — encoding must
    segment identically (JVM-side split feeds the UDF), keeping the
    NBSP inside the token instead of silently splitting on it."""
    from document_convert_to__markdown_spark.operators.bpe import (
        bpe_encode, bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "foo\xa0bar foo\xa0bar foo\xa0bar")], ["doc_id", "text"])
    merges = bpe_train(docs, num_merges=10)
    row = bpe_encode(docs, merges).collect()[0]
    # one fully-merged token per word occurrence, NBSP preserved inside
    assert row["tokens"] == ["foo\xa0bar</w>"] * 3
    rebuilt = "".join(row["tokens"]).replace("</w>", " ").strip()
    assert rebuilt == row["text"].lower()
