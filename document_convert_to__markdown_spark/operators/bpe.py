"""Byte-pair-encoding tokenizer: relational training + Arrow encode.

Real subword tokenization for the training-export path (sequence
packing / token budgets count *subword* tokens in production, not
whitespace words).  Sennrich et al. 2016 ("Neural Machine Translation
of Rare Words with Subword Units") train BPE on the **word-frequency
dictionary**, not the corpus — that is exactly what makes the algorithm
Spark-shaped:

- the corpus is touched ONCE (explode words -> groupBy word, a single
  hash-first shuffle carrying (word, partial count));
- every merge round then runs on the dictionary relation, whose size is
  the number of *distinct* words (10^8-ish at 100 TB, not 10^12 rows),
  as one small distributed job: explode adjacent symbol pairs ->
  freq-weighted count -> deterministic argmax (orderBy count desc,
  pair) -> fold-merge the winning pair into the symbol arrays JVM-side;
- only ONE row per round reaches the driver (the winning pair), and the
  dictionary is eagerly localCheckpoint-ed each round so lineage stays
  bounded (same pattern as ``graph.connected_components``).

Encoding applies the learned merge ranks with the standard greedy
lowest-rank-first loop in an Arrow-batched pandas UDF — per-word
memoization makes the common case a dict lookup, since crawl text
repeats words heavily.  The merge table is bounded by ``num_merges``
(vocab-size knob), so shipping it in the UDF closure is a broadcast of
a few thousand pairs, never corpus-scale data.

No wall clock, no randomness: identical input -> identical merge table
-> identical tokens (ties break on (pair_count desc, left, right)).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

END_OF_WORD = "</w>"


def _words_expr(text_col: str):
    """The ONE tokenization both training and encoding share: JVM-side
    lowercase + ``\\s+`` split.  The encode UDF receives this pre-split
    array rather than re-tokenizing in Python — Python's ``str.split``
    also breaks on NBSP/U+3000/NEL (which Java's ``\\s`` does not) and
    ``str.lower()`` can disagree with the JVM's locale-sensitive
    lowercasing, so a second Python-side implementation would silently
    segment differently from the trained dictionary (review r3)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda x: x != F.lit(""),
    )


def _word_freqs(documents: DataFrame, text_col: str) -> DataFrame:
    return (
        documents.select(F.explode(_words_expr(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_train(documents: DataFrame, num_merges: int = 50,
              text_col: str = "text",
              min_pair_count: int = 2) -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus.  Returns the
    merge table as a bounded driver-side list of
    ``(rank, left, right, pair_count)`` — by construction at most
    ``num_merges`` entries, one collected row per training round.

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (merging hapax pairs memorizes noise).
    """
    spark = documents.sparkSession
    dict_df = _word_freqs(documents, text_col).select(
        "freq",
        F.concat(
            F.expr("transform(sequence(1, length(word)), "
                   "i -> substring(word, i, 1))"),
            F.array(F.lit(END_OF_WORD)),
        ).alias("symbols"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        best = (
            dict_df.select(
                "freq",
                # A fully-merged word is a single symbol: sequence(1, 0)
                # would DESCEND in Spark and index out of bounds, so
                # single-symbol rows contribute an empty pair array.
                F.explode(
                    F.expr(
                        "CASE WHEN size(symbols) > 1 THEN "
                        "transform(sequence(1, size(symbols) - 1), "
                        "j -> struct(symbols[j-1] AS l, symbols[j] AS r)) "
                        "ELSE cast(array() AS "
                        "array<struct<l: string, r: string>>) END"
                    )).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_count:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, l, r, c))
        if rank == num_merges - 1:
            # The rewritten dictionary would never be read — skip the
            # final fold-merge + checkpoint job (one full-dictionary
            # pass saved per training call).
            break

        lcol, rcol, mcol = F.lit(l), F.lit(r), F.lit(l + r)
        # Left-to-right non-overlapping merge as a fold: the freshly
        # merged symbol sits at the top of the accumulator and only
        # re-merges if it literally equals `left` — exactly the
        # standard scan-and-skip semantics.
        dict_df = dict_df.withColumn(
            "symbols",
            F.aggregate(
                "symbols",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == lcol) & (x == rcol),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1),
                             F.array(mcol)),
                ).otherwise(F.concat(acc, F.array(x))),
            ),
        ).localCheckpoint(eager=True)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int],
                 cache: dict[str, list[str]]) -> list[str]:
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        pairs = [(syms[j], syms[j + 1]) for j in range(len(syms) - 1)]
        ranked = [(ranks[p], j) for j, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        best_rank = min(r for r, _ in ranked)
        out: list[str] = []
        j = 0
        while j < len(syms):
            if (j < len(syms) - 1
                    and ranks.get((syms[j], syms[j + 1])) == best_rank):
                out.append(syms[j] + syms[j + 1])
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    cache[word] = syms
    return syms


def bpe_encode(documents: DataFrame,
               merges: list[tuple[int, str, str, int]],
               text_col: str = "text",
               tokens_col: str = "tokens") -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: adds
    ``tokens_col`` (array<string> of subwords, ``</w>``-terminated per
    word) and ``n_tokens``.  The merge table is a bounded list (<=
    num_merges entries), shipped in the UDF closure; per-word
    memoization inside each Arrow batch makes repeated words a dict
    lookup.
    """
    ranks = {(l, r): rank for rank, l, r, _c in merges}

    @pandas_udf(ArrayType(StringType()))
    def _bpe(word_arrays: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for words in word_arrays:
            toks: list[str] = []
            if words is not None:
                for w in words:
                    toks.extend(_encode_word(w, ranks, cache))
            out.append(toks)
        return pd.Series(out)

    # Tokenization happens JVM-side via the SAME expression training
    # used (_words_expr) — the UDF only applies merges, so train and
    # encode can never disagree on word boundaries or lowercasing.
    return documents.withColumn(tokens_col, _bpe(_words_expr(text_col))) \
        .withColumn("n_tokens", F.size(tokens_col))
