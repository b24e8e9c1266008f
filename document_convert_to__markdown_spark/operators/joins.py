"""Join hardening at web scale: salted skew joins and bloom-filter
pre-join pruning.

Two named operators a 100 TB crawl pipeline reaches for when a plain
``facts.join(dims, key)`` stops scaling:

``salted_join``
    A hot key (one mega-host's pages, one viral URL's events) funnels
    its entire fact volume into a single shuffle partition; the job
    then runs at the speed of that one straggler task.  Salting splits
    every fact key into ``n_salt`` sub-keys by a deterministic content
    hash and replicates the (much smaller, but too big / too mutable
    to broadcast) dim side across all salts, so the hot key's rows
    spread over ``n_salt`` tasks.  The result is row-for-row identical
    to the plain join — the salt column never leaves the operator.
    This is the manual form of what AQE's ``skewJoin`` does for sort
    merge joins at runtime; the explicit operator covers the cases AQE
    cannot see (first shuffle of a stage, skew appearing only after a
    filter, shuffled-hash joins) and makes the strategy testable.

``bloom_prune_join``
    When most fact rows have no match in the dim side (recrawl vs a
    small allow-list, events vs a vocabulary of interest), the
    dominant cost of the exact join is shuffling fact rows that will
    be discarded.  A Bloom filter built over the dim keys is probed
    *before* the exchange, so non-matching rows die scan-side.  Spark
    ships this idea as runtime row-level filtering
    (``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``), but
    the underlying ``bloom_filter_agg`` expression is not registered
    as a public function in this build — so the filter here is built
    from scratch, relationally:

    - ``n_hashes`` bit positions per key via seeded ``xxhash64``
      (``pmod(xxhash64(key, i), m_bits)``) — all JVM-side Catalyst;
    - positions are packed into 64-bit words with a ``bit_or``
      aggregate over ``shiftleft(1L, bit)`` — ONE aggregation over the
      dim relation, output bounded by ``m_bits/64`` rows;
    - the word array (``m_bits/8`` bytes — 8 KiB at the default 2^16
      bits) is collected once and embedded as an array literal, the
      probe is ``n_hashes`` ``getbit`` lookups ANDed together.  On a
      real cluster the literal rides the serialized plan to every
      executor — the same distribution path as a broadcast var, minus
      a shuffle.

    False positives only ever ADMIT a row the exact join will discard
    anyway, so the final result is exactly the plain join.  A false
    *negative* is impossible (every inserted key has all its bits
    set), so no matching row is lost.  Null fact keys may be pruned:
    an equi-join never matches null keys, so this is only valid for
    ``inner`` / ``left_semi`` joins — the operator raises otherwise.

    Bloom math (Bloom, CACM 1970): for n dim keys, fpp ≈
    (1 - e^(-k·n/m))^k; the defaults (m=2^16, k=5) hold fpp < 1% up
    to n ≈ 6,500 and degrade gracefully (the join stays correct, the
    pruning just gets weaker).  Size ``m_bits ≈ 10×n`` for ~1% fpp.
    Applicability bound: the bitmap rides the plan as a literal, so
    ~2^24 bits (2 MiB, ~10^6-10^7 keys at useful fpp) is the practical
    ceiling — past that the filter stops fitting a plan and the plain
    shuffle join (or engine-level runtime filtering) is the right
    tool; this operator's lane is the small-but-unbroadcastable dim.

Scale bounds: ``salted_join`` adds zero driver work and multiplies the
dim-side exchange by ``n_salt`` (pick 8-32; the dim side is the small
one by assumption).  ``bloom_prune_join`` collects ``m_bits/64`` longs
— 2^16 bits = 1,024 longs = 8 KiB; even a 2^24-bit filter for ~10^7
dim keys is 2 MiB, well inside driver/plan budgets.

Reference scope note: the reference engine (single-node, see
SURVEY.md §2) has no distributed join to harden; these operators
exist for the Spark execution model itself.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

_SALT = "__doc2md_salt"


def salted_join(facts: DataFrame, dims: DataFrame, on,
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join, row-identical to ``facts.join(dims, on, how)``.

    ``on``: key column name or list of names (must exist on both sides).
    ``how``: inner | left | left_semi | left_anti.  Right/full joins
    would emit unmatched dim rows once per salt replica — refused.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched dim rows "
            f"across salt replicas; use inner/left/left_semi/left_anti")
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    if _SALT in facts.columns or _SALT in dims.columns:
        raise ValueError(f"input already has a {_SALT} column")

    # Deterministic per-row salt from the full fact row content: a hot
    # KEY spreads because its rows differ in payload; fully identical
    # rows co-locate, which is correct (and they'd collapse in a
    # dedup-first pipeline anyway).
    salted_facts = facts.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]),
                      F.lit(n_salt)).cast("int"))
    # Dim replicated n_salt times: one explode, no shuffle of its own.
    salted_dims = dims.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return (salted_facts
            .join(salted_dims, keys + [_SALT], how)
            .drop(_SALT))


def bloom_filter_words(dims: DataFrame, key_col: str,
                       m_bits: int = 1 << 16,
                       n_hashes: int = 5) -> list:
    """ONE aggregation over ``dims`` → the filter as ``m_bits/64`` longs.

    Word ``w`` holds bits ``[64w, 64w+63]``; bit ``p`` of the filter is
    ``(words[p >> 6] >> (p & 63)) & 1``.  Missing words (no key hashed
    into them) are zero-filled driver-side.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    positions = F.array(*[
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        for i in range(n_hashes)
    ])
    packed = (dims
              .select(F.explode(positions).alias("p"))
              .select(F.shiftright(F.col("p"), 6).alias("w"),
                      F.pmod(F.col("p"), F.lit(64)).cast("int").alias("b"))
              .groupBy("w")
              # shiftleft with a column shift amount only exists in SQL
              # form; 1<<63 wraps negative, which bit_or handles fine.
              .agg(F.expr("bit_or(shiftleft(1L, b))").alias("word")))
    words = [0] * (m_bits // 64)
    for row in packed.collect():          # bounded: <= m_bits/64 rows
        words[int(row["w"])] = int(row["word"])
    return words


def bloom_might_contain(key: Column, words: list, m_bits: int,
                        n_hashes: int) -> Column:
    """Probe column: true iff all ``n_hashes`` bits for ``key`` are set."""
    arr = F.lit(words)
    tests = []
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        word = F.element_at(arr, (F.shiftright(p, 6) + 1).cast("int"))
        tests.append(F.getbit(word, F.pmod(p, F.lit(64))) == 1)
    return reduce(lambda a, b: a & b, tests)


def bloom_prune_join(facts: DataFrame, dims: DataFrame, on: str,
                     how: str = "inner",
                     m_bits: int = 1 << 16,
                     n_hashes: int = 5) -> DataFrame:
    """Exact ``facts.join(dims, on, how)`` with a scan-side Bloom prune.

    Only ``inner``/``left_semi`` (see module docstring: pruning an
    unmatched row is a correctness bug for any join that keeps them).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_prune_join: how={how!r} keeps unmatched fact rows, "
            f"which the prune may drop; use inner or left_semi")
    words = bloom_filter_words(dims, on, m_bits=m_bits, n_hashes=n_hashes)
    pruned = facts.filter(
        bloom_might_contain(F.col(on), words, m_bits, n_hashes))
    return pruned.join(dims, on, how)
