"""Robots-policy URL filtering — longest-prefix-match rule resolution,
fully relational.

A polite crawler resolves every candidate url against its host's
robots.txt rule set (RFC 9309 §2.2.2: the matching rule with the
LONGEST path prefix wins; on a length tie the least restrictive —
allow — wins; no matching rule means allowed).  At 10^12 urls this is
a per-row policy lookup, not a per-host loop: rules become a relation
``(host, prefix, allow)`` and the resolution is

    urls ⋈ rules ON host AND startswith(path, prefix)
         → window top-1 per url BY (prefix length DESC, allow DESC)
         → left-join back (urls with no matching rule default-allow)

Plan shape: the rules side is small *per url* (one robots.txt per
host) but the full relation is ~10^8 rows at crawl scale — far past
Spark's broadcast limits — so the join strategy is a knob:
``broadcast_rules=None`` (default) broadcasts only when the rules
relation is provably small (a cheap count against a row threshold),
else shuffles both sides on host (the rules side pre-bucketed by host
in storage makes that a one-sided shuffle at scale).  The window
partitions by url, which rides the same exchange AQE gives the join
output.  Everything is Catalyst expressions (regex path split,
``startswith``) — exactly SQL-expressible, so the DuckDB oracle replays
it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.url import url_host, url_path


def apply_robots(urls: DataFrame, rules: DataFrame,
                 url_col: str = "url",
                 broadcast_rules: bool | None = None,
                 max_broadcast_rows: int = 1_000_000) -> DataFrame:
    """Resolve each url against per-host robots rules.

    ``rules``: ``(host string, prefix string, allow boolean)`` — one row
    per Allow/Disallow line.  Returns the input plus ``allowed`` (the
    verdict), ``matched_prefix`` (null when no rule matched) and
    ``matched_allow`` — every input row appears exactly once (audit,
    not silent drop; callers filter on ``allowed``).

    RFC 9309 §2.2.3 path wildcards are honored (round-5 advice — they
    were previously treated as literal prefix bytes, so every wildcard
    Disallow silently matched nothing): ``*`` in a rule value matches
    any character run and a *trailing* ``$`` anchors the rule to the
    end of the path (a ``$`` anywhere else is a literal octet, per the
    RFC's ABNF).  The translation to a regex happens once on the small
    rules side; plain rules (no ``*``, no trailing ``$`` — the
    overwhelming majority in real crawl corpora) keep the cheap
    ``startswith`` fast path.  Precedence stays rule-value length
    (§2.2.2 "longest match ... based on the number of octets in the
    rule"), which counts wildcard octets too — the RFC measures the
    rule text, not the matched span.

    ``url_col`` must be unique (it is the crawl identity key — run
    exact dedup upstream): the per-url top-1 window would collapse
    duplicate url rows.

    ``broadcast_rules``: ``True`` forces a broadcast-hash join of the
    rules side (only for rule sets known to fit the driver/executor
    broadcast budget), ``False`` forces the host-keyed shuffle join
    (the 10^8-host production shape — at that scale an unconditional
    broadcast is a job-killer, not a slowdown: it exceeds
    ``spark.sql.autoBroadcastJoinThreshold`` hard limits and the driver
    heap).  The default ``None`` materializes the rules relation once
    (``localCheckpoint``) and probes its size with a bounded
    ``limit(max_broadcast_rows + 1).count()`` over the materialized
    data — the probe and the join share ONE computation of the rules
    lineage (a bare ``limit().count()`` on an unmaterialized relation
    whose lineage ends in a window/aggregation, as
    ``parse_robots_txt`` output does, would re-execute the whole
    pipeline for the probe and again for the join).  At known-huge
    scale pass ``False`` explicitly and skip both the probe and the
    checkpoint.  Same auto-knob contract as
    ``dedup.remove_duplicate_paragraphs``.
    """
    host = url_host(F.col(url_col)).alias("_host")
    path = url_path(F.col(url_col)).alias("_path")
    keyed = urls.select("*", host, path)
    # Wildcard translation, computed once per rule on the small side:
    # a trailing '$' anchors; every regex metacharacter in the body is
    # escaped EXCEPT '*', which becomes '.*'.
    anch = F.col("prefix").endswith("$")
    body = F.when(anch, F.expr("substring(prefix, 1, length(prefix) - 1)")
                  ).otherwise(F.col("prefix"))
    esc = F.regexp_replace(body, r"([.\^\$+?(){}\[\]\\|])", r"\\$1")
    rx = F.concat(F.lit("^"), F.regexp_replace(esc, r"\*", ".*"),
                  F.when(anch, F.lit("$")).otherwise(F.lit("")))
    plain = ~anch & ~F.col("prefix").contains("*")
    r = rules.select(F.col("host").alias("_rhost"), "prefix", "allow",
                     plain.alias("_plain"), rx.alias("_rx"))
    if broadcast_rules is None:
        r = r.localCheckpoint(eager=True)
        broadcast_rules = (
            r.limit(max_broadcast_rows + 1).count() <= max_broadcast_rows
        )
    if broadcast_rules:
        r = broadcast(r)
    matched = (
        keyed.join(r,
                   (F.col("_host") == F.col("_rhost"))
                   & F.when(F.col("_plain"),
                            F.col("_path").startswith(F.col("prefix")))
                      .otherwise(F.regexp_like(F.col("_path"),
                                               F.col("_rx"))),
                   "left")
    )
    # explicit nulls-last: Spark's .desc() implies it, DuckDB's default
    # null order does not flip with direction — the oracle says NULLS
    # LAST explicitly so both engines rank the no-match row last.
    w = (Window.partitionBy(url_col)
         .orderBy(F.length("prefix").desc_nulls_last(),
                  F.col("allow").desc_nulls_last()))
    best = (
        matched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return best.select(
        *[F.col(c) for c in urls.columns],
        F.coalesce(F.col("allow"), F.lit(True)).alias("allowed"),
        F.col("prefix").alias("matched_prefix"),
        F.col("allow").alias("matched_allow"),
    )


def parse_robots_txt(robots: DataFrame, agent: str = "*",
                     host_col: str = "host",
                     text_col: str = "robots_txt") -> DataFrame:
    """Parse raw robots.txt bodies into the ``(host, prefix, allow)``
    rules relation :func:`apply_robots` consumes — the missing front
    half of the robots stack, fully relational (RFC 9309 §2.2).

    Grammar subset implemented (the part a generic crawler needs):
    ``#`` comments strip to end of line; lines are ``key: value`` with
    case-insensitive keys; consecutive ``User-agent`` lines open ONE
    group (RFC 9309: a start-of-group line may repeat); ``Allow`` /
    ``Disallow`` lines attach to the current group; a group applies
    when any of its agent tokens equals ``agent`` (case-insensitive
    exact product-token match), and — per RFC 9309 §2.2.1 (round-5
    advice: previously a named agent got default-allow from a
    star-only file) — when NO group on a host names the agent
    exactly, that host's ``*`` groups apply instead; an empty
    ``Disallow:`` value means "nothing disallowed" and emits no rule
    (RFC 9309 §2.2.2).  Unknown keys (Crawl-delay, Sitemap) are
    ignored, per the RFC's extensibility rule.  Rule values may carry
    the §2.2.3 ``*`` / trailing-``$`` wildcards — they pass through
    verbatim and :func:`apply_robots` interprets them.

    Relational shape — one pass, no Python: ``posexplode`` the lines,
    assign group ids with a window over (host, line-order) — a group
    starts at a User-agent line whose predecessor is not one (lag) —
    then one aggregation marks each group as matching the agent, and
    the rule lines of matching groups project to the output.  The only
    exchange is keyed on host (the window/group key), the same key the
    downstream join shuffles on.  At 10^8 hosts robots bodies are a
    few KB each — this is a narrow ETL pass, run once per crawl
    snapshot and materialized.

    Exactly SQL-expressible — the DuckDB oracle replays the grammar.
    """
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        # \r?\n: real-world robots.txt often arrives CRLF; splitting on
        # bare \n would leave '\r' glued to agent tokens and prefixes,
        # silently failing every match (review finding).
        F.posexplode(F.split(F.col(text_col), "\r?\n")).alias("pos",
                                                              "raw"),
    ).select(
        "host", "pos",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    parsed = lines.select(
        "host", "pos",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1)))
        .alias("key"),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias("val"),
    ).filter(F.col("key") != "")
    w = Window.partitionBy("host").orderBy("pos")
    grouped = (
        parsed
        .withColumn("_is_agent", (F.col("key") == "user-agent"))
        .withColumn(
            "_starts_group",
            F.col("_is_agent")
            & ~F.coalesce(F.lag("_is_agent").over(w), F.lit(False)))
        .withColumn("grp",
                    F.sum(F.col("_starts_group").cast("int")).over(w))
        .filter(F.col("grp") > 0)   # rules before any User-agent: ignored
    )
    # §2.2.1 fallback: exact-token groups win; hosts with no exact
    # match fall back to their '*' groups.  One extra host-keyed window
    # over the tiny (host, grp) relation — no new exchange key.
    agent_groups = (
        grouped.filter(F.col("_is_agent"))
        .groupBy("host", "grp")
        .agg(F.max((F.lower("val") == agent.lower()).cast("boolean"))
             .alias("_exact"),
             F.max((F.col("val") == "*").cast("boolean")).alias("_star"))
    )
    wh = Window.partitionBy("host")
    matching = (
        agent_groups
        .withColumn("_has_exact", F.max("_exact").over(wh))
        .filter(F.col("_exact")
                | (~F.col("_has_exact") & F.col("_star")))
    )
    return (
        grouped.filter(F.col("key").isin("allow", "disallow"))
        .filter(F.col("val") != "")
        .join(matching.select("host", "grp"), ["host", "grp"])
        .select(
            "host",
            F.col("val").alias("prefix"),
            (F.col("key") == "allow").alias("allow"),
        )
        .distinct()
    )


def sitemap_directives(robots: DataFrame, host_col: str = "host",
                       text_col: str = "robots_txt") -> DataFrame:
    """``Sitemap:`` directives out of raw robots.txt bodies →
    ``(host, sitemap_url)`` — the crawl-seed discovery channel
    ``parse_robots_txt`` deliberately skips (the directive is not
    group-scoped: per the sitemaps.org protocol and RFC 9309's
    extensibility rule it can appear anywhere in the file and applies
    to all agents, so rule-group machinery must NOT see it).

    One narrow pass: explode lines, comment-strip, case-insensitive
    key match, project the absolute url.  Relative values are dropped
    (the protocol requires absolute urls).
    """
    line = F.explode(F.split(F.col(text_col), "\r?\n")).alias("line")
    return (
        robots
        .select(F.col(host_col).alias("host"), line)
        .select("host",
                F.regexp_extract(F.regexp_replace("line", "#.*", ""),
                                 r"(?i)^\s*sitemap\s*:\s*(\S+)\s*$", 1)
                .alias("sitemap_url"))
        .filter(F.col("sitemap_url").rlike("(?i)^https?://"))
    )


def extract_sitemap_urls(sitemaps: DataFrame, host_col: str = "host",
                         xml_col: str = "xml") -> DataFrame:
    """Sitemap XML bodies → ``(host, url, is_index)`` — the seed urls
    a frontier starts from (compose with :func:`apply_robots` to
    filter and :func:`frontier_schedule` to order).

    Per the sitemaps.org protocol, both document kinds carry their
    entries in ``<loc>`` elements: ``<urlset>`` lists page urls,
    ``<sitemapindex>`` lists more sitemaps (``is_index`` lets the
    caller loop: fetch the children, feed them back in).  Extraction
    is one relational ``regexp_extract_all`` + ``explode`` — a
    full XML parse buys nothing here because ``<loc>`` may not nest.
    A 50k-url sitemap is ~5 MB of XML: one row, one task, bounded.
    """
    locs = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"<loc>\s*([^<]*?)\s*</loc>"), F.lit(1))
    return (
        sitemaps
        .select(F.col(host_col).alias("host"),
                F.col(xml_col).rlike("(?i)<sitemapindex")
                .alias("is_index"),
                F.explode(locs).alias("url"))
        .filter(F.col("url").rlike("(?i)^https?://"))
        .select("host", "url", "is_index")
    )


def frontier_schedule(urls: DataFrame, host_col: str = "host",
                      priority_col: str = "priority",
                      delay_sec: int = 5,
                      url_col: str = "url") -> DataFrame:
    """Polite crawl-frontier scheduling: within each host, order
    candidate urls by priority (e.g. the PageRank of their host, a
    freshness score) and assign fetch slots ``delay_sec`` apart — the
    one-request-per-host-per-delay contract every polite crawler
    honors (RFC 9309 crawl-delay semantics).

    Relational shape: ONE window keyed on host (row_number by priority
    desc, url tiebreak for determinism) → slot arithmetic.  The shuffle
    key is the host, so a 10^12-url frontier partitions by its ~10^8
    hosts; skew (one mega-host) is bounded because a host's schedule
    is inherently serial — the long pole is the crawl itself, not the
    plan.  Returns every input row with ``slot`` (0-based fetch index
    within the host) and ``fetch_offset_sec`` (slot * delay).
    """
    w = (Window.partitionBy(host_col)
         .orderBy(F.col(priority_col).desc_nulls_last(), F.col(url_col)))
    return (
        urls.withColumn("slot", F.row_number().over(w) - 1)
        .withColumn("fetch_offset_sec",
                    (F.col("slot") * delay_sec).cast("long"))
    )
