"""URL normalization — pure Catalyst column expressions.

Crawl curation lives and dies on url identity: the dedup keep-first
key, the resume anti-join key, the domain-cap quota key are all urls,
and the same page arrives as ``HTTP://Example.COM:80/a?b=2&a=1#frag``
and ``http://example.com/a?a=1&b=2``.  These helpers fold that spelling
variance relationally — regex + higher-order array functions only, no
Python, so they run inside whole-stage codegen on all 10^12 rows and
mirror exactly into the DuckDB oracle dialect.

Canonicalization rules (the conservative, always-safe subset):
- drop the fragment;
- lowercase scheme and host (path/query case is preserved — it is
  significant on most servers);
- strip userinfo and the scheme-default port (http:80 / https:443);
- empty path becomes "/";
- drop tracking parameters (utm_*, fbclid, gclid, msclkid, mc_eid,
  igshid) and sort the survivors — parameter order is almost never
  significant, and these params never identify content.  ``ref`` /
  ``ref_src`` are deliberately NOT in the default list: on real sites
  ``ref`` selects content (a git branch, a referrer-scoped page), and
  since the canonical url is a dedup/keep-first key, stripping it
  would silently merge distinct pages (review r3);
- a string with no ``scheme://`` passes through unchanged (not a url).

``registered_domain`` is the quota/grouping key for ``domain_cap``: a
last-two-labels heuristic widened by a small static set of common
second-level public suffixes (co.uk, com.au, ...).  A production system
would ship the full Mozilla public-suffix list as a broadcast lookup —
same plan shape, longer list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
TRACKING_PARAM_RE = (r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid"
                     r"|igshid)(=|$)")

# Common second-level public suffixes (static subset of the PSL).
SECOND_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "gov.uk", "ac.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tw", "com.sg", "co.za", "com.ar",
]


def url_host(url: Column) -> Column:
    """Lowercased host (no scheme, userinfo, port, path)."""
    hostport = F.regexp_extract(url, _HOST_RE, 1)
    return F.lower(F.regexp_replace(hostport, r":\d+$", ""))


def url_path(url: Column) -> Column:
    """Path component of a url ('' → '/') — the robots-resolution key."""
    raw = F.regexp_extract(url, _PATH_RE, 1)
    return F.when(raw == "", F.lit("/")).otherwise(raw)


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the primary
    sort key of the Common Crawl / Internet Archive CDX index (public
    spec: github.com/internetarchive/surt; IIPC CDX file format):
    scheme and port dropped, host lowercased and label-reversed with
    commas, then ``)`` and the path + sorted-significant query —
    ``https://docs.example.com/a?x=1`` → ``com,example,docs)/a?x=1``.
    Reversing the host makes lexicographic order group a domain's
    subdomains together, which is what lets a sorted CDX answer
    per-domain range scans — the same locality trick ``zorder_layout``
    plays for two dimensions.  All Catalyst (split/reverse/concat); no
    Python.  ``www`` stripping is deliberately NOT applied (that is a
    canonicalizer policy — compose with ``canonicalize_url`` first if
    wanted)."""
    host = url_host(url)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    # Query params sort (the SURT/CDX canonical form): two captures of
    # the same resource differing only in param order must get the
    # same sort key, or sorted-index range lookups miss.
    query = F.regexp_extract(url, _QUERY_RE, 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev, F.lit(")"), url_path(url),
        F.when(query == "", F.lit(""))
        .otherwise(F.concat(F.lit("?"), sorted_q)))


def registered_domain(host: Column) -> Column:
    """Registrable domain from a host: last two labels, or three when
    the last two are a known second-level suffix (``a.b.co.uk`` →
    ``b.co.uk``).  Bare/short hosts pass through."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, n - 1, 2), ".")
    last3 = F.array_join(F.slice(parts, n - 2, 3), ".")
    return (
        F.when(n <= 2, host)
        .when(last2.isin(SECOND_LEVEL_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical url spelling per the module rules; non-urls unchanged."""
    u = F.regexp_replace(url, "#.*", "")  # defragment first
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    raw_path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)

    query = F.regexp_extract(u, _QUERY_RE, 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(kept), "&")

    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(scheme == "", url).otherwise(canon)
