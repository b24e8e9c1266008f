"""URL canonicalization / registered-domain column functions."""

from pyspark.sql import functions as F

from document_convert_to__markdown_spark.functions.url import (
    canonicalize_url,
    registered_domain,
    url_host,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r["c"] for r in
            df.select(canonicalize_url(F.col("url")).alias("c")).collect()]


def test_canonicalize_case_port_fragment_tracking_sort(spark):
    got = _canon(spark, [
        "HTTPS://WWW.Example.COM:443/Path/Item?utm_source=x&b=2&a=1#frag",
        "http://example.com:80/",
        "https://example.com",                       # empty path -> /
        "http://user:pw@Example.com/a",              # userinfo stripped
        "https://ex.com/p?fbclid=abc&gclid=1&mc_eid=7",  # all tracking
        "not a url at all",                          # passthrough
        "https://github.com/o/r/blob/f?ref=dev",     # ref selects content
    ])
    assert got[0] == "https://www.example.com/Path/Item?a=1&b=2"
    assert got[1] == "http://example.com/"
    assert got[2] == "https://example.com/"
    assert got[3] == "http://example.com/a"
    assert got[4] == "https://ex.com/p"
    assert got[5] == "not a url at all"
    # ref is NOT a tracking param: stripping it would merge distinct
    # pages through the dedup key (review r3)
    assert got[6] == "https://github.com/o/r/blob/f?ref=dev"


def test_canonicalize_preserves_path_case_and_real_params(spark):
    (got,) = _canon(
        spark, ["https://Ex.com/CaseSensitive/Path?id=AbC&utm_medium=m"])
    assert got == "https://ex.com/CaseSensitive/Path?id=AbC"


def test_canonicalize_non_default_port_kept(spark):
    (got,) = _canon(spark, ["https://ex.com:8443/x", ])
    assert got == "https://ex.com:8443/x"


def test_registered_domain_and_host(spark):
    rows = [
        ("https://WWW.news.Example.CO.UK:443/a", "www.news.example.co.uk",
         "example.co.uk"),
        ("http://a.b.c.example.com/x", "a.b.c.example.com", "example.com"),
        ("http://example.com/", "example.com", "example.com"),
        ("http://localhost/", "localhost", "localhost"),
    ]
    df = spark.createDataFrame([(u,) for u, _h, _d in rows], ["url"])
    got = df.select(
        url_host(F.col("url")).alias("h"),
        registered_domain(url_host(F.col("url"))).alias("d"),
    ).collect()
    for (u, want_h, want_d), r in zip(rows, got):
        assert r["h"] == want_h, u
        assert r["d"] == want_d, u


def test_canonicalize_is_idempotent(spark):
    """Canonical output must be a fixed point: canonicalizing twice
    changes nothing — otherwise two passes of the pipeline would emit
    different dedup keys for the same page."""
    urls = [
        "HTTPS://WWW.Example.COM:443/Path?utm_source=x&b=2&a=1#f",
        "http://example.com:80",
        "https://a.b.C.co.UK/x/y/?z=1&y=2&utm_a=1",
        "http://user@ex.com:8080/p?gclid=1",
        "https://ex.com/p?a=1?b=2",        # ? inside query stays put
        "ftp://Files.Example.com:21/pub",  # non-http scheme, port kept
        "no scheme here",
        "https://ex.com/trailing/?",
        "http://[weird]/path",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = canonicalize_url(F.col("url"))
    got = df.select(once.alias("c1"),
                    canonicalize_url(once).alias("c2")).collect()
    for r in got:
        assert r["c1"] == r["c2"], r
