"""Structured page metadata (extractors/page_meta.py, round 5i).

Covers: OpenGraph precedence over <title> over JSON-LD headline,
canonical/license links, published-time precedence
(article:published_time > JSON-LD datePublished > meta[name=date]),
JSON-LD arrays/@graph/@type lists/{"@id"} license form, entity
unescape in titles, hostile-markup and every-prefix never-raise
behavior, and the page_metadata Spark operator's all-null row for
metadata-free pages.
"""

from document_convert_to__markdown_spark.extractors.page_meta import (
    EMPTY_PAGE_META, extract_page_meta,
)

FULL = """<!doctype html><html><head>
<title>Fallback &amp; Title</title>
<meta property="og:title" content="OG Title">
<meta property="og:type" content="article">
<meta property="og:image" content="https://ex.com/i.png">
<meta property="og:site_name" content="Example News">
<meta property="og:description" content="OG desc">
<meta property="article:published_time" content="2023-05-01T10:00:00Z">
<meta name="description" content="Meta desc">
<meta name="date" content="2001-01-01">
<link rel="canonical" href="https://example.com/a">
<link rel="license" href="https://creativecommons.org/licenses/by/4.0/">
<script type="application/ld+json">
{"@context":"https://schema.org","@type":"NewsArticle",
 "headline":"LD Headline","datePublished":"2023-05-01",
 "license":{"@id":"https://cc.org/by"},
 "@graph":[{"@type":"Organization"},{"@type":["Person","Author"]}]}
</script>
</head><body><p>hi</p></body></html>"""


def test_full_page_precedence():
    m = extract_page_meta(FULL)
    assert m.title == "OG Title"                # og > <title> > headline
    assert m.description == "OG desc"
    assert m.canonical_url == "https://example.com/a"
    assert m.og_type == "article"
    assert m.og_image == "https://ex.com/i.png"
    assert m.site_name == "Example News"
    assert m.published_time == "2023-05-01T10:00:00Z"
    assert m.license == "https://creativecommons.org/licenses/by/4.0/"
    assert m.jsonld_types == ["Author", "NewsArticle",
                              "Organization", "Person"]


def test_fallback_chains():
    m = extract_page_meta(
        "<html><head><title> T &gt; x </title>"
        "<meta name=date content=1999-09-09></head></html>")
    assert m.title == "T > x"
    assert m.published_time == "1999-09-09"
    ld = ('<html><script type="application/ld+json">'
          '{"@type":"BlogPosting","headline":"H3",'
          '"datePublished":"2020-01-01","license":"CC0"}'
          "</script></html>")
    m2 = extract_page_meta(ld)
    assert m2.title == "H3" and m2.published_time == "2020-01-01"
    assert m2.license == "CC0"
    assert m2.jsonld_types == ["BlogPosting"]
    # JSON-LD top-level array form
    m3 = extract_page_meta(
        '<script type="application/ld+json">'
        '[{"@type":"WebSite"},{"@type":"SearchAction"}]</script>')
    assert m3.jsonld_types == ["SearchAction", "WebSite"]


def test_hostile_and_prefix_never_raise():
    assert extract_page_meta("") == EMPTY_PAGE_META
    assert extract_page_meta("no tags") == EMPTY_PAGE_META
    extract_page_meta('<script type="application/ld+json">{bad')
    extract_page_meta("<meta " * 500)
    extract_page_meta("<title>" + "a" * 10000)
    for cut in range(0, len(FULL), 7):
        m = extract_page_meta(FULL[:cut])
        assert isinstance(m.jsonld_types, list)


def test_page_metadata_operator(spark):
    from document_convert_to__markdown_spark.operators.pagemeta import (
        page_metadata,
    )

    rows = [("a", FULL),
            ("b", "<html><head><title>B</title></head></html>"),
            ("c", "<p>bare paragraph</p>"),
            ("d", None)]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r["url"]: r for r in page_metadata(df).collect()}
    assert got["a"]["title"] == "OG Title"
    assert got["a"]["canonical_url"] == "https://example.com/a"
    assert got["a"]["jsonld_types"] == ["Author", "NewsArticle",
                                        "Organization", "Person"]
    assert got["b"]["title"] == "B" and got["b"]["og_type"] is None
    assert got["c"]["title"] is None
    assert got["d"]["title"] is None and got["d"]["jsonld_types"] == []
    assert len(got) == 4                        # no silent drops


def test_title_scoping():
    """Only the FIRST document title counts: inline-SVG <title> is a
    tooltip (ubiquitous accessible-icon markup), and any later
    <title> is noise (round-5 review regression)."""
    m = extract_page_meta(
        "<head><title>Page</title></head><body>"
        "<svg><title>star icon</title><path/></svg>"
        "<svg/><title>late noise</title></body>")
    assert m.title == "Page"
    # svg-first page still falls through to the real head title
    m2 = extract_page_meta(
        "<body><svg><title>icon</title></svg></body>"
        "<head><title>Real</title></head>")
    assert m2.title == "icon" or m2.title == "Real"  # first non-svg
    assert m2.title == "Real"


def test_link_rel_token_list():
    """rel is a space-separated token list (HTML §4.6.6.10):
    multi-token rel values must still surface canonical/license."""
    m = extract_page_meta(
        '<link rel="canonical nofollow" href="https://x/1">'
        '<link rel="CC license" href="https://x/lic">')
    assert m.canonical_url == "https://x/1"
    assert m.license == "https://x/lic"
