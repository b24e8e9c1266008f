"""Property-based robustness: the extractor is total, pure, and closed
over arbitrary byte inputs (error isolation is a per-row contract — no
payload may ever raise out of the UDF body)."""

from hypothesis import given, settings, strategies as st

from document_convert_to__markdown_spark.extractors.extract import (
    STATUS_OK,
    extract_document,
)

VALID_STATUSES = {"ok", "failed", "skipped_empty", "skipped_unsupported",
                  "skipped_too_large"}

MAGIC_PREFIXES = [b"", b"%PDF-1.4\n", b"PK\x03\x04", b"<html>",
                  b"<!DOCTYPE html>", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff",
                  b"GIF89a", b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1",
                  b"{\\rtf1\\ansi ", b"II*\x00", b"MM\x00*"]


@settings(max_examples=200, deadline=None)
@given(
    prefix=st.sampled_from(MAGIC_PREFIXES),
    body=st.binary(max_size=4096),
    url_path=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    ),
)
def test_extract_never_raises_and_is_pure(prefix, body, url_path):
    url = f"https://fuzz.example/{url_path}"
    payload = prefix + body
    a = extract_document(url, payload)
    b = extract_document(url, payload)
    assert a.status in VALID_STATUSES
    # purity: identical inputs → identical outputs (byte-identical markdown)
    assert a == b
    # contract: markdown present iff conversion succeeded
    assert (a.markdown is not None) == (a.status == STATUS_OK)
    # assets always consistent with the reported count
    assert len(a.assets) == a.n_images


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=1, max_size=512))
def test_unknown_bytes_become_status_rows(payload):
    doc = extract_document("https://fuzz.example/x", payload)
    assert doc.status in VALID_STATUSES
    assert doc.error is None or doc.status == "failed"


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=2000))
def test_text_payloads_roundtrip_without_failure(text):
    doc = extract_document("https://fuzz.example/t", text.encode("utf-8"))
    # text payloads may sniff as text/html/unknown, but never crash the row
    assert doc.status in VALID_STATUSES


# --------------------------------------------------------------------------
# WARC parser totality / roundtrip
# --------------------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(junk=st.binary(max_size=2048))
def test_warc_parser_total_on_garbage(junk):
    """iter_records never raises on arbitrary bytes — truncated heads,
    bogus lengths, corrupt/truncated gzip and binary noise end
    iteration (salvaging complete members) instead."""
    from document_convert_to__markdown_spark.sources.warc import iter_records

    for variant in (junk, b"WARC/1.0\r\n" + junk, b"\x1f\x8b" + junk):
        records = list(iter_records(variant))
        assert all(r.payload is not None for r in records)


@settings(max_examples=100, deadline=None)
@given(
    bodies=st.lists(st.binary(max_size=512), min_size=1, max_size=8),
    compress=st.booleans(),
)
def test_warc_roundtrip_arbitrary_payloads(bodies, compress):
    """write → parse recovers every record body byte-exact, in order,
    for arbitrary binary payloads (incl. ones containing CRLFs and
    fake WARC headers)."""
    import io

    from document_convert_to__markdown_spark.sources.warc import (
        http_response_body,
        iter_records,
        write_warc,
    )

    rows = [(f"https://fuzz.example/{i}", b) for i, b in enumerate(bodies)]
    buf = io.BytesIO()
    write_warc(rows, buf, compress=compress)
    recs = list(iter_records(buf.getvalue()))
    assert len(recs) == len(bodies)
    for rec, (url, body) in zip(recs, rows):
        assert rec.target_uri == url
        assert http_response_body(rec.payload) == body


# --------------------------------------------------------------------------
# Fast HTML tokenizer == stdlib parser (DOM parity)
# --------------------------------------------------------------------------

def _stdlib_dom(text):
    from document_convert_to__markdown_spark.extractors.html_extractor import (
        _DomBuilder,
    )

    b = _DomBuilder()
    try:
        b.feed(text)
        b.close()
    except Exception:
        pass
    return b.root


def _dom_repr(node):
    if node.tag is None:
        return ("#text", node.text)
    return (node.tag, sorted((node.attrs or {}).items()),
            [_dom_repr(c) for c in node.children])


_HTML_CHUNKS = st.sampled_from([
    "<p>", "</p>", "<div class='x'>", '<a href="u?a=1&amp;b=2">',
    "</a>", "text ", "a &amp; b", "&lt;tag&gt;", "&#65;", "&nbsp;",
    "<br/>", "<br />", "<img src=pic.png>", "<ul><li>one<li>two</ul>",
    "<script>var x = '<div>' && 1;</script>", "</div>",
    "<style>p > a { color: red }</style>", "<!-- note -->",
    "<!-- unbalanced <div> -->", "<!doctype html>", "<?pi data?>",
    "x < y", "5<6", "<", ">", "&", "&bogus;", "&amp", "<table><tr><td>c",
    "<EM>Up</EM>", "<input value=''>", "<a b=1 c='2' d=\"3\" e>",
    "\n  ", "<h2>t</h2>", "<td>", "<span data=a/>", "<a/ >", "<a href=>",
    "<![CDATA[raw]]>", "</>", "<foo.bar:baz>", "<div\nid='n'>",
    "<script></SCRIPT >", "<script></scriptx></script>",
    "<a href==/page.html>", "<a b==='x'>", "<a b= =x>", "<a b==>",
])


@settings(max_examples=300, deadline=None)
@given(chunks=st.lists(_HTML_CHUNKS, min_size=0, max_size=12))
def test_fast_tokenizer_matches_stdlib_dom(chunks):
    """The fast scanner (or its fallback) must build the exact DOM the
    stdlib parser builds, for clean HTML, quirks and raw-text modes."""
    from document_convert_to__markdown_spark.extractors.html_extractor import (
        parse_dom,
    )

    text = "".join(chunks)
    assert _dom_repr(parse_dom(text)) == _dom_repr(_stdlib_dom(text))


@settings(max_examples=150, deadline=None)
@given(text=st.text(
    alphabet=st.sampled_from(list("<>/!?&;=\"' abc-#0")), max_size=60))
def test_fast_tokenizer_matches_stdlib_on_noise(text):
    from document_convert_to__markdown_spark.extractors.html_extractor import (
        parse_dom,
    )

    assert _dom_repr(parse_dom(text)) == _dom_repr(_stdlib_dom(text))


@given(
    members=st.lists(
        st.tuples(st.text(min_size=1, max_size=60).filter(
            lambda s: "\x00" not in s),
            st.binary(max_size=800)),
        min_size=0, max_size=12, unique_by=lambda t: t[0]),
    container=st.sampled_from(["zip", "tar", "tar.gz"]),
)
@settings(max_examples=60, deadline=None)
def test_archive_members_roundtrip_arbitrary_payloads(members, container):
    """Any (name, payload) set survives a zip/tar/tar.gz round trip
    through iter_archive_members byte-identically, with only 'ok'
    statuses (plus the empty-archive marker when there are none)."""
    import gzip
    import io
    import tarfile
    import zipfile

    from document_convert_to__markdown_spark.sources.archive import (
        iter_archive_members,
        member_name_url,
        shard_member_name,
    )

    # archive member names: percent-encode like the shard packer does,
    # so arbitrary unicode/controls are in scope without fighting the
    # container's own name rules
    named = [(shard_member_name(n), d) for n, d in members]
    buf = io.BytesIO()
    if container == "zip":
        with zipfile.ZipFile(buf, "w") as zf:
            for n, d in named:
                zf.writestr(n, d)
        blob = buf.getvalue()
    else:
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for n, d in named:
                info = tarfile.TarInfo(n)
                info.size = len(d)
                tf.addfile(info, io.BytesIO(d))
        blob = buf.getvalue()
        if container == "tar.gz":
            blob = gzip.compress(blob, mtime=0)

    rows = list(iter_archive_members(blob, "t"))
    if not members:
        assert [r[3] for r in rows] == ["skipped_empty_archive"]
        return
    got = {member_name_url(m): d for m, d, _sz, s in rows if s == "ok"}
    assert got == dict(members)
    assert all(s == "ok" for _, _, _, s in rows)
