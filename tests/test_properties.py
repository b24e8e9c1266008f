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
