# -*- coding: utf-8 -*-
"""WHATWG-ordered charset sniffing: pure logic + Spark wrapper."""

import pytest

from document_convert_to__markdown_spark.extractors.charset import (
    sniff_decode,
    sniff_encoding,
)


class TestSniffPure:
    def test_bom_beats_meta(self):
        # BOM is authoritative even when a meta label disagrees.
        blob = b"\xef\xbb\xbf" + b'<meta charset="shift_jis">ok'
        text, enc, how = sniff_decode(blob)
        assert (enc, how) == ("utf-8-sig", "bom")
        assert text == '<meta charset="shift_jis">ok'

    def test_utf16_boms_strip_and_decode(self):
        for codec, enc in (("utf-16", "utf-16-le"),):
            text, got, how = sniff_decode("héllo wörld".encode(codec))
            assert (got, how) == (enc, "bom")
            assert text == "héllo wörld"
        be = "﻿héllo".encode("utf-16-be")
        text, got, how = sniff_decode(be[:2] + "héllo".encode("utf-16-be"))
        assert (got, how) == ("utf-16-be", "bom")
        assert text == "héllo"

    def test_meta_labels_normalize_per_whatwg(self):
        for label, codec in (("ISO-8859-1", "cp1252"),
                             ("latin1", "cp1252"),
                             ("GB2312", "gbk"),
                             ("Shift_JIS", "shift_jis"),
                             ("utf8", "utf-8")):
            blob = f'<meta charset="{label}">x'.encode("ascii")
            assert sniff_encoding(blob) == (codec, "meta")

    def test_meta_utf16_label_treated_as_utf8(self):
        # WHATWG: a meta-declared utf-16 is a lie (the prescan itself
        # read ASCII bytes) — treat as utf-8.
        assert sniff_encoding(b'<meta charset="utf-16le">x') == (
            "utf-8", "meta")

    def test_meta_only_scans_first_1kb(self):
        blob = b" " * 1024 + b'<meta charset="koi8-r">'
        assert sniff_encoding(blob)[1] != "meta"

    def test_strict_utf8_then_cp1252_fallback(self):
        assert sniff_encoding(b"caf\xc3\xa9")[0] == "utf-8"
        text, enc, how = sniff_decode(b"caf\xe9 \x93q\x94")
        assert (enc, how) == ("cp1252", "fallback")
        assert text == "café “q”"

    def test_never_raises_on_garbage(self):
        for blob in (b"", b"\xff\xfe", b"\x81\x8d\x8f\x90\x9d",
                     b"\xe9", b"\xef\xbb"):
            text, enc, how = sniff_decode(blob)
            assert isinstance(text, str)

    def test_charset_outside_meta_tag_is_ignored(self):
        # A stray charset= in body text or a link url must not hijack
        # the decode — only <meta ...charset=...> counts.
        for blob in (b'see <a href="/x?charset=iso-8859-1">link</a>',
                     b"the word charset=latin1 in prose"):
            assert sniff_encoding(blob) == ("utf-8", "utf8")

    def test_unknown_label_falls_through(self):
        # An unrecognized charset label must not crash — fall through
        # to the utf-8 trial.
        assert sniff_encoding(b'<meta charset="klingon-8">ok') == (
            "utf-8", "utf8")


class TestSniffFuzz:
    def test_arbitrary_bytes_never_raise(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.binary(max_size=2048))
        def check(blob):
            text, enc, how = sniff_decode(blob)
            assert isinstance(text, str)
            assert how in ("bom", "meta", "utf8", "fallback")

        check()

    def test_wet_parser_never_raises_on_garbage(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from document_convert_to__markdown_spark.sources.warc import (
            texts_from_wet,
        )

        @settings(max_examples=200, deadline=None)
        @given(st.binary(max_size=4096))
        def check(blob):
            for url, ts, text in texts_from_wet(blob):
                assert isinstance(text, str)

        check()


class TestDetectAndDecodeSpark:
    def test_schema_counts_and_nulls(self, spark):
        from document_convert_to__markdown_spark.operators.charset import (
            detect_and_decode,
        )

        rows = [
            (1, bytearray(b"\xef\xbb\xbfplain")),
            (2, bytearray("ü".encode("utf-16"))),
            (3, bytearray(b'<meta charset="latin1">caf\xe9')),
            (4, bytearray(b"raw \x93bytes\x94")),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = detect_and_decode(df, blob_col="payload")
        assert out.columns == ["doc_id", "text", "encoding", "enc_how"]
        got = {r["doc_id"]: r for r in out.collect()}
        assert len(got) == 5                      # no silent drops
        assert got[1]["text"] == "plain"
        assert got[2]["text"] == "ü"
        assert got[3]["text"] == '<meta charset="latin1">café'
        assert got[4]["text"] == "raw “bytes”"
        assert got[5]["text"] is None and got[5]["encoding"] is None
        assert {got[i]["enc_how"] for i in (1, 2, 3, 4)} == {
            "bom", "meta", "fallback"}

    def test_pages_relation_text_column_is_replaced_not_duplicated(
            self, spark):
        # Review finding: the standard pages relation already carries
        # 'text'; the default keep list must drop colliding inputs
        # instead of producing a duplicate-name schema that crashes
        # the Arrow kernel.
        from document_convert_to__markdown_spark.operators.charset import (
            detect_and_decode,
        )

        pages = spark.createDataFrame(
            [("https://a/", bytearray(b"\xef\xbb\xbfbody"),
              "stale oracle text", "en")],
            "url string, html binary, text string, lang string")
        out = detect_and_decode(pages, blob_col="html")
        assert out.columns == ["url", "lang", "text", "encoding",
                               "enc_how"]
        row = out.collect()[0]
        assert row["text"] == "body"          # decoded, not the stale col
        assert row["lang"] == "en"

    def test_explicit_keep_cols_collision_raises(self, spark):
        from document_convert_to__markdown_spark.operators.charset import (
            detect_and_decode,
        )

        df = spark.createDataFrame([("x", bytearray(b"y"))],
                                   "text string, payload binary")
        with pytest.raises(ValueError, match="collide"):
            detect_and_decode(df, blob_col="payload",
                              keep_cols=["text"])

    def test_keep_cols_containing_blob_col_raises(self, spark):
        """Round-5 advice: keep_cols with the blob column produced a
        duplicate column in the select, making pdf[blob_col] a frame
        and crashing the kernel — refused up front now."""
        from document_convert_to__markdown_spark.operators.charset import (
            detect_and_decode,
        )

        df = spark.createDataFrame([(1, bytearray(b"y"))],
                                   "doc_id long, payload binary")
        with pytest.raises(ValueError, match="blob"):
            detect_and_decode(df, blob_col="payload",
                              keep_cols=["doc_id", "payload"])
