"""SRT / WebVTT timed text (extractors/captions.py, round 5i).

Covers: SRT numbered blocks (comma and dot millisecond separators,
multi-line cue text, CRLF), WebVTT header/NOTE/STYLE/cue-id/cue-
settings grammar with optional hours, inline tag stripping + entity
unescape, sniffer integration (the 26th/27th formats must not steal
any existing format's payloads), extraction-dispatch transcripts
(status ok, deterministic), every-prefix never-raise fuzz, and the
caption_cues Spark operator incl. the kind='none' no-silent-drops
row.
"""

import numpy as np

from document_convert_to__markdown_spark.extractors.captions import (
    captions_to_markdown, parse_captions, parse_srt, parse_webvtt,
    sniff_captions,
)

SRT = ("1\r\n00:00:01,000 --> 00:00:04,000\r\nHello <i>there</i>\r\n"
       "\r\n2\r\n00:00:05.500 --> 00:00:07.250\r\nSecond line\r\n"
       "continues here\r\n\r\n")
VTT = ("﻿WEBVTT - demo\nKind: captions\n\n"
       "NOTE a comment\nspanning lines\n\n"
       "id-7\n00:01.000 --> 00:04.000 align:start position:10%\n"
       "<v Ann>Hi &amp; bye\n\n"
       "STYLE\n::cue { color: red }\n\n"
       "01:00:00.000 --> 01:00:02.500\n<00:00:01.000>Timed tag\n")


def test_srt_blocks():
    cues = parse_srt(SRT)
    assert [tuple(c) for c in cues] == [
        (0, 1000, 4000, "Hello there"),
        (1, 5500, 7250, "Second line\ncontinues here")]


def test_webvtt_grammar():
    cues = parse_webvtt(VTT)
    assert [tuple(c) for c in cues] == [
        (0, 1000, 4000, "Hi & bye"),
        (1, 3600000, 3602500, "Timed tag")]
    assert parse_webvtt("not vtt") == []
    assert parse_webvtt("WEBVTT\n\njunk block\nwithout timestamps") == []


def test_sniffer_and_dispatch():
    from document_convert_to__markdown_spark.extractors import (
        extract_document,
    )
    from document_convert_to__markdown_spark.extractors.sniffer import (
        sniff_format,
    )

    assert sniff_format(SRT.encode()) == "srt"
    assert sniff_format(VTT.encode("utf-8")) == "vtt"
    # timed text must not steal neighbors' payloads
    assert sniff_format(b"<html><p>1</p></html>") == "html"
    assert sniff_format(b"12345 plain text, not a caption") == "text"

    d = extract_document("http://x/a.srt", SRT.encode())
    assert d.format == "srt" and d.status == "ok"
    assert "SubRip" in d.markdown and "Hello there" in d.markdown
    d2 = extract_document("http://x/a.vtt", VTT.encode("utf-8"))
    assert d2.format == "vtt" and d2.status == "ok"
    assert d.markdown == extract_document("http://x/a.srt",
                                          SRT.encode()).markdown
    # zero-cue caption file → unsupported, not a crash
    d3 = extract_document("http://x/e.vtt", b"WEBVTT\n\ngarbage")
    assert d3.status == "skipped_unsupported"


def test_every_prefix_never_raises():
    for blob in (SRT.encode(), VTT.encode("utf-8")):
        for cut in range(len(blob) + 1):
            kind, cues = parse_captions(blob[:cut])
            assert isinstance(kind, str)
    assert captions_to_markdown(b"", "x") is None


def test_caption_cues_operator(spark):
    from document_convert_to__markdown_spark.operators.multimodal import (
        caption_cues,
    )

    rows = [("srt", bytearray(SRT.encode())),
            ("vtt", bytearray(VTT.encode("utf-8"))),
            ("junk", bytearray(b"not captions at all"))]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = caption_cues(df).collect()
    by_url = {}
    for r in got:
        by_url.setdefault(r["url"], []).append(r)
    assert len(by_url["srt"]) == 2
    assert by_url["srt"][0]["kind"] == "srt"
    assert sorted(r["start_ms"] for r in by_url["vtt"]) == [1000,
                                                            3600000]
    assert len(by_url["junk"]) == 1
    assert by_url["junk"][0]["kind"] == "none"
    assert by_url["junk"][0]["cue_idx"] is None


def test_fuzz_random_text_never_misparses(spark=None):
    """Random printable junk: parse_captions returns ('', []) or a
    valid cue list; sniffer never claims HTML/text payloads."""
    rng = np.random.RandomState(7)
    alphabet = "0123456789:,.-> \nabcWEBVTT"
    for _ in range(300):
        n = int(rng.randint(1, 200))
        s = "".join(rng.choice(list(alphabet)) for _ in range(n))
        kind, cues = parse_captions(s.encode())
        for c in cues:
            assert c.end_ms >= c.start_ms >= 0 and c.text
