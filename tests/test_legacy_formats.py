# -*- coding: utf-8 -*-
"""Round-2 format families: legacy OLE2 Office (.doc/.xls/.ppt), RTF,
TIFF, TSV — sniffing, extraction content, unicode, and robustness
(VERDICT.md round 1 "What's missing" items 1-4)."""

import random

from document_convert_to__markdown_spark.data import synth
from document_convert_to__markdown_spark.extractors.extract import extract_document
from document_convert_to__markdown_spark.extractors.ole2 import (
    CompoundFile,
    extract_doc_text,
)
from document_convert_to__markdown_spark.extractors.rtf_extractor import rtf_to_text
from document_convert_to__markdown_spark.extractors.sniffer import sniff_format


def test_sniff_new_magics():
    rng = random.Random(5)
    assert sniff_format(synth.make_doc(rng, "en", 1, 1.0)) == "doc"
    assert sniff_format(synth.make_xls(rng, "en", 2, 1.0)) == "xls"
    assert sniff_format(synth.make_ppt(rng, "en", 3, 1.0)) == "ppt"
    assert sniff_format(synth.make_rtf(rng, "en", 4, 1.0)) == "rtf"
    assert sniff_format(synth.make_tiff(rng, 8, 8)) == "tiff"
    assert sniff_format(synth.make_tsv(rng, "en", 5, 1.0)) == "tsv"


def test_cfb_stream_roundtrip():
    payload = synth._make_cfb([("Alpha", b"A" * 100), ("Beta", b"B" * 9000)])
    cf = CompoundFile(payload)
    assert set(cf.stream_names()) == {"Alpha", "Beta"}
    # padded to the 4096 mini-cutoff; content prefix must round-trip
    assert cf.read_stream("Alpha")[:100] == b"A" * 100
    assert cf.read_stream("Beta")[:9000] == b"B" * 9000
    assert cf.read_stream("Gamma") is None


def test_doc_piece_table_text_roundtrip():
    rng = random.Random(11)
    payload = synth.make_doc(rng, "en", 7, 1.0)
    text = extract_doc_text(payload)
    assert text.startswith("Legacy doc 7 heading")
    assert "\n" in text  # \r paragraph marks normalized


def test_doc_unicode_cjk():
    rng = random.Random(12)
    payload = synth.make_doc(rng, "zh", 8, 1.0)
    text = extract_doc_text(payload)
    assert any(ord(c) > 0x4E00 for c in text)  # CJK survived UTF-16 pieces


def test_xls_cells_render_as_table():
    rng = random.Random(13)
    doc = extract_document("http://x/sheet", synth.make_xls(rng, "en", 9, 1.0))
    assert doc.status == "ok" and doc.format == "xls"
    assert "## Sheet1" in doc.markdown
    assert "| h0 | h1" in doc.markdown
    assert "| --- |" in doc.markdown


def test_ppt_slides_and_titles():
    rng = random.Random(14)
    doc = extract_document("http://x/deck", synth.make_ppt(rng, "en", 10, 1.5))
    assert doc.status == "ok" and doc.format == "ppt"
    assert "<!-- Slide number: 1 -->" in doc.markdown
    assert "## Slide 1 title for doc 10" in doc.markdown


def test_rtf_strips_destinations_and_decodes_unicode():
    raw = (rb"{\rtf1\ansi{\fonttbl{\f0 Arial;}}{\colortbl;\red1\green2\blue3;}"
           b"\\f0 Hello \\u21517? World\\par {\\*\\generator synth}"
           rb"Bold: {\b text} \'e9nd\par}")
    text = rtf_to_text(raw)
    assert "Arial" not in text and "generator" not in text
    assert "Hello 名 World" in text
    assert "Bold: text" in text
    assert "énd" in text  # \'e9 hex escape via cp1252


def test_tiff_meta_both_endians():
    from document_convert_to__markdown_spark.extractors.image_extractor import (
        image_meta,
    )

    le = synth.make_tiff(random.Random(1), 20, 12)
    meta = image_meta(le, "tiff")
    assert (meta.width, meta.height, meta.format) == (20, 12, "TIFF")
    # big-endian header: sniffed but not synthesized — hand-build one
    import struct
    ifd = struct.pack(">H", 2)
    ifd += struct.pack(">HHII", 256, 3, 1, 31 << 16)
    ifd += struct.pack(">HHII", 257, 3, 1, 17 << 16)
    be = b"MM\x00*" + struct.pack(">I", 8) + ifd + struct.pack(">I", 0)
    assert sniff_format(be) == "tiff"
    meta = image_meta(be, "tiff")
    assert (meta.width, meta.height) == (31, 17)


def test_tsv_vs_csv_disambiguation():
    tsv = b"a\tb\tc\n1\t2\t3\n4\t5\t6\n7\t8\t9\n"
    csv = b"a,b,c\n1,2,3\n4,5,6\n7,8,9\n"
    assert sniff_format(tsv) == "tsv"
    assert sniff_format(csv) == "csv"
    # tabbed table whose cells contain commas is still TSV
    mixed = b"a\tb,c\td\n1\t2,3\t4\n5\t6,7\t8\n9\t0,1\t2\n"
    assert sniff_format(mixed) == "tsv"


def test_ole2_robustness_no_raise():
    """Truncated/corrupt OLE2 payloads surface as status rows, never
    exceptions (per-row isolation contract)."""
    rng = random.Random(15)
    good = synth.make_doc(rng, "en", 20, 1.0)
    for cut in (8, 100, 511, 513, 2000, len(good) // 2):
        doc = extract_document("http://x/trunc", good[:cut])
        assert doc.status in ("ok", "failed", "skipped_unsupported",
                              "skipped_empty")
    junk_ole = good[:512] + bytes(rng.getrandbits(8) for _ in range(2048))
    doc = extract_document("http://x/junk", junk_ole)
    assert doc.status in ("ok", "failed", "skipped_unsupported")


def test_new_formats_deterministic():
    rng_a, rng_b = random.Random(77), random.Random(77)
    for maker in (synth.make_doc, synth.make_xls, synth.make_ppt,
                  synth.make_rtf, synth.make_tsv):
        a = maker(rng_a, "en", 5, 1.0)
        b = maker(rng_b, "en", 5, 1.0)
        assert a == b
        d1 = extract_document("http://x/d", a)
        d2 = extract_document("http://x/d", a)
        assert d1 == d2


def test_doc_clx_negative_prc_terminates():
    """Corrupt Prc cb <= -3 must not hang the CLX skip loop (review r2)."""
    import struct

    from document_convert_to__markdown_spark.extractors.ole2 import (
        _doc_text_from_clx,
    )

    clx = b"\x01" + struct.pack("<h", -3) + b"\x00" * 8
    assert _doc_text_from_clx(b"", clx, 0, len(clx)) is None


def test_xls_string_negative_cbext_advances():
    """cbExtRst read as signed made next_pos == pos -> SST loop spin;
    must now strictly advance past the record (review r2)."""
    import struct

    from document_convert_to__markdown_spark.extractors.ole2 import (
        _xls_string,
    )

    data = struct.pack("<H", 0) + bytes([0x04]) + struct.pack("<i", -7)
    text, nxt = _xls_string(data, 0)
    assert nxt > 0 and text == ""


def test_difat_self_loop_terminates():
    """A header-declared 2^32-sector DIFAT chain whose sector points at
    itself must terminate instantly, not hang sniff_format for every
    OLE2-magic crawl payload (ADVICE r2)."""
    import struct
    import time

    from document_convert_to__markdown_spark.extractors.ole2 import (
        sniff_ole2_subtype,
    )

    head = bytearray(512)
    head[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", head, 30, 9)   # 512-byte sectors
    struct.pack_into("<H", head, 32, 6)
    struct.pack_into("<I", head, 48, 0xFFFFFFFE)  # dir: end of chain
    struct.pack_into("<I", head, 60, 0xFFFFFFFE)  # minifat: none
    struct.pack_into("<I", head, 68, 0)           # DIFAT chain at sector 0
    struct.pack_into("<I", head, 72, 0xFFFFFFFF)  # claimed chain length
    for off in range(76, 512, 4):
        struct.pack_into("<I", head, off, 0xFFFFFFFF)
    difat_sect = bytearray(b"\xff" * 512)
    struct.pack_into("<I", difat_sect, 508, 0)    # next DIFAT -> itself
    payload = bytes(head) + bytes(difat_sect)

    t0 = time.monotonic()
    assert sniff_ole2_subtype(payload) == "unknown"
    assert time.monotonic() - t0 < 2.0


def test_fat_enumeration_capped_at_physical_sectors():
    """DIFAT sectors stuffed with FAT ids must not enumerate more FAT
    sectors than the payload can physically hold (review r3: a crafted
    sub-100MB file could otherwise build a multi-GB fat list)."""
    import struct

    from document_convert_to__markdown_spark.extractors.ole2 import (
        CompoundFile, CompoundFileError,
    )

    head = bytearray(512)
    head[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", head, 30, 9)
    struct.pack_into("<H", head, 32, 6)
    struct.pack_into("<I", head, 48, 0xFFFFFFFE)  # dir: end of chain
    struct.pack_into("<I", head, 60, 0xFFFFFFFE)  # minifat: none
    struct.pack_into("<I", head, 68, 0)           # DIFAT chain at sector 0
    struct.pack_into("<I", head, 72, 64)
    for off in range(76, 512, 4):
        struct.pack_into("<I", head, off, 0xFFFFFFFF)
    # two DIFAT sectors, each stuffed with 127 in-range FAT ids
    s0 = bytearray()
    for _ in range(127):
        s0 += struct.pack("<I", 2)
    s0 += struct.pack("<I", 1)                    # chain to sector 1
    s1 = bytearray()
    for _ in range(127):
        s1 += struct.pack("<I", 2)
    s1 += struct.pack("<I", 0xFFFFFFFE)
    payload = bytes(head) + bytes(s0) + bytes(s1) + b"\x00" * 512

    try:
        cf = CompoundFile(payload)
    except CompoundFileError:
        return  # rejecting it outright is fine too
    max_ids = len(payload) // 512 + 1
    # each FAT sector contributes <=128 ints; the id list itself is
    # capped at the physical sector count
    assert len(cf._fat) <= max_ids * 128


def test_extract_document_survives_corrupt_ole2():
    """A crafted OLE2 container with corrupt inner streams must come
    back as a status row in bounded time, never a hang/crash."""
    from document_convert_to__markdown_spark.extractors.extract import (
        extract_document,
    )

    # minimal header with OLE2 magic + garbage body
    payload = (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 504
               + b"\xff" * 2048)
    r = extract_document("https://x.example/corrupt.doc", payload)
    assert r.status in ("ok", "failed", "skipped_unsupported")


def test_sniffer_prefers_higher_field_count_delimiter():
    """A comma table whose cells contain stray tabs must stay CSV; a tab
    table with commas in cells must stay TSV (review r2)."""
    from document_convert_to__markdown_spark.extractors.sniffer import (
        FMT_CSV,
        FMT_TSV,
        sniff_format,
    )

    csv_with_tabs = ("a\tb,c\td,e,f\n" * 4).encode()
    assert sniff_format(csv_with_tabs) == FMT_CSV  # 4 comma fields vs 3 tab
    tsv_with_commas = ("x, y\tz\tw\tv\n" * 4).encode()
    assert sniff_format(tsv_with_commas) == FMT_TSV  # 4 tab fields vs 2 comma
    pure_tsv = ("k1\tk2\tk3\n" * 4).encode()
    assert sniff_format(pure_tsv) == FMT_TSV
    pure_csv = ("k1,k2,k3\n" * 4).encode()
    assert sniff_format(pure_csv) == FMT_CSV
