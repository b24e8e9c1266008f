"""XMP rights/licensing metadata (extractors/xmp.py, round 5j).

Covers: packet parse in both legal RDF serializations (element and
attribute form), all four carriers (JPEG APP1 with the XMP namespace
— distinct from EXIF's APP1, both coexisting; PNG iTXt with the
com.adobe.xmp keyword; TIFF tag 700; WebP ``XMP `` chunk incl. the
VP8L→VP8X upgrade), pixel-untouched splicing, entity unescape,
never-raise truncation/bit-flip fuzzing, compressed-iTXt refusal, and
the media_xmp Spark operator's all-null row contract.
"""

import struct

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.xmp import (
    EMPTY_XMP, build_xmp_packet, image_xmp, parse_xmp, png_add_xmp,
    splice_jpeg_xmp, webp_add_xmp,
)


def test_packet_both_serializations():
    kw = dict(creator="Ann & Bob", rights="CC BY 4.0",
              title="A <great> shot", create_date="2020-01-02T03:04:05",
              marked=True, license_url="https://cc.org/by/4.0/")
    for form in (False, True):
        x = parse_xmp(build_xmp_packet(attribute_form=form, **kw))
        assert x.creator == "Ann & Bob", form        # entity unescape
        assert x.rights == "CC BY 4.0"
        assert x.title == "A <great> shot"
        assert x.create_date == "2020-01-02T03:04:05"
        assert x.marked is True
        assert x.license_url == "https://cc.org/by/4.0/"
    assert parse_xmp(build_xmp_packet(marked=False)).marked is False
    assert parse_xmp(build_xmp_packet()).marked is None
    # cc:license fallback when WebStatement is absent
    pkt = build_xmp_packet().replace(
        b"<rdf:Description",
        b'<rdf:Description cc:license="https://cc/0"', 1)
    assert parse_xmp(pkt).license_url == "https://cc/0"
    assert parse_xmp(b"") == EMPTY_XMP
    assert parse_xmp(b"<notxmp/>") == EMPTY_XMP


def test_four_carriers_and_exif_coexistence():
    from document_convert_to__markdown_spark.extractors.exif import (
        image_exif, splice_jpeg_exif,
    )
    from document_convert_to__markdown_spark.extractors.jpeg_codec import (
        decode_jpeg, encode_jpeg,
    )
    from document_convert_to__markdown_spark.extractors.png_codec import (
        decode_png, encode_png,
    )
    from document_convert_to__markdown_spark.extractors.webp_codec import (
        decode_webp, encode_webp,
    )

    img = np.random.RandomState(9).randint(0, 256, (8, 10, 3)) \
        .astype(np.uint8)
    jpeg = splice_jpeg_xmp(encode_jpeg(img), creator="C1",
                           license_url="https://lic/1")
    x = image_xmp(jpeg)
    assert (x.creator, x.license_url) == ("C1", "https://lic/1")
    assert np.array_equal(decode_jpeg(jpeg)[0],
                          decode_jpeg(encode_jpeg(img))[0])

    png = png_add_xmp(encode_png(img), rights="R2", marked=True)
    assert image_xmp(png).rights == "R2"
    assert image_xmp(png).marked is True
    assert np.array_equal(decode_png(png)[0], img)

    webp = webp_add_xmp(encode_webp(img), title="W3")
    assert image_xmp(webp).title == "W3"
    assert np.array_equal(decode_webp(webp)[0][:, :, :3], img)

    # TIFF tag 700 (UNDEFINED), hand-built single-strip gray file
    pkt = build_xmp_packet(creator="T4")
    tags = [(256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 0),
            (277, 3, 1, 1), (278, 3, 1, 2), (279, 4, 1, 4),
            (700, 7, len(pkt), 0)]
    data_off = 8 + 2 + 12 * len(tags) + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(tags))
    for tag, vt, count, val in tags:
        if tag == 273:
            val = data_off
        elif tag == 700:
            val = data_off + 4
        out += struct.pack("<HHII", tag, vt, count, val)
    out += struct.pack("<I", 0) + bytes(4) + pkt
    assert image_xmp(bytes(out)).creator == "T4"

    # EXIF and XMP ride separate APP1s in the same JPEG
    both = splice_jpeg_exif(jpeg, orientation=6, make="M")
    assert image_exif(both).orientation == 6
    assert image_xmp(both).creator == "C1"


def test_compressed_itxt_refused_and_fuzz():
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )

    img = np.zeros((4, 4, 3), np.uint8)
    png = png_add_xmp(encode_png(img), creator="Z")
    # flip the iTXt compression flag on: parser must yield EMPTY, not
    # try to inflate
    i = png.find(b"XML:com.adobe.xmp\x00") + len(b"XML:com.adobe.xmp\x00")
    flipped = png[:i] + b"\x01" + png[i + 1:]
    assert image_xmp(flipped) == EMPTY_XMP

    jpeg = splice_jpeg_xmp(
        b"\xff\xd8\xff\xdb" + struct.pack(">H", 3) + b"\x00",
        creator="F")
    for blob in (png, jpeg):
        for cut in range(len(blob) + 1):
            image_xmp(blob[:cut])            # never raises
        for pos in range(0, len(blob), 5):
            b = bytearray(blob)
            b[pos] ^= 0xFF
            image_xmp(bytes(b))              # never raises


def test_media_xmp_operator(spark):
    from document_convert_to__markdown_spark.extractors.jpeg_codec import (
        encode_jpeg,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_xmp,
    )

    img = np.zeros((4, 4, 3), np.uint8)
    rows = [("u1", bytearray(splice_jpeg_xmp(
                encode_jpeg(img), creator="A",
                license_url="https://l/1", marked=True))),
            ("u2", bytearray(encode_jpeg(img))),    # no packet
            ("u3", bytearray(b"not an image")),
            ("u4", None)]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r["url"]: r for r in media_xmp(df).collect()}
    assert len(got) == 4                     # no silent drops
    assert got["u1"]["creator"] == "A"
    assert got["u1"]["license_url"] == "https://l/1"
    assert got["u1"]["marked"] is True
    assert got["u2"]["creator"] is None and got["u2"]["marked"] is None
    assert got["u3"]["license_url"] is None
    assert got["u4"]["rights"] is None


def test_review_r5j_regressions():
    """Round-5j review findings: the rdf:resource form of cc:license
    (what CC-tagging tools emit), bare simple-element dc properties
    without the rdf:Alt wrapper, and splice_jpeg_xmp keeping an
    existing EXIF APP1 first."""
    pkt = build_xmp_packet().replace(
        b"</rdf:RDF>",
        b'<rdf:Description rdf:about="" xmlns:cc='
        b'"http://creativecommons.org/ns#"><cc:license rdf:resource='
        b'"https://creativecommons.org/licenses/by/4.0/"/>'
        b"</rdf:Description></rdf:RDF>", 1)
    assert parse_xmp(pkt).license_url == \
        "https://creativecommons.org/licenses/by/4.0/"

    bare = (b'<x:xmpmeta xmlns:x="adobe:ns:meta/"><rdf:RDF>'
            b'<rdf:Description xmlns:dc="http://purl.org/dc/'
            b'elements/1.1/"><dc:rights>Copyright Foo</dc:rights>'
            b"</rdf:Description></rdf:RDF></x:xmpmeta>")
    assert parse_xmp(bare).rights == "Copyright Foo"

    from document_convert_to__markdown_spark.extractors.exif import (
        image_exif, splice_jpeg_exif,
    )
    from document_convert_to__markdown_spark.extractors.jpeg_codec import (
        encode_jpeg,
    )
    img = np.zeros((4, 4, 3), np.uint8)
    exif_first = splice_jpeg_exif(encode_jpeg(img), orientation=3)
    both = splice_jpeg_xmp(exif_first, creator="E")
    # EXIF APP1 must still be the first segment after SOI
    assert both[2:4] == b"\xff\xe1" and both[6:12] == b"Exif\x00\x00"
    assert image_exif(both).orientation == 3
    assert image_xmp(both).creator == "E"
