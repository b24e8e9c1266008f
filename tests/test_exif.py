"""EXIF metadata + orientation (extractors/exif.py, round 5i).

Covers: the eight orientation transforms (inverse round-trip + the
spec table pinned on an asymmetric grid), APP1 build/splice/parse
round-trip incl. Make/Model/DateTime/GPS-IFD, big-endian (MM) blocks,
TIFF tag-274 authoring through encode_tiff_layout, garbage safety,
and the Spark operators: media_exif columns, orient=True
normalization in media_resize/image_dhash (rotated twins hash
identically; default stays byte-stable).  libtiff cross-validation of
orientations 1-4 lives in tests/test_libtiff_libgif_parity.py
(TIFFReadRGBAImageOriented only approximates the transposed codes).
"""

import struct

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.exif import (
    EMPTY_EXIF, apply_orientation, build_exif_app1, image_exif,
    invert_orientation, jpeg_exif, parse_exif, splice_jpeg_exif,
)
from document_convert_to__markdown_spark.extractors.jpeg_codec import (
    encode_jpeg,
)
from document_convert_to__markdown_spark.extractors.tiff_codec import (
    encode_tiff_layout,
)


def test_orientation_transform_table():
    """Pin each code's geometry on a tiny asymmetric grid (values
    chosen so every transform yields a distinct array)."""
    px = np.array([[1, 2, 3],
                   [4, 5, 6]], np.uint8)
    want = {
        1: [[1, 2, 3], [4, 5, 6]],
        2: [[3, 2, 1], [6, 5, 4]],                # mirror horizontal
        3: [[6, 5, 4], [3, 2, 1]],                # rotate 180
        4: [[4, 5, 6], [1, 2, 3]],                # mirror vertical
        5: [[1, 4], [2, 5], [3, 6]],              # transpose
        6: [[4, 1], [5, 2], [6, 3]],              # rotate 90 CW
        7: [[6, 3], [5, 2], [4, 1]],              # transverse
        8: [[3, 6], [2, 5], [1, 4]],              # rotate 90 CCW
    }
    for o, exp in want.items():
        got = apply_orientation(px, o)
        assert got.tolist() == exp, o
        # 3-channel variant transforms identically per channel
        got3 = apply_orientation(np.stack([px] * 3, axis=2), o)
        assert got3[:, :, 1].tolist() == exp, o


def test_orientation_inverse_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    for o in range(1, 9):
        assert np.array_equal(
            apply_orientation(invert_orientation(img, o), o), img), o


def test_app1_build_splice_parse():
    img = np.random.RandomState(1).randint(0, 256, (8, 9, 3)) \
        .astype(np.uint8)
    j = encode_jpeg(img)
    j2 = splice_jpeg_exif(j, orientation=6, make="ACME", model="X100",
                          datetime="2020:01:02 03:04:05", gps=True)
    info = jpeg_exif(j2)
    assert info.orientation == 6
    assert info.make == "ACME" and info.model == "X100"
    assert info.datetime == "2020:01:02 03:04:05"
    assert info.has_gps
    # plain JPEG has no EXIF; splice leaves the entropy stream intact
    assert jpeg_exif(j) == EMPTY_EXIF
    from document_convert_to__markdown_spark.extractors.jpeg_codec \
        import decode_jpeg
    assert np.array_equal(decode_jpeg(j)[0], decode_jpeg(j2)[0])
    # minimal segment: orientation only, no GPS
    info2 = jpeg_exif(splice_jpeg_exif(j, orientation=3))
    assert info2.orientation == 3 and not info2.has_gps
    assert info2.make is None


def test_big_endian_exif_block():
    """MM-order block: same tags, big-endian packing."""
    import struct
    entries = [(274, 3, 1, struct.pack(">HH", 8, 0))]
    block = bytearray(b"MM\x00*" + struct.pack(">I", 8))
    block += struct.pack(">H", len(entries))
    for tag, vt, count, val in entries:
        block += struct.pack(">HHI", tag, vt, count) + val
    block += struct.pack(">I", 0)
    assert parse_exif(bytes(block)).orientation == 8


def test_tiff_orientation_tag_authoring():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    for o in range(1, 9):
        blob = encode_tiff_layout(invert_orientation(img, o),
                                  orientation=o)
        info = image_exif(blob)
        assert info.orientation == o and not info.has_gps
    with pytest.raises(ValueError):
        encode_tiff_layout(img, orientation=9)


def test_garbage_safety():
    for junk in [b"", b"\xff\xd8", b"\xff\xd8\xff\xe1\x00\x04Ex",
                 bytes(100), b"II*\x00" + b"\xff" * 4,
                 b"\xff\xd8" + b"\xff\xe1\x00\x08Exif\x00\x00"]:
        assert image_exif(junk) == EMPTY_EXIF


# --- Spark operators ----------------------------------------------------------

def test_media_exif_columns(spark):
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_exif,
    )

    img = np.random.RandomState(2).randint(0, 256, (8, 9, 3)) \
        .astype(np.uint8)
    j = encode_jpeg(img)
    rows = [
        ("cam", bytearray(splice_jpeg_exif(
            j, orientation=6, make="ACME", model="X100", gps=True))),
        ("plain", bytearray(j)),
        ("tiff", bytearray(encode_tiff_layout(img, orientation=3))),
        ("junk", bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r["url"]: r for r in media_exif(df).collect()}
    assert got["cam"]["orientation"] == 6 and got["cam"]["has_gps"]
    assert got["cam"]["make"] == "ACME"
    assert got["plain"]["orientation"] == 1
    assert not got["plain"]["has_gps"]
    assert got["tiff"]["orientation"] == 3
    assert got["junk"]["orientation"] == 1
    assert got["junk"]["make"] is None


def test_orient_normalizes_dhash_and_resize(spark):
    """A rotated-with-tag twin hashes/resizes identically to the
    upright base under orient=True, and differently (for the 90°
    codes) under the default — the recall argument for the knob."""
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        image_dhash, media_resize,
    )

    rng = np.random.RandomState(9)
    base = rng.randint(0, 256, (10, 14, 3)).astype(np.uint8)
    rows = [("base", bytearray(encode_png(base)))]
    for o in range(2, 9):
        rows.append((f"o{o}", bytearray(encode_tiff_layout(
            invert_orientation(base, o), orientation=o))))
    df = spark.createDataFrame(rows, "url string, data binary")

    oriented = {r["url"]: r["dhash"]
                for r in image_dhash(df, orient=True).collect()}
    assert all(h == oriented["base"] for h in oriented.values())

    plain = {r["url"]: r["dhash"] for r in image_dhash(df).collect()}
    assert plain["o6"] != plain["base"]         # rotation moves dHash

    res = {r["url"]: bytes(r["data"])
           for r in media_resize(df, width=6, height=5,
                                 orient=True).collect()}
    assert all(v == res["base"] for v in res.values())


def test_canonical_dhash_orbit_invariance(spark):
    """Untagged rotated/mirrored copies (no EXIF at all — plain PNGs)
    collapse to one canonical hash; distinct scenes stay distinct;
    and the canonical value is exactly the unsigned min over the
    eight plain orbit hashes."""
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        image_dhash,
    )

    rng = np.random.RandomState(21)
    rows = []
    for scene in range(6):
        base = rng.randint(0, 256, (12, 16, 3)).astype(np.uint8)
        for o in range(1, 9):
            rows.append((f"s{scene}/o{o}", bytearray(
                encode_png(apply_orientation(base, o)))))
    df = spark.createDataFrame(rows, "url string, data binary")

    canon = {r["url"]: r["dhash"]
             for r in image_dhash(df, canonical=True).collect()}
    plain = {r["url"]: r["dhash"] for r in image_dhash(df).collect()}

    per_scene = {}
    for url, h in canon.items():
        per_scene.setdefault(url.split("/")[0], set()).add(h)
    assert all(len(v) == 1 for v in per_scene.values()), per_scene
    assert len({next(iter(v)) for v in per_scene.values()}) == 6

    for scene in range(6):
        orbit = [plain[f"s{scene}/o{o}"] & 0xFFFFFFFFFFFFFFFF
                 for o in range(1, 9)]
        got = next(iter(per_scene[f"s{scene}"])) & 0xFFFFFFFFFFFFFFFF
        assert got == min(orbit), scene


def test_every_prefix_truncation_never_raises():
    """image_exif's never-raise contract, byte-by-byte over a fully
    loaded EXIF JPEG and an orientation-tagged TIFF."""
    img = np.random.RandomState(4).randint(0, 256, (6, 7, 3)) \
        .astype(np.uint8)
    blobs = [
        splice_jpeg_exif(encode_jpeg(img), orientation=6, make="M",
                         model="X", datetime="2020:01:01 00:00:00",
                         gps=True),
        encode_tiff_layout(img, orientation=7),
    ]
    for blob in blobs:
        for cut in range(len(blob) + 1):
            info = image_exif(blob[:cut])
            assert 1 <= info.orientation <= 8


def test_png_and_webp_exif_carriers():
    """PNG eXIf chunk (3rd ed.) and WebP VP8X EXIF chunk: authored by
    the splicers, parsed by image_exif, pixels untouched; the WebP
    path also upgrades a simple lossless file to the extended
    container (flag 0x08, canvas dims from the VP8L header)."""
    from document_convert_to__markdown_spark.extractors.exif import (
        png_add_exif, webp_add_exif,
    )
    from document_convert_to__markdown_spark.extractors.png_codec import (
        decode_png, encode_png,
    )
    from document_convert_to__markdown_spark.extractors.webp_codec import (
        decode_webp, encode_webp,
    )

    img = np.random.RandomState(12).randint(0, 256, (9, 12, 3)) \
        .astype(np.uint8)
    png = encode_png(img)
    png2 = png_add_exif(png, orientation=6, make="PM", gps=True)
    info = image_exif(png2)
    assert (info.orientation, info.make, info.has_gps) == (6, "PM",
                                                           True)
    assert np.array_equal(decode_png(png)[0], decode_png(png2)[0])
    assert image_exif(png) == EMPTY_EXIF

    webp = encode_webp(img)
    webp2 = webp_add_exif(webp, orientation=8, model="WX")
    info2 = image_exif(webp2)
    assert (info2.orientation, info2.model) == (8, "WX")
    assert np.array_equal(decode_webp(webp)[0], decode_webp(webp2)[0])
    assert image_exif(webp) == EMPTY_EXIF
    # VP8X-already case: flag set, chunk appended, still parses
    assert image_exif(webp_add_exif(webp2, orientation=3)) \
        .orientation == 8                       # first EXIF chunk wins
    # prefix fuzz over both carriers
    for blob in (png2, webp2):
        for cut in range(len(blob) + 1):
            assert 1 <= image_exif(blob[:cut]).orientation <= 8


def test_jpeg_fill_bytes_before_app1():
    """T.81 B.1.1.2 permits 0xFF fill bytes (and real crawls carry
    garbage) between markers; the EXIF walk must stay aligned with
    decode_jpeg's tolerance rather than silently dropping EXIF from
    JPEGs whose pixels decode fine (round-5 review regression)."""
    app1 = build_exif_app1(orientation=6, make="FB")
    tail = b"\xff\xdb" + struct.pack(">H", 3) + b"\x00"
    # fill bytes right after SOI
    blob = b"\xff\xd8" + b"\xff\xff\xff" + app1 + tail
    assert jpeg_exif(blob).orientation == 6
    # non-0xFF garbage between segments, EXIF after it
    blob2 = b"\xff\xd8" + b"\x00\x12\x34" + app1 + tail
    info = jpeg_exif(blob2)
    assert (info.orientation, info.make) == (6, "FB")
    # EOI terminates the walk without raising
    assert jpeg_exif(b"\xff\xd8\xff\xd9" + app1) == EMPTY_EXIF
