"""From-scratch BMP codec (extractors/bmp_codec.py) — pure functions
plus the media_resize real path.  Covers: 24-bit roundtrip with row
padding, top-down (negative height), 8-bit palette, 32-bit BGRX,
every-byte-offset truncation raising ValueError, RLE refusal, and
BMP-vs-PNG pixel parity through the Spark resize kernel.
"""

import struct

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.bmp_codec import (
    UnsupportedBmp, decode_bmp, encode_bmp,
)


def test_bmp_roundtrip_24bit_padded():
    px = np.random.RandomState(4).randint(0, 256, (7, 11, 3)) \
        .astype(np.uint8)                       # odd width → padding
    got, mode = decode_bmp(encode_bmp(px))
    assert mode == "RGB" and (got == px).all()


def test_bmp_top_down_rows():
    px = np.random.RandomState(5).randint(0, 256, (7, 11, 3)) \
        .astype(np.uint8)
    bmp = bytearray(encode_bmp(px))
    bmp[22:26] = (-7).to_bytes(4, "little", signed=True)
    stride = (11 * 3 + 3) & ~3
    rows = [bytes(bmp[54 + r * stride: 54 + (r + 1) * stride])
            for r in range(7)]
    for r, row in enumerate(reversed(rows)):
        bmp[54 + r * stride: 54 + (r + 1) * stride] = row
    got, _ = decode_bmp(bytes(bmp))
    assert (got == px).all()


def test_bmp_8bit_palette():
    rng = np.random.RandomState(6)
    pal = rng.randint(0, 256, (5, 3)).astype(np.uint8)
    idx = rng.randint(0, 5, (3, 6)).astype(np.uint8)
    stride = (6 + 3) & ~3
    rows = np.zeros((3, stride), np.uint8)
    rows[:, :6] = idx[::-1]                     # bottom-up
    data = rows.tobytes()
    palq = np.zeros((5, 4), np.uint8)
    palq[:, :3] = pal[:, ::-1]                  # BGRX quads
    bmp = (b"BM" + struct.pack("<IHHI", 14 + 40 + 20 + len(data),
                               0, 0, 14 + 40 + 20)
           + struct.pack("<IiihHIIiiII", 40, 6, 3, 1, 8, 0,
                         len(data), 0, 0, 5, 0)
           + palq.tobytes() + data)
    got, _ = decode_bmp(bmp)
    assert (got == pal[idx]).all()


def test_bmp_32bit_bgrx():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (2, 3, 3)).astype(np.uint8)
    bgrx = np.zeros((2, 3, 4), np.uint8)
    bgrx[:, :, :3] = px[:, :, ::-1]
    data = bgrx[::-1].reshape(2, 12).tobytes()
    bmp = (b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
           + struct.pack("<IiihHIIiiII", 40, 3, 2, 1, 32, 0,
                         len(data), 0, 0, 0, 0)
           + data)
    got, _ = decode_bmp(bmp)
    assert (got == px).all()


def test_bmp_refusals_valueerror_only():
    px = np.zeros((3, 3, 3), np.uint8)
    full = encode_bmp(px)
    for cut in range(len(full)):
        with pytest.raises(ValueError):
            decode_bmp(full[:cut])              # always short data/hdr
    rle = bytearray(full)
    rle[30:34] = (1).to_bytes(4, "little")      # BI_RLE8
    with pytest.raises(UnsupportedBmp):
        decode_bmp(bytes(rle))
    huge = bytearray(full)
    huge[18:22] = (40000).to_bytes(4, "little")  # width >> actual data
    with pytest.raises(ValueError):
        decode_bmp(bytes(huge))
    with pytest.raises(ValueError):
        encode_bmp(np.zeros((2, 2), np.uint8))
    with pytest.raises(ValueError):
        encode_bmp(np.zeros((0, 5, 3), np.uint8))   # degenerate dims
    # crafted bfOffBits pointing INTO the header must not decode the
    # header bytes as "real" pixels with mode='RGB' provenance
    spoof = bytearray(encode_bmp(np.zeros((4, 3, 3), np.uint8)))
    spoof[10:14] = (0).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_bmp(bytes(spoof))


def test_media_resize_real_bmp_equals_png(spark):
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_resize,
    )

    px = np.random.RandomState(9).randint(0, 256, (10, 14, 3)) \
        .astype(np.uint8)
    rows = [("b", bytearray(encode_bmp(px))),
            ("p", bytearray(encode_png(px)))]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r["url"]: r for r in media_resize(df, width=6, height=5,
                                             blob_col="data").collect()}
    assert got["b"]["mode"] == "RGB" == got["p"]["mode"]
    assert bytes(got["b"]["data"]) == bytes(got["p"]["data"])
