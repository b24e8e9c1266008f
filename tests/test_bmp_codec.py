"""From-scratch BMP codec (extractors/bmp_codec.py) — pure functions
plus the media_resize real path.  Covers: 24-bit roundtrip with row
padding, top-down (negative height), 8-bit palette, 32-bit BGRX,
every-byte-offset truncation raising ValueError, RLE8 roundtrip vs
uncompressed, handcrafted RLE4 absolute/delta/EOL/EOB escapes, 1/4-bit
uncompressed depths, hostile RLE streams, and BMP-vs-PNG pixel parity
through the Spark resize kernel.
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
    rle[30:34] = (1).to_bytes(4, "little")      # BI_RLE8 on 24-bit pixels
    with pytest.raises(ValueError):
        decode_bmp(bytes(rle))
    bitfields = bytearray(full)
    bitfields[30:34] = (3).to_bytes(4, "little")  # BI_BITFIELDS
    with pytest.raises(UnsupportedBmp):
        decode_bmp(bytes(bitfields))
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


# --- RLE + sub-byte depths (round 5) ----------------------------------------

from document_convert_to__markdown_spark.extractors.bmp_codec import (  # noqa: E402
    encode_bmp_rle8,
)


def test_bmp_rle8_roundtrip_matches_uncompressed():
    rng = np.random.RandomState(8)
    pal = rng.randint(0, 256, (7, 3)).astype(np.uint8)
    # runs of varying length (sorting makes rows run-heavy)
    idx = np.sort(rng.randint(0, 7, (5, 9)), axis=1).astype(np.uint8)
    got, mode = decode_bmp(encode_bmp_rle8(idx, pal))
    assert mode == "RGB" and (got == pal[idx]).all()
    # degenerate: single pixel, single run value
    got1, _ = decode_bmp(encode_bmp_rle8(np.zeros((1, 1), np.uint8), pal))
    assert (got1 == pal[0]).all()


def _bmp_with_stream(w, h, bits, comp, palq, stream):
    off = 14 + 40 + len(palq)
    return (b"BM" + struct.pack("<IHHI", off + len(stream), 0, 0, off)
            + struct.pack("<IiihHIIiiII", 40, w, h, 1, bits, comp,
                          len(stream), 0, 0, len(palq) // 4, 0)
            + palq + stream)


def test_bmp_rle4_absolute_delta_escapes():
    """Handcrafted BI_RLE4: nibble runs, absolute mode with word
    padding, a delta skip (undefined pixels -> palette 0), EOL, EOB."""
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    palq = np.zeros((4, 4), np.uint8)
    palq[:, :3] = pal[:, ::-1]
    # 6x2 image.  Bottom row (y=0): nibble run of 3 -> 1 2 1, then
    # absolute mode 3 pixels [3,0,1] (2 nibble bytes + 1 pad byte to
    # the word boundary), EOL.  Top row (y=1): delta (+2,0) skips two
    # pixels (stay palette 0), then run of 4 of color 3, EOB.
    stream = bytes([
        3, 0x12,            # run 3: 1,2,1
        0, 3, 0x30, 0x10,   # absolute 3 px: 3,0,1 (nibbles 3 0 | 1 pad)
        0, 0,               # end of line
        0, 2, 2, 0,         # delta +2 x
        4, 0x33,            # run 4: 3,3,3,3
        0, 1,               # end of bitmap
    ])
    bmp = _bmp_with_stream(6, 2, 4, 2, palq.tobytes(), stream)
    got, _ = decode_bmp(bmp)
    expect_idx = np.array([[0, 0, 3, 3, 3, 3],      # top row (y=1)
                           [1, 2, 1, 3, 0, 1]])     # bottom row (y=0)
    assert (got == pal[expect_idx]).all()


def test_bmp_rle_hostile_streams_raise_valueerror():
    palq = bytes(8)                              # 2 black entries
    # run past declared height (no EOL before extra rows)
    overflow = bytes([2, 0x00, 0, 0, 2, 0x00, 0, 0, 2, 0x00])
    with pytest.raises(ValueError):
        decode_bmp(_bmp_with_stream(2, 1, 8, 1, palq, overflow))
    # truncated absolute run
    trunc = bytes([0, 5, 0x01])
    with pytest.raises(ValueError):
        decode_bmp(_bmp_with_stream(8, 2, 8, 1, palq, trunc))
    # index beyond palette via run value
    oob = bytes([2, 9, 0, 1])
    with pytest.raises(ValueError):
        decode_bmp(_bmp_with_stream(2, 1, 8, 1, palq, oob))
    # top-down RLE is illegal per spec
    off = 14 + 40 + len(palq)
    neg = (b"BM" + struct.pack("<IHHI", off + 2, 0, 0, off)
           + struct.pack("<IiihHIIiiII", 40, 2, -1, 1, 8, 1, 2, 0, 0, 2, 0)
           + palq + bytes([0, 1]))
    with pytest.raises(ValueError):
        decode_bmp(neg)


def test_bmp_1bit_and_4bit_uncompressed():
    pal2 = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    palq2 = np.zeros((2, 4), np.uint8)
    palq2[:, :3] = pal2[:, ::-1]
    # 1-bit, 10 px wide, 2 rows: bits pack MSB-first, stride pads to 4
    row_bot = bytes([0b10110100, 0b01000000, 0, 0])   # y=0
    row_top = bytes([0b01001011, 0b10000000, 0, 0])   # y=1
    bmp1 = _bmp_with_stream(10, 2, 1, 0, palq2.tobytes(),
                            row_bot + row_top)
    got1, _ = decode_bmp(bmp1)
    bot = [1, 0, 1, 1, 0, 1, 0, 0, 0, 1]
    top = [0, 1, 0, 0, 1, 0, 1, 1, 1, 0]
    expect1 = pal2[np.array([top, bot])]
    assert (got1 == expect1).all()
    # 4-bit, 3 px wide, 1 row: nibbles 5,2,7 then padding
    pal16 = np.arange(48, dtype=np.uint8).reshape(16, 3)
    palq16 = np.zeros((16, 4), np.uint8)
    palq16[:, :3] = pal16[:, ::-1]
    bmp4 = _bmp_with_stream(3, 1, 4, 0, palq16.tobytes(),
                            bytes([0x52, 0x70, 0, 0]))
    got4, _ = decode_bmp(bmp4)
    assert (got4 == pal16[np.array([[5, 2, 7]])]).all()
