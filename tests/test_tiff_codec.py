"""From-scratch baseline-TIFF codec (extractors/tiff_codec.py) — pure
functions plus the media_resize real path.  Covers: gray and RGB
roundtrips, the synthesizer's TIFF, WhiteIsZero inversion, big-endian
(MM) byte order, multi-strip assembly, every-byte-offset truncation
raising ValueError, out-of-subset refusals, and
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
    lzw = bytearray(full)                       # raw strip relabeled LZW:
    lzw[tags[259] + 8:tags[259] + 10] = (5).to_bytes(2, "little")
    with pytest.raises(ValueError):             # no Clear code -> invalid
        decode_tiff(bytes(lzw))
    jpg = bytearray(full)                       # old-JPEG-in-TIFF
    jpg[tags[259] + 8:tags[259] + 10] = (6).to_bytes(2, "little")
    with pytest.raises(UnsupportedTiff):
        decode_tiff(bytes(jpg))
    pal = bytearray(full)                       # palette w/o ColorMap:
    pal[tags[262] + 8:tags[262] + 10] = (3).to_bytes(2, "little")
    with pytest.raises(ValueError):             # corrupt, not unsupported
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


# --- LZW / deflate / PackBits / predictor (round 5) --------------------------

from document_convert_to__markdown_spark.extractors.tiff_codec import (  # noqa: E402
    _lzw_decode, _lzw_encode, _packbits_decode, _packbits_encode,
)


def test_lzw_stream_roundtrips_across_width_bumps():
    """Width 9->10->11->12 growth plus the table-full Clear restart —
    the decoder's slot-(2^w - 1) early change against the encoder's
    next_code == 2^w bump (the classic off-by-one trap)."""
    rng = np.random.RandomState(11)
    cases = [
        rng.randint(0, 256, 5000).astype(np.uint8).tobytes(),  # width growth
        rng.randint(0, 256, 60000).astype(np.uint8).tobytes(),  # full table
        b"abcab" * 20000,                                       # long repeats
        bytes(4000),
        b"",
    ]
    for data in cases:
        assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_lzw_hostile_streams_raise_valueerror():
    with pytest.raises(ValueError):
        _lzw_decode(b"\x00\x00\x00\x00", 100)       # no leading Clear
    # Clear then an out-of-range code (511 with an empty table)
    import struct as _s
    bits = (256 << 23) | (511 << 14)                # 9-bit codes, MSB-first
    with pytest.raises(ValueError):
        _lzw_decode(_s.pack(">I", bits), 100)
    # declared-size cap enforced
    data = b"x" * 500
    enc = _lzw_encode(data)
    with pytest.raises(ValueError):
        _lzw_decode(enc, 10)


def test_packbits_known_vector():
    """The spec's worked example (TIFF 6.0 §9)."""
    enc = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
                 0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    dec = (b"\xAA\xAA\xAA\x80\x00\x2A\xAA\xAA\xAA\xAA\x80\x00"
           b"\x2A\x22\xAA\xAA\xAA\xAA\xAA\xAA\xAA\xAA\xAA\xAA")
    assert _packbits_decode(enc, len(dec)) == dec
    assert _packbits_decode(_packbits_encode(dec), len(dec)) == dec
    with pytest.raises(ValueError):
        _packbits_decode(bytes([5, 1, 2]), 100)     # truncated literal


def test_tiff_compressed_roundtrips_match_uncompressed():
    rng = np.random.RandomState(12)
    for shape in ((9, 13), (8, 8, 3), (40, 60, 3)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        base, mode = decode_tiff(encode_tiff(img))
        for comp in ("lzw", "deflate", "packbits"):
            got, m = decode_tiff(encode_tiff(img, compression=comp))
            assert m == mode and np.array_equal(got, base), (shape, comp)
        for comp in ("lzw", "deflate"):
            got, m = decode_tiff(encode_tiff(img, compression=comp,
                                             predictor=True))
            assert m == mode and np.array_equal(got, base), (shape, comp)


def test_tiff_multistrip_lzw_with_predictor():
    """Strips decompress independently; the predictor undoes per row."""
    import struct as _s
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (6, 7, 3)).astype(np.uint8)
    # build a 2-strip LZW+predictor TIFF by hand (3 rows per strip)
    d = img.astype(np.int16)
    d[:, 1:] = d[:, 1:] - d[:, :-1]
    diffed = (d & 0xFF).astype(np.uint8)
    strips = [_lzw_encode(diffed[:3].tobytes()),
              _lzw_encode(diffed[3:].tobytes())]
    entries = [
        (256, 3, 1, 7), (257, 3, 1, 6), (259, 3, 1, 5),
        (262, 3, 1, 2), (277, 3, 1, 3), (278, 3, 1, 3), (317, 3, 1, 2),
    ]
    n = len(entries) + 3           # + bits + offsets + counts
    ifd_size = 2 + 12 * n + 4
    extra = 8 + ifd_size
    bps_off, off_off, cnt_off = extra, extra + 6, extra + 14
    data_off = cnt_off + 8
    entries += [(258, 3, 3, bps_off), (273, 4, 2, off_off),
                (279, 4, 2, cnt_off)]
    entries.sort()
    out = bytearray(b"II*\x00" + _s.pack("<I", 8) + _s.pack("<H", n))
    for tag, vtype, count, val in entries:
        out += _s.pack("<HHI", tag, vtype, count)
        out += _s.pack("<I", val) if vtype == 4 or count > 2 \
            else _s.pack("<HH", val, 0)
    out += _s.pack("<I", 0)
    out += _s.pack("<HHH", 8, 8, 8)
    out += _s.pack("<II", data_off, data_off + len(strips[0]))
    out += _s.pack("<II", len(strips[0]), len(strips[1]))
    out += strips[0] + strips[1]
    got, mode = decode_tiff(bytes(out))
    assert mode == "RGB" and np.array_equal(got, img)


# ------------------------------------------------- JPEG-in-TIFF (TTN2)

def _gradient_rgb(h=40, w=37):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 3) % 256, (y * 5) % 256,
                     ((x + y) * 2) % 256], axis=-1).astype(np.uint8)


def test_tiff_jpeg_roundtrip_all_layouts():
    rgb = _gradient_rgb()
    for kw in (dict(), dict(rows_per_strip=16),
               dict(rows_per_strip=16, jpeg_tables=True)):
        blob = encode_tiff(rgb, compression="jpeg", quality=95, **kw)
        tags = _tag_offsets(blob)
        assert (347 in tags) == bool(kw.get("jpeg_tables"))
        n_strips = struct.unpack(
            "<I", blob[tags[273] + 4:tags[273] + 8])[0]
        assert n_strips == (3 if kw.get("rows_per_strip") else 1)
        got, mode = decode_tiff(blob)
        assert mode == "RGB" and got.shape == rgb.shape
        assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 2


def test_tiff_jpeg_gray_roundtrip():
    # wrap-free gradient: a % 256 seam inside a block rings > 2 levels
    g = (np.arange(40)[:, None] * 3 + np.arange(37)).astype(np.uint8)
    blob = encode_tiff(g, compression="jpeg", quality=95,
                       rows_per_strip=8, jpeg_tables=True)
    got, mode = decode_tiff(blob)
    assert mode == "L" and got.shape == g.shape
    assert np.abs(got.astype(int) - g.astype(int)).max() <= 2


def test_tiff_jpeg_tables_hoist_is_lossless():
    # the tag-347 layout must decode byte-identically to the
    # interchange layout: hoisting tables cannot change entropy data
    rgb = _gradient_rgb()
    plain = decode_tiff(encode_tiff(
        rgb, compression="jpeg", quality=80, rows_per_strip=16))[0]
    hoisted = decode_tiff(encode_tiff(
        rgb, compression="jpeg", quality=80, rows_per_strip=16,
        jpeg_tables=True))[0]
    assert np.array_equal(plain, hoisted)


def test_tiff_jpeg_refusals_and_truncation():
    rgb = _gradient_rgb(24, 16)
    blob = encode_tiff(rgb, compression="jpeg", quality=90,
                       rows_per_strip=16, jpeg_tables=True)
    for cut in range(0, len(blob), 17):
        try:
            decode_tiff(blob[:cut])
        except ValueError:
            pass                    # ValueError (incl. subclasses) only
    tags = _tag_offsets(blob)
    old = bytearray(blob)           # relabel as old-style JPEG (comp 6)
    old[tags[259] + 8:tags[259] + 10] = (6).to_bytes(2, "little")
    with pytest.raises(UnsupportedTiff):
        decode_tiff(bytes(old))
    rgbjpeg = bytearray(blob)       # RGB-in-JPEG photometric refused
    rgbjpeg[tags[262] + 8:tags[262] + 10] = (2).to_bytes(2, "little")
    with pytest.raises(UnsupportedTiff):
        decode_tiff(bytes(rgbjpeg))
    ycc = bytearray(encode_tiff(rgb))   # YCbCr without JPEG refused
    t2 = _tag_offsets(bytes(ycc))
    ycc[t2[262] + 8:t2[262] + 10] = (6).to_bytes(2, "little")
    with pytest.raises(UnsupportedTiff):
        decode_tiff(bytes(ycc))


def test_lzw_eoi_width_at_table_boundary():
    """Regression: when the decoder's table hits the early-change
    boundary exactly at the FINAL data code, it widens before reading
    EOI; the encoder must mirror that bump or EOI desyncs and junk
    bytes trail the payload.  bytes(range(254)) lands the boundary on
    the last code deterministically (253 loop emissions -> decoder
    table 511 == 2^9 - 1)."""
    data = bytes(range(254))
    assert _lzw_decode(_lzw_encode(data), len(data)) == data
    # exhaustive length sweep across the 512 boundary
    rs = np.random.RandomState(3)
    big = rs.randint(0, 256, 700).astype(np.uint8).tobytes()
    for n in range(200, 400):
        assert _lzw_decode(_lzw_encode(big[:n]), n) == big[:n]


# --- general layout writer (round 5i) ----------------------------------------

from document_convert_to__markdown_spark.extractors.tiff_codec import (  # noqa: E402
    encode_tiff_layout,
)


@pytest.mark.parametrize("desc,shape,dtype,kw", [
    ("tiled_lzw_pred", (53, 70, 3), np.uint8,
     dict(tile=(16, 16), compression="lzw", predictor=True)),
    ("planar_deflate", (37, 29, 3), np.uint8,
     dict(planar=2, rows_per_strip=8, compression="deflate")),
    ("tiled_planar", (40, 45, 3), np.uint8,
     dict(planar=2, tile=(16, 16))),
    ("gray4_packbits", (19, 26), np.uint8,
     dict(bit_depth=4, rows_per_strip=5, compression="packbits")),
    ("gray1_tiled", (33, 50), np.uint8,
     dict(bit_depth=1, tile=(16, 16))),
    ("gray16_deflate", (23, 31), np.uint16,
     dict(compression="deflate", rows_per_strip=7)),
    ("rgb16_tiled", (20, 22, 3), np.uint16,
     dict(tile=(16, 16), compression="deflate")),
])
def test_layout_writer_roundtrips(desc, shape, dtype, kw):
    rng = np.random.default_rng(hash(desc) % 2**31)
    hi = 65536 if dtype == np.uint16 else (1 << kw.get("bit_depth", 8))
    src = rng.integers(0, hi, shape, dtype=dtype)
    got, mode = decode_tiff(encode_tiff_layout(src, **kw))
    if dtype == np.uint16:
        want = ((src >> 8).astype(np.uint8) if len(shape) == 2 else
                ((src.astype(np.uint32) + 128) // 257).astype(np.uint8))
    elif len(shape) == 2:
        bit = kw.get("bit_depth", 8)
        want = (src * (255 // ((1 << bit) - 1))).astype(np.uint8)
    else:
        want = src
    assert np.array_equal(got, want)


def test_layout_writer_palette_roundtrips():
    rng = np.random.default_rng(99)
    idx = rng.integers(0, 16, (21, 33), dtype=np.uint8)
    pal = rng.integers(0, 65536, (16, 3), dtype=np.uint16)
    want = (pal >> 8).astype(np.uint8)[idx]
    for kw in [dict(), dict(tile=(16, 16)),
               dict(compression="lzw", rows_per_strip=4)]:
        got, mode = decode_tiff(
            encode_tiff_layout(idx, palette=pal, bit_depth=4, **kw))
        assert mode == "RGB" and np.array_equal(got, want), kw


def test_layout_writer_refusals():
    g8 = np.zeros((4, 4), np.uint8)
    rgb = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError):
        encode_tiff_layout(rgb, compression="jpeg")
    with pytest.raises(ValueError):
        encode_tiff_layout(g8, planar=2)            # gray can't be planar
    with pytest.raises(ValueError):
        encode_tiff_layout(rgb, tile=(10, 16))      # not multiple of 16
    with pytest.raises(ValueError):
        encode_tiff_layout(g8, bit_depth=4,
                           predictor=True, compression="lzw")
    with pytest.raises(ValueError):
        encode_tiff_layout(np.full((4, 4), 9, np.uint8), bit_depth=2)
    with pytest.raises(ValueError):
        encode_tiff_layout(g8, palette=np.zeros((8, 3), np.uint16),
                           bit_depth=4)             # wrong palette size


def test_sample_format_gate():
    """SampleFormat (339) != unsigned must refuse: signed/float
    16-bit samples through the unsigned >>8 / /257 reductions would
    be garbage mislabeled as real pixels (round-5 review
    regression).  Undefined (4) reads as unsigned per TIFF 6.0 §19."""
    def tiny_tiff16(sample_format: int) -> bytes:
        tags = [(256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 16),
                (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 0),
                (277, 3, 1, 1), (278, 3, 1, 2), (279, 4, 1, 8),
                (339, 3, 1, sample_format)]
        data_off = 8 + 2 + 12 * len(tags) + 4
        out = bytearray(b"II*\x00" + struct.pack("<I", 8))
        out += struct.pack("<H", len(tags))
        for tag, vt, count, val in tags:
            if tag == 273:
                val = data_off
            out += struct.pack("<HHII", tag, vt, count, val)
        out += struct.pack("<I", 0)
        out += struct.pack("<4H", 0, 257, 514, 65535)   # 2x2 16-bit
        return bytes(out)

    px, mode = decode_tiff(tiny_tiff16(1))              # unsigned ok
    assert mode == "L" and px.shape == (2, 2)
    assert (px == np.array([[0, 1], [2, 255]], np.uint8)).all()
    assert np.array_equal(decode_tiff(tiny_tiff16(4))[0], px)
    for sf in (2, 3, 5, 6):
        with pytest.raises(UnsupportedTiff):
            decode_tiff(tiny_tiff16(sf))
