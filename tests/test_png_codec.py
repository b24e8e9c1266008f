"""From-scratch PNG codec (extractors/png_codec.py) — pure functions,
no Spark.  Covers: encode/decode roundtrip for every supported mode,
all five scanline filters reversed against hand-filtered data, palette
resolution, the synthesizer's make_png, tRNS transparency, APNG
animation compositing, and explicit ValueError refusal of malformed or
bomb-sized inputs instead of a wrong decode.
"""

import struct
import zlib

import numpy as np
import pytest

from document_convert_to__markdown_spark.data.synth import make_png
from document_convert_to__markdown_spark.extractors.png_codec import (
    PNG_SIG, UnsupportedPNG, decode_png, encode_png,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


@pytest.mark.parametrize("shape,mode", [
    ((5, 7), "L"), ((2, 5, 2), "LA"), ((4, 6, 3), "RGB"),
    ((3, 3, 4), "RGBA"),
])
def test_roundtrip_exact(shape, mode):
    arr = (np.arange(np.prod(shape)).reshape(shape) * 37 % 256
           ).astype(np.uint8)
    dec, got_mode = decode_png(encode_png(arr))
    assert got_mode == mode
    assert dec.shape == arr.shape
    assert (dec == arr).all()


def test_synthesizer_png_decodes_to_known_pixels():
    px, mode = decode_png(make_png(6, 4, 123))
    want = np.array([[(123 + x + y) % 256 for x in range(6)]
                     for y in range(4)], np.uint8)
    assert mode == "L" and px.shape == (4, 6)
    assert (px == want).all()


def test_all_five_filters_reverse_exactly():
    """Scanlines hand-filtered per spec §6 (Sub/Up/Average/Paeth) must
    unfilter back to the source image byte-for-byte."""
    w, h, ch = 4, 5, 3
    img = (np.arange(h * w * ch).reshape(h, w * ch) * 11 % 256
           ).astype(np.uint8)

    def filt(row, prev, f, bpp):
        out = bytearray()
        for i, x in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 1:
                out.append((int(x) - a) & 255)
            elif f == 2:
                out.append((int(x) - b) & 255)
            elif f == 3:
                out.append((int(x) - ((a + b) >> 1)) & 255)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                out.append((int(x) - pr) & 255)
        return bytes(out)

    raw = b""
    prev = np.zeros(w * ch, int)
    for y in range(h):
        f = y % 5
        row = img[y].astype(int)
        raw += bytes([f]) + (bytes(img[y]) if f == 0
                             else filt(row, prev, f, ch))
        prev = row
    png = (PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(raw))
           + _chunk(b"IEND", b""))
    dec, mode = decode_png(png)
    assert mode == "RGB"
    assert (dec.reshape(h, w * ch) == img).all()


def test_palette_resolves_to_rgb():
    pal = bytes(range(30))  # 10 entries: entry k = (3k, 3k+1, 3k+2)
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    raw = b"\x00" + bytes(idx[0]) + b"\x00" + bytes(idx[1])
    png = (PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + _chunk(b"PLTE", pal)
           + _chunk(b"IDAT", zlib.compress(raw))
           + _chunk(b"IEND", b""))
    dec, mode = decode_png(png)
    assert mode == "RGB" and dec.shape == (2, 2, 3)
    assert (dec[0, 1] == [3, 4, 5]).all()
    assert (dec[1, 1] == [9, 10, 11]).all()


def test_formerly_unsupported_16bit_and_adam7_now_decode():
    """Round 5: depth 16 and Adam7 are real paths, not refusals."""
    png16 = (PNG_SIG
             + _chunk(b"IHDR",
                      struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
             + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
             + _chunk(b"IEND", b""))
    dec, mode = decode_png(png16)
    assert mode == "L" and dec.shape == (2, 2) and (dec == 0).all()
    interlaced = (PNG_SIG
                  + _chunk(b"IHDR",
                           struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
                  + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
                  + _chunk(b"IEND", b""))
    dec2, mode2 = decode_png(interlaced)
    assert mode2 == "L" and dec2.shape == (2, 2) and (dec2 == 0).all()


def test_illegal_depth_type_combos_refused():
    """Spec table 11.1: depth 16 palette / sub-byte RGB are illegal —
    ValueError, never a misdecode (UnsupportedPNG covers bombs)."""
    for depth, ctype in ((16, 3), (4, 2), (2, 6), (1, 4), (3, 0)):
        bad = (PNG_SIG
               + _chunk(b"IHDR",
                        struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, 0))
               + _chunk(b"IDAT", zlib.compress(b"\x00" * 32))
               + _chunk(b"IEND", b""))
        with pytest.raises(ValueError):
            decode_png(bad)
    # bad interlace method byte
    bad2 = (PNG_SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 2))
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(bad2)


def test_adam7_16bit_subbyte_roundtrips():
    rng = np.random.default_rng(55)
    for shape in ((7, 9), (8, 8, 3), (5, 13, 4), (6, 6, 2), (1, 1),
                  (2, 3), (9, 1), (17, 23, 3)):
        img = rng.integers(0, 256, shape, np.uint8)
        for kw in ({"interlace": True}, {"depth": 16},
                   {"interlace": True, "depth": 16}):
            dec, _ = decode_png(encode_png(img, **kw))
            assert np.array_equal(dec, img), (shape, kw)
    for depth in (1, 2, 4):
        g = rng.integers(0, 1 << depth, (9, 11), np.uint8)
        scale = 255 // ((1 << depth) - 1)
        for kw in ({"depth": depth}, {"depth": depth, "interlace": True}):
            dec, mode = decode_png(encode_png(g, **kw))
            assert mode == "L" and np.array_equal(dec, g * scale), kw


def test_subbyte_palette_decode():
    """2-bit palette PNG (hand-built): indexes unpack MSB-first and
    resolve through PLTE — the favicon-era format."""
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])
    # 5 px wide, 2 rows, depth 2: rows [0,1,2,3,0], [3,2,1,0,3]
    row0 = bytes([0b00011011, 0b00000000])
    row1 = bytes([0b11100100, 0b11000000])
    png = (PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 2, 2, 3, 0, 0, 0))
           + _chunk(b"PLTE", pal)
           + _chunk(b"IDAT", zlib.compress(b"\x00" + row0 + b"\x00" + row1))
           + _chunk(b"IEND", b""))
    dec, mode = decode_png(png)
    assert mode == "RGB" and dec.shape == (2, 5, 3)
    expect = np.frombuffer(pal, np.uint8).reshape(4, 3)[
        np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 3]])]
    assert np.array_equal(dec, expect)


def test_palette_index_out_of_range_raises():
    png = (PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
           + _chunk(b"PLTE", bytes([1, 2, 3]))      # one entry
           + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x05"))  # index 5
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(png)


def test_malformed_inputs_raise_valueerror():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # truncated pixel data
    png = (PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(png)
    # missing IDAT
    png2 = (PNG_SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(png2)


def test_corrupt_deflate_raises_valueerror_not_zlib_error():
    """zlib.error subclasses Exception, not ValueError — a corrupt
    IDAT must surface as ValueError or it escapes the multimodal
    kernels' stub fallback and kills the whole Arrow batch task."""
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    png = bytearray(encode_png(
        np.arange(48, dtype=np.uint8).reshape(4, 4, 3)))
    idat = bytes(png).index(b"IDAT")
    png[idat + 8] ^= 0xFF                       # corrupt deflate body
    with pytest.raises(ValueError):
        decode_png(bytes(png))


def test_dimension_bomb_dies_before_allocation():
    """A crafted IHDR declaring 60000x60000 with a tiny IDAT must
    refuse as ValueError pre-allocation (the old path allocated the
    h*stride output array before checking the pixel data length), and
    a header past the 256MiB decoded-size cap refuses outright."""
    bomb = (PNG_SIG
            + _chunk(b"IHDR",
                     struct.pack(">IIBBBBB", 9000, 9000, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(bomb)
    capped = (PNG_SIG
              + _chunk(b"IHDR",
                       struct.pack(">IIBBBBB", 60000, 60000, 8, 6, 0, 0, 0))
              + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
              + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(capped)


def test_decompression_bomb_output_is_header_capped():
    """An IDAT that inflates far beyond what the declared dimensions
    need must not materialize its full expansion: the decompress loop
    caps output at the header-promised byte count and the extra is
    ignored (a valid image prefix still decodes)."""
    h, w = 4, 4
    raw = b"".join(b"\x00" + bytes(w * 3) for _ in range(h))
    png = (PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(raw + b"\x00" * 50_000_000))
           + _chunk(b"IEND", b""))
    px, mode = decode_png(png)
    assert mode == "RGB" and px.shape == (4, 4, 3) and (px == 0).all()


# ------------------------------------------------------------------ APNG

def _apng_over(dst, src):
    """Independent Porter-Duff OVER (test twin of the decoder's)."""
    fa = src[:, :, 3:].astype(np.float64) / 255.0
    ca = dst[:, :, 3:].astype(np.float64) / 255.0
    oa = fa + ca * (1 - fa)
    orgb = src[:, :, :3] * fa + dst[:, :, :3] * ca * (1 - fa)
    out = dst.copy()
    out[:, :, :3] = np.rint(orgb / np.where(oa == 0, 1.0, oa)).astype(np.uint8)
    out[:, :, 3:] = np.rint(oa * 255).astype(np.uint8)
    return out


def _rand_rgba(rng, h, w, alpha=None):
    px = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
    if alpha is not None:
        px[:, :, 3] = alpha
    return px


def test_apng_roundtrip_and_compositing_semantics():
    from document_convert_to__markdown_spark.extractors.png_codec import (
        decode_apng_frames, encode_apng,
    )
    rng = np.random.RandomState(7)
    base = _rand_rgba(rng, 8, 10, alpha=255)
    patch = _rand_rgba(rng, 3, 4)          # semi-transparent alphas
    patch2 = _rand_rgba(rng, 2, 3)
    blob = encode_apng([
        (base, 0, 0, 0, 0),
        (patch, 2, 1, 1, 1),   # OVER blend, dispose -> background
        (patch2, 5, 4, 2, 0),  # SOURCE, dispose -> previous
        (patch, 0, 0, 0, 1),
    ])
    out = decode_apng_frames(blob)
    assert len(out) == 4
    assert all(f.shape == (8, 10, 4) and f.dtype == np.uint8 for f in out)
    assert np.array_equal(out[0], base)

    exp1 = base.copy()
    exp1[1:4, 2:6] = _apng_over(base[1:4, 2:6], patch)
    assert np.array_equal(out[1], exp1)
    after1 = exp1.copy()
    after1[1:4, 2:6] = 0                    # dispose 1: transparent black
    exp2 = after1.copy()
    exp2[4:6, 5:8] = patch2
    assert np.array_equal(out[2], exp2)
    exp3 = after1.copy()                    # dispose 2 restored pre-frame
    exp3[0:3, 0:4] = _apng_over(after1[0:3, 0:4], patch)
    assert np.array_equal(out[3], exp3)


def test_apng_first_frame_coercions():
    """Spec §12.3: frame 0 treats blend OVER as SOURCE and dispose
    PREVIOUS as BACKGROUND."""
    from document_convert_to__markdown_spark.extractors.png_codec import (
        decode_apng_frames, encode_apng,
    )
    rng = np.random.RandomState(8)
    base = _rand_rgba(rng, 5, 6)            # semi-transparent base
    patch = _rand_rgba(rng, 2, 2, alpha=255)
    out = decode_apng_frames(encode_apng([
        (base, 0, 0, 2, 1),                 # dispose=PREVIOUS, blend=OVER
        (patch, 1, 1, 0, 0),
    ]))
    # blend coerced to SOURCE: frame 0 is exactly `base`, not
    # base-over-transparent (which would zero RGB where alpha is 0)
    assert np.array_equal(out[0], base)
    # dispose coerced to BACKGROUND: canvas cleared before frame 1
    exp = np.zeros_like(base)
    exp[1:3, 1:3] = patch
    assert np.array_equal(out[1], exp)


def test_apng_static_png_and_malformed_raise():
    from document_convert_to__markdown_spark.extractors.png_codec import (
        decode_apng_frames, encode_apng,
    )
    rng = np.random.RandomState(9)
    base = _rand_rgba(rng, 4, 4, alpha=255)
    with pytest.raises(UnsupportedPNG):
        decode_apng_frames(encode_png(base))  # no acTL

    blob = bytearray(encode_apng([(base, 0, 0, 0, 0),
                                  (base[:2, :2], 1, 1, 0, 0)]))
    # break the fdAT sequence number (acTL + fcTL0 + IDAT + fcTL1 + fdAT)
    pos = bytes(blob).find(b"fdAT")
    blob[pos + 4:pos + 8] = struct.pack(">I", 9)
    with pytest.raises(ValueError, match="sequence"):
        decode_apng_frames(bytes(blob))

    # acTL frame-count mismatch
    blob2 = bytearray(encode_apng([(base, 0, 0, 0, 0)]))
    pos = bytes(blob2).find(b"acTL")
    blob2[pos + 4:pos + 8] = struct.pack(">I", 3)
    with pytest.raises(ValueError, match="acTL declares"):
        decode_apng_frames(bytes(blob2))

    # frame rect outside the canvas
    blob3 = bytearray(encode_apng([(base, 0, 0, 0, 0),
                                   (base[:2, :2], 2, 2, 0, 0)]))
    pos = bytes(blob3).find(b"fcTL", bytes(blob3).find(b"IDAT"))
    # widen frame 1 to 4x4 at (2, 2) -> exceeds the 4x4 canvas
    blob3[pos + 8:pos + 12] = struct.pack(">I", 4)
    with pytest.raises(ValueError, match="rect|truncated|sequence"):
        decode_apng_frames(bytes(blob3))


def test_apng_encoder_validation():
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_apng,
    )
    rng = np.random.RandomState(10)
    base = _rand_rgba(rng, 4, 4)
    with pytest.raises(ValueError, match="at least one"):
        encode_apng([])
    # the canvas IS frame 0's shape, so "frame 0 smaller than canvas"
    # can't be expressed — but an offset frame 0 is refused:
    with pytest.raises(ValueError, match="\\(0, 0\\)"):
        encode_apng([(base, 1, 0, 0, 0)])
    with pytest.raises(ValueError, match="outside canvas"):
        encode_apng([(base, 0, 0, 0, 0), (base, 1, 1, 0, 0)])
    with pytest.raises(ValueError, match="RGBA"):
        encode_apng([(base[:, :, :3], 0, 0, 0, 0)])


def test_apng_frame_count_probe():
    from document_convert_to__markdown_spark.extractors.png_codec import (
        apng_frame_count, encode_apng,
    )
    rng = np.random.RandomState(11)
    base = _rand_rgba(rng, 4, 4)
    blob = encode_apng([(base, 0, 0, 0, 0), (base[:2, :2], 0, 0, 0, 0),
                        (base[:1, :1], 3, 3, 0, 0)])
    assert apng_frame_count(blob) == 3
    assert apng_frame_count(encode_png(base)) is None
    assert apng_frame_count(b"notapng") is None


def test_apng_default_image_outside_animation():
    """When the first fcTL comes AFTER IDAT, the default image is not
    an animation frame — frames come only from fdAT."""
    from document_convert_to__markdown_spark.extractors.png_codec import (
        decode_apng_frames, encode_apng,
    )
    rng = np.random.RandomState(12)
    base = _rand_rgba(rng, 4, 5, alpha=255)
    f1 = _rand_rgba(rng, 4, 5, alpha=255)
    blob = bytearray(encode_apng([(base, 0, 0, 0, 0), (f1, 0, 0, 0, 0)]))
    # surgically move fcTL0 to after IDAT: rebuild chunk-by-chunk
    import zlib as _z
    pos, chunks = len(PNG_SIG), []
    b = bytes(blob)
    while pos < len(b):
        (ln,) = struct.unpack(">I", b[pos:pos + 4])
        chunks.append((b[pos + 4:pos + 8], b[pos + 8:pos + 8 + ln]))
        pos += 12 + ln
    out = PNG_SIG
    for tag, data in chunks:
        if tag == b"fcTL" and struct.unpack(">I", data[:4])[0] == 0:
            continue                       # drop fcTL0 entirely
        if tag == b"fcTL":                 # renumber: fcTL1/fdAT1 -> 0/1
            data = struct.pack(">I", 0) + data[4:]
        if tag == b"fdAT":
            data = struct.pack(">I", 1) + data[4:]
        if tag == b"acTL":
            data = struct.pack(">II", 1, 0)
        out += _chunk(tag, data)
    frames = decode_apng_frames(out)
    assert len(frames) == 1
    assert np.array_equal(frames[0], f1)   # IDAT default image skipped


# ------------------------------------------------------------------ tRNS

def _ihdr(w, h, depth, ctype, interlace=0):
    return _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype,
                                       0, 0, interlace))


def test_trns_palette_per_entry_alpha():
    # 3-entry palette, tRNS covers only the first two entries
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = zlib.compress(b"".join(b"\x00" + r.tobytes() for r in idx))
    blob = (PNG_SIG + _ihdr(3, 2, 8, 3) + _chunk(b"PLTE", pal)
            + _chunk(b"tRNS", bytes([10, 200]))
            + _chunk(b"IDAT", raw) + _chunk(b"IEND", b""))
    px, mode = decode_png(blob)
    assert mode == "RGBA" and px.shape == (2, 3, 4)
    exp_a = np.array([[10, 200, 255], [255, 200, 10]], dtype=np.uint8)
    assert np.array_equal(px[:, :, 3], exp_a)
    assert np.array_equal(px[0, 0, :3], [255, 0, 0])


def test_trns_gray_8bit_and_subbyte():
    g = np.array([[0, 7, 255], [7, 0, 7]], dtype=np.uint8)
    raw = zlib.compress(b"".join(b"\x00" + r.tobytes() for r in g))
    blob = (PNG_SIG + _ihdr(3, 2, 8, 0)
            + _chunk(b"tRNS", struct.pack(">H", 7))
            + _chunk(b"IDAT", raw) + _chunk(b"IEND", b""))
    px, mode = decode_png(blob)
    assert mode == "LA" and px.shape == (2, 3, 2)
    assert np.array_equal(px[:, :, 0], g)
    assert np.array_equal(px[:, :, 1] == 0, g == 7)

    # 2-bit gray: value 3 transparent, compared BEFORE the 85x rescale
    vals = np.array([[0, 1, 2, 3]], dtype=np.uint8)
    packed = np.packbits(((vals.reshape(1, 4, 1)
                           >> np.arange(1, -1, -1)) & 1).astype(np.uint8)
                         .reshape(1, 8), axis=1)
    raw = zlib.compress(b"\x00" + packed.tobytes())
    blob = (PNG_SIG + _ihdr(4, 1, 2, 0)
            + _chunk(b"tRNS", struct.pack(">H", 3))
            + _chunk(b"IDAT", raw) + _chunk(b"IEND", b""))
    px, mode = decode_png(blob)
    assert mode == "LA"
    assert np.array_equal(px[0, :, 0], [0, 85, 170, 255])
    assert np.array_equal(px[0, :, 1], [255, 255, 255, 0])


def test_trns_rgb_sample_match():
    rgb = np.array([[[1, 2, 3], [9, 9, 9]],
                    [[1, 2, 4], [1, 2, 3]]], dtype=np.uint8)
    raw = zlib.compress(b"".join(
        b"\x00" + rgb[y].tobytes() for y in range(2)))
    blob = (PNG_SIG + _ihdr(2, 2, 8, 2)
            + _chunk(b"tRNS", struct.pack(">HHH", 1, 2, 3))
            + _chunk(b"IDAT", raw) + _chunk(b"IEND", b""))
    px, mode = decode_png(blob)
    assert mode == "RGBA" and px.shape == (2, 2, 4)
    assert np.array_equal(px[:, :, 3],
                          [[0, 255], [255, 0]])
    assert np.array_equal(px[:, :, :3], rgb)


def test_trns_illegal_and_truncated():
    arr = np.zeros((2, 2, 4), dtype=np.uint8)
    blob = bytearray(encode_png(arr))
    # inject tRNS before IDAT on an RGBA image -> illegal
    pos = bytes(blob).find(b"IDAT") - 4
    bad = bytes(blob[:pos]) + _chunk(b"tRNS", b"\x00\x00") + bytes(blob[pos:])
    with pytest.raises(ValueError, match="illegal for alpha"):
        decode_png(bad)

    g = np.zeros((2, 2), dtype=np.uint8)
    raw = zlib.compress(b"\x00\x00\x00\x00\x00\x00")
    blob = (PNG_SIG + _ihdr(2, 2, 8, 0) + _chunk(b"tRNS", b"\x07")
            + _chunk(b"IDAT", raw) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truncated tRNS"):
        decode_png(blob)


def test_trns_depth16_high_byte_compare():
    # depth-16 gray, transparent value 0x0102: compare on high byte 0x01
    g16 = np.array([[0x0102, 0x01FF, 0x0201]], dtype=">u2")
    raw = zlib.compress(b"\x00" + g16.tobytes())
    blob = (PNG_SIG + _ihdr(3, 1, 16, 0)
            + _chunk(b"tRNS", struct.pack(">H", 0x0102))
            + _chunk(b"IDAT", raw) + _chunk(b"IEND", b""))
    px, mode = decode_png(blob)
    assert mode == "LA"
    # both 0x01xx samples reduce to 0x01 == tRNS high byte -> alpha 0
    assert np.array_equal(px[0, :, 1], [0, 0, 255])


def test_trns_apng_passthrough():
    """tRNS inside an APNG applies to every reconstructed frame."""
    from document_convert_to__markdown_spark.extractors.png_codec import (
        decode_apng_frames,
    )
    pal = bytes([10, 20, 30, 40, 50, 60])
    idx0 = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    raw0 = zlib.compress(b"".join(b"\x00" + r.tobytes() for r in idx0))
    idx1 = np.array([[1]], dtype=np.uint8)
    raw1 = zlib.compress(b"\x00" + idx1.tobytes())
    fctl0 = _chunk(b"fcTL", struct.pack(">IIIIIHHBB", 0, 2, 2, 0, 0,
                                        1, 10, 0, 0))
    fctl1 = _chunk(b"fcTL", struct.pack(">IIIIIHHBB", 1, 1, 1, 0, 0,
                                        1, 10, 0, 0))
    blob = (PNG_SIG + _ihdr(2, 2, 8, 3) + _chunk(b"PLTE", pal)
            + _chunk(b"tRNS", bytes([128]))
            + _chunk(b"acTL", struct.pack(">II", 2, 0))
            + fctl0 + _chunk(b"IDAT", raw0)
            + fctl1 + _chunk(b"fdAT", struct.pack(">I", 2) + raw1)
            + _chunk(b"IEND", b""))
    frames = decode_apng_frames(blob)
    assert len(frames) == 2
    # palette entry 0 has alpha 128, entry 1 opaque
    assert np.array_equal(frames[0][:, :, 3],
                          [[128, 255], [255, 128]])
    assert np.array_equal(frames[0][0, 0], [10, 20, 30, 128])
    # frame 1 overwrites (0,0) with entry 1 (opaque)
    assert np.array_equal(frames[1][0, 0], [40, 50, 60, 255])


def test_apng_every_truncation_raises_valueerror():
    """video_frame_sample's fallback catches ValueError ONLY; an APNG
    truncated at ANY byte offset must raise ValueError (never
    struct.error/IndexError/zlib.error) or decode cleanly."""
    from document_convert_to__markdown_spark.extractors.png_codec import (
        decode_apng_frames, encode_apng,
    )
    rng = np.random.RandomState(70)
    base = _rand_rgba(rng, 5, 6, alpha=255)
    good = encode_apng([(base, 0, 0, 0, 0),
                        (base[:2, :3], 1, 1, 1, 1),
                        (base[:3, :2], 2, 0, 2, 0)])
    for cut in range(len(good)):
        try:
            decode_apng_frames(good[:cut])
        except ValueError:
            pass                                # the contract
