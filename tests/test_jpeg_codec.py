"""From-scratch baseline JPEG codec (extractors/jpeg_codec.py) — pure
functions plus the media_resize real path.  Lossy format, so
roundtrips assert error bounds instead of byte equality: flat blocks
roundtrip exactly (DC-only), smooth gradients within a quality-scaled
tolerance, and higher quality must never be less faithful.  Also
covers gray, 4:2:0 subsampling, restart markers, odd (non-multiple-
of-8) dimensions, progressive/CMYK refusals, truncation at every
marker boundary, and the Spark decode provenance column.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from document_convert_to__markdown_spark.extractors.jpeg_codec import (
    JPEG_SOI, UnsupportedJpeg, decode_jpeg, encode_jpeg,
)


def _smooth_rgb(h: int, w: int) -> np.ndarray:
    """Gradient without wrap-around jumps (kind to chroma averaging)."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (yy * 127) // max(1, h - 1) + 64
    g = (xx * 127) // max(1, w - 1) + 32
    b = ((yy + xx) * 127) // max(1, h + w - 2) + 96
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def test_flat_color_roundtrips_exactly():
    for shade in (0, 64, 137, 255):
        img = np.full((16, 24, 3), shade, np.uint8)
        dec, mode = decode_jpeg(encode_jpeg(img, quality=75))
        assert mode == "RGB" and dec.shape == img.shape
        assert int(np.abs(dec.astype(int) - int(shade)).max()) <= 1


def test_gradient_roundtrip_error_bounds():
    img = _smooth_rgb(24, 33)
    for quality, bound in ((50, 20), (85, 12), (95, 6)):
        dec, mode = decode_jpeg(encode_jpeg(img, quality=quality))
        assert mode == "RGB" and dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= bound, (quality, err.max())


def test_higher_quality_never_less_faithful():
    img = _smooth_rgb(40, 40)
    means = []
    for quality in (30, 60, 90):
        dec, _ = decode_jpeg(encode_jpeg(img, quality=quality))
        means.append(float(np.abs(dec.astype(int) - img.astype(int)).mean()))
    assert means[0] >= means[1] >= means[2]


def test_gray_roundtrip():
    yy, xx = np.mgrid[0:17, 0:23]
    g = ((yy * 200) // 16 + (xx * 40) // 22).astype(np.uint8)
    dec, mode = decode_jpeg(encode_jpeg(g, quality=90))
    assert mode == "L" and dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 8
    # (h, w, 1) input is treated as gray
    dec2, mode2 = decode_jpeg(encode_jpeg(g[:, :, None], quality=90))
    assert mode2 == "L" and (dec2 == dec).all()


def test_420_subsampling_roundtrip():
    img = _smooth_rgb(30, 31)          # odd width exercises chroma pad
    enc = encode_jpeg(img, quality=90, subsampling="420")
    dec, mode = decode_jpeg(enc)
    assert mode == "RGB" and dec.shape == img.shape
    # chroma is box-averaged 2x2 then nearest-upsampled: looser bound
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 24
    # SOF must declare 2x2 luma sampling
    sof = enc.index(b"\xff\xc0")
    assert enc[sof + 11] == 0x22


def test_restart_markers_roundtrip_and_present():
    img = _smooth_rgb(24, 40)          # 15 MCUs at 4:4:4
    enc = encode_jpeg(img, quality=85, restart_interval=4)
    assert b"\xff\xdd" in enc          # DRI
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    dec, _ = decode_jpeg(enc)
    base, _ = decode_jpeg(encode_jpeg(img, quality=85))
    assert (dec == base).all()         # RSTs change framing, not pixels


def test_odd_dimensions_crop_back():
    for h, w in ((1, 1), (7, 7), (9, 17), (8, 8), (15, 3)):
        img = _smooth_rgb(h, w)
        dec, _ = decode_jpeg(encode_jpeg(img, quality=92))
        assert dec.shape == (h, w, 3)


def test_meta_parser_reads_encoder_output():
    from document_convert_to__markdown_spark.extractors.image_extractor import (
        image_meta,
    )
    enc = encode_jpeg(_smooth_rgb(10, 21), quality=80)
    meta = image_meta(enc, "jpeg")
    assert (meta.width, meta.height, meta.mode) == (21, 10, "RGB")


def test_progressive_and_cmyk_refused():
    enc = bytearray(encode_jpeg(_smooth_rgb(8, 8)))
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC2                 # SOF0 -> SOF2 progressive
    with pytest.raises(UnsupportedJpeg):
        decode_jpeg(bytes(enc))
    enc2 = bytearray(encode_jpeg(_smooth_rgb(8, 8)))
    sof2 = enc2.index(b"\xff\xc0")
    enc2[sof2 + 9] = 4                  # ncomp 3 -> 4 (CMYK-shaped)
    with pytest.raises((UnsupportedJpeg, ValueError)):
        decode_jpeg(bytes(enc2))


def test_truncation_always_raises_never_hangs():
    enc = encode_jpeg(_smooth_rgb(16, 16), quality=85)
    for cut in range(3, len(enc) - 1, 7):
        with pytest.raises(ValueError):
            decode_jpeg(enc[:cut])


def test_declared_mcu_bound_rejects_dimension_bomb():
    """65535x65535 header with a tiny scan must refuse before allocating."""
    enc = bytearray(encode_jpeg(_smooth_rgb(8, 8), quality=85))
    sof = bytes(enc).index(b"\xff\xc0")
    enc[sof + 5:sof + 9] = struct.pack(">HH", 0xFFFF, 0xFFFF)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def test_short_segment_bodies_raise_valueerror_not_indexerror():
    """SOF/SOS/DRI bodies shorter than their fixed fields must raise
    ValueError (stub-fallback-visible), never IndexError/struct.error —
    the module contract callers rely on (multimodal._decode_image and
    decode_avi's MJPG path catch ValueError only)."""
    sof_ok = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                  + bytes([1, 1, 0x11, 0]))
    cases = [
        JPEG_SOI + _seg(0xC0, b"\x08"),                     # short SOF head
        JPEG_SOI + _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                        + bytes([3, 1, 0x11, 0])),          # SOF comps cut
        JPEG_SOI + sof_ok + _seg(0xDA, b""),                # empty SOS
        JPEG_SOI + sof_ok + _seg(0xDA, bytes([3, 1, 0])),   # SOS comps cut
        JPEG_SOI + _seg(0xDD, b"\x01") + b"\xff\xd9",       # short DRI
    ]
    for payload in cases:
        with pytest.raises(ValueError):
            decode_jpeg(payload)


def test_sampling_factor_bomb_rejected_before_allocation():
    """A 30720x30720 SOF with 4x4 luma sampling and a ~300KB junk scan
    previously passed the MCU-count bound yet implied a multi-GiB
    float64 plane.  T.81 B.2.2 (sum Hi*Vi <= 10) plus the per-BLOCK
    scan-bytes bound must kill it as ValueError pre-allocation."""
    sof = (bytes([8]) + struct.pack(">HH", 30720, 30720)
           + bytes([3, 1, 0x44, 0, 2, 0x11, 0, 3, 0x11, 0]))
    bomb = (JPEG_SOI + _seg(0xDB, bytes([0]) + bytes(64)) + _seg(0xC0, sof)
            + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]))
            + b"\x55" * 300_000 + b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg(bomb)
    # in-T.81-bound sampling (2x2+1x1+1x1 = 6 blocks/MCU) with bomb
    # dimensions must trip the block-vs-scan-bytes bound instead
    sof2 = (bytes([8]) + struct.pack(">HH", 0xFFF0, 0xFFF0)
            + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    bomb2 = (JPEG_SOI + _seg(0xDB, bytes([0]) + bytes(64)) + _seg(0xC0, sof2)
             + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]))
             + b"\x55" * 300_000 + b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg(bomb2)


@settings(max_examples=150, deadline=None)
@given(junk=st.binary(max_size=1024))
def test_fuzz_junk_after_soi_never_crashes(junk):
    """Arbitrary bytes behind a valid SOI either decode or raise
    ValueError — never hang, never propagate numpy/struct errors."""
    try:
        decode_jpeg(JPEG_SOI + junk)
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(flips=st.lists(st.tuples(st.integers(3, 10_000),
                                st.integers(0, 255)),
                      min_size=1, max_size=6))
def test_fuzz_bitflipped_real_jpeg_never_crashes(flips):
    enc = bytearray(encode_jpeg(_smooth_rgb(16, 24), quality=85))
    for pos, val in flips:
        enc[pos % len(enc)] = val
    try:
        decode_jpeg(bytes(enc))
    except ValueError:
        pass


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(JPEG_SOI + b"\x00" * 10)


def test_spark_decode_provenance(spark):
    """Real baseline JPEGs decode with mode RGB/L; the synthesizer's
    header-only JPEG (no scan) falls to the labeled stub."""
    from document_convert_to__markdown_spark.data.synth import make_jpeg
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_resize,
    )

    rows = [("u1", bytearray(encode_jpeg(_smooth_rgb(12, 18), quality=88))),
            ("u2", bytearray(encode_jpeg(
                np.arange(64, dtype=np.uint8).reshape(8, 8), quality=88))),
            ("u3", bytearray(make_jpeg(10, 10)))]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r["url"]: r["mode"]
           for r in media_resize(df, width=4, height=4).collect()}
    assert got == {"u1": "RGB", "u2": "L", "u3": "stub"}
