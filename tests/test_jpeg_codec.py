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


def test_arithmetic_and_cmyk_refused():
    enc = bytearray(encode_jpeg(_smooth_rgb(8, 8)))
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC9                 # SOF0 -> SOF9 arithmetic
    with pytest.raises(UnsupportedJpeg):
        decode_jpeg(bytes(enc))
    enc2 = bytearray(encode_jpeg(_smooth_rgb(8, 8)))
    sof2 = enc2.index(b"\xff\xc0")
    enc2[sof2 + 9] = 4                  # ncomp 3 -> 4 (CMYK-shaped)
    with pytest.raises((UnsupportedJpeg, ValueError)):
        decode_jpeg(bytes(enc2))


def test_baseline_stream_relabeled_sof2_rejected_not_misdecoded():
    """A baseline scan header (Se=63) under an SOF2 frame is invalid
    (a DC progressive scan must have Se=0) — must raise, never decode
    garbage."""
    enc = bytearray(encode_jpeg(_smooth_rgb(8, 8)))
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))


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


# --- progressive (SOF2) ----------------------------------------------------

from document_convert_to__markdown_spark.extractors.jpeg_codec import (  # noqa: E402
    encode_jpeg_progressive,
)


def _parity(img, quality=85, subsampling="444", restart_interval=0):
    """Cross-mode contract: same quantizer -> byte-identical decode."""
    b = encode_jpeg(img, quality=quality, subsampling=subsampling,
                    restart_interval=restart_interval)
    p = encode_jpeg_progressive(img, quality=quality,
                                subsampling=subsampling,
                                restart_interval=restart_interval)
    db, mb = decode_jpeg(b)
    dp, mp = decode_jpeg(p)
    assert mb == mp and db.shape == dp.shape
    assert np.array_equal(db, dp)
    return p


def test_progressive_is_sof2_and_multiscan():
    p = _parity(_smooth_rgb(24, 33))
    assert b"\xff\xc2" in p and b"\xff\xc0" not in p
    assert p.count(b"\xff\xda") == 10   # the 10-scan color script


def test_progressive_parity_gray_and_color():
    yy, xx = np.mgrid[0:17, 0:23]
    _parity(((yy * 200) // 16 + (xx * 40) // 22).astype(np.uint8))
    _parity(_smooth_rgb(33, 41))


def test_progressive_parity_noise_and_flat():
    rng = np.random.default_rng(3)
    for q in (1, 25, 85, 100):
        _parity(rng.integers(0, 256, (40, 56, 3), np.uint8), quality=q,
                subsampling="420")
        _parity(rng.integers(0, 256, (24, 40), np.uint8), quality=q)
    _parity(np.full((32, 32, 3), 200, np.uint8))
    _parity(np.zeros((17, 19), np.uint8))


def test_progressive_parity_with_restarts():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    p = _parity(img, restart_interval=3)
    assert any(bytes([0xFF, 0xD0 + k]) in p for k in range(8))
    _parity(img, subsampling="420", restart_interval=2)
    _parity(rng.integers(0, 256, (24, 24), np.uint8), restart_interval=5)


def test_progressive_truncation_raises_or_decodes_partial():
    """Truncated progressive: a prefix that ends at a scan boundary is
    a VALID coarser image (that's the format's point — incremental
    rendering), anything mid-scan raises.  Either way: full declared
    shape, never a hang or non-ValueError."""
    img = _smooth_rgb(16, 16)
    enc = encode_jpeg_progressive(img, quality=85)
    full, _ = decode_jpeg(enc)
    partials = 0
    for cut in range(3, len(enc) - 1, 11):
        try:
            dec, mode = decode_jpeg(enc[:cut])
        except ValueError:
            continue
        partials += 1
        assert mode == "RGB" and dec.shape == img.shape
    assert partials < (len(enc) - 4) // 11   # some cuts must still raise


def test_progressive_dimension_bomb_rejected_before_allocation():
    enc = bytearray(encode_jpeg_progressive(_smooth_rgb(8, 8)))
    sof = bytes(enc).index(b"\xff\xc2")
    enc[sof + 5:sof + 9] = struct.pack(">HH", 0xFFFF, 0xFFFF)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))


@settings(max_examples=40, deadline=None)
@given(flips=st.lists(st.tuples(st.integers(3, 10_000),
                                st.integers(0, 255)),
                      min_size=1, max_size=6))
def test_fuzz_bitflipped_progressive_never_crashes(flips):
    enc = bytearray(encode_jpeg_progressive(_smooth_rgb(16, 24)))
    for pos, val in flips:
        enc[pos % len(enc)] = val
    try:
        decode_jpeg(bytes(enc))
    except ValueError:
        pass


def _handcrafted_eobrun_jpeg():
    """Gray 32x8 progressive stream whose AC scans carry EOBn runs > 1
    (our encoder caps runs at 1, so this path needs its own fixture).

    Custom 3-bit AC table {0x00 EOB0, 0x01, 0x10 EOBn(r=1), 0x11};
    quant all-ones.  Final coefficients (zigzag index: value):
      block0: DC 8, zz1=3, zz3=+1   (refined from first-scan 2<<? ...)
      block1: DC 16; block2: DC 24; block3: DC 32, zz2=-3
    """
    from document_convert_to__markdown_spark.extractors import jpeg_codec as J

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes([1] * 64))           # DQT id0, all 1s
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 32)
               + bytes([1, 1, 0x11, 0]))                  # SOF2 1 comp 1x1
    out += seg(0xC4, bytes([0x00]) + bytes(J._DC_LUM_BITS)
               + bytes(J._DC_LUM_VALS))                   # DC table 0
    ac_bits = [0, 0, 4] + [0] * 13                        # four 3-bit codes
    ac_vals = [0x00, 0x01, 0x10, 0x11]
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    dc = J._build_codes(J._DC_LUM_BITS, J._DC_LUM_VALS)
    ac = J._build_codes(ac_bits, ac_vals)

    # scan 1: DC first (Ss=0 Se=0 Ah=0 Al=0), DCs 8,16,24,32 (diff 8 each)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    bw = J._BitWriter()
    for _ in range(4):
        c, ln = dc[4]
        bw.write(c, ln)
        bw.write(8, 4)
    bw.flush()
    out += bw.out

    # scan 2: AC first, Al=1: block0 zz1=+1 (->2), then EOBn r=1 bits=1
    # (eobrun 2: skips blocks 1,2); block3 run1 size1 -> zz2=-1 (->-2), EOB0
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    bw = J._BitWriter()
    c, ln = ac[0x01]; bw.write(c, ln); bw.write(1, 1)     # +1 at zz1
    c, ln = ac[0x10]; bw.write(c, ln); bw.write(1, 1)     # EOBn: run 2
    c, ln = ac[0x11]; bw.write(c, ln); bw.write(0, 1)     # -1 at zz2
    c, ln = ac[0x00]; bw.write(c, ln)                     # EOB0
    bw.flush()
    out += bw.out

    # scan 3: AC refine Ah=1 Al=0: block0 sym(run1,1)+sign + correction
    # bit for zz1 (2->3), newval +1 lands at zz3; EOBn r=1 bits=1 ->
    # eobrun 3 (rest of block0 + blocks 1,2); block3: EOB0 + correction
    # bit for zz2 (-2->-3)
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    bw = J._BitWriter()
    c, ln = ac[0x11]; bw.write(c, ln)                     # run1, size1
    bw.write(1, 1)                                        # sign: +1
    bw.write(1, 1)                                        # correction zz1
    c, ln = ac[0x10]; bw.write(c, ln); bw.write(1, 1)     # EOBn: run 3
    c, ln = ac[0x00]; bw.write(c, ln)                     # EOB0 (block3)
    bw.write(1, 1)                                        # correction zz2
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_eobrun_gt1_and_refinement_semantics():
    from document_convert_to__markdown_spark.extractors import jpeg_codec as J

    got, mode = decode_jpeg(_handcrafted_eobrun_jpeg())
    assert mode == "L" and got.shape == (8, 32)
    # independent reconstruction from the intended coefficients
    coefs = np.zeros((4, 64), np.int64)
    coefs[:, 0] = [8, 16, 24, 32]
    coefs[0, 1] = 3
    coefs[0, 3] = 1
    coefs[3, 2] = -3
    expect = np.zeros((8, 32))
    for b in range(4):
        nat = coefs[b][J._UNZIGZAG].reshape(8, 8).astype(np.float64)
        expect[:, b * 8:(b + 1) * 8] = J._DCT_M.T @ nat @ J._DCT_M + 128.0
    expect = np.clip(np.round(expect), 0, 255).astype(np.uint8)
    assert np.array_equal(got, expect)


def test_progressive_spark_decode_provenance(spark):
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_resize,
    )

    rows = [("p1", bytearray(encode_jpeg_progressive(_smooth_rgb(12, 18)))),
            ("p2", bytearray(encode_jpeg_progressive(
                np.arange(64, dtype=np.uint8).reshape(8, 8))))]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r["url"]: r["mode"]
           for r in media_resize(df, width=4, height=4).collect()}
    assert got == {"p1": "RGB", "p2": "L"}
