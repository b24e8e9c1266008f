"""From-scratch lossless-WebP codec (extractors/webp_codec.py).

Covers: exact round-trips through every transform (none /
subtract-green / cross-color / palette / all 14 predictor modes) and
every channel shape; hand-crafted bitstreams for the decoder-only
paths the literal-only encoder never emits — LZ77 backward references
(both the literal >120 distance form and the 2D distance-map form),
the color cache, and meta prefix groups; container handling (VP8X
wrapper, lossy-VP8 / animation refusal); hostile-input behavior
(truncation, bit flips, allocation bombs → ValueError only); and the
Spark provenance columns plus a PNG↔WebP cross-codec dHash identity.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from document_convert_to__markdown_spark.extractors.webp_codec import (
    UnsupportedWebP, _BitWriter, _DIST_MAP, _huffman_lengths,
    _prefix_encode, _wrap_vp8l, _write_entropy_body, _write_prefix_code,
    decode_webp, encode_webp, is_webp,
)


def _rgb(h, w, seed=0, channels=3):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, channels)).astype(np.uint8)


def _expected(px):
    """Encoder input → the array decode_webp must return."""
    e = px
    if e.ndim == 2:
        e = np.repeat(e[:, :, None], 3, axis=2)
    elif e.shape[2] == 1:
        e = np.repeat(e, 3, axis=2)
    elif e.shape[2] == 2:
        e = np.dstack([np.repeat(e[:, :, :1], 3, axis=2), e[:, :, 1]])
    if e.shape[2] == 4 and (e[:, :, 3] == 255).all():
        e = e[:, :, :3]
    return e


@pytest.mark.parametrize("shape", [(1, 1, 3), (7, 5, 3), (16, 16, 4),
                                   (9, 13), (8, 8, 2), (33, 17, 3)])
@pytest.mark.parametrize("transform", [None, "subtract_green", "color"])
def test_roundtrip_shapes_and_pointwise_transforms(shape, transform):
    px = _rgb(*shape[:2], seed=hash(shape) % 97,
              channels=shape[2] if len(shape) == 3 else 1)
    if len(shape) == 2:
        px = px[:, :, 0]
    got, mode = decode_webp(encode_webp(px, transform=transform))
    want = _expected(px)
    assert got.shape == want.shape and (got == want).all()
    assert mode == ("RGBA" if want.shape[2] == 4 else "RGB")


@pytest.mark.parametrize("mode_idx", list(range(14)))
def test_roundtrip_every_predictor_mode(mode_idx):
    px = _rgb(20, 18, seed=mode_idx, channels=4)
    got, _ = decode_webp(encode_webp(px, transform="predictor",
                                     predictor_mode=mode_idx))
    assert (got == _expected(px)).all()


def test_roundtrip_palette_bundlings():
    # 2 / 4 / 16 / 256 colors exercise every sub-byte bundling width
    rng = np.random.RandomState(3)
    for n_colors in (2, 4, 16, 200):
        colors = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
        idx = rng.randint(0, n_colors, (11, 23))
        px = colors[idx]
        got, mode = decode_webp(encode_webp(px, transform="palette"))
        assert mode == "RGB" and (got == px).all()


def test_alpha_mode_provenance():
    px = _rgb(6, 6, seed=5, channels=4)
    px[:, :, 3] = 255
    assert decode_webp(encode_webp(px))[1] == "RGB"
    px[2, 3, 3] = 7
    got, mode = decode_webp(encode_webp(px))
    assert mode == "RGBA" and got[2, 3, 3] == 7


# ------------------------------------------------ crafted bitstreams

def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _lengths(freq_syms, alphabet):
    freqs = {}
    for s in freq_syms:
        freqs[s] = freqs.get(s, 0) + 1
    return _huffman_lengths(freqs, alphabet, 15)


def test_crafted_lz77_and_color_cache():
    """4×2 image: 4 literals, a length-3 distance-4 backref (literal
    >120 plane-code form), then a color-cache hit — the decoder paths
    the literal-only encoder never writes."""
    cache_bits = 4
    greens = [0, 10, 20, 30]
    reds = [100, 101, 102, 103]
    blues = [200, 201, 202, 203]
    pix = [(255 << 24) | (reds[i] << 16) | (greens[i] << 8) | blues[i]
           for i in range(4)]
    slots = [((0x1E35A7BD * p) & 0xFFFFFFFF) >> (32 - cache_bits)
             for p in pix]
    assert slots[3] not in slots[:3]        # p3's slot survives the copy

    len_sym, len_eb, len_ev = _prefix_encode(3)          # copy length 3
    dist_sym, dist_eb, dist_ev = _prefix_encode(4 + 120)  # literal dist 4
    g_alpha = 280 + (1 << cache_bits)
    cache_sym = 280 + slots[3]

    bw = _BitWriter()
    _header(bw, 4, 2)
    bw.write(0, 1)                           # no transforms
    bw.write(1, 1)                           # color cache on
    bw.write(cache_bits, 4)
    bw.write(0, 1)                           # no meta prefix
    g_tab = _write_prefix_code(
        bw, _lengths(greens + [256 + len_sym, cache_sym], g_alpha), g_alpha)
    r_tab = _write_prefix_code(bw, _lengths(reds, 256), 256)
    b_tab = _write_prefix_code(bw, _lengths(blues, 256), 256)
    a_tab = _write_prefix_code(bw, _lengths([255], 256), 256)
    d_len = [0] * 40
    d_len[dist_sym] = 1
    _write_prefix_code(bw, d_len, 40)
    for i in range(4):
        for tab, v in ((g_tab, greens[i]), (r_tab, reds[i]),
                       (b_tab, blues[i]), (a_tab, 255)):
            l, c = tab[v]
            if l:
                bw.write_code(c, l)
    l, c = g_tab[256 + len_sym]
    bw.write_code(c, l)
    bw.write(len_ev, len_eb)                 # length extra bits (none)
    bw.write(dist_ev, dist_eb)               # distance extra bits
    l, c = g_tab[cache_sym]
    bw.write_code(c, l)

    got, mode = decode_webp(_wrap_vp8l(bw.getvalue()))
    want = np.array([[(reds[i], greens[i], blues[i]) for i in range(4)]] * 2,
                    dtype=np.uint8)
    assert mode == "RGB" and (got == want).all()


def test_crafted_2d_distance_map():
    """5×2 image: row 1 is a length-5 backref with plane code 1 —
    (0, 1) in the RFC 9649 distance map, i.e. dist = image width."""
    greens = [0, 10, 20, 30, 40]
    pix_rgb = [(100 + i, greens[i], 200 + i) for i in range(5)]
    len_sym, len_eb, len_ev = _prefix_encode(5)
    assert _DIST_MAP[0] == (0, 1)
    bw = _BitWriter()
    _header(bw, 5, 2)
    bw.write(0, 1)                           # no transforms
    bw.write(0, 1)                           # no cache
    bw.write(0, 1)                           # no meta
    g_tab = _write_prefix_code(
        bw, _lengths(greens + [256 + len_sym], 280), 280)
    r_tab = _write_prefix_code(
        bw, _lengths([p[0] for p in pix_rgb], 256), 256)
    b_tab = _write_prefix_code(
        bw, _lengths([p[2] for p in pix_rgb], 256), 256)
    a_tab = _write_prefix_code(bw, _lengths([255], 256), 256)
    d_len = [0] * 40
    d_len[0] = 1                             # prefix value 1 → plane code 1
    _write_prefix_code(bw, d_len, 40)
    for r, g, b in pix_rgb:
        for tab, v in ((g_tab, g), (r_tab, r), (b_tab, b), (a_tab, 255)):
            l, c = tab[v]
            if l:
                bw.write_code(c, l)
    l, c = g_tab[256 + len_sym]
    bw.write_code(c, l)
    bw.write(len_ev, len_eb)
    got, mode = decode_webp(_wrap_vp8l(bw.getvalue()))
    want = np.array([pix_rgb] * 2, dtype=np.uint8)
    assert mode == "RGB" and (got == want).all()


def test_crafted_meta_prefix_groups():
    """8×2 image with meta_bits=2: two prefix-code groups selected by
    the meta image — left 4×4 block decodes group 0's literal, right
    block group 1's."""
    bw = _BitWriter()
    _header(bw, 8, 2)
    bw.write(0, 1)                           # no transforms
    bw.write(0, 1)                           # no cache
    bw.write(1, 1)                           # meta prefix present
    bw.write(0, 3)                           # meta_bits = 2
    meta = np.array([[0xFF000000, 0xFF000100]], dtype=np.uint32)
    _write_entropy_body(bw, meta, level0=False)
    for a, r, g, b in ((255, 10, 20, 30), (255, 40, 50, 60)):
        for sym, alphabet in ((g, 280), (r, 256), (b, 256), (a, 256)):
            lens = [0] * alphabet
            lens[sym] = 1
            _write_prefix_code(bw, lens, alphabet)
        d_len = [0] * 40
        d_len[0] = 1
        _write_prefix_code(bw, d_len, 40)
    got, mode = decode_webp(_wrap_vp8l(bw.getvalue()))
    want = np.empty((2, 8, 3), dtype=np.uint8)
    want[:, :4] = (10, 20, 30)
    want[:, 4:] = (40, 50, 60)
    assert mode == "RGB" and (got == want).all()


# --------------------------------------------- container & hostile

def _lossy_vp8_container():
    body = b"\x00" * 20
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
            + b"VP8 " + struct.pack("<I", len(body)) + body)


def test_lossy_routes_to_vp8_and_garbage_refuses_cleanly():
    # Lossy WebP now decodes through vp8_codec; malformed VP8 data
    # (zero bytes = bad start code) must still raise ValueError,
    # never a silent wrong decode.
    with pytest.raises(ValueError):
        decode_webp(_lossy_vp8_container())
    from document_convert_to__markdown_spark.extractors.vp8_codec \
        import encode_webp_lossy
    px = np.full((20, 28, 3), (90, 160, 60), np.uint8)
    dec, mode = decode_webp(encode_webp_lossy(px, quality=90))
    assert mode == "RGB" and dec.shape == (20, 28, 3)
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 6
    # malformed lossy animation frame: ValueError too
    lossy_frame = b"VP8 " + struct.pack("<I", 8) + b"\0" * 8
    anmf = b"ANMF" + struct.pack("<I", 16 + len(lossy_frame)) \
        + b"\0" * 16 + lossy_frame
    cont = b"RIFF" + struct.pack("<I", 4 + len(anmf)) + b"WEBP" + anmf
    with pytest.raises(ValueError):
        decode_webp(cont)
    anim = (b"RIFF" + struct.pack("<I", 18) + b"WEBP"
            + b"ANIM" + struct.pack("<I", 6) + b"\0" * 6)
    with pytest.raises(ValueError):
        decode_webp(anim)
    assert is_webp(_lossy_vp8_container())
    assert not is_webp(b"RIFF1234ABCD")


def test_animated_lossless_decodes_first_frame():
    """ANMF frames holding VP8L data decode their first frame — the
    same convention gif_codec uses for animated GIFs."""
    px = _rgb(6, 7, seed=21)
    data = encode_webp(px)
    (ln,) = struct.unpack("<I", data[16:20])
    vp8l_chunk = data[12:20 + ln + (ln & 1)]
    anim = b"ANIM" + struct.pack("<I", 6) + b"\0" * 6
    frame = b"ANMF" + struct.pack("<I", 16 + len(vp8l_chunk)) \
        + b"\0" * 16 + vp8l_chunk
    body = anim + frame
    cont = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    got, mode = decode_webp(cont)
    assert mode == "RGB" and (got == px).all()


def test_vp8x_wrapper_walked_to_vp8l():
    data = encode_webp(_rgb(5, 5, seed=9))
    (ln,) = struct.unpack("<I", data[16:20])
    vp8l_chunk = data[12:20 + ln + (ln & 1)]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\0" * 10
    body = vp8x + vp8l_chunk
    wrapped = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    got, _ = decode_webp(wrapped)
    want, _ = decode_webp(data)
    assert (got == want).all()


def test_allocation_bomb_dies_before_alloc():
    bw = _BitWriter()
    _header(bw, 16384, 16384)                # 268M pixels declared
    bw.write(0, 1)
    with pytest.raises(UnsupportedWebP):
        decode_webp(_wrap_vp8l(bw.getvalue()))


def test_truncation_always_valueerror_never_else():
    data = encode_webp(_rgb(12, 9, seed=4), transform="predictor")
    for cut in range(0, len(data) - 1, 7):
        try:
            decode_webp(data[:cut])
        except ValueError:
            pass                             # the contract


@settings(max_examples=150, deadline=None)
@given(junk=st.binary(max_size=256))
def test_fuzz_junk_vp8l_never_crashes(junk):
    payload = _wrap_vp8l(b"\x2f" + junk)
    try:
        px, mode = decode_webp(payload)
        assert px.ndim == 3 and mode in ("RGB", "RGBA")
    except ValueError:                       # UnsupportedWebP included
        pass


@settings(max_examples=60, deadline=None)
@given(flips=st.lists(st.tuples(st.integers(0, 10_000),
                                st.integers(0, 255)),
                      min_size=1, max_size=8))
def test_fuzz_bitflipped_real_webp_never_crashes(flips):
    base = bytearray(encode_webp(_rgb(10, 10, seed=6),
                                 transform="subtract_green"))
    for pos, val in flips:
        base[pos % len(base)] = val
    try:
        decode_webp(bytes(base))
    except ValueError:
        pass


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_fuzz_roundtrip_random_shapes_and_transforms(data):
    """Any small image through any encoder path round-trips exactly
    (≤144 pixels → always ≤256 colors, so palette is always legal)."""
    h = data.draw(st.integers(1, 12))
    w = data.draw(st.integers(1, 12))
    c = data.draw(st.sampled_from([1, 2, 3, 4]))
    tr = data.draw(st.sampled_from(
        [None, "subtract_green", "color", "palette", "predictor"]))
    px = np.random.RandomState(data.draw(st.integers(0, 10_000))) \
        .randint(0, 256, (h, w, c)).astype(np.uint8)
    got, _ = decode_webp(encode_webp(
        px, transform=tr, predictor_mode=data.draw(st.integers(0, 13))))
    assert (got == _expected(px)).all()


# ------------------------------------------------------ Spark paths

def test_spark_resize_modes_and_cross_codec_dhash(spark):
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        image_dhash, media_resize,
    )
    px = _rgb(24, 24, seed=7)
    rows = [
        ("u/real.webp", bytearray(encode_webp(px))),
        ("u/pal.webp", bytearray(encode_webp((px // 64) * 64,
                                             transform="palette"))),
        ("u/real.png", bytearray(encode_png(px))),
        ("u/lossy.webp", bytearray(_lossy_vp8_container())),
    ]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r["url"]: r for r in media_resize(df, width=4, height=4).collect()}
    assert got["u/real.webp"]["mode"] == "RGB"       # real decode
    assert got["u/pal.webp"]["mode"] == "RGB"
    assert got["u/lossy.webp"]["mode"] == "stub"     # honest fallback
    assert got["u/real.webp"]["data"] == got["u/real.png"]["data"]

    hashes = {r["url"]: r["dhash"]
              for r in image_dhash(df).collect()}
    # same pixels through two independent from-scratch codecs → the
    # same perceptual hash: a cross-codec decode-correctness witness
    assert hashes["u/real.webp"] == hashes["u/real.png"]


# --------------------------------------------------------- animation

def _apng_style_over(dst, src):
    import numpy as np
    fa = src[:, :, 3:].astype(np.float64) / 255.0
    ca = dst[:, :, 3:].astype(np.float64) / 255.0
    oa = fa + ca * (1 - fa)
    out = dst.copy()
    out[:, :, :3] = np.rint(
        (src[:, :, :3] * fa + dst[:, :, :3] * ca * (1 - fa))
        / np.where(oa == 0, 1.0, oa)).astype(np.uint8)
    out[:, :, 3:] = np.rint(oa * 255).astype(np.uint8)
    return out


def test_webp_anim_compositing_semantics():
    import numpy as np
    from document_convert_to__markdown_spark.extractors.webp_codec import (
        decode_webp_frames, encode_webp_anim,
    )

    rng = np.random.RandomState(60)
    base = rng.randint(0, 256, (6, 8, 4)).astype(np.uint8)
    base[:, :, 3] = 255
    p1 = rng.randint(0, 256, (2, 4, 4)).astype(np.uint8)
    p2 = rng.randint(0, 256, (4, 2, 4)).astype(np.uint8)
    blob = encode_webp_anim(
        [(base, 0, 0, 1, 0),
         (p1, 2, 2, 0, 1),      # alpha-blend, dispose-to-background
         (p2, 4, 0, 1, 0)],
        bg=(9, 8, 7, 6))
    out = decode_webp_frames(blob)
    assert len(out) == 3
    assert np.array_equal(out[0], base)
    e1 = base.copy()
    e1[2:4, 2:6] = _apng_style_over(base[2:4, 2:6], p1)
    assert np.array_equal(out[1], e1)
    after = e1.copy()
    after[2:4, 2:6] = [9, 8, 7, 6]          # ANIM background RGBA
    e2 = after.copy()
    e2[0:4, 4:6] = p2
    assert np.array_equal(out[2], e2)


def test_webp_anim_refusals_and_first_frame_convention():
    import numpy as np
    import pytest as _pytest
    from document_convert_to__markdown_spark.extractors.webp_codec import (
        UnsupportedWebP, decode_webp, decode_webp_frames, encode_webp,
        encode_webp_anim,
    )

    rng = np.random.RandomState(61)
    base = rng.randint(0, 256, (4, 4, 4)).astype(np.uint8)
    with _pytest.raises(UnsupportedWebP):
        decode_webp_frames(encode_webp(base))     # static: no ANMF
    with _pytest.raises(ValueError, match="even"):
        encode_webp_anim([(base, 0, 0, 1, 0), (base[:2, :2], 1, 0, 1, 0)])
    with _pytest.raises(ValueError, match="outside canvas"):
        encode_webp_anim([(base, 0, 0, 1, 0), (base, 2, 2, 1, 0)])
    # static decode of an animated container returns frame 1's pixels
    blob = encode_webp_anim([(base, 0, 0, 1, 0)])
    px, mode = decode_webp(blob)
    want = base if mode == "RGBA" else base[:, :, :3]
    assert np.array_equal(px, want)


def test_webp_anim_frame_sample_routing(spark):
    import numpy as np
    from document_convert_to__markdown_spark.extractors.webp_codec import (
        decode_webp_frames, encode_webp_anim,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        video_frame_sample,
    )

    rng = np.random.RandomState(62)
    base = rng.randint(0, 256, (6, 6, 4)).astype(np.uint8)
    base[:, :, 3] = 255
    anim = [(base, 0, 0, 1, 0)]
    for f in range(4):
        patch = rng.randint(0, 256, (2, 2, 4)).astype(np.uint8)
        anim.append((patch, 2 * (f % 3), 2 * (f % 2), f % 2, f % 2))
    blob = encode_webp_anim(anim)
    df = spark.createDataFrame([("w-anim", bytearray(blob))],
                               "url string, data binary")
    rows = sorted(video_frame_sample(df, every_n=2).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.mode for r in rows] == ["webp"] * 3
    expected = decode_webp_frames(blob)
    for r in rows:
        assert bytes(r.frame_data) == expected[r.frame_idx].tobytes()


def test_webp_anim_every_truncation_raises_valueerror():
    """Animated-WebP truncated at ANY byte offset must raise ValueError
    (never struct.error/IndexError) or decode cleanly — the
    frame-sample fallback catches ValueError only."""
    import numpy as np
    from document_convert_to__markdown_spark.extractors.webp_codec import (
        decode_webp_frames, encode_webp_anim,
    )
    rng = np.random.RandomState(71)
    base = rng.randint(0, 256, (4, 6, 4)).astype(np.uint8)
    good = encode_webp_anim([(base, 0, 0, 1, 0),
                             (base[:2, :2], 2, 2, 0, 1)])
    for cut in range(len(good)):
        try:
            decode_webp_frames(good[:cut])
        except ValueError:
            pass


def test_webp_anim_max_frames_caps_decode():
    """Regression: frames beyond max_frames must never decode (a
    crafted file with thousands of tiny constant-color ANMF chunks
    used to materialize every canvas during the chunk walk)."""
    import numpy as np
    from document_convert_to__markdown_spark.extractors.webp_codec import (
        decode_webp_frames, encode_webp_anim,
    )
    base = np.full((4, 4, 4), 200, dtype=np.uint8)
    anim = [(base, 0, 0, 1, 0)] * 40
    out = decode_webp_frames(encode_webp_anim(anim), max_frames=3)
    assert len(out) == 3


def test_animated_mixed_lossless_lossy_frames():
    """ANMF frames may be VP8L or VP8(+ALPH); the compositor blends
    both onto the shared canvas.  Expected canvases are computed by
    an independent numpy compositing of the independently-decoded
    frame pixels."""
    from document_convert_to__markdown_spark.extractors.vp8_codec \
        import decode_vp8, encode_vp8

    from document_convert_to__markdown_spark.extractors.webp_codec \
        import decode_webp_frames

    rng = np.random.default_rng(3)
    cw, ch = 32, 24
    f0 = rng.integers(0, 256, (ch, cw, 4), dtype=np.uint8)
    f0[..., 3] = 255
    f1_rgb = rng.integers(0, 256, (8, 16, 3), dtype=np.uint8)
    alpha = np.where(np.mgrid[0:8, 0:16][1] < 8, 255,
                     30).astype(np.uint8)
    vp8_1 = encode_vp8(f1_rgb, quality=90)
    alph_1 = bytes([0]) + alpha.tobytes()

    def chunk(tag, data):
        return (tag + struct.pack("<I", len(data)) + data
                + (b"\x00" if len(data) & 1 else b""))

    def anmf(x, y, w, h, flags, sub):
        params = (struct.pack("<I", x // 2)[:3]
                  + struct.pack("<I", y // 2)[:3]
                  + struct.pack("<I", w - 1)[:3]
                  + struct.pack("<I", h - 1)[:3]
                  + b"\x00\x00\x00" + bytes([flags]))
        return chunk(b"ANMF", params + sub)

    vp8l0 = encode_webp(f0)
    (ln,) = struct.unpack("<I", vp8l0[16:20])
    vp8l0_chunk = vp8l0[12:20 + ln + (ln & 1)]
    body = (chunk(b"VP8X", bytes([0x12, 0, 0, 0])
                  + struct.pack("<I", cw - 1)[:3]
                  + struct.pack("<I", ch - 1)[:3])
            + chunk(b"ANIM", b"\x00" * 6)
            + anmf(0, 0, cw, ch, 0, vp8l0_chunk)
            + anmf(4, 8, 16, 8, 0,
                   chunk(b"ALPH", alph_1) + chunk(b"VP8 ", vp8_1)))
    cont = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body

    frames = decode_webp_frames(cont)
    assert len(frames) == 2
    assert (frames[0] == f0).all()
    expected = f0.copy()
    lossy = np.dstack([decode_vp8(vp8_1), alpha])
    rect = expected[8:16, 4:20]
    a = lossy[..., 3:].astype(np.uint16)
    rect[..., :3] = ((lossy[..., :3].astype(np.uint16) * a
                      + rect[..., :3].astype(np.uint16) * (255 - a)
                      + 127) // 255).astype(np.uint8)
    assert (frames[1] == expected).all()
