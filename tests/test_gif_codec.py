"""From-scratch GIF codec (extractors/gif_codec.py) — pure functions,
no Spark.  Covers: LZW encode/decode roundtrips across code sizes
(dictionary growth, the KwKwK case, the 12-bit full-table reset),
frame roundtrips (plain, interlaced, transparent, 256-color), a
hand-assembled sub-frame placed on the logical-screen canvas, a
hand-built LZW stream decoded against known output, and refusal of
malformed inputs instead of a wrong decode.
"""

import struct

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.gif_codec import (
    GifLzwError, _lzw_decode, _lzw_encode, decode_gif, encode_gif,
)


@pytest.mark.parametrize("mcs,n", [(2, 1), (2, 10), (2, 5000),
                                   (4, 20000), (8, 70000)])
def test_lzw_roundtrip(mcs, n):
    rng = np.random.RandomState(7 * mcs + n)
    data = rng.randint(0, 1 << mcs, n).astype(np.uint8).tobytes()
    assert bytes(_lzw_decode(mcs, _lzw_encode(mcs, data), n)) == data


def test_lzw_kwkwk_case():
    # runs of one symbol exercise the code == next_idx branch
    data = b"\x01" * 100 + b"\x00" + b"\x01" * 50
    assert bytes(_lzw_decode(2, _lzw_encode(2, data), len(data))) == data


def test_lzw_full_dictionary_reset():
    # 8-bit alphabet, enough unique context to fill 4096 entries and
    # force the encoder's mid-stream CLEAR
    rng = np.random.RandomState(3)
    data = rng.randint(0, 256, 300_000).astype(np.uint8).tobytes()
    assert bytes(_lzw_decode(8, _lzw_encode(8, data), len(data))) == data


def test_lzw_handcrafted_stream():
    """Decode a hand-packed stream: min=2, codes [clear=4, 1, 2, end=5]
    at width 3, LSB-first → pixels [1, 2]."""
    codes = [(4, 3), (1, 3), (2, 3), (5, 3)]
    buf = 0
    nbits = 0
    out = bytearray()
    for code, size in codes:
        buf |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        out.append(buf & 0xFF)
    assert bytes(_lzw_decode(2, bytes(out), 2)) == b"\x01\x02"


def test_lzw_rejects_garbage():
    with pytest.raises(GifLzwError):
        _lzw_decode(2, b"", 5)                  # truncated
    with pytest.raises(GifLzwError):
        _lzw_decode(1, b"\x00", 1)              # bad min code size


def _pal(n, seed=11):
    return np.random.RandomState(seed).randint(0, 256, (n, 3)) \
        .astype(np.uint8)


def test_gif_roundtrip_plain():
    pal = _pal(5)
    idx = np.random.RandomState(1).randint(0, 5, (23, 31)).astype(np.uint8)
    px, mode = decode_gif(encode_gif(idx, pal))
    assert mode == "RGB" and px.shape == (23, 31, 3)
    assert (px == pal[idx]).all()


def test_gif_roundtrip_interlaced():
    pal = _pal(7)
    idx = np.random.RandomState(2).randint(0, 7, (17, 9)).astype(np.uint8)
    px, _ = decode_gif(encode_gif(idx, pal, interlace=True))
    assert (px == pal[idx]).all()


def test_gif_transparency_to_alpha():
    pal = _pal(4)
    idx = np.random.RandomState(4).randint(0, 4, (6, 8)).astype(np.uint8)
    px, mode = decode_gif(encode_gif(idx, pal, transparent=2))
    assert mode == "RGBA" and px.shape == (6, 8, 4)
    assert (px[..., :3] == pal[idx]).all()
    assert (px[..., 3] == np.where(idx == 2, 0, 255)).all()


def test_gif_256_color_table():
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    idx = np.random.RandomState(5).randint(0, 256, (64, 64)) \
        .astype(np.uint8)
    px, _ = decode_gif(encode_gif(idx, pal))
    assert (px == pal[idx]).all()


def test_gif_subframe_on_canvas():
    """A 2×2 frame at offset (1, 2) over a 4×5 screen filled with the
    background color — assembled by hand (encode_gif always writes
    full frames)."""
    pal = np.array([[9, 9, 9], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    frame = np.array([[1, 2], [3, 1]], np.uint8)
    full = encode_gif(frame, pal)
    # splice: new logical screen 5×4, bg index 0, frame at left=2,top=1
    gct_bits = 2                                # 4 entries
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 5, 4, 0x80 | (gct_bits - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 2, 1, 2, 2, 0)
    # reuse the LZW body from the full encoding (after its descriptor)
    body_at = 6 + 7 + 12 + 10                   # hdr + lsd + gct + desc
    out += full[body_at:]
    px, mode = decode_gif(bytes(out))
    assert mode == "RGB" and px.shape == (4, 5, 3)
    want = np.broadcast_to(pal[0], (4, 5, 3)).copy()
    want[1:3, 2:4] = pal[frame]
    assert (px == want).all()


def test_gif_refusals():
    pal = _pal(4)
    idx = np.zeros((3, 3), np.uint8)
    good = encode_gif(idx, pal)
    with pytest.raises(ValueError):
        decode_gif(b"notagif!")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a")                   # truncated header
    with pytest.raises(ValueError):
        decode_gif(good[:20])                   # truncated body
    with pytest.raises(ValueError):
        encode_gif(np.full((2, 2), 9, np.uint8), pal)  # index > palette
    with pytest.raises(ValueError):
        encode_gif(idx, np.zeros((300, 3), np.uint8))  # palette too big


def test_gif_every_truncation_raises_valueerror():
    """_decode_image's stub fallback catches ValueError ONLY; a GIF
    truncated at ANY byte offset must therefore raise ValueError (not
    struct.error/IndexError) or decode cleanly — else one garbage
    crawl row kills the whole Spark task."""
    pal = _pal(6)
    idx = np.random.RandomState(9).randint(0, 6, (5, 7)).astype(np.uint8)
    good = encode_gif(idx, pal, transparent=1)
    for cut in range(len(good)):
        try:
            decode_gif(good[:cut])
        except ValueError:
            pass                                # the contract
    # and the operators' fallback really does swallow it
    from document_convert_to__markdown_spark.operators.multimodal import (
        _decode_image,
    )
    for cut in (7, 14, 30, 35, len(good) - 2):
        px, mode = _decode_image(good[:cut])
        assert mode == "stub" and px.ndim == 3


def test_gif_background_uses_global_table():
    """Spec: the LSD's background index refers to the GLOBAL color
    table, even when the frame carries a local one."""
    gct = np.array([[0, 255, 0], [1, 2, 3]], np.uint8)       # bg = green
    lct = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)
    frame = np.array([[0, 1]], np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 3, 0x80 | 0, 0, 0)       # 2-entry GCT
    out += gct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 1, 0x80 | 0)  # LCT frame
    out += lct.tobytes()
    # splice LZW body from a full-frame encoding with the same indices
    donor = encode_gif(frame, lct)
    body_at = 6 + 7 + 6 + 10                    # hdr + lsd + gct(2) + desc
    out += donor[body_at:]
    px, mode = decode_gif(bytes(out))
    assert mode == "RGB"
    assert (px[0, 0] == gct[0]).all()           # canvas = GLOBAL bg
    assert (px[1, 1] == lct[0]).all() and (px[1, 2] == lct[1]).all()


# --- animation compositing (round 5) -----------------------------------------

from document_convert_to__markdown_spark.extractors.gif_codec import (  # noqa: E402
    decode_gif_frames, encode_gif_animation,
)


def _anim_palette():
    return np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0],
                     [0, 0, 200]], np.uint8)


def test_gif_animation_disposal_none_transparency_composites():
    pal = _anim_palette()
    f1 = np.full((4, 4), 1, np.uint8)
    f2 = np.full((4, 4), 2, np.uint8)
    f2[0, :] = 3                                 # transparent index
    fr = decode_gif_frames(encode_gif_animation(
        [(f1, 0, 0, 1, None), (f2, 0, 0, 1, 3)], pal))
    assert len(fr) == 2
    assert (fr[0] == pal[1]).all()
    assert (fr[1][1:] == pal[2]).all()
    assert (fr[1][0] == pal[1]).all()            # shows through frame 1


def test_gif_animation_disposal_restore_background_and_previous():
    pal = _anim_palette()
    f1 = np.full((4, 4), 1, np.uint8)
    patch = np.full((2, 2), 2, np.uint8)
    clear = np.full((4, 4), 3, np.uint8)         # fully transparent
    # disposal 2: the patch rect restores to background before frame 3
    fr2 = decode_gif_frames(encode_gif_animation(
        [(f1, 0, 0, 1, None), (patch, 1, 1, 2, None),
         (clear, 0, 0, 1, 3)], pal))
    assert (fr2[1][1:3, 1:3] == pal[2]).all()
    assert (fr2[2][1:3, 1:3] == pal[0]).all()    # bg restored
    assert (fr2[2][0] == pal[1]).all()           # rest keeps frame 1
    # disposal 3: frame 3 sees the pre-patch canvas (== frame 1)
    fr3 = decode_gif_frames(encode_gif_animation(
        [(f1, 0, 0, 1, None), (patch, 1, 1, 3, None),
         (clear, 0, 0, 1, 3)], pal))
    assert np.array_equal(fr3[2], fr3[0])


def test_gif_animation_first_frame_matches_decode_gif():
    rng = np.random.RandomState(21)
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    idx = rng.randint(0, 8, (7, 9)).astype(np.uint8)
    enc = encode_gif(idx, pal)
    first, mode = decode_gif(enc)
    frames = decode_gif_frames(enc)
    assert mode == "RGB" and len(frames) == 1
    assert np.array_equal(frames[0], first)


def test_gif_logical_screen_bomb_rejected():
    """60000x60000 screen around a 1x1 frame must refuse before the
    ~11 GB canvas allocation (pre-round-5 this hung)."""
    g = bytearray(encode_gif(np.zeros((1, 1), np.uint8),
                             np.zeros((2, 3), np.uint8)))
    g[6:10] = struct.pack("<HH", 60000, 60000)
    with pytest.raises(ValueError):
        decode_gif(bytes(g))
    with pytest.raises(ValueError):
        decode_gif_frames(bytes(g))


def test_gif_max_frames_cap():
    pal = _anim_palette()
    f = np.zeros((2, 2), np.uint8)
    anim = encode_gif_animation([(f, 0, 0, 1, None)] * 20, pal)
    assert len(decode_gif_frames(anim, max_frames=5)) == 5


def test_video_frame_sample_real_gif_frames(spark):
    from document_convert_to__markdown_spark.operators.multimodal import (
        video_frame_sample,
    )

    pal = _anim_palette()
    f1 = np.full((3, 5), 1, np.uint8)
    f2 = np.full((3, 5), 2, np.uint8)
    anim = encode_gif_animation(
        [(f1, 0, 0, 1, None), (f2, 0, 0, 1, None)], pal)
    df = spark.createDataFrame([("g", bytearray(anim))],
                               "url string, data binary")
    rows = video_frame_sample(df, every_n=1).collect()
    assert [r["mode"] for r in rows] == ["gif", "gif"]
    got1 = np.frombuffer(rows[0]["frame_data"], np.uint8).reshape(3, 5, 3)
    got2 = np.frombuffer(rows[1]["frame_data"], np.uint8).reshape(3, 5, 3)
    assert (got1 == pal[1]).all() and (got2 == pal[2]).all()
