"""From-scratch ICO codec (extractors/ico_codec.py) — pure functions
plus the media_resize / media_metadata real paths.  Covers: 32-bit DIB
roundtrip, PNG-entry delegation, best-entry selection, AND-mask and
all-zero-alpha-quirk transparency, 8-bit palette entries, cursor and
low-bit-depth refusal, header-only ico_meta, every-offset truncation
raising ValueError only, and the Spark provenance columns.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from document_convert_to__markdown_spark.extractors.ico_codec import (
    ICO_SIG, UnsupportedIco, decode_ico, encode_ico, ico_meta, is_ico,
)


def _rgb(h, w, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)).astype(np.uint8)


def _ico_container(entries):
    """[(w, h, bitcount, payload_bytes)] → ICO bytes."""
    n = len(entries)
    off = 6 + 16 * n
    dirs, bodies = [], []
    for w, h, bits, body in entries:
        dirs.append(struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0,
                                1, bits, len(body), off))
        bodies.append(body)
        off += len(body)
    return ICO_SIG + struct.pack("<H", n) + b"".join(dirs) + b"".join(bodies)


def _dib_entry(rgb, alpha=None, mask_bits=None, bits=32):
    """Hand-built double-height DIB entry (XOR + AND mask)."""
    h, w = rgb.shape[:2]
    if bits == 32:
        a = alpha if alpha is not None \
            else np.full((h, w), 255, dtype=np.uint8)
        xor = np.dstack([rgb, a])[::-1][:, :, [2, 1, 0, 3]] \
            .reshape(h, w * 4).tobytes()
    else:                                       # 24-bit, stride-padded
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w * 3] = rgb[::-1][:, :, ::-1].reshape(h, w * 3)
        xor = rows.tobytes()
    and_stride = ((w + 7) // 8 + 3) & ~3
    mrows = np.zeros((h, and_stride), dtype=np.uint8)
    if mask_bits is not None:                   # (h, w) of 0/1, top-down
        mrows[:, :(w + 7) // 8] = np.packbits(
            mask_bits[::-1].astype(np.uint8), axis=1)
    body = mrows.tobytes()
    return struct.pack("<IiihHIIiiII", 40, w, 2 * h, 1, bits, 0,
                       len(xor) + len(body), 0, 0, 0, 0) + xor + body


def test_encode_decode_roundtrip_32bit():
    px = _rgb(9, 13, seed=1)                    # odd width
    got, mode = decode_ico(encode_ico(px))
    assert mode == "RGBA" and got.shape == (9, 13, 4)
    assert (got[:, :, :3] == px).all() and (got[:, :, 3] == 255).all()


def test_png_entry_delegates_to_png_codec():
    from document_convert_to__markdown_spark.extractors.png_codec import (
        decode_png, encode_png,
    )
    px = _rgb(16, 16, seed=2)
    png = encode_png(px)
    ico = _ico_container([(16, 16, 32, png)])
    got, mode = decode_ico(ico)
    want, wmode = decode_png(png)
    assert mode == wmode and (got == want).all()


def test_best_entry_is_largest_then_deepest():
    big, small = _rgb(32, 32, seed=3), _rgb(8, 8, seed=4)
    ico = _ico_container([
        (8, 8, 32, _dib_entry(small)),
        (32, 32, 32, _dib_entry(big)),
    ])
    got, _ = decode_ico(ico)
    assert got.shape[:2] == (32, 32) and (got[:, :, :3] == big).all()
    w, h, bits, n = ico_meta(ico)
    assert (w, h, bits, n) == (32, 32, 32, 2)


def test_and_mask_transparency_24bit():
    px = _rgb(6, 10, seed=5)
    mask = np.zeros((6, 10), dtype=np.uint8)
    mask[0, :] = 1                              # top row transparent
    ico = _ico_container([(10, 6, 24,
                           _dib_entry(px, mask_bits=mask, bits=24))])
    got, mode = decode_ico(ico)
    assert mode == "RGBA" and (got[:, :, :3] == px).all()
    assert (got[0, :, 3] == 0).all() and (got[1:, :, 3] == 255).all()


def test_zero_alpha_quirk_uses_and_mask():
    px = _rgb(5, 5, seed=6)
    zero_a = np.zeros((5, 5), dtype=np.uint8)
    mask = np.zeros((5, 5), dtype=np.uint8)
    mask[:, 0] = 1                              # left column transparent
    ico = _ico_container([(5, 5, 32,
                           _dib_entry(px, alpha=zero_a, mask_bits=mask))])
    got, _ = decode_ico(ico)
    assert (got[:, 0, 3] == 0).all() and (got[:, 1:, 3] == 255).all()
    # a real (non-zero) alpha channel wins over the mask
    real_a = np.full((5, 5), 77, dtype=np.uint8)
    ico2 = _ico_container([(5, 5, 32,
                            _dib_entry(px, alpha=real_a, mask_bits=mask))])
    got2, _ = decode_ico(ico2)
    assert (got2[:, :, 3] == 77).all()


def test_8bit_palette_entry():
    rng = np.random.RandomState(7)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (6, 6)).astype(np.uint8)
    stride = (6 + 3) & ~3
    rows = np.zeros((6, stride), dtype=np.uint8)
    rows[:, :6] = idx[::-1]
    pal_quads = np.zeros((16, 4), dtype=np.uint8)
    pal_quads[:, :3] = pal[:, ::-1]             # BGRX
    and_stride = ((6 + 7) // 8 + 3) & ~3
    body = (struct.pack("<IiihHIIiiII", 40, 6, 12, 1, 8, 0, 0, 0, 0,
                        16, 0)
            + pal_quads.tobytes() + rows.tobytes()
            + bytes(and_stride * 6))
    got, mode = decode_ico(_ico_container([(6, 6, 8, body)]))
    assert mode == "RGBA" and (got[:, :, :3] == pal[idx]).all()
    assert (got[:, :, 3] == 255).all()


def test_truecolor_optimization_color_table_skipped():
    """BITMAPINFOHEADER permits an 'optimization' color table for
    >=16-bit DIBs (biClrUsed > 0); it sits between the header and the
    XOR image and must be skipped, not decoded as the first
    scanlines."""
    px = _rgb(6, 6, seed=12)
    body = bytearray(_dib_entry(px))
    body[32:36] = struct.pack("<I", 4)          # biClrUsed = 4
    body[40:40] = bytes(16)                     # the 4-entry table
    got, mode = decode_ico(_ico_container([(6, 6, 32, bytes(body))]))
    assert mode == "RGBA" and (got[:, :, :3] == px).all()


def test_cursor_and_low_depth_refused():
    px = _rgb(4, 4, seed=8)
    cur = bytearray(encode_ico(px))
    cur[2] = 2                                  # idType 2 = cursor
    assert not is_ico(bytes(cur))
    with pytest.raises(ValueError):
        decode_ico(bytes(cur))
    body = bytearray(_dib_entry(px))
    body[14:16] = struct.pack("<H", 4)          # biBitCount 32 -> 4
    with pytest.raises(UnsupportedIco):
        decode_ico(_ico_container([(4, 4, 4, bytes(body))]))


def test_truncation_always_valueerror_never_else():
    ico = encode_ico(_rgb(8, 8, seed=9))
    for cut in range(0, len(ico) - 1, 5):
        try:
            decode_ico(ico[:cut])
        except ValueError:
            pass                                # the contract
    # entry pointing past the payload + a dir count beyond the bytes
    bomb = _ico_container([(255, 255, 32, b"\0" * 16)])
    with pytest.raises(ValueError):
        decode_ico(bomb[:30])
    # DIB declaring huge dims with a short body dies pre-allocation
    hdr = struct.pack("<IiihHIIiiII", 40, 30000, 60000, 1, 32, 0,
                      0, 0, 0, 0, 0) + b"\0" * 64
    with pytest.raises(ValueError):
        decode_ico(_ico_container([(0, 0, 32, hdr)]))


@settings(max_examples=150, deadline=None)
@given(junk=st.binary(max_size=512))
def test_fuzz_junk_after_sig_never_crashes(junk):
    """Hostile-crawl contract: ValueError or a successful decode,
    never IndexError/struct.error/MemoryError."""
    payload = ICO_SIG + junk
    try:
        px, mode = decode_ico(payload)
        assert px.ndim == 3 and mode in ("L", "LA", "RGB", "RGBA")
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(flips=st.lists(st.tuples(st.integers(0, 10_000),
                                st.integers(0, 255)),
                      min_size=1, max_size=8))
def test_fuzz_bitflipped_real_ico_never_crashes(flips):
    base = bytearray(encode_ico(_rgb(12, 12, seed=11)))
    for pos, val in flips:
        base[pos % len(base)] = val
    try:
        decode_ico(bytes(base))
    except ValueError:
        pass


def test_spark_resize_and_metadata_real_ico(spark):
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_metadata, media_resize,
    )
    px = _rgb(16, 16, seed=10)
    rows = [("u/icon.ico", bytearray(encode_ico(px))),
            ("u/junk.bin", bytearray(b"\x00\x00\x01\x00garbage..."))]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r["url"]: r for r in media_resize(df, width=4, height=4,
                                             ).collect()}
    assert got["u/icon.ico"]["mode"] == "RGBA"      # real decode
    assert got["u/junk.bin"]["mode"] == "stub"      # fallback held
    meta = {r["url"]: r for r in media_metadata(df).collect()}
    m = meta["u/icon.ico"]
    assert (m["media_format"], m["width"], m["height"],
            m["mode"], m["n_frames"]) == ("ico", 16, 16, "32bpp", 1)
