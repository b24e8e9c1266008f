"""Standalone VP8 codec tests (no system libraries required).

Interop parity against libwebp lives in
``tests/test_libwebp_vp8_parity.py``; these tests pin the properties
that must hold in a bare container: encoder/decoder self-consistency,
quality-monotone fidelity, multi-partition equivalence, loop-filter
behavior, and the ValueError-only hostile-input contract.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.vp8_codec import (
    UnsupportedVP8,
    decode_vp8,
    decode_vp8_planes,
    encode_vp8,
    encode_webp_lossy,
    rgb_to_yuv420,
)
from document_convert_to__markdown_spark.extractors.webp_codec import (
    decode_webp,
)


def _photo(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    for c in range(3):
        img[..., c] = np.clip(
            128 + 90 * np.sin(xx / (7 + 3 * c)) * np.cos(yy / (5 + 2 * c))
            + rng.normal(0, 2, (h, w)), 0, 255)
    return img


def test_flat_mid_gray_is_exact():
    # Y=128 flat image: prediction hits exactly, every residual is
    # zero, all MBs skip -> decode is bit-exact at any quality.
    img = np.full((32, 48, 3), 130, np.uint8)  # maps to Y=128
    y, u, v = rgb_to_yuv420(img)
    assert int(y[0, 0]) == 128
    for q in (10, 50, 95):
        dy, du, dv = decode_vp8_planes(encode_vp8(img, quality=q))
        assert (dy == y).all() and (du == u).all() and (dv == v).all()


def test_fidelity_improves_with_quality():
    img = _photo(48, 64)
    y_src = rgb_to_yuv420(img)[0]
    errs = []
    for q in (20, 60, 95):
        dy = decode_vp8_planes(encode_vp8(img, quality=q))[0]
        errs.append(np.abs(dy.astype(int) - y_src.astype(int)).mean())
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1.5


def test_multi_partition_streams_reconstruct_identically():
    # Partition count only re-routes tokens across bool coders; the
    # decoded planes must be identical.
    img = _photo(80, 64, seed=3)
    ref = decode_vp8_planes(encode_vp8(img, quality=70))
    for n in (2, 4, 8):
        got = decode_vp8_planes(encode_vp8(img, quality=70,
                                           n_partitions=n))
        for a, b in zip(ref, got):
            assert (a == b).all()


def test_loop_filter_applies_and_is_bypassable():
    img = _photo(48, 48, seed=5)
    frame = encode_vp8(img, quality=40, filter_level=32)
    filtered = decode_vp8_planes(frame, loop_filter=True)
    raw = decode_vp8_planes(frame, loop_filter=False)
    assert any((a != b).any() for a, b in zip(filtered, raw))
    # level 0 stream: filter is a no-op either way
    frame0 = encode_vp8(img, quality=40, filter_level=0)
    assert all((a == b).all() for a, b in zip(
        decode_vp8_planes(frame0, True),
        decode_vp8_planes(frame0, False)))


def test_simple_filter_differs_from_normal():
    img = _photo(48, 48, seed=6)
    normal = decode_vp8_planes(
        encode_vp8(img, quality=30, filter_level=40))
    simple = decode_vp8_planes(
        encode_vp8(img, quality=30, filter_level=40,
                   filter_simple=True))
    assert any((a != b).any() for a, b in zip(normal, simple))
    # simple filter never touches chroma
    raw = decode_vp8_planes(
        encode_vp8(img, quality=30, filter_level=40,
                   filter_simple=True), loop_filter=False)
    assert (simple[1] == raw[1]).all() and (simple[2] == raw[2]).all()


def test_odd_dimensions_crop():
    img = _photo(33, 49, seed=9)
    rgb = decode_vp8(encode_vp8(img, quality=80))
    assert rgb.shape == (33, 49, 3)
    y, u, v = decode_vp8_planes(encode_vp8(img, quality=80))
    assert y.shape == (33, 49) and u.shape == (17, 25)


def test_webp_container_roundtrip():
    img = _photo(24, 40)
    dec, mode = decode_webp(encode_webp_lossy(img, quality=85))
    assert mode == "RGB" and dec.shape == (24, 40, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 6.0


def test_gray_input_accepted():
    g = np.tile(np.arange(64, dtype=np.uint8) * 4, (32, 1))
    y = decode_vp8_planes(encode_vp8(g, quality=90))[0]
    assert y.shape == (32, 64)


def test_hostile_inputs_raise_valueerror_only():
    img = _photo(32, 32)
    frame = bytearray(encode_vp8(img, quality=70))
    # inter-frame bit
    bad = bytes([frame[0] | 1]) + bytes(frame[1:])
    with pytest.raises(UnsupportedVP8):
        decode_vp8_planes(bad)
    # bad start code
    bad = bytes(frame[:3]) + b"\x00\x00\x00" + bytes(frame[6:])
    with pytest.raises(ValueError):
        decode_vp8_planes(bad)
    # oversized dims
    huge = bytes(frame[:6]) + struct.pack("<HH", 0x3FFF, 0x3FFF) \
        + bytes(frame[10:])
    with pytest.raises(UnsupportedVP8):
        decode_vp8_planes(huge)
    # every truncation offset: ValueError or a clean decode (the §7
    # boolean decoder may legally read a few bits past a stream's
    # end, so near-end truncations can still decode), never a crash.
    for cut in range(len(frame)):
        try:
            decode_vp8_planes(bytes(frame[:cut]))
        except ValueError:
            pass
    # random corruption: same contract
    rng = np.random.default_rng(0)
    for _ in range(25):
        mut = bytearray(frame)
        for _ in range(3):
            mut[rng.integers(3, len(mut))] = rng.integers(0, 256)
        try:
            decode_vp8_planes(bytes(mut))
        except ValueError:
            pass


def test_truncated_anmf_lossy_subchunk_raises():
    """Review regression: an ANMF body that ends before its declared
    VP8/ALPH sub-chunk size must raise, not hand the boolean decoder
    a silently-short stream (its end-of-stream tolerance would decode
    wrong pixels)."""
    from document_convert_to__markdown_spark.extractors.webp_codec \
        import decode_webp

    frame = encode_vp8(_photo(24, 32), quality=85)

    def chunk(tag, data):
        return (tag + struct.pack("<I", len(data)) + data
                + (b"\x00" if len(data) & 1 else b""))

    # 16-byte ANMF params: x(3) y(3) w-1(3) h-1(3) delay(3) flags(1)
    params = (struct.pack("<I", 0)[:3] + struct.pack("<I", 0)[:3]
              + struct.pack("<I", 31)[:3] + struct.pack("<I", 23)[:3]
              + b"\x00\x00\x00" + b"\x00")
    anmf_body = params + chunk(b"VP8 ", frame)
    body = (chunk(b"VP8X", bytes([0x02, 0, 0, 0])
                  + struct.pack("<I", 31)[:3]
                  + struct.pack("<I", 23)[:3])
            + chunk(b"ANIM", b"\x00" * 6)
            + b"ANMF" + struct.pack("<I", len(anmf_body)) + anmf_body)
    cont = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    # sanity: the intact container decodes
    full = decode_webp(cont)[0]
    assert full.shape == (24, 32, 3)
    # cut 1..24 bytes off the ANMF sub-chunk: every cut must raise
    for cut in range(1, 25):
        hostile = cont[:-cut]
        # fix up the RIFF + ANMF declared sizes to claim the ORIGINAL
        # lengths (the attack: sizes promise more bytes than exist)
        with pytest.raises(ValueError):
            decode_webp(hostile)
