"""Cross-validation of the from-scratch VP8L codec against libwebp.

The container ships ``libwebp.so.7`` (1.2.4) as a system library; it
is used here strictly as an independent *test oracle* — the engine's
runtime codec stays pure Python + numpy (no ctypes on any executor
path).  Both interop directions are pinned:

- ``encode_webp`` output must decode pixel-exactly in libwebp across
  every transform the encoder can emit, including prefix codes with
  lengths >= 6 (the regression class: a DEFLATE-ordered
  kCodeLengthCodeOrder decodes all lengths <= 5 streams and breaks on
  the first length-6 code, because order indices 2..7 agree between
  the wrong and the RFC 9649 §5.6.2 tables and index 8 — symbol 16 —
  does not);
- libwebp-encoded streams (which exercise LZ77, color cache and meta
  prefix groups far more aggressively than our encoder) must decode
  pixel-exactly in ``decode_webp``, compared against libwebp's own
  decode so the oracle is the *decoder* pair, not the encoder's
  non-exact alpha preprocessing.

Skipped wholesale when libwebp is absent so the suite stays green on
minimal containers.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.webp_codec import (
    decode_webp,
    encode_webp,
)


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", "webp",
                 ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPDecodeRGBA.restype = ctypes.c_void_p
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p)]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        return lib
    return None


_LIB = _load_libwebp()

pytestmark = pytest.mark.skipif(
    _LIB is None, reason="libwebp system library not present")


def _lib_decode_rgba(blob: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = _LIB.WebPDecodeRGBA(blob, len(blob),
                              ctypes.byref(w), ctypes.byref(h))
    assert ptr, "libwebp rejected the bitstream"
    try:
        arr = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8)),
            shape=(h.value, w.value, 4)).copy()
    finally:
        _LIB.WebPFree(ptr)
    return arr


def _lib_encode_lossless(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img)
    out = ctypes.c_void_p()
    n = _LIB.WebPEncodeLosslessRGBA(
        img.tobytes(), img.shape[1], img.shape[0], img.shape[1] * 4,
        ctypes.byref(out))
    assert n, "libwebp encoder failed"
    try:
        return ctypes.string_at(out, n)
    finally:
        _LIB.WebPFree(out)


def _rgba(img: np.ndarray) -> np.ndarray:
    """Lift our decoder's RGB/RGBA output to RGBA for comparison."""
    if img.shape[-1] == 4:
        return img
    out = np.empty(img.shape[:2] + (4,), np.uint8)
    out[..., :3] = img
    out[..., 3] = 255
    return out


def _images() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(20260819)
    imgs: dict[str, np.ndarray] = {}
    imgs["random_13x17"] = rng.integers(0, 256, (13, 17, 4), np.uint8)
    imgs["photoish_64x48"] = (
        np.cumsum(rng.integers(-3, 4, (48, 64, 4)), axis=1) % 256
    ).astype(np.uint8)
    yy, xx = np.mgrid[0:50, 0:70]
    grad = np.zeros((50, 70, 4), np.uint8)
    grad[..., 0] = xx * 255 // 69
    grad[..., 1] = yy * 255 // 49
    grad[..., 2] = (xx + yy) % 256
    imgs["gradient_70x50"] = grad
    pal = rng.integers(0, 256, (12, 4), np.uint8)
    pal[:, 3] = 255
    imgs["palette12_60x60"] = pal[rng.integers(0, 12, (60, 60))]
    imgs["alpha_varying_40x40"] = rng.integers(0, 256, (40, 40, 4),
                                               np.uint8)
    imgs["flat_32x32"] = np.full((32, 32, 4), (10, 200, 30, 255),
                                 np.uint8)
    for name, img in imgs.items():
        if name != "alpha_varying_40x40":
            img[..., 3] = 255
    return imgs


def _geometric_g(k: int) -> np.ndarray:
    """k green symbols at geometric frequencies → Huffman lengths
    1, 2, ..., k-1, k-1 (k >= 7 ⟹ a length-6 code: the CLC-order
    regression class)."""
    vals: list[int] = []
    for i in range(k):
        vals.extend([i] * (1 << (k - i)))
    side = int(np.ceil(np.sqrt(len(vals))))
    g = np.zeros(side * side, np.uint8)
    g[:len(vals)] = vals
    img = np.full((side, side, 4), 255, np.uint8)
    img[..., 0] = 1
    img[..., 1] = g.reshape(side, side)
    img[..., 2] = 2
    return img


class TestOursToLibwebp:
    @pytest.mark.parametrize("name", sorted(_images()))
    @pytest.mark.parametrize(
        "transform", [None, "subtract_green", "predictor", "color"])
    def test_encode_decodes_in_libwebp(self, name, transform):
        img = _images()[name]
        blob = encode_webp(img, transform=transform)
        out = _lib_decode_rgba(blob)
        assert (out == img).all()

    def test_palette_transform_decodes_in_libwebp(self):
        img = _images()["palette12_60x60"]
        out = _lib_decode_rgba(encode_webp(img, transform="palette"))
        assert (out == img).all()

    @pytest.mark.parametrize("k", [6, 7, 8, 10, 12])
    def test_code_length_order_regression(self, k):
        # k >= 7 produces a length-6 prefix code, whose CLC slot
        # (symbol 6, order index 9) is the first place the RFC order
        # and a DEFLATE-style order disagree.
        img = _geometric_g(k)
        out = _lib_decode_rgba(encode_webp(img))
        assert (out == img).all()

    def test_full_alphabet_code(self):
        img = np.full((16, 16, 4), 255, np.uint8)
        img[..., 1] = np.arange(256, dtype=np.uint8).reshape(16, 16)
        img[..., 0] = 0
        img[..., 2] = 0
        out = _lib_decode_rgba(encode_webp(img))
        assert (out == img).all()


class TestLibwebpToOurs:
    @pytest.mark.parametrize("name", sorted(_images()))
    def test_libwebp_stream_decodes(self, name):
        img = _images()[name]
        blob = _lib_encode_lossless(img)
        ours = _rgba(decode_webp(blob)[0])
        # Oracle is libwebp's own decode: its encoder may rewrite RGB
        # under alpha == 0 (non-exact mode), which is not a codec
        # disagreement.
        theirs = _lib_decode_rgba(blob)
        assert (ours == theirs).all()
        opaque = img[..., 3:4] != 0
        assert (np.where(opaque, ours, 0)
                == np.where(opaque, img, 0)).all()

    def test_meta_prefix_scale_stream(self):
        # Large low-entropy image: libwebp emits LZ77 + color cache +
        # (size-dependent) meta prefix groups — the decoder paths our
        # own encoder never exercises.
        rng = np.random.default_rng(5)
        img = (np.cumsum(rng.integers(-2, 3, (256, 320, 4)), axis=1)
               % 256).astype(np.uint8)
        img[..., 3] = 255
        blob = _lib_encode_lossless(img)
        ours = _rgba(decode_webp(blob)[0])
        assert (ours == _lib_decode_rgba(blob)).all()

    def test_roundtrip_through_both(self):
        # ours -> libwebp-decode -> libwebp-encode -> ours-decode
        img = _images()["photoish_64x48"]
        mid = _lib_decode_rgba(encode_webp(img))
        back = _rgba(decode_webp(_lib_encode_lossless(mid))[0])
        assert (back == img).all()
