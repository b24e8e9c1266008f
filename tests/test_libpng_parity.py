"""Cross-validation of the from-scratch PNG codec against libpng16.

Uses the container's system ``libpng16.so.16`` (simplified ``png_image``
API) strictly as an independent *test oracle* — the runtime codec stays
pure Python + numpy.  Two directions:

- ``encode_png`` output (gray 1/2/4/8, LA, RGB, RGBA; sequential and
  Adam7 interlaced) must decode in libpng to the exact 8-bit RGBA
  expansion of the source samples (sub-8-bit grays use PNG's
  bit-replication scaling, which both decoders implement);
- libpng-written PNGs (``png_image_write_to_memory``) must decode
  pixel-exactly in ``decode_png``.

16-bit PNGs are excluded from the libpng direction by design: the
simplified API treats 16-bit data as linear light and gamma-encodes on
8-bit output, which is a colorimetric policy, not a codec comparison
(16-bit decode stays covered by the codec's internal exact
round-trips).  Skipped wholesale when libpng is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.png_codec import (
    decode_png,
    encode_png,
)

PNG_IMAGE_VERSION = 1
PNG_FORMAT_GRAY = 0
PNG_FORMAT_GA = 1
PNG_FORMAT_RGB = 2
PNG_FORMAT_RGBA = 3


class _PngImage(ctypes.Structure):
    # libpng 1.6 simplified-API control block (png.h: png_image).
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def _load_libpng():
    for name in ("libpng16.so.16", "libpng16.so", "libpng.so",
                 ctypes.util.find_library("png16"),
                 ctypes.util.find_library("png")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.png_image_begin_read_from_memory.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_char_p,
                ctypes.c_size_t]
            lib.png_image_finish_read.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
            lib.png_image_write_to_memory.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
            lib.png_image_free.argtypes = [ctypes.POINTER(_PngImage)]
        except AttributeError:
            continue
        return lib
    return None


_LIB = _load_libpng()

pytestmark = pytest.mark.skipif(
    _LIB is None, reason="libpng16 system library not present")


def _libpng_read_rgba(blob: bytes) -> np.ndarray:
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    assert _LIB.png_image_begin_read_from_memory(
        ctypes.byref(img), blob, len(blob)), img.message
    img.format = PNG_FORMAT_RGBA
    buf = np.empty((img.height, img.width, 4), np.uint8)
    ok = _LIB.png_image_finish_read(
        ctypes.byref(img), None,
        buf.ctypes.data_as(ctypes.c_void_p), 0, None)
    _LIB.png_image_free(ctypes.byref(img))
    assert ok, img.message
    return buf


def _libpng_write(pixels: np.ndarray, fmt: int) -> bytes:
    pixels = np.ascontiguousarray(pixels, np.uint8)
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    img.height, img.width = pixels.shape[0], pixels.shape[1]
    img.format = fmt
    size = ctypes.c_size_t(0)
    assert _LIB.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0,
        pixels.ctypes.data_as(ctypes.c_void_p), 0, None), img.message
    out = ctypes.create_string_buffer(size.value)
    assert _LIB.png_image_write_to_memory(
        ctypes.byref(img), out, ctypes.byref(size), 0,
        pixels.ctypes.data_as(ctypes.c_void_p), 0, None), img.message
    return out.raw[:size.value]


def _to_rgba(arr: np.ndarray) -> np.ndarray:
    """8-bit RGBA expansion of a decoded L / LA / RGB / RGBA array."""
    if arr.ndim == 2:
        arr = arr[..., None]
    ch = arr.shape[-1]
    out = np.empty(arr.shape[:2] + (4,), np.uint8)
    if ch == 1:
        out[..., :3] = arr
        out[..., 3] = 255
    elif ch == 2:
        out[..., :3] = arr[..., :1]
        out[..., 3] = arr[..., 1]
    elif ch == 3:
        out[..., :3] = arr
        out[..., 3] = 255
    else:
        out[:] = arr
    return out


_RNG = np.random.default_rng(20260819)
_GRAY = _RNG.integers(0, 256, (21, 13), np.uint8)
_LA = _RNG.integers(0, 256, (9, 31, 2), np.uint8)
_RGB = _RNG.integers(0, 256, (17, 17, 3), np.uint8)
_RGBA = _RNG.integers(0, 256, (8, 40, 4), np.uint8)


class TestOursToLibpng:
    @pytest.mark.parametrize("interlace", [False, True],
                             ids=["seq", "adam7"])
    @pytest.mark.parametrize("name,src", [
        ("gray", _GRAY), ("la", _LA), ("rgb", _RGB), ("rgba", _RGBA)])
    def test_libpng_reads_our_encodes(self, name, src, interlace):
        blob = encode_png(src, interlace=interlace)
        assert (_libpng_read_rgba(blob) == _to_rgba(src)).all()

    @pytest.mark.parametrize("depth", [1, 2, 4])
    @pytest.mark.parametrize("interlace", [False, True],
                             ids=["seq", "adam7"])
    def test_sub8_gray_scaling_matches(self, depth, interlace):
        src = (_GRAY >> (8 - depth)).astype(np.uint8)
        blob = encode_png(src, depth=depth, interlace=interlace)
        # PNG bit-replication scaling: v * 255 // (2**depth - 1)
        expect = (src.astype(np.uint16) * 255
                  // ((1 << depth) - 1)).astype(np.uint8)
        assert (_libpng_read_rgba(blob) == _to_rgba(expect)).all()

    def test_both_decoders_agree_on_same_stream(self):
        for src, interlace in [(_RGBA, False), (_RGBA, True),
                               (_GRAY, True), (_LA, False)]:
            blob = encode_png(src, interlace=interlace)
            ours = _to_rgba(decode_png(blob)[0])
            assert (ours == _libpng_read_rgba(blob)).all()


class TestLibpngToOurs:
    @pytest.mark.parametrize("fmt,src", [
        (PNG_FORMAT_GRAY, _GRAY),
        (PNG_FORMAT_GA, _LA),
        (PNG_FORMAT_RGB, _RGB),
        (PNG_FORMAT_RGBA, _RGBA),
    ], ids=["gray", "ga", "rgb", "rgba"])
    def test_our_decoder_reads_libpng_writes(self, fmt, src):
        blob = _libpng_write(src, fmt)
        dec, _mode = decode_png(blob)
        assert (_to_rgba(dec) == _to_rgba(src)).all()

    def test_large_stream(self):
        rng = np.random.default_rng(5)
        big = (np.cumsum(rng.integers(-2, 3, (200, 300, 4)), axis=1)
               % 256).astype(np.uint8)
        blob = _libpng_write(big, PNG_FORMAT_RGBA)
        dec, _mode = decode_png(blob)
        assert (_to_rgba(dec) == big).all()
