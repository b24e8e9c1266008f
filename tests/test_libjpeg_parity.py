"""Cross-validation of the JPEG codec against the system libjpeg.

libjpeg's C API is not ctypes-friendly (setjmp error handling, large
version-checked structs), so a ~80-line shim is compiled once per test
session with the system gcc against ``/usr/include/jpeglib.h`` and
loaded via ctypes — strictly a *test oracle*; the runtime codec stays
pure Python + numpy.  Skipped wholesale when gcc, jpeglib.h, or
libjpeg are absent.

Unlike the lossless parities (PNG/GIF/TIFF/VP8L, which pin exact
equality), JPEG decoders are allowed to differ: ITU-T T.81 Annex A
only bounds IDCT accuracy, so two conforming decoders can disagree by
a couple of levels per sample.  The contract pinned here:

- our decode of any stream (ours or libjpeg's, baseline or
  progressive, 4:4:4 / 4:2:2 / 4:2:0) must stay within a small
  per-sample tolerance of libjpeg's decode of the same stream, with a
  much tighter mean — systematic errors (wrong dequant, wrong
  predictor, swapped chroma) blow the mean long before the max;
- libjpeg must parse and decode our encoder's output at all (stream
  well-formedness).

The shim disables fancy upsampling to match our pixel-replication
chroma upsampling, so the comparison isolates the entropy + IDCT
pipeline rather than resampling policy.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)

_SHIM_C = r"""
#include <stddef.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

struct jshim_err {
  struct jpeg_error_mgr pub;
  jmp_buf env;
};

static void jshim_error_exit(j_common_ptr cinfo) {
  struct jshim_err *err = (struct jshim_err *)cinfo->err;
  longjmp(err->env, 1);
}

/* Decode to RGB; caller provides out buffer of cap bytes.
   Returns 0 on success, -1 on decode error, -2 if cap too small. */
int jshim_decode(const unsigned char *buf, unsigned long n,
                 unsigned char *out, long cap, int *w, int *h) {
  struct jpeg_decompress_struct cinfo;
  struct jshim_err jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jshim_error_exit;
  if (setjmp(jerr.env)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.do_fancy_upsampling = FALSE;
  jpeg_start_decompress(&cinfo);
  *w = (int)cinfo.output_width;
  *h = (int)cinfo.output_height;
  long need = (long)cinfo.output_width * cinfo.output_height * 3;
  if (need > cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char *row = out +
        (size_t)cinfo.output_scanline * cinfo.output_width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

/* Encode RGB to JPEG; returns malloc'd buffer via *out. */
int jshim_encode(const unsigned char *rgb, int w, int h, int quality,
                 int progressive, unsigned char **out,
                 unsigned long *outn) {
  struct jpeg_compress_struct cinfo;
  struct jshim_err jerr;
  *out = NULL;
  *outn = 0;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jshim_error_exit;
  if (setjmp(jerr.env)) {
    jpeg_destroy_compress(&cinfo);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, out, outn);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  if (progressive) jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    const unsigned char *row = rgb +
        (size_t)cinfo.next_scanline * w * 3;
    jpeg_write_scanlines(&cinfo, (JSAMPARRAY)&row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  return 0;
}

void jshim_free(unsigned char *p) { free(p); }
"""


def _build_shim():
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None or not os.path.exists("/usr/include/jpeglib.h"):
        return None
    tmpdir = tempfile.mkdtemp(prefix="jshim_")
    src = os.path.join(tmpdir, "jshim.c")
    so = os.path.join(tmpdir, "jshim.so")
    with open(src, "w") as f:
        f.write(_SHIM_C)
    r = subprocess.run(
        [gcc, "-O2", "-shared", "-fPIC", src, "-o", so, "-ljpeg"],
        capture_output=True)
    if r.returncode != 0:
        return None
    lib = ctypes.CDLL(so)
    lib.jshim_decode.restype = ctypes.c_int
    lib.jshim_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong, ctypes.c_void_p,
        ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.jshim_encode.restype = ctypes.c_int
    lib.jshim_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_ulong)]
    lib.jshim_free.argtypes = [ctypes.c_void_p]
    return lib


_LIB = _build_shim()

pytestmark = pytest.mark.skipif(
    _LIB is None, reason="gcc/jpeglib.h/libjpeg not available")

# Max per-sample decoder divergence (levels) on smooth (photo-like)
# content: covers IDCT variance (float reference vs libjpeg ISLOW
# integer) plus the one-level rounding cascade through chroma
# conversion — measured max is 2 across qualities/modes.  The mean
# bound is the real tripwire: systematic decode errors (wrong
# dequant, swapped chroma, shifted upsampling) move it by tens of
# levels.  High-frequency content gets a separate looser max bound
# because libjpeg's range-limit table *wraps* wildly out-of-range
# IDCT samples instead of clamping them (a documented libjpeg speed
# trick), which is a policy difference, not a conformance bug.
_MAX_DIFF = 3
_MEAN_DIFF = 0.6
_MAX_DIFF_NOISY = 32


def _lib_decode(blob: bytes) -> np.ndarray:
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    cap = 64 * 1024 * 1024
    out = np.empty(cap, np.uint8)
    rc = _LIB.jshim_decode(blob, len(blob),
                           out.ctypes.data_as(ctypes.c_void_p), cap,
                           ctypes.byref(w), ctypes.byref(h))
    assert rc == 0, f"libjpeg decode failed rc={rc}"
    return out[:h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def _lib_encode(rgb: np.ndarray, quality: int,
                progressive: bool = False) -> bytes:
    rgb = np.ascontiguousarray(rgb, np.uint8)
    out = ctypes.c_void_p()
    n = ctypes.c_ulong(0)
    rc = _LIB.jshim_encode(rgb.tobytes(), rgb.shape[1], rgb.shape[0],
                           quality, int(progressive),
                           ctypes.byref(out), ctypes.byref(n))
    assert rc == 0, "libjpeg encode failed"
    try:
        return ctypes.string_at(out, n.value)
    finally:
        _LIB.jshim_free(out)


def _gray3(dec: np.ndarray) -> np.ndarray:
    if dec.ndim == 2:
        return np.repeat(dec[..., None], 3, axis=-1)
    return dec


def _assert_close(ours: np.ndarray, theirs: np.ndarray) -> None:
    assert ours.shape == theirs.shape
    diff = np.abs(ours.astype(np.int16) - theirs.astype(np.int16))
    assert diff.max() <= _MAX_DIFF, (
        f"max diff {diff.max()} at {np.unravel_index(diff.argmax(), diff.shape)}")
    assert diff.mean() <= _MEAN_DIFF, f"mean diff {diff.mean():.3f}"


def _photo(h: int, w: int) -> np.ndarray:
    """Smooth photo-like content (JPEG's design regime)."""
    rng = np.random.default_rng(20260819)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        img[..., c] = (128
                       + 90 * np.sin(xx / (7 + 3 * c))
                       * np.cos(yy / (5 + 2 * c))
                       + 20 * np.sin((xx + yy) / (11 + c)))
    img += rng.normal(0, 2, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _noisy(h: int, w: int) -> np.ndarray:
    """High-frequency content: exercises extreme coefficients where
    conforming decoders legitimately diverge most."""
    rng = np.random.default_rng(20260819)
    return (np.cumsum(rng.integers(-4, 5, (h, w, 3)), axis=1)
            % 256).astype(np.uint8)


class TestOursToLibjpeg:
    @pytest.mark.parametrize("subsampling", ["444", "420"])
    @pytest.mark.parametrize("quality", [60, 90])
    def test_libjpeg_reads_our_baseline(self, subsampling, quality):
        img = _photo(41, 57)
        blob = encode_jpeg(img, quality=quality,
                           subsampling=subsampling)
        theirs = _lib_decode(blob)
        ours = _gray3(decode_jpeg(blob)[0])
        _assert_close(ours, theirs)

    def test_libjpeg_reads_our_progressive(self):
        img = _photo(33, 49)
        blob = encode_jpeg_progressive(img, quality=80)
        theirs = _lib_decode(blob)
        ours = _gray3(decode_jpeg(blob)[0])
        _assert_close(ours, theirs)


class TestLibjpegToOurs:
    @pytest.mark.parametrize("quality", [50, 75, 92])
    @pytest.mark.parametrize("progressive", [False, True],
                             ids=["baseline", "progressive"])
    def test_our_decoder_tracks_libjpeg(self, quality, progressive):
        img = _photo(48, 64)
        blob = _lib_encode(img, quality, progressive)
        ours = _gray3(decode_jpeg(blob)[0])
        theirs = _lib_decode(blob)
        _assert_close(ours, theirs)

    def test_odd_dimensions(self):
        # Non-multiple-of-MCU dims exercise edge-block replication.
        img = _photo(37, 51)
        blob = _lib_encode(img, 85, False)
        _assert_close(_gray3(decode_jpeg(blob)[0]), _lib_decode(blob))

    def test_noisy_content_stays_bounded(self):
        # Extreme coefficients: allow libjpeg's range-limit wrapping
        # headroom on the max, keep the systematic-error mean tight.
        img = _noisy(48, 64)
        blob = _lib_encode(img, 75, False)
        ours = _gray3(decode_jpeg(blob)[0]).astype(np.int16)
        theirs = _lib_decode(blob).astype(np.int16)
        diff = np.abs(ours - theirs)
        assert diff.max() <= _MAX_DIFF_NOISY, diff.max()
        assert diff.mean() <= _MEAN_DIFF, diff.mean()
