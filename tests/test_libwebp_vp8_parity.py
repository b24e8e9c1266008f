"""Differential validation of the VP8 decoder against libwebp.

The system ``libwebp.so.7`` (test oracle only) encodes test images
through both its simple and advanced (``WebPConfig``) APIs, and every
stream must decode in ``vp8_codec`` to the EXACT Y/U/V planes libwebp
itself reconstructs — compared at the plane level so RGB policy
(upsampling filters, dithering) is out of the equation.  Coverage is
staged the way the decoder was built:

- ``bypass_filtering`` runs isolate reconstruction (boolean decoder,
  modes, tokens, dequant, IWHT/IDCT, intra prediction);
- default runs add the normal loop filter; ``filter_type=0`` streams
  add the simple filter; ``filter_sharpness`` exercises the
  interior-limit derivation; heterogeneous content triggers libwebp's
  segmentation (per-segment quantizers + coded segment map).

The reverse direction pins our encoder: libwebp must decode
``encode_vp8`` streams (including the multi-partition layouts its own
encoder never emits) to the same planes our decoder produces.

``test_tables_match_library`` re-extracts the RFC 6386 constant
tables from the library's read-only data and asserts our committed
copies are byte-identical — the provenance check for
``vp8_tables.py``.  Everything skips cleanly when libwebp is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.vp8_codec import (
    decode_vp8_planes,
    encode_vp8,
)


def _load():
    for name in ("libwebp.so.7", "libwebp.so",
                 ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


_LIB = _load()

pytestmark = pytest.mark.skipif(
    _LIB is None, reason="libwebp system library not present")


# ---- minimal decoder-config binding (YUV output, filter bypass) ----

class _Features(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int), ("height", ctypes.c_int),
                ("has_alpha", ctypes.c_int),
                ("has_animation", ctypes.c_int),
                ("format", ctypes.c_int), ("pad", ctypes.c_uint32 * 5)]


class _YUVA(ctypes.Structure):
    _fields_ = [("y", ctypes.POINTER(ctypes.c_uint8)),
                ("u", ctypes.POINTER(ctypes.c_uint8)),
                ("v", ctypes.POINTER(ctypes.c_uint8)),
                ("a", ctypes.POINTER(ctypes.c_uint8)),
                ("y_stride", ctypes.c_int), ("u_stride", ctypes.c_int),
                ("v_stride", ctypes.c_int), ("a_stride", ctypes.c_int),
                ("y_size", ctypes.c_size_t), ("u_size", ctypes.c_size_t),
                ("v_size", ctypes.c_size_t), ("a_size", ctypes.c_size_t)]


class _RGBA(ctypes.Structure):
    _fields_ = [("rgba", ctypes.POINTER(ctypes.c_uint8)),
                ("stride", ctypes.c_int), ("size", ctypes.c_size_t)]


class _BufU(ctypes.Union):
    _fields_ = [("RGBA", _RGBA), ("YUVA", _YUVA)]


class _DecBuffer(ctypes.Structure):
    _fields_ = [("colorspace", ctypes.c_int), ("width", ctypes.c_int),
                ("height", ctypes.c_int),
                ("is_external_memory", ctypes.c_int),
                ("u", _BufU), ("pad", ctypes.c_uint32 * 4),
                ("private_memory", ctypes.POINTER(ctypes.c_uint8))]


class _Options(ctypes.Structure):
    _fields_ = [("bypass_filtering", ctypes.c_int),
                ("no_fancy_upsampling", ctypes.c_int),
                ("use_cropping", ctypes.c_int),
                ("crop_left", ctypes.c_int), ("crop_top", ctypes.c_int),
                ("crop_width", ctypes.c_int),
                ("crop_height", ctypes.c_int),
                ("use_scaling", ctypes.c_int),
                ("scaled_width", ctypes.c_int),
                ("scaled_height", ctypes.c_int),
                ("use_threads", ctypes.c_int),
                ("dithering_strength", ctypes.c_int),
                ("flip", ctypes.c_int),
                ("alpha_dithering_strength", ctypes.c_int),
                ("pad", ctypes.c_uint32 * 5)]


class _DecConfig(ctypes.Structure):
    _fields_ = [("input", _Features), ("output", _DecBuffer),
                ("options", _Options)]


_DEC_ABI = 0x0209
_MODE_YUV = 11

if _LIB is not None:
    _LIB.WebPInitDecoderConfigInternal.argtypes = [
        ctypes.POINTER(_DecConfig), ctypes.c_int]
    _LIB.WebPDecode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                ctypes.POINTER(_DecConfig)]
    _LIB.WebPFreeDecBuffer.argtypes = [ctypes.POINTER(_DecBuffer)]
    _LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
    _LIB.WebPFree.argtypes = [ctypes.c_void_p]


def _lib_yuv(blob: bytes, bypass_filtering: bool = False):
    cfg = _DecConfig()
    assert _LIB.WebPInitDecoderConfigInternal(ctypes.byref(cfg),
                                              _DEC_ABI)
    cfg.options.bypass_filtering = int(bypass_filtering)
    cfg.output.colorspace = _MODE_YUV
    rc = _LIB.WebPDecode(blob, len(blob), ctypes.byref(cfg))
    assert rc == 0, f"libwebp WebPDecode status {rc}"
    w, h = cfg.output.width, cfg.output.height
    yb = cfg.output.u.YUVA

    def plane(ptr, stride, ph, pw):
        return np.ctypeslib.as_array(
            ptr, shape=(ph, stride))[:, :pw].copy()

    out = (plane(yb.y, yb.y_stride, h, w),
           plane(yb.u, yb.u_stride, (h + 1) // 2, (w + 1) // 2),
           plane(yb.v, yb.v_stride, (h + 1) // 2, (w + 1) // 2))
    _LIB.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return out


def _lib_encode(img: np.ndarray, quality: float) -> bytes:
    img = np.ascontiguousarray(img, np.uint8)
    out = ctypes.c_void_p()
    n = _LIB.WebPEncodeRGBA(img.tobytes(), img.shape[1],
                            img.shape[0], img.shape[1] * 4,
                            float(quality), ctypes.byref(out))
    assert n, "libwebp lossy encode failed"
    try:
        return ctypes.string_at(out, n)
    finally:
        _LIB.WebPFree(out)


# ---- advanced encoder binding (WebPConfig knobs) ----

class _EncConfig(ctypes.Structure):
    _fields_ = [("lossless", ctypes.c_int), ("quality", ctypes.c_float),
                ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
                ("target_size", ctypes.c_int),
                ("target_PSNR", ctypes.c_float),
                ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
                ("filter_strength", ctypes.c_int),
                ("filter_sharpness", ctypes.c_int),
                ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
                ("alpha_compression", ctypes.c_int),
                ("alpha_filtering", ctypes.c_int),
                ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
                ("show_compressed", ctypes.c_int),
                ("preprocessing", ctypes.c_int),
                ("partitions", ctypes.c_int),
                ("partition_limit", ctypes.c_int),
                ("emulate_jpeg_size", ctypes.c_int),
                ("thread_level", ctypes.c_int),
                ("low_memory", ctypes.c_int),
                ("near_lossless", ctypes.c_int), ("exact", ctypes.c_int),
                ("use_delta_palette", ctypes.c_int),
                ("use_sharp_yuv", ctypes.c_int),
                ("qmin", ctypes.c_int), ("qmax", ctypes.c_int)]


class _MemWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("max_size", ctypes.c_size_t), ("pad", ctypes.c_uint32)]


class _Picture(ctypes.Structure):
    _fields_ = [("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
                ("width", ctypes.c_int), ("height", ctypes.c_int),
                ("y", ctypes.c_void_p), ("u", ctypes.c_void_p),
                ("v", ctypes.c_void_p), ("y_stride", ctypes.c_int),
                ("uv_stride", ctypes.c_int), ("a", ctypes.c_void_p),
                ("a_stride", ctypes.c_int), ("pad1", ctypes.c_uint32 * 2),
                ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
                ("pad2", ctypes.c_uint32 * 3),
                ("writer", ctypes.c_void_p),
                ("custom_ptr", ctypes.c_void_p),
                ("extra_info_type", ctypes.c_int),
                ("extra_info", ctypes.c_void_p),
                ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
                ("progress_hook", ctypes.c_void_p),
                ("user_data", ctypes.c_void_p),
                ("pad3", ctypes.c_uint32 * 3),
                ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
                ("pad6", ctypes.c_uint32 * 8),
                ("memory_", ctypes.c_void_p),
                ("memory_argb_", ctypes.c_void_p),
                ("pad7", ctypes.c_void_p * 2)]


_ENC_ABI = 0x020F

if _LIB is not None:
    _LIB.WebPConfigInitInternal.argtypes = [
        ctypes.POINTER(_EncConfig), ctypes.c_int, ctypes.c_float,
        ctypes.c_int]
    _LIB.WebPPictureInitInternal.argtypes = [
        ctypes.POINTER(_Picture), ctypes.c_int]
    _LIB.WebPPictureImportRGBA.argtypes = [
        ctypes.POINTER(_Picture), ctypes.c_char_p, ctypes.c_int]
    _LIB.WebPEncode.argtypes = [ctypes.POINTER(_EncConfig),
                                ctypes.POINTER(_Picture)]
    _LIB.WebPMemoryWriterInit.argtypes = [ctypes.POINTER(_MemWriter)]
    _LIB.WebPMemoryWriterClear.argtypes = [ctypes.POINTER(_MemWriter)]
    _LIB.WebPPictureFree.argtypes = [ctypes.POINTER(_Picture)]


def _lib_encode_cfg(img: np.ndarray, quality: float, **knobs) -> bytes:
    img = np.ascontiguousarray(img, np.uint8)
    cfg = _EncConfig()
    assert _LIB.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                       float(quality), _ENC_ABI)
    for k, v in knobs.items():
        setattr(cfg, k, v)
    pic = _Picture()
    assert _LIB.WebPPictureInitInternal(ctypes.byref(pic), _ENC_ABI)
    pic.width, pic.height = img.shape[1], img.shape[0]
    assert _LIB.WebPPictureImportRGBA(ctypes.byref(pic), img.tobytes(),
                                      img.shape[1] * 4)
    wr = _MemWriter()
    _LIB.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(_LIB.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    ok = _LIB.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    _LIB.WebPPictureFree(ctypes.byref(pic))
    assert ok, f"WebPEncode failed err={pic.error_code}"
    try:
        return ctypes.string_at(wr.mem, wr.size)
    finally:
        _LIB.WebPMemoryWriterClear(ctypes.byref(wr))


def _vp8_payload(webp: bytes) -> bytes:
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(webp):
        tag = webp[pos:pos + 4]
        size = int.from_bytes(webp[pos + 4:pos + 8], "little")
        if tag == b"VP8 ":
            return webp[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _assert_planes_equal(ours, theirs):
    for name, a, b in zip("YUV", ours, theirs):
        assert a.shape == b.shape, name
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() == 0, (
            f"{name} plane differs: max {diff.max()} at "
            f"{np.unravel_index(diff.argmax(), diff.shape)}")


def _photo(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 4), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    for c in range(3):
        img[..., c] = np.clip(
            128 + 90 * np.sin(xx / (7 + 3 * c)) * np.cos(yy / (5 + 2 * c))
            + rng.normal(0, 2, (h, w)), 0, 255)
    img[..., 3] = 255
    return img


def _hetero(h: int, w: int) -> np.ndarray:
    """Flat + noise + sine quadrants — triggers libwebp segmentation."""
    rng = np.random.default_rng(11)
    img = np.full((h, w, 4), 120, np.uint8)
    img[:h // 2, w // 2:] = rng.integers(
        0, 256, (h - h // 2, w - w // 2, 4), dtype=np.uint8)
    yy, xx = np.mgrid[0:h - h // 2, 0:w // 2]
    img[h // 2:, :w // 2, 0] = (128 + 100 * np.sin(xx / 3.0)).astype(
        np.uint8)
    img[..., 3] = 255
    return img


class TestLibwebpToOurs:
    @pytest.mark.parametrize("quality", [10, 30, 75, 95])
    def test_default_encode_pixel_exact(self, quality):
        blob = _lib_encode(_photo(64, 80), quality)
        pay = _vp8_payload(blob)
        _assert_planes_equal(decode_vp8_planes(pay), _lib_yuv(blob))
        _assert_planes_equal(
            decode_vp8_planes(pay, loop_filter=False),
            _lib_yuv(blob, bypass_filtering=True))

    def test_odd_dimensions(self):
        blob = _lib_encode(_photo(33, 49, seed=9), 50)
        _assert_planes_equal(decode_vp8_planes(_vp8_payload(blob)),
                             _lib_yuv(blob))

    def test_noisy_content(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (48, 48, 4), dtype=np.uint8)
        img[..., 3] = 255
        blob = _lib_encode(img, 60)
        _assert_planes_equal(decode_vp8_planes(_vp8_payload(blob)),
                             _lib_yuv(blob))

    def test_segmentation_streams(self):
        for q in (20, 50, 80):
            blob = _lib_encode_cfg(_hetero(96, 128), q)
            _assert_planes_equal(
                decode_vp8_planes(_vp8_payload(blob)), _lib_yuv(blob))

    @pytest.mark.parametrize("knobs", [
        dict(filter_type=0, filter_strength=40, autofilter=0),
        dict(filter_sharpness=3, filter_strength=50),
        dict(filter_sharpness=7, filter_strength=63),
        dict(segments=1),
        dict(method=0),
        dict(method=6),
    ], ids=["simple-filter", "sharp3", "sharp7", "1seg", "m0", "m6"])
    def test_config_knobs(self, knobs):
        blob = _lib_encode_cfg(_photo(96, 128), 60.0, **knobs)
        _assert_planes_equal(decode_vp8_planes(_vp8_payload(blob)),
                             _lib_yuv(blob))

    def test_larger_image(self):
        blob = _lib_encode(_photo(160, 192, seed=5), 70)
        _assert_planes_equal(decode_vp8_planes(_vp8_payload(blob)),
                             _lib_yuv(blob))


class TestOursToLibwebp:
    @pytest.mark.parametrize("kwargs", [
        dict(quality=90),
        dict(quality=60, n_partitions=2),
        dict(quality=75, filter_level=20, n_partitions=4),
        dict(quality=75, filter_level=30, filter_simple=True,
             n_partitions=8),
    ], ids=["q90", "2parts", "4parts-lf", "8parts-simple"])
    def test_libwebp_decodes_our_streams_identically(self, kwargs):
        img = _photo(48, 64)[..., :3]
        frame = encode_vp8(img, **kwargs)
        webp = (b"RIFF"
                + (4 + 8 + len(frame) + (len(frame) & 1)).to_bytes(
                    4, "little")
                + b"WEBP" + b"VP8 "
                + len(frame).to_bytes(4, "little")
                + frame + b"\x00" * (len(frame) & 1))
        _assert_planes_equal(decode_vp8_planes(frame), _lib_yuv(webp))


def test_tables_match_library():
    """Re-extract the RFC 6386 tables from libwebp's rodata by the
    same structural signatures used to recover them, and pin our
    committed copies byte-identical (vp8_tables provenance check)."""
    from document_convert_to__markdown_spark.extractors import (
        vp8_tables as T,
    )
    path = None
    for cand in ("/usr/lib/x86_64-linux-gnu/libwebp.so.7",
                 "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"):
        try:
            with open(cand, "rb") as f:
                data = f.read()
            path = cand
            break
        except OSError:
            continue
    if path is None:
        pytest.skip("libwebp shared object not readable")
    # AC table: first nondecreasing uint16[128] starting 4,5 and
    # ending 284.
    u16 = np.frombuffer(data, np.uint16)
    ac_off = None
    for off in range(len(u16) - 128):
        seg = u16[off:off + 128]
        if (seg[0] == 4 and seg[1] == 5 and seg[-1] == 284
                and seg.max() <= 300
                and np.all(np.diff(seg.astype(np.int32)) >= 0)):
            ac_off = off * 2
            break
    assert ac_off is not None, "AC quant table not found in library"
    assert tuple(np.frombuffer(
        data[ac_off:ac_off + 256], np.uint16).tolist()) == T.AC_QUANT
    # layout: AC(256B) | DC(128B uint8) | pad | kBands | pad |
    # update probs(1056) | kf bmode probs(900) | pad | coeff probs
    dc_off = ac_off + 256
    assert tuple(data[dc_off:dc_off + 128]) == T.DC_QUANT
    bands = bytes((0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7))
    bands_off = data.find(bands, ac_off)
    assert bands_off > 0
    upd_off = bands_off + 32
    assert tuple(data[upd_off:upd_off + 1056]) == T.COEFF_UPDATE_PROBS
    bmode_off = upd_off + 1056
    assert tuple(data[bmode_off:bmode_off + 900]) == T.KF_BMODE_PROBS
    coeff_off = data.find(
        bytes(T.COEFF_PROBS[:33]), bmode_off)
    assert coeff_off > 0
    assert tuple(data[coeff_off:coeff_off + 1056]) == T.COEFF_PROBS


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (tag + len(data).to_bytes(4, "little") + data
            + (b"\x00" if len(data) & 1 else b""))


def _alpha_container(frame: bytes, alph: bytes, w: int,
                     h: int) -> bytes:
    vp8x = _chunk(b"VP8X", bytes([0x10, 0, 0, 0])
                  + (w - 1).to_bytes(4, "little")[:3]
                  + (h - 1).to_bytes(4, "little")[:3])
    body = vp8x + _chunk(b"ALPH", alph) + _chunk(b"VP8 ", frame)
    return (b"RIFF" + (4 + len(body)).to_bytes(4, "little")
            + b"WEBP" + body)


def _lib_rgba(blob: bytes) -> np.ndarray:
    _LIB.WebPDecodeRGBA.restype = ctypes.c_void_p
    _LIB.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w),
                            ctypes.byref(h))
    assert p, "libwebp rejected the container"
    try:
        return np.ctypeslib.as_array(
            ctypes.cast(p, ctypes.POINTER(ctypes.c_uint8)),
            shape=(h.value, w.value, 4)).copy()
    finally:
        _LIB.WebPFree(p)


class TestAlphaPlane:
    """ALPH chunk (lossy WebP with transparency): the alpha channel
    is lossless at default settings, so it compares EXACTLY."""

    @pytest.mark.parametrize("knobs", [
        {}, dict(alpha_filtering=2), dict(alpha_compression=0),
    ], ids=["default", "best-filter", "raw"])
    def test_libwebp_alpha_streams(self, knobs):
        from document_convert_to__markdown_spark.extractors import (
            webp_codec,
        )
        rng = np.random.default_rng(5)
        yy, xx = np.mgrid[0:40, 0:56]
        for alpha in (rng.integers(0, 256, (40, 56), dtype=np.uint8),
                      (xx * 255 // 55).astype(np.uint8),
                      np.where((xx // 8 + yy // 8) % 2 == 0, 255,
                               40).astype(np.uint8)):
            img = np.dstack(
                [rng.integers(0, 256, (40, 56, 3), dtype=np.uint8),
                 alpha])
            blob = _lib_encode_cfg(img, 75.0, **knobs)
            dec, mode = webp_codec.decode_webp(blob)
            assert mode == "RGBA"
            assert (dec[..., 3] == _lib_rgba(blob)[..., 3]).all()

    @pytest.mark.parametrize("filt", [1, 2, 3],
                             ids=["horizontal", "vertical", "gradient"])
    def test_crafted_alpha_filters(self, filt):
        # libwebp 1.2.4's encoder only ever emits filters 0/1, so
        # vertical and gradient are pinned with hand-filtered raw
        # planes, libwebp decoding them as the oracle.
        from document_convert_to__markdown_spark.extractors import (
            webp_codec,
        )
        rng = np.random.default_rng(8)
        h, w = 24, 33
        frame = encode_vp8(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
            quality=85)
        yy, xx = np.mgrid[0:h, 0:w]
        alpha = ((yy * 255 // (h - 1)).astype(np.uint8)
                 ^ (xx * 3).astype(np.uint8))
        res = np.zeros((h, w), np.int32)
        a32 = alpha.astype(np.int32)
        for y in range(h):
            for x in range(w):
                if y == 0 and x == 0:
                    pred = 0
                elif y == 0:
                    pred = a32[0, x - 1]
                elif x == 0:
                    pred = a32[y - 1, 0]
                elif filt == 1:
                    pred = a32[y, x - 1]
                elif filt == 2:
                    pred = a32[y - 1, x]
                else:
                    pred = min(255, max(0, int(a32[y, x - 1])
                                        + int(a32[y - 1, x])
                                        - int(a32[y - 1, x - 1])))
                res[y, x] = (a32[y, x] - pred) & 0xFF
        alph = bytes([filt << 2]) + res.astype(np.uint8).tobytes()
        blob = _alpha_container(frame, alph, w, h)
        dec, mode = webp_codec.decode_webp(blob)
        assert mode == "RGBA"
        assert (dec[..., 3] == alpha).all()
        assert (dec[..., 3] == _lib_rgba(blob)[..., 3]).all()
