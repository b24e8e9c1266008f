"""Cross-validation of the TIFF and GIF codecs against system libs.

Uses the container's ``libtiff.so.6`` and ``libgif.so.7`` strictly as
independent *test oracles* — the runtime codecs stay pure
Python + numpy.  Every ``encode_tiff`` / ``encode_gif`` variant is
decoded by BOTH our decoder and the system library, and both must
produce the exact source pixels: one pass validates the writer's
bitstream against an independent reader and the two decoders against
each other (the evidence class that caught the VP8L
kCodeLengthCodeOrder bug — shared-constant errors are invisible to
round-trip tests).

Each oracle binds through ctypes: libtiff via a temp file +
``TIFFReadRGBAImageOriented`` (top-left, RGBA byte order), giflib via
``DGifOpenFileName`` + ``DGifSlurp`` (which de-interlaces) +
``DGifSavedExtensionToGCB`` for the transparent index.  Skipped
per-library when absent.
"""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.gif_codec import (
    decode_gif,
    encode_gif,
)
from document_convert_to__markdown_spark.extractors.tiff_codec import (
    decode_tiff,
    encode_tiff,
)


# ------------------------------------------------------------- libtiff

def _load_libtiff():
    try:
        lib = ctypes.CDLL("libtiff.so.6")
    except OSError:
        try:
            lib = ctypes.CDLL("libtiff.so.5")
        except OSError:
            return None
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
    lib.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    # Silence warnings (e.g. about unknown tags) during tests.
    handler = ctypes.CFUNCTYPE(None)
    lib.TIFFSetWarningHandler.restype = ctypes.c_void_p
    lib.TIFFSetWarningHandler(None)
    return lib


def _load_libgif():
    try:
        return ctypes.CDLL("libgif.so.7")
    except OSError:
        return None


_TIFF = _load_libtiff()
_GIF = _load_libgif()

_TAG_WIDTH, _TAG_LENGTH = 256, 257
_ORIENTATION_TOPLEFT = 1


def _libtiff_read_rgba(blob: bytes) -> np.ndarray:
    fd, path = tempfile.mkstemp(suffix=".tif")
    try:
        os.write(fd, blob)
        os.close(fd)
        tif = _TIFF.TIFFOpen(path.encode(), b"r")
        assert tif, "libtiff rejected the file"
        try:
            w = ctypes.c_uint32(0)
            h = ctypes.c_uint32(0)
            _TIFF.TIFFGetField(ctypes.c_void_p(tif),
                               ctypes.c_uint32(_TAG_WIDTH),
                               ctypes.byref(w))
            _TIFF.TIFFGetField(ctypes.c_void_p(tif),
                               ctypes.c_uint32(_TAG_LENGTH),
                               ctypes.byref(h))
            raster = np.empty(h.value * w.value, np.uint32)
            ok = _TIFF.TIFFReadRGBAImageOriented(
                tif, w.value, h.value,
                raster.ctypes.data_as(ctypes.c_void_p),
                _ORIENTATION_TOPLEFT, 0)
            assert ok, "TIFFReadRGBAImage failed"
        finally:
            _TIFF.TIFFClose(tif)
        # Packed ABGR words == R,G,B,A byte order on little-endian.
        return raster.view(np.uint8).reshape(h.value, w.value, 4)
    finally:
        os.unlink(path)


# -------------------------------------------------------------- giflib

class _ColorMapObject(ctypes.Structure):
    _fields_ = [("ColorCount", ctypes.c_int),
                ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_bool),
                ("Colors", ctypes.c_void_p)]


class _GifImageDesc(ctypes.Structure):
    _fields_ = [("Left", ctypes.c_int), ("Top", ctypes.c_int),
                ("Width", ctypes.c_int), ("Height", ctypes.c_int),
                ("Interlace", ctypes.c_bool),
                ("ColorMap", ctypes.POINTER(_ColorMapObject))]


class _SavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", _GifImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p)]


class _GifFileType(ctypes.Structure):
    _fields_ = [("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
                ("SColorResolution", ctypes.c_int),
                ("SBackGroundColor", ctypes.c_int),
                ("AspectByte", ctypes.c_ubyte),
                ("SColorMap", ctypes.POINTER(_ColorMapObject)),
                ("ImageCount", ctypes.c_int),
                ("Image", _GifImageDesc),
                ("SavedImages", ctypes.POINTER(_SavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p),
                ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p),
                ("Private", ctypes.c_void_p)]


class _GCB(ctypes.Structure):
    _fields_ = [("DisposalMode", ctypes.c_int),
                ("UserInputFlag", ctypes.c_bool),
                ("DelayTime", ctypes.c_int),
                ("TransparentColor", ctypes.c_int)]


def _libgif_read_rgba(blob: bytes) -> np.ndarray:
    fd, path = tempfile.mkstemp(suffix=".gif")
    try:
        os.write(fd, blob)
        os.close(fd)
        err = ctypes.c_int(0)
        _GIF.DGifOpenFileName.restype = ctypes.POINTER(_GifFileType)
        gif = _GIF.DGifOpenFileName(path.encode(), ctypes.byref(err))
        assert gif, f"giflib open error {err.value}"
        try:
            assert _GIF.DGifSlurp(gif) == 1, "DGifSlurp failed"
            g = gif.contents
            assert g.ImageCount >= 1
            img = g.SavedImages[0]
            desc = img.ImageDesc
            cmap = desc.ColorMap if desc.ColorMap else g.SColorMap
            assert cmap, "no color table"
            n = cmap.contents.ColorCount
            colors = np.ctypeslib.as_array(
                ctypes.cast(cmap.contents.Colors,
                            ctypes.POINTER(ctypes.c_ubyte)),
                shape=(n, 3)).copy()
            idx = np.ctypeslib.as_array(
                img.RasterBits,
                shape=(desc.Height, desc.Width)).copy()
            gcb = _GCB()
            has_gcb = _GIF.DGifSavedExtensionToGCB(
                gif, 0, ctypes.byref(gcb)) == 1
            out = np.empty((desc.Height, desc.Width, 4), np.uint8)
            out[..., :3] = colors[idx]
            out[..., 3] = 255
            if has_gcb and gcb.TransparentColor >= 0:
                out[idx == gcb.TransparentColor, 3] = 0
        finally:
            _GIF.DGifCloseFile(gif, ctypes.byref(err))
        return out
    finally:
        os.unlink(path)


def _to_rgba(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 2:
        arr = arr[..., None]
    ch = arr.shape[-1]
    out = np.empty(arr.shape[:2] + (4,), np.uint8)
    if ch == 1:
        out[..., :3] = arr
        out[..., 3] = 255
    elif ch == 3:
        out[..., :3] = arr
        out[..., 3] = 255
    else:
        out[:] = arr
    return out


_RNG = np.random.default_rng(20260819)
_GRAY = _RNG.integers(0, 256, (19, 23), np.uint8)
_RGB = (np.cumsum(_RNG.integers(-9, 10, (21, 17, 3)), axis=1)
        % 256).astype(np.uint8)


@pytest.mark.skipif(_TIFF is None, reason="libtiff not present")
class TestTiffParity:
    @pytest.mark.parametrize("compression,predictor", [
        ("none", False), ("lzw", False), ("lzw", True),
        ("deflate", False), ("deflate", True), ("packbits", False)])
    @pytest.mark.parametrize("name,src", [("gray", _GRAY),
                                          ("rgb", _RGB)])
    def test_both_decoders_exact(self, name, src, compression,
                                 predictor):
        blob = encode_tiff(src, compression=compression,
                           predictor=predictor)
        ours = _to_rgba(decode_tiff(blob)[0])
        libs = _libtiff_read_rgba(blob)
        expect = _to_rgba(src)
        assert (ours == expect).all()
        assert (libs == expect).all()


@pytest.mark.skipif(_GIF is None, reason="giflib not present")
class TestGifParity:
    @pytest.mark.parametrize("interlace", [False, True],
                             ids=["seq", "interlaced"])
    @pytest.mark.parametrize("transparent", [None, 3],
                             ids=["opaque", "transp3"])
    def test_both_decoders_exact(self, interlace, transparent):
        pal = _RNG.integers(0, 256, (16, 3), np.uint8)
        idx = _RNG.integers(0, 16, (25, 33), np.uint8)
        blob = encode_gif(idx, pal, interlace=interlace,
                          transparent=transparent)
        expect = np.empty((25, 33, 4), np.uint8)
        expect[..., :3] = pal[idx]
        expect[..., 3] = 255
        if transparent is not None:
            expect[idx == transparent, 3] = 0
        ours = _to_rgba(decode_gif(blob)[0])
        libs = _libgif_read_rgba(blob)
        assert (ours == expect).all()
        assert (libs == expect).all()

    def test_tiny_palette_and_full_palette(self):
        for n in (2, 256):
            pal = _RNG.integers(0, 256, (n, 3), np.uint8)
            idx = _RNG.integers(0, n, (9, 11), np.uint8)
            blob = encode_gif(idx, pal)
            expect = np.empty((9, 11, 4), np.uint8)
            expect[..., :3] = pal[idx]
            expect[..., 3] = 255
            assert (_to_rgba(decode_gif(blob)[0]) == expect).all()
            assert (_libgif_read_rgba(blob) == expect).all()


# ------------------------------------------------ JPEG-in-TIFF parity

_TIFFTAG = {"width": 256, "length": 257, "bits": 258, "compression": 259,
            "photometric": 262, "samples": 277, "rows_per_strip": 278,
            "planar": 284, "ycbcrsubsampling": 530,
            "jpegquality": 65537, "jpegcolormode": 65538}
_COMPRESSION_JPEG = 7
_PHOTOMETRIC_YCBCR = 6
_JPEGCOLORMODE_RGB = 1

# photo-like smooth field: JPEG parity bounds assume no synthetic
# hard edges (same convention as tests/test_libjpeg_parity.py) — a
# sinusoidal surface, wrap-free so no % seam rings the DCT
_SY, _SX = np.mgrid[0:48, 0:41]
_SMOOTH = np.stack([
    128 + 90 * np.sin(_SX / 6.0) * np.cos(_SY / 7.0),
    128 + 90 * np.sin((_SX + _SY) / 9.0),
    128 + 90 * np.cos(_SX / 5.0 - _SY / 8.0)],
    axis=-1).round().astype(np.uint8)


def _libtiff_has_jpeg() -> bool:
    try:
        _libtiff_read_rgba(encode_tiff(
            _SMOOTH[:8, :8], compression="jpeg"))
        return True
    except AssertionError:
        return False


@pytest.mark.skipif(_TIFF is None, reason="libtiff not present")
class TestTiffJpegParity:
    @pytest.mark.parametrize("kw", [
        dict(), dict(rows_per_strip=16),
        dict(rows_per_strip=16, jpeg_tables=True)],
        ids=["onestrip", "strips", "strips+tables"])
    def test_libtiff_reads_our_jpeg_tiff(self, kw):
        if not _libtiff_has_jpeg():
            pytest.skip("libtiff built without jpeg")
        blob = encode_tiff(_SMOOTH, compression="jpeg", quality=95,
                           **kw)
        ours = decode_tiff(blob)[0]
        libs = _libtiff_read_rgba(blob)[:, :, :3]
        # two conforming T.81 decoders of the same stream: the same
        # ±2-level / ≤0.6-mean bound test_libjpeg_parity.py pins
        diff = np.abs(ours.astype(int) - libs.astype(int))
        assert diff.max() <= 2 and diff.mean() <= 0.6

    def test_our_decoder_reads_libtiff_authored_jpeg_tiff(self):
        """libtiff WRITES the file (its own strip layout, JPEGTables
        mode, libjpeg 4:2:0 entropy streams) — the independent-writer
        direction our own encoder can't provide."""
        if not _libtiff_has_jpeg():
            pytest.skip("libtiff built without jpeg")
        src = _SMOOTH
        h, w = src.shape[:2]
        fd, path = tempfile.mkstemp(suffix=".tif")
        os.close(fd)
        try:
            tif = _TIFF.TIFFOpen(path.encode(), b"w")
            assert tif, "libtiff TIFFOpen(w) failed"
            # TIFFSetField is variadic; integer varargs bind fine
            setf = _TIFF.TIFFSetField
            setf.restype = ctypes.c_int
            tifp = ctypes.c_void_p(tif)
            for tag, val in [("width", w), ("length", h),
                             ("bits", 8), ("samples", 3),
                             ("rows_per_strip", 16), ("planar", 1),
                             ("compression", _COMPRESSION_JPEG),
                             ("photometric", _PHOTOMETRIC_YCBCR),
                             ("jpegcolormode", _JPEGCOLORMODE_RGB),
                             ("jpegquality", 95)]:
                ok = setf(tifp, ctypes.c_uint32(_TIFFTAG[tag]),
                          ctypes.c_int(val))
                if not ok:
                    pytest.skip(f"libtiff refused tag {tag}")
            # 4:4:4 — libjpeg's default fancy upsampling and our
            # pixel replication diverge on subsampled chroma (the
            # known filter-choice gap test_libjpeg_parity.py
            # documents), so keep chroma full-res here
            ok = setf(tifp, ctypes.c_uint32(
                _TIFFTAG["ycbcrsubsampling"]),
                ctypes.c_int(1), ctypes.c_int(1))
            if not ok:
                pytest.skip("libtiff refused ycbcrsubsampling")
            _TIFF.TIFFWriteScanline.restype = ctypes.c_int
            row = np.empty((w, 3), np.uint8)
            for y in range(h):
                row[:] = src[y]
                ok = _TIFF.TIFFWriteScanline(
                    tifp, row.ctypes.data_as(ctypes.c_void_p),
                    ctypes.c_uint32(y), ctypes.c_uint16(0))
                if ok != 1:
                    pytest.skip("libtiff TIFFWriteScanline failed")
            _TIFF.TIFFClose(tif)
            with open(path, "rb") as f:
                blob = f.read()
            ours, mode = decode_tiff(blob)
            assert mode == "RGB" and ours.shape == src.shape
            libs = _libtiff_read_rgba(blob)[:, :, :3]
            diff = np.abs(ours.astype(int) - libs.astype(int))
            assert diff.max() <= 2 and diff.mean() <= 0.6
        finally:
            os.unlink(path)


# ------------------------------------- round-5i layout parity (libtiff
# authors tiled / planar / palette / sub-byte / 16-bit files our own
# encoder cannot write; our decoder must match TIFFReadRGBAImage)

_TIFFTAG.update({"predictor": 317, "colormap": 320,
                 "tilewidth": 322, "tilelength": 323})


def _pack_row_msb(row: np.ndarray, bit: int) -> np.ndarray:
    """Pack one row of sub-byte samples MSB-first, byte-aligned."""
    if bit == 8:
        return np.ascontiguousarray(row)
    ub = np.unpackbits(row[:, None], axis=1)[:, 8 - bit:]
    flat = ub.reshape(-1)
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.uint8)])
    return np.packbits(flat)


@pytest.mark.skipif(_TIFF is None, reason="libtiff not present")
class TestTiffLayoutParity:
    """libtiff AUTHORS the file; pixel-exact three-way check: our
    decoder vs the source array vs TIFFReadRGBAImage."""

    def _author(self, w, h, fields, write_cb):
        fd, path = tempfile.mkstemp(suffix=".tif")
        os.close(fd)
        try:
            tif = _TIFF.TIFFOpen(path.encode(), b"w")
            assert tif, "libtiff TIFFOpen(w) failed"
            tifp = ctypes.c_void_p(tif)
            setf = _TIFF.TIFFSetField
            setf.restype = ctypes.c_int
            for tag, val in [("width", w), ("length", h)] + fields:
                if not setf(tifp, ctypes.c_uint32(_TIFFTAG[tag]),
                            ctypes.c_int(val)):
                    pytest.skip(f"libtiff refused tag {tag}={val}")
            write_cb(tifp)
            _TIFF.TIFFClose(tif)
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)

    @staticmethod
    def _scanline_writer(rows):
        """rows: iterable of (uint8-array, y, sample)."""
        def write(tifp):
            _TIFF.TIFFWriteScanline.restype = ctypes.c_int
            for buf, y, s in rows:
                arr = np.ascontiguousarray(buf)
                ok = _TIFF.TIFFWriteScanline(
                    tifp, arr.ctypes.data_as(ctypes.c_void_p),
                    ctypes.c_uint32(y), ctypes.c_uint16(s))
                if ok != 1:
                    pytest.skip("libtiff TIFFWriteScanline failed")
        return write

    @pytest.mark.parametrize("comp,pred", [(1, 1), (5, 2), (8, 1)],
                             ids=["none", "lzw+pred", "deflate"])
    def test_tiled_rgb(self, comp, pred):
        rng = np.random.default_rng(0x5109)
        h, w, tw, th = 53, 70, 16, 16
        src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        fields = [("bits", 8), ("samples", 3), ("photometric", 2),
                  ("planar", 1), ("compression", comp),
                  ("tilewidth", tw), ("tilelength", th)]
        if pred == 2:
            fields.append(("predictor", 2))
        pad = np.zeros((-(-h // th) * th, -(-w // tw) * tw, 3),
                       np.uint8)
        pad[:h, :w] = src

        def write(tifp):
            wt = _TIFF.TIFFWriteTile
            wt.restype = ctypes.c_int64
            wt.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                           ctypes.c_uint32, ctypes.c_uint32,
                           ctypes.c_uint32, ctypes.c_uint16]
            for ty in range(0, pad.shape[0], th):
                for tx in range(0, pad.shape[1], tw):
                    tile = np.ascontiguousarray(
                        pad[ty:ty + th, tx:tx + tw])
                    ok = wt(tifp,
                            tile.ctypes.data_as(ctypes.c_void_p),
                            tx, ty, 0, 0)
                    if ok <= 0:
                        pytest.skip("libtiff TIFFWriteTile failed")

        blob = self._author(w, h, fields, write)
        ours, mode = decode_tiff(blob)
        assert mode == "RGB"
        assert np.array_equal(ours, src)
        assert np.array_equal(ours, _libtiff_read_rgba(blob)[:, :, :3])

    @pytest.mark.parametrize("comp,pred", [(1, 1), (5, 2)],
                             ids=["none", "lzw+pred"])
    def test_planar_rgb_strips(self, comp, pred):
        rng = np.random.default_rng(0x5110)
        h, w = 37, 29
        src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        fields = [("bits", 8), ("samples", 3), ("photometric", 2),
                  ("planar", 2), ("compression", comp),
                  ("rows_per_strip", 8)]
        if pred == 2:
            fields.append(("predictor", 2))
        rows = [(src[y, :, s], y, s)
                for s in range(3) for y in range(h)]
        blob = self._author(w, h, fields, self._scanline_writer(rows))
        ours, mode = decode_tiff(blob)
        assert mode == "RGB"
        assert np.array_equal(ours, src)
        assert np.array_equal(ours, _libtiff_read_rgba(blob)[:, :, :3])

    def test_tiled_planar_rgb(self):
        rng = np.random.default_rng(0x5111)
        h, w, tw, th = 40, 45, 16, 16
        src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        fields = [("bits", 8), ("samples", 3), ("photometric", 2),
                  ("planar", 2), ("compression", 8),
                  ("tilewidth", tw), ("tilelength", th)]
        pad = np.zeros((-(-h // th) * th, -(-w // tw) * tw, 3),
                       np.uint8)
        pad[:h, :w] = src

        def write(tifp):
            wt = _TIFF.TIFFWriteTile
            wt.restype = ctypes.c_int64
            wt.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                           ctypes.c_uint32, ctypes.c_uint32,
                           ctypes.c_uint32, ctypes.c_uint16]
            for s in range(3):
                for ty in range(0, pad.shape[0], th):
                    for tx in range(0, pad.shape[1], tw):
                        tile = np.ascontiguousarray(
                            pad[ty:ty + th, tx:tx + tw, s])
                        ok = wt(tifp,
                                tile.ctypes.data_as(ctypes.c_void_p),
                                tx, ty, 0, s)
                        if ok <= 0:
                            pytest.skip("TIFFWriteTile failed")

        blob = self._author(w, h, fields, write)
        ours, mode = decode_tiff(blob)
        assert mode == "RGB"
        assert np.array_equal(ours, src)
        assert np.array_equal(ours, _libtiff_read_rgba(blob)[:, :, :3])

    @pytest.mark.parametrize("bit", [4, 8])
    def test_palette(self, bit):
        rng = np.random.default_rng(0x5112 + bit)
        h, w, n = 21, 33, 1 << bit
        idx = rng.integers(0, n, (h, w), dtype=np.uint8)
        cmap16 = rng.integers(0, 65536, (3, n), dtype=np.uint16)
        fields = [("bits", bit), ("samples", 1), ("photometric", 3),
                  ("planar", 1), ("compression", 1)]

        rows = [(_pack_row_msb(idx[y], bit), y, 0) for y in range(h)]
        line_writer = self._scanline_writer(rows)

        def write(tifp):
            setf = _TIFF.TIFFSetField
            chans = [np.ascontiguousarray(cmap16[i]) for i in range(3)]
            ok = setf(tifp, ctypes.c_uint32(_TIFFTAG["colormap"]),
                      *[c.ctypes.data_as(ctypes.c_void_p)
                        for c in chans])
            if not ok:
                pytest.skip("libtiff refused ColorMap")
            line_writer(tifp)

        blob = self._author(w, h, fields, write)
        ours, mode = decode_tiff(blob)
        assert mode == "RGB"
        # libtiff checkcmap/cvtcmap: full-range entries CVT via >> 8
        lut = (cmap16 >> 8).astype(np.uint8).T
        assert np.array_equal(ours, lut[idx])
        assert np.array_equal(ours, _libtiff_read_rgba(blob)[:, :, :3])

    @pytest.mark.parametrize("bit", [1, 2, 4])
    @pytest.mark.parametrize("photometric", [0, 1],
                             ids=["white0", "black0"])
    def test_subbyte_gray(self, bit, photometric):
        rng = np.random.default_rng(0x5113 + bit)
        h, w = 19, 26
        idx = rng.integers(0, 1 << bit, (h, w), dtype=np.uint8)
        fields = [("bits", bit), ("samples", 1),
                  ("photometric", photometric), ("planar", 1),
                  ("compression", 8), ("rows_per_strip", 5)]
        rows = [(_pack_row_msb(idx[y], bit), y, 0) for y in range(h)]
        blob = self._author(w, h, fields, self._scanline_writer(rows))
        ours, mode = decode_tiff(blob)
        assert mode == "L"
        want = (idx * (255 // ((1 << bit) - 1))).astype(np.uint8)
        if photometric == 0:
            want = 255 - want
        assert np.array_equal(ours, want)
        assert np.array_equal(ours, _libtiff_read_rgba(blob)[:, :, 0])

    @pytest.mark.parametrize("spp", [1, 3], ids=["gray16", "rgb16"])
    def test_16bit(self, spp):
        rng = np.random.default_rng(0x5114 + spp)
        h, w = 23, 31
        src = rng.integers(0, 65536, (h, w, spp), dtype=np.uint16)
        fields = [("bits", 16), ("samples", spp),
                  ("photometric", 1 if spp == 1 else 2),
                  ("planar", 1), ("compression", 8),
                  ("rows_per_strip", 7)]
        rows = [(src[y].reshape(-1).view(np.uint8), y, 0)
                for y in range(h)]
        blob = self._author(w, h, fields, self._scanline_writer(rows))
        ours, mode = decode_tiff(blob)
        if spp == 1:
            # gray16: libtiff's BWmap indexes by the high byte
            assert mode == "L"
            assert np.array_equal(ours, (src[:, :, 0] >> 8)
                                  .astype(np.uint8))
            assert np.array_equal(
                ours, _libtiff_read_rgba(blob)[:, :, 0])
        else:
            # rgb16: libtiff's Bitdepth16To8 — rounded division by 257
            assert mode == "RGB"
            want = ((src.astype(np.uint32) + 128) // 257) \
                .astype(np.uint8)
            assert np.array_equal(ours, want)
            assert np.array_equal(
                ours, _libtiff_read_rgba(blob)[:, :, :3])


@pytest.mark.skipif(_TIFF is None, reason="libtiff not present")
class TestTiffLayoutWriterParity:
    """Reverse direction: OUR general layout writer authors the file
    and libtiff must read it — the interop proof that
    ``encode_tiff_layout``'s IFD/tile/planar/palette byte layout is
    spec-conformant, not merely self-consistent."""

    @pytest.mark.parametrize("desc,kw", [
        ("tiled_lzw_pred", dict(tile=(16, 16), compression="lzw",
                                predictor=True)),
        ("planar_strips", dict(planar=2, rows_per_strip=8,
                               compression="deflate")),
        ("tiled_planar", dict(planar=2, tile=(16, 16))),
        ("strips_packbits", dict(rows_per_strip=6,
                                 compression="packbits")),
    ])
    def test_libtiff_reads_our_rgb_layouts(self, desc, kw):
        from document_convert_to__markdown_spark.extractors.tiff_codec \
            import encode_tiff_layout
        rng = np.random.default_rng(0x5120)
        src = rng.integers(0, 256, (45, 38, 3), dtype=np.uint8)
        blob = encode_tiff_layout(src, **kw)
        assert np.array_equal(_libtiff_read_rgba(blob)[:, :, :3], src)

    def test_libtiff_reads_our_palette_and_subbyte(self):
        from document_convert_to__markdown_spark.extractors.tiff_codec \
            import encode_tiff_layout
        rng = np.random.default_rng(0x5121)
        idx = rng.integers(0, 16, (17, 23), dtype=np.uint8)
        pal = rng.integers(0, 65536, (16, 3), dtype=np.uint16)
        blob = encode_tiff_layout(idx, palette=pal, bit_depth=4)
        assert np.array_equal(_libtiff_read_rgba(blob)[:, :, :3],
                              (pal >> 8).astype(np.uint8)[idx])
        g = rng.integers(0, 4, (19, 21), dtype=np.uint8)
        blob = encode_tiff_layout(g, bit_depth=2,
                                  compression="deflate")
        assert np.array_equal(_libtiff_read_rgba(blob)[:, :, 0],
                              (g * 85).astype(np.uint8))

    def test_libtiff_reads_our_16bit(self):
        from document_convert_to__markdown_spark.extractors.tiff_codec \
            import encode_tiff_layout
        rng = np.random.default_rng(0x5122)
        g16 = rng.integers(0, 65536, (13, 27), dtype=np.uint16)
        blob = encode_tiff_layout(g16, rows_per_strip=4)
        assert np.array_equal(_libtiff_read_rgba(blob)[:, :, 0],
                              (g16 >> 8).astype(np.uint8))
        rgb16 = rng.integers(0, 65536, (13, 27, 3), dtype=np.uint16)
        blob = encode_tiff_layout(rgb16, compression="deflate")
        want = ((rgb16.astype(np.uint32) + 128) // 257).astype(np.uint8)
        assert np.array_equal(_libtiff_read_rgba(blob)[:, :, :3], want)


@pytest.mark.skipif(_TIFF is None, reason="libtiff not present")
def test_tiff_orientation_flips_match_libtiff():
    """Orientation tag 274, codes 1-4: our apply_orientation and
    libtiff's TIFFReadRGBAImageOriented(TOPLEFT) must both recover
    the upright image from stored-rotated pixels.  (libtiff only
    warns-and-approximates the transposed codes 5-8, so those are
    pinned spec-side in tests/test_exif.py instead.)"""
    from document_convert_to__markdown_spark.extractors.exif import (
        apply_orientation, invert_orientation,
    )
    from document_convert_to__markdown_spark.extractors.tiff_codec \
        import decode_tiff, encode_tiff_layout
    rng = np.random.default_rng(0x5130)
    img = rng.integers(0, 256, (21, 34, 3), dtype=np.uint8)
    for o in (1, 2, 3, 4):
        blob = encode_tiff_layout(invert_orientation(img, o),
                                  orientation=o)
        ours = apply_orientation(decode_tiff(blob)[0], o)
        assert np.array_equal(ours, img), o
        assert np.array_equal(_libtiff_read_rgba(blob)[:, :, :3],
                              img), o
