"""From-scratch PNG decode/encode — stdlib ``zlib`` + numpy only.

The container has no image libraries (PIL/ffmpeg installs are
off-limits), which is why the multimodal decode kernels started as
stubs.  PNG, the dominant lossless web image format, needs nothing
beyond DEFLATE — so this module implements the subset of ISO/IEC
15948 / RFC 2083 a training-data pipeline actually meets:

- ``decode_png``: non-interlaced, bit depth 8, color types 0 (gray),
  2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline
  filters (None/Sub/Up/Average/Paeth, spec §6) reversed exactly.
- ``encode_png``: filter-0 scanlines for gray/gray+alpha/RGB/RGBA
  arrays (the synthesizer's ``make_png`` twin, but for arbitrary
  pixel arrays).

Anything outside that subset (interlaced, 16-bit, sub-byte depths)
raises ``UnsupportedPNG`` so callers can fall back to their stub path
explicitly — never a silent wrong decode.

Pure Python per-row filter loops are fine here: scanlines are
sequential by definition (each byte depends on the previous), and the
Up filter — the only whole-row-parallel one — uses numpy.  Decode
speed is bounded by ``zlib.decompress`` for real images.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channels in the raw scanline
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_MODES = {0: "L", 2: "RGB", 3: "RGB", 4: "LA", 6: "RGBA"}


class UnsupportedPNG(ValueError):
    """Valid PNG outside the implemented subset (interlaced, 16-bit...)."""


def _chunks(payload: bytes):
    pos = len(PNG_SIG)
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        yield tag, data
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IEND":
            return


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering (spec §6.1-6.6) → (h, stride) u8."""
    expected = height * (stride + 1)
    if len(raw) < expected:
        # BEFORE the output allocation: a crafted IHDR declaring huge
        # dimensions with a tiny IDAT must die as ValueError here, not
        # as a MemoryError on np.empty below
        raise ValueError("truncated PNG pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 0:                              # None
            pass
        elif ftype == 1:                            # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:                            # Up
            row = bytearray(
                ((np.frombuffer(bytes(row), dtype=np.uint8)
                  + prev) & 0xFF).astype(np.uint8).tobytes())
        elif ftype == 3:                            # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:                            # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                row[i] = (row[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = out[y]
    return out


def decode_png(payload: bytes) -> tuple[np.ndarray, str]:
    """PNG bytes → ``(pixels, mode)``.

    ``pixels`` is ``(h, w)`` uint8 for mode ``"L"`` and ``(h, w, c)``
    for ``"LA"``/``"RGB"``/``"RGBA"``; palette images resolve through
    PLTE to RGB.  Raises ``UnsupportedPNG`` for interlaced/16-bit/
    sub-byte inputs, ``ValueError`` for malformed ones.
    """
    if not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    plte = None
    idat = []
    for tag, data in _chunks(payload):
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = data
        elif tag == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad PNG compression/filter method")
    if interlace != 0:
        raise UnsupportedPNG("interlaced (Adam7) PNG not supported")
    if depth != 8:
        raise UnsupportedPNG(f"bit depth {depth} not supported (only 8)")
    if ctype not in _CHANNELS:
        raise ValueError(f"bad PNG color type {ctype}")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")

    ch = _CHANNELS[ctype]
    stride = width * ch
    expected = height * (stride + 1)
    if expected > 1 << 28:
        # decoded-size ceiling (256 MiB of scanlines): zlib expands up
        # to ~1032x, so without a cap a small crafted payload can
        # demand tens of GB.  Real web images sit far below this;
        # UnsupportedPNG → callers' stub fallback, never an OOM.
        raise UnsupportedPNG("PNG decoded size beyond 256MiB cap")
    try:
        # decompress with the output CAPPED at the size the header
        # promises — a decompression bomb stops at `expected` bytes
        # instead of materializing its full expansion
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected)
        while len(raw) < expected and d.unconsumed_tail:
            raw += d.decompress(d.unconsumed_tail, expected - len(raw))
    except zlib.error as exc:
        # zlib.error subclasses Exception, NOT ValueError — without
        # this wrap one corrupt IDAT kills the whole Arrow batch task
        raise ValueError(f"corrupt PNG deflate stream: {exc}") from None
    grid = _unfilter(raw, height, stride, bpp=ch)

    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        return pal[grid.reshape(height, width)], _MODES[ctype]
    if ch == 1:
        return grid.reshape(height, width), _MODES[ctype]
    return grid.reshape(height, width, ch), _MODES[ctype]


def encode_png(pixels: np.ndarray, mode: str | None = None) -> bytes:
    """Pixel array → PNG bytes (filter 0, one IDAT).

    ``(h, w)`` arrays encode as grayscale; ``(h, w, {2,3,4})`` as
    LA/RGB/RGBA.  ``mode`` is accepted for symmetry and validated.
    """
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        ctype, ch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        ctype = {2: 4, 3: 2, 4: 6}[arr.shape[2]]
        ch = arr.shape[2]
    else:
        raise ValueError(f"unsupported pixel array shape {arr.shape}")
    if mode is not None and mode != _MODES[ctype]:
        raise ValueError(f"mode {mode!r} does not match array shape")
    h, w = arr.shape[0], arr.shape[1]
    body = arr.reshape(h, w * ch)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    return (PNG_SIG
            + chunk(b"IHDR",
                    struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
