# -*- coding: utf-8 -*-
"""Raw-image passthrough: header-parse metadata → markdown (no PIL).

Replaces the reference's ``ImageDocumentProcessor``
(/root/reference/src/document_processors.py:900-1065), which reads
width/height/format/mode via PIL from the local ``input/`` directory
(``:985`` — an impurity SURVEY.md §4.3 flags).  Here the metadata is
parsed directly from the payload bytes: pure function, no filesystem,
no third-party decoder.

Format→mode mapping mirrors what PIL would report for the common cases
so the emitted metadata markdown stays parity-compatible.
"""

from __future__ import annotations

import struct
from typing import NamedTuple, Optional


class ImageMeta(NamedTuple):
    width: Optional[int]
    height: Optional[int]
    format: Optional[str]  # PIL-style: PNG / JPEG / GIF / BMP / WEBP
    mode: Optional[str]    # PIL-style: RGB / RGBA / L / LA / P / CMYK


_PNG_MODES = {
    (0, 1): "1", (0, 8): "L", (0, 16): "I;16",
    (2, 8): "RGB", (2, 16): "RGB",
    (3, 8): "P", (3, 4): "P", (3, 2): "P", (3, 1): "P",
    (4, 8): "LA",
    (6, 8): "RGBA", (6, 16): "RGBA",
}


def _png_meta(payload: bytes) -> ImageMeta:
    # IHDR is always the first chunk: length(4) type(4) data(13) at offset 8.
    if len(payload) < 33 or payload[12:16] != b"IHDR":
        return ImageMeta(None, None, "PNG", None)
    width, height = struct.unpack(">II", payload[16:24])
    bit_depth = payload[24]
    color_type = payload[25]
    mode = _PNG_MODES.get((color_type, bit_depth), "RGB")
    return ImageMeta(width, height, "PNG", mode)


def _jpeg_meta(payload: bytes) -> ImageMeta:
    # Walk JFIF segments to the first SOF marker.
    i = 2
    n = len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            break
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            if i + 9 <= n:
                height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
                ncomp = payload[i + 9] if i + 9 < n else 3
                mode = {1: "L", 3: "RGB", 4: "CMYK"}.get(ncomp, "RGB")
                return ImageMeta(width, height, "JPEG", mode)
            break
        i += 2 + seg_len
    return ImageMeta(None, None, "JPEG", None)


def _gif_meta(payload: bytes) -> ImageMeta:
    if len(payload) < 10:
        return ImageMeta(None, None, "GIF", None)
    width, height = struct.unpack("<HH", payload[6:10])
    return ImageMeta(width, height, "GIF", "P")


def _bmp_meta(payload: bytes) -> ImageMeta:
    if len(payload) < 26:
        return ImageMeta(None, None, "BMP", None)
    width, height = struct.unpack("<ii", payload[18:26])
    return ImageMeta(width, abs(height), "BMP", "RGB")


def _webp_meta(payload: bytes) -> ImageMeta:
    if len(payload) < 30:
        return ImageMeta(None, None, "WEBP", None)
    chunk = payload[12:16]
    if chunk == b"VP8 ":
        width = struct.unpack("<H", payload[26:28])[0] & 0x3FFF
        height = struct.unpack("<H", payload[28:30])[0] & 0x3FFF
        return ImageMeta(width, height, "WEBP", "RGB")
    if chunk == b"VP8L":
        bits = struct.unpack("<I", payload[21:25])[0]
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
        return ImageMeta(width, height, "WEBP", "RGB")
    if chunk == b"VP8X":
        width = (int.from_bytes(payload[24:27], "little") + 1)
        height = (int.from_bytes(payload[27:30], "little") + 1)
        return ImageMeta(width, height, "WEBP", "RGBA")
    return ImageMeta(None, None, "WEBP", None)


def _tiff_meta(payload: bytes) -> ImageMeta:
    """TIFF baseline: endian header + first IFD's width/height/photometric
    tags (reference accepts .tiff via PIL — config.py:45)."""
    if len(payload) < 8:
        return ImageMeta(None, None, "TIFF", None)
    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        return ImageMeta(None, None, "TIFF", None)
    (ifd_off,) = struct.unpack_from(endian + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        return ImageMeta(None, None, "TIFF", None)
    (n_entries,) = struct.unpack_from(endian + "H", payload, ifd_off)
    width = height = photometric = None
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(payload):
            break
        tag, typ = struct.unpack_from(endian + "HH", payload, off)
        # SHORT (3) values sit in the first 2 bytes of the value field;
        # LONG (4) uses all 4.
        if typ == 3:
            (val,) = struct.unpack_from(endian + "H", payload, off + 8)
        elif typ == 4:
            (val,) = struct.unpack_from(endian + "I", payload, off + 8)
        else:
            continue
        if tag == 256:
            width = val
        elif tag == 257:
            height = val
        elif tag == 262:
            photometric = val
    mode = {0: "L", 1: "L", 2: "RGB", 3: "P"}.get(photometric, "RGB") \
        if photometric is not None else None
    return ImageMeta(width, height, "TIFF", mode)


def _heif_meta(payload: bytes) -> ImageMeta:
    """HEIF/AVIF (ISO-BMFF still images): dims from the largest
    ``ispe`` item property — see ``video_meta.heif_meta``."""
    from .video_meta import heif_meta

    got = heif_meta(payload)
    if got is None:
        return ImageMeta(None, None, None, None)
    fam, w, h = got
    return ImageMeta(w, h, fam.upper(), None)


_PARSERS = {
    "png": _png_meta,
    "jpeg": _jpeg_meta,
    "gif": _gif_meta,
    "bmp": _bmp_meta,
    "webp": _webp_meta,
    "tiff": _tiff_meta,
    "avif": _heif_meta,
    "heic": _heif_meta,
}

_EXTENSIONS = {"png": ".png", "jpeg": ".jpg", "gif": ".gif",
               "bmp": ".bmp", "webp": ".webp", "tiff": ".tiff",
               "avif": ".avif", "heic": ".heic"}


def image_meta(payload: bytes, fmt: str) -> ImageMeta:
    """Parse width/height/format/mode from the image header bytes."""
    parser = _PARSERS.get(fmt)
    if parser is None:
        return ImageMeta(None, None, None, None)
    try:
        return parser(payload)
    except (struct.error, IndexError, ValueError):
        return ImageMeta(None, None, fmt.upper(), None)


def image_extension(fmt: str) -> str:
    return _EXTENSIONS.get(fmt, ".png")
