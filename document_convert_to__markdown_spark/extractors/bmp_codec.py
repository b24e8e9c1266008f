"""From-scratch BMP decode/encode — stdlib ``struct`` + numpy.

Fifth sibling of the codec family, and the cheapest: a BMP file is a
14-byte file header plus exactly the DIB bitmap AVI's raw-video frames
use (``avi_codec`` reverses the same stride/padding/bottom-up/BGR
layout).  Implements the subset real crawls meet for uncompressed
bitmaps:

- ``decode_bmp``: BITMAPINFOHEADER (or larger V4/V5 headers — the
  first 40 bytes are layout-compatible), ``BI_RGB`` uncompressed,
  24-bit BGR / 32-bit BGRX / 8-bit palette, bottom-up and top-down
  (negative height) row orders.  RLE/bitfield compression raises
  ``UnsupportedBmp``; malformed input raises ``ValueError`` and never
  anything else (the multimodal kernels' stub fallback catches
  ValueError only).
- ``encode_bmp``: ``(h, w, 3)`` RGB array → 24-bit bottom-up BMP
  bytes (the test twin).
"""

from __future__ import annotations

import struct

import numpy as np

BMP_SIG = b"BM"


class UnsupportedBmp(ValueError):
    """Valid BMP outside the implemented subset (RLE, bitfields...)."""


def decode_bmp(payload: bytes) -> tuple[np.ndarray, str]:
    """BMP bytes → ``((h, w, 3) uint8 RGB, "RGB")``."""
    if len(payload) < 54 or payload[:2] != BMP_SIG:
        raise ValueError("not a BMP (bad signature / truncated header)")
    (pixel_off,) = struct.unpack("<I", payload[10:14])
    hdr_size, w, h, _planes, bits, comp = struct.unpack(
        "<IiihHI", payload[14:34])
    if hdr_size < 40:
        raise UnsupportedBmp(f"BMP core header size {hdr_size}")
    if comp != 0:                               # 0 = BI_RGB
        raise UnsupportedBmp(f"BMP compression {comp} not BI_RGB")
    if bits not in (8, 24, 32):
        raise UnsupportedBmp(f"BMP bit depth {bits}")
    top_down = h < 0
    height = abs(h)
    if w <= 0 or height == 0 or abs(h) > 0x7FFFFFFF:
        raise ValueError("bad BMP dimensions")
    # pixel data must start past the headers (and palette for 8-bit);
    # a crafted bfOffBits pointing into the header would otherwise
    # decode header bytes as "real" pixels with mode='RGB' provenance
    data_floor = 14 + hdr_size
    if bits == 8:
        (used,) = struct.unpack("<I", payload[46:50])
        n_colors = used or 256
        data_floor += 4 * n_colors
    if pixel_off < data_floor:
        raise ValueError("BMP pixel offset inside header/palette")

    stride = (w * bits // 8 + 3) & ~3           # rows pad to 4 bytes
    need = stride * height
    if pixel_off + need > len(payload):
        raise ValueError("BMP pixel data short for declared size")
    raw = np.frombuffer(
        payload[pixel_off:pixel_off + need], dtype=np.uint8)

    if bits == 8:
        # palette: BGRX quads between the info header and the pixels
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            payload[pal_off:pal_off + 4 * n_colors], dtype=np.uint8)
        if pal.size < 4 * n_colors:
            raise ValueError("BMP palette short")
        pal = pal.reshape(-1, 4)[:, :3][:, ::-1]    # BGRX → RGB
        idx = raw.reshape(height, stride)[:, :w]
        if int(idx.max()) >= len(pal):
            raise ValueError("BMP index beyond palette")
        out = pal[idx]
        out = out if top_down else out[::-1]
    else:
        from .avi_codec import dib_rows_to_rgb
        out = dib_rows_to_rgb(raw, w, height, bits // 8, top_down)
    return out.copy(), "RGB"


def encode_bmp(pixels: np.ndarray) -> bytes:
    """``(h, w, 3)`` uint8 RGB → 24-bit bottom-up BMP bytes."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3 or 0 in arr.shape[:2]:
        raise ValueError(f"need non-empty (h, w, 3) RGB pixels, "
                         f"got {arr.shape}")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    return (BMP_SIG + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
            + struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0,
                          len(data), 2835, 2835, 0, 0)
            + data)
