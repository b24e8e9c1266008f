"""From-scratch BMP decode/encode — stdlib ``struct`` + numpy.

Fifth sibling of the codec family, and the cheapest: a BMP file is a
14-byte file header plus exactly the DIB bitmap AVI's raw-video frames
use (``avi_codec`` reverses the same stride/padding/bottom-up/BGR
layout).  Implements the subset real crawls meet for uncompressed
bitmaps:

- ``decode_bmp``: BITMAPINFOHEADER (or larger V4/V5 headers — the
  first 40 bytes are layout-compatible), ``BI_RGB`` uncompressed at
  1/4/8-bit palette and 24-bit BGR / 32-bit BGRX depths, bottom-up
  and top-down (negative height) row orders, plus ``BI_RLE8`` /
  ``BI_RLE4`` run-length streams (encoded runs, absolute mode with
  word padding, end-of-line / end-of-bitmap / delta escapes —
  undefined pixels resolve to palette entry 0, the common renderer
  convention).  Bitfield compression raises ``UnsupportedBmp``;
  malformed input raises ``ValueError`` and never anything else (the
  multimodal kernels' stub fallback catches ValueError only).
- ``encode_bmp``: ``(h, w, 3)`` RGB array → 24-bit bottom-up BMP
  bytes; ``encode_bmp_rle8`` → run-length 8-bit palette bytes (the
  test twins; absolute/delta escape decoding is pinned by handcrafted
  streams in the tests).
"""

from __future__ import annotations

import struct

import numpy as np

BMP_SIG = b"BM"


class UnsupportedBmp(ValueError):
    """Valid BMP outside the implemented subset (RLE, bitfields...)."""


def _decode_rle(data: bytes, w: int, height: int,
                bits: int) -> np.ndarray:
    """BI_RLE8/BI_RLE4 stream → ``(height, w)`` uint8 index grid in
    the stream's bottom-up row order (row 0 = bottom scanline).

    Undefined pixels (skipped by delta / left after end-of-bitmap)
    stay index 0.  Runs are clamped at the row edge (real encoders
    never cross it; hostile streams shouldn't crash the batch)."""
    grid = np.zeros((height, w), dtype=np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 2 <= n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt:                                 # encoded run
            if y >= height:
                raise ValueError("BMP RLE run past bitmap")
            end = min(x + cnt, w)
            if bits == 8:
                grid[y, x:end] = val
            else:
                pix = np.tile(np.array([val >> 4, val & 0xF], np.uint8),
                              (cnt + 1) // 2)
                grid[y, x:end] = pix[:end - x]
            x = end
            continue
        if val == 0:                            # end of line
            x, y = 0, y + 1
        elif val == 1:                          # end of bitmap
            return grid
        elif val == 2:                          # delta
            if i + 2 > n:
                raise ValueError("truncated BMP RLE delta")
            x, y = x + data[i], y + data[i + 1]
            i += 2
            if x > w or y > height:
                raise ValueError("BMP RLE delta past bitmap")
        else:                                   # absolute mode
            nbytes = val if bits == 8 else (val + 1) // 2
            if i + nbytes > n:
                raise ValueError("truncated BMP RLE absolute run")
            chunk = np.frombuffer(data[i:i + nbytes], dtype=np.uint8)
            i += (nbytes + 1) & ~1              # pad to word boundary
            if y >= height:
                raise ValueError("BMP RLE absolute run past bitmap")
            if bits == 8:
                pix = chunk
            else:
                pix = np.empty(nbytes * 2, np.uint8)
                pix[0::2] = chunk >> 4
                pix[1::2] = chunk & 0xF
                pix = pix[:val]
            end = min(x + val, w)
            grid[y, x:end] = pix[:end - x]
            x = end
    return grid


def decode_bmp(payload: bytes) -> tuple[np.ndarray, str]:
    """BMP bytes → ``((h, w, 3) uint8 RGB, "RGB")``."""
    if len(payload) < 54 or payload[:2] != BMP_SIG:
        raise ValueError("not a BMP (bad signature / truncated header)")
    (pixel_off,) = struct.unpack("<I", payload[10:14])
    hdr_size, w, h, _planes, bits, comp = struct.unpack(
        "<IiihHI", payload[14:34])
    if hdr_size < 40:
        raise UnsupportedBmp(f"BMP core header size {hdr_size}")
    if comp not in (0, 1, 2):                   # BI_RGB / BI_RLE8 / BI_RLE4
        raise UnsupportedBmp(f"BMP compression {comp} unsupported")
    if comp == 0 and bits not in (1, 4, 8, 24, 32):
        raise UnsupportedBmp(f"BMP bit depth {bits}")
    if comp == 1 and bits != 8:
        raise ValueError("BI_RLE8 requires 8-bit pixels")
    if comp == 2 and bits != 4:
        raise ValueError("BI_RLE4 requires 4-bit pixels")
    top_down = h < 0
    height = abs(h)
    if w <= 0 or height == 0 or abs(h) > 0x7FFFFFFF:
        raise ValueError("bad BMP dimensions")
    if comp and top_down:
        raise ValueError("RLE BMPs are bottom-up by spec")
    # pixel data must start past the headers (and palette for indexed
    # depths); a crafted bfOffBits pointing into the header would
    # otherwise decode header bytes as "real" pixels
    data_floor = 14 + hdr_size
    n_colors = 0
    if bits <= 8:
        (used,) = struct.unpack("<I", payload[46:50])
        n_colors = used or (1 << bits)
        data_floor += 4 * n_colors
    if pixel_off < data_floor:
        raise ValueError("BMP pixel offset inside header/palette")

    if bits <= 8:
        # palette: BGRX quads between the info header and the pixels
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            payload[pal_off:pal_off + 4 * n_colors], dtype=np.uint8)
        if pal.size < 4 * n_colors:
            raise ValueError("BMP palette short")
        pal = pal.reshape(-1, 4)[:, :3][:, ::-1]    # BGRX → RGB

    if comp:                                    # RLE8 / RLE4
        # RLE output size is bounded by the header dims, which the
        # grid allocation below commits to: cap it like the others
        if height * w > 1 << 28:
            raise UnsupportedBmp("BMP decoded size beyond cap")
        idx = _decode_rle(payload[pixel_off:], w, height, bits)
        if int(idx.max()) >= len(pal):
            raise ValueError("BMP index beyond palette")
        return pal[idx][::-1].copy(), "RGB"     # stream rows are bottom-up

    stride = ((w * bits + 31) // 32) * 4        # rows pad to 4 bytes
    need = stride * height
    if pixel_off + need > len(payload):
        raise ValueError("BMP pixel data short for declared size")
    raw = np.frombuffer(
        payload[pixel_off:pixel_off + need], dtype=np.uint8)

    if bits <= 8:
        rows = raw.reshape(height, stride)
        if bits == 8:
            idx = rows[:, :w]
        else:
            bits_arr = np.unpackbits(rows, axis=1)[:, :w * bits]
            weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint8)
            idx = (bits_arr.reshape(height, w, bits) * weights).sum(axis=2)
        if int(idx.max()) >= len(pal):
            raise ValueError("BMP index beyond palette")
        out = pal[idx]
        out = out if top_down else out[::-1]
    else:
        from .avi_codec import dib_rows_to_rgb
        out = dib_rows_to_rgb(raw, w, height, bits // 8, top_down)
    return out.copy(), "RGB"


def encode_bmp_rle8(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """``(h, w)`` uint8 index grid + ``(n, 3)`` RGB palette →
    BI_RLE8 BMP bytes (encoded runs + end-of-line/bitmap escapes; the
    test twin for the RLE decoder — absolute/delta modes are covered
    by handcrafted streams in the tests)."""
    grid = np.ascontiguousarray(idx, dtype=np.uint8)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if grid.ndim != 2 or 0 in grid.shape:
        raise ValueError(f"need non-empty (h, w) indexes, got {grid.shape}")
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError("palette must be (n<=256, 3) RGB")
    if int(grid.max()) >= len(pal):
        raise ValueError("index beyond palette")
    h, w = grid.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):              # bottom-up row order
        row = grid[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            out += bytes([run, int(row[x])])
            x += run
        out += b"\x00\x00"                      # end of line
    out += b"\x00\x01"                          # end of bitmap
    quads = np.zeros((len(pal), 4), np.uint8)
    quads[:, :3] = pal[:, ::-1]                 # RGB → BGRX
    pal_bytes = quads.tobytes()
    off = 14 + 40 + len(pal_bytes)
    return (BMP_SIG + struct.pack("<IHHI", off + len(out), 0, 0, off)
            + struct.pack("<IiihHIIiiII", 40, w, h, 1, 8, 1,
                          len(out), 2835, 2835, len(pal), 0)
            + pal_bytes + bytes(out))


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
