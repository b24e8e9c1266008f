"""From-scratch ICO (Windows icon / favicon) decoder — ``struct`` +
numpy, reusing the sibling codecs for the actual pixel payloads.

Favicons are the one image format nearly every crawled host serves
(``/favicon.ico``), and its container is trivial on top of what the
codec family already decodes: an ICONDIR header, 16-byte directory
entries, and per-entry payloads that are either a complete PNG stream
(Vista+ convention, delegated to ``png_codec``) or a BITMAPINFOHEADER
DIB with a doubled ``biHeight`` — the XOR color image in the usual
bottom-up stride-padded BGR(A) layout (same math as ``bmp_codec`` /
``avi_codec.dib_rows_to_rgb``) followed by a 1-bit AND transparency
mask.  Layout per the public ICO/CUR documentation (the format has no
formal spec; the ICONDIR/ICONDIRENTRY/double-height-DIB structures are
the universally documented on-disk contract).

Subset: type-1 icons (cursors refused), best single image selected by
pixel area then bit depth, PNG entries via ``decode_png``'s subset,
DIB entries at 8/24/32 bits uncompressed.  1/4-bit DIBs and cursors
raise ``UnsupportedIco``; malformed input raises ``ValueError`` and
NOTHING ELSE (the multimodal kernels' stub fallback catches ValueError
only).  Allocation-bomb posture: DIB entries validate every span
against the payload before any output allocation (output ≤ 4x the
entry's bytes); PNG entries inherit ``decode_png``'s header-capped
decompression and 256 MiB decoded-size ceiling, so a crafted
directory can't OOM the executor either way.

32-bit quirk handled: icons written before alpha icons existed carry
an all-zero alpha channel and rely on the AND mask; when every alpha
byte is 0 the mask supplies transparency instead (the behavior every
public icon loader implements).
"""

from __future__ import annotations

import struct

import numpy as np

ICO_SIG = b"\x00\x00\x01\x00"           # idReserved=0, idType=1 (icon)

_MAX_ENTRIES = 256                      # u8 dimensions => bounded dirs


class UnsupportedIco(ValueError):
    """Valid ICO outside the implemented subset (cursor, 1/4-bit...)."""


def is_ico(payload: bytes) -> bool:
    """ICONDIR magic + a sane entry count.  Deliberately NOT in the
    shared ``sniffer`` (same reasoning as ``avi_codec.is_avi``): the
    extraction dispatcher mirrors the reference's SUPPORTED_FORMATS,
    which has no ``.ico``; the multimodal operators detect locally."""
    if len(payload) < 6 + 16 or payload[:4] != ICO_SIG:
        return False
    (count,) = struct.unpack("<H", payload[4:6])
    return 1 <= count <= _MAX_ENTRIES


def _decode_dib_entry(sub: bytes) -> tuple[np.ndarray, str]:
    """Double-height ICO DIB → ``((h, w, 4) uint8 RGBA, "RGBA")``."""
    if len(sub) < 40:
        raise ValueError("ICO DIB header truncated")
    hdr_size, w, h2, _planes, bits, comp = struct.unpack(
        "<IiihHI", sub[:20])
    if hdr_size < 40:
        raise UnsupportedIco(f"ICO DIB core header size {hdr_size}")
    if comp != 0:                               # 0 = BI_RGB
        raise UnsupportedIco(f"ICO DIB compression {comp} not BI_RGB")
    if bits not in (8, 24, 32):
        raise UnsupportedIco(f"ICO DIB bit depth {bits}")
    if w <= 0 or h2 <= 0 or h2 % 2:
        # height is XOR+AND stacked and always bottom-up in the wild;
        # odd/negative means a crafted or out-of-subset header
        raise ValueError("bad ICO DIB dimensions")
    height = h2 // 2

    (used,) = struct.unpack("<I", sub[32:36])
    # biClrUsed: the palette size for 8-bit, but ALSO the size of the
    # optional "optimization" color table some encoders emit for
    # truecolor DIBs — skipping it only for bits==8 would decode
    # palette bytes as the first scanlines
    n_colors = (used or 256) if bits == 8 else used
    if n_colors > 256:
        raise ValueError("ICO DIB color table beyond 256 entries")
    data_off = hdr_size + 4 * n_colors

    xor_stride = (w * bits // 8 + 3) & ~3       # rows pad to 4 bytes
    and_stride = ((w + 7) // 8 + 3) & ~3        # 1 bit/px, same padding
    xor_need = xor_stride * height
    if data_off + xor_need > len(sub):
        raise ValueError("ICO DIB pixel data short for declared size")
    raw = np.frombuffer(sub[data_off:data_off + xor_need], dtype=np.uint8)

    if bits == 8:
        pal = np.frombuffer(sub[hdr_size:hdr_size + 4 * n_colors],
                            dtype=np.uint8)
        if pal.size < 4 * n_colors:
            raise ValueError("ICO DIB palette short")
        pal = pal.reshape(-1, 4)[:, :3][:, ::-1]        # BGRX → RGB
        idx = raw.reshape(height, xor_stride)[:, :w]
        if int(idx.max()) >= len(pal):
            raise ValueError("ICO DIB index beyond palette")
        rgb = pal[idx][::-1]                            # bottom-up
        alpha = None
    else:
        from .avi_codec import dib_rows_to_rgb         # shared DIB math
        rgb = dib_rows_to_rgb(raw, w, height, bits // 8, top_down=False)
        alpha = (raw.reshape(height, xor_stride)[:, 3:w * 4:4][::-1]
                 if bits == 32 else None)

    if alpha is None or not alpha.any():
        # 24/8-bit always mask-transparent; 32-bit with all-zero alpha
        # is the pre-alpha-icon quirk — the AND mask is authoritative.
        # A missing/short mask degrades to opaque (common in the wild).
        mask_off = data_off + xor_need
        if mask_off + and_stride * height <= len(sub):
            mrows = np.frombuffer(
                sub[mask_off:mask_off + and_stride * height],
                dtype=np.uint8).reshape(height, and_stride)
            mbits = np.unpackbits(mrows, axis=1)[:, :w][::-1]
            alpha = np.where(mbits == 0, 255, 0).astype(np.uint8)
        else:
            alpha = np.full((height, w), 255, dtype=np.uint8)

    return (np.dstack([rgb, alpha]).astype(np.uint8, copy=False).copy(),
            "RGBA")


def _best_entry(payload: bytes) -> tuple[int, int, int, int, int, int]:
    """Validated ICONDIR walk → the entry every icon consumer picks:
    largest pixel area, ties broken by declared bit depth.  Returns
    ``(off, size, w, h, bitcount, n_entries)``; raises ValueError when
    no directory entry points at an in-bounds payload span."""
    if not is_ico(payload):
        raise ValueError("not an ICO file")
    (count,) = struct.unpack("<H", payload[4:6])
    if 6 + 16 * count > len(payload):
        raise ValueError("ICO directory truncated")

    best = None                                 # ((area, bits), entry)
    for i in range(count):
        bw, bh, _bc, _rsv, _planes, bitcount, size, off = struct.unpack(
            "<BBBBHHII", payload[6 + 16 * i:6 + 16 * (i + 1)])
        w, h = bw or 256, bh or 256             # 0 encodes 256
        if size < 8 or off < 6 + 16 * count or off + size > len(payload):
            continue                            # skip broken entries
        key = (w * h, bitcount)
        if best is None or key > best[0]:
            best = (key, (off, size, w, h, bitcount, count))
    if best is None:
        raise ValueError("ICO has no decodable directory entry")
    return best[1]


def ico_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Header-only ``(width, height, bitcount, n_entries)`` of the
    best directory entry — no pixel decode, safe on payloads
    ``decode_ico`` refuses (the ``media_metadata`` contract)."""
    _off, _size, w, h, bitcount, count = _best_entry(payload)
    return w, h, bitcount, count


def decode_ico(payload: bytes) -> tuple[np.ndarray, str]:
    """ICO bytes → best image's ``((h, w, c) uint8 pixels, mode)``.

    PNG entries return whatever ``decode_png`` returns; DIB entries
    return RGBA (AND-mask or alpha-channel transparency).
    """
    from .png_codec import PNG_SIG, decode_png

    off, size, _w, _h, _bits, _count = _best_entry(payload)
    sub = payload[off:off + size]
    if sub.startswith(PNG_SIG):
        px, mode = decode_png(sub)
        return (px[:, :, None] if px.ndim == 2 else px), mode
    return _decode_dib_entry(sub)


def encode_ico(pixels: np.ndarray) -> bytes:
    """``(h, w, 3|4)`` uint8 RGB(A) → single-entry 32-bit DIB ICO
    bytes (the test twin; h/w must be <= 256)."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4) or 0 in arr.shape[:2]:
        raise ValueError(f"need non-empty (h, w, 3|4) pixels, "
                         f"got {arr.shape}")
    h, w = arr.shape[:2]
    if h > 256 or w > 256:
        raise ValueError("ICO images cap at 256x256")
    rgba = arr if arr.shape[2] == 4 else np.dstack(
        [arr, np.full((h, w), 255, dtype=np.uint8)])
    bgra = rgba[::-1][:, :, [2, 1, 0, 3]]       # bottom-up BGRA
    xor = bgra.reshape(h, w * 4)                # 4-byte px: no padding
    and_stride = ((w + 7) // 8 + 3) & ~3
    mask = np.zeros((h, and_stride), dtype=np.uint8)    # all-opaque
    dib = (struct.pack("<IiihHIIiiII", 40, w, 2 * h, 1, 32, 0,
                       xor.nbytes + mask.nbytes, 0, 0, 0, 0)
           + xor.tobytes() + mask.tobytes())
    entry = struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32,
                        len(dib), 6 + 16)
    return ICO_SIG + struct.pack("<H", 1) + entry + dib
