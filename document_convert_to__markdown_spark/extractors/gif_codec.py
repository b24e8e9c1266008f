"""From-scratch GIF decode/encode — stdlib + numpy only.

Companion to ``png_codec.py``: PNG needed only DEFLATE (stdlib zlib),
and GIF needs only LZW — a dictionary coder simple enough to implement
directly, unlike JPEG's DCT entropy pipeline.  With this module the
multimodal kernels process REAL pixels for the two dominant lossless
web image formats; JPEG remains the labeled stub.

Implements the subset of GIF87a/GIF89a (W3C/CompuServe spec) a
training-data pipeline meets:

- ``decode_gif``: logical screen descriptor, global/local color
  tables, variable-code-size LZW with deferred-clear handling,
  interlaced (4-pass) and non-interlaced frames, GCE transparency
  (transparent index → alpha channel).  Animated GIFs decode their
  FIRST frame (the representative image for dedup/featurization) —
  frames after the first are not composited.
- ``encode_gif``: palette-indexed frames with a real variable-width
  LZW encoder (not the uncompressed clear-code trick), so tests can
  roundtrip arbitrary images through the actual entropy coder.

Frames smaller than the logical screen are placed at their (left, top)
offset on a canvas filled with the background color.  Malformed inputs
raise ``ValueError``; none of the paths silently guess.

Cross-validated against the system giflib (``tests/
test_libtiff_libgif_parity.py``, test-time oracle only): every
``encode_gif`` interlace × transparency variant decodes pixel-exactly
in both this decoder and ``DGifSlurp``.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")

_MAX_CODE_SIZE = 12  # LZW code width ceiling fixed by the GIF spec


class GifLzwError(ValueError):
    """Corrupt LZW stream (bad code, truncated data)."""


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF LZW → index stream (codes packed LSB-first across bytes).

    Implements the spec's variable code width: width starts at
    ``min_code_size + 1``, grows after the dictionary fills the current
    width, caps at 12 bits (a full dictionary then emits fixed-width
    codes until a CLEAR — the "deferred clear" case encoders may use).
    """
    if not 2 <= min_code_size <= 11:
        raise GifLzwError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1

    # dictionary as (prefix_code, last_byte) links; roots are implicit
    prefix = np.zeros(1 << _MAX_CODE_SIZE, dtype=np.int32)
    suffix = np.zeros(1 << _MAX_CODE_SIZE, dtype=np.uint8)

    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    pos = 0
    n = len(data)

    code_size = min_code_size + 1
    next_idx = end + 1
    prev = -1

    def entry_bytes(code: int) -> bytes:
        chain = bytearray()
        c = code
        while c >= clear:                      # walk links to the root
            chain.append(suffix[c])
            c = int(prefix[c])
        chain.append(c)
        chain.reverse()
        return bytes(chain)

    while len(out) < n_pixels:
        while bitcnt < code_size:
            if pos >= n:
                raise GifLzwError("truncated LZW stream")
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        bitcnt -= code_size

        if code == clear:
            code_size = min_code_size + 1
            next_idx = end + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:                            # first code after clear
            if code >= clear:
                raise GifLzwError("LZW stream starts with non-literal")
            out.append(code)
            prev = code
            continue
        if code < next_idx:
            seq = entry_bytes(code)
        elif code == next_idx:                  # the KwKwK case
            seq = entry_bytes(prev)
            seq += seq[:1]
        else:
            raise GifLzwError(f"LZW code {code} beyond dictionary")
        out += seq
        if next_idx < (1 << _MAX_CODE_SIZE):
            prefix[next_idx] = prev
            suffix[next_idx] = seq[0]
            next_idx += 1
            if next_idx == (1 << code_size) and code_size < _MAX_CODE_SIZE:
                code_size += 1
        prev = code
    return out


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Index stream → GIF LZW bytes (real dictionary coder)."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, size: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += size
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_idx = end + 1
    code_size = min_code_size + 1

    emit(clear, code_size)
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], code_size)
        if next_idx < (1 << _MAX_CODE_SIZE):
            table[cand] = next_idx
            # width grows when next_idx EXCEEDS the current range: the
            # decoder bumps after inserting the entry for this code,
            # so the encoder must emit the next code at the new width
            if next_idx == (1 << code_size) and code_size < _MAX_CODE_SIZE:
                code_size += 1
            next_idx += 1
        else:                                   # dictionary full: reset
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_idx = end + 1
            code_size = min_code_size + 1
        run = bytes([byte])
    if run:
        emit(table[run], code_size)
    emit(end, code_size)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(grid: np.ndarray) -> np.ndarray:
    """Reorder 4-pass interlaced rows into display order."""
    h = grid.shape[0]
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    out = np.empty_like(grid)
    out[order] = grid
    return out


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-blocks")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        parts.append(payload[pos:pos + size])
        pos += size


def _parse_gif(payload: bytes, max_frames: int):
    """Header + frame walk shared by the first-frame and animation
    decoders.  Returns ``(width, height, gct, bg_idx, frames)`` where
    each frame is ``(left, top, grid, table, transparent, disposal)``
    with ``grid`` the deinterlaced index array.  The logical-screen
    canvas allocation is capped BEFORE any frame decode: a 40-byte
    header can otherwise declare a 65535×65535 screen around a 1×1
    frame and demand a ~13 GB canvas."""
    if payload[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    width, height, packed, bg_idx, _aspect = struct.unpack(
        "<HHBBB", payload[6:13])
    if width == 0 or height == 0:
        raise ValueError("zero-dimension GIF")
    if width * height * 3 > 1 << 28:
        raise ValueError("GIF logical screen beyond 256MiB cap")
    pos = 13
    gct = None
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload[pos:pos + 3 * n_colors], dtype=np.uint8)
        if gct.size < 3 * n_colors:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(-1, 3)
        pos += 3 * n_colors

    frames = []
    transparent = -1
    disposal = 0
    n = len(payload)
    while pos < n and len(frames) < max_frames:
        block = payload[pos]
        pos += 1
        if block == 0x3B:                       # trailer
            break
        if block == 0x21:                       # extension
            if pos >= n:
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:
                disposal = (data[0] >> 2) & 0x07
                transparent = data[3] if data[0] & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")

        if pos + 9 > n:
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, fpacked = struct.unpack(
            "<HHHHB", payload[pos:pos + 9])
        pos += 9
        table = gct
        if fpacked & 0x80:
            n_colors = 2 << (fpacked & 0x07)
            table = np.frombuffer(
                payload[pos:pos + 3 * n_colors], dtype=np.uint8)
            if table.size < 3 * n_colors:
                raise ValueError("truncated GIF local color table")
            table = table.reshape(-1, 3)
            pos += 3 * n_colors
        if table is None:
            raise ValueError("GIF frame has no color table")
        if fw == 0 or fh == 0 or left + fw > width or top + fh > height:
            raise ValueError("GIF frame outside logical screen")

        if pos >= n:
            raise ValueError("truncated GIF before LZW data")
        min_code = payload[pos]
        pos += 1
        lzw, pos = _read_subblocks(payload, pos)
        idx = np.frombuffer(
            _lzw_decode(min_code, lzw, fw * fh), dtype=np.uint8)
        if idx.size < fw * fh:
            raise ValueError("GIF frame pixel data short")
        grid = idx[:fw * fh].reshape(fh, fw)
        if fpacked & 0x40:
            grid = _deinterlace(grid)
        if int(grid.max()) >= len(table):
            raise ValueError("GIF index beyond color table")
        frames.append((left, top, grid, table, transparent, disposal))
        transparent = -1                        # GCE scopes one image
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return width, height, gct, bg_idx, frames


def _gif_background(gct, bg_idx) -> np.ndarray:
    # background color resolves against the GLOBAL table (spec §18:
    # the LSD's background index refers to the GCT), never a frame's
    # local table
    return gct[bg_idx] if gct is not None and bg_idx < len(gct) \
        else np.zeros(3, dtype=np.uint8)


def decode_gif(payload: bytes) -> tuple[np.ndarray, str]:
    """GIF bytes → ``(pixels, mode)``, first frame.

    ``pixels`` is ``(h, w, 3)`` uint8 RGB, or ``(h, w, 4)`` RGBA when
    the frame's graphic-control extension declares a transparent index
    (mode ``"RGB"`` / ``"RGBA"``).  ``h × w`` is the logical screen;
    a smaller first frame sits at its offset over the background color.
    """
    width, height, gct, bg_idx, frames = _parse_gif(payload, 1)
    left, top, grid, table, transparent, _disposal = frames[0]
    fh, fw = grid.shape

    alpha_frame = None
    if transparent >= 0:
        alpha_frame = np.where(grid == transparent, 0, 255)
    rgb_frame = table[grid]

    canvas = np.broadcast_to(
        _gif_background(gct, bg_idx), (height, width, 3)).copy()
    canvas[top:top + fh, left:left + fw] = rgb_frame
    if alpha_frame is None:
        return canvas, "RGB"
    alpha = np.zeros((height, width, 1), dtype=np.uint8)
    alpha[top:top + fh, left:left + fw, 0] = alpha_frame
    return np.concatenate([canvas, alpha], axis=2), "RGBA"


def decode_gif_frames(payload: bytes,
                      max_frames: int = 256) -> list[np.ndarray]:
    """Animated GIF → list of fully-composited ``(h, w, 3)`` RGB
    canvases, one per frame, honoring per-frame graphic control:
    transparent pixels show the previous canvas content through,
    disposal 2 restores the frame rectangle to the background color,
    disposal 3 restores the pre-frame canvas (spec 89a §23).  Frame 1
    of the composite matches :func:`decode_gif`'s RGB channels by
    construction; at most ``max_frames`` frames decode."""
    width, height, gct, bg_idx, frames = _parse_gif(payload, max_frames)
    bg = _gif_background(gct, bg_idx)
    canvas = np.broadcast_to(bg, (height, width, 3)).copy()
    out = []
    for left, top, grid, table, transparent, disposal in frames:
        fh, fw = grid.shape
        saved = canvas.copy() if disposal == 3 else None
        rect = canvas[top:top + fh, left:left + fw]
        rgb = table[grid]
        if transparent >= 0:
            keep = (grid == transparent)[:, :, None]
            rgb = np.where(keep, rect, rgb)
        canvas[top:top + fh, left:left + fw] = rgb
        out.append(canvas.copy())
        if disposal == 2:
            canvas[top:top + fh, left:left + fw] = bg
        elif disposal == 3:
            canvas = saved
    return out


def encode_gif_animation(frames, palette: np.ndarray) -> bytes:
    """Multi-frame GIF89a (the animation-decoder test twin).

    ``frames`` is a list of ``(indices, left, top, disposal,
    transparent)`` tuples — ``indices`` ``(fh, fw)`` uint8 into the
    shared global ``palette`` ``(n, 3)``; ``disposal`` 0-3;
    ``transparent`` an index or None.  The logical screen is the
    bounding box of all frame rectangles.
    """
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
        raise ValueError("palette must be (1-256, 3)")
    if not frames:
        raise ValueError("need at least one frame")
    w = max(int(left) + f.shape[1] for f, left, _t, _d, _tr in frames)
    h = max(int(top) + f.shape[0] for f, _l, top, _d, _tr in frames)
    bits = max(1, (len(pal) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    for idx, left, top, disposal, transparent in frames:
        idx = np.ascontiguousarray(idx, dtype=np.uint8)
        if int(idx.max()) >= len(pal):
            raise ValueError("index beyond palette")
        flags = (int(disposal) & 0x07) << 2
        tr = 0
        if transparent is not None:
            flags |= 0x01
            tr = int(transparent)
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, flags, 4, tr, 0)
        fh, fw = idx.shape
        out += struct.pack("<BHHHHB", 0x2C, int(left), int(top), fw, fh, 0)
        min_code = max(2, bits)
        out.append(min_code)
        lzw = _lzw_encode(min_code, idx.tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False,
               transparent: int | None = None) -> bytes:
    """Palette-indexed frame → single-frame GIF89a bytes.

    ``indices`` is ``(h, w)`` uint8 into ``palette`` ``(n, 3)`` uint8
    (n ≤ 256).  Exercises the real LZW encoder; ``interlace`` writes
    the 4-pass row order, ``transparent`` adds a GCE.
    """
    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("need (h, w) indices and (n, 3) palette")
    if len(pal) < 1 or len(pal) > 256:
        raise ValueError("palette must have 1-256 entries")
    if int(idx.max()) >= len(pal):
        raise ValueError("index beyond palette")
    h, w = idx.shape

    # color table size must be a power of two >= 2
    bits = max(1, (len(pal) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    if transparent is not None:
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x01, 0,
                           transparent, 0)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0x00)
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES
                 for y in range(start, h, step)]
        body = idx[order].tobytes()
    else:
        body = idx.tobytes()
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _lzw_encode(min_code, body)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)                               # sub-block terminator
    out.append(0x3B)                            # trailer
    return bytes(out)
