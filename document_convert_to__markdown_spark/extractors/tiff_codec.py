"""From-scratch TIFF decode/encode — stdlib ``struct``/``zlib`` + numpy.

Sixth member of the codec family: TIFF 6.0 images at the compressions
real archives carry — ``Compression=1`` (none), ``5`` (LZW, TIFF
§13: MSB-first variable-width 9→12-bit codes with the TIFF
"early change" width bump, Clear/EOI), ``8``/``32946`` (zlib
deflate), and ``32773`` (PackBits byte RLE, §9) — optionally behind
``Predictor=2`` horizontal differencing (§14, undone per row per
sample channel).  JPEG-in-TIFF and other exotic compressions raise
``UnsupportedTiff`` and take the labeled stub, like every other
out-of-subset payload.

- ``decode_tiff``: II/MM byte orders, first IFD, 8-bit grayscale
  (Photometric 0/1, including the 0=WhiteIsZero inversion) and 8-bit
  RGB/RGBA (ExtraSamples alpha kept), multi-strip assembly via
  StripOffsets/StripByteCounts/RowsPerStrip with per-strip
  decompression.  Planar, tiled, palette, and non-8-bit depths are
  refused explicitly.  Malformed input raises ``ValueError`` and
  nothing else (the multimodal kernels' stub fallback catches
  ValueError only).
- ``encode_tiff``: ``(h, w)`` gray or ``(h, w, 3)`` RGB array →
  single-strip little-endian TIFF at any supported compression, with
  optional predictor — the test twin, so every decoder path
  roundtrips without an external TIFF to import.

Cross-validated against the system libtiff (``tests/
test_libtiff_libgif_parity.py``, test-time oracle only): every
``encode_tiff`` compression × predictor variant decodes pixel-exactly
in both this decoder and ``TIFFReadRGBAImage``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

TIFF_SIGS = (b"II*\x00", b"MM\x00*")


class UnsupportedTiff(ValueError):
    """Valid TIFF outside the baseline-uncompressed subset."""


def _read_ifd(payload: bytes, order: str) -> dict[int, list[int]]:
    """First IFD → {tag: [values]} with offset-indirection resolved."""
    (ifd_off,) = struct.unpack(order + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD offset")
    (n_entries,) = struct.unpack(
        order + "H", payload[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4}        # BYTE ASCII SHORT LONG
    type_fmt = {1: "B", 3: "H", 4: "I"}
    pos = ifd_off + 2
    for _ in range(n_entries):
        if pos + 12 > len(payload):
            raise ValueError("truncated TIFF IFD entry")
        tag, vtype, count = struct.unpack(
            order + "HHI", payload[pos:pos + 8])
        if vtype in type_fmt and count and count < 1 << 20:
            total = type_size[vtype] * count
            if total <= 4:
                src = payload[pos + 8:pos + 8 + total]
            else:
                (off,) = struct.unpack(
                    order + "I", payload[pos + 8:pos + 12])
                src = payload[off:off + total]
            if len(src) == total:
                tags[tag] = list(struct.unpack(
                    order + type_fmt[vtype] * count, src))
        pos += 12
    return tags


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first bit packing, 9→12-bit codes, the
    TIFF *early change* convention (width bumps when the next code to
    assign is 2^w - 1 — one code earlier than GIF's LZW)."""
    out = bytearray()
    nbits = len(data) * 8
    bitpos = 0
    width = 9
    table: list[bytes] | None = None
    prev: bytes | None = None
    while bitpos + width <= nbits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0:byte0 + 4].ljust(4, b"\0"),
                               "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _LZW_EOI:
            return bytes(out)
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if table is None:
            raise ValueError("TIFF LZW stream must start with Clear")
        if prev is None:
            if code > 255:
                raise ValueError("bad first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):                # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        if len(out) > max_out:
            raise ValueError("TIFF LZW output exceeds declared size")
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1                          # early change
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """The §13 encoder twin (early-change width bumps, Clear on a
    full table) so the decoder roundtrips on arbitrary strips."""
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
        acc &= (1 << nacc) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_LZW_CLEAR, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # the decoder's table lags this one by a single entry (its
        # first post-Clear code adds nothing), so its slot-(2^w - 1)
        # early-change bump lines up with next_code == 2^w here
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == 4094:                 # table full: restart
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    """TIFF §9 PackBits byte RLE."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < max_out:
        c = data[i]
        i += 1
        if c < 128:                             # literal run of c+1
            if i + c + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:                           # repeat next byte 257-c
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: noop
    if len(out) > max_out:
        raise ValueError("PackBits output exceeds declared size")
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """§9 encoder twin: repeat runs >= 3 bytes, literals otherwise."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            nxt = 1
            while i + nxt < n and nxt < 3 and data[i + nxt] == data[i]:
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _inflate_capped(data: bytes, max_out: int) -> bytes:
    d = zlib.decompressobj()
    raw = d.decompress(data, max_out)
    while len(raw) < max_out and d.unconsumed_tail:
        raw += d.decompress(d.unconsumed_tail, max_out - len(raw))
    return raw


def decode_tiff(payload: bytes) -> tuple[np.ndarray, str]:
    """TIFF bytes → ``((h, w) gray | (h, w, 3|4) RGB(A) uint8, mode)``."""
    if len(payload) < 8 or payload[:4] not in TIFF_SIGS:
        raise ValueError("not a TIFF (bad signature)")
    order = "<" if payload[:2] == b"II" else ">"
    t = _read_ifd(payload, order)

    def one(tag: int, default: int | None = None) -> int:
        v = t.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    if width <= 0 or height <= 0 or width * height > 1 << 28:
        raise ValueError("bad TIFF dimensions")
    comp = one(259, 1)
    if comp not in (1, 5, 8, 32946, 32773):
        raise UnsupportedTiff(f"TIFF compression {comp} unsupported")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise UnsupportedTiff(f"TIFF predictor {predictor} unsupported")
    photometric = one(262, 1)
    spp = one(277, 1)
    if one(284, 1) != 1:
        raise UnsupportedTiff("planar TIFF not supported")
    if 322 in t or 323 in t:
        raise UnsupportedTiff("tiled TIFF not supported")
    bits = t.get(258, [8])
    if any(b != 8 for b in bits):
        raise UnsupportedTiff(f"TIFF bit depths {bits} (only 8)")
    if photometric in (0, 1):
        if spp != 1:
            raise UnsupportedTiff("gray TIFF with extra samples")
        mode = "L"
    elif photometric == 2:
        if spp not in (3, 4):
            raise UnsupportedTiff(f"RGB TIFF with {spp} samples")
        mode = "RGB" if spp == 3 else "RGBA"
    else:
        raise UnsupportedTiff(f"TIFF photometric {photometric}")

    offsets = t.get(273)
    counts = t.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offsets/counts")
    rows_per_strip = one(278, height)
    if rows_per_strip <= 0:
        raise ValueError("bad TIFF RowsPerStrip")
    need = width * height * spp
    parts = []
    got = 0
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(payload):
            raise ValueError("TIFF strip beyond file")
        strip_rows = min(rows_per_strip, height - s * rows_per_strip)
        if strip_rows <= 0:
            break
        strip_need = strip_rows * width * spp
        chunk = payload[off:off + cnt]
        if comp == 1:
            dec = chunk[:strip_need]
        elif comp == 5:
            dec = _lzw_decode(chunk, strip_need)
        elif comp == 32773:
            dec = _packbits_decode(chunk, strip_need)
        else:                                   # 8 / 32946: deflate
            try:
                dec = _inflate_capped(chunk, strip_need)
            except zlib.error as exc:
                raise ValueError(
                    f"corrupt TIFF deflate strip: {exc}") from None
        take = min(len(dec), need - got)
        parts.append(dec[:take])
        got += take
        if got >= need:
            break
    if got < need:
        raise ValueError("TIFF strip data short for declared size")
    raw = np.frombuffer(b"".join(parts), dtype=np.uint8)
    px = raw.reshape(height, width, spp)
    if predictor == 2:
        # §14 horizontal differencing: undo via cumulative sum per
        # row per sample channel, mod 256
        px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)
    if photometric == 0:                        # WhiteIsZero: invert
        px = 255 - px
    return (px[:, :, 0] if spp == 1 else px).copy(), mode


_COMP_CODES = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def encode_tiff(pixels: np.ndarray, compression: str = "none",
                predictor: bool = False) -> bytes:
    """``(h, w)`` gray or ``(h, w, 3)`` RGB → single-strip TIFF bytes.

    ``compression``: none | lzw | deflate | packbits.  ``predictor``
    applies §14 horizontal differencing before compression (valid for
    lzw/deflate per the spec; refused otherwise).
    """
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        spp, photometric = 1, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        spp, photometric = 3, 2
    else:
        raise ValueError(f"need (h, w) gray or (h, w, 3) RGB, "
                         f"got {arr.shape}")
    if compression not in _COMP_CODES:
        raise ValueError(f"compression {compression!r} unsupported")
    if predictor and compression not in ("lzw", "deflate"):
        raise ValueError("predictor requires lzw or deflate")
    h, w = arr.shape[0], arr.shape[1]
    if h == 0 or w == 0:
        raise ValueError("need non-empty pixel array")
    samp = arr.reshape(h, w, spp)
    if predictor:
        # forward differencing per row per channel (mod 256)
        d = samp.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        samp = (d & 0xFF).astype(np.uint8)
    raw = samp.tobytes()
    if compression == "none":
        data = raw
    elif compression == "lzw":
        data = _lzw_encode(raw)
    elif compression == "packbits":
        data = _packbits_encode(raw)
    else:
        data = zlib.compress(raw)

    entries = [
        (256, 3, 1, w), (257, 3, 1, h),
        # BitsPerSample: inline for gray; offset for RGB (3 shorts)
        (259, 3, 1, _COMP_CODES[compression]), (262, 3, 1, photometric),
        (277, 3, 1, spp), (278, 3, 1, h),
        (279, 4, 1, len(data)),
    ]
    if predictor:
        entries.append((317, 3, 1, 2))
    header = 8
    ifd_off = header
    n = len(entries) + 2                        # + BitsPerSample + 273
    bps_extra = b""
    ifd_size = 2 + 12 * n + 4
    extra_off = ifd_off + ifd_size
    if spp == 3:
        bps_extra = struct.pack("<HHH", 8, 8, 8)
        entries.append((258, 3, 3, extra_off))
    else:
        entries.append((258, 3, 1, 8))
    data_off = extra_off + len(bps_extra)
    entries.append((273, 4, 1, data_off))
    entries.sort()

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n)
    for tag, vtype, count, val in entries:
        out += struct.pack("<HHI", tag, vtype, count)
        # LONG values and >4-byte payloads (the RGB BitsPerSample
        # offset) write the full 32-bit field; inline SHORTs pad
        out += struct.pack("<I", val) if vtype == 4 or count > 2 \
            else struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)                 # next-IFD pointer
    out += bps_extra
    out += data
    return bytes(out)
