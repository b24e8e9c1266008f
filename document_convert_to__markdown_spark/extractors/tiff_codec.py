"""From-scratch baseline-TIFF decode/encode — stdlib ``struct`` + numpy.

Sixth member of the codec family: TIFF 6.0 "baseline" images with
``Compression=1`` (none) are IFD bookkeeping plus raw strip bytes — no
entropy coder — so the dominant uncompressed-archive image format
joins PNG/GIF/BMP on the real-pixel path.  LZW/JPEG/deflate TIFFs
raise ``UnsupportedTiff`` and take the labeled stub, like every other
out-of-subset payload.

- ``decode_tiff``: II/MM byte orders, first IFD, 8-bit grayscale
  (Photometric 0/1, including the 0=WhiteIsZero inversion) and 8-bit
  RGB/RGBA (ExtraSamples alpha kept), multi-strip assembly via
  StripOffsets/StripByteCounts/RowsPerStrip.  Planar, tiled, palette,
  and non-8-bit depths are refused explicitly.  Malformed input
  raises ``ValueError`` and nothing else (the multimodal kernels'
  stub fallback catches ValueError only).
- ``encode_tiff``: ``(h, w)`` gray or ``(h, w, 3)`` RGB array →
  single-strip little-endian baseline TIFF (the test twin).
"""

from __future__ import annotations

import struct

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
    if comp != 1:
        raise UnsupportedTiff(f"TIFF compression {comp} not baseline-none")
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
    need = width * height * spp
    parts = []
    got = 0
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            raise ValueError("TIFF strip beyond file")
        take = min(cnt, need - got)
        parts.append(payload[off:off + take])
        got += take
        if got >= need:
            break
    if got < need:
        raise ValueError("TIFF strip data short for declared size")
    if rows_per_strip <= 0:
        raise ValueError("bad TIFF RowsPerStrip")
    raw = np.frombuffer(b"".join(parts), dtype=np.uint8)
    px = raw.reshape(height, width, spp)
    if photometric == 0:                        # WhiteIsZero: invert
        px = 255 - px
    return (px[:, :, 0] if spp == 1 else px).copy(), mode


def encode_tiff(pixels: np.ndarray) -> bytes:
    """``(h, w)`` gray or ``(h, w, 3)`` RGB → baseline TIFF bytes."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        spp, photometric = 1, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        spp, photometric = 3, 2
    else:
        raise ValueError(f"need (h, w) gray or (h, w, 3) RGB, "
                         f"got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    if h == 0 or w == 0:
        raise ValueError("need non-empty pixel array")
    data = arr.tobytes()

    entries = [
        (256, 3, 1, w), (257, 3, 1, h),
        # BitsPerSample: inline for gray; offset for RGB (3 shorts)
        (259, 3, 1, 1), (262, 3, 1, photometric),
        (277, 3, 1, spp), (278, 3, 1, h),
        (279, 4, 1, len(data)),
    ]
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
