"""EXIF metadata + orientation — pure stdlib ``struct`` + numpy.

Real crawl images carry EXIF (CIPA DC-008 / JEITA CP-3451, whose tag
structure IS the TIFF 6.0 IFD grammar): JPEGs in an APP1 segment
whose payload is ``Exif\\0\\0`` + a complete little- or big-endian
TIFF header/IFD block (offsets relative to that block), TIFFs in the
first IFD itself, PNGs in the third-edition ``eXIf`` chunk (raw TIFF
block), and WebPs in the VP8X container's ``EXIF`` chunk (raw block,
though some writers keep the JPEG-style ``Exif\\0\\0`` prefix —
both accepted).  Two behaviors matter to a training-data pipeline:

- **Orientation (tag 274)**: cameras store sensor-native pixels and a
  1-8 code telling viewers how to transform for display.  A pipeline
  that ignores it sees a rotated photo and its upright twin as
  different images — dHash is not rotation-invariant — so near-dup
  recall silently drops on mobile-heavy crawls.  ``apply_orientation``
  implements the eight transforms (numpy views, no copies until the
  final ascontiguousarray); ``media_resize`` / ``image_dhash`` take an
  ``orient=True`` opt-in that normalizes before hashing.
- **GPS presence (tag 34853, the GPS-IFD pointer)**: location EXIF is
  PII; ``has_gps`` gives the scrub/audit layer a cheap flag without
  parsing coordinates.

``parse_exif`` additionally surfaces Make (271) / Model (272) /
DateTime (306) — the provenance triple dedup and licensing audits ask
for.  Parsing is header-only (no pixel decode), malformed blocks
return the empty result rather than raising: the pipeline contract is
one output row per input row.

Orientation semantics follow the EXIF spec's row/column definitions
(value = where row 0 / column 0 of stored pixels sits in the scene):

====  ===========================================  ==================
code  stored->display transform                    numpy
====  ===========================================  ==================
1     identity                                     px
2     mirror horizontal                            fliplr
3     rotate 180                                   rot90 k=2
4     mirror vertical                              flipud
5     transpose (main diagonal)                    swapaxes(0, 1)
6     rotate 90 CW                                 rot90 k=-1
7     transverse (anti-diagonal)                   rot90 k=-1 + flipud
8     rotate 90 CCW                                rot90 k=1
====  ===========================================  ==================

Codes 1-4 are cross-validated against libtiff's
``TIFFReadRGBAImageOriented`` (which normalizes flips but only
approximates the transposed codes 5-8 — see tif_getimage.c's
setorientation warning); 5-8 are pinned by inverse round-trip plus
the spec table above.
"""

from __future__ import annotations

import struct
from typing import NamedTuple, Optional

import numpy as np

from .tiff_codec import TIFF_SIGS, _read_ifd

EXIF_HEADER = b"Exif\x00\x00"

_TAG_MAKE = 271
_TAG_MODEL = 272
_TAG_ORIENTATION = 274
_TAG_DATETIME = 306
_TAG_GPS_IFD = 34853


class ExifInfo(NamedTuple):
    orientation: int                 # 1..8 (1 when absent/invalid)
    make: Optional[str]
    model: Optional[str]
    datetime: Optional[str]
    has_gps: bool


EMPTY_EXIF = ExifInfo(1, None, None, None, False)


def _ascii_tag(tags: dict, tag: int) -> Optional[str]:
    """ASCII entry (raw bytes from ``_read_ifd``) → stripped str."""
    raw = tags.get(tag)
    if not isinstance(raw, (bytes, bytearray)):
        return None                  # absent, or mistyped as integer
    try:
        return raw.split(b"\0", 1)[0].decode("ascii").strip() or None
    except UnicodeDecodeError:
        return None


def parse_exif(block: bytes) -> ExifInfo:
    """A TIFF header/IFD block (what follows ``Exif\\0\\0`` in APP1,
    or a whole TIFF file) → ``ExifInfo``.  Never raises.

    One ``_read_ifd`` walk (shared with the TIFF pixel decoder)
    supplies both the integer tags and the ASCII provenance triple.
    """
    if len(block) < 8 or block[:4] not in TIFF_SIGS:
        return EMPTY_EXIF
    order = "<" if block[:2] == b"II" else ">"
    try:
        tags = _read_ifd(block, order)
    except (ValueError, struct.error):
        return EMPTY_EXIF
    orientation = tags.get(_TAG_ORIENTATION, [1])
    orientation = orientation[0] if orientation else 1
    if not isinstance(orientation, int) \
            or orientation not in range(1, 9):
        orientation = 1
    has_gps = bool(tags.get(_TAG_GPS_IFD))
    return ExifInfo(orientation, _ascii_tag(tags, _TAG_MAKE),
                    _ascii_tag(tags, _TAG_MODEL),
                    _ascii_tag(tags, _TAG_DATETIME), has_gps)


def jpeg_exif(payload: bytes) -> ExifInfo:
    """Walk JPEG segments to the first APP1/Exif and parse it.
    Stops at SOS (entropy data follows — EXIF precedes it by spec).
    Never raises."""
    if payload[:2] != b"\xff\xd8":
        return EMPTY_EXIF
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1       # tolerate fill bytes / garbage between
            continue     # markers, same as decode_jpeg (T.81 B.1.1.2)
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1       # fill byte: the next 0xFF may be the marker
            continue
        if marker in (0x00, 0x01) or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        if marker in (0xDA, 0xD9):              # SOS / EOI
            return EMPTY_EXIF
        (seg_len,) = struct.unpack(">H", payload[i + 2:i + 4])
        if seg_len < 2:
            return EMPTY_EXIF
        if marker == 0xE1 and payload[i + 4:i + 10] == EXIF_HEADER:
            return parse_exif(payload[i + 10:i + 2 + seg_len])
        i += 2 + seg_len
    return EMPTY_EXIF


def png_exif(payload: bytes) -> ExifInfo:
    """PNG chunk walk → the ``eXIf`` chunk (PNG 3rd ed. §11.3.6.4;
    its payload is a raw TIFF block).  Never raises."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return EMPTY_EXIF
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        try:
            (length,) = struct.unpack(">I", payload[pos:pos + 4])
        except struct.error:
            return EMPTY_EXIF
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if ctype == b"eXIf" and len(body) == length:
            return parse_exif(body)
        if ctype == b"IEND":
            return EMPTY_EXIF
        pos += 12 + length                       # len+type+data+crc
    return EMPTY_EXIF


def webp_exif(payload: bytes) -> ExifInfo:
    """WebP RIFF walk → the ``EXIF`` chunk (RFC 9649 §2.5.5).  The
    chunk body is a raw TIFF block; the JPEG-style ``Exif\\0\\0``
    prefix some writers keep is tolerated.  Never raises."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        return EMPTY_EXIF
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        try:
            (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        except struct.error:
            return EMPTY_EXIF
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"EXIF" and len(body) == length:
            block = body[6:] if body[:6] == EXIF_HEADER else body
            return parse_exif(block)
        pos += 8 + length + (length & 1)
    return EMPTY_EXIF


def image_exif(payload: bytes) -> ExifInfo:
    """Format-sniffing front door: JPEG APP1, TIFF first-IFD, PNG
    eXIf chunk, or WebP EXIF chunk.  Other formats (GIF/BMP have no
    EXIF carrier) → EMPTY_EXIF."""
    if payload[:2] == b"\xff\xd8":
        return jpeg_exif(payload)
    if payload[:4] in TIFF_SIGS:
        return parse_exif(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return png_exif(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return webp_exif(payload)
    return EMPTY_EXIF


def apply_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Stored pixels → display pixels per the table in the module
    docstring.  Accepts (h, w) or (h, w, c); returns a contiguous
    array (callers feed Arrow/tobytes)."""
    o = orientation
    if o == 2:
        px = px[:, ::-1]
    elif o == 3:
        px = px[::-1, ::-1]
    elif o == 4:
        px = px[::-1]
    elif o == 5:
        px = px.swapaxes(0, 1)
    elif o == 6:
        px = np.rot90(px, -1)
    elif o == 7:
        px = np.rot90(px, -1)[::-1]
    elif o == 8:
        px = np.rot90(px, 1)
    return np.ascontiguousarray(px)


def invert_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Display pixels → stored pixels (the authoring direction for
    fixtures: store ``invert_orientation(img, o)`` with tag ``o`` and
    an orientation-aware decode must recover ``img``).  5/7 are
    self-inverse like the flips; 6 and 8 swap."""
    inverse = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    return apply_orientation(px, inverse[orientation])


def build_exif_block(orientation: int = 1, make: str | None = None,
                     model: str | None = None,
                     datetime: str | None = None,
                     gps: bool = False) -> bytes:
    """A bare little-endian TIFF/EXIF block — the payload every
    container wraps (APP1 after ``Exif\\0\\0``, PNG ``eXIf``, WebP
    ``EXIF``): single IFD, inline or appended ASCII values, optional
    minimal GPS IFD (version tag only) so ``has_gps`` has a true
    case."""
    if orientation not in range(1, 9):
        raise ValueError(f"bad orientation {orientation}")
    entries: list[tuple[int, int, int, bytes | int]] = [
        (_TAG_ORIENTATION, 3, 1, orientation)]
    blobs: list[bytes] = []
    for tag, val in ((_TAG_MAKE, make), (_TAG_MODEL, model),
                     (_TAG_DATETIME, datetime)):
        if val is not None:
            raw = val.encode("ascii") + b"\0"
            entries.append((tag, 2, len(raw), raw))
    if gps:
        entries.append((_TAG_GPS_IFD, 4, 1, -1))  # offset patched below
    entries.sort(key=lambda e: e[0])
    ifd_size = 2 + 12 * len(entries) + 4
    pos = 8 + ifd_size
    fixed: list[tuple[int, int, int, int | bytes]] = []
    for tag, vt, count, val in entries:
        if isinstance(val, bytes) and count > 4:
            fixed.append((tag, vt, count, pos))
            blobs.append(val + b"\0" * (len(val) & 1))
            pos += len(val) + (len(val) & 1)
        else:
            fixed.append((tag, vt, count, val))
    gps_off = pos
    block = bytearray(b"II*\x00" + struct.pack("<I", 8))
    block += struct.pack("<H", len(fixed))
    for tag, vt, count, val in fixed:
        block += struct.pack("<HHI", tag, vt, count)
        if isinstance(val, bytes):
            block += val.ljust(4, b"\0")
        elif tag == _TAG_GPS_IFD:
            block += struct.pack("<I", gps_off)
        elif vt == 3:
            block += struct.pack("<HH", val, 0)
        else:
            block += struct.pack("<I", val)
    block += struct.pack("<I", 0)
    for b in blobs:
        block += b
    if gps:
        # minimal GPS IFD: GPSVersionID (tag 0, BYTE x4, inline)
        block += struct.pack("<H", 1)
        block += struct.pack("<HHI", 0, 1, 4) + bytes((2, 3, 0, 0))
        block += struct.pack("<I", 0)
    return bytes(block)


def build_exif_app1(**kw) -> bytes:
    """A complete JPEG APP1 segment (marker + length + Exif block) —
    the fixture twin of ``jpeg_exif``."""
    payload = EXIF_HEADER + build_exif_block(**kw)
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def png_add_exif(png: bytes, **kw) -> bytes:
    """Insert an ``eXIf`` chunk right after IHDR (the 3rd-edition
    placement rule: before IDAT) — no pixel re-encode."""
    import zlib as _zlib
    if png[:8] != b"\x89PNG\r\n\x1a\n" or png[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    (ihdr_len,) = struct.unpack(">I", png[8:12])
    cut = 8 + 12 + ihdr_len                      # end of IHDR chunk
    body = build_exif_block(**kw)
    chunk = struct.pack(">I", len(body)) + b"eXIf" + body
    chunk += struct.pack(">I", _zlib.crc32(b"eXIf" + body))
    return png[:cut] + chunk + png[cut:]


def webp_splice_chunk(webp: bytes, fourcc: bytes, body: bytes,
                      flag_bit: int) -> bytes:
    """Append a metadata chunk to a WebP, setting its VP8X feature
    flag — upgrading a simple VP8L file to the VP8X extended
    container (canvas dims read from the VP8L stream header) when
    needed.  No pixel re-encode.  Shared by the EXIF (flag 0x08) and
    XMP (flag 0x04) splicers."""
    if len(webp) < 12 or webp[:4] != b"RIFF" or webp[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    chunk = fourcc + struct.pack("<I", len(body)) + body
    chunk += b"\0" * (len(body) & 1)
    chunks = webp[12:]
    if chunks[:4] == b"VP8X":
        flags = chunks[8] | flag_bit
        chunks = chunks[:8] + bytes((flags,)) + chunks[9:]
        out_body = chunks + chunk
    elif chunks[:4] == b"VP8L":
        vp8l = chunks[8:]
        if not vp8l or vp8l[0] != 0x2F or len(vp8l) < 5:
            raise ValueError("bad VP8L stream header")
        bits = int.from_bytes(vp8l[1:5], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        vp8x = (bytes([flag_bit, 0, 0, 0])
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little"))
        vp8x_chunk = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
        out_body = vp8x_chunk + chunks + chunk
    else:
        raise ValueError(
            f"unsupported WebP layout for {fourcc!r} insert")
    return (b"RIFF" + struct.pack("<I", len(out_body) + 4)
            + b"WEBP" + out_body)


def webp_add_exif(webp: bytes, **kw) -> bytes:
    """Append an ``EXIF`` chunk (VP8X flag 0x08) — no pixel
    re-encode."""
    return webp_splice_chunk(webp, b"EXIF", build_exif_block(**kw),
                             0x08)


def splice_jpeg_exif(jpeg: bytes, **kw) -> bytes:
    """Insert an EXIF APP1 right after SOI — no re-encode, valid per
    T.81 (tables/misc segments may precede SOF)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + build_exif_app1(**kw) + jpeg[2:]
