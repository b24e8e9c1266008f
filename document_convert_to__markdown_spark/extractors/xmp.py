"""XMP metadata — the rights/licensing provenance carrier.

EXIF answers *what device made this*; XMP (ISO 16684-1, the Adobe
XMP spec) answers *who owns it and under what license* — the fields
a training-data licensing audit actually keys on:

- ``dc:creator`` (rdf:Seq of authors — first entry surfaced),
- ``dc:rights`` (rdf:Alt rights statement),
- ``dc:title`` (rdf:Alt),
- ``xmp:CreateDate`` (ISO-8601 claim, surfaced verbatim like the
  page-metadata published-time — no lossy date parse),
- ``xmpRights:Marked`` (the explicit is-this-rights-managed flag),
- ``xmpRights:WebStatement`` / ``cc:license`` (license URL — the
  Creative Commons discovery chain checks both).

Carriers (``find_xmp`` walks the container, ``image_xmp`` sniffs):

- **JPEG**: APP1 whose payload starts with the null-terminated
  namespace ``http://ns.adobe.com/xap/1.0/`` (XMP Part 3 §1.1.3) —
  a *different* APP1 than EXIF's, both may be present;
- **PNG**: ``iTXt`` chunk with keyword ``XML:com.adobe.xmp``
  (Part 3 §1.1.5: compression flag 0);
- **TIFF**: tag 700 (UNDEFINED/BYTE) in the first IFD (Part 3
  §1.1.2) — read through the same ``_read_ifd`` walk as EXIF;
- **WebP**: VP8X ``XMP `` chunk (RFC 9649 §2.5.6 — fourcc has a
  trailing space, flag bit 0x04).

XMP properties legally serialize as XML *elements or attributes*
(RDF/XML abbreviation), so ``parse_xmp`` matches both forms with
anchored patterns instead of a full XML parse — packets in the wild
are frequently truncated or namespace-mangled, and the pipeline
contract is never-raise, one row per input.  Values are entity-
unescaped.  Builders author spec-valid packets/splices for fixtures
(pixel bytes untouched, like the EXIF/tag splicers).
"""

from __future__ import annotations

import re
import struct
from html import unescape
from typing import NamedTuple, Optional

from .tiff_codec import TIFF_SIGS, _read_ifd

XMP_NS = b"http://ns.adobe.com/xap/1.0/\x00"
_XMP_MAGIC = b"<x:xmpmeta"
_ITXT_KEYWORD = b"XML:com.adobe.xmp"
_TAG_XMP = 700


class XmpInfo(NamedTuple):
    creator: Optional[str]
    rights: Optional[str]
    title: Optional[str]
    create_date: Optional[str]
    marked: Optional[bool]           # xmpRights:Marked, absent → None
    license_url: Optional[str]       # WebStatement > cc:license


EMPTY_XMP = XmpInfo(None, None, None, None, None, None)


def _prop(text: str, name: str) -> Optional[str]:
    """One simple property — any of the three legal RDF shapes:
    rdf:Description attribute, element text, or the URI-valued
    ``<name rdf:resource="..."/>`` form (how CC-tagging tools emit
    ``cc:license``)."""
    m = re.search(name + r'\s*=\s*"([^"]*)"', text)
    if m is None:
        m = re.search(r"<" + name + r"[^>/]*>([^<]*)</" + name + r">",
                      text)
    if m is None:
        m = re.search(r"<" + name
                      + r'[^>]*rdf:resource\s*=\s*"([^"]*)"', text)
    if m is None:
        return None
    val = unescape(m.group(1)).strip()
    return val or None


def _array_head(text: str, name: str) -> Optional[str]:
    """First rdf:li of an rdf:Seq/Alt/Bag-valued property (the
    primary creator / default-language rights).  Minimal writers
    skip the array wrapper entirely — a child-free element's own
    text counts."""
    m = re.search(r"<" + name + r"[^>]*>(.*?)</" + name + r">",
                  text, re.DOTALL)
    if m is None:
        return _prop(text, name)     # abbreviated attribute form
    inner = m.group(1)
    li = re.search(r"<rdf:li[^>]*>([^<]*)</rdf:li>", inner)
    if li is None:
        if "<" in inner:             # wrapper present, no li text
            return None
        val = unescape(inner).strip()
        return val or None
    val = unescape(li.group(1)).strip()
    return val or None


def parse_xmp(packet: bytes) -> XmpInfo:
    """An XMP packet (the ``<x:xmpmeta>`` XML) → ``XmpInfo``.
    Never raises; absent/garbled fields are None."""
    try:
        text = packet.decode("utf-8", errors="replace")
    except Exception:
        return EMPTY_XMP
    if "xmpmeta" not in text and "rdf:RDF" not in text:
        return EMPTY_XMP
    try:
        marked_raw = _prop(text, "xmpRights:Marked")
        marked = None
        if marked_raw is not None:
            low = marked_raw.lower()
            marked = True if low == "true" else \
                False if low == "false" else None
        return XmpInfo(
            creator=_array_head(text, "dc:creator"),
            rights=_array_head(text, "dc:rights"),
            title=_array_head(text, "dc:title"),
            create_date=_prop(text, "xmp:CreateDate"),
            marked=marked,
            license_url=(_prop(text, "xmpRights:WebStatement")
                         or _prop(text, "cc:license")),
        )
    except Exception:
        return EMPTY_XMP


def find_xmp(payload: bytes) -> Optional[bytes]:
    """Locate the raw XMP packet in a JPEG/PNG/TIFF/WebP container
    (or None).  Never raises."""
    try:
        if payload[:2] == b"\xff\xd8":
            return _jpeg_xmp(payload)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _png_xmp(payload)
        if payload[:4] in TIFF_SIGS:
            return _tiff_xmp(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            return _webp_xmp(payload)
    except Exception:
        pass
    return None


def _jpeg_xmp(payload: bytes) -> Optional[bytes]:
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1                   # fill bytes, same as jpeg_exif
            continue
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x00, 0x01) or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        if marker in (0xDA, 0xD9):
            return None
        (seg_len,) = struct.unpack(">H", payload[i + 2:i + 4])
        if seg_len < 2:
            return None
        body = payload[i + 4:i + 2 + seg_len]
        if marker == 0xE1 and body.startswith(XMP_NS):
            return body[len(XMP_NS):]
        i += 2 + seg_len
    return None


def _png_xmp(payload: bytes) -> Optional[bytes]:
    pos, n = 8, len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if ctype == b"iTXt" and len(body) == length \
                and body.startswith(_ITXT_KEYWORD + b"\x00"):
            # keyword NUL compflag compmethod NUL lang NUL xlat NUL
            rest = body[len(_ITXT_KEYWORD) + 1:]
            if len(rest) >= 2 and rest[0] == 0:   # uncompressed only
                after = rest[2:]
                cut = after.find(b"\x00")
                if cut >= 0:
                    after = after[cut + 1:]
                    cut2 = after.find(b"\x00")
                    if cut2 >= 0:
                        return after[cut2 + 1:]
            return None
        if ctype == b"IEND":
            return None
        pos += 12 + length
    return None


def _tiff_xmp(payload: bytes) -> Optional[bytes]:
    order = "<" if payload[:2] == b"II" else ">"
    try:
        tags = _read_ifd(payload, order)
    except (ValueError, struct.error):
        return None
    raw = tags.get(_TAG_XMP)
    if isinstance(raw, (bytes, bytearray)):      # mistyped as ASCII
        return bytes(raw)
    if isinstance(raw, list) and raw:            # UNDEFINED/BYTE ints
        return bytes(v & 0xFF for v in raw)
    return None


def _webp_xmp(payload: bytes) -> Optional[bytes]:
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"XMP " and len(body) == length:
            return body
        pos += 8 + length + (length & 1)
    return None


def image_xmp(payload: bytes) -> XmpInfo:
    """Format-sniffing front door: carrier walk + packet parse.
    Anything without a packet → ``EMPTY_XMP``."""
    packet = find_xmp(payload)
    return parse_xmp(packet) if packet is not None else EMPTY_XMP


# ------------------------------------------------------------ builders

def build_xmp_packet(creator: str | None = None,
                     rights: str | None = None,
                     title: str | None = None,
                     create_date: str | None = None,
                     marked: bool | None = None,
                     license_url: str | None = None,
                     attribute_form: bool = False) -> bytes:
    """A spec-valid ``<x:xmpmeta>`` packet.  ``attribute_form``
    serializes the simple properties as rdf:Description attributes
    (the RDF/XML abbreviation real writers emit) instead of child
    elements — both shapes must parse identically."""
    from html import escape

    attrs = [
        'rdf:about=""',
        'xmlns:dc="http://purl.org/dc/elements/1.1/"',
        'xmlns:xmp="http://ns.adobe.com/xap/1.0/"',
        'xmlns:xmpRights="http://ns.adobe.com/xap/1.0/rights/"',
        'xmlns:cc="http://creativecommons.org/ns#"',
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"',
    ]
    simple = []
    if create_date is not None:
        simple.append(("xmp:CreateDate", create_date))
    if marked is not None:
        simple.append(("xmpRights:Marked",
                       "True" if marked else "False"))
    if license_url is not None:
        simple.append(("xmpRights:WebStatement", license_url))
    body = []
    if attribute_form:
        attrs += [f'{k}="{escape(v, quote=True)}"' for k, v in simple]
    else:
        body += [f"<{k}>{escape(v)}</{k}>" for k, v in simple]
    for name, kind, val in (("dc:creator", "Seq", creator),
                            ("dc:rights", "Alt", rights),
                            ("dc:title", "Alt", title)):
        if val is not None:
            li = (f'<rdf:li xml:lang="x-default">{escape(val)}</rdf:li>'
                  if kind == "Alt" else f"<rdf:li>{escape(val)}</rdf:li>")
            body.append(f"<{name}><rdf:{kind}>{li}</rdf:{kind}>"
                        f"</{name}>")
    xml = ('<?xpacket begin="﻿" '
           'id="W5M0MpCehiHzreSzNTczkc9d"?>\n'
           '<x:xmpmeta xmlns:x="adobe:ns:meta/">\n<rdf:RDF '
           'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
           "\n<rdf:Description " + " ".join(attrs)
           + (">" + "".join(body) + "</rdf:Description>"
              if body else "/>")
           + "\n</rdf:RDF>\n</x:xmpmeta>\n"
           '<?xpacket end="w"?>')
    return xml.encode("utf-8")


def splice_jpeg_xmp(jpeg: bytes, **kw) -> bytes:
    """Insert the XMP APP1 right after SOI — or after an EXIF APP1
    already sitting there, keeping the camera-style EXIF-first
    ordering strict readers expect."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    cut = 2
    if jpeg[2:4] == b"\xff\xe1" and len(jpeg) >= 10 \
            and jpeg[6:12] == b"Exif\x00\x00":
        (seg_len,) = struct.unpack(">H", jpeg[4:6])
        if seg_len >= 2 and 4 + seg_len <= len(jpeg):
            cut = 4 + seg_len
    payload = XMP_NS + build_xmp_packet(**kw)
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:cut] + seg + jpeg[cut:]


def png_add_xmp(png: bytes, **kw) -> bytes:
    """Insert the ``iTXt``/``XML:com.adobe.xmp`` chunk after IHDR."""
    import zlib as _zlib
    if png[:8] != b"\x89PNG\r\n\x1a\n" or png[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    (ihdr_len,) = struct.unpack(">I", png[8:12])
    cut = 8 + 12 + ihdr_len
    body = (_ITXT_KEYWORD + b"\x00" + b"\x00\x00" + b"\x00" + b"\x00"
            + build_xmp_packet(**kw))
    chunk = struct.pack(">I", len(body)) + b"iTXt" + body
    chunk += struct.pack(">I", _zlib.crc32(b"iTXt" + body))
    return png[:cut] + chunk + png[cut:]


def webp_add_xmp(webp: bytes, **kw) -> bytes:
    """Append the ``XMP `` chunk (VP8X flag 0x04) via the shared
    VP8X-upgrade splice in ``exif.py``."""
    from .exif import webp_splice_chunk

    return webp_splice_chunk(webp, b"XMP ", build_xmp_packet(**kw),
                             0x04)
