"""Audio provenance tags — the audio twin of ``exif.py``.

Real crawl audio carries embedded provenance the way photos carry
EXIF: MP3s an ID3v2 header (id3.org ID3v2.3/2.4 informal standards)
and/or a 128-byte ID3v1 trailer, FLACs a VORBIS_COMMENT metadata
block (RFC 9639 §8.6, the Xiph Vorbis-comment field list), WAV/RIFF
files a LIST/INFO chunk (the Multimedia Programming Interface spec's
INAM/IART/IPRD/ICRD tags).  A training-data pipeline wants the same
normalized quadruple from all of them — title / artist / album /
date — for licensing audits, catalog dedup (same recording re-encoded
across containers), and provenance filters, plus ``tag_how`` saying
which grammar produced it.

Scope honesty: unsynchronized ID3v2 payloads are rare in web audio
and parse as absent; ID3v2.2 (the 3-byte-frame iTunes-era layout) is
supported alongside v2.3/v2.4; text encodings cover the four ID3
encoding bytes (latin-1, UTF-16 with BOM, UTF-16BE, UTF-8).  Parsing is header/trailer-only (no PCM decode),
malformed input returns the empty result — one output row per input
row, never an exception.

The authoring twins (``build_id3v2`` / ``append_id3v1`` /
``flac_add_vorbis_comment`` / ``wav_add_info``) splice tags into the
sibling codecs' outputs without re-encoding audio, so tests and
contract queries pin every grammar from our own writers.
"""

from __future__ import annotations

import struct
from typing import NamedTuple, Optional

ID3V2_FRAME_KEYS = {"TIT2": "title", "TPE1": "artist",
                    "TALB": "album", "TDRC": "date", "TYER": "date",
                    # v2.2 three-byte ids
                    "TT2": "title", "TP1": "artist", "TAL": "album",
                    "TYE": "date"}
VORBIS_KEYS = {"TITLE": "title", "ARTIST": "artist",
               "ALBUM": "album", "DATE": "date"}
RIFF_INFO_KEYS = {b"INAM": "title", b"IART": "artist",
                  b"IPRD": "album", b"ICRD": "date"}


class AudioTags(NamedTuple):
    title: Optional[str]
    artist: Optional[str]
    album: Optional[str]
    date: Optional[str]
    tag_how: str                     # id3v2 | id3v1 | vorbis | riff_info | none


EMPTY_TAGS = AudioTags(None, None, None, None, "none")


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3_text(body: bytes) -> Optional[str]:
    """ID3v2 text frame body: encoding byte + payload."""
    if not body:
        return None
    enc, payload = body[0], body[1:]
    try:
        if enc == 0:
            s = payload.decode("latin-1")
        elif enc == 1:
            s = payload.decode("utf-16")        # BOM-led
        elif enc == 2:
            s = payload.decode("utf-16-be")
        elif enc == 3:
            s = payload.decode("utf-8")
        else:
            return None
    except UnicodeDecodeError:
        return None
    return s.split("\x00", 1)[0].strip() or None


def _id3v2_frames(payload: bytes):
    """Leading ID3v2.2/2.3/2.4 header → yields ``(version, frame_id
    str, body bytes)``.  One walk shared by the text-tag reader and
    the cover-art reader.  Stops (never raises) on any malformation.
    """
    if payload[:3] != b"ID3" or len(payload) < 10:
        return
    ver = payload[3]
    flags = payload[5]
    if ver not in (2, 3, 4) or flags & 0x80:    # unsynchronized: skip
        return
    size = _syncsafe(payload[6:10])
    end = min(10 + size, len(payload))
    pos = 10
    if ver != 2 and flags & 0x40 and pos + 4 <= end:  # extended header
        ext = (_syncsafe(payload[pos:pos + 4]) if ver == 4
               else struct.unpack(">I", payload[pos:pos + 4])[0] + 4)
        pos += ext
    id_len = 3 if ver == 2 else 4               # v2.2: 3-byte frames
    hdr_len = 6 if ver == 2 else 10
    while pos + hdr_len <= end:
        fid = payload[pos:pos + id_len]
        if fid == b"\x00" * id_len:
            break                               # padding
        raw_sz = payload[pos + id_len:pos + id_len + (3 if ver == 2
                                                      else 4)]
        if ver == 2:
            fsz = int.from_bytes(raw_sz, "big")
        elif ver == 4:
            fsz = _syncsafe(raw_sz)
        else:
            fsz = struct.unpack(">I", raw_sz)[0]
        if fsz < 0 or pos + hdr_len + fsz > end:
            break
        try:
            fid_s = fid.decode("ascii")
        except UnicodeDecodeError:
            break
        yield ver, fid_s, payload[pos + hdr_len:pos + hdr_len + fsz]
        pos += hdr_len + fsz


def parse_id3v2(payload: bytes) -> AudioTags:
    """Leading ID3v2.2/2.3/2.4 header → tags.  Never raises."""
    fields: dict[str, str] = {}
    for _ver, fid, body in _id3v2_frames(payload):
        key = ID3V2_FRAME_KEYS.get(fid)
        if key and key not in fields:
            val = _id3_text(body)
            if val:
                fields[key] = val
    if not fields:
        return EMPTY_TAGS
    return AudioTags(fields.get("title"), fields.get("artist"),
                     fields.get("album"), fields.get("date"), "id3v2")


def parse_id3v1(payload: bytes) -> AudioTags:
    """Trailing 128-byte ID3v1 block → tags.  Never raises."""
    if len(payload) < 128:
        return EMPTY_TAGS
    t = payload[-128:]
    if t[:3] != b"TAG":
        return EMPTY_TAGS

    def field(a: int, b: int) -> Optional[str]:
        try:
            return t[a:b].split(b"\0", 1)[0].decode("latin-1") \
                .strip() or None
        except UnicodeDecodeError:
            return None

    title, artist, album = field(3, 33), field(33, 63), field(63, 93)
    year = field(93, 97)
    if not any((title, artist, album, year)):
        return EMPTY_TAGS
    return AudioTags(title, artist, album, year, "id3v1")


def parse_vorbis_comment(payload: bytes) -> AudioTags:
    """FLAC metadata walk → VORBIS_COMMENT (type 4) tags."""
    if payload[:4] != b"fLaC":
        return EMPTY_TAGS
    pos = 4
    n = len(payload)
    while pos + 4 <= n:
        hdr0 = payload[pos]
        length = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + length]
        if hdr0 & 0x7F == 4 and len(body) == length:
            return _vorbis_fields(body)
        if hdr0 & 0x80:
            break
        pos += 4 + length
    return EMPTY_TAGS


def _vorbis_fields(body: bytes) -> AudioTags:
    try:
        (vlen,) = struct.unpack("<I", body[:4])
        pos = 4 + vlen
        (count,) = struct.unpack("<I", body[pos:pos + 4])
        pos += 4
        fields: dict[str, str] = {}
        for _ in range(min(count, 256)):
            (clen,) = struct.unpack("<I", body[pos:pos + 4])
            pos += 4
            item = body[pos:pos + clen].decode("utf-8")
            pos += clen
            k, _, v = item.partition("=")
            key = VORBIS_KEYS.get(k.upper())
            if key and v.strip() and key not in fields:
                fields[key] = v.strip()
        if not fields:
            return EMPTY_TAGS
        return AudioTags(fields.get("title"), fields.get("artist"),
                         fields.get("album"), fields.get("date"),
                         "vorbis")
    except (struct.error, UnicodeDecodeError, IndexError):
        return EMPTY_TAGS


def parse_riff_info(payload: bytes) -> AudioTags:
    """RIFF/WAVE LIST-INFO chunk → tags."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return EMPTY_TAGS
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"LIST" and body[:4] == b"INFO":
            return _info_fields(body[4:])
        pos += 8 + size + (size & 1)
    return EMPTY_TAGS


def _info_fields(body: bytes) -> AudioTags:
    pos = 0
    fields: dict[str, str] = {}
    while pos + 8 <= len(body):
        cid = body[pos:pos + 4]
        (size,) = struct.unpack("<I", body[pos + 4:pos + 8])
        raw = body[pos + 8:pos + 8 + size]
        key = RIFF_INFO_KEYS.get(cid)
        if key and key not in fields:
            try:
                val = raw.split(b"\0", 1)[0].decode("latin-1").strip()
                if val:
                    fields[key] = val
            except UnicodeDecodeError:
                pass
        pos += 8 + size + (size & 1)
    if not fields:
        return EMPTY_TAGS
    return AudioTags(fields.get("title"), fields.get("artist"),
                     fields.get("album"), fields.get("date"),
                     "riff_info")


def audio_tags(payload: bytes) -> AudioTags:
    """Format-sniffing front door: ID3v2 (MP3 lead), FLAC
    VORBIS_COMMENT, RIFF LIST-INFO, then the ID3v1 trailer as the
    fallback (it coexists with ID3v2; v2 wins when both carry
    fields, per the standards' precedence)."""
    if payload[:3] == b"ID3":
        got = parse_id3v2(payload)
        if got.tag_how != "none":
            return got
    if payload[:4] == b"fLaC":
        return parse_vorbis_comment(payload)
    if payload[:4] == b"RIFF":
        return parse_riff_info(payload)
    return parse_id3v1(payload)


# ----------------------------------------------------------------- authoring

def _apic_data(ver: int, body: bytes) -> Optional[bytes]:
    """APIC (v2.3/2.4) / PIC (v2.2) frame body → picture bytes.
    Layout per id3.org: encoding, mime (NUL-term latin-1; v2.2 uses a
    fixed 3-byte format code), picture type, description (terminated
    by NUL, or NUL-NUL for the UTF-16 encodings), then the data."""
    if not body:
        return None
    enc = body[0]
    if ver == 2:
        pos = 1 + 3                              # 3-byte image format
    else:
        cut = body.find(b"\x00", 1)
        if cut < 0:
            return None
        pos = cut + 1
    pos += 1                                     # picture type byte
    if enc in (1, 2):                            # UTF-16: NUL-NUL term
        # the terminator is a 2-byte UNIT: only an even offset from
        # the description start counts.  An odd-offset 00 00 (a
        # codepoint's low byte next to the following char's high
        # byte) is description content — search on, don't bump, or
        # the returned picture grows a 2-byte prefix and loses its
        # magic bytes.
        cut = pos
        while True:
            cut = body.find(b"\x00\x00", cut)
            if cut < 0:
                return None
            if (cut - pos) % 2 == 0:
                break
            cut += 1
        pos = cut + 2
    else:
        cut = body.find(b"\x00", pos)
        if cut < 0:
            return None
        pos = cut + 1
    return body[pos:] or None


def _flac_picture(payload: bytes) -> Optional[bytes]:
    """FLAC METADATA_BLOCK_PICTURE (type 6, RFC 9639 §8.8) → picture
    bytes.  Big-endian lengths throughout."""
    if payload[:4] != b"fLaC":
        return None
    pos = 4
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        length = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + length]
        if hdr & 0x7F == 6 and len(body) == length:
            try:
                p = 4                            # picture type
                (mlen,) = struct.unpack(">I", body[p:p + 4])
                p += 4 + mlen
                (dlen,) = struct.unpack(">I", body[p:p + 4])
                p += 4 + dlen
                p += 16                          # w/h/depth/colors
                (n,) = struct.unpack(">I", body[p:p + 4])
                data = body[p + 4:p + 4 + n]
                return data if len(data) == n and n else None
            except struct.error:
                return None
        pos += 4 + length
        if hdr & 0x80:
            break                                # last metadata block
    return None


def audio_cover_art(payload: bytes) -> Optional[bytes]:
    """Embedded cover art from an audio container (or None): ID3v2
    APIC/PIC frames on MP3s, the FLAC PICTURE block.  Returns the
    raw picture bytes (PNG/JPEG/...) so the image pipeline —
    ``media_metadata``, ``image_dhash``, near-dup joins — runs on
    them unchanged: the same recording re-encoded across containers
    usually carries the same art, which makes art a cross-container
    blocking key.  Never raises."""
    try:
        if payload[:3] == b"ID3":
            for ver, fid, body in _id3v2_frames(payload):
                if fid in ("APIC", "PIC"):
                    data = _apic_data(ver, body)
                    if data:
                        return data
            return None
        if payload[:4] == b"fLaC":
            return _flac_picture(payload)
    except Exception:
        pass
    return None


def build_id3v2(title: str | None = None, artist: str | None = None,
                album: str | None = None, date: str | None = None,
                version: int = 4,
                picture: bytes | None = None,
                picture_mime: str = "image/png") -> bytes:
    """A complete ID3v2.2/2.3/2.4 header block (UTF-8 text frames
    for v4, latin-1 for v3/v2.2 — all three grammars exercised)."""
    if version not in (2, 3, 4):
        raise ValueError(f"ID3v2.{version} unsupported")
    frames = b""
    if version == 2:
        pairs = [("TT2", title), ("TP1", artist), ("TAL", album),
                 ("TYE", date)]
    else:
        pairs = [("TIT2", title), ("TPE1", artist), ("TALB", album),
                 ("TDRC" if version == 4 else "TYER", date)]
    for fid, val in pairs:
        if val is None:
            continue
        if version == 2:
            body = b"\x00" + val.encode("latin-1")
            frames += (fid.encode("ascii")
                       + len(body).to_bytes(3, "big") + body)
            continue
        if version == 4:
            body = b"\x03" + val.encode("utf-8")
            sz = bytes(((len(body) >> s) & 0x7F) for s in (21, 14, 7, 0))
        else:
            body = b"\x00" + val.encode("latin-1")
            sz = struct.pack(">I", len(body))
        frames += fid.encode("ascii") + sz + b"\x00\x00" + body
    if picture is not None:
        if version == 2:
            fmt = b"PNG" if picture[:4] == b"\x89PNG" else b"JPG"
            body = b"\x00" + fmt + b"\x03" + b"\x00" + picture
            frames += b"PIC" + len(body).to_bytes(3, "big") + body
        else:
            body = (b"\x00" + picture_mime.encode("latin-1") + b"\x00"
                    + b"\x03" + b"Cover\x00" + picture)
            if version == 4:
                sz = bytes(((len(body) >> s) & 0x7F)
                           for s in (21, 14, 7, 0))
            else:
                sz = struct.pack(">I", len(body))
            frames += b"APIC" + sz + b"\x00\x00" + body
    size = bytes(((len(frames) >> s) & 0x7F) for s in (21, 14, 7, 0))
    return b"ID3" + bytes((version, 0, 0)) + size + frames


def append_id3v1(audio: bytes, title: str = "", artist: str = "",
                 album: str = "", year: str = "") -> bytes:
    """Append the fixed 128-byte ID3v1 trailer."""
    def f(s: str, n: int) -> bytes:
        return s.encode("latin-1")[:n].ljust(n, b"\0")
    return (audio + b"TAG" + f(title, 30) + f(artist, 30)
            + f(album, 30) + f(year, 4) + f("", 30) + b"\xff")


def flac_add_vorbis_comment(flac: bytes, **tags: str) -> bytes:
    """Insert a VORBIS_COMMENT block after STREAMINFO (clearing
    STREAMINFO's last-block flag) — no audio re-encode."""
    if flac[:4] != b"fLaC" or len(flac) < 8:
        raise ValueError("not a FLAC stream")
    hdr0 = flac[4]
    length = int.from_bytes(flac[5:8], "big")
    if hdr0 & 0x7F != 0:
        raise ValueError("FLAC must lead with STREAMINFO")
    comments = [f"{k.upper()}={v}".encode("utf-8")
                for k, v in tags.items() if v is not None]
    body = struct.pack("<I", 4) + b"doc2"
    body += struct.pack("<I", len(comments))
    for c in comments:
        body += struct.pack("<I", len(c)) + c
    last = hdr0 & 0x80                          # inherit last-block flag
    block = bytes((4 | last,)) + len(body).to_bytes(3, "big") + body
    return (flac[:4] + bytes((hdr0 & 0x7F,)) + flac[5:8]
            + flac[8:8 + length] + block + flac[8 + length:])


def flac_add_picture(flac: bytes, picture: bytes,
                     mime: str = "image/png",
                     width: int = 0, height: int = 0) -> bytes:
    """Insert a PICTURE block (type 6, RFC 9639 §8.8) after
    STREAMINFO — no audio re-encode, same splice shape as
    ``flac_add_vorbis_comment``."""
    if flac[:4] != b"fLaC" or len(flac) < 8:
        raise ValueError("not a FLAC stream")
    hdr0 = flac[4]
    length = int.from_bytes(flac[5:8], "big")
    if hdr0 & 0x7F != 0:
        raise ValueError("FLAC must lead with STREAMINFO")
    m = mime.encode("latin-1")
    body = (struct.pack(">I", 3)                 # front cover
            + struct.pack(">I", len(m)) + m
            + struct.pack(">I", 0)               # empty description
            + struct.pack(">IIII", width, height, 24, 0)
            + struct.pack(">I", len(picture)) + picture)
    last = hdr0 & 0x80
    block = bytes((6 | last,)) + len(body).to_bytes(3, "big") + body
    return (flac[:4] + bytes((hdr0 & 0x7F,)) + flac[5:8]
            + flac[8:8 + length] + block + flac[8 + length:])


def wav_add_info(wav: bytes, **tags: str) -> bytes:
    """Append a LIST-INFO chunk to a RIFF/WAVE file and patch the
    RIFF size — decoders skip unknown chunks, PCM untouched."""
    if len(wav) < 12 or wav[:4] != b"RIFF" or wav[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    keymap = {"title": b"INAM", "artist": b"IART",
              "album": b"IPRD", "date": b"ICRD"}
    body = b"INFO"
    for k, v in tags.items():
        if v is None:
            continue
        cid = keymap.get(k)
        if cid is None:
            raise ValueError(f"unknown INFO tag {k!r}")
        raw = v.encode("latin-1") + b"\0"
        body += cid + struct.pack("<I", len(raw)) + raw \
            + (b"\0" if len(raw) & 1 else b"")
    chunk = b"LIST" + struct.pack("<I", len(body)) + body
    out = wav + chunk
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
