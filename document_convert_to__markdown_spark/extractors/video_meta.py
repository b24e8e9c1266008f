"""Video-container metadata — ISO-BMFF (MP4/MOV), Matroska/WebM
(EBML), and Ogg — header-only, no sample decode.

Web crawls carry three video container families and a multimodal
training pipeline needs their structure *without* decoding a single
frame: duration and frame counts size the corpus, track dims/codec
route renditions, and the creation timestamp is provenance the same
way EXIF DateTime is for images.  Everything here is a pure function
over bytes (safe inside Arrow UDFs) built from the public container
grammars:

- **ISO-BMFF** (ISO/IEC 14496-12 box grammar, the MP4/MOV/M4A
  family): ``ftyp`` major brand, ``moov/mvhd`` timescale + duration +
  creation time (seconds since 1904-01-01, the QuickTime epoch),
  per-``trak`` ``tkhd`` 16.16-fixed dims, ``mdia/hdlr`` handler
  (``vide``/``soun``), ``stbl/stsd`` sample-entry fourcc (and the
  16.16 audio sample rate), ``stbl/stsz`` sample count.  64-bit
  ``largesize`` boxes and version-1 (64-bit) mvhd/tkhd supported.
- **EBML / Matroska / WebM** (RFC 8794 varint grammar, RFC 9559
  element IDs): EBML-header ``DocType`` (``webm`` vs ``matroska``),
  ``Segment > Info`` TimestampScale (default 10^6 ns) + float
  Duration + DateUTC (nanoseconds since 2001-01-01), ``Tracks >
  TrackEntry`` TrackType/CodecID, ``Video`` PixelWidth/PixelHeight,
  ``Audio`` SamplingFrequency.  Unknown-size (all-VINT-ones) master
  elements — the normal shape for streamed Segments — extend to end
  of buffer.
- **Ogg** (RFC 3533 pages): the first packet's identification header
  names the codec — Vorbis I §4.2.2 (``\\x01vorbis``: channels +
  rate), RFC 7845 §5.1 (``OpusHead``: channels, pre-skip, input
  rate; granule clock fixed at 48 kHz), Theora I §6.2
  (``\\x80theora``: picture dims + frame rate).  Duration comes from
  the LAST page's granule position (samples for Vorbis/Opus), found
  by scanning backwards for a structurally-valid page header.

Every ``*_meta`` function returns ``None`` for payloads that are not
(or are too broken to read as) that container — never raises: the
pipeline contract is one output row per input row.  The ``build_*``
writers author spec-valid fixtures deterministically (Ogg pages get
real CRCs — the non-reflected 0x04C11DB7 CRC-32 of RFC 3533 §6).
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta
from typing import NamedTuple, Optional

__all__ = [
    "VideoMeta", "mp4_meta", "webm_meta", "ogg_meta", "video_meta",
    "video_to_markdown", "build_mp4", "build_webm", "build_ogg",
]


class VideoMeta(NamedTuple):
    container: str                   # mp4 | webm | mkv | ogg
    brand: Optional[str]             # ftyp brand / DocType / ogg codec
    duration_ms: Optional[int]
    width: Optional[int]
    height: Optional[int]
    video_codec: Optional[str]       # stsd fourcc / CodecID / "theora"
    audio_codec: Optional[str]
    sample_rate: Optional[int]       # audio hz (container-declared)
    n_frames: Optional[int]          # video samples / pcm samples
    creation_time: Optional[str]     # ISO-8601 Z, container epoch fixed
    language: Optional[str]          # explicit track language claim:
                                     # mdhd packed ISO-639 / Matroska
                                     # Language; audio track preferred


_MP4_EPOCH = datetime(1904, 1, 1)        # ISO 14496-12 §8.2.2.1
_MKV_EPOCH = datetime(2001, 1, 1)        # RFC 9559 §4 (DateUTC)


def _iso(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _i64(v) -> Optional[int]:
    """Clamp container-declared durations/counts to int64: a hostile
    header must yield a null field, never an Arrow out-of-range task
    kill downstream (same contract as the image _i32 clamp)."""
    return int(v) if v is not None and 0 <= int(v) < 1 << 63 else None


def _ascii4(raw: bytes) -> Optional[str]:
    try:
        s = raw.decode("ascii").strip()
    except UnicodeDecodeError:
        return None
    return s or None


# ---------------------------------------------------------------- ISO-BMFF

_BMFF_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield ``(type, body_start, body_end)`` for the boxes in
    ``buf[start:end]``; stops (never raises) on malformed sizes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", buf[pos:pos + 4])
        btype = buf[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                            # 64-bit largesize
            if body + 8 > end:
                return
            (size,) = struct.unpack(">Q", buf[body:body + 8])
            body += 8
            if size < 16:
                return
            box_end = pos + size
        elif size == 0:                          # to end of enclosing
            box_end = end
        elif size < 8:
            return
        else:
            box_end = pos + size
        if box_end > end or box_end <= pos:
            return
        yield btype, body, box_end
        pos = box_end


def _bmff_find(buf: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk_boxes(buf, start, end):
        if t == btype:
            return b, e
    return None


def _parse_trak(buf: bytes, start: int, end: int) -> dict:
    """One ``trak`` box body → handler/dims/fourcc/rate/samples."""
    out: dict = {}
    tk = _bmff_find(buf, start, end, b"tkhd")
    if tk is not None:
        b, e = tk
        if e - b >= 4:
            ver = buf[b]
            off = b + 4 + (84 if ver == 1 else 72)
            if off + 8 <= e:
                w, h = struct.unpack(">II", buf[off:off + 8])
                out["width"], out["height"] = w >> 16, h >> 16
    mdia = _bmff_find(buf, start, end, b"mdia")
    if mdia is None:
        return out
    hdlr = _bmff_find(buf, mdia[0], mdia[1], b"hdlr")
    if hdlr is not None and hdlr[1] - hdlr[0] >= 12:
        out["handler"] = buf[hdlr[0] + 8:hdlr[0] + 12]
    mdhd = _bmff_find(buf, mdia[0], mdia[1], b"mdhd")
    if mdhd is not None and mdhd[1] - mdhd[0] >= 4:
        b, e = mdhd
        # language: 3 packed 5-bit chars + 0x60 (ISO 14496-12
        # §8.4.2.3), after the v0 16-byte / v1 28-byte time fields
        off = b + 4 + (28 if buf[b] == 1 else 16)
        if off + 2 <= e:
            (packed,) = struct.unpack(">H", buf[off:off + 2])
            chars = bytes((((packed >> s) & 0x1F) + 0x60)
                          for s in (10, 5, 0))
            if all(0x61 <= c <= 0x7A for c in chars):
                lang = chars.decode("ascii")
                if lang != "und":
                    out["language"] = lang
    minf = _bmff_find(buf, mdia[0], mdia[1], b"minf")
    stbl = minf and _bmff_find(buf, minf[0], minf[1], b"stbl")
    if not stbl:
        return out
    stsd = _bmff_find(buf, stbl[0], stbl[1], b"stsd")
    if stsd is not None and stsd[1] - stsd[0] >= 16:
        b, e = stsd
        (n_entries,) = struct.unpack(">I", buf[b + 4:b + 8])
        if n_entries >= 1 and b + 16 <= e:
            out["fourcc"] = _ascii4(buf[b + 12:b + 16])
            if out.get("handler") == b"soun" and b + 44 <= e:
                # AudioSampleEntry sample rate: 16.16 at entry +32
                (rate,) = struct.unpack(">I", buf[b + 40:b + 44])
                out["sample_rate"] = rate >> 16
    stsz = _bmff_find(buf, stbl[0], stbl[1], b"stsz")
    if stsz is not None and stsz[1] - stsz[0] >= 12:
        (cnt,) = struct.unpack(">I", buf[stsz[0] + 8:stsz[0] + 12])
        out["n_samples"] = cnt
    return out


def mp4_meta(payload: bytes) -> Optional[VideoMeta]:
    """ISO-BMFF bytes → ``VideoMeta`` (or None).  Never raises."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    try:
        brand = duration_ms = created = None
        width = height = vcodec = acodec = rate = n_frames = None
        vlang = alang = None
        for btype, b, e in _walk_boxes(payload, 0, len(payload)):
            if btype == b"ftyp" and e - b >= 4:
                brand = _ascii4(payload[b:b + 4])
            elif btype == b"moov":
                mv = _bmff_find(payload, b, e, b"mvhd")
                if mv is not None and mv[1] - mv[0] >= 4:
                    mb, me = mv
                    ver = payload[mb]
                    if ver == 1 and me - mb >= 32:
                        ctime, _mt, ts, dur = struct.unpack(
                            ">QQIQ", payload[mb + 4:mb + 32])
                    elif me - mb >= 20:
                        ctime, _mt, ts, dur = struct.unpack(
                            ">IIII", payload[mb + 4:mb + 20])
                    else:
                        ctime = ts = dur = 0
                    # all-ones duration = "cannot be determined"
                    # (ISO 14496-12 §8.2.2.3)
                    unknown = (1 << (64 if ver == 1 else 32)) - 1
                    if ts and dur != unknown:
                        duration_ms = dur * 1000 // ts
                    # clamp to what the 1904 epoch can represent
                    # (datetime year 9999 ≈ 2.55e11 s): an absurd
                    # ctime costs this field, never the whole row
                    if 0 < ctime < 255_000_000_000:
                        created = _iso(_MP4_EPOCH
                                       + timedelta(seconds=ctime))
                for t2, b2, e2 in _walk_boxes(payload, b, e):
                    if t2 != b"trak":
                        continue
                    tr = _parse_trak(payload, b2, e2)
                    if tr.get("handler") == b"vide":
                        width = tr.get("width") or width
                        height = tr.get("height") or height
                        vcodec = tr.get("fourcc") or vcodec
                        vlang = tr.get("language") or vlang
                        if tr.get("n_samples"):
                            n_frames = tr["n_samples"]
                    elif tr.get("handler") == b"soun":
                        acodec = tr.get("fourcc") or acodec
                        rate = tr.get("sample_rate") or rate
                        alang = tr.get("language") or alang
        if brand is None:
            return None
        return VideoMeta("mp4", brand, _i64(duration_ms),
                         width or None, height or None, vcodec,
                         acodec, _i64(rate or None), _i64(n_frames),
                         created, alang or vlang)
    except Exception:
        return None


# -------------------------------------------------------- EBML / Matroska

_EBML_MAGIC = b"\x1aE\xdf\xa3"
# RFC 9559 element IDs (raw, marker bit kept, as they sit on the wire)
_ID_DOCTYPE = 0x4282
_ID_SEGMENT = 0x18538067
_ID_INFO = 0x1549A966
_ID_TS_SCALE = 0x2AD7B1
_ID_DURATION = 0x4489
_ID_DATE_UTC = 0x4461
_ID_TRACKS = 0x1654AE6B
_ID_TRACK_ENTRY = 0xAE
_ID_TRACK_TYPE = 0x83
_ID_CODEC_ID = 0x86
_ID_VIDEO = 0xE0
_ID_PIX_W = 0xB0
_ID_PIX_H = 0xBA
_ID_AUDIO = 0xE1
_ID_SAMP_FREQ = 0xB5
_ID_LANGUAGE = 0x22B59C          # ISO 639-2, explicit only (the
_ID_LANG_BCP47 = 0x22B59D        # spec DEFAULT eng is not synthesized
                                 # — pipelines want the file's claim)

def _vint(buf: bytes, pos: int, keep_marker: bool):
    """EBML varint at ``pos`` → ``(value, next_pos)`` or None.
    ``keep_marker=True`` reads element IDs (marker bit retained);
    otherwise sizes (marker masked; all-ones → None value = unknown)."""
    if pos >= len(buf):
        return None
    first = buf[pos]
    if first == 0:
        return None
    length = 8 - first.bit_length() + 1
    if pos + length > len(buf):
        return None
    raw = int.from_bytes(buf[pos:pos + length], "big")
    if keep_marker:
        return raw, pos + length
    val = raw & ((1 << (7 * length)) - 1)
    if val == (1 << (7 * length)) - 1:           # unknown size
        return None, pos + length
    return val, pos + length


def _walk_ebml(buf: bytes, start: int, end: int):
    """Yield ``(id, body_start, body_end)``; unknown-size elements
    run to ``end`` — correct for the streamed-Segment case this
    walker exists for, and harmless elsewhere (the walk just ends
    at that element; no guard list is kept)."""
    pos = start
    while pos < end:
        got = _vint(buf, pos, True)
        if got is None:
            return
        eid, pos = got
        got = _vint(buf, pos, False)
        if got is None:
            return
        size, pos = got
        body_end = end if size is None else pos + size
        if body_end > end or body_end < pos:
            return
        yield eid, pos, body_end
        pos = body_end


def _ebml_uint(buf: bytes, b: int, e: int) -> Optional[int]:
    if not 0 < e - b <= 8:
        return None
    return int.from_bytes(buf[b:e], "big")


def _ebml_float(buf: bytes, b: int, e: int) -> Optional[float]:
    if e - b == 4:
        return struct.unpack(">f", buf[b:e])[0]
    if e - b == 8:
        return struct.unpack(">d", buf[b:e])[0]
    return None


def webm_meta(payload: bytes) -> Optional[VideoMeta]:
    """Matroska/WebM bytes → ``VideoMeta`` (or None).  Never raises."""
    if not payload.startswith(_EBML_MAGIC):
        return None
    try:
        doctype = None
        ts_scale = 1_000_000                     # ns, RFC 9559 default
        duration_units = created = None
        width = height = vcodec = acodec = rate = None
        vlang = alang = None

        def track_entry(b: int, e: int):
            nonlocal width, height, vcodec, acodec, rate, vlang, alang
            ttype, codec, lang = None, None, None
            vid: dict = {}
            freq = None
            for eid, bb, ee in _walk_ebml(payload, b, e):
                if eid == _ID_TRACK_TYPE:
                    ttype = _ebml_uint(payload, bb, ee)
                elif eid == _ID_CODEC_ID:
                    codec = _ascii4(payload[bb:ee][:32])
                elif eid in (_ID_LANGUAGE, _ID_LANG_BCP47):
                    lang = _ascii4(payload[bb:ee][:16]) or lang
                elif eid == _ID_VIDEO:
                    for e2, b3, e3 in _walk_ebml(payload, bb, ee):
                        if e2 == _ID_PIX_W:
                            vid["w"] = _ebml_uint(payload, b3, e3)
                        elif e2 == _ID_PIX_H:
                            vid["h"] = _ebml_uint(payload, b3, e3)
                elif eid == _ID_AUDIO:
                    for e2, b3, e3 in _walk_ebml(payload, bb, ee):
                        if e2 == _ID_SAMP_FREQ:
                            freq = _ebml_float(payload, b3, e3)
            if ttype == 1:                       # video
                width = vid.get("w") or width
                height = vid.get("h") or height
                vcodec = codec or vcodec
                vlang = lang or vlang
            elif ttype == 2:                     # audio
                acodec = codec or acodec
                alang = lang or alang
                if freq and freq > 0:
                    rate = int(round(freq))

        for eid, b, e in _walk_ebml(payload, 0, len(payload)):
            if eid == 0x1A45DFA3:                # EBML header
                for e2, b2, e2e in _walk_ebml(payload, b, e):
                    if e2 == _ID_DOCTYPE:
                        doctype = _ascii4(payload[b2:e2e][:16])
            elif eid == _ID_SEGMENT:
                for e2, b2, e2e in _walk_ebml(payload, b, e):
                    if e2 == _ID_INFO:
                        for e3, b3, e3e in _walk_ebml(payload, b2, e2e):
                            if e3 == _ID_TS_SCALE:
                                v = _ebml_uint(payload, b3, e3e)
                                if v:
                                    ts_scale = v
                            elif e3 == _ID_DURATION:
                                duration_units = _ebml_float(
                                    payload, b3, e3e)
                            elif e3 == _ID_DATE_UTC:
                                ns = _ebml_uint(payload, b3, e3e)
                                if ns is not None and e3e - b3 == 8:
                                    if ns >= 1 << 63:
                                        ns -= 1 << 64
                                    created = _iso(
                                        _MKV_EPOCH
                                        + timedelta(seconds=ns / 1e9))
                    elif e2 == _ID_TRACKS:
                        for e3, b3, e3e in _walk_ebml(payload, b2, e2e):
                            if e3 == _ID_TRACK_ENTRY:
                                track_entry(b3, e3e)
        if doctype is None:
            return None
        duration_ms = None
        if duration_units is not None and 0 <= duration_units < 1e15:
            # finite-and-bounded: a crafted inf/NaN/astronomical float
            # must cost one field, not the whole row
            duration_ms = int(duration_units * ts_scale / 1e6)
        container = "webm" if doctype == "webm" else "mkv"
        return VideoMeta(container, doctype, _i64(duration_ms), width,
                         height, vcodec, acodec, _i64(rate), None,
                         created, alang or vlang)
    except Exception:
        return None


# ------------------------------------------------------------------- Ogg

def _ogg_page(payload: bytes, pos: int):
    """Parse the page header at ``pos`` → (granule, body_start,
    body_end, header_type) or None."""
    if payload[pos:pos + 4] != b"OggS" or pos + 27 > len(payload):
        return None
    if payload[pos + 4] != 0:                    # stream version
        return None
    htype = payload[pos + 5]
    (granule,) = struct.unpack("<q", payload[pos + 6:pos + 14])
    nsegs = payload[pos + 26]
    seg_table = payload[pos + 27:pos + 27 + nsegs]
    if len(seg_table) != nsegs:
        return None
    body = pos + 27 + nsegs
    body_end = body + sum(seg_table)
    if body_end > len(payload):
        return None
    return granule, body, body_end, htype


def ogg_meta(payload: bytes) -> Optional[VideoMeta]:
    """Ogg bytes → ``VideoMeta`` (or None).  Never raises."""
    if not payload.startswith(b"OggS"):
        return None
    try:
        first = _ogg_page(payload, 0)
        if first is None:
            return None
        _, b, e, _ = first
        pkt = payload[b:e]
        codec = None
        width = height = rate = channels = None
        granule_rate = None                      # granule units per sec
        pre_skip = 0
        if pkt.startswith(b"\x01vorbis") and len(pkt) >= 16:
            codec = "vorbis"
            channels = pkt[11]
            (rate,) = struct.unpack("<I", pkt[12:16])
            granule_rate = rate or None
        elif pkt.startswith(b"OpusHead") and len(pkt) >= 19:
            codec = "opus"
            channels = pkt[9]
            (pre_skip,) = struct.unpack("<H", pkt[10:12])
            (rate,) = struct.unpack("<I", pkt[12:16])
            granule_rate = 48_000                # RFC 7845 §4
        elif pkt.startswith(b"\x80theora") and len(pkt) >= 42:
            codec = "theora"
            picw = int.from_bytes(pkt[14:17], "big")
            pich = int.from_bytes(pkt[17:20], "big")
            width, height = picw, pich
        if codec is None:
            return None
        # last structurally-valid page's granule → duration
        last_granule = None
        pos = len(payload)
        while last_granule is None:
            pos = payload.rfind(b"OggS", 0, pos)
            if pos < 0:
                break
            page = _ogg_page(payload, pos)
            if page is not None and page[0] >= 0:
                last_granule = page[0]
            if pos == 0:
                break
        duration_ms = n_frames = None
        if last_granule is not None and granule_rate:
            # RFC 7845 §4.2: the Opus granule position INCLUDES the
            # pre-skip samples a decoder discards — subtract them so
            # duration is playable audio, not stream samples
            playable = max(0, last_granule - pre_skip)
            n_frames = playable
            duration_ms = playable * 1000 // granule_rate
        return VideoMeta("ogg", codec, _i64(duration_ms), width,
                         height,
                         "theora" if codec == "theora" else None,
                         codec if codec != "theora" else None,
                         _i64(rate if rate else None),
                         _i64(n_frames), None, None)
    except Exception:
        return None


# --------------------------------------------------- HEIF / AVIF images

# ISO/IEC 23008-12 (HEIF) / AOM AVIF: still images in the ISO-BMFF
# container.  Brand sets per the specs' §B/§4 registrations.
AVIF_BRANDS = frozenset({b"avif", b"avis"})
HEIC_BRANDS = frozenset({b"heic", b"heix", b"heim", b"heis", b"hevc",
                         b"hevx", b"mif1", b"msf1"})


def heif_brand(payload: bytes) -> Optional[str]:
    """``"avif"`` / ``"heic"`` when the ftyp major brand marks a HEIF
    still image, else None (cheap — reads 12 bytes)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    brand = payload[8:12]
    if brand in AVIF_BRANDS:
        return "avif"
    if brand in HEIC_BRANDS:
        return "heic"
    return None


def heif_meta(payload: bytes) -> Optional[tuple]:
    """HEIF/AVIF bytes → ``(brand, width, height)`` (dims of the
    largest ``ispe`` item property — the primary image; thumbnails
    and alpha planes are smaller).  Header-only; no AV1/HEVC decode.
    Returns None when not HEIF or too broken to read.  Never raises.
    """
    fam = heif_brand(payload)
    if fam is None:
        return None
    try:
        best = None
        meta = _bmff_find(payload, 0, len(payload), b"meta")
        if meta is not None:
            # meta is a FullBox: children start after version/flags
            b, e = meta[0] + 4, meta[1]
            iprp = _bmff_find(payload, b, e, b"iprp")
            ipco = iprp and _bmff_find(payload, iprp[0], iprp[1],
                                       b"ipco")
            if ipco:
                for t, bb, ee in _walk_boxes(payload, ipco[0],
                                             ipco[1]):
                    if t == b"ispe" and ee - bb >= 12:
                        w, h = struct.unpack(
                            ">II", payload[bb + 4:bb + 12])
                        if 0 < w * h <= 1 << 32 and (
                                best is None
                                or w * h > best[0] * best[1]):
                            best = (w, h)
        if best is None:
            return (fam, None, None)
        return (fam, best[0], best[1])
    except Exception:
        return (fam, None, None)


def build_heif(*, brand: str = "avif", width: int = 512,
               height: int = 384, thumb: tuple | None = None) -> bytes:
    """Deterministic minimal HEIF/AVIF: ftyp + meta(hdlr pict +
    iprp/ipco/ispe[s]) + empty mdat.  ``thumb`` adds a second,
    smaller ispe (the parser must keep the larger primary)."""
    major = {"avif": b"avif", "heic": b"heic"}[brand]
    compat = major + b"mif1miaf"
    ispe = _full(b"ispe", 0, struct.pack(">II", width, height))
    if thumb is not None:
        ispe += _full(b"ispe", 0, struct.pack(">II", *thumb))
    ipco = _box(b"ipco", ispe)
    hdlr = _full(b"hdlr", 0, b"\0" * 4 + b"pict" + b"\0" * 13)
    meta = _full(b"meta", 0, hdlr + _box(b"iprp", ipco))
    return (_box(b"ftyp", major + struct.pack(">I", 0) + compat)
            + meta + _box(b"mdat", b""))


def video_meta(payload: bytes) -> Optional[VideoMeta]:
    """Sniffing front door over the three container families."""
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return mp4_meta(payload)
    if payload.startswith(_EBML_MAGIC):
        return webm_meta(payload)
    if payload.startswith(b"OggS"):
        return ogg_meta(payload)
    return None


_CONTAINER_LABEL = {"mp4": "MP4 (ISO-BMFF)", "webm": "WebM",
                    "mkv": "Matroska", "ogg": "Ogg"}


def video_to_markdown(payload: bytes, doc_name: str) -> Optional[str]:
    """Video container → metadata markdown, same template family as
    the audio formats (beyond reference, like FLAC/AIFF: the
    reference supports audio but not video — this extends the
    metadata-markdown pattern of converter.py:772-787 to the three
    web video containers).  Null fields are omitted."""
    meta = video_meta(payload)
    if meta is None:
        return None
    lines = [f"# {doc_name}", "", "**视频文件信息**", ""]
    label = _CONTAINER_LABEL.get(meta.container, meta.container)
    lines.append(f"- 容器: {label} ({meta.brand})")
    if meta.video_codec:
        lines.append(f"- 视频编码: {meta.video_codec}")
    if meta.width and meta.height:
        lines.append(f"- 分辨率: {meta.width}x{meta.height}")
    if meta.audio_codec:
        lines.append(f"- 音频编码: {meta.audio_codec}")
    if meta.sample_rate:
        lines.append(f"- 采样率: {meta.sample_rate} Hz")
    if meta.duration_ms is not None:
        lines.append(f"- 时长: {meta.duration_ms / 1000:.2f} 秒")
    if meta.language:
        lines.append(f"- 语言: {meta.language}")
    if meta.creation_time:
        lines.append(f"- 创建时间: {meta.creation_time}")
    lines.append(f"- 文件大小: {len(payload)} 字节")
    return "\n".join(lines) + "\n"


# ------------------------------------------------------------ builders

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _full(btype: bytes, version: int, body: bytes) -> bytes:
    return _box(btype, bytes((version, 0, 0, 0)) + body)


def build_mp4(*, brand: str = "isom", timescale: int = 1000,
              duration_ms: int = 4000,
              creation: str = "2021-03-04T05:06:07",
              video: tuple | None = ("avc1", 640, 360, 96),
              audio: tuple | None = ("mp4a", 48000),
              mvhd_v1: bool = False,
              language: str | None = None) -> bytes:
    """Deterministic minimal ISO-BMFF file: ``ftyp`` + ``moov`` (mvhd
    + one trak per declared track) + empty ``mdat``.  ``video`` is
    ``(fourcc, w, h, n_frames)``; ``audio`` is ``(fourcc, rate)``;
    ``language`` writes the packed ISO-639 mdhd code on each track."""
    ctime = int((datetime.strptime(creation, "%Y-%m-%dT%H:%M:%S")
                 - _MP4_EPOCH).total_seconds())
    dur = duration_ms * timescale // 1000
    if language is None:
        packed_lang = 0x55C4                     # 'und'
    else:
        if len(language) != 3:
            raise ValueError("language must be 3 ISO-639 letters")
        a, b_, c = (ord(ch) - 0x60 for ch in language.lower())
        packed_lang = (a << 10) | (b_ << 5) | c

    def mdhd() -> bytes:
        return _full(b"mdhd", 0, struct.pack(
            ">IIII H H", ctime, ctime, timescale, dur,
            packed_lang, 0))

    def tkhd(track_id: int, w: int, h: int) -> bytes:
        return _full(b"tkhd", 0, struct.pack(
            ">IIII I II HHHH", ctime, ctime, track_id, 0, dur,
            0, 0, 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", w << 16, h << 16))

    def stbl(entry: bytes, n_samples: int) -> bytes:
        stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
        stsz = _full(b"stsz", 0, struct.pack(">II", 0, n_samples))
        return _box(b"stbl", stsd + stsz)

    def trak(track_id: int, handler: bytes, w: int, h: int,
             entry: bytes, n_samples: int) -> bytes:
        hdlr = _full(b"hdlr", 0, b"\0" * 4 + handler + b"\0" * 13)
        minf = _box(b"minf", stbl(entry, n_samples))
        mdia = _box(b"mdia", mdhd() + hdlr + minf)
        return _box(b"trak", tkhd(track_id, w, h) + mdia)

    traks = b""
    if video is not None:
        fourcc, w, h, n_frames = video
        entry = struct.pack(">I", 86) + fourcc.encode("ascii") \
            + b"\0" * 6 + struct.pack(">H", 1) \
            + b"\0" * 16 + struct.pack(">HH", w, h) + b"\0" * 50
        traks += trak(1, b"vide", w, h, entry, n_frames)
    if audio is not None:
        fourcc, rate = audio
        entry = struct.pack(">I", 36) + fourcc.encode("ascii") \
            + b"\0" * 6 + struct.pack(">H", 1) \
            + struct.pack(">8xHHHH", 2, 16, 0, 0) \
            + struct.pack(">I", rate << 16)
        traks += trak(2, b"soun", 0, 0, entry, 0)
    if mvhd_v1:
        mvhd = _full(b"mvhd", 1, struct.pack(
            ">QQIQ", ctime, ctime, timescale, dur) + b"\0" * 80)
    else:
        mvhd = _full(b"mvhd", 0, struct.pack(
            ">IIII", ctime, ctime, timescale, dur) + b"\0" * 80)
    return (_box(b"ftyp", brand.encode("ascii")
                 + struct.pack(">I", 0) + b"isom")
            + _box(b"moov", mvhd + traks) + _box(b"mdat", b""))


def _ebml_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _ebml_size(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return (n | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _ebml_id(eid) + _ebml_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def build_webm(*, doctype: str = "webm", duration_ms: int = 4000,
               timescale_ns: int = 1_000_000,
               video: tuple | None = ("V_VP9", 1280, 720),
               audio: tuple | None = ("A_OPUS", 48000),
               date_utc: str | None = "2022-11-12T13:14:15",
               unknown_segment_size: bool = False,
               language: str | None = None) -> bytes:
    """Deterministic minimal Matroska/WebM: EBML header + Segment
    (Info + Tracks).  ``video`` is ``(codec_id, w, h)``; ``audio`` is
    ``(codec_id, hz)``.  ``unknown_segment_size`` writes the all-ones
    VINT streamed files carry."""
    header = _el(0x1A45DFA3,
                 _el_uint(0x4286, 1)             # EBMLVersion
                 + _el_uint(0x42F7, 1)           # EBMLReadVersion
                 + _el(_ID_DOCTYPE, doctype.encode("ascii"))
                 + _el_uint(0x4287, 4)           # DocTypeVersion
                 + _el_uint(0x4285, 2))          # DocTypeReadVersion
    info = (_el_uint(_ID_TS_SCALE, timescale_ns)
            + _el(_ID_DURATION, struct.pack(
                ">d", duration_ms * 1e6 / timescale_ns)))
    if date_utc is not None:
        ns = int((datetime.strptime(date_utc, "%Y-%m-%dT%H:%M:%S")
                  - _MKV_EPOCH).total_seconds() * 1e9)
        info += _el(_ID_DATE_UTC, struct.pack(">q", ns))
    tracks = b""
    if video is not None:
        codec, w, h = video
        lang_el = (b"" if language is None else
                   _el(_ID_LANGUAGE, language.encode("ascii")))
        tracks += _el(_ID_TRACK_ENTRY,
                      _el_uint(0xD7, 1)          # TrackNumber
                      + _el_uint(_ID_TRACK_TYPE, 1)
                      + _el(_ID_CODEC_ID, codec.encode("ascii"))
                      + lang_el
                      + _el(_ID_VIDEO, _el_uint(_ID_PIX_W, w)
                            + _el_uint(_ID_PIX_H, h)))
    if audio is not None:
        codec, hz = audio
        lang_el = (b"" if language is None else
                   _el(_ID_LANGUAGE, language.encode("ascii")))
        tracks += _el(_ID_TRACK_ENTRY,
                      _el_uint(0xD7, 2)
                      + _el_uint(_ID_TRACK_TYPE, 2)
                      + _el(_ID_CODEC_ID, codec.encode("ascii"))
                      + lang_el
                      + _el(_ID_AUDIO, _el(_ID_SAMP_FREQ,
                                           struct.pack(">f", hz))))
    seg_body = _el(_ID_INFO, info) + _el(_ID_TRACKS, tracks)
    if unknown_segment_size:
        seg = _ebml_id(_ID_SEGMENT) + b"\xff" + seg_body
    else:
        seg = _el(_ID_SEGMENT, seg_body)
    return header + seg


def _ogg_crc(page: bytes) -> int:
    """RFC 3533 §6 CRC-32: poly 0x04C11DB7, init 0, no reflection."""
    crc = 0
    for byte in page:
        crc ^= byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000
                   else crc << 1) & 0xFFFFFFFF
    return crc


def _ogg_write_page(serial: int, seq: int, granule: int, packet: bytes,
                    htype: int) -> bytes:
    segs = bytes(min(255, len(packet) - i)
                 for i in range(0, len(packet) or 1, 255)) or b"\0"
    # a packet whose length is a multiple of 255 needs a 0 terminator
    if packet and len(packet) % 255 == 0:
        segs += b"\0"
    head = (b"OggS\0" + bytes((htype,))
            + struct.pack("<q", granule)
            + struct.pack("<III", serial, seq, 0)
            + bytes((len(segs),)) + segs)
    page = head + packet
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def build_ogg(*, codec: str = "vorbis", rate: int = 44100,
              channels: int = 2, n_samples: int = 44100,
              dims: tuple = (320, 240)) -> bytes:
    """Deterministic minimal Ogg: identification-header page (BOS) +
    one data page carrying the final granule position (EOS)."""
    if codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<I", 0)
                 + bytes((channels,)) + struct.pack("<I", rate)
                 + struct.pack("<iii", -1, 128000, -1)
                 + bytes((0xB8, 0x01)))
    elif codec == "opus":
        ident = (b"OpusHead" + bytes((1, channels))
                 + struct.pack("<H", 312)        # pre-skip
                 + struct.pack("<I", rate)
                 + struct.pack("<h", 0) + bytes((0,)))
    elif codec == "theora":
        w, h = dims
        ident = (b"\x80theora" + bytes((3, 2, 1))
                 + struct.pack(">HH", (w + 15) // 16, (h + 15) // 16)
                 + w.to_bytes(3, "big") + h.to_bytes(3, "big")
                 + bytes((0, 0))
                 + struct.pack(">II", 30, 1)     # frame rate 30/1
                 + bytes(14))
    else:
        raise ValueError(f"unknown ogg codec {codec}")
    first = _ogg_write_page(0x5043, 0, 0, ident, 0x02)       # BOS
    last = _ogg_write_page(0x5043, 1, n_samples, b"\0" * 16, 0x04)
    return first + last
