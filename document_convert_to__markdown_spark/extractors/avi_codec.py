"""From-scratch AVI demux/mux for uncompressed video — stdlib + numpy.

Fourth sibling of ``png_codec``/``gif_codec``/``wav_codec``, and the
one that makes the video modality real: AVI is RIFF (the same chunk
grammar as WAV).  Two codecs decode: the ``BI_RGB`` uncompressed DIB
(no codec at all — each frame a bottom-up BGR bitmap) and motion JPEG
(``MJPG`` fourcc — each frame an independent baseline JPEG through
``jpeg_codec``, including the DHT-less convention where the Annex K
tables are implied).  Inter-frame codecs (H.264/VP9) genuinely need
transform coders the container can't ship, so those stay on the
labeled stub path; DIB + MJPEG give ``video_frame_sample`` a real
demux loop — container walk, frame framing, stride/padding, channel
order, per-frame entropy decode — which is the part a Spark pipeline
owns (swapping in an ffmpeg call changes the per-frame decode, not
the plumbing).

- ``decode_avi``: RIFF walk (``hdrl`` → ``avih``/``strh``/``strf``,
  ``movi`` → ``00db``/``00dc`` chunks), 24-bit BI_RGB (bottom-up row
  order and 4-byte row padding reversed, BGR → RGB) or MJPG.  Other
  codecs raise ``UnsupportedAvi``; malformed input raises
  ``ValueError`` (never a non-ValueError escape — the kernels' stub
  fallback catches ValueError only).
- ``encode_avi``: ``(n, h, w, 3)`` RGB frames → single-video-stream
  AVI bytes, DIB or MJPEG (the test/synthesizer twin).
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedAvi(ValueError):
    """Valid AVI outside the implemented subset (compressed codec...)."""


MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


def is_avi(payload: bytes) -> bool:
    """RIFF/AVI magic check — the single definition every AVI call
    site shares.  Deliberately NOT in the shared ``sniffer``: the
    extraction dispatcher mirrors the reference's SUPPORTED_FORMATS
    (which has no video), so teaching the sniffer a new format would
    change byte-parity-pinned extraction labels; the multimodal
    curation operators detect AVI locally instead."""
    return len(payload) >= 12 and payload[:4] == b"RIFF" \
        and payload[8:12] == b"AVI "


def dib_rows_to_rgb(raw: np.ndarray, width: int, height: int,
                    channels: int, top_down: bool) -> np.ndarray:
    """Shared DIB scanline layout → ``(h, w, 3)`` RGB: 4-byte row
    padding stripped, BGR(X) channel order reversed (alpha/padding
    byte dropped), bottom-up rows flipped unless ``top_down``.  Used
    by both AVI raw-video frames and BMP files — the identical bitmap
    format.  ``raw`` must hold exactly ``stride × height`` bytes."""
    stride = (width * channels + 3) & ~3
    rows = raw.reshape(height, stride)
    px = rows[:, :width * channels].reshape(height, width, channels)
    rgb = px[:, :, 2::-1]                       # BGR(X) → RGB
    return rgb if top_down else rgb[::-1]


def _walk(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for RIFF chunks in range."""
    while pos + 8 <= end:
        cc = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if pos + 8 + size > end:
            raise ValueError("truncated AVI chunk")
        yield cc, pos + 8, size
        pos += 8 + size + (size & 1)            # word-aligned


def avi_meta(payload: bytes) -> tuple[int, int, float, int, int]:
    """Header-only AVI parse → ``(width, height, fps, n_frames,
    compression)`` — the metadata twin of ``image_meta``: no frame
    data is touched, so it is safe and cheap on compressed AVIs the
    decoder refuses.  Raises ``ValueError`` on malformed input."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI file")
    from collections import deque

    width = height = None
    fps = 0.0
    n_frames = 0
    compression = None
    is_video_strl = False
    work = deque([(12, len(payload))])
    while work:
        pos, end = work.popleft()
        for cc, body, size in _walk(payload, pos, end):
            if cc == b"LIST":
                if size < 4:
                    raise ValueError("truncated AVI LIST header")
                if payload[body:body + 4] == b"movi":
                    continue                    # header-only: skip data
                work.append((body + 4, body + size))
            elif cc == b"avih" and size >= 20:
                usec, _rate, _pad, _flags, total = struct.unpack(
                    "<IIIII", payload[body:body + 20])
                if usec:
                    fps = round(1e6 / usec, 3)
                n_frames = total
            elif cc == b"strh":
                # reset on EVERY strh so a short video strf can never
                # leave the flag stale for a later stream's strf
                is_video_strl = size >= 4 \
                    and payload[body:body + 4] == b"vids" \
                    and width is None
            elif cc == b"strf" and is_video_strl:
                is_video_strl = False
                if size < 20:
                    raise ValueError("AVI video strf too short")
                _sz, w, h, _planes, _bits, comp = struct.unpack(
                    "<IiihHI", payload[body:body + 20])
                if w <= 0 or h == 0 or abs(h) > 0x7FFFFFFF:
                    raise ValueError("bad AVI frame dimensions")
                width, height, compression = w, abs(h), comp
    if width is None:
        raise ValueError("AVI missing video stream format")
    return width, height, fps, n_frames, compression


def decode_avi(payload: bytes) -> tuple[np.ndarray, float, str]:
    """AVI bytes → ``((n_frames, h, w, 3) uint8 RGB, fps, codec)``.

    ``codec`` is ``"dib"`` (uncompressed BI_RGB) or ``"mjpg"`` —
    returned so callers labeling frame provenance don't re-parse the
    header with ``avi_meta``.

    Malformed or out-of-subset input raises ``ValueError`` (incl.
    ``UnsupportedAvi``) and NOTHING ELSE — the Spark kernels' stub
    fallback catches ValueError only, so a hostile crawl payload must
    never escape as RecursionError/MemoryError/struct.error.  Hence:
    iterative chunk walk (no recursion), dimensions validated against
    actual frame sizes before any output allocation, and the
    compressed-codec refusal raised as soon as the video ``strf`` is
    parsed (before buffering frame data).
    """
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI file")

    width = height = None
    codec = None
    top_down = False
    fps = 0.0
    stream_idx = -1                 # strh counter (stream numbering)
    video_stream = None             # index of the first 'vids' stream
    await_video_strf = False
    chunks: list[tuple[int, int, int]] = []     # (stream_no, body, size)

    # iterative FIFO walk: a queue of (pos, end) ranges replaces
    # recursion, so nested-LIST bombs can't raise RecursionError;
    # FIFO keeps sibling lists (the strl stream headers) in document
    # order for stream numbering.  Frame chunks are collected with
    # their stream number and filtered AFTER the walk, so hdrl/movi
    # traversal order doesn't matter.
    from collections import deque
    work = deque([(12, len(payload))])
    while work:
        pos, end = work.popleft()
        for cc, body, size in _walk(payload, pos, end):
            if cc == b"LIST":
                if size < 4:
                    raise ValueError("truncated AVI LIST header")
                work.append((body + 4, body + size))   # skip list type
            elif cc == b"avih" and size >= 32:
                (usec_per_frame,) = struct.unpack(
                    "<I", payload[body:body + 4])
                if usec_per_frame:
                    fps = round(1e6 / usec_per_frame, 3)
            elif cc == b"strh" and size >= 4:
                stream_idx += 1
                await_video_strf = False
                if payload[body:body + 4] == b"vids" \
                        and video_stream is None:
                    video_stream = stream_idx
                    await_video_strf = True
            elif cc == b"strf" and await_video_strf:
                await_video_strf = False
                if size < 20:
                    raise ValueError("AVI video strf too short")
                # BITMAPINFOHEADER: biSize biWidth biHeight biPlanes
                # biBitCount biCompression ...
                _sz, w, h, _planes, bits, comp = struct.unpack(
                    "<IiihHI", payload[body:body + 20])
                if comp == MJPG_FOURCC:
                    codec = "mjpg"              # frames are JPEGs
                elif comp == 0 and bits == 24:  # 0 = BI_RGB
                    codec = "dib"
                else:
                    raise UnsupportedAvi(
                        f"AVI codec not BI_RGB 24-bit or MJPG "
                        f"(biCompression={comp}, biBitCount={bits})")
                if w <= 0 or h == 0:
                    raise ValueError("bad AVI frame dimensions")
                width, height, top_down = w, abs(h), h < 0
            elif cc[2:4] in (b"db", b"dc") and cc[:2].isdigit():
                chunks.append((int(cc[:2]), body, size))

    want_stream = video_stream if video_stream is not None else 0
    frames = [(body, size) for no, body, size in chunks
              if no == want_stream]
    if width is None or not frames:
        raise ValueError("AVI missing video stream format / frame data")
    if codec == "mjpg":
        # motion JPEG: every frame chunk is an independent baseline
        # JPEG (possibly DHT-less per the MJPEG convention — the JPEG
        # decoder supplies the implied Annex K tables)
        from .jpeg_codec import decode_jpeg

        # decode into a list, stack after: memory follows the REAL
        # decoded frames (decode_jpeg's block-vs-scan-bytes bound kills
        # dimension bombs), never a crafted strf width*height*n_frames
        decoded = []
        for body, size in frames:
            px, mode = decode_jpeg(payload[body:body + size])
            if px.shape[:2] != (height, width):
                raise ValueError("MJPEG frame size mismatches header")
            decoded.append(px[:, :, None].repeat(3, axis=2)
                           if mode == "L" else px)
        return np.stack(decoded), fps, "mjpg"
    stride = (width * 3 + 3) & ~3               # rows pad to 4 bytes
    need = stride * height
    # validate EVERY frame span against the declared dimensions BEFORE
    # allocating output: a tiny payload declaring 40000x40000 must die
    # as ValueError, never as a MemoryError the stub fallback can't see
    for _body, size in frames:
        if size < need:
            raise ValueError("AVI frame data short for declared size")
    out = np.empty((len(frames), height, width, 3), dtype=np.uint8)
    for i, (body, _size) in enumerate(frames):
        raw = np.frombuffer(payload[body:body + need], dtype=np.uint8)
        out[i] = dib_rows_to_rgb(raw, width, height, 3, top_down)
    return out, fps, "dib"


def encode_avi(frames: np.ndarray, fps: float = 10.0,
               codec: str = "dib", quality: int = 85,
               strip_dht: bool = False) -> bytes:
    """``(n, h, w, 3)`` uint8 RGB frames → AVI bytes.

    ``codec="dib"`` writes uncompressed bottom-up BGR bitmaps;
    ``codec="mjpg"`` writes each frame as an independent baseline
    JPEG at ``quality`` (motion JPEG).  ``strip_dht=True`` (mjpg only)
    drops the DHT segments from each frame — the DHT-less MJPEG
    convention real capture hardware emits — to exercise the decoder's
    implied-Annex-K-tables path."""
    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3 or 0 in arr.shape[:3]:
        raise ValueError(f"need non-empty (n, h, w, 3) RGB frames, "
                         f"got {arr.shape}")
    if codec not in ("dib", "mjpg"):
        raise ValueError("codec must be 'dib' or 'mjpg'")
    n, h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def chunk(cc: bytes, data: bytes) -> bytes:
        pad = b"\0" if len(data) & 1 else b""
        return cc + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    movi_frames = []
    if codec == "mjpg":
        from .jpeg_codec import encode_jpeg

        for i in range(n):
            jpg = encode_jpeg(arr[i], quality=quality)
            if strip_dht:
                jpg = _drop_dht(jpg)
            movi_frames.append(chunk(b"00dc", jpg))
        frame_size = max(len(f) - 8 for f in movi_frames)
        handler, comp = b"MJPG", MJPG_FOURCC
    else:
        for i in range(n):
            bgr_bottom_up = arr[i, ::-1, :, ::-1]  # RGB → BGR, bottom-up
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, :w * 3] = bgr_bottom_up.reshape(h, w * 3)
            movi_frames.append(chunk(b"00db", rows.tobytes()))
        handler, comp = b"DIB ", 0

    avih = struct.pack("<IIIIIIIIIIIIII",
                       int(1e6 / fps), frame_size * int(fps), 0, 0x10,
                       n, 0, 1, frame_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + handler + struct.pack(
        "<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, int(round(fps)), 0, n,
        frame_size, 0xFFFFFFFF & -1, 0, 0, 0, w, h))
    strf = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, comp,
                       frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(movi_frames))

    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _drop_dht(jpg: bytes) -> bytes:
    """Remove every DHT (0xFFC4) segment — the DHT-less MJPEG form."""
    out = bytearray(jpg[:2])
    i = 2
    n = len(jpg)
    while i + 4 <= n:
        if jpg[i] != 0xFF:
            break
        marker = jpg[i + 1]
        if marker == 0xDA:                      # SOS: copy the rest
            out += jpg[i:]
            return bytes(out)
        seg_len = struct.unpack(">H", jpg[i + 2:i + 4])[0]
        if marker != 0xC4:
            out += jpg[i:i + 2 + seg_len]
        i += 2 + seg_len
    return bytes(out)
