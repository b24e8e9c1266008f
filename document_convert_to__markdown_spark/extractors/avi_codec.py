"""From-scratch AVI demux/mux for uncompressed video — stdlib + numpy.

Fourth sibling of ``png_codec``/``gif_codec``/``wav_codec``, and the
one that makes the video modality real: AVI is RIFF (the same chunk
grammar as WAV), and the ``BI_RGB`` uncompressed-DIB codec is no codec
at all — each frame is a bottom-up BGR bitmap.  Compressed video
(H.264/VP9/MJPEG) genuinely needs entropy/transform coders the
container can't ship, so those stay on the labeled stub path; raw-DIB
AVI gives ``video_frame_sample`` a real demux loop — container walk,
frame framing, stride/padding, channel order — which is the part a
Spark pipeline owns (swapping raw DIB for an ffmpeg call changes the
per-frame decode, not the plumbing).

- ``decode_avi``: RIFF walk (``hdrl`` → ``avih``/``strh``/``strf``,
  ``movi`` → ``00db``/``00dc`` chunks), 24-bit BI_RGB only,
  bottom-up row order and 4-byte row padding reversed, BGR → RGB.
  Compressed streams raise ``UnsupportedAvi``; malformed ones raise
  ``ValueError`` (never a non-ValueError escape — the kernels' stub
  fallback catches ValueError only).
- ``encode_avi``: ``(n, h, w, 3)`` RGB frames → single-video-stream
  AVI bytes (the test/synthesizer twin).
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedAvi(ValueError):
    """Valid AVI outside the implemented subset (compressed codec...)."""


def _walk(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for RIFF chunks in range."""
    while pos + 8 <= end:
        cc = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if pos + 8 + size > end:
            raise ValueError("truncated AVI chunk")
        yield cc, pos + 8, size
        pos += 8 + size + (size & 1)            # word-aligned


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """AVI bytes → ``((n_frames, h, w, 3) uint8 RGB, fps)``."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    width = height = None
    fps = 0.0
    compression = None
    bitcount = None
    frames: list[np.ndarray] = []

    def walk_list(pos: int, end: int) -> None:
        nonlocal width, height, fps, compression, bitcount
        for cc, body, size in _walk(payload, pos, end):
            if cc == b"LIST":
                walk_list(body + 4, body + size)   # skip the list type
            elif cc == b"avih" and size >= 32:
                (usec_per_frame,) = struct.unpack(
                    "<I", payload[body:body + 4])
                if usec_per_frame:
                    fps = round(1e6 / usec_per_frame, 3)
            elif cc == b"strf" and size >= 40 and width is None:
                # BITMAPINFOHEADER: biSize biWidth biHeight biPlanes
                # biBitCount biCompression ...
                _sz, w, h, _planes, bits, comp = struct.unpack(
                    "<IiihHI", payload[body:body + 20])
                width, height = w, abs(h)
                bitcount, compression = bits, comp
            elif cc[2:4] in (b"db", b"dc"):        # '00db'/'00dc' frame
                frames.append(np.frombuffer(
                    payload[body:body + size], dtype=np.uint8))

    walk_list(12, len(payload))

    if width is None or not frames:
        raise ValueError("AVI missing stream format / frame data")
    if compression != 0 or bitcount != 24:      # 0 = BI_RGB
        raise UnsupportedAvi(
            f"AVI codec not uncompressed 24-bit BI_RGB "
            f"(biCompression={compression}, biBitCount={bitcount})")
    stride = (width * 3 + 3) & ~3               # rows pad to 4 bytes
    out = np.empty((len(frames), height, width, 3), dtype=np.uint8)
    for i, raw in enumerate(frames):
        if raw.size < stride * height:
            raise ValueError("AVI frame data short")
        rows = raw[:stride * height].reshape(height, stride)
        bgr = rows[:, :width * 3].reshape(height, width, 3)
        out[i] = bgr[::-1, :, ::-1]             # bottom-up, BGR → RGB
    return out, fps


def encode_avi(frames: np.ndarray, fps: float = 10.0) -> bytes:
    """``(n, h, w, 3)`` uint8 RGB frames → uncompressed AVI bytes."""
    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"need (n, h, w, 3) RGB frames, got {arr.shape}")
    n, h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def chunk(cc: bytes, data: bytes) -> bytes:
        pad = b"\0" if len(data) & 1 else b""
        return cc + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack("<IIIIIIIIIIIIII",
                       int(1e6 / fps), frame_size * int(fps), 0, 0x10,
                       n, 0, 1, frame_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, int(round(fps)), 0, n,
        frame_size, 0xFFFFFFFF & -1, 0, 0, 0, w, h))
    strf = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0,
                       frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_frames = []
    for i in range(n):
        bgr_bottom_up = arr[i, ::-1, :, ::-1]   # RGB → BGR, bottom-up
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w * 3] = bgr_bottom_up.reshape(h, w * 3)
        movi_frames.append(chunk(b"00db", rows.tobytes()))
    movi = lst(b"movi", b"".join(movi_frames))

    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
