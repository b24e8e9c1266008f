# -*- coding: utf-8 -*-
"""WAV audio → metadata markdown — real RIFF header parse (no stub).

Audio formats are in the reference's supported list
(converter.py:772-787: .mp3 .wav .m4a .flac .aac, converted through
MarkItDown which emits file metadata ± transcription).  Decode libraries
aren't in this container, but WAV metadata needs none: the RIFF fmt
chunk carries channels / sample rate / bit depth, and the data chunk
size gives the duration — all parsed here from bytes.  The markdown
template mirrors the image-passthrough metadata convention
(document_processors.py:994-1011).
"""

from __future__ import annotations

import struct
from typing import NamedTuple, Optional


class WavMeta(NamedTuple):
    channels: int
    sample_rate: int
    bits_per_sample: int
    n_frames: int
    duration_sec: float


def wav_meta(payload: bytes) -> Optional[WavMeta]:
    """Parse RIFF/WAVE chunks; None if the container is malformed."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            _fmt_tag, channels, rate, _brate, block, bits = struct.unpack(
                "<HHIIHH", body[:16])
            fmt = (channels, rate, block, bits)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    channels, rate, block, bits = fmt
    frame_size = block or max(1, channels * bits // 8)
    n_frames = data_size // max(frame_size, 1)
    duration = n_frames / rate if rate else 0.0
    return WavMeta(channels, rate, bits, n_frames, round(duration, 3))


# MPEG1 Layer III bitrate (kbps) and sample-rate tables, header indices.
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                 256, 320, 0)
_MP3_RATES = (44100, 48000, 32000, 0)


class Mp3Meta(NamedTuple):
    bitrate_kbps: int
    sample_rate: int
    id3_size: int
    duration_sec: float


def mp3_meta(payload: bytes) -> Optional[Mp3Meta]:
    """ID3v2 header + first MPEG1-Layer-III frame header; None if neither
    a valid tag nor a frame sync is found."""
    pos = 0
    id3_size = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        # syncsafe 28-bit size (7 bits per byte)
        b = payload[6:10]
        id3_size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
        pos = 10 + id3_size

    # find the first frame sync within a bounded window
    window = payload[pos:pos + 4096]
    for i in range(len(window) - 3):
        b0, b1, b2 = window[i], window[i + 1], window[i + 2]
        if b0 == 0xFF and (b1 & 0xE0) == 0xE0:
            version = (b1 >> 3) & 0x3
            layer = (b1 >> 1) & 0x3
            if version != 0x3 or layer != 0x1:  # MPEG1 Layer III only
                continue
            bitrate = _MP3_BITRATES[(b2 >> 4) & 0xF]
            rate = _MP3_RATES[(b2 >> 2) & 0x3]
            if not bitrate or not rate:
                continue
            audio_bytes = len(payload) - pos - i
            duration = audio_bytes * 8 / (bitrate * 1000)
            return Mp3Meta(bitrate, rate, id3_size, round(duration, 3))
    return None


def mp3_to_markdown(payload: bytes, doc_name: str) -> Optional[str]:
    meta = mp3_meta(payload)
    if meta is None:
        return None
    return (
        f"# {doc_name}\n\n"
        f"**音频文件信息**\n\n"
        f"- 格式: MP3 (MPEG1 Layer III)\n"
        f"- 比特率: {meta.bitrate_kbps} kbps\n"
        f"- 采样率: {meta.sample_rate} Hz\n"
        f"- 时长: {meta.duration_sec} 秒\n"
        f"- 文件大小: {len(payload)} 字节\n"
    )


def wav_to_markdown(payload: bytes, doc_name: str) -> Optional[str]:
    meta = wav_meta(payload)
    if meta is None:
        return None
    return (
        f"# {doc_name}\n\n"
        f"**音频文件信息**\n\n"
        f"- 格式: WAV (PCM)\n"
        f"- 声道数: {meta.channels}\n"
        f"- 采样率: {meta.sample_rate} Hz\n"
        f"- 位深度: {meta.bits_per_sample} bit\n"
        f"- 时长: {meta.duration_sec} 秒\n"
        f"- 文件大小: {len(payload)} 字节\n"
    )


def flac_to_markdown(payload: bytes, doc_name: str) -> Optional[str]:
    """FLAC → metadata markdown, same template family as WAV/MP3
    (reference converter.py:772-787 lists .flac among the supported
    audio extensions; MarkItDown emits file metadata for it)."""
    from .flac_codec import flac_meta

    meta = flac_meta(payload)
    if meta is None:
        return None
    return (
        f"# {doc_name}\n\n"
        f"**音频文件信息**\n\n"
        f"- 格式: FLAC (无损)\n"
        f"- 声道数: {meta.channels}\n"
        f"- 采样率: {meta.sample_rate} Hz\n"
        f"- 位深度: {meta.bits_per_sample} bit\n"
        f"- 时长: {meta.duration_sec} 秒\n"
        f"- 文件大小: {len(payload)} 字节\n"
    )


def aiff_to_markdown(payload: bytes, doc_name: str) -> Optional[str]:
    """AIFF → metadata markdown (WAV's big-endian twin; the reference's
    MarkItDown audio path treats uncompressed PCM containers alike)."""
    from .wav_codec import aiff_meta

    meta = aiff_meta(payload)
    if meta is None:
        return None
    channels, rate, bits, n_frames = meta
    duration = round(n_frames / rate, 3) if rate else 0.0
    return (
        f"# {doc_name}\n\n"
        f"**音频文件信息**\n\n"
        f"- 格式: AIFF (PCM)\n"
        f"- 声道数: {channels}\n"
        f"- 采样率: {rate} Hz\n"
        f"- 位深度: {bits} bit\n"
        f"- 时长: {duration} 秒\n"
        f"- 文件大小: {len(payload)} 字节\n"
    )
