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
