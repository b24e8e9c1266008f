"""From-scratch WAV PCM decode/encode — stdlib ``struct`` + numpy.

Third sibling of ``png_codec``/``gif_codec``: RIFF/WAVE PCM needs no
entropy coder at all, so real sample decode is pure chunk walking.
``audio_extractor.wav_meta`` already parses the header for metadata
markdown; this module additionally materializes the sample data for
the multimodal operators (``audio_spectral_hash``).

- ``decode_wav``: PCM (format tag 1) 8-bit unsigned / 16-bit signed,
  any channel count (downmixed to mono by mean), → float32 in [-1, 1]
  plus the sample rate.  Compressed/float WAV (ADPCM, IEEE float,
  extensible) raises ``UnsupportedWav`` so callers fall back to their
  stub path explicitly.
- ``encode_wav``: mono float in [-1, 1] → 16-bit PCM bytes (the test
  and synthesizer twin).
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedWav(ValueError):
    """Valid RIFF/WAVE outside the implemented subset (non-PCM...)."""


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ``(mono float32 samples in [-1, 1], sample_rate)``."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)            # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    fmt_tag, channels, rate, _brate, _block, bits = fmt
    if fmt_tag != 1:
        raise UnsupportedWav(f"WAV format tag {fmt_tag} not PCM")
    if channels < 1 or rate < 1:
        raise ValueError("bad WAV channel count / sample rate")
    if bits == 16:
        usable = (len(data) // (2 * channels)) * 2 * channels
        x = np.frombuffer(data[:usable], dtype="<i2").astype(np.float32)
        x /= 32768.0
    elif bits == 8:                             # 8-bit WAV is unsigned
        usable = (len(data) // channels) * channels
        x = np.frombuffer(data[:usable], dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    else:
        raise UnsupportedWav(f"WAV bit depth {bits} not supported")
    if x.size == 0:
        raise ValueError("empty WAV data chunk")
    return x.reshape(-1, channels).mean(axis=1), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono float samples in [-1, 1] → 16-bit PCM WAV bytes."""
    x = np.asarray(samples, dtype=np.float32).reshape(-1)
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
