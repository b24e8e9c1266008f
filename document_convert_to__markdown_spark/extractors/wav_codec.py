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


# ------------------------------------------------------------------ AIFF
# AIFF (Apple's EA IFF 85 audio form) is WAV's big-endian twin and the
# other uncompressed PCM container crawls meet.  Same decode contract.

AIFF_FORM = b"FORM"


class UnsupportedAiff(ValueError):
    """Valid AIFF outside the implemented subset (AIFC compression)."""


def _read_extended80(b: bytes) -> float:
    """80-bit IEEE 754 extended float (the COMM sample rate field):
    1 sign bit, 15 exponent bits (bias 16383), 64 mantissa bits with
    an explicit integer bit."""
    if len(b) < 10:
        raise ValueError("truncated AIFF extended float")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("non-finite AIFF sample rate")
    if not 16363 <= exp <= 16403:
        # real sample rates live in [1, ~10^6]; a crafted exponent
        # like 0x7FFE would make 2.0**e raise OverflowError, which
        # escapes every caller's ValueError handling and kills the
        # Arrow batch task — refuse it as a ValueError instead
        raise ValueError("AIFF sample rate exponent out of range")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def aiff_meta(payload: bytes):
    """(channels, rate, bits, n_frames) from the COMM chunk; None if
    the container is malformed."""
    if len(payload) < 12 or payload[:4] != AIFF_FORM \
            or payload[8:12] not in (b"AIFF", b"AIFC"):
        return None
    pos = 12
    try:
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            (size,) = struct.unpack(">I", payload[pos + 4:pos + 8])
            body = payload[pos + 8:pos + 8 + size]
            if cid == b"COMM" and len(body) >= 18:
                channels, n_frames, bits = struct.unpack(">HIH", body[:8])
                rate = _read_extended80(body[8:18])
                return (channels, int(round(rate)), bits, n_frames)
            pos += 8 + size + (size & 1)        # chunks are word-aligned
    except (struct.error, ValueError):
        return None
    return None


def decode_aiff(payload: bytes) -> tuple[np.ndarray, int]:
    """AIFF bytes → ``(mono float32 samples in [-1, 1], sample_rate)``.

    8/16-bit big-endian signed PCM (AIFF's PCM is always signed,
    unlike 8-bit WAV); AIFC compressed forms raise ``UnsupportedAiff``.
    """
    if len(payload) < 12 or payload[:4] != AIFF_FORM:
        raise ValueError("not an AIFF FORM file")
    form = payload[8:12]
    if form == b"AIFC":
        raise UnsupportedAiff("AIFC compression not supported")
    if form != b"AIFF":
        raise ValueError("not an AIFF form type")
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack(">I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"COMM" and len(body) >= 18:
            channels, n_frames, bits = struct.unpack(">HIH", body[:8])
            comm = (channels, n_frames, bits, _read_extended80(body[8:18]))
        elif cid == b"SSND" and len(body) >= 8:
            offset, _blk = struct.unpack(">II", body[:8])
            ssnd = body[8 + offset:]
        pos += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    channels, n_frames, bits, rate_f = comm
    rate = int(round(rate_f))
    if channels < 1 or rate < 1:
        raise ValueError("bad AIFF channel count / sample rate")
    if bits == 16:
        usable = (len(ssnd) // (2 * channels)) * 2 * channels
        x = np.frombuffer(ssnd[:usable], dtype=">i2").astype(np.float32)
        x /= 32768.0
    elif bits == 8:                             # AIFF 8-bit is SIGNED
        usable = (len(ssnd) // channels) * channels
        x = np.frombuffer(ssnd[:usable], dtype=np.int8).astype(np.float32)
        x /= 128.0
    else:
        raise UnsupportedAiff(f"AIFF bit depth {bits} not supported")
    if x.size == 0:
        raise ValueError("empty AIFF SSND chunk")
    n = min(x.size // channels, n_frames) * channels if n_frames else x.size
    return x[:n].reshape(-1, channels).mean(axis=1), rate


def _extended80(v: float) -> bytes:
    """Encode a positive sample rate as the 80-bit extended float."""
    if v <= 0:
        raise ValueError("sample rate must be positive")
    m, e = np.frexp(v)                          # v = m * 2**e, m in [.5,1)
    mant = int(m * (1 << 64))
    return struct.pack(">HQ", (int(e) - 1) + 16383, mant)


def encode_aiff(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono float samples in [-1, 1] → 16-bit PCM AIFF bytes (the
    decoder's test twin, same quantizer as ``encode_wav``)."""
    x = np.asarray(samples, dtype=np.float32).reshape(-1)
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype(">i2")
    data = pcm.tobytes()
    comm = struct.pack(">HIH", 1, pcm.size, 16) + _extended80(float(rate))
    ssnd = struct.pack(">II", 0, 0) + data
    body = (b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
            + (b"\x00" if len(ssnd) & 1 else b""))
    return AIFF_FORM + struct.pack(">I", len(body)) + body
