"""From-scratch FLAC decode/encode — stdlib ``struct`` + numpy only.

FLAC (RFC 9639) is the lossless compressed sibling of WAV in web audio
datasets.  Like the PNG/GIF/JPEG/WebP codecs in this package, the
container has no audio libraries, so the subset a training-data
pipeline actually meets is implemented from the public spec:

- ``decode_flac``: STREAMINFO walk, frame sync + header (all block-
  size/sample-rate codes, UTF-8 coded frame numbers, CRC-8 verified),
  subframe types CONSTANT / VERBATIM / FIXED orders 0-4 / LPC orders
  1-32 (quantized-coefficient prediction with signed shift), rice
  residuals in both 4-bit and 5-bit parameter methods incl. partition
  orders and the escape-to-raw code, wasted-bits shifting, and all
  four channel assignments (independent, left/side, right/side,
  mid/side).  Output matches ``wav_codec.decode_wav``'s contract:
  ``(mono float32 in [-1, 1], sample_rate)`` via mean downmix.
- ``encode_flac``: 16-bit mono/stereo float samples → a real FLAC
  stream (fixed-order predictors with single-partition rice coding,
  cycling CONSTANT/VERBATIM/FIXED-0/1/2 and, for stereo, the
  left/side + mid/side assignments, correct CRC-8/CRC-16) — the
  decoder's roundtrip twin, so every subframe type and channel mode
  is exercised without any external FLAC to import.
- ``flac_meta``: header-only STREAMINFO probe for ``media_metadata``.

Frame CRC-16s are written by the encoder and *checked* by the decoder
(a corrupt frame dies as ValueError, never a silent wrong decode).
Anything outside the subset (bit depths other than 8/16/24) raises
``UnsupportedFlac`` so callers fall back to their stub path.

Residual decoding is per-sample by nature (each rice code's length
depends on the previous bit position), but quotients jump via a
precomputed one-bit index (``searchsorted``), so the Python loop does
O(1) numpy work per sample.
"""

from __future__ import annotations

import struct
from typing import NamedTuple, Optional

import numpy as np

FLAC_SIG = b"fLaC"

_FIXED_COEFS = {0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1),
                4: (4, -6, 4, -1)}

_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}


class UnsupportedFlac(ValueError):
    """Valid FLAC outside the implemented subset (exotic bit depth)."""


class FlacMeta(NamedTuple):
    channels: int
    sample_rate: int
    bits_per_sample: int
    total_samples: int
    duration_sec: float


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top \
                else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 (RFC 9639 §9.1.3)."""
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 (§9.1.4)."""
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) ^ t[(crc >> 8) ^ b]) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over raw bytes — plain integer arithmetic
    (profiled: a numpy unpackbits bit array plus per-call slicing cost
    more than the whole entropy decode; byte-slice ``int.from_bytes``
    reads and a byte-scan unary are 3-5× faster)."""

    def __init__(self, buf: bytes):
        self._buf = buf
        self._nbits = len(buf) << 3
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        e = p + n
        if e > self._nbits:
            raise ValueError("truncated FLAC bitstream")
        self.pos = e
        first = p >> 3
        v = int.from_bytes(self._buf[first:(e + 7) >> 3], "big")
        return (v >> ((((e + 7) >> 3) - first) * 8 - (e - (first << 3)))) \
            & ((1 << n) - 1)

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        buf = self._buf
        p = self.pos
        byte = p >> 3
        if byte >= len(buf):
            raise ValueError("truncated FLAC unary code")
        cur = buf[byte] & (0xFF >> (p & 7))
        while cur == 0:
            byte += 1
            if byte >= len(buf):
                raise ValueError("truncated FLAC unary code")
            cur = buf[byte]
        one = (byte << 3) + (8 - cur.bit_length())
        self.pos = one + 1
        return one - p

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_utf8_number(r: _Bits) -> int:
    """The UTF-8-style coded frame/sample number (§9.1.5)."""
    first = r.read(8)
    if first < 0x80:
        return first
    n_cont = 0
    mask = 0x40
    while first & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise ValueError("bad FLAC coded number")
    v = first & (mask - 1)
    for _ in range(n_cont):
        b = r.read(8)
        if b >> 6 != 0b10:
            raise ValueError("bad FLAC coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _decode_residuals(r: _Bits, block_size: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    # the first partition holds (block_size >> order) - order samples;
    # ZERO is legal (a fully-warmup block), so reject only < order
    if block_size % n_parts or (block_size >> part_order) < order:
        raise ValueError("bad FLAC partition order")
    out = np.empty(block_size - order, dtype=np.int64)
    w = 0
    for p in range(n_parts):
        n = (block_size >> part_order) - (order if p == 0 else 0)
        k = r.read(param_bits)
        if k == escape:
            nbits = r.read(5)
            for _ in range(n):
                out[w] = r.sread(nbits) if nbits else 0
                w += 1
        else:
            for _ in range(n):
                q = r.unary()
                u = (q << k) | (r.read(k) if k else 0)
                out[w] = (u >> 1) ^ -(u & 1)     # zigzag
                w += 1
    return out


def _decode_subframe(r: _Bits, block_size: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):                                # wasted-bits flag
        wasted = r.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")

    if ftype == 0:                               # CONSTANT
        x = np.full(block_size, r.sread(eff), dtype=np.int64)
    elif ftype == 1:                             # VERBATIM
        x = np.array([r.sread(eff) for _ in range(block_size)],
                     dtype=np.int64)
    elif 8 <= ftype <= 12:                       # FIXED order 0-4
        order = ftype - 8
        warm = [r.sread(eff) for _ in range(order)]
        res = _decode_residuals(r, block_size, order)
        # the fixed predictors are exactly the order-o finite
        # difference (residual = D^o x), so reconstruction is o
        # cumulative sums, each seeded with the boundary difference
        # D^lvl x[order-1] computed from the warmup samples — no
        # per-sample Python loop
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warm
        cur = res
        for lvl in range(order - 1, -1, -1):
            boundary = 0
            sign = 1
            c = 1
            for k in range(lvl + 1):             # D^lvl x at order-1
                boundary += sign * c * warm[order - 1 - k]
                sign = -sign
                c = c * (lvl - k) // (k + 1)
            cur = boundary + np.cumsum(cur)
        x[order:] = cur
    elif ftype >= 32:                            # LPC order 1-32
        order = ftype - 31
        warm = [r.sread(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:                      # 0b1111 + 1: invalid
            raise ValueError("invalid FLAC LPC precision")
        shift = r.sread(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [r.sread(precision) for _ in range(order)]
        res = _decode_residuals(r, block_size, order)
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warm
        for i in range(order, block_size):
            pred = 0
            for j in range(order):
                pred += coefs[j] * x[i - 1 - j]
            x[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        x <<= wasted
    return x


def _parse_streaminfo(body: bytes) -> FlacMeta:
    if len(body) < 34:
        raise ValueError("truncated FLAC STREAMINFO")
    r = _Bits(body)
    r.read(16)                                   # min block size
    r.read(16)                                   # max block size
    r.read(24)                                   # min frame size
    r.read(24)                                   # max frame size
    rate = r.read(20)
    channels = r.read(3) + 1
    bits = r.read(5) + 1
    total = r.read(36)
    if rate == 0:
        raise ValueError("bad FLAC sample rate")
    dur = total / rate if rate else 0.0
    return FlacMeta(channels, rate, bits, total, round(dur, 3))


def flac_meta(payload: bytes) -> Optional[FlacMeta]:
    """Header-only STREAMINFO probe; None if malformed."""
    if len(payload) < 42 or payload[:4] != FLAC_SIG:
        return None
    try:
        pos = 4
        while pos + 4 <= len(payload):
            hdr0 = payload[pos]
            length = int.from_bytes(payload[pos + 1:pos + 4], "big")
            if hdr0 & 0x7F == 0:
                return _parse_streaminfo(payload[pos + 4:pos + 4 + length])
            if hdr0 & 0x80:
                break
            pos += 4 + length
    except ValueError:
        return None
    return None


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → ``(mono float32 samples in [-1, 1], sample_rate)``.

    Multi-channel streams downmix by mean exactly like ``decode_wav``.
    Raises ``ValueError`` for malformed streams (bad sync, CRC
    mismatch, truncated codes) and ``UnsupportedFlac`` for bit depths
    outside 8/16/24.
    """
    if len(payload) < 4 or payload[:4] != FLAC_SIG:
        raise ValueError("not a FLAC stream (bad signature)")
    pos = 4
    info = None
    while pos + 4 <= len(payload):
        hdr0 = payload[pos]
        length = int.from_bytes(payload[pos + 1:pos + 4], "big")
        if hdr0 & 0x7F == 0:
            info = _parse_streaminfo(payload[pos + 4:pos + 4 + length])
        pos += 4 + length
        if hdr0 & 0x80:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    if info.bits_per_sample not in (8, 16, 24):
        raise UnsupportedFlac(
            f"FLAC bit depth {info.bits_per_sample} outside subset")
    if info.total_samples == 0:
        raise UnsupportedFlac("FLAC with unknown total sample count")
    if info.total_samples * info.channels > 1 << 25:
        # decoded-size ceiling (~256 MiB of int64 samples): CONSTANT
        # subframes amplify ~2400x, and total_samples is a 36-bit
        # header field — without a cap a 1 MB crafted payload can
        # demand tens of GB (the PNG/GIF/APNG/WebP decoders all carry
        # the same class of cap).  UnsupportedFlac → callers' stub
        # fallback, never an executor OOM.
        raise UnsupportedFlac("FLAC decoded size beyond 32M-sample cap")

    r = _Bits(payload[pos:])
    # per-channel list of frame arrays, concatenated ONCE at the end —
    # per-frame np.concatenate would be quadratic over a long stream
    chans: list[list[np.ndarray]] = [[] for _ in range(info.channels)]
    decoded = 0
    while decoded < info.total_samples:
        frame_start = r.byte_pos()
        if r.read(14) != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        r.read(1)                                # reserved
        r.read(1)                                # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)                                # reserved
        _read_utf8_number(r)
        if bs_code == 0 or rate_code == 15 or ch_code > 10:
            raise ValueError("reserved FLAC frame header code")
        if bs_code == 1:
            block_size = 192
        elif 2 <= bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        bps = {0: info.bits_per_sample, 1: 8, 2: 12, 4: 16, 5: 20,
               6: 24, 7: 32}.get(ss_code)
        if bps is None:
            raise ValueError("reserved FLAC sample size code")
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        if r.pos & 7:
            raise ValueError("misaligned FLAC frame header")
        hdr_bytes = payload[pos + frame_start:pos + r.byte_pos()]
        if r.read(8) != _crc8(hdr_bytes):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            n_ch = ch_code + 1
            subs = [_decode_subframe(r, block_size, bps)
                    for _ in range(n_ch)]
        else:
            n_ch = 2
            extra0 = 1 if ch_code == 9 else 0    # right/side: ch 0 is side
            extra1 = 1 if ch_code in (8, 10) else 0
            s0 = _decode_subframe(r, block_size, bps + extra0)
            s1 = _decode_subframe(r, block_size, bps + extra1)
            if ch_code == 8:                     # left/side
                subs = [s0, s0 - s1]
            elif ch_code == 9:                   # right/side
                subs = [s1 + s0, s1]
            else:                                # mid/side
                mid2 = (s0 << 1) | (s1 & 1)
                subs = [(mid2 + s1) >> 1, (mid2 - s1) >> 1]
        if n_ch != info.channels:
            raise ValueError("FLAC frame channel count mismatch")
        r.align()
        frame_bytes = payload[pos + frame_start:pos + r.byte_pos()]
        if r.read(16) != _crc16(frame_bytes):
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(n_ch):
            chans[c].append(subs[c])
        decoded += block_size

    full = [np.concatenate(c) if c else np.empty(0, dtype=np.int64)
            for c in chans]
    total = min(info.total_samples, full[0].size)
    mono = np.mean(np.stack([c[:total] for c in full]), axis=0)
    return (mono / float(1 << (info.bits_per_sample - 1))) \
        .astype(np.float32), info.sample_rate


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    parts = []
    n_cont = 1
    while n >= (1 << (6 * n_cont + (6 - n_cont))):
        n_cont += 1
    for i in range(n_cont):
        parts.append(0x80 | ((n >> (6 * (n_cont - 1 - i))) & 0x3F))
    lead = (0xFF << (7 - n_cont)) & 0xFF | (n >> (6 * n_cont))
    return bytes([lead] + parts)


def _write_residuals(w: _BitWriter, res: np.ndarray) -> None:
    """Single-partition rice (method 0, partition order 0)."""
    u = (np.abs(res) << 1) - (res < 0)           # zigzag
    mean = float(u.mean()) if u.size else 0.0
    k = min(14, max(0, int(mean).bit_length() - 1)) if mean >= 1 else 0
    w.write(0, 2)                                # method 0 (4-bit params)
    w.write(0, 4)                                # partition order 0
    w.write(k, 4)
    for v in u:
        v = int(v)
        q = v >> k
        for _ in range(q):
            w.write(0, 1)
        w.write(1, 1)
        if k:
            w.write(v & ((1 << k) - 1), k)


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int,
                    kind: str) -> None:
    w.write(0, 1)                                # padding bit
    if kind == "constant":
        w.write(0, 6)
        w.write(0, 1)                            # no wasted bits
        w.write(int(x[0]), bps)
        return
    if kind == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in x:
            w.write(int(v), bps)
        return
    order = int(kind[-1])                        # "fixed0/1/2"
    w.write(8 + order, 6)
    w.write(0, 1)
    for v in x[:order]:
        w.write(int(v), bps)
    coefs = _FIXED_COEFS[order]
    res = x[order:].astype(np.int64).copy()
    for j, c in enumerate(coefs):
        res -= c * x[order - 1 - j:x.size - 1 - j]
    _write_residuals(w, res)


def encode_flac(samples: np.ndarray, rate: int = 16000,
                block_size: int = 4096) -> bytes:
    """Float samples in [-1, 1] → FLAC bytes (16-bit).

    ``(n,)`` encodes mono; ``(n, 2)`` stereo.  Subframe kinds cycle
    per frame (CONSTANT when the block is constant, else VERBATIM /
    FIXED order 0/1/2), and stereo frames cycle the channel
    assignments (independent, left/side, mid/side) — the decoder's
    roundtrip twin across every implemented path.
    """
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] not in (1, 2):
        raise ValueError("encode_flac takes (n,) mono or (n, 2) stereo")
    # same quantizer as wav_codec.encode_wav (float32 ×32767, rint)
    q = np.clip(np.rint(arr.astype(np.float32) * 32767.0),
                -32768, 32767).astype(np.int64)
    n, n_ch = q.shape

    out = bytearray(FLAC_SIG)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(n_ch - 1, 3)
    si.write(15, 5)                              # 16-bit: bps-1
    si.write(n, 36)
    si_bytes = bytes(si.out) + (b"\x00" * 16)    # md5 unset (zeros)
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    kinds = ("verbatim", "fixed0", "fixed1", "fixed2")
    for f, start in enumerate(range(0, n, block_size)):
        blk = q[start:start + block_size]
        bs = blk.shape[0]
        ch_code = 0 if n_ch == 1 else (1, 8, 10)[f % 3]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)                            # fixed blocking
        w.write(7, 4)                            # block size: 16-bit at end
        w.write(0, 4)                            # rate: from STREAMINFO
        w.write(ch_code, 4)
        w.write(0b100, 3)                        # 16-bit samples
        w.write(0, 1)
        for b in _utf8_number(f):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.write(_crc8(bytes(w.out)), 8)

        def pick(x):
            if np.all(x == x[0]):
                return "constant"
            kind = kinds[f % len(kinds)]
            # a FIXED subframe needs at least one residual sample
            # beyond its warmup: on a tiny tail block fall back to
            # verbatim instead of emitting order >= block_size
            if kind.startswith("fixed") and int(kind[-1]) >= bs:
                return "verbatim"
            return kind

        if ch_code == 0:
            for c in range(n_ch):
                x = blk[:, c]
                _write_subframe(w, x, 16, pick(x))
        elif ch_code == 1:                       # stereo independent
            for c in range(2):
                x = blk[:, c]
                _write_subframe(w, x, 16, pick(x))
        elif ch_code == 8:                       # left/side
            left = blk[:, 0]
            side = blk[:, 0] - blk[:, 1]
            _write_subframe(w, left, 16, pick(left))
            _write_subframe(w, side, 17, pick(side))
        else:                                    # mid/side
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            side = blk[:, 0] - blk[:, 1]
            _write_subframe(w, mid, 16, pick(mid))
            _write_subframe(w, side, 17, pick(side))
        w.align()
        frame = bytes(w.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)
