"""From-scratch lossy WebP (VP8 key-frame) codec — stdlib + numpy only.

Implements the VP8 still-image decode pipeline of RFC 6386 ("VP8 Data
Format and Decoding Guide"): the boolean arithmetic decoder (§7), the
key-frame header grammar (§9), intra prediction in all 16×16 / 4×4 /
chroma modes with the frame-edge 127/129 conventions (§11-12), the
token-tree residual decoder with per-band contextual probabilities
(§13), dequantization (§14.1), the exact integer inverse WHT/DCT
(§14.3-14.4), and both loop filters — simple and normal, with
segment/sharpness strength derivation (§15).  Lossy WebP is exactly
one VP8 key frame, so intra-only coverage is complete coverage for
stills; inter-frame features (golden/altref, motion vectors) do not
occur and are refused.

The empirical constant tables (quantizer lookups, default token
probabilities, update probabilities, key-frame B-mode probabilities)
live in ``vp8_tables.py`` with their provenance note; trees, category
extra-bit probabilities, bands, and the zigzag order are transcribed
from RFC 6386 §8.1/§11.3/§13.2-13.5.

Validation: differential pixel parity against the system libwebp
(``tests/test_libwebp_vp8_parity.py``) — libwebp-encoded lossy WebPs
across qualities/sizes/filter settings must decode here to the exact
Y/U/V planes libwebp itself produces (first with ``bypass_filtering``
isolating reconstruction, then with the loop filter on).  The boolean
decoder makes this an all-or-nothing gate: one mis-parsed header bit
or one wrong probability byte desynchronizes every later symbol.

``encode_vp8`` is a minimal-but-valid key-frame writer (16×16
DC_PRED, quality-mapped quantizer, optional loop filter level, real
forward WHT/DCT + the spec's token encoder through the boolean
encoder of §8) used by the synthesizer and tests, so the decoder is
exercisable without libwebp at runtime.

Performance posture (same as ``jpeg_codec``): the boolean decoder is
per-token Python and the loop filter runs per-edge numpy — ~3 ms for
a 32×32 thumbnail, ~0.8 s for 320×256, capped at 512k pixels.  Fine
for the fixture/thumbnail scale this container processes; a
production swap-in is libwebp behind the same two function
signatures.  The loop filter gathers each edge's 8 taps as one
(n, 8) window — per-line numpy calls, not arithmetic, dominated the
first profile.

Reference parity note: the reference engine (HE1780) delegates image
handling to MarkItDown/PIL (reference ``src/config.py:37-57``); this
codec exists for the multimodal training-data operators.
"""

from __future__ import annotations

import struct

import numpy as np

from .vp8_tables import (
    AC_QUANT,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QUANT,
    KF_BMODE_PROBS,
)


class UnsupportedVP8(ValueError):
    """Valid VP8 outside the implemented subset (inter frames,
    oversized-for-pure-Python images)."""


# Pure-Python entropy decode: cap hostile allocations like the other
# codecs.  512k pixels covers thumbnails/test images comfortably.
_MAX_PIXELS = 1 << 19

# ------------------------------------------------------------- tables
# RFC 6386 §13.2: coefficient position -> probability band (the 17th
# entry is the dummy band for the position+1 lookahead at n == 15).
_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7, 0)

# §13.3: zigzag scan order.
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# §13.2: extra-bit probabilities for the DCT value categories.
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)

# Intra-mode numbering (matches the ordering KF_BMODE_PROBS is
# indexed by): 16x16 modes share the first four B-mode slots.
_B_DC, _B_TM, _B_VE, _B_HE = 0, 1, 2, 3
_B_RD, _B_VR, _B_LD, _B_VL, _B_HD, _B_HU = 4, 5, 6, 7, 8, 9
_DC_PRED, _TM_PRED, _V_PRED, _H_PRED = _B_DC, _B_TM, _B_VE, _B_HE

# §11.3: key-frame subblock-mode tree (leaves use the numbering
# above; probability index for a node is node_index >> 1).
_BMODE_TREE = (-_B_DC, 2, -_B_TM, 4, -_B_VE, 6, 8, 12,
               -_B_HE, 10, -_B_RD, -_B_VR, -_B_LD, 14,
               -_B_VL, 16, -_B_HD, -_B_HU)

# §9.3: macroblock segment-id tree.
_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)


# --------------------------------------------------------- bool coder

class _BoolReader:
    """RFC 6386 §7.3 boolean decoder.  Reads up to 8 virtual zero
    bytes past the end (conforming streams may read a few bits past
    their last byte); beyond that the stream is truncated."""

    __slots__ = ("_d", "_n", "_pos", "_value", "_range", "_bits",
                 "_virtual")

    def __init__(self, data: bytes):
        self._d = data
        self._n = len(data)
        v = 0
        for i in range(2):
            v = (v << 8) | (data[i] if i < len(data) else 0)
        self._pos = 2
        self._value = v
        self._range = 255
        self._bits = 0
        self._virtual = max(0, 2 - len(data))

    def get(self, prob: int) -> int:
        rng = self._range
        split = 1 + (((rng - 1) * prob) >> 8)
        big = split << 8
        value = self._value
        if value >= big:
            bit = 1
            rng -= split
            value -= big
        else:
            bit = 0
            rng = split
        bits = self._bits
        while rng < 128:
            value <<= 1
            rng <<= 1
            bits += 1
            if bits == 8:
                bits = 0
                pos = self._pos
                if pos < self._n:
                    value |= self._d[pos]
                    self._pos = pos + 1
                else:
                    self._virtual += 1
                    if self._virtual > 8:
                        raise ValueError("truncated VP8 bool stream")
        self._value = value
        self._range = rng
        self._bits = bits
        return bit

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def flag_signed(self, n: int) -> int:
        """Optional delta: flag bit, then n-bit magnitude + sign."""
        return self.signed_literal(n) if self.get(128) else 0

    def tree(self, tree: tuple, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


class _BoolWriter:
    """RFC 6386 §8.1 boolean encoder (carry-propagating)."""

    def __init__(self):
        self._low = 0
        self._range = 255
        self._count = -24
        self._out = bytearray()

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self._range - 1) * prob) >> 8)
        if bit:
            self._low += split
            self._range -= split
        else:
            self._range = split
        while self._range < 128:
            self._range <<= 1
            if self._low & 0x80000000:          # carry out
                i = len(self._out) - 1
                while i >= 0 and self._out[i] == 0xFF:
                    self._out[i] = 0
                    i -= 1
                if i < 0:
                    # a carry past the stream start would corrupt the
                    # partition silently; never observed (directed
                    # fuzzing included), but refuse rather than emit
                    raise ValueError(
                        "bool-coder carry past stream start")
                self._out[i] += 1
            self._low = (self._low << 1) & 0xFFFFFFFF
            self._count += 1
            if self._count == 0:
                self._out.append((self._low >> 24) & 0xFF)
                self._low &= 0xFFFFFF
                self._count = -8

    def put_literal(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put(128, (value >> i) & 1)

    def put_signed(self, value: int, n: int) -> None:
        self.put_literal(abs(value), n)
        self.put(128, 1 if value < 0 else 0)

    def getvalue(self) -> bytes:
        for _ in range(32):
            self.put(128, 0)
        return bytes(self._out)


# ------------------------------------------------------ header parse

def _parse_header(data: bytes):
    """Frame tag + §9 key-frame header from partition 0."""
    if len(data) < 10:
        raise ValueError("truncated VP8 frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise UnsupportedVP8("inter frame (not a still image)")
    version = (tag >> 1) & 7
    if version > 3:
        raise ValueError(f"bad VP8 version {version}")
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 start code")
    w16, h16 = struct.unpack_from("<HH", data, 6)
    width, height = w16 & 0x3FFF, h16 & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("empty VP8 frame")
    if width * height > _MAX_PIXELS:
        raise UnsupportedVP8(
            f"{width}x{height} beyond pure-Python decode cap")
    if 10 + part0_size > len(data):
        raise ValueError("truncated VP8 partition 0")
    br = _BoolReader(data[10:10 + part0_size])

    hdr = {"width": width, "height": height}
    if br.get(128):
        raise UnsupportedVP8("non-4:2:0 color space bit set")
    hdr["clamp_type"] = br.get(128)

    # §9.3 segmentation
    seg_enabled = br.get(128)
    update_map = False
    seg_tree_probs = [255, 255, 255]
    seg_quants = [None] * 4          # absolute qi per segment, or None
    seg_filters = [None] * 4
    seg_abs = 0
    if seg_enabled:
        update_map = bool(br.get(128))
        update_data = br.get(128)
        if update_data:
            seg_abs = br.get(128)
            qv = [br.flag_signed(7) for _ in range(4)]
            fv = [br.flag_signed(6) for _ in range(4)]
            seg_quants = qv
            seg_filters = fv
        if update_map:
            for i in range(3):
                seg_tree_probs[i] = br.literal(8) if br.get(128) else 255
    hdr["seg_enabled"] = seg_enabled
    hdr["update_map"] = update_map
    hdr["seg_tree_probs"] = seg_tree_probs
    hdr["seg_abs"] = seg_abs

    # §9.4 loop filter
    hdr["filter_simple"] = br.get(128)
    hdr["filter_level"] = br.literal(6)
    hdr["sharpness"] = br.literal(3)
    ref_deltas = [0, 0, 0, 0]
    mode_deltas = [0, 0, 0, 0]
    lf_delta = br.get(128)
    if lf_delta and br.get(128):
        for i in range(4):
            if br.get(128):
                ref_deltas[i] = br.signed_literal(6)
        for i in range(4):
            if br.get(128):
                mode_deltas[i] = br.signed_literal(6)
    hdr["lf_delta"] = lf_delta
    hdr["ref_deltas"] = ref_deltas
    hdr["mode_deltas"] = mode_deltas

    # §9.5 token partitions
    n_parts = 1 << br.literal(2)
    hdr["n_parts"] = n_parts

    # §9.6 quantizer indices, resolved per segment (abs or delta)
    base_q = br.literal(7)
    dqs = [br.flag_signed(4) for _ in range(5)]
    resolved = []
    for s in range(4):
        sq = seg_quants[s]
        if not seg_enabled or sq is None:
            q = base_q
        elif seg_abs:
            q = sq
        else:
            q = base_q + sq
        resolved.append(q)

    def clip(v, m=127):
        return 0 if v < 0 else m if v > m else v

    quants = []
    for q in resolved:
        y2_ac = (AC_QUANT[clip(q + dqs[2])] * 155) // 100
        quants.append((
            DC_QUANT[clip(q + dqs[0])],
            AC_QUANT[clip(q)],
            DC_QUANT[clip(q + dqs[1])] * 2,
            y2_ac if y2_ac >= 8 else 8,
            DC_QUANT[clip(q + dqs[3], 117)],
            AC_QUANT[clip(q + dqs[4])],
        ))
    hdr["quants"] = quants

    # filter strength per segment (resolved the same way)
    seg_level = []
    for s in range(4):
        fv = seg_filters[s]
        if not seg_enabled or fv is None:
            lvl = hdr["filter_level"]
        elif seg_abs:
            lvl = fv
        else:
            lvl = hdr["filter_level"] + fv
        seg_level.append(0 if lvl < 0 else 63 if lvl > 63 else lvl)
    hdr["seg_filter_level"] = seg_level

    # §9.8 refresh entropy (key frame: value irrelevant for stills)
    br.get(128)

    # §9.9 coefficient probability updates
    probs = [[[list(COEFF_PROBS[((t * 8 + b) * 3 + c) * 11:
                                ((t * 8 + b) * 3 + c) * 11 + 11])
               for c in range(3)] for b in range(8)] for t in range(4)]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                base = ((t * 8 + b) * 3 + c) * 11
                for p in range(11):
                    if br.get(COEFF_UPDATE_PROBS[base + p]):
                        probs[t][b][c][p] = br.literal(8)
    # freeze as tuples for the hot loop
    hdr["coeff_probs"] = tuple(
        tuple(tuple(tuple(c) for c in b) for b in t) for t in probs)

    # §9.10 skip flag
    hdr["use_skip"] = br.get(128)
    hdr["skip_prob"] = br.literal(8) if hdr["use_skip"] else 0

    hdr["br"] = br
    hdr["part0_end"] = 10 + part0_size
    return hdr


# --------------------------------------------------------- residuals

def _get_coeffs(br: _BoolReader, type_probs, ctx: int, first: int,
                dq_dc: int, dq_ac: int, out) -> int:
    """§13.2-13.3 token decode for one 4x4 block.  ``type_probs`` is
    coeff_probs[block_type] (band-indexed); returns the end position
    (> ``first`` iff the block has any nonzero coefficient).  ``out``
    is a 16-slot list receiving dequantized coefficients in raster
    (un-zigzagged) order."""
    get = br.get
    n = first
    p = type_probs[_BANDS[n]][ctx]
    while n < 16:
        if not get(p[0]):                       # EOB
            return n
        while not get(p[1]):                    # ZERO token run
            n += 1
            if n == 16:
                return 16
            p = type_probs[_BANDS[n]][0]
        # nonzero token
        if not get(p[2]):
            v = 1
            next_ctx = 1
        else:
            if not get(p[3]):                   # 2, 3, 4
                if not get(p[4]):
                    v = 2
                else:
                    v = 3 + get(p[5])
            elif not get(p[6]):                 # cat1 / cat2
                if not get(p[7]):
                    v = 5 + get(159)
                else:
                    v = 7 + 2 * get(165) + get(145)
            else:                               # cat3..cat6
                bit1 = get(p[8])
                bit0 = get(p[9 + bit1])
                cat = 2 + 2 * bit1 + bit0
                v = 0
                for cp in _CAT_PROBS[cat]:
                    v = (v + v) + get(cp)
                v += _CAT_BASE[cat]
            next_ctx = 2
        if get(128):                            # sign
            v = -v
        out[_ZIGZAG[n]] = v * (dq_ac if n > 0 else dq_dc)
        n += 1
        if n == 16:
            return 16
        p = type_probs[_BANDS[n]][next_ctx]
    return 16


# -------------------------------------------------------- transforms

def _iwht4x4(coeffs) -> list:
    """§14.3 inverse Walsh-Hadamard: Y2 block -> 16 luma DC values
    (raster order)."""
    tmp = [0] * 16
    for i in range(4):
        a0 = coeffs[0 + i] + coeffs[12 + i]
        a1 = coeffs[4 + i] + coeffs[8 + i]
        a2 = coeffs[4 + i] - coeffs[8 + i]
        a3 = coeffs[0 + i] - coeffs[12 + i]
        tmp[0 + i] = a0 + a1
        tmp[8 + i] = a0 - a1
        tmp[4 + i] = a3 + a2
        tmp[12 + i] = a3 - a2
    out = [0] * 16
    for i in range(4):
        dc = tmp[0 + i * 4] + 3
        a0 = dc + tmp[3 + i * 4]
        a1 = tmp[1 + i * 4] + tmp[2 + i * 4]
        a2 = tmp[1 + i * 4] - tmp[2 + i * 4]
        a3 = dc - tmp[3 + i * 4]
        out[i * 4 + 0] = (a0 + a1) >> 3
        out[i * 4 + 1] = (a3 + a2) >> 3
        out[i * 4 + 2] = (a0 - a1) >> 3
        out[i * 4 + 3] = (a3 - a2) >> 3
    return out


def _mul1(a: int) -> int:
    return ((a * 20091) >> 16) + a


def _mul2(a: int) -> int:
    return (a * 35468) >> 16


def _idct4x4(coeffs) -> list:
    """§14.4 inverse DCT (the 20091/35468 exact integer form);
    returns 16 residuals (raster) WITHOUT the +4>>3 — that rounding
    is fused into the add below, exactly like the spec's second
    pass."""
    tmp = [0] * 16
    for i in range(4):
        a = coeffs[i] + coeffs[8 + i]
        b = coeffs[i] - coeffs[8 + i]
        c = _mul2(coeffs[4 + i]) - _mul1(coeffs[12 + i])
        d = _mul1(coeffs[4 + i]) + _mul2(coeffs[12 + i])
        tmp[i * 4 + 0] = a + d
        tmp[i * 4 + 1] = b + c
        tmp[i * 4 + 2] = b - c
        tmp[i * 4 + 3] = a - d
    out = [0] * 16
    for i in range(4):
        dc = tmp[i] + 4
        a = dc + tmp[8 + i]
        b = dc - tmp[8 + i]
        c = _mul2(tmp[4 + i]) - _mul1(tmp[12 + i])
        d = _mul1(tmp[4 + i]) + _mul2(tmp[12 + i])
        out[i * 4 + 0] = (a + d) >> 3
        out[i * 4 + 1] = (b + c) >> 3
        out[i * 4 + 2] = (b - c) >> 3
        out[i * 4 + 3] = (a - d) >> 3
    return out


def _add_residual(plane, y0: int, x0: int, res) -> None:
    blk = plane[y0:y0 + 4, x0:x0 + 4].astype(np.int32)
    blk += np.asarray(res, np.int32).reshape(4, 4)
    plane[y0:y0 + 4, x0:x0 + 4] = np.clip(blk, 0, 255)


# ------------------------------------------------------- predictors

def _edges(plane, y0, x0, size, mb_x, mb_y):
    """(above[size], left[size], top_left) for a size x size block at
    plane[y0, x0] with the frame-edge 127/129 conventions."""
    if mb_y > 0:
        above = plane[y0 - 1, x0:x0 + size].astype(np.int32)
        top_left = int(plane[y0 - 1, x0 - 1]) if mb_x > 0 else 129
    else:
        above = np.full(size, 127, np.int32)
        top_left = 127
    if mb_x > 0:
        left = plane[y0:y0 + size, x0 - 1].astype(np.int32)
    else:
        left = np.full(size, 129, np.int32)
    return above, left, top_left


def _pred_block(plane, y0, x0, size, mode, mb_x, mb_y) -> None:
    """16x16 luma / 8x8 chroma whole-block prediction (§12.2)."""
    above, left, top_left = _edges(plane, y0, x0, size, mb_x, mb_y)
    if mode == _DC_PRED:
        if mb_y > 0 and mb_x > 0:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4)
        elif mb_y > 0:
            dc = (int(above.sum()) + (size >> 1)) >> (
                4 if size == 16 else 3)
        elif mb_x > 0:
            dc = (int(left.sum()) + (size >> 1)) >> (
                4 if size == 16 else 3)
        else:
            dc = 128
        plane[y0:y0 + size, x0:x0 + size] = dc
    elif mode == _V_PRED:
        plane[y0:y0 + size, x0:x0 + size] = above.astype(np.uint8)
    elif mode == _H_PRED:
        plane[y0:y0 + size, x0:x0 + size] = left.astype(
            np.uint8)[:, None]
    else:                                        # TM_PRED
        block = left[:, None] + above[None, :] - top_left
        plane[y0:y0 + size, x0:x0 + size] = np.clip(block, 0, 255)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred_b(plane, y0, x0, mode, above, left, tl, above_right):
    """4x4 subblock prediction (§12.3).  ``above``/``left`` are
    4-lists, ``above_right`` a 4-list, ``tl`` the corner sample."""
    A = above
    L = left
    AR = above_right
    out = [[0] * 4 for _ in range(4)]
    if mode == _B_DC:
        dc = (sum(A) + sum(L) + 4) >> 3
        for r in out:
            r[0] = r[1] = r[2] = r[3] = dc
    elif mode == _B_TM:
        for y in range(4):
            for x in range(4):
                v = L[y] + A[x] - tl
                out[y][x] = 0 if v < 0 else 255 if v > 255 else v
    elif mode == _B_VE:
        row = [_avg3(tl, A[0], A[1]), _avg3(A[0], A[1], A[2]),
               _avg3(A[1], A[2], A[3]), _avg3(A[2], A[3], AR[0])]
        for y in range(4):
            out[y] = row[:]
    elif mode == _B_HE:
        col = [_avg3(tl, L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3])]
        for y in range(4):
            out[y] = [col[y]] * 4
    elif mode == _B_LD:
        E = A + AR                                 # 8 samples
        v = [_avg3(E[0], E[1], E[2]), _avg3(E[1], E[2], E[3]),
             _avg3(E[2], E[3], E[4]), _avg3(E[3], E[4], E[5]),
             _avg3(E[4], E[5], E[6]), _avg3(E[5], E[6], E[7]),
             _avg3(E[6], E[7], E[7])]
        for y in range(4):
            for x in range(4):
                out[y][x] = v[x + y]
    elif mode == _B_RD:
        E = [L[3], L[2], L[1], L[0], tl, A[0], A[1], A[2], A[3]]
        v = [_avg3(E[0], E[1], E[2]), _avg3(E[1], E[2], E[3]),
             _avg3(E[2], E[3], E[4]), _avg3(E[3], E[4], E[5]),
             _avg3(E[4], E[5], E[6]), _avg3(E[5], E[6], E[7]),
             _avg3(E[6], E[7], E[8])]
        for y in range(4):
            for x in range(4):
                out[y][x] = v[x - y + 3]
    elif mode == _B_VR:
        E = [L[3], L[2], L[1], L[0], tl, A[0], A[1], A[2], A[3]]
        out[0] = [_avg2(E[4], E[5]), _avg2(E[5], E[6]),
                  _avg2(E[6], E[7]), _avg2(E[7], E[8])]
        out[1] = [_avg3(E[3], E[4], E[5]), _avg3(E[4], E[5], E[6]),
                  _avg3(E[5], E[6], E[7]), _avg3(E[6], E[7], E[8])]
        out[2] = [_avg3(E[2], E[3], E[4])] + out[0][:3]
        out[3] = [_avg3(E[1], E[2], E[3])] + out[1][:3]
    elif mode == _B_VL:
        E = A + AR
        out[0] = [_avg2(E[0], E[1]), _avg2(E[1], E[2]),
                  _avg2(E[2], E[3]), _avg2(E[3], E[4])]
        out[1] = [_avg3(E[0], E[1], E[2]), _avg3(E[1], E[2], E[3]),
                  _avg3(E[2], E[3], E[4]), _avg3(E[3], E[4], E[5])]
        out[2] = out[0][1:] + [_avg3(E[4], E[5], E[6])]
        out[3] = out[1][1:] + [_avg3(E[5], E[6], E[7])]
    elif mode == _B_HD:
        E = [L[3], L[2], L[1], L[0], tl, A[0], A[1], A[2]]
        v = [_avg2(E[3], E[4]), _avg3(E[3], E[4], E[5]),
             _avg2(E[2], E[3]), _avg3(E[2], E[3], E[4]),
             _avg2(E[1], E[2]), _avg3(E[1], E[2], E[3]),
             _avg2(E[0], E[1]), _avg3(E[0], E[1], E[2])]
        ext = [_avg3(E[4], E[5], E[6]), _avg3(E[5], E[6], E[7])]
        out[0] = [v[0], v[1], ext[0], ext[1]]
        out[1] = [v[2], v[3], v[0], v[1]]
        out[2] = [v[4], v[5], v[2], v[3]]
        out[3] = [v[6], v[7], v[4], v[5]]
    else:                                         # _B_HU
        v = [_avg2(L[0], L[1]), _avg3(L[0], L[1], L[2]),
             _avg2(L[1], L[2]), _avg3(L[1], L[2], L[3]),
             _avg2(L[2], L[3]), _avg3(L[2], L[3], L[3]),
             L[3]]
        out[0] = [v[0], v[1], v[2], v[3]]
        out[1] = [v[2], v[3], v[4], v[5]]
        out[2] = [v[4], v[5], v[6], v[6]]
        out[3] = [v[6], v[6], v[6], v[6]]
    plane[y0:y0 + 4, x0:x0 + 4] = np.asarray(out, np.uint8)


def _b_edges(plane, x0, y0, sx, sy, mb_x, mb_y, mb_w):
    """§12.3 subblock edge samples: (above4, left4, top_left,
    above_right4).  Above-right for right-column subblocks always
    comes from the row above the MACROBLOCK (the spec quirk), with
    replication at the frame's right edge."""
    by, bx = y0 + 4 * sy, x0 + 4 * sx
    if sy > 0 or mb_y > 0:
        above = [int(v) for v in plane[by - 1, bx:bx + 4]]
    else:
        above = [127, 127, 127, 127]
    if sx > 0 or mb_x > 0:
        left = [int(v) for v in plane[by:by + 4, bx - 1]]
    else:
        left = [129, 129, 129, 129]
    if sy == 0 and mb_y == 0:
        tl = 127
    elif sx == 0 and mb_x == 0:
        tl = 129
    else:
        tl = int(plane[by - 1, bx - 1])
    if sx < 3:
        if sy > 0 or mb_y > 0:
            src_row = by - 1 if sy > 0 else y0 - 1
            ar = [int(v) for v in plane[src_row, bx + 4:bx + 8]]
        else:
            ar = [127, 127, 127, 127]
    else:
        # MB-level top-right row for every subblock row.
        if mb_y == 0:
            ar = [127, 127, 127, 127]
        elif mb_x < mb_w - 1:
            ar = [int(v) for v in plane[y0 - 1, x0 + 16:x0 + 20]]
        else:
            ar = [int(plane[y0 - 1, x0 + 15])] * 4
    return above, left, tl, ar


_UV_TREE = (-_DC_PRED, 2, -_V_PRED, 4, -_H_PRED, -_TM_PRED)
_UV_PROBS = (142, 114, 183)


def decode_vp8_planes(data: bytes, loop_filter: bool = True):
    """VP8 key frame -> (Y, U, V) uint8 planes (cropped), exactly as
    a conforming decoder reconstructs them (loop filter included;
    ``loop_filter=False`` mirrors libwebp's ``bypass_filtering`` for
    stage-isolated differential tests)."""
    hdr = _parse_header(data)
    width, height = hdr["width"], hdr["height"]
    mb_w, mb_h = (width + 15) // 16, (height + 15) // 16

    rest = data[hdr["part0_end"]:]
    n_parts = hdr["n_parts"]
    hdr_bytes = 3 * (n_parts - 1)
    if len(rest) < hdr_bytes:
        raise ValueError("truncated VP8 partition table")
    parts = []
    pos = hdr_bytes
    for i in range(n_parts - 1):
        sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        if pos + sz > len(rest):
            raise ValueError("truncated VP8 token partition")
        parts.append(_BoolReader(rest[pos:pos + sz]))
        pos += sz
    if pos >= len(rest):
        raise ValueError("missing VP8 token partition")
    parts.append(_BoolReader(rest[pos:]))

    Y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    V = np.zeros((mb_h * 8, mb_w * 8), np.uint8)

    br = hdr["br"]
    probs = hdr["coeff_probs"]
    quants = hdr["quants"]
    use_skip, skip_prob = hdr["use_skip"], hdr["skip_prob"]
    seg_probs = hdr["seg_tree_probs"]

    above_bmodes = [[_B_DC] * 4 for _ in range(mb_w)]
    a_y = [[0] * 4 for _ in range(mb_w)]
    a_u = [[0] * 2 for _ in range(mb_w)]
    a_v = [[0] * 2 for _ in range(mb_w)]
    a_y2 = [0] * mb_w

    # per-MB loop-filter info: (inner, segment, is_b)
    lf_info = np.zeros((mb_h, mb_w, 3), np.int32)

    for mb_y in range(mb_h):
        token_br = parts[mb_y % n_parts]
        left_bmodes = [_B_DC] * 4
        l_y = [0] * 4
        l_u = [0] * 2
        l_v = [0] * 2
        l_y2 = 0
        for mb_x in range(mb_w):
            # ---- §10-11: macroblock header -------------------------
            seg = 0
            if hdr["seg_enabled"] and hdr["update_map"]:
                seg = br.tree(_SEGMENT_TREE, seg_probs)
            skip = br.get(skip_prob) if use_skip else 0
            is_b = not br.get(145)
            submodes = None
            if not is_b:
                if br.get(156):
                    ymode = _TM_PRED if br.get(128) else _H_PRED
                else:
                    ymode = _V_PRED if br.get(163) else _DC_PRED
                above_bmodes[mb_x] = [ymode] * 4
                left_bmodes = [ymode] * 4
            else:
                ymode = -1
                grid = [[0] * 4 for _ in range(4)]
                for sy in range(4):
                    for sx in range(4):
                        top = (grid[sy - 1][sx] if sy > 0
                               else above_bmodes[mb_x][sx])
                        lft = grid[sy][sx - 1] if sx > 0 \
                            else left_bmodes[sy]
                        base = (top * 10 + lft) * 9
                        m = br.tree(
                            _BMODE_TREE,
                            KF_BMODE_PROBS[base:base + 9])
                        grid[sy][sx] = m
                above_bmodes[mb_x] = list(grid[3])
                left_bmodes = [grid[r][3] for r in range(4)]
                submodes = grid
            uvmode = br.tree(_UV_TREE, _UV_PROBS)

            # ---- §13: residuals ------------------------------------
            q = quants[seg]
            y_blocks = [None] * 16
            u_blocks = [None] * 4
            v_blocks = [None] * 4
            dcs = None
            any_coeffs = False
            if skip:
                l_y = [0] * 4
                for k in range(4):
                    a_y[mb_x][k] = 0
                l_u = [0] * 2
                l_v = [0] * 2
                a_u[mb_x] = [0, 0]
                a_v[mb_x] = [0, 0]
                if not is_b:
                    l_y2 = 0
                    a_y2[mb_x] = 0
            else:
                if not is_b:
                    ctx = l_y2 + a_y2[mb_x]
                    buf = [0] * 16
                    end = _get_coeffs(token_br, probs[1], ctx, 0,
                                      q[2], q[3], buf)
                    nz = 1 if end > 0 else 0
                    l_y2 = a_y2[mb_x] = nz
                    any_coeffs |= bool(nz)
                    dcs = _iwht4x4(buf)
                    first, ptype = 1, probs[0]
                else:
                    first, ptype = 0, probs[3]
                for sy in range(4):
                    for sx in range(4):
                        ctx = l_y[sy] + a_y[mb_x][sx]
                        buf = [0] * 16
                        end = _get_coeffs(token_br, ptype, ctx,
                                          first, q[0], q[1], buf)
                        nz = 1 if end > first else 0
                        l_y[sy] = a_y[mb_x][sx] = nz
                        any_coeffs |= bool(nz)
                        y_blocks[sy * 4 + sx] = buf
                for plane_blocks, l_c, a_c in (
                        (u_blocks, l_u, a_u[mb_x]),
                        (v_blocks, l_v, a_v[mb_x])):
                    for sy in range(2):
                        for sx in range(2):
                            ctx = l_c[sy] + a_c[sx]
                            buf = [0] * 16
                            end = _get_coeffs(token_br, probs[2],
                                              ctx, 0, q[4], q[5],
                                              buf)
                            nz = 1 if end > 0 else 0
                            l_c[sy] = a_c[sx] = nz
                            any_coeffs |= bool(nz)
                            plane_blocks[sy * 2 + sx] = buf

            lf_info[mb_y, mb_x, 0] = 1 if (is_b or any_coeffs) else 0
            lf_info[mb_y, mb_x, 1] = seg
            lf_info[mb_y, mb_x, 2] = 1 if is_b else 0

            # ---- §12/14: reconstruction ----------------------------
            y0, x0 = mb_y * 16, mb_x * 16
            if not is_b:
                _pred_block(Y, y0, x0, 16, ymode, mb_x, mb_y)
                for i in range(16):
                    blk = y_blocks[i]
                    if blk is None:
                        blk_dc = dcs[i] if dcs is not None else 0
                        if blk_dc:
                            blk = [0] * 16
                            blk[0] = blk_dc
                        else:
                            continue
                    elif dcs is not None:
                        blk[0] = dcs[i]
                    if any(blk):
                        sy, sx = divmod(i, 4)
                        _add_residual(Y, y0 + 4 * sy, x0 + 4 * sx,
                                      _idct4x4(blk))
            else:
                for i in range(16):
                    sy, sx = divmod(i, 4)
                    ab, lf, tl, ar = _b_edges(Y, x0, y0, sx, sy,
                                              mb_x, mb_y, mb_w)
                    _pred_b(Y, y0 + 4 * sy, x0 + 4 * sx,
                            submodes[sy][sx], ab, lf, tl, ar)
                    blk = y_blocks[i]
                    if blk is not None and any(blk):
                        _add_residual(Y, y0 + 4 * sy, x0 + 4 * sx,
                                      _idct4x4(blk))
            cy0, cx0 = mb_y * 8, mb_x * 8
            for plane, blocks in ((U, u_blocks), (V, v_blocks)):
                _pred_block(plane, cy0, cx0, 8, uvmode, mb_x, mb_y)
                for i in range(4):
                    blk = blocks[i]
                    if blk is not None and any(blk):
                        sy, sx = divmod(i, 2)
                        _add_residual(plane, cy0 + 4 * sy,
                                      cx0 + 4 * sx, _idct4x4(blk))

    if loop_filter:
        _loop_filter(Y, U, V, hdr, lf_info, mb_w, mb_h)

    return (Y[:height, :width], U[:(height + 1) // 2, :(width + 1) // 2],
            V[:(height + 1) // 2, :(width + 1) // 2])


# -------------------------------------------------------- loop filter

def _filter_edge(plane, horiz, pos, start, n, limit, ilevel,
                 hev_t, mb_edge, simple):
    """One 4/6/8-tap loop-filter pass along an edge (§15.2-15.4),
    vectorized across its ``n`` lines.  ``limit`` is the f_limit
    (already +4 on macroblock edges), ``simple`` selects the 2-tap
    simple filter.  The 8 taps move as ONE (n, 8) window — a single
    gather and a single scatter — because per-line numpy calls, not
    arithmetic, dominated the first profile of this filter."""
    if horiz:
        win = plane[pos - 4:pos + 4, start:start + n].T.astype(np.int32)
    else:
        win = plane[start:start + n, pos - 4:pos + 4].astype(np.int32)
    p1 = win[:, 2]
    p0 = win[:, 3]
    q0 = win[:, 4]
    q1 = win[:, 5]
    mn, mx = np.minimum, np.maximum
    thresh2 = 2 * limit + 1
    if simple:
        mask = (4 * np.abs(p0 - q0) + np.abs(p1 - q1)) <= thresh2
        if not mask.any():
            return
        a = 3 * (q0 - p0) + mx(mn(p1 - q1, 127), -128)
        a1 = mx(mn((a + 4) >> 3, 15), -16)
        a2 = mx(mn((a + 3) >> 3, 15), -16)
        win[:, 3] = np.where(mask, mx(mn(p0 + a2, 255), 0), p0)
        win[:, 4] = np.where(mask, mx(mn(q0 - a1, 255), 0), q0)
    else:
        p3, p2, q2, q3 = win[:, 0], win[:, 1], win[:, 6], win[:, 7]
        needs = (4 * np.abs(p0 - q0) + np.abs(p1 - q1)) <= thresh2
        needs &= np.abs(p3 - p2) <= ilevel
        needs &= np.abs(p2 - p1) <= ilevel
        needs &= np.abs(p1 - p0) <= ilevel
        needs &= np.abs(q3 - q2) <= ilevel
        needs &= np.abs(q2 - q1) <= ilevel
        needs &= np.abs(q1 - q0) <= ilevel
        if not needs.any():
            return
        hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
        # hev path: DoFilter2 (both edge kinds)
        m2 = needs & hev
        a = 3 * (q0 - p0) + mx(mn(p1 - q1, 127), -128)
        f1 = mx(mn((a + 4) >> 3, 15), -16)
        f2 = mx(mn((a + 3) >> 3, 15), -16)
        out_p0 = np.where(m2, mx(mn(p0 + f2, 255), 0), p0)
        out_q0 = np.where(m2, mx(mn(q0 - f1, 255), 0), q0)
        m = needs & ~hev
        if mb_edge:
            # DoFilter6
            w = mx(mn(3 * (q0 - p0) + mx(mn(p1 - q1, 127), -128),
                      127), -128)
            a1 = (27 * w + 63) >> 7
            a2 = (18 * w + 63) >> 7
            a3 = (9 * w + 63) >> 7
            win[:, 1] = np.where(m, mx(mn(p2 + a3, 255), 0), p2)
            win[:, 2] = np.where(m, mx(mn(p1 + a2, 255), 0), p1)
            win[:, 3] = np.where(m, mx(mn(p0 + a1, 255), 0), out_p0)
            win[:, 4] = np.where(m, mx(mn(q0 - a1, 255), 0), out_q0)
            win[:, 5] = np.where(m, mx(mn(q1 - a2, 255), 0), q1)
            win[:, 6] = np.where(m, mx(mn(q2 - a3, 255), 0), q2)
        else:
            # DoFilter4 (no p1/q1 adjust under hev; a lacks p1-q1)
            a = 3 * (q0 - p0)
            f1 = mx(mn((a + 4) >> 3, 15), -16)
            f2 = mx(mn((a + 3) >> 3, 15), -16)
            f3 = (f1 + 1) >> 1
            win[:, 2] = np.where(m, mx(mn(p1 + f3, 255), 0), p1)
            win[:, 3] = np.where(m, mx(mn(p0 + f2, 255), 0), out_p0)
            win[:, 4] = np.where(m, mx(mn(q0 - f1, 255), 0), out_q0)
            win[:, 5] = np.where(m, mx(mn(q1 - f3, 255), 0), q1)
    if horiz:
        plane[pos - 4:pos + 4, start:start + n] = \
            win.T.astype(np.uint8)
    else:
        plane[start:start + n, pos - 4:pos + 4] = win.astype(np.uint8)


def _loop_filter(Y, U, V, hdr, lf_info, mb_w, mb_h) -> None:
    """§15: per-macroblock strength derivation + edge walk in raster
    order (left MB edge, inner vertical, top MB edge, inner
    horizontal — luma then chroma per edge kind)."""
    base_levels = hdr["seg_filter_level"]
    if hdr["filter_level"] == 0 and not hdr["seg_enabled"]:
        return
    sharpness = hdr["sharpness"]
    simple = bool(hdr["filter_simple"])
    lf_delta = hdr["lf_delta"]
    ref_d = hdr["ref_deltas"]
    mode_d = hdr["mode_deltas"]

    # strength per (segment, is_b): (limit, ilevel, hev)
    strength = {}
    for seg in range(4):
        for is_b in (0, 1):
            level = base_levels[seg]
            if lf_delta:
                level += ref_d[0]          # intra frame
                if is_b:
                    level += mode_d[0]     # B_PRED mode delta
            level = 0 if level < 0 else 63 if level > 63 else level
            if level == 0:
                strength[(seg, is_b)] = None
                continue
            ilevel = level
            if sharpness > 0:
                ilevel >>= 2 if sharpness > 4 else 1
                if ilevel > 9 - sharpness:
                    ilevel = 9 - sharpness
            if ilevel < 1:
                ilevel = 1
            hev = 2 if level >= 40 else (1 if level >= 15 else 0)
            strength[(seg, is_b)] = (2 * level + ilevel, ilevel, hev)

    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            inner, seg, is_b = lf_info[mb_y, mb_x]
            st = strength[(int(seg), int(is_b))]
            if st is None:
                continue
            limit, ilevel, hev = st
            y0, x0 = mb_y * 16, mb_x * 16
            cy0, cx0 = mb_y * 8, mb_x * 8
            if mb_x > 0:
                _filter_edge(Y, False, x0, y0, 16, limit + 4,
                             ilevel, hev, True, simple)
                if not simple:
                    for pl in (U, V):
                        _filter_edge(pl, False, cx0, cy0, 8,
                                     limit + 4, ilevel, hev, True,
                                     False)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge(Y, False, x0 + dx, y0, 16, limit,
                                 ilevel, hev, False, simple)
                if not simple:
                    for pl in (U, V):
                        _filter_edge(pl, False, cx0 + 4, cy0, 8,
                                     limit, ilevel, hev, False,
                                     False)
            if mb_y > 0:
                _filter_edge(Y, True, y0, x0, 16, limit + 4,
                             ilevel, hev, True, simple)
                if not simple:
                    for pl in (U, V):
                        _filter_edge(pl, True, cy0, cx0, 8,
                                     limit + 4, ilevel, hev, True,
                                     False)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge(Y, True, y0 + dy, x0, 16, limit,
                                 ilevel, hev, False, simple)
                if not simple:
                    for pl in (U, V):
                        _filter_edge(pl, True, cy0 + 4, cx0, 8,
                                     limit, ilevel, hev, False,
                                     False)


# ----------------------------------------------------------- RGB api

def yuv420_to_rgb(y: np.ndarray, u: np.ndarray,
                  v: np.ndarray) -> np.ndarray:
    """Presentation-only BT.601 limited-range conversion with 2x2
    chroma replication (parity tests compare the YUV planes; RGB
    policy — fancy upsampling, dithering — is a renderer choice)."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w].astype(np.float64)
    vv = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w].astype(np.float64)
    yy = y.astype(np.float64)
    c = 1.164 * (yy - 16.0)
    r = c + 1.596 * (vv - 128.0)
    g = c - 0.391 * (uu - 128.0) - 0.813 * (vv - 128.0)
    b = c + 2.018 * (uu - 128.0)
    return np.clip(np.stack([r, g, b], -1).round(), 0, 255).astype(
        np.uint8)


def decode_vp8(data: bytes) -> np.ndarray:
    """VP8 key-frame bytes -> (h, w, 3) RGB uint8."""
    y, u, v = decode_vp8_planes(data)
    return yuv420_to_rgb(y, u, v)


# -------------------------------------------------------------- encode

def _inv_dct_matrix() -> np.ndarray:
    """Float linearization of the integer inverse DCT (rounding
    dropped): 16x16 map from coefficients to residuals.  The encoder
    quantizes against its inverse, so decode(encode(x)) lands within
    quantizer error of x by construction."""
    m = np.zeros((16, 16))
    c1 = 20091.0 / 65536.0 + 1.0
    c2 = 35468.0 / 65536.0
    row = np.array([[1, 0, 1, 0], [0, c2, 0, -c1],
                    [1, 0, -1, 0], [0, c1, 0, c2]])
    # idct: tmp = row-op on columns, out = row-op on tmp columns / 8
    basis = np.zeros((4, 4, 4, 4))
    for u in range(4):
        for v in range(4):
            coef = np.zeros((4, 4))
            coef[u, v] = 1.0
            t1 = np.zeros((4, 4))
            for i in range(4):
                col = coef[:, i]
                t1[i, 0] = col[0] + col[2] + (c1 * col[1] + c2 * col[3])
                t1[i, 1] = (col[0] - col[2]) + (c2 * col[1] - c1 * col[3])
                t1[i, 2] = (col[0] - col[2]) - (c2 * col[1] - c1 * col[3])
                t1[i, 3] = col[0] + col[2] - (c1 * col[1] + c2 * col[3])
            out = np.zeros((4, 4))
            for i in range(4):
                col = t1[:, i]
                out[i, 0] = (col[0] + col[2]
                             + (c1 * col[1] + c2 * col[3])) / 8.0
                out[i, 1] = ((col[0] - col[2])
                             + (c2 * col[1] - c1 * col[3])) / 8.0
                out[i, 2] = ((col[0] - col[2])
                             - (c2 * col[1] - c1 * col[3])) / 8.0
                out[i, 3] = (col[0] + col[2]
                             - (c1 * col[1] + c2 * col[3])) / 8.0
            basis[u, v] = out
    for u in range(4):
        for v in range(4):
            m[:, u * 4 + v] = basis[u, v].reshape(16)
    return m


_FWD_DCT = None
_FWD_WHT = None


def _fwd_matrices():
    global _FWD_DCT, _FWD_WHT
    if _FWD_DCT is None:
        _FWD_DCT = np.linalg.inv(_inv_dct_matrix())
        # inverse WHT linearized (the +3 rounding dropped, /8 kept)
        b = np.zeros((16, 16))
        for k in range(16):
            coef = [0] * 16
            coef[k] = 8           # x8 so integer >>3 stays exact-ish
            out = np.asarray(_iwht4x4(coef), float) / 8.0
            b[:, k] = out
        _FWD_WHT = np.linalg.inv(b)
    return _FWD_DCT, _FWD_WHT


def _put_coeffs(bw: _BoolWriter, type_probs, ctx: int, first: int,
                levels) -> int:
    """Token-encode one block's quantized levels (zigzag positions
    ``first``..15); mirrors ``_get_coeffs`` exactly.  Returns the
    nz flag for context tracking."""
    last = -1
    for n in range(first, 16):
        if levels[n]:
            last = n
    p = type_probs[_BANDS[first]][ctx]
    if last < first:
        bw.put(p[0], 0)                         # immediate EOB
        return 0
    n = first
    eob_ok = True
    while n <= last:
        v = levels[n]
        if eob_ok:
            bw.put(p[0], 1)
        if v == 0:
            bw.put(p[1], 0)
            n += 1
            p = type_probs[_BANDS[n]][0]
            eob_ok = False
            continue
        bw.put(p[1], 1)
        a = abs(v)
        if a == 1:
            bw.put(p[2], 0)
            next_ctx = 1
        else:
            bw.put(p[2], 1)
            if a <= 4:
                bw.put(p[3], 0)
                if a == 2:
                    bw.put(p[4], 0)
                else:
                    bw.put(p[4], 1)
                    bw.put(p[5], a - 3)
            elif a <= 10:
                bw.put(p[3], 1)
                bw.put(p[6], 0)
                if a <= 6:
                    bw.put(p[7], 0)
                    bw.put(159, a - 5)
                else:
                    bw.put(p[7], 1)
                    bw.put(165, (a - 7) >> 1)
                    bw.put(145, (a - 7) & 1)
            else:
                bw.put(p[3], 1)
                bw.put(p[6], 1)
                for cat in range(2, 6):
                    hi = (_CAT_BASE[cat + 1] - 1 if cat < 5
                          else (1 << 30))
                    if a <= hi:
                        break
                bw.put(p[8], (cat - 2) >> 1)
                bw.put(p[9 + ((cat - 2) >> 1)], (cat - 2) & 1)
                rem = a - _CAT_BASE[cat]
                cps = _CAT_PROBS[cat]
                for i, cp in enumerate(cps):
                    bw.put(cp, (rem >> (len(cps) - 1 - i)) & 1)
            next_ctx = 2
        bw.put(128, 1 if v < 0 else 0)
        n += 1
        if n == 16:
            return 1
        p = type_probs[_BANDS[n]][next_ctx]
        eob_ok = True
    bw.put(p[0], 0)                             # EOB after last
    return 1


def rgb_to_yuv420(rgb: np.ndarray):
    """BT.601 limited-range RGB -> YUV 4:2:0 (box-averaged chroma)."""
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 16.0 + 0.2568 * r + 0.5041 * g + 0.0979 * b
    u = 128.0 - 0.1482 * r - 0.2910 * g + 0.4392 * b
    v = 128.0 + 0.4392 * r - 0.3678 * g - 0.0714 * b
    h, w = rgb.shape[:2]
    ph, pw = (h + 1) & ~1, (w + 1) & ~1
    up = np.empty((ph, pw)); vp = np.empty((ph, pw))
    up[:h, :w], vp[:h, :w] = u, v
    if ph > h:
        up[h:], vp[h:] = up[h - 1:h], vp[h - 1:h]
    if pw > w:
        up[:, w:], vp[:, w:] = up[:, w - 1:w], vp[:, w - 1:w]
    u2 = up.reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
    v2 = vp.reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
    clip = lambda a: np.clip(a.round(), 0, 255).astype(np.uint8)
    return clip(y), clip(u2), clip(v2)


def encode_vp8(pixels: np.ndarray, quality: int = 75,
               filter_level: int = 0, filter_simple: bool = False,
               n_partitions: int = 1) -> bytes:
    """(h, w[, 3]) uint8 -> VP8 key-frame bytes (16x16 DC_PRED MBs,
    real forward WHT/DCT + §13 token coding through the §8 boolean
    encoder).  ``n_partitions`` in {1, 2, 4, 8} exercises the
    multi-partition decode path libwebp's encoder never emits."""
    arr = np.ascontiguousarray(pixels, np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, -1)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError(f"unsupported pixel shape {arr.shape}")
    if n_partitions not in (1, 2, 4, 8):
        raise ValueError("n_partitions must be 1, 2, 4 or 8")
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or h > 0x3FFF or w > 0x3FFF:
        raise ValueError("bad VP8 dimensions")
    yp, up, vp = rgb_to_yuv420(arr[..., :3])
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16

    def pad(plane, bh, bw_):
        out = np.empty((bh, bw_), np.uint8)
        ph, pw = plane.shape
        out[:ph, :pw] = plane
        out[ph:, :pw] = plane[ph - 1:ph]
        out[:, pw:] = out[:, pw - 1:pw]
        return out

    ys = pad(yp, mb_h * 16, mb_w * 16).astype(np.float64)
    us = pad(up, mb_h * 8, mb_w * 8).astype(np.float64)
    vs = pad(vp, mb_h * 8, mb_w * 8).astype(np.float64)
    # reconstruction planes (decoder mirror, for DC_PRED chaining)
    Y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    V = np.zeros((mb_h * 8, mb_w * 8), np.uint8)

    q = 127 - (127 * max(0, min(100, quality))) // 100
    dq = (DC_QUANT[q], AC_QUANT[q], DC_QUANT[q] * 2,
          max(8, (AC_QUANT[q] * 155) // 100), DC_QUANT[min(q, 117)],
          AC_QUANT[q])
    fdct, fwht = _fwd_matrices()

    probs = tuple(
        tuple(tuple(tuple(
            COEFF_PROBS[((t * 8 + b) * 3 + c) * 11 +
                        p] for p in range(11)) for c in range(3))
            for b in range(8)) for t in range(4))

    hdr_bw = _BoolWriter()
    token_bws = [_BoolWriter() for _ in range(n_partitions)]
    hdr_bw.put(128, 0)                          # color space
    hdr_bw.put(128, 0)                          # clamping
    hdr_bw.put(128, 0)                          # segmentation off
    hdr_bw.put(128, 1 if filter_simple else 0)
    hdr_bw.put_literal(max(0, min(63, filter_level)), 6)
    hdr_bw.put_literal(0, 3)                    # sharpness
    hdr_bw.put(128, 0)                          # lf deltas off
    hdr_bw.put_literal({1: 0, 2: 1, 4: 2, 8: 3}[n_partitions], 2)
    hdr_bw.put_literal(q, 7)                    # y_ac index
    for _ in range(5):
        hdr_bw.put(128, 0)                      # no quant deltas
    hdr_bw.put(128, 1)                          # refresh entropy
    for i in range(1056):
        hdr_bw.put(COEFF_UPDATE_PROBS[i], 0)    # keep default probs
    hdr_bw.put(128, 1)                          # mb_no_skip_coeff
    hdr_bw.put_literal(128, 8)                  # skip prob

    def quantize(vec, mat, qdc, qac, first):
        coef = mat @ vec
        lv = [0] * 16
        for n in range(first, 16):
            c = coef[_ZIGZAG[n]]
            lv[n] = int(round(c / (qac if n > 0 else qdc)))
            # category ceiling: 67 + 11 bits
            lv[n] = max(-2114, min(2114, lv[n]))
        return lv

    l_y = [0] * 4
    l_u = [0] * 2
    l_v = [0] * 2
    l_y2 = 0
    a_y = [[0] * 4 for _ in range(mb_w)]
    a_u = [[0] * 2 for _ in range(mb_w)]
    a_v = [[0] * 2 for _ in range(mb_w)]
    a_y2 = [0] * mb_w

    for mb_y in range(mb_h):
        tb = token_bws[mb_y % n_partitions]
        l_y = [0] * 4
        l_u = [0] * 2
        l_v = [0] * 2
        l_y2 = 0
        for mb_x in range(mb_w):
            y0, x0 = mb_y * 16, mb_x * 16
            cy0, cx0 = mb_y * 8, mb_x * 8
            _pred_block(Y, y0, x0, 16, _DC_PRED, mb_x, mb_y)
            _pred_block(U, cy0, cx0, 8, _DC_PRED, mb_x, mb_y)
            _pred_block(V, cy0, cx0, 8, _DC_PRED, mb_x, mb_y)

            y_levels = []
            dc_f = np.zeros(16)
            for i in range(16):
                sy, sx = divmod(i, 4)
                res = (ys[y0 + 4 * sy:y0 + 4 * sy + 4,
                          x0 + 4 * sx:x0 + 4 * sx + 4]
                       - Y[y0 + 4 * sy:y0 + 4 * sy + 4,
                           x0 + 4 * sx:x0 + 4 * sx + 4]).reshape(16)
                coef = fdct @ res
                dc_f[i] = coef[0]
                lv = [0] * 16
                for n in range(1, 16):
                    c = coef[_ZIGZAG[n]]
                    lv[n] = max(-2114, min(2114,
                                           int(round(c / dq[1]))))
                y_levels.append(lv)
            wht_coef = fwht @ dc_f
            y2_levels = [0] * 16
            for n in range(16):
                c = wht_coef[_ZIGZAG[n]]
                y2_levels[n] = max(-2114, min(
                    2114, int(round(c / (dq[3] if n > 0 else dq[2])))))
            uv_levels = []
            for plane_s, plane_r in ((us, U), (vs, V)):
                for i in range(4):
                    sy, sx = divmod(i, 2)
                    res = (plane_s[cy0 + 4 * sy:cy0 + 4 * sy + 4,
                                   cx0 + 4 * sx:cx0 + 4 * sx + 4]
                           - plane_r[cy0 + 4 * sy:cy0 + 4 * sy + 4,
                                     cx0 + 4 * sx:cx0 + 4 * sx + 4]
                           ).reshape(16)
                    lv = quantize(res, fdct, dq[4], dq[5], 0)
                    uv_levels.append(lv)

            mb_skip = (not any(any(lv) for lv in y_levels)
                       and not any(y2_levels)
                       and not any(any(lv) for lv in uv_levels))

            # ---- mode bits (partition 0)
            hdr_bw.put(128, 1 if mb_skip else 0)
            hdr_bw.put(145, 1)                  # not B_PRED
            hdr_bw.put(156, 0)
            hdr_bw.put(163, 0)                  # DC_PRED
            hdr_bw.put(142, 0)                  # UV DC_PRED

            # ---- tokens + reconstruction
            if mb_skip:
                l_y = [0] * 4
                for k in range(4):
                    a_y[mb_x][k] = 0
                l_u = [0] * 2
                l_v = [0] * 2
                a_u[mb_x] = [0, 0]
                a_v[mb_x] = [0, 0]
                l_y2 = a_y2[mb_x] = 0
            else:
                ctx = l_y2 + a_y2[mb_x]
                nz = _put_coeffs(tb, probs[1], ctx, 0, y2_levels)
                l_y2 = a_y2[mb_x] = nz
                for i in range(16):
                    sy, sx = divmod(i, 4)
                    ctx = l_y[sy] + a_y[mb_x][sx]
                    nz = _put_coeffs(tb, probs[0], ctx, 1,
                                     y_levels[i])
                    l_y[sy] = a_y[mb_x][sx] = nz
                for pi, (l_c, a_c) in enumerate(
                        ((l_u, a_u[mb_x]), (l_v, a_v[mb_x]))):
                    for i in range(4):
                        sy, sx = divmod(i, 2)
                        ctx = l_c[sy] + a_c[sx]
                        nz = _put_coeffs(tb, probs[2], ctx, 0,
                                         uv_levels[pi * 4 + i])
                        l_c[sy] = a_c[sx] = nz

            # decoder-mirror reconstruction
            if not mb_skip:
                raster_y2 = [0] * 16
                for n in range(16):
                    raster_y2[_ZIGZAG[n]] = y2_levels[n] * (
                        dq[3] if n > 0 else dq[2])
                dcs = _iwht4x4(raster_y2)
                for i in range(16):
                    sy, sx = divmod(i, 4)
                    blk = [0] * 16
                    for n in range(1, 16):
                        blk[_ZIGZAG[n]] = y_levels[i][n] * dq[1]
                    blk[0] = dcs[i]
                    if any(blk):
                        _add_residual(Y, y0 + 4 * sy, x0 + 4 * sx,
                                      _idct4x4(blk))
                for pi, plane in ((0, U), (1, V)):
                    for i in range(4):
                        sy, sx = divmod(i, 2)
                        blk = [0] * 16
                        for n in range(16):
                            blk[_ZIGZAG[n]] = uv_levels[pi * 4 + i][n] \
                                * (dq[5] if n > 0 else dq[4])
                        if any(blk):
                            _add_residual(plane, cy0 + 4 * sy,
                                          cx0 + 4 * sx,
                                          _idct4x4(blk))

    part0 = hdr_bw.getvalue()
    parts = [bw.getvalue() for bw in token_bws]
    for i in range(len(parts)):
        if not parts[i]:
            parts[i] = b"\x00"
    tag = (len(part0) << 5) | (1 << 4) | 0      # show_frame, key
    out = bytearray()
    out += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    out += b"\x9d\x01\x2a"
    out += struct.pack("<HH", w, h)
    out += part0
    for p in parts[:-1]:
        out += struct.pack("<I", len(p))[:3]
    for p in parts:
        out += p
    return bytes(out)


def encode_webp_lossy(pixels: np.ndarray, quality: int = 75,
                      **kwargs) -> bytes:
    """RIFF-wrapped lossy WebP from ``encode_vp8``."""
    frame = encode_vp8(pixels, quality=quality, **kwargs)
    if len(frame) & 1:
        payload = frame + b"\x00"
    else:
        payload = frame
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
