"""From-scratch lossless WebP (VP8L) codec — stdlib + numpy only.

The container has no image libraries (PIL/libwebp installs are
off-limits), so this implements the WebP Lossless Bitstream
Specification (RFC 9649 §3-5) directly:

- ``decode_webp``: RIFF/VP8X container walk, LSB-first bit reader,
  canonical prefix codes (simple 1-2-symbol and code-length-coded
  forms, incl. the ``max_symbol`` early-stop field), meta prefix
  groups, LZ77 backward references with the 2D distance mapping,
  color cache, and all four transforms — predictor (14 modes, exact
  edge rules incl. the top-right-of-last-column = first-pixel-of-
  current-row flat-buffer convention), cross-color (3.5 fixed-point
  signed deltas), subtract-green, and color-indexing with sub-byte
  index bundling.
- ``encode_webp``: a minimal-but-valid VP8L writer (per-channel
  canonical Huffman literals, simple codes for ≤2-symbol channels,
  optional subtract-green / predictor / cross-color / palette
  transforms) used by the synthesizer and the round-trip tests.

Lossy WebP (``VP8 `` chunks) routes to the from-scratch RFC 6386
key-frame decoder in ``vp8_codec`` (boolean decoder, intra
prediction, token trees, integer IDCT/WHT, loop filter — pinned
pixel-exact against libwebp's own decodes), with ``ALPH``
transparency planes decoded for both stills and animation frames.
``decode_webp_frames`` composites lossless AND lossy ANMF frames
onto the shared canvas.

Validation note: cross-validated against the system ``libwebp.so.7``
(1.2.4, test oracle only — the runtime stays pure Python + numpy) in
BOTH directions: ``encode_webp`` output decodes pixel-exactly in
libwebp across every transform, and libwebp-encoded streams (LZ77,
color cache, meta prefix groups) decode pixel-exactly here
(``tests/test_libwebp_parity.py``).  That oracle caught a real
interop bug the round-trip/fuzz evidence could not: a DEFLATE-style
``kCodeLengthCodeOrder`` (16 last instead of between 5 and 6)
round-trips internally and decodes every stream whose code lengths
stop at 5, but breaks on the first length-6 prefix code.  Exact
round-trips, hand-crafted bitstreams, and hostile-input fuzzing
remain as secondary evidence.  The 120-entry distance map is
transcribed from RFC 9649 §5.2.2.

Reference parity note: the reference engine (HE1780) delegates all
image handling to MarkItDown/PIL (reference ``src/config.py:37-57``
image families); this codec exists for the multimodal training-data
operators, not reference behavior.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

from .png_codec import composite_over

RIFF_SIG = b"RIFF"
WEBP_FOURCC = b"WEBP"

# Pure-Python entropy decode: cap hostile allocations the same way the
# other codecs do.  1M pixels covers favicons/thumbnails/test images;
# larger valid files refuse to the stub rather than stall an executor.
_MAX_PIXELS = 1 << 20

_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DIST_CODES = 40

# RFC 9649 §5.6.2 kCodeLengthCodeOrder — note 16 sits between 5 and
# 6 (unlike DEFLATE's order).  A reordered table here decodes every
# stream whose code lengths stop at 5 (indices 2..7 agree) and breaks
# on the first length-6 code — caught by libwebp cross-validation.
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7,
              8, 9, 10, 11, 12, 13, 14, 15)

# RFC 9649 §5.2.2: distance codes 1..120 map to 2D (dx, dy) offsets
# (dist = dx + dy * width, clamped to >= 1); codes > 120 are literal
# distances minus 120.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (8, 5), (7, 6), (-7, 6), (8, 6), (7, 7), (-7, 7), (8, 7),
)
assert len(_DIST_MAP) == 120


class UnsupportedWebP(ValueError):
    """Valid WebP outside the implemented subset (lossy VP8, animation,
    oversized-for-pure-Python images)."""


# ---------------------------------------------------------------- bits

class _BitReader:
    """LSB-first bit reader over bytes (VP8L bit order, spec §4)."""

    __slots__ = ("_d", "_pos", "_n")

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0
        self._n = len(data) * 8

    def read_bit(self) -> int:
        p = self._pos
        if p >= self._n:
            raise ValueError("truncated VP8L bitstream")
        self._pos = p + 1
        return (self._d[p >> 3] >> (p & 7)) & 1

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v


class _BitWriter:
    """LSB-first bit writer (encoder + crafted-stream tests)."""

    def __init__(self):
        self._bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self._bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code words are consumed MSB-first by the decoder."""
        for i in range(length - 1, -1, -1):
            self._bits.append((code >> i) & 1)

    def getvalue(self) -> bytes:
        out = bytearray((len(self._bits) + 7) // 8)
        for i, b in enumerate(self._bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# ------------------------------------------------------- prefix codes

def _canonical_codes(lengths) -> dict[int, tuple[int, int]]:
    """code lengths → {symbol: (length, codeword)} (DEFLATE-style
    canonical assignment: sorted by (length, symbol))."""
    used = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = used[0][0] if used else 0
    for l, s in used:
        code <<= l - prev_len
        prev_len = l
        codes[s] = (l, code)
        code += 1
    return codes


class _Code:
    """Canonical prefix decoder from code lengths.

    A single used symbol yields a 0-bit code (read returns it without
    consuming bits — the libwebp convention); multi-symbol codes must
    be exactly complete (Kraft sum == 1) or the stream is invalid.
    """

    __slots__ = ("_single", "_map")

    def __init__(self, lengths):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            self._single = used[0][1]
            self._map = None
            return
        self._single = None
        if max(l for l, _s in used) > 15:
            raise ValueError("prefix code length > 15")
        if sum(1 << (15 - l) for l, _s in used) != 1 << 15:
            raise ValueError("in/over-complete prefix code")
        self._map = {(l, c): s
                     for s, (l, c) in _canonical_codes(lengths).items()}

    def read(self, br: _BitReader) -> int:
        if self._single is not None:
            return self._single
        code = 0
        n = 0
        table = self._map
        while n < 16:
            code = (code << 1) | br.read_bit()
            n += 1
            sym = table.get((n, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code word")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Code:
    """Spec §5.6.2: simple (1-2 symbol) or code-length-coded form."""
    lengths = [0] * alphabet_size
    if br.read(1):                                    # simple code
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        s0 = br.read(8 if first_8bits else 1)
        if s0 >= alphabet_size:
            raise ValueError("simple-code symbol out of range")
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise ValueError("bad second simple-code symbol")
            lengths[s1] = 1
        return _Code(lengths)

    num_codes = br.read(4) + 4                        # normal code
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Code(cl_lengths)
    if br.read(1):                                    # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("max_symbol beyond alphabet")
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = clc.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl <= 18:
            extra, base = ((2, 3), (3, 3), (7, 11))[cl - 16]
            repeat = br.read(extra) + base
            if symbol + repeat > alphabet_size:
                raise ValueError("code-length repeat overruns alphabet")
            fill = prev_len if cl == 16 else 0
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
        else:
            raise ValueError("bad code-length symbol")
    return _Code(lengths)


def _prefix_value(sym: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decode (spec §5.2.1)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (>= 1) → (prefix_symbol, extra_bits, extra_value)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    msb = x.bit_length() - 1
    second = (x >> (msb - 1)) & 1
    sym = 2 * msb + second
    extra_bits = msb - 1
    return sym, extra_bits, x - ((2 + second) << (msb - 1))


def _plane_to_dist(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dx + dy * width
    return d if d >= 1 else 1


# ------------------------------------------------------ pixel helpers

def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _px_add(p: int, q: int) -> int:
    """Per-channel (mod 256) add of two packed ARGB pixels (SWAR)."""
    return ((((p & 0xFF00FF00) + (q & 0xFF00FF00)) & 0xFF00FF00)
            | (((p & 0x00FF00FF) + (q & 0x00FF00FF)) & 0x00FF00FF))


def _px_sub(p: int, q: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= (((p >> sh) - (q >> sh)) & 0xFF) << sh
    return out


def _avg2(p: int, q: int) -> int:
    """Per-channel floor average (libwebp Average2)."""
    return (((p ^ q) & 0xFEFEFEFE) >> 1) + (p & q)


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _pred_select(t: int, l: int, tl: int) -> int:
    """Mode 11: pick the neighbor closer (L1 over channels) to the
    gradient prediction L + T - TL; ties go to top."""
    pa = pb = 0
    for sh in (24, 16, 8, 0):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        pa += abs(lc - tlc)                 # == |pred - T| per channel
        pb += abs(tc - tlc)                 # == |pred - L| per channel
    return t if pa <= pb else l


def _pred_clamp_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= _clip255(v) << sh
    return out


def _pred_clamp_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)   # C trunc-toward-zero
        out |= _clip255(a + half) << sh
    return out


_PREDICTORS = (
    lambda l, t, tl, tr: 0xFF000000,                    # 0 black
    lambda l, t, tl, tr: l,                             # 1 L
    lambda l, t, tl, tr: t,                             # 2 T
    lambda l, t, tl, tr: tr,                            # 3 TR
    lambda l, t, tl, tr: tl,                            # 4 TL
    lambda l, t, tl, tr: _avg2(_avg2(l, tr), t),        # 5
    lambda l, t, tl, tr: _avg2(l, tl),                  # 6
    lambda l, t, tl, tr: _avg2(l, t),                   # 7
    lambda l, t, tl, tr: _avg2(tl, t),                  # 8
    lambda l, t, tl, tr: _avg2(t, tr),                  # 9
    lambda l, t, tl, tr: _avg2(_avg2(l, tl), _avg2(t, tr)),  # 10
    lambda l, t, tl, tr: _pred_select(t, l, tl),        # 11
    lambda l, t, tl, tr: _pred_clamp_full(l, t, tl),    # 12
    lambda l, t, tl, tr: _pred_clamp_half(l, t, tl),    # 13
)


def _i8(v: np.ndarray) -> np.ndarray:
    """uint8-valued array → signed int8 semantics as int32."""
    return np.where(v > 127, v.astype(np.int32) - 256, v.astype(np.int32))


def _split(argb: np.ndarray):
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    return a, r, g, b


def _pack(a, r, g, b) -> np.ndarray:
    return ((a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8) | b.astype(np.uint32))


# ----------------------------------------------------------- decoding

def _decode_pixels(br, w, h, codes, groups_map, meta_bits, cache_bits):
    n = w * h
    buf = [0] * n
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    g_code, r_code, b_code, a_code, d_code = codes[0]
    single_group = groups_map is None
    pos = 0
    while pos < n:
        if not single_group:
            gi = groups_map[(pos // w) >> meta_bits, (pos % w) >> meta_bits]
            g_code, r_code, b_code, a_code, d_code = codes[gi]
        s = g_code.read(br)
        if s < _NUM_LITERALS:                         # literal ARGB
            r = r_code.read(br)
            b = b_code.read(br)
            a = a_code.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            buf[pos] = px
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        elif s < _NUM_LITERALS + _NUM_LENGTH_CODES:   # LZ77 backref
            length = _prefix_value(s - _NUM_LITERALS, br)
            dist_code = _prefix_value(d_code.read(br), br)
            dist = _plane_to_dist(dist_code, w)
            if dist > pos or pos + length > n:
                raise ValueError("LZ77 reference out of range")
            for _ in range(length):
                px = buf[pos - dist]
                buf[pos] = px
                pos += 1
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        else:                                         # color-cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            buf[pos] = cache[s - _NUM_LITERALS - _NUM_LENGTH_CODES]
            pos += 1
    return np.array(buf, dtype=np.uint32).reshape(h, w)


def _inverse_predictor(res: np.ndarray, bits: int, modes_img: np.ndarray,
                       w: int, h: int) -> np.ndarray:
    modes = ((modes_img >> 8) & 0xFF)
    if int(modes.max()) > 13:
        raise ValueError("predictor mode > 13")
    modes = modes.tolist()
    res_flat = res.reshape(-1).tolist()
    out = [0] * (w * h)
    preds = _PREDICTORS
    for y in range(h):
        row_modes = modes[y >> bits]
        base = y * w
        for x in range(w):
            i = base + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                # flat-buffer convention: for x == w-1 the top-right
                # index i-w+1 lands on this row's first pixel — exactly
                # the spec's contiguous-ARGB-array behavior
                pred = preds[row_modes[x >> bits]](
                    out[i - 1], out[i - w], out[i - w - 1], out[i - w + 1])
            out[i] = _px_add(res_flat[i], pred)
    return np.array(out, dtype=np.uint32).reshape(h, w)


def _inverse_color_transform(argb: np.ndarray, bits: int,
                             elements: np.ndarray) -> np.ndarray:
    h, w = argb.shape
    e = elements[np.arange(h) >> bits][:, np.arange(w) >> bits]
    g2r = _i8(e & 0xFF)
    g2b = _i8((e >> 8) & 0xFF)
    r2b = _i8((e >> 16) & 0xFF)
    a, r, g, b = _split(argb)
    gs = _i8(g)
    r = (r.astype(np.int64) + ((g2r * gs) >> 5)) & 0xFF
    rs = _i8(r)
    b = (b.astype(np.int64) + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return _pack(a, r, g, b)


def _inverse_subtract_green(argb: np.ndarray) -> np.ndarray:
    a, r, g, b = _split(argb)
    return _pack(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _inverse_color_index(packed: np.ndarray, width_bits: int,
                         palette: np.ndarray, full_w: int) -> np.ndarray:
    greens = (packed >> 8) & 0xFF
    if width_bits == 0:
        idx = greens
    else:
        bits_per = 8 >> width_bits
        xs = np.arange(full_w)
        src = greens[:, xs >> width_bits]
        idx = (src >> ((xs & ((1 << width_bits) - 1)) * bits_per)) \
            & ((1 << bits_per) - 1)
    if int(idx.max()) >= len(palette):
        raise ValueError("palette index out of range")
    return palette[idx]


def _index_width_bits(n_colors: int) -> int:
    return 3 if n_colors <= 2 else 2 if n_colors <= 4 \
        else 1 if n_colors <= 16 else 0


def _decode_palette(row: np.ndarray) -> np.ndarray:
    """Palette sub-image row → absolute entries (subtraction-coded:
    each stored entry adds componentwise to the previous one)."""
    out = []
    prev = 0
    for p in row.tolist():
        prev = _px_add(prev, p)
        out.append(prev)
    return np.array(out, dtype=np.uint32)


def _decode_image_stream(br: _BitReader, w: int, h: int,
                         level0: bool) -> np.ndarray:
    if w * h > _MAX_PIXELS:
        raise UnsupportedWebP("image too large for pure-Python decode")
    transforms: list[tuple[int, object, int]] = []
    if level0:
        seen: set[int] = set()
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("repeated VP8L transform")
            seen.add(t)
            if t == 2:                                # subtract green
                transforms.append((2, None, w))
            elif t in (0, 1):                         # predictor / color
                bits = br.read(3) + 2
                sub = _decode_image_stream(
                    br, _subsample(w, bits), _subsample(h, bits), False)
                transforms.append((t, (bits, sub), w))
            else:                                     # color indexing
                n_colors = br.read(8) + 1
                pal = _decode_palette(
                    _decode_image_stream(br, n_colors, 1, False)[0])
                width_bits = _index_width_bits(n_colors)
                transforms.append((3, (width_bits, pal), w))
                w = _subsample(w, width_bits)

    cache_bits = 0
    if br.read(1):                                    # color cache
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")

    groups_map = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read(1):                         # meta prefix image
        meta_bits = br.read(3) + 2
        meta = _decode_image_stream(
            br, _subsample(w, meta_bits), _subsample(h, meta_bits), False)
        groups_map = ((meta >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(groups_map.max()) + 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    codes = []
    for _ in range(n_groups):
        codes.append((
            _read_prefix_code(br, _NUM_LITERALS + _NUM_LENGTH_CODES
                              + cache_size),
            _read_prefix_code(br, _NUM_LITERALS),
            _read_prefix_code(br, _NUM_LITERALS),
            _read_prefix_code(br, _NUM_LITERALS),
            _read_prefix_code(br, _NUM_DIST_CODES),
        ))
    argb = _decode_pixels(br, w, h, codes, groups_map, meta_bits, cache_bits)

    for t, data, full_w in reversed(transforms):
        if t == 0:
            bits, sub = data
            argb = _inverse_predictor(argb, bits, sub, full_w,
                                      argb.shape[0])
        elif t == 1:
            bits, sub = data
            argb = _inverse_color_transform(argb, bits, sub)
        elif t == 2:
            argb = _inverse_subtract_green(argb)
        else:
            width_bits, pal = data
            argb = _inverse_color_index(argb, width_bits, pal, full_w)
    return argb


def is_webp(payload: bytes) -> bool:
    return (len(payload) >= 12 and payload[:4] == RIFF_SIG
            and payload[8:12] == WEBP_FOURCC)


def _find_vp8l(payload: bytes) -> bytes:
    """RIFF walk → the VP8L chunk body.

    VP8X/ICCP/EXIF/XMP/ANIM wrappers are skipped; an ANMF animation
    frame is entered and its first frame returned when lossless (the
    same first-frame convention ``gif_codec`` uses for animated GIFs);
    lossy ``VP8 `` data refuses with ``UnsupportedWebP``.
    """
    if not is_webp(payload):
        raise ValueError("not a WebP (bad RIFF header)")
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8L":
            return body
        if tag == b"VP8 ":
            raise UnsupportedWebP("lossy VP8 (DCT pipeline) not decoded")
        if tag == b"ANMF":
            # frame params are 16 bytes, then the frame's own chunks
            sub = 16
            while sub + 8 <= length:
                stag = body[sub:sub + 4]
                (slen,) = struct.unpack("<I", body[sub + 4:sub + 8])
                sbody = body[sub + 8:sub + 8 + slen]
                if len(sbody) < slen:
                    raise ValueError("truncated ANMF sub-chunk")
                if stag == b"VP8L":
                    return sbody                  # first animation frame
                if stag == b"VP8 ":
                    raise UnsupportedWebP(
                        "lossy animated WebP not decoded")
                sub += 8 + slen + (slen & 1)
            raise ValueError("ANMF frame without image data")
        pos += 8 + length + (length & 1)
    raise ValueError("no VP8L chunk in WebP container")


def _find_stream(payload: bytes):
    """First still-image bitstream in the container, top-level or
    inside the first ANMF frame: ``(kind, stream, alph)`` with
    ``kind`` in {"lossless", "lossy"} and ``alph`` the sibling
    ``ALPH`` chunk (lossy only, else None).  The single shared
    container walk for ``decode_webp`` — every sub-chunk length is
    bounds-checked so a truncated file raises instead of handing the
    boolean decoder a silently-short stream (its 8-virtual-zero-byte
    end tolerance would otherwise absorb the loss and decode wrong
    pixels)."""
    if not is_webp(payload):
        raise ValueError("not a WebP (bad RIFF header)")
    pos = 12
    n = len(payload)
    alph = None
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated WebP chunk")
        if tag == b"ALPH":
            alph = body
        if tag == b"VP8 ":
            return "lossy", body, alph
        if tag == b"VP8L":
            return "lossless", body, None
        if tag == b"ANMF":
            sub = 16
            while sub + 8 <= length:
                stag = body[sub:sub + 4]
                (slen,) = struct.unpack("<I", body[sub + 4:sub + 8])
                sbody = body[sub + 8:sub + 8 + slen]
                if len(sbody) < slen:
                    raise ValueError("truncated ANMF sub-chunk")
                if stag == b"ALPH":
                    alph = sbody
                if stag == b"VP8 ":
                    return "lossy", sbody, alph
                if stag == b"VP8L":
                    return "lossless", sbody, None
                sub += 8 + slen + (slen & 1)
        pos += 8 + length + (length & 1)
    raise ValueError("no VP8/VP8L chunk in WebP container")


def _decode_alpha(alph: bytes, w: int, h: int) -> np.ndarray:
    """``ALPH`` chunk → (h, w) uint8 alpha plane (container spec §
    "Alpha"): header byte = 2-bit compression method (0 raw, 1
    headless-VP8L whose green channel carries alpha), 2-bit
    prediction filter (none / horizontal / vertical / gradient,
    applied after decompression with the first-pixel/row
    conventions), 2-bit pre-processing hint.  Level-reduced alpha
    (pre-processing 1, produced only by ``alpha_quality < 100``
    encodes) refuses rather than skipping the smoothing step —
    never a silent wrong decode."""
    if not alph:
        raise ValueError("empty ALPH chunk")
    method = alph[0] & 0x03
    filt = (alph[0] >> 2) & 0x03
    pre = (alph[0] >> 4) & 0x03
    if pre == 1:
        raise UnsupportedWebP("level-reduced (lossy) alpha plane")
    if method == 0:
        if len(alph) < 1 + w * h:
            raise ValueError("truncated raw alpha plane")
        plane = np.frombuffer(alph, np.uint8, w * h, 1).reshape(h, w)
        plane = plane.astype(np.int32)
    elif method == 1:
        br = _BitReader(alph[1:])
        argb = _decode_image_stream(br, w, h, True)
        plane = ((argb >> 8) & 0xFF).astype(np.int32)   # green
    else:
        raise ValueError(f"bad alpha compression method {method}")
    if filt == 0:
        return plane.astype(np.uint8)
    if filt == 1:                                        # horizontal
        # first column chains off the pixel ABOVE; rows left-chain —
        # i.e. a row-wise cumsum seeded by a column-wise cumsum.
        first = np.cumsum(plane[:, 0], dtype=np.int64)
        acc = plane.copy()
        acc[:, 0] = first
        return np.cumsum(acc, axis=1,
                         dtype=np.int64).astype(np.uint8).reshape(h, w)
    if filt == 2:                                        # vertical
        # row 0 left-chains (the horizontal rule); columns top-chain.
        acc = plane.copy()
        acc[0] = np.cumsum(plane[0], dtype=np.int64) & 0xFF
        return np.cumsum(acc, axis=0,
                         dtype=np.int64).astype(np.uint8).reshape(h, w)
    out = np.zeros((h, w), np.int32)                     # gradient
    out[0] = np.cumsum(plane[0], dtype=np.int64) & 0xFF
    for y in range(1, h):
        row_out = out[y]
        row_in = plane[y]
        prev = out[y - 1]
        left = int(prev[0])
        top_left = left
        for x in range(w):
            top = int(prev[x])
            g = left + top - top_left
            pred = 0 if g < 0 else 255 if g > 255 else g
            left = (int(row_in[x]) + pred) & 0xFF
            top_left = top
            row_out[x] = left
    return out.astype(np.uint8)


def decode_webp(payload: bytes) -> tuple[np.ndarray, str]:
    """WebP bytes → ``((h, w, c) uint8 array, mode)``.

    Lossless (``VP8L``) decodes through this module; lossy (``VP8 ``)
    routes to the from-scratch RFC 6386 key-frame decoder in
    ``vp8_codec``, with a sibling ``ALPH`` chunk decoded into the
    alpha channel (raw or headless-VP8L, all three prediction
    filters).  ``mode`` is ``"RGBA"`` when any decoded alpha < 255,
    else ``"RGB"``.  Raises ``UnsupportedWebP`` for unsupported /
    oversized files and ``ValueError`` for malformed ones — never a
    silent wrong decode.
    """
    kind, stream, alph = _find_stream(payload)
    if kind == "lossy":
        from .vp8_codec import decode_vp8
        rgb = decode_vp8(stream)
        if alph is None:
            return rgb, "RGB"
        a = _decode_alpha(alph, rgb.shape[1], rgb.shape[0])
        if bool((a == 255).all()):
            return rgb, "RGB"
        return np.dstack([rgb, a]), "RGBA"
    br = _BitReader(stream)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                                        # alpha-used hint
    if br.read(3) != 0:
        raise UnsupportedWebP("VP8L version != 0")
    argb = _decode_image_stream(br, w, h, True)
    a, r, g, b = (c.astype(np.uint8) for c in _split(argb))
    if bool((a == 255).all()):
        return np.dstack([r, g, b]), "RGB"
    return np.dstack([r, g, b, a]), "RGBA"


# ----------------------------------------------------------- encoding

def _huffman_lengths(freqs: dict[int, int], alphabet: int,
                     max_len: int) -> list[int]:
    """Frequencies → depth-limited canonical Huffman code lengths
    (limit enforced by frequency-halving rebuilds; always complete)."""
    if len(freqs) == 1:
        ((s, _f),) = freqs.items()
        out = [0] * alphabet
        out[s] = 1
        return out
    work = dict(freqs)
    while True:
        heap = [(f, s, None) for s, f in work.items()]
        counter = alphabet
        heapq.heapify(heap)
        while len(heap) > 1:
            f1, _s1, n1 = heapq.heappop(heap)
            f2, _s2, n2 = heapq.heappop(heap)
            counter += 1
            heapq.heappush(heap, (f1 + f2, counter,
                                  ((_s1, n1), (_s2, n2))))
        depths = [0] * alphabet
        stack = [(heap[0][1], heap[0][2], 0)]
        max_seen = 0
        while stack:
            s, node, d = stack.pop()
            if node is None:
                depths[s] = max(d, 1)
                max_seen = max(max_seen, depths[s])
            else:
                (sa, na), (sb, nb) = node
                stack.append((sa, na, d + 1))
                stack.append((sb, nb, d + 1))
        if max_seen <= max_len:
            return depths
        work = {s: (f + 1) >> 1 for s, f in work.items()}


def _write_prefix_code(bw: _BitWriter, lengths: list[int],
                       alphabet: int) -> dict[int, tuple[int, int]]:
    """Emit a prefix code per spec §5.6.2; returns {sym: (len, code)}
    for the subsequent symbol writes."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    if len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)                                # simple code
        bw.write(len(used) - 1, 1)
        first_8 = 0 if used[0] <= 1 else 1
        bw.write(first_8, 1)
        bw.write(used[0], 8 if first_8 else 1)
        if len(used) == 2:
            bw.write(used[1], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        return _canonical_codes(lengths)

    bw.write(0, 1)                                    # normal code
    max_sym = max(used)
    seq = lengths[:max_sym + 1]
    clc_freq: dict[int, int] = {}
    for l in seq:
        clc_freq[l] = clc_freq.get(l, 0) + 1
    clc_lengths = _huffman_lengths(clc_freq, 19, 7)
    order_pos = {sym: i for i, sym in enumerate(_CLC_ORDER)}
    num_codes = max(4, 1 + max(order_pos[s]
                               for s, l in enumerate(clc_lengths) if l))
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(clc_lengths[_CLC_ORDER[i]], 3)
    if len(seq) == alphabet:
        bw.write(0, 1)
    else:
        bw.write(1, 1)
        v = len(seq) - 2
        k = 0
        while 2 + 2 * k < v.bit_length():
            k += 1
        bw.write(k, 3)
        bw.write(v, 2 + 2 * k)
    clc_codes = _canonical_codes(clc_lengths)
    single_clc = sum(1 for l in clc_lengths if l) == 1
    for l in seq:
        if not single_clc:                 # 1 used CLC symbol = 0 bits
            cl, cc = clc_codes[l]
            bw.write_code(cc, cl)
    if len(used) == 1:                     # decoder reads 0 bits for it
        return {used[0]: (0, 0)}
    return _canonical_codes(lengths)


def _freqs(vals) -> dict[int, int]:
    out: dict[int, int] = {}
    for v in vals:
        out[v] = out.get(v, 0) + 1
    return out


def _write_entropy_body(bw: _BitWriter, argb: np.ndarray,
                        level0: bool) -> None:
    """Literal-only entropy-coded image: no cache, no meta prefix,
    per-channel canonical Huffman (simple codes when ≤2 symbols)."""
    bw.write(0, 1)                                    # no color cache
    if level0:
        bw.write(0, 1)                                # no meta prefix
    a, r, g, b = (c.reshape(-1).tolist() for c in _split(argb))
    tables = []
    for vals, alphabet in ((g, _NUM_LITERALS + _NUM_LENGTH_CODES),
                           (r, _NUM_LITERALS), (b, _NUM_LITERALS),
                           (a, _NUM_LITERALS)):
        lengths = _huffman_lengths(_freqs(vals), alphabet, 15)
        tables.append(_write_prefix_code(bw, lengths, alphabet))
    dist_lengths = [0] * _NUM_DIST_CODES
    dist_lengths[0] = 1
    _write_prefix_code(bw, dist_lengths, _NUM_DIST_CODES)
    tg, tr, tb, ta = tables
    for i in range(len(g)):
        for table, v in ((tg, g[i]), (tr, r[i]), (tb, b[i]), (ta, a[i])):
            l, c = table[v]
            if l:
                bw.write_code(c, l)


def _forward_predictor(argb: np.ndarray, bits: int, mode: int
                       ) -> np.ndarray:
    h, w = argb.shape
    flat = argb.reshape(-1).tolist()
    res = [0] * (w * h)
    pred_fn = _PREDICTORS[mode]
    for y in range(h):
        base = y * w
        for x in range(w):
            i = base + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else flat[i - 1]
            elif x == 0:
                pred = flat[i - w]
            else:
                pred = pred_fn(flat[i - 1], flat[i - w],
                               flat[i - w - 1], flat[i - w + 1])
            res[i] = _px_sub(flat[i], pred)
    return np.array(res, dtype=np.uint32).reshape(h, w)


def _forward_color_transform(argb: np.ndarray, g2r: int, g2b: int,
                             r2b: int) -> np.ndarray:
    a, r, g, b = _split(argb)
    gs = _i8(g)
    rs = _i8(r)
    d_g2r = np.int32(g2r - 256 if g2r > 127 else g2r)
    d_g2b = np.int32(g2b - 256 if g2b > 127 else g2b)
    d_r2b = np.int32(r2b - 256 if r2b > 127 else r2b)
    new_r = (r.astype(np.int64) - ((d_g2r * gs) >> 5)) & 0xFF
    new_b = (b.astype(np.int64) - ((d_g2b * gs) >> 5)
             - ((d_r2b * rs) >> 5)) & 0xFF
    return _pack(a, new_r, g, new_b)


def _encode_palette_rows(argb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h, w = argb.shape
    palette, inverse = np.unique(argb.reshape(-1), return_inverse=True)
    if len(palette) > 256:
        raise ValueError("palette transform needs <= 256 colors")
    idx = inverse.reshape(h, w).astype(np.uint32)
    width_bits = _index_width_bits(len(palette))
    if width_bits:
        ppb = 1 << width_bits
        bits_per = 8 >> width_bits
        packed_w = _subsample(w, width_bits)
        packed = np.zeros((h, packed_w), dtype=np.uint32)
        for x in range(w):
            packed[:, x >> width_bits] |= idx[:, x] << ((x % ppb) * bits_per)
        greens = packed
    else:
        greens = idx
    coded = _pack(np.full(greens.shape, 0xFF, np.uint32),
                  np.zeros(greens.shape, np.uint32), greens,
                  np.zeros(greens.shape, np.uint32))
    return palette, coded


def encode_webp(pixels: np.ndarray, transform: str | None = None,
                predictor_mode: int = 2,
                color_deltas: tuple[int, int, int] = (16, 240, 8)
                ) -> bytes:
    """(h, w[, c]) uint8 array → lossless WebP bytes.

    ``transform``: None, "subtract_green", "predictor" (single
    ``predictor_mode`` for every block, block bits 4), "color" (one
    cross-color element for the whole image), or "palette".  Gray
    input replicates to RGB; missing alpha encodes as 255.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 2, 3, 4):
        raise ValueError("expected (h, w[, 1|2|3|4]) pixel array")
    h, w, c = px.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions out of range")
    if c == 1:
        px = np.repeat(px, 3, axis=2)
        c = 3
    elif c == 2:                                      # gray + alpha
        px = np.dstack([np.repeat(px[:, :, :1], 3, axis=2), px[:, :, 1]])
        c = 4
    full = np.full((h, w), 255, dtype=np.uint32)
    alpha = px[:, :, 3].astype(np.uint32) if c == 4 else full
    argb = _pack(alpha, px[:, :, 0].astype(np.uint32),
                 px[:, :, 1].astype(np.uint32),
                 px[:, :, 2].astype(np.uint32))

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if bool((alpha != 255).any()) else 0, 1)
    bw.write(0, 3)                                    # version

    if transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        a_, r_, g_, b_ = _split(argb)
        argb = _pack(a_, (r_ - g_) & 0xFF, g_, (b_ - g_) & 0xFF)
    elif transform == "predictor":
        if not 0 <= predictor_mode <= 13:
            raise ValueError("predictor mode must be 0..13")
        bits = 4
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        mw, mh = _subsample(w, bits), _subsample(h, bits)
        mode_img = np.full((mh, mw),
                           0xFF000000 | (predictor_mode << 8), np.uint32)
        _write_entropy_body(bw, mode_img, level0=False)
        argb = _forward_predictor(argb, bits, predictor_mode)
    elif transform == "color":
        g2r, g2b, r2b = color_deltas
        bits = 4
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(bits - 2, 3)
        mw, mh = _subsample(w, bits), _subsample(h, bits)
        elem = np.full((mh, mw),
                       0xFF000000 | (r2b << 16) | (g2b << 8) | g2r,
                       np.uint32)
        _write_entropy_body(bw, elem, level0=False)
        argb = _forward_color_transform(argb, g2r, g2b, r2b)
    elif transform == "palette":
        palette, coded = _encode_palette_rows(argb)
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(palette) - 1, 8)
        deltas = [int(palette[0])] + [
            _px_sub(int(palette[i]), int(palette[i - 1]))
            for i in range(1, len(palette))]
        _write_entropy_body(
            bw, np.array(deltas, np.uint32).reshape(1, -1), level0=False)
        argb = coded
    elif transform is not None:
        raise ValueError(f"unknown transform {transform!r}")
    bw.write(0, 1)                                    # transforms done

    _write_entropy_body(bw, argb, level0=True)
    return _wrap_vp8l(bw.getvalue())


def _wrap_vp8l(body: bytes) -> bytes:
    """VP8L bitstream bytes → complete RIFF/WEBP container."""
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\0"
    return RIFF_SIG + struct.pack("<I", 4 + len(chunk)) + WEBP_FOURCC + chunk


# --------------------------------------------------------- animation
# Animated WebP (the VP8X/ANIM/ANMF extension of the container spec):
# each ANMF carries frame geometry (offsets stored in 2-pixel units),
# a duration, a blend bit (alpha-blend vs overwrite) and a dispose bit
# (none vs fill-rect-with-ANIM-background) — the same compositing
# model as APNG with WebP's own encodings.


def _decode_vp8l_rgba(body: bytes) -> np.ndarray:
    """One VP8L bitstream → (h, w, 4) RGBA uint8."""
    br = _BitReader(body)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)
    if br.read(3) != 0:
        raise UnsupportedWebP("VP8L version != 0")
    argb = _decode_image_stream(br, w, h, True)
    a, r, g, b = (c.astype(np.uint8) for c in _split(argb))
    return np.dstack([r, g, b, a])


def decode_webp_frames(payload: bytes,
                       max_frames: int = 256) -> list[np.ndarray]:
    """Animated lossless WebP → list of fully-composited ``(h, w, 4)``
    RGBA canvases, one per ANMF frame.

    Blend bit 0 alpha-composites the frame over the canvas (identical
    Porter-Duff OVER arithmetic to the APNG compositor); blend bit 1
    overwrites the rectangle.  Dispose bit 1 fills the rectangle with
    the ANIM background color (BGRA in the file) after the frame
    renders.  Frames may be lossless (VP8L) or lossy (VP8 + optional
    ALPH transparency plane, via the RFC 6386 decoder).  Raises
    ``UnsupportedWebP`` for a static WebP (no ANMF), ``ValueError``
    for malformed containers (frame rect outside the canvas,
    truncated chunks).
    """
    if not is_webp(payload):
        raise ValueError("not a WebP (bad RIFF header)")
    pos = 12
    n = len(payload)
    canvas_w = canvas_h = None
    bg = np.zeros(4, dtype=np.uint8)
    frames = []                    # (x, y, blend, dispose, rgba)
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8X":
            if length < 10:
                raise ValueError("truncated VP8X")
            canvas_w = int.from_bytes(body[4:7], "little") + 1
            canvas_h = int.from_bytes(body[7:10], "little") + 1
        elif tag == b"ANIM":
            if length < 6:
                raise ValueError("truncated ANIM")
            # file order is B, G, R, A
            bg = np.array([body[2], body[1], body[0], body[3]],
                          dtype=np.uint8)
        elif tag == b"ANMF":
            if length < 16:
                raise ValueError("truncated ANMF params")
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            flags = body[15]
            blend = (flags >> 1) & 1       # 0 = alpha blend, 1 = overwrite
            dispose = flags & 1            # 1 = fill rect with background
            sub = 16
            stream = None
            lossy = False
            alph = None
            while sub + 8 <= length:
                stag = body[sub:sub + 4]
                (slen,) = struct.unpack("<I", body[sub + 4:sub + 8])
                sbody = body[sub + 8:sub + 8 + slen]
                if len(sbody) < slen:
                    raise ValueError("truncated ANMF sub-chunk")
                if stag == b"VP8L":
                    stream = sbody
                    lossy = False
                elif stag == b"VP8 ":
                    stream = sbody
                    lossy = True
                elif stag == b"ALPH":
                    alph = sbody
                sub += 8 + slen + (slen & 1)
            if stream is None:
                raise ValueError("ANMF frame without image data")
            # store the bitstream, decode LAZILY in the composite
            # loop: only the first max_frames frames (and only after
            # the canvas cap and geometry checks) ever materialize
            # pixels — otherwise a crafted file with thousands of
            # tiny-on-the-wire constant-color frames allocates GBs
            # during the walk
            frames.append((fx, fy, fw, fh, blend, dispose,
                           stream, lossy, alph))
        pos += 8 + length + (length & 1)
    if not frames:
        raise UnsupportedWebP("WebP without ANMF frames (not animated)")
    if canvas_w is None:
        raise ValueError("animated WebP missing VP8X canvas")
    if canvas_w * canvas_h > 1 << 24:
        raise UnsupportedWebP("WebP canvas beyond 16M-pixel cap")

    canvas = np.zeros((canvas_h, canvas_w, 4), dtype=np.uint8)
    out = []
    for (fx, fy, fw, fh, blend, dispose, stream, lossy,
         alph) in frames[:max_frames]:
        if fx + fw > canvas_w or fy + fh > canvas_h:
            raise ValueError("ANMF frame rect outside canvas")
        if lossy:
            from .vp8_codec import decode_vp8
            rgb = decode_vp8(stream)
            rgba = np.empty(rgb.shape[:2] + (4,), np.uint8)
            rgba[..., :3] = rgb
            rgba[..., 3] = (_decode_alpha(alph, rgb.shape[1],
                                          rgb.shape[0])
                            if alph is not None else 255)
        else:
            rgba = _decode_vp8l_rgba(stream)
        if rgba.shape[0] != fh or rgba.shape[1] != fw:
            raise ValueError("ANMF geometry / bitstream size mismatch")
        rect = canvas[fy:fy + fh, fx:fx + fw]
        if blend == 1:
            rect[:] = rgba
        else:
            composite_over(rect, rgba)
        out.append(canvas.copy())
        if dispose:
            canvas[fy:fy + fh, fx:fx + fw] = bg
    return out


def encode_webp_anim(frames, bg=(0, 0, 0, 0)) -> bytes:
    """Animated lossless WebP (the animation decoder's test twin).

    ``frames`` is a list of ``(pixels, x, y, blend, dispose)`` with
    ``pixels`` ``(h, w, 4)`` uint8 RGBA and even x/y offsets (the
    format stores them in 2-pixel units); frame 0 should cover the
    canvas.  ``bg`` is the ANIM background color as RGBA.
    """
    if not frames:
        raise ValueError("encode_webp_anim needs at least one frame")
    first = np.ascontiguousarray(frames[0][0], dtype=np.uint8)
    if first.ndim != 3 or first.shape[2] != 4:
        raise ValueError("animated WebP frames must be (h, w, 4) RGBA")
    ch, cw = first.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        out = tag + struct.pack("<I", len(data)) + data
        return out + (b"\0" if len(data) & 1 else b"")

    vp8x = bytes([0x02, 0, 0, 0]) \
        + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    anim = bytes([bg[2], bg[1], bg[0], bg[3]]) + struct.pack("<H", 0)
    body = chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim)
    for px, x, y, blend, dispose in frames:
        arr = np.ascontiguousarray(px, dtype=np.uint8)
        if arr.ndim != 3 or arr.shape[2] != 4:
            raise ValueError("animated WebP frames must be (h, w, 4) RGBA")
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even (2px units)")
        fh, fw = arr.shape[:2]
        if x + fw > cw or y + fh > ch:
            raise ValueError("ANMF frame rect outside canvas")
        vp8l = _find_vp8l(encode_webp(arr))
        params = ((x // 2).to_bytes(3, "little")
                  + (y // 2).to_bytes(3, "little")
                  + (fw - 1).to_bytes(3, "little")
                  + (fh - 1).to_bytes(3, "little")
                  + (10).to_bytes(3, "little")
                  + bytes([(int(blend) & 1) << 1 | (int(dispose) & 1)]))
        body += chunk(b"ANMF", params + chunk(b"VP8L", vp8l))
    return (RIFF_SIG + struct.pack("<I", 4 + len(body)) + WEBP_FOURCC
            + body)
