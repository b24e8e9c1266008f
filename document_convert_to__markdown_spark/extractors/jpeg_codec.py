"""From-scratch baseline JPEG codec — stdlib + numpy only.

Closes the last image-format gap in the multimodal decode matrix
(multimodal.py module docstring): PNG/GIF/BMP/TIFF already decode real
pixels; JPEG — the dominant *lossy* web format — needed the full DCT
entropy pipeline, implemented here directly from the public spec
(ITU-T T.81 / ISO-IEC 10918-1).  No reference-code lineage: the
reference repo wraps MarkItDown/PIL and contains no codec to copy.

- ``decode_jpeg``: baseline sequential DCT (SOF0/SOF1) AND
  progressive DCT (SOF2, T.81 Annex G: spectral selection +
  successive approximation, EOB runs, per-scan restart markers) —
  together the two modes that cover essentially every JPEG on the
  web.  8-bit, grayscale or 3-component YCbCr with arbitrary sampling
  factors (4:4:4 / 4:2:2 / 4:2:0 all covered by the general Hi×Vi MCU
  walk), DQT/DHT tables read from the stream (redefinable between
  progressive scans), restart markers (DRI/RSTn) honored with
  DC-predictor / EOB-run reset.  Arithmetic coding, 12-bit precision,
  lossless/hierarchical modes, and 4-component CMYK raise
  ``UnsupportedJpeg`` — callers fall back to their labeled stub path,
  never a silent wrong decode.
- ``encode_jpeg``: baseline 4:4:4 (or 4:2:0 via ``subsampling``)
  with the Annex K.1/K.2 quantization tables scaled by the standard
  quality formula and the Annex K.3 "typical" Huffman tables, JFIF
  APP0, optional restart intervals — so tests roundtrip through the
  real entropy coder and the decoder's RST/subsampling paths are
  exercised without any external JPEG to import.
- ``encode_jpeg_progressive``: the same quantized coefficients
  emitted through a libjpeg-style 10-scan (gray: 5-scan) progressive
  script — interleaved DC first scan at Al=1, spectral-band AC first
  scans, then successive-approximation refinement scans down to Al=0.
  Because both encoders quantize with the identical per-block
  expression, ``decode(encode_jpeg_progressive(img)) ==
  decode(encode_jpeg(img))`` byte-for-byte — the cross-mode parity
  contract the tests pin.  EOB runs are capped at 1 (the Annex K.3
  tables carry no EOBn>0 symbols); the decoder handles arbitrary EOB
  runs, exercised by a custom-table fixture in the tests.

Blocks transform through an orthonormal 8×8 DCT matrix (numpy
``M @ B @ M.T``); the Huffman bit loops are per-coefficient Python,
fine for the fixture-scale images this container processes — the
module documents that a production swap-in is libjpeg-turbo behind
the same two function signatures.

Lossy means roundtrips are approximate: tests bound max pixel error
as a function of quality instead of pinning bytes.

Cross-validated against the system libjpeg (``tests/
test_libjpeg_parity.py``, gcc-compiled shim, test-time oracle only):
our decode of libjpeg-encoded streams and libjpeg's decode of our
streams agree within ±2 levels on photo-like content across baseline/
progressive and 4:4:4/4:2:0, with a ≤0.6-level mean — the bound two
independent conforming T.81 decoders are allowed.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SOI = b"\xff\xd8\xff"


class UnsupportedJpeg(ValueError):
    """Valid JPEG outside baseline sequential 8-bit gray/YCbCr."""


# --- constant tables (ITU-T T.81 Annex K — published spec values) ---------

# K.1 / K.2 quantization tables, row-major 8x8
_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# zigzag scan: position k in the scan -> row-major index in the block
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8-point DCT-II matrix: forward F = M @ B @ M.T (T.81 A.3.3)
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _c, _x


def _build_codes(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """Annex-K table scaled by the standard 1-100 quality knob."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (SSSS category, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        while self._nbits:        # pad to a byte boundary with 1s (T.81 F.1.2.3)
            self.write(1, 1)


def _quantize_block(block: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """8x8 spatial block -> 64 quantized coefficients in zigzag order.

    The single shared quantizer expression: both the baseline and the
    progressive encoder call exactly this, so the two streams carry
    identical coefficients and decode to identical pixels (the
    cross-mode parity contract).
    """
    coeffs = _DCT_M @ (block.astype(np.float64) - 128.0) @ _DCT_M.T
    q = np.round(coeffs / quant.reshape(8, 8)).astype(np.int64)
    return q.reshape(64)[_ZIGZAG]


def _encode_block(bw, block, quant, dc_codes, ac_codes, dc_pred):
    """8x8 spatial block -> entropy-coded bits; returns new DC pred."""
    zz = _quantize_block(block, quant)
    diff = int(zz[0]) - dc_pred
    size, raw = _magnitude(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(raw, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]          # ZRL
            bw.write(c, ln)
            run -= 16
        size, raw = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(raw, size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]              # EOB
        bw.write(c, ln)
    return int(zz[0])


def _comp_blocks(plane: np.ndarray, by: int, bx: int) -> np.ndarray:
    """Edge-pad a plane to (8*by, 8*bx) and return (by, bx, 8, 8)."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, 8 * by - h), (0, 8 * bx - w)), mode="edge")
    return padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)


def _plan_encode(pixels: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half: validate, color-convert, subsample,
    edge-pad onto the MCU lattice.  Returns ``(gray, h, w, grids,
    samp, quants, mcus_x, mcus_y)`` where ``grids[ci]`` is a
    ``(BY, BX, 8, 8)`` spatial block array on the padded lattice.
    Both the baseline and the progressive encoder start here, so the
    pixel pipeline ahead of entropy coding is identical.
    """
    px = np.asarray(pixels)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    if px.ndim not in (2, 3) or (px.ndim == 3 and px.shape[2] != 3):
        raise ValueError("encode_jpeg takes (h,w) gray or (h,w,3) RGB")
    if px.size == 0:
        raise ValueError("empty image")
    h, w = px.shape[:2]
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("image too large for JPEG headers")
    gray = px.ndim == 2
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    q_lum = _scaled_quant(_QUANT_LUM, quality)
    q_chr = _scaled_quant(_QUANT_CHROMA, quality)

    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        quants = [q_lum]
    else:
        rgb = px.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # box-average 2x2 (pad odd dims by edge first)
            cbp = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
            crp = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        quants = [q_lum, q_chr, q_chr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component block grids sized to the MCU lattice
    grids = []
    for plane, (sh, sv) in zip(planes, samp):
        grids.append(_comp_blocks(np.clip(plane, 0, 255),
                                  mcus_y * sv, mcus_x * sh))
    return gray, h, w, grids, samp, quants, mcus_x, mcus_y


def _write_frame_headers(out: bytearray, gray: bool, h: int, w: int,
                         samp, quants, sof_marker: int,
                         restart_interval: int) -> None:
    """SOI..DRI common header block (APP0/DQT/SOFn/DHT/DRI)."""
    q_lum = quants[0]
    out += b"\xff\xd8"                                    # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
        + bytes(int(v) for v in q_lum[_ZIGZAG])           # DQT 0
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" \
            + bytes(int(v) for v in quants[1][_ZIGZAG])   # DQT 1
    ncomp = 1 if gray else 3
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", len(sof) + 2) + sof
    for tc_th, bits, vals in (
            ((0x00, _DC_LUM_BITS, _DC_LUM_VALS),
             (0x10, _AC_LUM_BITS, _AC_LUM_VALS))
            + (() if gray else
               ((0x01, _DC_CHR_BITS, _DC_CHR_VALS),
                (0x11, _AC_CHR_BITS, _AC_CHR_VALS)))):
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    if restart_interval > 0:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w[, c]) uint8 gray/RGB -> baseline JFIF bytes.

    ``subsampling``: "444" (one block each of Y/Cb/Cr per MCU) or
    "420" (2x2 Y blocks + box-averaged chroma — exercises the
    decoder's general sampling-factor walk).  ``restart_interval`` > 0
    emits DRI + RSTn markers every that-many MCUs.
    """
    gray, h, w, grids, samp, quants, mcus_x, mcus_y = _plan_encode(
        pixels, quality, subsampling)

    dc_lum = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chr = _build_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_chr = _build_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    huffs = [(dc_lum, ac_lum)] + [(dc_chr, ac_chr)] * (len(grids) - 1)

    out = bytearray()
    ncomp = len(grids)
    _write_frame_headers(out, gray, h, w, samp, quants, 0xC0,
                         restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out + bytes([0xFF, 0xD0 + rst])
                bw = _BitWriter()
                rst = (rst + 1) & 7
                preds = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                dc_codes, ac_codes = huffs[ci]
                for by in range(sv):
                    for bx in range(sh):
                        block = grids[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            bw, block, quants[ci].reshape(8, 8),
                            dc_codes, ac_codes, preds[ci])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"                                    # EOI
    return bytes(out)


# --- progressive encoder (T.81 Annex G) ------------------------------------

# libjpeg-style scan scripts: (component indices, Ss, Se, Ah, Al).
# DC first at Al=1 interleaved, luma AC split into a low band for the
# early passes, successive-approximation refinements down to Al=0.
_PROG_SCRIPT_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)
_PROG_SCRIPT_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def _emit_ac_first_block(bw, zz, ss, se, al, ac_codes) -> None:
    """One block of an AC spectral-selection/first-SA scan (G.1.2.2).

    EOB runs are capped at 1 (plain EOB0 per all-done block) because
    the Annex K.3 tables define no EOBn>0 symbols — valid, just less
    compact than libjpeg's deferred runs.
    """
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        mag = abs(t) >> al
        if mag == 0:
            r += 1
            continue
        while r > 15:
            c, ln = ac_codes[0xF0]                        # ZRL
            bw.write(c, ln)
            r -= 16
        size = mag.bit_length()
        raw = mag if t > 0 else (mag ^ ((1 << size) - 1))
        c, ln = ac_codes[(r << 4) | size]
        bw.write(c, ln)
        bw.write(raw, size)
        r = 0
    if r:
        c, ln = ac_codes[0x00]                            # EOB (run 1)
        bw.write(c, ln)


def _emit_ac_refine_block(bw, zz, ss, se, al, ac_codes) -> None:
    """One block of an AC successive-approximation refinement scan
    (G.1.2.3): newly-significant coefficients carry a (run, 1) symbol
    plus a sign bit; already-significant coefficients contribute one
    buffered correction bit each, flushed after the next emitted
    symbol in coefficient order — exactly the order the decoder
    consumes them while walking the run.  The pending ZRL check fires
    at every nonzero magnitude BEFORE its bit is buffered, mirroring
    the decoder's skip walk.
    """
    p_sign = []   # buffered correction bits
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        mag = abs(t) >> al
        if mag == 0:
            r += 1
            continue
        while r > 15:
            c, ln = ac_codes[0xF0]                        # ZRL
            bw.write(c, ln)
            r -= 16
            for bit in p_sign:
                bw.write(bit, 1)
            p_sign = []
        if mag > 1:                  # already significant: correction bit
            p_sign.append(mag & 1)
            continue
        c, ln = ac_codes[(r << 4) | 1]                    # newly significant
        bw.write(c, ln)
        bw.write(1 if t > 0 else 0, 1)                    # sign
        for bit in p_sign:
            bw.write(bit, 1)
        p_sign = []
        r = 0
    if r or p_sign:
        c, ln = ac_codes[0x00]                            # EOB (run 1)
        bw.write(c, ln)
        for bit in p_sign:
            bw.write(bit, 1)


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 85,
                            subsampling: str = "444",
                            restart_interval: int = 0) -> bytes:
    """(h, w[, c]) uint8 gray/RGB -> progressive (SOF2) JFIF bytes.

    Same pixel pipeline and per-block quantizer as ``encode_jpeg``,
    entropy-coded through the ``_PROG_SCRIPT_*`` scan script, so the
    decoded image is byte-identical to the baseline encode at the same
    quality/subsampling.  ``restart_interval`` > 0 emits RSTn every
    that-many MCUs (interleaved DC scans) / blocks (all other scans).
    """
    gray, h, w, grids, samp, quants, mcus_x, mcus_y = _plan_encode(
        pixels, quality, subsampling)
    ncomp = len(grids)

    # quantized zigzag coefficients per component, on the padded lattice
    zzs = []
    for grid, q in zip(grids, quants):
        by_n, bx_n = grid.shape[:2]
        z = np.zeros((by_n, bx_n, 64), dtype=np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                z[by, bx] = _quantize_block(grid[by, bx], q.reshape(8, 8))
        zzs.append(z)
    # non-interleaved scans cover only the component's own block raster
    # (T.81 A.2.2), not the MCU-padded lattice
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    nblocks = []
    for sh, sv in samp:
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        nblocks.append((-(-ch // 8), -(-cw // 8)))

    dc_lum = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chr = _build_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_chr = _build_codes(_AC_CHR_BITS, _AC_CHR_VALS)

    out = bytearray()
    _write_frame_headers(out, gray, h, w, samp, quants, 0xC2,
                         restart_interval)

    script = _PROG_SCRIPT_GRAY if gray else _PROG_SCRIPT_COLOR
    for cis, ss, se, ah, al in script:
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([ci + 1, (0x00 if ci == 0 else 0x11)])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

        bw = _BitWriter()
        rst = 0
        unit = 0

        def boundary():
            nonlocal bw, rst
            bw.flush()
            out.extend(bw.out)
            out.extend(bytes([0xFF, 0xD0 + rst]))
            bw = _BitWriter()
            rst = (rst + 1) & 7

        if ss == 0 and ah == 0:                       # DC first scan
            preds = [0] * ncomp
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and unit and \
                            unit % restart_interval == 0:
                        boundary()
                        preds = [0] * ncomp
                    for ci in cis:
                        sh, sv = samp[ci]
                        dc_codes = dc_lum if ci == 0 else dc_chr
                        for by in range(sv):
                            for bx in range(sh):
                                v = int(zzs[ci][my * sv + by,
                                                mx * sh + bx, 0]) >> al
                                size, raw = _magnitude(v - preds[ci])
                                preds[ci] = v
                                c, ln = dc_codes[size]
                                bw.write(c, ln)
                                if size:
                                    bw.write(raw, size)
                    unit += 1
        elif ss == 0:                                  # DC refinement scan
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and unit and \
                            unit % restart_interval == 0:
                        boundary()
                    for ci in cis:
                        sh, sv = samp[ci]
                        for by in range(sv):
                            for bx in range(sh):
                                bw.write((int(zzs[ci][my * sv + by,
                                                      mx * sh + bx, 0])
                                          >> al) & 1, 1)
                    unit += 1
        else:                                          # AC scan (ns == 1)
            ci = cis[0]
            ac_codes = ac_lum if ci == 0 else ac_chr
            bh_i, bw_i = nblocks[ci]
            for b in range(bh_i * bw_i):
                if restart_interval and b and b % restart_interval == 0:
                    boundary()
                zz = zzs[ci][b // bw_i, b % bw_i]
                if ah == 0:
                    _emit_ac_first_block(bw, zz, ss, se, al, ac_codes)
                else:
                    _emit_ac_refine_block(bw, zz, ss, se, al, ac_codes)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"                                    # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------

class _BitReader:
    """MSB-first reader over unstuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            self._acc = self.data[self.pos]
            self.pos += 1
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(raw: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: raw magnitude bits -> signed value."""
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


def _decode_lookup(bits, vals):
    """DHT payload -> {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("bad DHT: counts exceed symbols")
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _split_entropy(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Scan-data walk from ``start``: unstuff 0xFF00, split at RSTn.

    Returns (segments, index of the terminating marker's 0xFF).
    """
    segs = []
    cur = bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = payload[i + 1]
        if nxt == 0x00:                      # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:            # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                                # real marker ends the scan
            segs.append(bytes(cur))
            return segs, i
    segs.append(bytes(cur))
    return segs, n


def _ac_first_block(br, ac_tbl, blk, ss, se, al, eobrun) -> int:
    """Decode one block of an AC first scan (G.2.1); returns eobrun."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _decode_huff(br, ac_tbl)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:                           # ZRL: 16 zeros
                k += 16
                continue
            eobrun = (1 << r) - 1                 # EOBn: this block done
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past spectral band")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(br, ac_tbl, blk, ss, se, al, eobrun) -> int:
    """Decode one block of an AC refinement scan (G.1.2.3).

    Walks the band skipping zero-*history* coefficients per the run
    length while reading one correction bit for every nonzero-history
    coefficient passed; inside an EOB run only the correction bits are
    read.  Returns the remaining eobrun.
    """
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _decode_huff(br, ac_tbl)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s == 0:
                if r != 15:                       # EOBn (includes this block)
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement symbol")
                newval = p1 if br.read_bit() else -p1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if br.read_bit() and (abs(v) & p1) == 0:
                        blk[k] = v + p1 if v >= 0 else v - p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0:
                if br.read_bit() and (abs(v) & p1) == 0:
                    blk[k] = v + p1 if v >= 0 else v - p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(payload, start, coefs, frame, huff,
                             scan_comps, ss, se, ah, al,
                             restart_interval) -> int:
    """Decode one progressive scan's entropy data into ``coefs``
    (per-component ``(BY, BW, 64)`` int32, zigzag order).  Returns the
    payload index of the terminating marker's 0xFF so the caller's
    marker walk continues there.
    """
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # map scan components to frame order (B.2.3: frame order, no dups)
    idxs = []
    last = -1
    for (cs, _td, _ta) in scan_comps:
        ci = next((j for j, c in enumerate(comps) if c[0] == cs), None)
        if ci is None or ci <= last:
            raise ValueError("bad progressive scan component list")
        idxs.append(ci)
        last = ci
    ns = len(idxs)
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with nonzero Se")
    else:
        if ns != 1 or not (ss <= se <= 63):
            raise ValueError("AC progressive scan must be single-component")
    if al > 13:
        raise ValueError("bad successive-approximation shift")
    dc_first = ss == 0 and ah == 0
    tables = []
    for (cs, td, ta) in scan_comps:
        if dc_first:
            if (0, td) not in huff:
                raise ValueError("JPEG references missing DC table")
            tables.append(huff[(0, td)])
        elif ss > 0:
            if (1, ta) not in huff:
                raise ValueError("JPEG references missing AC table")
            tables.append(huff[(1, ta)])
        else:
            tables.append(None)                   # DC refine: raw bits

    segs, end = _split_entropy(payload, start)
    seg_idx = 0
    br = _BitReader(segs[0] if segs else b"")
    preds = [0] * ns
    eobrun = 0

    if ns > 1:                                    # interleaved DC scan
        units = mcus_x * mcus_y
    else:
        # non-interleaved: the component's own block raster (A.2.2),
        # ceil(comp samples / 8) per axis, NOT the MCU-padded lattice
        ci = idxs[0]
        _cid, sh, sv, _tq = comps[ci]
        comp_w = -(-fw * sh // hmax)
        comp_h = -(-fh * sv // vmax)
        bw_i = -(-comp_w // 8)
        bh_i = -(-comp_h // 8)
        units = bw_i * bh_i

    for unit in range(units):
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            br = _BitReader(segs[seg_idx])
            preds = [0] * ns
            eobrun = 0
        if ns > 1:                                # MCU walk, DC only
            my, mx = divmod(unit, mcus_x)
            for si, ci in enumerate(idxs):
                _cid, sh, sv, _tq = comps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = coefs[ci][my * sv + by, mx * sh + bx]
                        if ah == 0:
                            size = _decode_huff(br, tables[si])
                            if size > 11:
                                raise ValueError("bad DC category")
                            preds[si] += _extend(br.read_bits(size), size)
                            blk[0] = preds[si] << al
                        else:
                            blk[0] = int(blk[0]) | (br.read_bit() << al)
        else:                                     # single-component raster
            ci = idxs[0]
            blk = coefs[ci][unit // bw_i, unit % bw_i]
            if ss == 0:
                if ah == 0:
                    size = _decode_huff(br, tables[0])
                    if size > 11:
                        raise ValueError("bad DC category")
                    preds[0] += _extend(br.read_bits(size), size)
                    blk[0] = preds[0] << al
                else:
                    blk[0] = int(blk[0]) | (br.read_bit() << al)
            elif ah == 0:
                eobrun = _ac_first_block(br, tables[0], blk, ss, se, al,
                                         eobrun)
            else:
                eobrun = _ac_refine_block(br, tables[0], blk, ss, se, al,
                                          eobrun)
    return end


def _init_progressive(frame, n, entropy_start):
    """Allocate per-component coefficient arrays on the MCU lattice.

    Area sanity BEFORE allocation, mirroring the baseline guard: a
    progressive first scan can legitimately be DC-only (>= ~2 bits per
    block), so bound declared blocks at 4 per remaining payload byte.
    """
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    blocks_per_mcu = sum(sh * sv for _, sh, sv, _ in comps)
    if mcus_x * mcus_y * blocks_per_mcu > 4 * (n - entropy_start) + 64:
        raise ValueError("declared block count exceeds scan data")
    # int64: a hostile stream can walk DC predictors past int32 (the
    # callers' error contract is ValueError, not numpy OverflowError)
    return [np.zeros((mcus_y * sv, mcus_x * sh, 64), dtype=np.int64)
            for (_cid, sh, sv, _tq) in comps]


def _reconstruct_progressive(frame, coefs, quant):
    """Dequantize + IDCT the accumulated coefficient arrays.

    Uses the identical per-block ``M.T @ C @ M`` expression as the
    baseline streaming path so a progressive stream carrying the same
    quantized coefficients decodes to byte-identical pixels (all-zero
    blocks short-circuit to the flat 128 the IDCT would produce).
    """
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (_cid, _sh, _sv, tq) in enumerate(comps):
        if tq not in quant:
            raise ValueError("JPEG references missing table")
        zzq = quant[tq][_ZIGZAG].astype(np.int64)
        grid = coefs[ci]
        by_n, bx_n = grid.shape[:2]
        plane = np.full((by_n * 8, bx_n * 8), 128.0)
        nz_by, nz_bx = np.nonzero(grid.any(axis=2))
        for by, bx in zip(nz_by, nz_bx):
            zz = grid[by, bx].astype(np.int64)
            coeff = (zz * zzq)[_UNZIGZAG].reshape(8, 8)
            block = _DCT_M.T @ coeff.astype(np.float64) @ _DCT_M
            plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block + 128.0
        planes.append(plane)
    return _finish_planes(planes, comps, hmax, vmax, fh, fw)


def _finish_planes(planes, comps, hmax, vmax, fh, fw):
    """Upsample subsampled planes to the full lattice, crop to the
    frame size, and color-convert — shared by both decode modes."""
    full = []
    for plane, (_cid, sh, sv, _tq) in zip(planes, comps):
        if sh != hmax or sv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // sv, axis=0),
                              hmax // sh, axis=1)
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8), "L"
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8), "RGB"


def decode_jpeg(payload: bytes) -> tuple[np.ndarray, str]:
    """Baseline or progressive JFIF bytes ->
    ((h, w) or (h, w, 3) uint8, "L"|"RGB")."""
    if payload[:3] != JPEG_SOI:
        raise ValueError("not a JPEG (missing SOI)")
    quant = {}           # Tq -> 64 int32 (natural order)
    huff = {}            # (class, id) -> lookup table
    frame = None         # (h, w, comps) where comps = [(id, sh, sv, tq)]
    progressive = False
    coefs = None         # progressive: per-comp (BY, BW, 64) int32 zigzag
    scans_seen = 0
    restart_interval = 0
    scan = None
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1       # tolerate fill bytes / garbage between markers
            continue
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1       # fill byte: the next 0xFF may be the marker
            continue
        if marker in (0x00, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:                  # EOI
            break
        seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
        if seg_len < 2 or i + 2 + seg_len > n:
            raise ValueError("truncated JPEG segment")
        data = payload[i + 4:i + 2 + seg_len]
        if marker == 0xDB:                  # DQT
            j = 0
            while j < len(data):
                pq, tq = data[j] >> 4, data[j] & 0x0F
                if pq != 0:
                    raise UnsupportedJpeg("16-bit quant tables")
                if j + 65 > len(data):
                    raise ValueError("short DQT")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(
                    data[j + 1:j + 65], dtype=np.uint8).astype(np.int32)
                quant[tq] = tbl
                j += 65
        elif marker == 0xC4:                # DHT
            j = 0
            while j + 17 <= len(data):
                tc, th = data[j] >> 4, data[j] & 0x0F
                bits = list(data[j + 1:j + 17])
                count = sum(bits)
                vals = list(data[j + 17:j + 17 + count])
                if len(vals) < count:
                    raise ValueError("short DHT")
                huff[(tc, th)] = _decode_lookup(bits, vals)
                j += 17 + count
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog.
            if frame is not None:
                raise ValueError("multiple SOF markers")
            progressive = marker == 0xC2
            if len(data) < 6:
                raise ValueError("short SOF segment")
            if data[0] != 8:
                raise UnsupportedJpeg("non-8-bit precision")
            fh, fw = struct.unpack(">HH", data[1:5])
            ncomp = data[5]
            if ncomp not in (1, 3):
                raise UnsupportedJpeg(f"{ncomp}-component JPEG")
            if len(data) < 6 + 3 * ncomp:
                raise ValueError("short SOF segment")
            if fh == 0 or fw == 0:
                raise ValueError("zero image dimension")
            comps = []
            for c in range(ncomp):
                cid, sf, tq = data[6 + 3 * c:9 + 3 * c]
                sh, sv = sf >> 4, sf & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError("bad sampling factors")
                comps.append((cid, sh, sv, tq))
            hm = max(c[1] for c in comps)
            vm = max(c[2] for c in comps)
            if any(hm % sh or vm % sv for _, sh, sv, _ in comps):
                raise UnsupportedJpeg("non-dividing sampling factors")
            if sum(sh * sv for _, sh, sv, _ in comps) > 10:
                # T.81 B.2.2: sum of Hi*Vi over all components <= 10
                raise ValueError("sampling factors exceed T.81 bound")
            frame = (fh, fw, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg("non-baseline SOF")
        elif marker == 0xDD:                # DRI
            if len(data) < 2:
                raise ValueError("short DRI segment")
            restart_interval = struct.unpack(">H", data[:2])[0]
        elif marker == 0xDA:                # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(data) < 1:
                raise ValueError("short SOS segment")
            ns = data[0]
            if len(data) < 1 + 2 * ns + (3 if progressive else 0):
                raise ValueError("short SOS segment")
            scan_comps = []
            for c in range(ns):
                cs, tt = data[1 + 2 * c], data[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 0x0F))
            if not progressive:
                scan = (scan_comps, i + 2 + seg_len)
                break
            ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
            aa = data[3 + 2 * ns]
            entropy_start = i + 2 + seg_len
            if coefs is None:
                coefs = _init_progressive(frame, n, entropy_start)
            i = _decode_progressive_scan(
                payload, entropy_start, coefs, frame, huff, scan_comps,
                ss, se, aa >> 4, aa & 0x0F, restart_interval)
            scans_seen += 1
            continue
        i += 2 + seg_len

    if progressive:
        if scans_seen == 0:
            raise ValueError("progressive JPEG with no scans")
        return _reconstruct_progressive(frame, coefs, quant)
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    fh, fw, comps = frame
    scan_comps, entropy_start = scan
    if len(scan_comps) != len(comps):
        raise UnsupportedJpeg("multi-scan JPEG")
    if not huff:
        # MJPEG convention (and some camera JPEGs): DHT omitted, the
        # Annex K "typical" tables implied.  Only when NO table was
        # declared — a stream with its own tables never gets defaults.
        huff = {
            (0, 0): _decode_lookup(_DC_LUM_BITS, _DC_LUM_VALS),
            (1, 0): _decode_lookup(_AC_LUM_BITS, _AC_LUM_VALS),
            (0, 1): _decode_lookup(_DC_CHR_BITS, _DC_CHR_VALS),
            (1, 1): _decode_lookup(_AC_CHR_BITS, _AC_CHR_VALS),
        }
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    total_mcus = mcus_x * mcus_y
    # Area sanity BEFORE any plane allocation: a crafted header can
    # declare 65535x65535 (or 4x4-sampled planes) with a tiny scan.
    # Bound total 8x8 *blocks* — each costs >=4 entropy bits (2-bit DC
    # code + 2-bit EOB), so a scan byte encodes at most 2 blocks — and
    # thereby the float64 plane allocation (512 bytes per block).
    blocks_per_mcu = sum(sh * sv for _, sh, sv, _ in comps)
    if total_mcus * blocks_per_mcu > 2 * (n - entropy_start) + 64:
        raise ValueError("declared block count exceeds scan data")

    segs, _ = _split_entropy(payload, entropy_start)
    # per-component output planes on the MCU-padded lattice
    planes = []
    for (_cid, sh, sv, _tq) in comps:
        planes.append(np.zeros((mcus_y * sv * 8, mcus_x * sh * 8),
                               dtype=np.float64))
    # resolve tables per scan component order (matches comps order)
    tables = []
    for (cs, td, ta), (cid, sh, sv, tq) in zip(scan_comps, comps):
        if cs != cid:
            raise UnsupportedJpeg("scan/frame component order mismatch")
        if (0, td) not in huff or (1, ta) not in huff or tq not in quant:
            raise ValueError("JPEG references missing table")
        tables.append((huff[(0, td)], huff[(1, ta)], quant[tq]))

    seg_idx = 0
    br = _BitReader(segs[0] if segs else b"")
    preds = [0] * len(comps)
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            br = _BitReader(segs[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, (cid, sh, sv, tq) in enumerate(comps):
            dc_tbl, ac_tbl, q = tables[ci]
            for by in range(sv):
                for bx in range(sh):
                    zz = np.zeros(64, dtype=np.int64)
                    size = _decode_huff(br, dc_tbl)
                    if size > 11:
                        raise ValueError("bad DC category")
                    preds[ci] += _extend(br.read_bits(size), size)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        sym = _decode_huff(br, ac_tbl)
                        if sym == 0x00:          # EOB
                            break
                        run, asize = sym >> 4, sym & 0x0F
                        if asize == 0:
                            if run != 15:
                                raise ValueError("bad AC symbol")
                            k += 16              # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(br.read_bits(asize), asize)
                        k += 1
                    # zz and q[_ZIGZAG] are both zigzag-ordered; gather
                    # through _UNZIGZAG restores natural row-major order
                    coeffs = (zz * q[_ZIGZAG])[_UNZIGZAG].reshape(8, 8)
                    block = _DCT_M.T @ coeffs.astype(np.float64) @ _DCT_M
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = block + 128.0
    return _finish_planes(planes, comps, hmax, vmax, fh, fw)
