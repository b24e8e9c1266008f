"""From-scratch FLAC codec (extractors/flac_codec.py) — pure
functions, no Spark.  The encoder cycles every subframe kind and
channel assignment it emits (CONSTANT/VERBATIM/FIXED-0/1/2 ×
independent/left-side/mid-side), so roundtrips cover those; the
decode-only paths the encoder never writes (LPC prediction, rice
partitions > 0, the 5-bit parameter method, the escape-to-raw code,
wasted bits) are exercised with hand-built frames.
"""

import struct

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.flac_codec import (
    FLAC_SIG, UnsupportedFlac, _BitWriter, _crc8, _crc16, _utf8_number,
    decode_flac, encode_flac, flac_meta,
)
from document_convert_to__markdown_spark.extractors.wav_codec import (
    decode_wav, encode_wav,
)


def _signal(n=16384, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    return np.clip(0.5 * np.sin(2 * np.pi * t / 64)
                   + 0.1 * rng.randn(n), -1, 1)


def test_mono_roundtrip_matches_wav_bit_exactly():
    x = _signal()
    y, rate = decode_flac(encode_flac(x, 16000))
    yw, _ = decode_wav(encode_wav(x, 16000))
    assert rate == 16000
    assert np.array_equal(y, yw)


def test_stereo_roundtrip_all_channel_modes():
    """block_size 4096 over 16384 samples → 4 frames cycling
    independent / left-side / mid-side assignments."""
    x = _signal()
    rng = np.random.RandomState(1)
    st = np.stack([x, np.clip(0.8 * x + 0.05 * rng.randn(x.size), -1, 1)],
                  axis=1)
    y, rate = decode_flac(encode_flac(st, 44100))
    q = np.clip(np.rint(st.astype(np.float32) * 32767.0),
                -32768, 32767).astype(np.int64)
    expect = (np.mean(np.stack([q[:, 0], q[:, 1]]), axis=0)
              / 32768.0).astype(np.float32)
    assert rate == 44100
    assert np.array_equal(y, expect)


def test_constant_blocks_and_short_tail():
    x = np.concatenate([np.full(4096, 0.25), _signal(1000, 2)])
    y, _ = decode_flac(encode_flac(x, 8000))
    yw, _ = decode_wav(encode_wav(x, 8000))
    assert y.size == x.size
    assert np.array_equal(y, yw)


def test_multibyte_utf8_frame_numbers():
    """>127 frames forces the two-byte coded-number path on both
    sides."""
    x = _signal(130 * 64, 3)
    y, _ = decode_flac(encode_flac(x, 16000, block_size=64))
    yw, _ = decode_wav(encode_wav(x, 16000))
    assert np.array_equal(y, yw)
    assert _utf8_number(129) == bytes([0xC2, 0x81])
    assert _utf8_number(0x801) == bytes([0xE0, 0xA0, 0x81])


def _streaminfo(n, rate=16000, channels=1, bits=16, block=4096):
    si = _BitWriter()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    body = bytes(si.out) + b"\x00" * 16
    return bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_header(w, block_size, frame_idx=0, ch_code=0):
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)                                # 16-bit block size at end
    w.write(0, 4)                                # rate from STREAMINFO
    w.write(ch_code, 4)
    w.write(0b100, 3)                            # 16-bit samples
    w.write(0, 1)
    for b in _utf8_number(frame_idx):
        w.write(b, 8)
    w.write(block_size - 1, 16)
    w.write(_crc8(bytes(w.out)), 8)


def _finish_frame(w):
    w.align()
    frame = bytes(w.out)
    return frame + struct.pack(">H", _crc16(frame))


def test_lpc_subframe_with_partitions_and_5bit_method():
    """Hand-built LPC order-2 frame, residual method 1 (5-bit params),
    partition order 1 — none of which the encoder emits."""
    coefs, shift = (3, -1), 1
    x = [100, 103, 98, 90, 75, 112, -60, 40]
    res = []
    for i in range(2, 8):
        pred = (coefs[0] * x[i - 1] + coefs[1] * x[i - 2]) >> shift
        res.append(x[i] - pred)
    w = _BitWriter()
    _frame_header(w, 8)
    w.write(0, 1)                                # subframe pad
    w.write(32 + 1, 6)                           # LPC, order 2
    w.write(0, 1)                                # no wasted bits
    for v in x[:2]:
        w.write(v, 16)                           # warmup
    w.write(4 - 1, 4)                            # precision 4
    w.write(shift, 5)
    for c in coefs:
        w.write(c, 4)
    w.write(1, 2)                                # method 1: 5-bit params
    w.write(1, 4)                                # partition order 1
    for part in ([res[0], res[1]], res[2:]):     # 8/2-2=2, then 4
        k = 5
        w.write(k, 5)
        for v in part:
            u = (abs(v) << 1) - (v < 0)
            for _ in range(u >> k):
                w.write(0, 1)
            w.write(1, 1)
            w.write(u & ((1 << k) - 1), k)
    blob = FLAC_SIG + _streaminfo(8) + _finish_frame(w)
    y, rate = decode_flac(blob)
    assert rate == 16000
    assert np.array_equal(y, (np.array(x) / 32768.0).astype(np.float32))


def test_escape_code_and_wasted_bits():
    # frame 1: verbatim-escaped residuals on a FIXED order-0 subframe
    x = [7, -3, 12, 0]
    w = _BitWriter()
    _frame_header(w, 4)
    w.write(0, 1)
    w.write(8, 6)                                # FIXED order 0
    w.write(0, 1)
    w.write(0, 2)                                # method 0 (4-bit params)
    w.write(0, 4)                                # partition order 0
    w.write(15, 4)                               # escape
    w.write(6, 5)                                # 6 raw bits per residual
    for v in x:
        w.write(v, 6)
    blob = FLAC_SIG + _streaminfo(4, block=4) + _finish_frame(w)
    y, _ = decode_flac(blob)
    assert np.array_equal(y, (np.array(x) / 32768.0).astype(np.float32))

    # frame 2: CONSTANT subframe with 1 wasted bit → value shifts left
    w = _BitWriter()
    _frame_header(w, 4)
    w.write(0, 1)
    w.write(0, 6)                                # CONSTANT
    w.write(1, 1)                                # wasted-bits flag
    w.write(1, 1)                                # unary 0 → wasted = 1
    w.write(21, 15)                              # eff = 16 - 1 bits
    blob = FLAC_SIG + _streaminfo(4, block=4) + _finish_frame(w)
    y, _ = decode_flac(blob)
    assert np.array_equal(y, np.full(4, 42 / 32768.0, dtype=np.float32))


def test_malformed_and_unsupported_refuse():
    x = _signal(4096, 4)
    good = encode_flac(x, 16000)
    with pytest.raises(ValueError):
        decode_flac(b"not flac")
    # corrupt one frame byte → CRC mismatch, not a wrong decode
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # exotic bit depth in STREAMINFO → UnsupportedFlac
    blob = FLAC_SIG + _streaminfo(4, bits=20)
    with pytest.raises(UnsupportedFlac):
        decode_flac(blob)
    # unknown total sample count → UnsupportedFlac
    blob = FLAC_SIG + _streaminfo(0)
    with pytest.raises(UnsupportedFlac):
        decode_flac(blob)
    # truncated mid-frame → ValueError
    with pytest.raises(ValueError):
        decode_flac(good[:len(good) // 2])


def test_flac_meta_probe():
    x = _signal(8192, 5)
    st = np.stack([x, -x], axis=1)
    m = flac_meta(encode_flac(st, 22050))
    assert m.channels == 2 and m.sample_rate == 22050
    assert m.bits_per_sample == 16 and m.total_samples == 8192
    assert flac_meta(b"fLaC") is None
    assert flac_meta(encode_wav(x)) is None


# ------------------------------------------------------------------ AIFF

def test_aiff_roundtrip_matches_wav_and_meta():
    from document_convert_to__markdown_spark.extractors.wav_codec import (
        aiff_meta, decode_aiff, encode_aiff,
    )
    x = _signal(16384, 7)
    y, rate = decode_aiff(encode_aiff(x, 44100))
    yw, _ = decode_wav(encode_wav(x, 44100))
    assert rate == 44100
    assert np.array_equal(y, yw)
    assert aiff_meta(encode_aiff(x, 22050)) == (1, 22050, 16, 16384)
    assert aiff_meta(encode_wav(x)) is None


def test_aiff_extended80_rates_and_refusals():
    from document_convert_to__markdown_spark.extractors.wav_codec import (
        UnsupportedAiff, _extended80, _read_extended80, decode_aiff,
        encode_aiff,
    )
    for rate in (8000, 11025, 22050, 44100, 48000, 96000):
        assert _read_extended80(_extended80(float(rate))) == float(rate)
    x = _signal(256, 8)
    blob = bytearray(encode_aiff(x, 16000))
    blob[8:12] = b"AIFC"                         # compressed form type
    with pytest.raises(UnsupportedAiff):
        decode_aiff(bytes(blob))
    with pytest.raises(ValueError):
        decode_aiff(b"FORM\x00\x00\x00\x04JUNK")
    with pytest.raises(ValueError):
        decode_aiff(b"not aiff")


def test_aiff_spectral_hash_and_metadata_spark(spark):
    import numpy as np
    from document_convert_to__markdown_spark.extractors.wav_codec import (
        encode_aiff, encode_wav,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        audio_spectral_hash, media_metadata,
    )

    x = np.clip(np.sin(np.arange(16384) / 11.0)
                + 0.2 * np.random.RandomState(40).randn(16384), -1, 1)
    df = spark.createDataFrame(
        [("a.wav", bytearray(encode_wav(x, 16000))),
         ("a.aiff", bytearray(encode_aiff(x, 16000)))],
        "url string, data binary")
    got = {r.url: r for r in audio_spectral_hash(df).collect()}
    assert got["a.aiff"].mode == "aiff"
    assert got["a.aiff"].ahash == got["a.wav"].ahash
    meta = {r.url: r for r in media_metadata(df).collect()}
    assert meta["a.aiff"].media_format == "aiff"
    assert meta["a.aiff"].mode == "pcm16"
    assert meta["a.aiff"].sample_rate == 16000
    assert meta["a.aiff"].n_frames == 16384


def test_flac_every_truncation_raises_valueerror():
    """audio_spectral_hash's fallback catches ValueError ONLY; a FLAC
    truncated at ANY byte offset must raise ValueError (never
    struct.error/IndexError) or decode cleanly."""
    x = _signal(2048, 9)
    good = encode_flac(x, 16000, block_size=512)
    for cut in range(len(good)):
        try:
            decode_flac(good[:cut])
        except ValueError:
            pass


def test_aiff_every_truncation_raises_valueerror():
    from document_convert_to__markdown_spark.extractors.wav_codec import (
        decode_aiff, encode_aiff,
    )
    x = _signal(1024, 10)
    good = encode_aiff(x, 16000)
    for cut in range(len(good)):
        try:
            decode_aiff(good[:cut])
        except ValueError:
            pass


def test_fixed_orders_3_and_4_reconstruct():
    """The encoder only emits FIXED 0-2; orders 3/4 are hand-built so
    the cumulative-sum reconstruction is pinned against the direct
    predictor recurrence."""
    rng = np.random.RandomState(11)
    x = rng.randint(-2000, 2000, 16).tolist()
    for order, coefs in ((3, (3, -3, 1)), (4, (4, -6, 4, -1))):
        res = []
        for i in range(order, 16):
            pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
            res.append(x[i] - pred)
        w = _BitWriter()
        _frame_header(w, 16)
        w.write(0, 1)
        w.write(8 + order, 6)
        w.write(0, 1)
        for v in x[:order]:
            w.write(v, 16)
        w.write(0, 2)                            # method 0
        w.write(0, 4)                            # partition order 0
        w.write(15, 4)                           # escape
        w.write(18, 5)                           # 18 raw bits each
        for v in res:
            w.write(v, 18)
        blob = FLAC_SIG + _streaminfo(16, block=16) + _finish_frame(w)
        y, _ = decode_flac(blob)
        assert np.array_equal(
            y, (np.array(x) / 32768.0).astype(np.float32)), order


def test_tail_block_of_order_size_roundtrips():
    """Regression: a final partial block with exactly `order` samples
    used to make encode_flac emit a FIXED subframe the decoder's
    partition check rejected (n = 3*4096 + 2, kind cycle lands on
    fixed2 for the 2-sample tail)."""
    x = _signal(3 * 4096 + 2, 12)
    y, _ = decode_flac(encode_flac(x, 16000))
    yw, _ = decode_wav(encode_wav(x, 16000))
    assert np.array_equal(y, yw)


def test_decoded_size_cap_refuses_bombs():
    """A crafted STREAMINFO declaring 36-bit total_samples must die as
    UnsupportedFlac BEFORE any frame decodes (CONSTANT subframes
    amplify ~2400x, so without the cap a 1MB payload demands GBs)."""
    blob = FLAC_SIG + _streaminfo((1 << 25) + 1, block=65535)
    with pytest.raises(UnsupportedFlac, match="cap"):
        decode_flac(blob)


def test_aiff_hostile_exponent_is_valueerror_not_overflow():
    """Regression: an 80-bit-float exponent of 0x7FFE (finite, passes
    the inf/nan check) used to raise OverflowError from 2.0**e, which
    escapes the ValueError-only handling in the Arrow kernels."""
    from document_convert_to__markdown_spark.extractors.wav_codec import (
        _read_extended80, aiff_meta, decode_aiff, encode_aiff,
    )
    hostile = struct.pack(">HQ", 0x7FFE, 1 << 63)
    with pytest.raises(ValueError):
        _read_extended80(hostile)
    blob = bytearray(encode_aiff(_signal(64, 13), 16000))
    comm = bytes(blob).find(b"COMM")
    blob[comm + 16:comm + 26] = hostile        # COMM rate field
    with pytest.raises(ValueError):
        decode_aiff(bytes(blob))
    assert aiff_meta(bytes(blob)) is None      # meta probe stays None
