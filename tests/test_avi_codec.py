"""From-scratch AVI demux/mux (extractors/avi_codec.py) — pure
functions plus the video_frame_sample real path.  Covers: mux/demux
roundtrips (odd widths exercise 4-byte row padding, bottom-up order,
BGR swap), fps recovery, every-byte-offset truncation raising
ValueError (the kernels' stub fallback catches ValueError only),
compressed-codec refusal, and the Spark one-to-many demux emitting
pixel-exact frames alongside stub rows.
"""

import numpy as np
import pytest

from document_convert_to__markdown_spark.extractors.avi_codec import (
    UnsupportedAvi, avi_meta, decode_avi, encode_avi,
)


@pytest.mark.parametrize("shape", [(7, 9, 11, 3), (1, 4, 4, 3),
                                   (3, 2, 5, 3)])
def test_avi_roundtrip_exact(shape):
    frames = (np.arange(np.prod(shape)).reshape(shape) * 31 % 256
              ).astype(np.uint8)
    got, fps, _codec = decode_avi(encode_avi(frames, fps=12.5))
    assert got.shape == frames.shape
    assert (got == frames).all()
    assert abs(fps - 12.5) < 0.01


def test_avi_every_truncation_raises_valueerror():
    """The Spark kernels' stub fallback catches ValueError ONLY: every
    truncation must either raise ValueError or decode to a prefix of
    the true frames — never succeed with garbage or escape with a
    non-ValueError."""
    frames = np.random.RandomState(3).randint(
        0, 256, (4, 3, 5, 3)).astype(np.uint8)
    avi = encode_avi(frames)
    full, _, _codec = decode_avi(avi)
    outcomes = {"raise": 0, "ok": 0}
    for cut in range(len(avi)):
        try:
            got, _, _codec = decode_avi(avi[:cut])
        except ValueError:
            outcomes["raise"] += 1
        else:
            # chunk boundaries can make a prefix a VALID shorter AVI;
            # whatever decodes must be pixel-true, never garbage
            outcomes["ok"] += 1
            assert (got == full[:len(got)]).all()
    assert outcomes["raise"] > len(avi) // 2    # most cuts do raise


import struct


def test_avi_hostile_payloads_raise_valueerror_not_crash():
    """Adversarial shapes that previously escaped as RecursionError /
    MemoryError must raise ValueError (review findings, round 5)."""
    # nested-LIST bomb: thousands of LISTs inside LISTs
    depth = 20000
    inner = b"JUNK" + struct.pack("<I", 0)
    for _ in range(depth):
        inner = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"xxxx" + inner
    bomb = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"AVI " + inner
    with pytest.raises(ValueError):
        decode_avi(bomb)

    # tiny payload declaring 40000x40000 (4.8GB) output: must die on
    # the frame-size check, never reach the allocation
    avi = bytearray(encode_avi(np.zeros((1, 2, 2, 3), np.uint8)))
    off = avi.index(b"strf") + 8 + 4            # biWidth field
    avi[off:off + 4] = (40000).to_bytes(4, "little")
    avi[off + 4:off + 8] = (40000).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_avi(bytes(avi))


def test_avi_top_down_dib_not_flipped():
    """biHeight < 0 means rows are stored top-down (display order);
    the decoder must not flip them."""
    frames = np.random.RandomState(6).randint(
        0, 256, (2, 3, 4, 3)).astype(np.uint8)
    avi = bytearray(encode_avi(frames))
    off = avi.index(b"strf") + 8 + 8            # biHeight field
    h = 3
    avi[off:off + 4] = (-h).to_bytes(4, "little", signed=True)
    # rewrite each frame's rows into top-down order (encoder wrote
    # bottom-up): reverse the row blocks in place
    stride = (4 * 3 + 3) & ~3
    pos = 0
    for _ in range(2):
        i = bytes(avi).index(b"00db", pos)
        body = i + 8
        rows = [bytes(avi[body + r * stride: body + (r + 1) * stride])
                for r in range(h)]
        for r, row in enumerate(reversed(rows)):
            avi[body + r * stride: body + (r + 1) * stride] = row
        pos = body
    got, _, _codec = decode_avi(bytes(avi))
    assert (got == frames).all()


def test_avi_audio_stream_first_ignored():
    """A 40-byte audio strf preceding the video strl must not be
    mistaken for the video format, and the audio stream's frame
    chunks must not merge into the video frames."""
    frames = np.random.RandomState(7).randint(
        0, 256, (2, 3, 4, 3)).astype(np.uint8)
    donor = encode_avi(frames)
    i = donor.index(b"LIST", 12)                # hdrl list
    hdrl_body = i + 8
    hdrl_size = struct.unpack("<I", donor[i + 4:i + 8])[0]
    # an audio strl: strh fccType 'auds' + a 40-byte fake strf
    auds = (b"strh" + struct.pack("<I", 8) + b"auds" + b"\x00" * 4
            + b"strf" + struct.pack("<I", 40) + b"\xee" * 40)
    strl_audio = b"LIST" + struct.pack("<I", 4 + len(auds)) + b"strl" + auds
    new_hdrl_inner = (donor[hdrl_body:hdrl_body + 4]        # 'hdrl'
                      + strl_audio
                      + donor[hdrl_body + 4:hdrl_body + hdrl_size])
    rebuilt = (donor[:i] + b"LIST"
               + struct.pack("<I", len(new_hdrl_inner)) + new_hdrl_inner
               + donor[i + 8 + hdrl_size:])
    body = b"AVI " + rebuilt[12:]
    # NOTE: audio is stream 00 now, video is stream 01 — but the
    # donor's frame chunks still say '00db'; retag them to '01db'
    body = body.replace(b"00db", b"01db")
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    got, _, _codec = decode_avi(avi)
    assert (got == frames).all()


def test_avi_compressed_codec_refused():
    avi = bytearray(encode_avi(np.zeros((1, 2, 2, 3), np.uint8)))
    off = avi.index(b"strf") + 8 + 16           # biCompression field
    avi[off:off + 4] = (1).to_bytes(4, "little")
    with pytest.raises(UnsupportedAvi):
        decode_avi(bytes(avi))
    with pytest.raises(ValueError):
        decode_avi(b"RIFFxxxxAVI ")             # no streams
    with pytest.raises(ValueError):
        encode_avi(np.zeros((2, 2, 4), np.uint8))  # not (n,h,w,3)


def test_video_frame_sample_real_dib_frames(spark):
    from document_convert_to__markdown_spark.operators.multimodal import (
        video_frame_sample,
    )

    frames = np.random.RandomState(8).randint(
        0, 256, (10, 4, 6, 3)).astype(np.uint8)
    rows = [("v", bytearray(encode_avi(frames))),
            ("s", bytearray(b"\x00" * 600))]     # stub branch
    df = spark.createDataFrame(rows, "url string, data binary")
    got = video_frame_sample(df, every_n=4).collect()
    real = sorted((r["frame_idx"], bytes(r["frame_data"]))
                  for r in got if r["url"] == "v")
    assert [i for i, _ in real] == [0, 4, 8]
    assert all(r["mode"] == "dib" for r in got if r["url"] == "v")
    for idx, data in real:
        assert data == frames[idx].tobytes()     # pixel-exact demux
    stub = [r for r in got if r["url"] == "s"]
    assert stub and all(r["mode"] == "stub" for r in stub)


def test_avi_meta_header_only():
    frames = np.zeros((5, 3, 4, 3), np.uint8)
    avi = encode_avi(frames, fps=25.0)
    from document_convert_to__markdown_spark.extractors.avi_codec import (
        avi_meta,
    )

    w, h, fps, n, comp = avi_meta(avi)
    assert (w, h, n, comp) == (4, 3, 5, 0)
    assert abs(fps - 25.0) < 0.01
    # works on a compressed AVI the decoder refuses
    hacked = bytearray(avi)
    off = hacked.index(b"strf") + 8 + 16
    hacked[off:off + 4] = (875967048).to_bytes(4, "little")  # 'H264'
    w2, _h2, _f2, _n2, comp2 = avi_meta(bytes(hacked))
    assert w2 == 4 and comp2 == 875967048
    with pytest.raises(ValueError):
        avi_meta(b"RIFFxxxxAVI ")


def test_media_metadata_wav_and_avi(spark):
    from document_convert_to__markdown_spark.extractors.wav_codec import (
        encode_wav,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_metadata,
    )

    wav = encode_wav(np.zeros(1600, np.float32), rate=8000)
    avi = encode_avi(np.zeros((4, 2, 3, 3), np.uint8), fps=12.0)
    rows = [("w", bytearray(wav)), ("v", bytearray(avi)),
            ("x", bytearray(b"garbage"))]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r["url"]: r for r in media_metadata(df).collect()}
    assert got["w"]["media_format"] == "wav"
    assert got["w"]["sample_rate"] == 8000
    assert got["w"]["n_frames"] == 1600
    assert got["w"]["mode"] == "pcm16"
    assert got["v"]["media_format"] == "avi"
    assert (got["v"]["width"], got["v"]["height"]) == (3, 2)
    assert got["v"]["sample_rate"] == 12 and got["v"]["n_frames"] == 4
    assert got["v"]["mode"] == "RGB24"
    assert got["x"]["width"] is None and got["x"]["sample_rate"] is None


def _smooth_frames(n: int, h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        np.stack([(yy * 8 + i * 10) % 200 + 20, (xx * 6) % 200,
                  ((yy + xx) * 4 + i * 5) % 200], axis=2)
        for i in range(n)]).astype(np.uint8)


def test_avi_mjpeg_roundtrip_error_bounded():
    frames = _smooth_frames(5, 16, 24)
    for strip in (False, True):        # DHT-less = implied Annex K tables
        avi = encode_avi(frames, fps=8, codec="mjpg", quality=92,
                         strip_dht=strip)
        dec, fps, _codec = decode_avi(avi)
        assert dec.shape == frames.shape and fps == 8.0
        assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 6
    # meta sees the fourcc without touching frame data
    _w, _h, _fps, _n, comp = avi_meta(avi)
    assert comp == struct.unpack("<I", b"MJPG")[0]


def test_avi_mjpeg_frame_size_mismatch_raises():
    frames = _smooth_frames(2, 8, 8)
    avi = bytearray(encode_avi(frames, codec="mjpg"))
    off = avi.index(b"strf") + 8 + 4            # biWidth field
    avi[off:off + 4] = (16).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_avi(bytes(avi))


def test_avi_mjpeg_truncation_raises_valueerror():
    avi = encode_avi(_smooth_frames(3, 8, 8), codec="mjpg")
    for cut in range(12, len(avi) - 1, 31):
        with pytest.raises(ValueError):
            decode_avi(avi[:cut])


def test_video_frame_sample_mjpg_provenance(spark):
    from document_convert_to__markdown_spark.operators.multimodal import (
        video_frame_sample,
    )

    frames = _smooth_frames(6, 8, 12)
    rows = [("m", bytearray(encode_avi(frames, codec="mjpg", quality=95))),
            ("d", bytearray(encode_avi(frames)))]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = video_frame_sample(df, every_n=3).collect()
    by_url = {}
    for r in got:
        by_url.setdefault(r["url"], []).append(r)
    assert sorted(r["frame_idx"] for r in by_url["m"]) == [0, 3]
    assert all(r["mode"] == "mjpg" for r in by_url["m"])
    assert all(r["mode"] == "dib" for r in by_url["d"])
    # mjpg frames are real pixels: close to the exact dib demux
    dib = {r["frame_idx"]: np.frombuffer(bytes(r["frame_data"]), np.uint8)
           for r in by_url["d"]}
    for r in by_url["m"]:
        mj = np.frombuffer(bytes(r["frame_data"]), np.uint8)
        assert np.abs(mj.astype(int)
                      - dib[r["frame_idx"]].astype(int)).max() <= 6


def test_media_metadata_mjpg_mode(spark):
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_metadata,
    )

    avi = encode_avi(_smooth_frames(2, 4, 6), fps=10, codec="mjpg")
    df = spark.createDataFrame([("m", bytearray(avi))],
                               "url string, data binary")
    row = media_metadata(df).collect()[0]
    assert row["mode"] == "MJPG" and (row["width"], row["height"]) == (6, 4)
