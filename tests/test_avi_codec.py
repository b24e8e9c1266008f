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
    UnsupportedAvi, decode_avi, encode_avi,
)


@pytest.mark.parametrize("shape", [(7, 9, 11, 3), (1, 4, 4, 3),
                                   (3, 2, 5, 3)])
def test_avi_roundtrip_exact(shape):
    frames = (np.arange(np.prod(shape)).reshape(shape) * 31 % 256
              ).astype(np.uint8)
    got, fps = decode_avi(encode_avi(frames, fps=12.5))
    assert got.shape == frames.shape
    assert (got == frames).all()
    assert abs(fps - 12.5) < 0.01


def test_avi_every_truncation_raises_valueerror():
    frames = np.random.RandomState(3).randint(
        0, 256, (4, 3, 5, 3)).astype(np.uint8)
    avi = encode_avi(frames)
    for cut in range(len(avi)):
        try:
            decode_avi(avi[:cut])
        except ValueError:
            pass                                # the contract


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
