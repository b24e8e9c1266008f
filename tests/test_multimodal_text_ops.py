"""Multimodal plumbing shapes + winnowing fingerprint properties."""

import pytest

from document_convert_to__markdown_spark.operators.text import winnow_text


# --- winnowing: pure-function properties (no Spark) -----------------------

def test_winnow_deterministic_and_nonempty():
    t = "the quick brown fox jumps over the lazy dog " * 5
    a, b = winnow_text(t), winnow_text(t)
    assert a == b and len(a) > 3


def test_winnow_short_text_edge_cases():
    assert winnow_text("") == []
    assert winnow_text("abc") == []          # shorter than k
    assert len(winnow_text("abcdefgh")) == 1  # exactly one k-gram


def test_winnow_local_edit_preserves_most_fingerprints():
    base = ("common crawl pages arrive continuously and need "
            "near duplicate detection at petabyte scale " * 4)
    edited = base.replace("petabyte", "exabyte", 1)
    fa, fb = set(winnow_text(base)), set(winnow_text(edited))
    overlap = len(fa & fb) / max(len(fa), 1)
    # a single local edit only perturbs windows covering it
    assert overlap > 0.6, overlap


def test_winnow_reference_implementation_parity():
    """Cross-check the vectorized hasher against a naive rolling hash."""
    t = "abcdefghijklmnopqrstuvwxyz0123456789"
    k, w, B, M = 8, 16, 257, (1 << 61) - 1
    data = t.encode()
    naive = []
    for i in range(len(data) - k + 1):
        h = 0
        for c in data[i:i + k]:
            h = (h * B + c) % M
        naive.append(h)
    mins = [min(naive[i:i + w]) for i in range(len(naive) - w + 1)]
    expect = [mins[0]] + [m for j, m in enumerate(mins[1:], 1)
                          if m != mins[j - 1]]
    assert winnow_text(t, k=k, w=w) == expect


# --- multimodal plumbing (Spark) ------------------------------------------

@pytest.fixture(scope="module")
def media_pages(spark):
    from document_convert_to__markdown_spark.pipeline.corpus import synth_pages_df

    return synth_pages_df(spark, 60, giant_every=0).cache()


def test_media_resize_shape(spark, media_pages):
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_resize,
    )

    out = media_resize(media_pages, width=8, height=8,
                       url_col="url", blob_col="html")
    rows = out.collect()
    assert len(rows) == 60                      # one row per input row
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    # html blobs take the stub branch: 1 channel -> 64 bytes
    assert all(r["mode"] == "stub" and len(r["data"]) == 64
               for r in rows)


def test_media_resize_real_png_pixels(spark):
    """Round 5: PNGs resize REAL decoded pixels (png_codec), checked
    against exact known values — not just shapes."""
    import numpy as np

    from document_convert_to__markdown_spark.data.synth import make_png
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_resize,
    )

    # 8x8 grayscale resized to 8x8 == identity: pixel (y,x) is
    # (shade + x + y) % 256 by make_png's construction.
    gray = make_png(8, 8, 100)
    # 4x4 RGB gradient resized to 2x2 nearest-neighbor picks the
    # corner pixels (linspace(0, 3, 2) -> rows/cols 0 and 3).
    rgb_px = (np.arange(4 * 4 * 3).reshape(4, 4, 3) * 5 % 256
              ).astype(np.uint8)
    rgb = encode_png(rgb_px)
    df = spark.createDataFrame(
        [("g", bytearray(gray)), ("c", bytearray(rgb))],
        "url string, html binary")
    got = {r["url"]: r for r in
           media_resize(df, width=8, height=8, url_col="url",
                        blob_col="html").collect()
           if r["url"] == "g"}
    want_gray = bytes((100 + x + y) % 256
                      for y in range(8) for x in range(8))
    assert got["g"]["mode"] == "L"
    assert bytes(got["g"]["data"]) == want_gray

    got2 = {r["url"]: r for r in
            media_resize(df, width=2, height=2, url_col="url",
                         blob_col="html").collect()}
    assert got2["c"]["mode"] == "RGB"
    corners = rgb_px[np.ix_([0, 3], [0, 3])]
    assert bytes(got2["c"]["data"]) == corners.tobytes()
    # grayscale at 2x2: corners of the 8x8 grid
    want_g2 = bytes((100 + x + y) % 256 for y in (0, 7) for x in (0, 7))
    assert bytes(got2["g"]["data"]) == want_g2


def _ref_dhash(px2d):
    """Pure-numpy reference dHash over a gray 2D array."""
    import numpy as np

    ys = np.linspace(0, px2d.shape[0] - 1, 8).astype(int)
    xs = np.linspace(0, px2d.shape[1] - 1, 9).astype(int)
    g = px2d.astype(np.float32)[np.ix_(ys, xs)]
    bits = (g[:, 1:] > g[:, :-1]).reshape(-1)
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


def test_image_dhash_matches_reference_and_brightness_invariant(spark):
    import numpy as np

    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        image_dhash,
    )

    base = np.array([[(x * x * 3 + y * y * 5 + x * y) % 240
                      for x in range(9)] for y in range(8)], np.uint8)
    rows = [("base", bytearray(encode_png(base))),
            ("bright", bytearray(encode_png(base + 10)))]
    got = {r["url"]: (r["dhash"], r["mode"])
           for r in image_dhash(spark.createDataFrame(
               rows, "url string, data binary")).collect()}
    want = _ref_dhash(base)
    if want >= 1 << 63:
        want -= 1 << 64
    assert got["base"] == (want, "L")
    assert got["bright"][0] == got["base"][0]   # brightness-invariant


def test_image_neardup_banded_equals_bruteforce(spark):
    """The banded candidate join + bit_count verify must find EXACTLY
    the pairs a brute-force all-pairs Hamming scan finds (pigeonhole
    recall guarantee for max_hamming <= n_bands - 1)."""
    import itertools

    import numpy as np

    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        image_dhash, image_neardup_pairs,
    )

    imgs = {}
    for s in range(12):
        base = np.array(
            [[(s * 37 + x * x * (s % 5 + 2) + y * y * (s % 7 + 3)) % 240
              for x in range(9)] for y in range(8)], np.uint8)
        imgs[f"s{s}a"] = base
        edit = base.copy()
        edit[3, 4] = (int(edit[3, 4]) + 120) % 240
        imgs[f"s{s}c"] = edit
    rows = [(k, bytearray(encode_png(v))) for k, v in imgs.items()]
    df = spark.createDataFrame(rows, "url string, data binary")
    hashes = image_dhash(df)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in image_neardup_pairs(hashes, max_hamming=3,
                                        n_bands=4).collect()}

    ref = {k: _ref_dhash(v) for k, v in imgs.items()}
    want = {}
    for a, b in itertools.combinations(sorted(ref), 2):
        d = bin(ref[a] ^ ref[b]).count("1")
        if d <= 3:
            want[(a, b)] = d
    assert got == want and len(want) >= 12  # every one-pixel edit pair


def test_image_neardup_threshold_guard(spark):
    from document_convert_to__markdown_spark.operators.multimodal import (
        image_neardup_pairs,
    )

    df = spark.createDataFrame([("a", 0)], "url string, dhash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        image_neardup_pairs(df, max_hamming=4, n_bands=4)


def test_media_features_real_png(spark):
    import numpy as np

    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_features,
    )

    px = (np.arange(6 * 5 * 3).reshape(6, 5, 3) * 7 % 256).astype(np.uint8)
    df = spark.createDataFrame([("p", bytearray(encode_png(px)))],
                               "url string, html binary")
    row = media_features(df, url_col="url", blob_col="html",
                         dim=5).collect()[0]
    want = px.astype(np.float32).mean(axis=(0, 2))
    assert np.allclose(row["feature"], want, atol=1e-4)


def test_video_frame_sample_one_to_many(spark, media_pages):
    from pyspark.sql import functions as F

    from document_convert_to__markdown_spark.operators.multimodal import (
        video_frame_sample,
    )

    frames = video_frame_sample(media_pages, every_n=4, url_col="url",
                                blob_col="html")
    per_url = frames.groupBy("url").agg(F.count("*").alias("n")).collect()
    assert len(per_url) == 60
    # big payloads yield multiple sampled frames; indexes stride by 4
    idx = frames.select("frame_idx").distinct().collect()
    assert all(r["frame_idx"] % 4 == 0 for r in idx)
    assert frames.count() >= 60


def test_top_terms_relational_equals_grouped_map(spark):
    """The JVM-side production top-terms must agree exactly with the
    grouped-map exerciser (same oracle in the driver contract)."""
    from document_convert_to__markdown_spark.operators.text import (
        top_terms_per_lang,
        top_terms_per_lang_relational,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, top_terms_per_lang(docs, k=5).collect()))
    b = sorted(map(tuple,
                   top_terms_per_lang_relational(docs, k=5).collect()))
    assert a == b and len(a) > 0


def test_ngram_lm_scores_rank_off_distribution_text_worse(spark):
    """An out-of-distribution document must receive a higher (worse)
    mean negative log-prob than in-distribution ones, and land in the
    tail quality bucket; single-token docs get NULL, never a made-up
    score."""
    from document_convert_to__markdown_spark.operators.text import (
        lm_quality_buckets,
        ngram_lm_score,
    )

    common = "the cat sat on the mat and the dog sat on the rug"
    rows = [
        (1, common, "en"),
        (2, "the cat sat on the rug and the dog sat on the mat", "en"),
        (3, "the dog sat on the mat and the cat sat on the rug", "en"),
        (4, "zx qv wq jj kx vz bb qq zz xx nn pp", "en"),  # gibberish
        (5, "solo", "en"),                                 # no bigrams
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    rows_out = {r["doc_id"]: r for r in ngram_lm_score(docs).collect()}
    scores = {k: r["lm_score"] for k, r in rows_out.items()}
    # zero-bigram doc keeps its row: NULL score, 0 bigrams — dropped
    # rows would violate the no-silent-drop contract (review r3)
    assert scores[5] is None
    assert rows_out[5]["n_bigrams"] == 0
    in_dist = max(scores[i] for i in (1, 2, 3))
    assert scores[4] > in_dist

    buckets = {r["doc_id"]: r["quality_bucket"]
               for r in lm_quality_buckets(docs, n_buckets=2).collect()}
    assert buckets[4] == 2          # gibberish in the tail bucket
    assert 5 not in buckets         # NULL-score rows are not bucketed


def test_lm_buckets_scalable_tracks_exact_ntile(spark):
    """The partition-parallel quantile-cutoff form must track the exact
    ntile split: near-equal bucket counts and monotone score ranges
    (ties at a boundary may shift a few docs — the documented trade)."""
    from pyspark.sql import functions as F

    from document_convert_to__markdown_spark.operators.text import (
        lm_quality_buckets,
        lm_quality_buckets_scalable,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = lm_quality_buckets(docs, n_buckets=3)
    approx = lm_quality_buckets_scalable(docs, n_buckets=3)

    ec = {(r["lang"], r["quality_bucket"]): r["count"]
          for r in exact.groupBy("lang", "quality_bucket").count().collect()}
    ac = {(r["lang"], r["quality_bucket"]): r["count"]
          for r in approx.groupBy("lang", "quality_bucket").count().collect()}
    assert set(k[1] for k in ac) == {1, 2, 3}
    for key, n_exact in ec.items():
        assert abs(ac.get(key, 0) - n_exact) <= max(3, n_exact * 0.15), \
            (key, n_exact, ac.get(key))

    # monotone: bucket b's max score <= bucket b+1's min score
    rng = {(r["lang"], r["quality_bucket"]): (r["lo"], r["hi"]) for r in
           approx.groupBy("lang", "quality_bucket")
           .agg(F.min("lm_score").alias("lo"), F.max("lm_score").alias("hi"))
           .collect()}
    for (lang, b), (_lo, hi) in rng.items():
        nxt = rng.get((lang, b + 1))
        if nxt:
            assert hi <= nxt[0], (lang, b, hi, nxt)


def test_media_resize_real_gif_pixels(spark):
    """GIF payloads resize REAL decoded pixels (gif_codec), byte-equal
    to the same pixels pushed through the PNG path."""
    import numpy as np

    from document_convert_to__markdown_spark.extractors.gif_codec import (
        encode_gif,
    )
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_resize,
    )

    pal = np.random.RandomState(31).randint(0, 256, (6, 3)).astype(np.uint8)
    idx = np.random.RandomState(32).randint(0, 6, (11, 13)).astype(np.uint8)
    rows = [("g", bytearray(encode_gif(idx, pal))),
            ("p", bytearray(encode_png(pal[idx])))]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r["url"]: r for r in media_resize(df, width=5, height=4).collect()}
    assert got["g"]["mode"] == "RGB" == got["p"]["mode"]
    assert bytes(got["g"]["data"]) == bytes(got["p"]["data"])
    # and against a direct numpy nearest-neighbor reference
    ys = np.linspace(0, 10, 4).astype(int)
    xs = np.linspace(0, 12, 5).astype(int)
    assert bytes(got["g"]["data"]) == pal[idx][np.ix_(ys, xs)].tobytes()


def test_wav_codec_roundtrip_and_refusals():
    import numpy as np
    import pytest

    from document_convert_to__markdown_spark.extractors.wav_codec import (
        UnsupportedWav, decode_wav, encode_wav,
    )

    t = np.arange(4096) / 16000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1200 * t)).astype(np.float32)
    y, rate = decode_wav(encode_wav(x, 16000))
    assert rate == 16000 and y.shape == x.shape
    assert np.abs(y - x).max() < 2 / 32768          # one quantization step

    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")                 # no fmt/data
    with pytest.raises(ValueError):
        decode_wav(b"not audio")
    # IEEE-float WAV (format tag 3) refused, not silently mis-decoded
    import struct
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    bad = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", 4) + b"\0\0\0\0")
    with pytest.raises(UnsupportedWav):
        decode_wav(bad)


def test_wav_stereo_downmix_and_8bit():
    import struct

    import numpy as np

    from document_convert_to__markdown_spark.extractors.wav_codec import (
        decode_wav,
    )

    # hand-built stereo 16-bit: L=[1000, -2000], R=[3000, 4000]
    pcm = np.array([1000, 3000, -2000, 4000], dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    y, rate = decode_wav(wav)
    assert rate == 8000
    np.testing.assert_allclose(y, [2000 / 32768, 1000 / 32768], atol=1e-6)

    # 8-bit unsigned mono: 128 is silence, 255 ~ +1, 0 ~ -1
    data8 = bytes([128, 255, 0])
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav8 = (b"RIFF" + struct.pack("<I", 36 + 3) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt8
            + b"data" + struct.pack("<I", 3) + data8)
    y8, _ = decode_wav(wav8)
    np.testing.assert_allclose(y8, [0.0, 127 / 128, -1.0], atol=1e-6)


def test_audio_spectral_hash_volume_invariant_and_modes(spark):
    import numpy as np

    from document_convert_to__markdown_spark.extractors.wav_codec import (
        encode_wav,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        _BAND_EDGES, audio_spectral_hash,
    )

    centers = (_BAND_EDGES[:-1] + _BAND_EDGES[1:]) // 2
    rng = np.random.RandomState(77)
    amps = 0.97 ** rng.permutation(65).astype(np.float64)
    coef = np.zeros(8193, dtype=complex)
    coef[centers] = amps * np.exp(1j * rng.uniform(0, 2 * np.pi, 65))
    x = np.fft.irfft(coef, 16384)
    x = 0.9 * x / np.abs(x).max()

    rows = [("full", bytearray(encode_wav(x, 16000))),
            ("quiet", bytearray(encode_wav(0.3 * x, 16000))),
            ("notaudio", bytearray(b"GIF89a irrelevant payload"))]
    got = {r["url"]: r for r in audio_spectral_hash(
        spark.createDataFrame(rows, "url string, data binary")).collect()}
    assert got["full"]["mode"] == "pcm" == got["quiet"]["mode"]
    assert got["notaudio"]["mode"] == "stub"
    assert got["full"]["ahash"] == got["quiet"]["ahash"]   # volume-invariant

    # cross-check the hash against a direct numpy replay
    spec = np.abs(np.fft.rfft(x)) ** 2
    energies = np.add.reduceat(spec, _BAND_EDGES)[:-1]
    bits = energies[1:] > energies[:-1]
    want = int.from_bytes(np.packbits(bits).tobytes(), "big")
    if want >= 1 << 63:
        want -= 1 << 64
    assert got["full"]["ahash"] == want


def test_spectral_band_edges_are_strictly_increasing():
    import numpy as np

    from document_convert_to__markdown_spark.operators.multimodal import (
        _BAND_EDGES,
    )

    assert len(_BAND_EDGES) == 66
    assert (_BAND_EDGES[1:] > _BAND_EDGES[:-1]).all()
    assert _BAND_EDGES[0] == 8 and _BAND_EDGES[-1] <= 8192
    assert isinstance(_BAND_EDGES, np.ndarray)


def test_video_frame_sample_apng_composited(spark):
    """APNG payloads route through decode_apng_frames: mode='apng',
    one row per sampled frame, buffers byte-identical to the codec's
    composited RGBA canvases; a static PNG keeps the stub path."""
    import numpy as np
    from document_convert_to__markdown_spark.extractors.png_codec import (
        decode_apng_frames, encode_apng, encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        video_frame_sample,
    )

    rng = np.random.RandomState(21)
    base = rng.randint(0, 256, (6, 8, 4)).astype(np.uint8)
    base[:, :, 3] = 255
    anim = [(base, 0, 0, 0, 0)]
    for f in range(5):
        patch = rng.randint(0, 256, (2, 3, 4)).astype(np.uint8)
        anim.append((patch, f % 6, f % 5, f % 3, f % 2))
    blob = encode_apng(anim)
    static = encode_png(base)
    df = spark.createDataFrame(
        [("u-anim", bytearray(blob)), ("u-static", bytearray(static))],
        "url string, data binary")
    got = video_frame_sample(df, every_n=2).collect()
    by_url = {}
    for r in got:
        by_url.setdefault(r.url, []).append(r)
    anim_rows = sorted(by_url["u-anim"], key=lambda r: r.frame_idx)
    assert [r.mode for r in anim_rows] == ["apng"] * 3
    assert [r.frame_idx for r in anim_rows] == [0, 2, 4]
    expected = decode_apng_frames(blob)
    for r in anim_rows:
        assert bytes(r.frame_data) == expected[r.frame_idx].tobytes()
    assert {r.mode for r in by_url["u-static"]} == {"stub"}


def test_media_metadata_apng_frame_count(spark):
    import numpy as np
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_apng, encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_metadata,
    )

    rng = np.random.RandomState(22)
    base = rng.randint(0, 256, (5, 7, 4)).astype(np.uint8)
    blob = encode_apng([(base, 0, 0, 0, 0),
                        (base[:2, :2], 1, 1, 0, 0)])
    df = spark.createDataFrame(
        [("anim.png", bytearray(blob)),
         ("still.png", bytearray(encode_png(base)))],
        "url string, data binary")
    rows = {r.url: r for r in media_metadata(df).collect()}
    assert rows["anim.png"].media_format == "png"
    assert rows["anim.png"].n_frames == 2
    assert rows["anim.png"].width == 7 and rows["anim.png"].height == 5
    assert rows["still.png"].n_frames is None


def test_audio_spectral_hash_flac_equals_wav(spark):
    """The same samples in FLAC and WAV containers must carry the SAME
    64-bit spectral fingerprint (mode records the container)."""
    import numpy as np
    from document_convert_to__markdown_spark.extractors.flac_codec import (
        encode_flac,
    )
    from document_convert_to__markdown_spark.extractors.wav_codec import (
        encode_wav,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        audio_spectral_hash,
    )

    rows = []
    for s in range(6):
        rng = np.random.RandomState(30 + s)
        t = np.arange(16384)
        x = np.clip(np.sin(2 * np.pi * t / (40 + s))
                    + 0.2 * rng.randn(16384), -1, 1)
        rows.append((f"c{s}/wav", bytearray(encode_wav(x, 16000))))
        rows.append((f"c{s}/flac", bytearray(encode_flac(x, 16000))))
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r.url: r for r in audio_spectral_hash(df).collect()}
    for s in range(6):
        w, f = got[f"c{s}/wav"], got[f"c{s}/flac"]
        assert w.mode == "pcm" and f.mode == "flac"
        assert w.ahash == f.ahash, s


def test_media_metadata_flac_row(spark):
    import numpy as np
    from document_convert_to__markdown_spark.extractors.flac_codec import (
        encode_flac,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_metadata,
    )

    x = np.clip(np.sin(np.arange(4096) / 7.0), -1, 1)
    st = np.stack([x, -x], axis=1)
    df = spark.createDataFrame(
        [("a.flac", bytearray(encode_flac(st, 22050)))],
        "url string, data binary")
    r = media_metadata(df).collect()[0]
    assert r.media_format == "flac" and r.mode == "flac16"
    assert r.sample_rate == 22050 and r.n_frames == 4096


def test_media_features_real_audio_spectral(spark):
    """WAV/FLAC/AIFF payloads featurize from REAL decoded samples: the
    first `dim` log-band energies, identical across containers of the
    same audio, and matching a hand-computed reference."""
    import numpy as np
    from document_convert_to__markdown_spark.extractors.flac_codec import (
        encode_flac,
    )
    from document_convert_to__markdown_spark.extractors.wav_codec import (
        encode_aiff, encode_wav,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        _AHASH_N_FFT, _BAND_EDGES, media_features,
    )

    x = np.clip(np.sin(np.arange(16384) / 17.0)
                + 0.1 * np.random.RandomState(50).randn(16384), -1, 1)
    df = spark.createDataFrame(
        [("a.wav", bytearray(encode_wav(x, 16000))),
         ("a.flac", bytearray(encode_flac(x, 16000))),
         ("a.aiff", bytearray(encode_aiff(x, 16000)))],
        "url string, data binary")
    got = {r.url: np.array(r.feature, dtype=np.float32)
           for r in media_features(df, dim=16).collect()}
    assert np.array_equal(got["a.wav"], got["a.flac"])
    assert np.array_equal(got["a.wav"], got["a.aiff"])
    # hand-computed reference over the quantized samples
    q = np.clip(np.rint(np.asarray(x, np.float32) * 32767.0),
                -32768, 32767).astype(np.float32) / 32768.0
    spec = np.abs(np.fft.rfft(q[:_AHASH_N_FFT])) ** 2
    want = np.resize(
        np.log1p(np.add.reduceat(spec, _BAND_EDGES)[:-1]), 16) \
        .astype(np.float32)
    assert np.array_equal(got["a.wav"], want)
    # a truncated container falls back to the image/stub path
    bad = spark.createDataFrame(
        [("x.wav", bytearray(b"RIFF\x10\x00\x00\x00WAVE"))],
        "url string, data binary")
    assert len(media_features(bad, dim=16).collect()) == 1
