"""Audio provenance tags (extractors/audio_tags.py, round 5i).

Covers: ID3v2.4 (syncsafe sizes, UTF-8) and ID3v2.3 (plain sizes,
latin-1) leads, the ID3v1 trailer fallback, FLAC VORBIS_COMMENT
insertion after STREAMINFO (audio decode must stay bit-identical),
RIFF LIST-INFO appends (RIFF size patched, PCM untouched), v2-beats-v1
precedence, UTF-16 text frames, garbage safety, and the media_tags
Spark operator.
"""

import numpy as np

from document_convert_to__markdown_spark.extractors.audio_tags import (
    EMPTY_TAGS, append_id3v1, audio_tags, build_id3v2,
    flac_add_vorbis_comment, parse_id3v2, wav_add_info,
)
from document_convert_to__markdown_spark.extractors.flac_codec import (
    decode_flac, encode_flac, flac_meta,
)
from document_convert_to__markdown_spark.extractors.wav_codec import (
    decode_wav, encode_wav,
)


def _pcm(n=1600, seed=3):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.2).astype(np.float32)


def test_id3v2_both_versions_and_v1_fallback():
    body = b"\xff\xfb" + bytes(120)             # MPEG frame stand-in
    v4 = build_id3v2(title="Söng", artist="Ärtist", album="Al",
                     date="2021") + body
    assert audio_tags(v4) == ("Söng", "Ärtist", "Al", "2021", "id3v2")
    v3 = build_id3v2(title="T3", artist="A3", version=3) + body
    got = audio_tags(v3)
    assert got.title == "T3" and got.tag_how == "id3v2"
    v1 = append_id3v1(body, title="Old", artist="One", year="1999")
    assert audio_tags(v1) == ("Old", "One", None, "1999", "id3v1")
    # v2 wins when both are present
    both = append_id3v1(v4, title="Loser", year="1900")
    assert audio_tags(both).title == "Söng"


def test_id3v2_utf16_text_frame():
    """Hand-build a UTF-16-with-BOM TIT2 frame (encoding byte 1)."""
    text = "Naïve ✓".encode("utf-16")           # BOM-led
    frame_body = b"\x01" + text
    sz = bytes(((len(frame_body) >> s) & 0x7F) for s in (21, 14, 7, 0))
    frames = b"TIT2" + sz + b"\x00\x00" + frame_body
    size = bytes(((len(frames) >> s) & 0x7F) for s in (21, 14, 7, 0))
    blob = b"ID3\x04\x00\x00" + size + frames
    assert parse_id3v2(blob).title == "Naïve ✓"


def test_flac_vorbis_comment_roundtrip():
    flac = encode_flac((_pcm() * 32767).astype(np.int16), rate=16000)
    tagged = flac_add_vorbis_comment(flac, title="FT", artist="FA",
                                     album="FB", date="2020-01-01")
    assert audio_tags(tagged) == ("FT", "FA", "FB", "2020-01-01",
                                  "vorbis")
    s1, r1 = decode_flac(flac)
    s2, r2 = decode_flac(tagged)
    assert r1 == r2 and np.array_equal(s1, s2)
    assert flac_meta(tagged) == flac_meta(flac)
    assert audio_tags(flac) == EMPTY_TAGS       # untagged → none


def test_wav_info_roundtrip():
    wav = encode_wav(_pcm(), rate=16000)
    tagged = wav_add_info(wav, title="WT", artist="WA", album="WB",
                          date="2019")
    assert audio_tags(tagged) == ("WT", "WA", "WB", "2019",
                                  "riff_info")
    a1, _ = decode_wav(wav)
    a2, _ = decode_wav(tagged)
    assert np.array_equal(a1, a2)
    assert audio_tags(wav) == EMPTY_TAGS


def test_garbage_safety():
    for junk in [b"", b"ID3", b"ID3\x04\x00\x80" + bytes(20),
                 b"ID3\x02\x00\x00" + bytes(20),     # v2.2: out of scope
                 b"RIFF" + bytes(20), b"fLaC" + bytes(3), bytes(200),
                 b"TAG" + bytes(10)]:
        assert audio_tags(junk) == EMPTY_TAGS


def test_media_tags_operator(spark):
    from document_convert_to__markdown_spark.operators.multimodal import (
        media_tags,
    )

    wav = encode_wav(_pcm(), rate=16000)
    flac = encode_flac((_pcm() * 32767).astype(np.int16), rate=16000)
    rows = [
        ("mp3", bytearray(build_id3v2(title="M", artist="A")
                          + b"\xff\xfb" + bytes(64))),
        ("flac", bytearray(flac_add_vorbis_comment(flac, title="F"))),
        ("wav", bytearray(wav_add_info(wav, artist="W"))),
        ("bare", bytearray(wav)),
        ("junk", bytearray(b"nope")),
    ]
    df = spark.createDataFrame(rows, "url string, data binary")
    got = {r["url"]: r for r in media_tags(df).collect()}
    assert got["mp3"]["title"] == "M" and got["mp3"]["tag_how"] == "id3v2"
    assert got["flac"]["title"] == "F" and got["flac"]["tag_how"] == "vorbis"
    assert got["wav"]["artist"] == "W" and got["wav"]["tag_how"] == "riff_info"
    assert got["bare"]["tag_how"] == "none"
    assert got["junk"]["tag_how"] == "none"
    assert got["junk"]["title"] is None


def test_every_prefix_truncation_never_raises():
    """The never-raise contract, byte-by-byte: every prefix of every
    tagged rendition parses to SOME AudioTags (mostly empty), no
    exception — the same evidence class the codec fuzz tests pin."""
    wav = encode_wav(_pcm(400), rate=8000)
    flac = encode_flac((_pcm(400) * 32767).astype(np.int16), rate=8000)
    blobs = [
        build_id3v2(title="T", artist="A", date="2021")
        + b"\xff\xfb" + bytes(32),
        build_id3v2(title="T", version=3) + b"\xff\xfb" + bytes(32),
        append_id3v1(b"\xff\xfb" + bytes(32), title="T", year="1999"),
        flac_add_vorbis_comment(flac, title="T", artist="A"),
        wav_add_info(wav, title="T", artist="A"),
    ]
    for blob in blobs:
        for cut in range(len(blob) + 1):
            got = audio_tags(blob[:cut])
            assert isinstance(got.tag_how, str)


def test_id3v22_three_byte_frames():
    """The iTunes-era v2.2 layout: 3-byte frame ids, 3-byte sizes,
    no frame flags."""
    blob = build_id3v2(title="Old Song", artist="Band", album="LP",
                       date="1997", version=2) + b"\xff\xfb" + bytes(64)
    assert audio_tags(blob) == ("Old Song", "Band", "LP", "1997",
                                "id3v2")
    for cut in range(len(blob) + 1):
        audio_tags(blob[:cut])


def test_cover_art_all_grammars():
    """APIC (v2.3/2.4), PIC (v2.2) and the FLAC PICTURE block must
    return the exact embedded picture bytes; audio/tags untouched
    (round 5j)."""
    from document_convert_to__markdown_spark.extractors.audio_tags import (
        audio_cover_art, flac_add_picture,
    )
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )

    art = encode_png(np.random.RandomState(4).randint(
        0, 256, (8, 8, 3)).astype(np.uint8))
    for v in (2, 3, 4):
        blob = build_id3v2(title="T", artist="A", version=v,
                           picture=art) + b"\xff\xfb" + bytes(32)
        assert audio_cover_art(blob) == art, v
        t = audio_tags(blob)
        assert (t.title, t.artist) == ("T", "A"), v

    flac = encode_flac((_pcm() * 32767).astype(np.int16), rate=8000)
    f2 = flac_add_vorbis_comment(flac_add_picture(flac, art,
                                                  width=8, height=8),
                                 title="FT")
    assert audio_cover_art(f2) == art
    assert audio_tags(f2).title == "FT"
    assert np.array_equal(decode_flac(f2)[0], decode_flac(flac)[0])

    # UTF-16 description: APIC terminator is the 2-byte NUL unit
    import struct
    body = (b"\x01" + b"image/png\x00" + b"\x03"
            + "desc".encode("utf-16") + b"\x00\x00" + art)
    hdr = b"APIC" + bytes(((len(body) >> s) & 0x7F)
                          for s in (21, 14, 7, 0)) + b"\x00\x00"
    frames = hdr + body
    blob = b"ID3" + bytes((4, 0, 0)) + bytes(
        ((len(frames) >> s) & 0x7F) for s in (21, 14, 7, 0)) + frames
    assert audio_cover_art(blob) == art

    # art-free and non-audio payloads
    assert audio_cover_art(build_id3v2(title="x") + b"\xff\xfb") is None
    assert audio_cover_art(flac) is None
    assert audio_cover_art(b"") is None
    # truncation fuzz
    full = build_id3v2(picture=art) + b"\xff\xfb"
    for cut in range(len(full) + 1):
        audio_cover_art(full[:cut])


def test_media_cover_art_feeds_image_pipeline(spark):
    """The cross-container art-dedup composition: cover art extracted
    from mp3 AND flac renditions of the same recording must produce
    the SAME image_dhash as the standalone art file — the blocking
    key no audio fingerprint gives you (round 5j)."""
    from document_convert_to__markdown_spark.extractors.audio_tags import (
        flac_add_picture,
    )
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    from document_convert_to__markdown_spark.operators.multimodal import (
        image_dhash, media_cover_art,
    )

    art = encode_png(np.random.RandomState(11).randint(
        0, 256, (16, 16, 3)).astype(np.uint8))
    flac = encode_flac((_pcm() * 32767).astype(np.int16), rate=8000)
    rows = [("u_mp3", bytearray(build_id3v2(picture=art)
                                + b"\xff\xfb" + bytes(32))),
            ("u_flac", bytearray(flac_add_picture(flac, art))),
            ("u_bare", bytearray(b"\xff\xfb" + bytes(32))),
            ("u_art", bytearray(art))]
    df = spark.createDataFrame(rows, "url string, data binary")
    arts = media_cover_art(df.filter("url != 'u_art'"))
    got = {r["url"]: r for r in arts.collect()}
    assert len(got) == 3                     # no silent drops
    assert got["u_mp3"]["art_format"] == "png"
    assert got["u_flac"]["art_bytes"] == len(art)
    assert got["u_bare"]["art"] is None

    hashed = image_dhash(arts.filter("art is not null"),
                         blob_col="art")
    want = image_dhash(df.filter("url = 'u_art'")).collect()[0]
    vals = {r["url"]: (r["dhash"], r["mode"]) for r in hashed.collect()}
    assert vals["u_mp3"] == (want["dhash"], want["mode"])
    assert vals["u_flac"] == (want["dhash"], want["mode"])


def test_apic_utf16_odd_offset_terminator():
    """Round-5j review regression: a UTF-16 description whose content
    contains an odd-offset 00 00 byte pair (codepoint low byte next
    to an ASCII char's high byte, e.g. 'aĀ') must not desync the
    terminator scan — the returned art keeps its magic bytes."""
    from document_convert_to__markdown_spark.extractors.audio_tags import (
        audio_cover_art,
    )
    from document_convert_to__markdown_spark.extractors.png_codec import (
        encode_png,
    )
    art = encode_png(np.zeros((4, 4, 3), np.uint8))
    desc = "aĀ".encode("utf-16")        # FF FE 61 00 00 01
    body = b"\x01" + b"image/png\x00" + b"\x03" + desc + b"\x00\x00" \
        + art
    hdr = b"APIC" + bytes(((len(body) >> s) & 0x7F)
                          for s in (21, 14, 7, 0)) + b"\x00\x00"
    frames = hdr + body
    blob = b"ID3" + bytes((4, 0, 0)) + bytes(
        ((len(frames) >> s) & 0x7F) for s in (21, 14, 7, 0)) + frames
    got = audio_cover_art(blob)
    assert got == art, (got[:8] if got else None)
