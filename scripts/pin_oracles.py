"""Pin deterministic rows-only queries as committed golden aggregates.

Several driver-contract queries have no relational DuckDB oracle because
their logic isn't SQL-expressible (MinHash sketches, LSH probing,
streaming drains, the extraction UDF itself) — but every one of them is
a *deterministic* function of the seeded synthesizer and the committed
testdata, so their outputs can be pinned as literal-VALUES oracles
(VERDICT.md round 1 "do this" #9: "pinned against a committed golden
aggregate").  The driver then hash-checks them like any other query
instead of recording a weaker rows-only verdict.

Usage: python scripts/pin_oracles.py [sf_dir]
Writes pinned_oracles.json at the repo root (committed).  Re-run
whenever the synthesizer, extractors, or sketch parameters change.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

# Queries whose full output is small (≤ ~30 rows) and deterministic.
PINNABLE = [
    "golden_fixture_compare",
    "stream_extract_parity",
    "warc_ingest",
    "sketch_distinct",
    "extract_pipeline_stats",
    "extract_synth_corpus",
    "multimodal_media_meta",
    "multimodal_resize",
    "multimodal_frame_sample",
    "bpe_tokenize",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "neardup_pipeline",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # 500-row per-document outputs: bulky as literals but fully
    # deterministic (regex cleanup chain / seeded winnowing) and not
    # SQL-expressible — pinning is the only oracle they can have.
    "extract_cleanup_chain",
    "text_winnow_fps",
    # round-3b: trained-classifier histogram (training loop) and
    # SemDeDup cell audit (seeded quantizer cells) aren't SQL.
    "quality_classifier",
    "semdedup_prune",
    "pq_ann_topk",
    "dedup_incremental",
    "sketch_union_hll",
    # round-4: the percentile_approx twin — at sf0.01 the sketch holds
    # every sample exactly (n per lang << accuracy), so the bucket
    # assignment is deterministic and pinnable.
    "lm_quality_scalable",
    # round-4: the streaming dedup-ingest loop — MinHash isn't SQL;
    # two sequential availableNow drains fix the batch boundary, so
    # the corpus/index audit is deterministic.
    "stream_dedup_ingest",
    # round-5: perceptual-hash image near-dup — pixel decode (real
    # PNG) isn't SQL; the fixture and dHash are fully deterministic.
    "image_dhash_neardup",
    # round-5: GIF-vs-PNG pixel parity through the two from-scratch
    # codecs, and the FFT spectral audio fingerprint — neither is SQL.
    "multimodal_gif_decode",
    "audio_spectral_hash",
    # round-5: JPEG-decode determinism across 444/420/RST/gray paths —
    # the DCT pipeline isn't SQL; fidelity is bounded in pytest.
    "multimodal_jpeg_decode",
    # round-5: progressive-vs-baseline JPEG pixel parity through the
    # shared quantizer — Annex G entropy decode isn't SQL.
    "multimodal_jpeg_progressive",
    # round-5: Adam7/16-bit/sub-byte PNG variants vs plain-8-bit
    # parity — the pass lattice / bit unpack isn't SQL.
    "multimodal_png_depths",
    # round-5: compressed-TIFF (LZW/deflate/PackBits/predictor) and
    # RLE-BMP variants vs plain parity — entropy decode isn't SQL.
    "multimodal_codec_variants",
    # round-5: MJPEG AVI demux (incl. DHT-less) vs the DIB reference —
    # per-frame entropy decode isn't SQL.
    "video_mjpeg_demux",
    # round-5: ICO (favicon) container walk vs PNG pixel parity —
    # binary decode isn't SQL.
    "multimodal_ico_decode",
    "multimodal_webp_decode",
    # round-5: APNG (acTL/fcTL/fdAT) compositing across the six
    # dispose×blend variants — Porter-Duff OVER isn't SQL.
    "multimodal_apng_decode",
    # round-5: FLAC-vs-WAV fingerprint parity through the from-scratch
    # RFC 9639 decoder — rice/LPC entropy decode isn't SQL.
    "audio_flac_decode",
    # round-5: animated-WebP (VP8X/ANIM/ANMF) compositing across the
    # four blend×dispose variants — VP8L decode + OVER isn't SQL.
    "multimodal_webp_anim",
    # round-5h: lossy-WebP (VP8 key frame) decode across stream
    # layouts — the boolean-decoder DCT pipeline isn't SQL.
    "multimodal_vp8_decode",
    # round-5i: tiled/planar/palette/sub-byte/16-bit TIFF layouts vs
    # PNG pixel parity — the layout assembly isn't SQL.
    "multimodal_tiff_layouts",
    # round-5i: EXIF APP1/IFD parse + orientation-normalized dHash —
    # binary header parse isn't SQL.
    "image_exif_orientation",
    # round-5i: ID3/Vorbis/RIFF-INFO audio provenance tags — binary
    # tag grammar isn't SQL.
    "audio_tags_scan",
    # round-5i: SRT/WebVTT cue explosion — the timed-text grammar
    # isn't SQL.
    "caption_cues_scan",
    # round-5i: OpenGraph/JSON-LD/canonical page metadata — the
    # DOM/JSON parse isn't SQL.
    "page_metadata_scan",
    # round-5j: ISO-BMFF/EBML/Ogg container grammars aren't SQL; the
    # builders and authored values are fully deterministic.
    "video_container_meta",
    "heif_image_meta",
    # round-5j: the RDF/XML XMP packet grammar isn't SQL.
    "xmp_rights_scan",
    # round-5j: ID3/FLAC picture frames + pixel dHash aren't SQL.
    "audio_cover_art_dedup",
]

_SQL_TYPES = {
    "LongType()": "BIGINT",
    "IntegerType()": "INTEGER",
    "DoubleType()": "DOUBLE",
    "FloatType()": "DOUBLE",
    "StringType()": "VARCHAR",
    "BooleanType()": "BOOLEAN",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from document_convert_to__markdown_spark.pipeline.session import (
        build_session,
    )

    spark = build_session("pin_oracles", master="local[8]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    out = {}
    for name in PINNABLE:
        df = qs[name](spark, sf_dir)
        cols = [(f.name, _SQL_TYPES[repr(f.dataType)])
                for f in df.schema.fields]
        # collect() order is shuffle-nondeterministic; the comparator is
        # order-insensitive, so sort rows to make re-pinning reproducible
        # (no spurious diffs in committed golden data).
        rows = sorted(([r[c] for c, _t in cols] for r in df.collect()),
                      key=lambda row: [repr(v) for v in row])
        out[name] = {"cols": cols, "rows": rows}
        print(f"pinned {name}: {len(rows)} rows, cols={[c for c, _ in cols]}")

    with open("pinned_oracles.json", "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    spark.stop()
    print(f"\nwrote pinned_oracles.json ({len(out)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
