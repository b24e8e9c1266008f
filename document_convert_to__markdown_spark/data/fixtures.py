# -*- coding: utf-8 -*-
"""Golden conversion fixtures (FIXTURES.md §2, SURVEY.md §5.2 items 2-3).

Named fixture documents keyed to specific reference behaviors, plus a
slice of the synthetic corpus.  ``golden_records()`` runs the pure-Python
extractors standalone (the executable form of the reference's manual
golden validation, WORK_PROGRESS.md:194-211) and returns
``(url, golden_md, golden_sha256, n_images, format)`` rows.

The committed hash file (tests/golden_fixtures.json) pins these outputs;
pytest asserts the extractors still reproduce them byte-for-byte, and the
Spark golden-comparison join (pipeline/golden.py) asserts the distributed
path produces the same bytes as the standalone path — catching any
Arrow/batching/encoding drift between the two.
"""

from __future__ import annotations

import hashlib
import random

from ..extractors.extract import extract_document
from . import synth


def _fixture_payloads() -> list[tuple[str, bytes]]:
    """(url, payload) for each named parity fixture."""
    fixtures: list[tuple[str, bytes]] = []

    # heading_spacing — single-newline heading triggers the \x01 cleanup
    # quirk (converter.py:291-292) via a text document.
    fixtures.append((
        "https://fixtures.example/en/heading_spacing",
        "intro line\n# Heading One\nbody follows\n## Heading Two\nmore".encode(),
    ))

    # list_mangle — "- " items after newline hit the \x01 list quirk
    # (converter.py:295).
    fixtures.append((
        "https://fixtures.example/en/list_mangle",
        "para\n- item one\n- item two\n* star\n".encode(),
    ))

    # pdf_header_footer — short/digit lines stripped (converter.py:251-260).
    rng = random.Random(101)
    fixtures.append((
        "https://fixtures.example/en/pdf_header_footer",
        synth.make_pdf(rng, "en", 9001, 1.2),
    ))

    # pdf_fig_refs_zh — 图 X-Y reference-pattern insertion
    # (document_processors.py:607-635).
    rng = random.Random(202)
    fixtures.append((
        "https://fixtures.example/zh/pdf_fig_refs_zh",
        synth.make_pdf(rng, "zh", 9002, 1.5),
    ))

    # pdf_image_only — <50 chars text → image-based markdown
    # (document_processors.py:509-512).
    rng = random.Random(303)
    fixtures.append((
        "https://fixtures.example/en/pdf_image_only",
        synth.make_pdf(rng, "en", 9003, 1.0, image_only=True),
    ))

    # docx_media_links — media/imageN rewriting (document_processors.py:382-395).
    rng = random.Random(404)
    fixtures.append((
        "https://fixtures.example/en/docx_media_links",
        synth.make_docx(rng, "en", 9004, 1.0),
    ))

    # cjk_filename — fullwidth chars in the url-derived doc name
    # (utils/filename_normalizer.py:29-56).
    rng = random.Random(505)
    fixtures.append((
        "https://fixtures.example/zh/表（一）：数据，结果",
        synth.make_html(rng, "zh", 9005, 1.0),
    ))

    # image_passthrough — PNG metadata markdown (document_processors.py:994-1011).
    fixtures.append((
        "https://fixtures.example/en/image_passthrough",
        synth.make_png(24, 16, 7),
    ))

    # boilerplate_html — nav/footer/cookie stripping.
    rng = random.Random(606)
    fixtures.append((
        "https://fixtures.example/en/boilerplate_html",
        synth.make_html(rng, "en", 9006, 2.0),
    ))

    # xlsx_sheets — multi-sheet markdown tables (config.py:102-107).
    rng = random.Random(707)
    fixtures.append((
        "https://fixtures.example/en/xlsx_sheets",
        synth.make_xlsx(rng, "en", 9007, 1.0),
    ))

    # pptx_slides — slide-number markers + title headings + media
    # extraction (reference priority format, config.py:26-40).
    rng = random.Random(808)
    fixtures.append((
        "https://fixtures.example/en/pptx_slides",
        synth.make_pptx(rng, "en", 9008, 1.5),
    ))

    # csv_table — quoted fields with embedded commas → pipe table
    # (reference supported format, converter.py:772-787).
    rng = random.Random(909)
    fixtures.append((
        "https://fixtures.example/en/csv_table",
        synth.make_csv(rng, "en", 9009, 1.0),
    ))

    # json_fence — nested object → fenced json block.
    rng = random.Random(1010)
    fixtures.append((
        "https://fixtures.example/en/json_fence",
        synth.make_json(rng, "en", 9010, 1.0),
    ))

    # xml_outline — nested elements → indented outline.
    rng = random.Random(1111)
    fixtures.append((
        "https://fixtures.example/en/xml_outline",
        synth.make_xml(rng, "en", 9011, 1.0),
    ))

    # wav_metadata — RIFF header parse → audio metadata markdown.
    rng = random.Random(1212)
    fixtures.append((
        "https://fixtures.example/en/wav_metadata",
        synth.make_wav(rng, "en", 9012, 1.0),
    ))

    # mp3_metadata — ID3v2 + MPEG frame header parse.
    rng = random.Random(1414)
    fixtures.append((
        "https://fixtures.example/en/mp3_metadata",
        synth.make_mp3(rng, "en", 9014, 1.0),
    ))

    # epub_spine — OCF container, spine-ordered chapters through the
    # HTML pipeline.
    rng = random.Random(1313)
    fixtures.append((
        "https://fixtures.example/en/epub_spine",
        synth.make_epub(rng, "en", 9013, 1.0),
    ))

    # doc_piece_table — legacy Word binary: FIB → CLX piece table text
    # (reference accepts .doc via config.py:40).
    rng = random.Random(1515)
    fixtures.append((
        "https://fixtures.example/en/doc_piece_table",
        synth.make_doc(rng, "en", 9015, 1.0),
    ))

    # doc_unicode_zh — UTF-16 piece text with CJK content.
    rng = random.Random(1616)
    fixtures.append((
        "https://fixtures.example/zh/doc_unicode_zh",
        synth.make_doc(rng, "zh", 9016, 1.0),
    ))

    # xls_biff — legacy Excel binary: SST + LABELSST/NUMBER cells →
    # pipe table (config.py:42).
    rng = random.Random(1717)
    fixtures.append((
        "https://fixtures.example/en/xls_biff",
        synth.make_xls(rng, "en", 9017, 1.0),
    ))

    # ppt_records — legacy PowerPoint binary: slide containers with
    # TextCharsAtom/TextBytesAtom (config.py:41).
    rng = random.Random(1818)
    fixtures.append((
        "https://fixtures.example/en/ppt_records",
        synth.make_ppt(rng, "en", 9018, 1.5),
    ))

    # rtf_strip — control words/destinations stripped, \u escapes
    # decoded (config.py:48).
    rng = random.Random(1919)
    fixtures.append((
        "https://fixtures.example/zh/rtf_strip",
        synth.make_rtf(rng, "zh", 9019, 1.0),
    ))

    # tiff_meta — II-endian baseline TIFF header parse (config.py:45).
    fixtures.append((
        "https://fixtures.example/en/tiff_meta",
        synth.make_tiff(random.Random(2020), 20, 12),
    ))

    # tsv_table — tab-delimited table (config.py:54).
    rng = random.Random(2121)
    fixtures.append((
        "https://fixtures.example/en/tsv_table",
        synth.make_tsv(rng, "en", 9021, 1.0),
    ))

    # Corpus slice: the first 50 synthetic documents.
    for i in range(50):
        row = synth.synth_page(i)
        fixtures.append((row.url, row.html))

    return fixtures


def golden_records() -> list[dict]:
    """Run the standalone extractors over every fixture payload."""
    records = []
    for url, payload in _fixture_payloads():
        doc = extract_document(url, payload)
        md = doc.markdown or ""
        records.append({
            "url": url,
            "golden_md": md,
            "golden_sha256": hashlib.sha256(md.encode("utf-8")).hexdigest(),
            "n_images": doc.n_images,
            "format": doc.format,
        })
    return records


def fixture_pages() -> list[tuple[str, bytes]]:
    """The raw fixture inputs, for feeding the Spark pipeline."""
    return _fixture_payloads()
