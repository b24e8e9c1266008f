"""Per-format extraction-count regression (VERDICT r2 next-round #8).

Replays the ``extract_synth_corpus`` contract query driver-side — pure
Python, no Spark session — and compares the per-(format, status) doc and
image counts against the committed pinned oracle
(``pinned_oracles.json``).  Any extractor / sniffer / synthesizer change
that shifts a single format's count goes red here in seconds, long
before a Spark round-trip or the driver's correctness gate would see it.

Regenerate the pin (deliberate changes only) with
``python scripts/pin_oracles.py``.
"""

import json
import os
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = 600
GIANT_EVERY = 100  # mirror _q_extract_synth_corpus exactly


def test_synth_corpus_format_counts_match_pin():
    from document_convert_to__markdown_spark.data.synth import synth_page
    from document_convert_to__markdown_spark.extractors import (
        extract_document,
    )

    got = defaultdict(lambda: [0, 0])  # (format, status) -> [n, n_images]
    for i in range(N_DOCS):
        row = synth_page(i, 42, GIANT_EVERY)
        doc = extract_document(row.url, row.html)
        agg = got[(doc.format, doc.status)]
        agg[0] += 1
        agg[1] += doc.n_images

    with open(os.path.join(REPO, "pinned_oracles.json")) as f:
        pin = json.load(f)["extract_synth_corpus"]
    assert [c for c, _t in pin["cols"]] == [
        "format", "status", "n", "n_images_total"]
    want = {(fmt, status): [n, n_img]
            for fmt, status, n, n_img in pin["rows"]}

    assert dict(got) == want, (
        "per-format counts drifted from pinned_oracles.json — if the "
        "change is deliberate, regenerate with scripts/pin_oracles.py")


def test_synth_corpus_covers_every_format_family():
    """The 600-doc slice must keep exercising every sniffable family the
    engine claims (README/SURVEY: 23 formats) — shrinkage here would
    silently weaken the extract_synth_corpus oracle."""
    with open(os.path.join(REPO, "pinned_oracles.json")) as f:
        pin = json.load(f)["extract_synth_corpus"]
    formats = {row[0] for row in pin["rows"]}
    # xml/text are in the synth mix but too rare to land in 600 docs —
    # their extractors are pinned by tests/golden_fixtures.json instead.
    for fmt in ("html", "pdf", "docx", "xlsx", "pptx", "epub", "csv",
                "tsv", "json", "rtf", "doc", "xls", "ppt", "mp3", "wav",
                "gif", "jpeg", "tiff"):
        assert fmt in formats, f"format family {fmt} fell out of the pin"
