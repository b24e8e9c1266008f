# -*- coding: utf-8 -*-
"""CSV / JSON → markdown — the reference's tabular text formats.

Both are in the reference's supported list (converter.py:772-787,
dispatched by extension at document_processors.py:1073-1097; converted
through MarkItDown).  At web scale the sniffer detects them structurally
(sniffer.py) and these pure functions render them:

- CSV → pipe table, first record as header (MarkItDown's CSV
  convention), pipes escaped so table structure survives.
- JSON → title + fenced ``json`` block, re-serialized with a stable
  2-space indent (input key order preserved — re-serialization
  normalizes whitespace only, keeping output deterministic for any
  formatting of the same document).
"""

from __future__ import annotations

import csv
import io
import json


def csv_to_markdown(payload: bytes, doc_name: str,
                    delimiter: str = ",") -> str:
    text = payload.decode("utf-8", errors="replace")
    rows = list(csv.reader(io.StringIO(text), delimiter=delimiter))
    rows = [r for r in rows if any(cell.strip() for cell in r)]
    if not rows:
        return f"# {doc_name}"

    width = max(len(r) for r in rows)

    def cells(row: list) -> list:
        padded = row + [""] * (width - len(row))
        return [c.replace("|", "\\|").strip() for c in padded]

    lines = [f"# {doc_name}", ""]
    lines.append("| " + " | ".join(cells(rows[0])) + " |")
    lines.append("|" + " --- |" * width)
    for row in rows[1:]:
        lines.append("| " + " | ".join(cells(row)) + " |")
    return "\n".join(lines)


def tsv_to_markdown(payload: bytes, doc_name: str) -> str:
    """Tab-separated values — same pipe-table rendering as CSV (the
    reference lists '.tsv' alongside '.csv', config.py:54)."""
    return csv_to_markdown(payload, doc_name, delimiter="\t")


def json_to_markdown(payload: bytes, doc_name: str) -> str:
    obj = json.loads(payload.decode("utf-8"))
    body = json.dumps(obj, indent=2, ensure_ascii=False)
    return f"# {doc_name}\n\n```json\n{body}\n```"


def xml_to_markdown(payload: bytes, doc_name: str) -> str:
    """XML → nested bullet outline (tag: text), depth-indented; falls
    back to a fenced block if the document doesn't parse."""
    from xml.etree import ElementTree

    try:
        root = ElementTree.fromstring(payload.decode("utf-8",
                                                     errors="replace"))
    except ElementTree.ParseError:
        body = payload.decode("utf-8", errors="replace").strip()
        return f"# {doc_name}\n\n```xml\n{body}\n```"

    lines = [f"# {doc_name}", ""]

    def walk(el, depth: int) -> None:
        tag = el.tag.split("}", 1)[-1]  # strip namespace
        text = (el.text or "").strip()
        lines.append("  " * depth + f"- {tag}" + (f": {text}" if text else ""))
        for child in el:
            walk(child, depth + 1)

    walk(root, 0)
    return "\n".join(lines)
