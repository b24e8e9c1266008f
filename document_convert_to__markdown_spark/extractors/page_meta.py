"""Structured page metadata — OpenGraph / JSON-LD / canonical /
publication time / license from raw HTML.

Web-scale curation pipelines enrich every page with the structured
metadata publishers already embed (the FineWeb/CC-style temporal
filters, licensing audits, and url canonicalization all key on it):

- **OpenGraph** ``<meta property="og:*" content=...>`` (ogp.me) —
  title/type/image/site_name, with ``<title>`` and
  ``<meta name=description>`` as the plain-HTML fallbacks;
- **JSON-LD** ``<script type="application/ld+json">`` blocks
  (schema.org) — ``@type`` inventory, ``datePublished``,
  ``license``, ``headline``;
- **canonical** ``<link rel=canonical>`` — the publisher's own
  dedup key, stronger than any url-normalization heuristic;
- **publication time** — ``article:published_time`` (OpenGraph
  article extension) > JSON-LD ``datePublished`` >
  ``<meta name=date>``, verbatim strings (no date parsing: temporal
  filters want the raw claim plus provenance, not a lossy parse);
- **license** — ``<link rel=license>`` > JSON-LD ``license`` (string
  or ``{"@id": ...}`` forms).

Meta/link/title come from a dedicated lenient ``HTMLParser`` scan
(the extraction DOM in ``html_extractor`` deliberately treats the
whole ``<head>`` as a skip region — correct for text extraction,
useless for metadata — and drops script BODIES, so JSON-LD blocks
are pulled with a raw-text regex, the standard production approach).
Never raises: malformed HTML parses best-effort, bad JSON-LD blocks
are skipped, absent fields are None.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser
from typing import NamedTuple, Optional

_LDJSON_RE = re.compile(
    r"<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>"
    r"(.*?)</script\s*>",
    re.IGNORECASE | re.DOTALL)

_OG_KEYS = {"og:title": "og_title", "og:type": "og_type",
            "og:image": "og_image", "og:site_name": "site_name",
            "og:description": "og_description"}


class PageMeta(NamedTuple):
    title: Optional[str]
    description: Optional[str]
    canonical_url: Optional[str]
    og_type: Optional[str]
    og_image: Optional[str]
    site_name: Optional[str]
    published_time: Optional[str]
    license: Optional[str]
    jsonld_types: list            # sorted distinct @type strings


EMPTY_PAGE_META = PageMeta(None, None, None, None, None, None,
                           None, None, [])


class _MetaScan(HTMLParser):
    """Collects meta/link attribute dicts and the <title> text —
    nothing else, so arbitrarily broken markup can't derail it."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.metas: list[dict] = []
        self.links: list[dict] = []
        self.title_parts: list[str] = []
        self._in_title = False
        self._title_done = False      # only the first document title —
        self._svg_depth = 0           # inline-SVG <title> is a tooltip

    def handle_starttag(self, tag, attrs):
        if tag == "meta":
            self.metas.append(dict(attrs))
        elif tag == "link":
            self.links.append(dict(attrs))
        elif tag == "svg":
            self._svg_depth += 1
        elif (tag == "title" and not self._title_done
                and self._svg_depth == 0):
            self._in_title = True

    def handle_startendtag(self, tag, attrs):
        # self-closing: meta/link still collected; <svg/> and
        # <title/> enclose nothing, so no state change
        if tag == "meta":
            self.metas.append(dict(attrs))
        elif tag == "link":
            self.links.append(dict(attrs))

    def handle_endtag(self, tag):
        if tag == "title":
            if self._in_title:
                self._title_done = True
            self._in_title = False
        elif tag == "svg" and self._svg_depth > 0:
            self._svg_depth -= 1

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)


def _jsonld_blocks(html_text: str) -> list:
    out = []
    for m in _LDJSON_RE.finditer(html_text):
        raw = m.group(1).strip()
        if not raw or len(raw) > 1 << 20:
            continue
        try:
            data = json.loads(raw)
        except ValueError:
            continue
        items = data if isinstance(data, list) else [data]
        for item in items:
            if isinstance(item, dict):
                out.append(item)
                graph = item.get("@graph")
                if isinstance(graph, list):
                    out.extend(g for g in graph if isinstance(g, dict))
    return out


def _jsonld_str(item: dict, key: str) -> Optional[str]:
    v = item.get(key)
    if isinstance(v, str) and v.strip():
        return v.strip()
    if isinstance(v, dict):
        vid = v.get("@id")
        if isinstance(vid, str) and vid.strip():
            return vid.strip()
    return None


def extract_page_meta(html_text: str) -> PageMeta:
    """Raw HTML → ``PageMeta``.  Never raises."""
    if not html_text or "<" not in html_text:
        return EMPTY_PAGE_META
    scan = _MetaScan()
    try:
        scan.feed(html_text)
        scan.close()
    except Exception:                            # stdlib parser edge
        pass                                     # keep what was seen

    og: dict[str, str] = {}
    description = canonical = license_url = None
    meta_date = og_published = None
    title = "".join(scan.title_parts).strip() or None
    for attrs in scan.metas:
        prop = (attrs.get("property")
                or attrs.get("name") or "").strip().lower()
        content = (attrs.get("content") or "").strip()
        if not content:
            continue
        key = _OG_KEYS.get(prop)
        if key and key not in og:
            og[key] = content
        elif prop == "article:published_time" and og_published is None:
            og_published = content
        elif prop == "description" and description is None:
            description = content
        elif prop == "date" and meta_date is None:
            meta_date = content
    for attrs in scan.links:
        # rel is a space-separated token list (HTML spec §4.6.6.10)
        rel = set((attrs.get("rel") or "").lower().split())
        href = (attrs.get("href") or "").strip()
        if not href:
            continue
        if "canonical" in rel and canonical is None:
            canonical = href
        elif "license" in rel and license_url is None:
            license_url = href

    items = _jsonld_blocks(html_text)
    types = sorted({t for item in items
                    for t in ([item["@type"]]
                              if isinstance(item.get("@type"), str)
                              else item.get("@type", [])
                              if isinstance(item.get("@type"), list)
                              else [])
                    if isinstance(t, str)})
    ld_published = ld_license = ld_headline = None
    for item in items:
        ld_published = ld_published or _jsonld_str(item,
                                                   "datePublished")
        ld_license = ld_license or _jsonld_str(item, "license")
        ld_headline = ld_headline or _jsonld_str(item, "headline")

    return PageMeta(
        title=og.get("og_title") or title or ld_headline,
        description=og.get("og_description") or description,
        canonical_url=canonical,
        og_type=og.get("og_type"),
        og_image=og.get("og_image"),
        site_name=og.get("site_name"),
        published_time=og_published or ld_published or meta_date,
        license=license_url or ld_license,
        jsonld_types=types,
    )
