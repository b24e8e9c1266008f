# -*- coding: utf-8 -*-
"""Charset sniffing for raw crawl bytes — WHATWG-style, stdlib-only.

Real web crawls are not UTF-8: a material fraction of pages arrive as
windows-1252, UTF-16, or a meta-declared legacy encoding.  The core
extraction path deliberately decodes ``utf-8, errors=replace`` (byte
parity with the reference's pinned goldens — see
``extract.py:139``); this module is the OPT-IN front door a crawl
ingest applies *before* extraction, following the WHATWG encoding
sniffing algorithm's ordering (html.spec.whatwg.org/multipage/
parsing.html#determining-the-character-encoding), reduced to its
deterministic, dependency-free core:

1. **BOM** (authoritative, overrides everything): UTF-8, UTF-16 LE/BE.
2. **Meta prescan** of the first 1024 bytes for ``<meta charset=..>``
   or ``<meta http-equiv="content-type" content="..; charset=..">``.
   Labels normalize per the WHATWG encoding registry's key aliases —
   notably ``iso-8859-1``/``latin1``/``ascii`` → **windows-1252** (the
   spec-mandated superset mapping browsers apply).
3. **Strict UTF-8 trial**: content that decodes cleanly as UTF-8 is
   UTF-8 (a conservative stand-in for the spec's "confidence
   tentative" default, correct for the overwhelming modern majority).
4. **windows-1252 fallback** (the WHATWG default for unlabeled
   non-UTF-8 content), with the five unmapped bytes replaced.

Pure Python, no pyspark imports (package invariant); the Spark-side
wrapper is ``operators/charset.py:detect_and_decode``.
"""
from __future__ import annotations

import re
from typing import Tuple

_BOMS = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]

# <meta charset="..."> or <meta http-equiv=... content="..;
# charset=..">, scanned over the latin-1 view of the first kilobyte.
# The charset= must sit INSIDE a <meta ...> tag — a stray
# "?charset=x" in body text or a link url must not hijack the decode.
_META_RE = re.compile(
    r"""<meta[^>]{0,200}?charset\s*=\s*["']?\s*([A-Za-z0-9._:\-]+)""",
    re.IGNORECASE)
_PRESCAN_BYTES = 1024

# WHATWG label→encoding essentials (the registry's most common rows).
_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "latin1": "cp1252",
    "l1": "cp1252", "ascii": "cp1252", "us-ascii": "cp1252",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "iso-8859-15": "iso8859-15",
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "koi8-r": "koi8-r",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "euc-jp": "euc-jp",
    "gbk": "gbk", "gb2312": "gbk", "x-gbk": "gbk",  # WHATWG: gb2312→GBK
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs",
    "euc-kr": "euc-kr",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}


def _normalize_label(label: str) -> str | None:
    return _ALIASES.get(label.strip().lower())


def sniff_encoding(payload: bytes) -> Tuple[str, str]:
    """(python_codec, how) — how ∈ {bom, meta, utf8, fallback}."""
    for bom, codec in _BOMS:
        if payload.startswith(bom):
            return codec, "bom"
    head = payload[:_PRESCAN_BYTES].decode("latin-1", "replace")
    m = _META_RE.search(head)
    if m:
        codec = _normalize_label(m.group(1))
        if codec is not None:
            # A meta label can't mean a BOM-framed family (WHATWG:
            # utf-16 labels in meta are treated as utf-8).
            if codec.startswith("utf-16"):
                codec = "utf-8"
            return codec, "meta"
    try:
        payload.decode("utf-8", "strict")
        return "utf-8", "utf8"
    except UnicodeDecodeError:
        return "cp1252", "fallback"


def sniff_decode(payload: bytes) -> Tuple[str, str, str]:
    """(text, encoding_label, how).  Never raises: undecodable bytes
    (cp1252's five holes, truncated multi-byte tails) are replaced, so
    one mojibake page cannot kill an executor batch."""
    codec, how = sniff_encoding(payload)
    if how == "bom" and codec.startswith("utf-16"):
        # utf-8-sig strips its own BOM; the utf-16-le/be codecs do NOT
        # (that's the BOM-agnostic 'utf-16' codec's job) — slice it.
        payload = payload[2:]
    return payload.decode(codec, "replace"), codec, how
