"""SRT / WebVTT caption parsing — timed-text ingestion for the
speech/video training-data path.

Web crawls carry subtitle files everywhere video lives: SubRip
(`.srt` — the de-facto numbered-block format) and WebVTT (W3C
"WebVTT: The Web Video Text Tracks Format" — the HTML5 `<track>`
format, `WEBVTT` magic, NOTE/STYLE/REGION blocks, optional cue ids,
cue settings after the timestamp line, inline markup tags).  A
training pipeline wants them as (start_ms, end_ms, text) rows —
transcript alignment, caption-audio pairing, per-cue dedup — and as
a plain transcript for the text path.

Grammar subset (documented, never-raise):

- SRT blocks: optional numeric counter line, a timestamp line
  ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` (``.`` accepted for ``,``, the
  common lenient variant), then text lines until a blank line.
- WebVTT: optional BOM, ``WEBVTT`` magic line (trailing header text
  allowed), header lines until the first blank line; then cue blocks
  (optional id line, ``[HH:]MM:SS.mmm --> [HH:]MM:SS.mmm`` with cue
  settings after the second timestamp discarded) interleaved with
  ``NOTE`` / ``STYLE`` / ``REGION`` blocks, which are skipped.
- Cue text: inline tags (``<v Speaker>``, ``<i>``, ``<c.class>``,
  timestamps ``<00:00:01.000>``) are stripped; the five core
  character entities are unescaped.  Malformed blocks are dropped,
  never raised on; zero parsed cues means "not this format".

Both parsers are pure functions of the text; ``captions_to_markdown``
renders the deterministic transcript used by the extraction dispatch
(these are beyond-reference formats — the reference's
``config.py:37-57`` family has no timed-text member — so the markdown
shape is this repo's own, like FLAC/AIFF before it).
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

SRT_SIG_RE = re.compile(
    rb"^\s*\d+\s*\r?\n\s*\d{1,2}:\d{2}:\d{2}[,.]\d{3}\s*-->")
_TS_RE = re.compile(
    r"(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[,.](\d{3})")
_CUE_LINE_RE = re.compile(
    r"^\s*(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[,.](\d{3})(?:\s+(?P<settings>.*))?$")
_TAG_RE = re.compile(r"<[^>\n]*>")
_ENTITIES = (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
             ("&lrm;", ""), ("&rlm;", ""), ("&nbsp;", " "))


class Cue(NamedTuple):
    index: int                       # 0-based parse order
    start_ms: int
    end_ms: int
    text: str


def _ms(h: str | None, m: str, s: str, ms: str) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def _clean_text(lines: list[str]) -> str:
    text = "\n".join(lines).strip()
    text = _TAG_RE.sub("", text)
    for ent, rep in _ENTITIES:
        text = text.replace(ent, rep)
    return text.strip()


def _parse_blocks(lines: list[str], *, vtt: bool) -> list[Cue]:
    cues: list[Cue] = []
    i = 0
    n = len(lines)
    while i < n:
        if not lines[i].strip():
            i += 1
            continue
        head = lines[i].strip()
        if vtt and (head.startswith("NOTE") or head.startswith("STYLE")
                    or head.startswith("REGION")):
            while i < n and lines[i].strip():
                i += 1
            continue
        m = _CUE_LINE_RE.match(lines[i])
        if m is None and i + 1 < n:
            # optional counter (SRT) / cue id (VTT) line
            m = _CUE_LINE_RE.match(lines[i + 1])
            if m is not None:
                i += 1
        if m is None:
            # not a cue block: skip it wholesale
            while i < n and lines[i].strip():
                i += 1
            continue
        start = _ms(m.group(1), m.group(2), m.group(3), m.group(4))
        end = _ms(m.group(5), m.group(6), m.group(7), m.group(8))
        i += 1
        body: list[str] = []
        while i < n and lines[i].strip():
            body.append(lines[i])
            i += 1
        text = _clean_text(body)
        if text and end >= start:
            cues.append(Cue(len(cues), start, end, text))
    return cues


def parse_srt(text: str) -> list[Cue]:
    """SubRip text → cues (empty on garbage, never raises)."""
    return _parse_blocks(text.lstrip("﻿").splitlines(), vtt=False)


def parse_webvtt(text: str) -> list[Cue]:
    """WebVTT text → cues.  Returns [] unless the WEBVTT magic leads."""
    body = text.lstrip("﻿")
    if not body.startswith("WEBVTT"):
        return []
    lines = body.splitlines()
    # header: the WEBVTT line plus anything until the first blank line
    i = 1
    while i < len(lines) and lines[i].strip():
        i += 1
    return _parse_blocks(lines[i:], vtt=True)


def sniff_captions(payload: bytes) -> Optional[str]:
    """'vtt' | 'srt' | None from the leading bytes (cheap, no full
    parse — same contract as the sniffer's other text probes)."""
    head = payload[:512]
    if head[:3] == b"\xef\xbb\xbf":
        head = head[3:]
    if head.startswith(b"WEBVTT"):
        return "vtt"
    if SRT_SIG_RE.match(head):
        return "srt"
    return None


def _fmt_ts(ms: int) -> str:
    s, ms = divmod(ms, 1000)
    h, s = divmod(s, 3600)
    m, s = divmod(s, 60)
    return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"


def parse_captions(payload: bytes) -> tuple[str, list[Cue]]:
    """bytes → (kind, cues); kind '' with [] when neither grammar
    claims the payload.  UTF-8 with replacement — caption files in
    the wild are overwhelmingly UTF-8, and replacement keeps the
    never-raise contract on mislabeled encodings."""
    kind = sniff_captions(payload)
    if kind is None:
        return "", []
    text = payload.decode("utf-8", errors="replace")
    cues = parse_webvtt(text) if kind == "vtt" else parse_srt(text)
    if not cues:
        return "", []
    return kind, cues


def captions_to_markdown(payload: bytes,
                         doc_name: str) -> Optional[str]:
    """Transcript markdown for the extraction dispatch; None when the
    payload parses to zero cues (caller maps to unsupported)."""
    kind, cues = parse_captions(payload)
    if not cues:
        return None
    span = _fmt_ts(max(c.end_ms for c in cues))
    label = "WebVTT" if kind == "vtt" else "SubRip"
    lines = [f"# {doc_name}", "",
             f"**Format:** {label} — {len(cues)} cues, {span} span", ""]
    for c in cues:
        flat = " ".join(c.text.split())
        lines.append(f"[{_fmt_ts(c.start_ms)} → {_fmt_ts(c.end_ms)}] "
                     f"{flat}")
    return "\n".join(lines) + "\n"
