# -*- coding: utf-8 -*-
"""RTF → plain text (control-word stripper).

The reference lists '.rtf' among its supported text formats
(/root/reference/src/config.py:48).  This is a from-scratch tokenizer
over the public RTF 1.x syntax: groups ``{...}``, control words
``\\word[N]``, control symbols ``\\x`` — destination groups (font/color
tables, stylesheet, pict, metadata) are skipped, paragraph/line/tab
controls map to whitespace, ``\\'hh`` hex escapes decode via cp1252 and
``\\uN`` unicode escapes honor the current ``\\ucN`` skip count.

Like the text passthrough, the result goes through the shared cleanup
chain in extract.py — no heading synthesis, the document speaks for
itself.
"""

from __future__ import annotations

import re

_DESTINATIONS = frozenset({
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "themedata", "colorschememapping",
    "listtable", "listoverridetable", "latentstyles", "datastore",
    "generator", "xmlnstbl", "filetbl", "revtbl",
})

_CTRL = re.compile(rb"\\([a-zA-Z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\(.)")


def rtf_to_text(payload: bytes) -> str:
    out: list[str] = []
    # Per-group state stack: (skipping_destination, uc_skip_count)
    stack: list[tuple[bool, int]] = []
    skipping = False
    uc_skip = 1
    pending_uc_skip = 0
    pos = 0
    n = len(payload)

    while pos < n:
        ch = payload[pos]
        if ch == 0x7B:  # {
            stack.append((skipping, uc_skip))
            pos += 1
            continue
        if ch == 0x7D:  # }
            if stack:
                skipping, uc_skip = stack.pop()
            pos += 1
            continue
        if ch == 0x5C:  # backslash
            m = _CTRL.match(payload, pos)
            if not m:
                pos += 1
                continue
            pos = m.end()
            if m.group(1) is not None:  # control word
                word = m.group(1).decode("ascii")
                param = int(m.group(2)) if m.group(2) else None
                if word in _DESTINATIONS:
                    skipping = True
                elif word == "uc":
                    uc_skip = param if param is not None else 1
                elif word == "u" and param is not None:
                    if not skipping:
                        out.append(chr(param & 0xFFFF))
                        pending_uc_skip = uc_skip
                elif not skipping:
                    if word in ("par", "line", "sect", "page", "row"):
                        out.append("\n")
                    elif word in ("tab", "cell"):
                        out.append("\t")
                    elif word in ("emdash", "endash"):
                        out.append("—" if word == "emdash" else "–")
                    elif word in ("lquote", "rquote"):
                        out.append("'")
                    elif word in ("ldblquote", "rdblquote"):
                        out.append('"')
                    elif word == "bullet":
                        out.append("•")
                    # all other control words: formatting → dropped
            elif m.group(3) is not None:  # \'hh hex escape
                if pending_uc_skip > 0:
                    pending_uc_skip -= 1
                elif not skipping:
                    out.append(bytes([int(m.group(3), 16)])
                               .decode("cp1252", errors="replace"))
            else:  # control symbol
                sym = m.group(4)
                if sym == b"*":
                    skipping = True  # \* → ignorable destination
                elif sym in (b"\\", b"{", b"}") and not skipping:
                    out.append(sym.decode("ascii"))
                elif sym == b"~" and not skipping:
                    out.append("\u00a0")
            continue
        # plain text run up to the next delimiter
        end = pos
        while end < n and payload[end] not in (0x5C, 0x7B, 0x7D):
            end += 1
        if not skipping:
            text = payload[pos:end].decode("cp1252", errors="replace")
            text = text.replace("\r", "").replace("\n", "")
            if pending_uc_skip > 0:
                drop = min(pending_uc_skip, len(text))
                text = text[drop:]
                pending_uc_skip -= drop
            out.append(text)
        pos = end

    text = "".join(out)
    lines = [ln.rstrip() for ln in text.split("\n")]
    return "\n".join(lines).strip()
