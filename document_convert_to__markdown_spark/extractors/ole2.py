# -*- coding: utf-8 -*-
"""Legacy OLE2 / Compound-File Office formats (.doc/.xls/.ppt) → markdown.

The reference accepts the legacy binary Office extensions
(/root/reference/src/config.py:40-42 lists '.doc', '.ppt', '.xls';
extension dispatch document_processors.py:1073-1097 routes them through
MarkItDown).  At web scale there are no extensions, so this module
sniffs the OLE2 magic (``D0 CF 11 E0 A1 B1 1A E1``) and identifies the
subtype from the compound file's directory entries, then extracts text
with from-scratch parsers built on the public [MS-CFB], [MS-DOC],
[MS-XLS] and [MS-PPT] format specifications — stdlib only, pure
functions of the payload bytes (no filesystem, no third-party parsers).

Parsers are deliberately "text grab" depth: paragraphs/cells/atoms in
document order, no styling — the curation-pipeline use case (what does
this crawl payload SAY) rather than full fidelity.  Output conventions
mirror the OOXML siblings (xlsx_extractor / pptx_extractor) so legacy
and modern documents of the same family look alike downstream.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


class CompoundFileError(ValueError):
    pass


class CompoundFile:
    """Minimal [MS-CFB] reader: directory listing + stream extraction.

    Supports version 3 (512-byte sectors) and 4 (4096), FAT chains via
    the header DIFAT + DIFAT sector chains, and the mini stream
    (miniFAT) for streams under the mini-stream cutoff.
    """

    def __init__(self, payload: bytes):
        if len(payload) < 512 or not payload.startswith(OLE2_MAGIC):
            raise CompoundFileError("not an OLE2 compound file")
        self._raw = payload
        (self._sector_shift,) = struct.unpack_from("<H", payload, 30)
        (self._mini_shift,) = struct.unpack_from("<H", payload, 32)
        if self._sector_shift not in (9, 12) or self._mini_shift != 6:
            raise CompoundFileError("unsupported sector size")
        self._sector_size = 1 << self._sector_shift
        (self._n_fat_sects,) = struct.unpack_from("<I", payload, 44)
        (self._dir_start,) = struct.unpack_from("<I", payload, 48)
        (self._mini_cutoff,) = struct.unpack_from("<I", payload, 56)
        (self._minifat_start,) = struct.unpack_from("<I", payload, 60)
        (self._n_minifat_sects,) = struct.unpack_from("<I", payload, 64)
        (self._difat_start,) = struct.unpack_from("<I", payload, 68)
        (self._n_difat_sects,) = struct.unpack_from("<I", payload, 72)

        self._fat = self._read_fat()
        self._dir = self._read_directory()
        self._minifat = self._read_minifat()
        self._mini_stream = self._read_root_stream()

    # -- sector plumbing ---------------------------------------------------

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self._sector_size if self._sector_shift == 9 \
            else (n + 1) * self._sector_size
        return self._raw[off: off + self._sector_size]

    def _read_fat(self) -> List[int]:
        # The file can hold at most this many sectors, so more FAT
        # sector ids than that are garbage; without the cap a crafted
        # payload under the 100MB gate could enumerate ~25M ids from
        # DIFAT sectors and blow the `fat` list to tens of GB
        # (review r3, same depth as the DIFAT walk clamp below).
        max_fat_ids = len(self._raw) // self._sector_size + 1
        fat_sector_ids: List[int] = []
        # 109 DIFAT entries live in the header...
        for i in range(109):
            (sid,) = struct.unpack_from("<I", self._raw, 76 + 4 * i)
            if sid not in (_FREESECT, _ENDOFCHAIN):
                fat_sector_ids.append(sid)
        # ...then DIFAT sectors chain through their last entry.  The
        # header-declared count is attacker-controlled (up to 2^32) and
        # a self-looping DIFAT sector would otherwise spin forever while
        # appending 127 ids per pass (ADVICE r2) — clamp the walk to the
        # number of sectors the payload can physically hold and break on
        # any revisited sector, mirroring the _chain guard.
        sid = self._difat_start
        per = self._sector_size // 4 - 1
        seen: set = set()
        max_difat = min(self._n_difat_sects,
                        len(self._raw) // self._sector_size + 1)
        for _ in range(max_difat):
            if (sid in (_FREESECT, _ENDOFCHAIN) or sid in seen
                    or len(fat_sector_ids) >= max_fat_ids):
                break
            seen.add(sid)
            sect = self._sector(sid)
            if len(sect) < self._sector_size:
                break  # chain points past the payload: unframeable
            for i in range(per):
                (e,) = struct.unpack_from("<I", sect, 4 * i)
                if e not in (_FREESECT, _ENDOFCHAIN):
                    fat_sector_ids.append(e)
                    if len(fat_sector_ids) >= max_fat_ids:
                        break
            (sid,) = struct.unpack_from("<I", sect, 4 * per)
        del fat_sector_ids[max_fat_ids:]
        fat: List[int] = []
        for fsid in fat_sector_ids:
            sect = self._sector(fsid)
            fat.extend(struct.unpack(f"<{len(sect) // 4}I", sect))
        return fat

    def _chain(self, start: int, fat: List[int],
               max_sectors: int = 1 << 20) -> List[int]:
        out: List[int] = []
        sid = start
        seen = set()
        while sid not in (_ENDOFCHAIN, _FREESECT) and len(out) < max_sectors:
            if sid in seen or sid >= len(fat):  # cycle / corruption guard
                break
            seen.add(sid)
            out.append(sid)
            sid = fat[sid]
        return out

    def _read_directory(self) -> List[dict]:
        data = b"".join(self._sector(s)
                        for s in self._chain(self._dir_start, self._fat))
        entries = []
        for off in range(0, len(data) - 127, 128):
            (name_len,) = struct.unpack_from("<H", data, off + 64)
            obj_type = data[off + 66]
            if obj_type == 0 or name_len < 2 or name_len > 64:
                continue
            name = data[off: off + name_len - 2].decode(
                "utf-16-le", errors="replace")
            (start,) = struct.unpack_from("<I", data, off + 116)
            (size,) = struct.unpack_from("<Q", data, off + 120)
            if self._sector_shift == 9:
                size &= 0xFFFFFFFF  # v3: only the low 32 bits are valid
            entries.append({"name": name, "type": obj_type,
                            "start": start, "size": size})
        return entries

    def _read_minifat(self) -> List[int]:
        if self._minifat_start in (_ENDOFCHAIN, _FREESECT):
            return []
        data = b"".join(self._sector(s)
                        for s in self._chain(self._minifat_start, self._fat))
        return list(struct.unpack(f"<{len(data) // 4}I", data))

    def _read_root_stream(self) -> bytes:
        for e in self._dir:
            if e["type"] == 5:  # root storage → the mini stream
                data = b"".join(self._sector(s)
                                for s in self._chain(e["start"], self._fat))
                return data[: e["size"]]
        return b""

    # -- public API --------------------------------------------------------

    def stream_names(self) -> List[str]:
        return [e["name"] for e in self._dir if e["type"] == 2]

    def read_stream(self, name: str) -> Optional[bytes]:
        for e in self._dir:
            if e["type"] == 2 and e["name"] == name:
                if e["size"] < self._mini_cutoff:
                    chunks = [self._mini_stream[64 * s: 64 * s + 64]
                              for s in self._chain(e["start"], self._minifat)]
                else:
                    chunks = [self._sector(s)
                              for s in self._chain(e["start"], self._fat)]
                return b"".join(chunks)[: e["size"]]
        return None


def sniff_ole2_subtype(payload: bytes) -> str:
    """'doc' | 'xls' | 'ppt' | 'unknown' from the directory entries.

    Mirrors what extension dispatch decided in the reference
    (config.py:40-42) but from the container itself; other OLE2 payloads
    (MSI, Thumbs.db, ...) stay 'unknown' and surface as status rows.
    """
    try:
        names = set(CompoundFile(payload).stream_names())
    except (CompoundFileError, struct.error, MemoryError):
        return "unknown"
    if "WordDocument" in names:
        return "doc"
    if "Workbook" in names or "Book" in names:
        return "xls"
    if "PowerPoint Document" in names:
        return "ppt"
    return "unknown"


# -- .doc ([MS-DOC]) -------------------------------------------------------

def _doc_text_from_clx(word: bytes, table: bytes,
                       fc_clx: int, lcb_clx: int) -> Optional[str]:
    """Decode the piece table (CLX → PlcPcd) — the Word-97+ text map."""
    clx = table[fc_clx: fc_clx + lcb_clx]
    pos = 0
    # Skip Prc (clxt 0x01) entries to the Pcdt (clxt 0x02).
    while pos < len(clx) and clx[pos] == 0x01:
        (cb,) = struct.unpack_from("<h", clx, pos + 1)
        if cb <= 0:  # spec: cbGrpprl > 0; corrupt value must still advance
            return None
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        return None
    (lcb,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5: pos + 5 + lcb]
    n = (len(plc) - 4) // 12
    if n <= 0:
        return None
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    parts: List[str] = []
    for k in range(n):
        off = 4 * (n + 1) + 8 * k
        (fc_raw,) = struct.unpack_from("<I", plc, off + 2)
        n_chars = cps[k + 1] - cps[k]
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        if compressed:
            raw = word[fc // 2: fc // 2 + n_chars]
            parts.append(raw.decode("cp1252", errors="replace"))
        else:
            raw = word[fc: fc + 2 * n_chars]
            parts.append(raw.decode("utf-16-le", errors="replace"))
    return "".join(parts)


def extract_doc_text(payload: bytes) -> str:
    """Word binary (.doc) → plain text, paragraph marks normalized.

    Primary path: FIB → Clx piece table in the 0Table/1Table stream
    ([MS-DOC] 2.8.35).  Fallbacks: fcMin..fcMac cp1252 (pre-97 files),
    then a printable-run scan — a malformed file degrades, never raises
    past the caller's per-row isolation.
    """
    cf = CompoundFile(payload)
    word = cf.read_stream("WordDocument")
    if not word or len(word) < 120:
        raise CompoundFileError("missing WordDocument stream")
    (w_ident,) = struct.unpack_from("<H", word, 0)
    if w_ident != 0xA5EC:
        raise CompoundFileError("bad FIB magic")
    (flags,) = struct.unpack_from("<H", word, 10)
    which_tbl = "1Table" if flags & 0x0200 else "0Table"
    table = cf.read_stream(which_tbl) or cf.read_stream(
        "1Table" if which_tbl == "0Table" else "0Table") or b""

    text: Optional[str] = None
    # fcClx/lcbClx: FibRgFcLcb97 pair 33 → byte offset 0x01A2.
    if len(word) >= 0x01AA and table:
        fc_clx, lcb_clx = struct.unpack_from("<II", word, 0x01A2)
        if lcb_clx and fc_clx + lcb_clx <= len(table):
            text = _doc_text_from_clx(word, table, fc_clx, lcb_clx)
    if text is None:
        fc_min, fc_mac = struct.unpack_from("<II", word, 24)
        if 0 < fc_min < fc_mac <= len(word):
            text = word[fc_min:fc_mac].decode("cp1252", errors="replace")
    if text is None:
        runs = []
        cur = []
        for b in word:
            if 32 <= b < 127 or b in (9, 13):
                cur.append(chr(b))
            else:
                if len(cur) >= 4:
                    runs.append("".join(cur))
                cur = []
        text = "\n".join(runs)

    # Word stores paragraph marks as \r and special field chars < 0x20.
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    text = text.replace("\x07", "\n")  # cell/row marks
    text = "".join(c for c in text if c >= " " or c in "\n\t")
    lines = [ln.rstrip() for ln in text.split("\n")]
    return "\n".join(lines).strip()


# -- .xls ([MS-XLS] BIFF8) -------------------------------------------------

def _xls_string(data: bytes, pos: int) -> Tuple[str, int]:
    """XLUnicodeRichExtendedString at pos → (text, next_pos)."""
    (cch,) = struct.unpack_from("<H", data, pos)
    opts = data[pos + 2]
    pos += 3
    c_run = 0
    cb_ext = 0
    if opts & 0x08:  # fRichSt
        (c_run,) = struct.unpack_from("<H", data, pos)
        pos += 2
    if opts & 0x04:  # fExtSt
        (cb_ext,) = struct.unpack_from("<I", data, pos)
        pos += 4
    if opts & 0x01:  # fHighByte → UTF-16LE
        raw = data[pos: pos + 2 * cch]
        text = raw.decode("utf-16-le", errors="replace")
        pos += 2 * cch
    else:
        raw = data[pos: pos + cch]
        text = raw.decode("cp1252", errors="replace")
        pos += cch
    pos += 4 * c_run + cb_ext
    return text, pos


def _fmt_num(x: float) -> str:
    return str(int(x)) if x == int(x) else repr(x)


def _rk_value(rk: int) -> float:
    cent = rk & 0x01
    as_int = rk & 0x02
    if as_int:
        val = float(rk >> 2 if not (rk & 0x80000000)
                    else -((~rk >> 2) & 0x3FFFFFFF) - 1)
    else:
        val = struct.unpack("<d", b"\x00\x00\x00\x00"
                            + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return val / 100.0 if cent else val


def extract_xls_markdown(payload: bytes, doc_name: str) -> str:
    """Excel binary (.xls) → per-sheet markdown pipe tables.

    Walks the Workbook stream's BIFF8 records: SST shared strings,
    LABELSST / LABEL / NUMBER / RK cells keyed by (row, col).  Sheet
    boundaries come from BOF(worksheet)/EOF pairs; the sheet separator
    convention matches xlsx_extractor ('\\n\\n## ' + name).
    """
    cf = CompoundFile(payload)
    wb = cf.read_stream("Workbook") or cf.read_stream("Book")
    if not wb:
        raise CompoundFileError("missing Workbook stream")

    sst: List[str] = []
    sheet_names: List[str] = []
    sheets: List[Dict[Tuple[int, int], str]] = []
    cells: Optional[Dict[Tuple[int, int], str]] = None
    depth = 0
    pos = 0
    n = len(wb)
    while pos + 4 <= n:
        opcode, length = struct.unpack_from("<HH", wb, pos)
        body = wb[pos + 4: pos + 4 + length]
        pos += 4 + length
        if opcode == 0x0809:  # BOF
            depth += 1
            if depth > 1 or (len(body) >= 4 and
                             struct.unpack_from("<H", body, 2)[0] == 0x0010):
                cells = {}
                sheets.append(cells)
        elif opcode == 0x000A:  # EOF
            depth = max(0, depth - 1)
            if cells is not None:
                cells = None
        elif opcode == 0x0085:  # BOUNDSHEET: sheet name registry
            if len(body) >= 8:
                cch = body[6]
                opts = body[7]
                raw = body[8:]
                if opts & 0x01:
                    sheet_names.append(raw[: 2 * cch].decode(
                        "utf-16-le", errors="replace"))
                else:
                    sheet_names.append(raw[:cch].decode(
                        "cp1252", errors="replace"))
        elif opcode == 0x00FC:  # SST
            p = 8
            while p < len(body):
                try:
                    text, p = _xls_string(body, p)
                except (struct.error, IndexError):
                    break
                sst.append(text)
        elif cells is not None and len(body) >= 6:
            row, col = struct.unpack_from("<HH", body, 0)
            if opcode == 0x00FD and len(body) >= 10:  # LABELSST
                (isst,) = struct.unpack_from("<I", body, 6)
                if isst < len(sst):
                    cells[(row, col)] = sst[isst]
            elif opcode == 0x0204 and len(body) >= 9:  # LABEL (BIFF8 string)
                try:
                    cells[(row, col)] = _xls_string(body, 6)[0]
                except (struct.error, IndexError):
                    pass
            elif opcode == 0x0203 and len(body) >= 14:  # NUMBER
                (x,) = struct.unpack_from("<d", body, 6)
                cells[(row, col)] = _fmt_num(x)
            elif opcode == 0x027E and len(body) >= 10:  # RK
                (rk,) = struct.unpack_from("<I", body, 6)
                cells[(row, col)] = _fmt_num(_rk_value(rk))

    parts = [f"# {doc_name}"]
    for i, grid in enumerate(sheets):
        name = sheet_names[i] if i < len(sheet_names) else f"Sheet{i + 1}"
        parts.append(f"## {name}")
        if not grid:
            continue
        rows = sorted({r for r, _ in grid})
        cols = sorted({c for _, c in grid})
        table = []
        for ri, r in enumerate(rows):
            vals = [grid.get((r, c), "").replace("|", "\\|") for c in cols]
            table.append("| " + " | ".join(vals) + " |")
            if ri == 0:
                table.append("|" + " --- |" * len(cols))
        parts.append("\n".join(table))
    return "\n\n".join(parts)


# -- .ppt ([MS-PPT]) -------------------------------------------------------

_PPT_TEXTCHARS = 0x0FA0   # UTF-16LE text atom
_PPT_TEXTBYTES = 0x0FA8   # latin-1 text atom
_PPT_SLIDE_CONTAINER = 0x03EE


def _walk_ppt_records(data: bytes, out: List[Tuple[int, str]],
                      depth: int = 0) -> None:
    pos = 0
    n = len(data)
    while pos + 8 <= n and depth < 16:
        ver_inst, rec_type, rec_len = struct.unpack_from("<HHI", data, pos)
        pos += 8
        if rec_len > n - pos:
            rec_len = n - pos
        body = data[pos: pos + rec_len]
        pos += rec_len
        if rec_type == 0 and rec_len == 0:
            continue  # zero padding
        if (ver_inst & 0x000F) == 0x000F:  # container record
            if rec_type == _PPT_SLIDE_CONTAINER:
                out.append((rec_type, ""))
            _walk_ppt_records(body, out, depth + 1)
        elif rec_type == _PPT_TEXTCHARS:
            out.append((rec_type,
                        body.decode("utf-16-le", errors="replace")))
        elif rec_type == _PPT_TEXTBYTES:
            out.append((rec_type, body.decode("latin-1", errors="replace")))


def extract_ppt_markdown(payload: bytes, doc_name: str) -> str:
    """PowerPoint binary (.ppt) → markdown.

    Walks the 'PowerPoint Document' stream's record tree collecting
    TextCharsAtom / TextBytesAtom text in document order; slide
    containers emit the same slide-number comment convention as
    pptx_extractor, and the first text of each slide renders as its
    title heading.
    """
    cf = CompoundFile(payload)
    doc = cf.read_stream("PowerPoint Document")
    if not doc:
        raise CompoundFileError("missing PowerPoint Document stream")
    found: List[Tuple[int, str]] = []
    _walk_ppt_records(doc, found)

    parts = [f"# {doc_name}"]
    slide_no = 0
    first_text_of_slide = False
    for rec_type, text in found:
        if rec_type == _PPT_SLIDE_CONTAINER:
            slide_no += 1
            parts.append(f"<!-- Slide number: {slide_no} -->")
            first_text_of_slide = True
            continue
        text = text.replace("\r", "\n").strip()
        if not text:
            continue
        if first_text_of_slide:
            parts.append(f"## {text.splitlines()[0]}")
            rest = text.splitlines()[1:]
            if rest:
                parts.append("\n".join(rest))
            first_text_of_slide = False
        else:
            parts.append(text)
    return "\n\n".join(parts)
