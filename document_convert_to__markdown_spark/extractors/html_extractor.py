# -*- coding: utf-8 -*-
"""From-scratch HTML → markdown extraction.

Replaces the reference's MarkItDown call (/root/reference/src/converter.py:555,
operator A5 in SURVEY.md §2) with an owned implementation, per the
north_star: "a from-scratch DOM parse with boilerplate-strip heuristics
(tag-density, link-text ratio, block scoring) and an HTML-to-markdown
serializer (headings, tables, lists, code fences, links)".

Three stages, all pure functions (UDF-safe, deterministic):

1. ``parse_dom``      — tokenizes with the stdlib ``html.parser`` event
   stream and builds a lightweight DOM tree (void elements, implied
   closes for ``p``/``li``/``tr``/``td``).
2. ``strip_boilerplate`` — scores block-level subtrees by link-text
   ratio, text density (text chars per tag) and class/id/tag hints;
   drops nav/footer/sidebar/cookie-banner-like blocks.
3. ``serialize_markdown`` — walks the pruned tree emitting markdown
   following the reference wrapper's conventions (ATX headings, ``-``
   bullets, pipe tables, fenced code — config.py:142-150
   MARKDOWN_CONFIG).

Output then flows through the A16 cleanup chain (cleanup.py) exactly as
the reference post-processes MarkItDown output.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# --- DOM ---------------------------------------------------------------

VOID_ELEMENTS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

# Elements whose open tag implicitly closes a currently-open element.
_IMPLIED_CLOSE = {
    "p": {"p"},
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
}

BLOCK_TAGS = frozenset(
    {"div", "section", "article", "main", "aside", "nav", "header",
     "footer", "p", "ul", "ol", "table", "blockquote", "pre", "form",
     "h1", "h2", "h3", "h4", "h5", "h6", "figure", "fieldset"}
)

SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "svg",
                       "iframe", "object", "head", "title", "meta", "link",
                       "base"})


class Node:
    """Minimal DOM node. ``tag is None`` marks a text node."""

    __slots__ = ("tag", "attrs", "children", "text", "parent")

    def __init__(self, tag, attrs=None, text=""):
        self.tag = tag
        self.attrs = attrs or {}
        self.children = []
        self.text = text
        self.parent = None

    def append(self, child):
        child.parent = self
        self.children.append(child)

    def iter_text(self):
        if self.tag is None:
            yield self.text
            return
        if self.tag in SKIP_TAGS:
            return
        for child in self.children:
            yield from child.iter_text()

    def text_content(self) -> str:
        return "".join(self.iter_text())


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]
        self._raw_stack = 0  # depth inside script/style — drop content

    def _top(self):
        return self.stack[-1]

    def handle_starttag(self, tag, attrs):
        if self._raw_stack:
            return
        implied = _IMPLIED_CLOSE.get(tag)
        if implied:
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t in implied:
                    del self.stack[i:]
                    break
                if t in ("table", "ul", "ol", "div", "section", "body"):
                    break
        node = Node(tag, dict(attrs))
        self._top().append(node)
        if tag in SKIP_TAGS and tag not in ("meta", "link", "base"):
            self._raw_stack += 1
            self.stack.append(node)
        elif tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if self._raw_stack:
            return
        self._top().append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        if self._raw_stack:
            if self.stack and self.stack[-1].tag == tag:
                self.stack.pop()
                self._raw_stack -= 1
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # Unmatched close tag: ignored (lenient parse).

    def handle_data(self, data):
        if self._raw_stack or not data:
            return
        self._top().append(Node(None, text=data))


# --- Fast tokenizer (stdlib-parity subset) ------------------------------
#
# ``html.parser`` spends most of the extraction budget in ``goahead``'s
# per-construct regex dance (profiled: ~half of html_to_markdown).  The
# scanner below tokenizes the *clean-HTML subset* — canonical start/end
# tags, quoted/unquoted attributes, comments, doctype, PIs, script/style
# raw text — with one possessive-quantifier regex per construct and
# feeds the SAME ``_DomBuilder`` callbacks, so the DOM is identical by
# construction.  Anything outside the subset (tolerant-parser quirks:
# junk in tags, ``<![`` marked sections, unterminated constructs, bogus
# end tags) raises ``_FallbackToStdlib`` and the document re-parses with
# the stdlib parser from scratch — byte-for-byte stdlib behavior on the
# weird tail, ~2-3x less CPU on the common path.  Parity is pinned by
# the golden fixtures plus a property test that cross-checks both
# parsers on generated HTML (tests/test_properties.py).
#
# Two stdlib behaviors deliberately replicated (html/parser.py,
# CPython 3.11): text runs between tags are emitted as ONE
# ``handle_data`` call decoded with ``html.unescape`` (the parser itself
# calls ``unescape`` in convert_charrefs mode), and a bare ``<`` that
# opens no construct is emitted as its own ``handle_data("<")`` call.

class _FallbackToStdlib(Exception):
    pass


# ``=++`` mirrors stdlib attrfind_tolerant's ``=+`` (runs of equals
# signs collapse before the value: ``a==x`` parses as value "x", not
# "=x"); the value cannot then start with a quote (stdlib lookahead).
_FAST_STARTTAG = re.compile(
    r'<([a-zA-Z][a-zA-Z0-9.:_-]*+)'
    r'((?:\s++[^\s/>=]++(?:\s*+=++\s*+'
    r'(?:"[^"]*+"|\'[^\']*+\'|(?![\'"])[^\s>]++))?+)*+)'
    r'\s*+(/?+)>')
_FAST_ATTR = re.compile(
    r'\s++([^\s/>=]++)(?:\s*+=++\s*+'
    r'("[^"]*+"|\'[^\']*+\'|(?![\'"])[^\s>]++))?+')
_FAST_ENDTAG = re.compile(r'</\s*+([a-zA-Z][-.a-zA-Z0-9:_]*+)\s*+>')
_COMMENT_CLOSE = re.compile(r'--\s*>')
_RAW_INTEREST = {t: re.compile(r'</\s*%s' % t, re.IGNORECASE)
                 for t in ("script", "style")}


def _fast_feed(data: str, builder: "_DomBuilder") -> None:
    from html import unescape

    n = len(data)
    pos = 0
    find = data.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            text = data[pos:]
            builder.handle_data(unescape(text) if "&" in text else text)
            break
        if lt > pos:
            text = data[pos:lt]
            builder.handle_data(unescape(text) if "&" in text else text)
        nxt = data[lt + 1:lt + 2]
        if nxt and (nxt.isalpha() and nxt.isascii()):
            m = _FAST_STARTTAG.match(data, lt)
            if not m:
                raise _FallbackToStdlib  # tolerant-parser territory
            tag = m.group(1).lower()
            raw_attrs = m.group(2)
            attrs = []
            if raw_attrs:
                for am in _FAST_ATTR.finditer(raw_attrs):
                    v = am.group(2)
                    if v is not None:
                        if v[0] in "\"'":
                            v = v[1:-1]
                        if "&" in v:
                            v = unescape(v)
                    attrs.append((am.group(1).lower(), v))
            pos = m.end()
            if m.group(3):
                builder.handle_startendtag(tag, attrs)
                continue
            builder.handle_starttag(tag, attrs)
            if tag in ("script", "style"):
                pos = _fast_raw(data, pos, tag, builder)
            continue
        if nxt == "/":
            m = _FAST_ENDTAG.match(data, lt)
            if not m:
                raise _FallbackToStdlib  # </>, bogus or unterminated
            builder.handle_endtag(m.group(1).lower())
            pos = m.end()
            continue
        if data.startswith("<!--", lt):
            m = _COMMENT_CLOSE.search(data, lt + 4)
            if not m:
                raise _FallbackToStdlib  # unterminated comment
            pos = m.end()  # comment content: no builder callback
            continue
        if nxt == "!":
            if data.startswith("<![", lt):
                raise _FallbackToStdlib  # marked section scanning
            gt = find(">", lt + 2)
            if gt < 0:
                raise _FallbackToStdlib
            pos = gt + 1  # doctype / bogus comment: ignored
            continue
        if nxt == "?":
            gt = find(">", lt + 2)
            if gt < 0:
                raise _FallbackToStdlib
            pos = gt + 1  # processing instruction: ignored
            continue
        if lt + 1 < n:
            builder.handle_data("<")  # stdlib: lone '<' is its own data
            pos = lt + 1
            continue
        raise _FallbackToStdlib  # trailing '<' at EOF


def _fast_raw(data: str, pos: int, tag: str,
              builder: "_DomBuilder") -> int:
    """Scan script/style raw text exactly like stdlib CDATA mode: data
    (which the builder drops) up to a ``</tag`` that parses as a real
    end tag; mismatched end tags stay data and the mode continues."""
    interest = _RAW_INTEREST[tag]
    n = len(data)
    while pos < n:
        m = interest.search(data, pos)
        if not m:
            return n  # unterminated raw element: rest is (dropped) data
        em = _FAST_ENDTAG.match(data, m.start())
        if em and em.group(1).lower() == tag:
            builder.handle_endtag(tag)
            return em.end()
        gt = data.find(">", m.start() + 1)
        if gt < 0:
            raise _FallbackToStdlib  # unterminated bogus end tag at EOF
        pos = gt + 1  # stdlib: non-matching end tag is data, mode holds
    return n


def parse_dom(html_text: str) -> Node:
    """Parse HTML text into a lenient DOM tree (fast scanner with
    stdlib fallback — identical output either way)."""
    builder = _DomBuilder()
    try:
        _fast_feed(html_text, builder)
        return builder.root
    except _FallbackToStdlib:
        pass
    except Exception:
        pass
    builder = _DomBuilder()
    try:
        builder.feed(html_text)
        builder.close()
    except Exception:
        # Lenient by contract: whatever was built so far is the DOM.
        pass
    return builder.root


# --- Boilerplate stripping ----------------------------------------------

_BOILERPLATE_HINT = re.compile(
    r"(?:^|[-_ ])(nav|navbar|menu|sidebar|side-bar|footer|header|banner|"
    r"cookie|consent|advert|ads?|promo|share|social|breadcrumb|pagination|"
    r"related|widget|popup|modal|subscribe|newsletter)(?:$|[-_ ])",
    re.IGNORECASE,
)

_ALWAYS_DROP_TAGS = frozenset({"nav", "footer", "aside"})


def _link_text_len(node: Node) -> int:
    if node.tag is None:
        return 0
    if node.tag == "a":
        return len(node.text_content())
    return sum(_link_text_len(c) for c in node.children)


def _tag_count(node: Node) -> int:
    if node.tag is None:
        return 0
    return 1 + sum(_tag_count(c) for c in node.children)


def _hint_match(node: Node) -> bool:
    blob = " ".join(
        str(node.attrs.get(k, "")) for k in ("class", "id", "role")
    )
    return bool(blob and _BOILERPLATE_HINT.search(blob))


def block_score(node: Node) -> float:
    """Boilerplate score for a block subtree. > 0.5 → drop.

    Combines (north_star heuristics):
    - link-text ratio: chars inside <a> / total chars
    - tag density: tags per text char (markup-heavy, text-light blocks)
    - class/id/role hints and structural tags (nav/footer/aside)
    """
    text = node.text_content().strip()
    text_len = len(text)
    if node.tag in _ALWAYS_DROP_TAGS:
        return 1.0

    score = 0.0
    if _hint_match(node):
        score += 0.6

    if text_len == 0:
        # No text at all: markup-only block (spacer/button bar).
        return score + 0.3

    link_ratio = _link_text_len(node) / text_len
    if link_ratio > 0.65:
        score += 0.5
    elif link_ratio > 0.4:
        score += 0.25

    tags = _tag_count(node)
    density = text_len / max(tags, 1)  # text chars per tag
    if density < 10 and text_len < 200:
        score += 0.25
    return score


def strip_boilerplate(root: Node) -> Node:
    """Prune boilerplate blocks in place and return the root.

    Headings and paragraphs are never dropped on density alone — only
    container blocks are candidates; an <h1> inside a nav still dies with
    the nav (subtree pruning).
    """
    candidates = {"div", "section", "aside", "nav", "header", "footer",
                  "ul", "ol", "form", "table", "figure", "fieldset"}

    def prune(node: Node) -> bool:
        """Return True if node should be removed."""
        if node.tag in SKIP_TAGS and node.tag is not None:
            return True
        if node.tag in candidates and block_score(node) > 0.5:
            return True
        node.children = [c for c in node.children if not prune(c)]
        return False

    prune(root)
    return root


# --- Markdown serializer -------------------------------------------------

_WS_RUNS = re.compile(r"[ \t\r\n\f]+")


def _collapse_ws(text: str) -> str:
    return _WS_RUNS.sub(" ", text)


class _MarkdownWriter:
    """Tree walk → markdown string builder.

    Conventions follow the reference wrapper's output style
    (config.py:142-150): ATX headings, ``-`` bullets, ``**`` strong,
    ``*`` emphasis, ``````` fences, left-aligned pipe tables.
    """

    def __init__(self):
        self.blocks: list[str] = []

    # -- inline -----------------------------------------------------------

    def inline(self, node: Node) -> str:
        if node.tag is None:
            # convert_charrefs=True already decoded entities in the parser.
            return _collapse_ws(node.text)
        tag = node.tag
        if tag in SKIP_TAGS:
            return ""
        inner = "".join(self.inline(c) for c in node.children)
        if tag in ("strong", "b"):
            body = inner.strip()
            return f"**{body}**" if body else ""
        if tag in ("em", "i"):
            body = inner.strip()
            return f"*{body}*" if body else ""
        if tag == "code":
            body = inner.strip()
            return f"`{body}`" if body else ""
        if tag == "a":
            href = node.attrs.get("href", "")
            body = inner.strip() or href
            if not body:
                return ""
            return f"[{body}]({href})" if href else body
        if tag == "img":
            alt = node.attrs.get("alt", "") or ""
            src = node.attrs.get("src", "") or ""
            return f"![{alt}]({src})"
        if tag == "br":
            return "\n"
        return inner

    def inline_children(self, node: Node) -> str:
        return "".join(self.inline(c) for c in node.children)

    # -- blocks -----------------------------------------------------------

    def emit(self, text: str):
        if text:
            self.blocks.append(text)

    def walk(self, node: Node):
        for child in node.children:
            self.block(child)

    def block(self, node: Node):
        if node.tag is None:
            text = self.inline(node).strip()
            if text:
                self.emit(text)
            return
        tag = node.tag
        if tag in SKIP_TAGS:
            return
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            level = int(tag[1])
            text = _collapse_ws(self.inline_children(node)).strip()
            if text:
                self.emit(f"{'#' * level} {text}")
            return
        if tag == "p":
            text = self.inline_children(node).strip()
            if text:
                self.emit(text)
            return
        if tag in ("ul", "ol"):
            self.emit(self.list_block(node, ordered=(tag == "ol"), depth=0))
            return
        if tag == "table":
            self.emit(self.table_block(node))
            return
        if tag == "pre":
            code = node.text_content()
            code = code.strip("\n")
            self.emit(f"```\n{code}\n```")
            return
        if tag == "blockquote":
            sub = _MarkdownWriter()
            sub.walk(node)
            quoted = "\n".join(
                "> " + line if line else ">"
                for block in sub.blocks
                for line in block.split("\n")
            )
            self.emit(quoted)
            return
        if tag == "hr":
            self.emit("---")
            return
        if tag in ("img", "a", "strong", "b", "em", "i", "code", "span",
                   "br", "label", "small", "sup", "sub", "u", "s", "time",
                   "abbr", "cite", "q", "mark"):
            text = self.inline(node).strip()
            if text:
                self.emit(text)
            return
        # Generic container: recurse block-wise.
        self.walk(node)

    def list_block(self, node: Node, ordered: bool, depth: int) -> str:
        lines = []
        index = 1
        for child in node.children:
            if child.tag != "li":
                continue
            nested = []
            inline_parts = []
            for grand in child.children:
                if grand.tag in ("ul", "ol"):
                    nested.append(
                        self.list_block(grand, ordered=(grand.tag == "ol"),
                                        depth=depth + 1)
                    )
                else:
                    inline_parts.append(self.inline(grand))
            text = _collapse_ws("".join(inline_parts)).strip()
            marker = f"{index}." if ordered else "-"
            indent = "  " * depth
            if text:
                lines.append(f"{indent}{marker} {text}")
            for block in nested:
                lines.append(block)
            index += 1
        return "\n".join(lines)

    def table_block(self, node: Node) -> str:
        rows: list[list[str]] = []
        header_cells: list[str] | None = None

        def collect_rows(n: Node):
            nonlocal header_cells
            for child in n.children:
                if child.tag == "tr":
                    cells = [
                        _collapse_ws(self.inline_children(c)).strip()
                        for c in child.children
                        if c.tag in ("td", "th")
                    ]
                    if cells:
                        if header_cells is None and any(
                            c.tag == "th" for c in child.children
                        ):
                            header_cells = cells
                        else:
                            rows.append(cells)
                elif child.tag in ("thead", "tbody", "tfoot"):
                    collect_rows(child)

        collect_rows(node)
        if header_cells is None:
            if not rows:
                return ""
            header_cells = rows.pop(0)
        width = max([len(header_cells)] + [len(r) for r in rows]) if rows else len(header_cells)
        header_cells = header_cells + [""] * (width - len(header_cells))
        out = ["| " + " | ".join(header_cells) + " |"]
        out.append("| " + " | ".join(["---"] * width) + " |")
        for row in rows:
            row = row + [""] * (width - len(row))
            out.append("| " + " | ".join(row) + " |")
        return "\n".join(out)


def serialize_markdown(root: Node) -> str:
    writer = _MarkdownWriter()
    writer.walk(root)
    return "\n\n".join(writer.blocks)


# --- Top-level -----------------------------------------------------------

def html_to_markdown(payload: bytes | str) -> str:
    """bytes/str of HTML → markdown (before the A16 cleanup chain)."""
    if isinstance(payload, bytes):
        text = payload.decode("utf-8", errors="replace")
    else:
        text = payload
    root = parse_dom(text)
    strip_boilerplate(root)
    return serialize_markdown(root)
