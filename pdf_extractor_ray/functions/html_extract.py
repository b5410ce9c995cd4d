"""HTML main-content extraction: DOM-tree boilerplate stripping.

The reference implements only a PDF path; this module supplies the
HTML payload path the north rule demands, designed from public
boilerplate-removal literature (trafilatura / boilerpipe / jusText:
block segmentation at block-level tags, then per-block classification
by container role, text-to-link ratio ("link density") and text
length). Shares the reference's determinism contract
(reference extractor.py:3-9): pure function of the input bytes,
no normalization beyond whitespace collapsing, no wall clock.

Classification rules (fixed; changing any invalidates the committed
golden corpus, see FIXTURES.md):

  R-skip      : content under script/style/noscript/template/head/svg/
                iframe/form/button/select is never emitted.
  R-container : a block with any nav/header/footer/aside ancestor (or
                role="navigation|banner|contentinfo|complementary")
                is boilerplate.
  R-link      : link_density = non-ws chars inside <a> / non-ws chars
                of the block; > cfg.max_link_density => boilerplate.
  R-short     : paragraphs shorter than cfg.min_paragraph_chars,
                list items shorter than cfg.min_list_item_chars and
                headings shorter than cfg.min_heading_chars are
                boilerplate.
  R-table     : <table> outside boilerplate containers is rendered as
                a pipe-formatted block framed by "[TABLE: RxC]" /
                "[TABLE END]" markers — same output style as the PDF
                path's table insertion (reference extractor.py:844-874,
                layout_analyzer.py:70-103).

Kept blocks render in document order, joined by a blank line;
headings verbatim, list items prefixed "- ", whitespace inside a
block collapsed to single spaces.
"""

from __future__ import annotations

import re
import string
from dataclasses import dataclass, field
from html import unescape as _unescape
from html.parser import HTMLParser

try:
    # undocumented CPython html.parser regex internals power the fast
    # feed path; guarded so a future rename only loses the fast path
    # (segment_html falls back to the stdlib feed), never the import
    from html.parser import (  # type: ignore[attr-defined]
        attrfind_tolerant as _attrfind,
        commentclose as _commentclose,
        endtagfind as _endtagfind,
        locatestarttagend_tolerant as _locatestart,
        tagfind_tolerant as _tagfind,
    )

    _HAVE_PARSER_INTERNALS = True
except ImportError:  # pragma: no cover — current CPython exports them
    _HAVE_PARSER_INTERNALS = False

from pdf_extractor_ray.config import DEFAULT_CONFIG, PipelineConfig

_SKIP_TAGS = frozenset(
    "script style noscript template head svg iframe form button select option textarea".split()
)
_BOILER_TAGS = frozenset("nav header footer aside".split())
_BOILER_ROLES = frozenset("navigation banner contentinfo complementary".split())
# Tags whose open/close delimits a text block.
_BLOCK_TAGS = frozenset(
    "p div article section main li h1 h2 h3 h4 h5 h6 blockquote pre figure "
    "figcaption ul ol dl dt dd tr td th thead tbody table body html "
    "nav header footer aside address".split()
)
_HEADINGS = frozenset("h1 h2 h3 h4 h5 h6".split())
_WS_RE = re.compile(r"\s+")
_NONWS_RE = re.compile(r"\S")


@dataclass
class _Block:
    kind: str  # "p" | "heading" | "li" | "table"
    text: str
    link_chars: int
    total_chars: int
    boiler: bool


def _nonws_len(s: str) -> int:
    # equivalent to len(\S findall) but ~5x faster; str.split() and \s
    # agree on unicode whitespace for all text that reaches this path
    return sum(map(len, s.split()))


class _BlockParser(HTMLParser):
    """Single-pass segmentation of an HTML document into text blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._stack: list[str] = []
        self._skip_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._kind_stack: list[str] = []
        self._buf: list[str] = []
        self._buf_link_chars = 0
        # table capture state
        self._table_depth = 0
        self._table_rows: list[list[str]] = []
        self._cell_buf: list[str] | None = None
        self._table_boiler = False

    # -- block buffer ------------------------------------------------
    def _flush(self) -> None:
        if not self._buf:
            self._buf_link_chars = 0
            return
        raw = "".join(self._buf)
        self._buf = []
        link_chars = self._buf_link_chars
        self._buf_link_chars = 0
        # one split pass gives the ws-collapsed text AND the non-ws
        # char count (len minus the single-space separators) — same
        # result as _WS_RE.sub(" ", raw).strip() + _nonws_len(raw)
        parts = raw.split()
        if not parts:
            return
        text = " ".join(parts)
        kind = self._kind_stack[-1] if self._kind_stack else "p"
        self.blocks.append(
            _Block(
                kind=kind,
                text=text,
                link_chars=link_chars,
                total_chars=len(text) - (len(parts) - 1),
                boiler=self._boiler_depth > 0,
            )
        )

    # -- tag events --------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in ("br", "hr"):  # void elements: br = soft space, hr = block break
            if not self._skip_depth and not self._table_depth:
                if tag == "br":
                    self._buf.append(" ")
                else:
                    self._flush()
            return
        boiler = tag in _BOILER_TAGS
        if not boiler and attrs:
            role = next((v for k, v in attrs if k == "role" and v), "")
            boiler = bool(role) and role.lower() in _BOILER_ROLES
        if tag == "table" and self._table_depth == 0:
            self._flush()
            self._table_depth = 1
            self._table_rows = []
            self._cell_buf = None
            self._table_boiler = self._boiler_depth > 0 or boiler
            self._stack.append("table")
            if boiler:
                self._boiler_depth += 1
                self._stack.append("\x00boiler")
            return
        if self._table_depth:
            if tag == "table":
                self._table_depth += 1
            elif tag == "tr":
                self._table_rows.append([])
            elif tag in ("td", "th"):
                self._cell_buf = []
            return
        if tag == "a":
            self._link_depth += 1
            self._stack.append(tag)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _HEADINGS:
                self._kind_stack.append("heading")
            elif tag == "li":
                self._kind_stack.append("li")
            elif tag in ("p", "blockquote", "pre", "figcaption", "dd", "dt", "address"):
                self._kind_stack.append("p")
            else:
                self._kind_stack.append("")  # transparent container
        if boiler:
            self._boiler_depth += 1
            self._stack.append("\x00boiler:" + tag)
        else:
            self._stack.append(tag)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "br" and not self._skip_depth and not self._table_depth:
            self._buf.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._table_depth:
            if tag in ("td", "th") and self._cell_buf is not None:
                cell = " ".join("".join(self._cell_buf).split())
                if not self._table_rows:
                    self._table_rows.append([])
                self._table_rows[-1].append(cell)
                self._cell_buf = None
                return
            if tag == "table":
                self._table_depth -= 1
                if self._table_depth == 0:
                    self._end_table()
                return
            if tag in ("tr", "thead", "tbody", "th"):
                return
            return
        if tag == "a":
            if self._link_depth:
                self._link_depth -= 1
            if self._stack and self._stack[-1] == "a":
                self._stack.pop()
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if self._kind_stack:
                self._kind_stack.pop()
        # unwind stack entry (tolerate malformed nesting)
        for i in range(len(self._stack) - 1, -1, -1):
            s = self._stack[i]
            if s == tag or s == "\x00boiler:" + tag:
                if s.startswith("\x00boiler"):
                    self._boiler_depth = max(0, self._boiler_depth - 1)
                del self._stack[i]
                break

    def _end_table(self) -> None:
        # pop table stack entries
        for i in range(len(self._stack) - 1, -1, -1):
            s = self._stack[i]
            if s == "\x00boiler":
                self._boiler_depth = max(0, self._boiler_depth - 1)
                del self._stack[i]
            elif s == "table":
                del self._stack[i]
                break
        rows = [r for r in self._table_rows if any(c for c in r)]
        if not rows:
            return
        ncols = max(len(r) for r in rows)
        lines = [f"[TABLE: {len(rows)}x{ncols}]"]
        for r in rows:
            padded = list(r) + [""] * (ncols - len(r))
            lines.append("| " + " | ".join(padded) + " |")
        lines.append("[TABLE END]")
        text = "\n".join(lines)
        self.blocks.append(
            _Block(
                kind="table",
                text=text,
                link_chars=0,
                total_chars=sum(_nonws_len(c) for r in rows for c in r) or 1,
                boiler=self._table_boiler,
            )
        )

    # -- text --------------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._table_depth:
            if self._cell_buf is not None:
                self._cell_buf.append(data)
            return
        self._buf.append(data)
        if self._link_depth:
            self._buf_link_chars += _nonws_len(data)

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


class _FastBail(Exception):
    """Construct outside the clean grammar — reparse with stdlib."""


_ASCII_LETTERS = frozenset(string.ascii_letters)
# bare start/end tags (no attrs) — the overwhelmingly common case;
# if these match, the slow locatestart/attrfind machinery is skipped
# and the result is identical to stdlib's parse_starttag/parse_endtag.
_SIMPLE_START = re.compile(r"<([a-zA-Z][-.a-zA-Z0-9:_]*)\s*(/?)>")
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}


def _fast_feed(p: HTMLParser, rawdata: str) -> None:
    """One-shot equivalent of HTMLParser.feed(rawdata)+close() (with
    convert_charrefs=True) for documents in the clean HTML grammar.
    Mirrors CPython 3.11 html/parser.py goahead/parse_starttag/
    parse_endtag semantics exactly on the constructs it accepts and
    raises _FastBail on anything else (bogus tags, unterminated
    comments, marked sections) so the caller can rerun the stdlib
    parser. ~2x faster: skips updatepos/line tracking, incremental
    buffering and the double-search in parse_endtag."""
    i, n = 0, len(rawdata)
    find = rawdata.find
    handle_data = p.handle_data
    while i < n:
        j = find("<", i)
        if j < 0:
            j = n
        if i < j:
            chunk = rawdata[i:j]
            if "&" in chunk:
                chunk = _unescape(chunk)
            handle_data(chunk)
        i = j
        if i == n:
            break
        c = rawdata[i + 1 : i + 2]
        if c in _ASCII_LETTERS:
            # -- start tag (parse_starttag) --
            sm = _SIMPLE_START.match(rawdata, i)
            if sm:
                tag = sm.group(1).lower()
                if sm.group(2):
                    p.handle_startendtag(tag, [])
                    i = sm.end()
                    continue
                p.handle_starttag(tag, [])
                i = sm.end()
            else:
                m = _locatestart.match(rawdata, i)
                j = m.end()
                nxt = rawdata[j : j + 1]
                if nxt == ">":
                    endpos = j + 1
                elif nxt == "/" and rawdata.startswith("/>", j):
                    endpos = j + 2
                else:
                    raise _FastBail  # bogus or EOF-truncated start tag
                tm = _tagfind.match(rawdata, i + 1)
                k = tm.end()
                tag = tm.group(1).lower()
                attrs: list[tuple[str, str | None]] = []
                while k < endpos:
                    am = _attrfind.match(rawdata, k)
                    if not am:
                        break
                    attrname, rest, attrvalue = am.group(1, 2, 3)
                    if not rest:
                        attrvalue = None
                    elif (
                        attrvalue[:1] == "'" == attrvalue[-1:]
                        or attrvalue[:1] == '"' == attrvalue[-1:]
                    ):
                        attrvalue = attrvalue[1:-1]
                    if attrvalue and "&" in attrvalue:
                        attrvalue = _unescape(attrvalue)
                    attrs.append((attrname.lower(), attrvalue))
                    k = am.end()
                end = rawdata[k:endpos].strip()
                if end == "/>":
                    p.handle_startendtag(tag, attrs)
                    i = endpos
                    continue
                if end != ">":
                    raise _FastBail  # parse_starttag junk-data path
                p.handle_starttag(tag, attrs)
                i = endpos
            if tag in ("script", "style"):  # CDATA_CONTENT_ELEMENTS
                cm = _CDATA_CLOSE[tag].search(rawdata, i)
                if cm is None:
                    return  # unclosed cdata: stdlib drops the rest
                if cm.start() > i:
                    handle_data(rawdata[i : cm.start()])  # no unescape
                p.handle_endtag(tag)
                i = cm.end()
        elif c == "/":
            # -- end tag (parse_endtag, clean branch only) --
            m = _endtagfind.match(rawdata, i)
            if not m:
                raise _FastBail  # </>, bogus end tags, EOF truncation
            p.handle_endtag(m.group(1).lower())
            i = m.end()
        elif rawdata.startswith("<!--", i):
            cm = _commentclose.search(rawdata, i + 4)
            if not cm:
                raise _FastBail  # unterminated comment
            i = cm.end()
        elif c == "?":
            g = find(">", i + 2)
            if g < 0:
                raise _FastBail
            i = g + 1
        elif c == "!":
            if rawdata.startswith("<![", i):
                raise _FastBail  # marked section
            if rawdata[i : i + 9].lower() == "<!doctype":
                g = find(">", i + 9)
            else:  # parse_bogus_comment: skip to '>'
                g = find(">", i + 2)
            if g < 0:
                raise _FastBail
            i = g + 1
        else:
            handle_data("<")  # literal '<' (goahead fallthrough + EOF tail)
            i += 1


def segment_html(html: str) -> list[_Block]:
    """Parse HTML into classified text blocks (document order)."""
    if _HAVE_PARSER_INTERNALS:
        p = _BlockParser()
        try:
            _fast_feed(p, html)
            p._flush()
            return p.blocks
        except Exception:
            pass  # _FastBail or any fast-path surprise: reparse with stdlib
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed beyond the parser's tolerance: keep whatever blocks
        # were produced (never raise — per-row error policy lives above)
        pass
    return p.blocks


def classify_block(b: _Block, cfg: PipelineConfig) -> bool:
    """True if the block is main content (rules R-container/R-link/R-short)."""
    if b.boiler or not b.text:
        return False
    if b.kind != "table":
        density = b.link_chars / b.total_chars if b.total_chars else 1.0
        if density > cfg.max_link_density:
            return False
    n = len(b.text)
    if b.kind == "heading":
        return n >= cfg.min_heading_chars
    if b.kind == "li":
        return n >= cfg.min_list_item_chars
    if b.kind == "table":
        return True
    return n >= cfg.min_paragraph_chars


def render_block(b: _Block) -> str:
    if b.kind == "li":
        return "- " + b.text
    return b.text


def extract_html(html: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> tuple[str, int]:
    """bytes-of-HTML -> (main content text, n_kept_blocks). Deterministic."""
    blocks = segment_html(html)
    kept = [render_block(b) for b in blocks if classify_block(b, cfg)]
    return "\n\n".join(kept), len(kept)


# ---------------------------------------------------------------------------
# Charset sniffing (deterministic; precedence pinned by the goldens)
# ---------------------------------------------------------------------------

# BOMs checked longest-first (UTF-32 BOMs contain the UTF-16 ones)
_BOMS: list[tuple[bytes, str]] = [
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]
_META_TAG_RE = re.compile(rb"<meta\b[^>]*>", re.I)
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?\s*([A-Za-z0-9._:\-]+)", re.I)
_SNIFF_WINDOW = 1024  # bytes; the WHATWG prescan window


def sniff_decode(payload: bytes, fallback: str = "utf-8") -> tuple[str, str]:
    """Deterministic charset sniff -> (decoded text, encoding label).

    Precedence (the WHATWG encoding-sniff order restricted to its
    deterministic prefix; Common-Crawl reality is heavily
    Shift-JIS/GBK/Latin-1, and decoding everything as UTF-8 silently
    mojibakes those pages):

      1. byte-order mark (UTF-8/16/32);
      2. ``charset=`` inside a ``<meta>`` tag within the first 1024
         bytes — covers both ``<meta charset=X>`` and
         ``<meta http-equiv=Content-Type content="...; charset=X">``;
      3. ``fallback`` (utf-8), errors="replace" — the r3 behavior.

    Unknown/bogus declared labels fall through to the fallback; all
    decodes use errors="replace" so the function never raises on any
    byte payload.
    """
    for bom, enc in _BOMS:
        if payload.startswith(bom):
            return payload[len(bom):].decode(enc, errors="replace"), enc
    head = payload[:_SNIFF_WINDOW]
    for tag in _META_TAG_RE.finditer(head):
        m = _CHARSET_RE.search(tag.group(0))
        if not m:
            continue
        label = m.group(1).decode("ascii", errors="replace").strip().lower()
        try:
            return payload.decode(label, errors="replace"), label
        except LookupError:
            break  # bogus label: the WHATWG path would fall back too
    return payload.decode(fallback, errors="replace"), fallback
