"""Output formatting markers and their inverses (reference
output_formatter.py:49-163 emits `[DOCUMENT FILENAME: ...]` headers
and `--- PAGE n START/END ---` markers; :330-385 provides the inverse
projections split_by_pages / remove_markers). Deterministic, pure
string functions; the formatted form is an optional presentation
layer — the engine's canonical output stays the raw extracted text
(byte-identity contract)."""

from __future__ import annotations

import re

_HEADER_TMPL = "[DOCUMENT URL: {url}]"
_PAGE_START_TMPL = "--- PAGE {n} START ---"
_PAGE_END_TMPL = "--- PAGE {n} END ---"

_HEADER_RE = re.compile(r"^\[DOCUMENT URL: (.*?)\]\n?", re.MULTILINE)
_PAGE_START_RE = re.compile(r"^--- PAGE (\d+) START ---\n?", re.MULTILINE)
_PAGE_END_RE = re.compile(r"^--- PAGE (\d+) END ---\n?", re.MULTILINE)


def format_document(url: str, page_texts: list[str]) -> str:
    """Assemble the marked-up presentation form: document header +
    per-page START/END markers (pages are 1-indexed)."""
    parts = [_HEADER_TMPL.format(url=url)]
    for i, t in enumerate(page_texts, start=1):
        parts.append(_PAGE_START_TMPL.format(n=i))
        if t:
            parts.append(t)
        parts.append(_PAGE_END_TMPL.format(n=i))
    return "\n".join(parts)


def split_by_pages(formatted: str) -> list[str]:
    """Inverse of format_document for the page bodies: returns the
    per-page texts in order (reference output_formatter.py:330-351)."""
    out: list[str] = []
    for m in _PAGE_START_RE.finditer(formatted):
        n = m.group(1)
        end = re.search(rf"^--- PAGE {n} END ---", formatted[m.end() :], re.MULTILINE)
        body = formatted[m.end() : m.end() + end.start()] if end else formatted[m.end() :]
        out.append(body.rstrip("\n"))
    return out


def remove_markers(formatted: str) -> str:
    """Strip all markers -> clean text (output_formatter.py:352-385)."""
    s = _HEADER_RE.sub("", formatted)
    s = _PAGE_START_RE.sub("", s)
    s = _PAGE_END_RE.sub("", s)
    return s.strip("\n")


def parse_header_url(formatted: str) -> str | None:
    m = _HEADER_RE.search(formatted)
    return m.group(1) if m else None
