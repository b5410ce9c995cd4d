"""Unit tests for the HTML boilerplate-strip path (rules R-container,
R-link, R-short, R-table — see functions/html_extract.py docstring)."""

from pdf_extractor_ray.config import DEFAULT_CONFIG
from pdf_extractor_ray.functions.html_extract import extract_html

LONG = "This paragraph is long enough to clear the minimum character threshold easily."


def test_keeps_main_paragraph_drops_nav():
    html = f'<body><nav><a href="/">Home</a> <a href="/a">About</a></nav><p>{LONG}</p></body>'
    text, n = extract_html(html)
    assert text == LONG
    assert n == 1


def test_container_rule_header_footer_aside():
    html = (
        f"<body><header><h1>Site</h1></header><main><p>{LONG}</p></main>"
        f"<aside><p>{LONG}</p></aside><footer><p>{LONG}</p></footer></body>"
    )
    text, n = extract_html(html)
    assert text == LONG
    assert n == 1


def test_role_attribute_marks_boilerplate():
    html = f'<body><div role="navigation"><p>{LONG}</p></div><p>{LONG}</p></body>'
    text, n = extract_html(html)
    assert n == 1


def test_link_density_rule():
    linky = '<p>Read <a href="/1">this link text which dominates the paragraph</a> ok</p>'
    html = f"<body>{linky}<p>{LONG}</p></body>"
    text, n = extract_html(html)
    assert text == LONG


def test_short_paragraph_dropped_heading_kept():
    html = f"<body><h2>Title</h2><p>too short</p><p>{LONG}</p></body>"
    text, n = extract_html(html)
    assert text == "Title\n\n" + LONG
    assert n == 2


def test_list_items_rendered_with_dash():
    html = "<body><ul><li>first long item text</li><li>second long item text</li><li>x</li></ul></body>"
    text, n = extract_html(html)
    assert text == "- first long item text\n\n- second long item text"
    assert n == 2


def test_table_pipe_rendering():
    html = "<body><table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table></body>"
    text, n = extract_html(html)
    assert text == "[TABLE: 2x2]\n| a | b |\n| c | d |\n[TABLE END]"


def test_table_in_footer_dropped():
    html = "<body><footer><table><tr><td>a</td></tr></table></footer></body>"
    text, n = extract_html(html)
    assert text == ""
    assert n == 0


def test_script_style_never_emitted():
    html = f"<body><script>var x = 'this is not content at all here';</script><p>{LONG}</p></body>"
    text, _ = extract_html(html)
    assert text == LONG


def test_whitespace_collapsed_and_br_is_space():
    html = "<body><p>line   one<br>line\n\ntwo continues with enough characters here</p></body>"
    text, _ = extract_html(html)
    assert text == "line one line two continues with enough characters here"


def test_empty_and_malformed_inputs():
    assert extract_html("") == ("", 0)
    text, n = extract_html("<p unclosed" + LONG)
    assert isinstance(text, str)


def test_determinism():
    html = f"<body><main><h1>T</h1><p>{LONG}</p></main></body>"
    assert extract_html(html) == extract_html(html)
    assert extract_html(html, DEFAULT_CONFIG)[0].encode() == extract_html(html)[0].encode()


# ---------------------------------------------------------------------------
# Differential: _fast_feed must reproduce the stdlib HTMLParser path
# byte-for-byte (or bail, in which case segment_html reparses with
# stdlib). The property below drives both paths explicitly.
# ---------------------------------------------------------------------------

import hypothesis.strategies as st
from hypothesis import given, settings

from pdf_extractor_ray.functions.html_extract import (
    _BlockParser,
    _FastBail,
    _fast_feed,
)


def _stdlib_blocks(html: str):
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return [(b.kind, b.text, b.link_chars, b.total_chars, b.boiler) for b in p.blocks]


def _fast_blocks(html: str):
    p = _BlockParser()
    _fast_feed(p, html)
    p._flush()
    return [(b.kind, b.text, b.link_chars, b.total_chars, b.boiler) for b in p.blocks]


_HTML_ATOMS = st.sampled_from(
    [
        "<p>", "</p>", "<div>", "</div>", "<li>", "</li>", "<ul>", "</ul>",
        "<nav>", "</nav>", "<a href=\"/x\">", "<a href='y&amp;z'>", "</a>",
        "<h1>", "</h1>", "<br>", "<br/>", "<hr>", "<span role=\"navigation\">",
        "</span>", "<table>", "<tr>", "<td>", "</td>", "</tr>", "</table>",
        "<script>", "var x = '<p>not content</p>';", "</script>",
        "<style>", "p { color: red }", "</style>",
        "<!-- a comment <p>hidden</p> -->", "<!DOCTYPE html>", "<?php echo 1 ?>",
        "<![CDATA[raw]]>", "<p unclosed", "< notatag", "<3", "</>", "</ p>",
        "<p class=x>", "<p class = \"y\" id=z>", "<img src=a.png/>",
        "text with words ", "longer run of body text that clears thresholds ",
        "&amp; &lt;escaped&gt; ", "&#65;&#x42; ", "&incomplete ", "&",
        "Japanese 日本語テキスト ", "\n  \t ", "trailing<",
    ]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_HTML_ATOMS, min_size=0, max_size=30).map("".join))
def test_fast_feed_differential(html):
    try:
        fast = _fast_blocks(html)
    except _FastBail:
        return  # bail path: segment_html reruns stdlib — always correct
    assert fast == _stdlib_blocks(html)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>/!?&;abp= \"'-.\n", max_size=80))
def test_fast_feed_differential_noise(html):
    try:
        fast = _fast_blocks(html)
    except _FastBail:
        return
    assert fast == _stdlib_blocks(html)


def test_segment_html_matches_stdlib_on_goldens_fallback():
    # any exception inside the fast path must not lose the document
    from pdf_extractor_ray.functions.html_extract import segment_html

    html = "<body><p>" + "x" * 100 + "<![CDATA[boom]]></p></body>"
    blocks = segment_html(html)
    assert blocks  # parsed via stdlib fallback


# ---------------------------------------------------------------------------
# Charset sniffing (VERDICT r3 #2)
# ---------------------------------------------------------------------------


def test_sniff_decode_precedence():
    from pdf_extractor_ray.functions.html_extract import sniff_decode

    # 1. BOM wins (even over a contradicting meta)
    payload = b"\xff\xfe" + '<meta charset="shift_jis"><p>hi</p>'.encode("utf-16-le")
    text, enc = sniff_decode(payload)
    assert enc == "utf-16-le" and "<p>hi</p>" in text

    # 2. meta charset= (both syntaxes) within the first 1024 bytes
    sj = '<html><meta charset="shift_jis"><body><p>日本語テスト、混在文。</p></body></html>'
    text, enc = sniff_decode(sj.encode("shift_jis"))
    assert enc == "shift_jis" and text == sj
    l1 = ('<html><meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">'
          "<body><p>café naïve über</p></body></html>")
    text, enc = sniff_decode(l1.encode("latin-1"))
    assert enc == "iso-8859-1" and text == l1

    # meta beyond the 1024-byte prescan window is ignored
    far = b"<html>" + b" " * 1100 + b'<meta charset="shift_jis">rest'
    _, enc = sniff_decode(far)
    assert enc == "utf-8"

    # 3. fallback: plain and bogus-label payloads decode utf-8-replace
    assert sniff_decode(b"<p>plain</p>") == ("<p>plain</p>", "utf-8")
    _, enc = sniff_decode(b'<meta charset="no-such-encoding"><p>x</p>')
    assert enc == "utf-8"
    # never raises on arbitrary bytes
    text, enc = sniff_decode(bytes(range(256)))
    assert enc == "utf-8" and isinstance(text, str)


def test_charset_variants_extract_identically():
    """The same document in UTF-8 / Shift-JIS / Latin-1 / UTF-16 (with
    correct in-band declarations) must extract BYTE-IDENTICAL text —
    without the sniff, the legacy encodings mojibake."""
    from pdf_extractor_ray.stages.extractor import Extractor

    src = ("<html><body><main><h1>Überschrift für café</h1>"
           "<p>Ein ausführlicher Absatz mit genug Zeichen für die Schwelle, "
           "damit der Block behalten wird: naïve première.</p></main></body></html>")
    ja = ("<html><body><main><h1>日本語の見出しテスト</h1>"
          "<p>これは十分な長さを持つ本文の段落です。ボイラープレート除去の後も保持されます。</p></main></body></html>")
    ex = Extractor()
    want = ex.extract_one(src.encode("utf-8"))["text"]
    got_l1 = ex.extract_one(
        src.replace("<html>", '<html><meta http-equiv="Content-Type" '
                    'content="text/html; charset=ISO-8859-1">', 1).encode("latin-1")
    )["text"]
    got_u16 = ex.extract_one(b"\xff\xfe" + src.encode("utf-16-le"))["text"]
    assert got_l1 == want and got_u16 == want

    want_ja = ex.extract_one(ja.encode("utf-8"))["text"]
    got_sj = ex.extract_one(
        ja.replace("<html>", '<html><meta charset="shift_jis">', 1).encode("shift_jis")
    )["text"]
    assert got_sj == want_ja and "日本語の見出しテスト" in got_sj

    # the sniff is config-gated: OFF reproduces the r3 utf-8-replace path
    from pdf_extractor_ray.config import DEFAULT_CONFIG

    off = Extractor(DEFAULT_CONFIG.with_overrides(charset_sniff=False))
    assert "日本語の見出しテスト" not in off.extract_one(
        ja.replace("<html>", '<html><meta charset="shift_jis">', 1).encode("shift_jis")
    )["text"]


def test_generator_emits_charset_variant_rows():
    """The corpus carries Shift-JIS / Latin-1 / UTF-16 HTML payloads
    (every 6th HTML doc) that extract byte-identically to their
    goldens."""
    from pdf_extractor_ray.fixtures.generator import generate_corpus
    from pdf_extractor_ray.stages.extractor import Extractor

    pages_t, golden_t = generate_corpus(240)
    gmap = dict(zip(golden_t["url"].to_pylist(), golden_t["golden_text"].to_pylist()))
    ex = Extractor()
    n_sj = n_l1 = n_u16 = 0
    for url, payload in zip(pages_t["url"].to_pylist(), pages_t["html"].to_pylist()):
        if url not in gmap or not payload or payload.startswith(b"%PDF"):
            continue
        if payload.startswith(b"\xff\xfe"):
            n_u16 += 1
        elif b'charset="shift_jis"' in payload[:128]:
            n_sj += 1
        elif b"ISO-8859-1" in payload[:128]:
            n_l1 += 1
        else:
            continue
        r = ex.extract_one(payload)
        assert r["text"] == gmap[url], url
    assert n_sj >= 1 and n_l1 >= 1 and n_u16 >= 1, (n_sj, n_l1, n_u16)
