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
