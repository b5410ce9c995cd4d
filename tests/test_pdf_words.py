"""Unit tests for the PDF word-geometry operators (reference semantics
from extractor.py — see SURVEY.md §2.2 M2-M17, §2.4 J1)."""

from pdf_extractor_ray.config import DEFAULT_CONFIG
from pdf_extractor_ray.functions.pdf_words import (
    Patterns,
    cleanup_text,
    detect_columns,
    detect_repeating_elements,
    exclude_table_words,
    extract_column_text,
    extract_pdf_pages,
    filter_metadata,
    format_table,
    integrate_scripts,
    is_japanese_char,
    match_footnotes,
)

PATS = Patterns()


def w(text, x0, top, size=10.0, width=None):
    width = width if width is not None else 6.0 * len(text)
    return {
        "text": text,
        "x0": x0,
        "x1": x0 + width,
        "top": top,
        "bottom": top + 12.0,
        "size": size,
        "fontname": "F0",
    }


def page(words, tables=None, width=612.0, height=792.0):
    return {"width": width, "height": height, "words": words, "tables": tables or []}


# ---- M2 header/footer detection -------------------------------------


def test_repeating_header_detected_at_80pct():
    pages = [page([w("ACME", 72, 20), w("body", 72, 300)]) for _ in range(5)]
    pages[4]["words"][0] = w("OTHER", 72, 20)  # 4/5 = 80% still qualifies
    headers, footers = detect_repeating_elements(pages)
    assert "ACME" in headers and "OTHER" not in headers and not footers


def test_non_repeating_not_detected():
    pages = [page([w(f"h{i}", 72, 20)]) for i in range(5)]
    headers, _ = detect_repeating_elements(pages)
    assert not headers


# ---- M9/M10/M11 columns, reading order, spacing ---------------------


def test_column_split_on_gap():
    words = [w("left", 72, 100), w("right", 400, 100)]  # gap 400-96=304 > 50
    cols = detect_columns(words)
    assert len(cols) == 2
    assert cols[0][0]["text"] == "left" and cols[1][0]["text"] == "right"


def test_no_column_split_below_threshold():
    words = [w("a", 72, 100), w("b", 110, 100)]
    assert len(detect_columns(words)) == 1


def test_reading_order_and_latin_spacing():
    words = [w("world", 110, 100), w("hello", 72, 100), w("second", 72, 120)]
    # hello(x1=102) world(x0=110): gap 8 > 3 -> space; new line at top 120
    text = extract_column_text(words)
    assert text == "hello world\nsecond"


def test_japanese_no_space_small_gap():
    a = w("日本", 72, 100, width=22)
    b = {**w("語", 96, 100, width=11)}
    assert extract_column_text([a, b]) == "日本語"


def test_japanese_space_on_wide_gap():
    a = w("日本", 72, 100, width=22)
    b = w("語", 120, 100, width=11)  # gap 120-94=26 > 10
    assert extract_column_text([a, b]) == "日本 語"


def test_punctuation_no_space():
    a = w("end", 72, 100)
    b = w(",", 95, 100, width=3)  # gap 5 > 3 but ',' never takes a space
    assert extract_column_text([a, b]) == "end,"


def test_is_japanese_char():
    assert is_japanese_char("日") and is_japanese_char("カ") and is_japanese_char("ひ")
    assert not is_japanese_char("A") and not is_japanese_char("1")


# ---- M4-M8 metadata filter -----------------------------------------


def _filter(words, **kw):
    return [
        x["text"]
        for x in filter_metadata(words, 612.0, 792.0, kw.get("headers", frozenset()), kw.get("footers", frozenset()), PATS)
    ]


def test_isolated_page_number_dropped():
    words = [w("-3-", 290, 768), w("content", 72, 300)]
    assert _filter(words) == ["content"]


def test_page_number_with_nearby_content_kept():
    words = [w("5", 290, 768), w("of", 300, 770), w("many", 320, 770)]
    kept = _filter(words)
    assert "5" in kept  # context-aware rule R5


def test_section_number_kept_in_margin():
    words = [w("1.2", 72, 20), w("body", 72, 300)]
    assert _filter(words) == ["1.2", "body"]


def test_repeated_header_dropped_only_in_zone():
    words = [w("ACME", 72, 20), w("ACME", 72, 300)]
    kept = _filter(words, headers=frozenset({"ACME"}))
    assert kept == ["ACME"]  # mid-page occurrence survives


def test_footnote_marker_kept():
    words = [w("*1", 500, 20), w("※2", 72, 770)]
    assert _filter(words) == ["*1", "※2"]


# ---- M13 script integration ----------------------------------------


def test_superscript_attach():
    base = w("mc", 100, 200)
    sup = w("2", 113, 196, size=6.0, width=4)  # x0 = base.x1+1, raised
    sup["bottom"] = 204.0  # small glyph: bottom above the base midline (206)
    filler = [w(f"t{i}", 72, 300 + 20 * i) for i in range(8)]
    out = integrate_scripts([base, sup] + filler)
    texts = {x["text"] for x in out}
    assert "mc²" in texts and "2" not in texts


def test_subscript_attach():
    base = w("H", 100, 200)
    sub = w("2", 107, 206, size=6.0, width=4)  # lowered
    filler = [w(f"t{i}", 72, 300 + 20 * i) for i in range(8)]
    out = integrate_scripts([base, sub] + filler)
    assert any(x["text"] == "H₂" for x in out)


def test_far_small_word_not_attached():
    base = w("word", 100, 200)
    small = w("9", 400, 196, size=6.0, width=4)
    filler = [w(f"t{i}", 72, 300 + 20 * i) for i in range(8)]
    out = integrate_scripts([base, small] + filler)
    assert any(x["text"] == "9" for x in out)


# ---- M15/M16 tables -------------------------------------------------


def test_table_word_exclusion():
    tbl = {"bbox": [100.0, 100.0, 300.0, 200.0], "rows": 1, "cols": 1, "cells": [["x"]]}
    inside = w("in", 150, 150)
    outside = w("out", 400, 150)
    kept = exclude_table_words([inside, outside], [tbl])
    assert [x["text"] for x in kept] == ["out"]


def test_format_table():
    tbl = {"bbox": [0, 0, 1, 1], "rows": 2, "cols": 2, "cells": [["a", "b"], ["c", "d"]]}
    assert format_table(tbl) == "[TABLE: 2x2]\n| a | b |\n| c | d |\n[TABLE END]"


# ---- J1 footnotes ---------------------------------------------------


def test_footnote_match_same_page():
    body = w("*1", 200, 100)
    d = w("*1:", 72, 700)
    dt = w("definition", 100, 700)
    pages = [page([body, d, dt])]
    matches = match_footnotes(pages, PATS)
    assert len(matches) == 1
    m = matches[0]
    assert m["marker"] == "*1" and m["text"] == "definition" and m["confidence"] == 1.0


def test_footnote_unmatched_marker():
    pages = [page([w("*7", 200, 100)])]
    assert match_footnotes(pages, PATS) == []


# ---- M17 cleanup + doc driver ---------------------------------------


def test_cleanup_squeezes_blank_runs():
    assert cleanup_text("a\n\n\n\nb") == "a\n\nb"
    assert cleanup_text("a   \nb") == "a\nb"


def test_extract_pdf_pages_end_to_end():
    pages = [
        page([w("Title", 72, 100), w("text", 110, 100), w("-1-", 290, 768)]),
        page([w("More", 72, 100), w("-2-", 290, 768)]),
    ]
    res = extract_pdf_pages(pages)
    assert res["text"] == "Title text\n\nMore"
    assert res["n_pages"] == 2
    assert res["n_words"] == 3


def test_textbox_regions_extracted_separately():
    """J3: words inside a textbox rect leave the main flow and come
    back as a [BOX] section after tables (layout_analyzer.py:509-532,
    master_extractor.py:364-390)."""
    from pdf_extractor_ray.functions.pdf_words import extract_pdf_pages

    def w(text, x0, top, size=12.0):
        return {
            "text": text, "x0": x0, "x1": x0 + 8.0 * len(text),
            "top": top, "bottom": top + size, "size": size, "fontname": "F",
            "height": size,
        }

    page = {
        "width": 600.0,
        "height": 800.0,
        "words": [
            w("Main", 50, 300), w("body", 100, 300), w("flows", 150, 300),
            w("Sidebar", 460, 300), w("note", 460, 320),
        ],
        "tables": [],
        "boxes": [[450.0, 290.0, 590.0, 340.0]],
    }
    res = extract_pdf_pages([page])
    assert "Main body flows" in res["text"]
    assert "[BOX]" in res["text"] and "[BOX END]" in res["text"]
    box_part = res["text"].split("[BOX]")[1]
    assert "Sidebar" in box_part and "note" in box_part
    # main flow must not contain the sidebar words before the box marker
    main_part = res["text"].split("[BOX]")[0]
    assert "Sidebar" not in main_part

    # no boxes key -> byte-identical to the old path
    page2 = {k: v for k, v in page.items() if k != "boxes"}
    res2 = extract_pdf_pages([page2])
    assert "Sidebar" in res2["text"].split("\n")[0] or "Sidebar" in res2["text"]


def test_rotated_word_metric():
    """M19: rotated words (upright=False) are counted, never removed
    or transformed (error_handler.py:488-507 tags only)."""
    from pdf_extractor_ray.functions.pdf_words import extract_pdf_pages

    page = {
        "width": 600.0,
        "height": 800.0,
        "words": [
            {"text": "Normal", "x0": 50.0, "x1": 100.0, "top": 300.0, "bottom": 312.0,
             "size": 12.0, "fontname": "F", "height": 12.0},
            {"text": "Rotated", "x0": 150.0, "x1": 200.0, "top": 300.0, "bottom": 312.0,
             "size": 12.0, "fontname": "F", "height": 12.0, "upright": False},
        ],
        "tables": [],
    }
    res = extract_pdf_pages([page])
    assert res["n_rotated_words"] == 1
    assert "Rotated" in res["text"]  # tagged, not dropped
