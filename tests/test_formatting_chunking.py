"""Tests for output-format markers (M20/M21 + inverses), document
chunking (context-windows analog), and the opt-in remediation loop."""

import pandas as pd
import pytest


def test_format_document_roundtrip():
    from pdf_extractor_ray.functions.formatting import (
        format_document,
        parse_header_url,
        remove_markers,
        split_by_pages,
    )

    pages = ["First page text.\nwith two lines", "", "Third page."]
    f = format_document("https://x.example/doc", pages)
    assert f.startswith("[DOCUMENT URL: https://x.example/doc]")
    assert "--- PAGE 1 START ---" in f and "--- PAGE 3 END ---" in f
    assert parse_header_url(f) == "https://x.example/doc"
    assert split_by_pages(f) == pages
    clean = remove_markers(f)
    assert "PAGE" not in clean and "DOCUMENT URL" not in clean
    assert "First page text." in clean and "Third page." in clean


def test_chunk_text_roundtrip():
    from pdf_extractor_ray.ops.chunking import chunk_text, dechunk_texts

    text = "abcdefghij" * 100  # 1000 chars
    chunks = chunk_text(text, max_chars=300, overlap=50)
    assert all(len(c) <= 300 for c in chunks)
    # consecutive chunks share the overlap
    for a, b in zip(chunks, chunks[1:]):
        assert a[-50:] == b[:50]
    assert dechunk_texts(chunks, overlap=50) == text
    assert chunk_text("short", 300, 50) == ["short"]
    with pytest.raises(ValueError):
        chunk_text(text, max_chars=50, overlap=50)


def test_chunk_text_by_words():
    from pdf_extractor_ray.ops.chunking import chunk_text_by_words

    text = " ".join(f"w{i}" for i in range(100))
    chunks = chunk_text_by_words(text, max_words=30, overlap_words=5)
    assert all(len(c.split()) <= 30 for c in chunks)
    for a, b in zip(chunks, chunks[1:]):
        assert a.split()[-5:] == b.split()[:5]
    # reassembled words (minus overlaps) equal the original token stream
    rebuilt = chunks[0].split()
    for c in chunks[1:]:
        rebuilt.extend(c.split()[5:])
    assert rebuilt == text.split()
    assert chunk_text_by_words("a b", 30, 5) == ["a b"]
    with pytest.raises(ValueError):
        chunk_text_by_words(text, 5, 5)


def test_chunk_documents(ray_session):
    import ray.data

    from pdf_extractor_ray.ops.chunking import chunk_documents

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["x" * 5000, "tiny"]})
    out = chunk_documents(ray.data.from_pandas(df), max_chars=2000, overlap=200).to_pandas()
    d1 = out[out["doc_id"] == 1].sort_values("chunk_index")
    # range(0, 5000-200, 1800) -> starts 0,1800,3600 -> 3 chunks
    assert d1["chunk_index"].tolist() == [0, 1, 2]
    assert d1["n_chunk_chars"].tolist() == [2000, 2000, 1400]
    assert out[out["doc_id"] == 2]["n_chunk_chars"].tolist() == [4]


def test_remediation_loop_improves_low_quality(ray_session):
    """A doc whose paragraphs all fall under min_paragraph_chars
    scores 0 normally; the remediation variant with
    min_paragraph_chars=10 recovers the text."""
    import ray.data

    from pdf_extractor_ray.config import DEFAULT_CONFIG
    from pdf_extractor_ray.stages.extractor import Extractor
    import pyarrow as pa

    html = ("<p>short para here</p>" * 30).encode()  # 17 chars each: filtered by default
    tbl = pa.table(
        {
            "url": pa.array(["https://r.example/1"], pa.string()),
            "warc_ts": pa.array([pd.Timestamp("2024-01-01")], pa.timestamp("us")),
            "html": pa.array([html], pa.binary()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    plain = Extractor(DEFAULT_CONFIG)(tbl).to_pandas().iloc[0]
    remed = Extractor(DEFAULT_CONFIG.with_overrides(enable_remediation=True))(tbl).to_pandas().iloc[0]
    assert plain["n_words"] == 0
    assert remed["n_words"] == 90  # 30 paras x 3 words recovered
    assert remed["quality_score"] > plain["quality_score"]
    # default path is unchanged when remediation is off (byte contract)
    plain2 = Extractor(DEFAULT_CONFIG)(tbl).to_pandas().iloc[0]
    assert plain2["extracted_text"] == plain["extracted_text"]


def test_chunk_text_by_sections():
    from pdf_extractor_ray.ops.chunking import chunk_text_by_sections, find_section_boundaries

    text = "intro text\n1. first section body\nmore body\n2. second section body\n# md header\ntail"
    bounds = find_section_boundaries(text)
    assert len(bounds) == 3  # "1.", "2.", "#"
    # large budget: everything in one chunk
    assert chunk_text_by_sections(text, max_chars=10_000) == [text]
    # tiny budget: breaks only at section boundaries
    chunks = chunk_text_by_sections(text, max_chars=40)
    assert "".join(chunks) == text
    assert all(c.startswith(("intro", "1.", "2.", "#")) for c in chunks)
    # no boundaries -> character-chunk fallback
    plain = "x" * 100
    assert chunk_text_by_sections(plain, max_chars=40, overlap=0) == ["x" * 40, "x" * 40, "x" * 20]


def test_chunk_pages():
    from pdf_extractor_ray.ops.chunking import chunk_pages

    pages = [f"page {i} content" * 10 for i in range(10)]  # ~150 chars each
    chunks = chunk_pages(pages, max_chars=400)
    assert "\n\n".join(chunks).replace("\n\n", "") == "".join(pages)
    assert len(chunks) == 5  # 2 pages per chunk at ~150 chars/page
    assert chunk_pages([], 100) == []


def test_flags_from_batch_deterministic_ids():
    import pandas as pd

    from pdf_extractor_ray.ops.flags import flags_from_batch

    rows = pd.DataFrame(
        [
            {  # clean doc: no flags
                "url": "u1", "error": None, "quality_confidence": 0.95,
                "footnote_status": "COMPLETE", "coverage_status": "GOOD",
                "n_hallu_flags": 0, "n_overlapping_words": 0,
            },
            {  # low confidence + poor coverage + footnote mismatch
                "url": "u2", "error": None, "quality_confidence": 0.4,
                "footnote_status": "POOR", "footnote_match_rate": 50.0,
                "coverage_status": "POOR", "coverage_pct": 40.0,
                "n_hallu_flags": 0, "n_overlapping_words": 2,
            },
            {"url": "u3", "error": "boom", "quality_confidence": 0.3},
        ]
    )
    out = flags_from_batch(rows)
    assert set(out["url"]) == {"u2", "u3"}
    u2 = out[out["url"] == "u2"]
    assert set(u2["flag_type"]) == {"low_confidence", "footnote_mismatch", "missing_content", "layout_issue"}
    assert (u2[u2["flag_type"] == "low_confidence"]["severity"] == "high").all()
    u3 = out[out["url"] == "u3"]
    assert u3["flag_type"].tolist() == ["manual_review"] and u3["severity"].tolist() == ["critical"]
    # ids deterministic across calls, unique within the batch
    out2 = flags_from_batch(rows)
    assert out["flag_id"].tolist() == out2["flag_id"].tolist()
    assert out["flag_id"].is_unique


def test_chunk_documents_by_pages(ray_session):
    """by='pages' splits on the page delimiter and packs whole pages
    to ~max_chars per chunk; no delimiter -> one chunk."""
    import ray.data

    from pdf_extractor_ray.ops.chunking import chunk_documents

    pages = [f"page {i} " + "x" * 90 for i in range(6)]  # ~100 chars each
    df = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["\f".join(pages), "no delimiter here"]}
    )
    out = (
        chunk_documents(ray.data.from_pandas(df), max_chars=200, overlap=0, by="pages")
        .to_pandas()
        .sort_values(["doc_id", "chunk_index"])
        .reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    assert len(d0) == 3  # 2 pages per chunk at ~100 chars/page
    assert d0.chunk_text.iloc[0].startswith("page 0") and "page 1" in d0.chunk_text.iloc[0]
    assert "\f" not in d0.chunk_text.iloc[0]  # pages re-joined with blank line
    assert out[out.doc_id == 1].chunk_text.tolist() == ["no delimiter here"]


def test_stitch_candidates_recovers_chunk_adjacency(ray_session):
    import pandas as pd
    import ray.data

    from pdf_extractor_ray.ops.chunking import chunk_text, stitch_candidates

    import hashlib

    # non-periodic text (a periodic string genuinely stitches its own
    # ends — correct but not what this test pins)
    text = "".join(
        chr(97 + hashlib.md5(str(i).encode()).digest()[0] % 26) for i in range(1500)
    )
    chunks = chunk_text(text, 600, 200)  # 4 chunks, 200-char overlaps
    rows = [{"chunk_id": 10 + i, "chunk_text": c} for i, c in enumerate(chunks)]
    rows.append({"chunk_id": 99, "chunk_text": "x" * 50})  # below window: emits nothing
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
    got = stitch_candidates(ds, window_chars=200, num_partitions=4).to_pandas()
    got = got.sort_values(["left_id", "right_id"]).reset_index(drop=True)
    want = [(10 + i, 11 + i) for i in range(len(chunks) - 1)]
    assert list(map(tuple, got.to_numpy())) == want
