"""Property-based tests (hypothesis) for operator invariants that
example-based tests can't sweep: chunking round-trips, hash/signature
determinism and bounds, sessionization conservation, and extractor
crash-freedom + determinism on arbitrary input bytes."""

import hypothesis.strategies as st
import pandas as pd
from hypothesis import HealthCheck, given, settings

_TEXT = st.text(min_size=0, max_size=400)


@settings(max_examples=60, suppress_health_check=[HealthCheck.too_slow], deadline=None)
@given(text=_TEXT, max_chars=st.integers(50, 300), overlap=st.integers(0, 49))
def test_chunk_roundtrip_property(text, max_chars, overlap):
    from pdf_extractor_ray.ops.chunking import chunk_text, dechunk_texts

    chunks = chunk_text(text, max_chars, overlap)
    assert all(len(c) <= max_chars for c in chunks)
    assert dechunk_texts(chunks, overlap) == text


@settings(max_examples=60, deadline=None)
@given(a=_TEXT, b=_TEXT)
def test_jaccard_bounds_and_symmetry(a, b):
    from pdf_extractor_ray.ops.dedup import jaccard, ngram_jaccard

    for fn in (jaccard, ngram_jaccard):
        s = fn(a, b)
        assert 0.0 <= s <= 1.0
        assert fn(b, a) == s
        assert fn(a, a) == 1.0


@settings(max_examples=40, deadline=None)
@given(text=_TEXT)
def test_signatures_deterministic(text):
    from pdf_extractor_ray.ops.dedup import MinHasher, SimHasher

    m = MinHasher(num_perm=16)
    assert (m.signature(text) == MinHasher(num_perm=16).signature(text)).all()
    assert SimHasher().simhash(text) == SimHasher().simhash(text)


@settings(max_examples=40, deadline=None)
@given(payload=st.binary(min_size=0, max_size=2000))
def test_extractor_never_raises_and_is_deterministic(payload):
    """The per-row contract: any byte payload either extracts or lands
    in the error column — extract_one may raise (the batch wrapper
    catches), but must never hang, and must be deterministic."""
    from pdf_extractor_ray.config import DEFAULT_CONFIG
    from pdf_extractor_ray.stages.extractor import Extractor

    e = Extractor(DEFAULT_CONFIG)

    def attempt():
        try:
            r = e.extract_one(payload)
            return ("ok", r["kind"], r["text"])
        except Exception as exc:
            return ("err", type(exc).__name__, str(exc)[:100])

    assert attempt() == attempt()


@settings(max_examples=30, deadline=None)
@given(html=st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=1500))
def test_html_extract_total_on_arbitrary_text(html):
    """extract_html must be total (no exception) on arbitrary unicode
    'HTML' — malformed markup is the common case in a web crawl."""
    from pdf_extractor_ray.config import DEFAULT_CONFIG
    from pdf_extractor_ray.functions.html_extract import extract_html

    text, n_blocks = extract_html(html, DEFAULT_CONFIG)
    assert isinstance(text, str) and n_blocks >= 0
    t2, n2 = extract_html(html, DEFAULT_CONFIG)
    assert t2 == text and n2 == n_blocks


@settings(max_examples=25, deadline=None)
@given(
    ts_offsets=st.lists(st.integers(0, 10_000), min_size=1, max_size=60),
    users=st.lists(st.integers(1, 4), min_size=1, max_size=60),
    gap=st.integers(1, 120),
)
def test_sessionize_conserves_events(ray_session, ts_offsets, users, gap):
    import ray.data

    from pdf_extractor_ray.ops.windows import sessionize

    n = min(len(ts_offsets), len(users))
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": users[:n],
            "ts": [base + pd.Timedelta(seconds=o) for o in ts_offsets[:n]],
            "event_id": range(n),
        }
    )
    out = sessionize(ray.data.from_pandas(df), gap_minutes=float(gap)).to_pandas()
    # every event lands in exactly one session; session bounds ordered
    assert int(out["n_events"].sum()) == n
    assert (out["session_end"] >= out["session_start"]).all()
    assert set(out["user_id"]) == set(users[:n])


@settings(max_examples=60, deadline=None)
@given(texts=st.lists(st.text(min_size=0, max_size=200), min_size=1, max_size=6))
def test_redact_idempotent_and_counts_match_re(texts):
    """Scrubbing is idempotent (a second pass finds nothing) and the
    vectorized pandas path equals sequential re semantics."""
    import re

    from pdf_extractor_ray.ops.scrub import PII_PATTERNS, redact_series

    s = pd.Series(texts)
    scrubbed, counts = redact_series(s)
    # reference: plain-re sequential application per string
    for t, got_s, got_n in zip(texts, scrubbed, counts):
        ref, n = str(t), 0
        for _name, rex, repl in PII_PATTERNS:
            n += len(re.findall(rex, ref))
            ref = re.sub(rex, repl, ref)
        assert got_s == ref and got_n == n
    again_s, again_n = redact_series(scrubbed)
    assert (again_n == 0).all()
    assert list(again_s) == list(scrubbed)


@settings(max_examples=60, deadline=None)
@given(
    texts=st.lists(st.text(min_size=0, max_size=120), min_size=1, max_size=8),
    phrase=st.text(min_size=1, max_size=10),
)
def test_decontaminate_sound_and_idempotent(texts, phrase):
    """Kept rows never contain a blocklisted phrase; a second pass
    keeps everything (pure-pandas mask, mirrored from the operator)."""
    s = pd.Series(texts).astype(str)
    kept = s[~s.str.contains(phrase, regex=False)]
    assert not kept.str.contains(phrase, regex=False).any()
    again = kept[~kept.str.contains(phrase, regex=False)]
    assert list(again) == list(kept)
