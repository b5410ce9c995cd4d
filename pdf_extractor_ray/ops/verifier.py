"""Extraction-verification actor pool (reference ST3:
llm_verifier.py:104-147 holds an LLM client + response cache + stats;
backends mock/openai/anthropic/local at llm_verifier.py:325-339,
disabled by default per reference config.py:65).

Two REAL deterministic backends ship here (the network-client slots
stay absent — no network in this container):

- "heuristic" (alias "mock"): a pattern scanner for the issue classes
  the reference's verifier prompts about (OCR garble, broken words,
  formatting damage, llm_verifier.py:117-136);
- "ngram": a statistical character-bigram gibberish detector (the
  reference's 'local' backend slot) flagging windows whose language-
  model likelihood collapses — noise no fixed regex matches.

The Ray-side shape is the point — a callable class whose __init__
builds the backend and an in-actor response cache keyed by content
hash, so repeated texts (duplicate crawl records) hit the cache
instead of the backend:

    map_batches(VerifierActor, concurrency=(1, N), batch_size=B)

Register a real network client in BACKENDS to enable live
verification; the cache and batch plumbing stay identical.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import ray.data

from pdf_extractor_ray.stages.pools import clamp_pool

# (pattern, per-class confidence) — confidences mirror the reference's
# issue-type weighting idea (llm_verifier.py:246-263)
_ISSUE_PATTERNS: list[tuple[str, re.Pattern, float]] = [
    # OCR-garble: long consonant runs that occur in no natural language
    ("ocr_garble", re.compile(r"[bcdfghjklmnpqrstvwxz]{7,}", re.IGNORECASE), 0.8),
    # broken words: single letter, hyphen-newline, single letter
    ("broken_word", re.compile(r"\b\w-\n\w"), 0.85),
    # repeated-char damage: the same char 10+ times
    ("char_run", re.compile(r"(.)\1{9,}"), 0.75),
    # replacement-char runs from encoding damage (one span per run)
    ("encoding_damage", re.compile("�+"), 0.95),
    # control-char runs
    ("control_chars", re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]+"), 0.95),
]


def remove_overlapping_issues(issues: list[dict]) -> list[dict]:
    """D5 — overlapping-issue dedup: positional sweep keeping the
    higher-confidence issue of each overlapping pair (reference
    llm_verifier.py:265-282 _remove_overlapping_issues)."""
    if not issues:
        return []
    ordered = sorted(issues, key=lambda i: (i["pos"], -i["confidence"], i["type"]))
    kept = [ordered[0]]
    for issue in ordered[1:]:
        prev = kept[-1]
        if issue["pos"] < prev["end"]:
            if issue["confidence"] > prev["confidence"]:
                kept[-1] = issue
        else:
            kept.append(issue)
    return kept


def prioritize_issues(issues: list[dict], max_issues: int = 10) -> list[dict]:
    """O6 — keep the max_issues highest-confidence issues (position
    tiebreak), reported back in positional order."""
    top = sorted(issues, key=lambda i: (-i["confidence"], i["pos"], i["type"]))[:max_issues]
    return sorted(top, key=lambda i: (i["pos"], i["type"]))


class MockBackend:
    """Deterministic stand-in for the LLM verification call. Emits
    POSITIONAL issues so overlap dedup and prioritization operate on
    real spans."""

    name = "mock"

    def verify(self, text: str, max_issues: int = 10) -> tuple[list[dict], float]:
        found: list[dict] = []
        for name, pat, conf in _ISSUE_PATTERNS:
            for m in pat.finditer(text):
                found.append({"type": name, "pos": m.start(), "end": m.end(), "confidence": conf})
        issues = prioritize_issues(remove_overlapping_issues(found), max_issues)
        n_types = len({i["type"] for i in issues})
        confidence = max(0.0, 1.0 - 0.2 * n_types)
        return issues, confidence


_SEED_TEXT = (
    "the quick brown fox jumps over the lazy dog while distributed systems "
    "process large volumes of web data with careful memory management and "
    "reliable streaming execution across many nodes every single day "
    "people keep reading and writing about common things in ordinary "
    "language because most words follow familiar letter patterns that "
    "make them easy to read through from beginning to end without trouble "
    "der schnelle braune fuchs springt über den faulen hund und verteilte "
    "systeme verarbeiten große datenmengen zuverlässig jeden tag "
    "le rapide renard brun saute par dessus le chien paresseux et les "
    "systèmes distribués traitent de grands volumes de données chaque jour "
    "el rápido zorro marrón salta sobre el perro perezoso y los sistemas "
    "distribuidos procesan grandes volúmenes de datos todos los días"
)


class NgramBackend:
    """Statistical gibberish detector — a second REAL backend next to
    the pattern heuristics (reference 'local' backend slot,
    llm_verifier.py:325-339): character-bigram log-likelihood against
    a small in-module language model (the classic gibberish-detection
    technique). The model trains once per actor from the embedded
    multilingual seed text with add-one smoothing; windows whose mean
    bigram log-probability falls below the threshold are flagged as
    positional `statistical_garble` issues — catching OCR noise that
    matches no fixed regex."""

    name = "ngram"

    def __init__(self, window: int = 40, threshold: float = -3.5) -> None:
        import math
        from collections import Counter

        self.window = window
        self.threshold = threshold
        text = " ".join(_SEED_TEXT.lower().split())
        counts = Counter(zip(text, text[1:]))
        ctx = Counter(text[:-1])
        vocab = len(set(text)) + 1
        self._lp = {
            pair: math.log((n + 1) / (ctx[pair[0]] + vocab)) for pair, n in counts.items()
        }
        self._default = {c: math.log(1 / (ctx[c] + vocab)) for c in ctx}
        self._floor = math.log(1 / vocab)

    def _window_score(self, w: str) -> float:
        """Mean log-prob over LETTER-LETTER bigrams only — space
        transitions carry almost no language signal and flatten the
        normal-vs-garble separation if included."""
        lp = self._lp
        dflt = self._default
        total = 0.0
        n = 0
        for pair in zip(w, w[1:]):
            if " " in pair:
                continue
            total += lp.get(pair, dflt.get(pair[0], self._floor))
            n += 1
        return total / n if n else 0.0

    def verify(self, text: str, max_issues: int = 10) -> tuple[list[dict], float]:
        low = text.lower()
        found: list[dict] = []
        for start in range(0, max(1, len(low) - 1), self.window):
            w = low[start : start + self.window]
            # only score windows that are mostly letters (tables /
            # numbers / CJK are out of the model's domain)
            n_alpha = sum(1 for c in w if "a" <= c <= "z" or c in "äöüéèàáíóúñç ")
            if len(w) < 12 or n_alpha < 0.7 * len(w):
                continue
            score = self._window_score(" ".join(w.split()))
            if score < self.threshold:
                found.append(
                    {
                        "type": "statistical_garble",
                        "pos": start,
                        "end": min(start + self.window, len(low)),
                        "confidence": 0.7,
                    }
                )
        issues = prioritize_issues(remove_overlapping_issues(found), max_issues)
        confidence = max(0.0, 1.0 - 0.2 * len({i["type"] for i in issues}))
        return issues, confidence


# backend registry (reference llm_verifier.py:325-339 backend names:
# mock/openai/anthropic/local — the network-client slots stay absent
# in this container; both shipped backends are real deterministic
# verifiers)
BACKENDS = {"heuristic": MockBackend, "mock": MockBackend, "ngram": NgramBackend}


class VerifierActor:
    """Stateful verification stage: backend client + response cache
    built once per actor (reference llm_verifier.py:104-147); the
    cache key is a content hash, so duplicate texts in the corpus are
    verified once per actor."""

    def __init__(
        self, text_col: str = "extracted_text", id_col: str = "url", backend: str = "heuristic"
    ) -> None:
        self.backend = BACKENDS[backend]()
        self.cache: dict[bytes, tuple[list[dict], float]] = {}
        self.hits = 0
        self.misses = 0
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, n_issues, issue_lists, confs, cached = [], [], [], [], []
        for did, text in zip(batch[self.id_col], batch[self.text_col]):
            text = text or ""
            key = hashlib.sha1(text.encode("utf-8")).digest()
            hit = key in self.cache
            if hit:
                self.hits += 1
                issues, conf = self.cache[key]
            else:
                self.misses += 1
                issues, conf = self.backend.verify(text)
                self.cache[key] = (issues, conf)
            ids.append(did)
            n_issues.append(len(issues))
            issue_lists.append(",".join(f"{i['type']}@{i['pos']}" for i in issues))
            confs.append(conf)
            cached.append(hit)
        return pd.DataFrame(
            {
                self.id_col: ids,
                "n_issues": pd.array(n_issues, dtype="int32"),
                "issues": issue_lists,
                "verifier_confidence": confs,
                "cache_hit": cached,
            }
        )


def verify_extractions(
    ds: ray.data.Dataset,
    text_col: str = "extracted_text",
    id_col: str = "url",
    concurrency: int = 8,
    batch_size: int = 64,
    backend: str = "heuristic",
) -> ray.data.Dataset:
    return ds.map_batches(
        VerifierActor,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col, "backend": backend},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=clamp_pool(concurrency),  # fixed pool, clamped to live CPUs
    )
