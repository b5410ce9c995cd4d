"""Extraction-verification actor pool (reference ST3:
llm_verifier.py:104-147 holds an LLM client + response cache + stats;
backends mock/openai/anthropic/local at llm_verifier.py:325-339,
disabled by default per reference config.py:65).

Only the MOCK backend ships here (no network in this container): a
deterministic pattern scanner for the issue classes the reference's
verifier prompts about (OCR garble, broken words, formatting damage,
llm_verifier.py:117-136). The Ray-side shape is the point — a callable
class whose __init__ builds the client and an in-actor response cache
keyed by content hash, so repeated texts (duplicate crawl records) hit
the cache instead of the backend:

    map_batches(VerifierActor, concurrency=(1, N), batch_size=B)

Swap MockBackend for a real client to enable live verification; the
cache and batch plumbing stay identical.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import ray.data

from pdf_extractor_ray.stages.pools import clamp_pool

_ISSUE_PATTERNS: list[tuple[str, re.Pattern]] = [
    # OCR-garble: long consonant runs that occur in no natural language
    ("ocr_garble", re.compile(r"[bcdfghjklmnpqrstvwxz]{7,}", re.IGNORECASE)),
    # broken words: single letter, hyphen-newline, single letter
    ("broken_word", re.compile(r"\b\w-\n\w")),
    # repeated-char damage: the same char 10+ times
    ("char_run", re.compile(r"(.)\1{9,}")),
    # replacement chars from encoding damage
    ("encoding_damage", re.compile("�")),
    # null bytes
    ("control_chars", re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")),
]


class MockBackend:
    """Deterministic stand-in for the LLM verification call."""

    name = "mock"

    def verify(self, text: str) -> tuple[list[str], float]:
        issues = [name for name, pat in _ISSUE_PATTERNS if pat.search(text)]
        confidence = max(0.0, 1.0 - 0.2 * len(issues))
        return issues, confidence


class VerifierActor:
    """Stateful verification stage: backend client + response cache
    built once per actor (reference llm_verifier.py:104-147); the
    cache key is a content hash, so duplicate texts in the corpus are
    verified once per actor."""

    def __init__(self, text_col: str = "extracted_text", id_col: str = "url") -> None:
        self.backend = MockBackend()
        self.cache: dict[bytes, tuple[list[str], float]] = {}
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
            issue_lists.append(",".join(issues))
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
) -> ray.data.Dataset:
    return ds.map_batches(
        VerifierActor,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=clamp_pool(concurrency),  # fixed pool, clamped to live CPUs
    )
