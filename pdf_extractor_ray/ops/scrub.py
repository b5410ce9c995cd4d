"""Corpus scrubbing operators for training-data pipelines: pattern /
PII redaction, decontamination against a phrase blocklist, and a
deterministic train/test split.

These are the standard pre-training hygiene passes (public C4 / Dolma /
RefinedWeb-style pipelines): strip personally identifiable strings,
drop documents that contain evaluation-set phrases, and split the rest
reproducibly. All three are embarrassingly parallel per-batch maps —
no shuffle — so at 100 TB they pipeline inside the same streaming pass
as extraction:

- redaction is one vectorized `Series.str.replace`/`str.count` per
  pattern per batch;
- decontamination broadcasts the blocklist once (`ray.put` for big
  lists, a task-arg constant for small literal lists) and evaluates
  one `str.contains` mask per phrase — never a join;
- the split hashes the id column per row (md5, so the assignment is
  stable across engines and reproducible in SQL: DuckDB's md5()
  matches hashlib byte-for-byte).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Sequence

import numpy as np
import pandas as pd
import ray.data

# Default PII pattern table. Order matters: email first (its digits
# must not be re-counted by later patterns), ipv4 BEFORE phone (the
# phone pattern would otherwise eat three dotted octets).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"(?:\+?\d{1,3}[-. ])?\(?\d{2,4}\)?[-. ]\d{3,4}[-. ]\d{3,4}\b", "<PHONE>"),
)

NUMBER_PATTERN: tuple[tuple[str, str, str], ...] = (("number", r"[0-9]+", "<NUM>"),)


def redact(
    ds: ray.data.Dataset,
    text_col: str = "text",
    patterns: Sequence[tuple[str, str, str]] = PII_PATTERNS,
    id_cols: Sequence[str] = ("doc_id",),
    out_col: str = "scrubbed",
) -> ray.data.Dataset:
    """Redact every match of each (name, regex, replacement) pattern
    and count redactions per row. Pure per-batch map (no shuffle);
    regexes compile once per worker process via the module-level cache.
    Semantics match SQL `regexp_replace(col, re, repl, 'g')` +
    `len(regexp_extract_all(col, re))` so the op is oracle-checkable.
    """
    pats = tuple(patterns)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[list(id_cols)].copy()
        scrubbed, total = redact_series(batch[text_col], pats)
        out[out_col] = scrubbed.to_numpy()
        out["n_redactions"] = total
        return out

    return ds.map_batches(f, batch_format="pandas")


def redact_series(
    s: pd.Series, patterns: Sequence[tuple[str, str, str]] = PII_PATTERNS
) -> tuple[pd.Series, np.ndarray]:
    """Vectorized core of `redact` (pure, no Ray): sequentially count
    and replace each pattern over a string Series. Exposed separately
    so property tests can sweep it directly."""
    s = s.astype(str)
    total = np.zeros(len(s), dtype=np.int64)
    for _name, rex, repl in patterns:
        c = _compiled(rex)
        total += s.str.count(c).to_numpy(dtype=np.int64)
        s = s.str.replace(c, repl, regex=True)
    return s, total


_RE_CACHE: dict[str, re.Pattern] = {}


def _compiled(rex: str) -> re.Pattern:
    p = _RE_CACHE.get(rex)
    if p is None:
        p = _RE_CACHE[rex] = re.compile(rex)
    return p


def decontaminate(
    ds: ray.data.Dataset,
    phrases: Sequence[str],
    text_col: str = "text",
    keep_cols: Sequence[str] | None = None,
) -> ray.data.Dataset:
    """Drop rows whose text contains ANY blocklisted phrase (literal
    substring match — the eval-set n-gram decontamination pass).

    The phrase list rides along as a task argument (broadcast once per
    worker by Ray's arg caching); for a huge blocklist pass a
    `ray.put`-ed list and resolve it in the task — never shuffle.
    Small lists run one vectorized `str.contains(literal)` mask per
    phrase; past _COMBINE_THRESHOLD the phrases compile into ONE
    escaped alternation so each batch is a single multi-pattern scan
    (the Aho-Corasick shape, via the re engine)."""
    plist = [str(p) for p in phrases]

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].astype(str)
        if len(plist) > _COMBINE_THRESHOLD:
            combined = _compiled("|".join(re.escape(p) for p in sorted(plist, key=len, reverse=True)))
            hit = s.str.contains(combined, regex=True).to_numpy()
        else:
            hit = np.zeros(len(batch), dtype=bool)
            for p in plist:
                hit |= s.str.contains(p, regex=False).to_numpy()
        kept = batch.loc[~hit]
        return kept[list(keep_cols)] if keep_cols else kept

    return ds.map_batches(f, batch_format="pandas")


_COMBINE_THRESHOLD = 8


def dup_ngram_stats(
    ds: ray.data.Dataset, n: int = 5, num_partitions: int = 32
) -> ray.data.Dataset:
    """Per-doc duplicate-n-gram contamination: how many of a document's
    word n-grams occur elsewhere in the corpus (the repeated-span
    signal from the training-data dedup literature — high fractions
    mark boilerplate / template / copied spans that exact-doc dedup
    misses).

    JOIN-FREE scale shape (one gram shuffle, one tiny doc shuffle):
      1. per batch, explode docs to DISTINCT (doc_id, gram, m) rows
         (m = within-doc occurrences; the shuffle unit is the gram
         STRING so the result is exact — no hash collisions);
      2. shuffle on hash(gram) mod num_partitions — every occurrence
         of a gram lands in one partition, so a single vectorized
         pandas pass computes the GLOBAL count per gram AND reduces to
         per-doc partials (n grams seen, n in duplicated grams) right
         there. No count table is ever joined back or broadcast
         (a first cut used sized_join and fell into Ray's native
         JoinOperator: +12s actor-pool spawn per query);
      3. grouped_sum the per-(partition, doc) partials by doc_id —
         rows entering this shuffle are bounded by docs x partitions.
    At corpus scale raise num_partitions so a partition's gram rows
    fit one worker (same rule as ops/windows.py / CLAUDE.md).
    Emits (doc_id, n_grams, n_dup_grams, dup_fraction); docs shorter
    than n words emit nothing (mirrors the SQL oracle)."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    def explode_grams(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list = []
        grams: list[str] = []
        for doc_id, t in zip(batch["doc_id"], batch["text"]):
            toks = str(t).split()
            m = len(toks) - n + 1
            if m <= 0:
                continue
            ids.extend([doc_id] * m)
            grams.extend(" ".join(toks[i : i + n]) for i in range(m))
        df = pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"), "gram": pd.Series(grams, dtype="object")}
        )
        g = df.groupby(["doc_id", "gram"], sort=False).size().reset_index(name="m")
        g["m"] = g["m"].astype("int64")
        # deterministic 64-bit string hash (pandas siphash, fixed key)
        g["_part"] = (
            pd.util.hash_array(g["gram"].to_numpy()) % np.uint64(num_partitions)
        ).astype("int64")
        return g

    grams = ds.map_batches(explode_grams, batch_format="pandas")

    def part_pass(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("gram", sort=False)["m"].transform("sum")
        dup_m = g["m"].where(c.to_numpy() > 1, 0)
        out = (
            g.assign(_dup=dup_m)
            .groupby("doc_id", sort=False)
            .agg(n_grams_p=("m", "sum"), n_dup_p=("_dup", "sum"))
            .reset_index()
        )
        out["n_grams_p"] = out["n_grams_p"].astype("int64")
        out["n_dup_p"] = out["n_dup_p"].astype("int64")
        return out

    partials = grams.groupby("_part").map_groups(part_pass, batch_format="pandas")
    out = grouped_sum(partials, ["doc_id"], ["n_grams_p", "n_dup_p"], counts=False)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        ng = batch["sum_n_grams_p"].to_numpy().astype("int64")
        nd = batch["sum_n_dup_p"].to_numpy().astype("int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_grams": ng,
                "n_dup_grams": nd,
                "dup_fraction": nd.astype("float64") / ng.astype("float64"),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


def _md5_split(ids: pd.Series, test_hex_prefixes: tuple[str, ...]) -> np.ndarray:
    # first hex nibble of md5(str(id)): 'd'/'e'/'f' -> test (3/16 =
    # 18.75%), else train. md5 here is a STABLE, engine-portable
    # assignment hash (DuckDB md5() gives identical hex), not crypto.
    out = np.empty(len(ids), dtype=object)
    for i, v in enumerate(ids):
        out[i] = (
            "test"
            if hashlib.md5(str(v).encode()).hexdigest()[0] in test_hex_prefixes
            else "train"
        )
    return out


def train_test_split(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    test_hex_prefixes: tuple[str, ...] = ("d", "e", "f"),
) -> ray.data.Dataset:
    """Add a deterministic `split` column keyed on md5(id) — the
    reproducible corpus split every training pipeline needs. Pure map;
    the same row lands in the same split on any cluster size, engine,
    or row order."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["split"] = _md5_split(batch[id_col], test_hex_prefixes)
        return batch

    return ds.map_batches(f, batch_format="pandas")
