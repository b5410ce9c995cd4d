"""Distributed BPE tokenizer — train + encode (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units", public
ACL paper; the merge-table formulation every modern LM tokenizer
descends from).

Scale shape: BPE training needs only the DISTINCT-WORD frequency
table — merges depend on word-type counts, never the corpus stream —
so the distributed part is one exact word count (the same slim
per-batch-distinct shuffle as text_analysis.top_terms). Above
`max_words` the table is truncated to the most frequent types
(count desc, word asc — the standard frequency-capped approximation;
the cap bounds driver memory, and truncation only drops tail types
whose pair mass is negligible). The merge loop itself runs driver-side
over that bounded table with an incremental pair index (only words
containing the merged pair are touched per step).

Encoding broadcasts the merge-rank table once (ray.put); each batch
segments its DISTINCT words only (per-worker cache across batches)
and re-expands to per-document token counts. Ties in pair counts are
broken lexicographically, so training is bit-deterministic at any
partitioning.

Reference parity: the reference engine counts whitespace/page tokens
only (pdf_extractor_new quality stats); a subword tokenizer is the
training-data-pipeline operator the north rule's webtext target needs
(token budgeting, sequence packing inputs).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from collections.abc import Sequence

import numpy as np
import pandas as pd
import ray
import ray.data

_END = "</w>"  # end-of-word marker (Sennrich §3.2)
_ENCODE_CACHE: dict = {}  # per-worker: (ref hex) -> (ranks, word->n_tokens memo)


def _word_counts(ds: ray.data.Dataset, text_col: str, max_words: int) -> pd.DataFrame:
    """Exact distinct-word frequency table, truncated to the
    max_words most frequent types (count desc, word asc) via the
    per-block partial top-k prune — the only collect is <= max_words
    rows."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    def local_counts(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split().explode().dropna()
        toks = toks[toks != ""]
        vc = toks.value_counts()
        return pd.DataFrame({"word": vc.index.astype(str), "n": vc.to_numpy().astype("int64")})

    counts = grouped_sum(
        ds.map_batches(local_counts, batch_format="pandas"), ["word"], ["n"], counts=False
    )

    def partial_top(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["sum_n", "word"], ascending=[False, True], kind="stable").head(
            max_words
        )

    rows = (
        counts.map_batches(partial_top, batch_format="pandas")
        .sort([("sum_n"), ("word")], descending=[True, False])
        .limit(max_words)
        .take_all()
    )
    out = pd.DataFrame(rows, columns=["word", "sum_n"]).rename(columns={"sum_n": "n"})
    out["n"] = out["n"].astype("int64")
    return out


def bpe_train(
    ds: ray.data.Dataset,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 200_000,
) -> list[tuple[str, str]]:
    """Learn up to n_merges BPE merges from the corpus. Returns the
    ordered merge list [(left, right), ...]; stops early when no pair
    occurs twice. Deterministic: exact distributed counts, ties broken
    by the lexicographically smallest pair."""
    tbl = _word_counts(ds, text_col, max_words)
    # word types as symbol tuples: chars + end-of-word marker
    words: list[list[str]] = [list(w) + [_END] for w in tbl["word"]]
    freqs: list[int] = [int(n) for n in tbl["n"]]

    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)  # pair -> word indices containing it

    def count_word(i: int, sign: int) -> None:
        syms = words[i]
        f = freqs[i] * sign
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            if sign > 0:
                pair_words[(a, b)].add(i)

    for i in range(len(words)):
        count_word(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair, best_key = None, None
        for p, c in pair_counts.items():
            if c >= 2:
                k = (-c, p)  # max count; ties -> lexicographically SMALLEST pair
                if best_key is None or k < best_key:
                    best_key, pair = k, p
        if pair is None:
            break
        merges.append(pair)
        joined = pair[0] + pair[1]
        for i in sorted(pair_words[pair]):
            count_word(i, -1)  # retract this word's pair mass
            syms, out = words[i], []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == pair[0] and syms[j + 1] == pair[1]:
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            count_word(i, +1)
        pair_counts = +pair_counts  # drop zero/negative entries
        pair_words.pop(pair, None)
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by ascending rank (the standard BPE
    encode: repeatedly merge the lowest-rank adjacent pair)."""
    syms = list(word) + [_END]
    while len(syms) > 1:
        best_rank, best_j = None, -1
        for j, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


def bpe_token_counts(
    ds: ray.data.Dataset,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: Sequence[str] | None = None,
) -> ray.data.Dataset:
    """Per-document BPE token counts under a trained merge table:
    (id, n_ws_tokens, n_bpe_tokens[, keep_cols...]). Broadcast the
    ranks once; each batch encodes its DISTINCT words only (per-worker
    memo persists across batches) and re-expands by word frequency —
    the hot path never encodes a word twice per worker. `keep_cols`
    ride along row-aligned (the nb_predict idiom) so downstream
    rollups never need a driver-side id map."""
    ref = ray.put({p: r for r, p in enumerate(merges)})
    extra = list(keep_cols) if keep_cols is not None else []

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        key = ("bpe", ref.hex())
        st = _ENCODE_CACHE.get(key)
        if st is None:
            st = _ENCODE_CACHE[key] = (ray.get(ref), {})
        ranks, memo = st
        toks = batch.set_index(id_col)[text_col].str.split().explode().dropna()
        toks = toks[toks != ""]
        if toks.empty:
            out = {
                id_col: np.array([], dtype="int64"),
                "n_ws_tokens": np.array([], dtype="int64"),
                "n_bpe_tokens": np.array([], dtype="int64"),
            }
            for c in extra:
                out[c] = batch[c].iloc[0:0]
            return pd.DataFrame(out)
        for w in pd.unique(toks.to_numpy()):
            if w not in memo:
                memo[w] = len(bpe_encode_word(w, ranks))
        per_tok = toks.map(memo).astype("int64")
        g_ws = toks.groupby(level=0).size()
        g_bpe = per_tok.groupby(level=0).sum()
        out = pd.DataFrame(
            {
                id_col: g_ws.index.to_numpy(),
                "n_ws_tokens": g_ws.to_numpy().astype("int64"),
                "n_bpe_tokens": g_bpe.to_numpy().astype("int64"),
            }
        )
        if extra:
            side = batch.set_index(id_col)[extra]
            for c in extra:
                out[c] = side[c].reindex(out[id_col]).to_numpy()
        return out

    return ds.map_batches(f, batch_format="pandas")


def packing_efficiency(
    ds: ray.data.Dataset,
    seq_lens=(256, 512, 1024, 2048),
    text_col: str = "text",
) -> pd.DataFrame:
    """Context-length planning table: for each candidate sequence
    length L, the exact padding waste of the two standard batching
    layouts over this corpus's whitespace-token counts —

    - pad_waste: one document per sequence, padded to ceil(tok/L)*L
      (the SFT / no-cross-doc-attention layout); waste =
      1 - sum(tok) / sum(ceil(tok/L) * L).
    - truncate_loss: one sequence per document, truncated at L (the
      cheap layout); loss = 1 - sum(min(tok, L)) / sum(tok).

    Concat-and-chunk packing has ~zero waste by construction (see
    pack_offsets) — this table quantifies what the simpler layouts
    cost BEFORE a 100-TB tokenization run commits to one.

    One streaming pass; per-block partials are 3 integers per L (the
    sums), folded on the driver. All-integer arithmetic, so the
    DuckDB twin reproduces every cell exactly."""
    lens = sorted(int(x) for x in seq_lens)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "seq_len": pd.Series(dtype="int64"),
                "tok": pd.Series(dtype="int64"),
                "padded": pd.Series(dtype="int64"),
                "kept": pd.Series(dtype="int64"),
                "n_docs": pd.Series(dtype="int64"),
            }
        )
        if len(b) == 0:
            return empty
        tok = b[text_col].astype(str).str.split().str.len().fillna(0).to_numpy(dtype=np.int64)
        rows = []
        for L in lens:
            padded = int(np.sum((tok + L - 1) // L) * L)
            rows.append((L, int(tok.sum()), padded, int(np.minimum(tok, L).sum()), len(b)))
        return pd.DataFrame(rows, columns=["seq_len", "tok", "padded", "kept", "n_docs"])

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pandas"
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {
                "seq_len": pd.Series(dtype="int64"),
                "n_docs": pd.Series(dtype="int64"),
                "n_tokens": pd.Series(dtype="int64"),
                "padded_slots": pd.Series(dtype="int64"),
                "pad_waste": pd.Series(dtype="float64"),
                "truncate_loss": pd.Series(dtype="float64"),
            }
        )
    agg = parts.groupby("seq_len", sort=True).sum().reset_index()
    out = pd.DataFrame(
        {
            "seq_len": agg["seq_len"].astype("int64"),
            "n_docs": agg["n_docs"].astype("int64"),
            "n_tokens": agg["tok"].astype("int64"),
            "padded_slots": agg["padded"].astype("int64"),
            "pad_waste": 1.0
            - agg["tok"].to_numpy(dtype=np.float64)
            / np.maximum(agg["padded"].to_numpy(dtype=np.float64), 1.0),
            "truncate_loss": 1.0
            - agg["kept"].to_numpy(dtype=np.float64)
            / np.maximum(agg["tok"].to_numpy(dtype=np.float64), 1.0),
        }
    )
    return out.reset_index(drop=True)
