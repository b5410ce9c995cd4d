"""Corpus deduplication operators over a Ray Data Dataset of documents.

Reference analogs are all intra-document (SURVEY.md §2.7 D1-D7); these
are the corpus-scale generalizations a training-data pipeline needs,
built from public MinHash/LSH/SimHash literature (Broder 1997,
Charikar 2002, Leskovec-Rajaraman-Ullman ch.3):

- exact_dedup        : content-hash -> hash-partition groupby -> first
- minhash_lsh_dedup  : shingle -> minhash -> LSH bands -> band groupby
                       -> candidate pairs -> Jaccard verify -> drop
- simhash_dedup      : 64-bit simhash, bucket by rotated prefixes
- ngram_jaccard_pairs: n-gram Jaccard verification over candidates
- embedding near-dup : see ops/similarity.py (cosine over embeddings)

Scale notes: shingling/minhashing is vectorized per batch inside
map_batches (numpy); the only shuffles are the band groupby (key =
(band_id, band_hash) — uniformly distributed by construction, no skew)
and the final anti-join back (broadcast of the small drop-set at test
scale; at corpus scale the drop-set is itself a Dataset joined by id
hash). Pairs are deduplicated via min/max id ordering.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data

_WS = re.compile(r"\s+")
_MERSENNE = np.uint64((1 << 61) - 1)


def _normalize(text: str) -> str:
    return _WS.sub(" ", text.strip().lower())


def sha1_64(text: str) -> int:
    return int.from_bytes(hashlib.sha1(text.encode("utf-8")).digest()[:8], "big", signed=False)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Keep the first (min id) document per exact text content.

    Scalable shape: content hash vectorized per batch -> LOCAL
    pre-dedup (combiner: at most one row per hash per batch crosses
    the wire) -> shuffle on a coarse partition key (hash mod P, so P
    Python calls, not one per unique text) -> per-partition vectorized
    winner pick (min id per hash; matches SQL `min(id) group by
    text`)."""

    def add_hash_and_combine(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = np.fromiter(
            (
                int.from_bytes(hashlib.sha1(t.encode("utf-8")).digest()[:8], "big") >> 1
                for t in batch[text_col]
            ),
            dtype=np.int64,
            count=len(batch),
        )
        batch["_h"] = h
        batch["_part"] = h % num_partitions
        return batch.sort_values(id_col, kind="stable").drop_duplicates("_h", keep="first")

    def first_per_hash(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="stable").drop_duplicates("_h", keep="first")

    out = (
        ds.map_batches(add_hash_and_combine, batch_format="pandas")
        .groupby("_part")
        .map_groups(first_per_hash, batch_format="pandas")
    )
    return out.drop_columns(["_h", "_part"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------


_ROLL_BASE = np.uint64(1099511628211)  # FNV prime; odd -> bijective mod 2^64


def _mix64(h: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer (public domain): full-avalanche mix so the
    low bits of the wrapping polynomial hash are well distributed."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(29)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(32)
    return h


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of the k-char shingle set (unique), fully
    vectorized: codepoints -> sliding windows -> wrapping polynomial
    hash -> murmur finalize. No per-shingle Python work (a 10KB doc
    has ~10k shingles; hashlib-per-shingle was the dedup hot spot)."""
    t = _normalize(text)
    if len(t) < k:
        return np.array([sha1_64(t)], dtype=np.uint64)
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(codes, k)
    powers = _ROLL_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    h = _mix64((win * powers).sum(axis=1, dtype=np.uint64))
    return np.unique(h)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """64-bit hashes of a token list (C-level siphash via pandas)."""
    return pd.util.hash_array(np.asarray(tokens, dtype=object)).astype(np.uint64)


class MinHasher:
    """Stateful minhash stage: permutation coefficients built once per
    actor (the map_batches callable-class pattern, SURVEY.md §2.3 ST1)."""

    def __init__(self, num_perm: int = 128, k: int = 5, seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k)  # (S,)
        # (a*h + b) mod p over all perms: (P, S) -> min over S
        vals = (np.outer(self.a, h) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"]])
        batch = batch[["doc_id"]].copy()
        batch["sig"] = list(sigs)
        return batch


# per-worker-process hasher cache (task-pool pattern, see
# pipelines/extract.py: state is cheap + read-only, so prestarted
# workers amortize construction with zero actor-spawn cost)
_HASHER_CACHE: dict = {}


def _minhash_task(batch: pd.DataFrame, num_perm: int, k: int) -> pd.DataFrame:
    key = ("minhash", num_perm, k)
    h = _HASHER_CACHE.get(key)
    if h is None:
        h = _HASHER_CACHE[key] = MinHasher(num_perm=num_perm, k=k)
    return h(batch)


def minhash_signatures(
    ds: ray.data.Dataset, num_perm: int = 128, k: int = 5, concurrency: int = 16
) -> ray.data.Dataset:
    return ds.map_batches(
        _minhash_task,
        fn_kwargs={"num_perm": num_perm, "k": k},
        batch_format="pandas",
        batch_size=128,
    )


def _pairs_in_buckets(g: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    """Emit all intra-bucket candidate pairs (a < b) from a frame
    holding COMPLETE buckets. Vectorized pre-filter: only buckets with
    >= 2 members (rare by construction) reach the Python pair loop."""
    sizes = g.groupby(keys)["doc_id"].transform("size")
    multi = g[sizes > 1]
    if multi.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    a_out, b_out = [], []
    for _, grp in multi.groupby(keys, sort=False):
        ids = sorted(grp["doc_id"].tolist())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
    return pd.DataFrame({"a": a_out, "b": b_out}).drop_duplicates()


def minhash_lsh_candidates(
    sigs: ray.data.Dataset, bands: int = 16, rows: int = 8, num_partitions: int = 32
) -> ray.data.Dataset:
    """Explode signatures to (band_id, band_hash, doc_id); docs sharing
    any band bucket are candidate near-duplicates. Returns pairs
    (a, b) with a < b, deduplicated.

    Scale note: buckets are NOT one group each — millions of tiny
    groups would mean millions of per-group Python calls. Instead the
    bucket key is coarsened to `num_partitions` shuffle partitions
    (groupby moves each bucket to exactly one partition) and pairs are
    emitted by ONE vectorized pandas pass per partition (measured 3x
    end-to-end vs per-bucket map_groups at 5k docs; the gap widens
    with corpus size)."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sig_m = np.stack([np.asarray(s, dtype=np.uint64) for s in batch["sig"]])
        n = sig_m.shape[0]
        segs = sig_m.reshape(n, bands, rows)
        consts = _ROLL_BASE ** np.arange(rows - 1, -1, -1, dtype=np.uint64)
        bh = _mix64((segs * consts).sum(axis=2, dtype=np.uint64))  # (n, bands)
        flat = bh.reshape(-1)
        return pd.DataFrame(
            {
                "band_id": np.tile(np.arange(bands, dtype=np.int64), n),
                "band_hash": flat.astype(np.int64),  # wrap-cast; identity preserved
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), bands),
                "_part": (flat % np.uint64(num_partitions)).astype(np.int64),
            }
        )

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_in_buckets(g, ["band_id", "band_hash"])

    pairs = (
        sigs.map_batches(explode, batch_format="pandas")
        .groupby("_part")
        .map_groups(pairs_in_partition, batch_format="pandas")
    )
    # same pair can surface from different bands/partitions: tiny
    # final dedup (candidate sets are small — that is the point of LSH)
    def dedup_pairs(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates()

    return pairs.repartition(1).map_batches(dedup_pairs, batch_format="pandas")


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup(
    ds: ray.data.Dataset,
    threshold: float = 0.8,
    num_perm: int = 128,
    k: int = 5,
    bands: int = 16,
    rows: int = 8,
) -> ray.data.Dataset:
    """Full near-dedup: candidates via LSH, verified by true Jaccard on
    the pair texts, keep the min-id doc of each duplicate pair.

    The verify stage broadcasts the candidate pair list and the
    drop-set derivation runs on the driver — candidate sets are tiny
    relative to the corpus (that is the point of LSH); at 10^12-doc
    scale the text fetch becomes a hash-join of pairs against the
    corpus by doc_id instead (same shuffle key)."""
    import ray as _ray

    sigs = minhash_signatures(ds, num_perm=num_perm, k=k)
    pairs = minhash_lsh_candidates(sigs, bands=bands, rows=rows).take_all()
    if not pairs:
        return ds
    cand_ids = sorted({int(p["a"]) for p in pairs} | {int(p["b"]) for p in pairs})
    id_set = set(cand_ids)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["doc_id"].isin(id_set)][["doc_id", "text"]]

    texts = {
        int(r["doc_id"]): r["text"]
        for r in ds.map_batches(pick, batch_format="pandas").take_all()
    }
    drop: set[int] = set()
    for p in sorted(pairs, key=lambda p: (int(p["a"]), int(p["b"]))):
        a, b = int(p["a"]), int(p["b"])
        if b in drop:
            continue
        if jaccard(texts[a], texts[b], k) >= threshold:
            drop.add(b)
    drop_ref = _ray.put(drop)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        d = _ray.get(drop_ref)
        return batch[~batch["doc_id"].isin(d)]

    return ds.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# Word n-gram Jaccard near-dedup
# ---------------------------------------------------------------------------


def _word_ngram_hashes(text: str, n: int) -> np.ndarray:
    """64-bit hashes of the word n-gram set (unique): token hashes
    (C-level) combined by a vectorized wrapping polynomial — no
    per-gram Python work."""
    toks = _normalize(text).split(" ")
    th = _token_hashes(toks)
    if len(toks) < n:
        win = th[None, :]
        powers = _ROLL_BASE ** np.arange(len(toks) - 1, -1, -1, dtype=np.uint64)
    else:
        win = np.lib.stride_tricks.sliding_window_view(th, n)
        powers = _ROLL_BASE ** np.arange(n - 1, -1, -1, dtype=np.uint64)
    return np.unique(_mix64((win * powers).sum(axis=1, dtype=np.uint64)))


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    sa = set(_word_ngram_hashes(text_a, n).tolist())
    sb = set(_word_ngram_hashes(text_b, n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _gram_minhash_task(batch: pd.DataFrame, num_perm: int, n: int) -> pd.DataFrame:
    key = ("gram-minhash", num_perm, n)
    h = _HASHER_CACHE.get(key)
    if h is None:
        h = _HASHER_CACHE[key] = MinHasher(num_perm=num_perm, seed=42)
    out = batch[["doc_id"]].copy()
    sigs = []
    for t in batch["text"]:
        g = _word_ngram_hashes(t, n)
        vals = (np.outer(h.a, g) + h.b[:, None]) % _MERSENNE
        sigs.append(vals.min(axis=1))
    out["sig"] = sigs
    return out


def ngram_jaccard_dedup(
    ds: ray.data.Dataset,
    threshold: float = 0.8,
    n: int = 3,
    num_perm: int = 128,
    bands: int = 16,
    rows: int = 8,
) -> ray.data.Dataset:
    """Near-dedup on word n-gram Jaccard similarity: candidates via
    minhash-LSH over the word-gram sets (token-level blocking, vs the
    char-shingle blocking of `minhash_dedup`), verified with the EXACT
    word-n-gram Jaccard, keep min-id per duplicate pair.

    Word grams are robust to intra-word edits and much cheaper per doc
    (|tokens| << |chars|); char shingles catch word-boundary edits —
    the two operators are complementary, which is why both exist."""
    import ray as _ray

    sigs = ds.map_batches(
        _gram_minhash_task, fn_kwargs={"num_perm": num_perm, "n": n}, batch_format="pandas", batch_size=128
    )
    pairs = minhash_lsh_candidates(sigs, bands=bands, rows=rows).take_all()
    if not pairs:
        return ds
    id_set = {int(p["a"]) for p in pairs} | {int(p["b"]) for p in pairs}

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["doc_id"].isin(id_set)][["doc_id", "text"]]

    texts = {
        int(r["doc_id"]): r["text"]
        for r in ds.map_batches(pick, batch_format="pandas").take_all()
    }
    drop: set[int] = set()
    for p in sorted(pairs, key=lambda p: (int(p["a"]), int(p["b"]))):
        a, b = int(p["a"]), int(p["b"])
        if b in drop:
            continue
        if ngram_jaccard(texts[a], texts[b], n) >= threshold:
            drop.add(b)
    drop_ref = _ray.put(drop)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        d = _ray.get(drop_ref)
        return batch[~batch["doc_id"].isin(d)]

    return ds.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash near-dedup (Charikar 2002)
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit simhash over word 3-grams; stateful token hashing."""

    def __init__(self, ngram: int = 3) -> None:
        self.ngram = ngram

    def simhash(self, text: str) -> int:
        hs = _word_ngram_hashes(text, self.ngram)  # vectorized gram hashes
        if hs.size == 0:
            return 0
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        out = ((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
        return int(out)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        out["simhash"] = [np.uint64(self.simhash(t)) for t in batch["text"]]
        return out


def _simhash_task(batch: pd.DataFrame, ngram: int) -> pd.DataFrame:
    key = ("simhash", ngram)
    h = _HASHER_CACHE.get(key)
    if h is None:
        h = _HASHER_CACHE[key] = SimHasher(ngram=ngram)
    return h(batch)


def simhash_signatures(ds: ray.data.Dataset, ngram: int = 3, concurrency: int = 16) -> ray.data.Dataset:
    return ds.map_batches(
        _simhash_task,
        fn_kwargs={"ngram": ngram},
        batch_format="pandas",
        batch_size=256,
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_dedup(ds: ray.data.Dataset, max_hamming: int = 3, ngram: int = 3) -> ray.data.Dataset:
    """Near-dedup by simhash: bucket on 4 x 16-bit key segments (any
    pair within hamming distance 3 of 64 bits shares at least one
    16-bit segment exactly — pigeonhole), verify hamming, keep min id."""
    import ray as _ray

    sigs = simhash_signatures(ds, ngram=ngram)

    num_partitions = 32

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().astype(np.uint64)  # (n,)
        n = h.shape[0]
        segs = np.stack(
            [(h >> np.uint64(16 * s)) & np.uint64(0xFFFF) for s in range(4)], axis=1
        )  # (n, 4)
        flat = segs.reshape(-1)
        seg_ids = np.tile(np.arange(4, dtype=np.int64), n)
        return pd.DataFrame(
            {
                "seg_id": seg_ids,
                "seg_val": flat.astype(np.int64),
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), 4),
                "simhash": np.repeat(h, 4),
                "_part": ((flat * np.uint64(4) + seg_ids.astype(np.uint64)) % np.uint64(num_partitions)).astype(np.int64),
            }
        )

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        """Complete (seg_id, seg_val) buckets; hamming-verify inside
        multi-member buckets only (same coarse-partition pattern as
        minhash_lsh_candidates)."""
        sizes = g.groupby(["seg_id", "seg_val"])["doc_id"].transform("size")
        multi = g[sizes > 1]
        a, b = [], []
        for _, grp in multi.groupby(["seg_id", "seg_val"], sort=False):
            rows_ = sorted(zip(grp["doc_id"].tolist(), grp["simhash"].tolist()))
            for i in range(len(rows_)):
                for j in range(i + 1, len(rows_)):
                    if hamming64(int(rows_[i][1]), int(rows_[j][1])) <= max_hamming:
                        a.append(rows_[i][0])
                        b.append(rows_[j][0])
        return pd.DataFrame({"a": a, "b": b})

    pairs = (
        sigs.map_batches(explode, batch_format="pandas")
        .groupby("_part")
        .map_groups(pairs_in_partition, batch_format="pandas")
        .take_all()
    )
    drop = {int(p["b"]) for p in pairs}
    drop_ref = _ray.put(drop)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        d = _ray.get(drop_ref)
        return batch[~batch["doc_id"].isin(d)]

    return ds.map_batches(keep, batch_format="pandas")
