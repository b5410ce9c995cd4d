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
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the first (min id) document per exact text content.

    content hash computed vectorized per batch; groupby(hash) is the
    only shuffle; per-group winner = min(id) (deterministic, matches
    SQL `min(id) group by text`)."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_h"] = [hashlib.sha1(t.encode("utf-8")).hexdigest() for t in batch[text_col]]
        return batch

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, id_col)

    out = (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("_h")
        .map_groups(first, batch_format="pandas")
    )
    return out.drop_columns(["_h"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of the k-char shingle set (unique)."""
    t = _normalize(text)
    if len(t) < k:
        return np.array([sha1_64(t)], dtype=np.uint64)
    shingles = {t[i : i + k] for i in range(len(t) - k + 1)}
    return np.fromiter((sha1_64(s) for s in shingles), dtype=np.uint64, count=len(shingles))


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


def minhash_signatures(
    ds: ray.data.Dataset, num_perm: int = 128, k: int = 5, concurrency: int = 4
) -> ray.data.Dataset:
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "k": k},
        batch_format="pandas",
        batch_size=256,
        concurrency=(1, concurrency),
    )


def minhash_lsh_candidates(
    sigs: ray.data.Dataset, bands: int = 16, rows: int = 8
) -> ray.data.Dataset:
    """Explode signatures to (band_id, band_hash, doc_id) and group:
    docs sharing any band bucket are candidate near-duplicates.
    Returns pairs (a, b) with a < b, deduplicated."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        out_band, out_hash, out_id = [], [], []
        for did, sig in zip(batch["doc_id"], batch["sig"]):
            sig = np.asarray(sig, dtype=np.uint64)
            for bi in range(bands):
                seg = sig[bi * rows : (bi + 1) * rows]
                bh = hashlib.sha1(seg.tobytes()).hexdigest()[:16]
                out_band.append(bi)
                out_hash.append(bh)
                out_id.append(did)
        return pd.DataFrame({"band_id": out_band, "band_hash": out_hash, "doc_id": out_id})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b})

    pairs = (
        sigs.map_batches(explode, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def drop_dup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["a", "b"]).map_groups(drop_dup_pairs, batch_format="pandas")


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
    """64-bit hashes of the word n-gram set (unique)."""
    toks = _normalize(text).split(" ")
    if len(toks) < n:
        grams = {" ".join(toks)}
    else:
        grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return np.fromiter((sha1_64(g) for g in grams), dtype=np.uint64, count=len(grams))


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    sa = set(_word_ngram_hashes(text_a, n).tolist())
    sb = set(_word_ngram_hashes(text_b, n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


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

    hasher = MinHasher(num_perm=num_perm, seed=42)

    class GramMinHasher:
        def __init__(self) -> None:
            self.h = hasher

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[["doc_id"]].copy()
            sigs = []
            for t in batch["text"]:
                g = _word_ngram_hashes(t, n)
                vals = (np.outer(self.h.a, g) + self.h.b[:, None]) % _MERSENNE
                sigs.append(vals.min(axis=1))
            out["sig"] = sigs
            return out

    sigs = ds.map_batches(GramMinHasher, batch_format="pandas", batch_size=256, concurrency=(1, 4))
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
        toks = _normalize(text).split(" ")
        grams = (
            [" ".join(toks[i : i + self.ngram]) for i in range(len(toks) - self.ngram + 1)]
            if len(toks) >= self.ngram
            else [" ".join(toks)]
        )
        if not grams:
            return 0
        hs = np.fromiter((sha1_64(g) for g in grams), dtype=np.uint64, count=len(grams))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        out = 0
        for i in range(64):
            if v[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        out["simhash"] = [np.uint64(self.simhash(t)) for t in batch["text"]]
        return out


def simhash_signatures(ds: ray.data.Dataset, ngram: int = 3, concurrency: int = 4) -> ray.data.Dataset:
    return ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"ngram": ngram},
        batch_format="pandas",
        batch_size=512,
        concurrency=(1, concurrency),
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_dedup(ds: ray.data.Dataset, max_hamming: int = 3, ngram: int = 3) -> ray.data.Dataset:
    """Near-dedup by simhash: bucket on 4 x 16-bit key segments (any
    pair within hamming distance 3 of 64 bits shares at least one
    16-bit segment exactly — pigeonhole), verify hamming, keep min id."""
    import ray as _ray

    sigs = simhash_signatures(ds, ngram=ngram)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        seg_id, seg_val, ids, full = [], [], [], []
        for did, h in zip(batch["doc_id"], batch["simhash"]):
            h = int(h)
            for s in range(4):
                seg_id.append(s)
                seg_val.append((h >> (16 * s)) & 0xFFFF)
                ids.append(did)
                full.append(np.uint64(h))
        return pd.DataFrame({"seg_id": seg_id, "seg_val": seg_val, "doc_id": ids, "simhash": full})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(g["doc_id"].tolist(), g["simhash"].tolist()))
        a, b = [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if hamming64(int(rows[i][1]), int(rows[j][1])) <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
        return pd.DataFrame({"a": a, "b": b})

    pairs = (
        sigs.map_batches(explode, batch_format="pandas")
        .groupby(["seg_id", "seg_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .take_all()
    )
    drop = {int(p["b"]) for p in pairs}
    drop_ref = _ray.put(drop)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        d = _ray.get(drop_ref)
        return batch[~batch["doc_id"].isin(d)]

    return ds.map_batches(keep, batch_format="pandas")
