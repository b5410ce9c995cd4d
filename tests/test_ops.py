"""Tests for corpus operators: dedup families, similarity search,
text analysis, multimodal plumbing, relational helpers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data

    rows = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "the quick brown fox jumps over the lazy dog again and again today",
                "the quick brown fox jumps over the lazy dog again and again today",  # exact dup of 0
                "the quick brown fox jumps over the lazy dog again and again tonight",  # near dup of 0
                "completely different content about distributed data processing systems",
                "streaming execution with backpressure across many worker nodes",
                "yet another unique document with its own words and phrasing here",
                "the quick brown fox jumps over the lazy dog again and again today!",  # near dup of 0
                "final document closing out the tiny corpus for the dedup tests",
            ],
        }
    )
    return ray.data.from_pandas(rows)


def test_exact_dedup(docs_ds):
    from pdf_extractor_ray.ops.dedup import exact_dedup

    kept = exact_dedup(docs_ds).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 2, 3, 4, 5, 6, 7]  # doc 1 == doc 0


def test_minhash_dedup_drops_near_dups(docs_ds):
    from pdf_extractor_ray.ops.dedup import minhash_dedup

    kept = sorted(minhash_dedup(docs_ds, threshold=0.8).to_pandas()["doc_id"])
    assert 0 in kept
    assert 1 not in kept  # exact dup caught
    assert 2 not in kept and 6 not in kept  # near dups caught
    assert {3, 4, 5, 7} <= set(kept)


def test_verify_byte_cap_forces_shuffle_path_same_kept_set(docs_ds):
    """A tiny broadcast_max_bytes must reject the broadcast tier (the
    candidate texts are measured, not just pair-counted) and fall
    through to the co-shuffle verify — with an identical kept set
    (shared kernel). Round-2 verdict #4 / advice item 1."""
    from pdf_extractor_ray.ops.dedup import (
        _verified_drop_anti_join,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    # repartition: join-ish stages must not see schema-less empty blocks
    ds = docs_ds.repartition(2)
    pairs = minhash_lsh_candidates(minhash_signatures(ds, num_perm=64, k=5), bands=16, rows=4)
    kw = dict(hash_kind="char", param=5, threshold=0.8)
    via_broadcast = _verified_drop_anti_join(ds, pairs, **kw).to_pandas()
    via_shuffle = _verified_drop_anti_join(ds, pairs, broadcast_max_bytes=1, **kw).to_pandas()
    assert sorted(via_broadcast["doc_id"]) == sorted(via_shuffle["doc_id"])
    assert 1 not in set(via_shuffle["doc_id"])  # exact dup still dropped


def test_minhash_jaccard_function():
    from pdf_extractor_ray.ops.dedup import jaccard

    assert jaccard("abcdefgh", "abcdefgh") == 1.0
    assert jaccard("abcdefgh", "zyxwvuts") == 0.0


def test_simhash_dedup(docs_ds):
    from pdf_extractor_ray.ops.dedup import SimHasher, hamming64, simhash_dedup

    h = SimHasher()
    a = h.simhash("the quick brown fox jumps over the lazy dog again and again today")
    b = h.simhash("the quick brown fox jumps over the lazy dog again and again tonight")
    c = h.simhash("completely different content about distributed data processing")
    assert hamming64(a, b) < hamming64(a, c)
    kept = sorted(simhash_dedup(docs_ds, max_hamming=3).to_pandas()["doc_id"])
    assert 1 not in kept and 0 in kept


def test_determinism_of_signatures():
    from pdf_extractor_ray.ops.dedup import MinHasher

    m1, m2 = MinHasher(num_perm=32), MinHasher(num_perm=32)
    s1 = m1.signature("some stable text for signatures")
    s2 = m2.signature("some stable text for signatures")
    assert (s1 == s2).all()


@pytest.fixture()
def emb_ds(ray_session):
    import ray.data

    rng = np.random.RandomState(7)
    base = rng.randn(40, 16).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.randn(16).astype(np.float32)  # near-dup of 0
    return ray.data.from_pandas(
        pd.DataFrame({"vec_id": range(40), "embedding": [v.tolist() for v in base]})
    ), base


def test_brute_force_topk_matches_numpy(emb_ds):
    from pdf_extractor_ray.ops.similarity import brute_force_topk

    ds, base = emb_ds
    q = base[0]
    out = brute_force_topk(ds, q, k=5)
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    expect = np.argsort(-(bn @ qn), kind="stable")[:5]
    assert out["vec_id"].tolist() == expect.tolist()
    assert out["cos"].iloc[0] == pytest.approx(1.0, abs=1e-5)


def test_ivf_topk_recall(emb_ds):
    from pdf_extractor_ray.ops.similarity import brute_force_topk, ivf_topk

    ds, base = emb_ds
    q = base[0]
    exact = set(brute_force_topk(ds, q, k=5)["vec_id"])
    approx = set(ivf_topk(ds, q, k=5, n_probe=4, n_centroids=4)["vec_id"])
    assert len(exact & approx) >= 3  # recall >= 0.6 on this tiny set


def test_embedding_neardup_pairs(emb_ds):
    from pdf_extractor_ray.ops.similarity import embedding_neardup_pairs

    ds, _ = emb_ds
    pairs = embedding_neardup_pairs(ds, threshold=0.99, n_centroids=4)
    assert [(0, 1)] == list(zip(pairs["a"], pairs["b"]))


def test_embedding_neardup_exact_matches_numpy(emb_ds):
    from pdf_extractor_ray.ops.similarity import embedding_neardup_exact

    ds, base = emb_ds
    out = embedding_neardup_exact(ds, threshold=0.8)
    b64 = base.astype(np.float64)
    bn = b64 / np.linalg.norm(b64, axis=1, keepdims=True)
    s = bn @ bn.T
    ii, jj = np.where(np.triu(s >= 0.8, k=1))
    assert list(zip(out["a"], out["b"])) == sorted(zip(ii.tolist(), jj.tolist()))
    assert (0, 1) in set(zip(out["a"], out["b"]))  # the planted near-dup


def test_text_analysis(ray_session):
    import ray.data

    from pdf_extractor_ray.ops.text_analysis import analyze

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "The quick brown fox and the lazy dog are in the yard.",
                "日本語の文章はここにあります。データ処理の話です。",
                "",
            ],
        }
    )
    out = analyze(ray.data.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert out["detected_lang"].tolist() == ["en", "ja", "und"]
    assert out["n_ws_tokens"].tolist() == [12, 1, 0]
    assert out["fingerprint"].iloc[0] == out["fingerprint"].iloc[0]  # deterministic, not NaN


def test_textstats_functions():
    from pdf_extractor_ray.functions import textstats

    assert textstats.grade(95) == "A" and textstats.grade(59) == "F"
    assert textstats.token_count("ab 12 x!") == 4
    assert textstats.detect_lang("der hund und die katze sind auf der straße") == "de"
    f1 = textstats.fingerprint("stable text " * 20)
    f2 = textstats.fingerprint("stable text " * 20)
    assert f1 == f2 and f1 > 0


def test_multimodal_featurize_real_codecs(ray_session):
    """Real PNG/BMP decode through the actor pool: correct dims, unit
    feature, per-row error for formats outside the pure-python subset
    (JPEG) and for garbage — never a raised batch."""
    import ray.data

    from pdf_extractor_ray.functions.media_codec import encode_bmp, encode_png
    from pdf_extractor_ray.ops.multimodal import featurize_images

    img = np.zeros((12, 20, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(20)[None, :] * 12 % 256
    tbl = pa.table(
        {
            "media_id": pa.array([1, 2, 3, 4], pa.int64()),
            "payload": pa.array(
                [encode_png(img), encode_bmp(img), b"\xff\xd8\xffdata", b""], pa.binary()
            ),
        }
    )
    out = featurize_images(ray.data.from_arrow(tbl), feat_dim=16).to_pandas().sort_values("media_id")
    assert out["format"].tolist() == ["png", "bmp", "jpeg", "unknown"]
    assert out["width"].tolist()[:2] == [20, 20] and out["height"].tolist()[:2] == [12, 12]
    assert out["error"].isna().tolist() == [True, True, False, False]
    assert "UnsupportedMediaError" in out["error"].iloc[2]
    # PNG and BMP of the SAME pixels produce the SAME real feature
    f = np.stack(out["feature"].to_numpy()[:2])
    assert np.allclose(f[0], f[1]) and abs(np.linalg.norm(f[0]) - 1.0) < 1e-5
    # deterministic across runs
    out2 = featurize_images(ray.data.from_arrow(tbl), feat_dim=16).to_pandas().sort_values("media_id")
    assert np.allclose(np.stack(out["feature"].to_numpy()), np.stack(out2["feature"].to_numpy()))


def test_multimodal_fake_codec_plumbing_still_available(ray_session):
    import ray.data

    from pdf_extractor_ray.ops.multimodal import featurize_images

    tbl = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"opaque-format-bytes"], pa.binary()),
        }
    )
    out = featurize_images(ray.data.from_arrow(tbl), feat_dim=8, codec="fake").to_pandas()
    assert out["error"].isna().all() and len(out["feature"][0]) == 8


def test_audio_featurize_real_wav(ray_session):
    import ray.data

    from pdf_extractor_ray.functions.media_codec import encode_wav
    from pdf_extractor_ray.ops.multimodal import featurize_audio

    t = np.arange(1600) / 8000.0
    tbl = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [encode_wav(0.4 * np.sin(2 * np.pi * 440 * t), 8000), b"ID3mp3data"], pa.binary()
            ),
        }
    )
    out = featurize_audio(ray.data.from_arrow(tbl), feat_dim=16).to_pandas().sort_values("media_id")
    assert out["format"].tolist() == ["wav", "mp3"]
    assert out["sample_rate"].iloc[0] == 8000
    assert abs(out["duration_s"].iloc[0] - 0.2) < 1e-3
    assert out["n_windows"].iloc[0] == 8
    assert out["error"].isna().iloc[0] and "UnsupportedMediaError" in out["error"].iloc[1]


def test_image_resize_stage(ray_session):
    import ray.data

    from pdf_extractor_ray.functions.media_codec import decode_png, encode_png
    from pdf_extractor_ray.ops.multimodal import resize_images

    img = np.random.RandomState(3).randint(0, 255, (32, 48, 3), dtype=np.uint8)
    tbl = pa.table(
        {"media_id": pa.array([7], pa.int64()), "payload": pa.array([encode_png(img)], pa.binary())}
    )
    out = resize_images(ray.data.from_arrow(tbl), 12, 8).to_pandas()
    assert out["error"].isna().all()
    back = decode_png(out["payload"][0])
    assert back.shape == (8, 12, 3)
    # nearest-neighbor: every output pixel exists in the source
    assert (back[0, 0] == img[0, 0]).all()


def test_broadcast_join_and_grouped_sum(ray_session):
    import ray.data

    from pdf_extractor_ray.ops.relational import broadcast_join, grouped_sum

    big = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 1, 3], "v": [10.0, 20.0, 30.0, 40.0]}))
    dim = pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    joined = broadcast_join(big, dim, on_big="k")
    out = grouped_sum(joined, ["name"], ["v"]).to_pandas().sort_values("name")
    assert out["sum_v"].tolist() == [40.0, 20.0, 40.0]
    assert out["n"].tolist() == [2, 1, 1]


def test_grouped_sum_decimal_exact(ray_session):
    """decimal_scale makes float sums exact and independent of
    partition/batch order: 0.1 * 30000 is NOT 3000.0 in naive float64
    accumulation, but is exact in scaled-int64 space."""
    import ray.data

    from pdf_extractor_ray.ops.relational import grouped_sum

    n = 30_000
    df = pd.DataFrame({"k": np.arange(n) % 3, "v": np.full(n, 0.1)})
    out = grouped_sum(ray.data.from_pandas(df), ["k"], ["v"], decimal_scale=4).to_pandas().sort_values("k")
    assert out["sum_v"].tolist() == [1000.0, 1000.0, 1000.0]
    assert out["n"].tolist() == [10_000, 10_000, 10_000]


def test_dedup_pairs_ds_exact_distinct(ray_session):
    """Every duplicate pair collapses to exactly one row even when the
    pair volume spans many batches/partitions (the old repartition(1)
    + default-batch drop_duplicates silently kept dupes past 1024
    rows)."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import dedup_pairs_ds

    a = np.repeat(np.arange(5000, dtype=np.int64), 3)  # each pair 3x
    b = a + 1_000_000
    pairs = ray.data.from_pandas(pd.DataFrame({"a": a, "b": b}))
    out = dedup_pairs_ds(pairs, num_partitions=8).to_pandas()
    assert len(out) == 5000
    assert not out.duplicated(["a", "b"]).any()


def _corpus_with_dups(n_unique: int, n_dups: int) -> pd.DataFrame:
    """Deterministic corpus: n_unique distinct docs (pseudo-random
    LETTER tokens — digit-heavy tokens share so many char 5-shingles
    that unrelated docs genuinely exceed Jaccard 0.8) + n_dups exact
    copies of the first n_dups docs under fresh ids."""

    def tok(v: int) -> str:
        out = []
        for _ in range(8):
            out.append(chr(97 + v % 26))
            v //= 26
        return "".join(out)

    texts = [
        " ".join(tok((i * 2654435761 + k * 97003) % (1 << 31)) for k in range(12))
        for i in range(n_unique)
    ]
    all_texts = texts + texts[:n_dups]
    return pd.DataFrame({"doc_id": np.arange(len(all_texts), dtype=np.int64), "text": all_texts})


def test_minhash_dedup_50k_docs_distributed(ray_session):
    """Scale shape test (VERDICT r1 item 2): 50k docs, 10% duplicate
    rate, fully distributed verify — every duplicate (higher id of
    each pair) must be dropped, no false drops of unique docs."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import minhash_dedup

    n_unique, n_dups = 45_000, 5_000
    df = _corpus_with_dups(n_unique, n_dups)
    ds = ray.data.from_pandas(df).repartition(16)
    kept = minhash_dedup(ds, threshold=0.8).to_pandas()
    kept_ids = set(kept["doc_id"])
    # all duplicate ids (>= n_unique) dropped, all originals kept
    assert len(kept) == n_unique
    assert kept_ids == set(range(n_unique))


def test_simhash_dedup_catches_exact_dups_at_volume(ray_session):
    import ray.data

    from pdf_extractor_ray.ops.dedup import simhash_dedup

    df = _corpus_with_dups(4_000, 400)
    ds = ray.data.from_pandas(df).repartition(8)
    kept = simhash_dedup(ds, max_hamming=3).to_pandas()
    # exact copies share the simhash -> hamming 0 -> dropped
    assert set(kept["doc_id"]) == set(range(4_000))


def test_grouped_sum_min_max(ray_session):
    import ray.data

    from pdf_extractor_ray.ops.relational import grouped_sum

    df = pd.DataFrame({"k": [1, 1, 2, 2, 2], "v": [3.0, -1.5, 10.0, 2.0, 7.5]})
    out = (
        grouped_sum(ray.data.from_pandas(df).repartition(3), ["k"], ["v"], decimal_scale=4, mins=["v"], maxs=["v"])
        .to_pandas()
        .sort_values("k")
    )
    assert out["min_v"].tolist() == [-1.5, 2.0]
    assert out["max_v"].tolist() == [3.0, 10.0]
    assert out["sum_v"].tolist() == [1.5, 19.5]
    assert out["n"].tolist() == [2, 3]


def test_top_terms(ray_session):
    import ray.data

    from pdf_extractor_ray.ops.text_analysis import top_terms

    df = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": ["a b b c", "b c c  c", "", "a  b"],
        }
    )
    out = top_terms(ray.data.from_pandas(df).repartition(3), k=2)
    # totals: a:2, b:4, c:4 — tie at 4 broken by term asc
    assert out["term"].tolist() == ["b", "c"]
    assert out["n_term"].tolist() == [4, 4]


def test_stratified_sample(ray_session):
    import ray.data

    from pdf_extractor_ray.ops.relational import stratified_sample

    df = pd.DataFrame({"doc_id": range(100), "lang": ["en", "de"] * 50})
    out = (
        stratified_sample(
            ray.data.from_pandas(df).repartition(4), "doc_id", "lang",
            {"en": 0.5}, default_rate=0.2, mod=10,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    en = out[out["lang"] == "en"]["doc_id"].to_numpy()
    de = out[out["lang"] == "de"]["doc_id"].to_numpy()
    assert (en % 10 < 5).all() and len(en) == 30  # en ids are even: 0,2,4 mod 10 in {0,2,4}
    assert (de % 10 < 2).all() and len(de) == 10  # de ids odd: only 1 mod 10
    # deterministic: identical under a different partitioning
    out2 = (
        stratified_sample(
            ray.data.from_pandas(df).repartition(9), "doc_id", "lang",
            {"en": 0.5}, default_rate=0.2, mod=10,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["doc_id"].tolist() == out2["doc_id"].tolist()


def test_pivot_sum(ray_session):
    import ray.data

    from pdf_extractor_ray.ops.relational import pivot_sum

    df = pd.DataFrame(
        {
            "k": ["x", "x", "x", "y", "y"],
            "cat": ["A", "B", "A", "B", "C"],
            "v": [1.5, 2.25, 3.0, 4.0, 5.5],
        }
    )
    out = (
        pivot_sum(
            ray.data.from_pandas(df).repartition(3), ["k"], "cat", "v",
            categories=["A", "B", "C"], decimal_scale=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["sum_v_A"].tolist() == [4.5, 0.0]
    assert out["sum_v_B"].tolist() == [2.25, 4.0]
    assert out["sum_v_C"].tolist() == [0.0, 5.5]
    assert out["n"].tolist() == [3, 2]


def test_grouped_quantiles(ray_session):
    import ray.data

    from pdf_extractor_ray.ops.relational import grouped_quantiles

    df = pd.DataFrame(
        {
            # a: 1..10 -> p50 = rank ceil(5) = 5, p90 = rank ceil(9) = 9
            # b: [10,20,30] -> p50 = rank 2 = 20, p90 = rank 3 = 30
            # c: [5,5,5,7] (dup values) -> p50 = rank 2 = 5, p90 = rank 4 = 7
            "k": ["a"] * 10 + ["b"] * 3 + ["c"] * 4,
            "v": [float(i) for i in range(1, 11)] + [10.0, 20.0, 30.0] + [5.0, 5.0, 5.0, 7.0],
        }
    )
    out = (
        grouped_quantiles(
            ray.data.from_pandas(df).repartition(5), ["k"], "v", qs=(0.5, 0.9)
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == ["a", "b", "c"]
    assert out["p50_v"].tolist() == [5.0, 20.0, 5.0]
    assert out["p90_v"].tolist() == [9.0, 30.0, 7.0]
    assert out["n"].tolist() == [10, 3, 4]


def test_tfidf_topk(ray_session):
    import math

    import ray.data

    from pdf_extractor_ray.ops.text_analysis import tfidf_topk

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a a b", "b c", "c c c d", ""],
        }
    )
    out = (
        tfidf_topk(ray.data.from_pandas(df).repartition(3), k=2)
        .to_pandas()
        .sort_values(["doc_id", "tfidf", "term"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    # df: a=1, b=2, c=2, d=1; N=4
    idf = {t: math.log(4 / d) for t, d in {"a": 1, "b": 2, "c": 2, "d": 1}.items()}
    # doc0: a tf=2 -> 2*ln4 top; b 1*ln2
    d0 = out[out.doc_id == 0]
    assert d0.term.tolist() == ["a", "b"]
    assert abs(d0.tfidf.iloc[0] - 2 * idf["a"]) < 1e-12
    # doc1: b and c tie at 1*ln2 -> term asc
    assert out[out.doc_id == 1].term.tolist() == ["b", "c"]
    # doc2: c 3*ln2 then d 1*ln4
    assert out[out.doc_id == 2].term.tolist() == ["c", "d"]
    # empty doc emits no rows
    assert (out.doc_id == 3).sum() == 0
    assert out.tf.dtype == "int64"


def test_tfidf_topk_shuffle_tier_matches_broadcast(ray_session):
    """broadcast_max_terms=0 forces the fully-distributed shuffle tier
    (no driver collect at all); it must be bit-identical to the
    broadcast tier on a vocabulary dominated by hapax terms (which the
    broadcast tier prunes from the map and defaults to ln N)."""
    import random

    import ray.data

    from pdf_extractor_ray.ops.text_analysis import tfidf_topk

    rng = random.Random(11)
    common = ["alpha", "beta", "gamma", "delta"]
    texts = []
    for i in range(40):
        toks = [rng.choice(common) for _ in range(rng.randint(2, 6))]
        toks += [f"hapax{i}_{j}" for j in range(rng.randint(0, 3))]  # df=1 tail
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": range(40), "text": texts})

    def run(cap):
        return (
            tfidf_topk(ray.data.from_pandas(df).repartition(5), k=3, broadcast_max_terms=cap)
            .to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )

    bcast, shuf = run(10**6), run(0)
    pd.testing.assert_frame_equal(bcast, shuf)  # exact, incl. float tfidf
    assert len(bcast) > 0


def test_unigram_logprob_hand_computed(ray_session):
    """CCNet-style unigram LM score against a hand-computed model:
    corpus 'a a b' / 'b c' => counts a=2 b=2 c=1, C=5."""
    import math

    import ray.data

    from pdf_extractor_ray.ops.text_analysis import unigram_logprob

    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a a b", "b c", ""]})
    out = (
        unigram_logprob(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ln = math.log
    exp0 = 2 * (ln(2) - ln(5)) + 1 * (ln(2) - ln(5))
    exp1 = (ln(2) - ln(5)) + (ln(1) - ln(5))
    assert out.doc_id.tolist() == [0, 1]  # token-less doc emits no row
    assert out.n_ws_tokens.tolist() == [3, 2]
    assert abs(out.logprob.iloc[0] - exp0) < 1e-12
    assert abs(out.logprob.iloc[1] - exp1) < 1e-12
    assert abs(out.avg_logprob.iloc[0] - exp0 / 3) < 1e-12
    assert out.n_ws_tokens.dtype == "int64"


def test_unigram_logprob_shuffle_tier_matches_broadcast(ray_session):
    """broadcast_max_terms=0 forces the fully-distributed tier; it must
    be bit-identical to the broadcast tier (both sum each doc's terms
    in (doc_id, term) order with math.log per distinct term), on a
    vocabulary with a singleton tail (pruned from the broadcast map)."""
    import random

    import ray.data

    from pdf_extractor_ray.ops.text_analysis import unigram_logprob

    rng = random.Random(7)
    common = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = []
    for i in range(40):
        toks = [rng.choice(common) for _ in range(rng.randint(2, 8))]
        toks += [f"once{i}_{j}" for j in range(rng.randint(0, 2))]  # c=1 tail
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": range(40), "text": texts})

    def run(cap):
        return (
            unigram_logprob(
                ray.data.from_pandas(df).repartition(5), broadcast_max_terms=cap
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    bcast, shuf = run(10**6), run(0)
    pd.testing.assert_frame_equal(bcast, shuf)  # exact, incl. float logprob
    assert len(bcast) == 40


def test_bigram_logprob_hand_computed(ray_session):
    """Conditional bigram LM against a hand-computed model: corpus
    'a b a b' / 'a b c' / 'x' => bigram counts (a b)=3, (b a)=1,
    (b c)=1; head counts a=3, b=2. P(b|a)=3/3, P(a|b)=1/2, P(c|b)=1/2.
    Docs with <2 tokens emit no row."""
    import math

    import ray.data

    from pdf_extractor_ray.ops.text_analysis import bigram_logprob

    df = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "text": ["a b a b", "a b c", "x", ""]}
    )
    out = (
        bigram_logprob(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ln = math.log
    # doc 0: (a b) + (b a) + (a b) = 2*ln(3/3) + ln(1/2)
    exp0 = 2 * (ln(3) - ln(3)) + (ln(1) - ln(2))
    # doc 1: (a b) + (b c) = ln(3/3) + ln(1/2)
    exp1 = (ln(3) - ln(3)) + (ln(1) - ln(2))
    assert out.doc_id.tolist() == [0, 1]  # 1-token and empty docs: no row
    assert out.n_bigrams.tolist() == [3, 2]
    assert abs(out.logprob.iloc[0] - exp0) < 1e-12
    assert abs(out.logprob.iloc[1] - exp1) < 1e-12
    assert abs(out.avg_logprob.iloc[0] - exp0 / 3) < 1e-12
    assert out.n_bigrams.dtype == "int64"


def test_bigram_logprob_shuffle_tier_matches_broadcast(ray_session):
    """broadcast_max_terms=0 forces the head-keyed shuffle tier; it must
    be bit-identical to the broadcast tier (both sum each doc's rows in
    (doc_id, gram) order with math.log per distinct count), on a corpus
    with a singleton gram/head tail (pruned from the broadcast map)."""
    import random

    import ray.data

    from pdf_extractor_ray.ops.text_analysis import bigram_logprob

    rng = random.Random(11)
    common = ["alpha", "beta", "gamma", "delta"]
    texts = []
    for i in range(40):
        toks = [rng.choice(common) for _ in range(rng.randint(2, 9))]
        toks += [f"once{i}_{j}" for j in range(rng.randint(0, 2))]  # singleton tail
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": range(40), "text": texts})

    def run(cap):
        return (
            bigram_logprob(
                ray.data.from_pandas(df).repartition(5), broadcast_max_terms=cap
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    bcast, shuf = run(10**6), run(0)
    pd.testing.assert_frame_equal(bcast, shuf)  # exact, incl. float logprob
    assert len(bcast) == 40


def test_dup_span_scrub_hand_computed(ray_session):
    """C4-style duplicated-span removal against a hand-worked case:
    the shared 3-gram 'a b c' covers tokens in both docs; overlapping
    duplicated grams expand coverage without double-removal; token-less
    docs emit no row; short docs pass through unchanged."""
    import ray.data

    from pdf_extractor_ray.ops.scrub import dup_span_scrub

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "a b c d e f",  # grams 'a b c' (dup) -> drop a,b,c
                "x a b c y z",  # same dup gram mid-doc
                "unique tokens only here now",
                "",  # token-less: no output row
                "hi",  # shorter than n: unchanged
            ],
        }
    )
    out = (
        dup_span_scrub(ray.data.from_pandas(df).repartition(2), n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [0, 1, 2, 4]
    assert out.text.tolist() == ["d e f", "x y z", "unique tokens only here now", "hi"]
    assert out.n_tokens.tolist() == [6, 6, 5, 1]
    assert out.n_removed_tokens.tolist() == [3, 3, 0, 0]
    assert out.n_tokens.dtype == "int64"


def test_dup_span_scrub_within_doc_repeat_and_overlap(ray_session):
    """Within-doc repeats count toward the duplication threshold (the
    gram occurs twice in ONE doc -> removed), and overlapping dup-gram
    occurrences merge into one covered interval."""
    import ray.data

    from pdf_extractor_ray.ops.scrub import dup_span_scrub

    # 'p q p q p q': grams (n=2) 'p q' x3 and 'q p' x2 -> all covered
    df = pd.DataFrame({"doc_id": [0], "text": ["p q p q p q"]})
    out = dup_span_scrub(ray.data.from_pandas(df), n=2).to_pandas()
    assert out.text.tolist() == [""]
    assert out.n_removed_tokens.tolist() == [6]


def test_dup_span_scrub_positional_tier_matches_broadcast(ray_session):
    """broadcast_max_grams=0 forces the fully-distributed positional
    tier; results must be identical to the broadcast tier on a corpus
    with cross-doc, within-doc, and overlapping duplication."""
    import random

    import ray.data

    from pdf_extractor_ray.ops.scrub import dup_span_scrub

    rng = random.Random(11)
    vocab = [f"w{k}" for k in range(30)]
    boiler = "the quick brown fox jumps over lazy dogs"
    texts = []
    for i in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randint(5, 25))]
        if i % 3 == 0:  # inject shared boilerplate span
            cut = rng.randint(0, len(toks))
            toks = toks[:cut] + boiler.split() + toks[cut:]
        texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": range(30), "text": texts})

    def run(cap):
        return (
            dup_span_scrub(
                ray.data.from_pandas(df).repartition(4), n=4, broadcast_max_grams=cap
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    bcast, shuf = run(10**6), run(0)
    pd.testing.assert_frame_equal(bcast, shuf)
    assert len(bcast) == 30
    assert (bcast.n_removed_tokens > 0).any()  # boilerplate actually removed


def test_length_histogram_hand_computed(ray_session):
    """Bucketing by n_tokens // width with exact doc and token mass per
    bucket; empty docs land in bucket 0."""
    import ray.data

    from pdf_extractor_ray.ops.text_analysis import length_histogram

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b c", "d e", "one " * 70, ""],  # 3, 2, 70, 0 tokens
        }
    )
    out = (
        length_histogram(ray.data.from_pandas(df).repartition(2), bucket_tokens=64)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert out.bucket.tolist() == [0, 1]
    assert out.lo_tokens.tolist() == [0, 64]
    assert out.n_docs.tolist() == [3, 1]
    assert out.sum_tokens.tolist() == [5, 70]
    assert out.n_docs.dtype == "int64"


def test_term_postings_hand_computed(ray_session):
    """df counts documents (not occurrences), cf counts occurrences,
    postings are sorted doc ids, and sub-min_df terms are filtered
    in-partition."""
    import ray.data

    from pdf_extractor_ray.ops.text_analysis import term_postings

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["apple apple pear", "apple fig", "pear fig fig unique"],
        }
    )
    out = (
        term_postings(ray.data.from_pandas(df).repartition(2), min_df=2)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    assert out.term.tolist() == ["apple", "fig", "pear"]
    assert out.df.tolist() == [2, 2, 2]
    assert out.cf.tolist() == [3, 3, 2]  # apple 2+1, fig 1+2, pear 1+1
    assert out.postings.tolist() == ["0,1", "1,2", "0,2"]


def test_connected_components_shapes(ray_session):
    """BSP min-label propagation resolves chains (diameter > 1 round),
    stars, self-loops and isolated pairs to min-id components."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import connected_components

    pairs = pd.DataFrame(
        {
            "a": [1, 2, 3, 4, 10, 10, 10, 20, 30, 7, 5],
            "b": [2, 3, 4, 5, 11, 12, 13, 20, 31, 1, 7],
        }
    )  # 1-2-3-4-5 chain closed into a ring via 7; star at 10; loop 20; pair 30-31
    results = []
    for cap in (10**6, 0):  # union-find fast tier AND the BSP scale tier
        out = (
            connected_components(
                ray.data.from_pandas(pairs).repartition(3), broadcast_max_pairs=cap
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        results.append(out)
    pd.testing.assert_frame_equal(results[0], results[1])  # tiers agree
    comp = dict(zip(results[0].node, results[0].component))
    assert {comp[k] for k in (1, 2, 3, 4, 5, 7)} == {1}
    assert {comp[k] for k in (10, 11, 12, 13)} == {10}
    assert comp[20] == 20 and comp[30] == 30 and comp[31] == 30
    # empty input -> empty typed output
    empty = connected_components(ray.data.from_pandas(pd.DataFrame({"a": [], "b": []})))
    assert empty.count() == 0


def test_dup_ngram_components_hand_computed(ray_session):
    """Docs sharing a duplicated n-gram cluster together; transitive
    sharing merges clusters; within-doc-only duplication makes a
    singleton component; clean docs emit nothing."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import dup_ngram_components

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "a b c x1 y1",      # shares 'a b c' with doc1
                "a b c x2 y2 d e f",  # ...and 'd e f' with doc2 -> {0,1,2}
                "d e f x3 y3",
                "q r s q r s",      # within-doc repeat -> singleton {3}
                "totally clean words here",
            ],
        }
    )
    out = (
        dup_ngram_components(ray.data.from_pandas(df).repartition(2), n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [0, 1, 2, 3]
    assert out.component.tolist() == [0, 0, 0, 3]


def test_hot_bucket_star_cap(ray_session):
    """A bucket bigger than the cap emits k-1 star pairs, not k^2/2,
    and mass-identical docs still dedup to one survivor."""
    import pandas as pd

    from pdf_extractor_ray.ops.dedup import _pairs_in_buckets, minhash_dedup

    g = pd.DataFrame({"band_id": 0, "band_hash": 7, "doc_id": range(1000)})
    pairs = _pairs_in_buckets(g, ["band_id", "band_hash"], hot_bucket_cap=256).to_pandas()
    assert len(pairs) == 999
    assert (pairs["a"] == 0).all()

    import ray.data

    docs = pd.DataFrame({"doc_id": range(600), "text": ["same exact text here okay"] * 600})
    kept = minhash_dedup(ray.data.from_pandas(docs).repartition(4), threshold=0.8).to_pandas()
    assert len(kept) == 1 and kept.doc_id.iloc[0] == 0


def test_srp_neardup_matches_exact_on_clusters(ray_session):
    """Signed-random-projection LSH near-dup: every reported pair is a
    TRUE pair (verified cosine), recall vs the exact all-pairs baseline
    is high at tight thresholds, and the result is seed-deterministic."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import embedding_neardup_exact, srp_neardup_pairs

    rng = np.random.RandomState(4)
    base = rng.randn(12, 32)
    vecs, ids = [], []
    vid = 0
    for i in range(12):
        for j in range(3):  # 3 near-copies per cluster
            v = base[i] + rng.randn(32) * 0.02
            vecs.append((v / np.linalg.norm(v)).astype(np.float64).tolist())
            ids.append(vid)
            vid += 1
    df = pd.DataFrame({"vec_id": ids, "embedding": vecs})
    ds = ray.data.from_pandas(df).repartition(4)

    exact = embedding_neardup_exact(ds, threshold=0.98)
    exact_pairs = set(zip(exact["a"], exact["b"]))
    got = srp_neardup_pairs(ds, threshold=0.98, n_bits=64, bands=8)
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs <= exact_pairs  # no false positives: cosine verified
    assert len(got_pairs) >= 0.8 * len(exact_pairs) > 0  # LSH recall
    # deterministic for a fixed seed
    again = srp_neardup_pairs(ds, threshold=0.98, n_bits=64, bands=8)
    assert set(zip(again["a"], again["b"])) == got_pairs
    assert (got["cos"] >= 0.98).all()


def test_kmeans_fit_recovers_separated_clusters(ray_session):
    """Distributed spherical k-means on 3 well-separated direction
    bundles: the fit recovers one centroid per bundle (every member's
    nearest centroid is its bundle's), deterministically across runs."""
    import ray.data

    from pdf_extractor_ray.ops.cluster import kmeans_assign, kmeans_fit

    rng = np.random.RandomState(9)
    base = np.eye(3).repeat(1, axis=0)  # 3 orthogonal directions in R^3
    vecs, labels = [], []
    for i in range(3):
        for _ in range(40):
            v = base[i] + rng.randn(3) * 0.05
            vecs.append((v / np.linalg.norm(v)).tolist())
            labels.append(i)
    df = pd.DataFrame({"vec_id": range(120), "embedding": vecs, "label": labels})
    ds = ray.data.from_pandas(df).repartition(5)

    cents = kmeans_fit(ds, k=3, iters=5)
    assert cents.shape == (3, 3)
    out = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    # perfect purity: each bundle maps to exactly one cluster id
    tab = out.groupby("label")["cluster"].nunique()
    assert (tab == 1).all()
    assert out.groupby("cluster")["label"].nunique().eq(1).all()
    # deterministic refit
    cents2 = kmeans_fit(ds, k=3, iters=5)
    np.testing.assert_array_equal(cents, cents2)


def test_semantic_dedup_single_cluster_equals_exact_baseline(ray_session):
    """With n_clusters=1 there is no cross-cluster blindness, so the
    SemDeDup keep-set must EXACTLY equal the all-pairs baseline's
    earlier-anchor keep-set; at n_clusters>1 every drop must still be a
    true pair (precision 1.0 by construction)."""
    import ray.data

    from pdf_extractor_ray.ops.cluster import semantic_dedup
    from pdf_extractor_ray.ops.similarity import embedding_neardup_exact

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).repartition(6)
    pairs = embedding_neardup_exact(ds, threshold=0.45)
    dropped_exact = set(pairs["b"].tolist())  # b > a: drop iff ANY earlier pair
    assert len(dropped_exact) > 0

    kept1 = semantic_dedup(ds, threshold=0.45, n_clusters=1).to_pandas()
    assert set(range(500)) - set(kept1.vec_id.tolist()) == dropped_exact

    kept8 = semantic_dedup(ds, threshold=0.45, n_clusters=8).to_pandas()
    dropped8 = set(range(500)) - set(kept8.vec_id.tolist())
    assert dropped8 <= dropped_exact  # precision 1.0
    # deterministic
    again = semantic_dedup(ds, threshold=0.45, n_clusters=8).to_pandas()
    assert set(again.vec_id.tolist()) == set(kept8.vec_id.tolist())


def test_semantic_dedup_drops_tight_duplicates(ray_session):
    """The SemDeDup operating point: near-identical copies (cos ~0.999)
    of well-separated bases land in their base's cluster and every copy
    after the first is dropped — full recall when duplicates are tight,
    the regime the method is designed for."""
    import ray.data

    from pdf_extractor_ray.ops.cluster import semantic_dedup

    rng = np.random.RandomState(4)
    base = rng.randn(6, 16)
    vecs, ids = [], []
    vid = 0
    for i in range(6):
        for _ in range(5):  # 5 near-copies per base
            v = base[i] + rng.randn(16) * 0.001
            vecs.append((v / np.linalg.norm(v)).astype(np.float64).tolist())
            ids.append(vid)
            vid += 1
    df = pd.DataFrame({"vec_id": ids, "embedding": vecs})
    ds = ray.data.from_pandas(df).repartition(4)
    kept = semantic_dedup(ds, threshold=0.99, n_clusters=6).to_pandas()
    # exactly one representative per bundle: the lowest id (0,5,10,...)
    assert sorted(kept.vec_id.tolist()) == [0, 5, 10, 15, 20, 25]


def test_gopher_repetition_hand_computed(ray_session):
    """Repetition signals against a hand-worked doc:
    'a b a b a b c' -> top-2-gram 'a b' x3 (mass 9/13), dup-3-grams
    'a b a' (x2, starts 0,2) and 'b a b' (x2, starts 1,3) cover token
    positions 0..5 of 7 (interval union — no double count). Docs with
    too few tokens and empty docs emit zeroed rows."""
    import ray.data

    from pdf_extractor_ray.ops.quality import gopher_repetition

    df = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["a b a b a b c", "x y", ""]}
    )
    out = (
        gopher_repetition(ray.data.from_pandas(df).repartition(2), dup_n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.n_words.tolist() == [7, 2, 0]
    assert abs(out.top2_frac.iloc[0] - 3 * 3 / 13) < 1e-12
    # 'a b a' and 'b a b' both repeat; 6 of 7 positions covered
    assert abs(out.dup3_frac.iloc[0] - 6 / 7) < 1e-12
    # doc 1: one 2-gram 'x y' (count 1, mass 3/3), no 3-grams
    assert abs(out.top2_frac.iloc[1] - 3 / 3) < 1e-12
    assert out.top3_frac.iloc[1] == 0.0 and out.dup3_frac.iloc[1] == 0.0
    assert (out.iloc[2][["top2_frac", "top3_frac", "top4_frac", "dup3_frac"]] == 0).all()
    # tie-break: two grams tied at count 2 -> lexicographically smallest
    df2 = pd.DataFrame({"doc_id": [0], "text": ["z w z w q q q q"]})
    out2 = gopher_repetition(ray.data.from_pandas(df2), dup_n=3).to_pandas()
    # 2-gram counts: 'z w' x2, 'w z' x1, 'q q' x3 -> 'q q' wins (count)
    assert abs(out2.top2_frac.iloc[0] - 3 * 3 / 15) < 1e-12


def test_global_rank_matches_row_number(ray_session):
    """Distributed global rank vs pandas sort_values row numbering:
    skewed leading key (a hot value bigger than any range partition's
    fair share), descending lead + ascending tiebreak, string keys, and
    the top-frac/top-n cutoffs (exact against the full ordering)."""
    import ray.data

    from pdf_extractor_ray.ops.rank import global_rank, select_top_frac

    rng = np.random.RandomState(5)
    vals = np.concatenate([rng.randint(0, 50, 3000), np.full(500, 7)])  # hot 7
    df = pd.DataFrame({"id": range(len(vals)), "v": vals})
    ds = ray.data.from_pandas(df).repartition(9)
    ref = df.sort_values(["v", "id"], ascending=[False, True]).reset_index(drop=True)

    out = (
        global_rank(ds, ["v", "id"], [False, True], rank_col="r")
        .to_pandas()
        .sort_values("r")
        .reset_index(drop=True)
    )
    assert (out.r.to_numpy() == np.arange(1, len(df) + 1)).all()
    assert (out.id.to_numpy() == ref.id.to_numpy()).all()

    sel = (
        select_top_frac(ds, ["v", "id"], [False, True], 0.25, keep_cols=["id"], rank_col="r")
        .to_pandas()
        .sort_values("r")
        .reset_index(drop=True)
    )
    want = int(np.ceil(0.25 * len(df)))
    assert len(sel) == want
    assert (sel.id.to_numpy() == ref.id.to_numpy()[:want]).all()
    assert list(sel.columns) == ["id", "r"]

    # string lead key, ascending
    sdf = pd.DataFrame({"id": range(200), "s": [f"k{(i * 37) % 50:03d}" for i in range(200)]})
    sout = (
        global_rank(ray.data.from_pandas(sdf).repartition(5), ["s", "id"], rank_col="r")
        .to_pandas()
        .sort_values("r")
        .reset_index(drop=True)
    )
    sref = sdf.sort_values(["s", "id"]).reset_index(drop=True)
    assert (sout.id.to_numpy() == sref.id.to_numpy()).all()


def test_srp_neardup_recall_on_fixture_embeddings(ray_session):
    """Recall bound for the REGISTERED driver query's parameters
    (threshold 0.4, 16 bands x 4 bits — see __ray_entry__
    _srp_neardup_docs) against the exact all-pairs baseline on the
    driver's own embeddings table."""
    import os

    import ray.data

    from pdf_extractor_ray.ops.similarity import embedding_neardup_exact, srp_neardup_pairs

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):  # pragma: no cover — driver testdata absent
        import pytest

        pytest.skip("driver testdata not present")
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    exact = embedding_neardup_exact(ds, threshold=0.4)
    exact_pairs = set(zip(exact["a"], exact["b"]))
    got = srp_neardup_pairs(ds, threshold=0.4, n_bits=64, bands=16)
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs <= exact_pairs  # cosine-verified: no false positives
    assert len(exact_pairs) > 0
    assert len(got_pairs) >= 0.8 * len(exact_pairs), (len(got_pairs), len(exact_pairs))


def test_video_featurize_real_avi(ray_session):
    import ray.data

    from pdf_extractor_ray.functions.media_codec import encode_avi
    from pdf_extractor_ray.ops.multimodal import featurize_videos

    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 255, (12, 16, 3), dtype=np.uint8) for _ in range(9)]
    tbl = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([encode_avi(frames, fps=8.0), b"not a video"], pa.binary()),
        }
    )
    out = featurize_videos(ray.data.from_arrow(tbl), every=4).to_pandas().sort_values("media_id")
    ok = out.iloc[0]
    assert ok["format"] == "avi" and ok["error"] is None
    assert (ok["n_frames"], ok["n_sampled"]) == (9, 3)  # frames 0,4,8
    assert (ok["width"], ok["height"]) == (16, 12) and abs(ok["fps"] - 8.0) < 1e-5
    assert abs(np.linalg.norm(np.asarray(ok["feature"])) - 1.0) < 1e-5
    assert out.iloc[1]["error"] is not None


def test_page_links_and_host_edges(ray_session):
    """Anchor extraction (absolute flag, non-HTML rows contribute
    nothing) and weighted cross-host edge aggregation."""
    import ray.data

    from pdf_extractor_ray.ops.linkgraph import host_edges, page_links

    pages = pd.DataFrame(
        {
            "url": ["https://a.example/1", "https://b.example/2", "https://c.example/3"],
            "html": [
                b'<html><body><a href="https://b.example/x">b</a> '
                b'<a href="/rel">rel</a> <a href="https://c.example/y">c</a></body></html>',
                b'<html><body><a href="https://c.example/z">c</a> '
                b'<a href="https://c.example/w">c2</a></body></html>',
                b"%PDF-1.4 not html",
            ],
        }
    )
    ds = ray.data.from_pandas(pages).repartition(2)
    links = page_links(ds).to_pandas().sort_values(["url", "href"]).reset_index(drop=True)
    assert len(links) == 5
    assert links.absolute.sum() == 4  # /rel is relative
    edges = host_edges(page_links(ds)).to_pandas().sort_values(["src_host", "dst_host"])
    assert edges.values.tolist() == [
        ["a.example", "b.example", 1],
        ["a.example", "c.example", 1],
        ["b.example", "c.example", 2],
    ]


def test_pagerank_tiers_match_reference(ray_session):
    """Both PageRank tiers (driver-side power iteration and the BSP
    exchange path) agree with a hand-rolled dense reference, including
    dangling-mass redistribution; rank mass is conserved."""
    import ray.data

    from pdf_extractor_ray.ops.linkgraph import pagerank

    edges = pd.DataFrame(
        {
            "src_host": ["a", "a", "b"],
            "dst_host": ["b", "c", "c"],
            "n": [1, 1, 1],
        }
    )  # c is dangling
    ds = ray.data.from_pandas(edges).repartition(2)

    def reference(n):
        r = np.full(3, 1 / 3)
        for _ in range(n):
            dang = r[2]
            new = np.full(3, 0.15 / 3 + 0.85 * dang / 3)
            new[1] += 0.85 * (r[0] / 2)
            new[2] += 0.85 * (r[0] / 2 + r[1])
            r = new
        return r

    fast = pagerank(ds, n_iters=15).to_pandas().sort_values("host").reset_index(drop=True)
    bsp = (  # fewer rounds: each BSP round is a real exchange
        pagerank(ds, n_iters=4, broadcast_max_edges=0)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    for out, n in ((fast, 15), (bsp, 4)):
        assert out.host.tolist() == ["a", "b", "c"]
        assert np.allclose(out["rank"].to_numpy(), reference(n), atol=1e-12)
        assert abs(out["rank"].sum() - 1.0) < 1e-9


def test_naive_bayes_hand_computed(ray_session):
    """NB fit/predict against a hand-worked 2-class corpus: class a
    tokens {x:3,y:1,z:1} (T=5), class b {y:3,z:3} (T=6), V=3, alpha=1.
    ll(a,x)=ln4-ln8; unseen x in b takes the default ln1-ln9."""
    import math

    import ray.data

    from pdf_extractor_ray.ops.classify import nb_fit, nb_predict

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "lang": ["a", "a", "b", "b"],
            "text": ["x x y", "x z", "y y z", "y z z"],
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    m = nb_fit(ds)
    assert m.classes == ["a", "b"] and m.meta["vocab"] == 3
    assert abs(m.table.loc["x", "a"] - (math.log(4) - math.log(8))) < 1e-12
    assert abs(m.default[1] - (math.log(1) - math.log(9))) < 1e-12
    pred = nb_predict(ds, m).to_pandas().sort_values("doc_id").reset_index(drop=True)
    s_a = math.log(0.5) + 2 * (math.log(4) - math.log(8)) + (math.log(2) - math.log(8))
    assert pred.pred.tolist() == ["a", "a", "b", "b"]
    assert abs(pred.score.iloc[0] - s_a) < 1e-12
    # token-less doc still emits a prior-only row (argmax of priors;
    # equal priors here tie-break to the lexicographically first class)
    df2 = pd.DataFrame({"doc_id": [9], "lang": ["b"], "text": [""]})
    p2 = nb_predict(ray.data.from_pandas(df2), m).to_pandas()
    assert p2.pred.iloc[0] == "a" and abs(p2.score.iloc[0] - math.log(0.5)) < 1e-12


def test_naive_bayes_hashed_tier_matches_exact(ray_session):
    """Hashed-feature scale tier with a collision-free bucket space
    (2^40 buckets over a 31-term vocabulary) must reproduce the exact
    tier's occupied-bucket vocabulary, every prediction, and scores up
    to float reassociation; self-accuracy must beat the majority-class
    baseline (the classifier has real signal, not just priors)."""
    import ray.data

    from pdf_extractor_ray.ops.classify import nb_fit, nb_predict

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    exact = nb_fit(docs)
    hashed = nb_fit(docs, broadcast_max_terms=10, n_buckets=1 << 40)
    assert hashed.n_buckets == 1 << 40
    assert hashed.meta["vocab"] == exact.meta["vocab"]
    pe = nb_predict(docs, exact).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ph = nb_predict(docs, hashed).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (pe.pred == ph.pred).all()
    assert (pe.score - ph.score).abs().max() < 1e-9
    truth = docs.to_pandas()[["doc_id", "lang"]]
    j = pe.merge(truth, on="doc_id")
    majority = truth.lang.value_counts().max() / len(truth)
    assert (j.pred == j.lang).mean() > majority


def test_average_hash_hand_computed():
    """aHash on a constructed 16x16 image whose left half is black and
    right half is white: luma cells 0..3 of each row dark, 4..7
    bright; mean halfway -> exactly the right-half bits set. A +1
    brightness perturbation must not change the hash (block means move
    together); an inverted image flips every bit."""
    import numpy as np

    from pdf_extractor_ray.ops.multimodal import average_hash

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, 8:, :] = 200
    h = average_hash(img)
    want = 0
    for r in range(8):
        for c in range(4, 8):
            want |= 1 << (r * 8 + c)
    assert h == want
    assert average_hash(np.clip(img.astype(np.int64) + 1, 0, 255).astype(np.uint8)) == h
    inv = (200 - img).astype(np.uint8)
    assert average_hash(inv) == (~want) & ((1 << 64) - 1)


def test_image_neardup_matches_bruteforce(ray_session):
    """Pigeonhole aHash pair search over the real-binary media table
    equals a brute-force hamming scan (exact at max_hamming <= 3 by
    the segment guarantee), emits each pair exactly once, and the
    dedup keep-set is the corpus minus every pair's larger id."""
    import numpy as np
    import ray.data

    import __ray_entry__ as e
    from pdf_extractor_ray.ops.multimodal import (
        image_ahashes,
        image_dedup,
        image_neardup_pairs,
    )

    media = e._media_table("/root/testdata/sf0.001", "image")
    sigs = image_ahashes(media).to_pandas()
    assert sigs.error.isna().all()
    pairs = image_neardup_pairs(media, max_hamming=3).to_pandas()
    assert not pairs.duplicated(["a", "b"]).any()
    ids = sigs.media_id.to_numpy()
    vals = sigs.ahash.to_numpy().astype(np.uint64)
    bf = set()
    for i in range(len(ids)):
        x = vals[i] ^ vals[i + 1 :]
        ham = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero(ham <= 3)[0]:
            a, b = sorted((int(ids[i]), int(ids[i + 1 + j])))
            bf.add((a, b))
    assert set(map(tuple, pairs[["a", "b"]].to_numpy())) == bf
    kept = image_dedup(media, max_hamming=3).to_pandas()
    assert set(kept.media_id) == set(ids) - {b for _, b in bf}


def test_md5_u52_matches_hashlib():
    """md5_u52 must equal int(hexdigest()[:13], 16) — the value DuckDB
    computes from ('0x' || substr(md5(s), 1, 13))::UBIGINT — across
    block-count boundaries (55/56 and 119/120 bytes) and non-ASCII."""
    import hashlib

    from pdf_extractor_ray.ops.scrub import md5_first_nibble, md5_u52

    strs = ["", "0", "abc", "héllo wörld", "12345678901234567890"] + [
        "x" * n for n in (54, 55, 56, 63, 64, 65, 119, 120, 121, 200)
    ] + [str(i) for i in range(100)]
    got = md5_u52(strs)
    want = [int(hashlib.md5(s.encode()).hexdigest()[:13], 16) for s in strs]
    assert list(got) == want
    nib = md5_first_nibble(strs)
    assert list(nib) == [int(hashlib.md5(s.encode()).hexdigest()[0], 16) for s in strs]


def _exact_gram_counts(texts, n):
    from collections import Counter

    c = Counter()
    for t in texts:
        w = t.split()
        for i in range(len(w) - n + 1):
            c[" ".join(w[i : i + n])] += 1
    return c


def test_cms_heavy_grams_exact_at_any_width(ray_session):
    """The CMS prefilter + exact confirm must equal the exact GROUP BY
    at ANY sketch width — including width=16, where nearly every
    bucket collides (collisions only admit extra candidates; the
    confirm pass removes them)."""
    import ray.data

    from pdf_extractor_ray.ops.sketch import cms_heavy_grams

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["text"])
    for ngram, threshold in ((2, 10), (1, 50)):
        exact = _exact_gram_counts(docs.text, ngram)
        want = sorted((g, c) for g, c in exact.items() if c >= threshold)
        for width in (16, 1 << 12):
            ds = ray.data.from_pandas(docs).repartition(4)
            out = cms_heavy_grams(ds, ngram=ngram, threshold=threshold, width=width)
            assert list(map(tuple, out.to_numpy())) == want, (ngram, width)


def test_kmv_distinct_estimate_and_exact_path(ray_session):
    """KMV with k above the true cardinality returns the EXACT distinct
    count (the bottom-k set is the whole value set); with k below it
    the estimate lands within the published ~2/sqrt(k) error band.
    Partitioning must not change the result (bottom-k merge is
    lossless)."""
    import ray.data

    from pdf_extractor_ray.ops.sketch import kmv_distinct

    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet", columns=["event_type", "user_id"]
    )
    truth = ev.groupby("event_type").user_id.nunique()
    for parts in (1, 7):
        ds = ray.data.from_pandas(ev).repartition(parts)
        exact = kmv_distinct(ds, "event_type", "user_id", k=100000)
        assert dict(zip(exact.event_type, exact.kmv_est)) == {
            k: float(v) for k, v in truth.items()
        }
        est = kmv_distinct(ds, "event_type", "user_id", k=64)
        for t, e in zip(est.event_type, est.kmv_est):
            n = truth[t]
            if n >= 64:
                assert abs(e - n) / n < 0.25, (t, e, n)
            else:
                assert e == float(n)


def test_c4_line_filter_rules(ray_session):
    """C4 §2.2 line rules on handcrafted docs: terminal punctuation
    required (incl. the CJK full stop), ellipsis endings rejected,
    <5-word lines dropped, 'javascript' lines dropped; doc-level
    lorem-ipsum / curly-brace / min-3-kept-lines gates; filtered text
    is the kept stripped lines in original order."""
    import ray.data

    from pdf_extractor_ray.ops.quality import c4_filter, c4_signals

    good3 = "One two three four five.\nSix seven eight nine ten!\nA b c d e?"
    docs = pd.DataFrame(
        {
            "doc_id": range(7),
            "text": [
                good3,  # kept: 3 qualifying lines
                good3.replace(".", "..."),  # ellipsis ending -> line 1 dropped -> doc dropped
                "short line.\n" + good3,  # 4-word line dropped, doc still kept
                good3 + "\nenable javascript one two three.",  # js line dropped, doc kept
                good3 + "\nLorem Ipsum dolor sit amet.",  # doc-level ban (case-insensitive)
                good3 + "\nvar f = function() { return 1; }",  # curly brace -> doc dropped
                "  One two three four five.  \nSix seven eight nine ten!\nA b c d e?。".replace(
                    "?。", " f g。"
                ),  # strip + CJK full stop accepted
            ],
        }
    )
    ds = ray.data.from_pandas(docs)
    sig = c4_signals(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(sig.keep) == [True, False, True, True, False, False, True]
    # doc 4's lorem line itself qualifies (the ban is doc-LEVEL);
    # doc 5's brace line ends in '}' so it fails the line rule too
    assert list(sig.n_kept_lines) == [3, 2, 3, 3, 4, 3, 3]
    assert list(sig.n_lines) == [3, 3, 4, 4, 4, 4, 3]
    kept = c4_filter(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(kept.doc_id) == [0, 2, 3, 6]
    assert kept.text[0] == good3
    assert kept.text[1] == good3  # the short line is gone
    assert kept.text[2] == good3  # the javascript line is gone
    assert kept.text[3].startswith("One two three four five.")  # stripped


def test_dsir_tiers_bit_identical_and_select(ray_session):
    """DSIR broadcast and term-shuffle tiers must be bit-identical
    (math.log per distinct term, per-doc sums in (doc_id, term)
    order); target-language docs must outscore the rest on average;
    dsir_select keeps exactly the top fraction by (logweight desc,
    doc_id)."""
    import ray.data

    from pdf_extractor_ray.ops.selection import dsir_logweights, dsir_select

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text", "lang"]
    ).assign(is_target=lambda d: d.lang == "en")
    ds = ray.data.from_pandas(docs).repartition(4)
    bc = dsir_logweights(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    sh = (
        dsir_logweights(ds, broadcast_max_terms=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert bc.equals(sh)
    m = bc.merge(docs[["doc_id", "lang"]], on="doc_id")
    by_lang = m.groupby("lang").logweight.mean()
    assert by_lang.idxmax() == "en"

    sel = dsir_select(ds, frac=0.25).to_pandas()
    k = int(len(bc) * 0.25)
    want = set(
        bc.sort_values(["logweight", "doc_id"], ascending=[False, True]).doc_id.head(k)
    )
    assert set(sel.doc_id) == want and sel.dsir_rank.max() == k


def test_url_filter_rules(ray_session):
    """url_signals must trip each rule on its canonical example with
    the documented first-tripped-rule precedence, implement UT1
    suffix semantics (subdomains blocked, superstring hosts NOT), and
    url_filter must keep exactly the keep=True rows with the input
    schema intact."""
    import ray.data

    from pdf_extractor_ray.ops.urlfilter import url_filter, url_signals

    rows = [
        ("https://site1.example/en/doc1", ""),
        ("https://tracker.bad/x", "block_host"),
        ("https://deep.sub.tracker.bad/x", "block_host"),
        ("https://nottracker.bad.safe.example/x", ""),
        ("https://ok.example/spamword-here", "block_word"),
        # block_host precedes block_word when both trip
        ("https://tracker.bad/spamword", "block_host"),
        ("nonsense", "unparseable"),
        ("https://" + "h.example/" + "a" * 2048, "too_long"),
        ("http://123456789.example/x", "digit_host"),
        ("https://a.b.c.d.e.f.g.example/x", "deep_subdomain"),
        ("https://q.example/x?" + "&".join(f"k{i}={i}" for i in range(20)), "query_spam"),
    ]
    df = pd.DataFrame({"url": [u for u, _ in rows], "payload": range(len(rows))})
    ds = ray.data.from_pandas(df).repartition(3)
    kw = dict(
        blocked_hosts=["tracker.bad"],
        blocked_path_words=["spamword"],
        max_host_digit_frac=0.5,
        max_subdomain_depth=6,
        max_query_params=16,
    )
    sig = url_signals(ds, **kw).to_pandas().set_index("url")
    for u, want in rows:
        assert sig.loc[u, "reason"] == want, (u, sig.loc[u, "reason"], want)
        assert sig.loc[u, "keep"] == (want == "")
    kept = url_filter(ds, **kw).to_pandas()
    assert list(kept.columns) == ["url", "payload"]
    assert set(kept.url) == {u for u, w in rows if w == ""}
    # signal columns are real numbers, not NaN, even for unparseable rows
    assert sig.host_digit_frac.notna().all() and (sig.n_query_params >= 0).all()


def test_paragraph_dedup_tiers(ray_session):
    """paragraph_dedup must keep each distinct non-blank paragraph
    only at its smallest (doc_id, position), preserve blank structure
    lines, count removals per doc, and produce identical output on
    the broadcast and co-shuffle tiers."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import paragraph_dedup

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha\nbeta\n\ngamma",
                "beta\ndelta\nalpha",
                "\n\n",
                "gamma\ngamma\nepsilon",
            ],
        }
    )

    def brute(df, sep="\n"):
        seen, rows = set(), []
        for _, r in df.sort_values("doc_id").iterrows():
            parts = r.text.split(sep)
            kept, rem = [], 0
            for p in parts:
                if not p.strip():
                    kept.append(p)
                elif p in seen:
                    rem += 1
                else:
                    seen.add(p)
                    kept.append(p)
            rows.append((r.doc_id, sep.join(kept), len(parts), rem))
        return pd.DataFrame(
            rows, columns=["doc_id", "text", "n_paragraphs", "n_removed"]
        ).astype({"doc_id": "int64", "n_paragraphs": "int64", "n_removed": "int64"})

    want = brute(docs)
    assert want.n_removed.sum() == 4  # beta, alpha, gamma x2
    ds = ray.data.from_pandas(docs).repartition(3)
    for cap in (250_000, 0):  # broadcast tier, then forced co-shuffle
        got = (
            paragraph_dedup(ds, broadcast_max_pairs=cap)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
            .astype({"doc_id": "int64"})
        )
        assert got.equals(want), (cap, got, want)


def test_export_training_shards(ray_session, tmp_path):
    """export_training_shards must place every row in exactly one
    md5-deterministic shard with a fixed internal order, resume by
    skipping _SUCCESS-complete shards, and rebuild only deleted
    shards; read_training_shards must refuse a partial corpus."""
    import hashlib
    import os

    import pytest
    import ray.data

    from pdf_extractor_ray.pipelines.export import (
        export_training_shards,
        read_training_shards,
    )

    df = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"), "x": np.arange(200) * 2})
    out = str(tmp_path / "shards")
    ds = ray.data.from_pandas(df).repartition(4)
    m1 = export_training_shards(ds, out, n_shards=8)
    assert m1.n_rows.sum() == 200 and len(m1) == 8
    back = read_training_shards(out).to_pandas()
    assert sorted(back.doc_id) == list(range(200))
    # shard assignment and internal order are md5-deterministic
    s0 = pd.read_parquet(os.path.join(out, "shard=00000", "part-0.parquet"))
    want0 = [
        i
        for i in range(200)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) % 8 == 0
    ]
    want0.sort(key=lambda i: (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16), i))
    assert list(s0.doc_id) == want0
    # resume: everything complete -> nothing written
    m2 = export_training_shards(ds, out, n_shards=8)
    assert m2.empty
    # delete one shard -> only it rebuilds, identically
    os.remove(os.path.join(out, "shard=00003", "_SUCCESS"))
    m3 = export_training_shards(ds.repartition(7), out, n_shards=8)
    assert list(m3.shard) == [3]
    s3 = pd.read_parquet(os.path.join(out, "shard=00003", "part-0.parquet"))
    want3 = [
        i
        for i in range(200)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) % 8 == 3
    ]
    assert sorted(s3.doc_id) == sorted(want3)
    # partial corpus refuses to read
    os.remove(os.path.join(out, "shard=00005", "_SUCCESS"))
    with pytest.raises(FileNotFoundError):
        read_training_shards(out)


def test_triangle_count(ray_session):
    """triangle_count must match the brute-force triple enumeration
    on a random graph, ignoring self-loops and reverse/parallel
    duplicate edges."""
    import itertools

    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.linkgraph import triangle_count

    rng = np.random.RandomState(9)
    nodes = [f"h{i}" for i in range(20)]
    edges = set()
    for _ in range(70):
        a, b = rng.choice(20, 2, replace=False)
        x, y = nodes[a], nodes[b]
        edges.add((min(x, y), max(x, y)))
    df = pd.DataFrame([{"src_host": a, "dst_host": b} for a, b in edges])
    noisy = pd.concat(
        [
            df,
            df.rename(columns={"src_host": "dst_host", "dst_host": "src_host"}).head(10),
            pd.DataFrame([{"src_host": "h0", "dst_host": "h0"}]),
        ],
        ignore_index=True,
    )
    got = triangle_count(ray.data.from_pandas(noisy).repartition(3))
    es = set(edges)
    want = sum(
        1
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    assert got == want == 28
    # the co-shuffle degree-attach tier (forced by a zero node cap)
    # must count identically
    got2 = triangle_count(
        ray.data.from_pandas(noisy).repartition(3), broadcast_max_nodes=0
    )
    assert got2 == want


def test_term_cooccurrence_pmi(ray_session):
    """term_cooccurrence_pmi must rank a planted always-together pair
    above independent pairs, compute PMI from doc-level counts
    exactly, and honor min_count."""
    import math

    import ray.data

    from pdf_extractor_ray.ops.text_analysis import term_cooccurrence_pmi

    # "amber bronze" always co-occur (4 docs); filler words everywhere
    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "amber bronze x y",
                "amber bronze y z",
                "amber bronze z w",
                "amber bronze w x",
                "x y z w",
                "x y z w",
                "x y z w",
                "x y z w",
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    out = term_cooccurrence_pmi(ds, top_pairs=5, min_count=2).to_pandas()
    top = out.iloc[0]
    assert (top.a, top.b) == ("amber", "bronze") and top.n_ab == 4
    want = math.log((4 * 8) / (4 * 4))  # ln(n_ab * N / (n_a * n_b))
    assert abs(top.pmi - want) < 1e-12
    # pairs below min_count never appear
    assert ((out.n_ab >= 2).all())
    # the co-shuffle df-attach tier (forced by a zero broadcast cap)
    # must match the broadcast tier exactly
    out2 = term_cooccurrence_pmi(
        ds, top_pairs=5, min_count=2, broadcast_max_terms=0
    ).to_pandas()
    assert out.round(12).equals(out2.round(12))


def test_grouped_linregress(ray_session):
    """grouped_linregress must recover planted slopes/intercepts per
    group (r2 ~ 1 on noiseless lines), emit NaN for degenerate
    groups, and be partition-independent."""
    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.relational import grouped_linregress

    x = np.linspace(0, 10, 101)
    df = pd.concat(
        [
            pd.DataFrame({"g": "up", "x": x, "y": 3.0 * x + 2.0}),
            pd.DataFrame({"g": "down", "x": x, "y": -1.5 * x + 7.0}),
            pd.DataFrame({"g": "flat_x", "x": np.ones(5), "y": np.arange(5.0)}),
        ],
        ignore_index=True,
    )
    out = (
        grouped_linregress(ray.data.from_pandas(df).repartition(4), ["g"], "x", "y")
        .to_pandas()
        .set_index("g")
    )
    assert abs(out.loc["up", "slope"] - 3.0) < 1e-9
    assert abs(out.loc["up", "intercept"] - 2.0) < 1e-9
    assert abs(out.loc["up", "r2"] - 1.0) < 1e-9
    assert abs(out.loc["down", "slope"] + 1.5) < 1e-9
    assert np.isnan(out.loc["flat_x", "slope"])  # zero x-variance


def test_percentile_blend(ray_session):
    """percentile_blend must rank each signal independently
    ((rank-1)/(n-1) with id tie-break), blend with the given weights,
    and be partition-independent."""
    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.rank import percentile_blend

    n = 200
    rng = np.random.RandomState(4)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "a": rng.permutation(n).astype("float64"),
            "b": rng.permutation(n).astype("float64"),
        }
    )
    out = (
        percentile_blend(
            ray.data.from_pandas(df).repartition(4), ["a", "b"], [0.7, 0.3]
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # signals here are permutations of 0..n-1, so pct == value/(n-1)
    want_a = df.a.to_numpy() / (n - 1)
    want_b = df.b.to_numpy() / (n - 1)
    np.testing.assert_allclose(out.pct_a.to_numpy(), want_a, atol=1e-12)
    np.testing.assert_allclose(out.pct_b.to_numpy(), want_b, atol=1e-12)
    np.testing.assert_allclose(
        out.blend_score.to_numpy(), 0.7 * want_a + 0.3 * want_b, atol=1e-12
    )
    out2 = (
        percentile_blend(ray.data.from_pandas(df).repartition(7), ["a", "b"], [0.7, 0.3])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_anomalous_periods_and_gini(ray_session):
    """anomalous_periods must flag exactly the buckets beyond z
    population sigmas per type; gini_coefficient must match the
    sorted-rank formula on skewed data and return 0 for uniform."""
    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.rank import gini_coefficient
    from pdf_extractor_ray.ops.windows import anomalous_periods

    t = pd.Timestamp("2026-05-01")
    h = pd.Timedelta(hours=1)
    rows = []
    for k in range(20):  # type 'a': 5 events/hour for 20 hours...
        rows += [("a", t + k * h)] * 5
    rows += [("a", t + 20 * h)] * 50  # ...then one 10x spike hour
    for k in range(21):  # type 'b': flat
        rows += [("b", t + k * h)] * 7
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    out = anomalous_periods(
        ray.data.from_pandas(df).repartition(3), z=3.0
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].event_type == "a" and out.iloc[0].n_events == 50
    assert out.iloc[0].zscore > 3.0

    rng = np.random.RandomState(1)
    x = rng.pareto(1.5, 1500) + 0.01
    dd = pd.DataFrame({"doc_id": np.arange(1500, dtype="int64"), "v": x})
    g = gini_coefficient(ray.data.from_pandas(dd).repartition(5), "v", "doc_id")
    xs = np.sort(x)
    i = np.arange(1, len(xs) + 1)
    want = (2 * (i * xs).sum()) / (len(xs) * xs.sum()) - (len(xs) + 1) / len(xs)
    assert abs(g - want) < 1e-9
    du = pd.DataFrame({"doc_id": np.arange(50, dtype="int64"), "v": np.ones(50)})
    assert gini_coefficient(ray.data.from_pandas(du), "v", "doc_id") == 0.0


def test_profile_columns(ray_session):
    """profile_columns must report exact distinct counts across
    batches (cross-batch duplicate values count once), null counts,
    and numeric min/max with NaN for non-numeric columns."""
    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.relational import profile_columns

    df = pd.DataFrame(
        {
            "k": [1, 2, 2, 3, None, 3],
            "s": ["a", "b", "a", None, "c", "a"],
        }
    )
    out = (
        profile_columns(ray.data.from_pandas(df).repartition(3), ["k", "s"])
        .to_pandas()
        .set_index("column")
    )
    assert out.loc["k", "n_rows"] == 6 and out.loc["k", "n_null"] == 1
    assert out.loc["k", "n_distinct"] == 3
    assert out.loc["k", "min_num"] == 1.0 and out.loc["k", "max_num"] == 3.0
    assert out.loc["s", "n_distinct"] == 3 and out.loc["s", "n_null"] == 1
    assert np.isnan(out.loc["s", "min_num"])


def test_retention_matrix(ray_session):
    """retention_matrix must bucket users by first-event period,
    count distinct active users per (cohort, delta) — multiple events
    in one period count once — and emit cohort size at delta 0."""
    import ray.data

    from pdf_extractor_ray.ops.windows import retention_matrix

    d = pd.Timestamp("2026-03-01")
    day = pd.Timedelta(days=1)
    rows = [
        # cohort day0: u1 active d0,d1,d2; u2 active d0 (twice), d2
        (1, d), (1, d + day), (1, d + 2 * day),
        (2, d), (2, d + pd.Timedelta(hours=3)), (2, d + 2 * day),
        # cohort day1: u3 active d1 only
        (3, d + day),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = (
        retention_matrix(ray.data.from_pandas(df).repartition(3), period="D")
        .to_pandas()
        .set_index(["cohort", "periods_since"])
        .sort_index()
    )
    assert out.loc[(d, 0), "n_users"] == 2
    assert out.loc[(d, 1), "n_users"] == 1  # only u1
    assert out.loc[(d, 2), "n_users"] == 2  # u1, u2
    assert out.loc[(d + day, 0), "n_users"] == 1
    assert len(out) == 4


def test_funnel_counts(ray_session):
    """funnel_counts must require steps IN ORDER (strictly after the
    earliest previous-step completion): a user with purchase BEFORE
    view does not convert, repeat events don't double-count, and a
    user missing the first step never appears."""
    import ray.data

    from pdf_extractor_ray.ops.windows import funnel_counts

    t = pd.Timestamp("2026-01-01")
    h = pd.Timedelta(hours=1)
    rows = [
        # u1 completes in order
        (1, "signup", t), (1, "view", t + h), (1, "purchase", t + 2 * h),
        # u2: purchase BEFORE view -> stops at view
        (2, "signup", t), (2, "purchase", t + h), (2, "view", t + 2 * h),
        # u3: signup only; repeats don't double count
        (3, "signup", t), (3, "signup", t + h),
        # u4: no signup -> never enters
        (4, "view", t), (4, "purchase", t + h),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    ds = ray.data.from_pandas(df).repartition(3)
    out = (
        funnel_counts(ds, ["signup", "view", "purchase"])
        .to_pandas()
        .set_index("step")
    )
    assert out.loc["signup", "n_users"] == 3
    assert out.loc["view", "n_users"] == 2  # u1, u2
    assert out.loc["purchase", "n_users"] == 1  # u1 only


def test_classification_report(ray_session):
    """classification_report must compute per-class support / correct
    / recall and pick the dominant wrong prediction (ties
    lexicographic), with '' for perfectly-predicted classes."""
    import ray.data

    from pdf_extractor_ray.ops.classify import classification_report

    df = pd.DataFrame(
        {
            "label": ["a"] * 6 + ["b"] * 4 + ["c"] * 2,
            "pred": ["a", "a", "a", "b", "b", "c", "b", "b", "b", "b", "c", "c"],
        }
    )
    out = (
        classification_report(ray.data.from_pandas(df).repartition(3), "label", "pred")
        .to_pandas()
        .set_index("label")
        .sort_index()
    )
    assert out.loc["a", "support"] == 6 and out.loc["a", "n_correct"] == 3
    assert out.loc["a", "recall"] == 0.5 and out.loc["a", "top_confusion"] == "b"
    assert out.loc["b", "recall"] == 1.0 and out.loc["b", "top_confusion"] == ""
    assert out.loc["c", "recall"] == 1.0


def test_near_dedup_keep_best(ray_session):
    """near_dedup_keep_best must keep exactly the max-quality member
    of each near-duplicate family (ties min id) and leave singletons
    untouched, with the input schema preserved."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import near_dedup_keep_best

    base1 = "the quick brown fox jumps over the lazy dog again and again today"
    base2 = "completely different content about distributed dataflow engines at scale"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 10, 11, 20],
            "text": [
                base1,
                base1 + " x",  # family A: 1, 2, 3
                base1 + " y",
                base2,  # family B: 10, 11
                base2 + " z",
                "a lone unrelated document with nothing shared at all here",
            ],
            "q": [5.0, 9.0, 9.0, 1.0, 2.0, 0.5],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    out = (
        near_dedup_keep_best(ds, quality_col="q", threshold=0.7)
        .to_pandas()
        .sort_values("doc_id")
    )
    # family A -> q=9 tie between 2 and 3 -> min id 2; family B -> 11
    assert list(out.doc_id) == [2, 11, 20]
    assert list(out.columns) == ["doc_id", "text", "q"]


def test_domain_cap_and_stats(ray_session):
    """domain_cap must keep at most k docs per registrable domain —
    chosen by smallest md5(url), independent of scan order — and
    domain_stats must roll up exact doc and distinct-host counts
    (www.bbc.co.uk and news.bbc.co.uk share bbc.co.uk)."""
    import hashlib

    import ray.data

    from pdf_extractor_ray.ops.urlfilter import domain_cap, domain_stats

    urls = (
        [f"https://www.bbc.co.uk/p{i}" for i in range(6)]
        + [f"https://news.bbc.co.uk/q{i}" for i in range(4)]
        + [f"https://tiny.example/r{i}" for i in range(2)]
    )
    df = pd.DataFrame({"url": urls, "x": range(len(urls))})
    ds = ray.data.from_pandas(df).repartition(3)

    stats = domain_stats(ds).to_pandas().set_index("domain").sort_index()
    assert stats.loc["bbc.co.uk", "n_docs"] == 10
    assert stats.loc["bbc.co.uk", "n_hosts"] == 2
    assert stats.loc["tiny.example", "n_docs"] == 2
    assert stats.loc["tiny.example", "n_hosts"] == 1

    capped = domain_cap(ds, max_per_domain=3).to_pandas()
    assert list(capped.columns) == ["url", "x"]
    bbc = [u for u in capped.url if "bbc.co.uk" in u]
    assert len(bbc) == 3 and (capped.url.str.contains("tiny.example")).sum() == 2
    # the kept set is the 3 smallest md5(url) keys, not first-seen
    want = sorted(
        urls[:10], key=lambda u: (int(hashlib.md5(u.encode()).hexdigest()[:13], 16), u)
    )[:3]
    assert sorted(bbc) == sorted(want)
    # scan-order independence: a different partitioning keeps the same set
    capped2 = domain_cap(ds.repartition(5), max_per_domain=3).to_pandas()
    assert sorted(capped2.url) == sorted(capped.url)


def test_phrase_match(ray_session):
    """phrase_match must count every occurrence (including
    overlapping ones), handle repeated-word phrases via slot
    satisfaction, and omit non-matching docs."""
    import ray.data

    from pdf_extractor_ray.ops.text_analysis import phrase_match

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "x a b c y a b c",  # "a b c" twice
                "a b x b c",  # broken up -> no match
                "a a a b",  # "a a b" at start 1; overlapping "a a" handled
                "c b a",  # reversed -> no match
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(2)
    out = phrase_match(ds, "a b c").to_pandas().set_index("doc_id")
    assert list(out.index) == [1] and out.loc[1, "n_matches"] == 2
    out2 = phrase_match(ds, "a a b").to_pandas().set_index("doc_id")
    assert list(out2.index) == [3] and out2.loc[3, "n_matches"] == 1
    out3 = phrase_match(ds, "a a").to_pandas().set_index("doc_id")
    assert out3.loc[3, "n_matches"] == 2  # overlapping starts 0 and 1


def test_compression_ratio_signal(ray_session):
    """compression_ratio must mark repetitive text as far more
    compressible than high-entropy text, agree with direct zlib, and
    emit ratio 1.0 for empty docs."""
    import zlib

    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.quality import compression_ratio

    rng = np.random.RandomState(2)
    rand_text = " ".join(
        "".join(chr(97 + c) for c in rng.randint(0, 26, 8)) for _ in range(200)
    )
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["spam " * 400, rand_text, ""],
        }
    )
    out = (
        compression_ratio(ray.data.from_pandas(docs).repartition(2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "compression_ratio"] < 0.05  # pure repetition
    assert out.loc[2, "compression_ratio"] > 0.5  # high entropy
    assert out.loc[3, "compression_ratio"] == 1.0
    want = len(zlib.compress(docs.text[1].encode(), 6))
    assert out.loc[2, "n_compressed"] == want


def test_ngram_overlap_fraction(ray_session):
    """ngram_overlap_fraction must weight every window position (m
    within-doc occurrences count m times), report 1.0 for a fully
    contained doc, 0.0 for a disjoint one, and skip docs shorter than
    n words."""
    import ray.data

    from pdf_extractor_ray.ops.scrub import ngram_overlap_fraction

    ref = pd.DataFrame({"doc_id": [100], "text": ["a b c d e f"]})
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b c d",  # both 3-grams in ref -> 1.0
                "x y z w",  # none -> 0.0
                "a b c a b c",  # grams: abc(x2? windows: abc,bca,cab,abc) -> 2/4 hit
                "a b",  # shorter than n -> no row
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(2)
    rf = ray.data.from_pandas(ref)
    out = (
        ngram_overlap_fraction(ds, rf, n=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]
    assert out.loc[1, "overlap_fraction"] == 1.0
    assert out.loc[2, "overlap_fraction"] == 0.0
    assert out.loc[3, "n_grams"] == 4 and out.loc[3, "n_overlap"] == 2


def test_term_kl_by_slice(ray_session):
    """term_kl_by_slice must equal the brute-force full-vocabulary KL
    (including the closed-form absent-term correction) on both the
    broadcast and co-shuffle tiers."""
    from collections import Counter

    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.text_analysis import term_kl_by_slice

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "lang": ["en", "en", "en", "fr", "fr", "fr"],
            "text": ["a b c a", "b b d", "a c e", "x y a", "x x y", "y z a b"],
        }
    )

    def brute(df):
        toks = [(l, t) for l, txt in zip(df.lang, df.text) for t in txt.split()]
        corpus = Counter(t for _, t in toks)
        v, tt = len(corpus), sum(corpus.values())
        out = {}
        for s in sorted(set(df.lang)):
            cs = Counter(t for l, t in toks if l == s)
            d = sum(cs.values()) + v
            kl = sum(
                ((cs.get(t, 0) + 1) / d) * np.log(((cs.get(t, 0) + 1) / d) / (c / tt))
                for t, c in corpus.items()
            )
            out[s] = (sum(cs.values()), len(cs), kl)
        return out

    want = brute(docs)
    ds = ray.data.from_pandas(docs).repartition(3)
    for cap in (1_000_000, 0):  # broadcast tier, forced co-shuffle tier
        got = term_kl_by_slice(ds, "lang", broadcast_max_terms=cap).to_pandas()
        for _, r in got.iterrows():
            ts, npres, kl = want[r.lang]
            assert (r.n_tokens, r.n_terms) == (ts, npres), (cap, r.lang)
            assert abs(r.kl - kl) < 1e-12, (cap, r.lang, r.kl, kl)


def test_exact_dedup_prefer_and_weighted_group_sample(ray_session):
    """exact_dedup(prefer_col=...) must keep the highest-prefer copy
    per content (ties min id) — default stays min-id — and
    weighted_sample_per_group must equal the per-group brute-force
    exponential-race draw."""
    import hashlib

    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.dedup import exact_dedup
    from pdf_extractor_ray.ops.selection import weighted_sample_per_group

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["x", "x", "x", "y", "y"],
            "q": [10.0, 99.0, 99.0, 5.0, 1.0],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    best = exact_dedup(ds, prefer_col="q").to_pandas()
    assert sorted(best.doc_id) == [2, 4]  # highest q wins; tie (2,3) -> min id
    first = exact_dedup(ds).to_pandas()
    assert sorted(first.doc_id) == [1, 4]  # default: min id

    n = 200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "g": np.where(np.arange(n) % 2 == 0, "ga", "gb"),
            "w": (np.arange(n, dtype="float64") % 7) + 1.0,
        }
    )
    out = (
        weighted_sample_per_group(
            ray.data.from_pandas(df).repartition(4), k=5, weight_col="w", group_col="g"
        )
        .to_pandas()
        .sort_values(["g", "doc_id"])
    )
    u = np.array(
        [
            (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) + 1) / 2.0**52
            for i in df.doc_id
        ]
    )
    df["key"] = -np.log(u) / df.w
    want = (
        df.sort_values(["key", "doc_id"])
        .groupby("g")
        .head(5)
        .sort_values(["g", "doc_id"])
    )
    assert list(out.doc_id) == list(want.doc_id)


def test_pca_fit_transform(ray_session):
    """Distributed PCA must match numpy's direct eigendecomposition
    (eigenvalues and component directions) regardless of
    partitioning, canonicalize component signs, and pca_transform
    must reproduce the driver-side projection."""
    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.cluster import pca_fit, pca_transform

    rng = np.random.RandomState(5)
    # anisotropic 12-d data with a clear top-2 subspace
    base = rng.normal(size=(400, 12)) * np.array([10, 6] + [1] * 10)
    q, _ = np.linalg.qr(rng.normal(size=(12, 12)))
    x = base @ q
    df = pd.DataFrame({"vec_id": np.arange(400), "embedding": list(x)})
    ds = ray.data.from_pandas(df).repartition(4)
    model = pca_fit(ds, n_components=3)

    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    want_vals = evals[::-1][:3]
    want_vecs = evecs[:, ::-1][:, :3].T
    np.testing.assert_allclose(model["explained_var"], want_vals, rtol=1e-8)
    np.testing.assert_allclose(model["mean"], mean, rtol=0, atol=1e-9)
    # directions match up to sign; operator pins a canonical sign
    for got, want in zip(model["components"], want_vecs):
        assert abs(float(got @ want)) > 1 - 1e-9
        j = int(np.argmax(np.abs(got)))
        assert got[j] > 0
    out = (
        pca_transform(ds, model, keep_cols=["vec_id"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    proj = np.stack(out.pca.to_numpy())
    want_proj = (x - mean) @ model["components"].T
    np.testing.assert_allclose(proj, want_proj, rtol=0, atol=1e-9)
    # the top-2 subspace carries ~all the variance
    assert model["explained_var"][:2].sum() / evals.sum() > 0.9


def test_perplexity_buckets(ray_session):
    """perplexity_buckets must cut each language's score distribution
    independently into ordered thirds: every head doc outscores every
    middle doc, every middle outscores every tail, within its lang."""
    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.quality import perplexity_buckets

    rows = []
    did = 0
    # per lang: 12 docs with STRICTLY monotone scores — doc i mixes
    # (12 - i) highly common tokens with i singleton tokens, so
    # avg_logprob decreases in i and no quantile cut lands on a tie
    first, last = {}, {}
    for lang in ("aa", "bb"):
        for i in range(12):
            toks = [f"{lang}c"] * (12 - i) + [f"u{lang}{i}x{j}" for j in range(i)]
            rows.append((did, " ".join(toks), lang))
            if i == 0:
                first[lang] = did
            if i == 11:
                last[lang] = did
            did += 1
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    ds = ray.data.from_pandas(docs).repartition(3)
    out = perplexity_buckets(ds).to_pandas()
    assert len(out) == len(docs)
    for lang, g in out.groupby("lang"):
        by = {b: grp.avg_logprob for b, grp in g.groupby("bucket")}
        assert set(by) == {"head", "middle", "tail"}
        assert by["head"].min() > by["middle"].max()
        assert by["middle"].min() > by["tail"].max()
        # the most-common doc heads its lang; the most-unique one tails
        assert first[lang] in set(g[g.bucket == "head"].doc_id)
        assert last[lang] in set(g[g.bucket == "tail"].doc_id)


def test_tdigest_quantiles(ray_session):
    """t-digest grouped quantiles must land within the documented
    rank-error envelope against exact empirical quantiles on two very
    different distributions, report exact group counts, and be
    tail-accurate (p1/p99 tighter than the middle)."""
    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.sketch import tdigest_quantiles

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "g": np.repeat(["lognorm", "normal"], 20_000),
            "v": np.concatenate(
                [rng.lognormal(0, 1, 20_000), rng.normal(100, 15, 20_000)]
            ),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    out = (
        tdigest_quantiles(ds, ["g"], "v", qs=(0.01, 0.5, 0.9, 0.99))
        .to_pandas()
        .set_index("g")
    )
    assert (out.n == 20_000).all()
    for g in ("lognorm", "normal"):
        v = df[df.g == g].v.to_numpy()
        for q in (0.01, 0.5, 0.9, 0.99):
            est = out.loc[g, f"p{int(q * 100)}_v"]
            rank_err = abs((v < est).mean() - q)
            bound = 0.005 if q in (0.5, 0.9) else 0.002  # tails tighter
            assert rank_err < bound, (g, q, rank_err)


def test_paragraph_dedup_doc_scope(ray_session):
    """scope='doc' must trim repeats only WITHIN each document —
    cross-document repeats survive — with blank structure preserved."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import paragraph_dedup

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a\nb\na\n\nb", "a\nc"],  # doc1 repeats a,b; doc2 reuses a
        }
    )
    ds = ray.data.from_pandas(docs).repartition(2)
    out = (
        paragraph_dedup(ds, scope="doc")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out.text) == ["a\nb\n", "a\nc"]
    assert list(out.n_removed) == [2, 0]
    assert list(out.n_paragraphs) == [5, 2]


def test_mixture_sample(ray_session):
    """mixture_sample must accept exactly the docs whose md5 uniform
    falls under the per-source threshold floor(p * 2^52), cap p at 1
    for under-represented sources (all docs kept), and exclude
    sources missing from the weights."""
    import hashlib

    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.selection import mixture_sample

    n = 300
    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "source": np.repeat(["big", "small", "other"], n // 3),
            "sz": rng.randint(50, 150, n).astype("int64"),
        }
    )
    weights = {"big": 1.0, "small": 1.0}
    budget = 12_000.0
    ds = ray.data.from_pandas(df).repartition(4)
    out = mixture_sample(
        ds, weights=weights, budget=budget, size_col="sz"
    ).to_pandas()
    assert "other" not in set(out.source)
    tot = df.groupby("source").sz.sum()
    thr = {
        s: np.floor(min(1.0, (budget * w / 2.0) / float(tot[s])) * 2.0**52)
        for s, w in weights.items()
    }
    want = set()
    for _, r in df.iterrows():
        if r.source in thr:
            u = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:13], 16)
            if u < thr[r.source]:
                want.add(int(r.doc_id))
    assert set(out.doc_id) == want
    # a source whose total is under its target keeps every doc (p = 1)
    small_budget_frac = (budget / 2.0) / float(tot["small"])
    if small_budget_frac >= 1.0:
        assert (out.source == "small").sum() == (df.source == "small").sum()


def test_winnow_fingerprints(ray_session):
    """winnow_fingerprints must equal the brute-force reference
    (window minimum, rightmost on ties, deduped across windows),
    honor the paper's guarantee (a shared substring of length
    >= k + window - 1 yields a shared fingerprint), and
    winnow_dup_candidates must surface exactly the overlapping pair."""
    import hashlib

    import ray.data

    from pdf_extractor_ray.ops.text_analysis import (
        winnow_dup_candidates,
        winnow_fingerprints,
    )

    k, w = 5, 4

    def brute(t: str):
        n = len(t) - k + 1
        if n < 1:
            return []
        h = [int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:13], 16) for i in range(n)]
        sel = set()
        if n <= w:
            m = min(h)
            j = max(i for i, v in enumerate(h) if v == m)
            sel.add((j, h[j]))
        else:
            for s in range(n - w + 1):
                win = h[s : s + w]
                m = min(win)
                j = s + max(i for i in range(w) if win[i] == m)
                sel.add((j, h[j]))
        return sorted(sel)

    shared = "the quick brown fox jumps"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "AAA " + shared + " over the lazy dog",
                "totally different opening. " + shared + " zzz",
                "nothing in common here at all, none",
                "tiny",  # shorter than k -> no fingerprints
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(2)
    out = winnow_fingerprints(ds, k=k, window=w).to_pandas()
    for did, t in zip(docs.doc_id, docs.text):
        got = sorted(
            zip(
                out[out.doc_id == did].pos.astype(int),
                out[out.doc_id == did].fp.astype(int),
            )
        )
        assert got == brute(t), did
    # guarantee: docs 1 and 2 share a >= k+w-1 substring -> shared fp
    f1 = set(out[out.doc_id == 1].fp)
    f2 = set(out[out.doc_id == 2].fp)
    f3 = set(out[out.doc_id == 3].fp)
    assert f1 & f2
    assert not (f1 & f3) and not (f2 & f3)
    pairs = winnow_dup_candidates(ds, k=k, window=w).to_pandas()
    assert [(int(a), int(b)) for a, b in zip(pairs.a, pairs.b)] == [(1, 2)]


def test_dedup_against_tiers(ray_session):
    """dedup_against must drop exactly the new-shard docs whose text
    exists in the existing corpus, keep intra-shard duplicates, and
    behave identically on broadcast and co-shuffle tiers with the
    input schema preserved."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import dedup_against

    new = pd.DataFrame(
        {"doc_id": [1, 3, 5, 7], "text": ["aa", "bb", "cc", "aa"], "x": [1, 2, 3, 4]}
    )
    old = pd.DataFrame({"doc_id": [0, 2], "text": ["bb", "zz"]})
    dn = ray.data.from_pandas(new).repartition(2)
    de = ray.data.from_pandas(old).repartition(2)
    for cap in (250_000, 0):
        out = dedup_against(dn, de, broadcast_max_hashes=cap).to_pandas()
        assert sorted(out.doc_id) == [1, 5, 7], (cap, out)  # bb dropped, aa x2 kept
        assert list(out.columns) == ["doc_id", "text", "x"]
    # empty existing corpus: everything passes
    out = dedup_against(dn, de.filter(lambda r: r["doc_id"] < 0)).to_pandas()
    assert sorted(out.doc_id) == [1, 3, 5, 7]


def test_weighted_sample_exponential_race(ray_session):
    """weighted_sample must equal the brute-force hashlib reference
    (k smallest -ln(u)/w keys, u = (md5_u52+1)/2^52), exclude
    non-positive weights, bias the draw toward heavy rows, and return
    everything eligible when k >= n."""
    import hashlib

    import numpy as np
    import ray.data

    from pdf_extractor_ray.ops.selection import weighted_sample

    n = 400
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            # ids 0..199 light (w=10), 200..399 heavy (w=1000); a few
            # zero/negative weights that must never be drawn
            "w": np.where(np.arange(n) < 200, 10.0, 1000.0),
            "grp": np.where(np.arange(n) < 200, "light", "heavy"),
        }
    )
    df.loc[rng.choice(n, 10, replace=False), "w"] = 0.0
    df.loc[rng.choice(n, 5, replace=False), "w"] = -3.0

    def ref_keys(d: pd.DataFrame) -> pd.Series:
        u = np.array(
            [
                (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) + 1) / 2.0**52
                for i in d.doc_id
            ]
        )
        return pd.Series(-np.log(u) / d.w.to_numpy(), index=d.index)

    elig = df[df.w > 0].copy()
    elig["key"] = ref_keys(elig)
    want = elig.sort_values(["key", "doc_id"]).head(60)

    ds = ray.data.from_pandas(df).repartition(5)
    out = (
        weighted_sample(ds, k=60, weight_col="w", keep_cols=["grp", "w"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out.doc_id) == sorted(want.doc_id)
    np.testing.assert_allclose(
        out.sort_values("doc_id").sample_key.to_numpy(),
        want.sort_values("doc_id").key.to_numpy(),
        rtol=1e-12,
    )
    # the 100x-heavier half must dominate the draw
    assert (out.grp == "heavy").sum() > 45
    # k >= n returns every positive-weight row
    all_out = weighted_sample(ds, k=1000, weight_col="w").to_pandas()
    assert set(all_out.doc_id) == set(elig.doc_id)


def test_global_prefix_sum_and_pack_offsets(ray_session):
    """global_prefix_sum must equal the pandas cumsum-minus-weight in
    (key) order at any partitioning; pack_offsets' sequence spans must
    tile the concatenated token stream exactly (doc i's offset = doc
    i-1's offset + count; last_seq consistent with seq_len)."""
    import ray.data

    from pdf_extractor_ray.ops.chunking import pack_offsets
    from pdf_extractor_ray.ops.rank import global_prefix_sum

    rng = pd.DataFrame({"k": np.arange(997)[::-1], "w": (np.arange(997) * 7919) % 23 + 1})
    for parts in (1, 9):
        ds = ray.data.from_pandas(rng).repartition(parts)
        out = (
            global_prefix_sum(ds, ["k"], "w", out_col="off")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = rng.sort_values("k").reset_index(drop=True)
        assert (out.off.to_numpy() == want.w.cumsum().to_numpy() - want.w.to_numpy()).all()

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    ds = ray.data.from_pandas(docs).repartition(5)
    out = pack_offsets(ds, seq_len=128).to_pandas().sort_values("doc_id").reset_index(drop=True)
    n = docs.text.str.split().str.len().to_numpy()
    assert (out.n_ws_tokens.to_numpy() == n[n > 0]).all()
    offs = out.token_offset.to_numpy()
    cnts = out.n_ws_tokens.to_numpy()
    assert offs[0] == 0 and (offs[1:] == offs[:-1] + cnts[:-1]).all()
    assert (out.first_seq.to_numpy() == offs // 128).all()
    assert (out.last_seq.to_numpy() == (offs + cnts - 1) // 128).all()


def test_hash_sample_per_group(ray_session):
    """Fixed pseudo-random k-per-group draw: equals the pandas
    sort-by-(md5prefix, id) head(k) at any partitioning; k above the
    group size returns the whole group."""
    import hashlib

    import ray.data

    from pdf_extractor_ray.ops.relational import hash_sample_per_group

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang"]
    )
    key = docs.doc_id.map(lambda i: hashlib.md5(str(i).encode()).hexdigest()[:13])
    want = (
        docs.assign(_h=key)
        .sort_values(["_h", "doc_id"], kind="stable")
        .groupby("lang", sort=False)
        .head(7)
    )
    want_set = set(map(tuple, want[["lang", "doc_id"]].to_numpy()))
    for parts in (1, 6):
        ds = ray.data.from_pandas(docs).repartition(parts)
        out = hash_sample_per_group(ds, "lang", "doc_id", k=7).to_pandas()
        assert set(map(tuple, out[["lang", "doc_id"]].to_numpy())) == want_set
    full = hash_sample_per_group(ray.data.from_pandas(docs), "lang", "doc_id", k=10**6)
    assert len(full.to_pandas()) == len(docs)


def test_bpe_train_sennrich_example(ray_session):
    """The paper's worked vocabulary {low x5, lower x2, newest x6,
    widest x3} must learn the canonical merge sequence, and encoding
    an UNSEEN word ('lowest') must compose trained subwords."""
    import ray.data

    from pdf_extractor_ray.ops.tokenize import bpe_encode_word, bpe_train

    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": [corpus]}))
    merges = bpe_train(ds, n_merges=5)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")]
    ranks = {p: r for r, p in enumerate(merges)}
    assert bpe_encode_word("lowest", ranks) == ["low", "est</w>"]
    assert bpe_encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]


def test_bpe_partition_invariant_and_counts(ray_session):
    """Training is bit-deterministic at any partitioning (exact counts
    + lexicographic ties); more merges never increase a doc's token
    count; zero merges degenerate to characters + end marker."""
    import ray.data

    from pdf_extractor_ray.ops.tokenize import bpe_token_counts, bpe_train

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    m1 = bpe_train(ray.data.from_pandas(docs), n_merges=40)
    m4 = bpe_train(ray.data.from_pandas(docs).repartition(4), n_merges=40)
    assert m1 == m4
    ds = ray.data.from_pandas(docs).repartition(3)
    t40 = bpe_token_counts(ds, m1).to_pandas().sort_values("doc_id").reset_index(drop=True)
    t10 = bpe_token_counts(ds, m1[:10]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    t0 = bpe_token_counts(ds, []).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (t40.n_bpe_tokens <= t10.n_bpe_tokens).all()
    assert (t10.n_bpe_tokens <= t0.n_bpe_tokens).all()
    chars = docs.sort_values("doc_id").text.map(
        lambda t: sum(len(w) + 1 for w in t.split())
    )
    assert (t0.n_bpe_tokens.to_numpy() == chars.to_numpy()).all()


def test_hll_distinct_accuracy_and_partition_invariance(ray_session):
    """HLL registers are a pure set function of the value set, so the
    estimate must be EXACTLY partition-invariant; small cardinalities
    hit the linear-counting branch (sub-1% there), large ones the raw
    harmonic branch within ~3 sigma of 1.04/sqrt(m)."""
    import ray.data

    from pdf_extractor_ray.ops.sketch import hll_distinct

    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet", columns=["event_type", "user_id"]
    )
    truth = ev.groupby("event_type").user_id.nunique()
    outs = []
    for parts in (1, 7):
        out = hll_distinct(
            ray.data.from_pandas(ev).repartition(parts), "event_type", "user_id", p=12
        )
        outs.append(out)
        for t, e in zip(out.event_type, out.hll_est):
            assert abs(e - truth[t]) / truth[t] < 0.02, (t, e, truth[t])
    assert outs[0].equals(outs[1])

    big = pd.DataFrame(
        {
            "g": np.repeat(["x", "y"], 20000),
            "v": [f"val{i}" for i in range(20000)] + [f"w{i}" for i in range(20000)],
        }
    )
    out = hll_distinct(ray.data.from_pandas(big).repartition(8), "g", "v", p=12)
    for e in out.hll_est:
        assert abs(e - 20000) / 20000 < 0.05, e


def test_sketches_high_cardinality_groups(ray_session):
    """VERDICT r4 item 8: the sketch finish is a hash(group)-mod-P
    shuffle with one vectorized pass per partition, so a group column
    with THOUSANDS of distinct values (far beyond the old
    modest-cardinality docstring contract) works and stays exact:
    small per-group value sets hit the exact/linear branches, so every
    estimate must equal the true distinct count; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.sketch import hll_distinct, kmv_distinct

    rng = np.random.RandomState(5)
    n_groups = 3000
    rows = pd.DataFrame(
        {
            "g": np.repeat(np.arange(n_groups, dtype=np.int64), 4),
            "v": rng.randint(0, 50, size=4 * n_groups),  # <= 4 distinct per group
        }
    )
    truth = rows.groupby("g").v.nunique()
    kmv = kmv_distinct(ray.data.from_pandas(rows).repartition(6), "g", "v", k=64)
    assert len(kmv) == n_groups
    got = kmv.set_index("g").kmv_est
    assert (got.reindex(truth.index).to_numpy() == truth.to_numpy()).all()
    hll = hll_distinct(ray.data.from_pandas(rows).repartition(6), "g", "v", p=12)
    assert len(hll) == n_groups
    goth = hll.set_index("g").hll_est
    # tiny cardinalities sit in the linear-counting regime; a handful
    # of groups lose 1 to a register collision (C(4,2)/m per group)
    err = np.abs(goth.reindex(truth.index).to_numpy() - truth.to_numpy())
    assert (err <= 1.0 + 1e-9).all(), err.max()
    assert np.median(err) < 0.01


def test_bm25_topk_matches_brute_force(ray_session):
    """BM25 scores against a from-scratch reference implementation on
    a handcrafted corpus: same top-k ids in the same order, scores to
    1e-12; docs sharing no query term never appear; absent query terms
    contribute df=0 idf without error; partition-invariant."""
    import math

    import ray.data

    from pdf_extractor_ray.ops.text_analysis import bm25_topk

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "apple banana apple cherry",
                "banana cherry date",
                "apple apple apple banana banana",
                "cherry date elderberry fig",
                "grape honeydew kiwi lemon mango",
                "apple",
            ],
        }
    )
    queries = ["apple banana", "date zzz-absent"]
    k1, b = 1.2, 0.75
    toks = [t.split() for t in docs.text]
    N = len(docs)
    avgdl = sum(len(t) for t in toks) / N

    def brute(query):
        terms = sorted(set(query.split()))
        scores = {}
        for did, tok in zip(docs.doc_id, toks):
            s, hit = 0.0, False
            for term in terms:
                tf = tok.count(term)
                if tf == 0:
                    continue
                hit = True
                df = sum(term in t for t in toks)
                idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tok) / avgdl))
            if hit:
                scores[did] = s
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]

    for parts in (1, 4):
        ds = ray.data.from_pandas(docs).repartition(parts)
        out = bm25_topk(ds, queries, k=3).to_pandas()
        for q in queries:
            got = out[out["query"] == q].sort_values(
                ["score", "doc_id"], ascending=[False, True]
            )
            want = brute(q)
            assert list(got.doc_id) == [d for d, _ in want], (q, parts)
            for g, (_, w) in zip(got.score, want):
                assert abs(g - w) < 1e-12
    # doc 4 shares no term with any query
    assert 4 not in set(out.doc_id)


def test_near_dedup_against(ray_session):
    """Delta near-dedup: perturbed recrawls of existing docs drop,
    genuinely new docs survive, and intra-shard near-dups are NOT
    touched (both copies stay — membership vs the existing corpus is
    the only criterion)."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import near_dedup_against

    base = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    existing = base[base.doc_id < 80].reset_index(drop=True)
    near = existing.head(8).copy()
    near["doc_id"] = near["doc_id"] + 10_000
    near["text"] = near["text"] + " tail"
    fresh = pd.DataFrame(
        {
            "doc_id": np.arange(20_000, 20_006),
            "text": [
                "entirely novel content " + " ".join(f"uniq{i}w{j}" for j in range(40))
                for i in range(6)
            ],
        }
    )
    twin = pd.DataFrame(
        {
            "doc_id": [30_000, 30_001],
            "text": ["shard-internal twin " + " ".join(f"tw{j}" for j in range(40))] * 2,
        }
    )
    new = pd.concat([near, fresh, twin], ignore_index=True)
    out = near_dedup_against(
        ray.data.from_pandas(new).repartition(3),
        ray.data.from_pandas(existing).repartition(4),
        threshold=0.8,
    ).to_pandas()
    kept = set(out.doc_id)
    assert kept == set(fresh.doc_id) | set(twin.doc_id)

    # disjoint corpora: nothing drops (the empty-drop fast path)
    out2 = near_dedup_against(
        ray.data.from_pandas(fresh).repartition(2),
        ray.data.from_pandas(existing).repartition(2),
        threshold=0.8,
    ).to_pandas()
    assert set(out2.doc_id) == set(fresh.doc_id)


def test_embedding_quantization(ray_session):
    """int8 quantization: codes partition-invariant and within half a
    code step of the affine ideal; dequantization error bounded by
    (mx-mn)/510 per dimension; quantized top-k recall >= 0.9 vs the
    float baseline on the fixture embeddings."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import (
        brute_force_topk,
        quantize_embeddings,
        quantize_fit,
        quantized_topk,
    )

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    fits = []
    for parts in (1, 5):
        fits.append(quantize_fit(ds.repartition(parts)))
    assert fits[0].equals(fits[1])
    fit = fits[0]
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    assert np.allclose(fit.mn.to_numpy(), m.min(axis=0))
    assert np.allclose(fit.mx.to_numpy(), m.max(axis=0))

    qds = quantize_embeddings(ds, fit)
    qpd = qds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    codes = np.stack([np.asarray(v, dtype=np.float64) for v in qpd.qvec])
    mn, mx = fit.mn.to_numpy(), fit.mx.to_numpy()
    dq = mn + codes * (mx - mn) / 255.0
    bound = (mx - mn) / 510.0 + 1e-12
    assert (np.abs(dq - m) <= bound).all()

    query = np.asarray(
        emb.loc[emb.vec_id == emb.vec_id.min()].iloc[0].embedding, dtype=np.float64
    )
    topq = quantized_topk(qds, fit, query, k=10)
    topf = brute_force_topk(ds, query, k=10)
    assert len(set(topq.vec_id) & set(topf.vec_id)) >= 9


def test_select_to_budget(ray_session):
    """Budgeted selection keeps exactly the greedy best-first prefix
    whose inclusive weight sum fits the budget (straddling row
    dropped); partition-invariant; budget 0 keeps nothing; a budget
    above the total keeps everything."""
    import ray.data

    from pdf_extractor_ray.ops.rank import select_to_budget

    df = pd.DataFrame(
        {
            "id": np.arange(20, dtype=np.int64),
            "q": np.concatenate([np.linspace(1, 0.1, 19), [0.5]]),
            "w": np.int64(7) * (np.arange(20, dtype=np.int64) % 5 + 1),
        }
    )
    order = df.sort_values(["q", "id"], ascending=[False, True])
    cum = order.w.cumsum()
    for budget in (0, 40, 100, int(df.w.sum()), int(df.w.sum()) + 10):
        want = set(order.id[cum <= budget])
        for parts in (1, 6):
            out = select_to_budget(
                ray.data.from_pandas(df).repartition(parts),
                ["q", "id"],
                [False, True],
                weight_col="w",
                budget=budget,
                keep_cols=["id", "w"],
            ).to_pandas()
            got = set(out["id"]) if "id" in out.columns else set()
            assert got == want, (budget, parts)
            if "w" in out.columns:
                assert int(out.w.sum()) <= budget or budget > int(df.w.sum())
    # string keep column + more partitions than rows (empty blocks):
    # the empty-block guard must emit schema-compatible frames, not
    # hard-coded int64 (ADVICE r4)
    sdf = pd.DataFrame(
        {
            "id": np.arange(4, dtype=np.int64),
            "name": ["a", "b", "c", "d"],
            "q": [0.9, 0.8, 0.7, 0.6],
            "w": np.array([5, 5, 5, 5], dtype=np.int64),
        }
    )
    out = select_to_budget(
        ray.data.from_pandas(sdf).repartition(3),
        ["q", "id"],
        [False, True],
        weight_col="w",
        budget=10,
        keep_cols=["id", "name", "q"],
        num_partitions=8,
    ).to_pandas()
    assert sorted(out.name) == ["a", "b"]
    assert out.q.dtype == np.float64


def test_grouped_percent_rank(ray_session):
    """percent_rank within each group matches the pandas closed form
    ((rank-1)/(n-1), 0 for singleton groups), endpoints are exactly
    0 and 1, partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.rank import grouped_percent_rank

    rng = np.random.RandomState(9)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(301, dtype=np.int64),
            "lang": ["en"] * 150 + ["ja"] * 100 + ["de"] * 50 + ["xx"],  # singleton group
            "n_chars": rng.randint(10, 10_000, size=301).astype(np.int64),
        }
    )
    want = {}
    for lang, g in df.groupby("lang"):
        g = g.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        den = max(len(g) - 1, 1)
        for pos, doc in enumerate(g.doc_id):
            want[doc] = pos / den
    outs = []
    for parts in (1, 5):
        out = (
            grouped_percent_rank(
                ray.data.from_pandas(df).repartition(parts), "lang", "n_chars", "doc_id"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
        assert len(out) == len(df)
        for doc, pct in zip(out.doc_id, out.pct_rank):
            assert pct == want[doc], (doc, pct, want[doc])
        for lang in ("en", "ja", "de"):
            grp = out[out.lang == lang]
            assert grp.pct_rank.min() == 0.0 and grp.pct_rank.max() == 1.0
        assert float(out[out.lang == "xx"].pct_rank.iloc[0]) == 0.0
    assert outs[0].equals(outs[1])


def test_select_to_budget_per_group(ray_session):
    """Per-group budgeted selection equals the per-group greedy prefix
    (inclusive fit, straddler dropped); dict budgets apply per group
    and absent groups keep nothing; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.rank import select_to_budget_per_group

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "id": np.arange(120, dtype=np.int64),
            "g": np.repeat(["a", "b", "c"], 40),
            "q": rng.permutation(120).astype(np.float64),
            "w": rng.randint(1, 30, size=120).astype(np.int64),
        }
    )

    def want_ids(budget_of):
        keep = []
        for g, grp in df.groupby("g"):
            grp = grp.sort_values(["q", "id"], ascending=[False, True])
            cum = grp.w.cumsum()
            keep += list(grp.id[cum <= budget_of(g)])
        return set(keep)

    for parts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = select_to_budget_per_group(
            ds, "g", ["q", "id"], [False, True], weight_col="w", budget=100,
            keep_cols=["id", "g", "w"],
        ).to_pandas()
        assert set(out.id) == want_ids(lambda g: 100), parts
        per_g = out.groupby("g").w.sum()
        assert (per_g <= 100).all()
        # dict budgets: group c absent -> keeps nothing
        out2 = select_to_budget_per_group(
            ds, "g", ["q", "id"], [False, True], weight_col="w",
            budget={"a": 50, "b": 200},
            keep_cols=["id", "g", "w"],
        ).to_pandas()
        assert set(out2.id) == want_ids(lambda g: {"a": 50, "b": 200}.get(g, 0))
        assert "c" not in set(out2.g)


def test_bpe_fertility_by_lang(ray_session):
    """Tokenizer-fertility rollup invariants on the fixture corpus:
    one row per lang, fertility >= 1 (a word encodes to >= 1 subword),
    chars-per-subword positive and below the mean word length, and
    the per-lang word sums reconcile with a direct count."""
    import __ray_entry__ as e

    out = e.queries()["docs_bpe_fertility"]("/root/testdata/sf0.001")
    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["lang", "text"]
    )
    want_words = docs.groupby("lang").text.apply(lambda s: int(s.str.split().str.len().sum()))
    assert list(out.lang) == sorted(docs.lang.unique())
    for _, r in out.iterrows():
        assert r.n_words == want_words[r.lang]
        assert r.n_subwords >= r.n_words
        assert r.fertility >= 1.0
        assert 0 < r.chars_per_subword


def test_component_size_histogram(ray_session):
    """Histogram of dup-cluster sizes from a component labeling: two
    grouped reductions, partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import component_size_histogram

    comps = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "component": np.array([0, 0, 0, 3, 3, 5, 5, 7, 7, 9], dtype=np.int64),
        }
    )
    for parts in (1, 4):
        out = (
            component_size_histogram(ray.data.from_pandas(comps).repartition(parts))
            .to_pandas()
            .sort_values("cluster_size")
            .reset_index(drop=True)
        )
        assert out.to_dict("list") == {"cluster_size": [1, 2, 3], "n_clusters": [1, 3, 1]}


def test_calibration_buckets(ray_session):
    """Reliability buckets from handcrafted (label, pred, conf) rows:
    exact per-bucket support/accuracy, top bucket clamps at n-1,
    partition-invariant; nb_predict's with_confidence emits a valid
    softmax posterior (in [1/n_classes, 1], exp-consistent)."""
    import ray.data

    from pdf_extractor_ray.ops.classify import calibration_buckets, nb_fit, nb_predict

    rows = pd.DataFrame(
        {
            "label": ["a", "a", "b", "b", "a", "b", "a", "b"],
            "pred":  ["a", "b", "b", "b", "a", "a", "a", "b"],
            "conf":  [0.95, 0.91, 1.0, 0.62, 0.55, 0.45, 0.31, 0.38],
        }
    )
    rows["_b"] = np.minimum((rows.conf * 10).astype(int), 9)
    rows["_ok"] = (rows.label == rows.pred).astype(int)
    want = {
        int(b): (int(g._ok.size), int(g._ok.sum()))
        for b, g in rows.groupby("_b")
    }
    for parts in (1, 3):
        out = (
            calibration_buckets(
                ray.data.from_pandas(rows[["label", "pred", "conf"]]).repartition(parts),
                "label",
                "pred",
            )
            .to_pandas()
            .sort_values("bucket")
        )
        got = {int(r.bucket): (int(r.n_docs), int(r.n_correct)) for r in out.itertuples()}
        assert got == want, parts
        assert np.allclose(out.accuracy, out.n_correct / out.n_docs)

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    model = nb_fit(ds, label_col="lang")
    preds = nb_predict(ds, model, with_confidence=True).to_pandas()
    n_cls = len(model.classes)
    assert ((preds.conf > 1.0 / n_cls - 1e-12) & (preds.conf <= 1.0 + 1e-12)).all()


def test_html_tables(ray_session):
    """HTML table flattening grammar: th headers, implicit cell/row
    closes (wild unclosed markup), entity decoding, nested tables get
    their own table_idx without duplicating text into the outer cell,
    non-HTML payloads contribute nothing."""
    import ray.data

    from pdf_extractor_ray.ops.structured import extract_tables_from_html, html_tables

    assert extract_tables_from_html(
        "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>"
    ) == [(0, 0, 0, "A", 1), (0, 0, 1, "B", 1), (0, 1, 0, "1", 0), (0, 1, 1, "2", 0)]
    # browser-style error recovery: unclosed td/tr, inline markup, entities
    assert extract_tables_from_html(
        "<table><tr><td><b>x &amp; y</b><td>z<tr><td>w</table>"
    ) == [(0, 0, 0, "x & y", 0), (0, 0, 1, "z", 0), (0, 1, 0, "w", 0)]
    nested = extract_tables_from_html(
        "<table><tr><td>outer<table><tr><td>inner</td></tr></table></td></tr></table>"
    )
    assert set(nested) == {(1, 0, 0, "inner", 0), (0, 0, 0, "outer", 0)}
    assert extract_tables_from_html("<p>no tables here</p>") == []

    pages = pd.DataFrame(
        {
            "url": ["https://a.example/1", "https://b.example/2", "https://c.example/3"],
            "html": [
                "<html><body><table><tr><td>p</td><td>q</td></tr></table></body></html>".encode(),
                b"%PDF-1.4 not html at all",
                "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>".encode(),
            ],
        }
    )
    out = (
        html_tables(ray.data.from_pandas(pages).repartition(2))
        .to_pandas()
        .sort_values(["url", "table_idx", "row_idx", "col_idx"])
        .reset_index(drop=True)
    )
    assert list(out.url.str[8]) == ["a", "a", "c", "c"]
    assert list(out.cell) == ["p", "q", "h", "v"]
    assert list(out.header) == [0, 0, 1, 0]


def test_page_metadata(ray_session):
    """Metadata/outline visitor grammar: title, meta name/property/
    charset, canonical link, h1-h6 in document order, entity decoding,
    unclosed tags flushed; document-order index per page."""
    import ray.data

    from pdf_extractor_ray.ops.structured import extract_metadata_from_html, page_metadata

    h = (
        '<html><head><title>My Page</title><meta charset="utf-8">'
        '<meta name="description" content="a demo">'
        '<meta property="og:title" content="OG Title">'
        '<link rel="canonical" href="https://x.example/canon"></head>'
        "<body><h1>Top &amp; Main</h1><p>text</p><h2>Sub</h2></body></html>"
    )
    assert extract_metadata_from_html(h) == [
        ("title", "title", "My Page"),
        ("meta", "charset", "utf-8"),
        ("meta", "description", "a demo"),
        ("meta", "og:title", "OG Title"),
        ("canonical", "href", "https://x.example/canon"),
        ("heading", "h1", "Top & Main"),
        ("heading", "h2", "Sub"),
    ]
    assert extract_metadata_from_html("<title>T<body><h1>H") == [
        ("title", "title", "T"),
        ("heading", "h1", "H"),
    ]

    pages = pd.DataFrame(
        {
            "url": ["https://a.example/1", "https://b.example/2"],
            "html": [h.encode(), b"%PDF-1.4 binary"],
        }
    )
    out = page_metadata(ray.data.from_pandas(pages).repartition(2)).to_pandas()
    assert set(out.url) == {"https://a.example/1"}
    assert list(out.sort_values("order")["kind"]) == [
        "title", "meta", "meta", "meta", "canonical", "heading", "heading",
    ]


def test_canonicalize_urls():
    """URL canonicalization grammar: scheme/host lowercase, default
    ports stripped (non-default kept), fragment gone, tracking params
    removed wherever they sit, emptied query drops '?', empty path
    becomes '/', non-http(s) and malformed values pass through."""
    from pdf_extractor_ray.ops.urlfilter import canonicalize_urls

    cases = {
        "HTTP://Example.COM:80/Path/Page?utm_source=x&id=7&utm_medium=y#sec2":
            "http://example.com/Path/Page?id=7",
        "https://a.example:443": "https://a.example/",
        "https://a.example:8443/x": "https://a.example:8443/x",
        "https://b.example/p?fbclid=abc": "https://b.example/p",
        "https://b.example/p?a=1&gclid=zz&b=2": "https://b.example/p?a=1&b=2",
        "https://c.example/q?utm_a=1&utm_b=2": "https://c.example/q",
        "ftp://odd.example/file": "ftp://odd.example/file",
        "not a url": "not a url",
        "https://d.example/ok?keep=1": "https://d.example/ok?keep=1",
        # boundary anchoring (ADVICE r4): a param NAME merely ending in
        # a tracked name must survive intact, not leave '?x' residue
        "https://e.example/p?xgclid=A": "https://e.example/p?xgclid=A",
        "https://e.example/p?myutm_source=a": "https://e.example/p?myutm_source=a",
        "https://e.example/p?utm_a=1&a=2": "https://e.example/p?a=2",
        "https://e.example/p?fbclid=1&utm_b=2&c=3": "https://e.example/p?c=3",
    }
    got = canonicalize_urls(pd.Series(list(cases)))
    assert list(got) == list(cases.values())
    # idempotent: canonical of canonical is itself
    assert list(canonicalize_urls(got)) == list(got)


def test_zipf_slope(ray_session):
    """Zipf fit against a hand-built corpus with an EXACT power-law
    term distribution: counts c_r = round(1000 * r^-1) for ranks
    1..20 recover slope ~ -1; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.text_analysis import zipf_slope

    words = []
    for r in range(1, 21):
        words.extend([f"w{r:02d}"] * round(1000 * r ** -1.0))
    # spread across docs so batches see partial counts
    docs = pd.DataFrame(
        {
            "doc_id": range(50),
            "text": [" ".join(words[i::50]) for i in range(50)],
        }
    )
    outs = []
    for parts in (1, 5):
        out = zipf_slope(ray.data.from_pandas(docs).repartition(parts), top_n=20)
        outs.append(out)
        assert out.n_terms.iloc[0] == 20
        assert abs(out.zipf_slope.iloc[0] + 1.0) < 0.01, out.zipf_slope.iloc[0]
    assert outs[0].equals(outs[1])


def test_canonicalize_urls_properties():
    """Hypothesis sweep: canonicalization is idempotent on arbitrary
    input, never invents content for non-url strings (they pass
    through verbatim), and for well-formed http(s) urls the output
    parses with the same scheme (case-normalized) and never retains a
    fragment or a tracking param."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extractor_ray.ops.urlfilter import canonicalize_urls

    url_st = st.builds(
        lambda scheme, host, port, path, q, frag: (
            scheme + "://" + host + port + path + q + frag
        ),
        st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
        st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,8}){0,3}", fullmatch=True),
        st.sampled_from(
            ["", "?a=1", "?utm_source=x", "?a=1&utm_b=2&c=3", "?fbclid=z&k=v"]
        ),
        st.sampled_from(["", "#f", "#sec-2"]),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(url_st | st.text(max_size=40), min_size=1, max_size=8))
    def run(urls):
        s = pd.Series(urls, dtype=object)
        once = canonicalize_urls(s)
        twice = canonicalize_urls(once)
        assert list(once) == list(twice)  # idempotent
        for raw, out in zip(s, once):
            if not raw.lower().startswith(("http://", "https://")):
                assert out == raw  # pass-through, never invented
            else:
                assert out.startswith(("http://", "https://"))
                assert "#" not in out
                assert "utm_" not in out and "fbclid" not in out

    run()


def test_html_visitors_never_crash():
    """Hypothesis fuzz: the table and metadata visitors accept
    arbitrary tag soup without raising and are deterministic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extractor_ray.ops.structured import (
        extract_metadata_from_html,
        extract_tables_from_html,
    )

    soup = st.text(
        alphabet="<>/!\"'=& ;abcdefghtdrlkn0123456789\n", max_size=200
    )
    tags = st.sampled_from(
        ["<table>", "</table>", "<tr>", "<td>", "<th>", "</td>", "<title>",
         "<h1>", "</h1>", "<meta charset='x'>", "cell text", "&amp;", "<a href='u'>"]
    )
    html_st = st.one_of(soup, st.lists(tags, max_size=25).map("".join))

    @settings(max_examples=300, deadline=None)
    @given(html_st)
    def run(h):
        a1 = extract_tables_from_html(h)
        a2 = extract_tables_from_html(h)
        assert a1 == a2
        b1 = extract_metadata_from_html(h)
        b2 = extract_metadata_from_html(h)
        assert b1 == b2

    run()


def test_anchor_texts_and_target_terms(ray_session):
    """Anchor grammar (inner markup stripped, whitespace collapsed,
    empty image anchors kept) and the per-destination-host top-k
    anchor-term rollup (absolute links only, lowercased terms,
    count-desc/term-asc order)."""
    import ray.data

    from pdf_extractor_ray.ops.linkgraph import anchor_texts, target_anchor_terms

    pages = pd.DataFrame(
        {
            "url": ["https://a.example/p1", "https://b.example/p2"],
            "html": [
                (
                    '<a href="https://t.example/x"><b>Great</b> Docs</a>'
                    '<a href="/rel">relative nav</a>'
                    '<a href="https://t.example/y">great <i>tool</i></a>'
                    '<a href="https://t.example/z"><img src="i.png"></a>'
                ).encode(),
                # mixed-case scheme + host (ADVICE r4): must still
                # count toward the same lowercase dst_host key
                '<a href="HTTPS://T.Example/w">GREAT stuff</a>'.encode(),
            ],
        }
    )
    links = anchor_texts(ray.data.from_pandas(pages).repartition(2))
    lp = links.to_pandas().sort_values(["url", "href"]).reset_index(drop=True)
    assert list(lp.anchor) == ["relative nav", "Great Docs", "great tool", "", "GREAT stuff"]

    out = (
        target_anchor_terms(links, k=2)
        .to_pandas()
        .sort_values(["dst_host", "n_term", "term"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    # absolute-only: 'relative nav' never contributes; terms lowercase;
    # 'great' appears 3x across both source pages
    assert list(out.dst_host.unique()) == ["t.example"]
    assert out.iloc[0].term == "great" and out.iloc[0].n_term == 3
    assert len(out) == 2  # k=2 cap


def test_hard_negatives(ray_session):
    """Hard-negative mining on a handcrafted 2-label set: nearest
    different-label vectors, never self or same-label, rank order by
    (cos desc, id asc); partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import hard_negatives

    # label 0 vectors point near +x; label 1 near +y, one of them
    # tilted toward +x (the hard negative for every label-0 vector)
    vecs = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 10, 11],
            "label": [0, 0, 0, 1, 1],
            "embedding": [
                [1.0, 0.0], [0.99, 0.14], [0.95, 0.31],
                [0.5, 0.87],   # tilted: the hard negative
                [0.0, 1.0],
            ],
        }
    )
    for parts in (1, 3):
        out = hard_negatives(
            ray.data.from_pandas(vecs).repartition(parts), k=2
        )
        for vid, g in out.groupby("vec_id"):
            own = int(vecs.loc[vecs.vec_id == vid, "label"].iloc[0])
            neg_labels = vecs.set_index("vec_id").loc[g.neg_id, "label"]
            assert (neg_labels != own).all()
            assert vid not in set(g.neg_id)
            assert list(g.sort_values("rank")["cos"]) == sorted(g.cos, reverse=True)
        # every label-0 vector's rank-1 negative is the tilted vec 10
        r1 = out[(out["rank"] == 1) & (out.vec_id.isin([0, 1, 2]))]
        assert set(r1.neg_id) == {10}


def test_hard_negatives_bucketed_tier(ray_session):
    """The IVF-bucketed scale tier (VERDICT r4 item 3): with every
    bucket probed it EQUALS the exact miner (each pool vector lives in
    exactly one bucket, so all pairs get scored); at n_probe=5 of 8
    its rank-1 recall vs exact stays >= 0.8 on the fixture embeddings
    (near-uniform vectors, IVF's worst case — measured 0.77/0.86/0.93
    at probe 4/5/6) — the same bound style as the SRP near-dup test."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import hard_negatives

    emb = pd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "label", "embedding"],
    )
    ds = ray.data.from_pandas(emb).repartition(4)
    exact = hard_negatives(ds, k=3, tier="exact")
    full = hard_negatives(
        ds, k=3, tier="bucketed", n_centroids=8, n_probe=8
    )
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), full.reset_index(drop=True)
    )
    approx = hard_negatives(
        ds, k=3, tier="bucketed", n_centroids=8, n_probe=5
    )
    e1 = exact[exact["rank"] == 1].set_index("vec_id").neg_id
    a1 = approx[approx["rank"] == 1].set_index("vec_id").neg_id
    hit = sum(
        1 for vid in e1.index if vid in a1.index and a1.loc[vid] == e1.loc[vid]
    )
    assert hit / len(e1) >= 0.8, hit / len(e1)
    # auto tier: small corpus routes exact
    auto = hard_negatives(ds, k=3)
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), auto.reset_index(drop=True)
    )


def test_embedding_decontaminate(ray_session):
    """Semantic decontamination: test-set members drop (cos(self)=1),
    a planted near-paraphrase of a test vector drops, orthogonal
    corpus rows survive with their max_test_cos; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import embedding_decontaminate

    test = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    corpus = pd.DataFrame(
        {
            "vec_id": np.arange(5, dtype=np.int64),
            "embedding": [
                [1.0, 0.0, 0.0],     # exact test member -> drop
                [0.98, 0.2, 0.0],    # paraphrase of test[0] -> drop
                [0.0, 0.0, 1.0],     # orthogonal -> keep
                [0.5, 0.5, 0.7071],  # cos ~ 0.5 to both -> keep
                [0.1, 0.99, 0.0],    # paraphrase of test[1] -> drop
            ],
        }
    )
    for parts in (1, 3):
        out = (
            embedding_decontaminate(
                ray.data.from_pandas(corpus).repartition(parts), test, threshold=0.9
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert list(out.vec_id) == [2, 3]
        assert (out.max_test_cos < 0.9).all()
        assert abs(out.max_test_cos.iloc[0] - 0.0) < 1e-12


def test_signal_correlations(ray_session):
    """Exact Pearson matrix: matches numpy corrcoef to 1e-12 on random
    integer signals; a perfectly linear pair reads 1.0 exactly; a
    constant column correlates 0.0 (guard, not NaN);
    partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.relational import signal_correlations

    rng = np.random.RandomState(4)
    a = rng.randint(0, 1000, size=400).astype(np.int64)
    df = pd.DataFrame(
        {
            "a": a,
            "b": 3 * a + 7,                                 # corr(a,b) == 1
            "c": rng.randint(0, 50, size=400).astype(np.int64),
            "d": np.full(400, 42, dtype=np.int64),          # constant
        }
    )
    outs = []
    for parts in (1, 5):
        out = signal_correlations(
            ray.data.from_pandas(df).repartition(parts), ["a", "b", "c", "d"]
        )
        outs.append(out)
        m = {(r.col_a, r.col_b): r.corr for r in out.itertuples()}
        assert m[("a", "b")] == 1.0
        assert abs(m[("a", "c")] - np.corrcoef(df.a, df.c)[0, 1]) < 1e-12
        assert m[("a", "d")] == 0.0 and m[("c", "d")] == 0.0
    assert outs[0].equals(outs[1])


def test_mad_outliers(ray_session):
    """MAD outlier gate on a handcrafted skewed group: the planted
    extreme value flags, the bulk does not, exact integer medians
    match the closed-form expectation; a symmetric tight group flags
    nothing; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.quality import mad_outliers

    # group a: bulk 100..119 (median 109 or 110 by disc rank), one 9999
    a_vals = list(range(100, 120)) + [9999]
    b_vals = [50] * 10  # MAD 0: any deviation > 0 flags... but all equal
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(a_vals) + len(b_vals), dtype=np.int64),
            "lang": ["a"] * len(a_vals) + ["b"] * len(b_vals),
            "n_chars": np.array(a_vals + b_vals, dtype=np.int64),
        }
    )
    outs = []
    for parts in (1, 4):
        out = (
            mad_outliers(
                ray.data.from_pandas(df).repartition(parts), "lang", "n_chars", "doc_id"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
        flagged = set(out.loc[out.is_outlier == 1, "n_chars"])
        assert flagged == {9999}, flagged
        assert (out.loc[out.lang == "b", "is_outlier"] == 0).all()
    assert outs[0].equals(outs[1])


def test_snapshot_delta(ray_session):
    """Full-outer crawl-delta classification on a handcrafted pair of
    snapshots: all four statuses land on the right keys, keys present
    in neither never appear; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.relational import snapshot_delta

    old = pd.DataFrame(
        {"url": ["a", "b", "c", "d"], "fp": ["1", "2", "3", "4"]}
    )
    new = pd.DataFrame(
        {"url": ["b", "c", "d", "e"], "fp": ["2", "XX", "4", "5"]}
    )
    want = {"a": "removed", "b": "unchanged", "c": "changed", "d": "unchanged", "e": "added"}
    for parts in (1, 3):
        out = (
            snapshot_delta(
                ray.data.from_pandas(old).repartition(parts),
                ray.data.from_pandas(new).repartition(parts),
                key="url",
                fp_col="fp",
            )
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert dict(zip(out.url, out.status)) == want


def test_semantic_outliers(ray_session):
    """Per-cluster z-scored centroid distance: planted far-out vector
    carries the cluster's max z; z is mean-0 within each cluster;
    deterministic across partitionings."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import semantic_outliers

    rng = np.random.RandomState(7)
    a = rng.normal(0, 0.05, (40, 8)) + np.eye(8)[0]
    b = rng.normal(0, 0.05, (40, 8)) + np.eye(8)[3]
    outlier = np.eye(8)[0] * 0.3 + np.eye(8)[5] * 0.95  # far from both
    m = np.vstack([a, b, outlier])
    df = pd.DataFrame(
        {"vec_id": np.arange(len(m), dtype=np.int64), "embedding": list(m)}
    )
    outs = []
    for parts in (1, 4):
        out = semantic_outliers(
            ray.data.from_pandas(df).repartition(parts), n_clusters=2
        )
        outs.append(out)
        grp = out.groupby("cluster").z
        assert abs(grp.mean()).max() < 1e-9
        # the planted outlier has the global max z
        assert int(out.loc[out.z.idxmax(), "vec_id"]) == len(m) - 1
    assert np.allclose(outs[0].z.to_numpy(), outs[1].z.to_numpy())


def test_bm25_topk_hypothesis(ray_session):
    """Hypothesis sweep: BM25 against the brute-force reference on
    random small corpora and random queries — ids, order, and scores
    must match for every draw."""
    import math

    import ray.data
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extractor_ray.ops.text_analysis import bm25_topk

    vocab = ["apple", "banana", "cherry", "date", "egg", "fig"]
    doc_st = st.lists(st.sampled_from(vocab), min_size=0, max_size=8).map(" ".join)
    query_st = st.lists(st.sampled_from(vocab + ["zzz"]), min_size=1, max_size=3).map(
        " ".join
    )

    @settings(max_examples=25, deadline=None)
    @given(st.lists(doc_st, min_size=1, max_size=10), query_st)
    def run(texts, query):
        k1, b = 1.2, 0.75
        docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        toks = [t.split() for t in texts]
        N = len(docs)
        avgdl = sum(len(t) for t in toks) / N
        terms = sorted(set(query.split()))
        want = {}
        for did, tok in zip(docs.doc_id, toks):
            s, hit = 0.0, False
            for term in terms:
                tf = tok.count(term)
                if tf == 0:
                    continue
                hit = True
                df = sum(term in t for t in toks)
                idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(tok) / (avgdl if avgdl else 1.0))
                )
            if hit:
                want[did] = s
        expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        out = bm25_topk(ray.data.from_pandas(docs).repartition(2), [query], k=4)
        got = out.to_pandas()
        if not expect:
            # no doc shares a term with the query: empty result (Ray
            # empty datasets surface with no schema — repo-wide quirk)
            assert len(got) == 0
            return
        got = got.sort_values(["score", "doc_id"], ascending=[False, True])
        assert list(got.doc_id) == [d for d, _ in expect]
        for g, (_, w) in zip(got.score, expect):
            assert abs(g - w) < 1e-12

    run()


def test_template_shapes(ray_session):
    """DOM-shape fingerprints: same tag sequence with different text
    shares a hash; different structure does not; non-HTML payloads
    skipped; family counts exact and partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.structured import template_families, template_shapes

    pages = pd.DataFrame(
        {
            "url": [f"https://x/{i}" for i in range(6)],
            "html": [
                b"<html><body><p>alpha</p></body></html>",
                b"<html><body><p>totally different words</p></body></html>",
                b"<html><body><div><p>x</p></div></body></html>",
                b"<html><body><p>gamma</p></body></html>",
                b"%PDF-1.4 not html",
                b"<html><body><div><p>y</p></div></body></html>",
            ],
        }
    )
    for parts in (1, 3):
        sh = template_shapes(ray.data.from_pandas(pages).repartition(parts))
        shp = sh.to_pandas()
        assert len(shp) == 5  # PDF row skipped
        fam = (
            template_families(sh)
            .to_pandas()
            .sort_values("n_pages", ascending=False)
            .reset_index(drop=True)
        )
        assert list(fam.n_pages) == [3, 2]
        assert list(fam.n_tags) == [3, 4]


def test_user_cadence_bot_flag(ray_session):
    """Planted constant-timer user flags as a bot (cv ~ 0); bursty
    human traffic does not; single-event users emit no row; cadence
    stats exact and partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.windows import user_cadence

    base = pd.Timestamp("2024-01-01")
    rows = []
    # bot: 20 events exactly 30s apart
    for i in range(20):
        rows.append((1, base + pd.Timedelta(seconds=30 * i), i))
    # human: bursty gaps
    for j, gap in enumerate([1, 2, 600, 5, 3600, 2, 1, 900, 10, 4, 7200, 3]):
        rows.append((2, rows[-1][1] + pd.Timedelta(seconds=gap), 100 + j))
    # near-bot but too few events
    for i in range(5):
        rows.append((3, base + pd.Timedelta(seconds=60 * i), 200 + i))
    rows.append((4, base, 300))  # single event: no gaps, no row
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    outs = []
    for parts in (1, 4):
        out = (
            user_cadence(ray.data.from_pandas(ev).repartition(parts))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        outs.append(out)
        assert set(out.user_id) == {1, 2, 3}
        assert int(out.loc[out.user_id == 1, "is_bot"].iloc[0]) == 1
        assert abs(out.loc[out.user_id == 1, "gap_cv"].iloc[0]) < 1e-12
        assert abs(out.loc[out.user_id == 1, "mean_gap_s"].iloc[0] - 30.0) < 1e-12
        assert int(out.loc[out.user_id == 2, "is_bot"].iloc[0]) == 0
        assert out.loc[out.user_id == 2, "gap_cv"].iloc[0] > 1.0
        assert int(out.loc[out.user_id == 3, "is_bot"].iloc[0]) == 0  # < min_events
    assert outs[0].equals(outs[1])


def test_label_centroids(ray_session):
    """Prototype table equals the per-label numpy mean exactly (up to
    float reassociation), 1-based dims, partition-invariant shape."""
    import ray.data

    from pdf_extractor_ray.ops.cluster import label_centroids

    emb = pd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["label", "embedding"]
    )
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    for parts in (1, 5):
        out = (
            label_centroids(ray.data.from_pandas(emb).repartition(parts))
            .to_pandas()
            .sort_values(["label", "i"])
            .reset_index(drop=True)
        )
        assert set(out.i) == set(range(1, m.shape[1] + 1))
        for lab in sorted(emb.label.unique()):
            want = m[emb.label.to_numpy() == lab].mean(axis=0)
            got = out.loc[out.label == lab].sort_values("i").centroid.to_numpy()
            assert np.allclose(got, want, atol=1e-12)


def test_readability_signals(ray_session):
    """Flesch variant and code-point entropy on handcrafted docs:
    known formula values, empty-doc fixed point, multi-byte script
    entropy counted per code point, partition-invariant."""
    import math

    import ray.data

    from pdf_extractor_ray.ops.quality import readability_signals

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the cat sat. the dog ran!",   # 6 words, 2 sentences, 6 vowel runs
                "aaaa",                         # 1 word, min-1 sentence, 1 run
                "",                             # empty: zeros, flesch fixed point
                "ああい",           # 2 distinct code points (JA)
            ],
        }
    )
    for parts in (1, 3):
        out = (
            readability_signals(ray.data.from_pandas(docs).repartition(parts))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        r0 = out.iloc[0]
        assert (r0.n_words, r0.n_sentences, r0.n_syllables) == (6, 2, 6)
        assert abs(r0.flesch - (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-9
        r1 = out.iloc[1]
        assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (1, 1, 1)
        r2 = out.iloc[2]
        assert (r2.n_words, r2.n_syllables, r2.char_entropy) == (0, 0, 0.0)
        assert abs(r2.flesch - 206.835) < 1e-9
        r3 = out.iloc[3]
        want_ent = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
        assert abs(r3.char_entropy - want_ent) < 1e-12


def test_quantization_constant_dimension(ray_session):
    """A constant embedding dimension (mx == mn) must code to 0 and
    dequantize back to the constant exactly — the zero-scale guard."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import quantize_embeddings, quantize_fit

    rng = np.random.RandomState(3)
    m = rng.normal(0, 1, (50, 6))
    m[:, 2] = 0.75  # constant dimension
    m[:, 5] = -1.25  # another, negative
    df = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64), "embedding": list(m)})
    ds = ray.data.from_pandas(df).repartition(3)
    fit = quantize_fit(ds)
    assert fit.mn.iloc[2] == fit.mx.iloc[2] == 0.75
    qpd = quantize_embeddings(ds, fit).to_pandas()
    codes = np.stack([np.asarray(v) for v in qpd.qvec])
    assert (codes[:, 2] == 0).all() and (codes[:, 5] == 0).all()
    # dequantization convention: code 0 of a constant dim -> mn exactly
    mn, mx = fit.mn.to_numpy(), fit.mx.to_numpy()
    dq = mn + codes.astype(np.float64) * (mx - mn) / 255.0
    assert (dq[:, 2] == 0.75).all() and (dq[:, 5] == -1.25).all()


def test_user_cadence_random_parity(ray_session):
    """Hypothesis sweep: user_cadence equals a direct pandas
    computation (sort, diff, closed-form cv) on random event sets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import ray.data

    from pdf_extractor_ray.ops.windows import user_cadence

    ev_st = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),       # user
            st.integers(min_value=0, max_value=10_000),  # offset seconds
        ),
        min_size=2,
        max_size=40,
    )

    @settings(max_examples=20, deadline=None)
    @given(ev_st)
    def run(rows):
        base = pd.Timestamp("2024-03-01")
        ev = pd.DataFrame(
            {
                "user_id": [u for u, _ in rows],
                "ts": [base + pd.Timedelta(seconds=s) for _, s in rows],
                "event_id": range(len(rows)),
            }
        )
        out = user_cadence(ray.data.from_pandas(ev).repartition(2)).to_pandas()
        ref_rows = []
        for uid, g in ev.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"])
            gaps = g.ts.diff().dropna().dt.total_seconds().to_numpy()
            if len(gaps) == 0:
                continue
            n, s, s2 = float(len(gaps)), gaps.sum(), (gaps ** 2).sum()
            cv = np.sqrt(max(n * s2 - s * s, 0.0)) / (s if s > 0 else 1.0)
            ref_rows.append((uid, len(g), s / n, cv))
        ref = pd.DataFrame(
            ref_rows, columns=["user_id", "n_events", "mean_gap_s", "gap_cv"]
        ).sort_values("user_id").reset_index(drop=True)
        if ref.empty:
            # all users single-event: empty result surfaces schema-less
            assert len(out) == 0
            return
        out = out.sort_values("user_id").reset_index(drop=True)
        assert list(out.user_id) == list(ref.user_id)
        assert list(out.n_events) == list(ref.n_events)
        assert np.allclose(out.mean_gap_s, ref.mean_gap_s, atol=1e-9)
        assert np.allclose(out.gap_cv, ref.gap_cv, atol=1e-9)

    run()


def test_user_cadence_duckdb_bit_parity(ray_session):
    """Cross-ENGINE hash stability (the r4 driver flake): the emitted
    mean_gap_s/gap_cv doubles must be BIT-identical to the DuckDB twin
    regardless of input partitioning, because both sides accumulate
    exact integer-microsecond sums and round once. The earlier
    Ray-vs-pandas Hypothesis test shares float ops with the op and
    cannot catch sum-order drift — this one can."""
    import duckdb
    import ray.data

    from pdf_extractor_ray.ops.windows import user_cadence

    rng = np.random.RandomState(11)
    base = pd.Timestamp("2024-03-01")
    # long gaps on purpose: hours-scale gaps squared overflow int64 µs²
    offs = np.cumsum(rng.randint(1, 30_000_000, size=400))  # up to ~8h gaps
    ev = pd.DataFrame(
        {
            "user_id": rng.randint(1, 25, size=400).astype(np.int64),
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in offs],
            "event_id": np.arange(400, dtype=np.int64),
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    sql = __import__("__ray_entry__").oracle_sql()["events_bot_cadence"]
    want = con.execute(sql).df()
    for parts in (1, 3, 7):
        got = (
            user_cadence(ray.data.from_pandas(ev).repartition(parts))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert list(got.user_id) == list(want.user_id)
        # bit-exact: exact integer sums + one rounding on each side
        assert (
            got.mean_gap_s.to_numpy().tobytes()
            == want.mean_gap_s.to_numpy().tobytes()
        )
        assert got.gap_cv.to_numpy().tobytes() == want.gap_cv.to_numpy().tobytes()
        assert list(got.is_bot.astype("int64")) == list(want.is_bot)


def test_temperature_sample(ray_session):
    """Temperature rebalancing: alpha=1 keeps everything (p_i = 1);
    small alpha flattens — the high-resource group's keep-rate drops
    below the low-resource group's; deterministic per id and
    partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.selection import temperature_sample

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(1100, dtype=np.int64),
            "lang": ["big"] * 1000 + ["small"] * 100,
        }
    )
    ds = ray.data.from_pandas(docs).repartition(4)
    full = temperature_sample(ds, alpha=1.0).to_pandas()
    assert len(full) == 1100  # alpha=1: q_i proportional to n_i -> p_i = 1

    outs = []
    for parts in (1, 4):
        out = temperature_sample(
            ray.data.from_pandas(docs).repartition(parts), alpha=0.3
        ).to_pandas()
        outs.append(set(out.doc_id))
        rates = out.groupby("lang").size() / docs.groupby("lang").size()
        assert rates["small"] > rates["big"]  # flattening
        assert rates["small"] > 0.9           # low-resource nearly intact
        # expectation check: big's keep-rate ~ total*q_big/n_big
        n = np.array([1000.0, 100.0])
        q = n ** 0.3
        q = q / q.sum()
        p_big = min(1.0, 1100.0 * q[0] / 1000.0)
        assert abs(rates["big"] - p_big) < 0.06
    assert outs[0] == outs[1]


def test_containment_pairs(ray_session):
    """A document strictly contained in a larger one is found even
    when symmetric Jaccard sits well under the containment threshold;
    unrelated docs never pair; existing jaccard-kind dedup behavior
    untouched (dispatch regression)."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import containment_pairs, jaccard

    inner = " ".join(
        f"sentence{i} with plenty of shared running text over the river bank"
        for i in range(8)
    )
    outer = inner + " trailing boiler plate navigation footer block"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                inner,
                outer,
                "completely unrelated content about distributed execution engines and arrow",
                "another standalone document with its own words entirely",
            ],
        }
    )
    # sanity: resemblance sits BELOW the containment threshold but
    # containment is ~1 (symmetric jaccard would need threshold <= 0.9)
    assert jaccard(inner, outer) < 0.92
    for parts in (1, 3):
        out = (
            containment_pairs(
                ray.data.from_pandas(docs).repartition(parts),
                threshold=0.95,
                bands=32,
                rows=4,
            )
            .to_pandas()
        )
        got = set(map(tuple, out[["a", "b"]].to_numpy()))
        assert got == {(0, 1)}, got


def test_containment_anchor_tier_recovers_lsh_miss(ray_session):
    """VERDICT r4 item 4: a short distinctive quote embedded in a ~40x
    larger page has jaccard ~ 0.025 — far below even the sensitive
    bands=32/rows=4 LSH threshold, so the pure-LSH tier MISSES it —
    while the anchor-gram tier (hit probability depends only on the
    absolute overlap, not the size ratio) recovers it. The default
    'both' tier therefore finds it too, and never invents pairs among
    the unrelated filler docs."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import containment_pairs, jaccard

    rng = np.random.RandomState(7)

    def prose(n_words: int, tag: str) -> str:
        words = [f"{tag}{rng.randint(0, 4000):04d}" for _ in range(n_words)]
        return " ".join(words)

    quote = (
        "the quick brown fox jumps over the lazy dog while the five "
        "boxing wizards jump quickly and pack my box with dozen liquor jugs "
        "sphinx of black quartz judge my vow amazingly few discotheques "
        "provide jukeboxes for the waltzing matilda chorus line tonight"
    )
    container = prose(2000, "filler") + " " + quote + " " + prose(2600, "more")
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                quote,
                container,
                prose(300, "aaa"),
                prose(300, "bbb"),
            ],
        }
    )
    assert jaccard(quote, container) < 0.05  # symmetric LSH hopeless
    ds = ray.data.from_pandas(docs).repartition(2)
    lsh_only = containment_pairs(ds, threshold=0.9, bands=32, rows=4, tier="lsh").to_pandas()
    lsh_pairs = (
        set(map(tuple, lsh_only[["a", "b"]].to_numpy())) if len(lsh_only) else set()
    )
    assert (0, 1) not in lsh_pairs
    for tier in ("anchor", "both"):
        out = containment_pairs(ds, threshold=0.9, tier=tier).to_pandas()
        got = set(map(tuple, out[["a", "b"]].to_numpy()))
        assert got == {(0, 1)}, (tier, got)


def test_containment_anchor_size_ratio_sweep(ray_session):
    """Anchor-tier recall is container-size INDEPENDENT by
    construction: the same ~600-char quote embedded at size ratios
    10x / 40x / 100x is recovered at every ratio (hit probability
    1-(1-2^-rate)^|I| depends only on the quote's own shingle count),
    across several seeds."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import containment_pairs

    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)

        def prose(n_words: int, tag: str) -> str:
            return " ".join(f"{tag}{rng.randint(0, 9000):04d}" for _ in range(n_words))

        quote = prose(90, f"quote{seed}x")  # ~600 chars of distinctive text
        rows = [(0, quote)]
        for j, ratio in enumerate((10, 40, 100), start=1):
            n_fill = 90 * ratio
            body = prose(n_fill // 2, f"f{seed}{j}a") + " " + quote + " " + prose(
                n_fill - n_fill // 2, f"f{seed}{j}b"
            )
            rows.append((j, body))
        docs = pd.DataFrame(rows, columns=["doc_id", "text"])
        out = containment_pairs(
            ray.data.from_pandas(docs).repartition(2), threshold=0.9, tier="anchor"
        ).to_pandas()
        got = set(map(tuple, out[["a", "b"]].to_numpy())) if len(out) else set()
        assert {(0, 1), (0, 2), (0, 3)} <= got, (seed, got)


def test_leakage_safe_split_family_invariants(ray_session):
    """No near-dup pair may straddle the split: docs sharing a dup
    component carry identical (family, split); docs outside the dup
    graph are their own singleton family; every doc appears exactly
    once; the md5-u52 gate matches a direct recomputation."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import dup_ngram_components
    from pdf_extractor_ray.ops.scrub import md5_u52
    from pdf_extractor_ray.ops.selection import leakage_safe_split

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                f"{shared} tail one",
                f"{shared} tail two",  # dups with doc 0 via the shared 8-gram
                "unique words only here nothing repeats at all ever once",
                f"intro text {shared}",  # also in the family
                "another fully unique document with its own words entirely",
                "", " ",  # empty/blank docs are singletons, never dropped
                f"{shared} tail three",
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    comp = dup_ngram_components(ds, n=8)
    out = leakage_safe_split(ds, comp, val_frac=0.25).to_pandas()

    assert sorted(out["doc_id"]) == list(range(8))
    fam = out.set_index("doc_id")["family"]
    spl = out.set_index("doc_id")["split"]
    assert fam[0] == fam[1] == fam[3] == fam[7] == 0  # min doc_id labels the family
    assert len({spl[0], spl[1], spl[3], spl[7]}) == 1  # never straddles
    for singleton in (2, 4, 5, 6):
        assert fam[singleton] == singleton
    # the gate is exactly md5_u52(str(family)) < floor(frac * 2^52)
    thr = np.floor(0.25 * 2.0**52)
    want = np.where(
        md5_u52([str(int(f)) for f in out["family"]]).astype("float64") < thr, "val", "train"
    )
    assert (out["split"].to_numpy() == want).all()


def test_ngram_decontaminate_against_hand_computed(ray_session):
    """Known-answer contamination: doc 1 embeds the 5-word eval phrase
    verbatim, so exactly its three interior 3-grams hit (grams
    straddling the phrase boundary do not — hand-counted below);
    doc 2 is clean; doc 3 is a verbatim eval copy (every position
    hits); docs shorter than n words emit nothing."""
    import ray.data

    from pdf_extractor_ray.ops.scrub import ngram_decontaminate_against

    eval_docs = pd.DataFrame(
        {"doc_id": [100], "text": ["the quick brown fox jumps"]}
    )
    train_docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                # contains "quick brown fox" -> exactly one 3-gram hit,
                # plus "the quick brown"/"brown fox jumps" also present
                "yesterday the quick brown fox jumps over something new",
                "completely clean text with no overlap whatsoever here",
                "the quick brown fox jumps",  # verbatim eval copy
                "too short",  # < n tokens -> no row
            ],
        }
    )
    out = (
        ngram_decontaminate_against(
            ray.data.from_pandas(train_docs).repartition(2),
            ray.data.from_pandas(eval_docs),
            n=3,
            num_partitions=4,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]
    # doc 1: 7 positions, hits = "the quick brown", "quick brown fox",
    # "brown fox jumps" = 3
    assert out.loc[1, "n_grams"] == 7 and out.loc[1, "n_hit_grams"] == 3
    assert bool(out.loc[1, "contaminated"]) is True
    assert out.loc[2, "n_hit_grams"] == 0 and not out.loc[2, "contaminated"]
    assert out.loc[3, "n_grams"] == 3 and out.loc[3, "n_hit_grams"] == 3
    assert out.loc[3, "hit_fraction"] == 1.0


def test_eval_span_scrub_tiers_agree(ray_session):
    """Scrub semantics: tokens covered by any eval n-gram window are
    removed (a verbatim eval copy scrubs to the empty string, an
    embedded phrase loses exactly the covered window, clean and
    short docs pass through) — and the broadcast and positional tiers
    return bit-identical frames."""
    import ray.data

    from pdf_extractor_ray.ops.scrub import eval_span_scrub

    eval_docs = pd.DataFrame({"doc_id": [100], "text": ["the quick brown fox jumps"]})
    train_docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "yesterday the quick brown fox jumps over something new",
                "completely clean text with no overlap whatsoever here",
                "the quick brown fox jumps",  # verbatim eval copy
                "too short",  # < n tokens: passes through unchanged
            ],
        }
    )

    def run(**kw):
        return (
            eval_span_scrub(
                ray.data.from_pandas(train_docs).repartition(2),
                ray.data.from_pandas(eval_docs),
                n=3,
                num_partitions=4,
                **kw,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    bcast = run()
    positional = run(broadcast_max_grams=0)
    pd.testing.assert_frame_equal(bcast, positional)

    out = bcast.set_index("doc_id")
    # doc 1: positions 1..5 covered (grams starting at 1,2,3 of the
    # 5-word phrase, window 3) -> 5 tokens removed of 9
    assert out.loc[1, "text"] == "yesterday over something new"
    assert out.loc[1, "n_tokens"] == 9 and out.loc[1, "n_removed_tokens"] == 5
    assert out.loc[2, "n_removed_tokens"] == 0
    assert out.loc[3, "text"] == "" and out.loc[3, "n_removed_tokens"] == 5
    assert out.loc[4, "text"] == "too short" and out.loc[4, "n_removed_tokens"] == 0


def test_group_mean_gate_integer_inequality(ray_session):
    """Whole-group drops by integer sum >= min_mean * count (never a
    float avg): group a mean 10 keeps, group b mean 9.5 drops, the
    boundary mean == min_mean keeps (>=)."""
    import ray.data

    from pdf_extractor_ray.ops.quality import group_mean_gate

    df = pd.DataFrame(
        {
            "doc_id": range(6),
            "source": ["a", "a", "b", "b", "c", "c"],
            "sig": [8, 12, 9, 10, 10, 10],  # means: a=10, b=9.5, c=10
        }
    )
    out = (
        group_mean_gate(
            ray.data.from_pandas(df).repartition(3), "source", "sig", min_mean=10
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert sorted(out["source"].unique()) == ["a", "c"]
    assert sorted(out["doc_id"]) == [0, 1, 4, 5]


def test_mixture_plan_stride_interleave(ray_session):
    """Weight-2 source appears twice as densely: with sources a(w=2,
    4 docs) and b(w=1, 2 docs), strides are 1 and 2, so the plan order
    by (stride_key, source) is a,a,b,a,a,b — exact 2:1 in every
    prefix aligned to a stride period. mix_rank is a permutation and
    src_rank follows the md5-u52 shuffle order."""
    import ray.data

    from pdf_extractor_ray.ops.scrub import md5_u52
    from pdf_extractor_ray.ops.selection import mixture_plan

    df = pd.DataFrame(
        {"doc_id": [10, 11, 12, 13, 20, 21], "source": ["a"] * 4 + ["b"] * 2}
    )
    out = (
        mixture_plan(ray.data.from_pandas(df).repartition(3), {"a": 2, "b": 1}, L=2)
        .to_pandas()
        .sort_values("mix_rank")
        .reset_index(drop=True)
    )
    assert sorted(out["mix_rank"]) == [1, 2, 3, 4, 5, 6]
    assert list(out["source"]) == ["a", "a", "b", "a", "a", "b"]
    # src_rank within each source follows (md5_u52(str(id)), id)
    for src in ("a", "b"):
        part = out[out["source"] == src].sort_values("src_rank")
        ids = part["doc_id"].tolist()
        u = md5_u52([str(i) for i in ids])
        assert sorted(range(len(ids)), key=lambda j: (u[j], ids[j])) == list(range(len(ids)))


def test_mirror_pairs_hand_computed(ray_session):
    """Host pairs by shared distinct content: full mirror (2/2 shared),
    partial below threshold (1 of min-side 2 = 50% < pct=60),
    disjoint hosts emit no pair; per-source totals are DISTINCT text
    counts (the repeated doc in src a counts once)."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import mirror_pairs

    df = pd.DataFrame(
        {
            "source": ["a", "a", "a", "m", "m", "b", "b", "b", "c"],
            "text": [
                "shared one",
                "shared one",  # duplicate within a: distinct-counted once
                "shared two",
                "shared one",
                "shared two",  # m mirrors a fully (2/2)
                "shared one",
                "b only text",
                "b other text",  # b: 1 of 3 shared
                "c unique",  # c: disjoint
            ],
        }
    )
    out = (
        mirror_pairs(
            ray.data.from_pandas(df).repartition(3), min_shared_pct=60, num_partitions=4
        )
        .to_pandas()
        .set_index(["src_a", "src_b"])
    )
    assert ("a", "c") not in out.index and ("b", "c") not in out.index
    am = out.loc[("a", "m")]
    assert am["n_shared"] == 2 and am["n_a"] == 2 and am["n_b"] == 2 and bool(am["mirror"])
    ab = out.loc[("a", "b")]
    assert ab["n_shared"] == 1 and ab["n_b"] == 3 and not bool(ab["mirror"])
    bm = out.loc[("b", "m")]
    assert bm["n_shared"] == 1 and not bool(bm["mirror"])


def test_truncation_recall_reference(ray_session):
    """m = full dim is a perfect retriever (recall 1.0 for every
    query); a real truncation reproduces a brute-force numpy
    reference computed with the same (cos DESC, id) tie-break."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import truncation_recall

    rng = np.random.RandomState(7)
    n, d = 60, 12
    vecs = rng.randn(n, d).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(n), "embedding": [list(v) for v in vecs]})
    ds = ray.data.from_pandas(df).repartition(3)

    full = truncation_recall(ds, m=d, k=5, query_mod=15)
    assert (full["recall_at_k"] == 1.0).all() and len(full) == 4

    out = truncation_recall(ds, m=4, k=5, query_mod=15).set_index("query_id")

    def norm(a):
        nn = np.linalg.norm(a, axis=1, keepdims=True)
        return a / np.where(nn == 0, 1, nn)

    vf, vm = norm(vecs.astype(np.float64)), norm(vecs[:, :4].astype(np.float64))
    for qid in (0, 15, 30, 45):
        exp = {}
        for tag, mat in (("f", vf), ("t", vm)):
            sims = mat @ mat[qid]
            ids = np.array([i for i in range(n) if i != qid])
            cc = sims[ids]
            exp[tag] = set(ids[np.lexsort((ids, -cc))[:5]])
        want = len(exp["f"] & exp["t"])
        assert out.loc[qid, "n_overlap"] == want
        assert out.loc[qid, "recall_at_k"] == want / 5


def test_unicode_canonicalize_cases(ray_session):
    """NFC composes combining marks, zero-width chars strip, ASCII
    whitespace collapses and trims; NBSP is NOT whitespace here (the
    explicit-ASCII-class contract) and clean text is unchanged."""
    import ray.data

    from pdf_extractor_ray.ops.scrub import unicode_canonicalize

    df = pd.DataFrame(
        {
            "doc_id": range(5),
            "text": [
                "café terrace",  # decomposed -> café (5 chars shorter by 1)
                "a​b﻿c",  # zero-width poison
                "  two\t\tspaces \n",  # collapse + trim
                "caf\u00e9\u00a0nbsp kept",  # already NFC; real NBSP preserved
                "clean text",
            ],
        }
    )
    out = (
        unicode_canonicalize(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "text"] == "café terrace" and bool(out.loc[0, "changed"])
    assert out.loc[0, "n_chars_before"] == 13 and out.loc[0, "n_chars_after"] == 12
    assert out.loc[1, "text"] == "abc" and out.loc[1, "n_chars_after"] == 3
    assert out.loc[2, "text"] == "two spaces"
    assert out.loc[3, "text"] == "caf\u00e9\u00a0nbsp kept" and not bool(out.loc[3, "changed"])
    assert out.loc[4, "text"] == "clean text" and not bool(out.loc[4, "changed"])


def test_vocab_drift_hand_computed(ray_session):
    """Exact integer cross-multiplied drift: corpus A = 'x x y'
    (N_a=3), corpus B = 'y y z' (N_b=3); drift(x)=|2*3-0*3|=6,
    drift(y)=|1*3-2*3|=3, drift(z)=3 — ties break by term."""
    import ray.data

    from pdf_extractor_ray.ops.text_analysis import vocab_drift

    a = ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["x x y"]}))
    b = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["y y z"]}))
    out = vocab_drift(a, b, top_n=10)
    assert list(out["term"]) == ["x", "y", "z"]
    assert list(out["drift"]) == [6, 3, 3]
    assert list(out["n_a"]) == [2, 1, 0] and list(out["n_b"]) == [0, 2, 1]


def test_bitext_mine_planted_pairs(ray_session):
    """Margin mining on a planted bilingual fixture: each source
    vector's true translation is its own direction + tiny noise among
    random distractor targets — the mined pair per source is exactly
    the planted one, with margin comfortably above the distractor
    margins, partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import bitext_mine

    rng = np.random.default_rng(7)
    d, n = 8, 6
    dirs = rng.normal(size=(n, d))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    src = pd.DataFrame(
        {"vec_id": range(n), "embedding": [list(v) for v in dirs]}
    )
    # targets: planted translation i -> 100+i, plus 10 random distractors
    tgt_vecs = [list(v + rng.normal(scale=0.05, size=d)) for v in dirs]
    tgt_ids = [100 + i for i in range(n)]
    for j in range(10):
        tgt_ids.append(200 + j)
        tgt_vecs.append(list(rng.normal(size=d)))
    tgt = pd.DataFrame({"vec_id": tgt_ids, "embedding": tgt_vecs})
    for parts in (1, 3):
        out = bitext_mine(
            ray.data.from_pandas(src).repartition(parts),
            ray.data.from_pandas(tgt).repartition(parts),
            k=3,
            threshold=1.2,
        )
        assert list(out["src_id"]) == list(range(n))
        assert list(out["tgt_id"]) == [100 + i for i in range(n)]
        assert (out["margin"] > 1.2).all() and (out["cos"] > 0.9).all()
    # a hub-discounting check: raising the threshold past the planted
    # margins mines nothing
    none = bitext_mine(
        ray.data.from_pandas(src),
        ray.data.from_pandas(tgt),
        k=3,
        threshold=float(out["margin"].max()) + 1.0,
    )
    assert none.empty


def test_bitext_mine_bucketed_tier(ray_session):
    """The IVF-bucketed scale tier: with every bucket probed and an
    uncapped candidate cut it EQUALS the exact miner bitwise (each
    target lives in exactly one bucket, every source visits all of
    them); at n_probe=5 of 8 the mined-pair recall vs exact stays
    >= 0.8 on the fixture embeddings (near-uniform vectors, IVF's
    worst case — measured 0.853); the auto tier routes a small target
    side to exact."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import bitext_mine

    emb = pd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    src = ray.data.from_pandas(emb[emb.vec_id % 2 == 0]).repartition(3)
    tgt = ray.data.from_pandas(emb[emb.vec_id % 2 == 1]).repartition(3)
    exact = bitext_mine(src, tgt, k=4, threshold=1.0, tier="exact")
    full = bitext_mine(
        src, tgt, k=4, threshold=1.0, tier="bucketed",
        n_centroids=8, n_probe=8, cand_per_query=10_000,
    )
    pd.testing.assert_frame_equal(exact, full)
    approx = bitext_mine(
        src, tgt, k=4, threshold=1.0, tier="bucketed",
        n_centroids=8, n_probe=5, cand_per_query=16,
    )
    m = exact.merge(approx, on="src_id", suffixes=("_e", "_a"))
    rec = (m.tgt_id_e == m.tgt_id_a).mean()
    assert rec >= 0.8, rec
    auto = bitext_mine(src, tgt, k=4, threshold=1.0)
    pd.testing.assert_frame_equal(exact, auto)


def test_boilerplate_line_filter(ray_session):
    """CCNet/RefinedWeb line-frequency boilerplate removal: a line in
    >= min_docs distinct documents is removed EVERYWHERE (including
    its first occurrence and repeats within one doc); df below the
    threshold keeps; blank lines are structure and never count;
    broadcast and co-shuffle tiers agree bitwise;
    partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import boilerplate_line_filter

    footer = "all rights reserved"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                f"body one\n{footer}",
                f"{footer}\nbody two\n\nbody two tail",
                f"body three\n{footer}\n{footer}",  # footer twice
                f"body four\nseen twice",
                f"seen twice\nbody five",  # df=2 < min_docs -> kept
                footer,  # all-boilerplate doc -> empty
            ],
        }
    )

    def run(parts, **kw):
        return (
            boilerplate_line_filter(
                ray.data.from_pandas(docs).repartition(parts), min_docs=3, **kw
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    out = run(1)
    pd.testing.assert_frame_equal(out, run(3))
    pd.testing.assert_frame_equal(out, run(3, broadcast_max_pairs=0))
    o = out.set_index("doc_id")
    assert o.loc[1, "text"] == "body one" and o.loc[1, "n_removed"] == 1
    assert o.loc[2, "text"] == "body two\n\nbody two tail"  # blank kept
    assert o.loc[3, "text"] == "body three" and o.loc[3, "n_removed"] == 2
    assert o.loc[4, "text"] == "body four\nseen twice"
    assert o.loc[5, "text"] == "seen twice\nbody five"
    assert o.loc[6, "text"] == "" and o.loc[6, "n_lines"] == 1
    assert list(o["n_lines"]) == [2, 4, 3, 2, 2, 1]


def test_shuffle_skew_audit(ray_session):
    """Partition-skew pre-flight: md5-u52 part assignment matches the
    hashlib formula, per-part totals and distinct-key counts are
    exact, the hot key surfaces as top_key with its row count, and
    the result is partition-invariant."""
    import hashlib

    import ray.data

    from pdf_extractor_ray.ops.relational import shuffle_skew_audit

    # key 7 is hot (60 rows); keys 1..5 get 3 rows each
    keys = [7] * 60 + [1, 2, 3, 4, 5] * 3
    df = pd.DataFrame({"user_id": keys})
    P = 8

    def part_of(k: int) -> int:
        return int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16) % P

    for parts in (1, 4):
        out = shuffle_skew_audit(
            ray.data.from_pandas(df).repartition(parts), "user_id", num_partitions=P
        )
        assert int(out["n_rows"].sum()) == len(df)
        hot_part = part_of(7)
        row = out.set_index("part").loc[hot_part]
        assert int(row["top_key"]) == 7 and int(row["top_key_rows"]) == 60
        # every emitted part id matches the md5 assignment of its top key
        for _, r in out.iterrows():
            assert part_of(int(r["top_key"])) == int(r["part"])
        # distinct keys across parts = 6
        assert int(out["n_keys"].sum()) == 6


def test_cluster_topics_planted_vocab(ray_session):
    """c-TF-IDF topic labeling (BERTopic): two well-separated embedding
    clusters whose documents use disjoint planted vocabularies — each
    cluster's top terms are exactly its own vocabulary, ranked above
    the everywhere-word, and the score algebra matches the closed form
    tf * ln(1 + A/ft)."""
    import math

    import ray.data

    from pdf_extractor_ray.ops.cluster import cluster_topics

    rng = np.random.default_rng(3)
    n_per = 8
    rows_e, rows_d = [], []
    for i in range(n_per * 2):
        side = i % 2
        base = np.zeros(6)
        base[side] = 1.0
        v = base + rng.normal(scale=0.05, size=6)
        rows_e.append({"vec_id": i, "embedding": list(v)})
        words = (
            ["alpha", "beta", "alpha", "common"]
            if side == 0
            else ["delta", "epsilon", "delta", "common"]
        )
        rows_d.append({"doc_id": i, "text": " ".join(words)})
    emb = ray.data.from_pandas(pd.DataFrame(rows_e)).repartition(3)
    docs = ray.data.from_pandas(pd.DataFrame(rows_d)).repartition(2)
    out = cluster_topics(emb, docs, n_clusters=2, top_terms=3)
    assert set(out["cluster"]) == {0, 1}
    by_c = {c: list(g.sort_values("rank")["term"]) for c, g in out.groupby("cluster")}
    vocabs = [set(t) for t in by_c.values()]
    assert {"alpha", "beta"} <= (vocabs[0] | vocabs[1])
    for c, terms in by_c.items():
        if "alpha" in terms:
            assert terms[0] == "alpha" and "delta" not in terms and "epsilon" not in terms
        else:
            assert terms[0] == "delta" and "alpha" not in terms and "beta" not in terms
    # closed-form score check: alpha has tf=16, ft=16; A = 32 words/cluster
    row = out[out["term"] == "alpha"].iloc[0]
    assert row["tf"] == 16 and row["ft"] == 16
    assert abs(row["score"] - 16 * math.log1p(32 / 16)) < 1e-12


def test_logreg_quality_gate(ray_session):
    """Hashed-feature logistic regression (the fastText/DCLM-shaped
    quality gate): on a linearly separable planted vocabulary it
    reaches accuracy 1.0; distributed full-batch GD matches a
    single-process numpy reference (same math, one partial) to 1e-8;
    partition layout moves the weights only by float reassociation."""
    import ray.data

    from pdf_extractor_ray.ops.classify import (
        LogRegModel,
        _lr_explode,
        logreg_predict,
        logreg_train,
    )

    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        y = i % 2
        words = (["crisp", "sourced", "verified"] if y else ["spammy", "clickbait", "junk"])
        fill = [str(rng.integers(0, 20)) for _ in range(3)]
        rows.append({"doc_id": i, "text": " ".join(words + fill), "y": y})
    df = pd.DataFrame(rows)
    ds1 = ray.data.from_pandas(df).repartition(1)
    ds3 = ray.data.from_pandas(df).repartition(3)
    m1 = logreg_train(ds1, "y", n_buckets=512, iters=25)
    m3 = logreg_train(ds3, "y", n_buckets=512, iters=25)
    np.testing.assert_allclose(m1.w, m3.w, rtol=0, atol=1e-8)

    # single-process reference: identical math over the full frame
    nb = 512
    rid, bk, cnt, lens = _lr_explode(df, "text", nb)
    y = df["y"].to_numpy(dtype=np.float64)
    w = np.zeros(nb)
    b = 0.0
    for _ in range(25):
        z = np.zeros(len(df))
        np.add.at(z, rid, w[bk] * cnt)
        z = z / lens + b
        p = 1 / (1 + np.exp(-z))
        r = p - y
        gw = np.zeros(nb)
        np.add.at(gw, bk, r[rid] * cnt / lens[rid])
        w = w - 0.5 * (gw / len(df) + 1e-4 * w)
        b = b - 0.5 * (r.sum() / len(df))
    np.testing.assert_allclose(m1.w, w, rtol=0, atol=1e-8)
    assert abs(m1.b - b) < 1e-8

    out = (
        logreg_predict(ds3, m1, keep_cols=["doc_id", "y"])
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (out["pred"].to_numpy() == out["y"].to_numpy()).all()
    assert m1.meta["losses"][-1] < m1.meta["losses"][0]
    # scoring with an all-zero model is exactly 0.5 everywhere
    z0 = logreg_predict(
        ds1, LogRegModel(w=np.zeros(nb), b=0.0, n_buckets=nb), keep_cols=["doc_id"]
    ).to_pandas()
    assert (z0["score"] == 0.5).all()


def test_export_jsonl_shards_roundtrip(ray_session):
    """JSONL interchange export: md5-sharded placement identical to
    the parquet exporter, byte-deterministic files (gzip mtime=0),
    lossless roundtrip through read_jsonl_shards for plain and gz,
    _SUCCESS resume skips completed shards, and a missing marker
    refuses to read."""
    import os
    import tempfile

    import ray.data

    from pdf_extractor_ray.pipelines.export import (
        export_jsonl_shards,
        export_training_shards,
        read_jsonl_shards,
    )

    df = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [f"zeile {i} éß" for i in range(40)],
            "lang": ["en", "fr"] * 20,
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    d_j = tempfile.mkdtemp(prefix="jl_")
    d_p = tempfile.mkdtemp(prefix="pq_")
    mj = export_jsonl_shards(ds, d_j, n_shards=4)
    mp = export_training_shards(ds, d_p, n_shards=4)
    # identical placement contract as the parquet exporter
    pd.testing.assert_frame_equal(
        mj[["shard", "n_rows"]], mp[["shard", "n_rows"]]
    )
    back = read_jsonl_shards(d_j).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)

    d_g = tempfile.mkdtemp(prefix="jlgz_")
    export_jsonl_shards(ds, d_g, n_shards=4, gzip_compress=True)
    bg = read_jsonl_shards(d_g).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(bg, df)
    # byte-determinism: same export twice -> identical gz bytes
    d_g2 = tempfile.mkdtemp(prefix="jlgz2_")
    export_jsonl_shards(ds, d_g2, n_shards=4, gzip_compress=True)
    for s in os.listdir(d_g):
        if s.startswith("shard="):
            a = open(os.path.join(d_g, s, "part-0.jsonl.gz"), "rb").read()
            b = open(os.path.join(d_g2, s, "part-0.jsonl.gz"), "rb").read()
            assert a == b

    assert len(export_jsonl_shards(ds, d_j, n_shards=4)) == 0  # resume no-op
    os.remove(os.path.join(d_j, "shard=00001", "_SUCCESS"))
    try:
        read_jsonl_shards(d_j)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass


def test_blocklist_signals(ray_session):
    """C4-style token blocklist: case-folded whitespace-token
    membership, any-occurrence flag at max_fraction=0, fraction
    thresholding above it, zero-token docs never flag."""
    import ray.data

    from pdf_extractor_ray.ops.quality import blocklist_signals

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "clean words only here",
                "one BADWORD among five tokens",
                "badword badword badword clean",
                "",
            ],
        }
    )
    out = (
        blocklist_signals(
            ray.data.from_pandas(docs).repartition(2),
            ["badword"],
            keep_cols=["doc_id"],
        )
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert list(out["n_blocked"]) == [0, 1, 3, 0]
    assert list(out["flagged"]) == [False, True, True, False]
    assert abs(out.loc[3, "blocked_fraction"] - 0.75) < 1e-12
    # fraction threshold: 1/5 = 0.2 <= 0.25 passes
    lax = (
        blocklist_signals(
            ray.data.from_pandas(docs), ["badword"], keep_cols=["doc_id"],
            max_fraction=0.25,
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert list(lax["flagged"]) == [False, False, True, False]


def test_script_mix_signals(ray_session):
    """Script-mix spam signal: per-script letter counts, fraction
    threshold, mixed flag only when two scripts both clear 5%."""
    import ray.data

    from pdf_extractor_ray.ops.text_analysis import script_mix_signals

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "pure latin text here",
                "latin stuffed 中文内容很多 words",  # CJK mix
                "привет",  # pure cyrillic
                "a 一",  # 1 latin + 1 cjk: both 50% -> mixed
            ],
        }
    )
    out = (
        script_mix_signals(
            ray.data.from_pandas(docs).repartition(2), keep_cols=["doc_id"]
        )
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.loc[1, "n_scripts"] == 1 and not out.loc[1, "mixed"]
    assert out.loc[2, "n_cjk"] == 6 and out.loc[2, "mixed"]
    assert out.loc[3, "n_cyrillic"] == 6 and not out.loc[3, "mixed"]
    assert out.loc[4, "mixed"] and out.loc[4, "n_letters"] == 2


def test_cdc_shared_bytes(ray_session):
    """Content-defined chunking: an inserted preamble SHIFTS every
    byte but leaves CDC chunks aligned, so the copied body is detected
    as shared bytes (> 60% here) while an unrelated doc reports zero;
    chunk spans tile the document exactly; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import _cdc_cut_chunks, cdc_shared_bytes

    body = " ".join(f"word{i} content token" for i in range(120))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                body,
                "A COMPLETELY NEW INSERTED PREAMBLE SENTENCE. " + body,
                " ".join(f"other{i} unrelated stuff" for i in range(120)),
            ],
        }
    )

    def run(parts):
        return (
            cdc_shared_bytes(ray.data.from_pandas(docs).repartition(parts))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    out = run(2)
    pd.testing.assert_frame_equal(out, run(3))
    o = out.set_index("doc_id")
    assert o.loc[1, "shared_fraction"] > 0.6
    assert o.loc[2, "shared_fraction"] > 0.6
    assert o.loc[3, "shared_bytes"] == 0
    assert o.loc[1, "shared_bytes"] == o.loc[2, "shared_bytes"]  # the common body

    # span tiling + clamps: spans cover [0, n) contiguously, sizes
    # within [min, max] except a possibly-longer folded tail
    data = body.encode()
    spans = _cdc_cut_chunks(data, 16, 63, 32, 512)
    assert spans[0][0] == 0 and spans[-1][1] == len(data)
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 == s1
    assert all(e - s >= 32 for s, e in spans)
    assert all(e - s <= 512 + 32 for s, e in spans)
    # empty + tiny docs
    assert _cdc_cut_chunks(b"", 16, 63, 32, 512) == []
    assert _cdc_cut_chunks(b"abc", 16, 63, 32, 512) == [(0, 3)]


def test_mojibake_signals(ray_session):
    """ftfy-class encoding-damage probes: genuine utf8->latin1
    round-trip artifacts count per class, clean text (including real
    accents and real curly quotes) never flags, per-kchar threshold
    flags dense damage only."""
    import ray.data

    from pdf_extractor_ray.ops.text_analysis import mojibake_signals

    # browsers mis-decode UTF-8 as cp1252 (NOT latin-1: continuation
    # bytes must surface as the €™œ glyphs the probes target); ” is
    # excluded — its 0x9D byte has no cp1252 mapping
    damaged = "café résumé don’t “quote – dash—".encode("utf-8").decode("cp1252")
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                damaged,  # dense artifacts, short -> flags
                "clean café text with a real ’ curly quote " + "pad " * 300,
                "plain ascii only here",
            ],
        }
    )
    out = (
        mojibake_signals(
            ray.data.from_pandas(docs).repartition(2), keep_cols=["doc_id"]
        )
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    # 'café résumé' -> 3 Ã© artifacts; ’ “ – — -> 4 punct artifacts
    assert out.loc[1, "n_accents"] == 3
    assert out.loc[1, "n_punct"] == 4
    assert bool(out.loc[1, "damaged"])
    assert out.loc[2, "n_artifacts"] == 0 and not bool(out.loc[2, "damaged"])
    assert out.loc[3, "n_artifacts"] == 0


def test_export_curriculum_shards(ray_session):
    """Curriculum export: shard s holds exactly the contiguous global
    rank range [s*N/n, (s+1)*N/n) in rank order (here: quality
    descending), spans are contiguous across shards, read-back of
    shard 0 yields the top-quality rows, and resume is a no-op."""
    import os
    import tempfile

    import pyarrow.parquet as _pq
    import ray.data

    from pdf_extractor_ray.pipelines.export import export_curriculum_shards

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "doc_id": range(40),
            "quality": rng.permutation(40).astype("float64"),
        }
    )
    d = tempfile.mkdtemp(prefix="curr_")
    m = export_curriculum_shards(
        ray.data.from_pandas(df).repartition(3),
        d,
        keys=["quality", "doc_id"],
        ascending=[False, True],
        n_shards=4,
    )
    assert list(m["shard"]) == [0, 1, 2, 3] and list(m["n_rows"]) == [10] * 4
    expected = df.sort_values("quality", ascending=False).reset_index(drop=True)
    got0 = _pq.read_table(os.path.join(d, "shard=00000", "part-0.parquet")).to_pandas()
    assert list(got0["doc_id"]) == list(expected["doc_id"].head(10))
    assert list(got0["quality"]) == sorted(got0["quality"], reverse=True)
    # spans contiguous: shard s covers ranks [10s+1, 10s+10]
    import json as _json

    for s in range(4):
        meta = _json.load(open(os.path.join(d, f"shard={s:05d}", "_SUCCESS")))
        assert (meta["rank_lo"], meta["rank_hi"]) == (10 * s + 1, 10 * s + 10)
    assert len(
        export_curriculum_shards(
            ray.data.from_pandas(df), d, keys=["quality", "doc_id"],
            ascending=[False, True], n_shards=4,
        )
    ) == 0


def test_gate_overlap_matrix(ray_session):
    """Filter-ablation overlap: exact pairwise drop intersections on a
    handcrafted frame — diagonal = individual counts, off-diagonal =
    intersections, _any = union; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.quality import gate_overlap

    df = pd.DataFrame(
        {
            "doc_id": range(10),
            "n_chars": [10, 10, 10, 500, 500, 500, 500, 500, 10, 500],
            "lang": ["en", "fr", "en", "fr", "en", "fr", "en", "en", "fr", "en"],
        }
    )
    gates = {
        "short": lambda b: (b["n_chars"] < 100).to_numpy(),
        "nonen": lambda b: (b["lang"] != "en").to_numpy(),
    }
    for parts in (1, 3):
        out = gate_overlap(
            ray.data.from_pandas(df).repartition(parts), gates
        ).set_index(["gate_a", "gate_b"])
        assert out.loc[("short", "short"), "n_dropped"] == 4
        assert out.loc[("nonen", "nonen"), "n_dropped"] == 4
        assert out.loc[("nonen", "short"), "n_dropped"] == 2  # docs 1, 8
        assert out.loc[("_any", "_any"), "n_dropped"] == 6


def test_packing_efficiency(ray_session):
    """Context-length planning: exact integer padding/truncation
    arithmetic on a handcrafted token distribution, partition-
    invariant."""
    import ray.data

    from pdf_extractor_ray.ops.tokenize import packing_efficiency

    # docs with 3, 5, 8 tokens
    df = pd.DataFrame(
        {"text": ["a b c", "a b c d e", "a b c d e f g h"]}
    )
    for parts in (1, 2):
        out = packing_efficiency(
            ray.data.from_pandas(df).repartition(parts), seq_lens=(4, 8)
        ).set_index("seq_len")
        # L=4: padded slots = 4 + 8 + 8 = 20; tokens = 16
        assert out.loc[4, "padded_slots"] == 20
        assert abs(out.loc[4, "pad_waste"] - (1 - 16 / 20)) < 1e-15
        # L=4 truncation: kept = 3 + 4 + 4 = 11
        assert abs(out.loc[4, "truncate_loss"] - (1 - 11 / 16)) < 1e-15
        # L=8: padded = 8*3 = 24; truncation keeps everything
        assert out.loc[8, "padded_slots"] == 24
        assert out.loc[8, "truncate_loss"] == 0.0
        assert out.loc[8, "n_tokens"] == 16 and out.loc[8, "n_docs"] == 3


def test_dup_pair_explain(ray_session):
    """Dup-pair audit spans: a full mirror reports ~1.0 coverage in
    ONE span; a two-fragment template collision reports exactly two
    spans with the planted coverage; disjoint texts report zero."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import dup_pair_explain

    body = [f"w{i}" for i in range(40)]
    frag1, frag2 = body[:10], body[20:30]
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                " ".join(body),
                "intro " + " ".join(body) + " outro",  # mirror + padding
                " ".join(frag1 + [f"x{i}" for i in range(15)] + frag2),  # 2 fragments
                " ".join(f"z{i}" for i in range(40)),  # disjoint
            ],
        }
    )
    pairs = pd.DataFrame({"id_a": [1, 1, 1], "id_b": [2, 3, 4]})
    out = dup_pair_explain(
        ray.data.from_pandas(docs).repartition(2), pairs, n=5
    ).set_index("id_b")
    assert out.loc[2, "cov_frac_a"] == 1.0 and out.loc[2, "n_spans_a"] == 1
    assert out.loc[2, "cov_frac_b"] > 0.9
    # doc 3 shares exactly the two 10-token fragments: 6 grams each,
    # covering 10 tokens each side per fragment -> 20/40 on side a
    assert out.loc[3, "n_spans_a"] == 2 and out.loc[3, "n_spans_b"] == 2
    assert abs(out.loc[3, "cov_frac_a"] - 0.5) < 1e-12
    assert out.loc[4, "n_shared_grams"] == 0 and out.loc[4, "cov_frac_a"] == 0.0
    # bounded-audit contract
    try:
        dup_pair_explain(
            ray.data.from_pandas(docs), pairs, max_pairs=2
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_hll_incremental_registers(ray_session):
    """Sketch persistence: hll_registers(A) + hll_registers(B) merged
    through hll_estimate_registers reproduces hll_distinct(A ∪ B)
    BITWISE (register max is associative/idempotent), including with
    overlapping halves; single-table estimate also equals the
    one-shot op."""
    import ray.data

    from pdf_extractor_ray.ops.sketch import (
        hll_distinct,
        hll_estimate_registers,
        hll_registers,
    )

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 4, size=3000).astype(str),
            "v": rng.integers(0, 800, size=3000),
        }
    )
    full = ray.data.from_pandas(df).repartition(3)
    one_shot = hll_distinct(full, "g", "v", p=10)

    a = ray.data.from_pandas(df.iloc[:1700]).repartition(2)   # overlapping halves
    b = ray.data.from_pandas(df.iloc[1300:]).repartition(2)
    ra = hll_registers(a, "g", "v", p=10)
    rb = hll_registers(b, "g", "v", p=10)
    merged = hll_estimate_registers(pd.concat([ra, rb]), "g", p=10)
    pd.testing.assert_frame_equal(
        one_shot.reset_index(drop=True), merged.reset_index(drop=True)
    )
    # single snapshot: registers -> estimate == one-shot on that snapshot
    single = hll_estimate_registers(hll_registers(full, "g", "v", p=10), "g", p=10)
    pd.testing.assert_frame_equal(one_shot.reset_index(drop=True), single)
    # idempotence: merging a snapshot with itself changes nothing
    twice = hll_estimate_registers(pd.concat([ra, ra]), "g", p=10)
    once = hll_estimate_registers(ra, "g", p=10)
    pd.testing.assert_frame_equal(twice, once)


def test_minhash_index_delta_dedup(ray_session):
    """Persisted signature index: recrawled (lightly edited) docs drop
    against the stored index WITHOUT re-reading the old corpus text;
    fresh docs survive; the sig-estimated decision agrees with the
    text-verified near_dedup_against on clear-margin families; a
    partial index refuses to load."""
    import os
    import tempfile

    import ray.data

    from pdf_extractor_ray.ops.dedup import near_dedup_against, near_dedup_against_sigs
    from pdf_extractor_ray.pipelines.export import (
        export_minhash_index,
        read_minhash_index,
    )

    old = pd.DataFrame(
        {
            "doc_id": range(20),
            "text": [" ".join(f"tok{i}_{j}" for j in range(60)) for i in range(20)],
        }
    )
    new_rows = [
        {"doc_id": 1000 + i, "text": old.loc[i, "text"] + " recrawl marker"}
        for i in range(5)
    ] + [
        {"doc_id": 2000 + i, "text": " ".join(f"fresh{i}_{j}" for j in range(60))}
        for i in range(5)
    ]
    new = pd.DataFrame(new_rows)

    d = tempfile.mkdtemp(prefix="mhidx_")
    export_minhash_index(ray.data.from_pandas(old).repartition(2), d, n_shards=4)
    idx = read_minhash_index(d)
    kept = near_dedup_against_sigs(
        ray.data.from_pandas(new).repartition(2), idx, threshold=0.7
    ).to_pandas()
    assert sorted(kept["doc_id"]) == [2000, 2001, 2002, 2003, 2004]

    # agreement with the text-verified op on the same clear-margin data
    kept_exact = near_dedup_against(
        ray.data.from_pandas(new).repartition(2),
        ray.data.from_pandas(old).repartition(2),
        threshold=0.7,
    ).to_pandas()
    assert sorted(kept_exact["doc_id"]) == sorted(kept["doc_id"])

    os.remove(os.path.join(d, "shard=00001", "_SUCCESS"))
    try:
        read_minhash_index(d)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass


def test_schema_contract_check(ray_session):
    """Data-contract gate: exact null/range/duplicate violation counts
    on a handcrafted frame, pass/fail verdicts per check,
    partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.relational import schema_contract_check

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 3, 4, 5, 5, 5],  # dup 3 (x2), 5 (x3) -> 3 extra rows
            "score": [0.5, -1.0, 2.0, 0.1, None, 0.9, 1.5, 0.2],  # 1 null, 1 <0, 2 >1
        }
    )
    contract = {
        "id": {"unique": True},
        "score": {"max_nulls": 1, "min": 0.0, "max": 1.0},
    }
    for parts in (1, 3):
        out = schema_contract_check(
            ray.data.from_pandas(df).repartition(parts), contract
        ).set_index(["column", "check"])
        assert out.loc[("id", "unique"), "n_violations"] == 3
        assert not bool(out.loc[("id", "unique"), "passed"])
        assert out.loc[("score", "max_nulls"), "n_violations"] == 1
        assert bool(out.loc[("score", "max_nulls"), "passed"])  # limit 1
        assert out.loc[("score", "min"), "n_violations"] == 1
        assert out.loc[("score", "max"), "n_violations"] == 2


def test_psi_drift(ray_session):
    """PSI drift monitor: identical snapshots score ~0 (eps floor
    only), a shifted distribution scores the closed-form PSI over the
    fixed uniform bins, out-of-range values land in the end bins,
    partition-invariant."""
    import math

    import ray.data

    from pdf_extractor_ray.ops.relational import psi_drift

    a = pd.DataFrame({"x": [0.1] * 60 + [0.9] * 40})
    b_same = pd.DataFrame({"x": [0.1] * 30 + [0.9] * 20})  # same proportions
    b_shift = pd.DataFrame({"x": [0.1] * 20 + [0.9] * 80})  # 0.2/0.8 vs 0.6/0.4
    spec = {"x": (0.0, 1.0, 2)}
    for parts in (1, 3):
        da = ray.data.from_pandas(a).repartition(parts)
        same = psi_drift(da, ray.data.from_pandas(b_same), spec)
        assert abs(same.loc[0, "psi"]) < 1e-12
        drift = psi_drift(da, ray.data.from_pandas(b_shift), spec)
        expect = (0.6 - 0.2) * math.log(0.6 / 0.2) + (0.4 - 0.8) * math.log(0.4 / 0.8)
        assert abs(drift.loc[0, "psi"] - expect) < 1e-12
        assert drift.loc[0, "n_a"] == 100 and drift.loc[0, "n_b"] == 100
    # out-of-range absorption: values below lo / above hi hit end bins
    oob = psi_drift(
        ray.data.from_pandas(pd.DataFrame({"x": [-5.0, 9.0]})),
        ray.data.from_pandas(pd.DataFrame({"x": [0.2, 0.7]})),
        spec,
    )
    assert oob.loc[0, "n_a"] == 2


def test_shrunk_group_mean(ray_session):
    """Empirical-Bayes host prior: a 2-doc group's shrunk mean sits
    near the corpus mean, a heavy group's near its raw mean; exact
    formula reproduced; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.quality import shrunk_group_mean

    df = pd.DataFrame(
        {
            "doc_id": range(102),
            "source": ["tiny"] * 2 + ["big"] * 100,
            "n_chars": [10_000, 10_000] + [100] * 100,
        }
    )
    for parts in (1, 4):
        out = shrunk_group_mean(
            ray.data.from_pandas(df).repartition(parts), "source", "n_chars", k=20
        )
        assert list(out["source"]) == ["big", "tiny"]
        gm = (20_000 + 100 * 100) / 102
        exp_tiny = np.floor((20_000 + 20 * gm) / 22 * 1e6 + 0.5) / 1e6
        exp_big = np.floor((10_000 + 20 * gm) / 120 * 1e6 + 0.5) / 1e6
        assert out.loc[1, "shrunk_mean"] == exp_tiny
        assert out.loc[0, "shrunk_mean"] == exp_big
        # the shrunk tiny-group mean is pulled far off its raw 10k mean
        assert out.loc[1, "shrunk_mean"] < 10_000 / 2
        assert out.loc[0, "n_docs"] == 100 and out.loc[0, "sum_n_chars"] == 10_000


def test_shard_binpack(ray_session):
    """Serpentine shard plan: matches the pandas row_number reference
    exactly, conserves mass, and balances a skewed corpus to within
    one max item per shard; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.rank import shard_binpack

    rng = np.random.RandomState(7)
    w = np.concatenate([rng.randint(1, 50, 200), rng.randint(5_000, 9_000, 8)])
    df = pd.DataFrame({"doc_id": np.arange(len(w)), "n_chars": w.astype("int64")})
    S = 4
    ref = df.sort_values(["n_chars", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    r0 = ref.index.to_numpy() % (2 * S)
    ref["shard"] = np.where(r0 < S, r0, 2 * S - 1 - r0)
    exp = (
        ref.groupby("shard")["n_chars"]
        .agg(sum_n_chars="sum", n="count")
        .reset_index()
        .astype("int64")
    )
    for parts in (1, 5):
        out = (
            shard_binpack(ray.data.from_pandas(df).repartition(parts), "n_chars", "doc_id", S)
            .to_pandas()
            .sort_values("shard")
            .reset_index(drop=True)
            .astype("int64")
        )
        pd.testing.assert_frame_equal(out[["shard", "sum_n_chars", "n"]], exp)
    assert out["sum_n_chars"].sum() == int(w.sum())
    assert out["sum_n_chars"].max() - out["sum_n_chars"].min() <= int(w.max())


def test_dup_debias_sample(ray_session):
    """Count-debiased sampling: singletons ALL survive; a duplicated
    cluster keeps exactly the members the integer acceptance predicts;
    partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.scrub import md5_u52
    from pdf_extractor_ray.ops.selection import dup_debias_sample

    n_dup, n_uniq = 40, 30
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n_dup + n_uniq, dtype="int64"),
            "text": ["same mirrored page"] * n_dup
            + [f"unique doc {i}" for i in range(n_uniq)],
        }
    )
    u = md5_u52([str(i) for i in range(n_dup)]).astype("int64")
    exp_dup = set(np.arange(n_dup)[u < (2**52 // n_dup)])
    expected = sorted(exp_dup | set(range(n_dup, n_dup + n_uniq)))
    for parts in (1, 4):
        out = dup_debias_sample(ray.data.from_pandas(df).repartition(parts)).to_pandas()
        assert sorted(out["doc_id"].astype(int)) == expected
    # the cluster collapsed towards E[kept]=1, never grew
    assert 0 <= len(exp_dup) <= 5


def test_robots_gate(ray_session):
    """Meta-robots gate: noindex/none/googlebot directives drop the
    page (any casing), the token decoy and body-only directives keep
    it, non-HTML payloads pass through untouched."""
    import ray.data

    from pdf_extractor_ray.ops.structured import robots_gate

    pages = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(7)],
            "html": [
                b'<html><head><meta name="robots" content="noindex, follow"></head><body>x</body></html>',
                b'<html><head><meta name="robots" content="none"></head><body>x</body></html>',
                b'<html><head><meta name="googlebot" content="NOINDEX"></head><body>x</body></html>',
                b'<html><head><meta name="robots" content="noindexing-ok"></head><body>x</body></html>',
                b'<html><head><meta name="robots" content="index, follow"></head><body>x</body></html>',
                b'<html><head><title>t</title></head><body><meta name="robots" content="noindex">body directive ignored</body></html>',
                b"%PDF-1.4 not html at all",
            ],
        }
    )
    out = robots_gate(ray.data.from_pandas(pages)).to_pandas()
    assert sorted(out["url"]) == ["u3", "u4", "u5", "u6"]


def test_dup_rate_by_group(ray_session):
    """Duplication audit: cross-group twins count for BOTH groups,
    singletons don't, fractions quantized; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.dedup import dup_rate_by_group

    df = pd.DataFrame(
        {
            "doc_id": range(8),
            "source": ["a", "a", "a", "b", "b", "b", "b", "c"],
            "text": ["same", "same", "solo-a", "same", "solo-b1", "solo-b2", "pair", "pair"],
        }
    )
    for parts in (1, 3):
        out = dup_rate_by_group(ray.data.from_pandas(df).repartition(parts))
        assert list(out["source"]) == ["a", "b", "c"]
        assert list(out["n_docs"]) == [3, 4, 1]
        # 'same' spans a+b (sizes 2+1 -> all 3 are dups); 'pair' spans b+c
        assert list(out["n_dup"]) == [2, 2, 1]
        assert out.loc[0, "dup_frac"] == np.floor(2 * 1e6 / 3 + 0.5) / 1e6
        assert out.loc[2, "dup_frac"] == 1.0


def test_decile_profile(ray_session):
    """Exact-rank decile calibration: equal-count bins from the global
    rank formula, exact integer signal mass per bin, quantized means;
    partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.rank import decile_profile

    n = 100
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "n_chars": np.arange(n, dtype="int64") * 3,     # already length-ordered
            "n_ws_tokens": np.arange(n, dtype="int64") + 1,  # density grows with length
        }
    )
    for parts in (1, 4):
        out = decile_profile(ray.data.from_pandas(df).repartition(parts))
        assert list(out["decile"]) == list(range(10))
        assert (out["n_docs"] == 10).all()
        # decile d holds tokens d*10+1 .. d*10+10
        exp = [sum(range(d * 10 + 1, d * 10 + 11)) for d in range(10)]
        assert list(out["sum_n_ws_tokens"]) == exp
        assert out.loc[9, "mean_n_ws_tokens"] == 95.5


def test_epoch_plan(ray_session):
    """Data-constrained epoch allocation: integer budget split by
    weight, epochs = share/unique, effective tokens saturate with the
    Muennighoff decay (never exceed U*(1+R*)); single-epoch sources
    get effective = share exactly; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.selection import epoch_plan

    df = pd.DataFrame(
        {
            "source": ["a"] * 4 + ["b"] * 4,
            "n_ws_tokens": [100, 100, 100, 100, 1000, 1000, 1000, 1000],
        }
    )
    for parts in (1, 3):
        out = epoch_plan(
            ray.data.from_pandas(df).repartition(parts),
            budget_tokens=6000,
            weights={"a": 2, "b": 1},
            group_col="source",
        )
        assert list(out["source"]) == ["a", "b"]
        assert list(out["unique_tokens"]) == [400, 4000]
        assert list(out["share_tokens"]) == [4000, 2000]  # 6000 * {2,1} // 3
        assert out.loc[0, "epochs"] == 10.0
        assert out.loc[1, "epochs"] == 0.5
        # b trains on half its data once: effective = share exactly
        assert out.loc[1, "effective_tokens"] == 2000.0
        # a repeats 10x: effective strictly between U and U*(1+R*)
        eff = out.loc[0, "effective_tokens"]
        exp = 400 + 400 * 15.4 * (1 - np.exp(-9 / 15.4))
        assert abs(eff - np.floor(exp * 1e6 + 0.5) / 1e6) < 1e-9
        assert 400 < eff < 400 * (1 + 15.4)
        assert eff < 4000  # repetition is worth less than fresh data


def test_truncation_loss(ray_session):
    """Truncation audit: exact kept/lost token masses per group under
    the cap, overflow counts, quantized fractions; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.chunking import truncation_loss

    df = pd.DataFrame(
        {
            "lang": ["en", "en", "ja"],
            "text": ["w " * 10, "w " * 200, "w " * 150],
        }
    )
    for parts in (1, 2):
        out = truncation_loss(
            ray.data.from_pandas(df).repartition(parts), max_tokens=120, group_col="lang"
        )
        assert list(out["lang"]) == ["en", "ja"]
        assert list(out["n_docs"]) == [2, 1]
        assert list(out["n_overflow"]) == [1, 1]
        assert list(out["sum_n_tokens"]) == [210, 150]
        assert list(out["sum_kept_tokens"]) == [130, 120]
        assert out.loc[0, "lost_frac"] == np.floor(80 * 1e6 / 210 + 0.5) / 1e6
        assert out.loc[1, "lost_frac"] == 0.2


def test_kmv_overlap(ray_session):
    """KMV set overlap: below-k sides are EXACT (sketches are the
    sets), the estimator reproduces the closed-form answer from the
    union-sketch threshold, estimates track truth within the ~1/sqrt(k)
    band; partition-invariant."""
    import ray.data

    from pdf_extractor_ray.ops.sketch import kmv_overlap

    # small exact case: |A|=30, |B|=30, overlap 10 -> union sketch < k
    a = [f"u{i}" for i in range(30)]
    b = [f"u{i}" for i in range(20, 50)]
    df = pd.DataFrame(
        {"label": ["a"] * 30 + ["b"] * 30, "val": a + b}
    )
    for parts in (1, 3):
        out = kmv_overlap(
            ray.data.from_pandas(df).repartition(parts), "label", "val", "a", "b", k=64
        )
        assert out.loc[0, "n_union_sketch"] == 50
        assert out.loc[0, "union_est"] == 50.0
        assert out.loc[0, "n_common"] == 10
        assert out.loc[0, "jaccard_est"] == 0.2
        assert out.loc[0, "intersect_est"] == 10.0
    # estimator case: 400/400 with 200 shared -> union 600 > k
    a2 = [f"x{i}" for i in range(400)]
    b2 = [f"x{i}" for i in range(200, 600)]
    df2 = pd.DataFrame({"label": ["a"] * 400 + ["b"] * 400, "val": a2 + b2})
    out2 = kmv_overlap(ray.data.from_pandas(df2).repartition(4), "label", "val", "a", "b", k=64)
    assert out2.loc[0, "n_union_sketch"] == 64
    assert 300 < out2.loc[0, "union_est"] < 1100  # truth 600, ~13% band + slack
    assert 50 < out2.loc[0, "intersect_est"] < 450  # truth 200


def test_shuffle_skew_audit_string_keys(ray_session):
    """The skew audit must accept STRING shuffle keys (sources, terms
    — the common case per its own docstring), preserving the key dtype
    in top_key and counting exactly."""
    import ray.data

    from pdf_extractor_ray.ops.relational import shuffle_skew_audit

    df = pd.DataFrame({"source": ["srcA"] * 30 + ["srcB"] * 3 + ["srcC"] * 3})
    out = shuffle_skew_audit(ray.data.from_pandas(df).repartition(3), "source", num_partitions=4)
    assert int(out["n_rows"].sum()) == 36
    assert int(out["n_keys"].sum()) == 3
    hot = out.loc[out["top_key_rows"].idxmax()]
    assert hot["top_key"] == "srcA" and hot["top_key_rows"] == 30


def test_epoch_plan_zero_token_source(ray_session):
    """A source whose docs are all empty must plan epochs = 0 and
    effective = 0 (never inf), while healthy sources are unaffected."""
    import ray.data

    from pdf_extractor_ray.ops.selection import epoch_plan

    df = pd.DataFrame(
        {"source": ["dead"] * 3 + ["ok"] * 3, "n_ws_tokens": [0, 0, 0, 100, 100, 100]}
    )
    out = epoch_plan(
        ray.data.from_pandas(df), budget_tokens=600, weights={"dead": 1, "ok": 1}
    )
    dead = out[out["source"] == "dead"].iloc[0]
    assert dead["unique_tokens"] == 0 and dead["share_tokens"] == 300
    assert dead["epochs"] == 0.0 and dead["effective_tokens"] == 0.0
    assert np.isfinite(out["epochs"]).all() and np.isfinite(out["effective_tokens"]).all()
    ok = out[out["source"] == "ok"].iloc[0]
    assert ok["epochs"] == 1.0 and ok["effective_tokens"] == 300.0


def test_knn_graph(ray_session):
    """k-NN graph: exact tier matches a numpy brute-force reference
    (self excluded, ties by nbr_id); full-probe bucketed tier equals
    the exact tier bitwise (the hard_negatives equivalence, inherited)."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import knn_graph

    rng = np.random.RandomState(11)
    n, d, k = 60, 8, 3
    m = rng.randn(n, d).astype(np.float64)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"), "embedding": list(m)})
    out = knn_graph(ray.data.from_pandas(df).repartition(3), k=k)
    # numpy reference
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = mn @ mn.T
    np.fill_diagonal(s, -np.inf)
    order = np.lexsort((np.broadcast_to(np.arange(n), s.shape), -s), axis=1)[:, :k]
    ref = {(i, int(order[i, r])): r + 1 for i in range(n) for r in range(k)}
    got = {(int(a), int(b)): int(r) for a, b, r in zip(out["vec_id"], out["nbr_id"], out["rank"])}
    assert got == ref
    # bucketed tier with full probes reproduces the exact tier
    full = knn_graph(
        ray.data.from_pandas(df).repartition(3),
        k=k, tier="bucketed", n_centroids=4, n_probe=4,
    )
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True)[["vec_id", "nbr_id", "rank"]],
        out.reset_index(drop=True)[["vec_id", "nbr_id", "rank"]],
    )
