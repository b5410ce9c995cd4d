"""k-center diversity sampling and MMR re-ranking."""

import numpy as np
import pandas as pd
import pytest

from pdf_extractor_ray.ops.diversity import _greedy_kcenter, kcenter_sample, mmr_rerank
from pdf_extractor_ray.ops.similarity import _normalize_rows, brute_force_topk


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    n, d = 300, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat)})
    return ray.data.from_pandas(df).repartition(6), ids, mat.astype(np.float64)


def _radius(nm: np.ndarray, ids: np.ndarray, sel_ids: np.ndarray) -> float:
    smat = nm[np.isin(ids, sel_ids)]
    return float((1 - (nm @ smat.T).max(axis=1)).max())


def test_exact_tier_matches_inmemory_gonzalez(emb_ds):
    ds, ids, mat = emb_ds
    got = kcenter_sample(ds, k=8, tier="exact")
    nm = _normalize_rows(mat)
    ref_sel, ref_dist = _greedy_kcenter(ids, nm, 8, int(np.argmin(ids)))
    assert got["vec_id"].tolist() == ref_sel.tolist()
    assert np.allclose(got["dist"].to_numpy(), ref_dist, atol=1e-9)
    # selection distances are non-increasing after the seed (greedy
    # picks the farthest remaining point each round)
    d = got["dist"].to_numpy()
    assert (np.diff(d[1:]) <= 1e-12).all()


def test_exact_tier_partition_invariant(emb_ds, ray_session):
    import ray.data

    ds, ids, mat = emb_ds
    a = kcenter_sample(ds, k=6, tier="exact")
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat.astype(np.float32))})
    b = kcenter_sample(ray.data.from_pandas(df).repartition(13), k=6, tier="exact")
    assert a["vec_id"].tolist() == b["vec_id"].tolist()


def test_coreset_tier_within_approximation_bound(emb_ds):
    ds, ids, mat = emb_ds
    nm = _normalize_rows(mat)
    exact = kcenter_sample(ds, k=8, tier="exact")
    core = kcenter_sample(ds, k=8, tier="coreset", num_partitions=4)
    assert len(core) == 8 and core["vec_id"].is_unique
    # composable-coreset guarantee: <= 2 (coreset) x 2 (greedy) x OPT,
    # and exact-greedy radius >= OPT, so core_radius <= 4 x exact_radius
    r_exact = _radius(nm, ids, exact["vec_id"].to_numpy())
    r_core = _radius(nm, ids, core["vec_id"].to_numpy())
    assert r_core <= 4 * r_exact + 1e-9


def test_kcenter_k_greater_than_n(ray_session):
    import ray.data

    df = pd.DataFrame(
        {"vec_id": [1, 2, 3], "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]}
    )
    out = kcenter_sample(ray.data.from_pandas(df), k=10, tier="exact")
    assert sorted(out["vec_id"].tolist()) == [1, 2, 3]


def test_mmr_lambda_one_is_plain_topk(emb_ds):
    ds, _, _ = emb_ds
    q = np.arange(16, dtype=np.float64)
    mm = mmr_rerank(ds, q, k=5, lam=1.0, pool=25)
    bf = brute_force_topk(ds, q, k=5)
    assert mm["vec_id"].tolist() == bf["vec_id"].tolist()
    assert np.allclose(mm["cos"].to_numpy(), bf["cos"].to_numpy())


def test_mmr_matches_inmemory_reference(emb_ds):
    ds, ids, mat = emb_ds
    q = np.arange(16, dtype=np.float64)
    lam, k, pool = 0.5, 6, 30
    got = mmr_rerank(ds, q, k=k, lam=lam, pool=pool)

    nm = _normalize_rows(mat)
    qs = nm @ (q / np.linalg.norm(q))
    order = np.lexsort((ids, -qs))[:pool]
    p_ids, p_sims, p_mat = ids[order], qs[order], nm[order]
    sel: list[int] = []
    max_red = np.zeros(pool)
    active = np.ones(pool, dtype=bool)
    for r in range(k):
        score = lam * p_sims - (0.0 if r == 0 else (1 - lam)) * max_red
        score = np.where(active, score, -np.inf)
        cand = np.flatnonzero(score >= score.max() - 1e-12)
        cur = cand[np.argmin(p_ids[cand])]
        sel.append(int(p_ids[cur]))
        active[cur] = False
        max_red = np.maximum(max_red, p_mat @ p_mat[cur])
    assert got["vec_id"].tolist() == sel
    # re-ranking diversifies: the MMR set differs from plain top-k here
    bf = brute_force_topk(ds, q, k=k)
    assert got["vec_id"].tolist() != bf["vec_id"].tolist()


# --- product quantization (ops/similarity.py) --------------------------------


def test_pq_exact_on_reconstructable_corpus(ray_session):
    """When corpus vectors ARE normalized codebook reconstructions,
    ADC scoring is exact: pq_topk == brute_force_topk."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import (
        brute_force_topk,
        pq_encode,
        pq_fit,
        pq_topk,
    )

    rng = np.random.default_rng(3)
    seed = pd.DataFrame(
        {
            "vec_id": np.arange(400, dtype=np.int64),
            "embedding": list(rng.normal(size=(400, 32)).astype(np.float32)),
        }
    )
    seed_ds = ray.data.from_pandas(seed)
    books = pq_fit(seed_ds, m=4, n_codes=8)
    cds = rng.integers(0, 8, size=(200, 4))
    recon = []
    for i in range(200):
        v = np.concatenate([books[j, cds[i, j]] for j in range(4)])
        recon.append((v / np.linalg.norm(v)).astype(np.float32))
    df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64), "embedding": recon})
    ds = ray.data.from_pandas(df).repartition(3)
    # encode with the generating codebooks: each normalized subvector
    # is a scaled codebook entry, so argmin recovers the true code
    codes = pq_encode(ds, books)
    q = rng.normal(size=32)
    got = pq_topk(codes, books, q, k=10)
    bf = brute_force_topk(ds, q, k=10)
    assert set(got["vec_id"]) == set(bf["vec_id"])


def test_pq_recall_floor_on_fixture(ray_session, sf_dir="/root/testdata/sf0.001"):
    """Near-uniform synthetic embeddings are PQ's worst case (the
    documented IVF-style boundary); still pin a measured floor."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import (
        brute_force_topk,
        pq_encode,
        pq_fit,
        pq_topk,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    books = pq_fit(ds, m=16, n_codes=64)
    assert books.shape == (16, 64, 4)
    codes_df = pq_encode(ds, books).to_pandas()
    assert len(codes_df) == ds.count()
    q = np.arange(64, dtype=np.float64)
    got = pq_topk(pq_encode(ds, books), books, q, k=10)
    bf = brute_force_topk(ds, q, k=10)
    assert len(set(got["vec_id"]) & set(bf["vec_id"])) >= 4
    # determinism: refit + rescore is identical
    books2 = pq_fit(ds, m=16, n_codes=64)
    assert np.array_equal(books, books2)
    got2 = pq_topk(pq_encode(ds, books2), books2, q, k=10)
    assert got["vec_id"].tolist() == got2["vec_id"].tolist()


def test_ivfpq_full_probe_equals_pq(ray_session):
    """With n_probe == n_centroids no bucket is pruned, so IVF-PQ must
    equal plain PQ bitwise; with fewer probes it returns a (possibly
    weaker) subset-scored top-k of the same length."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import ivfpq_topk, pq_encode, pq_fit, pq_topk

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    q = np.arange(64, dtype=np.float64)
    books = pq_fit(ds, m=16, n_codes=64)
    pq = pq_topk(pq_encode(ds, books), books, q, k=10)
    full = ivfpq_topk(ds, q, k=10, n_centroids=8, n_probe=8, m=16, n_codes=64)
    assert full["vec_id"].tolist() == pq["vec_id"].tolist()
    assert np.array_equal(full["cos_pq"].to_numpy(), pq["cos_pq"].to_numpy())
    pruned = ivfpq_topk(ds, q, k=10, n_centroids=8, n_probe=3, m=16, n_codes=64)
    assert len(pruned) == 10
    # pruned candidates score identically where they overlap
    merged = pruned.merge(full, on="vec_id", suffixes=("_p", "_f"))
    assert np.allclose(merged["cos_pq_p"], merged["cos_pq_f"])


def test_simplified_silhouette(ray_session):
    """Well-separated clusters score near 1; a reference numpy
    computation matches exactly; the overall row is the n-weighted
    mean."""
    import ray.data

    from pdf_extractor_ray.ops.cluster import simplified_silhouette
    from pdf_extractor_ray.ops.similarity import _normalize_rows

    rng = np.random.default_rng(11)
    # three tight clusters around orthogonal axes
    centers = np.eye(3, 12) * 10
    pts = np.vstack([c + rng.normal(scale=0.05, size=(50, 12)) for c in centers])
    df = pd.DataFrame(
        {
            "vec_id": np.arange(150, dtype=np.int64),
            "embedding": list(pts.astype(np.float32)),
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out = simplified_silhouette(ds, centers)
    per = out[out["cluster"] >= 0].set_index("cluster")
    assert (per["n"] == 50).all()
    assert (per["mean_s"] > 0.9).all()
    overall = out[out["cluster"] == -1].iloc[0]
    assert overall["n"] == 150
    assert abs(overall["mean_s"] - (per["mean_s"] * per["n"]).sum() / 150) < 1e-12

    # exact reference
    c = _normalize_rows(centers.astype(np.float64))
    m = _normalize_rows(pts.astype(np.float64))
    d = 1.0 - m @ c.T
    own = d.argmin(axis=1)
    a = d[np.arange(len(d)), own]
    d[np.arange(len(d)), own] = np.inf
    b = d.min(axis=1)
    s = (b - a) / np.maximum(a, b)
    for k in range(3):
        assert abs(per.loc[k, "mean_s"] - s[own == k].mean()) < 1e-9


def test_pq_fit_truncates_small_samples(ray_session):
    """A training sample smaller than n_codes must TRUNCATE the
    codebook — zero-padded phantom centroids would corrupt codes."""
    import ray.data

    from pdf_extractor_ray.ops.similarity import pq_encode, pq_fit

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(20, dtype=np.int64),
            "embedding": list(rng.normal(size=(20, 8)).astype(np.float32)),
        }
    )
    ds = ray.data.from_pandas(df)
    books = pq_fit(ds, m=2, n_codes=64)
    assert books.shape[1] <= 20  # truncated, no zero rows
    assert not np.all(books == 0, axis=2).any()
    codes = pq_encode(ds, books).to_pandas()
    flat = np.stack([np.asarray(c) for c in codes["codes"]])
    assert flat.max() < books.shape[1]
