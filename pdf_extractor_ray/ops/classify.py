"""Multinomial Naive Bayes text classifier over the documents table —
the classic linear text classifier that large-corpus pipelines run as
a quality / language / domain gate (GPT-3 and LLaMA data recipes use a
linear classifier over text features for quality filtering; the public
formulation here is Manning, Raghavan & Schütze 2008 ch. 13 with
Laplace smoothing).

Fit is a distributed (label, term) count aggregate (one row per
distinct (label, term), never one per token); the model is a bounded
broadcast table; prediction is a shuffle-free vectorized pass per
batch. Per document d and class c:

    score(d, c) = ln(n_docs_c) - ln(n_docs)
                + sum_t tf_t * (ln(count_{c,t} + alpha) - ln(T_c + alpha * V))

with T_c the class token total and V the feature-vocabulary size; a
term unseen in class c contributes the count_{c,t} = 0 default. The
prediction is the argmax over classes, ties broken to the
lexicographically smallest class name.

Scale tiers (tfidf_topk's data-movement decision applied to the model
table):

- exact-term tier (vocabulary <= broadcast_max_terms): per-term
  log-likelihood columns, V = distinct corpus terms; fully
  SQL-expressible (docs_nb_lang oracle in __ray_entry__).
- hashed-feature tier (the hashing trick, Weinberger et al. 2009,
  "Feature Hashing for Large Scale Multitask Learning"): term ->
  hash(term) mod n_buckets at BOTH fit and predict, so the model is at
  most n_classes x n_buckets rows no matter how large the corpus
  vocabulary grows, and V = the number of OCCUPIED buckets. Bucket
  counts derive from the exact (label, term) count table
  distributedly — no second corpus pass. With a collision-free bucket
  assignment this tier reproduces the exact tier's predictions, with
  scores equal up to float reassociation (the summands are the same
  set, ordered by bucket instead of term) — pinned in
  tests/test_ops.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from pdf_extractor_ray.ops.text_analysis import _ANALYZER_CACHE, _doc_term_tf


@dataclass
class NBModel:
    """Broadcastable fitted model: `table` holds one row per OBSERVED
    (feature) with one float64 log-likelihood column per class;
    features absent from the table take the per-class `default`
    (the count-zero smoothing term)."""

    classes: list[str]
    log_prior: np.ndarray  # (n_classes,) float64, class order = self.classes
    table: pd.DataFrame  # index: feature (str term | int64 bucket); cols: classes
    default: np.ndarray  # (n_classes,) float64
    n_buckets: int = 0  # 0 = exact-term tier
    meta: dict = field(default_factory=dict)  # vocab size, token totals (for tests)


def _bucketize(terms: pd.Series, n_buckets: int) -> np.ndarray:
    """Stable term -> bucket assignment (pandas' deterministic
    fixed-key hash — identical across workers and sessions)."""
    return (
        pd.util.hash_pandas_object(terms, index=False).to_numpy() % np.uint64(n_buckets)
    ).astype("int64")


def nb_fit(
    ds: ray.data.Dataset,
    label_col: str = "lang",
    text_col: str = "text",
    alpha: float = 1.0,
    broadcast_max_terms: int = 1_000_000,
    n_buckets: int = 1 << 20,
) -> NBModel:
    """Distributed fit: per-batch partial (label, term, n) counts ->
    grouped_sum shuffle (rows = distinct (label, term) per batch, never
    per token) -> bounded driver-side model build. Class priors come
    from a tiny per-label doc-count aggregate."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    def local_counts(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch.set_index(label_col)[text_col].str.split().explode().dropna()
        toks = toks[toks != ""]
        vc = toks.groupby([toks.index, toks.values]).size()
        out = vc.reset_index()
        out.columns = ["label", "term", "n"]
        out["n"] = out["n"].astype("int64")
        out["term"] = out["term"].astype(str)
        return out

    counts = grouped_sum(
        ds.map_batches(local_counts, batch_format="pandas"), ["label", "term"], ["n"],
        counts=False,
    ).materialize()  # reused for the tier decision + (maybe) re-bucketing

    def local_docs(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[label_col].value_counts()
        return pd.DataFrame({"label": vc.index.astype(str), "nd": vc.to_numpy().astype("int64")})

    prior_tbl = grouped_sum(
        ds.map_batches(local_docs, batch_format="pandas"), ["label"], ["nd"], counts=False
    ).to_pandas()  # n_classes rows
    classes = sorted(prior_tbl["label"].astype(str))
    nd = prior_tbl.set_index("label")["sum_nd"].astype("int64")
    n_docs = int(nd.sum())
    log_prior = np.array([math.log(int(nd[c])) - math.log(n_docs) for c in classes])

    vocab_n = grouped_sum(counts, ["term"], ["sum_n"], counts=False).count()
    if vocab_n <= broadcast_max_terms:
        tbl = counts.to_pandas()  # <= n_classes * broadcast_max_terms rows
        tbl["feature"] = tbl["term"].astype(str)
        v_size, buckets = int(vocab_n), 0
    else:
        # hashing trick: derive bucket counts FROM the term-count table
        def to_bucket(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "label": b["label"].astype(str),
                    "feature": _bucketize(b["term"].astype(str), n_buckets),
                    "n": b["sum_n"].astype("int64"),
                }
            )

        bucketed = grouped_sum(
            counts.map_batches(to_bucket, batch_format="pandas"),
            ["label", "feature"],
            ["n"],
            counts=False,
        ).materialize()
        v_size = int(grouped_sum(bucketed, ["feature"], ["sum_n"], counts=False).count())
        tbl = bucketed.to_pandas()  # <= n_classes * n_buckets rows
        buckets = n_buckets

    totals = tbl.groupby("label")["sum_n"].sum().astype("int64")
    ln_denom = {c: math.log(int(totals.get(c, 0)) + alpha * v_size) for c in classes}
    # ln(count + alpha) per observed (class, feature); math.log per cell
    # (not np.log) so both tiers and the SQL oracle agree to the ulp
    tbl["_ll"] = [
        math.log(int(n) + alpha) - ln_denom[c] for c, n in zip(tbl["label"], tbl["sum_n"])
    ]
    wide = tbl.pivot_table(index="feature", columns="label", values="_ll", aggfunc="first")
    default = np.array([math.log(alpha) - ln_denom[c] for c in classes])
    for i, c in enumerate(classes):
        if c not in wide.columns:
            wide[c] = np.nan
        wide[c] = wide[c].fillna(default[i])
    wide = wide[classes].astype("float64")
    return NBModel(
        classes=classes,
        log_prior=log_prior,
        table=wide,
        default=default,
        n_buckets=buckets,
        meta={"vocab": v_size, "n_docs": n_docs, "alpha": alpha},
    )


def nb_predict(
    ds: ray.data.Dataset,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list | None = None,
    with_confidence: bool = False,
) -> ray.data.Dataset:
    """Shuffle-free scoring: broadcast the model once (ray.put,
    resolved once per worker process), one vectorized
    explode/merge/groupby-sum pass per batch. Token-less documents
    still emit a row (prior-only argmax). Per-doc term contributions
    sum in (doc, feature) order, so each tier is bit-deterministic
    across batch layouts and partitionings. `with_confidence` adds the
    softmax posterior of the argmax class (conf =
    1 / sum_c exp(score_c - score_max), computed from the same score
    matrix — no extra pass)."""
    ref = ray.put(model)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        key = ("nb", ref.hex())
        m: NBModel = _ANALYZER_CACHE.get(key)
        if m is None:
            m = _ANALYZER_CACHE[key] = ray.get(ref)
        tf = _doc_term_tf(batch.rename(columns={id_col: "doc_id"}), text_col)
        if m.n_buckets:
            tf["feature"] = _bucketize(tf["term"], m.n_buckets)
        else:
            tf["feature"] = tf["term"]
        tf = tf.sort_values(["doc_id", "feature"], kind="stable")
        ll = m.table.reindex(tf["feature"])  # absent feature -> NaN row
        scores = pd.DataFrame(index=pd.Index(batch[id_col], name="doc_id"))
        w = tf["tf"].to_numpy().astype("float64")
        for i, c in enumerate(m.classes):
            contrib = w * np.nan_to_num(
                ll[c].to_numpy(), nan=m.default[i]
            )  # unseen feature -> smoothing default
            per_doc = pd.Series(contrib).groupby(tf["doc_id"].to_numpy()).sum()
            scores[c] = per_doc.reindex(scores.index).fillna(0.0) + m.log_prior[i]
        arr = scores.to_numpy()
        best = arr.argmax(axis=1)  # argmax takes the FIRST max: ties break
        # to the lexicographically smallest class (classes are sorted)
        smax = arr[np.arange(len(arr)), best]
        out = pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "pred": np.array(m.classes, dtype=object)[best],
                "score": smax,
            }
        )
        if with_confidence:
            out["conf"] = 1.0 / np.exp(arr - smax[:, None]).sum(axis=1)
        # scores are row-aligned with the input batch, so extra
        # columns (e.g. the true label for evaluation) ride along free
        for c in keep_cols or ():
            if c not in out.columns:
                out[c] = batch[c].to_numpy()
        return out

    return ds.map_batches(score, batch_format="pandas")


__all__ = ["NBModel", "nb_fit", "nb_predict"]


def classification_report(
    ds: ray.data.Dataset,
    label_col: str,
    pred_col: str,
) -> ray.data.Dataset:
    """Distributed evaluation rollup for a classifier's predictions:
    per true class, support, correct count, recall, and the dominant
    confusion (the most-predicted WRONG class, ties lexicographic) —
    the report a model-gated corpus pipeline checks before trusting a
    classifier gate at scale. One pre-aggregated exchange over
    (label, pred) cells (rows bounded by classes^2, never by corpus
    size); the per-class reduction runs on the tiny cell table.
    Emits (label_col, support, n_correct, recall, top_confusion) with
    top_confusion = '' for a perfectly-predicted class."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    def cells(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby([label_col, pred_col], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype("int64")
        return out

    cell = grouped_sum(
        ds.map_batches(cells, batch_format="pandas"),
        [label_col, pred_col],
        ["n"],
        counts=False,
    ).to_pandas()  # classes^2 rows — always tiny

    rows = []
    for lbl, g in cell.groupby(label_col, sort=True):
        support = int(g["sum_n"].sum())
        correct = int(g.loc[g[pred_col] == lbl, "sum_n"].sum())
        wrong = g[g[pred_col] != lbl].sort_values(
            ["sum_n", pred_col], ascending=[False, True], kind="stable"
        )
        rows.append(
            {
                label_col: lbl,
                "support": support,
                "n_correct": correct,
                "recall": correct / support,
                "top_confusion": "" if wrong.empty else str(wrong.iloc[0][pred_col]),
            }
        )
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


def calibration_buckets(
    ds: ray.data.Dataset,
    label_col: str,
    pred_col: str,
    conf_col: str = "conf",
    n_buckets: int = 10,
) -> ray.data.Dataset:
    """Reliability diagram for a classifier gate: bucket predictions
    by confidence (bucket = min(floor(conf * n), n-1)) and report
    per-bucket support and accuracy — the is-85%-confidence-really-85%
    check run before trusting a model-gated corpus filter. One
    pre-aggregated exchange over (bucket, correct) cells (rows bounded
    by 2 * n_buckets per block); accuracy is an exact integer ratio,
    so the rollup is engine-portable. Emits
    (bucket int64, n_docs, n_correct, accuracy)."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    def cells(batch: pd.DataFrame) -> pd.DataFrame:
        conf = batch[conf_col].to_numpy(dtype="float64")
        bucket = np.minimum(
            np.floor(conf * n_buckets).astype(np.int64), n_buckets - 1
        )
        correct = (
            (batch[label_col].to_numpy() == batch[pred_col].to_numpy())
            .astype("int64")
        )
        out = pd.DataFrame({"bucket": bucket, "n_correct": correct})
        g = out.groupby("bucket", sort=False)["n_correct"].agg(["size", "sum"]).reset_index()
        return pd.DataFrame(
            {
                "bucket": g["bucket"].to_numpy(dtype=np.int64),
                "n_docs": g["size"].to_numpy(dtype=np.int64),
                "n_correct": g["sum"].to_numpy(dtype=np.int64),
            }
        )

    agg = grouped_sum(
        ds.map_batches(cells, batch_format="pandas"),
        ["bucket"],
        ["n_docs", "n_correct"],
        counts=False,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": b["bucket"].to_numpy(dtype=np.int64),
                "n_docs": b["sum_n_docs"].to_numpy(dtype=np.int64),
                "n_correct": b["sum_n_correct"].to_numpy(dtype=np.int64),
                "accuracy": b["sum_n_correct"].to_numpy(dtype=np.float64)
                / b["sum_n_docs"].to_numpy(dtype=np.float64),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


@dataclass
class LogRegModel:
    """Broadcastable trained logistic-regression gate: hashed-feature
    weights + bias. `w` is (n_buckets,) float64."""

    w: np.ndarray
    b: float
    n_buckets: int
    meta: dict = field(default_factory=dict)


def _lr_explode(batch: pd.DataFrame, text_col: str, n_buckets: int):
    """Vectorized sparse feature triples for a batch: per-row token
    count per bucket, plus per-row token totals. Returns
    (row_idx, bucket, count, n_tokens) numpy arrays; rows with no
    tokens get n_tokens = 1 (their feature vector is all-zero)."""
    toks = batch[text_col].astype(str).str.split()
    lens = toks.str.len().to_numpy(dtype=np.int64)
    nz = lens > 0
    ex = toks[nz].explode()
    row_of = np.flatnonzero(nz)
    rid = np.repeat(row_of, lens[nz])
    bk = _bucketize(ex.astype(str), n_buckets)
    tc = (
        pd.DataFrame({"r": rid, "b": bk})
        .groupby(["r", "b"], sort=False)
        .size()
        .reset_index(name="c")
    )
    return (
        tc["r"].to_numpy(dtype=np.int64),
        tc["b"].to_numpy(dtype=np.int64),
        tc["c"].to_numpy(dtype=np.float64),
        np.maximum(lens, 1).astype(np.float64),
    )


def logreg_train(
    ds: ray.data.Dataset,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 4096,
    iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> LogRegModel:
    """Trainable linear quality classifier over hashed bag-of-words
    features — the fastText-shaped gate the public data recipes train
    between a curated positive set and raw crawl negatives (GPT-3
    appendix A, CCNet, DCLM-baseline). Features are term-frequency /
    doc-length over `n_buckets` hashed buckets (Weinberger et al.
    2009), so the model is a fixed (n_buckets,) weight vector no
    matter the corpus vocabulary.

    Training is deterministic full-batch gradient descent: each
    iteration broadcasts w (ray.put) and streams ONE map_batches pass
    emitting a single (n_buckets,) gradient partial per batch — the
    exchange per iteration is #blocks x d floats, never a row. The
    driver folds partials and applies w -= lr * (grad/N + l2*w).
    Full-batch GD (not SGD) is what makes the distributed fit
    order-free up to float reassociation of per-block partials —
    deterministic for a fixed block layout (the kmeans_fit
    discipline); partition invariance is pinned in pytest at 1e-8.

    `iters` streaming passes over the corpus (fastText's epoch cost);
    at 100 TB train on a hash-sampled subset — a linear gate saturates
    long before the full corpus.

    The features are hashed ONCE: a single tokenize+hash pass
    materializes slim (y, len, bucket-list, count-list) Arrow rows
    (~tokens × 12 bytes per doc — a small fraction of the text), and
    every GD iteration streams over the pre-hashed features. Without
    this, each epoch re-tokenizes and re-hashes the whole corpus —
    measured 3-4× slower at 20 iterations — for byte-identical
    gradients."""
    n_buckets = int(n_buckets)
    w = np.zeros(n_buckets, dtype=np.float64)
    b = 0.0

    def feat_pass(batch: pd.DataFrame) -> pa.Table:
        rid, bk, cnt, lens = _lr_explode(batch, text_col, n_buckets)
        order = np.argsort(rid, kind="stable")
        rid, bk, cnt = rid[order], bk[order], cnt[order]
        per_row = np.bincount(rid, minlength=len(batch))
        offsets = np.zeros(len(batch) + 1, dtype=np.int32)
        np.cumsum(per_row, out=offsets[1:])
        off = pa.array(offsets, pa.int32())
        return pa.table(
            {
                "y": pa.array(batch[label_col].to_numpy(dtype=np.float64), pa.float64()),
                "len": pa.array(lens, pa.float64()),
                "bk": pa.ListArray.from_arrays(off, pa.array(bk, pa.int64())),
                "cnt": pa.ListArray.from_arrays(off, pa.array(cnt, pa.float64())),
            }
        )

    feats = (
        ds.select_columns([text_col, label_col])
        .map_batches(feat_pass, batch_format="pandas", batch_size=1024)
        .materialize()
    )

    def grad_pass(batch: pd.DataFrame, wref) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "gw": pd.Series(dtype="object"),
                "gb": pd.Series(dtype="float64"),
                "n": pd.Series(dtype="int64"),
                "loss": pd.Series(dtype="float64"),
            }
        )
        if len(batch) == 0:
            return empty
        cached = ray.get(wref)  # local object store after first fetch
        wv, bv = cached
        row_lists = batch["bk"].to_numpy()
        sizes = np.fromiter((len(v) for v in row_lists), dtype=np.int64, count=len(batch))
        rid = np.repeat(np.arange(len(batch), dtype=np.int64), sizes)
        bk = (
            np.concatenate(row_lists).astype(np.int64)
            if sizes.sum()
            else np.empty(0, dtype=np.int64)
        )
        cnt = (
            np.concatenate(batch["cnt"].to_numpy()).astype(np.float64)
            if sizes.sum()
            else np.empty(0, dtype=np.float64)
        )
        lens = batch["len"].to_numpy(dtype=np.float64)
        y = batch["y"].to_numpy(dtype=np.float64)
        z = np.zeros(len(batch), dtype=np.float64)
        np.add.at(z, rid, wv[bk] * cnt)
        z = z / lens + bv
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        gw = np.zeros(n_buckets, dtype=np.float64)
        np.add.at(gw, bk, r[rid] * cnt / lens[rid])
        eps = 1e-12
        loss = float(-np.sum(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)))
        return pd.DataFrame(
            {"gw": [gw], "gb": [float(r.sum())], "n": [len(batch)], "loss": [loss]}
        )

    losses = []
    for _ in range(iters):
        wref = ray.put((w, b))
        parts = feats.map_batches(
            grad_pass,
            fn_kwargs={"wref": wref},
            batch_format="pandas",
            batch_size=1024,
        ).to_pandas()
        if parts.empty:
            break
        n = float(parts["n"].sum())
        gw = np.sum(np.stack(parts["gw"].to_numpy()), axis=0)
        gb = float(parts["gb"].sum())
        losses.append(float(parts["loss"].sum()) / n)
        w = w - lr * (gw / n + l2 * w)
        b = b - lr * (gb / n)
    return LogRegModel(w=w, b=float(b), n_buckets=n_buckets, meta={"losses": losses})


def logreg_predict(
    ds: ray.data.Dataset,
    model: LogRegModel,
    text_col: str = "text",
    keep_cols: list | None = None,
    score_col: str = "score",
    pred_col: str = "pred",
) -> ray.data.Dataset:
    """Shuffle-free scoring pass: broadcast the weight vector once,
    add sigmoid probability + 0/1 prediction columns per batch."""
    keep = list(keep_cols or [])
    wref = ray.put((model.w, model.b))
    nb = model.n_buckets

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        cols = {c: batch[c] for c in keep} if len(batch) else {}
        if len(batch) == 0:
            out = pd.DataFrame({c: pd.Series(dtype="object") for c in keep})
            out[score_col] = pd.Series(dtype="float64")
            out[pred_col] = pd.Series(dtype="int64")
            return out
        wv, bv = ray.get(wref)
        rid, bk, cnt, lens = _lr_explode(batch, text_col, nb)
        z = np.zeros(len(batch), dtype=np.float64)
        np.add.at(z, rid, wv[bk] * cnt)
        z = z / lens + bv
        p = 1.0 / (1.0 + np.exp(-z))
        out = pd.DataFrame(cols).reset_index(drop=True)
        out[score_col] = p
        out[pred_col] = (p >= 0.5).astype(np.int64)
        return out

    return ds.map_batches(f, batch_format="pandas", batch_size=4096)
