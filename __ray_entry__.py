"""Driver contract for the graft builder (Ray Data target).

entry(): flagship extraction pipeline over a deterministic fixture
corpus (BASELINE.json input_hint shape) at sf0.001 scale.
queries(): one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data extras); oracle_sql(): DuckDB
equivalents where SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() anywhere in this package.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_REPO = os.path.dirname(os.path.abspath(__file__))


def _fixture_pages(n_rows: int = 500) -> str:
    """Deterministic pages.parquet (generated once per (n_rows) into a
    shared tmp dir; same bytes for the same n_rows — seed=42)."""
    out_dir = os.path.join(tempfile.gettempdir(), f"pdfx_fixture_{n_rows}")
    path = os.path.join(out_dir, "pages.parquet")
    if not os.path.exists(path):
        from pdf_extractor_ray.fixtures.generator import write_corpus

        write_corpus(out_dir, n_rows)
    return path


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _read_pd(sf_dir: str, table: str, columns: list[str] | None = None) -> pd.DataFrame:
    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=columns).to_pandas()


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: read pages -> map_batches(Extractor actor pool) ->
    extraction result rows (url, extracted_text, metrics)."""
    from pdf_extractor_ray.config import DEFAULT_CONFIG
    from pdf_extractor_ray.pipelines.extract import extraction_dataset

    cfg = DEFAULT_CONFIG.with_overrides(concurrency=4, batch_size=32)
    return extraction_dataset(_fixture_pages(500), cfg)


# ---------------------------------------------------------------------------
# queries — relational (TPC-H-ish, DuckDB-oracled)
# ---------------------------------------------------------------------------


def _q1_lineitem_agg(sf_dir: str) -> pd.DataFrame:
    """Grouped aggregate with per-batch partial combine before the
    shuffle (SURVEY.md §2.5 A7; scalable-groupby pattern)."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def add_disc(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["disc_price"] = b["l_extendedprice"] * (1 - b["l_discount"])
        return b

    ds = ds.map_batches(add_disc, batch_format="pandas")
    out = grouped_sum(ds, ["l_returnflag", "l_linestatus"], ["l_quantity", "l_extendedprice", "disc_price"]).to_pandas()
    return out.rename(
        columns={
            "sum_l_quantity": "sum_qty",
            "sum_l_extendedprice": "sum_base_price",
            "sum_disc_price": "sum_disc_price",
            "n": "count_order",
        }
    )


def _q6_revenue(sf_dir: str) -> pd.DataFrame:
    """Filtered scan + global sum — the filter is a vectorized Arrow
    predicate inside map_batches (prune-at-read: 4 columns only)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
                pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1997-01-01"))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(m)
        return pa.table({"part": pa.array([pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"])).as_py() or 0.0], pa.float64())})

    parts = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"revenue": [float(parts["part"].sum())]})


def _orders_by_segment(sf_dir: str) -> pd.DataFrame:
    """Broadcast join: small customer dim via ray.put, no shuffle."""
    from pdf_extractor_ray.ops.relational import broadcast_join, grouped_sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read_pd(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, on_big="o_custkey", on_small="c_custkey")
    out = grouped_sum(joined, ["c_mktsegment"], ["o_totalprice"]).to_pandas()
    return out.rename(columns={"sum_o_totalprice": "total_price", "n": "n_orders"})


def _customers_per_region(sf_dir: str) -> pd.DataFrame:
    from pdf_extractor_ray.ops.relational import broadcast_join, grouped_sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read_pd(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read_pd(sf_dir, "region", ["r_regionkey", "r_name"])
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[["n_nationkey", "r_name"]]
    joined = broadcast_join(cust, dim, on_big="c_nationkey", on_small="n_nationkey")
    out = grouped_sum(joined, ["r_name"], []).to_pandas()
    return out.rename(columns={"n": "n_customers"})


def _top10_orders(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    rows = ds.sort([("o_totalprice"), ("o_orderkey")], descending=[True, False]).limit(10).take_all()
    return pd.DataFrame(rows)[["o_orderkey", "o_totalprice"]]


def _events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate expressed as hour-bucket groupby
    (ray_guide streaming-shaped pattern)."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["hour"] = b["ts"].dt.floor("h")
        return b[["hour", "event_type", "value"]]

    ds = ds.map_batches(bucket, batch_format="pandas")
    out = grouped_sum(ds, ["event_type", "hour"], ["value"]).to_pandas()
    return out.rename(columns={"sum_value": "sum_value", "n": "n_events"})


def _distinct_returnflag(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem", ["l_returnflag"])
    vals = sorted(ds.unique("l_returnflag"))
    return pd.DataFrame({"l_returnflag": vals})


# ---------------------------------------------------------------------------
# queries — documents / text analysis
# ---------------------------------------------------------------------------


def _doc_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    from pdf_extractor_ray.ops.relational import grouped_sum

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = grouped_sum(ds, ["lang"], ["n_chars"]).to_pandas()
    out = out.rename(columns={"sum_n_chars": "total_chars", "n": "n_docs"})
    out["total_chars"] = out["total_chars"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


def _doc_token_counts(sf_dir: str) -> pd.DataFrame:
    from pdf_extractor_ray.ops.text_analysis import token_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return token_counts(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)


def _top_docs_by_chars(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    rows = ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20).take_all()
    return pd.DataFrame(rows)[["doc_id", "n_chars"]]


def _exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    from pdf_extractor_ray.ops.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = exact_dedup(ds).to_pandas()
    return kept[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def _minhash_dedup_docs(sf_dir: str) -> pd.DataFrame:
    from pdf_extractor_ray.ops.dedup import minhash_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = minhash_dedup(ds, threshold=0.8).to_pandas()
    return kept[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def _simhash_dedup_docs(sf_dir: str) -> pd.DataFrame:
    from pdf_extractor_ray.ops.dedup import simhash_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = simhash_dedup(ds, max_hamming=3).to_pandas()
    return kept[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def _text_analysis_docs(sf_dir: str) -> pd.DataFrame:
    from pdf_extractor_ray.ops.text_analysis import analyze

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return analyze(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# queries — similarity search
# ---------------------------------------------------------------------------


def _query_vec(sf_dir: str) -> np.ndarray:
    emb = _read_pd(sf_dir, "embeddings")
    row = emb.loc[emb["vec_id"] == emb["vec_id"].min()].iloc[0]
    return np.asarray(row["embedding"], dtype=np.float64)


def _similarity_topk(sf_dir: str) -> pd.DataFrame:
    from pdf_extractor_ray.ops.similarity import brute_force_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk(ds, _query_vec(sf_dir), k=10)
    return out[["vec_id", "cos"]]


def _similarity_ivf_topk(sf_dir: str) -> pd.DataFrame:
    from pdf_extractor_ray.ops.similarity import ivf_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ivf_topk(ds, _query_vec(sf_dir), k=10)[["vec_id", "cos"]]


def _embedding_neardup(sf_dir: str) -> pd.DataFrame:
    """Cosine pair detection; threshold 0.4 because the synthetic
    embeddings top out near 0.51 pairwise — the operator is the point,
    the threshold is data-dependent."""
    from pdf_extractor_ray.ops.similarity import embedding_neardup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_neardup_pairs(ds, threshold=0.4)


# ---------------------------------------------------------------------------
# queries — extraction pipeline (fixture corpus; rows-only checks)
# ---------------------------------------------------------------------------


def _extract_corpus(sf_dir: str) -> pd.DataFrame:
    from pdf_extractor_ray.config import DEFAULT_CONFIG
    from pdf_extractor_ray.pipelines.extract import extraction_dataset

    cfg = DEFAULT_CONFIG.with_overrides(concurrency=4)
    ds = extraction_dataset(_fixture_pages(500), cfg)
    out = ds.select_columns(["url", "lang", "payload_kind", "n_blocks", "n_words", "quality_score", "grade"]).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


def _extract_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    from pdf_extractor_ray.config import DEFAULT_CONFIG
    from pdf_extractor_ray.pipelines.extract import corpus_stats_by_lang, extraction_dataset

    cfg = DEFAULT_CONFIG.with_overrides(concurrency=4)
    ds = extraction_dataset(_fixture_pages(500), cfg)
    return corpus_stats_by_lang(ds).to_pandas().sort_values("lang").reset_index(drop=True)


def _image_featurize(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing over synthetic binary payloads (decode is a
    deterministic stub — see ops/multimodal.py)."""
    import pyarrow as pa

    from pdf_extractor_ray.ops.multimodal import featurize_images

    docs = _read_pd(sf_dir, "documents", ["doc_id", "text"]).head(200)
    tbl = pa.table(
        {
            "media_id": pa.array(docs["doc_id"].tolist(), pa.int64()),
            "payload": pa.array([t.encode("utf-8") for t in docs["text"]], pa.binary()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = featurize_images(ds).drop_columns(["feature"]).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "q1_lineitem_agg": _q1_lineitem_agg,
        "q6_revenue": _q6_revenue,
        "orders_by_segment": _orders_by_segment,
        "customers_per_region": _customers_per_region,
        "top10_orders": _top10_orders,
        "events_hourly": _events_hourly,
        "distinct_returnflag": _distinct_returnflag,
        "doc_stats_by_lang": _doc_stats_by_lang,
        "doc_token_counts": _doc_token_counts,
        "top_docs_by_chars": _top_docs_by_chars,
        "exact_dedup_docs": _exact_dedup_docs,
        "minhash_dedup_docs": _minhash_dedup_docs,
        "simhash_dedup_docs": _simhash_dedup_docs,
        "text_analysis_docs": _text_analysis_docs,
        "similarity_topk": _similarity_topk,
        "similarity_ivf_topk": _similarity_ivf_topk,
        "embedding_neardup": _embedding_neardup,
        "extract_corpus": _extract_corpus,
        "extract_stats_by_lang": _extract_stats_by_lang,
        "image_featurize": _image_featurize,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(l_extendedprice) AS sum_base_price,
                   sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "q6_revenue": """
            SELECT sum(l_extendedprice * l_discount) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "orders_by_segment": """
            SELECT c_mktsegment, sum(o_totalprice) AS total_price, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "customers_per_region": """
            SELECT r_name, count(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "top10_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   sum(value) AS sum_value, count(*) AS n_events
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "distinct_returnflag": "SELECT DISTINCT l_returnflag FROM lineitem",
        "doc_stats_by_lang": """
            SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   count(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "doc_token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_ws_tokens
            FROM documents
        """,
        "top_docs_by_chars": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 20
        """,
        "exact_dedup_docs": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "similarity_topk": """
            SELECT e.vec_id,
                   list_cosine_similarity(e.embedding,
                       (SELECT embedding FROM embeddings
                        WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) AS cos
            FROM embeddings e
            ORDER BY cos DESC, e.vec_id LIMIT 10
        """,
        # minhash/simhash dedup, text_analysis, ivf/neardup, extraction and
        # multimodal stages are not SQL-expressible -> rows-only checks.
    }
