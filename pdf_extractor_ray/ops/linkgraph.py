"""Web link-graph operators: anchor extraction, host-edge
aggregation, and distributed PageRank.

The host link graph is a core curation signal for web-scale training
data (host-level quality and spam scores propagate along links —
PageRank, Brin & Page 1998), and it exercises the engine's second
iterative BSP algorithm after connected components (ops/dedup.py):
fixed-round rank exchanges over hash-partitioned nodes, never a
JoinOperator, nothing corpus-sized on the driver.

- page_links : (url, href, absolute) rows per anchor, compiled-regex
  scan over charset-sniffed HTML inside map_batches (per-batch flat
  explode; the non-HTML payloads contribute nothing).
- host_edges : (src_host, dst_host, n) weighted cross-host edges —
  absolute http(s) anchors only; same-host navigation collapses away.
- pagerank   : damped PageRank over the host graph, `n_iters` BSP
  rounds; per round ONE src-keyed exchange stamps each edge with its
  source's rank/outdegree and ONE dst-keyed exchange reduces
  contributions; dangling mass is redistributed uniformly (the
  standard formulation). Rank mass is conserved to float precision.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pdf_extractor_ray.ops.dedup import _typed_table

_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"'<>]+)["']""", re.IGNORECASE)
_HOST_RE = re.compile(r"^https?://([^/:?#]+)", re.IGNORECASE)

_LINK_SCHEMA = pa.schema(
    [("url", pa.large_string()), ("href", pa.large_string()), ("absolute", pa.int8())]
)
_EDGE_SCHEMA = pa.schema(
    [("src_host", pa.large_string()), ("dst_host", pa.large_string()), ("n", pa.int64())]
)
_RANK_SCHEMA = pa.schema([("host", pa.large_string()), ("rank", pa.float64())])


def page_links(
    ds: ray.data.Dataset, html_col: str = "html", url_col: str = "url"
) -> ray.data.Dataset:
    """One row per <a href> anchor: (url, href, absolute). HTML bytes
    are charset-sniffed exactly like the extraction path."""
    from pdf_extractor_ray.functions.html_extract import sniff_decode

    def f(batch: pd.DataFrame) -> pa.Table:
        urls: list[str] = []
        hrefs: list[str] = []
        for url, payload in zip(batch[url_col], batch[html_col]):
            raw = bytes(payload)
            if b"<" not in raw[:256]:  # non-HTML payloads carry no anchors
                continue
            text, _enc = sniff_decode(raw)
            for m in _HREF_RE.finditer(text):
                urls.append(str(url))
                hrefs.append(m.group(1))
        absolute = np.fromiter(
            (1 if _HOST_RE.match(h) else 0 for h in hrefs), dtype=np.int8, count=len(hrefs)
        )
        return _typed_table(_LINK_SCHEMA, url=urls, href=hrefs, absolute=absolute)

    return ds.map_batches(f, batch_format="pandas")


def host_edges(links: ray.data.Dataset) -> ray.data.Dataset:
    """Weighted cross-host edges (src_host, dst_host, n) from absolute
    anchors; pre-aggregated per batch, then one grouped_sum."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        # lowercase BEFORE extraction: str.extract(pattern) drops the
        # compiled IGNORECASE flag, and hosts are case-insensitive —
        # HTTP:// schemes must match and Example.com == example.com
        src = batch["url"].astype(str).str.lower().str.extract(_HOST_RE.pattern, expand=False)
        dst = batch["href"].astype(str).str.lower().str.extract(_HOST_RE.pattern, expand=False)
        ok = src.notna() & dst.notna() & (src != dst)
        g = (
            pd.DataFrame({"src_host": src[ok], "dst_host": dst[ok]})
            .groupby(["src_host", "dst_host"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype("int64")
        return g

    return grouped_sum(
        links.map_batches(f, batch_format="pandas"), ["src_host", "dst_host"], ["n"], counts=False
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "src_host": b["src_host"],
                "dst_host": b["dst_host"],
                "n": b["sum_n"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


_PR_BROADCAST_MAX_EDGES = 250_000


def _pagerank_local(df: pd.DataFrame, damping: float, n_iters: int) -> pa.Table:
    """Driver-side vectorized power iteration for BOUNDED edge sets —
    identical damped/dangling formulation as the BSP tier (tests force
    both and assert equality)."""
    hosts = np.unique(np.concatenate([df["src_host"].to_numpy(), df["dst_host"].to_numpy()]))
    idx = {h: i for i, h in enumerate(hosts)}
    src = df["src_host"].map(idx).to_numpy(dtype=np.int64)
    dst = df["dst_host"].map(idx).to_numpy(dtype=np.int64)
    wgt = df["n"].to_numpy(dtype=np.float64)
    n = len(hosts)
    outw = np.zeros(n)
    np.add.at(outw, src, wgt)
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        dangling = rank[outw == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rank[src] * wgt / outw[src])
        rank = (1.0 - damping) / n + damping * (contrib + dangling / n)
    return _typed_table(_RANK_SCHEMA, host=hosts, rank=rank)


def pagerank(
    edges: ray.data.Dataset,
    damping: float = 0.85,
    n_iters: int = 10,
    num_partitions: int = 32,
    broadcast_max_edges: int = _PR_BROADCAST_MAX_EDGES,
) -> ray.data.Dataset:
    """Damped PageRank over weighted (src_host, dst_host, n) edges;
    returns (host, rank) with sum(rank) == 1 to float precision.

    Two tiers: a HOST graph is usually bounded (hosts, not pages), so
    edge sets within `broadcast_max_edges` run one driver-side numpy
    power iteration; above the cap, fixed `n_iters` BSP rounds — each
    round one src-keyed exchange stamps edges with rank/outdegree and
    one dst-keyed exchange reduces contributions; node and rank tables
    are host-cardinality and edges are never collected."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(_typed_table(_RANK_SCHEMA))
    if n_edges <= broadcast_max_edges:
        df = edges.to_pandas()
        if "src_host" not in df.columns:
            return ray.data.from_arrow(_typed_table(_RANK_SCHEMA))
        return ray.data.from_arrow(_pagerank_local(df, damping, n_iters))

    def norm(t: pa.Table) -> pa.Table:
        return _typed_table(
            _EDGE_SCHEMA,
            src_host=t.column("src_host").cast(pa.large_string()),
            dst_host=t.column("dst_host").cast(pa.large_string()),
            n=t.column("n").cast(pa.int64()),
        )

    edges = edges.map_batches(norm, batch_format="pyarrow").materialize()

    # node table + per-src outweight (sum of edge weights per source)
    def nodes_of(t: pa.Table) -> pa.Table:
        hosts = np.unique(
            np.concatenate(
                [
                    t.column("src_host").to_numpy(zero_copy_only=False),
                    t.column("dst_host").to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"host": pa.array(hosts, pa.large_string())})

    nodes = (
        edges.map_batches(nodes_of, batch_format="pyarrow")
        .groupby("host")
        .count()
        .select_columns(["host"])
        .materialize()
    )
    n_nodes = nodes.count()

    from pdf_extractor_ray.ops.relational import grouped_sum

    outw = grouped_sum(edges, ["src_host"], ["n"], counts=False).materialize()

    def part_of(s: pd.Series) -> np.ndarray:
        return (
            pd.util.hash_array(s.astype(str).to_numpy()) % np.uint64(num_partitions)
        ).astype("int64")

    msg_schema = pa.schema(
        [
            ("key", pa.large_string()),
            ("dst", pa.large_string()),
            ("val", pa.float64()),
            ("side", pa.int8()),  # 0 = edge, 1 = rank/outw carrier
            ("_part", pa.int64()),
        ]
    )

    def proj_edges(t: pa.Table) -> pa.Table:
        src = t.column("src_host").to_numpy(zero_copy_only=False)
        s = pd.Series(src, dtype="object")
        return _typed_table(
            msg_schema,
            key=src,
            dst=t.column("dst_host").to_numpy(zero_copy_only=False),
            val=t.column("n").to_numpy(zero_copy_only=False).astype(np.float64),
            side=np.zeros(t.num_rows, dtype=np.int8),
            _part=part_of(s),
        )

    edges_proj = edges.map_batches(proj_edges, batch_format="pyarrow").materialize()

    # rank state lives as a pandas-friendly Dataset (host, rank, outw)
    ranks = nodes.map_batches(
        lambda t: pa.table(
            {
                "host": t.column("host").cast(pa.large_string()),
                "rank": pa.array(
                    np.full(t.num_rows, 1.0 / max(n_nodes, 1)), pa.float64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    outw_pd_schema = pa.schema([("host", pa.large_string()), ("w", pa.float64())])
    outw = outw.map_batches(
        lambda t: _typed_table(
            outw_pd_schema,
            host=t.column("src_host").cast(pa.large_string()),
            w=t.column("sum_n").to_numpy(zero_copy_only=False).astype(np.float64),
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(n_iters):
        # dangling mass: ranks of nodes with no outgoing edges. Tiny
        # grouped reduction (host-cardinality), computed distributed.
        def carrier_rank(t: pa.Table) -> pa.Table:
            host = t.column("host").to_numpy(zero_copy_only=False)
            s = pd.Series(host, dtype="object")
            return _typed_table(
                msg_schema,
                key=host,
                dst=host,
                val=t.column("rank").to_numpy(zero_copy_only=False),
                side=np.ones(t.num_rows, dtype=np.int8),
                _part=part_of(s),
            )

        def carrier_outw(t: pa.Table) -> pa.Table:
            host = t.column("host").to_numpy(zero_copy_only=False)
            s = pd.Series(host, dtype="object")
            return _typed_table(
                msg_schema,
                key=host,
                dst=host,
                val=t.column("w").to_numpy(zero_copy_only=False),
                side=np.full(t.num_rows, 2, dtype=np.int8),
                _part=part_of(s),
            )

        contrib_schema = pa.schema(
            [("dst", pa.large_string()), ("contrib", pa.float64()), ("dangling", pa.float64())]
        )

        def contribs(g: pd.DataFrame) -> pa.Table:
            if g.empty or "side" not in g.columns:
                return _typed_table(contrib_schema)
            rk = g[g["side"] == 1].set_index("key")["val"]
            ow = g[g["side"] == 2].set_index("key")["val"]
            eg = g[g["side"] == 0]
            dsts: list = []
            cons: list = []
            dangs: list = []
            if not eg.empty:
                src_rank = eg["key"].map(rk).to_numpy(dtype=np.float64)
                src_outw = eg["key"].map(ow).to_numpy(dtype=np.float64)
                contrib = src_rank * eg["val"].to_numpy(dtype=np.float64) / src_outw
                dsts.extend(eg["dst"])
                cons.extend(contrib)
                dangs.extend([0.0] * len(eg))
            # dangling: rank carriers whose host has no outweight entry
            dang = rk[~rk.index.isin(ow.index)]
            if len(dang):
                dsts.extend(dang.index)
                cons.extend([0.0] * len(dang))
                dangs.extend(dang.to_numpy(dtype=np.float64))
            return _typed_table(
                contrib_schema,
                dst=dsts,
                contrib=np.array(cons, dtype=np.float64),
                dangling=np.array(dangs, dtype=np.float64),
            )

        msgs = (
            edges_proj.union(
                ranks.map_batches(carrier_rank, batch_format="pyarrow"),
                outw.map_batches(carrier_outw, batch_format="pyarrow"),
            )
            .groupby("_part")
            .map_groups(contribs, batch_format="pandas")
            .materialize()
        )
        dangling_mass = float(msgs.sum("dangling") or 0.0)

        # reduce contributions on dst, then rebuild the full rank table
        # with ONE host-keyed co-shuffle of (nodes UNION in-sums) — a
        # web-scale host set is ~10^8 rows, so it never touches the
        # driver; nodes with zero in-links still get the teleport share
        agg = grouped_sum(msgs, ["dst"], ["contrib"], counts=False)
        base = (1.0 - damping) / n_nodes + damping * dangling_mass / n_nodes

        def proj_node(t: pa.Table) -> pa.Table:
            host = t.column("host").to_numpy(zero_copy_only=False)
            s = pd.Series(host, dtype="object")
            return _typed_table(
                msg_schema,
                key=host,
                dst=host,
                val=np.zeros(t.num_rows, dtype=np.float64),
                side=np.ones(t.num_rows, dtype=np.int8),
                _part=part_of(s),
            )

        def proj_insum(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "dst" not in t.column_names:
                return _typed_table(msg_schema)
            host = t.column("dst").to_numpy(zero_copy_only=False)
            s = pd.Series(host, dtype="object")
            return _typed_table(
                msg_schema,
                key=host,
                dst=host,
                val=t.column("sum_contrib").to_numpy(zero_copy_only=False),
                side=np.zeros(t.num_rows, dtype=np.int8),
                _part=part_of(s),
            )

        def apply_rank(g: pd.DataFrame) -> pa.Table:
            # Arrow return keeps column names on empty partitions
            if g.empty or "side" not in g.columns:
                return _typed_table(_RANK_SCHEMA)
            hosts = g.loc[g["side"] == 1, "key"]
            contrib = g[g["side"] == 0].groupby("key", sort=False)["val"].sum()
            r = base + damping * hosts.map(contrib).fillna(0.0).to_numpy(dtype=np.float64)
            return _typed_table(_RANK_SCHEMA, host=hosts.to_numpy(), rank=r)

        ranks = (
            nodes.map_batches(proj_node, batch_format="pyarrow")
            .union(agg.map_batches(proj_insum, batch_format="pyarrow"))
            .groupby("_part")
            .map_groups(apply_rank, batch_format="pandas")
            .materialize()
        )

    return ranks.map_batches(
        lambda t: _typed_table(
            _RANK_SCHEMA,
            host=t.column("host").cast(pa.large_string()),
            rank=t.column("rank").to_numpy(zero_copy_only=False),
        ),
        batch_format="pyarrow",
    )


_PR_CACHE: dict = {}  # per-worker resolved broadcast degree maps


def triangle_count(
    edges: ray.data.Dataset,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    num_partitions: int = 32,
    broadcast_max_nodes: int = 1_000_000,
) -> int:
    """Exact triangle count of the UNDIRECTED simple graph underlying
    an edge list — the clustering-structure number link-graph audits
    report next to degree and PageRank. Classic degree-oriented
    wedge-check algorithm (the MapReduce-era standard): orient every
    edge from its lower-(degree, id) endpoint to the higher, so each
    node's out-neighborhood is O(sqrt(m)) even at hubs; each node
    emits its out-neighbor PAIRS (wedges) keyed like edges; one
    co-shuffle of wedges with oriented edges on hash(pair) mod P
    counts the closures in-partition. Every exchange is wedge/edge
    width; the count returns as a driver int.

    Self-loops are dropped; parallel/reverse duplicates collapse to
    one undirected edge."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        a = b[src_col].astype(str).to_numpy()
        c = b[dst_col].astype(str).to_numpy()
        keep = a != c
        a, c = a[keep], c[keep]
        lo = np.minimum(a, c)
        hi = np.maximum(a, c)
        return pd.DataFrame({"u": lo, "v": hi}).drop_duplicates()

    und = (
        grouped_sum(edges.map_batches(undirect, batch_format="pandas"), ["u", "v"], [])
        .map_batches(lambda b: b[["u", "v"]], batch_format="pandas")
        .materialize()
    )  # distinct undirected edges

    # degrees for the orientation (ties by node id)
    def touch(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([b["u"].to_numpy(), b["v"].to_numpy()]),
                "one": np.ones(2 * len(b), dtype="int64"),
            }
        )

    deg_ds = grouped_sum(
        und.map_batches(touch, batch_format="pandas"), ["node"], ["one"], counts=False
    ).materialize()  # one row per node — the graph's node table

    def _finish_orient(b: pd.DataFrame) -> pd.DataFrame:
        # orient lower (degree, id) -> higher so out-neighborhoods
        # stay O(sqrt(m)) even at hubs
        u = b["u"].to_numpy()
        v = b["v"].to_numpy()
        du = b["_du"].to_numpy(dtype="int64")
        dv = b["_dv"].to_numpy(dtype="int64")
        fwd = (du < dv) | ((du == dv) & (u < v))
        out = pd.DataFrame(
            {"head": np.where(fwd, u, v), "tail": np.where(fwd, v, u)}
        )
        out["_part"] = (
            pd.util.hash_array(out["head"].to_numpy()) % np.uint64(num_partitions)
        ).astype("int64")
        return out

    if deg_ds.count() <= broadcast_max_nodes:
        # broadcast tier: the node-degree map ships once
        deg = deg_ds.to_pandas()
        dmap = dict(zip(deg["node"], deg["sum_one"].astype("int64")))
        dref = ray.put(dmap)

        def orient(b: pd.DataFrame) -> pd.DataFrame:
            m = _PR_CACHE.get(("deg", dref.hex()))
            if m is None:
                m = _PR_CACHE[("deg", dref.hex())] = ray.get(dref)
            b = b.copy()
            b["_du"] = np.array([m[x] for x in b["u"]], dtype="int64")
            b["_dv"] = np.array([m[x] for x in b["v"]], dtype="int64")
            return _finish_orient(b)

        oriented = und.map_batches(orient, batch_format="pandas")
    else:
        # co-shuffle tier (web-scale host universe): degrees attach by
        # co-shuffling edges with the node table on hash(node) mod P,
        # once keyed on u, once on v — no node-width driver collect
        def _attach_deg(edge_ds: ray.data.Dataset, side: str, out_col: str) -> ray.data.Dataset:
            def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
                b = b.copy()
                b["_key"] = b[side]
                b["_deg"] = np.int64(-1)
                b["_side"] = np.int8(0)
                h = pd.util.hash_array(b["_key"].to_numpy())
                b["_kpart"] = (h % np.uint64(num_partitions)).astype("int64")
                return b

            def tag_deg(b: pd.DataFrame) -> pd.DataFrame:
                h = pd.util.hash_array(b["node"].to_numpy())
                return pd.DataFrame(
                    {
                        "_key": b["node"],
                        "_deg": b["sum_one"].to_numpy(dtype="int64"),
                        "_side": np.full(len(b), 1, dtype=np.int8),
                        "_kpart": (h % np.uint64(num_partitions)).astype("int64"),
                    }
                )

            def attach_part(g: pd.DataFrame) -> pd.DataFrame:
                if g.empty or "_side" not in g.columns:
                    return pd.DataFrame()
                m = dict(
                    zip(g.loc[g["_side"] == 1, "_key"], g.loc[g["_side"] == 1, "_deg"])
                )
                out = g[g["_side"] == 0].copy()
                out[out_col] = out["_key"].map(m).to_numpy(dtype="int64")
                return out.drop(columns=["_key", "_deg", "_side", "_kpart"])

            both = edge_ds.map_batches(tag_edges, batch_format="pandas").union(
                deg_ds.map_batches(tag_deg, batch_format="pandas")
            )
            return both.groupby("_kpart").map_groups(attach_part, batch_format="pandas")

        with_du = _attach_deg(und, "u", "_du")
        with_dv = _attach_deg(with_du, "v", "_dv")

        def orient_shuffled(b: pd.DataFrame) -> pd.DataFrame:
            if b.empty or "_dv" not in b.columns:
                return pd.DataFrame(
                    {"head": pd.Series(dtype="object"), "tail": pd.Series(dtype="object"),
                     "_part": pd.Series(dtype="int64")}
                )
            return _finish_orient(b)

        oriented = with_dv.map_batches(orient_shuffled, batch_format="pandas")

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # each head's COMPLETE out-neighborhood is partition-local here
        if g.empty or "head" not in g.columns:
            return pd.DataFrame(
                {"a": pd.Series(dtype="object"), "b": pd.Series(dtype="object"),
                 "_side": pd.Series(dtype="int8")}
            )
        wa, wb = [], []
        for _, grp in g.groupby("head", sort=False):
            ts = sorted(grp["tail"])
            for i in range(len(ts)):
                for j in range(i + 1, len(ts)):
                    wa.append(ts[i])
                    wb.append(ts[j])
        return pd.DataFrame(
            {"a": wa, "b": wb, "_side": np.zeros(len(wa), dtype=np.int8)}
        )

    wedge_rows = (
        oriented.groupby("_part").map_groups(wedges, batch_format="pandas")
    )

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"a": b["u"], "b": b["v"], "_side": np.ones(len(b), dtype=np.int8)}
        )

    def pair_part(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "a" not in b.columns:
            return pd.DataFrame(
                {"a": pd.Series(dtype="object"), "b": pd.Series(dtype="object"),
                 "_side": pd.Series(dtype="int8"), "_part": pd.Series(dtype="int64")}
            )
        b = b.copy()
        h = pd.util.hash_pandas_object(
            b["a"].astype(str) + "\x1f" + b["b"].astype(str), index=False
        ).to_numpy()
        b["_part"] = (h % num_partitions).astype("int64")
        return b

    both = (
        wedge_rows.map_batches(pair_part, batch_format="pandas")
        .union(
            und.map_batches(edge_rows, batch_format="pandas").map_batches(
                pair_part, batch_format="pandas"
            )
        )
    )

    def close_part(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or "_side" not in g.columns:
            return pd.DataFrame({"t": pd.Series(dtype="int64")})
        have = g[g["_side"] == 1][["a", "b"]].drop_duplicates()
        key = set(zip(have["a"], have["b"]))
        w = g[g["_side"] == 0]
        hits = sum((a, b) in key for a, b in zip(w["a"], w["b"]))
        return pd.DataFrame({"t": [int(hits)]})

    parts = both.groupby("_part").map_groups(close_part, batch_format="pandas")
    return int(parts.sum("t") or 0)


_ANCHOR_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*["']([^"'<>]+)["'][^>]*>(.*?)</a>""",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]*>")

_ANCHOR_SCHEMA = pa.schema(
    [
        ("url", pa.large_string()),
        ("href", pa.large_string()),
        ("anchor", pa.large_string()),
    ]
)


def anchor_texts(
    ds: ray.data.Dataset, html_col: str = "html", url_col: str = "url"
) -> ray.data.Dataset:
    """(url, href, anchor) per <a> element WITH its inner text —
    anchor text is the web's free labeling signal (it describes the
    TARGET page; search and quality pipelines aggregate it per
    destination). Inner markup is stripped and whitespace collapsed;
    empty anchors (image links) are kept as '' so link counts still
    reconcile with page_links. Same stage shape: charset-sniffed,
    compiled regex, per-batch flat explode, no shuffle."""
    from pdf_extractor_ray.functions.html_extract import sniff_decode

    def f(batch: pd.DataFrame) -> pa.Table:
        urls: list[str] = []
        hrefs: list[str] = []
        anchors: list[str] = []
        for url, payload in zip(batch[url_col], batch[html_col]):
            raw = bytes(payload)
            if b"<" not in raw[:256]:
                continue
            text, _enc = sniff_decode(raw)
            for m in _ANCHOR_RE.finditer(text):
                urls.append(str(url))
                hrefs.append(m.group(1))
                anchors.append(" ".join(_TAG_RE.sub(" ", m.group(2)).split()))
        return _typed_table(_ANCHOR_SCHEMA, url=urls, href=hrefs, anchor=anchors)

    return ds.map_batches(f, batch_format="pandas")


def target_anchor_terms(
    links: ray.data.Dataset, k: int = 5, num_partitions: int = 32
) -> ray.data.Dataset:
    """Top-k incoming anchor TERMS per destination host — what the
    rest of the web calls each host (the aggregate quality/label
    signal). Only absolute http(s) links contribute (relative links
    describe the same site navigating itself). Shape: per-batch
    (dst_host, term, partial n) counts enter one grouped_sum; the
    top-k finish is the pre-pruned topk_per_group shuffle. Emits
    (dst_host, term, n_term) rows."""
    from pdf_extractor_ray.ops.relational import grouped_sum
    from pdf_extractor_ray.ops.windows import topk_per_group

    def term_rows(b: pd.DataFrame) -> pd.DataFrame:
        # lowercase first: extract(pattern) drops IGNORECASE, and a
        # mixed-case host must not split the dst_host aggregation key
        dst = b["href"].astype(str).str.lower().str.extract(_HOST_RE.pattern, expand=False)
        ok = dst.notna() & (b["anchor"].astype(str) != "")
        d = pd.DataFrame({"dst_host": dst[ok], "anchor": b.loc[ok, "anchor"].astype(str)})
        if d.empty:
            return pd.DataFrame(
                {"dst_host": pd.Series(dtype="object"), "term": pd.Series(dtype="object"),
                 "n": pd.Series(dtype="int64")}
            )
        toks = d.set_index("dst_host")["anchor"].str.lower().str.split().explode().dropna()
        vc = toks.groupby([toks.index, toks.values]).size()
        out = vc.reset_index()
        out.columns = ["dst_host", "term", "n"]
        out["n"] = out["n"].astype("int64")
        return out

    counts = grouped_sum(
        links.map_batches(term_rows, batch_format="pandas"),
        ["dst_host", "term"],
        ["n"],
        counts=False,
    )

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        return b.rename(columns={"sum_n": "n_term"})

    named = counts.map_batches(rename, batch_format="pandas")
    return topk_per_group(
        named, key="dst_host", val="n_term", k=k, tiebreak="term",
        num_partitions=num_partitions,
    )


_HITS_SCHEMA = pa.schema(
    [("host", pa.large_string()), ("hub", pa.float64()), ("authority", pa.float64())]
)


def _hits_local(df: pd.DataFrame, n_iters: int) -> pa.Table:
    """Driver-side Kleinberg HITS power iteration for BOUNDED edge
    sets — L2-normalized after each half-step, same formulation as the
    streamed tier (tests force both and assert equality)."""
    hosts = np.unique(np.concatenate([df["src_host"].to_numpy(), df["dst_host"].to_numpy()]))
    idx = {h: i for i, h in enumerate(hosts)}
    src = df["src_host"].map(idx).to_numpy(dtype=np.int64)
    dst = df["dst_host"].map(idx).to_numpy(dtype=np.int64)
    wgt = df["n"].to_numpy(dtype=np.float64)
    n = len(hosts)
    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(n_iters):
        auth = np.zeros(n)
        np.add.at(auth, dst, hub[src] * wgt)
        nrm = np.linalg.norm(auth)
        auth = auth / nrm if nrm > 0 else auth
        hub = np.zeros(n)
        np.add.at(hub, src, auth[dst] * wgt)
        nrm = np.linalg.norm(hub)
        hub = hub / nrm if nrm > 0 else hub
    return _typed_table(_HITS_SCHEMA, host=hosts, hub=hub, authority=auth)


def hits(
    edges: ray.data.Dataset,
    n_iters: int = 20,
    num_partitions: int = 32,
    broadcast_max_edges: int = _PR_BROADCAST_MAX_EDGES,
) -> ray.data.Dataset:
    """Kleinberg HITS hubs/authorities (Kleinberg 1999) over weighted
    (src_host, dst_host, n) edges: the directional complement of
    pagerank — link HUBS (directories, aggregators) vs link
    AUTHORITIES (heavily referenced content hosts), both useful crawl
    prioritization signals.

    Tiers: below `broadcast_max_edges` one driver-side numpy power
    iteration (host graphs are bounded). Above it, the STREAMED tier:
    the score vector is host-cardinality (same boundedness assumption
    pagerank's tiers document) and broadcasts via ray.put each
    half-step, while the EDGES — the unbounded side — are only ever
    streamed through map_batches producing (host, val) partials that
    grouped_sum reduces to host-cardinality; edges are never
    collected. 2*n_iters slim exchanges total; the L2 normalizer is
    one scalar per half-step from the reduced table."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(_typed_table(_HITS_SCHEMA))
    if n_edges <= broadcast_max_edges:
        df = edges.to_pandas()
        if "src_host" not in df.columns:
            return ray.data.from_arrow(_typed_table(_HITS_SCHEMA))
        return ray.data.from_arrow(_hits_local(df, n_iters))

    # ---- streamed tier ----
    def nodes_of(t: pa.Table) -> pa.Table:
        hs = np.unique(
            np.concatenate(
                [
                    t.column("src_host").to_numpy(zero_copy_only=False),
                    t.column("dst_host").to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"host": pa.array(hs, pa.large_string())})

    hosts = (
        edges.map_batches(nodes_of, batch_format="pyarrow")
        .groupby("host")
        .count()
        .select_columns(["host"])
        .to_pandas()["host"]
        .to_numpy()
    )
    hosts = np.sort(hosts)
    hub = {h: 1.0 for h in hosts}
    auth: dict = {}

    def half_step(scores: dict, from_col: str, to_col: str) -> dict:
        sref = ray.put(scores)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            s = ray.get(sref)
            vals = b[from_col].map(s).fillna(0.0).to_numpy() * b["n"].to_numpy(dtype=np.float64)
            out = pd.DataFrame({"host": b[to_col].to_numpy(), "val": vals})
            return out.groupby("host", as_index=False, sort=True)["val"].sum()

        red = grouped_sum(
            edges.map_batches(contrib, batch_format="pandas"), ["host"], ["val"], counts=False
        ).to_pandas()
        nrm = float(np.linalg.norm(red["sum_val"].to_numpy()))
        if nrm == 0:
            return {}
        return dict(zip(red["host"], red["sum_val"].to_numpy() / nrm))

    for _ in range(n_iters):
        auth = half_step(hub, "src_host", "dst_host")
        hub = half_step(auth, "dst_host", "src_host")
    return ray.data.from_arrow(
        _typed_table(
            _HITS_SCHEMA,
            host=hosts,
            hub=np.array([hub.get(h, 0.0) for h in hosts]),
            authority=np.array([auth.get(h, 0.0) for h in hosts]),
        )
    )
