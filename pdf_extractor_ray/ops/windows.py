"""Windowed / temporal operators over keyed event streams.

The reference has no event-time semantics (SURVEY.md §2.9) — these are
the training-data-pipeline temporal operators Ray Data lacks natively,
built per the custom-operator ladder: composition of map_batches +
groupby(key).map_groups + in-group sort (option (a)); the partitioning
assumption is that ONE key's events fit in a worker (true for
per-user / per-document event streams; salt hot keys otherwise).

- sessionize : gap-based session assembly per key (tumbling-by-gap
  window). One shuffle on the key; in-group numpy diff, no row loop.
- asof_join  : merge the most recent right-side row (right.ts <=
  left.ts) onto each left row per key. Both sides are tagged and
  co-shuffled in ONE groupby (not two), then an in-group
  np.searchsorted merge — the classic sort-merge as-of.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def sessionize(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = "event_id",
) -> ray.data.Dataset:
    """Session-level rows (key, session_start, session_end, n_events).

    A new session starts when the gap to the previous event of the same
    key exceeds `gap_minutes`. Events are ordered by (ts, tiebreak) so
    the assignment is deterministic under equal timestamps."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def build(g: pd.DataFrame) -> pd.DataFrame:
        order = [ts_col] + ([order_tiebreak] if order_tiebreak and order_tiebreak in g else [])
        g = g.sort_values(order, kind="stable")
        ts = g[ts_col].to_numpy()
        new_sess = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            new_sess[1:] = (np.diff(ts) > gap.to_timedelta64()).astype(np.int64)
        sess = np.cumsum(new_sess)
        out = pd.DataFrame({key: g[key].to_numpy(), "_sess": sess, ts_col: ts})
        agg = out.groupby([key, "_sess"], as_index=False, sort=True).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        )
        return agg.drop(columns=["_sess"])

    return ds.groupby(key).map_groups(build, batch_format="pandas")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    suffix: str = "_right",
) -> ray.data.Dataset:
    """As-of (backward) join: for each left row, attach the right row
    with the greatest right.ts <= left.ts for the same key; left rows
    with no prior right row get nulls (ASOF LEFT JOIN semantics,
    matching DuckDB `ASOF LEFT JOIN ON l.key = r.key AND l.ts >= r.ts`).

    ONE co-shuffle: both sides are projected onto a unified schema
    (typed nulls for the other side's columns, pa.nulls — no object
    dtype drift), tagged `_side`, unioned, and grouped by key once;
    the per-key merge is vectorized (sort + np.searchsorted)."""
    import pyarrow as pa

    l_s, r_s = left.schema(), right.schema()
    l_names = list(l_s.names)
    l_types = dict(zip(l_s.names, l_s.types))
    r_types = dict(zip(r_s.names, r_s.types))
    out_right = {c: f"{c}{suffix}" for c in (ts_col, *right_cols)}

    unified = pa.schema(
        [pa.field(n, l_types[n]) for n in l_names]
        + [pa.field(out_right[c], r_types[c]) for c in (ts_col, *right_cols)]
        + [pa.field("_side", pa.int8())]
    )

    def project_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [t.column(name).cast(l_types[name]) for name in l_names]
        cols += [pa.nulls(n, r_types[c]) for c in (ts_col, *right_cols)]
        cols += [pa.array([0] * n, pa.int8())]
        return pa.Table.from_arrays(cols, schema=unified)

    def project_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = []
        for name in l_names:
            if name == key:
                cols.append(t.column(key).cast(l_types[key]))
            elif name == ts_col:
                cols.append(t.column(ts_col).cast(l_types[ts_col]))
            else:
                cols.append(pa.nulls(n, l_types[name]))
        cols += [t.column(c).cast(r_types[c]) for c in (ts_col, *right_cols)]
        cols += [pa.array([1] * n, pa.int8())]
        return pa.Table.from_arrays(cols, schema=unified)

    both = left.map_batches(project_left, batch_format="pyarrow").union(
        right.map_batches(project_right, batch_format="pyarrow")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0].drop(columns=["_side"]).sort_values(ts_col, kind="stable")
        rg = g[g["_side"] == 1].sort_values(ts_col, kind="stable")
        if lg.empty:
            return lg
        if rg.empty:
            return lg  # right-side columns stay all-null
        r_ts = rg[ts_col].to_numpy()
        idx = np.searchsorted(r_ts, lg[ts_col].to_numpy(), side="right") - 1
        take = np.clip(idx, 0, None)
        miss = idx < 0
        for dst in out_right.values():
            # right rows carry their payload under the suffixed names
            s = pd.Series(rg[dst].to_numpy()[take], index=lg.index)
            if miss.any():
                s[miss] = None
            lg[dst] = s
        return lg

    return both.groupby(key).map_groups(merge, batch_format="pandas")


def topk_per_group(
    ds: ray.data.Dataset,
    key: str,
    val: str,
    k: int,
    tiebreak: str | None = None,
) -> ray.data.Dataset:
    """Top-k rows per group by `val` desc (tie-broken by `tiebreak`
    asc for determinism). Per-batch pre-prune keeps only each batch's
    local top-k per key before the shuffle, so the groupby moves at
    most k rows per key per batch — not the corpus."""
    order_cols = [val] + ([tiebreak] if tiebreak else [])
    asc = [False] + [True] * (1 if tiebreak else 0)

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values(order_cols, ascending=asc, kind="stable")
            .groupby(key, sort=False)
            .head(k)
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_cols, ascending=asc, kind="stable").head(k)

    return (
        ds.map_batches(local_topk, batch_format="pandas")
        .groupby(key)
        .map_groups(final_topk, batch_format="pandas")
    )


def distinct_count(
    ds: ray.data.Dataset, key: str, col: str, alias: str = "n_distinct"
) -> ray.data.Dataset:
    """COUNT(DISTINCT col) GROUP BY key, scalably: per-batch local
    drop-dup (combiner), shuffle distinct (key, col) pairs, then a tiny
    second aggregate counts pairs per key."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    def local_distinct(b: pd.DataFrame) -> pd.DataFrame:
        return b[[key, col]].drop_duplicates()

    pairs = grouped_sum(
        ds.map_batches(local_distinct, batch_format="pandas"), [key, col], []
    )
    counted = grouped_sum(pairs.drop_columns(["n"]), [key], [])

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        return b.rename(columns={"n": alias})

    return counted.map_batches(rename, batch_format="pandas")
