"""Replicates the driver's correctness gate locally: run each
__ray_entry__.queries() callable and its oracle_sql() on the same
parquet tables; compare row-count, column names, and order-insensitive
values (floats rounded). Usage:

    python tools/check_oracles.py [sf_dir] [--only substr[,substr...]]

--only filters query names by case-sensitive substring match (any of
the comma-separated fragments) for fast iteration on one operator.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(4)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    args = list(sys.argv[1:])
    only: list[str] = []
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1].split(",")
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_fail = 0
    import time

    t_start = time.monotonic()
    for name, fn in qs.items():
        if only and not any(frag in name for frag in only):
            continue
        t0 = time.monotonic()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = f"[{time.monotonic() - t0:6.2f}s @{time.monotonic() - t_start:7.1f}s]"
        if name not in oracles:
            print(f"okR  {name} {dt}: rows-only ({len(got)} rows, cols {list(got.columns)})")
            continue
        want = canon(con.execute(oracles[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        if not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            print(f"FAIL {name}: values differ in {neq.any().to_dict()}")
            print(pd.concat([got[neq.any(axis=1)].head(3), want[neq.any(axis=1)].head(3)]))
            n_fail += 1
            continue
        print(f"ok   {name} {dt}: {len(got)} rows match oracle")
    print("FAILURES:", n_fail)
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
