"""Side-by-side parity harness: run each Ray query and its DuckDB oracle,
compare row count, column names, and order-insensitive values (mimics the
driver's check).  Usage: python tools/parity_check.py [sf_dir] [query ...]."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(mine: pd.DataFrame, oracle: pd.DataFrame) -> str:
    if sorted(mine.columns) != sorted(oracle.columns):
        return f"SCHEMA MISMATCH mine={sorted(mine.columns)} oracle={sorted(oracle.columns)}"
    if len(mine) != len(oracle):
        return f"ROWCOUNT {len(mine)} vs {len(oracle)}"
    a, b = canon(mine), canon(oracle)
    if a.equals(b):
        return "OK"
    # locate first differing cell for debugging
    for c in a.columns:
        neq = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
        if neq.any():
            i = int(np.flatnonzero(neq)[0])
            return f"VALUE DIFF col={c} row={i}: {a[c][i]!r} vs {b[c][i]!r}"
    return "DIFF (unlocated)"


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf}/{t}.parquet'")

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = fn(sf)
            if hasattr(mine, "to_pandas"):
                mine = mine.to_pandas()
            elif hasattr(mine, "to_pydict"):
                mine = mine.to_pandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} RAY ERROR: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows={len(mine):7d}  ({dt:5.1f}s)  [rows-only]")
            continue
        try:
            oracle = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ORACLE ERROR: {e}")
            continue
        print(f"{name:28s} rows={len(mine):7d}  ({dt:5.1f}s)  {compare(mine, oracle)}")

    ray.shutdown()


if __name__ == "__main__":
    main()
