"""Distributed analytic aggregates: per-group top-k, exact grouped
percentiles, pivoted conditional counts, and exact distinct counts.

All four follow the same scale discipline as ``grouped_aggregate``: a
vectorized per-batch PARTIAL inside ``map_batches`` shrinks what the shuffle
has to move (≤ k rows per key per block for top-k, one row per distinct
(key, value) per block for percentiles/distinct, one row per key per block
for pivots), then ONE bucket shuffle finishes the job.

Scale assumptions, stated:

* ``grouped_percentiles`` is EXACT and shuffles one row per distinct
  (key, value) pair — the right tier for bounded-cardinality values
  (prices, scores, counts).  For unbounded continuous values switch to a
  two-pass histogram refine (not needed by any current caller).
* ``topk_per_group`` / ``distinct_count`` bucket by key hash; a single hot
  key holds ≤ (k × num_blocks) / ≤ (its distinct values) rows in one task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .aggregate import _add_bucket, grouped_aggregate


def topk_per_group(
    ds,
    keys,
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: list[str] | None = None,
    num_buckets: int = 64,
):
    """Top-``k`` rows per key combination by ``order_col`` (ties broken by
    ``tie_cols`` ascending), with a 1-based ``rn`` rank column.

    Partial top-k inside each block means the shuffle never moves more than
    k rows per (key, block) — the distributed equivalent of
    ``row_number() over (partition by keys order by ...) <= k``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    tie_cols = tie_cols or []
    sort_cols = keys + [order_col] + tie_cols
    ascending = [True] * len(keys) + [not descending] + [True] * len(tie_cols)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        top = s.groupby(keys, sort=False).head(k)
        return _add_bucket(top, keys, num_buckets)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        s = group.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        top = s.groupby(keys, sort=False).head(k).copy()
        top["rn"] = top.groupby(keys, sort=False).cumcount() + 1
        return top.drop(columns="__bucket")

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("__bucket").map_groups(final, batch_format="pandas")


def grouped_percentiles(
    ds,
    keys,
    value_col: str,
    quantiles: dict[str, float],
    round_to: int = 4,
    num_buckets: int = 64,
):
    """Exact ``percentile_cont`` per key: one output row per key combination
    with a column per entry of ``quantiles`` (e.g. {"p50": 0.5, "p90": 0.9})
    plus ``n`` (the group count)."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    counts = grouped_aggregate(
        ds,
        keys + [value_col],
        {"__cnt": (value_col, "size")},
        num_buckets=num_buckets,
    )

    def quantile_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(value_col, kind="mergesort")
        v = g[value_col].to_numpy(np.float64)
        c = g["__cnt"].to_numpy(np.int64).cumsum()
        n = int(c[-1])
        # x[j] (0-based j of the expanded sorted multiset) = v[first i with
        # c[i] > j]; percentile_cont interpolates x[floor(h)]..x[ceil(h)]
        row = {k_: group[k_].iloc[0] for k_ in keys}
        for name, q in quantiles.items():
            h = (n - 1) * q
            lo = int(np.floor(h))
            hi = int(np.ceil(h))
            xlo = v[np.searchsorted(c, lo, side="right")]
            xhi = v[np.searchsorted(c, hi, side="right")]
            row[name] = np.round(xlo + (h - lo) * (xhi - xlo), round_to)
        row["n"] = n
        return pd.DataFrame([row])

    return counts.groupby(keys).map_groups(quantile_group, batch_format="pandas")


def pivot_counts(
    ds,
    keys,
    pivot_col: str,
    values: list[str],
    prefix: str = "n_",
    num_buckets: int = 64,
):
    """Conditional-count pivot: one row per key combination, one int64 column
    ``{prefix}{v}`` per pivot value.  ``values`` is explicit so the output
    schema is static (a scan for distinct values is the caller's choice)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_cols = [f"{prefix}{v}" for v in values]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[batch[pivot_col].isin(values)]
        p = (
            sub.groupby(keys + [pivot_col], sort=False)
            .size()
            .unstack(pivot_col, fill_value=0)
            .reindex(columns=values, fill_value=0)
        )
        p.columns = out_cols
        return p.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    return grouped_aggregate(
        partials,
        keys,
        {c: (c, "sum") for c in out_cols},
        num_buckets=num_buckets,
    )


def distinct_count(
    ds,
    keys,
    value_col: str,
    out_col: str = "n_distinct",
    num_buckets: int = 64,
):
    """Exact COUNT(DISTINCT value) per key: in-batch dedup → one shuffle
    bucketed by hash(keys, value) → per-bucket dedup + per-key partial
    counts → tiny final sum (≤ num_buckets rows per key)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    on = keys + [value_col]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return _add_bucket(batch[on].drop_duplicates(), on, num_buckets)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        d = group[on].drop_duplicates()
        return d.groupby(keys, sort=False).size().rename(out_col).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    per_key_partials = partials.groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas"
    )
    return grouped_aggregate(
        per_key_partials, keys, {out_col: (out_col, "sum")},
        num_buckets=max(8, num_buckets // 4),
    )
