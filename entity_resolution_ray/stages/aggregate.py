"""High-cardinality grouped aggregation: one bucket shuffle + vectorized
in-bucket pandas groupby.

Ray Data's built-in ``groupby().aggregate(...)`` walks groups in Python in
the sort-shuffle reduce step — fine for hundreds of groups, ~250µs/group at
hundreds of thousands (measured).  For key spaces proportional to the data
(per-order rollups, per-document dedup groups, cluster sizes) this helper
buckets rows by key hash (ONE shuffle, bucket count = knob) and runs a
C-vectorized ``pandas.groupby().agg`` inside each bucket.  Results are exact:
every key lives in exactly one bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_AGG_FNS = {"sum", "count", "min", "max", "mean", "nunique", "first", "size"}


def _add_bucket(batch: pd.DataFrame, on: list[str], num_buckets: int) -> pd.DataFrame:
    h = pd.util.hash_pandas_object(batch[on[0]], index=False).to_numpy()
    for c in on[1:]:
        h = h * np.uint64(31) + pd.util.hash_pandas_object(
            batch[c], index=False
        ).to_numpy()
    batch = batch.copy()
    batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
    return batch


def grouped_aggregate(ds, keys, agg: dict[str, tuple[str, str]],
                      num_buckets: int = 64):
    """ds grouped by ``keys`` with ``agg`` = {out_col: (in_col, fn)}.

    fn ∈ {sum,count,min,max,mean,nunique,first,size} (count/size ignore
    in_col).  Returns one row per distinct key combination.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    for out_col, (in_col, fn) in agg.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported agg fn {fn!r} for {out_col!r}")

    bucketed = ds.map_batches(
        lambda b: _add_bucket(b, keys, num_buckets), batch_format="pandas"
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(keys, sort=False)
        cols = {}
        for out_col, (in_col, fn) in agg.items():
            if fn in ("count", "size"):
                cols[out_col] = g.size()
            else:
                cols[out_col] = getattr(g[in_col], fn)()
        return pd.DataFrame(cols).reset_index()

    return bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")
