"""Join operators: broadcast map-join and partitioned hash join.

The reference's joins are pandas merges in driver memory (validation merge
``am_combiner/__main__.py:566-571``, annotation-pair overlays, feature-cache
lookups — SURVEY.md §2.5).  At scale there are two shapes:

- ``broadcast_join`` — small side ``ray.put`` once, fetched once per worker,
  pandas-merged per batch inside ``map_batches`` (no shuffle),
- ``hash_join`` — both sides large: explicit partitioned hash join; both sides
  get ``bucket = stable_hash(key) % B``, are unioned with a side tag, grouped
  by bucket, and merged with a vectorized pandas merge inside each bucket
  group.  B is the skew knob; hot keys can be salted into sub-buckets by
  raising B.  (Ray's own ``Dataset.join`` exists in recent releases; this
  explicit form keeps the partitioning visible and version-independent.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from entity_resolution_ray.stages.blocking import fetch_broadcast


def _bucket_col(df: pd.DataFrame, on: list[str], num_buckets: int) -> np.ndarray:
    import zlib

    key = df[on[0]].astype(str)
    for c in on[1:]:
        key = key + "\x1f" + df[c].astype(str)
    return np.fromiter(
        (zlib.crc32(k.encode()) % num_buckets for k in key),
        dtype=np.int64,
        count=len(df),
    )


def broadcast_join(big_ds, small_df: pd.DataFrame, on, how: str = "left",
                   batch_size: int = 4096):
    """Join a Dataset with a small pandas frame (broadcast, no shuffle)."""
    on = [on] if isinstance(on, str) else list(on)
    ref = ray.put(small_df)

    def _merge(batch: pd.DataFrame) -> pd.DataFrame:
        small = fetch_broadcast(ref)
        return batch.merge(small, on=on, how=how)

    return big_ds.map_batches(_merge, batch_format="pandas", batch_size=batch_size)


def hash_join(left_ds, right_ds, on, how: str = "inner", num_buckets: int = 64):
    """Partitioned hash join of two Datasets on equal-named key columns."""
    on = [on] if isinstance(on, str) else list(on)

    l_cols = left_ds.schema().names
    r_cols = right_ds.schema().names
    shared = [c for c in r_cols if c in l_cols and c not in on]
    if shared:
        raise ValueError(f"non-key columns appear on both sides: {shared}")

    def _tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["__bucket"] = _bucket_col(batch, on, num_buckets)
            batch["__side"] = side
            return batch

        return fn

    tagged = left_ds.map_batches(_tag("l"), batch_format="pandas").union(
        right_ds.map_batches(_tag("r"), batch_format="pandas")
    )

    out_cols = [c for c in l_cols + r_cols if c not in on]

    def _merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lhs = group[group["__side"] == "l"]
        rhs = group[group["__side"] == "r"]
        lhs = lhs[[c for c in l_cols]]
        rhs = rhs[[c for c in r_cols]]
        merged = lhs.merge(rhs, on=on, how=how)
        return merged[on + [c for c in out_cols if c in merged.columns]]

    return tagged.groupby("__bucket").map_groups(_merge_bucket, batch_format="pandas")
