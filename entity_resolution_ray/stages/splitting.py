"""Cluster splitters: negative-evidence post-passes (SURVEY.md §2.10).

Reference semantics (``am_combiner/splitters/common.py``):

- a *negator* is ``(feature, distance)``; within each produced cluster a
  negative adjacency is built (disjoint sets when distance is None, numeric
  ranges farther than ``distance`` otherwise —
  ``am_combiner/utils/adjacency.py:117-172``),
- ``delete_negative_edges``: positive edges minus negative edges, re-run
  connected components within the cluster (``splitters/common.py:181-216``),
- ``colour_negative_edges``: greedy-color the negative subgraph
  (largest-degree-first), isolated nodes go to the color with max mean
  positive weight (``splitters/common.py:130-178``).

Both run distributed as ``groupby(cluster_id).map_groups`` over the cluster
assignment joined with the cluster's candidate pairs — cluster-local work,
like the reference, but clusters processed in parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from entity_resolution_ray import schema as S
from entity_resolution_ray.stages.clustering import union_find
from entity_resolution_ray.utils.hashing import stable_hash64


def _negative_matrix(values: list, distance) -> np.ndarray:
    """Reference negative-adjacency over per-doc value sets."""
    n = len(values)
    neg = np.zeros((n, n), dtype=bool)
    filled = [i for i, v in enumerate(values) if v is not None and len(v)]
    for ai in range(len(filled)):
        for bi in range(ai + 1, len(filled)):
            i, j = filled[ai], filled[bi]
            s1, s2 = set(values[i]), set(values[j])
            if distance is None:
                hit = not (s1 & s2)
            else:
                lo, hi = (s1, s2) if min(s1) <= min(s2) else (s2, s1)
                hit = (min(hi) - max(lo)) > distance
            neg[i, j] = neg[j, i] = hit
    return neg


def _relabel(group: pd.DataFrame, sub: np.ndarray) -> pd.DataFrame:
    ids = group[S.DOC_ID].to_numpy()
    h = np.array([np.uint64(stable_hash64(d)) for d in ids], dtype=np.uint64)
    df = pd.DataFrame({"sub": sub, "h": h})
    rep = df.groupby("sub")["h"].transform("min")
    out = group[[S.DOC_ID, S.BLOCK_KEY]].copy()
    out[S.CLUSTER_ID] = [format(r, "016x") for r in rep]
    return out


def split_clusters(clustered_with_pairs, negator_col: str = "dob_years",
                   distance: int | None = 5, mode: str = "delete"):
    """clustered_with_pairs: Dataset with columns
    (doc_id, block_key, cluster_id, <negator_col>, pos_src, pos_dst, pos_w)
    — see ``attach_cluster_pairs`` below for assembly.  Returns re-split
    (doc_id, block_key, cluster_id).
    """

    def split_group(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(S.DOC_ID, kind="mergesort").reset_index(drop=True)
        n = len(group)
        if n < 2:
            return _relabel(group, np.zeros(n, dtype=np.int64))
        values = list(group[negator_col])
        neg = _negative_matrix(values, distance)
        index = {d: i for i, d in enumerate(group[S.DOC_ID])}
        pos = np.zeros((n, n), dtype=float)
        for plist in group["pairs"]:
            if plist is None:
                continue
            for item in plist:
                a = index.get(item["src"])
                b = index.get(item["dst"])
                if a is None or b is None:
                    continue
                pos[a, b] = pos[b, a] = max(pos[a, b], item["weight"])

        if mode == "delete":
            adj = (pos > 0) & ~neg
            ii, jj = np.where(np.triu(adj, 1))
            sub = union_find(n, ii.astype(np.int64), jj.astype(np.int64))
            return _relabel(group, sub)

        # colour mode: greedy colouring of the negative subgraph
        degree = neg.sum(axis=1)
        order = np.argsort(-degree, kind="stable")
        colors = np.full(n, -1, dtype=np.int64)
        for node in order:
            if degree[node] == 0:
                continue
            used = {colors[nb] for nb in np.flatnonzero(neg[node]) if colors[nb] >= 0}
            c = 0
            while c in used:
                c += 1
            colors[node] = c
        max_color = colors.max() if (colors >= 0).any() else 0
        for node in range(n):
            if colors[node] >= 0:
                continue
            # isolated in the negative graph: colour with max mean positive edge
            means = [
                pos[node, colors == c].mean() if (colors == c).any() else -1.0
                for c in range(max_color + 1)
            ]
            colors[node] = int(np.argmax(means)) if means else 0
        return _relabel(group, colors)

    return clustered_with_pairs.groupby(S.CLUSTER_ID).map_groups(
        split_group, batch_format="pandas"
    )


def attach_cluster_pairs(clustered_ds, edges_ds, negator_col: str = "dob_years"):
    """Assemble the splitter input: per-doc negator values + the accepted
    pairs of its cluster carried as a list column (broadcast of the edge
    table keyed by src — edge tables are cluster-local and small relative to
    docs; a partitioned join replaces this at extreme scale)."""
    import ray

    edf = edges_ds.to_pandas()
    by_src: dict[str, list] = {}
    for row in edf.itertuples():
        by_src.setdefault(row.src, []).append(
            {"src": row.src, "dst": row.dst, "weight": float(row.weight)}
        )
    ref = ray.put(by_src)

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        from entity_resolution_ray.stages.blocking import fetch_broadcast

        m = fetch_broadcast(ref)
        batch = batch.copy()
        batch["pairs"] = [m.get(d, []) for d in batch[S.DOC_ID]]
        return batch

    return clustered_ds.map_batches(attach, batch_format="pandas")
