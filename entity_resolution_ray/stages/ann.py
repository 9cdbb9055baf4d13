"""Approximate-nearest-neighbor search over an embedding column.

Two tiers:

- ``brute_force_topk`` — exact cosine top-k per query: the query matrix is
  normalized once and broadcast (``ray.put``); every data batch does one
  float64 matmul against it and emits its local top-k per query; a final
  small ``groupby(query_id)`` merge keeps the global top-k.  This streams the
  corpus — nothing data-sized is materialized.
- ``lsh_topk`` — scale path: random-hyperplane LSH buckets (signed projections
  → bucket key), candidates searched only within matching buckets across a
  few probe tables.  Recall/probe tradeoff documented per call.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from entity_resolution_ray.stages.blocking import fetch_broadcast


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(emb_ds, query_ids: np.ndarray, query_mat: np.ndarray,
                     k: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding", exclude_self: bool = True):
    """(query_id, neighbor_id, cosine) — exact top-k by streamed matmul."""
    Q = _normalize(query_mat)
    qref = ray.put((np.asarray(query_ids), Q))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qmat = fetch_broadcast(qref)
        rows = _normalize(np.stack(batch[vec_col].to_list()))
        ids = batch[id_col].to_numpy()
        sims = qmat @ rows.T  # (n_query, n_batch)
        out_q, out_n, out_c = [], [], []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != qids[qi]
            cand = np.flatnonzero(mask)
            if len(cand) == 0:
                continue
            top = cand[np.argsort(-s[cand], kind="stable")[:k]]
            out_q.extend([qids[qi]] * len(top))
            out_n.extend(ids[top].tolist())
            out_c.extend(np.round(s[top], 6).tolist())
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
        )

    partials = emb_ds.map_batches(local_topk, batch_format="pandas", batch_size=4096)

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    return partials.groupby("query_id").map_groups(merge_topk, batch_format="pandas")


def lsh_topk(emb_ds, query_ids: np.ndarray, query_mat: np.ndarray, k: int = 5,
             num_planes: int = 8, num_tables: int = 4, seed: int = 11,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate top-k: random-hyperplane buckets, search matching buckets.

    A vector lands in ``num_tables`` buckets (one per hash table); queries are
    compared only against co-bucketed vectors, so cost drops from O(N) to
    O(N · P[bucket match]) per query at some recall loss.
    """
    dim = query_mat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    Q = _normalize(query_mat)
    qsig = (np.einsum("tpd,qd->tqp", planes, Q) > 0)
    qref = ray.put((np.asarray(query_ids), Q, planes, qsig))

    def local_candidates(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qmat, pl, qs = fetch_broadcast(qref)
        rows = _normalize(np.stack(batch[vec_col].to_list()))
        ids = batch[id_col].to_numpy()
        rsig = np.einsum("tpd,nd->tnp", pl, rows) > 0
        out_q, out_n, out_c = [], [], []
        for qi in range(len(qids)):
            # candidate = co-bucketed in ANY table
            match = np.zeros(len(ids), dtype=bool)
            for t in range(pl.shape[0]):
                match |= (rsig[t] == qs[t, qi]).all(axis=1)
            match &= ids != qids[qi]
            cand = np.flatnonzero(match)
            if len(cand) == 0:
                continue
            sims = rows[cand] @ qmat[qi]
            top = np.argsort(-sims, kind="stable")[:k]
            out_q.extend([qids[qi]] * len(top))
            out_n.extend(ids[cand[top]].tolist())
            out_c.extend(np.round(sims[top], 6).tolist())
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
        )

    partials = emb_ds.map_batches(
        local_candidates, batch_format="pandas", batch_size=4096
    )

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    return partials.groupby("query_id").map_groups(merge_topk, batch_format="pandas")
