"""Approximate-nearest-neighbor search over an embedding column.

Three tiers:

- ``brute_force_topk`` — exact cosine top-k per query: the query matrix is
  normalized once and broadcast (``ray.put``); every data batch does one
  float64 matmul against it and emits its local top-k per query; a final
  small ``groupby(query_id)`` merge keeps the global top-k.  This streams the
  corpus — nothing data-sized is materialized.
- ``lsh_topk`` — random-hyperplane LSH buckets (signed projections → bucket
  key), candidates searched only within matching buckets across a few probe
  tables.  Recall/probe tradeoff documented per call.  Still a streamed
  filter: every block is scanned, just with cheap bit-compares first.
- ``fit_ivf_centroids`` / ``build_ivf_index`` / ``ivf_topk`` — the true
  index-probing tier: spherical k-means centroids fit on a deterministic
  hash sample, corpus written ONCE as parquet partitioned by nearest-centroid
  list, queries probe only their ``nprobe`` closest lists — the read prunes
  to the probed partitions, so per-query cost is O(N · nprobe / nlist)
  *including I/O*, not just compute.  This is the 100-TB shape: the index
  build is one pass + one partitioned write, amortized over every query
  batch that follows.
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


# --- IVF tier ---------------------------------------------------------------

def _hash_sample_mask(ids: np.ndarray, rate_denom: int) -> np.ndarray:
    """Deterministic 1/rate_denom sample by id hash (splittable, seed-free)."""
    h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
    return (h % np.uint64(rate_denom)) == 0


def fit_ivf_centroids(emb_ds, nlist: int = 16, sample_cap: int = 65536,
                      iters: int = 10, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> np.ndarray:
    """Spherical k-means centroids fit on a bounded deterministic sample.

    The sample is a hash filter pushed into ``map_batches`` (only sampled rows
    reach the driver, bounded by ``sample_cap``); init is the first ``nlist``
    sampled vectors in id order — fully deterministic, no RNG.  Lloyd updates
    assign by max dot product and renormalize the means (cosine geometry).
    """
    n_total = emb_ds.count()
    rate = max(1, n_total // sample_cap)

    def sample(batch: pd.DataFrame) -> pd.DataFrame:
        m = _hash_sample_mask(batch[id_col].to_numpy(), rate)
        return batch.loc[m, [id_col, vec_col]]

    sdf = emb_ds.map_batches(sample, batch_format="pandas").to_pandas()
    sdf = sdf.sort_values(id_col, kind="mergesort").head(sample_cap)
    X = _normalize(np.stack(sdf[vec_col].to_list()))
    nlist = min(nlist, len(X))
    C = X[:nlist].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(nlist):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = _normalize(C)
    return C


def build_ivf_index(emb_ds, out_dir: str, centroids: np.ndarray,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """One streamed pass assigning each vector to its nearest-centroid list,
    written as parquet partitioned by ``ivf_list`` — the on-disk inverted
    index.  Queries later read ONLY their probed ``ivf_list=`` directories."""
    cref = ray.put(centroids)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        C = fetch_broadcast(cref)
        rows = _normalize(np.stack(batch[vec_col].to_list()))
        batch = batch[[id_col, vec_col]].copy()
        lists = np.argmax(rows @ C.T, axis=1).astype(np.int32)
        # ivf_list becomes the hive partition (dropped from file contents);
        # list_id stays inside the files so probe masks need no path parsing
        batch["ivf_list"] = lists
        batch["list_id"] = lists
        return batch

    assigned = emb_ds.map_batches(assign, batch_format="pandas")
    assigned.write_parquet(out_dir, partition_cols=["ivf_list"])
    return out_dir


def ivf_topk(index_dir: str, centroids: np.ndarray, query_ids: np.ndarray,
             query_mat: np.ndarray, k: int = 5, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True):
    """(query_id, neighbor_id, cosine) — probe only the ``nprobe`` closest
    lists per query.  The union of probed partitions is what gets READ;
    within a batch each query is compared only against rows of lists it
    probes (vectorized isin mask)."""
    import glob
    import os

    Q = _normalize(query_mat)
    probes = np.argsort(-(Q @ centroids.T), axis=1, kind="stable")[:, :nprobe]
    probed_lists = sorted({int(l) for row in probes for l in row})
    paths = [
        f for l in probed_lists
        for f in sorted(glob.glob(os.path.join(index_dir, f"ivf_list={l}", "*")))
        if f.endswith((".parquet", ".pq")) or os.path.isfile(f)
    ]
    qref = ray.put((np.asarray(query_ids), Q, probes))

    ds = ray.data.read_parquet(paths)

    def local_topk(batch: pd.DataFrame, lists: np.ndarray = None) -> pd.DataFrame:
        qids, qmat, qprobes = fetch_broadcast(qref)
        rows = _normalize(np.stack(batch[vec_col].to_list()))
        ids = batch[id_col].to_numpy()
        row_list = batch["list_id"].to_numpy().astype(np.int64)
        sims = qmat @ rows.T
        out_q, out_n, out_c = [], [], []
        for qi in range(len(qids)):
            mask = np.isin(row_list, qprobes[qi])
            if exclude_self:
                mask &= ids != qids[qi]
            cand = np.flatnonzero(mask)
            if len(cand) == 0:
                continue
            s = sims[qi]
            top = cand[np.argsort(-s[cand], kind="stable")[:k]]
            out_q.extend([qids[qi]] * len(top))
            out_n.extend(ids[top].tolist())
            out_c.extend(np.round(s[top], 6).tolist())
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
        )

    partials = ds.map_batches(local_topk, batch_format="pandas", batch_size=4096)

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    return partials.groupby("query_id").map_groups(merge_topk, batch_format="pandas")
