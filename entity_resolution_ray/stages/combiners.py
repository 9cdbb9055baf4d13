"""Per-block clustering combiners beyond the flagship (SURVEY.md §2.9).

Each combiner takes the *featured* documents Dataset and yields
``(doc_id, block_key, cluster_id)`` — the reference's combiner contract
(``am_combiner/combiners/common.py:114-136``) expressed as
``groupby(block_key).map_groups`` over Arrow-fed pandas groups, with the same
per-combiner semantics:

- ``current_production``     — all mentions of a name → one cluster
  (``am_combiner/combiners/simple.py:7-38``)
- ``connected_components``   — feature-intersection weight ≥ th → CC
  (``am_combiner/combiners/graph_based.py:12-69``)
- ``pairwise_incremental``   — online fold: join the cluster of the most
  similar earlier mention if sim ≥ th, else open a new cluster; input order =
  doc_id sort for determinism
  (``am_combiner/combiners/incremental_clustering.py:112-160``)
- ``centroid_incremental``   — same against running cluster centroids
  (``incremental_clustering.py:163-210``)
- ``kmeans``                 — k sweep 2..min(n-1,10), best silhouette;
  blocks of ≤3 mentions → singletons (``am_combiner/combiners/tfidf.py:20-78``;
  numpy re-implementation, no sklearn here)
- ``fastrp``                 — deterministic random projection (seed hashed
  from the record id), 3-hop normalized-adjacency propagation, cosine > th →
  CC (``am_combiner/combiners/fastRP.py:16-156``)
- ``annotations``            — flagship edges overwritten by labeled pairs
  (Yes→1 / No→0) before CC (``am_combiner/combiners/annotation.py:11-100``)

The registry at the bottom mirrors the reference's combiner mapping
(``am_combiner/combiners/mapping.py:25-42``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from entity_resolution_ray import schema as S
from entity_resolution_ray.stages.blocking import FEATURE_COLS, _block_postings, _posting_pairs
from entity_resolution_ray.utils.hashing import stable_hash64

OUT_COLS = [S.DOC_ID, S.BLOCK_KEY, S.CLUSTER_ID]


def _out(group: pd.DataFrame, local_ids: np.ndarray) -> pd.DataFrame:
    """Local per-block cluster ids → globally unique stable string ids
    (min doc-id hash per local cluster, like the flagship)."""
    ids = group[S.DOC_ID].to_numpy()
    df = pd.DataFrame({"doc": ids, "local": local_ids})
    h = np.array([np.uint64(stable_hash64(d)) for d in ids], dtype=np.uint64)
    df["h"] = h
    rep = df.groupby("local")["h"].transform("min")
    return pd.DataFrame(
        {
            S.DOC_ID: ids,
            S.BLOCK_KEY: group[S.BLOCK_KEY].to_numpy(),
            S.CLUSTER_ID: [format(r, "016x") for r in rep],
        }
    )


def _sorted(group: pd.DataFrame) -> pd.DataFrame:
    return group.sort_values(S.DOC_ID, kind="mergesort").reset_index(drop=True)


def _block_vectors(group: pd.DataFrame) -> np.ndarray:
    """Dense L2-normalized TF matrix over the block-local vocabulary."""
    vocab: dict[int, int] = {}
    rows_idx = list(group["tf_idx"])
    rows_cnt = list(group["tf_cnt"])
    for r in rows_idx:
        for t in r:
            if t not in vocab:
                vocab[t] = len(vocab)
    X = np.zeros((len(group), max(len(vocab), 1)), dtype=np.float64)
    for i, (ridx, rcnt) in enumerate(zip(rows_idx, rows_cnt)):
        if len(ridx) == 0:
            continue
        cols = [vocab[t] for t in ridx]
        vals = np.asarray(rcnt, dtype=np.float64)
        norm = np.sqrt((vals * vals).sum())
        X[i, cols] = vals / norm if norm > 0 else vals
    return X


def _cc_from_edges(n: int, i_idx, j_idx) -> np.ndarray:
    from entity_resolution_ray.stages.clustering import union_find

    return union_find(n, np.asarray(i_idx, np.int64), np.asarray(j_idx, np.int64))


# --- combiner group functions ----------------------------------------------
def _current_production(group: pd.DataFrame) -> pd.DataFrame:
    group = _sorted(group)
    return _out(group, np.zeros(len(group), dtype=np.int64))


def _connected_components(group: pd.DataFrame, th: float = 1.0) -> pd.DataFrame:
    group = _sorted(group)
    n = len(group)
    postings = []
    for col in FEATURE_COLS:
        postings.extend(_block_postings(list(group[col]), cap=500))
    i, j, w = _posting_pairs(n, postings)
    keep = w >= th
    return _out(group, _cc_from_edges(n, i[keep], j[keep]))


def _pairwise_incremental(group: pd.DataFrame, th: float = 0.3) -> pd.DataFrame:
    group = _sorted(group)
    X = _block_vectors(group)
    n = len(group)
    labels = np.full(n, -1, dtype=np.int64)
    next_label = 0
    for i in range(n):
        if i == 0:
            labels[i] = next_label
            next_label += 1
            continue
        sims = X[:i] @ X[i]
        best = int(np.argmax(sims))
        if sims[best] >= th:
            labels[i] = labels[best]
        else:
            labels[i] = next_label
            next_label += 1
    return _out(group, labels)


def _centroid_incremental(group: pd.DataFrame, th: float = 0.3) -> pd.DataFrame:
    group = _sorted(group)
    X = _block_vectors(group)
    n = len(group)
    labels = np.full(n, -1, dtype=np.int64)
    centroids: list[np.ndarray] = []
    counts: list[int] = []
    for i in range(n):
        if centroids:
            C = np.stack(centroids)
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
            sims = Cn @ X[i]
            best = int(np.argmax(sims))
        else:
            best, sims = -1, None
        if best >= 0 and sims[best] >= th:
            labels[i] = best
            centroids[best] = centroids[best] + X[i]
            counts[best] += 1
        else:
            labels[i] = len(centroids)
            centroids.append(X[i].copy())
            counts.append(1)
    return _out(group, labels)


def _kmeans_once(X: np.ndarray, k: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = X[rng.choice(len(X), size=k, replace=False)]
    labels = np.zeros(len(X), dtype=np.int64)
    for _ in range(20):
        d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        new_labels = d.argmin(axis=1)
        if (new_labels == labels).all():
            break
        labels = new_labels
        for c in range(k):
            members = X[labels == c]
            if len(members):
                centers[c] = members.mean(axis=0)
    return labels


def _silhouette(X: np.ndarray, labels: np.ndarray) -> float:
    n = len(X)
    d = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2))
    score = 0.0
    for i in range(n):
        same = labels == labels[i]
        same[i] = False
        a = d[i, same].mean() if same.any() else 0.0
        bs = [
            d[i, labels == c].mean()
            for c in np.unique(labels)
            if c != labels[i]
        ]
        b = min(bs) if bs else 0.0
        denom = max(a, b)
        score += (b - a) / denom if denom > 0 else 0.0
    return score / n


def _kmeans(group: pd.DataFrame, max_k: int = 10) -> pd.DataFrame:
    group = _sorted(group)
    n = len(group)
    if n <= 3:
        return _out(group, np.arange(n, dtype=np.int64))
    X = _block_vectors(group)
    seed = stable_hash64(group[S.DOC_ID].iloc[0]) % (2**31)
    best_labels, best_score = None, -2.0
    for k in range(2, min(n - 1, max_k) + 1):
        labels = _kmeans_once(X, k, seed)
        if len(np.unique(labels)) < 2:
            continue
        s = _silhouette(X, labels)
        if s > best_score:
            best_score, best_labels = s, labels
    if best_labels is None:
        best_labels = np.zeros(n, dtype=np.int64)
    return _out(group, best_labels)


def _fastrp(group: pd.DataFrame, th: float = 0.7, dim: int = 64,
            hops: int = 3) -> pd.DataFrame:
    group = _sorted(group)
    n = len(group)
    postings = []
    for col in FEATURE_COLS:
        postings.extend(_block_postings(list(group[col]), cap=500))
    i, j, w = _posting_pairs(n, postings)
    A = np.zeros((n, n))
    A[i, j] = w
    A[j, i] = w
    deg = np.maximum(A.sum(axis=1, keepdims=True), 1e-12)
    A_norm = A / deg
    # deterministic per-record projections: seed = hash(doc_id) (the
    # reference's reproducibility pattern, fastRP.py:60-67)
    R = np.stack(
        [
            np.random.default_rng(stable_hash64(d) % (2**31)).choice(
                [-1.0, 0.0, 1.0], size=dim, p=[1 / 6, 2 / 3, 1 / 6]
            )
            for d in group[S.DOC_ID]
        ]
    )
    emb = R.copy()
    acc = np.zeros_like(R)
    for _ in range(hops):
        emb = A_norm @ emb
        acc += emb
    norms = np.maximum(np.linalg.norm(acc, axis=1, keepdims=True), 1e-12)
    E = acc / norms
    sim = E @ E.T
    ii, jj = np.where(np.triu(sim > th, 1))
    return _out(group, _cc_from_edges(n, ii, jj))


# --- registry + runner -----------------------------------------------------
COMBINERS = {
    "current_production": _current_production,
    "connected_components": _connected_components,
    "pairwise_incremental": _pairwise_incremental,
    "centroid_incremental": _centroid_incremental,
    "kmeans": _kmeans,
    "fastrp": _fastrp,
}


def run_combiner(featured_ds, name: str, **kwargs):
    """groupby(block_key) → per-block combiner → (doc_id, block_key, cluster_id)."""
    fn = COMBINERS[name]

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        return fn(group, **kwargs) if kwargs else fn(group)

    cols = [S.DOC_ID, S.BLOCK_KEY, "tf_idx", "tf_cnt", *FEATURE_COLS]
    return featured_ds.select_columns(cols).groupby(S.BLOCK_KEY).map_groups(
        apply, batch_format="pandas"
    )


def annotations_overlay(edges_ds, labeled_pairs_df: pd.DataFrame,
                        th: float = 0.6):
    """Human annotations overwrite scored pairs: Yes → accepted, No → rejected
    (``am_combiner/combiners/annotation.py:41-67``); unlabeled pairs keep the
    score threshold."""
    import ray

    import pyarrow as pa

    yes = set()
    no = set()
    for a, b, m in zip(
        labeled_pairs_df["doc_a"], labeled_pairs_df["doc_b"],
        labeled_pairs_df["is_match"],
    ):
        key = (a, b) if a <= b else (b, a)
        (yes if m else no).add(key)
    ref = ray.put((yes, no))

    def overlay(batch: pd.DataFrame) -> pd.DataFrame:
        from entity_resolution_ray.stages.blocking import fetch_broadcast

        y, n_ = fetch_broadcast(ref)
        out = batch.copy()
        acc = out["score"].to_numpy() > th
        src = out["src"].to_numpy()
        dst = out["dst"].to_numpy()
        for i in range(len(out)):
            key = (src[i], dst[i]) if src[i] <= dst[i] else (dst[i], src[i])
            if key in y:
                acc[i] = True
            elif key in n_:
                acc[i] = False
        out["accepted"] = acc & ~out["neg_dob"].to_numpy()
        return out

    return edges_ds.map_batches(overlay, batch_format="pandas")
