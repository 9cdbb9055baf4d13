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


def _feature_sets(group: pd.DataFrame) -> list[list]:
    """Per-doc union of the feature columns' values (the reference's
    ``use_features`` extraction for the spectral graph builders)."""
    out = []
    for _, row in group.iterrows():
        vals: list = []
        for col in FEATURE_COLS:
            v = row[col]
            if v is not None:
                vals.extend(v)
        out.append(vals)
    return out


def _tfidf_graph_cosine(group: pd.DataFrame, th: float = 0.5,
                        min_energy: float = -0.25,
                        max_energy: float = 0.65) -> pd.DataFrame:
    """``TFIDFAndGraphCosineSimilarityCombiner`` (``tfidf.py:356-421``):
    cosine(tfidf) + clipped spectral-embedding cosine, threshold → CC."""
    from entity_resolution_ray.stages.spectral import spectral_boost

    group = _sorted(group)
    n = len(group)
    if n < 2:
        return _out(group, np.zeros(n, dtype=np.int64))
    X = _block_vectors(group)
    sim = X @ X.T
    sim = sim + spectral_boost(
        list(group[S.DOC_ID]), list(group[S.ENTITY_NAME]), _feature_sets(group),
        min_energy=min_energy, max_energy=max_energy,
    )
    ii, jj = np.where(np.triu(sim > th, 1))
    return _out(group, _cc_from_edges(n, ii, jj))


def _tfidf_featr_graph_cosine(group: pd.DataFrame, th: float = 0.4,
                              ftr_th: float = 1.0,
                              ftr_max_energy: float = 75.0,
                              graph_node_th: int = 5,
                              min_energy: float = 0.0,
                              max_energy: float = 0.15) -> pd.DataFrame:
    """``TFIDFFeatrGraphCosineSimilarityCombiner`` (``tfidf.py:424-577``):
    spectral re-scoring of big feature-CC subgraphs added to the clipped
    feature boost, then threshold → CC."""
    from entity_resolution_ray.stages.spectral import featr_graph_boost

    group = _sorted(group)
    n = len(group)
    if n < 2:
        return _out(group, np.zeros(n, dtype=np.int64))
    X = _block_vectors(group)
    sim = X @ X.T
    postings = []
    for col in FEATURE_COLS:
        postings.extend(_block_postings(list(group[col]), cap=500))
    fi, fj, fw = _posting_pairs(n, postings)
    feature_adj = np.zeros((n, n), dtype=np.float64)
    feature_adj[fi, fj] = fw
    feature_adj[fj, fi] = fw
    sim = sim + featr_graph_boost(
        list(group[S.DOC_ID]), list(group[S.ENTITY_NAME]), _feature_sets(group),
        feature_adj, ftr_th=ftr_th, ftr_max_energy=ftr_max_energy,
        graph_node_th=graph_node_th, min_energy=min_energy,
        max_energy=max_energy,
    )
    ii, jj = np.where(np.triu(sim > th, 1))
    return _out(group, _cc_from_edges(n, ii, jj))


# --- model-based pair scoring + arbitrary-clusterer hook -------------------
class NumpyLogisticPairModel:
    """Pure-numpy logistic pair classifier — the pickled-sklearn-SVM stand-in
    for ``SklearnClassificationModelBasedCombiner`` (``am_combiner/combiners/
    ml.py:274-345``): ``predict_proba(hstack(v1, v2))[:, 1] > th`` connects a
    pair.  Picklable, loadable from an artifact path in a worker's init."""

    def __init__(self, weights: np.ndarray, bias: float):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = float(bias)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        z = X @ self.weights + self.bias
        p1 = 1.0 / (1.0 + np.exp(-z))
        return np.stack([1.0 - p1, p1], axis=1)

    @classmethod
    def fit(cls, X: np.ndarray, y: np.ndarray, epochs: int = 300,
            lr: float = 0.5) -> "NumpyLogisticPairModel":
        """Deterministic full-batch gradient descent (no RNG)."""
        w = np.zeros(X.shape[1], dtype=np.float64)
        b = 0.0
        yf = y.astype(np.float64)
        for _ in range(epochs):
            p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
            g = p - yf
            w -= lr * (X.T @ g) / len(yf)
            b -= lr * g.mean()
        return cls(w, b)


def project_block_vectors(group: pd.DataFrame, dim: int = 64) -> np.ndarray:
    """Fixed-dim doc vectors from the sparse hashed TF: each hashed term
    index deterministically seeds a random projection row (seed = term
    index), so the feature map is global and stable across blocks — the
    stand-in for the reference's fixed-vocabulary dense TF-IDF rows that a
    pickled pair model expects."""
    rows_idx = list(group["tf_idx"])
    rows_cnt = list(group["tf_cnt"])
    proj: dict[int, np.ndarray] = {}
    out = np.zeros((len(rows_idx), dim), dtype=np.float64)
    for r, (ridx, rcnt) in enumerate(zip(rows_idx, rows_cnt)):
        for t, c in zip(ridx, rcnt):
            p = proj.get(t)
            if p is None:
                p = np.random.default_rng(int(t) % (2**31)).standard_normal(dim)
                proj[t] = p
            out[r] += float(c) * p
        n = np.linalg.norm(out[r])
        if n > 0:
            out[r] /= n
    return out


def make_model_combiner(model, th: float = 0.9, dim: int = 64):
    """Per-block O(n²) pair scoring with a classification model: edge when
    ``predict_proba(hstack(v_i, v_j))[1] > th`` → CC (reference semantics;
    the model object is shipped once per task closure — artifact-sized)."""

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        group = _sorted(group)
        n = len(group)
        if n < 2:
            return _out(group, np.zeros(n, dtype=np.int64))
        X = project_block_vectors(group, dim)
        ii, jj = np.triu_indices(n, 1)
        feats = np.hstack([X[ii], X[jj]])
        prob = model.predict_proba(feats)[:, 1]
        keep = prob > th
        return _out(group, _cc_from_edges(n, ii[keep], jj[keep]))

    return combine


def make_clustering_algo_combiner(algorithm, *args, **kwargs):
    """``TFIDFCombinerWithClusteringAlgo`` (``tfidf.py:119-164``): any object
    factory whose instance has ``fit_predict(dense_matrix) -> labels``
    clusters each block's TF vectors."""

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        group = _sorted(group)
        n = len(group)
        if n < 2:
            return _out(group, np.zeros(n, dtype=np.int64))
        X = _block_vectors(group)
        labels = np.asarray(
            algorithm(*args, **kwargs).fit_predict(X), dtype=np.int64
        )
        return _out(group, labels)

    return combine


# --- registry + runner -----------------------------------------------------
def _gcn(group: pd.DataFrame, **kw) -> pd.DataFrame:
    from entity_resolution_ray.stages.gcn import gcn_combine

    return gcn_combine(group, **kw)


def _gcn_hetero(group: pd.DataFrame, **kw) -> pd.DataFrame:
    from entity_resolution_ray.stages.gcn import gcn_hetero_combine

    return gcn_hetero_combine(group, **kw)


def _gcn_lc(group: pd.DataFrame, **kw) -> pd.DataFrame:
    from entity_resolution_ray.stages.gcn import gcn_lc_combine

    return gcn_lc_combine(group, **kw)


COMBINERS = {
    "current_production": _current_production,
    "connected_components": _connected_components,
    "pairwise_incremental": _pairwise_incremental,
    "centroid_incremental": _centroid_incremental,
    "kmeans": _kmeans,
    "fastrp": _fastrp,
    "tfidf_graph_cosine": _tfidf_graph_cosine,
    "tfidf_featr_graph_cosine": _tfidf_featr_graph_cosine,
    "gcn": _gcn,
    "gcn_hetero": _gcn_hetero,
    "gcn_lc": _gcn_lc,
}


def run_combiner(featured_ds, name, **kwargs):
    """groupby(block_key) → per-block combiner → (doc_id, block_key, cluster_id).

    ``name``: registry key OR a group-callable (e.g. from
    ``make_model_combiner`` / ``make_clustering_algo_combiner``)."""
    fn = COMBINERS[name] if isinstance(name, str) else name

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        return fn(group, **kwargs) if kwargs else fn(group)

    cols = [S.DOC_ID, S.ENTITY_NAME, S.BLOCK_KEY, "tf_idx", "tf_cnt", *FEATURE_COLS]
    return featured_ds.select_columns(cols).groupby(S.BLOCK_KEY).map_groups(
        apply, batch_format="pandas"
    )


def _member(sorted_keys: np.ndarray, probe: np.ndarray) -> np.ndarray:
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=bool)
    idx = np.minimum(np.searchsorted(sorted_keys, probe), len(sorted_keys) - 1)
    return sorted_keys[idx] == probe


def annotations_overlay(edges_ds, labeled_pairs_df: pd.DataFrame,
                        th: float = 0.6):
    """Human annotations overwrite scored pairs: Yes → accepted, No → rejected
    (``am_combiner/combiners/annotation.py:41-67``); unlabeled pairs keep the
    score threshold.

    Vectorized (VERDICT r2 #3), Arrow-side: the annotation ids (a small,
    human-labeled set) are broadcast once as an Arrow value set; each batch
    resolves both endpoints with ``pc.index_in`` (C-speed hash membership, no
    Python string objects), mixes the two small int codes into an
    order-insensitive pair key, and looks it up in the sorted yes/no key
    arrays with ``np.searchsorted``.  No per-row loop, no per-string hashing
    of the (pairs-proportional) edge table beyond the index_in probe."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    ids = pd.unique(
        np.concatenate(
            [np.asarray(labeled_pairs_df["doc_a"], dtype=object),
             np.asarray(labeled_pairs_df["doc_b"], dtype=object)]
        )
    )
    pos = {v: i for i, v in enumerate(ids)}
    n_ids = np.int64(len(ids))
    ca = np.array([pos[v] for v in labeled_pairs_df["doc_a"]], dtype=np.int64)
    cb = np.array([pos[v] for v in labeled_pairs_df["doc_b"]], dtype=np.int64)
    keys = np.minimum(ca, cb) * n_ids + np.maximum(ca, cb)
    m = labeled_pairs_df["is_match"].to_numpy().astype(bool)
    ref = ray.put(
        (np.sort(keys[m]), np.sort(keys[~m]), pa.array(ids, pa.string()))
    )

    def overlay(batch: pa.Table) -> pa.Table:
        from entity_resolution_ray.stages.blocking import fetch_broadcast

        y, n_, id_set = fetch_broadcast(ref)
        acc = pc.greater(batch["score"], th).to_numpy(zero_copy_only=False)
        cs = pc.fill_null(pc.index_in(batch["src"], value_set=id_set), -1)
        cd = pc.fill_null(pc.index_in(batch["dst"], value_set=id_set), -1)
        cs = cs.to_numpy(zero_copy_only=False).astype(np.int64)
        cd = cd.to_numpy(zero_copy_only=False).astype(np.int64)
        both = (cs >= 0) & (cd >= 0)
        probe = np.minimum(cs, cd) * n_ids + np.maximum(cs, cd)
        # reference precedence: a pair labeled both ways resolves Yes
        # (annotation.py's if/elif reads the Yes set first)
        acc[both & _member(n_, probe)] = False
        acc[both & _member(y, probe)] = True
        acc &= ~batch["neg_dob"].to_numpy(zero_copy_only=False)
        col = pa.array(acc)
        if "accepted" in batch.column_names:
            return batch.set_column(
                batch.column_names.index("accepted"), "accepted", col
            )
        return batch.append_column("accepted", col)

    return edges_ds.map_batches(overlay, batch_format="pyarrow")
