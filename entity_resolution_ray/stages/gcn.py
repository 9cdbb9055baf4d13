"""Numpy GCN combiner tier (SURVEY.md §2.9).

Reference analogues, torch/DGL-free (neither is in this container):

- ``GCNCombiner`` (``am_combiner/combiners/ml.py:65-209``): one SAGEConv
  ``mean`` layer with LeakyReLU over the homogeneous multi-feature adjacency
  (``features/nn/common.py:69-108``, ``utils/adjacency.py:27-114``), cosine
  of L2-normalized node embeddings, threshold → connected components.
- ``GCNHeteroCombiner`` (``ml.py:212-234``): one SAGEConv per edge-feature
  relation with ReLU (``HeteroGraphConv(aggregate="mean")``,
  ``common.py:111-170``), relation outputs averaged.
- ``GCNCombinerWithLinearCombination`` (``ml.py:237-271``): hetero embedding
  cosine blended with the TF-IDF cosine through a pretrained logistic
  linear-combination model; its ``th`` overrides the config threshold but the
  large-cluster bump still applies (inherited ``_get_adjacency_from_
  similarities``).

The reference loads pickled pretrained weights from S3; here the layer
weights come from fixed-seeded RNG (the FastRP reproducibility pattern,
``combiners.py _fastrp``) — deterministic across blocks, workers and runs.
DGL's SAGEConv with ``edge_weight`` computes
``h'_i = act(W_self h_i + W_neigh · mean_{j∈N(i)}(w_ij h_j))`` where the mean
divides by in-degree (message count), reproduced exactly below.

Large-cluster thresholding: blocks larger than ``LARGE_CLUSTER_LIMIT`` get
``LARGE_CLUSTER_TH_BUMP_UP`` added to the threshold (``ml.py:27-28,178-187``)
— large blocks accumulate false-positive connections proportional to size.

All three run block-local inside ``groupby(block_key).map_groups`` like every
other combiner — the per-block O(n²) similarity is the reference's own
contract, and oversized blocks are defused upstream by the blockers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from entity_resolution_ray.stages.blocking import FEATURE_COLS, _block_postings, _posting_pairs
from entity_resolution_ray.utils.hashing import stable_hash64

LARGE_CLUSTER_TH_BUMP_UP = 0.02
LARGE_CLUSTER_LIMIT = 400


def _layer_weights(label: str, in_dim: int, out_dim: int) -> np.ndarray:
    """Deterministic Xavier-ish init seeded from the layer label."""
    rng = np.random.default_rng(stable_hash64(label) % (2**31))
    return rng.standard_normal((in_dim, out_dim)) / np.sqrt(in_dim)


def _leaky_relu(x: np.ndarray, slope: float = 0.01) -> np.ndarray:
    return np.where(x > 0, x, slope * x)


def _relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def sage_layer(H: np.ndarray, A: np.ndarray, w_self: np.ndarray,
               w_neigh: np.ndarray, act) -> np.ndarray:
    """DGL SAGEConv("mean") with edge weights: weighted message sum divided
    by in-degree (message COUNT, not weight sum), plus the self channel."""
    indeg = np.maximum((A > 0).sum(axis=1, keepdims=True), 1)
    neigh = (A @ H) / indeg
    return act(H @ w_self + neigh @ w_neigh)


def _feature_adjacency(group: pd.DataFrame, cols=FEATURE_COLS,
                       cap: int = 500) -> list[np.ndarray]:
    """One symmetric intersection-count adjacency per feature column
    (``get_article_multi_feature_adjacency(as_list=True)`` semantics)."""
    n = len(group)
    mats = []
    for col in cols:
        i, j, w = _posting_pairs(n, _block_postings(list(group[col]), cap=cap))
        A = np.zeros((n, n), dtype=np.float64)
        A[i, j] = w
        A[j, i] = w
        mats.append(A)
    return mats


def _ensure_nonempty(mats: list[np.ndarray]) -> list[np.ndarray]:
    """The reference's empty-graph hack (``common.py:97-101,139-144``): a
    single (0,0) self-edge on the first relation when no edges exist."""
    if all(A.sum() == 0 for A in mats):
        mats[0] = mats[0].copy()
        mats[0][0, 0] = 1.0
    return mats


def _l2_rows(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def adjacency_from_similarities(sim: np.ndarray, th: float) -> np.ndarray:
    """``_get_adjacency_from_similarities`` (``ml.py:160-187``) with the
    large-cluster threshold bump."""
    th_addon = LARGE_CLUSTER_TH_BUMP_UP if sim.shape[0] > LARGE_CLUSTER_LIMIT else 0.0
    return (sim > th + th_addon).astype(np.float64)


def gcn_embed(group: pd.DataFrame, dim: int = 64, rep_dim: int = 32) -> np.ndarray:
    """Homogeneous one-layer SAGE embedding of a block (LeakyReLU)."""
    from entity_resolution_ray.stages.combiners import project_block_vectors

    H = project_block_vectors(group, dim)
    A = _ensure_nonempty([sum(_feature_adjacency(group))])[0]
    w_self = _layer_weights("gcn_homo_self", dim, rep_dim)
    w_neigh = _layer_weights("gcn_homo_neigh", dim, rep_dim)
    return sage_layer(H, A, w_self, w_neigh, _leaky_relu)


def gcn_hetero_embed(group: pd.DataFrame, dim: int = 64,
                     rep_dim: int = 32) -> np.ndarray:
    """Heterogeneous embedding: one ReLU SAGE layer per feature relation,
    relation outputs mean-aggregated (``HeteroGraphConv(aggregate="mean")``)."""
    from entity_resolution_ray.stages.combiners import project_block_vectors

    H = project_block_vectors(group, dim)
    mats = _ensure_nonempty(_feature_adjacency(group))
    outs = []
    for col, A in zip(FEATURE_COLS, mats):
        w_self = _layer_weights(f"gcn_het_self_{col}", dim, rep_dim)
        w_neigh = _layer_weights(f"gcn_het_neigh_{col}", dim, rep_dim)
        outs.append(sage_layer(H, A, w_self, w_neigh, _relu))
    return np.mean(outs, axis=0)


def _cluster_from_sim(group: pd.DataFrame, sim: np.ndarray, th: float) -> pd.DataFrame:
    from entity_resolution_ray.stages.combiners import _cc_from_edges, _out

    adj = adjacency_from_similarities(sim, th)
    ii, jj = np.where(np.triu(adj, 1))
    return _out(group, _cc_from_edges(len(group), ii, jj))


def gcn_combine(group: pd.DataFrame, th: float = 0.85, dim: int = 64,
                rep_dim: int = 32) -> pd.DataFrame:
    """``GCNCombiner.combine_entities`` (``ml.py:189-209``)."""
    from entity_resolution_ray.stages.combiners import _sorted

    group = _sorted(group)
    if len(group) < 2:
        return _cluster_from_sim(group, np.ones((len(group), len(group))), th)
    E = _l2_rows(gcn_embed(group, dim, rep_dim))
    return _cluster_from_sim(group, E @ E.T, th)


def gcn_hetero_combine(group: pd.DataFrame, th: float = 0.85, dim: int = 64,
                       rep_dim: int = 32) -> pd.DataFrame:
    """``GCNHeteroCombiner`` — hetero embedding, same clustering tail."""
    from entity_resolution_ray.stages.combiners import _sorted

    group = _sorted(group)
    if len(group) < 2:
        return _cluster_from_sim(group, np.ones((len(group), len(group))), th)
    E = _l2_rows(gcn_hetero_embed(group, dim, rep_dim))
    return _cluster_from_sim(group, E @ E.T, th)


# Deterministic stand-in for the pickled linear-combination model
# (``ml.py:252-258``): logistic over [tfidf_cosine, gcn_cosine].  Symmetric
# weights; prob > 0.5 exactly when tfidf_sim + gcn_sim > 1.
LC_WEIGHTS = np.array([2.5, 2.5])
LC_BIAS = -2.5


def gcn_lc_combine(group: pd.DataFrame, th: float = 0.6, dim: int = 64,
                   rep_dim: int = 32) -> pd.DataFrame:
    """``GCNCombinerWithLinearCombination._enhance_pairwise_similarities``
    (``ml.py:260-271``): hstack(tfidf_sim, gcn_sim) → lc.predict_proba[:, 1],
    reshaped back to (n, n); explicit ``th`` replaces the config threshold."""
    from entity_resolution_ray.stages.combiners import (
        NumpyLogisticPairModel,
        _block_vectors,
        _sorted,
    )

    group = _sorted(group)
    n = len(group)
    if n < 2:
        return _cluster_from_sim(group, np.ones((n, n)), th)
    E = _l2_rows(gcn_hetero_embed(group, dim, rep_dim))
    gcn_sim = E @ E.T
    X = _block_vectors(group)
    tfidf_sim = X @ X.T
    lc = NumpyLogisticPairModel(LC_WEIGHTS, LC_BIAS)
    mini = np.stack([tfidf_sim.ravel(), gcn_sim.ravel()], axis=1)
    enh = lc.predict_proba(mini)[:, 1].reshape(n, n)
    return _cluster_from_sim(group, enh, th)
