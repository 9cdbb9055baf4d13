"""Spectral (Laplacian-eigenvector) similarity boost (SURVEY.md §2.9/§2.12).

Reference analogues, re-implemented pure-numpy (no networkx/sklearn):

- ``get_graph_eign`` (``am_combiner/utils/spectral.py:14-52``): bipartite
  graph doc-url ↔ feature-value (lowered/stripped) plus a doc ↔ entity-name
  edge; feature nodes of degree 1 pruned; Laplacian L = D − A;
  ``np.linalg.eig`` + real part + eigenvalue sort (kept ``eig`` not ``eigh``
  for bit-parity with the reference's LAPACK path),
- ``get_node_eign_vector`` (``spectral.py:55-91``): doc-node rows of
  eigenvectors 1..4 (Fiedler vector onward),
- ``get_graph_clusters`` (``spectral.py:94-112``): pairwise cosine of those
  rows,
- ``TFIDFAndGraphCosineSimilarityCombiner`` (``am_combiner/combiners/
  tfidf.py:356-421``): sim += clip(spectral cosine, min_energy, max_energy),
- ``TFIDFFeatrGraphCosineSimilarityCombiner`` (``tfidf.py:424-577``):
  feature-intersection CC subgraphs of ≥ graph_node_th members get spectral
  re-scoring mapped back into block coordinates; sim += clipped feature
  boost + mapped spectral boost.

Both run block-local inside ``groupby(block_key).map_groups`` — the same
partitioning assumption as every other combiner (a block fits one worker;
oversized blocks are defused upstream by salting / country blocking).
"""

from __future__ import annotations

import numpy as np


def build_doc_feature_graph(doc_ids: list, entity_names: list,
                            feature_sets: list[list]) -> tuple[list, np.ndarray]:
    """(node order, adjacency) of the doc↔feature bipartite graph.

    Node order = first-touch order of the reference's edge-insertion loop
    (doc, its features..., its entity name, next doc, ...).  Feature-value
    nodes used by only one edge are pruned (``spectral.py:40-43``); doc and
    entity-name nodes always stay.
    """
    index: dict[str, int] = {}
    edges: list[tuple[int, int]] = []
    usage: dict[str, int] = {}
    is_feature: dict[str, bool] = {}

    def node(name: str, feature: bool) -> int:
        if name not in index:
            index[name] = len(index)
            is_feature[name] = feature
        elif feature and not is_feature[name]:
            pass  # doc/name node wins
        return index[name]

    for doc, name, feats in zip(doc_ids, entity_names, feature_sets):
        d = node(str(doc), False)
        for f in feats:
            fs = str(f).lower().strip()
            usage[fs] = usage.get(fs, 0) + 1
            edges.append((d, node(fs, True)))
        edges.append((d, node(str(name), False)))

    n = len(index)
    A = np.zeros((n, n), dtype=np.float64)
    for a, b in edges:
        A[a, b] = 1.0
        A[b, a] = 1.0

    # prune feature nodes of degree 1 (reference usage-pruning)
    names = list(index)
    deg = A.sum(axis=1)
    keep = np.array(
        [not (is_feature[nm] and deg[i] <= 1) for i, nm in enumerate(names)]
    )
    A = A[np.ix_(keep, keep)]
    kept_names = [nm for nm, k in zip(names, keep) if k]
    return kept_names, A


def laplacian_doc_vectors(doc_ids: list, entity_names: list,
                          feature_sets: list[list],
                          idx_start: int = 1, idx_end: int = 4) -> np.ndarray:
    """Per-doc rows of the graph Laplacian's eigenvectors [idx_start:idx_end]
    sorted by eigenvalue — the reference's spectral embedding."""
    names, A = build_doc_feature_graph(doc_ids, entity_names, feature_sets)
    L = np.diag(A.sum(axis=1)) - A
    eig_val, eig_vec = np.linalg.eig(L)
    order = np.argsort(eig_val)
    vec = np.real(eig_vec[:, order][:, idx_start:idx_end])
    pos = {nm: i for i, nm in enumerate(names)}
    rows = np.zeros((len(doc_ids), vec.shape[1]), dtype=np.float64)
    for i, doc in enumerate(doc_ids):
        p = pos.get(str(doc))
        if p is not None:
            rows[i] = vec[p]
    return rows


def cosine_matrix(X: np.ndarray) -> np.ndarray:
    norms = np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    Xn = X / norms
    return Xn @ Xn.T


def spectral_boost(doc_ids: list, entity_names: list, feature_sets: list[list],
                   min_energy: float = -0.25, max_energy: float = 0.65) -> np.ndarray:
    """TFIDFAndGraph boost: clip(cosine of spectral embeddings)."""
    rows = laplacian_doc_vectors(doc_ids, entity_names, feature_sets)
    return np.clip(cosine_matrix(rows), min_energy, max_energy)


def featr_graph_boost(doc_ids: list, entity_names: list,
                      feature_sets: list[list], feature_adj: np.ndarray,
                      ftr_th: float = 1.0, ftr_max_energy: float = 75.0,
                      graph_node_th: int = 5, min_energy: float = 0.0,
                      max_energy: float = 0.15) -> np.ndarray:
    """TFIDFFeatrGraph boost (``tfidf.py:469-577``): clipped/scaled feature
    intersections plus spectral cosine of each ≥graph_node_th CC subgraph,
    mapped back into block coordinates (0 outside the subgraph)."""
    from entity_resolution_ray.stages.clustering import union_find

    n = len(doc_ids)
    clipped = np.clip(feature_adj, 0, ftr_max_energy) / ftr_max_energy
    ii, jj = np.where(np.triu(feature_adj >= ftr_th, 1))
    comp = union_find(n, ii.astype(np.int64), jj.astype(np.int64))

    mapped = np.zeros((n, n), dtype=np.float64)
    for c in np.unique(comp):
        members = np.flatnonzero(comp == c)
        if len(members) < graph_node_th:
            continue
        sub_rows = laplacian_doc_vectors(
            [doc_ids[i] for i in members],
            [entity_names[i] for i in members],
            [feature_sets[i] for i in members],
        )
        spec = np.clip(cosine_matrix(sub_rows), min_energy, max_energy)
        mapped[np.ix_(members, members)] = spec
    return clipped + mapped
