"""Numpy GCN combiner tier tests (reference ``am_combiner/combiners/ml.py``
semantics, shape of ``test/combiners/test_combiner_integration.py:16-75``)."""

import numpy as np
import pandas as pd

from entity_resolution_ray import schema as S
from entity_resolution_ray.stages.gcn import (
    LARGE_CLUSTER_LIMIT,
    LARGE_CLUSTER_TH_BUMP_UP,
    adjacency_from_similarities,
    gcn_combine,
    gcn_embed,
    gcn_hetero_combine,
    gcn_hetero_embed,
    gcn_lc_combine,
    sage_layer,
)


def _two_group_block():
    """Two 4-doc groups with disjoint features and disjoint term spaces —
    the reference integration test's 'obviously separable' block."""
    rows = []
    for i in range(4):
        rows.append((f"a{i}", ["smith", "john"], ["acme"], [], [],
                     [1, 2, 3, 10 + i], [2.0, 1.0, 1.0, 0.5]))
    for i in range(4):
        rows.append((f"b{i}", ["garcia", "maria"], ["globex"], [], [],
                     [50, 51, 52, 70 + i], [2.0, 1.0, 1.0, 0.5]))
    df = pd.DataFrame(
        rows,
        columns=[S.DOC_ID, "person_clean", "org", "gpe", "loc", "tf_idx", "tf_cnt"],
    )
    df[S.BLOCK_KEY] = "k"
    return df


def _cluster_map(out: pd.DataFrame) -> dict:
    return dict(zip(out[S.DOC_ID], out[S.CLUSTER_ID]))


def test_gcn_separates_groups():
    for fn in (gcn_combine, gcn_hetero_combine, gcn_lc_combine):
        m = _cluster_map(fn(_two_group_block()))
        assert len({m[f"a{i}"] for i in range(4)}) == 1, fn.__name__
        assert len({m[f"b{i}"] for i in range(4)}) == 1, fn.__name__
        assert m["a0"] != m["b0"], fn.__name__


def test_gcn_deterministic_and_order_invariant():
    g = _two_group_block()
    out1 = _cluster_map(gcn_combine(g))
    out2 = _cluster_map(gcn_combine(g.sample(frac=1.0, random_state=7)))
    assert out1 == out2
    out3 = _cluster_map(gcn_hetero_combine(g))
    out4 = _cluster_map(gcn_hetero_combine(g.iloc[::-1]))
    assert out3 == out4


def test_sage_layer_mean_semantics():
    """Weighted message sum divided by in-degree COUNT (DGL fn.mean)."""
    H = np.array([[1.0, 0.0], [0.0, 1.0], [2.0, 2.0]])
    A = np.array([[0.0, 2.0, 1.0], [0.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    I = np.eye(2)
    out = sage_layer(H, A, I * 0.0, I, act=lambda x: x)
    # node 0: (2*h1 + 1*h2) / 2 neighbours
    np.testing.assert_allclose(out[0], (2 * H[1] + 1 * H[2]) / 2)
    # node 1: no in-edges → zero neighbourhood
    np.testing.assert_allclose(out[1], [0.0, 0.0])
    # node 2: single in-edge with weight 3
    np.testing.assert_allclose(out[2], 3 * H[1] / 1)


def test_large_cluster_threshold_bump():
    n = LARGE_CLUSTER_LIMIT + 1
    sim = np.full((n, n), 0.71)
    # below the limit 0.71 > 0.70 connects; above it the bump disconnects
    assert adjacency_from_similarities(sim[:10, :10], th=0.70).sum() == 100
    assert adjacency_from_similarities(sim, th=0.70).sum() == 0
    assert adjacency_from_similarities(
        np.full((n, n), 0.70 + LARGE_CLUSTER_TH_BUMP_UP + 0.001), th=0.70
    ).sum() == n * n


def test_empty_feature_graph_does_not_crash():
    g = _two_group_block()
    for col in ("person_clean", "org", "gpe", "loc"):
        g[col] = [[] for _ in range(len(g))]
    out = gcn_combine(g)
    assert len(out) == len(g)
    assert out[S.CLUSTER_ID].notna().all()


def test_gcn_registered_in_combiner_registry():
    from entity_resolution_ray.stages.combiners import COMBINERS

    for name in ("gcn", "gcn_hetero", "gcn_lc"):
        assert name in COMBINERS
