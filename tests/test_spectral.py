"""Spectral combiner tier (reference ``utils/spectral.py`` + the two
TFIDF+graph combiners, ``combiners/tfidf.py:356-577``).

The reference hand-case (``test/combiners/test_graph_combiner_run.py``):
3 mentions of "Some Name" whose LOC sets all share "toronto".  NOTE: the
reference's FeatrGraph row-mapping merges a ONE-ROW frame on ``sub_df.index``
(``tfidf.py:524-534``), which only ever matches graph position 0 — an
indexing artifact that makes its published expected boost asymmetric.  This
engine implements the documented intent (map the full symmetric spectral
similarity of each ≥th subgraph back into block coordinates); the tests pin
THAT: symmetry, clip bounds, and the exact clipped feature term 1/30.
"""

import numpy as np
import pandas as pd

from entity_resolution_ray.stages.spectral import (
    build_doc_feature_graph,
    cosine_matrix,
    featr_graph_boost,
    laplacian_doc_vectors,
    spectral_boost,
)

DOCS = ["some.first.url", "some.second.url", "some.third.url"]
NAMES = ["Some Name"] * 3
FEATS = [
    ["Michigan ", "Hollywood ", "Toronto"],
    ["Romania ", "Toronto", "Italy"],
    ["Cluj ", "Toronto", "Milan"],
]


def test_graph_build_prunes_degree1_features():
    names, A = build_doc_feature_graph(DOCS, NAMES, FEATS)
    # only "toronto" (shared, degree 3) and the shared entity-name node
    # survive among non-doc nodes; per-doc singleton features are pruned
    assert "toronto" in names
    assert "michigan" not in names
    assert "Some Name" in names
    assert set(DOCS) <= set(names)
    # adjacency symmetric, degrees: every doc connects to toronto + name
    assert np.array_equal(A, A.T)
    for d in DOCS:
        assert A[names.index(d)].sum() == 2


def test_spectral_vectors_and_boost_symmetry():
    rows = laplacian_doc_vectors(DOCS, NAMES, FEATS)
    assert rows.shape == (3, 3)
    boost = spectral_boost(DOCS, NAMES, FEATS, min_energy=-0.25, max_energy=0.65)
    assert np.array_equal(boost, boost.T)
    assert boost.max() <= 0.65 + 1e-12 and boost.min() >= -0.25 - 1e-12
    # the three docs are graph-equivalent (all touch exactly toronto+name):
    # their embeddings must be pairwise equally similar
    assert abs(boost[0, 1] - boost[0, 2]) < 1e-9
    assert abs(boost[0, 1] - boost[1, 2]) < 1e-9


def test_featr_graph_boost_reference_case():
    # reference case: every pair shares exactly one LOC value ("toronto"),
    # ftr_max_energy=30 → clipped feature term = 1/30 off-diagonal
    adj = np.ones((3, 3)) - np.eye(3)
    boost = featr_graph_boost(
        DOCS, NAMES, FEATS, adj, ftr_th=1, ftr_max_energy=30,
        graph_node_th=2, min_energy=0, max_energy=0.15,
    )
    assert np.array_equal(boost, boost.T)
    # off-diagonal = 1/30 + clip(spectral cosine, 0, 0.15) ∈ [1/30, 1/30+0.15]
    off = boost[0, 1]
    assert 1 / 30 - 1e-9 <= off <= 1 / 30 + 0.15 + 1e-9
    # diagonal = 0 (clipped adj) + 0.15 (self-cosine 1 clipped)
    assert abs(boost[0, 0] - 0.15) < 1e-9
    # below-threshold subgraphs get NO spectral term
    small = featr_graph_boost(
        DOCS, NAMES, FEATS, adj, ftr_th=1, ftr_max_energy=30,
        graph_node_th=5, min_energy=0, max_energy=0.15,
    )
    assert abs(small[0, 1] - 1 / 30) < 1e-9 and abs(small[0, 0]) < 1e-9


def test_spectral_combiners_cluster_fixture(ray_session, fixture_1k):
    import os

    import ray.data as rd

    from entity_resolution_ray.pipelines.er import (
        ERConfig,
        featured_documents,
        read_documents,
    )
    from entity_resolution_ray.stages.combiners import run_combiner

    featured = featured_documents(
        read_documents(os.path.join(fixture_1k, "documents.parquet")), ERConfig()
    ).materialize()
    for name in ("tfidf_graph_cosine", "tfidf_featr_graph_cosine"):
        out = run_combiner(featured, name).to_pandas()
        assert len(out) == 1000
        assert out["cluster_id"].notna().all()
        # determinism
        out2 = run_combiner(featured, name).to_pandas()
        m1 = dict(zip(out["doc_id"], out["cluster_id"]))
        m2 = dict(zip(out2["doc_id"], out2["cluster_id"]))
        assert m1 == m2


def test_feature_string_channel_pinned_and_f1(ray_session, fixture_1k):
    import os

    import pyarrow.parquet as pq

    from entity_resolution_ray.pipelines.er import ERConfig, cluster_documents
    from entity_resolution_ray.qa.metrics import pairwise_prf
    from entity_resolution_ray.stages.vectorize import FeatureStringVectorizer

    # pinned kernel values: identity tokens hash deterministically
    import pyarrow as pa

    batch = pa.table(
        {
            "person_clean": [["ann smith"], []],
            "org": [["acme corp"], ["acme corp"]],
            "gpe": [[], []],
            "loc": [[], []],
        }
    )
    out = FeatureStringVectorizer(dim=1 << 18)(batch)
    assert out["feature_text"][0].as_py() == "person_clean-ann smith_-_org-acme corp"
    assert out["feature_text"][1].as_py() == "org-acme corp"
    # the shared org token hashes to the same index in both rows
    shared = set(out["ftr_idx"][0].as_py()) & set(out["ftr_idx"][1].as_py())
    assert len(shared) == 1

    # flagship F1 must not regress with the channel enabled
    cfg = ERConfig(use_feature_tfidf=True)
    cfg.score.w_ftr = 0.10
    clustered, edges = cluster_documents(
        os.path.join(fixture_1k, "documents.parquet"), cfg
    )
    pred = clustered.select_columns(["doc_id", "cluster_id"]).to_pandas()
    lp = pq.read_table(os.path.join(fixture_1k, "labeled_pairs.parquet")).to_pandas()
    prf = pairwise_prf(pred, lp)
    assert prf["f1"] >= 0.99, prf
    # the channel actually fired: some scored pair has ftr_cos > 0
    e = edges.limit(20000).to_pandas()
    assert (e["ftr_cos"] > 0).any()
