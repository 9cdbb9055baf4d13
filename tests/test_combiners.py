"""Combiner / splitter / blocker operator tests (reference-semantics checks)."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from entity_resolution_ray import schema as S
from entity_resolution_ray.pipelines.er import ERConfig, featured_documents, read_documents
from entity_resolution_ray.stages.combiners import (
    COMBINERS,
    _connected_components,
    _current_production,
    _pairwise_incremental,
    run_combiner,
)
from entity_resolution_ray.stages.splitting import _negative_matrix


def _featured(fixture_1k):
    return featured_documents(
        read_documents(os.path.join(fixture_1k, "documents.parquet")), ERConfig()
    ).materialize()


def _micro_group():
    """3-doc micro block with known feature overlaps (the reference's
    adjacency micro-fixture shape)."""
    return pd.DataFrame(
        {
            S.DOC_ID: ["d1", "d2", "d3"],
            S.BLOCK_KEY: ["k", "k", "k"],
            "person_clean": [["john", "peter", "flow"], ["peter", "flow", "kl"], ["flow"]],
            "org": [[], [], []],
            "gpe": [[], [], []],
            "loc": [[], [], []],
            "tf_idx": [[1, 2], [2, 3], [9]],
            "tf_cnt": [[1.0, 2.0], [2.0, 1.0], [1.0]],
        }
    )


def test_current_production_single_cluster():
    out = _current_production(_micro_group())
    assert out[S.CLUSTER_ID].nunique() == 1


def test_connected_components_threshold_semantics():
    # weights: (d1,d2)=2, (d1,d3)=1, (d2,d3)=1
    out_th2 = _connected_components(_micro_group(), th=2.0)
    m = dict(zip(out_th2[S.DOC_ID], out_th2[S.CLUSTER_ID]))
    assert m["d1"] == m["d2"] and m["d1"] != m["d3"]
    out_th1 = _connected_components(_micro_group(), th=1.0)
    assert out_th1[S.CLUSTER_ID].nunique() == 1
    out_th3 = _connected_components(_micro_group(), th=3.0)
    assert out_th3[S.CLUSTER_ID].nunique() == 3


def test_pairwise_incremental_order_deterministic():
    g = _micro_group()
    out1 = _pairwise_incremental(g, th=0.5)
    out2 = _pairwise_incremental(g.sample(frac=1.0, random_state=3), th=0.5)
    assert dict(zip(out1[S.DOC_ID], out1[S.CLUSTER_ID])) == dict(
        zip(out2[S.DOC_ID], out2[S.CLUSTER_ID])
    )


def test_all_combiners_run_on_fixture(fixture_1k):
    featured = _featured(fixture_1k)
    for name in COMBINERS:
        out = run_combiner(featured, name).to_pandas()
        assert len(out) == 1000, name
        assert set(out.columns) == {S.DOC_ID, S.BLOCK_KEY, S.CLUSTER_ID}, name
        assert out[S.CLUSTER_ID].notna().all(), name


def test_combiner_quality_ordering(fixture_1k):
    """connected_components should beat current_production on the fixture."""
    from entity_resolution_ray.qa.metrics import pairwise_prf

    featured = _featured(fixture_1k)
    lp = pq.read_table(os.path.join(fixture_1k, "labeled_pairs.parquet")).to_pandas()
    prf_cc = pairwise_prf(
        run_combiner(featured, "connected_components").to_pandas()
        .rename(columns={S.CLUSTER_ID: "cluster_id"}),
        lp,
    )
    prf_prod = pairwise_prf(
        run_combiner(featured, "current_production").to_pandas()
        .rename(columns={S.CLUSTER_ID: "cluster_id"}),
        lp,
    )
    assert prf_cc["f1"] > prf_prod["f1"]
    assert prf_prod["recall"] == 1.0  # everything merged → perfect recall
    assert prf_cc["f1"] > 0.9


def test_negative_matrix_reference_rule():
    neg = _negative_matrix([[1950], [1960], []], distance=5)
    assert neg[0, 1] and neg[1, 0]
    assert not neg[0, 2].any() if hasattr(neg[0, 2], "any") else not neg[0, 2]
    neg2 = _negative_matrix([["a"], ["b"], ["a"]], distance=None)
    assert neg2[0, 1] and not neg2[0, 2]


def test_splitter_breaks_dob_conflict(fixture_1k):
    import ray.data as rd

    from entity_resolution_ray.stages.splitting import split_clusters

    rows = pd.DataFrame(
        {
            S.DOC_ID: ["a", "b", "c"],
            S.BLOCK_KEY: ["k"] * 3,
            S.CLUSTER_ID: ["c0"] * 3,
            "dob_years": [[1950], [1950], [1990]],
            "pairs": [
                [{"src": "a", "dst": "b", "weight": 2.0},
                 {"src": "a", "dst": "c", "weight": 1.0}],
                [{"src": "b", "dst": "c", "weight": 1.0}],
                [],
            ],
        }
    )
    out = split_clusters(rd.from_pandas(rows), distance=5, mode="delete").to_pandas()
    m = dict(zip(out[S.DOC_ID], out[S.CLUSTER_ID]))
    assert m["a"] == m["b"] and m["a"] != m["c"]


def test_splitter_keeps_weight_zero_accepted_edge():
    """Regression (r5, caught by the er_clusters_split_canon SQL oracle):
    an accepted pair with keyword-overlap weight 0 (accepted on the
    cosine/JW score channel) is still a positive edge — delete-mode must
    remove only NEGATIVE edges, so two same-DOB docs joined by a weight-0
    pair stay together."""
    import ray.data as rd

    from entity_resolution_ray.stages.splitting import split_clusters

    rows = pd.DataFrame(
        {
            S.DOC_ID: ["a", "b"],
            S.BLOCK_KEY: ["k"] * 2,
            S.CLUSTER_ID: ["c0"] * 2,
            "dob_years": [[1905], [1905]],
            "pairs": [[{"src": "a", "dst": "b", "weight": 0.0}], []],
        }
    )
    out = split_clusters(rd.from_pandas(rows), distance=5, mode="delete").to_pandas()
    m = dict(zip(out[S.DOC_ID], out[S.CLUSTER_ID]))
    assert m["a"] == m["b"]


def test_feature_based_blocker_groups_shared_keys(fixture_1k):
    from entity_resolution_ray.stages.blockers import feature_based_blocker

    featured = _featured(fixture_1k)
    blocks = feature_based_blocker(featured, ["phonetic_key"]).to_pandas()
    assert len(blocks) == 1000
    # docs sharing a phonetic key must share a block id
    fdf = featured.select_columns([S.DOC_ID, "phonetic_key"]).to_pandas()
    merged = blocks.merge(fdf, on=S.DOC_ID)
    by_key = merged[merged["phonetic_key"] != ""].groupby("phonetic_key")[
        "block_id"
    ].nunique()
    assert (by_key == 1).all()


def test_deblock_composite_ids():
    from entity_resolution_ray.stages.blockers import deblock_composite_ids

    df = pd.DataFrame({"src": ["x", "x", "y"], "cl": [1, 1, 1]})
    codes = deblock_composite_ids(df, "src", "cl")
    assert codes[0] == codes[1] != codes[2]


def test_annotations_overlay_forces_labels(fixture_1k):
    import ray.data as rd

    from entity_resolution_ray.stages.combiners import annotations_overlay

    edges = pd.DataFrame(
        {
            "block_key": ["k"] * 3,
            "src": ["a", "a", "b"],
            "dst": ["b", "c", "c"],
            "weight": [0.0, 5.0, 0.0],
            "cosine": [0.1, 0.9, 0.1],
            "media_cos": [0.0] * 3,
            "neg_dob": [False] * 3,
            "jw": [1.0] * 3,
            "score": [0.2, 1.9, 0.2],
        }
    )
    labeled = pd.DataFrame(
        {"doc_a": ["a", "a"], "doc_b": ["b", "c"], "is_match": [True, False]}
    )
    out = annotations_overlay(rd.from_pandas(edges), labeled, th=0.6).to_pandas()
    m = {(r.src, r.dst): r.accepted for r in out.itertuples()}
    assert m[("a", "b")]          # Yes overrides low score
    assert not m[("a", "c")]      # No overrides high score
    assert not m[("b", "c")]      # unlabeled keeps threshold


def test_hash_split_and_sample_deterministic():
    from entity_resolution_ray.qa.metrics import hash_split, sample_pairs

    ids = pd.Series([f"d{i}" for i in range(1000)])
    f1, f2 = hash_split(ids), hash_split(ids)
    assert (f1 == f2).all() and set(np.unique(f1)) <= set(range(5))
    counts = np.bincount(f1, minlength=5)
    assert counts.min() > 120  # roughly balanced folds

    pairs = pd.DataFrame({"doc_a": ids, "doc_b": ids[::-1].to_numpy()})
    s1, s2 = sample_pairs(pairs), sample_pairs(pairs)
    pd.testing.assert_frame_equal(s1, s2)
    assert 0.1 < len(s1) / len(pairs) < 0.3
