"""Term/keyword/meta-key stages, model-based combiner, clusterer hook,
Lance read seam."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from entity_resolution_ray import schema as S
from entity_resolution_ray.stages.terms import (
    article_keywords,
    article_terms,
    combo_basic_terms,
    meta_key_column,
)


def test_combo_basic_formula():
    text = (
        "The nuclear research institute announced nuclear research funding. "
        "The institute works on nuclear research daily."
    )
    terms = combo_basic_terms(text, n=5)
    # the repeated topical phrase and its head words rank in the top-5
    assert "nuclear research" in terms
    assert "research" in terms and "nuclear" in terms
    # a one-off filler word ranks below them
    assert "funding" not in terms
    assert all(t == t.lower() for t in terms)
    assert combo_basic_terms("", 5) == []
    # deterministic
    assert terms == combo_basic_terms(text, n=5)


def test_terms_keywords_meta_stages(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": ["a", "b"],
            "content": [
                "nuclear research institute announced nuclear research plans",
                "the quick brown fox",
            ],
            "meta": [{"category": "crime"}, {}],
        }
    )
    ds = rd.from_pandas(docs)
    t = article_terms(ds).to_pandas().set_index("doc_id")
    assert "nuclear research" in t.loc["a", "terms"]

    k = article_keywords(ds, ["Nuclear", "fox", "zebra"]).to_pandas().set_index("doc_id")
    assert k.loc["a", "keywords"] == ["nuclear"]
    assert k.loc["b", "keywords"] == ["fox"]

    m = meta_key_column(ds, "category", "am_category").to_pandas().set_index("doc_id")
    assert list(m.loc["a", "am_category"]) == ["crime"]
    assert list(m.loc["b", "am_category"]) == []


def test_model_combiner_and_hook(ray_session, fixture_1k):
    import os

    from entity_resolution_ray.pipelines.er import (
        ERConfig,
        featured_documents,
        read_documents,
    )
    from entity_resolution_ray.stages.combiners import (
        NumpyLogisticPairModel,
        make_clustering_algo_combiner,
        make_model_combiner,
        project_block_vectors,
        run_combiner,
    )

    # the fit itself learns a linearly separable pair problem near-perfectly
    rng = np.random.default_rng(5)
    X = rng.standard_normal((400, 128))
    y = (X @ np.linspace(-1, 1, 128) > 0).astype(int)
    model = NumpyLogisticPairModel.fit(X, y)
    acc = (model.predict_proba(X)[:, 1] > 0.5).astype(int)
    assert (acc == y).mean() > 0.95

    featured = featured_documents(
        read_documents(os.path.join(fixture_1k, "documents.parquet")), ERConfig()
    ).materialize()
    out = run_combiner(featured, make_model_combiner(model, th=0.9)).to_pandas()
    assert len(out) == 1000 and out["cluster_id"].notna().all()
    # determinism
    out2 = run_combiner(featured, make_model_combiner(model, th=0.9)).to_pandas()
    assert dict(zip(out["doc_id"], out["cluster_id"])) == dict(
        zip(out2["doc_id"], out2["cluster_id"])
    )

    # arbitrary-clusterer hook: a trivial all-one-cluster algorithm must
    # reproduce current_production exactly
    class OneCluster:
        def fit_predict(self, X):
            return np.zeros(len(X), dtype=np.int64)

    hooked = run_combiner(featured, make_clustering_algo_combiner(OneCluster)).to_pandas()
    base = run_combiner(featured, "current_production").to_pandas()
    assert dict(zip(hooked["doc_id"], hooked["cluster_id"])) == dict(
        zip(base["doc_id"], base["cluster_id"])
    )


def test_project_block_vectors_deterministic():
    from entity_resolution_ray.stages.combiners import project_block_vectors

    g = pd.DataFrame(
        {
            "tf_idx": [[5, 9], [5, 9], [100]],
            "tf_cnt": [[1.0, 2.0], [1.0, 2.0], [3.0]],
        }
    )
    a = project_block_vectors(g)
    b = project_block_vectors(g)
    assert np.allclose(a, b)
    assert np.allclose(a[0], a[1])          # identical docs → identical vectors
    assert not np.allclose(a[0], a[2])      # different terms → different vectors
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_lance_seam(tmp_path):
    from entity_resolution_ray.pipelines.er import read_documents

    with pytest.raises(ImportError, match="pylance"):
        read_documents(str(tmp_path / "corpus.lance"))


def test_lance_dir_detection_executes_branch(tmp_path):
    """A Lance dataset DIRECTORY (marked by _versions/) must route into the
    real Lance branch — executed, not mocked: without pylance the contract
    is a clean ImportError naming the missing package."""
    import os

    from entity_resolution_ray.pipelines.er import read_documents

    ds_dir = tmp_path / "corpus_ds"
    os.makedirs(ds_dir / "_versions")
    try:
        import lance  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="pylance"):
            read_documents(str(ds_dir))
    else:  # container with pylance: branch must reach read_lance and fail
        with pytest.raises(Exception):  # noqa: B017 — empty dataset dir
            read_documents(str(ds_dir))
