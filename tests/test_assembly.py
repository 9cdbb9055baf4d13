"""YAML-driven pipeline assembly (reference ``utils/parametrization.py:33-95``)."""

import pandas as pd
import pytest
import ray.data as rd


YAML_TEXT = """
pipeline:
  - resolve_geo:
      stage: geo_resolve_column
      attrs: {src_col: gpe}
  - keywords:
      stage: article_keywords
      attrs:
        keywords: [fox, table]
combiners:
  - cc_strict:
      stage: connected_components
      attrs: {th: 2.0}
  - baseline:
      stage: current_production
"""


def test_assemble_and_run(ray_session, tmp_path):
    from entity_resolution_ray.pipelines.assembly import (
        assemble_pipeline,
        load_combiners,
    )

    p = tmp_path / "pipe.yaml"
    p.write_text(YAML_TEXT)

    docs = pd.DataFrame(
        {
            "doc_id": ["a", "b"],
            "content": ["the quick brown fox", "a table of data"],
            "gpe": [["France"], ["Atlantis"]],
        }
    )
    run = assemble_pipeline(str(p))
    assert list(run.stages) == ["resolve_geo", "keywords"]
    out = run(rd.from_pandas(docs)).to_pandas().set_index("doc_id")
    assert out.loc["a", "gpe_clean"] == ["france"]
    assert out.loc["a", "keywords"] == ["fox"]
    assert out.loc["b", "keywords"] == ["table"]

    combiners = load_combiners(str(p))
    assert set(combiners) == {"cc_strict", "baseline"}

    # bound attrs actually apply and the loaded combiner is runnable
    g = pd.DataFrame(
        {
            "doc_id": ["x", "y"],
            "block_key": ["k", "k"],
            "tf_idx": [[1], [1]],
            "tf_cnt": [[1.0], [1.0]],
            "person_clean": [["ann"], ["ann"]],
            "org": [[], []],
            "gpe": [[], []],
            "loc": [[], []],
        }
    )
    res = combiners["baseline"](g)
    assert res["cluster_id"].nunique() == 1
    # th=2.0: a single shared value (weight 1) is below threshold → singletons
    res2 = combiners["cc_strict"](g)
    assert res2["cluster_id"].nunique() == 2


def test_unknown_stage_raises(tmp_path):
    from entity_resolution_ray.pipelines.assembly import assemble_pipeline

    p = tmp_path / "bad.yaml"
    p.write_text("pipeline:\n  - x:\n      stage: not_a_stage\n")
    with pytest.raises(KeyError, match="not_a_stage"):
        assemble_pipeline(str(p))
