"""End-to-end flagship pipeline: the BASELINE.json acceptance criteria.

- pairwise F1 ≥ 0.99 on the fixture's exhaustive labeled pairs at identical
  blocking keys,
- per-row span-sequence equality (kind, text, media_ref, order) end-to-end.
"""

import os

import pyarrow.parquet as pq

from entity_resolution_ray.pipelines.er import ERConfig, cluster_documents
from entity_resolution_ray.qa.metrics import (
    homogeneity_completeness_v,
    over_under_rates,
    pairwise_prf,
    score_to_minimise,
)


def test_flagship_f1_and_span_invariant(fixture_1k):
    clustered, edges = cluster_documents(
        os.path.join(fixture_1k, "documents.parquet"), ERConfig()
    )
    out = clustered.select_columns(["doc_id", "cluster_id", "spans"]).to_pandas()

    lp = pq.read_table(os.path.join(fixture_1k, "labeled_pairs.parquet")).to_pandas()
    prf = pairwise_prf(out[["doc_id", "cluster_id"]], lp)
    assert prf["f1"] >= 0.99, prf
    assert prf["precision"] >= 0.99, prf

    orig = (
        pq.read_table(os.path.join(fixture_1k, "documents.parquet"))
        .to_pandas()
        .set_index("doc_id")["spans"]
    )
    got = out.set_index("doc_id")["spans"]
    assert len(got) == len(orig)
    for doc_id, spans in got.items():
        want = [(s["kind"], s["text"], s["media_ref"]) for s in orig[doc_id]]
        have = [(s["kind"], s["text"], s["media_ref"]) for s in spans]
        assert have == want, f"span sequence changed for {doc_id}"


def test_quality_metrics_shapes(fixture_1k):
    import pandas as pd

    gt = pq.read_table(os.path.join(fixture_1k, "ground_truth.parquet")).to_pandas()
    # a perfect prediction scores perfectly
    merged = pd.DataFrame(
        {
            "doc_id": gt["doc_id"],
            "cluster_id": gt["cluster_id_global"],
            "ground_truth": gt["cluster_id_global"],
        }
    )
    hom, com, v = homogeneity_completeness_v(merged["ground_truth"], merged["cluster_id"])
    assert hom == com == v == 1.0
    one_block = merged[gt["blocking_field"] == gt["blocking_field"].iloc[0]]
    rates = over_under_rates(one_block)
    assert rates["oc_rate"] == 0.0 and rates["uc_rate"] == 0.0
    assert score_to_minimise(**rates) == 0.0
