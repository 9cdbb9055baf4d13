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


def test_degenerate_documents_do_not_crash(ray_session, tmp_path):
    """Docs with no text spans, media-only spans, or a missing name span must
    flow through the whole flagship without crashing, spans preserved."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from entity_resolution_ray.pipelines.er import ERConfig, cluster_documents
    from entity_resolution_ray import schema as S

    span = lambda kind, text="", media="", off=0: {
        "kind": kind, "text": text, "media_ref": media, "offset": off,
    }
    rows = [
        {"doc_id": "full", "spans": [span("name", "Ann Lee"),
                                     span("text", "Ann Lee spoke", off=1),
                                     span("media", media="media://x", off=2)]},
        {"doc_id": "no-text", "spans": [span("name", "Bob Ray")]},
        {"doc_id": "media-only", "spans": [span("media", media="media://y")]},
        {"doc_id": "nameless", "spans": [span("text", "orphan text")]},
        {"doc_id": "empty", "spans": []},
    ]
    path = str(tmp_path / "degenerate.parquet")
    pq2.write_table(pa.Table.from_pylist(rows, schema=S.DOCUMENTS_SCHEMA), path)

    clustered, edges = cluster_documents(path, ERConfig(min_read_partitions=2))
    out = clustered.to_pandas().set_index("doc_id")
    assert len(out) == 5
    assert out["cluster_id"].notna().all()
    # every degenerate doc becomes its own singleton cluster
    assert out["cluster_id"].nunique() == 5
    # span sequences preserved per row
    for r in rows:
        got = [(s["kind"], s["text"], s["media_ref"]) for s in out.loc[r["doc_id"], "spans"]]
        want = [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        assert got == want
