"""Checkpoint-resume: stage skip on rerun, invalidation, mid-pipeline resume
with byte-identical outputs (BASELINE.md resumability criterion)."""

import json
import os
import shutil

import pandas as pd

from entity_resolution_ray.pipelines.er import ERConfig
from entity_resolution_ray.pipelines.job import run_er_job
from entity_resolution_ray.state.checkpoint import read_stage


def _clusters_df(out_root):
    df = read_stage(out_root, "clusters").to_pandas()
    return (
        df[["doc_id", "cluster_id"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_job_checkpoints_and_resumes(fixture_1k, tmp_path):
    out = str(tmp_path / "job")
    docs = os.path.join(fixture_1k, "documents.parquet")

    m1 = run_er_job(docs, out)
    assert not any(s["skipped"] for s in m1["stages"].values())
    first = _clusters_df(out)
    assert first["cluster_id"].notna().all()

    # full rerun: every stage skips, outputs unchanged
    m2 = run_er_job(docs, out)
    assert all(s["skipped"] for s in m2["stages"].values())
    pd.testing.assert_frame_equal(_clusters_df(out), first)

    # kill-after-stage-2 simulation: drop the final stage, rerun — the two
    # upstream stages skip, clusters rebuild identically
    shutil.rmtree(os.path.join(out, "clusters"))
    m3 = run_er_job(docs, out)
    assert m3["stages"]["featured"]["skipped"]
    assert m3["stages"]["edges"]["skipped"]
    assert not m3["stages"]["clusters"]["skipped"]
    pd.testing.assert_frame_equal(_clusters_df(out), first)

    # config change invalidates exactly the downstream stages
    cfg = ERConfig()
    cfg.score.th = 0.7
    m4 = run_er_job(docs, out, cfg)
    assert m4["stages"]["featured"]["skipped"]
    assert not m4["stages"]["edges"]["skipped"]
    assert not m4["stages"]["clusters"]["skipped"]


def test_lineage_records_partitions(fixture_1k, tmp_path):
    out = str(tmp_path / "job2")
    run_er_job(os.path.join(fixture_1k, "documents.parquet"), out)
    with open(os.path.join(out, "featured", "_lineage.json")) as f:
        lineage = json.load(f)
    assert lineage["rows"] == 1000
    assert lineage["n_partitions"] == len(lineage["partitions"]) > 0
    assert all(p["rows"] > 0 for p in lineage["partitions"])
    with open(os.path.join(out, "metrics.json")) as f:
        metrics = json.load(f)
    assert set(metrics["stages"]) == {"featured", "edges", "clusters"}


def test_block_timing_sidecar(ray_session, fixture_1k, tmp_path):
    """Flagship run with timing_report set emits the per-block-size JSON
    (reference all_combiners_time_performance.csv semantics)."""
    import json
    import os

    from entity_resolution_ray.pipelines.er import ERConfig, cluster_documents

    path = str(tmp_path / "block_timing.json")
    cfg = ERConfig(timing_report=path)
    clustered, _ = cluster_documents(
        os.path.join(fixture_1k, "documents.parquet"), cfg
    )
    assert clustered.count() == 1000
    report = json.load(open(path))
    assert report, "timing report must not be empty"
    total_blocks = 0
    for size, row in report.items():
        assert int(size) >= 1
        assert row["avg_ms"] >= 0.0
        assert row["n_blocks"] >= 1
        total_blocks += row["n_blocks"]
    assert total_blocks >= 10  # the 1k fixture has many blocks
