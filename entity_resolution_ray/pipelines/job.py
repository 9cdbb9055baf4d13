"""Checkpointed ER job: the ``ray job submit`` entry shape (north rule).

Three checkpointed stages, each written as partitioned Parquet with lineage
and metrics; a rerun (same input + config) skips every committed stage, and a
rerun after a mid-pipeline failure redoes only the missing stages:

    <out>/featured/   normalize + tag + vectorize output
    <out>/edges/      scored candidate pairs
    <out>/clusters/   final (doc_id, spans, entity_name, block_key, cluster_id)
    <out>/metrics.json  per-stage lineage summary + quality metrics hook

Fingerprints chain: clusters ← edges ← featured ← (input file identity,
stage config, engine version), so changing an upstream config invalidates
exactly the downstream stages.
"""

from __future__ import annotations

import json
import os

from entity_resolution_ray import __version__
from entity_resolution_ray import schema as S
from entity_resolution_ray.pipelines.er import (
    ERConfig,
    featured_documents,
    read_documents,
    scored_pairs,
)
from entity_resolution_ray.stages.clustering import assign_clusters
from entity_resolution_ray.state.checkpoint import checkpoint_stage, fingerprint_of


def _input_identity(path: str) -> str:
    st = os.stat(path)
    return f"{os.path.abspath(path)}:{st.st_size}:{int(st.st_mtime)}"


def run_er_job(docs_path: str, out_root: str, cfg: ERConfig | None = None) -> dict:
    """Run the flagship pipeline with per-stage checkpoints; returns metrics."""
    cfg = cfg or ERConfig()
    os.makedirs(out_root, exist_ok=True)

    fp_featured = fingerprint_of(
        "featured", __version__, _input_identity(docs_path), cfg.tf_dim
    )
    featured, lin_featured, skipped_f = checkpoint_stage(
        lambda: featured_documents(read_documents(docs_path), cfg),
        out_root,
        "featured",
        fp_featured,
    )

    fp_edges = fingerprint_of(
        "edges", fp_featured, repr(cfg.score), cfg.all_pairs_cap, cfg.posting_cap
    )
    edges, lin_edges, skipped_e = checkpoint_stage(
        lambda: scored_pairs(featured.materialize(), cfg),
        out_root,
        "edges",
        fp_edges,
    )

    fp_clusters = fingerprint_of("clusters", fp_edges, cfg.cc_mode)

    def build_clusters():
        import pyarrow as pa

        accepted = edges.map_batches(
            lambda t: t.select([S.BLOCK_KEY, "src", "dst"]).filter(t["accepted"]),
            batch_format="pyarrow",
        ).materialize()
        keep = [S.DOC_ID, S.SPANS, S.ENTITY_NAME, S.BLOCK_KEY]
        return assign_clusters(
            featured.select_columns(keep), accepted, mode=cfg.cc_mode
        )

    clusters, lin_clusters, skipped_c = checkpoint_stage(
        build_clusters, out_root, "clusters", fp_clusters
    )

    metrics = {
        "engine_version": __version__,
        "input": _input_identity(docs_path),
        "stages": {
            "featured": {**{k: lin_featured[k] for k in ("fingerprint", "wall_sec", "rows", "n_partitions")}, "skipped": skipped_f},
            "edges": {**{k: lin_edges[k] for k in ("fingerprint", "wall_sec", "rows", "n_partitions")}, "skipped": skipped_e},
            "clusters": {**{k: lin_clusters[k] for k in ("fingerprint", "wall_sec", "rows", "n_partitions")}, "skipped": skipped_c},
        },
    }
    with open(os.path.join(out_root, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


def main(argv=None):
    """CLI: python -m entity_resolution_ray.pipelines.job --input X --out Y"""
    import argparse

    import ray

    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--num-cpus", type=int, default=None)
    args = parser.parse_args(argv)

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from entity_resolution_ray.tuning import apply_context_defaults

    apply_context_defaults()
    metrics = run_er_job(args.input, args.out)
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
