"""Flagship entity-resolution pipeline (SURVEY.md §3.4 target lifecycle).

read documents → normalize (derive entity_name/content from spans) →
feature tagger (actor pool) → hashed-TF vectorize + distributed IDF fit →
groupby(block_key) candidate pairs (feature-intersection weights + within-
block TF-IDF cosine) → PairScorer actor pool (JW + media cosine + boost,
threshold, DOB negative evidence) → distributed connected components →
cluster table with spans preserved.

Reference end-to-end analogue: ``python -m am_combiner`` with the
``TFIDFAndFeaturesCosineSimilarityCombiner`` flagship
(``am_combiner/__main__.py:327-640``), restated Ray-Data-first.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data as rd

from entity_resolution_ray import schema as S
from entity_resolution_ray.stages.blocking import block_candidate_pairs
from entity_resolution_ray.stages.clustering import assign_clusters
from entity_resolution_ray.stages.features import extract_features
from entity_resolution_ray.stages.normalize import normalize
from entity_resolution_ray.stages.scoring import ScoreConfig, score_pairs
from entity_resolution_ray.stages.vectorize import add_tf_columns, broadcast_idf, fit_idf


@dataclass
class ERConfig:
    score: ScoreConfig = field(default_factory=ScoreConfig)
    all_pairs_cap: int = 1200
    posting_cap: int = 500
    tf_dim: int = 1 << 18
    cc_mode: str = "labelprop"  # or "local"
    use_idf: bool = True
    concurrency: tuple = (1, 8)
    # single-file fixtures read as one block; spread them so the feature
    # stages parallelize (real 100TB inputs arrive pre-sharded)
    min_read_partitions: int = 16


def read_documents(path: str, min_partitions: int = 16):
    """documents table (doc_id, spans) from parquet (lance-shaped).

    ``override_num_blocks`` spreads single-file fixtures across workers; real
    100TB inputs arrive pre-sharded and use the natural file partitioning.
    """
    return rd.read_parquet(path, override_num_blocks=min_partitions)


def featured_documents(docs_ds, cfg: ERConfig | None = None):
    cfg = cfg or ERConfig()
    try:
        if docs_ds.num_blocks() < cfg.min_read_partitions:
            docs_ds = docs_ds.repartition(cfg.min_read_partitions)
    except NotImplementedError:
        pass  # lazy dataset: reads already set override_num_blocks
    ds = normalize(docs_ds)
    ds = extract_features(ds, concurrency=cfg.concurrency)
    ds = add_tf_columns(ds, dim=cfg.tf_dim, concurrency=cfg.concurrency)
    return ds


def scored_pairs(featured_ds, cfg: ERConfig | None = None):
    """featured docs → scored candidate-pair (edge) table."""
    cfg = cfg or ERConfig()
    idf_ref = None
    if cfg.use_idf:
        # second pass over the (checkpointable) featured table; the partials
        # are fixed-size vectors, not data-sized driver state
        idf = fit_idf(featured_ds, dim=cfg.tf_dim)
        idf_ref = broadcast_idf(idf)
    pairs = block_candidate_pairs(
        featured_ds,
        idf_ref=idf_ref,
        all_pairs_cap=cfg.all_pairs_cap,
        posting_cap=cfg.posting_cap,
        tf_dim=cfg.tf_dim,
    )
    return score_pairs(pairs, config=cfg.score, concurrency=cfg.concurrency)


def cluster_documents(docs_path: str, cfg: ERConfig | None = None):
    """End-to-end: documents parquet path → Dataset with cluster_id per doc.

    Returns (clusters_ds, scored_edges_ds); clusters_ds preserves the spans
    column untouched (per-row span-sequence invariant).
    """
    cfg = cfg or ERConfig()
    docs = read_documents(docs_path)
    featured = featured_documents(docs, cfg)
    # featured is consumed by three downstream passes (idf fit, pair-gen,
    # cluster attach) — materialize once instead of recomputing the tagger
    featured = featured.materialize()
    edges_all = scored_pairs(featured, cfg).materialize()
    accepted = edges_all.map_batches(
        lambda t: t.filter(t["accepted"]), batch_format="pyarrow"
    )
    keep_cols = [S.DOC_ID, S.SPANS, S.ENTITY_NAME, S.BLOCK_KEY, S.CONTENT]
    docs_slim = featured.select_columns(keep_cols)
    clustered = assign_clusters(
        docs_slim, accepted.select_columns([S.BLOCK_KEY, "src", "dst"]),
        mode=cfg.cc_mode,
    )
    return clustered, edges_all
