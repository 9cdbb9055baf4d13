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
from entity_resolution_ray.stages.normalize import normalize
from entity_resolution_ray.stages.scoring import ScoreConfig, score_pairs
from entity_resolution_ray.stages.vectorize import broadcast_idf


@dataclass
class ERConfig:
    score: ScoreConfig = field(default_factory=ScoreConfig)
    all_pairs_cap: int = 1200
    posting_cap: int = 500
    tf_dim: int = 1 << 18
    cc_mode: str = "labelprop"  # or "local"
    use_idf: bool = True
    salt_threshold: int = 2000
    # second vector space: feature-string TF cosine channel (reference
    # ``FullArticleFeaturesTextVectoriser``); pairs gain a ftr_cos column
    # and the score adds ScoreConfig.w_ftr × ftr_cos
    use_feature_tfidf: bool = False
    concurrency: tuple | None = None  # None → (1, cluster CPUs)
    # actor pools pay ~5s startup per stage per run; for the cheap built-in
    # kernels (regex tagger, hashing vectorizer, JW scorer) a stateless task
    # with a per-worker-process cache gives identical semantics without the
    # ramp.  Set True when stages hold genuinely expensive state (real NER /
    # embedding models) so setup amortizes across batches per actor.
    use_actor_pools: bool = False
    # CPU *reservation* per pool actor (not a cap — an actor busy on a
    # batch uses a whole core).  Near-zero reservation is deliberate: the
    # pool's kernels are cheap next to the pair-gen shuffle feeding it, so
    # a full-width pool (one actor per cluster CPU) must not book CPUs
    # away from the shuffle while its actors sit idle waiting on it.  At
    # 0.05 the shuffle keeps effectively the whole cluster and scoring
    # oversubscribes harmlessly; measured flagship pool/stateless ratio
    # 1.045 @1.2M docs (vs 1.27 at 0.25, 1.45 at width-3/4 × 1.0 CPU) —
    # the residual gap at small corpora is the ~1.5-2s/stage actor spinup.
    # Raise toward 1.0 only if per-batch pool work dominates the pipeline
    # (real NER / embedding models), where the reservation is honest.
    pool_num_cpus: float = 0.05
    # single-file fixtures read as one block; spread them so the feature
    # stages parallelize (real 100TB inputs arrive pre-sharded)
    min_read_partitions: int = 128
    # sidecar JSON path for the per-block-size timing histogram (reference
    # all_combiners_time_performance.csv, combiners/common.py:246-261);
    # None disables collection entirely (zero hot-path cost)
    timing_report: str | None = None


def read_documents(path: str, min_partitions: int = 64):
    """documents table (doc_id, spans) from a Lance dataset or parquet.

    The north rule's input contract is a Lance table; a path ending in
    ``.lance`` (or a Lance dataset directory, marked by ``_versions/``)
    routes through ``ray.data.read_lance`` — column projection and fragment
    parallelism come from the Lance format itself.  The ``pylance`` package
    is not in this container, so the Lance branch is an import-gated seam
    (exercised by mock in tests); everything downstream is identical.
    ``override_num_blocks`` spreads single-file parquet fixtures across
    workers; real 100TB inputs arrive pre-sharded and use the natural file
    partitioning.
    """
    import os

    is_lance = str(path).endswith(".lance") or os.path.isdir(
        os.path.join(str(path), "_versions")
    )
    if is_lance:
        try:
            import lance  # noqa: F401  (pylance provides the `lance` module)
        except ImportError as e:
            raise ImportError(
                "reading a Lance dataset requires the 'pylance' package; "
                "install it or point read_documents at a parquet copy"
            ) from e
        return rd.read_lance(path, columns=["doc_id", "spans"])
    return rd.read_parquet(path, override_num_blocks=min_partitions)


# fused tag+vectorize kernel, usable as an actor class or via the
# per-worker-process singleton cache below
class TagAndVectorize:
    def __init__(self, dim: int):
        from entity_resolution_ray.stages.features import FeatureTagger
        from entity_resolution_ray.stages.vectorize import TfVectorizer

        self.tag = FeatureTagger()
        self.vec = TfVectorizer(dim)

    def __call__(self, batch):
        return self.vec(self.tag(batch))


_SINGLETONS: dict = {}


def _worker_singleton(cls, **kwargs):
    """Construct-once-per-worker-process stage state (the stateless-task
    equivalent of actor ``__init__``)."""
    key = (cls.__qualname__, tuple(sorted(kwargs.items())))
    inst = _SINGLETONS.get(key)
    if inst is None:
        inst = cls(**kwargs)
        _SINGLETONS[key] = inst
    return inst


def _pool_size(cfg: "ERConfig") -> tuple:
    if cfg.concurrency is not None:
        return cfg.concurrency
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    # FIXED-size pool (min == max): all actors start at stage start (no
    # autoscaling ramp).  Full width (one actor per CPU) is safe because
    # each actor reserves only cfg.pool_num_cpus — the feeding read/
    # shuffle tasks keep the unreserved CPUs, so the pool streams from
    # the pair-gen shuffle with no materialize barrier and no deadlock.
    n = max(2, cpus)
    return (n, n)


def featured_documents(docs_ds, cfg: ERConfig | None = None):
    cfg = cfg or ERConfig()
    try:
        if docs_ds.num_blocks() < cfg.min_read_partitions:
            docs_ds = docs_ds.repartition(cfg.min_read_partitions)
    except NotImplementedError:
        pass  # lazy dataset: reads already set override_num_blocks
    ds = normalize(docs_ds)
    if cfg.use_actor_pools:
        out = ds.map_batches(
            TagAndVectorize,
            fn_constructor_kwargs={"dim": cfg.tf_dim},
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=_pool_size(cfg),
            num_cpus=cfg.pool_num_cpus,
        )
    else:
        dim = cfg.tf_dim

        def tag_vectorize(batch):
            return _worker_singleton(TagAndVectorize, dim=dim)(batch)

        out = ds.map_batches(tag_vectorize, batch_format="pyarrow", batch_size=1024)
    if cfg.use_feature_tfidf:
        from entity_resolution_ray.stages.vectorize import FeatureStringVectorizer

        dim = cfg.tf_dim

        def ftr_vectorize(batch):
            return _worker_singleton(FeatureStringVectorizer, dim=dim)(batch)

        out = out.map_batches(ftr_vectorize, batch_format="pyarrow", batch_size=1024)
    return out


def scored_pairs(featured_ds, cfg: ERConfig | None = None, timing_actor=None):
    """featured docs → scored candidate-pair (edge) table."""
    cfg = cfg or ERConfig()
    # two bounded passes over the materialized featured table: the IDF fold
    # (one fixed-size blob per batch) and the hot-block census (bucketed
    # groupby, only keys over the salt threshold reach the driver) — driver
    # state stays corpus-size-independent
    from entity_resolution_ray.stages.blocking import hot_block_sizes
    from entity_resolution_ray.stages.vectorize import fit_idf

    idf = (
        fit_idf(featured_ds.select_columns(["tf_idx"]), dim=cfg.tf_dim)
        if cfg.use_idf else None
    )
    block_sizes = hot_block_sizes(
        featured_ds.select_columns([S.BLOCK_KEY]), S.BLOCK_KEY,
        cfg.salt_threshold,
    )
    idf_ref = broadcast_idf(idf) if cfg.use_idf else None
    pairs = block_candidate_pairs(
        featured_ds,
        idf_ref=idf_ref,
        block_sizes=block_sizes,
        salt_threshold=cfg.salt_threshold,
        all_pairs_cap=cfg.all_pairs_cap,
        posting_cap=cfg.posting_cap,
        tf_dim=cfg.tf_dim,
        timing_actor=timing_actor,
    )
    if cfg.use_actor_pools:
        conc = _pool_size(cfg)
        if conc[0] == conc[1]:
            # fixed-size pool: every actor starts at stage start, so the
            # slow-autoscaling-ramp problem the materialize barrier worked
            # around doesn't exist — stream straight through (r4 task 5)
            return score_pairs(pairs, config=cfg.score, concurrency=conc,
                               num_cpus=cfg.pool_num_cpus)
        # autoscaling pool: materialize before it — a streaming sort-shuffle
        # → autoscaling actor pool chain ramps the pool too slowly
        # (measured 3× slower)
        pairs = pairs.materialize()
        return score_pairs(pairs, config=cfg.score, concurrency=conc,
                           num_cpus=cfg.pool_num_cpus)

    from entity_resolution_ray.stages.scoring import PairScorer

    score_cfg = cfg.score
    key = ("PairScorer", repr(score_cfg))

    def score_fn(batch):
        inst = _SINGLETONS.get(key)
        if inst is None:
            inst = PairScorer(score_cfg)
            _SINGLETONS[key] = inst
        return inst(batch)

    return pairs.map_batches(score_fn, batch_format="pyarrow", batch_size=16384)


def cluster_documents(docs_path: str, cfg: ERConfig | None = None):
    """End-to-end: documents parquet path → Dataset with cluster_id per doc.

    Returns (clusters_ds, scored_edges_ds); clusters_ds preserves the spans
    column untouched (per-row span-sequence invariant).
    """
    import os
    import time

    profile = os.environ.get("ER_PROFILE")
    t0 = time.time()

    def _mark(stage):
        nonlocal t0
        if profile:
            print(f"[er {stage}] {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()

    cfg = cfg or ERConfig()
    # NB: Ray's sort-shuffle partitioning follows the input block count, so
    # this knob also sets downstream groupby task granularity.  ~128 blocks
    # measured best at 32 CPUs / 1.2M docs — more partitions (256+) blow up
    # shuffle fragment-transfer counts and cost far more than the straggler
    # smoothing they buy
    docs = read_documents(docs_path, min_partitions=cfg.min_read_partitions)
    featured = featured_documents(docs, cfg)
    # featured is consumed by three downstream passes (idf fit, pair-gen,
    # cluster attach) — materialize once instead of recomputing the tagger.
    # Prune to the union of downstream payloads first: content (the widest
    # column), media_refs, name_tokens and the secondary phonetic keys are
    # consumed inside the fused tag+vectorize stage and would otherwise ride
    # the object store (and every later select_columns read) for nothing —
    # ~40% of the materialized bytes at 1.2M docs
    from entity_resolution_ray.stages.blocking import PAIR_PAYLOAD_COLS

    pipeline_cols = list(PAIR_PAYLOAD_COLS) + [S.SPANS]
    if cfg.use_feature_tfidf:
        pipeline_cols += ["ftr_idx", "ftr_cnt"]
    featured = featured.select_columns(pipeline_cols).materialize()
    _mark("featured")
    if featured.count() == 0:
        # empty corpus (a filter can empty a shard at scale): return typed
        # empty outputs instead of probing schemas off schema-less datasets
        import pyarrow as pa

        import ray.data as rd

        edge_schema = pa.schema([
            (S.BLOCK_KEY, pa.string()), ("src", pa.string()),
            ("dst", pa.string()), ("weight", pa.float64()),
            ("cosine", pa.float64()), ("ftr_cos", pa.float64()),
            ("jw", pa.float64()), ("media_cos", pa.float64()),
            ("neg_dob", pa.bool_()), ("score", pa.float64()),
            ("accepted", pa.bool_()),
        ])
        clustered_schema = pa.schema([
            (S.DOC_ID, pa.string()), (S.SPANS, pa.list_(S.SPAN_STRUCT)),
            (S.ENTITY_NAME, pa.string()), (S.BLOCK_KEY, pa.string()),
            ("cluster_id", pa.string()),
        ])
        return (rd.from_arrow(clustered_schema.empty_table()),
                rd.from_arrow(edge_schema.empty_table()))
    timing_actor = None
    if cfg.timing_report:
        import ray

        from entity_resolution_ray.state.timings import BlockTimingCollector

        timing_actor = BlockTimingCollector.remote()
    edges_all = scored_pairs(featured, cfg, timing_actor=timing_actor).materialize()
    if timing_actor is not None:
        import ray

        from entity_resolution_ray.state.timings import write_timing_report

        write_timing_report(
            cfg.timing_report, ray.get(timing_actor.summary.remote())
        )
        ray.kill(timing_actor)
    _mark("scored_pairs")
    # accepted stays LAZY: a cheap filter map over the materialized edge
    # table — re-executing it inside the CC passes costs less than another
    # materialize barrier (serial-floor accounting, BASELINE.md)
    accepted = edges_all.map_batches(
        lambda t: t.select([S.BLOCK_KEY, "src", "dst"]).filter(t["accepted"]),
        batch_format="pyarrow",
    )
    _mark("accepted")
    keep_cols = [S.DOC_ID, S.SPANS, S.ENTITY_NAME, S.BLOCK_KEY]
    docs_slim = featured.select_columns(keep_cols)
    # dispatch hint = ACCEPTED edge count (one cheap filter pass over the
    # materialized edge table): the all-edges count overshoots the broadcast
    # cap ~3-10x and forced the label attach onto the partitioned cogroup —
    # a full shuffle of the spans-carrying docs table that the sorted-array
    # broadcast avoids whenever 2x accepted edges fits the cap
    clustered = assign_clusters(
        docs_slim, accepted, mode=cfg.cc_mode,
        n_edges_hint=accepted.count(),
    )
    _mark("assign")
    return clustered, edges_all
