"""Actor-pool amortization proofs (VERDICT r3 #3): the engine's claim that
expensive per-stage state is built once per ACTOR (not per batch) must hold
on a genuinely expensive ``__init__``, and the flagship's
``use_actor_pools=True`` path must produce the same clusters as the
stateless-task default."""

import hashlib
import os

import pyarrow as pa
import pytest
import ray
import ray.data as rd


@ray.remote
class _InitCounter:
    def __init__(self):
        self.n = 0

    def incr(self):
        self.n += 1
        return self.n

    def get(self):
        return self.n


def test_heavy_init_amortizes_across_batches():
    """A 64 MiB / 0.5 s synthetic model load behind map_batches(cls,
    concurrency=2) is constructed exactly twice (once per actor) while many
    batches flow through each actor."""
    from entity_resolution_ray.stages.features import HeavyInitTagger

    name = "init_counter_test"
    counter = _InitCounter.options(name=name).remote()

    n_rows, batch_size, n_actors = 4000, 100, 2
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [f"d{i}" for i in range(n_rows)],
                "entity_name": ["John Smith"] * n_rows,
                "content": ["John Smith works at Acme Corp in Paris."] * n_rows,
            }
        )
    ).repartition(8)

    out = docs.map_batches(
        HeavyInitTagger,
        fn_constructor_kwargs={
            "state_mb": 64,
            "load_sec": 0.5,
            "counter_name": name,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=n_actors,
    )
    assert out.count() == n_rows  # every batch processed
    inits = ray.get(counter.get.remote())
    assert inits == n_actors, f"expected {n_actors} constructions, got {inits}"
    ray.kill(counter)


def test_flagship_actor_pool_parity():
    """use_actor_pools=True (TagAndVectorize + PairScorer as actor pools)
    must produce byte-identical clusters to the stateless-task default."""
    from entity_resolution_ray.fixtures.generator import fixture_dir_for
    from entity_resolution_ray.pipelines.er import ERConfig, cluster_documents

    fx = fixture_dir_for(1000)
    path = os.path.join(fx, "documents.parquet")

    def run(cfg):
        clustered, _ = cluster_documents(path, cfg)
        df = (
            clustered.select_columns(["doc_id", "cluster_id"])
            .to_pandas()
            .sort_values("doc_id")
        )
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    h_task = run(ERConfig())
    h_pool = run(ERConfig(use_actor_pools=True, concurrency=(2, 2)))
    assert h_task == h_pool
