"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) initializes or shuts down Ray.

- ``entry()``    — flagship entity-resolution pipeline on a deterministic
  interleaved-span corpus at smoke scale; returns the cluster table.
- ``queries()``  — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data additions); each takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query,
  with matching output column names and roundings.  ER/minhash/simhash
  pipelines are not SQL-expressible (stateful models, LSH, transitive
  closure) and get the driver's rows-only check.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from typing import Any

import numpy as np


# --- scale mapping for the synthesized ER corpus ---------------------------
def _er_docs_for(sf_dir: str) -> int:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.001
    return int(min(200_000, max(800, sf * 2_000_000)))


def _er_corpus(sf_dir: str) -> str:
    from entity_resolution_ray.fixtures.generator import fixture_dir_for

    return fixture_dir_for(_er_docs_for(sf_dir))


_CLUSTERED_CACHE: dict[str, object] = {}


def _er_clusters(sf_dir: str):
    """Flagship cluster table, materialized once per process: the sizes
    histogram (and any later consumer) reuses it instead of re-running the
    whole blocking/scoring/CC chain."""
    import os

    from entity_resolution_ray.pipelines.er import ERConfig, cluster_documents

    fx = _er_corpus(sf_dir)
    cached = _CLUSTERED_CACHE.get(fx)
    if cached is None:
        clustered, _ = cluster_documents(
            os.path.join(fx, "documents.parquet"), ERConfig()
        )
        cached = clustered.select_columns(
            ["doc_id", "entity_name", "block_key", "cluster_id"]
        ).materialize()
        _CLUSTERED_CACHE.clear()  # hold one corpus at a time
        _CLUSTERED_CACHE[fx] = cached
    return cached


def _er_cluster_sizes(sf_dir: str):
    from ray.data.aggregate import Count

    from entity_resolution_ray.stages.aggregate import grouped_aggregate

    clustered = _er_clusters(sf_dir)
    sizes = grouped_aggregate(
        clustered, "cluster_id", {"n_docs": ("doc_id", "size")}
    )
    return sizes.groupby("n_docs").aggregate(Count(alias_name="n_clusters"))


def _er_cluster_sizes_canon(sf_dir: str):
    """Flagship cluster-size census under a SQL oracle.  The flagship's
    cluster labels are hash-valued (hex of the component's min doc-id hash)
    so the raw ``er_cluster_sizes`` stays rows-only, but the SIZE HISTOGRAM
    is label-invariant: the given data (doc universe + accepted pairs, both
    deterministic and themselves hash-oracled via ``er_scored_pairs_canon``)
    goes to parquet and DuckDB independently re-derives the connected
    components with a recursive CTE, then the same (n_docs, n_clusters)
    census — pinning the whole CC + census chain end-to-end (reference
    census analogue: `am_combiner/qa/cluster_stats` size distribution)."""
    import shutil

    import pyarrow as pa
    from ray.data.aggregate import Count

    from entity_resolution_ray.pipelines.er import ERConfig, scored_pairs
    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.clustering import assign_clusters

    cfg = ERConfig()
    featured = _er_featured(sf_dir)
    edges = scored_pairs(featured, cfg).materialize()
    accepted = edges.map_batches(
        lambda t: t.select(["block_key", "src", "dst"]).filter(t["accepted"]),
        batch_format="pyarrow",
    ).materialize()
    docs = featured.select_columns(["doc_id"]).materialize()

    docs_dir = "/tmp/er_pair_oracle/census_docs"
    pairs_dir = "/tmp/er_pair_oracle/census_pairs"
    shutil.rmtree(docs_dir, ignore_errors=True)
    shutil.rmtree(pairs_dir, ignore_errors=True)
    docs.write_parquet(docs_dir)
    accepted.select_columns(["src", "dst"]).write_parquet(pairs_dir)

    clustered = assign_clusters(docs, accepted,
                                n_edges_hint=accepted.count())
    sizes = grouped_aggregate(
        clustered, "cluster_id", {"n_docs": ("doc_id", "size")}, num_buckets=8
    )
    return sizes.groupby("n_docs").aggregate(Count(alias_name="n_clusters"))


ER_CLUSTER_SIZES_SQL = """
with recursive docs as (
  select doc_id from read_parquet('/tmp/er_pair_oracle/census_docs/*.parquet')
),
pos as (
  select distinct src, dst
  from read_parquet('/tmp/er_pair_oracle/census_pairs/*.parquet')
),
bi as (select src as a, dst as b from pos union select dst, src from pos),
reach as (
  select doc_id as node, doc_id as r from docs
  union
  select bi.a, reach.r from bi join reach on reach.node = bi.b
),
comp as (select node, min(r) as rep from reach group by node),
sizes as (select rep, count(*) as n_docs from comp group by rep)
select n_docs, count(*) as n_clusters from sizes group by n_docs
"""


def _er_clusters_canon(sf_dir: str):
    """Flagship cluster MEMBERSHIP under a SQL oracle — strictly stronger
    than the size census: every (doc_id, cluster_rep) assignment is pinned,
    where cluster_rep is the lexicographic-min doc_id of the connected
    component (a label-invariant canonical relabel of the engine's
    hash-valued cluster ids).  Given data = doc universe + accepted pairs
    (both deterministic, pairs themselves hash-oracled via
    ``er_scored_pairs_canon``) written to parquet; DuckDB re-derives the
    components with a recursive CTE and emits the same canonical labels
    (reference parity: `am_combiner/combiners/graph_based.py:12-69`
    cluster assignment, here over the flagship scorer's accept set)."""
    import shutil

    from entity_resolution_ray.pipelines.er import ERConfig, scored_pairs
    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.clustering import assign_clusters
    from entity_resolution_ray.stages.joins import hash_join

    cfg = ERConfig()
    featured = _er_featured(sf_dir)
    edges = scored_pairs(featured, cfg).materialize()
    accepted = edges.map_batches(
        lambda t: t.select(["block_key", "src", "dst"]).filter(t["accepted"]),
        batch_format="pyarrow",
    ).materialize()
    docs = featured.select_columns(["doc_id"]).materialize()

    docs_dir = "/tmp/er_pair_oracle/members_docs"
    pairs_dir = "/tmp/er_pair_oracle/members_pairs"
    shutil.rmtree(docs_dir, ignore_errors=True)
    shutil.rmtree(pairs_dir, ignore_errors=True)
    docs.write_parquet(docs_dir)
    accepted.select_columns(["src", "dst"]).write_parquet(pairs_dir)

    clustered = assign_clusters(docs, accepted,
                                n_edges_hint=accepted.count())
    reps = grouped_aggregate(
        clustered, "cluster_id", {"cluster_rep": ("doc_id", "min")},
        num_buckets=8,
    )
    out = hash_join(clustered, reps, on="cluster_id", num_buckets=8)
    return out.select_columns(["doc_id", "cluster_rep"])


ER_CLUSTERS_CANON_SQL = """
with recursive docs as (
  select doc_id from read_parquet('/tmp/er_pair_oracle/members_docs/*.parquet')
),
pos as (
  select distinct src, dst
  from read_parquet('/tmp/er_pair_oracle/members_pairs/*.parquet')
),
bi as (select src as a, dst as b from pos union select dst, src from pos),
reach as (
  select doc_id as node, doc_id as r from docs
  union
  select bi.a, reach.r from bi join reach on reach.node = bi.b
),
comp as (select node, min(r) as rep from reach group by node)
select node as doc_id, rep as cluster_rep from comp
"""


def _er_scored_pairs(sf_dir: str):
    from entity_resolution_ray.pipelines.er import ERConfig, scored_pairs

    return scored_pairs(_er_featured(sf_dir), ERConfig()).select_columns(
        ["block_key", "src", "dst", "weight", "cosine", "jw", "score", "accepted"]
    )


def _dedup_minhash_clusters(sf_dir: str):
    import ray.data as rd

    from entity_resolution_ray.pipelines.relational import JACCARD_TH
    from entity_resolution_ray.stages.dedup import (
        jaccard_neardup_pairs,
        neardup_clusters,
    )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=16,
    )
    pairs = jaccard_neardup_pairs(
        ds, threshold=JACCARD_TH, ngram=3, num_perm=128, num_bands=64
    ).materialize()
    if pairs.count() == 0:
        import pandas as pd

        return pd.DataFrame({"node": np.empty(0, np.int64),
                             "label": np.empty(0, np.int64)})
    return neardup_clusters(pairs, num_buckets=8)


def _simhash_pairs(sf_dir: str):
    import ray.data as rd

    from entity_resolution_ray.stages.dedup import simhash_neardup_pairs

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=16,
    )
    return simhash_neardup_pairs(ds, max_hamming=16)


# Bit-exact SQL restatement of SimHash banding: the token hash is DuckDB's
# md5_number_lower by construction (functions/minhash.py:simhash_batch), so
# signature, 4x16-bit band candidate join, and Hamming verify all reproduce
# in plain SQL.  This oracle caught a real float64-promotion bug in the
# verify kernel (int64 sig + python-int 2^63 rounds the low bits off).
SIMHASH_PAIRS_SQL = """
with toks as (
  select doc_id,
         unnest(regexp_extract_all(lower(strip_accents(text)), '[a-z0-9]+')) as tok
  from documents
), tf as (
  select doc_id, tok, count(*)::bigint as cnt from toks group by 1, 2
), bits as (
  select doc_id, b.bit,
         sum((((md5_number_lower(tok) >> b.bit::int) & 1::ubigint)::bigint * 2 - 1) * cnt) as s
  from tf cross join (select unnest(range(64)) as bit) b
  group by 1, 2
), sig as (
  select doc_id,
         sum(case when s > 0 then (1::ubigint << bit::int) else 0::ubigint end)::ubigint as sg
  from bits group by 1
), bands as (
  select doc_id, b.band,
         ((sg >> (16 * b.band)::int) & 65535::ubigint) as band_key, sg
  from sig cross join (select unnest(range(4)) as band) b
), cand as (
  select distinct a.doc_id as src, b.doc_id as dst, a.sg as sga, b.sg as sgb
  from bands a join bands b
    on a.band = b.band and a.band_key = b.band_key and a.doc_id < b.doc_id
)
select src, dst, bit_count(xor(sga, sgb))::bigint as hamming
from cand
where bit_count(xor(sga, sgb)) <= 16
"""


def _ann_lsh(sf_dir: str):
    import ray.data as rd

    from entity_resolution_ray.stages.ann import lsh_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", override_num_blocks=16)
    qdf = ds.sort("vec_id").limit(8).to_pandas()
    return lsh_topk(
        ds, qdf["vec_id"].to_numpy(), np.stack(qdf["embedding"].to_list()), k=5
    )


def _ann_lsh_recall(sf_dir: str):
    """LSH-ANN recall pinned against the (already-oracled) exact top-k
    (VERDICT r4 task 9): the approximate neighbor lists are written to a
    parquet the oracle reads as given data; the exact side and the per-query
    overlap count are recomputed independently by the SQL from the
    embeddings view, so a recall regression or a neighbor-set drift breaks
    the hash."""
    import shutil

    import pandas as pd

    from entity_resolution_ray.pipelines import relational as R

    lsh = _ann_lsh(sf_dir).materialize()
    oracle_dir = "/tmp/er_pair_oracle/ann_lsh"
    shutil.rmtree(oracle_dir, ignore_errors=True)
    lsh.select_columns(["query_id", "neighbor_id"]).write_parquet(oracle_dir)

    exact = R.q_ann_topk(sf_dir)

    def flag(side):
        def add(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[["query_id", "neighbor_id"]].copy()
            out["side"] = side
            return out

        return add

    both = lsh.map_batches(flag("lsh"), batch_format="pandas").union(
        exact.map_batches(flag("exact"), batch_format="pandas")
    )

    def per_query(g: pd.DataFrame) -> pd.DataFrame:
        lsh_set = set(g.loc[g["side"] == "lsh", "neighbor_id"])
        ex = g.loc[g["side"] == "exact", "neighbor_id"]
        n_hit = int(ex.isin(lsh_set).sum())
        return pd.DataFrame(
            {
                "query_id": pd.Series([g["query_id"].iloc[0]]),
                "n_hit": pd.Series([n_hit], dtype="int64"),
                "recall": pd.Series([n_hit / len(ex)], dtype="float64"),
            }
        )

    return both.groupby("query_id").map_groups(per_query, batch_format="pandas")


ANN_LSH_RECALL_SQL = f"""
with lsh as (
  select query_id, neighbor_id
  from read_parquet('/tmp/er_pair_oracle/ann_lsh/*.parquet')
),
e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
q as (select * from e order by vec_id limit 8),
scored as (
  select q.vec_id as query_id, e.vec_id as neighbor_id,
         round(list_inner_product(q.v, e.v)
               / (sqrt(list_inner_product(q.v, q.v))
                  * sqrt(list_inner_product(e.v, e.v))), 6) as cosine
  from q join e on e.vec_id != q.vec_id
),
exact as (
  select query_id, neighbor_id from (
    select *, row_number() over (partition by query_id
                                 order by cosine desc, neighbor_id asc) as rn
    from scored) where rn <= 5
),
hits as (
  select x.query_id, count(l.neighbor_id)::bigint as n_hit,
         count(*)::bigint as k
  from exact x left join lsh l using (query_id, neighbor_id)
  group by x.query_id
)
select query_id, n_hit, n_hit::double / k as recall from hits
"""

# identical recall harness for the IVF tier; only the given-data path differs
ANN_IVF_RECALL_SQL = ANN_LSH_RECALL_SQL.replace(
    "er_pair_oracle/ann_lsh", "er_pair_oracle/ann_ivf"
)


def _ann_ivf_recall(sf_dir: str):
    """IVF-ANN recall pinned against the exact top-k, same harness as
    ``_ann_lsh_recall``: the probe results are written to a parquet the
    oracle reads as given data; the exact side and per-query overlap are
    recomputed independently in SQL.  nprobe=4 of 16 lists scans ~1/4 of
    the corpus, so recall dips exactly where a true neighbor lives in an
    unprobed list — the pinned hash surfaces any probe-routing
    regression."""
    import shutil

    import pandas as pd

    from entity_resolution_ray.pipelines import relational as R

    ivf = _ann_ivf(sf_dir).materialize()
    oracle_dir = "/tmp/er_pair_oracle/ann_ivf"
    shutil.rmtree(oracle_dir, ignore_errors=True)
    ivf.select_columns(["query_id", "neighbor_id"]).write_parquet(oracle_dir)

    exact = R.q_ann_topk(sf_dir)

    def flag(side):
        def add(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[["query_id", "neighbor_id"]].copy()
            out["side"] = side
            return out

        return add

    both = ivf.map_batches(flag("lsh"), batch_format="pandas").union(
        exact.map_batches(flag("exact"), batch_format="pandas")
    )

    def per_query(g: pd.DataFrame) -> pd.DataFrame:
        approx_set = set(g.loc[g["side"] == "lsh", "neighbor_id"])
        ex = g.loc[g["side"] == "exact", "neighbor_id"]
        n_hit = int(ex.isin(approx_set).sum())
        return pd.DataFrame(
            {
                "query_id": pd.Series([g["query_id"].iloc[0]]),
                "n_hit": pd.Series([n_hit], dtype="int64"),
                "recall": pd.Series([n_hit / len(ex)], dtype="float64"),
            }
        )

    return both.groupby("query_id").map_groups(per_query, batch_format="pandas")


def _embedding_lsh_recall(sf_dir: str):
    """Pair-level recall of the LSH-bucketed embedding near-dup tier vs the
    exact BNL pairs (both already driver queries): the LSH pair set is
    written to a parquet the oracle reads as given data; the exact pair
    set, overlap, spurious count, and recall are recomputed independently
    in SQL from the embeddings view.  The in-bucket verify is an exact
    cosine, so n_spurious must be 0 — a nonzero value (or a recall drift)
    breaks the hash."""
    import shutil

    import pandas as pd

    from entity_resolution_ray.pipelines import relational as R

    lsh = R.q_embedding_neardup_lsh(sf_dir).materialize()
    oracle_dir = "/tmp/er_pair_oracle/embedding_lsh"
    shutil.rmtree(oracle_dir, ignore_errors=True)
    lsh.select_columns(["src", "dst"]).write_parquet(oracle_dir)

    exact = R.q_embedding_neardup(sf_dir)

    def flag(side):
        def add(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[["src", "dst"]].copy()
            out["side"] = side
            return out

        return add

    both = lsh.map_batches(flag("lsh"), batch_format="pandas").union(
        exact.map_batches(flag("exact"), batch_format="pandas")
    )

    def per_pair(g: pd.DataFrame) -> pd.DataFrame:
        sides = set(g["side"])
        return pd.DataFrame(
            {
                "in_lsh": pd.Series([int("lsh" in sides)], dtype="int64"),
                "in_exact": pd.Series([int("exact" in sides)], dtype="int64"),
            }
        )

    flags = both.groupby(["src", "dst"]).map_groups(
        per_pair, batch_format="pandas"
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_lsh": pd.Series([int(batch["in_lsh"].sum())], dtype="int64"),
                "n_exact": pd.Series(
                    [int(batch["in_exact"].sum())], dtype="int64"),
                "n_hit": pd.Series(
                    [int((batch["in_lsh"] & batch["in_exact"]).sum())],
                    dtype="int64"),
            }
        )

    parts = flags.map_batches(partial, batch_format="pandas").take_all()
    n_lsh = sum(r["n_lsh"] for r in parts)
    n_exact = sum(r["n_exact"] for r in parts)
    n_hit = sum(r["n_hit"] for r in parts)
    import math

    recall = (
        math.floor(n_hit / n_exact * 1e6 + 0.5) / 1e6 if n_exact else 1.0
    )
    return pd.DataFrame(
        [{
            "n_lsh": n_lsh, "n_exact": n_exact, "n_hit": n_hit,
            "n_spurious": n_lsh - n_hit, "recall": recall,
        }]
    )


EMBEDDING_LSH_RECALL_SQL = """
with lshp as (
  select distinct src, dst
  from read_parquet('/tmp/er_pair_oracle/embedding_lsh/*.parquet')
),
e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
exact as (
  select a.vec_id as src, b.vec_id as dst
  from e a join e b on a.vec_id < b.vec_id
  where list_inner_product(a.v, b.v)
        / (sqrt(list_inner_product(a.v, a.v))
           * sqrt(list_inner_product(b.v, b.v))) >= 0.45
),
c as (
  select (select count(*) from lshp) as n_lsh,
         (select count(*) from exact) as n_exact,
         (select count(*) from exact x join lshp l using (src, dst)) as n_hit
)
select n_lsh::BIGINT as n_lsh, n_exact::BIGINT as n_exact,
       n_hit::BIGINT as n_hit, (n_lsh - n_hit)::BIGINT as n_spurious,
       case when n_exact > 0
            then floor(n_hit / n_exact * 1000000 + 0.5) / 1000000
            else 1.0 end as recall
from c
"""


def _ivf_cache_dir(src: str) -> str:
    """Content-stable index location for a corpus file: md5 of
    (abspath, mtime) — identical across processes, invalidated when the
    corpus is rewritten.  Kept importable so a cross-process test can
    assert tag stability without Ray."""
    import hashlib
    import os

    tag = hashlib.md5(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:16]
    return f"/tmp/ivf_index_{tag}"


def _sweep_stale_ivf_dirs(keep: str, max_age_s: float = 86400.0) -> None:
    """Remove /tmp/ivf_index_* directories not touched in a day (stale
    mtime tags from rewritten corpora accumulate otherwise)."""
    import glob
    import os
    import shutil
    import time

    now = time.time()
    for d in glob.glob("/tmp/ivf_index_*"):
        if d != keep and now - os.path.getmtime(d) > max_age_s:
            shutil.rmtree(d, ignore_errors=True)


def _ann_ivf(sf_dir: str):
    """IVF index-probing ANN: fit centroids, build the partitioned on-disk
    index once per (sf_dir, mtime), probe only the closest lists per query."""
    import os
    import shutil

    import ray.data as rd

    from entity_resolution_ray.stages.ann import (
        build_ivf_index,
        fit_ivf_centroids,
        ivf_topk,
    )

    src = f"{sf_dir}/embeddings.parquet"
    # content-stable tag (Python's hash() is salted per process and would
    # rebuild the index every run); on a real cluster the index dir should
    # live beside the corpus on the shared filesystem — /tmp here because
    # the corpus dir is read-only in this sandbox
    index_dir = _ivf_cache_dir(src)
    _sweep_stale_ivf_dirs(keep=index_dir)
    cpath = os.path.join(index_dir, "centroids.npy")
    if os.path.exists(cpath):
        centroids = np.load(cpath)
    else:
        shutil.rmtree(index_dir, ignore_errors=True)
        ds = rd.read_parquet(src, override_num_blocks=16)
        centroids = fit_ivf_centroids(ds, nlist=16)
        build_ivf_index(ds, index_dir, centroids)
        np.save(cpath, centroids)
    qds = rd.read_parquet(src, override_num_blocks=16)
    qdf = qds.sort("vec_id").limit(8).to_pandas()
    return ivf_topk(
        index_dir, centroids, qdf["vec_id"].to_numpy(),
        np.stack(qdf["embedding"].to_list()), k=5, nprobe=4,
    )


def _multimodal_features(sf_dir: str):
    """Media plumbing demo: spans corpus media refs → fake decode features."""
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    from entity_resolution_ray.stages.multimodal import (
        attach_fake_payloads,
        decode_media,
    )
    from entity_resolution_ray.stages.normalize import normalize

    fx = _er_corpus(sf_dir)
    docs = rd.read_parquet(
        os.path.join(fx, "documents.parquet"), override_num_blocks=16
    )
    docs = normalize(docs)

    def explode_refs(batch):
        import pyarrow as pa

        ids, refs = [], []
        for doc, rlist in zip(
            batch["doc_id"].to_pylist(), batch["media_refs"].to_pylist()
        ):
            for r in rlist:
                ids.append(doc)
                refs.append(r)
        return pa.table(
            {"doc_id": pa.array(ids, pa.string()),
             "media_ref": pa.array(refs, pa.string())}
        )

    refs = docs.map_batches(explode_refs, batch_format="pyarrow")
    with_payload = attach_fake_payloads(refs)
    return decode_media(with_payload).select_columns(
        ["doc_id", "media_ref", "media_features"]
    )


def _multimodal_pipeline_canon(sf_dir: str):
    """Multimodal frame-sample + resize plumbing under a SQL oracle.  The
    deterministic payloads (given data: byte values + media_meta) go to
    parquet; DuckDB independently re-derives the EVERY-K FRAME SCHEDULE
    (``range(0, max(1, n_frames), 2)``), the per-frame byte-span slicing
    (``span = len // n``), and the 16×16 → 8×8 AVERAGE POOL (each output
    pixel = mean of its 2×2 byte block — sums of ≤4 small ints are exact in
    float32, so the compare is bit-exact without any accumulation-order
    pinning).  The engine side runs the real actor-pool stages
    (``sample_frames`` → ``ResizeMedia`` fake mode); only the blake2b
    payload synthesis enters as given data.  Pins the §2.15 multimodal
    plumbing — schedule arithmetic, slicing, pooling geometry, metadata
    rewrite — everything except the env-blocked codec call."""
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from entity_resolution_ray.stages.multimodal import (
        attach_fake_payloads,
        resize_media,
        sample_frames,
    )
    from entity_resolution_ray.stages.normalize import normalize

    fx = _er_corpus(sf_dir)
    docs = normalize(rd.read_parquet(
        os.path.join(fx, "documents.parquet"), override_num_blocks=16
    ))

    def explode_refs(batch: pa.Table) -> pa.Table:
        ids, refs = [], []
        for doc, rlist in zip(
            batch["doc_id"].to_pylist(), batch["media_refs"].to_pylist()
        ):
            for r in rlist:
                ids.append(doc)
                refs.append(r)
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
        })

    with_payload = attach_fake_payloads(
        docs.map_batches(explode_refs, batch_format="pyarrow")
    ).materialize()

    def dump_given(batch: pa.Table) -> pa.Table:
        metas = batch["media_meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for m in metas:  # the generated SQL hardcodes the 16×16 source grid
            assert m["width"] == 16 and m["height"] == 16
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_ref": batch["media_ref"],
            "bytes": pa.array([list(p or b"") for p in payloads],
                              pa.list_(pa.int16())),
            "n_frames": pa.array([m["n_frames"] for m in metas], pa.int64()),
            "len": pa.array([len(p or b"") for p in payloads], pa.int64()),
        })

    mm_dir = "/tmp/er_pair_oracle/multimodal_given"
    shutil.rmtree(mm_dir, ignore_errors=True)
    with_payload.map_batches(dump_given, batch_format="pyarrow").write_parquet(
        mm_dir
    )

    out = resize_media(sample_frames(with_payload, every_k=2),
                       target_w=8, target_h=8)

    def emit(batch: pa.Table) -> pa.Table:
        pix = np.array(batch["pixels"].to_pylist(), dtype=np.float32)
        metas = batch["media_meta"].to_pylist()
        cols = {
            "doc_id": batch["doc_id"],
            "media_ref": batch["media_ref"],
            "frame_index": pa.array(
                batch["frame_index"].to_numpy().astype(np.int64), pa.int64()
            ),
            "out_w": pa.array([m["width"] for m in metas], pa.int64()),
            "out_h": pa.array([m["height"] for m in metas], pa.int64()),
        }
        for i in range(64):
            cols[f"p{i}"] = pa.array(pix[:, i].astype(np.float64),
                                     pa.float64())
        return pa.table(cols)

    return out.map_batches(emit, batch_format="pyarrow")


def _build_multimodal_sql() -> str:
    """16×16 → 8×8 average pool + every-2 frame schedule, re-derived from
    the dumped byte lists (1-based list indexing; frame-local offset
    ``rr*16 + cc`` inside the ``frame_index*span`` slice)."""
    pix = []
    for r in range(8):
        for c in range(8):
            terms = " + ".join(
                f"bytes[frame_index*span + {rr * 16 + cc} + 1]"
                for rr in (2 * r, 2 * r + 1) for cc in (2 * c, 2 * c + 1)
            )
            pix.append(f"(({terms})::DOUBLE / 4.0) as p{r * 8 + c}")
    cols = ",\n  ".join(pix)
    return f"""
with raw as (
  select doc_id, media_ref, bytes, n_frames, len
  from read_parquet('/tmp/er_pair_oracle/multimodal_given/*.parquet')
),
media as (
  select *, greatest(1, n_frames) as n,
         len // greatest(1, n_frames) as span
  from raw
),
frames as (
  select doc_id, media_ref, bytes, span,
         unnest(range(0, n, 2)) as frame_index
  from media
)
select doc_id, media_ref, frame_index,
  8::BIGINT as out_w, 8::BIGINT as out_h,
  {cols}
from frames
"""


MULTIMODAL_PIPELINE_SQL = _build_multimodal_sql()


def _er_combiner(name: str):
    def run(sf_dir: str):
        from entity_resolution_ray.stages.combiners import run_combiner

        return run_combiner(_er_featured(sf_dir), name)

    return run


def _er_blocks_phonetic(sf_dir: str):
    from entity_resolution_ray.stages.blockers import feature_based_blocker

    return feature_based_blocker(
        _er_featured(sf_dir), ["phonetic_key", "metaphone_key"]
    )


def _er_blocks_phonetic_canon(sf_dir: str):
    """Phonetic blocking under a SQL oracle: the derived keys (tagger +
    phonetic functions' output, themselves oracled by ``phonetic_codes``)
    are written to a parquet the oracle reads back; the blocker's CC over
    shared-key edges is recomputed as a recursive-CTE transitive closure;
    and the engine's hash block ids are relabeled to the canonical min
    doc_id per block so the compare is hash-exact."""
    import shutil

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.blockers import feature_based_blocker
    from entity_resolution_ray.stages.joins import hash_join

    featured = _er_featured(sf_dir)
    # fixed path (no sf suffix): the callable runs right before its oracle
    # and overwrites, so one path serves every scale the driver probes
    oracle_dir = "/tmp/er_blocks_oracle/keys_current"
    shutil.rmtree(oracle_dir, ignore_errors=True)
    featured.select_columns(
        ["doc_id", "phonetic_key", "metaphone_key"]
    ).write_parquet(oracle_dir)

    blocks = feature_based_blocker(
        featured, ["phonetic_key", "metaphone_key"]
    ).materialize()  # consumed twice: rep census + label join
    reps = grouped_aggregate(
        blocks, "block_id", {"block_rep": ("doc_id", "min")}, num_buckets=8
    )
    out = hash_join(blocks, reps, on="block_id", num_buckets=8)
    return out.select_columns(["doc_id", "block_rep"])


CUTOFF_CANON_CUT = 100


def _er_blocks_cutoff_canon(sf_dir: str):
    """Gradual cutoff blocking under a SQL oracle: pass 1 = CC over shared
    phonetic_key, components ≥ cluster_cutoff freeze; pass 2 = CC over
    shared phonetic OR metaphone key among the remainder, everything
    freezes.  Canonical min-doc_id labels make the compare hash-exact vs
    two chained recursive-CTE closures.  cluster_cutoff=100 so the freeze
    branch actually fires at driver scale (the sf0.01 corpus has one
    600-doc phonetic component)."""
    import shutil

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.blockers import cutoff_blocker
    from entity_resolution_ray.stages.joins import hash_join

    featured = _er_featured(sf_dir)
    oracle_dir = "/tmp/er_blocks_oracle/keys_cutoff"
    shutil.rmtree(oracle_dir, ignore_errors=True)
    featured.select_columns(
        ["doc_id", "phonetic_key", "metaphone_key"]
    ).write_parquet(oracle_dir)

    blocks = cutoff_blocker(
        featured, ["phonetic_key", "metaphone_key"],
        cluster_cutoff=CUTOFF_CANON_CUT,
    ).materialize()
    reps = grouped_aggregate(
        blocks, "block_id", {"block_rep": ("doc_id", "min")}, num_buckets=8
    )
    out = hash_join(blocks, reps, on="block_id", num_buckets=8)
    return out.select_columns(["doc_id", "block_rep", "derived_by"])


ER_BLOCKS_CUTOFF_SQL = f"""
with recursive docs as (
  select doc_id, phonetic_key, metaphone_key
  from read_parquet('/tmp/er_blocks_oracle/keys_cutoff/*.parquet')
),
p1 as (
  select distinct a.doc_id as src, b.doc_id as dst
  from docs a join docs b
    on a.phonetic_key = b.phonetic_key and a.doc_id < b.doc_id
  where a.phonetic_key is not null and a.phonetic_key <> ''
),
bi1 as (select src as a, dst as b from p1 union select dst, src from p1),
reach1 as (
  select doc_id as node, doc_id as r from docs
  union
  select bi1.a, reach1.r from bi1 join reach1 on reach1.node = bi1.b
),
comp1 as (select node as doc_id, min(r) as rep from reach1 group by node),
sizes1 as (select rep, count(*) as n from comp1 group by rep),
frozen1 as (
  select c.doc_id, c.rep as block_rep
  from comp1 c join sizes1 s using (rep)
  where s.n >= {CUTOFF_CANON_CUT}
),
rem as (select doc_id from docs anti join frozen1 using (doc_id)),
rdocs as (select d.* from docs d semi join rem using (doc_id)),
p2 as (
  select distinct a.doc_id as src, b.doc_id as dst
  from rdocs a join rdocs b
    on a.phonetic_key = b.phonetic_key and a.doc_id < b.doc_id
  where a.phonetic_key is not null and a.phonetic_key <> ''
  union
  select distinct a.doc_id, b.doc_id
  from rdocs a join rdocs b
    on a.metaphone_key = b.metaphone_key and a.doc_id < b.doc_id
  where a.metaphone_key is not null and a.metaphone_key <> ''
),
bi2 as (select src as a, dst as b from p2 union select dst, src from p2),
reach2 as (
  select doc_id as node, doc_id as r from rdocs
  union
  select bi2.a, reach2.r from bi2 join reach2 on reach2.node = bi2.b
),
comp2 as (select node as doc_id, min(r) as rep from reach2 group by node)
select doc_id, block_rep, 'phonetic_key@th1' as derived_by from frozen1
union all
select doc_id, rep as block_rep, 'metaphone_key@th1' from comp2
"""


ER_BLOCKS_PHONETIC_SQL = """
with recursive docs as (
  select doc_id, phonetic_key, metaphone_key
  from read_parquet('/tmp/er_blocks_oracle/keys_current/*.parquet')
),
feat as (
  select doc_id, 'p=' || phonetic_key as key from docs
  where phonetic_key is not null and phonetic_key <> ''
  union all
  select doc_id, 'm=' || metaphone_key from docs
  where metaphone_key is not null and metaphone_key <> ''
),
pairs as (
  select distinct a.doc_id as src, b.doc_id as dst
  from feat a join feat b on a.key = b.key and a.doc_id < b.doc_id
),
bi as (
  select src as a, dst as b from pairs
  union
  select dst, src from pairs
),
reach as (
  select doc_id as node, doc_id as r from docs
  union
  select bi.a as node, reach.r from bi join reach on reach.node = bi.b
)
select node as doc_id, min(r) as block_rep from reach group by node
"""


def _er_combiner_cc_canon(sf_dir: str):
    """ConnectedComponentsCombiner under a SQL oracle (reference
    `am_combiner/combiners/graph_based.py:12-69`): per-block capped feature
    postings → shared-posting pairs with weight ≥ th(=1.0) → per-block CC.
    The featured table (tagger output taken as given data) is written to a
    parquet the oracle reads back; the combiner's min-doc-hash cluster ids
    are relabeled to the canonical min doc_id per cluster so the compare is
    hash-exact vs a capped-postings + recursive-CTE closure."""
    import shutil

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.combiners import run_combiner
    from entity_resolution_ray.stages.joins import hash_join

    featured = _er_featured(sf_dir)
    oracle_dir = "/tmp/er_pair_oracle/featured_cc"
    shutil.rmtree(oracle_dir, ignore_errors=True)
    featured.select_columns(
        ["doc_id", "block_key", "person_clean", "org", "gpe", "loc"]
    ).write_parquet(oracle_dir)

    clusters = run_combiner(featured, "connected_components").materialize()
    reps = grouped_aggregate(
        clusters, "cluster_id", {"cluster_rep": ("doc_id", "min")}, num_buckets=8
    )
    out = hash_join(clusters, reps, on="cluster_id", num_buckets=8)
    return out.select_columns(["doc_id", "block_key", "cluster_rep"])


ER_COMBINER_CC_SQL = """
with recursive docs as (
  select doc_id, block_key, person_clean, org, gpe, loc
  from read_parquet('/tmp/er_pair_oracle/featured_cc/*.parquet')
),
feat as (
  select doc_id, block_key, 'person_clean' as feature, unnest(person_clean) as val from docs
  union all select doc_id, block_key, 'org', unnest(org) from docs
  union all select doc_id, block_key, 'gpe', unnest(gpe) from docs
  union all select doc_id, block_key, 'loc', unnest(loc) from docs
),
capped as (
  select * from (
    select doc_id, block_key, feature, val,
           row_number() over (partition by block_key, feature, val
                              order by doc_id) as rn
    from feat)
  where rn <= 500
),
edges as (
  -- th = 1.0: any shared capped posting is an edge (weight = count >= 1)
  select distinct a.doc_id as src, b.doc_id as dst
  from capped a join capped b
    on a.block_key = b.block_key and a.feature = b.feature
   and a.val = b.val and a.doc_id < b.doc_id
),
bi as (select src as a, dst as b from edges union select dst, src from edges),
reach as (
  select doc_id as node, doc_id as r from docs
  union
  select bi.a, reach.r from bi join reach on reach.node = bi.b
),
comp as (select node as doc_id, min(r) as cluster_rep from reach group by node)
select d.doc_id, d.block_key, c.cluster_rep
from docs d join comp c using (doc_id)
"""


def _er_combiner_baseline_canon(sf_dir: str):
    """CurrentProductionCombiner under a SQL oracle (reference
    `am_combiner/combiners/simple.py:7-38`): every mention in a block is one
    cluster.  Runs the real registry path, then relabels to the canonical
    min doc_id per cluster.  Writes its own oracle parquet — query order in
    the driver is not a dependency."""
    import shutil

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.combiners import run_combiner
    from entity_resolution_ray.stages.joins import hash_join

    featured = _er_featured(sf_dir)
    oracle_dir = "/tmp/er_pair_oracle/featured_baseline"
    shutil.rmtree(oracle_dir, ignore_errors=True)
    featured.select_columns(["doc_id", "block_key"]).write_parquet(oracle_dir)

    clusters = run_combiner(featured, "current_production").materialize()
    reps = grouped_aggregate(
        clusters, "cluster_id", {"cluster_rep": ("doc_id", "min")}, num_buckets=8
    )
    out = hash_join(clusters, reps, on="cluster_id", num_buckets=8)
    return out.select_columns(["doc_id", "block_key", "cluster_rep"])


ER_COMBINER_BASELINE_SQL = """
select doc_id, block_key,
       min(doc_id) over (partition by block_key) as cluster_rep
from read_parquet('/tmp/er_pair_oracle/featured_baseline/*.parquet')
"""


def _er_combiner_incremental_canon(sf_dir: str):
    """PairwiseIncrementalCombiner under a SQL oracle (reference
    `am_combiner/combiners/incremental_clustering.py:112-161`): docs sorted
    by doc_id within a block; each doc joins the cluster of its
    most-similar predecessor (TF cosine >= 0.3, first-max tie-break) else
    opens a new cluster.  The order-dependent fold is a recursive CTE
    carrying the per-block label list (VERDICT r4 task 9).  Featured tf
    vectors are written to a parquet the oracle reads; cluster ids are
    relabeled to the canonical min doc_id per cluster on both sides."""
    import shutil

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.combiners import run_combiner
    from entity_resolution_ray.stages.joins import hash_join

    featured = _er_featured(sf_dir)
    oracle_dir = "/tmp/er_pair_oracle/featured_inc"
    shutil.rmtree(oracle_dir, ignore_errors=True)
    featured.select_columns(
        ["doc_id", "block_key", "tf_idx", "tf_cnt"]
    ).write_parquet(oracle_dir)

    clusters = run_combiner(featured, "pairwise_incremental").materialize()
    reps = grouped_aggregate(
        clusters, "cluster_id", {"cluster_rep": ("doc_id", "min")}, num_buckets=8
    )
    out = hash_join(clusters, reps, on="cluster_id", num_buckets=8)
    return out.select_columns(["doc_id", "block_key", "cluster_rep"])


ER_COMBINER_INC_SQL = """
with recursive docs as (
  select doc_id, block_key, tf_idx, tf_cnt,
         row_number() over (partition by block_key order by doc_id) as rn
  from read_parquet('/tmp/er_pair_oracle/featured_inc/*.parquet')
),
nblock as (select block_key, count(*) as n from docs group by block_key),
terms as (
  select block_key, rn, unnest(tf_idx) as term, unnest(tf_cnt) as cnt
  from docs
),
norms as (
  select block_key, rn, sqrt(sum(cnt * cnt)) as nrm
  from terms group by block_key, rn
),
normt as (
  select t.block_key, t.rn, t.term, t.cnt / n.nrm as w
  from terms t join norms n using (block_key, rn)
),
-- cosine of doc i against every predecessor j (both vectors
-- L2-normalized, matching the combiner's _block_vectors)
best as materialized (
  select block_key, i, j, sim from (
    select block_key, i, j, sim,
           row_number() over (partition by block_key, i
                              order by sim desc, j asc) as rk
    from (
      select a.block_key, b.rn as i, a.rn as j, sum(a.w * b.w) as sim
      from normt a join normt b
        on a.block_key = b.block_key and a.term = b.term and a.rn < b.rn
      group by a.block_key, b.rn, a.rn))
  where rk = 1
),
fold as (
  select d.block_key, 1 as rn, [0] as labels, 1 as next_label
  from docs d where d.rn = 1
  union all
  select f.block_key, f.rn + 1,
         case when b.sim is not null and b.sim >= 0.3
              then list_append(f.labels, f.labels[b.j])
              else list_append(f.labels, f.next_label) end,
         case when b.sim is not null and b.sim >= 0.3
              then f.next_label else f.next_label + 1 end
  from fold f
  join nblock nb using (block_key)
  left join best b on b.block_key = f.block_key and b.i = f.rn + 1
  where f.rn < nb.n
),
final as (
  select f.block_key, f.labels
  from fold f join nblock nb using (block_key)
  where f.rn = nb.n
),
lab as (
  select block_key, unnest(labels) as label,
         generate_subscripts(labels, 1) as rn
  from final
),
clusters as (
  select d.doc_id, d.block_key, l.label
  from docs d join lab l on l.block_key = d.block_key and l.rn = d.rn
),
reps as (
  select block_key, label, min(doc_id) as cluster_rep
  from clusters group by block_key, label
)
select c.doc_id, c.block_key, r.cluster_rep
from clusters c join reps r using (block_key, label)
"""


_FEATURED_CACHE: dict[str, object] = {}


def _er_featured(sf_dir: str):
    """Featured ER corpus, materialized once per process — a dozen driver
    queries consume it, and re-deriving the tagger per query would multiply
    the correctness run's wall by that dozen."""
    import os

    from entity_resolution_ray.pipelines.er import (
        ERConfig,
        featured_documents,
        read_documents,
    )

    fx = _er_corpus(sf_dir)
    cached = _FEATURED_CACHE.get(fx)
    if cached is None:
        cached = featured_documents(
            read_documents(os.path.join(fx, "documents.parquet")), ERConfig()
        ).materialize()
        _FEATURED_CACHE.clear()  # hold one corpus at a time
        _FEATURED_CACHE[fx] = cached
    return cached


def _er_blocks_country(sf_dir: str):
    """CountryBlocker semantics over the ER corpus: gpe → canonical country
    codes feed the oversized-block splitter."""
    from entity_resolution_ray.stages.geography import (
        country_blocker,
        geo_resolve_column,
    )

    featured = geo_resolve_column(_er_featured(sf_dir)).materialize()
    return country_blocker(featured, ["phonetic_key"], min_split_size=500)


def _er_blocks_cutoff(sf_dir: str):
    from entity_resolution_ray.stages.blockers import cutoff_blocker

    return cutoff_blocker(
        _er_featured(sf_dir), ["phonetic_key", "metaphone_key"],
        cluster_cutoff=1000,
    )


def _er_blocks_country_canon(sf_dir: str):
    """CountryBlocker under a SQL oracle (reference
    `am_combiner/blockers/country.py`).  Given data = the phonetic keys and
    the mean-connectivity country ASSIGNMENTS (the one genuinely iterative
    heuristic, extracted from the blocker's own split keys); DuckDB
    independently re-derives everything else: the shared-key pair edges
    (plain self-join — hot-key sharding preserves connectivity so the
    closure is identical), the CC blocks, the size census, the
    ``n > min_split_size`` split trigger, and the final key composition.
    Strict BOTH ways: a doc the engine split in a block SQL says is small
    keeps its suffix only on the engine side; a doc the engine failed to
    split in a SQL-big block gets a ``+MISSING`` suffix only on the SQL
    side — either divergence breaks the hash.  Engine hash block ids are
    relabeled to canonical min-doc-id reps."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.geography import (
        country_blocker,
        geo_resolve_column,
    )
    from entity_resolution_ray.stages.joins import hash_join

    featured = geo_resolve_column(_er_featured(sf_dir)).materialize()
    out = country_blocker(
        featured, ["phonetic_key"], min_split_size=500
    ).materialize()

    keys_dir = "/tmp/er_pair_oracle/country_keys"
    assign_dir = "/tmp/er_pair_oracle/country_assign"
    shutil.rmtree(keys_dir, ignore_errors=True)
    shutil.rmtree(assign_dir, ignore_errors=True)
    featured.select_columns(["doc_id", "phonetic_key"]).write_parquet(keys_dir)

    def split_assignments(batch: pa.Table) -> pa.Table:
        ids = batch["block_id"].to_pylist()
        keys = batch["block_key"].to_pylist()
        docs, countries = [], []
        for d, bid, bk in zip(batch["doc_id"].to_pylist(), ids, keys):
            if bk != bid:
                docs.append(d)
                countries.append(bk[len(bid) + 1:])  # strip "<block_id>+"
        return pa.table({
            "doc_id": pa.array(docs, pa.string()),
            "country": pa.array(countries, pa.string()),
        })

    out.map_batches(
        split_assignments, batch_format="pyarrow"
    ).write_parquet(assign_dir)
    # small corpora may split nothing: write_parquet then leaves no files,
    # and DuckDB's read_parquet errors on an empty glob — pin the schema
    # with one empty file so the oracle always runs
    import glob
    import os as _os

    import pyarrow.parquet as _pq

    if not glob.glob(_os.path.join(assign_dir, "*.parquet")):
        _os.makedirs(assign_dir, exist_ok=True)
        _pq.write_table(
            pa.table({
                "doc_id": pa.array([], pa.string()),
                "country": pa.array([], pa.string()),
            }),
            _os.path.join(assign_dir, "empty.parquet"),
        )

    reps = grouped_aggregate(
        out, "block_id", {"block_rep": ("doc_id", "min")}, num_buckets=8
    )
    joined = hash_join(out, reps, on="block_id", num_buckets=8)

    def canon_keys(batch: pa.Table) -> pa.Table:
        ids = batch["block_id"].to_pylist()
        keys = batch["block_key"].to_pylist()
        reps_ = batch["block_rep"].to_pylist()
        canon = [
            r + bk[len(bid):] if bk != bid else r
            for bid, bk, r in zip(ids, keys, reps_)
        ]
        return pa.table({
            "doc_id": batch["doc_id"],
            "block_rep": batch["block_rep"],
            "block_key_canon": pa.array(canon, pa.string()),
        })

    return joined.map_batches(canon_keys, batch_format="pyarrow")


ER_BLOCKS_COUNTRY_SQL = """
with recursive docs as (
  select doc_id, phonetic_key
  from read_parquet('/tmp/er_pair_oracle/country_keys/*.parquet')
),
feat as (
  select doc_id, phonetic_key as key from docs
  where phonetic_key is not null and phonetic_key <> ''
),
pairs as (
  select distinct a.doc_id as src, b.doc_id as dst
  from feat a join feat b on a.key = b.key and a.doc_id < b.doc_id
),
bi as (select src as a, dst as b from pairs union select dst, src from pairs),
reach as (
  select doc_id as node, doc_id as r from docs
  union
  select bi.a, reach.r from bi join reach on reach.node = bi.b
),
comp as (select node, min(r) as rep from reach group by node),
census as (select rep, count(*) as n from comp group by rep),
assign as (
  select doc_id, country
  from read_parquet('/tmp/er_pair_oracle/country_assign/*.parquet')
)
select c.node as doc_id, c.rep as block_rep,
       case when s.n > 500
            then c.rep || '+' || coalesce(a.country, 'MISSING')
            else c.rep end as block_key_canon
from comp c
join census s on s.rep = c.rep
left join assign a on a.doc_id = c.node
"""


def _er_combiner_model(sf_dir: str):
    """Model-based pair combiner: deterministic numpy logistic model over
    concatenated projected doc vectors (the pickled-sklearn hook)."""
    import numpy as np

    from entity_resolution_ray.stages.combiners import (
        NumpyLogisticPairModel,
        make_model_combiner,
        run_combiner,
    )

    rng = np.random.default_rng(11)
    X = rng.standard_normal((400, 128))
    y = (X[:, :64] * X[:, 64:]).sum(axis=1) > 0  # agreement-of-halves rule
    model = NumpyLogisticPairModel.fit(X.astype(np.float64), y.astype(int))
    return run_combiner(_er_featured(sf_dir), make_model_combiner(model, th=0.9))


def _er_combiner_model_canon(sf_dir: str):
    """Model combiner under a SQL oracle, splitter-style: the model's
    per-block pair PROBABILITIES (same ``project_block_vectors`` +
    ``NumpyLogisticPairModel`` the combiner itself runs, emitted as pairs
    instead of labels) go to parquet as given data; DuckDB independently
    applies the 0.9 accept threshold and re-derives the per-block
    connected components with a recursive CTE.  The engine side relabels
    ``run_combiner``'s hash cluster ids to the canonical min doc_id per
    (block_key, cluster) so the compare is hash-exact — pinning the
    threshold rule + closure of the sklearn-hook combiner (reference
    `am_combiner/combiners/ml.py:274-345`)."""
    import shutil

    import numpy as np
    import pandas as pd

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.combiners import (
        NumpyLogisticPairModel,
        _sorted,
        make_model_combiner,
        project_block_vectors,
        run_combiner,
    )
    from entity_resolution_ray.stages.joins import hash_join

    rng = np.random.default_rng(11)
    X = rng.standard_normal((400, 128))
    y = (X[:, :64] * X[:, 64:]).sum(axis=1) > 0
    model = NumpyLogisticPairModel.fit(X.astype(np.float64), y.astype(int))

    featured = _er_featured(sf_dir)

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        group = _sorted(group)
        n = len(group)
        if n < 2:
            return pd.DataFrame({
                "block_key": pd.Series(dtype=object),
                "src": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "prob": pd.Series(dtype="float64"),
            })
        Xb = project_block_vectors(group, 64)
        ii, jj = np.triu_indices(n, 1)
        prob = model.predict_proba(np.hstack([Xb[ii], Xb[jj]]))[:, 1]
        docs = group["doc_id"].to_numpy()
        return pd.DataFrame({
            "block_key": np.repeat(group["block_key"].iloc[0], len(ii)),
            "src": docs[ii],
            "dst": docs[jj],
            "prob": prob,
        })

    pairs = featured.select_columns(
        ["doc_id", "block_key", "tf_idx", "tf_cnt"]
    ).groupby("block_key").map_groups(emit_pairs, batch_format="pandas")

    docs_dir = "/tmp/er_pair_oracle/model_docs"
    pairs_dir = "/tmp/er_pair_oracle/model_pairs"
    shutil.rmtree(docs_dir, ignore_errors=True)
    shutil.rmtree(pairs_dir, ignore_errors=True)
    featured.select_columns(["doc_id", "block_key"]).write_parquet(docs_dir)
    pairs.write_parquet(pairs_dir)

    clusters = run_combiner(
        featured, make_model_combiner(model, th=0.9)
    ).materialize()
    reps = grouped_aggregate(
        clusters, "cluster_id", {"cluster_rep": ("doc_id", "min")},
        num_buckets=8,
    )
    out = hash_join(clusters, reps, on="cluster_id", num_buckets=8)
    return out.select_columns(["doc_id", "block_key", "cluster_rep"])


ER_COMBINER_MODEL_SQL = """
with recursive docs as (
  select doc_id, block_key
  from read_parquet('/tmp/er_pair_oracle/model_docs/*.parquet')
),
kept as (
  select block_key, src, dst
  from read_parquet('/tmp/er_pair_oracle/model_pairs/*.parquet')
  where prob > 0.9::DOUBLE
),
bi as (
  select block_key, src as a, dst as b from kept
  union
  select block_key, dst, src from kept
),
reach as (
  select block_key, doc_id as node, doc_id as r from docs
  union
  select bi.block_key, bi.a, reach.r
  from bi join reach on reach.node = bi.b and reach.block_key = bi.block_key
),
comp as (select block_key, node, min(r) as rep from reach group by 1, 2)
select node as doc_id, block_key, rep as cluster_rep from comp
"""


def _er_combiner_gcn_canon(sf_dir: str):
    """GCN combiner under a SQL oracle, model-canon-style (reference
    `am_combiner/combiners/ml.py:160-209`): the per-block pairwise cosine
    SIMILARITIES of the L2-normalized SAGE embeddings (same `gcn_embed`
    the combiner runs) go to parquet as given data; DuckDB independently
    re-derives the block-size census, the LARGE-CLUSTER THRESHOLD BUMP
    (`sim > 0.85 + (0.02 if n > 400 else 0)` with the sum written as the
    same two-double add), the kept edges, and the per-block connected
    components with canonical min-doc-id labels.  Pins the whole decision
    chain after the numpy forward pass — threshold rule, bump trigger,
    closure."""
    import shutil

    import numpy as np
    import pandas as pd

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.combiners import _sorted, run_combiner
    from entity_resolution_ray.stages.gcn import _l2_rows, gcn_embed
    from entity_resolution_ray.stages.joins import hash_join

    featured = _er_featured(sf_dir)

    def emit_sims(group: pd.DataFrame) -> pd.DataFrame:
        group = _sorted(group)
        n = len(group)
        if n < 2:
            return pd.DataFrame({
                "block_key": pd.Series(dtype=object),
                "src": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "sim": pd.Series(dtype="float64"),
            })
        E = _l2_rows(gcn_embed(group, 64, 32))
        sim = E @ E.T
        ii, jj = np.triu_indices(n, 1)
        docs = group["doc_id"].to_numpy()
        return pd.DataFrame({
            "block_key": np.repeat(group["block_key"].iloc[0], len(ii)),
            "src": docs[ii],
            "dst": docs[jj],
            "sim": sim[ii, jj],
        })

    pairs = featured.select_columns(
        ["doc_id", "block_key", "tf_idx", "tf_cnt",
         "person_clean", "org", "gpe", "loc"]
    ).groupby("block_key").map_groups(emit_sims, batch_format="pandas")

    docs_dir = "/tmp/er_pair_oracle/gcn_docs"
    pairs_dir = "/tmp/er_pair_oracle/gcn_pairs"
    shutil.rmtree(docs_dir, ignore_errors=True)
    shutil.rmtree(pairs_dir, ignore_errors=True)
    featured.select_columns(["doc_id", "block_key"]).write_parquet(docs_dir)
    pairs.write_parquet(pairs_dir)

    clusters = run_combiner(featured, "gcn").materialize()
    reps = grouped_aggregate(
        clusters, "cluster_id", {"cluster_rep": ("doc_id", "min")},
        num_buckets=8,
    )
    out = hash_join(clusters, reps, on="cluster_id", num_buckets=8)
    return out.select_columns(["doc_id", "block_key", "cluster_rep"])


ER_COMBINER_GCN_SQL = """
with recursive docs as (
  select doc_id, block_key
  from read_parquet('/tmp/er_pair_oracle/gcn_docs/*.parquet')
),
census as (select block_key, count(*) as n from docs group by block_key),
kept as (
  select p.block_key, p.src, p.dst
  from read_parquet('/tmp/er_pair_oracle/gcn_pairs/*.parquet') p
  join census c on c.block_key = p.block_key
  where p.sim > (0.85::DOUBLE
                 + case when c.n > 400 then 0.02::DOUBLE else 0.0::DOUBLE end)
),
bi as (
  select block_key, src as a, dst as b from kept
  union
  select block_key, dst, src from kept
),
reach as (
  select block_key, doc_id as node, doc_id as r from docs
  union
  select bi.block_key, bi.a, reach.r
  from bi join reach on reach.node = bi.b and reach.block_key = bi.block_key
),
comp as (select block_key, node, min(r) as rep from reach group by 1, 2)
select node as doc_id, block_key, rep as cluster_rep from comp
"""


def _er_combiner_gcn_hetero_canon(sf_dir: str):
    """Hetero-GCN combiner under a SQL oracle — completes the combiner-
    family canon set (same decision chain as `er_combiner_gcn_canon`, fed by
    the per-relation SAGE + mean-aggregate embedding of
    `gcn_hetero_embed`): given per-block embedding cosines, DuckDB
    re-derives census, `0.85 + 0.02·[n>400]` threshold, kept edges, and
    per-block CC with canonical labels."""
    import shutil

    import numpy as np
    import pandas as pd

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.combiners import _sorted, run_combiner
    from entity_resolution_ray.stages.gcn import _l2_rows, gcn_hetero_embed
    from entity_resolution_ray.stages.joins import hash_join

    featured = _er_featured(sf_dir)

    def emit_sims(group: pd.DataFrame) -> pd.DataFrame:
        group = _sorted(group)
        n = len(group)
        if n < 2:
            return pd.DataFrame({
                "block_key": pd.Series(dtype=object),
                "src": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "sim": pd.Series(dtype="float64"),
            })
        E = _l2_rows(gcn_hetero_embed(group, 64, 32))
        sim = E @ E.T
        ii, jj = np.triu_indices(n, 1)
        docs = group["doc_id"].to_numpy()
        return pd.DataFrame({
            "block_key": np.repeat(group["block_key"].iloc[0], len(ii)),
            "src": docs[ii],
            "dst": docs[jj],
            "sim": sim[ii, jj],
        })

    pairs = featured.select_columns(
        ["doc_id", "block_key", "tf_idx", "tf_cnt",
         "person_clean", "org", "gpe", "loc"]
    ).groupby("block_key").map_groups(emit_sims, batch_format="pandas")

    docs_dir = "/tmp/er_pair_oracle/gcnhet_docs"
    pairs_dir = "/tmp/er_pair_oracle/gcnhet_pairs"
    shutil.rmtree(docs_dir, ignore_errors=True)
    shutil.rmtree(pairs_dir, ignore_errors=True)
    featured.select_columns(["doc_id", "block_key"]).write_parquet(docs_dir)
    pairs.write_parquet(pairs_dir)

    clusters = run_combiner(featured, "gcn_hetero").materialize()
    reps = grouped_aggregate(
        clusters, "cluster_id", {"cluster_rep": ("doc_id", "min")},
        num_buckets=8,
    )
    out = hash_join(clusters, reps, on="cluster_id", num_buckets=8)
    return out.select_columns(["doc_id", "block_key", "cluster_rep"])


ER_COMBINER_GCN_HET_SQL = """
with recursive docs as (
  select doc_id, block_key
  from read_parquet('/tmp/er_pair_oracle/gcnhet_docs/*.parquet')
),
census as (select block_key, count(*) as n from docs group by block_key),
kept as (
  select p.block_key, p.src, p.dst
  from read_parquet('/tmp/er_pair_oracle/gcnhet_pairs/*.parquet') p
  join census c on c.block_key = p.block_key
  where p.sim > (0.85::DOUBLE
                 + case when c.n > 400 then 0.02::DOUBLE else 0.0::DOUBLE end)
),
bi as (
  select block_key, src as a, dst as b from kept
  union
  select block_key, dst, src from kept
),
reach as (
  select block_key, doc_id as node, doc_id as r from docs
  union
  select bi.block_key, bi.a, reach.r
  from bi join reach on reach.node = bi.b and reach.block_key = bi.block_key
),
comp as (select block_key, node, min(r) as rep from reach group by 1, 2)
select node as doc_id, block_key, rep as cluster_rep from comp
"""


def _er_combiner_featr_graph_canon(sf_dir: str):
    """Featr-graph combiner under a SQL oracle with the DEEPEST fusion
    re-derivation of the combiner canons (reference
    `am_combiner/combiners/tfidf.py:424-577`).  Given data per pair: the
    TF-IDF cosine, the RAW feature-adjacency weight (pre-clip/pre-scale),
    and the RAW subgraph spectral cosine (null for pairs the engine put in
    no ≥5-member subgraph).  DuckDB independently re-derives: the feature
    channel's clip+scale (`min(max(w,0),75)/75`), the SUBGRAPH TRIGGER —
    connected components over `w ≥ 1.0` edges by recursive CTE, size
    census, the ≥5-member rule (a true cross-check of the engine's
    union_find), the spectral channel's clip to `[0, 0.15]` with 0 outside
    subgraphs, the fusion `t + (clip + map)` in the engine's exact
    parenthesization, the `> 0.4` threshold, and the per-block closure
    with canonical labels."""
    import shutil

    import numpy as np
    import pandas as pd

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.blocking import (
        FEATURE_COLS,
        _block_postings,
        _posting_pairs,
    )
    from entity_resolution_ray.stages.clustering import union_find
    from entity_resolution_ray.stages.combiners import (
        _block_vectors,
        _feature_sets,
        _sorted,
        run_combiner,
    )
    from entity_resolution_ray.stages.joins import hash_join
    from entity_resolution_ray.stages.spectral import (
        cosine_matrix,
        laplacian_doc_vectors,
    )

    featured = _er_featured(sf_dir)

    def emit_channels(group: pd.DataFrame) -> pd.DataFrame:
        group = _sorted(group)
        n = len(group)
        if n < 2:
            return pd.DataFrame({
                "block_key": pd.Series(dtype=object),
                "src": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "tfidf_cos": pd.Series(dtype="float64"),
                "featr_w": pd.Series(dtype="float64"),
                "spec_raw": pd.Series(dtype="float64"),
            })
        X = _block_vectors(group)
        tf_sim = X @ X.T
        postings = []
        for col in FEATURE_COLS:
            postings.extend(_block_postings(list(group[col]), cap=500))
        fi, fj, fw = _posting_pairs(n, postings)
        feature_adj = np.zeros((n, n), dtype=np.float64)
        feature_adj[fi, fj] = fw
        feature_adj[fj, fi] = fw
        # raw (pre-clip) subgraph spectral cosines, NaN outside subgraphs
        ei, ej = np.where(np.triu(feature_adj >= 1.0, 1))
        comp = union_find(n, ei.astype(np.int64), ej.astype(np.int64))
        spec_raw = np.full((n, n), np.nan)
        doc_ids = list(group["doc_id"])
        names = list(group["entity_name"])
        fsets = _feature_sets(group)
        for c in np.unique(comp):
            members = np.flatnonzero(comp == c)
            if len(members) < 5:
                continue
            rows = laplacian_doc_vectors(
                [doc_ids[i] for i in members],
                [names[i] for i in members],
                [fsets[i] for i in members],
            )
            spec_raw[np.ix_(members, members)] = cosine_matrix(rows)
        ii, jj = np.triu_indices(n, 1)
        docs = group["doc_id"].to_numpy()
        return pd.DataFrame({
            "block_key": np.repeat(group["block_key"].iloc[0], len(ii)),
            "src": docs[ii],
            "dst": docs[jj],
            "tfidf_cos": tf_sim[ii, jj],
            "featr_w": feature_adj[ii, jj],
            "spec_raw": spec_raw[ii, jj],
        })

    pairs = featured.select_columns(
        ["doc_id", "block_key", "entity_name", "tf_idx", "tf_cnt",
         "person_clean", "org", "gpe", "loc"]
    ).groupby("block_key").map_groups(emit_channels, batch_format="pandas")

    docs_dir = "/tmp/er_pair_oracle/featrg_docs"
    pairs_dir = "/tmp/er_pair_oracle/featrg_pairs"
    shutil.rmtree(docs_dir, ignore_errors=True)
    shutil.rmtree(pairs_dir, ignore_errors=True)
    featured.select_columns(["doc_id", "block_key"]).write_parquet(docs_dir)
    pairs.write_parquet(pairs_dir)

    clusters = run_combiner(
        featured, "tfidf_featr_graph_cosine"
    ).materialize()
    reps = grouped_aggregate(
        clusters, "cluster_id", {"cluster_rep": ("doc_id", "min")},
        num_buckets=8,
    )
    out = hash_join(clusters, reps, on="cluster_id", num_buckets=8)
    return out.select_columns(["doc_id", "block_key", "cluster_rep"])


ER_COMBINER_FEATR_GRAPH_SQL = """
with recursive pairs as (
  select block_key, src, dst, tfidf_cos, featr_w, spec_raw
  from read_parquet('/tmp/er_pair_oracle/featrg_pairs/*.parquet')
),
docs as (
  select doc_id, block_key
  from read_parquet('/tmp/er_pair_oracle/featrg_docs/*.parquet')
),
-- subgraph trigger: CC over w >= 1.0 edges, independently of the engine's
-- union_find
strong as (
  select block_key, src, dst from pairs where featr_w >= 1.0::DOUBLE
),
sbi as (
  select block_key, src as a, dst as b from strong
  union
  select block_key, dst, src from strong
),
sreach as (
  select block_key, doc_id as node, doc_id as r from docs
  union
  select sbi.block_key, sbi.a, sreach.r
  from sbi join sreach on sreach.node = sbi.b
                       and sreach.block_key = sbi.block_key
),
scomp as (select block_key, node, min(r) as rep from sreach group by 1, 2),
scensus as (
  select block_key, rep, count(*) as n from scomp group by 1, 2
),
insub as (
  select p.block_key, p.src, p.dst
  from pairs p
  join scomp a on a.block_key = p.block_key and a.node = p.src
  join scomp b on b.block_key = p.block_key and b.node = p.dst
  join scensus s on s.block_key = p.block_key and s.rep = a.rep
  where a.rep = b.rep and s.n >= 5
),
kept as (
  select p.block_key, p.src, p.dst
  from pairs p
  left join insub i on i.block_key = p.block_key
                    and i.src = p.src and i.dst = p.dst
  where (p.tfidf_cos
         + ((least(greatest(p.featr_w, 0.0::DOUBLE), 75.0::DOUBLE)
             / 75.0::DOUBLE)
            + case when i.src is not null
                   then least(greatest(p.spec_raw, 0.0::DOUBLE),
                              0.15::DOUBLE)
                   else 0.0::DOUBLE end))
        > 0.4::DOUBLE
),
bi as (
  select block_key, src as a, dst as b from kept
  union
  select block_key, dst, src from kept
),
reach as (
  select block_key, doc_id as node, doc_id as r from docs
  union
  select bi.block_key, bi.a, reach.r
  from bi join reach on reach.node = bi.b and reach.block_key = bi.block_key
),
comp as (select block_key, node, min(r) as rep from reach group by 1, 2)
select node as doc_id, block_key, rep as cluster_rep from comp
"""


def _logit_cut(th) -> float:
    """Largest double z with ``1/(1+np.exp(-z)) <= th`` — the exact decision
    boundary of the numpy sigmoid, found by float bisection and validated by
    a 5000-ULP monotonicity sweep on each side.  Lets SQL restate the
    logistic threshold (`p > th` ⟺ `z > cut`) without needing bit-parity
    between numpy's SIMD exp and libm exp (they differ on ~15% of inputs)."""
    import numpy as np

    th = np.float64(th)

    def sig(z):
        return 1.0 / (1.0 + np.exp(-np.float64(z)))

    lo, hi = np.float64(0.0), np.float64(1.0)
    for _ in range(200):
        mid = np.float64((lo + hi) / 2)
        if sig(mid) <= th:
            lo = mid
        else:
            hi = mid
        if np.nextafter(lo, hi) == hi:
            break
    assert sig(lo) <= th < sig(hi)
    z = lo
    for _ in range(5000):
        z = np.nextafter(z, -np.inf)
        assert sig(z) <= th
    z = hi
    for _ in range(5000):
        z = np.nextafter(z, np.inf)
        assert sig(z) > th
    return float(lo)


def _er_combiner_gcn_lc_canon(sf_dir: str):
    """GCN linear-combination combiner under a SQL oracle (reference
    `am_combiner/combiners/ml.py:252-271`): the TWO raw channels — block-
    local TF-IDF cosine and hetero-SAGE embedding cosine — go to parquet as
    given data; DuckDB re-derives the LOGISTIC FUSION ITSELF: the logit
    ``z = (t·2.5 + g·2.5) + (−2.5)`` (bit-exact — the 2-term dot is
    order-forced), the decision ``sigmoid(z) > th`` restated as ``z >
    logit-cut`` with the exact double boundary from `_logit_cut` (numpy exp
    and DuckDB exp differ in ULPs, but the decision is monotone — the cut is
    bisected and ULP-sweep-validated), the large-cluster bump (``th 0.6 →
    0.6+0.02`` when the census says n > 400), and the per-block closure with
    canonical labels."""
    import shutil

    import numpy as np
    import pandas as pd

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.combiners import (
        _block_vectors,
        _sorted,
        run_combiner,
    )
    from entity_resolution_ray.stages.gcn import _l2_rows, gcn_hetero_embed
    from entity_resolution_ray.stages.joins import hash_join

    featured = _er_featured(sf_dir)

    def emit_sims(group: pd.DataFrame) -> pd.DataFrame:
        group = _sorted(group)
        n = len(group)
        if n < 2:
            return pd.DataFrame({
                "block_key": pd.Series(dtype=object),
                "src": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "tfidf_cos": pd.Series(dtype="float64"),
                "gcn_cos": pd.Series(dtype="float64"),
            })
        X = _block_vectors(group)
        tf_sim = X @ X.T
        E = _l2_rows(gcn_hetero_embed(group, 64, 32))
        g_sim = E @ E.T
        ii, jj = np.triu_indices(n, 1)
        docs = group["doc_id"].to_numpy()
        return pd.DataFrame({
            "block_key": np.repeat(group["block_key"].iloc[0], len(ii)),
            "src": docs[ii],
            "dst": docs[jj],
            "tfidf_cos": tf_sim[ii, jj],
            "gcn_cos": g_sim[ii, jj],
        })

    pairs = featured.select_columns(
        ["doc_id", "block_key", "tf_idx", "tf_cnt",
         "person_clean", "org", "gpe", "loc"]
    ).groupby("block_key").map_groups(emit_sims, batch_format="pandas")

    docs_dir = "/tmp/er_pair_oracle/gcnlc_docs"
    pairs_dir = "/tmp/er_pair_oracle/gcnlc_pairs"
    shutil.rmtree(docs_dir, ignore_errors=True)
    shutil.rmtree(pairs_dir, ignore_errors=True)
    featured.select_columns(["doc_id", "block_key"]).write_parquet(docs_dir)
    pairs.write_parquet(pairs_dir)

    clusters = run_combiner(featured, "gcn_lc").materialize()
    reps = grouped_aggregate(
        clusters, "cluster_id", {"cluster_rep": ("doc_id", "min")},
        num_buckets=8,
    )
    out = hash_join(clusters, reps, on="cluster_id", num_buckets=8)
    return out.select_columns(["doc_id", "block_key", "cluster_rep"])


def _build_gcn_lc_sql() -> str:
    import numpy as np

    cut = _logit_cut(np.float64(0.6))
    cut_bump = _logit_cut(np.float64(0.6) + np.float64(0.02))
    return f"""
with recursive docs as (
  select doc_id, block_key
  from read_parquet('/tmp/er_pair_oracle/gcnlc_docs/*.parquet')
),
census as (select block_key, count(*) as n from docs group by block_key),
kept as (
  select p.block_key, p.src, p.dst
  from read_parquet('/tmp/er_pair_oracle/gcnlc_pairs/*.parquet') p
  join census c on c.block_key = p.block_key
  where ((p.tfidf_cos * 2.5 + p.gcn_cos * 2.5) + -2.5)
        > case when c.n > 400 then {cut_bump!r}::DOUBLE
               else {cut!r}::DOUBLE end
),
bi as (
  select block_key, src as a, dst as b from kept
  union
  select block_key, dst, src from kept
),
reach as (
  select block_key, doc_id as node, doc_id as r from docs
  union
  select bi.block_key, bi.a, reach.r
  from bi join reach on reach.node = bi.b and reach.block_key = bi.block_key
),
comp as (select block_key, node, min(r) as rep from reach group by 1, 2)
select node as doc_id, block_key, rep as cluster_rep from comp
"""


ER_COMBINER_GCN_LC_SQL = _build_gcn_lc_sql()


def _er_combiner_spectral_canon(sf_dir: str):
    """Spectral (TFIDFAndGraph) combiner under a SQL oracle (reference
    `am_combiner/combiners/tfidf.py:356-421`): the TWO per-pair channels —
    block-local TF-IDF cosine and the RAW (pre-clip) spectral-embedding
    cosine — go to parquet as given data; DuckDB independently re-derives
    the clip to ``[-0.25, 0.65]`` (`greatest`/`least`, np.clip semantics),
    the channel SUM, the ``> 0.5`` accept threshold, and the per-block
    connected components with canonical min-doc-id labels.  Pins the whole
    decision tail after the eigen solve — clip rule, fusion, threshold,
    closure."""
    import shutil

    import numpy as np
    import pandas as pd

    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.combiners import (
        _block_vectors,
        _feature_sets,
        _sorted,
        run_combiner,
    )
    from entity_resolution_ray.stages.joins import hash_join
    from entity_resolution_ray.stages.spectral import (
        cosine_matrix,
        laplacian_doc_vectors,
    )

    featured = _er_featured(sf_dir)

    def emit_sims(group: pd.DataFrame) -> pd.DataFrame:
        group = _sorted(group)
        n = len(group)
        if n < 2:
            return pd.DataFrame({
                "block_key": pd.Series(dtype=object),
                "src": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "tfidf_cos": pd.Series(dtype="float64"),
                "spec_cos": pd.Series(dtype="float64"),
            })
        X = _block_vectors(group)
        tf_sim = X @ X.T
        rows = laplacian_doc_vectors(
            list(group["doc_id"]), list(group["entity_name"]),
            _feature_sets(group),
        )
        spec = cosine_matrix(rows)
        ii, jj = np.triu_indices(n, 1)
        docs = group["doc_id"].to_numpy()
        return pd.DataFrame({
            "block_key": np.repeat(group["block_key"].iloc[0], len(ii)),
            "src": docs[ii],
            "dst": docs[jj],
            "tfidf_cos": tf_sim[ii, jj],
            "spec_cos": spec[ii, jj],
        })

    pairs = featured.select_columns(
        ["doc_id", "block_key", "entity_name", "tf_idx", "tf_cnt",
         "person_clean", "org", "gpe", "loc"]
    ).groupby("block_key").map_groups(emit_sims, batch_format="pandas")

    docs_dir = "/tmp/er_pair_oracle/spectral_docs"
    pairs_dir = "/tmp/er_pair_oracle/spectral_pairs"
    shutil.rmtree(docs_dir, ignore_errors=True)
    shutil.rmtree(pairs_dir, ignore_errors=True)
    featured.select_columns(["doc_id", "block_key"]).write_parquet(docs_dir)
    pairs.write_parquet(pairs_dir)

    clusters = run_combiner(featured, "tfidf_graph_cosine").materialize()
    reps = grouped_aggregate(
        clusters, "cluster_id", {"cluster_rep": ("doc_id", "min")},
        num_buckets=8,
    )
    out = hash_join(clusters, reps, on="cluster_id", num_buckets=8)
    return out.select_columns(["doc_id", "block_key", "cluster_rep"])


ER_COMBINER_SPECTRAL_SQL = """
with recursive docs as (
  select doc_id, block_key
  from read_parquet('/tmp/er_pair_oracle/spectral_docs/*.parquet')
),
kept as (
  select block_key, src, dst
  from read_parquet('/tmp/er_pair_oracle/spectral_pairs/*.parquet')
  where (tfidf_cos
         + least(greatest(spec_cos, -0.25::DOUBLE), 0.65::DOUBLE))
        > 0.5::DOUBLE
),
bi as (
  select block_key, src as a, dst as b from kept
  union
  select block_key, dst, src from kept
),
reach as (
  select block_key, doc_id as node, doc_id as r from docs
  union
  select bi.block_key, bi.a, reach.r
  from bi join reach on reach.node = bi.b and reach.block_key = bi.block_key
),
comp as (select block_key, node, min(r) as rep from reach group by 1, 2)
select node as doc_id, block_key, rep as cluster_rep from comp
"""


def _sanctions_features(sf_dir: str):
    """Full sanction extractor battery over the deterministic nested-struct
    corpus (alias/birth/passport + organisation/nationality/aml/address/
    summary/terms/vectors)."""
    import ray.data as rd

    from entity_resolution_ray.stages.sanctions import (
        org_features,
        sanction_features,
        sanction_terms,
        sanction_text_vectors,
        synth_sanctions,
    )

    n = max(200, min(20_000, _er_docs_for(sf_dir) // 10))
    ds = rd.from_arrow(synth_sanctions(n))
    ds = sanction_features(ds)
    ds = org_features(ds)
    ds = sanction_terms(ds, ["Program", "Reason"])
    ds = sanction_text_vectors(ds)
    return ds.select_columns(
        ["sanction_id", "type", "alias_keys", "alias_phonetic", "yob_range",
         "country_codes", "passport_ids", "org_ids", "designation_years",
         "org_alias_keys", "nationality_codes", "aml_type_set",
         "address_tokens", "address_countries", "full_text_summary",
         "term_program", "term_reason"]
    )


def _sanctions_gt(sf_dir: str):
    """ManualOverlay ground-truth assembly over the synthetic sanctions
    corpus: overlay profiles → profile codes + per-profile hash split."""
    import ray.data as rd

    from entity_resolution_ray.stages.sanctions import (
        manual_overlay_ground_truth,
        synth_overlay_profiles,
        synth_sanctions,
    )

    n = max(200, min(20_000, _er_docs_for(sf_dir) // 10))
    sanctions = synth_sanctions(n)
    profiles = synth_overlay_profiles(sanctions)
    return manual_overlay_ground_truth(
        rd.from_arrow(sanctions), profiles.to_pandas(),
        test_prop=0.2, valid_prop=0.2,
    )


def _sanctions_gt_canon(sf_dir: str):
    """ManualOverlay ground-truth ASSEMBLY under a SQL oracle (reference
    `am_combiner/utils/sanction_data.py:22-184`).  Given data = the raw
    mentions, the raw overlay-profile table (with row order), and the
    per-PROFILE hash split (the one blake2b-protocol piece — dumped from an
    independent restatement of the split formula, so an engine-side formula
    drift breaks the hash).  DuckDB re-derives everything else: the
    source-id explode, the sm → profile mapping with the dict's LAST-WRITE-
    WINS tie rule (`qualify row_number() ... order by row_ord desc,
    list_ord desc`), the DENSE SORTED-PROFILE CODES (the reference's
    sort + `.cat.codes`), the mention left-join with `-1` for unmatched,
    the null-type → 'undefined' coalesce, `blocking_field = type`, and the
    profile-less → 'train' split default."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as _pq
    import ray.data as rd

    from entity_resolution_ray.stages.sanctions import (
        manual_overlay_ground_truth,
        synth_overlay_profiles,
        synth_sanctions,
    )
    from entity_resolution_ray.utils.hashing import stable_hash64

    n = max(200, min(20_000, _er_docs_for(sf_dir) // 10))
    sanctions = synth_sanctions(n)
    profiles = synth_overlay_profiles(sanctions)

    base = "/tmp/er_pair_oracle/gt"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    _pq.write_table(
        sanctions.select(["sanction_id", "type"]),
        os.path.join(base, "mentions.parquet"),
    )
    _pq.write_table(
        profiles.append_column(
            "row_ord", pa.array(range(len(profiles)), pa.int64())
        ),
        os.path.join(base, "profiles.parquet"),
    )

    def split_of(p: str) -> str:  # independent restatement of the protocol
        r = stable_hash64(f"0:{p}") % 10_000
        if r < 0.2 * 10_000:
            return "test"
        if r < 0.4 * 10_000:
            return "valid"
        return "train"

    prof_ids = profiles.column("profile_id").to_pylist()
    _pq.write_table(
        pa.table({
            "profile_id": pa.array(prof_ids, pa.string()),
            "split": pa.array([split_of(p) for p in prof_ids], pa.string()),
        }),
        os.path.join(base, "splits.parquet"),
    )

    return manual_overlay_ground_truth(
        rd.from_arrow(sanctions), profiles.to_pandas(),
        test_prop=0.2, valid_prop=0.2,
    )


SANCTIONS_GT_SQL = """
with m as (
  select sanction_id, type
  from read_parquet('/tmp/er_pair_oracle/gt/mentions.parquet')
),
prof as (
  select profile_id, source_entity_ids, row_ord
  from read_parquet('/tmp/er_pair_oracle/gt/profiles.parquet')
),
exploded as (
  select profile_id,
         unnest(source_entity_ids) as sm,
         unnest(range(1, len(source_entity_ids) + 1)) as list_ord,
         row_ord
  from prof
),
mapping as (
  select sm, profile_id from exploded
  qualify row_number()
          over (partition by sm order by row_ord desc, list_ord desc) = 1
),
codes as (
  select profile_id,
         (row_number() over (order by profile_id) - 1)::BIGINT as code
  from (select distinct profile_id from exploded)
),
sp as (
  select profile_id, split
  from read_parquet('/tmp/er_pair_oracle/gt/splits.parquet')
)
select m.sanction_id,
       mp.profile_id,
       coalesce(c.code, -1::BIGINT) as ground_truth,
       coalesce(m.type, 'undefined') as type,
       coalesce(m.type, 'undefined') as blocking_field,
       coalesce(s.split, 'train') as split
from m
left join mapping mp on mp.sm = m.sanction_id
left join codes c on c.profile_id = mp.profile_id
left join sp s on s.profile_id = mp.profile_id
"""


def _doc_terms(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from entity_resolution_ray.stages.terms import article_terms

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=16,
    )
    terms = article_terms(ds, text_col="text", n=5).select_columns(
        ["doc_id", "terms"]
    )

    # '|'-joined string form: hash-comparable against the SQL string_agg
    def join_terms(batch: pa.Table) -> pa.Table:
        joined = pc.binary_join(
            pc.cast(batch["terms"], pa.list_(pa.string())), "|"
        )
        return pa.table({"doc_id": batch["doc_id"], "terms": joined})

    return terms.map_batches(join_terms, batch_format="pyarrow")


# The published ComboBasic score (Astrakhantsev "ATR4S" 2016; pyate's
# defaults α=0.75, β=0.1) restated in SQL: stopword-delimited token runs →
# 1..4-token phrases, per-doc freq, superstring/substring counts via a
# per-doc term self-join, score = |t|·ln(f+1e-12) + α·supers + β·subs,
# top-5 by (score desc, term asc).  Bit-exact vs stages/terms.py because
# both sides do the same double math on the same integer counts.
DOC_TERMS_SQL = """
with toks as (
  select doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) as tok,
         unnest(range(len(regexp_extract_all(lower(text), '[a-z0-9]+')))) as pos
  from documents
),
marks as (
  select doc_id, pos, tok,
         (length(tok) < 3 or tok in
          ('a','and','for','in','is','of','on','the','to','was','with')) as brk
  from toks
),
runs as (
  select doc_id, pos, tok, brk,
         count(*) filter (where brk)
           over (partition by doc_id order by pos) as run_id
  from marks
),
run_lists as (
  select doc_id, run_id, list(tok order by pos) as l
  from runs where not brk
  group by 1, 2
),
phr as (
  select doc_id, array_to_string(l[s.s+1 : s.s+ln.ln], ' ') as term
  from run_lists,
       unnest(range(1, least(4, len(l)) + 1)) as ln(ln),
       unnest(range(len(l) - ln.ln + 1)) as s(s)
),
freq as (select doc_id, term, count(*) as f from phr group by 1, 2),
rel as (
  select a.doc_id, a.term as t, b.term as u
  from freq a join freq b on a.doc_id = b.doc_id and a.term <> b.term
  where contains(b.term, a.term)
),
supers as (select doc_id, t as term, count(*) as c from rel group by 1, 2),
subs   as (select doc_id, u as term, count(*) as c from rel group by 1, 2),
scored as (
  select f.doc_id, f.term,
         (len(string_split(f.term, ' ')) * ln(f.f + 1e-12)
          + 0.75 * coalesce(sp.c, 0) + 0.1 * coalesce(sb.c, 0)) as score
  from freq f
  left join supers sp on sp.doc_id = f.doc_id and sp.term = f.term
  left join subs   sb on sb.doc_id = f.doc_id and sb.term = f.term
),
top as (
  select doc_id, term,
         row_number() over (partition by doc_id
                            order by score desc, term) as rn
  from scored
)
select d.doc_id, coalesce(string_agg(t.term, '|' order by t.rn), '') as terms
from documents d
left join (select * from top where rn <= 5) t on t.doc_id = d.doc_id
group by d.doc_id
"""


DOC_KEYWORDS = ["table", "hash", "scan", "merge"]


def _doc_keywords(sf_dir: str):
    import pyarrow as pa
    import ray.data as rd

    from entity_resolution_ray.stages.terms import article_keywords

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=16,
    )
    hits = article_keywords(ds, DOC_KEYWORDS, text_col="text")

    def explode(batch: pa.Table) -> pa.Table:
        ids, kws = [], []
        for d, ks in zip(batch["doc_id"].to_pylist(), batch["keywords"].to_pylist()):
            for k in ks:
                ids.append(d)
                kws.append(k)
        return pa.table(
            {"doc_id": pa.array(ids, batch["doc_id"].type),
             "keyword": pa.array(kws, pa.string())}
        )

    return hits.map_batches(explode, batch_format="pyarrow")


DOC_KEYWORDS_SQL = f"""
select d.doc_id, k.keyword
from documents d
cross join (select unnest({DOC_KEYWORDS!r}) as keyword) k
where contains(lower(d.text), k.keyword)
"""


def _sanctions_struct_fields(sf_dir: str):
    """SQL-expressible subset of the sanction extractor battery under a
    DuckDB oracle (reference ``am_combiner/features/common.py:419-630``,
    ``organisation_visitors.py:25-140``, ``sanction_term.py:14-58``,
    ``vectorisation.py:247-339``): the raw nested-struct corpus is dumped to
    parquet and the oracle recomputes YOB-range/known-year, country codes,
    normalized passports, registration-number org ids, designation years,
    nationality/aml sets, term lifts and the display-field summary with
    unnest + list comprehensions.  The phonetic / bigram / address-resolver
    columns stay pytest-verified under ``sanctions_features`` — Soundex and
    the gazetteer resolver aren't reasonable SQL.  List outputs are
    comma-joined for a repr-stable compare (``type_brand_list``
    convention)."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from entity_resolution_ray.stages.sanctions import (
        org_features,
        sanction_features,
        sanction_terms,
        synth_sanctions,
    )

    n = max(200, min(20_000, _er_docs_for(sf_dir) // 10))
    raw = synth_sanctions(n)
    os.makedirs("/tmp/sanctions_oracle", exist_ok=True)
    base = os.path.basename(sf_dir.rstrip("/"))
    pq.write_table(raw, f"/tmp/sanctions_oracle/raw_{base}.parquet")

    ds = sanction_terms(
        org_features(sanction_features(rd.from_arrow(raw))),
        ["Program", "Reason"],
    )
    cols = ["sanction_id", "type", "yob_range", "yob_known", "country_codes",
            "passport_ids", "org_ids", "designation_years",
            "nationality_codes", "aml_type_set", "term_program",
            "term_reason", "full_text_summary"]
    list_cols = [c for c in cols
                 if c not in ("sanction_id", "type", "full_text_summary")]

    def stringify(df: pd.DataFrame) -> pd.DataFrame:
        for c in list_cols:
            df[c] = [",".join(str(v) for v in arr) for arr in df[c]]
        return df

    return ds.select_columns(cols).map_batches(
        stringify, batch_format="pandas"
    )


def _sanctions_struct_fields_sql() -> str:
    from entity_resolution_ray.stages.sanctions import JSON_SUMMARY_TITLES

    titles = ", ".join(
        "'" + t.replace("'", "''") + "'" for t in sorted(JSON_SUMMARY_TITLES)
    )
    # the extractor's token split: _SPLIT_RE characters -> ' '
    split = "[,/)(.;''`-]"
    return f"""
with raw as (
  select * from read_parquet('/tmp/sanctions_oracle/raw_sf0.01.parquet')
)
select
  sanction_id,
  type,
  coalesce(array_to_string(list_sort(list_distinct(flatten(
    [range(b.min_year::bigint, b.max_year::bigint + 1) for b in births
     if b.min_year is not null and b.max_year is not null
        and b.max_year >= b.min_year]))), ','), '') as yob_range,
  coalesce(array_to_string(list_sort(list_distinct(
    [b.min_year::bigint for b in births
     if b.min_year is not null and b.max_year is not null
        and b.min_year = b.max_year])), ','), '') as yob_known,
  coalesce(array_to_string(list_sort(list_distinct(
    [upper(l.country_code) for l in locations
     if coalesce(l.country_code, '') <> ''
        and lower(l.country_code) <> 'international'])), ','), '')
    as country_codes,
  coalesce(array_to_string(list_sort(list_distinct(
    [regexp_replace(upper(p), '[^A-Z0-9]', '', 'g') for p in passports
     if regexp_replace(upper(coalesce(p, '')), '[^A-Z0-9]', '', 'g') <> ''])),
    ','), '') as passport_ids,
  coalesce(array_to_string(list_sort(list_distinct(flatten(
    [[t for t in str_split(
        regexp_replace(coalesce(d.value, ''), '{split}', ' ', 'g'), ' ')
      if len(t) >= 5 and regexp_matches(substr(t, 3), '^[0-9]+$')
         and t not like '%1001']
     for d in display_fields if d.title = 'Registration Number']))), ','), '')
    as org_ids,
  coalesce(array_to_string(list_sort(list_distinct(flatten(
    [[t::bigint for t in str_split(
        regexp_replace(coalesce(d.value, ''), '{split}', ' ', 'g'), ' ')
      if regexp_matches(t, '^[0-9]{{4}}$')]
     for d in display_fields if d.title = 'Designation Date']))), ','), '')
    as designation_years,
  coalesce(array_to_string(list_sort(list_distinct(
    [upper(n.country_code) for n in nationalities
     if coalesce(n.country_code, '') <> ''])), ','), '') as nationality_codes,
  coalesce(array_to_string(list_sort(list_distinct(
    [a.aml_type for a in aml_types
     if coalesce(a.aml_type, '') <> ''])), ','), '') as aml_type_set,
  coalesce(array_to_string(list_sort(list_distinct(
    [substr(d.value, 1, 2000) for d in display_fields
     if upper(replace(coalesce(d.title, ''), ' ', '_')) = 'PROGRAM'
        and coalesce(d.value, '') <> ''])), ','), '') as term_program,
  coalesce(array_to_string(list_sort(list_distinct(
    [substr(d.value, 1, 2000) for d in display_fields
     if upper(replace(coalesce(d.title, ''), ' ', '_')) = 'REASON'
        and coalesce(d.value, '') <> ''])), ','), '') as term_reason,
  coalesce(array_to_string(
    [coalesce(d.value, '') for d in display_fields
     if d.title in ({titles})], '.'), '') as full_text_summary
from raw
"""


def _er_pair_weights(sf_dir: str):
    """Flagship pair-generation semantics under a SQL oracle: the featured
    table (tagger output taken as given data) is written to a parquet the
    oracle reads back, and the pair generator's adjacency weights — posting
    pairs per feature value with the 500-member cap, the all-pairs base for
    blocks ≤ 1200, Σ over the four feature columns — plus the DOB
    negative-evidence rule are recomputed in SQL.  Weights are exact sums of
    1.0 and neg_dob is integer math, so the compare is bit-exact.  The
    float32 cosine channel stays pytest-verified (SQL doubles can't
    reproduce float32 matmul bit-for-bit)."""
    import os

    from entity_resolution_ray.pipelines.er import ERConfig, scored_pairs

    featured = _er_featured(sf_dir)
    oracle_dir = f"/tmp/er_pair_oracle/featured_{os.path.basename(sf_dir.rstrip('/'))}"
    import shutil

    shutil.rmtree(oracle_dir, ignore_errors=True)
    featured.select_columns(
        ["doc_id", "block_key", "person_clean", "org", "gpe", "loc",
         "dob_years"]
    ).write_parquet(oracle_dir)

    edges = scored_pairs(featured, ERConfig())
    return edges.select_columns(
        ["block_key", "src", "dst", "weight", "neg_dob"]
    )


ER_PAIR_WEIGHTS_SQL = """
with docs as (
  select doc_id, block_key, person_clean, org, gpe, loc, dob_years
  from read_parquet('/tmp/er_pair_oracle/featured_sf0.01/*.parquet')
),
bsize as (select block_key, count(*) as n from docs group by 1),
feat as (
  select doc_id, block_key, 'person_clean' as feature, unnest(person_clean) as val from docs
  union all select doc_id, block_key, 'org', unnest(org) from docs
  union all select doc_id, block_key, 'gpe', unnest(gpe) from docs
  union all select doc_id, block_key, 'loc', unnest(loc) from docs
),
capped as (
  select * from (
    select doc_id, block_key, feature, val,
           row_number() over (partition by block_key, feature, val
                              order by doc_id) as rn
    from feat)
  where rn <= 500
),
fpairs as (
  select a.block_key, a.doc_id as src, b.doc_id as dst,
         count(*)::double as w
  from capped a join capped b
    on a.block_key = b.block_key and a.feature = b.feature
   and a.val = b.val and a.doc_id < b.doc_id
  group by 1, 2, 3
),
allp as (
  select a.block_key, a.doc_id as src, b.doc_id as dst
  from docs a
  join docs b on a.block_key = b.block_key and a.doc_id < b.doc_id
  join bsize s on s.block_key = a.block_key
  where s.n <= 1200
),
pairs as (
  select block_key, src, dst, coalesce(f.w, 0.0) as weight
  from allp left join fpairs f using (block_key, src, dst)
  union all
  select f.block_key, f.src, f.dst, f.w as weight
  from fpairs f join bsize s using (block_key)
  where s.n > 1200
),
dob as (
  select doc_id,
         list_min(dob_years) as mn, list_max(dob_years) as mx,
         coalesce(len(dob_years), 0) as k
  from docs
)
select p.block_key, p.src, p.dst, p.weight,
       (a.k > 0 and b.k > 0 and
        (case when b.mn < a.mn then a.mn - b.mx
              else b.mn - a.mx end) > 5) as neg_dob
from pairs p
join dob a on a.doc_id = p.src
join dob b on b.doc_id = p.dst
"""


def _er_scored_pairs_canon(sf_dir: str):
    """Flagship SCORING FORMULA under one SQL oracle, scored by the REAL
    ``PairScorer`` actor stage (stages/scoring.py): exact token-TF cosine
    (vocabulary-dim TF — SQL-joinable, unlike the production blake2b-hashed
    TF, which stays pytest/F1-verified), shared-distinct-token adjacency
    weight, first-3-token names through the production batched
    Jaro-Winkler kernel (bit-identical to DuckDB, commit 79ce607),
    year-token DOB negative evidence, and the production
    clip(w,0,3)/3 boost + 0.1·jw + strict >0.6 accept.  Complements
    ``er_pair_weights`` (which pins pair GENERATION on the real featured
    table): together the whole scoring chain below the vectors is
    SQL-pinned.  Blocks are first-2-token keys (bounded: ≤14 docs/block at
    sf0.1), pairs are full in-block triu — no caps, so the SQL join is an
    exact restatement."""
    import pandas as pd
    import ray.data as rd

    from entity_resolution_ray.stages.aggregate import _add_bucket
    from entity_resolution_ray.stages.scoring import score_pairs
    from entity_resolution_ray.functions.text import tokenize_words

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=8,
    )
    year_re = re.compile(r"^(19|20)[0-9]{2}$")

    def featurize(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            toks = tokenize_words(text or "")
            if not toks:
                continue  # SQL: len(t) > 0 filter
            from collections import Counter

            tf = Counter(toks)
            norm = float(np.sqrt(sum(c * c for c in tf.values())))
            years = sorted({int(t) for t in tf if year_re.match(t)})
            rows.append({
                "doc_id": int(doc_id),
                "block_key": " ".join(toks[:2]),
                "name": " ".join(toks[:3]),
                "tf": dict(tf),
                "norm": norm,
                "dob": years,
            })
        return pd.DataFrame(
            rows, columns=["doc_id", "block_key", "name", "tf", "norm", "dob"])

    feat = ds.map_batches(featurize, batch_format="pandas")
    bucketed = feat.map_batches(
        lambda b: _add_bucket(b, ["block_key"], 16), batch_format="pandas")

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cols = ["block_key", "src", "dst", "weight", "cosine",
                "src_name", "dst_name", "src_dob", "dst_dob", "media_cos"]
        rows = []
        for key, g in group.groupby("block_key", sort=False):
            g = g.sort_values("doc_id", kind="mergesort")
            recs = g.to_dict("records")
            m = len(recs)
            for i in range(m):
                a = recs[i]
                for j in range(i + 1, m):
                    b = recs[j]
                    ta, tb = a["tf"], b["tf"]
                    if len(tb) < len(ta):
                        ta, tb = tb, ta
                    shared = [t for t in ta if t in tb]
                    dot = float(sum(a["tf"][t] * b["tf"][t] for t in shared))
                    rows.append({
                        "block_key": key,
                        "src": a["doc_id"], "dst": b["doc_id"],
                        "weight": len(shared),
                        "cosine": dot / (a["norm"] * b["norm"]),
                        "src_name": a["name"], "dst_name": b["name"],
                        "src_dob": a["dob"], "dst_dob": b["dob"],
                        "media_cos": 0.0,
                    })
        return pd.DataFrame(rows, columns=cols)

    pairs = bucketed.groupby("__bucket").map_groups(
        pairs_in_bucket, batch_format="pandas")
    scored = score_pairs(pairs)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        r6 = lambda x: np.floor(x.to_numpy(np.float64) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({
            "block_key": batch["block_key"],
            "src": batch["src"], "dst": batch["dst"],
            "weight": batch["weight"].astype(np.int64),
            "cosine": r6(batch["cosine"]),
            "jw": r6(batch["jw"]),
            "neg_dob": batch["neg_dob"].astype(bool),
            "score": r6(batch["score"]),
            "accepted": batch["accepted"].astype(bool),
        })

    return scored.map_batches(finish, batch_format="pandas")


ER_SCORED_PAIRS_CANON_SQL = """
with toks as (
  select doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '') as t
  from documents
),
base as (
  select doc_id,
         array_to_string(t[1:2], ' ') as block_key,
         array_to_string(t[1:3], ' ') as name,
         t
  from toks where len(t) > 0
),
tf as (
  select doc_id, tok, count(*)::bigint as cnt
  from (select doc_id, unnest(t) as tok from base) group by 1, 2
),
nrm as (select doc_id, sqrt(sum(cnt * cnt)) as nn from tf group by 1),
yrs as (
  select doc_id, min(tok::int) as ymin, max(tok::int) as ymax
  from (select doc_id, unnest(t) as tok from base)
  where regexp_matches(tok, '^(19|20)[0-9]{2}$')
  group by doc_id
),
p as (
  select a.doc_id as src, b.doc_id as dst, a.block_key,
         a.name as src_name, b.name as dst_name
  from base a join base b
    on a.block_key = b.block_key and a.doc_id < b.doc_id
),
dotp as (
  select p.src, p.dst,
         sum(ta.cnt * tb.cnt)::double as dot, count(*)::bigint as shared
  from p
  join tf ta on ta.doc_id = p.src
  join tf tb on tb.doc_id = p.dst and tb.tok = ta.tok
  group by 1, 2
),
scored as (
  select p.block_key, p.src, p.dst,
         d.shared as weight,
         d.dot / (na.nn * nb.nn) as cosine,
         jaro_winkler_similarity(p.src_name, p.dst_name) as jw,
         (ya.doc_id is not null and yb.doc_id is not null and
          (case when ya.ymin <= yb.ymin then yb.ymin - ya.ymax
                else ya.ymin - yb.ymax end) > 5) as neg_dob
  from p
  join dotp d on d.src = p.src and d.dst = p.dst
  join nrm na on na.doc_id = p.src
  join nrm nb on nb.doc_id = p.dst
  left join yrs ya on ya.doc_id = p.src
  left join yrs yb on yb.doc_id = p.dst
)
select block_key, src, dst, weight,
       round(cosine, 6) as cosine,
       round(jw, 6) as jw,
       neg_dob,
       round(1.0 * cosine + least(greatest(weight::double, 0.0), 3.0) / 3.0
             + 0.1 * jw, 6) as score,
       ((1.0 * cosine + least(greatest(weight::double, 0.0), 3.0) / 3.0
         + 0.1 * jw) > 0.6 and not neg_dob) as accepted
from scored
"""


def _er_clusters_split(sf_dir: str):
    """Flagship clusters re-split by DOB negative evidence: the full
    distributed splitter path (cluster-keyed cogroup of docs with their
    accepted pairs, then per-cluster delete-negative-edges re-CC)."""
    import os

    from entity_resolution_ray.pipelines.er import (
        ERConfig,
        featured_documents,
        read_documents,
        scored_pairs,
    )
    from entity_resolution_ray.stages.clustering import assign_clusters
    from entity_resolution_ray.stages.splitting import (
        attach_cluster_pairs,
        split_clusters,
    )

    cfg = ERConfig()
    featured = _er_featured(sf_dir)
    edges = scored_pairs(featured, cfg).materialize()
    accepted = edges.map_batches(
        lambda t: t.select(["src", "dst", "weight", "block_key"]).filter(t["accepted"]),
        batch_format="pyarrow",
    )
    clustered = assign_clusters(
        featured.select_columns(["doc_id", "block_key", "dob_years"]),
        accepted, n_edges_hint=edges.count(),
    )
    with_pairs = attach_cluster_pairs(clustered, accepted)
    return split_clusters(with_pairs, negator_col="dob_years", distance=5,
                          mode="delete")


def _er_clusters_split_canon(sf_dir: str):
    """Delete-mode splitter under a SQL oracle (§2.10, reference
    `am_combiner/splitters/common.py:181-216`): per original cluster,
    negative edges (both docs carry DOBs and the year ranges sit > 5 apart
    — `utils/adjacency.py:117-172` range semantics) are removed from the
    accepted-pair subgraph and components re-close.  The given data (per-doc
    cluster + dob range, accepted pairs) goes to parquet; DuckDB re-derives
    the negative predicate, the kept edge set, and the recursive-CTE
    closure independently.  Cluster ids canonicalized to min doc_id on both
    sides."""
    import shutil

    import pyarrow as pa

    from entity_resolution_ray.pipelines.er import ERConfig, scored_pairs
    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.clustering import assign_clusters
    from entity_resolution_ray.stages.joins import hash_join
    from entity_resolution_ray.stages.splitting import (
        attach_cluster_pairs,
        split_clusters,
    )

    cfg = ERConfig()
    featured = _er_featured(sf_dir)
    edges = scored_pairs(featured, cfg).materialize()
    accepted = edges.map_batches(
        lambda t: t.select(["src", "dst", "weight", "block_key"]).filter(
            t["accepted"]),
        batch_format="pyarrow",
    ).materialize()
    clustered = assign_clusters(
        featured.select_columns(["doc_id", "block_key", "dob_years"]),
        accepted, n_edges_hint=edges.count(),
    ).materialize()

    docs_dir = "/tmp/er_pair_oracle/split_docs"
    pairs_dir = "/tmp/er_pair_oracle/split_pairs"
    shutil.rmtree(docs_dir, ignore_errors=True)
    shutil.rmtree(pairs_dir, ignore_errors=True)

    def doc_flat(batch: pa.Table) -> pa.Table:
        dob = batch["dob_years"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "cluster_id": batch["cluster_id"],
            "dob_min": pa.array(
                [float(min(v)) if v else None for v in dob], pa.float64()),
            "dob_max": pa.array(
                [float(max(v)) if v else None for v in dob], pa.float64()),
            "has_dob": pa.array([bool(v) for v in dob], pa.bool_()),
        })

    clustered.map_batches(doc_flat, batch_format="pyarrow") \
        .write_parquet(docs_dir)
    accepted.select_columns(["src", "dst"]).write_parquet(pairs_dir)

    with_pairs = attach_cluster_pairs(clustered, accepted)
    split = split_clusters(with_pairs, negator_col="dob_years", distance=5,
                           mode="delete")
    reps = grouped_aggregate(
        split, "cluster_id", {"cluster_rep": ("doc_id", "min")}, num_buckets=8
    )
    out = hash_join(split, reps, on="cluster_id", num_buckets=8)
    return out.select_columns(["doc_id", "cluster_rep"])


ER_CLUSTERS_SPLIT_SQL = """
with recursive docs as (
  select doc_id, cluster_id, dob_min, dob_max, has_dob
  from read_parquet('/tmp/er_pair_oracle/split_docs/*.parquet')
),
pos as (
  select distinct src, dst
  from read_parquet('/tmp/er_pair_oracle/split_pairs/*.parquet')
),
kept as (
  select p.src, p.dst
  from pos p
  join docs a on a.doc_id = p.src
  join docs b on b.doc_id = p.dst
  where a.cluster_id = b.cluster_id
    and not (a.has_dob and b.has_dob
             and greatest(a.dob_min, b.dob_min)
                 - least(a.dob_max, b.dob_max) > 5)
),
bi as (select src as a, dst as b from kept union select dst, src from kept),
reach as (
  select doc_id as node, doc_id as r from docs
  union
  select bi.a, reach.r from bi join reach on reach.node = bi.b
),
comp as (select node as doc_id, min(r) as cluster_rep from reach group by node)
select d.doc_id, c.cluster_rep from docs d join comp c using (doc_id)
"""


def _doc_topics(sf_dir: str):
    import ray.data as rd

    from entity_resolution_ray.stages.topics import fit_topics, topic_distributions

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=16,
    )
    H = fit_topics(ds, n_topics=8, sample=1000, text_col="text")
    return topic_distributions(ds, H, text_col="text").select_columns(
        ["doc_id", "topic_id"]
    )


_TOPICS_K = 8
_TOPICS_ITERS = 30


def _doc_topics_canon(sf_dir: str):
    """NMF topic inference under a FULL SQL restatement (reference analogue:
    per-article LDA inference, `am_combiner/features/topic_model/
    topic_model.py:20-119`).  Given data = the per-doc projected term row
    ``A = X·Hᵀ`` and the 8×8 gram ``H·Hᵀ`` (the fitted-artifact side, like
    the reference's offline LDA fit); DuckDB independently re-derives the
    ENTIRE inference: all 30 multiplicative-update iterations
    ``w ← w·(a/max(w·HHᵀ, 1e-10))`` from uniform start, the left-to-right
    row normalization, the float32 cast of the published vector, and the
    first-max-wins argmax — bit-exact, because `_nmf_infer` pins every
    accumulation to the same IEEE evaluation order the SQL uses."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from entity_resolution_ray.stages.topics import (
        _doc_term_rows,
        _nmf_infer,
        fit_topics,
    )

    k, iters = _TOPICS_K, _TOPICS_ITERS
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=16,
    )
    H = fit_topics(ds, n_topics=k, sample=1000, text_col="text")
    HHt = H @ H.T

    hht_dir = "/tmp/er_pair_oracle/topics_hht"
    a_dir = "/tmp/er_pair_oracle/topics_a"
    shutil.rmtree(hht_dir, ignore_errors=True)
    shutil.rmtree(a_dir, ignore_errors=True)

    import os as _os

    import pyarrow.parquet as _pq

    _os.makedirs(hht_dir, exist_ok=True)
    _pq.write_table(
        pa.table({
            f"h_{j}_{t}": pa.array([float(HHt[j, t])], pa.float64())
            for j in range(k) for t in range(k)
        }),
        _os.path.join(hht_dir, "hht.parquet"),
    )

    href = ray.put(H)

    def dump_a(batch: pa.Table) -> pa.Table:
        from entity_resolution_ray.stages.blocking import fetch_broadcast

        Hm = fetch_broadcast(href)
        X = _doc_term_rows(batch["text"].to_pylist(), Hm.shape[1])
        A = X @ Hm.T
        cols = {"doc_id": batch["doc_id"]}
        for t in range(k):
            cols[f"a{t}"] = pa.array(A[:, t], pa.float64())
        return pa.table(cols)

    ds.map_batches(dump_a, batch_format="pyarrow").write_parquet(a_dir)

    def infer(batch: pa.Table) -> pa.Table:
        A = np.column_stack([batch[f"a{t}"].to_numpy() for t in range(k)])
        W = _nmf_infer(A, HHt, iters)
        W32 = W.astype(np.float32)
        cols = {
            "doc_id": batch["doc_id"],
            "topic_id": pa.array(W.argmax(axis=1), pa.int64()),
        }
        for t in range(k):
            cols[f"w{t}"] = pa.array(W32[:, t].astype(np.float64),
                                     pa.float64())
        return pa.table(cols)

    return rd.read_parquet(a_dir).map_batches(infer, batch_format="pyarrow")


def _build_doc_topics_sql(k: int = _TOPICS_K,
                          iters: int = _TOPICS_ITERS) -> str:
    """Generate the unrolled 30-iteration NMF fold.  Every arithmetic
    expression is written in the exact left-associated order `_nmf_infer`
    evaluates, so DOUBLE results are bit-identical."""
    acols = ", ".join(f"a{t}" for t in range(k))
    parts = [
        "with hht as (select * from "
        "read_parquet('/tmp/er_pair_oracle/topics_hht/*.parquet')),",
        "a as (select * from "
        "read_parquet('/tmp/er_pair_oracle/topics_a/*.parquet')),",
        f"it0 as (select doc_id, {acols}, "
        + ", ".join(f"cast(0.125 as double) as w{t}" for t in range(k))
        + " from a),",
    ]
    for i in range(1, iters + 1):
        exprs = []
        for t in range(k):
            den = " + ".join(f"w{j}*h.h_{j}_{t}" for j in range(k))
            exprs.append(
                f"w{t} * (a{t} / greatest({den}, 1e-10)) as w{t}"
            )
        parts.append(
            f"it{i} as (select doc_id, {acols}, "
            + ", ".join(exprs) + f" from it{i-1}, hht h),"
        )
    ssum = " + ".join(f"w{t}" for t in range(k))
    parts.append(
        f"fin as (select doc_id, greatest({ssum}, 1e-10) as s, "
        + ", ".join(f"w{t}" for t in range(k)) + f" from it{iters}),"
    )
    parts.append(
        "norm as (select doc_id, "
        + ", ".join(f"w{t} / s as n{t}" for t in range(k)) + " from fin)"
    )
    argmax = "case " + " ".join(
        f"when {' and '.join(f'n{t} >= n{j}' for j in range(k) if j != t)} "
        f"then {t}"
        for t in range(k - 1)
    ) + f" else {k - 1} end"
    parts.append(
        "select doc_id, cast(" + argmax + " as bigint) as topic_id, "
        + ", ".join(
            f"cast(cast(n{t} as real) as double) as w{t}" for t in range(k)
        )
        + " from norm"
    )
    return "\n".join(parts)


DOC_TOPICS_SQL = _build_doc_topics_sql()


def entry() -> Any:
    """Flagship ER pipeline at smoke scale (Ray already initialised).

    Runs the pipeline directly — deliberately NOT through the process-level
    ``_CLUSTERED_CACHE`` — so a harness timing repeated ``entry()`` calls
    measures the pipeline, not a dict lookup."""
    import os

    from entity_resolution_ray.pipelines.er import ERConfig, cluster_documents
    from entity_resolution_ray.tuning import apply_context_defaults

    apply_context_defaults()
    fx = _er_corpus("/root/testdata/sf0.001")
    clustered, _ = cluster_documents(
        os.path.join(fx, "documents.parquet"), ERConfig()
    )
    return clustered.select_columns(
        ["doc_id", "entity_name", "block_key", "cluster_id"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from entity_resolution_ray.pipelines import relational as R
    from entity_resolution_ray.tuning import apply_context_defaults

    apply_context_defaults()

    # NB: dict order is the driver's check order and the driver caps the
    # correctness run at ~50 queries per round — every slot in that window
    # must be SQL-oracled (VERDICT r4 task 2), and the window rotates
    # (task 3): r5 re-includes every oracled query whose last driver-green
    # row was r3, then newly-oracled r5 queries, then recently-touched and
    # flagship canonicals.  Non-oracled queries all sit below the window.
    return {
        # --- r5 window: newly-oracled this round (frontmost) ---
        "er_combiner_featr_graph_canon": _er_combiner_featr_graph_canon,
        "er_combiner_gcn_hetero_canon": _er_combiner_gcn_hetero_canon,
        "sanctions_gt_canon": _sanctions_gt_canon,
        "er_combiner_gcn_lc_canon": _er_combiner_gcn_lc_canon,
        "multimodal_pipeline_canon": _multimodal_pipeline_canon,
        "er_combiner_spectral_canon": _er_combiner_spectral_canon,
        "er_combiner_gcn_canon": _er_combiner_gcn_canon,
        "doc_topics_canon": _doc_topics_canon,
        "er_blocks_country_canon": _er_blocks_country_canon,
        "er_combiner_model_canon": _er_combiner_model_canon,
        "er_clusters_canon": _er_clusters_canon,
        "er_cluster_sizes_canon": _er_cluster_sizes_canon,
        "approx_price_quantiles": R.q_approx_price_quantiles,
        "load_mentions_csv": R.q_load_mentions_csv,
        "er_combiner_incremental_canon": _er_combiner_incremental_canon,
        "ann_lsh_recall": _ann_lsh_recall,
        "approx_distinct_parts": R.q_approx_distinct_parts,
        "approx_user_overlap": R.q_approx_user_overlap,
        "part_kcore": R.q_part_kcore,
        "ann_ivf_recall": _ann_ivf_recall,
        "embedding_lsh_recall": _embedding_lsh_recall,
        "ddsketch_price_audit": R.q_ddsketch_price_audit,
        "heavy_hitters_audit": R.q_heavy_hitters_audit,
        "er_clusters_split_canon": _er_clusters_split_canon,
        # --- r5 window: r3-era oracled queries due for rotation ---
        "daily_active": R.q_daily_active,
        "events_neighbors": R.q_events_neighbors,
        "events_rolling": R.q_events_rolling,
        "customers_without_orders": R.q_customers_without_orders,
        "orders_window": R.q_orders_window,
        "events_rank": R.q_events_rank,
        "pricing_rollup": R.q_pricing_rollup,
        "customer_order_totals": R.q_customer_order_totals,
        "orders_cube": R.q_orders_cube,
        "events_ntile": R.q_events_ntile,
        "region_revenue": R.q_region_revenue,
        "fuzzy_part_pairs": R.q_fuzzy_part_pairs,
        "brand_set_ops": R.q_brand_set_ops,
        "props_extract": R.q_props_extract,
        "orders_below_max": R.q_orders_below_max,
        "type_brand_list": R.q_type_brand_list,
        "priority_share": R.q_priority_share,
        "orders_events_daily": R.q_orders_events_daily,
        "price_corr": R.q_price_corr,
        "dedup_jaccard_clusters": R.q_dedup_jaccard_clusters,
        "top_customer_orders": R.q_top_customer_orders,
        "doc_sample_stats": R.q_doc_sample_stats,
        "signup_conversion": R.q_signup_conversion,
        "customer_upsert": R.q_customer_upsert,
        "label_centroids": R.q_label_centroids,
        "stratified_docs": R.q_stratified_docs,
        # --- end of the 50-query driver window ---
        # oracled, driver-green in r3 (rows 2 rounds old; re-swept green at
        # sf0.01 in the r5 closeout parity sweep) or r4; below the window
        "lang_id": R.q_lang_id,
        "doc_stats": R.q_doc_stats,
        "exact_dedup": R.q_exact_dedup,
        "token_topk": R.q_token_topk,
        "embedding_neardup": R.q_embedding_neardup,
        "ann_topk": R.q_ann_topk,
        "vocab_growth": R.q_vocab_growth,
        "event_transitions": R.q_event_transitions,
        "jaccard_neardup": R.q_jaccard_neardup,
        "doc_embeddings": R.q_doc_embeddings,
        "er_scored_pairs_canon": _er_scored_pairs_canon,
        "lineitem_unpivot": R.q_lineitem_unpivot,
        "er_pair_weights": _er_pair_weights,
        "minhash_dedup_canon": R.q_minhash_dedup_canon,
        "er_combiner_cc_canon": _er_combiner_cc_canon,
        "er_combiner_baseline_canon": _er_combiner_baseline_canon,
        "er_blocks_cutoff_canon": _er_blocks_cutoff_canon,
        "er_blocks_phonetic_canon": _er_blocks_phonetic_canon,
        "doc_tfidf_cosine_canon": R.q_doc_tfidf_cosine_canon,
        "jw_part_pairs": R.q_jw_part_pairs,
        "minhash_band_pairs": R.q_minhash_band_pairs,
        "simhash_pairs": _simhash_pairs,
        "phonetic_codes": R.q_phonetic_codes,
        "decontaminate": R.q_decontaminate,
        "passage_dedup": R.q_passage_dedup,
        "doc_terms": _doc_terms,
        "doc_keywords": _doc_keywords,
        "sanctions_struct_fields": _sanctions_struct_fields,
        "winnow_fingerprints": R.q_winnow_fingerprints,
        "winnow_neardup": R.q_winnow_neardup,
        "doc_repetition": R.q_doc_repetition,
        "doc_unigram_nll": R.q_doc_unigram_nll,
        "priority_sample": R.q_priority_sample,
        "events_range_join": R.q_events_range_join,
        "part_pagerank": R.q_part_pagerank,
        "part_triangles": R.q_part_triangles,
        "weighted_price_percentiles": R.q_weighted_price_percentiles,
        "winnow_containment": R.q_winnow_containment,
        "user_growth": R.q_user_growth,
        "segment_profile": R.q_segment_profile,
        "price_zscores": R.q_price_zscores,
        "brand_price_regression": R.q_brand_price_regression,
        "orders_digest": R.q_orders_digest,
        "orders_diff": R.q_orders_diff,
        "q1_pricing_summary": R.q1_pricing_summary,
        "segment_revenue": R.q_segment_revenue,
        "top_orders": R.q_top_orders,
        "nation_customers": R.q_nation_customers,
        "part_filter": R.q_part_filter,
        "events_hourly": R.q_events_hourly,
        "events_asof": R.q_events_asof,
        "events_sessions": R.q_events_sessions,
        "events_sliding": R.q_events_sliding,
        "events_topk_user": R.q_events_topk_user,
        "price_percentiles": R.q_price_percentiles,
        "disc_price_percentiles": R.q_disc_price_percentiles,
        "events_pivot": R.q_events_pivot,
        # non-SQL-expressible pipelines (rows-only checks; all oracled
        # queries are above this line)
        "er_clusters": _er_clusters,
        "er_cluster_sizes": _er_cluster_sizes,
        "er_scored_pairs": _er_scored_pairs,
        "dedup_minhash_clusters": _dedup_minhash_clusters,
        "ann_lsh": _ann_lsh,
        "ann_ivf": _ann_ivf,
        "multimodal_features": _multimodal_features,
        "approx_token_topk": R.q_approx_token_topk,
        "embedding_neardup_lsh": R.q_embedding_neardup_lsh,
        "er_combiner_baseline": _er_combiner("current_production"),
        "er_combiner_cc": _er_combiner("connected_components"),
        "er_combiner_incremental": _er_combiner("pairwise_incremental"),
        "er_combiner_spectral": _er_combiner("tfidf_graph_cosine"),
        "er_combiner_featr_graph": _er_combiner("tfidf_featr_graph_cosine"),
        "er_combiner_model": _er_combiner_model,
        "er_combiner_gcn": _er_combiner("gcn"),
        "er_combiner_gcn_hetero": _er_combiner("gcn_hetero"),
        "er_combiner_gcn_lc": _er_combiner("gcn_lc"),
        "er_blocks_phonetic": _er_blocks_phonetic,
        "er_blocks_country": _er_blocks_country,
        "er_clusters_split": _er_clusters_split,
        "er_blocks_cutoff": _er_blocks_cutoff,
        "sanctions_features": _sanctions_features,
        "sanctions_gt": _sanctions_gt,
        "doc_topics": _doc_topics,
    }


def oracle_sql() -> dict[str, str]:
    from entity_resolution_ray.pipelines import relational as R

    return {
        "er_combiner_featr_graph_canon": ER_COMBINER_FEATR_GRAPH_SQL,
        "er_combiner_gcn_hetero_canon": ER_COMBINER_GCN_HET_SQL,
        "sanctions_gt_canon": SANCTIONS_GT_SQL,
        "er_combiner_gcn_lc_canon": ER_COMBINER_GCN_LC_SQL,
        "multimodal_pipeline_canon": MULTIMODAL_PIPELINE_SQL,
        "er_combiner_spectral_canon": ER_COMBINER_SPECTRAL_SQL,
        "er_combiner_gcn_canon": ER_COMBINER_GCN_SQL,
        "doc_topics_canon": DOC_TOPICS_SQL,
        "er_blocks_country_canon": ER_BLOCKS_COUNTRY_SQL,
        "er_combiner_model_canon": ER_COMBINER_MODEL_SQL,
        "er_clusters_canon": ER_CLUSTERS_CANON_SQL,
        "er_cluster_sizes_canon": ER_CLUSTER_SIZES_SQL,
        "load_mentions_csv": R.Q_LOAD_MENTIONS_CSV_SQL,
        "er_pair_weights": ER_PAIR_WEIGHTS_SQL,
        "er_scored_pairs_canon": ER_SCORED_PAIRS_CANON_SQL,
        "doc_terms": DOC_TERMS_SQL,
        "q1_pricing_summary": R.Q1_SQL,
        "segment_revenue": R.Q_SEGMENT_REVENUE_SQL,
        "top_orders": R.Q_TOP_ORDERS_SQL,
        "nation_customers": R.Q_NATION_CUSTOMERS_SQL,
        "part_filter": R.Q_PART_FILTER_SQL,
        "events_hourly": R.Q_EVENTS_HOURLY_SQL,
        "events_asof": R.Q_EVENTS_ASOF_SQL,
        "events_sessions": R.Q_EVENTS_SESSIONS_SQL,
        "events_sliding": R.Q_EVENTS_SLIDING_SQL,
        "events_topk_user": R.Q_EVENTS_TOPK_USER_SQL,
        "price_percentiles": R.Q_PRICE_PERCENTILES_SQL,
        "disc_price_percentiles": R.Q_DISC_PRICE_PERCENTILES_SQL,
        "events_pivot": R.Q_EVENTS_PIVOT_SQL,
        "daily_active": R.Q_DAILY_ACTIVE_SQL,
        "events_neighbors": R.Q_EVENTS_NEIGHBORS_SQL,
        "events_rolling": R.Q_EVENTS_ROLLING_SQL,
        "customers_without_orders": R.Q_CUSTOMERS_WITHOUT_ORDERS_SQL,
        "orders_window": R.Q_ORDERS_WINDOW_SQL,
        "events_rank": R.Q_EVENTS_RANK_SQL,
        "pricing_rollup": R.Q_PRICING_ROLLUP_SQL,
        "customer_order_totals": R.Q_CUSTOMER_ORDER_TOTALS_SQL,
        "orders_cube": R.Q_ORDERS_CUBE_SQL,
        "events_ntile": R.Q_EVENTS_NTILE_SQL,
        "lineitem_unpivot": R.Q_LINEITEM_UNPIVOT_SQL,
        "region_revenue": R.Q_REGION_REVENUE_SQL,
        "fuzzy_part_pairs": R.Q_FUZZY_PART_PAIRS_SQL,
        "brand_set_ops": R.Q_BRAND_SET_OPS_SQL,
        "props_extract": R.Q_PROPS_EXTRACT_SQL,
        "orders_below_max": R.Q_ORDERS_BELOW_MAX_SQL,
        "type_brand_list": R.Q_TYPE_BRAND_LIST_SQL,
        "priority_share": R.Q_PRIORITY_SHARE_SQL,
        "orders_events_daily": R.Q_ORDERS_EVENTS_DAILY_SQL,
        "price_corr": R.Q_PRICE_CORR_SQL,
        "dedup_jaccard_clusters": R.Q_DEDUP_JACCARD_CLUSTERS_SQL,
        "top_customer_orders": R.Q_TOP_CUSTOMER_ORDERS_SQL,
        "doc_sample_stats": R.Q_DOC_SAMPLE_STATS_SQL,
        "signup_conversion": R.Q_SIGNUP_CONVERSION_SQL,
        "customer_upsert": R.Q_CUSTOMER_UPSERT_SQL,
        "label_centroids": R.Q_LABEL_CENTROIDS_SQL,
        "stratified_docs": R.Q_STRATIFIED_DOCS_SQL,
        "doc_stats": R.Q_DOC_STATS_SQL,
        "lang_id": R.Q_LANG_ID_SQL,
        "exact_dedup": R.Q_EXACT_DEDUP_SQL,
        "token_topk": R.Q_TOKEN_TOPK_SQL,
        "embedding_neardup": R.Q_EMBEDDING_NEARDUP_SQL,
        "ann_topk": R.Q_ANN_TOPK_SQL,
        "jaccard_neardup": R.Q_JACCARD_NEARDUP_SQL,
        "doc_embeddings": R.Q_DOC_EMBEDDINGS_SQL,
        "doc_keywords": DOC_KEYWORDS_SQL,
        "simhash_pairs": SIMHASH_PAIRS_SQL,
        "sanctions_struct_fields": _sanctions_struct_fields_sql(),
        "winnow_fingerprints": R.Q_WINNOW_FINGERPRINTS_SQL,
        "winnow_neardup": R.Q_WINNOW_NEARDUP_SQL,
        "phonetic_codes": R.Q_PHONETIC_CODES_SQL,
        "er_blocks_phonetic_canon": ER_BLOCKS_PHONETIC_SQL,
        "doc_repetition": R.Q_DOC_REPETITION_SQL,
        "doc_unigram_nll": R.Q_DOC_UNIGRAM_NLL_SQL,
        "priority_sample": R.Q_PRIORITY_SAMPLE_SQL,
        "events_range_join": R.Q_EVENTS_RANGE_JOIN_SQL,
        "part_pagerank": R.Q_PART_PAGERANK_SQL,
        "part_triangles": R.Q_PART_TRIANGLES_SQL,
        "weighted_price_percentiles": R.Q_WEIGHTED_PRICE_PERCENTILES_SQL,
        "winnow_containment": R.Q_WINNOW_CONTAINMENT_SQL,
        "user_growth": R.Q_USER_GROWTH_SQL,
        "segment_profile": R.Q_SEGMENT_PROFILE_SQL,
        "price_zscores": R.Q_PRICE_ZSCORES_SQL,
        "brand_price_regression": R.Q_BRAND_PRICE_REGRESSION_SQL,
        "event_transitions": R.Q_EVENT_TRANSITIONS_SQL,
        "orders_digest": R.Q_ORDERS_DIGEST_SQL,
        "orders_diff": R.Q_ORDERS_DIFF_SQL,
        "doc_tfidf_cosine_canon": R.Q_DOC_TFIDF_COSINE_CANON_SQL,
        "vocab_growth": R.Q_VOCAB_GROWTH_SQL,
        "decontaminate": R.Q_DECONTAMINATE_SQL,
        "jw_part_pairs": R.Q_JW_PART_PAIRS_SQL,
        "er_blocks_cutoff_canon": ER_BLOCKS_CUTOFF_SQL,
        "er_combiner_cc_canon": ER_COMBINER_CC_SQL,
        "er_combiner_incremental_canon": ER_COMBINER_INC_SQL,
        "ann_lsh_recall": ANN_LSH_RECALL_SQL,
        "approx_distinct_parts": R.Q_APPROX_DISTINCT_PARTS_SQL,
        "approx_user_overlap": R.Q_APPROX_USER_OVERLAP_SQL,
        "part_kcore": R.Q_PART_KCORE_SQL,
        "ann_ivf_recall": ANN_IVF_RECALL_SQL,
        "embedding_lsh_recall": EMBEDDING_LSH_RECALL_SQL,
        "ddsketch_price_audit": R.Q_DDSKETCH_PRICE_AUDIT_SQL,
        "approx_price_quantiles": R.Q_APPROX_PRICE_QUANTILES_SQL,
        "heavy_hitters_audit": R.Q_HEAVY_HITTERS_AUDIT_SQL,
        "er_clusters_split_canon": ER_CLUSTERS_SPLIT_SQL,
        "er_combiner_baseline_canon": ER_COMBINER_BASELINE_SQL,
        "minhash_band_pairs": R.Q_MINHASH_BAND_PAIRS_SQL,
        "minhash_dedup_canon": R.Q_MINHASH_DEDUP_CANON_SQL,
        "passage_dedup": R.Q_PASSAGE_DEDUP_SQL,
    }
