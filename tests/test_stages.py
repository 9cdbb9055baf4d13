"""Stage tests under a live Ray session: normalize, generator, CC, joins."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from entity_resolution_ray import schema as S
from entity_resolution_ray.stages.clustering import (
    connected_components_labelprop,
    connected_components_local,
    union_find,
)
from entity_resolution_ray.stages.joins import broadcast_join, hash_join
from entity_resolution_ray.stages.normalize import derive_from_spans
from entity_resolution_ray.utils.hashing import hash64_array


def test_generator_deterministic(fixture_1k):
    import json

    with open(os.path.join(fixture_1k, "manifest.json")) as f:
        manifest = json.load(f)
    # pinned hashes: the generator is a pure function of the seed
    assert manifest["n_docs"] == 1000
    assert manifest["hashes"]["documents"] == "771455338cb9a0c5"
    assert manifest["hashes"]["ground_truth"] == "d46acd163ae27628"
    assert manifest["hashes"]["labeled_pairs"] == "a65670d695f4d84e"


def test_normalize_derives_and_preserves_spans(fixture_1k):
    t = pq.read_table(os.path.join(fixture_1k, "documents.parquet")).slice(0, 50)
    out = derive_from_spans(t)
    assert out[S.SPANS].to_pylist() == t[S.SPANS].to_pylist()
    row = out.slice(0, 1).to_pylist()[0]
    name_spans = [s for s in row["spans"] if s["kind"] == "name"]
    text_spans = [s for s in row["spans"] if s["kind"] == "text"]
    media_spans = [s for s in row["spans"] if s["kind"] == "media"]
    assert row["entity_name"] == name_spans[0]["text"]
    assert row["content"] == " ".join(s["text"] for s in text_spans)
    assert row["media_refs"] == [s["media_ref"] for s in media_spans]


def test_union_find_basic():
    parent = union_find(5, np.array([0, 1, 3]), np.array([1, 2, 4]))
    assert parent[0] == parent[1] == parent[2]
    assert parent[3] == parent[4]
    assert parent[0] != parent[3]


def test_labelprop_matches_local_cc():
    rng = np.random.default_rng(3)
    docs = [f"d{i:03d}" for i in range(60)]
    # random edges within 6 disjoint "blocks" of 10
    edges = []
    for b in range(6):
        members = docs[b * 10 : (b + 1) * 10]
        for _ in range(12):
            a, c = rng.choice(members, 2, replace=False)
            edges.append({"src": a, "dst": c, "block_key": f"b{b}"})
    eds = rd.from_items(edges)
    lp = connected_components_labelprop(eds, num_buckets=8).to_pandas()
    loc = connected_components_local(eds).to_pandas()

    # same partition: map node-hash → label for labelprop; node string → min
    # hash label for local
    h = {d: np.int64(np.uint64(hash64_array([d])[0])) for d in docs}
    lp_map = dict(zip(lp["node"], lp["label"]))
    loc_groups = loc.groupby("label")["node"].apply(list)
    for _, members in loc_groups.items():
        labels = {lp_map[h[m]] for m in members}
        assert len(labels) == 1, f"labelprop split a local component: {members}"


def test_hash_join_matches_pandas():
    left = pd.DataFrame({"k": [f"k{i%7}" for i in range(50)], "a": range(50)})
    right = pd.DataFrame({"k": [f"k{i}" for i in range(5)], "b": range(5)})
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "a"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k", how="inner")
        .sort_values(["k", "a"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "a", "b"]], want)


def test_broadcast_join_matches_pandas():
    left = pd.DataFrame({"k": [f"k{i%7}" for i in range(50)], "a": range(50)})
    right = pd.DataFrame({"k": [f"k{i}" for i in range(5)], "b": range(5)})
    got = (
        broadcast_join(rd.from_pandas(left), right, on="k", how="left")
        .to_pandas()
        .sort_values(["k", "a"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k", how="left")
        .sort_values(["k", "a"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "a", "b"]], want)


def test_attach_labels_join_path_matches_broadcast(ray_session):
    """The partitioned cogroup join (engaged above broadcast_cap) must
    produce the same cluster ids as the bounded broadcast path."""
    import pandas as pd
    import ray.data as rd

    from entity_resolution_ray.stages.clustering import assign_clusters

    docs = pd.DataFrame({"doc_id": [f"d{i}" for i in range(40)]})
    edges = pd.DataFrame(
        {"src": [f"d{i}" for i in range(0, 30, 2)],
         "dst": [f"d{i+1}" for i in range(0, 30, 2)]}
    )
    a = assign_clusters(
        rd.from_pandas(docs), rd.from_pandas(edges), broadcast_cap=0
    ).to_pandas()
    b = assign_clusters(
        rd.from_pandas(docs), rd.from_pandas(edges), broadcast_cap=10**9
    ).to_pandas()
    ma = dict(zip(a["doc_id"], a["cluster_id"]))
    mb = dict(zip(b["doc_id"], b["cluster_id"]))
    assert ma == mb
    # paired docs share ids; singletons are alone
    assert ma["d0"] == ma["d1"] and ma["d0"] != ma["d2"]
    assert len({ma[f"d{i}"] for i in range(30, 40)}) == 10


def test_anti_join(ray_session):
    import pandas as pd
    import ray.data as rd

    from entity_resolution_ray.stages.blockers import anti_join

    left = pd.DataFrame({"doc_id": ["a", "b", "c", "d"], "x": [1, 2, 3, 4]})
    right = pd.DataFrame({"doc_id": ["b", "d", "zz"]})
    out = anti_join(
        rd.from_pandas(left), rd.from_pandas(right), on="doc_id"
    ).to_pandas()
    assert sorted(out["doc_id"]) == ["a", "c"]
    assert sorted(out.columns) == ["doc_id", "x"]


def test_size_gated_join_paths_identical():
    """Broadcast (under cap) and hash-join (over cap) paths of
    size_gated_join must produce identical rows (VERDICT r2 #2)."""
    from entity_resolution_ray.stages.joins import size_gated_join

    left = pd.DataFrame({"k": [i % 7 for i in range(50)], "a": range(50)})
    right = pd.DataFrame({"k": list(range(5)), "b": range(5)})

    def run(cap):
        return (
            size_gated_join(
                rd.from_pandas(left), rd.from_pandas(right), on="k",
                broadcast_cap=cap, num_buckets=4,
            )
            .to_pandas()[["k", "a", "b"]]
            .sort_values(["k", "a"])
            .reset_index(drop=True)
            .astype({"k": "int64", "a": "int64", "b": "int64"})
        )

    pd.testing.assert_frame_equal(run(cap=1000), run(cap=0))


def test_attach_embeddings_both_paths():
    """Neo4j embedding visitor analogue: id-keyed embedding attach, identical
    through the broadcast and hash-join paths; inner drops missing ids."""
    import numpy as np

    from entity_resolution_ray.stages.joins import attach_embeddings

    docs = pd.DataFrame({"doc_id": [0, 1, 2, 3], "x": list("abcd")})
    emb = pd.DataFrame(
        {"vec_id": [0, 1, 2], "embedding": [[1.0, 0.0], [0.0, 2.0], [3.0, 4.0]]}
    )

    def run(cap):
        out = attach_embeddings(
            rd.from_pandas(docs), rd.from_pandas(emb),
            id_col="doc_id", emb_id_col="vec_id", broadcast_cap=cap,
            num_buckets=4,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        return out

    a, b = run(1000), run(0)
    assert list(a["doc_id"]) == [0, 1, 2] == list(b["doc_id"])  # inner: id 3 drops
    for df in (a, b):
        norms = [float(np.linalg.norm(v)) for v in df["embedding"]]
        assert norms == [1.0, 2.0, 5.0]
