"""Transitive clustering: distributed connected components (SURVEY.md §2.11).

Reference analogue: per-block dense ``nx.connected_components``
(``am_combiner/combiners/common.py:138-177``) over an in-memory adjacency
matrix, blocks processed sequentially.  Here edges live in a pair table and
components are computed two ways:

1. ``connected_components_labelprop`` — the scale path required by the north
   rule: iterative **min-label propagation over the edge Dataset**, each round
   one bucket-partitioned cogroup (edges ⋈ labels, vectorized pandas merge per
   bucket) + one ``groupby(node).aggregate(Min)``.  Convergence is detected by
   an exact python-int sum of labels (monotonically decreasing under min-
   propagation).  O(diameter) rounds; record-linkage components are blocking-
   key-local, so diameters are small.

2. ``connected_components_local`` — block-local fast path: edges grouped by
   ``block_key``; per-group numpy union-find.  Valid only under the documented
   partitioning assumption that no edge crosses blocks (true for the flagship
   pipeline, false for cross-key near-dedup — which must use path 1).

Node ids are strings; labels are uint64 stable hashes (collision probability
~n²/2⁶⁴, negligible).  Final cluster id = min doc-id-hash of the component,
hex-encoded — deterministic across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Min

from entity_resolution_ray.utils.hashing import hash64_array


# --- numpy union-find (block-local fast path) ------------------------------
def union_find(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Root label per node for n nodes and integer edge arrays."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    # path-compress all
    for i in range(n):
        find(i)
    return parent


def _cc_group_local(group: pd.DataFrame) -> pd.DataFrame:
    src = group["src"].to_numpy()
    dst = group["dst"].to_numpy()
    nodes = np.unique(np.concatenate([src, dst]))
    index = {v: i for i, v in enumerate(nodes)}
    si = np.fromiter((index[v] for v in src), dtype=np.int64, count=len(src))
    di = np.fromiter((index[v] for v in dst), dtype=np.int64, count=len(dst))
    roots = union_find(len(nodes), si, di)
    labels = nodes[roots]  # min doc_id not guaranteed; use root repr then min-fix
    # make label = min node id within each component (deterministic)
    df = pd.DataFrame({"node": nodes, "root": labels})
    min_per_root = df.groupby("root")["node"].transform("min")
    return pd.DataFrame({"node": nodes, "label": min_per_root.to_numpy()})


def connected_components_local(edges_ds, block_col: str = "block_key"):
    """Per-block union-find; requires all edges of a component share block_col."""
    return edges_ds.groupby(block_col).map_groups(
        lambda g: _cc_group_local(g), batch_format="pandas"
    )


# --- distributed min-label propagation -------------------------------------
def _prep_edges(edges_ds, num_buckets: int):
    """(src,dst) strings → undirected hashed edges with bucket column."""

    def fn(batch: pa.Table) -> pa.Table:
        src = hash64_array(batch["src"].to_pylist()).view(np.int64)
        dst = hash64_array(batch["dst"].to_pylist()).view(np.int64)
        u = np.concatenate([src, dst])
        v = np.concatenate([dst, src])
        return pa.table(
            {
                "node": pa.array(u),
                "nbr": pa.array(v),
                "bucket": pa.array((u % num_buckets + num_buckets) % num_buckets),
            }
        )

    return edges_ds.map_batches(fn, batch_format="pyarrow")


def _label_sum(labels_ds) -> int:
    """Exact (arbitrary-precision) checksum of the label column; partials are
    stringified so they never overflow int64."""

    def partial(t: pa.Table) -> pa.Table:
        s = sum(t["label"].to_pylist())
        return pa.table({"s": pa.array([str(s)], pa.string())})

    parts = labels_ds.map_batches(partial, batch_format="pyarrow").take_all()
    return sum(int(r["s"]) for r in parts)


def connected_components_labelprop(edges_ds, num_buckets: int = 32,
                                   max_iter: int = 50):
    """Edge Dataset (src,dst strings) → (node:int64 hash, label:int64 hash).

    Iterative groupby-aggregate min-label propagation; one cogroup join + one
    Min aggregate per round, both bucket-partitioned shuffles.

    Implementation note: the cogroup keeps an explicit ``is_label`` flag
    instead of null sentinels — pandas coerces nullable int64 to float64,
    which silently corrupts 64-bit hash ids.
    """
    edges = _prep_edges(edges_ds, num_buckets).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "label": batch["node"]})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    prev_sum = _label_sum(labels)

    def tag_labels(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch["node"],
                "nbr": pa.array(np.zeros(len(batch), dtype=np.int64)),
                "bucket": pa.array((node % num_buckets + num_buckets) % num_buckets),
                "label": batch["label"],
                "is_label": pa.array(np.ones(len(batch), dtype=np.int8)),
            }
        )

    def tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "node": batch["node"],
                "nbr": batch["nbr"],
                "bucket": batch["bucket"],
                "label": pa.array(np.zeros(n, dtype=np.int64)),
                "is_label": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def propagate(group: pd.DataFrame) -> pd.DataFrame:
        is_lbl = group["is_label"].to_numpy() == 1
        lbl = group.loc[is_lbl, ["node", "label"]]
        edg = group.loc[~is_lbl, ["node", "nbr"]]
        merged = edg.merge(lbl, on="node", how="inner")
        msgs = pd.DataFrame(
            {
                "node": merged["nbr"].to_numpy(dtype=np.int64),
                "label": merged["label"].to_numpy(dtype=np.int64),
            }
        )
        return pd.concat([msgs, lbl], ignore_index=True)

    for _ in range(max_iter):
        comb = edges.map_batches(tag_edges, batch_format="pyarrow").union(
            labels.map_batches(tag_labels, batch_format="pyarrow")
        )
        msgs = comb.groupby("bucket").map_groups(propagate, batch_format="pandas")
        labels = (
            msgs.groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def assign_clusters(docs_ds, edges_ds, mode: str = "labelprop",
                    id_col: str = "doc_id", block_col: str = "block_key",
                    num_buckets: int = 32):
    """docs + accepted edges → docs with a ``cluster_id`` string column.

    Isolated docs (no accepted edge) become singleton clusters.  Cluster id is
    the hex of the component's min doc-id hash — stable, shuffle-independent,
    and globally unique across blocks (the composite-key deblocking trick of
    ``am_combiner/blockers/common.py:41-49`` without a driver-side pass).
    """
    n_edges = edges_ds.count()
    if n_edges == 0:
        label_df = pd.DataFrame({"node": np.empty(0, np.int64),
                                 "label": np.empty(0, np.int64)})
    elif mode == "labelprop":
        labels = connected_components_labelprop(edges_ds, num_buckets=num_buckets)
        label_df = labels.to_pandas()
        if label_df.empty and "node" not in label_df.columns:
            label_df = pd.DataFrame({"node": np.empty(0, np.int64),
                                     "label": np.empty(0, np.int64)})
    else:
        labels = connected_components_local(edges_ds, block_col=block_col)
        ldf = labels.to_pandas()
        node_hash = hash64_array(ldf["node"].tolist()).view(np.int64)
        lbl_hash = hash64_array(ldf["label"].tolist()).view(np.int64)
        # per component the label is the min *doc_id string*; remap to the min
        # hash within the component for a representation identical to labelprop
        df = pd.DataFrame({"node": node_hash, "comp": ldf["label"], "h": node_hash})
        min_h = df.groupby("comp")["h"].transform("min")
        label_df = pd.DataFrame({"node": node_hash, "label": min_h.to_numpy()})

    from entity_resolution_ray.stages.blocking import fetch_broadcast  # noqa
    import ray

    label_map_ref = ray.put(
        dict(zip(label_df["node"].to_numpy(), label_df["label"].to_numpy()))
    )

    def attach(batch: pa.Table) -> pa.Table:
        lmap = fetch_broadcast(label_map_ref)
        ids = batch[id_col].to_pylist()
        h = hash64_array(ids).view(np.int64)
        out = np.empty(len(ids), dtype=object)
        for i, hh in enumerate(h):
            lbl = lmap.get(int(hh), int(hh))
            out[i] = format(np.uint64(lbl), "016x")
        return batch.append_column("cluster_id", pa.array(out, pa.string()))

    return docs_ds.map_batches(attach, batch_format="pyarrow")
