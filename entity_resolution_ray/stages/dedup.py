"""Deduplication operators over a documents table (doc_id, text).

The reference only has exact dedup on ``(blocking_field, unique_id)``
(``am_combiner/combiners/common.py:89-91``); near-dedup is a north-rule /
training-data addition.  All variants share the same Ray shape:

  signature ``map_batches`` (actor pool) → key explosion → ``groupby(key)``
  candidate pairs (hot keys sharded) → exact verify → transitive clusters
  via the distributed CC operator.

- ``exact_dedup``          — hash(text) groupby, keep min doc_id
- ``jaccard_neardup_pairs``— MinHash-LSH banding candidates + exact word-ngram
                             Jaccard verify against a partitioned shingle-hash
                             join (no corpus broadcast).  Miss probability for
                             a pair at jaccard j is (1-j^r)^b with r rows per
                             band and b bands: b=32,r=4 misses ~44% at j=0.4
                             (fine for clustering high-j dups); the default
                             here is b=64,r=1 — miss ≤ (1-j)^64, i.e. ≤ 3e-6
                             at j≥0.18 — so the output is exact-oracle-grade
                             down to low thresholds at higher candidate cost
- ``simhash_neardup_pairs``— 64-bit SimHash, 4×16-bit band blocking, Hamming
                             distance verify
- ``embedding_neardup_pairs`` — cosine ≥ th over an embedding column via a
                             distributed block-nested-loop (each row shuffled
                             to its B bucket-pair groups; per-group matmul) —
                             exact, no driver materialization
- ``neardup_clusters``     — any verified pair table → CC → cluster reps
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from entity_resolution_ray.functions.minhash import (
    hamming_distance64,
    minhash_signatures_batch,
    simhash_batch,
)
from entity_resolution_ray.stages.clustering import connected_components_labelprop
from entity_resolution_ray.utils.hashing import md5_hex


# --- exact ----------------------------------------------------------------
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """One row per distinct text: (fingerprint, doc_id_keep=min id, dup_count).

    Hash-partition by content hash + per-group first — the scalable exact
    dedup shape (group sizes are tiny, the shuffle key is uniform).
    """

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [md5_hex(t or "") for t in batch[text_col].to_pylist()]
        return pa.table({"fp": pa.array(fps, pa.string()), id_col: batch[id_col]})

    from entity_resolution_ray.stages.aggregate import grouped_aggregate

    return grouped_aggregate(
        ds.map_batches(add_fp, batch_format="pyarrow"),
        "fp",
        {"doc_id_keep": (id_col, "min"), "dup_count": (id_col, "size")},
    )


# --- MinHash-LSH ----------------------------------------------------------
class MinHashSigner:
    """Actor stage: text → minhash signature + LSH band-key rows.

    Band keys are mixed down to int64 (uint64 golden-ratio fold of the
    band's signature slice) instead of byte strings: the downstream bucket
    shuffle and per-bucket groupby run on primitive ints, and a fold
    collision can only ADD a candidate pair, which the exact verify filters.
    """

    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def __init__(self, num_perm: int = 128, num_bands: int = 32, ngram: int = 3):
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=object)
        sigs = minhash_signatures_batch(
            batch["text"].to_pylist(), self.num_perm, self.ngram
        )
        n = len(ids)
        b = self.num_bands
        r = max(1, sigs.shape[1] // b)
        sl = sigs[:, : b * r].reshape(n, b, r)
        key = np.zeros((n, b), dtype=np.uint64)
        for k in range(r):  # uint64 wraparound is the intended mixing
            key = key * self._GOLD + sl[:, :, k]
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, b)),
                "band": pa.array(np.tile(np.arange(b, dtype=np.int32), n)),
                "band_key": pa.array(key.reshape(-1).view(np.int64)),
            }
        )


def shingle_hash_table(ds, ngram: int = 3, text_col: str = "text",
                       id_col: str = "doc_id"):
    """docs → (doc_id, sh: sorted unique int64 shingle hashes, n_sh).

    The 64-bit shingle hash stands in for the shingle string (collision odds
    ~|shingles|²/2⁶⁴ — negligible), so the verify join ships ~8 bytes per
    shingle instead of the text.  The sorted array is serialized to a binary
    blob, not a list column — binary survives the join's pandas bucket merge,
    whereas ndarray cells get re-wrapped as Ray tensor extensions with
    per-block shapes that break downstream shuffle concats."""
    from entity_resolution_ray.functions.minhash import shingle_set
    from entity_resolution_ray.utils.hashing import hash64_array

    def fn(batch: pa.Table) -> pa.Table:
        rows = []
        for t in batch[text_col].to_pylist():
            sh = shingle_set(t or "", ngram)
            if sh:
                rows.append(np.sort(hash64_array(sh).view(np.int64)))
            else:
                rows.append(np.empty(0, np.int64))
        return pa.table(
            {
                id_col: batch[id_col],
                "sh": pa.array([r.tobytes() for r in rows], pa.binary()),
                "n_sh": pa.array([len(r) for r in rows], pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(fn, batch_format="pyarrow")


def _signer_pool(concurrency):
    """Signer-pool sizing: minhash signing is embarrassingly parallel and
    compute-bound, so ``None`` auto-sizes the pool max to the cluster's CPU
    count (a fixed (1, 8) cap left 24 of 32 CPUs idle for the longest stage
    of the 1.2M-doc dedup-scale run)."""
    if concurrency is not None:
        return concurrency
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (1, max(8, cpus))


def jaccard_neardup_pairs(ds, threshold: float = 0.4, num_perm: int = 128,
                          num_bands: int = 64, ngram: int = 3,
                          concurrency=None):
    """Verified near-dup pairs (src < dst, exact jaccard ≥ threshold).

    Fully partitioned: LSH banding proposes candidates; the exact verify
    joins each side's shingle-hash array onto the pair table with the
    partitioned ``hash_join`` (never a corpus-sized broadcast) and counts
    intersections with a vectorized sorted-array merge.  Pairs where either
    side has zero shingles score 0 (the SQL-oracle convention: empty docs
    produce no shingle rows, hence no pairs).

    Default banding is b=64, r=2: miss probability (1-j²)^64 — ≤1e-28 at
    j=0.8 (the measured floor of the fixture's dup pairs), 0.2% at j=0.3,
    12% at j=0.18.  For corpora with mass near a low threshold, pass
    ``num_perm == num_bands`` (r=1): miss ≤ (1-j)^b at any j, exactness-grade
    at higher candidate cost.  Candidate and shingle tables are materialized
    mid-pipeline deliberately — each is consumed by two downstream joins."""
    band_rows = ds.select_columns(["doc_id", "text"]).map_batches(
        MinHashSigner,
        fn_constructor_kwargs={
            "num_perm": num_perm, "num_bands": num_bands, "ngram": ngram
        },
        batch_format="pyarrow",
        concurrency=_signer_pool(concurrency),
    )
    from entity_resolution_ray.stages.blocking import dedup_pairs, grouped_pairs

    cand = grouped_pairs(
        band_rows, ["band", "band_key"], id_col="doc_id", cap=200
    )
    cand = dedup_pairs(cand).materialize()
    return exact_jaccard_verify(ds, cand, ngram=ngram, threshold=threshold)


def exact_jaccard_verify(ds, cand, ngram: int = 3, threshold: float = 0.4):
    """Exact-jaccard verification of a MATERIALIZED candidate pair table
    against the corpus ``ds`` — the verify half of ``jaccard_neardup_pairs``,
    reusable by any candidate generator (LSH banding, winnowing, a SQL-pinned
    sketch).  Returns (src, dst, jaccard) with jaccard ≥ threshold; pairs
    where either side has zero shingles score 0 and drop (the SQL-oracle
    convention: empty docs produce no shingle rows, hence no pairs)."""
    # Shingle ONLY candidate-referenced docs: shingle building is the
    # per-string hot loop, and at realistic dup rates the candidate set
    # references a small fraction of the corpus.  A bloom over the pair
    # table's (src ∪ dst) ids has no false negatives, so every doc a pair
    # needs still gets shingled — exactness unchanged, false positives
    # merely shingle a few extra docs (r4 task 4: this join was 91% of the
    # 1.2M-doc dedup-scale wall, dominated by whole-corpus shingling).
    from entity_resolution_ray.stages.blocking import fetch_broadcast
    from entity_resolution_ray.stages.joins import (
        _bloom_positions, _key_hash64, build_bloom_filter,
    )

    cand_ids = cand.map_batches(
        lambda t: pa.table({"doc_id": pa.concat_arrays([
            t["src"].combine_chunks(), t["dst"].combine_chunks()])}),
        batch_format="pyarrow",
    )
    bits = build_bloom_filter(cand_ids, ["doc_id"])
    num_bits = len(bits) * 8
    import ray as _ray

    bits_ref = _ray.put(bits)

    def prune_docs(batch: pd.DataFrame) -> pd.DataFrame:
        b = np.frombuffer(fetch_broadcast(bits_ref), dtype=np.uint8)
        pos = _bloom_positions(_key_hash64(batch, ["doc_id"]), num_bits, 4)
        hit = ((b[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
        return batch[hit]

    docs_pruned = ds.select_columns(["doc_id", "text"]).map_batches(
        prune_docs, batch_format="pandas")
    sh = shingle_hash_table(docs_pruned, ngram=ngram).materialize()
    sh_src = sh.map_batches(
        lambda t: pa.table({"src": t["doc_id"], "src_sh": t["sh"], "src_n": t["n_sh"]}),
        batch_format="pyarrow",
    )
    sh_dst = sh.map_batches(
        lambda t: pa.table({"dst": t["doc_id"], "dst_sh": t["sh"], "dst_n": t["n_sh"]}),
        batch_format="pyarrow",
    )
    # The candidate table is far smaller than the corpus (LSH prunes hard),
    # so the shingle-blob table is bloom-pruned to candidate ids BEFORE each
    # join — the big payload side never rides the exchange for docs no pair
    # references (measured: the two unpruned joins were ~55% of this
    # pipeline's wall at sf0.1).  Bucket count tracks the PRUNED size.
    from entity_resolution_ray.stages.joins import bloom_filtered_join

    nb = int(np.clip(cand.count() // 16384, 4, 256))
    j1 = bloom_filtered_join(sh_src, cand, on="src",
                             num_buckets=nb).materialize()
    joined = bloom_filtered_join(sh_dst, j1, on="dst", num_buckets=nb)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        # Grouped vectorized intersect: both sides' shingle arrays are
        # unique per doc, so a (pair_id, value) appearing twice in the
        # concatenation of the two sides is exactly one intersection hit.
        # One lexsort over the whole batch replaces the former per-pair
        # np.intersect1d loop (the last row-at-a-time loop in this
        # pipeline's hot path).
        n = len(batch)
        src_n = batch["src_n"].to_numpy(np.int64)
        dst_n = batch["dst_n"].to_numpy(np.int64)
        src_blob = b"".join(batch["src_sh"].to_list())
        dst_blob = b"".join(batch["dst_sh"].to_list())
        vals = np.concatenate([
            np.frombuffer(src_blob, np.int64),
            np.frombuffer(dst_blob, np.int64),
        ])
        rows = np.concatenate([
            np.repeat(np.arange(n, dtype=np.int64), src_n),
            np.repeat(np.arange(n, dtype=np.int64), dst_n),
        ])
        order = np.lexsort((vals, rows))
        rows, vals = rows[order], vals[order]
        dup = (rows[1:] == rows[:-1]) & (vals[1:] == vals[:-1])
        inter = np.bincount(rows[1:][dup], minlength=n)
        union = src_n + dst_n - inter
        jac = np.divide(inter, union, out=np.zeros(n, np.float64),
                        where=union > 0)
        out = batch[["src", "dst"]].copy()
        out["jaccard"] = np.round(jac, 6)
        return out[out["jaccard"] >= threshold]

    return joined.map_batches(verify, batch_format="pandas")


# --- SimHash --------------------------------------------------------------
def simhash_neardup_pairs(ds, max_hamming: int = 12, concurrency: int = 8):
    """Candidate by 4×16-bit simhash bands, verified by Hamming distance."""

    def sign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sigs = simhash_batch(batch["text"].to_pylist())
        out_ids, out_band, out_key, out_sig = [], [], [], []
        for i, doc in enumerate(ids):
            s = int(sigs[i])
            if s == 0:
                # token-less doc: no signature (matches the SQL oracle, whose
                # token CTE simply has no rows for it)
                continue
            for b in range(4):
                out_ids.append(doc)
                out_band.append(b)
                out_key.append((s >> (16 * b)) & 0xFFFF)
                out_sig.append(s - (1 << 63))  # store as int64
        return pa.table(
            {
                "doc_id": pa.array(out_ids),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.int64()),
                "sig": pa.array(out_sig, pa.int64()),
            }
        )

    def band_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = g["sig"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"src": [], "dst": [], "src_sig": [], "dst_sig": []})
        a, b = np.triu_indices(len(ids), 1)
        return pd.DataFrame(
            {"src": ids[a], "dst": ids[b], "src_sig": sigs[a], "dst_sig": sigs[b]}
        )

    from entity_resolution_ray.stages.blocking import _add_bucket, dedup_pairs

    signed = ds.select_columns(["doc_id", "text"]).map_batches(
        sign, batch_format="pyarrow"
    )
    bucketed = signed.map_batches(
        lambda b: _add_bucket(b, ["band", "band_key"], 64), batch_format="pandas"
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in group.groupby(["band", "band_key"], sort=False):
            p = band_pairs(g)
            if len(p):
                outs.append(p)
        if not outs:
            return pd.DataFrame({"src": [], "dst": [], "src_sig": [], "dst_sig": []})
        return pd.concat(outs, ignore_index=True)

    cand = dedup_pairs(
        bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas"),
        extra_cols=("src_sig", "dst_sig"),
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        # int64-stored sig + 2^63 must be recovered in uint64 WRAPAROUND
        # arithmetic: int64 + python-int 2^63 silently promotes to float64
        # and rounds the low bits off (wrong hamming on ~3% of pairs — found
        # by the bit-exact SQL oracle)
        half = np.uint64(1) << np.uint64(63)
        a = batch["src_sig"].to_numpy(np.int64).view(np.uint64) + half
        b = batch["dst_sig"].to_numpy(np.int64).view(np.uint64) + half
        d = hamming_distance64(a, b)
        out = batch[["src", "dst"]].copy()
        out["hamming"] = d.astype(np.int64)
        return out[out["hamming"] <= max_hamming]

    return cand.map_batches(verify, batch_format="pandas")


# --- embedding cosine -----------------------------------------------------
def auto_bnl_buckets(n_rows: int, dim: int,
                     target_flops: float = 2e9,
                     max_buckets: int = 64) -> int:
    """Bucket count for the block-nested-loop pair join, from the docstring
    formula B ≈ √(corpus flops / per-task flops): per-group work is
    ~(2n/B)²·dim/2 multiply-adds, so B = √(2·n²·dim / target).  Replication
    factor is B — the cap keeps the shuffle volume ≤ 64× the corpus."""
    if n_rows <= 1:
        return 1
    b = int(np.ceil(np.sqrt(2.0 * n_rows * n_rows * dim / target_flops)))
    return int(np.clip(b, 1, max_buckets))


def embedding_neardup_pairs(emb_ds, threshold: float = 0.9,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            num_buckets: int | None = None):
    """All pairs with cosine ≥ threshold — exact, distributed.

    Block-nested-loop join: every row is hashed into one of B buckets and
    replicated to its B (i,j) bucket-pair groups; one ``groupby`` shuffle
    later each group holds exactly the rows of its two buckets and runs a
    vectorized matmul.  Replication factor is B; ``num_buckets=None``
    (default) auto-sizes B from the corpus row count and dimension via
    ``auto_bnl_buckets`` — no driver-side materialization beyond the
    metadata count, no broadcast matrix.  This is the exact tier, O(n²)
    flops by construction; route large corpora through the sub-quadratic
    ``embedding_neardup_lsh`` instead."""
    if num_buckets is None:
        n_rows = emb_ds.count()
        first = emb_ds.limit(1).take_all()
        dim = len(first[0][vec_col]) if first else 1
        num_buckets = auto_bnl_buckets(n_rows, dim)

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        h = pd.util.hash_pandas_object(batch[id_col], index=False).to_numpy()
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        outs = []
        for j in range(num_buckets):
            lo = np.minimum(b, j)
            hi = np.maximum(b, j)
            outs.append(
                pd.DataFrame(
                    {
                        id_col: ids,
                        vec_col: batch[vec_col].to_numpy(),
                        "__b": b,
                        "__g": lo * num_buckets + hi,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True).drop_duplicates([id_col, "__g"])

    expanded = emb_ds.select_columns([id_col, vec_col]).map_batches(
        expand, batch_format="pandas"
    )

    def per_group(group: pd.DataFrame) -> pd.DataFrame:
        g = int(group["__g"].iloc[0])
        i, j = divmod(g, num_buckets)
        empty = pd.DataFrame({"src": [], "dst": [], "cosine": []})
        A = group[group["__b"] == i]
        ida = A[id_col].to_numpy()
        if len(ida) == 0:
            return empty
        Ma = np.stack(A[vec_col].to_list()).astype(np.float64)
        Ma = Ma / np.linalg.norm(Ma, axis=1, keepdims=True)
        if i == j:
            sims = Ma @ Ma.T
            ai, bj = np.triu_indices(len(ida), 1)
            mask = sims[ai, bj] >= threshold
            ai, bj = ai[mask], bj[mask]
            s, d, c = ida[ai], ida[bj], sims[ai, bj]
        else:
            B = group[group["__b"] == j]
            idb = B[id_col].to_numpy()
            if len(idb) == 0:
                return empty
            Mb = np.stack(B[vec_col].to_list()).astype(np.float64)
            Mb = Mb / np.linalg.norm(Mb, axis=1, keepdims=True)
            sims = Ma @ Mb.T
            ai, bj = np.nonzero(sims >= threshold)
            s, d, c = ida[ai], idb[bj], sims[ai, bj]
        swap = s > d
        src = np.where(swap, d, s)
        dst = np.where(swap, s, d)
        return pd.DataFrame(
            {"src": src, "dst": dst, "cosine": np.round(c, 6)}
        )

    return expanded.groupby("__g").map_groups(per_group, batch_format="pandas")


# --- transitive closure ---------------------------------------------------
def neardup_clusters(pairs_ds, all_ids_ds=None, id_col: str = "doc_id",
                     num_buckets: int = 32):
    """Verified pair table → (doc_id, dup_cluster) via the distributed CC.

    Components may span LSH bands/keys, so this must use the general
    label-propagation CC, not the block-local fast path.  ``num_buckets``
    sizes the contraction shuffles — match it to the PAIR table (dup sets
    are tiny relative to the corpus), not the corpus.
    """

    def as_str(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.compute.cast(batch["src"], pa.string()),
                "dst": pa.compute.cast(batch["dst"], pa.string()),
            }
        )

    edges = pairs_ds.map_batches(as_str, batch_format="pyarrow")
    labels = connected_components_labelprop(edges, num_buckets=num_buckets)
    return labels


def canonical_dup_labels(pairs_ds, num_buckets: int = 8):
    """Verified dup pairs → (doc_id, cluster_id) with the canonical
    min-doc-id label per connected component — the hash-checkable form of
    ``neardup_clusters`` (whose raw 64-bit node/label hashes are not
    SQL-comparable).  The CC runs on node hashes (never ships raw keys
    through the contraction shuffles); canonicalization joins the hash back
    to its doc_id and takes the component min — two bucketed joins + one
    grouped min, all on the (tiny) duplicate set, never the corpus.
    ``pairs_ds`` must be materialized (consumed twice: CC + hash→id map)."""
    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.joins import hash_join
    from entity_resolution_ray.utils.hashing import hash64_array

    labels = neardup_clusters(pairs_ds, num_buckets=num_buckets)

    def ids_of(batch: pa.Table) -> pa.Table:
        vals = sorted(set(batch["src"].to_pylist()) | set(batch["dst"].to_pylist()))
        node = hash64_array([str(v) for v in vals]).view(np.int64)
        return pa.table({"node": pa.array(node),
                         "doc_id": pa.array(vals, pa.int64())})

    ids = grouped_aggregate(
        pairs_ds.map_batches(ids_of, batch_format="pyarrow"),
        "node", {"doc_id": ("doc_id", "min")}, num_buckets=4,
    )
    j = hash_join(labels, ids, on="node", num_buckets=num_buckets)
    mins = grouped_aggregate(
        j, "label", {"cluster_id": ("doc_id", "min")}, num_buckets=4)
    out = hash_join(j, mins, on="label", num_buckets=num_buckets)
    # the CC label table carries one row per (node, bucket-subgraph) — all
    # agreeing on the final label — so collapse to one row per doc
    return grouped_aggregate(
        out, "doc_id", {"cluster_id": ("cluster_id", "min")}, num_buckets=4)


# --- embedding cosine, LSH-bucketed approximate tier ----------------------
def embedding_neardup_lsh(
    emb_ds,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 1234,
):
    """Sub-quadratic approximate variant of ``embedding_neardup_pairs``:
    random-hyperplane signatures bucket the corpus; only rows sharing a
    (table, signature) bucket are compared, with an exact cosine verify —
    so precision is exact and only recall is probabilistic.

    A pair at angle θ collides in one table with p = (1 - θ/π)^planes and
    is found with recall 1 - (1-p)^tables: the defaults (8 planes × 8
    tables) give ~0.94 at cosine 0.9, ~0.99 at 0.95.  LOWER thresholds need
    fewer planes / more tables (the caller's trade — documented because
    cosine-LSH degenerates toward all-pairs as θ → π/2).  Replication
    factor is num_tables; per-bucket work is |bucket|², so expected cost is
    n²·tables / 2^planes — pick planes ≈ log2(n / target_bucket) at scale.
    Plane matrix is regenerated from ``seed`` inside each batch (a few KiB
    of deterministic numpy — cheaper than shipping state), so results are
    reproducible across runs and block orders.
    """

    def signatures(batch: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(batch[vec_col].to_list()).astype(np.float64)
        dim = M.shape[1]
        planes = np.random.default_rng(seed).standard_normal(
            (dim, num_planes * num_tables)
        )
        bits = (M @ planes) > 0
        weights = (1 << np.arange(num_planes, dtype=np.int64))
        outs = []
        for t in range(num_tables):
            sig = bits[:, t * num_planes:(t + 1) * num_planes] @ weights
            outs.append(
                pd.DataFrame(
                    {
                        id_col: batch[id_col].to_numpy(),
                        vec_col: batch[vec_col].to_numpy(),
                        "__bucket": t * (1 << num_planes) + sig,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    sigs = emb_ds.select_columns([id_col, vec_col]).map_batches(
        signatures, batch_format="pandas"
    )

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        if len(ids) < 2:
            # typed empty frame: all-object dtypes from bare [] lists drift
            # the block schema and corrupt downstream joins (see memory:
            # pandas-block dtype drift)
            return pd.DataFrame(
                {"src": np.empty(0, ids.dtype), "dst": np.empty(0, ids.dtype),
                 "cosine": np.empty(0, np.float64)}
            )
        M = np.stack(group[vec_col].to_list()).astype(np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = M @ M.T
        ai, bj = np.triu_indices(len(ids), 1)
        mask = sims[ai, bj] >= threshold
        ai, bj = ai[mask], bj[mask]
        s, d = ids[ai], ids[bj]
        swap = s > d
        return pd.DataFrame(
            {
                "src": np.where(swap, d, s),
                "dst": np.where(swap, s, d),
                "cosine": np.round(sims[ai, bj], 6),
            }
        )

    cand = sigs.groupby("__bucket").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    # the same pair can surface from several tables: keep one
    from entity_resolution_ray.stages.aggregate import grouped_aggregate

    return grouped_aggregate(
        cand, ["src", "dst"], {"cosine": ("cosine", "min")}, num_buckets=16
    )


def _winnow_pair_stats(ds, shingle: int, window: int, max_df: int,
                       concurrency=(1, 8)):
    """Shared winnowing candidate chain: fingerprints → stop-gram prune
    (df > max_df dropped BEFORE pair generation, so every surviving bucket
    emits ≤ C(max_df, 2) pairs) → per-pair shared counts joined with both
    pruned set sizes.  Consumed by the jaccard (``winnow_neardup_pairs``)
    and containment (``winnow_containment_pairs``) scorers."""
    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.blocking import grouped_pairs
    from entity_resolution_ray.stages.joins import hash_join, key_filter_join
    from entity_resolution_ray.stages.textstats import winnow_fingerprints

    fp = winnow_fingerprints(
        ds, shingle=shingle, window=window, concurrency=concurrency
    ).materialize()  # consumed by the df census and the anti-join

    # stop-gram census: fingerprint document frequency (fingerprints are
    # distinct per doc, so size == document frequency)
    hot = grouped_aggregate(
        fp, "fingerprint", {"df": ("doc_id", "size")}
    ).filter(expr=f"df > {max_df}")
    cold = key_filter_join(fp, hot, on="fingerprint", how="anti").materialize()

    n_doc = grouped_aggregate(cold, "doc_id", {"n_fp": ("fingerprint", "size")})

    # cap == max_df: post-prune groups have ≤ max_df members, so the shard
    # path never triggers and every group emits its exact full triu
    pairs = grouped_pairs(cold, "fingerprint", id_col="doc_id", cap=max_df)
    shared = grouped_aggregate(
        pairs, ["src", "dst"], {"shared": ("src", "size")}
    )

    n_src = n_doc.map_batches(
        lambda t: pa.table({"src": t["doc_id"], "n_src": t["n_fp"]}),
        batch_format="pyarrow",
    )
    n_dst = n_doc.map_batches(
        lambda t: pa.table({"dst": t["doc_id"], "n_dst": t["n_fp"]}),
        batch_format="pyarrow",
    )
    return hash_join(hash_join(shared, n_src, on="src"), n_dst, on="dst")


def winnow_neardup_pairs(ds, threshold: float = 0.2, shingle: int = 3,
                         window: int = 4, max_df: int = 64,
                         concurrency=(1, 8)):
    """MOSS-style near-dup pairs: jaccard over winnowing-fingerprint sets.

    Reference analogue: the repo's shingle/minhash near-dup tier
    (``am_combiner``'s similarity tooling) proposes candidates from shared
    text features; winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003) keeps
    ~1/window of the gram hashes while guaranteeing any run of
    ``shingle + window - 1`` shared words still collides, so the candidate
    join is dense where it matters and tiny elsewhere.

    Similarity is the jaccard of the PRUNED fingerprint sets on both sides
    (set sizes are recomputed after the prune so the measure stays a true
    jaccard).  Everything is bit-reproducible in SQL (md5-lower-64 gram
    hash).  Scale shape: see ``_winnow_pair_stats``.
    """
    j = _winnow_pair_stats(ds, shingle, window, max_df, concurrency)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        sh = batch["shared"].to_numpy(np.float64)
        union = (batch["n_src"].to_numpy(np.int64)
                 + batch["n_dst"].to_numpy(np.int64)
                 - batch["shared"].to_numpy(np.int64))
        sim = sh / union
        out = batch[["src", "dst"]].copy()
        out["similarity"] = np.round(sim, 6)
        return out[sim >= threshold]

    return j.map_batches(score, batch_format="pandas")


def winnow_containment_pairs(ds, threshold: float = 0.6, shingle: int = 3,
                             window: int = 4, max_df: int = 64,
                             concurrency=(1, 8)):
    """ASYMMETRIC containment pairs (Broder 1997, §2: r(A,B) = |S(A)∩S(B)|
    / |S(A)|) over winnowing fingerprints: flags subset/quotation
    duplication — a short doc wholly contained in a long one — which the
    symmetric jaccard tier structurally misses (|A∩B|/|A∪B| stays small
    when |B| ≫ |A| even at full containment).

    Emits one row per candidate pair whose containment in EITHER direction
    reaches ``threshold``, with both directed scores (src_in_dst =
    shared/|src|, dst_in_src = shared/|dst|) — each a single
    correctly-rounded int÷int division, identical in SQL.  Candidate
    generation and pruning are shared with ``winnow_neardup_pairs``
    (``_winnow_pair_stats``).
    """
    j = _winnow_pair_stats(ds, shingle, window, max_df, concurrency)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        sh = batch["shared"].to_numpy(np.float64)
        c_src = sh / batch["n_src"].to_numpy(np.float64)
        c_dst = sh / batch["n_dst"].to_numpy(np.float64)
        out = batch[["src", "dst"]].copy()
        out["src_in_dst"] = np.round(c_src, 6)
        out["dst_in_src"] = np.round(c_dst, 6)
        return out[np.maximum(c_src, c_dst) >= threshold]

    return j.map_batches(score, batch_format="pandas")


def decontaminate(ds, bench_pct: int = 5, ngram: int = 8):
    """Benchmark decontamination: flag training documents sharing any word
    ``ngram`` with a held-out benchmark set (the standard LLM training-data
    hygiene pass — e.g. GPT-3 appendix C / PaLM §6.5 use 8-13 gram overlap).

    The benchmark membership is hash-deterministic (md5(doc_id) % 100 <
    bench_pct — same convention as the sampling stage), so the whole
    operator is reproducible and SQL-checkable.  Grams ride the exchange as
    md5-lower-64 hashes (8 bytes), never strings; the training-side gram
    table is semi-joined against the (small) benchmark gram set with the
    key-only filter join, so the full training gram volume crosses the
    shuffle exactly once.  Output: one row per CONTAMINATED training doc
    with the count of distinct shared grams."""
    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.joins import key_filter_join
    from entity_resolution_ray.utils.hashing import md5_hash64_array

    def grams(batch: pa.Table, side: str) -> pa.Table:
        from entity_resolution_ray.functions.text import tokenize_words

        ids = [str(v) for v in batch["doc_id"].to_pylist()]
        in_bench = (md5_hash64_array(ids) % np.uint64(100)) < bench_pct
        out_idx: list[np.ndarray] = []
        out_g: list[np.ndarray] = []
        for i, text in enumerate(batch["text"].to_pylist()):
            if (side == "bench") != bool(in_bench[i]):
                continue
            toks = tokenize_words(text or "")
            m = len(toks) - ngram + 1
            if m <= 0:
                continue
            h = np.unique(md5_hash64_array(
                [" ".join(toks[j:j + ngram]) for j in range(m)]))
            out_idx.append(np.full(len(h), i, np.int64))
            out_g.append(h)
        if not out_idx:
            return pa.table({
                "doc_id": pa.array([], batch["doc_id"].type),
                "gram": pa.array([], pa.uint64()),
            })
        idx = pa.array(np.concatenate(out_idx))
        return pa.table({
            "doc_id": batch["doc_id"].take(idx),
            "gram": pa.array(np.concatenate(out_g), pa.uint64()),
        })

    cols = ds.select_columns(["doc_id", "text"])
    train_grams = cols.map_batches(
        lambda b: grams(b, "train"), batch_format="pyarrow")
    bench_grams = cols.map_batches(
        lambda b: grams(b, "bench"), batch_format="pyarrow",
    ).select_columns(["gram"])

    hits = key_filter_join(train_grams, bench_grams, on="gram", how="semi")
    # grams are distinct per doc, so size == distinct shared grams
    return grouped_aggregate(
        hits, "doc_id", {"n_shared_grams": ("gram", "size")})


# --- passage-level exact dedup ---------------------------------------------
PASSAGE_PACK = 1 << 21  # chunk_no < 2M per doc (k-token chunks: 2M*k tokens)


def passage_exact_dedup(ds, k: int = 10, id_col: str = "doc_id",
                        text_col: str = "text", num_buckets: int = 8):
    """Passage-level exact dedup (the Lee-et-al.-2022 'Deduplicating Training
    Data Makes Language Models Better' shape at chunk granularity): split each
    doc's token stream into non-overlapping k-token chunks, keep each distinct
    chunk text only at its globally-FIRST occurrence — min packed
    (doc_id, chunk_no), chunk_no 1-based — and emit per-doc survival stats:
    (doc_id, n_chunks, n_kept, clean_md5) where clean_md5 is the md5 of the
    kept chunks re-joined in order ('' when every chunk was seen earlier).

    Ray shape: one chunking map (corpus → ~tokens/k rows: chunk text bounded
    at k tokens + 64-bit chunk hash + packed position), a bucketized grouped
    MIN over chunk-hash (first occurrence — partial min inside each bucket,
    never a per-chunk group dispatch), a bucketized hash join back, then one
    doc-hash-bucketed pass for the per-doc stats — O(rows), not O(docs).
    Chunk equality is by 64-bit hash (collision odds ~|chunks|²/2⁶⁴,
    the shingle-table convention).  Docs with zero tokens produce no chunk
    rows and are absent from the output (the SQL-oracle convention)."""
    import hashlib

    from entity_resolution_ray.functions.text import tokenize_words
    from entity_resolution_ray.stages.aggregate import _add_bucket, grouped_aggregate
    from entity_resolution_ray.stages.joins import hash_join
    from entity_resolution_ray.utils.hashing import hash64_array

    def chunk_rows(batch: pa.Table) -> pa.Table:
        out_id: list[int] = []
        out_no: list[int] = []
        out_txt: list[str] = []
        for d, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            toks = tokenize_words(t or "")
            for j in range(0, len(toks), k):
                out_id.append(d)
                out_no.append(j // k + 1)
                out_txt.append(" ".join(toks[j:j + k]))
        ids = np.asarray(out_id, np.int64) if out_id else np.empty(0, np.int64)
        nos = np.asarray(out_no, np.int64) if out_no else np.empty(0, np.int64)
        h = (hash64_array(out_txt).view(np.int64)
             if out_txt else np.empty(0, np.int64))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "chunk_no": pa.array(nos),
                "chunk_text": pa.array(out_txt, pa.string()),
                "chunk_hash": pa.array(h),
                "pack": pa.array(ids * PASSAGE_PACK + nos),
            }
        )

    chunks = ds.select_columns([id_col, text_col]).map_batches(
        chunk_rows, batch_format="pyarrow")
    firsts = grouped_aggregate(
        chunks.select_columns(["chunk_hash", "pack"]),
        "chunk_hash", {"min_pack": ("pack", "min")}, num_buckets=num_buckets,
    )
    flagged = hash_join(chunks, firsts, on="chunk_hash",
                        num_buckets=num_buckets)

    def per_doc(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "n_chunks": np.empty(0, np.int64),
                                 "n_kept": np.empty(0, np.int64),
                                 "clean_md5": pd.Series([], dtype=object)})
        df = group.sort_values(["doc_id", "chunk_no"], kind="mergesort")
        kept = df["pack"].to_numpy() == df["min_pack"].to_numpy()
        n_chunks = df.groupby("doc_id", sort=False).size()
        n_kept = (pd.Series(kept, index=df.index)
                  .groupby(df["doc_id"], sort=False).sum().astype(np.int64))
        joined = (df.loc[kept].groupby("doc_id", sort=False)["chunk_text"]
                  .agg(" ".join).reindex(n_chunks.index).fillna(""))
        return pd.DataFrame(
            {
                "doc_id": n_chunks.index.to_numpy(np.int64),
                "n_chunks": n_chunks.to_numpy(np.int64),
                "n_kept": n_kept.to_numpy(np.int64),
                "clean_md5": [hashlib.md5(s.encode("utf-8")).hexdigest()
                              for s in joined.to_numpy()],
            }
        )

    bucketed = flagged.map_batches(
        lambda b: _add_bucket(b, ["doc_id"], 16), batch_format="pandas")
    return bucketed.groupby("__bucket").map_groups(
        per_doc, batch_format="pandas")
