"""Deduplication operators over a documents table (doc_id, text).

The reference only has exact dedup on ``(blocking_field, unique_id)``
(``am_combiner/combiners/common.py:89-91``); near-dedup is a north-rule /
training-data addition.  All variants share the same Ray shape:

  signature ``map_batches`` (actor pool) → key explosion → ``groupby(key)``
  candidate pairs (hot keys sharded) → exact verify → transitive clusters
  via the distributed CC operator.

- ``exact_dedup``          — hash(text) groupby, keep min doc_id
- ``jaccard_neardup_pairs``— MinHash-LSH banding candidates + exact word-ngram
                             Jaccard verify (probability of missing a pair at
                             j≥th is (1-th^r)^b — parameters default to b=32,
                             r=4, vanishing for th≥0.4)
- ``simhash_neardup_pairs``— 64-bit SimHash, 4×16-bit band blocking, Hamming
                             distance verify
- ``embedding_neardup_pairs`` — cosine ≥ th over an embedding column by
                             blocked matmul against a broadcast matrix
- ``neardup_clusters``     — any verified pair table → CC → cluster reps
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from entity_resolution_ray.functions.minhash import (
    band_keys,
    exact_jaccard,
    hamming_distance64,
    minhash_signatures_batch,
    simhash_batch,
)
from entity_resolution_ray.stages.blocking import fetch_broadcast
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
    """Actor stage: text → minhash signature + LSH band-key rows."""

    def __init__(self, num_perm: int = 128, num_bands: int = 32, ngram: int = 3):
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sigs = minhash_signatures_batch(
            batch["text"].to_pylist(), self.num_perm, self.ngram
        )
        out_ids, out_band, out_key = [], [], []
        for i, doc in enumerate(ids):
            for b, key in enumerate(band_keys(sigs[i], self.num_bands)):
                out_ids.append(doc)
                out_band.append(b)
                out_key.append(key)
        return pa.table(
            {
                "doc_id": pa.array(out_ids),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.binary()),
            }
        )


def _pairs_in_band(group: pd.DataFrame, cap: int = 200) -> pd.DataFrame:
    ids = np.sort(np.unique(group["doc_id"].to_numpy()))
    if len(ids) < 2:
        return pd.DataFrame({"src": [], "dst": []})
    if len(ids) > cap:
        ids = ids[:cap]  # hot-band guard; documented approximation
    a, b = np.triu_indices(len(ids), 1)
    return pd.DataFrame({"src": ids[a], "dst": ids[b]})


class JaccardVerifier:
    """Actor stage: exact word-ngram Jaccard for candidate pairs.

    Texts are fetched from a broadcast id→text store — near-dup corpora have
    small candidate sets relative to the corpus; for corpus-scale candidate
    volumes, swap the broadcast for a hash join of text onto pairs.
    """

    def __init__(self, texts_ref, ngram: int = 3):
        self.texts = fetch_broadcast(texts_ref)
        self.ngram = ngram

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        jac = np.empty(len(batch), dtype=np.float64)
        src = batch["src"].tolist()
        dst = batch["dst"].tolist()
        for i in range(len(batch)):
            jac[i] = exact_jaccard(
                self.texts.get(src[i], ""), self.texts.get(dst[i], ""), self.ngram
            )
        out = batch.copy()
        out["jaccard"] = np.round(jac, 6)
        return out


def jaccard_neardup_pairs(ds, threshold: float = 0.4, num_perm: int = 128,
                          num_bands: int = 32, ngram: int = 3,
                          concurrency=(1, 8)):
    """Verified near-dup pairs (src < dst, exact jaccard ≥ threshold)."""
    band_rows = ds.select_columns(["doc_id", "text"]).map_batches(
        MinHashSigner,
        fn_constructor_kwargs={
            "num_perm": num_perm, "num_bands": num_bands, "ngram": ngram
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    from entity_resolution_ray.stages.blocking import grouped_pairs

    cand = grouped_pairs(
        band_rows, ["band", "band_key"], id_col="doc_id", cap=200
    )
    from entity_resolution_ray.stages.blocking import dedup_pairs

    cand = dedup_pairs(cand)
    texts_ref = ray.put(
        dict(
            zip(
                ds.select_columns(["doc_id"]).to_pandas()["doc_id"],
                ds.select_columns(["text"]).to_pandas()["text"],
            )
        )
    )
    verified = cand.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={"texts_ref": texts_ref, "ngram": ngram},
        batch_format="pandas",
        concurrency=concurrency,
    )
    return verified.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["jaccard"], threshold)),
        batch_format="pyarrow",
    )


# --- SimHash --------------------------------------------------------------
def simhash_neardup_pairs(ds, max_hamming: int = 12, concurrency: int = 8):
    """Candidate by 4×16-bit simhash bands, verified by Hamming distance."""

    def sign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sigs = simhash_batch(batch["text"].to_pylist())
        out_ids, out_band, out_key, out_sig = [], [], [], []
        for i, doc in enumerate(ids):
            s = int(sigs[i])
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
        a = (batch["src_sig"].to_numpy(np.int64) + (1 << 63)).astype(np.uint64)
        b = (batch["dst_sig"].to_numpy(np.int64) + (1 << 63)).astype(np.uint64)
        d = hamming_distance64(a, b)
        out = batch[["src", "dst"]].copy()
        out["hamming"] = d.astype(np.int64)
        return out[out["hamming"] <= max_hamming]

    return cand.map_batches(verify, batch_format="pandas")


# --- embedding cosine -----------------------------------------------------
def embedding_neardup_pairs(emb_ds, threshold: float = 0.9,
                            id_col: str = "vec_id", vec_col: str = "embedding"):
    """All pairs with cosine ≥ threshold: blocked matmul against a broadcast
    normalized matrix (exact, O(n²/batch) flops — the brute-force tier; the
    LSH-bucketed tier lives in stages/ann.py)."""
    pdf = emb_ds.select_columns([id_col, vec_col]).to_pandas()
    ids = pdf[id_col].to_numpy()
    M = np.stack(pdf[vec_col].to_list()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, M))

    def block_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, mat = fetch_broadcast(ref)
        rows = np.stack(batch[vec_col].to_list()).astype(np.float64)
        rows = rows / np.linalg.norm(rows, axis=1, keepdims=True)
        sims = rows @ mat.T
        my_ids = batch[id_col].to_numpy()
        src_out, dst_out, cos_out = [], [], []
        for i in range(len(my_ids)):
            mask = (sims[i] >= threshold) & (all_ids > my_ids[i])
            for j in np.flatnonzero(mask):
                src_out.append(my_ids[i])
                dst_out.append(all_ids[j])
                cos_out.append(round(float(sims[i, j]), 6))
        return pd.DataFrame({"src": src_out, "dst": dst_out, "cosine": cos_out})

    return emb_ds.map_batches(block_pairs, batch_format="pandas", batch_size=512)


# --- transitive closure ---------------------------------------------------
def neardup_clusters(pairs_ds, all_ids_ds=None, id_col: str = "doc_id"):
    """Verified pair table → (doc_id, dup_cluster) via the distributed CC.

    Components may span LSH bands/keys, so this must use the general
    label-propagation CC, not the block-local fast path.
    """

    def as_str(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.compute.cast(batch["src"], pa.string()),
                "dst": pa.compute.cast(batch["dst"], pa.string()),
            }
        )

    edges = pairs_ds.map_batches(as_str, batch_format="pyarrow")
    labels = connected_components_labelprop(edges)
    return labels
