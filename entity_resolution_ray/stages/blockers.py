"""Blockers: block derivation and skew breaking (SURVEY.md §2.10).

- ``identity_blocker``    — blocks = the name key as-is
  (``am_combiner/blockers/common.py:56-67``)
- ``feature_based_blocker`` — connected components over shared derived keys
  (phonetic / metaphone / name-token keys) *define* the blocks; records get a
  ``block_id`` and a deblock mapping restores per-source labels later
  (``am_combiner/blockers/common.py:70-97``)
- ``cutoff_blocker``      — iterative: strictest key first; blocks under the
  cutoff are frozen, oversized blocks are re-derived with the next (weaker)
  key, unassigned fall through (``am_combiner/blockers/common.py:100-201``)

Key explosion → candidate pairs → distributed CC is the same machinery the
flagship uses, so blocks derive scalably; the composite ``(source, cluster)``
→ dense-code deblocking trick (``blockers/common.py:31-53``) becomes a
stable-hash composite id, needing no driver-side pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from entity_resolution_ray import schema as S
from entity_resolution_ray.stages.blocking import candidate_pairs_from_keys
from entity_resolution_ray.stages.clustering import connected_components_labelprop
from entity_resolution_ray.utils.hashing import hash64_array


def explode_keys(featured_ds, key_cols: list[str]):
    """One (key, doc_id) row per non-empty key value per doc."""

    def explode(batch: pa.Table) -> pa.Table:
        docs, keys = [], []
        ids = batch[S.DOC_ID].to_pylist()
        for col in key_cols:
            vals = batch[col].to_pylist()
            for d, v in zip(ids, vals):
                if v:
                    docs.append(d)
                    keys.append(f"{col}={v}")
        return pa.table(
            {"key": pa.array(keys, pa.string()), S.DOC_ID: pa.array(docs, pa.string())}
        )

    return featured_ds.map_batches(explode, batch_format="pyarrow")


def feature_based_blocker(featured_ds, key_cols: list[str], cap: int = 500):
    """Derive block ids: CC over docs sharing any derived key.

    Returns a Dataset (doc_id, block_id) — block_id is the component's min
    doc-hash in hex; singleton docs get their own hash.
    """
    exploded = explode_keys(featured_ds, key_cols)
    pairs = candidate_pairs_from_keys(exploded, "key", cap=cap)
    labels = connected_components_labelprop(pairs).to_pandas()
    import ray

    lmap_ref = ray.put(dict(zip(labels["node"], labels["label"])))

    def attach(batch: pa.Table) -> pa.Table:
        from entity_resolution_ray.stages.blocking import fetch_broadcast

        lmap = fetch_broadcast(lmap_ref)
        ids = batch[S.DOC_ID].to_pylist()
        h = hash64_array(ids).view(np.int64)
        out = [
            format(np.uint64(lmap.get(int(x), int(x))), "016x") for x in h
        ]
        return pa.table(
            {
                S.DOC_ID: batch[S.DOC_ID],
                "block_id": pa.array(out, pa.string()),
            }
        )

    return featured_ds.select_columns([S.DOC_ID]).map_batches(
        attach, batch_format="pyarrow"
    )


def cutoff_blocker(featured_ds, key_priority: list[str], cluster_cutoff: int = 1000,
                   cap: int = 500):
    """Iterative cutoff blocking: freeze small blocks, re-derive oversized
    ones with the next key, leftovers become singleton blocks.

    Driver loop bounded by len(key_priority); each pass is one distributed
    block derivation + size census (the reference's loop shape,
    ``blockers/common.py:100-201``).
    """
    remaining = featured_ds.select_columns(
        [S.DOC_ID] + [c for c in key_priority]
    ).materialize()
    frozen: list[pd.DataFrame] = []

    for key_col in key_priority:
        if remaining.count() == 0:
            break
        blocks = feature_based_blocker(remaining, [key_col], cap=cap).to_pandas()
        sizes = blocks.groupby("block_id")["doc_id"].transform("size")
        ok = blocks[sizes <= cluster_cutoff].copy()
        ok["derived_by"] = key_col
        frozen.append(ok)
        keep_docs = set(blocks.loc[sizes > cluster_cutoff, "doc_id"])
        if not keep_docs:
            remaining = remaining.limit(0)
            break
        import ray

        keep_ref = ray.put(keep_docs)

        def keep_fn(batch: pa.Table) -> pa.Table:
            from entity_resolution_ray.stages.blocking import fetch_broadcast

            keep = fetch_broadcast(keep_ref)
            mask = pa.array([d in keep for d in batch[S.DOC_ID].to_pylist()])
            return batch.filter(mask)

        remaining = remaining.map_batches(keep_fn, batch_format="pyarrow").materialize()

    if remaining.count() > 0:
        left = remaining.select_columns([S.DOC_ID]).to_pandas()
        left["block_id"] = [
            format(np.uint64(h), "016x") for h in hash64_array(left["doc_id"].tolist())
        ]
        left["derived_by"] = "singleton"
        frozen.append(left[["doc_id", "block_id", "derived_by"]])

    return pd.concat(frozen, ignore_index=True)


def deblock_composite_ids(df: pd.DataFrame, source_col: str, cluster_col: str) -> pd.Series:
    """Globally unique dense codes for (source, local cluster) composites —
    the reference's ``.astype('category').cat.codes`` deblocking trick."""
    composite = df[source_col].astype(str) + "::" + df[cluster_col].astype(str)
    return composite.astype("category").cat.codes.astype(np.int64)
