"""Blockers: block derivation and skew breaking (SURVEY.md §2.10).

- ``identity_blocker``    — blocks = the name key as-is
  (``am_combiner/blockers/common.py:56-67``)
- ``feature_based_blocker`` — connected components over shared derived keys
  (phonetic / metaphone / name-token keys) *define* the blocks; records get a
  ``block_id`` and a deblock mapping restores per-source labels later
  (``am_combiner/blockers/common.py:70-97``)
- ``cutoff_blocker``      — reference ``FeatureBasedNameBlockerWithCutoff``
  (``am_combiner/blockers/common.py:100-201``) semantics: features are tried
  *accumulating* (fewest features first), thresholds per feature descending;
  each pass runs CC over the union of all active features' shared-key edges
  (the newest feature's pair weight thresholded at ``th``, earlier features
  unthresholded — ``_get_adj_matrix``, ``blockers/common.py:160-172``);
  components of size **≥ cluster_cutoff are frozen as blocks** and removed;
  on the final (last feature, th=1) pass the cutoff drops to 0 so every
  remaining record — including keyless fall-throughs — is frozen.

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
from entity_resolution_ray.stages.blocking import candidate_pairs_from_keys, grouped_pairs
from entity_resolution_ray.stages.clustering import (
    attach_labels,
    connected_components_labelprop,
)
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
    doc-hash in hex; singleton docs get their own hash.  Labels land via the
    partitioned ``attach_labels`` join (no driver-side label dict).
    """
    exploded = explode_keys(featured_ds, key_cols)
    pairs = candidate_pairs_from_keys(exploded, "key", cap=cap)
    labels = connected_components_labelprop(pairs)
    return attach_labels(
        featured_ds.select_columns([S.DOC_ID]), labels, out_col="block_id"
    )


def weighted_pairs_from_keys(exploded_ds, cap: int = 500, num_buckets: int = 64):
    """(key, doc_id) rows → (src, dst, weight = #shared key values) — the
    reference adjacency weight (``am_combiner/utils/adjacency.py:47-70``) as
    one bucketed groupby over the emitted per-key pairs."""
    pairs = grouped_pairs(exploded_ds, "key", cap=cap)
    from entity_resolution_ray.stages.blocking import _add_bucket

    bucketed = pairs.map_batches(
        lambda b: _add_bucket(b, ["src", "dst"], num_buckets), batch_format="pandas"
    )

    def count_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out = (
            group.groupby(["src", "dst"], sort=False)
            .size()
            .reset_index(name="weight")
        )
        out["weight"] = out["weight"].astype(np.float64)
        return out

    return bucketed.groupby("__bucket").map_groups(count_bucket, batch_format="pandas")


def anti_join(left_ds, right_ds, on: str, num_buckets: int = 64):
    """left rows whose ``on`` value does NOT appear in right — one bucketed
    cogroup, vectorized ``isin`` per bucket (replaces broadcast member sets)."""

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            h = hash64_array(batch[on].to_pylist())
            t = batch.append_column(
                "__side", pa.array([side] * len(batch), pa.string())
            )
            return t.append_column(
                "__bucket",
                pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            )

        return fn

    l_names = left_ds.schema().names
    lhs = left_ds.map_batches(tag("l"), batch_format="pyarrow")
    rhs = right_ds.select_columns([on]).map_batches(tag("r"), batch_format="pyarrow")

    # pad rhs to lhs schema with typed nulls for the union
    l_schema = left_ds.schema().base_schema
    if not isinstance(l_schema, pa.Schema):
        l_schema = next(
            iter(left_ds.iter_batches(batch_size=1, batch_format="pyarrow"))
        ).schema

    def pad(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {}
        for name in l_names:
            cols[name] = batch[name] if name == on else pa.nulls(
                n, l_schema.field(name).type
            )
        cols["__side"] = batch["__side"]
        cols["__bucket"] = batch["__bucket"]
        return pa.table(cols)

    tagged = lhs.union(rhs.map_batches(pad, batch_format="pyarrow"))

    def filter_bucket(group: pd.DataFrame) -> pd.DataFrame:
        is_r = group["__side"] == "r"
        banned = set(group.loc[is_r, on])
        keep = group[~is_r & ~group[on].isin(banned)]
        return keep[l_names]

    return tagged.groupby("__bucket").map_groups(filter_bucket, batch_format="pandas")


def cutoff_blocker(featured_ds, key_priority: list[str], cluster_cutoff: int = 1000,
                   th_ls: list[int] | None = None, cap: int = 500):
    """Reference-semantics gradual blocking (see module docstring).

    Each (accumulated-features, descending-threshold) pass derives components
    distributed; components with **size ≥ cluster_cutoff** freeze as blocks
    (block id = component min-hash hex); the final pass freezes everything,
    so keyless records fall through every pass and end as singletons only at
    the end.  Returns a Dataset (doc_id, block_id, derived_by).
    """
    th_ls = th_ls or [1] * len(key_priority)
    assert len(th_ls) == len(key_priority), "feature and threshold counts must match"
    remaining = featured_ds.select_columns([S.DOC_ID] + list(key_priority)).materialize()
    frozen = []

    for f, key_col in enumerate(key_priority):
        for th in range(th_ls[f], 0, -1):
            if remaining.count() == 0:
                break
            last = f == len(key_priority) - 1 and th == 1
            cutoff = 0 if last else cluster_cutoff

            # edges: earlier features unthresholded, newest feature ≥ th
            prev = explode_keys(remaining, key_priority[:f]) if f else None
            newest = weighted_pairs_from_keys(
                explode_keys(remaining, [key_col]), cap=cap
            )
            newest = newest.map_batches(
                lambda b, _th=th: b[b["weight"] >= _th][["src", "dst"]],
                batch_format="pandas",
            )
            if prev is not None:
                prev_pairs = candidate_pairs_from_keys(prev, "key", cap=cap)
                edges = prev_pairs.union(newest)
            else:
                edges = newest

            labeled = attach_labels(
                remaining.select_columns([S.DOC_ID]),
                connected_components_labelprop(edges),
                out_col="block_id",
            ).materialize()

            # component-size census → freeze block ids with size ≥ cutoff
            from entity_resolution_ray.stages.aggregate import grouped_aggregate

            if cutoff == 0:
                done = labeled.map_batches(
                    lambda b, _k=key_col, _th=th: b.append_column(
                        "derived_by", pa.array([f"{_k}@th{_th}"] * len(b), pa.string())
                    ),
                    batch_format="pyarrow",
                )
                frozen.append(done)
                remaining = remaining.limit(0).materialize()
                break

            sizes = grouped_aggregate(
                labeled, "block_id", {"n": (S.DOC_ID, "size")}
            )
            big = sizes.map_batches(
                lambda b, _c=cutoff: b[b["n"] >= _c][["block_id"]],
                batch_format="pandas",
            ).materialize()
            if big.count() == 0:
                continue
            big_ids = set(big.to_pandas()["block_id"])  # ≤ #blocks ≥ cutoff: bounded

            def split_frozen(batch: pa.Table, _ids=frozenset(big_ids),
                             _k=key_col, _th=th) -> pa.Table:
                mask = pa.array([b in _ids for b in batch["block_id"].to_pylist()])
                keep = batch.filter(mask)
                return keep.append_column(
                    "derived_by", pa.array([f"{_k}@th{_th}"] * len(keep), pa.string())
                )

            newly = labeled.map_batches(split_frozen, batch_format="pyarrow").materialize()
            frozen.append(newly)
            remaining = anti_join(
                remaining, newly.select_columns([S.DOC_ID]), on=S.DOC_ID
            ).materialize()

    if not frozen:
        return featured_ds.select_columns([S.DOC_ID]).limit(0)
    out = frozen[0]
    for extra in frozen[1:]:
        out = out.union(extra)
    return out


def deblock_composite_ids(df: pd.DataFrame, source_col: str, cluster_col: str) -> pd.Series:
    """Globally unique dense codes for (source, local cluster) composites —
    the reference's ``.astype('category').cat.codes`` deblocking trick."""
    composite = df[source_col].astype(str) + "::" + df[cluster_col].astype(str)
    return composite.astype("category").cat.codes.astype(np.int64)
