"""Blocking & candidate-pair generation (the engine's self-join).

Reference semantics being reproduced (SURVEY.md §2.5):

- ``get_article_feature_adjacency_matrix`` (``am_combiner/utils/adjacency.py:15-70``)
  — inverted index of feature value → member list, an edge per co-occurring
  pair, weight = number of shared feature values (optionally 1/len(posting)),
- dense within-block cosine candidate set (``am_combiner/combiners/tfidf.py``)
  — realized here as *all pairs of a block* up to a size cap, since at scale a
  dense N² per hot block is the thing that must be defused (reference's own
  guards: country split >1000, cluster cutoff blocking).

Two pair generators:

1. ``block_candidate_pairs`` — the flagship path: ``groupby(block_key)`` over
   featured docs, per group (vectorized numpy):
   all-pairs (weight base 0) when the block is small enough, plus
   feature-posting pairs with weights, plus the within-group TF-IDF cosine for
   every emitted pair (vectors are co-located with the group — the documented
   partitioning assumption).  Emits a narrow pair table carrying the per-side
   payloads the downstream scorer needs (names, media refs, dob years).

2. ``candidate_pairs_from_keys`` — the generic explode→groupby self-join used
   by near-dedup: rows ``(key, doc_id)`` → groupby(key) → pairs, with
   posting-list **sharding (salting)** for hot keys: a posting larger than the
   cap is split into shards; pairs are emitted within shards plus a chain
   between shard representatives, preserving *connectivity* (what transitive
   clustering needs) while bounding pair count — the documented skew tradeoff.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from entity_resolution_ray import schema as S

# ---------------------------------------------------------------------------
# broadcast cache (ray.put object fetched once per worker process)
_BROADCAST_CACHE: dict[bytes, object] = {}


def fetch_broadcast(ref):
    key = ref.binary()
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


PAIR_PAYLOAD_COLS = [
    S.DOC_ID,
    S.ENTITY_NAME,
    S.BLOCK_KEY,
    "person_clean",
    "org",
    "gpe",
    "loc",
    "dob_years",
    "media_refs",
    "tf_idx",
    "tf_cnt",
]

FEATURE_COLS = ["person_clean", "org", "gpe", "loc"]


def _posting_pairs(n_docs: int, postings: list[np.ndarray], inverse_degree: bool = False):
    """Vectorized pair weights from posting lists (i<j), reference adjacency
    semantics: weight(i,j) = #shared values (or sum of 1/len(posting))."""
    ii, jj, ww = [], [], []
    for post in postings:
        m = len(post)
        if m < 2:
            continue
        a, b = np.triu_indices(m, 1)
        ii.append(post[a])
        jj.append(post[b])
        w = np.full(len(a), 1.0 / m if inverse_degree else 1.0, dtype=np.float64)
        ww.append(w)
    if not ii:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.float64),
        )
    i = np.concatenate(ii)
    j = np.concatenate(jj)
    w = np.concatenate(ww)
    codes = i.astype(np.int64) * n_docs + j
    uniq, inv = np.unique(codes, return_inverse=True)
    wsum = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(wsum, inv, w)
    return uniq // n_docs, uniq % n_docs, wsum


def _block_postings(values_lists: list[list[str]], cap: int) -> list[np.ndarray]:
    """value -> member indices postings for one feature column of one block."""
    inv: dict[str, list[int]] = {}
    for i, vals in enumerate(values_lists):
        if vals is None:
            continue
        for v in vals:
            inv.setdefault(v, []).append(i)
    out = []
    for members in inv.values():
        if len(members) > cap:
            members = members[:cap]  # deterministic: docs sorted by doc_id
        out.append(np.asarray(members, dtype=np.int64))
    return out


def _pairwise_cosine(X: np.ndarray, i_idx: np.ndarray, j_idx: np.ndarray) -> np.ndarray:
    """Row-pair cosines; X rows are L2-normalized. Full N² gram for small N,
    chunked gathers otherwise."""
    n = X.shape[0]
    if n * n <= 4_000_000:
        sim = X @ X.T
        return sim[i_idx, j_idx]
    out = np.empty(len(i_idx), dtype=np.float64)
    chunk = max(1, 32_000_000 // max(X.shape[1], 1))
    for s in range(0, len(i_idx), chunk):
        e = s + chunk
        out[s:e] = np.einsum("ij,ij->i", X[i_idx[s:e]], X[j_idx[s:e]])
    return out


class BlockPairGenerator:
    """Per-block candidate generation + within-block cosine (used in map_groups)."""

    def __init__(self, idf_ref=None, all_pairs_cap: int = 1200,
                 posting_cap: int = 500, tf_dim: int = 1 << 18,
                 inverse_degree: bool = False):
        self.idf_ref = idf_ref
        self.all_pairs_cap = all_pairs_cap
        self.posting_cap = posting_cap
        self.tf_dim = tf_dim
        self.inverse_degree = inverse_degree
        self._idf = None

    def _get_idf(self):
        if self._idf is None and self.idf_ref is not None:
            self._idf = fetch_broadcast(self.idf_ref)
        return self._idf

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(S.DOC_ID, kind="mergesort").reset_index(drop=True)
        n = len(group)
        empty = {
            S.BLOCK_KEY: [], "src": [], "dst": [], "weight": [],
            "cosine": [], "src_name": [], "dst_name": [],
            "src_media": [], "dst_media": [], "src_dob": [], "dst_dob": [],
        }
        if n < 2:
            return pd.DataFrame(empty)

        postings: list[np.ndarray] = []
        for col in FEATURE_COLS:
            postings.extend(_block_postings(list(group[col]), self.posting_cap))
        fi, fj, fw = _posting_pairs(n, postings, self.inverse_degree)

        if n <= self.all_pairs_cap:
            ai, aj = np.triu_indices(n, 1)
            base = np.zeros(len(ai), dtype=np.float64)
            codes_f = fi * n + fj
            codes_a = ai.astype(np.int64) * n + aj
            wmap = np.zeros(n * n, dtype=np.float64)
            wmap[codes_f] = fw
            i_idx, j_idx, w = ai, aj, base + wmap[codes_a]
        else:
            i_idx, j_idx, w = fi, fj, fw

        if len(i_idx) == 0:
            return pd.DataFrame(empty)

        # within-block TF-IDF cosine (vectors co-located with the group)
        idf = self._get_idf()
        local_vocab: dict[int, int] = {}
        rows_idx = list(group["tf_idx"])
        rows_cnt = list(group["tf_cnt"])
        for r in rows_idx:
            for t in r:
                if t not in local_vocab:
                    local_vocab[t] = len(local_vocab)
        V = max(len(local_vocab), 1)
        X = np.zeros((n, V), dtype=np.float32)
        for r, (ridx, rcnt) in enumerate(zip(rows_idx, rows_cnt)):
            if len(ridx) == 0:
                continue
            cols = np.fromiter((local_vocab[t] for t in ridx), dtype=np.int64,
                               count=len(ridx))
            vals = np.asarray(rcnt, dtype=np.float64)
            if idf is not None:
                vals = vals * idf[np.asarray(ridx, dtype=np.int64)]
            norm = np.sqrt((vals * vals).sum())
            if norm > 0:
                vals /= norm
            X[r, cols] = vals
        cos = _pairwise_cosine(X, i_idx, j_idx)

        ids = group[S.DOC_ID].to_numpy()
        names = group[S.ENTITY_NAME].to_numpy()
        media = list(group["media_refs"])
        dob = list(group["dob_years"])
        return pd.DataFrame(
            {
                S.BLOCK_KEY: np.repeat(group[S.BLOCK_KEY].iloc[0], len(i_idx)),
                "src": ids[i_idx],
                "dst": ids[j_idx],
                "weight": w,
                "cosine": cos,
                "src_name": names[i_idx],
                "dst_name": names[j_idx],
                "src_media": [media[k] for k in i_idx],
                "dst_media": [media[k] for k in j_idx],
                "src_dob": [dob[k] for k in i_idx],
                "dst_dob": [dob[k] for k in j_idx],
            }
        )


def block_candidate_pairs(featured_ds, idf_ref=None, **gen_kwargs):
    """groupby(block_key) → per-block candidate pairs with cosine + weights."""
    gen = BlockPairGenerator(idf_ref=idf_ref, **gen_kwargs)

    def generate_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return gen(group)

    narrow = featured_ds.select_columns(PAIR_PAYLOAD_COLS)
    return narrow.groupby(S.BLOCK_KEY).map_groups(
        generate_pairs, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# generic key-explosion candidate generator (near-dedup path)

def _sharded_pairs(members: np.ndarray, cap: int):
    """Pairs for one posting with hot-key sharding: full pairs within each
    shard of ≤cap members + a representative chain across shards (keeps the
    posting connected for transitive clustering at O(cap²·shards) cost)."""
    m = len(members)
    if m <= cap:
        a, b = np.triu_indices(m, 1)
        return members[a], members[b]
    srcs, dsts = [], []
    reps = []
    for s in range(0, m, cap):
        shard = members[s : s + cap]
        a, b = np.triu_indices(len(shard), 1)
        srcs.append(shard[a])
        dsts.append(shard[b])
        reps.append(shard[0])
    reps = np.asarray(reps)
    srcs.append(reps[:-1])
    dsts.append(reps[1:])
    return np.concatenate(srcs), np.concatenate(dsts)


def pairs_for_key_group(group: pd.DataFrame, cap: int = 500,
                        id_col: str = "doc_id") -> pd.DataFrame:
    ids = np.sort(group[id_col].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"src": [], "dst": []})
    src, dst = _sharded_pairs(ids, cap)
    return pd.DataFrame({"src": src, "dst": dst})


def candidate_pairs_from_keys(exploded_ds, key_cols, cap: int = 500,
                              id_col: str = "doc_id"):
    """(key, doc_id) rows → deduped candidate pair table (src < dst)."""
    pairs = exploded_ds.groupby(key_cols).map_groups(
        lambda g: pairs_for_key_group(g, cap=cap, id_col=id_col),
        batch_format="pandas",
    )
    # dedup pairs that co-occur under several keys
    return pairs.groupby(["src", "dst"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
