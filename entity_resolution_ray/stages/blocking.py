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
from entity_resolution_ray.utils.hashing import hash64_array


def hash64_np(ids) -> np.ndarray:
    """uint64 stable hashes for an array-like of string ids."""
    return hash64_array(list(ids))


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
    "media_vec",
    "tf_idx",
    "tf_cnt",
]

FEATURE_COLS = ["person_clean", "org", "gpe", "loc"]


_TRIU_CACHE: dict[int, tuple] = {}


def _triu(m: int) -> tuple:
    """np.triu_indices(m, 1) with a small-size cache: the numpy call builds
    an O(m²) mask matrix every time, which dominates pair generation when
    postings/blocks are tiny (measured ~40% of the bucket kernel); sizes
    ≤ 64 repeat constantly and cost ~1.4 MB total to keep."""
    if m > 64:
        return np.triu_indices(m, 1)
    t = _TRIU_CACHE.get(m)
    if t is None:
        t = np.triu_indices(m, 1)
        _TRIU_CACHE[m] = t
    return t


def _posting_pairs(n_docs: int, postings: list[np.ndarray], inverse_degree: bool = False):
    """Vectorized pair weights from posting lists (i<j), reference adjacency
    semantics: weight(i,j) = #shared values (or sum of 1/len(posting))."""
    ii, jj, ww = [], [], []
    for post in postings:
        m = len(post)
        if m < 2:
            continue
        a, b = _triu(m)
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


def _local_tf_matrix(rows_idx: list, rows_cnt: list, idf) -> np.ndarray:
    """Dense L2-normalized (tf[-idf]) matrix over a block-local vocabulary."""
    local_vocab: dict[int, int] = {}
    for r in rows_idx:
        for t in r:
            if t not in local_vocab:
                local_vocab[t] = len(local_vocab)
    n = len(rows_idx)
    X = np.zeros((n, max(len(local_vocab), 1)), dtype=np.float32)
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
    return X


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
                 inverse_degree: bool = False, dob_distance: int = 5):
        self.idf_ref = idf_ref
        self.all_pairs_cap = all_pairs_cap
        self.posting_cap = posting_cap
        self.tf_dim = tf_dim
        self.inverse_degree = inverse_degree
        self.dob_distance = dob_distance
        self._idf = None

    def _get_idf(self):
        if self._idf is None and self.idf_ref is not None:
            self._idf = fetch_broadcast(self.idf_ref)
        return self._idf

    EMPTY = {
        S.BLOCK_KEY: [], "src": [], "dst": [], "weight": [],
        "cosine": [], "ftr_cos": [], "media_cos": [], "neg_dob": [],
        "src_name": [], "dst_name": [],
    }

    def pairs_for_slice(self, cols: dict, s: int, e: int,
                        salted: bool) -> dict | None:
        """One block's candidate pairs as a dict of numpy arrays.

        ``cols`` holds the whole BUCKET's columns as numpy arrays, pre-sorted
        by (salt_key, doc_id); the block is rows [s:e).  Array-level slicing
        keeps the per-block cost free of pandas frame construction — the
        per-block pandas tax measured ~60% of the stage at ~90-pair blocks.
        """
        n = e - s
        if n < 2:
            return None

        postings: list[np.ndarray] = []
        for col in FEATURE_COLS:
            postings.extend(
                _block_postings(list(cols[col][s:e]), self.posting_cap)
            )
        fi, fj, fw = _posting_pairs(n, postings, self.inverse_degree)

        # salted shard/stitch groups of a hot block skip the dense all-pairs
        # base — a hot block's N² is exactly what the salting defuses
        if n <= self.all_pairs_cap and not salted:
            ai, aj = np.triu_indices(n, 1)
            codes_f = fi * n + fj
            codes_a = ai.astype(np.int64) * n + aj
            wmap = np.zeros(n * n, dtype=np.float64)
            wmap[codes_f] = fw
            i_idx, j_idx, w = ai, aj, wmap[codes_a]
        else:
            i_idx, j_idx, w = fi, fj, fw

        if len(i_idx) == 0:
            return None

        # within-block TF-IDF cosine (vectors co-located with the group)
        idf = self._get_idf()
        X = _local_tf_matrix(
            list(cols["tf_idx"][s:e]), list(cols["tf_cnt"][s:e]), idf
        )
        cos = _pairwise_cosine(X, i_idx, j_idx)

        # optional second vector space: feature-string TF (identity-token
        # hashed, reference ``TFIDF_FULL_TEXT_FEATURES``)
        if "ftr_idx" in cols:
            Xf = _local_tf_matrix(
                list(cols["ftr_idx"][s:e]), list(cols["ftr_cnt"][s:e]), None
            )
            ftr_cos = _pairwise_cosine(Xf, i_idx, j_idx)
        else:
            ftr_cos = np.zeros(len(i_idx), dtype=np.float64)

        # media cosine: per-doc mean-embedding matrix, vectorized row dots
        # (empty media → zero row → cosine 0, flagged by has_media)
        from entity_resolution_ray.functions.vectorize import MEDIA_EMBED_DIM

        M = np.zeros((n, MEDIA_EMBED_DIM), dtype=np.float64)
        has_media = np.zeros(n, dtype=bool)
        for r, mv in enumerate(cols["media_vec"][s:e]):
            if mv is not None and len(mv) == MEDIA_EMBED_DIM:
                M[r] = mv
                has_media[r] = True
        media_cos = np.einsum("ij,ij->i", M[i_idx], M[j_idx])
        media_cos[~(has_media[i_idx] & has_media[j_idx])] = 0.0

        # DOB negative evidence (reference numeric-distance rule), vectorized
        dob_min = np.full(n, np.nan)
        dob_max = np.full(n, np.nan)
        for r, years in enumerate(cols["dob_years"][s:e]):
            if years is not None and len(years):
                dob_min[r] = min(years)
                dob_max[r] = max(years)
        a_min, a_max = dob_min[i_idx], dob_max[i_idx]
        b_min, b_max = dob_min[j_idx], dob_max[j_idx]
        swapped = b_min < a_min
        lo_max = np.where(swapped, b_max, a_max)
        hi_min = np.where(swapped, a_min, b_min)
        with np.errstate(invalid="ignore"):
            neg = (hi_min - lo_max) > self.dob_distance
        neg &= ~np.isnan(a_min) & ~np.isnan(b_min)

        ids = cols[S.DOC_ID][s:e]
        names = cols[S.ENTITY_NAME][s:e]
        return {
            S.BLOCK_KEY: np.repeat(cols[S.BLOCK_KEY][s], len(i_idx)),
            "src": ids[i_idx],
            "dst": ids[j_idx],
            "weight": w,
            "cosine": cos,
            "ftr_cos": ftr_cos,
            "media_cos": media_cos,
            "neg_dob": neg,
            "src_name": names[i_idx],
            "dst_name": names[j_idx],
        }

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        """Single-block DataFrame API (tests / ad-hoc use)."""
        group = group.sort_values(S.DOC_ID, kind="mergesort").reset_index(drop=True)
        cols = {c: group[c].to_numpy() for c in group.columns}
        salted = "salt_key" in group.columns and len(group) > 0 and (
            "#" in str(group["salt_key"].iloc[0])
        )
        d = self.pairs_for_slice(cols, 0, len(group), salted)
        return pd.DataFrame(d if d is not None else self.EMPTY)

    # ---- flattened-Arrow fast path -------------------------------------
    # The bucket arrives as ONE Arrow table; list columns are consumed as
    # (flat values, absolute offsets) numpy views instead of per-cell
    # ndarray objects, and the per-block TF matrix / posting / media / DOB
    # kernels below are fully vectorized over the flat layout — no
    # arrow→pandas conversion, no per-row Python in the hot stage.

    LIST_COLS = ("person_clean", "org", "gpe", "loc", "dob_years",
                 "media_vec", "tf_idx", "tf_cnt")

    @staticmethod
    def flatten_table(tbl: pa.Table) -> dict:
        """Sort by (salt_key, doc_id) and extract flat numpy views."""
        tbl = tbl.sort_by([("salt_key", "ascending"), (S.DOC_ID, "ascending")])
        flat: dict = {"__n": len(tbl)}
        for name in tbl.column_names:
            col = tbl[name].combine_chunks()
            if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
                v = col.values.to_numpy(zero_copy_only=False)
                # normalize slice base so off[0] == 0 indexes v directly
                base = off[0]
                if base or off[-1] != len(v):
                    v = v[base:off[-1]]
                    off = off - base
                # null cells become zero-length (canonical arrays give null
                # slots equal offsets; compact defensively otherwise)
                if col.null_count:
                    valid = ~col.is_null().to_numpy(zero_copy_only=False)
                    lens = np.where(valid, off[1:] - off[:-1], 0)
                    new_off = np.concatenate(
                        ([0], np.cumsum(lens, dtype=np.int64))
                    )
                    if new_off[-1] != len(v):
                        keep = np.zeros(len(v), bool)
                        for i in np.flatnonzero(valid):
                            keep[off[i]:off[i + 1]] = True
                        v = v[keep]
                    off = new_off
                flat[name] = (v, off)
            else:
                flat[name] = col.to_numpy(zero_copy_only=False)
        return flat

    def _tf_cosine_flat(self, flat, s, e, i_idx, j_idx, idx_col, cnt_col,
                        idf) -> np.ndarray:
        """Within-block cosine over flattened sparse TF rows — vectorized
        local-vocab dense matrix (same math as _local_tf_matrix)."""
        n = e - s
        toff = flat[idx_col][1]
        lo, hi = toff[s], toff[e]
        tokens = flat[idx_col][0][lo:hi]
        counts = flat[cnt_col][0][lo:hi]
        if len(tokens) == 0:
            return np.zeros(len(i_idx), dtype=np.float64)
        lens = toff[s + 1:e + 1] - toff[s:e]
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        uniq, inv = np.unique(tokens, return_inverse=True)
        vals = counts.astype(np.float64)
        if idf is not None:
            vals = vals * idf[tokens]
        norms = np.sqrt(np.bincount(rows, weights=vals * vals, minlength=n))
        nz = norms[rows] > 0
        vals[nz] = vals[nz] / norms[rows][nz]
        X = np.zeros((n, len(uniq)), dtype=np.float32)
        X[rows, inv] = vals
        return _pairwise_cosine(X, i_idx, j_idx)

    def _postings_flat(self, flat, s, e) -> list[np.ndarray]:
        """value→member postings for all feature columns of block [s:e) —
        one stable argsort per column instead of per-row dict appends."""
        n = e - s
        out: list[np.ndarray] = []
        for col in FEATURE_COLS:
            voff = flat[col][1]
            lo, hi = voff[s], voff[e]
            vals = flat[col][0][lo:hi]
            if len(vals) == 0:
                continue
            lens = voff[s + 1:e + 1] - voff[s:e]
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            _, inv = np.unique(vals, return_inverse=True)
            order = np.argsort(inv, kind="stable")  # doc order within value
            g = inv[order]
            members = rows[order]
            bounds = np.concatenate(
                ([0], np.flatnonzero(g[1:] != g[:-1]) + 1, [len(g)])
            )
            cap = self.posting_cap
            for b in range(len(bounds) - 1):
                m = members[bounds[b]:bounds[b + 1]]
                out.append(m[:cap] if len(m) > cap else m)
        return out

    def pairs_for_slice_flat(self, flat: dict, s: int, e: int,
                             salted: bool) -> dict | None:
        """Arrow-flat equivalent of ``pairs_for_slice`` (same outputs)."""
        n = e - s
        if n < 2:
            return None

        fi, fj, fw = _posting_pairs(
            n, self._postings_flat(flat, s, e), self.inverse_degree
        )
        if n <= self.all_pairs_cap and not salted:
            ai, aj = np.triu_indices(n, 1)
            codes_f = fi * n + fj
            codes_a = ai.astype(np.int64) * n + aj
            wmap = np.zeros(n * n, dtype=np.float64)
            wmap[codes_f] = fw
            i_idx, j_idx, w = ai, aj, wmap[codes_a]
        else:
            i_idx, j_idx, w = fi, fj, fw
        if len(i_idx) == 0:
            return None

        idf = self._get_idf()
        cos = self._tf_cosine_flat(flat, s, e, i_idx, j_idx,
                                   "tf_idx", "tf_cnt", idf)
        if "ftr_idx" in flat:
            ftr_cos = self._tf_cosine_flat(flat, s, e, i_idx, j_idx,
                                           "ftr_idx", "ftr_cnt", None)
        else:
            ftr_cos = np.zeros(len(i_idx), dtype=np.float64)

        from entity_resolution_ray.functions.vectorize import MEDIA_EMBED_DIM

        moff = flat["media_vec"][1]
        mlens = moff[s + 1:e + 1] - moff[s:e]
        has_media = mlens == MEDIA_EMBED_DIM
        M = np.zeros((n, MEDIA_EMBED_DIM), dtype=np.float64)
        if has_media.any():
            starts = (moff[s:e] - moff[s])[has_media]
            mvals = flat["media_vec"][0][moff[s]:moff[e]].astype(np.float64)
            M[has_media] = mvals[
                starts[:, None] + np.arange(MEDIA_EMBED_DIM, dtype=np.int64)
            ]
        media_cos = np.einsum("ij,ij->i", M[i_idx], M[j_idx])
        media_cos[~(has_media[i_idx] & has_media[j_idx])] = 0.0

        doff = flat["dob_years"][1]
        dlens = doff[s + 1:e + 1] - doff[s:e]
        dob_min = np.full(n, np.nan)
        dob_max = np.full(n, np.nan)
        if dlens.any():
            drows = np.repeat(np.arange(n, dtype=np.int64), dlens)
            dvals = flat["dob_years"][0][doff[s]:doff[e]].astype(np.float64)
            mn = np.full(n, np.inf)
            mx = np.full(n, -np.inf)
            np.minimum.at(mn, drows, dvals)
            np.maximum.at(mx, drows, dvals)
            got = dlens > 0
            dob_min[got] = mn[got]
            dob_max[got] = mx[got]
        a_min, a_max = dob_min[i_idx], dob_max[i_idx]
        b_min, b_max = dob_min[j_idx], dob_max[j_idx]
        swapped = b_min < a_min
        lo_max = np.where(swapped, b_max, a_max)
        hi_min = np.where(swapped, a_min, b_min)
        with np.errstate(invalid="ignore"):
            neg = (hi_min - lo_max) > self.dob_distance
        neg &= ~np.isnan(a_min) & ~np.isnan(b_min)

        ids = flat[S.DOC_ID][s:e]
        names = flat[S.ENTITY_NAME][s:e]
        return {
            S.BLOCK_KEY: np.repeat(flat[S.BLOCK_KEY][s], len(i_idx)),
            "src": ids[i_idx],
            "dst": ids[j_idx],
            "weight": w,
            "cosine": cos,
            "ftr_cos": ftr_cos,
            "media_cos": media_cos,
            "neg_dob": neg,
            "src_name": names[i_idx],
            "dst_name": names[j_idx],
        }


def hot_block_sizes(keys_ds, key_col: str, threshold: int,
                    num_buckets: int = 64) -> pd.Series:
    """key → total count, restricted to keys with count > threshold.

    Per-batch ``value_counts`` partials (distinct-keys-sized) → one bucketed
    groupby-sum → threshold filter, so only the hot tail reaches the driver.
    """
    def census_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(batch[key_col])
        return pa.table({"key": vc.field("values"), "n": vc.field("counts")})

    parts = keys_ds.map_batches(census_partial, batch_format="pyarrow")
    bucketed = parts.map_batches(
        lambda b: _add_bucket(b, ["key"], num_buckets), batch_format="pandas"
    )

    def fold(group: pd.DataFrame) -> pa.Table:
        out = group.groupby("key", sort=False)["n"].sum().reset_index()
        out = out[out["n"] > threshold]
        # typed arrow out: empty object-dtype pandas frames trip Ray's
        # block-size estimator into noisy per-block warnings
        return pa.table(
            {"key": pa.array(out["key"], pa.string()),
             "n": pa.array(out["n"], pa.int64())}
        )

    hot = bucketed.groupby("__bucket").map_groups(fold, batch_format="pandas")
    df = hot.to_pandas()
    if len(df) == 0:
        return pd.Series(dtype=np.int64)
    return df.set_index("key")["n"]


def block_candidate_pairs(featured_ds, idf_ref=None, salt_threshold: int = 2000,
                          shard_size: int = 800, stitch_reps: int = 96,
                          block_sizes=None, num_buckets: int | None = None,
                          timing_actor=None, **gen_kwargs):
    """groupby(block_key) → per-block candidate pairs with cosine + weights.

    Hot-block salting (north rule): a block-size census finds blocks larger
    than ``salt_threshold``; their rows get a salted key ``key#shard`` with
    ``shard = hash(doc_id) % ceil(n/shard_size)``, so the O(n²)-ish pair work
    of a hot block spreads over many groupby tasks instead of one straggler.
    Cross-shard connectivity is restored by a deterministic *stitch* group per
    hot block: each doc whose hash selects it (≈``stitch_reps`` per shard)
    also lands in ``key#stitch``; stitch pairs are scored like any others, so
    same-entity subclusters in different shards join through their reps.
    Pair weights are per-pair properties (shared-value counts), so shard-local
    computation equals whole-block computation for intra-shard pairs; pairs
    seen twice (shard + stitch) are deduped keeping the max weight.
    """
    gen = BlockPairGenerator(idf_ref=idf_ref, **gen_kwargs)

    payload_cols = list(PAIR_PAYLOAD_COLS)
    schema_names = featured_ds.schema().names
    if "ftr_idx" in schema_names:
        payload_cols += ["ftr_idx", "ftr_cnt"]

    _EMPTY_PAIRS = pa.schema([
        (S.BLOCK_KEY, pa.string()), ("src", pa.string()),
        ("dst", pa.string()), ("weight", pa.float64()),
        ("cosine", pa.float64()), ("ftr_cos", pa.float64()),
        ("media_cos", pa.float64()), ("neg_dob", pa.bool_()),
        ("src_name", pa.string()), ("dst_name", pa.string()),
    ]).empty_table()

    def generate_pairs(bucket_group: pa.Table) -> pa.Table:
        # one ray-level group per hash BUCKET of block keys.  The bucket
        # stays ARROW end-to-end: sorted once by (salt_key, doc_id), list
        # columns consumed as (flat values, offsets) numpy views, blocks
        # processed as offset slices — the arrow→pandas bucket conversion
        # (per-cell ndarray wrapping of 7 list columns) and the per-row
        # Python in the TF/posting kernels measured ~35% of this stage
        if len(bucket_group) == 0:
            return _EMPTY_PAIRS
        flat = gen.flatten_table(bucket_group)
        sk = flat["salt_key"]
        change = np.flatnonzero(sk[1:] != sk[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(sk)]))
        outs = []
        if timing_actor is None:
            for s, e in zip(starts, ends):
                d = gen.pairs_for_slice_flat(flat, int(s), int(e), "#" in sk[s])
                if d is not None:
                    outs.append(d)
        else:
            # per-block-size timing partials (reference avg-time-by-mention-no,
            # combiners/common.py:246-261): one bounded dict per bucket task
            import time as _time

            partial: dict[int, list] = {}
            for s, e in zip(starts, ends):
                t0 = _time.perf_counter()
                d = gen.pairs_for_slice_flat(flat, int(s), int(e), "#" in sk[s])
                dt = _time.perf_counter() - t0
                size = int(e - s)
                acc = partial.get(size)
                if acc is None:
                    partial[size] = [dt, 1]
                else:
                    acc[0] += dt
                    acc[1] += 1
                if d is not None:
                    outs.append(d)
            ray.get(timing_actor.add.remote(
                {k: (v[0], v[1]) for k, v in partial.items()}
            ))
        if not outs:
            return _EMPTY_PAIRS
        merged = {
            k: np.concatenate([o[k] for o in outs]) for k in outs[0]
        }
        # cosine comes back float32 from the small-block gram path and
        # float64 from the chunked path: pin all float outputs to float64
        # so every arrow block in the stream shares one schema
        for k, v in merged.items():
            if v.dtype == np.float32:
                merged[k] = v.astype(np.float64)
        return pa.table(
            {k: pa.array(v) if v.dtype != object else pa.array(v, pa.string())
             for k, v in merged.items()}
        )

    narrow = featured_ds.select_columns(payload_cols)

    # hot-key census: per-batch value counts pre-aggregate, then a bucketed
    # groupby over the (distinct-keys-sized) partials, filtered to keys over
    # the salt threshold BEFORE the driver sees anything — driver state is
    # #hot-keys-sized at any corpus size.  Callers that already ran the
    # census hand it in.
    if block_sizes is not None:
        sizes = block_sizes
    else:
        sizes = hot_block_sizes(
            narrow.select_columns([S.BLOCK_KEY]), S.BLOCK_KEY, salt_threshold
        )
    hot = {
        k: int(np.ceil(n / shard_size))
        for k, n in sizes.items()
        if n > salt_threshold
    }

    # one ray task per BUCKET of block keys: size the bucket count to ~8
    # tasks per CPU so skewed buckets (hot-block shards) don't become the
    # critical path at high parallelism — 64 buckets measured 1.56× for
    # 8→32 CPUs at 1.2M docs; 8×CPUs restores near-linear task granularity
    if num_buckets is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_buckets = max(64, 8 * cpus)

    def _key_buckets(keys: list[str]) -> np.ndarray:
        h = pd.util.hash_pandas_object(pd.Series(keys), index=False).to_numpy()
        return (h % np.uint64(num_buckets)).astype(np.int64)

    # salt/bucket columns are appended ARROW-side: the heavy list columns
    # (tf_idx/tf_cnt/media_vec) stay zero-copy arrow through the shuffle —
    # a pandas pass here turns them into python-object cells and triples the
    # sort's serialization cost (measured)
    if not hot:

        def with_key(batch: pa.Table) -> pa.Table:
            keys = batch[S.BLOCK_KEY].to_pylist()
            return batch.append_column(
                "salt_key", batch[S.BLOCK_KEY]
            ).append_column("__bucket", pa.array(_key_buckets(keys)))

        return (
            narrow.map_batches(with_key, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(generate_pairs, batch_format="pyarrow")
        )

    import ray

    hot_ref = ray.put(hot)
    rep_modulus = max(1, shard_size // stitch_reps)

    def salt(batch: pa.Table) -> pa.Table:
        hot_map = fetch_broadcast(hot_ref)
        keys = batch[S.BLOCK_KEY].to_pylist()
        ids = batch[S.DOC_ID].to_pylist()
        h = hash64_np(ids)
        # NB: keep all modular arithmetic in uint64 — numpy silently promotes
        # uint64 ∘ python-int to float64, which garbles large hashes
        shard_of = (h % np.uint64(1 << 20)).astype(np.int64)  # pre-reduce
        is_rep = ((h >> np.uint64(8)) % np.uint64(rep_modulus)) == 0
        salted: list[str] = []
        rep_idx: list[int] = []
        stitch_keys: list[str] = []
        for i, k in enumerate(keys):
            s = hot_map.get(k)
            if s is None:
                salted.append(k)
                continue
            salted.append(f"{k}#{shard_of[i] % s}")
            if is_rep[i]:
                rep_idx.append(i)
                stitch_keys.append(f"{k}#stitch")
        out = batch.append_column("salt_key", pa.array(salted, pa.string()))
        out = out.append_column("__bucket", pa.array(_key_buckets(salted)))
        if rep_idx:
            stitch = batch.take(pa.array(rep_idx, pa.int64()))
            stitch = stitch.append_column(
                "salt_key", pa.array(stitch_keys, pa.string())
            ).append_column("__bucket", pa.array(_key_buckets(stitch_keys)))
            out = pa.concat_tables([out, stitch])
        return out

    pairs = (
        narrow.map_batches(salt, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(generate_pairs, batch_format="pyarrow")
        .materialize()
    )

    # only hot-block pairs can repeat (shard + stitch overlap): dedup that
    # slice alone, pass the clean majority through untouched
    hot_keys = set(hot)

    def split(batch: pd.DataFrame, want_hot: bool) -> pd.DataFrame:
        mask = batch[S.BLOCK_KEY].isin(hot_keys)
        return batch[mask] if want_hot else batch[~mask]

    cold = pairs.map_batches(
        lambda b: split(b, False), batch_format="pandas"
    )
    hot_pairs = pairs.map_batches(
        lambda b: split(b, True), batch_format="pandas"
    )
    bucketed = hot_pairs.map_batches(
        lambda b: _add_bucket(b, ["src", "dst"], num_buckets),
        batch_format="pandas",
    )

    def dedup_max_weight(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["src", "dst", "weight"], ascending=[True, True, False])
        return g.drop_duplicates(["src", "dst"]).drop(columns=["__bucket"])

    return cold.union(
        bucketed.groupby("__bucket").map_groups(dedup_max_weight, batch_format="pandas")
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


def _add_bucket(batch: pd.DataFrame, on: list[str], num_buckets: int) -> pd.DataFrame:
    h = pd.util.hash_pandas_object(batch[on[0]], index=False).to_numpy()
    for c in on[1:]:
        h = h * np.uint64(31) + pd.util.hash_pandas_object(
            batch[c], index=False
        ).to_numpy()
    batch = batch.copy()
    batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
    return batch


def grouped_pairs(rows_ds, key_cols, id_col: str = "doc_id", cap: int = 500,
                  num_buckets: int = 64):
    """(key, id) rows → per-key pairs, shuffled ONCE by key-hash bucket.

    One ``groupby(bucket)`` instead of one ray-level group per key: inside
    each bucket a pandas groupby walks its keys with vectorized triu pair
    emission — same result, two orders of magnitude fewer task dispatches.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    bucketed = rows_ds.map_batches(
        lambda b: _add_bucket(b, key_cols, num_buckets), batch_format="pandas"
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # singleton keys (the vast majority under LSH banding) emit no pairs:
        # drop them vectorized before the per-key Python walk
        group = group[group.duplicated(key_cols, keep=False)]
        outs = []
        for _, g in group.groupby(key_cols, sort=False):
            p = pairs_for_key_group(g, cap=cap, id_col=id_col)
            if len(p):
                outs.append(p)
        if not outs:
            return pd.DataFrame({"src": [], "dst": []})
        return pd.concat(outs, ignore_index=True)

    return bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def dedup_pairs(pairs_ds, extra_cols=(), num_buckets: int = 64):
    """Drop duplicate (src,dst) rows with one bucket shuffle + vectorized
    in-bucket drop_duplicates."""
    bucketed = pairs_ds.map_batches(
        lambda b: _add_bucket(b, ["src", "dst"], num_buckets),
        batch_format="pandas",
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cols = ["src", "dst", *extra_cols]
        return group.drop_duplicates(["src", "dst"])[cols]

    return bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def candidate_pairs_from_keys(exploded_ds, key_cols, cap: int = 500,
                              id_col: str = "doc_id"):
    """(key, doc_id) rows → deduped candidate pair table (src < dst)."""
    pairs = grouped_pairs(exploded_ds, key_cols, id_col=id_col, cap=cap)
    return dedup_pairs(pairs)
