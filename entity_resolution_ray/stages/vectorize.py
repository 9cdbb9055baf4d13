"""Vectorization stage: hashed sparse TF columns + distributed IDF fit.

Reference analogue: ``FullArticleTextVectoriser``
(``am_combiner/features/vectorisation.py:18-66``) — a pre-fitted sklearn
TfidfVectorizer pickled to an artifact and loaded per visitor.  Here the
vectorizer is a pure hashing function (no vocabulary object) and the IDF
weights are fitted *distributed*: one dense document-frequency partial per
batch, summed on the driver (a fixed-size ~1 MB vector per batch — not a
data-sized materialization), then broadcast via ``ray.put`` to every consumer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from entity_resolution_ray import schema as S
from entity_resolution_ray.functions.vectorize import (
    DEFAULT_DIM,
    HashedVectorizer,
    smooth_idf,
)


class TfVectorizer:
    """Actor-pool stage: append sparse hashed-TF columns tf_idx / tf_cnt and
    the per-doc media embedding ``media_vec`` (normalized mean of the
    media_ref hash-embeddings — the sandbox stand-in for a media encoder
    model held by this actor)."""

    def __init__(self, dim: int = DEFAULT_DIM):
        self.vec = HashedVectorizer(dim)
        self._emb_cache: dict[str, "np.ndarray"] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        # drop entity-name tokens before hashing (reference name-replacement
        # semantics); name_tokens column is present after the feature stage
        excl = None
        if "name_tokens" in batch.column_names:
            from entity_resolution_ray.functions.text import name_keyword_tokens

            excl = [
                set(name_keyword_tokens(n or "", min_len=1))
                for n in batch[S.ENTITY_NAME].to_pylist()
            ]
        idx_rows, cnt_rows = self.vec.transform_sparse(
            batch[S.CONTENT].to_pylist(), exclude_rows=excl
        )
        out = batch.append_column(
            "tf_idx", pa.array([r.tolist() for r in idx_rows], pa.list_(pa.int64()))
        ).append_column(
            "tf_cnt",
            pa.array([r.tolist() for r in cnt_rows], pa.list_(pa.float32())),
        )
        if "media_refs" in batch.column_names:
            from entity_resolution_ray.functions.vectorize import (
                MEDIA_EMBED_DIM,
                media_embedding,
            )

            vecs = []
            for refs in batch["media_refs"].to_pylist():
                if not refs:
                    vecs.append([])
                    continue
                acc = np.zeros(MEDIA_EMBED_DIM, dtype=np.float64)
                for r in refs:
                    e = self._emb_cache.get(r)
                    if e is None:
                        e = media_embedding(r)
                        if len(self._emb_cache) < 500_000:
                            self._emb_cache[r] = e
                    acc += e
                norm = np.linalg.norm(acc)
                if norm > 0:
                    acc /= norm
                vecs.append([float(x) for x in acc])
            out = out.append_column(
                "media_vec", pa.array(vecs, pa.list_(pa.float32()))
            )
        return out


FEATURE_STRING_COLS = ["person_clean", "org", "gpe", "loc"]


class FeatureStringVectorizer:
    """Feature-string TF space (the reference's SECOND vector space).

    ``FullArticleFeaturesTextExtractor`` serializes every extracted feature
    as ``NAME-value`` joined by ``_-_`` (``am_combiner/features/
    vectorisation.py:162-181``, ``get_features_from_article``,
    ``combiners/tfidf.py:98-116``); ``FullArticleFeaturesTextVectoriser``
    TF-IDFs it with the identity tokenizer (split on ``_-_``,
    ``tfidf.py:81-95``).  Here each identity token hashes straight into the
    ``ftr_idx``/``ftr_cnt`` sparse columns; ``feature_text`` keeps the
    serialized form for parity checks.
    """

    def __init__(self, dim: int = DEFAULT_DIM, cols: tuple = tuple(FEATURE_STRING_COLS)):
        self.dim = dim
        self.cols = list(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from entity_resolution_ray.utils.hashing import hash64_array

        texts, idx_rows, cnt_rows = [], [], []
        col_vals = {c: batch[c].to_pylist() for c in self.cols if c in batch.column_names}
        n = len(batch)
        for i in range(n):
            tokens = []
            for c in self.cols:
                for v in col_vals.get(c, [None] * n)[i] or []:
                    tokens.append(f"{c}-{v}")
            texts.append("_-_".join(tokens))
            if tokens:
                h = (hash64_array(tokens) % np.uint64(self.dim)).astype(np.int64)
                uniq, cnt = np.unique(h, return_counts=True)
                idx_rows.append(uniq.tolist())
                cnt_rows.append(cnt.astype(np.float32).tolist())
            else:
                idx_rows.append([])
                cnt_rows.append([])
        return (
            batch.append_column("feature_text", pa.array(texts, pa.string()))
            .append_column("ftr_idx", pa.array(idx_rows, pa.list_(pa.int64())))
            .append_column("ftr_cnt", pa.array(cnt_rows, pa.list_(pa.float32())))
        )


def add_tf_columns(ds, dim: int = DEFAULT_DIM, concurrency=(1, 8), batch_size=1024):
    return ds.map_batches(
        TfVectorizer,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _df_partial(batch: pa.Table, dim: int) -> pa.Table:
    df = np.zeros(dim, dtype=np.float32)
    tf_idx = batch["tf_idx"]
    if isinstance(tf_idx, pa.ChunkedArray):
        tf_idx = tf_idx.combine_chunks()
    import pyarrow.compute as pc

    flat = pc.list_flatten(tf_idx).to_numpy(zero_copy_only=False)
    np.add.at(df, flat, 1.0)  # upper bound: counts repeats, but tf_idx is unique per row
    return pa.table(
        {"df_blob": pa.array([df.tobytes()], pa.binary()), "n_docs": pa.array([len(batch)], pa.int64())}
    )


def fit_idf(ds_with_tf, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Distributed document-frequency → smooth-idf fit over tf_idx columns."""
    partials = ds_with_tf.map_batches(
        lambda b: _df_partial(b, dim), batch_format="pyarrow", batch_size=16384
    ).take_all()  # one fixed-size (~1 MB) row per batch
    df = np.zeros(dim, dtype=np.float64)
    n = 0
    for row in partials:
        df += np.frombuffer(row["df_blob"], dtype=np.float32)
        n += row["n_docs"]
    return smooth_idf(df, max(n, 1))


def broadcast_idf(idf: np.ndarray) -> "ray.ObjectRef":
    return ray.put(idf)
