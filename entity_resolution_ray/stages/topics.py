"""Topic-model tier (SURVEY.md §2.3).

Reference analogues:

- ``TopicVisitor`` (``am_combiner/features/topic_model/topic_model.py:20-119``):
  gensim LDA (20 topics) inference per article after a stopword/lemmatize
  pipeline; appends a per-doc topic distribution.
- ``TopicTfidfConcatVisitor`` (``topic_model/topic_tfidf_concat.py:8-62``):
  hstack of the topic distribution with the TF-IDF row.

gensim is not in this container, so the topic model is deterministic
pure-numpy NMF (multiplicative updates, Lee & Seung 2001) over the hashed
term space — same operator shape: a model fitted once on a bounded,
hash-sampled subset of the corpus (the reference equally fits LDA offline
and ships the artifact), then batched inference in ``map_batches`` with the
topic matrix broadcast once per worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TOPIC_DIM = 1 << 12


def _doc_term_rows(texts: list[str], dim: int) -> np.ndarray:
    from entity_resolution_ray.functions.text import tokenize_words
    from entity_resolution_ray.stages.textstats import EN_STOPWORDS
    from entity_resolution_ray.utils.hashing import hash64_array

    stop = set(EN_STOPWORDS)
    X = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        toks = [w for w in tokenize_words(t or "") if w not in stop and len(w) > 2]
        if not toks:
            continue
        idx = (hash64_array(toks) % np.uint64(dim)).astype(np.int64)
        np.add.at(X[i], idx, 1.0)
    return X


def fit_topics(ds, n_topics: int = 20, sample: int = 2000, dim: int = TOPIC_DIM,
               iters: int = 80, seed: int = 7,
               text_col: str = "content") -> np.ndarray:
    """Topic-term matrix H (n_topics × dim) from a deterministic hash-sampled
    subset (bounded driver work — the offline LDA fit of the reference)."""
    from entity_resolution_ray.utils.hashing import hash64_array

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        h = hash64_array([f"{seed}:{d}" for d in ids])
        mask = pa.array((h % np.uint64(10_000)).astype(np.int64) < 2500)
        return batch.filter(mask)

    texts = (
        ds.select_columns(["doc_id", text_col])
        .map_batches(keep, batch_format="pyarrow")
        .limit(sample)
        .to_pandas()[text_col]
        .tolist()
    )
    X = _doc_term_rows(texts, dim)
    rng = np.random.default_rng(seed)
    W = rng.random((len(texts), n_topics)) + 1e-3
    H = rng.random((n_topics, dim)) + 1e-3
    for _ in range(iters):
        H *= (W.T @ X) / np.maximum(W.T @ W @ H, 1e-10)
        W *= (X @ H.T) / np.maximum(W @ H @ H.T, 1e-10)
    norms = np.maximum(H.sum(axis=1, keepdims=True), 1e-10)
    return (H / norms).astype(np.float64)


def _nmf_infer(A: np.ndarray, HHt: np.ndarray, iters: int) -> np.ndarray:
    """Multiplicative-update inference fold: ``W ← W · (A / max(W·HHᵀ, ε))``
    from uniform ``W``, then row-normalize.  The k-wide contractions are
    deliberately explicit left-to-right accumulations (vectorized across
    docs, no BLAS/FMA reduction) so every float op has a pinned IEEE
    evaluation order — ``doc_topics_canon`` restates all ``iters`` rounds
    bit-exact in SQL from the same ``A`` / ``HHt`` given data."""
    k = HHt.shape[0]
    W = np.full((A.shape[0], k), 1.0 / k)
    for _ in range(iters):
        D = W[:, 0:1] * HHt[0:1, :]
        for j in range(1, k):
            D = D + W[:, j:j + 1] * HHt[j:j + 1, :]
        W = W * (A / np.maximum(D, 1e-10))
    s = W[:, 0].copy()
    for j in range(1, k):
        s = s + W[:, j]
    return W / np.maximum(s, 1e-10)[:, None]


def topic_distributions(ds, H: np.ndarray, text_col: str = "content",
                        infer_iters: int = 30):
    """Append ``topic_vec`` (normalized weights) + ``topic_id`` (argmax) per
    doc — batched NMF inference against the broadcast topic matrix."""
    import ray

    href = ray.put(H)

    def fn(batch: pa.Table) -> pa.Table:
        from entity_resolution_ray.stages.blocking import fetch_broadcast

        Hm = fetch_broadcast(href)
        X = _doc_term_rows(batch[text_col].to_pylist(), Hm.shape[1])
        W = _nmf_infer(X @ Hm.T, Hm @ Hm.T, infer_iters)
        return batch.append_column(
            "topic_vec",
            pa.array([row.astype(np.float32).tolist() for row in W],
                     pa.list_(pa.float32())),
        ).append_column("topic_id", pa.array(W.argmax(axis=1), pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=1024)


def topic_tfidf_concat(ds, tf_dim: int, scale: float = 1.0):
    """hstack(topic_vec, tf) as sparse columns: topic weight j becomes index
    ``tf_dim + j`` appended to ``tf_idx``/``tf_cnt`` (the reference's CSR
    hstack, ``topic_tfidf_concat.py:57-62``)."""

    def fn(batch: pa.Table) -> pa.Table:
        tf_idx = batch["tf_idx"].to_pylist()
        tf_cnt = batch["tf_cnt"].to_pylist()
        tvecs = batch["topic_vec"].to_pylist()
        out_idx, out_cnt = [], []
        for idx, cnt, tv in zip(tf_idx, tf_cnt, tvecs):
            extra_i = [tf_dim + j for j, v in enumerate(tv) if v > 1e-6]
            extra_c = [scale * v for v in tv if v > 1e-6]
            out_idx.append(list(idx) + extra_i)
            out_cnt.append(list(cnt) + extra_c)
        return batch.append_column(
            "topic_tf_idx", pa.array(out_idx, pa.list_(pa.int64()))
        ).append_column(
            "topic_tf_cnt", pa.array(out_cnt, pa.list_(pa.float32()))
        )

    return ds.map_batches(fn, batch_format="pyarrow")
