"""Vectorization kernels: hashed TF-IDF, sparse cosine, media hash-embeddings.

The reference vectorizes article text with a *pre-fitted* sklearn
``TfidfVectorizer`` loaded from a pickled artifact inside each visitor
(``am_combiner/features/vectorisation.py:18-66``).  The Ray-native equivalent
avoids a driver-held vocabulary entirely:

- terms are **feature-hashed** into a fixed dimension (no vocab object, so the
  "model" is a pure function — trivially shippable to every actor),
- IDF weights are a dense ``float32[dim]`` array computed by a distributed
  document-frequency aggregate (one partial vector per batch, summed), then
  broadcast once via ``ray.put`` to every scoring actor.

Cosine math matches sklearn's: tf raw counts × smooth idf
``ln((1+N)/(1+df)) + 1``, L2-normalized rows, dot product.
"""

from __future__ import annotations

import hashlib

import numpy as np

from entity_resolution_ray.functions.text import tokenize_words

DEFAULT_DIM = 1 << 18


def term_bucket(token: str, dim: int = DEFAULT_DIM) -> int:
    h = int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little"
    )
    return h % dim


class _BucketCache(dict):
    """token -> hashed bucket, memoized (token vocabulary is small per corpus)."""

    def __init__(self, dim: int):
        super().__init__()
        self.dim = dim

    def __missing__(self, token: str) -> int:
        b = term_bucket(token, self.dim)
        self[token] = b
        return b


class HashedVectorizer:
    """Feature-hashing TF vectorizer producing sparse (indices, counts) rows."""

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim
        self._cache = _BucketCache(dim)

    def transform_sparse(
        self, texts, exclude_rows=None
    ) -> tuple[list[np.ndarray], list[np.ndarray]]:
        """Per text: (sorted unique bucket indices, raw term counts).

        ``exclude_rows`` (optional, per-row token sets) drops tokens before
        hashing — the reference neutralizes the entity name in the text before
        TF-IDF (``am_combiner/utils/replace.py:4-32``); dropping instead of
        constant-replacing avoids a shared within-block component.
        """
        cache = self._cache
        idx_rows: list[np.ndarray] = []
        cnt_rows: list[np.ndarray] = []
        for row_i, text in enumerate(texts):
            toks = tokenize_words(text or "")
            if exclude_rows is not None:
                excl = exclude_rows[row_i]
                if excl:
                    toks = [t for t in toks if t not in excl]
            if not toks:
                idx_rows.append(np.empty(0, dtype=np.int64))
                cnt_rows.append(np.empty(0, dtype=np.float32))
                continue
            buckets = np.fromiter(
                (cache[t] for t in toks), count=len(toks), dtype=np.int64
            )
            idx, cnt = np.unique(buckets, return_counts=True)
            idx_rows.append(idx)
            cnt_rows.append(cnt.astype(np.float32))
        return idx_rows, cnt_rows

    def partial_doc_freq(self, idx_rows: list[np.ndarray]) -> np.ndarray:
        """Dense float32[dim] document-frequency partial for one batch."""
        df = np.zeros(self.dim, dtype=np.float32)
        for idx in idx_rows:
            df[idx] += 1.0
        return df


def smooth_idf(df: np.ndarray, n_docs: int) -> np.ndarray:
    """sklearn-style smooth idf: ln((1+N)/(1+df)) + 1 (float32)."""
    return (np.log((1.0 + n_docs) / (1.0 + df.astype(np.float64))) + 1.0).astype(
        np.float32
    )


def tfidf_normalize(
    idx: np.ndarray, cnt: np.ndarray, idf: np.ndarray | None
) -> np.ndarray:
    """L2-normalized tf-idf values aligned with ``idx`` (idf=None → plain tf)."""
    vals = cnt.astype(np.float64)
    if idf is not None:
        vals = vals * idf[idx]
    norm = np.sqrt((vals * vals).sum())
    if norm > 0:
        vals = vals / norm
    return vals


def sparse_cosine_pairs(
    idx_a: list[np.ndarray],
    val_a: list[np.ndarray],
    idx_b: list[np.ndarray],
    val_b: list[np.ndarray],
) -> np.ndarray:
    """Cosine of aligned sparse-row pairs (rows already L2-normalized)."""
    out = np.empty(len(idx_a), dtype=np.float64)
    for i in range(len(idx_a)):
        ia, va, ib, vb = idx_a[i], val_a[i], idx_b[i], val_b[i]
        if len(ia) == 0 or len(ib) == 0:
            out[i] = 0.0
            continue
        # merge-intersect of two sorted index lists
        pos_a = np.searchsorted(ia, ib)
        mask = (pos_a < len(ia)) & (ia[np.minimum(pos_a, len(ia) - 1)] == ib)
        out[i] = float(np.dot(va[np.minimum(pos_a, len(ia) - 1)][mask], vb[mask]))
    return out


MEDIA_EMBED_DIM = 32

_BASE_DIR_CACHE: dict[str, np.ndarray] = {}


def _hash_floats(key: bytes, dim: int) -> np.ndarray:
    """dim floats in [-0.5, 0.5) from iterated blake2b — cheap & deterministic
    (no per-call RNG construction; profiled hot in the vectorize stage)."""
    out = np.empty(0, dtype=np.uint8)
    counter = 0
    chunks = []
    need = dim * 4
    while need > 0:
        d = hashlib.blake2b(key + counter.to_bytes(2, "little"), digest_size=64)
        chunks.append(np.frombuffer(d.digest(), dtype=np.uint8))
        need -= 64
        counter += 1
    raw = np.concatenate(chunks)[: dim * 4]
    u32 = raw.view(np.uint32).astype(np.float64)
    return u32 / 4294967296.0 - 0.5


def media_embedding(media_ref: str, dim: int = MEDIA_EMBED_DIM) -> np.ndarray:
    """Deterministic unit-norm embedding of a media reference.

    The persona-carrying prefix (everything up to the last '/') seeds the base
    direction (cached — prefixes repeat across items); the full ref adds small
    per-item noise.  This is the sandbox stand-in for a real image/audio
    encoder (which would be an actor-pool ``map_batches`` stage; see
    stages/multimodal.py).
    """
    prefix = media_ref.rsplit("/", 1)[0]
    base = _BASE_DIR_CACHE.get(prefix)
    if base is None:
        base = _hash_floats(prefix.encode(), dim)
        if len(_BASE_DIR_CACHE) < 1_000_000:
            _BASE_DIR_CACHE[prefix] = base
    noise = _hash_floats(media_ref.encode(), dim) * 0.05
    v = base + noise
    return (v / np.linalg.norm(v)).astype(np.float32)


def media_embedding_many(refs: list[str], dim: int = MEDIA_EMBED_DIM) -> np.ndarray:
    out = np.empty((len(refs), dim), dtype=np.float32)
    for i, r in enumerate(refs):
        out[i] = media_embedding(r, dim)
    return out
