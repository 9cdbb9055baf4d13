"""MinHash / SimHash signature kernels (near-dedup building blocks).

The reference has no near-dedup operator (SURVEY.md §2.8) — its nearest
analogue is connected components over shared-feature edges.  These kernels
implement the standard public algorithms (Broder MinHash-LSH banding;
Charikar SimHash) vectorized with numpy, for the dedup stages.
"""

from __future__ import annotations

import numpy as np

from entity_resolution_ray.utils.hashing import hash64_array, universal_hashes
from entity_resolution_ray.functions.text import tokenize_words, word_ngrams


def shingle_set(text: str, ngram: int = 3) -> list[str]:
    """Sorted unique word n-gram shingles of a text."""
    return sorted(word_ngrams(tokenize_words(text), ngram))


def minhash_signature(
    shingles: list[str], num_perm: int = 128, seed: int = 7
) -> np.ndarray:
    """uint64[num_perm] MinHash signature (empty text → all-max sentinel)."""
    if not shingles:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = hash64_array(shingles)
    return universal_hashes(base, num_perm, seed).min(axis=0)


def minhash_signatures_batch(
    texts, num_perm: int = 128, ngram: int = 3, seed: int = 7,
    base_hash: str = "blake2b",
) -> np.ndarray:
    """(n, num_perm) uint64 signatures for a batch of texts.

    Hashes each *unique shingle of the batch* once, then reduces per row —
    the batch-level dedup matters because shingle vocabularies repeat heavily.

    ``base_hash="md5"`` switches the shingle hash to md5-lower-64 (DuckDB's
    ``md5_number_lower``), making the signature — and the banded candidate
    join built on it — reproducible bit-for-bit in plain SQL, the same trade
    as ``simhash_batch`` below.  Signature quality is equivalent either way;
    blake2b stays the default because it is ~2× faster per shingle.
    """
    rows = [shingle_set(t or "", ngram) for t in texts]
    vocab: dict[str, int] = {}
    flat: list[str] = []
    row_idx: list[np.ndarray] = []
    for sh in rows:
        ids = np.empty(len(sh), dtype=np.int64)
        for j, s in enumerate(sh):
            k = vocab.get(s)
            if k is None:
                k = len(vocab)
                vocab[s] = k
                flat.append(s)
            ids[j] = k
        row_idx.append(ids)
    if not flat:
        return np.full(
            (len(rows), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64
        )
    if base_hash == "md5":
        from entity_resolution_ray.utils.hashing import md5_hash64_array

        base = md5_hash64_array(flat)
    else:
        base = hash64_array(flat)
    return _minhash_reduce(base, row_idx, num_perm, seed)


def _minhash_reduce(base: np.ndarray, row_idx: list[np.ndarray],
                    num_perm: int, seed: int) -> np.ndarray:
    """Per-row signature mins without materializing the full
    (vocab, num_perm) hash matrix: permutations go through in chunks of 16
    (bounding the live allocation ~8×) and the per-row min is ONE
    ``minimum.reduceat`` over the flattened shingle-id array instead of a
    Python loop of fancy-indexed row slices.  Bit-identical to the naive
    ``universal_hashes(...).min(axis=0)`` path — same constants, same
    uint64 wraparound (the whole-matrix allocation was ~50% of signer wall
    at 1.2M docs)."""
    from entity_resolution_ray.utils.hashing import universal_hash_constants

    n = len(row_idx)
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    counts = np.fromiter((len(r) for r in row_idx), np.int64, count=n)
    nz = np.flatnonzero(counts)
    if not len(nz):
        return out
    flat = np.concatenate([row_idx[i] for i in nz])
    ends = np.cumsum(counts[nz])
    offs = np.empty(len(nz), np.int64)
    offs[0] = 0
    offs[1:] = ends[:-1]
    a, b = universal_hash_constants(num_perm, seed)
    base = base.astype(np.uint64).reshape(-1, 1)
    for s in range(0, num_perm, 16):
        e = min(s + 16, num_perm)
        hv = base * a[s:e][None, :] + b[s:e][None, :]  # uint64 wraparound
        out[nz, s:e] = np.minimum.reduceat(hv[flat], offs, axis=0)
    return out


def band_keys(signature: np.ndarray, num_bands: int) -> list[bytes]:
    """LSH band keys: the signature split into ``num_bands`` equal slices,
    each slice serialized to bytes (band id is the list position)."""
    rows = len(signature) // num_bands
    return [
        signature[b * rows : (b + 1) * rows].tobytes() for b in range(num_bands)
    ]


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def exact_jaccard(text_a: str, text_b: str, ngram: int = 3) -> float:
    a = set(shingle_set(text_a, ngram))
    b = set(shingle_set(text_b, ngram))
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def simhash_batch(texts, bits: int = 64) -> np.ndarray:
    """uint64[n] Charikar SimHash over word tokens (term-frequency weighted).

    Token hash is md5-lower-64 (DuckDB's ``md5_number_lower``) rather than the
    engine's default blake2b, so the whole signature — and therefore the
    banded near-dup join built on it — is reproducible in plain SQL and can
    be driver-oracled bit-for-bit.  Any 64-bit hash gives equivalent SimHash
    quality; this one buys a correctness oracle."""
    from entity_resolution_ray.utils.hashing import md5_hash64_array

    out = np.empty(len(texts), dtype=np.uint64)
    bit_cols = np.arange(bits, dtype=np.uint64)
    for i, text in enumerate(texts):
        toks = tokenize_words(text or "")
        if not toks:
            out[i] = 0
            continue
        uniq, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        h = md5_hash64_array(list(uniq))
        # (n_tok, bits) sign matrix: +w where bit set, -w where clear
        bitmat = ((h[:, None] >> bit_cols[None, :]) & 1).astype(np.int64)
        acc = ((bitmat * 2 - 1) * cnt[:, None]).sum(axis=0)
        out[i] = np.uint64(
            int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)
        )
    return out


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of xor over uint64 arrays."""
    x = (a ^ b).view(np.uint64)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
