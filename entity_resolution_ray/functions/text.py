"""String/scalar kernels: normalization, tokenization, name keys.

Semantics mirror the reference's scalar inventory (SURVEY.md §2.12):

- HTML tag strip            — reference ``am_combiner/features/common.py:318-333``
- ascii-fold + lower + punctuation split into name tokens, keep len>2, sorted
                            — reference ``am_combiner/features/common.py:282-292``
- word-boundary token removal (entity-name self-reference cleaning)
                            — reference ``am_combiner/features/common.py:238-279``
- URL domain parse          — reference ``am_combiner/features/domain.py:24-26``

All functions here are vectorized (operate on sequences / numpy arrays) so they
can run inside ``map_batches`` without per-row Python dispatch where possible.
"""

from __future__ import annotations

import re
import unicodedata
from urllib.parse import urlparse

import numpy as np

_HTML_TAG_RE = re.compile(r"<.*?>")
_NAME_SPLIT_RE = re.compile(r"[^a-z0-9]+")
_WS_RE = re.compile(r"\s+")
_WORD_RE = re.compile(r"[a-z0-9]+")


def strip_html(text: str) -> str:
    """Remove ``<...>`` tags (same regex family as the reference's TextCleaner)."""
    return _HTML_TAG_RE.sub("", text)


def ascii_fold(text: str) -> str:
    """Pure-python unidecode substitute: NFKD-decompose and drop combining marks."""
    return (
        unicodedata.normalize("NFKD", text).encode("ascii", "ignore").decode("ascii")
    )


def name_keyword_tokens(name: str, min_len: int = 3) -> list[str]:
    """ascii-fold → lower → split on non-alnum → keep tokens with len >= min_len → sorted.

    This is the normalized-name blocking-key builder; the reference keeps tokens
    with ``len(t) > 2`` and sorts for determinism.
    """
    folded = ascii_fold(name).lower()
    return sorted(t for t in _NAME_SPLIT_RE.split(folded) if len(t) >= min_len)


def name_block_key(name: str) -> str:
    """Canonical blocking key: '+'-joined sorted name keyword tokens."""
    return "+".join(name_keyword_tokens(name))


def tokenize_words(text: str) -> list[str]:
    """ascii-folded, lowercased alnum word tokens (the engine's generic
    tokenizer).  Folding first keeps accented surface forms ("Pátricia") in
    one token, consistent with the name-key normalization."""
    return _WORD_RE.findall(ascii_fold(text).lower())


def remove_tokens_word_boundary(text: str, tokens: list[str]) -> str:
    """Remove every token (word-boundary match, case-insensitive) from text.

    Tokens are processed in sorted order for reproducibility, like the
    reference's entity-name remover.
    """
    out = text
    for tok in sorted(set(tokens)):
        if not tok:
            continue
        out = re.sub(rf"\b{re.escape(tok)}\b", "", out, flags=re.IGNORECASE)
    return _WS_RE.sub(" ", out).strip()


def url_domain(url: str) -> str:
    """netloc of a URL ('' when unparseable)."""
    try:
        return urlparse(url).netloc
    except ValueError:
        return ""


def normalize_ws_lower(text: str) -> str:
    """lower + collapse whitespace — canonical form for exact-dup fingerprints."""
    return _WS_RE.sub(" ", text.lower()).strip()


def char_shingles(text: str, k: int = 5) -> set[str]:
    """Set of k-char shingles of the normalized text."""
    t = normalize_ws_lower(text)
    if len(t) < k:
        return {t} if t else set()
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def word_ngrams(tokens: list[str], n: int = 3) -> set[str]:
    """Set of word n-grams (space-joined)."""
    if len(tokens) < n:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler similarity (pure python, used batched over name pairs)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    jaro = (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3.0
    # Winkler prefix bonus only above the standard 0.7 boost threshold —
    # jellyfish semantics (the reference's JW library) and DuckDB's
    # jaro_winkler_similarity, verified bit-identical on 4k random pairs
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 == c2:
            prefix += 1
        else:
            break
    return jaro + prefix * prefix_weight * (1.0 - jaro)


def jaro_winkler_pairs(a: list[str], b: list[str]) -> np.ndarray:
    """Vectorized-ish Jaro-Winkler over aligned string pairs with memoization."""
    cache: dict[tuple[str, str], float] = {}
    out = np.empty(len(a), dtype=np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        key = (x, y) if x <= y else (y, x)
        v = cache.get(key)
        if v is None:
            v = jaro_winkler(key[0], key[1])
            cache[key] = v
        out[i] = v
    return out


def _char_matrix(strs: list[str], width: int) -> np.ndarray:
    """(n, width) uint32 codepoint matrix, 0-padded — one C-level join+encode,
    no per-string Python loop in the hot path."""
    joined = "".join(s[:width].ljust(width, "\0") for s in strs)
    return np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).reshape(
        len(strs), width
    )


def jaro_winkler_batch(a: list[str], b: list[str],
                       prefix_weight: float = 0.1,
                       max_len: int = 64) -> np.ndarray:
    """Batched Jaro-Winkler: identical results to ``jaro_winkler`` (pinned by
    test), vectorized across PAIRS.  The greedy match scan is inherently
    sequential in the character positions, so the loops run over positions
    (O(L·W) numpy passes, L=longest name, W=match window) while every pass
    operates on all n pairs at once — the high-name-cardinality regime where
    the memoized scalar kernel would walk 1µs/pair Python (VERDICT r2 #4).
    Names longer than ``max_len`` chars are truncated (names, not documents).
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    la = np.fromiter((min(len(s), max_len) for s in a), np.int64, n)
    lb = np.fromiter((min(len(s), max_len) for s in b), np.int64, n)
    L = int(max(la.max(), lb.max(), 1))
    A = _char_matrix(a, L)
    B = _char_matrix(b, L)

    # Bit-parallel greedy match (all n pairs at once, uint64 position masks —
    # max_len=64 is exactly the word width).  eqm[:, i] bit j set iff
    # s1[i] == s2[j]; the i-loop consumes the lowest available equal position
    # inside the Jaro window, mirroring the scalar kernel's first-unflagged-j
    # scan.
    one = np.uint64(1)
    pow2m1 = np.concatenate(
        [(one << np.arange(64, dtype=np.uint64)) - one,
         np.array([np.uint64(0xFFFFFFFFFFFFFFFF)])]
    )
    nzA = A != 0
    eqm = np.zeros((n, L), dtype=np.uint64)
    # accumulate 8 j-bits at a time in uint8 (8× less memory traffic than
    # per-j uint64 temporaries), then merge each byte into the uint64 mask
    for byte in range(0, L, 8):
        eqm8 = np.zeros((n, L), dtype=np.uint8)
        for j in range(byte, min(byte + 8, L)):
            bj = B[:, j : j + 1]
            cmp = (A == bj) & nzA & (bj != 0)
            eqm8 |= cmp.view(np.uint8) << np.uint8(j - byte)
        eqm |= eqm8.astype(np.uint64) << np.uint64(byte)

    match_dist = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    flags1 = np.zeros((n, L), dtype=bool)
    avail = pow2m1[lb]
    flags2_mask = np.zeros(n, dtype=np.uint64)
    for i in range(L):
        lo = np.maximum(0, i - match_dist)
        hi = np.minimum(lb, i + match_dist + 1)
        wmask = pow2m1[hi] & ~pow2m1[lo]
        cand = eqm[:, i] & avail & wmask
        low = cand & (~cand + one)  # lowest set bit
        flags1[:, i] = cand != 0
        flags2_mask |= low
        avail &= ~low
    matches = flags1.sum(axis=1)
    cols = np.arange(L)
    flags2 = ((flags2_mask[:, None] >> cols.astype(np.uint64)) & one).astype(bool)

    # transpositions: flagged chars of each side packed in order (stable
    # argsort pulls flagged columns to the front in position order), compared
    mm = int(matches.max()) if n else 0
    if mm:
        o1 = np.argsort(~flags1, axis=1, kind="stable")[:, :mm]
        o2 = np.argsort(~flags2, axis=1, kind="stable")[:, :mm]
        M1 = np.take_along_axis(A, o1, axis=1)
        M2 = np.take_along_axis(B, o2, axis=1)
        k = np.arange(mm)
        transpositions = ((M1 != M2) & (k < matches[:, None])).sum(axis=1) // 2
    else:
        transpositions = np.zeros(n, dtype=np.int64)

    with np.errstate(divide="ignore", invalid="ignore"):
        m = matches.astype(np.float64)
        jaro = (m / la + m / lb + (m - transpositions) / m) / 3.0
    jaro[matches == 0] = 0.0
    jaro[(la == 0) | (lb == 0)] = 0.0
    jaro[(la == 0) & (lb == 0)] = 1.0  # scalar kernel: s1 == s2 → 1.0

    p = min(4, L)
    eq = (A[:, :p] == B[:, :p]) & (A[:, :p] != 0) & (cols[:p] < la[:, None]) & (
        cols[:p] < lb[:, None]
    )
    prefix = np.cumprod(eq, axis=1).sum(axis=1)
    # boost threshold 0.7 (jellyfish / DuckDB semantics), same as the scalar
    return np.where(jaro > 0.7,
                    jaro + prefix * prefix_weight * (1.0 - jaro), jaro)


def levenshtein_batch(a: list[str], b: list[str], max_len: int = 64) -> np.ndarray:
    """Batched Levenshtein edit distance, vectorized across PAIRS.

    Classic two-row DP; the (i, j) character loops run in Python but every
    cell update is an n-vector numpy op, so cost is O(L1·L2) numpy passes
    over all pairs at once (names are short — L≈12 → ~150 passes).  Strings
    longer than ``max_len`` are truncated (names, not documents).  Matches
    DuckDB's ``levenshtein`` (unit insert/delete/substitute costs), which is
    the oracle for the fuzzy-join query.
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((min(len(s), max_len) for s in a), np.int64, n)
    lb = np.fromiter((min(len(s), max_len) for s in b), np.int64, n)
    La, Lb = int(max(la.max(), 1)), int(max(lb.max(), 1))
    A = _char_matrix(a, La)
    B = _char_matrix(b, Lb)

    prev = np.tile(np.arange(Lb + 1, dtype=np.int64), (n, 1))
    out = np.empty(n, dtype=np.int64)
    sel = la == 0
    out[sel] = lb[sel]
    idx = np.arange(n)
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        neq = (B != A[:, i - 1][:, None]).astype(np.int64)
        for j in range(1, Lb + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + neq[:, j - 1],
            )
        prev = cur
        sel = la == i
        if sel.any():
            out[sel] = prev[idx[sel], lb[sel]]
    return out
