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
