"""Phonetic keys: Soundex and (simplified) Metaphone, pure python.

The reference derives phonetic blocking keys as sorted per-token Soundex codes
(``am_combiner/features/common.py:295-298`` via jellyfish); the north rule adds
Metaphone.  Both implementations here are standard public algorithms,
deterministic, and dependency-free.  Callers vectorize by computing codes over
the *unique* tokens of a batch.
"""

from __future__ import annotations

import re

_SOUNDEX_CODES = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    "l": "4",
    **dict.fromkeys("mn", "5"),
    "r": "6",
}
_NON_ALPHA = re.compile(r"[^a-z]")


def soundex(token: str) -> str:
    """American Soundex (4 chars, zero-padded); '' for non-alphabetic input."""
    t = _NON_ALPHA.sub("", token.lower())
    if not t:
        return ""
    first = t[0]
    codes = []
    prev = _SOUNDEX_CODES.get(first, "")
    for ch in t[1:]:
        code = _SOUNDEX_CODES.get(ch, "")
        if ch in "hw":
            # h/w are transparent: a repeated code across h/w is still a repeat
            continue
        if code and code != prev:
            codes.append(code)
        prev = code
    return (first.upper() + "".join(codes) + "000")[:4]


def phonetic_keys(tokens: list[str]) -> list[str]:
    """Sorted unique Soundex codes of the tokens (reference semantics)."""
    return sorted({soundex(t) for t in tokens if soundex(t)})


_VOWELS = set("aeiou")


def metaphone(token: str, max_len: int = 6) -> str:
    """Simplified Metaphone code — deterministic consonant-class folding.

    Not the full Philips automaton; a published-simplification that keeps the
    property phonetic keys need: common spelling variants of a name map to the
    same code (ph→f, c→k before a/o/u, ck→k, drops vowels after the first,
    collapses doubles).
    """
    t = _NON_ALPHA.sub("", token.lower())
    if not t:
        return ""
    out = []
    i = 0
    n = len(t)
    while i < n and len(out) < max_len:
        ch = t[i]
        nxt = t[i + 1] if i + 1 < n else ""
        if ch == nxt and ch != "c":  # collapse doubles
            i += 1
            continue
        if ch in _VOWELS:
            if i == 0:
                out.append(ch.upper())
            i += 1
            continue
        if ch == "p" and nxt == "h":
            out.append("F")
            i += 2
            continue
        if ch == "s" and nxt == "h":
            out.append("X")
            i += 2
            continue
        if ch == "t" and nxt == "h":
            out.append("0")
            i += 2
            continue
        if ch == "c":
            if nxt == "k":
                out.append("K")
                i += 2
                continue
            out.append("S" if nxt in "eiy" else "K")
            i += 1
            continue
        if ch == "q":
            out.append("K")
            i += 1
            continue
        if ch == "x":
            out.append("KS")
            i += 1
            continue
        if ch in "wyh":
            i += 1
            continue
        if ch == "g" and nxt == "h":
            out.append("K")
            i += 2
            continue
        if ch == "z":
            out.append("S")
            i += 1
            continue
        if ch == "v":
            out.append("F")
            i += 1
            continue
        if ch == "d" and t[i + 1 : i + 3] in ("ge", "gi", "gy"):
            out.append("J")
            i += 1
            continue
        out.append(ch.upper())
        i += 1
    return "".join(out)[:max_len]


def metaphone_keys(tokens: list[str]) -> list[str]:
    """Sorted unique metaphone codes of the tokens."""
    return sorted({metaphone(t) for t in tokens if metaphone(t)})
