"""Deterministic, process-stable hashing primitives.

Python's builtin ``hash`` is salted per process, so every hash used for
partitioning, salting, sampling or ids in this engine goes through these
helpers instead.  All are pure functions of their inputs.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_MERSENNE_61 = (1 << 61) - 1


def stable_hash64(value: str | bytes) -> int:
    """64-bit stable hash of a string (blake2b, first 8 bytes, little-endian)."""
    if isinstance(value, str):
        value = value.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(value, digest_size=8).digest(), "little")


def stable_hash32(value: str | bytes) -> int:
    """32-bit stable hash (crc32) — fast, for bucketing/salting."""
    if isinstance(value, str):
        value = value.encode("utf-8", "surrogatepass")
    return zlib.crc32(value) & 0xFFFFFFFF


def hash64_array(values) -> np.ndarray:
    """Vector of 64-bit stable hashes for an iterable of strings.

    Python-loop over blake2b is ~1µs/item; callers that need more speed
    should hash only the *unique* values of a column and take() back.
    """
    out = np.empty(len(values), dtype=np.uint64)
    h = hashlib.blake2b
    for i, v in enumerate(values):
        if v is None:
            out[i] = 0
            continue
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        out[i] = int.from_bytes(h(v, digest_size=8).digest(), "little")
    return out


def universal_hash_constants(num_perm: int, seed: int = 7):
    """The seeded (a, b) constant vectors behind ``universal_hashes`` —
    exposed so a SQL oracle can inline the SAME constants as literals and
    reproduce MinHash signatures bit-for-bit (uint64 wraparound ==
    ``(h*a + b) % 2^64`` in HUGEINT arithmetic)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE_61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE_61, size=num_perm, dtype=np.uint64)
    return a, b


def universal_hashes(base: np.ndarray, num_perm: int, seed: int = 7) -> np.ndarray:
    """(n, num_perm) matrix of universal hashes ``(a*h + b) mod p`` of 64-bit bases.

    Used for MinHash permutations.  ``a``/``b`` are drawn from a seeded RNG so
    signatures are deterministic across processes and rounds.
    """
    a, b = universal_hash_constants(num_perm, seed)
    base = base.astype(np.uint64).reshape(-1, 1)
    # modular arithmetic in python ints would be slow; uint64 wraparound is a
    # valid universal-ish family for dedup purposes and fully deterministic.
    return base * a[None, :] + b[None, :]


def md5_hex(value: str) -> str:
    """md5 hex digest of a utf-8 string (matches DuckDB's ``md5()``)."""
    return hashlib.md5(value.encode("utf-8", "surrogatepass")).hexdigest()


def bucket_of(value: str, num_buckets: int) -> int:
    """Stable bucket id in [0, num_buckets) for partitioned hash joins."""
    return stable_hash32(value) % num_buckets


def md5_hash64_array(values) -> np.ndarray:
    """Vector of 64-bit hashes equal to DuckDB's ``md5_number_lower()``: the
    LAST 8 bytes of the md5 digest, little-endian.  Used where a SQL oracle
    must reproduce the hash bit-for-bit (SimHash signatures)."""
    out = np.empty(len(values), dtype=np.uint64)
    md5 = hashlib.md5
    for i, v in enumerate(values):
        if v is None:
            out[i] = 0
            continue
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        out[i] = int.from_bytes(md5(v).digest()[8:], "little")
    return out
