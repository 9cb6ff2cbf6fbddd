"""Shingling + stable 64-bit hashing (vectorized pandas UDF internals).

The sketch path (MinHash/SimHash/LSH) operates on shingle sets:
- ``word`` mode: n-gram over whitespace tokens (default for documents)
- ``char`` mode: n-gram over characters (used for short linkage fields,
  where the reference compares whole values with Jaro-Winkler)

Hashes must be stable across Python workers and sessions (PYTHONHASHSEED
independence), so we use blake2b-8byte digests with an explicit seed salt,
then derive K MinHash permutations from one base hash via affine transforms
in numpy (vectorized; no per-permutation re-hashing of strings).
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["shingles", "hash64", "hash_shingles", "MERSENNE_P"]

# Mersenne prime 2^61 - 1: modulus for the affine MinHash permutation family.
MERSENNE_P = (1 << 61) - 1


def shingles(text: str, n: int = 3, mode: str = "word") -> list[str]:
    """n-gram shingles; short inputs yield one shingle (the whole input),
    empty inputs yield none. Matches oracle.reference.shingle_set."""
    if mode == "word":
        toks = text.split()
        if not toks:
            return []
        if len(toks) < n:
            return [" ".join(toks)]
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not text:
        return []
    if len(text) < n:
        return [text]
    return [text[i : i + n] for i in range(len(text) - n + 1)]


def hash64(s: str, seed: int = 0) -> int:
    """Stable 61-bit hash of a string (blake2b-8 truncated into [0, 2^61-1))."""
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little") % MERSENNE_P


def hash_shingles(sh: list[str], seed: int = 0) -> np.ndarray:
    """Distinct base hashes of a shingle list as uint64 array."""
    if not sh:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter(
        {hash64(s, seed) for s in sh}, dtype=np.uint64
    )
