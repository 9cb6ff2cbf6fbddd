"""Jaro-Winkler similarity with the reference's exact byte-level semantics.

Reference: /root/reference/faster/comparison.py:11-131 (CUDA device function,
duplicated at deduplication.py:10-130). Semantics reproduced here (re-derived,
not copied):

- Comparison is per UTF-8 **byte**, not per codepoint (the reference encodes
  strings to a byte buffer, comparison.py:283).
- Empty string on either side => 0.0 (comparison.py:34-37).
- Match window is ``max(len1, len2) // 2 - 1`` (comparison.py:44). NOTE the
  quirk: for two 1-byte strings the window is -1 so even identical 1-char
  strings score 0.0. We reproduce this deliberately.
- Zero matching characters => 0.0 (comparison.py:66-69).
- Winkler prefix boost ``p * prefix * (1 - jaro)`` with prefix capped at 4 is
  applied **unconditionally** (comparison.py:108-123) — there is no textbook
  0.7 boost threshold.

The scalar function is pure Python over ``bytes``; the batch entry point
``jw_batch`` is what the Spark pandas_udf calls (Arrow-vectorized transfer,
per-pair scalar loop — only ever applied to candidate/distinct pairs, never
the raw cross product, so the Python loop is off the O(N^2) path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["jaro_winkler_bytes", "jaro_winkler", "jw_batch", "discretize"]


def jaro_winkler_bytes(s1: bytes, s2: bytes, p: float = 0.1) -> float:
    """Reference-faithful Jaro-Winkler on byte strings."""
    l1 = len(s1)
    l2 = len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0

    max_dist = max(l1, l2) // 2 - 1

    hash1 = bytearray(l1)
    hash2 = bytearray(l2)
    match = 0
    for i in range(l1):
        c = s1[i]
        j0 = i - max_dist
        if j0 < 0:
            j0 = 0
        j1 = i + max_dist + 1
        if j1 > l2:
            j1 = l2
        for j in range(j0, j1):
            if c == s2[j] and not hash2[j]:
                hash1[i] = 1
                hash2[j] = 1
                match += 1
                break

    if match == 0:
        return 0.0

    # Transpositions: matched chars out of order, divided by two.
    t = 0
    point = 0
    for i in range(l1):
        if hash1[i]:
            while not hash2[point]:
                point += 1
            if s1[i] != s2[point]:
                t += 1
            point += 1
    half_t = t / 2.0

    jaro = (match / l1 + match / l2 + (match - half_t) / match) / 3.0

    prefix = 0
    for i in range(min(l1, l2, 4)):
        if s1[i] == s2[i]:
            prefix += 1
        else:
            break

    return jaro + p * prefix * (1.0 - jaro)


def jaro_winkler(s1: str, s2: str, p: float = 0.1) -> float:
    """Jaro-Winkler over python strings (encoded to UTF-8 bytes first)."""
    return jaro_winkler_bytes(s1.encode("utf-8"), s2.encode("utf-8"), p)


def jw_batch(a: pd.Series, b: pd.Series, p: float = 0.1) -> pd.Series:
    """Vectorized-transfer batch scorer for use inside a pandas_udf.

    Nulls score 0.0 (same as empty strings in the reference).
    """
    out = np.zeros(len(a), dtype=np.float64)
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    fn = jaro_winkler_bytes
    for i in range(len(out)):
        x = av[i]
        y = bv[i]
        if x is None or y is None:
            continue
        out[i] = fn(str(x).encode("utf-8"), str(y).encode("utf-8"), p)
    return pd.Series(out)


def discretize(score: float, lower: float = 0.88, upper: float = 0.94) -> int:
    """Band discretization (comparison.py:320-338): level 2 if score >= upper,
    level 1 if lower <= score < upper, else 0. Bounds: lower inclusive,
    upper exclusive for level 1."""
    if score >= upper:
        return 2
    if score >= lower:
        return 1
    return 0
