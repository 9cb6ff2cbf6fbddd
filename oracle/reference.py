"""Brute-force CPU oracle of the reference pipeline (tests only).

Computes, for small inputs, exactly what Fast-ER computes:
- per-variable Jaro-Winkler (byte semantics) / exact equality
- band discretization into levels (3 fuzzy / 2 exact)
- agreement-pattern id per pair, pattern histogram with the reference's
  complement quirks (linkage: |A|*|B|; dedup: n(n+1)/2 including diagonal,
  /root/reference/faster/deduplication.py:825)
- pair sets per pattern in flat pair-id encoding (i * n_B + j, and for dedup
  i * n + j with i > j, comparison.py:270-275 / deduplication.py:299-310)

Jaro-Winkler itself is unit-tested against published golden values in
tests/test_jw.py; this module reuses it and adds the pipeline structure.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from fast_er_spark.functions.jw import discretize, jaro_winkler
from fast_er_spark.patterns import counts_with_complement, strides

__all__ = [
    "linkage_patterns",
    "dedup_patterns",
    "oracle_counts",
    "connected_components",
    "shingle_set",
    "jaccard",
    "jaccard_dup_pairs",
]


def _pair_levels(vals_a, vals_b, n_fuzzy, p, lower, upper, dedup=False):
    levels = []
    for k, (va, vb) in enumerate(zip(vals_a, vals_b)):
        if k < n_fuzzy:
            if dedup and str(va) == str(vb):
                # dedup unique-value diagonal short-circuit: equal values
                # score 1.0 regardless of JW (deduplication.py:185-190) —
                # linkage has no such shortcut.
                score = 1.0
            else:
                score = jaro_winkler(str(va), str(vb), p)
            levels.append(discretize(score, lower, upper))
        else:
            levels.append(1 if str(va) == str(vb) else 0)
    return levels


def linkage_patterns(
    rows_a: list[tuple],
    rows_b: list[tuple],
    k_fuzzy: int,
    k_exact: int,
    p: float = 0.1,
    lower: float = 0.88,
    upper: float = 0.94,
    blocks_a: list | None = None,
    blocks_b: list | None = None,
) -> dict[int, list[int]]:
    """All-pairs A x B scoring. Each row is a tuple of the compared values,
    fuzzy columns first. Returns {pattern_id: sorted flat pair ids}.
    With blocks, only same-block pairs are scored (reference Blocking)."""
    st = strides(k_fuzzy, k_exact)
    n_b = len(rows_b)
    out: dict[int, list[int]] = defaultdict(list)
    for i, ra in enumerate(rows_a):
        for j, rb in enumerate(rows_b):
            if blocks_a is not None and blocks_a[i] != blocks_b[j]:
                continue
            levels = _pair_levels(ra, rb, k_fuzzy, p, lower, upper)
            pid = sum(l * s for l, s in zip(levels, st))
            if pid != 0:
                out[pid].append(i * n_b + j)
    return {k: sorted(v) for k, v in out.items()}


def dedup_patterns(
    rows: list[tuple],
    k_fuzzy: int,
    k_exact: int,
    p: float = 0.1,
    lower: float = 0.88,
    upper: float = 0.94,
) -> dict[int, list[int]]:
    """Lower-triangle self scoring (i > j). Flat id = i * n + j."""
    st = strides(k_fuzzy, k_exact)
    n = len(rows)
    out: dict[int, list[int]] = defaultdict(list)
    for i in range(n):
        for j in range(i):
            levels = _pair_levels(rows[i], rows[j], k_fuzzy, p, lower, upper, dedup=True)
            pid = sum(l * s for l, s in zip(levels, st))
            if pid != 0:
                out[pid].append(i * n + j)
    return {k: sorted(v) for k, v in out.items()}


def oracle_counts(
    patterns: dict[int, list[int]],
    k_fuzzy: int,
    k_exact: int,
    n_a: int,
    n_b: int | None = None,
) -> np.ndarray:
    observed = {pid: len(ids) for pid, ids in patterns.items()}
    return counts_with_complement(observed, k_fuzzy, k_exact, n_a, n_b)


def connected_components(n_or_nodes, edges) -> dict:
    """Union-find connected components; cluster id = min member id."""
    if isinstance(n_or_nodes, int):
        nodes = list(range(n_or_nodes))
    else:
        nodes = list(n_or_nodes)
    parent = {v: v for v in nodes}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in nodes}


def shingle_set(text: str, n: int = 3, mode: str = "word") -> set:
    """Shingles matching fast_er_spark.functions.shingles semantics."""
    if mode == "word":
        toks = text.split()
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    s = text
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def jaccard_dup_pairs(
    texts: dict, n: int = 3, mode: str = "word", threshold: float = 0.8
) -> set[tuple]:
    """Brute-force ground-truth near-dup pairs at a shingle-Jaccard threshold.
    ``texts`` maps id -> text; returns {(max_id, min_id)} canonical pairs."""
    ids = sorted(texts)
    sets = {i: shingle_set(texts[i], n, mode) for i in ids}
    out = set()
    for x in range(len(ids)):
        for y in range(x):
            i, j = ids[x], ids[y]
            if jaccard(sets[i], sets[j]) >= threshold:
                out.add((max(i, j), min(i, j)))
    return out
