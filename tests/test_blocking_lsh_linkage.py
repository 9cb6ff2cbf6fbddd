"""Blocking (reference usage.rst) + LSH value-candidate linkage tests."""

import pytest

from fixtures.synth import people
from oracle.reference import linkage_patterns, oracle_counts

FUZZY = ["last_name", "first_name"]
EXACT = ["birth_year"]


def _tuples(rows):
    return [tuple(r[c] for c in FUZZY + EXACT) for r in rows]


def _with_block(rows, seed_mod=3):
    # deterministic synthetic blocking key (stand-in for 'gender')
    for i, r in enumerate(rows):
        r["blk"] = f"g{hash(r['ncid']) % 0 if False else (len(r['last_name']) % seed_mod)}"
    return rows


def test_blocked_comparison_matches_oracle(spark):
    from fast_er_spark.linkage import Comparison

    rows_a, rows_b = people(n=40, seed=19)
    for i, r in enumerate(rows_a):
        r["rid"] = i
    for i, r in enumerate(rows_b):
        r["rid"] = i
    _with_block(rows_a)
    _with_block(rows_b)
    df_a = spark.createDataFrame(rows_a)
    df_b = spark.createDataFrame(rows_b)

    comp = Comparison(
        df_a, df_b, FUZZY, FUZZY, EXACT, EXACT,
        id_a="rid", id_b="rid", blocking_a="blk", blocking_b="blk",
    ).fit()
    got = {(int(r.id_a), int(r.id_b), int(r.pattern_id)) for r in comp.patterns.collect()}

    n_b = len(rows_b)
    oracle = linkage_patterns(
        _tuples(rows_a), _tuples(rows_b), len(FUZZY), len(EXACT),
        blocks_a=[r["blk"] for r in rows_a], blocks_b=[r["blk"] for r in rows_b],
    )
    want = {(f // n_b, f % n_b, pid) for pid, fl in oracle.items() for f in fl}
    assert got == want

    # blocked pair universe: sum over blocks |A_b|*|B_b|
    import numpy as np
    from collections import Counter

    ca = Counter(r["blk"] for r in rows_a)
    cb = Counter(r["blk"] for r in rows_b)
    total = sum(ca[k] * cb.get(k, 0) for k in ca)
    counts = comp.counts()
    assert counts.sum() == total
    want_counts = oracle_counts(oracle, len(FUZZY), len(EXACT), 1, 1)  # shape only
    assert len(counts) == len(want_counts)
    for pid, fl in oracle.items():
        assert counts[pid] == len(fl)


def test_blocking_one_sided_rejected(spark):
    from fast_er_spark.linkage import Comparison

    rows_a, rows_b = people(n=10, seed=2)
    df_a = spark.createDataFrame(rows_a)
    df_b = spark.createDataFrame(rows_b)
    with pytest.raises(ValueError):
        Comparison(df_a, df_b, FUZZY, FUZZY, blocking_a="last_name")


def test_char_lsh_value_candidates_recall(spark):
    """LSH-pruned fuzzy linkage must reproduce the full-cross pattern edges
    on typo-perturbed names (the scale path for the linkage engine)."""
    from fast_er_spark.linkage import Comparison
    from fast_er_spark.operators.agreement import char_lsh_value_candidates

    rows_a, rows_b = people(n=60, seed=23)
    for i, r in enumerate(rows_a):
        r["rid"] = i
    for i, r in enumerate(rows_b):
        r["rid"] = i
    df_a = spark.createDataFrame(rows_a)
    df_b = spark.createDataFrame(rows_b)

    exact_comp = Comparison(df_a, df_b, FUZZY, FUZZY, EXACT, EXACT,
                            id_a="rid", id_b="rid").fit()
    full = {(int(r.id_a), int(r.id_b), int(r.pattern_id))
            for r in exact_comp.patterns.collect()}

    lsh_comp = Comparison(df_a, df_b, FUZZY, FUZZY, EXACT, EXACT,
                          id_a="rid", id_b="rid").fit(
        candidates=char_lsh_value_candidates(num_perm=64, bands=32, rows_per_band=2)
    )
    pruned = {(int(r.id_a), int(r.id_b), int(r.pattern_id))
              for r in lsh_comp.patterns.collect()}

    # exact-variable edges identical; fuzzy edges >= 99% recall
    missed = full - pruned
    recall = 1 - len(missed) / max(len(full), 1)
    assert recall >= 0.99, (recall, sorted(missed)[:5])
