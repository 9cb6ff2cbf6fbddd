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


def test_auto_candidates_switch_to_lsh_and_keep_recall(spark):
    """The DEFAULT fuzzy path must be adaptive: exact cross product under the
    pair budget, char-LSH pruning above it — with >=99% pattern recall and no
    spurious extra pairs on the LSH side beyond what scoring admits."""
    from pyspark.sql import functions as F

    from fast_er_spark.operators.agreement import (
        default_value_candidates,
        scored_value_pairs,
    )

    rows_a, rows_b = people(n=120, seed=31)
    vals_a = spark.createDataFrame(
        [(r["last_name"],) for r in rows_a], "val_a string"
    ).distinct()
    vals_b = spark.createDataFrame(
        [(r["last_name"],) for r in rows_b], "val_b string"
    ).distinct()

    exact = {
        (r.val_a, r.val_b, r.level)
        for r in scored_value_pairs(vals_a, vals_b, 0.1, 0.88, 0.94).collect()
    }
    forced_lsh = {
        (r.val_a, r.val_b, r.level)
        for r in scored_value_pairs(
            vals_a, vals_b, 0.1, 0.88, 0.94,
            candidates=lambda a, b: default_value_candidates(a, b, pair_budget=1),
        ).collect()
    }
    assert forced_lsh <= exact  # pruning can only drop, never invent
    recall = len(forced_lsh) / max(len(exact), 1)
    assert recall >= 0.99, (recall, sorted(exact - forced_lsh)[:5])


def test_linkage_plans_have_no_window(spark):
    """VERDICT r1 #6: positional row ids must not use a global-sort window —
    no Window operator anywhere in the linkage physical plans."""
    from fast_er_spark.linkage import Comparison, Estimation, Linkage
    from fast_er_spark.plans.inspect import formatted_plan

    rows_a, rows_b = people(n=30, seed=7)
    df_a = spark.createDataFrame(rows_a)
    df_b = spark.createDataFrame(rows_b)
    comp = Comparison(df_a, df_b, FUZZY, FUZZY, EXACT, EXACT).fit()
    assert "Window" not in formatted_plan(comp.patterns)
    est = Estimation(len(FUZZY), len(EXACT), comp.counts(), seed=13).fit()
    out = Linkage(None, None, comp, est.ksi).transform(0.85)
    assert "Window" not in formatted_plan(out)
    assert out.count() > 0


def test_linkage_with_passed_frames_uses_comparison_ids(spark):
    """ADVICE r1: Linkage(df_a, df_b, ...) must bind rows through the id
    columns the Comparison was built with — same output as passing None —
    and reject frames that cannot be aligned."""
    from fast_er_spark.linkage import Comparison, Estimation, Linkage

    rows_a, rows_b = people(n=40, seed=11)
    for i, r in enumerate(rows_a):
        r["rid"] = i
    for i, r in enumerate(rows_b):
        r["rid"] = i
    df_a = spark.createDataFrame(rows_a)
    df_b = spark.createDataFrame(rows_b)
    comp = Comparison(df_a, df_b, FUZZY, FUZZY, EXACT, EXACT, id_a="rid", id_b="rid").fit()
    est = Estimation(len(FUZZY), len(EXACT), comp.counts(), seed=13).fit()
    ref = {
        (r.Index_A, r.Index_B)
        for r in Linkage(None, None, comp, est.ksi).transform(0.85).collect()
    }
    got = {
        (r.Index_A, r.Index_B)
        for r in Linkage(df_a, df_b, comp, est.ksi).transform(0.85).collect()
    }
    assert got == ref and ref

    with pytest.raises(ValueError):
        Linkage(df_a.drop("rid"), df_b, comp, est.ksi)

    comp_pos = Comparison(df_a, df_b, FUZZY, FUZZY, EXACT, EXACT).fit()
    with pytest.raises(ValueError):
        Linkage(df_a, df_b, comp_pos, est.ksi)


def test_blocked_sparse_exact_matches_dense(spark):
    """The sparse-exact engine must hold under blocking: counts and the full
    pattern surface equal the dense blocked path."""
    import numpy as np

    from fast_er_spark.linkage import Comparison

    rows_a, rows_b = people(n=80, seed=41)
    for i, r in enumerate(rows_a):
        r["rid"] = i
    for i, r in enumerate(rows_b):
        r["rid"] = i
    _with_block(rows_a)
    _with_block(rows_b)
    df_a = spark.createDataFrame(rows_a)
    df_b = spark.createDataFrame(rows_b)
    sp = Comparison(df_a, df_b, FUZZY, FUZZY, EXACT, EXACT, id_a="rid", id_b="rid",
                    blocking_a="blk", blocking_b="blk").fit()
    dn = Comparison(df_a, df_b, FUZZY, FUZZY, EXACT, EXACT, id_a="rid", id_b="rid",
                    blocking_a="blk", blocking_b="blk").fit(exact_sparse=False)
    assert sp._sparse is not None and dn._sparse is None
    np.testing.assert_array_equal(sp.counts(), dn.counts())
    pat_sp = {(r.id_a, r.id_b, r.pattern_id) for r in sp.patterns.collect()}
    pat_dn = {(r.id_a, r.id_b, r.pattern_id) for r in dn.patterns.collect()}
    assert pat_sp == pat_dn and pat_sp
