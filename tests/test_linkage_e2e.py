"""End-to-end parity: Spark engine vs the brute-force CPU oracle on seeded
fixtures (FIXTURES.md F2/F3), plus the full Fellegi-Sunter flow."""

import pytest

from fixtures.synth import people
from oracle.reference import dedup_patterns, linkage_patterns, oracle_counts


def _people_dfs(spark, n=40):
    rows_a, rows_b = people(n=n, seed=7)
    for i, r in enumerate(rows_a):
        r["rid"] = i
    for i, r in enumerate(rows_b):
        r["rid"] = i
    df_a = spark.createDataFrame(rows_a)
    df_b = spark.createDataFrame(rows_b)
    return rows_a, rows_b, df_a, df_b


FUZZY = ["last_name", "first_name", "street_name"]
EXACT = ["birth_year"]


def _tuples(rows):
    return [tuple(r[c] for c in FUZZY + EXACT) for r in rows]


def test_comparison_patterns_match_oracle(spark):
    from fast_er_spark.linkage import Comparison

    rows_a, rows_b, df_a, df_b = _people_dfs(spark, n=40)
    comp = Comparison(df_a, df_b, FUZZY, FUZZY, EXACT, EXACT, id_a="rid", id_b="rid").fit()

    got = {
        (int(r.id_a), int(r.id_b), int(r.pattern_id))
        for r in comp.patterns.collect()
    }
    n_b = len(rows_b)
    oracle = linkage_patterns(_tuples(rows_a), _tuples(rows_b), len(FUZZY), len(EXACT))
    want = {
        (flat // n_b, flat % n_b, pid)
        for pid, flats in oracle.items()
        for flat in flats
    }
    assert got == want

    import numpy as np

    want_counts = oracle_counts(oracle, len(FUZZY), len(EXACT), len(rows_a), n_b)
    assert np.array_equal(comp.counts(), want_counts)


def test_dedup_patterns_match_oracle(spark):
    from fast_er_spark.linkage import Deduplication

    rows_a, rows_b, *_ = people(n=30, seed=11), None, None
    rows_a, rows_b = people(n=30, seed=11)
    # one table containing perturbed copies: rows_a ∪ rows_b
    rows = rows_a + rows_b
    for i, r in enumerate(rows):
        r["rid"] = i
    df = spark.createDataFrame(rows)
    dd = Deduplication(df, FUZZY, EXACT, id_col="rid").fit()

    got = {
        (int(r.id_a), int(r.id_b), int(r.pattern_id)) for r in dd.patterns.collect()
    }
    n = len(rows)
    oracle = dedup_patterns(_tuples(rows), len(FUZZY), len(EXACT))
    want = {
        (flat // n, flat % n, pid) for pid, flats in oracle.items() for flat in flats
    }
    assert got == want

    import numpy as np

    want_counts = oracle_counts(oracle, len(FUZZY), len(EXACT), n, None)
    assert np.array_equal(dd.counts(), want_counts)


def test_full_fs_linkage_flow(spark):
    """Comparison -> EM -> Linkage, precision/recall vs planted ncid truth
    (the reference's own validation method, example/Example.ipynb cells 4-8)."""
    import numpy as np

    from fast_er_spark.linkage import Comparison, Estimation, Linkage

    rows_a, rows_b, df_a, df_b = _people_dfs(spark, n=120)
    comp = Comparison(df_a, df_b, FUZZY, FUZZY, EXACT, EXACT, id_a="rid", id_b="rid").fit()
    est = Estimation(len(FUZZY), len(EXACT), comp.counts(), seed=13).fit()
    out = Linkage(None, None, comp, est.ksi).transform(0.85).collect()

    truth = {
        (a["rid"], b["rid"])
        for a in rows_a
        for b in rows_b
        if a["ncid"] == b["ncid"]
    }
    got = {(int(r.Index_A), int(r.Index_B)) for r in out}
    assert got, "linkage produced no matches"
    tp = len(got & truth)
    precision = tp / len(got)
    recall = tp / len(truth)
    assert precision >= 0.9, (precision, recall)
    assert recall >= 0.9, (precision, recall)
