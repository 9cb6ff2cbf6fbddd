"""High-level API: Comparison / Deduplication / Linkage — the user-facing
surface of the reference (comparison.py:602-748, deduplication.py:716-826,
linkage.py:19-72), Spark-native.

A user of the reference writes::

    comp = Comparison(df_A, df_B, Vars_Fuzzy_A, Vars_Fuzzy_B, ...)
    comp.fit()
    est = Estimation(len(fuzzy), len(exact), comp.Counts); est.fit()
    out = Linkage(df_A, df_B, comp.Indices, est.Ksi).transform(0.85)

Here the same flow is::

    comp = Comparison(df_a, df_b, vars_fuzzy_a, vars_fuzzy_b, ...)
    comp.fit()                      # lazy plan; materializes pattern edges
    est = Estimation(...,(comp.counts())).fit()
    out = Linkage(df_a, df_b, comp, est.ksi).transform(0.85)

with pandas inputs replaced by Spark DataFrames and the pattern index sets
replaced by one (id_a, id_b, pattern_id) DataFrame.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .estimation import Estimation
from .operators.agreement import (
    assemble_patterns,
    char_lsh_value_candidates,
    exact_levels_dedup,
    exact_levels_linkage,
    fuzzy_levels_dedup,
    fuzzy_levels_linkage,
    pattern_counts,
)
from .patterns import counts_with_complement

__all__ = ["Comparison", "Deduplication", "Linkage", "Estimation"]

_ROW_ID = "__row_id"


def _with_row_id(df: DataFrame, order_col: str | None) -> DataFrame:
    """Stable long row id. If the table has a natural unique long key, pass it
    as order_col (the scale path — zero extra work). Otherwise positional ids
    are assigned with zipWithIndex: one pass, per-partition counting, NO
    global sort / single-partition window (the reference's ids are the pandas
    positional index; zipWithIndex reproduces that for any source with a
    stable partition order, e.g. a parquet scan). The frame is
    localCheckpointed so every downstream action sees the same ids."""
    if order_col is not None:
        return df.withColumn(_ROW_ID, F.col(order_col).cast("long"))
    schema = df.schema.add(_ROW_ID, T.LongType(), False)
    rdd = df.rdd.zipWithIndex().map(lambda t: tuple(t[0]) + (t[1],))
    return df.sparkSession.createDataFrame(rdd, schema).localCheckpoint(eager=False)


class Comparison:
    """A x B agreement patterns (reference Comparison, comparison.py:602)."""

    def __init__(
        self,
        df_a: DataFrame,
        df_b: DataFrame,
        vars_fuzzy_a: list[str],
        vars_fuzzy_b: list[str],
        vars_exact_a: list[str] | None = None,
        vars_exact_b: list[str] | None = None,
        id_a: str | None = None,
        id_b: str | None = None,
        blocking_a: str | None = None,
        blocking_b: str | None = None,
    ):
        vars_exact_a = vars_exact_a or []
        vars_exact_b = vars_exact_b or []
        if (blocking_a is None) != (blocking_b is None):
            raise ValueError("blocking needs a column on both sides")
        if len(vars_fuzzy_a) != len(vars_fuzzy_b) or len(vars_exact_a) != len(vars_exact_b):
            raise ValueError("variable lists for A and B must have equal length")
        for c in vars_fuzzy_a + vars_exact_a:
            if c not in df_a.columns:
                raise ValueError(f"column {c} not in df_a")
        for c in vars_fuzzy_b + vars_exact_b:
            if c not in df_b.columns:
                raise ValueError(f"column {c} not in df_b")
        self.df_a = _with_row_id(df_a, id_a)
        self.df_b = _with_row_id(df_b, id_b)
        self.id_a = id_a
        self.id_b = id_b
        self.blocking_a = blocking_a
        self.blocking_b = blocking_b
        if blocking_a is not None:
            self.df_a = self.df_a.withColumn("__block", F.col(blocking_a).cast("string"))
            self.df_b = self.df_b.withColumn("__block", F.col(blocking_b).cast("string"))
        self.vars_fuzzy_a = vars_fuzzy_a
        self.vars_fuzzy_b = vars_fuzzy_b
        self.vars_exact_a = vars_exact_a
        self.vars_exact_b = vars_exact_b
        self.k_fuzzy = len(vars_fuzzy_a)
        self.k_exact = len(vars_exact_a)
        self.patterns: DataFrame | None = None
        self._counts: np.ndarray | None = None

    def fit(
        self,
        p: float = 0.1,
        lower_thr: float = 0.88,
        upper_thr: float = 0.94,
        candidates=None,
    ) -> "Comparison":
        if self.patterns is not None:
            raise RuntimeError("already fitted")
        blk = self.blocking_a is not None
        bl = ["__block"] if blk else []
        a = self.df_a.select(
            F.col(_ROW_ID).alias("id_a"), *self.vars_fuzzy_a, *self.vars_exact_a, *bl
        )
        b = self.df_b.select(
            F.col(_ROW_ID).alias("id_b"), *self.vars_fuzzy_b, *self.vars_exact_b, *bl
        )
        frames = []
        for ca, cb in zip(self.vars_fuzzy_a, self.vars_fuzzy_b):
            frames.append(
                fuzzy_levels_linkage(
                    a, b, ca, cb, "id_a", "id_b", p, lower_thr, upper_thr,
                    candidates, block=blk,
                )
            )
        for ca, cb in zip(self.vars_exact_a, self.vars_exact_b):
            frames.append(
                exact_levels_linkage(a, b, ca, cb, "id_a", "id_b", block=blk)
            )
        self.patterns = assemble_patterns(frames, self.k_fuzzy, self.k_exact)
        return self

    def counts(self) -> np.ndarray:
        """Full pattern histogram incl. the complement row
        (comparison.py:732-748)."""
        if self.patterns is None:
            raise RuntimeError("fit() first")
        if self._counts is None:
            observed = {
                int(r["pattern_id"]): int(r["cnt"])
                for r in pattern_counts(self.patterns).collect()
            }
            if self.blocking_a is None:
                total_a, total_b = self.df_a.count(), self.df_b.count()
                self._counts = counts_with_complement(
                    observed, self.k_fuzzy, self.k_exact, total_a, total_b
                )
            else:
                # blocked pair universe: sum over blocks |A_b| * |B_b|
                # (reference blocking sums per-block Counts, usage.rst)
                ca = self.df_a.groupBy("__block").count().withColumnsRenamed(
                    {"count": "na"}
                )
                cb = self.df_b.groupBy("__block").count().withColumnsRenamed(
                    {"count": "nb"}
                )
                row = ca.join(cb, "__block").select(
                    F.sum(F.col("na") * F.col("nb")).alias("t")
                ).collect()[0]
                total = int(row["t"] or 0)
                from .patterns import n_patterns
                import numpy as np
                counts = np.zeros(n_patterns(self.k_fuzzy, self.k_exact), dtype=np.int64)
                for pid, c in observed.items():
                    if pid != 0:
                        counts[pid] = c
                counts[0] = total - counts[1:].sum()
                self._counts = counts
        return self._counts


class Deduplication:
    """Within-table agreement patterns (reference Deduplication,
    deduplication.py:716). Pair universe = strict lower triangle; the counts
    complement row includes the diagonal (deduplication.py:825)."""

    def __init__(
        self,
        df: DataFrame,
        vars_fuzzy: list[str],
        vars_exact: list[str] | None = None,
        id_col: str | None = None,
    ):
        vars_exact = vars_exact or []
        for c in vars_fuzzy + vars_exact:
            if c not in df.columns:
                raise ValueError(f"column {c} not in df")
        self.df = _with_row_id(df, id_col)
        self.vars_fuzzy = vars_fuzzy
        self.vars_exact = vars_exact
        self.k_fuzzy = len(vars_fuzzy)
        self.k_exact = len(vars_exact)
        self.patterns: DataFrame | None = None
        self._counts: np.ndarray | None = None

    def fit(
        self,
        p: float = 0.1,
        lower_thr: float = 0.88,
        upper_thr: float = 0.94,
        candidates=None,
    ) -> "Deduplication":
        if self.patterns is not None:
            raise RuntimeError("already fitted")
        d = self.df.select(F.col(_ROW_ID).alias("id"), *self.vars_fuzzy, *self.vars_exact)
        frames = []
        for c in self.vars_fuzzy:
            frames.append(
                fuzzy_levels_dedup(d, c, "id", p, lower_thr, upper_thr, candidates)
            )
        for c in self.vars_exact:
            frames.append(exact_levels_dedup(d, c, "id"))
        self.patterns = assemble_patterns(frames, self.k_fuzzy, self.k_exact)
        return self

    def counts(self) -> np.ndarray:
        if self.patterns is None:
            raise RuntimeError("fit() first")
        if self._counts is None:
            observed = {
                int(r["pattern_id"]): int(r["cnt"])
                for r in pattern_counts(self.patterns).collect()
            }
            self._counts = counts_with_complement(
                observed, self.k_fuzzy, self.k_exact, self.df.count(), None
            )
        return self._counts


class Linkage:
    """Materialize matched pairs above a posterior threshold (reference
    linkage.py:26-72). The reference's off-by-one Indices[i-1] bug is fixed
    here: we join on pattern_id directly, so a threshold that admits pattern 0
    simply matches nothing extra instead of reading Indices[-1]."""

    def __init__(self, df_a: DataFrame, df_b: DataFrame, comparison, ksi: np.ndarray):
        # Passed frames must carry the SAME id columns the Comparison was
        # built with, or pattern ids and row ids silently misalign; frames
        # without them are rejected rather than re-derived positionally.
        def bind(df, id_col, comp_df, side):
            if df is None:
                return comp_df
            if id_col is None:
                raise ValueError(
                    f"Comparison assigned positional row ids to df_{side}; "
                    f"pass df_{side}=None so Linkage reuses the same frame"
                )
            if id_col not in df.columns:
                raise ValueError(f"df_{side} lacks the Comparison id column {id_col!r}")
            return _with_row_id(df, id_col)

        self.df_a = bind(df_a, getattr(comparison, "id_a", None), comparison.df_a, "a")
        self.df_b = bind(df_b, getattr(comparison, "id_b", None), comparison.df_b, "b")
        self.patterns = comparison.patterns
        self.ksi = np.asarray(ksi, dtype=np.float64)

    def transform(self, threshold: float = 0.85) -> DataFrame:
        spark = self.patterns.sparkSession
        ksi_rows = [(int(i), float(v)) for i, v in enumerate(self.ksi)]
        ksi_df = spark.createDataFrame(ksi_rows, "pattern_id long, ksi double")
        # join keys get throwaway names: a post-join rename of id_a would
        # case-insensitively hit a user column suffixed to id_A (a table with
        # an 'id' column) and produce two Index_A columns
        matched = (
            self.patterns.join(F.broadcast(ksi_df), "pattern_id")
            .where(F.col("ksi") >= F.lit(threshold))
            .select(
                F.col("id_a").alias("Index_A"),
                F.col("id_b").alias("Index_B"),
                "ksi",
            )
        )
        a = self.df_a.select(
            F.col(_ROW_ID).alias("__jka"),
            *[F.col(c).alias(f"{c}_A") for c in self.df_a.columns if c != _ROW_ID],
        )
        b = self.df_b.select(
            F.col(_ROW_ID).alias("__jkb"),
            *[F.col(c).alias(f"{c}_B") for c in self.df_b.columns if c != _ROW_ID],
        )
        return (
            matched.join(a, matched["Index_A"] == a["__jka"])
            .join(b, matched["Index_B"] == b["__jkb"])
            .drop("__jka", "__jkb")
        )
