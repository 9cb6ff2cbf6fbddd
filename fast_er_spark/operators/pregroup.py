"""Exact-duplicate pregrouping — collapse byte-identical texts before the
sketch path.

Web corpora are typically 30-50% EXACT duplicates (mirrors, reposts,
boilerplate pages). Every such copy would otherwise go through shingling,
MinHash, banding and verification only to collide with its twin in all 32
bands. Pregrouping replaces that with one hash aggregation:

    fp = xxhash64(text)  ->  one representative (min id) per fingerprint,
    star edges (member -> rep) for the rest.

The sketch pipeline then runs over REPRESENTATIVES only; the star edges are
unioned into the final edge set so connected components assigns every copy to
its representative's cluster. Cluster assignments are IDENTICAL to the
non-pregrouped pipeline (exact copies have identical shingle sets, hence
identical LSH behavior and verification outcomes); only the materialized
pair list is star-compressed within identical-text groups — document this
when reporting pair-level metrics.

Cost: one shuffle keyed on the 64-bit fingerprint. Benefit: the expensive
stages shrink by the duplicate fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["pregroup_exact"]


def pregroup_exact(
    docs: DataFrame, id_col: str = "id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(representatives, exact_edges).

    representatives: (id, text) — one row per distinct non-blank text (min id
    wins) plus every null/blank-text row passed through untouched.
    exact_edges: (id_a, id_b) with id_a the member, id_b its representative
    (id_a > id_b by construction).

    Null/blank texts are NEVER grouped: the base (non-pregrouped) pipeline
    leaves them as singletons (LSH drops blank text, verification requires a
    non-empty shingle union), so linking them here would break the
    cluster-identity contract — on real web corpora every failed extraction
    is a null text. The grouping key is the TEXT VALUE itself; the 64-bit
    fingerprint is only the shuffle key (window partition), so two distinct
    texts that collide in xxhash64 — expected at billion-doc scale — land in
    the same partition but never in the same group.
    """
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    blank = F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0)
    passthrough = base.where(blank)
    w = Window.partitionBy("__fp", "text")
    tagged = (
        base.where(~blank)
        .withColumn("__fp", F.xxhash64("text"))
        .withColumn("__rep", F.min("id").over(w))
    )
    reps = (
        tagged.where(F.col("id") == F.col("__rep")).select("id", "text")
        .unionByName(passthrough)
    )
    exact_edges = (
        tagged.where(F.col("id") != F.col("__rep"))
        .select(F.col("id").alias("id_a"), F.col("__rep").alias("id_b"))
    )
    return reps, exact_edges
