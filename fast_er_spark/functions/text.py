"""Text-analysis Column expressions — all JVM-side Spark built-ins.

Everything here stays inside whole-stage codegen (no Python UDFs): token
counting, quality scoring, language-ID scoring, and a rolling-hash document
fingerprint via ``F.aggregate``. Each has an exact ANSI-SQL twin used by the
driver's DuckDB oracle (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "distinct_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "quality_score_from_stats",
    "lang_marker_score",
    "lang_marker_counts",
    "marker_spec",
    "rolling_fingerprint",
    "text_stats",
    "STOPWORDS_EN",
    "FP_MOD",
    "FP_BASE",
]

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

FP_MOD = 1_000_000_007
FP_BASE = 31


def tokens(col: Column) -> Column:
    """Whitespace tokens; empty/blank text -> empty array (not [''])."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    n = F.length(col)
    stripped = F.length(F.regexp_replace(col, r"[^0-9A-Za-z\s]", ""))
    return F.when(n > 0, (n - stripped) / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    tok = tokens(F.lower(col))
    hits = F.size(F.filter(tok, lambda t: t.isin(sw)))
    n = F.size(tok)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Heuristic [0,1] quality: length band + low punctuation + type/token
    ratio. Deterministic, SQL-twinned; a stand-in for Gopher-style rules."""
    n_tok = token_count(col)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    ttr = F.when(n_tok > 0, distinct_token_count(col) / n_tok).otherwise(F.lit(0.0))
    return F.round((len_ok + (1.0 - punct_ratio(col)) + ttr) / 3.0, 6)


def lang_marker_score(col: Column, markers: list[str]) -> Column:
    """Count of tokens that appear in a language marker list (n-gram-free
    language-ID heuristic; argmax over languages gives the prediction)."""
    return F.size(F.filter(tokens(F.lower(col)), lambda t: t.isin(markers)))


def rolling_fingerprint(col: Column, jvm: bool = False) -> Column:
    """Polynomial rolling hash over the text's code points:
    acc = (acc * 31 + codepoint) mod 1e9+7.
    DuckDB twin: list_reduce over string_split_regex (see oracle_sql).

    ``jvm=True`` (requires a prior ensure_jvm_udfs(spark)) runs the
    compiled one-pass kernel (jvm/TextUdfs.java::RollingFp); the default is
    the pure-expression form — F.aggregate over a per-CHARACTER array,
    which Catalyst interprets (~8.4k docs/s at sf0.1; use the JVM path on
    any hot path). Values are identical: F.split(col, "") yields one
    element per code point and F.ascii returns the code point."""
    if jvm:
        from .jvm_sketch import rolling_fp_jvm

        return rolling_fp_jvm(col)
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(FP_BASE) + F.ascii(c)) % F.lit(FP_MOD),
    )


def text_stats(col: Column, jvm: bool = False) -> Column:
    """array<long> [token_count, distinct_token_count, n_chars, n_kept]
    where n_kept counts characters surviving regexp_replace(col,
    "[^0-9A-Za-z\\s]", "") — the four inputs of every text-quality ratio,
    in ONE pass on the JVM path (vs one interpreted HOF pass per stat as
    expressions). Exact value parity between the engines; null -> null."""
    if jvm:
        from .jvm_sketch import text_stats_jvm

        return text_stats_jvm(col)
    return F.when(
        col.isNotNull(),
        F.array(
            token_count(col).cast("long"),
            distinct_token_count(col).cast("long"),
            F.length(col).cast("long"),
            F.length(F.regexp_replace(col, r"[^0-9A-Za-z\s]", "")).cast("long"),
        ),
    )


def quality_score_from_stats(stats: Column) -> Column:
    """quality_score recomputed from a text_stats() array — same formula,
    same float operation order, so the two entry points never disagree."""
    n_tok, n_dis, n, kept = stats[0], stats[1], stats[2], stats[3]
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    ttr = F.when(n_tok > 0, n_dis / n_tok).otherwise(F.lit(0.0))
    punct = F.when(n > 0, (n - kept) / n).otherwise(F.lit(0.0))
    return F.round((len_ok + (1.0 - punct) + ttr) / 3.0, 6)


def marker_spec(markers: dict) -> str:
    """Serialize {lang: [marker, ...]} for the JVM marker-counts kernel
    (insertion order preserved — counts come back in this order)."""
    return "|".join(f"{lg}:{','.join(ws)}" for lg, ws in markers.items())


def lang_marker_counts(col: Column, markers: dict, jvm: bool = False) -> Column:
    """array<long> of marker-token counts, one per language in ``markers``
    insertion order. JVM path: ONE tokenization pass for all languages
    (jvm/TextUdfs.java::MarkerCounts); expression path: one interpreted
    F.filter pass per language (the round-3 lang_id cost)."""
    if jvm:
        from .jvm_sketch import marker_counts_jvm

        return marker_counts_jvm(col, marker_spec(markers))
    return F.array(
        *[lang_marker_score(col, mk).cast("long") for mk in markers.values()]
    )
