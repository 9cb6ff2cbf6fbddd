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
    "lang_marker_score",
    "rolling_fingerprint",
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


def rolling_fingerprint(col: Column) -> Column:
    """Polynomial rolling hash over UTF-8 code units of the text, computed
    JVM-side with F.aggregate: acc = (acc * 31 + ascii(char)) mod 1e9+7.
    DuckDB twin: list_reduce over string_split_regex (see oracle_sql)."""
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(FP_BASE) + F.ascii(c)) % F.lit(FP_MOD),
    )
