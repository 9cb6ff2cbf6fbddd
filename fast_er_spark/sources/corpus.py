"""Corpus sources/sinks for the BASELINE.json input_hint table:
(url string, warc_ts timestamp, html binary, text string, lang string).

``read_corpus`` is the single entry point the pipeline reads through:
parquet directories or Iceberg tables, with the three filters a crawl-scale
scan actually needs — language, time window, and column projection — applied
DECLARATIVELY so Catalyst pushes them into the scan:

- ``columns`` prunes the ReadSchema (never ship ``html`` bytes through a
  text-only pipeline);
- ``langs`` / ``since`` / ``until`` become data-/partition-filters — on a
  corpus laid out with ``write_corpus(partition_by=["lang"])`` the lang
  filter prunes whole directories before any IO.

``write_corpus`` is the matching sink: schema-validated, partitioned by the
query dimension (lang by default — low cardinality, high selectivity for
per-language pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CORPUS_COLUMNS", "read_corpus", "write_corpus"]

# input_hint schema (BASELINE.json): column -> required Spark type prefix
CORPUS_COLUMNS = {
    "url": "string",
    "warc_ts": "timestamp",
    "html": "binary",
    "text": "string",
    "lang": "string",
}


def _validate(df: DataFrame, required: list[str]) -> DataFrame:
    for c in required:
        if c not in df.columns:
            raise ValueError(f"corpus is missing required column {c!r}")
        want = CORPUS_COLUMNS.get(c)
        if want is not None:
            got = dict(df.dtypes)[c]
            if not got.startswith(want):
                raise TypeError(f"corpus column {c!r} is {got}, expected {want}")
    return df


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    columns: list[str] | None = None,
    langs: list[str] | None = None,
    since=None,
    until=None,
) -> DataFrame:
    """Read a web-page corpus with scan-time pruning.

    ``fmt='parquet'``: ``path`` is a directory (local, s3a://, hdfs://).
    ``fmt='iceberg'``: ``path`` is a ``catalog.namespace.table`` name.
    ``columns``: projection (defaults to all) — reaches the ReadSchema.
    ``langs`` / ``since`` / ``until``: pushed-down filters; on a
    lang-partitioned layout the lang filter is partition pruning.
    """
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "iceberg":
        df = spark.read.table(path)
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
    if langs is not None:
        df = df.where(F.col("lang").isin(list(langs)))
    if since is not None:
        df = df.where(F.col("warc_ts") >= F.lit(since))
    if until is not None:
        df = df.where(F.col("warc_ts") < F.lit(until))
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"corpus is missing required column(s) {missing}")
    return _validate(df.select(*cols), cols)


def write_corpus(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a corpus table partitioned for pruned reads (lang by default)."""
    partition_by = ["lang"] if partition_by is None else partition_by
    _validate(df, [c for c in CORPUS_COLUMNS if c in df.columns] + partition_by)
    if fmt == "parquet":
        df.write.mode(mode).partitionBy(*partition_by).parquet(path)
    elif fmt == "iceberg":
        w = df.writeTo(path).using("iceberg")
        for c in partition_by:
            w = w.partitionedBy(F.col(c))
        w.createOrReplace()
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
