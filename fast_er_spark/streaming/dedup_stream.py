"""Structured Streaming dedup operators.

The reference is batch-only (SURVEY.md §2: no streaming anywhere), so this is
an engine EXTENSION for continuous ingestion: as new pages land, drop exact
repeats and surface near-dup candidates against the in-stream window.

- ``streaming_exact_dedup``: content-fingerprint dropDuplicates with an
  event-time watermark — state is bounded by the watermark horizon, the
  standard production pattern for exact dedup on a firehose.
- ``streaming_dup_rate``: tumbling-window duplicate-rate monitoring
  (watermarked windowed agg) — the pipeline-health metric a 100 TB ingest
  job alarms on.

Both are pure readStream-compatible transforms; tests drive them with a file
source + availableNow trigger (micro-batch replay of the fixture corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_exact_dedup", "streaming_dup_rate"]


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence of each content fingerprint within the watermark
    horizon; later exact repeats are dropped. State size ~ distinct docs per
    horizon, not per stream lifetime."""
    fp = F.xxhash64(F.col(text_col))
    return (
        stream.withColumn("content_fp", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_fp"])
    )


def streaming_dup_rate(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """(window, n_docs, n_distinct, dup_rate) per tumbling event-time window."""
    return (
        stream.withColumn("content_fp", F.xxhash64(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.approx_count_distinct("content_fp").alias("n_distinct"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_docs",
            "n_distinct",
            F.round(1.0 - F.col("n_distinct") / F.col("n_docs"), 4).alias("dup_rate"),
        )
    )
