"""Physical-plan inspection helpers — audit what Catalyst actually does.

Used in tests and tuning sessions to assert the plans we want at scale:
filters pushed to the parquet scan, column pruning, broadcast joins where a
side is small, wide WholeStageCodegen spans, bounded exchange counts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["formatted_plan", "plan_stats", "assert_pushed_filter", "assert_broadcast_join"]


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_stats(df: DataFrame) -> dict:
    """Counts of the plan features that matter for scale."""
    plan = formatted_plan(df)
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "codegen_spans": len(re.findall(r"WholeStageCodegen", plan)),
        "python_udfs": len(re.findall(r"ArrowEvalPython|BatchEvalPython", plan)),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "scans": len(re.findall(r"Scan parquet", plan)),
    }


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    stats = plan_stats(df)
    joined = ";".join(stats["pushed_filters"])
    assert fragment in joined, f"filter {fragment!r} not pushed; got {joined!r}"


def assert_broadcast_join(df: DataFrame) -> None:
    stats = plan_stats(df)
    assert stats["broadcast_joins"] >= 1, "expected a broadcast hash join"
