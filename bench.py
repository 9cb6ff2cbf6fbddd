#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extras (inside the same JSON line, driver ignores unknown keys):
  - docs_per_sec: dedup-pipeline throughput (documents / dedup wall time)
  - cpus: parallelism level used (for the N-vs-4N scaling evidence, run with
    SPARK_GRAFT_CPUS=8 and =32 and compare docs_per_sec; see BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from fast_er_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "minhash_lsh_dedup",
    "cc_clusters",
    "token_jaccard_pairs",
    "exact_dedup_pairs",
    "substring_anchor_pairs",
    "fs_pattern_counts",
    "fuzzy_jw_supplier",
    "tokenstats",
    "doc_fingerprint",
    "lang_id",
    "embedding_topk",
    "events_hourly",
    "tpch_q1",
    "top_customers",
    "orders_running_sum",
]

DEDUP_QUERIES = {"minhash_lsh_dedup", "cc_clusters", "token_jaccard_pairs",
                 "exact_dedup_pairs", "substring_anchor_pairs"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("fast-er-spark-bench", cpus=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entry_mod.queries()

    # JVM/codegen warm-up so per-query numbers measure the plan, not startup
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}
    dedup_wall = 0.0
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for name in HEADLINE:
        t0 = time.perf_counter()
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        if name in DEDUP_QUERIES:
            dedup_wall += dt

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "docs_per_sec": round(n_docs / dedup_wall, 1) if dedup_wall else None,
        "dedup_wall_sec": round(dedup_wall, 3),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
