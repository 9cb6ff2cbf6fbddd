#!/usr/bin/env python
"""Per-SQL-node metric dump for the counts-phase execution of the reference
workload. Diagnostic only. Usage: python scripts/profile_sql_nodes.py [n]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    import pandas as pd

    from fast_er_spark.linkage import Comparison
    from fast_er_spark.operators.agreement import pattern_counts
    from fast_er_spark.session import get_spark
    from fixtures.synth import voters

    os.environ["SPARK_UI_ENABLED"] = "true"
    spark = get_spark("profile_sql", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    rows_a, rows_b = voters(n=n, overlap=0.5, seed=42)
    df_a = spark.createDataFrame(pd.DataFrame(rows_a)).localCheckpoint()
    df_b = spark.createDataFrame(pd.DataFrame(rows_b)).localCheckpoint()

    FUZZY = ["last_name", "first_name", "house_number", "street_name"]
    EXACT = ["birth_year"]
    comp = Comparison(df_a, df_b, FUZZY, FUZZY, EXACT, EXACT).fit()
    t = time.perf_counter()
    hist = pattern_counts(comp._sparse).collect()
    print(f"counts execution: {time.perf_counter() - t:.1f}s, {len(hist)} patterns")

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/sql?details=true&planDescription=false&length=200"
    ) as r:
        execs = json.loads(r.read())
    big = max(execs, key=lambda e: e.get("duration", 0))
    print(f"\nexecution {big['id']} duration={big['duration']/1000:.1f}s status={big['status']}")
    for node in big.get("nodes", []):
        ms = {m["name"]: m["value"] for m in node.get("metrics", [])}
        interesting = {
            k: v
            for k, v in ms.items()
            if any(
                s in k
                for s in (
                    "time total",  # codegen / agg / join time
                    "number of output rows",
                    "spill",
                    "time in aggregation",
                    "avg hash probe",
                    "build time",
                    "shuffle write time",
                    "fetch wait",
                    "records read",
                    "sort time",
                    "time to build",
                    "time to broadcast",
                    "cache hits",
                    "writing time",
                )
            )
        }
        if interesting:
            print(f"  [{node['nodeId']:>3}] {node['nodeName'][:46]:<46} {interesting}")
    spark.stop()


if __name__ == "__main__":
    main()
