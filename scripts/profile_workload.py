#!/usr/bin/env python
"""One instrumented run of the reference 100k x 100k workload: phase timers
plus a per-stage breakdown pulled from the local Spark UI REST API at the
end. Diagnostic only (not part of the bench protocol — single trial, no
min-of-N; check the printed steal before believing any number).

Usage: python scripts/profile_workload.py [n]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def steal_sec() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    import pandas as pd
    from pyspark.sql import functions as F

    from fast_er_spark.linkage import Comparison, Estimation, Linkage
    from fast_er_spark.session import get_spark
    from fixtures.synth import voters

    s_all0 = steal_sec()
    os.environ["SPARK_UI_ENABLED"] = "true"  # stage REST API (session.py hook)
    spark = get_spark("profile_workload", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    rows_a, rows_b = voters(n=n, overlap=0.5, seed=42)
    df_a = spark.createDataFrame(pd.DataFrame(rows_a)).localCheckpoint()
    df_b = spark.createDataFrame(pd.DataFrame(rows_b)).localCheckpoint()

    FUZZY = ["last_name", "first_name", "house_number", "street_name"]
    EXACT = ["birth_year"]

    phases = {}
    t0 = time.perf_counter()
    comp = Comparison(df_a, df_b, FUZZY, FUZZY, EXACT, EXACT)
    phases["init_row_ids"] = time.perf_counter() - t0

    t = time.perf_counter()
    comp.fit()
    phases["fit_lazy"] = time.perf_counter() - t

    t = time.perf_counter()
    counts = comp.counts()
    phases["counts_execution"] = time.perf_counter() - t

    t = time.perf_counter()
    est = Estimation(len(FUZZY), len(EXACT), counts, seed=13).fit()
    phases["em"] = time.perf_counter() - t

    t = time.perf_counter()
    linked = Linkage(None, None, comp, est.ksi).transform(0.85)
    agg = linked.agg(
        F.count(F.lit(1)).alias("n_linked"),
        F.sum((F.col("ncid_A") == F.col("ncid_B")).cast("long")).alias("n_true"),
    ).collect()[0]
    phases["transform"] = time.perf_counter() - t
    phases["total"] = time.perf_counter() - t0
    steal = steal_sec() - s_all0

    # ---- stage dump from the UI REST API
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.loads(r.read())
    done = [s for s in stages if s["status"] == "COMPLETE"]
    done.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(json.dumps({"phases": {k: round(v, 2) for k, v in phases.items()},
                      "steal_sec": round(steal, 1),
                      "n_linked": int(agg["n_linked"])}))
    print("\ntop stages by executorRunTime (sec of core-time; wall ~ /32):")
    for s in done[:14]:
        print(
            f"  stage {s['stageId']:>3} tasks={s['numCompleteTasks']:>4} "
            f"run={s['executorRunTime']/1000:8.1f}s "
            f"cpu={s.get('executorCpuTime', 0)/1e9:8.1f}s "
            f"shufW={s.get('shuffleWriteBytes', 0)/1e6:8.0f}MB "
            f"shufR={s.get('shuffleReadBytes', 0)/1e6:8.0f}MB "
            f"in={s.get('inputBytes', 0)/1e6:6.0f}MB "
            f"| {s['name'].splitlines()[0][:70]}"
        )

    # wall timeline: stage occupancy vs gaps (driver/planning/broadcast time)
    from datetime import datetime

    def ts(x):
        return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    spans = sorted(
        (ts(s["firstTaskLaunchedTime"]), ts(s["completionTime"]), s["stageId"])
        for s in done
        if s.get("firstTaskLaunchedTime") and s.get("completionTime")
    )
    if spans:
        t_start, t_end = spans[0][0], max(e for _, e, _ in spans)
        merged, cur_s, cur_e = [], spans[0][0], spans[0][1]
        for s0, e0, _ in spans[1:]:
            if s0 <= cur_e:
                cur_e = max(cur_e, e0)
            else:
                merged.append((cur_s, cur_e))
                cur_s, cur_e = s0, e0
        merged.append((cur_s, cur_e))
        occ = sum(e - s for s, e in merged)
        print(f"\nstage-occupied wall {occ:.1f}s of {t_end - t_start:.1f}s span "
              f"(gaps: {t_end - t_start - occ:.1f}s between stages)")
        prev_e = None
        for s0, e0, sid in spans:
            if prev_e is not None and s0 - prev_e > 0.4:
                print(f"    gap {s0 - prev_e:5.1f}s before stage {sid}")
            prev_e = max(prev_e or e0, e0)
    spark.stop()


if __name__ == "__main__":
    main()
