#!/usr/bin/env python
"""A/B the top-k cosine re-rank: interpreted expression fold vs the
fold-order-exact Arrow kernel (_seq_cos_udf), on the SAME high-volume
candidate frame. Usage: python scripts/bench_rerank.py [n] [dim]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from fast_er_spark.operators.similarity import _dot, _norm, _seq_cos_udf  # noqa: E402
from fast_er_spark.session import get_spark  # noqa: E402


def steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("bench_rerank", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # n candidate pairs with seeded pseudo-random vectors, built JVM-side
    rng_cols = [
        F.array(*[(F.rand(seed=s * 100 + j) * 2 - 1) for j in range(dim)])
        for s in (1, 2)
    ]
    cand = (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id"),
            rng_cols[0].alias("qv"),
            rng_cols[1].alias("cv"),
        )
        .localCheckpoint(eager=True)
    )
    cand.count()

    def run(tag, col):
        best = None
        for _ in range(3):
            s0, t0 = steal(), time.perf_counter()
            cand.select(col.alias("cos")).write.format("noop").mode("overwrite").save()
            dt, st = time.perf_counter() - t0, steal() - s0
            print(f"{tag}: {dt:.2f}s (steal {st:.1f}s)")
            best = dt if best is None else min(best, dt)
        return best

    expr = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    arrow = _seq_cos_udf()(F.col("qv"), F.col("cv"))
    e = run("expression fold", expr)
    a = run("arrow seq-cos  ", arrow)
    # value parity spot check
    both = cand.limit(2000).select(
        expr.alias("e"),
        _seq_cos_udf()(F.col("qv"), F.col("cv")).alias("a"),
    ).collect()
    mism = sum(1 for r in both if r["e"] != r["a"])
    print(f"min expr={e:.2f}s arrow={a:.2f}s speedup={e/a:.2f}x "
          f"bit-mismatches={mism}/2000 (n={n}, dim={dim})")
    spark.stop()


if __name__ == "__main__":
    main()
