"""Interleaved A/B of fused-sketch materialization variants (round 6).

HARNESS RECORD: the winning variant (spread + eager checkpoint) was BAKED
into ``__spark_entry__._fused_sketch_frame`` after this A/B decided it
(OPTIMIZATION_r06.md item 3), and the FAST_ER_SKETCH_* env knobs were
removed — re-running this script now times the baked variant under every
label. Kept as the provenance of the measurement: variants were alternated
in ONE session (same-window evidence, per-trial steal recorded):
  base   : no spread, lazy checkpoint (round-start shape)
  spread : ensure_min_parallelism before the kernel, lazy checkpoint
  eager  : spread + eager checkpoint
over q_minhash_lsh_dedup and q_curation_pipeline.

Usage: python scripts/ab_sketch.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from fast_er_spark.session import get_spark  # noqa: E402

VARIANTS = {
    "base": {"FAST_ER_SKETCH_SPREAD": "0", "FAST_ER_SKETCH_EAGER": "0"},
    "spread": {"FAST_ER_SKETCH_SPREAD": "1", "FAST_ER_SKETCH_EAGER": "0"},
    "eager": {"FAST_ER_SKETCH_SPREAD": "1", "FAST_ER_SKETCH_EAGER": "1"},
}


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("fast-er-ab-sketch", cpus=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    _warm = F.pandas_udf(lambda x: x.astype("int32"), T.IntegerType())
    spark.range(256).repartition(cpus).select(_warm(F.col("id").cast("int"))).count()
    from fast_er_spark.functions.jvm_sketch import ensure_jvm_udfs, shingle_hashes_jvm

    if ensure_jvm_udfs(spark):
        spark.range(64).selectExpr("cast(id as string) t").select(
            shingle_hashes_jvm("t", 3)
        ).count()

    for r in range(n_rounds):
        for vname, env in VARIANTS.items():
            os.environ.update(env)
            for qname in ("minhash_lsh_dedup", "curation_pipeline"):
                spark.sparkContext.setJobDescription(f"{qname} {vname} r{r}")
                s0, t0 = steal(), time.perf_counter()
                df = entry_mod.queries()[qname](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt, s1 = time.perf_counter() - t0, steal()
                print(
                    f"round={r} variant={vname} {qname}: {dt:.3f}s "
                    f"steal={(s1 - s0) / 100.0:.1f}s",
                    flush=True,
                )
    spark.stop()


if __name__ == "__main__":
    main()
