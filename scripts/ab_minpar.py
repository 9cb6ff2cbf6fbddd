"""Interleaved A/B of the similarity-family scan-parallelism guard (r6).

HARNESS RECORD: this A/B measured the guard WASH-TO-NEGATIVE on the
embedding family (OPTIMIZATION_r06.md neg-B) and the guard was therefore
NOT applied there — re-running this script now times the unguarded path
under both labels (FAST_ER_MIN_PARALLELISM only gates the call sites that
kept the guard: anchor/token/curation/sketch). Kept as the provenance of
the decision: guard on/off alternated in ONE session over the bench rigs
for embedding_near_dup_lsh (clustered fixture, production config) and
embedding_topk, per-trial steal recorded.

Usage: python scripts/ab_minpar.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from fast_er_spark.session import get_spark  # noqa: E402


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("fast-er-ab-minpar", cpus=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    _warm = F.pandas_udf(lambda x: x.astype("int32"), T.IntegerType())
    spark.range(256).repartition(cpus).select(_warm(F.col("id").cast("int"))).count()

    # clustered fixture, identical to bench.py
    import atexit
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fixtures.synth import embeddings as synth_embeddings

    emb_tbl = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_emb = emb_tbl.count()
    emb_dim = len(emb_tbl.select("embedding").first()[0])
    emb_rows, _ = synth_embeddings(n=n_emb, dim=emb_dim, dup_frac=0.3, seed=7)
    _emb_dir = tempfile.mkdtemp(prefix="ab_emb_")
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

    from fast_er_spark.operators.similarity import embedding_near_dup_pairs

    def run_lsh():
        df = embedding_near_dup_pairs(emb_clustered, dim=emb_dim, threshold=0.9, seed=42)
        df.write.format("noop").mode("overwrite").save()

    def run_topk():
        df = entry_mod.q_embedding_topk(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    for trial in range(n_pairs):
        for flag in ("1", "0"):
            os.environ["FAST_ER_MIN_PARALLELISM"] = flag
            for name, fn in (("near_dup_lsh", run_lsh), ("topk", run_topk)):
                spark.sparkContext.setJobDescription(f"{name} guard={flag} t{trial}")
                s0, t0 = steal(), time.perf_counter()
                fn()
                dt, s1 = time.perf_counter() - t0, steal()
                print(
                    f"trial={trial} guard={flag} {name}: {dt:.3f}s "
                    f"steal={(s1 - s0) / 100.0:.1f}s",
                    flush=True,
                )
    spark.stop()


if __name__ == "__main__":
    main()
