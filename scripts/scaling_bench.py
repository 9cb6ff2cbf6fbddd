#!/usr/bin/env python
"""Scaling evidence: the same dedup job at two parallelism levels.

north_rule requires throughput scaling efficiency >= 0.8 between N and 4N
executors; this sandbox has no cluster, so (per the driver brief) we run the
identical job at local[8] and local[32] on the identical input and report
docs/sec at both plus efficiency = T_4N / (4 * T_N).

Each level runs in its OWN subprocess/JVM (no warm-cache contamination).
The measured job is the compute-bound dedup core — MinHash signatures ->
LSH banding -> candidate join -> exact-Jaccard verify -> connected
components — on a deterministic synthetic corpus large enough that fixed
JVM/stage overhead stays below the parallel work (default 40k docs).

Usage: python scripts/scaling_bench.py [n_docs]
Prints one JSON line; also appended by hand to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from fast_er_spark.session import get_spark
from fast_er_spark.operators.lsh import lsh_candidate_pairs
from fast_er_spark.operators.verify import verify_pairs_jaccard
from fast_er_spark.operators.components import connected_components

cpus = int(sys.argv[1]); data = sys.argv[2]
spark = get_spark(f"scaling-{{cpus}}", cpus=cpus, shuffle_partitions=2 * cpus)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(data)
docs = docs.repartition(2 * cpus).cache()
n = docs.count()  # materialize cache: measure compute, not parquet read

t0 = time.perf_counter()
cand = lsh_candidate_pairs(docs, "id", "text", num_perm=128, bands=32,
                           rows_per_band=4, n=3, seed=42)
ver = verify_pairs_jaccard(cand, docs, "id", "text", n=3, threshold=0.8)
clusters = connected_components(ver, nodes=docs.select("id"))
clusters.write.format("noop").mode("overwrite").save()
wall = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "docs": n, "wall_sec": round(wall, 2),
                   "docs_per_sec": round(n / wall, 1)}}))
spark.stop()
"""


def synth_corpus(path: str, n: int, seed: int = 42) -> None:
    """Vectorized (numpy) corpus generator — same shape as fixtures.synth
    pages (token-salad docs + planted near/exact dups) but fast enough for
    the million-doc corpora the scaling run needs. ~30% of docs duplicate
    their predecessor with ~3% token mutations (Jaccard ~0.85-1.0)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = np.array(
        [f"w{i:04d}" for i in range(2000)] + ["the", "a", "of", "and", "data", "web"]
    )
    V = len(vocab)
    writer = None
    chunk = 100_000
    doc_id = 0
    try:
        while doc_id < n:
            m = min(chunk, n - doc_id)
            L = int(rng.integers(120, 220))
            ids = rng.integers(0, V, size=(m, L))
            # plant dups: ~30% of rows copy the previous row with ~3% of
            # positions re-rolled (exact copies when zero positions change)
            dup_mask = rng.random(m) < 0.30
            dup_mask[0] = False
            rows_idx = np.nonzero(dup_mask)[0]
            ids[rows_idx] = ids[rows_idx - 1]
            n_mut = max(1, int(0.03 * L))
            for r in rows_idx[rng.random(len(rows_idx)) < 0.75]:  # 25% stay exact
                pos = rng.integers(0, L, size=n_mut)
                ids[r, pos] = rng.integers(0, V, size=n_mut)
            words = vocab[ids]
            texts = [" ".join(row) for row in words.tolist()]
            tbl = pa.table(
                {
                    "id": pa.array(range(doc_id, doc_id + m), type=pa.int64()),
                    "text": pa.array(texts),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(path, tbl.schema)
            writer.write_table(tbl)
            doc_id += m
    finally:
        if writer is not None:
            writer.close()


def _steal_sec() -> float:
    try:
        return int(open("/proc/stat").readline().split()[8]) / 100.0
    except Exception:
        return 0.0


def run_level(cpus: int, data: str, trials: int = 3) -> dict:
    """Min-of-N trials: this sandbox VM suffers intermittent hypervisor CPU
    steal (observed bursts of 50-200 s of steal during a 60 s job), so a
    single sample can be 2-3x off. Steal seconds per trial are reported so
    the evidence is auditable."""
    script = WORKER.format(repo=REPO)
    best = None
    samples = []
    for _ in range(trials):
        s0 = _steal_sec()
        out = subprocess.run(
            [sys.executable, "-c", script, str(cpus), data],
            capture_output=True, text=True, timeout=1800,
        )
        stolen = round(_steal_sec() - s0, 1)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
        r = json.loads(line[-1])
        r["steal_sec"] = stolen
        samples.append({"wall_sec": r["wall_sec"], "steal_sec": stolen})
        if best is None or r["wall_sec"] < best["wall_sec"]:
            best = r
    best["trials"] = samples
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    with tempfile.TemporaryDirectory(prefix="scaling_corpus_") as td:
        data = os.path.join(td, "corpus.parquet")
        synth_corpus(data, n)
        lo = run_level(8, data)
        hi = run_level(32, data)
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    print(json.dumps({
        "metric": "dedup_scaling_efficiency_8_to_32",
        "n_docs": n,
        "local8": lo,
        "local32": hi,
        "efficiency": round(eff, 3),
        "target": 0.8,
    }))


if __name__ == "__main__":
    main()
