"""SimHash near-duplicate pair generation that survives an unbounded corpus.

Replaces the round-2 fixed 4x16-bit block equi-join, whose key universe is
capped at 2^16 per block: at 10^8+ docs every block value holds thousands of
docs (m^2 join fan-out), and the old hot-block *drop* guard made recall
collapse to zero exactly when the data got big. This is the
Manku-Jain-Sarma design (WWW'07, "Detecting Near-Duplicates for Web
Crawling" — public algorithm, re-derived here):

- the 64-bit fingerprint is split into ``blocks`` equal blocks; each table
  is one combination of ``key_blocks`` blocks permuted to the front, and
  the table key is those blocks' bits concatenated. Pairs within Hamming
  distance k whose differing bits avoid some combination's blocks are
  GUARANTEED to collide in that table: choose (blocks, key_blocks) with
  ``blocks - key_blocks >= k_blocks_hit`` (e.g. blocks=6, key_blocks=3
  gives C(6,3)=20 tables with 32-bit keys and an exact guarantee for
  Hamming <= 3; the classic MJS operating point for f=64).
- within a (table, key) bucket, members are processed by bucket size:
  buckets at or under ``max_bucket_size`` emit the full clique; HOT buckets
  degrade to sorted-window adjacency — members are sorted by the full
  fingerprint and each pairs with its next ``scan_window`` neighbors, so
  fan-out is O(m * scan_window) per bucket and the candidates kept are the
  *nearest fingerprints in prefix order* (graceful recall decay), never a
  wholesale drop. Identical fingerprints sort adjacent, so exact-dup runs
  inside a hot bucket stay connected through chains of window pairs.

Everything is JVM-side (bit ops, window leads, array expressions) — no
Python anywhere in the pair path.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["simhash_block_layout", "simhash_block_tables", "simhash_near_pairs"]


def simhash_block_layout(blocks: int) -> list[tuple[int, int]]:
    """(bit_offset, width) per block: near-equal split of the 64 bits, the
    first ``64 mod blocks`` blocks one bit wider (MJS uses unequal blocks
    too — f=64 does not divide evenly into 6)."""
    if not 2 <= blocks <= 64:
        raise ValueError("blocks must be in [2, 64]")
    base, extra = divmod(64, blocks)
    layout = []
    off = 0
    for i in range(blocks):
        wdt = base + (1 if i < extra else 0)
        layout.append((off, wdt))
        off += wdt
    return layout


def simhash_block_tables(blocks: int = 4, key_blocks: int = 1) -> list[tuple[int, ...]]:
    """The MJS table design: every combination of ``key_blocks`` of the
    ``blocks`` fingerprint blocks."""
    if not 1 <= key_blocks <= blocks:
        raise ValueError("key_blocks must be in [1, blocks]")
    return list(combinations(range(blocks), key_blocks))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    fp_col: str,
    hamming_max: int = 3,
    blocks: int = 6,
    key_blocks: int = 3,
    max_bucket_size: int = 4000,
    scan_window: int = 8,
    allow_missed_pairs: bool = False,
) -> DataFrame:
    """(id_a, id_b, hamming) with id_a > id_b for pairs within
    ``hamming_max`` that share a table key (see module docstring for the
    guarantee and the hot-bucket degradation contract).

    The MJS collision guarantee requires ``blocks - key_blocks >=
    min(hamming_max, blocks)``: ``hamming_max`` differing bits can touch up
    to that many blocks, and a pair only collides if some combination of
    ``key_blocks`` blocks avoids ALL of them. Defaults (3, 6, 3) are the
    classic MJS f=64 operating point — C(6,3)=20 tables, ~32-bit keys,
    every Hamming<=3 pair guaranteed. A configuration that silently misses
    pairs (e.g. hamming_max=6 with blocks=4: diffs spread over all 4
    blocks never collide) raises unless ``allow_missed_pairs=True``."""
    if min(hamming_max, blocks) > blocks - key_blocks and not allow_missed_pairs:
        raise ValueError(
            f"(blocks={blocks}, key_blocks={key_blocks}) only guarantees "
            f"collisions for Hamming <= {blocks - key_blocks}, not "
            f"hamming_max={hamming_max}; pass allow_missed_pairs=True to "
            "accept best-effort recall above that"
        )
    layout = simhash_block_layout(blocks)
    tables = simhash_block_tables(blocks, key_blocks)

    def block(bi: int):
        off, wdt = layout[bi]
        return F.shiftrightunsigned(F.col("fp"), off).bitwiseAND(F.lit((1 << wdt) - 1))

    keys = []
    for combo in tables:
        k = F.lit(0).cast("long")
        shift = 0
        for bi in combo:
            k = k.bitwiseOR(F.shiftleft(block(bi), shift))
            shift += layout[bi][1]
        keys.append(k)

    base = df.select(F.col(id_col).alias("id"), F.col(fp_col).alias("fp"))
    banded = base.select(
        "id", "fp", F.posexplode(F.array(*keys)).alias("tbl", "key")
    ).withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("tbl", "key"))
    )

    # small buckets: full clique via one sorted collect per bucket (bounded
    # by max_bucket_size rows) — groupBy reuses the window's partitioning
    small = (
        banded.where(F.col("cnt") <= max_bucket_size)
        .groupBy("tbl", "key")
        .agg(F.sort_array(F.collect_list(F.struct("fp", "id"))).alias("ms"))
        .where(F.size("ms") >= 2)
    )
    ms = F.col("ms")
    clique = small.select(
        F.explode(
            F.flatten(
                F.transform(
                    ms,
                    lambda x, i: F.transform(
                        F.slice(ms, i + 2, F.size(ms)),
                        lambda y: F.struct(
                            x["id"].alias("id_x"),
                            x["fp"].alias("fp_x"),
                            y["id"].alias("id_y"),
                            y["fp"].alias("fp_y"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_x", "p.fp_x", "p.id_y", "p.fp_y")

    # hot buckets: sorted-window adjacency — one sort per bucket (spillable,
    # never m^2), each member pairs with its next scan_window neighbors in
    # fingerprint order
    ws = Window.partitionBy("tbl", "key").orderBy("fp", "id")
    leads = F.array(
        *[
            F.struct(
                F.lead("id", d).over(ws).alias("id_y"),
                F.lead("fp", d).over(ws).alias("fp_y"),
            )
            for d in range(1, scan_window + 1)
        ]
    )
    hot = (
        banded.where(F.col("cnt") > max_bucket_size)
        # window leads first (generators cannot share a projection with
        # window expressions), explode in a second projection
        .select(F.col("id").alias("id_x"), F.col("fp").alias("fp_x"), leads.alias("ns"))
        .select("id_x", "fp_x", F.explode("ns").alias("n"))
        .where(F.col("n.id_y").isNotNull())
        .select("id_x", "fp_x", F.col("n.id_y"), F.col("n.fp_y"))
    )

    cand = clique.unionByName(hot)
    return (
        cand.withColumn("hamming", F.bit_count(F.col("fp_x").bitwiseXOR(F.col("fp_y"))))
        .where(F.col("hamming") <= hamming_max)
        .select(
            F.greatest("id_x", "id_y").alias("id_a"),
            F.least("id_x", "id_y").alias("id_b"),
            F.col("hamming").cast("int"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
