"""MJS SimHash pair generation: brute-force parity, the exact collision
guarantee, and the hot-bucket fixture the round-2 design failed (recall must
degrade gracefully, never collapse to zero)."""

import numpy as np
import pytest

from fast_er_spark.operators.simhash_pairs import (
    simhash_block_layout,
    simhash_block_tables,
    simhash_near_pairs,
)
from fast_er_spark.plans.inspect import formatted_plan


def _brute_pairs(fps: list[int], hamming_max: int, blocks: int, key_blocks: int):
    """All pairs within hamming_max that share at least one table key —
    the operator's exact contract (clique path)."""
    layout = simhash_block_layout(blocks)
    tables = simhash_block_tables(blocks, key_blocks)

    def keys(fp):
        out = []
        for combo in tables:
            k = 0
            shift = 0
            for bi in combo:
                off, wdt = layout[bi]
                k |= ((fp >> off) & ((1 << wdt) - 1)) << shift
                shift += wdt
            out.append(k)
        return out

    ks = [keys(f) for f in fps]
    got = {}
    for i in range(len(fps)):
        for j in range(i):
            if any(a == b for a, b in zip(ks[i], ks[j])):
                h = bin((fps[i] ^ fps[j]) & ((1 << 64) - 1)).count("1")
                if h <= hamming_max:
                    got[(i, j)] = h
    return got


def _to_i64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


@pytest.fixture(scope="module")
def fp_df(spark):
    rng = np.random.default_rng(5)
    fps = [int(x) for x in rng.integers(0, 1 << 64, size=150, dtype=np.uint64)]
    # plant near-dup clusters: flip <=3 random bits off a base
    for i in range(0, 60, 3):
        base = fps[i]
        for d in (1, 2):
            flips = rng.integers(0, 64, size=int(rng.integers(1, 4)))
            v = base
            for b in flips:
                v ^= 1 << int(b)
            fps[i + d] = v
    df = spark.createDataFrame(
        [(i, _to_i64(f)) for i, f in enumerate(fps)], "id long, fp long"
    )
    return df, fps


@pytest.mark.parametrize("blocks,key_blocks", [(4, 1), (6, 3)])
def test_parity_with_bruteforce(spark, fp_df, blocks, key_blocks):
    df, fps = fp_df
    expect = _brute_pairs(fps, 6, blocks, key_blocks)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(
            df, "id", "fp", hamming_max=6, blocks=blocks, key_blocks=key_blocks,
            allow_missed_pairs=True,
        ).collect()
    }
    assert got == expect and len(expect) > 10


def test_mjs_guarantee_hamming_k(spark):
    """blocks=6, key_blocks=3: every pair with <=3 differing bits MUST
    collide in some table (3 errors hit <=3 blocks; C(6,3) includes a
    combination of 3 clean blocks)."""
    rng = np.random.default_rng(9)
    rows, want = [], set()
    for i in range(40):
        base = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        flips = rng.choice(64, size=3, replace=False)
        v = base
        for b in flips:
            v ^= 1 << int(b)
        rows += [(2 * i, _to_i64(base)), (2 * i + 1, _to_i64(v))]
        want.add((2 * i + 1, 2 * i))
    df = spark.createDataFrame(rows, "id long, fp long")
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            df, "id", "fp", hamming_max=3, blocks=6, key_blocks=3
        ).collect()
    }
    assert want <= got


def test_hot_bucket_recall_does_not_collapse(spark):
    """The round-2 failure mode: >max_bucket_size docs share a block value.
    Old design dropped the whole block (zero recall); the MJS sorted-window
    path must still find the planted adjacent duplicates."""
    rng = np.random.default_rng(11)
    rows, want = [], set()
    # 300 docs all sharing block 0 (low 16 bits identical) >> cap of 64
    shared_low = 0xBEEF
    for i in range(150):
        hi = int(rng.integers(0, 1 << 47, dtype=np.uint64))
        base = (hi << 17) | shared_low
        dup = base ^ (1 << 40)  # hamming 1, same block 0
        rows += [(2 * i, _to_i64(base)), (2 * i + 1, _to_i64(dup))]
        want.add((2 * i + 1, 2 * i))
    df = spark.createDataFrame(rows, "id long, fp long")
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            df, "id", "fp", hamming_max=6, blocks=4, key_blocks=1,
            max_bucket_size=64, scan_window=8, allow_missed_pairs=True,
        ).collect()
    }
    recall = len(got & want) / len(want)
    assert recall >= 0.95, f"hot-bucket recall {recall}"


def test_guarantee_violation_raises(spark):
    """A config whose MJS guarantee is weaker than hamming_max must be an
    explicit opt-in, not a silent recall hole."""
    df = spark.createDataFrame([(0, 1), (1, 2)], "id long, fp long")
    with pytest.raises(ValueError, match="allow_missed_pairs"):
        simhash_near_pairs(df, "id", "fp", hamming_max=6, blocks=4, key_blocks=1)


def test_no_cross_join_and_no_python(spark, fp_df):
    df, _ = fp_df
    plan = formatted_plan(simhash_near_pairs(df, "id", "fp"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
