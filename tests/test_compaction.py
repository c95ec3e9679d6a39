"""Unit tests for the deterministic compaction planner."""

from __future__ import annotations

import pytest


def _files(spark, rows):
    return spark.createDataFrame(rows, "part string, fid long, bytes long")


def _plan(spark, rows, target):
    from bunsen_spark.sources.warehouse import plan_compaction

    df = _files(spark, rows)
    out = plan_compaction(
        df, "bytes", target, partition_cols=["part"], order_cols=["fid"]
    )
    return {(r.part, r.fid): r.bin_id for r in out.collect()}


def test_compaction_sequential_packing(spark):
    # target 100: cum-prev 0,60,120,180 -> bins 0,0,1,1
    got = _plan(
        spark,
        [("a", 1, 60), ("a", 2, 60), ("a", 3, 60), ("a", 4, 60)],
        target=100,
    )
    assert got == {("a", 1): 0, ("a", 2): 0, ("a", 3): 1, ("a", 4): 1}


def test_compaction_partitions_independent(spark):
    got = _plan(
        spark,
        [("a", 1, 150), ("a", 2, 10), ("b", 1, 10), ("b", 2, 10)],
        target=100,
    )
    # partition b restarts its cumulative sum
    assert got == {("a", 1): 0, ("a", 2): 1, ("b", 1): 0, ("b", 2): 0}


def test_compaction_bin_sizes_bounded(spark):
    import random

    rng = random.Random(11)
    rows = [("p", i, rng.randint(1, 400)) for i in range(200)]
    target = 1000
    from bunsen_spark.sources.warehouse import plan_compaction

    out = plan_compaction(
        _files(spark, rows), "bytes", target,
        partition_cols=["part"], order_cols=["fid"],
    ).collect()
    sizes = {}
    for r in out:
        sizes[r.bin_id] = sizes.get(r.bin_id, 0) + r.bytes
    max_file = max(b for _, _, b in rows)
    last = max(sizes)
    for bin_id, total in sizes.items():
        # a bin's span is one target window; the previous bin's
        # overshoot can eat into it and its own last file can overshoot
        # past it, so totals land within one max-file of the target on
        # both sides (except the final partial bin)
        assert total < target + max_file
        if bin_id != last:
            assert total > target - max_file


def test_compaction_deterministic_across_partitionings(spark):
    rows = [("p", i, (i * 37) % 500 + 1) for i in range(300)]
    from bunsen_spark.sources.warehouse import plan_compaction

    a = plan_compaction(
        _files(spark, rows).repartition(1), "bytes", 800,
        partition_cols=["part"], order_cols=["fid"],
    )
    b = plan_compaction(
        _files(spark, rows[::-1]).repartition(16), "bytes", 800,
        partition_cols=["part"], order_cols=["fid"],
    )
    assert sorted((r.fid, r.bin_id) for r in a.collect()) == sorted(
        (r.fid, r.bin_id) for r in b.collect()
    )


def test_compaction_rejects_bad_target(spark):
    from bunsen_spark.sources.warehouse import plan_compaction

    with pytest.raises(ValueError):
        plan_compaction(_files(spark, [("a", 1, 1)]), "bytes", 0)


def test_compaction_requires_order_cols(spark):
    # ordering by size alone ties equal-size files -> nondeterministic
    # bin_id across runs; the planner now refuses to run without an
    # explicit deterministic total order (round-6 ADVICE fix)
    from bunsen_spark.sources.warehouse import plan_compaction, plan_compaction_sql

    with pytest.raises(ValueError, match="order_cols"):
        plan_compaction(_files(spark, [("a", 1, 1)]), "bytes", 10)
    with pytest.raises(ValueError, match="order_cols"):
        plan_compaction_sql("SELECT 1", "bytes", 10)
