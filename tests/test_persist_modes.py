"""Materialization policy (`bunsen_spark/persist.py`): the
checkpoint and persist modes must be behaviorally identical — the mode
only trades failure-recovery semantics (lineage kept vs truncated), so
every operator that materializes intermediate state must return the
same rows under both. Advisor r4 flagged unconditional localCheckpoint
as an executor-loss robustness regression on clusters; `materialize`
gates it behind `spark.bunsen.materialize.mode` (auto: checkpoint on
local masters, persist elsewhere)."""

from __future__ import annotations

import pytest

from bunsen_spark.persist import MODE_CONF, materialize


@pytest.fixture
def persist_mode(spark):
    spark.conf.set(MODE_CONF, "persist")
    yield spark
    spark.conf.set(MODE_CONF, "auto")


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank now"),
        (3, "completely different text about spark distributed query planning engines"),
        (4, "another unrelated parquet shuffle story for the cluster scheduler"),
        (5, "the quick brown fox jumps over the lazy dog near the river bank today ok"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mode_results(spark, fn):
    out = {}
    for mode in ("checkpoint", "persist"):
        spark.conf.set(MODE_CONF, mode)
        try:
            out[mode] = fn()
        finally:
            spark.conf.set(MODE_CONF, "auto")
    return out["checkpoint"], out["persist"]


def test_auto_mode_is_checkpoint_on_local(spark):
    df = spark.range(3)
    spark.conf.set(MODE_CONF, "auto")
    out = materialize(df)
    # localCheckpoint truncates lineage -> plan contains a scan of an
    # existing RDD once evaluated; persist would show InMemoryRelation
    out.collect()
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in plan


def test_persist_mode_uses_cache_not_checkpoint(persist_mode):
    spark = persist_mode
    df = spark.range(3)
    out = materialize(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan


def test_invalid_mode_raises(spark):
    spark.conf.set(MODE_CONF, "bogus")
    try:
        with pytest.raises(ValueError):
            materialize(spark.range(1))
    finally:
        spark.conf.set(MODE_CONF, "auto")


def test_near_dup_clusters_identical_across_modes(spark):
    from bunsen_spark.operators.dedup import minhash_lsh_pairs, near_dup_clusters

    def run():
        pairs = minhash_lsh_pairs(_docs(spark), threshold=0.5)
        return sorted(
            (r.doc_id, r.cluster_id) for r in near_dup_clusters(pairs).collect()
        )

    a, b = _mode_results(spark, run)
    assert a == b and a


def test_pagerank_identical_across_modes(spark):
    from bunsen_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)], "src long, dst long"
    )

    def run():
        return sorted(
            (r.node, r.rank_q) for r in pagerank(edges, iters=3).collect()
        )

    a, b = _mode_results(spark, run)
    assert a == b and a


def test_transitive_closure_identical_across_modes(spark):
    from bunsen_spark.operators.hierarchies import transitive_closure

    edges = spark.createDataFrame(
        [("s", "a", "s", "b"), ("s", "b", "s", "c"), ("s", "c", "s", "d"), ("s", "x", "s", "y")],
        "ancestorSystem string, ancestorValue string, "
        "descendantSystem string, descendantValue string",
    )

    def run():
        return sorted(
            (r.ancestorValue, r.descendantValue)
            for r in transitive_closure(edges).collect()
        )

    a, b = _mode_results(spark, run)
    assert a == b and ("a", "d") in a


def test_materialize_all_returns_pinned_frames_both_modes(spark):
    """r13 gang barrier: `materialize_all` must return each frame's own
    rows (not a union), already computed, in both modes — it is the
    one-job replacement for serial materialize_eager calls on
    independent map-only fan-out frames (persist.py residue rule)."""
    from bunsen_spark.persist import materialize_all

    def run():
        a = spark.range(4).selectExpr("id", "id * 2 AS x")
        b = spark.range(3).selectExpr("id", "id + 10 AS y")
        ma, mb = materialize_all(a, b)
        return (
            sorted(tuple(r) for r in ma.collect()),
            sorted(tuple(r) for r in mb.collect()),
        )

    (ca, cb), (pa, pb) = _mode_results(spark, run)
    assert ca == pa == [(0, 0), (1, 2), (2, 4), (3, 6)]
    assert cb == pb == [(0, 10), (1, 11), (2, 12)]


def test_materialize_all_is_one_job(spark):
    """The gang barrier must cost ONE job for N frames (the union
    probe), not N materialization jobs."""
    from bunsen_spark.persist import materialize_all

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    spark.conf.set(MODE_CONF, "checkpoint")
    try:
        sc.setJobGroup("gang_probe", "gang materialize")
        materialize_all(
            spark.range(5).selectExpr("id AS a"),
            spark.range(5).selectExpr("id AS b"),
            spark.range(5).selectExpr("id AS c"),
        )
        jobs = tracker.getJobIdsForGroup("gang_probe")
        # one ACTION — AQE may split the count into a stage job plus
        # the final job, but the bound must stay below one job per
        # frame (three serial materialize_eager calls would spend >= 3)
        assert len(jobs) <= 2, f"gang barrier spent {len(jobs)} jobs"
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set(MODE_CONF, "auto")
