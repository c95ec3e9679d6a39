"""near_dup_clusters algorithms (VERDICT r2 item 7 / ADVICE): the star
variant must collapse adversarial chains in O(log n) rounds, label
propagation must fail loudly instead of returning unconverged labels,
and all algorithms must agree on the same component-min labels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bunsen_spark.operators.dedup import near_dup_clusters

CHAIN_N = 64


def _chain_pairs(spark, n=CHAIN_N):
    return spark.range(n - 1).select(
        F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id")
    )


def _labels(df):
    return {r["doc_id"]: (r["cluster_id"], r["is_keeper"]) for r in df.collect()}


def test_star_collapses_long_chain_in_log_rounds(spark):
    # diameter 63; log2(64) = 6, so 10 alternations is ample — label
    # propagation would need 63 rounds here
    out = _labels(near_dup_clusters(_chain_pairs(spark), max_iterations=10, algorithm="star"))
    assert len(out) == CHAIN_N
    assert all(cluster == 0 for cluster, _ in out.values())
    assert [d for d, (_, keep) in out.items() if keep] == [0]


def test_label_propagation_raises_instead_of_wrong_labels(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(
            _chain_pairs(spark), max_iterations=5, algorithm="label-propagation"
        )


def test_auto_switches_to_star_on_long_chain(spark):
    out = _labels(near_dup_clusters(_chain_pairs(spark), max_iterations=15))
    assert all(cluster == 0 for cluster, _ in out.values())


def test_algorithms_agree_on_mixed_graph(spark):
    # two components: a triangle {100,101,102} and a pair {7, 9}
    pairs = spark.createDataFrame(
        [(100, 101), (101, 102), (100, 102), (9, 7)], "a_id long, b_id long"
    )
    lp = _labels(near_dup_clusters(pairs, algorithm="label-propagation"))
    star = _labels(near_dup_clusters(pairs, algorithm="star"))
    assert lp == star
    assert lp[100] == (100, True) and lp[102] == (100, False)
    assert lp[7] == (7, True) and lp[9] == (7, False)


def _jobs_in_group(spark, group, fn):
    """Count Spark jobs fn() launches. AQE is disabled for the call —
    adaptive execution splits one action into a job per shuffle stage,
    which would make the count measure AQE, not the algorithm's
    action-per-round shape.

    Auto-broadcast is disabled too: on toy graphs the per-round min
    frame is broadcast-sized and each broadcast exchange materializes
    as its own job at plan-build time — at real scale those joins are
    sort-merge and cost zero build jobs, so counting them here would
    measure the toy, not the shape."""
    sc = spark.sparkContext
    old = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.setJobGroup(group, group)
    try:
        fn()
        return len(list(sc.statusTracker().getJobIdsForGroup(group)))
    finally:
        sc.setJobGroup("tests", "")
        spark.conf.set("spark.sql.adaptive.enabled", old)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_label_propagation_is_one_job_per_round(spark):
    """VERDICT r3 item 7: each LP round must spend ONE job (the lazy
    checkpoint is materialized by the convergence aggregation), not an
    eager-checkpoint job plus a compare-join count. Path graph 1-2-3:
    3 rounds to converge. Jobs = 1 (edges checkpoint) + 3 rounds + 1
    final collect = 5; the old shape spent 8."""
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a_id long, b_id long")
    n = _jobs_in_group(
        spark,
        "lp_jobs",
        lambda: near_dup_clusters(
            pairs, max_iterations=10, algorithm="label-propagation"
        ).collect(),
    )
    assert n <= 5, f"label propagation spent {n} jobs; expected <= 5"


def test_star_is_one_job_per_round(spark):
    """Star rounds likewise: the signature agg materializes both lazy
    star checkpoints — one job per alternation round, plus the edges
    checkpoint, the initial signature, the star-forest invariant check
    and the final collect."""
    pairs = _chain_pairs(spark, 16)  # diameter 15 → a few star rounds
    n = _jobs_in_group(
        spark,
        "star_jobs",
        lambda: near_dup_clusters(pairs, max_iterations=10, algorithm="star").collect(),
    )
    # 5 rounds for n=16; 1 edges ckpt + 1 nodes ckpt + 1 init sig +
    # 5 rounds + 1 invariant + 1 collect = 10 — the old shape spent 3
    # jobs per round (two eager star checkpoints + the signature)
    assert n <= 10, f"star contraction spent {n} jobs; expected <= 10"
