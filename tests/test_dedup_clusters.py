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
