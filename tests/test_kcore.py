"""k-core decomposition: fixpoint peeling vs a Python reference."""

from __future__ import annotations

import random

import pytest


def _py_kcore(edges, k):
    """Reference peeling: repeatedly drop nodes with degree < k."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(ns) for n, ns in adj.items() if ns}


def _spark_kcore(spark, edges, k):
    from bunsen_spark.operators.graph import k_core

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.core_degree for r in k_core(df, k).collect()}


def test_kcore_triangle_with_tail(spark):
    # triangle 1-2-3 plus a tail 3-4-5: 2-core = the triangle
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert _spark_kcore(spark, edges, 2) == {1: 2, 2: 2, 3: 2}


def test_kcore_star_vanishes(spark):
    # a star has no 2-core at all
    edges = [(0, i) for i in range(1, 6)]
    assert _spark_kcore(spark, edges, 2) == {}


def test_kcore_k1_keeps_everything_connected(spark):
    edges = [(1, 2), (3, 4)]
    assert _spark_kcore(spark, edges, 1) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_kcore_self_loops_ignored(spark):
    edges = [(1, 1), (1, 2), (2, 3), (1, 3)]
    assert _spark_kcore(spark, edges, 2) == {1: 2, 2: 2, 3: 2}


@pytest.mark.parametrize("seed", [3, 17])
@pytest.mark.parametrize("k", [2, 3])
def test_kcore_random_matches_reference(spark, seed, k):
    rng = random.Random(seed)
    edges = list(
        {
            (rng.randint(0, 30), rng.randint(0, 30))
            for _ in range(120)
        }
    )
    assert _spark_kcore(spark, edges, k) == _py_kcore(edges, k)


def test_kcore_rejects_bad_k(spark):
    from bunsen_spark.operators.graph import k_core

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        k_core(df, 0)
