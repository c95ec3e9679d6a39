"""PageRank operator: semantics on a hand-checked graph + invariants."""

from __future__ import annotations

import pytest

from bunsen_spark.operators.graph import DAMPING_PCT, SCALE, pagerank


@pytest.fixture(scope="module")
def star_ranks(spark):
    # 1→3, 2→3, 3→1: node 3 receives from two sources, 1 from one, 2
    # from none
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 1)], ["src", "dst"]
    )
    rows = pagerank(edges, iters=1).collect()
    return {r["node"]: r["rank_q"] for r in rows}


def test_pagerank_one_iteration_hand_computed(star_ranks):
    n = 3
    init = SCALE // n
    base = ((SCALE * (100 - DAMPING_PCT)) // 100) // n
    # node 2: no incoming
    assert star_ranks[2] == base
    # node 1: incoming from 3 (deg 1)
    assert star_ranks[1] == base + (init // 1) * DAMPING_PCT // 100
    # node 3: incoming from 1 and 2 (deg 1 each)
    assert star_ranks[3] == base + (2 * (init // 1)) * DAMPING_PCT // 100


@pytest.mark.slow
def test_pagerank_mass_is_bounded_and_sink_accumulates(spark):
    # chain with a cycle: 1→2→3→1 plus feeder 4→1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], ["src", "dst"]
    )
    rows = pagerank(edges, iters=5).collect()
    ranks = {r["node"]: r["rank_q"] for r in rows}
    assert set(ranks) == {1, 2, 3, 4}
    # total mass stays <= 1 (simplified PR floors and damps away mass)
    assert sum(ranks.values()) <= SCALE
    # the feeder (no incoming) is strictly the lowest; every cycle node
    # outranks it (mass circulates inside the cycle, 4 only leaks out).
    # Note ranks within the cycle oscillate by iteration parity, so no
    # claim is made about which cycle node leads at iters=5.
    assert all(ranks[c] > ranks[4] for c in (1, 2, 3))


@pytest.mark.slow
def test_pagerank_deterministic_across_partitionings(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7) % 20) for i in range(20)], ["src", "dst"]
    ).where("src != dst")
    a = sorted(map(tuple, pagerank(edges, iters=3).select("node", "rank_q").collect()))
    b = sorted(
        map(
            tuple,
            pagerank(edges.repartition(7), iters=3)
            .select("node", "rank_q")
            .collect(),
        )
    )
    assert a == b


def test_pagerank_rejects_zero_iters(spark):
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(edges, iters=0)


def test_triangle_count_known_graph(spark):
    """K4 minus one edge has exactly 2 triangles; nodes on the missing
    edge sit in 1 each, the shared diagonal nodes in 2 each. Dirty
    input (reversed duplicates, self-loops) must not change counts."""
    from bunsen_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 1),          # triangle 1-2-3
            (2, 4), (4, 3),                  # triangle 2-3-4 via 2-3
            (3, 2),                          # reversed duplicate
            (4, 4),                          # self-loop: ignored
            (5, 6),                          # edge in no triangle
        ],
        "u long, v long",
    )
    got = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_count_no_triangles(spark):
    from bunsen_spark.operators.graph import triangle_count

    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "u long, v long")
    assert triangle_count(path).count() == 0
