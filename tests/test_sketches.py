"""Sketch operators: error-bound and mergeability contracts.

Sketch outputs are estimator-specific, so they are NOT in the DuckDB
gate; the testable contracts are (a) bounded relative error vs. the
exact twin and (b) merge-equals-all-at-once.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bunsen_spark.operators.sketches import (
    approx_distinct_by,
    approx_quantiles,
    distinct_sketches,
    exact_distinct_by,
    merge_sketches,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_hll_sketch_estimates_within_bound(events):
    got = {
        r["grp"]: r["estimate"]
        for r in distinct_sketches(events, "event_type", "user_id").collect()
    }
    exact = {
        r["grp"]: r["n_distinct"]
        for r in exact_distinct_by(events, "event_type", "user_id").collect()
    }
    assert set(got) == set(exact)
    for g, est in got.items():
        # lg_k=12 → ~1.6% standard error; 5% is > 3 sigma
        assert abs(est - exact[g]) <= max(3, 0.05 * exact[g]), (g, est, exact[g])


def test_hll_sketches_merge_to_global_estimate(events):
    sketches = distinct_sketches(events, "event_type", "user_id")
    merged = merge_sketches(sketches).collect()[0]["estimate"]
    exact = events.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(3, 0.05 * exact)

    # mergeability is exact, not approximate: unioning per-group
    # sketches must equal sketching the ungrouped stream (same state)
    direct = (
        events.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))
            ).cast("long").alias("estimate")
        ).collect()[0]["estimate"]
    )
    assert merged == direct


def test_approx_count_distinct_within_rsd(events):
    approx = {
        r["grp"]: r["approx_distinct"]
        for r in approx_distinct_by(events, "event_type", "user_id", rsd=0.02).collect()
    }
    exact = {
        r["grp"]: r["n_distinct"]
        for r in exact_distinct_by(events, "event_type", "user_id").collect()
    }
    for g, est in approx.items():
        assert abs(est - exact[g]) <= max(3, 0.10 * exact[g]), (g, est, exact[g])


def test_approx_quantiles_rank_error_bounded(events):
    row = approx_quantiles(events, "value", (0.25, 0.50, 0.95)).collect()[0]
    vals = sorted(v["value"] for v in events.select("value").collect())
    n = len(vals)
    # percentile_approx guarantees rank error <= n/accuracy; with
    # accuracy=10000 and n~6k that is exact, so allow a tiny slack only
    for p in (0.25, 0.50, 0.95):
        est = row[f"p{int(p * 100):02d}"]
        lo = vals[max(0, int(n * p) - max(2, n // 1000) - 1)]
        hi = vals[min(n - 1, int(n * p) + max(2, n // 1000))]
        assert lo <= est <= hi, (p, est, lo, hi)


# ---------------------------------------------------------------------------
# count-min sketch (pure-Catalyst cell table)
# ---------------------------------------------------------------------------


def test_countmin_overestimates_never_under(spark):
    from pyspark.sql import functions as F

    from bunsen_spark.operators.sketches import countmin_estimate, countmin_table

    # zipf-ish frequencies: value v appears (50 - v) times
    rows = [(v,) for v in range(50) for _ in range(50 - v)]
    df = spark.createDataFrame(rows, "v int")
    table = countmin_table(df, "v", width=1 << 10, depth=4)
    truth = df.groupBy("v").count()
    est = countmin_estimate(truth, "v", table, width=1 << 10, depth=4)
    bad = est.where(F.col("cm_estimate") < F.col("count")).count()
    assert bad == 0  # never underestimates
    # with 1225 items in a 1024-wide sketch, estimates should be tight
    loose = est.where(F.col("cm_estimate") > F.col("count") + 10).count()
    assert loose == 0


def test_countmin_merge_equals_all_at_once(spark):
    from bunsen_spark.operators.sketches import countmin_merge, countmin_table

    a = spark.range(0, 300).selectExpr("id % 17 as v")
    b = spark.range(300, 700).selectExpr("id % 23 as v")
    merged = countmin_merge(
        countmin_table(a, "v", width=256, depth=3),
        countmin_table(b, "v", width=256, depth=3),
    )
    whole = countmin_table(a.unionByName(b), "v", width=256, depth=3)
    ma = sorted((r.row, r.col, r.cnt) for r in merged.collect())
    wa = sorted((r.row, r.col, r.cnt) for r in whole.collect())
    assert ma == wa


def test_countmin_bounded_cells(spark):
    from bunsen_spark.operators.sketches import countmin_table

    df = spark.range(0, 5000).selectExpr("id as v")
    t = countmin_table(df, "v", width=64, depth=2)
    assert t.count() <= 64 * 2


def test_heavy_hitters_exact_with_prefilter(spark):
    """The CM-prefiltered plan must equal the naive GROUP BY/HAVING:
    no false negatives (CM never underestimates), collisions cleaned
    by the exact HAVING."""
    from bunsen_spark.operators.sketches import heavy_hitters

    rows = (
        [(i, "hot_a") for i in range(30)]
        + [(100 + i, "hot_b") for i in range(10)]
        + [(1000 + i, f"tail_{i}") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "event_id long, k string")
    got = {(r.value, r.n) for r in heavy_hitters(df, "k", 10).collect()}
    assert got == {("hot_a", 30), ("hot_b", 10)}


def test_heavy_hitters_tiny_width_still_exact(spark):
    """Deliberately collision-heavy sketch (width 2): the prefilter
    passes extra tail candidates through, and the exact count still
    removes every one of them."""
    from bunsen_spark.operators.sketches import heavy_hitters

    rows = [(i, "hh") for i in range(20)] + [
        (100 + i, f"t{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "event_id long, k string")
    got = {(r.value, r.n) for r in heavy_hitters(df, "k", 5, width=2, depth=2).collect()}
    assert got == {("hh", 20)}


def test_heavy_hitters_rejects_bad_threshold(spark):
    import pytest

    from bunsen_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([(1, "x")], "event_id long, k string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 0)
