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
