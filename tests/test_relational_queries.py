"""Smoke + shape tests for the relational battery at sf0.001.

Full value-level verification against DuckDB runs via
tools/oracle_check.py (and the driver's own gate at sf0.01).
"""

from __future__ import annotations

from bunsen_spark.queries import all_oracles, all_queries


def test_every_query_has_matching_oracle_or_is_declared_weak():
    qs = all_queries()
    oracles = all_oracles()
    assert set(oracles) <= set(qs)


def test_q1_shape(spark, sf_dir):
    df = all_queries()["q1_pricing_summary"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "count_order",
    ]
    # exact decimal-backed sums must be non-negative and finite
    for r in rows:
        assert r["sum_qty"] >= 0
        assert r["count_order"] > 0


def test_topk_deterministic(spark, sf_dir):
    fn = all_queries()["topk_brands_by_revenue"]
    a = [tuple(r) for r in fn(spark, sf_dir).collect()]
    b = [tuple(r) for r in fn(spark, sf_dir).collect()]
    assert a == b
    assert len(a) == 5


def test_sessionize_counts_cover_all_events(spark, sf_dir):
    df = all_queries()["sessionize_events"](spark, sf_dir)
    total = df.groupBy().sum("n_events").collect()[0][0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events
