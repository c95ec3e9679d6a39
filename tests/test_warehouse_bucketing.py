"""Bucketed-warehouse layout test: co-bucketed tables must join with
zero Exchange in the physical plan (the shuffle was paid once at write
time)."""

from __future__ import annotations

import pytest


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    from bunsen_spark.sources.warehouse import joins_without_shuffle, write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    write_bucketed(orders, "bkt_orders", "o_orderkey", 8, path=str(tmp_path / "o"))
    write_bucketed(lineitem, "bkt_lineitem", "o_orderkey", 8, path=str(tmp_path / "l"))

    assert joins_without_shuffle(spark, "bkt_orders", "bkt_lineitem", ["o_orderkey"])

    # same join over the raw (unbucketed) parquet DOES shuffle
    raw = orders.join(lineitem, "o_orderkey")
    raw_plan = raw._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in raw_plan

    joined = spark.table("bkt_orders").join(spark.table("bkt_lineitem"), "o_orderkey")
    assert joined.count() == lineitem.count()
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
