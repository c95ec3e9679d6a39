"""Salted join must be row-identical to the plain join."""

from __future__ import annotations


def test_salted_join_matches_plain(spark, sf_dir):
    from bunsen_spark.operators.skew import salted_join

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")

    plain = lineitem.join(orders, ["l_orderkey"])
    salted = salted_join(lineitem, orders, ["l_orderkey"])
    assert salted.count() == plain.count()
    a = sorted(str(r) for r in plain.collect())
    b = sorted(str(r) for r in salted.select(*plain.columns).collect())
    assert a == b


def test_salted_left_join(spark, sf_dir):
    from bunsen_spark.operators.skew import salted_join

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey"
    ).withColumnRenamed("o_custkey", "c_custkey")
    plain = customer.join(orders, ["c_custkey"], "left")
    salted = salted_join(customer, orders, ["c_custkey"], "left")
    assert salted.count() == plain.count()
