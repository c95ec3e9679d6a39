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


def test_deterministic_sample_stable_and_proportional(spark, sf_dir):
    from bunsen_spark.operators.sampling import deterministic_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = deterministic_sample(docs, "doc_id", 0.3)
    b = deterministic_sample(docs, "doc_id", 0.3)
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b  # purely key-derived, run-stable
    n, total = len(ids_a), docs.count()
    assert 0.15 < n / total < 0.45  # ~30% at small n
    # a larger fraction is a superset (nested cutoffs)
    wider = deterministic_sample(docs, "doc_id", 0.6)
    ids_w = {r["doc_id"] for r in wider.select("doc_id").collect()}
    assert set(ids_a) <= ids_w
