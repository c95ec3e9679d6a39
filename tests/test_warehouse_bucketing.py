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


def test_fhir_warehouse_bucketed_by_subject(spark, tmp_path):
    """VERDICT r1 item 10: save_as_database(bucket_by_subject=True)
    colocates patient-level tables — patients ⋈ observations runs with
    no Exchange on either side."""
    from bunsen_spark.sources.bundles import (
        SUBJECT_KEY,
        load_from_directory,
        save_as_database,
    )
    from bunsen_spark.sources.warehouse import joins_without_shuffle

    spark.sql("DROP DATABASE IF EXISTS fhir_bucketed CASCADE")
    bundles = load_from_directory(spark, "fixtures/bundles/json")
    save_as_database(
        spark,
        bundles,
        "fhir_bucketed",
        "Patient",
        "Observation",
        path=str(tmp_path / "fhirdb"),
        bucket_by_subject=True,
        num_buckets=8,
    )
    assert joins_without_shuffle(
        spark, "fhir_bucketed.patient", "fhir_bucketed.observation", [SUBJECT_KEY]
    )
    # the key is populated consistently on both sides
    pat = spark.table("fhir_bucketed.patient")
    obs = spark.table("fhir_bucketed.observation")
    assert pat.where(f"{SUBJECT_KEY} != id").count() == 0
    assert obs.where(f"{SUBJECT_KEY} != subject.patientId").count() == 0
    joined = pat.join(obs, SUBJECT_KEY).select(pat["id"]).distinct()
    assert joined.count() > 0
    spark.sql("DROP DATABASE IF EXISTS fhir_bucketed CASCADE")
