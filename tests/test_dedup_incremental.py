"""Incremental dedup: associativity of the state update and
equivalence with one-shot dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bunsen_spark.operators.dedup import exact_dedup, incremental_dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"text {i % 7}")  # 7 distinct texts across 20 docs
        for i in range(20)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_batch_splits_reach_same_state_as_one_shot(spark, docs):
    one_shot = exact_dedup(docs)
    want = {r["fingerprint"] for r in one_shot.collect()}

    empty = spark.createDataFrame([], "fingerprint string")
    b1 = incremental_dedup(docs.where("doc_id < 5"), empty)
    state1 = b1.select("fingerprint")
    b2 = incremental_dedup(docs.where("doc_id >= 5 and doc_id < 12"), state1)
    state2 = state1.union(b2.select("fingerprint"))
    b3 = incremental_dedup(docs.where("doc_id >= 12"), state2)
    final = state2.union(b3.select("fingerprint"))

    assert {r["fingerprint"] for r in final.collect()} == want
    # later batches emit only fingerprints unseen in earlier state
    assert b2.join(state1, "fingerprint", "left_semi").count() == 0
    assert b3.join(state2, "fingerprint", "left_semi").count() == 0


def test_keep_id_is_batch_minimum(spark, docs):
    empty = spark.createDataFrame([], "fingerprint string")
    out = {
        r["fingerprint"]: (r["keep_id"], r["n_docs"])
        for r in incremental_dedup(docs, empty).collect()
    }
    exact = {
        r["fingerprint"]: (r["keep_id"], r["n_docs"])
        for r in exact_dedup(docs).collect()
    }
    assert out == exact


def test_fully_seen_batch_emits_nothing(spark, docs):
    state = exact_dedup(docs).select("fingerprint")
    again = docs.withColumn("doc_id", F.col("doc_id") + 100)
    assert incremental_dedup(again, state).count() == 0
