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


# ---------------------------------------------------------------------------
# incremental NEAR-dup (MinHash state filter)
# ---------------------------------------------------------------------------


def _mini_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank now"),
        (3, "completely different text about spark distributed query planning engines"),
        (4, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (5, "another unrelated document mentioning parquet files and shuffle services"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_incr_near_dup_matches_brute_force(spark):
    from pyspark.sql import functions as F

    from bunsen_spark.operators.dedup import (
        incremental_near_dup,
        jaccard_pairs,
        minhash_state,
    )

    docs = _mini_docs(spark)
    state_docs = docs.where(F.col("doc_id") <= 2)
    batch = docs.where(F.col("doc_id") > 2)
    kept = incremental_near_dup(batch, minhash_state(state_docs), threshold=0.5)
    kept_ids = sorted(r.doc_id for r in kept.collect())
    # brute force: exact jaccard of every batch doc vs every state doc
    cross = jaccard_pairs(docs, threshold=0.5)
    near_state = {
        r.b_id
        for r in cross.selectExpr("a_id", "b_id").collect()
        if r.a_id <= 2 and r.b_id > 2
    } | {
        r.a_id
        for r in cross.selectExpr("a_id", "b_id").collect()
        if r.b_id <= 2 and r.a_id > 2
    }
    expected = sorted(set([3, 4, 5]) - near_state)
    assert kept_ids == expected
    assert 4 not in kept_ids  # exact dup of state doc 1 must drop


def test_incr_near_dup_self_filter_drops_all(spark):
    from bunsen_spark.operators.dedup import incremental_near_dup, minhash_state

    docs = _mini_docs(spark)
    kept = incremental_near_dup(docs, minhash_state(docs), threshold=0.5)
    assert kept.count() == 0  # every doc is jaccard-1 with itself in state


def test_incr_near_dup_monotone_in_state(spark):
    from pyspark.sql import functions as F

    from bunsen_spark.operators.dedup import incremental_near_dup, minhash_state

    docs = _mini_docs(spark)
    small_state = minhash_state(docs.where(F.col("doc_id") == 3))
    big_state = minhash_state(docs.where(F.col("doc_id") <= 3))
    batch = docs.where(F.col("doc_id") > 3)
    kept_small = {r.doc_id for r in incremental_near_dup(batch, small_state).collect()}
    kept_big = {r.doc_id for r in incremental_near_dup(batch, big_state).collect()}
    assert kept_big <= kept_small  # more state can only drop more


def test_incr_near_dup_output_is_appendable_state(spark):
    from pyspark.sql import functions as F

    from bunsen_spark.operators.dedup import incremental_near_dup, minhash_state

    docs = _mini_docs(spark)
    state = minhash_state(docs.where(F.col("doc_id") <= 1))
    kept = incremental_near_dup(docs.where(F.col("doc_id") > 1), state)
    assert set(kept.columns) == {"doc_id", "hs", "sig"}
    advanced = state.unionByName(kept)
    # the advanced state drops a re-presented copy of a kept doc
    again = incremental_near_dup(
        docs.where(F.col("doc_id") == 3).withColumn("doc_id", F.lit(99)),
        advanced,
    )
    assert again.count() == 0
