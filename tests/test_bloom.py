"""Bloom filter build/probe: no false negatives, exact semi-join
composition, mergeability, bounded size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_no_false_negatives(spark):
    from bunsen_spark.operators.bloom import bloom_prefilter, bloom_words

    keys = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    words = bloom_words(keys, "k", num_bits=1 << 12, num_hashes=4)
    # probing the build set itself must keep every row
    kept = bloom_prefilter(keys, "k", words, num_bits=1 << 12, num_hashes=4)
    assert kept.count() == 500


def test_semi_join_exact(spark, sf_dir):
    from bunsen_spark.operators.bloom import bloom_semi_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    dim = spark.read.parquet(f"{sf_dir}/supplier.parquet").where(
        F.col("s_acctbal") > 5000
    )
    exact = li.join(
        dim.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"), "left_semi"
    )
    got = bloom_semi_join(li, "l_suppkey", dim, "s_suppkey",
                          num_bits=1 << 13, num_hashes=5)
    a = sorted(str(r) for r in exact.collect())
    b = sorted(str(r) for r in got.select(*exact.columns).collect())
    assert a == b and len(a) > 0


def test_false_positive_rate_bounded(spark):
    from bunsen_spark.operators.bloom import bloom_prefilter, bloom_words

    # 100 keys in a 2^14-bit filter with 5 hashes: theoretical FP rate
    # (1 - exp(-5*100/16384))^5 ~ 2e-8; on 10k disjoint probes expect 0,
    # allow a tiny slack.
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    probe = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    words = bloom_words(build, "k", num_bits=1 << 14, num_hashes=5)
    fp = bloom_prefilter(probe, "k", words, num_bits=1 << 14, num_hashes=5).count()
    assert fp <= 5


def test_words_bounded_and_mergeable(spark):
    from bunsen_spark.operators.bloom import bloom_prefilter, bloom_words

    bits, k = 1 << 10, 3
    a = spark.range(0, 200).select(F.col("id").alias("k"))
    b = spark.range(200, 400).select(F.col("id").alias("k"))
    wa, wb = bloom_words(a, "k", bits, k), bloom_words(b, "k", bits, k)
    assert wa.count() <= bits // 64
    # merge = union + bit_or re-aggregate; must behave like the filter
    # built from the union of the key sets: no false negatives on a∪b
    merged = (
        wa.unionByName(wb)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    both = a.unionByName(b)
    kept = bloom_prefilter(both, "k", merged, bits, k)
    assert kept.count() == 400


def test_null_keys_harmless(spark):
    from bunsen_spark.operators.bloom import bloom_semi_join

    fact = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k int, v string"
    )
    dim = spark.createDataFrame([(1,), (9,)], "d int")
    got = bloom_semi_join(fact, "k", dim, "d", num_bits=1 << 8, num_hashes=3)
    rows = sorted((r.k, r.v) for r in got.collect())
    assert rows == [(1, "a")]  # NULL never equi-joins; must not survive


def test_bloom_string_keys(spark):
    from pyspark.sql import functions as F

    from bunsen_spark.operators.bloom import bloom_semi_join

    fact = spark.createDataFrame(
        [(f"user_{i}", i) for i in range(200)], "k string, v int"
    )
    dim = spark.createDataFrame([(f"user_{i}",) for i in range(0, 200, 7)], "d string")
    got = bloom_semi_join(fact, "k", dim, "d", num_bits=1 << 10, num_hashes=4)
    exact = fact.join(dim, fact.k == dim.d, "left_semi")
    assert sorted(r.k for r in got.collect()) == sorted(r.k for r in exact.collect())
