"""Warehouse round-trips for the mergeable sketches: persist
per-partition sketch tables to parquet, reload, merge — the merged
sketch must equal the all-at-once sketch EXACTLY (same cells / words /
binary), which is the property the docstrings promise
(`operators/sketches.py`, `operators/bloom.py`) and the pattern a
100 TB warehouse relies on: per-day/per-shard sketches persisted once,
any later rollup answered at sketch-size cost without raw data."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type"
    )


def _roundtrip(spark, df, path):
    df.write.mode("overwrite").parquet(str(path))
    return spark.read.parquet(str(path))


def test_countmin_roundtrip_merge_exact(spark, events, tmp_path):
    from bunsen_spark.operators.sketches import countmin_merge, countmin_table

    lo = events.where(F.col("user_id") % 2 == 0)
    hi = events.where(F.col("user_id") % 2 == 1)
    part_lo = _roundtrip(spark, countmin_table(lo, "user_id"), tmp_path / "cm_lo")
    part_hi = _roundtrip(spark, countmin_table(hi, "user_id"), tmp_path / "cm_hi")
    merged = {
        (r.row, r.col): r.cnt
        for r in countmin_merge(part_lo, part_hi).collect()
    }
    whole = {
        (r.row, r.col): r.cnt for r in countmin_table(events, "user_id").collect()
    }
    assert merged == whole and whole


def test_countmin_merged_estimates_match(spark, events, tmp_path):
    from bunsen_spark.operators.sketches import (
        countmin_estimate,
        countmin_merge,
        countmin_table,
    )

    lo = events.where(F.col("user_id") % 2 == 0)
    hi = events.where(F.col("user_id") % 2 == 1)
    merged = countmin_merge(
        _roundtrip(spark, countmin_table(lo, "user_id"), tmp_path / "cm_a"),
        _roundtrip(spark, countmin_table(hi, "user_id"), tmp_path / "cm_b"),
    )
    probes = events.select("user_id").distinct()
    est_m = {
        r.user_id: r.cm_estimate
        for r in countmin_estimate(probes, "user_id", merged).collect()
    }
    est_w = {
        r.user_id: r.cm_estimate
        for r in countmin_estimate(
            probes, "user_id", countmin_table(events, "user_id")
        ).collect()
    }
    assert est_m == est_w and est_m


def test_bloom_roundtrip_merge_exact(spark, events, tmp_path):
    from bunsen_spark.operators.bloom import bloom_merge, bloom_words

    keys = events.select(F.col("user_id").alias("k"))
    lo = keys.where(F.col("k") % 2 == 0)
    hi = keys.where(F.col("k") % 2 == 1)
    bits = 1 << 12
    part_lo = _roundtrip(spark, bloom_words(lo, "k", num_bits=bits), tmp_path / "bl_lo")
    part_hi = _roundtrip(spark, bloom_words(hi, "k", num_bits=bits), tmp_path / "bl_hi")
    merged = {
        r.word_idx: r.word for r in bloom_merge(part_lo, part_hi).collect()
    }
    whole = {
        r.word_idx: r.word for r in bloom_words(keys, "k", num_bits=bits).collect()
    }
    assert merged == whole and whole


def test_bloom_merged_filter_no_false_negatives(spark, events, tmp_path):
    from bunsen_spark.operators.bloom import bloom_merge, bloom_prefilter, bloom_words

    keys = events.select(F.col("user_id").alias("k")).distinct()
    lo = keys.where(F.col("k") % 2 == 0)
    hi = keys.where(F.col("k") % 2 == 1)
    merged = bloom_merge(
        _roundtrip(spark, bloom_words(lo, "k"), tmp_path / "bw_a"),
        _roundtrip(spark, bloom_words(hi, "k"), tmp_path / "bw_b"),
    )
    survivors = {
        r.k for r in bloom_prefilter(keys, "k", merged).collect()
    }
    # every key inserted into either half must survive the merged filter
    assert survivors == {r.k for r in keys.collect()}


def test_hll_roundtrip_merge_exact(spark, events, tmp_path):
    """Per-half HLL sketches persisted as parquet binary, reloaded and
    unioned per group, must estimate identically to the all-at-once
    per-group sketch (same k, same registers -> same binary estimate)."""
    from bunsen_spark.operators.sketches import distinct_sketches

    lo = events.where(F.col("user_id") % 2 == 0)
    hi = events.where(F.col("user_id") % 2 == 1)
    part = _roundtrip(
        spark,
        distinct_sketches(lo, "event_type", "user_id").unionByName(
            distinct_sketches(hi, "event_type", "user_id")
        ),
        tmp_path / "hll",
    )
    merged = {
        r.grp: r.estimate
        for r in part.groupBy("grp")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch")))
            .cast("long")
            .alias("estimate")
        )
        .collect()
    }
    whole = {
        r.grp: r.estimate
        for r in distinct_sketches(events, "event_type", "user_id").collect()
    }
    assert merged == whole and whole
