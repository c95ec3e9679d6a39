"""Round-5 operators: per-group caps, cross-corpus fuzzy join,
snapshot diff."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_cap_per_group_keeps_best_deterministic(spark):
    from bunsen_spark.operators.sampling import cap_per_group

    rows = [
        (1, "a", 10), (2, "a", 30), (3, "a", 20), (4, "a", 30),
        (5, "b", 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    kept = cap_per_group(df, "source", cap=2, score_col="n_chars")
    got = sorted((r.source, r.doc_id) for r in kept.collect())
    # source a: the two score-30 rows, tie broken by min doc_id (2 then 4)
    assert got == [("a", 2), ("a", 4), ("b", 5)]


def test_cap_per_group_validates(spark):
    from bunsen_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame([(1, "a", 1)], "doc_id long, source string, n_chars long")
    with pytest.raises(ValueError, match="cap must be"):
        cap_per_group(df, "source", cap=0, score_col="n_chars")


def test_fuzzy_text_join_matches_brute_force(spark):
    """LSH + verify must find exactly the cross pairs brute-force exact
    Jaccard (on the same hashed shingle sets) finds at this threshold —
    these fixture docs agree on full bands whenever they pass 0.5."""
    from bunsen_spark.operators.dedup import (
        fuzzy_text_join,
        minhash_signature,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = [
        (0, base + " today"),
        (2, "completely different text about spark distributed planning"),
        (1, base + " now"),
        (3, "another unrelated story about parquet file footers"),
        (5, base + " today ok"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    left = df.where(F.col("doc_id") % 2 == 0)
    right = df.where(F.col("doc_id") % 2 == 1)
    got = {(r.l_id, r.r_id) for r in fuzzy_text_join(left, right, 0.5).collect()}

    sig = {r.doc_id: set(r.hs) for r in minhash_signature(df).collect()}
    want = set()
    for l in (0, 2):
        for r in (1, 3, 5):
            a, b = sig[l], sig[r]
            if len(a & b) / len(a | b) >= 0.5:
                want.add((l, r))
    assert got == want and (0, 1) in got
    # sides are directional: no (odd, even) pairs, no in-corpus pairs
    assert all(l % 2 == 0 and r % 2 == 1 for l, r in got)


def test_fuzzy_text_join_portable_same_decisions(spark):
    from bunsen_spark.operators.dedup import fuzzy_text_join

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    left = docs.where(F.col("doc_id") % 2 == 0)
    right = docs.where(F.col("doc_id") % 2 == 1)
    fast = {(r.l_id, r.r_id) for r in fuzzy_text_join(left, right, 0.5).collect()}
    port = {
        (r.l_id, r.r_id)
        for r in fuzzy_text_join(left, right, 0.5, portable=True).collect()
    }
    assert fast == port and fast


def test_snapshot_diff_statuses(spark):
    from bunsen_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, "c", "z"), (4, "d", "w")],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [
            (1, "a", "x"),      # unchanged -> omitted
            (2, "b", "en"),     # NULL -> value = changed
            (3, "c2", "z"),     # text changed
            (9, "n", "y"),      # added
        ],                      # 4 missing -> removed
        "doc_id long, text string, lang string",
    )
    got = {
        (r.doc_id, r.status)
        for r in snapshot_diff(old, new, "doc_id", ["text", "lang"]).collect()
    }
    assert got == {(2, "changed"), (3, "changed"), (4, "removed"), (9, "added")}


def test_snapshot_diff_validates(spark):
    from bunsen_spark.operators.snapshot import snapshot_diff

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="compare_cols"):
        snapshot_diff(df, df, "doc_id", [])


def test_fuzzy_join_split_equals_two_frame_form(spark):
    """The single-scan split form must return exactly the two-frame
    form's pairs (it is the same algorithm with the signature stage
    shared)."""
    from bunsen_spark.operators.dedup import fuzzy_text_join, fuzzy_text_join_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    cond = F.col("doc_id") % 2 == 0
    two = {
        (r.l_id, r.r_id, r.jaccard)
        for r in fuzzy_text_join(docs.where(cond), docs.where(~cond), 0.5).collect()
    }
    one = {
        (r.l_id, r.r_id, r.jaccard)
        for r in fuzzy_text_join_split(docs, cond, 0.5).collect()
    }
    assert one == two and one


def test_weighted_sample_extremes_and_monotone(spark):
    """weight>=1 always survives, <=0 never; raising a row's weight
    never flips it from kept to dropped (same coin, higher cutoff)."""
    from bunsen_spark.operators.sampling import weighted_sample

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    all_kept = weighted_sample(df, "doc_id", F.lit(1.5))
    assert all_kept.count() == 500
    none_kept = weighted_sample(df, "doc_id", F.lit(-0.2))
    assert none_kept.count() == 0
    half = {r.doc_id for r in weighted_sample(df, "doc_id", F.lit(0.5)).collect()}
    more = {r.doc_id for r in weighted_sample(df, "doc_id", F.lit(0.8)).collect()}
    assert half <= more
    # roughly proportional (md5 uniformity): 0.5 => ~250 +- wide margin
    assert 175 <= len(half) <= 325
