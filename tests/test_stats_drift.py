"""Unit tests for grouped order statistics, min-max scaling, vocab
drift, and the source-overlap matrix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_median2_odd_and_even_groups(spark):
    from bunsen_spark.operators.stats import grouped_median2

    df = _vals(
        spark,
        [("odd", 1), ("odd", 9), ("odd", 5),
         ("even", 1), ("even", 3), ("even", 7), ("even", 100)],
    )
    got = {r.g: (r.n, r.median2) for r in grouped_median2(df, "g", "v").collect()}
    assert got == {"odd": (3, 10), "even": (4, 10)}  # med 5 and (3+7)/2


def test_median2_single_row_group(spark):
    from bunsen_spark.operators.stats import grouped_median2

    got = {
        r.g: r.median2
        for r in grouped_median2(_vals(spark, [("a", 42)]), "g", "v").collect()
    }
    assert got == {"a": 84}


def test_median2_with_ties(spark):
    from bunsen_spark.operators.stats import grouped_median2

    df = _vals(spark, [("t", 2), ("t", 2), ("t", 2), ("t", 8)])
    [r] = grouped_median2(df, "g", "v").collect()
    assert (r.n, r.median2) == (4, 4)  # middles 2 and 2


def test_median2_matches_statistics_median(spark):
    import random
    import statistics

    from bunsen_spark.operators.stats import grouped_median2

    rng = random.Random(5)
    rows = [("g", rng.randint(0, 1000)) for _ in range(257)]
    [r] = grouped_median2(_vals(spark, rows), "g", "v").collect()
    assert r.median2 == 2 * statistics.median(v for _, v in rows)


def test_minmax_normalize_basic(spark):
    from bunsen_spark.operators.stats import minmax_normalize

    df = _vals(spark, [("a", 10), ("a", 20), ("a", 30), ("b", 5)])
    got = {
        (r.g, r.v): (r.num, r.den)
        for r in minmax_normalize(df, "g", "v").collect()
    }
    assert got == {
        ("a", 10): (0, 20),
        ("a", 20): (10, 20),
        ("a", 30): (20, 20),
        ("b", 5): (0, 0),  # constant group: den 0, caller's convention
    }


def test_vocab_shift_directions(spark):
    from bunsen_spark.operators.drift import vocab_shift

    docs = spark.createDataFrame(
        [
            (0, "aaa aaa aaa common"),
            (2, "aaa common zzz"),
            (1, "bbb bbb common"),
            (3, "bbb common zzz"),
        ],
        "doc_id long, text string",
    )
    out = {r.tok: r for r in vocab_shift(docs, F.col("doc_id") % 2 == 0).collect()}
    assert out["aaa"].shift > 0      # A-heavy token
    assert out["bbb"].shift < 0      # B-heavy token
    assert out["aaa"].cnt_a == 4 and out["aaa"].cnt_b == 0
    # equal-share token has near-zero shift relative to the heavy ones
    assert abs(out["zzz"].shift) < abs(out["aaa"].shift)


def test_vocab_shift_top_k_bounds_output(spark):
    from bunsen_spark.operators.drift import vocab_shift

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(i, i + 20))) for i in range(30)],
        "doc_id long, text string",
    )
    assert vocab_shift(docs, F.col("doc_id") % 2 == 0, top_k=7).count() == 7
    with pytest.raises(ValueError):
        vocab_shift(docs, F.col("doc_id") % 2 == 0, top_k=0)


def test_source_overlap_matrix(spark):
    from bunsen_spark.operators.drift import source_overlap_matrix

    docs = spark.createDataFrame(
        [
            ("s1", "shared-one"),
            ("s2", "shared-one"),
            ("s3", "shared-one"),
            ("s1", "shared-two"),
            ("s2", "shared-two"),
            ("s1", "only-here"),
            ("s1", "dup-within-source"),
            ("s1", "dup-within-source"),  # same source twice: no pair
        ],
        "source string, text string",
    )
    got = {
        (r.source_a, r.source_b): r.n_shared
        for r in source_overlap_matrix(docs).collect()
    }
    assert got == {
        ("s1", "s2"): 2,
        ("s1", "s3"): 1,
        ("s2", "s3"): 1,
    }


def test_sorted_neighborhood_pairs(spark):
    from bunsen_spark.operators.setjoin import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [
            ("b1", 1, 10), ("b1", 2, 20), ("b1", 3, 30), ("b1", 4, 40),
            ("b2", 5, 10), ("b2", 6, 20),
            ("b3", 7, 10),
        ],
        "blk string, id long, v long",
    )
    got = sorted(
        (r.id_a, r.id_b, r.gap)
        for r in sorted_neighborhood_pairs(df, "id", "blk", "v", window=3).collect()
    )
    assert got == [
        (1, 2, 1), (1, 3, 2),
        (2, 3, 1), (2, 4, 2),
        (3, 4, 1),
        (5, 6, 1),
    ]


def test_sorted_neighborhood_tie_break_deterministic(spark):
    from bunsen_spark.operators.setjoin import sorted_neighborhood_pairs

    rows = [("b", i, 7) for i in range(6)]  # all sort values tie
    a = sorted(
        (r.id_a, r.id_b, r.gap)
        for r in sorted_neighborhood_pairs(
            spark.createDataFrame(rows, "blk string, id long, v long").repartition(1),
            "id", "blk", "v", window=2,
        ).collect()
    )
    b = sorted(
        (r.id_a, r.id_b, r.gap)
        for r in sorted_neighborhood_pairs(
            spark.createDataFrame(rows[::-1], "blk string, id long, v long").repartition(8),
            "id", "blk", "v", window=2,
        ).collect()
    )
    assert a == b == [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)]


def test_sorted_neighborhood_rejects_window_one(spark):
    import pytest as _pytest

    from bunsen_spark.operators.setjoin import sorted_neighborhood_pairs

    df = spark.createDataFrame([("b", 1, 1)], "blk string, id long, v long")
    with _pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "blk", "v", window=1)


def test_budget_select_greedy_semantics(spark):
    from bunsen_spark.operators.sampling import budget_select

    df = spark.createDataFrame(
        [
            # g1: scores 9 > 7 > 5; costs 40, 50, 10; budget 60
            ("g1", 1, 40, 9),
            ("g1", 2, 50, 7),
            ("g1", 3, 10, 5),
            # g2: one giant row still taken (budget is a target)
            ("g2", 4, 999, 1),
        ],
        "g string, doc_id long, cost long, score long",
    )
    kept = {
        r.doc_id
        for r in budget_select(df, "g", "cost", "score", budget=60).collect()
    }
    # g1: doc 1 (spent_before 0) kept, doc 2 (spent_before 40 < 60)
    # kept, doc 3 (spent_before 90 >= 60) dropped; g2: doc 4 kept
    assert kept == {1, 2, 4}


def test_budget_select_deterministic_ties(spark):
    from bunsen_spark.operators.sampling import budget_select

    rows = [("g", i, 10, 5) for i in range(10)]  # all scores tie
    a = {
        r.doc_id
        for r in budget_select(
            spark.createDataFrame(rows, "g string, doc_id long, cost long, score long").repartition(1),
            "g", "cost", "score", budget=35,
        ).collect()
    }
    b = {
        r.doc_id
        for r in budget_select(
            spark.createDataFrame(rows[::-1], "g string, doc_id long, cost long, score long").repartition(8),
            "g", "cost", "score", budget=35,
        ).collect()
    }
    assert a == b == {0, 1, 2, 3}  # id tiebreak, 4th row overflows the target


def test_budget_select_rejects_bad_budget(spark):
    import pytest as _pytest

    from bunsen_spark.operators.sampling import budget_select

    df = spark.createDataFrame([("g", 1, 1, 1)], "g string, doc_id long, cost long, score long")
    with _pytest.raises(ValueError):
        budget_select(df, "g", "cost", "score", budget=0)


def test_bigram_surprisal_known_counts(spark):
    from bunsen_spark.operators.text_analysis import bigram_surprisal_score

    # bigrams: "a b" x2, "b a" x1, "b c" x1  -> N=4
    # bits: "a b" -> floor(log2(4//2))=1; others floor(log2(4))=2
    df = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    [r] = bigram_surprisal_score(df).collect()
    assert r.n_bigrams == 4
    assert r.surprisal_bits == 1 + 2 + 1 + 2  # a-b, b-a, a-b, b-c


def test_bigram_surprisal_short_docs_zero(spark):
    from bunsen_spark.operators.text_analysis import bigram_surprisal_score

    df = spark.createDataFrame(
        [(1, "single"), (2, "")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_bigrams, r.surprisal_bits) for r in bigram_surprisal_score(df).collect()}
    assert got == {1: (0, 0), 2: (0, 0)}


def test_bigram_flags_boilerplate_below_salad(spark):
    from bunsen_spark.operators.text_analysis import bigram_surprisal_score

    template = " ".join(["click here to subscribe"] * 10)
    salad = "quantum sandwich theorem purple engine rotates nine vivid"
    df = spark.createDataFrame(
        [(1, template), (2, salad)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in bigram_surprisal_score(df).collect()}
    per1 = got[1].surprisal_bits / got[1].n_bigrams
    per2 = got[2].surprisal_bits / got[2].n_bigrams
    assert per2 > per1


def test_winsorize_clips_both_tails(spark):
    from bunsen_spark.operators.stats import grouped_winsorize

    rows = [("g", i, v) for i, v in enumerate([1, 10, 20, 30, 40, 50, 60, 70, 80, 1000])]
    df = spark.createDataFrame(rows, "g string, rid long, v long")
    out = grouped_winsorize(df, "g", "v", 10, 90)
    got = {r.rid: r.clipped for r in out.collect()}
    # n=10: lo rank ceil(0.1*10)=1 -> lo_val=1; hi rank ceil(0.9*10)=9 -> 80
    assert got[0] == 1          # at lo threshold, unchanged
    assert got[9] == 80         # 1000 clipped down to hi_val
    assert got[5] == 50         # interior untouched


def test_winsorize_ties_deterministic(spark):
    from bunsen_spark.operators.stats import grouped_winsorize

    rows = [("g", i, 7) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, rid long, v long")
    out = grouped_winsorize(df, "g", "v", 5, 95).collect()
    assert all(r.clipped == 7 and r.lo_val == 7 and r.hi_val == 7 for r in out)


def test_winsorize_rejects_bad_bounds(spark):
    import pytest as _pytest

    from bunsen_spark.operators.stats import grouped_winsorize

    df = spark.createDataFrame([("g", 1, 1)], "g string, rid long, v long")
    with _pytest.raises(ValueError):
        grouped_winsorize(df, "g", "v", 0, 95)
    with _pytest.raises(ValueError):
        grouped_winsorize(df, "g", "v", 50, 40)


def test_flag_outliers_detects_spike(spark):
    from bunsen_spark.operators.stats import flag_outliers

    rows = [("g", i, 10 + (i % 3)) for i in range(50)] + [("g", 99, 500)]
    df = spark.createDataFrame(rows, "g string, rid long, v long")
    got = {r.rid: r.is_outlier for r in flag_outliers(df, "g", "v").collect()}
    assert got[99] is True
    assert sum(got.values()) == 1  # only the spike


def test_flag_outliers_constant_group_has_none(spark):
    from bunsen_spark.operators.stats import flag_outliers

    df = spark.createDataFrame(
        [("g", i, 7) for i in range(10)], "g string, rid long, v long"
    )
    assert all(
        not r.is_outlier for r in flag_outliers(df, "g", "v").collect()
    )


def test_flag_outliers_matches_float_zscore(spark):
    import statistics

    from bunsen_spark.operators.stats import flag_outliers

    import random
    rng = random.Random(31)
    rows = [("g", i, rng.randint(0, 1000)) for i in range(200)]
    vals = [v for _, _, v in rows]
    mu = statistics.fmean(vals)
    sigma2 = statistics.pvariance(vals)
    expect = {i: (v - mu) ** 2 > 4 * sigma2 for _, i, v in rows}
    df = spark.createDataFrame(rows, "g string, rid long, v long")
    got = {
        r.rid: r.is_outlier
        for r in flag_outliers(df, "g", "v", k_num=2, k_den=1).collect()
    }
    assert got == expect


def test_flag_outliers_rejects_bad_k(spark):
    import pytest as _pytest

    from bunsen_spark.operators.stats import flag_outliers

    df = spark.createDataFrame([("g", 1, 1)], "g string, rid long, v long")
    with _pytest.raises(ValueError):
        flag_outliers(df, "g", "v", k_num=0)


import random as _random

import pytest as _pt


@_pt.mark.parametrize("seed", [2, 19, 53])
def test_budget_select_matches_python_greedy(spark, seed):
    from bunsen_spark.operators.sampling import budget_select

    rng = _random.Random(seed)
    rows = [
        (f"g{rng.randint(0, 2)}", i, rng.randint(1, 50), rng.randint(0, 9))
        for i in range(120)
    ]
    budget = 150
    df = spark.createDataFrame(rows, "g string, doc_id long, cost long, score long")
    got = {
        r.doc_id
        for r in budget_select(df, "g", "cost", "score", budget).collect()
    }
    expect = set()
    by_group = {}
    for g, i, c, s in rows:
        by_group.setdefault(g, []).append((i, c, s))
    for g, items in by_group.items():
        spent = 0
        for i, c, s in sorted(items, key=lambda t: (-t[2], t[0])):
            if spent < budget:
                expect.add(i)
            spent += c
    assert got == expect


@_pt.mark.parametrize("seed", [7, 41])
def test_winsorize_matches_python_order_stats(spark, seed):
    from bunsen_spark.operators.stats import grouped_winsorize

    rng = _random.Random(seed)
    rows = [
        (f"g{rng.randint(0, 1)}", i, rng.randint(-100, 1000))
        for i in range(137)
    ]
    df = spark.createDataFrame(rows, "g string, rid long, v long")
    out = grouped_winsorize(df, "g", "v", 10, 90).collect()
    by_group = {}
    for g, i, v in rows:
        by_group.setdefault(g, []).append(v)
    th = {}
    for g, vs in by_group.items():
        vs = sorted(vs)
        n = len(vs)
        lo = vs[(10 * n + 99) // 100 - 1]   # value at rank ceil(0.10*n)
        hi = vs[(90 * n + 99) // 100 - 1]
        th[g] = (lo, hi)
    vals = {(g, i): v for g, i, v in rows}
    for r in out:
        lo, hi = th[r.g]
        assert (r.lo_val, r.hi_val) == (lo, hi)
        assert r.clipped == max(lo, min(hi, vals[(r.g, r.rid)]))


# --- NULL group keys (round-6 ADVICE fix): a plain equi-join back would
# DROP NULL-key rows, while the DuckDB window twins keep them as the
# NULL partition. The operators now use a null-safe join — NULL keys
# form their own group, matching PARTITION BY semantics exactly.


def test_minmax_normalize_null_key_group(spark):
    from bunsen_spark.operators.stats import minmax_normalize

    df = _vals(spark, [("a", 10), ("a", 30), (None, 5), (None, 25)])
    rows = minmax_normalize(df, "g", "v").collect()
    assert len(rows) == 4  # NULL-key rows NOT dropped
    nulls = {r.v: (r.num, r.den) for r in rows if r.g is None}
    assert nulls == {5: (0, 20), 25: (20, 20)}


def test_grouped_winsorize_null_key_group(spark):
    from bunsen_spark.operators.stats import grouped_winsorize

    df = _vals(
        spark,
        [("a", 1), ("a", 100)]
        + [(None, v) for v in (1, 2, 3, 4, 1000)],
    )
    rows = grouped_winsorize(df, "g", "v", 20, 80).collect()
    assert len(rows) == 7
    nulls = sorted(r.clipped for r in rows if r.g is None)
    # n=5: lo rank ceil(0.2*5)=1 -> 1, hi rank ceil(0.8*5)=4 -> 4
    assert nulls == [1, 2, 3, 4, 4]


def test_flag_outliers_null_key_group(spark):
    from bunsen_spark.operators.stats import flag_outliers

    # a single outlier among n rows has z^2 = n-1 exactly when the rest
    # are constant, so n must exceed k^2+1 = 10 for a strict 3-sigma
    # flag: use 11 constant rows + 1 spike (z^2 = 11 > 9)
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 12)]
        + [(None, rid, 10) for rid in range(3, 14)]
        + [(None, 14, 500)],
        "g string, rid long, v long",
    )
    rows = flag_outliers(df, "g", "v", k_num=3, k_den=1).collect()
    assert len(rows) == 14
    got = {r.rid: r.is_outlier for r in rows if r.g is None}
    assert got[14] is True
    assert all(not got[i] for i in range(3, 14))


def test_winsorize_null_key_matches_duckdb_twin(spark):
    import duckdb

    from bunsen_spark.operators.stats import (
        grouped_winsorize,
        grouped_winsorize_sql,
    )

    rows = [("a", 1), ("a", 50), ("a", 100), (None, 7), (None, 8),
            (None, 9), (None, 10), (None, 9000)]
    df = _vals(spark, rows)
    order = lambda t: (t[0] is not None, t[0] or "", t[1:])  # noqa: E731
    got = sorted(
        ((r.g, r.v, r.lo_val, r.hi_val, r.clipped)
         for r in grouped_winsorize(df, "g", "v", 20, 80).collect()),
        key=order,
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = grouped_winsorize_sql("SELECT g, v FROM t", "g", "v", 20, 80,
                                cols="g, v")
    want = sorted((tuple(r) for r in con.execute(sql).fetchall()), key=order)
    assert got == want


def test_equi_depth_histogram_matches_ntile(spark):
    """Bin populations and boundaries equal the engine's own global
    ntile — including the uneven split (N mod bins != 0)."""
    from pyspark.sql import functions as F

    from bunsen_spark.operators.stats import equi_depth_histogram

    df = spark.range(0, 103).select(
        ((F.col("id") * 37) % 101).alias("v"), F.col("id").alias("k")
    ).repartition(7)
    got = {
        r["bin"]: (r["lo"], r["hi"], r["n"])
        for r in equi_depth_histogram(df, "v", 4, tiebreak=["k"]).collect()
    }
    df.createOrReplaceTempView("__edh")
    want = {
        r["bin"]: (r["lo"], r["hi"], r["n"])
        for r in spark.sql("""
            SELECT bin, min(v) AS lo, max(v) AS hi, count(*) AS n FROM (
              SELECT v, CAST(ntile(4) OVER (ORDER BY v, k) AS BIGINT) AS bin
              FROM __edh
            ) GROUP BY bin""").collect()
    }
    assert got == want
    assert sum(n for _, _, n in got.values()) == 103
    # 103 rows into 4 bins: first 3 bins take 26, last takes 25
    assert [got[b][2] for b in sorted(got)] == [26, 26, 26, 25]


def test_weighted_quantiles_exact(spark):
    """Weighted quantiles equal the brute-force definition: smallest
    value whose cumulative weight reaches ceil(q * W)."""
    from bunsen_spark.operators.stats import weighted_quantiles

    rows = [(v, w, i) for i, (v, w) in enumerate(
        [(10, 1), (20, 5), (30, 1), (40, 2), (50, 1)]
    )]
    df = spark.createDataFrame(rows, "v long, w long, k long").repartition(3)
    qs = [("0.1", 1, 10), ("0.5", 1, 2), ("0.6", 3, 5), ("0.99", 99, 100)]
    got = {r["q"]: r["value"] for r in
           weighted_quantiles(df, "v", "w", qs, tiebreak=["k"]).collect()}
    # W=10; targets: ceil(1)=1 -> 10, ceil(5)=5 -> 20, ceil(6)=6 -> 20,
    # ceil(9.9)=10 -> 50
    assert got == {"0.1": 10, "0.5": 20, "0.6": 20, "0.99": 50}
    # exactly one row per quantile
    assert weighted_quantiles(df, "v", "w", qs, tiebreak=["k"]).count() == len(qs)


import random

import pytest


@pytest.mark.parametrize("seed", [3, 14, 42])
def test_rank_and_weighted_quantiles_random_vs_python(spark, seed):
    """Randomized check of the distributed order-statistics primitives
    against pure-Python references: exact global rank, exact weighted
    cumulative sum, and the weighted-quantile selection rule."""
    from pyspark.sql import functions as F

    from bunsen_spark.operators.stats import weighted_quantiles
    from bunsen_spark.operators.windows import (
        global_row_number,
        global_weighted_cumsum,
    )

    rng = random.Random(seed)
    n = rng.randint(5, 120)
    rows = [(rng.randint(-50, 50), rng.randint(1, 9), i) for i in range(n)]
    df = spark.createDataFrame(rows, "v long, w long, k long").repartition(
        rng.randint(1, 8)
    )
    order = sorted(rows, key=lambda r: (r[0], r[2]))

    ranked = {
        r["k"]: r["rn"]
        for r in global_row_number(
            df, [F.col("v").asc(), F.col("k").asc()], "rn"
        ).collect()
    }
    assert ranked == {r[2]: i + 1 for i, r in enumerate(order)}

    cums = {
        r["k"]: r["cumw"]
        for r in global_weighted_cumsum(
            df, [F.col("v").asc(), F.col("k").asc()], "w", "cumw"
        ).collect()
    }
    acc, expect = 0, {}
    for v, w, k in order:
        acc += w
        expect[k] = acc
    assert cums == expect

    W = sum(w for _, w, _ in rows)
    qs = [("0.25", 1, 4), ("0.5", 1, 2), ("0.9", 9, 10)]
    got = {
        r["q"]: r["value"]
        for r in weighted_quantiles(df, "v", "w", qs, tiebreak=["k"]).collect()
    }
    for label, num, den in qs:
        target = -(-W * num // den)  # ceil
        acc = 0
        for v, w, k in order:
            acc += w
            if acc >= target:
                assert got[label] == v, (label, target)
                break
