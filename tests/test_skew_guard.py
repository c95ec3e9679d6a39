"""Hot-key guard for the window family (VERDICT r3 item 3, carried from
r2): ``as_of_join(time_bucket=...)`` and ``sessionize(time_bucket=...)``
must (a) return byte-identical results to the unbucketed scans, and
(b) demonstrably bound per-task input when one key holds 50% of the
rows — the largest sort group shrinks from ~n/2 to the densest single
(key, bucket) cell."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bunsen_spark.operators.asof import as_of_join
from bunsen_spark.operators.sessionize import sessionize


def _skewed_events(spark, n=2000, seed=7):
    """Half the rows on one hot key, the rest across 50 cold keys;
    timestamps spread over [0, 100_000) with duplicates."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = "hot" if i % 2 == 0 else f"cold{rng.randrange(50)}"
        rows.append((k, rng.randrange(100_000), i))
    return spark.createDataFrame(rows, "k string, ts bigint, event_id bigint")


def _skewed_pair(spark, seed=11):
    rng = random.Random(seed)
    left = _skewed_events(spark, 1500, seed)
    rrows = [
        ("hot" if i % 2 == 0 else f"cold{rng.randrange(50)}",
         rng.randrange(100_000), float(i))
        for i in range(1500)
    ]
    # collapse (k, ts) ties on the right (the operator's contract)
    right = (
        spark.createDataFrame(rrows, "k string, ts bigint, v double")
        .groupBy("k", "ts")
        .agg(F.max("v").alias("v"))
    )
    return left, right


def _key(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


import pytest


@pytest.mark.slow
@pytest.mark.parametrize("seed", [11, 23, 47])
def test_asof_bucketed_matches_unbucketed_all_modes(spark, seed):
    left, right = _skewed_pair(spark, seed)
    for direction in ("backward", "forward"):
        for strict in (True, False):
            for tol in (None, 5_000):
                base = as_of_join(
                    left, right, ["k"], "ts", ["v"],
                    strict=strict, direction=direction, tolerance=tol,
                ).collect()
                guarded = as_of_join(
                    left, right, ["k"], "ts", ["v"],
                    strict=strict, direction=direction, tolerance=tol,
                    time_bucket=10_000,
                ).collect()
                cols = ["k", "ts", "event_id", "v"]
                assert _key(base, cols) == _key(guarded, cols), (
                    direction, strict, tol,
                )


def test_asof_bucket_boundary_and_empty_buckets(spark):
    """Right matches must carry across empty buckets, and equal-ts
    strictness must survive rows landing at exact bucket boundaries."""
    left = spark.createDataFrame(
        [("a", 10), ("a", 100), ("a", 305), ("a", 300)], "k string, ts bigint"
    )
    right = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 100, 2.0), ("a", 300, 3.0)],
        "k string, ts bigint, v double",
    )
    # bucket width 100: ts=100 and ts=300 sit exactly on boundaries
    out = {
        r["ts"]: r["v"]
        for r in as_of_join(
            left, right, ["k"], "ts", ["v"], time_bucket=100
        ).collect()
    }
    assert out[10] == 1.0
    assert out[100] == 1.0  # strict: same-ts right row invisible
    assert out[300] == 2.0  # carried across the empty (200,300) bucket
    assert out[305] == 3.0
    nonstrict = {
        r["ts"]: r["v"]
        for r in as_of_join(
            left, right, ["k"], "ts", ["v"], strict=False, time_bucket=100
        ).collect()
    }
    assert nonstrict[100] == 2.0 and nonstrict[300] == 3.0


def test_asof_bucketing_bounds_sort_groups(spark):
    """The evidence the guard works: with one key holding 50% of rows,
    the largest window sort group drops from ~n/2 to the densest
    (key, bucket) cell."""
    left, right = _skewed_pair(spark)
    union_n = left.count() + right.count()
    hot = (
        left.groupBy("k").count().agg(F.max("count")).collect()[0][0]
    )
    assert hot >= union_n * 0.2  # the skew is real
    bucketed_max = (
        left.select("k", F.floor(F.col("ts") / 10_000).alias("b"))
        .groupBy("k", "b")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    # ten buckets → the hot key's giant group splits ~10x
    assert bucketed_max <= hot / 5


def test_sessionize_bucketed_matches_unbucketed(spark):
    e = _skewed_events(spark)
    base = sessionize(e, ["k"], "ts", gap=500, order_cols=["event_id"])
    guarded = sessionize(
        e, ["k"], "ts", gap=500, order_cols=["event_id"], time_bucket=10_000
    )
    cols = ["k", "ts", "event_id", "session_id"]
    assert _key(base.collect(), cols) == _key(guarded.collect(), cols)
    # sanity: sessions actually split (gap smaller than the ts spread)
    n_sessions = base.select("k", "session_id").distinct().count()
    assert n_sessions > 60


def test_sessionize_boundary_gap(spark):
    """A session spanning a bucket boundary must NOT split, and a gap
    crossing the boundary must still open a new session."""
    e = spark.createDataFrame(
        [("u", 95, 1), ("u", 105, 2), ("u", 390, 3), ("u", 400, 4)],
        "k string, ts bigint, event_id bigint",
    )
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize(
            e, ["k"], "ts", gap=50, order_cols=["event_id"], time_bucket=100
        ).collect()
    }
    # 95→105 crosses the boundary with gap 10 ≤ 50: same session;
    # 105→390 gap 285 > 50: new session; 390→400 same session
    assert out[1] == out[2] == 1
    assert out[3] == out[4] == 2


def test_prefix_sum_bucketed_matches_unbucketed(spark):
    """prefix_sum (operators.windows): the distributed-prefix-sum
    guard must equal the plain per-key scan exactly — decimal and
    integer value types (the operator refuses nothing, but only
    associative types keep the guarantee; gate queries use decimal)."""
    from pyspark.sql import functions as F

    from bunsen_spark.operators.windows import prefix_sum

    e = _skewed_events(spark)
    cases = [
        F.col("event_id"),                                # long
        (F.col("event_id") % 7).cast("decimal(20,6)"),    # decimal
    ]
    for val in cases:
        base = prefix_sum(
            e, ["k"], "ts", val, order_cols=["event_id"]
        ).select("k", "ts", "event_id", F.col("running").cast("string"))
        guarded = prefix_sum(
            e, ["k"], "ts", val, order_cols=["event_id"], time_bucket=10_000
        ).select("k", "ts", "event_id", F.col("running").cast("string"))
        cols = ["k", "ts", "event_id", "running"]
        assert _key(base.collect(), cols) == _key(guarded.collect(), cols)


def test_sessionize_bucketed_exhaustive_boundary_sweep(spark):
    """EXHAUSTIVE equivalence on a tiny domain: every 4-event timestamp
    combination over ts∈{0..5} with bucket width 2 (all boundary/dup/
    empty-bucket shapes exist in this space), batched as one frame with
    a case_id key so the whole sweep is two collects, not 1296."""
    from itertools import product

    rows = [
        (case_id, ts, i)
        for case_id, combo in enumerate(product(range(6), repeat=4))
        for i, ts in enumerate(combo)
    ]
    e = spark.createDataFrame(rows, "case_id long, ts long, event_id long")
    cols = ["case_id", "ts", "event_id", "session_id"]
    base = _key(
        sessionize(e, ["case_id"], "ts", gap=1, order_cols=["event_id"]).collect(),
        cols,
    )
    guarded = _key(
        sessionize(
            e, ["case_id"], "ts", gap=1, order_cols=["event_id"], time_bucket=2
        ).collect(),
        cols,
    )
    assert base == guarded


def test_asof_bucketed_exhaustive_boundary_sweep(spark):
    """Exhaustive as-of equivalence: 2 left x 2 right timestamps over
    ts∈{0..4}, bucket width 2 — every same-bucket / adjacent-bucket /
    empty-gap / equal-ts configuration, all four mode combinations."""
    from itertools import product

    lrows, rrows = [], []
    for case_id, (l1, l2, r1, r2) in enumerate(product(range(5), repeat=4)):
        lrows += [(case_id, l1, 0), (case_id, l2, 1)]
        rrows += [(case_id, r1, 10.0 + r1), (case_id, r2, 20.0 + r2)]
    left = spark.createDataFrame(lrows, "case_id long, ts long, event_id long")
    right = (
        spark.createDataFrame(rrows, "case_id long, ts long, v double")
        .groupBy("case_id", "ts")
        .agg(F.max("v").alias("v"))
    )
    cols = ["case_id", "ts", "event_id", "v"]
    for direction in ("backward", "forward"):
        for strict in (True, False):
            base = as_of_join(
                left, right, ["case_id"], "ts", ["v"],
                strict=strict, direction=direction,
            ).collect()
            guarded = as_of_join(
                left, right, ["case_id"], "ts", ["v"],
                strict=strict, direction=direction, time_bucket=2,
            ).collect()
            assert _key(base, cols) == _key(guarded, cols), (direction, strict)


def test_sessionize_hot_key_threshold_exact(spark):
    """hot_key_threshold split (cold plain / hot bucketed) must produce
    exactly the plain result — keys are independent, so the routed
    union is not an approximation."""
    import random

    from bunsen_spark.operators.sessionize import sessionize

    rng = random.Random(5)
    rows = []
    for u in range(40):
        n = 400 if u == 0 else rng.randrange(3, 25)  # user 0 is hot
        t = 0
        for _ in range(n):
            t += rng.randrange(1, 120)
            rows.append((u, t))
    df = spark.createDataFrame(rows, "user_id long, us long")
    plain = sessionize(df, ["user_id"], "us", gap=40)
    routed = sessionize(
        df, ["user_id"], "us", gap=40, time_bucket=200, hot_key_threshold=100
    )
    key = lambda d: sorted((r.user_id, r.us, r.session_id) for r in d.collect())
    assert key(routed) == key(plain)


def test_prefix_sum_hot_key_threshold_exact(spark):
    import random

    from bunsen_spark.operators.windows import prefix_sum

    rng = random.Random(6)
    rows = []
    for u in range(30):
        n = 300 if u < 2 else rng.randrange(2, 20)
        t = 0
        for _ in range(n):
            t += rng.randrange(1, 50)
            rows.append((u, t, rng.randrange(-5, 10)))
    df = spark.createDataFrame(rows, "user_id long, us long, v long")
    plain = prefix_sum(df, ["user_id"], "us", "v")
    routed = prefix_sum(
        df, ["user_id"], "us", "v", time_bucket=77, hot_key_threshold=150
    )
    key = lambda d: sorted((r.user_id, r.us, r.running) for r in d.collect())
    assert key(routed) == key(plain)


def test_hot_key_threshold_requires_bucket(spark):
    import pytest as _pytest

    from bunsen_spark.operators.sessionize import sessionize
    from bunsen_spark.operators.windows import prefix_sum

    df = spark.createDataFrame([(1, 1)], "user_id long, us long")
    with _pytest.raises(ValueError, match="requires time_bucket"):
        sessionize(df, ["user_id"], "us", 10, hot_key_threshold=5)
    with _pytest.raises(ValueError, match="requires time_bucket"):
        prefix_sum(df, ["user_id"], "us", "us", hot_key_threshold=5)
