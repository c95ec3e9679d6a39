"""as_of_join row semantics (operators.asof) — especially the ADVICE r2
case: the tolerance gap test and the payload must describe the SAME
right row, so a null payload value in the nearest right row stays null
instead of leaking an older (possibly out-of-tolerance) value."""

from __future__ import annotations

import pytest

from bunsen_spark.operators.asof import as_of_join


def _frames(spark):
    left = spark.createDataFrame(
        [("a", 100), ("a", 205), ("b", 50)], "k string, ts bigint"
    )
    right = spark.createDataFrame(
        [
            ("a", 90, 1.0),
            ("a", 200, None),  # nearest to left ts=205, value NULL
            ("b", 50, 9.0),
        ],
        "k string, ts bigint, v double",
    )
    return left, right


def _by_ts(rows):
    return {(r["k"], r["ts"]): r["v"] for r in rows}

@pytest.mark.slow
def test_backward_nearest_row_is_atomic(spark):
    left, right = _frames(spark)
    out = _by_ts(as_of_join(left, right, ["k"], "ts", ["v"]).collect())
    assert out[("a", 100)] == 1.0
    # nearest prior row (ts=200) has v=NULL → stays NULL, does NOT fall
    # back to the older ts=90 row's 1.0
    assert out[("a", 205)] is None
    # strict: right ts=50 not visible at left ts=50
    assert out[("b", 50)] is None


def test_non_strict_includes_equal_ts(spark):
    left, right = _frames(spark)
    out = _by_ts(as_of_join(left, right, ["k"], "ts", ["v"], strict=False).collect())
    assert out[("b", 50)] == 9.0


def test_tolerance_bounds_the_matched_row(spark):
    left, right = _frames(spark)
    out = _by_ts(
        as_of_join(left, right, ["k"], "ts", ["v"], tolerance=5).collect()
    )
    # nearest prior row for ts=100 is ts=90: gap 10 > 5 → null
    assert out[("a", 100)] is None
    # nearest prior row for ts=205 is ts=200: gap 5 <= 5, matched row's
    # value is NULL → null (and NOT the out-of-tolerance 1.0 from ts=90)
    assert out[("a", 205)] is None


def test_forward_direction(spark):
    left, right = _frames(spark)
    out = _by_ts(
        as_of_join(left, right, ["k"], "ts", ["v"], direction="forward").collect()
    )
    # earliest following row for ts=100 is ts=200 (value NULL)
    assert out[("a", 100)] is None
    assert out[("a", 205)] is None  # nothing after 205
    assert out[("b", 50)] is None  # strict: equal ts excluded


def test_unmatched_left_rows_keep_nulls(spark):
    left, right = _frames(spark)
    right_a_only = right.where("k = 'a'")
    out = _by_ts(as_of_join(left, right_a_only, ["k"], "ts", ["v"]).collect())
    assert out[("b", 50)] is None
