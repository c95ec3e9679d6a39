"""Unit tests for exact time-decayed engagement scoring and session
path mining."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

HL = 100  # half-life in "us" for tests
REF = 1000


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, us long, cents long")


def test_decay_weights_are_powers_of_two(spark):
    from bunsen_spark.operators.engagement import decayed_counts

    # ages: 0 -> bucket 0 -> 2^30; 150 -> bucket 1 -> 2^29;
    # 250 -> bucket 2 -> 2^28
    e = _events(
        spark, [(1, REF, 10), (1, REF - 150, 10), (1, REF - 250, 10)]
    )
    [r] = decayed_counts(
        e, "user_id", "us", REF, HL, value_cents="cents"
    ).collect()
    assert r.n_events == 3
    assert r.decayed_weight == 2**30 + 2**29 + 2**28
    assert r.decayed_value == 10 * (2**30 + 2**29 + 2**28)


def test_decay_old_events_contribute_zero(spark):
    from bunsen_spark.operators.engagement import decayed_counts

    e = _events(spark, [(1, REF - 31 * HL, 5), (1, REF, 5)])
    [r] = decayed_counts(e, "user_id", "us", REF, HL).collect()
    assert r.n_events == 2
    assert r.decayed_weight == 2**30  # only the fresh event


def test_decay_future_events_clamped_to_now(spark):
    from bunsen_spark.operators.engagement import decayed_counts

    e = _events(spark, [(1, REF + 500, 5)])
    [r] = decayed_counts(e, "user_id", "us", REF, HL).collect()
    assert r.decayed_weight == 2**30  # clamped, not amplified


def test_decay_partition_order_invariant(spark):
    from bunsen_spark.operators.engagement import decayed_counts

    rows = [(1, REF - 13 * i, (i % 7) + 1) for i in range(500)]
    e1 = _events(spark, rows).repartition(1)
    e2 = _events(spark, rows[::-1]).repartition(16)
    r1 = decayed_counts(e1, "user_id", "us", REF, HL, "cents").collect()[0]
    r2 = decayed_counts(e2, "user_id", "us", REF, HL, "cents").collect()[0]
    assert (r1.decayed_weight, r1.decayed_value) == (
        r2.decayed_weight,
        r2.decayed_value,
    )


def test_decay_rejects_bad_args(spark):
    from bunsen_spark.operators.engagement import decayed_counts

    e = _events(spark, [(1, 1, 1)])
    with pytest.raises(ValueError):
        decayed_counts(e, "user_id", "us", REF, 0)
    with pytest.raises(ValueError):
        decayed_counts(e, "user_id", "us", REF, HL, max_half_lives=64)


def _sessions(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, session_id long, us long, step string"
    )


def test_session_paths_basic(spark):
    from bunsen_spark.operators.engagement import session_path_counts

    e = _sessions(
        spark,
        [
            (1, 1, 10, "view"),
            (1, 1, 20, "click"),
            (1, 1, 30, "buy"),
            (1, 1, 40, "view"),
            (2, 1, 10, "view"),
            (2, 1, 20, "click"),
            (2, 1, 30, "buy"),
        ],
    )
    got = {
        r.path: r.n_paths
        for r in session_path_counts(
            e, "user_id", "us", "session_id", "step", depth=3
        ).collect()
    }
    assert got == {"view>click>buy": 2, "click>buy>view": 1}


def test_session_paths_do_not_cross_sessions(spark):
    from bunsen_spark.operators.engagement import session_path_counts

    e = _sessions(
        spark,
        [
            (1, 1, 10, "a"),
            (1, 1, 20, "b"),
            (1, 2, 30, "c"),  # new session: no a>b>c path
            (1, 2, 40, "d"),
            (1, 2, 50, "e"),
        ],
    )
    got = {
        r.path: r.n_paths
        for r in session_path_counts(
            e, "user_id", "us", "session_id", "step", depth=3
        ).collect()
    }
    assert got == {"c>d>e": 1}


def test_session_paths_depth_two(spark):
    from bunsen_spark.operators.engagement import session_path_counts

    e = _sessions(spark, [(1, 1, 10, "a"), (1, 1, 20, "b"), (1, 1, 30, "a")])
    got = {
        r.path: r.n_paths
        for r in session_path_counts(
            e, "user_id", "us", "session_id", "step", depth=2
        ).collect()
    }
    assert got == {"a>b": 1, "b>a": 1}


def test_session_paths_rejects_depth_one(spark):
    from bunsen_spark.operators.engagement import (
        session_path_counts,
        session_path_counts_sql,
    )

    e = _sessions(spark, [(1, 1, 10, "a")])
    with pytest.raises(ValueError):
        session_path_counts(e, "user_id", "us", "session_id", "step", depth=1)
    with pytest.raises(ValueError):
        session_path_counts_sql("x", "user_id", "us", "session_id", "step", 1)


def test_rfm_bins_ordering(spark):
    from bunsen_spark.operators.engagement import rfm_segments

    rows = []
    # 10 users: user i has last_us=i*100, i+1 events, cents sum rising
    for u in range(10):
        for j in range(u + 1):
            rows.append((u, u * 100 + j, (u + 1) * 10))
    e = _events(spark, rows)
    out = {r.user_id: r for r in rfm_segments(e, "user_id", "us", "cents").collect()}
    # monotone metrics -> monotone bins
    for a in range(9):
        assert out[a].r_bin <= out[a + 1].r_bin
        assert out[a].f_bin <= out[a + 1].f_bin
        assert out[a].m_bin <= out[a + 1].m_bin
    # 10 users into 5 bins -> exactly 2 per bin
    from collections import Counter

    assert Counter(r.f_bin for r in out.values()) == {b: 2 for b in range(1, 6)}


def test_rfm_rejects_bad_bins(spark):
    from bunsen_spark.operators.engagement import rfm_segments

    e = _events(spark, [(1, 1, 1)])
    with pytest.raises(ValueError):
        rfm_segments(e, "user_id", "us", "cents", n_bins=1)


def test_session_paths_null_steps_filtered_consistently(spark):
    # NULL steps are dropped BEFORE the window (round-6 ADVICE fix):
    # concat_ws would silently shorten a>NULL>c to a>c while the SQL
    # twin's || would NULL the whole path — both engines now path over
    # the non-NULL step sequence.
    import duckdb

    from bunsen_spark.operators.engagement import (
        session_path_counts,
        session_path_counts_sql,
    )

    rows = [
        (1, 1, 10, "a"), (1, 1, 20, None), (1, 1, 30, "b"),
        (1, 1, 40, "c"), (2, 1, 10, None), (2, 1, 20, None),
    ]
    e = _sessions(spark, rows)
    got = {
        r.path: r.n_paths
        for r in session_path_counts(
            e, "user_id", "us", "session_id", "step", depth=3
        ).collect()
    }
    # the NULL at us=20 is removed from the sequence, so user 1's
    # non-NULL steps a,b,c form exactly one depth-3 path
    assert got == {"a>b>c": 1}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (user_id BIGINT, session_id BIGINT,"
        " us BIGINT, step VARCHAR)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?)", rows)
    sql = session_path_counts_sql(
        "SELECT * FROM ev", "user_id", "us", "session_id", "step", depth=3
    )
    assert dict(con.execute(sql).fetchall()) == got


@pytest.mark.slow
def test_rfm_matches_ntile_exactly(spark):
    """The arithmetic bin assignment must reproduce SQL ntile for
    uneven splits (N mod n_bins != 0) and the degenerate N < n_bins
    case — the shapes the distributed rewrite must not drift on."""
    from bunsen_spark.operators.engagement import rfm_segments

    for n_users, n_bins in [(7, 5), (3, 5), (12, 5), (5, 5), (1, 2)]:
        rows = [(u, u * 100 + j, (u + 1) * 10)
                for u in range(n_users) for j in range(u + 1)]
        e = _events(spark, rows)
        got = {
            r.user_id: (r.r_bin, r.f_bin, r.m_bin)
            for r in rfm_segments(e, "user_id", "us", "cents", n_bins).collect()
        }
        e.createOrReplaceTempView("__rfm_e")
        want = {
            r.user_id: (r.r_bin, r.f_bin, r.m_bin)
            for r in spark.sql(f"""
                WITH per_key AS (
                  SELECT user_id, CAST(max(us) AS BIGINT) AS last_us,
                         CAST(count(*) AS BIGINT) AS n_events,
                         CAST(sum(CAST(cents AS BIGINT)) AS BIGINT) AS cents
                  FROM __rfm_e GROUP BY user_id)
                SELECT user_id,
                  CAST(ntile({n_bins}) OVER (ORDER BY last_us, user_id) AS BIGINT) r_bin,
                  CAST(ntile({n_bins}) OVER (ORDER BY n_events, user_id) AS BIGINT) f_bin,
                  CAST(ntile({n_bins}) OVER (ORDER BY cents, user_id) AS BIGINT) m_bin
                FROM per_key""").collect()
        }
        assert got == want, (n_users, n_bins)


def test_rfm_null_key_and_null_metric_match_duckdb(spark):
    """A NULL key forms its own group (groupBy semantics) and must
    survive to the output — the old inner join on the key silently
    dropped it (ADVICE r7) — and an all-NULL metric group must bin
    where DuckDB's ntile puts it (ASC NULLS LAST there, vs Spark's
    NULLS FIRST default)."""
    import duckdb

    from bunsen_spark.operators.engagement import rfm_segments, rfm_segments_sql

    rows = [
        (1, 100, 50),
        (1, 200, 70),
        (2, 150, None),  # all-NULL cents group -> cents sum NULL
        (3, 300, 10),
        (None, 250, 20),  # NULL key group
        (4, 50, 90),
    ]
    e = _events(spark, rows)
    got = {
        (r.user_id, r.r_bin, r.f_bin, r.m_bin)
        for r in rfm_segments(e, "user_id", "us", "cents", 3).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE __e(user_id BIGINT, us BIGINT, cents BIGINT)"
    )
    con.executemany("INSERT INTO __e VALUES (?, ?, ?)", rows)
    sql = rfm_segments_sql("SELECT * FROM __e", "user_id", "us", "cents", 3)
    want = {
        (r[0], r[4], r[5], r[6]) for r in con.execute(sql).fetchall()
    }
    assert got == want
    assert any(u is None for u, *_ in got)  # the NULL-key row survived


def test_global_row_number_exact(spark):
    from bunsen_spark.operators.windows import global_row_number
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        (F.col("id") * 2654435761 % 997).alias("v"), F.col("id").alias("k")
    ).repartition(13)
    out = global_row_number(df, [F.col("v").asc(), F.col("k").asc()], "rn")
    rows = sorted((r.v, r.k, r.rn) for r in out.collect())
    expect = sorted((r.v, r.k) for r in df.collect())
    assert [r[2] for r in rows] == list(range(1, 1001))
    assert [(r[0], r[1]) for r in rows] == expect
