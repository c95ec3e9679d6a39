"""Range (interval) join — with as-of joins, the second join family the
reference lacks (SURVEY §2.3 "range/as-of joins: not implemented").

A naive ``l.ts - W <= r.ts < l.ts`` condition forces Spark into a
broadcast-nested-loop or cartesian plan. The scalable form is
BUCKETING: quantize time into width-``W`` buckets, replicate the right
side into its own bucket and the NEXT one (every left row's window
spans at most those two), equi-join on (key, bucket), then refine with
the exact predicate. The join is hash-based with fan-out 2×|right|, no
nested loop — the same trick DuckDB/kdb apply natively for ASOF/range,
expressed in plain DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window: int,
) -> DataFrame:
    """Pairs (l, r) sharing ``on`` keys with ``l.left_ts - window <=
    r.right_ts < l.left_ts`` (strictly-prior rows within the window;
    timestamps are integers in any unit). Returns left columns + right
    columns (names must not collide apart from ``on``)."""
    bucket_l = (F.col(left_ts) / window).cast("long")
    bucket_r = (F.col(right_ts) / window).cast("long")
    l = left.withColumn("__b", bucket_l)
    r = right.withColumn(
        "__b", F.explode(F.array(bucket_r, bucket_r + 1))
    )
    joined = l.join(r, [*on, "__b"]).where(
        (F.col(right_ts) >= F.col(left_ts) - window)
        & (F.col(right_ts) < F.col(left_ts))
    )
    return joined.drop("__b")


def sweep_line_peak(
    intervals: DataFrame,
    group_col: str,
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """Peak CONCURRENCY per group over a set of closed intervals — the
    sweep-line algorithm as two window functions: every interval emits
    a +1 boundary at its start and a -1 at its end, the running sum in
    (time, +1-before--1) order is the live-interval count at each
    instant, and the per-group max is the peak. Closed-interval
    convention: an interval starting exactly when another ends counts
    as concurrent (starts sort before ends on ties).

    THE scale answer for overlap COUNTING: the pairwise overlap join is
    Θ(output pairs) — quadratic when everything overlaps — while the
    sweep is one sort of 2·n boundary rows per group, regardless of how
    dense the overlap graph is. Output: (group, peak, at_us) with
    ``at_us`` the earliest instant attaining the peak."""
    from pyspark.sql import Window

    bounds = intervals.select(
        F.col(group_col),
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("us"), F.lit(1).alias("delta")
                ),
                F.struct(F.col(end_col).alias("us"), F.lit(-1).alias("delta")),
            )
        ).alias("b"),
    ).select(group_col, "b.us", "b.delta")
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.asc("us"), F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    live = bounds.withColumn("live", F.sum("delta").over(w).cast("long"))
    live = live.withColumn(
        "__mx", F.max("live").over(Window.partitionBy(group_col))
    )
    return (
        live.groupBy(group_col)
        .agg(
            F.max("live").alias("peak"),
            F.min(F.when(F.col("live") == F.col("__mx"), F.col("us")))
            .cast("long")
            .alias("at_us"),
        )
    )


def sweep_line_peak_sql(
    intervals_sql: str,
    group_col: str,
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> str:
    return f"""
WITH iv AS ({intervals_sql}),
bounds AS (
  SELECT {group_col}, {start_col} AS us, 1 AS delta FROM iv
  UNION ALL
  SELECT {group_col}, {end_col} AS us, -1 AS delta FROM iv
),
live AS (
  SELECT {group_col}, us,
         CAST(sum(delta) OVER (
             PARTITION BY {group_col} ORDER BY us, delta DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS live
  FROM bounds
)
SELECT {group_col}, CAST(max(live) AS BIGINT) AS peak,
       CAST(min(CASE WHEN live = mx THEN us END) AS BIGINT) AS at_us
FROM (SELECT *, max(live) OVER (PARTITION BY {group_col}) AS mx FROM live)
GROUP BY {group_col}
"""


def _floor_div_sql(x: str, b: int) -> str:
    """Exact int64 floor-division expression for Spark SQL (``pmod``
    makes the numerator divisible, so ``div``'s truncation IS floor).
    Stays in integer arithmetic — no double round-trip, exact for any
    int64 timestamp, positive or pre-epoch."""
    if b <= 0:
        raise ValueError("bucket width must be positive")
    return f"(({x}) - pmod({x}, {b})) div {b}"


def _floor_div_duck(x: str, b: int) -> str:
    """The same exact floor division spelled for DuckDB (no pmod
    builtin; ``%`` is remainder, so fold it positive by hand)."""
    if b <= 0:
        raise ValueError("bucket width must be positive")
    return f"(({x}) - ((({x}) % {b} + {b}) % {b})) // {b}"


def interval_overlap_pairs(
    intervals: DataFrame,
    id_col: str,
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Self interval-OVERLAP join: all unordered pairs of intervals
    (different ``id_col``) that intersect in time, with the exact
    closed-interval overlap length. The scale plan is time-bucketed:
    each interval explodes into its covered buckets, candidates join
    per bucket, and each true pair is emitted EXACTLY ONCE — in the
    canonical bucket containing the overlap's left edge
    (``greatest(starts) div bucket``) — so there is NO distinct over
    the pair table. Candidate volume per bucket is occupancy², the
    interval-join literature's standard bound; size ``bucket_us`` to
    the typical interval length.

    Output: (a_id, b_id, overlap_us) with a_id < b_id,
    ``overlap_us = least(ends) - greatest(starts)`` (>= 0; 0 means
    they touch at a point under the closed convention).

    Bucket ids use EXACT integer floor division (``(x - pmod(x, b))
    div b``), not ``div``: truncate-toward-zero would make bucket 0
    span (-b, b) and leave the bucket grid engine-version-dependent
    for pre-epoch timestamps. The SQL twin spells the identical floor
    out with ``%``-based pmod, so both engines agree on every int64
    input with no float round-trip."""
    fd_s = _floor_div_sql(start_col, bucket_us)
    fd_e = _floor_div_sql(end_col, bucket_us)
    buck = intervals.select(
        F.col(id_col),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
        F.explode(F.sequence(F.expr(fd_s), F.expr(fd_e))).alias("bk"),
    )
    a, b = buck.alias("a"), buck.alias("b")
    pair_start = F.greatest(F.col("a.s"), F.col("b.s"))
    return (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # true overlap (closed intervals)
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e"))
            # canonical-bucket dedup: only the bucket holding the
            # overlap's left edge emits the pair
            & (
                F.expr(_floor_div_sql("greatest(a.s, b.s)", bucket_us))
                == F.col("a.bk")
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            (
                F.least(F.col("a.e"), F.col("b.e")) - pair_start
            ).cast("long").alias("overlap_us"),
        )
    )


def interval_overlap_pairs_sql(
    intervals_sql: str,
    id_col: str,
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 3_600_000_000,
) -> str:
    fd_s = _floor_div_duck(start_col, bucket_us)
    fd_e = _floor_div_duck(end_col, bucket_us)
    fd_left = _floor_div_duck("greatest(a.s, b.s)", bucket_us)
    return f"""
WITH iv AS ({intervals_sql}),
buck AS (
  SELECT {id_col}, {start_col} AS s, {end_col} AS e,
         unnest(generate_series({fd_s}, {fd_e})) AS bk
  FROM iv
)
SELECT a.{id_col} AS a_id, b.{id_col} AS b_id,
       CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT) AS overlap_us
FROM buck a JOIN buck b
  ON a.bk = b.bk AND a.{id_col} < b.{id_col}
 AND a.s <= b.e AND b.s <= a.e
 AND {fd_left} = a.bk
"""
