"""Relational query battery over the driver's TPC-H-ish testdata.

These exercise the generic SQL surface of the engine (SURVEY §2.2-2.6
and the §7 capability-gap list: window functions, rollup, semi/anti
joins, sessionization). Each query is written as an idiomatic
DataFrame plan — filters and projections reach the parquet scan,
dimension joins are broadcast, aggregates run partial+final.

Hash-exactness rules (vs. the DuckDB oracle):
- every SUM over a double expression is computed in DECIMAL(20, 6)
  (exact, order-insensitive) then cast back to DOUBLE;
- averages are CAST(sum AS DOUBLE) / CAST(count AS DOUBLE);
- timestamps in output are formatted to strings; time arithmetic uses
  microsecond epochs (int64) to be independent of ns-vs-us precision;
- every top-k has a total-order tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import load, ts_us


def _dsum(col: F.Column) -> F.Column:
    """Exact sum of a double expression: sum in decimal, emit double."""
    return F.sum(col.cast("decimal(20,6)")).cast("double")


# ---------------------------------------------------------------------------
# q1: pricing summary (scan + partial/final hash aggregate)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (
                F.sum(F.col("l_quantity").cast("decimal(20,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(20,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3: shipping priority (3-way join + agg + deterministic top-k)
# ---------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1997-03-15")
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1997-03-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5: regional supplier volume (6-way star join; dims broadcast)
# ---------------------------------------------------------------------------

def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# brand revenue top-k (broadcast dim join + agg + top-k)
# ---------------------------------------------------------------------------

def topk_brands_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("p_brand"))
        .limit(5)
    )


TOPK_BRANDS_SQL = """
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY revenue DESC, p_brand
LIMIT 5
"""


# ---------------------------------------------------------------------------
# window: rank orders per customer (row_number) — SURVEY §2.5 gap coverage
# ---------------------------------------------------------------------------

def window_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# window: running per-user value over the events stream table
# ---------------------------------------------------------------------------

def window_running_value(
    spark: SparkSession,
    sf_dir: str,
    time_bucket: int | None = None,
    hot_key_threshold: int | None = None,
) -> DataFrame:
    """Per-user running total via ``operators.windows.prefix_sum``;
    decimal accumulation (exact, order-insensitive) cast back to
    double at the edge. ``time_bucket`` engages the distributed
    prefix-sum hot-key guard — identical results by decimal
    associativity, gate-verified against the same oracle."""
    from ..operators.windows import prefix_sum

    e = load(spark, sf_dir, "events")
    e = e.select(
        "user_id", "event_id", ts_us(e).alias("us"),
        F.col("value").cast("decimal(20,6)").alias("v"),
    )
    return prefix_sum(
        e, ["user_id"], "us", "v", order_cols=["event_id"],
        time_bucket=time_bucket, out_col="running",
        hot_key_threshold=hot_key_threshold,
    ).select(
        "user_id", "event_id", F.col("running").cast("double").alias("running_value")
    )


def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q4-shaped order-priority check: orders in a quarter with
    at least one line item shipped after the order date. The EXISTS
    compiles to a LEFT-SEMI join with a correlated non-equi conjunct —
    the semi side never fans out, so the per-order count is exact
    without a distinct. Both join keys hash; at scale the semi join
    shuffles only (orderkey, shipdate) pairs."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q10-shaped returned-item report: revenue lost to returns
    per customer over a quarter, 4-way join (fact × orders filtered ×
    customer × broadcast nation), top 20. The two big sides join on
    their natural keys; nation broadcasts."""
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q18-shaped large-volume-customer query: orders whose total
    quantity clears a threshold (grouped HAVING on the fact), joined
    back to orders + customer. The HAVING prunes the fact to a few
    hundred keys BEFORE the joins — the classic aggregate-then-join
    ordering that keeps the join inputs tiny at scale."""
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, sum_qty
FROM (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


WINDOW_RUNNING_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(20,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
"""


# ---------------------------------------------------------------------------
# sessionization: 30-minute-gap sessions (lag + cumulative conditional sum).
# Batch twin of the streaming session-window operator; time arithmetic in
# microsecond epochs so ns-vs-us parquet precision cannot skew boundaries.
# ---------------------------------------------------------------------------

def sessionize_events(
    spark: SparkSession,
    sf_dir: str,
    time_bucket: int | None = None,
    hot_key_threshold: int | None = None,
) -> DataFrame:
    from ..operators.sessionize import sessionize

    e = load(spark, sf_dir, "events")
    e = e.select(
        "user_id", "event_id", "value", ts_us(e).alias("us")
    )
    gap = 30 * 60 * 1_000_000
    return (
        sessionize(e, ["user_id"], "us", gap, order_cols=["event_id"],
                   time_bucket=time_bucket,
                   hot_key_threshold=hot_key_threshold)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            _dsum(F.col("value")).alias("session_value"),
        )
    )


SESSIONIZE_SQL = """
WITH e AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events
), flagged AS (
  SELECT user_id, event_id, value, us,
         CASE WHEN us - LAG(us) OVER w > 1800000000 THEN 1
              WHEN LAG(us) OVER w IS NULL THEN 1
              ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), sessions AS (
  SELECT user_id, value, us,
         -- CAST: DuckDB types SUM(int) as HUGEINT, which renders as float64
         -- under a pandas/arrow fetch and breaks the driver's value hash.
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(us) AS session_start_us, MAX(us) AS session_end_us,
       CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# rollup: multi-level aggregate (grouping-sets surface)
# ---------------------------------------------------------------------------

def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(_dsum(F.col("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    pass (map-side-combined partial aggregation; one shuffle)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_rows",
        )
    )


CUBE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type — the batch
    twin of the streaming windowed aggregation (same bucketing the
    watermarked ``window()`` path produces), on integer-exact
    microsecond epochs."""
    e = load(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    return (
        e.select("event_type", ts_us(e).alias("us"), "value")
        .withColumn("window_start_us", F.expr(f"(us div {hour_us}) * {hour_us}"))
        .groupBy("event_type", "window_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("sum_value"),
        )
    )


TUMBLING_WINDOW_SQL = """
SELECT event_type,
       (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type, window_start_us
"""


def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) event-time windows: 1-hour windows every 15
    minutes, so each event lands in 4 overlapping windows — Spark's
    native ``window(size, slide)`` operator (the same fan-out the
    streaming path uses). The oracle reproduces Spark's epoch-aligned
    window assignment with integer arithmetic."""
    e = load(spark, sf_dir, "events")
    e = e.select("event_type", F.timestamp_micros(ts_us(e)).alias("ts_t"), "value")
    return (
        e.groupBy("event_type", F.window("ts_t", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "event_type",
            F.unix_micros("w.start").alias("window_start_us"),
            "n_events",
            "sum_value",
        )
    )


HOPPING_WINDOW_SQL = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, value FROM events
), fanned AS (
  SELECT event_type, us, value,
         ((us // 900000000) - j.j) * 900000000 AS window_start_us
  FROM e CROSS JOIN range(4) j(j)
  WHERE ((us // 900000000) - j.j) * 900000000 + 3600000000 > us
)
SELECT event_type, window_start_us,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
FROM fanned
GROUP BY event_type, window_start_us
"""


def skew_salted_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew join at the gate: lineitem ⋈ orders through
    salted_join (hot-key fan-out spread across 8 sub-keys), aggregated
    per priority. The oracle is the PLAIN join — salting must be
    result-identical, which is exactly what this verifies."""
    from ..operators.skew import salted_join

    l = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        salted_join(l, o, ["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


SKEW_SALTED_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# anti join: customers with no orders (SURVEY J1's left_anti pattern)
# ---------------------------------------------------------------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# semi join: suppliers that shipped a large-quantity item (left_semi)
# ---------------------------------------------------------------------------

def suppliers_with_large_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name", "s_acctbal"
    )


SEMI_JOIN_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
"""


# ---------------------------------------------------------------------------
# pivot (conditional aggregation): per-user event-type counts + JSON prop
# extraction (events.props is a JSON string column)
# ---------------------------------------------------------------------------

def pivot_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    aggs = [
        F.sum(F.when(F.col("event_type") == k, 1).otherwise(0)).alias(f"n_{k}") for k in kinds
    ]
    aggs.append(
        F.max(F.get_json_object("props", "$.k").cast("bigint")).alias("max_prop_k")
    )
    return e.groupBy("user_id").agg(*aggs)


PIVOT_SQL = """
SELECT user_id,
       -- CAST: DuckDB SUM(int) is HUGEINT → float64 under a pandas fetch;
       -- Spark returns BIGINT, so pin the oracle to BIGINT for hash parity.
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_prop_k
FROM events
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# q7-shaped: shipping volume between two nations, both directions, by
# year. Two independent nation lookups (supplier side and customer
# side) with a disjunctive pair filter.
# ---------------------------------------------------------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q7-shaped bi-national volume report. The fact joins
    supplier and orders→customer on their natural keys; both nation
    lookups broadcast (25 rows), so the pair filter
    ``(supp, cust) ∈ {(A,B),(B,A)}`` is evaluated map-side right after
    the broadcast joins — no extra shuffle beyond the two big-key
    joins Catalyst already needs. At 100 TB the disjunction prunes to
    ~2/625 of the fact before the final aggregate."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS volume
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# q14-shaped: promo revenue share — a ratio of two conditional sums in
# one aggregate pass (no self-join, no second scan).
# ---------------------------------------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q14-shaped promotion-revenue share for one month. Both the
    conditional (PROMO) sum and the total come out of ONE aggregate
    over the part join — the naive two-query formulation would scan
    the fact twice. The part side carries only (partkey, is-promo) —
    one boolean per part row — so its shuffle weight is minimal; at
    warehouse scale the same plan holds hash-to-hash (part is a real
    table, not a broadcastable dim, at SF100k). Sums are decimal-exact
    and the final ratio is one double division, identical in both
    engines."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = load(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = l.join(p, l.l_partkey == p.p_partkey).agg(
        _dsum(F.when(F.col("is_promo"), rev).otherwise(F.lit(0.0))).alias("promo"),
        _dsum(rev).alias("total"),
    )
    return agg.select(
        ((F.lit(100.0) * F.col("promo")) / F.col("total")).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT (100.0 * promo) / total AS promo_revenue_pct
FROM (
  SELECT
    CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))
             ELSE CAST(0.0 AS DECIMAL(20,6)) END) AS DOUBLE) AS promo,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS total
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
) t
"""


# ---------------------------------------------------------------------------
# q16-shaped: distinct-supplier counts per (brand, size) excluding a
# NOT-IN supplier denylist — distinct agg over a join, NULL-safe anti.
# ---------------------------------------------------------------------------

def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q16-shaped supplier-diversity report: how many distinct
    suppliers ship each (brand, size) family, excluding denylisted
    suppliers (acctbal < 0 — the 'complaints' analog). The NOT IN
    compiles to a broadcast anti-join (denylist is tiny by
    construction); the COUNT(DISTINCT) expands to Spark's two-phase
    distinct aggregate — partial distinct on (brand, size, suppkey)
    map-side, so the shuffle carries deduplicated triples, not raw
    fact rows. s_suppkey is non-null so NOT IN ≡ anti-join with no
    null-trap."""
    p = load(spark, sf_dir, "part").where(
        (F.col("p_type") != "PROMO") & (F.col("p_size").isin(1, 4, 9, 14, 19, 23))
    ).select("p_partkey", "p_brand", "p_size")
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    deny = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(deny), l.l_suppkey == deny.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# ---------------------------------------------------------------------------
# q17-shaped: small-quantity revenue — correlated per-part average as
# an aggregate-then-rejoin (no per-row subquery execution).
# ---------------------------------------------------------------------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q17-shaped small-order revenue: lines of one brand whose
    quantity is below 20% of that part's average quantity. The
    correlated AVG decorrelates into one aggregate over the
    brand-pruned fact joined back on partkey — the brand filter
    applies BEFORE the average is computed (both engines scope the
    subquery to the filtered parts, and pruning first means the avg
    aggregate reads ~1/25 of the fact). The avg is derived
    decimal-sum / count so the 0.2× threshold is bit-identical."""
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = lp.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    )
    return (
        lp.join(F.broadcast(avg_q), lp.l_partkey == avg_q.a_partkey)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part ON l_partkey = p_partkey
JOIN (
  SELECT l_partkey AS a_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
  GROUP BY l_partkey
) a ON l.l_partkey = a.a_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < 0.2 * avg_qty
"""


# ---------------------------------------------------------------------------
# q2-shaped: cheapest-supplier lookup — correlated MIN over a derived
# part×supplier cost table, decorrelated to aggregate + equality join.
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q2-shaped minimum-cost supplier: for each size-50 part,
    the supplier(s) whose average sale price for that part is the
    part's minimum. The testdata has no partsupp table, so the
    part×supplier cost relation is derived from the fact once
    (groupBy(partkey, suppkey)) — the correlated ``MIN(cost) WHERE
    ps_partkey = p_partkey`` then decorrelates into a second
    aggregate over the SAME derived table plus an equality join, so
    the fact is scanned once, not once per part. Cost is decimal-sum /
    count: bit-identical in both engines, making the MIN-equality
    exact. All joins after the derive are on partkey — one shuffle
    partitioning reused end-to-end."""
    p = load(spark, sf_dir, "part").where(F.col("p_size") == 50).select(
        "p_partkey", "p_name"
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    ps = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(20,6)")).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(20,6)")).cast("double")
            ).alias("unit_cost")
        )
    )
    best = ps.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        ps.join(
            best,
            (ps.l_partkey == best.m_partkey) & (ps.unit_cost == best.min_cost),
        )
        .join(p, ps.l_partkey == F.col("p_partkey"))
        .join(s, ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
        .orderBy("p_partkey", "s_name")
    )


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS unit_cost
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 50)
  GROUP BY l_partkey, l_suppkey
)
SELECT p_partkey, p_name, s_name, n_name, unit_cost
FROM ps
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size = 50
  AND unit_cost = (SELECT MIN(unit_cost) FROM ps i WHERE i.l_partkey = ps.l_partkey)
ORDER BY p_partkey, s_name
"""


# ---------------------------------------------------------------------------
# q15-shaped: top supplier — argmax against a global MAX scalar over an
# aggregated view (ties kept, exact by decimal sums).
# ---------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q15-shaped top-revenue supplier: quarterly revenue per
    supplier, keep the supplier(s) equal to the global max. The view
    aggregates the fact once; the scalar MAX is a single-row
    broadcast crossed onto the view — no second scan of the fact, no
    window over an unpartitioned ORDER BY (which would funnel every
    row through one task at scale). Revenue is decimal-exact so the
    equality keeps exact ties like the SQL does."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = l.groupBy(F.col("l_suppkey").alias("r_suppkey")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.max_revenue)
        .join(s, F.col("r_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "s_acctbal", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS r_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, s_acctbal, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = r_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q19-shaped: disjunctive multi-clause predicate across a join — tests
# that an OR of conjunctions still prunes at the scan.
# ---------------------------------------------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q19-shaped disjunctive-predicate revenue: an OR of three
    (brand, size-range, quantity-range) clause groups evaluated
    across the lineitem×part join. Written as one boolean expression
    so Catalyst can extract the common l_quantity bounds and push the
    part-only conjuncts (brand+size) below the join — the join input
    is pre-pruned on both sides rather than filtered after the fact.
    One row out; decimal-exact sum."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(p, l.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(clause).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# q21-shaped: sole late shipper — EXISTS + NOT EXISTS folded into ONE
# per-order aggregate instead of two correlated self-joins.
# ---------------------------------------------------------------------------

def q21_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q21-shaped 'suppliers who kept waiting': suppliers that
    were the ONLY late shipper in a multi-supplier finished order
    (late = shipped >60 days after the order date). The classic form
    is EXISTS(other supplier) AND NOT EXISTS(other late supplier) —
    two more scans of the fact. Here both predicates fold into ONE
    per-(order, supplier) aggregate followed by a per-order count:
    n_supps > 1 AND n_late_supps == 1 AND this supplier is the late
    one — one shuffle on orderkey replaces two correlated self-joins.
    At 100 TB that is the difference between 1 and 3 fact shuffles."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    late_us = 60 * 86400 * 1_000_000  # 60 days in microseconds
    per_supp = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            (
                F.unix_micros(F.col("l_shipdate").cast("timestamp"))
                - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            )
            > late_us
        ).alias("is_late")
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("p_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum(F.col("is_late").cast("int")).alias("n_late"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(per_order, per_supp.l_orderkey == per_order.p_orderkey)
        .where(F.col("is_late") & (F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(s, per_supp.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
    )


Q21_SQL = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate) > CAST(60*86400 AS BIGINT)*1000000
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey AS p_orderkey,
         COUNT(*) AS n_supps,
         SUM(is_late) AS n_late
  FROM per_supp GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_supp
JOIN per_order ON l_orderkey = p_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE is_late = 1 AND n_supps > 1 AND n_late = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
"""


# ---------------------------------------------------------------------------
# q22-shaped: dormant high-balance customers — scalar AVG subquery +
# anti-join, grouped by a derived code.
# ---------------------------------------------------------------------------

def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q22-shaped global-sales-opportunity: customers with
    above-average positive balance and NO orders at all, grouped by a
    derived country code (nationkey mod 10 — the testdata has no
    phone column). The scalar AVG is one tiny broadcast row; the NOT
    EXISTS is a left-anti join against just the orders keys. The
    anti-join is the only fact-sized shuffle; the comparison happens
    after the broadcast, map-side."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_nationkey")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "1999-01-01"
    ).select("o_custkey")
    return (
        c.join(F.broadcast(avg_bal), c.c_acctbal > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
SELECT c_nationkey % 10 AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY cntrycode
ORDER BY cntrycode
"""


# ---------------------------------------------------------------------------
# daily active users: distinct-count aggregation on the event stream —
# the batch twin of the classic streaming DAU rollup.
# ---------------------------------------------------------------------------

def events_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + event volume. The day index is integer
    epoch-microsecond division (timezone- and parquet-precision-proof,
    see ts_us). COUNT(DISTINCT user_id) expands to Spark's two-phase
    distinct: partial dedup of (day, user) map-side, so the shuffle
    carries distinct pairs — at 100 TB that is bounded by
    days × users, not by event count. For cardinalities where even
    that is too hot, approx_count_distinct is the documented
    trade-off (tests/test_sketches.py); the gate pins the exact
    variant."""
    e = load(spark, sf_dir, "events")
    return (
        e.select((ts_us(e) / F.lit(86_400_000_000)).cast("long").alias("day_idx"),
                 "user_id", "event_id")
        .groupBy("day_idx")
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("day_idx")
    )


DAU_SQL = """
SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY day_idx
ORDER BY day_idx
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_volume": q5_region_volume,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_priority_late_ship": q4_priority_late_ship,
    "q7_nation_volume": q7_nation_volume,
    "q10_returned_revenue": q10_returned_revenue,
    "q14_promo_revenue": q14_promo_revenue,
    "q16_parts_supplier_counts": q16_parts_supplier_counts,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_orders": q18_large_volume_orders,
    "q15_top_supplier": q15_top_supplier,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q21_sole_late_shipper": q21_sole_late_shipper,
    "q22_dormant_customers": q22_dormant_customers,
    "topk_brands_by_revenue": topk_brands_by_revenue,
    "window_order_rank": window_order_rank,
    "window_running_value": window_running_value,
    # hot-key-guarded running sum: distributed prefix sum over
    # (user, 1h bucket); decimal associativity makes it exactly equal
    "window_running_value_bucketed": (
        lambda spark, sf_dir: window_running_value(
            spark, sf_dir, time_bucket=3_600_000_000
        )
    ),
    "sessionize_events": sessionize_events,
    # hot-key-guarded sessionize under the oracle gate: distributed
    # prefix-sum over (user, 1h bucket); must equal the plain scan
    "sessionize_events_bucketed": (
        lambda spark, sf_dir: sessionize_events(
            spark, sf_dir, time_bucket=3_600_000_000
        )
    ),
    # hot-key ROUTED variant (r5): only keys with >=500 events take the
    # bucketed path, the rest the plain window; same oracle — the
    # routed union must be exactly the plain result
    "sessionize_events_hotkey": (
        lambda spark, sf_dir: sessionize_events(
            spark, sf_dir, time_bucket=3_600_000_000, hot_key_threshold=500
        )
    ),
    "window_running_value_hotkey": (
        lambda spark, sf_dir: window_running_value(
            spark, sf_dir, time_bucket=3_600_000_000, hot_key_threshold=500
        )
    ),
    "rollup_returns": rollup_returns,
    "cube_revenue": cube_revenue,
    "tumbling_window_counts": tumbling_window_counts,
    "hopping_window_counts": hopping_window_counts,
    "skew_salted_order_totals": skew_salted_order_totals,
    "customers_without_orders": customers_without_orders,
    "suppliers_with_large_shipments": suppliers_with_large_shipments,
    "pivot_user_events": pivot_user_events,
    "events_daily_active_users": events_daily_active_users,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_region_volume": Q5_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q4_priority_late_ship": Q4_SQL,
    "q7_nation_volume": Q7_SQL,
    "q10_returned_revenue": Q10_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q16_parts_supplier_counts": Q16_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q18_large_volume_orders": Q18_SQL,
    "q15_top_supplier": Q15_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q21_sole_late_shipper": Q21_SQL,
    "q22_dormant_customers": Q22_SQL,
    "topk_brands_by_revenue": TOPK_BRANDS_SQL,
    "window_order_rank": WINDOW_RANK_SQL,
    "window_running_value": WINDOW_RUNNING_SQL,
    "window_running_value_bucketed": WINDOW_RUNNING_SQL,
    "window_running_value_hotkey": WINDOW_RUNNING_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "sessionize_events_bucketed": SESSIONIZE_SQL,
    "sessionize_events_hotkey": SESSIONIZE_SQL,
    "rollup_returns": ROLLUP_SQL,
    "cube_revenue": CUBE_SQL,
    "tumbling_window_counts": TUMBLING_WINDOW_SQL,
    "hopping_window_counts": HOPPING_WINDOW_SQL,
    "skew_salted_order_totals": SKEW_SALTED_SQL,
    "customers_without_orders": ANTI_JOIN_SQL,
    "suppliers_with_large_shipments": SEMI_JOIN_SQL,
    "pivot_user_events": PIVOT_SQL,
    "events_daily_active_users": DAU_SQL,
}
