"""Second battery of TPC-H-shaped relational queries (q6, q8, q9, q11,
q12, q13, q20) over the driver's testdata.

The testdata has no ``partsupp`` table and no
shipmode/commitdate/receiptdate columns, so — exactly like the existing
q2/q16/q21 entries — the queries that depend on them are "-shaped"
adaptations: the *plan shape* (scalar subquery + HAVING, double
aggregation, conditional counts, semi-join with correlated aggregate)
is the thing under test, with available columns standing in for the
missing ones. Each docstring names the substitution.

Hash-exactness follows relational.py's rules: decimal(20,6) sums cast
back to double, double division of identical operands, epoch-us time
arithmetic, total-order tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load


def _dsum(col: F.Column) -> F.Column:
    return F.sum(col.cast("decimal(20,6)")).cast("double")


# ---------------------------------------------------------------------------
# q6: forecast revenue change — the purest scan-filter-aggregate in the
# suite. All three predicates push to the parquet scan (min/max row-group
# pruning on l_shipdate); the aggregate is a single partial+final sum with
# no shuffle beyond the 1-row exchange.
# ---------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(_dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(20,6))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q8: national market share — a two-level aggregate over a 7-table star
# join. All five dimension tables broadcast; the only fact-sized shuffle
# is the final groupBy(year). The share is a conditional sum over the
# same rows as the total, so it is one aggregate, not two joined ones.
# ---------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of supplier nation NATION_2 within ASIA-customer
    orders of ECONOMY-type parts, by order year. Numerator and
    denominator are computed in the same aggregate (CASE inside SUM) —
    the classic decorrelation of q8's nested SELECT."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                                   F.col("n_name").alias("supp_nation"))),
              F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
    )
    j = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", F.col("volume"))
                    .otherwise(F.lit(0.0))
                    .cast("decimal(20,6)")
                ).cast("double")
                / F.sum(F.col("volume").cast("decimal(20,6)")).cast("double")
            ).alias("mkt_share"),
            _dsum(F.col("volume")).alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_2'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0.0 END AS DECIMAL(20,6))) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE)
         AS mkt_share,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE)
         AS total_volume
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# q9-shaped: product-type profit by supplier nation and year. The
# testdata has no partsupp.ps_supplycost, so cost is proxied as
# 0.6 * p_retailprice * l_quantity (named in the docstring; the shape —
# LIKE-filtered part dimension, 4-way join, two-key aggregate — is
# unchanged from TPC-H q9).
# ---------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on '%gear%' parts grouped by (supplier nation, order
    year). part and nation broadcast; orders joins on the fact key.
    The profit expression is evaluated row-side before the aggregate
    so the decimal sum sees identical doubles in both engines."""
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(_dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS DECIMAL(20,6))) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# q11-shaped: important part values — group-aggregate + scalar-subquery
# threshold (HAVING sum > fraction * global total). The testdata has no
# partsupp, so "value" is shipped revenue by EUROPE-nation suppliers.
# The global total is one broadcast row; the comparison happens map-side
# after the per-part aggregate — no second fact scan.
# ---------------------------------------------------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"),
    ).join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    per_part = l.groupBy("l_partkey").agg(_dsum(F.col("value")).alias("part_value"))
    total = per_part.agg(
        F.sum(F.col("part_value").cast("decimal(20,6)")).cast("double").alias("total_value")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.lit(0.00125) * F.col("total_value"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE)
           AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > 0.00125 * (
    SELECT CAST(SUM(CAST(part_value AS DECIMAL(20,6))) AS DOUBLE) FROM per_part
  )
ORDER BY part_value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# q12-shaped: late-shipment priority counts. No l_shipmode /
# l_receiptdate in the testdata, so the group key is l_returnflag and
# "late" is shipdate > orderdate + 60 days (epoch-us arithmetic, like
# q21). The shape — fact join + CASE-conditional counts — is q12's.
# ---------------------------------------------------------------------------

def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    late_us = 60 * 86400 * 1_000_000
    j = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).where(
        (
            F.unix_micros(F.col("l_shipdate").cast("timestamp"))
            - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        )
        > late_us
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND epoch_us(l_shipdate) - epoch_us(o_orderdate) > CAST(60*86400 AS BIGINT)*1000000
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q13: customer order-count distribution — LEFT OUTER join + double
# aggregation (count per customer, then histogram of counts). The
# priority filter stands in for q13's comment NOT LIKE. The outer join
# shuffles on custkey once; the histogram aggregate is tiny.
# ---------------------------------------------------------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# q20-shaped: suppliers with significant shipped volume of 'red %'
# parts. No partsupp.ps_availqty, so the correlated "availqty > half of
# shipped" becomes "supplier's shipped qty of red parts exceeds 1% of
# the global shipped qty of red parts" — the same semi-join-against-
# aggregate shape with a broadcast scalar threshold.
# ---------------------------------------------------------------------------

def q20_significant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("red %")).select("p_partkey")
    l = (
        load(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    per_supp = l.groupBy("l_suppkey").agg(_dsum(F.col("l_quantity")).alias("shipped_qty"))
    total = per_supp.agg(
        F.sum(F.col("shipped_qty").cast("decimal(20,6)")).cast("double").alias("total_qty")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(F.broadcast(total))
        .where(F.col("shipped_qty") > F.lit(0.01) * F.col("total_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "shipped_qty")
        .orderBy("s_name")
    )


Q20_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS shipped_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red %'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, shipped_qty
FROM per_supp
JOIN supplier ON l_suppkey = s_suppkey
WHERE shipped_qty > 0.01 * (
    SELECT CAST(SUM(CAST(shipped_qty AS DECIMAL(20,6))) AS DOUBLE) FROM per_supp
  )
ORDER BY s_name
"""


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_priority_shipping": q12_priority_shipping,
    "q13_customer_distribution": q13_customer_distribution,
    "q20_significant_suppliers": q20_significant_suppliers,
}

ORACLES = {
    "q6_forecast_revenue": Q6_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q12_priority_shipping": Q12_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q20_significant_suppliers": Q20_SQL,
}
