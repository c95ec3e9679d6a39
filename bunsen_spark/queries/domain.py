"""Domain-operator queries exercised on the synthetic relational tables,
so the reference's terminology operators (SURVEY §2.7) get DuckDB-oracle
coverage: distributed transitive closure (D8), valueset-style membership
filtering (D10/J4), and concept-map-style translation (D12).

The FHIR-table twins of these operators live in
:mod:`bunsen_spark.operators`; these queries re-express the same plans
over testdata so the driver's correctness gate can hash-check them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, ts_us


def closure_part_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure (D8) of a synthetic part hierarchy — node
    p_partkey has parent p_partkey div 10 — via the distributed
    iterative-doubling fixpoint (`operators.hierarchies.transitive_closure`,
    replacing the reference's driver-side DFS `Hierarchies.java:259-308`).
    Output: (descendant, ancestor) pairs."""
    from ..operators.hierarchies import transitive_closure

    part = load(spark, sf_dir, "part")
    edges = part.where(F.col("p_partkey") >= 10).select(
        F.lit("part").alias("descendantSystem"),
        F.col("p_partkey").cast("string").alias("descendantValue"),
        F.lit("part").alias("ancestorSystem"),
        (F.col("p_partkey") / 10).cast("long").cast("string").alias("ancestorValue"),
    )
    closure = transitive_closure(edges)
    return closure.select(
        F.col("descendantValue").cast("long").alias("descendant"),
        F.col("ancestorValue").cast("long").alias("ancestor"),
    )


CLOSURE_PART_HIERARCHY_SQL = """
WITH RECURSIVE edges AS (
  SELECT p_partkey AS child, p_partkey // 10 AS parent
  FROM part WHERE p_partkey >= 10
), cl AS (
  SELECT child AS descendant, parent AS ancestor FROM edges
  UNION
  SELECT cl.descendant, e.parent FROM cl JOIN edges e ON cl.ancestor = e.child
)
SELECT descendant, ancestor FROM cl
"""


#: the "valueset": part brands considered in-set for the membership query
MEMBER_BRANDS = ("Brand#12", "Brand#23", "Brand#34")


def valueset_membership_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership filtering (D10/J4 as a join): lineitems whose part is
    in a small code set, via broadcast LEFT SEMI join — the Catalyst-
    transparent form of the reference's `in_valueset` UDF
    (`ValueSetUdfs.java:32-119`), keeping pushdown and pruning alive.
    Output: per-linestatus row counts and quantity sums."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    members = part.where(F.col("p_brand").isin(*MEMBER_BRANDS)).select("p_partkey")
    return (
        lineitem.join(
            F.broadcast(members),
            lineitem["l_partkey"] == members["p_partkey"],
            "left_semi",
        )
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            # decimal-sum like every other qty/revenue gate (_dsum):
            # emits double on BOTH engines regardless of whether the
            # fixture types l_quantity as double or int64 — an int64
            # column would otherwise sum to long in Spark but render
            # float through DuckDB's hugeint→pandas path
            F.sum(F.col("l_quantity").cast("decimal(20,6)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


VALUESET_MEMBERSHIP_SQL = f"""
SELECT l_linestatus, count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE EXISTS (
  SELECT 1 FROM part
  WHERE p_partkey = l_partkey
    AND p_brand IN ({", ".join(repr(b) for b in MEMBER_BRANDS)})
)
GROUP BY l_linestatus
"""


#: concept-map-style source→target code mapping with deliberate gaps
PRIORITY_MAP = (
    ("1-URGENT", "critical"),
    ("2-HIGH", "high"),
    ("3-MEDIUM", "normal"),
)


def translate_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concept-map translation (D12) over a fact table: broadcast left
    join against a small mapping with unmapped codes surfacing as null
    (the reference's `BroadcastableConceptMap.getTarget` semantics as a
    Catalyst join). Output: order counts per (source, target) code."""
    orders = load(spark, sf_dir, "orders")
    from ..localrel import values_df

    mapping = values_df(
        spark, list(PRIORITY_MAP), "o_orderpriority string, translated string"
    )
    return (
        orders.join(F.broadcast(mapping), "o_orderpriority", "left")
        .groupBy("o_orderpriority", "translated")
        .agg(F.count("*").alias("n_orders"))
    )


TRANSLATE_ORDER_PRIORITY_SQL = f"""
SELECT o_orderpriority, translated, count(*) AS n_orders
FROM orders
LEFT JOIN (VALUES {", ".join(f"({s!r}, {t!r})" for s, t in PRIORITY_MAP)})
  AS m(src, translated) ON o_orderpriority = src
GROUP BY o_orderpriority, translated
"""


def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (absent from the reference, SURVEY §2.3): each
    purchase event picks up the value of the user's most recent strictly
    -prior view event. Union+window implementation — one shuffle, no
    range-join fan-out (`operators.asof.as_of_join`)."""
    from ..operators.asof import as_of_join

    e = load(spark, sf_dir, "events")
    e = e.select(
        "event_id", "user_id", "event_type", "value", ts_us(e).alias("us")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "us", F.col("value").alias("purchase_value")
    )
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "us")
        .agg(F.max_by("value", "event_id").alias("view_value"))
    )
    return as_of_join(
        purchases, views, on=["user_id"], ts="us", payload=["view_value"]
    ).select("event_id", "user_id", "purchase_value", "view_value")


ASOF_PURCHASE_LAST_VIEW_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events
), purchases AS (
  SELECT event_id, user_id, us, value AS purchase_value FROM e WHERE event_type = 'purchase'
), views AS (
  SELECT user_id, us, arg_max(value, event_id) AS view_value
  FROM e WHERE event_type = 'view' GROUP BY user_id, us
)
SELECT p.event_id, p.user_id, p.purchase_value, v.view_value
FROM purchases p ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND v.us < p.us
"""


def asof_bucketed_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HOT-KEY-GUARDED as-of path under the oracle gate: identical
    semantics to ``asof_purchase_last_view`` but windowed per
    (user, 1-hour time bucket) with boundary stitch
    (``as_of_join(time_bucket=...)``) so one pathological user cannot
    become one giant sort task. Shares the backward oracle SQL — the
    results must be identical by construction."""
    from ..operators.asof import as_of_join

    e = load(spark, sf_dir, "events")
    e = e.select(
        "event_id", "user_id", "event_type", "value", ts_us(e).alias("us")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "us", F.col("value").alias("purchase_value")
    )
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "us")
        .agg(F.max_by("value", "event_id").alias("view_value"))
    )
    return as_of_join(
        purchases,
        views,
        on=["user_id"],
        ts="us",
        payload=["view_value"],
        time_bucket=3_600_000_000,
    ).select("event_id", "user_id", "purchase_value", "view_value")


def asof_forward_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance (pandas merge_asof parity): each
    purchase picks up the user's EARLIEST strictly-later view value,
    nulled when it is more than one hour away. Same union+window plan
    as backward — only the time sort flips."""
    from ..operators.asof import as_of_join

    e = load(spark, sf_dir, "events")
    e = e.select(
        "event_id", "user_id", "event_type", "value", ts_us(e).alias("us")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "us", F.col("value").alias("purchase_value")
    )
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "us")
        .agg(F.max_by("value", "event_id").alias("next_view_value"))
    )
    hour_us = 3_600_000_000
    return as_of_join(
        purchases,
        views,
        on=["user_id"],
        ts="us",
        payload=["next_view_value"],
        direction="forward",
        tolerance=hour_us,
    ).select("event_id", "user_id", "purchase_value", "next_view_value")


ASOF_FORWARD_NEXT_VIEW_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events
), purchases AS (
  SELECT event_id, user_id, us, value AS purchase_value FROM e WHERE event_type = 'purchase'
), views AS (
  SELECT user_id, us, arg_max(value, event_id) AS next_view_value
  FROM e WHERE event_type = 'view' GROUP BY user_id, us
)
SELECT p.event_id, p.user_id, p.purchase_value,
       CASE WHEN v.us - p.us <= 3600000000 THEN v.next_view_value END AS next_view_value
FROM purchases p ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND v.us > p.us
"""


def nations_with_customers_and_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (U2 intersect as a user query): nation keys present
    on BOTH the customer and supplier side."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


NATIONS_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (except as a user query): part keys that never
    appear in lineitem."""
    p = load(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"))
    l = load(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("partkey"))
    return p.exceptAll(l.distinct()).distinct()


PARTS_EXCEPT_SQL = """
SELECT p_partkey AS partkey FROM part
EXCEPT
SELECT l_partkey AS partkey FROM lineitem
"""


def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates it into an
    aggregate + join): orders whose total exceeds their customer's
    average order total. Output: per-priority counts."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("__orders")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM __orders o
        WHERE o_totalprice > (
            SELECT avg(o_totalprice) FROM __orders i WHERE i.o_custkey = o.o_custkey
        )
        GROUP BY o_orderpriority
        """
    )


ORDERS_ABOVE_CUSTOMER_AVG_SQL = """
SELECT o_orderpriority, count(*) AS n
FROM orders o
WHERE o_totalprice > (
    SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
)
GROUP BY o_orderpriority
"""


def event_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion over the event stream: per user, the earliest
    view / click / purchase timestamps from ONE conditional-min
    aggregation (no self-joins), then corpus-level stage counts with
    strict ordering (view < click < purchase). The single-pass
    min-per-type shape is the scalable funnel plan — one shuffle on
    user_id regardless of funnel depth."""
    e = load(spark, sf_dir, "events")
    e = e.select("user_id", "event_type", ts_us(e).alias("us"))
    mins = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("us"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias("t_buy"),
    )
    return mins.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.col("t_view")).alias("n_view"),
        F.coalesce(
            F.sum(((F.col("t_click") > F.col("t_view"))).cast("long")), F.lit(0)
        ).alias("n_view_then_click"),
        F.coalesce(
            F.sum(
                (
                    (F.col("t_click") > F.col("t_view"))
                    & (F.col("t_buy") > F.col("t_click"))
                ).cast("long")
            ),
            F.lit(0),
        ).alias("n_full_funnel"),
    )


EVENT_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), mins AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN us END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN us END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN us END) AS t_buy
  FROM e GROUP BY user_id
)
SELECT count(*) AS n_users,
       count(t_view) AS n_view,
       CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
           AS n_view_then_click,
       CAST(SUM(CASE WHEN t_click > t_view AND t_buy > t_click THEN 1 ELSE 0 END)
           AS BIGINT) AS n_full_funnel
FROM mins
"""


def cohort_retention_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by signup week, counted
    in each later week they were active. Two aggregations + one join —
    cohort assignment is a conditional min per user (no self-join),
    activity is a distinct (user, week) projection; all time math is
    integer epoch-microsecond division, so the oracle matches exactly."""
    week_us = 7 * 24 * 3600 * 1_000_000
    e = load(spark, sf_dir, "events")
    e = e.select("user_id", "event_type", ts_us(e).alias("us"))
    cohort = (
        e.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("us"))
            ).alias("s_us")
        )
        .where(F.col("s_us").isNotNull())
        .select("user_id", F.expr(f"s_us div {week_us}").alias("cohort_week"))
    )
    activity = e.select(
        "user_id", F.expr(f"us div {week_us}").alias("week")
    ).distinct()
    return (
        activity.join(cohort, "user_id")
        .where(F.col("week") >= F.col("cohort_week"))
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


COHORT_RETENTION_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), cohort AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN us END) // 604800000000
             AS cohort_week
  FROM e GROUP BY user_id
  HAVING min(CASE WHEN event_type = 'signup' THEN us END) IS NOT NULL
), activity AS (
  SELECT DISTINCT user_id, us // 604800000000 AS week FROM e
)
SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS n_users
FROM activity JOIN cohort USING (user_id)
WHERE week >= cohort_week
GROUP BY cohort_week, week_offset
"""


def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: the events ``props`` JSON string
    is parsed in-plan (no UDF) and aggregated by a derived bucket."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(F.expr("CAST(get_json_object(props, '$.k') AS INT) div 10").alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


EVENTS_PROPS_EXTRACT_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) // 10 AS k_bucket,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY k_bucket
"""


RANGE_WINDOW_US = 30 * 60 * 1_000_000  # 30 minutes


def range_join_purchase_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (absent from the reference): all (purchase, view)
    pairs of the same user where the view happened within the 30
    minutes strictly before the purchase — bucketed equi-join + exact
    refine, no nested loop (`operators.range_join`)."""
    from ..operators.range_join import range_join

    e = load(spark, sf_dir, "events")
    e = e.select(
        "event_id", "user_id", "event_type", ts_us(e).alias("us")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("us").alias("p_us")
    )
    views = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("us").alias("v_us")
    )
    return range_join(
        purchases, views, ["user_id"], "p_us", "v_us", RANGE_WINDOW_US
    ).select("purchase_id", "view_id", "user_id")


RANGE_JOIN_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
)
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
FROM (SELECT * FROM e WHERE event_type = 'purchase') p
JOIN (SELECT * FROM e WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.us >= p.us - {RANGE_WINDOW_US}
 AND v.us < p.us
"""


# ---------------------------------------------------------------------------
# PageRank over the customer→supplier trade network (iterative ranking
# beyond closure/CC; integer-exact, see operators.graph)
# ---------------------------------------------------------------------------

def pagerank_trade_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank on the bipartite customer→supplier trade
    graph (edge = customer ordered from supplier at least once; node
    ids disambiguated as 2·custkey / 2·suppkey+1). Ranks are integer-
    quantized micro-units — bit-identical to the unrolled-CTE DuckDB
    twin (operators/graph.py). Returns the 20 highest-ranked supplier
    nodes."""
    from ..operators.graph import pagerank

    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, iters=3)
    return (
        pr.where(F.col("node") % 2 == 1)
        .select(
            ((F.col("node") - 1) / 2).cast("long").alias("s_suppkey"),
            "rank_q",
            "rank",
        )
        .orderBy(F.col("rank_q").desc(), "s_suppkey")
        .limit(20)
    )


def _pagerank_trade_sql() -> str:
    from ..operators.graph import pagerank_sql

    edges_sql = (
        "SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    )
    inner = pagerank_sql(edges_sql, iters=3)
    return f"""
SELECT CAST((node - 1) // 2 AS BIGINT) AS s_suppkey, rank_q, rank
FROM ({inner})
WHERE node % 2 = 1
ORDER BY rank_q DESC, s_suppkey
LIMIT 20
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "closure_part_hierarchy": closure_part_hierarchy,
    "valueset_membership_lineitem": valueset_membership_lineitem,
    "translate_order_priority": translate_order_priority,
    "asof_purchase_last_view": asof_purchase_last_view,
    "asof_bucketed_purchase_last_view": asof_bucketed_purchase_last_view,
    "asof_forward_next_view": asof_forward_next_view,
    "nations_with_customers_and_suppliers": nations_with_customers_and_suppliers,
    "parts_never_ordered": parts_never_ordered,
    "orders_above_customer_avg": orders_above_customer_avg,
    "event_funnel_counts": event_funnel_counts,
    "cohort_retention_counts": cohort_retention_counts,
    "events_props_extract": events_props_extract,
    "range_join_purchase_views": range_join_purchase_views,
    "pagerank_trade_network": pagerank_trade_network,
}

ORACLES: dict[str, str] = {
    "closure_part_hierarchy": CLOSURE_PART_HIERARCHY_SQL,
    "valueset_membership_lineitem": VALUESET_MEMBERSHIP_SQL,
    "translate_order_priority": TRANSLATE_ORDER_PRIORITY_SQL,
    "asof_purchase_last_view": ASOF_PURCHASE_LAST_VIEW_SQL,
    "asof_bucketed_purchase_last_view": ASOF_PURCHASE_LAST_VIEW_SQL,
    "asof_forward_next_view": ASOF_FORWARD_NEXT_VIEW_SQL,
    "nations_with_customers_and_suppliers": NATIONS_INTERSECT_SQL,
    "parts_never_ordered": PARTS_EXCEPT_SQL,
    "orders_above_customer_avg": ORDERS_ABOVE_CUSTOMER_AVG_SQL,
    "event_funnel_counts": EVENT_FUNNEL_SQL,
    "cohort_retention_counts": COHORT_RETENTION_SQL,
    "events_props_extract": EVENTS_PROPS_EXTRACT_SQL,
    "range_join_purchase_views": RANGE_JOIN_SQL,
    "pagerank_trade_network": _pagerank_trade_sql(),
}
