"""Round-8 gate queries: binary-quantization ANN, corpus segment
dedup, balanced shard packing, vocabulary-concentration QA, and the
relational pivot / grouping-sets / cumulative-distinct surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import load

QUERIES: dict = {}
ORACLES: dict = {}


def ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN (`operators/similarity.py:
    hamming_rerank_topk`): sign-bit packing into two 32-bit words, an
    integer Hamming candidate scan reading 2 longs per vector, and an
    exact cosine rerank restricted to the broadcast candidate set."""
    from ..operators.similarity import hamming_rerank_topk

    return hamming_rerank_topk(load(spark, sf_dir, "embeddings"))


def _ann_hamming_sql() -> str:
    from ..operators.similarity import hamming_rerank_topk_sql

    return hamming_rerank_topk_sql()


QUERIES.update({"ann_hamming_topk": ann_hamming_topk})
ORACLES.update({"ann_hamming_topk": _ann_hamming_sql()})


def segment_dedup_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide first-occurrence segment dedup with text
    reassembly (`operators/dedup.py:segment_dedup`) — the RefinedWeb
    "remove repeated spans" rule at 10-word granularity, emitting the
    cleaned text itself, not just statistics."""
    from ..operators.dedup import segment_dedup

    return segment_dedup(load(spark, sf_dir, "documents"))


def _segment_dedup_sql() -> str:
    from ..operators.dedup import segment_dedup_sql

    return segment_dedup_sql()


QUERIES.update({"segment_dedup_texts": segment_dedup_texts})
ORACLES.update({"segment_dedup_texts": _segment_dedup_sql()})


def shard_snake_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced output sharding (`operators/packing.py:
    snake_shard_assign`): snake-deal documents into 8 shards by word
    count and report each shard's doc count and token mass — the
    near-equal masses ARE the contract being gated."""
    from pyspark.sql import functions as F

    from ..operators.packing import snake_shard_assign
    from ..operators.text_analysis import words_col

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(words_col(F.col("text"))).cast("long").alias("n_words")
    )
    return (
        snake_shard_assign(docs, "n_words", n_shards=8)
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("token_mass"),
        )
    )


def _shard_snake_sql() -> str:
    from ..operators.packing import snake_shard_stats_sql
    from ..operators.text_analysis import WORDS_SQL

    return snake_shard_stats_sql("documents", f"len({WORDS_SQL})", n_shards=8)


def gini_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary-concentration Gini in exact integer
    arithmetic (`operators/text_analysis.py:gini_concentration`)."""
    from ..operators.text_analysis import gini_concentration

    return gini_concentration(load(spark, sf_dir, "documents"))


def _gini_sql() -> str:
    from ..operators.text_analysis import gini_concentration_sql

    return gini_concentration_sql()


_PIVOT_YEARS = list(range(1992, 1999))


def pivot_shipmode_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PIVOT operator surface: revenue by return flag across ship
    years as columns — Spark's `groupBy().pivot(values=...)` (explicit
    value list, so the plan needs NO distinct-value pre-scan and stays
    a single aggregate) vs the oracle's conditional-sum spelling."""
    from pyspark.sql import functions as F

    from .relational import _dsum

    l = load(spark, sf_dir, "lineitem")
    piv = (
        l.withColumn("yr", F.year("l_shipdate"))
        .groupBy("l_returnflag")
        .pivot("yr", _PIVOT_YEARS)
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    )
    for y in _PIVOT_YEARS:
        piv = piv.withColumnRenamed(str(y), f"rev_{y}")
    return piv


def _pivot_sql() -> str:
    cols = ",\n       ".join(
        "CAST(SUM(CASE WHEN year(l_shipdate) = {y} THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6)) END) AS DOUBLE) AS rev_{y}".format(y=y)
        for y in _PIVOT_YEARS
    )
    return f"SELECT l_returnflag,\n       {cols}\nFROM lineitem GROUP BY l_returnflag"


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond the cube/rollup gates): per-flag,
    per-status, and grand-total revenue in ONE aggregate pass with
    grouping() flags disambiguating real NULL keys from subtotal rows."""
    l = load(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user counts per day WITHOUT a distinct-per-
    window blowup: a user contributes on their FIRST day only, so the
    running distinct count is a cumulative sum over per-hour first-seen
    counts — the standard rewrite that turns an O(days x users)
    window-distinct into one aggregate plus a days-sized window."""
    from pyspark.sql import Window, functions as F

    from . import ts_us

    ev = load(spark, sf_dir, "events")
    hours = (
        ev.withColumn("__us", ts_us(ev))
        .select("user_id", F.expr("__us div 3600000000").alias("hour"))
        .groupBy("user_id")
        .agg(F.min("hour").alias("first_hour"))
        .groupBy("first_hour")
        .agg(F.count("*").cast("long").alias("new_users"))
    )
    w = Window.orderBy("first_hour").rowsBetween(Window.unboundedPreceding, 0)
    return hours.select(
        F.col("first_hour").alias("hour"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


_CUM_DISTINCT_SQL = """
WITH firsts AS (
  SELECT user_id, min(epoch_us(ts) // 3600000000) AS first_hour
  FROM events GROUP BY user_id
),
hours AS (
  SELECT first_hour, CAST(count(*) AS BIGINT) AS new_users
  FROM firsts GROUP BY first_hour
)
SELECT first_hour AS hour, new_users,
       CAST(sum(new_users) OVER (ORDER BY first_hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM hours
"""


def user_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over per-user active days: consecutive-day
    streaks merged into (start, end, length) intervals via the
    ``day - row_number`` grouping constant. Windows are per-user and
    bounded by the calendar, never by event volume — the per-user
    distinct-day aggregate comes first."""
    from pyspark.sql import Window, functions as F

    from . import ts_us

    ev = load(spark, sf_dir, "events")
    days = (
        ev.withColumn("__us", ts_us(ev))
        .select("user_id", F.expr("__us div 86400000000").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn("grp", F.col("day") - F.row_number().over(w))
    return (
        grp.groupBy("user_id", "grp")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count("*").cast("long").alias("n_days"),
        )
        .select("user_id", "start_day", "end_day", "n_days")
    )


_ISLANDS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
grp AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
)
SELECT user_id, min(day) AS start_day, max(day) AS end_day,
       CAST(count(*) AS BIGINT) AS n_days
FROM grp GROUP BY user_id, grp
"""


QUERIES.update(
    {
        "shard_snake_mass": shard_snake_mass,
        "gini_source_concentration": gini_source_concentration,
        "pivot_shipmode_year": pivot_shipmode_year,
        "grouping_sets_revenue": grouping_sets_revenue,
        "cumulative_distinct_users": cumulative_distinct_users,
        "user_activity_islands": user_activity_islands,
    }
)
ORACLES.update(
    {
        "shard_snake_mass": _shard_snake_sql(),
        "gini_source_concentration": _gini_sql(),
        "pivot_shipmode_year": _pivot_sql(),
        "grouping_sets_revenue": _GROUPING_SETS_SQL,
        "cumulative_distinct_users": _CUM_DISTINCT_SQL,
        "user_activity_islands": _ISLANDS_SQL,
    }
)


# retrieval_mrr_variants was folded into
# pipeline_r10.ann_eval_scorecard (round 10) together with
# pipeline_r7b's ann_recall_scorecard — see the fold note there.


def bursty_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano-factor burstiness audit of hourly arrival counts per event
    type (`operators/timeseries.py:fano_dispersion`): exact-integer
    variance/mean of per-hour counts, the dispersion test separating
    Poisson-like organic traffic from bursty machine traffic."""
    from pyspark.sql import functions as F

    from . import ts_us
    from ..operators.timeseries import fano_dispersion

    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("__us", ts_us(ev))
    return fano_dispersion(ev, "event_type", F.expr("__us div 3600000000"))


def _bursty_sql() -> str:
    from ..operators.timeseries import fano_dispersion_sql

    return fano_dispersion_sql("events", "event_type", "epoch_us(ts) // 3600000000")


QUERIES.update({"bursty_event_types": bursty_event_types})
ORACLES.update({"bursty_event_types": _bursty_sql()})


def rolling_7d_value_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed sliding window (a frame kind no other gate pins):
    per user and day, the min/max/count of daily event-value cents over
    the trailing 7-day RANGE window — value-based frames skip missing
    days correctly where ROWS frames would silently widen."""
    from pyspark.sql import Window, functions as F

    from . import ts_us

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.withColumn("__us", ts_us(ev))
        .select(
            "user_id",
            F.expr("__us div 86400000000").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("cents").alias("day_cents"))
    )
    w = Window.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
    return daily.select(
        "user_id",
        "day",
        "day_cents",
        F.min("day_cents").over(w).alias("min_7d"),
        F.max("day_cents").over(w).alias("max_7d"),
        F.count("*").over(w).cast("long").alias("days_7d"),
    )


_ROLLING_7D_SQL = """
WITH daily AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
  FROM events GROUP BY user_id, epoch_us(ts) // 86400000000
)
SELECT user_id, day, day_cents,
       CAST(min(day_cents) OVER w AS BIGINT) AS min_7d,
       CAST(max(day_cents) OVER w AS BIGINT) AS max_7d,
       CAST(count(*) OVER w AS BIGINT) AS days_7d
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


QUERIES.update({"rolling_7d_value_extrema": rolling_7d_value_extrema})
ORACLES.update({"rolling_7d_value_extrema": _ROLLING_7D_SQL})


def funnel_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-CONSTRAINED funnel (view -> click -> purchase, each step
    within one hour of the one before): a click qualifies if SOME view
    precedes it by <= 1h, a purchase if some QUALIFIED click does. One
    per-user window pass — a conditional running max of the previous
    stage's timestamp — no self-joins, no per-step shuffle; the
    unconstrained funnel gate (`event_funnel_counts`) cannot express
    the deadline, and greedy earliest-event logic is WRONG here (an
    early view can expire; the latest preceding view is the right
    anchor). Output: per user, counts of qualified clicks/purchases
    and the first qualified timestamps (0 when a user never
    qualifies — NULL longs degrade to float64 through Arrow/pandas on
    the oracle side, so the sentinel keeps both engines integer)."""
    from pyspark.sql import Window, functions as F

    from . import ts_us

    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("__us", ts_us(ev)).select(
        "user_id", "event_type", "__us", "event_id"
    )
    hour = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("__us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # last view at-or-before each row (inclusive ordering keeps a
    # same-microsecond view usable by a click tied on ts — matched by
    # the oracle's <= comparisons)
    stage1 = ev.withColumn(
        "last_view_us",
        F.max(F.when(F.col("event_type") == "view", F.col("__us"))).over(w),
    )
    stage1 = stage1.withColumn(
        "click_ok",
        (F.col("event_type") == "click")
        & F.col("last_view_us").isNotNull()
        & (F.col("__us") - F.col("last_view_us") <= hour),
    )
    stage2 = stage1.withColumn(
        "last_qclick_us",
        F.max(F.when(F.col("click_ok"), F.col("__us"))).over(w),
    ).withColumn(
        "purchase_ok",
        (F.col("event_type") == "purchase")
        & F.col("last_qclick_us").isNotNull()
        & (F.col("__us") - F.col("last_qclick_us") <= hour),
    )
    return (
        stage2.groupBy("user_id")
        .agg(
            F.sum(F.col("click_ok").cast("long")).cast("long").alias("q_clicks"),
            F.sum(F.col("purchase_ok").cast("long")).cast("long").alias("q_purchases"),
            F.coalesce(
                F.min(F.when(F.col("click_ok"), F.col("__us"))), F.lit(0)
            ).cast("long").alias("first_q_click_us"),
            F.coalesce(
                F.min(F.when(F.col("purchase_ok"), F.col("__us"))), F.lit(0)
            ).cast("long").alias("first_q_purchase_us"),
        )
    )


_FUNNEL_HOUR_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
s1 AS (
  SELECT *, max(CASE WHEN event_type = 'view' THEN us END) OVER w AS last_view_us
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s1b AS (
  SELECT *, (event_type = 'click' AND last_view_us IS NOT NULL
             AND us - last_view_us <= 3600000000) AS click_ok
  FROM s1
),
s2 AS (
  SELECT *, max(CASE WHEN click_ok THEN us END) OVER w AS last_qclick_us
  FROM s1b
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s2b AS (
  SELECT *, (event_type = 'purchase' AND last_qclick_us IS NOT NULL
             AND us - last_qclick_us <= 3600000000) AS purchase_ok
  FROM s2
)
SELECT user_id,
       CAST(sum(CASE WHEN click_ok THEN 1 ELSE 0 END) AS BIGINT) AS q_clicks,
       CAST(sum(CASE WHEN purchase_ok THEN 1 ELSE 0 END) AS BIGINT) AS q_purchases,
       CAST(COALESCE(min(CASE WHEN click_ok THEN us END), 0) AS BIGINT) AS first_q_click_us,
       CAST(COALESCE(min(CASE WHEN purchase_ok THEN us END), 0) AS BIGINT) AS first_q_purchase_us
FROM s2b GROUP BY user_id
"""


QUERIES.update({"funnel_within_hour": funnel_within_hour})
ORACLES.update({"funnel_within_hour": _FUNNEL_HOUR_SQL})


def centroid_label_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest vectors to each label centroid (`operators/similarity.py:
    label_centroid_topk`): integer-lattice sum centroids broadcast
    against the corpus, exact bit-identical scores."""
    from ..operators.similarity import label_centroid_topk

    return label_centroid_topk(load(spark, sf_dir, "embeddings"))


def _centroid_topk_sql() -> str:
    from ..operators.similarity import label_centroid_topk_sql

    return label_centroid_topk_sql()


QUERIES.update({"centroid_label_topk": centroid_label_topk})
ORACLES.update({"centroid_label_topk": _centroid_topk_sql()})


def peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent users per day via the SWEEP LINE
    (`operators/range_join.py:sweep_line_peak`): each user-day activity
    interval (first..last event) emits +1/-1 boundaries; a per-day
    running sum is the live-user count. One sort of 2n boundary rows
    per day — overlap COUNTING without the pairwise join, which would
    be quadratic on a dense day."""
    from pyspark.sql import functions as F

    from . import ts_us
    from ..operators.range_join import sweep_line_peak

    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("__us", ts_us(ev))
    iv = (
        ev.select("user_id", F.expr("__us div 86400000000").alias("day"), "__us")
        .groupBy("user_id", "day")
        .agg(F.min("__us").alias("start_us"), F.max("__us").alias("end_us"))
    )
    return sweep_line_peak(iv, "day")


def _peak_concurrency_sql() -> str:
    from ..operators.range_join import sweep_line_peak_sql

    iv = (
        "SELECT user_id, epoch_us(ts) // 86400000000 AS day,"
        " CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,"
        " CAST(max(epoch_us(ts)) AS BIGINT) AS end_us"
        " FROM events GROUP BY user_id, epoch_us(ts) // 86400000000"
    )
    return sweep_line_peak_sql(iv, "day")


def purchase_session_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval-overlap SELF-join (`operators/range_join.py:
    interval_overlap_pairs`): per-user-day purchase sessions (>= 2
    purchase events in a day, interval = first..last purchase)
    overlapping OTHER users' sessions — the concurrent-shopping
    screen. Each true pair is emitted exactly once via the
    canonical-bucket rule, no distinct."""
    from pyspark.sql import functions as F

    from . import ts_us
    from ..operators.range_join import interval_overlap_pairs

    ev = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    ev = ev.withColumn("__us", ts_us(ev))
    iv = (
        ev.select("user_id", F.expr("__us div 86400000000").alias("day"), "__us")
        .groupBy("user_id", "day")
        .agg(
            F.min("__us").alias("start_us"),
            F.max("__us").alias("end_us"),
            F.count("*").alias("n"),
        )
        .where(F.col("n") >= 2)
        .select(
            # one interval id per (user, day) session; users are < 2^20
            (F.col("user_id") * 1_000_000 + F.col("day") % 1_000_000).alias("iv_id"),
            "start_us",
            "end_us",
        )
    )
    return interval_overlap_pairs(iv, "iv_id")


def _purchase_session_sql() -> str:
    from ..operators.range_join import interval_overlap_pairs_sql

    iv = (
        "SELECT user_id * 1000000 + (epoch_us(ts) // 86400000000) % 1000000 AS iv_id,"
        " CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,"
        " CAST(max(epoch_us(ts)) AS BIGINT) AS end_us"
        " FROM events WHERE event_type = 'purchase'"
        " GROUP BY user_id, epoch_us(ts) // 86400000000"
        " HAVING count(*) >= 2"
    )
    return interval_overlap_pairs_sql(iv, "iv_id")


QUERIES.update(
    {
        "peak_concurrency_daily": peak_concurrency_daily,
        "purchase_session_overlaps": purchase_session_overlaps,
    }
)
ORACLES.update(
    {
        "peak_concurrency_daily": _peak_concurrency_sql(),
        "purchase_session_overlaps": _purchase_session_sql(),
    }
)
